"""Physical-plan assertions (SURVEY.md §5.3): the translator must produce
the plan Catalyst SHOULD pick — pushdown reaching the scan, top-k lowering
to TakeOrderedAndProject, broadcast hints honored. These guard the 100 TB
posture, not just correctness."""

from __future__ import annotations


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(run_kql):
    df = run_kql("lineitem | where l_quantity > 30.0 | project l_orderkey, l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning_reaches_scan(run_kql):
    df = run_kql("lineitem | project l_orderkey, l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # unused column pruned


def test_top_lowered_to_take_ordered(run_kql):
    df = run_kql("orders | top 5 by o_totalprice desc")
    assert "TakeOrderedAndProject" in _plan(df)


def test_sample_avoids_global_sort(run_kql):
    # orderBy(rand).limit lowers to TakeOrderedAndProject (per-partition
    # top-k + driver merge), NOT a full Exchange+Sort
    df = run_kql("lineitem | sample 100")
    assert "TakeOrderedAndProject" in _plan(df)


def test_broadcast_hint_honored(run_kql):
    df = run_kql(
        "orders | join kind=inner hint.strategy=broadcast (customer)"
        " on $left.o_custkey == $right.c_custkey"
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_lookup_uses_broadcast(run_kql):
    df = run_kql(
        "customer | lookup (nation) on $left.c_nationkey == $right.n_nationkey"
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_no_python_udf_in_scalar_pipeline(run_kql):
    df = run_kql(
        "lineitem | extend v = l_extendedprice * (1.0 - l_discount)"
        " | where strlen(l_returnflag) == 1 | summarize s = sum(v) by l_linestatus"
    )
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_two_phase_aggregation(run_kql, monkeypatch):
    # partial (map-side) + final HashAggregate — the map-side-combine
    # shape that makes summarize scale (SURVEY §4.1). Round 17: on the
    # single-row-group fixtures the single-task fused plan removes the
    # Exchange outright (SinglePartition satisfies the clustering
    # requirement; guide §2.4) while KEEPING the two-phase aggregate;
    # the cluster-regime shape (Exchange present) is pinned with the
    # fusion disabled.
    df = run_kql("lineitem | summarize s = sum(l_quantity) by l_returnflag")
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" not in plan  # fused: zero-shuffle single task
    monkeypatch.setenv("SPARK_GRAFT_SINGLE_TASK", "0")
    df = run_kql(
        "lineitem | summarize s = sum(l_quantity) by l_returnflag // unfused"
    )
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_covers_agg(run_kql):
    # AQE hides the final plan until execution; `* Node` = inside a
    # WholeStageCodegen span in formatted explain output
    df = run_kql("lineitem | summarize s = sum(l_quantity) by l_returnflag")
    df.collect()
    plan = _plan(df)
    assert "* HashAggregate" in plan and "* Project" in plan


def test_similarity_search_lowered_to_take_ordered(run_kql):
    q = "dynamic([" + ",".join("0.1" for _ in range(64)) + "])"
    df = run_kql(f"embeddings | evaluate similarity_search(embedding, {q}, 5)")
    # per-partition top-k + driver merge, no global Exchange+Sort
    assert "TakeOrderedAndProject" in _plan(df)


def test_simhash_banding_is_equi_join(run_kql):
    # candidate generation must be a band-keyed equi-join (bucket-local),
    # never a cartesian/broadcast-nested-loop all-pairs comparison
    df = run_kql(
        "datatable(id:long, t:string)[1, 'a b c d e', 2, 'a b c d f']"
        " | evaluate dedup_simhash(t, id, 3)"
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fingerprint_no_python_udf(run_kql):
    df = run_kql("documents | evaluate fingerprint(text) | project doc_id, fp, fp_min")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lang_detect_no_python_udf(run_kql):
    df = run_kql("documents | evaluate lang_detect(text) | project doc_id, detected_lang")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_make_series_single_scan_no_joins(run_kql):
    # round 5: densification is collapse-to-map + sequence() projection —
    # ONE source scan, no grid joins (the old plan re-scanned for distinct
    # keys and cross-joined an exploded axis)
    df = run_kql(
        "events | make-series c = count() on ts"
        " from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type"
    )
    import re

    plan = _plan(df)
    # formatted explain lists each node in the tree AND a detail section;
    # count the numbered detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_partitioned_scan_is_keyed_exchange(run_kql):
    # sharded scan = one hash shuffle on the partition key feeding
    # per-group pandas walkers — no coalesce(1) single-walker bottleneck
    df = run_kql(
        "events | partition by user_id ("
        " sort by ts asc, event_id asc"
        " | scan with (step s1: event_type == 'view';))"
    )
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(user_id" in plan
    assert "Coalesce 1" not in plan and "coalesce(1)" not in plan.lower()


def test_graph_shortest_paths_no_cartesian(run_kql):
    df = run_kql(
        "datatable(src:string, dst:string)['x','y','y','z']"
        " | make-graph src --> dst"
        " | graph-shortest-paths (a)-[e*1..3]->(b)"
        "   where a.node_id == 'x'"
        "   project t = b.node_id, hops = tolong(array_length(e))"
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan


def test_sliding_window_counts_two_hash_aggs_no_join(run_kql):
    # bounded explode + hash agg; the only join is the broadcast 1-row
    # max-bin clamp — no sliding self-join of the fact table
    df = run_kql("events | evaluate sliding_window_counts(user_id, ts, 7d, 1d)")
    plan = _plan(df)
    assert "Generate explode" in plan or "Generate" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rolling_percentile_no_self_join(run_kql):
    df = run_kql("events | evaluate rolling_percentile(value, 90, ts, 1d, 7)")
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ipv4_lookup_broadcasts_lookup_side(run_kql):
    df = run_kql(
        "let lut = datatable(cidr:string, net:string)['10.0.0.0/8','ten'];"
        "events"
        " | extend ip = strcat('10.0.0.', tostring(event_id % 256))"
        " | evaluate ipv4_lookup(lut, ip, cidr)"
    )
    plan = _plan(df)
    # range-containment theta join on a broadcast dim — never sort-merge or
    # an unhinted nested-loop over a shuffled lookup side
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rows_near_single_window_pass(run_kql):
    df = run_kql(
        "events | sort by ts asc, event_id asc"
        " | evaluate rows_near(event_type == 'purchase', 2)"
    )
    plan = _plan(df)
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_funnel_completion_hash_joins_only(run_kql):
    df = run_kql(
        "events | evaluate funnel_sequence_completion("
        "user_id, ts, 7d, event_type, 'view', 'click', 'purchase', 7d)"
    )
    plan = _plan(df)
    # chained-min step joins are id-keyed equi-joins: theta parts (time
    # window) ride the same join as post-conditions — never a cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_session_count_no_global_window(run_kql):
    df = run_kql("events | evaluate session_count(user_id, ts, 1d, 1h)")
    plan = _plan(df)
    # the lag window must be partitioned by id (no single-partition sort)
    assert "Window" in plan
    import re

    # a global window shows as 'Window [...], []' (empty partition spec)
    assert not re.search(r"partitionBy=\[\]", plan)
    assert "CartesianProduct" not in plan


def test_activity_counts_metrics_bounded_plan(run_kql):
    df = run_kql("events | evaluate activity_counts_metrics(user_id, ts, 1d)")
    plan = _plan(df)
    # per-bin aggregations + one left join on the bin; the only window runs
    # over the bin-level frame (bounded by bin count)
    assert "CartesianProduct" not in plan
    # exactly one Window operator node ("(N) Window" in the details section)
    import re

    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_dcount_intersect_no_shuffle_after_agg(run_kql):
    df = run_kql(
        "events | summarize h1 = hll(user_id), "
        "h2 = hll_if(user_id, event_type == 'view') "
        "| evaluate dcount_intersect(h1, h2)"
    )
    plan = _plan(df)
    # sketch intersection is row-wise column arithmetic: exactly the
    # summarize's own exchange, nothing added by the plugin
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_dedup_jaccard_banded_not_all_pairs(run_kql):
    df = run_kql("documents | evaluate dedup_jaccard(text, doc_id, 0.8)")
    plan = _plan(df)
    # the candidate join must be a band-key equi-join, never a cross product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_diffpatterns_text_shuffle_partitioned(run_kql):
    df = run_kql(
        'events | extend side = iff(user_id % 2 == 0, "even", "odd")'
        ' | project msg = strcat("user did ", event_type), side'
        ' | evaluate diffpatterns_text(msg, side, "even", "odd")'
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_activity_metrics_hash_partitioned(run_kql):
    df = run_kql("events | evaluate activity_metrics(user_id, ts, 1d)")
    plan = _plan(df)
    # previous-period intersection is an (id, period) equi-join — never a
    # cross product or nested loop
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_in_tabular_lowered_to_semi_join(run_kql):
    df = run_kql(
        "lineitem | where l_orderkey in"
        " (orders | where o_totalprice > 300000 | project o_orderkey) | count"
    )
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_notin_tabular_lowered_to_anti_join(run_kql):
    df = run_kql(
        "customer | where c_custkey !in (orders | project o_custkey) | count"
    )
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_small_input_fast_path_pins_non_aqe_plan(run_kql, spark):
    # tiny parquet inputs skip AQE (its stage-wise re-planning dominates
    # under 32MB) and pin a small shuffle-partition count; session conf is
    # untouched afterwards
    df = run_kql("events | summarize c = count() by event_type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" not in plan
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_unknown_input_size_keeps_aqe(spark):
    # a registered DataFrame has no file size -> conservative: AQE stays on
    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.translator import kql

    cat = Catalog(spark, "/root/testdata/sf0.001")
    cat.register("mem_table", spark.range(10).withColumnRenamed("id", "x"))
    df = kql(spark, "mem_table | summarize n = count() by x", catalog=cat)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan


def test_range_source_keeps_aqe(run_kql):
    # range can generate unbounded rows from zero file bytes -> never small
    df = run_kql("range x from 1 to 1000 step 1 | summarize s = sum(x) by b = x % 7")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan


def test_geo_polygon_lookup_broadcasts_and_defers_udf(run_kql):
    # the polygon side broadcasts; the codegen bbox test lives IN the join
    # condition; the exact point-in-polygon Python UDF runs as a post-join
    # Filter over bbox survivors only
    q = """let zones = datatable(zone:string, shape:string)[
      'sw', '{"type":"Polygon","coordinates":[[[-120.0,-60.0],[0.0,-60.0],[0.0,0.0],[-120.0,0.0],[-120.0,-60.0]]]}'];
    events
    | extend lon = todouble(event_id % 240) - 119.5,
             lat = todouble(user_id % 120) - 59.5
    | evaluate geo_polygon_lookup(zones, shape, lon, lat)"""
    plan = _plan(run_kql(q))
    assert "BroadcastNestedLoopJoin" in plan
    # bbox condition is part of the join (codegen), not the UDF filter
    join_section = plan.split("BroadcastNestedLoopJoin")[-1]
    assert "__kql_lomin" in join_section
    assert "pythonUDF" in plan  # exact test deferred to a post-join Filter


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # two tables bucketed on the join key with the same bucket count join
    # with ZERO Exchange on either side — the 100 TB co-location story
    import uuid

    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.sinks import read_table, write_bucketed
    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    cat = Catalog(spark, SF_DIR)
    suffix = uuid.uuid4().hex[:8]
    t1, t2 = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    try:
        write_bucketed(
            kql(spark, "orders | project o_orderkey, o_totalprice", catalog=cat),
            t1, 8, "o_orderkey", sort_by="o_orderkey",
        )
        write_bucketed(
            kql(spark, "lineitem | project l_orderkey, l_quantity", catalog=cat),
            t2, 8, "l_orderkey", sort_by="l_orderkey",
        )
        jcat = Catalog(spark, SF_DIR)
        jcat.register(t1, read_table(spark, t1))
        jcat.register(t2, read_table(spark, t2))
        # disable broadcast so the join must pick SMJ/shuffle strategy —
        # bucketing is what removes the Exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = kql(
                spark,
                f"{t1} | join kind=inner {t2} on $left.o_orderkey == $right.l_orderkey"
                " | summarize s = sum(l_quantity) by o_orderkey",
                catalog=jcat,
            )
            plan = _plan(df)
            assert "SortMergeJoin" in plan
            assert plan.count("Exchange") == 0
            assert "Bucketed: true" in plan
            rows = df.count()
            assert rows > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_bucketed_agg_skips_shuffle(spark):
    # aggregation keyed on the bucket column reuses the bucketed
    # distribution: no Exchange before the final HashAggregate
    import uuid

    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.sinks import read_table, write_bucketed
    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    cat = Catalog(spark, SF_DIR)
    t = f"b_events_{uuid.uuid4().hex[:8]}"
    try:
        write_bucketed(
            kql(spark, "events | project event_type, value", catalog=cat),
            t, 4, "event_type",
        )
        jcat = Catalog(spark, SF_DIR)
        jcat.register(t, read_table(spark, t))
        plan = _plan(
            kql(spark, f"{t} | summarize c = count(), v = sum(value) by event_type",
                catalog=jcat)
        )
        assert "Exchange" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.sinks import write_parquet
    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    cat = Catalog(spark, SF_DIR)
    p = str(tmp_path / "events_by_type")
    write_parquet(
        kql(spark, "events | project event_type, value", catalog=cat),
        p, partition_by="event_type",
    )
    rcat = Catalog(spark, SF_DIR)
    rcat.register("pevents", spark.read.parquet(p))
    df = kql(spark, "pevents | where event_type == 'click' | summarize s = sum(value)",
             catalog=rcat)
    plan = _plan(df)
    # partition filter reaches the scan: non-matching directories are pruned
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]


def test_decontaminate_broadcasts_benchmark_ngrams(run_kql):
    # the eval-set n-gram side is dimension-sized: it must broadcast so the
    # 100 TB fact side never shuffles for the contamination join
    plan = _plan(run_kql(
        "documents | evaluate decontaminate(text, doc_id, documents, text, 13)"
    ))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ipv6_lookup_broadcasts_lookup_side(run_kql):
    df = run_kql(
        "let lut = datatable(cidr:string, net:string)['2001:db8::/32','docs'];"
        "events"
        " | extend ip = strcat('2001:db8::', tostring(event_id % 10))"
        " | evaluate ipv6_lookup(lut, ip, cidr)"
    )
    plan = _plan(df)
    # hex-string range theta join against the broadcast lookup side
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_filter_arrow_kernel_no_shuffle(run_kql):
    df = run_kql("documents | evaluate repetition_filter(text)")
    plan = _plan(df)
    # round 14: the 13 metrics come from ONE Arrow-batched kernel — the
    # round-5 pure-column tree exceeded whole-stage-codegen limits and
    # ran INTERPRETED at ~33 ms/doc (measured at sf10). Pin exactly one
    # ArrowEval stage, no row-at-a-time BatchEvalPython, and the ONLY
    # allowed Exchange stays the round-11 narrow-scan spread (round-robin
    # redistribution when the compressed file scans as fewer tasks than
    # cores) — the metric computation itself never shuffles
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(kind == "RoundRobinPartitioning" for kind in exchanges), plan
    assert len(exchanges) <= 1, plan
    # one kernel node in the TREE (formatted explain repeats the name in
    # the details section, so count tree edges, not substrings)
    assert len(re.findall(r"[+:]- ArrowEvalPython", plan)) == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_dedup_near_band_join_shape(run_kql):
    # round 6: dedup_near dropped Spark ML MinHashLSH/approxSimilarityJoin.
    # The banded self-join + exact verify execute EAGERLY behind a
    # localCheckpoint (lineage truncation for the component fixpoint), so
    # the final plan shows only the keep-semi-join — pin that it is a
    # plain join with no all-pairs nested-loop anywhere, and that the
    # feature stage is the Arrow-batched pandas UDF (not row-at-a-time).
    from pyspark.sql.functions import PandasUDFType  # noqa: F401
    from pyspark.rdd import PythonEvalType

    from kql_engine_spark.extensions.llm import _jaccard_feature_udf

    udf = _jaccard_feature_udf(5, 20, 5)
    assert udf.evalType == PythonEvalType.SQL_SCALAR_PANDAS_UDF

    df = run_kql("documents | take 500 | evaluate dedup_near(text, doc_id, 0.8)")
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan  # never all-pairs
    assert df.count() > 0


def test_dedup_jaccard_band_join_shape(run_kql):
    df = run_kql(
        "documents | take 500 | evaluate dedup_jaccard(text, doc_id, 0.8)"
    )
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan  # never all-pairs
    assert df.count() > 0


def test_json_multi_key_single_parse(run_kql):
    # single-parse JSON projection (round 8, VERDICT r7 item 1): N distinct
    # top-level key extractions from one string carrier in one project
    # stage exactly ONE from_json struct; no per-access get_json_object
    # remains anywhere in the plan. At 100 TB the repeated parse is the
    # dominant scan-stage cost on wide JSON.
    df = run_kql(
        "events | project a = props.k, b = extractjson('$.missing', props)"
    )
    plan = _plan(df)
    assert plan.count("from_json") == 1, plan
    assert "get_json_object" not in plan, plan


def test_json_single_key_stays_unshared(run_kql):
    # one key = nothing to share: the conservative gate must NOT stage a
    # from_json prework column for a lone access (it would be pure overhead)
    df = run_kql("events | project a = props.k")
    plan = _plan(df)
    assert "from_json" not in plan, plan


def test_tpch_q10_dims_broadcast_filters_pushed(run_kql):
    # round 8 TPC-H ports: the canonical join shapes must come out with
    # the 100 TB-safe physical plan — small dims broadcast (customer,
    # nation at these sizes), selective filters pushed to the scans
    from kql_engine_spark.corpus import CORPUS

    df = run_kql(CORPUS["tpch_q10"][0])
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # take 20 after sort: top-k
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("l_returnflag" in p for p in pushed)  # reaches lineitem scan
    assert any("o_orderdate" in p for p in pushed)  # reaches orders scan


def test_tpch_q18_single_fact_pass(run_kql):
    # q18's big-order CTE aggregates lineitem once; the fact table must
    # appear in exactly one scan subtree feeding a partial/final hash agg
    from kql_engine_spark.corpus import CORPUS

    df = run_kql(CORPUS["tpch_q18"][0])
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1
    assert "HashAggregate" in plan


def test_auto_broadcast_streams_fact_side(run_kql):
    # round 10: without CBO stats Catalyst's join-output estimate is a
    # product, so the small filtered-dim side of Q5 looked huge and Spark
    # broadcast the pruned FACT scan. The translator's source-bytes hint
    # must keep lineitem on the streamed side: no BroadcastExchange whose
    # subtree scans lineitem.
    df = run_kql(
        "customer"
        " | join kind=inner (orders) on $left.c_custkey == $right.o_custkey"
        " | join kind=inner (lineitem) on $left.o_orderkey == $right.l_orderkey"
        " | summarize revenue = sum(l_extendedprice) by c_nationkey"
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # walk: any 'Scan parquet ... lineitem' must not sit under a
    # BroadcastExchange subtree — approximate by indentation blocks
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "BroadcastExchange" in l:
            indent = len(l) - len(l.lstrip(" :+-*("))
            for j in range(i + 1, len(lines)):
                l2 = lines[j]
                ind2 = len(l2) - len(l2.lstrip(" :+-*("))
                if ind2 <= indent and l2.strip():
                    break
                assert "lineitem" not in l2, "fact table under a broadcast build"


def test_auto_broadcast_semi_anti_build_side(run_kql):
    # semi/anti joins: the small filter-set side is the broadcast build
    df = run_kql(
        "orders | join kind=leftsemi (customer | where c_mktsegment == 'BUILDING')"
        " on $left.o_custkey == $right.c_custkey"
    )
    p = _plan(df)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    df = run_kql(
        "customer | join kind=rightsemi (orders)"
        " on $left.c_custkey == $right.o_custkey"
    )
    p = _plan(df)
    # swapped orientation: customer (small) is the build side
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_split_distinct_narrow_shuffles(run_kql, monkeypatch):
    # round 10: mixed distinct+plain summarize lowers to separate
    # aggregations joined on the group keys, so no exchange carries
    # plain-agg buffers at (keys, distinct-expr) grain. The signature of
    # the single-pass plan is a HashAggregate keyed on BOTH the group key
    # and the distinct column feeding an Exchange on that pair - assert
    # it is gone and the count(distinct) pipeline shuffles only
    # (key, distinct-col) pairs.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SMALL_QUERY_BYTES", 0)  # split is scale-path only
    df = run_kql(
        "lineitem | summarize c = count(), s = sum(l_quantity),"
        " dc = dcount(l_orderkey), mn = min(l_extendedprice)"
        " by l_returnflag"
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, (
        "expected the split pieces joined back on keys"
    )
    # distinct piece aggregates only count(distinct); plain buffers
    # (sum, min) never appear in an aggregate keyed by the distinct col
    import re

    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*l_orderkey[^\]]*)\], functions=\[([^\]]*)\]", plan):
        fns = m.group(2)
        assert "sum(" not in fns and "min(" not in fns, (
            "plain-agg buffers carried through the distinct-grain aggregate"
        )


def test_split_distinct_disabled_by_env(run_kql, monkeypatch):
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SMALL_QUERY_BYTES", 0)
    monkeypatch.setenv("KQL_ENGINE_SPLIT_DISTINCT", "0")
    df = run_kql(
        "lineitem | summarize c = count(), dc = dcount(l_orderkey)"
        " by l_returnflag // split-off"
    )
    plan = _plan(df)
    assert "Join" not in plan


def test_runtime_bloom_filter_fires_on_smj_fact_scan(run_kql, spark):
    # round 11: session re-gates Spark's runtime bloom-filter rule to this
    # engine's scale (100MB thresholds vs the 10GB/10MB defaults) so a
    # filtered dim side past the broadcast threshold blooms the fact scan
    # before the shuffle (sf10 A/B: q5 -42%, BASELINE.md round 11). The
    # conf must be live in the session AND the rule must inject when its
    # size gates pass — pin both, with gates shrunk to fixture scale.
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        == "100MB"
    )
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        )
        == "100MB"
    )
    old_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        # force the SMJ regime the rule targets: no broadcast anywhere,
        # and no single-task fusion (round 17) — a coalesced
        # single-partition join has no shuffle for the bloom to prune
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        import os

        os.environ["KQL_ENGINE_AUTO_BROADCAST"] = "0"
        os.environ["SPARK_GRAFT_SINGLE_TASK"] = "0"
        df = run_kql(
            "lineitem | join kind=inner (orders | where o_totalprice < 1000.0)"
            " on $left.l_orderkey == $right.o_orderkey"
            " | summarize n = count() // bloom-pin"
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        os.environ.pop("KQL_ENGINE_AUTO_BROADCAST", None)
        os.environ.pop("SPARK_GRAFT_SINGLE_TASK", None)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_app,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")


def test_aqe_probe_rebalances_filtered_agg_join_side(run_kql, spark, monkeypatch):
    import kql_engine_spark.translator as TR

    # the probe is an AQE feature; the small-plan pin translates with AQE
    # off, so lift it for fixture-sized sources
    monkeypatch.setattr(TR, "_SMALL_QUERY_BYTES", 0)
    # round 12: a join side shaped `summarize ... by k | where pred` has a
    # runtime size no static estimate can see. When neither side earns a
    # broadcast hint, the translator plants a rebalance-by-join-key
    # exchange on that side — an AQE query-stage boundary whose MEASURED
    # size lets AQE convert the sort-merge join to broadcast when the
    # filter turns out selective (TPC-H Q18 at sf10: both joins convert,
    # orders never shuffles; BASELINE.md round 12). Shrink the broadcast
    # threshold so the fixture-sized sides count as "big" here.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        df = run_kql(
            "let big = lineitem"
            " | summarize sumq = sum(l_quantity) by l_orderkey"
            " | where sumq > 100.0;"
            "big | join kind=inner (orders) on"
            " $left.l_orderkey == $right.o_orderkey"
            " | summarize n = count() // aqe-probe-pin"
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "RebalancePartitions" in plan, plan
        # control: no filter after the summarize -> no probe (the agg
        # output size IS statically bounded by its input; the side keeps
        # its agg partitioning and needs no extra exchange)
        df2 = run_kql(
            "let big = lineitem"
            " | summarize sumq = sum(l_quantity) by l_orderkey;"
            "big | join kind=inner (orders) on"
            " $left.l_orderkey == $right.o_orderkey"
            " | summarize n = count() // aqe-probe-control"
        )
        plan2 = df2._jdf.queryExecution().optimizedPlan().toString()
        assert "RebalancePartitions" not in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_register_bucketed_zero_exchange_and_matches_plain(spark):
    # round 13: Catalog.register_bucketed surfaces the bucketing lever as
    # an engine feature — a summarize keyed on the bucket column over the
    # registered name plans with NO Exchange, and the results equal the
    # plain-parquet path exactly (the layout changes the plan, never the
    # data)
    import uuid

    import pytest

    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.errors import KqlSemanticError
    from kql_engine_spark.sinks import write_bucketed
    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    cat = Catalog(spark, SF_DIR)
    t = f"b_li_reg_{uuid.uuid4().hex[:8]}"
    try:
        write_bucketed(
            kql(spark, "lineitem | project l_orderkey, l_quantity", catalog=cat),
            t, 8, "l_orderkey",
        )
        rcat = Catalog(spark, SF_DIR)
        rcat.register_bucketed("bli", t)
        q = "| summarize s = round(sum(l_quantity), 2) by l_orderkey"
        bucketed = kql(spark, f"bli {q}", catalog=rcat)
        plan = _plan(bucketed)
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        plain = kql(
            spark, f"lineitem | project l_orderkey, l_quantity {q}", catalog=cat
        )
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        )
        # typed errors: unknown table; table without a bucket spec
        with pytest.raises(KqlSemanticError, match="write_bucketed"):
            Catalog(spark, SF_DIR).register_bucketed("x", t + "_nope")
        flat = f"flat_{uuid.uuid4().hex[:8]}"
        try:
            kql(spark, "region", catalog=cat).write.saveAsTable(flat)
            with pytest.raises(KqlSemanticError, match="bucket spec"):
                Catalog(spark, SF_DIR).register_bucketed("x", flat)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {flat}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sink_bucketed_plugin_zero_exchange_downstream(spark):
    # round 13: the sink_bucketed evaluate plugin materializes the layout
    # mid-pipe; the continuation keyed on the bucket column must carry the
    # bucketed scan (no Exchange before the aggregate)
    import uuid

    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    t = f"b_li_plug_{uuid.uuid4().hex[:8]}"
    try:
        df = kql(
            spark,
            "lineitem | project l_orderkey, l_quantity"
            f" | evaluate sink_bucketed('{t}', l_orderkey, 8)"
            " | summarize s = round(sum(l_quantity), 2) by l_orderkey",
            catalog=Catalog(spark, SF_DIR),
        )
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        assert df.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_adaptive_scan_split_lowers_and_restores(spark, run_kql):
    # round 13: a query whose every source is a size-known catalog file
    # lowers spark.sql.files.maxPartitionBytes to total/(2*parallelism),
    # floored at 1MB and capped at the session ceiling; any unsized
    # source (datatable-only = no file scan, externaldata, index stores)
    # restores the ceiling. Perf-only — results are pinned elsewhere.
    from kql_engine_spark.translator import kql
    from kql_engine_spark.catalog import Catalog
    from tests.conftest import SF_DIR

    conf = lambda: spark.conf.get("spark.sql.files.maxPartitionBytes")  # noqa: E731
    cat = Catalog(spark, SF_DIR)
    kql(spark, "region | count", catalog=cat)
    # sf0.001 region is a few KB -> floor
    assert conf() == str(1 << 20)
    kql(spark, "print x = 1", catalog=cat)
    assert conf() != str(1 << 20)  # restored to the session ceiling
    ceiling = conf()
    kql(spark, "documents | summarize n = count()", catalog=cat)
    assert conf() == str(1 << 20)
    # a user-set value becomes the new ceiling
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64MB")
    try:
        kql(spark, "print x = 1", catalog=cat)
        assert conf() == "64MB" or conf() == str(64 << 20)
        kql(spark, "region | count", catalog=cat)
        assert conf() == str(1 << 20)
        kql(spark, "print x = 2", catalog=cat)
        assert conf() in ("64MB", str(64 << 20))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", ceiling)
        kql(spark, "print x = 3", catalog=cat)


def test_adaptive_scan_split_reapplied_on_cache_hit(spark):
    # round-13 review: a plan-cache hit used to execute under whatever
    # split the PREVIOUS query set; now each cached plan re-applies its
    # own recorded target
    import uuid

    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    conf = lambda: spark.conf.get("spark.sql.files.maxPartitionBytes")  # noqa: E731
    # cacheable (catalog=None) unsized query -> recorded input None
    tag = uuid.uuid4().hex[:8]
    qa = f"print cachehit_{tag} = 1"
    kql(spark, qa, sf_dir=SF_DIR)
    ceiling = conf()
    # a small file-backed query lowers the split...
    kql(spark, f"region | count\n// lower_{tag}", sf_dir=SF_DIR)
    assert conf() == str(1 << 20)
    # ...and the CACHE HIT on the unsized query restores its own target
    kql(spark, qa, sf_dir=SF_DIR)
    assert conf() == ceiling
    # symmetric: the small query's cache hit re-lowers
    qb = f"region | count\n// cached_small_{tag}"
    kql(spark, qb, sf_dir=SF_DIR)
    kql(spark, qa, sf_dir=SF_DIR)
    assert conf() == ceiling
    kql(spark, qb, sf_dir=SF_DIR)  # cache hit
    assert conf() == str(1 << 20)
    kql(spark, qa, sf_dir=SF_DIR)  # restore for later tests


def test_split_target_pinned_to_deferred_actions(spark):
    # round 14 (ADVICE): kql() returns LAZY DataFrames — an action on a
    # frame translated EARLIER must run under its own recorded split
    # target, not whatever the latest translation set. kql() pins the
    # target to the returned frame's action methods.
    import uuid

    from kql_engine_spark.translator import kql
    from tests.conftest import SF_DIR

    conf = lambda: spark.conf.get("spark.sql.files.maxPartitionBytes")  # noqa: E731
    tag = uuid.uuid4().hex[:8]
    big = kql(spark, f"print deferred_{tag} = 1", sf_dir=SF_DIR)  # unsized
    ceiling = conf()
    small = kql(spark, f"region | count\n// d_{tag}", sf_dir=SF_DIR)
    assert conf() == str(1 << 20)  # the small query lowered the session conf
    # executing the EARLIER frame re-applies ITS own target first
    assert big.collect()[0][0] == 1
    assert conf() == ceiling
    assert small.collect()[0][0] > 0
    assert conf() == str(1 << 20)
    # property-shaped actions (.rdd, .write) go through the pin too
    big.rdd
    assert conf() == ceiling
    small.count()
    assert conf() == str(1 << 20)
    assert len(big.take(1)) == 1
    assert conf() == ceiling
    kql(spark, f"print restore_{tag} = 1", sf_dir=SF_DIR)


def test_write_bucketed_never_deletes_index_stores(spark, tmp_path):
    # round 14 (ADVICE): the orphan-directory cleanup used to delete ANY
    # warehouse directory sharing the table's name — including an index
    # store kept under the warehouse. Now only directories that look
    # like abandoned saveAsTable parquet output are cleared.
    import os
    import uuid

    from kql_engine_spark import sinks

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    name = f"idxstore_{uuid.uuid4().hex[:8]}"
    store = os.path.join(wh, name)
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    df.write.parquet(store + "/sigs")
    df.write.parquet(store + "/meta")
    try:
        try:
            sinks.write_bucketed(df, name, 2, "k")
            raised = False
        except Exception:
            raised = True
        # whether or not saveAsTable refused the occupied location, the
        # store's contents must survive
        assert os.path.exists(store + "/sigs") and os.path.exists(store + "/meta")
        assert raised  # the location was occupied by a non-table
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        shutil.rmtree(store, ignore_errors=True)
    # a genuine orphan (part files, no catalog entry) is still cleared
    orphan = f"orphan_{uuid.uuid4().hex[:8]}"
    df.write.parquet(os.path.join(wh, orphan))  # parquet output shape
    sinks.write_bucketed(df, orphan, 2, "k")
    try:
        assert spark.table(orphan).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {orphan}")


def test_mixture_pair_bounded_plans(run_kql):
    # round 16: sample_to_mixture's constant max-quota bound must keep
    # Spark's WindowGroupLimit map-side pruning live (each map partition
    # ships at most max-quota rows per group into the exchange — the
    # bounded-shuffle shape at 100 TB). upsample_to_mixture's even-mix
    # no-shuffle pin lives in its law test (fixture-count dependent).
    df = run_kql(
        "documents | evaluate sample_to_mixture(source, doc_id, 11,"
        " 'src1', 3, 'src2', 2, 'src3', 1)"
    )
    plan = _plan(df)
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[1].splitlines()[0] or (
        plan.count("WindowGroupLimit") >= 2  # partial (map-side) + final
    )


def test_single_task_fused_small_plan(run_kql, spark, monkeypatch):
    # Round 17 (guide §2.4, "remove shuffles outright"): when every file
    # source is a single parquet row group (scan unsplittable — the
    # fixtures here) AND the total input fits one default scan split,
    # each scan coalesces to 1 partition, so the whole query plans with
    # ZERO Exchange — aggregation, window and sort all run in one stage.
    # Scale safety is pinned from both ends: the same query with the
    # fusion disabled keeps the Exchange (the cluster shape), and both
    # arms return identical rows (the one real scan task already drove
    # every partial aggregate, so accumulation order is unchanged).
    q = (
        "events | where value > 0.0 "
        "| summarize n = count(), s = sum(value) by event_type "
        "| sort by event_type asc"
    )
    fused = run_kql(q)
    plan = _plan(fused)
    assert "Exchange" not in plan
    assert "Coalesce" in plan
    assert plan.count("HashAggregate") >= 2  # two-phase agg preserved
    monkeypatch.setenv("SPARK_GRAFT_SINGLE_TASK", "0")
    unfused = run_kql(q + " // single-task-off")
    assert "Exchange" in _plan(unfused)
    assert [tuple(r) for r in fused.collect()] == [
        tuple(r) for r in unfused.collect()
    ]


def test_single_task_skips_oversized_and_multi_row_group(run_kql, spark, tmp_path):
    # the byte gate: a query whose sources exceed one scan split keeps
    # the 4-partition small-plan pin (codegen fusion of scan+partial-agg
    # beats the removed stage once real row volume crosses the Coalesce
    # boundary — measured q1 1.40x, BASELINE.md round 17) — and a
    # multi-row-group source must never fuse (its scan CAN parallelize).
    import kql_engine_spark.translator as TR

    big = TR._SINGLE_TASK_BYTES + 1
    orig = TR.Catalog.file_size
    try:
        TR.Catalog.file_size = lambda self, name: big
        df = run_kql("lineitem | summarize s = sum(l_quantity) by l_returnflag"
                     " // oversized-probe")
        assert "Exchange" in _plan(df)
    finally:
        TR.Catalog.file_size = orig
    # multi-row-group source: single_split() must say False
    import pandas as pd

    p = tmp_path / "multi_rg.parquet"
    pd.DataFrame({"a": range(1000)}).to_parquet(p, row_group_size=100)
    from kql_engine_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    assert cat.single_split("multi_rg") is False
    assert cat.single_split("events") is False  # not in this base_dir


def test_single_task_parse_spread(run_kql, spark, monkeypatch):
    # Round 17 (guide §2.5/§4 "per-task work"): a fused single-task plan
    # serializes a per-row JSON parse on the one real scan task; when the
    # tail above the parse is provably partitioning-insensitive the
    # translator spreads the compact rows across the cores below the
    # parse (measured interleaved at sf0.1: b7 0.31 s -> 0.21 s).
    # Pinned from both ends: the spread plan carries the RoundRobin
    # exchange, the flag-off arm keeps the fused zero-Exchange shape,
    # and both return identical rows.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    q = (
        "events | project event_id, k = tolong(extractjson('$.k', props)) "
        "| summarize s = sum(k), n = count()"
    )
    spread = run_kql(q)
    plan = _plan(spread)
    assert "RoundRobinPartitioning" in plan
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_PARSE", "0")
    fused = run_kql(q + " // spread-off")
    assert "Exchange" not in _plan(fused)
    assert [tuple(r) for r in spread.collect()] == [
        tuple(r) for r in fused.collect()
    ]


def test_parse_spread_skips_unsafe_tails(run_kql, spark, monkeypatch):
    # the spread must NOT fire when the tail above the parse could change
    # under a repartition: float-sum aggregates (double accumulation
    # order), serialized-order row functions, row-selecting ops, nested
    # pipes under an outer tail, or sources below the byte floor.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    # float sum: not provably exact -> stay fused
    df = run_kql(
        "events | extend k = extractjson('$.k', props) "
        "| summarize s = sum(value) // spread-floatsum"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # serialized-order row function above the parse -> stay fused
    df = run_kql(
        "events | sort by event_id asc "
        "| extend k = extractjson('$.k', props), r = row_number() "
        "// spread-rowfn"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # row-selecting tail -> stay fused
    df = run_kql(
        "events | extend k = extractjson('$.k', props) | take 5 "
        "// spread-take"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # nested pipe source with an outer row-selecting tail: the inner pipe
    # must not spread either (only the top-level pipe is analyzed)
    df = run_kql(
        "(events | project event_id, k = tolong(extractjson('$.k', props)) "
        "| summarize s = sum(k) by event_id) | take 5 // spread-nested"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # integral sum through a projected cast IS safe -> spreads (control)
    df = run_kql(
        "events | project k = tolong(extractjson('$.k', props)) "
        "| summarize s = sum(k) // spread-control"
    )
    assert "RoundRobinPartitioning" in _plan(df)
    # byte floor: the default gate keeps tiny fixtures fused
    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 1 << 40)
    df = run_kql(
        "events | project k = tolong(extractjson('$.k', props)) "
        "| summarize s = sum(k) // spread-floor"
    )
    assert "RoundRobinPartitioning" not in _plan(df)


def test_parse_spread_preserves_order_contracts(run_kql, spark, monkeypatch):
    # an order-establishing op at/below the spread point is a
    # user-visible ordering contract the repartition would scramble:
    # the spread must fire only when the tail discards row order (an
    # aggregation) or re-establishes it (a final sort).
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    # sort below the parse, row-wise tail -> ordered output, NO spread
    df = run_kql(
        "events | sort by ts asc "
        "| extend k = extractjson('$.k', props) | project event_id, k "
        "// spread-order1"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # sort below, but the tail aggregates (order discarded) -> spread OK
    df = run_kql(
        "events | sort by ts asc "
        "| extend k = tolong(extractjson('$.k', props)) "
        "| summarize s = sum(k) // spread-order2"
    )
    assert "RoundRobinPartitioning" in _plan(df)
    # sort below, but a FINAL sort re-establishes order -> spread OK
    df = run_kql(
        "events | sort by ts asc "
        "| extend k = extractjson('$.k', props) | project event_id, k "
        "| sort by event_id asc // spread-order3"
    )
    assert "RoundRobinPartitioning" in _plan(df)
    # and the re-sorted arm returns the same rows in the same order as
    # the unspread arm
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_PARSE", "0")
    df0 = run_kql(
        "events | sort by ts asc "
        "| extend k = extractjson('$.k', props) | project event_id, k "
        "| sort by event_id asc // spread-order3-off"
    )
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in df0.collect()
    ]


def test_parse_spread_property_access(run_kql, spark, monkeypatch):
    # Round 18 (verdict item 1): `props.k` over a STRING column stages the
    # same per-row JSON parse as extractjson (via the __kqlseg_json
    # prework), so it must trigger the spread too — and return rows
    # identical to the fused flag-off plan.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    q = (
        "events | project event_id, k = tolong(props.k) "
        "| summarize s = sum(k), n = count()"
    )
    spread = run_kql(q)
    assert "RoundRobinPartitioning" in _plan(spread)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_PARSE", "0")
    fused = run_kql(q + " // prop-spread-off")
    assert "Exchange" not in _plan(fused)
    assert [tuple(r) for r in spread.collect()] == [
        tuple(r) for r in fused.collect()
    ]


def test_parse_spread_property_struct_refusal(spark, tmp_path, monkeypatch):
    # Round 18: a Property over a real STRUCT column is a cheap native
    # field access — it must NOT pay a spread exchange. Same catalog, same
    # tail: the string-JSON twin spreads (control), the struct one never.
    import pandas as pd

    import kql_engine_spark.translator as TR
    from kql_engine_spark.catalog import Catalog
    from kql_engine_spark.translator import kql

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    n = 500
    pd.DataFrame(
        {
            "props": [{"k": i} for i in range(n)],
            "js": ['{"k": %d}' % i for i in range(n)],
        }
    ).to_parquet(tmp_path / "structtab.parquet")
    cat = Catalog(spark, str(tmp_path))
    struct_df = kql(
        spark,
        "structtab | project x = tolong(props.k) | summarize s = sum(x)",
        catalog=cat,
    )
    assert "RoundRobinPartitioning" not in _plan(struct_df)
    string_df = kql(
        spark,
        "structtab | project x = tolong(js.k) | summarize s = sum(x)",
        catalog=cat,
    )
    assert "RoundRobinPartitioning" in _plan(string_df)
    # both compute the same sum (field access vs JSON parse of the twin)
    assert [tuple(r) for r in struct_df.collect()] == [
        tuple(r) for r in string_df.collect()
    ]


def test_parse_spread_property_rebind_refusal(run_kql, spark, monkeypatch):
    # Round 18: once a preceding op (or an earlier item of the same
    # clause — KQL sequential visibility) rebinds the base name, the
    # source schema no longer describes it and the Property trigger must
    # not fire.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    # rebound by a preceding extend
    df = run_kql(
        "events | extend props = strcat('{\"k\":', tostring(event_id), '}') "
        "| project k = tolong(props.k) | summarize s = sum(k) "
        "// prop-rebind1"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # rebound by an earlier item of the SAME clause
    df = run_kql(
        "events | extend props = 1, k = tolong(props.k) "
        "| summarize s = sum(k) // prop-rebind2"
    )
    assert "RoundRobinPartitioning" not in _plan(df)


def test_parse_spread_hidden_source_order_refusal(run_kql, spark, monkeypatch):
    # Round 18 (ADVICE high): a sort inside a PipeSource or let-bound view
    # is invisible to the op-list scan, so a non-plain source must be
    # treated like a Sort below the spread point — row-wise tails refuse,
    # order-discarding tails still spread.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    df = run_kql(
        "(events | sort by ts asc) "
        "| extend k = extractjson('$.k', props) | project event_id, k "
        "// hidden-order-pipesource"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    df = run_kql(
        "let V = events | sort by ts asc; V "
        "| extend k = extractjson('$.k', props) | project event_id, k "
        "// hidden-order-letview"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    # control: the tail discards row order -> the hidden sort cannot leak
    df = run_kql(
        "(events | sort by ts asc) "
        "| extend k = tolong(extractjson('$.k', props)) "
        "| summarize s = sum(k) // hidden-order-agg"
    )
    assert "RoundRobinPartitioning" in _plan(df)


def test_parse_spread_nested_subquery_no_useless_exchange(
    run_kql, spark, monkeypatch
):
    # Round 18 (ADVICE low): a parse inside a nested tabular subexpression
    # of a top-level op executes in its own separately-translated
    # subquery — it must not select a spread point in THIS pipe (the
    # exchange would be pure overhead).
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    df = run_kql(
        "events | where event_type in (events "
        "| project t = substring(extractjson('$.k', props), 0, 1)) "
        "| summarize n = count() // nested-subquery-parse"
    )
    assert "RoundRobinPartitioning" not in _plan(df)


def test_parse_spread_nondeterministic_tail_refusal(run_kql, spark, monkeypatch):
    # Round 18 (verdict nit): rand()/new_guid() in the tail make which row
    # pairs with which draw partition-dependent — refuse, same as the
    # order-sensitive row functions.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    df = run_kql(
        "events | extend k = tolong(extractjson('$.k', props)), r = rand() "
        "| summarize s = sum(k), n = count() // nondet-rand"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    df = run_kql(
        "events | extend k = tolong(extractjson('$.k', props)) "
        "| extend g = new_guid() | summarize s = sum(k), n = count() "
        "// nondet-guid"
    )
    assert "RoundRobinPartitioning" not in _plan(df)


def test_parse_spread_intcols_rename_soundness(run_kql, spark, monkeypatch):
    # Round 18 (ADVICE medium): integral tracking must survive renames —
    # 'project-rename kk=k | project-rename k=value | summarize sum(k)'
    # sums DOUBLES and must refuse; summing the renamed integral column
    # is still exact and still spreads.
    import kql_engine_spark.translator as TR

    monkeypatch.setattr(TR, "_SPREAD_PARSE_MIN_BYTES", 0)
    df = run_kql(
        "events | extend k = tolong(extractjson('$.k', props)) "
        "| project-rename kk = k | project-rename k = value "
        "| summarize s = sum(k) // rename-floatsum"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
    df = run_kql(
        "events | extend k = tolong(extractjson('$.k', props)) "
        "| project-rename kk = k | summarize s = sum(kk) "
        "// rename-intsum"
    )
    assert "RoundRobinPartitioning" in _plan(df)
    # multi-name assignment rebinding the integral column -> refuse
    df = run_kql(
        "events | extend k = tolong(extractjson('$.k', props)) "
        "| extend (k, mx) = series_stats(pack_array(value, value)) "
        "| summarize s = sum(k), n = count() // multiname-floatsum"
    )
    assert "RoundRobinPartitioning" not in _plan(df)
