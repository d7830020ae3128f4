"""Benchmark runner (BASELINE.md protocol, driver contract).

Runs the B1-B10 headline queries (kql_engine_spark/corpus.py BENCH_QUERIES)
through the full KQL engine at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": "bench_total_median_sec", "value": N, "unit": "sec",
     "queries": {"b1_tpch_q1": sec, ...}, "sf": 0.1, ...}

Protocol (round-8 correction — see BASELINE.md "Round-8 protocol
correction"): per query, 1 cold run (translate + plan + execute), then 7
timed FULL-EXECUTION runs — each on a fresh QueryExecution with planning
forced outside the timer, so Spark cannot serve reused shuffle map stages —
median reported as the headline number; plus 3 repeat-latency runs on the
cached plan (plan cache + materialized-stage reuse), reported separately.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kql_engine_spark.corpus import BENCH_QUERIES, CORPUS  # noqa: E402


def main() -> None:
    # --smoke: 2 queries x 1 timed run at sf0.001 — the pre-snapshot gate
    # (round 9; round 7 shipped a NameError in a bench-only code path that
    # one smoke run would have caught). Wired into pytest as
    # tests/test_bench_smoke.py, exercising this script as a subprocess
    # exactly the way the driver does.
    smoke = "--smoke" in sys.argv
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.001" if smoke else "/root/testdata/sf0.1",
    )
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from kql_engine_spark.session import get_spark
    from kql_engine_spark.translator import kql

    spark = get_spark("kql-bench")
    # Warm up the JVM, parquet footers, and the OS page cache for every
    # bench table outside the timed region (the DuckDB baseline gets the
    # same benefit implicitly — it runs 5 timed iterations back-to-back on
    # an mmap'd file). Without this, a cold VM's first bench invocation
    # measures disk I/O + JIT, not the engine.
    for t in (
        "lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents",
    ):
        kql(spark, f"{t} | count", sf_dir=sf_dir).collect()

    bench_items = list(BENCH_QUERIES.items())
    # 7 timed runs (round 9, was 5): single-row-group sf0.1 scans put each
    # query on 1-4 tasks, so one GC pause lands entirely on one run —
    # median-of-7 keeps a noisy window from writing a phantom regression
    # into BENCH_r{N}.json
    n_full, n_rep = 7, 3
    if smoke:
        # first + last bench entries (one simple agg, one multi-join),
        # single timed run each — syntax/translation breakage, not timing
        bench_items = [bench_items[0], bench_items[-1]]
        n_full, n_rep = 1, 1

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    repeat: dict[str, float] = {}
    # Scaling legibility (round 18, additions only — every pre-existing
    # field keeps its exact definition): per query, one EXTRA untimed
    # fresh execution runs inside a job group and reports how many tasks
    # each of its stages actually launched. max_stage_tasks == 1 means the
    # query is genuinely serial at this SF (single-row-group scan and/or
    # fused single-task plan) — low-core/high-core ratios of ~1 are then
    # the measured truth, not evidence that $SPARK_GRAFT_CPUS is ignored.
    task_stats: dict[str, dict[str, int]] = {}
    status = spark.sparkContext.statusTracker()

    def profile_tasks(bench_id: str, text: str) -> None:
        group = f"bench-tasks-{bench_id}"
        d = kql(spark, f"{text}\n// bench-task-profile", sf_dir=sf_dir)
        spark.sparkContext.setJobGroup(group, bench_id)
        try:
            d.collect()
        finally:
            # clear every property setJobGroup set, so later (timed) jobs
            # are not mislabeled in the UI/event logs
            for prop in ("spark.jobGroup.id", "spark.job.description",
                         "spark.job.interruptOnCancel"):
                spark.sparkContext.setLocalProperty(prop, None)
        seen: set[int] = set()
        mx = total = stages = 0
        for jid in status.getJobIdsForGroup(group):
            ji = status.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                if sid in seen:
                    continue
                seen.add(sid)
                si = status.getStageInfo(sid)
                if si is None:
                    continue
                mx = max(mx, si.numTasks)
                total += si.numTasks
                stages += 1
        task_stats[bench_id] = {
            "max_stage_tasks": mx, "total_tasks": total, "n_stages": stages,
        }

    for bench_id, corpus_name in bench_items:
        text = CORPUS[corpus_name][0]
        # first run = the COLD path: parse + translate + Catalyst analyze/
        # optimize/codegen + execute. Recorded for transparency.
        t0 = time.perf_counter()
        df_cached = kql(spark, text, sf_dir=sf_dir)
        df_cached.collect()
        cold[bench_id] = round(time.perf_counter() - t0, 4)
        # FULL-EXECUTION timed runs (round-8 protocol correction, see
        # BASELINE.md): each run gets a FRESH QueryExecution (a comment
        # suffix busts the plan cache) so Spark cannot reuse materialized
        # shuffle map stages across runs — repeated .collect() on one
        # DataFrame skips every stage whose shuffle output still exists,
        # which the r4-r7 bench numbers unknowingly measured. Planning +
        # codegen are forced OUTSIDE the timer (executedPlan()), so the
        # timer covers exactly: scan + shuffle + aggregate + collect.
        runs = []
        for i in range(n_full):
            d = kql(spark, f"{text}\n// bench-fresh-exec {i}", sf_dir=sf_dir)
            d._jdf.queryExecution().executedPlan()  # noqa: SLF001
            t0 = time.perf_counter()
            d.collect()
            runs.append(time.perf_counter() - t0)
        timings[bench_id] = round(statistics.median(runs), 4)
        # repeat-query latency on the cached plan (plan cache + Spark's
        # materialized-stage reuse): what a user re-running the identical
        # query on identical data actually waits. Reported separately —
        # NOT comparable to DuckDB's full re-executions.
        reps = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            df_cached.collect()
            reps.append(time.perf_counter() - t0)
        repeat[bench_id] = round(statistics.median(reps), 4)
        # untimed instrumentation run, OUTSIDE every timed region
        profile_tasks(bench_id, text)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_median_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "repeat_cached_sec": repeat,
                "repeat_cached_total_sec": round(sum(repeat.values()), 4),
                "cold_first_run_sec": cold,
                "cold_total_sec": round(sum(cold.values()), 4),
                # round 18: scaling legibility (see profile_tasks)
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "task_stats": task_stats,
                "sf": sf,
                "engine": "kql_engine_spark",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
