"""Sinks: partitioned and bucketed table writers (SURVEY.md §2.1 sinks row).

Kusto's ingest-side layout knobs (extent partitioning policy, shard keys)
map onto Spark's two physical-layout levers:

- **partition_by** -> hive-style directory partitioning: query-time
  partition PRUNING (a filter on the partition column skips whole
  directories before any I/O). Right for low-cardinality routing columns
  (date, tenant, event_type) at 100 TB.
- **bucket_by** -> hash bucketing via ``saveAsTable``: co-located,
  pre-shuffled layout. Two tables bucketed on the same key with the same
  bucket count JOIN WITHOUT AN EXCHANGE on either side, and aggregations
  on the bucket key skip their shuffle too. Right for the high-cardinality
  join keys of fact tables (orderkey, user_id, doc_id). At 100 TB this is
  the difference between re-shuffling terabytes per join and none.

Both writers are thin, explicit wrappers over the DataFrameWriter — the
value is the contract (and the plan tests that prove the no-Exchange
claim), not abstraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .errors import KqlSemanticError


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> str:
    """Write a result to parquet, optionally hive-partitioned.

    ``max_records_per_file`` bounds file sizes so a skewed partition can't
    produce one giant file (small-file/giant-file balance is the #1
    operational issue of petabyte parquet lakes)."""
    w = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.parquet(path)
    return path


def _looks_like_orphan_table(fs, loc) -> bool:
    """Only delete directories that look like an abandoned saveAsTable
    parquet output — part files / _SUCCESS present (or empty), and NO
    index-store subdirectories. Round 14 (ADVICE): the cleanup used to
    remove ANY directory sharing the table's name, which could destroy
    an index store a user keeps under the warehouse (e.g. a
    minhash_index_build at {warehouse}/{name}/sigs|meta)."""
    names = [st.getPath().getName() for st in fs.listStatus(loc)]
    if any(n in ("meta", "sigs", "codes") for n in names):
        return False
    if not names:  # an empty leftover still blocks CREATE — clear it
        return True
    return any(n == "_SUCCESS" or n.startswith("part-") for n in names)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_by: str | list[str],
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Save as a bucketed managed table (metastore-backed parquet).

    Joins between tables bucketed on the same keys with the same bucket
    count need NO Exchange on either side (proved in
    tests/test_plans.py::test_bucketed_join_has_no_exchange); with
    ``sort_by`` on the join key the sort is pre-done too. Pick ``buckets``
    so one bucket of the largest table fits an executor's memory at target
    scale (e.g. 100 TB / 4096 buckets ~ 25 GB per bucket per table scan
    unit, before column pruning)."""
    if buckets <= 0:
        raise KqlSemanticError("write_bucketed: buckets must be positive")
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        # a managed table's warehouse directory can survive a previous
        # session while the (default in-memory) catalog forgot the table;
        # saveAsTable then plans a CREATE and dies with
        # LOCATION_ALREADY_EXISTS. Overwrite semantics say the caller
        # wants the old layout gone — clear the orphan directory first.
        # (Hadoop FS API so any warehouse scheme works, not just file://.)
        try:
            jvm = spark._jvm  # noqa: SLF001
            wh = spark.conf.get("spark.sql.warehouse.dir")
            # warehouse layout: default-db tables live at wh/tbl, other
            # dbs at wh/<db>.db/tbl (round 14 ADVICE: the cleanup used
            # to string-join "wh/db.tbl", the wrong path)
            parts = table.lower().split(".")
            if len(parts) == 2 and parts[0] != "default":
                loc = jvm.org.apache.hadoop.fs.Path(
                    wh, parts[0] + ".db/" + parts[1]
                )
            else:
                loc = jvm.org.apache.hadoop.fs.Path(wh, parts[-1])
            fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
            if fs.exists(loc) and _looks_like_orphan_table(fs, loc):
                fs.delete(loc, True)
        except Exception:  # pragma: no cover - defensive
            pass
    bcols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(int(buckets), *bcols)
    )
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    w.saveAsTable(table)
    return table


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read back a managed (possibly bucketed) table; bucketing metadata
    flows into the scan so downstream joins/aggs can elide shuffles."""
    return spark.table(table)
