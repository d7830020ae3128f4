"""SparkSession factory with the engine's required configs (SURVEY.md §4.3).

All KQL datetimes are UTC [KQL]; ANSI mode is off so conversions yield null
on failure (KQL `to*()` semantics); Arrow is on for every pandas boundary.
At cluster scale the same builder applies — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "kql-engine-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    # Local-mode default: few shuffle partitions — per-task scheduling overhead
    # dominates at fixture scale. On a cluster set SPARK_GRAFT_SHUFFLE to
    # O(2-3x total cores); AQE coalesces downward either way.
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE") or str(min(int(cpus), 8))
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 100 TB posture: CBO join reordering for Q5-shaped pipelines (the
        # KQL author's join order is pipeline order, not the optimal one).
        # CBO needs catalog stats — on a real deployment run
        # `ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS` at catalog
        # registration; on path-based parquet reads (this sandbox) AQE's
        # runtime re-planning is the operative lever instead.
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
