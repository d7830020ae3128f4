"""Table catalog: binds KQL table names to DataFrames (SURVEY.md §1.1).

Kusto's database/table abstraction maps to a name -> DataFrame registry.
Tables are lazy: `spark.read.parquet` builds only a scan node, so Catalyst
still sees filters/projections for pushdown (scan-level pruning is free —
SURVEY.md §4.1). At 100 TB the same catalog binds partitioned parquet or
Delta paths; nothing here materializes data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .errors import KqlSemanticError

FIXTURE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


class Catalog:
    def __init__(self, spark: SparkSession, base_dir: str | None = None):
        self.spark = spark
        self.base_dir = base_dir
        self._tables: dict[str, DataFrame] = {}
        self._streams: dict[str, DataFrame] = {}

    def register(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df

    def register_stream(self, name: str, df: DataFrame) -> None:
        """Bind a streaming DataFrame; the translator picks it over the batch
        table of the same name when translating in streaming mode."""
        self._streams[name] = df

    def table(self, name: str, streaming: bool = False) -> DataFrame:
        if streaming and name in self._streams:
            return self._streams[name]
        if name in self._tables:
            return self._tables[name]
        if self.base_dir:
            path = os.path.join(self.base_dir, f"{name}.parquet")
            if os.path.exists(path):
                df = self._read_parquet(path)
                self._tables[name] = df
                return df
        raise KqlSemanticError(f"unknown table: {name!r}")

    def _read_parquet(self, path: str) -> DataFrame:
        """Read parquet; transparently handle timestamp[ns] columns, which
        Spark 4's reader rejects (PARQUET_TYPE_ILLEGAL). Footer inspection is
        driver-side metadata only — no data scan, so this stays O(files) and
        is safe at 100 TB table sizes."""
        ns_cols = _nanos_timestamp_columns(path)
        if not ns_cols:
            return self.spark.read.parquet(path)
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        from pyspark.sql import functions as F

        for c in ns_cols:
            # nanos -> micros truncation (KQL 100ns ticks -> µs, SURVEY §1.2).
            # `div` = exact integral division: a double `/ 1000` would round
            # up across µs boundaries for ns remainders >= ~875 (observed in
            # the fixtures) and diverge from the DuckDB oracle's truncation.
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        return df

    def has(self, name: str) -> bool:
        if name in self._tables or name in self._streams:
            return True
        return bool(
            self.base_dir
            and os.path.exists(os.path.join(self.base_dir, f"{name}.parquet"))
        )


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) (footer-only check)."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def fixture_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)
