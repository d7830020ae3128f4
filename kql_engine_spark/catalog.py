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
        self._registered: set[str] = set()  # user-supplied DataFrames
        self._streams: dict[str, DataFrame] = {}
        self._external: dict[str, tuple] = {}   # external_table() bindings
        self._matviews: dict[str, str] = {}     # materialized_view() paths
        self._single_split: dict[str, bool] = {}  # single_split() memo
        self._row_count: dict[str, int | None] = {}  # row_count() memo

    def register(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        self._registered.add(name)

    def register_external(
        self,
        name: str,
        path: str,
        fmt: str = "parquet",
        schema=None,
        options: dict | None = None,
    ) -> None:
        """Bind `external_table('name')` [KQL] to a path outside the
        database: any Spark DataSource format (parquet/csv/json/delta/...)
        — the 100 TB deployment points this at object-store URIs; reads
        stay lazy scans with full pushdown."""
        self._external[name] = (path, fmt, schema, dict(options or {}))

    def external_table(self, name: str) -> DataFrame:
        if name not in self._external:
            raise KqlSemanticError(
                f"external table {name!r} is not registered (call "
                "catalog.register_external(name, path, fmt=...))"
            )
        path, fmt, schema, options = self._external[name]
        reader = self.spark.read.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        if fmt in ("csv",):
            options = {"header": "true", **options}
        if options:
            reader = reader.options(**options)
        return reader.load(path)

    def register_bucketed(self, name: str, table: str | None = None) -> None:
        """Bind a KQL table name to a BUCKETED managed table written by
        sinks.write_bucketed (round 13 — the zero-Exchange layout lever
        measured at -31% on the q18 pre-agg shape in round 12 becomes an
        engine feature instead of deployment guidance). The bucketing
        metadata flows from the session catalog into every scan of the
        name, so joins/aggregations keyed on the bucket column plan
        WITHOUT an Exchange (plan-pinned in tests/test_plans.py).

        Validates the table exists AND actually carries a bucket spec —
        silently binding an unbucketed table would keep queries working
        while losing the co-location property the caller registered it
        for."""
        table = table or name
        if not self.spark.catalog.tableExists(table):
            raise KqlSemanticError(
                f"register_bucketed: no managed table {table!r} in the "
                "session catalog — write it with sinks.write_bucketed first"
            )
        qualified = ".".join(f"`{p}`" for p in table.split("."))
        desc = self.spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect()
        if not any(r.col_name == "Num Buckets" for r in desc):
            raise KqlSemanticError(
                f"register_bucketed: table {table!r} has no bucket spec — "
                "it was not written with sinks.write_bucketed(bucket_by=...)"
            )
        self.register(name, self.spark.table(table))

    def register_matview(self, name: str, path: str) -> None:
        """Bind `materialized_view('name')` [KQL] to the parquet directory a
        streaming materialize_to_parquet sink maintains."""
        self._matviews[name] = path

    def materialized_view(self, name: str) -> DataFrame:
        if name not in self._matviews:
            raise KqlSemanticError(
                f"materialized view {name!r} is not registered (call "
                "catalog.register_matview(name, path) after "
                "materialize_to_parquet)"
            )
        return self._read_parquet(self._matviews[name])

    def names(self) -> list[str]:
        """Known table names: explicitly registered + parquet files present
        in base_dir (driver-side os.listdir — metadata only)."""
        out = set(self._tables)
        if self.base_dir and os.path.isdir(self.base_dir):
            out.update(
                f[: -len(".parquet")]
                for f in os.listdir(self.base_dir)
                if f.endswith(".parquet")
            )
        return sorted(out)

    def file_size(self, name: str) -> int | None:
        """On-disk bytes of the parquet backing a table, or None when the
        table is an explicitly registered DataFrame (size unknown — callers
        must treat that conservatively). Driver-side stat only."""
        if name in self._registered:
            return None
        if self.base_dir:
            path = os.path.join(self.base_dir, f"{name}.parquet")
            if os.path.isfile(path):
                return os.path.getsize(path)
            if os.path.isdir(path):
                return sum(
                    os.path.getsize(os.path.join(root, f))
                    for root, _, files in os.walk(path)
                    for f in files
                )
        return None

    def row_count(self, name: str) -> int | None:
        """Footer num_rows of a single-file parquet table, or None when
        unknowable (registered DataFrame, directory table, unreadable
        footer). Driver-side footer read only, memoized — a row count is
        a better scale proxy than on-disk bytes for highly compressible
        text (round 18: a 500k-row corpus can zstd to under 5 MB)."""
        hit = self._row_count.get(name)
        if hit is not None or name in self._row_count:
            return hit
        out: int | None = None
        if name not in self._registered and self.base_dir:
            path = os.path.join(self.base_dir, f"{name}.parquet")
            if os.path.isfile(path):
                try:
                    import pyarrow.parquet as pq

                    out = pq.ParquetFile(path).metadata.num_rows
                except Exception:
                    out = None
        self._row_count[name] = out
        return out

    def single_split(self, name: str) -> bool:
        """True iff the table is backed by ONE parquet file holding at most
        one row group — i.e. Spark cannot parallelize the scan no matter
        how small the split size is set (a parquet row group is the
        minimum split unit), so a plan that trades scan parallelism for
        fewer stages loses nothing. Footer-only driver-side read (same
        class as _nanos_timestamp_columns), memoized per name; any doubt
        (registered DataFrame, directory table, unreadable footer) returns
        False so callers stay conservative."""
        hit = self._single_split.get(name)
        if hit is not None:
            return hit
        out = False
        if name not in self._registered and self.base_dir:
            path = os.path.join(self.base_dir, f"{name}.parquet")
            if os.path.isfile(path):
                try:
                    import pyarrow.parquet as pq

                    out = pq.ParquetFile(path).metadata.num_row_groups <= 1
                except Exception:
                    out = False
        self._single_split[name] = out
        return out

    def register_stream(self, name: str, df: DataFrame) -> None:
        """Bind a streaming DataFrame; the translator picks it over the batch
        table of the same name when translating in streaming mode."""
        self._streams[name] = df

    def table(self, name: str, streaming: bool = False) -> DataFrame:
        if streaming:
            if name in self._streams:
                return self._streams[name]
            df = self.open_stream(name)
            if df is not None:
                return df
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

    def open_stream(self, name: str) -> DataFrame | None:
        """Open a fixture parquet table as a readStream source (SURVEY §2.11).
        Schema comes from the batch read; the same ns->µs timestamp handling
        applies. Optional watermark/max-files knobs are set by kql_stream."""
        if not self.base_dir:
            return None
        path = os.path.join(self.base_dir, f"{name}.parquet")
        if not os.path.exists(path):
            return None
        from pyspark.sql import functions as F

        ns_cols = _nanos_timestamp_columns(path)
        if ns_cols:
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = self.spark.read.parquet(path).schema
        reader = (
            self.spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", f"{name}.parquet")
        )
        max_files = getattr(self, "_stream_max_files", None)
        if max_files:
            reader = reader.option("maxFilesPerTrigger", int(max_files))
        df = reader.parquet(self.base_dir)
        for c in ns_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        wm = getattr(self, "_stream_watermark", None)
        if wm and wm[0] in df.columns:
            from pyspark.sql import types as T

            # withWatermark requires TIMESTAMP (LTZ); parquet TIMESTAMP
            # without UTC-adjustment reads as NTZ under Spark 4's
            # inferTimestampNTZ. Session tz is pinned UTC (session.py), so
            # the cast is value-preserving.
            if isinstance(df.schema[wm[0]].dataType, T.TimestampNTZType):
                df = df.withColumn(wm[0], F.col(wm[0]).cast("timestamp"))
            df = df.withWatermark(wm[0], wm[1])
        self._streams[name] = df
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
