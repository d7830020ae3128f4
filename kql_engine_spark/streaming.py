"""Structured Streaming surface (SURVEY.md §2.11, §3.4).

The SAME translator runs on streaming inputs: `kql_stream` binds table names
to `readStream` sources and translates the query in streaming mode.
Streaming-specific behavior (watermark, output mode) is configured at
materialization time, not in the query text — mirroring Kusto, whose
language has no watermark syntax (update policies / materialized views own
those semantics).

Tumbling windows come from `bin(ts, ...)` (identical results batch vs
stream); hopping/session windows are the `hopping_window` / `session_window`
extension functions (registered in functions/scalar.py -> F.window /
F.session_window), usable in batch too — the batch twin is the oracle.

Scale notes: micro-batch only; state store size is bounded by watermarking
(`lateness`); parquet sources split per-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .errors import KqlLimitError
from .parser import parse
from .translator import PipeTranslator


def kql_stream(
    spark: SparkSession,
    text: str,
    sf_dir: str | None = None,
    catalog: Catalog | None = None,
    watermark: tuple[str, str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Translate KQL text against STREAMING table bindings.

    Returns an unstarted streaming DataFrame — materialize with
    ``df.writeStream`` (use outputMode('complete'/'update') for aggregations
    without watermark, 'append' with one).

    watermark: optional (event_time_column, delay) applied to every stream
    source that has the column, e.g. ("ts", "10 minutes").
    """
    if catalog is None:
        catalog = Catalog(spark, sf_dir)
    q = parse(text)
    tr = PipeTranslator(spark, catalog, streaming=True)
    catalog._stream_watermark = watermark  # consumed by open_stream
    catalog._stream_max_files = max_files_per_trigger
    return tr.translate_query(q)


def run_to_memory(df: DataFrame, name: str, mode: str = "complete", timeout: int = 120):
    """Drain a streaming DataFrame into an in-memory table (test/dev sink):
    processes all currently-available input (availableNow) and returns the
    batch DataFrame of the result."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):  # round 15: same posture as
        q.stop()  # foreach_batch_kql — never hand back a partial table
        raise KqlLimitError(
            f"run_to_memory: query '{name}' did not drain available "
            f"input within {timeout}s"
        )
    return df.sparkSession.table(name)


def materialize_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    timeout: int = 120,
    catalog=None,
    name: str | None = None,
):
    """Materialized-view style sink (SURVEY §2.11 last row): drain the
    streaming result into a parquet directory via foreachBatch (so complete/
    update aggregation modes can still target files). Processes all
    currently-available input and stops — re-run to refresh incrementally.
    Pass catalog+name to also register the directory so batch queries can
    read it back via `materialized_view('name')`."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out_mode = "overwrite" if mode in ("complete", "update") else "append"
        batch_df.write.mode(out_mode).parquet(path)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode if mode != "update" else "update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):  # round 15: same posture as
        q.stop()  # foreach_batch_kql — a partial matview must not register
        raise KqlLimitError(
            f"materialize_to_parquet: query did not drain available input "
            f"within {timeout}s — stopped; re-run to resume from the "
            f"checkpoint at '{checkpoint}'"
        )
    if catalog is not None and name:
        catalog.register_matview(name, path)
    return path


def foreach_batch_kql(
    sdf: DataFrame,
    text: str,
    out_path: str,
    checkpoint: str,
    table: str = "batch",
    timeout: float = 120,
    idempotent: bool = False,
) -> str:
    """The streaming recipe for BATCH-ONLY operators (round 14, SURVEY
    §2.11/§2.12): dedup_against, decontaminate('path') and the index
    builders correctly raise typed errors on streaming inputs — their
    signature stages need a batch snapshot. The operational shape they
    exist for is the incremental crawl: dedupe each incoming MICRO-BATCH
    against a PERSISTED reference store (minhash_index_build over the
    existing training set), appending the survivors. This helper runs an
    arbitrary KQL pipeline over every micro-batch, bound as a batch
    table named ``table``::

        foreach_batch_kql(stream,
            "batch | evaluate dedup_against(text, doc_id, "
            "'/stores/train_mh', 0.8)", out_dir, ckpt_dir)

    Scale: only the micro-batch is shingled per trigger — the reference
    store is served lazily (band values plus the candidate fraction's
    gram arrays move, never the reference bytes), so per-batch cost is
    O(batch), not O(reference). Delivery is Structured Streaming's
    at-least-once for foreachBatch sinks: with the default
    ``idempotent=False`` a retried batch can re-append — pair with
    dedup_exact downstream where retries matter. ``idempotent=True``
    (round 15) makes retries exact-once instead: each micro-batch's
    result is written OVERWRITE into its own ``__batch_id=N`` hive
    partition (dynamic partition overwrite — only the partitions present
    in the data are replaced), so a redelivered batch replaces its own
    prior output rather than duplicating it. The output then carries the
    extra ``__batch_id`` partition column; at 100 TB this is also the
    natural retention/compaction unit for a rolling crawl. Processes all
    currently-available input (availableNow) and stops; re-run to drain
    new arrivals."""
    from .translator import kql as _kql  # local import: translator is heavy

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(batch_df.sparkSession)
        cat.register(table, batch_df)
        out = _kql(batch_df.sparkSession, text, catalog=cat)
        if idempotent:
            (
                out.withColumn("__batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_id")
                .parquet(out_path)
            )
        else:
            out.write.mode("append").parquet(out_path)

    q = (
        sdf.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on TIMEOUT with the query
    # still running (round 15, ADVICE): returning out_path then would let
    # the caller read partial output or start an overlapping run against
    # the same checkpoint. Stop the query and fail typed instead — the
    # checkpoint makes the re-run resume, not duplicate.
    if not q.awaitTermination(timeout):
        q.stop()
        raise KqlLimitError(
            f"foreach_batch_kql: query did not drain available input "
            f"within {timeout}s — stopped; re-run to resume from the "
            f"checkpoint at '{checkpoint}'"
        )
    return out_path
