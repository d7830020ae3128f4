"""Multimodal column support (SURVEY.md §2.12 last row).

Image/audio/video payloads are opaque `binary` columns with typed metadata —
the Spark-side plumbing (schemas, binaryFile source, Arrow-batched pandas
UDF shape) is REAL and tested; the decode kernels are STUBS because no
image/audio library ships in this container:

- ``fake_decode_image`` produces DETERMINISTIC FAKE features derived from a
  sha256 of the payload bytes. It exists to exercise the exact mapInPandas
  batch shape a real decoder (PIL/libvips) would use — swap the body, keep
  the plumbing.
- ``decode_image`` raises NotImplementedError, documenting the real-decoder
  contract.

Scale notes: binaryFile reads are split per-file (one row per object);
`maxPartitionBytes` governs batching. The pandas UDF path is Arrow-batched —
payload bytes cross the JVM->Python boundary once per batch, not per row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every binary payload column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("modified", T.TimestampType()),
        T.StructField("media_type", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)

_EXT_MEDIA = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def load_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Read a directory of media files as (content binary, meta struct).

    Uses Spark's binaryFile source: one row per file, split-per-file
    parallelism, lazy — metadata-only ops never read payload bytes.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_type = F.coalesce(
        *[F.when(ext == k, F.lit(v)) for k, v in _EXT_MEDIA.items()],
        F.lit("unknown"),
    )
    meta = F.struct(
        F.col("path").alias("path"),
        F.col("length").alias("length"),
        F.col("modificationTime").alias("modified"),
        media_type.alias("media_type"),
    )
    return df.select(F.col("content"), meta.alias("meta"))


def _fake_features(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE decode: features from sha256(payload). Replace with
    a real decoder (PIL.Image.open etc.) when the library is available."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 4
    mean_intensity = round(int.from_bytes(h[3:5], "big") / 65535.0 * 255.0, 4)
    return width, height, channels, mean_intensity


def fake_decode_image(df: DataFrame) -> DataFrame:
    """mapInPandas over (content, meta) -> IMAGE_FEATURES_SCHEMA rows.

    The batch shape is exactly what a real decoder uses: iterate Arrow
    batches, run the kernel per payload, emit a features frame. Only
    `_fake_features` is a stub.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_fake_features(bytes(b)) for b in pdf["content"]]
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "length": meta["length"].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_intensity": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — NOT IMPLEMENTED in this container (no PIL/libvips).
    Contract: same input/output schema as fake_decode_image."""
    raise NotImplementedError(
        "real image decoding requires an image library not present in this "
        "environment; use fake_decode_image for plumbing tests"
    )
