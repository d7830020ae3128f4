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


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def fake_resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas 1->1 resize shape: (content, meta) -> RESIZED_IMAGE_SCHEMA.
    The fake kernel emits a deterministic payload of width*height/64 bytes
    derived from sha256(content) — a real PIL/libvips kernel replaces only
    the bytes computation; schema, batching and partitioning are real."""
    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            out = []
            for b in pdf["content"]:
                seed = hashlib.sha256(bytes(b) + f"{width}x{height}".encode()).digest()
                n = max(1, width * height // 64)
                out.append((seed * (n // len(seed) + 1))[:n])
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return df.mapInPandas(resize, RESIZED_IMAGE_SCHEMA)


def fake_sample_frames(df: DataFrame, n_frames: int, fps: float = 1.0) -> DataFrame:
    """mapInPandas 1->N frame-sampling shape: each video row explodes into
    n_frames rows (frame_idx, ts_sec, frame bytes). This exercises the
    expanding-batch contract a real ffmpeg sampler has — output row count
    differs from input row count, which mapInPandas supports natively."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            rows = {"path": [], "frame_idx": [], "ts_sec": [], "frame": []}
            for path, b in zip(meta["path"], pdf["content"]):
                payload = bytes(b)
                for i in range(n_frames):
                    seed = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
                    rows["path"].append(path)
                    rows["frame_idx"].append(i)
                    rows["ts_sec"].append(round(i / fps, 6))
                    rows["frame"].append(seed)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, FRAME_SCHEMA)


def fake_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas 1->1 audio feature extraction: deterministic fake
    duration/sample-rate/RMS from sha256(content). Swap in soundfile/librosa
    for the real kernel; the Arrow batch shape is identical."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            feats = []
            for b in pdf["content"]:
                h = hashlib.sha256(bytes(b) or b"").digest()
                feats.append(
                    (
                        round(1.0 + int.from_bytes(h[0:2], "big") / 65535.0 * 299.0, 4),
                        (8000, 16000, 22050, 44100, 48000)[h[2] % 5],
                        round(int.from_bytes(h[3:5], "big") / 65535.0, 6),
                    )
                )
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "duration_sec": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
