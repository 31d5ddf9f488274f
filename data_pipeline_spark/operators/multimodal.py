"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
UDFs so each task processes a columnar batch of blobs without per-row Python
overhead on the Spark side.

The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container, so the
decode kernels are STUBBED: ``decode_stub=True`` (default) substitutes a
deterministic fake decoder (shape/feature values derived from the blob bytes)
keeping ALL Spark-side plumbing — schema, batch iteration, partition sizing,
output contract — real and tested; ``decode_stub=False`` raises
NotImplementedError at the kernel boundary, the marked integration point.

Scale notes: blobs dominate partition size, so callers repartition by a size
budget (``target_rows_per_partition``) not by row count heuristics; metadata
filters (media_type, byte length) are plain columns → pushed down to Parquet
so a "sample 1 frame of every >10s video" job never reads image bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(content: pd.Series, dim: int) -> pd.Series:
    """Deterministic fake 'decoder': features from blob byte sums (vectorized).

    Stands in for the real kernel so batch shape / schema / determinism are
    testable without codecs.
    """
    import numpy as np

    lengths = content.map(len).to_numpy(dtype="int64")  # cheap metadata op
    first = content.map(lambda b: b[0] if len(b) else 0).to_numpy(dtype="int64")
    base = (lengths[:, None] * 2654435761 + first[:, None] * 40503 + np.arange(dim)[None, :]) % 1000
    feats = (base / 999.0).astype("float32")
    return pd.Series(list(feats))


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decode_stub: bool = True,
    target_rows_per_partition: int | None = None,
) -> DataFrame:
    """Decode + feature-extract media blobs → FEATURE_SCHEMA rows.

    Real pipeline: replace the stub branch with the codec call; everything
    else (mapInPandas batching, schema, partition sizing) is production code.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg — "
                    "not available in this environment (stub boundary)"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": _fake_decode_features(pdf["content"], dim),
                }
            )
            yield out

    # blobs dominate memory: optionally re-bucket to a row budget per task
    # (costs one count job — callers opt in when upstream partitioning is bad)
    if target_rows_per_partition:
        n_parts = max(1, media.count() // target_rows_per_partition)
        media = media.repartition(n_parts, "media_id")
    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling WITHOUT touching blob bytes: one output row per
    (video, frame_ts) — pure column math on metadata, pushed-down filters.
    The decode of each planned frame is a later ``extract_features`` pass."""
    vids = media.where(F.col("media_type") == "video").where(
        F.col("meta.duration_ms").isNotNull() & (F.col("meta.duration_ms") > 0)
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def _lcg(seed: int, tag: int, id_col, i=None):
    """Portable integer hash (same LCG family as similarity._hyperplane_sign):
    exact BIGINT arithmetic any SQL engine reproduces verbatim — the
    multimodal rollup's DuckDB oracle recomputes blob lengths / first bytes
    from this formula without running the kernel."""
    k = F.lit(seed * 1_000_003 + tag * 10_007).cast("long") + F.col(id_col).cast("long") * F.lit(257)
    if i is not None:
        k = k + i.cast("long")
    return F.pmod(k * F.lit(1103515245) + F.lit(12345), F.lit(2147483647))


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table (for tests/benches — no external data).

    Blob characters stay in the ASCII range (1 UTF-8 byte each) so byte
    lengths equal character counts — the arithmetic an oracle recomputes.
    Generated Spark-side; scales without driver involvement.
    """
    base = spark.range(n)
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (_lcg(seed, 1, "id") % 3 + 1).cast("int"),
    )
    blob_len = (_lcg(seed, 2, "id") % 200 + 16).cast("int")
    blob = F.aggregate(
        F.sequence(F.lit(1), blob_len),
        F.lit("").cast("string"),
        lambda acc, i: F.concat(acc, F.chr(_lcg(seed, 3, "id", i) % 128)),
    ).cast("binary")
    return base.select(
        F.concat(F.lit("m_"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_id"),
        mtype.alias("media_type"),
        blob.alias("content"),
        F.struct(
            F.when(mtype == "image", (_lcg(seed, 4, "id") % 1920 + 16).cast("int")).alias("width"),
            F.when(mtype == "image", (_lcg(seed, 5, "id") % 1080 + 16).cast("int")).alias("height"),
            F.when(mtype != "image", (_lcg(seed, 6, "id") % 30000 + 500).cast("int")).alias("duration_ms"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )
