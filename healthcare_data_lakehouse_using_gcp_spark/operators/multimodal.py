"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference LLM-data-pipeline operators (BASELINE.json north
star). Images/audio/video are `binary` columns with typed metadata
(schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, mapInPandas signatures — is real and
tested; the actual codec step is STUBBED (no image/audio libraries in
this container) behind `decode_stub`, which either raises
NotImplementedError (strict mode) or produces a deterministic fake
feature vector derived from the payload bytes.

Scale design: mapInPandas streams Arrow batches through Python, so
payloads never collect on the driver; `repartition_for_media` sizes
partitions by estimated payload bytes (binary columns make the
default split-by-row-count wildly uneven).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_stub(payload: bytes, modality: str, strict: bool = False) -> list[float]:
    """Deterministic fake decode: payload bytes → FEATURE_DIM floats.

    Real implementation would dispatch to PIL/librosa/pyav per
    modality; those libs aren't in this container.
    """
    if strict:
        raise NotImplementedError(
            f"codec for modality={modality!r} not available in this environment"
        )
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def repartition_for_media(
    df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024, payload_col: str = "payload"
) -> DataFrame:
    """Repartition by estimated payload volume, not row count.

    Uses a cheap count+avg sample to pick numPartitions; on a real
    cluster feed this the table-level size stats instead.
    """
    stats = df.select(
        F.count(F.lit(1)).alias("n"), F.avg(F.length(payload_col)).alias("avg_bytes")
    ).first()
    total = int((stats["n"] or 0) * (stats["avg_bytes"] or 0))
    num = max(1, total // target_partition_bytes + 1)
    return df.repartition(num)


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    Column pruning matters at scale: we select only the columns the
    UDF needs before the python exchange so whole image payload
    batches aren't joined by unused metadata.
    """
    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_stub(p, m, strict)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    from .dedup import ensure_parallelism

    return ensure_parallelism(df.select("media_id", "modality", "payload")).mapInPandas(
        _extract, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, ts_col: str = "duration_ms"
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled frame offset (decode itself stubbed). Pure built-in
    expressions: sequence + explode — the expensive decode only ever
    sees the sampled offsets."""
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_offset_ms",
            F.explode(F.sequence(F.lit(0), F.col(ts_col) - 1, F.lit(every_ms))),
        )
        .select("media_id", "frame_offset_ms", "payload")
    )


def resize_metadata(df: DataFrame, max_dim: int = 512) -> DataFrame:
    """Resize planning as pure metadata arithmetic (aspect-preserving
    clamp to max_dim); the pixel work would happen in the decode UDF."""
    scale = F.when(
        F.greatest("width", "height") > max_dim,
        max_dim / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return df.withColumns(
        {
            "resize_scale": F.round(scale, 6),
            "target_width": F.ceil(F.col("width") * scale).cast("int"),
            "target_height": F.ceil(F.col("height") * scale).cast("int"),
        }
    )
