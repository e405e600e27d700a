"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures — while the actual codec work is stubbed behind
deterministic fakes (the container ships no image/audio libraries). On a
real cluster you swap `_decode_image_stub` for PIL/torchvision inside the
same mapInPandas; nothing else changes.

Mirrors the reference's WHOLE_FILE data format (binary pass-through with
metadata, commonlib/.../config/DataFormat.java:29-39) extended with the
feature-extraction stages a training pipeline needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat_dim", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = ASCII bytes of a
    sha256 hex digest) for exercising the plumbing at any scale — columnar
    generation, no driver loop. All derivations are pure modular arithmetic
    + sha256, so a SQL oracle reproduces every column exactly."""
    i = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(i * 2654435761 + seed, F.lit(3)) + 1).cast("int"),
    )
    # hex string cast to binary = its 64 ASCII bytes (reproducible cross-engine)
    payload = F.sha2(F.concat(F.lit("payload-"), i.cast("string")), 256).cast("binary")
    return spark.range(n).select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (F.pmod(i * 48271 + seed, F.lit(512)) + 32).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(i * 69621 + seed, F.lit(512)) + 32).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(i * 16807 + seed, F.lit(60000)) + 1000).cast("int")).alias("duration_ms"),
        payload.alias("payload"),
    )


try:  # self-upgrade when a real codec is on the cluster (not in this sandbox)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None


def _decode_image_stub(payload: bytes, dim: int) -> np.ndarray:
    """Decode + embed. When PIL is importable AND the payload parses as a
    real image, decodes for real: resize to a dim x 1 grayscale strip and
    return the normalized pixel row (the drop-in slot for a model forward).
    Otherwise falls back to the DECLARED deterministic fake (payload bytes
    as uint32s), which the synthetic gate tables and DuckDB oracle
    reproduce exactly. Raises NotImplementedError for None payloads, like a
    real decoder."""
    if payload is None:
        raise NotImplementedError("real decoder required for empty payload")
    if _PILImage is not None:
        import io

        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
            return (np.asarray(img, dtype=np.float64)[0] / 255.0).astype(np.float32)
        except Exception:
            pass  # not a real image (e.g. the synthetic gate payloads)
    rng = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype=np.uint32)
    return (rng[:dim].astype(np.float64) / np.float64(2**32)).astype(np.float32)


def extract_image_features(df: DataFrame, dim: int = 16, batch_limit: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow delivers the binary
    column in columnar batches; the pandas function vectorizes over the
    batch. Batch shape (<= batch_limit rows) bounds executor memory when
    payloads are large — set spark.sql.execution.arrow.maxRecordsPerBatch
    accordingly at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_decode_image_stub(payload, dim).tolist())
                    ok.append(True)
                except NotImplementedError:
                    feats.append([0.0] * dim)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat_dim": dim,
                    "features": feats,
                    "decode_ok": ok,
                }
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, IMAGE_FEATURES_SCHEMA)
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (posexplode over a JVM-computed sequence — the row-multiplying part needs
    no Python at all; only the per-frame decode would)."""
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "mime")
    )
