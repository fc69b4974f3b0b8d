"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as `binary` columns with a typed
metadata struct; decode/feature kernels are Arrow-batched mapInPandas.
The decode internals are STUBBED (image/audio libs are not in this
container): `deterministic_fake_decode` produces seeded, shape-correct
fakes so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested; swap `_decode_image` for a PIL/ffmpeg
call in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.StringType()),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int, embedding array<float>"
)

EMBED_DIM = 16


def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB: a real implementation would decode with PIL/opencv.
    Deterministic fake: dimensions derived from the payload hash."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    n_frames = 1 if h[2] % 4 else 1 + h[3] % 16
    return width, height, n_frames


def _fake_embedding(payload: bytes) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    v = rng.normal(size=EMBED_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape note: binary payloads can be MBs each — cap
    spark.sql.execution.arrow.maxRecordsPerBatch (session default 4096)
    or repartition by size so a batch fits executor memory."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                w, hgt, nf = _decode_image(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": hgt,
                        "n_frames": nf if kind == "video" else 1,
                        "embedding": _fake_embedding(payload).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Planning operator for video frame sampling: one output row per
    (media_id, frame_idx) to be decoded downstream — the explode happens
    in Catalyst, the (stubbed) decode in the Arrow kernel."""
    feats = extract_media_features(media.where(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kinds[i % 3],
                f"application/x-fake-{kinds[i % 3]}",
                bytearray(payload),
                {"source": f"synthetic/{i}"},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
