"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as `binary` columns with a typed
metadata struct; decode/feature kernels are Arrow-batched mapInPandas.

Decode status:
* REAL pure-numpy decoders for headerful uncompressed formats —
  binary PPM/PGM (P6/P5), uncompressed 24/32-bit BMP, PCM WAV — parse
  dimensions/sample counts and, for images, the pixel block; image
  embeddings are a 4x4 mean-pooled grayscale grid (16 dims, normalized),
  i.e. an actual content descriptor.
* Formats needing codec libraries (JPEG/PNG/MP3/...) decode for real
  when PIL / soundfile are importable (probed at import time — a
  production container gets real decode with no code change); without
  them they fall back to seeded, shape-correct deterministic fakes so
  the Spark-side plumbing — schema, batching, partitioning, UDF
  signatures — stays real and tested either way.
"""

from __future__ import annotations

import hashlib
import io
from typing import Iterator

import numpy as np
import pandas as pd

# Optional codec libraries: probed at import, used when present (a
# production image/audio container), with the deterministic fallback kept
# for environments without them — decoder tests parameterize over both.
try:  # pragma: no cover - availability depends on the container
    from PIL import Image as _PIL_Image
except Exception:  # pragma: no cover
    _PIL_Image = None
try:  # pragma: no cover
    import soundfile as _soundfile
except Exception:  # pragma: no cover
    _soundfile = None
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


def _decode_ppm(payload: bytes):
    """Binary PPM/PGM (P6/P5): returns (width, height, gray ndarray)."""
    if not payload[:2] in (b"P6", b"P5"):
        return None
    # header: magic, whitespace/comments, width, height, maxval, one ws
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in toks)
    except (ValueError, TypeError):
        return None
    ch = 3 if payload[:2] == b"P6" else 1
    need = w * h * ch * (2 if maxval > 255 else 1)
    px = np.frombuffer(payload, dtype=np.uint8, count=min(need, len(payload) - i),
                       offset=i)
    if len(px) < need or maxval > 255:
        return None
    px = px.reshape(h, w, ch).astype(np.float32)
    gray = px.mean(axis=2) if ch == 3 else px[:, :, 0]
    return w, h, gray


def _decode_bmp(payload: bytes):
    """Uncompressed 24/32-bit BMP: returns (width, height, gray ndarray)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    nch = bpp // 8
    rows = abs(h)
    stride = (w * nch + 3) & ~3
    if off + stride * rows > len(payload):
        return None
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * rows,
                         offset=off)
    px = data.reshape(rows, stride)[:, : w * nch].reshape(rows, w, nch)
    if h > 0:
        px = px[::-1]  # bottom-up rows
    gray = px[:, :, :3].astype(np.float32).mean(axis=2)
    return w, rows, gray


def _decode_wav(payload: bytes):
    """PCM WAV header: returns (n_samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    rate, bits, nch, data_len = None, None, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            nch = int.from_bytes(payload[i + 10 : i + 12], "little")
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_len = size
        i += 8 + size + (size & 1)
    if not (rate and bits and nch and data_len):
        return None
    return data_len // (nch * max(bits // 8, 1)), rate


def _grid_embedding(gray: np.ndarray) -> np.ndarray:
    """4x4 mean-pooled grayscale grid -> 16-dim normalized descriptor."""
    h, w = gray.shape
    ys = np.linspace(0, h, 5).astype(int)
    xs = np.linspace(0, w, 5).astype(int)
    v = np.array(
        [
            gray[ys[r] : max(ys[r + 1], ys[r] + 1),
                 xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
            for r in range(4)
            for c in range(4)
        ],
        dtype=np.float32,
    )
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def _decode_pil(payload: bytes):
    """PIL-backed image decode (JPEG/PNG/...) when the library exists:
    returns (width, height, gray ndarray) like the numpy decoders."""
    if _PIL_Image is None:
        return None
    try:
        im = _PIL_Image.open(io.BytesIO(payload))
        gray = np.asarray(im.convert("L"), dtype=np.float64)
        w, h = im.size
        return w, h, gray
    except Exception:
        return None


def _decode_soundfile(payload: bytes):
    """soundfile-backed audio decode when the library exists: returns
    (n_samples, sample_rate) like _decode_wav."""
    if _soundfile is None:
        return None
    try:
        data, rate = _soundfile.read(io.BytesIO(payload))
        return int(len(data)), int(rate)
    except Exception:
        return None


def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """Dimensions via the real decoders when the format allows;
    deterministic fake otherwise (codec-library formats)."""
    real = _decode_ppm(payload) or _decode_bmp(payload) or _decode_pil(payload)
    if real is not None:
        w, h, _ = real
        return w, h, 1
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
                img = (
                    _decode_ppm(payload)
                    or _decode_bmp(payload)
                    or _decode_pil(payload)
                )
                wav = (
                    (_decode_wav(payload) or _decode_soundfile(payload))
                    if img is None
                    else None
                )
                if img is not None:
                    w, hgt, nf = img[0], img[1], 1
                    emb = _grid_embedding(img[2])
                elif wav is not None:
                    # audio: "width"=sample_rate, "height"=1, frames=samples
                    w, hgt, nf = wav[1], 1, wav[0]
                    emb = _fake_embedding(payload)
                else:
                    w, hgt, nf = _decode_image(payload)
                    emb = _fake_embedding(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": hgt,
                        "n_frames": nf if kind in ("video", "audio") else 1,
                        "embedding": emb.tolist(),
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


def make_ppm(width: int, height: int, seed: int) -> bytes:
    """Deterministic binary P6 image (REAL decodable payload)."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + px.tobytes()


def make_wav(n_samples: int, rate: int, seed: int) -> bytes:
    """Deterministic 16-bit mono PCM WAV (REAL decodable payload)."""
    rng = np.random.RandomState(seed)
    data = (rng.normal(0, 3000, n_samples)).astype("<i2").tobytes()
    hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + len(data).to_bytes(4, "little"))
    return hdr + data


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: REAL PPM images and PCM WAVs
    (exercising the pure-numpy decoders) plus fake-codec video payloads
    (exercising the declared fallback)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = make_ppm(16 + i % 13, 12 + i % 7, seed=i)
        elif kind == "audio":
            payload = make_wav(800 + 37 * i, 8000 + 100 * (i % 5), seed=i)
        else:
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
