"""Multimodal media columns: opaque binary payloads + typed metadata,
with batched decode / feature-extract / resize / frame-sample plumbing.

The extraction pipeline emits media spans carrying a ``media_ref``
(img:// URIs from <img src> cells, TableItem.img in the reference,
/root/reference/src/tableExtract/TableItem.py:42). At 100 TB the media
bytes live in their own table keyed by media_ref:

    media(media_ref string, kind string, payload binary,
          meta struct<width int, height int, n_frames int,
                      sample_rate int, mime string>)

Spark-side design (all real and tested):

* payloads are opaque ``binary`` columns — Spark never interprets them;
* every media op is ``mapInPandas`` over Arrow batches (bytes move as
  Arrow buffers, zero per-row Python visible to Spark);
* batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a batch of large payloads can't blow worker memory;
* ops are partition-local (narrow) — no shuffle; co-partitioning with the
  spans table by ``pmod(xxhash64(media_ref), n)`` makes the span<->media
  join a local zipper at scale.

Codecs: binary PPM (P6) and uncompressed 24-bit BMP decode FOR REAL in
pure numpy/stdlib (round-trip tested); compressed formats (PNG/JPEG)
need image libraries absent from this container and are stubbed —
``decode_image`` raises NotImplementedError for them unless
``fake=True``, in which case a deterministic fake decoder (md5-seeded
pixel stats) stands in. The Spark plumbing — schema, batching,
partitioning, UDF signatures — is real and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("mime", T.StringType()),
])

MEDIA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

N_IMG_FEATURES = 16


def synth_media_for_spans(spans_out: DataFrame) -> DataFrame:
    """Deterministic media table for every media span: payload bytes and
    metadata derived from md5(media_ref). Stands in for the real object
    store; schema and sizes are realistic, content is fake."""

    def gen(batches):
        for pdf in batches:
            refs = pdf["media_ref"].tolist()
            rows = []
            for ref in refs:
                h = hashlib.md5(ref.encode()).digest()
                size = 256 + h[0] * 16
                payload = (h * ((size // 16) + 1))[:size]
                rows.append({
                    "media_ref": ref,
                    "kind": "image",
                    "payload": payload,
                    "meta": {"width": 16 + h[1] % 64, "height": 16 + h[2] % 64,
                             "n_frames": 1, "sample_rate": 0,
                             "mime": "image/fake"},
                })
            yield pd.DataFrame(rows)

    refs = spans_out.where(F.col("kind") == "media") \
        .select("media_ref").distinct()
    return refs.mapInPandas(gen, schema=MEDIA)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> HxWx3 uint8. Pure numpy/stdlib.
    Header = 'P6', width, height, maxval as whitespace-separated ASCII
    tokens ('#' comments allowed), one whitespace byte, then raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    i = 2
    n = len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j:j + 1].isdigit():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    if len(tokens) < 3 or not payload[i:i + 1].isspace():
        raise ValueError("truncated PPM header")
    w, h, maxval = tokens
    if not (0 < maxval <= 255 and w > 0 and h > 0):
        raise ValueError(f"unsupported PPM dims/maxval {tokens}")
    body = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=i + 1)
    if body.size < w * h * 3:
        raise ValueError("truncated PPM body")
    return body.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> HxWx3 uint8.
    Bottom-up (positive height) or top-down rows, BGR channel order,
    rows padded to 4-byte multiples. Pure numpy/stdlib."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")

    def u32(o):
        return int.from_bytes(payload[o:o + 4], "little")

    def s32(o):
        return int.from_bytes(payload[o:o + 4], "little", signed=True)

    off = u32(10)
    w = s32(18)
    h = s32(22)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = u32(30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < off + stride * h:
        raise ValueError("truncated BMP body")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return img.copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM payload (test/source-side helper)."""
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> uncompressed 24-bit bottom-up BMP payload."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    raw = body.tobytes()
    header = (b"BM" + (54 + len(raw)).to_bytes(4, "little") + b"\0\0\0\0"
              + (54).to_bytes(4, "little"))
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
           + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (24).to_bytes(2, "little") + b"\0" * 24)
    return header + dib + raw


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    REAL formats (pure numpy/stdlib, no external libs): binary PPM (P6)
    and uncompressed 24-bit BMP — sniffed by magic bytes. Compressed
    formats (PNG/JPEG) still need an image library absent from this
    container: those raise NotImplementedError, or fall back to the
    deterministic md5-seeded fake decoder when ``fake=True`` (which the
    synthetic pipeline uses so random payloads stay decodable)."""
    try:
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
    except ValueError:
        # magic matched but the body didn't parse. With fake=True this is
        # expected for random synthetic payloads and falls through to the
        # fake decoder (keeps x_media_features deterministic); with
        # fake=False it is a CORRUPT file of a supported format — re-raise
        # as such rather than claiming the format is unsupported.
        if not fake:
            raise
    if not fake:
        raise NotImplementedError(
            "only PPM(P6) and 24-bit BMP are decodable without image "
            "libraries; pass fake=True for the deterministic test decoder"
        )
    h = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    side = 8 + h[8] % 8
    return rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_ref, features array<float>, width, height) via one batched
    mapInPandas pass: decode -> per-channel stats -> fixed-dim vector."""

    def run(batches):
        for pdf in batches:
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), fake=fake)
                v = np.zeros(N_IMG_FEATURES, dtype=np.float32)
                v[0:3] = img.mean(axis=(0, 1)) / 255.0
                v[3:6] = img.std(axis=(0, 1)) / 255.0
                v[6] = img.shape[0] / 64.0
                v[7] = img.shape[1] / 64.0
                hist, _ = np.histogram(img[..., 0], bins=8, range=(0, 256))
                v[8:16] = hist / max(1, img.shape[0] * img.shape[1])
                feats.append(v.tolist())
                widths.append(img.shape[1])
                heights.append(img.shape[0])
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "features": feats,
                "width": pd.array(widths, dtype="int32"),
                "height": pd.array(heights, dtype="int32"),
            })

    return media.mapInPandas(
        run,
        schema=("media_ref string, features array<float>, "
                "width int, height int"),
    )


def resize_images(media: DataFrame, target: int = 8,
                  fake: bool = True) -> DataFrame:
    """Batched resize (nearest-neighbor on the fake decode) returning new
    payloads — exercises binary-in/binary-out Arrow round-tripping."""

    def run(batches):
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), fake=fake)
                idx = (np.linspace(0, img.shape[0] - 1, target).astype(int),
                       np.linspace(0, img.shape[1] - 1, target).astype(int))
                small = img[np.ix_(idx[0], idx[1])]
                out.append(small.tobytes())
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "payload": out,
                "width": pd.array([target] * len(out), dtype="int32"),
                "height": pd.array([target] * len(out), dtype="int32"),
            })

    return media.mapInPandas(
        run, schema="media_ref string, payload binary, width int, height int"
    )


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-kind media: emits one row per
    sampled frame index (pure Catalyst: sequence + explode; the decode of
    each frame would plug into decode_image batch-wise)."""
    return (
        media.select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                           F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
