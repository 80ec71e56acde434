"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Beyond-reference extension (SURVEY.md §7 Phase 4).  The container has
no image/audio codecs, so the *decode* step is a clearly-marked stub
(deterministic fake derived from the payload bytes) — but the Spark
plumbing is real and the part that matters at 100 TB: schema, batch
iteration, partition-wise processing, and the UDF signature are exactly
what a real decoder would use (swap `_fake_decode` for PIL/ffmpeg).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of decoded media metadata
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_fake_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column (stand-in for image
    bytes) plus media_type metadata — deterministic from the text."""
    # md5-derived type selection (not xxhash64) so the DuckDB oracle
    # can reproduce it bit-for-bit
    sel = F.expr(f"pmod(cast(conv(substr(md5({text_col}), 17, 8), 16, 10) as bigint), 3)")
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav")),
            (sel + 1).cast("int")).alias("media_type"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decoder — the documented FALLBACK kernel (the sandbox has
    no media codecs): deterministic dimensions/features from the byte
    content so tests and oracles are stable.  Real deployments select
    a real kernel from the registry below (``kernel="png"`` is a real
    stdlib decoder; ``kernel="pil"`` wraps PIL when installed)."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 3
    feature = [b / 255.0 for b in h[:8]]
    return width, height, channels, feature


# ---------------------------------------------------------------------------
# kernel registry (round 6): decode is pluggable; the stub is the
# documented fallback, not the only path.
# ---------------------------------------------------------------------------

def _png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decoder on the stdlib alone (zlib): parses IHDR,
    inflates IDAT and undoes the per-scanline filters for 8-bit
    non-interlaced gray/RGB/gray+A/RGBA — enough to certify the
    pipeline decodes actual image bytes without PIL in the container.
    Returns (width, height, channels, raw pixel bytes)."""
    import struct
    import zlib
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = color_type = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk)
            if depth != 8 or interlace:
                raise NotImplementedError(
                    "png kernel handles 8-bit non-interlaced PNGs")
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise NotImplementedError(
            f"png kernel does not handle color type {color_type}")
    raw = zlib.decompress(idat)
    stride = w * nch
    if len(raw) < h * (1 + stride):
        raise ValueError(
            f"truncated PNG pixel data: {len(raw)} bytes for "
            f"{h}x{w}x{nch} ({h * (1 + stride)} expected)")
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    for _ in range(h):
        f = raw[i]
        i += 1
        line = bytearray(raw[i:i + stride])
        i += stride
        if f == 1:    # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 255
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 255
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 255
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += line
        prev = line
    return w, h, nch, bytes(out)


def _stub_kernel(payload: bytes, media_type: str):
    return _fake_decode(payload)


def _png_kernel(payload: bytes, media_type: str):
    if media_type is not None and media_type != "image/png":
        raise NotImplementedError(
            f"png kernel cannot decode {media_type!r}")
    w, h, nch, pix = _png_decode(payload)
    total = w * h * 255.0
    means = [sum(pix[c::nch]) / total for c in range(nch)]
    feature = (means + [0.0] * 8)[:8]
    return w, h, nch, feature


def _pil_kernel(payload: bytes, media_type: str):
    try:
        import io
        from PIL import Image
    except ImportError as ex:
        raise NotImplementedError(
            "pil kernel needs Pillow installed") from ex
    img = Image.open(io.BytesIO(payload))
    img.load()
    # normalize to an 8-bit mode first: 16-bit ('I;16'), float ('F')
    # and palette ('P') images would otherwise feed raw values /
    # palette indices into the /255 normalization
    if img.mode not in ("L", "LA", "RGB", "RGBA"):
        img = img.convert("RGBA" if "A" in img.mode else "RGB")
    nch = len(img.getbands())
    import numpy as np
    arr = np.asarray(img, dtype="float64") / 255.0
    means = list(arr.reshape(-1, nch).mean(axis=0)) if arr.size else []
    feature = ([float(m) for m in means] + [0.0] * 8)[:8]
    return img.width, img.height, nch, feature


#: name -> decode(payload, media_type) -> (w, h, channels, feature).
#: Resolved at the DRIVER and captured in the UDF closure: built-in
#: kernels pickle by reference, register_decode_kernel functions ship
#: by value via cloudpickle — so dynamic registrations reach executors
#: without any module-state synchronization.
DECODE_KERNELS = {
    "stub": _stub_kernel,
    "png": _png_kernel,
    "pil": _pil_kernel,
}


def register_decode_kernel(name: str, fn) -> None:
    """Plug in a real decoder: ``fn(payload: bytes, media_type: str)
    -> (width, height, channels, feature list)``."""
    DECODE_KERNELS[str(name)] = fn


def decode_media(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id",
                 kernel: str = "stub",
                 on_error: str = "raise") -> DataFrame:
    """Partition-wise decode via mapInPandas (Arrow batches).  The
    iterator signature keeps memory bounded: one pandas batch in, one
    out; no per-row Python overhead beyond the batch loop.

    ``kernel`` names a DECODE_KERNELS entry: 'stub' (fallback fake,
    sandbox default), 'png' (real stdlib decoder), 'pil' (Pillow when
    installed), or anything registered via
    :func:`register_decode_kernel`.

    ``on_error`` is the per-row isolation policy — at corpus scale ONE
    corrupt or off-type payload must not kill the job: 'raise'
    (default, debugging), 'skip' (drop undecodable rows), or 'null'
    (keep the row with NULL width/height/channels/feature so the
    failure count is queryable downstream)."""
    if kernel not in DECODE_KERNELS:
        raise ValueError(
            f"unknown decode kernel {kernel!r}; registered: "
            f"{sorted(DECODE_KERNELS)}")
    if on_error not in ("raise", "skip", "null"):
        raise ValueError(f"on_error must be 'raise', 'skip' or "
                         f"'null', got {on_error!r}")

    k = DECODE_KERNELS[kernel]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column-wise zip, not iterrows() (r13; guide §4.2):
            # iterrows materializes a pandas Series PER ROW — pure
            # interpreter overhead inside the hot batch loop
            for did, mt, payload in zip(pdf[id_col], pdf["media_type"],
                                        pdf[payload_col]):
                # A NULL payload must flow through the on_error policy
                # like any other corrupt input — so the length probe and
                # the decode both live inside the try.
                try:
                    plen = len(payload)
                    w, h, c, feat = k(bytes(payload), mt)
                except Exception:
                    if on_error == "raise":
                        raise
                    if on_error == "skip":
                        continue
                    plen = len(payload) if payload is not None else 0
                    w = h = c = feat = None
                rows.append((did, mt, plen, w, h, c, feat))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA])

    # project to exactly what the kernel reads (r13; guide §4.1):
    # mapInPandas is opaque to column pruning, so an unprojected
    # input ships EVERY column (at ingest, the full text/payload row)
    # through the Arrow boundary
    return (df.select(id_col, "media_type", payload_col)
            .mapInPandas(decode_batches, MEDIA_META_SCHEMA))


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_media(df: DataFrame, max_w: int = 64, max_h: int = 64,
                 payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Partition-wise resize via mapInPandas.  STUB kernel (aspect-
    preserving dimension clamp; payload passed through) — a real
    deployment swaps the kernel for PIL ``Image.resize``.  The Spark
    side (schema, Arrow batches, bounded memory per batch) is real."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column-wise zip, not iterrows() (r13; guide §4.2)
            for did, mt, pl in zip(pdf[id_col], pdf["media_type"],
                                   pdf[payload_col]):
                payload = bytes(pl)
                w, h, _, _ = _fake_decode(payload)
                scale = min(max_w / w, max_h / h, 1.0)
                rows.append((did, mt,
                             int(w * scale), int(h * scale), payload))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in RESIZED_SCHEMA])

    # project before the opaque op (r13; guide §4.1 column pruning)
    return (df.select(id_col, "media_type", payload_col)
            .mapInPandas(resize_batches, RESIZED_SCHEMA))


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_feature", T.ArrayType(T.FloatType())),
])


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """One-to-many frame sampling via mapInPandas: temporal media
    (audio/wav here; video in a real deployment) expands to
    ``1 + md5(payload)[3] % 5`` frames, stills to one.  The fan-out
    happens inside the Arrow batch loop — no explode shuffle, output
    partitioning inherits the input's."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column-wise zip, not iterrows() (r13; guide §4.2)
            for did, mt, pl in zip(pdf[id_col], pdf["media_type"],
                                   pdf[payload_col]):
                payload = bytes(pl)
                digest = hashlib.md5(payload).digest()
                n = 1 + digest[3] % 5 if mt == "audio/wav" else 1
                for i in range(n):
                    feat = [b / 255.0 for b in
                            hashlib.md5(payload + bytes([i])).digest()[:4]]
                    rows.append((did, mt, i, feat))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FRAMES_SCHEMA])

    # project before the opaque op (r13; guide §4.1 column pruning)
    return (df.select(id_col, "media_type", payload_col)
            .mapInPandas(frame_batches, FRAMES_SCHEMA))


def media_stats(decoded: DataFrame) -> DataFrame:
    """Aggregate decoded-media stats per media_type (pure built-ins)."""
    return (decoded.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.round(F.avg("width"), 4).alias("avg_width"),
                 F.round(F.avg("height"), 4).alias("avg_height")))


def embed_media(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id", dim: int = 32) -> DataFrame:
    """Media -> embedding column (``array<float>``), the bridge from
    multimodal ingest to the similarity/ANN operators
    (ext/similarity.py).  STUB kernel: a deterministic pseudo-embedding
    from the payload bytes (md5-seeded) standing in for a CLIP-style
    encoder; the Spark shape is the real thing — Arrow-batched
    mapInPandas, fixed-width float arrays, partition-wise, no driver
    data, no shuffle."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            vecs = []
            for payload in pdf[payload_col]:
                h = hashlib.md5(bytes(payload)).digest()
                seed = int.from_bytes(h[:8], "big") % (2**32)
                rng = np.random.RandomState(seed)
                v = rng.standard_normal(dim).astype("float32")
                v /= np.linalg.norm(v) or 1.0
                vecs.append(v.tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "embedding": vecs})

    named = df.select(F.col(id_col).alias(id_col),
                      F.col(payload_col).alias(payload_col))
    return named.mapInPandas(embed_batches, out_schema)
