"""Round-6: the decode step is pluggable and the 'png' kernel REALLY
decodes — these tests feed actual PNG bytes (encoded here with stdlib
zlib) through the Spark mapInPandas path and assert exact pixel
statistics, certifying decoding rather than just plumbing."""
from __future__ import annotations

import struct
import zlib

import pytest

import pandas_alchemy_spark as pas  # noqa: F401  (session fixture)
from pandas_alchemy_spark.ext import multimodal as mm


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))


def _png_encode(pixels, w, h, nch, filters=None) -> bytes:
    """Minimal PNG writer: 8-bit, chosen per-row filter types so the
    decoder's filter reconstruction is exercised, not just filter 0."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * nch
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(pixels[y * stride:(y + 1) * stride])
        f = (filters or [0])[y % len(filters or [0])]
        enc = bytearray(line)
        if f == 1:
            for x in range(stride - 1, nch - 1, -1):
                enc[x] = (line[x] - line[x - nch]) & 255
        elif f == 2:
            for x in range(stride):
                enc[x] = (line[x] - prev[x]) & 255
        elif f == 3:
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 255
        elif f == 4:
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 255
        raw += bytes([f]) + enc
        prev = line
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _gradient(w, h, nch):
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w)
                 for c in range(nch))


@pytest.mark.parametrize("w,h,nch", [(5, 4, 1), (8, 3, 3), (6, 6, 4)])
@pytest.mark.parametrize("filters", [[0], [1, 2, 3, 4]])
def test_png_decode_roundtrip(w, h, nch, filters):
    """Pure-Python: decode(encode(px)) == px for every color type and
    every PNG filter."""
    px = _gradient(w, h, nch)
    data = _png_encode(px, w, h, nch, filters)
    gw, gh, gn, gp = mm._png_decode(data)
    assert (gw, gh, gn) == (w, h, nch)
    assert gp == px


def test_png_kernel_through_spark(spark):
    """Real PNG bytes through the actual decode_media mapInPandas path:
    exact dimensions, channel count, and per-channel means."""
    pngs = [(1, _png_encode(_gradient(5, 4, 3), 5, 4, 3, [1, 2])),
            (2, _png_encode(_gradient(7, 2, 1), 7, 2, 1, [4])),
            (3, _png_encode(_gradient(3, 3, 4), 3, 3, 4, [3]))]
    sdf = spark.createDataFrame(
        [(i, bytearray(b), "image/png") for i, b in pngs],
        "doc_id long, payload binary, media_type string")
    got = {r["doc_id"]: r
           for r in mm.decode_media(sdf, kernel="png").collect()}
    for doc_id, data in pngs:
        w, h, nch, px = mm._png_decode(data)
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, nch)
        assert r["n_bytes"] == len(data)
        want = [sum(px[c::nch]) / (w * h * 255.0) for c in range(nch)]
        for a, b in zip(r["feature"], want):
            assert abs(a - b) < 1e-6


def test_png_kernel_rejects_non_png(spark):
    sdf = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxxWAVE"), "audio/wav")],
        "doc_id long, payload binary, media_type string")
    with pytest.raises(Exception, match="png kernel cannot decode"):
        mm.decode_media(sdf, kernel="png").collect()


def test_unknown_kernel_raises(spark):
    sdf = spark.createDataFrame(
        [(1, bytearray(b"x"), "image/png")],
        "doc_id long, payload binary, media_type string")
    with pytest.raises(ValueError, match="unknown decode kernel"):
        mm.decode_media(sdf, kernel="jpeg2000")


def test_registered_kernel_used(spark):
    def fixed(payload, media_type):
        return 9, 9, 1, [0.5]

    mm.register_decode_kernel("fixed9", fixed)
    try:
        sdf = spark.createDataFrame(
            [(1, bytearray(b"anything"), "image/png")],
            "doc_id long, payload binary, media_type string")
        r = mm.decode_media(sdf, kernel="fixed9").collect()[0]
        assert (r["width"], r["height"], r["channels"]) == (9, 9, 1)
    finally:
        mm.DECODE_KERNELS.pop("fixed9", None)


def test_stub_kernel_is_default(spark):
    """The stub stays the sandbox default and matches _fake_decode."""
    sdf = spark.createDataFrame(
        [(1, bytearray(b"hello"), "image/png")],
        "doc_id long, payload binary, media_type string")
    r = mm.decode_media(sdf).collect()[0]
    w, h, c, feat = mm._fake_decode(b"hello")
    assert (r["width"], r["height"], r["channels"]) == (w, h, c)
    for a, b in zip(r["feature"], feat):  # float32 array column
        assert abs(a - b) < 1e-6


def test_decode_on_error_isolation(spark):
    """One bad payload must not kill the job: 'skip' drops it, 'null'
    keeps it with NULL decode fields, 'raise' (default) propagates."""
    rows = [(1, bytearray(_png_encode(_gradient(4, 4, 3), 4, 4, 3)),
             "image/png"),
            (2, bytearray(b"not a png"), "image/png"),
            (3, bytearray(b"RIFF"), "audio/wav")]
    sdf = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string")
    skip = mm.decode_media(sdf, kernel="png", on_error="skip").collect()
    assert {r["doc_id"] for r in skip} == {1}
    nul = {r["doc_id"]: r["width"]
           for r in mm.decode_media(sdf, kernel="png",
                                    on_error="null").collect()}
    assert nul[1] == 4 and nul[2] is None and nul[3] is None
    with pytest.raises(Exception):
        mm.decode_media(sdf, kernel="png").collect()
    with pytest.raises(ValueError, match="on_error must be"):
        mm.decode_media(sdf, kernel="png", on_error="ignore")


def test_png_truncated_raises_cleanly():
    data = _png_encode(_gradient(6, 5, 3), 6, 5, 3)
    # corrupt: re-deflate a shortened pixel stream under the same IHDR
    w, h, nch, px = mm._png_decode(data)
    short = _png_encode(px[:len(px) // 2], w, h // 2, nch)
    # splice the short IDAT under the ORIGINAL (larger) IHDR
    import struct
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[nch],
                       0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + short[short.index(b"IDAT") - 4:])
    with pytest.raises(ValueError, match="truncated PNG"):
        mm._png_decode(bad)
