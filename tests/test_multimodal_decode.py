"""Real (codec-free) multimodal decode: binary PPM and uncompressed
BMP parse with the stdlib alone, so the decode path runs for real —
not fake — end-to-end through the mapInPandas plumbing. Compressed
formats remain honestly stubbed (no codecs in the container)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from deep_field_spark.sources import multimodal as MM


def _ppm(w, h, pixels):
    """P6 bytes from [(r,g,b), ...] row-major, with a header comment."""
    assert len(pixels) == w * h
    body = b"".join(bytes(p) for p in pixels)
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + body


def _bmp24(w, h, pixels_topdown):
    """Uncompressed 24-bit BMP (bottom-up rows, 4-byte row padding)."""
    row_bytes = (3 * w + 3) // 4 * 4
    pad = b"\x00" * (row_bytes - 3 * w)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = b"".join(
            bytes((b, g, r)) for (r, g, b) in pixels_topdown[y * w:(y + 1) * w]
        )
        rows.append(row + pad)
    data = b"".join(rows)
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + dib + data


PIXELS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]  # 2x2


def test_decode_ppm_exact_means():
    w, h, (mr, mg, mb) = MM.decode_ppm(_ppm(2, 2, PIXELS))
    assert (w, h) == (2, 2)
    assert (mr, mg, mb) == (510 / 4 / 255, 510 / 4 / 255, 510 / 4 / 255)


def test_decode_bmp_matches_ppm():
    assert MM.decode_bmp(_bmp24(2, 2, PIXELS)) == MM.decode_ppm(_ppm(2, 2, PIXELS))


def test_decode_bmp_row_padding():
    # 3x1: row is 9 bytes, padded to 12 — padding must not leak into means
    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    w, h, means = MM.decode_bmp(_bmp24(3, 1, px))
    assert (w, h) == (3, 1)
    assert means == [40 / 255, 50 / 255, 60 / 255]


def test_resize_ppm_nearest_neighbor():
    out = MM.resize_ppm(_ppm(2, 2, PIXELS), 1, 1)
    w, h, means = MM.decode_ppm(out)
    assert (w, h) == (1, 1)
    assert means == [1.0, 0.0, 0.0]  # nearest neighbor picks pixel (0,0)


def test_decode_payload_rejects_compressed():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_payload(b"\x89PNG\r\n\x1a\n....", "image/png")


def test_real_feature_extract_through_spark(spark):
    """fake=False end-to-end: real PPM payloads decode inside the
    Arrow-batched mapInPandas operator; features come back exact."""
    rows = [
        (1, _ppm(2, 2, PIXELS), {"mime": "image/x-portable-pixmap", "n_bytes": 0}),
        (2, _bmp24(2, 2, PIXELS), {"mime": "image/bmp", "n_bytes": 0}),
    ]
    df = spark.createDataFrame(rows, MM.PAYLOAD_SCHEMA)
    got = {r.doc_id: r.feat for r in MM.extract_features(df, fake=False).collect()}
    expect = MM.decode_payload(_ppm(2, 2, PIXELS), "image/x-portable-pixmap")
    for doc_id in (1, 2):
        assert got[doc_id] == pytest.approx(expect, abs=1e-6)


def test_real_resize_through_spark(spark):
    rows = [(1, _ppm(2, 2, PIXELS), {"mime": "image/x-portable-pixmap", "n_bytes": 0})]
    df = spark.createDataFrame(rows, MM.PAYLOAD_SCHEMA)
    out = MM.resize_images(df, 1, 1, fake=False).collect()[0]
    w, h, means = MM.decode_ppm(bytes(out.payload))
    assert (w, h, means) == (1, 1, [1.0, 0.0, 0.0])
    assert (out.meta.width, out.meta.height) == (1, 1)
