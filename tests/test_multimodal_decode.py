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


def _wav16(rate, samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_decode_wav_rms():
    nch, rate, nfr, rms = MM.decode_wav(_wav16(8000, [16384, -16384, 16384, -16384]))
    assert (nch, rate, nfr) == (1, 8000, 4)
    assert rms == pytest.approx(0.5, abs=1e-9)


def _y4m(w, h, n_frames):
    frame_size = w * h * 3 // 2
    body = b"".join(
        b"FRAME\n" + bytes([i % 256]) * frame_size for i in range(n_frames)
    )
    return b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h) + body


def test_split_y4m_frames():
    w, h, frames = MM.split_y4m_frames(_y4m(4, 2, 5))
    assert (w, h, len(frames)) == (4, 2, 5)
    assert all(len(f) == 12 for f in frames)
    assert frames[3] == bytes([3]) * 12


def test_real_frame_sampling_through_spark(spark):
    """fake=False video path: a real y4m stream splits on FRAME markers
    inside mapInPandas; every 2nd frame sampled."""
    rows = [(1, _y4m(4, 2, 5), {"mime": "video/x-yuv4mpeg", "n_bytes": 0})]
    df = spark.createDataFrame(rows, MM.PAYLOAD_SCHEMA)
    got = MM.sample_frames(df, every_n=2, fake=False).collect()
    assert [(r.frame_idx, bytes(r.payload)[0]) for r in sorted(got, key=lambda r: r.frame_idx)] == [
        (0, 0), (1, 2), (2, 4)
    ]
