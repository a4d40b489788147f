"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as a ``binary`` column with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
operators. Decode is REAL for codec-free formats — binary PPM (P6) and
uncompressed 24-bit BMP images (``decode_ppm`` / ``decode_bmp``;
nearest-neighbor ``resize_ppm``), 16-bit PCM WAV audio
(``decode_wav``) and YUV4MPEG2 raw video (``split_y4m_frames``) all
parse with the stdlib alone — and STUBBED for compressed formats
(JPEG/PNG/MP4 need codec libraries this container lacks): there
``decode_payload`` raises NotImplementedError unless ``fake=True``,
in which case a deterministic md5-derived feature vector stands in.
The Spark-side plumbing (schema, batch shape, partitioning) is
identical on every path and tested on all of them.

At 100 TB the payload column dominates IO: keep it in its own parquet
column (never in the shuffle key), push metadata predicates down so
payload bytes are only read for surviving rows, and size
``spark.sql.files.maxPartitionBytes`` so one task holds a bounded
number of payloads in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
    ]
)


def binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a binary-payload table from documents.text (the
    container has no real media; utf-8 bytes stand in for payloads)."""
    from ..catalog import spread

    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: first
    FEATURE_DIM bytes of md5(payload), scaled to [0, 1)."""
    digest = hashlib.md5(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header: returns (width, height, maxval, data_offset).
    Handles whitespace runs and # comments per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte before raster data
    w, h, maxval = fields
    return w, h, maxval, pos


def decode_ppm(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode binary PPM (P6): (width, height, [mean_r, mean_g, mean_b])
    with means normalized to [0, 1]. Pure stdlib — no codec needed."""
    w, h, maxval, off = _ppm_header(payload)
    raster = payload[off:off + 3 * w * h]
    if len(raster) != 3 * w * h:
        raise ValueError("truncated ppm raster")
    n = w * h
    sums = [0, 0, 0]
    for i, b in enumerate(raster):
        sums[i % 3] += b
    return w, h, [s / n / maxval for s in sums]


def decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode uncompressed 24-bit BMP: (width, height, channel means
    as [mean_r, mean_g, mean_b] in [0, 1]). Pure stdlib."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flipped = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row_bytes = (3 * w + 3) // 4 * 4
    sums = [0, 0, 0]  # B, G, R order on disk
    for r in range(h):
        row = payload[data_off + r * row_bytes:][: 3 * w]
        for i, b in enumerate(row):
            sums[i % 3] += b
    n = w * h
    _ = flipped  # row order does not affect channel means
    return w, h, [sums[2] / n / 255.0, sums[1] / n / 255.0, sums[0] / n / 255.0]


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """Decode PCM WAV (RIFF) with the stdlib ``wave`` module:
    (n_channels, sample_rate, n_frames, rms) — rms normalized to
    [0, 1] over 16-bit samples. Codec-free: PCM is raw samples."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        nch, sw, rate, nfr = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        if sw != 2:
            raise NotImplementedError("only 16-bit PCM supported")
        raw = w.readframes(nfr)
    n = len(raw) // 2
    if n == 0:
        return nch, rate, 0, 0.0
    acc = 0
    for (s,) in struct.iter_unpack("<h", raw):
        acc += s * s
    return nch, rate, nfr, (acc / n) ** 0.5 / 32768.0


def split_y4m_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Split a YUV4MPEG2 stream (codec-free raw video) into frames:
    (width, height, [frame_bytes...]). Frames are 4:2:0 planar
    (w*h*3/2 bytes) following each FRAME marker line."""
    b = bytes(payload)
    nl = b.index(b"\n")
    header = b[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("missing W/H in y4m header")
    frame_size = w * h * 3 // 2
    frames, pos = [], nl + 1
    while pos < len(b):
        if b[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = b.index(b"\n", pos) + 1
        frames.append(b[pos:pos + frame_size])
        pos += frame_size
    return w, h, frames


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of a P6 ppm to (width, height),
    re-emitted as P6. Pure stdlib."""
    w, h, maxval, off = _ppm_header(payload)
    raster = payload[off:off + 3 * w * h]
    out = bytearray(b"P6\n%d %d\n%d\n" % (width, height, maxval))
    for y in range(height):
        sy = y * h // height
        for x in range(width):
            sx = x * w // width
            p = 3 * (sy * w + sx)
            out += raster[p:p + 3]
    return bytes(out)


def decode_payload(payload: bytes, mime: str) -> list[float]:
    """Real decode for codec-free formats (binary PPM, uncompressed
    24-bit BMP — parseable with the stdlib alone): returns the
    FEATURE_DIM feature vector [width, height, mean_r, mean_g, mean_b,
    luma, n_pixels, 0]. Compressed formats (JPEG/PNG/MP4) still raise
    — no codec libraries in this container; a PIL/ffmpeg-backed decode
    slots in here without touching the Spark plan."""
    b = bytes(payload)
    if b[:2] == b"P6":
        w, h, (mr, mg, mb) = decode_ppm(b)
    elif b[:2] == b"BM":
        w, h, (mr, mg, mb) = decode_bmp(b)
    else:
        raise NotImplementedError(
            f"no media codec available for {mime!r}; supported codec-free "
            "formats: image/x-portable-pixmap (P6), uncompressed 24-bit "
            "image/bmp"
        )
    luma = 0.2126 * mr + 0.7152 * mg + 0.0722 * mb
    return [float(w), float(h), mr, mg, mb, luma, float(w * h), 0.0]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.IntegerType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """mapInPandas image resize. Real decode/resample is stubbed (no
    codecs in the container); the fake path is a deterministic byte
    truncation to width*height so the full Spark plumbing — schema,
    Arrow batches, metadata propagation — runs and is oracle-checkable.
    """
    target = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # real path: nearest-neighbor resample for codec-free
                # P6 ppm payloads; anything else still needs a codec
                out_payload = [
                    resize_ppm(bytes(p), width, height) for p in pdf["payload"]
                ]
            else:
                out_payload = [bytes(p)[:target] for p in pdf["payload"]]
            metas = [
                {"mime": m["mime"], "n_bytes": len(p), "width": width, "height": height}
                for m, p in zip(pdf["meta"], out_payload)
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": out_payload, "meta": metas}
            )

    return df.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, every_n: int = 4, fake: bool = True
) -> DataFrame:
    """mapInPandas frame sampling: one video row → many frame rows (the
    UDTF shape). Fake path: the payload splits into fixed-size chunks
    and every ``every_n``-th chunk is a 'frame' — deterministic, so the
    exploded row set is hash-checkable; a real decoder slots into the
    same iterator without touching the plan."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if not fake:
                    # real path: codec-free YUV4MPEG2 streams split on
                    # FRAME markers; every_n-th frame sampled
                    _, _, frames = split_y4m_frames(b)
                    for fi in range(0, len(frames), every_n):
                        ids.append(doc_id)
                        idxs.append(fi // every_n)
                        payloads.append(frames[fi])
                    continue
                n_chunks = (len(b) + frame_bytes - 1) // frame_bytes
                for ci in range(0, n_chunks, every_n):
                    ids.append(doc_id)
                    idxs.append(ci // every_n)
                    payloads.append(b[ci * frame_bytes:(ci + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "payload": payloads})

    return df.mapInPandas(op, schema=FRAME_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers each partition as pandas batches; one python worker
    per task, payload bytes never cross the driver.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_features(p) for p in pdf["payload"]]
            else:
                feats = [decode_payload(p, m["mime"]) for p, m in zip(pdf["payload"], pdf["meta"])]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def arrow_chunk_meta(df: DataFrame, chunk: int = 64) -> DataFrame:
    """Chunk accounting over the binary payload via ``mapInArrow`` —
    the RecordBatch-level Python extension point: data stays in Arrow
    buffers end-to-end (no pandas materialization, no per-row Python),
    the right shape for metadata passes over multi-GB binary columns.
    All arithmetic is pyarrow.compute kernels (C++), so the per-batch
    Python cost is a handful of kernel dispatches regardless of row
    count."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def op(batches):
        for b in batches:
            ln = pc.cast(pc.binary_length(b.column("payload")), pa.int64())
            n_chunks = pc.divide(pc.add(ln, chunk - 1), chunk)  # int ceil
            tail = pc.if_else(
                pc.equal(ln, 0),
                pa.scalar(0, pa.int64()),
                pc.subtract(ln, pc.multiply(pc.subtract(n_chunks, 1), chunk)),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(ln, pa.int32()),
                    pc.cast(n_chunks, pa.int32()),
                    pc.cast(tail, pa.int32()),
                ],
                ["doc_id", "n_bytes", "n_chunks", "tail_bytes"],
            )

    return df.select("doc_id", "payload").mapInArrow(
        op, "doc_id long, n_bytes int, n_chunks int, tail_bytes int"
    )
