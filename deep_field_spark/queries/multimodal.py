"""Multimodal-column queries: binary payload metadata + feature stats.

The payloads are utf-8 bytes of documents.text (no media libs in the
container — sources/multimodal.py), so the md5-of-binary digest equals
DuckDB's md5-of-text and the whole pipeline is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import multimodal as MM
from . import register


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes, md5(text) AS digest
    FROM documents
    """,
    doc="Binary payload column + typed metadata struct: byte length and "
        "content digest computed on the binary column itself.",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = MM.binary_corpus(spark, sf_dir)
    return corpus.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           md5(substring(text, 1, 256)) AS digest,
           CAST(least(strlen(text), 256) AS INT) AS n_bytes,
           16 AS width, 16 AS height
    FROM documents
    """,
    doc="Image-resize plumbing (mapInPandas, decode stubbed): payloads "
        "deterministically downsampled to width*height bytes with "
        "metadata propagation — digest + dims hash-checked (the fixture "
        "corpus is ASCII, so byte and char offsets agree).",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = MM.binary_corpus(spark, sf_dir)
    resized = MM.resize_images(corpus, width=16, height=16, fake=True)
    return resized.select(
        "doc_id",
        F.md5("payload").alias("digest"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH chunks AS (
      SELECT doc_id, text,
             CAST(ceil(strlen(text) / 64.0) AS INT) AS n_chunks
      FROM documents),
    frames AS (
      SELECT doc_id,
             CAST(x AS INT) // 4 AS frame_idx,
             substring(text, CAST(x AS INT) * 64 + 1, 64) AS frame
      FROM chunks, unnest(range(0, n_chunks)) AS t(x)
      WHERE CAST(x AS INT) % 4 = 0)
    SELECT doc_id, frame_idx, md5(frame) AS digest,
           CAST(strlen(frame) AS INT) AS n_bytes
    FROM frames
    """,
    doc="Video frame-sampling plumbing (one row → many frame rows, the "
        "UDTF shape via mapInPandas; decode stubbed): every 4th 64-byte "
        "chunk becomes a frame; the exploded row set is hash-checked.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = MM.binary_corpus(spark, sf_dir)
    frames = MM.sample_frames(corpus, frame_bytes=64, every_n=4, fake=True)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5("payload").alias("digest"),
        F.octet_length("payload").cast("int").alias("n_bytes"),
    )


@register(
    "multimodal_feature_extract",
    oracle=None,  # mapInPandas + python md5-derived floats — rows-only check
    doc="mapInPandas feature extraction over binary payloads (decode "
        "stubbed with deterministic fake features; Arrow batch plumbing "
        "is real). Returns per-doc feature vector norms.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = MM.binary_corpus(spark, sf_dir)
    feats = MM.extract_features(corpus, fake=True)
    sq = F.aggregate(
        F.col("feat"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return feats.select("doc_id", F.round(F.sqrt(sq), 4).alias("feat_norm"))


@register(
    "multimodal_arrow_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           CAST((strlen(text) + 63) // 64 AS INT) AS n_chunks,
           CAST(CASE WHEN strlen(text) = 0 THEN 0
                ELSE strlen(text) - ((strlen(text) + 63) // 64 - 1) * 64
                END AS INT) AS tail_bytes
    FROM documents
    """,
    doc="mapInArrow chunk accounting over the binary payload — the "
        "RecordBatch-level extension point (§2.10's fifth flavor, "
        "beside scalar/grouped-agg pandas UDFs, UDTF, grouped-map and "
        "cogrouped-map): payloads stay in Arrow buffers, all math is "
        "pyarrow.compute C++ kernels, zero pandas and zero per-row "
        "Python. The shape a 100 TB binary-column metadata pass wants "
        "when even the Arrow→pandas copy is too expensive.",
)
def multimodal_arrow_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = MM.binary_corpus(spark, sf_dir)
    return MM.arrow_chunk_meta(corpus, chunk=64)


# --- REAL image decode, hash-checked ----------------------------------

# The container has no codec libraries, but binary PPM needs none: the
# decoder in sources/multimodal.py parses P6 with the stdlib. To make
# the real-decode path ORACLE-checkable, each doc gets a deterministic
# 4x4 synthetic image whose raster bytes are md5-derived from its id —
# DuckDB regenerates the identical bytes from the same md5 arithmetic
# and recomputes the channel means in SQL, so the decoded features are
# hash-checked, not rows-only. (multimodal_feature_extract remains the
# fake-path plumbing check for formats that DO need codecs.)
IMG_W = IMG_H = 4
_IMG_BYTES = 3 * IMG_W * IMG_H  # 48 = 3 md5 digests


@register(
    "multimodal_decode_real",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, t.i,
             md5(CAST(doc_id AS VARCHAR) || '|' || CAST(t.i // 16 AS VARCHAR))
               AS h,
             (t.i % 16) AS k
      FROM documents, unnest(range(0, {_IMG_BYTES})) AS t(i)),
    v AS (SELECT doc_id, i,
             16 * (strpos('0123456789abcdef', substring(h, 2 * k + 1, 1)) - 1)
               + (strpos('0123456789abcdef', substring(h, 2 * k + 2, 1)) - 1)
               AS byte
          FROM b)
    SELECT doc_id,
           {IMG_W} AS width, {IMG_H} AS height,
           round(avg(CASE WHEN i % 3 = 0 THEN byte END) / 255.0, 6) AS mean_r,
           round(avg(CASE WHEN i % 3 = 1 THEN byte END) / 255.0, 6) AS mean_g,
           round(avg(CASE WHEN i % 3 = 2 THEN byte END) / 255.0, 6) AS mean_b
    FROM v GROUP BY doc_id
    """,
    doc="REAL image decode, hash-checked: every doc carries a "
        f"deterministic {IMG_W}x{IMG_H} binary-PPM payload (raster "
        "bytes md5-derived from the doc id), the codec-free P6 decoder "
        "(sources/multimodal.py:decode_ppm, stdlib-only) runs inside "
        "the Arrow-batched mapInPandas operator with fake=False, and "
        "the per-channel means come back as decoded features. The "
        "oracle regenerates the identical raster bytes from the same "
        "md5 arithmetic and recomputes the means in SQL — the first "
        "hash-checked real-decode row of the multimodal family; "
        "compressed formats still require codecs and keep the honest "
        "stub + fake plumbing path.",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mr", T.DoubleType(), False),
            T.StructField("mg", T.DoubleType(), False),
            T.StructField("mb", T.DoubleType(), False),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = b"P6\n%d %d\n255\n" % (IMG_W, IMG_H)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                raw = b"".join(
                    hashlib.md5(f"{doc_id}|{j}".encode()).digest()
                    for j in range(_IMG_BYTES // 16)
                )
                feat = MM.decode_payload(
                    header + raw[:_IMG_BYTES], "image/x-portable-pixmap"
                )
                rows.append(
                    (int(doc_id), int(feat[0]), int(feat[1]),
                     feat[2], feat[3], feat[4])
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mr", "mg", "mb"]
            )

    feats = docs.mapInPandas(op, schema=schema)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round("mr", 6).alias("mean_r"),
        F.round("mg", 6).alias("mean_g"),
        F.round("mb", 6).alias("mean_b"),
    )


# --- REAL audio decode: 16-bit PCM WAV, RMS hash-checked -------------
# mirror of multimodal_decode_real for the audio family: a
# deterministic mono PCM payload (sample bytes md5-derived from the
# doc id) is wrapped in a RIFF/WAV container, decoded by the stdlib
# `wave` decoder, and the integer-exact sum of squares + sqrt-derived
# RMS are hash-checked against an oracle that regenerates the same
# samples from the same md5 arithmetic.
WAV_SAMPLES = 32          # 64 payload bytes = 4 md5 digests
WAV_RATE = 8000


@register(
    "multimodal_audio_rms",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, t.i,
             md5(CAST(doc_id AS VARCHAR) || '|wav|' || CAST(t.i // 8 AS VARCHAR))
               AS h,
             (t.i % 8) AS k
      FROM documents, unnest(range(0, {WAV_SAMPLES})) AS t(i)),
    -- little-endian int16 from hex pairs (4 hex chars per sample)
    u AS (SELECT doc_id, i,
             (16 * (strpos('0123456789abcdef', substring(h, 4 * k + 1, 1)) - 1)
                 + (strpos('0123456789abcdef', substring(h, 4 * k + 2, 1)) - 1))
             + 256 *
             (16 * (strpos('0123456789abcdef', substring(h, 4 * k + 3, 1)) - 1)
                 + (strpos('0123456789abcdef', substring(h, 4 * k + 4, 1)) - 1))
               AS us
          FROM b),
    s AS (SELECT doc_id, CASE WHEN us >= 32768 THEN us - 65536 ELSE us END AS sv
          FROM u),
    agg AS (SELECT doc_id, CAST(sum(CAST(sv AS BIGINT) * sv) AS BIGINT) AS sum_sq,
                   CAST(count(*) AS BIGINT) AS n_frames
            FROM s GROUP BY doc_id)
    SELECT doc_id, 1 AS n_channels, {WAV_RATE} AS sample_rate, n_frames, sum_sq,
           CAST(round(CAST(sqrt(CAST(sum_sq AS DOUBLE) / n_frames) / 32768.0
                           AS DECIMAL(28,12)), 6) AS DOUBLE) AS rms
    FROM agg
    """,
    doc="REAL audio decode, hash-checked (the WAV sibling of "
        "multimodal_decode_real): every doc carries a deterministic "
        f"mono 16-bit PCM payload ({WAV_SAMPLES} samples md5-derived "
        "from the doc id) inside a genuine RIFF/WAV container built "
        "and parsed by the stdlib `wave` module inside the "
        "Arrow-batched mapInPandas operator (sources/multimodal.py:"
        "decode_wav). The hash-checked columns are integer-exact "
        "(sum of squared samples, frame count) plus an RMS whose "
        "float path is drift-free by construction: integer sum, one "
        "correctly-rounded IEEE division and sqrt, a power-of-two "
        "divide, and a DECIMAL round — the oracle regenerates the "
        "identical samples from the same md5 arithmetic. The decoder "
        "result is asserted in-op against the independent integer "
        "computation, so the decode is load-bearing, not decorative.",
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import io
    import struct
    import wave
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("sum_sq", T.LongType(), False),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                raw = b"".join(
                    hashlib.md5(f"{doc_id}|wav|{j}".encode()).digest()
                    for j in range(WAV_SAMPLES * 2 // 16)
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_RATE)
                    w.writeframes(raw)
                nch, rate, nfr, rms = MM.decode_wav(buf.getvalue())
                sum_sq = sum(
                    s * s for (s,) in struct.iter_unpack("<h", raw)
                )
                # the decoder is load-bearing: its RMS must agree with
                # the independent integer path (container parse, frame
                # extraction and normalization all verified here)
                assert nfr == WAV_SAMPLES and nch == 1 and rate == WAV_RATE
                assert abs(rms - (sum_sq / nfr) ** 0.5 / 32768.0) < 1e-9, doc_id
                rows.append((int(doc_id), nch, rate, nfr, sum_sq))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_channels", "sample_rate", "n_frames", "sum_sq"],
            )

    feats = docs.mapInPandas(op, schema=schema)
    # RMS float discipline: integer sum_sq -> one IEEE division + sqrt
    # (both correctly rounded on both engines) -> exact power-of-two
    # divide -> DECIMAL round. No libm call that may drift.
    rms = F.sqrt(F.col("sum_sq").cast("double") / F.col("n_frames")) / F.lit(32768.0)
    return feats.select(
        "doc_id",
        "n_channels",
        "sample_rate",
        "n_frames",
        "sum_sq",
        F.round(rms.cast("decimal(28,12)"), 6).cast("double").alias("rms"),
    )


# --- REAL video decode: YUV4MPEG2 raw frames, luma hash-checked ------
# completes the codec-free real-decode trio (image P6, audio WAV,
# video Y4M): deterministic 4:2:0 frames (bytes md5-derived from
# (doc, frame)) inside a genuine YUV4MPEG2 stream, split by the
# stdlib parser, per-frame integer-exact luma sums hash-checked.
Y4M_W = Y4M_H = 4
Y4M_FRAMES = 3
_Y4M_FRAME_BYTES = Y4M_W * Y4M_H * 3 // 2  # 24: Y 16 + U 4 + V 4


@register(
    "multimodal_video_luma",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, f.fi, t.i,
             md5(CAST(doc_id AS VARCHAR) || '|y4m|' || CAST(f.fi AS VARCHAR)
                 || '|' || CAST(t.i // 16 AS VARCHAR)) AS h,
             (t.i % 16) AS k
      FROM documents,
           unnest(range(0, {Y4M_FRAMES})) AS f(fi),
           unnest(range(0, {Y4M_W * Y4M_H})) AS t(i)),
    v AS (SELECT doc_id, fi, i,
             16 * (strpos('0123456789abcdef', substring(h, 2 * k + 1, 1)) - 1)
               + (strpos('0123456789abcdef', substring(h, 2 * k + 2, 1)) - 1)
               AS byte
          FROM b)
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           {Y4M_W} AS width, {Y4M_H} AS height,
           CAST(sum(byte) AS BIGINT) AS y_sum,
           CAST(sum(byte) AS DOUBLE) / {Y4M_W * Y4M_H} AS mean_y
    FROM v GROUP BY doc_id, fi
    """,
    doc="REAL video decode, hash-checked (the Y4M sibling of "
        "multimodal_decode_real / multimodal_audio_rms, completing "
        "the codec-free trio): every doc carries a deterministic "
        f"{Y4M_FRAMES}-frame {Y4M_W}x{Y4M_H} 4:2:0 YUV4MPEG2 stream "
        "(frame bytes md5-derived from (doc, frame)), the stdlib "
        "splitter (sources/multimodal.py:split_y4m_frames) parses the "
        "container inside Arrow-batched mapInPandas, and each frame's "
        "luma-plane sum comes back integer-exact (mean as one exact "
        "IEEE division — the Y plane is the first w*h bytes of a "
        "4:2:0 frame). The oracle regenerates identical frame bytes "
        "from the same md5 arithmetic; the parser is load-bearing "
        "(frame count/shape asserted in-op). Compressed video (MP4/"
        "H.264) keeps the honest codec-absent stub.",
)
def multimodal_video_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("y_sum", T.LongType(), False),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (Y4M_W, Y4M_H)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                stream = bytearray(header)
                for fi in range(Y4M_FRAMES):
                    raw = b"".join(
                        hashlib.md5(f"{doc_id}|y4m|{fi}|{j}".encode()).digest()
                        for j in range((_Y4M_FRAME_BYTES + 15) // 16)
                    )
                    stream += b"FRAME\n" + raw[:_Y4M_FRAME_BYTES]
                w, h, frames = MM.split_y4m_frames(bytes(stream))
                # the parser is load-bearing: container structure must
                # round-trip exactly
                assert (w, h, len(frames)) == (Y4M_W, Y4M_H, Y4M_FRAMES)
                for fi, fr in enumerate(frames):
                    assert len(fr) == _Y4M_FRAME_BYTES
                    rows.append(
                        (int(doc_id), fi, w, h, sum(fr[: Y4M_W * Y4M_H]))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "y_sum"]
            )

    feats = docs.mapInPandas(op, schema=schema)
    return feats.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        "y_sum",
        (F.col("y_sum").cast("double") / F.lit(Y4M_W * Y4M_H)).alias("mean_y"),
    )
