"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as a ``binary`` column with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
operators. The decode step is STUBBED (no image/audio libs in this
container): ``decode_payload`` raises NotImplementedError unless
``fake=True``, in which case a deterministic md5-derived feature vector
stands in — the Spark-side plumbing (schema, batch shape, partitioning)
is real and tested either way.

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


def decode_payload(payload: bytes, mime: str):
    """Real decode entry point — unimplemented in this container."""
    raise NotImplementedError(
        f"no media codec available for {mime!r}; install a decoder or use fake=True"
    )


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
                raise NotImplementedError("no image codec available; use fake=True")
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
            if not fake:
                raise NotImplementedError("no video codec available; use fake=True")
            ids, idxs, payloads = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
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
