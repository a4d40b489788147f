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
