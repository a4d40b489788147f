"""Similarity search over the embeddings table (array<float>, dim 64).

Two tiers:
  knn_brute_force — exact cosine top-k for a query subset. Baseline;
      the query side is tiny so Spark broadcasts it: every executor
      scans its slice of the corpus once, no shuffle of the corpus.
  ann_lsh_bucket — random-hyperplane LSH bucketing; neighbors are
      searched within the bucket only. This is the 100 TB path: the
      corpus shuffles once on bucket id, each bucket is a small
      brute-force. Deterministic planes → exactly reproducible in the
      SQL oracle (sign arrays inlined as literals).

All dot/norm math is index-ordered double accumulation — bit-identical
between the Spark expression and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import vectors
from . import register

DIM = 64
N_PLANES = 4
TOP_K = 3
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 → query set

_DOT_SQL = (
    "list_aggregate(list_transform(range(1, len(a.embedding) + 1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')"
)
_NORM_SQL = (
    "sqrt(list_aggregate(list_transform({t}.embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)
_COS_SQL = f"{_DOT_SQL} / ({_NORM_SQL.format(t='a')} * {_NORM_SQL.format(t='b')})"


@register(
    "knn_brute_force",
    oracle=f"""
    SELECT * FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({_COS_SQL}, 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY {_COS_SQL} DESC, b.vec_id) AS BIGINT) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id % {QUERY_MOD} = 0)
    WHERE rn <= {TOP_K}
    """,
    doc="Exact cosine top-3 neighbors for the query subset — broadcast "
        "the queries, scan the corpus once, per-query heap via window.",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = vectors.cosine(F.col("q_emb"), F.col("c_emb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos_sim"), "rn")
    )


def _bucket_sql(tbl: str) -> str:
    """DuckDB expression replicating vectors.hyperplane_sign_bucket."""
    signs = vectors.hyperplane_signs(DIM, N_PLANES)
    terms = []
    for j in range(N_PLANES):
        arr = "[" + ", ".join(str(s) for s in signs[j]) + "]"
        proj = (
            f"list_aggregate(list_transform(range(1, {DIM} + 1), "
            f"i -> CAST({tbl}.embedding[i] AS DOUBLE) * ({arr})[i]), 'sum')"
        )
        terms.append(f"CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


@register(
    "ann_lsh_bucket",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings)
    SELECT * FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket AS bucket,
             round({_COS_SQL}, 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY {_COS_SQL} DESC, b.vec_id) AS BIGINT) AS rn
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
    WHERE rn <= 1
    """,
    doc="ANN via random-hyperplane LSH: equi-join on bucket id replaces "
        "the cross product; top-1 within bucket. Recall is tunable by "
        "n_planes / multi-probe; candidate cost drops 2**n_planes-fold.",
)
def ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucketed = emb.withColumn(
        "bucket", vectors.hyperplane_sign_bucket(F.col("embedding"), DIM, N_PLANES)
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = vectors.cosine(F.col("a.embedding"), F.col("b.embedding"))
    scored = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.col("a.bucket").alias("bucket"),
            cos.alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 1)
        .select("query_id", "neighbor_id", "bucket", F.round("cos_raw", 4).alias("cos_sim"), "rn")
    )
