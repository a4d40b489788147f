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

from ..catalog import spread, table
from ..functions import scaling, vectors
from ..operators.iterate import iter_checkpoint
from . import register

DIM = 64
# FLOOR for the sign-LSH plane count — the operative value is derived
# per corpus as n_planes(count) = max(6, ⌊log2 n⌋ - 3) (functions/
# scaling.py), so buckets track n/8 and within-bucket brute force stays
# linear in n. 500-row gate corpora resolve to exactly 6 (byte-stable
# vs rounds 1-9); the r9 sf1 replica (20k) resolves to 11.
N_PLANES = scaling.MIN_PLANES
# Gated plane budget of the STATIC oracle SQL (which must pre-emit one
# literal sign array per plane): n_planes exceeds 16 only at
# n >= 2^(16+3+1) = 2^20 rows — far past any oracle scale factor. The
# Spark side derives freely with no cap.
_P_MAX = 16
TOP_K = 3
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 → query set

def _sum_sql(term_fmt: str, n: int) -> str:
    """Explicit left-to-right n-term sum, term_fmt instantiated at
    i = 1..n — BIT-identical to ``list_aggregate(list_transform(
    range(1, n+1), i -> term), 'sum')`` (same sequential double
    additions) but evaluated as one vectorized expression instead of n
    interpreted-lambda invocations per row. DuckDB's lambda
    interpreter is the dominant oracle cost at every scale: the
    pair-cosine kernel inside the ANN oracles measured ~14× faster in
    this form (ann_lsh_multiprobe 6.6 → 0.5 s at sf0.01) with
    hash-identical results — and the win compounds on the sf1 replica,
    where oracle time scales with rows. Spark is untouched: its side
    was always vectorized (functions/vectors.py builds the same
    index-ordered arithmetic)."""
    return (
        "(" + " + ".join(term_fmt.format(i=i) for i in range(1, n + 1)) + ")"
    )


def _dot_sql(a: str, b: str, dim: int = DIM) -> str:
    return _sum_sql(
        f"CAST({a}.embedding[{{i}}] AS DOUBLE) "
        f"* CAST({b}.embedding[{{i}}] AS DOUBLE)",
        dim,
    )


def _norm_sql(t: str, dim: int = DIM) -> str:
    return (
        "sqrt("
        + _sum_sql(
            f"CAST({t}.embedding[{{i}}] AS DOUBLE) "
            f"* CAST({t}.embedding[{{i}}] AS DOUBLE)",
            dim,
        )
        + ")"
    )


_COS_SQL = f"{_dot_sql('a', 'b')} / ({_norm_sql('a')} * {_norm_sql('b')})"


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
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
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


# FLOOR for the IVF coarse-cell count — the operative value is derived
# per corpus as n_cells(count): the largest power of two ≤ √n, ≥ 16
# (functions/scaling.py; FAISS's nlist ≈ √n). Trainers derive it from
# the FULL embeddings count of the sf_dir — the corpus the index will
# serve — and every oracle replays the identical integer derivation in
# SQL, so k is a tested behavior, not a comment. 500-row gate corpora
# resolve to exactly 16 (byte-stable vs rounds 1-9).
N_CELLS = scaling.MIN_CELLS
N_PROBE = 2


def _derived_cells(spark: SparkSession, sf_dir: str) -> int:
    return scaling.n_cells(scaling.corpus_count(spark, sf_dir, "embeddings"))


def _derived_planes(spark: SparkSession, sf_dir: str) -> int:
    npl = scaling.n_planes(scaling.corpus_count(spark, sf_dir, "embeddings"))
    if npl > _P_MAX:
        raise ValueError(
            f"derived n_planes {npl} exceeds the oracle's gated plane "
            f"budget _P_MAX={_P_MAX} (corpus >= 2^{_P_MAX + 4} rows) — "
            "raise _P_MAX; the Spark side itself has no ceiling"
        )
    return npl


# SQL twins of the two derivations, over the full embeddings table —
# injected into every oracle that replays an index build.
_K_CELLS_SQL = scaling.n_cells_sql("embeddings")
_NPL_SQL = scaling.n_planes_sql("embeddings")


def _pair_cos_sql(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)})"


@register(
    "ann_ivf_cells",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id < {_K_CELLS_SQL}),
    scores AS (
      SELECT v.vec_id, c.cid, {_pair_cos_sql('v', 'c')} AS cos
      FROM embeddings v, cent c),
    ranked AS (
      SELECT vec_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
      FROM scores),
    assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id, cid FROM ranked
               WHERE rn <= {N_PROBE} AND vec_id % {QUERY_MOD} = 0),
    cand AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id),
    scored AS (
      SELECT query_id, neighbor_id, {_pair_cos_sql('q', 'n')} AS cos
      FROM cand JOIN embeddings q ON q.vec_id = query_id
                JOIN embeddings n ON n.vec_id = neighbor_id)
    SELECT * FROM (
      SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      FROM scored)
    WHERE rn <= {TOP_K}
    """,
    doc="IVF ANN: deterministic coarse cells (the first n_cells(count) vectors "
        "as centroids — kmeans-free so the oracle replays it), each "
        "vector assigned to its nearest cell, queries probe the "
        "N_PROBE nearest cells and brute-force only inside them. The "
        "inverted-file shape: candidate cost n·nprobe/ncells per "
        "query; centroids broadcast; at 100 TB cells are kmeans-"
        "trained and ncells grows to √n, same plan.",
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    cent = emb.filter(F.col("vec_id") < _derived_cells(spark, sf_dir)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    # per-row HOF argmax / top-N_PROBE over the broadcast centroid
    # array — zero Exchange (guide §2.4; ranking identical to the old
    # window form: cos DESC, ties to the lowest cid)
    carr = vectors.centroid_struct_array(cent)
    assign = emb.crossJoin(F.broadcast(carr)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        vectors.argmax_cos_cid(F.col("embedding"), F.col("_cents")).alias(
            "cid"
        ),
    )
    probes = (
        emb.filter(F.col("vec_id") % QUERY_MOD == 0)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                F.transform(
                    vectors.top_cos_structs(
                        F.col("embedding"), F.col("_cents"), N_PROBE
                    ),
                    lambda t: -t["nc"],
                )
            ).alias("cid"),
        )
    )
    cos_qn = vectors.cosine(F.col("q_emb"), F.col("n_emb"))
    scored = (
        probes.join(assign, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos_qn.alias("cos_raw"))
    )
    tw = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(tw).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos_sim"), "rn")
    )



def _bucket_sql(tbl: str) -> str:
    """DuckDB expression replicating vectors.hyperplane_sign_bucket
    with the corpus-DERIVED plane count: one literal sign array per
    plane up to _P_MAX (hyperplane_signs is prefix-stable — plane j is
    seeded independently of the total), each bit gated on j < npl where
    npl is the same n_planes(count(embeddings)) integer the Spark side
    resolves at plan time. Terms past npl contribute 0, so oracle and
    engine compute the identical bucket for every derived npl."""
    signs = vectors.hyperplane_signs(DIM, _P_MAX)
    terms = []
    for j in range(_P_MAX):
        # explicit per-plane sum (the _sum_sql discipline: identical
        # sequential arithmetic, no per-element lambda)
        proj = "(" + " + ".join(
            f"CAST({tbl}.embedding[{i + 1}] AS DOUBLE) * {signs[j][i]}"
            for i in range(DIM)
        ) + ")"
        terms.append(
            f"CASE WHEN {j} < {_NPL_SQL} AND {proj} >= 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
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
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    bucketed = emb.withColumn(
        "bucket",
        vectors.hyperplane_sign_bucket(
            F.col("embedding"), DIM, _derived_planes(spark, sf_dir)
        ),
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


def _multiprobe_oracle() -> str:
    signs = vectors.hyperplane_signs(DIM, _P_MAX)
    proj_terms = []
    for j in range(_P_MAX):
        # explicit per-plane sum (the _sum_sql discipline)
        proj_terms.append(
            "("
            + " + ".join(
                f"CAST(embeddings.embedding[{i + 1}] AS DOUBLE) "
                f"* {signs[j][i]}"
                for i in range(DIM)
            )
            + ")"
        )
    ps = "[" + ", ".join(proj_terms) + "]"
    # plane count DERIVED from the corpus (same integer the Spark side
    # resolves at plan time); bits past npl are gated off, and the
    # margin-sort list only ranges over the live planes
    bucket = " + ".join(
        f"CASE WHEN {j} < (SELECT v FROM npl) AND ps[{j + 1}] >= 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(_P_MAX)
    )
    cos = _pair_cos_sql("p", "c")
    return f"""
    WITH npl AS (SELECT {_NPL_SQL} AS v),
    proj AS (
      SELECT vec_id, embedding, {ps} AS ps FROM embeddings),
    b AS (
      SELECT vec_id, embedding, ps, ({bucket}) AS bucket FROM proj),
    q AS (
      SELECT vec_id, embedding, bucket,
             list_sort(list_transform(range(1, (SELECT v FROM npl) + 1),
                       i -> {{'m': abs(ps[i]), 'j': i - 1}})) AS sm
      FROM b WHERE vec_id % {QUERY_MOD} = 0),
    probes AS (
      SELECT vec_id, embedding, bucket FROM q
      UNION ALL
      SELECT vec_id, embedding, xor(bucket, 1 << CAST(sm[1].j AS INTEGER)) FROM q
      UNION ALL
      SELECT vec_id, embedding, xor(bucket, 1 << CAST(sm[2].j AS INTEGER)) FROM q),
    cand AS (
      SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos
      FROM probes p JOIN b c ON p.bucket = c.bucket AND p.vec_id <> c.vec_id)
    SELECT * FROM (
      SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      FROM cand)
    WHERE rn <= {TOP_K}
    """


@register(
    "ann_lsh_multiprobe",
    oracle=_multiprobe_oracle(),
    doc="Multi-probe LSH ANN: each query searches its own bucket plus "
        "the buckets reached by flipping the sign bit of the two "
        "smallest-|margin| hyperplanes — the planes the vector sits "
        "closest to, i.e. where a true neighbor most likely landed on "
        "the other side. Recovers most of the recall lost to bucket "
        "boundaries at 3× the candidate cost instead of the 2**n cost "
        "of fewer planes. At 100 TB this is the knob pairing: raise "
        "n_planes to shrink buckets, raise probes to hold recall.",
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    npl = _derived_planes(spark, sf_dir)
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    projs = vectors.hyperplane_projections(F.col("embedding"), DIM, npl)
    base = emb.select(
        "vec_id", "embedding", *[p.alias(f"p{j}") for j, p in enumerate(projs)]
    )
    bucket = None
    for j in range(npl):
        bit = F.when(F.col(f"p{j}") >= 0, F.lit(1 << j)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    bucketed = base.withColumn("bucket", bucket)
    corpus = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"), "bucket"
    )
    margins = F.sort_array(
        F.array(
            *[
                F.struct(F.abs(F.col(f"p{j}")).alias("m"), F.lit(j).alias("j"))
                for j in range(npl)
            ]
        )
    )
    pow2 = F.array(*[F.lit(1 << j) for j in range(npl)])
    q = bucketed.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
        margins.alias("sm"),
    )
    probes = q.select(
        "query_id",
        "q_emb",
        F.explode(
            F.array(
                F.col("bucket"),
                F.col("bucket").bitwiseXOR(F.element_at(pow2, F.col("sm")[0]["j"] + 1)),
                F.col("bucket").bitwiseXOR(F.element_at(pow2, F.col("sm")[1]["j"] + 1)),
            )
        ).alias("bucket"),
    )
    cos = vectors.cosine(F.col("q_emb"), F.col("n_emb"))
    scored = (
        probes.join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos_sim"), "rn")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH m AS (SELECT vec_id, embedding,
                      CAST(list_aggregate(list_transform(embedding,
                           x -> abs(x)), 'max') AS DOUBLE) AS maxabs
               FROM embeddings),
    s AS (SELECT vec_id, embedding,
                 CASE WHEN maxabs > 0 THEN 127.0 / maxabs END AS scale
          FROM m)
    SELECT vec_id,
           round(scale, 6) AS scale,
           -- serialized as a canonical JSON string: the driver's pandas
           -- canonicalizer (sort_values over object columns) cannot hash
           -- list cells, so array outputs must ride as strings
           to_json(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT)))::VARCHAR AS q,
           round(sqrt(list_aggregate(list_transform(embedding,
               x -> (CAST(x AS DOUBLE)
                     - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale)
                    * (CAST(x AS DOUBLE)
                     - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale)),
               'sum')), 6) AS recon_err
    FROM s
    """,
    doc="Max-abs int8 quantization of the embedding column — the "
        "storage form ANN serves at 100 TB (4x smaller vectors, "
        "SIMD-friendly int dot products). Per-row column expressions "
        "only, zero shuffle; quantization uses floor(x*scale+0.5) "
        "(identical in both engines — round() half-up semantics "
        "differ between Spark and DuckDB on negatives) and reports "
        "the L2 reconstruction error per vector.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform(F.col("embedding"), F.abs)).cast("double")
    s = emb.select(
        "vec_id",
        "embedding",
        F.when(maxabs > 0, F.lit(127.0) / maxabs).alias("scale"),
    )
    xd = lambda x: x.cast("double")  # noqa: E731
    qexpr = lambda x: F.floor(xd(x) * F.col("scale") + 0.5)  # noqa: E731
    err_term = lambda x: (xd(x) - qexpr(x) / F.col("scale")) * (
        xd(x) - qexpr(x) / F.col("scale")
    )  # noqa: E731
    return s.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        # to_json, not the raw array: the driver canonicalizes results with
        # pandas sort_values, which raises "unhashable type: 'list'" on
        # array cells (round-3 driver-red). Spark and DuckDB to_json agree
        # byte-for-byte on int arrays ("[1,2,3]", "[]", "[null,2]").
        F.to_json(
            F.transform(F.col("embedding"), lambda x: qexpr(x).cast("int"))
        ).alias("q"),
        # guard the empty array: F.aggregate folds [] to the 0.0 seed
        # while the oracle's list_aggregate yields NULL — align on NULL
        F.round(
            F.when(
                F.size("embedding") > 0,
                F.sqrt(
                    F.aggregate(
                        F.col("embedding"),
                        F.lit(0.0),
                        lambda acc, x: acc + err_term(x),
                    )
                ),
            ),
            6,
        ).alias("recon_err"),
    )


# --- distributed k-means + semantic dedup ----------------------------

KMEANS_ITERS = 2  # fixed Lloyd rounds so the oracle replays them exactly

# Session-scoped memo for deterministic TRAINING artifacts (coarse
# centroids, PQ codebooks). The registered queries are hermetic — each
# retrains per run so the driver's one-query-per-session correctness
# gate exercises the full path — but training here is deterministic BY
# CONSTRUCTION (first-K init, fixed iteration count, DECIMAL-exact
# component sums, deterministic tie-breaks), so within one long-lived
# session (the bench suite, the pytest oracle replica) every retrain
# after the first recomputes bit-identical rows: r8 measured the same
# k-means ~13x per bench run across 9 lloyd + 4 codebook call sites.
# Production trains an index once and serves it for days; this memo is
# that amortization in miniature. Keyed on (applicationId, artifact,
# sf_dir, params); holds a coalesce(1).localCheckpoint()ed result — a
# k-row table in the block manager, lineage severed so downstream
# plans start from a leaf. ZERO oracle change: a memo hit returns the
# exact rows a rebuild would. Entries of dead sessions are evicted on
# the next insert (applicationId changes when a context is recreated,
# and a checkpoint does not outlive its context).
_TRAIN_MEMO: dict[tuple, DataFrame] = {}

# monotone suffix for _lloyd_centroids' temp-view names: calls nest
# (lloyd_super trains over lloyd_full's output) and tests run several
# trainers in one session — each chain gets its own view pair
_LLOYD_VIEW_SEQ = 0


def _memo_train(
    spark: SparkSession, key: tuple, build, corpus_scaled: bool = False
) -> DataFrame:
    app = spark.sparkContext.applicationId
    full = (app, *key)
    hit = _TRAIN_MEMO.get(full)
    if hit is not None:
        return hit
    for stale in [k for k in _TRAIN_MEMO if k[0] != app]:
        del _TRAIN_MEMO[stale]
    df = build()
    if not corpus_scaled:
        # constant-size families (k-row centroid/codebook tables):
        # one partition, one block — a leaf any plan broadcasts from.
        # Corpus-ROW-scaled entries (cell_asg) keep their natural
        # post-shuffle partitioning instead (advisor r9: coalesce(1)
        # there serializes the build and caps the artifact at one
        # 2 GB block at larger SFs).
        df = df.coalesce(1)
    df = df.localCheckpoint(eager=True)
    _TRAIN_MEMO[full] = df
    return df


def _emb_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )


# Session-scoped memo for the canonical FLAT day-1 IVF state (full
# embedding corpus assigned to the memoized lloyd_full centroids):
# ann_hier_recall's flat leg, ann_cell_split and ann_cell_merge all
# build this byte-identical artifact per run, differing only in the
# state name (their maintenance legs then mutate their own copy). The
# _TRAIN_MEMO discipline applied to an on-disk artifact: the FIRST
# consumer pays the real build (visible in its bench build phase row),
# later consumers ivf_state.clone it — a file-level copy of the same
# parquet bytes, so results are identical BY CONSTRUCTION. Keyed on
# applicationId: a fresh driver session always builds from scratch,
# and the memo-owned source state is never mutated by any consumer.
_STATE_MEMO: dict[tuple, str] = {}


def _memo_flat_state(spark: SparkSession, sf_dir: str, dst: str) -> str:
    import hashlib

    from ..operators import ivf_state

    app = spark.sparkContext.applicationId
    key = (app, "flat_ivf", sf_dir)
    src = _STATE_MEMO.get(key)
    if src is None:
        for stale in [k for k in _STATE_MEMO if k[0] != app]:
            del _STATE_MEMO[stale]
        src = "flatmemo_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        n = scaling.corpus_count(spark, sf_dir, "embeddings")
        ivf_state.build(
            _emb_frame(spark, sf_dir),
            _train_lloyd_full(spark, sf_dir),
            src,
            n_rows=n,
        )
        _STATE_MEMO[key] = src
    ivf_state.clone(spark, src, dst)
    return dst


# session-scoped memo for the training-relation counts the sample
# predicate needs (one count job per family per session — the same
# metadata-scale cost corpus_count already pays for the raw table)
_REL_COUNT_MEMO: dict[tuple, int] = {}


def _relation_count(spark: SparkSession, key: tuple, df: DataFrame) -> int:
    app = spark.sparkContext.applicationId
    full = (app, *key)
    hit = _REL_COUNT_MEMO.get(full)
    if hit is not None:
        return hit
    for stale in [s for s in _REL_COUNT_MEMO if s[0] != app]:
        del _REL_COUNT_MEMO[stale]
    n = df.count()
    _REL_COUNT_MEMO[full] = n
    return n


def _training_sample(
    df: DataFrame, *, tag: str, k: int, cap: int, n_src: int
) -> DataFrame:
    """Bounded deterministic training sample (scaling.py contract):
    keep a vector iff u32(md5(tag:vec_id)) * n_src < cap * 2^32, OR it
    is a first-k seed — a scan-level filter, so TRAINING cost is
    O(cap·k·iters) at every corpus size while assignment stays
    full-corpus. When n_src <= cap the predicate keeps everything, so
    the short-circuit below returns the input UNTOUCHED: results AND
    plans are byte-identical to the unsampled form at every corpus
    small enough (proof in functions/scaling.py; parity on the binding
    branch is pinned by tests/test_train_sample.py and the sf1 marker
    suite). The oracle replays the identical predicate via
    scaling.train_sample_pred_sql inside _kmeans_ctes/_pq_ctes."""
    if n_src <= cap:
        return df
    return df.filter(_sample_pred_col(tag, k=k, cap=cap, n_src=n_src))


def _sample_pred_col(tag: str, *, k: int, cap: int, n_src: int):
    """The sample-membership predicate as a boolean Column — the ONE
    Spark-side definition (the trainer filters on it; the
    ann_train_autocap chart counts it, including where the trainer's
    n<=cap short-circuit skips evaluating it)."""
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(tag + ":"), F.col("vec_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (F.col("vec_id") < k) | (
        u32 * F.lit(int(n_src)) < F.lit(int(cap) * (1 << 32))
    )


def _train_lloyd_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_frame(spark, sf_dir)
    k = _derived_cells(spark, sf_dir)
    base = _training_sample(
        emb,
        tag="lloydtrain",
        k=k,
        cap=scaling.train_cap(k),
        n_src=scaling.corpus_count(spark, sf_dir, "embeddings"),
    )
    return _memo_train(
        spark, ("lloyd_full", sf_dir), lambda: _lloyd_centroids(base, k=k)
    )


def _train_lloyd_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trains on the day-1 prefix but sizes k for the FULL corpus the
    # index will serve (FAISS sizes nlist by expected index cardinality,
    # not by training-sample size)
    base = _emb_frame(spark, sf_dir).filter(F.col("vec_id") < EMB_INCR_MIN)
    k = _derived_cells(spark, sf_dir)
    if k > EMB_INCR_MIN:
        # the first-k seed draws from vec_id < k; a prefix smaller than
        # k would silently seed only |prefix| centroids, contradicting
        # the "k sized for the corpus the index serves" contract (the
        # _derived_planes/_P_MAX loud-failure discipline; advisor r10).
        # Corpus >= 2^18 rows trips this — scale the day-1 prefix
        # fixture with the corpus when it does.
        raise ValueError(
            f"derived n_cells {k} exceeds the day-1 training prefix "
            f"EMB_INCR_MIN={EMB_INCR_MIN} — the first-k init would "
            "silently seed only the prefix; enlarge the prefix"
        )
    return _memo_train(
        spark,
        ("lloyd_prefix", sf_dir, EMB_INCR_MIN),
        lambda: _lloyd_centroids(base, k=k),
    )


def _train_lloyd_sem_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_frame(spark, sf_dir)
    k = _derived_cells(spark, sf_dir)
    aug = _sem_augmented(emb)
    base = _training_sample(
        aug,
        tag="lloydtrain",
        k=k,
        cap=scaling.train_cap(k),
        n_src=_relation_count(spark, ("cnt_sem_aug", sf_dir), aug),
    )
    return _memo_train(
        spark,
        ("lloyd_sem_aug", sf_dir),
        lambda: _lloyd_centroids(base, k=k),
    )


def _train_pq_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_frame(spark, sf_dir)
    base = _training_sample(
        emb,
        tag="pqtrain",
        k=PQ_K,
        cap=scaling.train_cap(PQ_K, scaling.TRAIN_PER_CODE),
        n_src=scaling.corpus_count(spark, sf_dir, "embeddings"),
    )
    return _memo_train(
        spark,
        ("pq_raw", sf_dir, PQ_M, PQ_K),
        lambda: _pq_codebooks(_pq_subvectors(base), subdim=PQ_SUBDIM),
    )


def _train_pq_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    nemb = _l2_normalized(_emb_frame(spark, sf_dir))
    base = _training_sample(
        nemb,
        tag="pqtrain",
        k=IVFPQ_K,
        cap=scaling.train_cap(IVFPQ_K, scaling.TRAIN_PER_CODE),
        n_src=_relation_count(spark, ("cnt_nemb", sf_dir), nemb),
    )
    return _memo_train(
        spark,
        ("pq_norm", sf_dir, IVFPQ_M, IVFPQ_K),
        lambda: _pq_codebooks(
            _pq_subvectors(base, m=IVFPQ_M), k=IVFPQ_K,
            subdim=DIM // IVFPQ_M,
        ),
    )


def _train_pq_norm_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _emb_frame(spark, sf_dir).filter(F.col("vec_id") < EMB_INCR_MIN)
    return _memo_train(
        spark,
        ("pq_norm_prefix", sf_dir, IVFPQ_M, IVFPQ_K, EMB_INCR_MIN),
        lambda: _pq_codebooks(
            _pq_subvectors(_l2_normalized(base), m=IVFPQ_M), k=IVFPQ_K,
            subdim=DIM // IVFPQ_M,
        ),
    )


def _train_lloyd_super(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g ≈ √k SUPER-centroids trained over the k-row centroid table —
    the top level of the hierarchical coarse quantizer (scaling.n_super;
    the FAISS two-level-assign posture). Training input is k rows, so
    no sample bound is needed; same fixed-iteration deterministic Lloyd
    as every other trainer, replayed by the oracle via
    _kmeans_ctes(prefix='h', k_sql=n_super_sql)."""
    cent = _train_lloyd_full(spark, sf_dir)
    g = scaling.n_super(_derived_cells(spark, sf_dir))
    centv = cent.select(
        F.col("cid").alias("vec_id"), F.col("c_emb").alias("embedding")
    )
    return _memo_train(
        spark,
        ("lloyd_super", sf_dir),
        lambda: _lloyd_centroids(centv, k=g),
    )


def _train_cell_asg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid) for the whole corpus against the lloyd_full
    centroids — the one memo entry that scales with corpus ROWS (two
    ints per row; the k-row families are constants). Session-scoped
    like the rest: the PRODUCTION form of this artifact is the
    persisted bucketed cell table (operators/ivf_state), not a memo."""
    emb = _emb_frame(spark, sf_dir)
    cent = _train_lloyd_full(spark, sf_dir)
    return _memo_train(
        spark,
        ("cell_asg", sf_dir),
        lambda: _assign_cells(emb, cent),
        corpus_scaled=True,
    )


def _train_rcent(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_frame(spark, sf_dir)
    return _memo_train(
        spark,
        ("rcent", sf_dir),
        lambda: _residual_centroids(
            _l2_normalized(emb), _train_cell_asg(spark, sf_dir)
        ),
    )


def _train_pq_resid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_frame(spark, sf_dir)
    resid = _residual_vectors(
        _l2_normalized(emb),
        _train_cell_asg(spark, sf_dir),
        _train_rcent(spark, sf_dir),
    )
    base = _training_sample(
        resid,
        tag="pqtrain",
        k=IVFPQ_K,
        cap=scaling.train_cap(IVFPQ_K, scaling.TRAIN_PER_CODE),
        n_src=_relation_count(spark, ("cnt_resid", sf_dir), resid),
    )
    return _memo_train(
        spark,
        ("pq_resid", sf_dir, IVFPQ_M, IVFPQ_K),
        lambda: _pq_codebooks(_pq_subvectors(base, m=IVFPQ_M), k=IVFPQ_K,
                              subdim=DIM // IVFPQ_M),
    )


# The ONE definition per family (advisor r9: builders duplicated
# between the warm-up and the query call sites risk silently diverging
# — the memo would serve whichever ran first while the oracle replays
# the call-site form). Query functions call these trainers; the bench
# warm-up iterates this dict in dependency order (lloyd_full before
# cell_asg before rcent before pq_resid), so each train.* row times
# only its own marginal work.
_TRAIN_FAMILIES = {
    "lloyd_full": _train_lloyd_full,
    "lloyd_prefix": _train_lloyd_prefix,
    "lloyd_sem_aug": _train_lloyd_sem_aug,
    "lloyd_super": _train_lloyd_super,
    "pq_raw": _train_pq_raw,
    "pq_norm": _train_pq_norm,
    "pq_norm_prefix": _train_pq_norm_prefix,
    "cell_asg": _train_cell_asg,
    "rcent": _train_rcent,
    "pq_resid": _train_pq_resid,
}


def warm_training_memo(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Train every memoized artifact family up front and return its
    wall seconds per family ({"train.lloyd_full": s, ...}) — the bench
    calls this once per session so EVERY query's own timing is a
    deterministic warm-training serve cost (no query's number depends
    on whether an earlier query happened to train first), while the
    one-time training cost stays visible as its own tail rows.
    Coverage (every consumer family is in _TRAIN_FAMILIES) is pinned
    by tests/test_training_memo.py."""
    import time

    out: dict[str, float] = {}
    for fam, trainer in _TRAIN_FAMILIES.items():
        t0 = time.perf_counter()
        trainer(spark, sf_dir)
        out[f"train.{fam}"] = round(time.perf_counter() - t0, 3)
    return out


def _lloyd_centroids(
    emb: DataFrame, iters: int = KMEANS_ITERS, *, k: int
) -> DataFrame:
    """Distributed Lloyd's k-means, the 100 TB way: per iteration, (1)
    every vector scores against the BROADCAST centroid table (k rows)
    and argmaxes its cell — no shuffle of the corpus; (2) new centroids
    are per-(cell, position) means computed as a partial/final hash agg
    over posexploded components — the shuffle carries at most
    k·dim partial rows per map task, never vectors. Deterministic
    throughout (first-k init with k derived from the corpus size by
    the trainers — functions/scaling.n_cells, fixed iteration count, component
    sums in DECIMAL(28,9) so partial-agg order cannot change a bit) —
    which is what lets a DuckDB oracle replay the whole training loop.

    Returns cid → c_emb (array<double>). Cells that lose all members
    disappear (standard Lloyd's degeneracy; deterministic here).
    """
    spark = emb.sparkSession
    # Each iteration runs as ONE spark.sql statement over temp views —
    # per-row HOF argmax over the one-row broadcast centroid array
    # (zero Exchange, zero Sort for assignment, guide §2.4), analyzed
    # once per iteration JVM-side instead of eagerly re-analyzing a
    # growing expression tree on every DataFrame transformation. The
    # centroid update is posexplode → (cid, pos) decimal sums →
    # per-cid collect (the shuffle carries at most k·dim partial rows
    # per map task): a dim-wide single hash agg of 64 DECIMAL(28,9)
    # sums was tried and generates codegen the JIT pays ~8 s for COLD
    # per family (precision 28 > 18, so every sum is BigDecimal-backed)
    # — measured interleaved on a quiet host: wide-agg 10.8 s cold /
    # 2.2-2.7 warm vs this form 2.6 cold / 1.8-2.0 warm, bit-identical
    # results. Tie discipline unchanged (cos DESC, lowest cid —
    # array_max over struct(s, -cid), see vectors.py); the cosine SQL
    # reproduces vectors.cosine's exact index-ordered accumulation and
    # decimal addition is exactly associative, so centroids are
    # bit-identical (byte-compared across all forms and families).
    global _LLOYD_VIEW_SEQ
    _LLOYD_VIEW_SEQ += 1
    v_emb = f"_lloyd_emb_{_LLOYD_VIEW_SEQ}"
    v_cent = f"_lloyd_cent_{_LLOYD_VIEW_SEQ}"
    emb.createOrReplaceTempView(v_emb)
    cent = spark.sql(
        f"SELECT vec_id AS cid, transform(embedding,"
        f" x -> cast(x as double)) AS c_emb FROM {v_emb}"
        f" WHERE vec_id < {int(k)}"
    )
    cos_sql = (
        "aggregate(zip_with(e.embedding, c.c_emb, (x, y) ->"
        " cast(x as double) * cast(y as double)), cast(0.0 as double),"
        " (acc, v) -> acc + v) / "
        "(sqrt(aggregate(e.embedding, cast(0.0 as double), (acc, v) ->"
        " acc + cast(v as double) * cast(v as double))) * "
        "sqrt(aggregate(c.c_emb, cast(0.0 as double), (acc, v) ->"
        " acc + cast(v as double) * cast(v as double))))"
    )
    iter_sql = f"""
WITH asg AS (
  SELECT /*+ BROADCAST(b) */ e.vec_id, e.embedding,
         -array_max(transform(b._cents,
                              c -> struct({cos_sql} AS s, -c.cid AS nc))).nc
           AS cid
  FROM {v_emb} e CROSS JOIN (
    SELECT sort_array(collect_list(struct(cid, c_emb))) AS _cents
    FROM {v_cent}
  ) b
),
pe AS (SELECT cid, posexplode(embedding) AS (pos, x) FROM asg),
sums AS (
  SELECT cid, pos, sum(cast(cast(x as double) as decimal(28,9))) AS s,
         count(*) AS n
  FROM pe GROUP BY cid, pos
),
comp AS (SELECT cid, pos, cast(s as double) / n AS v FROM sums)
SELECT cid, sort_array(collect_list(struct(pos, v))).v AS c_emb
FROM comp GROUP BY cid
"""
    for _ in range(iters):
        cent.createOrReplaceTempView(v_cent)
        cent = spark.sql(iter_sql)
    # spark.sql resolves views eagerly at call time, so the returned
    # plan survives the drop
    spark.catalog.dropTempView(v_emb)
    spark.catalog.dropTempView(v_cent)
    return cent
    # Lineage note: iteration N's plan contains iterations 1..N-1 as
    # subtrees, so total corpus passes grow O(iters²). At the fixed
    # iters=2 here that is one extra pass and measurably CHEAPER than
    # materializing: a .cache() per round was tried and costs 3× wall
    # in a default-conf session (the k-row materialization job runs
    # with un-coalesced shuffle partitions and severs the AQE chain).
    # A long-running trainer (iters ≫ 2) should localCheckpoint() the
    # k-row centroid table per round instead.


def _cos_vc_sql(v: str, c: str) -> str:
    """cos(float-list v.embedding, double-list c.c), index-ordered
    (explicit sums — the _sum_sql discipline)."""
    num = _sum_sql(
        f"CAST({v}.embedding[{{i}}] AS DOUBLE) * {c}.c[{{i}}]", DIM
    )
    nc = "sqrt(" + _sum_sql(f"{c}.c[{{i}}] * {c}.c[{{i}}]", DIM) + ")"
    return f"{num} / ({_norm_sql(v)} * {nc})"


def _kmeans_ctes(
    src: str,
    iters: int = KMEANS_ITERS,
    *,
    sampled: bool = True,
    sample_cap_sql: str | None = None,
    prefix: str = "",
    k_sql: str | None = None,
) -> str:
    """CTE chain replaying _lloyd_centroids over table/CTE ``src``:
    emits cent0..cent{iters} and s{i}/a{i} assignment steps; the final
    centroid table is cent{iters}. ``sampled=True`` (the corpus-scale
    trainers) bounds TRAINING to the deterministic
    scaling.train_sample_pred_sql sample — a no-op predicate whenever
    count(src) <= 64·k, which every gate-scale corpus satisfies;
    pass sampled=False for the day-1 prefix chains (their 400-row base
    is below every cap by construction, and their Python twins do not
    sample). ``prefix`` renames every generated CTE ({prefix}cent0..)
    so two Lloyd chains coexist in one oracle (the _pq_ctes
    convention; the hierarchical-assign chart trains supers over the
    centroid table). ``k_sql`` overrides the centroid-count derivation
    (default: _K_CELLS_SQL over the full embeddings corpus)."""
    p = prefix
    kq = k_sql or _K_CELLS_SQL
    # init: the first k rows of the TRAINING relation, k derived from
    # the FULL corpus the index will serve (embeddings count — matches
    # the Python trainers' _derived_cells even when src is a prefix or
    # augmented CTE)
    tpred = (
        "\n      WHERE "
        + scaling.train_sample_pred_sql(
            "lloydtrain",
            src,
            sample_cap_sql or scaling.train_cap_sql(kq),
            id_expr="v.vec_id",
            seed_lt_sql=kq,
        )
        if sampled
        else ""
    )
    parts = [
        f"""{p}cent0 AS (
      SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
      FROM {src} WHERE vec_id < {kq})"""
    ]
    for it in range(1, iters + 1):
        parts.append(f"""{p}s{it} AS (
      SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
      FROM {src} v, {p}cent{it - 1} c{tpred}),
    {p}a{it} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM {p}s{it}) WHERE rn = 1),
    {p}m{it} AS (
      SELECT cid, i,
             CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS v
      FROM (SELECT a.cid,
                   unnest(range(1, {DIM} + 1)) AS i,
                   unnest(list_transform(e.embedding,
                                         y -> CAST(y AS DOUBLE))) AS x
            FROM {p}a{it} a JOIN {src} e USING (vec_id))
      GROUP BY cid, i),
    {p}cent{it} AS (SELECT cid, list(v ORDER BY i) AS c FROM {p}m{it} GROUP BY cid)""")
    return ",\n    ".join(parts)


@register(
    "ann_ivf_kmeans",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    final_s AS (
      SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
      FROM embeddings v, cent{KMEANS_ITERS} c)
    SELECT vec_id, CAST(cid AS BIGINT) AS cid, round(cos, 4) AS cos_sim
    FROM (SELECT vec_id, cid, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cid) AS rn
          FROM final_s)
    WHERE rn = 1
    """,
    doc="IVF with TRAINED cells: fixed-iteration distributed Lloyd's "
        "k-means (deterministic first-N init, per-iteration broadcast "
        "of the k-row centroid table, centroid update as a partial/"
        "final hash agg over posexploded components with DECIMAL-exact "
        "sums) followed by the final cell assignment of every vector. "
        "This is the training step ann_ivf_cells defers ('at 100 TB "
        "cells are kmeans-trained'): same inverted-file serving shape, "
        "centroids now data-fitted. The corpus never shuffles — each "
        "iteration moves k·dim partial sums, not vectors; the oracle "
        "replays the entire loop in SQL, so convergence is "
        "hash-checked, not eyeballed.",
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    cent = _train_lloyd_full(spark, sf_dir)
    # per-row HOF argmax (zero Exchange, guide §2.4) — the winning
    # struct carries both the cid and its cosine
    return (
        emb.crossJoin(F.broadcast(vectors.centroid_struct_array(cent)))
        .select(
            "vec_id",
            F.array_max(
                vectors.scored_cents(F.col("embedding"), F.col("_cents"))
            ).alias("_b"),
        )
        .select(
            "vec_id",
            (-F.col("_b.nc")).cast("long").alias("cid"),
            F.round(F.col("_b.s"), 4).alias("cos_sim"),
        )
    )


# SemDeDup harness: the synthetic embeddings carry no near-duplicates
# (max pairwise cosine 0.51 measured), so the query deterministically
# plants perturbed twins — y = 0.9·x + 0.05 per component, cosine to
# the parent in [0.899, 0.94] on this corpus — and then detects them.
# The detector is the operator under test; the planting is the harness
# (same contract as pii_redact), replayed verbatim by the oracle.
SEM_PLANT_MOD = 25
SEM_OFFSET = 1_000_000
SEM_THRESHOLD = 0.85  # planted twins ≥ 0.899; organic pairs ≤ 0.52


def _sem_augmented(emb: DataFrame) -> DataFrame:
    """The SemDeDup corpus: every vector double-cast, plus the
    deterministically planted near-dup twins (vec_id % SEM_PLANT_MOD
    scaled 0.9 + 0.05, offset ids)."""
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    twins = emb.filter(F.col("vec_id") % SEM_PLANT_MOD == 0).select(
        (F.col("vec_id") + SEM_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") * 0.9 + 0.05
        ).alias("embedding"),
    )
    return base.unionByName(twins)


@register(
    "dedup_semantic",
    oracle=f"""
    WITH aug AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
               AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + {SEM_OFFSET},
             list_transform(embedding, x -> 0.9 * CAST(x AS DOUBLE) + 0.05)
      FROM embeddings WHERE vec_id % {SEM_PLANT_MOD} = 0),
    {_kmeans_ctes("aug")},
    fs AS (
      SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
      FROM aug v, cent{KMEANS_ITERS} c),
    af AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM fs) WHERE rn = 1),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN aug ea ON ea.vec_id = a.vec_id
      JOIN aug eb ON eb.vec_id = b.vec_id
      WHERE list_aggregate(list_transform(range(1, {DIM} + 1),
              i -> ea.embedding[i] * eb.embedding[i]), 'sum')
            / (sqrt(list_aggregate(list_transform(ea.embedding,
                 x -> x * x), 'sum'))
             * sqrt(list_aggregate(list_transform(eb.embedding,
                 x -> x * x), 'sum'))) >= {SEM_THRESHOLD})
    SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cid,
           CAST(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS is_dup
    FROM af f LEFT JOIN dups d USING (vec_id)
    """,
    doc="SemDeDup-style semantic dedup: k-means-cluster the corpus "
        "(the same fixed-iteration Lloyd's loop as ann_ivf_kmeans), "
        "then WITHIN each cell mark every vector that has a lower-id "
        "cell-mate above the cosine threshold — keep-lowest-id per "
        "semantic near-dup group. The cell assignment is what makes "
        "this 100 TB-shaped: pairwise cosine runs per cell (an "
        "equi-join on cid), never corpus². Cross-cell near-dups are "
        "the method's documented recall trade — SemDeDup accepts it "
        "because k scales with corpus size. Near-dup twins are "
        "deterministically planted (see SEM_PLANT_MOD above); the "
        "oracle replays planting, training, assignment and pruning.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    aug = _sem_augmented(emb)
    cent = _train_lloyd_sem_aug(spark, sf_dir)
    # per-row HOF argmax (zero Exchange, guide §2.4)
    af = aug.crossJoin(
        F.broadcast(vectors.centroid_struct_array(cent))
    ).select(
        "vec_id",
        "embedding",
        vectors.argmax_cos_cid(F.col("embedding"), F.col("_cents")).alias(
            "cid"
        ),
    )
    a = af.select(
        F.col("cid"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a")
    )
    b = af.select(
        F.col("cid"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b")
    )
    cos_p = vectors.cosine(F.col("e_a"), F.col("e_b"))
    dups = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos_p >= SEM_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return af.join(dups, "vec_id", "left").select(
        "vec_id",
        F.col("cid").cast("long").alias("cid"),
        F.coalesce(F.col("_d"), F.lit(0)).cast("int").alias("is_dup"),
    )


@register(
    "ann_recall_report",
    oracle=None,  # placeholder; replaced just below via REGISTRY
    doc="(oracle composed below)",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall contract: per query, how many of the exact
    cosine top-k neighbors (knn_brute_force) the multi-probe LSH path
    (ann_lsh_multiprobe) recovered. Composes the two REGISTERED
    pipelines — the number the 100 TB operator actually ships with,
    hash-checked instead of quoted. The left join keys on the exact
    top-k, so recall@k = hits / k by construction."""
    b = knn_brute_force(spark, sf_dir).select("query_id", "neighbor_id")
    l = (
        ann_lsh_multiprobe(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    per = (
        b.join(l, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("int").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hit"),
        )
    )
    return per.select(
        "query_id",
        "n_true",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_true"), 4).alias(
            "recall_at_k"
        ),
    )


def _recall_oracle() -> str:
    from . import REGISTRY

    knn = REGISTRY["knn_brute_force"].oracle
    mp = REGISTRY["ann_lsh_multiprobe"].oracle
    return f"""
    WITH brute AS ({knn}),
    lsh AS ({mp}),
    j AS (
      SELECT b.query_id,
             CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM brute b LEFT JOIN lsh l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id)
    SELECT query_id,
           CAST(count(*) AS INT) AS n_true,
           CAST(sum(hit) AS INT) AS n_hit,
           round(CAST(sum(hit) AS DOUBLE) / count(*), 4) AS recall_at_k
    FROM j GROUP BY query_id
    """


# the oracle composes the two already-registered oracles verbatim —
# patch it in after both exist (registration order guarantees that)
def _patch_recall_oracle() -> None:
    from . import REGISTRY

    q = REGISTRY["ann_recall_report"]
    q.oracle = _recall_oracle()
    q.doc = (
        "Per-query recall@k of the multi-probe LSH ANN path against the "
        "exact brute-force top-k — the two registered pipelines joined, "
        "so the operator's recall contract is itself driver-hash-checked "
        "every round. Oracle: the two oracles composed as CTEs with the "
        "identical join. Reading the number: the synthetic embeddings "
        "are uniform random (max pairwise cosine 0.51 at sf0.01), so "
        "'nearest' neighbors are barely nearer than random and "
        "hyperplane buckets carry little signal — recall@3 ≈ 0.1 here "
        "is a property of structureless data, not the operator (planted "
        "near-dups, which DO have structure, are found at full recall "
        "by the same machinery in dedup_semantic / "
        "dedup_embedding_cosine). On real clustered embeddings the "
        "planes/probes knobs trade candidate cost for recall, and this "
        "report is how that trade is measured."
    )


_patch_recall_oracle()


# --- power iteration (top principal direction) -----------------------

PI_ITERS = 3


def _pi_ctes(iters: int = PI_ITERS) -> str:
    """CTE chain replaying the power iteration: v0 = normalized ones;
    each round s_i = x_i·v (index-ordered), w = Σ x_i s_i / n via
    DECIMAL-exact per-position sums, v = w / ||w||."""
    inv = f"1.0 / sqrt({DIM})"
    parts = [
        f"""v0 AS (SELECT list_transform(range(1, {DIM} + 1),
                          i -> {inv}) AS v)"""
    ]
    for it in range(1, iters + 1):
        parts.append(f"""s{it} AS (
      SELECT e.vec_id, e.embedding,
             list_aggregate(list_transform(range(1, {DIM} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * v.v[i]), 'sum') AS s
      FROM embeddings e, v{it - 1} v),
    w{it} AS (
      SELECT i AS pos,
             CAST(sum(CAST(x * s AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS w
      FROM (SELECT s, unnest(range(1, {DIM} + 1)) AS i,
                   unnest(list_transform(embedding,
                                         y -> CAST(y AS DOUBLE))) AS x
            FROM s{it})
      GROUP BY i),
    wa{it} AS (SELECT list(w ORDER BY pos) AS w FROM w{it}),
    v{it} AS (
      SELECT list_transform(w, x -> x / sqrt(list_aggregate(
               list_transform(w, y -> y * y), 'sum'))) AS v
      FROM wa{it})""")
    return ",\n    ".join(parts)


@register(
    "embedding_power_iteration",
    oracle=f"""
    WITH {_pi_ctes()},
    lam AS (SELECT sqrt(list_aggregate(list_transform(w, y -> y * y),
                        'sum')) AS lam
            FROM wa{PI_ITERS})
    SELECT CAST(i AS INT) AS pos,
           round(v.v[i], 6) AS loading,
           round(lam.lam, 6) AS eigenvalue
    FROM v{PI_ITERS} v, lam, unnest(range(1, {DIM} + 1)) AS t(i)
    """,
    doc="Top principal direction of the embedding corpus via "
        f"{PI_ITERS} fixed power-method iterations — the spectral "
        "diagnostic (and whitening precursor) of embedding-quality "
        "work: a dominant direction with a large eigenvalue means the "
        "space is anisotropic and cosine scores are dominated by a "
        "shared component. Distributed shape per iteration: one "
        "corpus pass computes x·v per row (v broadcast, index-ordered "
        "double), and the Gram product Σ x·s accumulates as a "
        "partial/final hash agg over posexploded components with "
        "DECIMAL(28,9)-exact sums — the shuffle carries dim-sized "
        "partials, never vectors, exactly like the k-means trainer. "
        "Deterministic init (normalized ones) + fixed iterations + "
        "exact sums ⇒ the oracle replays the whole optimization "
        "bit-for-bit.",
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    inv = 1.0 / (DIM ** 0.5)
    vdf = spark.range(1).select(
        F.array(*[F.lit(inv) for _ in range(DIM)]).alias("v")
    )
    wa = None
    for _ in range(PI_ITERS):
        s = emb.crossJoin(F.broadcast(vdf)).select(
            "embedding",
            F.aggregate(
                F.zip_with(
                    "embedding", "v", lambda x, v: x.cast("double") * v
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("s"),
        )
        pe = s.select(F.posexplode("embedding").alias("pos0", "x"), "s")
        w = pe.groupBy("pos0").agg(
            (
                F.sum((F.col("x").cast("double") * F.col("s")).cast("decimal(28,9)"))
                .cast("double") / F.count("*")
            ).alias("w")
        )
        # sever the round's lineage at the 1-row w vector (the
        # curation_quality_train / BPE loop discipline): without it
        # round N's plan nests rounds 1..N-1 as broadcast subtrees and
        # the driver re-analyzes the whole pyramid per round
        wa = iter_checkpoint(
            w.groupBy().agg(
                F.sort_array(F.collect_list(F.struct("pos0", "w"))).alias("pp")
            ).select(F.col("pp.w").alias("w"))
        )
        nrm = F.sqrt(
            F.aggregate(F.col("w"), F.lit(0.0), lambda a, y: a + y * y)
        )
        vdf = wa.select(F.transform("w", lambda x: x / nrm).alias("v"))
    lam = F.sqrt(F.aggregate(F.col("w"), F.lit(0.0), lambda a, y: a + y * y))
    final = wa.select(
        F.transform("w", lambda x: x / lam).alias("v"), lam.alias("lam")
    )
    return final.select(
        F.posexplode("v").alias("pos0", "vv"), F.col("lam")
    ).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round("vv", 6).alias("loading"),
        F.round("lam", 6).alias("eigenvalue"),
    )


# --- product quantization ---------------------------------------------

# PQ: split each vector into M contiguous subvectors, k-means each
# subspace independently (L2, fixed iterations, first-K init), encode
# every vector as M small codes — the compression step behind IVF-PQ
# serving indexes (8 codes of 3 bits here stand in for the usual 8
# bits at production scale; the plan shape is identical). The output
# is pure INTEGER codes, so the hash check is exact with no float
# rounding concerns; determinism inside the loop uses the same
# DECIMAL-exact mean discipline as ann_ivf_kmeans.
PQ_M = 4          # subspaces (DIM/PQ_M dims each)
PQ_K = 8          # centroids per subspace
PQ_ITERS = 2      # fixed Lloyd rounds, oracle-unrolled
PQ_SUBDIM = DIM // PQ_M


def _pq_l2_sql(v: str, c: str, subdim: int = PQ_SUBDIM) -> str:
    """Squared L2 between subvector lists v.sv and c.c (index order;
    explicit sums — the _sum_sql discipline)."""
    return _sum_sql(
        f"({v}.sv[{{i}}] - {c}.c[{{i}}]) * ({v}.sv[{{i}}] - {c}.c[{{i}}])",
        subdim,
    )


def _pq_ctes(
    normalized: bool = False,
    m: int = PQ_M,
    k: int = PQ_K,
    train_filter: str = "",
    prefix: str = "",
    src: str | None = None,
    sampled: bool = True,
    sample_cap_sql: str | None = None,
) -> str:
    """CTE chain: subvectors sv, codebooks pc0..pc{PQ_ITERS}.
    ``normalized=True`` L2-normalizes each vector before the subvector
    split — the IVFPQ serving posture, where on the unit sphere
    ||q - x||^2 = 2 - 2*cos(q, x) and ADC-L2 ranking is monotonically
    the cosine ranking (the ann_ivfpq_recall chart measured the raw
    form at recall 0.05 vs 0.48 for the same candidates — an honest
    metric mismatch, fixed here). The compression-demo queries
    (embedding_pq_codes, ann_pq_adc_search) keep the raw form their
    green rows pinned. ``train_filter`` (a predicate on vec_id)
    restricts codebook TRAINING to a subset — the incremental posture,
    where codebooks freeze on the initial corpus and later batches only
    encode — while ``sv`` still covers every vector for assignment.
    ``prefix`` renames every generated CTE ({prefix}sv,
    {prefix}pc0..) so two PQ chains can coexist in one oracle (the
    residual-vs-plain chart); ``src`` points the subvector split at a
    caller-provided (vec_id, double-list embedding) CTE instead of
    embeddings/nemb. Defaults generate byte-identical text to the
    pre-parameter form — the four green oracles embedding it are
    untouched."""
    subdim = DIM // m
    p = prefix
    if src is None:
        src = "embeddings"
        if normalized:
            src = "nemb"
    parts = []
    if normalized:
        parts.append(f"""nemb AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_aggregate(list_transform(embedding,
                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')))
               AS embedding
      FROM embeddings
      WHERE list_aggregate(list_transform(embedding,
              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum') > 0)""")
    parts.append(
        f"""{p}sv AS (
      SELECT vec_id, sub,
             list_transform(embedding[sub * {subdim} + 1 :
                                      (sub + 1) * {subdim}],
                            x -> CAST(x AS DOUBLE)) AS sv
      FROM {src}, unnest(range(0, {m})) AS t(sub)),
    {p}pc0 AS (
      SELECT sub, vec_id AS cid, sv AS c FROM {p}sv WHERE vec_id < {k})"""
    )
    preds = []
    if train_filter:
        preds.append(f"v.{train_filter}")
    if sampled:
        # bounded deterministic codebook-training sample (per-vector
        # predicate — every subvector of a kept vector trains; the
        # Python twins sample the vector relation before the split).
        # No-op whenever count(src) <= 256·k — every gate-scale corpus.
        preds.append(
            scaling.train_sample_pred_sql(
                "pqtrain",
                src,
                sample_cap_sql
                or str(scaling.train_cap(k, scaling.TRAIN_PER_CODE)),
                id_expr="v.vec_id",
                seed_lt_sql=str(k),
            )
        )
    tf = f" WHERE {' AND '.join(preds)}" if preds else ""
    for it in range(1, PQ_ITERS + 1):
        parts.append(f"""{p}ps{it} AS (
      SELECT v.vec_id, v.sub, c.cid, {_pq_l2_sql('v', 'c', subdim)} AS d
      FROM {p}sv v JOIN {p}pc{it - 1} c ON v.sub = c.sub{tf}),
    {p}pa{it} AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d, cid) AS rn
        FROM {p}ps{it}) WHERE rn = 1),
    {p}pm{it} AS (
      SELECT sub, cid, i,
             CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS v
      FROM (SELECT a.sub, a.cid,
                   unnest(range(1, {subdim} + 1)) AS i,
                   unnest(e.sv) AS x
            FROM {p}pa{it} a JOIN {p}sv e
              ON a.vec_id = e.vec_id AND a.sub = e.sub)
      GROUP BY sub, cid, i),
    {p}pc{it} AS (SELECT sub, cid, list(v ORDER BY i) AS c
               FROM {p}pm{it} GROUP BY sub, cid)""")
    return ",\n    ".join(parts)


def _l2_normalized(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding): each vector divided by its L2 norm —
    index-ordered double fold on both engines (the established
    bit-identical accumulation), so the oracle's nemb CTE replays it
    exactly. Zero-norm vectors are FILTERED in both engines (they are
    cosine-undefined and unsearchable): without the guard, Spark's
    non-ANSI divide yields NULL components while DuckDB yields
    inf/nan — the exact engine divergence the MAD detector's zero
    guard fixed (events_anomaly_mad), made identical and intentional
    here."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda a, t: a + t,
        )
    )
    return (
        emb.withColumn("_n", norm)
        .filter(F.col("_n") > 0)
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: x.cast("double") / F.col("_n")
            ).alias("embedding"),
        )
    )


def _pq_subvectors(emb: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, sub, sv): m contiguous double-cast subvectors per vector."""
    subdim = DIM // m
    return emb.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("sub"),
                    F.transform(
                        F.slice("embedding", i * subdim + 1, subdim),
                        lambda x: x.cast("double"),
                    ).alias("sv"),
                )
                for i in range(m)
            ])
        ).alias("t"),
    ).select("vec_id", "t.sub", "t.sv")


def _pq_d():
    # built lazily: a module-level Column would require an active
    # SparkContext at import time (F.col asserts one in pyspark 4)
    return F.aggregate(
        F.zip_with(F.col("sv"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, t: a + t,
    )


def _pq_codebooks(
    sv: DataFrame, k: int = PQ_K, *, subdim: int | None = None
) -> DataFrame:
    """(sub, cid, c): per-subspace codebooks — fixed-PQ_ITERS Lloyd's,
    first-k init, DECIMAL-exact mean updates (oracle-unrolled).
    ``subdim`` is accepted (and ignored) for call-site compatibility —
    the posexplode update below no longer depends on the width."""
    # One spark.sql statement per iteration over temp views (the
    # _lloyd_centroids discipline): per-(row, sub) argmin over that
    # subspace's collected codebook array (broadcast m-row side — no
    # n·m·k scored rows, no window Exchange+Sort, guide §2.4; tie
    # discipline d ASC then lowest cid, identical to vectors.py), then
    # the centroid update as posexplode → (sub, cid, pos) decimal sums
    # → per-(sub, cid) collect. A subdim-wide single hash agg of
    # DECIMAL(28,9) sums was tried: precision 28 > 18 makes every sum
    # BigDecimal-backed and the generated aggregate pays a measured
    # ~4 s of cold JIT per family (7.7 s cold vs 3.6 for this form,
    # warm equal, interleaved on a quiet host) — and the bench/driver
    # pay each family exactly once, cold. Decimal addition is exactly
    # associative, so every component sum (and so the codebooks) is
    # bit-identical — byte-compared across forms for all families.
    spark = sv.sparkSession
    global _LLOYD_VIEW_SEQ
    _LLOYD_VIEW_SEQ += 1
    v_sv = f"_pq_sv_{_LLOYD_VIEW_SEQ}"
    v_cent = f"_pq_cent_{_LLOYD_VIEW_SEQ}"
    sv.createOrReplaceTempView(v_sv)
    cent = spark.sql(
        f"SELECT sub, vec_id AS cid, sv AS c FROM {v_sv}"
        f" WHERE vec_id < {int(k)}"
    )
    iter_sql = f"""
WITH asg AS (
  SELECT /*+ BROADCAST(a) */ v.vec_id, v.sub, v.sv,
         array_min(transform(a._codes, c -> struct(
           aggregate(zip_with(v.sv, c.c, (x, y) -> (x - y) * (x - y)),
                     cast(0.0 as double), (acc, t) -> acc + t) AS d,
           c.cid AS cid))).cid AS cid
  FROM {v_sv} v JOIN (
    SELECT sub, sort_array(collect_list(struct(cid, c))) AS _codes
    FROM {v_cent} GROUP BY sub
  ) a ON v.sub = a.sub
),
pe AS (SELECT sub, cid, posexplode(sv) AS (pos, x) FROM asg),
sums AS (
  SELECT sub, cid, pos, sum(cast(x as decimal(28,9))) AS s, count(*) AS n
  FROM pe GROUP BY sub, cid, pos
),
comp AS (SELECT sub, cid, pos, cast(s as double) / n AS v FROM sums)
SELECT sub, cid, sort_array(collect_list(struct(pos, v))).v AS c
FROM comp GROUP BY sub, cid
"""
    for _ in range(PQ_ITERS):
        cent.createOrReplaceTempView(v_cent)
        cent = spark.sql(iter_sql)
    # spark.sql resolves views eagerly at call time, so the returned
    # plan survives the drop
    spark.catalog.dropTempView(v_sv)
    spark.catalog.dropTempView(v_cent)
    return cent


def _pq_assign(sv: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, sub, cid): nearest code per subspace (ties to low cid).
    Per-row HOF argmin over the broadcast per-sub codebook arrays —
    zero window Exchange (guide §2.4)."""
    carr = cent.groupBy("sub").agg(
        F.sort_array(F.collect_list(F.struct(F.col("cid"), F.col("c")))).alias(
            "_codes"
        )
    )
    return sv.join(F.broadcast(carr), "sub").select(
        "vec_id",
        "sub",
        vectors.argmin_l2_cid(F.col("sv"), F.col("_codes")).alias("cid"),
    )


@register(
    "embedding_pq_codes",
    oracle=f"""
    WITH {_pq_ctes()},
    fs AS (
      SELECT v.vec_id, v.sub, c.cid, {_pq_l2_sql('v', 'c')} AS d
      FROM sv v JOIN pc{PQ_ITERS} c ON v.sub = c.sub),
    fa AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d, cid) AS rn
        FROM fs) WHERE rn = 1)
    SELECT vec_id,
           CAST(sum(CASE WHEN sub = 0 THEN cid END) AS INT) AS code0,
           CAST(sum(CASE WHEN sub = 1 THEN cid END) AS INT) AS code1,
           CAST(sum(CASE WHEN sub = 2 THEN cid END) AS INT) AS code2,
           CAST(sum(CASE WHEN sub = 3 THEN cid END) AS INT) AS code3
    FROM fa GROUP BY vec_id
    """,
    doc=f"Product quantization: each vector split into {PQ_M} "
        f"contiguous {PQ_SUBDIM}-dim subvectors; each subspace gets "
        f"its own {PQ_K}-centroid codebook via fixed-{PQ_ITERS}-round "
        "distributed Lloyd's (L2, first-K init, DECIMAL-exact mean "
        "updates — ann_ivf_kmeans' discipline per subspace), and "
        "every vector encodes as its nearest code per subspace — the "
        "compression step of an IVF-PQ serving index, shrinking "
        f"{DIM}×float32 to {PQ_M} small codes. All shuffles carry "
        "(id, sub, code) or codebook-sized rows, never full vectors "
        "twice; codes are integers so the oracle check is exact with "
        "no float rounding. The oracle replays subspace training and "
        "assignment unrolled.",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    sv = _pq_subvectors(emb)
    cent = _train_pq_raw(spark, sf_dir)
    fa = _pq_assign(sv, cent)
    return fa.groupBy("vec_id").agg(
        *[
            F.sum(F.when(F.col("sub") == m, F.col("cid")))
            .cast("int")
            .alias(f"code{m}")
            for m in range(PQ_M)
        ]
    )


# -------------------------------------------- hybrid retrieval (RRF)
RRF_K = 60      # standard reciprocal-rank-fusion damping constant
RRF_POOL = 20   # per-leg candidate pool fed into the fusion
RRF_TOPK = 10


def _rrf_oracle() -> str:
    from .dedup import _SHINGLES_CTE

    return f"""
    WITH {_SHINGLES_CTE},
    shx AS (SELECT doc_id, unnest(shingles) AS s FROM shf),
    nsh AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS nsh FROM shf),
    sem0 AS (
      SELECT a.vec_id AS qid, b.vec_id AS did, {_COS_SQL} AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id % {QUERY_MOD} = 0),
    sem AS (SELECT qid, did,
                   CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, did) AS BIGINT) AS r
            FROM sem0),
    semk AS (SELECT * FROM sem WHERE r <= {RRF_POOL}),
    qset AS (SELECT vec_id AS qid FROM embeddings
             WHERE vec_id % {QUERY_MOD} = 0),
    inter AS (
      SELECT q.doc_id AS qid, c.doc_id AS did,
             CAST(count(*) AS BIGINT) AS inter
      FROM shx q
      JOIN qset ON q.doc_id = qset.qid
      JOIN shx c ON q.s = c.s AND c.doc_id <> q.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT i.qid, i.did,
             CAST(i.inter AS DOUBLE) / (nq.nsh + nc.nsh - i.inter) AS jac
      FROM inter i
      JOIN nsh nq ON nq.doc_id = i.qid
      JOIN nsh nc ON nc.doc_id = i.did),
    lex AS (SELECT qid, did,
                   CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY jac DESC, did) AS BIGINT) AS r
            FROM jac),
    lexk AS (SELECT * FROM lex WHERE r <= {RRF_POOL}),
    fused AS (
      SELECT coalesce(s.qid, l.qid) AS qid,
             coalesce(s.did, l.did) AS did,
             coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.r), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.r), 0.0)
               AS score
      FROM semk s FULL JOIN lexk l ON s.qid = l.qid AND s.did = l.did),
    rk AS (SELECT qid, did, score,
                  CAST(row_number() OVER (PARTITION BY qid
                       ORDER BY score DESC, did) AS BIGINT) AS rrf_rank
           FROM fused)
    SELECT qid, rrf_rank, did, round(score, 6) AS rrf_score
    FROM rk WHERE rrf_rank <= {RRF_TOPK}
    """


def _rrf_sem_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic leg's top-RRF_POOL ranking (qid, did, r):
    retrieval_rrf_fusion consumes it for the fusion and
    retrieval_eval_ndcg's 'semantic' system is its r <= EVAL_K prefix —
    sharing the frame removes a second broadcast-crossJoin + window
    pass over the corpus. |queries| x RRF_POOL rows — bounded at any
    corpus size. Held in the session training memo (the _memo_train
    discipline, r12 verdict wart #5: the old persist() form rode the
    CacheManager, so WHICH query's bench row paid the pool depended on
    intervening clearCache calls — the memo's checkpoint survives
    clearCache, a fresh driver session always rebuilds, and the bench
    prices the build once as its own sem_pool.build row)."""

    def build() -> DataFrame:
        emb = spread(table(spark, sf_dir, "embeddings")).select(
            "vec_id", "embedding"
        )
        queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
        )
        corpus = emb.select(
            F.col("vec_id").alias("did"), F.col("embedding").alias("c_emb")
        )
        sem_scored = (
            F.broadcast(queries)
            .crossJoin(corpus)
            .filter(F.col("qid") != F.col("did"))
            .select(
                "qid",
                "did",
                vectors.cosine(F.col("q_emb"), F.col("c_emb")).alias("cos"),
            )
        )
        return (
            sem_scored.withColumn(
                "r",
                F.row_number()
                .over(
                    Window.partitionBy("qid").orderBy(
                        F.col("cos").desc(), F.col("did")
                    )
                )
                .cast("long"),
            )
            .filter(F.col("r") <= RRF_POOL)
            .select("qid", "did", "r")
        )

    # corpus_scaled: the pool row count grows with the query sample
    # (vec_id % QUERY_MOD), so keep its natural partitioning
    return _memo_train(
        spark, ("rrf_sem_pool", sf_dir), build, corpus_scaled=True
    )



@register(
    "retrieval_rrf_fusion",
    oracle=None,  # assigned below (needs dedup's shingle CTE at import)
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al.): "
        "a semantic leg (cosine ranks over the embedding column) and a "
        "lexical leg (3-gram shingle Jaccard ranks over the text "
        "column) each nominate a top-RRF_POOL candidate pool per "
        "query, and the fused score sums 1/(60+rank) over the legs "
        "that nominated the doc — rank-based, so the two legs' "
        "incomparable score scales never need calibration. Test-scale "
        "legs: the exact cosine ranker (query-bounded broadcast scan, "
        "linear in corpus for a fixed query set) and the shingle "
        "posting join; at 100 TB swap the semantic leg for the "
        "IVF/multiprobe candidates (ann_ivf_kmeans path) — the fusion "
        "is rank-based, so the swap touches only the leg. The fusion "
        "itself joins two (query, doc, rank) tables of |queries|*pool "
        "rows — negligible. Windows are query-keyed; ranks are "
        "integers so the oracle replays the fusion exactly.",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    wq = Window.partitionBy("qid")
    sem = _rrf_sem_pool(spark, sf_dir)

    docs = table(spark, sf_dir, "documents")
    # shingling feeds THREE consumers (the query-side postings, the
    # corpus-side postings, the per-doc sizes) and ReuseExchange does
    # not dedupe the subtrees — uncached, the scan+split+shingle pass
    # runs three times. Lifecycle (the text_tfidf_topk pattern): the
    # cache must outlive this lazy builder, so there is no in-function
    # unpersist; the driver entry AND the bench's min-of-2 rerun clear
    # the session cache per query, and in a pytest session the
    # superseded entries of repeated calls are unpersisted by the
    # ContextCleaner once the old DataFrame is GC'd — accumulation is
    # bounded, not zero
    from pyspark import StorageLevel

    # persist BELOW the non-empty filter — one tokenize pass, not two
    # (the _mrs_frames / exploded_shingles plan note)
    shf = (
        D.shingled(docs, "text", "doc_id", 3)
        .persist(StorageLevel.MEMORY_AND_DISK)
        .filter(F.size("shingles") > 0)
    )
    shx = shf.select("doc_id", F.explode("shingles").alias("s"))
    nsh = shf.select("doc_id", F.size("shingles").cast("long").alias("nsh"))
    qset = queries.select("qid")
    q_sh = shx.join(F.broadcast(qset), shx.doc_id == F.col("qid")).select(
        "qid", "s"
    )
    inter = (
        q_sh.join(shx, "s")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", F.col("doc_id").alias("did"))
        .agg(F.count("*").alias("inter"))
    )
    nq = nsh.select(F.col("doc_id").alias("qid"), F.col("nsh").alias("n_q"))
    nc = nsh.select(F.col("doc_id").alias("did"), F.col("nsh").alias("n_c"))
    jac = (
        inter.join(F.broadcast(nq), "qid")
        .join(nc, "did")
        .select(
            "qid",
            "did",
            (
                F.col("inter").cast("double")
                / (F.col("n_q") + F.col("n_c") - F.col("inter"))
            ).alias("jac"),
        )
    )
    lex = (
        jac.withColumn(
            "r",
            F.row_number()
            .over(wq.orderBy(F.col("jac").desc(), F.col("did")))
            .cast("long"),
        )
        .filter(F.col("r") <= RRF_POOL)
        .select("qid", "did", "r")
    )

    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(RRF_K) + r), F.lit(0.0)
    )
    fused = (
        sem.alias("s")
        .join(lex.alias("l"), ["qid", "did"], "full_outer")
        .select(
            "qid",
            "did",
            (term(F.col("s.r")) + term(F.col("l.r"))).alias("score"),
        )
    )
    return (
        fused.withColumn(
            "rrf_rank",
            F.row_number()
            .over(wq.orderBy(F.col("score").desc(), F.col("did")))
            .cast("long"),
        )
        .filter(F.col("rrf_rank") <= RRF_TOPK)
        .select("qid", "rrf_rank", "did", F.round("score", 6).alias("rrf_score"))
    )


from . import REGISTRY as _REG  # noqa: E402

_REG["retrieval_rrf_fusion"].oracle = _rrf_oracle()


# ------------------------------------------- retrieval evaluation
EVAL_K = 10  # nDCG@K / MRR cutoff == RRF_TOPK


def _eval_oracle() -> str:
    rrf = _rrf_oracle().strip()
    return f"""
    WITH rrf_out AS ({rrf}),
    sem AS (
      SELECT qid, did, rnk FROM (
        SELECT a.vec_id AS qid, b.vec_id AS did,
               CAST(row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY {_COS_SQL} DESC, b.vec_id) AS BIGINT) AS rnk
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id % {QUERY_MOD} = 0)
      WHERE rnk <= {EVAL_K}),
    systems AS (
      SELECT 'semantic' AS system, qid, did, rnk FROM sem
      UNION ALL
      SELECT 'rrf', qid, did, rrf_rank FROM rrf_out),
    rel AS (
      SELECT s.system, s.qid, s.rnk,
             CASE WHEN r.label = q.label THEN 1 ELSE 0 END AS rel
      FROM systems s
      JOIN embeddings q ON q.vec_id = s.qid
      LEFT JOIN embeddings r ON r.vec_id = s.did),
    per_q AS (
      SELECT system, qid,
             sum(CAST(rel / ln(rnk + 1) AS DECIMAL(28,18))) AS dcg_dec,
             min(CASE WHEN rel = 1 THEN rnk END) AS first_rel
      FROM rel GROUP BY 1, 2),
    cls AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label
            FROM embeddings GROUP BY 1),
    ideal AS (
      SELECT q.vec_id AS qid,
             list_aggregate(list_transform(
               range(1, least(c.n_label - 1, {EVAL_K}) + 1),
               i -> CAST(1.0 AS DOUBLE) / ln(CAST(i AS DOUBLE) + 1.0)),
               'sum') AS idcg
      FROM embeddings q JOIN cls c USING (label)
      -- n_label >= 2 mirrors the Spark plan's m >= 1 filter: singleton
      -- label classes have no relevant docs and are excluded from the
      -- macro-average (0/0 NaN vs NULL divergence otherwise)
      WHERE q.vec_id % {QUERY_MOD} = 0 AND c.n_label >= 2),
    scored AS (
      SELECT p.system,
             CAST(p.dcg_dec AS DOUBLE) / i.idcg AS ndcg,
             CASE WHEN p.first_rel IS NOT NULL
                  THEN CAST(1.0 AS DOUBLE) / p.first_rel ELSE 0.0 END AS rr
      FROM per_q p JOIN ideal i USING (qid))
    SELECT system, CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(CAST(ndcg AS DECIMAL(28,18))) AS DOUBLE)
                 / count(*), 6) AS ndcg_at_10,
           round(CAST(sum(CAST(rr AS DECIMAL(28,18))) AS DOUBLE)
                 / count(*), 6) AS mrr
    FROM scored GROUP BY 1
    """


@register(
    "retrieval_eval_ndcg",
    oracle=None,  # assigned below
    doc="Retrieval evaluation harness: nDCG@10 and MRR for the "
        "semantic-only ranking vs the RRF hybrid, using the embedding "
        "table's class label as binary relevance ground truth (a "
        "query's relevant set = other members of its label). Per-query "
        "gains 1/ln(rank+1) are decimal-cast before summing (nDCG is "
        "log-base invariant — the base cancels in DCG/IDCG); the "
        "ideal DCG sums the same series in index order via a "
        "sequence-fold, so both engines produce bit-identical "
        "macro-averages. Shape at 100 TB: rankings are "
        "|queries|*K rows — evaluation is free at any corpus scale; "
        "the label join is a broadcast of the query set and an "
        "equi-join on the result ids.",
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    # the 'semantic' system is the r <= EVAL_K prefix of the shared
    # semantic pool (EVAL_K <= RRF_POOL; same window, same tie order) —
    # no second crossJoin + window pass over the corpus
    sem = (
        _rrf_sem_pool(spark, sf_dir)
        .filter(F.col("r") <= EVAL_K)
        .select(
            F.lit("semantic").alias("system"), "qid", "did",
            F.col("r").alias("rnk"),
        )
    )
    rrf = retrieval_rrf_fusion(spark, sf_dir).select(
        F.lit("rrf").alias("system"),
        "qid",
        "did",
        F.col("rrf_rank").alias("rnk"),
    )
    ranked = sem.unionByName(rrf)
    # binary relevance: result shares the query's label (results from
    # the lexical leg may have no embedding row -> rel 0)
    rel = (
        ranked.join(F.broadcast(queries.select("qid", "q_label")), "qid")
        .join(
            labels.select(F.col("vec_id").alias("did"), F.col("label")),
            "did",
            "left_outer",
        )
        .select(
            "system", "qid", "rnk",
            F.when(F.col("label") == F.col("q_label"), 1).otherwise(0).alias("rel"),
        )
    )
    per_q = rel.groupBy("system", "qid").agg(
        F.sum(
            (F.col("rel") / F.log(F.col("rnk") + 1)).cast("decimal(28,18)")
        ).alias("dcg_dec"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
    )
    # ideal DCG: all relevant docs ranked first; R = |label class| - 1
    cls = labels.groupBy("label").agg(F.count("*").alias("n_label"))
    ideal = (
        queries.select("qid", "q_label")
        .join(F.broadcast(cls), F.col("q_label") == F.col("label"))
        .select(
            "qid",
            F.least(F.col("n_label") - 1, F.lit(EVAL_K)).alias("m"),
        )
        # a singleton label class has NO relevant docs (m=0): Spark's
        # F.aggregate over the empty sequence folds to idcg=0.0 and
        # ndcg=0/0=NaN while DuckDB's list_aggregate yields NULL — the
        # engines diverge and either poisons the macro-average. Such
        # queries are unjudgeable by definition; exclude them from the
        # eval in BOTH engines (oracle mirrors with n_label >= 2).
        .filter(F.col("m") >= 1)
        .select(
            "qid",
            F.aggregate(
                F.sequence(F.lit(1), F.col("m")),
                F.lit(0.0),
                lambda acc, i: acc + F.lit(1.0) / F.log(i.cast("double") + 1.0),
            ).alias("idcg"),
        )
    )
    scored = per_q.join(F.broadcast(ideal), "qid").select(
        "system",
        (F.col("dcg_dec").cast("double") / F.col("idcg")).alias("ndcg"),
        F.when(F.col("first_rel").isNotNull(), F.lit(1.0) / F.col("first_rel"))
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )
    return scored.groupBy("system").agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum(F.col("ndcg").cast("decimal(28,18)")).cast("double")
            / F.count("*"),
            6,
        ).alias("ndcg_at_10"),
        F.round(
            F.sum(F.col("rr").cast("decimal(28,18)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mrr"),
    )


_REG["retrieval_eval_ndcg"].oracle = _eval_oracle()


# --- persisted IVF index: the day-2 ANN artifact ----------------------
EMB_INCR_MIN = 400       # vec_id >= 400 plays the newly-arrived batch
IVF_STATE_NPROBE = 4
IVF_STATE_K = 5


@register(
    "ann_incremental_ivf",
    oracle=f"""
    WITH ivf_base AS (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id < {EMB_INCR_MIN}),
    {_kmeans_ctes("ivf_base", sampled=False)},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          WHERE vec_id % {QUERY_MOD} = 0),
    ps AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM ps) WHERE rn <= {IVF_STATE_NPROBE}),
    cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    sc AS (SELECT cnd.qid, cnd.vec_id, {_COS_SQL} AS cos
           FROM cand cnd
           JOIN embeddings a ON a.vec_id = cnd.qid
           JOIN embeddings b ON b.vec_id = cnd.vec_id),
    r AS (SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM sc)
    SELECT qid, CAST(rn AS INT) AS rnk, vec_id AS neighbor_id,
           round(cos, 4) AS cos_sim
    FROM r WHERE rn <= {IVF_STATE_K}
    """,
    doc="Persisted IVF index end-to-end (operators/ivf_state — the ANN "
        "sibling of the LSH dedup artifact): centroids train once on "
        f"the initial corpus (vec_id < {EMB_INCR_MIN}, the same "
        "DECIMAL-exact distributed Lloyd's as ann_ivf_kmeans), the "
        "cell-assigned vector table persists ON DISK bucketed by cid, "
        f"the day-2 batch (vec_id >= {EMB_INCR_MIN}) ingests against "
        "the FROZEN centroids (anti-join replay idempotence), and "
        f"search probes {IVF_STATE_NPROBE} of the corpus-derived cell count per "
        "query with a cid equi-join the bucket layout serves "
        "exchange-free on the corpus side — exact cosine + top-"
        f"{IVF_STATE_K} on the probed subset only. State rebuilt per "
        "run only for driver hermeticity (same posture as "
        "dedup_incremental_minhash); day-2 ingest/search against "
        "yesterday's state is pinned in tests/test_ivf_state.py. The "
        "oracle replays training, frozen assignment, probe selection "
        "and scoring.",
)
def ann_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..operators import ivf_state

    emb = table(spark, sf_dir, "embeddings")
    name = "ivf_incr_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = emb.filter(F.col("vec_id") < EMB_INCR_MIN).select("vec_id", "embedding")
    cent = _train_lloyd_prefix(spark, sf_dir)
    ivf_state.build(base, cent, name)
    ivf_state.ingest(
        spark,
        name,
        emb.filter(F.col("vec_id") >= EMB_INCR_MIN).select("vec_id", "embedding"),
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    return ivf_state.search(
        spark, name, queries, k=IVF_STATE_K, nprobe=IVF_STATE_NPROBE
    )


# --- contrastive pair mining ------------------------------------------
HN_K = 3  # positives / hard negatives kept per anchor


@register(
    "embedding_hard_negatives",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, label, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CASE WHEN a.label = b.label THEN 'positive'
                  ELSE 'hard_negative' END AS role,
             {_COS_SQL} AS cos
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      WHERE a.vec_id % {QUERY_MOD} = 0)
    SELECT query_id, role, CAST(rn AS INT) AS rnk, neighbor_id,
           round(cos, 4) AS cos_sim
    FROM (SELECT query_id, role, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id, role
                                    ORDER BY cos DESC, neighbor_id) AS rn
          FROM cand)
    WHERE rn <= {HN_K}
    """,
    doc="Contrastive-pair mining for embedding training: per anchor, "
        f"the top-{HN_K} nearest SAME-label candidates (positives) and "
        f"top-{HN_K} nearest DIFFERENT-label candidates (hard "
        "negatives — near in embedding space, wrong by ground truth: "
        "the examples a contrastive loss learns most from). Candidates "
        "come from the hyperplane-LSH bucket join (mining negatives "
        "from an ANN structure is the standard recipe — approximate "
        "candidates are the point, not a compromise), so cost tracks "
        "bucket collisions, never corpus². One window keyed "
        "(anchor, role) ranks both lists in a single pass. At 100 TB "
        "swap the candidate source for the persisted IVF state "
        "(ivf_state.search) unchanged downstream.",
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", "label"
    )
    bucketed = emb.withColumn(
        "bucket",
        vectors.hyperplane_sign_bucket(
            F.col("embedding"), DIM, _derived_planes(spark, sf_dir)
        ),
    )
    a = bucketed.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
        "bucket",
    )
    cand = a.join(bucketed, "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    role = F.when(F.col("q_label") == F.col("label"), "positive").otherwise(
        "hard_negative"
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        role.alias("role"),
        cos.alias("_cos"),
    )
    w = Window.partitionBy("query_id", "role").orderBy(
        F.col("_cos").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HN_K)
        .select(
            "query_id",
            "role",
            F.col("rn").cast("int").alias("rnk"),
            "neighbor_id",
            F.round("_cos", 4).alias("cos_sim"),
        )
    )


# --- PQ asymmetric-distance (ADC) search -------------------------------
ADC_K = 5


@register(
    "ann_pq_adc_search",
    oracle=f"""
    WITH {_pq_ctes()},
    fs AS (
      SELECT v.vec_id, v.sub, c.cid, {_pq_l2_sql('v', 'c')} AS d
      FROM sv v JOIN pc{PQ_ITERS} c ON v.sub = c.sub),
    fa AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d, cid) AS rn
        FROM fs) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, sub, sv FROM sv
          WHERE vec_id % {QUERY_MOD} = 0),
    lut AS (SELECT q.qid, c.sub, c.cid, {_pq_l2_sql('q', 'c')} AS d
            FROM q JOIN pc{PQ_ITERS} c ON q.sub = c.sub),
    adc AS (SELECT l.qid, f.vec_id,
                   sum(CAST(l.d AS DECIMAL(28,12))) AS adc_dec
            FROM fa f JOIN lut l ON f.sub = l.sub AND f.cid = l.cid
            WHERE f.vec_id <> l.qid
            GROUP BY 1, 2),
    adcx AS (SELECT qid, vec_id, CAST(adc_dec AS DOUBLE) AS adc,
                    CAST(round(adc_dec, 6) AS DOUBLE) AS adc_r
             FROM adc),
    r AS (SELECT qid, vec_id, adc_r,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY adc, vec_id) AS rn
          FROM adcx)
    SELECT qid, CAST(rn AS INT) AS rnk, vec_id AS neighbor_id,
           adc_r AS adc_dist
    FROM r WHERE rn <= {ADC_K}
    """,
    doc="PQ serving path — asymmetric distance computation: each query "
        f"precomputes a {PQ_M}x{PQ_K} lookup table of exact subvector-"
        "to-centroid distances, and every corpus vector is scored as "
        "the SUM OF TABLE LOOKUPS over its integer codes — the vector "
        "itself is never touched at query time, which is why PQ "
        "compresses a serving index ~50x. The per-(query, vector) sum "
        "runs over DECIMAL-cast LUT entries so partial-agg order "
        "cannot move a bit, making even the distance VALUES "
        "hash-exact. Scan shape: the code table joins the broadcast "
        "LUT on (sub, cid) — rows carry two ints and a double, never "
        "embeddings. This full-code scan is the declared RECALL "
        "CEILING / oracle baseline; the composed production form — "
        "ADC over nprobe-probed cells of the persisted bucketed "
        "index only — is ann_ivfpq_search, which supersedes this "
        "query in the driver window.",
)
def ann_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    sv = _pq_subvectors(emb)
    cent = _train_pq_raw(spark, sf_dir)
    fa = _pq_assign(sv, cent)
    q = sv.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), "sub", "sv"
    )
    lut = q.join(F.broadcast(cent), "sub").select(
        "qid", "sub", "cid", _pq_d().alias("d")
    )
    # no forced broadcast on lut: its row count is |queries| x PQ_M x
    # PQ_K and the query set scales with the corpus (vec_id % QUERY_MOD)
    # — the same broadcast policy as customer/supplier/part; AQE takes
    # the broadcast at test scale and degrades to shuffle beyond it
    adc = (
        fa.join(lut, ["sub", "cid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        # keep the sum DECIMAL through the round (the half-point
        # double-round trap), order by the exact double form
        .agg(F.sum(F.col("d").cast("decimal(28,12)")).alias("adc_dec"))
        .select(
            "qid",
            "vec_id",
            F.col("adc_dec").cast("double").alias("adc"),
            F.round("adc_dec", 6).cast("double").alias("adc_r"),
        )
    )
    w = Window.partitionBy("qid").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ADC_K)
        .select(
            "qid",
            F.col("rn").cast("int").alias("rnk"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("adc_r").alias("adc_dist"),
        )
    )


# --- IVF recall contract: the nprobe knob chart -------------------------
IVF_RECALL_K = 5
IVF_NPROBES = (1, 2, 4)
# calibration QUERY SAMPLE: a deterministic md5-selected fixed-size set,
# so the brute-force truth leg costs IVF_CAL_Q linear corpus scans at
# ANY corpus size — the sample bound lives in code, not prose (the
# dedup_threshold_sweep "sweep on a sample, pick the knob" contract)
IVF_CAL_Q = 8


def _calibration_queries(emb: DataFrame) -> DataFrame:
    """(qid, q_emb): the fixed-size md5-ranked calibration sample every
    recall chart shares — ONE definition so the three charts and their
    oracles' shared `q` CTE can never desynchronize. Plans as
    TakeOrderedAndProject (pinned), so the sample costs a per-partition
    heap at any corpus size."""
    return (
        emb.select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("q_emb"),
            F.md5(
                F.concat(F.lit("ivfcal:"), F.col("vec_id").cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "qid")
        .limit(IVF_CAL_Q)
        .drop("_h")
    )


@register(
    "ann_ivf_recall",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          ORDER BY md5('ivfcal:' || CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {IVF_CAL_Q}),
    pc AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    pr AS (SELECT qid, cid,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY cos DESC, cid) AS cell_rn
           FROM pc),
    np AS (SELECT unnest([{", ".join(str(n) for n in IVF_NPROBES)}]) AS nprobe),
    probes AS (SELECT p.qid, n.nprobe, p.cid
               FROM pr p JOIN np n ON p.cell_rn <= n.nprobe),
    cand AS (SELECT p.qid, p.nprobe, a.vec_id
             FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    csc AS (SELECT c.qid, c.nprobe, c.vec_id, {_COS_SQL} AS cos
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.qid
            JOIN embeddings b ON b.vec_id = c.vec_id),
    ivf_topk AS (SELECT qid, nprobe, vec_id FROM (
                   SELECT qid, nprobe, vec_id,
                          row_number() OVER (PARTITION BY qid, nprobe
                                             ORDER BY cos DESC, vec_id) AS rn
                   FROM csc) WHERE rn <= {IVF_RECALL_K}),
    brute AS (SELECT qid, vec_id FROM (
                SELECT a.qid, b.vec_id AS vec_id,
                       row_number() OVER (PARTITION BY a.qid
                                ORDER BY {_COS_SQL} DESC, b.vec_id) AS rn
                FROM q a JOIN embeddings b ON a.qid <> b.vec_id)
              WHERE rn <= {IVF_RECALL_K}),
    hits AS (SELECT i.qid, i.nprobe,
                    CAST(count(b.vec_id) AS BIGINT) AS n_hit
             FROM ivf_topk i LEFT JOIN brute b
               ON b.qid = i.qid AND b.vec_id = i.vec_id
             GROUP BY 1, 2),
    nc AS (SELECT qid, nprobe, CAST(count(*) AS BIGINT) AS n_cand
           FROM cand GROUP BY 1, 2),
    per_q AS (SELECT h.qid, h.nprobe, h.n_hit, c.n_cand
              FROM hits h JOIN nc c USING (qid, nprobe))
    SELECT nprobe, CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(CAST(n_hit AS DECIMAL(18,6))) AS DOUBLE)
                 / (count(*) * {IVF_RECALL_K}), 6) AS recall_at_k,
           round(CAST(sum(CAST(n_cand AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 2) AS avg_candidates
    FROM per_q GROUP BY nprobe
    """,
    doc=f"The IVF recall/nprobe contract, hash-checked (the IVF "
        "sibling of ann_recall_report and the ANN analogue of the "
        f"MinHash threshold sweep): for nprobe in {IVF_NPROBES}, "
        f"recall@{IVF_RECALL_K} of frozen-centroid probe search "
        "against the exact brute-force truth, plus the average "
        "candidate volume — the two sides of the knob a 100 TB "
        "deployment turns. One cell-ranking pass per query fans out "
        "to all nprobe settings via a 3-row broadcast (the threshold-"
        "sweep pattern: sweep on a sample, pick nprobe, serve with "
        f"ivf_state). The query set is a FIXED-SIZE ({IVF_CAL_Q}) "
        "deterministic md5-selected sample — TakeOrderedAndProject, "
        "never a global sort — so the brute-force truth leg is "
        f"{IVF_CAL_Q} linear corpus scans at any SF: the calibration "
        "cost bound lives in code, not prose. Recall/candidate "
        "averages are integer ratios DECIMAL-summed, so the chart is "
        "bit-exact.",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    cent = _train_lloyd_full(spark, sf_dir)
    asg = _assign_cells(emb, cent)
    # fixed-size calibration sample: md5-ranked top-N (a per-partition
    # heap via TakeOrderedAndProject); q is bounded by a CONSTANT, so
    # the forced broadcasts below are policy-compliant
    q = _calibration_queries(emb)
    pr = _ranked_cells(q, cent, max(IVF_NPROBES))
    np_df = spark.createDataFrame([(n,) for n in IVF_NPROBES], "nprobe int")
    probes = pr.join(
        F.broadcast(np_df), F.col("cell_rn") <= F.col("nprobe")
    ).select("qid", "nprobe", "cid")
    cand = probes.join(asg, "cid").filter(F.col("vec_id") != F.col("qid")).select(
        "qid", "nprobe", "vec_id"
    )
    pair_cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    w_ivf = Window.partitionBy("qid", "nprobe").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    ivf_topk = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q), "qid")
        .select("qid", "nprobe", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_ivf))
        .filter(F.col("rn") <= IVF_RECALL_K)
        .select("qid", "nprobe", "vec_id")
    )
    w_b = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    brute = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= IVF_RECALL_K)
        .select("qid", F.col("vec_id").alias("b_vec"))
    )
    hits = (
        ivf_topk.join(
            brute,
            (ivf_topk.qid == brute.qid) & (ivf_topk.vec_id == brute.b_vec),
            "left",
        )
        .select(ivf_topk.qid.alias("qid"), "nprobe", "b_vec")
        .groupBy("qid", "nprobe")
        .agg(F.count("b_vec").alias("n_hit"))
    )
    nc = cand.groupBy("qid", "nprobe").agg(F.count("*").alias("n_cand"))
    per_q = hits.join(nc, ["qid", "nprobe"])
    return per_q.groupBy("nprobe").agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum(F.col("n_hit").cast("decimal(18,6)")).cast("double")
            / (F.count("*") * IVF_RECALL_K),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.sum(F.col("n_cand").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            2,
        ).alias("avg_candidates"),
    )


# --- the composed IVFPQ serving path ------------------------------------
IVFPQ_NPROBE = 4
# the serving index uses a FINER codebook than the compression demo
# (embedding_pq_codes: M=4, K=8 = 12 bits/vector): 8 subspaces x 16
# codes = 32 bits/vector. Measured on this corpus by ann_ivfpq_recall,
# the 12-bit form quantizes recall@5 to 0.05 (vs the 0.475 pruning
# ceiling) while the 32-bit form holds ~0.23 — the knob the chart is
# for. Same ~64x compression vs float32.
IVFPQ_M = 8
IVFPQ_K = 16
IVFPQ_SUBDIM = DIM // IVFPQ_M


# Session-scoped memo for the PERSISTED IVFPQ state (the training-memo
# discipline applied to the built index): the build is deterministic
# (memoized trainers + deterministic encode), its consumers are
# read-only (ann_ivfpq_search serves it; streaming_ann_serve streams
# against it), and production publishes ONE index to every serving
# surface — rebuilding the same state name per consumer re-paid the
# O(n·√n) assignment pass per query (~40 s each at the sf1 replica).
# App-id-scoped with stale eviction like _TRAIN_MEMO; a fresh session
# (the driver's one-query-per-session gate) always rebuilds, so a memo
# hit changes nothing observable. The day-2 mutating state
# (ann_ivfpq_incremental) keeps its own name and hermetic rebuild.
_IVFPQ_BUILT: dict[tuple, str] = {}


def _ivfpq_build(spark: SparkSession, sf_dir: str) -> str:
    """Train coarse centroids + PQ codebooks and persist the IVFPQ
    state (code-only bucketed cell table + codebook aux). Returns the
    state name. This is the ONE-TIME index cost a production
    deployment amortizes across days; the bench reports it separately
    from the recurring serve cost (ivfpq.build vs ivfpq.serve, the
    lsh_state.build/.ingest convention), and within one session every
    read-only consumer serves the SAME persisted state (memo above)."""
    import hashlib

    from ..operators import ivf_state

    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    hit = _IVFPQ_BUILT.get(key)
    if (
        hit is not None
        and spark.catalog.tableExists(f"{hit}_cells")
        # the serve path reads the codebook aux too: a partially
        # torn-down state must rebuild, not serve (review finding)
        and spark.catalog.tableExists(f"{hit}_pq")
    ):
        return hit
    for stale in [k for k in _IVFPQ_BUILT if k[0] != app]:
        del _IVFPQ_BUILT[stale]
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    name = "ivfpq_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    coarse = _train_lloyd_full(spark, sf_dir)
    # PQ encodes L2-NORMALIZED vectors: on the unit sphere ADC-L2
    # ranking IS the cosine ranking (see _pq_ctes docstring); the
    # coarse quantizer is cosine and therefore norm-invariant already
    pq = _train_pq_norm(spark, sf_dir)
    ivf_state.build(
        _ivfpq_coded(emb, pq),
        coarse,
        name,
        store_vec=False,
        aux_tables={"pq": pq},
    )
    _IVFPQ_BUILT[key] = name
    return name


def _ivfpq_serve_state(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    *,
    k: int,
    nprobe: int = IVFPQ_NPROBE,
) -> DataFrame:
    """Serve ADC top-k from the persisted IVFPQ state for an arbitrary
    (qid, q_emb) query frame: probe nprobe cells, ADC-score the probed
    codes against the per-query LUT. Touches only the state tables +
    the query vectors (the day-2 serve path — see
    tests/test_ivf_state.py::test_ivfpq_day2_ingest...)."""
    from ..operators import ivf_state

    probes = ivf_state.probe(spark, name, queries, nprobe=nprobe, keep=())
    cand = (
        probes.join(spark.table(f"{name}_cells"), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.posexplode("codes").alias("sub", "code"))
    )
    qsv = _pq_subvectors(
        _l2_normalized(
            queries.select(
                F.col("qid").alias("vec_id"), F.col("q_emb").alias("embedding")
            )
        ),
        m=IVFPQ_M,
    ).select(F.col("vec_id").alias("qid"), "sub", "sv")
    # the codebook aux table is IVFPQ_M x IVFPQ_K rows — bounded by
    # constants at ANY corpus size, so the forced broadcast is
    # policy-compliant
    lut = qsv.join(F.broadcast(spark.table(f"{name}_pq")), "sub").select(
        "qid", "sub", F.col("cid").alias("code"), _pq_d().alias("d")
    )
    adc = (
        cand.join(lut, ["qid", "sub", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("d").cast("decimal(28,12)")).alias("adc_dec"))
        .select(
            "qid",
            "vec_id",
            F.col("adc_dec").cast("double").alias("adc"),
            F.round("adc_dec", 6).cast("double").alias("adc_r"),
        )
    )
    w = Window.partitionBy("qid").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            F.col("rn").cast("int").alias("rnk"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("adc_r").alias("adc_dist"),
        )
    )


def _ivfpq_serve(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The registered query's serve leg: the standard query sample
    against the state ``_ivfpq_build`` wrote."""
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    return _ivfpq_serve_state(spark, name, q, k=ADC_K)


@register(
    "ann_ivfpq_search",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    {_pq_ctes(normalized=True, m=IVFPQ_M, k=IVFPQ_K)},
    fs AS (SELECT v.vec_id, v.sub, c.cid AS code, {_pq_l2_sql('v', 'c', IVFPQ_SUBDIM)} AS d
           FROM sv v JOIN pc{PQ_ITERS} c ON v.sub = c.sub),
    fa AS (SELECT vec_id, sub, code FROM (
             SELECT vec_id, sub, code,
                    row_number() OVER (PARTITION BY vec_id, sub
                                       ORDER BY d, code) AS rn
             FROM fs) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          WHERE vec_id % {QUERY_MOD} = 0),
    ps AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM ps) WHERE rn <= {IVFPQ_NPROBE}),
    cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    qsv AS (SELECT vec_id AS qid, sub, sv FROM sv
            WHERE vec_id % {QUERY_MOD} = 0),
    lut AS (SELECT s.qid, c.sub, c.cid AS code, {_pq_l2_sql('s', 'c', IVFPQ_SUBDIM)} AS d
            FROM qsv s JOIN pc{PQ_ITERS} c ON s.sub = c.sub),
    adc AS (SELECT cnd.qid, cnd.vec_id,
                   sum(CAST(l.d AS DECIMAL(28,12))) AS adc_dec
            FROM cand cnd
            JOIN fa f ON f.vec_id = cnd.vec_id
            JOIN lut l ON l.qid = cnd.qid AND l.sub = f.sub
                      AND l.code = f.code
            GROUP BY 1, 2),
    adcx AS (SELECT qid, vec_id, CAST(adc_dec AS DOUBLE) AS adc,
                    CAST(round(adc_dec, 6) AS DOUBLE) AS adc_r
             FROM adc),
    r AS (SELECT qid, vec_id, adc_r,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY adc, vec_id) AS rn
          FROM adcx)
    SELECT qid, CAST(rn AS INT) AS rnk, vec_id AS neighbor_id,
           adc_r AS adc_dist
    FROM r WHERE rn <= {ADC_K}
    """,
    doc="The composed FAISS-IVFPQ serving layout, end-to-end: coarse "
        "centroids train once (ann_ivf_kmeans' Lloyd's), per-subspace "
        f"PQ codebooks train once (embedding_pq_codes' fixed-"
        f"{PQ_ITERS}-round Lloyd's over L2-NORMALIZED vectors — unit "
        "sphere makes ADC-L2 rank like cosine; see _pq_ctes), and the "
        "PERSISTED cell table (operators/ivf_state, bucketed by cid) "
        f"stores ONLY the {IVFPQ_M} integer codes per vector — "
        "store_vec=False, the ~64x "
        "compression that fits a 100 TB corpus on disk; the codebooks "
        "persist beside it as the aux artifact. Serving: each query "
        f"probes its {IVFPQ_NPROBE} of the corpus-derived cell count nearest cells "
        "(ivf_state.probe), the bucket layout serves the cid join "
        "exchange-free on the corpus side (pinned, tests/test_plans), "
        f"and ADC scores ONLY the probed codes — a "
        f"{IVFPQ_M}x{IVFPQ_K} LUT "
        "of exact subvector distances per query, summed in DECIMAL so "
        "the distances hash exactly. No full-code scan, no raw vector "
        "touched at query time: this supersedes ann_pq_adc_search's "
        "declared linear scan (rotated out of the driver window to "
        "this strict superset). The oracle replays coarse training, "
        "PQ training, assignment, probe selection and the ADC sums.",
)
def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivfpq_serve(spark, sf_dir, _ivfpq_build(spark, sf_dir))


def _ivfpq_coded(vecs: DataFrame, pq: DataFrame) -> DataFrame:
    """(vec_id, embedding, codes): the raw vectors with their FROZEN-
    codebook PQ codes attached, computed PER ROW — the build-time and
    day-2 encode step share this (the batch never retrains anything).

    Per-row HOF form (guide §2.4): the per-sub codebooks ride as ONE
    broadcast row (an array indexed by sub) and each vector derives its
    M argmin codes in a single projection — no M-way subvector explode,
    no groupBy Exchange, and no corpus self-join to re-attach the codes
    to the vectors (the previous shape paid all three). Arithmetic is
    identical to the exploded _pq_assign path: same component
    cast-to-double / L2-norm divide, same slice boundaries, same
    index-ordered squared-distance fold and (d, cid) tie order inside
    argmin_l2_cid — codes byte-compared identical at sf0.01 and sf0.1.
    Zero-norm vectors drop with the normalization filter
    (cosine-undefined, unsearchable — same both engines)."""
    subdim = DIM // IVFPQ_M
    bysub = (
        pq.groupBy("sub")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cid"), F.col("c")))
            ).alias("_codes")
        )
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("sub"), F.col("_codes")))
            ).alias("_s")
        )
        .select(F.col("_s._codes").alias("_bysub"))
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda a, t: a + t,
        )
    )
    return (
        vecs.withColumn("_n", nrm)
        .filter(F.col("_n") > 0)
        .crossJoin(F.broadcast(bysub))
        .select(
            "vec_id",
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(IVFPQ_M - 1)),
                lambda sub: vectors.argmin_l2_cid(
                    F.transform(
                        F.slice(F.col("embedding"), sub * subdim + 1, subdim),
                        lambda x: x.cast("double") / F.col("_n"),
                    ),
                    F.col("_bysub")[sub],
                ),
            ).cast("array<int>").alias("codes"),
        )
    )


def _ivfpq_codes(vecs: DataFrame, pq: DataFrame) -> DataFrame:
    """(vec_id, codes): each vector encoded against FROZEN codebooks —
    see _ivfpq_coded (this is its id+codes projection)."""
    return _ivfpq_coded(vecs, pq).select("vec_id", "codes")


@register(
    "ann_ivfpq_incremental",
    oracle=f"""
    WITH ivfpq_base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < {EMB_INCR_MIN}),
    {_kmeans_ctes("ivfpq_base", sampled=False)},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    {_pq_ctes(normalized=True, m=IVFPQ_M, k=IVFPQ_K,
              train_filter=f"vec_id < {EMB_INCR_MIN}", sampled=False)},
    fs AS (SELECT v.vec_id, v.sub, c.cid AS code, {_pq_l2_sql('v', 'c', IVFPQ_SUBDIM)} AS d
           FROM sv v JOIN pc{PQ_ITERS} c ON v.sub = c.sub),
    fa AS (SELECT vec_id, sub, code FROM (
             SELECT vec_id, sub, code,
                    row_number() OVER (PARTITION BY vec_id, sub
                                       ORDER BY d, code) AS rn
             FROM fs) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          WHERE vec_id % {QUERY_MOD} = 0),
    ps AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM ps) WHERE rn <= {IVFPQ_NPROBE}),
    cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    qsv AS (SELECT vec_id AS qid, sub, sv FROM sv
            WHERE vec_id % {QUERY_MOD} = 0),
    lut AS (SELECT s.qid, c.sub, c.cid AS code, {_pq_l2_sql('s', 'c', IVFPQ_SUBDIM)} AS d
            FROM qsv s JOIN pc{PQ_ITERS} c ON s.sub = c.sub),
    adc AS (SELECT cnd.qid, cnd.vec_id,
                   sum(CAST(l.d AS DECIMAL(28,12))) AS adc_dec
            FROM cand cnd
            JOIN fa f ON f.vec_id = cnd.vec_id
            JOIN lut l ON l.qid = cnd.qid AND l.sub = f.sub
                      AND l.code = f.code
            GROUP BY 1, 2),
    adcx AS (SELECT qid, vec_id, CAST(adc_dec AS DOUBLE) AS adc,
                    CAST(round(adc_dec, 6) AS DOUBLE) AS adc_r
             FROM adc),
    r AS (SELECT qid, vec_id, adc_r,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY adc, vec_id) AS rn
          FROM adcx)
    SELECT qid, CAST(rn AS INT) AS rnk, vec_id AS neighbor_id,
           adc_r AS adc_dist
    FROM r WHERE rn <= {ADC_K}
    """,
    doc="The IVFPQ index on day 2 — the lifecycle ann_ivfpq_search "
        "builds once and production then LIVES in: coarse centroids "
        f"AND PQ codebooks train only on the initial corpus (vec_id < "
        f"{EMB_INCR_MIN}), the code-only bucketed cell table persists, "
        f"and the day-2 batch (vec_id >= {EMB_INCR_MIN}) is ENCODED "
        "with the frozen codebooks and absorbed by ivf_state.ingest "
        "(anti-join replay idempotence) — nothing retrains, the "
        "standard FAISS add-after-train posture. Between ingest and "
        "serve the cell table is COMPACTED (ivf_state.compact: the "
        "ingest appended per-bucket small files; the crash-safe "
        "two-rename rewrite leaves one file per bucket, same bucket "
        "spec) so the serve probes the post-compaction layout "
        "exchange-free — compaction's first driver-level evidence. "
        "Serving is byte-identical to ann_ivfpq_search's path: probe "
        f"{IVFPQ_NPROBE} cells, ADC over probed codes only against "
        "the per-query LUT, DECIMAL-exact sums. The oracle replays "
        "prefix-training, frozen assignment + encoding of BOTH "
        "phases, probe selection and the ADC sums — ingest-then-serve "
        "and build-on-everything converge to the same state, which is "
        "exactly the idempotence the day-2 contract promises.",
)
def ann_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..operators import ivf_state

    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    name = "ivfpqi_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = emb.filter(F.col("vec_id") < EMB_INCR_MIN)
    batch = emb.filter(F.col("vec_id") >= EMB_INCR_MIN)
    coarse = _train_lloyd_prefix(spark, sf_dir)
    pq = _train_pq_norm_prefix(spark, sf_dir)
    ivf_state.build(
        _ivfpq_coded(base, pq),
        coarse,
        name,
        store_vec=False,
        aux_tables={"pq": pq},
    )
    ivf_state.ingest(spark, name, _ivfpq_coded(batch, pq))
    ivf_state.compact(spark, name)
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    return _ivfpq_serve_state(spark, name, q, k=ADC_K)


@register(
    "streaming_ann_serve",
    oracle=None,  # patched below: shares ann_ivfpq_search's oracle
    doc="Structured Streaming twin of ann_ivfpq_search's serve leg — "
        "the retrieval sibling of streaming_drift_psi "
        "(streaming/ann_serve.py): the IVFPQ state builds once, then "
        "QUERIES arrive as a stream and every micro-batch is answered "
        "from the persisted state via foreachBatch (probe nprobe "
        "cells, exchange-free cid join onto the code-only bucketed "
        "cell table, ADC against the per-query LUT), each top-k "
        "report landing batch-id-keyed with the overwrite-per-batch "
        "replay-idempotence contract — serving is read-only against "
        "the state, so a crash-replayed batch rewrites the identical "
        "report. Driven availableNow over the staged query sample, "
        "the whole sample is ONE micro-batch, so the report set "
        "equals the batch serve exactly — same oracle (per-query "
        "top-k is independent of batch membership, so this holds at "
        "ANY batch partitioning — pinned along with checkpoint replay "
        "in tests/test_streaming_ann.py). Per batch, only |batch| x "
        "nprobe probe rows and the probed codes move; the corpus-"
        "sized cell table never does.",
)
def streaming_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import ann_serve

    name = _ivfpq_build(spark, sf_dir)
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    root = "{}/dfs_annserve/{}/{}".format(
        tempfile.gettempdir(),
        spark.sparkContext.applicationId,
        uuid.uuid4().hex[:10],
    )
    q.write.mode("overwrite").parquet(f"{root}/queries")
    stream = spark.readStream.schema(q.schema).parquet(f"{root}/queries")
    try:
        sq = ann_serve.foreach_batch_ann_serve(
            stream, name, f"{root}/reports", f"{root}/ckpt", k=ADC_K
        )
        if not sq.awaitTermination(300):
            sq.stop()
            raise TimeoutError("streaming_ann_serve: stream did not drain")
        return (
            spark.read.parquet(f"{root}/reports")
            .select("qid", "rnk", "neighbor_id", "adc_dist")
            # sever lineage so the scratch dir can be removed before
            # the caller collects
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_REG["streaming_ann_serve"].oracle = _REG["ann_ivfpq_search"].oracle


# --- filtered ANN: metadata predicate inside the probed-cell scan -------
IVF_FILT_NPROBE = 8   # 2x the unfiltered nprobe: a ~10%-selective
                      # filter starves cells, so the probe set widens
IVF_FILT_K = 3
IVF_FILT_LABEL = 3


@register(
    "ann_ivf_filtered",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT s.vec_id, s.cid, e.label FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) s JOIN embeddings e USING (vec_id)
            WHERE s.rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          WHERE vec_id % {QUERY_MOD} = 0),
    ps AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM ps) WHERE rn <= {IVF_FILT_NPROBE}),
    cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a USING (cid)
             WHERE a.label = {IVF_FILT_LABEL} AND a.vec_id <> p.qid),
    sc AS (SELECT cnd.qid, cnd.vec_id, {_COS_SQL} AS cos
           FROM cand cnd
           JOIN embeddings a ON a.vec_id = cnd.qid
           JOIN embeddings b ON b.vec_id = cnd.vec_id),
    r AS (SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM sc)
    SELECT qid, CAST(rn AS INT) AS rnk, vec_id AS neighbor_id,
           round(cos, 4) AS cos_sim
    FROM r WHERE rn <= {IVF_FILT_K}
    """,
    doc="Filtered ANN from the persisted IVF state — the production "
        "need neither plain IVF nor ADC covers: top-k restricted by a "
        f"metadata predicate (label = {IVF_FILT_LABEL}, ~10% "
        "selective). The label rides into the bucketed cell table as "
        "payload at build time, so at serve time the predicate is a "
        "plain parquet pushdown INSIDE the probed-cell scan (pinned: "
        "PushedFilters shows the EqualTo on the cells FileScan, and "
        "the cid probe join stays exchange-free on the corpus side) — "
        "candidates are pruned by the storage layer before a single "
        "cosine is computed, never post-filtered after top-k (the "
        "classic filtered-ANN recall bug). The probe set widens to "
        f"nprobe={IVF_FILT_NPROBE} (2x the unfiltered "
        f"{IVF_STATE_NPROBE}) because a selective filter starves "
        "cells — the standard filtered-search compensation. The "
        "oracle replays training, labeled assignment, probe selection "
        "and the filtered exact re-rank.",
)
def ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..operators import ivf_state

    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", "label"
    )
    name = "ivff_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    cent = _train_lloyd_full(spark, sf_dir)
    ivf_state.build(emb, cent, name)
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    probes = ivf_state.probe(spark, name, q, nprobe=IVF_FILT_NPROBE)
    cells = spark.table(f"{name}_cells").filter(
        F.col("label") == IVF_FILT_LABEL
    )
    cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    return (
        probes.join(cells, "cid")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_FILT_K)
        .select(
            "qid",
            F.col("rn").cast("int").alias("rnk"),
            F.col("vec_id").alias("neighbor_id"),
            F.round("_cos", 4).alias("cos_sim"),
        )
    )


# --- filtered-ANN recall vs filter selectivity: the knob chart ----------
# label ranges of increasing selectivity: ~10% (one label), ~50%
# (labels 0-4), 100% (no effective filter) — the axis a deployment
# tunes nprobe against, because a selective filter starves probed cells
FILT_RANGES = ((3, 3), (0, 4), (0, 9))
FILT_RECALL_K = 5


@register(
    "ann_filtered_recall",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT s.vec_id, s.cid, e.label FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) s JOIN embeddings e USING (vec_id)
            WHERE s.rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          ORDER BY md5('ivfcal:' || CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {IVF_CAL_Q}),
    pc AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM pc) WHERE rn <= {IVF_FILT_NPROBE}),
    fr AS (SELECT * FROM (VALUES
             {", ".join(f"({lo}, {hi})" for lo, hi in FILT_RANGES)})
           AS t(lo, hi)),
    cand AS (SELECT p.qid, f.lo, f.hi, a.vec_id
             FROM probes p
             JOIN asg a USING (cid)
             JOIN fr f ON a.label BETWEEN f.lo AND f.hi
             WHERE a.vec_id <> p.qid),
    csc AS (SELECT c.qid, c.lo, c.hi, c.vec_id, {_COS_SQL} AS cos
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.qid
            JOIN embeddings b ON b.vec_id = c.vec_id),
    ivf_topk AS (SELECT qid, lo, hi, vec_id FROM (
                   SELECT qid, lo, hi, vec_id,
                          row_number() OVER (PARTITION BY qid, lo, hi
                                             ORDER BY cos DESC, vec_id) AS rn
                   FROM csc) WHERE rn <= {FILT_RECALL_K}),
    brute AS (SELECT qid, lo, hi, vec_id FROM (
                SELECT a.qid, f.lo, f.hi, b.vec_id AS vec_id,
                       row_number() OVER (PARTITION BY a.qid, f.lo, f.hi
                                ORDER BY {_COS_SQL} DESC, b.vec_id) AS rn
                FROM q a
                JOIN embeddings b ON a.qid <> b.vec_id
                JOIN fr f ON b.label BETWEEN f.lo AND f.hi)
              WHERE rn <= {FILT_RECALL_K}),
    hits AS (SELECT i.qid, i.lo, i.hi,
                    CAST(count(b.vec_id) AS BIGINT) AS n_hit
             FROM ivf_topk i LEFT JOIN brute b
               ON b.qid = i.qid AND b.lo = i.lo AND b.hi = i.hi
              AND b.vec_id = i.vec_id
             GROUP BY 1, 2, 3),
    nc AS (SELECT qid, lo, hi, CAST(count(*) AS BIGINT) AS n_cand
           FROM cand GROUP BY 1, 2, 3),
    per_q AS (SELECT h.qid, h.lo, h.hi, h.n_hit, c.n_cand
              FROM hits h JOIN nc c USING (qid, lo, hi))
    SELECT CAST(lo AS INT) AS label_lo, CAST(hi AS INT) AS label_hi,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(CAST(n_hit AS DECIMAL(18,6))) AS DOUBLE)
                 / (count(*) * {FILT_RECALL_K}), 6) AS recall_at_k,
           round(CAST(sum(CAST(n_cand AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 2) AS avg_candidates
    FROM per_q GROUP BY 1, 2
    """,
    doc="The filtered-ANN knob chart (completes ann_ivf_filtered the "
        "way ann_ivf_recall completes ann_incremental_ivf): recall@"
        f"{FILT_RECALL_K} of label-filtered probe search at fixed "
        f"nprobe={IVF_FILT_NPROBE} against the FILTERED brute-force "
        "truth, for three predicate selectivities (~10%/~50%/100%) "
        "fanned out from ONE cell-ranking pass via a 3-row broadcast "
        "— the chart that tells a deployment how much wider nprobe "
        "must get as filters sharpen (a selective filter starves "
        "probed cells, so recall decays with selectivity at fixed "
        "nprobe). Query set is the same fixed-size md5 calibration "
        "sample as ann_ivf_recall, so the truth leg stays "
        f"{IVF_CAL_Q} linear scans at any SF. Averages are integer "
        "ratios DECIMAL-summed; the chart is bit-exact.",
)
def ann_filtered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", "label"
    )
    vecs = emb.select("vec_id", "embedding")
    cent = _train_lloyd_full(spark, sf_dir)
    # per-row HOF argmax with the label riding along — the old window
    # form also re-joined the label back by vec_id afterwards; the
    # per-row form keeps it in place (zero Exchange, guide §2.4)
    asg = emb.crossJoin(
        F.broadcast(vectors.centroid_struct_array(cent))
    ).select(
        "vec_id",
        vectors.argmax_cos_cid(F.col("embedding"), F.col("_cents")).alias(
            "cid"
        ),
        "label",
    )
    q = _calibration_queries(emb)
    probes = _ranked_cells(q, cent, IVF_FILT_NPROBE).select("qid", "cid")
    fr = spark.createDataFrame(list(FILT_RANGES), "lo int, hi int")
    cand = (
        probes.join(asg, "cid")
        .join(
            F.broadcast(fr),
            (F.col("label") >= F.col("lo")) & (F.col("label") <= F.col("hi")),
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "lo", "hi", "vec_id")
    )
    pair_cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    w_ivf = Window.partitionBy("qid", "lo", "hi").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    ivf_topk = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(q), "qid")
        .select("qid", "lo", "hi", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_ivf))
        .filter(F.col("rn") <= FILT_RECALL_K)
        .select("qid", "lo", "hi", "vec_id")
    )
    w_b = Window.partitionBy("qid", "lo", "hi").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    brute = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("qid") != F.col("vec_id"))
        .join(
            F.broadcast(fr),
            (F.col("label") >= F.col("lo")) & (F.col("label") <= F.col("hi")),
        )
        .select("qid", "lo", "hi", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= FILT_RECALL_K)
        .select("qid", "lo", "hi", F.col("vec_id").alias("b_vec"))
    )
    hits = (
        ivf_topk.join(
            brute,
            (ivf_topk.qid == brute.qid)
            & (ivf_topk.lo == brute.lo)
            & (ivf_topk.hi == brute.hi)
            & (ivf_topk.vec_id == brute.b_vec),
            "left",
        )
        .select(ivf_topk.qid.alias("qid"), ivf_topk.lo.alias("lo"),
                ivf_topk.hi.alias("hi"), "b_vec")
        .groupBy("qid", "lo", "hi")
        .agg(F.count("b_vec").alias("n_hit"))
    )
    nc = cand.groupBy("qid", "lo", "hi").agg(F.count("*").alias("n_cand"))
    per_q = hits.join(nc, ["qid", "lo", "hi"])
    return per_q.groupBy("lo", "hi").agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum(F.col("n_hit").cast("decimal(18,6)")).cast("double")
            / (F.count("*") * FILT_RECALL_K),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.sum(F.col("n_cand").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            2,
        ).alias("avg_candidates"),
    ).select(
        F.col("lo").cast("int").alias("label_lo"),
        F.col("hi").cast("int").alias("label_hi"),
        "n_queries",
        "recall_at_k",
        "avg_candidates",
    )


# --- IVFPQ recall attribution: pruning loss vs quantization loss --------
PQR_K = 5


@register(
    "ann_ivfpq_recall",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    {_pq_ctes(normalized=True, m=IVFPQ_M, k=IVFPQ_K)},
    fs AS (SELECT v.vec_id, v.sub, c.cid AS code, {_pq_l2_sql('v', 'c', IVFPQ_SUBDIM)} AS d
           FROM sv v JOIN pc{PQ_ITERS} c ON v.sub = c.sub),
    fa AS (SELECT vec_id, sub, code FROM (
             SELECT vec_id, sub, code,
                    row_number() OVER (PARTITION BY vec_id, sub
                                       ORDER BY d, code) AS rn
             FROM fs) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          ORDER BY md5('ivfcal:' || CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {IVF_CAL_Q}),
    ps AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM ps) WHERE rn <= {IVFPQ_NPROBE}),
    cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    exact_topk AS (SELECT qid, vec_id FROM (
                     SELECT c.qid, c.vec_id,
                            row_number() OVER (PARTITION BY c.qid
                                     ORDER BY {_COS_SQL} DESC, c.vec_id) AS rn
                     FROM cand c
                     JOIN embeddings a ON a.vec_id = c.qid
                     JOIN embeddings b ON b.vec_id = c.vec_id)
                   WHERE rn <= {PQR_K}),
    qsv AS (SELECT s.vec_id AS qid, s.sub, s.sv
            FROM sv s JOIN q ON s.vec_id = q.qid),
    lut AS (SELECT s.qid, c.sub, c.cid AS code, {_pq_l2_sql('s', 'c', IVFPQ_SUBDIM)} AS d
            FROM qsv s JOIN pc{PQ_ITERS} c ON s.sub = c.sub),
    adc AS (SELECT cnd.qid, cnd.vec_id,
                   sum(CAST(l.d AS DECIMAL(28,12))) AS adc_dec
            FROM cand cnd
            JOIN fa f ON f.vec_id = cnd.vec_id
            JOIN lut l ON l.qid = cnd.qid AND l.sub = f.sub
                      AND l.code = f.code
            GROUP BY 1, 2),
    adc_topk AS (SELECT qid, vec_id FROM (
                   SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                                   ORDER BY CAST(adc_dec AS DOUBLE), vec_id)
                            AS rn
                   FROM adc) WHERE rn <= {PQR_K}),
    legs AS (SELECT 'ivf_exact' AS leg, qid, vec_id FROM exact_topk
             UNION ALL
             SELECT 'ivfpq_adc', qid, vec_id FROM adc_topk),
    brute AS (SELECT qid, vec_id FROM (
                SELECT a.qid, b.vec_id AS vec_id,
                       row_number() OVER (PARTITION BY a.qid
                                ORDER BY {_COS_SQL} DESC, b.vec_id) AS rn
                FROM q a JOIN embeddings b ON a.qid <> b.vec_id)
              WHERE rn <= {PQR_K}),
    hits AS (SELECT l.leg, l.qid,
                    CAST(count(b.vec_id) AS BIGINT) AS n_hit
             FROM legs l LEFT JOIN brute b
               ON b.qid = l.qid AND b.vec_id = l.vec_id
             GROUP BY 1, 2)
    SELECT leg, CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(CAST(n_hit AS DECIMAL(18,6))) AS DOUBLE)
                 / (count(*) * {PQR_K}), 6) AS recall_at_k
    FROM hits GROUP BY leg
    """,
    doc="IVFPQ recall ATTRIBUTION — the calibration chart that "
        "decomposes approximate-search loss into its two sources, "
        "from ONE probe pass over the same candidates: the "
        "'ivf_exact' leg ranks the probed candidates by exact cosine "
        "(recall lost to CELL PRUNING alone), the 'ivfpq_adc' leg "
        "ranks the same candidates by ADC distance (pruning + "
        "QUANTIZATION loss — what ann_ivfpq_search actually serves), "
        "both measured against the exact brute-force truth at recall@"
        f"{PQR_K}. The gap between the legs is the PQ quantization "
        "cost — the number that tells a deployment whether to spend "
        "on more probes (cell loss dominates) or finer codebooks "
        "(quantization dominates). Query set is the fixed-size md5 "
        "calibration sample, so the truth leg stays "
        f"{IVF_CAL_Q} linear scans at any SF. Completes the serving "
        "stack: train (ann_ivf_kmeans) -> compress "
        "(embedding_pq_codes) -> serve (ann_ivfpq_search) -> "
        "CALIBRATE (this + ann_ivf_recall).",
)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    cent = _train_lloyd_full(spark, sf_dir)
    asg = _assign_cells(emb, cent)
    q = _calibration_queries(emb)
    probes = _ranked_cells(q, cent, IVFPQ_NPROBE).select("qid", "cid")
    cand = probes.join(asg, "cid").filter(
        F.col("vec_id") != F.col("qid")
    ).select("qid", "vec_id")
    pair_cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    w_q = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    exact_topk = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q), "qid")
        .select("qid", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= PQR_K)
        .select("qid", "vec_id")
    )
    sv = _pq_subvectors(_l2_normalized(emb), m=IVFPQ_M)
    pq = _train_pq_norm(spark, sf_dir)
    fa = _pq_assign(sv, pq).withColumnRenamed("cid", "code")
    qsv = sv.join(
        q.select(F.col("qid").alias("vec_id")), "vec_id"
    ).select(F.col("vec_id").alias("qid"), "sub", "sv")
    lut = qsv.join(F.broadcast(pq), "sub").select(
        "qid", "sub", F.col("cid").alias("code"), _pq_d().alias("d")
    )
    adc = (
        cand.join(fa, "vec_id")
        .join(lut, ["qid", "sub", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("d").cast("decimal(28,12)")).alias("adc_dec"))
    )
    w_adc = Window.partitionBy("qid").orderBy(
        F.col("adc_dec").cast("double").asc(), "vec_id"
    )
    adc_topk = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= PQR_K)
        .select("qid", "vec_id")
    )
    legs = exact_topk.withColumn("leg", F.lit("ivf_exact")).unionByName(
        adc_topk.withColumn("leg", F.lit("ivfpq_adc"))
    )
    w_b = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    brute = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= PQR_K)
        .select("qid", F.col("vec_id").alias("b_vec"))
    )
    hits = (
        legs.join(
            brute,
            (legs.qid == brute.qid) & (legs.vec_id == brute.b_vec),
            "left",
        )
        .select("leg", legs.qid.alias("qid"), "b_vec")
        .groupBy("leg", "qid")
        .agg(F.count("b_vec").alias("n_hit"))
    )
    return hits.groupBy("leg").agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum(F.col("n_hit").cast("decimal(18,6)")).cast("double")
            / (F.count("*") * PQR_K),
            6,
        ).alias("recall_at_k"),
    )


# --- residual encoding: the true FAISS-IVFPQ form -----------------------


def _assign_cells(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid): nearest-centroid argmax over the broadcast k-row
    table — the shared coarse-assignment step of every IVF query here
    (ties to the lowest cid, the trainer's discipline). Per-row HOF
    argmax over the collected centroid array: zero Exchange (the
    window form shuffled n·k scored rows; guide §2.4)."""
    return emb.crossJoin(
        F.broadcast(vectors.centroid_struct_array(cent))
    ).select(
        "vec_id",
        vectors.argmax_cos_cid(F.col("embedding"), F.col("_cents")).alias(
            "cid"
        ),
    )


def _ranked_cells(
    q: DataFrame, cent: DataFrame, p: int, qid_col: str = "qid",
    emb_col: str = "q_emb",
) -> DataFrame:
    """(qid, cid, cell_rn): each query's p best cells by (cos DESC,
    cid ASC), cell_rn 1-based — per-row HOF top-p over the broadcast
    centroid array (zero Exchange; same ranking as the old
    row_number() window, guide §2.4)."""
    return (
        q.crossJoin(F.broadcast(vectors.centroid_struct_array(cent)))
        .select(
            qid_col,
            F.posexplode(
                vectors.top_cos_structs(F.col(emb_col), F.col("_cents"), p)
            ).alias("_p", "_t"),
        )
        .select(
            qid_col,
            (-F.col("_t.nc")).alias("cid"),
            (F.col("_p") + 1).alias("cell_rn"),
        )
    )


def _residual_centroids(norm: DataFrame, asg: DataFrame) -> DataFrame:
    """cid -> r_emb: the per-cell mean of the NORMALIZED members —
    the reference point residual encoding subtracts. Any per-cell
    constant preserves the exact within-cell ranking identity
    ||q - x|| = ||(q - c) - (x - c)||; the mean CENTERS the residuals,
    so the PQ codebooks spend their bits on within-cell variance
    instead of re-encoding the cell's position. DECIMAL-exact
    component means (the _lloyd_centroids discipline), so the oracle
    replays it bit-for-bit."""
    return (
        norm.join(asg, "vec_id")
        .select("cid", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,9)")).cast("double")
                / F.count("*")
            ).alias("v")
        )
        .groupBy("cid")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "v"))).alias("pp"))
        .select("cid", F.col("pp.v").alias("r_emb"))
    )


def _residual_vectors(
    norm: DataFrame, asg: DataFrame, rcent: DataFrame
) -> DataFrame:
    """(vec_id, embedding): each normalized vector minus its cell's
    residual centroid — the frame residual PQ codebooks train on and
    encode."""
    return (
        norm.join(asg, "vec_id")
        .join(F.broadcast(rcent), "cid")
        .select(
            "vec_id",
            F.zip_with(
                "embedding", "r_emb", lambda a, b: a - b
            ).alias("embedding"),
        )
    )


_RESID_CTES = f"""rcm AS (
      SELECT cid, i,
             CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS v
      FROM (SELECT a.cid AS cid,
                   unnest(range(1, {DIM} + 1)) AS i,
                   unnest(n.embedding) AS x
            FROM asg a JOIN nemb n ON a.vec_id = n.vec_id)
      GROUP BY cid, i),
    rcent AS (SELECT cid, list(v ORDER BY i) AS c FROM rcm GROUP BY cid),
    resid AS (SELECT n.vec_id,
                     list_transform(range(1, {DIM} + 1),
                                    i -> n.embedding[i] - rc.c[i])
                       AS embedding
              FROM nemb n
              JOIN asg a ON n.vec_id = a.vec_id
              JOIN rcent rc ON rc.cid = a.cid)"""


@register(
    "ann_ivfpq_residual_recall",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    {_pq_ctes(normalized=True, m=IVFPQ_M, k=IVFPQ_K)},
    {_RESID_CTES},
    {_pq_ctes(m=IVFPQ_M, k=IVFPQ_K, prefix="r", src="resid")},
    fs AS (SELECT v.vec_id, v.sub, c.cid AS code, {_pq_l2_sql('v', 'c', IVFPQ_SUBDIM)} AS d
           FROM sv v JOIN pc{PQ_ITERS} c ON v.sub = c.sub),
    fa AS (SELECT vec_id, sub, code FROM (
             SELECT vec_id, sub, code,
                    row_number() OVER (PARTITION BY vec_id, sub
                                       ORDER BY d, code) AS rn
             FROM fs) WHERE rn = 1),
    rfs AS (SELECT v.vec_id, v.sub, c.cid AS code, {_pq_l2_sql('v', 'c', IVFPQ_SUBDIM)} AS d
            FROM rsv v JOIN rpc{PQ_ITERS} c ON v.sub = c.sub),
    rfa AS (SELECT vec_id, sub, code FROM (
              SELECT vec_id, sub, code,
                     row_number() OVER (PARTITION BY vec_id, sub
                                        ORDER BY d, code) AS rn
              FROM rfs) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          ORDER BY md5('ivfcal:' || CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {IVF_CAL_Q}),
    ps AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    probes AS (SELECT qid, cid FROM (
                 SELECT qid, cid,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos DESC, cid) AS rn
                 FROM ps) WHERE rn <= {IVFPQ_NPROBE}),
    cand AS (SELECT p.qid, p.cid, a.vec_id
             FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    exact_topk AS (SELECT qid, vec_id FROM (
                     SELECT c.qid, c.vec_id,
                            row_number() OVER (PARTITION BY c.qid
                                     ORDER BY {_COS_SQL} DESC, c.vec_id) AS rn
                     FROM cand c
                     JOIN embeddings a ON a.vec_id = c.qid
                     JOIN embeddings b ON b.vec_id = c.vec_id)
                   WHERE rn <= {PQR_K}),
    qsv AS (SELECT s.vec_id AS qid, s.sub, s.sv
            FROM sv s JOIN q ON s.vec_id = q.qid),
    lut AS (SELECT s.qid, c.sub, c.cid AS code, {_pq_l2_sql('s', 'c', IVFPQ_SUBDIM)} AS d
            FROM qsv s JOIN pc{PQ_ITERS} c ON s.sub = c.sub),
    adcp AS (SELECT cnd.qid, cnd.vec_id,
                    sum(CAST(l.d AS DECIMAL(28,12))) AS adc_dec
             FROM cand cnd
             JOIN fa f ON f.vec_id = cnd.vec_id
             JOIN lut l ON l.qid = cnd.qid AND l.sub = f.sub
                       AND l.code = f.code
             GROUP BY 1, 2),
    topp AS (SELECT qid, vec_id FROM (
               SELECT qid, vec_id,
                      row_number() OVER (PARTITION BY qid
                               ORDER BY CAST(adc_dec AS DOUBLE), vec_id) AS rn
               FROM adcp) WHERE rn <= {PQR_K}),
    qres AS (SELECT p.qid, p.cid,
                    list_transform(range(1, {DIM} + 1),
                                   i -> n.embedding[i] - rc.c[i]) AS remb
             FROM probes p
             JOIN nemb n ON n.vec_id = p.qid
             JOIN rcent rc ON rc.cid = p.cid),
    qrsv AS (SELECT qid, cid, sub,
                    remb[sub * {IVFPQ_SUBDIM} + 1 :
                         (sub + 1) * {IVFPQ_SUBDIM}] AS sv
             FROM qres, unnest(range(0, {IVFPQ_M})) AS t(sub)),
    rlut AS (SELECT s.qid, s.cid AS qcid, c.sub, c.cid AS code,
                    {_pq_l2_sql('s', 'c', IVFPQ_SUBDIM)} AS d
             FROM qrsv s JOIN rpc{PQ_ITERS} c ON s.sub = c.sub),
    adcr AS (SELECT cnd.qid, cnd.vec_id,
                    sum(CAST(l.d AS DECIMAL(28,12))) AS adc_dec
             FROM cand cnd
             JOIN rfa f ON f.vec_id = cnd.vec_id
             JOIN rlut l ON l.qid = cnd.qid AND l.qcid = cnd.cid
                        AND l.sub = f.sub AND l.code = f.code
             GROUP BY 1, 2),
    topr AS (SELECT qid, vec_id FROM (
               SELECT qid, vec_id,
                      row_number() OVER (PARTITION BY qid
                               ORDER BY CAST(adc_dec AS DOUBLE), vec_id) AS rn
               FROM adcr) WHERE rn <= {PQR_K}),
    legs AS (SELECT 'pq_plain' AS leg, qid, vec_id FROM topp
             UNION ALL
             SELECT 'pq_residual', qid, vec_id FROM topr),
    hits AS (SELECT l.leg, l.qid, CAST(count(e.vec_id) AS BIGINT) AS n_hit
             FROM legs l LEFT JOIN exact_topk e
               ON e.qid = l.qid AND e.vec_id = l.vec_id
             GROUP BY 1, 2)
    SELECT leg, CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(CAST(n_hit AS DECIMAL(18,6))) AS DOUBLE)
                 / (count(*) * {PQR_K}), 6) AS recall_at_k
    FROM hits GROUP BY leg
    """,
    doc="Residual encoding — the form FAISS actually ships as IVFPQ: "
        "instead of PQ-encoding the normalized vector itself "
        "(ann_ivfpq_search's plain posture), each vector encodes its "
        "RESIDUAL against its cell's reference point (the DECIMAL-"
        "exact mean of the cell's normalized members), and at query "
        "time the LUT is built per probed cell from q - c_cell — "
        "legal because within one cell ||q - x|| = ||(q-c) - (x-c)|| "
        "for any per-cell constant, so exact ranking is untouched "
        "while the codebooks spend their bits on within-cell variance "
        "instead of re-encoding each cell's position. This chart "
        "measures exactly what that buys: both legs rank the SAME "
        f"probed candidates (shared coarse quantizer, nprobe="
        f"{IVFPQ_NPROBE}) and are scored against the exact-cosine "
        "ranking of those candidates, so pruning loss cancels and the "
        "delta is pure quantization quality (measured at sf0.01: "
        "plain 0.400 -> residual 0.425 recall@5 at the same "
        f"{IVFPQ_M}x{IVFPQ_K} code budget). Cost shape: the residual "
        "LUT is nprobe x M x K rows per query — still constant-"
        "bounded; the cell table would store the same integer codes "
        "(residual codes drop into ivf_state unchanged). The oracle "
        "replays coarse training, residual centering, BOTH codebook "
        "trainings (prefixed CTE chain), encoding, probing and the "
        "ADC sums.",
)
def ann_ivfpq_residual_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    # memoized assignment: this query consumes it in TWO branches
    # (candidates + residual encode) and Spark does not dedupe common
    # subplans across joins — without the memo the corpus x k scoring
    # pass would run twice per execution (advisor r9)
    asg = _train_cell_asg(spark, sf_dir)
    cent = _train_lloyd_full(spark, sf_dir)
    norm = _l2_normalized(emb)
    rcent = _train_rcent(spark, sf_dir)
    resid = _residual_vectors(norm, asg, rcent)
    pq_p = _train_pq_norm(spark, sf_dir)
    pq_r = _train_pq_resid(spark, sf_dir)
    fa_p = _pq_assign(_pq_subvectors(norm, m=IVFPQ_M), pq_p).withColumnRenamed(
        "cid", "code"
    )
    fa_r = _pq_assign(_pq_subvectors(resid, m=IVFPQ_M), pq_r).withColumnRenamed(
        "cid", "code"
    )
    q = _calibration_queries(emb)
    probes = _ranked_cells(q, cent, IVFPQ_NPROBE).select("qid", "cid")
    cand = (
        probes.join(asg, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "cid", "vec_id")
    )
    pair_cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    w_q = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    exact_topk = (
        cand.select("qid", "vec_id")
        .join(emb, "vec_id")
        .join(F.broadcast(q), "qid")
        .select("qid", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= PQR_K)
        .select("qid", "vec_id")
    )
    qn = _l2_normalized(
        q.select(F.col("qid").alias("vec_id"), F.col("q_emb").alias("embedding"))
    )
    qsv_p = _pq_subvectors(qn, m=IVFPQ_M).select(
        F.col("vec_id").alias("qid"), "sub", "sv"
    )
    lut_p = qsv_p.join(F.broadcast(pq_p), "sub").select(
        "qid", "sub", F.col("cid").alias("code"), _pq_d().alias("d")
    )
    w_adc = Window.partitionBy("qid").orderBy(
        F.col("adc_dec").cast("double").asc(), "vec_id"
    )
    topp = (
        cand.select("qid", "vec_id")
        .join(fa_p, "vec_id")
        .join(lut_p, ["qid", "sub", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("d").cast("decimal(28,12)")).alias("adc_dec"))
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= PQR_K)
        .select("qid", "vec_id")
    )
    # residual query LUT: one reference subtraction PER PROBED CELL
    subdim = DIM // IVFPQ_M
    qres = (
        probes.withColumnRenamed("cid", "qcid")
        .join(
            F.broadcast(
                qn.select(
                    F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qn_emb"),
                )
            ),
            "qid",
        )
        .join(
            F.broadcast(rcent.withColumnRenamed("cid", "qcid")), "qcid"
        )
        .select(
            "qid",
            "qcid",
            F.zip_with("qn_emb", "r_emb", lambda a, b: a - b).alias("remb"),
        )
    )
    qsv_r = qres.select(
        "qid",
        "qcid",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("sub"),
                    F.transform(
                        F.slice("remb", i * subdim + 1, subdim),
                        lambda x: x.cast("double"),
                    ).alias("sv"),
                )
                for i in range(IVFPQ_M)
            ])
        ).alias("t"),
    ).select("qid", "qcid", "t.sub", "t.sv")
    lut_r = (
        qsv_r.join(
            F.broadcast(
                pq_r.withColumnRenamed("sub", "psub").withColumnRenamed(
                    "cid", "code"
                )
            ),
            F.col("sub") == F.col("psub"),
        )
        .select("qid", "qcid", "sub", "code", _pq_d().alias("d"))
    )
    topr = (
        cand.withColumnRenamed("qid", "cqid")
        .join(fa_r.withColumnRenamed("sub", "fsub"), "vec_id")
        .join(
            lut_r,
            (F.col("cqid") == lut_r.qid)
            & (F.col("cid") == F.col("qcid"))
            & (F.col("fsub") == lut_r.sub)
            & (fa_r.code == lut_r.code),
        )
        .select(F.col("cqid").alias("qid"), "vec_id", "d")
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("d").cast("decimal(28,12)")).alias("adc_dec"))
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= PQR_K)
        .select("qid", "vec_id")
    )
    legs = topp.withColumn("leg", F.lit("pq_plain")).unionByName(
        topr.withColumn("leg", F.lit("pq_residual"))
    )
    hits = (
        legs.join(
            exact_topk.withColumnRenamed("vec_id", "e_vec"),
            (legs.qid == exact_topk.qid)
            & (legs.vec_id == F.col("e_vec")),
            "left",
        )
        .select("leg", legs.qid.alias("qid"), "e_vec")
        .groupBy("leg", "qid")
        .agg(F.count("e_vec").alias("n_hit"))
    )
    return hits.groupBy("leg").agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum(F.col("n_hit").cast("decimal(18,6)")).cast("double")
            / (F.count("*") * PQR_K),
            6,
        ).alias("recall_at_k"),
    )


# --- scale-derived index parameters as driver evidence -----------------


@register(
    "ann_ivf_autok",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    occ AS (SELECT cid, count(*) AS n_rows FROM asg GROUP BY cid)
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_corpus,
           CAST({_K_CELLS_SQL} AS BIGINT) AS n_cells_derived,
           CAST({_NPL_SQL} AS BIGINT) AS n_planes_derived,
           CAST({scaling.assign_super_probes_sql(_K_CELLS_SQL)} AS BIGINT)
             AS assign_super_probes,
           CAST(count(*) AS BIGINT) AS n_live_cells,
           CAST(max(n_rows) AS BIGINT) AS max_cell_rows,
           round(CAST(sum(CAST(n_rows AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 2) AS avg_cell_rows
    FROM occ
    """,
    doc="The corpus-derived index sizing as a hash-checked chart (the "
        "r9 verdict's ask: make 'k ∝ √n' a tested behavior, not a "
        "comment): n_cells(count) = max(16, 2^(⌊log2 n⌋//2)) and "
        "n_planes(count) = max(6, ⌊log2 n⌋-3) resolved IN-QUERY from "
        "the live corpus count, alongside the occupancy shape of the "
        "k-means index actually trained with that k (live cells, max "
        "and mean rows per cell). The oracle replays the identical "
        "integer derivation via scalar subquery (functions/scaling.py "
        "twins, Python==DuckDB pinned in tests/test_scaling.py) AND "
        "the full training loop, so a drift in either the derivation "
        "or the k it feeds flips the hash. At 500 rows this resolves "
        "to the historical floor (16 cells); at the sf1 replica it "
        "resolves to 128 — same query, same oracle. Round-12 column: "
        "assign_super_probes, the measured build-assignment decision "
        "rule (scaling.assign_super_probes — 0 = flat exact assign, "
        "2 = flip to the two-level path at k >= 1024, where hier p=2 "
        "cuts >= 90% of assignment comparisons at the ZERO serving-"
        "recall cost ann_hier_recall measured for nprobe >= 2).",
)
def ann_ivf_autok(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    occ = (
        _train_cell_asg(spark, sf_dir)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return occ.agg(
        F.lit(n).cast("long").alias("n_corpus"),
        F.lit(scaling.n_cells(n)).cast("long").alias("n_cells_derived"),
        F.lit(scaling.n_planes(n)).cast("long").alias("n_planes_derived"),
        F.lit(scaling.assign_super_probes(scaling.n_cells(n)))
        .cast("long")
        .alias("assign_super_probes"),
        F.count(F.lit(1)).cast("long").alias("n_live_cells"),
        F.max("n_rows").cast("long").alias("max_cell_rows"),
        F.round(
            F.sum(F.col("n_rows").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_cell_rows"),
    )


_CAP_COARSE_SQL = scaling.train_cap_sql(_K_CELLS_SQL)
_CAP_PQ = scaling.train_cap(IVFPQ_K, scaling.TRAIN_PER_CODE)


@register(
    "ann_train_autocap",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    {_pq_ctes(normalized=True, m=IVFPQ_M, k=IVFPQ_K)}
    SELECT 'coarse' AS family,
           CAST({_K_CELLS_SQL} AS BIGINT) AS k,
           CAST({_CAP_COARSE_SQL} AS BIGINT) AS cap,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_train,
           CAST((SELECT count(*) FROM embeddings
                 WHERE {scaling.train_sample_pred_sql(
                     "lloydtrain", "embeddings", _CAP_COARSE_SQL,
                     seed_lt_sql=_K_CELLS_SQL)}) AS BIGINT) AS n_sampled,
           CAST(CASE WHEN (SELECT count(*) FROM embeddings)
                          > {_CAP_COARSE_SQL}
                THEN 1 ELSE 0 END AS BIGINT) AS binds,
           CAST((SELECT count(*) FROM cent{KMEANS_ITERS}) AS BIGINT)
             AS artifact_rows
    UNION ALL
    SELECT 'pq_norm',
           CAST({IVFPQ_K} AS BIGINT),
           CAST({_CAP_PQ} AS BIGINT),
           CAST((SELECT count(*) FROM nemb) AS BIGINT),
           CAST((SELECT count(*) FROM nemb
                 WHERE {scaling.train_sample_pred_sql(
                     "pqtrain", "nemb", str(_CAP_PQ),
                     seed_lt_sql=str(IVFPQ_K))}) AS BIGINT),
           CAST(CASE WHEN (SELECT count(*) FROM nemb) > {_CAP_PQ}
                THEN 1 ELSE 0 END AS BIGINT),
           CAST((SELECT count(*) FROM pc{PQ_ITERS}) AS BIGINT)
    """,
    doc="The bounded-training-sample contract as a hash-checked chart "
        "(the r10 verdict's #2: close the last O(n·k) full-corpus "
        "pass): per trainer family, the derived cap (64 vectors/"
        "centroid for the coarse quantizer, 256/codeword for PQ — the "
        "FAISS max_points_per_centroid discipline), the LIVE membership "
        "count of the deterministic md5-threshold sample predicate, "
        "whether the bound binds at this corpus size, and the row count "
        "of the artifact actually trained from that sample. The oracle "
        "replays the identical u32(md5)·n < cap·2^32 integer predicate "
        "AND both training loops, so a drift in the sample arithmetic, "
        "the cap derivation, or the trainer it feeds flips the hash. "
        "At 500 rows the predicate keeps everything (n <= cap) and the "
        "trainers are byte-identical to the unsampled form; at the sf1 "
        "replica (20k vectors, k=128, cap=8192) the coarse bound BINDS "
        "and training cost becomes O(cap·k) — pinned cross-engine by "
        "tests/test_train_sample.py and the sf1 marker suite.",
)
def ann_train_autocap(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    k = scaling.n_cells(n)
    cap_c = scaling.train_cap(k)
    emb = _emb_frame(spark, sf_dir)
    nemb = _l2_normalized(emb)
    n_nemb = _relation_count(spark, ("cnt_nemb", sf_dir), nemb)

    def _pred(df: DataFrame, tag: str, k_: int, cap_: int, n_: int):
        # the literal predicate, NOT _training_sample: the chart must
        # hash-check the sample arithmetic even where the trainer's
        # short-circuit (n <= cap) skips evaluating it
        return df.filter(_sample_pred_col(tag, k=k_, cap=cap_, n_src=n_))

    def _row(family, k_, cap_, n_, sample_df, artifact_df):
        return (
            sample_df.agg(F.count(F.lit(1)).alias("n_sampled"))
            .crossJoin(
                artifact_df.agg(F.count(F.lit(1)).alias("artifact_rows"))
            )
            .select(
                F.lit(family).alias("family"),
                F.lit(k_).cast("long").alias("k"),
                F.lit(cap_).cast("long").alias("cap"),
                F.lit(n_).cast("long").alias("n_train"),
                F.col("n_sampled").cast("long").alias("n_sampled"),
                F.lit(1 if n_ > cap_ else 0).cast("long").alias("binds"),
                F.col("artifact_rows").cast("long").alias("artifact_rows"),
            )
        )

    coarse = _row(
        "coarse",
        k,
        cap_c,
        n,
        _pred(emb, "lloydtrain", k, cap_c, n),
        _train_lloyd_full(spark, sf_dir),
    )
    pq = _row(
        "pq_norm",
        IVFPQ_K,
        _CAP_PQ,
        n_nemb,
        _pred(nemb, "pqtrain", IVFPQ_K, _CAP_PQ, n_nemb),
        _train_pq_norm(spark, sf_dir),
    )
    return coarse.unionByName(pq)


_G_SUPER_SQL = scaling.n_super_sql(_K_CELLS_SQL)


HIER_PROBES = (1, 2)  # level-1 multi-probe rungs the chart sweeps
# (FAISS's standard counter for two-level assign: score the top-2
# supers when single-probe agreement is too low for the corpus)


@register(
    "ann_hier_assign",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    centv AS (SELECT cid AS vec_id, c AS embedding FROM cent),
    {_kmeans_ctes("centv", prefix="h", sampled=False,
                  k_sql=_G_SUPER_SQL)},
    sup AS (SELECT cid AS scid, c FROM hcent{KMEANS_ITERS}),
    cm AS (SELECT vec_id AS cid, scid FROM (
             SELECT v.vec_id, s.scid,
                    row_number() OVER (PARTITION BY v.vec_id
                                       ORDER BY {_cos_vc_sql('v', 's')}
                                         DESC, s.scid) AS rn
             FROM centv v, sup s) WHERE rn = 1),
    vsr AS (SELECT e.vec_id, s.scid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_cos_vc_sql('e', 's')}
                                        DESC, s.scid) AS rn
            FROM embeddings e, sup s),
    np AS (SELECT unnest([{", ".join(str(p) for p in HIER_PROBES)}]) AS p),
    vsp AS (SELECT n.p, v.vec_id, v.scid
            FROM vsr v JOIN np n ON v.rn <= n.p),
    hs AS (SELECT vs.p, e.vec_id, ch.cid, {_cos_vc_sql('e', 'c')} AS cos
           FROM embeddings e
           JOIN vsp vs ON e.vec_id = vs.vec_id
           JOIN cm ch ON ch.scid = vs.scid
           JOIN cent c ON c.cid = ch.cid),
    ha AS (SELECT p, vec_id, cid AS hcid FROM (
             SELECT p, vec_id, cid,
                    row_number() OVER (PARTITION BY p, vec_id
                                       ORDER BY cos DESC, cid) AS rn
             FROM hs) WHERE rn = 1),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM s_all) WHERE rn = 1),
    chn AS (SELECT scid, count(*) AS nch FROM cm GROUP BY scid),
    cost AS (SELECT p, sum(nch) AS child_scored
             FROM vsp JOIN chn USING (scid) GROUP BY p),
    agree AS (SELECT ha.p, count(*) AS n_all,
                     sum(CASE WHEN ha.hcid = asg.cid THEN 1 ELSE 0 END)
                       AS n_agree
              FROM ha JOIN asg USING (vec_id) GROUP BY ha.p)
    SELECT CAST(a.p AS BIGINT) AS probe_supers,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_corpus,
           CAST({_K_CELLS_SQL} AS BIGINT) AS k_derived,
           CAST({_G_SUPER_SQL} AS BIGINT) AS n_super_derived,
           CAST((SELECT count(*) FROM cent) AS BIGINT) AS n_cells_live,
           CAST((SELECT count(*) FROM sup) AS BIGINT) AS n_super_live,
           CAST(a.n_agree AS BIGINT) AS n_agree,
           round(CAST(a.n_agree AS DOUBLE) / a.n_all, 4) AS agree_rate,
           CAST(a.n_all * (SELECT count(*) FROM cent) AS BIGINT)
             AS scored_exact,
           CAST(a.n_all * (SELECT count(*) FROM sup) + c.child_scored
                AS BIGINT) AS scored_hier
    FROM agree a JOIN cost c USING (p)
    ORDER BY probe_supers
    """,
    doc="Hierarchical coarse assignment (the r10 verdict's #3 — "
        "SCALE.md's last O(n·k) full-corpus pass), now charted per "
        "level-1 PROBE rung (the r11 verdict's #2): score each vector "
        "against g = 2^(⌊log2 k⌋//2) ≈ √k SUPER-centroids trained over "
        "the centroid table (fixed-iteration Lloyd, oracle-replayed), "
        "keep the top p supers (FAISS's standard multi-probe counter "
        f"for two-level assign; p in {HIER_PROBES}), then exactly "
        "against only those supers' child centroids — O(n·p·√k) "
        "comparisons instead of O(n·k). One row per probe rung, the "
        "attribution contract of the ann_ivfpq_recall pattern: "
        "agreement with the exact flat assignment on shared structure "
        "(n_agree / agree_rate) next to the measured comparison counts "
        "(scored_exact vs scored_hier, the live child fan-out summed "
        "over each vector's probed supers). The oracle replays both "
        "levels, both probe rungs and the flat assignment, so a drift "
        "in the super-trainer, the child map, the probe ranking or "
        "either argmax flips the hash. At k=16 384/g=128, p=2 scores "
        "~384 centroids per vector vs 16 384 flat — still a 43× cut — "
        "and lifts the single-probe agreement floor the r11 chart "
        "measured at 49.6% on uniform data; ann_hier_recall charts "
        "what each rung does to SERVING recall.",
)
def ann_hier_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ivf_state

    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    k = scaling.n_cells(n)
    g = scaling.n_super(k)
    emb = _emb_frame(spark, sf_dir)
    cent = _train_lloyd_full(spark, sf_dir)
    sup = _train_lloyd_super(spark, sf_dir)

    asg = _train_cell_asg(spark, sf_dir)
    nch = (
        ivf_state.super_children(cent, sup)
        .groupBy("scid")
        .agg(F.count(F.lit(1)).alias("nch"))
    )
    # ONE ranked level-1 pass at the deepest rung serves every rung's
    # cost attribution via a rank filter (persisted: two int columns
    # per probed super — without it each rung's agg re-runs the
    # n×g crossJoin+window)
    from pyspark import StorageLevel

    sp = (
        ivf_state.super_probe(
            emb, sup, probes=max(HIER_PROBES), with_rank=True
        )
        .join(F.broadcast(nch), "scid")
        .select("probe_rn", "nch")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rungs = []
    for p in HIER_PROBES:
        # the operator IS the implementation under audit (the same
        # path ivf_state.build(..., supers=..., super_probes=p) runs)
        ha = ivf_state.assign_hier(
            emb, cent, sup, super_probes=p
        ).select("vec_id", F.col("cid").alias("hcid"))
        agree = ha.join(asg, "vec_id").agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum(
                F.when(F.col("hcid") == F.col("cid"), 1).otherwise(0)
            ).alias("n_agree"),
        )
        # cost attribution over the SAME level-1 probe set assign_hier
        # scored children for (the rank filter selects this rung's
        # probes from the shared pass)
        cost = sp.filter(F.col("probe_rn") <= p).agg(
            F.sum("nch").alias("child_scored")
        )
        rungs.append(
            agree.crossJoin(
                cent.agg(F.count(F.lit(1)).alias("n_cells_live"))
            )
            .crossJoin(sup.agg(F.count(F.lit(1)).alias("n_super_live")))
            .crossJoin(cost)
            .select(
                F.lit(p).cast("long").alias("probe_supers"),
                F.lit(n).cast("long").alias("n_corpus"),
                F.lit(k).cast("long").alias("k_derived"),
                F.lit(g).cast("long").alias("n_super_derived"),
                F.col("n_cells_live").cast("long"),
                F.col("n_super_live").cast("long"),
                F.col("n_agree").cast("long"),
                F.round(
                    F.col("n_agree").cast("double") / F.col("n_all"), 4
                ).alias("agree_rate"),
                (F.col("n_all") * F.col("n_cells_live"))
                .cast("long")
                .alias("scored_exact"),
                (
                    F.col("n_all") * F.col("n_super_live")
                    + F.col("child_scored")
                )
                .cast("long")
                .alias("scored_hier"),
            )
        )
    out = rungs[0]
    for r in rungs[1:]:
        out = out.unionByName(r)
    return out


def _hier_asg_sql(tag: str, p: int) -> str:
    """CTE pair replaying assign_hier at level-1 probe width ``p``
    over the shared vsr/cm/cent chain: emits hs_{tag} (probed-super
    child candidates with exact cosine) and a_{tag} (the per-vector
    argmax) — the SQL twin of ivf_state.assign_hier(super_probes=p)."""
    return f"""hs_{tag} AS (
      SELECT e.vec_id, ch.cid, {_cos_vc_sql('e', 'c')} AS cos
      FROM embeddings e
      JOIN vsr vs ON e.vec_id = vs.vec_id AND vs.rn <= {p}
      JOIN cm ch ON ch.scid = vs.scid
      JOIN cent c ON c.cid = ch.cid),
    a_{tag} AS (SELECT vec_id, cid FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid) AS rn
      FROM hs_{tag}) WHERE rn = 1)"""


def _hrec_pivot_sql(col: str, build: str) -> str:
    return f"max(CASE WHEN build = '{build}' THEN {col} END)"


def _hrec_recall_sql(build: str) -> str:
    return (
        f"round(CAST({_hrec_pivot_sql('hits', build)} AS DOUBLE) "
        f"/ ({_hrec_pivot_sql('n_q', build)} * {IVF_RECALL_K}), 6)"
    )


def _hrec_delta_sql(build: str) -> str:
    # exactly recall_build − recall_flat, but INTEGER-first: the
    # cross-ratio (hits_b·nq_f − hits_f·nq_b) / (nq_b·nq_f·K) is one
    # division+round over integer arithmetic, so it is bit-exact
    # cross-engine (subtracting two already-rounded doubles is
    # 1-ulp engine-dependent — the percentile lesson) AND stays the
    # true recall difference even if one build loses a query group
    # (each side normalized by its own n_q)
    hb, hf = _hrec_pivot_sql("hits", build), _hrec_pivot_sql("hits", "flat")
    nb, nf = _hrec_pivot_sql("n_q", build), _hrec_pivot_sql("n_q", "flat")
    return (
        f"round(CAST({hb} * {nf} - {hf} * {nb} AS DOUBLE) "
        f"/ ({nb} * {nf} * {IVF_RECALL_K}), 6)"
    )


def _hrec_cand_sql(build: str) -> str:
    return (
        f"round(CAST({_hrec_pivot_sql('cands', build)} AS DOUBLE) "
        f"/ {_hrec_pivot_sql('n_q', build)}, 2)"
    )


# every probe-rung artifact of the chart derives from the ONE
# HIER_PROBES constant ann_hier_assign sweeps — editing the rung set
# updates both charts' geometries, CTEs, build list and columns
# together (they must never report different rungs of the same knob)
_HREC_BUILDS = [("flat", 0)] + [(f"hier_p{p}", p) for p in HIER_PROBES]
_HREC_HIER_CTES = ",\n    ".join(
    _hier_asg_sql(f"h{p}", p) for p in HIER_PROBES
)
_HREC_ASG_UNION = "SELECT 'flat' AS build, vec_id, cid FROM a_flat" + "".join(
    f"\n            UNION ALL SELECT 'hier_p{p}', vec_id, cid FROM a_h{p}"
    for p in HIER_PROBES
)
_HREC_SELECT = ",\n           ".join(
    [f"{_hrec_recall_sql('flat')} AS recall_flat"]
    + [
        f"{_hrec_recall_sql(f'hier_p{p}')} AS recall_hier_p{p}"
        for p in HIER_PROBES
    ]
    + [
        f"{_hrec_delta_sql(f'hier_p{p}')} AS delta_hier_p{p}"
        for p in HIER_PROBES
    ]
    + [f"{_hrec_cand_sql('flat')} AS cand_flat"]
    + [
        f"{_hrec_cand_sql(f'hier_p{p}')} AS cand_hier_p{p}"
        for p in HIER_PROBES
    ]
)


@register(
    "ann_hier_recall",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    centv AS (SELECT cid AS vec_id, c AS embedding FROM cent),
    {_kmeans_ctes("centv", prefix="h", sampled=False,
                  k_sql=_G_SUPER_SQL)},
    sup AS (SELECT cid AS scid, c FROM hcent{KMEANS_ITERS}),
    cm AS (SELECT vec_id AS cid, scid FROM (
             SELECT v.vec_id, s.scid,
                    row_number() OVER (PARTITION BY v.vec_id
                                       ORDER BY {_cos_vc_sql('v', 's')}
                                         DESC, s.scid) AS rn
             FROM centv v, sup s) WHERE rn = 1),
    vsr AS (SELECT e.vec_id, s.scid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_cos_vc_sql('e', 's')}
                                        DESC, s.scid) AS rn
            FROM embeddings e, sup s),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    a_flat AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cos DESC, cid) AS rn
                 FROM s_all) WHERE rn = 1),
    {_HREC_HIER_CTES},
    asg AS ({_HREC_ASG_UNION}),
    q AS (SELECT vec_id AS qid, embedding FROM embeddings
          ORDER BY md5('ivfcal:' || CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {IVF_CAL_Q}),
    pc AS (SELECT q.qid, c.cid, {_cos_vc_sql('q', 'c')} AS cos
           FROM q, cent c),
    pr AS (SELECT qid, cid,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY cos DESC, cid) AS cell_rn
           FROM pc),
    np AS (SELECT unnest([{", ".join(str(n) for n in IVF_NPROBES)}]) AS nprobe),
    probes AS (SELECT p.qid, n.nprobe, p.cid
               FROM pr p JOIN np n ON p.cell_rn <= n.nprobe),
    cand AS (SELECT a.build, p.qid, p.nprobe, a.vec_id
             FROM probes p JOIN asg a USING (cid)
             WHERE a.vec_id <> p.qid),
    csc AS (SELECT c.build, c.qid, c.nprobe, c.vec_id, {_COS_SQL} AS cos
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.qid
            JOIN embeddings b ON b.vec_id = c.vec_id),
    srv_topk AS (SELECT build, qid, nprobe, vec_id FROM (
                   SELECT build, qid, nprobe, vec_id,
                          row_number() OVER (
                            PARTITION BY build, qid, nprobe
                            ORDER BY cos DESC, vec_id) AS rn
                   FROM csc) WHERE rn <= {IVF_RECALL_K}),
    brute AS (SELECT qid, vec_id FROM (
                SELECT a.qid, b.vec_id AS vec_id,
                       row_number() OVER (PARTITION BY a.qid
                                ORDER BY {_COS_SQL} DESC, b.vec_id) AS rn
                FROM q a JOIN embeddings b ON a.qid <> b.vec_id)
              WHERE rn <= {IVF_RECALL_K}),
    hits AS (SELECT i.build, i.qid, i.nprobe,
                    CAST(count(b.vec_id) AS BIGINT) AS n_hit
             FROM srv_topk i LEFT JOIN brute b
               ON b.qid = i.qid AND b.vec_id = i.vec_id
             GROUP BY 1, 2, 3),
    nc AS (SELECT build, qid, nprobe, CAST(count(*) AS BIGINT) AS n_cand
           FROM cand GROUP BY 1, 2, 3),
    per_q AS (SELECT h.build, h.qid, h.nprobe, h.n_hit, c.n_cand
              FROM hits h JOIN nc c USING (build, qid, nprobe)),
    agg AS (SELECT build, nprobe,
                   CAST(count(*) AS BIGINT) AS n_q,
                   CAST(sum(n_hit) AS BIGINT) AS hits,
                   CAST(sum(n_cand) AS BIGINT) AS cands
            FROM per_q GROUP BY 1, 2)
    SELECT nprobe,
           CAST({_hrec_pivot_sql("n_q", "flat")} AS BIGINT) AS n_queries,
           {_HREC_SELECT}
    FROM agg GROUP BY nprobe ORDER BY nprobe
    """,
    doc="The hier-assignment SERVING-recall contract (the r11 "
        "verdict's #1 — the number an operator reads before flipping "
        "a 10⁹-row build to the O(n·p·√k) path): three ivf_state "
        "builds over the SAME corpus and the SAME trained centroids — "
        "flat, hier p=1, hier p=2 — differ only in which cell each "
        "vector landed in; the same md5-selected calibration queries "
        f"({IVF_CAL_Q}, the ann_ivf_recall sample) are served from "
        f"each persisted state at nprobe in {IVF_NPROBES}, and "
        f"recall@{IVF_RECALL_K} is charted per build against ONE "
        "shared exact brute-force truth. delta_hier_p* is the "
        "hit-count difference over flat (integer-first arithmetic, so "
        "the delta is bit-exact cross-engine); cand_* shows the probed "
        "candidate volume each geometry pays. Where ann_hier_assign "
        "charts cell-level AGREEMENT, this charts what a user actually "
        "loses end-to-end — boundary vectors that land in a "
        "neighboring cell are often still recovered by multi-cell "
        "probing, so the serving delta is the honest cost. The oracle "
        "replays both trainers, all three assignments, the probe "
        "ranking, all three serves and the truth leg; the Spark side "
        "serves from the PERSISTED bucketed cell tables "
        "(ivf_state.build per build mode, hier ones via "
        "super_probes=p).",
)
def ann_hier_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hrec_serve(spark, sf_dir, _hrec_builds(spark, sf_dir))


def _hrec_builds(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str]]:
    """[(tag, state_name)]: the three hermetic ivf_state builds the
    serving-recall chart compares — flat, hier p=1, hier p=2 — over
    the SAME corpus and the SAME memoized centroids. Split from the
    serve leg so the bench attributes the one-time build cost
    separately (hrec.build/hrec.serve, the ivfpq.* convention)."""
    from ..operators import ivf_state

    emb = _emb_frame(spark, sf_dir)
    cent = _train_lloyd_full(spark, sf_dir)
    sup = _train_lloyd_super(spark, sf_dir)

    import hashlib

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    # the memoized corpus count sizes the bucket layout AND feeds the
    # childless-super guards — no build re-counts the vector frame
    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    nb = scaling.n_state_buckets(n)

    # the three builds are INDEPENDENT jobs over shared read-only
    # inputs (memoized centroids/supers, distinct state tables) — run
    # them from a small thread pool so each build's straggler tail
    # back-fills with the next build's tasks (guide §2.6 overlap;
    # Spark's scheduler runs concurrent jobs FIFO, which is exactly
    # the back-fill behavior). Job descriptions are thread-local, so
    # the UI stays attributable.
    def _one(tag_p: tuple[str, int]) -> tuple[str, str]:
        tag, p = tag_p
        name = f"hrec_{tag}_{sfx}"
        spark.sparkContext.setJobDescription(f"hrec build {tag}")
        if p == 0:
            # the canonical flat state (num_buckets=nb is exactly what
            # the memo's build derives from the memoized corpus count)
            _memo_flat_state(spark, sf_dir, name)
        else:
            ivf_state.build(
                emb, cent, name, supers=sup, super_probes=p,
                num_buckets=nb, n_rows=n,
            )
        return tag, name

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_HREC_BUILDS)) as pool:
        states = list(pool.map(_one, _HREC_BUILDS))
    spark.sparkContext.setJobDescription(None)
    return states


def _hrec_serve(
    spark: SparkSession, sf_dir: str, states: list[tuple[str, str]]
) -> DataFrame:
    """The recurring leg: serve the calibration queries from all three
    persisted states at the nprobe sweep, score against the shared
    brute truth, pivot to the per-nprobe chart."""
    emb = _emb_frame(spark, sf_dir)

    # one probe ranking serves all three states (identical centroid
    # table by construction) and fans out to every nprobe via the
    # 3-row broadcast — the ann_ivf_recall sweep pattern
    q = _calibration_queries(emb)
    pr = _ranked_cells(
        q, spark.table(f"{states[0][1]}_centroids"), max(IVF_NPROBES)
    )
    np_df = spark.createDataFrame([(n,) for n in IVF_NPROBES], "nprobe int")
    probes = pr.join(
        F.broadcast(np_df), F.col("cell_rn") <= F.col("nprobe")
    ).select("qid", "nprobe", "cid")

    legs = []
    for tag, name in states:
        cells = spark.table(f"{name}_cells")
        legs.append(
            probes.join(cells, "cid")
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                F.lit(tag).alias("build"),
                "qid",
                "nprobe",
                "vec_id",
                "embedding",
            )
        )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)

    pair_cos = vectors.cosine(F.col("q_emb"), F.col("embedding"))
    w_srv = Window.partitionBy("build", "qid", "nprobe").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    srv_topk = (
        cand.join(F.broadcast(q), "qid")
        .select("build", "qid", "nprobe", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_srv))
        .filter(F.col("rn") <= IVF_RECALL_K)
        .select("build", "qid", "nprobe", "vec_id")
    )
    w_b = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    brute = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", pair_cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= IVF_RECALL_K)
        .select("qid", F.col("vec_id").alias("b_vec"))
    )
    hits = (
        srv_topk.join(
            brute,
            (srv_topk.qid == brute.qid) & (srv_topk.vec_id == brute.b_vec),
            "left",
        )
        .select("build", srv_topk.qid.alias("qid"), "nprobe", "b_vec")
        .groupBy("build", "qid", "nprobe")
        .agg(F.count("b_vec").alias("n_hit"))
    )
    nc = cand.groupBy("build", "qid", "nprobe").agg(
        F.count("*").alias("n_cand")
    )
    agg = (
        hits.join(nc, ["build", "qid", "nprobe"])
        .groupBy("build", "nprobe")
        .agg(
            F.count("*").alias("n_q"),
            F.sum("n_hit").alias("hits"),
            F.sum("n_cand").alias("cands"),
        )
    )

    def _pv(col: str, build: str):
        return F.max(F.when(F.col("build") == build, F.col(col)))

    def _recall(build: str):
        return F.round(
            _pv("hits", build).cast("double")
            / (_pv("n_q", build) * IVF_RECALL_K),
            6,
        )

    def _delta(build: str):
        # exactly recall_build − recall_flat via the integer-first
        # cross-ratio (see _hrec_delta_sql)
        return F.round(
            (
                _pv("hits", build) * _pv("n_q", "flat")
                - _pv("hits", "flat") * _pv("n_q", build)
            ).cast("double")
            / (_pv("n_q", build) * _pv("n_q", "flat") * IVF_RECALL_K),
            6,
        )

    def _cand(build: str):
        return F.round(
            _pv("cands", build).cast("double") / _pv("n_q", build), 2
        )

    # column list derives from HIER_PROBES exactly like the oracle's
    return agg.groupBy("nprobe").agg(
        _pv("n_q", "flat").cast("long").alias("n_queries"),
        _recall("flat").alias("recall_flat"),
        *[
            _recall(f"hier_p{p}").alias(f"recall_hier_p{p}")
            for p in HIER_PROBES
        ],
        *[
            _delta(f"hier_p{p}").alias(f"delta_hier_p{p}")
            for p in HIER_PROBES
        ],
        _cand("flat").alias("cand_flat"),
        *[
            _cand(f"hier_p{p}").alias(f"cand_hier_p{p}")
            for p in HIER_PROBES
        ],
    )


# --- maximum inner-product search via the norm-augmentation reduction --
# (Bachrach et al. 2014 / Neyshabur & Srebro 2015 — the standard public
# trick for serving MIPS through any cosine-ANN stack: scale the corpus
# into the unit ball by its max norm M, append sqrt(M^2 - ||x||^2) to
# every corpus vector and 0 to every query; cosine ranking in the
# (d+1)-dim space is then exactly the inner-product ranking.)
MIPS_K = 5
MIPS_WMOD = 7  # deterministic planted norm diversity: the synthetic
# embeddings are all unit-norm (MIPS would degenerate to cosine), so
# vectors are scaled by 1 + (vec_id % 7)/4 — norms spread over
# [1, 2.5], replayed exactly by the oracle (the planted-twin pattern
# dedup_semantic/dedup_embedding_cosine established)
MIPS_CAL_Q = 8  # fixed-size md5-selected query sample: the brute-force
# truth leg costs MIPS_CAL_Q linear scans at ANY corpus size


def _mips_bucket_sql(col: str) -> str:
    """Sign-LSH bucket over a (DIM+1)-dim DOUBLE[] column expression —
    the augmented-space twin of _bucket_sql, same derived-plane gating
    (hyperplane_signs(DIM+1, j) extends each 64-dim plane by one
    deterministic component)."""
    signs = vectors.hyperplane_signs(DIM + 1, _P_MAX)
    terms = []
    for j in range(_P_MAX):
        # explicit per-plane sum (the _sum_sql discipline)
        proj = "(" + " + ".join(
            f"{col}[{i + 1}] * {signs[j][i]}" for i in range(DIM + 1)
        ) + ")"
        terms.append(
            f"CASE WHEN {j} < {_NPL_SQL} AND {proj} >= 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _mips_oracle() -> str:
    dot = _sum_sql("q.qa[{i}] * c.va[{i}]", DIM + 1)
    return f"""
    WITH w AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(x AS DOUBLE)
                               * (1.0 + CAST(vec_id % {MIPS_WMOD} AS DOUBLE)
                                        / 4.0)) AS v
               FROM embeddings),
    n2 AS (SELECT vec_id, v,
                  list_aggregate(list_transform(v, x -> x * x), 'sum') AS nrm2
           FROM w),
    mx AS (SELECT max(nrm2) AS m2 FROM n2),
    corp AS (SELECT vec_id,
                    list_append(v, sqrt((SELECT m2 FROM mx) - nrm2)) AS va
             FROM n2),
    q0 AS (SELECT vec_id AS qid, list_append(v, 0.0) AS qa FROM w
           ORDER BY md5('mipscal:' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT {MIPS_CAL_Q}),
    cb AS (SELECT vec_id, va, {_mips_bucket_sql('va')} AS bucket FROM corp),
    qb AS (SELECT qid, qa, {_mips_bucket_sql('qa')} AS bucket FROM q0),
    pr AS (SELECT qid, qa,
                  xor(bucket::BIGINT,
                      unnest(list_prepend(CAST(0 AS BIGINT),
                          list_transform(range(0, {_NPL_SQL}),
                              j -> CAST(1 AS BIGINT)
                                   << CAST(j AS INTEGER))))) AS bucket
           FROM qb),
    cand AS (SELECT q.qid, c.vec_id, {dot} AS dot
             FROM pr q JOIN cb c
               ON q.bucket = c.bucket AND q.qid <> c.vec_id),
    lsh_topk AS (SELECT qid, vec_id FROM (
                   SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY dot DESC, vec_id) AS rn
                   FROM cand) WHERE rn <= {MIPS_K}),
    brute AS (SELECT qid, vec_id FROM (
                SELECT q.qid, c.vec_id,
                       row_number() OVER (PARTITION BY q.qid
                                ORDER BY {dot} DESC, c.vec_id) AS rn
                FROM qb q JOIN corp c ON q.qid <> c.vec_id)
              WHERE rn <= {MIPS_K}),
    nc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cand
           FROM cand GROUP BY 1),
    hits AS (SELECT l.qid, CAST(count(b.vec_id) AS BIGINT) AS n_hit
             FROM lsh_topk l LEFT JOIN brute b
               ON b.qid = l.qid AND b.vec_id = l.vec_id
             GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST({_NPL_SQL} AS BIGINT) AS n_planes_derived,
           round(CAST(sum(CAST(coalesce(h.n_hit, 0) AS DECIMAL(18,6)))
                 AS DOUBLE) / (count(*) * {MIPS_K}), 6) AS recall_at_k,
           round(CAST(sum(CAST(coalesce(c.n_cand, 0) AS DECIMAL(18,6)))
                 AS DOUBLE) / count(*), 2) AS avg_candidates
    FROM q0 LEFT JOIN hits h USING (qid) LEFT JOIN nc c USING (qid)
    """


@register(
    "ann_mips_reduction",
    oracle=_mips_oracle(),
    doc="Maximum inner-product search served through the cosine-ANN "
        "stack via the norm-augmentation reduction (append "
        "sqrt(M² − ‖x‖²) to each corpus vector, 0 to each query — "
        "ASYMMETRIC by construction; cosine ranking in d+1 dims IS the "
        "inner-product ranking). The chart: recall@k of the "
        "augmented-space sign-LSH search (derived plane count + 1-bit "
        "multiprobe, "
        "same n_planes(count) discipline as ann_lsh_bucket) against "
        "the exact-MIPS brute truth on the fixed md5-selected "
        f"calibration sample ({MIPS_CAL_Q} queries — the truth leg is "
        "bounded linear scans at any corpus size, the IVF_CAL_Q "
        "pattern). Norm diversity is deterministically planted "
        "(the synthetic embeddings are unit-norm, where MIPS "
        "degenerates to cosine); the oracle replays the weighting, "
        "the max-norm scalar, the augmentation, the 65-dim gated "
        "bucket arithmetic and both rankings. Measured recall@5 is "
        "modest (0.175 at sf0.01, ~2x the random-candidate baseline "
        "at the same 8% candidate volume): the synthetic corpus has "
        "flat angular structure and the norm spread moves the IP-top "
        "set across angular regions — exactly the regime the "
        "reduction is FOR; probe count is the recall knob, and "
        "production pairs the same reduction with the IVFPQ state "
        "for candidate generation. At 100 TB the bucketed "
        "corpus side is the same n/8-bucket layout every LSH query "
        "here uses; swap in the IVFPQ state for the candidate source "
        "unchanged downstream.",
)
def ann_mips_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    npl = _derived_planes(spark, sf_dir)
    emb = spread(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    wcol = F.lit(1.0) + (F.col("vec_id") % MIPS_WMOD).cast("double") / F.lit(4.0)
    w = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") * wcol).alias("v"),
    )
    n2 = w.select(
        "vec_id", "v",
        F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x).alias("nrm2"),
    )
    mx = n2.agg(F.max("nrm2").alias("m2"))
    corp = n2.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        F.concat("v", F.array(F.sqrt(F.col("m2") - F.col("nrm2")))).alias("va"),
    )
    q0 = (
        w.select(
            F.col("vec_id").alias("qid"),
            F.concat("v", F.array(F.lit(0.0))).alias("qa"),
            F.md5(
                F.concat(F.lit("mipscal:"), F.col("vec_id").cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "qid")
        .limit(MIPS_CAL_Q)
        .drop("_h")
    )
    cb = corp.select(
        "vec_id", "va",
        vectors.hyperplane_sign_bucket(F.col("va"), DIM + 1, npl).alias("bucket"),
    )
    qb = q0.select(
        "qid", "qa",
        vectors.hyperplane_sign_bucket(F.col("qa"), DIM + 1, npl).alias("bucket"),
    )

    def dot():
        return F.aggregate(
            F.zip_with(F.col("qa"), F.col("va"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # 1-bit multiprobe (own bucket + every single-plane flip): the
    # augmented dimension dominates the hash for small-norm corpus
    # vectors, so single-bucket probing leaves recall on the table;
    # distinct masks -> distinct probe buckets, so no pair dedup needed
    probes = qb.select(
        "qid", "qa",
        F.explode(
            F.array(
                *[F.col("bucket").bitwiseXOR(F.lit(m))
                  for m in [0] + [1 << j for j in range(npl)]]
            )
        ).alias("bucket"),
    )
    cand = (
        probes.join(cb, "bucket")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", dot().alias("dot"))
    )
    wk = Window.partitionBy("qid").orderBy(F.col("dot").desc(), "vec_id")
    lsh_topk = (
        cand.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= MIPS_K)
        .select("qid", "vec_id")
    )
    brute = (
        F.broadcast(qb.select("qid", "qa"))
        .crossJoin(corp)
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", dot().alias("dot"))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= MIPS_K)
        .select("qid", F.col("vec_id").alias("b_vec"))
    )
    hits = (
        lsh_topk.join(
            brute,
            (lsh_topk.qid == brute.qid) & (lsh_topk.vec_id == brute.b_vec),
            "left",
        )
        .select(lsh_topk.qid.alias("qid"), "b_vec")
        .groupBy("qid")
        .agg(F.count("b_vec").cast("long").alias("n_hit"))
    )
    nc = cand.groupBy("qid").agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    perq = (
        q0.select("qid")
        .join(hits, "qid", "left")
        .join(nc, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.coalesce(F.col("n_cand"), F.lit(0)).alias("n_cand"),
        )
    )
    return perq.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(npl).cast("long").alias("n_planes_derived"),
        F.round(
            F.sum(F.col("n_hit").cast("decimal(18,6)")).cast("double")
            / (F.count(F.lit(1)) * MIPS_K),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.sum(F.col("n_cand").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_candidates"),
    )


# --- cell-split rebalance: the index-maintenance verb ------------------
CSPLIT_ITERS = 2  # fixed per-cell 2-means rounds (the KMEANS_ITERS pin)


def _csplit_sub_ctes(iters: int = CSPLIT_ITERS) -> str:
    """CTE chain replaying ivf_state.split_oversized's per-cell
    2-means over the oversized-cell members (CTEs mem/over/ranks/basec
    must precede): ssub0 seeds each splitting cell with its two
    lowest-vec_id members, then ``iters`` rounds of the _kmeans_ctes
    assign+DECIMAL-mean loop keyed (cid, sub) instead of cid; emits
    ssub{iters} (final sub-centroids), spfa (final member→sub argmax)
    and newmap (fresh-cid allocation: base + 2·rank(cid) + sub)."""
    parts = [f"""ssub0 AS MATERIALIZED (
      SELECT cid, rn - 1 AS sub,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
      FROM (SELECT cid, vec_id, embedding,
                   row_number() OVER (PARTITION BY cid
                                      ORDER BY vec_id) AS rn
            FROM mem) WHERE rn <= 2)"""]
    for it in range(1, iters + 1):
        parts.append(f"""sps{it} AS (
      SELECT v.cid, v.vec_id, s.sub, {_cos_vc_sql('v', 's')} AS cos
      FROM mem v JOIN ssub{it - 1} s ON s.cid = v.cid),
    spa{it} AS (
      SELECT cid, vec_id, sub FROM (
        SELECT cid, vec_id, sub,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, sub) AS rn
        FROM sps{it}) WHERE rn = 1),
    spm{it} AS (
      SELECT cid, sub, i,
             CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS v
      FROM (SELECT a.cid, a.sub,
                   unnest(range(1, {DIM} + 1)) AS i,
                   unnest(list_transform(e.embedding,
                                         y -> CAST(y AS DOUBLE))) AS x
            FROM spa{it} a JOIN embeddings e USING (vec_id))
      GROUP BY cid, sub, i),
    ssub{it} AS MATERIALIZED (SELECT cid, sub, list(v ORDER BY i) AS c
                 FROM spm{it} GROUP BY cid, sub)""")
    parts.append(f"""spfs AS (
      SELECT v.cid, v.vec_id, s.sub, {_cos_vc_sql('v', 's')} AS cos
      FROM mem v JOIN ssub{iters} s ON s.cid = v.cid),
    spfa AS MATERIALIZED (
      SELECT cid, vec_id, sub FROM (
        SELECT cid, vec_id, sub,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, sub) AS rn
        FROM spfs) WHERE rn = 1),
    newmap AS MATERIALIZED (
      SELECT s.cid, s.sub, b.b + 2 * r.cr + s.sub AS new_cid
      FROM ssub{iters} s JOIN ranks r USING (cid), basec b)""")
    return ",\n    ".join(parts)


def _csplit_cap(spark: SparkSession, sf_dir: str) -> int:
    """The chart's deterministic split threshold: the cell size at
    ascending rank ⌈3m/4⌉ of the m live cell sizes (ties broken by
    cid) — a discrete p75, exact integer arithmetic both engines
    replay, chosen so the split set is non-vacuous at every driver SF
    (2-7 cells measured at sf0.001-0.1, the top quartile at most). A
    production caller passes an explicit byte-budget cap instead; the
    quantile is chart policy, not operator policy. All frames here are
    k rows (cells, not vectors) — the global window is k-scale."""
    sizes = (
        _train_cell_asg(spark, sf_dir)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = sizes.count()
    r = (3 * m + 3) // 4  # == ceil(3m/4), integer-exact
    return (
        sizes.withColumn(
            "rn", F.row_number().over(Window.orderBy("n", "cid"))
        )
        .filter(F.col("rn") == r)
        .collect()[0]["n"]
    )


def _csplit_build(spark: SparkSession, sf_dir: str) -> str:
    """The hermetic day-1 state the maintenance chart splits: flat
    build over the memoized lloyd_full centroids (the one-time cost;
    bench reports it as csplit.build)."""
    import hashlib

    name = "csplit_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return _memo_flat_state(spark, sf_dir, name)


def _csplit_maint(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """The recurring maintenance leg: derive the cap, split the
    oversized cells, measure the before/after geometry FROM THE REAL
    TABLES (not the operator's return dict — the chart pins what is
    physically on disk), then reclaim the tombstones via
    compact(reclaim=True) and pin the post-compact row count. Each
    phase's metrics are checkpointed before the next phase mutates the
    tables it reads — lazy evaluation would otherwise measure the
    post-compact state three times."""
    from ..operators import ivf_state

    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    k = _derived_cells(spark, sf_dir)
    cap = _csplit_cap(spark, sf_dir)
    t_cells = f"{name}_cells"
    t_cent = f"{name}_centroids"

    pre_sizes = (
        spark.table(t_cells).groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    )
    pre = (
        pre_sizes.agg(
            F.count(F.lit(1)).alias("n_cells_before"),
            F.max("n").alias("max_before"),
            F.max("cid").alias("_pre_max_cid"),
        )
        .localCheckpoint(eager=True)
    )
    pre_max_cid = pre.collect()[0]["_pre_max_cid"]

    rep = ivf_state.split_oversized(spark, name, cap=cap)

    post_cells = spark.table(t_cells)
    live = post_cells.join(
        F.broadcast(spark.table(t_cent).select("cid")), "cid", "left_semi"
    )
    post = (
        post_cells.agg(F.count(F.lit(1)).alias("_total"))
        .crossJoin(live.agg(F.count(F.lit(1)).alias("_live")))
        .crossJoin(
            live.filter(F.col("cid") > pre_max_cid).agg(
                F.count(F.lit(1)).alias("rows_moved")
            )
        )
        .crossJoin(
            live.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("max_after"))
        )
        .localCheckpoint(eager=True)
    )

    ivf_state.compact(spark, name, reclaim=True)
    after = spark.table(t_cells).agg(
        F.count(F.lit(1)).alias("rows_after_compact")
    )

    return (
        pre.crossJoin(post)
        .crossJoin(after)
        .select(
            F.lit(n).cast("long").alias("n_corpus"),
            F.lit(k).cast("long").alias("k_derived"),
            F.col("n_cells_before").cast("long"),
            F.lit(cap).cast("long").alias("cap"),
            F.lit(rep["cells_split"]).cast("long").alias("cells_split"),
            F.lit(rep["cells_added"]).cast("long").alias("cells_added"),
            (
                F.col("n_cells_before")
                - F.lit(rep["cells_split"])
                + F.lit(rep["cells_added"])
            )
            .cast("long")
            .alias("n_cells_after"),
            F.col("rows_moved").cast("long"),
            (F.col("_total") - F.col("_live")).cast("long").alias("dead_rows"),
            F.col("max_before").cast("long"),
            F.col("max_after").cast("long"),
            F.col("rows_after_compact").cast("long"),
        )
    )


@register(
    "ann_cell_split",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    a_flat AS MATERIALIZED (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cos DESC, cid) AS rn
                 FROM s_all) WHERE rn = 1),
    sizes AS MATERIALIZED (SELECT cid, count(*) AS n FROM a_flat GROUP BY cid),
    msz AS (SELECT count(*) AS m FROM sizes),
    caprow AS MATERIALIZED (SELECT n AS cap FROM (
                 SELECT n, cid,
                        row_number() OVER (ORDER BY n, cid) AS rn
                 FROM sizes) s, msz
               WHERE s.rn = CAST(ceil(3.0 * msz.m / 4) AS BIGINT)),
    over AS MATERIALIZED (SELECT s.cid FROM sizes s, caprow c WHERE s.n > c.cap),
    ranks AS MATERIALIZED (SELECT cid, row_number() OVER (ORDER BY cid) - 1 AS cr
              FROM over),
    basec AS MATERIALIZED (SELECT max(cid) + 1 AS b FROM cent),
    mem AS MATERIALIZED (SELECT a.cid, a.vec_id, e.embedding
            FROM a_flat a
            JOIN embeddings e USING (vec_id)
            JOIN over o ON o.cid = a.cid),
    {_csplit_sub_ctes()},
    movedq AS MATERIALIZED (SELECT nm.new_cid, f.vec_id
               FROM spfa f JOIN newmap nm
                 ON nm.cid = f.cid AND nm.sub = f.sub),
    post_sizes AS MATERIALIZED (
      SELECT s.cid, s.n FROM sizes s
      WHERE s.cid NOT IN (SELECT cid FROM over)
      UNION ALL
      SELECT new_cid, count(*) FROM movedq GROUP BY new_cid)
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_corpus,
           CAST({_K_CELLS_SQL} AS BIGINT) AS k_derived,
           CAST((SELECT count(*) FROM sizes) AS BIGINT) AS n_cells_before,
           CAST((SELECT cap FROM caprow) AS BIGINT) AS cap,
           CAST((SELECT count(*) FROM over) AS BIGINT) AS cells_split,
           CAST((SELECT count(*) FROM newmap) AS BIGINT) AS cells_added,
           CAST((SELECT count(*) FROM sizes)
                - (SELECT count(*) FROM over)
                + (SELECT count(*) FROM newmap) AS BIGINT) AS n_cells_after,
           CAST((SELECT count(*) FROM movedq) AS BIGINT) AS rows_moved,
           CAST((SELECT count(*) FROM movedq) AS BIGINT) AS dead_rows,
           CAST((SELECT max(n) FROM sizes) AS BIGINT) AS max_before,
           CAST((SELECT max(n) FROM post_sizes) AS BIGINT) AS max_after,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT)
             AS rows_after_compact
    """,
    doc="Cell-split rebalance — the index-MAINTENANCE verb between "
        "day-2 ingest and a full O(n·k) retrain (ivf_state."
        "split_oversized): day-2 ingests follow the data, not the "
        "quantizer, so a drifting corpus piles new vectors into a few "
        "hot cells, and an oversized cell is an oversized probe — "
        "serving cost is the sum of probed cell sizes (the "
        "hot-partition shape of skew). The fix is localized: per "
        "oversized cell a deterministic 2-means over ONLY that cell's "
        "members (seeds = two lowest vec_ids, fixed iterations, "
        "DECIMAL-exact means — the Lloyd discipline), members move to "
        "two fresh cids, cost O(moved·2·iters) regardless of corpus "
        "size. Writes are the tombstone (LSM) pattern: append under "
        "new cids, retire the old centroid (the commit point), dead "
        "rows stay invisible to serving (probe ranks only live "
        "centroids) until compact(reclaim=True) drops them in the "
        "rewrite the state needs anyway. The chart pins the PHYSICAL "
        "table state cross-engine: split set (size > the discrete-p75 "
        "cap), per-cell sub-trainers, fresh-cid allocation, moved-row "
        "count measured off the real bucketed table, dead-row count "
        "(tombstones = moved originals), max cell size before/after, "
        "and the post-reclaim row count returning to exactly "
        "n_corpus. The oracle replays assignment, quantile, every "
        "sub-trainer and the allocator, so a drift in any of them — "
        "or a dead row surviving reclaim — flips the hash.",
)
def ann_cell_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _csplit_maint(spark, sf_dir, _csplit_build(spark, sf_dir))


# --- cell-merge rebalance: the symmetric maintenance verb --------------


def _cos_cc_sql(a: str, b: str) -> str:
    """cos(double-list a.c, double-list b.c) — centroid-vs-centroid,
    explicit sums (the _sum_sql discipline)."""
    num = _sum_sql(f"{a}.c[{{i}}] * {b}.c[{{i}}]", DIM)
    na = "sqrt(" + _sum_sql(f"{a}.c[{{i}}] * {a}.c[{{i}}]", DIM) + ")"
    nb = "sqrt(" + _sum_sql(f"{b}.c[{{i}}] * {b}.c[{{i}}]", DIM) + ")"
    return f"{num} / ({na} * {nb})"


def _cmerge_floor(spark: SparkSession, sf_dir: str) -> int:
    """The chart's deterministic merge threshold: the cell size at
    ascending rank ⌈m/4⌉ (discrete p25, ties by cid) — cells strictly
    below it merge. Non-vacuous at every driver SF (3/3/7 cells at
    sf0.001/0.01/0.1). Production passes an explicit occupancy floor
    (e.g. a fraction of the mean) instead; the quantile is chart
    policy. k-scale frames throughout."""
    sizes = (
        _train_cell_asg(spark, sf_dir)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = sizes.count()
    r = (m + 3) // 4  # == ceil(m/4), integer-exact
    return (
        sizes.withColumn(
            "rn", F.row_number().over(Window.orderBy("n", "cid"))
        )
        .filter(F.col("rn") == r)
        .collect()[0]["n"]
    )


def _cmerge_build(spark: SparkSession, sf_dir: str) -> str:
    """The hermetic day-1 state the merge chart maintains (the
    _csplit_build twin; bench phase cmerge.build)."""
    import hashlib

    name = "cmerge_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return _memo_flat_state(spark, sf_dir, name)


def _cmerge_maint(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """The recurring maintenance leg (the _csplit_maint twin): derive
    the floor, merge the undersized cells, measure the before/after
    geometry from the REAL tables, reclaim, pin the post-compact row
    count."""
    from ..operators import ivf_state

    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    k = _derived_cells(spark, sf_dir)
    floor = _cmerge_floor(spark, sf_dir)
    t_cells = f"{name}_cells"
    t_cent = f"{name}_centroids"

    pre_sizes = (
        spark.table(t_cells).groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    )
    pre = (
        pre_sizes.agg(
            F.count(F.lit(1)).alias("n_cells_before"),
            F.min("n").alias("min_before"),
            F.max("cid").alias("_pre_max_cid"),
        )
        .localCheckpoint(eager=True)
    )
    pre_max_cid = pre.collect()[0]["_pre_max_cid"]

    rep = ivf_state.merge_undersized(spark, name, floor=floor)

    post_cells = spark.table(t_cells)
    live = post_cells.join(
        F.broadcast(spark.table(t_cent).select("cid")), "cid", "left_semi"
    )
    post = (
        post_cells.agg(F.count(F.lit(1)).alias("_total"))
        .crossJoin(live.agg(F.count(F.lit(1)).alias("_live")))
        .crossJoin(
            live.filter(F.col("cid") > pre_max_cid).agg(
                F.count(F.lit(1)).alias("rows_moved")
            )
        )
        .crossJoin(
            live.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.min("n").alias("min_after"))
        )
        .localCheckpoint(eager=True)
    )

    ivf_state.compact(spark, name, reclaim=True)
    after = spark.table(t_cells).agg(
        F.count(F.lit(1)).alias("rows_after_compact")
    )

    return (
        pre.crossJoin(post)
        .crossJoin(after)
        .select(
            F.lit(n).cast("long").alias("n_corpus"),
            F.lit(k).cast("long").alias("k_derived"),
            F.col("n_cells_before").cast("long"),
            F.lit(floor).cast("long").alias("floor"),
            F.lit(rep["cells_merged"]).cast("long").alias("cells_merged"),
            F.lit(rep["merge_targets"]).cast("long").alias("merge_targets"),
            (F.col("n_cells_before") - F.lit(rep["cells_merged"]))
            .cast("long")
            .alias("n_cells_after"),
            F.col("rows_moved").cast("long"),
            (F.col("_total") - F.col("_live")).cast("long").alias("dead_rows"),
            F.col("min_before").cast("long"),
            F.col("min_after").cast("long"),
            F.col("rows_after_compact").cast("long"),
        )
    )


@register(
    "ann_cell_merge",
    oracle=f"""
    WITH {_kmeans_ctes("embeddings")},
    cent AS (SELECT cid, c FROM cent{KMEANS_ITERS}),
    s_all AS (SELECT v.vec_id, c.cid, {_cos_vc_sql('v', 'c')} AS cos
              FROM embeddings v, cent c),
    a_flat AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cos DESC, cid) AS rn
                 FROM s_all) WHERE rn = 1),
    sizes AS (SELECT cid, count(*) AS n FROM a_flat GROUP BY cid),
    msz AS (SELECT count(*) AS m FROM sizes),
    floorrow AS (SELECT n AS fl FROM (
                   SELECT n, cid,
                          row_number() OVER (ORDER BY n, cid) AS rn
                   FROM sizes) s, msz
                 WHERE s.rn = CAST(ceil(msz.m / 4.0) AS BIGINT)),
    under AS (SELECT s.cid FROM sizes s, floorrow f WHERE s.n < f.fl),
    surv AS (SELECT s.cid FROM sizes s, floorrow f WHERE s.n >= f.fl),
    pairing AS (SELECT u_cid, t_cid FROM (
                  SELECT cu.cid AS u_cid, ct.cid AS t_cid,
                         row_number() OVER (
                           PARTITION BY cu.cid
                           ORDER BY {_cos_cc_sql('cu', 'ct')} DESC,
                                    ct.cid) AS rn
                  FROM cent cu
                  JOIN under u ON cu.cid = u.cid,
                       cent ct JOIN surv sv ON ct.cid = sv.cid)
                WHERE rn = 1),
    targets AS (SELECT DISTINCT t_cid FROM pairing),
    ranks AS (SELECT t_cid, row_number() OVER (ORDER BY t_cid) - 1 AS cr
              FROM targets),
    basec AS (SELECT max(cid) + 1 AS b FROM cent),
    newmap AS (SELECT r.t_cid, b.b + r.cr AS new_cid
               FROM ranks r, basec b),
    relabel AS (SELECT p.u_cid AS cid, nm.new_cid
                FROM pairing p JOIN newmap nm USING (t_cid)
                UNION ALL
                SELECT t_cid, new_cid FROM newmap),
    movedq AS (SELECT rl.new_cid, a.vec_id
               FROM a_flat a JOIN relabel rl ON rl.cid = a.cid),
    post_sizes AS (
      SELECT s.cid, s.n FROM sizes s
      WHERE s.cid NOT IN (SELECT cid FROM relabel)
      UNION ALL
      SELECT new_cid, count(*) FROM movedq GROUP BY new_cid)
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_corpus,
           CAST({_K_CELLS_SQL} AS BIGINT) AS k_derived,
           CAST((SELECT count(*) FROM sizes) AS BIGINT) AS n_cells_before,
           CAST((SELECT fl FROM floorrow) AS BIGINT) AS floor,
           CAST((SELECT count(*) FROM under) AS BIGINT) AS cells_merged,
           CAST((SELECT count(*) FROM targets) AS BIGINT) AS merge_targets,
           CAST((SELECT count(*) FROM sizes)
                - (SELECT count(*) FROM under) AS BIGINT) AS n_cells_after,
           CAST((SELECT count(*) FROM movedq) AS BIGINT) AS rows_moved,
           CAST((SELECT count(*) FROM movedq) AS BIGINT) AS dead_rows,
           CAST((SELECT min(n) FROM sizes) AS BIGINT) AS min_before,
           CAST((SELECT min(n) FROM post_sizes) AS BIGINT) AS min_after,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT)
             AS rows_after_compact
    """,
    doc="Cell-merge rebalance — split_oversized's symmetric "
        "maintenance verb (ivf_state.merge_undersized): drift leaves "
        "near-empty cells behind, and a cold cell is a wasted probe — "
        "every query ranks all k live centroids, and a husk that ranks "
        "inside nprobe buys a probe slot's cost for almost no "
        "candidates. Each cell below the floor (here the discrete p25 "
        "of live sizes; production passes an occupancy floor) retires "
        "into its nearest surviving cell: the survivor keeps its "
        "centroid VECTOR (re-fitting geometry is the trainer's job) "
        "but the union takes a FRESH cid — appending under the "
        "survivor's live cid would serve a vector from two cells "
        "between append and commit, exactly the crash-safety window "
        "the tombstone pattern closes. Same write discipline as the "
        "split chart (monotone cid allocation, idempotent append, "
        "staged centroid swap, compact(reclaim=True)); the chart "
        "hash-pins the pairing (nearest-survivor by centroid cosine), "
        "fresh-cid allocation, moved/dead rows measured off the real "
        "bucketed table, min cell size before/after, and the "
        "post-reclaim count returning to exactly n_corpus.",
)
def ann_cell_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cmerge_maint(spark, sf_dir, _cmerge_build(spark, sf_dir))
