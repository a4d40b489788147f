"""Corpus-curation operators — the filter/sample/decontaminate stages a
large-scale training-data pipeline runs between raw scrape and dedup.

All scan-speed column expressions or inverted-index joins; nothing here
shuffles more than one row per (doc, key). Every query has a DuckDB
oracle replaying the identical arithmetic.

  text_gopher_filters   — Gopher-style per-doc quality gates.
  text_repetition_ratio — top-bigram / duplicate-bigram repetition
                          signals (Gopher §A2 repetition heuristics).
  decontam_ngram_overlap— benchmark-contamination flagging via a
                          distinct-n-gram semi-join (broadcast the
                          benchmark set; bloom filter at 100 TB).
  corpus_split_assign   — deterministic hash split (train/val/test)
                          stable under reshuffling and re-runs.
  corpus_shuffle_assign — deterministic global training-order
                          permutation (dense global_step + batch id)
                          via hash-bucketed total-order rank.
  decontam_exact_substring — verbatim benchmark-snippet containment,
                          broadcast snippet set.
  curation_boilerplate_ngrams — per-source most-document-frequent
                          bigrams (boilerplate/template detector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions import texting
from ..operators.iterate import iter_checkpoint
from ..operators.topk import top_k_per_group_sharded
from . import register
from .text import STOPWORDS_SQL, TOKS_SQL

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MWL, MAX_MWL = 3.0, 10.0
MIN_ALPHA_RATIO = 0.8
MIN_STOPWORDS = 2

BENCH_MAX_ID = 20  # doc_id < 20 plays the "benchmark" set
DECONTAM_NGRAM = 5

# split thresholds over a 0..255 bucket: ~80/10/10
TRAIN_LT, VAL_LT = 205, 230


@register(
    "text_gopher_filters",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 CAST(len(toks) AS INT) AS n_words,
                 CAST(list_aggregate(list_transform(toks,
                      x -> CAST(len(x) AS DOUBLE)), 'sum') AS DOUBLE)
                   / len(toks) AS mwl,
                 CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
                      AS DOUBLE) / len(toks) AS alpha_ratio,
                 CAST(len(list_filter(toks, x -> list_contains({STOPWORDS_SQL}, x)))
                      AS INT) AS n_stop
          FROM t WHERE len(toks) > 0)
    SELECT doc_id, n_words, round(mwl, 4) AS mean_word_len,
           round(alpha_ratio, 4) AS alpha_word_ratio, n_stop,
           CAST(CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                      AND mwl BETWEEN {MIN_MWL} AND {MAX_MWL}
                      AND alpha_ratio >= {MIN_ALPHA_RATIO}
                      AND n_stop >= {MIN_STOPWORDS}
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM s
    """,
    doc="Gopher-style quality gates per document: word-count bounds, "
        "mean-word-length bounds, alphabetic-word fraction, stopword "
        "presence — pure column expressions, scan-speed at 100 TB.",
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = texting.tokens(F.col("text"))
    d = docs.filter(texting.has_tokens("text")).select("doc_id", tok.alias("toks"))
    mwl = (
        F.aggregate(F.col("toks"), F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double"))
        / F.size("toks")
    )
    alpha_ratio = (
        F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[a-z]+$"))).cast("double")
        / F.size("toks")
    )
    stop_arr = F.array(*[F.lit(w) for w in texting.EN_STOPWORDS])
    n_stop = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
    s = d.select(
        "doc_id",
        F.size("toks").cast("int").alias("n_words"),
        mwl.alias("mwl"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.cast("int").alias("n_stop"),
    )
    keep = (
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mwl").between(MIN_MWL, MAX_MWL)
        & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
        & (F.col("n_stop") >= MIN_STOPWORDS)
    )
    return s.select(
        "doc_id",
        "n_words",
        F.round("mwl", 4).alias("mean_word_len"),
        F.round("alpha_ratio", 4).alias("alpha_word_ratio"),
        "n_stop",
        F.when(keep, 1).otherwise(0).cast("int").alias("keep"),
    )


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram
          FROM t WHERE len(toks) >= 2),
    c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(n) AS INT) AS n_bigrams,
           CAST(count(*) AS INT) AS n_distinct,
           round(CAST(max(n) AS DOUBLE) / sum(n), 4) AS top_bigram_ratio,
           round(CAST(sum(n) - count(*) AS DOUBLE) / sum(n), 4) AS dup_bigram_ratio
    FROM c GROUP BY doc_id
    """,
    doc="Repetition signals per doc (Gopher-style): share of the single "
        "most frequent bigram, and fraction of duplicated bigram slots. "
        "Explode → two-level hash agg, map-side partial combine — one "
        "shuffle keyed on (doc, gram), linear at corpus scale.",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    grams = texting.word_ngrams(texting.tokens(F.col("text")), 2)
    c = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("n"))
    )
    return c.groupBy("doc_id").agg(
        F.sum("n").cast("int").alias("n_bigrams"),
        F.count("*").cast("int").alias("n_distinct"),
        F.round(F.max("n").cast("double") / F.sum("n"), 4).alias("top_bigram_ratio"),
        F.round((F.sum("n") - F.count("*")).cast("double") / F.sum("n"), 4).alias(
            "dup_bigram_ratio"
        ),
    )


_DISTINCT_GRAMS_SQL = f"""
    SELECT doc_id,
           unnest(list_distinct(CASE WHEN len(toks) >= {DECONTAM_NGRAM}
                THEN list_transform(range(1, len(toks) - {DECONTAM_NGRAM - 2}),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          || ' ' || toks[i+3] || ' ' || toks[i+4])
                ELSE CAST([] AS VARCHAR[]) END)) AS gram
    FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
"""


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH grams AS ({_DISTINCT_GRAMS_SQL}),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < {BENCH_MAX_ID}),
    hits AS (SELECT g.doc_id, g.gram FROM grams g
             JOIN bench b ON g.gram = b.gram
             WHERE g.doc_id >= {BENCH_MAX_ID})
    SELECT doc_id, CAST(count(*) AS INT) AS n_shared_grams
    FROM hits GROUP BY doc_id
    """,
    doc="Benchmark decontamination: flag corpus documents sharing any "
        f"distinct {DECONTAM_NGRAM}-gram with the benchmark set "
        "(doc_id < 20 stands in). Inverted-index semi-join — the "
        "benchmark gram set is small and broadcasts; at 100 TB the "
        "same plan with a bloom filter on the gram key avoids even "
        "the broadcast join for the 99% non-matching grams.",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    sh = F.array_distinct(
        texting.word_ngrams(texting.tokens(F.col("text")), DECONTAM_NGRAM)
    )
    grams = docs.select("doc_id", F.explode(sh).alias("gram"))
    bench = grams.filter(F.col("doc_id") < BENCH_MAX_ID).select("gram").distinct()
    corpus = grams.filter(F.col("doc_id") >= BENCH_MAX_ID)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_shared_grams"))
    )


# --- Bloom-prefiltered decontamination ---------------------------------
# The 100 TB form SCALE.md promises for the broadcast gram set: when
# the benchmark gram set is too large to hash-join comfortably at scan
# speed, an m-bit Bloom filter (a few MB for 10^7 grams) prunes the
# 99%+ non-matching corpus grams BEFORE the join; the exact semi-join
# verify then runs on the survivors only. Bloom filters have NO false
# negatives — identical hash arithmetic on both sides guarantees every
# inserted gram tests positive — so bloom-prefilter + exact-verify is
# EXACTLY the exact decontam, and the oracle below is the exact twin's
# SQL verbatim (the hash-check covers the whole path end-to-end).
# Positions use the Kirsch-Mitzenmacher double-hashing construction:
# one md5 per gram → (h1, h2), pos_i = (h1 + i·h2) mod m, h2 forced
# odd so all residues are reachable with m a power of two.
BLOOM_HASHES = 8
BLOOM_BITS_PER_ITEM = 16  # m = next_pow2(16·|bench|) → fpp ~ 5e-4


def _bloom_positions(gram, m_bits: int):
    h = F.md5(gram)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long").bitwiseOR(
        F.lit(1).cast("long")
    )
    return [
        (h1 + F.lit(i) * h2).bitwiseAND(F.lit(m_bits - 1).cast("long"))
        for i in range(BLOOM_HASHES)
    ]


@register(
    "decontam_bloom",
    oracle=f"""
    WITH grams AS ({_DISTINCT_GRAMS_SQL}),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < {BENCH_MAX_ID}),
    hits AS (SELECT g.doc_id, g.gram FROM grams g
             JOIN bench b ON g.gram = b.gram
             WHERE g.doc_id >= {BENCH_MAX_ID})
    SELECT doc_id, CAST(count(*) AS INT) AS n_shared_grams
    FROM hits GROUP BY doc_id
    """,
    doc="Bloom-prefiltered benchmark decontamination — the scale path "
        "of decontam_ngram_overlap: the benchmark gram set is packed "
        "into an m-bit Bloom filter (m = next_pow2(16·|bench|), 8 "
        "Kirsch-Mitzenmacher positions from one md5) carried as a "
        "single word→bits map row and broadcast; corpus grams test "
        "membership at scan speed and only the survivors (true hits + "
        "~5e-4 false positives) reach the exact semi-join verify. No "
        "false negatives by construction, so the result is EXACTLY the "
        "exact twin's — the oracle IS decontam_ngram_overlap's SQL, "
        "and the driver hash-check covers the bloom arithmetic, the "
        "pruning, and the verify end-to-end. At 100 TB this turns a "
        "corpus-grams×bench hash join into a scan-speed bitmask test "
        "plus a join on the 1% that might match.",
)
def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    _corpus, bench, might = _bloom_survivors(spark, sf_dir)
    return (
        might.select("doc_id", "gram")
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_shared_grams"))
    )


def _bloom_survivors(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(corpus grams, bench grams, bloom survivors) — split out so the
    pruning contract (no false negatives; real pruning) is testable on
    the intermediate, not just through the end-to-end hash."""
    from ..functions.scaling import floor_log2

    docs = spread(table(spark, sf_dir, "documents"))
    sh = F.array_distinct(
        texting.word_ngrams(texting.tokens(F.col("text")), DECONTAM_NGRAM)
    )
    grams = docs.select("doc_id", F.explode(sh).alias("gram"))
    bench = (
        grams.filter(F.col("doc_id") < BENCH_MAX_ID)
        .select("gram")
        .distinct()
        # the bench gram set is consumed three times (count, bloom
        # build, exact verify) and is the SMALL fixed artifact of this
        # operator — materialize once instead of re-tokenizing the
        # corpus per consumer (measured 8.0 s -> scan-bound without)
        .localCheckpoint(eager=True)
    )
    corpus = grams.filter(F.col("doc_id") >= BENCH_MAX_ID)

    # build: |bench| counted once (metadata-scale, the corpus_count
    # discipline); m a power of two so mod is a mask
    n_bench = bench.count()
    m_bits = 1 << max(10, floor_log2(max(1, BLOOM_BITS_PER_ITEM * n_bench - 1)) + 1)
    pos = _bloom_positions(F.col("gram"), m_bits)
    set_words = (
        bench.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            F.shiftright("p", 6).alias("word"),
            # variable shift count -> SQL form (the pyspark wrapper
            # takes a literal only)
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    # DENSE word array, not a map: Catalyst's element_at on MapData is
    # a LINEAR scan per lookup — 8 probes × corpus grams × |map| read
    # 6.8 s at sf0.1; an array index is O(1). Built distributed: every
    # word slot left-joins its bits (0 when no bench gram set a bit
    # there), then one ordered collect into the single broadcast row.
    bloom = (
        spark.range(m_bits >> 6)
        .select(F.col("id").alias("word"))
        .join(set_words, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
        .groupBy()
        .agg(
            F.sort_array(F.collect_list(F.struct("word", "bits"))).alias("pp")
        )
        .select(F.col("pp.bits").alias("bf"))
    )

    # probe: scan-speed membership test, AND over the 8 positions;
    # element_at on a missing word is null -> coalesce 0 -> miss.
    # (pyspark's shiftright wrapper takes a literal bit count, so the
    # variable-shift test goes through the SQL function form, which
    # accepts expressions for both operands)
    cpos = _bloom_positions(F.col("gram"), m_bits)
    probed = corpus.crossJoin(F.broadcast(bloom))
    for i, p in enumerate(cpos):
        probed = probed.withColumn(f"_w{i}", F.shiftright(p, 6)).withColumn(
            f"_b{i}", p.bitwiseAND(F.lit(63)).cast("int")
        )
    cond = " AND ".join(
        # 1-based array index; every word < m/64 exists by construction
        f"(shiftright(element_at(bf, CAST(_w{i} + 1 AS INT)), _b{i}) & 1) = 1"
        for i in range(BLOOM_HASHES)
    )
    might = probed.filter(F.expr(cond))
    return corpus, bench, might


@register(
    "curation_pipeline_e2e",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, text, {TOKS_SQL} AS toks FROM documents),
    q AS (SELECT doc_id, source, text, toks,
                 CAST(len(toks) AS INT) AS n_words,
                 CAST(list_aggregate(list_transform(toks,
                      x -> CAST(len(x) AS DOUBLE)), 'sum') AS DOUBLE)
                   / len(toks) AS mwl,
                 CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
                      AS DOUBLE) / len(toks) AS alpha_ratio,
                 CAST(len(list_filter(toks, x -> list_contains({STOPWORDS_SQL}, x)))
                      AS INT) AS n_stop
          FROM t WHERE len(toks) > 0),
    kept AS (SELECT * FROM q
             WHERE n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
               AND mwl BETWEEN {MIN_MWL} AND {MAX_MWL}
               AND alpha_ratio >= {MIN_ALPHA_RATIO}
               AND n_stop >= {MIN_STOPWORDS}),
    deduped AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
    final AS (SELECT k.doc_id, k.source, k.n_words,
                     md5(CAST(k.doc_id AS VARCHAR)) AS h
              FROM kept k JOIN deduped d ON k.doc_id = d.doc_id),
    split AS (SELECT doc_id, source, n_words,
                     CASE WHEN 16 * (strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
                             + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1)
                             < {TRAIN_LT} THEN 'train'
                          WHEN 16 * (strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
                             + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1)
                             < {VAL_LT} THEN 'val'
                          ELSE 'test' END AS split
              FROM final)
    SELECT split, source,
           CAST(count(*) AS INT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens
    FROM split GROUP BY split, source
    """,
    doc="The training-data pipeline end-to-end as ONE declarative plan: "
        "quality-gate → exact-dedup (keep lowest id per digest) → "
        "deterministic split → per-(split, source) doc/token budget. "
        "Composing the stages declaratively (instead of materializing "
        "between them) lets Catalyst collapse the whole thing into a "
        "scan → project → two hash-agg/join stages — the filters run "
        "inside the parquet scan pass, and nothing writes to storage "
        "until the end. The shape every curation run at 100 TB wants.",
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = texting.tokens(F.col("text"))
    d = docs.filter(texting.has_tokens("text")).select(
        "doc_id", "source", "text", tok.alias("toks")
    )
    mwl = (
        F.aggregate(F.col("toks"), F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double"))
        / F.size("toks")
    )
    alpha_ratio = (
        F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[a-z]+$"))).cast("double")
        / F.size("toks")
    )
    stop_arr = F.array(*[F.lit(w) for w in texting.EN_STOPWORDS])
    n_stop = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
    q = d.select(
        "doc_id",
        "source",
        "text",
        F.size("toks").cast("int").alias("n_words"),
        mwl.alias("mwl"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.cast("int").alias("n_stop"),
    )
    kept = q.filter(
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mwl").between(MIN_MWL, MAX_MWL)
        & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
        & (F.col("n_stop") >= MIN_STOPWORDS)
    )
    # keep-lowest-id per digest as a window (one full-row shuffle on
    # the digest) rather than groupBy-min + join-back (a slim shuffle
    # PLUS a second full-row shuffle and a second scan)
    wdig = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    final = (
        kept.withColumn("rn", F.row_number().over(wdig))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = final.select(
        "source",
        "n_words",
        F.when(bucket < TRAIN_LT, "train")
        .when(bucket < VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )
    return split.groupBy("split", "source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_tokens"),
    )


# tiny per-language stopword dimension — at scale this is a real table
# (hundreds of languages × top-k stopwords) and the join shape is
# identical: broadcast the dimension, inverted join on the token
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": texting.EN_STOPWORDS,
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "du", "wir", "ein"),
    "fr": ("le", "la", "les", "et", "ne", "pas", "est", "je", "tu", "un"),
}


@register(
    "text_lang_id_multi",
    oracle=f"""
    WITH sw(lang, word) AS (VALUES {", ".join(
        f"('{lang}', '{w}')" for lang, ws in sorted(LANG_STOPWORDS.items()) for w in ws
    )}),
    t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    base AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    inv AS (SELECT doc_id, n, unnest(toks) AS w FROM base),
    hits AS (SELECT doc_id, s.lang, count(*) AS c, max(n) AS n
             FROM inv JOIN sw s ON w = s.word GROUP BY 1, 2),
    best AS (SELECT doc_id, lang, c, n,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY c DESC, lang) AS rn
             FROM hits)
    SELECT b.doc_id,
           coalesce(x.lang, 'und') AS pred_lang,
           round(coalesce(CAST(x.c AS DOUBLE) / x.n, 0.0), 4) AS score
    FROM base b LEFT JOIN (SELECT * FROM best WHERE rn = 1) x USING (doc_id)
    """,
    doc="Multi-language lang-ID: a broadcast (lang, stopword) dimension "
        "inverted-joins the token stream; per-(doc, lang) hit densities "
        "argmax to a prediction, zero-hit docs fall back to 'und'. The "
        "production shape of text_lang_id's single-language heuristic — "
        "growing the language inventory changes the dimension table, "
        "not the plan.",
)
def text_lang_id_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    tok = texting.tokens(F.col("text"))
    base = docs.filter(texting.has_tokens("text")).select("doc_id", tok.alias("toks"))
    base = base.select("doc_id", "toks", F.size("toks").alias("n"))
    sw = spark.createDataFrame(
        [(lang, w) for lang, ws in sorted(LANG_STOPWORDS.items()) for w in ws],
        "lang string, word string",
    )
    inv = base.select("doc_id", "n", F.explode("toks").alias("w"))
    hits = (
        inv.join(F.broadcast(sw), inv.w == sw.word)
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("c"), F.max("n").alias("n"))
    )
    wb = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "lang")
    best = hits.withColumn("rn", F.row_number().over(wb)).filter(F.col("rn") == 1)
    return base.join(
        best.select("doc_id", "lang", "c", F.col("n").alias("bn")), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("und")).alias("pred_lang"),
        F.round(
            F.coalesce(F.col("c").cast("double") / F.col("bn"), F.lit(0.0)), 4
        ).alias("score"),
    )


# 0..255 content-independent bucket of the stable id — the one
# definition shared by split assignment and mixture sampling, so a
# future hash swap (xxhash64 at scale) cannot desynchronize them.
_BUCKET_FROM_H_SQL = (
    "CAST(16 * (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) "
    "+ (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) AS INT)"
)


def _md5_bucket():
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")


@register(
    "corpus_split_assign",
    oracle=f"""
    WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
    b AS (SELECT doc_id, {_BUCKET_FROM_H_SQL} AS bucket
          FROM h)
    SELECT doc_id, bucket,
           CASE WHEN bucket < {TRAIN_LT} THEN 'train'
                WHEN bucket < {VAL_LT} THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="Deterministic train/val/test assignment by content-independent "
        "hash of the stable id — reproducible across runs, partitions "
        "and cluster sizes (never use rand() or row position for "
        "splits at scale). ~80/10/10 on a 0..255 md5 bucket.",
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    b = docs.select("doc_id", _md5_bucket().alias("bucket"))
    return b.select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < TRAIN_LT, "train")
        .when(F.col("bucket") < VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


# --- PII redaction ---------------------------------------------------
# The synthetic corpus carries no PII, so the query deterministically
# plants PII-shaped tokens (pure function of doc_id, identical in the
# oracle) and then detects/redacts them. The detector/redactor is the
# operator under test; the planting is the harness.

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_AUG_SQL = """
    text
    || CASE WHEN doc_id % 5 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' call (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            ELSE '' END
"""


@register(
    "pii_redact",
    oracle=f"""
    WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents),
    c AS (SELECT doc_id,
                 CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS INT) AS n_emails,
                 CAST(len(regexp_extract_all(aug, '{PHONE_RE}')) AS INT) AS n_phones,
                 CAST(len(regexp_extract_all(aug, '{IP_RE}')) AS INT) AS n_ips,
                 md5(regexp_replace(regexp_replace(regexp_replace(aug,
                     '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{PHONE_RE}', '<PHONE>', 'g'),
                     '{IP_RE}', '<IP>', 'g')) AS redacted_md5
          FROM a)
    SELECT doc_id, n_emails, n_phones, n_ips,
           CAST(CASE WHEN n_emails + n_phones + n_ips > 0
                THEN 1 ELSE 0 END AS INT) AS pii_flag,
           redacted_md5
    FROM c
    """,
    doc="PII detection + redaction (emails, NANP phones, IPv4) as pure "
        "regexp column expressions — scan-speed, JVM codegen, zero "
        "shuffle; the redacted text is md5-fingerprinted so the oracle "
        "verifies the exact redacted bytes, not just the counts. At "
        "100 TB this runs in the same single pass as the other quality "
        "signals.",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call (555) 123-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(""),
    )
    a = docs.select("doc_id", aug.alias("aug"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IP_RE,
        "<IP>",
    )
    # the flag derives from the counts already computed — three extra
    # full-text rlike scans per row would double the regex work
    c = a.select(
        "doc_id",
        F.regexp_count(F.col("aug"), F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("aug"), F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(F.col("aug"), F.lit(IP_RE)).cast("int").alias("n_ips"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )
    return c.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.when(F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0, 1)
        .otherwise(0)
        .cast("int")
        .alias("pii_flag"),
        "redacted_md5",
    )


PACK_CTX = 2048  # tokens per training context window
PACK_SHARDS = 16  # parallelism within one source's packing window


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len({TOKS_SQL}) AS INT) AS n_tokens,
                      CAST((16 * (strpos('0123456789abcdef',
                                substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                            + (strpos('0123456789abcdef',
                                substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
                           % {PACK_SHARDS} AS INT) AS shard
               FROM documents),
    w AS (SELECT doc_id, source, shard, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source, shard
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
          FROM t WHERE n_tokens > 0)
    SELECT doc_id, source, shard, n_tokens,
           CAST((cum - n_tokens) // {PACK_CTX} AS BIGINT) AS pack_id,
           CAST((cum - n_tokens) % {PACK_CTX} AS INT) AS pack_offset
    FROM w
    """,
    doc=f"Greedy sequence packing for training: concatenate each "
        f"(source, shard)'s documents (stable doc_id order) and split "
        f"the token stream into {PACK_CTX}-token context windows; every "
        "doc gets the (shard, pack_id, offset) where it starts. The "
        f"shard — md5(doc_id) bucket % {PACK_SHARDS}, content-"
        "independent and replayed verbatim by the oracle — widens the "
        "window key to (source, shard) so no single source serializes "
        "through one task at 100 TB: packing only needs per-shard "
        "contiguity, a pack is addressed (source, shard, pack_id), and "
        "the cost is at most one partially-filled tail pack per shard. "
        "One shuffle, properly partitioned.",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(texting.tokens(F.col("text"))).cast("int")
    # has_tokens ⟺ n_tokens > 0 and stays a scan-level rlike; a second
    # filter(n_tokens > 0) would be pushed below the Project and
    # re-evaluate the tokenizer per row (texting.has_tokens docstring)
    t = docs.filter(texting.has_tokens("text")).select(
        "doc_id",
        "source",
        (_md5_bucket() % PACK_SHARDS).cast("int").alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = Window.partitionBy("source", "shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_tokens").over(w).cast("long")
    start = (cum - F.col("n_tokens")).alias("start")
    return t.select("doc_id", "source", "shard", "n_tokens", start).select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        F.floor(F.col("start") / PACK_CTX).cast("long").alias("pack_id"),
        (F.col("start") % PACK_CTX).cast("int").alias("pack_offset"),
    )


# Target mixture: upsample-by-keeping-all for low source ids, thin the
# long tail. Acceptance threshold over the same 0..255 md5 bucket the
# split assignment uses; weight = fraction of the source kept.
MIXTURE_DEFAULT = 64  # keep 25% of unlisted sources
MIXTURE_WEIGHTS = {"src0": 256, "src1": 192, "src2": 128, "src3": 96}

_MIX_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {t}" for s, t in sorted(MIXTURE_WEIGHTS.items()))
    + f" ELSE {MIXTURE_DEFAULT} END"
)


@register(
    "corpus_mixture_sample",
    oracle=f"""
    WITH h AS (SELECT doc_id, source,
                      md5(CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    b AS (SELECT doc_id, source, {_BUCKET_FROM_H_SQL} AS bucket
          FROM h)
    SELECT doc_id, source, bucket,
           CAST({_MIX_CASE} AS INT) AS threshold,
           CAST(CASE WHEN bucket < {_MIX_CASE} THEN 1 ELSE 0 END AS INT) AS sampled
    FROM b
    """,
    doc="Deterministic source-mixture sampling: each source gets an "
        "acceptance threshold over a content-independent md5 bucket of "
        "the stable id, thinning over-represented sources to a target "
        "mixture. Same reproducibility contract as the split assigner "
        "— no rand(), stable under repartitioning, re-runs and "
        "cluster-size changes; scan-speed, zero shuffle.",
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    thr = F.lit(MIXTURE_DEFAULT)
    for s, t in sorted(MIXTURE_WEIGHTS.items(), reverse=True):
        thr = F.when(F.col("source") == s, t).otherwise(thr)
    b = docs.select(
        "doc_id", "source", _md5_bucket().alias("bucket"), thr.cast("int").alias("threshold")
    )
    return b.select(
        "doc_id",
        "source",
        "bucket",
        "threshold",
        F.when(F.col("bucket") < F.col("threshold"), 1).otherwise(0).cast("int").alias("sampled"),
    )


GROUP_SAMPLE_K = 5


@register(
    "corpus_group_sample",
    oracle=f"""
    WITH h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    r AS (SELECT doc_id, source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                   AS rk
          FROM h)
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= {GROUP_SAMPLE_K}
    """,
    doc=f"Deterministic uniform sample of {GROUP_SAMPLE_K} docs per "
        "source: the k smallest md5(doc_id) values per group — an "
        "order statistic over a content-independent hash, so the "
        "sample is uniform, stable across runs/partitionings, and "
        "composable (k' < k is a prefix). Two-stage exact top-k: "
        "stage 1 keeps ≤ k rows per (source, md5-shard) behind a "
        "partitioned window, stage 2 merges the ≤ k·shards survivors "
        "per source — the union of per-shard top-ks contains the "
        "global top-k, so the result is identical to the one-window "
        "form (same oracle) while no source ever streams through a "
        "single task at full width.",
)
def corpus_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    ranked = top_k_per_group_sharded(
        h, ["source"], [F.col("h"), F.col("doc_id")], GROUP_SAMPLE_K,
        shard_of="doc_id", rank_col="rk", shards=PACK_SHARDS,
    )
    return ranked.select("doc_id", "source", F.col("rk").cast("int").alias("rk"))


@register(
    "curation_source_profile",
    oracle="""
    WITH d AS (SELECT source, lang, n_chars,
                      CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
                        AS len_ok,
                      md5(text) AS digest
               FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars,
           CAST(sum(len_ok) AS BIGINT) AS n_len_ok,
           CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS n_exact_dups
    FROM d GROUP BY source
    """,
    doc="Per-source curation dashboard: doc counts, language spread, "
        "size stats, length-gate pass count, and within-source exact-"
        "duplicate count (n_docs - distinct content digests). One "
        "partial/final hash agg keyed on source — the distinct "
        "aggregates expand per-key but sources are few, so the "
        "reduction happens map-side and the shuffle carries one row "
        "per (source, lang/digest) partial. The mean uses integer "
        "sum / count (bit-identical across partial-agg orders).",
)
def curation_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.when(F.col("n_chars").between(100, 5000), 1).otherwise(0).alias("len_ok"),
        F.md5("text").alias("digest"),
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*"), 2
        ).alias("avg_chars"),
        F.sum("len_ok").alias("n_len_ok"),
        (F.count("*") - F.countDistinct("digest")).alias("n_exact_dups"),
    )


# --- training-order shuffle ------------------------------------------

SHUFFLE_SEED = "shuf1:"
SHUFFLE_BATCH = 32


@register(
    "corpus_shuffle_assign",
    oracle=f"""
    WITH k AS (SELECT doc_id,
                      md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    r AS (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
                   AS global_step
          FROM k)
    SELECT doc_id, global_step,
           CAST(global_step // {SHUFFLE_BATCH} AS INT) AS batch_id
    FROM r
    """,
    doc="Deterministic global training-order shuffle: every document "
        "gets a dense global_step = its rank under a content-keyed md5 "
        "permutation, plus the training batch that step falls in. The "
        "rank is a TOTAL order with no global window: the bucket fed "
        "to operators.ids.dense_ids is the leading hex byte of the "
        "SAME md5 key the rows are ordered by, so (bucket, key) order "
        "IS key order — rank within 256 parallel buckets + broadcast "
        "prefix-sum offsets. Reproducible across runs, partitionings "
        "and cluster sizes (never rand() or zipWithIndex); a new epoch "
        "is a new seed string. The oracle replays the permutation with "
        "a plain row_number at test scale.",
)
def corpus_shuffle_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ids import dense_ids

    docs = table(spark, sf_dir, "documents")
    k = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string"))).alias("h"),
    )
    # leading hex byte of h: monotone prefix of the order key, so the
    # dense_ids order (bucket, h, doc_id) is exactly (h, doc_id)
    hex_bucket = F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    ranked = dense_ids(
        k, ["h", "doc_id"], bucket_expr=hex_bucket, id_col="_step1"
    )
    return ranked.select(
        "doc_id",
        (F.col("_step1") - 1).alias("global_step"),
        F.floor((F.col("_step1") - 1) / SHUFFLE_BATCH).cast("int").alias("batch_id"),
    )


# --- exact-substring decontamination ---------------------------------

SNIP_MOD = 97     # doc_id % 97 == 0 plays the benchmark set
SNIP_FROM, SNIP_LEN = 4, 6  # words 4..9 of the benchmark doc


@register(
    "decontam_exact_substring",
    oracle=f"""
    WITH norm AS (SELECT doc_id,
                         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
                  FROM documents),
    tk AS (SELECT doc_id, {{toks}} AS toks FROM documents),
    bench AS (SELECT doc_id AS bench_id,
                     array_to_string(toks[{SNIP_FROM}:{SNIP_FROM + SNIP_LEN - 1}],
                                     ' ') AS snip
              FROM tk
              WHERE doc_id % {SNIP_MOD} = 0
                AND len(toks) >= {SNIP_FROM + SNIP_LEN - 1})
    SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM norm n JOIN bench b ON contains(n.t, b.snip)
    GROUP BY 1
    """.format(toks=TOKS_SQL),
    doc="Exact-substring benchmark decontamination — the strict "
        "complement of decontam_ngram_overlap's n-gram recall net: "
        "flag every document whose whitespace-normalized text contains "
        "a verbatim benchmark snippet. Two stages, both scale-safe in "
        "snippet count: (1) an anchor-gram equi-join prefilter — a "
        "substring match of the k-word snippet must contain its k-2 "
        "INTERIOR words as complete space-delimited tokens of the "
        "normalized text (only the first/last snippet word can "
        "straddle a word boundary), so joining each doc's distinct "
        "interior-length word grams against the broadcast (anchor → "
        "snippet) table yields a candidate set with perfect recall; "
        "(2) a verbatim instr() verify on candidate (doc, snippet) "
        "pairs only. Cost is O(corpus tokens) for the anchor build + "
        "O(candidates) for the verify — never docs × snippets. The "
        "deterministic snippet harness (words 4..9 of every 97th doc) "
        "is replayed verbatim by the oracle, which keeps the direct "
        "containment-join form: same answer, fixture-scale only.",
)
def decontam_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("t"),
    )
    toks = texting.tokens(F.col("text"))
    anchor_len = SNIP_LEN - 2
    bench = (
        docs.filter(F.col("doc_id") % SNIP_MOD == 0)
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= SNIP_FROM + SNIP_LEN - 1)
        .select(
            F.array_join(F.slice("toks", SNIP_FROM, SNIP_LEN), " ").alias("snip"),
            F.array_join(
                F.slice("toks", SNIP_FROM + 1, anchor_len), " "
            ).alias("anchor"),
        )
    )
    # t is already single-spaced and lowercased, so split(" ") IS its
    # token stream; distinct interior-length grams are the anchor keys
    wt = F.split(F.col("t"), " ")
    anchors = norm.select(
        "doc_id",
        F.explode(
            F.array_distinct(texting.word_ngrams(wt, anchor_len))
        ).alias("anchor"),
    )
    cand = anchors.join(F.broadcast(bench), "anchor").select("doc_id", "snip")
    hits = cand.join(norm, "doc_id").filter(F.instr(F.col("t"), F.col("snip")) > 0)
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_hits"))


# --- per-source boilerplate detection --------------------------------

BOILER_TOPK = 3


@register(
    "curation_boilerplate_ngrams",
    oracle=f"""
    WITH tk AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
    bg AS (SELECT doc_id, source,
                  unnest(list_distinct(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1]))) AS gram
           FROM tk WHERE len(toks) >= 2),
    cnt AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS n_docs
            FROM bg GROUP BY 1, 2),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS src_docs
            FROM documents GROUP BY 1),
    rk AS (SELECT source, gram, n_docs,
                  CAST(row_number() OVER (PARTITION BY source
                                          ORDER BY n_docs DESC, gram)
                       AS INT) AS rk
           FROM cnt)
    SELECT r.source, r.rk, r.gram, r.n_docs,
           round(CAST(r.n_docs AS DOUBLE) / t.src_docs, 4) AS doc_ratio
    FROM rk r JOIN tot t USING (source) WHERE r.rk <= {BOILER_TOPK}
    """,
    doc="CCNet-style boilerplate detection: per source, the bigrams "
        "present in the most documents (each doc votes each gram once "
        "— list_distinct before the count), with their document "
        "ratio. Shape at 100 TB: explode is linear in tokens, the "
        "(source, gram) count is a partial/final hash agg, and the "
        "top-k is the two-stage sharded form (operators.topk."
        "top_k_per_group_sharded): per-(source, md5(gram)-shard) "
        "pre-top-k, then a merge over ≤ k·shards survivors per source "
        "— a source's full gram table (which grows with its corpus "
        "slice, pre-agg or not) never streams through one task. The "
        "union of per-shard top-ks contains the global top-k, so the "
        "oracle replays it with a plain rank. Per-source doc totals "
        "broadcast; ties broken by gram text so the rank is "
        "deterministic under any partitioning.",
)
def curation_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    toks = texting.tokens(F.col("text"))
    tk = docs.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat(
                F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
            ),
        )
    )
    bg = tk.select("doc_id", "source", F.explode(grams).alias("gram"))
    cnt = bg.groupBy("source", "gram").agg(F.count("*").alias("n_docs"))
    tot = docs.groupBy("source").agg(F.count("*").alias("src_docs"))
    rk = top_k_per_group_sharded(
        cnt, ["source"], [F.desc("n_docs"), F.asc("gram")], BOILER_TOPK,
        shard_of="gram", rank_col="rk",
    ).withColumn("rk", F.col("rk").cast("int"))
    return rk.join(F.broadcast(tot), "source").select(
        "source",
        "rk",
        "gram",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("src_docs"), 4).alias(
            "doc_ratio"
        ),
    )


# --- quality classifier inference ------------------------------------

# Fixed logistic weights over the scan-speed quality signals — the
# fastText/classifier-inference stage of a real curation pipeline,
# with the learned weights supplied as literals (inference is the
# Spark-side operator; training happens offline). Deterministic, so
# the oracle replays the full score arithmetic.
QC_W = {
    "bias": -2.0,
    "alpha_ratio": 2.5,
    "stopword_ratio": 6.0,
    "mwl_centered": -0.8,   # |mean word len - 6|
    "len_ok": 1.2,
}
QC_KEEP_P = 0.5


@register(
    "curation_quality_classifier",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {TOKS_SQL} AS toks,
                      strlen(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                        AS n_alpha,
                      strlen(text) AS n_raw
               FROM documents),
    f AS (SELECT doc_id,
                 CAST(n_alpha AS DOUBLE) / n_raw AS alpha_ratio,
                 CAST(len(list_filter(toks,
                      x -> list_contains({STOPWORDS_SQL}, x))) AS DOUBLE)
                   / len(toks) AS stopword_ratio,
                 abs(CAST(list_aggregate(list_transform(toks,
                      x -> CAST(len(x) AS DOUBLE)), 'sum') AS DOUBLE)
                   / len(toks) - 6.0) AS mwl_centered,
                 CASE WHEN n_chars BETWEEN 100 AND 5000
                      THEN 1.0 ELSE 0.0 END AS len_ok
          FROM t WHERE len(toks) > 0),
    z AS (SELECT doc_id,
                 {QC_W["bias"]} + {QC_W["alpha_ratio"]} * alpha_ratio
                 + {QC_W["stopword_ratio"]} * stopword_ratio
                 + {QC_W["mwl_centered"]} * mwl_centered
                 + {QC_W["len_ok"]} * len_ok AS z
          FROM f)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-z)), 6) AS p_keep,
           CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= {QC_KEEP_P}
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM z
    """,
    doc="Quality-classifier INFERENCE at scan speed: a logistic model "
        "over the per-doc quality signals (alpha ratio, stopword "
        "density, centered mean word length, length gate) with the "
        "learned weights as literals — the fastText-classifier stage "
        "of a real curation pipeline, minus the offline training. "
        "Pure column expressions, zero shuffle, single pass; swapping "
        "models means swapping a weight vector, not a plan. The "
        "sigmoid is computed identically in both engines and rounded "
        "to 6 dp; the keep decision compares the unrounded score so "
        "the threshold is exact.",
)
def curation_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = texting.tokens(F.col("text"))
    t = docs.filter(texting.has_tokens("text")).select(
        "doc_id",
        "n_chars",
        tok.alias("toks"),
        F.octet_length(F.regexp_replace("text", "[^a-zA-Z ]", "")).alias("n_alpha"),
        F.octet_length("text").alias("n_raw"),
    )
    stop_arr = F.array(*[F.lit(w) for w in texting.EN_STOPWORDS])
    mwl = (
        F.aggregate(F.col("toks"), F.lit(0.0), lambda a, x: a + F.length(x).cast("double"))
        / F.size("toks")
    )
    f = t.select(
        "doc_id",
        (F.col("n_alpha").cast("double") / F.col("n_raw")).alias("alpha_ratio"),
        (
            F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
            .cast("double") / F.size("toks")
        ).alias("stopword_ratio"),
        F.abs(mwl - 6.0).alias("mwl_centered"),
        F.when(F.col("n_chars").between(100, 5000), 1.0).otherwise(0.0).alias("len_ok"),
    )
    z = (
        F.lit(QC_W["bias"])
        + QC_W["alpha_ratio"] * F.col("alpha_ratio")
        + QC_W["stopword_ratio"] * F.col("stopword_ratio")
        + QC_W["mwl_centered"] * F.col("mwl_centered")
        + QC_W["len_ok"] * F.col("len_ok")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return f.select(
        "doc_id",
        F.round(p, 6).alias("p_keep"),
        F.when(p >= QC_KEEP_P, 1).otherwise(0).cast("int").alias("keep"),
    )


# --- quality classifier TRAINING --------------------------------------

# Distributed logistic-regression training of the quality model itself
# — the offline step curation_quality_classifier's literal weights
# stand in for, now done in-engine: full-batch gradient descent with a
# FIXED iteration count, the gradient a partial/final hash agg with
# DECIMAL-exact component sums (partial-agg order cannot change a
# bit), the 5-weight vector broadcast back onto the scan each round —
# the exact discipline of ann_ivf_kmeans, so a DuckDB oracle replays
# the entire training loop and the learned weights are hash-checked.
# Label: lang == 'en' (predicting a held-out signal from the quality
# features, the weak-supervision shape of a fastText quality model).
QT_ITERS = 5
QT_LR = 0.5
QT_FEATURES = ["bias", "alpha_ratio", "stopword_ratio", "mwl_centered", "len_ok"]


def _qt_features_sql() -> str:
    return f"""qt AS (SELECT doc_id, n_chars, {TOKS_SQL} AS toks,
                      strlen(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                        AS n_alpha,
                      strlen(text) AS n_raw,
                      CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
               FROM documents),
    qf AS (SELECT doc_id, y,
                 1.0 AS x0,
                 CAST(n_alpha AS DOUBLE) / n_raw AS x1,
                 CAST(len(list_filter(toks,
                      x -> list_contains({STOPWORDS_SQL}, x))) AS DOUBLE)
                   / len(toks) AS x2,
                 abs(CAST(list_aggregate(list_transform(toks,
                      x -> CAST(len(x) AS DOUBLE)), 'sum') AS DOUBLE)
                   / len(toks) - 6.0) AS x3,
                 CASE WHEN n_chars BETWEEN 100 AND 5000
                      THEN 1.0 ELSE 0.0 END AS x4
          FROM qt WHERE len(toks) > 0)"""


def _qt_gd_ctes() -> str:
    """Unrolled gradient-descent CTE chain: qw0..qw{QT_ITERS}."""
    nf = len(QT_FEATURES)
    parts = [
        "qw0 AS (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(nf))
        + ")"
    ]
    for it in range(1, QT_ITERS + 1):
        z = " + ".join(f"w.w{j} * f.x{j}" for j in range(nf))
        grads = ", ".join(
            f"CAST(sum(CAST((1.0 / (1.0 + exp(-({z}))) - f.y) * f.x{j} "
            f"AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS g{j}"
            for j in range(nf)
        )
        step = ", ".join(
            f"CAST(CAST(w.w{j} - {QT_LR} * g.g{j} AS DECIMAL(28,9)) "
            f"AS DOUBLE) AS w{j}"
            for j in range(nf)
        )
        parts.append(f"qg{it} AS (SELECT {grads} FROM qf f, qw{it - 1} w)")
        parts.append(f"qw{it} AS (SELECT {step} FROM qw{it - 1} w, qg{it} g)")
    return ",\n    ".join(parts)


@register(
    "curation_quality_train",
    oracle=f"""
    WITH {_qt_features_sql()},
    {_qt_gd_ctes()}
    {" UNION ALL ".join(
        f"SELECT '{name}' AS feature, round(w{j}, 6) AS weight FROM qw{QT_ITERS}"
        for j, name in enumerate(QT_FEATURES)
    )}
    """,
    doc="In-engine TRAINING of the quality classifier: full-batch "
        "logistic-regression gradient descent over the scan-speed "
        "quality signals with lang='en' as the weak label. Fixed "
        f"{QT_ITERS} iterations; each round broadcasts the 5-weight "
        "row back onto the feature scan (the corpus never shuffles — "
        "a round moves 5 DECIMAL partial sums per map task), the "
        "per-feature gradient is a DECIMAL(28,9)-exact partial/final "
        "agg, and the weight step requantizes to DECIMAL(28,9) so "
        "iteration inputs are bit-identical across engines. The "
        "oracle replays the whole loop; the learned weights are "
        "hash-checked, completing the fastText-stage story "
        "curation_quality_classifier's literal weights deferred.",
)
def curation_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = texting.tokens(F.col("text"))
    t = docs.filter(texting.has_tokens("text")).select(
        "doc_id",
        "n_chars",
        tok.alias("toks"),
        F.octet_length(F.regexp_replace("text", "[^a-zA-Z ]", "")).alias("n_alpha"),
        F.octet_length("text").alias("n_raw"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    stop_arr = F.array(*[F.lit(w) for w in texting.EN_STOPWORDS])
    mwl = (
        F.aggregate(F.col("toks"), F.lit(0.0), lambda a, x: a + F.length(x).cast("double"))
        / F.size("toks")
    )
    from pyspark import StorageLevel

    nf = len(QT_FEATURES)
    # the tokenize-heavy feature pass runs ONCE; every GD round scans
    # the persisted 6-column frame (at 100 TB: a materialized feature
    # table, the standard trainer input layout)
    f = t.select(
        "doc_id",
        "y",
        F.lit(1.0).alias("x0"),
        (F.col("n_alpha").cast("double") / F.col("n_raw")).alias("x1"),
        (
            F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
            .cast("double") / F.size("toks")
        ).alias("x2"),
        F.abs(mwl - 6.0).alias("x3"),
        F.when(F.col("n_chars").between(100, 5000), 1.0).otherwise(0.0).alias("x4"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(nf)]
    )
    for _ in range(QT_ITERS):
        scored = f.crossJoin(F.broadcast(w))
        z = sum(
            (F.col(f"w{j}") * F.col(f"x{j}") for j in range(1, nf)),
            F.col("w0") * F.col("x0"),
        )
        # exp() determinism across engines (the ln-vs-log2 lesson
        # applies to any libm call): JVM Math.exp and DuckDB's libm
        # exp may differ by 1 ulp on the same double. That drift is
        # absorbed one line below — every gradient term (e * x_j) is
        # quantized to DECIMAL(28,9) BEFORE summing, so a 1-ulp
        # sigmoid wobble (~1e-17 relative) only survives if the
        # product lands exactly on a 1e-9 rounding boundary, and the
        # weights themselves are requantized each round so drift
        # cannot compound across iterations. Keep that cast: it is
        # the determinism backstop, not a formatting choice.
        e = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        g = scored.agg(
            *[
                (
                    F.sum((e * F.col(f"x{j}")).cast("decimal(28,9)")).cast("double")
                    / F.count("*")
                ).alias(f"g{j}")
                for j in range(nf)
            ]
        )
        w = w.crossJoin(F.broadcast(g)).select(
            *[
                (F.col(f"w{j}") - QT_LR * F.col(f"g{j}"))
                .cast("decimal(28,9)")
                .cast("double")
                .alias(f"w{j}")
                for j in range(nf)
            ]
        )
        # sever the 1-row weight state per round (iterate.py loop
        # discipline): without it round N's plan nests rounds 1..N-1
        # as broadcast subtrees and the driver re-analyzes the growing
        # tree on every transformation — construction alone measured
        # 3.4-7.9 s at sf0.1, vs ~0.5 s severed; the executed work (one
        # agg pass over the persisted feature frame per round) is
        # identical either way
        w = iter_checkpoint(w)
    pairs = ", ".join(
        f"'{name}', round(w{j}, 6)" for j, name in enumerate(QT_FEATURES)
    )
    return w.selectExpr(f"stack({nf}, {pairs}) AS (feature, weight)")


# --- per-source distribution divergence ------------------------------


@register(
    "curation_source_divergence",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({TOKS_SQL}) AS term FROM documents),
    st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n_st
           FROM tok GROUP BY 1, 2),
    ts AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s
           FROM st GROUP BY 1),
    ct AS (SELECT term, CAST(sum(n_st) AS BIGINT) AS n_t FROM st GROUP BY 1),
    nn AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM ct),
    grid AS (SELECT s.source, c.term, c.n_t, s.n_s, nn.n
             FROM ts s, ct c, nn),
    j AS (SELECT g.source, g.term,
                 CAST(coalesce(t.n_st, 0) AS DOUBLE) / g.n_s AS p,
                 CAST(g.n_t AS DOUBLE) / g.n AS q
          FROM grid g LEFT JOIN st t
            ON t.source = g.source AND t.term = g.term),
    contrib AS (SELECT source,
                       CAST(0.5 * CASE WHEN p > 0
                                       THEN p * ln(p / ((p + q) / 2))
                                       ELSE 0 END
                            + 0.5 * q * ln(q / ((p + q) / 2))
                            AS DECIMAL(28,9)) AS c,
                       CASE WHEN p > 0 THEN 1 ELSE 0 END AS present
                FROM j)
    SELECT source,
           CAST(sum(present) AS INT) AS n_terms_src,
           round(CAST(sum(c) AS DOUBLE), 6) AS js_divergence
    FROM contrib GROUP BY source
    """,
    doc="Per-source Jensen-Shannon divergence from the corpus unigram "
        "distribution — the mixture-design diagnostic (which sources "
        "deviate from the blend, by how much; 0 = identical, ln 2 = "
        "disjoint support). Linear shape: (source, term) counts are one "
        "partial/final agg, the corpus marginals roll up from the same "
        "table, and the evaluation grid is sources × VOCABULARY "
        "(vocab-bounded, never corpus-bounded — at 100 TB restrict to "
        "the top-V terms, which also bounds the left join). Per-term "
        "contributions are DECIMAL(28,9)-cast before the sum so "
        "partial-agg order cannot move a bit; the oracle replays the "
        "identical arithmetic.",
)
def curation_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(texting.tokens(F.col("text"))).alias("term")
    )
    st = tok.groupBy("source", "term").agg(F.count("*").alias("n_st"))
    ts = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    ct = st.groupBy("term").agg(F.sum("n_st").alias("n_t"))
    nn = ct.agg(F.sum("n_t").alias("n"))
    grid = ts.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(nn))
    j = grid.join(st, ["source", "term"], "left").select(
        "source",
        (F.coalesce(F.col("n_st"), F.lit(0)).cast("double") / F.col("n_s")).alias("p"),
        (F.col("n_t").cast("double") / F.col("n")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = (
        F.lit(0.5)
        * F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.lit(0.5) * F.col("q") * F.log(F.col("q") / m)
    )
    c = j.select(
        "source",
        contrib.cast("decimal(28,9)").alias("c"),
        F.when(F.col("p") > 0, 1).otherwise(0).alias("present"),
    )
    return c.groupBy("source").agg(
        F.sum("present").cast("int").alias("n_terms_src"),
        F.round(F.sum("c").cast("double"), 6).alias("js_divergence"),
    )


# --- DSIR-style hashed-ngram importance weights ----------------------

# Data Selection via Importance Resampling (Xie et al., 2023): score
# each raw document by the log-likelihood ratio of a hashed-bigram
# bag-of-features model fit on a TARGET domain vs the RAW corpus; at
# selection time documents are Gumbel-top-k sampled by this weight.
# 256 buckets = the 2-hex-digit md5 decode the oracle can replay
# (production uses 16-20 hash bits — same shapes, wider table).
DSIR_BUCKETS = 256
DSIR_TARGET_SOURCES = ("src0", "src1", "src2")


@register(
    "curation_dsir_weights",
    oracle=f"""
    WITH tk AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
    bg AS (SELECT doc_id, source,
                  unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1])) AS g
           FROM tk WHERE len(toks) >= 2),
    hb AS (SELECT doc_id, source, md5(g) AS h FROM bg),
    fb AS (SELECT doc_id, source, {_BUCKET_FROM_H_SQL} AS bucket FROM hb),
    db AS (SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS c
           FROM fb GROUP BY 1, 2, 3),
    raw AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS r FROM db GROUP BY 1),
    tgt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS t FROM db
            WHERE source IN {DSIR_TARGET_SOURCES} GROUP BY 1),
    br AS (SELECT raw.bucket, raw.r, CAST(coalesce(tgt.t, 0) AS BIGINT) AS t
           FROM raw LEFT JOIN tgt USING (bucket)),
    tot AS (SELECT CAST(sum(r) AS BIGINT) AS rt, CAST(sum(t) AS BIGINT) AS tt
            FROM br),
    lr AS (SELECT bucket,
                  ln((CAST(t + 1 AS DOUBLE) / CAST(tt + {DSIR_BUCKETS} AS DOUBLE))
                   / (CAST(r + 1 AS DOUBLE) / CAST(rt + {DSIR_BUCKETS} AS DOUBLE)))
                    AS lr
           FROM br, tot),
    wc AS (SELECT d.doc_id, d.source, d.c,
                  CAST(CAST(d.c AS DOUBLE) * l.lr AS DECIMAL(28,9)) AS w
           FROM db d JOIN lr l USING (bucket))
    SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_feats,
           round(CAST(sum(w) AS DOUBLE), 6) AS log_weight
    FROM wc GROUP BY 1, 2
    """,
    doc="DSIR importance weights (Xie et al. 2023, data selection via "
        "importance resampling): per-document log-likelihood ratio of "
        "Laplace-smoothed hashed-bigram models, target domain (a fixed "
        "source subset) vs the raw corpus. Shape at 100 TB: the "
        "feature stream is one explode (linear in tokens); per-(doc, "
        "bucket) counts partial-agg before the shuffle; BOTH model "
        "tables are bucket-count-sized (256 rows here, ≤1M at 20 hash "
        "bits) so they roll up from the same grouped table and the "
        "log-ratio table broadcasts back onto the doc stream — the "
        "wide work never exceeds one row per (doc, bucket). Per-doc "
        "sums are DECIMAL(28,9)-cast; the md5 bucket decode and the "
        "double division tree are replayed verbatim by the oracle.",
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    toks = texting.tokens(F.col("text"))
    g = docs.filter(texting.has_tokens("text")).select(
        "doc_id",
        "source",
        F.explode(texting.word_ngrams(toks, 2)).alias("g"),
    )
    bucket = F.conv(F.substring(F.md5("g"), 1, 2), 16, 10).cast("int")
    db = (
        g.select("doc_id", "source", bucket.alias("bucket"))
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("c"))
    )
    raw = db.groupBy("bucket").agg(F.sum("c").alias("r"))
    tgt = (
        db.filter(F.col("source").isin(*DSIR_TARGET_SOURCES))
        .groupBy("bucket")
        .agg(F.sum("c").alias("t"))
    )
    br = raw.join(tgt, "bucket", "left").select(
        "bucket", "r", F.coalesce("t", F.lit(0)).alias("t")
    )
    tot = br.agg(F.sum("r").alias("rt"), F.sum("t").alias("tt"))
    nb = F.lit(DSIR_BUCKETS)
    lr = (
        br.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                ((F.col("t") + 1).cast("double") / (F.col("tt") + nb).cast("double"))
                / ((F.col("r") + 1).cast("double") / (F.col("rt") + nb).cast("double"))
            ).alias("lr"),
        )
    )
    wc = db.join(F.broadcast(lr), "bucket").select(
        "doc_id",
        "source",
        "c",
        (F.col("c").cast("double") * F.col("lr")).cast("decimal(28,9)").alias("w"),
    )
    return wc.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_feats"),
        F.round(F.sum("w").cast("double"), 6).alias("log_weight"),
    )


# --- cross-split leakage audit ---------------------------------------


@register(
    "corpus_split_leakage",
    oracle=f"""
    WITH grams AS ({_DISTINCT_GRAMS_SQL}),
    h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
    b AS (SELECT doc_id, {_BUCKET_FROM_H_SQL} AS bucket FROM h),
    tg AS (SELECT DISTINCT gram FROM grams JOIN b USING (doc_id)
           WHERE bucket >= {VAL_LT}),
    tr AS (SELECT g.doc_id, g.gram FROM grams g JOIN b USING (doc_id)
           WHERE bucket < {TRAIN_LT}),
    tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams
            FROM tr GROUP BY 1),
    lk AS (SELECT t.doc_id, CAST(count(*) AS INT) AS n_leaked
           FROM tr t JOIN tg USING (gram) GROUP BY 1)
    SELECT o.doc_id, o.n_grams,
           CAST(coalesce(l.n_leaked, 0) AS INT) AS n_leaked,
           round(CAST(coalesce(l.n_leaked, 0) AS DOUBLE) / o.n_grams, 6)
               AS leak_ratio
    FROM tot o LEFT JOIN lk l USING (doc_id)
    """,
    doc="Cross-split contamination audit: for every TRAIN document, "
        f"how many of its distinct {DECONTAM_NGRAM}-grams also occur "
        "anywhere in the TEST split (the held-out leakage check a "
        "training pipeline must run before reporting eval numbers — "
        "decontam_ngram_overlap's sibling where the 'benchmark' is "
        "the pipeline's own test split). The test side is "
        "corpus-proportional, so unlike the benchmark case it cannot "
        "be ASSUMED broadcastable: the audit is expressed as a plain "
        "equi-join on the gram key and Catalyst picks the strategy "
        "from size statistics — broadcast at fixture scale, "
        "SortMergeJoin past the threshold, no code change and no "
        "nested-loop either way. "
        "The gram table feeds three consumers (test set, train side, "
        "per-doc totals) and is persisted once (spill-safe; the "
        "driver harness clears the cache between queries); at 100 TB "
        "it would be checkpointed or a bloom filter on the test gram "
        "set would pre-filter the train stream.",
)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = spread(table(spark, sf_dir, "documents"))
    sh = F.array_distinct(
        texting.word_ngrams(texting.tokens(F.col("text")), DECONTAM_NGRAM)
    )
    grams = (
        docs.select("doc_id", F.explode(sh).alias("gram"))
        .withColumn("bucket", _md5_bucket())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tg = (
        grams.filter(F.col("bucket") >= VAL_LT).select("gram").distinct()
    )
    tr = grams.filter(F.col("bucket") < TRAIN_LT).select("doc_id", "gram")
    tot = tr.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_grams"))
    lk = tr.join(tg, "gram").groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_leaked")
    )
    # tot LEFT JOIN lk so zero-leak train docs appear with n_leaked=0
    # — the audit really does cover EVERY train document
    n_leaked = F.coalesce(F.col("n_leaked"), F.lit(0)).cast("int")
    return tot.join(lk, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_leaked.alias("n_leaked"),
        F.round(n_leaked.cast("double") / F.col("n_grams"), 6).alias(
            "leak_ratio"
        ),
    )


# --- mixture planning -------------------------------------------------

# alpha = 0.5 temperature flattening (multilingual-style alpha
# sampling) written as sqrt so both engines compute the exactly-
# rounded IEEE value; the token budget is the planner's knob.
MIX_TOKEN_BUDGET = 200_000


@register(
    "corpus_mixture_plan",
    oracle=f"""
    WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(len({TOKS_SQL})) AS BIGINT) AS n_tokens
               FROM documents GROUP BY 1),
    w AS (SELECT source, n_docs, n_tokens,
                 sqrt(CAST(n_tokens AS DOUBLE)) AS wgt FROM t),
    tot AS (SELECT CAST(sum(CAST(wgt AS DECIMAL(28,9))) AS DOUBLE) AS tw
            FROM w)
    SELECT source, n_docs, n_tokens,
           round(wgt / tw, 6) AS share,
           CAST(round(wgt / tw * {MIX_TOKEN_BUDGET}, 0) AS BIGINT)
             AS ideal_tokens,
           round(least(1.0, round(wgt / tw * {MIX_TOKEN_BUDGET}, 0)
                            / CAST(n_tokens AS DOUBLE)), 6) AS sample_rate,
           round(round(wgt / tw * {MIX_TOKEN_BUDGET}, 0)
                 / CAST(n_tokens AS DOUBLE), 4) AS epochs
    FROM w, tot
    """,
    doc="Mixture planning: derive the per-source sampling plan that "
        "corpus_mixture_sample consumes — temperature-flattened "
        "(alpha = 0.5, i.e. sqrt-of-token-count) target shares over a "
        "fixed token budget, with the resulting sample rate (< 1 = "
        "downsample) or epoch factor (> 1 = repeat). One partial/"
        "final agg to #sources rows + a 1-row broadcast total — "
        "token counting rides the scan, nothing else is wide, so the "
        "planner costs one pass at any corpus size. Per-source sqrt "
        "weights are DECIMAL-cast before the total so the share "
        "denominator is partial-agg-order-independent.",
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    t = (
        docs.select("source", F.size(texting.tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
    )
    w = t.withColumn("wgt", F.sqrt(F.col("n_tokens").cast("double")))
    tot = w.agg(
        F.sum(F.col("wgt").cast("decimal(28,9)")).cast("double").alias("tw")
    )
    share = F.col("wgt") / F.col("tw")
    ideal = F.round(share * MIX_TOKEN_BUDGET, 0)
    ntd = F.col("n_tokens").cast("double")
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("share"),
        ideal.cast("bigint").alias("ideal_tokens"),
        F.round(F.least(F.lit(1.0), ideal / ntd), 6).alias("sample_rate"),
        F.round(ideal / ntd, 4).alias("epochs"),
    )


# --- length-bucketed batching ----------------------------------------


@register(
    "corpus_length_buckets",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      CAST(len({TOKS_SQL}) AS BIGINT) AS n
               FROM documents),
    nz AS (SELECT doc_id, n FROM t WHERE n > 0),
    q AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.25) AS q1,
                 quantile_cont(CAST(n AS DOUBLE), 0.50) AS q2,
                 quantile_cont(CAST(n AS DOUBLE), 0.75) AS q3
          FROM nz),
    b AS (SELECT doc_id, n,
                 CASE WHEN CAST(n AS DOUBLE) <= q1 THEN 0
                      WHEN CAST(n AS DOUBLE) <= q2 THEN 1
                      WHEN CAST(n AS DOUBLE) <= q3 THEN 2
                      ELSE 3 END AS bucket
          FROM nz, q)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n) AS BIGINT) AS min_tokens,
           CAST(max(n) AS BIGINT) AS max_tokens,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           round(CAST(count(*) * max(n) - sum(n) AS DOUBLE)
                 / (count(*) * max(n)), 6) AS pad_waste
    FROM b GROUP BY 1
    """,
    doc="Length-bucketed batching: assign documents to equal-mass "
        "token-length buckets (exact quartile bounds) and report each "
        "bucket's padding waste — the fraction of a pad-to-bucket-max "
        "batch that would be padding, the number inference/training "
        "batching by length exists to minimize. Two passes over a "
        "scan-level token count: the quartiles are one global agg to "
        "a 1-row broadcast (at 100 TB swap in approx_percentile — "
        "same plan, sketch-merge instead of sort), and every "
        "per-bucket statistic, INCLUDING the waste ratio, derives "
        "from the (count, min, max, sum) aggregate alone — "
        "n·max - Σn needs no second pass over rows. Exact-percentile "
        "interpolation is bit-identical between Spark `percentile` "
        "and DuckDB `quantile_cont` (the percentiles_by_type parity "
        "row proves it), so the bucket bounds replay exactly.",
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    nz = docs.filter(texting.has_tokens("text")).select(
        "doc_id", F.size(texting.tokens(F.col("text"))).cast("bigint").alias("n")
    )
    nd = F.col("n").cast("double")
    q = nz.agg(
        F.percentile(nd, F.lit(0.25)).alias("q1"),
        F.percentile(nd, F.lit(0.50)).alias("q2"),
        F.percentile(nd, F.lit(0.75)).alias("q3"),
    )
    b = nz.crossJoin(F.broadcast(q)).select(
        "n",
        F.when(nd <= F.col("q1"), 0)
        .when(nd <= F.col("q2"), 1)
        .when(nd <= F.col("q3"), 2)
        .otherwise(3)
        .cast("int")
        .alias("bucket"),
    )
    g = b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
        F.sum("n").alias("sum_tokens"),
    )
    return g.select(
        "bucket",
        "n_docs",
        "min_tokens",
        "max_tokens",
        "sum_tokens",
        F.round(
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens")).cast("double")
            / (F.col("n_docs") * F.col("max_tokens")),
            6,
        ).alias("pad_waste"),
    )


# --- corpus novelty profile -------------------------------------------


@register(
    "corpus_novelty_profile",
    oracle=f"""
    WITH g AS (SELECT doc_id,
                      unnest(list_distinct({TOKS_SQL})) AS gram
               FROM documents),
    first_seen AS (SELECT gram, min(doc_id) AS first_doc
                   FROM g GROUP BY 1),
    j AS (SELECT g.doc_id,
                 CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END AS novel
          FROM g JOIN first_seen f USING (gram))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(novel) AS BIGINT) AS n_novel,
           round(CAST(sum(novel) AS DOUBLE) / count(*), 6) AS novelty
    FROM j GROUP BY 1
    """,
    doc="Per-document novelty profile — the redundancy-growth audit a "
        "curation run uses to see diminishing returns as a corpus "
        "grows: for each doc, the fraction of its distinct tokens "
        "whose FIRST corpus occurrence (by ingestion order = doc_id) "
        "is this doc. Two hash aggs and one equi-join on the gram key "
        "— the 'seen before?' question needs no sequential scan and "
        "no state: min(doc_id) per gram IS the first-seer table, "
        "computed in one partial/final agg. A corpus whose late docs "
        "trend toward novelty 0 is rehashing itself — the signal "
        "dataset builders use to stop crawling a source.",
)
def corpus_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(F.array_distinct(texting.tokens(F.col("text")))).alias("gram"),
    )
    first_seen = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    j = g.join(first_seen, "gram").select(
        "doc_id",
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0).alias("novel"),
    )
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum("novel").cast("bigint").alias("n_novel"),
        F.round(F.sum("novel").cast("double") / F.count("*"), 6).alias("novelty"),
    )


# ------------------------------------------ stratified quota sampling
STRATA_TOTAL = 100          # exact number of docs the sample must have
STRATA_SEED = "strata-v1"   # content-keyed permutation seed


@register(
    "corpus_stratified_quota",
    oracle=f"""
    WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
               FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_all FROM n),
    q AS (SELECT source, n_src,
                 ({STRATA_TOTAL} * n_src) // n_all AS base,
                 ({STRATA_TOTAL} * n_src) % n_all AS rem
          FROM n CROSS JOIN tot),
    lo AS (SELECT CAST({STRATA_TOTAL} - sum(base) AS BIGINT) AS leftover
           FROM q),
    quota AS (SELECT source,
                     CAST(base + CASE WHEN row_number() OVER
                            (ORDER BY rem DESC, source) <= lo.leftover
                          THEN 1 ELSE 0 END AS BIGINT) AS quota
              FROM q CROSS JOIN lo),
    ranked AS (SELECT doc_id, source,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY md5('{STRATA_SEED}'
                                     || CAST(doc_id AS VARCHAR)), doc_id)
                        AS BIGINT) AS samp_rank
               FROM documents)
    SELECT r.source, r.doc_id, r.samp_rank, q.quota
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.samp_rank <= q.quota
    """,
    doc="Exact-total stratified sampling with largest-remainder quota "
        "allocation: each source gets floor(T*n_s/N) docs, and the "
        "T - sum(floor) leftover seats go to the largest fractional "
        "remainders — so the sample size is EXACTLY T and per-source "
        "proportions are off by at most one doc (plain rate sampling "
        "drifts binomially and never hits T). All quota arithmetic is "
        "integer (T*n_s div/mod N), so the oracle replays it exactly. "
        "Selection inside each stratum is the md5 content-keyed "
        "permutation (reproducible, partition-independent). Shape at "
        "100 TB: the quota table is |sources| rows (the one ordered "
        "window runs on that bounded aggregate, then broadcasts); the "
        "per-source selection window sorts only rank<=quota "
        "candidates' stratum — swap for a hash-threshold prefilter at "
        "extreme stratum sizes.",
)
def corpus_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    tot = n.agg(F.sum("n_src").alias("n_all"))
    q = n.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(f"({STRATA_TOTAL} * n_src) div n_all").alias("base"),
        (F.lit(STRATA_TOTAL) * F.col("n_src") % F.col("n_all")).alias("rem"),
    )
    lo = q.agg((F.lit(STRATA_TOTAL) - F.sum("base")).alias("leftover"))
    # ordered window over the per-source aggregate: bounded input
    # (|sources| rows), declared in the registry lint exceptions
    wq = Window.orderBy(F.col("rem").desc(), F.col("source"))
    quota = q.crossJoin(F.broadcast(lo)).select(
        "source",
        (
            F.col("base")
            + F.when(F.row_number().over(wq) <= F.col("leftover"), 1).otherwise(0)
        ).alias("quota"),
    )
    ws = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit(STRATA_SEED), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(ws).alias("samp_rank")
    )
    return ranked.join(F.broadcast(quota), "source").filter(
        F.col("samp_rank") <= F.col("quota")
    ).select("source", "doc_id", "samp_rank", "quota")



# --- weighted sampling (Efraimidis-Spirakis A-ES) ---------------------
WS_K = 5  # docs kept per source

_WS_HEX = ("(strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 1048576 "
           "+ (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 65536 "
           "+ (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 4096 "
           "+ (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) * 256 "
           "+ (strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 16 "
           "+ (strpos('0123456789abcdef', substring(h, 6, 1)) - 1)")


@register(
    "corpus_weighted_sample",
    oracle=f"""
    WITH h AS (SELECT doc_id, source, n_chars,
                      md5('ws|' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    v AS (SELECT doc_id, source, n_chars, {_WS_HEX} AS hv FROM h),
    k AS (SELECT doc_id, source, n_chars,
                 CAST(ln(CAST(hv + 1 AS DOUBLE) / CAST(16777217 AS DOUBLE))
                      / n_chars AS DECIMAL(28,14)) AS key
          FROM v),
    r AS (SELECT doc_id, source, n_chars, key,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY key DESC, doc_id) AS rk
          FROM k)
    SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk,
           CAST(round(key, 8) AS DOUBLE) AS sel_key
    FROM r WHERE rk <= {WS_K}
    """,
    doc=f"Weight-proportional sampling without replacement "
        f"(Efraimidis-Spirakis A-ES), {WS_K} docs per source weighted "
        "by n_chars — the quality/length-weighted selection step of a "
        "mixture builder (its uniform sibling is corpus_group_sample). "
        "Each doc draws a deterministic md5-uniform u and competes on "
        "the one-pass key u^(1/w), realized as ln(u)/w (monotone "
        "equivalent, avoids pow) and quantized to DECIMAL(28,14) so "
        "the cross-engine sort cutoff cannot sit on a libm-ulp "
        "boundary; ties break on doc_id. Selection is the standard "
        "A-ES top-k per group: exact, single pass, mergeable (the "
        "same sharded two-stage top-k as the uniform sample — no "
        "source ever streams through one task). The oracle replays "
        "the identical key arithmetic from the same md5 hex digits.",
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))), 1, 6
        ),
        16,
        10,
    ).cast("long")
    u = (hv + F.lit(1)).cast("double") / F.lit(16777217).cast("double")
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.log(u) / F.col("n_chars")).cast("decimal(28,14)").alias("key"),
    )
    ranked = top_k_per_group_sharded(
        keyed, ["source"], [F.col("key").desc(), F.col("doc_id")], WS_K,
        shard_of="doc_id", rank_col="rk", shards=PACK_SHARDS,
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_chars",
        F.col("rk").cast("int").alias("rk"),
        F.round(F.col("key"), 8).cast("double").alias("sel_key"),
    )
