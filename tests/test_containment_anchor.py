"""dedup_containment's asymmetric anchor path: the planted quote twins
(tweet-inside-article shape) sit far below MinHash band reach, so only
the anchor candidates can reliably catch them — the r6 verdict's
containment recall-gap closure."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.operators import dedup as D
from deep_field_spark.functions import texting
from deep_field_spark.queries.dedup import (
    NGRAM,
    QUOTE_ID_OFFSET,
    QUOTE_MIN_TOKENS,
    QUOTE_MOD,
    QUOTE_RESIDUE,
    QUOTE_TOKENS,
    _banded_of,
    dedup_containment,
)


def _quote_sources(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    toks = texting.tokens(F.col("text"))
    return [
        r.doc_id
        for r in docs.select("doc_id", toks.alias("toks"))
        .filter(
            (F.col("doc_id") % QUOTE_MOD == QUOTE_RESIDUE)
            & (F.size("toks") >= QUOTE_MIN_TOKENS)
        )
        .select("doc_id")
        .collect()
    ]


def test_planted_quote_twins_are_caught(spark, sf_dir):
    sources = _quote_sources(spark, sf_dir)
    assert sources, "no planted twins — vacuous test data assumption"
    got = {
        r.doc_id: (r.contained_in, r.containment)
        for r in dedup_containment(spark, sf_dir).collect()
    }
    for src in sources:
        qid = src + QUOTE_ID_OFFSET
        # a token-prefix excerpt: every quote shingle is in the article,
        # so its best container scores containment exactly 1.0
        assert qid in got, f"quote of doc {src} missed entirely"
        assert got[qid][1] == 1.0, (qid, got[qid])


def test_anchor_path_is_load_bearing(spark, sf_dir):
    """At least one (quote, source-article) pair must be ABSENT from
    the symmetric band-join candidates — i.e. the quotes are genuinely
    sub-band-reach and the catch above is the anchor path working, not
    band luck."""
    docs = table(spark, sf_dir, "documents")
    toks = texting.tokens(F.col("text"))
    quotes = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(
            (F.col("doc_id") % QUOTE_MOD == QUOTE_RESIDUE)
            & (F.size("toks") >= QUOTE_MIN_TOKENS)
        )
        .select(
            (F.col("doc_id") + QUOTE_ID_OFFSET).alias("doc_id"),
            F.concat_ws(" ", F.slice(F.col("toks"), 1, QUOTE_TOKENS)).alias("text"),
        )
    )
    alldocs = docs.select("doc_id", "text").unionByName(quotes)
    sh = D.shingled(alldocs, "text", "doc_id", NGRAM)
    banded = _banded_of(sh)
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "key")
    band_pairs = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    sources = _quote_sources(spark, sf_dir)
    missed_by_bands = [
        s for s in sources if (s, s + QUOTE_ID_OFFSET) not in band_pairs
    ]
    assert missed_by_bands, (
        "every planted quote pair band-collided — twins are not "
        "sub-band-reach; lower QUOTE_TOKENS"
    )


def test_dedup_aware_split_has_zero_candidate_leakage(spark, sf_dir):
    """The structural guarantee: no MinHash candidate pair may straddle
    a split boundary under corpus_split_dedup_aware (the plain
    per-doc split has no such guarantee — that asymmetry is the
    query's reason to exist)."""
    from deep_field_spark.operators import dedup as D
    from deep_field_spark.queries.dedup import (
        BANDS,
        MINHASH_THRESHOLD,
        NUM_HASHES,
        corpus_split_dedup_aware,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "text", "doc_id",
        ngram=NGRAM, num_hashes=NUM_HASHES, bands=BANDS,
        threshold=MINHASH_THRESHOLD,
    )
    split = corpus_split_dedup_aware(spark, sf_dir).select("doc_id", "split")
    a = split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("s_a"))
    b = split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("s_b"))
    crossers = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("s_a") != F.col("s_b"))
        .count()
    )
    assert pairs.count() > 0  # non-vacuous
    assert crossers == 0
