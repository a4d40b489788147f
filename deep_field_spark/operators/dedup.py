"""Deduplication operators for document corpora.

Reference parity: the reference dedups scraped links/rows via existence
anti-joins (SURVEY.md §2.2 P9, §2.3 J3/J4 — /root/reference/deepfield/
scraping/nodes.py:38-39, bbref_pages.py:58-63). Here that generalizes to
the corpus-dedup family a training-data pipeline needs:

  exact        — hash groupBy: one shuffle on the digest.
  minhash LSH  — shingle → minhash signature → band keys → candidate
                 pairs via equi-join on (band, key) → verify Jaccard.
                 No O(n²) pair scan; candidate volume is controlled by
                 (bands, rows). The scale path for 100 TB.
  ngram Jaccard— inverted-index join on shingles (exact, heavier).
  simhash      — 16-bit signature; pairs within hamming radius.

md5 is used as the hash family so the DuckDB oracle can replay the
exact same arithmetic (see functions/texting.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texting


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact text digest.

    Aggregation (min over groupBy digest) rather than a window: the
    partial-aggregate (map-side combine) halves the shuffle volume vs
    row_number-over-window at scale.
    """
    digests = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
    keep = digests.groupBy("digest").agg(F.min(id_col).alias(id_col))
    return keep.select(id_col, "digest")


def shingled(df: DataFrame, text_col: str, id_col: str, ngram: int) -> DataFrame:
    tok = texting.tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.array_distinct(texting.word_ngrams(tok, ngram)).alias("shingles"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding, verified by exact
    Jaccard >= threshold. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    rows = num_hashes // bands
    sh = shingled(df, text_col, id_col, ngram).filter(F.size("shingles") > 0)
    sig = sh.select(
        id_col,
        "shingles",
        texting.band_keys(texting.minhash_sig(F.col("shingles"), num_hashes), bands, rows).alias("bk"),
    )
    banded = sig.select(id_col, "shingles", F.explode("bk").alias("bk")).select(
        id_col, "shingles", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, on=["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", texting.jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, ngram: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard pairs via inverted-index join on shingles.

    The join on shingle is the inverted index: only docs sharing at
    least one shingle ever meet, so the cross product never materializes.
    """
    sh = shingled(df, text_col, id_col, ngram).filter(F.size("shingles") > 0)
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("n"))
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc 16-bit simhash (portable to the SQL oracle)."""
    tok = texting.tokens(F.col(text_col))
    return df.select(F.col(id_col), texting.simhash16(tok).alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= radius.

    Blocked by the two 8-bit halves (pigeonhole: hamming<=3 pairs agree
    on at least one half only when radius < 2 per half — for a guarantee
    at radius r we'd split into r+1 blocks; with 2 blocks this is exact
    for hamming <= 1 per-half misses; we therefore verify candidates
    from BOTH half-matches and accept the tiny recall gap vs brute force
    at radius > 1 in exchange for no O(n²)).
    """
    sh = simhash_table(df, text_col, id_col)
    lo = sh.withColumn("block", F.col("simhash") % 256).withColumn("half", F.lit(0))
    hi = sh.withColumn("block", (F.col("simhash") / 256).cast("int")).withColumn("half", F.lit(1))
    blocked = lo.unionByName(hi)
    a = blocked.alias("a")
    b = blocked.alias("b")
    cand = (
        a.join(b, on=["half", "block"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_keep_first(df: DataFrame, pair_df: DataFrame, id_col: str) -> DataFrame:
    """Given near-dup pairs (id_a < id_b), drop every id_b (union-find
    light: transitive chains collapse to the smallest id via iteration
    in the caller if needed; single pass drops direct dups)."""
    drops = pair_df.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, on=id_col, how="left_anti")
