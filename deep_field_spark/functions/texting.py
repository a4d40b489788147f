"""Text column expressions: tokenization, shingles, portable hashing.

Everything here is built-in column expressions (JVM-side, codegen'd) —
no Python UDFs in the hot path. Hashing uses ``md5`` because it is
bit-identical across Spark and DuckDB, which makes the dedup operators
oracle-checkable; at 100 TB scale ``xxhash64`` is the cheaper drop-in
(same shapes, Spark-only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword list used by the language-ID heuristic and the
# quality score. Deterministic + portable (mirrored in oracle SQL).
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens of a text column (drops empties)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit(""))


def word_ngrams(tok: Column, n: int, sep: str = " ") -> Column:
    """Word n-gram shingles from a token array (order-preserving).

    transform over index range keeps everything JVM-side; returns an
    array of ``n``-token strings, empty when there are < n tokens.
    """
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(sep, F.slice(tok, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_sig(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: array of ``num_hashes`` lexicographic-min
    md5 digests of seed-prefixed shingles.

    min(md5(seed || x)) over a set is a valid min-wise hash family and —
    because md5 hex strings compare identically everywhere — is portable
    to the DuckDB oracle verbatim.
    """
    uniq = F.array_distinct(shingles)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(uniq, lambda s: F.md5(F.concat(seed.cast("string"), F.lit("|"), s)))
        ),
    )


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH band keys: md5 of each ``rows``-wide slice of the signature.

    Docs sharing any band key are near-dup candidates; join on
    (band_index, band_key) finds them without the O(n²) pair scan.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.concat_ws("|", F.slice(sig, b * rows + 1, rows))).alias("key"),
        ),
    )


def simhash16(tok: Column) -> Column:
    """16-bit SimHash over a token array, portable to SQL.

    Bit i of the hash of token t is the top bit of hex digit i of
    md5(t). The simhash bit is the sign of sum(±1) over tokens.
    Returns an int in [0, 65535]; hamming distance via bit_count(xor).
    """
    uniq = F.array_distinct(tok)
    hi_digits = ["8", "9", "a", "b", "c", "d", "e", "f"]
    bit_votes = [
        F.aggregate(
            uniq,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.substring(F.md5(t), i + 1, 1).isin(hi_digits), 1).otherwise(-1),
        )
        for i in range(16)
    ]
    out = F.lit(0)
    for i, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1 << i)).otherwise(0)
    return out


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (as double)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
