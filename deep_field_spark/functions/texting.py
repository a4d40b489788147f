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


def has_tokens(col: Column | str) -> Column:
    """Cheap scan-level equivalent of ``size(tokens(c)) > 0``.

    ``tokens`` keeps exactly the maximal runs of non-``\\s`` characters,
    so the array is non-empty iff the text contains any ``\\S`` char
    (NULL text → NULL → filtered, same as the size test). Filtering on
    this BEFORE projecting ``tokens(...)`` matters for plan shape:
    ``.select(tokens.alias("toks")).filter(size("toks") > 0)`` gets
    rewritten by PushDownPredicate into Filter(size(tokens(text)))
    under the Project, and codegen does not share the subexpression
    across that boundary — every row tokenizes twice. A plain rlike
    predicate pushes to the scan and leaves one tokenizer eval.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"\S")


def word_ngrams(tok: Column, n: int, sep: str = " ") -> Column:
    """Word n-gram shingles from a token array (order-preserving).

    transform over index range keeps everything JVM-side; returns an
    array of ``n``-token strings, empty when there are < n tokens.

    Perf notes (measured at sf0.1): ``slice`` beats n ``element_at``
    probes ~6× inside a lambda; and do NOT follow this with a
    ``filter(size(...) > 0)`` before an explode — Catalyst pushes the
    filter below the projection and inlines the whole tokenize+ngram
    expression into the Filter condition, evaluating everything twice
    (explode drops empty arrays on its own).
    """
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(sep, F.slice(tok, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (as double)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
