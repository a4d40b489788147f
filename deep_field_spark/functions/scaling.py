"""Corpus-size-derived index parameters (the k ∝ √n discipline).

An IVF/LSH index built for a 500-row test corpus and an index built for
a 10¹²-row production corpus differ in exactly one place: the handful of
integer knobs that size the structure (coarse cell count, hyperplane
count, MinHash band ladder). Pinning those at test scale makes the
candidate volume grow superlinearly with data — the round-9 sf1 replica
measured ann_incremental_ivf at ×13 wall on ×10 data from exactly this.
This module turns the "k grows with √n" comments into code: one
deterministic integer derivation per knob, with a DuckDB-SQL twin so
every oracle replays the SAME derivation the engine ran
(tests/test_scaling.py pins Python == DuckDB over a wide sweep of n).

Reference parity note: the reference engine (longoodr/deep-field) has no
ANN surface — these knobs exist for the training-data-pipeline operators
the brief adds on top. The derivations follow FAISS guidance (nlist ≈
√n; codebook size per subquantizer FIXED at 2^nbits regardless of corpus
— so PQ_K is deliberately NOT derived here) and the standard MinHash
S-curve t ≈ (1/b)^(1/r), held at 0.5 by keeping b = 2^r as r grows.

Derivations are floor-log2-based so they are exact integer arithmetic in
Python and exactly replayable in SQL: DuckDB's floor(log2(n)) equals
bit_length(n)-1 for every attainable corpus count (log2 of a power of
two is exact in IEEE double; a non-power's log2 is ≥2^-52 relative away
from the next integer for n < 2^52, so floor can never round across it).
"""

from __future__ import annotations

# Floors (the current test-scale constants): derivation never goes
# BELOW the pinned value, so every scale factor whose corpus is small
# enough resolves to the historical constant and existing oracle
# results are unchanged there (sf0.001/sf0.01: 500 embeddings -> 16
# cells / 6 planes / (b=4, r=2), byte-identical to rounds 1-9).
MIN_CELLS = 16
MIN_PLANES = 6
# per-bucket occupancy target for sign-LSH: buckets ≈ n / 2**PLANES_LOG_OFFSET
PLANES_LOG_OFFSET = 3


def floor_log2(n: int) -> int:
    """⌊log2 n⌋ as exact integer arithmetic (n ≥ 1)."""
    if n < 1:
        raise ValueError(f"corpus count must be >= 1, got {n}")
    return n.bit_length() - 1


def n_cells(n: int) -> int:
    """IVF coarse-cell count for an n-row corpus: the largest power of
    two ≤ √n, floored at MIN_CELLS — FAISS's nlist ≈ √n rule quantized
    to powers of two so the derivation is branch-free integer math.
    Cell size and probed-candidate volume both track √n, so per-query
    serve cost is O(nprobe·√n) at every scale instead of O(nprobe·n/16).
    500 → 16, 2 000 → 32, 20 000 → 128, 10⁹ → 16 384."""
    return max(MIN_CELLS, 1 << (floor_log2(n) // 2))


def n_planes(n: int) -> int:
    """Sign-LSH hyperplane count: buckets 2^p ≈ n/8 (expected bucket
    occupancy ~2³), floored at MIN_PLANES. Within-bucket brute force is
    then O(n·occupancy) total — linear in n — instead of O(n²/2^p) with
    p pinned. Recall per bucket drops as p grows; multi-probe (already
    implemented) is the standard counter-knob. 500 → 6, 2 000 → 7,
    20 000 → 11."""
    return max(MIN_PLANES, floor_log2(n) - PLANES_LOG_OFFSET)


# MinHash ladder: (bands, rows) with b = 2^r so the S-curve threshold
# (1/b)^(1/r) stays exactly 0.5 at every rung; escalating r sharpens
# the curve and cuts random band-collisions as the corpus grows.
_MINHASH_LADDER = (
    (1 << 14, (4, 2)),   # n < 16 384  -> 8 hashes  (the test-scale pin)
    (1 << 20, (8, 3)),   # n < 1 048 576 -> 24 hashes
    (None, (16, 4)),     # beyond      -> 64 hashes
)


def minhash_params(n: int) -> tuple[int, int]:
    """(bands, rows_per_band) for an n-document corpus. num_hashes =
    bands*rows. 500 → (4, 2) unchanged from rounds 1-9; 50 000 → (8, 3);
    10⁷ → (16, 4)."""
    for cutoff, br in _MINHASH_LADDER:
        if cutoff is None or n < cutoff:
            return br
    raise AssertionError("unreachable")


# --- DuckDB twins ------------------------------------------------------
# Each returns a scalar-subquery SQL fragment deriving the SAME integer
# from count(*) of the given relation. floor(log2(count)) == bit_length-1
# (see module docstring), // is DuckDB integer division.

def _floor_log2_sql(count_src: str) -> str:
    return (
        f"CAST(floor(log2(CAST((SELECT count(*) FROM {count_src}) "
        f"AS DOUBLE))) AS BIGINT)"
    )


def n_cells_sql(count_src: str = "embeddings") -> str:
    return (
        f"greatest({MIN_CELLS}, CAST(pow(2, {_floor_log2_sql(count_src)} "
        f"// 2) AS BIGINT))"
    )


def n_planes_sql(count_src: str = "embeddings") -> str:
    return (
        f"greatest({MIN_PLANES}, {_floor_log2_sql(count_src)} "
        f"- {PLANES_LOG_OFFSET})"
    )


def _ladder_case_sql(count_src: str, idx: int) -> str:
    # branches generated FROM _MINHASH_LADDER (single definition — a
    # rung edit cannot leave the SQL twins stale; review finding)
    c = f"(SELECT count(*) FROM {count_src})"
    branches = " ".join(
        f"WHEN {c} < {cutoff} THEN {br[idx]}"
        for cutoff, br in _MINHASH_LADDER
        if cutoff is not None
    )
    return f"(CASE {branches} ELSE {_MINHASH_LADDER[-1][1][idx]} END)"


def minhash_bands_sql(count_src: str = "documents") -> str:
    return _ladder_case_sql(count_src, 0)


def minhash_rows_sql(count_src: str = "documents") -> str:
    return _ladder_case_sql(count_src, 1)


# --- state-table bucket layout -----------------------------------------
# Bucketed state tables (ivf_state / lsh_state) target ~2^20 rows per
# bucket: enough to keep per-bucket files in the 100 MB class at
# production row widths, few enough that the one-file-per-bucket
# compaction contract stays manageable. Pure layout knob — bucket
# count never changes query RESULTS (both engines are blind to it), so
# there is no SQL twin; the persisted _bucket_spec.json remains the
# source of truth for attach/ingest/compact after build.
MIN_STATE_BUCKETS = 8
STATE_ROWS_PER_BUCKET_LOG = 20


def n_state_buckets(n: int) -> int:
    """Bucket count for an n-row state table: n / 2^20 quantized to a
    power of two, floored at MIN_STATE_BUCKETS (every test scale factor
    resolves to the floor; 10^9 rows -> 512 buckets)."""
    return max(
        MIN_STATE_BUCKETS,
        1 << max(0, floor_log2(n) - STATE_ROWS_PER_BUCKET_LOG),
    )


# --- corpus-count memo --------------------------------------------------
# The derivation needs ONE count per (session, sf_dir, table) — a
# metadata-scale parquet count action at index-BUILD time (exactly when
# a real index builder sizes nlist). Memoized so the registry's many
# per-query plan builds don't re-count; app-id-scoped like the training
# memo so a recreated context re-counts.
_COUNT_MEMO: dict[tuple, int] = {}


def corpus_count(spark, sf_dir: str, tbl: str = "embeddings") -> int:
    from ..catalog import table as _table

    app = spark.sparkContext.applicationId
    key = (app, sf_dir, tbl)
    hit = _COUNT_MEMO.get(key)
    if hit is not None:
        return hit
    for stale in [k for k in _COUNT_MEMO if k[0] != app]:
        del _COUNT_MEMO[stale]
    n = _table(spark, sf_dir, tbl).count()
    _COUNT_MEMO[key] = n
    return n
