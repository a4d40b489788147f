"""Bounded deterministic training sample (functions/scaling.py +
queries/similarity._training_sample): the r10 verdict's #2 — Lloyd/PQ
training cost must be O(cap·k·iters) at every corpus size, with the
sample selection exactly replayable cross-engine.

The important property these tests pin is the BINDING branch: at every
driver gate scale the predicate keeps the whole corpus (n <= cap), so
a bug in the sample arithmetic would be invisible there. Here the cap
is forced BELOW the sf0.01 corpus size, and the sampled trainers are
compared field-exact against the DuckDB replay of the same predicate —
the same parity the sf1 replica exercises with the real derived caps.
"""

from __future__ import annotations

import duckdb
import pytest

from deep_field_spark.functions import scaling
from deep_field_spark.queries.similarity import (
    IVFPQ_K,
    IVFPQ_M,
    KMEANS_ITERS,
    PQ_ITERS,
    _emb_frame,
    _kmeans_ctes,
    _l2_normalized,
    _lloyd_centroids,
    _pq_codebooks,
    _pq_ctes,
    _pq_subvectors,
    _training_sample,
)

from oracle_utils import duckdb_connect

SEED_K = 16


def _python_members(n: int, cap: int, tag: str, seed_k: int) -> set[int]:
    return {
        i
        for i in range(n)
        if i < seed_k
        or scaling.train_sample_u32(tag, i) * n < cap * (1 << 32)
    }


@pytest.mark.parametrize(
    "n,cap",
    [(500, 128), (500, 499), (500, 500), (500, 501), (1000, 64), (64, 64)],
)
def test_predicate_membership_parity(n, cap):
    """Python arithmetic == DuckDB train_sample_pred_sql, member by
    member, including the n == cap boundary (keeps everything) and
    n == cap + 1 (first corpus size where the bound can drop a row)."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ids AS SELECT unnest(range({n})) AS vec_id")
    pred = scaling.train_sample_pred_sql(
        "lloydtrain", "ids", str(cap), seed_lt_sql=str(SEED_K)
    )
    sql_members = {
        r[0]
        for r in con.execute(f"SELECT vec_id FROM ids WHERE {pred}").fetchall()
    }
    assert sql_members == _python_members(n, cap, "lloydtrain", SEED_K)
    if n <= cap:
        assert len(sql_members) == n, "n <= cap must keep the whole corpus"


def test_seeds_always_kept():
    members = _python_members(5000, 64, "lloydtrain", SEED_K)
    assert set(range(SEED_K)) <= members


def test_sample_size_tracks_cap():
    """The md5 threshold is uniform: the sample lands near cap (within
    4 sigma of the binomial) — a sanity pin that the u32 scaling isn't
    off by a power of two."""
    n, cap = 20_000, 1024
    got = len(_python_members(n, cap, "lloydtrain", SEED_K))
    sigma = (cap * (1 - cap / n)) ** 0.5
    assert abs(got - cap) < 4 * sigma + SEED_K, (got, cap)


def test_sample_is_noop_object_at_gate(spark, sf_dir):
    """n_src <= cap returns the INPUT FRAME ITSELF — results and plans
    byte-identical to the unsampled form (the plan pins in
    test_plans.py depend on this)."""
    emb = _emb_frame(spark, sf_dir)
    out = _training_sample(emb, tag="lloydtrain", k=16, cap=1024, n_src=500)
    assert out is emb


def test_binding_branch_lloyd_parity(spark, sf_dir):
    """Force cap below the sf0.01 corpus (500 > 128): the SAMPLED Lloyd
    trainer must equal the DuckDB replay of _kmeans_ctes with the same
    cap, field-exact."""
    emb = _emb_frame(spark, sf_dir)
    sample = _training_sample(
        emb, tag="lloydtrain", k=SEED_K, cap=128, n_src=500
    )
    n_sample = sample.count()
    assert SEED_K <= n_sample < 500, "cap=128 must actually bind at n=500"
    got = {
        r.cid: tuple(round(x, 9) for x in r.c_emb)
        for r in _lloyd_centroids(sample, k=SEED_K).collect()
    }
    con = duckdb_connect(sf_dir)
    want = {
        r[0]: tuple(round(x, 9) for x in r[1])
        for r in con.execute(
            f"WITH {_kmeans_ctes('embeddings', sample_cap_sql='128')} "
            f"SELECT cid, c FROM cent{KMEANS_ITERS}"
        ).fetchall()
    }
    assert got == want


def test_binding_branch_pq_parity(spark, sf_dir):
    """Same, for the PQ codebook trainer (normalized posture, cap=64)."""
    nemb = _l2_normalized(_emb_frame(spark, sf_dir))
    n_src = nemb.count()
    sample = _training_sample(
        nemb, tag="pqtrain", k=IVFPQ_K, cap=64, n_src=n_src
    )
    assert IVFPQ_K <= sample.count() < n_src
    got = {
        (r.sub, r.cid): tuple(round(x, 9) for x in r.c)
        for r in _pq_codebooks(
            _pq_subvectors(sample, m=IVFPQ_M), k=IVFPQ_K
        ).collect()
    }
    con = duckdb_connect(sf_dir)
    ctes = _pq_ctes(
        normalized=True, m=IVFPQ_M, k=IVFPQ_K, sample_cap_sql="64"
    )
    want = {
        (r[0], r[1]): tuple(round(x, 9) for x in r[2])
        for r in con.execute(
            f"WITH {ctes} SELECT sub, cid, c FROM pc{PQ_ITERS}"
        ).fetchall()
    }
    assert got == want


def test_trainer_caps_do_not_bind_at_gate(spark, sf_dir):
    """Document WHY every gate-scale driver row stays byte-identical:
    at sf0.01 (500 embeddings) every real derived cap exceeds the
    corpus, so the production trainers run unsampled."""
    n = scaling.corpus_count(spark, sf_dir, "embeddings")
    k = scaling.n_cells(n)
    assert n <= scaling.train_cap(k)
    assert n <= scaling.train_cap(IVFPQ_K, scaling.TRAIN_PER_CODE)


def test_binding_sample_plans_as_scan_filter(spark, sf_dir):
    """The sample must stay a SCAN-LEVEL filter — never a global
    md5-top-N (TakeOrderedAndProject funnels cap rows through one node
    at every scale) and never an extra exchange."""
    emb = _emb_frame(spark, sf_dir)
    s = _training_sample(emb, tag="lloydtrain", k=16, cap=128, n_src=500)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert "Sort" not in plan
    base = _emb_frame(spark, sf_dir)
    base_plan = base._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base_plan.count("Exchange"), (
        "the sample predicate added a shuffle"
    )
    assert any(
        "Filter" in line and "md5" in line for line in plan.splitlines()
    ), "sample predicate not planned as a filter"
