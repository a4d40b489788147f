"""Differential check of the ann_ivfpq_recall chart assembly: the
probe selection, candidate pool, both ranking legs (exact cosine, ADC
sums), brute truth and the recall fold are re-computed in LITERAL
Python from the SAME trained artifacts Spark produced (codebooks,
codes, coarse centroids) and must yield the identical chart.

Seeding the reference with Spark's own artifacts makes the test a
check of the serving/ranking math, independent of trainer tie-breaking
ulps — the training loops have their own oracles (embedding_pq_codes,
ann_ivf_kmeans) and the IVF search has its hypothesis property test."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from deep_field_spark.catalog import spread, table
from deep_field_spark.queries import load_registry
from deep_field_spark.queries.similarity import (
    IVF_CAL_Q,
    IVFPQ_K,
    IVFPQ_M,
    IVFPQ_NPROBE,
    N_CELLS,
    PQR_K,
    _l2_normalized,
    _lloyd_centroids,
    _pq_assign,
    _pq_codebooks,
    _pq_subvectors,
)

REGISTRY = load_registry()


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_chart_matches_literal_python_assembly(spark, sf_dir):
    emb_df = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    emb = {
        r.vec_id: [float(x) for x in r.embedding] for r in emb_df.collect()
    }
    subdim = 64 // IVFPQ_M

    # Spark's own trained artifacts
    cent = {
        r.cid: list(r.c_emb) for r in _lloyd_centroids(emb_df, k=N_CELLS).collect()
    }
    sv = _pq_subvectors(_l2_normalized(emb_df), m=IVFPQ_M)
    pq_df = _pq_codebooks(sv, k=IVFPQ_K)
    cents = {(r.sub, r.cid): list(r.c) for r in pq_df.collect()}
    codes: dict[int, dict[int, int]] = {}
    for r in _pq_assign(sv, pq_df).collect():
        codes.setdefault(r.vec_id, {})[r.sub] = r.cid

    # literal re-assembly
    def norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    asg = {
        i: min(cent, key=lambda c: (-_cos(v, cent[c]), c))
        for i, v in emb.items()
    }
    qids = sorted(
        emb,
        key=lambda i: (hashlib.md5(f"ivfcal:{i}".encode()).hexdigest(), i),
    )[:IVF_CAL_Q]
    hits = {"ivf_exact": 0, "ivfpq_adc": 0}
    for qid in qids:
        qv = emb[qid]
        probes = sorted(cent, key=lambda c: (-_cos(qv, cent[c]), c))[
            :IVFPQ_NPROBE
        ]
        cand = [i for i in emb if asg[i] in probes and i != qid]
        cos = {i: _cos(qv, emb[i]) for i in emb if i != qid}
        brute = set(
            sorted(cos, key=lambda i: (-cos[i], i))[:PQR_K]
        )
        exact = sorted(cand, key=lambda i: (-cos[i], i))[:PQR_K]
        qn = norm(qv)
        adcv = {}
        for i in cand:
            s = 0.0
            for m in range(IVFPQ_M):
                c = cents[(m, codes[i][m])]
                qs = qn[m * subdim:(m + 1) * subdim]
                s += sum((a - b) * (a - b) for a, b in zip(qs, c))
            adcv[i] = s
        adc = sorted(cand, key=lambda i: (adcv[i], i))[:PQR_K]
        hits["ivf_exact"] += len(set(exact) & brute)
        hits["ivfpq_adc"] += len(set(adc) & brute)

    want = {
        leg: (
            len(qids),
            round(h / (len(qids) * PQR_K), 6),
        )
        for leg, h in hits.items()
    }
    got = {
        r.leg: (r.n_queries, r.recall_at_k)
        for r in REGISTRY["ann_ivfpq_recall"].fn(spark, sf_dir).collect()
    }
    assert got == want
