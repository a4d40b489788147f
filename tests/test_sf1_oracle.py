"""sf1-replica oracle sweep — `pytest -m sf1` (excluded from the
default run via pytest.ini addopts).

The r10 round's one-off 21-query sf1 hash-match run caught a REAL
scale-dependent bug (percentile interpolation flipping a PSI bin on
×10 data — functions/stats.py); the r10 verdict's #5 asks for that run
to be repeatable instead of prose. This suite:

1. builds (once, cached under /tmp) a ×10 key-shifted replica of the
   driver's sf0.1 testdata via tools/gen_scaled_replica.py — 6M
   lineitem / 50k documents / 20k embeddings, the first scale where
   the derived index knobs leave their floors by a full ladder step
   (k=128, planes=11) AND the bounded training sample BINDS
   (cap=64·128=8192 < 20k, functions/scaling.py), so both engines
   replay the off-floor, sampled branches end-to-end;
2. re-runs the one-per-family query list of the r10 spot-run (plus
   the round-11 ann_train_autocap binding-branch chart) against the
   DuckDB oracles on the replica.

Run:  python -m pytest -m sf1 tests/test_sf1_oracle.py -q
(~10 min generation on first run, cached after; the sweep itself is
minutes — budget accordingly.)
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from deep_field_spark.queries import load_registry
from tests.oracle_utils import compare, duckdb_connect

pytestmark = pytest.mark.sf1

REGISTRY = load_registry()

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/dfs_sf1_replica")
SRC_DIR = "/root/testdata/sf0.1"
FACTOR = 10

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# one per family — the r10 spot-run list (SCALE.md), plus the
# round-11 sampled-trainer chart whose binding branch only exists here
SF1_QUERIES = [
    "ann_ivf_autok",
    "ann_train_autocap",
    "ann_hier_assign",
    "ann_hier_recall",
    # r12: cell-split rebalance — at this scale the split set is the
    # top quartile of 128 live cells and the sub-trainers run over
    # thousands of moved rows, the first scale where the maintenance
    # verb's localized-cost claim is load-bearing
    "ann_cell_split",
    # r12: the symmetric merge verb at the same binding scale (the
    # bottom quartile of 128 live cells retires into survivors)
    "ann_cell_merge",
    "dedup_minhash_autok",
    "ann_ivf_kmeans",
    "ann_ivfpq_search",
    # every family whose bounded training sample BINDS at this scale
    # must have a row here: lloyd_full/pq_norm (ann_ivfpq_search),
    # lloyd_sem_aug (dedup_semantic), pq_raw (embedding_pq_codes),
    # pq_resid (ann_ivfpq_residual_recall)
    "dedup_semantic",
    "embedding_pq_codes",
    "ann_ivfpq_residual_recall",
    "ann_incremental_ivf",
    "retrieval_eval_ndcg",
    "graph_pagerank",
    "curation_quality_train",
    "text_bpe_train",
    "dq_distribution_drift",
    "dq_distribution_drift_approx",
    "multimodal_video_luma",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "corpus_split_dedup_aware",
    "decontam_bloom",
    "q1_pricing_summary",
    "q18_large_volume_customer",
    "join_skew_salted",
    "events_anomaly_mad",
    "incr_agg_refresh",
    "events_scd2_intervals",
]


def test_sf1_list_is_registered():
    missing = [n for n in SF1_QUERIES if n not in REGISTRY]
    assert not missing, missing
    no_oracle = [n for n in SF1_QUERIES if REGISTRY[n].oracle is None]
    assert not no_oracle, no_oracle


@pytest.fixture(scope="module")
def sf1_dir():
    if not all(
        os.path.exists(f"{SF1_DIR}/{t}.parquet") for t in TABLES
    ):
        subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.dirname(__file__)),
                    "tools",
                    "gen_scaled_replica.py",
                ),
                SRC_DIR,
                SF1_DIR,
                str(FACTOR),
            ],
            check=True,
        )
    return SF1_DIR


@pytest.fixture(scope="module")
def con1(sf1_dir):
    c = duckdb_connect(sf1_dir)
    yield c
    c.close()


def test_replica_is_off_floor_and_binding(sf1_dir):
    from deep_field_spark.functions import scaling

    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf1_dir}/embeddings.parquet/*.parquet'"
    ).fetchone()[0]
    k = scaling.n_cells(n)
    assert k > scaling.MIN_CELLS, "replica must leave the k floor"
    assert n > scaling.train_cap(k), (
        "replica must put the coarse trainer on the BINDING sample "
        "branch — the property this suite exists to exercise"
    )


@pytest.mark.parametrize("name", SF1_QUERIES)
def test_sf1_query_matches_oracle(name, spark, sf1_dir, con1):
    q = REGISTRY[name]
    compare(q.fn(spark, sf1_dir), con1, q.oracle)
