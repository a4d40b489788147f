"""Graph queries: fixed-iteration PageRank over the order graph.

The iterative-algorithm family alongside connected components
(operators/components.py), Lloyd's k-means (queries/similarity.py)
and logistic-regression training (queries/curation.py): a per-round
message-passing agg with DECIMAL-exact sums and a requantized state,
so a DuckDB oracle replays the whole loop and the converged values
are hash-checked, not eyeballed.

Curation relevance: PageRank-style link centrality is a standard
web-corpus quality signal (host/domain authority weighting in crawl
curation); here the graph is the bipartite customer↔supplier order
graph the TPC-H-ish testdata actually has.

Reference parity note: the reference has no graph operators (it is a
fixed 3-level scrape hierarchy, SURVEY §1.1); this extends the
LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.iterate import iter_checkpoint, pinned_loop
from . import register

PR_ITERS = 5
PR_DAMPING = 0.85
SUPP_OFFSET = 1_000_000  # supplier node id = offset + suppkey


def _pr_ctes() -> str:
    """Unrolled PageRank CTE chain: r0..r{PR_ITERS} over `edges`."""
    parts = [
        f"""e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, {SUPP_OFFSET} + s AS dst FROM e0
              UNION ALL
              SELECT {SUPP_OFFSET} + s, c FROM e0),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / nn.n AS rank
           FROM deg, nn)"""
    ]
    for it in range(1, PR_ITERS + 1):
        parts.append(f"""m{it} AS (
      SELECT e.dst, r.rank / d.deg AS contrib
      FROM edges e JOIN r{it - 1} r ON e.src = r.node
                   JOIN deg d ON e.src = d.src),
    a{it} AS (SELECT dst, CAST(sum(CAST(contrib AS DECIMAL(38,18)))
                               AS DOUBLE) AS s
              FROM m{it} GROUP BY 1),
    r{it} AS (SELECT d.src AS node,
                     CAST(CAST(CAST(0.15 AS DOUBLE) / nn.n
                               + CAST(0.85 AS DOUBLE) * coalesce(a.s, 0.0)
                          AS DECIMAL(38,18)) AS DOUBLE) AS rank
              FROM deg d CROSS JOIN nn LEFT JOIN a{it} a ON d.src = a.dst)""")
    return ",\n    ".join(parts)


@register(
    "graph_pagerank",
    oracle=f"""
    WITH {_pr_ctes()}
    SELECT node,
           CASE WHEN node >= {SUPP_OFFSET} THEN 'supplier'
                ELSE 'customer' END AS node_type,
           round(rank * nn.n, 6) AS centrality
    FROM r{PR_ITERS}, nn
    """,
    doc=f"Fixed-{PR_ITERS}-iteration PageRank (d={PR_DAMPING}) over the "
        "undirected bipartite customer↔supplier order graph — link "
        "centrality as a curation quality signal. Each round is one "
        "message-passing hash agg: contributions rank/deg flow along "
        "edges, in-sums are DECIMAL(38,18)-exact (partial-agg order "
        "cannot change a bit), the new rank requantizes to "
        "DECIMAL(38,18) so iteration inputs stay bit-identical across "
        "engines, and the teleport term keeps the distribution "
        "stochastic (undirected edges mean no dangling mass). The "
        "edge list is built once with severed lineage and the rank "
        "state re-checkpoints per round (flat plans); a round shuffles "
        "(node, partial-sum) pairs only, never the edge payload. "
        "Output is every node's centrality scaled by N (scale-free "
        "units). The oracle replays the whole loop unrolled.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # Iterative-loop state discipline: edges/deg/N are materialized
    # ONCE with severed lineage, and the rank table re-checkpoints per
    # round — otherwise round N's plan contains rounds 1..N-1 as
    # subtrees (O(iters²) stages), which a default-conf 200-partition
    # session turns into minutes of pure scheduling. iter_checkpoint
    # upgrades to reliable checkpoints when the session has a
    # checkpoint dir (the cluster posture, SCALE.md).
    edges = e0.select(
        F.col("c").alias("src"), (F.lit(SUPP_OFFSET) + F.col("s")).alias("dst")
    ).unionAll(
        e0.select(
            (F.lit(SUPP_OFFSET) + F.col("s")).alias("src"), F.col("c").alias("dst")
        )
    )
    # Loop-partitioning discipline (guide §2.4): the edge table is
    # hash-partitioned AND sorted on the per-round join key ONCE, at
    # build time, and checkpoint preserves both (LogicalRDD keeps the
    # physical plan's outputPartitioning/outputOrdering) — so every
    # round's edges⋈state sort-merge join re-shuffles and re-sorts
    # only the node-sized state, never the edge payload. The explicit
    # partition count pins the layout across rounds (an AQE-coalesced
    # count would be decided per materialization) and is derived from
    # the edge volume (scaling.loop_partitions) — |edges| <= 2x the
    # lineitem metadata count, ~24 B/row (two packed longs): a count
    # pinned to the core count paid ~6 stages x 32 tasks of scheduling
    # per round on a 23 MB edge table at sf0.1.
    from ..functions import scaling

    n_part = scaling.loop_partitions(
        spark, 2 * scaling.corpus_count(spark, sf_dir, "lineitem"), 24
    )
    edges = iter_checkpoint(
        edges.repartition(n_part, "src").sortWithinPartitions("src")
    )
    # One static node table carrying every per-node constant the loop
    # and the final projection need: degree, the teleport term 0.15/N
    # and N itself — computed once instead of a broadcast crossJoin
    # per round (same doubles: 0.15/n was a per-row double division
    # before too). Co-partitioned and pre-sorted like edges.
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n_df = iter_checkpoint(deg.agg(F.count("*").alias("n")))
    nodes = iter_checkpoint(
        deg.crossJoin(F.broadcast(n_df))
        .select(
            "src",
            "deg",
            (F.lit(0.15) / F.col("n")).alias("tele"),
            "n",
        )
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
    )
    state = nodes.select(
        F.col("src").alias("node"),
        "deg",
        (F.lit(1.0) / F.col("n")).alias("rank"),
    )
    # pinned_loop: the loop layout is statically derived (n_part) and
    # checkpoint-pinned, so AQE's per-Exchange stage barriers are pure
    # per-round driver overhead here (measured −35% on the 5 rounds at
    # sf0.1, interleaved A/B, identical results; see iterate.pinned_loop)
    with pinned_loop(spark):
        for _ in range(PR_ITERS):
            # state carries (node, deg, rank), so contrib = rank/deg
            # needs no second join against deg inside the round
            msg = edges.join(state, edges.src == F.col("node")).select(
                "dst", (F.col("rank") / F.col("deg")).alias("contrib")
            )
            agg = msg.groupBy("dst").agg(
                F.sum(F.col("contrib").cast("decimal(38,18)")).cast("double").alias("s")
            )
            state = nodes.join(agg, nodes.src == agg.dst, "left").select(
                F.col("src").alias("node"),
                "deg",
                (F.col("tele") + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0)))
                .cast("decimal(38,18)")
                .cast("double")
                .alias("rank"),
            )
            state = iter_checkpoint(state)
    return state.crossJoin(F.broadcast(n_df)).select(
        "node",
        F.when(F.col("node") >= SUPP_OFFSET, "supplier")
        .otherwise("customer")
        .alias("node_type"),
        F.round(F.col("rank") * F.col("n"), 6).alias("centrality"),
    )
