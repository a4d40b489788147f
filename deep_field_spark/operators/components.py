"""Connected components over a near-duplicate pair set.

Pair-level dedup (MinHash/SimHash/embedding) emits edges; collapsing a
corpus needs the transitive closure — doc A~B, B~C must all fold into
one cluster even though (A, C) was never a candidate pair. This is the
min-label-propagation form (each vertex repeatedly adopts the smallest
component id among itself and its neighbors) — the iterative-algorithm
shape Spark expresses as a join loop:

  - state is a DataFrame (vertex, comp); each round is one shuffle-join
    + groupBy-min, fully distributed — the driver only checks the
    converged? counter.
  - each round also pointer-jumps (comp := comp[comp]), so label
    chains collapse geometrically: O(log n) rounds even on path
    graphs, ~2-3 rounds for real near-dup clusters.
  - each round severs the state's lineage (iter_checkpoint): without
    it the plan doubles per iteration and Catalyst analysis — not the
    data — becomes the bottleneck. With a session checkpoint dir set
    the severing is a reliable checkpoint, surviving executor loss
    mid-loop (cluster posture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import iter_checkpoint


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) for every vertex in ``pairs``; component =
    the smallest vertex id in its connected component."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct()
    edges = iter_checkpoint(edges)

    labels = iter_checkpoint(
        edges.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("comp"))
    )
    for _ in range(max_iter):
        # (1) adopt the smallest neighbor label
        neighbor_min = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        stepped = labels.join(
            neighbor_min, labels.v == neighbor_min.src, "left"
        ).select(
            "v",
            F.col("comp").alias("old_comp"),
            F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # (2) pointer jump (path halving): comp := comp[comp]. Pure
        # neighbor propagation needs diameter rounds; the jump makes
        # label chains collapse geometrically — O(log n) rounds even
        # for path graphs.
        ptr = stepped.select(F.col("v").alias("cv"), F.col("comp").alias("ccomp"))
        jumped = iter_checkpoint(
            stepped.join(ptr, stepped.comp == ptr.cv, "left")
            .select(
                "v",
                "old_comp",
                F.coalesce(F.col("ccomp"), F.col("comp")).alias("comp"),
            )
        )
        n_changed = jumped.filter(F.col("comp") != F.col("old_comp")).count()
        labels = jumped.select("v", "comp")
        if n_changed == 0:
            break
    return labels.select(F.col("v"), F.col("comp"))
