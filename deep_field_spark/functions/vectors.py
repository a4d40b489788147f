"""Vector math over ``array<float>`` embedding columns.

All JVM-side expressions (zip_with / aggregate) — no UDF, so they stay
inside whole-stage codegen and scale linearly with partition count.
Accumulation is in double, index order, which is deterministic and
matches an index-ordered SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---- shuffle-free nearest-centroid primitives ------------------------
#
# Every coarse/PQ assignment here used to be
#   vecs.crossJoin(broadcast(cent)) + row_number() OVER (PARTITION BY id)
# which materializes n·k scored rows and shuffles + sorts ALL of them
# (the window's Exchange hashpartitioning(id) carries the vector
# payload k times). The same argmax is computable per ROW with
# higher-order functions over the k-row table collected into ONE
# array-typed row and broadcast: zero Exchange, zero Sort, no n·k
# intermediate. Ordering equivalences (pinned by the DuckDB oracles,
# which replay the window form):
#   array_max(struct(cos, -cid))  ==  ORDER BY cos DESC, cid  — Spark
#     sorts NaN greatest, so a NaN cosine wins either way; ties on cos
#     pick the LOWEST cid because -cid is maximized.
#   array_min(struct(d, cid))     ==  ORDER BY d ASC, cid     — NaN d
#     is greatest and never picked in either form.
#   reverse(array_sort(struct(cos, -cid)))[:p]  ==  the window's
#     rn <= p prefix under ORDER BY cos DESC, cid (array_sort ascends
#     with NaN last; reversing puts NaN first like DESC does).


def centroid_struct_array(
    cent, cid_col: str = "cid", emb_col: str = "c_emb", out: str = "_cents"
):
    """Collapse a k-row (cid, c_emb) table to ONE row holding a
    cid-ascending ``array<struct<cid, c_emb>>`` — the broadcast side
    of the per-row assignment primitives. sort_array makes the array
    deterministic (collect_list order is not)."""
    return cent.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(cid_col).alias("cid"), F.col(emb_col).alias("c_emb")
                )
            )
        ).alias(out)
    )


def scored_cents(vec: Column, arr: Column) -> Column:
    """array<struct<s: cosine, nc: -cid>> — one entry per centroid."""
    return F.transform(
        arr,
        lambda c: F.struct(
            cosine(vec, c["c_emb"]).alias("s"), (-c["cid"]).alias("nc")
        ),
    )


def argmax_cos_cid(vec: Column, arr: Column) -> Column:
    """cid of the max-cosine centroid, ties to the LOWEST cid —
    bit-identical to row_number() OVER (ORDER BY cos DESC, cid) = 1."""
    return -F.array_max(scored_cents(vec, arr))["nc"]


def top_cos_structs(vec: Column, arr: Column, p: int) -> Column:
    """The p best struct<s, nc> by (cos DESC, cid ASC) — posexplode
    for (rank-1, struct); cid = -nc, cos = s."""
    return F.slice(F.reverse(F.array_sort(scored_cents(vec, arr))), 1, p)


def argmin_l2_cid(sv: Column, arr: Column) -> Column:
    """cid of the min-L2 code in ``array<struct<cid, c>>``, ties to the
    LOWEST cid — bit-identical to row_number() OVER (ORDER BY d, cid)
    = 1 where d is the index-ordered squared-distance sum."""
    scored = F.transform(
        arr,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(sv, c["c"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, t: a + t,
            ).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_min(scored)["cid"]


def hyperplane_signs(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane components: sign of the top bit of
    md5(f"plane-{j}-{i}")'s first hex digit. Shared by the Spark
    expression and the SQL oracle (inlined as literal arrays)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"plane-{j}-{i}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def hyperplane_projections(vec: Column, dim: int, n_planes: int) -> list[Column]:
    """Per-plane signed projections ``vec · plane_j`` (double, index-
    ordered accumulation). The sign gives the bucket bit; the magnitude
    is the margin multi-probe uses to pick which bits to flip."""
    all_signs = hyperplane_signs(dim, n_planes)
    return [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in all_signs[j]]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for j in range(n_planes)
    ]


def hyperplane_sign_bucket(vec: Column, dim: int, n_planes: int) -> Column:
    """Random-hyperplane LSH bucket id (deterministic seed).

    Returns an int bucket in [0, 2**n_planes). Cosine-similar vectors
    collide with high probability, giving the scale path for ANN: group
    by bucket, brute-force only within buckets.
    """
    bucket = F.lit(0)
    for j, proj in enumerate(hyperplane_projections(vec, dim, n_planes)):
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(0)
    return bucket
