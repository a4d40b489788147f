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
