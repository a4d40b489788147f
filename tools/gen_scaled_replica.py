#!/usr/bin/env python
"""Generate a key-shifted xN replica of a driver testdata directory
for SCALE SPOT-RUNS (perf only — never for oracle correctness, which
stays on the driver's own parquet).

    python tools/gen_scaled_replica.py SRC_DIR DEST_DIR FACTOR

Every scale-proportional table is unioned FACTOR times with copy i's
keys shifted by i * (max_key + 1) — keys are dense 0..N-1 in the
driver data — so join fan-outs, group cardinalities that derive from
keys, and FK relationships scale the way a larger driver corpus
would, while categorical vocabularies (event_type, brands, nations,
labels) stay fixed exactly as TPC-H scaling does. Foreign keys shift
by their referenced table's stride, so every lineitem still finds its
order/part/supplier and every order its customer. embeddings.vec_id
shifts by the DOCUMENTS stride to preserve the vec_id ⊆ doc_id
alignment the retrieval queries rely on. documents.text gets a
per-copy suffix token (n_chars re-derived) so the near-dup corpus
density stays the template soup it already is instead of becoming
FACTOR-way exact duplicates; embeddings are value-identical copies
(per-query top-k stays bounded regardless). region/nation are fixed
vocabularies and copy through unchanged.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_field_spark.session import get_spark  # noqa: E402

# table -> (primary key, {fk_col: referenced_table})
SCALED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,  # no per-row pk; rows replicate with shifted FKs
        {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    ),
    "events": ("event_id", {"user_id": "_user"}),
    "documents": ("doc_id", {}),
    "embeddings": (None, {"vec_id": "documents"}),
}
FIXED = ("region", "nation")


def main() -> None:
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("gen_scaled_replica")
    os.makedirs(dest, exist_ok=True)

    strides: dict[str, int] = {}
    for t, (pk, _fks) in SCALED.items():
        if pk is not None:
            strides[t] = (
                spark.read.parquet(f"{src}/{t}.parquet")
                .agg(F.max(pk)).first()[0] + 1
            )
    strides["_user"] = (
        spark.read.parquet(f"{src}/events.parquet")
        .agg(F.max("user_id")).first()[0] + 1
    )

    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dest}/{t}.parquet")

    for t, (pk, fks) in SCALED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(factor):
            c = df
            if pk is not None:
                c = c.withColumn(pk, F.col(pk) + i * strides[t])
            for col, ref in fks.items():
                c = c.withColumn(col, F.col(col) + i * strides[ref])
            if t == "documents" and i > 0:
                # copy 0 stays byte-identical to the source (a x1
                # replica must reproduce it exactly); later copies get
                # a suffix token so near-dup density stays the template
                # soup instead of FACTOR-way exact duplicates
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                ).withColumn("n_chars", F.length("text"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        # count from the written footers — recomputing the union for a
        # stderr log would double the generation cost
        n = spark.read.parquet(f"{dest}/{t}.parquet").count()
        print(f"{t}: {n} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
