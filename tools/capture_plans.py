"""Capture .explain("formatted") for named queries into plans/r12/.

Usage: python tools/capture_plans.py <suffix> <sf_dir> name [name ...]
Writes plans/r12/<name>_<suffix>.txt for each query name.

Uses a bench-conf session (session.get_spark) at local[$SPARK_GRAFT_CPUS]
so plan shapes match what the bench runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from deep_field_spark.queries import load_registry
    from deep_field_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
