"""Cross-engine numeric parity helpers for statistics queries.

Exact percentile INTERPOLATION is not bit-portable: when (n-1)*q lands
between two distinct values, Spark and DuckDB evaluate the linear blend
in different arithmetic orders and can differ by 1 ulp (measured on the
sf1 ×10 replica: 59.76 vs 59.759999999999994 for the same decile —
duplicated rows make the cut land exactly ON a data value, so the
ulp flips that value's bin and shifts a PSI in the 6th decimal; the
round-10 sf1 correctness spot-run caught exactly this). The cure is to
quantize every cut through DECIMAL before it is used as a bin boundary:
both engines round the same decimal the same way (double round() itself
diverges on ties — the repo-wide decimal-round discipline), so the
binning predicate compares against the identical double everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# quantization: double -> DECIMAL(28,10) (exact decimal snap well below
# any data resolution) -> round to 6 dp (decimal arithmetic, identical
# half-away-from-zero in Spark and DuckDB) -> double (6-dp decimals
# convert to the same double in both engines)
CUT_DECIMALS = 6


def quantized_cuts(cuts: Column) -> Column:
    """Quantize an array<double> of percentile cuts for cross-engine
    bin-boundary parity."""
    return F.transform(
        cuts,
        lambda c: F.round(c.cast("decimal(28,10)"), CUT_DECIMALS).cast(
            "double"
        ),
    )


def quantized_cuts_sql(expr: str) -> str:
    """DuckDB twin of quantized_cuts over a DOUBLE[] expression."""
    return (
        f"list_transform({expr}, x -> CAST(round(CAST(x AS "
        f"DECIMAL(28,10)), {CUT_DECIMALS}) AS DOUBLE))"
    )
