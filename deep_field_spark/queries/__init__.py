"""Named query registry.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators) registers here as a ``Query``: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. The driver contract
(``__spark_entry__.py``) is a thin view over this registry.

Column-name discipline: the Spark DataFrame and the oracle SQL must
produce identical column names (the driver sorts columns by name before
value-hashing) — alias everything on both sides.

Float discipline: aggregates over doubles are rounded (2 dp for money,
4-6 dp for ratios) on BOTH sides so summation-order ulp differences
between Spark and DuckDB cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


_LOADED = False


def load_registry() -> dict[str, Query]:
    """Import all query modules (side effect: populate REGISTRY)."""
    global _LOADED
    if not _LOADED:
        from . import relational  # noqa: F401
        from . import text  # noqa: F401
        from . import curation  # noqa: F401
        from . import dedup  # noqa: F401
        from . import similarity  # noqa: F401
        from . import events  # noqa: F401
        from . import multimodal  # noqa: F401
        from . import scrape  # noqa: F401
        from . import udfs  # noqa: F401
        _LOADED = True
    return REGISTRY
