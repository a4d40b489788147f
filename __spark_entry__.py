"""Driver contract for the spark-graft builder (PySpark target).

Thin view over deep_field_spark.queries.REGISTRY: every implemented
operator from SURVEY.md §2 registers a Spark callable and (when
SQL-expressible) a DuckDB oracle SQL twin with matching column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deep_field_spark.queries import load_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    reg = load_registry()
    return reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _with_cache_reset(fn: Callable[[SparkSession, str], DataFrame]):
    """A few queries persist() reused vocab-bounded intermediates
    (text_tfidf_topk, text_unigram/bigram_logprob); their cache must
    outlive this call (the driver runs the action afterwards), so they
    cannot unpersist themselves. Clearing the session cache at the
    START of the next query bounds accumulation across the driver's
    100-query session to one query's working set."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_cache_reset(q.fn) for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_registry().items() if q.oracle is not None}
