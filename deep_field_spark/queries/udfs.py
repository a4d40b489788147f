"""UDAF / UDTF surface (SURVEY §2.10 parity).

The reference's "UDFs" are its row-at-a-time transforms (re-expressed
as column expressions elsewhere); these cover the remaining Python
extension points a Spark user has:

  - pandas grouped-agg UDAF (Arrow-batched, one scalar per group)
  - Python UDTF (one row → many rows) via LATERAL join
  - grouped-map applyInPandas (whole group in, frame out)
  - cogrouped-map applyInPandas (two keyed sides merged per group)

Determinism discipline: the UDAF sums pre-scaled int64 cents (exact,
order-independent) rather than floats, so the DuckDB oracle matches
bit-for-bit; the UDTF split regex avoids lookbehind (RE2-compatible)
so both engines split identically.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import table
from . import register


def _make_sum_cents():
    """Grouped-agg pandas UDAF: exact int64 sum per group. Arrow moves
    each group's column as one batch; int addition is order-free so
    partial-agg scheduling can never change the answer. (Built lazily:
    the decorator needs an active SparkSession.)"""

    @pandas_udf("bigint")
    def _sum_cents(cents: pd.Series) -> int:
        return int(cents.sum())

    @pandas_udf("bigint")
    def _count_rows(cents: pd.Series) -> int:
        # Spark refuses mixing pandas grouped-aggs with JVM aggregates
        # in one agg(), so the count is a pandas UDAF too.
        return int(len(cents))

    return _sum_cents, _count_rows


@register(
    "udaf_grouped_pandas",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
    doc="Pandas grouped-agg UDAF (SURVEY §2.10): per-event-type average "
        "via an Arrow-batched int64-cents sum UDAF — exact arithmetic, "
        "hash-checked. At scale the UDAF cost is one Arrow transfer per "
        "group partition; prefer built-ins unless custom logic is real.",
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    sum_cents, count_rows = _make_sum_cents()
    out = ev.groupBy("event_type").agg(
        count_rows(F.col("cents")).alias("n"),
        sum_cents(F.col("cents")).alias("sum_cents"),
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("sum_cents").cast("double") / (100.0 * F.col("n")), 4).alias(
            "avg_value"
        ),
    )


def _make_split_sentences():
    """Python UDTF: one document row → one row per sentence (built
    lazily — the decorator needs an active SparkSession)."""

    @udtf(returnType="sentence_num int, sentence string, n_chars int")
    class _SplitSentences:
        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            for i, s in enumerate(re.split(r"\.\s+", text)):
                yield i, s, len(s)

    return _SplitSentences


@register(
    "udtf_sentences",
    oracle="""
    WITH s AS (
      SELECT doc_id, string_split_regex(text, '\\.\\s+') AS parts
      FROM documents WHERE doc_id % 20 = 0),
    u AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(parts) + 1),
                    i -> struct_pack(num := i - 1, s := parts[i]))) AS x
      FROM s)
    SELECT doc_id, CAST(x.num AS INT) AS sentence_num, x.s AS sentence,
           CAST(strlen(x.s) AS INT) AS n_chars
    FROM u
    """,
    doc="Python UDTF via LATERAL join (SURVEY §2.10): sentence splitting "
        "— the one-page→many-rows shape the reference's play extraction "
        "has (its production twin is the ARRAY<STRUCT>+explode parse "
        "UDF, which is the faster Arrow path; the UDTF is the API-parity "
        "form). RE2-safe split regex so DuckDB replays it exactly.",
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_sentences", _make_split_sentences())
    return spark.sql(
        """
        SELECT d.doc_id, t.sentence_num, t.sentence, t.n_chars
        FROM udtf_docs d, LATERAL split_sentences(d.text) t
        """
    )


def _median_gap_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map body: per-user median inter-arrival gap in µs.

    Deterministic by construction: the group sorts on (us, event_id)
    before differencing, so partition/arrival order cannot change the
    answer; int64 µs in, exact median (avg of two middles at even
    counts) out.
    """
    pdf = pdf.sort_values(["us", "event_id"])
    gaps = pdf["us"].diff().dropna()
    if len(gaps) == 0:
        return pd.DataFrame(columns=["user_id", "n_gaps", "median_gap_us"])
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_gaps": [int(len(gaps))],
            "median_gap_us": [round(float(gaps.median()), 1)],
        }
    )


@register(
    "grouped_map_interarrival",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap
      FROM events)
    SELECT user_id,
           CAST(count(gap) AS INT) AS n_gaps,
           round(median(gap), 1) AS median_gap_us
    FROM g WHERE gap IS NOT NULL GROUP BY user_id
    """,
    doc="Grouped-map applyInPandas (SURVEY §2.10 — the stateless "
        "grouped twin of applyInPandasWithState): per-user median "
        "inter-arrival gap. Median needs the whole sorted group — "
        "exactly the computation grouped-map exists for. Timestamps "
        "enter the UDF pre-converted to int64 µs (ts_micros), so the "
        "Arrow batch carries plain longs and the arithmetic is exact "
        "on any session/timestamp type. One shuffle on user_id; group "
        "size bounds worker memory (a power-user group must fit one "
        "pandas frame — the documented applyInPandas contract).",
)
def grouped_map_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import ts_micros

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_micros(F.col("ts")).alias("us")
    )
    return ev.groupBy("user_id").applyInPandas(
        _median_gap_fn, "user_id long, n_gaps int, median_gap_us double"
    )


# cogroup parallelism for the as-of merge: one pandas frame holds
# ~1/ASOF_BUCKETS of all users' purchase+view rows — size it so a
# bucket fits executor memory at the target user population
ASOF_BUCKETS = 64


def _asof_cogroup_fn(key, purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
    """Backward as-of merge of every purchase against the latest
    at-or-before view of the SAME user, vectorized across all users of
    one hash bucket: ``pd.merge_asof(..., left_by/right_by)`` does the
    per-user grouping inside pandas, so the number of cogroups (and
    their Arrow round-trips) is bounded by the bucket count, not the
    user count."""
    out_empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "purchase_id": pd.Series(dtype="Int64"),
            "view_id": pd.Series(dtype="Int64"),
            "gap_us": pd.Series(dtype="Int64"),
        }
    )
    if purchases.empty:
        return out_empty
    p = purchases.sort_values("us", kind="mergesort").reset_index(drop=True)
    if views.empty:
        return pd.DataFrame(
            {
                "user_id": p["user_id"],
                "purchase_id": p["purchase_id"].astype("Int64"),
                "view_id": pd.array([None] * len(p), dtype="Int64"),
                "gap_us": pd.array([None] * len(p), dtype="Int64"),
            }
        )
    v = (
        views.sort_values("us", kind="mergesort")
        .reset_index(drop=True)[["v_user_id", "us", "view_id"]]
        .rename(columns={"us": "v_us"})
    )
    m = pd.merge_asof(
        p, v, left_on="us", right_on="v_us",
        left_by="user_id", right_by="v_user_id", direction="backward",
    )
    return pd.DataFrame(
        {
            "user_id": m["user_id"],
            "purchase_id": m["purchase_id"].astype("Int64"),
            "view_id": m["view_id"].astype("Int64"),
            "gap_us": (m["us"] - m["v_us"]).astype("Int64"),
        }
    )


@register(
    "cogrouped_map_asof",
    oracle="""
    WITH v0 AS (SELECT user_id, epoch_us(ts) AS us,
                       CAST(max(event_id) AS BIGINT) AS view_id
                FROM events WHERE event_type = 'view' GROUP BY 1, 2),
    p0 AS (SELECT user_id, epoch_us(ts) AS us,
                  CAST(max(event_id) AS BIGINT) AS purchase_id
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT p.user_id, p.purchase_id, v.view_id,
           CAST(p.us - v.us AS BIGINT) AS gap_us
    FROM p0 p ASOF LEFT JOIN v0 v
      ON p.user_id = v.user_id AND p.us >= v.us
    """,
    doc="Cogrouped-map applyInPandas (SURVEY §2.10 — the fourth Python "
        "extension point after UDAF/UDTF/grouped-map): per-user "
        "backward as-of merge of two event streams, each purchase "
        "paired with the latest at-or-before view (pandas merge_asof "
        "inside the cogroup; DuckDB ASOF LEFT JOIN as the oracle). "
        "Both sides dedupe to one row per (user, µs) with max(event_id) "
        "first, so as-of ties cannot make the answer partition-"
        "dependent. One shuffle per side keyed on user_id; per-user "
        "group pairs must fit one pandas frame (the documented "
        "cogroup contract) — the set-based twin for plain columns is "
        "asof_join_purchases (operators/asof.py).",
)
def cogrouped_map_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import ts_micros

    ev = table(spark, sf_dir, "events")
    us = ts_micros(F.col("ts")).alias("us")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", us, "event_id")
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us, "event_id")
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    # Cogroup on a HASH BUCKET of users, not the user itself: each
    # cogroup pays a fixed Arrow round-trip + scheduling cost, so
    # per-user groups made that cost scale with user count (~10 s for
    # 1.5k users at sf0.1, measured). ASOF_BUCKETS buckets bound the
    # overhead while merge_asof(by="user_id") keeps the per-user
    # semantics vectorized inside pandas. Bucket width bounds worker
    # memory: (n_users / ASOF_BUCKETS) users' events must fit one
    # pandas frame — raise the module constant with the user
    # population at scale (one knob; both sides derive from it, so
    # the pb/vb bucketings can never diverge).
    pb = purchases.withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(ASOF_BUCKETS))
    )
    # the right side's key is RENAMED (v_user_id): purchases and views
    # share lineage, so an identically-named right column carries the
    # same attribute id as the left and FlatMapCoGroupsInPandas dedupes
    # it out of the right-hand pandas frame
    vb = views.select(
        F.col("user_id").alias("v_user_id"), "us", "view_id"
    ).withColumn("bucket", F.pmod(F.col("v_user_id"), F.lit(ASOF_BUCKETS)))
    return (
        pb.groupby("bucket")
        .cogroup(vb.groupby("bucket"))
        .applyInPandas(
            _asof_cogroup_fn,
            "user_id long, purchase_id long, view_id long, gap_us long",
        )
    )
