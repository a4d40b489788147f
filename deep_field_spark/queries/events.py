"""Event-stream queries: batch window aggregations and their
Structured Streaming twins (SURVEY.md §2.9 parity surface).

The batch and streaming forms share oracles where the semantics are
identical on a bounded input (tumbling counts, session windows,
stateful per-key counts) — the driver therefore hash-checks the
streaming operators too, not just rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table, ts_micros
from ..functions import stats
from ..streaming import windows as SW
from . import register

TUMBLING_ORACLE = """
    SELECT date_trunc('hour', ts) AS wstart, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
"""

SESSION_ORACLE = """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sids AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT min(ts) AS session_start, user_id, count(*) AS n_events
    FROM sids GROUP BY user_id, sid
"""


@register(
    "events_tumbling_hourly",
    oracle=TUMBLING_ORACLE,
    doc="Batch tumbling-window aggregation (epoch-aligned 1h windows == "
        "date_trunc); partial aggregation collapses each partition to "
        "#windows × #types rows before the shuffle.",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("window.start").alias("wstart"), "event_type", "n", "sum_value")
    )


SLIDING_ORACLE = """
    SELECT make_timestamp((epoch_us(ts) // 1800000000 - off) * 1800000000) AS wstart,
           count(*) AS n
    FROM events, unnest([0, 1]) AS t(off)
    GROUP BY 1
"""


@register(
    "events_sliding_30m",
    oracle=SLIDING_ORACLE,
    doc="Sliding windows (1h wide, 30m slide): each event lands in "
        "exactly two windows; Spark's window() expands via Expand — "
        "shuffle volume is 2× the tumbling case, not a range join.",
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("wstart"), "n")
    )


@register(
    "streaming_tumbling_hourly",
    oracle=TUMBLING_ORACLE,
    doc="Structured Streaming twin of events_tumbling_hourly: "
        "watermarked windowed agg driven to completion over the static "
        "parquet (memory sink); same result set ⇒ same oracle.",
)
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.tumbling_counts(spark, sf_dir, "1 hour")


@register(
    "streaming_session_window",
    oracle=SESSION_ORACLE,
    doc="session_window(gap=30m) per user in streaming mode; equivalent "
        "to the batch lag+cumsum sessionization on bounded input.",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.session_window_counts(spark, sf_dir, "30 minutes")


@register(
    "streaming_sliding_30m",
    oracle=SLIDING_ORACLE,
    doc="Structured Streaming twin of events_sliding_30m: watermarked "
        "sliding windows (1h wide, 30m slide) via Expand; same bounded-"
        "input result set ⇒ same oracle.",
)
def streaming_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.sliding_counts(spark, sf_dir, "1 hour", "30 minutes")


@register(
    "streaming_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
    doc="Stream-stream interval join (purchases × same-user clicks "
        "within 30 min) with watermarks on BOTH sides — the only "
        "stream-stream join shape whose state stays bounded; oracle is "
        "the batch twin of the same interval predicate.",
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.purchase_click_attribution(spark, sf_dir)


@register(
    "streaming_static_enrich",
    oracle="""
    SELECT date_trunc('hour', e.ts) AS wstart, c.c_mktsegment,
           count(*) AS n, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="Stream-static join: events stream enriched with the static "
        "customer dim (broadcast per micro-batch — re-resolved each "
        "batch, so dim refreshes are picked up) feeding a watermarked "
        "tumbling agg per market segment. The standard streaming "
        "dimension-lookup pattern; join state is zero, agg state is "
        "watermark-bounded. Oracle is the batch twin of the same join "
        "+ epoch-aligned window.",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.static_enrich_counts(spark, sf_dir)


@register(
    "streaming_dedup_watermark",
    oracle="SELECT event_id, user_id, event_type FROM events",
    doc="dropDuplicatesWithinWatermark over a simulated at-least-once "
        "stream (events unioned with itself): exactly-once output with "
        "watermark-bounded dedup state (SURVEY §2.9).",
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.dedup_within_watermark(spark, sf_dir)


@register(
    "map_funcs_events",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2)
    SELECT user_id,
           CAST(count(*) AS INT) AS n_types,
           max(CASE WHEN event_type = 'click' THEN cnt END) AS click_cnt,
           max(CASE WHEN event_type = 'purchase' THEN cnt END) AS purchase_cnt
    FROM per GROUP BY user_id
    """,
    doc="Map-function battery (SURVEY §2.8 parity): per-user counts "
        "assembled into a MAP via map_from_entries, then probed with "
        "element_at/map_keys — reduced to plain columns so the oracle "
        "needs no map-type semantics.",
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = F.map_from_entries(F.sort_array(F.collect_list(F.struct("event_type", "cnt"))))
    g = per.groupBy("user_id").agg(m.alias("m"))
    return g.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).cast("int").alias("n_types"),
        F.element_at(F.col("m"), "click").alias("click_cnt"),
        F.element_at(F.col("m"), "purchase").alias("purchase_cnt"),
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    """,
    doc="Two-stage salted aggregation for skewed keys: partial agg on "
        "(key, salt16) spreads a hot key over 16 reducers, final agg "
        "re-combines. Result identical to the plain groupBy (oracle). "
        "event_type has 5 values — exactly the shape that melts a "
        "single reducer at 100 TB; AQE skew handling covers joins, "
        "salting covers aggregations with algebraic combiners.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"),
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("cents").alias("pc")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.sum("pc").alias("sum_cents")
    )


@register(
    "streaming_stateful_counts",
    oracle="SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
        "running per-user counts; on a single micro-batch the final "
        "state equals the batch groupBy.",
)
def streaming_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.stateful_user_counts(spark, sf_dir)


@register(
    "events_funnel_steps",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS view_ts
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS click_ts
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.view_ts
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts
           GROUP BY e.user_id)
    SELECT s1.user_id, s1.view_ts, s2.click_ts, s3.purchase_ts,
           CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END
                AS INT) AS reached_step
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s2.user_id = s3.user_id
    """,
    doc="Ordered funnel (view → click → purchase): per user, the "
        "earliest event of each step strictly after the previous "
        "step's timestamp. Three conditional-min aggregations joined "
        "on user_id — every shuffle is keyed on user_id, so AQE "
        "coalesces them onto one exchange footprint; no per-user "
        "event arrays are ever materialized (at 100 TB a power user "
        "with 10M events costs three partial-agg rows, not a 10M "
        "element list).",
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    reached = (
        F.lit(1)
        + F.when(F.col("click_ts").isNotNull(), 1).otherwise(0)
        + F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            reached.cast("int").alias("reached_step"),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users grouped by first-seen day, counted at "
        "each day offset they return. first-touch agg + distinct "
        "activity days + one join, all keyed on user_id (AQE reuses "
        "the exchange); the final rollup is tiny (days x offsets). At "
        "100 TB the only big shuffle is the per-user distinct, which "
        "partial-aggregates map-side.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    a = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("int").alias("day_offset"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH h AS (SELECT date_trunc('hour', ts) AS wstart, event_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    w AS (SELECT wstart, event_type, n,
                 sum(n) OVER f AS s,
                 sum(n * n) OVER f AS ss,
                 count(n) OVER f AS c
          FROM h
          WINDOW f AS (PARTITION BY event_type ORDER BY epoch(wstart)
                       RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING))
    SELECT wstart, event_type, n,
           CAST(c AS INT) AS n_trailing,
           round(CAST(s AS DOUBLE) / c, 4) AS trailing_mean,
           round(CASE WHEN c >= 2
                       AND (ss - CAST(s AS DOUBLE) * s / c) / (c - 1) > 0
                 THEN (n - CAST(s AS DOUBLE) / c)
                      / sqrt((ss - CAST(s AS DOUBLE) * s / c) / (c - 1))
                 END, 4) AS zscore
    FROM w
    """,
    doc="Trailing-window anomaly detection: hourly per-type counts "
        "z-scored against the preceding 24 h (event-time RANGE frame "
        "that excludes the current hour). Mean/variance are computed "
        "from integer-exact sum and sum-of-squares — bit-identical "
        "across engines and partial-agg orders, unlike builtin stddev. "
        "One shuffle to the hourly rollup (tiny: hours x types), then "
        "a per-type window — at 100 TB the rollup IS the reduction; "
        "the window input is thousands of rows regardless of input "
        "size.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("wstart"), "event_type"
        ).agg(F.count("*").alias("n"))
    )
    # ts_micros (NTZ-safe), so range bounds are in microseconds.
    f = (
        Window.partitionBy("event_type")
        .orderBy(ts_micros(F.col("wstart")))
        .rangeBetween(-86400 * 1_000_000, -3600 * 1_000_000)
    )
    w = h.select(
        "wstart",
        "event_type",
        "n",
        F.sum("n").over(f).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(f).alias("ss"),
        F.count("n").over(f).alias("c"),
    )
    sd = F.col("s").cast("double")
    var = (F.col("ss") - sd * F.col("s") / F.col("c")) / (F.col("c") - 1)
    z = F.when(
        (F.col("c") >= 2) & (var > 0),
        (F.col("n") - sd / F.col("c")) / F.sqrt(var),
    )
    return w.select(
        "wstart",
        "event_type",
        "n",
        F.col("c").cast("int").alias("n_trailing"),
        F.round(sd / F.col("c"), 4).alias("trailing_mean"),
        F.round(z, 4).alias("zscore"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS next_type
               FROM events)
    SELECT event_type, next_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY event_type), 6) AS p
    FROM s WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order transition matrix over per-user event sequences: "
        "lead() over (user, time) pairs each event with its successor, "
        "then a (from, to) count and a row-normalized probability. One "
        "shuffle keyed on user_id for the sequence window, then a "
        "tiny (types x types) rollup — the window is the only wide "
        "stage and it partial-sorts within partitions at 100 TB.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = s.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("p"),
    )


# --- SCD Type-2 dimension build --------------------------------------

SCD2_TIERS = 4  # the tracked attribute: props.k mod 4 ("plan tier")


@register(
    "events_scd2_intervals",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, event_id,
                      CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)
                        % {SCD2_TIERS} AS tier
               FROM events),
    m AS (SELECT user_id, ts, event_id, tier,
                 CASE WHEN lag(tier) OVER w IS NULL
                        OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (SELECT user_id, ts, tier,
                 sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ver
          FROM m),
    g AS (SELECT user_id, CAST(ver AS INT) AS version,
                 CAST(min(tier) AS INT) AS tier,
                 min(ts) AS valid_from,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM v GROUP BY 1, 2),
    iv AS (SELECT user_id, version, tier, valid_from, n_events,
                  lead(valid_from) OVER (PARTITION BY user_id
                                         ORDER BY version) AS valid_to
           FROM g)
    SELECT user_id, version, tier, valid_from, valid_to, n_events,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT)
             AS is_current
    FROM iv
    """,
    doc="Slowly-changing-dimension Type-2 build from an event stream — "
        "the standard warehouse temporal-dimension op: track a mutating "
        "per-entity attribute (props.k mod 4 as a plan tier), collapse "
        "consecutive repeats, and emit one validity interval "
        "[valid_from, valid_to) per attribute version with a current "
        "flag. Change detection is lag() + a running change-count over "
        "a window keyed by user_id — per-group state is one entity's "
        "history (naturally bounded), so the window parallelizes "
        "across entities at 100 TB, unlike a per-source vocabulary "
        "window; the interval close is a lead() over the already "
        "version-collapsed (tiny) per-user rows.",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    tier = (
        F.regexp_extract("props", r'"k":\s*(-?\d+)', 1).cast("bigint")
        % SCD2_TIERS
    )
    e = ev.select("user_id", "ts", "event_id", tier.alias("tier"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("tier").over(w)
    m = e.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("tier")), 1).otherwise(0)
    )
    wv = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = m.withColumn("ver", F.sum("chg").over(wv))
    g = v.groupBy("user_id", F.col("ver").cast("int").alias("version")).agg(
        F.min("tier").cast("int").alias("tier"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("version")
    iv = g.withColumn("valid_to", F.lead("valid_from").over(wl))
    return iv.select(
        "user_id",
        "version",
        "tier",
        "valid_from",
        "valid_to",
        "n_events",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


@register(
    "events_resample_gapfill",
    oracle="""
    WITH h AS (SELECT user_id, date_trunc('hour', ts) AS hour_ts,
                      CAST(count(*) AS BIGINT) AS n_events,
                      round(avg(value), 6) AS avg_value
               FROM events GROUP BY 1, 2),
    rng AS (SELECT user_id, min(hour_ts) AS h0, max(hour_ts) AS h1
            FROM h GROUP BY 1),
    grid AS (SELECT r.user_id, g.g AS hour_ts
             FROM rng r, unnest(generate_series(r.h0, r.h1,
                                                INTERVAL 1 HOUR)) AS g(g)),
    j AS (SELECT g.user_id, g.hour_ts,
                 coalesce(h.n_events, 0) AS n_events, h.avg_value
          FROM grid g LEFT JOIN h USING (user_id, hour_ts))
    SELECT user_id, hour_ts, n_events,
           last_value(avg_value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY hour_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_ffill
    FROM j
    """,
    doc="Time-series resampling with gap fill: per-user hourly "
        "activity resampled onto a dense hour grid spanning each "
        "user's own [first, last] hour — silent hours appear with "
        "n_events=0 and the metric forward-filled from the last "
        "observed hour (the standard prep for feeding event streams "
        "to sequence models / anomaly detectors, which cannot see "
        "gaps that are not rows). The grid is generated per user with "
        "sequence+explode (rows scale with user-hours, no cross "
        "join); the fill is one user-keyed window — per-task state is "
        "one user's grid, and a year-long grid per user is ~9k rows, "
        "so a hot user cannot melt a reducer. Leading nulls are "
        "impossible by construction (each grid starts at an observed "
        "hour).",
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    rng = h.groupBy("user_id").agg(
        F.min("hour_ts").alias("h0"), F.max("hour_ts").alias("h1")
    )
    grid = rng.select(
        "user_id",
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("hour_ts"),
    )
    j = grid.join(h, ["user_id", "hour_ts"], "left").select(
        "user_id",
        "hour_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "hour_ts",
        "n_events",
        F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
    )


# --- robust (MAD) anomaly detection ------------------------------------
MAD_Z_CUT = 3.5  # Iglewicz-Hoaglin modified-z threshold
MAD_C = 0.6745   # normal-consistency constant


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY 1),
    dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS ad
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
            FROM dev GROUP BY 1),
    z AS (SELECT d.event_id, d.event_type, d.value,
                 {MAD_C} * (d.value - d.med) / m.mad AS rz
          FROM dev d JOIN mad m USING (event_type)
          WHERE m.mad > 0)
    SELECT event_id, event_type, round(value, 4) AS value,
           CAST(round(CAST(rz AS DECIMAL(28,14)), 4) AS DOUBLE) AS robust_z
    FROM z WHERE abs(rz) > {MAD_Z_CUT}
    """,
    doc="Robust per-type anomaly detection via the Iglewicz-Hoaglin "
        f"modified z-score: {MAD_C}*(v - median)/MAD with |z| > "
        f"{MAD_Z_CUT} flagged. Unlike the mean/stddev z-score "
        "(events_anomaly_zscore), the breakdown point is 50% — the "
        "outliers cannot poison the location/scale estimates used to "
        "detect them, which is the failure mode that makes plain "
        "z-scores useless on heavy-tailed metrics. Two exact-median "
        "grouped aggregates over a bounded type set (Spark percentile "
        "== DuckDB quantile_cont, the established interpolation "
        "parity) broadcast back onto the event stream; no window over "
        "events, no sort. Types with MAD = 0 (>=50% of values at the "
        "median — a degenerate distribution this score cannot rank) "
        "are excluded EXPLICITLY in both engines; without the guard "
        "Spark's non-ANSI divide yields NULL (silently dropped) while "
        "DuckDB yields inf (flagged), a latent data-dependent "
        "divergence. ~4% of rows flag on this corpus's heavy-tailed "
        "value column — non-vacuous by the data itself.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    rz = F.lit(MAD_C) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        # mad > 0 guard: matches the oracle's WHERE m.mad > 0 — without
        # it Spark's NULL-on-divide-by-zero and DuckDB's inf disagree
        # on degenerate (>=50%-at-median) types
        dev.join(F.broadcast(mad.filter(F.col("mad") > 0)), "event_type")
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) > MAD_Z_CUT)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            # decimal-round: a double round() diverges between engines
            # when rz lands on a half-point (found live at sf0.1)
            F.round(F.col("rz").cast("decimal(28,14)"), 4)
            .cast("double")
            .alias("robust_z"),
        )
    )


# --- distribution drift (PSI) ------------------------------------------
PSI_SPLIT_TS = "2024-01-16 00:00:00"  # reference = first half of January
PSI_BINS = 10
PSI_SMOOTH = 0.5  # Laplace half-count so empty bins can't blow up ln


_PSI_ORACLE = f"""
    WITH ref AS (SELECT event_type, value FROM events
                 WHERE ts < TIMESTAMP '{PSI_SPLIT_TS}'),
    cur AS (SELECT event_type, value FROM events
            WHERE ts >= TIMESTAMP '{PSI_SPLIT_TS}'),
    cuts AS (SELECT event_type,
                    {stats.quantized_cuts_sql(f'''quantile_cont(value,
                        [{", ".join(str((i + 1) / PSI_BINS) for i in range(PSI_BINS - 1))}])''')}
                      AS cs
             FROM ref GROUP BY 1),
    rb AS (SELECT r.event_type,
                  len(list_filter(c.cs, x -> x < r.value)) AS bin
           FROM ref r JOIN cuts c USING (event_type)),
    cb AS (SELECT u.event_type,
                  len(list_filter(c.cs, x -> x < u.value)) AS bin
           FROM cur u JOIN cuts c USING (event_type)),
    grid AS (SELECT event_type, unnest(range(0, {PSI_BINS})) AS bin FROM cuts),
    rn AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
           FROM rb GROUP BY 1, 2),
    cn AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
           FROM cb GROUP BY 1, 2),
    tot AS (SELECT event_type,
                   CAST(sum(CASE WHEN src = 'r' THEN n ELSE 0 END) AS BIGINT) AS nr,
                   CAST(sum(CASE WHEN src = 'c' THEN n ELSE 0 END) AS BIGINT) AS nc
            FROM (SELECT event_type, n, 'r' AS src FROM rn
                  UNION ALL SELECT event_type, n, 'c' FROM cn)
            GROUP BY 1),
    terms AS (
      SELECT g.event_type,
             (coalesce(c.n, 0) + {PSI_SMOOTH})
               / (t.nc + {PSI_BINS} * {PSI_SMOOTH}) AS q,
             (coalesce(r.n, 0) + {PSI_SMOOTH})
               / (t.nr + {PSI_BINS} * {PSI_SMOOTH}) AS p
      FROM grid g
      LEFT JOIN rn r USING (event_type, bin)
      LEFT JOIN cn c USING (event_type, bin)
      JOIN tot t USING (event_type))
    SELECT event_type,
           any_value(t2.nr) AS n_ref, any_value(t2.nc) AS n_cur,
           CAST(round(CAST(sum(CAST((q - p) * ln(q / p)
                AS DECIMAL(28,18))) AS DECIMAL(28,18)), 6) AS DOUBLE) AS psi
    FROM terms JOIN tot t2 USING (event_type)
    GROUP BY event_type
    """


@register(
    "dq_distribution_drift",
    oracle=_PSI_ORACLE,
    doc=f"Population-stability-index drift detection per event type: "
        f"the value distribution of the current half-month is compared "
        f"against the reference half on {PSI_BINS} equal-frequency "
        "bins cut at the REFERENCE deciles (exact percentiles over the "
        "bounded type set — the established interpolation parity), "
        f"with {PSI_SMOOTH}-count Laplace smoothing so an empty bin "
        "cannot blow up the log. PSI = sum((q-p)*ln(q/p)); < 0.1 "
        "stable, 0.1-0.25 moderate, > 0.25 drifted (the standard "
        "credit-scoring thresholds). Shape at 100 TB: two scans "
        "reduce to (type, bin) counts via partial aggregation, the "
        "decile table is |types| rows broadcast onto both streams, "
        f"and the PSI fold is {PSI_BINS} DECIMAL-quantized terms per "
        "type — no window, no sort, nothing corpus-sized moves.",
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _psi_halves(spark, sf_dir)
    # cuts are DECIMAL-quantized before binning: raw interpolation is
    # 1-ulp engine-dependent and duplicated boundary values flip bins
    # (caught by the r10 sf1 correctness spot-run; functions/stats.py)
    cuts = ref.groupBy("event_type").agg(
        stats.quantized_cuts(
            F.percentile("value", _psi_qs())
        ).alias("cs")
    )
    return _psi_table(ref, cur, cuts, "cs")


def _psi_halves(spark: SparkSession, sf_dir: str):
    ev = table(spark, sf_dir, "events").select("event_type", "value", "ts")
    split = F.lit(PSI_SPLIT_TS).cast("timestamp")
    return ev.filter(F.col("ts") < split), ev.filter(F.col("ts") >= split)


def _psi_qs():
    return F.array(*[F.lit((i + 1) / PSI_BINS) for i in range(PSI_BINS - 1)])


def _psi_table(
    ref: DataFrame, cur: DataFrame, cuts: DataFrame, cs_col: str
) -> DataFrame:
    """(event_type, n_ref, n_cur, psi): the PSI fold every drift audit
    shares — both halves binned at ``cuts[cs_col]`` via the broadcast
    |types|-row cut table, partial-agg (type, bin) counts, 0.5-count
    Laplace smoothing, DECIMAL(28,18) terms (the exact discipline the
    streaming monitor replays, streaming/drift.batch_psi)."""
    def binned(side):
        v = F.col("value")
        return side.join(F.broadcast(cuts), "event_type").select(
            "event_type",
            F.size(F.filter(F.col(cs_col), lambda c: c < v)).alias("bin"),
        ).groupBy("event_type", "bin").agg(F.count("*").alias("n"))
    rn = binned(ref)
    cn = binned(cur)
    grid = cuts.select(
        "event_type",
        F.explode(F.array(*[F.lit(i) for i in range(PSI_BINS)])).alias("bin"),
    )
    tot_r = rn.groupBy("event_type").agg(F.sum("n").alias("nr"))
    tot_c = cn.groupBy("event_type").agg(F.sum("n").alias("nc"))
    j = (
        grid.join(rn.withColumnRenamed("n", "n_r"), ["event_type", "bin"], "left")
        .join(cn.withColumnRenamed("n", "n_c"), ["event_type", "bin"], "left")
        .join(F.broadcast(tot_r), "event_type")
        .join(F.broadcast(tot_c), "event_type")
    )
    p = (F.coalesce(F.col("n_r"), F.lit(0)) + PSI_SMOOTH) / (
        F.col("nr") + PSI_BINS * PSI_SMOOTH
    )
    q = (F.coalesce(F.col("n_c"), F.lit(0)) + PSI_SMOOTH) / (
        F.col("nc") + PSI_BINS * PSI_SMOOTH
    )
    term = ((q - p) * F.log(q / p)).cast("decimal(28,18)")
    return (
        j.groupBy("event_type")
        .agg(
            F.first("nr").alias("n_ref"),
            F.first("nc").alias("n_cur"),
            F.round(F.sum(term).cast("decimal(28,18)"), 6)
            .cast("double")
            .alias("psi"),
        )
    )


PSI_APPROX_ACC = 10000  # GK sketch accuracy: rank error <= n / 10000
# |psi_exact - psi_approx| budget: measured max 0.004 at sf0.01 and
# 0.00006 at sf0.1 (the gap SHRINKS with scale — GK rank error is
# relative, and more rows put more mass strictly between cut wiggles),
# so 0.02 is 5x the worst measured and far under the 0.1 "stable"
# decision threshold
PSI_APPROX_TOL = 0.02


@register(
    "dq_distribution_drift_approx",
    oracle=f"""
    SELECT event_type, n_ref, n_cur, psi, TRUE AS approx_within_tol
    FROM ({_PSI_ORACLE})
    """,
    doc="The 100 TB form of dq_distribution_drift (the swap its "
        "docstring's SCALE note declares): reference deciles come from "
        f"percentile_approx (GK sketch, accuracy {PSI_APPROX_ACC} — "
        "mergeable partial aggregation, bounded memory per group) "
        "instead of the exact sort-based percentile whose per-type "
        "group is corpus-sized at scale. Sketch cutpoints are not "
        "portable across engines, so (the approx_percentiles / "
        "corpus_perplexity_buckets_approx contract) the oracle-matched "
        "psi column is the EXACT-cut flank computed side by side from "
        "the same single reference aggregation, while "
        "approx_within_tol — literal TRUE in the oracle — asserts "
        f"in-row that the approx-cut PSI is within {PSI_APPROX_TOL} "
        "of it (5x the worst measured gap, far under the 0.1 decision "
        "threshold). A production monitor drops the exact flank and "
        "freezes the approx cuts (streaming/drift.freeze_reference "
        "approx=True); this query is the calibration that licenses "
        "that swap. No Sort or Window anywhere in the plan (pinned).",
)
def dq_distribution_drift_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ref, cur = _psi_halves(spark, sf_dir)
    both = ref.groupBy("event_type").agg(
        stats.quantized_cuts(
            F.percentile("value", _psi_qs())
        ).alias("cs_e"),
        # the approx cuts stay raw: sketch cutpoints are not portable
        # anyway, and the in-row tolerance absorbs sub-ulp wiggle
        F.percentile_approx(
            "value", _psi_qs(), F.lit(PSI_APPROX_ACC)
        ).alias("cs_a"),
    )
    exact = _psi_table(ref, cur, both, "cs_e")
    approx = _psi_table(ref, cur, both, "cs_a").select(
        "event_type", F.col("psi").alias("psi_a")
    )
    return exact.join(F.broadcast(approx), "event_type").select(
        "event_type",
        "n_ref",
        "n_cur",
        "psi",
        (F.abs(F.col("psi") - F.col("psi_a")) <= PSI_APPROX_TOL).alias(
            "approx_within_tol"
        ),
    )


@register(
    "streaming_drift_psi",
    oracle=_PSI_ORACLE,
    doc="Structured Streaming twin of dq_distribution_drift — the day-2 "
        "monitoring posture (streaming/drift.py): the reference "
        "deciles + per-bin counts FREEZE once into a |types|-row "
        "artifact, the 'current' half arrives as a stream, and each "
        "micro-batch lands a PSI report batch-id-keyed via "
        "foreachBatch (overwrite-per-batch: crash replays rewrite the "
        "identical report). Driven availableNow over the static "
        "parquet, the whole half is ONE micro-batch, so the report "
        "set equals the batch audit exactly — same oracle (the "
        "multi-batch partitioning + replay idempotence are pinned in "
        "tests/test_streaming_drift.py). Per batch, nothing "
        "corpus-sized moves: a broadcast of the frozen artifact, "
        "partial-agg (type, bin) counts, a 10-term DECIMAL fold.",
)
def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import drift

    ev = table(spark, sf_dir, "events").select("event_type", "value", "ts")
    split = F.lit(PSI_SPLIT_TS).cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("event_type", "value")
    cur = ev.filter(F.col("ts") >= split).select("event_type", "value")
    root = "{}/dfs_drift/{}/{}".format(
        tempfile.gettempdir(),
        spark.sparkContext.applicationId,
        uuid.uuid4().hex[:10],
    )
    # the reference freeze and the arrivals staging write are
    # independent jobs over disjoint halves of the events table — run
    # them concurrently so one job's tail back-fills with the other's
    # tasks (guide §2.6 overlap)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(drift.freeze_reference, ref, f"{root}/ref"),
            pool.submit(
                lambda: cur.write.mode("overwrite").parquet(f"{root}/cur")
            ),
        ]
        for f in futs:
            f.result()
    stream = spark.readStream.schema(cur.schema).parquet(f"{root}/cur")
    try:
        q = drift.foreach_batch_psi(
            stream, f"{root}/ref", f"{root}/reports", f"{root}/ckpt"
        )
        if not q.awaitTermination(300):
            # a still-running stream must not fall through to a read
            # of a reports dir it has not finished writing
            q.stop()
            raise TimeoutError("streaming_drift_psi: stream did not drain")
        return (
            spark.read.parquet(f"{root}/reports")
            .select("event_type", "n_ref", "n_cur", "psi")
            # sever lineage so the scratch dir can be removed before
            # the caller collects
            .localCheckpoint(eager=True)
        )
    finally:
        # the scratch dir holds a full copy of the events half — clean
        # it on EVERY path (a retried timeout must not re-leak /tmp)
        shutil.rmtree(root, ignore_errors=True)
