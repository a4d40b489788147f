"""Driver-contract queries for the scrape-ETL surface.

Two kinds:
  - appearance_windows_events: the W1-W4 appearance formulation
    (SURVEY §2.5) applied to the synthetic events table, where it is
    fully SQL-expressible — so the exact window shapes that power the
    fixture pipeline are hash-checked against DuckDB every round.
  - scrape_star_*: the real fixture pipeline (reference HTML →
    star schema). HTML parsing is not SQL-expressible, so these are
    rows-only; their field-exact correctness is covered by the golden
    and differential tests in tests/test_scrape_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import register

FIXTURES = "/root/reference/tests/scraping/resources"
# the semantically hard fixtures: golden game + same-name pitcher +
# father/son batters (kept small so the driver round stays fast)
STAR_GAMES = ["WAS201710120", "BAL200705070", "SEA199105260"]


@register(
    "appearance_windows_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             CAST(row_number() OVER w - 1 AS BIGINT) AS seq_num,
             lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT *,
             CASE WHEN next_type IS NOT NULL AND event_type <> next_type
                  THEN 1 ELSE 0 END AS changed
      FROM ordered
    )
    SELECT user_id, event_id, seq_num,
           CAST(row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY seq_num) - 1 AS BIGINT) AS appear_no,
           CAST(coalesce(sum(changed) OVER (PARTITION BY user_id, event_type
                                            ORDER BY seq_num
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                                     AND 1 PRECEDING), 0)
                AS BIGINT) AS change_appear_no,
           CAST(mod(row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY seq_num) - 1, 3) AS BIGINT) AS cycle_slot
    FROM flagged
    """,
    doc="The reference's appearance semantics (W1-W4, SURVEY §2.5) as "
        "oracle-checked windows over events: W1 per-user sequence "
        "ordinal, W2 per-(user,type) appearance ordinal, W3 change-out "
        "detection via lead + bounded running sum (the pitcher-switch "
        "counter), W4 modulo cycling slot. The same expressions drive "
        "the fixture-HTML pipeline (scraping/pipeline.resolve_plays).",
)
def appearance_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        (F.row_number().over(w) - 1).cast("long").alias("seq_num"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    flagged = ordered.withColumn(
        "changed",
        F.when(
            F.col("next_type").isNotNull() & (F.col("event_type") != F.col("next_type")), 1
        ).otherwise(0),
    )
    aw = Window.partitionBy("user_id", "event_type").orderBy("seq_num")
    cw = aw.rowsBetween(Window.unboundedPreceding, -1)
    appear = (F.row_number().over(aw) - 1).cast("long")
    return flagged.select(
        "user_id",
        "event_id",
        "seq_num",
        appear.alias("appear_no"),
        F.coalesce(F.sum("changed").over(cw), F.lit(0)).cast("long").alias("change_appear_no"),
        F.pmod(appear, F.lit(3)).cast("long").alias("cycle_slot"),
    )


def _fixture_pages(
    spark: SparkSession,
    kind: str,
    names: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """(name_id, html) fixture pages as a pure-JVM wholetext file scan.

    The old form (driver reads files → spark.createDataFrame) made the
    page frame a Python-backed local RDD: EVERY scan of that leaf pays
    a driver-Python pickle pass plus a Python-worker round trip before
    the parse UDF even starts — an identity mapInPandas over the same
    3 pages measured 1.7-2.0 s vs ~0.6 s off this scan (quiet host,
    interleaved; parse output byte-identical). A file scan is also the
    honest 100k-page-backfill shape: pages come from storage, the
    driver never holds them. name_id = basename minus extension, the
    name_id_of/pages.py:42-44 rule, applied to input_file_name()."""
    import glob as g

    if names is not None:
        paths = [f"{FIXTURES}/{kind}/{n}.shtml" for n in names]
    else:
        paths = sorted(g.glob(f"{FIXTURES}/{kind}/*.shtml"))[:limit]
    return spark.read.text(paths, wholetext=True).select(
        F.regexp_replace(
            F.element_at(F.split(F.input_file_name(), "/"), -1), r"\.[^.]*$", ""
        ).alias("name_id"),
        F.col("value").alias("html"),
    )


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_STRIP_SQL = (
    "regexp_replace(regexp_replace({c}, ' \\w\\.', '', 'g'), "
    "' [JS]r\\.', '', 'g')"
)


def _spark_vals(rows) -> str:
    def lit(v):
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return str(v)

    return ",\n".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


def _twin_oracle() -> str:
    """DuckDB replay of resolve_plays (W1-W4 + J1/J2/J5) over the SAME
    parsed-fixture literals the Spark side loads — plain window SQL, so
    the reference's per-game mutable state machine
    (bbref_pages.py:676-761) is hash-checked by the driver."""
    from .scrape_twin_data import PLAYERS, PLAYS, ROSTERS

    rvals = ",\n      ".join(
        f"({_sq(g)}, {_sq(s)}, {p}, {_sq(nr)}, {_sq(ni)})"
        for g, s, p, nr, ni in ROSTERS
    )
    pvals = ",\n      ".join(
        "({}, {}, {}, {}, {}, {}, {}, {}, {})".format(
            _sq(g), n, _sq(inn), _sq(outs), _sq(pit), _sq(d), _sq(run),
            _sq(b), _sq(pi)
        )
        for g, n, inn, outs, pit, d, run, b, pi in PLAYS
    )
    plvals = ",\n      ".join(f"({i}, {_sq(ni)})" for i, ni in PLAYERS)
    strip_raw = _STRIP_SQL.format(c="name_raw")
    strip_b = _STRIP_SQL.format(c="p0.batter")
    strip_p = _STRIP_SQL.format(c="p0.pitcher")
    ob = " + ".join(
        f"(CASE WHEN substring(w.runners, {i + 1}, 1) NOT IN ('-', '') "
        f"THEN {bit} ELSE 0 END)"
        for i, bit in enumerate((1, 2, 4))
    )
    return f"""
    WITH rosters(game, side, pos, name_raw, name_id) AS (VALUES
      {rvals}),
    play_rows(game, play_num, inning, outs, pitches, descr, runners,
              batter, pitcher) AS (VALUES
      {pvals}),
    players(player_id, name_id) AS (VALUES
      {plvals}),
    stripped AS (
      SELECT game, side, pos, name_id, name_raw, {strip_raw} AS sname
      FROM rosters),
    rn AS (
      SELECT game, side, pos, name_id,
             CASE WHEN count(*) OVER (PARTITION BY game, side, sname) > 1
                  THEN name_raw ELSE sname END AS roster_name
      FROM stripped),
    rp AS (SELECT r.game, r.side, r.pos, r.roster_name, p.player_id
           FROM rn r JOIN players p USING (name_id)),
    mm AS (SELECT game, side, roster_name,
                  list(player_id ORDER BY pos, player_id) AS ids
           FROM rp GROUP BY 1, 2, 3),
    p0 AS (
      SELECT *,
             CASE WHEN substring(inning, 1, 1) = 't'
                  THEN 'away' ELSE 'home' END AS b_side,
             CASE WHEN substring(inning, 1, 1) = 't'
                  THEN 'home' ELSE 'away' END AS p_side
      FROM play_rows),
    eff AS (
      SELECT p0.*,
             CASE WHEN mb.roster_name IS NOT NULL THEN p0.batter
                  ELSE {strip_b} END AS eff_batter,
             CASE WHEN mp.roster_name IS NOT NULL THEN p0.pitcher
                  ELSE {strip_p} END AS eff_pitcher
      FROM p0
      LEFT JOIN mm mb ON mb.game = p0.game AND mb.side = p0.b_side
                     AND mb.roster_name = p0.batter
      LEFT JOIN mm mp ON mp.game = p0.game AND mp.side = p0.p_side
                     AND mp.roster_name = p0.pitcher),
    w2 AS (
      SELECT *,
             row_number() OVER (PARTITION BY game, b_side, eff_batter
                                ORDER BY play_num) - 1 AS batter_appear,
             lead(pitcher) OVER (PARTITION BY game
                                 ORDER BY play_num) AS nxt
      FROM eff),
    w3 AS (SELECT *, CASE WHEN nxt IS NOT NULL AND pitcher <> nxt
                          THEN 1 ELSE 0 END AS changed FROM w2),
    w4 AS (
      SELECT *,
             coalesce(sum(changed) OVER (
               PARTITION BY game, p_side, eff_pitcher ORDER BY play_num
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pitcher_appear
      FROM w3)
    SELECT w.game AS game_name_id,
           CAST(w.play_num AS INT) AS play_num,
           CAST((CAST(substring(w.inning, 2) AS INT) - 1) * 2
                + CASE WHEN substring(w.inning, 1, 1) = 't'
                       THEN 0 ELSE 1 END AS SMALLINT) AS inning_half,
           CAST(w.outs AS SMALLINT) AS start_outs,
           CAST({ob} AS SMALLINT) AS start_on_base,
           w.descr AS "desc",
           trim(w.pitches) AS pitch_ct,
           CAST(mb.ids[CAST((w.batter_appear % len(mb.ids)) + 1 AS INT)]
                AS BIGINT) AS batter_id,
           CAST(mp.ids[CAST((w.pitcher_appear % len(mp.ids)) + 1 AS INT)]
                AS BIGINT) AS pitcher_id
    FROM w4 w
    LEFT JOIN mm mb ON mb.game = w.game AND mb.side = w.b_side
                   AND mb.roster_name = w.eff_batter
    LEFT JOIN mm mp ON mp.game = w.game AND mp.side = w.p_side
                   AND mp.roster_name = w.eff_pitcher
    """


@register(
    "scrape_core_resolved_plays",
    oracle=_twin_oracle(),
    doc="The scrape core's hardest semantics as a driver-checkable "
        "oracle twin: the PRODUCTION resolve_plays build "
        "(scraping/pipeline.py — roster disambiguation A2, broadcast "
        "FK joins J1/J5, name→ids multimap J2, appearance windows "
        "W1-W3, id cycling W4, scalar transforms F4/F5/F8) runs over "
        "the parsed fixture games embedded as literals "
        "(scrape_twin_data.py, generated from the reference fixture "
        "HTML by tools/gen_scrape_twin_fixture.py and drift-guarded "
        "by a fresh-parse test), and the oracle replays the identical "
        "semantics as DuckDB window SQL over the same VALUES. This "
        "converts the reference-core appearance/id-cycling logic "
        "(bbref_pages.py:676-761) from local-golden evidence into a "
        "driver hash-green row; only the HTML→rows parse itself stays "
        "golden/diff-sim-gated (not SQL-expressible).",
)
def scrape_core_resolved_plays(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scraping import pipeline as P
    from .scrape_twin_data import PLAYERS, PLAYS, ROSTERS

    # the literals enter as Spark-SQL VALUES — a pure-JVM LocalRelation.
    # (spark.createDataFrame pickles local rows into a Python-backed
    # RDD, and EVERY scan of that leaf pays a Python-worker spin-up:
    # ~5 s per scan measured, × the ~6 rescans resolve_plays does.)
    r = spark.sql(
        "SELECT * FROM VALUES\n" + _spark_vals(ROSTERS)
        + "\nAS t(game_name_id, side, pos, name_raw, name_id)"
    )
    pl = spark.sql(
        "SELECT * FROM VALUES\n" + _spark_vals(PLAYS)
        + "\nAS t(game_name_id, play_num, inning, outs, pitches, desc, "
        "runners, batter, pitcher)"
    )
    dim = spark.sql(
        "SELECT CAST(id AS LONG) AS id, name_id FROM VALUES\n"
        + _spark_vals(PLAYERS) + "\nAS t(id, name_id)"
    )
    parsed = (
        r.groupBy("game_name_id")
        .agg(
            F.collect_list(
                F.struct("side", "pos", "name_raw", "name_id")
            ).alias("rosters")
        )
        .join(
            pl.groupBy("game_name_id").agg(
                F.collect_list(
                    F.struct(
                        "play_num", "inning", "outs", "pitches", "desc",
                        "runners", "batter", "pitcher",
                    )
                ).alias("plays")
            ),
            "game_name_id",
        )
    )
    with P.fixture_scale(spark):
        # materialize inside the scope (same contract as scrape_star_*):
        # 269 literal rows through 32-way shuffles + codegen JIT is
        # pure overhead; the restored conf governs later queries
        out = P.resolve_plays(parsed, dim).cache()
        out.count()
    return out


@register(
    "scrape_star_plays",
    oracle=None,  # HTML parsing is not SQL-expressible; golden-tested
    doc="The reference's own ETL end-to-end on its fixture HTML: cache "
        "source → game-page parse UDF → appearance windows → star "
        "build. Returns resolved plays keyed by (game, play_num) with "
        "batter/pitcher name_ids. Field-exact goldens + a differential "
        "check against a literal reference-code simulation live in "
        "tests/test_scrape_pipeline.py.",
)
def scrape_star_plays(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed, players = _ssp_parse(spark)
    out = _ssp_star(spark, parsed, players)
    parsed.unpersist()
    players.unpersist()
    return out


def _ssp_parse(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """Phase 1 of scrape_star_plays (bench row scrape.parse): page scan
    + game-page parse UDF + roster-derived player dim, both cached and
    eagerly materialized — the parse output feeds the player dim, the
    star build and the final joins; without materializing first the
    branches of the single final job would each re-run the UDF (cache
    population races within one job)."""
    from ..scraping import pipeline as P

    pages = _fixture_pages(spark, "GamePage", STAR_GAMES)
    with P.fixture_scale(spark):
        parsed = P.parse_game_pages(pages).cache()
        parsed.count()
        players = P.mock_players_from_games(parsed).cache()
        players.count()
    return parsed, players


def _ssp_star(
    spark: SparkSession, parsed: DataFrame, players: DataFrame
) -> DataFrame:
    """Phase 2 (bench row scrape.star): dim upserts + resolve_plays +
    surrogate ids + the FK-resolution joins back to name_ids."""
    from ..scraping import pipeline as P

    with P.fixture_scale(spark):
        star = P.build_star(spark, parsed, players)
        nid = players.select(F.col("id"), F.col("name_id"))
        b = nid.select(F.col("id").alias("batter_id"), F.col("name_id").alias("batter_name_id"))
        p = nid.select(F.col("id").alias("pitcher_id"), F.col("name_id").alias("pitcher_name_id"))
        g = star["game"].select(F.col("id").alias("game_id"), F.col("name_id").alias("game_name_id"))
        out = (
            star["play"]
            .join(F.broadcast(b), "batter_id")
            .join(F.broadcast(p), "pitcher_id")
            .join(F.broadcast(g), "game_id")
            .select(
                "game_name_id", "play_num", "inning_half", "start_outs",
                "start_on_base", "desc", "pitch_ct",
                "batter_name_id", "pitcher_name_id",
            )
        ).cache()
        out.count()  # materialize inside the fixture-scale scope
    return out


@register(
    "scrape_star_games",
    oracle=None,
    doc="Game + team + venue dimensions from the fixture ETL (dim "
        "upserts J4, FK resolution J1/J5, scalar transforms F9-F15).",
)
def scrape_star_games(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scraping import pipeline as P

    # same JVM page scan + eager parse/players materialization as
    # scrape_star_plays (see _ssp_parse for why)
    parsed, players = _ssp_parse(spark)
    with P.fixture_scale(spark):
        star = P.build_star(spark, parsed, players)
        v = star["venue"].select(F.col("id").alias("venue_id"), F.col("name").alias("venue_name"))
        ta = star["team"].select(F.col("id").alias("away_team_id"), F.col("abbreviation").alias("away_abbr"))
        th = star["team"].select(F.col("id").alias("home_team_id"), F.col("abbreviation").alias("home_abbr"))
        out = (
            star["game"]
            .join(F.broadcast(v), "venue_id", "left")
            .join(F.broadcast(ta), "away_team_id")
            .join(F.broadcast(th), "home_team_id")
            .select(
                "name_id", "local_start_time", "time_of_day", "field_type",
                F.col("date").cast("string").alias("date"),
                "venue_name", "away_abbr", "home_abbr",
            )
        ).cache()
        out.count()
    parsed.unpersist()
    players.unpersist()
    return out


@register(
    "scrape_player_dim",
    oracle=None,
    doc="Player dimension from fixture player-page HTML: parse UDF + "
        "handedness enum encode + name_id-keyed dim upsert.",
)
def scrape_player_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scraping import pipeline as P

    # JVM wholetext scan (see _fixture_pages): same name_id derivation
    # as the old driver-side basename[:-6] read
    pages = _fixture_pages(spark, "PlayerPage", limit=20)
    with P.fixture_scale(spark):
        parsed = P.parse_player_pages(pages)
        out = P.players_dim_from_parsed(parsed).select(
            "id", "name", "name_id", "bats", "throws"
        ).cache()
        out.count()
    return out
