"""Spark DataFrame pipeline for the scrape ETL: parse UDFs → scalar
transforms → appearance windows → star-schema build.

The reference processes one page at a time with mutable state
(bbref_pages.py: _GamePageQueryRunner, _PlayerAppearances); here the
same semantics are set-oriented:

  parse UDFs (P1)          mapInPandas, Arrow-batched, error column
                           quarantine instead of exceptions (E1/E2)
  scalar transforms        built-in column expressions, no UDF
  (F1-F15)                 (name strip, enum encode, inning/runner
                           arithmetic, date/time parse)
  roster disambiguation    window count per (game, side, stripped
  (A2)                     name) > 1 → keep unstripped names
  appearance semantics     W1 play_num (parse-order pos), W2 batter
  (A3/A4, W1-W4)           ordinal row_number, W3 pitcher-change
                           lead + bounded running sum, W4 id cycling
                           element_at(ids, appear % size + 1)
  dim upserts (J4)         dropDuplicates + left_anti + row_number
                           surrogate keys offset past the prior max
  FK resolution (J1/J5)    broadcast joins on natural keys

Scale notes: pages parse embarrassingly parallel (one page per row);
dims are tiny and broadcast; the only real shuffles are the window
partitions on (game, side, name) — millions of independent small
partitions at full scale, the shape Spark window exec is built for.
The surrogate-key row_number over NEW dim rows is a single-partition
window by design: new-dim deltas are small relative to facts; if a
backfill ever made them large, assign ids per-partition via
monotonically bounded offsets instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ids import dense_ids, max_id_base

from . import parse


@contextmanager
def fixture_scale(spark: SparkSession) -> Iterator[None]:
    """Scope fixture-scale session conf to a pipeline run.

    The scrape ETL's unit of work is a game-day batch: a handful of
    pages and dim deltas of tens of rows. At that size AQE's per-stage
    materialization jobs and 32-way shuffles are pure scheduler
    overhead (measured ~1.8× wall on the 3-game fixture build: 5.0 s
    → 2.7 s steady-state), and whole-stage codegen is a net loss: the
    star build compiles ~15 distinct stages of generated Java to
    process a few hundred rows (~8 s of one-time JIT measured cold,
    and the class churn floods the JVM code cache for later queries) —
    interpreted evaluation is instant at this row count, so codegen is
    scoped off too. Callers must materialize (cache + count) inside
    the scope — the conf is restored on exit, so a plan executed later
    runs under the session's cluster-scale defaults. A 100k-page
    backfill on a real cluster should NOT use this: leave AQE and
    codegen on and let stages size themselves.
    """
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
        "spark.sql.codegen.wholeStage",
        "spark.sql.codegen.factoryMode",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", "1")
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        yield
    finally:
        for k, v in saved.items():
            conf.set(k, v)


# ------------------------------------------------------------ schemas

PLAYER_PARSED_SCHEMA = (
    "name_id string, name string, bats_text string, throws_text string, error string"
)

GAME_PARSED_SCHEMA = """
    game_name_id string,
    meta struct<
        date_text:string, time_text:string, venue:string,
        tod_text:string, field_text:string,
        away_team_name:string, away_team_abbr:string,
        home_team_name:string, home_team_abbr:string>,
    rosters array<struct<side:string, pos:int, name_raw:string, name_id:string>>,
    plays array<struct<play_num:int, inning:string, outs:string, pitches:string,
                       desc:string, runners:string, batter:string, pitcher:string>>,
    error string
"""

SCHEDULE_PARSED_SCHEMA = "schedule_name_id string, url string, error string"


# ---------------------------------------------------------- parse UDFs

def _parse_players(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["name_id", "name", "bats_text", "throws_text", "error"]
    for pdf in it:
        rows = []
        for nid, html in zip(pdf["name_id"], pdf["html"]):
            try:
                p = parse.parse_player(html)
                rows.append((nid, p["name"], p["bats_text"], p["throws_text"], None))
            except Exception as e:  # quarantine, never fail the job (E2)
                rows.append((nid, None, None, None, f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=cols)


def _parse_games(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["game_name_id", "meta", "rosters", "plays", "error"]
    for pdf in it:
        rows = []
        for nid, html in zip(pdf["name_id"], pdf["html"]):
            try:
                g = parse.parse_game(html)
                rows.append((nid, g["meta"], g["rosters"], g["plays"], None))
            except Exception as e:  # incl. MissingPlayDataError (E1)
                rows.append((nid, None, None, None, f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=cols)


def _parse_schedules(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["schedule_name_id", "url", "error"]
    for pdf in it:
        rows = []
        for nid, html in zip(pdf["name_id"], pdf["html"]):
            try:
                for url in parse.parse_schedule(html):
                    rows.append((nid, url, None))
            except Exception as e:
                rows.append((nid, None, f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=cols)


def parse_player_pages(pages: DataFrame) -> DataFrame:
    """(name_id, html) → parsed player rows with error quarantine."""
    return pages.mapInPandas(_parse_players, PLAYER_PARSED_SCHEMA)


def parse_game_pages(pages: DataFrame) -> DataFrame:
    return pages.mapInPandas(_parse_games, GAME_PARSED_SCHEMA)


def parse_schedule_pages(pages: DataFrame) -> DataFrame:
    """(name_id, html) → one row per extracted game-page URL (UDTF
    shape: page → many links), plus name_id/page_type projections."""
    out = pages.mapInPandas(_parse_schedules, SCHEDULE_PARSED_SCHEMA)
    return out.withColumn("name_id", name_id_expr(F.col("url"))).withColumn(
        "page_type", page_type_expr(F.col("url"), F.col("name_id"))
    )


# -------------------------------------------- scalar transforms (F1-F15)

def name_id_expr(url: F.Column) -> F.Column:
    """Last path component minus extension (pages.py:42-44)."""
    return F.regexp_replace(F.element_at(F.split(url, "/"), -1), r"\.[^.]*$", "")


def page_type_expr(url: F.Column, name_id: F.Column) -> F.Column:
    """Regex page-type dispatch (bbref_pages.py:65-75, P3)."""
    return (
        F.when(name_id.rlike(r"^[A-Z0-9]{3}[0-9]{9}$"), "GamePage")
        .when(name_id.rlike(r"^[\w\.']+\d\d$"), "PlayerPage")
        .when(url.contains("schedule"), "SchedulePage")
    )


def strip_name_expr(name: F.Column) -> F.Column:
    """Drop middle initial then Jr/Sr title (F1, bbref_pages.py:169-185)."""
    return F.regexp_replace(F.regexp_replace(name, r" \w\.", ""), r" [JS]r\.", "")


def handedness_expr(text: F.Column) -> F.Column:
    """LEFT=0 RIGHT=1 BOTH=2 (enums.py:21-24)."""
    low = F.lower(text)
    return (
        F.when(low == "left", 0).when(low == "right", 1).when(low == "both", 2)
    ).cast("smallint")


def inning_half_expr(inning: F.Column) -> F.Column:
    """'t1'→0, 'b1'→1, 't2'→2 … (F4, bbref_pages.py:652-657)."""
    num = F.substring(inning, 2, 10).cast("int")
    half = F.when(F.substring(inning, 1, 1) == "t", 0).otherwise(1)
    return ((num - 1) * 2 + half).cast("smallint")


def on_base_expr(runners: F.Column) -> F.Column:
    """'1-3'-style string → OnBase bitflags 1|2|4 (F5)."""
    flag = F.lit(0)
    for i, bit in enumerate((1, 2, 4)):
        ch = F.substring(runners, i + 1, 1)
        flag = flag + F.when((ch != "-") & (ch != ""), bit).otherwise(0)
    return flag.cast("smallint")


def tod_expr(tod_text: F.Column) -> F.Column:
    """DAY=0 NIGHT=1 (F11)."""
    low = F.lower(tod_text)
    return (F.when(low == "day", 0).when(low == "night", 1)).cast("smallint")


def field_type_expr(field_text: F.Column) -> F.Column:
    """TURF=0 GRASS=1 (F12)."""
    low = F.lower(field_text)
    return (F.when(low == "turf", 0).when(low == "grass", 1)).cast("smallint")


def game_date_expr(date_text: F.Column) -> F.Column:
    """'Thursday, October 12, 2017' → date (F10). Spark 3+ refuses
    'EEEE' in parse patterns, so the (redundant) weekday is stripped."""
    return F.to_date(F.regexp_replace(date_text, r"^\w+, ", ""), "MMMM d, yyyy")


def local_start_time_expr(time_text: F.Column) -> F.Column:
    """'8:08 p.m. Local' → 'HH:mm' string, NULL for non-Local tz or
    unparseable (F9, bbref_pages.py:451-467). Stored as a string for
    SQLite parity — Spark has no TimeType."""
    is_local = F.element_at(F.split(time_text, " "), -1) == "Local"
    cleaned = F.upper(
        F.regexp_replace(F.regexp_replace(time_text, " Local$", ""), r"\.", "")
    )
    parsed = F.try_to_timestamp(cleaned, F.lit("h:mm a"))
    return F.when(is_local, F.date_format(parsed, "HH:mm")).otherwise(F.lit(None))


# ----------------------------------------------------- dim upserts (J4)

def upsert_dim(
    new_rows: DataFrame,
    existing: DataFrame | None,
    natural_key: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """get_or_create, set-based: dedupe new rows on the natural key,
    anti-join against the existing dim, assign dense surrogate ids
    above max(existing.id), union.

    Deterministic by construction (never monotonically_increasing_id —
    ids must be stable across re-runs for idempotent resume, E5/O2).
    Ids come from operators.ids.dense_ids — hash-bucketed two-phase
    prefix sum, so there is no partition-less WindowExec even when a
    backfill delta is fact-table-sized; the id order is
    (hash bucket of order_cols, order_cols), deterministic though not
    globally order_cols-sorted.
    """
    order_cols = order_cols or natural_key
    # Dedupe on the natural key picking the FIRST row by the non-key
    # columns' sort order — dropDuplicates keeps an arbitrary row per
    # key, which would make dim attributes depend on partition scan
    # order when the same key arrives with differing attributes.
    attr_cols = [c for c in new_rows.columns if c not in natural_key]
    if attr_cols:
        dw = Window.partitionBy(*natural_key).orderBy(
            *[F.col(c).asc_nulls_last() for c in attr_cols]
        )
        fresh = (
            new_rows.withColumn("_rn", F.row_number().over(dw))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        fresh = new_rows.dropDuplicates(natural_key)
    if existing is not None:
        fresh = fresh.join(existing, on=natural_key, how="left_anti")
        # the id base stays inside the plan (1-row broadcast aggregate)
        # — no driver-side action per upsert, so a multi-dim build is
        # one job instead of one job per dimension
        fresh = dense_ids(fresh, order_cols, base=max_id_base(existing))
        fresh = existing.unionByName(fresh)
    else:
        fresh = dense_ids(fresh, order_cols)
    return fresh


# ----------------------------------------- the play pipeline (W1-W4, J1/J2/J5)

def roster_names(parsed_games: DataFrame) -> DataFrame:
    """Exploded rosters with play-table presentation names.

    A2 (bbref_pages.py:282-297): names are stripped of middle initials
    and Jr/Sr titles — unless two roster rows on the same side share a
    stripped name (father/son duos), in which case both keep their
    full names.
    """
    r = parsed_games.select(
        "game_name_id", F.explode("rosters").alias("r")
    ).select(
        "game_name_id",
        F.col("r.side").alias("side"),
        F.col("r.pos").alias("pos"),
        F.col("r.name_raw").alias("name_raw"),
        F.col("r.name_id").alias("name_id"),
    )
    stripped = strip_name_expr(F.col("name_raw"))
    dup_w = Window.partitionBy("game_name_id", "side", stripped)
    return r.withColumn(
        "roster_name",
        F.when(F.count("*").over(dup_w) > 1, F.col("name_raw")).otherwise(stripped),
    )


def _side_exprs(inning: F.Column) -> tuple[F.Column, F.Column]:
    """(batter_side, pitcher_side) from the inning-half char (J5):
    home bats in the bottom half; the pitcher is the opposite side."""
    top = F.substring(inning, 1, 1) == "t"
    return (
        F.when(top, "away").otherwise("home"),
        F.when(top, "home").otherwise("away"),
    )


def resolve_plays(parsed_games: DataFrame, players_dim: DataFrame) -> DataFrame:
    """Raw play rows → fully resolved plays with batter_id/pitcher_id.

    The reference's per-game mutable state machine (_PlayerAppearances,
    bbref_pages.py:706-761) re-derived as windows:

      W1 play_num: parse-order ordinal (carried from the UDF — Spark
         gives no implicit row order).
      W2 batter appearance ordinal: every plate appearance increments,
         so the count before play N is row_number - 1 over
         (game, batter side, effective name) ordered by play_num.
      W3 pitcher appearances increment only when the next play's raw
         pitcher name differs (a change-out): changed = lead(pitcher)
         != pitcher over the GLOBAL game order; the count before play
         N is sum(changed) over (game, pitcher side, effective name)
         with frame (unbounded preceding, -1).
      W4 id cycling: a name shared by k roster rows resolves to
         ids[appearances % k] (bbref_pages.py:689-695).

    Effective name: the raw play-row name if the side's roster knows
    it, else its stripped form (bbref_pages.py:676-687).
    """
    rn = roster_names(parsed_games)
    # J1: roster name_id → surrogate player id (dims broadcast).
    rp = rn.join(
        F.broadcast(players_dim.select(F.col("name_id"), F.col("id").alias("player_id"))),
        "name_id",
    )
    # J2: name → ids multimap, roster order preserved via sort on pos.
    multimap = (
        rp.groupBy("game_name_id", "side", "roster_name")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "player_id"))).alias("pp"))
        .select(
            "game_name_id",
            "side",
            "roster_name",
            F.col("pp.player_id").alias("ids"),
        )
    )

    plays = parsed_games.select(
        "game_name_id", F.explode("plays").alias("p")
    ).select("game_name_id", "p.*")
    b_side, p_side = _side_exprs(F.col("inning"))
    plays = plays.withColumn("batter_side", b_side).withColumn("pitcher_side", p_side)

    # Effective names: known-raw-name probe, stripped fallback.
    for role in ("batter", "pitcher"):
        k = multimap.select(
            F.col("game_name_id").alias(f"{role}_k_game"),
            F.col("side").alias(f"{role}_k_side"),
            F.col("roster_name").alias(f"{role}_known"),
        )
        # No broadcast hint: `k` is keyed by game_name_id and grows
        # linearly with the number of games (~40 rows/game; a full-
        # history backfill is ~10M rows). The join is a clean
        # (game, side, name) equi-join, so AQE picks broadcast at
        # fixture scale and shuffle-hash at backfill scale on its own.
        plays = plays.join(
            k,
            (F.col("game_name_id") == F.col(f"{role}_k_game"))
            & (F.col(f"{role}_side") == F.col(f"{role}_k_side"))
            & (F.col(role) == F.col(f"{role}_known")),
            "left",
        ).drop(f"{role}_k_game", f"{role}_k_side")
        plays = plays.withColumn(
            f"eff_{role}",
            F.when(F.col(f"{role}_known").isNotNull(), F.col(role)).otherwise(
                strip_name_expr(F.col(role))
            ),
        ).drop(f"{role}_known")

    # W2: batter appearance ordinal.
    bw = Window.partitionBy("game_name_id", "batter_side", "eff_batter").orderBy("play_num")
    plays = plays.withColumn("batter_appear", F.row_number().over(bw) - 1)

    # W3: pitcher-change running count (change detected on RAW names in
    # global play order, exactly as bbref_pages.py:750 compares).
    gw = Window.partitionBy("game_name_id").orderBy("play_num")
    nxt = F.lead("pitcher").over(gw)
    plays = plays.withColumn(
        "pitcher_changed",
        F.when(nxt.isNotNull() & (F.col("pitcher") != nxt), 1).otherwise(0),
    )
    pw = (
        Window.partitionBy("game_name_id", "pitcher_side", "eff_pitcher")
        .orderBy("play_num")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    plays = plays.withColumn(
        "pitcher_appear", F.coalesce(F.sum("pitcher_changed").over(pw), F.lit(0))
    )

    # W4: cycle through same-name ids by appearance count.
    for role in ("batter", "pitcher"):
        m = multimap.select(
            F.col("game_name_id").alias(f"{role}_m_game"),
            F.col("side").alias(f"{role}_m_side"),
            F.col("roster_name").alias(f"{role}_m_name"),
            F.col("ids").alias(f"{role}_ids"),
        )
        # Same as the `k` probe above: per-game-keyed, unbounded growth
        # with games scraped — never force a broadcast here.
        plays = plays.join(
            m,
            (F.col("game_name_id") == F.col(f"{role}_m_game"))
            & (F.col(f"{role}_side") == F.col(f"{role}_m_side"))
            & (F.col(f"eff_{role}") == F.col(f"{role}_m_name")),
            "left",
        ).drop(f"{role}_m_game", f"{role}_m_side", f"{role}_m_name")
        plays = plays.withColumn(
            f"{role}_id",
            F.element_at(
                F.col(f"{role}_ids"),
                (F.pmod(F.col(f"{role}_appear"), F.size(f"{role}_ids")) + 1).cast("int"),
            ),
        ).drop(f"{role}_ids")

    # F4-F8 scalar transforms → reference Play columns.
    return plays.select(
        "game_name_id",
        F.col("play_num").cast("int").alias("play_num"),
        inning_half_expr(F.col("inning")).alias("inning_half"),
        F.col("outs").cast("smallint").alias("start_outs"),
        on_base_expr(F.col("runners")).alias("start_on_base"),
        F.col("desc").alias("desc"),
        F.trim(F.col("pitches")).alias("pitch_ct"),
        "batter_id",
        "pitcher_id",
    )


# ------------------------------------------------------------ star build

def players_dim_from_parsed(parsed_players: DataFrame,
                            existing: DataFrame | None = None) -> DataFrame:
    ok = parsed_players.filter(F.col("error").isNull())
    rows = ok.select(
        "name_id",
        "name",
        handedness_expr(F.col("bats_text")).alias("bats"),
        handedness_expr(F.col("throws_text")).alias("throws"),
    )
    return upsert_dim(rows, existing, ["name_id"])


def mock_players_from_games(parsed_games: DataFrame,
                            existing: DataFrame | None = None) -> DataFrame:
    """Roster-derived player dim (the tests' insert_mock_players twin,
    reference tests/utils.py:37-52): every roster name_id becomes a
    player with RIGHT/RIGHT handedness."""
    rn = roster_names(parsed_games)
    rows = rn.select(
        "name_id",
        F.col("roster_name").alias("name"),
        F.lit(1).cast("smallint").alias("bats"),
        F.lit(1).cast("smallint").alias("throws"),
    )
    return upsert_dim(rows, existing, ["name_id"])


def build_star(
    spark: SparkSession,
    parsed_games: DataFrame,
    players_dim: DataFrame,
    existing: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Teams, venues, games, plays from parsed game pages + a resolved
    player dim. Returns the 5-table star (models.py:14-48 shapes)."""
    existing = existing or {}
    ok = parsed_games.filter(F.col("error").isNull()).cache()

    metas = ok.select("game_name_id", "meta.*")

    team_rows = metas.select(
        F.col("away_team_name").alias("name"), F.col("away_team_abbr").alias("abbreviation")
    ).unionByName(
        metas.select(
            F.col("home_team_name").alias("name"), F.col("home_team_abbr").alias("abbreviation")
        )
    )
    teams = upsert_dim(team_rows, existing.get("team"), ["name", "abbreviation"])

    venue_rows = metas.select(F.col("venue").alias("name")).filter(F.col("name").isNotNull())
    venues = upsert_dim(venue_rows, existing.get("venue"), ["name"])

    game_rows = metas.select(
        F.col("game_name_id").alias("name_id"),
        local_start_time_expr(F.col("time_text")).alias("local_start_time"),
        tod_expr(F.col("tod_text")).alias("time_of_day"),
        field_type_expr(F.col("field_text")).alias("field_type"),
        game_date_expr(F.col("date_text")).alias("date"),
        "venue",
        "away_team_name",
        "away_team_abbr",
        "home_team_name",
        "home_team_abbr",
    )
    v = venues.select(F.col("name").alias("venue"), F.col("id").alias("venue_id"))
    t_away = teams.select(
        F.col("name").alias("away_team_name"),
        F.col("abbreviation").alias("away_team_abbr"),
        F.col("id").alias("away_team_id"),
    )
    t_home = teams.select(
        F.col("name").alias("home_team_name"),
        F.col("abbreviation").alias("home_team_abbr"),
        F.col("id").alias("home_team_id"),
    )
    game_rows = (
        game_rows.join(F.broadcast(v), "venue", "left")
        .join(F.broadcast(t_away), ["away_team_name", "away_team_abbr"])
        .join(F.broadcast(t_home), ["home_team_name", "home_team_abbr"])
        .select(
            "name_id", "local_start_time", "time_of_day", "field_type",
            "date", "venue_id", "away_team_id", "home_team_id",
        )
    )
    games = upsert_dim(game_rows, existing.get("game"), ["name_id"])

    plays = resolve_plays(ok, players_dim)
    # E1/E4 quarantine: a play whose batter/pitcher name resolves to no
    # roster id would reach the sinks as a NULL FK (the SQLite schema is
    # NOT NULL there; the star queries would silently drop it). The
    # reference raises KeyError and rolls back the whole page
    # (bbref_pages.py:679-687, 367-372) — mirrored here at the same
    # granularity: every play of an affected game is quarantined, before
    # surrogate-id assignment so play ids stay dense and deterministic.
    bad_games = (
        plays.filter(F.col("batter_id").isNull() | F.col("pitcher_id").isNull())
        .select("game_name_id")
        .distinct()
    )
    plays = plays.join(F.broadcast(bad_games), "game_name_id", "left_anti")
    g = games.select(F.col("name_id").alias("game_name_id"), F.col("id").alias("game_id"))
    play_rows = plays.join(F.broadcast(g), "game_name_id").drop("game_name_id")
    existing_plays = existing.get("play")
    base = None
    if existing_plays is not None:
        # id base in-plan (1-row broadcast aggregate), consistent with
        # the dims — no driver-side .first() job per incremental build
        base = max_id_base(existing_plays)
        new_games = games.join(existing_plays.select("game_id").distinct(),
                               games.id == F.col("game_id"), "left_anti")
        play_rows = play_rows.join(
            F.broadcast(new_games.select(F.col("id").alias("game_id"))), "game_id"
        )
    # fact-table surrogate ids WITHOUT a global window: bucket by the
    # game key so each game's plays stay id-contiguous, rank within
    # bucket, broadcast per-bucket offsets back (operators/ids.py)
    play_rows = dense_ids(
        play_rows, ["game_id", "play_num"], bucket_cols=["game_id"], base=base
    ).select(
        "id", "game_id", "inning_half", "start_outs", "start_on_base",
        "play_num", "desc", "pitch_ct", "batter_id", "pitcher_id",
    )
    if existing_plays is not None:
        play_rows = existing_plays.unionByName(play_rows)

    return {
        "venue": venues,
        "team": teams,
        "player": players_dim,
        "game": games,
        "play": play_rows,
    }
