"""Golden + differential tests for the scrape-ETL pipeline against the
reference's own HTML fixtures (/root/reference/tests/scraping/resources,
read-only).

Three tiers, mirroring the reference's strategy (SURVEY §5):
  1. golden end-to-end: WAS201710120 through the full star build —
     exact venue/team/game fields, plays 0 and 28 field-exact, 97 rows
     (reference test_pages.py:164-206).
  2. semantic edge cases: same-name pitcher cycling (BAL200705070) and
     father/son Griffeys (SEA199105260) — checked against the literal
     reference-code simulation (see ref_simulator.py for why the
     reference's own golden lists are vacuous), plus a differential
     check of EVERY play of EVERY parseable fixture game.
  3. robustness: parse-failure quarantine (PIT196507020), idempotent
     re-run (resume, E5/O2), SQLite sink round-trip.
"""

from __future__ import annotations

import glob
import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from deep_field_spark.scraping import cache as C
from deep_field_spark.scraping import parse
from deep_field_spark.scraping import pipeline as P
from deep_field_spark.scraping import sqlite_sink as SS
from tests.ref_simulator import simulate

RES = "/root/reference/tests/scraping/resources"


def _html(kind: str, name_id: str) -> str:
    with open(f"{RES}/{kind}/{name_id}.shtml", encoding="utf-8") as f:
        return f.read()


def _pages_df(spark, kind: str, name_ids: list[str]):
    rows = [(nid, _html(kind, nid)) for nid in name_ids]
    return spark.createDataFrame(rows, "name_id string, html string").coalesce(
        max(1, len(rows))
    )


@pytest.fixture(scope="module")
def was_star(spark):
    """WAS201710120 star build with roster-derived (mock) players."""
    parsed = P.parse_game_pages(_pages_df(spark, "GamePage", ["WAS201710120"]))
    players = P.mock_players_from_games(parsed)
    return P.build_star(spark, parsed, players)


class TestParseUdfs:
    def test_player_parse_golden(self, spark):
        out = P.parse_player_pages(
            _pages_df(spark, "PlayerPage", ["vendipa01", "jeterde01"])
        )
        rows = {r.name_id: r for r in out.collect()}
        v = rows["vendipa01"]
        assert v.name == "Pat Venditte" and v.error is None
        assert (v.bats_text, v.throws_text) == ("Left", "Both")
        assert rows["jeterde01"].name == "Derek Jeter"

    def test_player_handedness_encoding(self, spark):
        out = P.parse_player_pages(_pages_df(spark, "PlayerPage", ["vendipa01"]))
        dim = P.players_dim_from_parsed(out)
        r = dim.collect()[0]
        # LEFT=0, BOTH=2 (reference enums.py:21-24)
        assert (r.bats, r.throws) == (0, 2)

    def test_missing_play_data_quarantined(self, spark):
        parsed = P.parse_game_pages(
            _pages_df(spark, "GamePage", ["PIT196507020", "WAS201710120"])
        )
        rows = {r.game_name_id: r for r in parsed.collect()}
        assert "MissingPlayDataError" in rows["PIT196507020"].error
        assert rows["WAS201710120"].error is None

    @pytest.mark.slow
    def test_schedule_stage(self, spark):
        parsed = P.parse_schedule_pages(
            _pages_df(spark, "SchedulePage", ["2016-schedule"])
        )
        assert parsed.count() == 2463
        types = parsed.select("page_type").distinct().collect()
        assert [t.page_type for t in types] == ["GamePage"]
        # J3: frontier anti-join against an existing game dim
        existing = parsed.limit(100).select(F.col("name_id").alias("name_id"))
        frontier = parsed.join(existing, "name_id", "left_anti")
        assert frontier.count() == 2363


class TestGoldenWAS(object):
    """Reference test_pages.py:164-206, field-exact."""

    def test_venue_team_game(self, was_star):
        venues = {r.name: r.id for r in was_star["venue"].collect()}
        teams = {(r.name, r.abbreviation): r.id for r in was_star["team"].collect()}
        assert "Nationals Park" in venues
        assert ("Chicago Cubs", "CHC") in teams
        assert ("Washington Nationals", "WSN") in teams
        g = was_star["game"].collect()[0]
        assert g.name_id == "WAS201710120"
        assert g.local_start_time == "20:08"
        assert g.time_of_day == 1  # NIGHT
        assert g.field_type == 1  # GRASS
        assert str(g.date) == "2017-10-12"
        assert g.venue_id == venues["Nationals Park"]
        assert g.away_team_id == teams[("Chicago Cubs", "CHC")]
        assert g.home_team_id == teams[("Washington Nationals", "WSN")]

    def test_plays_golden(self, was_star):
        nid_of = {r.id: r.name_id for r in was_star["player"].collect()}
        plays = {r.play_num: r for r in was_star["play"].collect()}
        assert len(plays) == 97
        p0 = plays[0]
        assert p0.inning_half == 0
        assert p0.start_outs == 0
        assert p0.start_on_base == 0  # EMPTY
        assert p0.desc == "Double to RF (Line Drive)"
        assert p0.pitch_ct == "2,(0-1) CX"
        assert nid_of[p0.batter_id] == "jayjo02"
        assert nid_of[p0.pitcher_id] == "gonzagi01"
        p28 = plays[28]
        assert p28.inning_half == 4
        assert p28.start_outs == 1
        assert p28.start_on_base == 3  # FIRST | SECOND
        assert p28.desc == "Walk; Bryant to 3B; Contreras to 2B"
        assert p28.pitch_ct == "6,(3-2) CBFBBB"
        assert nid_of[p28.batter_id] == "almoral01"
        assert nid_of[p28.pitcher_id] == "gonzagi01"


ALL_PARSEABLE = sorted(
    os.path.basename(f)[:-6]
    for f in glob.glob(f"{RES}/GamePage/*.shtml")
    if "PIT196507020" not in f
)


@pytest.mark.slow
class TestAppearanceSemantics:
    """W1-W4 vs the literal reference-code simulation, every play of
    every fixture game."""

    @pytest.mark.parametrize("game", ALL_PARSEABLE)
    def test_matches_reference_simulation(self, spark, game):
        parsed_py = parse.parse_game(_html("GamePage", game))
        expected = simulate(parsed_py)

        parsed = P.parse_game_pages(_pages_df(spark, "GamePage", [game]))
        players = P.mock_players_from_games(parsed)
        plays = P.resolve_plays(parsed, players)
        nid_of = {r.id: r.name_id for r in players.collect()}
        got = {
            r.play_num: (nid_of[r.batter_id], nid_of[r.pitcher_id])
            for r in plays.collect()
        }
        assert len(got) == len(expected)
        mismatches = {
            n: (got[n], exp) for n, exp in enumerate(expected) if got[n] != exp
        }
        assert not mismatches, f"{game}: {dict(list(mismatches.items())[:5])}"

    def test_same_name_pitcher_cycling(self, spark):
        """BAL200705070: two 'Roberto Hernandez' on the away roster —
        starter carmofa01 cycles to reliever hernaro01 on change-out."""
        parsed = P.parse_game_pages(_pages_df(spark, "GamePage", ["BAL200705070"]))
        players = P.mock_players_from_games(parsed)
        plays = P.resolve_plays(parsed, players)
        nid_of = {r.id: r.name_id for r in players.collect()}
        by_num = {r.play_num: nid_of[r.pitcher_id] for r in plays.collect()}
        for n in (3, 4, 5, 66):
            assert by_num[n] == "carmofa01", (n, by_num[n])
        for n in (82, 83, 84):
            assert by_num[n] == "hernaro01", (n, by_num[n])

    def test_father_son_griffeys(self, spark):
        """SEA199105260: 'Ken Griffey' (Sr) and 'Ken Griffey Jr.' keep
        full names (A2) and resolve to distinct ids."""
        parsed = P.parse_game_pages(_pages_df(spark, "GamePage", ["SEA199105260"]))
        players = P.mock_players_from_games(parsed)
        plays = P.resolve_plays(parsed, players)
        nid_of = {r.id: r.name_id for r in players.collect()}
        by_num = {r.play_num: nid_of[r.batter_id] for r in plays.collect()}
        for n in (9, 26, 48):
            assert by_num[n] == "griffke01", (n, by_num[n])
        assert by_num[84] == "griffke02"


@pytest.mark.slow
class TestUpsertResume:
    def test_dim_upsert_idempotent(self, spark, was_star):
        """Re-running the build against the existing star adds nothing
        and keeps every id stable (E5/O2 resume semantics)."""
        parsed = P.parse_game_pages(_pages_df(spark, "GamePage", ["WAS201710120"]))
        players2 = P.mock_players_from_games(parsed, existing=was_star["player"])
        star2 = P.build_star(spark, parsed, players2, existing=was_star)
        for t in ("venue", "team", "player", "game", "play"):
            a = {tuple(r) for r in was_star[t].collect()}
            b = {tuple(r) for r in star2[t].collect()}
            assert a == b, t

    def test_incremental_second_game(self, spark, was_star):
        """CHN201710110 shares lineups with WAS201710120: the player
        frontier after the first game is tiny (reference
        test_scraping.py:27-38 work-skipping)."""
        parsed = P.parse_game_pages(_pages_df(spark, "GamePage", ["CHN201710110"]))
        rn = P.roster_names(parsed).select("name_id").distinct()
        frontier = rn.join(was_star["player"].select("name_id"), "name_id", "left_anti")
        assert frontier.count() < rn.count() // 2
        players2 = P.mock_players_from_games(parsed, existing=was_star["player"])
        star2 = P.build_star(spark, parsed, players2, existing=was_star)
        assert star2["game"].count() == 2
        # WAS plays unchanged, CHN plays appended with fresh ids
        assert star2["play"].count() == 97 + 80
        assert star2["play"].select("id").distinct().count() == 97 + 80


@pytest.mark.slow
class TestSqliteSink:
    def test_round_trip(self, spark, was_star, tmp_path):
        db = str(tmp_path / "deepfield.db")
        SS.write_star(was_star, db)
        con = sqlite3.connect(db)
        try:
            n = con.execute("SELECT count(*) FROM play").fetchone()[0]
            assert n == 97
            row = con.execute(
                """SELECT p.inning_half, p.start_outs, p.start_on_base, p."desc",
                          p.pitch_ct, b.name_id, pi.name_id
                   FROM play p JOIN player b ON p.batter_id = b.id
                                JOIN player pi ON p.pitcher_id = pi.id
                   WHERE p.play_num = 0"""
            ).fetchone()
            assert row == (
                0, 0, 0, "Double to RF (Line Drive)", "2,(0-1) CX",
                "jayjo02", "gonzagi01",
            )
            g = con.execute(
                "SELECT name_id, local_start_time, time_of_day, field_type, date "
                "FROM game"
            ).fetchone()
            assert g == ("WAS201710120", "20:08", 1, 1, "2017-10-12")
        finally:
            con.close()

    def test_rewrite_idempotent(self, spark, was_star, tmp_path):
        db = str(tmp_path / "deepfield2.db")
        SS.write_star(was_star, db)
        SS.write_star(was_star, db)  # INSERT OR REPLACE on stable ids
        con = sqlite3.connect(db)
        try:
            assert con.execute("SELECT count(*) FROM play").fetchone()[0] == 97
            assert con.execute("SELECT count(*) FROM player").fetchone()[0] == 38
        finally:
            con.close()


class TestCacheSource:
    def test_read_cache_counts(self, spark):
        df = C.read_cache(spark, RES)
        counts = {r.page_type: r.n for r in
                  df.groupBy("page_type").agg(F.count("*").alias("n")).collect()}
        assert counts["GamePage"] == 13
        assert counts["PlayerPage"] >= 47
        assert counts["SchedulePage"] == 1

    def test_fallback_chain_cached(self, spark):
        cache_df = C.read_cache(spark, RES, "GamePage")
        frontier = spark.createDataFrame(
            [
                ("https://www.baseball-reference.com/boxes/WAS/WAS201710120.shtml",
                 "WAS201710120", "GamePage", True),
            ],
            "url string, name_id string, page_type string, is_cachable boolean",
        )
        out = C.resolve_pages(frontier, cache_df, fetch_fn=None)
        rows = out.collect()
        assert len(rows) == 1 and rows[0].from_cache is True

    def test_fallback_chain_miss_offline_raises(self, spark):
        cache_df = C.read_cache(spark, RES, "GamePage")
        frontier = spark.createDataFrame(
            [("https://x/NOPE012345678.shtml", "NOPE012345678", "GamePage", True)],
            "url string, name_id string, page_type string, is_cachable boolean",
        )
        with pytest.raises(ValueError, match="cache misses"):
            C.resolve_pages(frontier, cache_df, fetch_fn=None)

    def test_fallback_chain_fetch_and_writeback(self, spark, tmp_path):
        cache_df = C.read_cache(spark, RES, "GamePage")
        frontier = spark.createDataFrame(
            [
                ("https://x/FAKE123456789.shtml", "FAKE123456789", "GamePage", True),
                ("https://x/nocache-schedule.shtml", "nocache-schedule",
                 "SchedulePage", False),  # S6: never cached
            ],
            "url string, name_id string, page_type string, is_cachable boolean",
        )
        fetched_urls: list[str] = []

        def fake_fetch(url: str) -> str:
            return f"<html>{url}</html>"

        root = str(tmp_path / "cache")
        out = C.resolve_pages(frontier, cache_df, fetch_fn=fake_fetch,
                              cache_root=root, delay=0.0)
        rows = {r.name_id: r for r in out.collect()}
        assert rows["FAKE123456789"].from_cache is False
        # S4 write-through for cachable only
        assert os.path.exists(f"{root}/GamePage/FAKE123456789.shtml")
        assert not os.path.exists(f"{root}/SchedulePage/nocache-schedule.shtml")

class TestStarPlanShape:
    """Plan pins for the 100 TB shape of the star build: surrogate-id
    assignment must never fall into a partition-less WindowExec (the
    round-3 scale defect — a global ``Window.orderBy`` pulls the whole
    play fact table through one task)."""

    @staticmethod
    def _global_window_nodes(plan: str) -> list[str]:
        """Window nodes with no partition spec. WindowExec prints
        ``Window [exprs], [partSpec], [orderSpec]`` — three top-level
        bracket groups when both specs exist. Two groups is ambiguous:
        partition-less (2nd group is the ORDER spec, carries ASC/DESC)
        vs order-less (2nd group is the partition spec, plain exprs) —
        only the former moves all rows to one partition."""
        bad = []
        for line in plan.splitlines():
            s = line.lstrip(" +-:*(0123456789)")
            if not s.startswith("Window "):
                continue
            groups: list[str] = []
            depth = 0
            start = 0
            for i, ch in enumerate(s):
                if ch == "[":
                    if depth == 0:
                        start = i
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append(s[start : i + 1])
            if len(groups) < 3 and any(
                " ASC" in g or " DESC" in g for g in groups[1:]
            ):
                bad.append(s)
        return bad

    def _assert_no_global_window(self, df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = self._global_window_nodes(plan)
        assert not bad, "partition-less WindowExec:\n" + "\n".join(bad)

    def test_initial_build_has_no_global_window(self, was_star):
        for name, df in was_star.items():
            self._assert_no_global_window(df)

    @pytest.mark.slow
    def test_incremental_build_has_no_global_window(self, spark, was_star):
        parsed = P.parse_game_pages(_pages_df(spark, "GamePage", ["CHN201710110"]))
        players2 = P.mock_players_from_games(parsed, existing=was_star["player"])
        star2 = P.build_star(spark, parsed, players2, existing=was_star)
        for name, df in star2.items():
            self._assert_no_global_window(df)

    def test_detector_catches_partition_less_window(self, spark):
        """The detector itself must flag a genuinely global window —
        otherwise the two pins above prove nothing."""
        from pyspark.sql import Window as W

        df = spark.range(10).withColumn(
            "rn", F.row_number().over(W.orderBy("id"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert self._global_window_nodes(plan), plan
        # ...and must NOT flag a partitioned window with no order spec
        ok = spark.range(10).withColumn(
            "n", F.count(F.lit(1)).over(W.partitionBy(F.col("id") % 3))
        )
        okplan = ok._jdf.queryExecution().executedPlan().toString()
        assert not self._global_window_nodes(okplan), okplan


def test_twin_literals_match_fresh_parse():
    """Drift guard for the scrape-core oracle twin: the checked-in
    scrape_twin_data literals must equal a fresh parse of the fixture
    HTML by the production parser — if the parser (or the fixtures)
    change, the twin regenerates via tools/gen_scrape_twin_fixture.py
    rather than silently pinning stale semantics."""
    import tools.gen_scrape_twin_fixture as G

    from deep_field_spark.queries import scrape_twin_data as D

    rosters, plays, players = G.build()
    assert rosters == D.ROSTERS
    assert plays == D.PLAYS
    assert players == D.PLAYERS
    assert G.GAMES == D.GAMES
