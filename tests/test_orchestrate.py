"""End-to-end orchestration over the full fixture cache: the staged
DAG replacing the reference's recursive scrape (SURVEY §7)."""

from __future__ import annotations

import sqlite3

import pytest

from deep_field_spark.scraping import orchestrate as O

RES = "/root/reference/tests/scraping/resources"


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("orc") / "deepfield.db")
    star, counters = O.scrape_from_cache(spark, RES, db_path=db)
    return star, counters, db


def test_counters(run):
    _, counters, _ = run
    assert counters["pages_GamePage"] == 13
    assert counters["schedule_links"] == 2463
    assert counters["games_parsed"] == 12
    assert counters["games_quarantined"] == 1  # PIT196507020
    assert counters["players_from_pages"] >= 46  # 47 fixtures, 1 malformed ok either way
    assert counters["players_mock_filled"] > 0  # rosters exceed the 47 fixtures
    assert counters["games"] == 12
    assert counters["plays"] == 1027  # sum over the 12 parseable games


def test_sqlite_loaded(run):
    _, _, db = run
    con = sqlite3.connect(db)
    try:
        assert con.execute("SELECT count(*) FROM game").fetchone()[0] == 12
        assert con.execute("SELECT count(*) FROM play").fetchone()[0] == 1027
        # FK integrity: every play resolves both players
        orphans = con.execute(
            """SELECT count(*) FROM play p
               LEFT JOIN player b ON p.batter_id = b.id
               LEFT JOIN player pi ON p.pitcher_id = pi.id
               WHERE b.id IS NULL OR pi.id IS NULL"""
        ).fetchone()[0]
        assert orphans == 0
    finally:
        con.close()


@pytest.mark.slow
def test_resume_is_noop(spark, run):
    star, _, _ = run
    star2, counters2 = O.scrape_from_cache(spark, RES, existing=star)
    assert counters2["game_pages_to_parse"] == 1  # only the quarantined one
    assert counters2["games_parsed"] == 0
    assert counters2["plays"] == 1027  # unchanged
    assert star2["play"].count() == star["play"].count()


def test_strict_dependency_mode_raises(spark):
    with pytest.raises(O.DependencyError, match="roster players missing"):
        O.scrape_from_cache(spark, RES, allow_mock_players=False)

# ------------------------------------------------------------- online mode
#
# The fake fetchers below must be fully self-contained closures: they
# run inside Spark Python workers, where this test module is not
# importable (cloudpickle would serialize module-level helpers by
# reference) and driver-side lists are invisible — so fixture paths and
# HTML are captured by value and fetch calls are logged to a shared
# file (the fetch stage is single-partition, appends don't race).


def _make_fetch(log_path: str, serve_game: bool):
    sched_html = (
        '<html><body>'
        '<p class="game"><em><a href="/boxes/WAS/WAS201710120.shtml">B</a></em></p>'
        '<p class="game"><em><a href="/boxes/ZZZ/ZZZ201607040.shtml">B</a></em></p>'
        '<p class="game"><em></em></p>'
        "</body></html>"
    )
    game_fixture = RES + "/GamePage/WAS201710120.shtml"
    player_dir = RES + "/PlayerPage"

    def fetch(url: str) -> str:
        import os

        with open(log_path, "a", encoding="utf-8") as f:
            f.write(url + "\n")
        if url.endswith("/2016-schedule.shtml"):
            return sched_html
        if serve_game and url.endswith("/WAS201710120.shtml"):
            with open(game_fixture, encoding="utf-8") as f:
                return f.read()
        if serve_game and "/players/" in url:
            fix = os.path.join(player_dir, url.rsplit("/", 1)[-1])
            if os.path.exists(fix):
                with open(fix, encoding="utf-8") as f:
                    return f.read()
        raise ConnectionError("404")

    return fetch


@pytest.mark.slow
class TestOnlineMode:
    def test_online_fetches_schedule_and_games(self, spark, tmp_path):
        """Online mode against an EMPTY cache: the fake network serves
        the 2016 schedule (2 linked games) and one game page; the other
        game 404s. The run must fetch both stages through the token
        bucket, write-through to the cache (S4), quarantine the dead
        link (E3), and land the fetched game in the star."""
        import os

        root = str(tmp_path / "cache")
        log = str(tmp_path / "fetch.log")
        # the linked fixture game is from Oct 2017, so the range spans
        # both seasons; only the 2016 schedule exists on the fake net —
        # the 2017 one 404s and lands in the error counter (E3)
        star, counters = O.scrape_from_cache(
            spark, root, year_range=(2016, 2017),
            fetch_fn=_make_fetch(log, serve_game=True), crawl_delay=0.0,
        )
        assert counters["schedules_fetched"] == 1
        assert counters["schedule_fetch_errors"] == 1
        assert counters["games_fetched"] == 1
        assert counters["game_fetch_errors"] == 1  # the dead link
        # 5b: the game's player dependency frontier — fixture pages
        # exist for part of the WAS roster; the rest mock-fill
        assert counters["players_fetched"] > 0
        assert counters["players_fetched"] + counters["player_fetch_errors"] > 30
        assert counters["players_mock_filled"] == counters["player_fetch_errors"]
        assert counters["games"] == 1
        assert counters["plays"] == 97
        # write-through: schedule (non-current year → cachable) + game
        assert os.path.exists(f"{root}/SchedulePage/2016-schedule.shtml")
        assert os.path.exists(f"{root}/GamePage/WAS201710120.shtml")
        assert os.path.exists(f"{root}/PlayerPage/jayjo02.shtml")
        # exactly one fetch per URL — the localCheckpoint must stop the
        # cache write and the downstream batch from re-running the fetch
        with open(log, encoding="utf-8") as f:
            calls = f.read().splitlines()
        assert len(calls) == len(set(calls)), calls
        n_players = sum("/players/" in u for u in calls)
        assert len(calls) == 4 + n_players, calls  # 2 scheds + 2 games + frontier

    def test_online_resume_refetches_nothing_cached(self, spark, tmp_path):
        """Second online run over the now-warm cache: only the frontier
        miss (the dead link) is retried — cached pages never refetch."""
        root = str(tmp_path / "cache")
        log1 = str(tmp_path / "fetch1.log")
        O.scrape_from_cache(spark, root, year_range=(2016, 2017),
                            fetch_fn=_make_fetch(log1, serve_game=True),
                            crawl_delay=0.0)

        log2 = str(tmp_path / "fetch2.log")
        _, counters2 = O.scrape_from_cache(
            spark, root, year_range=(2016, 2017),
            fetch_fn=_make_fetch(log2, serve_game=False), crawl_delay=0.0,
        )
        assert counters2["games_fetched"] == 0
        assert counters2["game_fetch_errors"] == 1
        with open(log2, encoding="utf-8") as f:
            calls2 = f.read().splitlines()
        # retried: the never-cached 2017 schedule + the dead game link;
        # the cached 2016 schedule and WAS game must NOT refetch
        assert all(
            u.endswith("/ZZZ201607040.shtml") or u.endswith("/2017-schedule.shtml")
            for u in calls2
        ), calls2

    def test_default_fetcher_error_quarantines(self, spark):
        """cache.default_fetcher against a connection-refusing URL: the
        error lands in the error column, not as a job failure."""
        from deep_field_spark.scraping import cache as C

        frontier = spark.createDataFrame(
            [("http://127.0.0.1:9/nope.shtml", "nope", "GamePage", True)],
            "url string, name_id string, page_type string, is_cachable boolean",
        )
        out = C.fetch_pages(frontier, C.default_fetcher(timeout=2.0), delay=0.0)
        row = out.collect()[0]
        assert row.html is None
        assert row.error and "Error" in row.error
