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
