"""Scale-shape test for the scrape ETL: the fixture pipeline is proven
field-exact on 3 games elsewhere (golden + diff-sim); this drives the
SAME code over a 48-game batch (the 3 fixture HTMLs cycled under
distinct game ids — a stand-in for a real game-day backfill) and pins
the properties that must survive growth:

  - dims deduplicate (48 games share 3 venues / 6 teams / one roster
    set — upserts collapse them, never multiply them)
  - surrogate ids stay unique and dense after a wide batch
  - FK integrity: every play resolves to a real game and real players
  - determinism: every copy of the same fixture yields the identical
    play count
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_field_spark.scraping import pipeline as P

FIXTURES = "/root/reference/tests/scraping/resources"
BASE_GAMES = ["WAS201710120", "BAL200705070", "SEA199105260"]
COPIES = 16  # 3 fixtures x 16 = 48 games


@pytest.fixture(scope="module")
def star(spark):
    htmls = {}
    for nid in BASE_GAMES:
        with open(f"{FIXTURES}/GamePage/{nid}.shtml", encoding="utf-8") as f:
            htmls[nid] = f.read()
    rows = [
        (f"{nid}c{i:02d}", htmls[nid]) for nid in BASE_GAMES for i in range(COPIES)
    ]
    pages = spark.createDataFrame(rows, "name_id string, html string").coalesce(
        max(1, len(rows))
    )
    parsed = P.parse_game_pages(pages).cache()
    assert parsed.filter(F.col("error").isNotNull()).count() == 0
    players = P.mock_players_from_games(parsed).cache()
    out = P.build_star(spark, parsed, players)
    out["_players"] = players
    yield out
    parsed.unpersist()
    players.unpersist()


def test_dims_deduplicate_across_copies(star):
    # 48 games, but the dims collapse to the distinct real-world entities
    assert star["game"].count() == len(BASE_GAMES) * COPIES
    assert star["venue"].count() == 3
    assert star["team"].count() == 6  # 2 teams per fixture, disjoint
    # player dim: one row per distinct roster name_id, not per game copy
    n_players = star["_players"].count()
    assert star["_players"].select("name_id").distinct().count() == n_players


@pytest.mark.slow
def test_surrogate_ids_unique_and_dense(star):
    for name in ("game", "venue", "team", "play"):
        df = star[name]
        n = df.count()
        ids = df.select("id").distinct()
        assert ids.count() == n, name
        lo, hi = df.agg(F.min("id"), F.max("id")).first()
        assert (lo, hi) == (1, n), name


def test_play_fk_integrity(star):
    plays = star["play"]
    orphan_games = plays.join(
        star["game"].select(F.col("id").alias("game_id")), "game_id", "left_anti"
    )
    assert orphan_games.count() == 0
    pl = star["_players"].select(F.col("id").alias("pid"))
    for fk in ("batter_id", "pitcher_id"):
        orphans = plays.join(pl, plays[fk] == pl.pid, "left_anti")
        assert orphans.count() == 0, fk


def test_per_copy_play_counts_identical(star):
    g = star["game"].select(F.col("id").alias("game_id"), "name_id")
    counts = (
        star["play"]
        .join(g, "game_id")
        .withColumn("base", F.substring("name_id", 1, 12))
        .groupBy("base", "name_id")
        .count()
    )
    spread = counts.groupBy("base").agg(
        F.countDistinct("count").alias("variants"), F.count("*").alias("copies")
    )
    rows = {r.base: (r.variants, r.copies) for r in spread.collect()}
    assert set(rows) == set(BASE_GAMES)
    for base, (variants, copies) in rows.items():
        assert variants == 1, f"{base}: play counts differ across copies"
        assert copies == COPIES
