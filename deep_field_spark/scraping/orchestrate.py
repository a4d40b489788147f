"""Stage-DAG orchestration: the reference's recursive DFS scrape
(nodes.py:36-48, post-order insert) re-expressed as batch stages in
dependency order — players before games before plays — with anti-join
work-skipping instead of per-link DB probes.

  1. cache read (S3)                 pages by type
  2. schedule parse (P4)             game-link frontier
  3. frontier anti-join (J3/O2)      skip games already in the star
  4. game parse (P1/P5-P8, E1/E2)    metas + rosters + raw plays
  5. player frontier (J3)            roster name_ids not yet in the dim
                                     (online: fetched before mock-fill)
  6. player parse / mock fill (E4)   the reference REFUSES to insert a
                                     game whose players are missing
                                     (pages.py:100-104); offline runs
                                     over partial caches may instead
                                     mock-fill like its test harness
                                     (tests/utils.py:37-52)
  7. star build (J1-J5, W1-W4, F*)
  8. sinks (S7-S9 sqlite, parquet)

The scrape counter (A1, nodes.py:27-34) generalizes to per-stage
counts returned alongside the star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cache as C
from . import pipeline as P
from . import sqlite_sink as SS


class DependencyError(ValueError):
    """A game's roster references players absent from the player dim
    (the reference's unresolved-dependency ValueError, pages.py:104)."""


def scrape_from_cache(
    spark: SparkSession,
    cache_root: str,
    db_path: str | None = None,
    parquet_root: str | None = None,
    existing: dict[str, DataFrame] | None = None,
    allow_mock_players: bool = True,
    year_range: tuple[int, int] | None = None,
    fetch_fn: C.FetchFn | None = None,
    crawl_delay: float = C.CRAWL_DELAY_SECS,
) -> tuple[dict[str, DataFrame], dict[str, int]]:
    """Run the full ETL over a page cache; returns (star, counters).

    Hermetic by default (the fallback chain's web stage never engages
    with ``fetch_fn=None``); resume = pass the previous run's star as
    ``existing`` — the anti-joins skip everything already present
    (O2/E5). With a ``fetch_fn`` (the CLI's ``--online`` mode passes
    ``cache.default_fetcher()``) missing schedule pages for the year
    range, uncached game links, and the games' missing player pages
    (the reference's dependency frontier) are fetched through the
    rate-limited token bucket at ``crawl_delay`` seconds/request and
    written back to the cache (S1/S4/S5); fetch failures are
    quarantined to a counter rather than failing the run (E3), with
    unfetchable players falling back to mock-fill.
    """
    counters: dict[str, int] = {}
    pages = C.read_cache(spark, cache_root).cache()
    for r in pages.groupBy("page_type").agg(F.count("*").alias("n")).collect():
        counters[f"pages_{r.page_type}"] = r.n

    # 1b: online schedule fill — one page per requested season, so the
    # frontier is a driver-side list by nature (bounded by year_range).
    # The current season's schedule keeps changing → never cached (S6,
    # scraper.py:39-41).
    if fetch_fn is not None and year_range is not None:
        import datetime

        from . import parse as PP

        have = {
            r.name_id
            for r in pages.filter(F.col("page_type") == "SchedulePage")
            .select("name_id")
            .collect()
        }
        this_year = datetime.date.today().year
        need = [
            (PP.schedule_url(y), f"{y}-schedule", "SchedulePage", y != this_year)
            for y in range(year_range[0], year_range[1] + 1)
            if f"{y}-schedule" not in have or y == this_year
        ]
        if need:
            frontier = spark.createDataFrame(
                need, "url string, name_id string, page_type string, is_cachable boolean"
            )
            fetched = C.fetch_pages(frontier, fetch_fn, crawl_delay).localCheckpoint()
            ok_f = fetched.filter(F.col("error").isNull())
            counters["schedules_fetched"] = ok_f.count()
            counters["schedule_fetch_errors"] = (
                fetched.filter(F.col("error").isNotNull()).count()
            )
            C.write_cache(ok_f.filter(F.col("is_cachable")), cache_root)
            pages = pages.join(
                ok_f.select("name_id", "page_type"), ["name_id", "page_type"],
                "left_anti",
            ).unionByName(ok_f.select("page_type", "name_id", "html")).cache()

    # 2-3: schedule → game frontier. In a cache-only run the frontier is
    # the coverage signal: links the schedules reference that the cache
    # does not yet hold are exactly what a subsequent online run must
    # fetch (O2 resume). One action computes both counters.
    sched = pages.filter(F.col("page_type") == "SchedulePage").select("name_id", "html")
    game_links = (
        P.parse_schedule_pages(sched)
        .filter(F.col("error").isNull())
        .filter(F.col("page_type") == "GamePage")
        .select("name_id", "url")
    )
    uncached = game_links.join(
        pages.filter(F.col("page_type") == "GamePage").select("name_id"),
        "name_id",
        "left_anti",
    )
    link_stats = game_links.agg(
        F.count("*").alias("links"),
    ).crossJoin(uncached.agg(F.count("*").alias("missing"))).first()
    counters["schedule_links"] = link_stats["links"]
    counters["frontier_not_in_cache"] = link_stats["missing"]

    # 3b: online game fill — fetch the uncached frontier through the
    # same token bucket, using the URLs the schedules actually linked
    # (no reconstruction), write-through to the cache (S4), then fold
    # the fetched pages into the batch.
    if fetch_fn is not None and link_stats["missing"]:
        frontier = uncached.select(
            "url", "name_id",
            F.lit("GamePage").alias("page_type"),
            F.lit(True).alias("is_cachable"),
        )
        fetched = C.fetch_pages(frontier, fetch_fn, crawl_delay).localCheckpoint()
        ok_f = fetched.filter(F.col("error").isNull())
        counters["games_fetched"] = ok_f.count()
        counters["game_fetch_errors"] = (
            fetched.filter(F.col("error").isNotNull()).count()
        )
        C.write_cache(ok_f, cache_root)
        pages = pages.unionByName(ok_f.select("page_type", "name_id", "html")).cache()

    game_pages = pages.filter(F.col("page_type") == "GamePage").select("name_id", "html")
    if year_range is not None:
        # game name_ids embed the date: ABC2017101200 → chars 4-7 are the
        # year (the CLI's per-year scrape scope, scraper.py:51-60).
        yr = F.substring("name_id", 4, 4).cast("int")
        game_pages = game_pages.filter(yr.between(*year_range))
    if existing and "game" in existing:
        game_pages = game_pages.join(
            existing["game"].select(F.col("name_id")), "name_id", "left_anti"
        )
    counters["game_pages_to_parse"] = game_pages.count()

    # 4: parse + quarantine
    parsed = P.parse_game_pages(game_pages).cache()
    ok = parsed.filter(F.col("error").isNull())
    counters["games_parsed"] = ok.count()
    counters["games_quarantined"] = parsed.filter(F.col("error").isNotNull()).count()

    # 5-6: player dim — parsed player pages first, roster mocks for the rest
    existing_players = existing.get("player") if existing else None
    player_pages = pages.filter(F.col("page_type") == "PlayerPage").select(
        "name_id", "html"
    )
    if existing_players is not None:
        player_pages = player_pages.join(
            existing_players.select("name_id"), "name_id", "left_anti"
        )
    parsed_players = P.parse_player_pages(player_pages)
    # cache: this lineage (player-parse UDF + surrogate-id window) is
    # driven by several downstream actions (count, missing anti-join,
    # mock upsert, star build, sink writes) — uncached it would re-run
    # the parse per action
    players = P.players_dim_from_parsed(parsed_players, existing=existing_players).cache()
    counters["players_from_pages"] = players.count()

    roster_ids = P.roster_names(ok).select("name_id").distinct()
    missing = roster_ids.join(players.select("name_id"), "name_id", "left_anti")
    n_missing = missing.count()

    # 5b: online player fill — the reference's game→player dependency
    # frontier (bbref_pages.py:155-159): fetch the missing player pages
    # before falling back to mock-fill. URL layout is
    # /players/<first char>/<name_id>.shtml (bbref_pages.py:348).
    if fetch_fn is not None and n_missing:
        from . import parse as PP

        frontier = missing.select(
            F.concat(
                F.lit(PP.BASE_URL + "/players/"),
                F.substring("name_id", 1, 1),
                F.lit("/"),
                F.col("name_id"),
                F.lit(".shtml"),
            ).alias("url"),
            "name_id",
            F.lit("PlayerPage").alias("page_type"),
            F.lit(True).alias("is_cachable"),
        )
        fetched = C.fetch_pages(frontier, fetch_fn, crawl_delay).localCheckpoint()
        ok_f = fetched.filter(F.col("error").isNull())
        counters["players_fetched"] = ok_f.count()
        counters["player_fetch_errors"] = (
            fetched.filter(F.col("error").isNotNull()).count()
        )
        C.write_cache(ok_f, cache_root)
        parsed_fetched = P.parse_player_pages(ok_f.select("name_id", "html"))
        players = P.players_dim_from_parsed(parsed_fetched, existing=players).cache()
        # fetch failures (and parse quarantines) fall through to the
        # mock-fill / strict-mode handling below
        missing = roster_ids.join(players.select("name_id"), "name_id", "left_anti")
        n_missing = missing.count()

    counters["players_mock_filled"] = n_missing
    if n_missing:
        if not allow_mock_players:
            sample = [r.name_id for r in missing.limit(5).collect()]
            raise DependencyError(
                f"{n_missing} roster players missing from the player dim; "
                f"first: {sample}"
            )
        mock_source = P.roster_names(ok).join(missing, "name_id", "left_semi")
        rows = mock_source.select(
            "name_id",
            F.col("roster_name").alias("name"),
            F.lit(1).cast("smallint").alias("bats"),
            F.lit(1).cast("smallint").alias("throws"),
        )
        players = P.upsert_dim(rows, players, ["name_id"]).cache()

    # 7: star build
    star = P.build_star(spark, parsed, players, existing=existing)
    counters["plays"] = star["play"].count()
    counters["games"] = star["game"].count()

    # 8: sinks
    if db_path is not None:
        SS.write_star(star, db_path)
    if parquet_root is not None:
        SS.write_star_parquet(star, parquet_root)
    return star, counters
