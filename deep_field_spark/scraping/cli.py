"""Command-line entry point — the reference's main CLI re-expressed.

Reference: ``python -m deepfield.scraper <start_year> [end_year]
[-d db] [-c delay]`` (deepfield/scraper.py:14-60; SURVEY §3.1). This
is the Spark twin::

    python -m deep_field_spark <start_year> [end_year]
        [--cache ROOT] [-d DB] [--parquet ROOT] [-c DELAY] [--online]

Differences by design:
  - Offline-first: pages come from the HTML cache (S3); the web stage
    of the fallback chain only engages behind the explicit ``--online``
    flag (stdlib fetcher, cache.default_fetcher) or when a fetcher is
    injected programmatically — hermetic like the reference's TESTING
    mode (pages.py:254-257) unless the operator opts in.
  - The per-year DFS loop becomes one batch run filtered to the year
    range (orchestrate.scrape_from_cache) — same effective insert
    order, dataset-parallel.

Parity pieces:
  - F16 year-range validation (scraper.py:26-32): 1920 ≤ start ≤ end
    ≤ current year (EARLIEST_YEAR = 1920, scraper.py:11), else exit 2.
  - db-name sanitization (script_utils.py:29-39): basename only,
    ``.db`` suffix enforced.
  - Crawl-delay guardrail (scraper.py:34-44): delays below 3.0 s warn
    and clamp (the reference also punishes with a 15 s sleep). The
    clamped value IS the token-bucket rate of the ``--online`` fetch
    stages (cache.fetch_pages); offline runs have no fetch stage and
    only surface it in the printed counters.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

# Earliest season the reference accepts: EARLIEST_YEAR = 1920
# (/root/reference/deepfield/scraper.py:11 — the live-ball era start).
MIN_YEAR = 1920
MIN_CRAWL_DELAY = 3.0


def validate_years(start: int, end: int | None) -> tuple[int, int]:
    """F16: inclusive [start, end] bounded to [1920, current year]."""
    end = start if end is None else end
    this_year = datetime.date.today().year
    if not (MIN_YEAR <= start <= end <= this_year):
        raise ValueError(
            f"year range [{start}, {end}] outside [{MIN_YEAR}, {this_year}]"
        )
    return start, end


def sanitize_db_name(name: str) -> str:
    """Basename + '.db' suffix (script_utils.py:29-39 parity)."""
    base = os.path.basename(name.strip())
    if not base:
        raise ValueError("empty database name")
    return base if base.endswith(".db") else f"{base}.db"


def clamp_crawl_delay(delay: float) -> float:
    if delay < MIN_CRAWL_DELAY:
        print(
            f"crawl delay {delay} below the {MIN_CRAWL_DELAY}s etiquette "
            "minimum; clamping",
            file=sys.stderr,
        )
        return MIN_CRAWL_DELAY
    return delay


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="deep_field_spark")
    p.add_argument("start_year", type=int)
    p.add_argument("end_year", type=int, nargs="?", default=None)
    p.add_argument("--cache", default="bbref_cache",
                   help="HTML cache root (GamePage/PlayerPage/SchedulePage dirs)")
    p.add_argument("-d", "--db", default="stats.db", help="SQLite output db name")
    p.add_argument("--parquet", default=None, help="optional parquet star root")
    p.add_argument("-c", "--crawl-delay", type=float, default=MIN_CRAWL_DELAY)
    p.add_argument("--online", action="store_true",
                   help="fetch missing schedules and uncached game links "
                        "over HTTP (stdlib fetcher, rate-limited to the "
                        "crawl delay) and write them through to the cache; "
                        "default is fully offline/hermetic")
    p.add_argument("--strict-players", action="store_true",
                   help="refuse games whose roster players are not in the "
                        "cache (the reference's dependency check) instead "
                        "of mock-filling")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    try:
        years = validate_years(args.start_year, args.end_year)
        db = sanitize_db_name(args.db)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    crawl_delay = clamp_crawl_delay(args.crawl_delay)

    from ..session import get_spark
    from .cache import default_fetcher
    from .orchestrate import scrape_from_cache

    spark = get_spark("deep_field_spark_scraper")
    try:
        _, counters = scrape_from_cache(
            spark,
            args.cache,
            db_path=db,
            parquet_root=args.parquet,
            allow_mock_players=not args.strict_players,
            year_range=years,
            fetch_fn=default_fetcher() if args.online else None,
            crawl_delay=crawl_delay,
        )
    except KeyboardInterrupt:
        # E5 parity with the reference's graceful ^C exit
        # (/root/reference/deepfield/scraper.py:50-54 "Ending scrape").
        # The idempotent upserts + anti-join frontier make any partial
        # scrape safe to resume by rerunning the same command.
        print("Ending scrape (interrupted); rerun to resume", file=sys.stderr)
        return 130
    finally:
        spark.stop()
    counters["crawl_delay_secs"] = crawl_delay
    for k in sorted(counters):
        print(f"{k}: {counters[k]}")
    return 0
