"""HTML cache source/sink and the retrieval fallback chain.

Reference parity (pages.py):
  S3 cache-read source   _CachedHandler/_HtmlFolder (pages.py:168-172,
                         285-312) → wholetext read over the page-type
                         folder, name_id recovered from the file name
  S4 cache-write sink    insert_html (pages.py:298-306) → one
                         <name_id>.shtml per row via foreachPartition
  S1 web-fetch source    _WebHandler (pages.py:174-192) → injectable
                         fetch_fn inside mapInPandas; offline default
  S2 rate limiter        3.0 s global crawl delay (pages.py:13-14,
                         194-204) → the fetch frontier is coalesced to
                         ONE partition so a per-partition token bucket
                         IS the global limit; everything downstream of
                         the fetch stays fully parallel (O8)
  S5 fallback chain      cache → web, malformed falls through
                         (pages.py:130-147) → left join against the
                         cache, misses + parse failures go to fetch
  S6 non-cachable mark   is_cachable=False links always refetch and
                         never write back (bbref_pages.py:49-56)
  S10 fixture source     TESTING env redirect (pages.py:243-259) →
                         the cache root is just a parameter
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_TYPES = ("GamePage", "PlayerPage", "SchedulePage")
CRAWL_DELAY_SECS = 3.0

FetchFn = Callable[[str], str]  # url -> html


def default_fetcher(
    user_agent: str = "deep-field-spark/0.1 (+research use)",
    timeout: float = 30.0,
) -> FetchFn:
    """Stdlib HTTP fetcher for S1 live mode (reference pages.py:187-189
    uses requests.get; requests isn't available here and a GET with a
    UA header needs nothing beyond urllib).

    Raises on HTTP/socket errors — the token-bucket wrapper
    (_rate_limited_fetch) converts exceptions into error-column rows,
    so one dead URL quarantines that page instead of killing the batch
    (E3). Only engaged behind the CLI's explicit ``--online`` flag;
    offline/hermetic stays the default everywhere.
    """
    import urllib.request

    def fetch(url: str) -> str:
        req = urllib.request.Request(url, headers={"User-Agent": user_agent})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read().decode("utf-8", errors="replace")

    return fetch


def read_cache(
    spark: SparkSession, root: str, page_type: str | None = None
) -> DataFrame:
    """(page_type, name_id, html) rows from the cache folder tree.

    One file per page; `wholetext` keeps each page a single row. The
    name_id is the file stem, the page type its folder — both derived
    from input_file_name, so the scan needs no manifest.
    """
    types = [page_type] if page_type else [t for t in PAGE_TYPES
                                           if os.path.isdir(os.path.join(root, t))]
    dfs = []
    for t in types:
        df = (
            spark.read.option("pathGlobFilter", "*.shtml")
            .text(os.path.join(root, t), wholetext=True)
            .select(
                F.lit(t).alias("page_type"),
                F.regexp_replace(
                    F.element_at(F.split(F.input_file_name(), "/"), -1),
                    r"\.shtml$",
                    "",
                ).alias("name_id"),
                F.col("value").alias("html"),
            )
        )
        dfs.append(df)
    if not dfs:
        return spark.createDataFrame([], "page_type string, name_id string, html string")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def write_cache(df: DataFrame, root: str) -> None:
    """Persist (page_type, name_id, html) rows as cache files —
    idempotent overwrite, the raw-zone write-through (S4)."""

    def write_partition(rows) -> None:
        for row in rows:
            d = os.path.join(root, row.page_type)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{row.name_id}.shtml"), "w",
                      encoding="utf-8") as f:
                f.write(row.html)

    df.select("page_type", "name_id", "html").foreachPartition(write_partition)


def _rate_limited_fetch(
    it: Iterator[pd.DataFrame], fetch_fn: FetchFn, delay: float
) -> Iterator[pd.DataFrame]:
    """Token-bucket fetch; runs inside ONE partition so the delay is a
    global invariant (the reference's politeness contract)."""
    last = 0.0
    for pdf in it:
        htmls, errors = [], []
        for url in pdf["url"]:
            wait = last + delay - time.monotonic()
            if wait > 0:
                time.sleep(wait)
            last = time.monotonic()
            try:
                htmls.append(fetch_fn(url))
                errors.append(None)
            except Exception as e:
                htmls.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        out = pdf[["url", "name_id", "page_type", "is_cachable"]].copy()
        out["html"] = htmls
        out["error"] = errors
        yield out


def fetch_pages(
    frontier: DataFrame,
    fetch_fn: FetchFn,
    delay: float = CRAWL_DELAY_SECS,
) -> DataFrame:
    """Serialized polite fetch of (url, name_id, page_type, is_cachable)
    rows. coalesce(1) is DELIBERATE: the crawl delay is a global
    politeness invariant, so the fetch stage is the one intentionally
    serial stage in the pipeline (reference O8); parsing and everything
    downstream re-parallelizes."""
    schema = ("url string, name_id string, page_type string, "
              "is_cachable boolean, html string, error string")
    one = frontier.coalesce(1)
    return one.mapInPandas(
        lambda it: _rate_limited_fetch(it, fetch_fn, delay), schema
    )


def resolve_pages(
    frontier: DataFrame,
    cache_df: DataFrame,
    fetch_fn: FetchFn | None = None,
    cache_root: str | None = None,
    delay: float = CRAWL_DELAY_SECS,
) -> DataFrame:
    """The fallback chain (S5): serve each frontier link from the cache
    when possible, else fetch (rate-limited) and optionally write back.

    frontier: (url, name_id, page_type, is_cachable). Non-cachable rows
    (S6) skip the cache probe entirely. With fetch_fn=None (offline/
    hermetic mode — the container has no network) cache misses raise,
    which is the correct hermetic-test behavior.

    Returns (page_type, name_id, html, from_cache).
    """
    cached = frontier.filter(F.col("is_cachable")).join(
        cache_df.select("name_id", "page_type", "html"),
        ["name_id", "page_type"],
        "inner",
    )
    misses = frontier.join(
        cached.select("name_id", "page_type"), ["name_id", "page_type"], "left_anti"
    )
    hit_out = cached.select(
        "page_type", "name_id", "html", F.lit(True).alias("from_cache")
    )
    if fetch_fn is None:
        n_miss = misses.count()
        if n_miss:
            sample = [r.name_id for r in misses.select("name_id").limit(5).collect()]
            raise ValueError(
                f"{n_miss} cache misses with no fetcher configured (offline "
                f"mode); first missing: {sample}"
            )
        return hit_out
    # Materialize the fetch exactly once: write_cache is an eager action
    # and the returned union is consumed by the caller — without the
    # checkpoint each would re-run the rate-limited web fetch (doubling
    # live requests and crawl delay, and racing page content between the
    # cache files and the returned rows).
    fetched = fetch_pages(misses, fetch_fn, delay).localCheckpoint()
    ok = fetched.filter(F.col("error").isNull())
    if cache_root is not None:
        write_cache(ok.filter(F.col("is_cachable")), cache_root)
    return hit_out.unionByName(
        ok.select("page_type", "name_id", "html", F.lit(False).alias("from_cache"))
    )
