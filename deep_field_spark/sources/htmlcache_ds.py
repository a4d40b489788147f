"""PySpark-4 Python DataSource for the HTML cache tree.

The cache folder layout (``{root}/{PageType}/{name_id}.shtml``, one
page per file — reference deepfield/scraping/pages.py keeps the same
raw zone on disk) already reads via ``scraping.cache.read_cache``
(wholetext + input_file_name). This module exposes the SAME rows
through Spark's first-class source API instead:

    spark.dataSource.register(HtmlCacheDataSource)
    spark.read.format("bbref_cache").option("path", root).load()
    df.write.format("bbref_cache").option("path", root).mode("append").save()

Why both exist: read_cache is a composition of built-in scans (zero
Python in the read path — the faster default); the DataSource form is
the extension-point parity row (SURVEY.md §2.1 custom sources) and
the right shape when a source genuinely cannot be expressed as
files-of-rows (an API pager, a rate-limited fetch frontier): the
driver enumerates partitions (metadata only), and each executor reads
its own partition's files in parallel — one InputPartition per cache
file, so parallelism scales with the cache, not the page-type count.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

PAGE_TYPES = ("GamePage", "PlayerPage", "SchedulePage")
SCHEMA = "page_type string, name_id string, html string"


class HtmlCacheDataSource(DataSource):
    """format("bbref_cache"): options path (cache root), pagetype
    (optional filter to one page type)."""

    @classmethod
    def name(cls) -> str:
        return "bbref_cache"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "HtmlCacheReader":
        return HtmlCacheReader(self.options)

    def writer(self, schema, overwrite: bool) -> "HtmlCacheWriter":
        return HtmlCacheWriter(self.options, overwrite=overwrite)

    def streamReader(self, schema) -> "HtmlCacheStreamReader":
        return HtmlCacheStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "HtmlCacheStreamWriter":
        return HtmlCacheStreamWriter(self.options)


class HtmlCacheReader(DataSourceReader):
    def __init__(self, options) -> None:
        root = options.get("path")
        if not root:
            raise ValueError("bbref_cache requires .option('path', cache_root)")
        self.root = root
        want = options.get("pagetype")
        self.types = (want,) if want else PAGE_TYPES

    def partitions(self) -> list[InputPartition]:
        # driver-side file enumeration is metadata-only; each file is
        # its own partition so executors read the cache in parallel
        parts: list[InputPartition] = []
        for t in self.types:
            d = os.path.join(self.root, t)
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                if fname.endswith(".shtml"):
                    parts.append(InputPartition((t, os.path.join(d, fname))))
        if not parts:
            # contract: at least one partition, even for an empty cache
            parts.append(InputPartition(None))
        return parts

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        page_type, fpath = partition.value
        name_id = os.path.basename(fpath)[: -len(".shtml")]
        # newline="" keeps CRLF bytes verbatim — Spark's text reader
        # never newline-translates, and the two sources must agree
        with open(fpath, encoding="utf-8", newline="") as f:
            yield (page_type, name_id, f.read())


class CacheCommit(WriterCommitMessage):
    def __init__(self, files):
        self.files = files


class HtmlCacheWriter(DataSourceWriter):
    """Executor-side writer: each partition lands its pages under a
    task-temp root; commit() promotes them with atomic renames, abort()
    discards — the two-phase commit every file sink needs so a failed
    or speculative task never leaves half-written cache files."""

    def __init__(self, options, overwrite: bool = False) -> None:
        import uuid

        root = options.get("path")
        if not root:
            raise ValueError("bbref_cache write requires .option('path', cache_root)")
        self.root = root
        self.overwrite = overwrite
        # per-writer staging dir (uuid minted driver-side, shipped to
        # executors with the pickled writer): two concurrent writes to
        # the same root stage in DIFFERENT directories, so one job's
        # commit/abort rmtree cannot clobber the other's in-flight
        # task files
        self.tmp = os.path.join(root, f"._ds_tmp_{uuid.uuid4().hex}")

    def write(self, rows):
        import uuid

        task_dir = os.path.join(self.tmp, uuid.uuid4().hex)
        written: list[tuple[str, str]] = []
        for row in rows:
            d = os.path.join(task_dir, row.page_type)
            os.makedirs(d, exist_ok=True)
            rel = os.path.join(row.page_type, f"{row.name_id}.shtml")
            with open(os.path.join(task_dir, rel), "w", encoding="utf-8",
                      newline="") as f:
                f.write(row.html)
            written.append((task_dir, rel))
        return CacheCommit(written)

    def commit(self, messages):
        import shutil

        if self.overwrite:
            # mode("overwrite") contract: the committed frame REPLACES
            # the cache — clear existing pages (driver-side, before
            # promotion) so stale files don't read back as live data
            for t in PAGE_TYPES:
                d = os.path.join(self.root, t)
                if os.path.isdir(d):
                    for f in os.listdir(d):
                        if f.endswith(".shtml"):
                            os.remove(os.path.join(d, f))
        for m in messages:
            for task_dir, rel in m.files:
                dst = os.path.join(self.root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(os.path.join(task_dir, rel), dst)
        shutil.rmtree(self.tmp, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.tmp, ignore_errors=True)


class HtmlCacheStreamReader(DataSourceStreamReader):
    """Micro-batch streaming reader over the cache tree: the offset is
    {page_type: files_consumed} over the NAME-SORTED file list per
    type, so a crawl that keeps dropping pages into the cache becomes
    a stream — each batch's partitions are exactly the newly arrived
    files (one InputPartition each, executor-side reads), replayed
    batches re-derive the same file slice from the same offsets, and
    nothing is read twice. File listing is driver-side metadata only,
    the same economics as a file-source's directory poll.

    Caveat the offset contract imposes (and the reason real file
    sources track names, not counts): files must arrive append-only
    in name order per type — the sorted-prefix offset is what makes
    (start, end] deterministic under replay.
    """

    def __init__(self, options) -> None:
        root = options.get("path")
        if not root:
            raise ValueError("bbref_cache stream requires .option('path', root)")
        self.root = root
        # honor the same pagetype filter as the batch reader — the
        # offset dict simply only carries the requested types
        want = options.get("pagetype")
        self.types = (want,) if want else PAGE_TYPES

    def _files(self, t: str) -> list[str]:
        d = os.path.join(self.root, t)
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".shtml")
        )

    def initialOffset(self) -> dict:
        return {t: 0 for t in self.types}

    def latestOffset(self) -> dict:
        return {t: len(self._files(t)) for t in self.types}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts = []
        for t in self.types:
            fs = self._files(t)
            for fpath in fs[int(start.get(t, 0)): int(end.get(t, 0))]:
                parts.append(InputPartition((t, fpath)))
        if not parts:
            parts.append(InputPartition(None))
        return parts

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        page_type, fpath = partition.value
        name_id = os.path.basename(fpath)[: -len(".shtml")]
        with open(fpath, encoding="utf-8", newline="") as f:
            yield (page_type, name_id, f.read())

    def commit(self, end: dict) -> None:
        pass


class HtmlCacheStreamWriter(DataSourceStreamWriter):
    """Streaming write into the cache tree: batch semantics are the
    same task-temp + atomic-rename promotion as HtmlCacheWriter, and
    page identity (page_type, name_id) makes replayed micro-batches
    idempotent — a re-committed batch overwrites its own pages, never
    duplicates them (same contract as sinks.foreach_batch_merge_upsert,
    keyed by file path instead of table key)."""

    def __init__(self, options) -> None:
        self._inner = HtmlCacheWriter(options)

    def write(self, rows):
        return self._inner.write(rows)

    def commit(self, messages, batchId: int) -> None:
        self._inner.commit([m for m in messages if m is not None])

    def abort(self, messages, batchId: int) -> None:
        self._inner.abort(messages)
