"""Spark 4 Python DataSource implementations — the idiomatic
replacement for the reference's JSON-RPC plugin-source protocol
(plugins/api.go:68-80, plugins/source.py).

Where the reference runs a child process on the driver and pulls rows
one RPC at a time, a registered Python DataSource declares schema and
PARTITIONS, so reads execute on executors in parallel and Catalyst
sees an ordinary relation (prunable, joinable, cacheable).

Two sources:

* ``paged_json`` — the HTTPSource analog (engine/http_source.go:15-30,
  limit/offset pagination): one InputPartition per page; each
  executor task fetches and parses its own page. Uses urllib so
  ``file://`` URLs work in tests; at scale the url is an HTTP API and
  page count becomes the parallelism.
* ``synthetic_corpus`` — deterministic documents-with-binary-columns
  generator (text + fake image bytes per doc) for pipeline tests and
  benchmarks: rows are generated on executors, partitioned evenly,
  no driver materialization.

Register with :func:`register_datasources`, then
``spark.read.format("paged_json").schema(...).options(...).load()``.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PagedJsonDataSource(DataSource):
    """Options: url_template (with ``{offset}`` / ``{limit}``
    placeholders), page_size (default 50 — the reference's default),
    max_pages. Empty / missing pages yield no rows (the reference
    stops at the first empty page; with static partition planning,
    trailing empty pages are simply empty tasks)."""

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self) -> str:
        # caller normally passes an explicit .schema(); this default
        # mirrors the reference's COLUMNS-option-required behavior
        return "value string"

    def reader(self, schema) -> "PagedJsonReader":
        return PagedJsonReader(schema, self.options)


class PagedJsonReader(DataSourceReader):
    def __init__(self, schema, options):
        self.columns = [f.name for f in schema.fields]
        self.url_template = options["url_template"]
        self.page_size = int(options.get("page_size", "50"))
        self.max_pages = int(options.get("max_pages", "16"))

    def partitions(self):
        return [InputPartition(p) for p in range(self.max_pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        page = partition.value
        url = self.url_template.format(
            offset=page * self.page_size, limit=self.page_size, page=page
        )
        try:
            with urllib.request.urlopen(url) as resp:
                items = json.loads(resp.read().decode())
        except OSError:
            return  # missing page == empty page
        for item in items:
            # objects matched case-insensitively to declared columns,
            # missing keys -> None (http_source.go:181-232 semantics)
            lowered = {k.lower(): v for k, v in item.items()}
            yield tuple(lowered.get(c.lower()) for c in self.columns)


class SyntheticCorpusDataSource(DataSource):
    """Options: rows (default 1000), partitions (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, image binary"

    def reader(self, schema) -> "SyntheticCorpusReader":
        return SyntheticCorpusReader(self.options)


_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.num_parts = int(options.get("partitions", "8"))

    def partitions(self):
        step = -(-self.rows // self.num_parts)  # ceil division
        return [
            InputPartition((start, min(start + step, self.rows)))
            for start in range(0, self.rows, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        from analyst_spark.functions.multimodal import encode_fake_image

        start, end = partition.value
        for i in range(start, end):
            text = " ".join(
                _WORDS[(i * 7 + j) % len(_WORDS)] for j in range(5 + i % 11)
            )
            yield i, text, encode_fake_image(i, 8, 8)


def register_datasources(spark) -> None:
    """Idempotently register all custom sources on the session."""
    for src in (PagedJsonDataSource, SyntheticCorpusDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass  # already registered on this session
