"""HTTP/JSON source (engine/http_source.go:15-232).

Reference semantics reproduced:

* GET ``url``; rows live at ``json_path`` (dot path into the payload).
* Rows are objects (keys matched case-insensitively to ``columns``,
  extra keys dropped, missing keys → NULL) or positional arrays.
* Limit/offset pagination via query params; stops on first empty page.
* Custom headers.

Pagination is inherently sequential → the fetch loop is driver-side
(as in the reference); the parsed rows become a distributed DataFrame.
For bulk HTTP ingestion at scale you'd fan a URL-list DataFrame
through mapInPandas instead — see ``http_source_distributed``.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from analyst_spark.sources.literal import _frame

try:
    import requests
except ImportError:  # pragma: no cover
    requests = None


def _extract_path(payload, path: str | None):
    if not path:
        return payload
    cur = payload
    for part in path.split("."):
        if isinstance(cur, dict):
            cur = cur[part]
        elif isinstance(cur, list):
            cur = cur[int(part)]
        else:
            raise KeyError(path)
    return cur


def _rows_from_items(items: Iterable, columns: list[str]) -> list[list]:
    rows = []
    for item in items:
        if isinstance(item, dict):
            lower = {k.lower(): v for k, v in item.items()}
            rows.append([lower.get(c.lower()) for c in columns])
        else:
            row = list(item)
            if len(row) != len(columns):
                raise ValueError("positional row width != COLUMNS width")
            rows.append(row)
    return rows


def http_source(
    spark: SparkSession,
    url: str,
    columns: list[str],
    json_path: str | None = None,
    headers: dict[str, str] | None = None,
    page_size: int | None = None,
    limit_param: str = "limit",
    offset_param: str = "offset",
    max_pages: int = 10_000,
    _fetch=None,
) -> DataFrame:
    """Fetch (with optional pagination) and return a DataFrame.
    ``_fetch(url, params, headers) -> parsed-json`` is injectable for
    tests (the reference tests use an httptest server the same way)."""
    if _fetch is None:
        if requests is None:
            raise ImportError("requests not available for http_source")

        def _fetch(u, params, hdrs):
            r = requests.get(u, params=params, headers=hdrs, timeout=60)
            r.raise_for_status()
            return r.json()

    all_rows: list[list] = []
    if page_size:
        offset = 0
        for _ in range(max_pages):
            payload = _fetch(
                url, {limit_param: page_size, offset_param: offset}, headers
            )
            items = _extract_path(payload, json_path)
            if not items:
                break  # empty page terminates (http_source.go:141-146)
            all_rows.extend(_rows_from_items(items, columns))
            offset += page_size
    else:
        payload = _fetch(url, None, headers)
        all_rows = _rows_from_items(_extract_path(payload, json_path), columns)
    return _frame(spark, all_rows, columns)


def http_source_distributed(
    spark: SparkSession,
    urls: DataFrame,
    columns: list[str],
    json_path: str | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Scale path: a DataFrame of URLs fetched by executors via
    mapInPandas (thousands of endpoints, not thousands of pages)."""
    import pandas as pd

    schema = ", ".join(f"`{c}` string" for c in columns)

    def fetch_batch(batches):
        for pdf in batches:
            out = []
            for u in pdf[url_col]:
                payload = requests.get(u, timeout=60).json()
                for row in _rows_from_items(_extract_path(payload, json_path), columns):
                    out.append([None if v is None else str(v) for v in row])
            yield pd.DataFrame(out, columns=columns)

    return urls.mapInPandas(fetch_batch, schema=schema)
