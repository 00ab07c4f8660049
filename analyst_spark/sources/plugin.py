"""User-extensibility surface (the reference's plugin protocol,
plugins/api.go:27-98, collapsed to native PySpark).

The reference spawns child processes speaking JSON-RPC over stdio and
feeds rows one per call. In Spark the same three extension points are
in-process and Arrow-batched:

* source plugin   → a Python generator / iterable → DataFrame
* transform plugin (UDTF, N rows in / M rows out) → ``mapInPandas``
* destination plugin → ``foreachPartition`` / driver iteration

Per-destination routing (plugin rows carrying a ``destination``) maps
to an output column split downstream with filters, per SURVEY §2.8.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession


def python_source(
    spark: SparkSession,
    rows: Iterable | Callable[[], Iterable],
    columns: list[str],
) -> DataFrame:
    """Source plugin: any iterable of positional rows (plugins/api.go:
    68-80 — the engine polled `receive` until empty; here the iterable
    just ends)."""
    from analyst_spark.sources.literal import _frame

    data = list(rows() if callable(rows) else rows)
    return _frame(spark, [list(r) for r in data], columns)


def python_transform(
    df: DataFrame,
    fn: Callable[["pandas.DataFrame"], "pandas.DataFrame"],  # noqa: F821
    output_schema: str,
) -> DataFrame:
    """Transform plugin (UDTF: N in / M out). ``fn`` receives pandas
    batches — the direct analog of the JSON-RPC ``receive(rows) →
    {rows}`` contract (plugins/api.go:40-65) but Arrow-batched instead
    of one row per RPC call (the reference TODO at
    plugins/transform.go:184-185, solved structurally here)."""

    def run(batches: Iterator["pandas.DataFrame"]):  # noqa: F821
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema=output_schema)


def python_destination(
    df: DataFrame,
    fn: Callable[[Iterable], None],
    batch_size: int = 500,
) -> None:
    """Destination plugin: user callable receives row batches
    (plugins/api.go:83-98). Batch size mirrors the reference's
    ROWS_PER_BATCH default of 500 (engine/sql_dest.go:26)."""
    def handle_partition(rows):
        batch = []
        for r in rows:
            batch.append(tuple(r))
            if len(batch) >= batch_size:
                fn(batch)
                batch = []
        if batch:
            fn(batch)

    df.foreachPartition(handle_partition)


def split_by_destination(
    df: DataFrame,
    destinations: list[str],
    dest_col: str = "destination",
    drop: bool = True,
) -> dict[str, DataFrame]:
    """Per-destination routing: a transform-plugin output row may be
    addressed to one consumer (plugins/api.go:55-58; multiplexer
    routing engine/multiplexer.go:30-52). The Spark form: the UDF
    emits a ``destination`` column; this splits it into one DataFrame
    per declared consumer. NULL/absent destination = broadcast to all
    (the reference's wildcard message)."""
    from pyspark.sql import functions as F

    out = {}
    for d in destinations:
        part = df.filter(
            F.col(dest_col).isNull() | (F.col(dest_col) == d)
        )
        out[d] = part.drop(dest_col) if drop else part
    return out
