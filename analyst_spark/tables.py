"""Load the driver-provided synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.

At 100 TB these would be partitioned parquet/iceberg datasets; the
loader keeps the access pattern identical (``spark.read.parquet`` on a
path prefix) so the only change at scale is the path and partition
layout. All query code selects/filters through Catalyst so partition
pruning and predicate pushdown apply unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spread(df: DataFrame, *by: str) -> DataFrame:
    """Repartition to the session's default shuffle parallelism.

    The driver testdata ships one unsplittable row-group per table, so
    every scan starts single-partition; any CPU-heavy per-row pipeline
    (md5 shingling, simhash bit-sums, vector math) must fan out first
    or it runs on one core. At 100 TB inputs arrive well-partitioned
    and this becomes a cheap no-op-ish balance step before heavy
    per-row compute — the standard skew guard, keyed by ``by`` to keep
    downstream groupBys co-partitioned.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # Note: no df.rdd.getNumPartitions() probe — converting the plan to
    # an RDD costs ~1s per call in Spark 4. The repartition itself is a
    # narrow-input shuffle AQE right-sizes, so just always insert it.
    return df.repartition(n, *by) if by else df.repartition(n)


def _ensure_read_confs(spark: SparkSession) -> None:
    """Normalize the SQL confs the loader's timestamp handling depends
    on. session.py sets all three at session setup; this exists because
    the external driver calls the contract with its OWN plain session.
    The NTZ->TIMESTAMP casts below are wall-clock-correct only under a
    UTC session — a non-UTC timezone would silently shift event
    timestamps against the DuckDB oracle, so it is forced (not merely
    asserted) here. Deliberate, idempotent, documented — not a hidden
    per-read side effect: the engine requires these on any session that
    reads its tables.

    - inferTimestampNTZ off: NTZ rejects half the timestamp expression
      surface (unix_micros, unix_timestamp, ...)
    - nanosAsLong: some testdata generators emit TIMESTAMP(NANOS),
      which the vectorized parquet reader rejects
    """
    if spark.conf.get("spark.sql.session.timeZone") not in (
        "UTC", "Etc/UTC", "GMT",
    ):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_read_confs(spark)
    if name == "events":
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: ns-epoch values exceed 2^53, so a
            # float divide rounds some timestamps off by 1µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.parquet(path)
    # belt-and-braces: if NTZ still slipped through (conf captured by an
    # earlier cached plan, or a future Spark ignores it), cast in-plan.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


class _LazyTables(dict):
    """Read each table's footer only when a plan actually touches it."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self:
            if name not in TABLE_NAMES:
                raise KeyError(name)
            self[name] = _read(self._spark, self._sf_dir, name)
        return super().__getitem__(name)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return _LazyTables(spark, sf_dir or DEFAULT_SF_DIR)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` works on it.

    This is the Spark-native analog of the reference's "stage anything
    into SQLite then query it" path (engine/auto_sql_transform.go:21-30)
    — except distributed, lazy, and optimizer-visible.
    """
    tables = load_tables(spark, sf_dir)
    for name in TABLE_NAMES:
        tables[name].createOrReplaceTempView(name)
    return tables


# |value| bound for the exact-integer-cents surrogate: cents =
# round(value*100) must stay well inside BIGINT and the float-exact
# integer range. 9e13 (cents ≤ 9e15 < 2^53) is far beyond any
# currency-like measurement; values outside it are data-quality
# rejects, not measurements.
CENTS_DOMAIN_MAX = 9e13


def cents_of(col) -> "F.Column":
    """Exact integer-cents surrogate of a 2-decimal double column —
    the order-free summation device the events family aggregates on.

    Values outside ``CENTS_DOMAIN_MAX`` map to NULL (excluded from
    sums/averages exactly like SQL NULL measurements) instead of
    killing the whole job: under ANSI arithmetic a single 1e18
    outlier crashed five operators with CAST_OVERFLOW in the r7
    extreme-value probe, and at 100 TB one poison row must never
    abort a scan. The DuckDB oracles guard with the same predicate.
    """
    v = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.abs(v) <= F.lit(CENTS_DOMAIN_MAX), F.round(v * 100).cast("long")
    )
