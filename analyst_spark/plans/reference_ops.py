"""The reference's operator inventory (SURVEY §2) exercised as
oracle-checked queries over the driver star schema.

Covers: AGGREGATE with all reducers (SUM/AVG/MIN/MAX/COUNT —
transforms/{sum,avg,min,max,count}.go; QUANTILE — quantile.go; CDF —
cdf.go; ZOH — zoh.go), LOOKUP inner/outer with last-wins dedup
(lookup.go), and APPLY/CAST (apply.go, cast.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analyst_spark.operators.aggregate import aggregate, cdf, quantile
from analyst_spark.operators.lookup import lookup_join
from analyst_spark.operators.zoh import zoh_mean
from analyst_spark.tables import load_tables


def agg_reducers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGGREGATE SUM/AVG/MIN/MAX/COUNT ... GROUP BY — all simple
    reducers in one pass (one shuffle, map-side combined). Outputs are
    DOUBLE like the reference's *float64 returns."""
    li = load_tables(spark, sf_dir)["lineitem"]
    df = aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            ("SUM", "l_quantity", "sum_qty"),
            ("AVG", "l_extendedprice", "avg_price"),
            ("MIN", "l_discount", "min_disc"),
            ("MAX", "l_tax", "max_tax"),
            ("COUNT", "l_orderkey", "n_rows"),
        ],
    )
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        "min_disc",
        "max_tax",
        "n_rows",
    )


AGG_REDUCERS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)       AS sum_qty,
       round(avg(l_extendedprice), 4)  AS avg_price,
       min(l_discount)                 AS min_disc,
       max(l_tax)                      AS max_tax,
       CAST(count(*) AS DOUBLE)        AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE(x, q) — exact interpolated percentile (the oracle
    form; production uses percentile_approx, same class as the
    reference's t-digest)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(quantile("l_extendedprice", [0.5, 0.95]).alias("p"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p95"),
        )
    )


AGG_QUANTILE_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem
GROUP BY l_returnflag
"""


def agg_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE via percentile_approx in its DETERMINISTIC regime
    (VERDICT r10 #8): the GK sketch's rank error is ε·n =
    n/accuracy, so with accuracy ≥ 2 × the largest group's rows the
    error is < 0.5 rank and the sketch returns the EXACT element at
    the target rank — hash-gateable against DuckDB quantile_disc
    while still exercising the full sketch build/merge path (the
    same mergeable-sketch class as the reference's t-digest,
    transforms/quantile.go:8-14). Domain: accuracy=1e6 is exact up
    to 500k rows/group — covers both gate decades (sf0.01 ≈ 20k,
    sf0.1 ≈ 200k rows/group); the production default-accuracy form
    is :func:`agg_quantile_sketch` (banded gate)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            quantile(
                "l_extendedprice", [0.5, 0.95], approx=True, accuracy=1000000
            ).alias("p")
        )
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p95"),
        )
    )


AGG_QUANTILE_APPROX_ORACLE = """
SELECT l_returnflag,
       round(quantile_disc(l_extendedprice, 0.5), 4)  AS p50,
       round(quantile_disc(l_extendedprice, 0.95), 4) AS p95
FROM lineitem
GROUP BY l_returnflag
"""


def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE via percentile_approx at Spark's DEFAULT accuracy
    (10000) — the production path at 100 TB, same approximation
    class as the reference's t-digest (transforms/quantile.go:8-14):
    mergeable sketches, bounded state per group. Estimates are
    impl-specific, so no hash oracle; tools/verify_local.py gates
    each group's p50/p95 inside the exact ±2/accuracy rank band and
    tests/test_aggregate.py bounds the error against the exact form."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(quantile("l_extendedprice", [0.5, 0.95], approx=True).alias("p"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p95"),
        )
    )


def agg_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF(x, v): empirical P(x <= v) per group (transforms/cdf.go —
    exact formulation; the reference's t-digest estimate converges to
    this)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_linestatus").agg(
        F.round(cdf("l_quantity", 25.0), 6).alias("cdf_qty_25")
    )


AGG_CDF_ORACLE = """
SELECT l_linestatus,
       round(avg(CASE WHEN l_quantity <= 25.0 THEN 1.0 ELSE 0.0 END), 6) AS cdf_qty_25
FROM lineitem
GROUP BY l_linestatus
"""


ZOH_START = "2024-01-05 00:00:00"
ZOH_FINISH = "2024-01-20 00:00:00"


def agg_zoh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZOH(t, v, start, finish) — zero-order-hold time-weighted mean
    of the irregular events series per event_type (transforms/zoh.go
    semantics; window-lead formulation, no UDF)."""
    ev = load_tables(spark, sf_dir)["events"]
    out = zoh_mean(ev, ["event_type"], "ts", "value", ZOH_START, ZOH_FINISH, alias="zoh_value")
    return out.select("event_type", F.round("zoh_value", 6).alias("zoh_value"))


AGG_ZOH_ORACLE = f"""
WITH pts AS (
    SELECT event_type,
           epoch_us(ts) / 1000000.0 AS t,
           value AS v,
           coalesce(lead(epoch_us(ts) / 1000000.0)
                        OVER (PARTITION BY event_type ORDER BY epoch_us(ts) / 1000000.0),
                    epoch_us(TIMESTAMP '{ZOH_FINISH}') / 1000000.0) AS nxt
    FROM events
), weighted AS (
    SELECT event_type, t, v,
           greatest(least(nxt, epoch_us(TIMESTAMP '{ZOH_FINISH}') / 1000000.0)
                    - greatest(t, epoch_us(TIMESTAMP '{ZOH_START}') / 1000000.0), 0.0) AS w
    FROM pts
)
SELECT event_type,
       round(CASE WHEN min(t) <= epoch_us(TIMESTAMP '{ZOH_START}') / 1000000.0
                  THEN sum(v * w) / sum(w) END, 6) AS zoh_value
FROM weighted
GROUP BY event_type
"""


def lookup_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOOKUP ... INNER JOIN with duplicate-keyed lookup side:
    customer ⋈ orders-as-lookup. The reference keeps ONE row per key —
    last wins (lookup.go:185-188); our deterministic analog keeps the
    row with max o_orderdate (ties → max orderkey wouldn't matter for
    the mean; we use max_by on a unique ordering column)."""
    t = load_tables(spark, sf_dir)
    # Deterministic "last": highest o_orderkey per customer.
    return lookup_join(
        base=t["customer"].select("c_custkey", "c_name", "c_mktsegment"),
        lookup=t["orders"].select("o_custkey", "o_orderkey", "o_totalprice"),
        on=[("c_custkey", "o_custkey")],
        select={"o_orderkey": "last_orderkey", "o_totalprice": "last_totalprice"},
        how="inner",
        order_col="o_orderkey",
    )


LOOKUP_INNER_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment,
       arg_max(o_orderkey, o_orderkey)   AS last_orderkey,
       arg_max(o_totalprice, o_orderkey) AS last_totalprice
FROM customer
JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, c_mktsegment
"""


def lookup_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOOKUP ... OUTER JOIN = LEFT outer (lookup.go:232-236):
    unmatched base rows pass through with NULL lookup columns."""
    t = load_tables(spark, sf_dir)
    return lookup_join(
        base=t["customer"].select("c_custkey", "c_name"),
        lookup=t["orders"].select("o_custkey", "o_orderkey", "o_totalprice"),
        on=[("c_custkey", "o_custkey")],
        select={"o_orderkey": "last_orderkey", "o_totalprice": "last_totalprice"},
        how="outer",
        order_col="o_orderkey",
    )


LOOKUP_OUTER_ORACLE = """
SELECT c_custkey, c_name, lk.last_orderkey, lk.last_totalprice
FROM customer
LEFT JOIN (
    SELECT o_custkey,
           arg_max(o_orderkey, o_orderkey)   AS last_orderkey,
           arg_max(o_totalprice, o_orderkey) AS last_totalprice
    FROM orders GROUP BY o_custkey
) lk ON c_custkey = lk.o_custkey
"""


def apply_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY + the CAST matrix (transforms/cast.go): timestamp → epoch
    seconds (int), timestamp → RFC3339 varchar, int → varchar,
    epoch-int round-trip → datetime."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.select(
        F.col("o_orderkey"),
        F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("orderdate_rfc3339"),
        F.col("o_custkey").cast("string").alias("custkey_str"),
        F.to_timestamp(F.from_unixtime(F.unix_timestamp("o_orderdate"))).alias(
            "orderdate_roundtrip"
        ),
    )


APPLY_CAST_ORACLE = """
SELECT o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT)                    AS orderdate_epoch,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ')           AS orderdate_rfc3339,
       CAST(o_custkey AS VARCHAR)                            AS custkey_str,
       o_orderdate                                           AS orderdate_roundtrip
FROM orders
"""


def select_filter_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's filter story is 'push SQL to the source'
    (SURVEY §2.5); in Spark, filter + project + distinct are native.
    Distinct (part brand/type) under a pushed-down filter."""
    part = load_tables(spark, sf_dir)["part"]
    return (
        part.filter(F.col("p_size") >= 25)
        .select("p_brand", "p_type")
        .distinct()
    )


SELECT_FILTER_DISTINCT_ORACLE = """
SELECT DISTINCT p_brand, p_type FROM part WHERE p_size >= 25
"""


def union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source union (the reference's MULTISOURCE/sequencer
    semantics collapse to a deterministic unionByName — SURVEY §1.1)."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(
        F.col("c_custkey").cast("long").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    b = t["supplier"].select(
        F.col("s_suppkey").cast("long").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return a.unionByName(b)


UNION_ALL_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS entity_id, c_name AS name, 'customer' AS kind FROM customer
UNION ALL
SELECT CAST(s_suppkey AS BIGINT) AS entity_id, s_name AS name, 'supplier' AS kind FROM supplier
"""
