"""The AQL DSL under the correctness gate: complete scripts — parse →
compile → execute — whose RESULT is hash-compared against a DuckDB
oracle. Everything else in the catalog gates individual operators;
these two gate the language layer end to end (parser, topo scheduler,
GLOBAL source, LOOKUP/AGGREGATE transforms, block fan-in), the way
the reference's compiler_test.go gates ExecuteString output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from analyst_spark.aql.engine import execute_script
from analyst_spark.tables import register_views


def aql_global_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY FROM GLOBAL over the session catalog (the reference's
    'SQL on the shared store' path, compiler.go:836-851 — temp views
    instead of shared SQLite)."""
    register_views(spark, sf_dir)
    script = """
    QUERY 'OrdersRollup' FROM GLOBAL (
        SELECT o_orderstatus AS status,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY o_orderstatus
    )
    """
    return execute_script(spark, script).frames["ordersrollup"]


AQL_GLOBAL_ROLLUP_ORACLE = """
SELECT o_orderstatus AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
"""


def aql_lookup_aggregate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-block pipeline: two GLOBAL queries feed a LOOKUP
    (broadcast last-wins join) whose output feeds an AGGREGATE —
    the reference's canonical transform chain (docs transforms.md),
    here compiled to Catalyst end to end."""
    register_views(spark, sf_dir)
    script = """
    QUERY 'Custs' FROM GLOBAL (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
    );

    QUERY 'Nations' FROM GLOBAL (
        SELECT n_nationkey, n_name FROM nation
    );

    TRANSFORM 'Joined' FROM BLOCK Custs, BLOCK Nations (
        LOOKUP Custs.c_custkey, Custs.c_acctbal, Nations.n_name
        FROM Custs
        INNER JOIN Nations ON Custs.c_nationkey = Nations.n_nationkey
    );

    TRANSFORM 'PerNation' FROM BLOCK Joined (
        AGGREGATE n_name, COUNT(1) AS n_custs, SUM(c_acctbal) AS total_bal
        GROUP BY n_name
    )
    """
    res = execute_script(spark, script)
    df = res.frames["pernation"]
    # AGGREGATE reducers return double (transforms/aggregate.go:238) —
    # round for the float-stable hash and surface as typed columns
    from pyspark.sql import functions as F

    return df.select(
        "n_name",
        F.col("n_custs").cast("long").alias("n_custs"),
        F.round("total_bal", 2).alias("total_bal"),
    )


AQL_LOOKUP_AGG_ORACLE = """
SELECT n_name,
       count(*) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def aql_lookup_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOOKUP with duplicate lookup keys resolved by the script-level
    WITH (ORDER_BY = ...) option — the reference's last-wins dedup
    (lookup.go:185-188) made deterministic and reachable from AQL
    alone: each customer matches many orders; the row with the
    greatest o_orderkey wins."""
    register_views(spark, sf_dir)
    script = """
    QUERY 'Custs' FROM GLOBAL (
        SELECT c_custkey, c_name FROM customer
    );

    QUERY 'Ords' FROM GLOBAL (
        SELECT o_custkey, o_orderkey, o_totalprice FROM orders
    );

    TRANSFORM 'LastOrder' FROM BLOCK Custs, BLOCK Ords (
        LOOKUP Custs.c_custkey, Custs.c_name, Ords.o_totalprice
        FROM Custs
        INNER JOIN Ords ON Custs.c_custkey = Ords.o_custkey
    ) WITH (ORDER_BY = 'o_orderkey')
    """
    return execute_script(spark, script).frames["lastorder"]


AQL_LOOKUP_ORDER_BY_ORACLE = """
SELECT c_custkey, c_name,
       arg_max(o_totalprice, o_orderkey) AS o_totalprice
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def aql_apply_cast_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA + GLOBAL multi-source fan-in through APPLY/CAST: a
    literal DATA block unions with a GLOBAL query (the sequencer
    path, MULTISOURCE_ORDER='SEQUENTIAL'), then APPLY projects and
    CASTs (transforms/apply.go + cast.go grammar) — the remaining
    reference transform family under the language-level gate.
    """
    register_views(spark, sf_dir)
    script = """
    DATA 'Extra' (
        [[9000001, "EXTRA_REGION"], [9000002, "EXTRA_REGION_2"]]
    ) WITH (FORMAT='JSON_ARRAY', COLUMNS='r_regionkey,r_name');

    QUERY 'Regions' FROM GLOBAL (
        SELECT r_regionkey, r_name FROM region
    );

    TRANSFORM 'All' FROM BLOCK Extra, BLOCK Regions (
        APPLY CAST(r_regionkey AS varchar) AS key_str, r_name AS region_name
    ) WITH (MULTISOURCE_ORDER='SEQUENTIAL')
    """
    return execute_script(spark, script).frames["all"]


AQL_APPLY_CAST_UNION_ORACLE = """
SELECT CAST(r_regionkey AS VARCHAR) AS key_str, r_name AS region_name
FROM (
    SELECT 9000001 AS r_regionkey, 'EXTRA_REGION' AS r_name
    UNION ALL SELECT 9000002, 'EXTRA_REGION_2'
    UNION ALL SELECT r_regionkey, r_name FROM region
)
"""


def aql_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP transform under the gate: keep each customer's LAST order
    by o_orderdate (ties broken deterministically by the remaining row
    fields) via a full QUERY → TRANSFORM DEDUP → result script."""
    register_views(spark, sf_dir)
    script = """
    QUERY 'Orders' FROM GLOBAL (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM orders
    );

    TRANSFORM 'Latest' FROM BLOCK Orders (
        DEDUP ON o_custkey KEEP LAST BY o_orderdate
    )
    """
    return execute_script(spark, script).frames["latest"].select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )


AQL_DEDUP_ORACLE = """
WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC,
                        o_totalprice DESC
           ) AS rn
    FROM orders
)
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM ranked WHERE rn = 1
"""
