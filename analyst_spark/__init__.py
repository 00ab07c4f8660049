"""analyst_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
engine (michaelbironneau/analyst) on top of the Spark DataFrame / SQL /
Catalyst stack, extended with the operations a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing).

Design notes
------------
* Everything is declarative DataFrame / Spark SQL — Catalyst handles
  predicate pushdown, column pruning, join strategy, AQE re-planning.
* Python UDFs appear only where built-in functions genuinely cannot
  express the semantics, and then always as Arrow-batched pandas UDFs.
* The reference's goroutine/channel execution machinery (its
  engine/stream.go, engine/coordinator.go) is intentionally NOT
  ported: Spark's lazy DAG + stage pipelining replaces all of it.
"""

from analyst_spark.session import get_spark
from analyst_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]

__version__ = "0.1.0"
