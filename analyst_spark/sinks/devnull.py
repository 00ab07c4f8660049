"""DevNull destination (engine/destination.go:18-30): terminates a
flow, computing it without keeping results — used by EXEC termination
and test mode (compiler.go:368-382, :41-56). The Spark analog is the
``noop`` writer: full distributed computation, zero output."""

from __future__ import annotations

from pyspark.sql import DataFrame


def devnull_sink(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()
