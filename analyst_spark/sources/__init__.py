from analyst_spark.sources.literal import literal_source
from analyst_spark.sources.http import http_source, http_source_distributed
from analyst_spark.sources.excel import excel_source
from analyst_spark.sources.jdbc import exec_statement, jdbc_source
from analyst_spark.sources.plugin import (
    python_destination,
    python_source,
    python_transform,
    split_by_destination,
)

__all__ = [
    "literal_source",
    "http_source",
    "http_source_distributed",
    "excel_source",
    "jdbc_source",
    "exec_statement",
    "python_source",
    "python_transform",
    "python_destination",
    "split_by_destination",
]
