from analyst_spark.sources.literal import literal_source
from analyst_spark.sources.http import http_source
from analyst_spark.sources.excel import excel_source
from analyst_spark.sources.jdbc import jdbc_source
from analyst_spark.sources.plugin import python_source

__all__ = [
    "literal_source",
    "http_source",
    "excel_source",
    "jdbc_source",
    "python_source",
]
