from analyst_spark.sinks.console import console_sink
from analyst_spark.sinks.jdbc import jdbc_sink
from analyst_spark.sinks.parameter import parameter_sink
from analyst_spark.sinks.devnull import devnull_sink
from analyst_spark.sinks.excel import excel_sink
from analyst_spark.sinks.files import compact, read_partitioned, write_partitioned

__all__ = [
    "console_sink",
    "jdbc_sink",
    "parameter_sink",
    "devnull_sink",
    "excel_sink",
    "write_partitioned",
    "read_partitioned",
    "compact",
]
