from analyst_spark.aql.engine import execute_script, test_script
from analyst_spark.aql.parser import parse_script

__all__ = ["parse_script", "execute_script", "test_script"]
