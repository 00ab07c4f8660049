from analyst_spark.operators.aggregate import REDUCERS, aggregate, cdf, quantile
from analyst_spark.operators.apply import apply_cast, to_datetime, to_int, to_varchar
from analyst_spark.operators.lookup import lookup_join
from analyst_spark.operators.zoh import zoh_mean

__all__ = [
    "aggregate",
    "REDUCERS",
    "quantile",
    "cdf",
    "lookup_join",
    "zoh_mean",
    "apply_cast",
    "to_int",
    "to_varchar",
    "to_datetime",
]
