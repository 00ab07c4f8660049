from analyst_spark.operators.aggregate import REDUCERS, aggregate, cdf, quantile
from analyst_spark.operators.apply import apply_cast, to_datetime, to_int, to_varchar
from analyst_spark.operators.asof import asof_join
from analyst_spark.operators.bucketed import bucketed_join, write_bucketed
from analyst_spark.operators.lookup import lookup_join
from analyst_spark.operators.range_join import range_count_join
from analyst_spark.operators.salt import salted_agg
from analyst_spark.operators.upsert import merge_upsert
from analyst_spark.operators.zoh import zoh_mean

__all__ = [
    "aggregate",
    "REDUCERS",
    "quantile",
    "cdf",
    "lookup_join",
    "asof_join",
    "bucketed_join",
    "write_bucketed",
    "merge_upsert",
    "range_count_join",
    "salted_agg",
    "zoh_mean",
    "apply_cast",
    "to_int",
    "to_varchar",
    "to_datetime",
]
