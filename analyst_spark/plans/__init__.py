from analyst_spark.plans.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
