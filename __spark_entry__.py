"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registered query
surface (sentiment_analysis_data_engineering_spark.plans) for the sf0.01
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing these modules populates the registry.
from sentiment_analysis_data_engineering_spark.plans import registry
from sentiment_analysis_data_engineering_spark.plans import parity_queries  # noqa: F401

try:  # extension queries land incrementally; never break the contract
    from sentiment_analysis_data_engineering_spark.plans import extension_queries  # noqa: F401
except ImportError:
    pass

try:
    from sentiment_analysis_data_engineering_spark.plans import analytics_queries  # noqa: F401
except ImportError:
    pass

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-schema analytical join + group-by (SURVEY.md §2.3 J3): revenue
    per nation per year over lineitem ⋈ orders ⋈ customer ⋈ nation.
    """
    return registry.QUERIES["star_join_revenue"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return dict(registry.ORACLES)
