"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ycrawl_spark/ (queries.py registry); this
module stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: weekly best value per
    group (SURVEY.md §7.2; reference reporting.py:95-118)."""
    from ycrawl_spark.queries import QUERIES

    return QUERIES["weekly_best_order"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ycrawl_spark.queries import ordered_queries

    # The driver gates only the first 50 entries; ordered_queries() pins
    # those slots to DRIVER_WINDOW (50 oracle-backed queries, rotated per
    # round for cumulative driver coverage — see queries.py).
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from ycrawl_spark.queries import ORACLES

    return dict(ORACLES)
