"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2
plus the training-data-pipeline extensions).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
query (same column names; rounded floats; NaN→NULL on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: filter → dedupe →
    rate → daily downsample → group-by-tag merge over the metric-point
    view of the events table."""
    from opentsdb_aura_spark.catalog import SPARK_QUERIES

    return SPARK_QUERIES["fused_rate_ds_gb"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opentsdb_aura_spark.catalog import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from opentsdb_aura_spark.catalog import ORACLES

    return dict(ORACLES)
