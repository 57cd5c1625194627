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
    from pyspark.sql import functions as F

    from opentsdb_aura_spark import catalog
    from opentsdb_aura_spark.filters import MetricLiteral
    from opentsdb_aura_spark.operators.rate import RateOptions
    from opentsdb_aura_spark.plans.query import MetricQuery, run_metric_query

    pts = catalog.points(spark, "/root/testdata/sf0.001")
    q = MetricQuery(
        start=catalog.START,
        end=catalog.END,
        interval=catalog.DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        rate_options=RateOptions(interval_seconds=3600),
        group_tag_keys=["user"],
        gb_agg="avg",
        fill="none",
        segment_width=86400,
    )
    res = run_metric_query(pts, q, dedupe=False)
    return res.select("tag_user", "bucket_ts", F.round(catalog.denan(F.col("value")), 6).alias("avg_rate"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opentsdb_aura_spark.catalog import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from opentsdb_aura_spark.catalog import ORACLES

    return dict(ORACLES)
