"""Series-bucketed store: round-trip, shuffle-free aggregation, and
cross-session re-registration of the bucket spec."""

import shutil

import pytest
from pyspark.sql import functions as F

from opentsdb_aura_spark.sources.bucketed import (
    bucketed_table_name,
    register_bucketed_metrics,
    write_bucketed_metrics,
)

PATH = "/tmp/opentsdb_aura_test_bucketed"


@pytest.fixture(scope="module")
def bucketed(spark):
    shutil.rmtree(PATH, ignore_errors=True)
    pts = spark.range(2000).select(
        (F.col("id") % 37).alias("series_id"),
        F.col("id").alias("ts"),
        (F.col("id") * 1.5).alias("value"),
    )
    table = write_bucketed_metrics(pts, PATH, n_buckets=4)
    yield table
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(PATH, ignore_errors=True)


def test_roundtrip_values(spark, bucketed):
    df = spark.table(bucketed)
    assert df.count() == 2000
    got = df.agg(F.sum("value")).collect()[0][0]
    assert got == sum(i * 1.5 for i in range(2000))


def test_agg_on_series_has_no_shuffle(spark, bucketed):
    df = spark.table(bucketed)
    agg = df.groupBy("series_id", (F.col("ts") / 100).cast("long").alias("b")).agg(
        F.sum("value").alias("v")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert "Exchange" not in plan


def test_reregistration_after_catalog_loss(spark, bucketed):
    # a fresh session's in-memory catalog has no table: the DDL path
    # must re-declare the bucket spec over the existing files
    spark.sql(f"DROP TABLE IF EXISTS {bucketed}")
    df = register_bucketed_metrics(spark, PATH, n_buckets=4)
    assert df.count() == 2000
    agg = df.groupBy("series_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert "Exchange" not in plan
    assert bucketed_table_name(PATH) == bucketed


def test_bucketed_self_join_has_no_shuffle(spark, bucketed):
    # expression nodes join a series against itself (e.g. a/b ratio):
    # two bucketed sides on the bucket key need neither shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(bucketed)
        j = df.alias("l").join(df.alias("r"), "series_id").groupBy("series_id").agg(F.count("*"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_spec_mismatch_rejected(spark, tmp_path):
    """Re-registering a bucketed table with a different bucket count
    must fail loudly: Spark would otherwise trust the wrong spec and
    plan shuffle-free aggregations over mis-assigned files."""
    import pytest

    from opentsdb_aura_spark.sources.bucketed import (
        register_bucketed_metrics,
        write_bucketed_metrics,
    )

    pts = spark.createDataFrame(
        [(1, 100, 1.0, "m", 0)], "series_id long, ts long, value double, metric string, ingest_seq long"
    )
    path = str(tmp_path / "bkt")
    t = write_bucketed_metrics(pts, path, n_buckets=4)
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    with pytest.raises(ValueError):
        register_bucketed_metrics(spark, path, n_buckets=8)
    assert register_bucketed_metrics(spark, path, n_buckets=4).count() == 1
