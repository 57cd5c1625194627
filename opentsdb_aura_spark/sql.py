"""SQL surface: register the engine's tables as temp views so any
query runs through plain ``spark.sql`` — the Catalyst plans are
identical to the DataFrame API, so users can pick either.

    from opentsdb_aura_spark.sql import register_views
    register_views(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT metric, count(*) FROM metrics GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register metrics / series_dim / rollup_3600 / rollup_hist_3600 /
    presence_hll_3600 / presence_3600 / events (+ the raw documents /
    embeddings tables) as temp views.  Returns the view names."""
    from opentsdb_aura_spark import catalog as C

    from opentsdb_aura_spark.sources.batch import (
        ensure_event_store,
        presence_hll_path,
        presence_path,
        rollup_hist_path,
    )

    ensure_event_store(spark, sf_dir)
    views = {
        "metrics": C.points(spark, sf_dir),
        "series_dim": C.series_dim(spark, sf_dir),
        "events": C.events_seconds(spark, sf_dir),
        "rollup_3600": C._rollup(spark, sf_dir),
        "documents": C.docs(spark, sf_dir),
        "embeddings": C.embs(spark, sf_dir),
    }
    # sidecar rollup tables: optional per store vintage — a missing one
    # must not take down the core views with it
    sidecars = {
        "rollup_hist_3600": rollup_hist_path(sf_dir, 3600),
        # hourly HLL presence sketches: SQL users get range cardinality
        # via hll_sketch_estimate(hll_union_agg(hll)) with no raw scan
        "presence_hll_3600": presence_hll_path(sf_dir, 3600),
        "presence_3600": presence_path(sf_dir, 3600),
    }
    for name, p in sidecars.items():
        try:
            views[name] = spark.read.parquet(p)
        except Exception:  # PATH_NOT_FOUND: older store without this sidecar
            pass
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return sorted(views)
