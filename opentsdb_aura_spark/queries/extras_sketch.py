"""Sketch-serving extras: HLL cardinality/presence estimates,
DDSketch percentile serving, and Misra-Gries heavy hitters.

Split from queries/extras.py (round 6): registration side-effects
only -- query names, oracles, and behavior unchanged.
"""

from __future__ import annotations

from opentsdb_aura_spark.queries.base import *  # noqa: F401,F403
from opentsdb_aura_spark.queries.base import (  # shared underscore helpers
    _bucket_sql,
    _ds_by_metric,
    _ds_by_metric_sql,
    _mq,
    _r,
    _rollup,
)



@register("meta_cardinality_approx")  # HLL sketch differs per engine: rows-only
def meta_cardinality_approx(spark, sf_dir):
    """M5 scale path — HLL cardinality (exact variant is oracle-checked
    in meta_cardinality)."""
    return cardinality(series_dim(spark, sf_dir), None, approx=True)


@register("rollup_hist_p90_daily")  # sketch-based pre-aggregate: rows-only
def rollup_hist_p90_daily(spark, sf_dir):
    """A6 scale path, pre-aggregate edition: daily p90 per metric
    served ENTIRELY from the hourly histogram rollup table (DDSketch
    bins written at ingest, operators/rollup.py) — the raw points are
    never scanned.  The plain aggregate chain can't serve percentiles
    (not mergeable); log-bucketed histograms are, with ≤1% relative
    error (bound-tested in tests/test_rollup.py)."""
    from opentsdb_aura_spark.operators.rollup import percentile_from_rollup_histogram
    from opentsdb_aura_spark.sources.batch import ensure_event_store, rollup_hist_path

    ensure_event_store(spark, sf_dir)
    hist = spark.read.parquet(rollup_hist_path(sf_dir, 3600))
    res = percentile_from_rollup_histogram(hist, 0.9, START, END, DAY, group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r("value", 4).alias("p90_hist"))


@register(
    "corpus_heavy_tokens_mg",
    """WITH toks AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '')) AS item
                   FROM documents),
cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS est_count FROM toks GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY est_count DESC, item) AS rn FROM cnt)
SELECT item, est_count FROM r WHERE rn <= 15""",
)
def corpus_heavy_tokens_mg(spark, sf_dir):
    """Heavy-hitter tokens via a mergeable Misra–Gries sketch
    (operators/sketch.py): per-partition bounded summaries merge in one
    hash aggregate — O(partitions × capacity) shuffle rows regardless
    of vocabulary size, vs O(distinct tokens) for the exact groupBy
    top-k.  At this corpus's vocabulary the capacity exceeds the
    distinct count, no trim fires, and the counts are provably exact —
    hence the exact-SQL oracle; the undercount guarantee when trims DO
    fire is bound-tested with a planted long-tail corpus in
    tests/test_sketch.py."""
    from opentsdb_aura_spark.operators.dedup_text import tokens
    from opentsdb_aura_spark.operators.sketch import mg_heavy_hitters

    toks = docs(spark, sf_dir).select(F.explode(tokens(F.col("text"))).alias("item"))
    out = mg_heavy_hitters(toks, "item", 15, capacity=4096)
    return out.select("item", "est_count")


@register(
    "corpus_heavy_tokens_by_lang_mg",
    """WITH toks AS (SELECT lang, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '')) AS item
                   FROM documents),
cnt AS (SELECT lang, item, CAST(count(*) AS BIGINT) AS est_count FROM toks GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY est_count DESC, item) AS rn
      FROM cnt)
SELECT lang, item, est_count FROM r WHERE rn <= 5""",
)
def corpus_heavy_tokens_by_lang_mg(spark, sf_dir):
    """Grouped Misra–Gries: independent bounded summaries per language
    (sketch.mg_heavy_hitters group_cols path) — per-group state stays
    O(capacity) so a thousand languages cost the same per-partition
    memory budget as one.  Exact at this vocabulary (capacity ≥
    distinct), hence the SQL oracle."""
    from opentsdb_aura_spark.operators.dedup_text import tokens
    from opentsdb_aura_spark.operators.sketch import mg_heavy_hitters

    toks = docs(spark, sf_dir).select("lang", F.explode(tokens(F.col("text"))).alias("item"))
    out = mg_heavy_hitters(toks, "item", 5, capacity=4096, group_cols=["lang"])
    return out.select("lang", "item", "est_count")


@register("meta_daily_active_hll")  # HLL sketch estimates: rows-only
def meta_daily_active_hll(spark, sf_dir):
    """T6/M5 scale path — daily active-series counts per metric served
    ENTIRELY from the hourly HLL presence rollup (DataSketches HLL
    written at ingest, operators/meta.build_presence_hll): sketches
    merge with hll_union_agg, so any range/bucket re-aggregates the
    rollup table without touching raw points — plain distinct counts
    cannot do this (COUNT DISTINCT is not mergeable across windows).
    ~1.6% relative error at lg_k=12; bound-tested against the exact
    count in tests/test_rows_only_bounds.py."""
    from opentsdb_aura_spark.operators.meta import cardinality_from_presence_hll
    from opentsdb_aura_spark.sources.batch import ensure_event_store, presence_hll_path

    ensure_event_store(spark, sf_dir)
    hll = spark.read.parquet(presence_hll_path(sf_dir, 3600))
    res = cardinality_from_presence_hll(hll, START, START + 7 * DAY, bucket_width=DAY, group_cols=("metric",))
    return res.select("metric", "bucket_ts", "active_series")


@register("ds_p90_approx_daily")  # sketch-based: rows-only
def ds_p90_approx_daily(spark, sf_dir):
    """A6 scale path — approx_percentile; at 100 TB the exact
    percentile's per-group value buffer is the bottleneck, the sketch
    is mergeable map-side."""
    pts = points(spark, sf_dir).where((F.col("ts") >= START) & (F.col("ts") < END))
    bucket = (F.lit(START) + F.floor((F.col("ts") - F.lit(START)) / F.lit(DAY)) * F.lit(DAY)).cast("long")
    return (
        pts.withColumn("bucket_ts", bucket)
        .groupBy("metric", "bucket_ts")
        .agg(F.expr("approx_percentile(value, 0.9, 1000)").alias("p90_approx"))
    )


@register("ev_wau_hll")  # HLL sketch estimates: rows-only
def ev_wau_hll(spark, sf_dir):
    """WAU from mergeable sketches: one HLL per day, each output day
    unions its trailing 7 — per-day work is 7 sketch rows instead of 7
    days of user-days, and the daily sketches are exactly what
    streaming ingest emits at window close (streaming_presence_hll),
    so the dashboard never recomputes distincts.  ±5% bound-tested
    against ev_wau_rolling in tests/test_rows_only_bounds.py."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    ev = events_seconds(spark, sf_dir)
    res = rolling_active_users(ev, START, START + 14 * DAY, 7, hll=True)
    return res.select("day_ts", F.col("active_users").cast("bigint").alias("active_users"))


@register("rollup_hist_p90_planner")  # sketch percentile via planner: rows-only
def rollup_hist_p90_planner(spark, sf_dir):
    """A6 scale path, planner edition: the MetricQuery asks for a plain
    per-series p90 + group max; ``run_metric_query(...,
    hist_rollups=...)`` routes it to the DDSketch histogram rollup
    automatically (plans/query._hist_substitution) — per-series
    percentile from pre-aggregated bins (exact series distribution,
    eps-coarse values), then the ordinary two-stage group merge.  No
    raw point is scanned.  Approximate by design (±1%), bound-tested
    in tests/test_rollup.py::test_hist_substitution_per_series_percentile."""
    from opentsdb_aura_spark.sources.batch import ensure_event_store, rollup_hist_path

    ensure_event_store(spark, sf_dir)
    hist = spark.read.parquet(rollup_hist_path(sf_dir, 3600))
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="p90",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="max",
        fill="none",
    )
    res = run_metric_query(
        points(spark, sf_dir),
        q,
        hist_rollups={3600: hist},
        series_dim=series_dim(spark, sf_dir),
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("p90_max"))


