"""Query catalog: every driver-visible query, paired with a DuckDB
oracle SQL string (the t2 correctness gate).

Each entry exercises one operator family from SURVEY.md §2 on the
driver's parquet tables.  The events table is adapted to the metric
point model (event_type → metric, user_id / props.k → tags) so the
whole metric path — filters, dedupe, rate, downsample, group-by,
meta — runs on real multi-series data; documents/embeddings feed the
training-data-pipeline operators.

Column-name discipline: the driver hash-compares values after sorting
columns by name, so every computed column is aliased identically in
the Spark plan and the oracle SQL.  Floats are rounded (4-6 dp) on
both sides to absorb summation-order differences; NaN outputs are
mapped to NULL on both sides.

Oracle typing rule: NEVER project an integer aggregate or window sum
raw.  DuckDB types ``sum(BIGINT)`` (plain and windowed) as HUGEINT,
which arrives via Arrow as decimal128(38,0) and hash-mismatches
Spark's int64 even when the values are identical.  Always wrap in
``CAST(... AS BIGINT)`` in the oracle SQL (and ``.cast("long")`` on
the Spark side if needed).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from opentsdb_aura_spark.filters import Chain, MetricLiteral, Not, TagLiteralOr
from opentsdb_aura_spark.operators.dedup_text import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from opentsdb_aura_spark.operators.downsample import bucket_expr, downsample
from opentsdb_aura_spark.operators.events import group_count_last, minute_histogram, text_match, top_n
from opentsdb_aura_spark.operators.meta import (
    cardinality,
    distinct_metrics,
    distinct_tag_keys,
    distinct_tag_values,
)
from opentsdb_aura_spark.operators.multimodal import attach_fake_media, extract_features, media_stats
from opentsdb_aura_spark.operators.rate import RateOptions, rate
from opentsdb_aura_spark.operators.similarity import brute_force_topk, lsh_topk
from opentsdb_aura_spark.operators.text import lang_id, quality_scores, token_stats
from opentsdb_aura_spark.plans.query import MetricQuery, run_metric_query, splice_hot_cold
from opentsdb_aura_spark.sources.batch import EVENT_STORE_SEGMENT_WIDTH


def _mq(**kw) -> MetricQuery:
    """MetricQuery against the events-derived store (daily partitions)."""
    kw.setdefault("segment_width", EVENT_STORE_SEGMENT_WIDTH)
    return MetricQuery(**kw)

# ---------------------------------------------------------------- time anchors
START = 1704067200  # 2024-01-01 00:00:00 UTC — events data begins here
END = START + 30 * 86400
SPINE_START = START + 86400
SPINE_END = SPINE_START + 2 * 86400
SHIFT = 86400
DAY = 86400
HOUR = 3600

# ---------------------------------------------------------------- spark loaders


def ensure_session_confs(spark: SparkSession) -> None:
    """The driver hands us ITS SparkSession — pin the runtime-settable
    confs our semantics depend on: nanos timestamps read as long, and
    UTC so any timestamp↔epoch conversion matches the DuckDB oracle
    regardless of the host timezone."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as epoch seconds, served from the daily-
    partitioned store (E3 — the yyyy-MM-dd index layout)."""
    from opentsdb_aura_spark.sources.batch import ensure_event_store, events_store_path

    ensure_session_confs(spark)
    ensure_event_store(spark, sf_dir)
    return spark.read.parquet(events_store_path(sf_dir))


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical deduped points + materialized tag columns, served
    from the time-partitioned Parquet store (built once per sf_dir —
    the batch-ingest path, S2)."""
    from opentsdb_aura_spark.sources.batch import ensure_event_store

    ensure_session_confs(spark)
    metrics_path, _ = ensure_event_store(spark, sf_dir)
    return spark.read.parquet(metrics_path)


def series_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opentsdb_aura_spark.sources.batch import ensure_event_store

    ensure_session_confs(spark)
    _, dim_path = ensure_event_store(spark, sf_dir)
    return spark.read.parquet(dim_path)


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the test table is a single parquet file → 1 input partition;
    # spread it so doc operators use every core (a production corpus
    # arrives as many files and skips this)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def docs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` without the defaultParallelism spread — for small
    filtered slices (e.g. the 100-row multimodal probes) where 32-way
    round-robin fan-out just multiplies Python-worker launches; a
    production corpus gets its parallelism from file splits."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


# ---------------------------------------------------------------- helpers


def denan(c: Column) -> Column:
    """NaN → NULL (both engines hash NULL identically; NaN is risky)."""
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)


def _bucket_sql(iv: int, start: int = START, ts: str = "ts") -> str:
    return f"({start} + (({ts} - {start}) // {iv}) * {iv})"


# Shared oracle prelude: the same point normalization + last-write-wins
# dedupe the Spark side applies.
ORACLE_PTS = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(user_id AS VARCHAR) AS tag_user,
         json_extract_string(props, '$.k') AS tag_k,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         value,
         event_id AS ingest_seq
  FROM events
),
dpts AS (
  SELECT metric, tag_user, tag_k, ts, value, ingest_seq
  FROM (SELECT *, row_number() OVER (PARTITION BY metric, tag_user, tag_k, ts
                                     ORDER BY ingest_seq DESC) AS rn
        FROM pts)
  WHERE rn = 1
),
series AS (SELECT DISTINCT metric, tag_user, tag_k FROM pts)
"""

ORACLE_SHINGLES = """
WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '') AS toks
           FROM documents),
shing AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(toks)-1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s FROM d),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shing GROUP BY 1)
"""


# ---------------------------------------------------------------- registry

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}



def _r(c, n: int) -> Column:
    """Round with a +1e-9 nudge: aggregate ratios of 2-decimal inputs
    are exact rationals that can land precisely ON a rounding boundary
    (e.g. 49.49475), where Spark and DuckDB fall on opposite sides due
    to double association order.  The nudge (≫ double noise ~1e-12,
    ≪ the rounding resolution) moves every boundary case to the same
    side in both engines.  The oracle SQL applies the same nudge via
    register()."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col + F.lit(1e-9), n)

def register(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            # same boundary nudge as _r() on the Spark side
            ORACLES[name] = sql.replace("round(", "round(1e-9 + ")
        return fn

    return deco


# ============================================================ downsample (A1-A11)


def _ds_by_metric(spark, sf_dir, interval, agg, value_alias, ndigits, run_all=False):
    res = downsample(
        points(spark, sf_dir), START, END, interval, agg, group_cols=["metric"], fill="none", run_all=run_all
    )
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), ndigits).alias(value_alias))


def _ds_by_metric_sql(iv, agg_sql, value_alias, ndigits):
    return f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(iv)} AS bucket_ts,
       round({agg_sql}, {ndigits}) AS {value_alias}
FROM dpts WHERE ts >= {START} AND ts < {END}
GROUP BY 1, 2"""


@register("ds_sum_daily", _ds_by_metric_sql(DAY, "sum(value)", "sum_value", 4))
def ds_sum_daily(spark, sf_dir):
    """A1 — downsample SUM, daily buckets per metric."""
    return _ds_by_metric(spark, sf_dir, DAY, "sum", "sum_value", 4)


@register("ds_avg_hourly", _ds_by_metric_sql(HOUR, "avg(value)", "avg_value", 6))
def ds_avg_hourly(spark, sf_dir):
    """A2 — downsample AVG (sum/count), hourly buckets per metric."""
    return _ds_by_metric(spark, sf_dir, HOUR, "avg", "avg_value", 6)


@register("ds_count_daily", _ds_by_metric_sql(DAY, "CAST(count(value) AS DOUBLE)", "count_value", 4))
def ds_count_daily(spark, sf_dir):
    """A3 — downsample COUNT of non-NaN values."""
    return _ds_by_metric(spark, sf_dir, DAY, "count", "count_value", 4)


@register("ds_min_daily", _ds_by_metric_sql(DAY, "min(value)", "min_value", 4))
def ds_min_daily(spark, sf_dir):
    """A4 — downsample MIN (alias mimmin)."""
    return _ds_by_metric(spark, sf_dir, DAY, "mimmin", "min_value", 4)


@register("ds_max_daily", _ds_by_metric_sql(DAY, "max(value)", "max_value", 4))
def ds_max_daily(spark, sf_dir):
    """A4 — downsample MAX (alias mimmax)."""
    return _ds_by_metric(spark, sf_dir, DAY, "mimmax", "max_value", 4)


@register("ds_p90_daily", _ds_by_metric_sql(DAY, "quantile_cont(value, 0.90)", "p90_value", 6))
def ds_p90_daily(spark, sf_dir):
    """A6 — NON_OPTIMIZED aggregator (exact interpolated percentile)."""
    return _ds_by_metric(spark, sf_dir, DAY, "p90", "p90_value", 6)


@register("ds_median_daily", _ds_by_metric_sql(DAY, "quantile_cont(value, 0.5)", "median_value", 6))
def ds_median_daily(spark, sf_dir):
    """A6 — NON_OPTIMIZED aggregator (median)."""
    return _ds_by_metric(spark, sf_dir, DAY, "median", "median_value", 6)


@register("ds_stddev_daily", _ds_by_metric_sql(DAY, "stddev_samp(value)", "stddev_value", 6))
def ds_stddev_daily(spark, sf_dir):
    """A6 — NON_OPTIMIZED aggregator (sample stddev)."""
    return _ds_by_metric(spark, sf_dir, DAY, "stddev", "stddev_value", 6)


def _lossy_oracle():
    from opentsdb_aura_spark.operators.compression import lossy_sql_expr

    return f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts,
       round(sum({lossy_sql_expr("value", 8)}), 4) AS lossy_sum
FROM dpts WHERE ts >= {START} AND ts < {END}
GROUP BY 1, 2"""


@register("lossy_gorilla_sum_daily", _lossy_oracle())
def lossy_gorilla_sum_daily(spark, sf_dir):
    """X4 — lossy value storage: mantissa truncation applied on the
    write path (the reference's Gorilla LOSS_MASK,
    GorillaSegmentEncoder.java:29,103 — arithmetically exact
    re-expression, see operators/compression.py), then a daily SUM
    over the truncated doubles.  keep_bits=8 here so the loss is
    visible at round(4) — the reference's mask keeps 28 bits
    (GORILLA_KEEP_BITS), invisible after rounding by design."""
    from opentsdb_aura_spark.operators.compression import lossy_encode_values

    pts = lossy_encode_values(points(spark, sf_dir), keep_bits=8)
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("lossy_sum"))


@register("ds_sumsq_daily", _ds_by_metric_sql(DAY, "sum(value*value)", "sumsq_value", 4))
def ds_sumsq_daily(spark, sf_dir):
    """A11 — SUM-OF-SQUARES aggregator."""
    return _ds_by_metric(spark, sf_dir, DAY, "sumsq", "sumsq_value", 4)


@register(
    "metric_value_histogram",
    f"""{ORACLE_PTS}
SELECT metric,
       CAST(least(greatest(floor(value / 25.0), 0), 19) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM dpts WHERE ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def metric_value_histogram(spark, sf_dir):
    """Value-distribution histogram (the heatmap panel behind every
    TSDB UI): fixed-width bins with clamped edges, one hash aggregate —
    the exact-count complement of the DDSketch log-bin rollup (which
    serves percentiles; this serves the shape)."""
    pts = points(spark, sf_dir).where((F.col("ts") >= START) & (F.col("ts") < END))
    bin_ = F.least(F.greatest(F.floor(F.col("value") / 25.0), F.lit(0)), F.lit(19)).cast("bigint")
    return (
        pts.groupBy("metric", bin_.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "ds_runall_sum",
    f"""{ORACLE_PTS}
SELECT metric, {START} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1""",
)
def ds_runall_sum(spark, sf_dir):
    """A7 — run-all: single bucket spanning the whole query range."""
    return _ds_by_metric(spark, sf_dir, None, "zimsum", "sum_value", 4, run_all=True)


@register(
    "ds_last_daily_purchase",
    f"""{ORACLE_PTS}
SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts,
       round(arg_max(value, ts), 4) AS last_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2, 3""",
)
def ds_last_daily_purchase(spark, sf_dir):
    """A5 — downsample LAST per series (ts order, post-dedupe)."""
    pts = points(spark, sf_dir).where(F.col("metric") == "purchase")
    res = downsample(pts, START, END, DAY, "last", group_cols=["tag_user", "tag_k"], fill="none")
    return res.select("tag_user", "tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("last_value"))


@register(
    "bucketed_series_sum_daily",
    f"""{ORACLE_PTS}
SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts,
       round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2, 3""",
)
def bucketed_series_sum_daily(spark, sf_dir):
    """Per-series daily SUM from the series-bucketed cold layout
    (sources/bucketed.py): the aggregation keys include series_id,
    which the bucket spec already hash-partitions, so the plan carries
    NO shuffle Exchange (asserted in tests/test_plans.py) — series
    tags come from a dim join AQE resolves to broadcast at this size
    (no forced hint: the dim is O(series) under match-all filters)."""
    from opentsdb_aura_spark.sources.batch import bucketed_metrics

    pts = bucketed_metrics(spark, sf_dir).where(F.col("metric") == "purchase")
    res = downsample(pts, START, END, DAY, "sum", group_cols=["series_id"], fill="none")
    dim = series_dim(spark, sf_dir).select(
        "series_id",
        F.col("tags")["user"].alias("tag_user"),
        F.col("tags")["k"].alias("tag_k"),
    )
    return res.join(dim, "series_id").select(
        "tag_user", "tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value")
    )


@register(
    "ds_spine_hourly_purchase",
    f"""{ORACLE_PTS},
agg AS (
  SELECT {_bucket_sql(HOUR, SPINE_START)} AS bucket_ts, round(sum(value), 4) AS sum_value
  FROM dpts WHERE metric = 'purchase' AND ts >= {SPINE_START} AND ts < {SPINE_END}
  GROUP BY 1)
SELECT r.range AS bucket_ts, a.sum_value
FROM range({SPINE_START}, {SPINE_END}, {HOUR}) r
LEFT JOIN agg a ON r.range = a.bucket_ts""",
)
def ds_spine_hourly_purchase(spark, sf_dir):
    """A8 — dense interval spine: empty hourly buckets surface (as
    NULL here; NaN in the engine contract) rather than vanishing."""
    q = _mq(
        start=SPINE_START,
        end=SPINE_END,
        interval=HOUR,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=[],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "ds_spine_from_dim_daily",
    f"""{ORACLE_PTS},
u AS (SELECT DISTINCT tag_user FROM dpts WHERE metric = 'purchase'),
agg AS (
  SELECT tag_user, {_bucket_sql(DAY, SPINE_START)} AS bucket_ts,
         round(sum(value), 4) AS sum_value
  FROM dpts WHERE metric = 'purchase' AND ts >= {SPINE_START} AND ts < {SPINE_END}
  GROUP BY 1, 2)
SELECT u.tag_user, r.range AS bucket_ts, a.sum_value
FROM u CROSS JOIN range({SPINE_START}, {SPINE_END}, {DAY}) r
LEFT JOIN agg a ON a.tag_user = u.tag_user AND a.bucket_ts = r.range""",
)
def ds_spine_from_dim_daily(spark, sf_dir):
    """A8 meta-driven spine: the group universe comes from the filtered
    series_dim (the reference's meta-index selection,
    TimeSeriesShard.java:677-758), so a user whose purchase series has
    zero points inside the 2-day window still emits its all-NaN daily
    rows — the result-derived spine would drop that group entirely."""
    q = _mq(
        start=SPINE_START,
        end=SPINE_END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(
        points(spark, sf_dir), q, dedupe=False,
        series_dim=series_dim(spark, sf_dir), spine_from_dim=True,
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "asof_last_error_event",
    f"""{ORACLE_PTS},
l AS (SELECT tag_user, tag_k, ts, value FROM dpts
      WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}),
re AS (SELECT CAST(user_id AS VARCHAR) AS tag_user,
              CAST(floor(epoch(ts)) AS BIGINT) AS ets,
              CAST(max(event_id) AS BIGINT) AS last_error_id
       FROM events WHERE event_type = 'error' GROUP BY 1, 2)
SELECT l.tag_user, l.tag_k, l.ts, round(l.value, 6) AS value,
       re.last_error_id, re.ets AS error_ts
FROM l ASOF LEFT JOIN re ON l.tag_user = re.tag_user AND l.ts >= re.ets""",
)
def asof_last_error_event(spark, sf_dir):
    """Backward as-of join (operators/asof.py): every purchase point
    picks up the most recent error event at-or-before it for the same
    user — the "state at measurement time" enrichment.  Union +
    running-last: ONE shuffle on the user key, no range probe; the
    oracle is DuckDB's native ASOF LEFT JOIN."""
    from opentsdb_aura_spark.operators.asof import asof_join

    pts = points(spark, sf_dir)
    left = pts.where(
        (F.col("metric") == "purchase") & (F.col("ts") >= START) & (F.col("ts") < END)
    ).select("tag_user", "tag_k", "ts", "value")
    right = (
        pts.where(F.col("metric") == "error")
        .groupBy("tag_user", "ts")
        .agg(F.max("ingest_seq").cast("bigint").alias("last_error_id"))
    )
    res = asof_join(left, right, on=["tag_user"], right_cols=["last_error_id"])
    return res.select(
        "tag_user", "tag_k", "ts", _r(F.col("value"), 6).alias("value"),
        F.col("last_error_id_asof").alias("last_error_id"),
        F.col("ts_asof").alias("error_ts"),
    )


# ============================================================ rate family (R1-R5)

_RATE_PRELUDE = f"""{ORACLE_PTS},
r AS (
  SELECT tag_user, tag_k, ts, value,
         lag(value) OVER w AS pv, lag(ts) OVER w AS pt
  FROM dpts
  WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY ts)
)"""


@register(
    "rate_purchase",
    f"""{_RATE_PRELUDE}
SELECT tag_user, tag_k, ts,
       round((value - pv) / ((ts - pt) / 3600.0), 6) AS rate_value
FROM r WHERE pv IS NOT NULL""",
)
def rate_purchase(spark, sf_dir):
    """R1 — rate of change per series (per-hour normalization)."""
    pts = points(spark, sf_dir).where((F.col("metric") == "purchase") & (F.col("ts") >= START) & (F.col("ts") < END))
    res = rate(pts, RateOptions(interval_seconds=3600))
    return res.where(~F.isnan("value")).select(
        "tag_user", "tag_k", "ts", _r(F.col("value"), 6).alias("rate_value")
    )


@register(
    "delta_purchase",
    f"""{_RATE_PRELUDE}
SELECT tag_user, tag_k, ts, round(value - pv, 6) AS delta_value
FROM r WHERE pv IS NOT NULL""",
)
def delta_purchase(spark, sf_dir):
    """R3 — delta-only (no time normalization)."""
    pts = points(spark, sf_dir).where((F.col("metric") == "purchase") & (F.col("ts") >= START) & (F.col("ts") < END))
    res = rate(pts, RateOptions(delta_only=True))
    return res.where(~F.isnan("value")).select(
        "tag_user", "tag_k", "ts", _r(F.col("value"), 6).alias("delta_value")
    )


@register(
    "rate_counter_drop_purchase",
    f"""{_RATE_PRELUDE}
SELECT tag_user, tag_k, ts,
       round((value - pv) / ((ts - pt) / 3600.0), 6) AS rate_value
FROM r WHERE pv IS NOT NULL AND value >= pv""",
)
def rate_counter_drop_purchase(spark, sf_dir):
    """R2 — counter semantics with dropResets: negative deltas → NaN
    (dropped from output)."""
    pts = points(spark, sf_dir).where((F.col("metric") == "purchase") & (F.col("ts") >= START) & (F.col("ts") < END))
    res = rate(pts, RateOptions(interval_seconds=3600, counter=True, drop_resets=True))
    return res.where(~F.isnan("value")).select(
        "tag_user", "tag_k", "ts", _r(F.col("value"), 6).alias("rate_value")
    )


@register(
    "rate_to_count_purchase",
    f"""{_RATE_PRELUDE},
est AS (
  SELECT tag_user, tag_k,
         greatest(first(ts - pt ORDER BY cnt DESC, ts - pt ASC) // 3600, 1)
           AS di_units
  FROM (SELECT tag_user, tag_k, ts, pt,
               count(*) OVER (PARTITION BY tag_user, tag_k, ts - pt) AS cnt
        FROM r WHERE pt IS NOT NULL)
  GROUP BY 1, 2
)
SELECT r.tag_user, r.tag_k, ts,
       round(value * least((ts - pt) / 3600.0, di_units), 6) AS count_value
FROM r JOIN est ON r.tag_user = est.tag_user AND r.tag_k = est.tag_k
WHERE pv IS NOT NULL""",
)
def rate_to_count_purchase(spark, sf_dir):
    """R4 — rate-to-count.  The configured 300 s interval floor-divides
    by the 3600 s rate interval to 0 (< 1), so — exactly as the
    reference does (AuraMetricsNumericArrayIterator.java:226-229, 294)
    — the data interval is re-estimated per series as the mode of point
    spacing in rate-interval units, clamped to >= 1."""
    pts = points(spark, sf_dir).where((F.col("metric") == "purchase") & (F.col("ts") >= START) & (F.col("ts") < END))
    res = rate(pts, RateOptions(interval_seconds=3600, rate_to_count=True, data_interval=300))
    return res.where(~F.isnan("value")).select(
        "tag_user", "tag_k", "ts", _r(F.col("value"), 6).alias("count_value")
    )


@register(
    "timeshift_sum_daily_purchase",
    f"""{ORACLE_PTS}
SELECT {_bucket_sql(DAY, START, f"(ts + {SHIFT})")} AS bucket_ts,
       round(sum(value), 4) AS sum_value
FROM dpts
WHERE metric = 'purchase' AND ts >= {START - SHIFT} AND ts < {END - SHIFT}
GROUP BY 1""",
)
def timeshift_sum_daily_purchase(spark, sf_dir):
    """R5 — time shift: evaluate over [start-Δ, end-Δ), relabel +Δ."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=[],
        gb_agg="sum",
        shift_seconds=SHIFT,
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


# ============================================================ group-by (G1-G4)


@register(
    "gb_sum_by_user_daily",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def gb_sum_by_user_daily(spark, sf_dir):
    """G1 — group-by tag key (sum○sum decomposes to a flat sum)."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "gb_avg_by_user_daily",
    f"""{ORACLE_PTS},
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, avg(value) AS v
  FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3)
SELECT tag_user, bucket_ts, round(avg(v), 6) AS avg_value
FROM per_series GROUP BY 1, 2""",
)
def gb_avg_by_user_daily(spark, sf_dir):
    """G1 — two-stage semantics: per-series downsample AVG, then AVG
    across the series of each group (≠ flat avg — load-bearing)."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="avg",
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 6).alias("avg_value"))


@register(
    "gb_series_count_daily",
    f"""{ORACLE_PTS},
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts
  FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3)
SELECT tag_user, bucket_ts, CAST(count(*) AS DOUBLE) AS series_count
FROM per_series GROUP BY 1, 2""",
)
def gb_series_count_daily(spark, sf_dir):
    """G1 — group COUNT: number of series contributing per interval."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="count",
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "bucket_ts", denan(F.col("value")).alias("series_count"))


@register(
    "gb_all_min_daily",
    f"""{ORACLE_PTS},
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, min(value) AS v
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2, 3)
SELECT bucket_ts, round(min(v), 4) AS min_value
FROM per_series GROUP BY 1""",
)
def gb_all_min_daily(spark, sf_dir):
    """G2 — group-all: every series merged into a single group."""
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="min", group_tag_keys=[], gb_agg="min", fill="none"
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("bucket_ts", _r(denan(F.col("value")), 4).alias("min_value"))


# ==================================================== analytic processors (3.x graph)


@register(
    "movavg3_by_user_daily",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
        GROUP BY 1, 2),
users AS (SELECT DISTINCT tag_user FROM agg),
days AS (SELECT unnest(generate_series({START}, {END - 1}, {DAY})) AS bucket_ts),
dense AS (SELECT u.tag_user, d.bucket_ts, a.v
          FROM users u CROSS JOIN days d
          LEFT JOIN agg a ON a.tag_user = u.tag_user AND a.bucket_ts = d.bucket_ts)
SELECT tag_user, bucket_ts,
       round(avg(v) OVER (PARTITION BY tag_user ORDER BY bucket_ts
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma_value
FROM dense""",
)
def movavg3_by_user_daily(spark, sf_dir):
    """Upstream ``movingaverage`` node: trailing 3-bucket simple
    moving average over the dense daily spine per user (NaN buckets
    contribute nothing; NULL-ignoring AVG on the oracle side matches
    exactly)."""
    from opentsdb_aura_spark.operators.analytic import moving_average

    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    res = moving_average(res, 3)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("ma_value"))


@register(
    "ewma3_by_user_daily",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
        GROUP BY 1, 2),
users AS (SELECT DISTINCT tag_user FROM agg),
days AS (SELECT unnest(generate_series({START}, {END - 1}, {DAY})) AS bucket_ts),
dense AS (SELECT u.tag_user, d.bucket_ts, a.v
          FROM users u CROSS JOIN days d
          LEFT JOIN agg a ON a.tag_user = u.tag_user AND a.bucket_ts = d.bucket_ts),
win AS (SELECT tag_user, bucket_ts,
               list(v) OVER (PARTITION BY tag_user ORDER BY bucket_ts
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS arr
        FROM dense)
SELECT tag_user, bucket_ts,
       round(list_sum(list_transform(arr, (x, i) -> CASE WHEN x IS NOT NULL
                 THEN pow(0.5, len(arr) - i) * x END))
             / list_sum(list_transform(arr, (x, i) -> CASE WHEN x IS NOT NULL
                 THEN pow(0.5, len(arr) - i) END)), 6) AS ewma_value
FROM win""",
)
def ewma3_by_user_daily(spark, sf_dir):
    """Upstream ``movingaverage`` node, exponential mode: trailing
    3-bucket EWMA per user (alpha = 2/(3+1) = 0.5, weights normalized
    over the reported buckets in the window; NaN buckets drop out of
    both numerator and denominator)."""
    from opentsdb_aura_spark.operators.analytic import moving_average

    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    res = moving_average(res, 3, exponential=True)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 6).alias("ewma_value"))


@register(
    "ratio_pct_by_user_daily",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
        GROUP BY 1, 2)
SELECT tag_user, bucket_ts,
       round(100.0 * v / sum(v) OVER (PARTITION BY bucket_ts), 6) AS pct_value
FROM agg""",
)
def ratio_pct_by_user_daily(spark, sf_dir):
    """Upstream ``ratio`` node: each user's percent share of the
    all-user total per day."""
    from opentsdb_aura_spark.operators.analytic import ratio

    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    res = ratio(res, as_percent=True)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 6).alias("pct_value"))


@register(
    "slide3d_sum_by_user_daily",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
        GROUP BY 1, 2),
users AS (SELECT DISTINCT tag_user FROM agg),
days AS (SELECT unnest(generate_series({START}, {END - 1}, {DAY})) AS bucket_ts),
dense AS (SELECT u.tag_user, d.bucket_ts, a.v
          FROM users u CROSS JOIN days d
          LEFT JOIN agg a ON a.tag_user = u.tag_user AND a.bucket_ts = d.bucket_ts)
SELECT tag_user, bucket_ts,
       round(sum(v) OVER (PARTITION BY tag_user ORDER BY bucket_ts
                          RANGE BETWEEN {3 * DAY - 1} PRECEDING AND CURRENT ROW), 4) AS sw_value
FROM dense""",
)
def slide3d_sum_by_user_daily(spark, sf_dir):
    """Upstream ``slidingwindow`` node: trailing 3-day sum per user
    over the dense daily spine — a time-RANGE frame, not a row count,
    so the window is stride-independent (NULL-skipping SUM on the
    oracle side matches the NaN-skipping window exactly)."""
    from opentsdb_aura_spark.operators.analytic import sliding_window

    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    res = sliding_window(res, 3 * DAY, "sum")
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sw_value"))


#: histogram bounds for the bucket-quantile query (all purchase values
#: land in [0, 500); the top bound stays finite so the midpoint is too)
_BQ_BOUNDS = (0, 10, 50, 100, 250, 500)


@register(
    "bucketq_purchase_daily",
    f"""{ORACLE_PTS},
v AS (SELECT {_bucket_sql(DAY)} AS bucket_ts, value
      FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}),
b AS (SELECT bucket_ts,
             CASE {" ".join(f"WHEN value < {hi} THEN {lo}" for lo, hi in zip(_BQ_BOUNDS[:-2], _BQ_BOUNDS[1:-1]))} ELSE {_BQ_BOUNDS[-2]} END AS lo,
             CASE {" ".join(f"WHEN value < {hi} THEN {hi}" for hi in _BQ_BOUNDS[1:-1])} ELSE {_BQ_BOUNDS[-1]} END AS hi
      FROM v),
h AS (SELECT bucket_ts, lo, hi, CAST(count(*) AS DOUBLE) AS c FROM b GROUP BY 1, 2, 3),
cum AS (SELECT bucket_ts, lo, hi,
               sum(c) OVER (PARTITION BY bucket_ts ORDER BY lo) AS cum,
               sum(c) OVER (PARTITION BY bucket_ts) AS tot
        FROM h),
q AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS quantile)
SELECT c.bucket_ts, q.quantile, round(min((lo + hi) / 2), 4) AS q_value
FROM cum c JOIN q ON c.cum >= q.quantile * c.tot
GROUP BY 1, 2""",
)
def bucketq_purchase_daily(spark, sf_dir):
    """Upstream ``bucketquantile`` node: daily p50/p90/p99 of purchase
    values estimated from histogram-bucket counts (midpoint mode).
    The raw points reduce to per-day bucket counts in one hash
    aggregate; the quantile walk then runs over output-sized data."""
    from opentsdb_aura_spark.operators.analytic import bucket_quantile

    pts = points(spark, sf_dir)
    v = F.col("value")
    lo, hi = F.lit(float(_BQ_BOUNDS[-2])), F.lit(float(_BQ_BOUNDS[-1]))
    for b_lo, b_hi in zip(reversed(_BQ_BOUNDS[:-2]), reversed(_BQ_BOUNDS[1:-1])):
        lo = F.when(v < b_hi, float(b_lo)).otherwise(lo)
        hi = F.when(v < b_hi, float(b_hi)).otherwise(hi)
    hist = (
        pts.where((F.col("metric") == "purchase") & (F.col("ts") >= START) & (F.col("ts") < END))
        .groupBy(
            bucket_expr(F.col("ts"), START, DAY).alias("bucket_ts"),
            lo.alias("bucket_lower"),
            hi.alias("bucket_upper"),
        )
        .agg(F.count("*").cast("double").alias("value"))
    )
    res = bucket_quantile(hist, [0.5, 0.9, 0.99])
    return res.select("bucket_ts", "quantile", _r(F.col("value"), 4).alias("q_value"))


_FILL_DENSE = f"""{ORACLE_PTS},
agg AS (
  SELECT {_bucket_sql(HOUR, SPINE_START)} AS bucket_ts, sum(value) AS v
  FROM dpts WHERE metric = 'purchase' AND ts >= {SPINE_START} AND ts < {SPINE_END}
  GROUP BY 1),
dense AS (
  SELECT r.range AS bucket_ts, a.v
  FROM range({SPINE_START}, {SPINE_END}, {HOUR}) r
  LEFT JOIN agg a ON r.range = a.bucket_ts)"""


@register(
    "fill_previous_hourly",
    f"""{_FILL_DENSE}
SELECT bucket_ts,
       round(coalesce(v, last_value(v IGNORE NULLS) OVER (
         ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 4) AS filled_value
FROM dense""",
)
def fill_previous_hourly(spark, sf_dir):
    """Previous-value gap fill over the dense hourly spine (OpenTSDB
    fill policy: carry last reported value forward; leading gaps stay
    NaN)."""
    from opentsdb_aura_spark.operators.analytic import fill_gaps

    q = _mq(
        start=SPINE_START,
        end=SPINE_END,
        interval=HOUR,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=[],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    res = fill_gaps(res, "previous")
    return res.select("bucket_ts", _r(denan(F.col("value")), 4).alias("filled_value"))


@register(
    "fill_linear_hourly",
    f"""{_FILL_DENSE},
ctx AS (
  SELECT bucket_ts, v,
    last_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER (
      ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
    last_value(v IGNORE NULLS) OVER (
      ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER (
      ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
    first_value(v IGNORE NULLS) OVER (
      ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
  FROM dense)
SELECT bucket_ts,
       round(coalesce(v, pv + (nv - pv) * (bucket_ts - pt) / (nt - pt)), 6) AS filled_value
FROM ctx""",
)
def fill_linear_hourly(spark, sf_dir):
    """Linear-interpolation gap fill (lerp) over the dense hourly
    spine: interior gaps interpolate between the surrounding reported
    values, edges stay NaN."""
    from opentsdb_aura_spark.operators.analytic import fill_gaps

    q = _mq(
        start=SPINE_START,
        end=SPINE_END,
        interval=HOUR,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=[],
        gb_agg="sum",
        fill="nan",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    res = fill_gaps(res, "linear")
    return res.select("bucket_ts", _r(denan(F.col("value")), 6).alias("filled_value"))


# ============================================================ filters (F1-F10)


@register(
    "filter_chain_not",
    f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts
WHERE metric IN ('purchase', 'error') AND NOT (tag_user IN ('3', '7', '11'))
  AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def filter_chain_not(spark, sf_dir):
    """F2+F7 — literal-OR over metric, AND NOT literal-OR over a tag."""
    flt = Chain(
        "AND",
        [
            Chain("OR", [MetricLiteral("purchase"), MetricLiteral("error")]),
            Not(TagLiteralOr("user", ("3", "7", "11"))),
        ],
    )
    pts = points(spark, sf_dir)
    from opentsdb_aura_spark.filters import compile_filter, time_range

    df = pts.where(compile_filter(flt) & time_range(START, END))
    res = downsample(df, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "filter_regex_wildcard",
    f"""{ORACLE_PTS}
SELECT metric, tag_user, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE regexp_matches(tag_k, '^[1-3]') AND metric LIKE 's%'
  AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def filter_regex_wildcard(spark, sf_dir):
    """F3+F4 — tag-value regexp (find semantics) + metric wildcard."""
    from opentsdb_aura_spark.filters import TagRegexp, TagWildcard, compile_filter, time_range

    flt = Chain("AND", [TagRegexp("k", "^[1-3]")])
    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(flt) & F.col("metric").rlike("^s") & time_range(START, END))
    return df.groupBy("metric", "tag_user").agg(F.count("*").cast("bigint").alias("n_points"))


# ============================================================ meta (M1-M5)


@register("meta_distinct_metrics", "SELECT DISTINCT event_type AS metric FROM events")
def meta_distinct_metrics(spark, sf_dir):
    """M1 — distinct metrics."""
    return distinct_metrics(series_dim(spark, sf_dir))


@register(
    "meta_tag_keys",
    """WITH series AS (SELECT DISTINCT event_type, user_id,
                        json_extract_string(props, '$.k') AS k FROM events)
SELECT 'k' AS tag_key, CAST(count(*) AS BIGINT) AS series_count FROM series
UNION ALL
SELECT 'user' AS tag_key, CAST(count(*) AS BIGINT) AS series_count FROM series""",
)
def meta_tag_keys(spark, sf_dir):
    """M2 — distinct tag keys with series counts."""
    return distinct_tag_keys(series_dim(spark, sf_dir)).select(
        "tag_key", F.col("series_count").cast("bigint").alias("series_count")
    )


@register(
    "meta_tag_values_user_purchase",
    f"""{ORACLE_PTS}
SELECT tag_user AS tag_value, CAST(count(*) AS BIGINT) AS series_count
FROM series WHERE metric = 'purchase' GROUP BY 1""",
)
def meta_tag_values_user_purchase(spark, sf_dir):
    """M2 — distinct values of one tag key over filtered series."""
    sd = series_dim(spark, sf_dir)
    return distinct_tag_values(sd, "user", MetricLiteral("purchase")).select(
        "tag_value", F.col("series_count").cast("bigint").alias("series_count")
    )


@register(
    "meta_cardinality",
    f"""{ORACLE_PTS}
SELECT CAST(count(*) AS BIGINT) AS cardinality
FROM series WHERE metric IN ('purchase', 'error')""",
)
def meta_cardinality(spark, sf_dir):
    """M5 — matching-series cardinality (exact)."""
    flt = Chain("OR", [MetricLiteral("purchase"), MetricLiteral("error")])
    return cardinality(series_dim(spark, sf_dir), flt).select(F.col("cardinality").cast("bigint").alias("cardinality"))


@register(
    "meta_active_series_window",
    f"""{ORACLE_PTS}
SELECT metric, count(DISTINCT (tag_user, tag_k)) AS active_series
FROM dpts WHERE ts >= {START + 7 * DAY} AND ts < {START + 14 * DAY}
GROUP BY metric""",
)
def meta_active_series_window(spark, sf_dir):
    """T6 — per-metric active-series count over a day-aligned week,
    served ENTIRELY from the STORED epoch-presence table written at
    flush (the Spark shape of Myst's per-series epoch bitmaps,
    MetaTimeSeriesQueryResult.java:89-94): no raw point is read — the
    plan's only scan is the presence parquet.  The window is
    day-aligned (a multiple of the table's hourly epochs) so epoch
    granularity equals exact range semantics and the raw-scan oracle
    hash-matches."""
    from opentsdb_aura_spark.operators.meta import active_series
    from opentsdb_aura_spark.sources.batch import ensure_event_store, presence_path

    ensure_event_store(spark, sf_dir)
    pres = spark.read.parquet(presence_path(sf_dir, 3600))
    return active_series(pres, START + 7 * DAY, START + 14 * DAY, epoch_width=3600)


@register(
    "meta_list_series_signup",
    f"""{ORACLE_PTS}
SELECT metric, tag_user, tag_k FROM series WHERE metric = 'signup'""",
)
def meta_list_series_signup(spark, sf_dir):
    """M4 — list matching series (tags resolved)."""
    sd = series_dim(spark, sf_dir).where(F.col("metric") == "signup")
    return sd.select("metric", F.col("tags")["user"].alias("tag_user"), F.col("tags")["k"].alias("tag_k"))


# ============================================================ events (E1-E6, L1-L3)


@register(
    "ev_top_recent",
    """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_type,
              round(value, 4) AS value
FROM events ORDER BY ts DESC, event_id DESC LIMIT 50""",
)
def ev_top_recent(spark, sf_dir):
    """L1/L2 — newest-first top-N with deterministic tie-break."""
    ev = events_seconds(spark, sf_dir)
    return top_n(ev, 50).select("event_id", "ts", "event_type", _r("value", 4).alias("value"))


@register(
    "ev_group_type_count_last",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS hits,
              CAST(max(floor(epoch(ts))) AS BIGINT) AS last_ts,
              round(arg_max(value, CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id), 4) AS last_value
FROM events GROUP BY 1""",
)
def ev_group_type_count_last(spark, sf_dir):
    """E5/L3 — per-dimension count + latest event fetch-last."""
    ev = events_seconds(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("hits"),
        F.max("ts").alias("last_ts"),
        _r(F.max_by("value", F.col("ts") * 1000000 + F.col("event_id")), 4).alias("last_value"),
    )


@register(
    "ev_minute_histogram",
    f"""SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS minute_ts,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE epoch(ts) >= {START} AND epoch(ts) < {START + 7 * DAY}
GROUP BY 1""",
)
def ev_minute_histogram(spark, sf_dir):
    """E6 — per-minute histogram over one week; the time range is
    restated on the daily partition key so the scan prunes to 7
    partitions (E3 daily-index pruning)."""
    ev = events_seconds(spark, sf_dir).where(
        (F.col("ts") >= START)
        & (F.col("ts") < START + 7 * DAY)
        & (F.col("event_date") >= "2024-01-01")
        & (F.col("event_date") <= "2024-01-07")
    )
    return minute_histogram(ev)


@register(
    "ev_text_search",
    r"""SELECT event_id FROM events
WHERE (regexp_matches(lower(event_type), '(^|\s)purchase(\s|$)')
       OR regexp_matches(lower(props), '(^|\s)purchase(\s|$)'))
  AND (regexp_matches(lower(event_type), '(^|\s)\{"k":(\s|$)')
       OR regexp_matches(lower(props), '(^|\s)\{"k":(\s|$)'))""",
)
def ev_text_search(spark, sf_dir):
    """E1 — boolean AND full-text match across fields with Lucene's
    whitespace-analyzer semantics: each token must match a WHOLE
    whitespace-delimited token (``pur`` no longer matches
    ``purchase``).  'purchase' hits the event_type field; '{"k":' (the
    first whitespace token of props='{"k": NN}', regex-escaped on both
    sides) hits the props field — AND across two fields, ~20% of rows
    match, so the gate exercises real selectivity."""
    ev = events_seconds(spark, sf_dir)
    return ev.where(text_match(["event_type", "props"], ["purchase", '{"k":'], "AND")).select("event_id")


@register(
    "ev_ongoing_window",
    f"""SELECT event_id FROM (
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 7200) AS end_ts,
         (event_id % 29 = 0) AS ongoing
  FROM events)
WHERE (ts >= {START + 10 * DAY} AND ts <= {START + 11 * DAY})
   OR (end_ts >= {START + 10 * DAY} AND end_ts <= {START + 11 * DAY})
   OR ongoing""",
)
def ev_ongoing_window(spark, sf_dir):
    """E2 — (start∈[s,e] OR end∈[s,e] OR ongoing) range predicate
    (LuceneQueryBuilder.getTimeRangeQuery: two SHOULD range clauses +
    an ongoing==1 SHOULD clause, all bounds inclusive).  The store
    derives end_ts/ongoing deterministically from event_id since the
    driver table has no duration fields."""
    from opentsdb_aura_spark.operators.events import time_window_or_ongoing

    ev = events_seconds(spark, sf_dir)
    return ev.where(time_window_or_ongoing(START + 10 * DAY, START + 11 * DAY)).select("event_id")


# ============================================================ joins / set ops (J1-J2, U3)


@register(
    "join_series_enrich",
    f"""{ORACLE_PTS},
daily AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS sv
  FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3),
last_per_series AS (
  SELECT tag_user, tag_k, arg_max(value, ts * 1000000 + ingest_seq) AS lv
  FROM dpts WHERE metric = 'purchase' GROUP BY 1, 2)
SELECT d.tag_user, d.tag_k, d.bucket_ts, round(d.sv, 4) AS sum_value,
       round(l.lv, 4) AS last_value
FROM daily d JOIN last_per_series l USING (tag_user, tag_k)""",
)
def join_series_enrich(spark, sf_dir):
    """J2 — per-series result enriched via a join with series_dim
    (tag/last-value resolution); AQE size-picks broadcast at runtime —
    no forced hint, the dim is O(series).  The dim side reads the
    STORED series_dim table (the meta index written at flush, S7) —
    re-deriving it from points would re-aggregate the whole fact table
    through a sort aggregate just to recover what the store already
    has."""
    pts = points(spark, sf_dir).where(F.col("metric") == "purchase")
    daily = downsample(pts, START, END, DAY, "sum", group_cols=["tag_user", "tag_k"], fill="none")
    sd = series_dim(spark, sf_dir).where(F.col("metric") == "purchase").select(
        F.col("tags")["user"].alias("tag_user"),
        F.col("tags")["k"].alias("tag_k"),
        F.col("last_value"),
    )
    return daily.join(sd, ["tag_user", "tag_k"]).select(
        "tag_user",
        "tag_k",
        "bucket_ts",
        _r(denan(F.col("value")), 4).alias("sum_value"),
        _r(F.col("last_value"), 4).alias("last_value"),
    )


@register(
    "splice_hot_cold_sum",
    f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS spliced_sum
FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2""",
)
def splice_hot_cold_sum(spark, sf_dir):
    """U3 — hot/cold time-splice: union of non-overlapping ranges
    equals the full-range scan."""
    pts = points(spark, sf_dir)
    boundary = START + 15 * DAY
    spliced = splice_hot_cold(hot=pts, cold=pts, boundary_ts=boundary)
    res = downsample(spliced, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("spliced_sum"))


@register(
    "splice_bucketed_cold_sum",
    f"""{ORACLE_PTS}
SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts,
       round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2, 3""",
)
def splice_bucketed_cold_sum(spark, sf_dir):
    """U3 with the series-bucketed COLD tier: the cold range is served
    by the bucketed layout (per-series aggregation Exchange-free — the
    bucket spec hash-partitions series_id), the hot range by the
    segment-partitioned store (its small recent shuffle), and the
    per-tier results are unioned on the shared day grid.  Equals the
    full-range scan; the reference analogue is the shard scan merged
    with series-keyed LTS reads (aerospike/.../LTSAerospike.java)."""
    from opentsdb_aura_spark.plans.query import splice_bucketed_downsample
    from opentsdb_aura_spark.sources.batch import bucketed_metrics

    boundary = START + 15 * DAY
    cold = bucketed_metrics(spark, sf_dir).where(F.col("metric") == "purchase")
    hot = points(spark, sf_dir).where(F.col("metric") == "purchase")
    res = splice_bucketed_downsample(hot, cold, boundary, START, END, DAY, "sum", group_cols=["series_id"])
    dim = series_dim(spark, sf_dir).select(
        "series_id",
        F.col("tags")["user"].alias("tag_user"),
        F.col("tags")["k"].alias("tag_k"),
    )
    return res.join(dim, "series_id").select(
        "tag_user", "tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value")
    )


@register(
    "tiered_auto_route_gb_sum",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def tiered_auto_route_gb_sum(spark, sf_dir):
    """U3 + automatic routing: ONE `run_tiered_metric_query` call spans
    both tiers — the PLANNER consults the store's retention boundary
    (day 15) and splices the bucketed cold tier (per-series/group
    aggregation Exchange-free) with the hot segment store, the way its
    rollup substitution already picks tables (the reference's
    AuraMetricsClusterConfig range routing).  Equals the full-range
    scan."""
    from opentsdb_aura_spark.plans.query import TieredStore, run_tiered_metric_query
    from opentsdb_aura_spark.sources.batch import bucketed_metrics

    store = TieredStore(
        hot=points(spark, sf_dir),
        cold=bucketed_metrics(spark, sf_dir),
        boundary_ts=START + 15 * DAY,
    )
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="sum",
        filter=MetricLiteral("purchase"), group_tag_keys=["user"],
        gb_agg="sum", fill="none",
    )
    res = run_tiered_metric_query(store, q, dedupe=False)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "tiered_cold_rollup_gb_sum",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def tiered_cold_rollup_gb_sum(spark, sf_dir):
    """Per-tier pre-aggregates: the COLD tier carries its own hourly
    rollup table (``TieredStore.cold_rollups`` — only rows below the
    retention boundary, the way the reference's LTS is the tier that
    stores downsampled streams, AerospikeBatchQueryNode.java:200-224)
    while the hot tier has none and scans raw.  One
    ``run_tiered_metric_query`` call: the planner routes the cold
    sub-range through rollup substitution and the hot sub-range
    through the raw segment scan, then splices on the day grid.
    Equals the full-range raw scan; tests/test_plans.py asserts the
    cold side reads rollup_3600 and the hot side the metrics store."""
    from opentsdb_aura_spark.plans.query import TieredStore, run_tiered_metric_query
    from opentsdb_aura_spark.sources.batch import bucketed_metrics

    boundary = START + 15 * DAY
    store = TieredStore(
        hot=points(spark, sf_dir),
        cold=bucketed_metrics(spark, sf_dir),
        boundary_ts=boundary,
        cold_rollups={3600: _rollup(spark, sf_dir).where(F.col("window_start") < boundary)},
    )
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="sum",
        filter=MetricLiteral("purchase"), group_tag_keys=["user"],
        gb_agg="sum", fill="none",
    )
    res = run_tiered_metric_query(store, q, dedupe=False, series_dim=series_dim(spark, sf_dir))
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


# ============================================================ relational health (TPC-H-ish)


@register(
    "tpch_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2""",
)
def tpch_pricing_summary(spark, sf_dir):
    """Relational health check: TPC-H Q1-style pricing summary."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), 2).alias("sum_qty"),
            _r(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            _r(F.avg("l_quantity"), 4).alias("avg_qty"),
            _r(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_revenue_by_nation",
    """SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1""",
)
def tpch_revenue_by_nation(spark, sf_dir):
    """Relational health check: multi-join revenue rollup.

    Only ``nation`` (fixed 25 rows at every SF) carries a broadcast
    hint.  ``customer`` is O(SF) — ~15 M rows / several GB at sf100 —
    so a forced broadcast would OOM executors at scale; AQE +
    autoBroadcastJoinThreshold size-pick it instead (still a
    BroadcastHashJoin at small SF, plan-asserted in test_plans)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "tpch_shipping_priority",
    """SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
)
def tpch_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter on customer,
    aggregate, top-10 by revenue (TakeOrderedAndProject — no global
    sort materializes).  No forced broadcast on customer: it is O(SF),
    so the hint is left to AQE/autoBroadcastJoinThreshold, which still
    picks BroadcastHashJoin at small SF (plan-asserted)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cutoff = "1998-01-01"
    return (
        li.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.floor(F.col("o_orderdate").cast("timestamp").cast("double")).cast("bigint").alias("order_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ============================================================ dedup (pipeline)


@register(
    "dedup_exact_docs",
    """SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS dup_count,
       CAST(min(doc_id) AS BIGINT) AS keep_id
FROM documents GROUP BY 1 HAVING count(*) > 1""",
)
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup: content-hash groups with more than one doc."""
    return exact_duplicates(docs(spark, sf_dir)).select(
        "text_hash", F.col("dup_count").cast("bigint").alias("dup_count"), F.col("keep_id").cast("bigint").alias("keep_id")
    )


@register(
    "dedup_repeated_spans",
    r"""WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks
           FROM documents),
g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(toks[i+1:i+8], ' ') AS gram
      FROM d, unnest(range(0, greatest(len(toks) - 7, 0))) AS t(i)),
rep AS (SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, pos, g.gram, n_docs FROM g JOIN rep USING (gram)""",
)
def dedup_repeated_spans(spark, sf_dir):
    """Span-level exact dedup (Lee et al. suffix-array substring dedup,
    re-expressed): every position of an 8-token sequence recurring in
    ≥2 distinct docs, with its corpus document frequency.  Hash-agg +
    equi-join — no suffix array, no all-pairs."""
    from opentsdb_aura_spark.operators.dedup_text import repeated_ngram_spans

    return repeated_ngram_spans(docs(spark, sf_dir), n=8, min_docs=2)


@register(
    "dedup_span_excise",
    r"""WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks
           FROM documents),
g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(toks[i+1:i+8], ' ') AS gram
      FROM d, unnest(range(0, greatest(len(toks) - 7, 0))) AS t(i)),
rep AS (SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
sp AS (SELECT doc_id, pos FROM g JOIN rep USING (gram)),
tokpos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, toks[i+1] AS tok
           FROM d, unnest(range(0, len(toks))) AS t(i)),
keep AS (SELECT tp.doc_id, tp.i, tp.tok FROM tokpos tp
         WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = tp.doc_id
                           AND sp.pos <= tp.i AND tp.i < sp.pos + 8)),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM keep GROUP BY 1)
SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
       CAST(len(d.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN agg a USING (doc_id)""",
)
def dedup_span_excise(spark, sf_dir):
    """Span excision (Lee et al. cleaning step): strip every token
    covered by a corpus-repeated 8-gram; returns the reassembled
    token stream and the removed-token count per document."""
    from opentsdb_aura_spark.operators.dedup_text import excise_repeated_spans

    return excise_repeated_spans(docs(spark, sf_dir), n=8, min_docs=2)


@register(
    "dedup_ngram_jaccard",
    f"""{ORACLE_SHINGLES},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.2""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup detection: 3-word-shingle Jaccard ≥ 0.2 pairs."""
    res = ngram_jaccard_pairs(docs(spark, sf_dir), n=3, threshold=0.2)
    return res.select("doc_a", "doc_b", _r("jaccard", 6).alias("jaccard"))


@register("dedup_minhash_lsh")  # hash-dependent candidates: rows-only check
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates at estimated Jaccard ≥ 0.5 —
    the ``jaccard`` column is the MinHash signature estimate (matching
    permutation mins / k, σ ≈ 0.09 at J=0.5, k=32), not an exact
    re-verification; pass ``exact_verify=True`` for that."""
    res = minhash_lsh_candidates(docs(spark, sf_dir), num_perm=32, bands=8, threshold=0.5)
    return res.select("doc_a", "doc_b", _r("jaccard", 6).alias("jaccard"))


@register(
    "dedup_minhash_lsh_exact",
    f"""{ORACLE_SHINGLES},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5""",
)
def dedup_minhash_lsh_exact(spark, sf_dir):
    """The flagship dedup path, hash-checked: MinHash-LSH candidates
    re-verified on EXACT shingle Jaccard (``exact_verify=True``
    semi-joins candidate docs and re-explodes their shingle sets —
    never O(n²)).  With 1-row bands (bands = num_perm = 32) a pair
    collides iff any permutation min agrees, so on this corpus every
    exact-Jaccard ≥ 0.5 pair is banded (verified at sf0.001 and
    sf0.01) and the output equals the SQL-expressible set of pairs
    with exact 3-word-shingle Jaccard ≥ 0.5 — upgrading the LSH
    surface from rows-only to a value-hash oracle while the default
    approximate path (``dedup_minhash_lsh``) stays untouched."""
    res = minhash_lsh_candidates(
        docs(spark, sf_dir), num_perm=32, bands=32, threshold=0.5, exact_verify=True
    )
    return res.select("doc_a", "doc_b", _r("jaccard", 6).alias("jaccard"))


@register("dedup_simhash")  # hash-dependent: rows-only check
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3) via bit-band candidates."""
    return simhash_near_pairs(docs(spark, sf_dir), max_hamming=3)


# ============================================================ similarity search


_ANN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv)+1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * x)))
            * sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * x)))) AS cs
  FROM q, c WHERE query_id != neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn FROM s)
SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim FROM r WHERE rn <= 5"""


@register("ann_cosine_topk", _ANN_ORACLE)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for 20 query vectors."""
    e = embs(spark, sf_dir)
    res = brute_force_topk(e, e.where(F.col("vec_id") < 20), k=5)
    return res.select("query_id", "neighbor_id", _r("cos_sim", 6).alias("cos_sim"))


@register("ann_lsh_topk")  # approximate: recall < 1 → rows-only check
def ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate cosine top-5 (the 100 TB scale path)."""
    e = embs(spark, sf_dir)
    res = lsh_topk(e, e.where(F.col("vec_id") < 20), k=5, dim=64)
    return res.select("query_id", "neighbor_id", _r("cos_sim", 6).alias("cos_sim"))


@register("ann_ivf_topk", _ANN_ORACLE)
def ann_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) cosine top-5: sampled spherical-k-means
    lists, Arrow-batched centroid assignment, nprobe probing.  Probing
    ALL lists here makes it exhaustive, so the exact-ANN oracle
    applies; production sets nprobe ≪ n_centroids."""
    from opentsdb_aura_spark.operators.similarity import ivf_topk

    e = embs(spark, sf_dir)
    res = ivf_topk(e, e.where(F.col("vec_id") < 20), k=5, n_centroids=8, nprobe=8)
    return res.select("query_id", "neighbor_id", _r("cos_sim", 6).alias("cos_sim"))


@register("ann_ivf_index_topk", _ANN_ORACLE)
def ann_ivf_index_topk(spark, sf_dir):
    """IVF with the index AT REST: centroids + list-partitioned
    vectors persisted once (`build_ivf_index`), then searched via
    `ivf_search_index` — the probed list ids (≤ n_centroids values)
    push down as an isin partition filter, so a production probe scans
    only nprobe/n_centroids of the corpus directories.  Full probe
    here → exhaustive → the exact-ANN oracle applies."""
    import os

    from opentsdb_aura_spark.operators.similarity import build_ivf_index, ivf_search_index
    from opentsdb_aura_spark.sources.batch import STORE_ROOT

    base = os.path.basename(os.path.normpath(sf_dir))
    # params in the dir name: changed build parameters land in a fresh
    # dir instead of silently reading a stale index; the whole root is
    # version-rmtree'd with the event store on layout changes
    path = os.path.join(STORE_ROOT, base, "ivf_index_c8_v1")
    if not os.path.exists(os.path.join(path, "vectors", "_SUCCESS")):
        build_ivf_index(embs(spark, sf_dir), path, n_centroids=8)
    q = embs(spark, sf_dir).where(F.col("vec_id") < 20)
    res = ivf_search_index(spark, path, q, k=5, nprobe=8)
    return res.select("query_id", "neighbor_id", _r("cos_sim", 6).alias("cos_sim"))


# ============================================================ text analysis


@register(
    "text_token_stats",
    """SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '')) AS BIGINT) AS n_tokens,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents""",
)
def text_token_stats(spark, sf_dir):
    """Token + byte counts per document."""
    return token_stats(docs(spark, sf_dir))


@register(
    "text_quality",
    """SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is'], t))) * 1.0 / len(toks) END, 6) AS stopword_ratio,
       round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks) END, 6) AS mean_token_len
FROM (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '') AS toks FROM documents)""",
)
def text_quality(spark, sf_dir):
    """Quality signals: stopword ratio, mean token length."""
    res = quality_scores(docs(spark, sf_dir))
    return res.select(
        "doc_id",
        "n_tokens",
        _r("stopword_ratio", 6).alias("stopword_ratio"),
        _r("mean_token_len", 6).alias("mean_token_len"),
    )


@register(
    "text_lang_id",
    """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '') AS toks FROM documents),
s AS (SELECT doc_id,
        len(list_filter(toks, x -> list_contains(['der','die','und','ist','das'], x))) AS s_de,
        len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS s_en,
        len(list_filter(toks, x -> list_contains(['el','la','los','es','de'], x))) AS s_es,
        len(list_filter(toks, x -> list_contains(['le','la','les','est','et'], x))) AS s_fr,
        len(list_filter(toks, x -> list_contains(['de','shi','le','zai','he'], x))) AS s_zh
      FROM t)
SELECT doc_id,
  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       WHEN s_fr >= s_zh THEN 'fr'
       ELSE 'zh' END AS pred_lang,
  CAST(greatest(s_de, s_en, s_es, s_fr, s_zh) AS BIGINT) AS score
FROM s""",
)
def text_lang_id(spark, sf_dir):
    """Heuristic language ID with deterministic tie-break."""
    return lang_id(docs(spark, sf_dir))


_PII = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}

# deterministic PII injection: the synthetic corpus has no PII, so the
# query plants one email/IP/SSN/phone per doc by a SQL-expressible rule
# (same trick as the BMP decode proof) — the scrub only hash-matches if
# masks land at exactly the right spans
_PII_INJECT_SQL = (
    "substr(text, 1, 60) || ' reach user' || doc_id || '@mail-' || (doc_id % 7) || "
    "'.com ip ' || (doc_id % 155 + 100) || '.' || (doc_id % 256) || '.0.' || (doc_id % 254 + 1) || "
    "' ssn ' || (doc_id % 900 + 100) || '-' || lpad((doc_id % 100)::VARCHAR, 2, '0') || '-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0') || "
    "' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)

_PII_ORACLE = (
    "WITH d0 AS (SELECT doc_id, " + _PII_INJECT_SQL + " AS t FROM documents),\n"
    "s1 AS (SELECT doc_id, CAST(len(regexp_extract_all(t, '" + _PII["email"] + "')) AS BIGINT) AS n_email,\n"
    "       regexp_replace(t, '" + _PII["email"] + "', '<EMAIL>', 'g') AS t FROM d0),\n"
    "s2 AS (SELECT doc_id, n_email, CAST(len(regexp_extract_all(t, '" + _PII["ip"] + "')) AS BIGINT) AS n_ip,\n"
    "       regexp_replace(t, '" + _PII["ip"] + "', '<IP>', 'g') AS t FROM s1),\n"
    "s3 AS (SELECT doc_id, n_email, n_ip, CAST(len(regexp_extract_all(t, '" + _PII["ssn"] + "')) AS BIGINT) AS n_ssn,\n"
    "       regexp_replace(t, '" + _PII["ssn"] + "', '<SSN>', 'g') AS t FROM s2),\n"
    "s4 AS (SELECT doc_id, n_email, n_ip, n_ssn, CAST(len(regexp_extract_all(t, '" + _PII["phone"] + "')) AS BIGINT) AS n_phone,\n"
    "       regexp_replace(t, '" + _PII["phone"] + "', '<PHONE>', 'g') AS t FROM s3)\n"
    "SELECT doc_id, t AS scrubbed, n_email, n_ip, n_ssn, n_phone FROM s4"
)


@register("pii_scrub_docs", _PII_ORACLE)
def pii_scrub_docs(spark, sf_dir):
    """PII masking over the corpus: emails, IPv4s, SSN-shaped and
    phone-shaped numbers replaced by typed mask tokens, with per-rule
    counts taken over the progressively-scrubbed text.  Pure
    regexp_count/regexp_replace map stage — no shuffle, no Python."""
    from opentsdb_aura_spark.operators.text import pii_scrub

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    injected = F.concat(
        F.substring(F.col("text"), 1, 60),
        F.lit(" reach user"), s(d), F.lit("@mail-"), s(d % 7), F.lit(".com ip "),
        s(d % 155 + 100), F.lit("."), s(d % 256), F.lit(".0."), s(d % 254 + 1),
        F.lit(" ssn "), s(d % 900 + 100), F.lit("-"), F.lpad(s(d % 100), 2, "0"),
        F.lit("-"), F.lpad(s(d % 10000), 4, "0"),
        F.lit(" call 555-"), F.lpad(s(d % 1000), 3, "0"), F.lit("-"), F.lpad(s(d % 10000), 4, "0"),
    )
    return pii_scrub(docs(spark, sf_dir).withColumn("text", injected))


# ============================================================ corpus curation (pipeline)


def _md5_bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB replica of corpus.det_hash_bucket: first 8 md5 hex chars
    → int via fold, mod 1,000,000."""
    return (
        f"list_reduce(list_transform(str_split(substr(md5({key_expr} || ':{salt}'), 1, 8), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b) % 1000000"
    )


_ORACLE_TC = """tc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tc
      FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '')) AS token
            FROM documents)
      GROUP BY 1, 2)"""


_MD5_U52_SQL = (
    "list_reduce(list_transform(str_split(substr(md5(doc_id || ':wsample'), 1, 13), ''), "
    "c -> strpos('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b)"
)


@register(
    "pipeline_weighted_sample",
    f"""WITH h AS (SELECT doc_id, source, n_chars, {_MD5_U52_SQL} AS hv FROM documents),
k AS (SELECT doc_id, source,
             pow((hv + 1.0) / 4503599627370498.0, 1.0 / n_chars) AS sk
      FROM h WHERE n_chars > 0),
r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY sk DESC, doc_id) AS rn
      FROM k)
SELECT doc_id, source, round(sk, 10) AS sample_key FROM r WHERE rn <= 5""",
)
def pipeline_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES over md5 uniforms), 5 docs per source weighted by
    length — the one-pass rank-filter that importance-resampling
    pipelines (e.g. over DSIR weights) need; deterministic uniforms
    make the EXACT sample reproducible engine-to-engine, hence the SQL
    oracle."""
    from opentsdb_aura_spark.operators.corpus import weighted_sample

    d = docs(spark, sf_dir)
    out = weighted_sample(d, 5, F.col("n_chars").cast("double"), group_col="source")
    return out.select("doc_id", "source", _r("sample_key", 10).alias("sample_key"))


@register(
    "pipeline_split_assign",
    f"""SELECT doc_id,
       CASE WHEN b < 800000 THEN 'train'
            WHEN b < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {_md5_bucket_sql("doc_id", "split")} AS b FROM documents)""",
)
def pipeline_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment — a pure
    hash of doc_id, so the oracle reproduces it bit-for-bit."""
    from opentsdb_aura_spark.operators.corpus import split_assign

    return split_assign(docs(spark, sf_dir))


@register(
    "pipeline_shard_assign",
    """WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':shard') AS hh FROM documents)
SELECT doc_id,
       CAST(('0x' || substr(hh, 1, 15))::BIGINT % 16 AS INTEGER) AS shard_id,
       CAST(row_number() OVER (
              PARTITION BY ('0x' || substr(hh, 1, 15))::BIGINT % 16
              ORDER BY hh, doc_id) AS BIGINT) AS shard_pos
FROM h""",
)
def pipeline_shard_assign(spark, sf_dir):
    """Deterministic training-order shuffle into 16 shards: hash shard
    + in-shard rank, reproducible bit-for-bit by the oracle; the
    position window partitions by shard (no global sort)."""
    from opentsdb_aura_spark.operators.corpus import shard_assign

    return shard_assign(docs(spark, sf_dir), 16)


@register(
    "corpus_vocab_stats",
    f"""WITH {_ORACLE_TC}
SELECT token, CAST(sum(tc) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
FROM tc GROUP BY 1""",
)
def corpus_vocab_stats(spark, sf_dir):
    """Vocabulary building: per-token corpus term frequency and
    document frequency."""
    from opentsdb_aura_spark.operators.corpus import vocab_stats

    return vocab_stats(docs(spark, sf_dir))


@register(
    "corpus_tfidf_top3",
    f"""WITH {_ORACLE_TC},
dfreq AS (SELECT token, count(*) AS df FROM tc GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (SELECT tc.doc_id, tc.token,
                  tc.tc * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
           FROM tc JOIN dfreq USING (token) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
      FROM scored)
SELECT doc_id, token, round(score, 6) AS score FROM r WHERE rn <= 3""",
)
def corpus_tfidf_top3(spark, sf_dir):
    """Top-3 characteristic terms per doc by smoothed TF-IDF."""
    from opentsdb_aura_spark.operators.corpus import tfidf_top_terms

    res = tfidf_top_terms(docs(spark, sf_dir), k=3)
    return res.select("doc_id", "token", _r("score", 6).alias("score"))


@register(
    "pipeline_stratified_sample",
    f"""WITH h AS (SELECT doc_id, lang, {_md5_bucket_sql("doc_id", "sample")} AS b FROM documents),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM h)
SELECT doc_id, lang FROM r WHERE rn <= ceil(n * 0.1)""",
)
def pipeline_stratified_sample(spark, sf_dir):
    """Exact deterministic 10% stratified sample per language."""
    from opentsdb_aura_spark.operators.corpus import stratified_sample

    return stratified_sample(docs(spark, sf_dir), 0.1, strata_col="lang").select("doc_id", "lang")


@register(
    "dedup_keep_best",
    r"""WITH c AS (SELECT doc_id, n_chars,
    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS ckey
  FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY ckey ORDER BY n_chars DESC, doc_id) AS rn FROM c),
w AS (SELECT ckey, doc_id AS kept_doc_id FROM r WHERE rn = 1)
SELECT r.doc_id, w.kept_doc_id FROM r JOIN w USING (ckey) WHERE r.rn > 1""",
)
def dedup_keep_best_docs(spark, sf_dir):
    """Keep-one duplicate retention: cluster by normalized-text
    digest, keep the highest-quality doc per cluster, report each
    dropped doc with its surviving representative."""
    from opentsdb_aura_spark.operators.corpus import dedup_keep_best

    return dedup_keep_best(docs(spark, sf_dir))


@register(
    "dedup_cluster_resolve",
    f"""{ORACLE_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.2),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS doc FROM edges),
reach(doc, lbl) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.doc),
comp AS (SELECT doc, min(lbl) AS label FROM reach GROUP BY 1),
ranked AS (SELECT c.doc, c.label,
                  row_number() OVER (PARTITION BY c.label
                                     ORDER BY d.n_chars DESC, c.doc) AS rn
           FROM comp c JOIN documents d ON d.doc_id = c.doc),
w AS (SELECT label, doc AS kept_doc_id FROM ranked WHERE rn = 1)
SELECT r.doc AS doc_id, w.kept_doc_id
FROM ranked r JOIN w USING (label) WHERE r.rn > 1""",
)
def dedup_cluster_resolve(spark, sf_dir):
    """Near-dup retention end-to-end: Jaccard ≥ 0.2 candidate pairs →
    connected components (transitive closure) → keep the longest doc
    per cluster; one row per dropped doc with its survivor.  The
    oracle closes the components with a recursive CTE."""
    from opentsdb_aura_spark.operators.corpus import resolve_duplicate_clusters

    d = docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.2)
    return resolve_duplicate_clusters(d, pairs)


@register(
    "chunk_docs_64_32",
    r"""WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks
           FROM documents),
st AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), 32)) AS s FROM d)
SELECT doc_id, CAST(s // 32 AS INTEGER) AS chunk_idx,
       array_to_string(toks[s+1:s+64], ' ') AS chunk_text,
       CAST(len(toks[s+1:s+64]) AS BIGINT) AS n_tokens
FROM st WHERE len(toks[s+1:s+64]) > 0""",
)
def chunk_docs_64_32(spark, sf_dir):
    """Training-sample chunking: 64-token windows at stride 32
    (overlapping halves), tail chunks kept.  Narrow 1→many explode —
    no shuffle."""
    from opentsdb_aura_spark.operators.corpus import chunk_documents

    return chunk_documents(docs(spark, sf_dir), chunk_tokens=64, stride=32)


@register(
    "contamination_ngram",
    f"""{ORACLE_SHINGLES},
probe AS (SELECT doc_id AS probe_id, s FROM shing WHERE doc_id % 50 = 0),
psize AS (SELECT probe_id, count(*) AS pn FROM probe GROUP BY 1),
hits AS (SELECT c.doc_id, p.probe_id, count(*) AS inter
         FROM shing c JOIN probe p ON c.s = p.s AND c.doc_id <> p.probe_id
         GROUP BY 1, 2)
SELECT h.doc_id, h.probe_id, round(h.inter * 1.0 / ps.pn, 6) AS overlap_frac
FROM hits h JOIN psize ps USING (probe_id)
WHERE h.inter * 1.0 / ps.pn >= 0.5""",
)
def contamination_ngram(spark, sf_dir):
    """Train/eval contamination: docs sharing ≥ 50% of a probe doc's
    distinct 3-gram shingles (probe set = every 50th doc, standing in
    for a benchmark suite).  Corpus-side single pass with the probe
    shingles broadcast."""
    from opentsdb_aura_spark.operators.corpus import contamination_check

    d = docs(spark, sf_dir)
    res = contamination_check(d, d.where(F.col("doc_id") % 50 == 0), n=3, min_overlap_frac=0.5)
    return res.select("doc_id", "probe_id", _r(F.col("overlap_frac"), 6).alias("overlap_frac"))


@register(
    "corpus_bigram_top20",
    r"""WITH t AS (SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks FROM documents),
b AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""",
)
def corpus_bigram_top20(spark, sf_dir):
    """Top-20 corpus bigrams (n-gram language-model counts), total
    deterministic order."""
    from opentsdb_aura_spark.operators.corpus import bigram_counts

    return bigram_counts(docs(spark, sf_dir), k=20)


@register(
    "pipeline_pack_sequences",
    r"""WITH t AS (SELECT doc_id, len(list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '')) AS n
           FROM documents),
c AS (SELECT doc_id, n,
             coalesce(sum(n) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ts
      FROM t)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(ts AS BIGINT) AS token_start,
       CAST(ts // 128 AS BIGINT) AS seq_first,
       CAST(ts % 128 AS BIGINT) AS offset_first,
       CAST((ts + n - 1) // 128 AS BIGINT) AS seq_last
FROM c""",
)
def pipeline_pack_sequences(spark, sf_dir):
    """GPT-style concat-then-chunk sequence packing into 128-token
    training sequences: per-doc stream offsets via a two-level
    distributed prefix sum (per-block sums → tiny block-offset window
    → broadcast join + bounded within-block window) — no global
    single-partition window at any corpus size."""
    from opentsdb_aura_spark.operators.corpus import pack_sequences

    return pack_sequences(docs(spark, sf_dir), seq_len=128)


@register(
    "pipeline_mixture_sample",
    f"""SELECT doc_id, source
FROM (SELECT doc_id, source, {_md5_bucket_sql("doc_id", "mixture")} AS b FROM documents)
WHERE b < CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000
                      WHEN 'src2' THEN 250000 ELSE 100000 END""",
)
def pipeline_mixture_sample(spark, sf_dir):
    """Domain-mixture sampling: per-source keep rates (100%/50%/25%,
    10% default) as a deterministic hash filter — a narrow map that
    pushes down to the scan; the oracle replicates the md5 bucket
    bit-for-bit."""
    from opentsdb_aura_spark.operators.corpus import mixture_sample

    res = mixture_sample(
        docs(spark, sf_dir),
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
        domain_col="source",
    )
    return res.select("doc_id", "source")


# ============================================================ quality filters (pipeline)

# Line injection shared by the repetition/line-dedup queries: the
# synthetic corpus is single-line, so both engines rebuild each doc as
# lines of 5 tokens (same rule, so line-level semantics are exercised
# end-to-end and the oracle stays bit-exact).
_LINES_SQL = r"""WITH d0 AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks
           FROM documents),
d AS (SELECT doc_id, toks,
        list_transform(range(0, CAST(ceil(len(toks) / 5.0) AS INT)),
                       i -> array_to_string(toks[i*5+1:i*5+5], ' ')) AS lines
      FROM d0)"""


def _docs_with_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    nl = F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * F.lit(5) + F.lit(1), 5), " "),
    )
    return docs(spark, sf_dir).withColumn("text", F.array_join(lines, "\n"))


@register(
    "quality_repetition_docs",
    f"""{_LINES_SQL},
l AS (SELECT doc_id, unnest(lines) AS line FROM d),
pl AS (SELECT doc_id, line, count(*) AS c, length(line) AS len FROM l GROUP BY 1, 2),
ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
              sum(c - 1) * 1.0 / sum(c) AS dup_line_frac,
              sum((c - 1) * len) * 1.0 / sum(c * len) AS dup_line_char_frac
       FROM pl GROUP BY 1),
bgs AS (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram,
               list_sum(list_transform(toks, t -> length(t))) AS tc
        FROM d),
pb AS (SELECT doc_id, bigram, count(*) AS c, any_value(tc) AS tc FROM bgs GROUP BY 1, 2),
mx AS (SELECT doc_id, max(c) AS mx, any_value(tc) AS tc FROM pb GROUP BY 1),
tb AS (SELECT p.doc_id, min(p.bigram) AS top_bigram, any_value(m.mx) AS c, any_value(m.tc) AS tc
       FROM pb p JOIN mx m USING (doc_id) WHERE p.c = m.mx GROUP BY 1)
SELECT ls.doc_id, n_lines, round(dup_line_frac, 6) AS dup_line_frac,
       round(dup_line_char_frac, 6) AS dup_line_char_frac, top_bigram,
       round(c * (length(top_bigram) - 1) * 1.0 / tc, 6) AS top_bigram_char_frac
FROM ls JOIN tb USING (doc_id)""",
)
def quality_repetition_docs(spark, sf_dir):
    """Gopher-style repetition signals (duplicate-line fraction by
    count and by characters, top-bigram character coverage) over the
    line-injected corpus.  Two explode→pre-agg chains with map-side
    combine — no corpus-wide hot key."""
    from opentsdb_aura_spark.operators.quality import repetition_signals

    res = repetition_signals(_docs_with_lines(spark, sf_dir))
    return res.select(
        "doc_id",
        "n_lines",
        _r("dup_line_frac", 6).alias("dup_line_frac"),
        _r("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        "top_bigram",
        _r("top_bigram_char_frac", 6).alias("top_bigram_char_frac"),
    )


@register(
    "quality_gopher_flags",
    r"""WITH t AS (SELECT doc_id, text,
        list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks,
        string_split(text, chr(10)) AS lines FROM documents),
s AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS mean_word_len,
        list_sum(list_transform(toks, x -> length(x) - length(replace(x, '#', ''))
          + CASE WHEN contains(x, '...') OR contains(x, '…') THEN 1 ELSE 0 END)) * 1.0 / len(toks) AS symbol_word_ratio,
        len(list_filter(lines, l -> substr(l, 1, 2) IN ('- ', '* ', '• '))) * 1.0 / len(lines) AS bullet_line_frac,
        len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) * 1.0 / len(lines) AS ellipsis_line_frac,
        len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(toks) AS alpha_word_frac,
        CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS BIGINT) AS n_stopword_hits
      FROM t)
SELECT doc_id, n_tokens, round(mean_word_len, 6) AS mean_word_len,
       round(symbol_word_ratio, 6) AS symbol_word_ratio,
       round(bullet_line_frac, 6) AS bullet_line_frac,
       round(ellipsis_line_frac, 6) AS ellipsis_line_frac,
       round(alpha_word_frac, 6) AS alpha_word_frac, n_stopword_hits,
       n_tokens BETWEEN 10 AND 100000 AS ok_n_tokens,
       mean_word_len BETWEEN 3 AND 10 AS ok_mean_word_len,
       symbol_word_ratio <= 0.1 AS ok_symbol_ratio,
       bullet_line_frac <= 0.9 AS ok_bullet_lines,
       ellipsis_line_frac <= 0.3 AS ok_ellipsis_lines,
       alpha_word_frac >= 0.8 AS ok_alpha_words,
       n_stopword_hits >= 2 AS ok_stopwords,
       (n_tokens BETWEEN 10 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
         AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
         AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
         AND n_stopword_hits >= 2 AS keep
FROM s""",
)
def quality_gopher_flags(spark, sf_dir):
    """Gopher quality gate (Rae et al. 2021 A1.1) over the corpus:
    raw signals, per-rule booleans, and the final keep flag.  Pure
    codegen'd map stage — zero shuffle at any scale."""
    from opentsdb_aura_spark.operators.quality import gopher_quality_flags

    res = gopher_quality_flags(docs(spark, sf_dir), min_tokens=10)
    return res.select(
        "doc_id",
        "n_tokens",
        _r("mean_word_len", 6).alias("mean_word_len"),
        _r("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        _r("bullet_line_frac", 6).alias("bullet_line_frac"),
        _r("ellipsis_line_frac", 6).alias("ellipsis_line_frac"),
        _r("alpha_word_frac", 6).alias("alpha_word_frac"),
        "n_stopword_hits",
        *[c for c in res.columns if c.startswith("ok_")],
        "keep",
    )


@register(
    "quality_lm_scores",
    r"""WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS toks
           FROM documents),
bg AS (SELECT doc_id, toks[i+1] || ' ' || toks[i+2] AS bigram, toks[i+1] AS w1
       FROM d, unnest(range(0, greatest(len(toks) - 1, 0))) AS t(i)),
uni AS (SELECT tok, count(*) AS ucnt
        FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY 1),
v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
big AS (SELECT bigram, count(*) AS bcnt FROM bg GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln((bcnt + 0.1) / (ucnt + 0.1 * v.v))), 4) AS avg_logprob
FROM bg JOIN big USING (bigram) JOIN uni ON bg.w1 = uni.tok CROSS JOIN v
GROUP BY 1""",
)
def quality_lm_scores(spark, sf_dir):
    """CCNet-style perplexity-proxy filter signal: per-doc mean
    log-probability under a Laplace-smoothed corpus bigram LM, fit by
    the aggregation itself (no driver-side training)."""
    from opentsdb_aura_spark.operators.quality import lm_bigram_scores

    res = lm_bigram_scores(docs(spark, sf_dir), alpha=0.1)
    return res.select("doc_id", "n_bigrams", _r("avg_logprob", 4).alias("avg_logprob"))


@register(
    "corpus_line_dedup_docs",
    f"""{_LINES_SQL},
l AS (SELECT doc_id, unnest(range(0, len(lines))) AS pos, lines FROM d),
l2 AS (SELECT doc_id, pos, lines[pos + 1] AS line FROM l),
r AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM l2)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn <= 1 THEN line END, chr(10) ORDER BY pos), '') AS cleaned_text,
       CAST(count(*) FILTER (rn <= 1) AS BIGINT) AS n_lines_kept,
       CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_lines_dropped
FROM r GROUP BY doc_id""",
)
def corpus_line_dedup_docs(spark, sf_dir):
    """C4-style corpus-wide line dedup (first occurrence by (doc_id,
    line position) wins; the tiny vocabulary makes cross-doc duplicate
    lines common).  One shuffle on the line key, one on doc_id."""
    from opentsdb_aura_spark.operators.quality import corpus_line_dedup

    return corpus_line_dedup(_docs_with_lines(spark, sf_dir))


# ============================================================ multimodal plumbing


@register(
    "multimodal_media_stats",
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(max(doc_id % 1920 + 1) AS INTEGER) AS max_width,
       CAST(max(doc_id % 1080 + 1) AS INTEGER) AS max_height
FROM documents GROUP BY 1""",
)
def multimodal_media_stats(spark, sf_dir):
    """Binary media columns + typed metadata: JVM-side stats without
    decoding (the decode itself is a stubbed mapInPandas — see
    multimodal_features)."""
    media = attach_fake_media(docs(spark, sf_dir))
    return media_stats(media).select(
        "kind",
        F.col("n_media").cast("bigint").alias("n_media"),
        F.col("total_bytes").cast("bigint").alias("total_bytes"),
        F.col("max_width").cast("int").alias("max_width"),
        F.col("max_height").cast("int").alias("max_height"),
    )


@register(
    "multimodal_features",
    """SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(1, least(strlen(text), 256) + 1),
                     i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum
FROM documents WHERE doc_id < 200""",
)
def multimodal_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary media
    (deterministic fake decode; real decoder is a drop-in)."""
    media = attach_fake_media(docs_raw(spark, sf_dir)).where(F.col("media_id") < 200)
    return extract_features(media, fake=True).select("media_id", "kind", "n_bytes", "checksum")


@register(
    "multimodal_jpeg_decode",
    """SELECT doc_id AS media_id,
       CAST(doc_id % 16 + 1 AS DOUBLE) AS width,
       CAST(doc_id % 12 + 1 AS DOUBLE) AS height,
       CAST((doc_id % 16 + 1) * (doc_id % 12 + 1) * 3 AS BIGINT) AS n_bytes
FROM documents WHERE doc_id < 100""",
)
def multimodal_jpeg_decode(spark, sf_dir):
    """REAL baseline JPEG decode end-to-end (operators/jpeg.py: Huffman
    + dequant + IDCT, stdlib/numpy only) over a MIXED-SUBSAMPLING
    corpus: docs round-robin 4:4:4 / 4:2:2 / 4:2:0 payloads, so the
    T.81 A.2.3 interleaved-MCU path (multi-block MCUs, chroma
    downsample/upsample) must parse correctly alongside the plain
    one-block layout.  JPEG is lossy, so unlike
    ``multimodal_real_decode`` the oracle pins the EXACT decoded
    dimensions/byte counts (wrong MCU walk → parse error or wrong
    dims) while the pixel-level roundtrip error is bounded in pytest
    (flat fields ±3, structured images ≥ 34-40 dB PSNR by layout)."""
    from opentsdb_aura_spark.operators.multimodal import attach_image_media

    media = attach_image_media(
        docs_raw(spark, sf_dir).where(F.col("doc_id") < 100),
        formats=("jpeg", "jpeg422", "jpeg420"),
    )
    res = extract_features(media, fake=False)
    return res.select(
        "media_id",
        F.col("feat")[0].alias("width"),
        F.col("feat")[1].alias("height"),
        "n_bytes",
    )


@register(
    "multimodal_real_decode",
    """WITH d AS (
  SELECT doc_id, text, strlen(text) AS L,
         doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
  FROM documents WHERE doc_id < 100),
px AS (
  SELECT doc_id, w, h,
         list_transform(range(0, w * h * 3),
                        j -> ascii(substr(text, (j % L) + 1, 1))) AS p
  FROM d)
SELECT doc_id AS media_id,
       CAST(w * h * 3 AS BIGINT) AS n_bytes,
       CAST(list_sum(p) AS BIGINT) AS checksum,
       round(list_avg(list_transform(range(0, w * h), j -> p[3 * j + 1])), 6) AS mean_r,
       round(list_avg(list_transform(range(0, w * h), j -> p[3 * j + 2])), 6) AS mean_g,
       round(list_avg(list_transform(range(0, w * h), j -> p[3 * j + 3])), 6) AS mean_b
FROM px""",
)
def multimodal_real_decode(spark, sf_dir):
    """REAL image decode end-to-end over a MIXED-FORMAT corpus: each
    doc becomes a genuine image — BMP, PPM, RGB PNG, or paletted PNG
    (color type 3 + PLTE, minimal 1/2/4/8-bit depth) round-robined by
    doc id (pixels derived from the doc text by a SQL-expressible
    rule), ``extract_features(fake=False)`` parses each binary — BMP
    header/bottom-up/BGR/padding, PPM header, PNG zlib-inflate +
    scanline unfilter + palette expansion — and the oracle recomputes
    pixel-sum/channel-mean features from the rule.  Values match ONLY
    if every codec round-trips correctly, so this is the non-stub
    proof of the multimodal decode path."""
    from opentsdb_aura_spark.operators.multimodal import attach_image_media

    media = attach_image_media(docs_raw(spark, sf_dir).where(F.col("doc_id") < 100))
    res = extract_features(media, fake=False)
    return res.select(
        "media_id",
        "n_bytes",
        "checksum",
        _r(F.col("feat")[2], 6).alias("mean_r"),
        _r(F.col("feat")[3], 6).alias("mean_g"),
        _r(F.col("feat")[4], 6).alias("mean_b"),
    )


@register(
    "multimodal_resize_decode",
    """WITH d AS (
  SELECT doc_id, text, strlen(text) AS L,
         doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
  FROM documents WHERE doc_id < 100),
m AS (
  SELECT doc_id,
         list_transform(range(0, 20),
                        ji -> (((ji // 5) * h // 4) * w + ((ji % 5) * w // 5)) * 3) AS src,
         text, L
  FROM d),
px AS (
  SELECT doc_id,
         list_transform(src, s -> ascii(substr(text, (s % L) + 1, 1))) AS pr,
         list_transform(src, s -> ascii(substr(text, ((s + 1) % L) + 1, 1))) AS pg,
         list_transform(src, s -> ascii(substr(text, ((s + 2) % L) + 1, 1))) AS pb
  FROM m)
SELECT doc_id AS media_id,
       CAST(60 AS BIGINT) AS n_bytes,
       CAST(list_sum(pr) + list_sum(pg) + list_sum(pb) AS BIGINT) AS checksum,
       round(list_avg(pr), 6) AS mean_r,
       round(list_avg(pg), 6) AS mean_g,
       round(list_avg(pb), 6) AS mean_b
FROM px""",
)
def multimodal_resize_decode(spark, sf_dir):
    """REAL resize end-to-end: decode each mixed-format image,
    nearest-neighbor sample to 5×4 (vectorized numpy index map),
    re-encode BMP, decode THAT and feature-extract — the oracle
    recomputes the sampled pixel means from the generation rule and
    the floor-index map, so both codec directions and the index
    arithmetic must round-trip exactly."""
    from opentsdb_aura_spark.operators.multimodal import attach_image_media, resize_images

    media = attach_image_media(docs_raw(spark, sf_dir).where(F.col("doc_id") < 100))
    resized = resize_images(media, 5, 4, fake=False).select(
        "media_id", "kind", F.col("resized").alias("payload"),
        "width", "height", "sample_rate", "n_frames",
    )
    res = extract_features(resized, fake=False)
    return res.select(
        "media_id",
        "n_bytes",
        "checksum",
        _r(F.col("feat")[2], 6).alias("mean_r"),
        _r(F.col("feat")[3], 6).alias("mean_g"),
        _r(F.col("feat")[4], 6).alias("mean_b"),
    )


@register(
    "multimodal_audio_decode",
    """WITH d AS (
  SELECT doc_id, text, strlen(text) AS L,
         doc_id % 64 + 16 AS n, 8000 + (doc_id % 4) * 4000 AS rate
  FROM documents WHERE doc_id < 100),
s AS (
  SELECT doc_id, rate, n,
         list_transform(range(0, n),
                        j -> (ascii(substr(text, (j % L) + 1, 1)) - 80) * 256) AS smp
  FROM d)
SELECT doc_id AS media_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       round(list_avg(smp), 6) AS mean_amp,
       round(sqrt(list_avg(list_transform(smp, x -> CAST(x AS DOUBLE) * x))), 6) AS rms,
       CAST(list_sum(list_transform(range(1, n),
                                    j -> CASE WHEN smp[j] * smp[j + 1] < 0 THEN 1 ELSE 0 END))
            AS BIGINT) AS zero_crossings
FROM s""",
)
def multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode end-to-end: every doc becomes a genuine mono
    PCM16 WAV (operators/av.py — RIFF chunk walk), samples derived
    from the doc text by a SQL rule, and ``extract_audio_features``
    must parse the container to produce sample-rate / RMS /
    zero-crossing values the oracle recomputes from the rule.  Wrong
    chunk offsets, endianness, or width → value mismatch."""
    from opentsdb_aura_spark.operators.av import attach_audio_media, extract_audio_features

    media = attach_audio_media(docs_raw(spark, sf_dir).where(F.col("doc_id") < 100))
    res = extract_audio_features(media)
    return res.select(
        "media_id",
        "sample_rate",
        "n_samples",
        _r(F.col("mean_amp"), 6).alias("mean_amp"),
        _r(F.col("rms"), 6).alias("rms"),
        "zero_crossings",
    )


@register(
    "multimodal_video_frames",
    """WITH d AS (
  SELECT doc_id, text, strlen(text) AS L,
         doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h, doc_id % 10 + 3 AS nf
  FROM documents WHERE doc_id < 100),
f AS (
  SELECT doc_id, text, L, w, h, unnest(range(0, nf)) AS fi
  FROM d),
px AS (
  SELECT doc_id, fi, w, h,
         list_transform(range(0, w * h),
                        j -> ascii(substr(text, ((fi * w * h + j) % L) + 1, 1))) AS p
  FROM f WHERE fi % 2 = 0)
SELECT doc_id AS media_id,
       CAST(fi AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(list_sum(p) AS BIGINT) AS checksum,
       round(list_avg(p), 6) AS mean_luma
FROM px""",
)
def multimodal_video_frames(spark, sf_dir):
    """REAL video container parse + frame sampling: every doc becomes
    a genuine Y4M (YUV4MPEG2, Cmono) stream, ``sample_video_frames``
    parses the header/FRAME markers and keeps every 2nd frame (the
    1→many mapInPandas fan-out, now real), and the oracle recomputes
    per-frame checksum / mean luma from the generation rule."""
    from opentsdb_aura_spark.operators.av import attach_video_media, sample_video_frames

    media = attach_video_media(docs_raw(spark, sf_dir).where(F.col("doc_id") < 100))
    res = sample_video_frames(media, every_n=2)
    return res.select(
        "media_id",
        "frame_idx",
        "width",
        "height",
        "n_pixels",
        "checksum",
        _r(F.col("mean_luma"), 6).alias("mean_luma"),
    )


# ============================================================ rollups (A10)


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opentsdb_aura_spark.sources.batch import ensure_event_store, rollup_path

    ensure_event_store(spark, sf_dir)
    return spark.read.parquet(rollup_path(sf_dir, 3600))


@register("rollup_sum_daily", _ds_by_metric_sql(DAY, "sum(value)", "rollup_sum", 4))
def rollup_sum_daily(spark, sf_dir):
    """A10 — daily SUM served from the hourly rollup table; oracle is
    the raw-point computation, proving substitution equivalence."""
    from opentsdb_aura_spark.operators.rollup import downsample_from_rollup

    res = downsample_from_rollup(_rollup(spark, sf_dir), START, END, DAY, "sum", group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("rollup_sum"))


@register("rollup_avg_daily", _ds_by_metric_sql(DAY, "avg(value)", "rollup_avg", 4))
def rollup_avg_daily(spark, sf_dir):
    """A10 — AVG from the rollup chain (Σsum/Σcount)."""
    from opentsdb_aura_spark.operators.rollup import downsample_from_rollup

    res = downsample_from_rollup(_rollup(spark, sf_dir), START, END, DAY, "avg", group_cols=["metric"])
    # 4 dp: Σ(hourly sums)/Σ(hourly counts) associates differently
    # from the oracle's flat avg — identical to ~1e-12 relative, but a
    # 6 dp round can straddle a boundary
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("rollup_avg"))


@register("rollup_stddev_daily", _ds_by_metric_sql(DAY, "stddev_samp(value)", "rollup_stddev", 4))
def rollup_stddev_daily(spark, sf_dir):
    """A11's purpose — sample stddev derived from the stored
    sum/count/sumsq chain ((Σv² − (Σv)²/n)/(n−1)); oracle is the flat
    raw-point stddev_samp."""
    from opentsdb_aura_spark.operators.rollup import downsample_from_rollup

    res = downsample_from_rollup(_rollup(spark, sf_dir), START, END, DAY, "stddev", group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("rollup_stddev"))


@register("rollup_planner_max", _ds_by_metric_sql(DAY, "max(value)", "max_value", 4))
def rollup_planner_max(spark, sf_dir):
    """A10 planner rule: choose_downsample_source picks the hourly
    rollup for a daily MAX (agg servable, 86400 % 3600 == 0, aligned
    start); result must equal the raw scan."""
    from opentsdb_aura_spark.operators.rollup import choose_downsample_source, downsample_from_rollup

    rollups = {3600: _rollup(spark, sf_dir)}
    src, riv = choose_downsample_source(rollups, "max", DAY, START, END)
    assert riv == 3600, "planner must substitute the rollup"
    res = downsample_from_rollup(src, START, END, DAY, "max", group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("max_value"))


@register("splice_mixed_resolution_sum", _ds_by_metric_sql(DAY, "sum(value)", "spliced_sum", 4))
def splice_mixed_resolution_sum(spark, sf_dir):
    """U3 × A10 — mixed-resolution splice: the cold half of the range
    is served from the hourly rollup table, the hot half from raw
    points, unioned at the daily-bucket grid.  Oracle is the flat
    raw-point computation, proving tier routing is value-invisible."""
    from opentsdb_aura_spark.operators.rollup import downsample_spliced

    res = downsample_spliced(
        points(spark, sf_dir),
        _rollup(spark, sf_dir),
        3600,
        START,
        END,
        START + 15 * DAY,
        DAY,
        "sum",
        group_cols=["metric"],
    )
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("spliced_sum"))


@register(
    "topn_metrics_by_sum",
    f"""{ORACLE_PTS},
daily AS (
  SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS sv
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2
),
top3 AS (
  SELECT metric FROM daily GROUP BY metric
  ORDER BY sum(sv) DESC, metric LIMIT 3
)
SELECT d.metric, d.bucket_ts, round(d.sv, 4) AS sum_value
FROM daily d JOIN top3 USING (metric)""",
)
def topn_metrics_by_sum(spark, sf_dir):
    """topn node (OpenTSDB 3.x upstream): rank series by the SUM
    summary of their daily values, keep the top 3, return their full
    interval rows."""
    from opentsdb_aura_spark.operators.summarizer import topn

    daily = downsample(points(spark, sf_dir), START, END, DAY, "sum", group_cols=["metric"], fill="none")
    keep = topn(daily, 3, "sum", group_cols=["metric"])
    return keep.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "topn_other_bucket",
    f"""{ORACLE_PTS},
daily AS (
  SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS sv
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2
),
top2 AS (
  SELECT metric FROM daily GROUP BY metric
  ORDER BY sum(sv) DESC, metric LIMIT 2
)
SELECT d.metric, d.bucket_ts, round(d.sv, 4) AS sum_value
FROM daily d JOIN top2 USING (metric)
UNION ALL
SELECT '__other__' AS metric, d.bucket_ts, round(sum(d.sv), 4) AS sum_value
FROM daily d ANTI JOIN top2 USING (metric)
GROUP BY 2""",
)
def topn_other_bucket(spark, sf_dir):
    """topn with the dashboard "other" bucket: top-2 metrics keep
    their rows, all remaining metrics fold into one synthetic
    '__other__' series per bucket — the chart accounts for 100% of
    the data with k+1 series."""
    from opentsdb_aura_spark.operators.summarizer import topn_with_other

    daily = downsample(points(spark, sf_dir), START, END, DAY, "sum", group_cols=["metric"], fill="none")
    res = topn_with_other(daily, 2, "sum", group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


# ============================================================ fused pipeline + extras


@register(
    "fused_rate_ds_gb",
    f"""{ORACLE_PTS},
rated AS (
  SELECT tag_user, tag_k, ts,
         (value - lag(value) OVER w) / (((ts - lag(ts) OVER w)) / 3600.0) AS r
  FROM dpts
  WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY ts)),
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, avg(r) AS v
  FROM rated WHERE r IS NOT NULL GROUP BY 1, 2, 3)
SELECT tag_user, bucket_ts, round(avg(v), 6) AS avg_rate
FROM per_series GROUP BY 1, 2""",
)
def fused_rate_ds_gb(spark, sf_dir):
    """§3.1 full pipeline: filter → rate → per-series daily AVG →
    group-by-user AVG merge (the flagship entry() query, with oracle)."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        rate_options=RateOptions(interval_seconds=3600),
        group_tag_keys=["user"],
        gb_agg="avg",
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    # the engine emits NaN group-intervals (all contributing rates
    # NaN); the SQL oracle can't express the NaN contract, so the
    # oracle-facing projection keeps defined intervals only
    return res.where(~F.isnan("value")).select(
        "tag_user", "bucket_ts", _r(F.col("value"), 6).alias("avg_rate")
    )


@register(
    "gb_two_keys_daily",
    f"""{ORACLE_PTS}
SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2, 3""",
)
def gb_two_keys_daily(spark, sf_dir):
    """G1 — group-by on two tag keys (sum decomposes flat)."""
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="sum",
        group_tag_keys=["user", "k"], gb_agg="sum", fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "meta_keys_and_values",
    f"""{ORACLE_PTS},
kv AS (
  SELECT 'user' AS tag_key, tag_user AS tag_value FROM series
  UNION ALL
  SELECT 'k' AS tag_key, tag_k AS tag_value FROM series)
SELECT tag_key, tag_value, CAST(count(*) AS BIGINT) AS series_count
FROM kv GROUP BY 1, 2""",
)
def meta_keys_and_values(spark, sf_dir):
    """M3 — full key→value→series-count breakdown (BASIC meta query)."""
    from opentsdb_aura_spark.operators.meta import tag_keys_and_values

    return tag_keys_and_values(series_dim(spark, sf_dir)).select(
        "tag_key", "tag_value", F.col("series_count").cast("bigint").alias("series_count")
    )


@register(
    "ev_paging_offset",
    """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_type
FROM events ORDER BY ts DESC, event_id DESC LIMIT 20 OFFSET 30""",
)
def ev_paging_offset(spark, sf_dir):
    """L2 — from/size paging (offset into the newest-first order)."""
    ev = events_seconds(spark, sf_dir)
    return top_n(ev, 20, offset=30).select("event_id", "ts", "event_type")


@register(
    "text_bpe_token_count",
    """SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents""",
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish token counting via an RE2-safe word-piece regex."""
    from opentsdb_aura_spark.operators.text import bpe_ish_token_count

    return bpe_ish_token_count(docs(spark, sf_dir))


@register("text_fingerprint")  # xxhash-chained: rows-only check
def text_fingerprint(spark, sf_dir):
    """Order-sensitive 64-bit document fingerprint (rolling-hash
    analogue, Catalyst-only)."""
    from opentsdb_aura_spark.operators.text import fingerprint

    return fingerprint(docs(spark, sf_dir))


@register(
    "infectious_nan_sum_daily",
    f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts,
       round(CASE WHEN count(CASE WHEN value < 20 THEN 1 END) > 0
                  THEN NULL ELSE sum(value) END, 4) AS sum_value
FROM dpts WHERE ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def infectious_nan_sum_daily(spark, sf_dir):
    """A9 — infectious NaN: values < 20 are recast as NaN on both
    sides; any NaN in an interval poisons it (NULL in the oracle
    projection).  Exercises the infectious path against real data."""
    pts = points(spark, sf_dir).withColumn(
        "value", F.when(F.col("value") < 20, F.lit(float("nan"))).otherwise(F.col("value"))
    )
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], infectious_nan=True, fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "filter_any_field",
    f"""{ORACLE_PTS}
SELECT metric, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE (regexp_matches(tag_user, '^1$') OR regexp_matches(tag_k, '^1$'))
  AND ts >= {START} AND ts < {END}
GROUP BY 1""",
)
def filter_any_field(spark, sf_dir):
    """F6 — any-field match: value regex against EVERY tag key."""
    from opentsdb_aura_spark.filters import AnyFieldRegexp, compile_filter, time_range

    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(AnyFieldRegexp("^1$")) & time_range(START, END))
    return df.groupBy("metric").agg(F.count("*").cast("bigint").alias("n_points"))


@register(
    "filter_tag_key_present",
    f"""{ORACLE_PTS}
SELECT metric, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE tag_k IS NOT NULL AND ts >= {START} AND ts < {END}
GROUP BY 1""",
)
def filter_tag_key_present(spark, sf_dir):
    """F5 — tag-key presence: series carrying tag key 'k' at all
    (value irrelevant) — the reference's key-existence filter."""
    from opentsdb_aura_spark.filters import TagKeyPresent, compile_filter, time_range

    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(TagKeyPresent("k")) & time_range(START, END))
    return df.groupBy("metric").agg(F.count("*").cast("bigint").alias("n_points"))


@register(
    "filter_match_all_series_count",
    f"""{ORACLE_PTS}
SELECT CAST(count(*) AS BIGINT) AS n_series FROM series""",
)
def filter_match_all_series_count(spark, sf_dir):
    """F9 — match-all: the wildcard-everything filter through the meta
    path counts every series (the `.*` fast path compiles to `true`,
    no regex evaluation)."""
    from opentsdb_aura_spark.filters import MatchAll, compile_filter

    dim = series_dim(spark, sf_dir).where(compile_filter(MatchAll()))
    return dim.agg(F.count("*").cast("bigint").alias("n_series"))


@register(
    "filter_explicit_tags",
    f"""{ORACLE_PTS}
SELECT metric, tag_user, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE tag_user = '1' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def filter_explicit_tags(spark, sf_dir):
    """F8 — explicit-tags: filter on {user, k} requires series with
    exactly those two tag keys — which is every series here, so the
    result equals the plain filter (the count gate is exercised; its
    exclusion path is covered by unit tests)."""
    from opentsdb_aura_spark.filters import (
        Chain,
        ExplicitTags,
        TagLiteralOr,
        TagRegexp,
        compile_filter,
        time_range,
    )

    flt = ExplicitTags(Chain("AND", [TagLiteralOr("user", ("1",)), TagRegexp("k", ".*")]))
    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(flt) & time_range(START, END))
    return df.groupBy("metric", "tag_user").agg(F.count("*").cast("bigint").alias("n_points"))


@register(
    "semi_join_series_points",
    f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts
WHERE metric = 'purchase' AND CAST(tag_user AS BIGINT) < 5
  AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def semi_join_series_points(spark, sf_dir):
    """J1 — meta→data semi-join: series selected on the dimension
    table, then a left_semi join restricts the fact scan to those
    series ids (the doc-store search → series-table lookup fusion,
    TimeSeriesShard.java:677-758)."""
    sd = series_dim(spark, sf_dir).where(
        (F.col("metric") == "purchase") & (F.col("tags")["user"].cast("bigint") < 5)
    )
    pts = points(spark, sf_dir).join(
        sd.select("series_id"), "series_id", "left_semi"
    )
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "tpch_simple_filter_agg",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def tpch_simple_filter_agg(spark, sf_dir):
    """Relational health: TPC-H Q6-style selective filter + agg (all
    predicates push to the scan)."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


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


@register(
    "tpch_local_supplier_volume",
    """SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY 1""",
)
def tpch_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: five-way join with the local-supplier condition
    (customer and supplier in the same nation).  Only the fixed-size
    dims (nation, region) carry broadcast hints; customer/supplier/
    orders are O(SF) and left to AQE sizing.  The region filter
    reaches the nation join before any fact row is touched."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "tpch_semi_join_orders",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY 1""",
)
def tpch_semi_join_orders(spark, sf_dir):
    """Relational health: EXISTS → left_semi join."""
    ensure_session_confs(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_anti_join_customers",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1""",
)
def tpch_anti_join_customers(spark, sf_dir):
    """Relational health: NOT EXISTS → left_anti join (customers who
    never ordered)."""
    ensure_session_confs(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "tpch_promo_revenue",
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                    / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'""",
)
def tpch_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: selective fact filter, join to the part dim,
    conditional-aggregate ratio in one pass.  The month filter pushes
    to the lineitem scan; part is O(SF) so no forced broadcast — AQE
    size-picks (broadcast at bench SF)."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        _r(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
    )


@register(
    "tpch_large_orders",
    """SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total_price,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY 1 HAVING sum(l_quantity) > 300)
GROUP BY 1, 2, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20""",
)
def tpch_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate subquery (orders whose line quantities
    sum past a threshold) feeding a semi-join, then re-aggregate and
    top-20.  The HAVING pre-aggregate shrinks the fact table to a few
    keys before any dimension is touched; the final ordering is a
    TakeOrderedAndProject, not a global sort."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_q")).where(F.col("_q") > 300)
    return (
        li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(_r(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("c_name", "o_orderkey", _r("o_totalprice", 2).alias("total_price"), "total_qty")
    )


@register(
    "tpch_returned_items",
    """SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY 1, 2, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def tpch_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most last quarter — two fact
    filters (return flag on lineitem, quarter on orders) both push to
    their scans before the joins; top-20 via TakeOrderedAndProject."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(F.col("l_returnflag") == "R")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", _r("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "tpch_late_orders_priority",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1""",
)
def tpch_late_orders_priority(spark, sf_dir):
    """TPC-H Q4 shape (adapted: the driver's lineitem has no
    commit/receipt dates, so "late" = shipped >60 days after the order
    date): correlated EXISTS with a cross-table predicate → left_semi
    join carrying the inequality in the join condition; counts per
    priority after."""
    ensure_session_confs(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_order_count_distribution",
    """WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY 1""",
)
def tpch_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: per-customer order counts via a LEFT join (zero
    orders must count), then the distribution of those counts — an
    aggregate of an aggregate, two well-combined shuffles."""
    ensure_session_confs(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_small_quantity_revenue",
    """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)""",
)
def tpch_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) de-correlated into an aggregate + equi-join — the
    per-part averages frame is O(|part|), so AQE broadcast-picks it;
    the brand filter prunes the part dim before the fact join."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").where(F.col("p_brand") == "Brand#23")
    avg_q = li.groupBy("l_partkey").agg((F.lit(0.2) * F.avg("l_quantity")).alias("_thr"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_q.withColumnRenamed("l_partkey", "_pk"), F.col("l_partkey") == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("_thr"))
        .agg(_r(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "tpch_disjunctive_filter",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
)
def tpch_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive cross-table predicates.  The
    single-table residues of the OR (quantity ∈ [1,30]; brand ∈ the
    three literals) are stated explicitly so each reaches its own scan
    as a pushed filter — Catalyst does not factor disjunctions across
    a join on its own, and at 100 TB the unpushed variant reads every
    lineitem row."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "tpch_idle_rich_customers",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1""",
)
def tpch_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average
    balance — a 1-row broadcast) gating an anti-join against the
    RECENT order log (customers idle since 2000; the date filter
    pushes to the orders scan before the anti-join, shrinking its
    build side the way Q22's window does)."""
    ensure_session_confs(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            _r(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "dedup_embedding_cosine",
    """WITH s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.embedding)+1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))) AS cs
  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cs, 6) AS cos_sim FROM s WHERE cs >= 0.45""",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs baseline; the
    LSH variant is the scale path, unit-tested)."""
    from opentsdb_aura_spark.operators.similarity import embedding_near_dup_pairs

    res = embedding_near_dup_pairs(embs(spark, sf_dir), threshold=0.45)
    return res.select("id_a", "id_b", _r(F.col("cos_sim"), 6).alias("cos_sim"))


_PROJ_COMPONENT = (
    "round(list_sum(list_transform(range(0, 64), d -> CAST(embedding[d + 1] AS DOUBLE)"
    " * ((CAST(concat('0x', substr(md5(d || ':' || {k} || ':proj'), 1, 8)) AS BIGINT)"
    " % 2001 - 1000) / 1000.0))), 6) AS p{k}"
)


@register(
    "emb_random_projection",
    "SELECT vec_id, "
    + ", ".join(_PROJ_COMPONENT.format(k=k) for k in range(8))
    + " FROM embeddings",
)
def emb_random_projection(spark, sf_dir):
    """JL-style 64→8-d random projection with an md5-derived
    deterministic matrix — the ANN pre-filter that cuts probe shuffle
    bytes 8×.  Pure zip_with/aggregate folds (whole-stage codegen, no
    UDF, narrow map); the oracle regenerates the same matrix from the
    md5 rule."""
    from opentsdb_aura_spark.operators.similarity import random_projection

    res = random_projection(embs(spark, sf_dir), in_dim=64, out_dim=8)
    return res.select("vec_id", *[_r(f"p{k}", 6).alias(f"p{k}") for k in range(8)])


@register(
    "emb_int8_quantize",
    """WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
         embedding
  FROM embeddings),
z AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)
                                            AS INT))
         END AS qv
  FROM q)
SELECT vec_id, round(scale, 6) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS INT) AS q_min,
       CAST(list_max(qv) AS INT) AS q_max
FROM z""",
)
def emb_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization (scale = max|v|,
    floor(x+0.5) rounding — engine-agnostic): 4× smaller vectors for
    billion-scale ANN storage; the oracle checks the exact quantized
    stream via sum/min/max."""
    from opentsdb_aura_spark.operators.similarity import int8_quantize

    res = int8_quantize(embs(spark, sf_dir))
    return res.select(
        "vec_id",
        _r("scale", 6).alias("scale"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


@register(
    "semdedup_embeddings",
    """WITH dup AS (
  SELECT a.vec_id, min(b.vec_id) AS dup_of
  FROM embeddings a JOIN embeddings b ON b.vec_id < a.vec_id
  WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
           * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))) >= 0.45
  GROUP BY 1)
SELECT e.vec_id, dup.dup_of IS NULL AS kept, CAST(0 AS INT) AS cluster_id, dup.dup_of
FROM embeddings e LEFT JOIN dup ON e.vec_id = dup.vec_id""",
)
def semdedup_embeddings(spark, sf_dir):
    """SemDeDup semantic dedup (greedy keep-lowest-id within cluster).
    Run with a single centroid the within-cluster scoring covers every
    pair, so the exact SQL self-join is a true oracle — the same trick
    as `ann_ivf_topk`'s full probe; production raises n_centroids so
    per-cluster pair work stays (n/k)²."""
    from opentsdb_aura_spark.operators.similarity import semantic_dedup

    return semantic_dedup(embs(spark, sf_dir), threshold=0.45, n_centroids=1)


@register(
    "opentsdb_json_query",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(max(value), 4) AS max_value
FROM dpts
WHERE metric = 'purchase' AND tag_user IN ('1', '2', '3')
  AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def opentsdb_json_query(spark, sf_dir):
    """API-surface parity: an OpenTSDB 3.x semantic-query JSON graph
    translated and executed unchanged (source + filter + downsample +
    group-by pushdown fold, §3.1)."""
    from opentsdb_aura_spark.plans.opentsdb_json import translate_query

    query = {
        "start": START,
        "end": END,
        "filters": [
            {"id": "f1", "filter": {"type": "TagValueLiteralOr", "tagKey": "user", "filter": "1|2|3"}}
        ],
        "executionGraph": [
            {
                "id": "m1",
                "type": "TimeSeriesDataSource",
                "metric": {"type": "MetricLiteral", "metric": "purchase"},
                "filterId": "f1",
            },
            {"id": "ds", "type": "downsample", "aggregator": "max", "interval": "1d", "sources": ["m1"]},
            {"id": "gb", "type": "groupby", "aggregator": "max", "tagKeys": ["user"], "sources": ["ds"]},
        ],
    }
    q = translate_query(query, now=END, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    q.fill = "none"
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("max_value"))


@register(
    "opentsdb_json_expr",
    f"""{ORACLE_PTS},
p AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
s AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'signup' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
diff AS (SELECT COALESCE(p.tag_user, s.tag_user) AS tag_user, p.v - s.v AS d
         FROM p FULL JOIN s ON p.tag_user = s.tag_user AND p.bucket_ts = s.bucket_ts)
SELECT tag_user, round(avg(d), 6) AS avg_value, CAST(count(d) AS DOUBLE) AS count_value
FROM diff GROUP BY 1""",
)
def opentsdb_json_expr(spark, sf_dir):
    """API-surface parity for expression+summarizer graphs: a
    reference-era JSON DAG — two grouped branches, an expression node
    (NATURAL_OUTER join, purchase − signup) and a summarizer sink —
    runs unchanged through run_semantic_graph.  A user-day present on
    one side only is NaN and skipped by the summarizer, matching the
    SQL NULL arithmetic."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    graph = {
        "start": START,
        "end": END,
        "executionGraph": [
            {"id": "p_src", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "purchase"}},
            {"id": "s_src", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "signup"}},
            {"id": "p_ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["p_src"]},
            {"id": "s_ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["s_src"]},
            {"id": "p", "type": "groupby", "tagKeys": ["user"], "aggregator": "sum", "sources": ["p_ds"]},
            {"id": "s", "type": "groupby", "tagKeys": ["user"], "aggregator": "sum", "sources": ["s_ds"]},
            {"id": "e", "type": "expression", "expression": "p - s", "sources": ["p", "s"]},
            {"id": "sm", "type": "summarizer", "summaries": ["avg", "count"], "sources": ["e"]},
        ],
    }
    res = run_semantic_graph(points(spark, sf_dir), graph, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    return res.select(
        "tag_user",
        _r(denan(F.col("avg")), 6).alias("avg_value"),
        F.col("count").alias("count_value"),
    )


@register(
    "opentsdb_json_topn",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
winners AS (SELECT tag_user FROM agg GROUP BY 1
            ORDER BY sum(v) DESC, tag_user LIMIT 5),
days AS (SELECT unnest(generate_series({START}, {END - 1}, {DAY})) AS bucket_ts)
SELECT w.tag_user, d.bucket_ts, round(agg.v, 4) AS sum_value
FROM winners w CROSS JOIN days d
LEFT JOIN agg ON agg.tag_user = w.tag_user AND agg.bucket_ts = d.bucket_ts""",
)
def opentsdb_json_topn(spark, sf_dir):
    """API-surface parity for the upstream ``topn`` node: JSON graph
    source → daily SUM downsample → group-by user → top-5 users by
    total, returning the winners' full (dense NaN-spine) series."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    graph = {
        "start": START,
        "end": END,
        "executionGraph": [
            {"id": "m", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "purchase"}},
            {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["m"]},
            {"id": "gb", "type": "groupby", "tagKeys": ["user"], "aggregator": "sum", "sources": ["ds"]},
            {"id": "top", "type": "topn", "count": 5, "top": True, "aggregator": "sum", "sources": ["gb"]},
        ],
    }
    res = run_semantic_graph(points(spark, sf_dir), graph, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "gb_min_by_k_daily",
    f"""{ORACLE_PTS},
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, min(value) AS v
  FROM dpts WHERE metric = 'error' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3)
SELECT tag_k, bucket_ts, round(min(v), 4) AS min_value
FROM per_series GROUP BY 1, 2""",
)
def gb_min_by_k_daily(spark, sf_dir):
    """G1 — group-by on the k tag with MIN○MIN merge."""
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="min",
        filter=MetricLiteral("error"), group_tag_keys=["k"], gb_agg="min", fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("min_value"))


@register(
    "ev_user_activity",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value,
       arg_max(event_type, CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id) AS last_type
FROM events GROUP BY 1""",
)
def ev_user_activity(spark, sf_dir):
    """E5 variant — per-user activity rollup with fetch-last type."""
    ev = events_seconds(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        _r(F.sum("value"), 4).alias("total_value"),
        F.max_by("event_type", F.col("ts") * 1000000 + F.col("event_id")).alias("last_type"),
    )


@register(
    "ev_wau_rolling",
    f"""WITH ud AS (
  SELECT DISTINCT
         (CAST(floor(epoch(ts)) AS BIGINT) - {START - 6 * DAY}) // 86400 - 6 AS d,
         user_id
  FROM events
  WHERE epoch(ts) >= {START - 6 * DAY} AND epoch(ts) < {START + 14 * DAY}),
days AS (SELECT range AS o FROM range(0, 14))
SELECT CAST({START} + o * 86400 AS BIGINT) AS day_ts,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM days JOIN ud ON ud.d BETWEEN o - 6 AND o
GROUP BY 1 ORDER BY 1""",
)
def ev_wau_rolling(spark, sf_dir):
    """Rolling 7-day active users (WAU) per day, exact: events dedupe
    to (day, user) FIRST — the distinct frame is |users × days|,
    orders smaller than the log — then each user-day explodes to the
    ≤7 output days it serves (a bounded fan-out, no range self-join,
    no skewable nested loop) and a distinct count per day finishes.
    The sketch twin is ev_wau_hll."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    ev = events_seconds(spark, sf_dir)
    res = rolling_active_users(ev, START, START + 14 * DAY, 7)
    return res.select("day_ts", F.col("active_users").cast("bigint").alias("active_users"))


@register(
    "ev_stickiness_daily",
    f"""WITH ud AS (
  SELECT DISTINCT
         (CAST(floor(epoch(ts)) AS BIGINT) - {START - 6 * DAY}) // 86400 - 6 AS d,
         user_id
  FROM events
  WHERE epoch(ts) >= {START - 6 * DAY} AND epoch(ts) < {START + 14 * DAY}),
days AS (SELECT range AS o FROM range(0, 14)),
wau AS (SELECT o, count(DISTINCT user_id) AS w
        FROM days JOIN ud ON ud.d BETWEEN o - 6 AND o GROUP BY 1),
dau AS (SELECT d AS o, count(DISTINCT user_id) AS a FROM ud WHERE d >= 0 GROUP BY 1)
SELECT CAST({START} + wau.o * 86400 AS BIGINT) AS day_ts,
       CAST(coalesce(dau.a, 0) AS BIGINT) AS dau,
       CAST(wau.w AS BIGINT) AS wau,
       round(coalesce(dau.a, 0) * 1.0 / wau.w, 6) AS stickiness
FROM wau LEFT JOIN dau USING (o) ORDER BY 1""",
)
def ev_stickiness_daily(spark, sf_dir):
    """Stickiness (DAU/WAU) per day — the engagement ratio every
    product dashboard plots; both counts come from the same
    dedupe-to-user-day frame (rolling_active_users' shape), joined on
    the day."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    ev = events_seconds(spark, sf_dir)
    wau = rolling_active_users(ev, START, START + 14 * DAY, 7).withColumnRenamed(
        "active_users", "wau"
    )
    dau = rolling_active_users(ev, START, START + 14 * DAY, 1).withColumnRenamed(
        "active_users", "dau"
    )
    return (
        wau.join(dau, "day_ts", "left")
        .select(
            "day_ts",
            F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            _r(F.coalesce(F.col("dau"), F.lit(0)) / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day_ts")
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


@register(
    "ev_funnel_3step",
    f"""WITH e AS (SELECT user_id AS k, event_type AS t,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
s1 AS (SELECT k, min(ts) AS ts_1 FROM e WHERE t = 'signup' GROUP BY 1),
s2 AS (SELECT s1.k, ts_1,
              min(e.ts) FILTER (WHERE e.ts > ts_1 AND e.ts <= ts_1 + {3 * DAY}) AS ts_2
       FROM s1 LEFT JOIN e ON e.k = s1.k AND e.t = 'click' GROUP BY 1, 2),
s3 AS (SELECT s2.k, ts_1, ts_2,
              min(e.ts) FILTER (WHERE ts_2 IS NOT NULL AND e.ts > ts_2
                                AND e.ts <= ts_2 + {3 * DAY}) AS ts_3
       FROM s2 LEFT JOIN e ON e.k = s2.k AND e.t = 'purchase' GROUP BY 1, 2, 3)
SELECT k AS user_id, ts_1, ts_2, ts_3, ts_3 IS NOT NULL AS converted,
       CAST(ts_3 - ts_1 AS BIGINT) AS seconds_total FROM s3""",
)
def ev_funnel_3step(spark, sf_dir):
    """N-step ordered funnel (signup → click → purchase, each step
    within 3 days of the previous): greedy earliest-completion, one
    equi-join + filtered-min aggregate per step
    (events.funnel_steps) — no per-key event collection, no whole-
    history window, so a bot key cannot break the stage."""
    from opentsdb_aura_spark.operators.events import funnel_steps

    ev = events_seconds(spark, sf_dir)
    return funnel_steps(ev, ["signup", "click", "purchase"], 3 * DAY)


@register(
    "ev_cohort_retention_daily",
    """WITH a AS (
  SELECT DISTINCT user_id AS k,
         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS b
  FROM events),
f AS (SELECT k, min(b) AS cohort_ts FROM a GROUP BY 1),
cells AS (
  SELECT f.cohort_ts, (a.b - f.cohort_ts) // 86400 AS day_offset,
         CAST(count(DISTINCT a.k) AS BIGINT) AS n_active
  FROM a JOIN f USING (k) GROUP BY 1, 2)
SELECT cohort_ts, day_offset, n_active,
       max(CASE WHEN day_offset = 0 THEN n_active END) OVER (PARTITION BY cohort_ts) AS n_cohort,
       round(n_active * 1.0 / max(CASE WHEN day_offset = 0 THEN n_active END)
             OVER (PARTITION BY cohort_ts), 6) AS retention
FROM cells""",
)
def ev_cohort_retention_daily(spark, sf_dir):
    """Cohort retention matrix: users cohorted by first-activity day;
    each (cohort, day-offset) cell reports active members and the
    retention rate — the third leg of the event-analytics triad next
    to sessionization and funnels."""
    from opentsdb_aura_spark.operators.events import cohort_retention

    ev = events_seconds(spark, sf_dir).select("user_id", "ts")
    return cohort_retention(ev, 86400)


@register(
    "ev_funnel_signup_purchase",
    """WITH e AS (
  SELECT user_id AS k, event_type AS t, CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
f AS (SELECT k, ts FROM e WHERE t = 'signup'),
tt AS (SELECT k, ts FROM e WHERE t = 'purchase'),
m AS (SELECT tt.k, tt.ts,
             CASE WHEN f.ts IS NOT NULL AND tt.ts > f.ts AND tt.ts - f.ts <= 86400
                  THEN f.ts END AS valid_fts
      FROM tt ASOF LEFT JOIN f ON tt.k = f.k AND tt.ts >= f.ts),
conv AS (SELECT k, min(ts) AS convert_ts, arg_min(valid_fts, ts) AS matched_from_ts
         FROM m WHERE valid_fts IS NOT NULL GROUP BY 1),
ff AS (SELECT k, min(ts) AS first_from_ts FROM f GROUP BY 1)
SELECT ff.k AS user_id, ff.first_from_ts,
       conv.convert_ts IS NOT NULL AS converted, conv.convert_ts,
       CAST(conv.convert_ts - conv.matched_from_ts AS BIGINT) AS seconds_to_convert
FROM ff LEFT JOIN conv USING (k)""",
)
def ev_funnel_signup_purchase(spark, sf_dir):
    """Two-step funnel: per user, did a purchase follow a signup
    within 24 h?  Backward as-of join (one running-last window per
    user — no range join) + one aggregate; the oracle uses DuckDB's
    native ASOF JOIN."""
    from opentsdb_aura_spark.operators.events import funnel_conversion

    ev = events_seconds(spark, sf_dir).select("user_id", "event_type", "ts")
    return funnel_conversion(ev, "signup", "purchase", 86400)


@register(
    "ev_sessionize_users",
    """WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_id FROM events),
l AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS nf
  FROM e),
s AS (
  SELECT user_id, ts,
         sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM l)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY 1, 2""",
)
def ev_sessionize_users(spark, sf_dir):
    """Gap-based sessionization (30-min timeout) over the event store:
    one row per (user, session) with bounds and event count.  Runs the
    hot-key-bounded two-phase path (per-(user, day-block) local
    sessions + interval-merge stitch): window tasks stay bounded even
    for a bot user with 10⁸ events, and the result is identical to the
    classic single-window shape (equivalence asserted in tests)."""
    from opentsdb_aura_spark.operators.events import sessionize

    ev = events_seconds(spark, sf_dir).select("user_id", "ts", "event_id")
    return sessionize(ev, 1800, key_col="user_id", block_seconds=DAY).select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        "session_start",
        "session_end",
        "n_events",
    )


@register(
    "anomaly_zscore_daily",
    f"""{ORACLE_PTS},
agg AS (
  SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS sum_value
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2)
SELECT metric, bucket_ts, round(sum_value, 4) AS sum_value,
       round(CASE WHEN count(sum_value) OVER w >= 3
                   AND stddev_samp(sum_value) OVER w > 0
             THEN (sum_value - avg(sum_value) OVER w) / stddev_samp(sum_value) OVER w
             END, 6) AS zscore
FROM agg
WINDOW w AS (PARTITION BY metric ORDER BY bucket_ts ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)""",
)
def anomaly_zscore_daily(spark, sf_dir):
    """Trailing-window anomaly scoring: each daily bucket's sum scored
    against the mean/stddev of its previous 7 buckets (current
    excluded) — the Spark-first baseline of the upstream 3.x anomaly
    processors (observed vs expected from recent history).  The window
    runs over the already-downsampled result, so its state is 7 rows
    per metric regardless of raw volume."""
    from opentsdb_aura_spark.operators.analytic import rolling_zscore

    pts = points(spark, sf_dir)
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    out = rolling_zscore(res, lookback=7, min_history=3, group_cols=["metric"])
    return out.select(
        "metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"), _r("zscore", 6).alias("zscore")
    )


@register(
    "anomaly_seasonal_hourly",
    f"""{ORACLE_PTS},
agg AS (
  SELECT metric, {_bucket_sql(HOUR)} AS bucket_ts, sum(value) AS v
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2)
SELECT a.metric, a.bucket_ts,
       round(a.v, 4) AS sum_value,
       round(b.v, 4) AS baseline,
       round(a.v - b.v, 4) AS deviation
FROM agg a LEFT JOIN agg b
  ON b.metric = a.metric AND b.bucket_ts = a.bucket_ts - {DAY}""",
)
def anomaly_seasonal_hourly(spark, sf_dir):
    """Seasonal anomaly baseline: each hourly bucket vs the SAME hour
    one day earlier — the periodic complement of the trailing z-score
    (for a daily-cycled metric the previous 7 hours are the wrong
    expectation).  Equi-self-join on (metric, bucket − 1d), not a
    per-series lag window: shuffles on the composite key, so no
    per-series sort task and no hot-series straggler."""
    from opentsdb_aura_spark.operators.analytic import seasonal_baseline_deviation

    pts = points(spark, sf_dir)
    res = downsample(pts, START, END, HOUR, "sum", group_cols=["metric"], fill="none")
    out = seasonal_baseline_deviation(res, DAY, group_cols=["metric"])
    return out.select(
        "metric",
        "bucket_ts",
        _r(denan(F.col("value")), 4).alias("sum_value"),
        _r("baseline", 4).alias("baseline"),
        _r("deviation", 4).alias("deviation"),
    )


@register(
    "corpus_bm25_search",
    r"""WITH toked AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '')) AS token
  FROM documents),
lengths AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toked GROUP BY 1),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lengths),
tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
       FROM toked WHERE token IN ('data', 'model', 'training') GROUP BY 1, 2),
dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * 2.2 / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)))) AS score
  FROM tf t JOIN dfreq d USING (token) JOIN lengths l USING (doc_id) CROSS JOIN stats s
  GROUP BY 1)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10""",
)
def corpus_bm25_search(spark, sf_dir):
    """Ranked full-text retrieval: BM25 top-10 for a fixed query bag —
    the ranked complement of the boolean E1 text match, entirely as
    aggregates (filtered explode → tf/df/length joins → top-k)."""
    from opentsdb_aura_spark.operators.text import bm25_search

    res = bm25_search(docs_raw(spark, sf_dir), ["data", "model", "training"], k=10)
    return res.select("doc_id", _r("score", 6).alias("score"))


@register(
    "corpus_source_report",
    r"""SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> ''))) AS BIGINT) AS total_tokens,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dup_docs
FROM documents GROUP BY 1""",
)
def corpus_source_report(spark, sf_dir):
    """Dataset-card report per source domain: doc/token volume, size,
    language spread, and exact-duplicate load — the summary table every
    training-data curation run publishes.  One hash aggregate over the
    corpus; the token count is a narrow map."""
    d = docs_raw(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        _r(F.avg("n_chars"), 4).alias("avg_chars"),
        F.count_distinct("lang").alias("n_langs"),
        (F.count("*") - F.count_distinct(F.md5("text"))).alias("n_exact_dup_docs"),
    )


@register(
    "pipeline_token_budget",
    r"""WITH c AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '')) AS BIGINT) AS n_tokens
  FROM documents),
r AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM c)
SELECT doc_id, source, n_tokens, cum_tokens FROM r WHERE cum_tokens <= 5000""",
)
def pipeline_token_budget(spark, sf_dir):
    """Greedy per-domain doc selection under a 5 000-token budget —
    training mixes are specified in tokens, not document counts.  One
    window per domain (single shuffle), no global sort, no driver
    loop."""
    from opentsdb_aura_spark.operators.corpus import token_budget_sample

    return token_budget_sample(docs_raw(spark, sf_dir), 5000, domain_col="source")


@register(
    "pipeline_curate_corpus",
    """WITH u AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents),
kept AS (SELECT doc_id, source, n_chars FROM u WHERE rn = 1 AND n_chars >= 100),
r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
  FROM kept)
SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5""",
)
def pipeline_curate_corpus(spark, sf_dir):
    """End-to-end curation COMPOSITION: exact dedup (keep lowest id
    per content hash) → quality bar (n_chars ≥ 100) → per-domain
    diversity cap (best 5) — three pipeline operators chained the way
    a real corpus build chains them; one query plan, no
    materialization between stages."""
    from opentsdb_aura_spark.operators.corpus import cap_per_domain
    from pyspark.sql.window import Window

    d = docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = (
        d.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("n_chars") >= 100))
        .select("doc_id", "source", "n_chars")
    )
    return cap_per_domain(survivors, 5)


@register(
    "pipeline_global_shuffle",
    """SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) - 1
            AS BIGINT) AS shuffle_pos
FROM documents""",
)
def pipeline_global_shuffle(spark, sf_dir):
    """Deterministic pseudo-random global training order WITHOUT a
    single-partition window: md5 order key + distributed prefix-sum
    rank (4096 hex-prefix blocks → exclusive cumsum → bounded
    within-block row_number).  The oracle is the naive global
    ``row_number() OVER (ORDER BY md5)`` — equality proves the
    blocked rank IS the global rank."""
    from opentsdb_aura_spark.operators.corpus import global_shuffle

    return global_shuffle(docs(spark, sf_dir), seed="42")


@register(
    "pipeline_domain_cap",
    """WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 7""",
)
def pipeline_domain_cap(spark, sf_dir):
    """Diversity capping: at most 7 docs per source, best (longest)
    first — two-phase hot-key-bounded top-k (per input-partition rank,
    then rank the survivors), so a mega-domain never forms one giant
    sort task.  Oracle is the naive one-shot window."""
    from opentsdb_aura_spark.operators.corpus import cap_per_domain

    return cap_per_domain(docs(spark, sf_dir), 7)


@register(
    "pipeline_dsir_weights",
    r"""WITH w AS (
  SELECT doc_id, source, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS t
  FROM documents),
g AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM w),
b AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(gram || ':dsir'), 1, 8)) AS BIGINT) % 1024 AS bucket
  FROM g),
pb AS (SELECT bucket, count(*) AS rn,
              sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS tn
       FROM b GROUP BY 1),
tot AS (SELECT count(*) AS rt,
               sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS tt
        FROM b),
lr AS (SELECT bucket,
              ln((tn + 1.0) / (tt + 1024.0)) - ln((rn + 1.0) / (rt + 1024.0)) AS logr
       FROM pb CROSS JOIN tot)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_grams, round(sum(lr.logr), 6) AS weight
FROM b JOIN lr USING (bucket) GROUP BY 1""",
)
def pipeline_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights toward the 'src3' domain: hashed
    bigram buckets (md5 — engine-reproducible), add-one-smoothed
    log-likelihood ratio of target vs corpus bucket distributions,
    summed per doc.  Pure Catalyst: one explode, two bounded
    aggregates, AQE-broadcast log-ratio join."""
    from opentsdb_aura_spark.operators.corpus import dsir_weights

    res = dsir_weights(docs(spark, sf_dir), "src3")
    return res.select("doc_id", "n_grams", _r(F.col("weight"), 6).alias("weight"))


@register(
    "text_normalize_docs",
    r"""WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                             '\s+', ' ', 'g')) AS norm
  FROM documents)
SELECT doc_id, CAST(strlen(norm) AS BIGINT) AS n_chars_norm, md5(norm) AS norm_md5
FROM n""",
)
def text_normalize_docs(spark, sf_dir):
    """Curation-grade text normalization (lowercase, punctuation →
    space, whitespace collapse) proven BYTE-IDENTICAL cross-engine via
    md5 of the normalized text — the property that matters when a
    dedup key is derived from normalized content."""
    from opentsdb_aura_spark.operators.corpus import normalize_text

    d = docs(spark, sf_dir)
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
    )


@register("rollup_coarsest_pick", _ds_by_metric_sql(DAY, "sum(value)", "sum_value", 4))
def rollup_coarsest_pick(spark, sf_dir):
    """A10 planner — with hourly AND 2-hourly rollups available, a
    daily query picks the coarsest (7200); result identical to raw
    (equivalence of the hourly path is oracle-checked separately)."""
    from opentsdb_aura_spark.operators.rollup import (
        build_rollup,
        choose_downsample_source,
        downsample_from_rollup,
    )

    pts = points(spark, sf_dir)
    rollups = {
        3600: _rollup(spark, sf_dir),
        7200: build_rollup(pts, 7200, group_cols=("series_id", "metric")),
    }
    src, riv = choose_downsample_source(rollups, "sum", DAY, START, END)
    assert riv == 7200, f"expected coarsest rollup, got {riv}"
    res = downsample_from_rollup(src, START, END, DAY, "sum", group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "rollup_auto_substitution",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def rollup_auto_substitution(spark, sf_dir):
    """A10 — rollup substitution inside the query node: the MetricQuery
    never mentions rollups; ``run_metric_query(..., rollups=...)``
    routes the scan to the hourly pre-aggregate automatically
    (AerospikeBatchQueryNode.java:200-224 — selection happens in the
    node, not the caller).  Oracle is the flat raw-point computation;
    tests/test_plans.py asserts the physical plan reads rollup_3600,
    not the metrics store."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="none",
    )
    res = run_metric_query(
        points(spark, sf_dir),
        q,
        rollups={3600: _rollup(spark, sf_dir)},
        series_dim=series_dim(spark, sf_dir),
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


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


@register(
    "rollup_gb_avg_daily",
    f"""{ORACLE_PTS},
ps AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, avg(value) AS v
  FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3)
SELECT tag_user, bucket_ts, round(avg(v), 4) AS avg_value
FROM ps GROUP BY 1, 2""",
)
def rollup_gb_avg_daily(spark, sf_dir):
    """A10 two-stage substitution: avg→avg does not flat-fuse (group
    avg-of-series-avgs ≠ flat avg), yet the planner still serves it
    from the hourly pre-aggregate — per-series daily avg re-aggregated
    from the rollup chain (Σsum/Σcount), then the normal group merge,
    the exact shape of the reference's rollup read
    (AerospikeDSTimeSeriesEncoder.java:69-110 stream →
    NumericArrayAggregator accumulate).  Oracle is the raw two-stage
    computation; the plan reads rollup_3600 (asserted in
    tests/test_plans.py)."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="avg",
        fill="none",
    )
    res = run_metric_query(
        points(spark, sf_dir),
        q,
        rollups={3600: _rollup(spark, sf_dir)},
        series_dim=series_dim(spark, sf_dir),
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("avg_value"))


# ===================================================== expressions (§2.8 / 3.x graph)


@register(
    "expr_ratio_purchase_total_daily",
    f"""{ORACLE_PTS},
days AS (SELECT unnest(generate_series({START}, {END - 1}, {DAY})) AS bucket_ts),
p AS (SELECT {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1),
t AS (SELECT {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1)
SELECT d.bucket_ts, round(p.v / nullif(t.v, 0) * 100, 6) AS pct_value
FROM days d LEFT JOIN p ON p.bucket_ts = d.bucket_ts
            LEFT JOIN t ON t.bucket_ts = d.bucket_ts""",
)
def expr_ratio_purchase_total_daily(spark, sf_dir):
    """Expression node via the FULL JSON graph runner: daily purchase
    share of total, ``p / t * 100`` over two group-all branches with
    the dense NaN spine (missing day → NULL)."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    graph = {
        "start": START,
        "end": END,
        "executionGraph": [
            {"id": "p_src", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "purchase"}},
            {"id": "t_src", "type": "TimeSeriesDataSource"},
            {"id": "p_ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["p_src"]},
            {"id": "t_ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["t_src"]},
            {"id": "p", "type": "groupby", "tagKeys": [], "aggregator": "sum", "sources": ["p_ds"]},
            {"id": "t", "type": "groupby", "tagKeys": [], "aggregator": "sum", "sources": ["t_ds"]},
            {"id": "ratio", "type": "expression", "expression": "p / t * 100", "sources": ["p", "t"]},
        ],
    }
    res = run_semantic_graph(points(spark, sf_dir), graph, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    return res.select("bucket_ts", _r(denan(F.col("value")), 6).alias("pct_value"))


@register(
    "expr_diff_by_user_daily",
    f"""{ORACLE_PTS},
p AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
s AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'signup' AND ts >= {START} AND ts < {END} GROUP BY 1, 2)
SELECT COALESCE(p.tag_user, s.tag_user) AS tag_user,
       COALESCE(p.bucket_ts, s.bucket_ts) AS bucket_ts,
       round(p.v - s.v, 4) AS diff_value
FROM p FULL JOIN s ON p.tag_user = s.tag_user AND p.bucket_ts = s.bucket_ts""",
)
def expr_diff_by_user_daily(spark, sf_dir):
    """Expression over two per-user branches, NATURAL_OUTER join:
    purchase − signup; a user-day present on one side only → NaN
    (surfaced as NULL)."""
    from opentsdb_aura_spark.operators.expression import evaluate_expression

    pts = points(spark, sf_dir)

    def branch(metric):
        q = _mq(start=START, end=END, interval=DAY, ds_agg="sum",
                filter=MetricLiteral(metric), group_tag_keys=["user"], gb_agg="sum", fill="none")
        return run_metric_query(pts, q, dedupe=False)

    res = evaluate_expression({"p": branch("purchase"), "s": branch("signup")}, "p - s")
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("diff_value"))


@register(
    "expr_affine_purchase_daily",
    f"""{ORACLE_PTS}
SELECT {_bucket_sql(DAY)} AS bucket_ts, round(sum(value) * 2 + 10, 4) AS scaled_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1""",
)
def expr_affine_purchase_daily(spark, sf_dir):
    """Single-source scalar expression: ``p * 2 + 10`` (literal
    arithmetic folds into the same codegen stage as the aggregation)."""
    from opentsdb_aura_spark.operators.expression import evaluate_expression

    pts = points(spark, sf_dir)
    q = _mq(start=START, end=END, interval=DAY, ds_agg="sum",
            filter=MetricLiteral("purchase"), group_tag_keys=[], gb_agg="sum", fill="none")
    res = evaluate_expression({"p": run_metric_query(pts, q, dedupe=False)}, "p * 2 + 10")
    return res.select("bucket_ts", _r(denan(F.col("value")), 4).alias("scaled_value"))


@register(
    "summarizer_user_purchase",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1, 2)
SELECT tag_user, round(avg(v), 6) AS avg_value, round(max(v), 4) AS max_value,
       CAST(count(v) AS DOUBLE) AS count_value
FROM agg GROUP BY 1""",
)
def summarizer_user_purchase(spark, sf_dir):
    """Summarizer node: per-user avg/max/count over the daily purchase
    sums (the graph-footer table)."""
    from opentsdb_aura_spark.operators.summarizer import summarize

    pts = points(spark, sf_dir)
    q = _mq(start=START, end=END, interval=DAY, ds_agg="sum",
            filter=MetricLiteral("purchase"), group_tag_keys=["user"], gb_agg="sum", fill="none")
    res = summarize(run_metric_query(pts, q, dedupe=False), ["avg", "max", "count"], group_cols=["tag_user"])
    return res.select(
        "tag_user",
        _r(denan(F.col("avg")), 6).alias("avg_value"),
        _r(denan(F.col("max")), 4).alias("max_value"),
        F.col("count").alias("count_value"),
    )
