"""Temporal downsample (SURVEY.md §2.3a, A1-A11).

Re-expression of the fused per-segment kernel
(opentsdb/src/main/java/net/opentsdb/aura/metrics/storage/
AuraMetricsNumericArrayIterator.java:285-670) as a declarative Spark
aggregation.  Semantics preserved:

- buckets are **query-start-aligned** tumbling intervals:
  bucket i covers [start + i*interval, start + (i+1)*interval)
  (intervalOffset walks seconds from startTime; partial tail buckets
  close early — AuraMetricsNumericArrayIterator.java:500-559,
  core/.../downsample/DownSampler.java:47).
- NaN input values are *skipped* unless ``infectious_nan``; an
  interval containing any NaN with the flag set yields NaN and all its
  other values are ignored (kernel lines 465-473).
- an interval with no (surviving) values yields **NaN**, not 0 and not
  an absent row — the dense interval "spine" is the single most
  visible semantic difference from a plain GROUP BY (A8).
- AVG is sum/count; reporting-average divides SUM by a configured
  expected point count (kernel lines 502-536, avg→sum rewrite 151-157).
- LAST is the last non-NaN value in timestamp order (post-dedupe).
- run-all: one bucket spanning [start, end) (kernel lines 199-202).

Aggregator names follow the reference registry, including OpenTSDB
aliases zimsum/mimmin/mimmax
(core/.../downsample/AggregatorType.java:20-116).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentsdb_aura_spark.model import NAN


#: canonical name → alias set (AggregatorType.java:20-116)
AGG_ALIASES = {
    "zimsum": "sum",
    "mimmin": "min",
    "mimmax": "max",
}

SUPPORTED_AGGS = {
    "sum",
    "avg",
    "count",
    "min",
    "max",
    "last",
    "median",
    "stddev",
    "var",
    "sumsq",
    "p50",
    "p75",
    "p90",
    "p95",
    "p99",
    "p999",
}


#: UD1 — pluggable aggregator registry (the NumericAggregatorFactory
#: lookup-by-name, AuraMetricsNumericArrayIterator.java:182-195):
#: name → fn(masked_value_column) -> aggregate Column expression.
CUSTOM_AGGS: dict[str, object] = {}


def register_aggregator(name: str, fn) -> None:
    """Register a custom downsample aggregator usable by name, e.g.
    ``register_aggregator("gmean", lambda v: F.exp(F.avg(F.log(v))))``."""
    CUSTOM_AGGS[name.lower().strip()] = fn


def normalize_agg(agg: str) -> str:
    agg = agg.lower().strip()
    agg = AGG_ALIASES.get(agg, agg)
    if agg not in SUPPORTED_AGGS and agg not in CUSTOM_AGGS:
        raise ValueError(f"unsupported downsample aggregator: {agg}")
    return agg


def bucket_expr(ts: Column, start: int, interval: int) -> Column:
    """Start-aligned tumbling bucket: start + floor((ts-start)/interval)*interval."""
    return (F.lit(int(start)) + F.floor((ts - F.lit(int(start))) / F.lit(int(interval))) * F.lit(int(interval))).cast(
        "long"
    )


def _final_value(agg: str, reporting_dps: float | None) -> Column:
    """Select the output value from the shared accumulator columns.

    Mirrors the interval-close switch (kernel lines 502-536); all
    accumulators come from one hash-aggregate pass, so adding agg
    types costs no extra shuffle.
    """
    if agg == "sum":
        if reporting_dps:  # reporting-average: sum / expected dps (kernel 506-511)
            return F.col("_sum") / F.lit(float(reporting_dps))
        return F.col("_sum")
    if agg == "avg":
        return F.col("_sum") / F.col("_cnt")
    if agg == "count":
        return F.col("_cnt").cast("double")
    if agg == "min":
        return F.col("_min")
    if agg == "max":
        return F.col("_max")
    if agg == "last":
        return F.col("_last")
    if agg == "median":
        return F.col("_median")
    if agg == "stddev":
        # n=1 → NaN (not the SQL NULL), matching the rollup-served path
        return F.coalesce(F.col("_stddev"), NAN())
    if agg == "var":
        return F.coalesce(F.col("_var"), NAN())
    if agg == "sumsq":
        return F.col("_sumsq")
    if agg in CUSTOM_AGGS:
        return F.col("_custom")
    if agg.startswith("p"):
        return F.col("_perc")
    raise AssertionError(agg)


def downsample(
    points: DataFrame,
    start: int,
    end: int,
    interval: int | None,
    agg: str,
    *,
    group_cols: Sequence[str] = ("series_id",),
    infectious_nan: bool = False,
    reporting_dps: float | None = None,
    run_all: bool = False,
    fill: str = "nan",  # "nan" | "zero" | "null" | "none"
    value_col: str = "value",
    ts_col: str = "ts",
    spine_groups: DataFrame | None = None,
) -> DataFrame:
    """Downsample ``points`` into (group_cols…, bucket_ts, value).

    ``fill="nan"`` emits the dense interval spine with NaN for empty /
    NaN-infected intervals (the reference contract); ``fill="none"``
    emits only non-empty intervals (a plain GROUP BY, cheaper when the
    caller immediately group-merges with a NaN-skipping aggregator).
    """
    agg = normalize_agg(agg)
    group_cols = list(group_cols)
    if run_all or interval is None:
        interval = int(end) - int(start)
    interval = int(interval)

    v = F.col(value_col)
    ts = F.col(ts_col)
    in_range = (ts >= F.lit(int(start))) & (ts < F.lit(int(end)))
    df = points.where(in_range)

    masked = F.when(F.isnan(v), F.lit(None).cast("double")).otherwise(v)
    df = df.withColumn("_v", masked).withColumn("_isnan", F.isnan(v)).withColumn(
        "bucket_ts", bucket_expr(ts, start, interval)
    )

    aggs = [
        F.sum("_v").alias("_sum"),
        F.count("_v").alias("_cnt"),
        F.min("_v").alias("_min"),
        F.max("_v").alias("_max"),
        F.max_by(F.col("_v"), F.when(F.col("_v").isNotNull(), ts)).alias("_last"),
        F.max(F.col("_isnan")).alias("_has_nan"),
    ]
    if agg == "median":
        aggs.append(F.expr("median(_v)").alias("_median"))
    if agg == "stddev":
        aggs.append(F.stddev_samp("_v").alias("_stddev"))
    if agg == "var":
        aggs.append(F.var_samp("_v").alias("_var"))
    if agg == "sumsq":
        aggs.append(F.sum(F.col("_v") * F.col("_v")).alias("_sumsq"))
    if agg in CUSTOM_AGGS:
        # registry names are arbitrary — check BEFORE the percentile
        # prefix match or a custom agg named "p..." would be parsed as
        # a percentile (matching _final_value's dispatch order)
        aggs.append(CUSTOM_AGGS[agg](F.col("_v")).alias("_custom"))
    elif agg == "p50":
        aggs.append(F.expr("percentile(_v, 0.5)").alias("_perc"))
    elif agg.startswith("p"):  # exact percentile: p90 → 0.90, p999 → 0.999
        q = float("0." + agg[1:])
        aggs.append(F.expr(f"percentile(_v, {q})").alias("_perc"))

    grouped = df.groupBy(*group_cols, "bucket_ts").agg(*aggs)

    value = _final_value(agg, reporting_dps)
    # empty interval (no non-NaN values) → NaN; infectious NaN → NaN
    value = F.when(F.col("_cnt") == 0, NAN()).otherwise(value)
    if infectious_nan:
        value = F.when(F.col("_has_nan"), NAN()).otherwise(value)
    result = grouped.select(*group_cols, "bucket_ts", value.alias("value"))

    if fill != "none":
        result = fill_spine(
            result, start, end, interval, group_cols, fill=fill, spine_groups=spine_groups
        )
    return result


def fill_spine(
    result: DataFrame,
    start: int,
    end: int,
    interval: int,
    group_cols: Sequence[str],
    fill: str = "nan",
    spine_groups: DataFrame | None = None,
) -> DataFrame:
    """Dense interval spine (A8): every (group, bucket) in
    [start, end) surfaces a row; missing buckets carry the fill value
    — NaN (reference default), 0 (the rollup count fill,
    GorillaDownSampledTimeSeriesEncoder.java:171), or NULL.

    The spine is |groups| × |buckets| — identical to the reference's
    dense per-series output arrays, so it is not a scale hazard: it is
    the *output* cardinality, produced by an explode of a generated
    ``sequence`` (no shuffle beyond the distinct on group keys, which
    the preceding aggregation already partitioned by).

    ``spine_groups`` — optional meta-driven group universe (one row per
    group, exactly ``group_cols`` columns).  By default the spine
    derives from the *result*, so a series the filter matched that has
    zero in-range points emits nothing; the reference's meta index
    selects series independently of the scanned range and such a series
    yields an all-NaN vector (TimeSeriesShard.java:677-758 selection vs
    AuraMetricsNumericArrayIterator missing-segment NaN fill).  Pass the
    filtered ``series_dim`` projection to reproduce that contract.
    """
    group_cols = list(group_cols)
    fill_value = {
        "nan": NAN(),
        "zero": F.lit(0.0),
        "null": F.lit(None).cast("double"),
    }[fill]
    n_buckets = max(0, -(-(int(end) - int(start)) // int(interval)))  # ceil
    if n_buckets == 0:
        # empty range: no spine rows (and sequence(0, -1) would step
        # BACKWARD, inventing buckets)
        return result.where(F.lit(False))
    if not group_cols:
        spark = result.sparkSession
        spine = spark.range(n_buckets).select(
            (F.lit(int(start)) + F.col("id") * F.lit(int(interval))).cast("long").alias("bucket_ts")
        )
        joined = spine.join(result, on="bucket_ts", how="left")
        return joined.withColumn("value", F.coalesce(F.col("value"), fill_value))
    if spine_groups is not None:
        groups = spine_groups.select(*group_cols).distinct()
    else:
        groups = result.select(*group_cols).distinct()
    spine = groups.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.lit(0), F.lit(n_buckets - 1)
            )
        ).alias("_i"),
    ).select(
        *group_cols,
        (F.lit(int(start)) + F.col("_i") * F.lit(int(interval))).cast("long").alias("bucket_ts"),
    )
    # NULL-SAFE group-key equality: a series missing a grouped tag
    # forms a NULL-keyed group (with_group_keys), and a null-unsafe
    # join would never match its result rows — the whole group would
    # silently come back as the fill value
    s, r = spine.alias("_spine"), result.alias("_res")
    cond = F.col("_spine.bucket_ts") == F.col("_res.bucket_ts")
    for c in group_cols:
        cond = cond & F.col(f"_spine.{c}").eqNullSafe(F.col(f"_res.{c}"))
    joined = s.join(r, cond, "left").select(
        *[F.col(f"_spine.{c}") for c in group_cols],
        F.col("_spine.bucket_ts").alias("bucket_ts"),
        F.coalesce(F.col("_res.value"), fill_value).alias("value"),
    )
    return joined
