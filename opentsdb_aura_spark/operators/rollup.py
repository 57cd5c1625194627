"""A10 — rollup pre-aggregation and query-time substitution.

The reference computes chained aggregates (avg/sum/count/min/max/
sumofsquare) per interval at flush time
(core/src/main/java/net/opentsdb/aura/metrics/core/downsample/
DownSampler.java:32-56, chain core/.../downsample/Aggregator.java:45-132)
and serves a later query from the stored aggregate stream when the
requested aggregator is available and the downsample interval is
compatible (opentsdb/.../AerospikeBatchQueryNode.java:195-225).

Spark re-expression: a ``rollup_<interval>`` Parquet table
(series keys, window_start, sum, count, min, max, sumsq) built by one
hash aggregation; query-time substitution re-aggregates rollup rows
into the requested buckets — sum of sums, min of mins, etc., with
avg = Σsum/Σcount.  The planner picks the rollup iff:

  - the downsample aggregator is derivable from the stored chain,
  - ds_interval % rollup_interval == 0,
  - the query start is aligned to the rollup grid (buckets are
    query-start-aligned; rollup windows are epoch-aligned).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentsdb_aura_spark.model import NAN




#: aggregators answerable from the stored chain (avg via sum/count;
#: variance/stddev via sum/count/sumsq — the downstream use the
#: reference stores sumofsquare FOR, SumOfSquareAggregator.java:20-40)
ROLLUP_SERVABLE = {"sum", "count", "min", "max", "avg", "sumsq", "var", "stddev"}


def build_rollup(
    points: DataFrame,
    rollup_interval: int,
    *,
    group_cols: Sequence[str] = ("series_id",),
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Write-side downsample: epoch-aligned windows, NaN-skipping
    chained aggregates (one pass, map-side partial agg)."""
    v = F.col(value_col)
    masked = F.when(F.isnan(v), F.lit(None).cast("double")).otherwise(v)
    w = (F.col(ts_col) - F.col(ts_col) % F.lit(int(rollup_interval))).cast("long")
    return (
        points.withColumn("_v", masked)
        .withColumn("window_start", w)
        .groupBy(*group_cols, "window_start")
        .agg(
            F.sum("_v").alias("sum"),
            F.count("_v").alias("count"),
            F.min("_v").alias("min"),
            F.max("_v").alias("max"),
            F.sum(F.col("_v") * F.col("_v")).alias("sumsq"),
        )
    )


def rollup_supports(ds_agg: str, ds_interval: int, rollup_interval: int, start: int, end: int) -> bool:
    """Mirror of the substitution predicate
    (AerospikeBatchQueryNode.java:200-224) plus grid alignment on BOTH
    ends: a rollup window starting before ``end`` extends past it when
    ``end`` is off the rollup grid, so its pre-aggregate would include
    points in [end, window_start + rollup_interval) that a raw-point
    downsample excludes — the final bucket would silently over-count."""
    return (
        ds_agg in ROLLUP_SERVABLE
        and ds_interval is not None
        and ds_interval % rollup_interval == 0
        and start % rollup_interval == 0
        and (end - start) % rollup_interval == 0
    )


def downsample_from_rollup(
    rollup: DataFrame,
    start: int,
    end: int,
    interval: int,
    agg: str,
    *,
    group_cols: Sequence[str] = ("series_id",),
) -> DataFrame:
    """Serve a downsample query from the rollup table: re-aggregate
    pre-aggregates into query-start-aligned buckets.  Output schema
    matches ``downsample(..., fill='none')``: (group_cols…, bucket_ts,
    value)."""
    agg = agg.lower()
    if agg not in ROLLUP_SERVABLE:
        raise ValueError(f"aggregator {agg} not servable from rollups")
    group_cols = list(group_cols)
    df = rollup.where((F.col("window_start") >= F.lit(int(start))) & (F.col("window_start") < F.lit(int(end))))
    bucket = (
        F.lit(int(start))
        + F.floor((F.col("window_start") - F.lit(int(start))) / F.lit(int(interval))) * F.lit(int(interval))
    ).cast("long")
    grouped = df.withColumn("bucket_ts", bucket).groupBy(*group_cols, "bucket_ts").agg(
        F.sum("sum").alias("_sum"),
        F.sum("count").alias("_cnt"),
        F.min("min").alias("_min"),
        F.max("max").alias("_max"),
        F.sum("sumsq").alias("_sumsq"),
    )
    # sample variance from the chain: (Σv² − (Σv)²/n) / (n−1)
    var = (F.col("_sumsq") - F.col("_sum") * F.col("_sum") / F.col("_cnt")) / (F.col("_cnt") - 1)
    # clamp tiny negative fp residue so stddev never goes NaN on
    # near-constant data
    var = F.greatest(var, F.lit(0.0))
    value = {
        "sum": F.col("_sum"),
        "count": F.col("_cnt").cast("double"),
        "min": F.col("_min"),
        "max": F.col("_max"),
        "avg": F.col("_sum") / F.col("_cnt"),
        "sumsq": F.col("_sumsq"),
        "var": var,
        "stddev": F.sqrt(var),
    }[agg]
    if agg in ("var", "stddev"):
        value = F.when(F.col("_cnt") < 2, NAN()).otherwise(value)
    value = F.when(F.col("_cnt") == 0, NAN()).otherwise(value)
    return grouped.select(*group_cols, "bucket_ts", value.alias("value"))


def downsample_spliced(
    hot_points: DataFrame,
    rollup: DataFrame,
    rollup_interval: int,
    start: int,
    end: int,
    boundary: int,
    interval: int,
    agg: str,
    *,
    group_cols: Sequence[str] = ("series_id",),
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """U3 × A10 — mixed-resolution hot/cold splice: the cold range
    ``[start, boundary)`` is served from the pre-aggregated rollup
    table, the hot range ``[boundary, end)`` from raw points, and the
    two bucket streams are unioned.  This is the reference's routing of
    recent time to the in-memory tier and older time to the long-term
    store's rollup streams, combined
    (opentsdb/.../execution/AuraMetricsClusterConfig.java routing +
    AerospikeBatchQueryNode.java:200-224 rollup selection).

    ``boundary`` must lie on the query's bucket grid so no bucket
    straddles tiers — each bucket is computed entirely from one side,
    making the union exact (no partial-aggregate merge needed) for
    every servable aggregator including non-decomposable AVG.

    Output schema matches ``downsample(..., fill='none')``:
    (group_cols…, bucket_ts, value).  Scale note: both sides keep
    their own partition pruning (``window_start`` / ``segment_time``)
    and the union is a no-shuffle concatenation of two independently
    aggregated streams.
    """
    start, end, boundary = int(start), int(end), int(boundary)
    interval = int(interval)
    if not start <= boundary <= end:
        raise ValueError(f"boundary {boundary} outside query range [{start}, {end})")
    if (boundary - start) % interval != 0:
        raise ValueError(
            f"boundary {boundary} not on the bucket grid (start={start}, interval={interval}): "
            "a bucket would straddle the hot/cold tiers"
        )
    if boundary > start and not rollup_supports(agg, interval, rollup_interval, start, boundary):
        raise ValueError(
            f"cold range not servable from rollup_{rollup_interval} for agg={agg!r}, interval={interval}"
        )
    from opentsdb_aura_spark.operators.downsample import downsample

    group_cols = list(group_cols)
    parts: list[DataFrame] = []
    if boundary > start:
        parts.append(
            downsample_from_rollup(rollup, start, boundary, interval, agg, group_cols=group_cols)
        )
    if end > boundary:
        parts.append(
            downsample(
                hot_points,
                boundary,
                end,
                interval,
                agg,
                group_cols=group_cols,
                fill="none",
                value_col=value_col,
                ts_col=ts_col,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def choose_downsample_source(
    rollups: dict[int, DataFrame],
    ds_agg: str,
    ds_interval: int | None,
    start: int,
    end: int,
) -> tuple[DataFrame | None, int | None]:
    """Planner rule: the coarsest compatible rollup wins (fewest rows
    scanned); (None, None) → the caller falls back to its raw table
    (this function never returns the raw frame itself)."""
    best = None
    if ds_interval:
        for riv in sorted(rollups, reverse=True):
            if rollup_supports(ds_agg, ds_interval, riv, start, end):
                best = riv
                break
    if best is None:
        return None, None
    return rollups[best], best


# ------------------------------------------------- histogram rollups (sketch)

#: default relative accuracy of the histogram rollup bins
HIST_EPS = 0.01


def _hist_gamma(eps: float) -> float:
    return (1.0 + eps) / (1.0 - eps)


def build_rollup_histogram(
    points: DataFrame,
    rollup_interval: int,
    *,
    eps: float = HIST_EPS,
    group_cols: Sequence[str] = ("series_id",),
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Write-side log-bucketed value histogram per rollup window — the
    MERGEABLE percentile path the plain sum/count/min/max chain can't
    provide (A6: the reference buffers raw values per interval for
    percentiles, AuraMetricsNumericArrayIterator.java:488-498 — fine
    per segment, impossible across pre-aggregates).

    DDSketch-style bins (relative accuracy ``eps``): for v≠0,
    idx = ceil(log_γ(|v|)) with γ = (1+eps)/(1−eps); sign carried
    separately; v = 0 in its own bin.  Output is LONG format —
    (group…, window_start, sign, bin, cnt) — so query-time merging is
    a plain groupBy SUM with full map-side combine; no map-typed
    columns, no UDAF.  Rows per (series, window) are bounded by the
    value dynamic range (~log_γ spread ≈ tens), not the point count —
    the storage multiplier that makes sketch rollups viable at 100 TB.

    Non-finite values (NaN and ±Inf) are skipped (no-data, consistent
    with the aggregate chain): an Inf would make log(|v|) = inf and the
    bin cast null/overflowed (an error under ANSI mode), silently
    corrupting the sketch for that window.
    """
    import math

    gamma = _hist_gamma(float(eps))
    v = F.col(value_col)
    w = (F.col(ts_col) - F.col(ts_col) % F.lit(int(rollup_interval))).cast("long")
    sign = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0)).cast("int")
    idx = F.when(
        v == 0, F.lit(0)
    ).otherwise(F.ceil(F.log(F.abs(v)) / F.lit(math.log(gamma)))).cast("int")
    return (
        points.where(~F.isnan(v) & (F.abs(v) != float("inf")))
        .withColumn("window_start", w)
        .withColumn("sign", sign)
        .withColumn("bin", idx)
        .groupBy(*group_cols, "window_start", "sign", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def percentile_from_rollup_histogram(
    hist: DataFrame,
    q: float,
    start: int,
    end: int,
    interval: int,
    *,
    eps: float = HIST_EPS,
    group_cols: Sequence[str] = ("metric",),
) -> DataFrame:
    """Serve a percentile downsample from the histogram rollup:
    re-bucket windows onto the query grid, merge bins (groupBy SUM),
    walk the cumulative distribution, return the bin estimate at rank
    ⌈q·n⌉ — within ``eps`` relative error of the exact value by the
    DDSketch bound.  Output: (group…, bucket_ts, value).

    Every step is a hash aggregate or a bounded window over bin rows
    (tens per group-bucket), so the plan touches pre-aggregates only —
    the raw points are never scanned.
    """
    import math

    from pyspark.sql.window import Window

    gamma = _hist_gamma(float(eps))
    bucket = (
        F.lit(int(start))
        + F.floor((F.col("window_start") - F.lit(int(start))) / F.lit(int(interval))) * F.lit(int(interval))
    ).cast("long")
    in_range = (F.col("window_start") >= F.lit(int(start))) & (F.col("window_start") < F.lit(int(end)))
    merged = (
        hist.where(in_range)
        .withColumn("bucket_ts", bucket)
        .groupBy(*group_cols, "bucket_ts", "sign", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # total value order across signs: negatives by descending |v|,
    # then zero, then positives by ascending |v| — (sign, sign·bin)
    sidx = (F.col("sign") * F.col("bin")).alias("_sidx")
    part = Window.partitionBy(*group_cols, "bucket_ts")
    walk = part.orderBy("sign", "_sidx").rowsBetween(Window.unboundedPreceding, 0)
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * (F.lit(2.0) * F.pow(F.lit(gamma), F.col("bin")) / F.lit(gamma + 1.0))
    )
    ranked = (
        merged.withColumn("_sidx", sidx)
        .withColumn("_cum", F.sum("cnt").over(walk))
        .withColumn("_total", F.sum("cnt").over(part))
        .withColumn("_est", est)
    )
    hit = ranked.where(F.col("_cum") >= F.ceil(F.lit(float(q)) * F.col("_total")))
    # the first qualifying row in the value order — min over the
    # (sign, sign·bin, estimate) struct picks it without a second sort
    return hit.groupBy(*group_cols, "bucket_ts").agg(
        F.min(F.struct("sign", "_sidx", "_est")).getField("_est").alias("value")
    )
