"""Post-aggregation analytic nodes from the upstream OpenTSDB 3.x
processor set: moving average (``movingaverage`` /
``MovingAverageConfig``) and ratio / percent-of-total (``ratio`` /
``RatioConfig``).  The aura reference feeds its results into these
upstream graph nodes, so dashboards routinely contain them; supporting
them here lets that query JSON run unchanged.

Both operate on the downsampled/grouped result (bucket_ts, group
tags, value) — OUTPUT-cardinality data, not raw points — so the
analytic windows run over per-series bucket vectors whose length is
bounded by the query range / interval, never by ingest volume.  That
keeps the per-partition work O(buckets) at any corpus scale; the
rate operator's segment-parallel machinery is unnecessary here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opentsdb_aura_spark.model import NAN


def _non_nan(c: Column) -> Column:
    return F.when(~F.isnan(c), c)


def moving_average(
    df: DataFrame,
    samples: int,
    *,
    exponential: bool = False,
    alpha: float | None = None,
    value_col: str = "value",
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Moving average over the trailing ``samples`` buckets per series
    (current bucket included) — upstream ``MovingAverageConfig``.

    ``exponential=False``: simple (unweighted) average.
    ``exponential=True``: exponentially weighted — bucket at age ``a``
    (0 = current) carries weight ``(1-alpha)^a``, normalized over the
    reported buckets in the window; ``alpha`` defaults to the standard
    EMA smoothing constant ``2/(samples+1)``.

    NaN buckets (the empty-interval spine) contribute nothing to the
    window; a window with no real values stays NaN, matching the
    infectious-empty contract of the downsample spine.  All columns
    other than (order, value) are treated as the series identity."""
    group_cols = [c for c in df.columns if c not in (value_col, order_col)]
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(order_col)
        .rowsBetween(-(samples - 1), 0)
    )
    if not exponential:
        avg = F.avg(_non_nan(F.col(value_col))).over(w)
        return df.withColumn(value_col, F.coalesce(avg, NAN()))

    a = alpha if alpha is not None else 2.0 / (samples + 1)
    decay = F.lit(1.0 - a)
    # collect_list drops NULL scalars (breaking age positions), so wrap
    # each value in a struct — struct elements are never dropped and
    # the frame order gives each element its age
    arr = F.collect_list(F.struct(_non_nan(F.col(value_col)).alias("v"))).over(w)
    age = lambda i: F.size(arr) - 1 - i  # noqa: E731 — 0 = current bucket
    num = F.aggregate(
        F.transform(arr, lambda x, i: F.when(x["v"].isNotNull(), F.pow(decay, age(i)) * x["v"])),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
    )
    den = F.aggregate(
        F.transform(arr, lambda x, i: F.when(x["v"].isNotNull(), F.pow(decay, age(i)))),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
    )
    ewma = F.when(den > 0, num / den).otherwise(NAN())
    return df.withColumn(value_col, ewma)


def fill_gaps(
    df: DataFrame,
    policy: str,
    *,
    value_col: str = "value",
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Gap-filling over the dense NaN spine, per series:

    - ``previous`` — carry the last reported value forward (leading
      gaps stay NaN); OpenTSDB's previous-value fill policy.
    - ``linear`` — interpolate interior gaps between the surrounding
      reported values, weighted by bucket distance; leading/trailing
      gaps stay NaN (there is nothing to interpolate toward);
      OpenTSDB's linear interpolation (`lerp`).

    Both are one window pass per direction over the bucket vector —
    output-cardinality data, same scale envelope as moving_average.
    All columns other than (order, value) form the series identity."""
    group_cols = [c for c in df.columns if c not in (value_col, order_col)]
    v = _non_nan(F.col(value_col))  # NaN → NULL so ignorenulls applies
    part = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(order_col)
    before = part.rowsBetween(Window.unboundedPreceding, -1)

    if policy == "previous":
        filled = F.coalesce(v, F.last(v, ignorenulls=True).over(before))
        return df.withColumn(value_col, F.coalesce(filled, NAN()))

    if policy == "linear":
        after = part.rowsBetween(1, Window.unboundedFollowing)
        tagged = F.when(v.isNotNull(), F.struct(F.col(order_col).alias("t"), v.alias("v")))
        prev = F.last(tagged, ignorenulls=True).over(before)
        nxt = F.first(tagged, ignorenulls=True).over(after)
        lerp = prev["v"] + (nxt["v"] - prev["v"]) * (
            (F.col(order_col) - prev["t"]) / (nxt["t"] - prev["t"])
        )
        filled = F.coalesce(v, F.when(prev.isNotNull() & nxt.isNotNull(), lerp))
        return df.withColumn(value_col, F.coalesce(filled, NAN()))

    raise ValueError(f"unknown fill policy {policy!r} (expected 'previous' or 'linear')")


def ratio(
    df: DataFrame,
    *,
    as_percent: bool = False,
    value_col: str = "value",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Each series' share of the all-series total per timestamp —
    upstream ``RatioConfig`` (``as_percent`` multiplies by 100).

    The per-bucket total ignores NaN series; a NaN input value stays
    NaN in the output (its share is undefined, not zero).  Window
    partitions are time buckets, so parallelism scales with the query
    range regardless of series count skew within a bucket."""
    w = Window.partitionBy(bucket_col)
    total = F.sum(_non_nan(F.col(value_col))).over(w)
    share = F.col(value_col) / total
    if as_percent:
        share = share * F.lit(100.0)
    return df.withColumn(value_col, F.coalesce(share, NAN()))
