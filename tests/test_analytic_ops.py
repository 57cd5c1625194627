"""Analytic processor nodes: moving average, ratio, gap filling."""

import math

import pytest

from opentsdb_aura_spark.operators.analytic import fill_gaps, moving_average, ratio

NAN = float("nan")


@pytest.fixture(scope="module")
def series_df(spark):
    rows = [
        # series a: leading gap, interior gap, trailing gap
        ("a", 0, NAN),
        ("a", 60, 10.0),
        ("a", 120, NAN),
        ("a", 180, NAN),
        ("a", 240, 40.0),
        ("a", 300, NAN),
        # series b: no gaps
        ("b", 0, 1.0),
        ("b", 60, 2.0),
        ("b", 120, 3.0),
        ("b", 180, 4.0),
        ("b", 240, 5.0),
        ("b", 300, 6.0),
    ]
    return spark.createDataFrame(rows, "tag_host string, bucket_ts long, value double")


def _collect(df):
    return {(r["tag_host"], r["bucket_ts"]): r["value"] for r in df.collect()}


def test_fill_previous(series_df):
    got = _collect(fill_gaps(series_df, "previous"))
    assert math.isnan(got[("a", 0)])  # leading gap stays NaN
    assert got[("a", 120)] == 10.0
    assert got[("a", 180)] == 10.0
    assert got[("a", 300)] == 40.0  # trailing carries forward
    assert got[("b", 120)] == 3.0  # untouched


def test_fill_linear(series_df):
    got = _collect(fill_gaps(series_df, "linear"))
    assert math.isnan(got[("a", 0)])  # leading: nothing to lerp from
    assert got[("a", 120)] == 20.0  # 10 + (40-10) * 60/180
    assert got[("a", 180)] == 30.0
    assert math.isnan(got[("a", 300)])  # trailing: nothing to lerp to
    assert got[("b", 180)] == 4.0


def test_fill_unknown_policy(series_df):
    with pytest.raises(ValueError):
        fill_gaps(series_df, "cubic")


def test_moving_average_skips_nan(series_df):
    got = _collect(moving_average(series_df, 2))
    # a@240: window {NaN, 40} → 40; a@300: window {40, NaN} → 40
    assert got[("a", 240)] == 40.0
    assert got[("a", 300)] == 40.0
    # a@120: window {10, NaN} → 10; a@180: window {NaN, NaN} → NaN
    assert got[("a", 120)] == 10.0
    assert math.isnan(got[("a", 180)])
    assert got[("b", 60)] == 1.5


def test_moving_average_exponential(series_df):
    # samples=2 → default alpha = 2/3, decay = 1/3: weights [1/3, 1]
    got = _collect(moving_average(series_df, 2, exponential=True))
    # b@60: (1/3*1 + 1*2) / (1/3 + 1) = (7/3)/(4/3) = 1.75
    assert abs(got[("b", 60)] - 1.75) < 1e-12
    # b@0: single-element window → the value itself
    assert got[("b", 0)] == 1.0
    # NaN buckets drop out of both numerator and denominator
    assert got[("a", 240)] == 40.0  # window {NaN, 40}
    assert math.isnan(got[("a", 180)])  # window {NaN, NaN}


def test_moving_average_exponential_alpha(series_df):
    # explicit alpha=0.5 over 3 samples: weights [0.25, 0.5, 1]
    got = _collect(moving_average(series_df, 3, exponential=True, alpha=0.5))
    # b@120: (0.25*1 + 0.5*2 + 1*3) / 1.75 = 4.25/1.75
    assert abs(got[("b", 120)] - 4.25 / 1.75) < 1e-12


def test_ratio_shares(series_df):
    got = _collect(ratio(series_df))
    # bucket 60: a=10, b=2 → shares 10/12, 2/12
    assert abs(got[("a", 60)] - 10 / 12) < 1e-12
    assert abs(got[("b", 60)] - 2 / 12) < 1e-12
    # bucket 0: a NaN → stays NaN; b=1 is the whole total
    assert math.isnan(got[("a", 0)])
    assert got[("b", 0)] == 1.0


def test_sliding_window_time_range(series_df):
    from opentsdb_aura_spark.operators.analytic import sliding_window

    # 3-minute trailing window (bucket_ts - 180, bucket_ts]
    got = _collect(sliding_window(series_df, 180, "sum"))
    assert got[("b", 0)] == 1.0
    assert got[("b", 120)] == 6.0  # 1+2+3
    assert got[("b", 300)] == 15.0  # 4+5+6
    # NaN buckets contribute nothing
    assert got[("a", 240)] == 40.0  # window (60, 240] = {NaN, NaN, 40}
    assert got[("a", 180)] == 10.0  # window (0, 180] = {10, NaN, NaN}
    assert got[("a", 300)] == 40.0  # window (120, 300] = {NaN, 40, NaN}
    assert math.isnan(got[("a", 0)])  # window (-180, 0] = {NaN} only


def test_sliding_window_is_stride_independent(spark):
    """A RANGE frame keys off timestamps, not row counts: an irregular
    bucket vector aggregates whatever falls inside the time window."""
    from opentsdb_aura_spark.operators.analytic import sliding_window

    rows = [("a", 0, 1.0), ("a", 60, 2.0), ("a", 600, 10.0)]
    df = spark.createDataFrame(rows, "tag_host string, bucket_ts long, value double")
    got = _collect(sliding_window(df, 180, "sum"))
    assert got[("a", 60)] == 3.0
    assert got[("a", 600)] == 10.0  # the early rows are out of range


def test_sliding_window_count_empty_is_nan(series_df):
    from opentsdb_aura_spark.operators.analytic import sliding_window

    got = _collect(sliding_window(series_df, 120, "count"))
    assert got[("b", 60)] == 2.0
    assert got[("a", 60)] == 1.0
    assert math.isnan(got[("a", 180)])  # {NaN, NaN} → NaN, not 0


def test_sliding_window_unknown_agg(series_df):
    from opentsdb_aura_spark.operators.analytic import sliding_window

    with pytest.raises(ValueError):
        sliding_window(series_df, 60, "p99")


def test_bucket_quantile_walk(spark):
    from opentsdb_aura_spark.operators.analytic import bucket_quantile

    # ts=0: counts 5/3/2 in [0,10) [10,20) [20,40) → total 10
    #   q0.5  → cum 5 ≥ 5   → first bucket, midpoint 5
    #   q0.51 → cum 8 ≥ 5.1 → second bucket, midpoint 15
    #   q0.9  → cum 10 ≥ 9  → third bucket, midpoint 30
    rows = [
        (0, 0.0, 10.0, 5.0),
        (0, 10.0, 20.0, 3.0),
        (0, 20.0, 40.0, 2.0),
        # ts=60: everything in the top bucket
        (60, 0.0, 10.0, 0.0),
        (60, 10.0, 20.0, 0.0),
        (60, 20.0, 40.0, 4.0),
    ]
    df = spark.createDataFrame(rows, "bucket_ts long, bucket_lower double, bucket_upper double, value double")
    res = bucket_quantile(df, [0.5, 0.51, 0.9])
    got = {(r["bucket_ts"], r["quantile"]): r["value"] for r in res.collect()}
    assert got[(0, 0.5)] == 5.0
    assert got[(0, 0.51)] == 15.0
    assert got[(0, 0.9)] == 30.0
    assert got[(60, 0.5)] == 30.0
    assert got[(60, 0.9)] == 30.0


def test_bucket_quantile_modes_and_empty(spark):
    from opentsdb_aura_spark.operators.analytic import bucket_quantile

    rows = [
        (0, 0.0, 10.0, 1.0),
        (0, 10.0, 20.0, 1.0),
        # ts=60 has no observations at all → no output rows
        (60, 0.0, 10.0, 0.0),
        (60, 10.0, 20.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "bucket_ts long, bucket_lower double, bucket_upper double, value double")
    top = bucket_quantile(df, [0.9], mode="top")
    bottom = bucket_quantile(df, [0.9], mode="bottom")
    assert {(r["bucket_ts"], r["value"]) for r in top.collect()} == {(0, 20.0)}
    assert {(r["bucket_ts"], r["value"]) for r in bottom.collect()} == {(0, 10.0)}
    with pytest.raises(ValueError):
        bucket_quantile(df, [0.5], mode="median")


def test_rolling_zscore_trailing_window(spark):
    from opentsdb_aura_spark.operators.analytic import rolling_zscore

    # flat history then a spike: spike z = (10-1)/0 — flat window sd=0
    # → NULL; with varied history the spike scores high and positive
    rows = [("m", i * 86400, float(v)) for i, v in enumerate([1, 2, 1, 2, 1, 2, 1, 50])]
    df = spark.createDataFrame(rows, "metric string, bucket_ts long, value double")
    out = {r["bucket_ts"]: r["zscore"] for r in rolling_zscore(df, lookback=7, min_history=3).collect()}
    assert out[0] is None and out[86400] is None and out[2 * 86400] is None  # short history
    assert out[7 * 86400] is not None and out[7 * 86400] > 5  # spike flagged
    # current bucket excluded from its own baseline: day 6's z uses days 0-5
    assert abs(out[6 * 86400]) < 2


def test_seasonal_baseline_deviation(spark):
    """Baseline is the same slot one period back; absent slot or NaN
    spine slot gives NULL baseline/deviation, never NaN arithmetic."""
    import math

    from pyspark.sql import functions as F

    from opentsdb_aura_spark.operators.analytic import seasonal_baseline_deviation

    rows = [
        ("m", 0, 10.0),
        ("m", 100, 13.0),       # baseline 10 → dev 3
        ("m", 200, 20.0),       # baseline 13 → dev 7
        ("m", 400, 5.0),        # slot 300 absent → NULL baseline
        ("n", 100, float("nan")),  # NaN spine slot
        ("n", 200, 4.0),        # baseline NaN → NULL
    ]
    df = spark.createDataFrame(rows, "metric string, bucket_ts long, value double")
    out = {
        (r["metric"], r["bucket_ts"]): (r["baseline"], r["deviation"])
        for r in seasonal_baseline_deviation(df, 100, group_cols=["metric"]).collect()
    }
    assert out[("m", 100)] == (10.0, 3.0)
    assert out[("m", 200)] == (13.0, 7.0)
    assert out[("m", 0)] == (None, None)
    assert out[("m", 400)] == (None, None)
    assert out[("n", 200)] == (None, None)
    b, d = out[("n", 100)]
    assert b is None and d is None or (isinstance(d, float) and not math.isnan(d))
