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
