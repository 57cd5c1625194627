"""OOO/dupe dedupe (GorillaRawTimeSeriesEncoderTest scenarios) and
time-shift behavior."""

from conftest import BASE, assert_close

from opentsdb_aura_spark.operators.dedupe import dedupe_last_write_wins
from opentsdb_aura_spark.plans.query import MetricQuery, run_metric_query


def test_last_write_wins(make_points):
    # shuffled arrival, duplicate timestamps with different values
    pts = make_points(
        [
            ("m", {}, BASE + 60, 5.0, 10),
            ("m", {}, BASE, 1.0, 11),
            ("m", {}, BASE + 60, 9.0, 12),  # later write for +60
            ("m", {}, BASE, 3.0, 2),  # EARLIER write for +0 (ooo arrival)
        ]
    )
    out = {r["ts"]: r["value"] for r in dedupe_last_write_wins(pts).collect()}
    assert out == {BASE: 1.0, BASE + 60: 9.0}


def test_dedupe_inside_query(make_points):
    pts = make_points([("m", {}, BASE, 1.0, 0), ("m", {}, BASE, 100.0, 1)])
    q = MetricQuery(start=BASE, end=BASE + 60, interval=60, ds_agg="sum", group_tag_keys=[])
    vals = {r["bucket_ts"]: r["value"] for r in run_metric_query(pts, q).collect()}
    assert_close(vals[BASE], 100.0)


def test_time_shift_relabels(make_points):
    # data exists only in [BASE, BASE+120); query [BASE+3600, ...) with
    # 1 h shift reads it and relabels forward
    pts = make_points([("m", {}, BASE + 60 * i, 2.0) for i in range(2)])
    q = MetricQuery(
        start=BASE + 3600, end=BASE + 3600 + 120, interval=60, ds_agg="sum",
        group_tag_keys=[], shift_seconds=3600,
    )
    vals = {r["bucket_ts"]: r["value"] for r in run_metric_query(pts, q).collect()}
    assert_close(vals[BASE + 3600], 2.0)
    assert_close(vals[BASE + 3660], 2.0)


def test_metric_query_validation():
    import pytest

    from opentsdb_aura_spark.plans.query import MetricQuery

    with pytest.raises(ValueError, match="empty query range"):
        MetricQuery(start=100, end=100)
    with pytest.raises(ValueError, match="interval must be positive"):
        MetricQuery(start=0, end=100, interval=0)
    with pytest.raises(ValueError, match="fill"):
        MetricQuery(start=0, end=100, fill="bogus")
