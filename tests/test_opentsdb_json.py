"""OpenTSDB 3.x JSON query translation + end-to-end execution."""

import math

from conftest import BASE, assert_close

from opentsdb_aura_spark.filters import Chain, MetricLiteral, Not, TagLiteralOr, TagRegexp
from opentsdb_aura_spark.plans.opentsdb_json import parse_duration, parse_timestamp, translate_filter, translate_query
from opentsdb_aura_spark.plans.query import run_metric_query


def test_parse_duration():
    assert parse_duration("30s") == 30
    assert parse_duration("1m") == 60
    assert parse_duration("2h") == 7200
    assert parse_duration("1d") == 86400
    assert parse_duration("0all") == 0
    # sub-second upstream durations coarsen UP to whole seconds (the
    # engine's resolution): never down to the 0 run-all sentinel
    assert parse_duration("500ms") == 1
    assert parse_duration("1500ms") == 2
    assert parse_duration("0.5s") == 1
    assert parse_duration("0ms") == 0


def test_parse_timestamp():
    assert parse_timestamp(1704067200, now=0) == 1704067200
    assert parse_timestamp(1704067200000, now=0) == 1704067200  # millis
    assert parse_timestamp("1h-ago", now=BASE + 3600) == BASE
    assert parse_timestamp("now", now=42) == 42


def test_translate_filter_tree():
    flt = translate_filter(
        {
            "type": "Chain",
            "op": "AND",
            "filters": [
                {"type": "TagValueLiteralOr", "tagKey": "host", "filter": "web01|web02"},
                {"type": "Not", "filter": {"type": "TagValueRegex", "tagKey": "dc", "filter": "^east$"}},
            ],
        }
    )
    assert isinstance(flt, Chain)
    assert flt.members[0] == TagLiteralOr("host", ("web01", "web02"))
    assert flt.members[1] == Not(TagRegexp("dc", "^east$"))


def test_translate_and_run_full_graph(make_points):
    # 2 hosts, 1 point/min for 4 min; query: rate(1m) → ds sum 2m → gb sum by host
    rows = []
    for host, base_v in [("a", 0.0), ("b", 100.0)]:
        for i in range(5):
            rows.append(("sys.cpu.user", {"host": host, "dc": "east"}, BASE + 60 * i, base_v + 60 * i))
    pts = make_points(rows)

    query = {
        "start": BASE,
        "end": BASE + 300,
        "filters": [
            {
                "id": "f1",
                "filter": {"type": "TagValueLiteralOr", "tagKey": "dc", "filter": "east"},
            }
        ],
        "executionGraph": [
            {
                "id": "m1",
                "type": "TimeSeriesDataSource",
                "metric": {"type": "MetricLiteral", "metric": "sys.cpu.user"},
                "filterId": "f1",
            },
            {"id": "rate", "type": "rate", "interval": "1m", "sources": ["m1"]},
            {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "2m", "sources": ["rate"]},
            {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds"]},
        ],
    }
    q = translate_query(query, now=BASE + 300)
    assert q.start == BASE and q.end == BASE + 300
    assert q.interval == 120 and q.ds_agg == "sum" and q.group_tag_keys == ["host"]
    assert isinstance(q.filter, Chain) and isinstance(q.filter.members[0], MetricLiteral)
    assert q.rate_options.interval_seconds == 60

    res = run_metric_query(pts, q)
    vals = {(r["tag_host"], r["bucket_ts"]): r["value"] for r in res.collect()}
    # per-minute rate is 60 per minute → 1.0/min normalized → value 60/60=60? rate per 1m interval:
    # delta=60 over dt=60s, dr=dt/60=1 → rate 60; first point NaN.
    # bucket0 [0,120): points at 0(NaN),60(60) → sum 60; bucket1: 60+60=120; bucket2: 60
    for host in ("a", "b"):
        assert_close(vals[(host, BASE)], 60.0)
        assert_close(vals[(host, BASE + 120)], 120.0)
        assert_close(vals[(host, BASE + 240)], 60.0)


def test_runall_and_relative_time(make_points):
    pts = make_points([("m", {}, BASE + i, 1.0) for i in range(60)])
    query = {
        "start": BASE,
        "end": BASE + 60,
        "executionGraph": [
            {"id": "m1", "type": "TimeSeriesDataSource", "metric": {"type": "MetricLiteral", "metric": "m"}},
            {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "0all"},
        ],
    }
    q = translate_query(query, now=BASE + 60)
    assert q.run_all
    res = run_metric_query(pts, q)
    rows = res.collect()
    assert len(rows) == 1
    assert_close(rows[0]["value"], 60.0)


def test_topn_graph_node(make_points):
    """topn node: top-2 hosts by summed daily value, winners keep
    their full series rows; bottom-2 via top=false."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    rows = []
    for i, host in enumerate(("a", "b", "c", "d")):
        for m in range(3):
            rows.append(("m", {"host": host}, BASE + m * 60, float((i + 1) * 10)))
    pts = make_points(rows)

    def graph(top):
        return {
            "start": BASE,
            "end": BASE + 180,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m", "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds"]},
                {"id": "top", "type": "topn", "count": 2, "top": top, "aggregator": "sum", "sources": ["gb"]},
            ],
        }

    res = run_semantic_graph(pts, graph(True), now=BASE + 180)
    assert {r["tag_host"] for r in res.collect()} == {"c", "d"}
    assert res.count() == 2 * 3  # winners keep every bucket row

    res_bottom = run_semantic_graph(pts, graph(False), now=BASE + 180)
    assert {r["tag_host"] for r in res_bottom.collect()} == {"a", "b"}


def test_movingaverage_and_ratio_graph_nodes(make_points):
    """movingaverage: trailing-3 simple average per series; ratio:
    percent of per-bucket total across series."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    rows = []
    for i, host in enumerate(("a", "b")):
        for m in range(4):
            rows.append(("m", {"host": host}, BASE + m * 60, float((i + 1) * (m + 1))))
    pts = make_points(rows)

    def graph(tail_node):
        return {
            "start": BASE,
            "end": BASE + 240,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m", "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds"]},
                tail_node,
            ],
        }

    ma = run_semantic_graph(
        pts,
        graph({"id": "ma", "type": "movingaverage", "samples": 3, "sources": ["gb"]}),
        now=BASE + 240,
    )
    got = {(r["tag_host"], r["bucket_ts"]): r["value"] for r in ma.collect()}
    # host a values 1,2,3,4 → trailing-3 averages 1, 1.5, 2, 3
    assert_close(got[("a", BASE)], 1.0)
    assert_close(got[("a", BASE + 60)], 1.5)
    assert_close(got[("a", BASE + 120)], 2.0)
    assert_close(got[("a", BASE + 180)], 3.0)

    rt = run_semantic_graph(
        pts,
        graph({"id": "rt", "type": "ratio", "as_percent": True, "sources": ["gb"]}),
        now=BASE + 240,
    )
    got = {(r["tag_host"], r["bucket_ts"]): r["value"] for r in rt.collect()}
    # bucket 0: a=1, b=2 → shares 33.33 / 66.67
    assert_close(got[("a", BASE)], 100.0 / 3)
    assert_close(got[("b", BASE)], 200.0 / 3)


def test_slidingwindow_graph_node(make_points):
    """slidingwindow: trailing time-window sum per series, windowSize
    parsed from the upstream duration notation."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    rows = []
    for m in range(4):
        rows.append(("m", {"host": "a"}, BASE + m * 60, float(m + 1)))
    pts = make_points(rows)

    res = run_semantic_graph(
        pts,
        {
            "start": BASE,
            "end": BASE + 240,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m", "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds"]},
                {"id": "sw", "type": "slidingwindow", "windowSize": "2m", "aggregator": "sum", "sources": ["gb"]},
            ],
        },
        now=BASE + 240,
    )
    got = {r["bucket_ts"]: r["value"] for r in res.collect()}
    # values 1,2,3,4 → trailing 2-minute sums 1, 3, 5, 7
    assert got[BASE] == 1.0
    assert got[BASE + 60] == 3.0
    assert got[BASE + 120] == 5.0
    assert got[BASE + 180] == 7.0


def test_fill_and_anomaly_graph_nodes(make_points):
    """fill: previous-value carry-forward over the NaN spine; anomaly:
    trailing z-score of each bucket vs its recent history."""
    import math

    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    rows = [("m", {"host": "a"}, BASE + m * 60, float(m + 1)) for m in (0, 1, 3)]
    pts = make_points(rows)

    def graph(tail):
        return {
            "start": BASE,
            "end": BASE + 240,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m", "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds"]},
                tail,
            ],
        }

    filled = run_semantic_graph(
        pts, graph({"id": "f", "type": "fill", "policy": "previous", "sources": ["gb"]}),
        now=BASE + 240,
    )
    got = {r["bucket_ts"]: r["value"] for r in filled.collect()}
    assert got[BASE + 120] == 2.0  # gap carries bucket 1's value forward

    anom = run_semantic_graph(
        pts, graph({"id": "an", "type": "anomaly", "lookback": 7, "minHistory": 2, "sources": ["gb"]}),
        now=BASE + 240,
    )
    rows_out = {r["bucket_ts"]: r for r in anom.collect()}
    assert "zscore" in anom.columns
    assert rows_out[BASE]["zscore"] is None  # no history yet
    late = rows_out[BASE + 180]["zscore"]
    assert late is None or not math.isnan(late)  # NaN-gap history → scored or null, never NaN


def test_merger_graph_node(make_points):
    """merger: two redundant sources merge per (series, bucket) with
    the HA default max aggregator — a value present in either source
    survives, disagreements resolve to the larger answer."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    rows = [("m", {"host": "a"}, BASE + m * 60, float(m + 1)) for m in range(3)]
    pts = make_points(rows)

    res = run_semantic_graph(
        pts,
        {
            "start": BASE,
            "end": BASE + 180,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds1", "type": "downsample", "aggregator": "sum", "interval": "1m", "sources": ["m1"]},
                {"id": "gb1", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds1"]},
                {"id": "ds2", "type": "downsample", "aggregator": "max", "interval": "1m", "sources": ["m1"]},
                {"id": "gb2", "type": "groupby", "aggregator": "max", "tagKeys": ["host"], "sources": ["ds2"]},
                {"id": "mg", "type": "merger", "aggregator": "max", "sources": ["gb1", "gb2"]},
            ],
        },
        now=BASE + 180,
    )
    got = {r["bucket_ts"]: r["value"] for r in res.collect()}
    # single point per bucket → sum == max → merged value = the point
    assert got[BASE] == 1.0 and got[BASE + 60] == 2.0 and got[BASE + 120] == 3.0


def test_downsample_fill_false_suppresses_spine(make_points):
    """DownsampleConfig.fill=false → only buckets with data; default
    (true) emits the dense NaN spine."""
    import math

    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    rows = [("m", {"host": "a"}, BASE + m * 60, 1.0) for m in (0, 3)]
    pts = make_points(rows)

    def graph(fill):
        return {
            "start": BASE,
            "end": BASE + 240,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m",
                 "fill": fill, "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"], "sources": ["ds"]},
            ],
        }

    dense = run_semantic_graph(pts, graph(True), now=BASE + 240).collect()
    sparse = run_semantic_graph(pts, graph(False), now=BASE + 240).collect()
    assert len(dense) == 4 and sum(1 for r in dense if math.isnan(r["value"])) == 2
    assert len(sparse) == 2 and all(not math.isnan(r["value"]) for r in sparse)


def test_percentile_downsample_graph_node(make_points):
    """Upstream OpenTSDB 3.x exposes percentile aggregators through the
    same downsample node ("p90"/"p99"/"median"); the JSON fold must
    pass them to the engine's percentile downsample unchanged."""
    rows = [("m", {"h": "a"}, BASE + i * 60, float(i)) for i in range(10)]
    pts = make_points(rows)
    query = {
        "start": BASE,
        "end": BASE + 600,
        "executionGraph": [
            {
                "id": "m1",
                "type": "TimeSeriesDataSource",
                "metric": {"type": "MetricLiteral", "metric": "m"},
            },
            {"id": "ds", "type": "downsample", "aggregator": "p90", "interval": "10m", "sources": ["m1"]},
            {"id": "gb", "type": "groupby", "aggregator": "max", "tagKeys": [], "sources": ["ds"]},
        ],
    }
    q = translate_query(query, now=BASE + 600)
    assert q.ds_agg == "p90" and q.interval == 600
    res = run_metric_query(pts, q).collect()
    # exact percentile(values 0..9, 0.9) = interpolated 8.1
    assert len(res) == 1
    assert_close(res[0]["value"], 8.1)


def test_render_v3_response_roundtrip(make_points):
    """Full API loop: 3.x query JSON in → engine → 3.x response JSON
    out.  Dense NumericArrayType on the query grid, NaN spine slots
    rendered as null, tags from group keys, valid JSON end-to-end."""
    import json

    from opentsdb_aura_spark.plans.opentsdb_json import render_v3_response

    rows = []
    for host in ("a", "b"):
        for i in (0, 1, 3):  # gap at minute 2
            rows.append(("m", {"host": host}, BASE + 60 * i, float(i + 1)))
    pts = make_points(rows)
    query = {
        "start": BASE,
        "end": BASE + 240,
        "executionGraph": [
            {
                "id": "m1",
                "type": "TimeSeriesDataSource",
                "metric": {"type": "MetricLiteral", "metric": "m"},
            },
            {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m",
             "fill": True, "sources": ["m1"]},
            {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["host"],
             "sources": ["ds"]},
        ],
    }
    q = translate_query(query, now=BASE + 240)
    res = run_metric_query(pts, q)
    out = render_v3_response(res, q.start, q.end, q.interval, metric="m")
    text = json.dumps(out)  # strict JSON: no NaN anywhere
    assert json.loads(text) == out
    (result,) = out["results"]
    assert result["timeSpecification"] == {"start": BASE, "end": BASE + 240, "interval": "60s"}
    by_host = {d["tags"]["host"]: d["NumericArrayType"] for d in result["data"]}
    assert by_host == {
        "a": [1.0, 2.0, None, 4.0],
        "b": [1.0, 2.0, None, 4.0],
    }
    assert all(d["metric"] == "m" for d in result["data"])


def test_render_v3_partial_final_bucket_and_caps(make_points):
    """The slot count must COVER a partial final bucket (the engine
    computes a value for it; floor division dropped it), and the
    response cap raises on truncation instead of silently dropping."""
    import pytest

    from opentsdb_aura_spark.plans.opentsdb_json import render_v3_response

    pts = make_points([("m", {"h": "a"}, BASE + 60 * i, float(i + 1)) for i in range(5)])
    q = translate_query(
        {
            "start": BASE,
            "end": BASE + 250,  # 4 full minutes + a 10s partial bucket
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m",
                 "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["h"],
                 "sources": ["ds"]},
            ],
        },
        now=BASE + 250,
    )
    res = run_metric_query(pts, q)
    out = render_v3_response(res, q.start, q.end, q.interval, metric="m")
    arr = out["results"][0]["data"][0]["NumericArrayType"]
    assert arr == [1.0, 2.0, 3.0, 4.0, 5.0]  # 5 slots: the partial bucket kept

    with pytest.raises(ValueError):
        render_v3_response(res, q.start, q.end, q.interval, max_series=0)
    with pytest.raises(ValueError):
        render_v3_response(res, BASE, BASE, 60)


def test_render_v3_collect_bounds_pinned(make_points, spark, monkeypatch):
    """The serdes collect stays bounded by construction: the default
    caps are pinned so a future 'raise the cap' edit can't silently
    make the driver-side collect unbounded, the effective cap CLAMPS
    to the hard ceiling (a 1-day/1-minute render at default max_series
    must not be rejected on the cap PRODUCT — only an actual oversized
    result raises), the no-interval path caps on POINTS (few series x
    many timestamps is legitimate), and off-grid bucket_ts raises
    instead of being silently dropped from the array — while on-grid
    buckets outside the render window are excluded (sub-window
    rendering), not errors."""
    import inspect

    import pytest

    from opentsdb_aura_spark.plans import opentsdb_json as oj

    sig = inspect.signature(oj.render_v3_response)
    assert sig.parameters["max_series"].default == 100_000
    assert sig.parameters["max_points"].default == 10_000_000
    assert oj.MAX_RESPONSE_CELLS == 50_000_000

    pts = make_points([("m", {"h": "a"}, BASE + 60 * i, float(i + 1)) for i in range(5)])
    res = run_metric_query(pts, translate_query(
        {
            "start": BASE,
            "end": BASE + 300,
            "executionGraph": [
                {"id": "m1", "type": "TimeSeriesDataSource",
                 "metric": {"type": "MetricLiteral", "metric": "m"}},
                {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1m",
                 "sources": ["m1"]},
                {"id": "gb", "type": "groupby", "aggregator": "sum", "tagKeys": ["h"],
                 "sources": ["ds"]},
            ],
        },
        now=BASE + 300,
    ))
    # a cap product beyond the ceiling (default 100k series x 1440
    # one-minute buckets = 144M) clamps: a small result still renders
    day = res  # 5 buckets of data rendered into a 1-day/1m window
    out = oj.render_v3_response(day, BASE, BASE + 86_400, 60)
    assert len(out["results"][0]["data"][0]["NumericArrayType"]) == 1440
    # ...and a result bigger than the (clamped) ceiling raises instead
    # of collecting unbounded
    monkeypatch.setattr(oj, "MAX_RESPONSE_CELLS", 3)
    with pytest.raises(ValueError, match="response cap"):
        oj.render_v3_response(res, BASE, BASE + 300, 60)
    monkeypatch.undo()

    # no-interval: 1 series x 5 timestamps must render even with
    # max_series=1 (the r4 row-cap falsely rejected this shape)
    raw = res.select("tag_h", "bucket_ts", "value")
    out = oj.render_v3_response(raw, BASE, BASE + 300, None, max_series=1)
    nt = out["results"][0]["data"][0]["NumericType"]
    assert len(nt) == 5
    # ...but max_points still bounds the collect
    with pytest.raises(ValueError, match="response cap"):
        oj.render_v3_response(raw, BASE, BASE + 300, None, max_points=3)

    # off-grid bucket_ts (result computed at 1m, rendered at 90s) raises
    with pytest.raises(ValueError, match="grid"):
        oj.render_v3_response(res, BASE, BASE + 300, 90)
    # on-grid buckets beyond the sub-window are excluded, not errors
    sub = oj.render_v3_response(res, BASE, BASE + 120, 60)
    assert len(sub["results"][0]["data"][0]["NumericArrayType"]) == 2
    # ...and out-of-window rows neither reach the driver nor count
    # against the cap: 1 series x 2-bucket window under cap 1*2 must
    # render even though the full result holds 5 rows
    sub2 = oj.render_v3_response(res, BASE, BASE + 120, 60, max_series=1)
    assert sub2["results"][0]["data"][0]["NumericArrayType"] == [1.0, 2.0]
