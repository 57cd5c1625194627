"""Expression + summarizer nodes (OpenTSDB 3.x graph processors)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import BASE, assert_close

from opentsdb_aura_spark.operators.expression import (
    evaluate_expression,
    parse_expression,
    variables,
)
from opentsdb_aura_spark.operators.summarizer import summarize
from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

DAY = 86400


# ---------------------------------------------------------------- parser


def test_parser_precedence_and_vars():
    ast = parse_expression("a + b * 2 - -c")
    assert variables(ast) == ["a", "b", "c"]
    # a + (b*2) - (-c)
    assert ast == ("-", ("+", ("var", "a"), ("*", ("var", "b"), ("num", 2.0))), ("neg", ("var", "c")))


def test_parser_parens_and_relational():
    ast = parse_expression("(a + b) / c >= 1.5")
    assert ast[0] == ">="
    with pytest.raises(ValueError):
        parse_expression("a +")
    with pytest.raises(ValueError):
        parse_expression("a ! b")
    with pytest.raises(ValueError):
        parse_expression("(a + b")


# ------------------------------------------------------------- evaluator


def _series(spark, rows):
    """rows: (key, bucket_ts, value) → DataFrame(tag_h, bucket_ts, value)."""
    return spark.createDataFrame(
        [(k, int(t), float(v)) for k, t, v in rows], "tag_h string, bucket_ts long, value double"
    )


def test_arithmetic_natural_outer_nan_for_missing(spark):
    a = _series(spark, [("x", BASE, 10.0), ("x", BASE + 60, 20.0)])
    b = _series(spark, [("x", BASE, 4.0), ("y", BASE, 1.0)])
    out = evaluate_expression({"a": a, "b": b}, "a - b").collect()
    got = {(r["tag_h"], r["bucket_ts"]): r["value"] for r in out}
    assert_close(got[("x", BASE)], 6.0)
    assert math.isnan(got[("x", BASE + 60)])  # b missing → NaN
    assert math.isnan(got[("y", BASE)])  # a missing → NaN
    assert len(got) == 3


def test_substitute_missing_and_inner_join(spark):
    a = _series(spark, [("x", BASE, 10.0), ("x", BASE + 60, 20.0)])
    b = _series(spark, [("x", BASE, 4.0)])
    sub = evaluate_expression({"a": a, "b": b}, "a + b", substitute_missing=0.0).collect()
    got = {r["bucket_ts"]: r["value"] for r in sub}
    assert_close(got[BASE], 14.0)
    assert_close(got[BASE + 60], 20.0)  # missing b → 0
    inner = evaluate_expression({"a": a, "b": b}, "a + b", join_type="inner").collect()
    assert len(inner) == 1


def test_divide_by_zero_is_nan_not_error(spark):
    a = _series(spark, [("x", BASE, 10.0)])
    b = _series(spark, [("x", BASE, 0.0)])
    out = evaluate_expression({"a": a, "b": b}, "a / b").collect()
    assert math.isnan(out[0]["value"])
    out = evaluate_expression({"a": a, "b": b}, "a % b").collect()
    assert math.isnan(out[0]["value"])


def test_scalar_affine_and_relational(spark):
    a = _series(spark, [("x", BASE, 10.0), ("x", BASE + 60, 1.0)])
    out = evaluate_expression({"a": a}, "a * 2 + 1").collect()
    got = {r["bucket_ts"]: r["value"] for r in out}
    assert_close(got[BASE], 21.0)
    assert_close(got[BASE + 60], 3.0)
    rel = evaluate_expression({"a": a}, "a > 5").collect()
    got = {r["bucket_ts"]: r["value"] for r in rel}
    assert_close(got[BASE], 1.0)
    assert_close(got[BASE + 60], 0.0)


def test_nan_operand_poisons_relational(spark):
    a = _series(spark, [("x", BASE, float("nan"))])
    out = evaluate_expression({"a": a}, "a > 5").collect()
    assert math.isnan(out[0]["value"])


def test_unknown_source_raises(spark):
    a = _series(spark, [("x", BASE, 1.0)])
    with pytest.raises(ValueError, match="unknown sources"):
        evaluate_expression({"a": a}, "a + zz")


# ------------------------------------------------------------ summarizer


def test_summarize_skips_nan_buckets(spark):
    df = _series(
        spark,
        [("x", BASE, 1.0), ("x", BASE + 60, float("nan")), ("x", BASE + 120, 5.0), ("y", BASE, 7.0)],
    )
    out = summarize(df, ["avg", "sum", "count", "min", "max", "first", "last"], group_cols=["tag_h"])
    got = {r["tag_h"]: r.asDict() for r in out.collect()}
    assert_close(got["x"]["avg"], 3.0)
    assert_close(got["x"]["sum"], 6.0)
    assert_close(got["x"]["count"], 2.0)
    assert_close(got["x"]["min"], 1.0)
    assert_close(got["x"]["max"], 5.0)
    assert_close(got["x"]["first"], 1.0)
    assert_close(got["x"]["last"], 5.0)
    assert_close(got["y"]["avg"], 7.0)


def test_summarize_all_nan_group_is_nan(spark):
    df = _series(spark, [("x", BASE, float("nan"))])
    got = summarize(df, ["avg", "count"], group_cols=["tag_h"]).collect()[0]
    assert math.isnan(got["avg"])
    assert_close(got["count"], 0.0)


def test_topn_keeps_k_best_series(spark):
    from opentsdb_aura_spark.operators.summarizer import topn

    df = _series(
        spark,
        [
            ("a", BASE, 1.0), ("a", BASE + 60, 1.0),
            ("b", BASE, 5.0), ("b", BASE + 60, 5.0),
            ("c", BASE, 3.0), ("c", BASE + 60, float("nan")),
            ("d", BASE, float("nan")),  # no data: never wins
        ],
    )
    keep = topn(df, 2, "sum", group_cols=["tag_h"])
    assert {r["tag_h"] for r in keep.collect()} == {"b", "c"}  # sums 10, 3
    # full interval rows survive, including the NaN bucket
    assert keep.where("tag_h = 'c'").count() == 2
    bottom = topn(df, 1, "sum", top=False, group_cols=["tag_h"])
    assert {r["tag_h"] for r in bottom.collect()} == {"a"}
    with pytest.raises(ValueError, match="positive"):
        topn(df, 0, "sum", group_cols=["tag_h"])


def test_topn_tie_breaks_by_group_key(spark):
    from opentsdb_aura_spark.operators.summarizer import topn

    df = _series(spark, [("x", BASE, 2.0), ("y", BASE, 2.0), ("z", BASE, 2.0)])
    keep = topn(df, 2, "sum", group_cols=["tag_h"])
    assert {r["tag_h"] for r in keep.collect()} == {"x", "y"}


# ------------------------------------------------------- graph execution


def test_graph_expression_end_to_end(make_points):
    pts = make_points(
        [
            ("m_num", {"h": "a"}, BASE + 10, 6.0),
            ("m_num", {"h": "a"}, BASE + DAY + 10, 9.0),
            ("m_den", {"h": "a"}, BASE + 10, 3.0),
            ("m_den", {"h": "a"}, BASE + DAY + 10, 0.0),
        ]
    )
    graph = {
        "start": BASE,
        "end": BASE + 2 * DAY,
        "executionGraph": [
            {"id": "num", "type": "TimeSeriesDataSource", "metric": {"type": "MetricLiteral", "metric": "m_num"}},
            {"id": "den", "type": "TimeSeriesDataSource", "metric": {"type": "MetricLiteral", "metric": "m_den"}},
            {"id": "ds_n", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["num"]},
            {"id": "ds_d", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["den"]},
            {"id": "gb_n", "type": "groupby", "tagKeys": [], "aggregator": "sum", "sources": ["ds_n"]},
            {"id": "gb_d", "type": "groupby", "tagKeys": [], "aggregator": "sum", "sources": ["ds_d"]},
            {
                "id": "ratio",
                "type": "expression",
                "expression": "gb_n / gb_d",
                "sources": ["gb_n", "gb_d"],
            },
        ],
    }
    out = run_semantic_graph(pts, graph)
    got = {r["bucket_ts"]: r["value"] for r in out.collect()}
    assert_close(got[BASE], 2.0)
    assert math.isnan(got[BASE + DAY])  # 9 / 0 → NaN


def test_graph_summarizer_over_pipeline(make_points):
    pts = make_points(
        [
            ("m", {"h": "a"}, BASE + 10, 1.0),
            ("m", {"h": "a"}, BASE + DAY + 10, 5.0),
            ("m", {"h": "b"}, BASE + 10, 10.0),
        ]
    )
    graph = {
        "start": BASE,
        "end": BASE + 2 * DAY,
        "executionGraph": [
            {"id": "m1", "type": "TimeSeriesDataSource", "metric": {"type": "MetricLiteral", "metric": "m"}},
            {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["m1"]},
            {"id": "gb", "type": "groupby", "tagKeys": ["h"], "aggregator": "sum", "sources": ["ds"]},
            {"id": "s", "type": "summarizer", "summaries": ["avg", "max"], "sources": ["gb"]},
        ],
    }
    got = {r["tag_h"]: r.asDict() for r in run_semantic_graph(pts, graph).collect()}
    assert_close(got["a"]["avg"], 3.0)
    assert_close(got["a"]["max"], 5.0)
    assert_close(got["b"]["avg"], 10.0)  # NaN day skipped


def test_graph_two_sinks_rejected(make_points):
    pts = make_points([("m", {}, BASE, 1.0)])
    graph = {
        "start": BASE,
        "end": BASE + DAY,
        "executionGraph": [
            {"id": "a", "type": "TimeSeriesDataSource", "metric": {"type": "MetricLiteral", "metric": "m"}},
            {"id": "b", "type": "TimeSeriesDataSource", "metric": {"type": "MetricLiteral", "metric": "m"}},
        ],
    }
    with pytest.raises(ValueError, match="one sink"):
        run_semantic_graph(pts, graph)


def test_topn_with_other_accounts_for_everything(spark):
    from opentsdb_aura_spark.operators.summarizer import topn_with_other

    rows = []
    for i, m in enumerate(("big", "mid", "small", "tiny")):
        for b in range(3):
            rows.append((m, b * 60, float((4 - i) * 10 + b)))
    df = spark.createDataFrame(rows, "metric string, bucket_ts long, value double")
    out = topn_with_other(df, 2, "sum", group_cols=["metric"]).collect()
    metrics = {r["metric"] for r in out}
    assert metrics == {"big", "mid", "__other__"}
    other = {r["bucket_ts"]: r["value"] for r in out if r["metric"] == "__other__"}
    # per bucket, other = small + tiny
    for b in range(3):
        assert other[b * 60] == (2 * 10 + b) + (1 * 10 + b)
    # total mass conserved
    assert abs(sum(r["value"] for r in out) - sum(v for _, _, v in rows)) < 1e-9
