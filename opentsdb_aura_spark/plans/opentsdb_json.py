"""OpenTSDB 3.x semantic-query JSON → MetricQuery translator.

The reference is queried through OpenTSDB 3.x JSON query graphs: an
``executionGraph`` of nodes (TimeSeriesDataSource, downsample, rate,
groupby, timeshift) plus a ``filters`` list, which the planner folds
into the Aura source via pushdown (AuraMetricsSourceFactory.java:120-128;
filter translation QueryBuilderTSDBExt.java:48-120).  This module
gives users of the reference the same entry point: their existing
query JSON runs unchanged against the Spark engine.

Supported graph node types: TimeSeriesDataSource, downsample, rate,
groupby, timeshift folded into one MetricQuery (``translate_query``),
plus full DAGs with expression / summarizer / topn / movingaverage /
slidingwindow / ratio / fill / anomaly nodes (``run_semantic_graph``).
Supported filter types: MetricLiteral,
TagValueLiteralOr, TagValueRegex, TagValueWildcard, TagKeyLiteral,
Chain (AND/OR), Not, ExplicitTags, AnyFieldRegex, MatchAll.
"""

from __future__ import annotations

import math
import re
from typing import Any

from pyspark.sql import functions as F

from opentsdb_aura_spark.filters import (
    AnyFieldRegexp,
    Chain,
    ExplicitTags,
    Filter,
    MatchAll,
    MetricLiteral,
    Not,
    TagKeyPresent,
    TagLiteralOr,
    TagRegexp,
    TagWildcard,
)
from opentsdb_aura_spark.operators.rate import RateOptions
from opentsdb_aura_spark.plans.query import MetricQuery

#: duration suffixes, OpenTSDB notation (DateTime.parseDuration)
_UNITS = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800, "n": 2592000, "y": 31536000}


def parse_duration(text: str) -> int:
    """'1m' → 60, '2h' → 7200, '0all' → 0 (run-all sentinel).

    The engine's time resolution is whole epoch seconds, but upstream
    OpenTSDB accepts sub-second durations ('500ms'): those are
    COARSENED — rounded up to the next whole second — rather than
    rejected, keeping 3.x inputs drop-in.  Rounding up (never down)
    is deliberate: truncating '500ms' to 0 would silently become the
    run-all sentinel and halve rates via the or-1 fallback."""
    text = str(text).strip().lower()
    if text in ("0all", "all"):
        return 0
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h|d|w|n|y)", text)
    if not m:
        raise ValueError(f"unparseable duration: {text!r}")
    raw = float(m.group(1)) * _UNITS[m.group(2)]
    return max(1, math.ceil(raw)) if raw > 0 else 0


def parse_timestamp(value: Any, now: int) -> int:
    """Epoch seconds, epoch millis, or 'Xm-ago' relative notation."""
    if isinstance(value, (int, float)):
        v = int(value)
        return v // 1000 if v > 4_000_000_000 else v  # millis heuristic
    text = str(value).strip().lower()
    if text.endswith("-ago"):
        return now - parse_duration(text[:-4])
    if text == "now":
        return now
    return int(text)


def translate_filter(node: dict | None) -> Filter | None:
    """TSDB QueryFilter JSON → filter AST (QueryBuilderTSDBExt.java:60-120)."""
    if node is None:
        return None
    ftype = node.get("type", "").lower()
    if ftype == "metricliteral":
        return MetricLiteral(node.get("metric") or node.get("filter"))
    if ftype == "tagvalueliteralor":
        values = tuple(str(node["filter"]).split("|"))
        return TagLiteralOr(node["tagKey"], values)
    if ftype == "tagvalueregex":
        return TagRegexp(node["tagKey"], node["filter"])
    if ftype == "tagvaluewildcard":
        return TagWildcard(node["tagKey"], node["filter"])
    if ftype == "tagkeyliteral":
        return TagKeyPresent(node.get("filter") or node.get("tagKey"))
    if ftype == "anyfieldregex":
        return AnyFieldRegexp(node["filter"])
    if ftype == "chain":
        op = node.get("op", "AND").upper()
        members = [translate_filter(f) for f in node.get("filters", [])]
        return Chain(op, members)
    if ftype == "not":
        return Not(translate_filter(node["filter"]))
    if ftype == "explicittags":
        return ExplicitTags(translate_filter(node["filter"]))
    if ftype in ("matchall", ""):
        return MatchAll()
    raise ValueError(f"unsupported filter type: {node.get('type')!r}")


def translate_query(query: dict, *, now: int | None = None, segment_width: int | None = None) -> MetricQuery:
    """Semantic-query JSON (start/end, executionGraph, filters) →
    MetricQuery.  Node configs are folded exactly like the reference's
    pushdown: the graph ORDER is irrelevant — downsample/rate/groupby/
    timeshift configs attach to the single metric source."""
    import time as _time

    now = int(now if now is not None else _time.time())
    start = parse_timestamp(query["start"], now)
    end = parse_timestamp(query.get("end", now), now)

    filters_by_id = {f["id"]: f["filter"] for f in query.get("filters", [])}
    return _fold_nodes(query.get("executionGraph", []), filters_by_id, start, end, segment_width)


def _fold_nodes(
    graph_nodes: list[dict],
    filters_by_id: dict,
    start: int,
    end: int,
    segment_width: int | None,
) -> MetricQuery:
    """Fold a set of pipeline nodes (one datasource + its transform
    nodes) into a single MetricQuery, mirroring the reference's
    pushdown fold (AuraMetricsSourceFactory.java:120-128)."""
    flt: Filter | None = None
    interval: int | None = None
    ds_agg = "avg"
    run_all = False
    infectious = False
    rate_opts: RateOptions | None = None
    group_keys = None
    gb_agg = "sum"
    shift = 0
    fill = "nan"

    for node in graph_nodes:
        ntype = node.get("type", "").lower()
        if ntype in ("timeseriesdatasource", "datasource"):
            parts = []
            metric_node = node.get("metric")
            if metric_node:
                parts.append(translate_filter(metric_node))
            inline = node.get("filter")
            if inline:
                parts.append(translate_filter(inline))
            fid = node.get("filterId")
            if fid:
                parts.append(translate_filter(filters_by_id[fid]))
            if len(parts) == 1:
                flt = parts[0]
            elif parts:
                flt = Chain("AND", parts)
        elif ntype == "downsample":
            ds_agg = node.get("aggregator", "avg")
            iv = node.get("interval", "1m")
            interval = parse_duration(iv)
            if interval == 0 or node.get("runAll"):
                run_all, interval = True, None
            infectious = bool(node.get("infectiousNan", False))
            # upstream DownsampleConfig.fill: true → emit the dense NaN
            # spine (NaN interpolator, the reference default); false →
            # only buckets with data
            fill = "nan" if node.get("fill", True) else "none"
        elif ntype == "rate":
            rate_opts = RateOptions(
                interval_seconds=parse_duration(node.get("interval", "1s")) or 1,
                counter=bool(node.get("counter", False)),
                drop_resets=bool(node.get("dropResets", False)),
                counter_max=float(node.get("counterMax", float("inf"))),
                reset_value=float(node.get("resetValue", 0)),
                delta_only=bool(node.get("deltaOnly", False)),
                rate_to_count=bool(node.get("rateToCount", False)),
                data_interval=parse_duration(node["dataInterval"]) if node.get("dataInterval") else 0,
            )
        elif ntype == "groupby":
            group_keys = list(node.get("tagKeys", []))
            gb_agg = node.get("aggregator", "sum")
        elif ntype == "timeshift":
            shift = parse_duration(node.get("interval", "0s"))
        else:
            # silent node drops would return un-processed series to a
            # client that asked for (e.g.) a summarizer — refuse, and
            # point at the DAG runner that DOES handle those nodes
            raise ValueError(
                f"translate_query cannot fold node type {node.get('type')!r}; "
                "use run_semantic_graph for expression/summarizer/topn/... DAG nodes"
            )

    kw: dict[str, Any] = dict(
        start=start,
        end=end,
        filter=flt,
        interval=interval,
        ds_agg=ds_agg,
        run_all=run_all,
        infectious_nan=infectious,
        rate_options=rate_opts,
        group_tag_keys=group_keys,
        gb_agg=gb_agg,
        shift_seconds=shift,
        fill=fill,
    )
    if segment_width is not None:
        kw["segment_width"] = segment_width
    return MetricQuery(**kw)


#: node types that fold into a single MetricQuery pipeline
_PIPELINE_TYPES = {"timeseriesdatasource", "datasource", "downsample", "rate", "groupby", "timeshift"}


def run_semantic_graph(points, query: dict, *, now: int | None = None, segment_width: int | None = None):
    """Execute a FULL query graph — including ``expression``,
    ``summarizer`` and ``topn`` nodes — against a points DataFrame.

    ``translate_query`` handles the single-pipeline case; this handles
    DAGs: each expression/summarizer node names its ``sources``, each
    source branch is a linear pipeline down to a datasource that folds
    into one MetricQuery, and branch results are combined with the
    expression/summarizer operators.  Expression variables are node
    ids (e.g. ``{"id": "e1", "type": "expression", "expression":
    "m1 / m2 * 100", "sources": ["m1", "m2"]}``), matching the
    upstream OpenTSDB ExpressionConfig contract.

    Returns the DataFrame of the single sink node.
    """
    import time as _time

    from opentsdb_aura_spark.operators.expression import evaluate_expression
    from opentsdb_aura_spark.operators.summarizer import summarize, topn
    from opentsdb_aura_spark.plans.query import run_metric_query

    now = int(now if now is not None else _time.time())
    start = parse_timestamp(query["start"], now)
    end = parse_timestamp(query.get("end", now), now)
    filters_by_id = {f["id"]: f["filter"] for f in query.get("filters", [])}

    nodes = list(query.get("executionGraph", []))
    by_id: dict[str, dict] = {}
    for i, node in enumerate(nodes):
        by_id[str(node.get("id", f"_n{i}"))] = node

    referenced = {s for n in nodes for s in n.get("sources", [])}
    sinks = [nid for nid in by_id if nid not in referenced]
    if len(sinks) != 1:
        raise ValueError(f"query graph must have exactly one sink node, found {sorted(sinks)}")

    def collect_chain(nid: str) -> list[dict]:
        """Walk a linear pipeline from ``nid`` down to its datasource."""
        chain: list[dict] = []
        cur: str | None = nid
        while cur is not None:
            node = by_id.get(cur)
            if node is None:
                raise ValueError(f"unknown node id {cur!r} in graph")
            ntype = node.get("type", "").lower()
            if ntype not in _PIPELINE_TYPES:
                raise ValueError(
                    f"node {cur!r} of type {node.get('type')!r} cannot appear inside a pipeline branch"
                )
            chain.append(node)
            srcs = node.get("sources", [])
            if len(srcs) > 1:
                raise ValueError(f"pipeline node {cur!r} has multiple sources {srcs}")
            cur = srcs[0] if srcs else None
        return chain

    memo: dict[str, object] = {}

    def run_node(nid: str):
        if nid in memo:
            return memo[nid]
        node = by_id[nid]
        ntype = node.get("type", "").lower()
        if ntype == "expression":
            expr = node.get("expression") or node.get("expressionConfig", {}).get("expression")
            if not expr:
                raise ValueError(f"expression node {nid!r} missing 'expression'")
            sources = {s: run_node(s) for s in node.get("sources", [])}
            join_cfg = node.get("join") or {}
            join_type = str(join_cfg.get("joinType", "NATURAL_OUTER")).lower()
            df = evaluate_expression(
                sources,
                expr,
                join_type=join_type,
                substitute_missing=node.get("substituteMissing"),
            )
        elif ntype == "summarizer":
            src = run_node(node["sources"][0])
            group_cols = [c for c in src.columns if c not in ("bucket_ts", "value")]
            df = summarize(src, node.get("summaries", ["avg"]), group_cols=group_cols)
        elif ntype == "movingaverage":
            # upstream MovingAverageConfig, simple (unweighted) mode
            # with a sample count (net.opentsdb.query.processor
            # .movingaverage); interval mode maps to samples via the
            # upstream downsample interval
            from opentsdb_aura_spark.operators.analytic import moving_average

            src = run_node(node["sources"][0])
            df = moving_average(src, int(node.get("samples", 5)))
        elif ntype == "slidingwindow":
            # upstream SlidingWindowConfig: windowSize duration +
            # aggregator (net.opentsdb.query.processor.slidingwindow)
            from opentsdb_aura_spark.operators.analytic import sliding_window

            src = run_node(node["sources"][0])
            df = sliding_window(
                src,
                parse_duration(node.get("windowSize", "5m")),
                node.get("aggregator", "avg"),
            )
        elif ntype in ("merge", "merger"):
            # upstream HA Merger (net.opentsdb.query.processor.merge):
            # redundant sources (two datacenters answering one query)
            # merge per (series, bucket) with an aggregator; max is the
            # HA default (pick the most complete answer)
            from opentsdb_aura_spark.operators.groupby import group_merge

            srcs = [run_node(s) for s in node.get("sources", [])]
            if not srcs:
                raise ValueError(f"merger node {nid!r} has no sources")
            df = srcs[0]
            for other in srcs[1:]:
                df = df.unionByName(other)
            keys = [c for c in df.columns if c not in ("bucket_ts", "value")]
            df = group_merge(df, node.get("aggregator", "max"), group_cols=keys)
        elif ntype == "fill":
            # gap-fill policy over the upstream result: 'previous'
            # carries the last real value forward, 'linear'
            # interpolates between neighbors (the engine's analytic
            # gap-fill node; upstream expresses the same via
            # interpolatorConfigs on consuming nodes)
            from opentsdb_aura_spark.operators.analytic import fill_gaps

            src = run_node(node["sources"][0])
            df = fill_gaps(src, node.get("policy", "previous"))
        elif ntype == "anomaly":
            # trailing-window anomaly scoring (the baseline of the
            # upstream 3.x anomaly processor family: observed vs
            # expected from recent history)
            from opentsdb_aura_spark.operators.analytic import rolling_zscore

            src = run_node(node["sources"][0])
            group_cols = [c for c in src.columns if c not in ("bucket_ts", "value", "zscore")]
            df = rolling_zscore(
                src,
                lookback=int(node.get("lookback", 7)),
                min_history=int(node.get("minHistory", 3)),
                # group-all branches have NO group columns: an empty
                # list is a valid single global partition, not a miss
                group_cols=group_cols,
            )
        elif ntype == "ratio":
            # upstream RatioConfig (net.opentsdb.query.processor.ratio)
            from opentsdb_aura_spark.operators.analytic import ratio

            src = run_node(node["sources"][0])
            df = ratio(src, as_percent=bool(node.get("as_percent", node.get("asPercent", False))))
        elif ntype == "topn":
            # upstream TopNConfig: count, top (true=descending), and the
            # ranking aggregator (net.opentsdb.query.processor.topn)
            src = run_node(node["sources"][0])
            group_cols = [c for c in src.columns if c not in ("bucket_ts", "value")]
            df = topn(
                src,
                int(node.get("count", 10)),
                node.get("aggregator", "avg"),
                top=bool(node.get("top", True)),
                group_cols=group_cols,
            )
        else:
            q = _fold_nodes(collect_chain(nid), filters_by_id, start, end, segment_width)
            df = run_metric_query(points, q)
        memo[nid] = df
        return df

    return run_node(sinks[0])


#: hard ceiling on the number of response cells (series × buckets, or
#: raw rows on the no-interval path) ONE render call may collect to
#: the driver.  The effective truncation cap is clamped to this, so no
#: combination of caller knobs can turn the serdes ``limit()`` into an
#: unbounded driver collect; a RESULT larger than the ceiling raises
#: the exceeds-cap error (pinned by tests/test_opentsdb_json.py).
MAX_RESPONSE_CELLS = 50_000_000


def render_v3_response(
    res: "DataFrame",
    start: int,
    end: int,
    interval: int | None,
    *,
    metric: str | None = None,
    source: str = "groupby",
    max_series: int = 100_000,
    max_points: int = 10_000_000,
) -> dict:
    """Serialize a query result DataFrame into the OpenTSDB 3.x JSON
    response shape (upstream JsonV3QuerySerdes: ``{"results": [{
    "source", "timeSpecification", "data": [{"metric", "tags",
    "NumericArrayType": [...]}]}]}``) — the other half of the API loop
    that ``translate_query`` opens: a 3.x client POSTs its query JSON
    and reads this back, so the engine is drop-in on both sides.  The
    reference hands upstream TimeSeries objects (metric + tags +
    numeric iterators, AuraMetricsTimeSeries.java:213-264) to that
    same serdes.

    Expects the engine's (group…, bucket_ts, value) result shape.
    With ``interval`` the values densify onto the query grid as
    ``NumericArrayType`` (one slot per bucket; missing/NaN → null —
    JSON has no NaN; upstream's "NaN" string is a Jackson extension);
    a row whose ``bucket_ts`` is off the ``start + i*interval`` grid
    (e.g. the result was computed at a different interval) raises
    instead of being silently dropped.  The collect is the response
    materialization itself — bounded by the aggregated output size:
    ``max_series × n_buckets`` rows on the gridded path, ``max_points``
    rows on the no-interval (raw NumericType) path, where few series ×
    many timestamps is legitimate and a series-count cap would falsely
    reject it.  Either way the effective cap is CLAMPED to
    ``MAX_RESPONSE_CELLS`` — the product of reasonable knobs can be
    astronomical (100k series × 1440 one-minute buckets), which is
    fine as a truncation-detection bound but must never become the
    ``limit()`` the driver actually collects; a RESULT bigger than the
    ceiling raises the same exceeds-cap error as any truncation.
    """
    if int(end) <= int(start):
        raise ValueError("render_v3_response needs start < end")
    # slot count covers the partial final bucket too (the engine emits
    # a value for it; floor division would silently drop it)
    n_buckets = math.ceil((int(end) - int(start)) / int(interval)) if interval else None
    group_cols = [c for c in res.columns if c not in ("bucket_ts", "value")]
    # restrict to the render window BEFORE collecting: a sub-window
    # render of a wider result must neither drag out-of-window rows to
    # the driver nor count them against the cap (buckets outside
    # [start, window end) are simply not part of this response)
    window_end = int(start) + n_buckets * int(interval) if interval else int(end)
    res = res.where(
        (F.col("bucket_ts") >= F.lit(int(start))) & (F.col("bucket_ts") < F.lit(window_end))
    )
    # cap = the response's own maximum size + 1 row so truncation is
    # DETECTED and raised, never silent
    cap = min(max_series * n_buckets if interval else max_points, MAX_RESPONSE_CELLS)
    rows = res.limit(cap + 1).collect()
    if len(rows) > cap:
        detail = (
            f"{max_series} series x {n_buckets} buckets"
            if interval
            else f"max_points={max_points} raw rows"
        )
        raise ValueError(f"result exceeds the response cap ({detail})")
    series: dict[tuple, dict[int, float]] = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        series.setdefault(key, {})[int(r["bucket_ts"])] = r["value"]
    if len(series) > max_series:
        raise ValueError(f"result has more than max_series={max_series} groups")

    def clean(v):
        return None if v is None or (isinstance(v, float) and math.isnan(v)) else v

    data = []
    for key in sorted(series, key=lambda k: tuple(str(x) for x in k)):
        pts = series[key]
        tags = {
            (c[4:] if c.startswith("tag_") else c): key[i] for i, c in enumerate(group_cols)
        }
        entry: dict = {"metric": metric or "", "tags": tags}
        if interval:
            # every observed bucket must land on the query grid — a
            # result computed with a different interval would otherwise
            # be silently omitted from the array.  (Out-of-window rows
            # never reach here: the pre-collect window filter excludes
            # them, which is what makes sub-window rendering legal.)
            stragglers = [ts for ts in pts if (ts - int(start)) % int(interval) != 0]
            if stragglers:
                raise ValueError(
                    f"result bucket_ts {stragglers[:3]} not on the query grid "
                    f"(start={start}, interval={interval}) — was the result "
                    "computed with a different interval?"
                )
            entry["NumericArrayType"] = [
                clean(pts.get(int(start) + i * int(interval))) for i in range(n_buckets)
            ]
        else:
            entry["NumericType"] = {str(ts): clean(v) for ts, v in sorted(pts.items())}
        data.append(entry)
    spec = {"start": int(start), "end": int(end)}
    if interval:
        spec["interval"] = f"{int(interval)}s"
    return {"results": [{"source": source, "timeSpecification": spec, "data": data}]}
