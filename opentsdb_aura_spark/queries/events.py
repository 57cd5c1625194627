"""Event-store queries (E1-E6, L1-L3).

Split from the monolithic catalog.py (round 5): registration
side-effects only — query names, oracles, and behavior unchanged.
"""

from __future__ import annotations

from opentsdb_aura_spark.queries.base import *  # noqa: F401,F403
from opentsdb_aura_spark.queries.base import (  # shared underscore helpers
    _bucket_sql,
    _ds_by_metric,
    _ds_by_metric_sql,
    _mq,
    _r,
    _rollup,
)


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
