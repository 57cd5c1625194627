"""Fused pipelines and later-round additions across domains
(funnels, sessionization, DAU/WAU, sketch serving, TPC-H extras).

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


# ============================================================ fused pipeline + extras


@register(
    "fused_rate_ds_gb",
    f"""{ORACLE_PTS},
rated AS (
  SELECT tag_user, tag_k, ts,
         (value - lag(value) OVER w) / (((ts - lag(ts) OVER w)) / 3600.0) AS r
  FROM dpts
  WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY ts)),
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, avg(r) AS v
  FROM rated WHERE r IS NOT NULL GROUP BY 1, 2, 3)
SELECT tag_user, bucket_ts, round(avg(v), 6) AS avg_rate
FROM per_series GROUP BY 1, 2""",
)
def fused_rate_ds_gb(spark, sf_dir):
    """§3.1 full pipeline: filter → rate → per-series daily AVG →
    group-by-user AVG merge (the flagship entry() query, with oracle)."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        rate_options=RateOptions(interval_seconds=3600),
        group_tag_keys=["user"],
        gb_agg="avg",
        fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    # the engine emits NaN group-intervals (all contributing rates
    # NaN); the SQL oracle can't express the NaN contract, so the
    # oracle-facing projection keeps defined intervals only
    return res.where(~F.isnan("value")).select(
        "tag_user", "bucket_ts", _r(F.col("value"), 6).alias("avg_rate")
    )


@register(
    "gb_two_keys_daily",
    f"""{ORACLE_PTS}
SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2, 3""",
)
def gb_two_keys_daily(spark, sf_dir):
    """G1 — group-by on two tag keys (sum decomposes flat)."""
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="sum",
        group_tag_keys=["user", "k"], gb_agg="sum", fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "meta_keys_and_values",
    f"""{ORACLE_PTS},
kv AS (
  SELECT 'user' AS tag_key, tag_user AS tag_value FROM series
  UNION ALL
  SELECT 'k' AS tag_key, tag_k AS tag_value FROM series)
SELECT tag_key, tag_value, CAST(count(*) AS BIGINT) AS series_count
FROM kv GROUP BY 1, 2""",
)
def meta_keys_and_values(spark, sf_dir):
    """M3 — full key→value→series-count breakdown (BASIC meta query)."""
    from opentsdb_aura_spark.operators.meta import tag_keys_and_values

    return tag_keys_and_values(series_dim(spark, sf_dir)).select(
        "tag_key", "tag_value", F.col("series_count").cast("bigint").alias("series_count")
    )


@register(
    "ev_paging_offset",
    """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_type
FROM events ORDER BY ts DESC, event_id DESC LIMIT 20 OFFSET 30""",
)
def ev_paging_offset(spark, sf_dir):
    """L2 — from/size paging (offset into the newest-first order)."""
    ev = events_seconds(spark, sf_dir)
    return top_n(ev, 20, offset=30).select("event_id", "ts", "event_type")


@register(
    "text_bpe_token_count",
    """SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents""",
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish token counting via an RE2-safe word-piece regex."""
    from opentsdb_aura_spark.operators.text import bpe_ish_token_count

    return bpe_ish_token_count(docs(spark, sf_dir))


@register("text_fingerprint")  # xxhash-chained: rows-only check
def text_fingerprint(spark, sf_dir):
    """Order-sensitive 64-bit document fingerprint (rolling-hash
    analogue, Catalyst-only)."""
    from opentsdb_aura_spark.operators.text import fingerprint

    return fingerprint(docs(spark, sf_dir))


@register(
    "infectious_nan_sum_daily",
    f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts,
       round(CASE WHEN count(CASE WHEN value < 20 THEN 1 END) > 0
                  THEN NULL ELSE sum(value) END, 4) AS sum_value
FROM dpts WHERE ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def infectious_nan_sum_daily(spark, sf_dir):
    """A9 — infectious NaN: values < 20 are recast as NaN on both
    sides; any NaN in an interval poisons it (NULL in the oracle
    projection).  Exercises the infectious path against real data."""
    pts = points(spark, sf_dir).withColumn(
        "value", F.when(F.col("value") < 20, F.lit(float("nan"))).otherwise(F.col("value"))
    )
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], infectious_nan=True, fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "filter_any_field",
    f"""{ORACLE_PTS}
SELECT metric, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE (regexp_matches(tag_user, '^1$') OR regexp_matches(tag_k, '^1$'))
  AND ts >= {START} AND ts < {END}
GROUP BY 1""",
)
def filter_any_field(spark, sf_dir):
    """F6 — any-field match: value regex against EVERY tag key."""
    from opentsdb_aura_spark.filters import AnyFieldRegexp, compile_filter, time_range

    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(AnyFieldRegexp("^1$")) & time_range(START, END))
    return df.groupBy("metric").agg(F.count("*").cast("bigint").alias("n_points"))


@register(
    "filter_tag_key_present",
    f"""{ORACLE_PTS}
SELECT metric, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE tag_k IS NOT NULL AND ts >= {START} AND ts < {END}
GROUP BY 1""",
)
def filter_tag_key_present(spark, sf_dir):
    """F5 — tag-key presence: series carrying tag key 'k' at all
    (value irrelevant) — the reference's key-existence filter."""
    from opentsdb_aura_spark.filters import TagKeyPresent, compile_filter, time_range

    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(TagKeyPresent("k")) & time_range(START, END))
    return df.groupBy("metric").agg(F.count("*").cast("bigint").alias("n_points"))


@register(
    "filter_match_all_series_count",
    f"""{ORACLE_PTS}
SELECT CAST(count(*) AS BIGINT) AS n_series FROM series""",
)
def filter_match_all_series_count(spark, sf_dir):
    """F9 — match-all: the wildcard-everything filter through the meta
    path counts every series (the `.*` fast path compiles to `true`,
    no regex evaluation)."""
    from opentsdb_aura_spark.filters import MatchAll, compile_filter

    dim = series_dim(spark, sf_dir).where(compile_filter(MatchAll()))
    return dim.agg(F.count("*").cast("bigint").alias("n_series"))


@register(
    "filter_explicit_tags",
    f"""{ORACLE_PTS}
SELECT metric, tag_user, CAST(count(*) AS BIGINT) AS n_points
FROM dpts
WHERE tag_user = '1' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def filter_explicit_tags(spark, sf_dir):
    """F8 — explicit-tags: filter on {user, k} requires series with
    exactly those two tag keys — which is every series here, so the
    result equals the plain filter (the count gate is exercised; its
    exclusion path is covered by unit tests)."""
    from opentsdb_aura_spark.filters import (
        Chain,
        ExplicitTags,
        TagLiteralOr,
        TagRegexp,
        compile_filter,
        time_range,
    )

    flt = ExplicitTags(Chain("AND", [TagLiteralOr("user", ("1",)), TagRegexp("k", ".*")]))
    pts = points(spark, sf_dir)
    df = pts.where(compile_filter(flt) & time_range(START, END))
    return df.groupBy("metric", "tag_user").agg(F.count("*").cast("bigint").alias("n_points"))


@register(
    "semi_join_series_points",
    f"""{ORACLE_PTS}
SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts
WHERE metric = 'purchase' AND CAST(tag_user AS BIGINT) < 5
  AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def semi_join_series_points(spark, sf_dir):
    """J1 — meta→data semi-join: series selected on the dimension
    table, then a left_semi join restricts the fact scan to those
    series ids (the doc-store search → series-table lookup fusion,
    TimeSeriesShard.java:677-758)."""
    sd = series_dim(spark, sf_dir).where(
        (F.col("metric") == "purchase") & (F.col("tags")["user"].cast("bigint") < 5)
    )
    pts = points(spark, sf_dir).join(
        sd.select("series_id"), "series_id", "left_semi"
    )
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "tpch_simple_filter_agg",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def tpch_simple_filter_agg(spark, sf_dir):
    """Relational health: TPC-H Q6-style selective filter + agg (all
    predicates push to the scan)."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register("meta_cardinality_approx")  # HLL sketch differs per engine: rows-only
def meta_cardinality_approx(spark, sf_dir):
    """M5 scale path — HLL cardinality (exact variant is oracle-checked
    in meta_cardinality)."""
    return cardinality(series_dim(spark, sf_dir), None, approx=True)


@register("rollup_hist_p90_daily")  # sketch-based pre-aggregate: rows-only
def rollup_hist_p90_daily(spark, sf_dir):
    """A6 scale path, pre-aggregate edition: daily p90 per metric
    served ENTIRELY from the hourly histogram rollup table (DDSketch
    bins written at ingest, operators/rollup.py) — the raw points are
    never scanned.  The plain aggregate chain can't serve percentiles
    (not mergeable); log-bucketed histograms are, with ≤1% relative
    error (bound-tested in tests/test_rollup.py)."""
    from opentsdb_aura_spark.operators.rollup import percentile_from_rollup_histogram
    from opentsdb_aura_spark.sources.batch import ensure_event_store, rollup_hist_path

    ensure_event_store(spark, sf_dir)
    hist = spark.read.parquet(rollup_hist_path(sf_dir, 3600))
    res = percentile_from_rollup_histogram(hist, 0.9, START, END, DAY, group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r("value", 4).alias("p90_hist"))


@register(
    "corpus_heavy_tokens_mg",
    """WITH toks AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '')) AS item
                   FROM documents),
cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS est_count FROM toks GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY est_count DESC, item) AS rn FROM cnt)
SELECT item, est_count FROM r WHERE rn <= 15""",
)
def corpus_heavy_tokens_mg(spark, sf_dir):
    """Heavy-hitter tokens via a mergeable Misra–Gries sketch
    (operators/sketch.py): per-partition bounded summaries merge in one
    hash aggregate — O(partitions × capacity) shuffle rows regardless
    of vocabulary size, vs O(distinct tokens) for the exact groupBy
    top-k.  At this corpus's vocabulary the capacity exceeds the
    distinct count, no trim fires, and the counts are provably exact —
    hence the exact-SQL oracle; the undercount guarantee when trims DO
    fire is bound-tested with a planted long-tail corpus in
    tests/test_sketch.py."""
    from opentsdb_aura_spark.operators.dedup_text import tokens
    from opentsdb_aura_spark.operators.sketch import mg_heavy_hitters

    toks = docs(spark, sf_dir).select(F.explode(tokens(F.col("text"))).alias("item"))
    out = mg_heavy_hitters(toks, "item", 15, capacity=4096)
    return out.select("item", "est_count")


@register(
    "corpus_heavy_tokens_by_lang_mg",
    """WITH toks AS (SELECT lang, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), _t -> _t <> '')) AS item
                   FROM documents),
cnt AS (SELECT lang, item, CAST(count(*) AS BIGINT) AS est_count FROM toks GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY est_count DESC, item) AS rn
      FROM cnt)
SELECT lang, item, est_count FROM r WHERE rn <= 5""",
)
def corpus_heavy_tokens_by_lang_mg(spark, sf_dir):
    """Grouped Misra–Gries: independent bounded summaries per language
    (sketch.mg_heavy_hitters group_cols path) — per-group state stays
    O(capacity) so a thousand languages cost the same per-partition
    memory budget as one.  Exact at this vocabulary (capacity ≥
    distinct), hence the SQL oracle."""
    from opentsdb_aura_spark.operators.dedup_text import tokens
    from opentsdb_aura_spark.operators.sketch import mg_heavy_hitters

    toks = docs(spark, sf_dir).select("lang", F.explode(tokens(F.col("text"))).alias("item"))
    out = mg_heavy_hitters(toks, "item", 5, capacity=4096, group_cols=["lang"])
    return out.select("lang", "item", "est_count")


@register("meta_daily_active_hll")  # HLL sketch estimates: rows-only
def meta_daily_active_hll(spark, sf_dir):
    """T6/M5 scale path — daily active-series counts per metric served
    ENTIRELY from the hourly HLL presence rollup (DataSketches HLL
    written at ingest, operators/meta.build_presence_hll): sketches
    merge with hll_union_agg, so any range/bucket re-aggregates the
    rollup table without touching raw points — plain distinct counts
    cannot do this (COUNT DISTINCT is not mergeable across windows).
    ~1.6% relative error at lg_k=12; bound-tested against the exact
    count in tests/test_rows_only_bounds.py."""
    from opentsdb_aura_spark.operators.meta import cardinality_from_presence_hll
    from opentsdb_aura_spark.sources.batch import ensure_event_store, presence_hll_path

    ensure_event_store(spark, sf_dir)
    hll = spark.read.parquet(presence_hll_path(sf_dir, 3600))
    res = cardinality_from_presence_hll(hll, START, START + 7 * DAY, bucket_width=DAY, group_cols=("metric",))
    return res.select("metric", "bucket_ts", "active_series")


@register("ds_p90_approx_daily")  # sketch-based: rows-only
def ds_p90_approx_daily(spark, sf_dir):
    """A6 scale path — approx_percentile; at 100 TB the exact
    percentile's per-group value buffer is the bottleneck, the sketch
    is mergeable map-side."""
    pts = points(spark, sf_dir).where((F.col("ts") >= START) & (F.col("ts") < END))
    bucket = (F.lit(START) + F.floor((F.col("ts") - F.lit(START)) / F.lit(DAY)) * F.lit(DAY)).cast("long")
    return (
        pts.withColumn("bucket_ts", bucket)
        .groupBy("metric", "bucket_ts")
        .agg(F.expr("approx_percentile(value, 0.9, 1000)").alias("p90_approx"))
    )


@register(
    "tpch_local_supplier_volume",
    """SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY 1""",
)
def tpch_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: five-way join with the local-supplier condition
    (customer and supplier in the same nation).  Only the fixed-size
    dims (nation, region) carry broadcast hints; customer/supplier/
    orders are O(SF) and left to AQE sizing.  The region filter
    reaches the nation join before any fact row is touched."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "tpch_semi_join_orders",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY 1""",
)
def tpch_semi_join_orders(spark, sf_dir):
    """Relational health: EXISTS → left_semi join."""
    ensure_session_confs(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_anti_join_customers",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1""",
)
def tpch_anti_join_customers(spark, sf_dir):
    """Relational health: NOT EXISTS → left_anti join (customers who
    never ordered)."""
    ensure_session_confs(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "tpch_promo_revenue",
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                    / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'""",
)
def tpch_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: selective fact filter, join to the part dim,
    conditional-aggregate ratio in one pass.  The month filter pushes
    to the lineitem scan; part is O(SF) so no forced broadcast — AQE
    size-picks (broadcast at bench SF)."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        _r(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
    )


@register(
    "tpch_large_orders",
    """SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total_price,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY 1 HAVING sum(l_quantity) > 300)
GROUP BY 1, 2, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20""",
)
def tpch_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate subquery (orders whose line quantities
    sum past a threshold) feeding a semi-join, then re-aggregate and
    top-20.  The HAVING pre-aggregate shrinks the fact table to a few
    keys before any dimension is touched; the final ordering is a
    TakeOrderedAndProject, not a global sort."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_q")).where(F.col("_q") > 300)
    return (
        li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(_r(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("c_name", "o_orderkey", _r("o_totalprice", 2).alias("total_price"), "total_qty")
    )


@register(
    "tpch_returned_items",
    """SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY 1, 2, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def tpch_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most last quarter — two fact
    filters (return flag on lineitem, quarter on orders) both push to
    their scans before the joins; top-20 via TakeOrderedAndProject."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(F.col("l_returnflag") == "R")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", _r("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "tpch_late_orders_priority",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1""",
)
def tpch_late_orders_priority(spark, sf_dir):
    """TPC-H Q4 shape (adapted: the driver's lineitem has no
    commit/receipt dates, so "late" = shipped >60 days after the order
    date): correlated EXISTS with a cross-table predicate → left_semi
    join carrying the inequality in the join condition; counts per
    priority after."""
    ensure_session_confs(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_order_count_distribution",
    """WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY 1""",
)
def tpch_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: per-customer order counts via a LEFT join (zero
    orders must count), then the distribution of those counts — an
    aggregate of an aggregate, two well-combined shuffles."""
    ensure_session_confs(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_small_quantity_revenue",
    """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)""",
)
def tpch_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) de-correlated into an aggregate + equi-join — the
    per-part averages frame is O(|part|), so AQE broadcast-picks it;
    the brand filter prunes the part dim before the fact join."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").where(F.col("p_brand") == "Brand#23")
    avg_q = li.groupBy("l_partkey").agg((F.lit(0.2) * F.avg("l_quantity")).alias("_thr"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_q.withColumnRenamed("l_partkey", "_pk"), F.col("l_partkey") == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("_thr"))
        .agg(_r(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "tpch_disjunctive_filter",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
)
def tpch_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive cross-table predicates.  The
    single-table residues of the OR (quantity ∈ [1,30]; brand ∈ the
    three literals) are stated explicitly so each reaches its own scan
    as a pushed filter — Catalyst does not factor disjunctions across
    a join on its own, and at 100 TB the unpushed variant reads every
    lineitem row."""
    ensure_session_confs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "tpch_idle_rich_customers",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1""",
)
def tpch_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average
    balance — a 1-row broadcast) gating an anti-join against the
    RECENT order log (customers idle since 2000; the date filter
    pushes to the orders scan before the anti-join, shrinking its
    build side the way Q22's window does)."""
    ensure_session_confs(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            _r(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "dedup_embedding_cosine",
    """WITH s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.embedding)+1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))) AS cs
  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cs, 6) AS cos_sim FROM s WHERE cs >= 0.45""",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs baseline; the
    LSH variant is the scale path, unit-tested)."""
    from opentsdb_aura_spark.operators.similarity import embedding_near_dup_pairs

    res = embedding_near_dup_pairs(embs(spark, sf_dir), threshold=0.45)
    return res.select("id_a", "id_b", _r(F.col("cos_sim"), 6).alias("cos_sim"))


_PROJ_COMPONENT = (
    "round(list_sum(list_transform(range(0, 64), d -> CAST(embedding[d + 1] AS DOUBLE)"
    " * ((CAST(concat('0x', substr(md5(d || ':' || {k} || ':proj'), 1, 8)) AS BIGINT)"
    " % 2001 - 1000) / 1000.0))), 6) AS p{k}"
)


@register(
    "emb_random_projection",
    "SELECT vec_id, "
    + ", ".join(_PROJ_COMPONENT.format(k=k) for k in range(8))
    + " FROM embeddings",
)
def emb_random_projection(spark, sf_dir):
    """JL-style 64→8-d random projection with an md5-derived
    deterministic matrix — the ANN pre-filter that cuts probe shuffle
    bytes 8×.  Pure zip_with/aggregate folds (whole-stage codegen, no
    UDF, narrow map); the oracle regenerates the same matrix from the
    md5 rule."""
    from opentsdb_aura_spark.operators.similarity import random_projection

    res = random_projection(embs(spark, sf_dir), in_dim=64, out_dim=8)
    return res.select("vec_id", *[_r(f"p{k}", 6).alias(f"p{k}") for k in range(8)])


@register(
    "emb_int8_quantize",
    """WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
         embedding
  FROM embeddings),
z AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)
                                            AS INT))
         END AS qv
  FROM q)
SELECT vec_id, round(scale, 6) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS INT) AS q_min,
       CAST(list_max(qv) AS INT) AS q_max
FROM z""",
)
def emb_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization (scale = max|v|,
    floor(x+0.5) rounding — engine-agnostic): 4× smaller vectors for
    billion-scale ANN storage; the oracle checks the exact quantized
    stream via sum/min/max."""
    from opentsdb_aura_spark.operators.similarity import int8_quantize

    res = int8_quantize(embs(spark, sf_dir))
    return res.select(
        "vec_id",
        _r("scale", 6).alias("scale"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


@register(
    "semdedup_embeddings",
    """WITH dup AS (
  SELECT a.vec_id, min(b.vec_id) AS dup_of
  FROM embeddings a JOIN embeddings b ON b.vec_id < a.vec_id
  WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
           * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))) >= 0.45
  GROUP BY 1)
SELECT e.vec_id, dup.dup_of IS NULL AS kept, CAST(0 AS INT) AS cluster_id, dup.dup_of
FROM embeddings e LEFT JOIN dup ON e.vec_id = dup.vec_id""",
)
def semdedup_embeddings(spark, sf_dir):
    """SemDeDup semantic dedup (greedy keep-lowest-id within cluster).
    Run with a single centroid the within-cluster scoring covers every
    pair, so the exact SQL self-join is a true oracle — the same trick
    as `ann_ivf_topk`'s full probe; production raises n_centroids so
    per-cluster pair work stays (n/k)²."""
    from opentsdb_aura_spark.operators.similarity import semantic_dedup

    return semantic_dedup(embs(spark, sf_dir), threshold=0.45, n_centroids=1)


@register(
    "opentsdb_json_query",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(max(value), 4) AS max_value
FROM dpts
WHERE metric = 'purchase' AND tag_user IN ('1', '2', '3')
  AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def opentsdb_json_query(spark, sf_dir):
    """API-surface parity: an OpenTSDB 3.x semantic-query JSON graph
    translated and executed unchanged (source + filter + downsample +
    group-by pushdown fold, §3.1)."""
    from opentsdb_aura_spark.plans.opentsdb_json import translate_query

    query = {
        "start": START,
        "end": END,
        "filters": [
            {"id": "f1", "filter": {"type": "TagValueLiteralOr", "tagKey": "user", "filter": "1|2|3"}}
        ],
        "executionGraph": [
            {
                "id": "m1",
                "type": "TimeSeriesDataSource",
                "metric": {"type": "MetricLiteral", "metric": "purchase"},
                "filterId": "f1",
            },
            {"id": "ds", "type": "downsample", "aggregator": "max", "interval": "1d", "sources": ["m1"]},
            {"id": "gb", "type": "groupby", "aggregator": "max", "tagKeys": ["user"], "sources": ["ds"]},
        ],
    }
    q = translate_query(query, now=END, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    q.fill = "none"
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("max_value"))


@register(
    "opentsdb_json_expr",
    f"""{ORACLE_PTS},
p AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
s AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
      FROM dpts WHERE metric = 'signup' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
diff AS (SELECT COALESCE(p.tag_user, s.tag_user) AS tag_user, p.v - s.v AS d
         FROM p FULL JOIN s ON p.tag_user = s.tag_user AND p.bucket_ts = s.bucket_ts)
SELECT tag_user, round(avg(d), 6) AS avg_value, CAST(count(d) AS DOUBLE) AS count_value
FROM diff GROUP BY 1""",
)
def opentsdb_json_expr(spark, sf_dir):
    """API-surface parity for expression+summarizer graphs: a
    reference-era JSON DAG — two grouped branches, an expression node
    (NATURAL_OUTER join, purchase − signup) and a summarizer sink —
    runs unchanged through run_semantic_graph.  A user-day present on
    one side only is NaN and skipped by the summarizer, matching the
    SQL NULL arithmetic."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    graph = {
        "start": START,
        "end": END,
        "executionGraph": [
            {"id": "p_src", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "purchase"}},
            {"id": "s_src", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "signup"}},
            {"id": "p_ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["p_src"]},
            {"id": "s_ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["s_src"]},
            {"id": "p", "type": "groupby", "tagKeys": ["user"], "aggregator": "sum", "sources": ["p_ds"]},
            {"id": "s", "type": "groupby", "tagKeys": ["user"], "aggregator": "sum", "sources": ["s_ds"]},
            {"id": "e", "type": "expression", "expression": "p - s", "sources": ["p", "s"]},
            {"id": "sm", "type": "summarizer", "summaries": ["avg", "count"], "sources": ["e"]},
        ],
    }
    res = run_semantic_graph(points(spark, sf_dir), graph, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    return res.select(
        "tag_user",
        _r(denan(F.col("avg")), 6).alias("avg_value"),
        F.col("count").alias("count_value"),
    )


@register(
    "opentsdb_json_topn",
    f"""{ORACLE_PTS},
agg AS (SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS v
        FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END} GROUP BY 1, 2),
winners AS (SELECT tag_user FROM agg GROUP BY 1
            ORDER BY sum(v) DESC, tag_user LIMIT 5),
days AS (SELECT unnest(generate_series({START}, {END - 1}, {DAY})) AS bucket_ts)
SELECT w.tag_user, d.bucket_ts, round(agg.v, 4) AS sum_value
FROM winners w CROSS JOIN days d
LEFT JOIN agg ON agg.tag_user = w.tag_user AND agg.bucket_ts = d.bucket_ts""",
)
def opentsdb_json_topn(spark, sf_dir):
    """API-surface parity for the upstream ``topn`` node: JSON graph
    source → daily SUM downsample → group-by user → top-5 users by
    total, returning the winners' full (dense NaN-spine) series."""
    from opentsdb_aura_spark.plans.opentsdb_json import run_semantic_graph

    graph = {
        "start": START,
        "end": END,
        "executionGraph": [
            {"id": "m", "type": "TimeSeriesDataSource",
             "metric": {"type": "MetricLiteral", "metric": "purchase"}},
            {"id": "ds", "type": "downsample", "aggregator": "sum", "interval": "1d", "sources": ["m"]},
            {"id": "gb", "type": "groupby", "tagKeys": ["user"], "aggregator": "sum", "sources": ["ds"]},
            {"id": "top", "type": "topn", "count": 5, "top": True, "aggregator": "sum", "sources": ["gb"]},
        ],
    }
    res = run_semantic_graph(points(spark, sf_dir), graph, segment_width=EVENT_STORE_SEGMENT_WIDTH)
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "gb_min_by_k_daily",
    f"""{ORACLE_PTS},
per_series AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, min(value) AS v
  FROM dpts WHERE metric = 'error' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3)
SELECT tag_k, bucket_ts, round(min(v), 4) AS min_value
FROM per_series GROUP BY 1, 2""",
)
def gb_min_by_k_daily(spark, sf_dir):
    """G1 — group-by on the k tag with MIN○MIN merge."""
    q = _mq(
        start=START, end=END, interval=DAY, ds_agg="min",
        filter=MetricLiteral("error"), group_tag_keys=["k"], gb_agg="min", fill="none",
    )
    res = run_metric_query(points(spark, sf_dir), q, dedupe=False)
    return res.select("tag_k", "bucket_ts", _r(denan(F.col("value")), 4).alias("min_value"))


@register(
    "ev_user_activity",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value,
       arg_max(event_type, CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id) AS last_type
FROM events GROUP BY 1""",
)
def ev_user_activity(spark, sf_dir):
    """E5 variant — per-user activity rollup with fetch-last type."""
    ev = events_seconds(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        _r(F.sum("value"), 4).alias("total_value"),
        F.max_by("event_type", F.col("ts") * 1000000 + F.col("event_id")).alias("last_type"),
    )


@register(
    "ev_wau_rolling",
    f"""WITH ud AS (
  SELECT DISTINCT
         (CAST(floor(epoch(ts)) AS BIGINT) - {START - 6 * DAY}) // 86400 - 6 AS d,
         user_id
  FROM events
  WHERE epoch(ts) >= {START - 6 * DAY} AND epoch(ts) < {START + 14 * DAY}),
days AS (SELECT range AS o FROM range(0, 14))
SELECT CAST({START} + o * 86400 AS BIGINT) AS day_ts,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM days JOIN ud ON ud.d BETWEEN o - 6 AND o
GROUP BY 1 ORDER BY 1""",
)
def ev_wau_rolling(spark, sf_dir):
    """Rolling 7-day active users (WAU) per day, exact: events dedupe
    to (day, user) FIRST — the distinct frame is |users × days|,
    orders smaller than the log — then each user-day explodes to the
    ≤7 output days it serves (a bounded fan-out, no range self-join,
    no skewable nested loop) and a distinct count per day finishes.
    The sketch twin is ev_wau_hll."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    ev = events_seconds(spark, sf_dir)
    res = rolling_active_users(ev, START, START + 14 * DAY, 7)
    return res.select("day_ts", F.col("active_users").cast("bigint").alias("active_users"))


@register(
    "ev_stickiness_daily",
    f"""WITH ud AS (
  SELECT DISTINCT
         (CAST(floor(epoch(ts)) AS BIGINT) - {START - 6 * DAY}) // 86400 - 6 AS d,
         user_id
  FROM events
  WHERE epoch(ts) >= {START - 6 * DAY} AND epoch(ts) < {START + 14 * DAY}),
days AS (SELECT range AS o FROM range(0, 14)),
wau AS (SELECT o, count(DISTINCT user_id) AS w
        FROM days JOIN ud ON ud.d BETWEEN o - 6 AND o GROUP BY 1),
dau AS (SELECT d AS o, count(DISTINCT user_id) AS a FROM ud WHERE d >= 0 GROUP BY 1)
SELECT CAST({START} + wau.o * 86400 AS BIGINT) AS day_ts,
       CAST(coalesce(dau.a, 0) AS BIGINT) AS dau,
       CAST(wau.w AS BIGINT) AS wau,
       round(coalesce(dau.a, 0) * 1.0 / wau.w, 6) AS stickiness
FROM wau LEFT JOIN dau USING (o) ORDER BY 1""",
)
def ev_stickiness_daily(spark, sf_dir):
    """Stickiness (DAU/WAU) per day — the engagement ratio every
    product dashboard plots; both counts come from the same
    dedupe-to-user-day frame (rolling_active_users' shape), joined on
    the day."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    ev = events_seconds(spark, sf_dir)
    wau = rolling_active_users(ev, START, START + 14 * DAY, 7).withColumnRenamed(
        "active_users", "wau"
    )
    dau = rolling_active_users(ev, START, START + 14 * DAY, 1).withColumnRenamed(
        "active_users", "dau"
    )
    return (
        wau.join(dau, "day_ts", "left")
        .select(
            "day_ts",
            F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            _r(F.coalesce(F.col("dau"), F.lit(0)) / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day_ts")
    )


@register("ev_wau_hll")  # HLL sketch estimates: rows-only
def ev_wau_hll(spark, sf_dir):
    """WAU from mergeable sketches: one HLL per day, each output day
    unions its trailing 7 — per-day work is 7 sketch rows instead of 7
    days of user-days, and the daily sketches are exactly what
    streaming ingest emits at window close (streaming_presence_hll),
    so the dashboard never recomputes distincts.  ±5% bound-tested
    against ev_wau_rolling in tests/test_rows_only_bounds.py."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    ev = events_seconds(spark, sf_dir)
    res = rolling_active_users(ev, START, START + 14 * DAY, 7, hll=True)
    return res.select("day_ts", F.col("active_users").cast("bigint").alias("active_users"))


@register(
    "ev_funnel_3step",
    f"""WITH e AS (SELECT user_id AS k, event_type AS t,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
s1 AS (SELECT k, min(ts) AS ts_1 FROM e WHERE t = 'signup' GROUP BY 1),
s2 AS (SELECT s1.k, ts_1,
              min(e.ts) FILTER (WHERE e.ts > ts_1 AND e.ts <= ts_1 + {3 * DAY}) AS ts_2
       FROM s1 LEFT JOIN e ON e.k = s1.k AND e.t = 'click' GROUP BY 1, 2),
s3 AS (SELECT s2.k, ts_1, ts_2,
              min(e.ts) FILTER (WHERE ts_2 IS NOT NULL AND e.ts > ts_2
                                AND e.ts <= ts_2 + {3 * DAY}) AS ts_3
       FROM s2 LEFT JOIN e ON e.k = s2.k AND e.t = 'purchase' GROUP BY 1, 2, 3)
SELECT k AS user_id, ts_1, ts_2, ts_3, ts_3 IS NOT NULL AS converted,
       CAST(ts_3 - ts_1 AS BIGINT) AS seconds_total FROM s3""",
)
def ev_funnel_3step(spark, sf_dir):
    """N-step ordered funnel (signup → click → purchase, each step
    within 3 days of the previous): greedy earliest-completion, one
    equi-join + filtered-min aggregate per step
    (events.funnel_steps) — no per-key event collection, no whole-
    history window, so a bot key cannot break the stage."""
    from opentsdb_aura_spark.operators.events import funnel_steps

    ev = events_seconds(spark, sf_dir)
    return funnel_steps(ev, ["signup", "click", "purchase"], 3 * DAY)


@register(
    "ev_cohort_retention_daily",
    """WITH a AS (
  SELECT DISTINCT user_id AS k,
         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS b
  FROM events),
f AS (SELECT k, min(b) AS cohort_ts FROM a GROUP BY 1),
cells AS (
  SELECT f.cohort_ts, (a.b - f.cohort_ts) // 86400 AS day_offset,
         CAST(count(DISTINCT a.k) AS BIGINT) AS n_active
  FROM a JOIN f USING (k) GROUP BY 1, 2)
SELECT cohort_ts, day_offset, n_active,
       max(CASE WHEN day_offset = 0 THEN n_active END) OVER (PARTITION BY cohort_ts) AS n_cohort,
       round(n_active * 1.0 / max(CASE WHEN day_offset = 0 THEN n_active END)
             OVER (PARTITION BY cohort_ts), 6) AS retention
FROM cells""",
)
def ev_cohort_retention_daily(spark, sf_dir):
    """Cohort retention matrix: users cohorted by first-activity day;
    each (cohort, day-offset) cell reports active members and the
    retention rate — the third leg of the event-analytics triad next
    to sessionization and funnels."""
    from opentsdb_aura_spark.operators.events import cohort_retention

    ev = events_seconds(spark, sf_dir).select("user_id", "ts")
    return cohort_retention(ev, 86400)


@register(
    "ev_funnel_signup_purchase",
    """WITH e AS (
  SELECT user_id AS k, event_type AS t, CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
f AS (SELECT k, ts FROM e WHERE t = 'signup'),
tt AS (SELECT k, ts FROM e WHERE t = 'purchase'),
m AS (SELECT tt.k, tt.ts,
             CASE WHEN f.ts IS NOT NULL AND tt.ts > f.ts AND tt.ts - f.ts <= 86400
                  THEN f.ts END AS valid_fts
      FROM tt ASOF LEFT JOIN f ON tt.k = f.k AND tt.ts >= f.ts),
conv AS (SELECT k, min(ts) AS convert_ts, arg_min(valid_fts, ts) AS matched_from_ts
         FROM m WHERE valid_fts IS NOT NULL GROUP BY 1),
ff AS (SELECT k, min(ts) AS first_from_ts FROM f GROUP BY 1)
SELECT ff.k AS user_id, ff.first_from_ts,
       conv.convert_ts IS NOT NULL AS converted, conv.convert_ts,
       CAST(conv.convert_ts - conv.matched_from_ts AS BIGINT) AS seconds_to_convert
FROM ff LEFT JOIN conv USING (k)""",
)
def ev_funnel_signup_purchase(spark, sf_dir):
    """Two-step funnel: per user, did a purchase follow a signup
    within 24 h?  Backward as-of join (one running-last window per
    user — no range join) + one aggregate; the oracle uses DuckDB's
    native ASOF JOIN."""
    from opentsdb_aura_spark.operators.events import funnel_conversion

    ev = events_seconds(spark, sf_dir).select("user_id", "event_type", "ts")
    return funnel_conversion(ev, "signup", "purchase", 86400)


@register(
    "ev_sessionize_users",
    """WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_id FROM events),
l AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS nf
  FROM e),
s AS (
  SELECT user_id, ts,
         sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM l)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY 1, 2""",
)
def ev_sessionize_users(spark, sf_dir):
    """Gap-based sessionization (30-min timeout) over the event store:
    one row per (user, session) with bounds and event count.  Runs the
    hot-key-bounded two-phase path (per-(user, day-block) local
    sessions + interval-merge stitch): window tasks stay bounded even
    for a bot user with 10⁸ events, and the result is identical to the
    classic single-window shape (equivalence asserted in tests)."""
    from opentsdb_aura_spark.operators.events import sessionize

    ev = events_seconds(spark, sf_dir).select("user_id", "ts", "event_id")
    return sessionize(ev, 1800, key_col="user_id", block_seconds=DAY).select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        "session_start",
        "session_end",
        "n_events",
    )


@register(
    "anomaly_zscore_daily",
    f"""{ORACLE_PTS},
agg AS (
  SELECT metric, {_bucket_sql(DAY)} AS bucket_ts, sum(value) AS sum_value
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2)
SELECT metric, bucket_ts, round(sum_value, 4) AS sum_value,
       round(CASE WHEN count(sum_value) OVER w >= 3
                   AND stddev_samp(sum_value) OVER w > 0
             THEN (sum_value - avg(sum_value) OVER w) / stddev_samp(sum_value) OVER w
             END, 6) AS zscore
FROM agg
WINDOW w AS (PARTITION BY metric ORDER BY bucket_ts ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)""",
)
def anomaly_zscore_daily(spark, sf_dir):
    """Trailing-window anomaly scoring: each daily bucket's sum scored
    against the mean/stddev of its previous 7 buckets (current
    excluded) — the Spark-first baseline of the upstream 3.x anomaly
    processors (observed vs expected from recent history).  The window
    runs over the already-downsampled result, so its state is 7 rows
    per metric regardless of raw volume."""
    from opentsdb_aura_spark.operators.analytic import rolling_zscore

    pts = points(spark, sf_dir)
    res = downsample(pts, START, END, DAY, "sum", group_cols=["metric"], fill="none")
    out = rolling_zscore(res, lookback=7, min_history=3, group_cols=["metric"])
    return out.select(
        "metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"), _r("zscore", 6).alias("zscore")
    )


@register(
    "anomaly_seasonal_hourly",
    f"""{ORACLE_PTS},
agg AS (
  SELECT metric, {_bucket_sql(HOUR)} AS bucket_ts, sum(value) AS v
  FROM dpts WHERE ts >= {START} AND ts < {END} GROUP BY 1, 2)
SELECT a.metric, a.bucket_ts,
       round(a.v, 4) AS sum_value,
       round(b.v, 4) AS baseline,
       round(a.v - b.v, 4) AS deviation
FROM agg a LEFT JOIN agg b
  ON b.metric = a.metric AND b.bucket_ts = a.bucket_ts - {DAY}""",
)
def anomaly_seasonal_hourly(spark, sf_dir):
    """Seasonal anomaly baseline: each hourly bucket vs the SAME hour
    one day earlier — the periodic complement of the trailing z-score
    (for a daily-cycled metric the previous 7 hours are the wrong
    expectation).  Equi-self-join on (metric, bucket − 1d), not a
    per-series lag window: shuffles on the composite key, so no
    per-series sort task and no hot-series straggler."""
    from opentsdb_aura_spark.operators.analytic import seasonal_baseline_deviation

    pts = points(spark, sf_dir)
    res = downsample(pts, START, END, HOUR, "sum", group_cols=["metric"], fill="none")
    out = seasonal_baseline_deviation(res, DAY, group_cols=["metric"])
    return out.select(
        "metric",
        "bucket_ts",
        _r(denan(F.col("value")), 4).alias("sum_value"),
        _r("baseline", 4).alias("baseline"),
        _r("deviation", 4).alias("deviation"),
    )


@register(
    "corpus_bm25_search",
    r"""WITH toked AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '')) AS token
  FROM documents),
lengths AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toked GROUP BY 1),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lengths),
tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
       FROM toked WHERE token IN ('data', 'model', 'training') GROUP BY 1, 2),
dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * 2.2 / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)))) AS score
  FROM tf t JOIN dfreq d USING (token) JOIN lengths l USING (doc_id) CROSS JOIN stats s
  GROUP BY 1)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10""",
)
def corpus_bm25_search(spark, sf_dir):
    """Ranked full-text retrieval: BM25 top-10 for a fixed query bag —
    the ranked complement of the boolean E1 text match, entirely as
    aggregates (filtered explode → tf/df/length joins → top-k)."""
    from opentsdb_aura_spark.operators.text import bm25_search

    res = bm25_search(docs_raw(spark, sf_dir), ["data", "model", "training"], k=10)
    return res.select("doc_id", _r("score", 6).alias("score"))


@register(
    "corpus_source_report",
    r"""SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> ''))) AS BIGINT) AS total_tokens,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dup_docs
FROM documents GROUP BY 1""",
)
def corpus_source_report(spark, sf_dir):
    """Dataset-card report per source domain: doc/token volume, size,
    language spread, and exact-duplicate load — the summary table every
    training-data curation run publishes.  One hash aggregate over the
    corpus; the token count is a narrow map."""
    d = docs_raw(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        _r(F.avg("n_chars"), 4).alias("avg_chars"),
        F.count_distinct("lang").alias("n_langs"),
        (F.count("*") - F.count_distinct(F.md5("text"))).alias("n_exact_dup_docs"),
    )


@register(
    "pipeline_token_budget",
    r"""WITH c AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '')) AS BIGINT) AS n_tokens
  FROM documents),
r AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM c)
SELECT doc_id, source, n_tokens, cum_tokens FROM r WHERE cum_tokens <= 5000""",
)
def pipeline_token_budget(spark, sf_dir):
    """Greedy per-domain doc selection under a 5 000-token budget —
    training mixes are specified in tokens, not document counts.  One
    window per domain (single shuffle), no global sort, no driver
    loop."""
    from opentsdb_aura_spark.operators.corpus import token_budget_sample

    return token_budget_sample(docs_raw(spark, sf_dir), 5000, domain_col="source")


@register(
    "pipeline_curate_corpus",
    """WITH u AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents),
kept AS (SELECT doc_id, source, n_chars FROM u WHERE rn = 1 AND n_chars >= 100),
r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
  FROM kept)
SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5""",
)
def pipeline_curate_corpus(spark, sf_dir):
    """End-to-end curation COMPOSITION: exact dedup (keep lowest id
    per content hash) → quality bar (n_chars ≥ 100) → per-domain
    diversity cap (best 5) — three pipeline operators chained the way
    a real corpus build chains them; one query plan, no
    materialization between stages."""
    from opentsdb_aura_spark.operators.corpus import cap_per_domain
    from pyspark.sql.window import Window

    d = docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = (
        d.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("n_chars") >= 100))
        .select("doc_id", "source", "n_chars")
    )
    return cap_per_domain(survivors, 5)


@register(
    "pipeline_global_shuffle",
    """SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) - 1
            AS BIGINT) AS shuffle_pos
FROM documents""",
)
def pipeline_global_shuffle(spark, sf_dir):
    """Deterministic pseudo-random global training order WITHOUT a
    single-partition window: md5 order key + distributed prefix-sum
    rank (4096 hex-prefix blocks → exclusive cumsum → bounded
    within-block row_number).  The oracle is the naive global
    ``row_number() OVER (ORDER BY md5)`` — equality proves the
    blocked rank IS the global rank."""
    from opentsdb_aura_spark.operators.corpus import global_shuffle

    return global_shuffle(docs(spark, sf_dir), seed="42")


@register(
    "pipeline_domain_cap",
    """WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 7""",
)
def pipeline_domain_cap(spark, sf_dir):
    """Diversity capping: at most 7 docs per source, best (longest)
    first — two-phase hot-key-bounded top-k (per input-partition rank,
    then rank the survivors), so a mega-domain never forms one giant
    sort task.  Oracle is the naive one-shot window."""
    from opentsdb_aura_spark.operators.corpus import cap_per_domain

    return cap_per_domain(docs(spark, sf_dir), 7)


@register(
    "pipeline_dsir_weights",
    r"""WITH w AS (
  SELECT doc_id, source, list_filter(string_split_regex(lower(trim(text)), '\s+'), _t -> _t <> '') AS t
  FROM documents),
g AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM w),
b AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(gram || ':dsir'), 1, 8)) AS BIGINT) % 1024 AS bucket
  FROM g),
pb AS (SELECT bucket, count(*) AS rn,
              sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS tn
       FROM b GROUP BY 1),
tot AS (SELECT count(*) AS rt,
               sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS tt
        FROM b),
lr AS (SELECT bucket,
              ln((tn + 1.0) / (tt + 1024.0)) - ln((rn + 1.0) / (rt + 1024.0)) AS logr
       FROM pb CROSS JOIN tot)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_grams, round(sum(lr.logr), 6) AS weight
FROM b JOIN lr USING (bucket) GROUP BY 1""",
)
def pipeline_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights toward the 'src3' domain: hashed
    bigram buckets (md5 — engine-reproducible), add-one-smoothed
    log-likelihood ratio of target vs corpus bucket distributions,
    summed per doc.  Pure Catalyst: one explode, two bounded
    aggregates, AQE-broadcast log-ratio join."""
    from opentsdb_aura_spark.operators.corpus import dsir_weights

    res = dsir_weights(docs(spark, sf_dir), "src3")
    return res.select("doc_id", "n_grams", _r(F.col("weight"), 6).alias("weight"))


@register(
    "text_normalize_docs",
    r"""WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                             '\s+', ' ', 'g')) AS norm
  FROM documents)
SELECT doc_id, CAST(strlen(norm) AS BIGINT) AS n_chars_norm, md5(norm) AS norm_md5
FROM n""",
)
def text_normalize_docs(spark, sf_dir):
    """Curation-grade text normalization (lowercase, punctuation →
    space, whitespace collapse) proven BYTE-IDENTICAL cross-engine via
    md5 of the normalized text — the property that matters when a
    dedup key is derived from normalized content."""
    from opentsdb_aura_spark.operators.corpus import normalize_text

    d = docs(spark, sf_dir)
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
    )


@register("rollup_coarsest_pick", _ds_by_metric_sql(DAY, "sum(value)", "sum_value", 4))
def rollup_coarsest_pick(spark, sf_dir):
    """A10 planner — with hourly AND 2-hourly rollups available, a
    daily query picks the coarsest (7200); result identical to raw
    (equivalence of the hourly path is oracle-checked separately)."""
    from opentsdb_aura_spark.operators.rollup import (
        build_rollup,
        choose_downsample_source,
        downsample_from_rollup,
    )

    pts = points(spark, sf_dir)
    rollups = {
        3600: _rollup(spark, sf_dir),
        7200: build_rollup(pts, 7200, group_cols=("series_id", "metric")),
    }
    src, riv = choose_downsample_source(rollups, "sum", DAY, START, END)
    assert riv == 7200, f"expected coarsest rollup, got {riv}"
    res = downsample_from_rollup(src, START, END, DAY, "sum", group_cols=["metric"])
    return res.select("metric", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register(
    "rollup_auto_substitution",
    f"""{ORACLE_PTS}
SELECT tag_user, {_bucket_sql(DAY)} AS bucket_ts, round(sum(value), 4) AS sum_value
FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
GROUP BY 1, 2""",
)
def rollup_auto_substitution(spark, sf_dir):
    """A10 — rollup substitution inside the query node: the MetricQuery
    never mentions rollups; ``run_metric_query(..., rollups=...)``
    routes the scan to the hourly pre-aggregate automatically
    (AerospikeBatchQueryNode.java:200-224 — selection happens in the
    node, not the caller).  Oracle is the flat raw-point computation;
    tests/test_plans.py asserts the physical plan reads rollup_3600,
    not the metrics store."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="sum",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="sum",
        fill="none",
    )
    res = run_metric_query(
        points(spark, sf_dir),
        q,
        rollups={3600: _rollup(spark, sf_dir)},
        series_dim=series_dim(spark, sf_dir),
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("sum_value"))


@register("rollup_hist_p90_planner")  # sketch percentile via planner: rows-only
def rollup_hist_p90_planner(spark, sf_dir):
    """A6 scale path, planner edition: the MetricQuery asks for a plain
    per-series p90 + group max; ``run_metric_query(...,
    hist_rollups=...)`` routes it to the DDSketch histogram rollup
    automatically (plans/query._hist_substitution) — per-series
    percentile from pre-aggregated bins (exact series distribution,
    eps-coarse values), then the ordinary two-stage group merge.  No
    raw point is scanned.  Approximate by design (±1%), bound-tested
    in tests/test_rollup.py::test_hist_substitution_per_series_percentile."""
    from opentsdb_aura_spark.sources.batch import ensure_event_store, rollup_hist_path

    ensure_event_store(spark, sf_dir)
    hist = spark.read.parquet(rollup_hist_path(sf_dir, 3600))
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="p90",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="max",
        fill="none",
    )
    res = run_metric_query(
        points(spark, sf_dir),
        q,
        hist_rollups={3600: hist},
        series_dim=series_dim(spark, sf_dir),
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("p90_max"))


@register(
    "rollup_gb_avg_daily",
    f"""{ORACLE_PTS},
ps AS (
  SELECT tag_user, tag_k, {_bucket_sql(DAY)} AS bucket_ts, avg(value) AS v
  FROM dpts WHERE metric = 'purchase' AND ts >= {START} AND ts < {END}
  GROUP BY 1, 2, 3)
SELECT tag_user, bucket_ts, round(avg(v), 4) AS avg_value
FROM ps GROUP BY 1, 2""",
)
def rollup_gb_avg_daily(spark, sf_dir):
    """A10 two-stage substitution: avg→avg does not flat-fuse (group
    avg-of-series-avgs ≠ flat avg), yet the planner still serves it
    from the hourly pre-aggregate — per-series daily avg re-aggregated
    from the rollup chain (Σsum/Σcount), then the normal group merge,
    the exact shape of the reference's rollup read
    (AerospikeDSTimeSeriesEncoder.java:69-110 stream →
    NumericArrayAggregator accumulate).  Oracle is the raw two-stage
    computation; the plan reads rollup_3600 (asserted in
    tests/test_plans.py)."""
    q = _mq(
        start=START,
        end=END,
        interval=DAY,
        ds_agg="avg",
        filter=MetricLiteral("purchase"),
        group_tag_keys=["user"],
        gb_agg="avg",
        fill="none",
    )
    res = run_metric_query(
        points(spark, sf_dir),
        q,
        rollups={3600: _rollup(spark, sf_dir)},
        series_dim=series_dim(spark, sf_dir),
    )
    return res.select("tag_user", "bucket_ts", _r(denan(F.col("value")), 4).alias("avg_value"))


@register(
    "ev_time_to_first_purchase",
    """WITH s AS (SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_signup
       FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT s.user_id, s.first_signup, p.first_purchase,
       p.first_purchase - s.first_signup AS secs_to_purchase
FROM s JOIN p ON s.user_id = p.user_id
WHERE p.first_purchase >= s.first_signup""",
)
def ev_time_to_first_purchase(spark, sf_dir):
    """Activation-latency analytics: per user, the time from first
    signup to first purchase (users whose first purchase precedes any
    signup are excluded — attribution needs a cause).  Two filtered
    min-aggregates and one equi-join on user_id — no window over the
    whole event history, so a hot user costs the same as a cold one."""
    ev = events_seconds(spark, sf_dir)
    first = lambda et, alias: (
        ev.where(F.col("event_type") == et)
        .groupBy("user_id")
        .agg(F.min("ts").cast("long").alias(alias))
    )
    s = first("signup", "first_signup")
    p = first("purchase", "first_purchase")
    return (
        s.join(p, "user_id")
        .where(F.col("first_purchase") >= F.col("first_signup"))
        .select(
            "user_id",
            "first_signup",
            "first_purchase",
            (F.col("first_purchase") - F.col("first_signup")).alias("secs_to_purchase"),
        )
    )
