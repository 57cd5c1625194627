"""Metric query planner — the Spark analogue of the reference's query
lifecycle (SURVEY.md §3.1/§3.2).

Reference pipeline (fused in
opentsdb/src/main/java/net/opentsdb/aura/metrics/storage/
AuraMetricsNumericArrayIterator.java:285-670, pushdown declaration
AuraMetricsSourceFactory.java:120-128):

  scan(filter, [start-Δ, end-Δ)) → dedupe → rate → downsample
      → group-by merge → relabel(+Δ)

Here each stage is declarative; Catalyst fuses filter+project into the
Parquet scan (with partition pruning on ``segment_time``), and the
rate window + per-series downsample share one hash partitioning by
``series_id``.  Operator order is load-bearing: rate is per-point and
runs BEFORE downsample, exactly as the reference kernel does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_aura_spark.filters import Filter, compile_filter, time_range
from opentsdb_aura_spark.model import SEGMENT_WIDTH_SECONDS
from opentsdb_aura_spark.operators.dedupe import dedupe_last_write_wins
from opentsdb_aura_spark.operators.downsample import downsample
from opentsdb_aura_spark.operators.groupby import group_merge, with_group_keys
from opentsdb_aura_spark.operators.rate import RateOptions, rate, time_shift


@dataclass
class MetricQuery:
    """Declarative metric query (the MetricQuery/DownsampleConfig/
    RateConfig/GroupByConfig surface, flattened)."""

    start: int  # epoch seconds, inclusive
    end: int  # epoch seconds, exclusive (LongTermStorage.java:26-33)
    filter: Filter | None = None
    # downsample
    interval: int | None = None  # seconds; None collapses to one run-all bucket over [start, end)
    ds_agg: str = "avg"
    run_all: bool = False
    infectious_nan: bool = False
    reporting_dps: float | None = None
    fill: str = "nan"
    # rate (applied before downsample)
    rate_options: RateOptions | None = None
    # group-by
    group_tag_keys: Sequence[str] | None = None  # None = raw per-series (G4); [] = group-all (G2)
    gb_agg: str = "sum"
    # time shift (R5)
    shift_seconds: int = 0
    # partition width of the store being queried (prune granularity)
    segment_width: int = SEGMENT_WIDTH_SECONDS

    def __post_init__(self) -> None:
        if self.end <= self.start:
            raise ValueError(f"empty query range: [{self.start}, {self.end})")
        if self.interval is not None and self.interval <= 0:
            raise ValueError(f"downsample interval must be positive, got {self.interval}")
        if self.segment_width <= 0:
            raise ValueError(f"segment width must be positive, got {self.segment_width}")
        if self.fill not in ("nan", "zero", "null", "none"):
            raise ValueError(f"fill must be one of nan/zero/null/none, got {self.fill!r}")


#: (ds_agg, gb_agg) pairs whose two-stage downsample→group-merge
#: composes into ONE aggregation over (group keys, bucket): the
#: element-wise group combine of per-series partials equals the flat
#: aggregate of all points.  Saves a full shuffle on the most common
#: query shape (one hash-agg by (keys, bucket) instead of
#: (series, bucket) then (keys, bucket)).  Infectious-NaN composes
#: too: any NaN point ⇒ its series-interval is NaN ⇒ the group
#: interval is NaN — identical either way.  avg/last do NOT fuse
#: (group avg-of-avgs ≠ flat avg).
_FUSABLE_DS_GB: dict[tuple[str, str], str] = {
    ("sum", "sum"): "sum",
    ("count", "sum"): "count",
    ("min", "min"): "min",
    ("max", "max"): "max",
}


def _substitution_blocked(q: MetricQuery) -> bool:
    """Shared pre-aggregate eligibility guard: rate is per-point,
    infectious-NaN / reporting-average are invisible in pre-aggregates,
    run-all needs the tail bucket, and no interval means no grid."""
    return (
        q.rate_options is not None
        or q.run_all
        or q.interval is None
        or q.infectious_nan
        or q.reporting_dps is not None
    )


def _matched_series(
    points: DataFrame, q: MetricQuery, series_dim: DataFrame | None
) -> tuple[DataFrame, list[str], list[str]]:
    """Meta-side series selection shared by the substitutions: the
    filtered series dimension (or a distinct projection of points)
    with the query's group-key columns attached.  Returns
    (matched, group_keys, out_groups).  `matched` is O(total series)
    under a match-all filter — never force-broadcast it; AQE
    size-picks the join strategy at runtime."""
    dim = series_dim
    if dim is None:
        dim = points.select("series_id", "metric", "tags").dropDuplicates(["series_id"])
    dim = dim.where(compile_filter(q.filter))
    group_keys: list[str] = []
    if q.group_tag_keys:
        dim = with_group_keys(dim, q.group_tag_keys)
        group_keys = [f"tag_{k}" for k in q.group_tag_keys]
    out_groups = group_keys if q.group_tag_keys is not None else ["series_id"]
    return dim.select("series_id", *group_keys), group_keys, out_groups


def _shift_and_fill(
    res: DataFrame,
    q: MetricQuery,
    matched: DataFrame,
    out_groups: list[str],
    spine_from_dim: bool,
) -> DataFrame:
    """Shared substitution tail: relabel shifted buckets back to query
    time, then the fill spine (meta-driven universe when asked)."""
    from opentsdb_aura_spark.operators.downsample import fill_spine

    if q.shift_seconds:
        res = res.withColumn(
            "bucket_ts", (F.col("bucket_ts") + F.lit(int(q.shift_seconds))).cast("long")
        )
    if q.fill != "none":
        spine_groups = matched.select(*out_groups) if spine_from_dim else None
        res = fill_spine(
            res, q.start, q.end, q.interval, out_groups,
            fill=q.fill, spine_groups=spine_groups,
        )
    return res


def _rollup_substitution(
    points: DataFrame,
    q: MetricQuery,
    rollups: dict[int, DataFrame],
    series_dim: DataFrame | None,
    spine_from_dim: bool = False,
) -> DataFrame | None:
    """A10 — automatic rollup substitution inside the query node,
    mirroring the reference's selection of a stored aggregate stream
    over a raw scan (AerospikeBatchQueryNode.java:200-224: the node,
    not the caller, decides).  Returns None when raw points must serve.

    Substitution requires: no rate stage (per-point, can't run on
    pre-aggregates), no infectious-NaN (NaN points are invisible in the
    rollup), no reporting-average, no run-all tail bucket, a servable
    aggregator, and full grid alignment (``rollup_supports``).  Grouped
    queries additionally need the downsample+group pair to compose into
    one flat aggregate (``_FUSABLE_DS_GB``) — re-aggregating rollup
    partials by group keys IS the flat aggregate; avg-of-series-avgs
    shapes are not derivable and fall back to raw.

    Series selection runs on the meta side — ``series_dim`` (or a
    distinct-series projection of the points table, which Parquet
    serves from 3 pruned columns) filtered by the query's filter
    algebra, then broadcast-semi-joined into the rollup — the
    reference's meta-index → series-keys → fetch-streams flow.

    Grouped queries whose (ds, gb) pair does NOT flat-fuse (e.g.
    avg→avg: group avg-of-series-avgs ≠ flat avg) are still served
    two-stage from the rollup: per-series buckets re-aggregated from
    the pre-aggregate chain, then the normal group merge — the exact
    shape of the reference's rollup read (per-series
    AerospikeDSTimeSeriesEncoder stream → NumericArrayAggregator group
    accumulate), scanning interval/rollup_interval× fewer rows.
    """
    from opentsdb_aura_spark.operators.downsample import normalize_agg
    from opentsdb_aura_spark.operators.groupby import _ALIASES, GROUP_AGGS, group_merge
    from opentsdb_aura_spark.operators.rollup import (
        ROLLUP_SERVABLE,
        choose_downsample_source,
        downsample_from_rollup,
    )

    if _substitution_blocked(q):
        return None
    ds = normalize_agg(q.ds_agg)
    two_stage = False
    if q.group_tag_keys is not None:
        gb = _ALIASES.get(q.gb_agg.lower(), q.gb_agg.lower())
        agg = _FUSABLE_DS_GB.get((ds, gb))
        if agg is None:
            if ds in ROLLUP_SERVABLE and gb in GROUP_AGGS:
                two_stage = True
                agg = ds
            else:
                return None
    else:
        agg = ds
    shift = int(q.shift_seconds)
    scan_start, scan_end = q.start - shift, q.end - shift
    src, _riv = choose_downsample_source(rollups, agg, q.interval, scan_start, scan_end)
    if src is None:
        return None

    matched, group_keys, out_groups = _matched_series(points, q, series_dim)
    rolled = src.select("series_id", "window_start", "sum", "count", "min", "max", "sumsq").join(
        matched, on="series_id", how="inner"
    )
    if two_stage:
        per_series = downsample_from_rollup(
            rolled, scan_start, scan_end, q.interval, ds, group_cols=["series_id", *group_keys]
        )
        res = group_merge(per_series, q.gb_agg, group_cols=group_keys)
    else:
        res = downsample_from_rollup(rolled, scan_start, scan_end, q.interval, agg, group_cols=out_groups)
    return _shift_and_fill(res, q, matched, out_groups, spine_from_dim)


_PERCENTILE_RE = re.compile(r"^p(\d{1,3})$")


def _percentile_fraction(agg: str) -> float | None:
    """Mirror downsample's percentile-name parse: p90 → 0.90,
    p999 → 0.999 (digits after 'p' are the decimals)."""
    if agg == "median":
        return 0.5
    m = _PERCENTILE_RE.match(agg)
    return float("0." + m.group(1)) if m else None


def _hist_substitution(
    points: DataFrame,
    q: MetricQuery,
    hist_rollups: dict[int, DataFrame],
    series_dim: DataFrame | None,
    spine_from_dim: bool = False,
    hist_eps: float | None = None,
) -> DataFrame | None:
    """A6 scale path, planner edition: serve percentile/median
    downsamples from the DDSketch histogram rollup
    (``build_rollup_histogram``) instead of scanning raw points.
    Passing ``hist_rollups`` to ``run_metric_query`` is the opt-in to
    the approximation (the reference's planner likewise only reads
    stored aggregates where configuration enables them,
    AuraMetricsClusterConfig routing); tables built with a non-default
    ``eps`` MUST pass it as ``hist_eps`` — bins are decoded with the
    build-time gamma, and a mismatched eps decodes garbage.

    Accuracy caveat (two distinct effects): the eps bound holds vs the
    NEAREST-RANK quantile (value at rank ⌈q·n⌉), while the raw path's
    ``percentile()`` INTERPOLATES between ranks — with many points per
    bucket the two converge, but a 2-point bucket can differ by the
    gap between its values, far beyond eps.  Sketch percentiles answer
    "which observed magnitude is at this rank", not "the interpolated
    midpoint" — the bound tests compare against the rank quantile.

    Semantics are preserved exactly where they can be: the sketch
    serves the PER-SERIES percentile (bins are per series, so each
    series' distribution is intact, only value resolution is eps-
    coarse); grouped queries then run the normal group merge over the
    per-series values — the same two-stage shape as the non-fusable
    rollup path.  Rate / infectious-NaN / reporting-average /
    run-all / off-grid windows fall back to raw (None)."""
    from opentsdb_aura_spark.operators.downsample import normalize_agg
    from opentsdb_aura_spark.operators.groupby import GROUP_AGGS, _ALIASES, group_merge
    from opentsdb_aura_spark.operators.rollup import percentile_from_rollup_histogram

    if _substitution_blocked(q):
        return None
    frac = _percentile_fraction(normalize_agg(q.ds_agg))
    if frac is None:
        return None
    if q.group_tag_keys is not None:
        gb = _ALIASES.get(q.gb_agg.lower(), q.gb_agg.lower())
        if gb not in GROUP_AGGS:
            return None
    shift = int(q.shift_seconds)
    scan_start, scan_end = q.start - shift, q.end - shift
    hist_iv = None
    for riv in sorted(hist_rollups, reverse=True):
        if q.interval % riv == 0 and scan_start % riv == 0 and (scan_end - scan_start) % riv == 0:
            hist_iv = riv
            break
    if hist_iv is None:
        return None

    matched, group_keys, out_groups = _matched_series(points, q, series_dim)
    hist = hist_rollups[hist_iv].select("series_id", "window_start", "sign", "bin", "cnt").join(
        matched, on="series_id", how="inner"
    )
    eps_kw = {"eps": float(hist_eps)} if hist_eps is not None else {}
    per_series = percentile_from_rollup_histogram(
        hist, frac, scan_start, scan_end, q.interval,
        group_cols=["series_id", *group_keys], **eps_kw,
    )
    if q.group_tag_keys is not None:
        res = group_merge(per_series, q.gb_agg, group_cols=group_keys)
    else:
        res = per_series.select("series_id", "bucket_ts", "value")
    return _shift_and_fill(res, q, matched, out_groups, spine_from_dim)


def _dim_spine_groups(
    points: DataFrame,
    q: MetricQuery,
    series_dim: DataFrame | None,
    group_cols: Sequence[str],
) -> DataFrame:
    """Meta-driven spine universe: the series (or tag groups) the
    filter matches, independent of the scanned time range — the
    reference's meta-index selection (TimeSeriesShard.java:677-758),
    where a matched series with no in-range points still yields an
    all-NaN output vector."""
    dim = series_dim
    if dim is None:
        dim = points.select("series_id", "metric", "tags").dropDuplicates(["series_id"])
    dim = dim.where(compile_filter(q.filter))
    if q.group_tag_keys:
        dim = with_group_keys(dim, q.group_tag_keys)
    return dim.select(*group_cols)


def run_metric_query(
    points: DataFrame,
    q: MetricQuery,
    *,
    dedupe: bool = True,
    fuse_group_agg: bool = True,
    rollups: dict[int, DataFrame] | None = None,
    hist_rollups: dict[int, DataFrame] | None = None,
    hist_eps: float | None = None,
    series_dim: DataFrame | None = None,
    spine_from_dim: bool = False,
    presence: DataFrame | None = None,
    presence_epoch_width: int = SEGMENT_WIDTH_SECONDS,
) -> DataFrame:
    """Execute a MetricQuery over a normalized points DataFrame.

    Returns (group keys | series_id, bucket_ts, value) with the dense
    NaN spine when ``q.fill == 'nan'``.

    ``rollups`` — optional {interval: rollup DataFrame} handles (built
    by ``build_rollup`` at flush time, post-dedupe).  When given, the
    planner substitutes the coarsest servable pre-aggregate for the raw
    scan automatically (see ``_rollup_substitution``); the query itself
    never mentions rollups, exactly as in the reference.  ``series_dim``
    optionally serves the filter→series resolution (the meta index);
    without it a distinct-series projection of ``points`` is used.

    ``spine_from_dim`` — derive the NaN-spine group universe from the
    meta index (filtered ``series_dim``) rather than from the result:
    filter-matched series/groups with zero in-range points then emit
    all-NaN rows, the reference's behavior (its meta selection runs
    before any segment is read).  Default off: the result-derived spine
    is what the round-1 oracles encode.

    ``presence`` — optional epoch-presence table
    (``build_epoch_presence``): the scan semi-joins against the series
    active in the scanned range (broadcast, J1), skipping series the
    epoch bitmaps prove empty — the reference's Myst epoch-bitmap
    record skipping (MetaTimeSeriesQueryResult.java:89-94).  Pure
    pruning: series without in-range points contribute no rows anyway.
    """
    if rollups:
        substituted = _rollup_substitution(points, q, rollups, series_dim, spine_from_dim)
        if substituted is not None:
            return substituted
    if hist_rollups:
        # ``hist_rollups`` is the opt-in to eps-approximate percentile
        # serving from the DDSketch bins (see _hist_substitution)
        substituted = _hist_substitution(points, q, hist_rollups, series_dim, spine_from_dim, hist_eps)
        if substituted is not None:
            return substituted
    shift = int(q.shift_seconds)
    scan_start, scan_end = q.start - shift, q.end - shift

    pred = compile_filter(q.filter) & time_range(scan_start, scan_end)
    if "segment_time" in points.columns:
        # S4 segment-range planning: the ts predicate restated on the
        # partition column so Catalyst prunes partitions (the
        # reference's [start,end) → segment-list mapping,
        # core/.../LongRunningStorage.java:66-93)
        lo = scan_start - scan_start % q.segment_width
        pred = pred & (F.col("segment_time") >= F.lit(lo)) & (F.col("segment_time") < F.lit(int(scan_end)))
    df = points.where(pred)

    if presence is not None:
        from opentsdb_aura_spark.operators.meta import presence_active_ids

        active = presence_active_ids(presence, scan_start, scan_end, presence_epoch_width)
        # `active` is O(series alive in the window) — unbounded at scale;
        # let AQE pick broadcast vs shuffled semi-join by its runtime size.
        df = df.join(active, "series_id", "left_semi")

    if dedupe:
        df = dedupe_last_write_wins(df)

    if shift:
        df = time_shift(df, shift)

    if q.rate_options is not None:
        # segment-parallel lag window when the store's partition column
        # is present: bounded task size even for hot series (the shift,
        # if any, moved ts by a constant, so segment order still holds)
        seg = "segment_time" if "segment_time" in df.columns else None
        df = rate(df, q.rate_options, segment_col=seg)

    group_keys: list[str] | None = None
    if q.group_tag_keys is not None:
        group_keys = [f"tag_{k}" for k in q.group_tag_keys]
        df = with_group_keys(df, q.group_tag_keys)

    if q.group_tag_keys is not None:
        from opentsdb_aura_spark.operators.downsample import normalize_agg
        from opentsdb_aura_spark.operators.groupby import _ALIASES

        fused = _FUSABLE_DS_GB.get(
            (normalize_agg(q.ds_agg), _ALIASES.get(q.gb_agg.lower(), q.gb_agg.lower()))
        )
        spine_groups = None
        if spine_from_dim and q.fill != "none":
            spine_groups = _dim_spine_groups(points, q, series_dim, group_keys)
        if fuse_group_agg and fused is not None:
            # single-shot: one hash aggregation by (group keys, bucket)
            # replaces per-series downsample + group merge (SURVEY §2.3b
            # G1 "one shot" note) — same values, one fewer shuffle
            return downsample(
                df,
                q.start,
                q.end,
                q.interval,
                fused,
                group_cols=group_keys,
                infectious_nan=q.infectious_nan,
                reporting_dps=q.reporting_dps,
                run_all=q.run_all,
                fill=q.fill,
                spine_groups=spine_groups,
            )
        # two-stage: per-series downsample (sparse), then group merge,
        # then the NaN spine once at group granularity — cheaper than
        # densifying every series first.
        per_series = downsample(
            df,
            q.start,
            q.end,
            q.interval,
            q.ds_agg,
            group_cols=["series_id", *group_keys],
            infectious_nan=q.infectious_nan,
            reporting_dps=q.reporting_dps,
            run_all=q.run_all,
            fill="none",
        )
        merged = group_merge(
            per_series,
            q.gb_agg,
            group_cols=group_keys,
            infectious_nan=q.infectious_nan,
        )
        if q.fill != "none":
            from opentsdb_aura_spark.operators.downsample import fill_spine

            interval = (q.end - q.start) if (q.run_all or q.interval is None) else q.interval
            merged = fill_spine(
                merged, q.start, q.end, interval, group_keys,
                fill=q.fill, spine_groups=spine_groups,
            )
        return merged

    # raw per-series result (G4)
    spine_groups = None
    if spine_from_dim and q.fill != "none":
        spine_groups = _dim_spine_groups(points, q, series_dim, ["series_id"])
    return downsample(
        df,
        q.start,
        q.end,
        q.interval,
        q.ds_agg,
        group_cols=["series_id"],
        infectious_nan=q.infectious_nan,
        reporting_dps=q.reporting_dps,
        run_all=q.run_all,
        fill=q.fill,
        spine_groups=spine_groups,
    )


def splice_hot_cold(hot: DataFrame, cold: DataFrame, boundary_ts: int) -> DataFrame:
    """U3 — route recent range to the hot table, older to cold, with
    non-overlapping time predicates (AuraMetricsClusterConfig routing).
    Both sides keep their partition pruning."""
    return cold.where(F.col("ts") < F.lit(int(boundary_ts))).unionByName(
        hot.where(F.col("ts") >= F.lit(int(boundary_ts)))
    )


def splice_bucketed_downsample(
    hot: DataFrame,
    cold_bucketed: DataFrame,
    boundary_ts: int,
    start: int,
    end: int,
    interval: int,
    agg: str,
    group_cols: Sequence[str] = ("series_id",),
) -> DataFrame:
    """U3 over a series-bucketed cold tier: aggregate each tier
    SEPARATELY, then union the per-bucket results.

    Splicing raw rows first (``splice_hot_cold``) would destroy the
    cold table's bucket partitioning at the union and force a shuffle
    of the (large) cold range.  Aggregating per tier keeps the
    cold-side per-series aggregation Exchange-free end-to-end — the
    bucket spec already hash-partitions series_id — which is the whole
    point of the bucketed layout and mirrors the reference's
    series-keyed long-term-store reads merged with the hot shard scan
    (aerospike/.../LTSAerospike.java:187-260; the LTS fetches a
    series' whole history co-located by key).  The hot side shuffles
    only its own (recent, small) range.

    ``boundary_ts`` must sit on the downsample grid
    ((boundary−start) % interval == 0): tiers are then time-disjoint
    AND bucket-disjoint, so the merged result is a plain unionByName —
    no second aggregation pass at all.
    """
    if (int(boundary_ts) - int(start)) % int(interval) != 0:
        raise ValueError(
            f"boundary_ts {boundary_ts} must be aligned to the interval grid "
            f"anchored at start={start} (interval={interval})"
        )
    from opentsdb_aura_spark.operators.downsample import downsample

    b = int(boundary_ts)
    cold_res = downsample(
        cold_bucketed.where(F.col("ts") < F.lit(b)),
        int(start), min(b, int(end)), int(interval), agg,
        group_cols=list(group_cols), fill="none",
    )
    hot_res = downsample(
        hot.where(F.col("ts") >= F.lit(b)),
        max(int(start), b), int(end), int(interval), agg,
        group_cols=list(group_cols), fill="none",
    )
    return cold_res.unionByName(hot_res)


@dataclass(frozen=True)
class TieredStore:
    """Hot/cold tier pair with its retention boundary — the store-side
    metadata the reference's query router consults
    (AuraMetricsClusterConfig.java range routing +
    AuraMetricsHealthChecker gating which tier serves a range): rows
    with ``ts >= boundary_ts`` live in the hot tier, older rows in the
    long-term tier.  ``cold`` is expected to be the series-bucketed
    long-term table (sources/bucketed.py) so per-series aggregation on
    it is Exchange-free, but any points table works.

    Each tier may carry its OWN pre-aggregate tables
    (``hot_rollups``/``cold_rollups`` and the DDSketch
    ``*_hist_rollups``): in production the tiers are different systems
    — a hot memory store typically has no rollups while the long-term
    store is where downsampled streams live — and the reference picks
    rollup streams per store, cold-side-specific
    (AerospikeBatchQueryNode.java:200-224 reads the LTS aggregate
    streams; the hot shard scan never does).  A tier-specific table
    set overrides any shared ``rollups=``/``hist_rollups=`` kwarg for
    that tier's sub-query; ``None`` means "use the shared kwarg".
    """

    hot: DataFrame
    cold: DataFrame
    boundary_ts: int
    hot_rollups: dict[int, DataFrame] | None = None
    cold_rollups: dict[int, DataFrame] | None = None
    hot_hist_rollups: dict[int, DataFrame] | None = None
    cold_hist_rollups: dict[int, DataFrame] | None = None

    def tier_kwargs(self, tier: str, kw: dict) -> dict:
        """Per-tier run_metric_query kwargs: this tier's rollup/sketch
        tables override the shared ones where set."""
        out = dict(kw)
        rollups = self.hot_rollups if tier == "hot" else self.cold_rollups
        hist = self.hot_hist_rollups if tier == "hot" else self.cold_hist_rollups
        if rollups is not None:
            out["rollups"] = rollups
        if hist is not None:
            out["hist_rollups"] = hist
        return out


def run_tiered_metric_query(store: TieredStore, q: MetricQuery, **kw) -> DataFrame:
    """`run_metric_query` with AUTOMATIC tier routing: the caller names
    the store, not the tier — the planner consults the store's
    retention boundary and routes the scan, exactly as its rollup
    substitution already picks the table to read.

    Routing (on the SCAN range, i.e. after un-shifting):
    - entirely inside one tier → that tier serves alone (cold-only
      queries keep the bucketed layout's Exchange-free aggregation);
    - straddling, downsample-only, boundary on the output bucket grid →
      per-tier sub-queries spliced by unionByName: buckets are
      tier-disjoint, so ANY ds/gb agg is exact per tier and the cold
      side stays Exchange-free (the `splice_bucketed_downsample`
      shape, now chosen by the planner);
    - otherwise (rate crossing the boundary needs the previous point
      from the other tier; run-all spans both; misaligned boundary
      splits a bucket) → row-level splice with per-tier time
      predicates, both sides keeping their partition pruning.
    """
    from dataclasses import replace

    shift = int(q.shift_seconds)
    scan_start, scan_end = q.start - shift, q.end - shift
    b = int(store.boundary_ts)
    hot_kw, cold_kw = store.tier_kwargs("hot", kw), store.tier_kwargs("cold", kw)
    if scan_start >= b:
        return run_metric_query(store.hot, q, **hot_kw)
    if scan_end <= b:
        return run_metric_query(store.cold, q, **cold_kw)

    out_b = b + shift  # boundary expressed in output (post-shift) time
    splice_ok = (
        q.rate_options is None
        and not q.run_all
        and q.interval is not None
        and (out_b - q.start) % q.interval == 0
        and not kw.get("spine_from_dim")
    )
    if not splice_ok:
        # row-level splice: one merged scan — per-tier pre-aggregates
        # cannot serve it, only the caller's shared tables apply
        return run_metric_query(splice_hot_cold(store.hot, store.cold, b), q, **kw)

    cold_res = run_metric_query(store.cold, replace(q, end=out_b, fill="none"), **cold_kw)
    hot_res = run_metric_query(store.hot, replace(q, start=out_b, fill="none"), **hot_kw)
    res = cold_res.unionByName(hot_res)
    if q.fill != "none":
        from opentsdb_aura_spark.operators.downsample import fill_spine

        group_cols = [c for c in res.columns if c not in ("bucket_ts", "value")]
        res = fill_spine(res, q.start, q.end, q.interval, group_cols, fill=q.fill)
    return res
