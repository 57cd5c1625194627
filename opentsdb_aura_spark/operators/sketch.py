"""Mergeable frequency sketches — bounded-memory heavy hitters.

Misra–Gries summaries with the mergeable-summaries combine step
(Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
PODS 2012): a capacity-``C`` summary undercounts any item by at most
n/(C+1), and two summaries merge by summing counters and trimming back
to C (subtract the (C+1)-th largest counter, drop non-positives) with
the SAME bound — so per-partition partial summaries combine into a
global one without rescanning, exactly like Spark's own partial/final
hash aggregates but with O(C) state per group instead of O(distinct).

This is the top-k analogue of the HLL presence rollup
(operators/meta.build_presence_hll): exact groupBy-count top-k shuffles
O(distinct items) rows and holds O(distinct/partitions) hash-map state
per task; the MG path shuffles O(partitions × C) rows and holds O(C)
state no matter how many distinct items exist.  Measured honestly
(tools/scale_validation.py, 50 M rows / 1 M distinct): the JVM hash
agg still wins single-box wall-clock at that distinct count (3.6 s vs
4.8 s) — MG's value is the STATE bound: streaming keyed state
(streaming/state.streaming_heavy_hitters), memory-capped executors,
and distinct cardinalities past what an agg hash map can hold.

The reference has no frequency sketches (its topn node ranks full
aggregates, opentsdb/.../TopNProcessor — served here by
analytic.topn); this operator extends the engine for training-data
pipelines (stop-list mining, hot-key discovery, skew probes).

The per-partition pass is an Arrow-batched mapInPandas: each batch is
counted vectorized (pandas groupby-size), folded into the running
summary with Series add/nlargest/mask operations, and trimmed only
when the summary exceeds capacity.  The SAME pass accumulates the
per-group row total, emitted as one sentinel row (item = NULL — real
null items are dropped first, so NULL is unambiguous) per (partition,
group): everything downstream reads the partials only, the input is
scanned exactly once.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def mg_partials(
    df: DataFrame,
    col: str,
    capacity: int,
    *,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ ``capacity`` item rows
    (group…, item, cnt) per (partition, group) — ``cnt`` a lower bound
    on the item's partition-local frequency, undercounting by at most
    n_partition/(capacity+1) — plus ONE sentinel row (item NULL,
    cnt = partition-group row count) carrying the exact total.  Null
    items are ignored; null GROUP keys are kept (parity with
    ``groupBy``)."""
    capacity = int(capacity)
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    gcols = list(group_cols)
    slim = df.select(*gcols, F.col(col).alias("item"))
    item_f = slim.schema["item"]
    fields = [slim.schema[c] for c in gcols] + [
        StructField("item", item_f.dataType, True),  # NULL marks the total row
        StructField("cnt", LongType(), False),
    ]
    out_schema = StructType(fields)

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        def fold(acc: "pd.Series | None", counts: "pd.Series") -> "pd.Series":
            s = counts if acc is None else acc.add(counts, fill_value=0)
            if len(s) > capacity:
                # mergeable trim: subtract the (capacity+1)-th largest
                # counter from all, drop non-positives — removes
                # >= m*(capacity+1) weight per trim, so total
                # undercount stays <= n/(capacity+1).  All Series ops:
                # the per-item work is C-speed, not a Python loop.
                m = s.nlargest(capacity + 1).iloc[-1]
                s = s[s > m] - m
            return s

        summaries: dict[tuple, "pd.Series"] = {}
        totals: dict[tuple, int] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=["item"])
            if pdf.empty:
                continue
            if gcols:
                counted = pdf.groupby(gcols + ["item"], sort=False, dropna=False).size()
                levels = list(range(len(gcols)))
                for key, sub in counted.groupby(level=levels, sort=False, dropna=False):
                    key = key if isinstance(key, tuple) else (key,)
                    sub = sub.droplevel(levels)
                    summaries[key] = fold(summaries.get(key), sub)
                    totals[key] = totals.get(key, 0) + int(sub.sum())
            else:
                vc = pdf["item"].value_counts(sort=False)
                summaries[()] = fold(summaries.get(()), vc)
                totals[()] = totals.get((), 0) + int(vc.sum())
        frames = [
            pd.DataFrame(
                {
                    **{g: [key[i]] * (len(s) + 1) for i, g in enumerate(gcols)},
                    "item": list(s.index) + [None],
                    "cnt": [int(c) for c in s] + [totals[key]],
                }
            )
            for key, s in summaries.items()
        ]
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return slim.mapInPandas(summarize, out_schema)


def mg_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    *,
    capacity: int | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-``k`` most frequent ``col`` values per group with bounded
    state everywhere: MG partials per partition (ONE scan of the
    input — the exact group totals ride along as sentinel rows), one
    hash-aggregate merge of O(partitions × capacity) rows, a window
    over the merged summary to attach n_total (no join, so null group
    keys behave exactly like ``groupBy``'s), rank, take k.

    Output: (group…, item, est_count, err_bound, n_total) where
    est_count is a LOWER bound on the true frequency,
    true − est ≤ err_bound = ⌊n_total/(capacity+1)⌋, and every item
    with true frequency > err_bound is guaranteed to survive into the
    merged summary (it cannot be decremented to zero everywhere).
    With capacity ≥ distinct items no trim ever fires and the counts
    are exact.  ``capacity`` defaults to 8·k."""
    capacity = int(capacity) if capacity is not None else 8 * int(k)
    gcols = list(group_cols)
    partials = mg_partials(df, col, capacity, group_cols=gcols)
    merged = partials.groupBy(*gcols, "item").agg(F.sum("cnt").alias("est_count"))
    # the windows run over the MERGED SUMMARY (≤ groups × (capacity+1)
    # rows), not the data — a single-partition window in the ungrouped
    # case is a few thousand rows, not a scale risk
    wg = Window.partitionBy(*gcols)
    rank_w = wg.orderBy(F.col("est_count").desc(), F.col("item"))
    return (
        merged.withColumn(
            "n_total",
            F.max(F.when(F.col("item").isNull(), F.col("est_count"))).over(wg),
        )
        .where(F.col("item").isNotNull())
        .withColumn("_rn", F.row_number().over(rank_w))
        .where(F.col("_rn") <= int(k))
        .select(
            *gcols,
            "item",
            "est_count",
            F.floor(F.col("n_total") / F.lit(capacity + 1)).cast("long").alias("err_bound"),
            "n_total",
        )
    )


# ---------------------------------------------------------------- Count-Min

def cms_slot_exprs(key: str, depth: int, width: int) -> "list[F.Column]":
    """The ``depth`` Count-Min hash slots of string column ``key``:
    row j's slot is the first 8 hex chars of md5("j:" || key) mod
    ``width``.  md5 is chosen over xxhash64 deliberately: DuckDB has
    the same md5, so the oracle recomputes the ENTIRE sketch
    bit-for-bit (CAST(concat('0x', substr(md5(..), 1, 8)) AS BIGINT)
    — the established engine-parity hash, queries/extras_corpus.py).
    8 hex chars fit a non-negative 32-bit value, so the BIGINT mod
    never sees a sign."""
    return [
        (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col(key))), 1, 8), 16, 10)
            .cast("long") % int(width)
        ).alias(f"slot_{j}")
        for j in range(int(depth))
    ]


def countmin_sketch(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the string
    column ``col``: a ``depth`` × ``width`` counter table as rows
    (j, slot, cnt) — cnt = number of input rows whose j-th hash lands
    in that slot.  One groupBy with map-side combine builds it; two
    sketches over disjoint data MERGE by summing counters on (j, slot)
    (sum is the aggregate, so Spark's partial aggregation already IS
    the per-partition-sketch merge).  State is depth × width counters
    no matter how many distinct keys exist — the point-frequency
    complement of the Misra-Gries top-k summary above (MG answers
    "which items are hot", CMS answers "how often is THIS item" for
    any item, never undercounting).  Null keys are dropped (parity
    with mg_partials).

    The same body runs UNCHANGED on a streaming frame: narrow
    projection + sum-groupBy is exactly what Structured Streaming's
    stateful aggregation maintains across micro-batches
    (test_streaming_countmin_matches_batch_sketch pins
    stream ≡ batch bit-for-bit)."""
    keyed = df.where(F.col(col).isNotNull()).select(F.col(col).cast("string").alias("_k"))
    slots = keyed.select(
        F.posexplode(F.array(*cms_slot_exprs("_k", depth, width))).alias("j", "slot")
    )
    return slots.groupBy("j", "slot").agg(F.count("*").cast("long").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``: the
    Count-Min estimate min_j(counter[j][h_j(key)]) — an UPPER bound on
    the true count (each counter only ever adds other keys' collisions;
    with depth d and width w, est − true ≤ 2n/w with probability
    ≥ 1 − (1/2)^d, the classic CM guarantee).  The probe explodes each
    key into its ``depth`` (j, slot) coordinates and pays ONE equi-join
    against the sketch (the sketch side is depth × width rows —
    AQE broadcasts it on its own; no size hint needed), then a min per
    key.  ``depth``/``width`` must match the build."""
    probes = keys.select(F.col(col).cast("string").alias("_k")).where(
        F.col("_k").isNotNull()
    ).distinct().select(
        "_k", F.posexplode(F.array(*cms_slot_exprs("_k", depth, width))).alias("j", "slot")
    )
    # LEFT join + coalesce 0: a probed key that was never inserted can
    # hash to a slot no build key touched — that slot has NO counter
    # row, and an inner join would silently drop it, turning the
    # correct estimate (0) into the min of the remaining colliding
    # counters.  Present keys are unaffected (all their slots exist).
    return (
        probes.join(sketch, ["j", "slot"], "left")
        .groupBy(F.col("_k").alias(col))
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count"))
    )


# ------------------------------------------------------------ md5-HLL

def hll_md5_registers(df: DataFrame, col: str, *, m: int = 256) -> DataFrame:
    """HyperLogLog registers with ENGINE-PORTABLE hashing — the
    graduation path for the HLL family, which until now was rows-only
    (Spark's approx_count_distinct hashes internally, so no oracle
    could replay it).  Same md5 trick as the Count-Min sketch above:
    32 hash bits from the first 8 md5 hex chars; the low 8 bits pick
    one of ``m`` = 256 registers, and rho = (#trailing zeros of the
    remaining 24 bits) + 1 — trailing zeros instead of the textbook
    leading zeros because ``w & -w`` isolates the lowest set bit in
    ANY SQL engine, and log2 of an exact power of two rounds to the
    same integer everywhere (both streams are geometric(1/2), which
    is all the estimator needs).  w == 0 → rho = 25 (all 24 bits
    zero).

    Output: (bucket, rho) rows, one per OCCUPIED register — max is
    the aggregate, so registers merge across shards/partitions/days
    by groupBy-max (Spark's partial aggregation already is the
    per-partition-sketch merge), and the frame is <= m rows no matter
    how many distinct keys the input holds.  Null keys are dropped
    (the countmin/mg policy)."""
    mm = int(m)
    if mm != 256:
        raise ValueError("m=256 is the pinned engine-portable config")
    h = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    keyed = df.where(F.col(col).isNotNull()).select(
        (h % mm).alias("bucket"), F.floor(h / mm).cast("long").alias("_w")
    )
    lowest = F.col("_w").bitwiseAND(-F.col("_w"))
    rho = F.when(F.col("_w") == 0, F.lit(25)).otherwise(
        (F.round(F.log(lowest.cast("double")) / F.lit(0.6931471805599453), 0) + 1).cast("int")
    )
    return (
        keyed.withColumn("rho", rho.cast("int"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_md5_estimate(registers: DataFrame, *, m: int = 256) -> DataFrame:
    """The HLL estimate from :func:`hll_md5_registers` output — one
    row (n_est).  Flajolet et al.'s bias-corrected harmonic mean with
    the small-range linear-counting correction (raw <= 2.5m and empty
    registers present -> m·ln(m/V)).  The Σ 2^-rho fold runs over the
    register list SORTED by bucket (empty registers contribute 2^0
    = 1 via the m - occupied term, exactly), so float association is
    pinned and a SQL oracle replays the estimate bit-for-bit — the
    whole chain (hash, registers, estimator) is deterministic, which
    is what lets this HLL carry a FULL value-hash oracle where
    approx_count_distinct cannot."""
    mm = int(m)
    alpha = 0.7213 / (1.0 + 1.079 / mm)
    agg = registers.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("bucket", "rho"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(2.0), -x["rho"].cast("double")),
        ).alias("_s_occ"),
        F.count("*").cast("long").alias("_occ"),
    )
    s_total = F.col("_s_occ") + (F.lit(mm) - F.col("_occ")).cast("double")
    raw = F.lit(alpha * mm * mm) / s_total
    v = F.lit(mm) - F.col("_occ")  # empty registers
    est = F.when(
        (raw <= F.lit(2.5 * mm)) & (v > 0),
        F.lit(float(mm)) * F.log(F.lit(float(mm)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(est.alias("n_est"))
