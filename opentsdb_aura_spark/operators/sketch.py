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
and distinct cardinalities past what an agg hash map can hold.  The reference has no
frequency sketches (its topn node ranks full aggregates,
opentsdb/.../TopNProcessor — served here by analytic.topn); this
operator extends the engine for training-data pipelines (stop-list
mining, hot-key discovery, skew probes).

The per-partition pass is an Arrow-batched mapInPandas: each batch is
counted vectorized (pandas groupby-size), merged into the running
dict, and trimmed only when the dict exceeds capacity — per-item
Python work happens at most O(C log C) per trim, not per row.
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
    """Per-partition Misra–Gries summaries: ≤ ``capacity`` rows
    (group…, item, cnt) per (partition, group), where ``cnt`` is a
    lower bound on the item's partition-local frequency, undercounting
    by at most n_partition/(capacity+1).  Null items are ignored."""
    capacity = int(capacity)
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    gcols = list(group_cols)
    slim = df.select(*gcols, F.col(col).alias("item"))
    fields = [slim.schema[c] for c in gcols] + [
        slim.schema["item"],
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
        for pdf in batches:
            pdf = pdf.dropna(subset=["item"])
            if pdf.empty:
                continue
            if gcols:
                counted = pdf.groupby(gcols + ["item"], sort=False, dropna=False).size()
                for key, sub in counted.groupby(level=list(range(len(gcols))), sort=False):
                    key = key if isinstance(key, tuple) else (key,)
                    summaries[key] = fold(
                        summaries.get(key), sub.droplevel(list(range(len(gcols))))
                    )
            else:
                summaries[()] = fold(summaries.get(()), pdf["item"].value_counts(sort=False))
        frames = [
            pd.DataFrame(
                {
                    **{g: [key[i]] * len(s) for i, g in enumerate(gcols)},
                    "item": s.index,
                    "cnt": s.astype("int64").to_numpy(),
                }
            )
            for key, s in summaries.items()
            if len(s)
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
    state everywhere: MG partials per partition, one hash-aggregate
    merge (O(partitions × capacity) rows), rank, take k.

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
    totals = (
        df.where(F.col(col).isNotNull())
        .groupBy(*gcols)
        .agg(F.count("*").alias("n_total"))
    )
    # no-group: totals is literally one row — broadcast it; grouped:
    # totals is O(groups), let AQE size-pick the join strategy
    joined = merged.join(totals, on=gcols) if gcols else merged.crossJoin(F.broadcast(totals))
    w = Window.partitionBy(*gcols).orderBy(F.col("est_count").desc(), F.col("item"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .select(
            *gcols,
            "item",
            "est_count",
            F.floor(F.col("n_total") / F.lit(capacity + 1)).cast("long").alias("err_bound"),
            "n_total",
        )
    )
