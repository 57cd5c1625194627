"""D1 — out-of-order / duplicate handling: last-write-wins per (series, ts).

The reference's segments accept OOO and duplicate writes; reads
de-duplicate last-write-wins while densifying into a per-second array
(core/src/main/java/net/opentsdb/aura/metrics/core/gorilla/
GorillaRawTimeSeriesEncoder.java:168-252).  "Last write" is arrival
order, which the Spark engine materializes as an explicit
``ingest_seq`` column at ingest (the reference relies on physical
write order inside the segment buffer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe_last_write_wins(points: DataFrame, key_cols: tuple[str, ...] = ("series_id", "ts")) -> DataFrame:
    """Keep the latest-arriving value per (series_id, ts).

    Implemented as a max_by group-by rather than a row_number window:
    hash aggregation gets map-side partial combining (far cheaper at
    100 TB than a full sort per series), and the output cardinality is
    the deduped one.
    """
    other = [c for c in points.columns if c not in key_cols and c != "ingest_seq"]
    aggs = [F.max_by(F.col(c), F.col("ingest_seq")).alias(c) for c in other]
    aggs.append(F.max("ingest_seq").alias("ingest_seq"))
    return points.groupBy(*key_cols).agg(*aggs)
