"""Canonical data model: metric points, series identity, segments.

Reference data model (SURVEY.md §1):
  point  = (namespace, metric, tags MAP<STRING,STRING>, ts epoch-s, value double)
  series = identified by a 64-bit hash of metric + canonical tag set
           (core/src/main/java/net/opentsdb/aura/metrics/core/XxHash.java:25-47,
            TimeSeriesShard.java:706-712)
  segment = all points of one series in a fixed wall-clock window
           (default 2 h, core/.../core/ShardConfig.java:35)

Spark re-expression: a ``metrics`` DataFrame with materialized
``series_id`` (xxhash64 of metric + canonicalized tags) and
``segment_time`` (epoch floor to the segment width) columns.
``segment_time`` is the Parquet partition column, so time-range
predicates prune partitions exactly the way the reference maps a query
range onto its segment ring
(core/.../core/LongRunningStorage.java:66-93).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference default: 2-hour segments (ShardConfig.java:35).
SEGMENT_WIDTH_SECONDS = 7200

POINT_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.LongType()),  # epoch seconds
        T.StructField("value", T.DoubleType()),
        T.StructField("ingest_seq", T.LongType()),  # arrival order for last-write-wins
    ]
)

SERIES_DIM_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("first_seen", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def NAN() -> Column:
    """NaN double literal (lazy: ``F.lit`` needs an active session).
    Shared by every operator module — NaN is the engine-wide "no
    value" marker (the reference uses Double.NaN the same way)."""
    return F.lit(float("nan")).cast("double")


def canonical_tags(tags: Column) -> Column:
    """Canonical string form of a tag map: ``k1=v1,k2=v2`` sorted by key.

    The reference hashes the tag set in sorted-key order to get a
    stable tagset hash (TimeSeriesShard.java:884-914); sorting the
    map entries gives the same stability.

    Null-valued entries are treated as ABSENT — a tag either has a
    string value or does not exist (the reference's tag maps cannot
    hold nulls; a null can only arise from adapters like
    ``events_as_points`` when a JSON prop is missing).  The drop is
    explicit here and mirrored on the write path (``normalize_points``
    strips null entries from the stored map), so {user:1, k:NULL} and
    {user:1} are the same series everywhere, not just by accident of
    ``array_join`` skipping NULLs.
    """
    clean = F.map_filter(tags, lambda k, v: v.isNotNull())
    sorted_entries = F.array_sort(F.map_entries(clean))

    # escape the join delimiters (and the escape char itself) inside
    # keys/values: without it {a: "1", b: "2"} and {a: "1,b=2"}
    # canonicalize identically and collide onto one series_id — the
    # reference hashes key/value bytes separately and has no such
    # ambiguity
    def esc(c: Column) -> Column:
        c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
        c = F.replace(c, F.lit("="), F.lit("\\="))
        return F.replace(c, F.lit(","), F.lit("\\,"))

    return F.array_join(
        F.transform(sorted_entries, lambda e: F.concat(esc(e["key"]), F.lit("="), esc(e["value"]))),
        ",",
    )


def series_id(metric: Column, tags: Column) -> Column:
    """64-bit series identity: xxhash64(metric, canonical_tags).

    Mirrors seriesHash = hash(metric) ⊕ hash(tagset)
    (TimeSeriesShard.java:706-712) — the exact hash function is a
    storage detail; identity and distribution properties are what
    matter. xxhash64 is a Spark built-in, so this stays JVM-side.
    """
    return F.xxhash64(metric, canonical_tags(tags))


def segment_time(ts: Column, width: int = SEGMENT_WIDTH_SECONDS) -> Column:
    """Epoch floor of ``ts`` to the segment width.

    segmentTime = ts - (ts % width)
    (core/.../core/TimeseriesStorageContext.java:75-77).
    """
    return (ts - (ts % F.lit(width))).cast("long")


def normalize_points(df: DataFrame, width: int = SEGMENT_WIDTH_SECONDS) -> DataFrame:
    """Materialize series_id + segment_time on a raw point DataFrame.

    Input must have columns (namespace, metric, tags, ts, value[, ingest_seq]).
    This is the write-path normalization every ingest (batch or
    streaming) applies before landing Parquet.  ``width`` is the
    segment/partition width — a deployment knob (the reference ranges
    1 h to 6 weeks, core/.../downsample/SegmentWidth.java:23-29);
    size it so partitions hold enough data for full files.
    """
    if "ingest_seq" not in df.columns:
        df = df.withColumn("ingest_seq", F.monotonically_increasing_id())
    # canonical map: null-valued entries are absent (see canonical_tags)
    df = df.withColumn("tags", F.map_filter(F.col("tags"), lambda k, v: v.isNotNull()))
    return df.withColumn("series_id", series_id(F.col("metric"), F.col("tags"))).withColumn(
        "segment_time", segment_time(F.col("ts"), width)
    )


def epoch_seconds(ts_col: Column) -> Column:
    """Timestamp → epoch seconds (floor), matching DuckDB's
    ``floor(epoch(ts))`` for post-1970 data."""
    return F.unix_timestamp(ts_col).cast("long")


def any_ts_to_epoch_seconds(name: str, dtype: str) -> Column:
    """Normalize a timestamp column (by name) to epoch seconds.

    ``bigint`` input means Parquet TIMESTAMP(NANOS) read via
    ``spark.sql.legacy.parquet.nanosAsLong`` — integer-divide (double
    division loses precision above 2^53).
    """
    if dtype in ("bigint", "long"):
        return F.expr(f"`{name}` div 1000000000").cast("long")
    return epoch_seconds(F.col(name))


def events_as_points(events: DataFrame, width: int = SEGMENT_WIDTH_SECONDS) -> DataFrame:
    """Adapt the driver's ``events`` test table to the canonical point
    schema: event_type → metric, user_id → a tag, props JSON 'k' → a
    tag.  Gives a realistic multi-series workload (5 metrics × ~25
    users) for exercising every metric-path operator on shared data.
    """
    ts_dtype = dict(events.dtypes)["ts"]
    pts = events.select(
        F.lit("default").alias("namespace"),
        F.col("event_type").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("user"), F.lit("k")),
            F.array(
                F.col("user_id").cast("string"),
                F.get_json_object(F.col("props"), "$.k"),
            ),
        ).alias("tags"),
        any_ts_to_epoch_seconds("ts", ts_dtype).alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("long").alias("ingest_seq"),
    )
    return normalize_points(pts, width)
