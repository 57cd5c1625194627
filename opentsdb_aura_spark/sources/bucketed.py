"""Series-bucketed metrics store: shuffle-free per-series operators.

At 100 TB the dominant cost of downsample/group-by queries is the
shuffle that co-locates each series' points.  A store *bucketed* by
``series_id`` (Spark's ``bucketBy`` — hash-partitioned files with the
bucket id in the file name, bucket spec in the table catalog)
eliminates it: scans come up already hash-partitioned on
``series_id``, so any aggregation whose keys include ``series_id``
(per-series downsample, stage 1 of the two-stage ds→gb plan, the rate
lag window's partitionBy) needs **no Exchange at all**, and
bucketed-to-bucketed joins (points ⋈ points for arithmetic expression
nodes) skip both shuffles.

Trade-off vs the time-partitioned layout of ``sources/batch.py``:
time-range pruning moves from directory level down to parquet
row-group stats, so the bucketed layout suits series-dense, long-range
workloads (the cold tier; c.f. the reference's long-term Aerospike
store keyed by series — aerospike/.../LTSAerospike.java keys records
by (hash, timestamp) so one series' history is co-located the same
way), while short-range dashboards stay on the segment-partitioned
hot layout.  A deployment keeps both, exactly like the reference's
hot/cold split; ``plans/query.py`` splices them.

The table catalog is in-memory in local mode, so the bucket spec must
be re-declared per session: ``register_bucketed_metrics`` issues the
``CREATE TABLE … CLUSTERED BY`` DDL over the existing files (external
location — DROP TABLE never deletes data).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

BUCKET_COL = "series_id"
SORT_COLS = ("series_id", "ts")


def bucketed_table_name(path: str) -> str:
    """Deterministic catalog name for the bucketed table at ``path``."""
    return "aura_bucketed_" + hashlib.md5(path.encode()).hexdigest()[:10]


def write_bucketed_metrics(
    points: DataFrame, path: str, *, n_buckets: int = 8, table: str | None = None
) -> str:
    """Write points as an external parquet table bucketed by
    ``series_id`` and sorted by (series_id, ts) within each bucket
    file.  Returns the catalog table name.

    ``n_buckets`` sizes the shuffle-free parallelism: reads of the
    table run one task per bucket (per directory partition), so at
    scale pick buckets ≈ cluster cores; locally 8 keeps files
    chunky."""
    import json
    import os

    spark = points.sparkSession
    table = table or bucketed_table_name(path)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        points.write.mode("overwrite")
        .bucketBy(n_buckets, BUCKET_COL)
        .sortBy(*SORT_COLS)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
    # persist the bucket spec next to the data: a later session that
    # re-declares the table MUST use the same bucket count, or Spark
    # trusts the wrong spec and plans shuffle-free aggregations over
    # mis-assigned files (silently wrong groupings)
    with open(os.path.join(path, "_BUCKET_SPEC.json"), "w") as f:
        json.dump({"n_buckets": int(n_buckets), "bucket_col": BUCKET_COL}, f)
    return table


def register_bucketed_metrics(
    spark: SparkSession, path: str, *, n_buckets: int = 8, table: str | None = None
) -> DataFrame:
    """Return the bucketed table at ``path`` as a DataFrame, declaring
    the external table (with its bucket spec) in this session's
    catalog if it isn't there yet.  Idempotent per session."""
    import json
    import os

    table = table or bucketed_table_name(path)
    spec_file = os.path.join(path, "_BUCKET_SPEC.json")
    if os.path.exists(spec_file):
        with open(spec_file) as f:
            spec = json.load(f)
        if int(spec.get("n_buckets", n_buckets)) != int(n_buckets):
            raise ValueError(
                f"bucket spec mismatch for {path}: written with "
                f"{spec['n_buckets']} buckets, asked to register {n_buckets}"
            )
    if not spark.catalog.tableExists(table):
        schema = spark.read.parquet(path).schema
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({BUCKET_COL}) SORTED BY ({', '.join(SORT_COLS)}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
    return spark.table(table)
