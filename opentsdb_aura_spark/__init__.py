"""opentsdb_aura_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of OpenTSDB/opentsdb-aura (reference surveyed in
SURVEY.md) on top of the Spark DataFrame/SQL stack:

- storage: time-partitioned Parquet instead of off-heap Gorilla
  segments (``sources/``),
- series selection: Catalyst predicates + partition pruning instead of
  RoaringBitmap inverted indices (``filters``),
- downsample / rate / group-by: declarative DataFrame aggregation
  instead of the fused per-segment iterator kernel (``operators/``),
- streaming ingest: Structured Streaming with watermarks instead of
  shard event loops (``streaming/``).

Everything here derives from public knowledge only: the Apache Spark
API and the reference repo's observable semantics.
"""

from opentsdb_aura_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
