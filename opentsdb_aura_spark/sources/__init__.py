"""Sources & sinks: batch ingest to the partitioned Parquet store,
streaming ingest, store layout."""
