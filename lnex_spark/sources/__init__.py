"""Source/sink seams: parquet locally, Iceberg on a cluster."""
