"""Sources: parquet table loaders and the raw-event decode pipeline."""
