"""Sources: deterministic synthetic transcript/CDC generators and parquet IO."""
