"""map_batches stages: the timestamp_format transform, partitioning, dedup,
text analysis, ANN, and multimodal stubs."""
