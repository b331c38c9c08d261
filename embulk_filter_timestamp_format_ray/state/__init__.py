"""Exactly-once state: manifests, checkpoints, per-partition lineage."""
