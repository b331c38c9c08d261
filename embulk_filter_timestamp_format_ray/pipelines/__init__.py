"""Pipelines: the CDC upsert engine and verification reads."""
