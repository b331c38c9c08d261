"""Write-then-manifest-swap exactly-once commit protocol (SURVEY.md §7 step
6; Delta-Lake-style, cf. PAPERS.md "Delta Lake" VLDB 2020).

Layout under a lake directory:

    lake/
      manifest.json                     # THE commit point (atomic os.replace)
      txn-000001/part-00000.parquet     # immutable data files per apply txn
      txn-000001/part-00017.parquet
      txn-000002/...

``manifest.json`` records, per partition: the current data file, row count,
``last_applied_lsn`` watermark (the idempotent-replay checkpoint), and a
lineage list of (txn, events_applied) entries.  A crash before the swap
leaves orphan txn files that are never referenced — the previous manifest
stays the authoritative state, so restart simply re-applies from the old
watermarks (exactly-once at the table level under at-least-once execution).
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_NAME = "manifest.json"


def lake_paths(lake_dir: str) -> str:
    return os.path.join(lake_dir, MANIFEST_NAME)


def read_manifest(lake_dir: str) -> "dict[str, Any]":
    """Current committed manifest, or an empty v0 when none exists."""
    path = lake_paths(lake_dir)
    if not os.path.exists(path):
        return {"version": 0, "partitions": {}, "schema_columns": None}
    with open(path) as f:
        return json.load(f)


def commit_manifest(lake_dir: str, manifest: "dict[str, Any]") -> None:
    """Atomic swap: write sidecar then os.replace (POSIX atomic rename)."""
    os.makedirs(lake_dir, exist_ok=True)
    path = lake_paths(lake_dir)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def partition_watermark(manifest: "dict[str, Any]", pid: int) -> int:
    part = manifest["partitions"].get(str(pid))
    return part["last_applied_lsn"] if part else -1


def min_watermark(manifest: "dict[str, Any]", num_partitions: int) -> int:
    """Global low-watermark: events at/below it are replays everywhere and
    can be pruned before the shuffle."""
    if len(manifest["partitions"]) < num_partitions:
        return -1
    return min(p["last_applied_lsn"] for p in manifest["partitions"].values())


def data_files(manifest: "dict[str, Any]") -> "list[str]":
    return [p["path"] for p in manifest["partitions"].values() if p.get("path")]


def gc_orphan_txns(lake_dir: str, keep_txns: "set[str]") -> "list[str]":
    """Remove txn dirs not referenced by the committed manifest (safe: the
    manifest is the commit point). Returns removed dir names."""
    removed = []
    manifest = read_manifest(lake_dir)
    live = {os.path.join(lake_dir, os.path.dirname(p)) for p in data_files(manifest)}
    live |= {os.path.join(lake_dir, t) for t in keep_txns}
    if not os.path.isdir(lake_dir):
        return removed
    for name in os.listdir(lake_dir):
        full = os.path.join(lake_dir, name)
        if not name.startswith("txn-") or not os.path.isdir(full):
            continue
        if full in live:
            continue
        for f in os.listdir(full):
            os.unlink(os.path.join(full, f))
        os.rmdir(full)
        removed.append(name)
    return removed
