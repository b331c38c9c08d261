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

Time travel: each commit also snapshots the manifest under
``history/manifest-v{N}.json`` and prunes snapshots older than
``retain_history`` versions.  ``read_manifest_at`` resolves a historical
version; ``gc_orphan_txns`` treats every data file referenced by a RETAINED
snapshot as live, so a snapshot within the retention window is always
readable (Delta-Lake-style VERSION AS OF, bounded by retention).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

MANIFEST_NAME = "manifest.json"
HISTORY_DIR = "history"
DEFAULT_RETAIN_HISTORY = 8
LOCK_NAME = ".commit.lock"


class CommitConflict(Exception):
    """The manifest advanced between this writer's read and its commit —
    a concurrent writer won the race.  The apply is safe to RETRY whole:
    LSN watermarks dedup anything the winner already committed, so the
    retry applies only the remainder (exactly-once is preserved)."""


def lake_paths(lake_dir: str) -> str:
    return os.path.join(lake_dir, MANIFEST_NAME)


def read_manifest(lake_dir: str) -> "dict[str, Any]":
    """Current committed manifest, or an empty v0 when none exists."""
    path = lake_paths(lake_dir)
    if not os.path.exists(path):
        return {"version": 0, "partitions": {}, "schema_columns": None}
    with open(path) as f:
        return json.load(f)


def _atomic_write_json(path: str, obj: "dict[str, Any]") -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _history_path(lake_dir: str, version: int) -> str:
    return os.path.join(lake_dir, HISTORY_DIR, f"manifest-v{version:08d}.json")


def commit_manifest(lake_dir: str, manifest: "dict[str, Any]",
                    retain_history: int = DEFAULT_RETAIN_HISTORY,
                    expected_version: "int | None" = None) -> None:
    """Atomic swap (write sidecar then POSIX os.replace), then snapshot the
    committed manifest into ``history/`` and prune snapshots older than
    ``retain_history`` versions.  The snapshot happens AFTER the swap: a
    crash in between loses only the newest snapshot, and ``read_manifest_at``
    serves the current version from ``manifest.json`` itself.

    ``expected_version`` enables optimistic concurrency for multiple
    writers: under an exclusive flock on ``.commit.lock``, the current
    manifest version is re-read and the commit raises :class:`CommitConflict`
    if it no longer matches — i.e. a concurrent writer committed first.
    The read-merge-commit cycle then retries from the fresh manifest
    (idempotent under LSN watermarks).  ``None`` keeps the single-writer
    fast path (no version check; the lock still serializes the swap)."""
    os.makedirs(lake_dir, exist_ok=True)
    with open(os.path.join(lake_dir, LOCK_NAME), "w") as lock:
        try:
            import fcntl

            fcntl.flock(lock, fcntl.LOCK_EX)
        except ImportError:  # pragma: no cover - non-POSIX fallback
            pass
        if expected_version is not None:
            current = int(read_manifest(lake_dir).get("version", 0))
            if current != int(expected_version):
                raise CommitConflict(
                    f"lake {lake_dir!r} is at version {current}, but this "
                    f"writer merged against version {expected_version}; a "
                    f"concurrent writer committed first — retry the apply "
                    f"(watermarks dedup already-committed events)")
        # commit wall-clock (TIMESTAMP AS OF resolution — metadata only,
        # never part of any data/equality contract)
        manifest["committed_at_unix_ms"] = int(time.time() * 1000)
        _atomic_write_json(lake_paths(lake_dir), manifest)
        version = int(manifest.get("version", 0))
        os.makedirs(os.path.join(lake_dir, HISTORY_DIR), exist_ok=True)
        _atomic_write_json(_history_path(lake_dir, version), manifest)
        floor = version - max(int(retain_history), 1) + 1
        for hv in list_versions(lake_dir):
            if hv < floor:
                try:
                    os.unlink(_history_path(lake_dir, hv))
                except OSError:  # pragma: no cover - already gone
                    pass


def list_versions(lake_dir: str) -> "list[int]":
    """Versions readable via ``read_manifest_at`` (retained snapshots plus
    the current manifest), ascending."""
    versions = set()
    hist = os.path.join(lake_dir, HISTORY_DIR)
    if os.path.isdir(hist):
        for name in os.listdir(hist):
            if name.startswith("manifest-v") and name.endswith(".json"):
                try:
                    versions.add(int(name[len("manifest-v"):-len(".json")]))
                except ValueError:
                    continue
    current = read_manifest(lake_dir).get("version", 0)
    if current:
        versions.add(current)
    return sorted(versions)


def read_manifest_at(lake_dir: str, version: int) -> "dict[str, Any]":
    """Manifest as of ``version`` (time travel).  The current version reads
    ``manifest.json`` directly; older ones come from retained snapshots."""
    current = read_manifest(lake_dir)
    if int(version) == int(current.get("version", 0)):
        return current
    path = _history_path(lake_dir, int(version))
    if not os.path.exists(path):
        raise ValueError(
            f"lake {lake_dir!r} has no retained snapshot for version "
            f"{version}; available versions: {list_versions(lake_dir)} "
            f"(older snapshots are pruned by the retain_history policy)")
    with open(path) as f:
        return json.load(f)


def _history_manifests(lake_dir: str) -> "list[dict[str, Any]]":
    hist = os.path.join(lake_dir, HISTORY_DIR)
    out = []
    if not os.path.isdir(hist):
        return out
    for name in sorted(os.listdir(hist)):
        if not (name.startswith("manifest-v") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(hist, name)) as f:
                out.append(json.load(f))
        except (OSError, json.JSONDecodeError):  # pragma: no cover
            continue
    return out


def partition_watermark(manifest: "dict[str, Any]", pid: int) -> int:
    part = manifest["partitions"].get(str(pid))
    return part["last_applied_lsn"] if part else -1


def min_watermark(manifest: "dict[str, Any]", num_partitions: int) -> int:
    """Global low-watermark: events at/below it are replays everywhere and
    can be pruned before the shuffle."""
    if len(manifest["partitions"]) < num_partitions:
        return -1
    return min(p["last_applied_lsn"] for p in manifest["partitions"].values())


def partition_files(manifest: "dict[str, Any]") -> "list[str]":
    """The lake BASE state files only — what a plain table read should scan
    when no partition carries pending delta files (see
    :func:`partition_delta_files`)."""
    return [p["path"] for p in manifest["partitions"].values() if p.get("path")]


def partition_delta_files(manifest: "dict[str, Any]") -> "list[str]":
    """Pending merge-on-read delta files across all partitions (appended by
    ``CDCPipeline.apply_delta``; folded into base by ``compact_deltas`` or
    any later base-merge apply)."""
    out = []
    for p in manifest["partitions"].values():
        out.extend(d["path"] for d in p.get("deltas", []) if d.get("path"))
    return out


def has_deltas(manifest: "dict[str, Any]") -> bool:
    return any(p.get("deltas") for p in manifest["partitions"].values())


def partition_dv_files(manifest: "dict[str, Any]") -> "list[str]":
    """Pending deletion-vector key files across all partitions (appended by
    ``CDCPipeline.delete_where(mode='dv')``; folded away — survivors
    rewritten, list cleared — by any base merge / compaction / rewrite that
    touches the partition)."""
    out = []
    for p in manifest["partitions"].values():
        out.extend(d["path"] for d in p.get("dvs", []) if d.get("path"))
    return out


def has_dvs(manifest: "dict[str, Any]") -> bool:
    return any(p.get("dvs") for p in manifest["partitions"].values())


def data_files(manifest: "dict[str, Any]") -> "list[str]":
    """Every data file the manifest references: partition base files,
    pending delta files, pending deletion-vector files, and dead-letter
    quarantine files (GC liveness treats all as live; table reads must fold
    base+deltas minus dvs and must exclude quarantine files so quarantined
    rows never leak into lake state)."""
    return (partition_files(manifest) + partition_delta_files(manifest)
            + partition_dv_files(manifest)
            + [d["path"] for d in manifest.get("dlq", []) if d.get("path")])


def gc_orphan_txns(lake_dir: str, keep_txns: "set[str]",
                   dry_run: bool = False) -> "list[str]":
    """Remove txn dirs not referenced by the committed manifest OR any
    retained history snapshot (so time travel within the retention window
    survives GC). Returns removed dir names.  ``dry_run=True`` reports the
    orphan set without touching disk — the VACUUM DRY RUN analog for
    auditing what a GC would reclaim."""
    removed = []
    manifest = read_manifest(lake_dir)
    live = {os.path.join(lake_dir, os.path.dirname(p)) for p in data_files(manifest)}
    for hist in _history_manifests(lake_dir):
        live |= {os.path.join(lake_dir, os.path.dirname(p))
                 for p in data_files(hist)}
    live |= {os.path.join(lake_dir, t) for t in keep_txns}
    if not os.path.isdir(lake_dir):
        return removed
    for name in os.listdir(lake_dir):
        full = os.path.join(lake_dir, name)
        if not name.startswith("txn-") or not os.path.isdir(full):
            continue
        if full in live:
            continue
        if not dry_run:
            if os.path.islink(full):
                # shallow-clone txn dir (CDCPipeline.clone_lake): the link
                # target belongs to the SOURCE lake — remove only the link,
                # never reach through it (the source's own GC owns those
                # files)
                os.unlink(full)
            else:
                for f in os.listdir(full):
                    os.unlink(os.path.join(full, f))
                os.rmdir(full)
        removed.append(name)
    return removed
