"""Binlog-file directory tailer: the operational front door of the CDC
engine (SURVEY.md §2.8 "tails a binlog-style change stream").

A binlog shipper drops change-event parquet files into a directory; the
tailer applies every file not yet ingested, in ascending min(lsn) order,
``files_per_batch`` files per exactly-once micro-batch commit.

Recovery bookkeeping is two-tier and BOUNDED:

* coarse tier — the lake's own per-partition LSN watermarks: a file whose
  ``max(lsn) ≤ resume_lsn()`` is provably committed in every partition and
  is skipped from parquet FOOTER STATISTICS alone (no row reads).  A
  crashed tailer restarted on a 10^5-file directory pays footers only.
* fine tier — a sidecar checkpoint (``_ingest_tail.json`` in the lake dir)
  naming the already-applied files the coarse tier can't yet prove
  committed (the global min watermark lags file boundaries: a partition
  receiving no rows from a file keeps its old watermark).  The sidecar is
  pruned at every write to files still above ``resume_lsn`` — it holds the
  ambiguous TAIL, typically a handful of entries, never the directory.

The sidecar is written AFTER the exactly-once lake commit; a crash
between the two re-applies that file batch on restart, which the
watermark/max-LSN merge makes a no-op (at-least-once ingest, exactly-once
table effect).
"""

from __future__ import annotations

import json
import logging
import os

import pyarrow.parquet as pq

logger = logging.getLogger(__name__)

SIDECAR_NAME = "_ingest_tail.json"


def _file_footer_meta(path: str, lsn_col: str = "lsn") -> "tuple[int, int, int]":
    """(min_lsn, max_lsn, num_rows) from ONE parquet footer read — no row
    reads.  Falls back to a single-column scan only when the writer omitted
    statistics (pyarrow writes them by default)."""
    f = pq.ParquetFile(path)
    rows = f.metadata.num_rows
    idx = f.schema_arrow.get_field_index(lsn_col)
    lo, hi = None, None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = None
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is not None:
        return int(lo), int(hi), rows
    import pyarrow.compute as pc

    col = f.read(columns=[lsn_col]).column(lsn_col)
    return int(pc.min(col).as_py()), int(pc.max(col).as_py()), rows


def file_lsn_range(path: str, lsn_col: str = "lsn") -> "tuple[int, int]":
    """(min, max) of ``lsn_col`` from parquet row-group statistics — see
    :func:`_file_footer_meta`."""
    lo, hi, _ = _file_footer_meta(path, lsn_col)
    return lo, hi


def _sidecar_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, SIDECAR_NAME)


def _read_sidecar(lake_dir: str) -> "dict[str, int]":
    try:
        with open(_sidecar_path(lake_dir)) as f:
            return {k: int(v) for k, v in json.load(f).items()}
    except (OSError, json.JSONDecodeError):
        return {}


def _write_sidecar(lake_dir: str, entries: "dict[str, int]",
                   resume_lsn: int) -> None:
    os.makedirs(lake_dir, exist_ok=True)
    # merge-on-write: concurrent active-active tailers each checkpoint
    # their OWN applied files; overwriting would drop the peer's entries
    # and cause redundant (idempotent, but wasteful) re-application.  The
    # remaining read-merge-write race only ever LOSES entries, which the
    # watermark/LWW replay prune absorbs — the sidecar is an optimization
    # tier, never a correctness tier.
    merged = {**_read_sidecar(lake_dir), **entries}
    kept = {k: v for k, v in merged.items() if v > resume_lsn}
    tmp = _sidecar_path(lake_dir) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(kept, f, sort_keys=True)
    os.replace(tmp, _sidecar_path(lake_dir))


def pending_files(directory: str, resume_lsn: int,
                  ingested: "dict[str, int] | None" = None,
                  suffix: str = ".parquet",
                  with_meta: bool = False):
    """Files with events beyond ``resume_lsn`` and not in the sidecar,
    ascending by min(lsn) — ONE footer read per file.  ``with_meta=True``
    returns ``[(name, max_lsn, num_rows)]`` so callers never re-open the
    footers this scan already paid for."""
    ingested = ingested or {}
    ranged = []
    for name in sorted(os.listdir(directory)):
        if not name.endswith(suffix) or name.startswith("_"):
            continue
        if name in ingested:
            continue
        lo, hi, rows = _file_footer_meta(os.path.join(directory, name))
        if hi <= resume_lsn:
            continue  # provably committed everywhere — metadata-level skip
        ranged.append((lo, name, hi, rows))
    ranged.sort()
    if with_meta:
        return [(name, hi, rows) for _, name, hi, rows in ranged]
    return [name for _, name, _, _ in ranged]


def tail_directory(pipe, directory: str, files_per_batch: int = 16,
                   suffix: str = ".parquet", delta: bool = False,
                   compact_every: int = 8,
                   commit_offset: int = 0,
                   commit_retries: int = 8,
                   exchange="dataset") -> "list[dict]":
    """Apply every pending file in ``directory`` to ``pipe``
    (:class:`~embulk_filter_timestamp_format_ray.pipelines.cdc.CDCPipeline`),
    in lsn order.  Returns per-commit stats.  Idempotent: rerunning on an
    unchanged directory applies nothing (and reads only footers).

    ``delta=True`` is the steady-state mode for small frequent
    micro-batches: each commit is a merge-on-read DELTA (write cost ∝ the
    micro-batch, not ∝ lake state — measured 4.9–14.9× per commit, see
    BASELINE.md) and every ``compact_every`` commits the accumulated
    backlog is folded back into base files, bounding read amplification.
    A trailing partial backlog stays pending — any read folds it, and the
    next tail (or ``compact_deltas``) picks it up."""
    import ray.data

    stats = []
    resume = pipe.resume_lsn()
    ingested = _read_sidecar(pipe.lake_dir)
    todo = pending_files(directory, resume, ingested, suffix=suffix,
                         with_meta=True)
    if not todo:
        return stats
    logger.info("tailing %d pending file(s) from %s", len(todo), directory)
    apply = pipe.apply_delta if delta else pipe.apply
    for i in range(0, len(todo), files_per_batch):
        batch = todo[i:i + files_per_batch]
        paths = [os.path.join(directory, name) for name, _, _ in batch]
        # explicit block sizing from the footer row counts pending_files
        # already read: Ray's default parallelism heuristic on a single
        # small binlog file yields a degenerate block layout that
        # serializes the pre-shuffle stages — measured 8.1 s vs 0.54 s for
        # the same 100k-event commit.  ~16k rows per block keeps every
        # core busy without per-block overhead dominating.
        rows = sum(r for _, _, r in batch)
        nb = max(2, min(64, rows // 16_000 + 1))
        # commit_retries > the apply default: an active-active tailer
        # fleet races both micro-batch commits AND compaction commits, so
        # a daemon needs a deeper OCC retry budget than a one-shot job
        # (each retry re-reads the manifest and re-prunes, so persistence
        # is safe — see stress_occ.py for the cross-process proof)
        # exchange passes through: "dataset" (default), "actor", or a
        # persistent ActorExchange pool reused across every commit of a
        # follow loop (the caller owns its lifetime)
        stats.append(apply(
            ray.data.read_parquet(paths, override_num_blocks=nb),
            max_commit_retries=commit_retries, exchange=exchange))
        for name, hi, _ in batch:
            ingested[name] = hi
        resume = pipe.resume_lsn()
        _write_sidecar(pipe.lake_dir, ingested, resume)
        # commit_offset carries the cadence across calls (follow_directory
        # polls repeatedly; without it a poll landing < compact_every
        # commits would never compact and the backlog would grow unbounded)
        if delta and compact_every and \
                (commit_offset + len(stats)) % compact_every == 0:
            from embulk_filter_timestamp_format_ray.state.manifest import (
                CommitConflict,
            )

            try:
                pipe.compact_deltas()
            except CommitConflict:
                # active-active tailers: a concurrent writer advanced the
                # manifest past the compaction's retry budget.  Skipping a
                # compaction is ALWAYS safe (it only re-bounds read
                # amplification; the next cadence or any base merge folds
                # the backlog), so the tail keeps flowing.
                logger.warning("compaction lost a commit race; backlog "
                               "carries to the next cadence")
    return stats


def follow_directory(pipe, directory: str, poll_interval: float = 2.0,
                     idle_polls: int = 3, on_commit=None,
                     **tail_kwargs) -> "list[dict]":
    """Continuous tail (daemon mode): poll ``directory`` and apply new
    binlog files as they land, until ``idle_polls`` consecutive polls find
    nothing pending (``idle_polls=0`` = run forever — the production
    setting; a finite count gives tests and demos a clean exit).

    Each poll is one :func:`tail_directory` pass, so all of its guarantees
    carry over unchanged: footer-stats pruning, sidecar tail bookkeeping,
    exactly-once commits, the delta/compaction cadence.  A crash at ANY
    point degrades to a fresh ``follow_directory`` start — the poll loop
    holds no state of its own.

    ``on_commit(stats_list)`` (optional) fires after every non-empty poll —
    the seam for metrics export or a downstream ``sync_changes`` cadence.
    """
    import time as _time

    all_stats: "list[dict]" = []
    idle = 0
    while True:
        stats = tail_directory(pipe, directory,
                               commit_offset=len(all_stats), **tail_kwargs)
        if stats:
            idle = 0
            all_stats.extend(stats)
            if on_commit is not None:
                on_commit(stats)
        else:
            idle += 1
            if idle_polls and idle >= idle_polls:
                return all_stats
        _time.sleep(poll_interval if not stats else 0.0)
