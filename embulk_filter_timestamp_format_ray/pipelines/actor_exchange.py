"""EXPERIMENTAL: raw-actor partition exchange for the CDC merge.

The Dataset-native path (`groupby("_pid").map_groups`) pays Ray Data's
sort-based shuffle: sample → map-side sort → reduce merge.  Since the merge
only needs *bucketing* by an int32 partition id (not ordering), a direct
exchange can skip the sort machinery: P partition-buffer ACTORS each own a
slice of partition ids; upstream `map_batches` tasks split each block by pid
and push sub-tables to their owners (object-store transfers); a finalize
round merges + writes per partition with the same watermark/manifest
protocol.

This is the "(c) raw Ray tasks/actors as a last resort" tier from the build
brief, kept OFF the default path.  Partitioning assumption: pid is computed
upstream by PartitionStage (hash of the merge key), so any row of a key
lands at exactly one owner.

Measured A/B on this box lives in BASELINE.md; the Dataset path remains the
default (lineage-based retries come for free there, while actor buffers are
lost on actor death — a crashed exchange must be re-run from the source,
though exactly-once is still preserved by the manifest protocol).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    DLQ_PID,
    MergeApplier,
    _count_fresh_deletes,
    cluster_spec_of,
    text_index_of,
    extras_schema_b64,
    fold_partition_state,
    make_partition_router,
    merge_partition_table,
    merge_schema_entries,
    write_base_file,
    write_dlq_table,
)


@ray.remote
class PartitionBufferActor:
    """Owns a slice of partition ids; buffers pushed deltas and
    merges+writes on finalize.

    PERSISTENT across commits: all per-transaction state (txn id, the
    manifest's partition metadata, base-vs-delta mode) arrives as
    ``finalize`` arguments, so one actor pool serves every micro-batch of a
    tail loop — the per-commit actor spawn cost that made the ephemeral
    exchange lose its measured 1.6× win is paid once."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.buffers: dict[int, list[pa.Table]] = {}

    def add(self, pid: int, table: pa.Table) -> None:
        self.buffers.setdefault(pid, []).append(table)

    def add_many(self, tables: "dict[int, pa.Table]") -> None:
        for pid, table in tables.items():
            self.buffers.setdefault(pid, []).append(table)

    def finalize(self, txn_id: str, partition_meta: dict,
                 delta_mode: bool = False,
                 cluster_by=None,
                 text_index=None) -> "list[dict]":
        self.txn_id = txn_id
        self.partition_meta = partition_meta
        if delta_mode:
            # merge-on-read DELTA commit: never read or rewrite base state —
            # write only the micro-batch's per-key winners (the same core
            # as the dataset exchange's DeltaWriter)
            from embulk_filter_timestamp_format_ray.pipelines.cdc import (
                write_delta_file,
            )

            rows = []
            for pid, parts in sorted(self.buffers.items()):
                delta = pa.concat_tables(parts, promote_options="permissive")
                if pid == DLQ_PID:
                    # reserved dead-letter lane: quarantine, never merge
                    rows.append(write_dlq_table(self.lake_dir, self.txn_id,
                                                delta))
                    continue
                meta = self.partition_meta.get(pid, {})
                r = write_delta_file(self.lake_dir, self.txn_id, pid,
                                     meta.get("last_applied_lsn", -1), delta)
                if r is not None:
                    rows.append(r)
            self.buffers.clear()
            return rows
        rows = []
        for pid, parts in sorted(self.buffers.items()):
            delta = pa.concat_tables(parts, promote_options="permissive")
            if pid == DLQ_PID:
                rows.append(write_dlq_table(self.lake_dir, self.txn_id,
                                            delta))
                continue
            meta = self.partition_meta.get(pid, {})
            watermark = meta.get("last_applied_lsn", -1)
            prior = None
            if meta.get("path"):
                prior = pq.read_table(os.path.join(self.lake_dir, meta["path"]))
            if meta.get("deltas") or meta.get("dvs"):
                # fold pending merge-on-read delta files AND deletion
                # vectors into the prior state first — this base merge
                # clears the partition's delta and dv lists at commit, so
                # dropping them here would lose committed rows / resurrect
                # dv-deleted ones
                pend = [pq.read_table(os.path.join(self.lake_dir, d["path"]))
                        for d in meta.get("deltas", [])]
                dvs = [pq.read_table(os.path.join(self.lake_dir, d["path"]))
                       for d in meta.get("dvs", [])]
                prior = fold_partition_state(prior, pend, dvs=dvs)
            state, new_wm, applied = merge_partition_table(delta, prior, watermark)
            rel = os.path.join(f"txn-{self.txn_id}", f"part-{pid:05d}.parquet")
            full = os.path.join(self.lake_dir, rel)
            state = write_base_file(state, full, cluster_by,
                                    token_col=text_index)
            rows.append({
                "pid": pid, "path": rel, "rows": state.num_rows,
                "last_applied_lsn": new_wm, "events_applied": applied,
                "events_seen": delta.num_rows,
                "deletes_seen": _count_fresh_deletes(delta, watermark),
                "schema_ipc": extras_schema_b64(state),
            })
        self.buffers.clear()
        return rows


class ActorExchange:
    """Push-based exchange: split blocks by pid inside map_batches, route
    sub-tables to owner actors, finalize after the upstream drains.

    The pool is created ONCE and reusable: construct per lake, then run any
    number of push→finalize cycles (one per commit).  Hold one instance for
    a tail loop's lifetime and pass it to ``CDCPipeline.apply`` /
    ``apply_delta`` as the ``exchange`` argument."""

    def __init__(self, lake_dir: str, num_partitions: int,
                 num_actors: int = 8):
        self.lake_dir = lake_dir
        self.num_partitions = num_partitions
        self.num_actors = min(num_actors, num_partitions)
        self.actors = [PartitionBufferActor.remote(lake_dir)
                       for _ in range(self.num_actors)]

    def push_stage(self):
        actors = self.actors
        n_actors = self.num_actors

        def push(batch: pa.Table) -> pa.Table:
            import numpy as np

            # single-pass split: sort by pid once, slice contiguous runs
            pids = np.asarray(batch.column("_pid"))
            order = np.argsort(pids, kind="stable")
            sorted_tbl = batch.take(pa.array(order)).drop_columns(["_pid"])
            sorted_pids = pids[order]
            bounds = np.flatnonzero(np.diff(sorted_pids)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(sorted_pids)]])
            per_owner: list[dict[int, pa.Table]] = [dict() for _ in range(n_actors)]
            for s, e in zip(starts, ends):
                pid = int(sorted_pids[s])
                per_owner[pid % n_actors][pid] = sorted_tbl.slice(s, e - s)
            refs = [actors[a].add_many.remote(tables)
                    for a, tables in enumerate(per_owner) if tables]
            ray.get(refs)  # backpressure: block until the owners accepted
            return pa.table({"pushed": pa.array([batch.num_rows], pa.int64())})

        return push

    def finalize(self, txn_id: str, partition_meta: dict,
                 delta_mode: bool = False,
                 cluster_by=None,
                 text_index=None) -> "list[dict]":
        out = []
        for rows in ray.get([
                a.finalize.remote(txn_id, {
                    pid: m for pid, m in partition_meta.items()
                    if pid % self.num_actors == i
                }, delta_mode=delta_mode, cluster_by=cluster_by,
                   text_index=text_index)
                for i, a in enumerate(self.actors)]):
            out.extend(rows)
        return out

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []


def apply_with_actor_exchange(pipeline, events_ds, delta: bool = False,
                              exchange: "ActorExchange | None" = None) -> dict:
    """CDCPipeline.apply variant using the actor exchange (experimental).
    ``delta=True`` commits merge-on-read delta files instead of base merges
    (CDCPipeline.apply_delta's cost model, minus the sort shuffle).
    ``exchange`` reuses a persistent pool across commits (a tail loop's
    steady state); None spawns an ephemeral pool for this commit only."""
    import uuid

    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        NormalizeStage,
        PreMergeCombiner,
    )
    from embulk_filter_timestamp_format_ray.stages.partition import PartitionStage
    from embulk_filter_timestamp_format_ray.state import manifest as mf

    manifest = mf.read_manifest(pipeline.lake_dir)
    pipeline.check_manifest_compat(manifest)
    low = mf.min_watermark(manifest, pipeline.num_partitions)
    txn_id = uuid.uuid4().hex[:12]
    partition_meta = {int(p): m for p, m in manifest["partitions"].items()}
    if exchange is None:
        exchange = ActorExchange(pipeline.lake_dir, pipeline.num_partitions)
    elif (exchange.lake_dir != pipeline.lake_dir
          or exchange.num_partitions != pipeline.num_partitions):
        raise ValueError(
            f"persistent exchange is bound to {exchange.lake_dir!r} "
            f"(P={exchange.num_partitions}); this pipeline is "
            f"{pipeline.lake_dir!r} (P={pipeline.num_partitions})")

    # same expectation tiers as the dataset exchange, dlq included: tagged
    # rows route to the reserved dead-letter pid and the owning actor
    # quarantines them instead of merging
    constraints = pipeline.effective_constraints(manifest)
    ds = events_ds.map_batches(
        NormalizeStage(pipeline.epoch_specs, low_watermark=low,
                       stop_on_invalid=pipeline.stop_on_invalid,
                       dlq=pipeline.dlq, constraints=constraints),
        batch_format="pyarrow", zero_copy_batch=True)
    # Must route identically to CDCPipeline.apply: same mode + salting, or a
    # second apply on a conv-mode lake sends keys to fresh pids and prior
    # state is never superseded.
    partition = PartitionStage(pipeline.num_partitions,
                               by_turn=(pipeline.partition_mode == "turn"),
                               salt_keys=pipeline.salt_keys,
                               salt_factor=pipeline.salt_factor)
    ds = ds.map_batches(make_partition_router(partition, pipeline.dlq),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(PreMergeCombiner(), batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(exchange.push_stage(), batch_format="pyarrow")
    ds.count()  # drain the push stage
    rows = exchange.finalize(txn_id, partition_meta, delta_mode=delta,
                             cluster_by=cluster_spec_of(manifest),
                             text_index=text_index_of(manifest))
    pipeline._check_delete_guard(rows)

    partitions = dict(manifest["partitions"])
    # quarantine bookkeeping mirrors CDCPipeline._apply_dataset: normal
    # applies APPEND to the committed dlq entry list
    dlq_entries = list(manifest.get("dlq", []))
    total_applied = quarantined = 0
    for r in rows:
        if int(r["pid"]) == DLQ_PID:
            quarantined = int(r["rows"])
            dlq_entries.append({"txn": txn_id, "path": r["path"],
                                "rows": quarantined})
            continue
        pid = str(r["pid"])
        prev = partitions.get(pid, {})
        lineage = list(prev.get("lineage", []))
        lineage.append({"txn": txn_id, "events_applied": int(r["events_applied"])})
        if delta:
            # merge-on-read commit: base untouched, delta file appended
            # (same bookkeeping as CDCPipeline._apply_dataset's delta
            # branch); pending deletion vectors carry
            deltas = list(prev.get("deltas", []))
            deltas.append({"txn": txn_id, "path": r["path"],
                           "rows": int(r["rows"])})
            partitions[pid] = {
                "path": prev.get("path"), "rows": int(prev.get("rows", 0)),
                "last_applied_lsn": int(r["last_applied_lsn"]),
                "lineage": lineage[-16:],
                "deltas": deltas,
                **({"dvs": prev["dvs"]} if prev.get("dvs") else {}),
            }
        else:
            partitions[pid] = {
                "path": r["path"], "rows": int(r["rows"]),
                "last_applied_lsn": int(r["last_applied_lsn"]),
                "lineage": lineage[-16:],
            }
        total_applied += int(r["events_applied"])
    new_manifest = {
        "version": manifest["version"] + 1,
        "partitions": partitions,
        "num_partitions": pipeline.num_partitions,
        "partition_config": pipeline.partition_config(),
        "last_txn": txn_id,
        **merge_schema_entries(manifest, [
            r.get("schema_ipc") or "" for r in rows
            if int(r["pid"]) != DLQ_PID]),
    }
    if dlq_entries:
        new_manifest["dlq"] = dlq_entries
    if constraints:
        # expectations are durable lake properties (see CDCPipeline.
        # _apply_dataset): record the enforced set on every commit
        new_manifest["constraints"] = [c.to_json() for c in constraints]
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        carry_cluster_by,
        carry_lsn_ceiling,
    )

    carry_lsn_ceiling(manifest, new_manifest)
    carry_cluster_by(manifest, new_manifest)
    mf.commit_manifest(pipeline.lake_dir, new_manifest,
                       retain_history=pipeline.time_travel_retain,
                       expected_version=manifest["version"])
    if pipeline.auto_gc:
        mf.gc_orphan_txns(pipeline.lake_dir, keep_txns={txn_id})
    return {"txn": txn_id, "version": new_manifest["version"],
            "partitions_touched": len(rows) - (1 if quarantined else 0),
            "events_applied": total_applied,
            "events_quarantined": quarantined}
