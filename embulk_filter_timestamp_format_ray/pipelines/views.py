"""Incrementally-maintained materialized views over a versioned CDC lake.

The lake manifest names each partition's current data file; that path
changes whenever a transaction rewrites the partition, so it doubles as a
partition VERSION.  ``IncrementalView.refresh()`` compares the committed
lake manifest against the view's own manifest and recomputes ONLY the
partitions whose source path changed — on a 100-TB lake where a micro-batch
touches a handful of partitions, a view refresh reads a handful of files,
not the lake.

Shape: the stale (pid, path) list fans out through ``map_batches`` (one
task per stale partition reads its parquet, runs the aggregate callable,
writes the view part); the driver sees one status row per partition and
commits the view manifest atomically (same sidecar-rename commit as the
lake, ``state/manifest.py`` — reference analog: none; this is the
materialized-view layer a streaming engine pairs with exactly-once sinks).

The stored parts are PARTIAL aggregates: the default lake layout shuffles
by hash(conv_id, turn_idx), so one conversation's rows span partitions —
each view part holds that partition's contribution, and ``read()`` folds
the parts with the view's associative merge spec (sum of counts, max of
maxes): the classic partial/combine split applied to materialized views.
Refresh cost therefore stays proportional to TOUCHED partitions under any
partition layout."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from embulk_filter_timestamp_format_ray.state import manifest as mf

VIEW_MANIFEST = "view_manifest.json"


def _read_view_manifest(view_dir: str) -> dict:
    path = os.path.join(view_dir, VIEW_MANIFEST)
    if not os.path.exists(path):
        return {"version": 0, "partitions": {}}
    with open(path) as f:
        return json.load(f)


def _commit_view_manifest(view_dir: str, m: dict) -> None:
    os.makedirs(view_dir, exist_ok=True)
    path = os.path.join(view_dir, VIEW_MANIFEST)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def conversation_stats_agg(part: pa.Table) -> pa.Table:
    """Default view aggregate: per-conversation turn count + max lsn."""
    gb = part.select(["conv_id", "lsn"]).group_by(["conv_id"])
    out = gb.aggregate([("lsn", "count"), ("lsn", "max")])
    return out.rename_columns(["conv_id", "n_turns", "max_lsn"]) \
        .select(["conv_id", "n_turns", "max_lsn"])


class IncrementalView:
    """A named per-partition aggregate over a CDC lake, refreshed
    incrementally.  ``agg_fn``: pa.Table (one partition's live rows) →
    pa.Table (that partition's PARTIAL view rows); ``merge_keys`` /
    ``merge_spec`` (grouped_aggregate form) fold the partials at read
    time and must be associative with ``agg_fn``'s outputs."""

    def __init__(self, lake_dir: str, view_dir: str,
                 agg_fn=conversation_stats_agg,
                 merge_keys=("conv_id",),
                 merge_spec=None,
                 empty_table: "pa.Table | None" = None):
        self.lake_dir = lake_dir
        self.view_dir = view_dir
        self.agg_fn = agg_fn
        self.merge_keys = list(merge_keys)
        # merge_spec="disjoint": the partials partition the key space (a
        # key lives in exactly one lake partition — e.g. conv_id on an
        # unsalted conv-mode lake), so read() concatenates instead of
        # folding; agg_fn's output per partition IS final
        self.merge_spec = merge_spec if merge_spec is not None else {
            "n_turns": ("n_turns", "sum"), "max_lsn": ("max_lsn", "max")}
        self.empty_table = empty_table

    def refresh(self) -> dict:
        """Bring the view up to the lake's committed state.  Returns
        ``{"recomputed": n, "cached": m, "dropped": d}``."""
        import ray
        import ray.data

        lake_m = mf.read_manifest(self.lake_dir)
        view_m = _read_view_manifest(self.view_dir)
        os.makedirs(self.view_dir, exist_ok=True)
        stale, fresh_parts = [], {}
        for pid, part in lake_m["partitions"].items():
            base = part.get("path") or ""
            deltas = [d["path"] for d in part.get("deltas", [])]
            dvs = [d["path"] for d in part.get("dvs", [])]
            if not base and not deltas:
                continue
            # partition version = base path + ordered pending delta paths +
            # ordered dv paths: a delta commit (apply_delta) or a dv delete
            # (delete_where mode='dv') changes live state WITHOUT touching
            # the base path, so the base path alone under-detects staleness
            # on a merge-on-read lake
            src = "|".join([base, *deltas, *dvs])
            prev = view_m["partitions"].get(pid)
            if prev and prev["src_path"] == src \
                    and os.path.exists(os.path.join(self.view_dir,
                                                    prev["view_path"])):
                fresh_parts[pid] = prev
            else:
                stale.append({"pid": pid, "src": src,
                              "base": base, "deltas": deltas, "dvs": dvs})
        # dropped = partitions that left the LAKE, not ones merely rewritten
        dropped = sum(1 for pid in view_m["partitions"]
                      if pid not in lake_m["partitions"])

        if stale:
            lake_dir, view_dir, agg_fn = \
                self.lake_dir, self.view_dir, self.agg_fn

            def recompute(batch: pa.Table) -> pa.Table:
                from embulk_filter_timestamp_format_ray.pipelines.cdc import (
                    fold_partition_state,
                )

                rows = []
                for item in batch.to_pylist():  # metadata-tier (≤P rows)
                    pid, src = item["pid"], item["src"]
                    base = pq.read_table(
                        os.path.join(lake_dir, item["base"])) \
                        if item["base"] else None
                    if item["deltas"] or item["dvs"]:
                        pend = [pq.read_table(os.path.join(lake_dir, d))
                                for d in item["deltas"]]
                        dvs = [pq.read_table(os.path.join(lake_dir, d))
                               for d in item["dvs"]]
                        part = fold_partition_state(base, pend, dvs=dvs)
                    else:
                        part = base
                    view = agg_fn(part)
                    import zlib  # deterministic name (repo rule: no hash())

                    vname = f"view_p{pid}_" \
                            f"{zlib.crc32(src.encode()):08x}.parquet"
                    pq.write_table(view, os.path.join(view_dir, vname))
                    rows.append((pid, src, vname))
                return pa.table({
                    "pid": pa.array([r[0] for r in rows], pa.string()),
                    "src": pa.array([r[1] for r in rows], pa.string()),
                    "view_path": pa.array([r[2] for r in rows],
                                          pa.string()),
                })

            # explicit schema: from_items would infer list<null> for blocks
            # whose delta/dv lists are all empty and the concat then warns
            stale_tbl = pa.Table.from_pylist(stale, schema=pa.schema([
                ("pid", pa.string()), ("src", pa.string()),
                ("base", pa.string()),
                ("deltas", pa.list_(pa.string())),
                ("dvs", pa.list_(pa.string()))]))
            status = ray.data.from_arrow(
                [stale_tbl.slice(i, 1) for i in range(stale_tbl.num_rows)]) \
                .map_batches(recompute, batch_size=1,
                             batch_format="pyarrow").take_all()
            for row in status:  # ≤ num_partitions rows
                fresh_parts[row["pid"]] = {"src_path": row["src"],
                                           "view_path": row["view_path"]}

        new_m = {"version": view_m["version"] + 1, "partitions": fresh_parts}
        _commit_view_manifest(self.view_dir, new_m)
        # GC superseded view files (best-effort; crash leaves orphans only)
        live = {p["view_path"] for p in fresh_parts.values()}
        for f in os.listdir(self.view_dir):
            if f.startswith("view_p") and f.endswith(".parquet") \
                    and f not in live:
                try:
                    os.remove(os.path.join(self.view_dir, f))
                except OSError:
                    pass
        return {"recomputed": len(stale),
                "cached": len(fresh_parts) - len(stale),
                "dropped": max(dropped, 0)}

    def read(self):
        """The committed view as a streaming Dataset (partials folded)."""
        import ray.data

        from embulk_filter_timestamp_format_ray.stages.relational import (
            grouped_aggregate,
        )

        view_m = _read_view_manifest(self.view_dir)
        files = [os.path.join(self.view_dir, p["view_path"])
                 for p in view_m["partitions"].values()]
        if not files:
            if self.empty_table is not None:
                return ray.data.from_arrow(self.empty_table)
            return ray.data.from_arrow(pa.table({
                **{k: pa.array([], pa.string()) for k in self.merge_keys},
                **{out: pa.array([], pa.int64())
                   for out in (self.merge_spec if self.merge_spec
                               != "disjoint" else ())}}))
        parts = ray.data.read_parquet(files)
        if self.merge_spec == "disjoint":
            return parts
        return grouped_aggregate(parts, self.merge_keys, self.merge_spec)


def transcript_assembly_agg(part: pa.Table) -> pa.Table:
    """Per-partition transcript assembly for :func:`transcript_view`: on an
    unsalted conv-mode lake a conversation's turns are partition-local, so
    each partition's assembled docs are FINAL (disjoint view rows)."""
    from embulk_filter_timestamp_format_ray.pipelines.transcripts import (
        assemble_table,
    )

    return assemble_table(part.select(["conv_id", "turn_idx", "role",
                                       "text"]))


class TranscriptView(IncrementalView):
    """Incrementally-maintained transcript materialization: the CDC lake's
    conversations as assembled documents (conv_id, n_turns, transcript),
    refreshed at delta cost — a micro-batch that touches k partitions
    re-assembles k partitions' conversations, not the corpus.  This is the
    lake→training-corpus bridge kept continuously fresh.

    Requires an unsalted CONV-mode lake (the layout that makes a
    conversation partition-local); anything else is refused at refresh
    time, because a conversation split across partitions would assemble
    as two half documents.  For turn-mode/salted lakes use
    ``transcripts.assemble_conversations`` (one key-shard shuffle)."""

    def refresh(self) -> dict:
        cfg = mf.read_manifest(self.lake_dir).get("partition_config")
        if cfg is not None and (cfg.get("partition_mode") != "conv"
                                or cfg.get("salt_keys")):
            raise ValueError(
                "transcript_view needs an unsalted conv-mode lake (a "
                "conversation must be partition-local); this lake's "
                f"layout is {cfg!r}.  Assemble via "
                "transcripts.assemble_conversations instead.")
        return super().refresh()


def transcript_view(lake_dir: str, view_dir: str) -> "TranscriptView":
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "n_turns": pa.array([], pa.int64()),
                      "transcript": pa.array([], pa.string())})
    return TranscriptView(lake_dir, view_dir,
                          agg_fn=transcript_assembly_agg,
                          merge_keys=("conv_id",),
                          merge_spec="disjoint",
                          empty_table=empty)
