"""The CDC / incremental-ingest pipeline (north_rule hot path).

    binlog events ──► NormalizeStage ──► PartitionStage ──► groupby(_pid)
                     (ts re-parse per     (hash merge key)    .map_groups(merge)
                      schema epoch,                               │
                      role renames,                    staged parquet per pid
                      envelope checks,                            │
                      low-watermark prune)          driver: atomic manifest swap

Stage roles map to SURVEY.md §2.8; the ts normalization inside
``NormalizeStage`` is the reference competency (per-column timestamp
re-parse across evolving source formats) applied per schema epoch using the
same vectorized kernels as ``TimestampFormatStage``.

Merge semantics (per partition, fully vectorized):
* drop events with ``lsn <= last_applied_lsn`` (idempotent replay dedup —
  the exactly-once guarantee under at-least-once task execution)
* concat with prior partition state (Arrow schema unification handles
  evolution: missing columns null-filled, e.g. the epoch-0 ``tool`` column)
* keep the max-LSN row per (conv_id, turn_idx); a ``delete`` op as the
  winner removes the row (delete-wins tombstone)
* rows keep their originating ``lsn`` — per-row lineage in the lake

The merge runs inside ``groupby("_pid").map_groups`` so Ray Data's hash
shuffle moves each partition's delta to one task; prior state is read from
the partition's parquet file on the worker (never on the driver).  Only the
tiny per-partition manifest rows return to the driver, which performs the
write-then-manifest-swap commit (state/manifest.py).
"""

from __future__ import annotations

import base64
import dataclasses
import json
import logging
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from embulk_filter_timestamp_format_ray.config import ColumnConfig, TaskConfig
from embulk_filter_timestamp_format_ray.functions.casts import CastError
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    carry_constraints,
    constraints_from_manifest,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    EPOCH1_FORMAT,
    EPOCH2_FORMAT,
    EPOCH2_TZ,
    ROLE_RENAMES_EPOCH2,
    splitmix64,
)
from embulk_filter_timestamp_format_ray.stages.partition import PartitionStage
from embulk_filter_timestamp_format_ray.stages.timestamp_format import ColumnKernel
from embulk_filter_timestamp_format_ray.state import manifest as mf

logger = logging.getLogger(__name__)

_TS_NS_UTC = pa.timestamp("ns", tz="UTC")

#: default epoch → ts_raw interpretation (FIXTURES.md F2); each entry is a
#: full per-column cast config exercising a different reference parser family
DEFAULT_EPOCH_SPECS: "dict[int, ColumnConfig]" = {
    # epoch millis — %Q for digit strings; from_unit=ms covers sources whose
    # evolved schema carries ts_raw as a raw int64 column instead
    0: ColumnConfig("ts_raw", "timestamp", from_format=("%Q",), from_unit="ms"),
    1: ColumnConfig("ts_raw", "timestamp", from_format=(EPOCH1_FORMAT,),
                    from_timezone="UTC"),
    2: ColumnConfig("ts_raw", "timestamp", from_format=(EPOCH2_FORMAT,),
                    from_timezone=EPOCH2_TZ),
}

MERGE_KEY = ("conv_id", "turn_idx")
VALID_OPS = ("upsert", "delete", "patch", "delete_conv")

#: wire/op-code order — index = int8 code used by the combiner's wire
#: encoding and by the fold kernels (0 upsert, 1 delete, 2 patch,
#: 3 delete_conv)
_OP_NAMES = pa.array(["upsert", "delete", "patch", "delete_conv"],
                     pa.string())
PATCH_OP = "patch"
CONV_DELETE_OP = "delete_conv"

#: merge-key turn_idx of a conversation tombstone row (real turns are
#: >= 0); NormalizeStage forces it so every replica of a tombstone folds
#: under one per-conv key
CONV_TOMBSTONE_TURN = -1

#: reserved partition id for the dead-letter route (never produced by
#: PartitionStage, whose pids are uint64 % num_partitions ≥ 0)
DLQ_PID = -1

#: dlq_reason code → string (code 0 = clean → NULL reason)
_DLQ_REASONS = pa.array([None, "invalid_envelope", "unknown_epoch",
                         "unparseable_ts"], pa.string())


class NormalizeStage:
    """map_batches callable: envelope validation + role-enum unification +
    per-epoch ts normalization → ``ts: timestamp[ns, UTC]`` column.

    Error policy tiers (the reference's C10 warn-NULL/abort surface,
    SURVEY.md §2.2, extended one step): ``stop_on_invalid=True`` aborts the
    batch; default drops invalid envelopes with a warning and NULLs
    unparseable ts (reference parity); ``dlq=True`` instead TAGS every bad
    row with a ``dlq_reason`` (invalid_envelope / unknown_epoch /
    unparseable_ts) so the pipeline can quarantine it — including events
    from a schema epoch that has no configured spec yet, the operational
    case that would otherwise abort the whole stream.

    ``constraints`` (pipelines/constraints.py) run POST-normalization —
    after role renames and ts parsing — under the same three tiers:
    abort / drop-with-warning / quarantine with ``constraint:<name>``."""

    def __init__(self, epoch_specs: "dict[int, ColumnConfig] | None" = None,
                 role_renames: "dict[str, str] | None" = None,
                 low_watermark: int = -1,
                 stop_on_invalid: bool = False,
                 dlq: bool = False,
                 constraints: "tuple" = ()):
        if dlq and stop_on_invalid:
            raise ValueError("dlq and stop_on_invalid are contradictory "
                             "error policies")
        self.epoch_specs = epoch_specs or DEFAULT_EPOCH_SPECS
        self.role_renames = role_renames if role_renames is not None else {
            v: k for k, v in ROLE_RENAMES_EPOCH2.items()
        }
        self.low_watermark = low_watermark
        self.stop_on_invalid = stop_on_invalid
        self.dlq = dlq
        self.constraints = tuple(constraints or ())
        if len(self.constraints) > 120:
            raise ValueError("at most 120 constraints (int8 reason codes)")
        # dlq reason codes: 0 clean, 1-3 fixed tiers, 4+i constraint i
        self._reasons = pa.array(
            [None, "invalid_envelope", "unknown_epoch", "unparseable_ts",
             *(f"constraint:{c.name}" for c in self.constraints)],
            pa.string())
        self._kernels: "dict[int, ColumnKernel] | None" = None

    def _kernel(self, epoch: int) -> ColumnKernel:
        if self._kernels is None:
            self._kernels = {}
        k = self._kernels.get(epoch)
        if k is None:
            cfg = self.epoch_specs.get(epoch)
            if cfg is None:
                raise CastError(f"no ts_raw spec for schema epoch {epoch}")
            task = TaskConfig(columns=(cfg,), stop_on_invalid_record=self.stop_on_invalid)
            k = ColumnKernel(task, cfg)
            self._kernels[epoch] = k
        return k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # ---- low-watermark prune (early, before the shuffle); in dlq mode a
        # NULL lsn must survive the prune to be quarantined, not vanish
        if self.low_watermark >= 0:
            keep = pc.greater(batch.column("lsn"), self.low_watermark)
            batch = batch.filter(pc.fill_null(keep, self.dlq))
        if batch.num_rows == 0:
            return self._empty_out(batch)
        # ---- envelope validation
        op_valid = pc.is_in(batch.column("op"), value_set=pa.array(VALID_OPS))
        env_valid = pc.and_(
            pc.and_(op_valid, pc.is_valid(batch.column("conv_id"))),
            pc.and_(pc.greater_equal(batch.column("lsn"), 0),
                    pc.is_valid(batch.column("schema_epoch"))),
        )
        n_bad = batch.num_rows - pc.sum(pc.cast(env_valid, pa.int64())).as_py()
        codes = np.zeros(batch.num_rows, dtype=np.int8)
        if n_bad:
            if self.stop_on_invalid:
                raise CastError(f"{n_bad} invalid change-event envelopes")
            if self.dlq:
                codes[~np.asarray(pc.fill_null(env_valid, False))] = 1
            else:
                logger.warning("dropping %d invalid change-event envelopes",
                               n_bad)
                batch = batch.filter(env_valid)
                codes = np.zeros(batch.num_rows, dtype=np.int8)
        # ---- role-enum rename (schema evolution)
        role = batch.column("role")
        if self.role_renames:
            combined = role.combine_chunks() if isinstance(role, pa.ChunkedArray) else role
            enc = pc.dictionary_encode(combined)
            dictionary = [self.role_renames.get(r, r) for r in enc.dictionary.to_pylist()]
            role = pc.take(pa.array(dictionary, type=pa.string()), enc.indices)
        # ---- ts normalization per epoch (the reference competency)
        # null epoch is an invalid envelope (checked above); -1 sentinel keeps
        # the numpy path total in dlq mode, where such rows survive the filter
        epochs = np.asarray(pc.fill_null(
            batch.column("schema_epoch").cast(pa.int64()), -1))
        raw = batch.column("ts_raw")
        if isinstance(raw, pa.ChunkedArray):
            raw = raw.combine_chunks()
        ns = np.zeros(batch.num_rows, dtype=np.int64)
        null_mask = np.zeros(batch.num_rows, dtype=bool)
        for epoch in np.unique(epochs):
            mask = epochs == epoch
            if self.dlq and int(epoch) not in self.epoch_specs:
                # unconfigured schema epoch: quarantine instead of abort —
                # the stream keeps flowing while the spec catches up
                null_mask |= mask
                codes[mask & (codes == 0)] = 2
                continue
            kernel = self._kernel(int(epoch))
            sub, _ = kernel.cast_array(raw.filter(pa.array(mask)))
            sub_ns = np.asarray(pc.fill_null(sub.cast(pa.int64()), 0))
            sub_null = np.asarray(pc.is_null(sub))
            idx = np.nonzero(mask)[0]
            ns[idx] = sub_ns
            null_mask[idx] = sub_null
        if self.dlq:
            # an event with NULL ts_raw whose op carries no ts payload —
            # patch ("ts unchanged"), delete, delete_conv — is NOT an
            # unparseable timestamp; exclude it from quarantine code 3
            ts_free = np.asarray(pc.fill_null(pc.and_(
                pc.is_in(batch.column("op"), value_set=pa.array(
                    [PATCH_OP, "delete", CONV_DELETE_OP])),
                pc.is_null(raw)), False))
            codes[null_mask & (codes == 0) & ~ts_free] = 3
        ts = pa.array(ns).cast(pa.timestamp("ns")).cast(_TS_NS_UTC)
        if null_mask.any():
            ts = pc.if_else(pa.array(~null_mask), ts, pa.scalar(None, _TS_NS_UTC))
        turn_col = batch.column("turn_idx").cast(pa.int32())
        # all-NULL inputs arrive null-typed (Arrow inference); pin the lake
        # types here so files never carry type-less columns
        text_col = batch.column("text")
        if pa.types.is_null(text_col.type):
            text_col = text_col.cast(pa.string())
        if pa.types.is_null(role.type):
            role = role.cast(pa.string())
        tool_col = (batch.column("tool") if "tool" in batch.schema.names
                    else pa.nulls(batch.num_rows, pa.string()))
        if pa.types.is_null(tool_col.type):
            tool_col = tool_col.cast(pa.string())
        # widen-only schema evolution: non-envelope event columns pass
        # through as evolved lake value columns (merge + manifest widen
        # downstream); reserved internal names are a config error
        extras = [c for c in batch.schema.names if c not in ENVELOPE_COLUMNS]
        bad_names = [c for c in extras if c in RESERVED_EVENT_COLUMNS]
        if bad_names:
            raise CastError(
                f"change-event column(s) {bad_names} collide with reserved "
                f"lake columns; rename them at the source")
        extra_cols = {c: batch.column(c) for c in extras}
        cd_mask = pc.fill_null(
            pc.equal(batch.column("op"), CONV_DELETE_OP), False)
        if pc.any(cd_mask).as_py():
            # conversation tombstone: conv-scoped, so the merge key's turn
            # becomes the reserved sentinel (every replica folds under one
            # per-conv key) and the value payload is dropped
            live = pc.invert(cd_mask)
            turn_col = pc.if_else(live, turn_col,
                                  pa.scalar(CONV_TOMBSTONE_TURN, pa.int32()))
            null_s = pa.scalar(None, pa.string())
            role = pc.if_else(live, role, null_s)
            text_col = pc.if_else(live, text_col, null_s)
            tool_col = pc.if_else(live, tool_col, null_s)
            ts = pc.if_else(live, ts, pa.scalar(None, _TS_NS_UTC))
            extra_cols = {
                c: pc.if_else(live, v, pa.scalar(None, v.type))
                for c, v in extra_cols.items()
            }
        cols = {
            "lsn": batch.column("lsn"),
            "op": batch.column("op"),
            "conv_id": batch.column("conv_id"),
            "turn_idx": turn_col,
            "role": role,
            "text": text_col,
            "tool": tool_col,
            "ts": ts,
            **extra_cols,
        }
        # ---- commit-time expectations (post-normalization: constraints see
        # renamed roles, parsed ts); same abort / drop / quarantine tiers
        drop_mask = None
        if self.constraints:
            ctable = pa.table(cols)
            for i, c in enumerate(self.constraints):
                viol = c.violations(ctable)
                n_v = int(viol.sum())
                if not n_v:
                    continue
                if self.stop_on_invalid:
                    raise CastError(
                        f"{n_v} change event(s) violate constraint "
                        f"{c.name} on column {c.column!r}")
                if self.dlq:
                    codes[viol & (codes == 0)] = 4 + i
                else:
                    logger.warning(
                        "dropping %d change event(s) violating "
                        "constraint %s", n_v, c.name)
                    drop_mask = viol if drop_mask is None \
                        else (drop_mask | viol)
        if self.dlq:
            code_arr = pa.array(codes)
            clean = pc.equal(code_arr, 0)
            # forensic payload: the raw source ts + schema epoch travel with
            # quarantined rows only (clean rows carry nulls ⇒ near-zero
            # exchange cost); both are what reprocess_dlq needs to re-run
            # the event under corrected epoch specs
            cols["ts_raw"] = pc.if_else(clean, pa.scalar(None, pa.string()),
                                        pc.cast(raw, pa.string()))
            epoch_col = batch.column("schema_epoch").cast(pa.int32())
            cols["schema_epoch"] = pc.if_else(
                clean, pa.scalar(None, pa.int32()), epoch_col)
            cols["dlq_reason"] = pc.take(self._reasons, code_arr)
        out = pa.table(cols)
        if drop_mask is not None:
            out = out.filter(pa.array(~drop_mask))
        return out

    def _empty_out(self, batch: pa.Table) -> pa.Table:
        cols = {
            "lsn": pa.array([], pa.int64()), "op": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()), "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()), "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], _TS_NS_UTC),
        }
        if batch is not None:
            for c in batch.schema.names:
                if c not in ENVELOPE_COLUMNS and c not in RESERVED_EVENT_COLUMNS:
                    cols[c] = pa.array([], batch.schema.field(c).type)
        if self.dlq:
            cols["ts_raw"] = pa.array([], pa.string())
            cols["schema_epoch"] = pa.array([], pa.int32())
            cols["dlq_reason"] = pa.array([], pa.string())
        return pa.table(cols)


LAKE_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]

# row-group size for every lake state/delta write: files are sorted by
# (conv_id, turn_idx), so bounded row groups keep the conv_id row-group
# statistics selective — read_conversation's predicate pushdown prunes to
# ~one group per file regardless of how large a partition grows (pyarrow's
# default 1Mi-row groups would make a 50M-row partition file prune 50x
# worse)
#: rows per parquet row group in every lake file — the zone-map pruning
#: granule (read_lake(where=...) skips row groups by footer stats, so a
#: smaller granule prunes tighter at the cost of more footer entries and
#: slightly worse compression).  Env-overridable for experiments; in the
#: local test mode Ray workers inherit the driver's environment.
LAKE_ROW_GROUP_ROWS = int(os.environ.get("GRAFT_LAKE_ROW_GROUP_ROWS",
                                         131_072))

_LAKE_FIELD_TYPES = {
    "conv_id": pa.string(), "turn_idx": pa.int32(), "role": pa.string(),
    "text": pa.string(), "tool": pa.string(), "ts": _TS_NS_UTC,
    "lsn": pa.int64(),
}


def _empty_lake_table(columns=None, types=None) -> pa.Table:
    cols = list(columns) if columns is not None else LAKE_COLUMNS
    t = types or _LAKE_FIELD_TYPES
    return pa.table({c: pa.array([], t[c]) for c in cols})


# ---------------------------------------------------------------- schema
# evolution (widen-only): change events may carry EXTRA value columns beyond
# the envelope; they flow through the same normalize → merge → commit path
# as the core columns (the fold kernels are column-agnostic) and WIDEN the
# committed lake schema.  The manifest records the evolved column list
# (``schema_columns``) plus the extras' Arrow types (``schema_extras_ipc``,
# base64 IPC so any Arrow type round-trips exactly); readers pad files that
# predate a column with NULLs.  Renames/drops are NOT supported — widening
# is the only evolution that composes with per-column LWW patch semantics
# (a dropped column's patches would silently resurrect it).

#: columns consumed by NormalizeStage as the change-event envelope — never
#: passed through as payload
ENVELOPE_COLUMNS = frozenset({"lsn", "op", "conv_id", "turn_idx", "role",
                              "text", "tool", "ts_raw", "schema_epoch"})

#: names an event's EXTRA column may never use (produced internally)
RESERVED_EVENT_COLUMNS = frozenset({"ts", "dlq_reason", "_pid", "_del",
                                    "_shard"})

#: internal / forensic columns that must never be treated as evolved lake
#: value columns when they ride along a merge table (dlq mode)
_NON_VALUE_COLUMNS = frozenset({*LAKE_COLUMNS, "op", "_pid", "_del",
                                "ts_raw", "schema_epoch", "dlq_reason"})


def extra_columns_of(names) -> "list[str]":
    """Evolved (non-core) lake value columns of a table, in appearance
    order."""
    return [n for n in names if n not in _NON_VALUE_COLUMNS]


def extras_schema_b64(tbl: pa.Table) -> str:
    """Base64 IPC serialization of a table's evolved columns' schema ("" when
    the table is core-only) — the wire format merge tasks use to report the
    columns they committed back to the driver's manifest swap."""
    fields = [tbl.schema.field(n) for n in extra_columns_of(tbl.column_names)]
    if not fields:
        return ""
    return base64.b64encode(
        pa.schema(fields).serialize().to_pybytes()).decode("ascii")


def _fields_from_b64(b64: str) -> "list[pa.Field]":
    if not b64:
        return []
    return list(pa.ipc.read_schema(pa.py_buffer(base64.b64decode(b64))))


def manifest_extra_fields(manifest: "dict") -> "list[pa.Field]":
    return _fields_from_b64(manifest.get("schema_extras_ipc") or "")


def manifest_schema_columns(manifest: "dict") -> "list[str]":
    return list(manifest.get("schema_columns") or LAKE_COLUMNS)


def _manifest_types(manifest: "dict") -> "dict[str, pa.DataType]":
    types = dict(_LAKE_FIELD_TYPES)
    types["op"] = pa.string()
    for f in manifest_extra_fields(manifest):
        types[f.name] = f.type
    return types


def schema_entries_of(manifest: "dict") -> "dict":
    """Manifest schema fields carried UNCHANGED into a rewrite commit
    (compaction: folded state's columns ⊆ the committed schema)."""
    entry = {"schema_columns": manifest_schema_columns(manifest)}
    ipc = manifest.get("schema_extras_ipc")
    if ipc:
        entry["schema_extras_ipc"] = ipc
    return entry


def merge_schema_entries(manifest: "dict", schema_ipcs) -> "dict":
    """Driver-side widen-only schema union for a commit's manifest swap:
    the prior manifest's extras keep their order; newly observed extras
    append in sorted-name order (deterministic regardless of which
    partitions reported them).  Raises on a type conflict — the same extra
    name must keep one type across the lake's lifetime."""
    committed = {f.name: f for f in manifest_extra_fields(manifest)}
    order = list(committed)
    fresh: "dict[str, pa.Field]" = {}
    for b in schema_ipcs:
        for f in _fields_from_b64(b):
            prev = committed.get(f.name) or fresh.get(f.name)
            if prev is not None and prev.type != f.type:
                # a null-typed report (all-NULL batch) is typeless, not a
                # conflict: the real type wins whichever side carries it
                if pa.types.is_null(prev.type):
                    (committed if f.name in committed else fresh)[f.name] = f
                    continue
                if pa.types.is_null(f.type):
                    continue
                raise ValueError(
                    f"schema evolution type conflict on column "
                    f"{f.name!r}: {prev.type} (committed) vs {f.type} "
                    f"(incoming); widen-only evolution requires a stable "
                    f"type per column")
            if f.name not in committed and f.name not in fresh:
                fresh[f.name] = f
    order += sorted(fresh)
    entry = {"schema_columns": LAKE_COLUMNS + order}
    fields = [committed.get(n) or fresh[n] for n in order]
    if fields:
        entry["schema_extras_ipc"] = base64.b64encode(
            pa.schema(fields).serialize().to_pybytes()).decode("ascii")
    return entry


def pad_to_schema(tbl: pa.Table, cols, types) -> pa.Table:
    """Project ``tbl`` to ``cols`` in order, appending all-NULL columns for
    the names it predates — THE widen-only read contract (a row written
    before a column existed reads that column as NULL)."""
    have = set(tbl.column_names)
    if have.issuperset(cols):
        return tbl.select(list(cols))
    return pa.table({c: (tbl.column(c) if c in have
                         else pa.nulls(tbl.num_rows, types[c]))
                     for c in cols})


def _union_extras(tables) -> "list[str]":
    """Ordered union of evolved value columns across heterogeneous-schema
    merge inputs (first appearance wins the position)."""
    seen: "list[str]" = []
    for t in tables:
        if t is None:
            continue
        for n in extra_columns_of(t.column_names):
            if n not in seen:
                seen.append(n)
    return seen


def _union_types(tables) -> "dict[str, pa.DataType]":
    types = dict(_LAKE_FIELD_TYPES)
    types["op"] = pa.string()
    for t in tables:
        if t is None:
            continue
        for n in t.column_names:
            if n not in types:
                types[n] = t.schema.field(n).type
    return types


def _dv_keep_mask(tbl: pa.Table, dvs: "list[pa.Table]") -> "np.ndarray":
    """Deletion-vector pre-filter mask (True = keep): drop every row whose
    (conv_id, turn_idx) appears in a dv key file with ``row.lsn <= the
    key's max dv lsn``.  A dv entry records the FOLDED victim row's lsn at
    delete time, so this drops exactly the run the delete folded — a later
    event (higher lsn) legitimately survives and re-inserts the key, which
    is the same contract as the rewrite-mode ``delete_where``.  Fully
    vectorized: shared dictionary over conv ids, fused (conv, turn) int64
    key, per-key max via sort+reduce, membership via searchsorted."""
    dv = pa.concat_tables(
        [d.select(["conv_id", "turn_idx", "lsn"]) for d in dvs
         if d.num_rows], promote_options="none") if dvs else None
    if dv is None or dv.num_rows == 0 or tbl.num_rows == 0:
        return np.ones(tbl.num_rows, dtype=bool)
    # one dictionary spanning both sides so indices are comparable
    both = pa.concat_arrays([
        tbl.column("conv_id").combine_chunks().cast(pa.string()),
        dv.column("conv_id").combine_chunks().cast(pa.string())])
    enc = pc.dictionary_encode(both)
    idx = np.asarray(enc.indices.cast(pa.int64()))
    conv_t, conv_d = idx[:tbl.num_rows], idx[tbl.num_rows:]
    turn_t = np.asarray(tbl.column("turn_idx").cast(pa.int64()))
    turn_d = np.asarray(dv.column("turn_idx").cast(pa.int64()))
    t_min = min(int(turn_t.min()), int(turn_d.min()))
    span = max(int(turn_t.max()), int(turn_d.max())) - t_min + 1
    fused_t = conv_t * span + (turn_t - t_min)
    fused_d = conv_d * span + (turn_d - t_min)
    lsn_d = np.asarray(dv.column("lsn").cast(pa.int64()))
    # per-dv-key max lsn: lexsort by (key, lsn), keep each run's last (dv
    # tables are delete-sized — no need for the fused-key fast path, whose
    # key*span multiply could overflow on pathological lsn ranges)
    order = np.lexsort((lsn_d, fused_d))
    k_s, l_s = fused_d[order], lsn_d[order]
    last = np.ones(len(k_s), dtype=bool)
    last[:-1] = k_s[:-1] != k_s[1:]
    keys, maxes = k_s[last], l_s[last]
    pos = np.searchsorted(keys, fused_t)
    pos_c = np.minimum(pos, len(keys) - 1)
    hit = keys[pos_c] == fused_t
    lsn_t = np.asarray(tbl.column("lsn").cast(pa.int64()))
    return ~(hit & (lsn_t <= maxes[pos_c]))


def fold_partition_state(base: "pa.Table | None", deltas: "list[pa.Table]",
                         columns=None, types=None,
                         dvs: "list[pa.Table] | None" = None) -> pa.Table:
    """Fold one partition's committed BASE state with its pending DELTA
    files into live state (the merge-on-read counterpart of a base merge):
    base rows are live upserts; delta rows carry op+lsn; max-LSN winner per
    key + delete-wins — the commit's own core (keep_last_per_key), so a
    fold and a compaction produce identical state by construction.

    ``columns`` prunes the fold to a subset of the lake schema (must
    include the merge key + lsn); callers like the change-data-feed fold
    only (conv_id, turn_idx, lsn).  With ``columns=None`` the fold spans
    the UNION of the inputs' columns — under widen-only schema evolution a
    base or delta file that predates a column reads it as NULL.

    ``dvs``: pending deletion-vector key files (conv_id, turn_idx, lsn) from
    ``delete_where(mode='dv')`` — applied as a PRE-merge filter (every input
    row at a dv key with lsn ≤ the dv lsn drops), which reproduces exactly
    the state a rewrite-mode delete would have left before folding, so
    patch/tombstone semantics and fold≡compaction bit-equality carry over
    unchanged."""
    if columns is not None:
        cols = list(columns)
    else:
        cols = [*LAKE_COLUMNS, *_union_extras([base, *deltas])]
    types = {**_union_types([base, *deltas]), **(types or {})}
    parts = []
    if base is not None and base.num_rows:
        b = pad_to_schema(base, cols, types).append_column(
            "op", pa.array(np.full(base.num_rows, "upsert")))
        parts.append(b.select(["op", *cols]))
    for d in deltas:
        if d.num_rows:
            parts.append(pad_to_schema(d, ["op", *cols], types))
    if not parts:
        return _empty_lake_table(cols, types)
    merged = pa.concat_tables(parts, promote_options="permissive")
    if dvs:
        keep = _dv_keep_mask(merged, dvs)
        if not keep.all():
            merged = merged.filter(pa.array(keep))
        if merged.num_rows == 0:
            return _empty_lake_table(cols, types)
    winners = keep_last_per_key(merged)
    # live = everything but tombstones: an all-patch key (possible only
    # when base is pruned away or the key never had a base row) is a
    # sparse upsert — unset columns read as NULL
    live = winners.filter(pc.invert(pc.is_in(
        winners.column("op"),
        value_set=pa.array(["delete", CONV_DELETE_OP]))))
    return live.select(cols)


def _merge_key_runs(tbl: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
    """Sort machinery shared by the fold kernels: returns ``(perm, last)``
    where ``perm`` orders rows by (conv_id, turn_idx, lsn) and ``last``
    marks each key-run's final (max-LSN) position in sorted coordinates.

    lexsort over integer keys (dictionary indices for conv_id) is far
    cheaper than an arrow multi-column string sort.  Fast path: fuse
    (conv, turn, lsn-lsn_min) into ONE int64 key and run a single argsort
    instead of a 3-pass lexsort (~2× on 2M-row blocks) — only when the
    fused key provably fits 62 bits; equal fused keys are exact (key, lsn)
    replays, so sort stability is irrelevant."""
    conv = np.asarray(pc.dictionary_encode(
        tbl.column("conv_id").combine_chunks()).indices.cast(pa.int64()))
    turn = np.asarray(tbl.column("turn_idx").cast(pa.int64()))
    lsn = np.asarray(tbl.column("lsn").cast(pa.int64()))
    t_min, t_max = (int(turn.min()), int(turn.max())) if len(turn) else (0, 0)
    l_min, l_max = int(lsn.min()), int(lsn.max())
    t_span = t_max - t_min + 1
    l_span = l_max - l_min + 1
    c_max = int(conv.max()) + 1
    if t_min >= 0 and c_max * t_span * l_span < (1 << 62):
        fused = (conv * t_span + turn) * l_span + (lsn - l_min)
        perm = np.argsort(fused)
        f_s = fused[perm] // l_span  # (conv, turn) part only
        last = np.ones(len(perm), dtype=bool)
        last[:-1] = f_s[:-1] != f_s[1:]
    else:
        perm = np.lexsort((lsn, turn, conv))
        c_s, t_s = conv[perm], turn[perm]
        last = np.ones(len(perm), dtype=bool)
        last[:-1] = (c_s[:-1] != c_s[1:]) | (t_s[:-1] != t_s[1:])
    return perm, last


def keep_last_per_key(tbl: pa.Table) -> pa.Table:
    """Max-LSN winner per (conv_id, turn_idx) — the associative merge core.

    Used both as the pre-shuffle combiner (map-side: shrinks the exchange to
    one row per key per block; at binlog scale most updates collapse here)
    and as the reduce-side merge. Winner selection commutes with itself, so
    combining before the shuffle cannot change the final winners.

    Partial-column updates: when the table carries ``op == 'patch'`` rows
    (a patch sets only its non-NULL value columns; NULL = unchanged), the
    fold dispatches to :func:`fold_patch_runs` — the per-column LWW
    extension of the same kernel.  Tables without patch rows (the headline
    binlog) keep the single-argsort whole-row path untouched.

    Conversation tombstones: ``op == 'delete_conv'`` rows (merge key
    (conv_id, CONV_TOMBSTONE_TURN), replicated by PartitionStage to every
    partition) erase EVERY key of their conversation with lsn below the
    tombstone's — one more max-merge horizon, so associativity is
    preserved.  The folded output keeps one tombstone row per conv (the
    delta tier persists it until a base merge/compaction materializes the
    erasure); base-state writers drop it via their live filter.

    Contract: ``lsn`` uniquely identifies event content (true for any real
    binlog); ties at equal (key, lsn) are exact replays, so either copy
    winning yields identical state."""
    if tbl.num_rows <= 1:
        return tbl
    has_cd = has_patch = False
    if "op" in tbl.schema.names:
        # ONE op-classification scan decides the dispatch (vs separate
        # equality scans per tier): max code <= 1 ⇒ the plain whole-row
        # binlog, the headline hot path
        codes = pc.index_in(tbl.column("op").combine_chunks(),
                            value_set=_OP_NAMES)
        mx = pc.max(codes).as_py()
        if mx is not None and mx >= 2:
            has_cd = mx == 3
            has_patch = pc.any(pc.equal(codes, 2)).as_py() is True
    if not has_cd:
        if has_patch:
            return fold_patch_runs(tbl)
        perm, last = _merge_key_runs(tbl)
        # NOTE: dictionary indices order != lexical conv order; callers must
        # not rely on output ordering (the verification read sorts
        # explicitly)
        return tbl.take(pa.array(perm[last]))
    cd_mask = pc.equal(tbl.column("op"), CONV_DELETE_OP)
    tomb = tbl.filter(cd_mask)
    rest = tbl.filter(pc.invert(cd_mask))
    # collapse tombstone replays/duplicates to one max-lsn row per conv key
    if tomb.num_rows > 1:
        perm_t, last_t = _merge_key_runs(tomb)
        tomb = tomb.take(pa.array(perm_t[last_t]))
    if rest.num_rows == 0:
        return tomb
    horizon = _conv_horizon_rows(rest, tomb)
    if has_patch:  # patches are never tombstones, so the flag carries over
        folded = fold_patch_runs(rest, conv_horizon=horizon)
    else:
        perm, last = _merge_key_runs(rest)
        winners = perm[last]
        # whole-row winners: every column was set at the winner's lsn, so
        # the erasure horizon applies row-wise
        keep = np.asarray(rest.column("lsn").cast(pa.int64()))[winners] \
            > horizon[winners]
        folded = rest.take(pa.array(winners[keep]))
    return pa.concat_tables([folded, tomb], promote_options="none")


def _conv_horizon_rows(tbl: pa.Table, tomb: pa.Table) -> np.ndarray:
    """Per-row conversation-erasure horizon: for each row of ``tbl``, the
    max delete_conv lsn of its conv_id in ``tomb`` (-1 when none).  The
    Python loop runs over the block's UNIQUE conv_ids only (the same
    hash-the-uniques precedent as stages/partition.py)."""
    hmap: "dict[str, int]" = {}
    for conv, lsn in zip(tomb.column("conv_id").to_pylist(),
                         tomb.column("lsn").to_pylist()):
        prev = hmap.get(conv, -1)
        if lsn > prev:
            hmap[conv] = lsn
    enc = pc.dictionary_encode(tbl.column("conv_id").combine_chunks())
    per_value = np.array([hmap.get(v, -1)
                          for v in enc.dictionary.to_pylist()],
                         dtype=np.int64)
    return per_value[np.asarray(enc.indices.cast(pa.int64()))]


def fold_patch_runs(tbl: pa.Table,
                    conv_horizon: "np.ndarray | None" = None) -> pa.Table:
    """Per-key fold with partial-column update (``op='patch'``) semantics —
    the associative extension of ``keep_last_per_key`` to Debezium/Mongo
    style sparse updates.  One output row per (conv_id, turn_idx).

    Semantics (per-column LWW under a delete horizon — the unique
    ASSOCIATIVE extension of whole-row LWW, which is what lets the same
    kernel arbitrate the in-batch reduce, delta commits, read folds and
    compaction without per-column lsn sidecars):

    * an ``upsert`` sets EVERY value column (including explicit NULLs) at
      its lsn; a ``patch`` sets only its non-NULL value columns (NULL =
      unchanged — resetting a column to NULL therefore requires an upsert);
      a ``delete`` invalidates all column values set at lower lsns;
    * a key exists iff its max-lsn event is not a delete — so a patch
      above a delete RESURRECTS the key with only its own columns (a
      sparse upsert).  "Patch on a missing key is a no-op" is NOT
      expressible associatively (a combiner-folded patch pair cannot be
      un-merged when a delete later lands between their lsns), so the
      resurrect rule is the scale-correct contract; sources that require
      strict patch-on-existing semantics must enforce it upstream;
    * output op: ``delete`` when the run ends in a tombstone (kept — the
      delta tier persists tombstones), ``patch`` when the run saw ONLY
      patches (a delta commit must not materialize unknown columns as
      NULL — the base row may hold them), else ``upsert``.

    Cross-commit correctness needs only row-level lsns because partition
    watermarks make commits lsn-disjoint: every event in a later commit
    outranks every row of an earlier one, so a commit-collapsed patch
    row's column values are never re-interleaved.

    ``conv_horizon`` (keep_last_per_key's conversation-tombstone tier): a
    per-row int64 erasure lsn aligned to ``tbl``'s row order; setters at
    or below their row's horizon are invalid, and runs whose max lsn is at
    or below it are dropped entirely (the conv tombstone row itself
    represents them)."""
    perm, last = _merge_key_runs(tbl)
    n = len(perm)
    lsn = np.asarray(tbl.column("lsn").cast(pa.int64()))
    opc = np.asarray(pc.index_in(
        tbl.column("op").combine_chunks(), value_set=_OP_NAMES)
        .cast(pa.int64()))[perm]
    ends = np.flatnonzero(last)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(n, dtype=np.int64)
    hz = (conv_horizon[perm[ends]] if conv_horizon is not None
          else np.full(len(ends), -1, dtype=np.int64))
    # last delete position per run (delete horizon): sorted by lsn, so
    # position order == lsn order within a run
    dpos = np.where(opc == 1, idx, np.int64(-1))
    di = np.maximum.accumulate(dpos)[ends]
    di[di < starts] = -1
    # last boundary (non-patch) position per run → output op class
    bpos = np.where(opc != 2, idx, np.int64(-1))
    bi = np.maximum.accumulate(bpos)[ends]
    has_boundary = bi >= starts
    is_del_out = opc[ends] == 1
    sel_end = pa.array(perm[ends])
    out: "dict[str, pa.Array]" = {}
    for name in tbl.column_names:
        if name in ("conv_id", "turn_idx"):
            out[name] = tbl.column(name).take(sel_end)
        elif name == "lsn":
            out[name] = pa.array(lsn[perm[ends]])
        elif name == "op":
            out[name] = pa.array(
                np.where(is_del_out, "delete",
                         np.where(has_boundary, "upsert", "patch"))
                .astype(object).tolist(), type=pa.string())
        else:
            col = tbl.column(name).combine_chunks()
            notnull = np.asarray(pc.is_valid(col))[perm]
            # setter positions: upserts always, patches where non-NULL
            spos = np.where((opc == 0) | ((opc == 2) & notnull),
                            idx, np.int64(-1))
            si = np.maximum.accumulate(spos)[ends]
            valid = (si >= starts) & (si > di) & ~is_del_out
            if conv_horizon is not None:
                valid &= lsn[perm[np.maximum(si, 0)]] > hz
            gather = pa.array(perm[np.maximum(si, 0)], mask=~valid)
            out[name] = col.take(gather)
    folded = pa.table(out)
    if conv_horizon is None:
        return folded
    # runs fully at/below their conversation's erasure horizon are
    # represented by the conv tombstone row alone
    return folded.filter(pa.array(lsn[perm[ends]] > hz))


def _check_transform_contract(before: pa.Table, after: pa.Table,
                              pid: int) -> None:
    """transform_lake's per-partition guard: the transformed state must
    carry exactly the input's (conv_id, turn_idx, lsn) rows — a changed
    key would break hash routing, a changed lsn would corrupt replay
    arbitration, and a dropped/added row is a delete/insert masquerading
    as an update (those go through the binlog, not a transform)."""
    if after.num_rows != before.num_rows:
        raise ValueError(
            f"transform_lake fn changed partition {pid}'s row count "
            f"({before.num_rows} → {after.num_rows}); deletes/inserts "
            f"must go through the change stream")
    missing = [c for c in LAKE_COLUMNS if c not in after.column_names]
    if missing:
        raise ValueError(
            f"transform_lake fn dropped core column(s) {missing} on "
            f"partition {pid}")
    if before.num_rows == 0:
        return
    key_cols = ["conv_id", "turn_idx", "lsn"]

    def keys_sorted(t: pa.Table) -> pa.Table:
        k = t.select(key_cols)
        return k.take(pc.sort_indices(
            k, sort_keys=[(c, "ascending") for c in key_cols]))

    a, b = keys_sorted(before), keys_sorted(after)
    for c in key_cols:
        if not pc.all(pc.equal(a.column(c).cast(b.column(c).type),
                               b.column(c))).as_py():
            raise ValueError(
                f"transform_lake fn changed the ({', '.join(key_cols)}) "
                f"set on partition {pid}; keys and lsns are immutable "
                f"under a transform")


def sort_by_merge_key(tbl: pa.Table) -> pa.Table:
    """THE on-disk lake file ordering — lexicographic (conv_id, turn_idx).
    Every lake writer (base merge, delta commit, compaction, repartition,
    both exchanges) emits this order and fsck audits it; keeping the key
    spec in one place means a future key change cannot silently diverge
    between writers (which would erode point-lookup row-group pruning)."""
    if tbl.num_rows <= 1:
        return tbl
    return tbl.take(pc.sort_indices(
        tbl, sort_keys=[("conv_id", "ascending"),
                        ("turn_idx", "ascending")]))


def is_merge_key_sorted(tbl: pa.Table) -> bool:
    """O(n) adjacent-row monotonicity probe for ``sort_by_merge_key``'s
    order — no argsort, no index materialization.  Null keys (never
    written by a healthy lake) report unsorted."""
    n = tbl.num_rows
    if n <= 1:
        return True
    c = tbl.column("conv_id").combine_chunks()
    t = tbl.column("turn_idx").combine_chunks()
    ca, cb = c.slice(0, n - 1), c.slice(1)
    ta, tb = t.slice(0, n - 1), t.slice(1)
    ok = pc.or_(pc.less(ca, cb),
                pc.and_(pc.equal(ca, cb), pc.less_equal(ta, tb)))
    return pc.all(ok).as_py() is True


def cluster_spec_of(manifest: "dict"):
    """The committed clustering as the value every base writer threads to
    ``sort_lake_file``: ``None`` (merge-key order), a column list
    (lexicographic), or a dict ``{"columns", "mode": "zorder", "bounds"}``
    (bit-interleaved Z-order with the quantization bounds FROZEN at
    ``set_clustering`` time — like the IVF index's frozen centroids, a
    re-derived quantization would silently re-place every existing
    file's rows)."""
    cols = manifest.get("cluster_by")
    if not cols:
        return None
    if manifest.get("cluster_mode") == "zorder":
        return {"columns": list(cols), "mode": "zorder",
                "bounds": {c: (float(b[0]), float(b[1]))
                           for c, b in manifest["cluster_bounds"].items()}}
    return list(cols)


def _cluster_sort_keys(cluster_by, names) -> "list[tuple[str, str]]":
    """Effective sort spec for a lex-clustered base file: the cluster
    columns (ascending), then the merge key as tiebreak — a TOTAL order,
    since merge keys are unique within a file.  Columns the table lacks
    (a pre-evolution fold) are skipped; their rows are all-NULL anyway."""
    keys = [(c, "ascending") for c in cluster_by
            if c not in ("conv_id", "turn_idx") and c in names]
    keys += [("conv_id", "ascending"), ("turn_idx", "ascending")]
    return keys


def _zorder_bound_f64(v) -> float:
    """A footer-stat bound as the float64 the z-quantizer uses (datetime
    → epoch ns; 16-bit quantization makes the f64 precision loss on
    ns-scale ints irrelevant)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.timestamp() * 1e9
    return float(v)


def _zorder_column_f64(tbl: pa.Table, col: str) -> "np.ndarray":
    """A cluster column as float64 for quantization (timestamp → epoch
    ns; NULL / missing column → NaN, which quantizes to bucket 0 so null
    rows cluster together at the front)."""
    if col not in tbl.schema.names:
        return np.full(tbl.num_rows, np.nan)
    c = tbl.column(col)
    if pa.types.is_timestamp(c.type):
        c = c.cast(pa.int64())
    # safe=False: epoch-ns int64 exceeds float64's 2^53 exact range; the
    # precision loss is far below the 16-bit quantization granularity
    return np.asarray(
        c.cast(pa.float64(), safe=False).to_numpy(zero_copy_only=False),
        dtype=np.float64)


def _zorder_key(tbl: pa.Table, columns, bounds) -> "np.ndarray":
    """Vectorized Z-value per row: each column rank-quantized to 16 bits
    within its FROZEN [lo, hi] (values outside clamp — later ingest may
    drift past the bounds; the order stays total and valid, only the
    tail buckets saturate), then bit-interleaved LSB-first across
    columns.  ≤4 columns fit a uint64."""
    n = tbl.num_rows
    k = len(columns)
    quant = []
    for col in columns:
        lo, hi = bounds[col]
        v = _zorder_column_f64(tbl, col)
        span = hi - lo
        r = np.zeros(n) if span <= 0 else (v - lo) / span
        r = np.clip(np.nan_to_num(r, nan=0.0), 0.0, 1.0)
        quant.append((r * 65535.0).astype(np.uint64))
    z = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for bit in range(16):
        for j, q in enumerate(quant):
            z |= ((q >> np.uint64(bit)) & one) << np.uint64(bit * k + j)
    return z


def _with_sort_view(tbl: pa.Table, cluster):
    """(table-for-sorting, sort keys) for a cluster spec — zorder appends
    a transient ``_z`` column (dropped by the caller via index take)."""
    if isinstance(cluster, dict):
        z = _zorder_key(tbl, cluster["columns"], cluster["bounds"])
        view = tbl.append_column("_z", pa.array(z, pa.uint64()))
        return view, [("_z", "ascending"), ("conv_id", "ascending"),
                      ("turn_idx", "ascending")]
    return tbl, _cluster_sort_keys(cluster, tbl.schema.names)


def sort_lake_file(tbl: pa.Table, cluster_by=None) -> pa.Table:
    """BASE-file on-disk ordering: merge-key order by default; when the
    lake has a committed ``cluster_by`` (see ``set_clustering``), the
    cluster order — lexicographic columns or interleaved Z-order — with
    the merge key as tiebreak, so row-group min/max zone maps become
    selective for the clustered columns (a ts-banded
    ``read_lake(where=...)`` opens only overlapping groups).  Delta and
    dv-key files always stay merge-key sorted (transient; the fold
    re-sorts anyway)."""
    if not cluster_by:
        return sort_by_merge_key(tbl)
    if tbl.num_rows <= 1:
        return tbl
    view, keys = _with_sort_view(tbl, cluster_by)
    return tbl.take(pc.sort_indices(view, sort_keys=keys))


def is_lake_file_sorted(tbl: pa.Table, cluster_by=None) -> bool:
    """fsck's ordering probe, clustering-aware.  The clustered check uses
    ``sort_indices == arange``: the effective key set is a total order
    (unique merge keys break every tie), so an already-sorted table sorts
    to the identity permutation regardless of sort stability."""
    if not cluster_by:
        return is_merge_key_sorted(tbl)
    if tbl.num_rows <= 1:
        return True
    view, keys = _with_sort_view(tbl, cluster_by)
    idx = pc.sort_indices(view, sort_keys=keys)
    return bool(np.array_equal(np.asarray(idx),
                               np.arange(tbl.num_rows, dtype=np.int64)))


# ------------------------------------------------- bloom point-lookup sidecar
#
# Clustering trades away conv_id zone-map selectivity (the documented
# set_clustering cost: a clustered row group's conv_id min/max spans most of
# the partition, so a point lookup reads the whole base file).  The sidecar
# buys it back: beside every CLUSTERED base file the writer drops
# ``part-NNNNN.bloom`` — one small Bloom filter of the DISTINCT conv_ids per
# row group (~2 bytes/key at 16 bits/key, k=4 → ~0.24% false-positive rate).
# ``read_conversation`` probes the sidecar (a few KB) and reads only the
# matching row groups; a false positive admits one extra group, a missing or
# stale sidecar falls back to the plain filtered read — never wrong, only
# slower.  Merge-key-sorted bases don't get one (their conv_id zone maps are
# already selective).  Hashing is the lake's durable routing hash
# (hash_strings_dict → splitmix64), the same environment contract the
# committed partition layout already relies on.

BLOOM_SIDECAR_K = 4
_BLOOM_SIDECAR_SEED = 9090
_TOKEN_SIDECAR_SEED = 9191
_BLOOM_BITS_PER_KEY = 16
_BLOOM_MIN_BITS = 512


def bloom_sidecar_path(path: str) -> str:
    """``.../part-00003.parquet`` → ``.../part-00003.bloom`` (NOT a
    ``.parquet`` suffix: sync/mirror consumers glob ``*.parquet``)."""
    if path.endswith(".parquet"):
        return path[: -len(".parquet")] + ".bloom"
    return path + ".bloom"


def token_sidecar_path(path: str) -> str:
    """``.../part-00003.parquet`` → ``.../part-00003.tokens`` — the text
    skip-index sibling of ``bloom_sidecar_path``."""
    if path.endswith(".parquet"):
        return path[: -len(".parquet")] + ".tokens"
    return path + ".tokens"


def _sidecar_hash(arr: "pa.Array | pa.ChunkedArray",
                  seed: int = _BLOOM_SIDECAR_SEED) -> np.ndarray:
    from embulk_filter_timestamp_format_ray.stages.partition import (
        hash_strings_dict,
    )

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(pa.string())
    return splitmix64(hash_strings_dict(arr), seed)


def _bloom_words(h_uniq: np.ndarray, seed: int) -> "tuple[int, np.ndarray]":
    """(n_bits, uint64 word bitmap) for one row group's distinct-key
    hashes — n_bits sized to ~16 bits/key, power of two."""
    n_bits = _BLOOM_MIN_BITS
    while n_bits < _BLOOM_BITS_PER_KEY * max(len(h_uniq), 1):
        n_bits <<= 1
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    for i in range(BLOOM_SIDECAR_K):
        idx = splitmix64(h_uniq, seed + 1 + i) % np.uint64(n_bits)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return n_bits, words


def _write_sidecar(sc_path: str, per_group_hashes: "list[np.ndarray]",
                   seed: int, column: str) -> None:
    n_bits_rows, words_rows = [], []
    for h in per_group_hashes:
        n_bits, words = _bloom_words(h, seed)
        n_bits_rows.append(n_bits)
        words_rows.append(words)
    sidecar = pa.table({
        "n_bits": pa.array(n_bits_rows, pa.int64()),
        "words": pa.array([w.tolist() for w in words_rows],
                          pa.list_(pa.uint64())),
    }).replace_schema_metadata({"k": str(BLOOM_SIDECAR_K), "column": column})
    pq.write_table(sidecar, sc_path, compression="zstd")


def _group_slices(n_rows: int, granule: int) -> "list[tuple[int, int]]":
    return [(s, min(granule, n_rows - s)) for s in range(0, n_rows, granule)]


def write_bloom_sidecar(full: str, tbl: pa.Table,
                        granule: int = None) -> None:
    """Per-row-group conv_id Bloom sidecar for a base file about to be
    written with ``row_group_size=granule`` (groups are exact
    granule-sized slices, so slicing here reproduces them)."""
    granule = granule or LAKE_ROW_GROUP_ROWS
    h_all = _sidecar_hash(tbl.column("conv_id"))
    _write_sidecar(bloom_sidecar_path(full),
                   [np.unique(h_all[s:s + n])
                    for s, n in _group_slices(tbl.num_rows, granule)],
                   _BLOOM_SIDECAR_SEED, "conv_id")


def _group_token_hashes(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Distinct-token hashes of one row group's text slice: vectorized
    split-on-single-space (the ``has_token`` tokenizer), flatten, hash,
    unique."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.cast(pa.string())
    toks = pc.split_pattern(pc.drop_null(col), " ").flatten()
    if not len(toks):
        return np.empty(0, dtype=np.uint64)
    toks = pc.unique(toks)  # dedupe before hashing — groups repeat tokens
    return np.unique(_sidecar_hash(toks, _TOKEN_SIDECAR_SEED))


def write_token_sidecar(full: str, tbl: pa.Table, column: str,
                        granule: int = None) -> None:
    """Per-row-group token Bloom sidecar (the committed ``text_index``
    property): distinct split-on-space tokens of ``column`` per group —
    the skip index behind ``has_token`` reads."""
    granule = granule or LAKE_ROW_GROUP_ROWS
    col = tbl.column(column)
    _write_sidecar(token_sidecar_path(full),
                   [_group_token_hashes(col.slice(s, n))
                    for s, n in _group_slices(tbl.num_rows, granule)],
                   _TOKEN_SIDECAR_SEED, column)


def _candidate_groups(sc_path: str, h_keys: np.ndarray,
                      num_row_groups: int,
                      seed: int) -> "list[int] | None":
    """Row-group indices whose sidecar bloom admits EVERY key hash;
    ``None`` = no usable sidecar (absent, unreadable, or stale — group
    count drifted from the parquet footer), read everything."""
    try:
        t = pq.read_table(sc_path)
    except (OSError, pa.ArrowInvalid):
        return None
    if t.num_rows != num_row_groups:
        return None  # file was rewritten out-of-band; stale sidecar
    n_bits = np.asarray(t.column("n_bits"))
    wcol = t.column("words").combine_chunks()
    out = []
    for g in range(t.num_rows):
        nb = np.uint64(n_bits[g])
        words = np.asarray(wcol[g].values, dtype=np.uint64)
        hit = np.ones(len(h_keys), dtype=bool)
        for i in range(BLOOM_SIDECAR_K):
            idx = splitmix64(h_keys, seed + 1 + i) % nb
            hit &= (words[(idx >> np.uint64(6)).astype(np.int64)]
                    >> (idx & np.uint64(63))) & np.uint64(1) != 0
        if hit.all():
            out.append(g)
    return out


def bloom_candidate_groups(full: str, conv_id: str,
                           num_row_groups: int) -> "list[int] | None":
    """Row-group indices of ``full`` that MAY contain ``conv_id`` per its
    conv sidecar (see ``_candidate_groups`` for the None contract)."""
    h = _sidecar_hash(pa.array([conv_id], pa.string()))
    return _candidate_groups(bloom_sidecar_path(full), h,
                             num_row_groups, _BLOOM_SIDECAR_SEED)


def token_candidate_groups(full: str, tokens: "list[str]",
                           num_row_groups: int) -> "list[int] | None":
    """Row-group indices of ``full`` that MAY contain EVERY token (AND'd
    ``has_token`` specs) per its token sidecar."""
    h = _sidecar_hash(pa.array(list(tokens), pa.string()),
                      _TOKEN_SIDECAR_SEED)
    return _candidate_groups(token_sidecar_path(full), h,
                             num_row_groups, _TOKEN_SIDECAR_SEED)


def _audit_sidecar(full: str, sc_path: str, group_hashes_fn, seed: int,
                   what: str, miss_verb: str) -> "tuple":
    """Shared fsck sidecar audit → (violation, warning), at most one
    non-None.  Missing sidecar → warning (legacy file: reads fall back to
    full-file scans — slow, not wrong; the next rewrite heals it).  Stale
    group count → warning (an out-of-band rewrite; reads detect and
    ignore it).  A FALSE NEGATIVE → violation: pruned reads would
    silently skip matching rows."""
    if not os.path.exists(sc_path):
        return None, (f"base has no {what} sidecar ({miss_verb} read the "
                      "whole file; rewrite/compact to heal)")
    md = pq.ParquetFile(full).metadata
    sc = pq.read_table(sc_path)
    if sc.num_rows != md.num_row_groups:
        return None, (f"{what} sidecar is stale ({sc.num_rows} groups "
                      f"recorded, file has {md.num_row_groups}) — ignored "
                      "by reads; rewrite/compact to heal")
    nbits = np.asarray(sc.column("n_bits"))
    wcol = sc.column("words").combine_chunks()
    start = 0
    for g in range(md.num_row_groups):
        n = md.row_group(g).num_rows
        h = group_hashes_fn(start, n)
        start += n
        nb = np.uint64(nbits[g])
        words = np.asarray(wcol[g].values, dtype=np.uint64)
        ok = np.ones(len(h), dtype=bool)
        for i in range(BLOOM_SIDECAR_K):
            idx = splitmix64(h, seed + 1 + i) % nb
            ok &= (words[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1) != 0
        if not ok.all():
            return (f"{what} sidecar has {int((~ok).sum())} false "
                    f"negative(s) in row group {g} — {miss_verb} would "
                    "silently miss matching rows", None)
    return None, None


def audit_bloom_sidecar(full: str, tbl: pa.Table) -> "tuple":
    """fsck's conv-sidecar tier for one CLUSTERED base file."""
    h_all = _sidecar_hash(tbl.column("conv_id"))
    return _audit_sidecar(
        full, bloom_sidecar_path(full),
        lambda s, n: np.unique(h_all[s:s + n]),
        _BLOOM_SIDECAR_SEED, "bloom", "point lookups")


def audit_token_sidecar(full: str, tbl: pa.Table, column: str) -> "tuple":
    """fsck's token-sidecar tier for one base file of a lake with a
    committed ``text_index``."""
    col = tbl.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return _audit_sidecar(
        full, token_sidecar_path(full),
        lambda s, n: _group_token_hashes(col.slice(s, n)),
        _TOKEN_SIDECAR_SEED, "token", "has_token reads")


def text_index_of(manifest: "dict") -> "str | None":
    """The committed token-skip-index column (``set_text_index``), or
    None — a durable layout property like ``cluster_by``."""
    return manifest.get("text_index") or None


def write_base_file(state: pa.Table, full: str, cluster,
                    token_col: "str | None" = None) -> pa.Table:
    """THE base-file write: committed on-disk order (merge key or the
    cluster spec), zstd parquet at the lake granule, plus the committed
    sidecars — the conv_id Bloom for clustered files, the token skip
    index when the lake has a ``text_index``.  Returns the sorted table
    (callers reuse it for schema/row accounting)."""
    state = sort_lake_file(state, cluster)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(state, full, compression="zstd",
                   row_group_size=LAKE_ROW_GROUP_ROWS)
    if cluster and state.num_rows:
        write_bloom_sidecar(full, state)
    if token_col and state.num_rows and token_col in state.schema.names:
        write_token_sidecar(full, state, token_col)
    return state


class PreMergeCombiner:
    """map_batches combiner applied after partitioning, before the shuffle:
    per block, keep only each key's winner (tombstones included), then
    shrink the exchange encoding — ``op`` string → int8 tombstone flag,
    dictionary-encode the low-cardinality ``role``/``conv_id`` columns (the
    all-to-all moves raw Arrow buffers, so smaller buffers = less object
    store bandwidth, the scaling bottleneck)."""

    # measured on this box (16M events, 32 cpus, A/B x3): dictionary-encoded
    # payloads make Ray's sort-shuffle SLOWER (9.9s vs 7.2s min) — dictionary
    # unification during block concat eats the bandwidth saved, so the wire
    # encoding defaults OFF; kept as an option for real-network clusters
    # where bytes-on-the-wire dominates.
    def __init__(self, wire_encode: bool = False):
        self.wire_encode = wire_encode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        # dead-letter rows (pid == DLQ_PID, dlq mode only) bypass the
        # combiner: they may carry NULL merge keys, and quarantine is
        # append-only — replays must stay visible, not collapse
        dlq_part = None
        if "dlq_reason" in batch.schema.names:
            dlq_mask = pc.equal(batch.column("_pid"), DLQ_PID)
            if pc.any(dlq_mask).as_py():
                dlq_part = batch.filter(dlq_mask)
                batch = batch.filter(pc.invert(dlq_mask))
        passthrough = None
        if batch.num_rows and "op" in batch.schema.names:
            # two op classes must cross the exchange UNFOLDED: patches
            # (block-folding partial updates needs per-column lsn sidecars —
            # a later block's delete can land between two folded patches'
            # lsns) and conversation tombstones (replicated to every pid by
            # PartitionStage; a per-key fold here would collapse the
            # replicas across pids, starving all partitions but one).  Both
            # are a fraction of binlog traffic, so the exchange stays
            # combined where it matters.
            passthrough = pc.is_in(batch.column("op"), value_set=pa.array(
                [PATCH_OP, CONV_DELETE_OP]))
            if not pc.any(passthrough).as_py():
                passthrough = None
        if passthrough is not None:
            rest = batch.filter(pc.invert(passthrough))
            out = pa.concat_tables(
                [keep_last_per_key(rest) if rest.num_rows else rest,
                 batch.filter(passthrough)])
        else:
            out = keep_last_per_key(batch) if batch.num_rows else batch
        if dlq_part is not None:
            out = pa.concat_tables([out, dlq_part])
        if not self.wire_encode:
            return out
        op_code = pc.cast(pc.index_in(
            out.column("op").combine_chunks(), value_set=_OP_NAMES), pa.int8())
        out = out.drop_columns(["op"]).append_column("_del", op_code)
        for col in ("role", "conv_id"):
            i = out.schema.get_field_index(col)
            enc = pc.dictionary_encode(out.column(col).combine_chunks())
            out = out.set_column(i, col, enc)
        return out


def decode_shuffle_encoding(tbl: pa.Table) -> pa.Table:
    """Inverse of the combiner's wire encoding (run reduce-side); no-op on
    unencoded tables."""
    for col in ("role", "conv_id"):
        i = tbl.schema.get_field_index(col)
        c = tbl.column(col)
        if pa.types.is_dictionary(c.type):
            tbl = tbl.set_column(i, col, c.cast(pa.string()))
    if "_del" in tbl.schema.names:
        # _del carries the _OP_NAMES code (0 upsert / 1 delete / 2 patch)
        op = pc.take(_OP_NAMES, tbl.column("_del").cast(pa.int64()))
        tbl = tbl.drop_columns(["_del"]).append_column("op", op)
    return tbl


def merge_partition_table(delta: pa.Table, prior: "pa.Table | None",
                          watermark: int,
                          replay_filter: bool = True) -> "tuple[pa.Table, int, int]":
    """Vectorized per-partition merge → (new state, new watermark, applied).

    See module docstring for semantics. ``delta`` carries op+lsn; ``prior``
    is the committed lake state (op column absent, rows are live upserts).

    ``replay_filter=False`` skips the watermark replay-prune and lets the
    per-key max-LSN winner selection arbitrate alone — for deltas KNOWN to
    be unapplied despite low lsns (DLQ reprocessing: quarantined events
    never advanced watermarks, so the prune would wrongly drop them; the
    merge stays idempotent because re-applying the same row cannot change
    the winner).  The watermark still only ratchets up."""
    max_in = pc.max(delta.column("lsn")).as_py() if delta.num_rows else None
    new_watermark = max(watermark, max_in if max_in is not None else -1)
    # replay dedup: only events beyond the watermark apply
    fresh = delta if not replay_filter else delta.filter(
        pc.greater(delta.column("lsn"), watermark))
    applied = fresh.num_rows
    # widen-only schema evolution: the merge spans the UNION of the prior
    # state's and the incoming delta's value columns — whichever side
    # predates a column contributes NULLs for it (an upsert from a source
    # that doesn't know the column sets it NULL; per-column patch LWW is
    # handled by fold_patch_runs, which is column-agnostic)
    extras = _union_extras([prior, fresh])
    cols = [*LAKE_COLUMNS, *extras]
    types = _union_types([prior, fresh])
    parts = []
    if prior is not None and prior.num_rows:
        prior_ops = pad_to_schema(prior, cols, types).append_column(
            "op", pa.array(["upsert"] * prior.num_rows))
        parts.append(prior_ops.select(["op", *cols]))
    if fresh.num_rows:
        parts.append(pad_to_schema(fresh, ["op", *cols], types))
    if not parts:
        return _empty_lake_table(cols, types), new_watermark, 0
    merged = pa.concat_tables(parts, promote_options="permissive")
    winners = keep_last_per_key(merged)
    # not_equal "delete" (vs equal "upsert"): keys touched only by patch
    # events materialize as sparse upserts (fold_patch_runs semantics)
    live = winners.filter(pc.invert(pc.is_in(
        winners.column("op"),
        value_set=pa.array(["delete", CONV_DELETE_OP]))))
    return live.select(cols), new_watermark, applied


class MassDeleteError(ValueError):
    """Raised by the mass-delete circuit breaker (``max_delete_fraction``)
    BEFORE the manifest swap — the staged txn files are orphaned and GC
    reclaims them; nothing commits."""


def _count_fresh_deletes(delta: pa.Table, watermark: int) -> int:
    """Tombstone input for the mass-delete guard: delete-op events above
    the replay watermark (post-combine winners — the rows that can
    actually remove state)."""
    if delta.num_rows == 0:
        return 0
    is_del = pc.is_in(delta.column("op"),
                      value_set=pa.array(["delete", CONV_DELETE_OP]))
    fresh = pc.greater(delta.column("lsn"),
                       pa.scalar(watermark, pa.int64()))
    n = pc.sum(pc.cast(pc.and_(pc.fill_null(is_del, False), fresh),
                       pa.int64())).as_py()
    return int(n or 0)


class MergeApplier:
    """Per-partition stateful merge applier used via
    ``groupby("_pid").map_groups`` (each group = one partition's delta).

    Design note — externalized state vs in-actor state: the per-partition
    mutable state (last-applied-LSN watermark + current rows) lives in the
    manifest + partition parquet, NOT in long-lived actor memory.  Under Ray
    Data's at-least-once task execution a retried merge task simply re-reads
    the prior committed file and rewrites its staged output (same content,
    idempotent); an in-actor delta buffer would be lost on actor death and
    would pin partitions to actors, breaking elastic scaling.  The
    build-once-per-open pattern of the reference (ColumnCaster.java:51-57)
    maps to this object's construction: manifest snapshot + txn id resolved
    once, reused for every group it is invoked on.
    """

    def __init__(self, lake_dir: str, txn_id: str,
                 partition_meta: "dict[int, dict]",
                 replay_filter: bool = True, cluster_by=None,
                 text_index: "str | None" = None):
        self.lake_dir = lake_dir
        self.txn_id = txn_id
        self.partition_meta = partition_meta  # pid -> {path, last_applied_lsn}
        # False only for DLQ reprocessing (see merge_partition_table)
        self.replay_filter = replay_filter
        # committed base-file layout (set_clustering); None = merge-key
        # list = lex order, dict = zorder spec (see cluster_spec_of)
        self.cluster_by = cluster_by or None
        # committed token skip index column (set_text_index), or None
        self.text_index = text_index or None

    #: soft cap: a merge group beyond this is a sign num_partitions is too
    #: small for the data volume (state file rewrite cost grows linearly)
    GROUP_ROWS_WARN = 5_000_000

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return self._result(None)
        if group.num_rows > self.GROUP_ROWS_WARN:
            logger.warning(
                "merge group has %d rows; raise num_partitions to bound "
                "per-partition state rewrites", group.num_rows)
        pid = int(group.column("_pid")[0].as_py())
        if pid == DLQ_PID:
            return self._result(
                _write_dlq_group(self.lake_dir, self.txn_id, group))
        meta = self.partition_meta.get(pid, {})
        watermark = meta.get("last_applied_lsn", -1)
        prior = None
        prior_path = meta.get("path")
        if prior_path:
            prior = pq.read_table(os.path.join(self.lake_dir, prior_path))
        if meta.get("deltas") or meta.get("dvs"):
            # pending merge-on-read delta files (apply_delta commits) and
            # deletion vectors (delete_where mode='dv'): fold them into the
            # prior state here — this base merge then both applies the new
            # events AND compacts the backlog (the commit clears the
            # partition's delta and dv lists)
            pend = [pq.read_table(os.path.join(self.lake_dir, d["path"]))
                    for d in meta.get("deltas", [])]
            dvs = [pq.read_table(os.path.join(self.lake_dir, d["path"]))
                   for d in meta.get("dvs", [])]
            prior = fold_partition_state(prior, pend, dvs=dvs)
        delta = decode_shuffle_encoding(group.drop_columns(["_pid"]))
        state, new_watermark, applied = merge_partition_table(
            delta, prior, watermark, replay_filter=self.replay_filter)
        # on-disk order (keep_last_per_key leaves dictionary-index order):
        # merge key by default — selective conv_id row-group stats for the
        # point-lookup pushdown — or the committed cluster_by layout (plus
        # its bloom sidecar); fsck checks whichever is committed
        rel = os.path.join(f"txn-{self.txn_id}", f"part-{pid:05d}.parquet")
        full = os.path.join(self.lake_dir, rel)
        state = write_base_file(state, full, self.cluster_by,
                                token_col=self.text_index)
        return self._result({
            "pid": pid, "path": rel, "rows": state.num_rows,
            "last_applied_lsn": new_watermark, "events_applied": applied,
            "events_seen": delta.num_rows,
            "deletes_seen": _count_fresh_deletes(
                delta, watermark if self.replay_filter else -1),
            "schema_ipc": extras_schema_b64(state),
        })

    @staticmethod
    def _result(row: "dict | None") -> pa.Table:
        schema = pa.schema([
            ("pid", pa.int64()), ("path", pa.string()), ("rows", pa.int64()),
            ("last_applied_lsn", pa.int64()), ("events_applied", pa.int64()),
            ("events_seen", pa.int64()), ("deletes_seen", pa.int64()),
            ("schema_ipc", pa.string()),
        ])
        if row is not None:
            row.setdefault("schema_ipc", "")
            row.setdefault("deletes_seen", 0)
        rows = [row] if row else []
        return pa.Table.from_pylist(rows, schema=schema)


def make_partition_router(partition, dlq: bool):
    """Routing stage shared by the dataset and actor exchanges: hash
    partitioning for clean rows; in dlq mode, rows the normalizer tagged
    (non-NULL ``dlq_reason`` — possibly NULL conv_id/turn_idx, so they must
    not hit the key hash) go to the reserved dead-letter pid instead."""
    if not dlq:
        return partition

    def partition_or_dlq(batch: pa.Table) -> pa.Table:
        bad = pc.is_valid(batch.column("dlq_reason"))
        if not pc.any(bad).as_py():
            return partition(batch)
        good_p = partition(batch.filter(pc.invert(bad)))
        bad_t = batch.filter(bad)
        bad_p = bad_t.append_column("_pid", pa.array(
            np.full(bad_t.num_rows, DLQ_PID, dtype=np.int32)))
        return pa.concat_tables([good_p, bad_p])

    return partition_or_dlq


def _write_dlq_group(lake_dir: str, txn_id: str, group: pa.Table) -> "dict":
    """Quarantine partition: append-only forensic parquet, committed through
    the SAME two-phase txn as the data partitions (a crash before the
    manifest swap orphans it together with them)."""
    return write_dlq_table(lake_dir, txn_id, group.drop_columns(["_pid"]))


def write_dlq_table(lake_dir: str, txn_id: str, tbl: pa.Table) -> "dict":
    """Write one txn's quarantine parquet from an already-unrouted table
    (no ``_pid``) — the shared core for the dataset exchange's merge group
    and the actor exchange's dead-letter buffer."""
    dlq_tbl = decode_shuffle_encoding(tbl)
    dlq_tbl = dlq_tbl.take(pc.sort_indices(
        dlq_tbl, sort_keys=[("lsn", "ascending")]))
    rel = os.path.join(f"txn-{txn_id}", "dlq.parquet")
    full = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(dlq_tbl, full, compression="zstd",
                   row_group_size=LAKE_ROW_GROUP_ROWS)
    return {
        "pid": DLQ_PID, "path": rel, "rows": dlq_tbl.num_rows,
        "last_applied_lsn": -1, "events_applied": 0,
        "events_seen": dlq_tbl.num_rows,
    }


def write_delta_file(lake_dir: str, txn_id: str, pid: int, watermark: int,
                     delta: pa.Table) -> "dict | None":
    """One partition's DELTA-commit core, shared by the dataset exchange
    (:class:`DeltaWriter`) and the actor exchange: prune replays at the
    watermark, keep per-key winners (op preserved → tombstones persist),
    write the append-only delta parquet.  ``None`` = pure replay (no file,
    no watermark change)."""
    max_in = pc.max(delta.column("lsn")).as_py() if delta.num_rows else None
    new_watermark = max(watermark, max_in if max_in is not None else -1)
    fresh = delta.filter(pc.greater(delta.column("lsn"), watermark))
    applied = fresh.num_rows
    if applied == 0:
        return None
    delta_cols = ["op", *LAKE_COLUMNS, *_union_extras([fresh])]
    winners = pad_to_schema(keep_last_per_key(fresh), delta_cols,
                            _union_types([fresh]))
    winners = sort_by_merge_key(winners)
    rel = os.path.join(f"txn-{txn_id}", f"delta-{pid:05d}.parquet")
    full = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(winners, full, compression="zstd",
                   row_group_size=LAKE_ROW_GROUP_ROWS)
    return {
        "pid": pid, "path": rel, "rows": winners.num_rows,
        "last_applied_lsn": new_watermark, "events_applied": applied,
        "events_seen": delta.num_rows,
        "deletes_seen": _count_fresh_deletes(delta, watermark),
        "schema_ipc": extras_schema_b64(winners),
    }


class DeltaWriter:
    """Per-partition DELTA-commit writer (``apply_delta``): instead of
    reading and rewriting the partition's base parquet per micro-batch
    (write amplification ∝ state size, the base-merge cost model), write
    only the micro-batch's per-key winners — op column preserved, so
    tombstones persist — as an append-only delta file.  Reads fold
    base+deltas (:func:`fold_partition_state`); ``compact_deltas`` or any
    later base-merge apply re-bounds read amplification.

    Replay semantics are IDENTICAL to the base merge: events at/below the
    partition watermark are pruned here (they are already represented in
    base or an earlier committed delta), and the fold's max-LSN winner
    selection arbitrates everything else — so delta commits compose with
    base commits in any order."""

    def __init__(self, lake_dir: str, txn_id: str,
                 partition_meta: "dict[int, dict]"):
        self.lake_dir = lake_dir
        self.txn_id = txn_id
        self.partition_meta = partition_meta

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return MergeApplier._result(None)
        pid = int(group.column("_pid")[0].as_py())
        if pid == DLQ_PID:
            return MergeApplier._result(
                _write_dlq_group(self.lake_dir, self.txn_id, group))
        meta = self.partition_meta.get(pid, {})
        watermark = meta.get("last_applied_lsn", -1)
        delta = decode_shuffle_encoding(group.drop_columns(["_pid"]))
        # None = pure replay micro-batch: no file, no watermark change
        return MergeApplier._result(write_delta_file(
            self.lake_dir, self.txn_id, pid, watermark, delta))


def apply_multi(events_ds, pipelines: "dict[str, CDCPipeline]",
                table_col: str = "table", delta: bool = False) -> "dict[str, dict]":
    """Multi-table / multi-tenant fan-out: route ONE mixed change stream
    into N independent lakes in a single normalize + composite-pid
    exchange pass — the Debezium-server-fans-into-topics shape, with each
    lake keeping its own watermarks, manifest, OCC domain and (evolved)
    schema.

    * Routing key: the ``table_col`` value on every event; unknown values
      abort the batch (a silently dropped tenant is unrecoverable).
    * ONE exchange: each table's rows partition under ITS lake's layout,
      then the pid is lifted to ``table_idx * stride + pid`` so a single
      ``groupby`` shuffles everything; the reduce side lowers it back and
      runs the normal per-partition merge into that table's lake dir.
    * Map-side combine runs PER TABLE subset: tables may share merge keys
      (same conv ids in two tenants), and a cross-table fold would pick
      one tenant's winner for both.  Within a table the usual
      cross-partition fold argument holds unchanged.
    * Exactly-once PER LAKE: one manifest swap per table.  Cross-table
      atomicity is NOT claimed — a crash between swaps leaves some lakes
      committed and the others to pick up the replay on the next apply
      (watermarks dedup), exactly like independent consumers of one log.
    * The shared normalize pass requires identical epoch_specs /
      stop_on_invalid / dlq across tables (a mixed dlq fan-out would give
      the exchange a per-batch-varying schema).  With dlq on, each lake
      quarantines ITS OWN tagged rows: a table's dead-letter lane rides
      the same composite exchange under a reserved negative pid and lands
      in that lake's ``dlq.parquet`` inside its exactly-once commit.
    * ``delta=True`` commits merge-on-read delta files per lake instead of
      base merges (apply_delta's cost model — the steady-state shape for a
      multi-tenant micro-batch tail); compact each lake on its own cadence.
    """
    if not pipelines:
        raise ValueError("pipelines must name at least one table")
    names = sorted(pipelines)
    dirs = [os.path.abspath(pipelines[t].lake_dir) for t in names]
    if len(set(dirs)) != len(dirs):
        raise ValueError(
            "apply_multi pipelines must target distinct lake dirs")
    first = pipelines[names[0]]
    for t in names[1:]:
        if (pipelines[t].epoch_specs != first.epoch_specs
                or pipelines[t].stop_on_invalid != first.stop_on_invalid
                or pipelines[t].dlq != first.dlq):
            raise ValueError(
                "apply_multi runs ONE shared normalize pass; epoch_specs, "
                "stop_on_invalid and dlq must be identical across tables")
    dlq = first.dlq

    manifests = {t: mf.read_manifest(pipelines[t].lake_dir) for t in names}
    for t in names:
        pipelines[t].check_manifest_compat(manifests[t])
    low = min(mf.min_watermark(manifests[t], pipelines[t].num_partitions)
              for t in names)
    txn_id = uuid.uuid4().hex[:12]
    stride = max(p.num_partitions for p in pipelines.values())
    stages = {t: PartitionStage(
        pipelines[t].num_partitions,
        by_turn=(pipelines[t].partition_mode == "turn"),
        salt_keys=pipelines[t].salt_keys,
        salt_factor=pipelines[t].salt_factor) for t in names}
    # constraints are PER LAKE (each table adopts / replaces its own
    # committed set), so normalization runs one stage per table subset —
    # route() already splits the batch per table before normalizing
    normalizers = {t: NormalizeStage(
        first.epoch_specs, low_watermark=low,
        stop_on_invalid=first.stop_on_invalid, dlq=dlq,
        constraints=pipelines[t].effective_constraints(manifests[t]))
        for t in names}
    routers = {t: make_partition_router(stages[t], dlq) for t in names}
    normalize = normalizers[names[0]]  # _empty_out shape (shared schema)
    combiner = PreMergeCombiner()
    idx_of = {t: i for i, t in enumerate(names)}
    known = pa.array(names)

    def route(batch: pa.Table) -> pa.Table:
        if table_col not in batch.schema.names:
            raise CastError(
                f"apply_multi needs a {table_col!r} column on every event")
        tags = batch.column(table_col)
        ok = pc.fill_null(pc.is_in(tags, value_set=known), False)
        if not pc.all(ok).as_py():
            vals = sorted({v for v in batch.filter(pc.invert(ok))
                           .column(table_col).to_pylist()}, key=str)[:5]
            raise CastError(f"unknown table value(s) {vals}; routed tables "
                            f"are {names}")
        parts = []
        for t in names:
            sub = batch.filter(pc.equal(tags, t))
            if sub.num_rows == 0:
                continue
            sub = normalizers[t](sub.drop_columns([table_col]))
            if sub.num_rows == 0:
                continue
            sub = combiner(routers[t](sub))
            pid = np.asarray(sub.column("_pid").cast(pa.int32()))
            # composite pid: table_idx*stride + pid for clean rows; each
            # table's dead-letter lane gets the reserved NEGATIVE composite
            # -(idx+1) (DLQ_PID + a positive lift would collide with the
            # previous table's last partition)
            comp = pa.array(np.where(
                pid < 0, -(idx_of[t] + 1),
                pid.astype(np.int64) + idx_of[t] * stride).astype(np.int32))
            i = sub.schema.get_field_index("_pid")
            parts.append(sub.set_column(i, "_pid", comp))
        if not parts:
            out = normalize._empty_out(None)
            return out.append_column("_pid", pa.array([], pa.int32()))
        return pa.concat_tables(parts, promote_options="permissive")

    if delta:
        appliers = {t: DeltaWriter(
            pipelines[t].lake_dir, txn_id,
            {int(pid): m for pid, m in manifests[t]["partitions"].items()})
            for t in names}
    else:
        appliers = {t: MergeApplier(
            pipelines[t].lake_dir, txn_id,
            {int(pid): m for pid, m in manifests[t]["partitions"].items()},
            cluster_by=cluster_spec_of(manifests[t]),
            text_index=text_index_of(manifests[t]))
            for t in names}

    def merge_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return MergeApplier._result(None).append_column(
                "table", pa.array([], pa.string()))
        comp = int(group.column("_pid")[0].as_py())
        # negative composite = a table's dead-letter lane (see route())
        t = names[-comp - 1] if comp < 0 else names[comp // stride]
        lowered = DLQ_PID if comp < 0 else comp % stride
        i = group.schema.get_field_index("_pid")
        group = group.set_column(i, "_pid", pa.array(
            np.full(group.num_rows, lowered, dtype=np.int32)))
        res = appliers[t](group)
        return res.append_column("table",
                                 pa.array([t] * res.num_rows, pa.string()))

    ds = events_ds.map_batches(route, batch_format="pyarrow",
                               zero_copy_batch=True)
    rows = ds.groupby("_pid").map_groups(
        merge_group, batch_format="pyarrow").take_all()

    # mass-delete guards run for EVERY lake before ANY lake commits (no
    # partial fan-out where one tenant committed and another refused)
    for t in names:
        pipelines[t]._check_delete_guard(
            [r for r in rows if r["table"] == t])
    out: "dict[str, dict]" = {}
    for t in names:
        mine = [r for r in rows if r["table"] == t]
        manifest = manifests[t]
        if not mine:
            # pure replay for this table: nothing merged, no version churn
            out[t] = {"txn": None, "version": manifest.get("version", 0),
                      "partitions_touched": 0, "events_applied": 0,
                      "events_quarantined": 0}
            continue
        partitions = dict(manifest["partitions"])
        dlq_entries = list(manifest.get("dlq", []))
        total = quarantined = 0
        for r in mine:
            if int(r["pid"]) == DLQ_PID:
                quarantined = int(r["rows"])
                dlq_entries.append({"txn": txn_id, "path": r["path"],
                                    "rows": quarantined})
                continue
            pid = str(r["pid"])
            prev = partitions.get(pid, {})
            lineage = list(prev.get("lineage", []))
            lineage.append({"txn": txn_id,
                            "events_applied": int(r["events_applied"])})
            if delta:
                # merge-on-read commit: base untouched, delta appended,
                # pending deletion vectors carry (never drop silently)
                deltas = list(prev.get("deltas", []))
                deltas.append({"txn": txn_id, "path": r["path"],
                               "rows": int(r["rows"])})
                partitions[pid] = {
                    "path": prev.get("path"),
                    "rows": int(prev.get("rows", 0)),
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
            total += int(r["events_applied"])
        new_manifest = {
            "version": manifest["version"] + 1,
            "partitions": partitions,
            "num_partitions": pipelines[t].num_partitions,
            "partition_config": pipelines[t].partition_config(),
            "last_txn": txn_id,
            **merge_schema_entries(manifest, [
                r.get("schema_ipc") or "" for r in mine
                if int(r["pid"]) != DLQ_PID]),
        }
        if dlq_entries:
            new_manifest["dlq"] = dlq_entries
        # each lake records ITS enforced expectations (durable properties)
        if normalizers[t].constraints:
            new_manifest["constraints"] = [
                c.to_json() for c in normalizers[t].constraints]
        carry_lsn_ceiling(manifest, new_manifest)
        carry_cluster_by(manifest, new_manifest)
        mf.commit_manifest(pipelines[t].lake_dir, new_manifest,
                           retain_history=pipelines[t].time_travel_retain,
                           expected_version=manifest["version"])
        if pipelines[t].auto_gc:
            mf.gc_orphan_txns(pipelines[t].lake_dir, keep_txns={txn_id})
        out[t] = {"txn": txn_id, "version": new_manifest["version"],
                  "partitions_touched": len(mine) - (1 if quarantined else 0),
                  "events_applied": total,
                  "events_quarantined": quarantined}
    return out


def carry_lsn_ceiling(manifest: dict, new_manifest: dict) -> None:
    """Propagate a repartition's ``lsn_ceiling`` (see repartition_lake):
    the ceiling stays in the manifest while ANY partition's watermark is
    still below it — fsck's torn-commit check allows lsns up to
    max(watermark, ceiling) during that window — and drops automatically
    once every watermark has ratcheted past (closing the blind spot)."""
    ceil = manifest.get("lsn_ceiling")
    if ceil is None:
        return
    low = min((int(p.get("last_applied_lsn", -1))
               for p in new_manifest["partitions"].values()), default=-1)
    if low < int(ceil):
        new_manifest["lsn_ceiling"] = int(ceil)


def carry_cluster_by(manifest: dict, new_manifest: dict) -> None:
    """``cluster_by`` (+ zorder mode/frozen bounds) and ``text_index``
    are durable layout properties like the partition config: every commit
    carries them forward (set/cleared only by ``set_clustering`` /
    ``set_text_index``'s own commits, which write the keys explicitly)."""
    if manifest.get("cluster_by") and "cluster_by" not in new_manifest:
        new_manifest["cluster_by"] = list(manifest["cluster_by"])
        for k in ("cluster_mode", "cluster_bounds"):
            if manifest.get(k):
                new_manifest[k] = manifest[k]
    if manifest.get("text_index") and "text_index" not in new_manifest:
        new_manifest["text_index"] = manifest["text_index"]


#: arrow schema for per-partition metadata work items — from_items infers
#: list<null> for blocks whose path lists happen to be all-empty, and the
#: mixed-type concat then warns/misbehaves; an explicit schema removes the
#: inference entirely
_META_ITEM_FIELDS = (("pid", pa.int64()), ("base", pa.string()),
                     ("deltas", pa.list_(pa.string())),
                     ("dvs", pa.list_(pa.string())))


def _meta_items_dataset(items: "list[dict]", extra_fields=()):
    """One single-row Arrow block per metadata item (pid/base/deltas/dvs
    [+extras]) with explicit types — the driver-side source for the
    per-partition maintenance/fold tasks (≤P rows total)."""
    import ray.data

    schema = pa.schema([*_META_ITEM_FIELDS, *extra_fields])
    tbl = pa.Table.from_pylist(items, schema=schema)
    return ray.data.from_arrow([tbl.slice(i, 1)
                                for i in range(tbl.num_rows)])


def _delete_mask(predicate, state: pa.Table, pid: int) -> "np.ndarray":
    """Validate a delete_where predicate's output into a boolean numpy
    mask (True = delete) — shared by the rewrite and dv tiers."""
    mask = np.asarray(predicate(state))
    if mask.dtype != np.bool_ or mask.shape != (state.num_rows,):
        raise ValueError(
            f"delete_where predicate must return a boolean mask of "
            f"length {state.num_rows} for partition {pid}; got "
            f"dtype {mask.dtype}, shape {mask.shape}")
    return mask


def _footer_ranges(lake_dir: str, rel_paths: "list[str]",
                   columns: "list[str]") -> "dict[str, tuple | None]":
    """Per-column value range across the files' parquet FOOTERS only (no
    data pages read): ``None`` = statistics unavailable somewhere (the
    caller must stay conservative), ``()`` = the column holds no non-null
    value in any file, else an inclusive ``(min, max)`` of python values.
    A file that predates an evolved column contributes all-NULL (widen-only
    evolution) — i.e. nothing."""
    spans: "dict[str, list]" = {c: [] for c in columns}
    unknown: "set[str]" = set()
    for rel in rel_paths:
        pf = pq.ParquetFile(os.path.join(lake_dir, rel))
        md = pf.metadata
        for c in columns:
            if c in unknown:
                continue
            idx = pf.schema_arrow.get_field_index(c)
            if idx == -1:
                continue  # pre-evolution file: column reads as NULL
            for rg in range(md.num_row_groups):
                group = md.row_group(rg)
                st = group.column(idx).statistics
                if st is not None and st.null_count == group.num_rows:
                    continue  # no non-null values in this group
                if st is None or not st.has_min_max:
                    unknown.add(c)
                    break
                spans[c].append((st.min, st.max))
    out: "dict[str, tuple | None]" = {}
    for c in columns:
        if c in unknown:
            out[c] = None
        elif not spans[c]:
            out[c] = ()
        else:
            out[c] = (min(lo for lo, _ in spans[c]),
                      max(hi for _, hi in spans[c]))
    return out


def _prune_possible(constraints, ranges: "dict[str, tuple | None]") -> bool:
    """OR'd delete specs: the partition can hold a matching row iff ANY
    spec's value rule is satisfiable within its column's footer range."""
    return any(c.range_possible(ranges.get(c.column)) for c in constraints)


def _matching_row_groups(pf: "pq.ParquetFile", constraints) -> "list[int]":
    """Row-group indexes whose footer min/max stats admit every AND'd
    constraint — zone-map skipping WITHIN a file, the tier below
    ``_footer_ranges``'s whole-partition pruning.  Conservative like
    ``range_possible``: missing stats keep the group; a column the file
    lacks reads all-NULL (widen-only evolution) and can never match, so
    any group fails that constraint.  Only sound on tables that ARE live
    state (a clean partition's base): pre-fold row-group pruning on a
    versioned table could drop a key's newest version and resurrect an
    older matching one."""
    md = pf.metadata
    keep: "list[int]" = []
    for rg in range(md.num_row_groups):
        grp = md.row_group(rg)
        ok = True
        for c in constraints:
            idx = pf.schema_arrow.get_field_index(c.column)
            if idx == -1:
                rng: "tuple | None" = ()
            else:
                st = grp.column(idx).statistics
                if st is not None and st.null_count == grp.num_rows:
                    rng = ()
                elif st is None or not st.has_min_max:
                    rng = None
                else:
                    rng = (st.min, st.max)
            if not c.range_possible(rng):
                ok = False
                break
        if ok:
            keep.append(rg)
    return keep


def _vanished_txn_input(exc) -> bool:
    """True when ``exc`` (usually a RayTaskError wrapping the real cause)
    is a FileNotFoundError on a lake ``txn-*`` file.  That file was live in
    the manifest this writer read, then a CONCURRENT commit superseded it
    and ``gc_orphan_txns`` collected it once it rotated out of the retained
    history window — i.e. a :class:`state.manifest.CommitConflict` observed
    at READ time instead of at the manifest swap (the stale writer's swap
    would have conflicted anyway).  Writer retry loops treat it exactly
    like CommitConflict: re-read the fresh manifest, whose files are live.
    Observed in the wild as a ~1-in-10 flake of the two-concurrent-
    followers test: a base merge's delta inputs vanished under the racing
    follower's faster commit+compaction cadence."""
    s = repr(exc)
    return "FileNotFoundError" in s and "txn-" in s


class CDCPipeline:
    """End-to-end apply: events Dataset → exactly-once lake commit."""

    def __init__(self, lake_dir: str, num_partitions: int = 64,
                 epoch_specs: "dict[int, ColumnConfig] | None" = None,
                 stop_on_invalid: bool = False,
                 normalize_concurrency: "tuple[int, int] | int | None" = None,
                 auto_gc: bool = True, wire_encode: bool = False,
                 partition_mode: str = "turn",
                 salt_keys: "frozenset[str] | None" = None,
                 salt_factor: int = 8,
                 time_travel_retain: int = mf.DEFAULT_RETAIN_HISTORY,
                 dlq: bool = False,
                 auto_compact_deltas: "int | None" = None,
                 constraints: "tuple | list | None" = None,
                 max_delete_fraction: "float | None" = None):
        self.lake_dir = lake_dir
        self.num_partitions = num_partitions
        self.epoch_specs = epoch_specs
        self.stop_on_invalid = stop_on_invalid
        # dead-letter queue: quarantine bad events (invalid envelope /
        # unknown schema epoch / unparseable ts) into an append-only
        # ``dlq.parquet`` per txn instead of dropping or aborting; the
        # quarantine rides the SAME single shuffle (reserved pid) and the
        # same exactly-once commit.  At-least-once per event: quarantined
        # lsns never advance partition watermarks, so a replayed micro-batch
        # re-quarantines them until the global low-watermark passes them.
        if dlq and stop_on_invalid:
            raise ValueError("dlq and stop_on_invalid are contradictory "
                             "error policies")
        if dlq and wire_encode:
            raise ValueError("dlq keeps the original op string for forensic "
                             "fidelity; the int8 tombstone wire encoding "
                             "would destroy it — disable one of the two")
        self.dlq = dlq
        # actor-pool mode for the stateful parse stage: per-epoch parser
        # kernels compile once per actor (__init__/first batch) instead of
        # once per task closure — set e.g. (2, 8) to pin a pool
        self.normalize_concurrency = normalize_concurrency
        # bound disk across long micro-batch streams: after each commit,
        # remove txn files neither the new manifest nor any RETAINED history
        # snapshot references (time travel stays readable within the
        # time_travel_retain window; see state/manifest.py)
        self.auto_gc = auto_gc
        self.time_travel_retain = time_travel_retain
        self.wire_encode = wire_encode
        # "turn": pid = hash(conv_id, turn_idx) — skew-free by construction,
        #   but conversation lookups scan all partitions.
        # "conv": pid = hash(conv_id) — whole conversations co-located
        #   (read_conversation reads exactly one partition file); pair with
        #   detect_hot_keys + salting when the stream is conversation-skewed.
        if partition_mode not in ("turn", "conv"):
            raise ValueError(f"unknown partition_mode {partition_mode!r}")
        self.partition_mode = partition_mode
        # conv-mode hot conversations (from detect_hot_keys) sub-partition by
        # a turn-derived salt — stable per (conv, turn), so the merge stays
        # partition-local while the hot conv's traffic spreads
        self.salt_keys = salt_keys
        self.salt_factor = salt_factor
        # merge-on-read backlog bound: after a delta commit leaves any
        # partition with ≥ this many pending delta files, fold the whole
        # backlog (compact_deltas) before returning — read amplification
        # stays bounded without an external compaction cadence
        if auto_compact_deltas is not None and auto_compact_deltas < 1:
            raise ValueError("auto_compact_deltas must be ≥ 1")
        self.auto_compact_deltas = auto_compact_deltas
        # commit-time expectations (pipelines/constraints.py).  None =
        # adopt whatever the lake manifest has committed (constraints are
        # durable lake properties); an explicit tuple/list REPLACES the
        # committed set on the next apply (empty tuple drops them).
        self.constraints = None if constraints is None else tuple(constraints)
        # mass-delete circuit breaker: refuse a commit whose tombstone share
        # exceeds this fraction of applied events (None = off)
        if max_delete_fraction is not None \
                and not (0.0 < max_delete_fraction <= 1.0):
            raise ValueError("max_delete_fraction must be in (0, 1]")
        self.max_delete_fraction = max_delete_fraction
        # test seam: called between merge and commit (OCC interleaving tests)
        self._pre_commit_hook = None

    @classmethod
    def from_lake(cls, lake_dir: str, **kwargs) -> "CDCPipeline":
        """Open an EXISTING lake adopting its committed partition layout
        (num_partitions / partition_mode / salting) so maintenance jobs —
        compaction, stats, tailing, healing — never have to restate the
        layout flags the lake was created with (and can never get them
        wrong; a mismatch would trip check_manifest_compat anyway).
        ``kwargs`` pass through for the non-layout knobs (dlq, auto_gc,
        time_travel_retain, ...)."""
        committed = mf.read_manifest(lake_dir).get("partition_config")
        if not committed:
            raise ValueError(
                f"lake {lake_dir!r} has no committed manifest to adopt a "
                "partition layout from; construct CDCPipeline directly")
        salt = committed.get("salt_keys") or None
        return cls(lake_dir,
                   num_partitions=int(committed["num_partitions"]),
                   partition_mode=committed.get("partition_mode", "turn"),
                   salt_keys=frozenset(salt) if salt else None,
                   salt_factor=int(committed.get("salt_factor", 8)),
                   **kwargs)

    # ---------------------------------------------- partition-layout safety
    #
    # The lake layout is a pure function of (num_partitions, partition_mode,
    # salt config, hash algorithm).  Reopening a lake under ANY different
    # value silently corrupts state: new rows route to different pids than
    # their committed prior versions, so old versions are never superseded
    # and point lookups miss.  The first commit freezes the config in the
    # manifest; every later apply (both exchanges) and point-read validates.

    def partition_config(self) -> "dict":
        from embulk_filter_timestamp_format_ray.stages.partition import hash_algo_id

        return {
            "num_partitions": self.num_partitions,
            "partition_mode": self.partition_mode,
            "salt_keys": sorted(self.salt_keys) if self.salt_keys else [],
            "salt_factor": self.salt_factor,
            "hash_algo": hash_algo_id(),
        }

    def check_manifest_compat(self, manifest: "dict") -> None:
        if manifest.get("version", 0) == 0:
            return  # fresh lake — this pipeline's config becomes the layout
        committed = manifest.get("partition_config")
        if committed is None:
            # pre-config manifest: num_partitions was always recorded
            committed = {"num_partitions": manifest.get("num_partitions")}
        ours = self.partition_config()
        for key, want in committed.items():
            have = ours.get(key)
            if have != want:
                raise ValueError(
                    f"lake {self.lake_dir!r} was committed with {key}={want!r} "
                    f"but this pipeline is configured with {have!r}; refusing "
                    f"to merge under a different partition layout (would "
                    f"silently duplicate keys). Recreate the lake or match "
                    f"the committed config.")

    def effective_constraints(self, manifest: "dict") -> "tuple":
        """The constraint set this apply enforces: the pipeline's explicit
        list when given, else the lake's committed one (durability — a
        maintenance or tail job never has to restate the expectations the
        lake was created with)."""
        if self.constraints is not None:
            return self.constraints
        return constraints_from_manifest(manifest)

    def _check_delete_guard(self, rows) -> None:
        """Mass-delete circuit breaker: abort BEFORE the manifest swap when
        tombstones exceed ``max_delete_fraction`` of this commit's applied
        events — the classic CDC accident (an upstream TRUNCATE, a bad
        producer filter, a replayed erasure job) becomes a refused commit
        instead of an emptied lake; the staged txn files are orphaned and
        GC reclaims them.  Intentional purges: raise/clear the threshold on
        an explicit pipeline, or use ``delete_where`` (which bypasses the
        binlog entirely).

        Conversation tombstones are REPLICATED to every partition by
        design, so each erasure counts once per partition here — the guard
        is deliberately MORE sensitive to erasure storms than to row
        deletes."""
        if self.max_delete_fraction is None:
            return
        applied = dels = 0
        for r in rows:
            if int(r["pid"]) == DLQ_PID:
                continue
            applied += int(r["events_applied"])
            d = r["deletes_seen"] if "deletes_seen" in r else 0
            dels += int(d or 0)
        if applied and dels / applied > self.max_delete_fraction:
            raise MassDeleteError(
                f"refusing to commit to {self.lake_dir!r}: {dels}/{applied} "
                f"applied events are tombstones ({dels / applied:.1%} > "
                f"max_delete_fraction={self.max_delete_fraction}); raise "
                f"the threshold or purge via delete_where if intentional")

    def resume_lsn(self) -> int:
        """Global low-watermark: a binlog tailer can seek to `resume_lsn()+1`
        after a restart; anything at or below is guaranteed committed in
        every partition."""
        manifest = mf.read_manifest(self.lake_dir)
        return mf.min_watermark(manifest, self.num_partitions)

    def apply(self, events_ds, exchange: str = "dataset",
              max_commit_retries: int = 2) -> "dict":
        """Apply a change-event Dataset; returns commit stats.

        exchange="dataset" (default): Ray Data sort-shuffle groupby — spills
        via the object store, safe at any scale.  exchange="actor": raw-actor
        push exchange (pipelines/actor_exchange.py) — measured ~1.6x faster
        at low parallelism on this box, but buffers deltas in actor heaps
        (no spill), so it suits bounded micro-batches only.

        Concurrent writers (active-active tailers, failover overlap) are
        safe: the commit is optimistic (state/manifest.py CommitConflict) —
        on conflict the WHOLE apply retries against the fresh manifest, and
        the LSN watermarks prune whatever the winning writer already
        committed, so redundant applies of the same micro-batch converge to
        exactly-once (the loser commits a no-op txn)."""
        for attempt in range(max_commit_retries + 1):
            try:
                if exchange != "dataset":
                    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
                        apply_with_actor_exchange,
                    )

                    # exchange may be the string "actor" (ephemeral pool) or
                    # a persistent ActorExchange instance reused per commit
                    return apply_with_actor_exchange(
                        self, events_ds,
                        exchange=None if exchange == "actor" else exchange)
                return self._apply_dataset(events_ds)
            except Exception as e:
                if not isinstance(e, mf.CommitConflict) \
                        and not _vanished_txn_input(e):
                    raise
                if attempt == max_commit_retries:
                    raise
                logger.warning(
                    "concurrent commit beat us on %s; retrying apply "
                    "(%d/%d) — watermarks dedup the winner's events",
                    self.lake_dir, attempt + 1, max_commit_retries)

    def apply_delta(self, events_ds, exchange: str = "dataset",
                    max_commit_retries: int = 2) -> "dict":
        """Apply a change-event micro-batch as a DELTA commit (merge-on-read
        write path): per partition, only the micro-batch's per-key winners
        are written as an append-only delta file — the committed base
        parquet is NOT read or rewritten, so a micro-batch's write cost is
        ∝ the micro-batch, not ∝ lake state (the write-amplification
        tradeoff ``read_merged`` documents, made durable).

        Reads (``read_lake`` and everything built on it) transparently fold
        base+deltas per partition; ``compact_deltas()`` — or any later
        base-merge ``apply`` — folds the backlog back into base files.
        Exactly-once, watermark ratcheting, DLQ routing and optimistic
        concurrency are identical to ``apply`` (same normalize → partition
        → combine → single shuffle; only the per-partition writer differs).
        ``exchange="actor"`` pairs the delta writer with the raw-actor push
        exchange (ephemeral pool — pays per-commit actor spawn); passing a
        persistent ``ActorExchange`` instance reuses ONE pool across every
        commit of a micro-batch loop, which is the measured fast path for
        the tail steady state (BASELINE.md r4 A/B: 8×100k-event delta
        commits, pregenerated input: 4.19 s persistent-actor vs 6.21 s
        dataset — 1.48×, bit-identical lake state).  Same caveats as
        ``apply(exchange="actor")``: bounded micro-batches only (buffers
        live in actor heaps, no spill).
        """
        for attempt in range(max_commit_retries + 1):
            try:
                if exchange != "dataset":
                    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
                        apply_with_actor_exchange,
                    )

                    res = apply_with_actor_exchange(
                        self, events_ds, delta=True,
                        exchange=None if exchange == "actor" else exchange)
                else:
                    res = self._apply_dataset(events_ds, _delta=True)
                break
            except Exception as e:
                if not isinstance(e, mf.CommitConflict) \
                        and not _vanished_txn_input(e):
                    raise
                if attempt == max_commit_retries:
                    raise
                logger.warning(
                    "concurrent commit beat us on %s; retrying delta apply "
                    "(%d/%d) — watermarks dedup the winner's events",
                    self.lake_dir, attempt + 1, max_commit_retries)
        if self.auto_compact_deltas is not None:
            m = mf.read_manifest(self.lake_dir)
            worst = max((len(p.get("deltas", []))
                         for p in m["partitions"].values()), default=0)
            if worst >= self.auto_compact_deltas:
                res["auto_compacted"] = self.compact_deltas(
                    max_commit_retries=max_commit_retries)
        return res

    def _apply_dataset(self, events_ds, _reprocess: bool = False,
                       _delta: bool = False) -> "dict":
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        low = -1 if _reprocess else mf.min_watermark(manifest,
                                                     self.num_partitions)
        partition = PartitionStage(self.num_partitions,
                                   by_turn=(self.partition_mode == "turn"),
                                   salt_keys=self.salt_keys,
                                   salt_factor=self.salt_factor)
        txn_id = uuid.uuid4().hex[:12]
        partition_meta = {
            int(pid): meta for pid, meta in manifest["partitions"].items()
        }
        if _delta:
            applier = DeltaWriter(self.lake_dir, txn_id, partition_meta)
        else:
            applier = MergeApplier(self.lake_dir, txn_id, partition_meta,
                                   replay_filter=not _reprocess,
                                   cluster_by=cluster_spec_of(manifest),
                                   text_index=text_index_of(manifest))

        constraints = self.effective_constraints(manifest)
        norm_kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
        if self.normalize_concurrency is not None:
            ds = events_ds.map_batches(
                NormalizeStage,
                fn_constructor_kwargs=dict(
                    epoch_specs=self.epoch_specs, low_watermark=low,
                    stop_on_invalid=self.stop_on_invalid, dlq=self.dlq,
                    constraints=constraints),
                concurrency=self.normalize_concurrency, **norm_kwargs)
        else:
            normalize = NormalizeStage(self.epoch_specs, low_watermark=low,
                                       stop_on_invalid=self.stop_on_invalid,
                                       dlq=self.dlq,
                                       constraints=constraints)
            ds = events_ds.map_batches(normalize, **norm_kwargs)
        ds = ds.map_batches(make_partition_router(partition, self.dlq),
                            batch_format="pyarrow", zero_copy_batch=True)
        # map-side combine: shrink the all-to-all exchange to one row per
        # merge key per block before the shuffle
        ds = ds.map_batches(PreMergeCombiner(self.wire_encode),
                            batch_format="pyarrow", zero_copy_batch=True)

        def merge_partition(group: pa.Table) -> pa.Table:
            return applier(group)

        results = ds.groupby("_pid").map_groups(merge_partition, batch_format="pyarrow")
        rows = results.take_all()  # tiny: ≤ num_partitions manifest rows
        self._check_delete_guard(rows)

        # ---- driver-side atomic commit (write-then-manifest-swap)
        partitions = dict(manifest["partitions"])
        # reprocessing REPLACES the quarantine (the new txn's dlq file holds
        # exactly the still-bad remainder); normal applies append to it
        dlq_entries = [] if _reprocess else list(manifest.get("dlq", []))
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
            if _delta:
                # merge-on-read commit: base untouched, delta file appended,
                # watermark ratchets (pure-replay groups return no row at
                # all, so prev state simply persists for them); pending
                # deletion vectors CARRY — dropping them here would
                # resurrect dv-deleted rows on the next fold
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
                # base merge: deltas and dvs (if any) were folded into the
                # new base by MergeApplier, so both lists clear here
                partitions[pid] = {
                    "path": r["path"], "rows": int(r["rows"]),
                    "last_applied_lsn": int(r["last_applied_lsn"]),
                    "lineage": lineage[-16:],  # bounded lineage history
                }
            total_applied += int(r["events_applied"])
        oversized = [(p, m["rows"]) for p, m in partitions.items()
                     if m.get("rows", 0) > MergeApplier.GROUP_ROWS_WARN]
        if oversized:
            logger.warning(
                "%d partition(s) exceed %d rows (worst: pid=%s with %d) — "
                "run repartition_lake(new_num_partitions) to re-bound "
                "per-task merge state", len(oversized),
                MergeApplier.GROUP_ROWS_WARN,
                *max(oversized, key=lambda t: t[1]))
        new_manifest = {
            "version": manifest["version"] + 1,
            "partitions": partitions,
            "num_partitions": self.num_partitions,
            "partition_config": self.partition_config(),
            "last_txn": txn_id,
            # widen-only schema union: prior extras + whatever evolved
            # columns this commit's merge tasks reported writing
            **merge_schema_entries(manifest, [
                r.get("schema_ipc") or "" for r in rows
                if int(r["pid"]) != DLQ_PID]),
        }
        if dlq_entries:
            new_manifest["dlq"] = dlq_entries
        # expectations are durable lake properties: record the enforced set
        # (an explicit pipeline list replaces the committed one; empty drops)
        if constraints:
            new_manifest["constraints"] = [c.to_json() for c in constraints]
        carry_lsn_ceiling(manifest, new_manifest)
        carry_cluster_by(manifest, new_manifest)
        if self._pre_commit_hook is not None:
            self._pre_commit_hook()  # test seam: interleave a competing commit
        mf.commit_manifest(self.lake_dir, new_manifest,
                           retain_history=self.time_travel_retain,
                           expected_version=manifest["version"])
        if self.auto_gc:
            mf.gc_orphan_txns(self.lake_dir, keep_txns={txn_id})
        return {
            "txn": txn_id, "version": new_manifest["version"],
            "partitions_touched": len(rows) - (1 if quarantined else 0),
            "events_applied": total_applied,
            "events_quarantined": quarantined,
        }

    def repartition_lake(self, new_num_partitions: int,
                         salt_keys: "frozenset[str] | None" = None,
                         salt_factor: "int | None" = None) -> "dict":
        """Split/compact: rewrite the committed lake under a new partition
        count (and optionally a new salt config) — the escape hatch when a
        partition's state outgrows a single merge task (GROUP_ROWS_WARN).

        Fully distributed: streaming lake read → PartitionStage(new P) → one
        groupby shuffle → per-partition sorted parquet written on workers;
        the driver sees only ≤ new_P manifest rows.  Commits a new manifest
        whose partition_config records the new layout, so the frozen-layout
        validation keeps protecting subsequent applies.  Watermarks reset to
        the old global low-watermark (safe: the merge is idempotent for
        replayed events at/below it)."""
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        low = mf.min_watermark(manifest, self.num_partitions)
        txn_id = uuid.uuid4().hex[:12]
        new_salt = self.salt_keys if salt_keys is None else salt_keys
        new_sf = self.salt_factor if salt_factor is None else salt_factor
        stage = PartitionStage(new_num_partitions,
                               by_turn=(self.partition_mode == "turn"),
                               salt_keys=new_salt, salt_factor=new_sf)
        lake_dir = self.lake_dir
        cluster = cluster_spec_of(manifest)
        token_col = text_index_of(manifest)

        def write_partition(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return MergeApplier._result(None)
            pid = int(group.column("_pid")[0].as_py())
            state = group.drop_columns(["_pid"])
            rel = os.path.join(f"txn-{txn_id}", f"part-{pid:05d}.parquet")
            full = os.path.join(lake_dir, rel)
            state = write_base_file(state, full, cluster,
                                    token_col=token_col)
            return MergeApplier._result({
                "pid": pid, "path": rel, "rows": state.num_rows,
                "last_applied_lsn": low, "events_applied": 0,
                "events_seen": group.num_rows,
                "schema_ipc": extras_schema_b64(state),
            })

        ds = self.read_lake().map_batches(stage, batch_format="pyarrow",
                                          zero_copy_batch=True)
        rows = ds.groupby("_pid").map_groups(
            write_partition, batch_format="pyarrow").take_all()

        partitions = {
            str(pid): {"path": None, "rows": 0, "last_applied_lsn": low,
                       "lineage": [{"txn": txn_id, "events_applied": 0}]}
            for pid in range(new_num_partitions)
        }
        for r in rows:
            partitions[str(r["pid"])].update(
                path=r["path"], rows=int(r["rows"]))
        # adopt the new layout BEFORE building partition_config
        self.num_partitions = new_num_partitions
        self.salt_keys = new_salt
        self.salt_factor = new_sf
        new_manifest = {
            "version": manifest["version"] + 1,
            "partitions": partitions,
            "num_partitions": new_num_partitions,
            "partition_config": self.partition_config(),
            "last_txn": txn_id,
            # the rewrite reads through read_lake (padded), so every new
            # file carries the full evolved schema; the union keeps prior
            # extras even for partitions that came back empty
            **merge_schema_entries(manifest, [
                r.get("schema_ipc") or "" for r in rows]),
        }
        if manifest.get("dlq"):
            # quarantine files are layout-independent (append-only, never
            # keyed) — carry them across the repartition untouched
            new_manifest["dlq"] = manifest["dlq"]
        carry_constraints(manifest, new_manifest)
        # Watermarks reset to the global LOW (the only sound value — a new
        # partition mixes keys from old partitions with different
        # watermarks), but the rows legitimately carry lsns up to the old
        # global HIGH.  Record that ceiling so fsck's torn-commit check
        # (max lsn ≤ watermark) doesn't flag a correct repartition; writers
        # carry it forward until every watermark ratchets past it.
        ceiling = max((int(p.get("last_applied_lsn", -1))
                       for p in manifest["partitions"].values()),
                      default=-1)
        ceiling = max(ceiling, int(manifest.get("lsn_ceiling", -1)))
        if ceiling > low:
            new_manifest["lsn_ceiling"] = ceiling
        # OCC: a writer that committed mid-repartition invalidates the
        # rewrite (it rewrote the OLD layout's files) — surface the conflict
        mf.commit_manifest(self.lake_dir, new_manifest,
                           retain_history=self.time_travel_retain,
                           expected_version=manifest["version"])
        if self.auto_gc:
            mf.gc_orphan_txns(self.lake_dir, keep_txns={txn_id})
        return {"txn": txn_id, "version": new_manifest["version"],
                "num_partitions": new_num_partitions,
                "rows": sum(int(r["rows"]) for r in rows)}

    def recommended_partitions(self, target_rows_per_partition: int,
                               min_partitions: int = 1,
                               max_partitions: int = 65536) -> "dict":
        """Manifest-only partition-count recommendation (O(partitions)
        driver work): live rows = base + pending-delta rows, recommended
        P = ceil(rows / target) clamped to [min, max].  Pure calculation;
        ``maybe_repartition`` is the opt-in actuator."""
        if target_rows_per_partition <= 0:
            raise ValueError("target_rows_per_partition must be positive")
        stats = self.table_stats()
        rows = int(stats["rows"]) + int(stats["delta_rows"])
        rec = max(min_partitions,
                  min(max_partitions,
                      -(-rows // target_rows_per_partition) or 1))
        current = int(stats["partitions"]) or self.num_partitions
        mean = rows / current if current else 0.0
        return {"rows": rows, "current_partitions": current,
                "rows_per_partition": round(mean, 1),
                "target_rows_per_partition": int(target_rows_per_partition),
                "recommended_partitions": int(rec),
                "row_skew": stats["row_skew"]}

    def maybe_repartition(self, target_rows_per_partition: int,
                          drift_factor: float = 2.0,
                          min_partitions: int = 1,
                          max_partitions: int = 65536) -> "dict":
        """Opt-in auto-repartition policy: when the mean rows/partition
        drifts beyond ``drift_factor`` of the target in EITHER direction
        (growth past a single merge task's comfort, or over-sharding after
        retention/erasure sweeps), run ONE ``repartition_lake`` to the
        recommended count.  Within the band it is a manifest-only no-op —
        safe to call from a maintenance loop after every N commits.

        The hysteresis band (not `!= current`) is the point: without it a
        lake sitting near a boundary would thrash rewrite-the-world on
        every call.  drift_factor must be > 1."""
        if drift_factor <= 1.0:
            raise ValueError("drift_factor must exceed 1.0 (the hysteresis "
                             "band)")
        rec = self.recommended_partitions(target_rows_per_partition,
                                          min_partitions, max_partitions)
        mean = rec["rows_per_partition"]
        lo = target_rows_per_partition / drift_factor
        hi = target_rows_per_partition * drift_factor
        if (lo <= mean <= hi) or \
                rec["recommended_partitions"] == rec["current_partitions"]:
            return {**rec, "repartitioned": False}
        res = self.repartition_lake(rec["recommended_partitions"])
        return {**rec, "repartitioned": True, "result": res}

    def compact_deltas(self, max_commit_retries: int = 2) -> "dict":
        """Fold every partition's pending delta files back into its base
        parquet (the compaction half of the merge-on-read contract): one
        distributed fold+rewrite task per backlogged partition — untouched
        partitions keep their files — then one atomic manifest commit that
        clears the folded delta lists.  Watermarks are unchanged (the
        deltas were already committed state).  Idempotent and exactly-once
        like every other commit; concurrent writers surface as
        ``CommitConflict`` and the compaction retries against the fresh
        manifest."""
        import ray.data

        for attempt in range(max_commit_retries + 1):
            manifest = mf.read_manifest(self.lake_dir)
            self.check_manifest_compat(manifest)
            todo = {pid: p for pid, p in manifest["partitions"].items()
                    if p.get("deltas") or p.get("dvs")}
            if not todo:
                return {"version": manifest.get("version", 0),
                        "partitions_compacted": 0, "delta_files_folded": 0,
                        "dv_files_folded": 0}
            txn_id = uuid.uuid4().hex[:12]
            lake_dir = self.lake_dir
            cluster = cluster_spec_of(manifest)
            token_col = text_index_of(manifest)
            items = [{"pid": int(pid), "base": p.get("path") or "",
                      "deltas": [d["path"] for d in p.get("deltas", [])],
                      "dvs": [d["path"] for d in p.get("dvs", [])]}
                     for pid, p in todo.items()]

            def compact_part(batch: pa.Table) -> pa.Table:
                outs = []
                for row in batch.to_pylist():  # metadata-tier loop (≤P rows)
                    base = pq.read_table(
                        os.path.join(lake_dir, row["base"])) \
                        if row["base"] else None
                    deltas = [pq.read_table(os.path.join(lake_dir, d))
                              for d in row["deltas"]]
                    dvs = [pq.read_table(os.path.join(lake_dir, d))
                           for d in row["dvs"]]
                    state = fold_partition_state(base, deltas, dvs=dvs)
                    rel = ""
                    if state.num_rows:
                        rel = os.path.join(f"txn-{txn_id}",
                                           f"part-{row['pid']:05d}.parquet")
                        full = os.path.join(lake_dir, rel)
                        state = write_base_file(state, full, cluster,
                                                token_col=token_col)
                    outs.append({"pid": row["pid"], "path": rel,
                                 "rows": state.num_rows})
                return pa.Table.from_pylist(outs, schema=pa.schema([
                    ("pid", pa.int64()), ("path", pa.string()),
                    ("rows", pa.int64())]))

            try:
                rows = _meta_items_dataset(items).map_batches(
                    compact_part, batch_format="pyarrow",
                    zero_copy_batch=True).take_all()
            except Exception as e:
                # a concurrent commit + GC can collect our delta inputs
                # mid-fold — a CommitConflict observed at read time
                if attempt == max_commit_retries or not _vanished_txn_input(e):
                    raise
                logger.warning(
                    "compaction inputs on %s vanished under a concurrent "
                    "commit; retrying against the fresh manifest (%d/%d)",
                    self.lake_dir, attempt + 1, max_commit_retries)
                continue
            partitions = dict(manifest["partitions"])
            folded_files = sum(len(p.get("deltas", []))
                               for p in todo.values())
            folded_dvs = sum(len(p.get("dvs", [])) for p in todo.values())
            for r in rows:
                pid = str(r["pid"])
                prev = partitions[pid]
                lineage = list(prev.get("lineage", []))
                lineage.append({"txn": txn_id, "events_applied": 0,
                                "compaction": True})
                partitions[pid] = {
                    "path": r["path"] or None, "rows": int(r["rows"]),
                    "last_applied_lsn": int(prev.get("last_applied_lsn", -1)),
                    "lineage": lineage[-16:],
                }
            new_manifest = {
                "version": manifest["version"] + 1,
                "partitions": partitions,
                "num_partitions": self.num_partitions,
                "partition_config": self.partition_config(),
                "last_txn": txn_id,
                # compaction folds committed state only — the schema is
                # carried unchanged (folded columns ⊆ committed schema)
                **schema_entries_of(manifest),
            }
            if manifest.get("dlq"):
                new_manifest["dlq"] = manifest["dlq"]
            carry_constraints(manifest, new_manifest)
            carry_lsn_ceiling(manifest, new_manifest)
            carry_cluster_by(manifest, new_manifest)
            if self._pre_commit_hook is not None:
                self._pre_commit_hook()  # test seam: interleave a commit
            try:
                mf.commit_manifest(self.lake_dir, new_manifest,
                                   retain_history=self.time_travel_retain,
                                   expected_version=manifest["version"])
            except mf.CommitConflict:
                if attempt == max_commit_retries:
                    raise
                logger.warning(
                    "concurrent commit during compaction on %s; retrying "
                    "against the fresh manifest (%d/%d)",
                    self.lake_dir, attempt + 1, max_commit_retries)
                continue
            if self.auto_gc:
                mf.gc_orphan_txns(self.lake_dir, keep_txns={txn_id})
            return {"txn": txn_id, "version": new_manifest["version"],
                    "partitions_compacted": len(rows),
                    "delta_files_folded": folded_files,
                    "dv_files_folded": folded_dvs}

    def transform_lake(self, fn, max_commit_retries: int = 2) -> "dict":
        """Distributed UPDATE / backfill: rewrite every partition's LIVE
        state through ``fn`` (Arrow table → Arrow table) as ONE
        exactly-once commit — the lake-maintenance tier a SQL ``UPDATE``
        or a Delta-style backfill job maps to (e.g. fill a
        schema-evolved column's NULLs, derive a new column from existing
        data, re-render a value column).

        * Fully distributed: one fold→fn→rewrite task per partition with
          data; untouched partitions keep their files; the driver commits
          ≤P manifest rows.
        * The commit CLEARS each rewritten partition's delta list (the
          fold already folded them — a transform is also a compaction by
          construction) and leaves every watermark unchanged: no binlog
          events were applied, so replay/resume semantics are untouched.
        * ``fn`` contract (checked per partition; a violation raises and
          NOTHING commits): the returned table must carry the SAME
          (conv_id, turn_idx, lsn) rows — same count, same key multiset —
          because changing keys would break hash routing and changing
          lsns would corrupt replay arbitration.  Value columns may
          change freely and NEW columns may be added; added columns widen
          the committed schema exactly like evolved event columns
          (merge_schema_entries), so a backfill can INTRODUCE a column.
        * Time travel: the pre-transform version stays readable within
          ``time_travel_retain``; ``rollback`` undoes a bad transform.
        """
        def checked(state: pa.Table, pid: int) -> pa.Table:
            out = fn(state)
            _check_transform_contract(state, out, pid)
            return out

        res = self._rewrite_lake(checked, "transform",
                                 max_commit_retries=max_commit_retries)
        if res is None:
            return {"version": mf.read_manifest(self.lake_dir)
                    .get("version", 0),
                    "partitions_transformed": 0, "rows": 0}
        return {"txn": res["txn"], "version": res["version"],
                "partitions_transformed": res["partitions"],
                "rows": res["rows"]}

    def set_clustering(self, columns, mode: str = "lex",
                       max_commit_retries: int = 2) -> "dict":
        """Durable base-file clustering (the role of Delta's OPTIMIZE
        ZORDER, but as a COMMITTED layout property instead of a decaying
        maintenance pass): record ``cluster_by`` in the manifest and
        rewrite every partition's base in (cluster columns, merge-key
        tiebreak) order as ONE exactly-once commit.  From then on EVERY
        base writer — merge, compaction, repartition, transform, both
        exchanges, fan-out — emits that order, so the layout never decays
        under new commits and row-group zone maps stay selective for the
        clustered columns: a ts-clustered lake answers
        ``read_lake(where=[ts band])`` opening only overlapping row
        groups.  Tradeoff: conv_id row-group stats widen, so point-lookup
        pruning (``read_conversation``) degrades to partition-level —
        cluster analytics-heavy lakes, not point-lookup-heavy ones.

        ``mode="zorder"``: multi-column interleaved Z-order instead of
        lexicographic — each column is rank-quantized to 16 bits within
        bounds FROZEN from the lake's parquet footer stats at set time
        (re-deriving them later would silently re-place every file's
        rows — the frozen-centroid rule), then bit-interleaved, so zone
        maps stay selective for EVERY clustered column, not just the
        first.  Numeric / timestamp columns only; later values outside
        the frozen bounds clamp (the order stays total, tail buckets
        saturate — re-run set_clustering to re-freeze).

        ``columns=()`` clears the property and restores merge-key order
        (also a full rewrite).  Pure reorder: watermarks, row counts and
        live state are unchanged; time travel to the pre-cluster version
        still reads, rollback restores the old layout property with the
        snapshot.  Empty lake: the property commits metadata-only and the
        first apply writes clustered bases directly (lex only — zorder
        needs data to freeze bounds)."""
        cols = tuple(columns or ())
        if any(not isinstance(c, str) for c in cols):
            raise ValueError("cluster_by must be column names")
        if mode not in ("lex", "zorder"):
            raise ValueError(f"unknown clustering mode {mode!r}; "
                             "use 'lex' or 'zorder'")
        if mode == "zorder" and not (1 <= len(cols) <= 4):
            raise ValueError("zorder takes 1-4 columns (16 bits each "
                             "interleaved into a uint64 key)")
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        known = manifest_schema_columns(manifest)
        bad = [c for c in cols if c not in known]
        if bad:
            raise ValueError(f"unknown cluster column(s) {bad}; "
                             f"lake schema is {known}")
        extra: "dict" = {"cluster_by": list(cols), "cluster_mode": "",
                         "cluster_bounds": ""}
        override = cols or None
        if cols and mode == "zorder":
            types = _manifest_types(manifest)
            bad_t = [c for c in cols
                     if not (pa.types.is_integer(types[c])
                             or pa.types.is_floating(types[c])
                             or pa.types.is_timestamp(types[c]))]
            if bad_t:
                raise ValueError(
                    f"zorder columns must be numeric or timestamp; "
                    f"{bad_t} are {[str(types[c]) for c in bad_t]}")
            files = [p for part in manifest["partitions"].values()
                     for p in [part.get("path"),
                               *[d["path"] for d in part.get("deltas", [])]]
                     if p]
            if not files:
                raise ValueError("zorder needs committed data to freeze "
                                 "its quantization bounds; apply first")
            ranges = _footer_ranges(self.lake_dir, files, list(cols))
            bounds: "dict[str, list]" = {}
            for c in cols:
                rng = ranges.get(c)
                if not rng:
                    raise ValueError(
                        f"column {c!r} has no usable footer statistics "
                        f"to freeze zorder bounds (range={rng!r})")
                bounds[c] = [_zorder_bound_f64(rng[0]),
                             _zorder_bound_f64(rng[1])]
            extra = {"cluster_by": list(cols), "cluster_mode": "zorder",
                     "cluster_bounds": bounds}
            override = {"columns": list(cols), "mode": "zorder",
                        "bounds": {c: (b[0], b[1])
                                   for c, b in bounds.items()}}
        res = self._rewrite_lake(
            lambda state, pid: state, "cluster",
            max_commit_retries=max_commit_retries,
            cluster_override=override,
            manifest_extra=extra)
        if res is None:
            # no data yet: record the layout property metadata-only; the
            # first apply's MergeApplier adopts it from the manifest
            new_manifest = {
                "version": manifest["version"] + 1,
                "partitions": dict(manifest.get("partitions", {})),
                "num_partitions": self.num_partitions,
                "partition_config": self.partition_config(),
                "last_txn": manifest.get("last_txn"),
                **schema_entries_of(manifest),
            }
            if manifest.get("dlq"):
                new_manifest["dlq"] = manifest["dlq"]
            carry_constraints(manifest, new_manifest)
            carry_lsn_ceiling(manifest, new_manifest)
            if manifest.get("text_index"):
                new_manifest["text_index"] = manifest["text_index"]
            if cols:
                new_manifest["cluster_by"] = list(cols)
            mf.commit_manifest(self.lake_dir, new_manifest,
                               retain_history=self.time_travel_retain,
                               expected_version=manifest["version"])
            return {"txn": None, "version": new_manifest["version"],
                    "partitions": 0, "rows": 0,
                    "cluster_by": list(cols)}
        return {"txn": res["txn"], "version": res["version"],
                "partitions": res["partitions"], "rows": res["rows"],
                "cluster_by": list(cols)}

    def set_text_index(self, column: "str | None",
                       max_commit_retries: int = 2) -> "dict":
        """Durable token skip index (the role of a ClickHouse ``tokenbf``
        data-skipping index, as a COMMITTED layout property): every later
        base writer drops a per-row-group Bloom sidecar of ``column``'s
        distinct split-on-space tokens beside the parquet, and
        ``read_lake(where=[Constraint(kind='has_token')])`` reads only the
        row groups whose sidecar admits every AND'd token — min/max zone
        maps can never prune token membership, so without the index a
        token search scans every text byte.

        Setting the property is ONE exactly-once whole-lake rewrite (the
        same machinery as set_clustering) so existing bases gain sidecars
        immediately; ``column=None`` clears it (pure metadata — stale
        ``.tokens`` files beside old bases are simply never consulted and
        GC with their txn dirs).  Composes with clustering: the two
        sidecars are independent files.  Empty lake: metadata-only commit
        adopted by the first apply."""
        if column is not None and not isinstance(column, str):
            raise ValueError("text_index column must be a column name or "
                             "None")
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        if column:
            types = _manifest_types(manifest)
            known = manifest_schema_columns(manifest)
            if known and column not in types:
                raise ValueError(f"unknown text_index column {column!r}; "
                                 f"lake schema is {known}")
            if known and not pa.types.is_string(types[column]):
                raise ValueError(
                    f"text_index column must be a string column; "
                    f"{column!r} is {types[column]}")
        res = self._rewrite_lake(
            lambda state, pid: state, "textindex",
            max_commit_retries=max_commit_retries,
            text_override=(column or None),
            manifest_extra={"text_index": column or ""})
        if res is None:
            # no data yet: record the property metadata-only; the first
            # apply's MergeApplier adopts it from the manifest
            new_manifest = {
                "version": manifest["version"] + 1,
                "partitions": dict(manifest.get("partitions", {})),
                "num_partitions": self.num_partitions,
                "partition_config": self.partition_config(),
                "last_txn": manifest.get("last_txn"),
                **schema_entries_of(manifest),
            }
            if manifest.get("dlq"):
                new_manifest["dlq"] = manifest["dlq"]
            carry_constraints(manifest, new_manifest)
            carry_lsn_ceiling(manifest, new_manifest)
            carry_cluster_by(manifest, new_manifest)
            if column:
                new_manifest["text_index"] = column
            else:
                new_manifest.pop("text_index", None)
            mf.commit_manifest(self.lake_dir, new_manifest,
                               retain_history=self.time_travel_retain,
                               expected_version=manifest["version"])
            return {"txn": None, "version": new_manifest["version"],
                    "partitions": 0, "rows": 0,
                    "text_index": column or ""}
        return {"txn": res["txn"], "version": res["version"],
                "partitions": res["partitions"], "rows": res["rows"],
                "text_index": column or ""}

    def delete_where(self, predicate, max_commit_retries: int = 2,
                     mode: str = "rewrite",
                     prune: "list | None" = None) -> "dict":
        """Distributed DELETE WHERE (retention / TTL / row-level erasure):
        remove every live row ``predicate`` selects, as ONE exactly-once
        commit — the generalization of the conversation tombstone to
        arbitrary predicates (SQL ``DELETE WHERE``; the retention job that
        drops rows past their TTL on a 100-TB lake).

        ``predicate``: Arrow table (one partition's FOLDED live state) →
        boolean mask (numpy or pyarrow, True = delete).  Evaluated
        distributed, one fold→filter task per partition with data.

        ``mode='rewrite'`` (default) rewrites each affected partition's
        survivors; ``mode='dv'`` writes a DELETION VECTOR instead — a small
        (conv_id, turn_idx, lsn) key file the folds subtract at read time —
        so the commit cost is ∝ deleted rows, not partition size (the
        Delta-deletion-vector cost model; the next base merge / compaction
        of the partition folds it away).  Final state is identical across
        modes.

        ``prune``: optional list of :class:`~..pipelines.constraints.
        Constraint` specs (OR'd, normally the ones the predicate was built
        from) — partitions whose parquet footer min/max statistics prove no
        row can match are SKIPPED without reading a data byte (file-skipping
        for deletes; at 100 TB a time-correlated TTL sweep then touches only
        the old partitions).

        Semantics (both modes):

        * survivors are byte-identical — only removal; value edits go
          through ``transform_lake``, inserts through the binlog;
        * watermarks unchanged (no binlog events applied); rewritten
          partitions' delta backlogs fold and clear (a rewrite-mode
          delete_where is also a compaction by construction; dv mode
          leaves the backlog in place and subtracts at fold);
        * NO tombstones are written: a deleted key is simply absent (a dv
          entry pins the victim's lsn, so only rows at or below it drop),
          and a LATER event (lsn above the watermark) legitimately
          re-inserts it, while replays at or below the watermark stay
          pruned as always.  Use conversation tombstones (``delete_conv``)
          when later replays of the key must stay dead (GDPR erasure);
        * the change feed (fold diff between versions) reports the removed
          rows as deletes; the pre-delete version stays time-travel
          readable within ``time_travel_retain`` and ``rollback`` restores
          it (retention + time travel interact exactly as in Delta: the
          rows are gone from HEAD, not from retained history).
        """
        if mode not in ("rewrite", "dv"):
            raise ValueError(f"delete_where mode must be 'rewrite' or "
                             f"'dv', not {mode!r}")
        if mode == "dv":
            return self._delete_where_dv(predicate, prune=prune,
                                         max_commit_retries=max_commit_retries)

        def drop(state: pa.Table, pid: int) -> pa.Table:
            mask = _delete_mask(predicate, state, pid)
            return state.filter(pa.array(~mask))

        res = self._rewrite_lake(drop, "delete",
                                 max_commit_retries=max_commit_retries,
                                 prune=prune, skip_unchanged=True)
        if res is None:
            return {"version": mf.read_manifest(self.lake_dir)
                    .get("version", 0),
                    "partitions_rewritten": 0, "rows": 0, "rows_deleted": 0,
                    "partitions_skipped": 0}
        return {"txn": res["txn"], "version": res["version"],
                "partitions_rewritten": res["partitions"],
                "rows": res["rows"],
                "rows_deleted": res["rows_before"] - res["rows"],
                "partitions_skipped": res.get("skipped", 0)}

    def _delete_where_dv(self, predicate, prune=None,
                         max_commit_retries: int = 2) -> "dict":
        """delete_where's merge-on-read tier: write per-partition deletion
        vectors instead of rewriting survivors (see :meth:`delete_where`).
        One fold→mask→write-keys task per non-pruned partition, ONE OCC
        manifest commit appending each affected partition's ``dvs`` entry.
        Zero matches lake-wide → nothing commits, version unchanged."""
        import ray.data

        for attempt in range(max_commit_retries + 1):
            manifest = mf.read_manifest(self.lake_dir)
            self.check_manifest_compat(manifest)
            todo = {pid: p for pid, p in manifest["partitions"].items()
                    if p.get("path") or p.get("deltas")}
            version = int(manifest.get("version", 0))
            if not todo:
                return {"version": version, "partitions_deleted": 0,
                        "rows_deleted": 0, "partitions_skipped": 0}
            txn_id = uuid.uuid4().hex[:12]
            lake_dir = self.lake_dir
            types = _manifest_types(manifest)
            items = [{"pid": int(pid), "base": p.get("path") or "",
                      "deltas": [d["path"] for d in p.get("deltas", [])],
                      "dvs": [d["path"] for d in p.get("dvs", [])]}
                     for pid, p in todo.items()]

            def dv_part(batch: pa.Table) -> pa.Table:
                outs = []
                for row in batch.to_pylist():  # metadata tier (≤P rows)
                    files = [p for p in [row["base"], *row["deltas"]] if p]
                    if prune is not None and not _prune_possible(
                            prune, _footer_ranges(lake_dir, files, [
                                c.column for c in prune])):
                        outs.append({"pid": row["pid"], "path": "",
                                     "rows": 0, "skipped": True})
                        continue
                    base = pq.read_table(
                        os.path.join(lake_dir, row["base"])) \
                        if row["base"] else None
                    deltas = [pq.read_table(os.path.join(lake_dir, d))
                              for d in row["deltas"]]
                    dvs = [pq.read_table(os.path.join(lake_dir, d))
                           for d in row["dvs"]]
                    state = fold_partition_state(base, deltas, types=types,
                                                 dvs=dvs)
                    mask = _delete_mask(predicate, state, row["pid"])
                    n = int(mask.sum())
                    rel = ""
                    if n:
                        # the dv records the FOLDED victim's lsn: the fold
                        # pre-filter drops exactly rows at (key, lsn ≤ dv
                        # lsn), so a later event still re-inserts the key
                        keys = state.filter(pa.array(mask)).select(
                            ["conv_id", "turn_idx", "lsn"])
                        keys = sort_by_merge_key(keys)
                        rel = os.path.join(
                            f"txn-{txn_id}",
                            f"dv-{row['pid']:05d}.parquet")
                        full = os.path.join(lake_dir, rel)
                        os.makedirs(os.path.dirname(full), exist_ok=True)
                        pq.write_table(keys, full, compression="zstd",
                                       row_group_size=LAKE_ROW_GROUP_ROWS)
                    outs.append({"pid": row["pid"], "path": rel,
                                 "rows": n, "skipped": False})
                return pa.Table.from_pylist(outs, schema=pa.schema([
                    ("pid", pa.int64()), ("path", pa.string()),
                    ("rows", pa.int64()), ("skipped", pa.bool_())]))

            try:
                rows = _meta_items_dataset(items).map_batches(
                    dv_part, batch_format="pyarrow",
                    zero_copy_batch=True).take_all()
            except Exception as e:
                if attempt == max_commit_retries or not _vanished_txn_input(e):
                    raise
                logger.warning(
                    "dv-delete inputs on %s vanished under a concurrent "
                    "commit; retrying against the fresh manifest (%d/%d)",
                    lake_dir, attempt + 1, max_commit_retries)
                continue
            skipped = sum(1 for r in rows if r["skipped"])
            hits = [r for r in rows if r["path"]]
            if not hits:
                # nothing matched anywhere: commit nothing (idempotent)
                return {"version": version, "partitions_deleted": 0,
                        "rows_deleted": 0, "partitions_skipped": skipped}
            partitions = dict(manifest["partitions"])
            for r in hits:
                pid = str(r["pid"])
                prev = partitions[pid]
                lineage = list(prev.get("lineage", []))
                lineage.append({"txn": txn_id, "events_applied": 0,
                                "delete_dv": True})
                entry = dict(prev)
                entry["dvs"] = [*prev.get("dvs", []),
                                {"txn": txn_id, "path": r["path"],
                                 "rows": int(r["rows"])}]
                entry["lineage"] = lineage[-16:]
                partitions[pid] = entry
            new_manifest = {
                "version": version + 1,
                "partitions": partitions,
                "num_partitions": self.num_partitions,
                "partition_config": self.partition_config(),
                "last_txn": txn_id,
                # a dv never changes the schema
                **schema_entries_of(manifest),
            }
            if manifest.get("dlq"):
                new_manifest["dlq"] = manifest["dlq"]
            carry_constraints(manifest, new_manifest)
            carry_lsn_ceiling(manifest, new_manifest)
            carry_cluster_by(manifest, new_manifest)
            if self._pre_commit_hook is not None:
                self._pre_commit_hook()  # test seam
            try:
                mf.commit_manifest(self.lake_dir, new_manifest,
                                   retain_history=self.time_travel_retain,
                                   expected_version=version)
            except mf.CommitConflict:
                if attempt == max_commit_retries:
                    raise
                logger.warning(
                    "concurrent commit during dv-delete on %s; retrying "
                    "against the fresh manifest (%d/%d)",
                    lake_dir, attempt + 1, max_commit_retries)
                continue
            if self.auto_gc:
                mf.gc_orphan_txns(self.lake_dir, keep_txns={txn_id})
            return {"txn": txn_id, "version": new_manifest["version"],
                    "partitions_deleted": len(hits),
                    "rows_deleted": sum(int(r["rows"]) for r in hits),
                    "partitions_skipped": skipped}

    #: sentinel: _rewrite_lake adopts the manifest's committed cluster_by
    _ADOPT_CLUSTER = object()
    _ADOPT_TEXT = object()

    def _rewrite_lake(self, state_fn, lineage_flag: str,
                      max_commit_retries: int = 2,
                      prune=None, skip_unchanged: bool = False,
                      cluster_override=_ADOPT_CLUSTER,
                      text_override=_ADOPT_TEXT,
                      manifest_extra: "dict | None" = None) -> "dict | None":
        """Shared machinery for the maintenance ops that rewrite live
        state in place (``transform_lake`` / ``delete_where``): one
        fold→``state_fn(state, pid)``→rewrite task per partition with
        data, then ONE OCC manifest commit that clears the folded delta
        lists and leaves watermarks unchanged.  Returns None when the lake
        has no data, else ``{txn, version, partitions, rows, rows_before,
        skipped}``.  Retries the whole pass when a concurrent commit + GC
        collects the fold inputs mid-rewrite, or when the commit loses the
        OCC race.

        ``prune``: OR'd Constraint list — partitions whose parquet footer
        stats prove no row can match are skipped UNREAD (delete_where
        only).  ``skip_unchanged``: leave a partition untouched when
        ``state_fn`` returned the same row count AND it had no pending
        deltas/dvs to fold — sound only for pure row-removal
        (delete_where), where an equal count implies an identical table; a
        transform may edit values count-free.

        ``cluster_override``: base-file sort order for the rewrite —
        defaults to adopting the manifest's committed ``cluster_by``
        (set_clustering passes the NEW order it is committing).
        ``manifest_extra``: extra top-level keys merged into the committed
        manifest (set_clustering records/clears ``cluster_by`` here, in
        the SAME atomic commit as the rewrite)."""
        import ray.data

        for attempt in range(max_commit_retries + 1):
            manifest = mf.read_manifest(self.lake_dir)
            self.check_manifest_compat(manifest)
            todo = {pid: p for pid, p in manifest["partitions"].items()
                    if p.get("path") or p.get("deltas")}
            if not todo:
                return None
            txn_id = uuid.uuid4().hex[:12]
            lake_dir = self.lake_dir
            types = _manifest_types(manifest)
            cluster = (cluster_spec_of(manifest)
                       if cluster_override is self._ADOPT_CLUSTER
                       else cluster_override)
            token_col = (text_index_of(manifest)
                         if text_override is self._ADOPT_TEXT
                         else text_override)
            items = [{"pid": int(pid), "base": p.get("path") or "",
                      "deltas": [d["path"] for d in p.get("deltas", [])],
                      "dvs": [d["path"] for d in p.get("dvs", [])]}
                     for pid, p in todo.items()]

            def rewrite_part(batch: pa.Table) -> pa.Table:
                outs = []
                skip_row = {"path": "", "rows": 0, "rows_before": 0,
                            "schema_ipc": "", "skipped": True}
                for row in batch.to_pylist():  # metadata tier (≤P rows)
                    files = [p for p in [row["base"], *row["deltas"]] if p]
                    if prune is not None and not _prune_possible(
                            prune, _footer_ranges(lake_dir, files, [
                                c.column for c in prune])):
                        outs.append({"pid": row["pid"], **skip_row})
                        continue
                    base = pq.read_table(
                        os.path.join(lake_dir, row["base"])) \
                        if row["base"] else None
                    deltas = [pq.read_table(os.path.join(lake_dir, d))
                              for d in row["deltas"]]
                    dvs = [pq.read_table(os.path.join(lake_dir, d))
                           for d in row["dvs"]]
                    state = fold_partition_state(base, deltas, types=types,
                                                 dvs=dvs)
                    out = state_fn(state, row["pid"])
                    if (skip_unchanged and out.num_rows == state.num_rows
                            and not row["deltas"] and not row["dvs"]):
                        # pure removal with zero victims and nothing to
                        # fold: a rewrite would be byte-identical
                        outs.append({"pid": row["pid"], **skip_row})
                        continue
                    rel = ""
                    if out.num_rows:
                        rel = os.path.join(
                            f"txn-{txn_id}",
                            f"part-{row['pid']:05d}.parquet")
                        full = os.path.join(lake_dir, rel)
                        out = write_base_file(out, full, cluster,
                                              token_col=token_col)
                    outs.append({"pid": row["pid"], "path": rel,
                                 "rows": out.num_rows,
                                 "rows_before": state.num_rows,
                                 "schema_ipc": extras_schema_b64(out),
                                 "skipped": False})
                return pa.Table.from_pylist(outs, schema=pa.schema([
                    ("pid", pa.int64()), ("path", pa.string()),
                    ("rows", pa.int64()), ("rows_before", pa.int64()),
                    ("schema_ipc", pa.string()), ("skipped", pa.bool_())]))

            try:
                rows = _meta_items_dataset(items).map_batches(
                    rewrite_part, batch_format="pyarrow",
                    zero_copy_batch=True).take_all()
            except Exception as e:
                # a concurrent commit + GC can collect our fold inputs
                # mid-rewrite — a CommitConflict observed at read time
                if attempt == max_commit_retries or not _vanished_txn_input(e):
                    raise
                logger.warning(
                    "%s inputs on %s vanished under a concurrent "
                    "commit; retrying against the fresh manifest (%d/%d)",
                    lineage_flag, self.lake_dir,
                    attempt + 1, max_commit_retries)
                continue
            skipped = sum(1 for r in rows if r["skipped"])
            rows = [r for r in rows if not r["skipped"]]
            if not rows:
                # every partition pruned / unchanged: commit nothing
                return {"txn": None,
                        "version": int(manifest.get("version", 0)),
                        "partitions": 0, "rows": 0, "rows_before": 0,
                        "skipped": skipped}
            partitions = dict(manifest["partitions"])
            for r in rows:
                pid = str(r["pid"])
                prev = partitions[pid]
                lineage = list(prev.get("lineage", []))
                lineage.append({"txn": txn_id, "events_applied": 0,
                                lineage_flag: True})
                partitions[pid] = {
                    "path": r["path"] or None, "rows": int(r["rows"]),
                    "last_applied_lsn": int(prev.get("last_applied_lsn",
                                                     -1)),
                    "lineage": lineage[-16:],
                }
            new_manifest = {
                "version": manifest["version"] + 1,
                "partitions": partitions,
                "num_partitions": self.num_partitions,
                "partition_config": self.partition_config(),
                "last_txn": txn_id,
                # a transform may INTRODUCE columns — union like any commit
                **merge_schema_entries(manifest, [
                    r.get("schema_ipc") or "" for r in rows]),
            }
            if manifest.get("dlq"):
                new_manifest["dlq"] = manifest["dlq"]
            carry_constraints(manifest, new_manifest)
            carry_lsn_ceiling(manifest, new_manifest)
            carry_cluster_by(manifest, new_manifest)
            if manifest_extra:
                # explicit layout keys override the carried ones (falsy
                # values DELETE the key — set_clustering(()) clears)
                for k, v in manifest_extra.items():
                    if v:
                        new_manifest[k] = v
                    else:
                        new_manifest.pop(k, None)
            if self._pre_commit_hook is not None:
                self._pre_commit_hook()  # test seam
            try:
                mf.commit_manifest(self.lake_dir, new_manifest,
                                   retain_history=self.time_travel_retain,
                                   expected_version=manifest["version"])
            except mf.CommitConflict:
                if attempt == max_commit_retries:
                    raise
                logger.warning(
                    "concurrent commit during %s on %s; retrying "
                    "against the fresh manifest (%d/%d)",
                    lineage_flag, self.lake_dir,
                    attempt + 1, max_commit_retries)
                continue
            if self.auto_gc:
                mf.gc_orphan_txns(self.lake_dir, keep_txns={txn_id})
            return {"txn": txn_id, "version": new_manifest["version"],
                    "partitions": len(rows),
                    "rows": sum(int(r["rows"]) for r in rows),
                    "rows_before": sum(int(r["rows_before"]) for r in rows),
                    "skipped": skipped}

    def bootstrap(self, snapshot_ds, snapshot_lsn: int) -> "dict":
        """Initial load → stream handoff (the Debezium snapshot pattern):
        seed an EMPTY lake from a consistent full-table snapshot taken at
        binlog position ``snapshot_lsn``, then tail the stream from
        ``resume_lsn() + 1 == snapshot_lsn + 1``.

        ``snapshot_ds`` carries the lake schema minus lsn (conv_id,
        turn_idx, role, text, tool, ts — ts already typed; snapshots come
        from a table read, not a binlog, so there is nothing to normalize);
        every row is stamped ``lsn = snapshot_lsn``.  Fully distributed:
        one PartitionStage pass + one groupby shuffle, per-partition sorted
        parquet written on workers, driver commits ≤P manifest rows — the
        same shape as repartition_lake.  Every partition's watermark starts
        at ``snapshot_lsn``, so stream events at or below it (the overlap a
        cautious tailer re-reads around the snapshot point) dedup away."""
        manifest = mf.read_manifest(self.lake_dir)
        if manifest.get("version", 0) != 0:
            raise ValueError(
                f"lake {self.lake_dir!r} is at version "
                f"{manifest['version']}; bootstrap seeds an EMPTY lake — "
                f"apply the stream instead, or choose a fresh directory")
        if snapshot_lsn < 0:
            raise ValueError("snapshot_lsn must be ≥ 0 (binlog position "
                             "the snapshot is consistent with)")
        txn_id = uuid.uuid4().hex[:12]
        stage = PartitionStage(self.num_partitions,
                               by_turn=(self.partition_mode == "turn"),
                               salt_keys=self.salt_keys,
                               salt_factor=self.salt_factor)
        lake_dir = self.lake_dir

        def stamp(batch: pa.Table) -> pa.Table:
            cols = {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx").cast(pa.int32()),
                "role": batch.column("role"),
                "text": batch.column("text"),
                "tool": batch.column("tool")
                if "tool" in batch.schema.names
                else pa.nulls(batch.num_rows, pa.string()),
                "ts": batch.column("ts").cast(_TS_NS_UTC)
                if "ts" in batch.schema.names
                else pa.nulls(batch.num_rows, _TS_NS_UTC),
                "lsn": pa.array(np.full(batch.num_rows, int(snapshot_lsn),
                                        dtype=np.int64)),
            }
            # evolved snapshot columns seed the lake schema (widen-only)
            for c in extra_columns_of(batch.schema.names):
                if c in RESERVED_EVENT_COLUMNS:
                    raise CastError(
                        f"snapshot column {c!r} collides with a reserved "
                        f"lake column; rename it at the source")
                cols[c] = batch.column(c)
            return pa.table(cols)

        def write_partition(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return MergeApplier._result(None)
            pid = int(group.column("_pid")[0].as_py())
            state = group.drop_columns(["_pid"])
            state = state.select(
                [*LAKE_COLUMNS, *_union_extras([state])])
            state = sort_by_merge_key(state)
            rel = os.path.join(f"txn-{txn_id}", f"part-{pid:05d}.parquet")
            full = os.path.join(lake_dir, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            pq.write_table(state, full, compression="zstd",
                           row_group_size=LAKE_ROW_GROUP_ROWS)
            return MergeApplier._result({
                "pid": pid, "path": rel, "rows": state.num_rows,
                "last_applied_lsn": int(snapshot_lsn), "events_applied": 0,
                "events_seen": group.num_rows,
                "schema_ipc": extras_schema_b64(state),
            })

        ds = snapshot_ds.map_batches(stamp, batch_format="pyarrow",
                                     zero_copy_batch=True)
        ds = ds.map_batches(stage, batch_format="pyarrow",
                            zero_copy_batch=True)
        rows = ds.groupby("_pid").map_groups(
            write_partition, batch_format="pyarrow").take_all()

        partitions = {
            str(pid): {"path": None, "rows": 0,
                       "last_applied_lsn": int(snapshot_lsn),
                       "lineage": [{"txn": txn_id, "events_applied": 0}]}
            for pid in range(self.num_partitions)
        }
        for r in rows:
            partitions[str(r["pid"])].update(path=r["path"],
                                             rows=int(r["rows"]))
        new_manifest = {
            "version": 1,
            "partitions": partitions,
            "num_partitions": self.num_partitions,
            "partition_config": self.partition_config(),
            "last_txn": txn_id,
            **merge_schema_entries(manifest, [
                r.get("schema_ipc") or "" for r in rows]),
        }
        if self.constraints:
            # snapshot rows bypass normalization (they are trusted table
            # state, not binlog events) — the bootstrap only RECORDS the
            # expectations so the stream tail that follows enforces them
            new_manifest["constraints"] = [
                c.to_json() for c in self.constraints]
        mf.commit_manifest(self.lake_dir, new_manifest,
                           retain_history=self.time_travel_retain,
                           expected_version=0)
        if self.auto_gc:
            mf.gc_orphan_txns(self.lake_dir, keep_txns={txn_id})
        return {"txn": txn_id, "version": 1,
                "rows": sum(int(r["rows"]) for r in rows),
                "resume_lsn": int(snapshot_lsn)}

    def clone_lake(self, dest_dir: str) -> "dict":
        """Zero-copy shallow clone (Delta SHALLOW CLONE / Iceberg snapshot
        analog): a fully functional, independently WRITABLE lake at
        ``dest_dir`` that shares the source's immutable data files —
        O(txn dirs) symlinks + O(manifest) json copies, no data moved, so
        cloning a 100-TB lake is a metadata operation.

        * the clone has its own manifest, OCC lock, history, and GC
          domain: applies/transforms/compactions on the clone write NEW
          txn dirs inside it and never touch the source; commits on the
          source after the clone point are invisible to the clone;
        * clone GC removes only the clone's symlinks, never the files
          behind them (state/manifest.py gc_orphan_txns link handling);
        * retained history snapshots copy over, so time travel to
          pre-clone versions works inside the clone;
        * caveat (same as Delta shallow clones): GC/retention on the
          SOURCE can remove files a clone still references.  Freeze the
          source, or deepen the clone — a ``repartition_lake`` on the
          clone rewrites every partition into clone-local files, after
          which GC drops the symlinks and the clone is fully independent.

        ``dest_dir`` must not already contain a lake."""
        manifest = mf.read_manifest(self.lake_dir)
        if manifest.get("version", 0) == 0:
            raise ValueError(
                f"lake {self.lake_dir!r} has no committed state to clone")
        if mf.read_manifest(dest_dir).get("version", 0) != 0:
            raise ValueError(f"{dest_dir!r} already holds a committed lake")
        os.makedirs(dest_dir, exist_ok=True)
        src = os.path.abspath(self.lake_dir)
        # every txn dir any RETAINED version references stays reachable in
        # the clone (time travel parity with the source)
        manifests = [manifest]
        for v in mf.list_versions(self.lake_dir):
            if v != manifest["version"]:
                manifests.append(mf.read_manifest_at(self.lake_dir, v))
        txn_dirs = sorted({p.split(os.sep, 1)[0]
                           for m in manifests for p in mf.data_files(m)})
        linked = 0
        for t in txn_dirs:
            dst = os.path.join(dest_dir, t)
            if not os.path.lexists(dst):
                os.symlink(os.path.join(src, t), dst)
                linked += 1
        # provenance travels in the manifest (and every retained snapshot
        # is copied so read_lake_at works inside the clone)
        cloned = dict(manifest)
        cloned["cloned_from"] = {"lake": src,
                                 "version": int(manifest["version"])}
        mf.commit_manifest(dest_dir, cloned,
                           retain_history=self.time_travel_retain)
        hist_src = os.path.join(src, mf.HISTORY_DIR)
        if os.path.isdir(hist_src):
            os.makedirs(os.path.join(dest_dir, mf.HISTORY_DIR),
                        exist_ok=True)
            import shutil as _shutil

            for name in os.listdir(hist_src):
                if name.startswith("manifest-v") and name.endswith(".json"):
                    _shutil.copyfile(
                        os.path.join(hist_src, name),
                        os.path.join(dest_dir, mf.HISTORY_DIR, name))
        return {"dest": dest_dir, "version": int(manifest["version"]),
                "txn_dirs_linked": linked,
                "rows": sum(int(p.get("rows", 0))
                            for p in manifest["partitions"].values())}

    def gc(self, dry_run: bool = False) -> "list[str]":
        """Remove txn dirs no longer referenced by the committed manifest
        (safe under the single-writer protocol; the manifest IS the commit
        point, so orphans are either crashed or superseded txns).
        ``dry_run=True`` only reports what would be reclaimed."""
        return mf.gc_orphan_txns(self.lake_dir, keep_txns=set(),
                                 dry_run=dry_run)

    def apply_stream(self, event_datasets) -> "list[dict]":
        """Continuous micro-batch tail: apply each incoming change-event
        Dataset in order; every apply is an exactly-once commit, so a crash
        between micro-batches resumes from the last committed watermarks."""
        return [self.apply(ds) for ds in event_datasets]

    # -------------------------------------------------------------- reads

    def read_lake(self, columns: "list[str] | None" = None,
                  where: "list | None" = None):
        """Committed lake state as a streaming Dataset (manifest-scoped).

        ``columns`` prunes the scan at the parquet reader (and the
        merge-on-read fold) — at lake scale a 2-column analytics read must
        not ship all 7 columns out of storage.  The fold internally keeps
        the merge key + lsn and drops them again before returning.

        ``where``: AND'd :class:`~.constraints.Constraint` list evaluated
        on folded live state with SQL semantics (NULL never matches);
        partitions whose parquet footer min/max stats prove no row can
        match are skipped without reading a data byte — at 100 TB a
        time-banded analytics read touches only the partitions whose
        files overlap the band."""
        return self._manifest_dataset(mf.read_manifest(self.lake_dir),
                                      columns=columns, where=where)

    def count_rows(self, where: "list | None" = None) -> int:
        """COUNT(*) with aggregate pushdown.

        Without ``where``: clean partitions (no pending deltas/dvs — the
        100-TB steady state) are counted from the MANIFEST alone (every
        base writer records its row count at commit), so the common case
        reads zero data bytes; only dirty partitions fold, and that fold
        reads just the merge key + lsn, never the payload columns.

        With ``where`` (AND'd Constraint list, SQL semantics): the same
        pruned fold as ``read_lake(where=...)`` — partition- and
        row-group-level footer skipping — but the scan ships ONLY the
        merge key, lsn, and the where columns; text/payload never leaves
        storage just to be counted."""
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        key_cols = ["conv_id", "turn_idx", "lsn"]
        if where:
            types = _manifest_types(manifest)
            need = list(dict.fromkeys(
                [*key_cols,
                 *[c.column for c in where if c.column in types]]))
            return self._fold_dataset(manifest, columns=need,
                                      where=where).count()
        dirty = {pid for pid, p in manifest["partitions"].items()
                 if p.get("deltas") or p.get("dvs")}  # manifest string keys
        clean_total = sum(int(p.get("rows", 0))
                          for pid, p in manifest["partitions"].items()
                          if pid not in dirty)
        if not dirty:
            return clean_total
        return clean_total + self._fold_dataset(
            manifest, columns=key_cols, pids=dirty).count()

    #: aggregate_lake's function table — Ray Data's distributed aggregates
    #: (per-block partials + tiny combine; only scalars reach the driver)
    _AGG_FNS = ("min", "max", "sum", "count")

    def aggregate_lake(self, aggs: "dict[str, tuple[str | None, str]]",
                       where: "list | None" = None) -> "dict":
        """MIN/MAX/SUM/COUNT(*) pushdown over the folded live state.

        ``aggs`` maps output names to ``(column, fn)`` with fn in
        ``min | max | sum | count`` (count ignores its column —
        COUNT(*)).  The scan is the same pruned fold as
        ``read_lake(where=...)`` — partitions and row groups whose footer
        stats prove no match are skipped unread — but ships ONLY the
        merge keys, the where columns, and the aggregated columns;
        payload text never leaves storage to be aggregated.  Aggregation
        itself is Ray's distributed per-block partial + combine, so the
        driver receives scalars, never rows.

        A pure-COUNT call without ``where`` short-circuits to
        ``count_rows`` (manifest-only on clean partitions — zero data
        bytes).  SQL NULL semantics: min/max/sum ignore NULLs; an empty
        selection yields None (count 0)."""
        from ray.data.aggregate import Count, Max, Min, Sum

        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        types = _manifest_types(manifest)
        for name, (col, fn) in aggs.items():
            if fn not in self._AGG_FNS:
                raise ValueError(f"unknown aggregate {fn!r} for {name!r}; "
                                 f"use one of {self._AGG_FNS}")
            if fn != "count" and col not in types:
                raise ValueError(f"unknown aggregate column {col!r} for "
                                 f"{name!r}; lake schema is "
                                 f"{sorted(types)}")
        if not where and all(fn == "count" for _, fn in aggs.values()):
            n = self.count_rows()
            return {name: n for name in aggs}
        key_cols = ["conv_id", "turn_idx", "lsn"]
        need = list(dict.fromkeys(
            [*key_cols,
             *[c.column for c in (where or []) if c.column in types],
             *[col for col, fn in aggs.values() if fn != "count"]]))
        ds = self._fold_dataset(manifest, columns=need, where=where)
        ctors = {"min": Min, "max": Max, "sum": Sum}
        specs, keys = [], []
        seen: "dict[tuple, str]" = {}
        for name, (col, fn) in aggs.items():
            sig = (col, fn) if fn != "count" else (None, "count")
            if sig in seen:
                keys.append((name, seen[sig]))
                continue
            res_key = "count()" if fn == "count" else f"{fn}({col})"
            specs.append(Count() if fn == "count" else ctors[fn](col))
            seen[sig] = res_key
            keys.append((name, res_key))
        res = ds.aggregate(*specs) or {}
        out = {}
        for name, res_key in keys:
            v = res.get(res_key)
            if hasattr(v, "item"):  # numpy scalar → plain python
                v = v.item()
            _, fn = aggs[name]
            out[name] = 0 if fn == "count" and v is None else v
        return out

    def read_merged(self, pending_ds):
        """Merge-on-read view: committed base + an UNCOMMITTED pending
        change stream overlaid at read time — the state ``apply(pending_ds)``
        WOULD produce, computed without writing a byte to the lake.

        This is the low-read-latency half of the write/read tradeoff: a
        tailer can keep hot micro-batches out of the commit path (no parquet
        rewrite per micro-batch) and serve fresh reads by overlaying them,
        compacting on its own cadence.  Semantics are guaranteed identical
        to a commit because the view reuses the commit's own operators:

        * pending events run the SAME ``NormalizeStage`` (per-epoch ts
          re-parse, role renames, global low-watermark prune) →
          ``PartitionStage`` → ``PreMergeCombiner`` chain as ``apply``;
        * base rows re-derive their ``_pid`` through the same deterministic
          ``PartitionStage`` (cheaper than carrying file→pid provenance
          through ``read_parquet``) and are tagged as live upserts;
        * ONE ``groupby("_pid")`` merges base+delta per partition with the
          commit's ``keep_last_per_key`` + delete-wins filter.  Replayed
          events below a partition watermark are arbitrated by max-LSN
          winner selection alone (the same idempotence argument as DLQ
          reprocessing, DESIGN #32): an already-applied upsert ties or
          loses against the base row it produced, an already-applied
          delete re-deletes an already-absent key.

        In dlq mode, rows the normalizer would quarantine are DROPPED from
        the view (a read overlay must not commit quarantine state); the
        eventual ``apply`` of the same batch quarantines them durably.
        """
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        low = mf.min_watermark(manifest, self.num_partitions)
        partition = PartitionStage(self.num_partitions,
                                   by_turn=(self.partition_mode == "turn"),
                                   salt_keys=self.salt_keys,
                                   salt_factor=self.salt_factor)
        view_schema = manifest_schema_columns(manifest)
        types = _manifest_types(manifest)
        # pending events may carry evolved columns the lake hasn't
        # committed yet — the view must show them exactly as the eventual
        # apply would (schema() here is plan metadata / a small sample)
        try:
            pending_schema = pending_ds.schema().base_schema
            for f in pending_schema:
                if (f.name not in ENVELOPE_COLUMNS
                        and f.name not in RESERVED_EVENT_COLUMNS
                        and f.name not in types):
                    view_schema.append(f.name)
                    types[f.name] = f.type
        except Exception:  # schema unavailable: manifest columns only
            pass
        view_cols = ["op", *view_schema]
        normalize = NormalizeStage(self.epoch_specs, low_watermark=low,
                                   stop_on_invalid=self.stop_on_invalid,
                                   dlq=self.dlq)

        def delta_side(batch: pa.Table) -> pa.Table:
            out = normalize(batch)
            if "dlq_reason" in out.schema.names:
                out = out.filter(pc.is_null(out.column("dlq_reason")))
            return partition(pad_to_schema(out, view_cols, types))

        def base_side(batch: pa.Table) -> pa.Table:
            tagged = batch.append_column(
                "op", pa.array(np.full(batch.num_rows, "upsert")))
            return partition(pad_to_schema(tagged, view_cols, types))

        kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
        delta = (pending_ds.map_batches(delta_side, **kwargs)
                 .map_batches(PreMergeCombiner(wire_encode=False), **kwargs))
        base = self._manifest_dataset(manifest).map_batches(base_side, **kwargs)

        def merge_view(group: pa.Table) -> pa.Table:
            winners = keep_last_per_key(group)
            live = winners.filter(pc.invert(pc.is_in(
                winners.column("op"),
                value_set=pa.array(["delete", CONV_DELETE_OP]))))
            return live.select(view_schema)

        return base.union(delta).groupby("_pid").map_groups(
            merge_view, batch_format="pyarrow")

    def read_dlq(self):
        """Quarantined events across all committed txns as one Arrow table
        (lsn, op, conv_id, turn_idx, role, text, tool, ts, ts_raw,
        dlq_reason).  Small by construction — the DLQ is the error tail, not
        the stream; inspect / fix / re-inject with fresh lsns."""
        manifest = mf.read_manifest(self.lake_dir)
        entries = manifest.get("dlq", [])
        if not entries:
            return NormalizeStage(dlq=True)._empty_out(None)
        tables = [pq.read_table(os.path.join(self.lake_dir, e["path"]))
                  for e in entries]
        return pa.concat_tables(tables, promote_options="permissive")

    def suggest_dlq_specs(self, sample_per_epoch: int = 64,
                          default_timezone: str = "UTC") -> "dict[int, ColumnConfig]":
        """Guess a ts layout for every schema epoch stuck in the quarantine
        (unknown_epoch / unparseable_ts rows) and return the current specs
        extended with the guesses — ready to hand to :meth:`reprocess_dlq`.

        The guess runs the repo's candidate-format ranking
        (functions/guess.py) over ≤``sample_per_epoch`` raw values per
        epoch; epochs whose sample fits no candidate at the confidence bar
        are left out (their rows stay quarantined rather than parse
        wrong).  Driver-side by design: the DLQ is the error tail."""
        from embulk_filter_timestamp_format_ray.functions.guess import guess_format

        dlq = self.read_dlq()
        specs = dict(self.epoch_specs or DEFAULT_EPOCH_SPECS)
        if dlq.num_rows == 0:
            return specs
        fixable = dlq.filter(pc.is_in(
            dlq.column("dlq_reason"),
            value_set=pa.array(["unknown_epoch", "unparseable_ts"])))
        epochs = fixable.column("schema_epoch").cast(pa.int64())
        for epoch in pc.unique(epochs).to_pylist():
            if epoch is None:
                continue
            sub = fixable.filter(pc.equal(epochs, epoch))
            sample = [v for v in
                      sub.column("ts_raw").slice(0, sample_per_epoch).to_pylist()
                      if v is not None]
            fmt = guess_format(sample, default_timezone)
            if fmt is None:
                logger.warning(
                    "no candidate format fits epoch %d's quarantined ts "
                    "values (sample of %d); leaving it dead-lettered",
                    epoch, len(sample))
                continue
            prior = specs.get(int(epoch))
            if prior is not None and prior.from_format:
                # a known epoch whose format WIDENED: extend the reference's
                # multi-format fallback chain (C3) instead of replacing the
                # spec — rows in the old layout keep parsing
                if fmt in prior.from_format:
                    continue
                specs[int(epoch)] = dataclasses.replace(
                    prior, from_format=(*prior.from_format, fmt))
            else:
                specs[int(epoch)] = ColumnConfig(
                    "ts_raw", "timestamp", from_format=(fmt,),
                    from_timezone=default_timezone)
        return specs

    def reprocess_dlq(self, epoch_specs: "dict[int, ColumnConfig] | None" = None,
                      max_commit_retries: int = 2) -> "dict":
        """Close the quarantine loop: re-run every dead-lettered event
        through normalization (optionally under corrected ``epoch_specs`` —
        the usual fix for ``unknown_epoch``/``unparseable_ts`` rows) and
        apply the ones that now parse; the still-bad remainder REPLACES the
        old quarantine in the same exactly-once commit.

        Ordering semantics: recovered events keep their ORIGINAL lsns and
        the per-key max-LSN merge arbitrates against current lake state —
        an old quarantined update never overwrites a newer applied one, and
        a quarantined event newer than the applied state wins, exactly as
        if it had never been quarantined.  The watermark replay-prune is
        bypassed for this apply (quarantined lsns were never applied, so
        the prune would wrongly drop them); idempotent because re-merging
        an identical row cannot change the winner.  Exact duplicate dlq
        rows (at-least-once quarantine copies) collapse before the apply."""
        import ray.data

        if not self.dlq:
            raise ValueError("reprocess_dlq requires a dlq=True pipeline "
                             "(recovered rows re-route through the "
                             "dead-letter lane)")
        if epoch_specs is not None:
            self.epoch_specs = epoch_specs
        base_ident = ["lsn", "op", "conv_id", "turn_idx", "role", "text",
                      "tool", "ts_raw", "schema_epoch"]
        for attempt in range(max_commit_retries + 1):
            dlq = self.read_dlq()
            if dlq.num_rows == 0:
                return {"events_seen": 0, "events_applied": 0,
                        "events_quarantined": 0}
            # evolved payload columns quarantined WITH the event reprocess
            # with it (identity includes them so exact replays collapse)
            ident = base_ident + [c for c in dlq.column_names
                                  if c not in base_ident
                                  and c not in ("ts", "dlq_reason")]
            events = dlq.select(ident).group_by(ident).aggregate([])
            # quarantined rows always carry their source epoch; recovered
            # parsing needs the ORIGINAL raw string back in ts_raw's seat
            try:
                stats = self._apply_dataset(
                    ray.data.from_arrow(events), _reprocess=True)
                stats["events_seen"] = events.num_rows
                return stats
            except Exception as e:
                if not isinstance(e, mf.CommitConflict) \
                        and not _vanished_txn_input(e):
                    raise
                if attempt == max_commit_retries:
                    raise
                logger.warning(
                    "concurrent commit during dlq reprocess on %s; "
                    "retrying against the fresh quarantine (%d/%d)",
                    self.lake_dir, attempt + 1, max_commit_retries)

    def read_lake_at(self, version: int,
                     columns: "list[str] | None" = None,
                     where: "list | None" = None):
        """Time travel: the lake as of manifest ``version`` (Delta-style
        VERSION AS OF).  Readable for the current version and any retained
        history snapshot (``time_travel_retain`` bounds the window; GC keeps
        every snapshot-referenced txn file alive — state/manifest.py).
        ``columns`` and ``where`` prune like :meth:`read_lake`."""
        return self._manifest_dataset(
            mf.read_manifest_at(self.lake_dir, version), columns=columns,
            where=where)

    def version_at(self, ts_unix_ms: int) -> int:
        """TIMESTAMP AS OF resolution: the LATEST retained version whose
        commit wall-clock is ≤ ``ts_unix_ms`` (Delta semantics).  Raises
        ``ValueError`` when the timestamp precedes every retained commit
        (or the lake predates commit timestamps).  Metadata-only."""
        best = None
        for v in mf.list_versions(self.lake_dir):
            m = mf.read_manifest_at(self.lake_dir, v)
            at = m.get("committed_at_unix_ms")
            if at is not None and int(at) <= int(ts_unix_ms):
                best = v
        if best is None:
            raise ValueError(
                f"no retained version committed at or before "
                f"{ts_unix_ms} (unix ms); earliest retained versions: "
                f"{mf.list_versions(self.lake_dir)[:3]}")
        return best

    def read_lake_at_ts(self, ts_unix_ms: int, columns=None, where=None):
        """TIMESTAMP AS OF read: resolve the version via
        :meth:`version_at`, then the ordinary snapshot read."""
        return self.read_lake_at(self.version_at(ts_unix_ms),
                                 columns=columns, where=where)

    def versions(self) -> "list[int]":
        """Manifest versions currently readable via ``read_lake_at``."""
        return mf.list_versions(self.lake_dir)

    def history(self) -> "list[dict]":
        """DESCRIBE HISTORY analog: one summary row per retained manifest
        version (ascending) — rows / data+delta file counts / dlq backlog /
        watermark span / the txn that produced it, plus ``rolled_back_to``
        for rollback commits.  Metadata-only: reads the tiny manifest
        snapshots, never data files."""
        out = []
        for v in mf.list_versions(self.lake_dir):
            m = mf.read_manifest_at(self.lake_dir, v)
            parts = m.get("partitions", {})
            wms = [int(p.get("last_applied_lsn", -1)) for p in parts.values()]
            row = {
                "version": v,
                "txn": m.get("last_txn"),
                "partitions": len(parts),
                "rows": sum(int(p.get("rows", 0)) for p in parts.values()),
                "delta_files": sum(len(p.get("deltas", []))
                                   for p in parts.values()),
                "delta_rows": sum(int(d.get("rows", 0))
                                  for p in parts.values()
                                  for d in p.get("deltas", [])),
                "dv_files": sum(len(p.get("dvs", []))
                                for p in parts.values()),
                "dv_rows": sum(int(d.get("rows", 0))
                               for p in parts.values()
                               for d in p.get("dvs", [])),
                "dlq_rows": sum(int(d.get("rows", 0))
                                for d in m.get("dlq", [])),
                "watermark_min": min(wms, default=-1),
                "watermark_max": max(wms, default=-1),
            }
            if "committed_at_unix_ms" in m:
                row["committed_at_unix_ms"] = int(m["committed_at_unix_ms"])
            if "rolled_back_to" in m:
                row["rolled_back_to"] = int(m["rolled_back_to"])
            out.append(row)
        return out

    def rollback(self, version: int) -> "dict":
        """Restore the lake to retained snapshot ``version`` AS A NEW
        COMMIT (Iceberg-style rollback): the head manifest's entire
        partition table — data files, delta lists, watermarks, DLQ — is
        replaced wholesale by the snapshot's and committed as version
        head+1 through the same OCC manifest swap every writer uses.

        Metadata-only and O(manifest): nothing is rewritten or deleted.
        The snapshot's data files are still on disk because GC unions the
        live sets of ALL retained snapshots (state/manifest.py
        gc_orphan_txns), and they stay live afterwards because the new
        head references them directly.  Watermarks roll back WITH the
        partitions, so re-tailing the undone lsn range re-applies it —
        the undo-a-bad-commit-then-replay-corrected workflow
        (low-watermark prune + max-LSN merge arbitrate the overlap
        exactly as for any replay).  Rolling FORWARD again is possible
        while the overwritten versions remain within
        ``time_travel_retain``.

        Raises ``ValueError`` when ``version`` has no retained snapshot
        and :class:`state.manifest.CommitConflict` when a concurrent
        writer commits between the read and the swap (retry against the
        fresh head — rollback intent must be re-decided, like
        repartition_lake)."""
        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        current = int(manifest.get("version", 0))
        if int(version) == current:
            return {"version": current, "restored_version": current,
                    "partitions": len(manifest.get("partitions", {})),
                    "noop": True}
        target = mf.read_manifest_at(self.lake_dir, int(version))
        new_manifest = dict(target)
        new_manifest["version"] = current + 1
        new_manifest["last_txn"] = f"rollback-to-v{int(version)}"
        new_manifest["rolled_back_to"] = int(version)
        mf.commit_manifest(self.lake_dir, new_manifest,
                           retain_history=self.time_travel_retain,
                           expected_version=current)
        # The restore is wholesale — the snapshot's partition_config comes
        # back WITH it (a rollback across a repartition_lake legitimately
        # changes the layout).  Adopt it so this handle keeps routing
        # correctly; compat-checking the target against the CURRENT layout
        # would wrongly refuse exactly that restore (r4 bug).
        cfg = target.get("partition_config") or {}
        if cfg:
            self.num_partitions = int(cfg.get("num_partitions",
                                              self.num_partitions))
            self.partition_mode = cfg.get("partition_mode",
                                          self.partition_mode)
            salt = cfg.get("salt_keys") or []
            self.salt_keys = frozenset(salt) if salt else None
            self.salt_factor = int(cfg.get("salt_factor", self.salt_factor))
        return {"version": new_manifest["version"],
                "restored_version": int(version),
                "partitions": len(target.get("partitions", {})),
                "num_partitions": self.num_partitions}

    def lake_changes(self, v_from: int, v_to: int, columns=None):
        """Change Data Feed: one row per key whose state differs between two
        retained versions — ``change_type`` ∈ insert/update/delete, ``lsn``
        is the post-image lsn (pre-image for deletes).

        ``columns`` adds payload columns (e.g. role/text/tool/ts) carrying
        the POST-image for inserts/updates and the PRE-image for deletes —
        the Delta-CDF convention a downstream consumer needs to mirror the
        table (see :meth:`sync_changes`).

        Cost scales with the DELTA, not the lake: the manifest diff finds
        the partitions whose data-file path changed between the versions
        (an untouched partition keeps its file, so its keys cannot differ),
        and only those files are read — from both versions, tagged, one
        key-shard exchange, then a per-shard sorted run-compare (runs of
        length 1 are inserts/deletes, length-2 runs with differing lsn are
        updates; equal-lsn pairs are rewrite survivors and emit nothing)."""
        import ray.data

        from embulk_filter_timestamp_format_ray.stages.relational import (
            _same_as_prev_row,
            _with_key_shard,
        )

        payload = [c for c in (columns or [])
                   if c not in ("conv_id", "turn_idx", "lsn")]

        m_from = mf.read_manifest_at(self.lake_dir, v_from)
        m_to = mf.read_manifest_at(self.lake_dir, v_to)
        # widen-only: v_to's schema normally supersets v_from's, but a diff
        # can span a rollback — union both so either side's columns resolve
        types = {**_manifest_types(m_from), **_manifest_types(m_to)}
        bad = [c for c in payload if c not in types]
        if bad:
            raise ValueError(f"unknown lake column(s) {bad}; "
                             f"lake schema is {manifest_schema_columns(m_to)}")

        def signature(m: "dict") -> "dict[str, tuple]":
            # partition state identity = base path + ordered delta paths +
            # ordered dv paths (a delta commit or a dv delete changes
            # state without touching the base path)
            return {p: (meta.get("path"),
                        tuple(d["path"] for d in meta.get("deltas", [])),
                        tuple(d["path"] for d in meta.get("dvs", [])))
                    for p, meta in m["partitions"].items()}

        p_from, p_to = signature(m_from), signature(m_to)
        changed = {p for p in set(p_from) | set(p_to)
                   if p_from.get(p) != p_to.get(p)}
        diff_cols = ["conv_id", "turn_idx", "lsn", *payload]

        evolved_payload = any(c not in _LAKE_FIELD_TYPES for c in payload)

        def side_source(m: "dict", sig: "dict[str, tuple]"):
            """Changed partitions' live state at this version, pruned to the
            diff columns: plain file reads when no pending deltas, the
            per-partition fold otherwise (also whenever an evolved payload
            column is requested — files may predate it and need padding)."""
            if (evolved_payload
                    or any(sig.get(p, (None, (), ()))[1]
                           or sig.get(p, (None, (), ()))[2]
                           for p in changed)):
                return self._fold_dataset(m, columns=diff_cols, pids=changed,
                                          types=types)
            files = [os.path.join(self.lake_dir, sig[p][0])
                     for p in changed if sig.get(p, (None,))[0]]
            if not files:
                return None
            return ray.data.read_parquet(files, columns=diff_cols)

        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "change_type": pa.array([], pa.string()),
            "lsn": pa.array([], pa.int64()),
            **{c: pa.array([], types[c]) for c in payload},
        })
        src_from = side_source(m_from, p_from)
        src_to = side_source(m_to, p_to)
        if src_from is None and src_to is None:
            return ray.data.from_arrow(empty)

        def tag(side: int):
            def f(b: pa.Table) -> pa.Table:
                return pa.table({
                    "conv_id": b.column("conv_id"),
                    "turn_idx": b.column("turn_idx"),
                    "lsn": b.column("lsn"),
                    **{c: b.column(c) for c in payload},
                    "_side": pa.array(
                        np.full(b.num_rows, side, dtype=np.int8)),
                })
            return f

        sides = [src.map_batches(tag(i), batch_format="pyarrow",
                                 zero_copy_batch=True)
                 for i, src in enumerate((src_from, src_to))
                 if src is not None]
        ds = sides[0] if len(sides) == 1 else sides[0].union(sides[1])

        def diff_shard(group: pa.Table) -> pa.Table:
            g = group.drop_columns(["_shard"])
            if g.num_rows == 0:
                return empty
            order = pc.sort_indices(g, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending"),
                ("_side", "ascending")])
            s = g.take(order)
            run_start = ~_same_as_prev_row(s, ["conv_id", "turn_idx"])
            run_id = np.cumsum(run_start) - 1
            counts = np.bincount(run_id)
            start_idx = np.nonzero(run_start)[0]
            side = np.asarray(s.column("_side").cast(pa.int64()))
            lsn = np.asarray(s.column("lsn").combine_chunks().cast(pa.int64()))
            # singleton runs: present on one side only
            solo = start_idx[counts == 1]
            # pair runs: compare lsn; emit the post-image row when changed
            pre = start_idx[counts == 2]
            post = pre + 1
            upd = post[lsn[post] != lsn[pre]]
            take = np.concatenate([solo, upd])
            types = np.concatenate([
                np.where(side[solo] == 0, "delete", "insert"),
                np.full(len(upd), "update", dtype=object),
            ])
            keep = s.take(pa.array(take))
            return pa.table({
                "conv_id": keep.column("conv_id"),
                "turn_idx": keep.column("turn_idx"),
                "change_type": pa.array(types, pa.string()),
                "lsn": keep.column("lsn"),
                # insert/update keep the side-1 (post-image) run row;
                # delete keeps the side-0 pre-image — CDF convention
                **{c: keep.column(c) for c in payload},
            })

        ds = _with_key_shard(ds, ["conv_id", "turn_idx"])
        return ds.groupby("_shard").map_groups(diff_shard,
                                               batch_format="pyarrow")

    # mean changed-partition fraction across retained version pairs above
    # which scd2() prefers the snapshot-union tier (manifest metadata only)
    SCD2_SNAPSHOT_FRACTION = 0.5

    def _scd2_changed_fraction(self, vs) -> float:
        """Mean fraction of partitions whose state signature differs
        across consecutive retained versions — the scd2 tier-dispatch
        input, computed from manifest snapshots alone (free)."""
        def signature(m: "dict") -> "dict":
            return {p: (meta.get("path"),
                        tuple(d["path"] for d in meta.get("deltas", [])),
                        tuple(d["path"] for d in meta.get("dvs", [])))
                    for p, meta in m["partitions"].items()}

        fracs = []
        prev = None
        for v in vs:
            sig = signature(mf.read_manifest_at(self.lake_dir, v))
            if prev is not None:
                keys = set(prev) | set(sig)
                if keys:
                    fracs.append(sum(prev.get(p) != sig.get(p)
                                     for p in keys) / len(keys))
            prev = sig
        return sum(fracs) / len(fracs) if fracs else 0.0

    def scd2(self, columns=("role", "text", "tool"), mode: str = "auto"):
        """SCD Type-2 history of the lake at VERSION granularity (the
        warehouse ``APPLY CHANGES ... STORED AS SCD TYPE 2`` shape): one row
        per key VERSION that was ever live in a retained snapshot, with
        ``valid_from_version`` / ``valid_to_version`` (NULL = open) and
        ``is_current``.

        Composition, no new state: the OLDEST retained snapshot seeds the
        opening inserts, each consecutive retained version pair contributes
        its change feed (:meth:`lake_changes` — delta-priced manifest
        diffs), and the union folds through the generic interval kernel
        (``stages/relational.py scd2_history``) keyed on the version
        number.  Deletes close their predecessor and emit no row.

        Resolution is bounded by the retention policy: intra-version
        rewrites of a key collapse to the version's post-image (exactly the
        Delta-CDF convention ``lake_changes`` documents).

        TWO TIERS, auto-dispatched from manifest metadata alone
        (``_scd2_changed_fraction`` vs ``SCD2_SNAPSHOT_FRACTION``; parity
        pytest forces both on the same lake):

        * ``feed`` (small deltas — the 100-TB steady state): ONE
          snapshot-sized seed read (inherent: every key's history opens
          there) + one delta-priced feed diff per retained pair (each with
          its own key-shard exchange) + the interval exchange; untouched
          partitions are never re-read by the diffs.
        * ``snapshot`` (most partitions change every version — dense
          update traffic / few retained versions): every retained snapshot
          folds ONCE (per-partition, exchange-free) and ONE key-shard
          exchange assembles intervals directly from the version-tagged
          rows — a key's run of consecutive same-lsn versions is one
          interval, closed at ``vs[last_run_version_index + 1]`` whether
          the run ends by update, delete (absence gap), or not at all
          (open).  Reads versions × lake size but replaces 2·pairs
          exchanges with one."""
        import ray.data

        from embulk_filter_timestamp_format_ray.stages.relational import (
            scd2_history,
        )

        payload = [c for c in (columns or [])
                   if c not in ("conv_id", "turn_idx", "lsn")]
        vs = self.versions()
        if not vs:
            return ray.data.from_arrow(_empty_lake_table())
        if mode not in ("auto", "feed", "snapshot"):
            raise ValueError(f"unknown scd2 mode {mode!r}")
        if mode == "auto":
            frac = self._scd2_changed_fraction(vs)
            mode = "snapshot" if frac > self.SCD2_SNAPSHOT_FRACTION \
                else "feed"
            logger.info("scd2: changed-partition fraction %.2f → %s tier",
                        frac, mode)

        sel = ["conv_id", "turn_idx", "lsn", *payload]
        if mode == "snapshot":
            return self._scd2_snapshot(vs, sel, payload)

        def seed(v: int):
            base = self.read_lake_at(v, columns=sel)

            def tag(b: pa.Table) -> pa.Table:
                return pa.table({
                    **{c: b.column(c) for c in sel},
                    "change_type": pa.array(["insert"] * b.num_rows,
                                            pa.string()),
                    "version": pa.array(np.full(b.num_rows, v,
                                                dtype=np.int64)),
                })

            return base.map_batches(tag, batch_format="pyarrow",
                                    zero_copy_batch=True)

        def feed(v_from: int, v_to: int):
            ch = self.lake_changes(v_from, v_to, columns=payload)

            def tag(b: pa.Table) -> pa.Table:
                return pa.table({
                    **{c: b.column(c) for c in sel},
                    "change_type": b.column("change_type"),
                    "version": pa.array(np.full(b.num_rows, v_to,
                                                dtype=np.int64)),
                })

            return ch.map_batches(tag, batch_format="pyarrow",
                                  zero_copy_batch=True)

        ds = seed(vs[0])
        for v_from, v_to in zip(vs, vs[1:]):
            ds = ds.union(feed(v_from, v_to))

        out = scd2_history(
            ds, keys=["conv_id", "turn_idx"], seq_col="version",
            delete_expr=lambda t: pc.equal(t.column("change_type"),
                                           "delete"),
            valid_from="valid_from_version", valid_to="valid_to_version",
        )
        keep = ["conv_id", "turn_idx", "lsn", *payload,
                "valid_from_version", "valid_to_version", "is_current"]
        return out.map_batches(lambda b: b.select(keep),
                               batch_format="pyarrow", zero_copy_batch=True)

    def _scd2_snapshot(self, vs, sel, payload):
        """Snapshot-union scd2 tier (see :meth:`scd2`): version-tagged
        folds of every retained snapshot, ONE key-shard exchange, per
        shard a single sort + run-collapse — a maximal run of
        consecutive-version same-lsn rows is one interval whose close is
        ``vs[vidx_last + 1]`` regardless of HOW it ended (update = next
        version differs, delete = absence gap, open = run reaches the
        head)."""
        from embulk_filter_timestamp_format_ray.stages.relational import (
            _same_as_prev_row,
            _with_key_shard,
        )

        vs_arr = np.asarray(vs, dtype=np.int64)

        def tagged(v: int):
            base = self.read_lake_at(v, columns=sel)

            def tag(b: pa.Table) -> pa.Table:
                return pa.table({
                    **{c: b.column(c) for c in sel},
                    "version": pa.array(np.full(b.num_rows, v,
                                                dtype=np.int64)),
                })

            return base.map_batches(tag, batch_format="pyarrow",
                                    zero_copy_batch=True)

        ds = tagged(vs[0])
        for v in vs[1:]:
            ds = ds.union(tagged(v))
        ds = _with_key_shard(ds, ["conv_id", "turn_idx"])
        out_cols = ["conv_id", "turn_idx", "lsn", *payload,
                    "valid_from_version", "valid_to_version", "is_current"]

        def assemble(group: pa.Table) -> pa.Table:
            g = group.drop_columns(["_shard"])
            types = {f.name: f.type for f in g.schema}
            types.update({"valid_from_version": pa.int64(),
                          "valid_to_version": pa.int64(),
                          "is_current": pa.bool_()})
            if g.num_rows == 0:
                return pa.table({c: pa.array([], types[c])
                                 for c in out_cols})
            order = pc.sort_indices(g, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending"),
                ("version", "ascending")])
            b = g.take(order)
            n = b.num_rows
            same = _same_as_prev_row(b, ["conv_id", "turn_idx"])
            vidx = np.searchsorted(vs_arr, np.asarray(
                b.column("version").combine_chunks().cast(pa.int64())))
            lsn = np.asarray(b.column("lsn").combine_chunks()
                             .cast(pa.int64()))
            prev_vidx = np.empty(n, dtype=np.int64)
            prev_vidx[0] = -9
            prev_vidx[1:] = vidx[:-1]
            prev_lsn = np.empty(n, dtype=np.int64)
            prev_lsn[0] = -1
            prev_lsn[1:] = lsn[:-1]
            change_open = (~same) | (vidx != prev_vidx + 1) \
                | (lsn != prev_lsn)
            starts = np.nonzero(change_open)[0]
            last = np.r_[starts[1:] - 1, n - 1]
            vidx_last = vidx[last]
            open_mask = vidx_last == len(vs_arr) - 1
            vto = vs_arr[np.minimum(vidx_last + 1, len(vs_arr) - 1)]
            rows = b.take(pa.array(starts))
            return pa.table({
                **{c: rows.column(c) for c in sel},
                "valid_from_version": rows.column("version")
                    .cast(pa.int64()),
                "valid_to_version": pa.array(vto.astype(np.int64),
                                             mask=open_mask),
                "is_current": pa.array(open_mask),
            })

        return ds.groupby("_shard").map_groups(assemble,
                                               batch_format="pyarrow")

    SYNC_CURSOR = "_sync_cursor.json"

    def sync_changes(self, out_dir: str,
                     columns=("role", "text", "tool", "ts")) -> "dict":
        """Incremental downstream sync: ship everything that changed since
        the LAST sync of ``out_dir`` as partitioned parquet, then advance
        the consumer-side cursor — the lake→serving bridge a downstream
        table mirrors itself from.

        * first sync (no cursor): a full ``snapshot-v{V}`` directory, every
          live row as ``change_type='insert'``;
        * subsequent syncs: a ``changes-v{from}-v{to}`` directory from the
          change feed (:meth:`lake_changes`) with post-image payload
          (pre-image for deletes);
        * cursor older than the retained history window: a fresh full
          snapshot (the downstream re-bootstraps — same contract as any
          log-compacted source);
        * crash-safe: data directories are written BEFORE the cursor
          advances, and a retry first REMOVES every sync directory the
          cursor never confirmed (embedded v_to > cursor) — including a
          torn attempt whose range no longer matches because commits
          landed in between — so the consumer's name-order replay never
          sees phantom rows from an abandoned range.
        """
        import shutil as _shutil

        import ray.data

        os.makedirs(out_dir, exist_ok=True)
        cur_path = os.path.join(out_dir, self.SYNC_CURSOR)
        cursor = None
        try:
            with open(cur_path) as f:
                cursor = int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            cursor = None
        manifest = mf.read_manifest(self.lake_dir)
        v_to = int(manifest.get("version", 0))
        if cursor is not None and cursor == v_to:
            return {"mode": "noop", "v_from": cursor, "v_to": v_to,
                    "rows": 0, "path": None}
        retained = set(mf.list_versions(self.lake_dir))
        payload = [c for c in columns
                   if c not in ("conv_id", "turn_idx", "lsn")]
        if cursor is None or cursor not in retained:
            mode = "snapshot"
            name = f"sync-{v_to:08d}-snapshot"
            cols = ["conv_id", "turn_idx", "lsn", *payload]
            sel = ["conv_id", "turn_idx", "change_type", "lsn", *payload]
            ds = self.read_lake(columns=cols).map_batches(
                lambda b: b.append_column(
                    "change_type",
                    pa.array(np.full(b.num_rows, "insert"))).select(sel),
                batch_format="pyarrow", zero_copy_batch=True)
        else:
            mode = "changes"
            name = f"sync-{v_to:08d}-changes-from-v{cursor:08d}"
            ds = self.lake_changes(cursor, v_to, columns=payload)
        # remove EVERY unconfirmed prior attempt (embedded v_to > cursor),
        # not just one with today's name: a crash between data write and
        # cursor advance followed by more lake commits retries under a
        # DIFFERENT name, and the stale torn range would otherwise replay
        # as phantom rows (keys inserted then deleted inside the abandoned
        # window appear in no later diff)
        confirmed = -1 if cursor is None else cursor
        for d in os.listdir(out_dir):
            if not d.startswith("sync-"):
                continue
            try:
                d_v_to = int(d.split("-")[1])
            except (IndexError, ValueError):
                continue
            if d_v_to > confirmed and os.path.isdir(os.path.join(out_dir, d)):
                _shutil.rmtree(os.path.join(out_dir, d))
        target = os.path.join(out_dir, name)
        if os.path.isdir(target):
            # a CONFIRMED dir can collide with today's name when the lake
            # was restored to an older version (v_to regressed below the
            # cursor): write_parquet APPENDS uniquely-named files, so a
            # stale generation must never share the directory
            _shutil.rmtree(target)
        ds.write_parquet(target)
        # row count from parquet FOOTERS only — a snapshot sync must not
        # re-read the whole shipped set just to report its size.  A
        # zero-row change set may produce no directory at all
        # (write_parquet writes nothing): the cursor still advances — the
        # consumer has nothing to apply for this window.
        rows = sum(
            pq.ParquetFile(os.path.join(target, f)).metadata.num_rows
            for f in os.listdir(target)
            if f.endswith(".parquet")) if os.path.isdir(target) else 0
        tmp = cur_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": v_to}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, cur_path)
        return {"mode": mode, "v_from": cursor, "v_to": v_to,
                "rows": rows,
                "path": target if os.path.isdir(target) else None}

    @staticmethod
    def _confirmed_sync_dirs(out_dir: str) -> "list[str]":
        """Sync directories the consumer cursor has CONFIRMED (embedded
        version ≤ cursor), ascending by name.  Directories above the cursor
        are speculative — a torn producer attempt (DESIGN #37) — and are
        invisible to every consumer-side operation until the producer's
        next sync confirms or removes them."""
        cur_path = os.path.join(out_dir, CDCPipeline.SYNC_CURSOR)
        try:
            with open(cur_path) as f:
                cursor = int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            cursor = -1
        out = []
        for d in sorted(os.listdir(out_dir)):
            if not d.startswith("sync-") \
                    or not os.path.isdir(os.path.join(out_dir, d)):
                continue
            try:
                v_to = int(d.split("-")[1])
            except (IndexError, ValueError):
                continue
            if v_to <= cursor:
                out.append(d)
        return out

    @staticmethod
    def prune_sync_dirs(out_dir: str) -> "list[str]":
        """Consumer-side GC: remove CONFIRMED sync directories older than
        the latest CONFIRMED snapshot — a snapshot resets the mirror, so
        nothing before it can ever affect a fold (``read_sync_mirror``
        already ignores them).  Unconfirmed (torn) directories are left
        alone — they belong to the producer's retry path.  Returns the
        removed directory names."""
        import shutil as _shutil

        dirs = CDCPipeline._confirmed_sync_dirs(out_dir)
        snaps = [i for i, d in enumerate(dirs) if d.endswith("snapshot")]
        dead = dirs[:snaps[-1]] if snaps else []
        for d in dead:
            _shutil.rmtree(os.path.join(out_dir, d))
        return dead

    @staticmethod
    def read_sync_mirror(out_dir: str):
        """CONSUMER side of :meth:`sync_changes`: fold a sync directory
        back into the live table it mirrors, as a streaming Dataset.

        Distributed equivalent of "apply directories in name order": every
        row is tagged with its directory's ordinal, then folded by the
        engine's own last-write-wins operator (``latest_by_key`` — map-side
        combined, one key-shard exchange).  Directory order — NOT lsn — is
        the arbiter: a delete row carries the PRE-image lsn, which can be
        lower than the row it kills.  Only cursor-CONFIRMED directories
        participate (a torn producer attempt must not leak phantom rows),
        and directories older than the latest confirmed snapshot are
        pruned at the file list."""
        import ray.data

        from embulk_filter_timestamp_format_ray.stages.relational import (
            latest_by_key,
        )

        dirs = CDCPipeline._confirmed_sync_dirs(out_dir)
        snaps = [i for i, d in enumerate(dirs) if d.endswith("snapshot")]
        if snaps:
            dirs = dirs[snaps[-1]:]
        if not dirs:
            # empty mirror with the default sync schema (key + lsn + the
            # default payload), so downstream column selects still resolve
            return ray.data.from_arrow(_empty_lake_table())

        # union schema across sync generations (footer-only probe): a
        # consumer that starts shipping an evolved column mid-history has
        # older directories without it — pad them so every block is
        # uniform (newest generation wins a column's type)
        cols: "list[str]" = []
        types: "dict[str, pa.DataType]" = {}
        for d in dirs:
            full_d = os.path.join(out_dir, d)
            files = sorted(f for f in os.listdir(full_d)
                           if f.endswith(".parquet"))
            if not files:
                continue
            for f in pq.read_schema(os.path.join(full_d, files[0])):
                if f.name not in types:
                    cols.append(f.name)
                types[f.name] = f.type

        def tag(seq: int):
            def f(b: pa.Table) -> pa.Table:
                return pad_to_schema(b, cols, types).append_column(
                    "_seq", pa.array(np.full(b.num_rows, seq,
                                             dtype=np.int32)))
            return f

        parts = [
            ray.data.read_parquet(os.path.join(out_dir, d)).map_batches(
                tag(i), batch_format="pyarrow", zero_copy_batch=True)
            for i, d in enumerate(dirs)
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        ds = latest_by_key(
            ds, keys=["conv_id", "turn_idx"], seq_col="_seq",
            delete_expr=lambda t: pc.equal(t.column("change_type"),
                                           "delete"))
        return ds.map_batches(
            lambda b: b.drop_columns(["_seq", "change_type"]),
            batch_format="pyarrow", zero_copy_batch=True)

    def fsck(self) -> "dict":
        """Distributed lake invariant check (table doctor): one task per
        partition reads its base+delta files and verifies the invariants
        every other operator silently relies on —

        All checks run on the RAW files, never on the folded view —
        ``fold_partition_state`` repairs duplicates and filters tombstones
        by construction, so a post-fold check would mostly verify the fold
        operator instead of the on-disk state:

        * **routing**: every raw row's recomputed partition id (same
          PartitionStage + salt config as writes) equals the partition it
          lives in — catches cross-layout corruption the frozen-config
          guard can't see once files are already misplaced;
        * **uniqueness**: no duplicate (conv_id, turn_idx) WITHIN a file —
          every writer runs keep_last_per_key before writing, so a
          duplicated key inside one base/delta file means a broken merge
          (across files duplicates are legitimate: that is the delta
          backlog);
        * **watermark**: max(lsn) per file ≤ max(the partition's committed
          last_applied_lsn, the manifest's ``lsn_ceiling``) — rows from
          the future mean a torn commit; the ceiling exists because a
          repartition soundly resets watermarks to the old global low
          while its rows keep their lsns (carry_lsn_ceiling drops it once
          watermarks ratchet past).  Checked per raw file so a future-lsn
          delete tombstone cannot hide behind the fold's tombstone filter;
        * **schema**: every file's columns ⊆ the manifest's committed
          schema with matching Arrow types — an unknown column or a type
          drift means a writer bypassed the widen-only evolution contract
          (merge_schema_entries), which readers' NULL-padding would then
          silently mask;
        * **ordering** (WARNING tier, not a violation): base and delta
          files sorted by the merge key — reads stay correct without it,
          but point-lookup row-group pruning loses selectivity; lakes
          written before the uniform-ordering change surface here;
        * **constraints**: the manifest's committed expectations
          (pipelines/constraints.py) re-checked against each partition's
          FOLDED live state — ingest enforces them on events, but
          ``transform_lake`` (whose contract guards keys/lsns, not
          values) or a pre-constraint backlog can smuggle violations into
          committed files.  ``not_null`` is skipped here: widen-only
          evolution legitimately reads NULL for pre-evolution rows.

        Returns ``{"partitions_checked": n, "rows_checked": n,
        "violations": [...], "warnings": [...]}`` — an empty violations
        list is a correct lake.  Cost: one streaming pass, no shuffle."""
        import ray.data

        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        lake_dir = self.lake_dir
        stage = PartitionStage(self.num_partitions,
                               by_turn=(self.partition_mode == "turn"),
                               salt_keys=self.salt_keys,
                               salt_factor=self.salt_factor)
        # a repartition resets watermarks to the old global low while its
        # rows keep their lsns — the recorded ceiling is the sound bound
        # until every watermark ratchets past it (carry_lsn_ceiling)
        ceiling = int(manifest.get("lsn_ceiling", -1))
        allowed_types = _manifest_types(manifest)
        constraints = constraints_from_manifest(manifest)
        cluster = cluster_spec_of(manifest)
        text_idx = text_index_of(manifest)
        items = []
        for pid, p in manifest["partitions"].items():
            if not p.get("path") and not p.get("deltas"):
                continue
            items.append({"pid": int(pid), "base": p.get("path") or "",
                          "deltas": [d["path"] for d in p.get("deltas", [])],
                          "dvs": [d["path"] for d in p.get("dvs", [])],
                          "watermark": max(
                              int(p.get("last_applied_lsn", -1)), ceiling)})
        if not items:
            return {"partitions_checked": 0, "rows_checked": 0,
                    "violations": [], "warnings": []}

        def check_part(batch: pa.Table) -> pa.Table:
            out = []
            for row in batch.to_pylist():  # metadata-tier loop (≤P rows)
                pid = row["pid"]
                probs = []
                warns = []
                rows_seen = 0

                def check_file(t: pa.Table, what: str,
                               base_order: bool = False):
                    if not t.num_rows:
                        return
                    # schema: widen-only evolution means every on-disk
                    # column must be committed in the manifest with the
                    # same Arrow type (readers would NULL-pad around a
                    # rogue column and silently hide it)
                    for f in t.schema:
                        want = allowed_types.get(f.name)
                        if want is None:
                            probs.append(f"column {f.name!r} in {what} is "
                                         "not in the committed schema")
                        elif f.type != want and not pa.types.is_null(f.type):
                            # a null-typed column (Arrow's inference for an
                            # all-NULL batch) reads as NULL in any type —
                            # representable, not a drift
                            probs.append(
                                f"column {f.name!r} in {what} has type "
                                f"{f.type}, committed schema says {want}")
                    # base files follow the committed layout (merge key,
                    # or cluster_by when set); delta/dv files are always
                    # merge-key sorted (transient — the fold re-sorts)
                    if base_order and cluster:
                        if not is_lake_file_sorted(t, cluster):
                            desc = (f"zorder{cluster['columns']}"
                                    if isinstance(cluster, dict)
                                    else list(cluster))
                            warns.append(
                                f"{what} not sorted by committed "
                                f"cluster_by {desc}")
                    elif not is_merge_key_sorted(t):
                        warns.append(f"{what} not sorted by merge key")
                    # uniqueness within the file: every writer runs
                    # keep_last_per_key first, so an in-file duplicate
                    # key is a broken merge
                    uniq = pa.table({"c": t.column("conv_id"),
                                     "t": t.column("turn_idx")})
                    n_distinct = uniq.group_by(["c", "t"]).aggregate(
                        []).num_rows
                    if n_distinct != t.num_rows:
                        probs.append(
                            f"{t.num_rows - n_distinct} duplicate merge "
                            f"key(s) within {what}")
                    # watermark on the raw file (tombstones included)
                    mx = pc.max(t.column("lsn")).as_py()
                    if mx is not None and mx > row["watermark"]:
                        probs.append(
                            f"max lsn {mx} in {what} exceeds committed "
                            f"watermark {row['watermark']}")
                    # routing: recomputed pid must equal the owning pid.
                    # Conversation tombstones (turn == CONV_TOMBSTONE_TURN)
                    # are REPLICATED to every partition by design — exempt.
                    routable = t.filter(pc.not_equal(
                        t.column("turn_idx"),
                        pa.scalar(CONV_TOMBSTONE_TURN, pa.int32())))
                    routed = stage(routable)
                    wrong = pc.sum(pc.cast(pc.not_equal(
                        routed.column("_pid"),
                        pa.scalar(pid, pa.int32())), pa.int64())).as_py()
                    if wrong:
                        probs.append(f"{wrong} row(s) in {what} routed to "
                                     "another partition under the "
                                     "committed layout")

                base = None
                deltas = []
                if row["base"]:
                    base_full = os.path.join(lake_dir, row["base"])
                    base = pq.read_table(base_full)
                    rows_seen += base.num_rows
                    check_file(base, "base file", base_order=True)
                    if cluster and base.num_rows:
                        v, w = audit_bloom_sidecar(base_full, base)
                        if v:
                            probs.append(v)
                        if w:
                            warns.append(w)
                    if (text_idx and base.num_rows
                            and text_idx in base.schema.names):
                        v, w = audit_token_sidecar(base_full, base,
                                                   text_idx)
                        if v:
                            probs.append(v)
                        if w:
                            warns.append(w)
                for d in row["deltas"]:
                    t = pq.read_table(os.path.join(lake_dir, d))
                    rows_seen += t.num_rows
                    deltas.append(t)
                    check_file(t, f"delta file {os.path.basename(d)}")
                dvs = []
                for d in row["dvs"]:
                    t = pq.read_table(os.path.join(lake_dir, d))
                    rows_seen += t.num_rows
                    dvs.append(t)
                    # dv key files obey the same invariants as data files
                    # (schema-subset, in-file key uniqueness, lsn ≤
                    # watermark — a dv references APPLIED rows only —
                    # routing under the committed layout, sorted order)
                    check_file(t, f"dv file {os.path.basename(d)}")
                if constraints and (base is not None or deltas):
                    # committed expectations re-checked on the folded live
                    # view (no ``op`` column → value kinds only, not_null
                    # skipped — see Constraint.violations)
                    live = fold_partition_state(base, deltas, dvs=dvs)
                    for c in constraints:
                        n_v = int(c.violations(live).sum())
                        if n_v:
                            probs.append(
                                f"{n_v} live row(s) violate committed "
                                f"constraint {c.name}")
                out.append({"pid": pid, "rows": rows_seen,
                            "violations": "; ".join(probs),
                            "warnings": "; ".join(warns)})
            return pa.Table.from_pylist(out, schema=pa.schema([
                ("pid", pa.int64()), ("rows", pa.int64()),
                ("violations", pa.string()), ("warnings", pa.string())]))

        rows = _meta_items_dataset(
            items, extra_fields=(("watermark", pa.int64()),)).map_batches(
                check_part, batch_format="pyarrow",
                zero_copy_batch=True).take_all()
        violations = [{"pid": int(r["pid"]), "problems": r["violations"]}
                      for r in rows if r["violations"]]
        warnings_ = [{"pid": int(r["pid"]), "problems": r["warnings"]}
                     for r in rows if r["warnings"]]
        return {"partitions_checked": len(rows),
                "rows_checked": sum(int(r["rows"]) for r in rows),
                "violations": violations, "warnings": warnings_}

    def table_stats(self) -> "dict":
        """Operational health snapshot from the manifest alone (no data
        read — O(partitions) driver work even on a 100-TB lake):

        * rows / bytes totals and per-partition skew (max/mean row ratio —
          >2 suggests hot keys; pair with detect_hot_keys + salting or
          repartition_lake)
        * watermark spread (min/max last_applied_lsn): large spread means
          some partitions lag the stream — resume_lsn() is pinned to the
          minimum, so spread bounds the replay a restart re-reads
        * dlq backlog and retained time-travel versions
        """
        manifest = mf.read_manifest(self.lake_dir)
        parts = manifest.get("partitions", {})
        rows = [int(p.get("rows", 0)) for p in parts.values()]
        watermarks = [int(p.get("last_applied_lsn", -1)) for p in parts.values()]
        delta_files = delta_rows = dv_files = dv_rows = 0
        sizes = []
        for p in parts.values():
            for entry in [{"path": p.get("path")}, *p.get("deltas", []),
                          *p.get("dvs", [])]:
                path = entry.get("path")
                if not path:
                    continue
                try:
                    sizes.append(os.path.getsize(
                        os.path.join(self.lake_dir, path)))
                except OSError:
                    pass
            delta_files += len(p.get("deltas", []))
            delta_rows += sum(int(d.get("rows", 0))
                              for d in p.get("deltas", []))
            dv_files += len(p.get("dvs", []))
            dv_rows += sum(int(d.get("rows", 0)) for d in p.get("dvs", []))
        total_rows = sum(rows)
        n = len(parts)
        mean_rows = (total_rows / n) if n else 0.0
        return {
            "version": manifest.get("version", 0),
            "partitions": n,
            "rows": total_rows,
            "bytes": sum(sizes),
            "max_partition_rows": max(rows, default=0),
            "row_skew": round(max(rows, default=0) / mean_rows, 3)
            if mean_rows else 0.0,
            "watermark_min": min(watermarks, default=-1),
            "watermark_max": max(watermarks, default=-1),
            "watermark_spread": (max(watermarks, default=-1)
                                 - min(watermarks, default=-1)) if n else 0,
            "dlq_rows": sum(int(d.get("rows", 0))
                            for d in manifest.get("dlq", [])),
            # merge-on-read backlog: pending delta files awaiting
            # compact_deltas (read amplification grows with this count)
            "delta_files": delta_files,
            "delta_rows": delta_rows,
            # pending deletion vectors (delete_where mode='dv'); folded
            # away by the next base merge / compaction of each partition
            "dv_files": dv_files,
            "dv_rows": dv_rows,
            "retained_versions": len(mf.list_versions(self.lake_dir)),
            # committed commit-time expectations (constraint names; the
            # full specs live in the manifest)
            "constraints": [c.get("name", "")
                            for c in manifest.get("constraints", [])],
            # committed base-file layout (set_clustering); [] = merge key
            "cluster_by": list(manifest.get("cluster_by", [])),
            "cluster_mode": manifest.get("cluster_mode", "lex")
            if manifest.get("cluster_by") else "",
            # committed token skip index (set_text_index); "" = none
            "text_index": manifest.get("text_index", ""),
        }

    def _manifest_dataset(self, manifest: "dict", columns=None, where=None):
        import ray.data

        mcols = manifest_schema_columns(manifest)
        types = _manifest_types(manifest)
        if columns is not None:
            bad = [c for c in columns if c not in types]
            if bad:
                raise ValueError(f"unknown lake column(s) {bad}; "
                                 f"lake schema is {mcols}")
            columns = list(columns)
        if where:
            # predicate-pushdown read: always the per-partition fold path
            # (it owns the footer-stats pruning + post-fold mask); the fold
            # additionally needs the where columns — read them, drop after.
            # A where column the lake lacks is NOT read (it cannot be);
            # NULL never matches, so those partitions prune to empty.
            out_cols = columns if columns is not None else mcols
            need = list(dict.fromkeys(
                [*out_cols, *[c.column for c in where if c.column in types],
                 "conv_id", "turn_idx", "lsn"]))
            ds = self._fold_dataset(manifest, columns=need, where=where)
            if need == list(out_cols):
                return ds
            sel = list(out_cols)
            return ds.map_batches(lambda b: b.select(sel),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        if len(mcols) > len(LAKE_COLUMNS) \
                and not mf.has_deltas(manifest) and not mf.has_dvs(manifest):
            # evolved lake: base files written before a column widened the
            # schema predate it — the per-partition fold path pads them
            # with NULLs (plain read_parquet would fail on the mixed
            # schemas); partitions without deltas skip the fold itself
            return self._fold_dataset(manifest, columns=columns)
        if mf.has_deltas(manifest) or mf.has_dvs(manifest):
            # pending delta commits / deletion vectors: every read folds
            # base+deltas minus dvs per partition (merge-on-read) — no
            # shuffle, the manifest already names each partition's file set
            if columns is None:
                return self._fold_dataset(manifest)
            # the fold needs the merge key + lsn; read those, drop after
            need = list(dict.fromkeys(
                [*columns, "conv_id", "turn_idx", "lsn"]))
            ds = self._fold_dataset(manifest, columns=need)
            if need == columns:
                return ds
            sel = list(columns)
            return ds.map_batches(lambda b: b.select(sel),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        files = [os.path.join(self.lake_dir, p)
                 for p in mf.partition_files(manifest)]
        if not files:
            return ray.data.from_arrow(_empty_lake_table(columns))
        return ray.data.read_parquet(files, columns=columns)

    def _fold_dataset(self, manifest: "dict", columns=None, pids=None,
                      types=None, where=None):
        """Streaming merge-on-read scan: one fold task per partition reads
        that partition's base + delta files and emits its live state — the
        file→partition mapping comes from the manifest, so NO shuffle is
        needed (cf. the Hudi MOR read model: per-file-group merge).

        ``columns`` prunes the fold (must include the merge key + lsn when
        any partition has pending deltas); ``pids`` restricts to a
        partition subset (change-data-feed).  Files that predate an evolved
        column are read without it (footer-level column intersection, so
        the scan still prunes) and padded with NULLs.

        ``where``: AND'd Constraint list — each task first checks the
        partition's parquet FOOTER min/max stats against every spec and
        skips the partition unread when any spec is provably
        unsatisfiable (file-skipping for reads; dv key files are excluded
        from the ranges since they only ever REMOVE rows), then applies
        the exact conjunctive mask on the folded live state (SQL
        semantics: NULL never matches)."""
        import ray.data

        cols = (list(columns) if columns is not None
                else manifest_schema_columns(manifest))
        types = {**_manifest_types(manifest), **(types or {})}
        lake_dir = self.lake_dir
        items = []
        for pid, p in manifest["partitions"].items():
            if pids is not None and pid not in pids:
                continue
            if not p.get("path") and not p.get("deltas"):
                continue
            items.append({"pid": int(pid), "base": p.get("path") or "",
                          "deltas": [d["path"] for d in p.get("deltas", [])],
                          "dvs": [d["path"] for d in p.get("dvs", [])]})
        if not items:
            return ray.data.from_arrow(_empty_lake_table(cols, types))
        where_cols = sorted({c.column for c in where}) if where else []
        # has_token specs on the committed text_index column prune via the
        # token-bloom sidecar (min/max stats can't prove token absence)
        text_idx = text_index_of(manifest)
        idx_tokens = sorted({c.values[0] for c in (where or [])
                             if c.kind == "has_token"
                             and c.column == text_idx}) if text_idx else []

        def read_padded(rel: str, want: "list[str]") -> pa.Table:
            path = os.path.join(lake_dir, rel)
            have = set(pq.read_schema(path).names)  # footer only
            t = pq.read_table(path, columns=[c for c in want if c in have])
            return pad_to_schema(t, want, types)

        def apply_where(state: "pa.Table | None") -> "pa.Table | None":
            if not where or state is None or state.num_rows == 0:
                return state
            mask = np.ones(state.num_rows, dtype=bool)
            for c in where:
                mask &= c.matches(state)
            return state.filter(pa.array(mask))

        def fold_files(batch: pa.Table) -> pa.Table:
            outs = []
            # metadata-tier loop: ≤ num_partitions rows total, data-tier
            # work stays vectorized inside fold_partition_state
            for row in batch.to_pylist():
                clean = not row["deltas"] and not row["dvs"]
                if where and clean:
                    # zone-map read: a clean partition's base IS the live
                    # state (one row per key), so dropping a row group can
                    # never resurrect an older version — read only the
                    # groups whose footer stats admit every spec (the
                    # whole-file skip is the keep-nothing case)
                    if not row["base"]:
                        continue
                    base_full = os.path.join(lake_dir, row["base"])
                    pf = pq.ParquetFile(base_full)
                    keep = _matching_row_groups(pf, where)
                    if keep and idx_tokens:
                        tk = token_candidate_groups(
                            base_full, idx_tokens,
                            pf.metadata.num_row_groups)
                        if tk is not None:  # usable sidecar: intersect
                            tk_set = set(tk)
                            keep = [g for g in keep if g in tk_set]
                    if not keep:
                        continue
                    have = set(pf.schema_arrow.names)
                    t = pf.read_row_groups(
                        keep, columns=[c for c in cols if c in have])
                    base = apply_where(pad_to_schema(t, cols, types))
                    if base is not None and base.num_rows:
                        outs.append(base)
                    continue
                if where:
                    # versioned inputs (pending deltas/dvs): prune at the
                    # whole-partition tier only, fold, then mask exact
                    files = [p for p in [row["base"], *row["deltas"]] if p]
                    ranges = _footer_ranges(lake_dir, files, where_cols)
                    if not all(c.range_possible(ranges.get(c.column))
                               for c in where):
                        continue  # footer stats prove no row can match
                base = read_padded(row["base"], cols) if row["base"] else None
                if clean:
                    # no pending deltas/dvs: the base IS the live state —
                    # skip the fold's sort entirely (the evolved-schema
                    # read path routes here for every clean partition)
                    if base is not None and base.num_rows:
                        outs.append(base)
                    continue
                deltas = [read_padded(d, ["op", *cols])
                          for d in row["deltas"]]
                dvs = [pq.read_table(os.path.join(lake_dir, d))
                       for d in row["dvs"]]
                folded = fold_partition_state(base, deltas, columns=cols,
                                              types=types, dvs=dvs)
                folded = apply_where(folded)
                if folded.num_rows:
                    outs.append(folded)
            if not outs:
                return _empty_lake_table(cols, types)
            return pa.concat_tables(outs, promote_options="permissive")

        return _meta_items_dataset(items).map_batches(
            fold_files, batch_format="pyarrow",
            zero_copy_batch=True)

    def export_formatted(self, out_dir: str, to_format: str = "%Y-%m-%d %H:%M:%S.%6N %z",
                         to_timezone: str = "UTC") -> None:
        """Export the lake with `ts` re-rendered through the reference
        competency (timestamp → string via the configured to_format) —
        lake read → TimestampFormatStage → partitioned parquet, streaming."""
        from embulk_filter_timestamp_format_ray.config import ColumnConfig, TaskConfig
        from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
            TimestampFormatStage,
        )

        task = TaskConfig(columns=(
            ColumnConfig("ts", "string", to_format=to_format,
                         to_timezone=to_timezone),))
        ds = self.read_lake().map_batches(
            TimestampFormatStage(task), batch_format="pyarrow",
            zero_copy_batch=True)
        ds.write_parquet(out_dir)

    def read_conversation(self, conv_id: str) -> pa.Table:
        """Point lookup of one conversation's turns.

        conv-mode lakes read only the partition files that can own the
        conversation — one file normally, the salt-candidate set for hot
        (salted) conversations; turn-mode lakes must filter the full lake
        (the documented layout tradeoff)."""
        from embulk_filter_timestamp_format_ray.stages.partition import (
            candidate_pids_for_conv,
        )

        manifest = mf.read_manifest(self.lake_dir)
        self.check_manifest_compat(manifest)
        # parquet predicate pushdown: every lake file (base AND delta) is
        # written sorted by (conv_id, turn_idx), so conv_id row-group
        # statistics prune to ~one row group per file — the equality filter
        # selects whole merge-key groups, so it commutes with the fold.
        # CLUSTERED bases scatter a conversation across groups (conv_id
        # stats widen); their bloom sidecar restores group-level pruning.
        flt = [("conv_id", "==", conv_id)]
        clustered = bool(manifest.get("cluster_by"))

        def load_base(rel: str) -> "pa.Table | None":
            full = os.path.join(self.lake_dir, rel)
            if clustered:
                pf = pq.ParquetFile(full)
                cands = bloom_candidate_groups(
                    full, conv_id, pf.metadata.num_row_groups)
                if cands is not None:
                    if not cands:
                        return pf.schema_arrow.empty_table()
                    t = pf.read_row_groups(cands)
                    return t.filter(pc.equal(t.column("conv_id"), conv_id))
            return pq.read_table(full, filters=flt)

        def load(meta: "dict") -> "pa.Table | None":
            # point-lookup tier: read base + pending deltas and fold (the
            # merge-on-read contract holds for every read path); the
            # conv_id equality filter commutes with the dv pre-filter
            # because both are merge-key-scoped
            base = load_base(meta["path"]) if meta.get("path") else None
            if meta.get("deltas") or meta.get("dvs"):
                pend = [pq.read_table(os.path.join(self.lake_dir, d["path"]),
                                      filters=flt)
                        for d in meta.get("deltas", [])]
                dvs = [pq.read_table(os.path.join(self.lake_dir, d["path"]),
                                     filters=flt)
                       for d in meta.get("dvs", [])]
                return fold_partition_state(base, pend, dvs=dvs)
            return base

        if self.partition_mode == "conv":
            pids = candidate_pids_for_conv(conv_id, self.num_partitions,
                                           self.salt_keys, self.salt_factor)
            metas = [manifest["partitions"].get(str(pid)) for pid in pids]
        else:
            metas = list(manifest["partitions"].values())
        tables = [t for t in (load(m) for m in metas if m) if t is not None]
        if not tables:
            return pa.table({})
        t = pa.concat_tables(tables, promote_options="permissive")
        t = t.filter(pc.equal(t.column("conv_id"), conv_id))
        return t.take(pc.sort_indices(t, sort_keys=[("turn_idx", "ascending")]))

    def write_sorted(self, out_dir: str) -> None:
        """Scale path for the verification read: distributed sort by
        (conv_id, turn_idx) streamed straight to parquet — nothing
        materializes on the driver (use this instead of final_state_sorted
        beyond test scale)."""
        self.read_lake().sort(["conv_id", "turn_idx"]).write_parquet(out_dir)

    def final_state_sorted(self) -> pa.Table:
        """Verification read: stable (conv_id, turn_idx) ordering."""
        ds = self.read_lake().sort(["conv_id", "turn_idx"])
        batches = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                   for b in ds.iter_batches(batch_format="pyarrow")]
        if not batches:
            schema = pa.schema([
                ("conv_id", pa.string()), ("turn_idx", pa.int32()),
                ("role", pa.string()), ("text", pa.string()),
                ("tool", pa.string()), ("ts", _TS_NS_UTC), ("lsn", pa.int64()),
            ])
            return pa.table({f.name: pa.array([], f.type) for f in schema})
        return pa.concat_tables(batches, promote_options="permissive")
