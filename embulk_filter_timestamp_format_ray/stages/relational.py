"""Generic relational operators, Ray-Data-first.

These are engine capabilities beyond the reference's single filter operator
(SURVEY.md §2.8: the missing categories supplied by the north rule).

Design notes for 100 TB scale:
* ``grouped_aggregate`` pre-aggregates INSIDE ``map_batches`` (combiner),
  so the all-to-all shuffle moves only #groups x #blocks partial rows, not
  the raw table — the canonical partial/combine split.
* ``latest_by_key`` is the stateless form of the CDC merge (last-write-wins
  by a sequence column with optional delete predicate); it shuffles only the
  key/seq/payload columns you select upstream.
* ``sessionize`` is a per-key windowed aggregate via ``map_groups``
  (partition-local sort, no global sort).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_AGG_FUNCS = {"sum", "count", "min", "max"}

# Keyed-window operators (sessionize, asof_join) process one key's rows in
# one task; a skewed key that outgrows this bound will eventually OOM a
# worker — surface it in logs long before that (same guard as the CDC merge
# stage's GROUP_ROWS_WARN, pipelines/cdc.py).
KEY_GROUP_ROWS_WARN = 5_000_000


def warn_large_key_group(n_rows: int, op: str, key_desc: str,
                         cap: "int | None" = None) -> None:
    if cap is None:
        cap = KEY_GROUP_ROWS_WARN  # read at call time (tests tune it)
    if n_rows > cap:
        logger.warning(
            "%s: key group %s holds %d rows (> %d) — a single task must "
            "sort/scan it all; salt or pre-split this hot key before the "
            "group outgrows worker memory", op, key_desc, n_rows, cap)


class _PartialAgg:
    """map_batches combiner: batch → per-group partial aggregate rows."""

    def __init__(self, keys, aggs):
        self.keys = list(keys)
        self.aggs = aggs  # out_name -> (col, fn)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = []
        for out, (col, fn) in self.aggs.items():
            if fn == "count":
                # count via summing ones (merges associatively downstream)
                batch = batch.append_column(f"__one_{out}", pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)))
                cols.append((f"__one_{out}", "sum", out))
            else:
                cols.append((col, fn, out))
        gb = batch.group_by(self.keys)
        agg_spec = [(c, fn) for c, fn, _ in cols]
        out_tbl = gb.aggregate(agg_spec)
        renames = {f"{c}_{fn}": out for c, fn, out in cols}
        names = [renames.get(nm, nm) for nm in out_tbl.schema.names]
        return out_tbl.rename_columns(names)


def hash_key_columns(batch: pa.Table, keys: "list[str]") -> np.ndarray:
    """Deterministic uint64 row hash over an arbitrary key-column tuple
    (strings via the partition hasher, numerics/timestamps via their int64
    bits) — the shuffle key for sharded combines."""
    from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64
    from embulk_filter_timestamp_format_ray.stages.partition import (
        hash_strings_dict,
    )

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for i, k in enumerate(keys):
        col = batch.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            ch = hash_strings_dict(col)
        else:
            # any deterministic value→shard map works (collisions only
            # co-locate groups, never split one): int64 bits for ints /
            # timestamps, truncation for the rare float key
            if pa.types.is_timestamp(t):
                col = col.cast(pa.int64())
            ints = np.asarray(pc.fill_null(col.cast(pa.int64()), 0))
            ch = ints.astype(np.uint64)
        h = splitmix64(h ^ splitmix64(ch, 41 + i), 53 + i)
    return h


_COMBINE_SHARDS = 128


def grouped_aggregate(ds, keys, aggs: "dict[str, tuple[str, str]]",
                      shards: "int | None" = None):
    """ds.groupby(keys) with map-side partial aggregation.

    aggs: {output_name: (input_col, fn)} with fn in sum/count/min/max.

    Combine shape (r2): partials shuffle by an int32 key-hash shard (one
    cheap single-key exchange into ~_COMBINE_SHARDS groups), and each shard
    runs ONE Arrow C++ hash aggregate over all its groups.  Ray's native
    multi-key sort aggregate measured ~10× slower on 95k partial rows (the
    multi-column sort dominates); this keeps the combine a hash aggregate
    end-to-end, which is also how it stays cheap at 10^9 groups.

    ``shards`` caps the combine fan-out: when the caller KNOWS the group
    count is tiny (k-means clusters, per-bucket totals), 128 combine tasks
    are pure overhead — pass ~#groups instead."""
    keys = list(keys)
    n_shards = int(shards) if shards else _COMBINE_SHARDS
    for out, (_, fn) in aggs.items():
        if fn not in _AGG_FUNCS:
            raise ValueError(f"unsupported agg {fn} for {out}")
    ds = ds.map_batches(_PartialAgg(keys, aggs), batch_format="pyarrow",
                        zero_copy_batch=True)

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (hash_key_columns(b, keys)
                 % np.uint64(n_shards)).astype(np.int32)
        return b.append_column("_shard", pa.array(shard))

    # merge fn per output: partial sums/counts re-sum; min/max re-min/max
    merge_spec = [(out, "sum" if fn in ("sum", "count") else fn)
                  for out, (_, fn) in aggs.items()]

    def combine(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        out_tbl = g.group_by(keys).aggregate(merge_spec)
        renames = {f"{out}_{fn}": out for out, fn in merge_spec}
        names = [renames.get(nm, nm) for nm in out_tbl.schema.names]
        out_tbl = out_tbl.rename_columns(names)
        # stable column order: keys then aggs as declared
        return out_tbl.select(keys + list(aggs))

    ds = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("_shard").map_groups(combine, batch_format="pyarrow")


def rollup_aggregate(ds, keys, aggs: "dict[str, tuple[str, str]]",
                     lvl_col: str = "lvl", shards: "int | None" = None):
    """SQL GROUP BY ROLLUP: aggregates at every key prefix level —
    (k1..kn), (k1..kn-1), …, grand total — in ONE pass over the data.

    The finest level is a distributed ``grouped_aggregate``; each coarser
    level then folds the PREVIOUS level's already-aggregated rows (group
    counts, not input rows — associative sum/count→sum/min/max merges), so
    the input dataset is scanned exactly once regardless of depth.  Rolled-
    away key columns are NULL (SQL ROLLUP convention) and ``lvl_col`` holds
    the number of active keys (n .. 0, the GROUPING-function analog), which
    disambiguates rollup NULLs from genuine NULL key values.

    aggs fns: sum/count/min/max.  avg is deliberately absent — roll up
    sum+count and divide at the edge (non-associative otherwise)."""
    keys = list(keys)
    if not keys:
        raise ValueError("rollup_aggregate needs at least one key")
    # key dtypes for typed NULL padding at coarser levels (schema() is
    # metadata for parquet-backed datasets, not an execution)
    schema = ds.schema()
    key_types = {k: schema.base_schema.field(k).type
                 if hasattr(schema, "base_schema") else schema.field(k).type
                 for k in keys}
    # how each level's outputs merge into the next-coarser level
    merge_aggs = {out: (out, "sum" if fn in ("sum", "count") else fn)
                  for out, (_, fn) in aggs.items()}

    def leveled(level_ds, active: "list[str]", lvl: int):
        def pad(b: pa.Table) -> pa.Table:
            cols = {k: (b.column(k) if k in active
                        else pa.nulls(b.num_rows, key_types[k]))
                    for k in keys}
            cols[lvl_col] = pa.array(np.full(b.num_rows, lvl, dtype=np.int64))
            for out in aggs:
                cols[out] = b.column(out)
            return pa.table(cols)

        return level_ds.map_batches(pad, batch_format="pyarrow",
                                    zero_copy_batch=True)

    # materialize each level: the lineage is reused by BOTH the union
    # branch and the next-coarser fold, and Ray Datasets are lazy — without
    # pinning, every level re-executes the full upstream scan+shuffle
    # (measured 30s → 4s on the sf0.1 rollup_sales).  Safe at any input
    # size: these are group-count-sized aggregates, not input-sized data.
    finest = grouped_aggregate(ds, keys, aggs, shards=shards).materialize()
    out = leveled(finest, keys, len(keys))
    prev = finest
    for i in range(len(keys) - 1, -1, -1):
        active = keys[:i]
        if active:
            prev = grouped_aggregate(prev, active, merge_aggs,
                                     shards=shards).materialize()
        else:
            # grand total: constant-key aggregate, then drop the key
            def add_all(b: pa.Table) -> pa.Table:
                return b.append_column("_all", pa.array(
                    np.zeros(b.num_rows, dtype=np.int64)))

            prev = grouped_aggregate(
                prev.map_batches(add_all, batch_format="pyarrow",
                                 zero_copy_batch=True),
                ["_all"], merge_aggs, shards=1,
            ).map_batches(lambda b: b.drop_columns(["_all"]),
                          batch_format="pyarrow", zero_copy_batch=True)
        out = out.union(leveled(prev, active, i))
    return out


def grouping_sets_aggregate(ds, keys, sets,
                            aggs: "dict[str, tuple[str, str]]",
                            id_col: str = "grouping_id",
                            shards: "int | None" = None):
    """SQL GROUP BY GROUPING SETS: one aggregate per key subset in ONE
    input scan.  The finest aggregate (over the union of all keys) runs
    distributed once and is pinned (DESIGN #31); every requested subset
    then folds from those group-count-sized rows — sum/count re-sum,
    min/max re-min/max, all associative.

    ``id_col`` carries the standard GROUPING_ID bitmask (bit for keys[i]
    set when keys[i] is rolled away; keys[0] is the most significant bit,
    matching DuckDB/Postgres ``GROUPING(k1, …, kn)``), which disambiguates
    subset NULL padding from genuine NULL key values.

    aggs fns: sum/count/min/max (avg is non-associative — roll up
    sum+count and divide at the edge)."""
    keys = list(keys)
    if not keys:
        raise ValueError("grouping_sets_aggregate needs at least one key")
    norm_sets = []
    for s in sets:
        s = list(s)
        if any(k not in keys for k in s):
            raise ValueError(f"grouping set {s} has keys outside {keys}")
        if len(set(s)) != len(s):
            raise ValueError(f"grouping set {s} repeats a key")
        norm_sets.append(s)
    if not norm_sets:
        raise ValueError("need at least one grouping set")
    schema = ds.schema()
    key_types = {k: schema.base_schema.field(k).type
                 if hasattr(schema, "base_schema") else schema.field(k).type
                 for k in keys}
    merge_aggs = {out: (out, "sum" if fn in ("sum", "count") else fn)
                  for out, (_, fn) in aggs.items()}
    n = len(keys)

    def padded(level_ds, active: "list[str]"):
        gid = sum(1 << (n - 1 - i) for i, k in enumerate(keys)
                  if k not in active)

        def pad(b: pa.Table) -> pa.Table:
            cols = {k: (b.column(k) if k in active
                        else pa.nulls(b.num_rows, key_types[k]))
                    for k in keys}
            cols[id_col] = pa.array(np.full(b.num_rows, gid, dtype=np.int64))
            for out in aggs:
                cols[out] = b.column(out)
            return pa.table(cols)

        return level_ds.map_batches(pad, batch_format="pyarrow",
                                    zero_copy_batch=True)

    finest = grouped_aggregate(ds, keys, aggs, shards=shards).materialize()
    out = None
    for s in norm_sets:
        if set(s) == set(keys):
            level = finest
        elif s:
            level = grouped_aggregate(finest, s, merge_aggs, shards=shards)
        else:
            def add_all(b: pa.Table) -> pa.Table:
                return b.append_column("_all", pa.array(
                    np.zeros(b.num_rows, dtype=np.int64)))

            level = grouped_aggregate(
                finest.map_batches(add_all, batch_format="pyarrow",
                                   zero_copy_batch=True),
                ["_all"], merge_aggs, shards=1,
            ).map_batches(lambda b: b.drop_columns(["_all"]),
                          batch_format="pyarrow", zero_copy_batch=True)
        lv = padded(level, s)
        out = lv if out is None else out.union(lv)
    return out


def cube_aggregate(ds, keys, aggs: "dict[str, tuple[str, str]]",
                   id_col: str = "grouping_id",
                   shards: "int | None" = None):
    """SQL GROUP BY CUBE: every subset of ``keys`` (2^n grouping sets) —
    the lattice folds entirely from one pinned finest aggregate, so input
    is scanned once regardless of n."""
    from itertools import combinations

    keys = list(keys)
    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, sets, aggs, id_col=id_col,
                                   shards=shards)


def _same_as_prev_row(tbl: pa.Table, keys: "list[str]") -> np.ndarray:
    """Boolean mask (len n): row i has the same key tuple as row i-1
    (tbl must already be sorted by keys).  mask[0] is always False."""
    n = tbl.num_rows
    same = np.zeros(n, dtype=bool)
    if n <= 1:
        return same
    same[1:] = True
    for k in keys:
        col = tbl.column(k).combine_chunks()
        enc = pc.dictionary_encode(col) if pa.types.is_string(col.type) else None
        v = np.asarray(enc.indices.cast(pa.int64()) if enc is not None
                       else col.cast(pa.int64()))
        same[1:] &= v[:-1] == v[1:]
    return same


def _with_key_shard(ds, keys: "list[str]"):
    def add(b: pa.Table) -> pa.Table:
        shard = (hash_key_columns(b, keys)
                 % np.uint64(_COMBINE_SHARDS)).astype(np.int32)
        return b.append_column("_shard", pa.array(shard))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def latest_by_key(ds, keys, seq_col: str, delete_expr=None):
    """Last-write-wins upsert view: keep the max-`seq_col` row per key;
    optionally drop winners matching ``delete_expr`` (a callable
    pa.Table → BooleanArray marking deletes).

    Map-side combined: each block collapses to one winner per key before the
    shuffle (winner-of-winners is the global winner — associative), so the
    exchange carries ≤1 row per key per block.  The reduce runs per HASH
    SHARD (one vectorized sort + run-mask over all of a shard's keys), not
    one Python callback per key."""
    keys = list(keys)

    def winners_sorted(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl, sort_keys=[(k, "ascending") for k in keys]
            + [(seq_col, "ascending")])
        b = tbl.take(order)
        if b.num_rows == 0:
            return b
        same = _same_as_prev_row(b, keys)
        last = np.ones(b.num_rows, dtype=bool)
        last[:-1] = ~same[1:]
        return b.filter(pa.array(last))

    def local_winners(batch: pa.Table) -> pa.Table:
        # combiner: winner-per-key per block. Deletes are NOT filtered here —
        # a local delete winner must still travel as a tombstone to beat
        # older upserts living in other blocks.
        return winners_sorted(batch)

    def shard_winners(group: pa.Table) -> pa.Table:
        w = winners_sorted(group.drop_columns(["_shard"]))
        if delete_expr is not None and w.num_rows:
            w = w.filter(pc.invert(delete_expr(w)))
        return w

    ds = ds.map_batches(local_winners, batch_format="pyarrow", zero_copy_batch=True)
    ds = _with_key_shard(ds, keys)
    return ds.groupby("_shard").map_groups(shard_winners, batch_format="pyarrow")



def scd2_history(ds, keys, seq_col: str, delete_expr=None,
                 valid_from: str = "valid_from", valid_to: str = "valid_to",
                 current_flag: str = "is_current"):
    """Slowly-changing-dimension TYPE 2 history from a CDC stream: one row
    per key VERSION with its validity interval ``[valid_from, valid_to)`` in
    ``seq_col`` units (``valid_to`` NULL = still open) and an ``is_current``
    flag — the engine analog of Delta Live Tables' ``APPLY CHANGES ... STORED
    AS SCD TYPE 2``.

    Semantics (matching the CDC merge's LSN ordering):
    * every event opens a version at its own ``seq_col``;
    * the NEXT event on the same key (upsert OR delete) closes it —
      ``valid_to`` = that event's seq;
    * delete events (``delete_expr`` rows) close their predecessor but emit
      no version row themselves; a later upsert on the key re-opens history;
    * ``is_current`` = the key's last event was an upsert and this is it.

    Scale shape: unlike ``latest_by_key`` there is no map-side combiner —
    every version row survives by definition — so this is ONE all-to-all
    hash-shard exchange of the selected columns (prune upstream!), then a
    single vectorized sort + shift per shard.  No per-key Python callbacks,
    no global sort."""
    keys = list(keys)

    def shard_intervals(group: pa.Table) -> pa.Table:
        tbl = group.drop_columns(["_shard"])
        order = pc.sort_indices(
            tbl, sort_keys=[(k, "ascending") for k in keys]
            + [(seq_col, "ascending")])
        b = tbl.take(order)
        n = b.num_rows
        seq = np.asarray(b.column(seq_col).combine_chunks().cast(pa.int64()))
        same = _same_as_prev_row(b, keys)
        # valid_to[i] = seq[i+1] when row i+1 is the same key, else NULL
        vto = np.empty(n, dtype=np.int64)
        has_next = np.zeros(n, dtype=bool)
        if n > 1:
            vto[:-1] = seq[1:]
            has_next[:-1] = same[1:]
        vto_arr = pa.array(vto, type=pa.int64(),
                           mask=~has_next)  # mask=True → NULL
        out = b.append_column(valid_from, b.column(seq_col).cast(pa.int64()))
        out = out.append_column(valid_to, vto_arr)
        out = out.append_column(current_flag, pa.array(~has_next))
        if delete_expr is not None and n:
            out = out.filter(pc.invert(delete_expr(out)))
        return out

    ds = _with_key_shard(ds, keys)
    return ds.groupby("_shard").map_groups(shard_intervals,
                                           batch_format="pyarrow")


def profile_table(ds, columns) -> pa.Table:
    """Per-column data profile: one output row per profiled column with
    ``column_name, n_rows, n_nulls, min_str, max_str, n_distinct`` (min/max
    canonically stringified so heterogeneous column types share one schema).

    Scale shape: pass A is a ``map_batches`` partial — ONE typed stats row
    per block — folded on the driver (#blocks × #columns scalars,
    aggregate-sized by construction).  Pass B computes EXACT distinct
    counts: per-block ``pc.unique`` (combiner) → ``(column, value)``
    groupby → per-column count; the exchange carries the distinct set
    itself, which is the irreducible cost of exactness — at vocabulary
    scale use the HLL sketch tier (``stages/text_stats.py hll_distinct``)
    instead.  Input scans twice (two passes over a lazy Dataset re-execute
    lineage; profiling is a maintenance op, DESIGN #31 applies)."""
    cols = list(columns)

    def partial(b: pa.Table) -> pa.Table:
        arrs = {"n": pa.array([b.num_rows], pa.int64())}
        for c in cols:
            col = b.column(c)
            mm = pc.min_max(col)
            arrs[c + "::nulls"] = pa.array([col.null_count], pa.int64())
            arrs[c + "::min"] = pa.array([mm["min"].as_py()], type=col.type)
            arrs[c + "::max"] = pa.array([mm["max"].as_py()], type=col.type)
        return pa.table(arrs)

    def melt_unique(b: pa.Table) -> pa.Table:
        pieces = []
        for c in cols:
            u = pc.unique(b.column(c).combine_chunks()).drop_null()
            s = pc.cast(u, pa.string())
            pieces.append(pa.table({
                "column_name": pa.array([c] * len(s), pa.string()),
                "value": s}))
        return pa.concat_tables(pieces)

    stats = pa.concat_tables(_iter_arrow(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)))

    pairs = ds.map_batches(melt_unique, batch_format="pyarrow",
                           zero_copy_batch=True)
    per_value = pairs.groupby(["column_name", "value"]).count()
    nd_tbl = pa.concat_tables(
        _iter_arrow(per_value.groupby("column_name").count()))
    nd = {r["column_name"]: r["count()"] for r in nd_tbl.to_pylist()}

    n_rows = int(pc.sum(stats.column("n")).as_py() or 0)
    rows = {"column_name": [], "n_rows": [], "n_nulls": [], "min_str": [],
            "max_str": [], "n_distinct": []}
    for c in cols:
        mn = pc.min(stats.column(c + "::min"))
        mx = pc.max(stats.column(c + "::max"))
        rows["column_name"].append(c)
        rows["n_rows"].append(n_rows)
        rows["n_nulls"].append(int(pc.sum(stats.column(c + "::nulls")).as_py() or 0))
        rows["min_str"].append(pc.cast(mn, pa.string()).as_py())
        rows["max_str"].append(pc.cast(mx, pa.string()).as_py())
        rows["n_distinct"].append(int(nd.get(c, 0)))
    return pa.table({
        "column_name": pa.array(rows["column_name"], pa.string()),
        "n_rows": pa.array(rows["n_rows"], pa.int64()),
        "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
        "min_str": pa.array(rows["min_str"], pa.string()),
        "max_str": pa.array(rows["max_str"], pa.string()),
        "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
    })


def _iter_arrow(ds):
    """Yield a Dataset's blocks as pyarrow Tables (driver-side; callers must
    be aggregate-sized — see profile_table's contract)."""
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        yield b


def resolve_broadcast(ref):
    """Unwrap a ``ray.ObjectRef`` broadcast via ``ray.put`` (passthrough
    for plain values) — the single lazy-bind step every broadcast-consuming
    stage shares."""
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except Exception:
        pass
    return ref


class BroadcastJoinStage:
    """map_batches inner/left join against a SMALL build side broadcast once
    via ``ray.put`` — the scale-correct alternative to a shuffle join when
    one side fits in memory (dimension tables, lookup maps).  The build-side
    index is constructed once per worker from the shared object-store copy,
    never re-shipped per batch."""

    def __init__(self, small_ref, on: str, how: str = "inner",
                 suffix: str = "_r"):
        self.small_ref = small_ref  # ray.ObjectRef | pa.Table
        self.on = on
        self.how = how
        self.suffix = suffix
        self._small = None

    def _table(self) -> pa.Table:
        if self._small is None:
            self._small = resolve_broadcast(self.small_ref)
        return self._small

    def __call__(self, batch: pa.Table) -> pa.Table:
        small = self._table()
        right = small.rename_columns([
            c if c == self.on else (c + self.suffix if c in batch.schema.names else c)
            for c in small.schema.names
        ])
        return batch.join(right, keys=self.on, join_type=self.how)


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a small pyarrow table (broadcast once).
    ``how`` accepts arrow join types plus 'semi'/'anti' (membership filters
    implemented as vectorized is_in masks — no payload columns move)."""
    if how in ("semi", "anti"):
        keys = small.column(on)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        try:
            import ray

            ref = ray.put(keys)
        except Exception:
            ref = keys

        class _MembershipFilter:
            def __init__(self):
                self._keys = None

            def _value_set(self):
                if self._keys is None:
                    k = ref
                    try:
                        import ray as _ray

                        if isinstance(k, _ray.ObjectRef):
                            k = _ray.get(k)
                    except Exception:
                        pass
                    self._keys = k
                return self._keys

            def __call__(self, batch: pa.Table) -> pa.Table:
                # null keys match nothing: dropped by semi, kept by anti
                # (DuckDB SEMI/ANTI JOIN semantics, same as _shuffle_semi_anti)
                mask = pc.fill_null(pc.is_in(
                    batch.column(on), value_set=self._value_set()), False)
                if how == "anti":
                    mask = pc.invert(mask)
                return batch.filter(mask)

        return ds.map_batches(_MembershipFilter(), batch_format="pyarrow",
                              zero_copy_batch=True)
    try:
        import ray

        ref = ray.put(small)
    except Exception:
        ref = small
    return ds.map_batches(BroadcastJoinStage(ref, on, how),
                          batch_format="pyarrow", zero_copy_batch=True)


def explode_list(ds, list_col: str, out_col: "str | None" = None):
    """Flatten a list column to one row per element (flat_map analog),
    vectorized via ListArray offsets — parent columns are gathered with a
    single take, never per-row Python."""
    out_col = out_col or list_col

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = col.values
        offsets = np.asarray(col.offsets)
        lengths = np.diff(offsets)
        parent_idx = np.repeat(np.arange(batch.num_rows), lengths)
        out = {}
        for name in batch.schema.names:
            if name == list_col:
                continue
            out[name] = batch.column(name).take(pa.array(parent_idx))
        out[out_col] = values
        return pa.table(out)

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def distinct(ds, cols):
    """Distinct rows over ``cols``: project early (shuffle only the key
    columns), local distinct per block, then one Arrow hash-distinct per
    hash shard — never a Python callback per distinct value."""
    cols = list(cols)
    ds = ds.map_batches(lambda b: b.select(cols).group_by(cols).aggregate([]),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = _with_key_shard(ds, cols)
    return ds.groupby("_shard").map_groups(
        lambda g: g.drop_columns(["_shard"]).group_by(cols).aggregate([])
        .select(cols),
        batch_format="pyarrow")


def top_k_by_group(ds, keys, order_col: str, k: int, descending: bool = True,
                   tie_col: "str | None" = None):
    """Per-group top-k rows by ``order_col`` with deterministic tie-breaks.

    Map-side combiner: each batch keeps only its local per-group top-k, so
    the shuffle carries at most k rows per group per block."""
    keys = list(keys)
    direction = "descending" if descending else "ascending"
    sort_keys = [(order_col, direction)]
    if tie_col:
        sort_keys.append((tie_col, "ascending"))

    def _run_pos(b: pa.Table) -> np.ndarray:
        """Position of each row within its key run (b sorted by keys)."""
        same = _same_as_prev_row(b, keys)
        idx = np.arange(b.num_rows, dtype=np.int64)
        run_start_idx = np.maximum.accumulate(np.where(~same, idx, 0))
        return idx - run_start_idx

    def local_topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[(c, "ascending") for c in keys]
                                + sort_keys)
        b = batch.take(order)
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(_run_pos(b) < k))

    ds = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    ds = _with_key_shard(ds, keys)

    def shard_topk(group: pa.Table) -> pa.Table:
        # all of this shard's groups at once: sort by keys + order, keep the
        # first k of each run, rank = within-run position + 1
        g = group.drop_columns(["_shard"])
        order = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in keys]
                                + sort_keys)
        g = g.take(order)
        if g.num_rows == 0:
            return g.append_column("rank", pa.array([], pa.int64()))
        pos = _run_pos(g)
        keep = pos < k
        return g.filter(pa.array(keep)).append_column(
            "rank", pa.array(pos[keep] + 1))

    return ds.groupby("_shard").map_groups(shard_topk, batch_format="pyarrow")


def _shuffle_semi_anti(left, right, on: str, how: str,
                       right_on: "str | None" = None):
    """Distributed semi/anti membership filter for two LARGE datasets —
    the fallback when the right side outgrows ``broadcast_join``'s key-set
    broadcast.  The right side projects to its key column only, both sides
    union under a side tag, ONE hash-shard shuffle co-locates equal keys,
    and each shard filters its left rows with a vectorized ``is_in``
    against the shard's right keys.  No aggregator actors (Ray's native
    join doesn't do semi/anti), no driver materialization; only the left
    payload + right keys move.  Null left keys match nothing: dropped by
    semi, kept by anti."""
    rk = right_on or on
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right = right.select_columns([rk])

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in left_names}
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: (b.column(rk).cast(left_types[on]) if c == on
                    else pa.nulls(n, left_types[c])) for c in left_names}
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    left_t = left.map_batches(tag_left, batch_format="pyarrow",
                              zero_copy_batch=True)
    right_t = right.map_batches(tag_right, batch_format="pyarrow",
                                zero_copy_batch=True)
    unioned = _with_key_shard(left_t.union(right_t), [on])

    def filter_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        side = np.asarray(g.column("__side"))
        left_rows = g.filter(pa.array(side == 0)).drop_columns(["__side"])
        if left_rows.num_rows == 0:
            return left_rows
        right_keys = g.column(on).filter(pa.array(side == 1))
        mask = pc.fill_null(pc.is_in(
            left_rows.column(on),
            value_set=right_keys.combine_chunks().unique()), False)
        if how == "anti":
            mask = pc.invert(mask)
        return left_rows.filter(mask)

    return unioned.groupby("_shard").map_groups(filter_shard,
                                                batch_format="pyarrow")


def top_k_global(ds, order_col: str, k: int, descending: bool = True,
                 tie_cols: "tuple[str, ...]" = ()):
    """Global top-k rows with deterministic tie-breaks — no global sort.

    Combiner shape: each block keeps its local top-k (≤ k rows per block
    survive), the ≤ k x blocks partial winners coalesce into ONE task, and
    a final local top-k finishes.  The driver never touches rows."""
    direction = "descending" if descending else "ascending"
    sort_keys = [(order_col, direction)] + [(c, "ascending")
                                            for c in tie_cols]

    def local_topk(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b, sort_keys=sort_keys)
        return b.take(order.slice(0, k))

    ds = ds.map_batches(local_topk, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
    return ds.repartition(1).map_batches(local_topk, batch_format="pyarrow",
                                         zero_copy_batch=True,
                                         batch_size=None)


def shuffle_join_partitions(total_cpus: int, num_nodes: int = 1,
                            per_node_cap: int = 16) -> int:
    """Partition-count policy for Ray's native hash join.  Each partition
    pins ONE long-lived aggregator actor holding a CPU for the pipeline
    lifetime, so the count must stay well under the cluster CPU count
    (measured: two chained joins at 2×cpus partitions spawned 128 actors on
    a 32-cpu box and hung).  The cap scales with node count —
    ``per_node_cap`` aggregators per node — instead of a flat global 16, so
    a 512-core / 16-node cluster gets 256 partitions while a single dev box
    keeps the measured ≤ cpus/2 starvation guard."""
    return max(2, min(total_cpus // 2, per_node_cap * max(num_nodes, 1)))


# A right side under this many FILE bytes (parquet footer-level probe, no
# execution) broadcasts instead of shuffling: Ray's native hash join pins one
# aggregator actor per partition for the pipeline lifetime, a multi-second
# cold-start that dominates small joins (measured 6.8 s vs 4.3 s on
# shuffle_join_revenue at sf0.1).  File bytes overestimate the in-memory
# footprint of a column-pruned read, so the check is conservative.
AUTO_BROADCAST_BYTES = 64 << 20


def _dataset_file_bytes(ds) -> "int | None":
    """Plan-only size probe: sum the in-memory estimates of the plan's Read
    leaves (parquet footer stats — nothing executes).  Returns None when any
    leaf is not a sized Read (e.g. from_items / from_arrow inputs), in which
    case the caller must assume LARGE.  Transforms between the Read and the
    join only ever make this an overestimate (filters/projections shrink),
    which keeps the dispatch conservative."""
    try:
        leaves = []

        def walk(op):
            deps = op.input_dependencies
            if not deps:
                leaves.append(op)
            for d in deps:
                walk(d)

        walk(ds._logical_plan.dag)
        total = 0
        for leaf in leaves:
            est = leaf._datasource.estimate_inmemory_data_size() \
                if type(leaf).__name__ == "Read" else None
            if est is None:
                return None
            total += int(est)
        return total if leaves else None
    except Exception:
        return None


def _collect_small_arrow(ds) -> pa.Table:
    """Driver-side materialization of a dataset ALREADY proven small by
    footer stats (auto-broadcast path only — never call on unbounded
    input)."""
    import ray

    blocks = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [b for b in blocks if b.num_rows]
    if not tables:
        return pa.table({n: pa.array([], type=t) for n, t in
                         zip(ds.schema().names, ds.schema().types)})
    return pa.concat_tables(tables, promote_options="permissive")


def shuffle_join(left, right, on: str, how: str = "inner",
                 num_partitions: "int | None" = None,
                 right_on: "str | None" = None,
                 auto_broadcast_bytes: "int | None" = AUTO_BROADCAST_BYTES):
    """Distributed join for two LARGE datasets (both sides shuffle by
    key).  Use ``broadcast_join`` whenever one side fits in memory — this is
    the tool when neither does.  ``how='semi'/'anti'`` routes to the
    tag-union membership filter (``_shuffle_semi_anti``); the remaining
    types are a thin policy wrapper over Ray Data's native hash join with
    the partition count from ``shuffle_join_partitions`` (aggregator
    resource requests are left at Ray's defaults — overriding them to
    larger fractions measurably re-created the starvation)."""
    import ray

    how_map = {"inner": "inner", "left outer": "left_outer",
               "left_outer": "left_outer", "right outer": "right_outer",
               "right_outer": "right_outer", "full outer": "full_outer",
               "full_outer": "full_outer"}
    if how in ("semi", "anti"):
        return _shuffle_semi_anti(left, right, on, how, right_on=right_on)
    if how not in how_map:
        raise ValueError(f"unsupported shuffle join type {how!r}")
    # Size-based dispatch: a footer-stats-small right side broadcasts (one
    # ray.put + per-batch arrow join) instead of paying the aggregator-actor
    # cold start.  Only for join types where a per-batch broadcast join is
    # semantically identical (inner/left_outer); right/full outer need the
    # global unmatched-right set, which only the shuffle sees.  Assumes
    # non-key column names are disjoint across sides (true of every caller;
    # collision suffixing differs between the two engines).
    if (auto_broadcast_bytes and num_partitions is None
            and how_map[how] in ("inner", "left_outer")):
        rb = _dataset_file_bytes(right)
        if rb is not None and rb <= auto_broadcast_bytes:
            small = _collect_small_arrow(right)
            if right_on and right_on != on:
                small = small.rename_columns(
                    [on if c == right_on else c for c in small.schema.names])
            arrow_how = {"inner": "inner", "left_outer": "left outer"}
            return broadcast_join(left, small, on=on,
                                  how=arrow_how[how_map[how]])
    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            nodes = sum(1 for n in ray.nodes()
                        if n.get("Alive") and n.get("Resources", {}).get("CPU"))
        except Exception:
            cpus, nodes = 8, 1
        num_partitions = shuffle_join_partitions(cpus, nodes)
    return left.join(right, how_map[how], num_partitions=num_partitions,
                     on=(on,), right_on=(right_on,) if right_on else None)


def tumbling_window_aggregate(ds, key: str, ts_col: str, window_seconds: int,
                              aggs: "dict[str, tuple[str, str]]"):
    """Event-time tumbling-window aggregate: assign each row to its window
    start inside map_batches (vectorized), then partial/combine aggregate by
    (key, window_start) — no global sort, one small shuffle."""

    def assign_window(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ns = np.asarray(ts.cast(pa.timestamp("ns")).cast(pa.int64()))
        w = 1_000_000_000 * window_seconds
        start = np.floor_divide(ns, w) * w
        col = pa.array(start).cast(pa.timestamp("ns"))
        return batch.append_column("window_start", col)

    ds = ds.map_batches(assign_window, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(ds, [key, "window_start"], aggs)


def asof_join(left_ds, right_ds, by: str, on: str,
              value_cols: "list[str]", suffix: str = "_asof"):
    """As-of join: for each left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` key.

    Ray Data has no native as-of join; the pattern here: tag + union both
    sides (right rows padded to the left schema with nulls), ONE hash-shard
    shuffle on ``by``, then per SHARD a single sort by (by, on, side) and a
    vectorized last-right-value backward fill over key runs — no per-key
    Python callbacks (same sharded shape as ``sessionize``).  A right row at
    exactly ``left.on`` matches (inclusive backward, DuckDB ASOF
    semantics); no-match left rows get Arrow NULL.  Value columns keep the
    right side's types (any Arrow type — the fill is a take)."""
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right_ds.schema()
    val_types = dict(zip(right_schema.names, right_schema.types))
    val_names = [v + suffix for v in value_cols]

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in left_names}
        cols["__side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        for v, vn in zip(value_cols, val_names):
            cols[vn] = pa.nulls(batch.num_rows, val_types[v])
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for c in left_names:
            if c in (by, on):
                cols[c] = batch.column(c)
            else:  # pad to the left schema so union blocks agree
                cols[c] = pa.nulls(n, left_types[c])
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        for v, vn in zip(value_cols, val_names):
            cols[vn] = batch.column(v)
        return pa.table(cols)

    left_t = left_ds.map_batches(tag_left, batch_format="pyarrow",
                                 zero_copy_batch=True)
    right_t = right_ds.map_batches(tag_right, batch_format="pyarrow",
                                   zero_copy_batch=True)
    unioned = _with_key_shard(left_t.union(right_t), [by])
    out_names = left_names + val_names

    def fill_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "asof_join", "shard")
        if g.num_rows == 0:
            return pa.table({c: g.column(c) for c in out_names})
        # __side descending: right rows sort BEFORE left rows at equal
        # `on`, so the backward fill sees equal-timestamp snapshots
        order = pc.sort_indices(g, sort_keys=[
            (by, "ascending"), (on, "ascending"), ("__side", "descending")])
        g = g.take(order)
        n = g.num_rows
        side = np.asarray(g.column("__side"))
        right_mask = side == 1
        idx = np.arange(n, dtype=np.int64)
        # index of the most recent right row at-or-before each position,
        # invalid when it falls before this key run's start
        last_right = np.maximum.accumulate(np.where(right_mask, idx, -1))
        key_start = ~_same_as_prev_row(g, [by])
        run_start = np.maximum.accumulate(np.where(key_start, idx, 0))
        valid = last_right >= run_start
        left_pos = idx[~right_mask]
        ti = last_right[~right_mask]
        tvalid = valid[~right_mask]
        take_vals = pa.array(np.where(tvalid, ti, 0), mask=~tvalid)
        left_idx = pa.array(left_pos)
        cols = {c: g.column(c).take(left_idx) for c in left_names}
        for vn in val_names:
            # null take-index → Arrow NULL for no-match rows
            cols[vn] = g.column(vn).combine_chunks().take(take_vals)
        return pa.table(cols)

    return unioned.groupby("_shard").map_groups(fill_shard,
                                                batch_format="pyarrow")


def approx_quantiles(ds, col: str, qs, bins: int = 4096):
    """Distributed approximate quantiles via a fixed-bin histogram sketch.

    Two cheap passes (min/max bounds, then binned counts), each a map-side
    partial reduced with native Sum/Min/Max — no sort, no materialization;
    error ≤ (max-min)/bins.  The training-data use case: pick quality-score
    thresholds ("keep top 30%") without sorting 10^10 rows."""
    from ray.data.aggregate import Max, Min

    qs = list(qs)
    bounds = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    if hi <= lo:
        return {q: lo for q in qs}
    width = (hi - lo) / bins

    def histogram(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col).cast(pa.float64()))
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({"bin": pa.array(np.arange(bins, dtype=np.int64)),
                         "count": pa.array(counts)})

    from ray.data.aggregate import Sum

    hist = ds.map_batches(histogram, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bin").aggregate(Sum("count", alias_name="count")) \
             .to_pandas().sort_values("bin")
    cum = hist["count"].cumsum().to_numpy()
    total = cum[-1]
    out = {}
    for q in qs:
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        out[q] = lo + (b + 0.5) * width
    return out


def grouped_approx_quantiles(ds, group_col: str, value_col: str, qs,
                             bins: int = 256) -> pa.Table:
    """Per-group approximate quantiles via per-group histogram sketches —
    the corpus-curation workhorse ("top 30% quality PER LANGUAGE") without
    sorting anything.

    Two streaming passes: (1) grouped min/max (map-side combined), whose
    result is one small row per group (groups are assumed categorical —
    languages, sources; the bounds table is broadcast into pass 2);
    (2) vectorized (group, bin) counts pre-aggregated per batch, reduced
    with the sharded hash aggregate, then ≤ groups x bins rows reach the
    driver for the cumulative search.  Same trunc-binning / cum-search /
    bin-midpoint math as ``approx_quantiles`` (SQL-replayable).

    Returns a pa.Table (group_col, q, quantile)."""
    qs = list(qs)
    bounds = grouped_aggregate(ds, [group_col],
                               {"lo": (value_col, "min"),
                                "hi": (value_col, "max")}).to_pandas()
    groups = bounds[group_col].tolist()
    lo = bounds["lo"].to_numpy(dtype=np.float64)
    hi = bounds["hi"].to_numpy(dtype=np.float64)
    width = (hi - lo) / bins
    group_arr = pa.array(groups)
    degenerate = width <= 0

    def histogram(batch: pa.Table) -> pa.Table:
        gidx = np.asarray(pc.index_in(batch.column(group_col),
                                      value_set=group_arr).cast(pa.int64()))
        v = np.asarray(batch.column(value_col).cast(pa.float64()))
        keep = ~(degenerate[gidx] | np.isnan(v))
        gk, vk = gidx[keep], v[keep]
        b = np.clip(((vk - lo[gk]) / width[gk]).astype(np.int64), 0, bins - 1)
        flat = gk * bins + b
        counts = np.bincount(flat)
        nz = np.nonzero(counts)[0]
        return pa.table({"_g": pa.array(nz // bins),
                         "bin": pa.array(nz % bins),
                         "count": pa.array(counts[nz])})

    hist = grouped_aggregate(
        ds.map_batches(histogram, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["_g", "bin"], {"count": ("count", "sum")}).to_pandas()
    out_g, out_q, out_v = [], [], []
    for gi, g in enumerate(groups):
        if degenerate[gi]:
            for q in qs:
                out_g.append(g)
                out_q.append(q)
                out_v.append(lo[gi])
            continue
        h = hist[hist["_g"] == gi].sort_values("bin")
        cum = h["count"].cumsum().to_numpy()
        total = cum[-1]
        bins_present = h["bin"].to_numpy()
        for q in qs:
            i = int(np.searchsorted(cum, q * total, side="left"))
            b = int(bins_present[min(i, len(bins_present) - 1)])
            out_g.append(g)
            out_q.append(q)
            out_v.append(lo[gi] + (b + 0.5) * width[gi])
    return pa.table({group_col: pa.array(out_g),
                     "q": pa.array(out_q, pa.float64()),
                     "quantile": pa.array(out_v, pa.float64())})


def _column_hash64(colv, seed: int = 5) -> np.ndarray:
    """Deterministic uint64 splitmix64 hash per row of a string or integer
    column (polars-xxhash pre-hash for strings) — the shared key-hash
    primitive for the HLL sketches and the Bloom filter."""
    from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64
    from embulk_filter_timestamp_format_ray.stages.partition import (
        hash_strings_dict,
    )

    if isinstance(colv, pa.ChunkedArray):
        colv = colv.combine_chunks()
    if pa.types.is_string(colv.type) or pa.types.is_large_string(colv.type):
        return splitmix64(hash_strings_dict(colv), seed)
    ints = np.asarray(pc.fill_null(colv.cast(pa.int64()), 0))
    return splitmix64(ints.astype(np.uint64), seed)


def _hll_row_ranks(colv, precision: int):
    """Per-row HLL (register, rank) arrays for a column: splitmix64 hash
    (polars-xxhash pre-hash for strings), register = top ``precision``
    bits, rank = leading zeros of the remaining bits + 1 (cap
    64-precision+1).  The single vectorized leading-zero kernel shared by
    the global and grouped sketches."""
    h = _column_hash64(colv, 5)
    reg_idx = (h >> np.uint64(64 - precision)).astype(np.int64)
    rest = h << np.uint64(precision)
    lz = np.full(len(h), 64 - precision + 1, dtype=np.int64)
    nz = rest != 0
    if nz.any():
        bits = rest[nz]
        lz_nz = np.zeros(bits.shape, dtype=np.int64)
        cur = bits.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz_nz[mask] += shift
            cur[mask] = cur[mask] << np.uint64(shift)
        lz[nz] = lz_nz + 1
    return reg_idx, lz


def _hll_estimate(ranks: np.ndarray, m: int) -> float:
    """HLL estimate from a DENSE m-register rank vector: alpha*m^2 /
    sum(2^-reg), with linear-counting small-range correction."""
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -ranks))
    zeros = int((ranks == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def approx_count_distinct(ds, col: str, precision: int = 12) -> float:
    """HyperLogLog distinct-count estimate: one mergeable register-max
    sketch per batch (map_batches partial), reduced with a single Max-per-
    register groupby — the canonical mergeable-sketch shape.

    Standard HLL (public algorithm): m=2^precision registers, register j
    keeps the max leading-zero rank of hashes routed to it; estimate =
    alpha*m^2 / sum(2^-reg) with small-range correction."""
    from ray.data.aggregate import Max

    m = 1 << precision

    def sketch(batch: pa.Table) -> pa.Table:
        reg_idx, lz = _hll_row_ranks(batch.column(col), precision)
        ranks = np.zeros(m, dtype=np.int64)
        np.maximum.at(ranks, reg_idx, lz)
        # SPARSE emission: only touched registers travel (≤ distinct-per-
        # block rows instead of a dense m-row table per batch)
        touched = np.nonzero(ranks)[0]
        return pa.table({"reg": pa.array(touched.astype(np.int64)),
                         "rank": pa.array(ranks[touched])})

    # batch_size=None → one sketch per BLOCK, so registers merge per task
    # before the shuffle; the groupby then reduces ≤ m rows per block
    merged = ds.map_batches(sketch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None) \
               .groupby("reg").aggregate(Max("rank", alias_name="rank")) \
               .to_pandas()
    ranks = np.zeros(m, dtype=np.int64)
    if len(merged):
        ranks[merged["reg"].to_numpy()] = merged["rank"].to_numpy()
    return _hll_estimate(ranks, m)


def grouped_count_distinct(ds, group_col: str, value_col: str,
                           out_col: str = "n_distinct"):
    """Exact ``COUNT(DISTINCT value) GROUP BY group``: project to the two
    columns, per-block local distinct, ONE (group, value)-hash exchange
    dedupes the pairs globally (``distinct``), then per-block pair counts
    roll up through the standard partial/combine aggregate.

    Scale shape: the exchange carries distinct (group, value) PAIRS — the
    irreducible content of the answer — never raw rows, and the final
    aggregate moves only #groups × #blocks partial counts.  When even the
    distinct pairs are too heavy to move (billions of distinct values per
    group), switch to ``grouped_approx_count_distinct``: its exchange is
    bounded by #groups × 2^precision sketch rows.  NULL values are not
    counted (SQL COUNT(DISTINCT) semantics); a NULL group key forms its
    own group as in SQL GROUP BY."""
    pairs = distinct(ds, [group_col, value_col])

    def local_counts(b: pa.Table) -> pa.Table:
        # pairs are globally distinct, so per-block counts sum exactly;
        # Arrow "count" skips NULL values (SQL COUNT(DISTINCT v) parity)
        t = b.group_by([group_col]).aggregate([(value_col, "count")])
        renames = {f"{value_col}_count": out_col}
        t = t.rename_columns([renames.get(nm, nm) for nm in t.schema.names])
        return t.select([group_col, out_col])

    counted = pairs.map_batches(local_counts, batch_format="pyarrow",
                                zero_copy_batch=True)
    return grouped_aggregate(counted, [group_col], {out_col: (out_col, "sum")})


def grouped_approx_count_distinct(ds, group_col: str, value_col: str,
                                  precision: int = 12,
                                  out_col: str = "approx_distinct"):
    """Per-group HyperLogLog distinct-count estimates, one row per group.

    Shape: each block emits a SPARSE (group, register, rank) sketch —
    segment max via one argsort + ``maximum.reduceat``, never a callback
    per group — merged with the standard partial/combine grouped MAX, then
    a per-group-shard vectorized fold turns registers into estimates.  No
    driver-side registers at any point; the exchange is bounded by
    #groups × 2^precision rows per block regardless of value cardinality —
    the approximate tier next to exact ``grouped_count_distinct``.

    The estimate math is byte-identical to ``approx_count_distinct``
    (shared ``_hll_row_ranks`` kernel; dense per-group register vectors in
    the fold so float summation order matches the scalar spec)."""
    m = 1 << precision

    def sketch(batch: pa.Table) -> pa.Table:
        gcol = batch.column(group_col)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        if gcol.null_count:
            raise ValueError(
                "grouped_approx_count_distinct: NULL group keys are not "
                "supported — fill or filter them upstream")
        if batch.num_rows == 0:
            return pa.table({group_col: gcol,
                             "reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(gcol)
        gcodes = np.asarray(enc.indices.cast(pa.int64()))
        reg, rank = _hll_row_ranks(batch.column(value_col), precision)
        key = gcodes * m + reg
        order = np.argsort(key, kind="stable")
        ks, rs = key[order], rank[order]
        starts = np.nonzero(np.r_[True, ks[1:] != ks[:-1]])[0]
        maxes = np.maximum.reduceat(rs, starts)
        uk = ks[starts]
        return pa.table({
            group_col: enc.dictionary.take(pa.array(uk // m, pa.int64())),
            "reg": pa.array(uk % m),
            "rank": pa.array(maxes)})

    # batch_size=None → one sparse sketch per BLOCK before the exchange
    sk = ds.map_batches(sketch, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
    merged = grouped_aggregate(sk, [group_col, "reg"],
                               {"rank": ("rank", "max")})

    def fold(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        if g.num_rows == 0:
            return pa.table({group_col: g.column(group_col),
                             out_col: pa.array([], pa.int64())})
        order = pc.sort_indices(g, sort_keys=[(group_col, "ascending"),
                                              ("reg", "ascending")])
        s = g.take(order)
        same = _same_as_prev_row(s, [group_col])
        gid = np.cumsum(~same) - 1
        firsts = np.nonzero(np.r_[True, gid[1:] != gid[:-1]])[0]
        regs = np.asarray(s.column("reg").combine_chunks().cast(pa.int64()))
        rnks = np.asarray(s.column("rank").combine_chunks().cast(pa.int64()))
        ests = np.empty(len(firsts), dtype=np.int64)
        bounds = np.r_[firsts, len(gid)]
        # one dense m-vector per group keeps the float summation order
        # identical to the global/scalar spec; #groups per shard is the
        # output cardinality, so this loop is per-GROUP-ROW, not per input
        # row (same altitude as the driver fold in approx_count_distinct)
        dense = np.zeros(m, dtype=np.int64)
        for i in range(len(firsts)):
            lo, hi = bounds[i], bounds[i + 1]
            dense[regs[lo:hi]] = rnks[lo:hi]
            ests[i] = int(np.floor(_hll_estimate(dense, m) + 0.5))
            dense[regs[lo:hi]] = 0
        return pa.table({group_col: s.column(group_col).take(pa.array(firsts)),
                         out_col: pa.array(ests)})

    shard = _with_key_shard(merged, [group_col])
    return shard.groupby("_shard").map_groups(fold, batch_format="pyarrow")


def set_op_rows(left, right, cols, op: str):
    """SQL ``INTERSECT`` / ``EXCEPT`` (set semantics: distinct rows) over
    ``cols`` — the fifth operator on the tagged-union + segment-run
    skeleton (semi/anti join, band join, changefeed, as-of).

    Shape: each side projects to ``cols`` and takes a LOCAL Arrow distinct
    per block (so at most one row per value-tuple per block moves), the
    tagged union makes ONE key-shard exchange, and each shard dedupes per
    side then run-compares: a run of identical tuples holding both sides
    is an intersect hit; a side-0-only run is an except hit.  Key columns
    must be non-null (the shared run-compare primitive's contract)."""
    if op not in ("intersect", "except"):
        raise ValueError(f"unsupported set op {op!r}")
    cols = list(cols)

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            t = b.select(cols).group_by(cols).aggregate([]).select(cols)
            return t.append_column("_side", pa.array(
                np.full(t.num_rows, side, dtype=np.int8)))

        return f

    both = left.map_batches(tag(0), batch_format="pyarrow",
                            zero_copy_batch=True) \
        .union(right.map_batches(tag(1), batch_format="pyarrow",
                                 zero_copy_batch=True))

    def reduce_shard(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_shard"]).group_by(cols + ["_side"]) \
            .aggregate([]).select(cols + ["_side"])
        if t.num_rows == 0:
            return t.drop_columns(["_side"])
        order = pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in cols]
            + [("_side", "ascending")])
        s = t.take(order)
        same = _same_as_prev_row(s, cols)
        rid = np.cumsum(~same) - 1
        counts = np.bincount(rid)
        firsts = np.nonzero(~same)[0]
        sides = np.asarray(s.column("_side").combine_chunks())
        if op == "intersect":
            keep = counts == 2
        else:
            keep = (counts == 1) & (sides[firsts] == 0)
        return s.take(pa.array(firsts[keep])).drop_columns(["_side"])

    return _with_key_shard(both, cols).groupby("_shard") \
        .map_groups(reduce_shard, batch_format="pyarrow")


_BLOOM_SEED0 = 101


class BloomFilter:
    """Handle for a distributed-built Bloom filter: the dense uint64 word
    bitmap lives in the object store (one ``ray.put``), probes read it
    zero-copy inside ``map_batches``."""

    def __init__(self, ref, n_bits: int, k: int):
        self.ref = ref
        self.n_bits = int(n_bits)
        self.k = int(k)


def _bloom_bit_idx(h0: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    """Bit index of hash function i: an independent splitmix64 re-hash per
    probe (shared by build and probe — they MUST agree)."""
    from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64

    return splitmix64(h0, _BLOOM_SEED0 + i) % np.uint64(n_bits)


def build_bloom_filter(ds, key_col: str, *, n_bits: int = 1 << 23,
                       k: int = 4) -> BloomFilter:
    """Build a Bloom filter of ``key_col`` distributively — the shuffle-
    volume killer for large×large joins where one side is filtered but
    still too big to broadcast as an exact table: prefilter the probe side
    with ``bloom_prefilter`` (no false negatives) and let the exact join
    remove the false positives.

    Build shape: each block emits its SPARSE nonzero (word, bits) rows —
    one unique + reduceat-OR pass, at most min(keys × k, n_bits/64) rows —
    a word-hash-sharded reduce ORs them (sort + reduceat per shard, the
    house segment pattern), and the driver scatters the ≤ n_bits/64 sparse
    rows into the dense bitmap it broadcasts once via ``ray.put``.  The
    bitmap itself (n_bits/8 bytes; 1 MiB at the default 2^23) is the only
    driver-side state, independent of key count."""
    import ray

    n_words = (n_bits + 63) >> 6

    def block_words(batch: pa.Table) -> pa.Table:
        h0 = _column_hash64(batch.column(key_col))
        if not len(h0):
            return pa.table({"w": pa.array([], pa.int64()),
                             "v": pa.array([], pa.uint64())})
        idx = np.unique(np.concatenate(
            [_bloom_bit_idx(h0, i, n_bits) for i in range(k)]))
        w = (idx >> np.uint64(6)).astype(np.int64)
        bits = np.uint64(1) << (idx & np.uint64(63))
        starts = np.nonzero(np.r_[True, w[1:] != w[:-1]])[0]
        return pa.table({"w": pa.array(w[starts]),
                         "v": pa.array(np.bitwise_or.reduceat(bits, starts),
                                       pa.uint64())})

    words = ds.map_batches(block_words, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)

    def or_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        w = np.asarray(g.column("w").combine_chunks())
        v = np.asarray(g.column("v").combine_chunks()).astype(np.uint64)
        order = np.argsort(w, kind="stable")
        w, v = w[order], v[order]
        starts = np.nonzero(np.r_[True, w[1:] != w[:-1]])[0]
        return pa.table({"w": pa.array(w[starts]),
                         "v": pa.array(np.bitwise_or.reduceat(v, starts),
                                       pa.uint64())})

    sparse = _with_key_shard(words, ["w"]).groupby("_shard") \
        .map_groups(or_shard, batch_format="pyarrow").to_pandas()
    bitmap = np.zeros(n_words, dtype=np.uint64)
    if len(sparse):
        bitmap[sparse["w"].to_numpy()] = sparse["v"].to_numpy().astype(np.uint64)
    logger.info("build_bloom_filter: %d/%d words nonzero",
                int(np.count_nonzero(bitmap)), n_words)
    return BloomFilter(ray.put(bitmap), n_bits, k)


def bloom_prefilter(ds, key_col: str, bloom: BloomFilter):
    """Drop rows whose ``key_col`` is DEFINITELY not in the filter's key
    set — one vectorized k-probe pass per batch against the broadcast
    bitmap.  No false negatives: composing with the exact join downstream
    leaves results unchanged, so any bloom-pruned pipeline's oracle is the
    plain join SQL; the filter only shrinks what the exchange moves."""

    def probe(batch: pa.Table) -> pa.Table:
        bm = resolve_broadcast(bloom.ref)
        h0 = _column_hash64(batch.column(key_col))
        if not len(h0):
            return batch
        keep = np.ones(len(h0), dtype=bool)
        for i in range(bloom.k):
            idx = _bloom_bit_idx(h0, i, bloom.n_bits)
            keep &= (bm[(idx >> np.uint64(6)).astype(np.int64)]
                     >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return batch.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def sliding_window_aggregate(ds, key: str, ts_col: str, window_seconds: int,
                             slide_seconds: int,
                             aggs: "dict[str, tuple[str, str]]"):
    """Sliding event-time windows: each row replicates into the
    window_seconds/slide_seconds windows containing it (vectorized
    np.repeat flat-map), then the tumbling partial/combine machinery runs
    on (key, window_start)."""
    if window_seconds % slide_seconds:
        raise ValueError("window must be a multiple of slide")
    k = window_seconds // slide_seconds

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ns = np.asarray(ts.cast(pa.timestamp("ns")).cast(pa.int64()))
        slide_ns = 1_000_000_000 * slide_seconds
        window_ns = 1_000_000_000 * window_seconds
        last_start = np.floor_divide(ns, slide_ns) * slide_ns
        idx = np.repeat(np.arange(batch.num_rows), k)
        offsets = np.tile(np.arange(k, dtype=np.int64) * slide_ns,
                          batch.num_rows)
        starts = np.repeat(last_start, k) - offsets
        keep = np.repeat(ns, k) < starts + window_ns
        out = {name: batch.column(name).take(pa.array(idx[keep]))
               for name in batch.schema.names}
        out["window_start"] = pa.array(starts[keep]).cast(pa.timestamp("ns"))
        return pa.table(out)

    ds = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(ds, [key, "window_start"], aggs)


def sessionize(ds, key: str, ts_col: str, gap_seconds: float,
               out_col: str = "n_sessions"):
    """Per-key session count: a new session starts when the gap between
    consecutive events exceeds ``gap_seconds``.

    One hash-shard shuffle; each shard sorts (key, ts) once and counts
    every key's session breaks with a segment mask — not one Python
    callback (and sort) per key."""
    gap_ns = int(gap_seconds * 1e9)

    def count_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "sessionize", "shard")
        empty = pa.table({key: pa.array([], g.column(key).type),
                          out_col: pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        ts64 = g.set_column(g.schema.get_field_index(ts_col), ts_col,
                            g.column(ts_col).combine_chunks()
                            .cast(pa.timestamp("ns")).cast(pa.int64()))
        order = pc.sort_indices(ts64, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending")])
        s = ts64.take(order)
        same = _same_as_prev_row(s, [key])
        t = np.asarray(s.column(ts_col))
        gap_break = np.zeros(len(t), dtype=bool)
        gap_break[1:] = (t[1:] - t[:-1]) > gap_ns
        gap_break &= same  # only gaps WITHIN a key start a new session
        key_start = ~same
        key_ids = np.cumsum(key_start) - 1
        n_keys = int(key_ids[-1]) + 1
        sessions = np.bincount(key_ids[gap_break], minlength=n_keys) + 1
        key_vals = s.column(key).take(pa.array(np.nonzero(key_start)[0]))
        return pa.table({key: key_vals,
                         out_col: pa.array(sessions.astype(np.int64))})

    ds = _with_key_shard(ds, [key])
    return ds.groupby("_shard").map_groups(count_shard, batch_format="pyarrow")


# ------------------------------------------------------------- range join


def _ts_to_us(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    else:
        col = col.cast(pa.int64())
    return np.asarray(col)


def _match_intervals(ts_us: np.ndarray, starts: np.ndarray,
                     ends: np.ndarray):
    """All (event, interval) matches with start <= ts < end.  Vectorized
    per INTERVAL (one boolean mask each) — never per event row; the
    interval side is small inside a granule / broadcast table by contract.
    Returns (event_idx, interval_idx) int64 arrays."""
    ev_idx, iv_idx = [], []
    for j in range(len(starts)):
        m = np.nonzero((ts_us >= starts[j]) & (ts_us < ends[j]))[0]
        if len(m):
            ev_idx.append(m)
            iv_idx.append(np.full(len(m), j, dtype=np.int64))
    if not ev_idx:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(ev_idx), np.concatenate(iv_idx)


def _joined(batch: pa.Table, intervals: pa.Table, ev_idx: np.ndarray,
            iv_idx: np.ndarray, start_col: str, end_col: str) -> pa.Table:
    out = batch.take(pa.array(ev_idx))
    for name in intervals.schema.names:
        if name in (start_col, end_col) or name in batch.schema.names:
            continue
        out = out.append_column(
            name, intervals.column(name).combine_chunks()
            .take(pa.array(iv_idx)))
    return out


def range_join(events_ds, intervals: pa.Table, ts_col: str,
               start_col: str = "start", end_col: str = "end",
               *, granule_us: "int | None" = None):
    """Interval join: each event row joins every interval row whose
    [start, end) contains its timestamp (overlapping intervals allowed —
    an event may match several).  Interval payload columns (everything but
    start/end) are appended to the matching event rows.

    Two tiers, same semantics (parity-tested):

    * **broadcast** (default): the interval table rides the object store
      via ``ray.put`` once — correct when intervals fit in worker memory
      (campaign windows, maintenance windows, A/B test spans: thousands,
      not billions).  Matching is one vectorized mask per interval.
    * **granule shuffle** (``granule_us`` set): the 100-TB shape when the
      interval side is too large to broadcast.  Events map to time granule
      ``ts // granule_us``; intervals replicate to every granule they
      cover (``np.repeat`` flat-map); ONE groupby(granule) co-locates each
      event with exactly the intervals that can contain it, and the
      in-granule match is the same vectorized mask.  Pick ``granule_us``
      near the median interval length so replication stays O(1) per
      interval; matches are deduped by construction (an event matches an
      interval in exactly one granule — the event's own).
    """
    if granule_us is None:
        import ray

        ref = ray.put(intervals) if ray.is_initialized() else intervals

        class _BcastRange:
            def __init__(self):
                self._iv = None

            def _tbl(self) -> pa.Table:
                if self._iv is None:
                    t = resolve_broadcast(ref)
                    self._iv = (t, _ts_to_us(t.column(start_col)),
                                _ts_to_us(t.column(end_col)))
                return self._iv

            def __call__(self, batch: pa.Table) -> pa.Table:
                iv, s, e = self._tbl()
                ts = _ts_to_us(batch.column(ts_col))
                ev_idx, iv_idx = _match_intervals(ts, s, e)
                return _joined(batch, iv, ev_idx, iv_idx,
                               start_col, end_col)

        return events_ds.map_batches(_BcastRange, batch_format="pyarrow",
                                     zero_copy_batch=True, concurrency=4)

    g_us = int(granule_us)
    ev_schema = events_ds.schema()
    ev_names = list(ev_schema.names)
    ev_types = dict(zip(ev_schema.names, ev_schema.types))
    iv_s = _ts_to_us(intervals.column(start_col))
    iv_e = _ts_to_us(intervals.column(end_col))
    payload = intervals.drop_columns(
        [c for c in (start_col, end_col) if c in intervals.schema.names])
    pay_names = [c for c in payload.schema.names if c not in ev_names]
    pay_types = {c: payload.schema.field(c).type for c in pay_names}
    out_names = ev_names + pay_names

    # replicate each interval to all covered granules (flat-map), padded to
    # the union schema (asof_join's tag pattern)
    n_gran = np.maximum((iv_e - 1) // g_us - iv_s // g_us + 1, 1)
    rep = np.repeat(np.arange(len(iv_s), dtype=np.int64), n_gran)
    offs = np.zeros(len(iv_s), dtype=np.int64)
    np.cumsum(n_gran[:-1], out=offs[1:])
    gran = (iv_s // g_us)[rep] + (np.arange(len(rep)) - offs[rep])
    iv_cols = {c: pa.nulls(len(rep), ev_types[c]) for c in ev_names}
    for c in pay_names:
        iv_cols[c] = payload.column(c).combine_chunks().take(pa.array(rep))
    iv_cols["_start_us"] = pa.array(iv_s[rep])
    iv_cols["_end_us"] = pa.array(iv_e[rep])
    iv_cols["_granule"] = pa.array(gran)
    iv_cols["_side"] = pa.array(np.zeros(len(rep), dtype=np.int8))
    import ray.data as rd

    iv_ds = rd.from_arrow(pa.table(iv_cols))

    def tag_events(b: pa.Table) -> pa.Table:
        ts = _ts_to_us(b.column(ts_col))
        cols = {c: b.column(c) for c in ev_names}
        for c in pay_names:
            cols[c] = pa.nulls(b.num_rows, pay_types[c])
        cols["_start_us"] = pa.nulls(b.num_rows, pa.int64())
        cols["_end_us"] = pa.nulls(b.num_rows, pa.int64())
        cols["_granule"] = pa.array(ts // g_us)
        cols["_side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    ev_ds = events_ds.map_batches(tag_events, batch_format="pyarrow",
                                  zero_copy_batch=True)
    both = iv_ds.union(ev_ds)

    def match_granule(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("_side"))
        iv = group.filter(pa.array(side == 0))
        ev = group.filter(pa.array(side == 1))
        # per-granule work is O(intervals × events); a granule holding
        # thousands of overlapping intervals means granule_us is far below
        # the typical interval length — surface it before it burns a task
        warn_large_key_group(iv.num_rows * max(ev.num_rows, 1),
                             "range_join", "granule")
        if iv.num_rows == 0 or ev.num_rows == 0:
            return pa.table(
                {c: pa.array([], ev_types.get(c) or pay_types[c])
                 for c in out_names})
        ts = _ts_to_us(ev.column(ts_col))
        ev_idx, iv_idx = _match_intervals(
            ts, np.asarray(iv.column("_start_us")),
            np.asarray(iv.column("_end_us")))
        out_cols = {c: ev.column(c).combine_chunks().take(pa.array(ev_idx))
                    for c in ev_names}
        for c in pay_names:
            out_cols[c] = iv.column(c).combine_chunks() \
                .take(pa.array(iv_idx))
        return pa.table(out_cols)

    return both.groupby("_granule").map_groups(match_granule,
                                               batch_format="pyarrow")


# ------------------------------------------------------- ordered prefix sum


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       out_col: str = "cum_before",
                       bucket_size: int = 100_000):
    """Exclusive prefix sum of ``value_col`` in global ``order_col`` order
    (``out_col[i] = sum of value over all rows with order < this row``).

    Distributed two-pass shape — no global sort, no driver materialization
    of rows:

    1. rows bucket by ``order_col // bucket_size``; one tiny aggregate
       yields per-bucket totals (#buckets rows — the only driver-side
       state, ~rows/bucket_size).
    2. the driver prefix-sums the bucket totals into per-bucket offsets
       (broadcast back), and ONE groupby(bucket) shuffle lets each bucket
       sort its own rows and add local cumsum + its offset.

    Requires a numeric/timestamp ``order_col`` with unique values (ties
    would make "before" ambiguous).  Skew guard: a bucket is one task —
    pick ``bucket_size`` so bucket row counts stay bounded."""
    import ray

    def add_bucket(b: pa.Table) -> pa.Table:
        o = np.asarray(b.column(order_col).combine_chunks()
                       .cast(pa.int64()))
        return b.append_column("_bucket",
                               pa.array(o // np.int64(bucket_size)))

    # two passes read bds (bucket totals, then the cumsum groupby); without
    # a checkpoint Ray re-executes the whole upstream lineage for the
    # second pass — in curate_corpus that would re-run the entire curation
    # chain.  Callers project to (order, value) before this op, so the
    # materialized footprint is two narrow columns.
    bds = ds.map_batches(add_bucket, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    totals = grouped_aggregate(bds, ["_bucket"],
                               {"t": (value_col, "sum")}).to_pandas() \
        .sort_values("_bucket")
    buckets = totals["_bucket"].to_numpy()
    offs = np.zeros(len(buckets), dtype=np.int64)
    np.cumsum(totals["t"].to_numpy()[:-1], out=offs[1:])
    off_map = dict(zip(buckets.tolist(), offs.tolist()))
    off_ref = ray.put(off_map) if ray.is_initialized() else off_map

    def bucket_cumsum(group: pa.Table) -> pa.Table:
        warn_large_key_group(group.num_rows, "ordered_prefix_sum", "bucket")
        omap = resolve_broadcast(off_ref)
        bkt = int(group.column("_bucket")[0].as_py())
        g = group.drop_columns(["_bucket"])
        order = pc.sort_indices(g, sort_keys=[(order_col, "ascending")])
        g = g.take(order)
        v = np.asarray(g.column(value_col).combine_chunks()
                       .cast(pa.int64()))
        cum = np.zeros(len(v), dtype=np.int64)
        np.cumsum(v[:-1], out=cum[1:])
        cum += omap.get(bkt, 0)
        return g.append_column(out_col, pa.array(cum))

    return bds.groupby("_bucket").map_groups(bucket_cumsum,
                                             batch_format="pyarrow")


def pack_sequences(ds, order_col: str, token_col: str,
                   seq_len: int = 512, bucket_size: int = 100_000):
    """Deterministic sequence packing for training-batch assembly: docs are
    concatenated in ``order_col`` order and split into fixed token-budget
    sequences; each doc is assigned ``seq_id = tokens_before // seq_len``
    (offset packing — the standard concat-then-chunk layout).  Built on the
    distributed exclusive prefix sum, so no single task ever sees the
    whole corpus."""
    out = ordered_prefix_sum(ds, order_col, token_col,
                             out_col="cum_before",
                             bucket_size=bucket_size)
    return out.map_batches(
        lambda b: b.append_column(
            "seq_id", pa.array(
                np.asarray(b.column("cum_before")) // np.int64(seq_len))),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------- time-band join


def _rank_encode(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Order-preserving int64 encoding of a key column: ints/timestamps by
    value, strings by their alphabetical rank within this table."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        alpha = np.asarray(pc.sort_indices(enc.dictionary))
        rank = np.empty(len(alpha), dtype=np.int64)
        rank[alpha] = np.arange(len(alpha))
        return rank[np.asarray(enc.indices.cast(pa.int64()))]
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    return np.asarray(pc.fill_null(col.cast(pa.int64()), 0))


def _key_group_ids(tbl: pa.Table, keys: "list[str]") -> np.ndarray:
    """Dense int64 group id per row for a (possibly multi-column) key tuple
    — one sort + run-compare, no Python per row."""
    view = tbl.select(keys)
    order = np.asarray(pc.sort_indices(
        view, sort_keys=[(k, "ascending") for k in keys]))
    same = _same_as_prev_row(view.take(pa.array(order)), keys)
    gid = np.empty(len(order), dtype=np.int64)
    gid[order] = np.cumsum(~same) - 1
    return gid


def temporal_join(facts_ds, history_ds, keys, fact_seq: str,
                  valid_from: str = "valid_from",
                  valid_to: str = "valid_to",
                  payload=(), suffix: str = "_dim"):
    """Point-in-time (AS OF) join of a fact stream against an SCD Type-2
    history: each fact row joins the AT MOST ONE dimension version whose
    validity interval contains the fact's sequence value
    (``valid_from <= seq < valid_to``, NULL valid_to = open) — the lookup
    every warehouse pairs with ``scd2_history``.  LEFT semantics: facts
    with no valid version keep NULL payload.

    Shape (same as ``time_band_join``): tag + union both sides, ONE
    key-shard exchange, then per shard a single lexsort of the history by
    (key-group, valid_from) and a batched ``searchsorted`` — fact and
    interval times are rank-compressed into one shared order so the
    (group, time) composite can never overflow int64.  No per-key
    callbacks, no global sort."""
    keys = list(keys)
    payload = list(payload)
    f_schema = facts_ds.schema()
    f_names = list(f_schema.names)
    f_types = dict(zip(f_schema.names, f_schema.types))
    h_schema = history_ds.schema()
    h_types = dict(zip(h_schema.names, h_schema.types))
    pay_names = [p + suffix for p in payload]
    out_names = f_names + pay_names

    def tag_facts(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in f_names}
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        for p, pn in zip(payload, pay_names):
            cols[pn] = pa.nulls(b.num_rows, h_types[p])
        cols["__vf"] = pa.nulls(b.num_rows, pa.int64())
        cols["__vt"] = pa.nulls(b.num_rows, pa.int64())
        return pa.table(cols)

    def tag_history(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for c in f_names:
            cols[c] = b.column(c) if c in keys else pa.nulls(n, f_types[c])
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        for p, pn in zip(payload, pay_names):
            cols[pn] = b.column(p)
        cols["__vf"] = b.column(valid_from).cast(pa.int64())
        vt = b.column(valid_to).cast(pa.int64())
        if isinstance(vt, pa.ChunkedArray):
            vt = vt.combine_chunks()
        # open intervals → +inf sentinel (never a legal seq value)
        cols["__vt"] = pc.fill_null(vt, np.iinfo(np.int64).max)
        return pa.table(cols)

    ft = facts_ds.map_batches(tag_facts, batch_format="pyarrow",
                              zero_copy_batch=True)
    ht = history_ds.map_batches(tag_history, batch_format="pyarrow",
                                zero_copy_batch=True)
    unioned = _with_key_shard(ft.union(ht), keys)

    def match_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "temporal_join", "shard")
        side = np.asarray(g.column("__side"))
        f_mask = side == 0
        if not f_mask.any():
            return pa.table({c: pa.array([], f_types.get(
                c, h_types.get(c.removesuffix(suffix), pa.int64())))
                for c in out_names})
        f_idx = np.nonzero(f_mask)[0]
        facts = g.take(pa.array(f_idx))
        h_idx = np.nonzero(~f_mask)[0]
        if not len(h_idx):
            return pa.table({
                **{c: facts.column(c) for c in f_names},
                **{pn: pa.nulls(facts.num_rows,
                                h_types[p])
                   for p, pn in zip(payload, pay_names)}})
        gid = _key_group_ids(g, keys)
        t = _ts_to_us(facts.column(fact_seq))
        # nullable-safe int64 extraction (np.asarray on nullable → float64)
        vf = np.asarray(g.column("__vf").take(pa.array(h_idx))
                        .combine_chunks().cast(pa.int64()))
        vt = np.asarray(g.column("__vt").take(pa.array(h_idx))
                        .combine_chunks().cast(pa.int64()))
        # rank-compress fact seqs + interval starts into one shared order
        uniq = np.unique(np.concatenate([t, vf]))
        t_r = np.searchsorted(uniq, t)
        vf_r = np.searchsorted(uniq, vf)
        span = np.int64(len(uniq) + 1)
        fg, hg = gid[f_idx], gid[h_idx]
        h_order = np.lexsort((vf_r, hg))
        h_comp = hg[h_order] * span + vf_r[h_order]
        pos = np.searchsorted(h_comp, fg * span + t_r, side="right") - 1
        safe = np.maximum(pos, 0)
        ok = (pos >= 0) & (hg[h_order][safe] == fg) \
            & (t < vt[h_order][safe])
        take_h = pa.array(h_idx[h_order][safe])
        valid = pa.array(ok)
        cols = {c: facts.column(c) for c in f_names}
        for pn in pay_names:
            taken = g.column(pn).take(take_h)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            cols[pn] = pc.if_else(valid, taken,
                                  pa.nulls(len(ok), taken.type))
        return pa.table(cols)

    return unioned.groupby("_shard").map_groups(match_shard,
                                                batch_format="pyarrow")


def time_band_join(left_ds, right_ds, key: str, ts_col: str,
                   band_lo_us: int, band_hi_us: int,
                   right_payload: "list[str]", suffix: str = "_r"):
    """Temporal band join: each left row matches every right row of the
    same ``key`` whose timestamp lies in ``(left.ts + band_lo_us,
    left.ts + band_hi_us]`` — the attribution / follow-up-event shape
    ("purchases within 10 minutes after a click").  Emits one row per
    (left, right) match: all left columns plus the right payload columns
    (suffixed).

    Shape (same as ``asof_join``): tag + union both sides, ONE key-shard
    shuffle, then per shard a single sort of the right rows by (key, ts)
    and a batch ``searchsorted`` over a (key-rank × time) composite — the
    per-left match window is [start, end) in the sorted right array, and
    pairs materialize with one ``np.repeat`` + range gather.  No per-key
    callbacks.  When #keys × time-span overflows the int64 composite, the
    shard processes key-rank chunks (still vectorized per chunk)."""
    lo, hi = int(band_lo_us), int(band_hi_us)
    if hi <= lo:
        raise ValueError("band_hi_us must exceed band_lo_us")
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right_ds.schema()
    r_types = dict(zip(right_schema.names, right_schema.types))
    pay_names = [p + suffix for p in right_payload]

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in left_names}
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        for p, pn in zip(right_payload, pay_names):
            cols[pn] = pa.nulls(b.num_rows, r_types[p])
        cols["__rts"] = pa.nulls(b.num_rows, pa.int64())
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for c in left_names:
            cols[c] = b.column(c) if c == key else pa.nulls(n, left_types[c])
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        for p, pn in zip(right_payload, pay_names):
            cols[pn] = b.column(p)
        cols["__rts"] = pa.array(_ts_to_us(b.column(ts_col)))
        return pa.table(cols)

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow",
                             zero_copy_batch=True)
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow",
                              zero_copy_batch=True)
    unioned = _with_key_shard(lt.union(rt), [key])
    out_names = left_names + pay_names

    def match_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "time_band_join", "shard")
        side = np.asarray(g.column("__side"))
        krank = _rank_encode(g.column(key))
        l_mask = side == 0
        r_mask = ~l_mask
        empty = pa.table({c: pa.array([], left_types.get(
            c, r_types.get(c.removesuffix(suffix), pa.int64())))
            for c in out_names})
        if not l_mask.any() or not r_mask.any():
            return empty
        l_idx = np.nonzero(l_mask)[0]
        r_idx = np.nonzero(r_mask)[0]
        l_ts = _ts_to_us(g.column(ts_col).take(pa.array(l_idx)))
        # take the RIGHT rows first: the full __rts column is nullable
        # (left rows pad it), and np.asarray on a nullable int64 silently
        # yields float64 — 53-bit precision would corrupt the composite
        r_ts = np.asarray(g.column("__rts").take(pa.array(r_idx))
                          .combine_chunks().cast(pa.int64()))
        assert r_ts.dtype == np.int64
        lk, rk = krank[l_idx], krank[r_idx]
        r_order = np.lexsort((r_ts, rk))
        rk_s, rts_s = rk[r_order], r_ts[r_order]
        r_idx_s = r_idx[r_order]
        # dense key ranks over this shard's keys (bounds the composite)
        uk = np.unique(np.concatenate([lk, rk]))
        lkd = np.searchsorted(uk, lk)
        rkd = np.searchsorted(uk, rk_s)
        min_t = min(int(l_ts.min()), int(rts_s.min()))
        span = max(int(l_ts.max()), int(rts_s.max())) - min_t
        # needles are clipped to [0, M-1], so M must exceed span by at
        # least 1 REGARDLESS of the band sign: with a backward band
        # (hi < 0), span + hi + 2 < span + 1 would overlap adjacent keys'
        # composite ranges and searchsorted would run over an unsorted
        # array (reproduced: false cross-key matches)
        M = span + max(hi, 0) + 2
        l_starts = np.empty(len(l_idx), dtype=np.int64)
        l_ends = np.empty(len(l_idx), dtype=np.int64)
        chunk = max(int((1 << 62) // M), 1)
        for base in range(0, len(uk), chunk):  # ≥2 iters only if
            # #keys × (span + band) overflows int64 — vectorized within
            lm = (lkd >= base) & (lkd < base + chunk)
            rm = (rkd >= base) & (rkd < base + chunk)
            if not lm.any():
                continue
            r_off = int(np.nonzero(rm)[0][0]) if rm.any() else 0
            comp_r = (rkd[rm] - base) * M + (rts_s[rm] - min_t)
            dt = l_ts[lm] - min_t
            lo_v = np.clip(dt + lo + 1, 0, M - 1)
            # hi clips to -1 (not 0): a window entirely before the shard's
            # min timestamp must match nothing, and k*M - 1 sorts before
            # every right row of key k (count clamps to 0 below)
            hi_v = np.clip(dt + hi, -1, M - 1)
            kbase = (lkd[lm] - base) * M
            l_starts[lm] = np.searchsorted(comp_r, kbase + lo_v,
                                           side="left") + r_off
            l_ends[lm] = np.searchsorted(comp_r, kbase + hi_v,
                                         side="right") + r_off
        counts = np.maximum(l_ends - l_starts, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        rep_l = np.repeat(np.arange(len(l_idx)), counts)
        offs = np.zeros(len(l_idx), dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        rpos = l_starts[rep_l] + (np.arange(total) - offs[rep_l])
        take_l = pa.array(l_idx[rep_l])
        take_r = pa.array(r_idx_s[rpos])
        cols = {c: g.column(c).take(take_l) for c in left_names}
        for pn in pay_names:
            cols[pn] = g.column(pn).take(take_r)
        return pa.table(cols)

    return unioned.groupby("_shard").map_groups(match_shard,
                                                batch_format="pyarrow")


# ------------------------------------------------------- quantile buckets


def quantile_bucket_assign(ds, group_col: str, value_col: str,
                           n_buckets: int = 4, bins: int = 256,
                           out_col: str = "bucket"):
    """Assign every row its within-group quantile bucket (ntile) from the
    grouped histogram sketch — "label each doc with its per-language
    length quartile" without any sort.

    Two sketch passes produce the (groups × n_buckets-1) edge matrix
    (tiny, broadcast via the object store); assignment is then one
    stateless vectorized pass: ``bucket = Σ_j (value >= edge_j)``.  The
    edges are the same sketch quantiles ``grouped_approx_quantiles``
    emits, so the whole operator replays exactly in SQL."""
    import ray

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2 (1 bucket is a no-op)")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = grouped_approx_quantiles(ds, group_col, value_col, qs,
                                     bins=bins).to_pandas() \
        .sort_values([group_col, "q"])
    groups = edges[group_col].drop_duplicates().tolist()
    emat = edges["quantile"].to_numpy(dtype=np.float64) \
        .reshape(len(groups), n_buckets - 1)
    garr = pa.array(groups)
    payload = (garr, emat)
    ref = ray.put(payload) if ray.is_initialized() else payload

    class _Assign:
        def __init__(self):
            self._p = None

        def _payload(self):
            if self._p is None:
                self._p = resolve_broadcast(ref)
            return self._p

        def __call__(self, batch: pa.Table) -> pa.Table:
            g, e = self._payload()
            gidx = np.asarray(pc.index_in(batch.column(group_col),
                                          value_set=g).cast(pa.int64()))
            v = np.asarray(batch.column(value_col).cast(pa.float64()))
            bucket = (v[:, None] >= e[gidx]).sum(axis=1).astype(np.int64)
            return batch.append_column(out_col, pa.array(bucket))

    return ds.map_batches(_Assign, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=4)


# ------------------------------------------------------------------ pivot


def pivot_counts(ds, key: str, cat_col: str, categories: "list[str]",
                 prefix: str = "n_"):
    """Long→wide pivot: one row per key with a count column per category
    (the fixed-vocabulary pivot — categories must be enumerated up front,
    which is what keeps the schema static and the shuffle a plain grouped
    aggregate).  Per batch: vectorized one-hot indicator columns; then the
    standard map-side-combined aggregate — the exchange carries one partial
    row per key per block."""
    cats = list(categories)
    cat_arr = pa.array(cats)

    def one_hot(b: pa.Table) -> pa.Table:
        cidx = np.asarray(pc.index_in(b.column(cat_col),
                                      value_set=cat_arr).cast(pa.int64()))
        cols = {key: b.column(key)}
        for j, c in enumerate(cats):
            cols[f"{prefix}{c}"] = pa.array((cidx == j).astype(np.int64))
        return pa.table(cols)

    wide = ds.map_batches(one_hot, batch_format="pyarrow",
                          zero_copy_batch=True)
    return grouped_aggregate(
        wide, [key],
        {f"{prefix}{c}": (f"{prefix}{c}", "sum") for c in cats})


# -------------------------------------------------------- rolling window


def rolling_sum_per_key(ds, key: str, order_col: str, value_col: str,
                        window_rows: int, out_col: str = "rolling",
                        tie_col: "str | None" = None):
    """Row-based rolling sum per key: for each row, the sum of
    ``value_col`` over the last ``window_rows`` rows (inclusive) of the
    same key in ``order_col`` order — SQL's ``ROWS BETWEEN w-1 PRECEDING
    AND CURRENT ROW``.

    Sharded shape (sessionize's): ONE key-shard exchange, one sort per
    shard, then the whole shard's rolling sums come from a cumsum and two
    gathers — window starts clamp at each key run's first row via the
    run-position vector.  Integer values stay exact in any engine."""
    keys = [key]
    sort_keys = [(key, "ascending"), (order_col, "ascending")]
    if tie_col:
        sort_keys.append((tie_col, "ascending"))

    def roll_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "rolling_sum_per_key", "shard")
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        order = pc.sort_indices(g, sort_keys=sort_keys)
        g = g.take(order)
        n = g.num_rows
        v = np.asarray(g.column(value_col).combine_chunks()
                       .cast(pa.int64()))
        same = _same_as_prev_row(g, keys)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(~same, idx, 0))
        pos = idx - run_start
        c = np.cumsum(v)
        start = idx - np.minimum(pos, window_rows - 1)
        roll = c - c[start] + v[start]
        return g.append_column(out_col, pa.array(roll))

    ds = _with_key_shard(ds, keys)
    return ds.groupby("_shard").map_groups(roll_shard,
                                           batch_format="pyarrow")


# ---------------------------------------------------------- ordered concat


def concat_by_key(ds, key: str, order_col: str, text_col: str,
                  sep: str = " ", out_col: str = "text",
                  count_col: str = "n_parts"):
    """One row per key with its texts joined in ``order_col`` order — the
    generalized transcript-assembly reduce (training-sequence
    materialization, session logs, doc reconstruction).

    Sharded shape: ONE key-shard exchange; each shard sorts once and joins
    every key's run with a single ``pc.binary_join`` over run-length list
    offsets — zero per-key callbacks."""

    def shard_concat(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "concat_by_key", "shard")
        key_type = g.column(key).type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], key_type),
                             count_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.large_string())})
        order = pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                              (order_col, "ascending")])
        g = g.take(order)
        texts = pc.fill_null(g.column(text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        starts = np.nonzero(~_same_as_prev_row(g, [key]))[0]
        offsets = np.append(starts, g.num_rows).astype(np.int64)
        runs = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), texts.cast(pa.large_string()))
        joined = pc.binary_join(runs, pa.scalar(sep, pa.large_string()))
        # stay large_string: a shard's concatenated text can exceed the
        # 2 GiB 32-bit-offset cap; downcasting would crash exactly at scale
        return pa.table({
            key: g.column(key).take(pa.array(starts)),
            count_col: pa.array(np.diff(offsets).astype(np.int64)),
            out_col: joined,
        })

    ds = _with_key_shard(ds, [key])
    return ds.groupby("_shard").map_groups(shard_concat,
                                           batch_format="pyarrow")


def rank_in_group(ds, group_col: str, order_col: str, id_col: str,
                  descending: bool = True, out_col: str = "rnk"):
    """Exact per-group row rank (SQL ``row_number() over (partition by g
    order by v [desc], id)`` — the (order, id) tie-break makes the order
    total, so position+1 IS the row number) plus the group size
    ``n_group``: the integer-exact basis for percentile features
    (rnk/n_group replays without float windows).

    One hash-shard shuffle; per shard one sort + segment arithmetic — the
    sessionize skeleton, no per-group callbacks."""

    def rank_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.int64())) \
                    .append_column("n_group", pa.array([], pa.int64()))
        warn_large_key_group(g.num_rows, "rank_in_group", "shard")
        order = pc.sort_indices(g, sort_keys=[
            (group_col, "ascending"),
            (order_col, "descending" if descending else "ascending"),
            (id_col, "ascending")])
        s = g.take(order)
        key_start = ~_same_as_prev_row(s, [group_col])
        key_ids = np.cumsum(key_start) - 1
        pos = np.arange(len(key_ids), dtype=np.int64)
        start_idx = np.nonzero(key_start)[0]
        rnk = pos - start_idx[key_ids] + 1
        sizes = np.bincount(key_ids).astype(np.int64)
        return s.append_column(out_col, pa.array(rnk)) \
                .append_column("n_group", pa.array(sizes[key_ids]))

    ds = _with_key_shard(ds, [group_col])
    return ds.groupby("_shard").map_groups(rank_shard, batch_format="pyarrow")


def event_gap_us(ds, key: str, ts_col: str, id_col: str,
                 out_col: str = "gap_us"):
    """Per-key lag difference: microseconds since the key's PREVIOUS event
    in (ts, id) order; a key's first event gets NULL (SQL
    ``ts - lag(ts) over (partition by key order by ts, id)``).

    One hash-shard shuffle; per shard one sort + a shifted subtraction
    masked at key boundaries — no per-key callbacks."""

    def gap_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        warn_large_key_group(g.num_rows, "event_gap_us", "shard")
        order = pc.sort_indices(g, sort_keys=[
            (key, "ascending"), (ts_col, "ascending"), (id_col, "ascending")])
        s = g.take(order)
        us = _ts_to_us(s.column(ts_col))
        gap = np.empty(len(us), dtype=np.int64)
        gap[0] = 0
        gap[1:] = us[1:] - us[:-1]
        # NULL at key boundaries (the key's first event has no predecessor)
        same = _same_as_prev_row(s, [key])
        return s.append_column(out_col, pc.if_else(
            pa.array(same), pa.array(gap), pa.scalar(None, pa.int64())))

    ds = _with_key_shard(ds, [key])
    return ds.groupby("_shard").map_groups(gap_shard, batch_format="pyarrow")
