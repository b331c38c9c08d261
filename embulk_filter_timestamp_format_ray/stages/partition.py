"""Hash partitioning for the CDC upsert path (SURVEY.md §2.8, §7 step 5).

The shuffle key is ``hash(conv_id, turn_idx) % P`` — the merge key itself —
so hot conversations spread across partitions by construction (turn-level
salting) while per-key max-LSN dedup stays partition-local, and the
partition id is stable across apply() calls so incremental merges find their
prior state.  ``hash(conv_id) % P`` (conversation-local layout) is available
via ``by_turn=False`` for pipelines that need whole conversations
co-located; that mode supports explicit hot-key salting via ``salt_keys``.

Hashing trick: conv_id strings repeat heavily (one per turn/update), so we
dictionary-encode and hash only the uniques in Python (crc32), then map back
via the dictionary indices — no per-row Python.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64


def hash_strings_dict(arr: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Deterministic uint64 hash per row of a string column.

    Fast path: polars' vectorized xxhash (stable across processes for a
    fixed polars version — every Ray worker ships the same one).  Fallback:
    dictionary-encode + crc32-the-uniques."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        import polars as pl

        s = pl.from_arrow(arr)
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        return s.hash(seed=42).to_numpy().astype(np.uint64)
    except Exception:
        pass
    enc = pc.dictionary_encode(arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dictionary = enc.dictionary.to_pylist()
    uniq_hash = np.array(
        [zlib.crc32(s.encode() if s is not None else b"\x00") for s in dictionary],
        dtype=np.uint64,
    )
    idx = np.asarray(enc.indices.cast(pa.int64()))
    return uniq_hash[idx]


def hash_algo_id() -> str:
    """Identifier of the partition-hash implementation actually in use.

    The lake layout is a function of this hash; it is recorded in the
    manifest at first commit and every later apply/point-read refuses to run
    under a different algorithm (e.g. polars missing, or a polars upgrade
    that changes xxhash output) — otherwise keys silently route to fresh
    pids and prior state is never superseded."""
    try:
        import polars as pl

        return f"polars-xxhash/{pl.__version__}"
    except Exception:
        return "crc32"


def candidate_pids_for_conv(conv_id: str, num_partitions: int,
                            salt_keys: "frozenset[str] | None" = None,
                            salt_factor: int = 8) -> "list[int]":
    """All pids that conv-mode routing can assign rows of ``conv_id`` to.

    Unsalted conversations live in exactly one pid.  Salted (hot) ones are
    spread by a turn-derived salt in 0..salt_factor-1, so a point lookup
    must read that whole candidate set (plus the unsalted pid, which costs
    nothing and is where PartitionStage sends rows when salting is off)."""
    conv_hash = hash_strings_dict(pa.array([conv_id]))
    mixed = splitmix64(conv_hash, 7)
    pids = {int(mixed[0] % np.uint64(num_partitions))}
    if salt_keys and conv_id in salt_keys:
        for s in range(salt_factor):
            salted = splitmix64(mixed ^ np.uint64(s), 13)
            pids.add(int(salted[0] % np.uint64(num_partitions)))
    return sorted(pids)


def detect_hot_keys(ds, key_col: str = "conv_id", sample_rows: int = 100_000,
                    hot_fraction: float = 0.01) -> "frozenset[str]":
    """Sample the stream and return keys whose frequency exceeds
    ``hot_fraction`` — candidates for salting in conv-local partition mode.
    One pass over a bounded sample; never materializes the full dataset."""
    import pyarrow.compute as _pc

    sample = ds.limit(sample_rows)
    counts: dict[str, int] = {}
    total = 0
    for batch in sample.iter_batches(batch_format="pyarrow"):
        col = batch.column(key_col)
        vc = col.combine_chunks().value_counts() if hasattr(col, "combine_chunks") else col.value_counts()
        for item in vc.to_pylist():
            counts[item["values"]] = counts.get(item["values"], 0) + item["counts"]
            total += item["counts"]
    if not total:
        return frozenset()
    cut = total * hot_fraction
    return frozenset(k for k, c in counts.items() if c >= cut)


class PartitionStage:
    """map_batches callable: append an int32 ``_pid`` partition column."""

    def __init__(self, num_partitions: int, by_turn: bool = True,
                 salt_keys: "frozenset[str] | None" = None, salt_factor: int = 8):
        self.num_partitions = num_partitions
        self.by_turn = by_turn
        self.salt_keys = salt_keys or frozenset()
        self.salt_factor = salt_factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "op" in batch.schema.names:
            # conversation tombstones (op='delete_conv') erase keys in
            # EVERY partition that may hold turns of their conv: under
            # turn-level hashing a conversation spans partitions, and under
            # conv-local hashing salting fans hot convs out — so tombstones
            # replicate to all pids.  They are rare (erasure requests), so
            # the x num_partitions fanout is metadata-scale.
            cd = pc.fill_null(pc.equal(batch.column("op"), "delete_conv"),
                              False)
            if pc.any(cd).as_py():
                tomb = batch.filter(cd)
                rest = self._route(batch.filter(pc.invert(cd)))
                p = self.num_partitions
                rep = tomb.take(pa.array(
                    np.repeat(np.arange(tomb.num_rows, dtype=np.int64), p)))
                if "_pid" in rep.schema.names:
                    rep = rep.drop_columns(["_pid"])
                rep = rep.append_column("_pid", pa.array(
                    np.tile(np.arange(p, dtype=np.int32), tomb.num_rows)))
                # combine_chunks: Ray's streaming executor logs schema-drift
                # warnings on bundles whose columns carry empty chunk lists
                # (the 0-row side of the concat); tombstone blocks are rare
                # so the copy is noise-level
                return pa.concat_tables([rest, rep]).combine_chunks()
        return self._route(batch)

    def _route(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            if "_pid" in batch.schema.names:
                batch = batch.drop_columns(["_pid"])
            return batch.append_column("_pid", pa.array([], pa.int32()))
        conv_hash = hash_strings_dict(batch.column("conv_id"))
        if self.by_turn:
            turn = np.asarray(batch.column("turn_idx").cast(pa.int64())).astype(np.uint64)
            mixed = splitmix64(conv_hash ^ (turn * np.uint64(0x9E3779B97F4A7C15)), 7)
        else:
            mixed = splitmix64(conv_hash, 7)
            if self.salt_keys:
                conv = batch.column("conv_id").to_pylist()
                turn = np.asarray(batch.column("turn_idx").cast(pa.int64())).astype(np.uint64)
                salted = np.array([c in self.salt_keys for c in conv])
                salt = splitmix64(turn, 11) % np.uint64(self.salt_factor)
                mixed = np.where(salted, splitmix64(mixed ^ salt, 13), mixed)
        pid = (mixed % np.uint64(self.num_partitions)).astype(np.int32)
        if "_pid" in batch.schema.names:
            batch = batch.drop_columns(["_pid"])
        return batch.append_column("_pid", pa.array(pid))
