"""Deterministic synthetic CDC binlog over transcript tables (FIXTURES.md F2).

Every field of event #lsn is a pure function of (seed, lsn) via counter-based
splitmix64 hashing, so generation is reproducible regardless of Ray block /
batch boundaries and replayed events are bit-identical to their originals.

Stream properties (SURVEY.md §7 step 4):
* strictly-increasing LSNs with injected exact duplicates (replay): a small
  fraction of emitted rows re-emit the event of an earlier lsn
* bounded reordering: rows are shuffled deterministically within each batch
* hot-key skew: quadratic rank skew + an explicit hot-conversation boost
* three schema-evolution epochs for the ``ts_raw`` representation:
    epoch 0 — int64 epoch-milliseconds rendered as digits
    epoch 1 — ruby-format string "%Y-%m-%d %H:%M:%S.%N %z" (UTC)
    epoch 2 — java-format string "yyyy-MM-dd HH:mm:ss.nnnnnnnnn"
              wall-clock in Asia/Tokyo (no zone suffix in text)
  plus the epoch-2 role-enum rename (user→human, assistant→ai) and the
  epoch-0 missing ``tool`` column (emitted as null).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EPOCH1_FORMAT = "%Y-%m-%d %H:%M:%S.%N %z"
EPOCH2_FORMAT = "yyyy-MM-dd HH:mm:ss.nnnnnnnnn"
EPOCH2_TZ = "Asia/Tokyo"
ROLES = ["user", "assistant", "system", "tool"]
ROLE_RENAMES_EPOCH2 = {"user": "human", "assistant": "ai"}
BASE_TS_MS = 1704067200000  # 2024-01-01T00:00:00Z
MAX_TURNS = 40

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Counter-based 64-bit hash (public splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))) & _MASK
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_WORDS = np.array(
    "the of data model turn agent tool call reply plan code test batch merge "
    "stream shard key value table row block store query state log index".split(),
    dtype=object,
)


def event_fields(lsn: np.ndarray, seed: int, num_events: int, num_convs: int):
    """All event payload fields as numpy/arrow arrays, derived from lsn."""
    lsn = lsn.astype(np.int64)
    h1 = splitmix64(lsn, seed + 1)
    h2 = splitmix64(lsn, seed + 2)
    h3 = splitmix64(lsn, seed + 3)
    h4 = splitmix64(lsn, seed + 4)
    h5 = splitmix64(lsn, seed + 5)

    # conv rank: quadratic skew + 4% of traffic to 8 hot conversations
    u = _u01(h1)
    conv = (u * u * num_convs).astype(np.int64)
    hot = (h2 % np.uint64(25)) == 0
    conv = np.where(hot, (h2 % np.uint64(8)).astype(np.int64), conv)

    turn = (h3 % np.uint64(MAX_TURNS)).astype(np.int32)
    is_delete = (h4 % np.uint64(100)) < np.uint64(3)

    epoch = np.minimum((lsn * 3) // max(num_events, 1), 2).astype(np.int8)

    # role enum (epoch 2 emits renamed spellings)
    role_idx = (h5 % np.uint64(4)).astype(np.int64)
    role_plain = np.array(ROLES, dtype=object)[role_idx]
    role_renamed = np.array(
        [ROLE_RENAMES_EPOCH2.get(r, r) for r in ROLES], dtype=object
    )[role_idx]
    role = np.where(epoch >= 2, role_renamed, role_plain)

    # text: deterministic, references lsn so upserts change content
    w1 = _WORDS[(h1 % np.uint64(len(_WORDS))).astype(np.int64)]
    w2 = _WORDS[(h2 % np.uint64(len(_WORDS))).astype(np.int64)]
    w3 = _WORDS[(h3 % np.uint64(len(_WORDS))).astype(np.int64)]
    text = pc.binary_join_element_wise(
        pa.array(w1, type=pa.string()), pa.array(w2, type=pa.string()),
        pa.array(w3, type=pa.string()),
        pc.cast(pa.array(lsn), pa.string()), " ",
    )

    tool = np.where(
        (epoch >= 1) & ((h4 % np.uint64(3)) == 0),
        np.char.add("tool-", (h4 % np.uint64(8)).astype(np.int64).astype(str)).astype(object),
        None,
    )

    ts_ms = BASE_TS_MS + lsn * 997 + (h5 % np.uint64(1000)).astype(np.int64)
    ts_ns = ts_ms * 1_000_000 + (h2 % np.uint64(1_000_000)).astype(np.int64)

    conv_id = pc.binary_join_element_wise(
        "conv-",
        pc.utf8_lpad(pc.cast(pa.array(conv), pa.string()), width=8, padding="0"),
        "",
    )
    return {
        "conv_id": conv_id,
        "turn_idx": pa.array(turn),
        "role": pa.array(role, type=pa.string()),
        "text": text,
        "tool": pa.array(tool.tolist(), type=pa.string()),
        "ts_ns": ts_ns,
        "epoch": epoch,
        "is_delete": is_delete,
    }


def _render_ts_raw(ts_ns: np.ndarray, epoch: np.ndarray) -> pa.Array:
    """Per-epoch ts representation (uses the engine's own formatters)."""
    from embulk_filter_timestamp_format_ray.functions.vectorized import (
        make_vector_formatter,
    )

    out = np.empty(len(ts_ns), dtype=object)
    m0 = epoch == 0
    if m0.any():
        out[m0] = (ts_ns[m0] // 1_000_000).astype(str)
    m1 = epoch == 1
    if m1.any():
        f1 = make_vector_formatter(EPOCH1_FORMAT, "UTC")
        out[m1] = np.asarray(f1.format_array(ts_ns[m1]), dtype=object)
    m2 = epoch == 2
    if m2.any():
        f2 = make_vector_formatter(EPOCH2_FORMAT, EPOCH2_TZ)
        out[m2] = np.asarray(f2.format_array(ts_ns[m2]), dtype=object)
    return pa.array(out.tolist(), type=pa.string())


class ChangeEventBatchGenerator:
    """map_batches callable: block of ids → CDC event batch (pa.Table)."""

    def __init__(self, seed: int, num_events: int, num_convs: int,
                 replay_fraction: float = 0.02, reorder: bool = True,
                 patch_permille: int = 0, conv_delete_permille: int = 0):
        self.seed = seed
        self.num_events = num_events
        self.num_convs = num_convs
        self.replay_every = max(int(1 / replay_fraction), 1) if replay_fraction else 0
        self.reorder = reorder
        self.patch_permille = patch_permille
        self.conv_delete_permille = conv_delete_permille

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("id"), dtype=np.int64)
        lsn = ids
        if self.replay_every:
            # exact duplicates IN ADDITION to the originals: a replayed copy
            # of an earlier event is appended after its original position
            h = splitmix64(ids, self.seed + 90)
            replay = (h % np.uint64(self.replay_every)) == 0
            lag = (splitmix64(ids, self.seed + 91) % np.uint64(64)).astype(np.int64) + 1
            dup_lsn = ids[replay & (ids >= lag)] - lag[replay & (ids >= lag)]
            lsn = np.concatenate([ids, dup_lsn])
        f = event_fields(lsn, self.seed, self.num_events, self.num_convs)
        op = np.where(f["is_delete"], "delete", "upsert")
        role, text, tool = f["role"], f["text"], f["tool"]
        ts_raw = _render_ts_raw(f["ts_ns"], f["epoch"])
        if self.patch_permille:
            # partial-column updates: a deterministic slice of the upsert
            # traffic becomes op='patch' events that set only a hashed
            # subset of {role, text, tool, ts} — NULL columns mean
            # "unchanged" (fold_patch_runs semantics); pure function of
            # lsn so replayed copies are byte-identical and an SQL oracle
            # can replay the rule
            h6 = splitmix64(lsn, self.seed + 6)
            is_patch = (~f["is_delete"]) & (
                (h6 % np.uint64(1000)) < np.uint64(self.patch_permille))
            op = np.where(is_patch, "patch", op)
            bits = (h6 >> np.uint64(10)).astype(np.int64)
            set_role = (bits & 1) == 1
            set_text = (bits & 2) == 2
            set_tool = (bits & 4) == 4
            set_ts = (bits & 8) == 8
            # a patch must SET at least one column: selecting only `tool`
            # when the generated tool is itself NULL would yield an all-NULL
            # (no-op) patch — force text on when the EFFECTIVE set is empty
            tool_present = np.asarray(pc.is_valid(tool))
            none_set = ~(set_role | set_text | (set_tool & tool_present)
                         | set_ts)
            set_text |= none_set
            keep = lambda m, arr: pc.if_else(  # noqa: E731
                pa.array(~is_patch | m), arr, pa.scalar(None, pa.string()))
            role = keep(set_role, role)
            text = keep(set_text, text)
            tool = keep(set_tool, tool)
            ts_raw = keep(set_ts, ts_raw)
        if self.conv_delete_permille:
            # conversation-erasure requests (op='delete_conv'): conv-scoped
            # tombstones that take precedence over the row's delete/patch
            # draw; pure function of lsn (replay-identical, SQL-replayable).
            # NormalizeStage forces turn_idx to the tombstone sentinel and
            # drops the value payload downstream.
            h7 = splitmix64(lsn, self.seed + 7)
            is_cd = (h7 % np.uint64(1000)) < np.uint64(
                self.conv_delete_permille)
            op = np.where(is_cd, "delete_conv", op)
        tbl = pa.table({
            "lsn": pa.array(lsn),
            "op": pa.array(op.tolist(), type=pa.string()),
            "conv_id": f["conv_id"],
            "turn_idx": f["turn_idx"],
            "role": role,
            "text": text,
            "tool": tool,
            "ts_raw": ts_raw,
            "schema_epoch": pa.array(f["epoch"]),
        })
        if self.reorder:
            # bounded deterministic reordering within the batch
            pos = np.arange(tbl.num_rows, dtype=np.int64)
            jitter = (splitmix64(lsn, self.seed + 92) % np.uint64(32)).astype(np.int64)
            perm = np.argsort(pos + jitter, kind="stable")
            tbl = tbl.take(pa.array(perm))
        return tbl


def change_events(num_events: int, *, seed: int = 42, num_convs: "int | None" = None,
                  parallelism: "int | None" = None, replay_fraction: float = 0.02,
                  reorder: bool = True, patch_permille: int = 0,
                  conv_delete_permille: int = 0):
    """Ray Dataset of `num_events` synthetic CDC events (streaming blocks)."""
    import ray.data

    if num_convs is None:
        num_convs = max(num_events // 50, 1)
    ds = ray.data.range(num_events, override_num_blocks=parallelism)
    gen = ChangeEventBatchGenerator(seed, num_events, num_convs,
                                    replay_fraction, reorder,
                                    patch_permille=patch_permille,
                                    conv_delete_permille=conv_delete_permille)
    return ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


def expected_event_table(num_events: int, *, seed: int = 42,
                         num_convs: "int | None" = None,
                         patch_permille: int = 0,
                         conv_delete_permille: int = 0) -> pa.Table:
    """Driver-side oracle input: all events in lsn-emission order, without
    replay/reorder noise (used by tests to cross-check the generator)."""
    if num_convs is None:
        num_convs = max(num_events // 50, 1)
    ids = np.arange(num_events, dtype=np.int64)
    gen = ChangeEventBatchGenerator(seed, num_events, num_convs,
                                    replay_fraction=0.0, reorder=False,
                                    patch_permille=patch_permille,
                                    conv_delete_permille=conv_delete_permille)
    return gen(pa.table({"id": ids}))


def poison_batch(batch: pa.Table, permille: int,
                 unknown_epoch_band: bool = False) -> pa.Table:
    """Deterministically corrupt ~``permille``/1024 of a change-event batch
    in two disjoint lsn bands, exercising both non-parse quarantine reasons
    of the CDC dead-letter queue (pipelines/cdc.py NormalizeStage):

    * ``lsn & 1023 <  permille//2``       → op = 'corrupt'  (invalid envelope)
    * ``permille//2 ≤ lsn & 1023 < permille`` → ts_raw = '<garbled>'
      (unparseable in every schema epoch)

    ``unknown_epoch_band=True`` adds a third band
    (``permille ≤ lsn & 1023 < 3*permille//2``): schema_epoch 7 with a
    valid-but-unconfigured ISO-Z layout — HEALABLE poison for the
    suggest_dlq_specs → reprocess_dlq loop.

    Pure function of lsn, so replayed copies of a poisoned event are
    byte-identical (the DLQ's at-least-once duplicates collapse under
    DISTINCT) and an SQL oracle can replay the rule exactly."""
    import pyarrow.compute as pc

    band = pc.cast(pc.bit_wise_and(batch.column("lsn"), 1023), pa.int64())
    half = max(permille // 2, 1)
    bad_op = pc.less(band, half)
    bad_ts = pc.and_(pc.greater_equal(band, half), pc.less(band, permille))
    i_op = batch.schema.get_field_index("op")
    i_ts = batch.schema.get_field_index("ts_raw")
    batch = batch.set_column(i_op, "op", pc.if_else(
        bad_op, pa.scalar("corrupt"), batch.column("op")))
    batch = batch.set_column(i_ts, "ts_raw", pc.if_else(
        bad_ts, pa.scalar("<garbled>"), batch.column("ts_raw")))
    if unknown_epoch_band:
        bnp = np.asarray(band)
        new_mask = (bnp >= permille) & (bnp < permille + half)
        if new_mask.any():
            lsn = np.asarray(batch.column("lsn"), dtype=np.int64)
            base = np.datetime64("2024-01-01T00:00:00")
            iso = np.datetime_as_string(
                base + (lsn % 86_400).astype("timedelta64[s]"), unit="s")
            iso = np.char.add(iso, "Z")
            mask_arr = pa.array(new_mask)
            batch = batch.set_column(
                batch.schema.get_field_index("ts_raw"), "ts_raw",
                pc.if_else(mask_arr, pa.array(iso.tolist(), pa.string()),
                           batch.column("ts_raw")))
            epoch_t = batch.column("schema_epoch").type
            batch = batch.set_column(
                batch.schema.get_field_index("schema_epoch"), "schema_epoch",
                pc.if_else(mask_arr, pa.scalar(7).cast(epoch_t),
                           batch.column("schema_epoch")))
    return batch


def poison_events(ds, permille: int, unknown_epoch_band: bool = False):
    """Dataset wrapper over :func:`poison_batch` (no-op at permille=0)."""
    if not permille:
        return ds
    return ds.map_batches(
        lambda b: poison_batch(b, permille, unknown_epoch_band),
        batch_format="pyarrow", zero_copy_batch=True)


def evolve_batch(batch: pa.Table, from_lsn: int) -> pa.Table:
    """Widen-only schema-evolution traffic: append an extra ``lang`` value
    column (lsn%3 → en/fr/de) set from ``from_lsn`` on, NULL below it.

    Pure function of lsn (replay-safe, SQL-oracle-replayable).  Within one
    dataset the column is present on every row for block-schema uniformity;
    the committed end state is identical to a true mid-stream appearance
    because an upsert with NULL lang and an upsert that predates the column
    both leave the row's lang NULL (tests/test_schema_evolution.py pins the
    mid-stream variant)."""
    import pyarrow.compute as pc

    lsn = np.asarray(batch.column("lsn").combine_chunks().cast(pa.int64()))
    lang = pc.take(pa.array(["en", "fr", "de"]), pa.array(lsn % 3))
    lang = pc.if_else(pa.array(lsn >= from_lsn), lang,
                      pa.scalar(None, pa.string()))
    return batch.append_column("lang", lang)


def evolve_events(ds, from_lsn: "int | None"):
    """Dataset wrapper over :func:`evolve_batch` (no-op when None)."""
    if from_lsn is None:
        return ds
    return ds.map_batches(lambda b: evolve_batch(b, from_lsn),
                          batch_format="pyarrow", zero_copy_batch=True)


def embed_batch(batch: pa.Table, dim: int = 8, seed: int = 7) -> pa.Table:
    """Attach a deterministic ``embedding`` list<double> value column — the
    traffic shape a vector-indexed lake ingests (each upsert carries its
    turn's embedding; payload-free tombstones carry NULL).

    Pure function of lsn (replay-safe: a replayed copy is byte-identical;
    SQL oracles read the same values back from the fixture parquet).  The
    components are full-precision uniform doubles in [-1, 1) from
    splitmix64 lanes, so cosine ties between distinct rows are measure-zero
    — a ranking oracle in another engine's float arithmetic stays stable."""
    lsn = np.asarray(batch.column("lsn").combine_chunks().cast(pa.int64()))
    n = len(lsn)
    lanes = lsn[:, None] * np.int64(dim) + np.arange(dim, dtype=np.int64)
    vals = _u01(splitmix64(lanes.reshape(-1), seed)) * 2.0 - 1.0
    op = batch.column("op")
    is_tomb = np.asarray(pc.is_in(
        op, value_set=pa.array(["delete", "delete_conv"])).fill_null(False))
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, pa.array(vals, pa.float64()))
    # a NULL take index yields a NULL list element — the clean way to mask
    # whole lists (null offsets instead would merge neighbours' values)
    emb = emb.take(pa.array(np.arange(n, dtype=np.int64), mask=is_tomb))
    return batch.append_column("embedding", emb)


def embed_events(ds, dim: int = 8, seed: int = 7):
    """Dataset wrapper over :func:`embed_batch`."""
    return ds.map_batches(lambda b: embed_batch(b, dim, seed),
                          batch_format="pyarrow", zero_copy_batch=True)
