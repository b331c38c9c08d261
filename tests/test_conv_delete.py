"""Conversation-level tombstones (op='delete_conv' — GDPR-style erasure).

Contract (pipelines/cdc.py keep_last_per_key + fold_patch_runs):

* a delete_conv at lsn L erases EVERY (conv, turn) key of its conversation
  whose state lsn is below L — one more max-merge horizon, so the fold
  stays associative;
* events above the horizon (upserts, patches) survive / resurrect;
* tombstones are replicated by PartitionStage to every partition (a
  conversation spans partitions under turn-level hashing), pass the
  combiner UNFOLDED (folding would collapse the per-pid replicas), persist
  in delta files, and are dropped once a base merge / compaction has
  materialized the erasure.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CONV_TOMBSTONE_TURN,
    NormalizeStage,
    PreMergeCombiner,
    decode_shuffle_encoding,
    keep_last_per_key,
)
from embulk_filter_timestamp_format_ray.stages.partition import PartitionStage

_TS = pa.timestamp("ns", tz="UTC")


def _events_table(rows):
    """rows: (op, conv, turn, role, text, tool, ts_ns_or_None, lsn);
    delete_conv rows use turn=CONV_TOMBSTONE_TURN and a NULL payload."""
    return pa.table({
        "op": pa.array([r[0] for r in rows], pa.string()),
        "conv_id": pa.array([r[1] for r in rows], pa.string()),
        "turn_idx": pa.array([r[2] for r in rows], pa.int32()),
        "role": pa.array([r[3] for r in rows], pa.string()),
        "text": pa.array([r[4] for r in rows], pa.string()),
        "tool": pa.array([r[5] for r in rows], pa.string()),
        "ts": pa.array([r[6] for r in rows], pa.int64()).cast(
            pa.timestamp("ns")).cast(_TS),
        "lsn": pa.array([r[7] for r in rows], pa.int64()),
    })


def scalar_replay(rows):
    """Sequential replay incl. patch + delete_conv (the executable spec)."""
    state = {}
    for r in sorted(rows, key=lambda r: r[7]):
        op, conv, turn, role, text, tool, ts, lsn = r
        if op == "delete_conv":
            for k in [k for k in state if k[0] == conv]:
                state.pop(k)
            continue
        k = (conv, turn)
        if op == "delete":
            state.pop(k, None)
            continue
        if op == "upsert":
            state[k] = {"role": role, "text": text, "tool": tool,
                        "ts": ts, "lsn": lsn}
            continue
        cur = state.get(
            k, {"role": None, "text": None, "tool": None, "ts": None,
                "lsn": lsn})
        for col, v in (("role", role), ("text", text), ("tool", tool),
                       ("ts", ts)):
            if v is not None:
                cur[col] = v
        cur["lsn"] = lsn
        state[k] = cur
    return state


def _fold_to_state(tbl):
    out = keep_last_per_key(tbl)
    live = out.filter(pc.invert(pc.is_in(
        out.column("op"), value_set=pa.array(["delete", "delete_conv"]))))
    ts_ns = live.column("ts").cast(pa.timestamp("ns")).cast(pa.int64())
    return {
        (r["conv_id"], r["turn_idx"]): {
            "role": r["role"], "text": r["text"], "tool": r["tool"],
            "ts": ts_ns[i].as_py(), "lsn": r["lsn"]}
        for i, r in enumerate(live.to_pylist())}


CD = CONV_TOMBSTONE_TURN


def test_conv_delete_semantics():
    rows = [
        # conv a: turn 1 erased (upsert below horizon), turn 2 survives
        # (upsert above), turn 3 resurrected sparsely by a patch above
        ("upsert", "a", 1, "u", "t1", "x", 10, 1),
        ("upsert", "a", 3, "u", "t3", None, 30, 3),
        ("delete_conv", "a", CD, None, None, None, None, 5),
        ("upsert", "a", 2, "v", "t2", None, 20, 7),
        ("patch", "a", 3, None, "p9", None, None, 9),
        # conv b untouched
        ("upsert", "b", 1, "w", "q1", None, 40, 2),
    ]
    got = _fold_to_state(_events_table(rows))
    assert got == scalar_replay(rows)
    assert got == {
        ("a", 2): {"role": "v", "text": "t2", "tool": None, "ts": 20,
                   "lsn": 7},
        ("a", 3): {"role": None, "text": "p9", "tool": None, "ts": None,
                   "lsn": 9},
        ("b", 1): {"role": "w", "text": "q1", "tool": None, "ts": 40,
                   "lsn": 2},
    }
    # the folded output keeps exactly one tombstone row per conv, max lsn
    folded = keep_last_per_key(_events_table(
        rows + [("delete_conv", "a", CD, None, None, None, None, 4)]))
    tombs = folded.filter(pc.equal(folded.column("op"), "delete_conv"))
    assert tombs.num_rows == 1
    assert tombs.column("lsn").to_pylist() == [5]
    assert tombs.column("turn_idx").to_pylist() == [CD]


def _random_events(seed, n, n_convs=4, n_turns=3):
    rng = np.random.default_rng(seed)
    rows = []
    lsns = rng.permutation(n * 3)[:n]
    for i in range(n):
        conv = f"c{rng.integers(n_convs)}"
        turn = int(rng.integers(n_turns))
        op = ["upsert", "delete", "patch", "delete_conv"][
            rng.choice(4, p=[.4, .12, .36, .12])]
        lsn = int(lsns[i])
        if op == "delete":
            rows.append(("delete", conv, turn, None, None, None, None, lsn))
        elif op == "delete_conv":
            rows.append(("delete_conv", conv, CD, None, None, None, None,
                         lsn))
        elif op == "upsert":
            tool = None if rng.random() < .4 else f"T{rng.integers(4)}"
            rows.append(("upsert", conv, turn, f"r{rng.integers(3)}",
                         f"x{lsn}", tool, int(rng.integers(100)), lsn))
        else:
            bits = 0
            while not bits:
                bits = int(rng.integers(1, 16))
            rows.append(("patch", conv, turn,
                         f"pr{lsn}" if bits & 1 else None,
                         f"pt{lsn}" if bits & 2 else None,
                         f"pl{lsn}" if bits & 4 else None,
                         int(rng.integers(100)) if bits & 8 else None,
                         lsn))
    for j in rng.choice(len(rows), size=max(1, n // 10), replace=False):
        rows.append(rows[int(j)])
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6])
def test_conv_delete_fold_associative_across_blocks(seed):
    """split → per-block combine → concat → fold == sequential replay.
    The combiner must forward tombstones unfolded; the reduce applies the
    horizon exactly."""
    rows = _random_events(seed, 150)
    want = scalar_replay(rows)
    tbl = _events_table(rows)
    rng = np.random.default_rng(seed + 500)
    tbl = tbl.take(pa.array(rng.permutation(tbl.num_rows)))
    n_blocks = int(rng.integers(1, 7))
    cuts = (np.sort(rng.choice(tbl.num_rows, size=n_blocks - 1,
                               replace=False))
            if n_blocks > 1 else np.array([], dtype=np.int64))
    combiner = PreMergeCombiner(wire_encode=bool(seed % 2))
    parts, lo = [], 0
    for hi in [*cuts.tolist(), tbl.num_rows]:
        block = tbl.slice(lo, hi - lo)
        lo = hi
        if block.num_rows:
            parts.append(decode_shuffle_encoding(combiner(block)))
    merged = pa.concat_tables(parts, promote_options="permissive")
    assert _fold_to_state(merged) == want


def test_combiner_forwards_tombstones_uncombined():
    """Replicated tombstones (same key, same lsn, different pids) must NOT
    collapse in the combiner — each partition needs its copy."""
    base = _events_table([
        ("delete_conv", "a", CD, None, None, None, None, 5),
        ("delete_conv", "a", CD, None, None, None, None, 5),
        ("upsert", "a", 1, "u", "t", None, 1, 7),
    ])
    batch = base.append_column("_pid", pa.array([0, 1, 0], pa.int32()))
    out = PreMergeCombiner()(batch)
    tomb = out.filter(pc.equal(out.column("op"), "delete_conv"))
    assert sorted(tomb.column("_pid").to_pylist()) == [0, 1]


def test_partition_stage_replicates_tombstones():
    tbl = _events_table([
        ("upsert", "a", 1, "u", "t", None, 1, 1),
        ("delete_conv", "a", CD, None, None, None, None, 2),
    ])
    out = PartitionStage(8)(tbl)
    tomb = out.filter(pc.equal(out.column("op"), "delete_conv"))
    assert sorted(tomb.column("_pid").to_pylist()) == list(range(8))
    rest = out.filter(pc.equal(out.column("op"), "upsert"))
    assert rest.num_rows == 1


def test_normalize_conv_delete_envelope():
    batch = pa.table({
        "lsn": pa.array([1, 2], pa.int64()),
        "op": pa.array(["upsert", "delete_conv"]),
        "conv_id": pa.array(["c", "c"]),
        "turn_idx": pa.array([3, None], pa.int32()),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["t", "gone"]),
        "tool": pa.array([None, "tool-1"], pa.string()),
        "ts_raw": pa.array(["1700000000000", None]),
        "schema_epoch": pa.array([0, 0], pa.int64()),
    })
    out = NormalizeStage(dlq=True)(batch)
    assert out.num_rows == 2
    row = out.filter(pc.equal(out.column("op"), "delete_conv")).to_pylist()[0]
    # turn forced to the sentinel, payload nulled, no quarantine
    assert row["turn_idx"] == CONV_TOMBSTONE_TURN
    assert row["role"] is None and row["text"] is None and row["tool"] is None
    assert row["dlq_reason"] is None


def test_conv_delete_e2e_base_delta_compact(ray_session, tmp_path_factory):
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        ROLE_RENAMES_EPOCH2,
        change_events,
        expected_event_table,
    )

    n = 6000
    ev = expected_event_table(n, seed=13, patch_permille=120,
                              conv_delete_permille=6)
    assert "delete_conv" in set(ev.column("op").to_pylist())
    ren = {v: k for k, v in ROLE_RENAMES_EPOCH2.items()}
    rows = []
    for r in ev.to_pylist():
        role = ren.get(r["role"], r["role"]) if r["role"] is not None else None
        turn = CD if r["op"] == "delete_conv" else r["turn_idx"]
        rows.append((r["op"], r["conv_id"], turn, role, r["text"],
                     r["tool"], None, r["lsn"]))
    want = scalar_replay(rows)

    def lake_state(pipe):
        tbl = pipe.final_state_sorted()
        assert min(tbl.column("turn_idx").to_pylist(), default=0) >= 0, \
            "tombstone row leaked into the read view"
        return {(r["conv_id"], r["turn_idx"]):
                {"role": r["role"], "text": r["text"], "tool": r["tool"],
                 "ts": None, "lsn": r["lsn"]}
                for r in tbl.select(
                    ["conv_id", "turn_idx", "role", "text", "tool", "lsn"]
                ).to_pylist()}

    base = tmp_path_factory.mktemp("convdel_lakes")
    p1 = CDCPipeline(str(base / "base"), num_partitions=8)
    p1.apply(change_events(n, seed=13, patch_permille=120,
                           conv_delete_permille=6, parallelism=4))
    assert lake_state(p1) == want
    assert p1.fsck()["violations"] == []

    p2 = CDCPipeline(str(base / "delta"), num_partitions=8)
    lsn = ev.column("lsn")
    cut = pa.scalar(n // 2, pa.int64())
    p2.apply(ray.data.from_arrow(ev.filter(pc.less(lsn, cut))))
    p2.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(lsn, cut))))
    assert lake_state(p2) == want      # merge-on-read fold applies horizon
    assert p2.fsck()["violations"] == []
    p2.compact_deltas()
    assert lake_state(p2) == want      # compaction materialized the erasure
    # idempotent replay
    p2.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(lsn, cut))))
    assert lake_state(p2) == want
    assert p2.fsck()["violations"] == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_op_schedule_full_op_space(ray_session, tmp_path_factory,
                                          seed):
    """Composition fuzz over the FULL op space (upsert/delete/patch/
    delete_conv): a seeded random schedule of base applies, delta commits,
    compactions and a mid-stream repartition over random chunk boundaries
    with overlapping re-deliveries must converge to the sequential replay
    — extends test_delta_commits.test_random_op_schedule_converges to the
    partial-update and erasure tiers."""
    import numpy as np
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        ROLE_RENAMES_EPOCH2,
        expected_event_table,
    )

    n = 5000
    ev = expected_event_table(n, seed=21, patch_permille=150,
                              conv_delete_permille=6)
    ren = {v: k for k, v in ROLE_RENAMES_EPOCH2.items()}
    rows = []
    for r in ev.to_pylist():
        role = ren.get(r["role"], r["role"]) if r["role"] is not None else None
        turn = CD if r["op"] == "delete_conv" else r["turn_idx"]
        rows.append((r["op"], r["conv_id"], turn, role, r["text"],
                     r["tool"], None, r["lsn"]))
    want = scalar_replay(rows)

    rng = np.random.default_rng(seed)
    lake = str(tmp_path_factory.mktemp(f"lake_fullops_{seed}"))
    pipe = CDCPipeline(lake, num_partitions=8,
                       auto_compact_deltas=(4 if seed % 2 else None))
    cuts = sorted(rng.choice(np.arange(200, n - 200), size=5,
                             replace=False).tolist())
    bounds = [0, *cuts, n]
    lsn = ev.column("lsn")
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        overlap = int(rng.integers(0, lo // 2 + 1))
        chunk = ev.filter(pc.and_(
            pc.greater_equal(lsn, pa.scalar(lo - overlap, pa.int64())),
            pc.less(lsn, pa.scalar(hi, pa.int64()))))
        if rng.choice(["base", "delta", "delta"]) == "base":
            pipe.apply(ray.data.from_arrow(chunk))
        else:
            pipe.apply_delta(ray.data.from_arrow(chunk))
        if rng.random() < 0.3:
            pipe.compact_deltas()
        if i == 3 and seed % 2 == 0:
            pipe.repartition_lake(16 if seed == 0 else 4)

    tbl = pipe.final_state_sorted()
    assert min(tbl.column("turn_idx").to_pylist(), default=0) >= 0
    got = {(r["conv_id"], r["turn_idx"]):
           {"role": r["role"], "text": r["text"], "tool": r["tool"],
            "ts": None, "lsn": r["lsn"]}
           for r in tbl.select(
               ["conv_id", "turn_idx", "role", "text", "tool", "lsn"]
           ).to_pylist()}
    assert got == want
    assert pipe.fsck()["violations"] == []


def test_erasure_reaches_sync_mirror(ray_session, tmp_path_factory):
    """A conversation erased upstream disappears from a downstream sync
    mirror: the changefeed ships the erased keys as deletes."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    base = tmp_path_factory.mktemp("erase_sync")
    lake, out = str(base / "lake"), str(base / "mirror")
    pipe = CDCPipeline(lake, num_partitions=4)
    ev = expected_event_table(1200)
    pipe.apply(ray.data.from_arrow(ev))
    pipe.sync_changes(out)
    live = pipe.final_state_sorted()
    victim = live.column("conv_id")[0].as_py()
    n_victim = live.filter(
        pc.equal(live.column("conv_id"), victim)).num_rows
    assert n_victim > 0

    tomb = pa.table({
        "lsn": pa.array([2_000_000], pa.int64()),
        "op": pa.array(["delete_conv"]),
        "conv_id": pa.array([victim]),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts_raw": pa.array([None], pa.string()),
        "schema_epoch": pa.array([0], pa.int64()),
    })
    pipe.apply(ray.data.from_arrow(tomb))
    pipe.sync_changes(out)
    mirror = pa.Table.from_pandas(
        CDCPipeline.read_sync_mirror(out).to_pandas(), preserve_index=False)
    assert mirror.filter(
        pc.equal(mirror.column("conv_id"), victim)).num_rows == 0
    # and the mirror matches live state overall
    assert mirror.num_rows == pipe.final_state_sorted().num_rows


def test_erasure_physically_purges_after_retention(ray_session,
                                                   tmp_path_factory):
    """GDPR completeness: after the erasure commit, subsequent commits
    rolling the retention window, and GC, NO parquet file under the lake
    still contains the erased conversation's bytes.  (The erasure commit
    itself rewrites every partition — tombstones replicate to all pids —
    so pre-erasure file content survives only in retained snapshots.)"""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    lake = str(tmp_path_factory.mktemp("erase_purge") / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True,
                       time_travel_retain=2)
    ev = expected_event_table(1200)
    pipe.apply(ray.data.from_arrow(ev))
    live = pipe.final_state_sorted()
    victim = live.column("conv_id")[0].as_py()

    def mk(lsn, op="delete_conv", conv=victim):
        return pa.table({
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array([op]),
            "conv_id": pa.array([conv]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["filler"], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts_raw": pa.array(["1700000000000"], pa.string()),
            "schema_epoch": pa.array([0], pa.int64()),
        })

    pipe.apply(ray.data.from_arrow(mk(2_000_000)))          # erasure commit
    # roll the retention window past the pre-erasure snapshots
    pipe.apply(ray.data.from_arrow(mk(2_000_001, op="upsert",
                                      conv="conv-zzz")))
    pipe.apply(ray.data.from_arrow(mk(2_000_002, op="upsert",
                                      conv="conv-zzz")))
    pipe.gc()
    hits = []
    for root, _, files in os.walk(lake):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f))
            if "conv_id" in t.schema.names and t.filter(
                    pc.equal(t.column("conv_id"), victim)).num_rows:
                hits.append(os.path.join(root, f))
    assert hits == [], f"erased conversation still on disk in {hits}"
    # and no retained version can read it back
    for v in pipe.versions():
        snap = pa.Table.from_pandas(
            pipe.read_lake_at(v).to_pandas(), preserve_index=False)
        assert snap.filter(
            pc.equal(snap.column("conv_id"), victim)).num_rows == 0


def test_actor_exchange_full_op_space(ray_session, tmp_path_factory):
    """The raw-actor push exchange funnels through the same fold kernels:
    delta commits with patches + conversation tombstones via
    exchange="actor" converge to the sequential replay."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        ROLE_RENAMES_EPOCH2,
        expected_event_table,
    )

    n = 4000
    ev = expected_event_table(n, seed=17, patch_permille=150,
                              conv_delete_permille=6)
    ren = {v: k for k, v in ROLE_RENAMES_EPOCH2.items()}
    rows = []
    for r in ev.to_pylist():
        role = ren.get(r["role"], r["role"]) if r["role"] is not None else None
        turn = CD if r["op"] == "delete_conv" else r["turn_idx"]
        rows.append((r["op"], r["conv_id"], turn, role, r["text"],
                     r["tool"], None, r["lsn"]))
    want = scalar_replay(rows)

    lake = str(tmp_path_factory.mktemp("actor_fullops") / "lake")
    pipe = CDCPipeline(lake, num_partitions=8)
    lsn = ev.column("lsn")
    cut = pa.scalar(n // 2, pa.int64())
    pipe.apply(ray.data.from_arrow(ev.filter(pc.less(lsn, cut))),
               exchange="actor")
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(lsn, cut))), exchange="actor")
    tbl = pipe.final_state_sorted()
    got = {(r["conv_id"], r["turn_idx"]):
           {"role": r["role"], "text": r["text"], "tool": r["tool"],
            "ts": None, "lsn": r["lsn"]}
           for r in tbl.select(
               ["conv_id", "turn_idx", "role", "text", "tool", "lsn"]
           ).to_pylist()}
    assert got == want
    pipe.compact_deltas()
    assert pipe.fsck()["violations"] == []


def test_dlq_reprocess_recovers_quarantined_patch(ray_session,
                                                  tmp_path_factory):
    """A PATCH event from an unknown schema epoch is quarantined, the spec
    catches up, and reprocess applies it with its ORIGINAL lsn — the
    per-column fold arbitrates it against newer applied state exactly like
    the whole-row LWW contract (an old quarantined patch never beats a
    newer applied touch of the same column)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.config import ColumnConfig
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        CDCPipeline,
        DEFAULT_EPOCH_SPECS,
    )

    lake = str(tmp_path_factory.mktemp("dlq_patch") / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)

    def ev(lsn, op, epoch, *, role=None, text=None, ts="1700000000000"):
        return {
            "lsn": lsn, "op": op, "conv_id": "c", "turn_idx": 0,
            "role": role, "text": text, "tool": None,
            "ts_raw": ts, "schema_epoch": epoch,
        }

    batch = pa.Table.from_pylist([
        ev(1, "upsert", 0, role="user", text="base"),
        # epoch-9 patches: quarantined (unknown epoch); one sets text at
        # lsn 2 (will be SUPERSEDED by the applied lsn-3 upsert), one sets
        # role at lsn 5 (still the column's newest setter after recovery)
        ev(2, "patch", 9, text="stale patch", ts=None),
        ev(5, "patch", 9, role="assistant", ts=None),
        ev(3, "upsert", 0, role="user", text="newer"),
    ])
    pipe.apply(ray.data.from_arrow(batch))
    assert pipe.read_dlq().num_rows == 2
    state = {(r["conv_id"], r["turn_idx"]): r
             for r in pipe.final_state_sorted().to_pylist()}
    assert state[("c", 0)]["text"] == "newer"
    assert state[("c", 0)]["role"] == "user"

    specs = dict(DEFAULT_EPOCH_SPECS)
    specs[9] = ColumnConfig("ts_raw", "timestamp", from_format=("%Q",),
                            from_unit="ms")
    stats = pipe.reprocess_dlq(epoch_specs=specs)
    assert stats["events_quarantined"] == 0
    assert pipe.read_dlq().num_rows == 0
    state = {(r["conv_id"], r["turn_idx"]): r
             for r in pipe.final_state_sorted().to_pylist()}
    # lsn-5 patch lands (role), lsn-2 patch loses to the lsn-3 upsert
    assert state[("c", 0)]["role"] == "assistant"
    assert state[("c", 0)]["text"] == "newer"
    assert state[("c", 0)]["lsn"] == 5
    assert pipe.fsck()["violations"] == []
