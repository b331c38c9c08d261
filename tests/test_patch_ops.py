"""Partial-column update (op='patch') semantics.

Contract under test (pipelines/cdc.py fold_patch_runs): per-column LWW
under a delete horizon —

* upsert sets EVERY value column (including explicit NULLs) at its lsn
* patch sets only its non-NULL value columns (NULL = unchanged)
* delete invalidates all column values set at lower lsns
* a key exists iff its max-lsn event is not a delete (a patch above a
  delete resurrects the key with only its own columns)

The fold must be ASSOCIATIVE across arbitrary block splits + the
map-side combiner (patch rows pass through uncombined), because the same
kernel arbitrates the in-batch reduce, delta commits, read folds and
compaction.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    PreMergeCombiner,
    decode_shuffle_encoding,
    keep_last_per_key,
)

_TS = pa.timestamp("ns", tz="UTC")


def _events_table(rows):
    """rows: (op, conv, turn, role, text, tool, ts_ns_or_None, lsn)."""
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
    """Sequential per-event replay (the executable spec): apply events in
    lsn order; returns {(conv, turn): {role, text, tool, ts, lsn}}."""
    state = {}
    for r in sorted(rows, key=lambda r: r[7]):
        op, conv, turn, role, text, tool, ts, lsn = r
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
    live = out.filter(pc.not_equal(out.column("op"), "delete"))
    ts_ns = live.column("ts").cast(pa.timestamp("ns")).cast(pa.int64())
    state = {}
    for i, r in enumerate(live.to_pylist()):
        state[(r["conv_id"], r["turn_idx"])] = {
            "role": r["role"], "text": r["text"], "tool": r["tool"],
            "ts": ts_ns[i].as_py(), "lsn": r["lsn"]}
    return state


def test_fold_patch_runs_semantics():
    rows = [
        # (a,1): newer patch overlays an older full upsert; the upsert's
        # explicit tool=NULL reset survives (patch didn't touch tool)
        ("upsert", "a", 1, "u", "t1", "x", 10, 1),
        ("patch", "a", 1, None, "t2", None, None, 3),
        ("upsert", "a", 1, "v", "t3", None, 20, 2),
        # (a,2): delete then patch → resurrect with only patched columns
        ("upsert", "a", 2, "u", "z1", "y", 30, 1),
        ("delete", "a", 2, None, None, None, None, 5),
        ("patch", "a", 2, "w", None, None, None, 7),
        # (b,1): patch-only key — a sparse upsert
        ("patch", "b", 1, None, "p1", None, None, 2),
        ("patch", "b", 1, "r2", None, None, None, 4),
        # (b,2): ends in delete → gone
        ("upsert", "b", 2, "u", "q", "q", 40, 1),
        ("delete", "b", 2, None, None, None, None, 9),
    ]
    got = _fold_to_state(_events_table(rows))
    assert got == {
        ("a", 1): {"role": "v", "text": "t2", "tool": None, "ts": 20,
                   "lsn": 3},
        ("a", 2): {"role": "w", "text": None, "tool": None, "ts": None,
                   "lsn": 7},
        ("b", 1): {"role": "r2", "text": "p1", "tool": None, "ts": None,
                   "lsn": 4},
    }
    # delta-tier face: the all-patch key keeps op='patch' (must not
    # materialize unknown columns), boundary keys materialize as upserts
    folded = keep_last_per_key(_events_table(rows))
    ops = {(r["conv_id"], r["turn_idx"]): r["op"] for r in folded.to_pylist()}
    assert ops == {("a", 1): "upsert", ("a", 2): "upsert",
                   ("b", 1): "patch", ("b", 2): "delete"}


def _random_events(seed, n, n_convs=5, n_turns=3):
    """Key space deliberately TINY so runs are long and every op pairing
    occurs (DESIGN #25: size fuzz inputs against the fold topology)."""
    rng = np.random.default_rng(seed)
    rows = []
    lsns = rng.permutation(n * 3)[:n]
    for i in range(n):
        conv = f"c{rng.integers(n_convs)}"
        turn = int(rng.integers(n_turns))
        op = ["upsert", "delete", "patch"][rng.choice(3, p=[.45, .15, .4])]
        lsn = int(lsns[i])
        if op == "delete":
            rows.append(("delete", conv, turn, None, None, None, None, lsn))
        elif op == "upsert":
            tool = None if rng.random() < .4 else f"T{rng.integers(4)}"
            rows.append(("upsert", conv, turn, f"r{rng.integers(3)}",
                         f"x{lsn}", tool, int(rng.integers(100)), lsn))
        else:
            # at least one column set; NULL columns mean "unchanged"
            bits = 0
            while not bits:
                bits = int(rng.integers(1, 16))
            rows.append(("patch", conv, turn,
                         f"pr{lsn}" if bits & 1 else None,
                         f"pt{lsn}" if bits & 2 else None,
                         f"pl{lsn}" if bits & 4 else None,
                         int(rng.integers(100)) if bits & 8 else None,
                         lsn))
    # exact replays of a few events (same content, same lsn)
    for j in rng.choice(len(rows), size=max(1, n // 10), replace=False):
        rows.append(rows[int(j)])
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("wire_encode", [False, True])
def test_patch_fold_associative_across_blocks(seed, wire_encode):
    """split → per-block combine → concat → fold == sequential replay,
    for random schedules, splits and replays."""
    rows = _random_events(seed, 120)
    want = scalar_replay(rows)
    tbl = _events_table(rows)
    rng = np.random.default_rng(seed + 1000)
    perm = rng.permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm))
    # random contiguous block split
    n_blocks = int(rng.integers(1, 7))
    cuts = np.sort(rng.choice(tbl.num_rows, size=n_blocks - 1, replace=False)) \
        if n_blocks > 1 else np.array([], dtype=np.int64)
    combiner = PreMergeCombiner(wire_encode=wire_encode)
    parts, lo = [], 0
    for hi in [*cuts.tolist(), tbl.num_rows]:
        block = tbl.slice(lo, hi - lo)
        lo = hi
        if block.num_rows:
            parts.append(decode_shuffle_encoding(combiner(block)))
    merged = pa.concat_tables(parts, promote_options="permissive")
    got = _fold_to_state(merged)
    assert got == want


def test_combiner_forwards_patches_uncombined():
    rows = [
        ("upsert", "a", 1, "u", "t", "x", 1, 1),
        ("upsert", "a", 1, "u2", "t2", "x2", 2, 2),
        ("patch", "a", 1, None, "p3", None, None, 3),
        ("patch", "a", 1, "p4", None, None, None, 4),
    ]
    out = PreMergeCombiner()(_events_table(rows))
    ops = sorted(out.column("op").to_pylist())
    # two patches forwarded verbatim + one combined upsert winner
    assert ops == ["patch", "patch", "upsert"]
    assert out.filter(pc.equal(out.column("op"), "upsert")) \
        .column("lsn").to_pylist() == [2]


def test_patch_null_tsraw_is_unset_not_quarantined():
    from embulk_filter_timestamp_format_ray.pipelines.cdc import NormalizeStage

    batch = pa.table({
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "op": pa.array(["upsert", "patch", "patch"]),
        "conv_id": pa.array(["c", "c", "c"]),
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": pa.array(["user", None, None]),
        "text": pa.array(["t", "p", "q"]),
        "tool": pa.array([None, None, None], pa.string()),
        # upsert parses; patch 1 leaves ts unset (NULL raw); patch 2 is
        # genuinely unparseable → quarantined
        "ts_raw": pa.array(["1700000000000", None, "<garbled>"]),
        "schema_epoch": pa.array([0, 0, 0], pa.int64()),
    })
    out = NormalizeStage(dlq=True)(batch)
    reasons = dict(zip(out.column("lsn").to_pylist(),
                       out.column("dlq_reason").to_pylist()))
    assert reasons == {1: None, 2: None, 3: "unparseable_ts"}
    # and without dlq: the unset patch ts is NULL, nothing dropped
    out2 = NormalizeStage()(batch)
    assert out2.num_rows == 3
    assert out2.column("ts").null_count == 2


def test_changegen_patch_determinism():
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    a = expected_event_table(4000, seed=7, patch_permille=200)
    b = expected_event_table(4000, seed=7, patch_permille=200)
    assert a.equals(b)
    ops = a.column("op").to_pylist()
    n_patch = ops.count("patch")
    assert 400 < n_patch < 1200  # ~20% of non-delete traffic
    patches = a.filter(pc.equal(a.column("op"), "patch"))
    # every patch sets at least one column
    any_set = pc.or_(
        pc.or_(pc.is_valid(patches.column("role")),
               pc.is_valid(patches.column("text"))),
        pc.or_(pc.is_valid(patches.column("tool")),
               pc.is_valid(patches.column("ts_raw"))))
    assert pc.all(any_set).as_py() is True
    # patch_permille=0 (default) is byte-identical to the pre-patch stream
    c = expected_event_table(4000, seed=7)
    assert "patch" not in set(c.column("op").to_pylist())


def test_patch_e2e_base_delta_compact_equal(ray_session, tmp_path_factory):
    """Full-pipeline parity: base-merge path and delta+compact path both
    equal the sequential replay, with replay/reorder noise on."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        ROLE_RENAMES_EPOCH2,
        change_events,
        expected_event_table,
    )

    n = 6000
    ev = expected_event_table(n, seed=11, patch_permille=150)
    ren = {v: k for k, v in ROLE_RENAMES_EPOCH2.items()}
    rows = []
    for r in ev.to_pylist():
        role = ren.get(r["role"], r["role"]) if r["role"] is not None else None
        rows.append((r["op"], r["conv_id"], r["turn_idx"], role, r["text"],
                     r["tool"], None, r["lsn"]))
    want = scalar_replay(rows)

    def lake_state(pipe):
        tbl = pipe.final_state_sorted()
        return {(r["conv_id"], r["turn_idx"]):
                {"role": r["role"], "text": r["text"], "tool": r["tool"],
                 "ts": None, "lsn": r["lsn"]}
                for r in tbl.select(
                    ["conv_id", "turn_idx", "role", "text", "tool", "lsn"]
                ).to_pylist()}

    base = tmp_path_factory.mktemp("patch_lakes")
    p1 = CDCPipeline(str(base / "base"), num_partitions=8)
    p1.apply(change_events(n, seed=11, patch_permille=150, parallelism=4))
    assert lake_state(p1) == want

    p2 = CDCPipeline(str(base / "delta"), num_partitions=8)
    lsn = ev.column("lsn")
    cut = pa.scalar(n // 2, pa.int64())
    p2.apply(ray.data.from_arrow(ev.filter(pc.less(lsn, cut))))
    p2.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(lsn, cut))))
    assert lake_state(p2) == want  # merge-on-read fold
    p2.compact_deltas()
    assert lake_state(p2) == want  # compacted base
    # idempotent replay of the tail
    p2.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(lsn, cut))))
    assert lake_state(p2) == want
    assert p2.fsck()["violations"] == []


def test_patch_fold_hypothesis_property():
    """Hypothesis property (shrinking complements the seeded fuzz): any
    event schedule over a 2-conv × 2-turn key space, split at any point
    into two combined blocks, folds to the sequential replay.  Key space
    deliberately minimal so delete/patch/upsert interleavings collide
    maximally (DESIGN #25)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ev = st.tuples(
        st.sampled_from(["upsert", "delete", "patch"]),
        st.sampled_from(["a", "b"]),
        st.integers(0, 1),
        st.one_of(st.none(), st.sampled_from(["r1", "r2"])),
        st.one_of(st.none(), st.sampled_from(["t1", "t2"])),
        st.one_of(st.none(), st.sampled_from(["x"])),
        st.one_of(st.none(), st.integers(0, 9)),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=24), st.integers(0, 23),
           st.randoms())
    def prop(events, cut, rnd):
        rows = []
        for i, (op, conv, turn, role, text, tool, ts) in enumerate(events):
            if op == "delete":
                rows.append(("delete", conv, turn, None, None, None, None, i))
            elif op == "upsert":
                rows.append(("upsert", conv, turn, role or "r0", text or "t0",
                             tool, ts if ts is not None else 0, i))
            else:
                if role is None and text is None and tool is None \
                        and ts is None:
                    text = "t0"  # a patch must set something
                rows.append(("patch", conv, turn, role, text, tool, ts, i))
        want = scalar_replay(rows)
        tbl = _events_table(rows)
        order = list(range(tbl.num_rows))
        rnd.shuffle(order)
        tbl = tbl.take(pa.array(order))
        cut = min(cut, tbl.num_rows)
        combiner = PreMergeCombiner()
        parts = [p for p in (tbl.slice(0, cut), tbl.slice(cut))
                 if p.num_rows]
        merged = pa.concat_tables([combiner(p) for p in parts],
                                  promote_options="permissive")
        assert _fold_to_state(merged) == want

    prop()
