"""Merge-on-read DELTA commits (CDCPipeline.apply_delta / compact_deltas).

Contract under test (DESIGN: delta tier):

* delta commits are durable, exactly-once, watermark-ratcheting — replays
  prune exactly like base merges — but write only the micro-batch's per-key
  winners (cost ∝ micro-batch, not ∝ lake state)
* every read path folds base+deltas transparently (read_lake,
  final_state_sorted, read_conversation, views, lake_changes, time travel)
* compact_deltas folds the backlog into base files without changing state
  or watermarks; a later base-merge apply() does the same implicitly
* delta and base commits compose in any order and always converge to the
  sequential oracle
"""

import os

import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf
from tests.test_cdc import (
    N_EVENTS,
    _assert_matches_oracle,
    _lake_as_dict,
    sequential_oracle,
)


@pytest.fixture(scope="module")
def oracle():
    return sequential_oracle(N_EVENTS)


def _delta_backlog(manifest) -> "tuple[int, int]":
    files = sum(len(p.get("deltas", [])) for p in manifest["partitions"].values())
    rows = sum(int(d.get("rows", 0)) for p in manifest["partitions"].values()
               for d in p.get("deltas", []))
    return files, rows


def test_delta_commits_match_oracle(ray_session, tmp_path_factory, oracle):
    """base apply → three delta micro-batches: reads fold to oracle state,
    base files untouched, backlog visible in the manifest."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2000)))
    base_paths = {p: m["path"]
                  for p, m in mf.read_manifest(lake)["partitions"].items()}
    for lo, n in ((2000, 800), (2800, 700), (3500, None)):
        chunk = full.slice(lo, n) if n else full.slice(lo)
        stats = pipe.apply_delta(ray.data.from_arrow(chunk))
        assert stats["events_applied"] > 0
    m = mf.read_manifest(lake)
    # delta commits never rewrite base files
    for p, meta in m["partitions"].items():
        assert meta.get("path") == base_paths.get(p)
    files, rows = _delta_backlog(m)
    assert files > 0 and rows > 0
    assert mf.has_deltas(m)
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_delta_replay_idempotent(ray_session, tmp_path_factory, oracle):
    """crash-restart onto the delta path: an overlapping re-delivery prunes
    at the watermark (pure-replay groups commit no file at all)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_replay"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2500)))
    files_after_first, _ = _delta_backlog(mf.read_manifest(lake))
    # full re-delivery: every event is at/below some partition watermark
    stats = pipe.apply_delta(ray.data.from_arrow(full))
    assert stats["events_applied"] == 0
    files_after_replay, _ = _delta_backlog(mf.read_manifest(lake))
    assert files_after_replay == files_after_first
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_compact_deltas_preserves_state(ray_session, tmp_path_factory, oracle):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_compact"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2000)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2000, 1000)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(3000)))
    m_before = mf.read_manifest(lake)
    marks_before = {p: meta["last_applied_lsn"]
                    for p, meta in m_before["partitions"].items()}
    res = pipe.compact_deltas()
    assert res["partitions_compacted"] > 0
    assert res["delta_files_folded"] >= res["partitions_compacted"]
    m_after = mf.read_manifest(lake)
    assert not mf.has_deltas(m_after)
    assert m_after["version"] == m_before["version"] + 1
    # compaction moves no watermarks (deltas were already committed state)
    assert {p: meta["last_applied_lsn"]
            for p, meta in m_after["partitions"].items()} == marks_before
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # idempotent: nothing left to fold
    res2 = pipe.compact_deltas()
    assert res2["partitions_compacted"] == 0
    # GC keeps every live file
    for p in mf.data_files(mf.read_manifest(lake)):
        assert os.path.exists(os.path.join(lake, p))


def test_base_merge_folds_pending_deltas(ray_session, tmp_path_factory, oracle):
    """a base-merge apply() on a backlogged lake folds the pending deltas
    into the new base and clears the delta lists — no separate compaction
    needed on an actively-written partition."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_then_base"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1500)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(1500, 1500)))
    assert mf.has_deltas(mf.read_manifest(lake))
    pipe.apply(ray.data.from_arrow(full.slice(3000)))
    m = mf.read_manifest(lake)
    # every partition the base merge touched cleared its backlog; the
    # sf-sized stream touches all 16 partitions in a 1000-event chunk
    assert not mf.has_deltas(m)
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_delta_point_lookup_folds(ray_session, tmp_path_factory, oracle):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_point"))
    pipe = CDCPipeline(lake, num_partitions=8, partition_mode="conv")
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2000)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2000)))
    conv_ids = sorted({k[0] for k in oracle})[:5]
    for cid in conv_ids:
        got = pipe.read_conversation(cid)
        exp = sorted((k[1], v) for k, v in oracle.items() if k[0] == cid)
        assert got.num_rows == len(exp)
        assert got.column("turn_idx").to_pylist() == [t for t, _ in exp]
        assert got.column("text").to_pylist() == [v["text"] for _, v in exp]


def test_table_stats_reports_delta_backlog(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_stats"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(1500)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1000)))
    s0 = pipe.table_stats()
    assert s0["delta_files"] == 0 and s0["delta_rows"] == 0
    pipe.apply_delta(ray.data.from_arrow(full.slice(1000)))
    s1 = pipe.table_stats()
    assert s1["delta_files"] > 0 and s1["delta_rows"] > 0
    pipe.compact_deltas()
    s2 = pipe.table_stats()
    assert s2["delta_files"] == 0 and s2["delta_rows"] == 0


def test_lake_changes_sees_delta_commit(ray_session, tmp_path_factory):
    """change-data-feed across a delta commit: the diff folds each side's
    base+deltas, so a delta-only version step still yields its changes."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_cdf"))
    pipe = CDCPipeline(lake, num_partitions=8, time_travel_retain=8)
    full = expected_event_table(2000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1200)))      # v1
    pipe.apply_delta(ray.data.from_arrow(full.slice(1200)))   # v2 (delta)
    changes = pa.concat_tables(
        [b for b in pipe.lake_changes(1, 2).iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    assert changes.num_rows > 0
    kinds = set(changes.column("change_type").to_pylist())
    assert kinds <= {"insert", "update", "delete"}
    assert "insert" in kinds
    # diff keys must be exactly the keys whose live state changed v1→v2
    ds1 = pipe.read_lake_at(1)
    ds2 = pipe.read_lake_at(2)

    def state(ds):
        t = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")],
            promote_options="permissive")
        return {(r["conv_id"], r["turn_idx"]): r["lsn"] for r in
                t.select(["conv_id", "turn_idx", "lsn"]).to_pylist()}

    s1, s2 = state(ds1), state(ds2)
    expected_changed = {k for k in set(s1) | set(s2) if s1.get(k) != s2.get(k)}
    got_changed = {(r["conv_id"], r["turn_idx"])
                   for r in changes.to_pylist()}
    assert got_changed == expected_changed


def test_actor_exchange_folds_pending_deltas(ray_session, tmp_path_factory,
                                             oracle):
    """the actor-exchange base merge must fold a partition's pending delta
    files before rewriting its state (its commit clears the delta list, so
    skipping the fold would silently drop committed rows)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_actorx"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1500)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(1500, 1500)))
    assert mf.has_deltas(mf.read_manifest(lake))
    pipe.apply(ray.data.from_arrow(full.slice(3000)), exchange="actor")
    assert not mf.has_deltas(mf.read_manifest(lake))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_repartition_folds_pending_deltas(ray_session, tmp_path_factory,
                                          oracle):
    """repartition_lake reads through the folding scan, so a backlogged
    lake re-shards to the same live state (and the new manifest's
    partitions legitimately carry no delta lists)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_repart"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2500)))
    assert mf.has_deltas(mf.read_manifest(lake))
    pipe.repartition_lake(32)
    m = mf.read_manifest(lake)
    assert not mf.has_deltas(m)
    assert m["num_partitions"] == 32
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_from_lake_adopts_committed_layout(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_from"))
    pipe = CDCPipeline(lake, num_partitions=4, partition_mode="conv",
                       salt_keys=frozenset({"conv-0001"}), salt_factor=3)
    pipe.apply(ray.data.from_arrow(expected_event_table(500)))
    opened = CDCPipeline.from_lake(lake)
    assert opened.num_partitions == 4
    assert opened.partition_mode == "conv"
    assert opened.salt_keys == frozenset({"conv-0001"})
    assert opened.salt_factor == 3
    opened.check_manifest_compat(mf.read_manifest(lake))  # no raise
    with pytest.raises(ValueError):
        CDCPipeline.from_lake(str(tmp_path_factory.mktemp("lake_absent")))


def test_view_refresh_sees_delta_commit(ray_session, tmp_path_factory):
    """IncrementalView staleness keys on base+delta signature: a delta-only
    commit must re-aggregate the touched partitions and fold their deltas."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.views import (
        IncrementalView,
    )

    lake = str(tmp_path_factory.mktemp("lake_delta_view"))
    view_dir = str(tmp_path_factory.mktemp("view_delta"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(2000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1200)))
    view = IncrementalView(lake, view_dir)
    view.refresh()
    pipe.apply_delta(ray.data.from_arrow(full.slice(1200)))
    r = view.refresh()
    assert r["recomputed"] > 0  # delta commit marked partitions stale
    got = pa.concat_tables(
        [b for b in view.read().iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    # oracle: fold the live lake directly
    live = pipe.final_state_sorted()
    agg = live.select(["conv_id", "lsn"]).group_by(["conv_id"]).aggregate(
        [("lsn", "count"), ("lsn", "max")]).rename_columns(
        ["conv_id", "n_turns", "max_lsn"])
    exp = {r["conv_id"]: (r["n_turns"], r["max_lsn"])
           for r in agg.to_pylist()}
    assert {r["conv_id"]: (r["n_turns"], r["max_lsn"])
            for r in got.to_pylist()} == exp
    # second refresh with no new commits: everything cached
    r2 = view.refresh()
    assert r2["recomputed"] == 0


def test_read_lake_column_pruning(ray_session, tmp_path_factory):
    """read_lake(columns=...) returns exactly the requested columns on both
    the plain-file path and the merge-on-read fold path (where the fold
    internally needs the merge key + lsn and must drop them again)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_prune"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(1200)
    pipe.apply(ray.data.from_arrow(full.slice(0, 800)))

    def cols_and_rows(ds):
        t = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")],
            promote_options="permissive")
        return t.column_names, t.num_rows

    all_cols, n_all = cols_and_rows(pipe.read_lake())
    names, n = cols_and_rows(pipe.read_lake(columns=["conv_id", "text"]))
    assert names == ["conv_id", "text"] and n == n_all
    # fold path: pending deltas force the per-partition fold
    pipe.apply_delta(ray.data.from_arrow(full.slice(800)))
    names, n2 = cols_and_rows(pipe.read_lake(columns=["conv_id", "text"]))
    assert names == ["conv_id", "text"]
    full_names, n_full = cols_and_rows(pipe.read_lake())
    assert n2 == n_full and full_names == list(
        pipe.read_lake().schema().names)
    # requesting the key columns themselves round-trips unchanged
    names, _ = cols_and_rows(
        pipe.read_lake(columns=["conv_id", "turn_idx", "lsn"]))
    assert names == ["conv_id", "turn_idx", "lsn"]
    with pytest.raises(ValueError):
        pipe.read_lake(columns=["nope"])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_op_schedule_converges(ray_session, tmp_path_factory, oracle,
                                      seed):
    """composition fuzz: a seeded random schedule of base applies, delta
    commits, compactions, view-of-state reads and a repartition over random
    chunk boundaries (with overlapping re-deliveries) must converge to the
    sequential oracle — the delta tier's 'composes in any order' claim."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(seed)
    lake = str(tmp_path_factory.mktemp(f"lake_fuzz_{seed}"))
    pipe = CDCPipeline(lake, num_partitions=8,
                       auto_compact_deltas=(4 if seed % 2 else None))
    full = expected_event_table(N_EVENTS)
    # random chunk boundaries covering [0, N); some chunks re-deliver an
    # overlapping prefix (at-least-once shipper)
    cuts = sorted(rng.choice(np.arange(200, N_EVENTS - 200), size=5,
                             replace=False).tolist())
    bounds = [0, *cuts, N_EVENTS]
    chunks = []
    for lo, hi in zip(bounds, bounds[1:]):
        overlap = int(rng.integers(0, lo // 2 + 1))
        chunks.append(full.slice(lo - overlap, hi - (lo - overlap)))
    for i, chunk in enumerate(chunks):
        op = rng.choice(["base", "delta", "delta"])  # delta-leaning tail
        if op == "base":
            pipe.apply(ray.data.from_arrow(chunk))
        else:
            pipe.apply_delta(ray.data.from_arrow(chunk))
        if rng.random() < 0.3:
            pipe.compact_deltas()
        if i == len(chunks) // 2 and seed % 2 == 0:
            pipe.repartition_lake(16 if seed == 0 else 4)
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_actor_exchange_delta_commits(ray_session, tmp_path_factory, oracle):
    """apply_delta(exchange="actor"): delta files land through the raw-actor
    push exchange (no sort shuffle, no base rewrite) with the same manifest
    bookkeeping — state converges to the oracle, replays prune, compaction
    folds."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_actor_delta"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1500)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(1500, 1500)),
                     exchange="actor")
    m = mf.read_manifest(lake)
    assert mf.has_deltas(m)
    # replay via the actor path is a no-op (watermark prune in the actor)
    stats = pipe.apply_delta(ray.data.from_arrow(full.slice(0, 3000)),
                             exchange="actor")
    assert stats["events_applied"] == 0
    # mixed-exchange tail: dataset-exchange delta on top
    pipe.apply_delta(ray.data.from_arrow(full.slice(3000)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    pipe.compact_deltas()
    assert not mf.has_deltas(mf.read_manifest(lake))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_fold_algebra_random_streams():
    """Property: fold(base-merge(prefix), delta-files(rest chunks)) equals
    the single-shot merge for random streams with replays and deletes —
    the algebra every merge-on-read read path rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        fold_partition_state,
        keep_last_per_key,
        merge_partition_table,
    )

    ts0 = pa.array([0], pa.timestamp("ns", tz="UTC"))

    def mk(events):
        n = len(events)
        return pa.table({
            "lsn": pa.array([e[0] for e in events], pa.int64()),
            "op": pa.array([e[1] for e in events]),
            "conv_id": pa.array([e[2] for e in events]),
            "turn_idx": pa.array([e[3] for e in events], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"t{e[0]}" for e in events]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.concat_arrays([ts0] * n) if n else ts0.slice(0, 0),
        })

    LAKE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]

    event = st.tuples(
        st.integers(min_value=0, max_value=40),           # lsn
        st.sampled_from(["upsert", "delete"]),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=2),
    )

    @given(events=st.lists(event, min_size=1, max_size=24),
           cut1=st.integers(min_value=0, max_value=24),
           cut2=st.integers(min_value=0, max_value=24))
    @settings(max_examples=80, deadline=None)
    def check(events, cut1, cut2):
        seen = {}
        for e in events:
            seen.setdefault(e[0], e)
        events = [seen[k] for k in sorted(seen)]
        cut1, cut2 = sorted((min(cut1, len(events)), min(cut2, len(events))))
        one_shot, _, _ = merge_partition_table(mk(events), None, -1)
        # base merge of the prefix, then two DELTA files (per-key winners
        # with op preserved — exactly what write_delta_file persists)
        base, wm, _ = merge_partition_table(mk(events[:cut1]), None, -1)
        deltas = []
        lo = cut1
        for hi in (cut2, len(events)):
            chunk = mk(events[lo:hi])
            fresh = chunk.filter(pa.compute.greater(chunk.column("lsn"), wm))
            if fresh.num_rows:
                deltas.append(
                    keep_last_per_key(fresh).select(["op", *LAKE_COLS]))
                wm = max(wm, pa.compute.max(chunk.column("lsn")).as_py())
            lo = hi
        folded = fold_partition_state(base if base.num_rows else None, deltas)
        key = lambda t: sorted(  # noqa: E731
            (r["conv_id"], r["turn_idx"], r["lsn"], r["text"])
            for r in t.to_pylist())
        assert key(one_shot) == key(folded)

    check()


def test_delta_point_lookup_salted_conv_mode(ray_session, tmp_path_factory,
                                             oracle):
    """salted conv-mode + pending deltas: candidate-pid point lookups fold
    base+delta across every salt sub-partition."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_delta_salt"))
    hot = sorted({k[0] for k in oracle})[0]
    pipe = CDCPipeline(lake, num_partitions=8, partition_mode="conv",
                       salt_keys=frozenset({hot}), salt_factor=4)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2000)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2000)))
    assert mf.has_deltas(mf.read_manifest(lake))
    for cid in (hot, sorted({k[0] for k in oracle})[3]):
        got = pipe.read_conversation(cid)
        exp = sorted((k[1], v) for k, v in oracle.items() if k[0] == cid)
        assert got.num_rows == len(exp)
        assert got.column("turn_idx").to_pylist() == [t for t, _ in exp]
        assert got.column("lsn").to_pylist() == [v["lsn"] for _, v in exp]


def test_delta_commits_with_dlq_quarantine(ray_session, tmp_path_factory):
    """delta commits quarantine bad events exactly like base merges: the
    DLQ rides the same shuffle (reserved pid), the lake folds clean, and a
    later reprocess under corrected specs recovers nothing it shouldn't."""
    import ray.data

    from tests.test_cdc import _events_with_bad_rows

    lake = str(tmp_path_factory.mktemp("lake_delta_dlq"))
    events, n_clean = _events_with_bad_rows()
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    # base-commit the first half, delta-commit the rest (incl. all poison)
    pipe.apply(ray.data.from_arrow(events.slice(0, n_clean // 2)))
    stats = pipe.apply_delta(ray.data.from_arrow(events.slice(n_clean // 2)))
    assert stats["events_quarantined"] == 4
    assert mf.has_deltas(mf.read_manifest(lake))
    assert pipe.read_dlq().num_rows == 4
    _assert_matches_oracle(_lake_as_dict(pipe),
                           sequential_oracle(n_clean))
    # compaction folds the clean backlog and leaves the quarantine intact
    pipe.compact_deltas()
    assert pipe.read_dlq().num_rows == 4
    _assert_matches_oracle(_lake_as_dict(pipe),
                           sequential_oracle(n_clean))


@pytest.mark.parametrize("seed", [10, 11])
def test_random_schedule_with_sync_mirror(ray_session, tmp_path_factory,
                                          oracle, seed):
    """composition fuzz incl. the sync consumer: random base/delta/compact
    schedule with a sync after every step — at the end BOTH the lake fold
    and the distributed sync-mirror fold equal the sequential oracle."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(seed)
    lake = str(tmp_path_factory.mktemp(f"lake_fuzz_sync_{seed}"))
    out = str(tmp_path_factory.mktemp(f"sync_fuzz_{seed}"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(N_EVENTS)
    cuts = sorted(rng.choice(np.arange(200, N_EVENTS - 200), size=4,
                             replace=False).tolist())
    bounds = [0, *cuts, N_EVENTS]
    for lo, hi in zip(bounds, bounds[1:]):
        overlap = int(rng.integers(0, lo // 2 + 1))
        chunk = full.slice(lo - overlap, hi - (lo - overlap))
        if rng.random() < 0.4:
            pipe.apply(ray.data.from_arrow(chunk))
        else:
            pipe.apply_delta(ray.data.from_arrow(chunk))
        if rng.random() < 0.3:
            pipe.compact_deltas()
        pipe.sync_changes(out)
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    folded = pa.concat_tables(
        [b for b in CDCPipeline.read_sync_mirror(out)
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    got = {}
    for r in folded.to_pylist():
        key = (r["conv_id"], r["turn_idx"])
        assert key not in got
        ts = r["ts"]
        got[key] = {"role": r["role"], "text": r["text"], "tool": r["tool"],
                    "ts_ns": int(ts.timestamp() * 1e9) if ts else None,
                    "lsn": r["lsn"]}
    _assert_matches_oracle(got, oracle)


def test_fsck_healthy_and_corrupted(ray_session, tmp_path_factory):
    """fsck passes a healthy delta-backlogged lake and pinpoints each
    corruption tier on the RAW files: mis-routed rows, in-file duplicate
    keys, future lsns hiding behind a delete tombstone, and (warning tier)
    an unsorted file."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_fsck"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2500)))
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []
    assert rep["rows_checked"] > 0

    # corrupt 1: swap two partitions' base files (mis-routing)
    m = mf.read_manifest(lake)
    pids = [p for p, meta in m["partitions"].items() if meta.get("path")][:2]
    a = os.path.join(lake, m["partitions"][pids[0]]["path"])
    b = os.path.join(lake, m["partitions"][pids[1]]["path"])
    ta, tb = pq_.read_table(a), pq_.read_table(b)
    pq_.write_table(tb, a)
    pq_.write_table(ta, b)
    bad = pipe.fsck()
    bad_pids = {v["pid"] for v in bad["violations"]}
    assert {int(pids[0]), int(pids[1])} <= bad_pids
    assert any("routed to another partition" in v["problems"]
               for v in bad["violations"])
    pq_.write_table(ta, a)  # restore
    pq_.write_table(tb, b)

    # corrupt 2: duplicate a merge key INSIDE the base file (a broken
    # merge would double keys — the fold silently repairs this, so the
    # check must look at the raw file)
    dup = pa.concat_tables([ta, ta.slice(0, 1)])
    pq_.write_table(dup, a)
    bad = pipe.fsck()
    assert any("duplicate merge key" in v["problems"]
               for v in bad["violations"])
    pq_.write_table(ta, a)

    # corrupt 3: a future-lsn DELETE tombstone in a delta file — the fold
    # filters tombstones out of live state, so only a raw-file watermark
    # check can see it
    dpid, dmeta = next((p, meta) for p, meta in m["partitions"].items()
                       if meta.get("deltas"))
    dpath = os.path.join(lake, dmeta["deltas"][0]["path"])
    td = pq_.read_table(dpath)
    wm = int(dmeta["last_applied_lsn"])
    ghost = td.slice(0, 1).set_column(
        td.schema.get_field_index("lsn"), "lsn",
        pa.array([wm + 1000], pa.int64())).set_column(
        td.schema.get_field_index("op"), "op", pa.array(["delete"]))
    pq_.write_table(pa.concat_tables([td, ghost]), dpath)
    bad = pipe.fsck()
    assert any("exceeds committed watermark" in v["problems"]
               for v in bad["violations"])
    pq_.write_table(td, dpath)

    # corrupt 4 (warning tier): reverse a delta file's row order — reads
    # stay correct, so this must NOT be a violation
    rev = td.take(pc_.sort_indices(
        td, sort_keys=[("conv_id", "descending")]))
    if td.num_rows > 1:
        pq_.write_table(rev, dpath)
        warned = pipe.fsck()
        assert warned["violations"] == []
        assert any("not sorted by merge key" in w["problems"]
                   for w in warned["warnings"])
        pq_.write_table(td, dpath)

    # restored lake is clean again
    final = pipe.fsck()
    assert final["violations"] == [] and final["warnings"] == []


def test_fsck_cli_refuses_missing_lake(tmp_path_factory):
    """--fsck on a path with no committed manifest exits 2 instead of
    reporting an empty (vacuously healthy) lake."""
    import subprocess
    import sys

    missing = str(tmp_path_factory.mktemp("no_lake")) + "/typo"
    r = subprocess.run(
        [sys.executable, "scripts/run_cdc.py", "--lake", missing,
         "--events", "0", "--fsck"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 2, r.stdout + r.stderr
    assert "no committed lake" in r.stdout
