"""Distributed DELETE WHERE (CDCPipeline.delete_where) — the retention /
TTL tier on the lake.

Contract under test:

* predicate-selected live rows are removed as ONE exactly-once commit;
  survivors are byte-identical; watermarks unchanged
* rewritten partitions' delta backlogs fold and clear (a delete_where is
  also a compaction)
* NO tombstones: a later (above-watermark) event re-inserts a deleted
  key; replays at or below the watermark stay pruned
* the change feed reports the removed rows as deletes; time travel to the
  pre-delete version works and rollback restores it
* a malformed predicate mask raises and nothing commits
* the --delete-where CLI spec surface (Constraint.matches) selects rows
  by value with NULL-never-matches semantics
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    parse_constraint,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def _expired():
    # built in a factory so cloudpickle ships the Constraint by value
    c = parse_constraint("turn_idx:between:30,")
    return c.matches


def _lake(tmp_path, n=1200, partitions=4, delta_tail=False):
    import ray.data

    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=partitions)
    if delta_tail:
        pipe.apply(ray.data.from_arrow(ev.slice(0, n // 2)))
        pipe.apply_delta(ray.data.from_arrow(ev.slice(n // 2)))
    else:
        pipe.apply(ray.data.from_arrow(ev))
    return pipe


def test_delete_where_removes_and_keeps_survivors_identical(
        ray_session, tmp_path):
    pipe = _lake(tmp_path)
    before = pipe.final_state_sorted()
    m0 = mf.read_manifest(pipe.lake_dir)
    wm0 = {p: m["last_applied_lsn"] for p, m in m0["partitions"].items()}

    res = pipe.delete_where(_expired())
    keep = pc.less(before.column("turn_idx"), 30)
    expected = before.filter(keep)
    assert res["rows_deleted"] == before.num_rows - expected.num_rows
    assert res["rows_deleted"] > 0

    after = pipe.final_state_sorted()
    assert after.equals(expected)  # survivors byte-identical
    m1 = mf.read_manifest(pipe.lake_dir)
    assert m1["version"] == m0["version"] + 1
    assert {p: m["last_applied_lsn"]
            for p, m in m1["partitions"].items()} == wm0
    assert pipe.fsck()["violations"] == []


def test_delete_where_folds_delta_backlog(ray_session, tmp_path):
    pipe = _lake(tmp_path, delta_tail=True)
    m0 = mf.read_manifest(pipe.lake_dir)
    assert any(p.get("deltas") for p in m0["partitions"].values())
    pipe.delete_where(_expired())
    m1 = mf.read_manifest(pipe.lake_dir)
    assert not any(p.get("deltas") for p in m1["partitions"].values())


def test_delete_then_reinsert_and_replay_prune(ray_session, tmp_path):
    import ray.data

    n = 1200
    pipe = _lake(tmp_path, n=n)
    pipe.delete_where(_expired())

    # a REPLAY (lsn at/below watermark) of a deleted row stays pruned
    ev = expected_event_table(n)
    expired_rows = ev.filter(pc.and_(
        pc.greater_equal(ev.column("turn_idx"), 30),
        pc.equal(ev.column("op"), "upsert")))
    assert expired_rows.num_rows > 0
    pipe.apply(ray.data.from_arrow(expired_rows))
    state = pipe.final_state_sorted()
    assert pc.max(state.column("turn_idx")).as_py() < 30

    # a NEW event above the watermark legitimately re-inserts the key
    one = expired_rows.slice(0, 1)
    i = one.schema.get_field_index("lsn")
    fresh = one.set_column(i, "lsn", pa.array([n + 10], pa.int64()))
    pipe.apply(ray.data.from_arrow(fresh))
    state = pipe.final_state_sorted()
    hit = state.filter(pc.and_(
        pc.equal(state.column("conv_id"), one.column("conv_id")[0]),
        pc.equal(state.column("turn_idx"), one.column("turn_idx")[0])))
    assert hit.num_rows == 1
    assert hit.column("lsn")[0].as_py() == n + 10


def test_change_feed_and_time_travel_and_rollback(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    before = pipe.final_state_sorted()
    v0 = mf.read_manifest(pipe.lake_dir)["version"]
    res = pipe.delete_where(_expired())

    feed = pa.concat_tables(
        [b for b in pipe.lake_changes(v0, res["version"])
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    assert feed.num_rows == res["rows_deleted"]
    assert set(pc.unique(feed.column("change_type")).to_pylist()) == {
        "delete"}

    old = pa.concat_tables(
        [b for b in pipe.read_lake_at(v0).iter_batches(
            batch_format="pyarrow")], promote_options="permissive")
    assert old.num_rows == before.num_rows  # pre-delete version readable

    pipe.rollback(v0)
    assert pipe.final_state_sorted().equals(before)


def test_bad_predicate_mask_commits_nothing(ray_session, tmp_path):
    pipe = _lake(tmp_path, n=400, partitions=2)
    v0 = mf.read_manifest(pipe.lake_dir)["version"]
    with pytest.raises(Exception, match="boolean mask"):
        pipe.delete_where(lambda t: np.zeros(3, dtype=bool))
    with pytest.raises(Exception, match="boolean mask"):
        pipe.delete_where(lambda t: np.zeros(t.num_rows, dtype=np.int64))
    assert mf.read_manifest(pipe.lake_dir)["version"] == v0


def test_matches_spec_surface():
    t = pa.table({
        "role": ["tool", "user", None],
        "ts": pa.array([0, 2 * 10**18, None], pa.timestamp("ns", tz="UTC")),
    })
    assert parse_constraint("role:in:tool").matches(t).tolist() == [
        True, False, False]          # NULL never matches
    assert parse_constraint("ts:between:,2024-01-01").matches(t).tolist() \
        == [True, False, False]      # retention cutoff shape
    assert parse_constraint("role:not_null").matches(t).tolist() == [
        True, True, False]
    # a column the table lacks matches nothing
    assert parse_constraint("lang:in:en").matches(t).tolist() == [
        False, False, False]


# ---------------------------------------------------------------- dv mode
# delete_where(mode='dv') writes per-partition DELETION VECTORS — small
# (conv_id, turn_idx, lsn) key files the folds subtract at read time —
# instead of rewriting survivors (the Delta deletion-vector cost model:
# commit cost ∝ deleted rows, not partition size).  Final state must be
# identical to rewrite mode; the next base merge / compaction folds the
# vectors away.


def test_dv_mode_state_parity_with_rewrite(ray_session, tmp_path):
    pipe_rw = _lake(tmp_path / "rw", delta_tail=True)
    pipe_dv = _lake(tmp_path / "dv", delta_tail=True)
    expected = pipe_rw.final_state_sorted()

    res_rw = pipe_rw.delete_where(_expired())
    res_dv = pipe_dv.delete_where(_expired(), mode="dv")
    assert res_dv["rows_deleted"] == res_rw["rows_deleted"] > 0

    # identical live state across modes, including with a pending delta
    # backlog in the fold
    assert pipe_dv.final_state_sorted().equals(pipe_rw.final_state_sorted())

    m = mf.read_manifest(pipe_dv.lake_dir)
    # dv commit leaves base files AND the delta backlog untouched — only
    # the dvs lists grow (merge-on-read, not a compaction)
    assert any(p.get("dvs") for p in m["partitions"].values())
    assert any(p.get("deltas") for p in m["partitions"].values())
    dv_rows = sum(d["rows"] for p in m["partitions"].values()
                  for d in p.get("dvs", []))
    assert dv_rows == res_dv["rows_deleted"]
    assert pipe_dv.fsck()["violations"] == []

    st = pipe_dv.table_stats()
    assert st["dv_files"] == res_dv["partitions_deleted"]
    assert st["dv_rows"] == res_dv["rows_deleted"]
    # expected == pre-delete state, sanity that something was live before
    assert expected.num_rows == res_dv["rows_deleted"] + \
        pipe_dv.final_state_sorted().num_rows


def test_dv_watermarks_and_bases_untouched(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    m0 = mf.read_manifest(pipe.lake_dir)
    res = pipe.delete_where(_expired(), mode="dv")
    m1 = mf.read_manifest(pipe.lake_dir)
    assert m1["version"] == m0["version"] + 1
    for pid, p0 in m0["partitions"].items():
        p1 = m1["partitions"][pid]
        assert p1["last_applied_lsn"] == p0["last_applied_lsn"]
        assert p1.get("path") == p0.get("path")  # base file untouched
    assert res["partitions_deleted"] > 0


def test_dv_compaction_folds_vectors_away(ray_session, tmp_path):
    pipe = _lake(tmp_path, delta_tail=True)
    pipe.delete_where(_expired(), mode="dv")
    before = pipe.final_state_sorted()
    res = pipe.compact_deltas()
    assert res["dv_files_folded"] > 0 and res["delta_files_folded"] > 0
    m = mf.read_manifest(pipe.lake_dir)
    assert not any(p.get("dvs") for p in m["partitions"].values())
    assert not any(p.get("deltas") for p in m["partitions"].values())
    # fold ≡ compaction: live state bit-equal across the fold boundary
    assert pipe.final_state_sorted().equals(before)
    assert pipe.fsck()["violations"] == []


def test_dv_base_merge_folds_vectors_away(ray_session, tmp_path):
    import ray.data

    n = 1200
    pipe = _lake(tmp_path, n=n)
    pipe.delete_where(_expired(), mode="dv")
    # a later base merge folds each touched partition's dv into the new
    # base and clears its list; deleted keys stay dead
    ev = expected_event_table(n + 400)
    tail = ev.filter(pc.greater(ev.column("lsn"), n))
    pipe.apply(ray.data.from_arrow(tail))
    m = mf.read_manifest(pipe.lake_dir)
    assert not any(p.get("dvs") for p in m["partitions"].values())
    state = pipe.final_state_sorted()
    old = state.filter(pc.less_equal(state.column("lsn"), n))
    assert pc.max(old.column("turn_idx")).as_py() < 30
    assert pipe.fsck()["violations"] == []


def test_dv_pins_lsn_so_later_delta_reinserts(ray_session, tmp_path):
    import ray.data

    n = 1200
    pipe = _lake(tmp_path, n=n)
    pipe.delete_where(_expired(), mode="dv")

    # a NEW event (lsn above the dv'd victim's) re-inserts the key even
    # while the dv is still pending — the vector pins the victim's lsn
    ev = expected_event_table(n)
    victim = ev.filter(pc.and_(
        pc.greater_equal(ev.column("turn_idx"), 30),
        pc.equal(ev.column("op"), "upsert"))).slice(0, 1)
    i = victim.schema.get_field_index("lsn")
    fresh = victim.set_column(i, "lsn", pa.array([n + 10], pa.int64()))
    pipe.apply_delta(ray.data.from_arrow(fresh))

    m = mf.read_manifest(pipe.lake_dir)
    assert any(p.get("dvs") for p in m["partitions"].values())  # dv pends
    state = pipe.final_state_sorted()
    hit = state.filter(pc.and_(
        pc.equal(state.column("conv_id"), victim.column("conv_id")[0]),
        pc.equal(state.column("turn_idx"), victim.column("turn_idx")[0])))
    assert hit.num_rows == 1
    assert hit.column("lsn")[0].as_py() == n + 10
    # every OTHER expired key stays dead
    rest = state.filter(pc.not_equal(
        state.column("conv_id"), victim.column("conv_id")[0]))
    assert pc.max(rest.column("turn_idx")).as_py() < 30
    assert pipe.fsck()["violations"] == []


def test_dv_change_feed_time_travel_rollback(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    before = pipe.final_state_sorted()
    v0 = mf.read_manifest(pipe.lake_dir)["version"]
    res = pipe.delete_where(_expired(), mode="dv")

    feed = pa.concat_tables(
        [b for b in pipe.lake_changes(v0, res["version"])
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    assert feed.num_rows == res["rows_deleted"]
    assert set(pc.unique(feed.column("change_type")).to_pylist()) == {
        "delete"}

    old = pa.concat_tables(
        [b for b in pipe.read_lake_at(v0).iter_batches(
            batch_format="pyarrow")], promote_options="permissive")
    assert old.num_rows == before.num_rows

    pipe.rollback(v0)
    assert pipe.final_state_sorted().equals(before)


def test_dv_point_lookup_folds(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    before = pipe.final_state_sorted()
    # pick a conversation that has both surviving and expired turns
    convs = pc.unique(before.filter(
        pc.greater_equal(before.column("turn_idx"), 30))
        .column("conv_id")).to_pylist()
    pipe.delete_where(_expired(), mode="dv")
    got = pipe.read_conversation(convs[0])
    exp = before.filter(pc.and_(
        pc.equal(before.column("conv_id"), convs[0]),
        pc.less(before.column("turn_idx"), 30)))
    assert got.num_rows == exp.num_rows
    assert pc.max(got.column("turn_idx")).as_py() < 30


def test_dv_zero_matches_commits_nothing(ray_session, tmp_path):
    pipe = _lake(tmp_path, n=400, partitions=2)
    v0 = mf.read_manifest(pipe.lake_dir)["version"]
    none = parse_constraint("turn_idx:between:10000,")
    res = pipe.delete_where(none.matches, mode="dv")
    assert res["rows_deleted"] == 0 and res["partitions_deleted"] == 0
    assert mf.read_manifest(pipe.lake_dir)["version"] == v0
    assert res["version"] == v0


def test_bad_mode_rejected(ray_session, tmp_path):
    pipe = _lake(tmp_path, n=400, partitions=2)
    with pytest.raises(ValueError, match="rewrite.*dv|dv.*rewrite"):
        pipe.delete_where(_expired(), mode="copy_on_write")


# ------------------------------------------------------- footer pruning
# prune= takes the OR'd Constraint specs the predicate was built from;
# partitions whose parquet footer min/max stats prove no row can match
# are skipped without reading a data byte (file-skipping for deletes).


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_prune_impossible_range_skips_everything(ray_session, tmp_path,
                                                 mode):
    pipe = _lake(tmp_path / mode, n=800, partitions=4)
    v0 = mf.read_manifest(pipe.lake_dir)["version"]
    spec = parse_constraint("turn_idx:between:10000,")
    res = pipe.delete_where(spec.matches, mode=mode, prune=[spec])
    assert res["partitions_skipped"] == 4  # all pruned from footers alone
    assert res["rows_deleted"] == 0
    assert mf.read_manifest(pipe.lake_dir)["version"] == v0


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_prune_never_loses_deletes(ray_session, tmp_path, mode):
    # pruned run == unpruned run, bit for bit (a false "impossible" would
    # silently lose deletes; footer stats must only ever SKIP true misses)
    spec = parse_constraint("turn_idx:between:30,")
    pipe_a = _lake(tmp_path / "a", delta_tail=True)
    pipe_b = _lake(tmp_path / "b", delta_tail=True)
    res_a = pipe_a.delete_where(spec.matches, mode=mode, prune=[spec])
    res_b = pipe_b.delete_where(spec.matches, mode=mode)
    assert res_a["rows_deleted"] == res_b["rows_deleted"] > 0
    assert pipe_a.final_state_sorted().equals(pipe_b.final_state_sorted())


def test_range_possible_surface():
    c = parse_constraint("turn_idx:between:30,")
    assert c.range_possible(None) is True       # no stats → conservative
    assert c.range_possible(()) is False        # all-NULL column
    assert c.range_possible((0, 29)) is False   # below the cutoff
    assert c.range_possible((0, 30)) is True    # touches the cutoff
    assert c.range_possible((50, 90)) is True
    hi = parse_constraint("turn_idx:between:,10")
    assert hi.range_possible((11, 90)) is False
    assert hi.range_possible((10, 90)) is True
    s = parse_constraint("role:in:tool,assistant")
    assert s.range_possible(("a", "b")) is True      # 'assistant' inside
    assert s.range_possible(("u", "z")) is False     # no member in range
    ts = parse_constraint("ts:between:,2024-01-01")
    import datetime as dt
    lo = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    hi_ = dt.datetime(2024, 7, 1, tzinfo=dt.timezone.utc)
    assert ts.range_possible((lo, hi_)) is False     # all after cutoff
    assert ts.range_possible(
        (dt.datetime(2023, 1, 1, tzinfo=dt.timezone.utc), hi_)) is True
    # matches / not_null are never prunable
    assert parse_constraint("role:matches:^a").range_possible(
        ("b", "c")) is True
    assert parse_constraint("role:not_null").range_possible(
        ("b", "c")) is True


def test_dv_incremental_view_sees_the_delete(ray_session, tmp_path):
    import os

    from embulk_filter_timestamp_format_ray.pipelines.views import (
        IncrementalView,
    )

    pipe = _lake(tmp_path)
    view = IncrementalView(pipe.lake_dir, str(tmp_path / "view"))
    view.refresh()
    total0 = sum(r["n_turns"] for r in view.read().take_all())
    res = pipe.delete_where(_expired(), mode="dv")
    # a dv delete changes live state WITHOUT touching base paths — the
    # view's staleness signature must still catch it
    ref = view.refresh()
    assert ref["recomputed"] == res["partitions_deleted"]
    total1 = sum(r["n_turns"] for r in view.read().take_all())
    assert total0 - total1 == res["rows_deleted"]
