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
