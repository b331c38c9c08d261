"""Optimistic-concurrency commits: CommitConflict + whole-apply retry.

The realistic multi-writer scenario is active-active redundant tailers
applying the SAME micro-batch (failover overlap).  The loser's retry runs
against the winner's fresh manifest, the LSN watermarks prune everything
already committed, and it lands a no-op txn — exactly-once is preserved.
"""

import pyarrow as pa
import pytest
import ray.data

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def test_commit_conflict_detection(tmp_path):
    lake = str(tmp_path / "lake")
    m1 = {"version": 1, "partitions": {}, "schema_columns": None}
    mf.commit_manifest(lake, m1, expected_version=0)
    # stale writer: merged against version 0, but the lake is at 1
    with pytest.raises(mf.CommitConflict, match="version 1"):
        mf.commit_manifest(
            lake, {"version": 1, "partitions": {}, "schema_columns": None},
            expected_version=0)
    # the conflicting attempt must not have clobbered the manifest
    assert mf.read_manifest(lake)["version"] == 1
    # correct expectation commits fine
    mf.commit_manifest(
        lake, {"version": 2, "partitions": {}, "schema_columns": None},
        expected_version=1)
    assert mf.read_manifest(lake)["version"] == 2


def _state(pipe) -> pa.Table:
    import pyarrow.compute as pc

    t = pa.Table.from_pandas(pipe.read_lake().to_pandas(),
                             preserve_index=False)
    return t.take(pc.sort_indices(t, sort_keys=[
        ("conv_id", "ascending"), ("turn_idx", "ascending")]))


def test_concurrent_same_batch_applies_exactly_once(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    events = expected_event_table(600)

    # the reference outcome: one clean apply on a private lake
    solo = CDCPipeline(str(tmp_path / "solo"), num_partitions=4)
    solo_stats = solo.apply(ray.data.from_arrow(events))

    a = CDCPipeline(lake, num_partitions=4)
    b = CDCPipeline(lake, num_partitions=4)

    # interleave: B commits the same batch between A's merge and A's commit
    def competing_commit():
        a._pre_commit_hook = None  # one-shot: A's retry commits cleanly
        b.apply(ray.data.from_arrow(events))

    a._pre_commit_hook = competing_commit
    stats_a = a.apply(ray.data.from_arrow(events))

    # B won the race and applied the batch; A's retry was a no-op txn
    assert stats_a["events_applied"] == 0
    assert stats_a["version"] == 2  # B's commit (1) then A's no-op (2)
    # exactly-once: the lake equals one clean application
    assert _state(a).equals(_state(solo))
    assert solo_stats["events_applied"] > 0


def test_conflict_exhausts_retries(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    events = expected_event_table(300)
    a = CDCPipeline(lake, num_partitions=4)
    b = CDCPipeline(lake, num_partitions=4)
    calls = {"n": 0}

    def always_compete():
        calls["n"] += 1
        # keep beating A on every attempt (fresh events so B always commits)
        b.apply(ray.data.from_arrow(
            expected_event_table(300 * (calls["n"] + 1))))

    a._pre_commit_hook = always_compete
    with pytest.raises(mf.CommitConflict):
        a.apply(ray.data.from_arrow(events), max_commit_retries=1)
    assert calls["n"] == 2  # initial attempt + one retry, both beaten


def test_delta_commit_loses_to_compaction_and_retries(ray_session, tmp_path):
    """a compaction lands between a delta commit's merge and its manifest
    swap: the delta commit retries against the compacted manifest and the
    lake converges to the clean sequential state."""
    lake = str(tmp_path / "lake")
    full = expected_event_table(1200)
    a = CDCPipeline(lake, num_partitions=4)
    a.apply(ray.data.from_arrow(full.slice(0, 600)))
    a.apply_delta(ray.data.from_arrow(full.slice(600, 300)))
    b = CDCPipeline(lake, num_partitions=4)

    def compact_between():
        a._pre_commit_hook = None  # one-shot
        b.compact_deltas()

    a._pre_commit_hook = compact_between
    stats = a.apply_delta(ray.data.from_arrow(full.slice(900)))
    assert stats["events_applied"] > 0
    solo = CDCPipeline(str(tmp_path / "solo"), num_partitions=4)
    solo.apply(ray.data.from_arrow(full))
    a.compact_deltas()
    assert _state(a).equals(_state(solo))


def test_compaction_loses_to_delta_commit_and_retries(ray_session, tmp_path):
    """a delta commit lands between a compaction's manifest read and its
    swap: the compaction retries against the fresh manifest and must fold
    the NEW delta too (dropping it would lose committed rows)."""
    lake = str(tmp_path / "lake")
    full = expected_event_table(1200)
    a = CDCPipeline(lake, num_partitions=4)
    a.apply(ray.data.from_arrow(full.slice(0, 600)))
    a.apply_delta(ray.data.from_arrow(full.slice(600, 300)))
    b = CDCPipeline(lake, num_partitions=4)

    def delta_between():
        a._pre_commit_hook = None  # one-shot
        b.apply_delta(ray.data.from_arrow(full.slice(900)))

    a._pre_commit_hook = delta_between
    res = a.compact_deltas()
    assert res["partitions_compacted"] > 0
    assert not mf.has_deltas(mf.read_manifest(lake))
    solo = CDCPipeline(str(tmp_path / "solo"), num_partitions=4)
    solo.apply(ray.data.from_arrow(full))
    assert _state(a).equals(_state(solo))


def test_auto_compact_threshold(ray_session, tmp_path):
    """auto_compact_deltas=N folds the backlog as soon as any partition
    accumulates N pending delta files — read amplification stays bounded
    without an external cadence."""
    lake = str(tmp_path / "lake")
    full = expected_event_table(1600)
    pipe = CDCPipeline(lake, num_partitions=4, auto_compact_deltas=3)
    pipe.apply(ray.data.from_arrow(full.slice(0, 400)))
    s1 = pipe.apply_delta(ray.data.from_arrow(full.slice(400, 400)))
    s2 = pipe.apply_delta(ray.data.from_arrow(full.slice(800, 400)))
    assert "auto_compacted" not in s1 and "auto_compacted" not in s2
    assert mf.has_deltas(mf.read_manifest(lake))  # backlog of 2, under N
    s3 = pipe.apply_delta(ray.data.from_arrow(full.slice(1200)))
    assert s3["auto_compacted"]["partitions_compacted"] > 0
    assert not mf.has_deltas(mf.read_manifest(lake))
    solo = CDCPipeline(str(tmp_path / "solo"), num_partitions=4)
    solo.apply(ray.data.from_arrow(full))
    assert _state(pipe).equals(_state(solo))
