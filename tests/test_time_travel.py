"""Time-travel reads: retained manifest snapshots + read_lake_at.

The lake keeps ``history/manifest-v{N}.json`` per commit (bounded by
``time_travel_retain``); GC treats snapshot-referenced txn files as live, so
any retained version stays readable — Delta-Lake-style VERSION AS OF.
"""

import os

import pyarrow as pa
import pytest
import ray.data

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def _sorted_state(ds) -> pa.Table:
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[
        ("conv_id", "ascending"), ("turn_idx", "ascending")]))


def test_read_lake_at_matches_each_commit(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True)
    full = expected_event_table(900)
    snapshots = {}
    for i in range(3):
        stats = pipe.apply(ray.data.from_arrow(full.slice(i * 300, 300)))
        snapshots[stats["version"]] = _sorted_state(pipe.read_lake())
    assert sorted(snapshots) == [1, 2, 3]
    assert pipe.versions() == [1, 2, 3]
    # every retained version reads back exactly the state as of its commit
    for v, want in snapshots.items():
        got = _sorted_state(pipe.read_lake_at(v))
        assert got.equals(want), f"version {v} drifted"
    # versions really differ (each chunk applied new rows)
    assert snapshots[1].num_rows < snapshots[3].num_rows


def test_gc_keeps_snapshot_referenced_txns(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True)
    full = expected_event_table(600)
    pipe.apply(ray.data.from_arrow(full.slice(0, 300)))
    v1 = _sorted_state(pipe.read_lake())
    pipe.apply(ray.data.from_arrow(full.slice(300, 300)))
    # explicit GC after the second commit must not break version 1
    pipe.gc()
    assert _sorted_state(pipe.read_lake_at(1)).equals(v1)


def test_retention_prunes_old_versions(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True,
                       time_travel_retain=2)
    full = expected_event_table(900)
    for i in range(3):
        pipe.apply(ray.data.from_arrow(full.slice(i * 300, 300)))
    assert pipe.versions() == [2, 3]
    with pytest.raises(ValueError, match="no retained snapshot"):
        pipe.read_lake_at(1)
    # retained ones still read
    assert _sorted_state(pipe.read_lake_at(2)).num_rows > 0
    # on-disk history matches the retention window
    hist = os.listdir(os.path.join(lake, mf.HISTORY_DIR))
    assert sorted(hist) == ["manifest-v00000002.json",
                            "manifest-v00000003.json"]


def test_time_travel_survives_repartition(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True)
    full = expected_event_table(600)
    pipe.apply(ray.data.from_arrow(full))
    v1 = _sorted_state(pipe.read_lake())
    pipe.repartition_lake(8)
    # the repartition committed version 2 under the new layout; version 1
    # (old layout) still reads bit-identically
    assert pipe.versions() == [1, 2]
    assert _sorted_state(pipe.read_lake_at(1)).equals(v1)
    assert _sorted_state(pipe.read_lake_at(2)).equals(v1)


def test_lake_changes_cdf(ray_session, tmp_path):
    import numpy as np
    import pyarrow.compute as pc

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True)
    full = expected_event_table(600)
    pipe.apply(ray.data.from_arrow(full.slice(0, 400)))
    pipe.apply(ray.data.from_arrow(full.slice(400, 200)))

    changes = pa.Table.from_pandas(
        pipe.lake_changes(1, 2).to_pandas(), preserve_index=False)
    # replay oracle: fold prefix vs fold full, diff by key
    def fold(tbl):
        import pandas as pd

        df = tbl.to_pandas().sort_values("lsn")
        latest = df.groupby(["conv_id", "turn_idx"]).last().reset_index()
        return latest[latest.op != "delete"][
            ["conv_id", "turn_idx", "lsn"]]

    f1 = fold(full.slice(0, 400)).set_index(["conv_id", "turn_idx"])
    f2 = fold(full).set_index(["conv_id", "turn_idx"])
    want = {}
    for key in f2.index.difference(f1.index):
        want[key] = ("insert", int(f2.loc[key].lsn))
    for key in f1.index.difference(f2.index):
        want[key] = ("delete", int(f1.loc[key].lsn))
    for key in f1.index.intersection(f2.index):
        if int(f1.loc[key].lsn) != int(f2.loc[key].lsn):
            want[key] = ("update", int(f2.loc[key].lsn))
    got = {(r["conv_id"], r["turn_idx"]): (r["change_type"], r["lsn"])
           for r in changes.to_pylist()}
    assert got == want and len(got) > 0
    # identical versions → empty feed (manifest diff finds no changed files)
    assert pipe.lake_changes(2, 2).count() == 0


def test_rollback_restores_and_replays_corrected(ray_session, tmp_path):
    """The undo-a-bad-commit workflow: good prefix → corrupted suffix →
    rollback → corrected suffix.  Rollback is metadata-only; watermarks
    roll back with it, so re-applying the undone lsn range works."""
    import pyarrow.compute as pc

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True)
    full = expected_event_table(900)
    c1, c2 = full.slice(0, 450), full.slice(450, 450)
    pipe.apply(ray.data.from_arrow(c1))
    s1 = _sorted_state(pipe.read_lake())
    bad = c2.set_column(
        c2.schema.get_field_index("text"), "text",
        pc.binary_join_element_wise(c2.column("text"), "<CORRUPT>", ""))
    pipe.apply(ray.data.from_arrow(bad))
    assert b"<CORRUPT>" in _sorted_state(pipe.read_lake()).column(
        "text").combine_chunks().buffers()[2].to_pybytes()

    res = pipe.rollback(1)
    assert res == {"version": 3, "restored_version": 1,
                   "partitions": 4, "num_partitions": 4}
    assert _sorted_state(pipe.read_lake()).equals(s1)
    # GC after rollback must not eat the restored files
    pipe.gc()
    assert _sorted_state(pipe.read_lake()).equals(s1)

    # corrected replay of the undone range lands cleanly
    pipe.apply(ray.data.from_arrow(c2))
    clean_lake = str(tmp_path / "clean")
    clean = CDCPipeline(clean_lake, num_partitions=4)
    clean.apply(ray.data.from_arrow(full))
    got = _sorted_state(pipe.read_lake())
    assert b"<CORRUPT>" not in got.column(
        "text").combine_chunks().buffers()[2].to_pybytes()
    assert got.equals(_sorted_state(clean.read_lake()))


def test_rollback_noop_missing_and_conflict_guard(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(300)))
    assert pipe.rollback(1)["noop"] is True
    with pytest.raises(ValueError, match="no retained snapshot"):
        pipe.rollback(42)


def test_rollback_to_snapshot_with_pending_deltas(ray_session, tmp_path):
    """A snapshot taken mid-backlog (pending delta files) restores with its
    merge-on-read fold intact."""
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    full = expected_event_table(900)
    pipe.apply(ray.data.from_arrow(full.slice(0, 300)))            # v1 base
    pipe.apply_delta(ray.data.from_arrow(full.slice(300, 300)))    # v2 delta
    s2 = _sorted_state(pipe.read_lake())
    pipe.compact_deltas()                                          # v3
    pipe.apply(ray.data.from_arrow(full.slice(600, 300)))          # v4
    assert pipe.rollback(2)["restored_version"] == 2
    assert mf.has_deltas(mf.read_manifest(lake))
    assert _sorted_state(pipe.read_lake()).equals(s2)


def test_history_summarizes_retained_versions(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    full = expected_event_table(900)
    pipe.apply(ray.data.from_arrow(full.slice(0, 450)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(450, 450)))
    pipe.rollback(1)
    h = pipe.history()
    assert [r["version"] for r in h] == [1, 2, 3]
    assert h[1]["delta_files"] > 0 and h[1]["delta_rows"] > 0
    assert h[2]["rolled_back_to"] == 1
    # rollback restored v1's table shape
    assert h[2]["rows"] == h[0]["rows"]
    assert h[2]["watermark_max"] == h[0]["watermark_max"]
    assert all(r["dlq_rows"] == 0 for r in h)


def test_rollback_across_repartition_adopts_layout(ray_session,
                                                   tmp_path_factory):
    """Rolling back past a repartition_lake must restore the snapshot's
    partition layout WITH its data (the restore is wholesale) — the
    current-layout compat check wrongly refused exactly that (r4 bug).
    The handle and fresh from_lake opens adopt the restored layout; fsck
    is clean and subsequent applies route correctly."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    lake = str(tmp_path_factory.mktemp("lake_rb_repart"))
    pipe = CDCPipeline(lake, num_partitions=16)
    pipe.apply(ray.data.from_arrow(expected_event_table(3000)))   # v1 @16
    before = pipe.final_state_sorted()
    pipe.repartition_lake(8)                                      # v2 @8
    res = pipe.rollback(1)                                        # v3 = v1
    assert res["num_partitions"] == 16
    assert pipe.num_partitions == 16  # handle adopted the restored layout
    fresh = CDCPipeline.from_lake(lake)
    assert fresh.num_partitions == 16
    assert fresh.fsck()["violations"] == []
    assert fresh.final_state_sorted().equals(before)
    # replaying a superset against the restored layout stays clean
    fresh.apply(ray.data.from_arrow(expected_event_table(6000)))
    assert fresh.fsck()["violations"] == []
