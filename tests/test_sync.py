"""Incremental downstream sync (CDCPipeline.sync_changes): cursor-advanced
change shipping a downstream table mirrors itself from.

Contract: applying the sync directories in name order (a snapshot dir
resets the mirror; change rows upsert/delete by key) reproduces the lake's
live state exactly, at every point in the sync history; crash between data
write and cursor advance re-ships the same directory idempotently; a
cursor older than the retention window degrades to a fresh snapshot."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)

N = 3000


def _mirror(out_dir: str) -> "dict[tuple, tuple]":
    """Replay the sync directories in name order into a key→row mirror."""
    mirror: dict = {}
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if not d.startswith("sync-") or not os.path.isdir(full):
            continue
        t = pa.concat_tables(
            [pq.read_table(os.path.join(full, f)) for f in os.listdir(full)],
            promote_options="permissive")
        if d.endswith("snapshot"):
            mirror.clear()
        for r in t.to_pylist():
            k = (r["conv_id"], r["turn_idx"])
            if r["change_type"] == "delete":
                mirror.pop(k, None)
            else:
                mirror[k] = (r["text"], r["role"], r["lsn"])
    return mirror


def _live(pipe) -> "dict[tuple, tuple]":
    t = pipe.final_state_sorted()
    return {(r["conv_id"], r["turn_idx"]): (r["text"], r["role"], r["lsn"])
            for r in t.to_pylist()}


def test_sync_snapshot_then_changes_mirrors_lake(ray_session,
                                                 tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_sync"))
    out = str(tmp_path_factory.mktemp("sync_out"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(N)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1200)))
    s1 = pipe.sync_changes(out)
    assert s1["mode"] == "snapshot" and s1["rows"] > 0
    assert _mirror(out) == _live(pipe)
    # two more commits — one base, one delta (the CDF folds both sides)
    pipe.apply(ray.data.from_arrow(full.slice(1200, 900)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(2100)))
    s2 = pipe.sync_changes(out)
    assert s2["mode"] == "changes" and s2["v_from"] == s1["v_to"]
    assert s2["rows"] > 0
    assert _mirror(out) == _live(pipe)
    # deletes ship with pre-image payload (CDF convention)
    chg = pa.concat_tables(
        [pq.read_table(os.path.join(s2["path"], f))
         for f in os.listdir(s2["path"])], promote_options="permissive")
    dels = chg.filter(pa.compute.equal(chg.column("change_type"), "delete"))
    if dels.num_rows:
        assert dels.column("text").null_count == 0
    # nothing new: noop, no directory written
    dirs_before = sorted(os.listdir(out))
    s3 = pipe.sync_changes(out)
    assert s3["mode"] == "noop" and s3["rows"] == 0
    assert sorted(os.listdir(out)) == dirs_before


def test_sync_crash_between_write_and_cursor_is_idempotent(
        ray_session, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_sync_crash"))
    out = str(tmp_path_factory.mktemp("sync_out_crash"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(1500)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1000)))
    pipe.sync_changes(out)
    pipe.apply(ray.data.from_arrow(full.slice(1000)))
    s2 = pipe.sync_changes(out)
    # crash simulation: the data directory landed but the cursor did not
    os.unlink(os.path.join(out, CDCPipeline.SYNC_CURSOR))
    # ...and the consumer also only saw half the files
    victim = os.listdir(s2["path"])[0]
    os.unlink(os.path.join(s2["path"], victim))
    s_retry = pipe.sync_changes(out)
    # the retry re-ships from scratch (here: cursor lost → fresh snapshot)
    assert s_retry["mode"] == "snapshot"
    assert _mirror(out) == _live(pipe)


def test_sync_cursor_past_retention_resnapshots(ray_session,
                                                tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_sync_old"))
    out = str(tmp_path_factory.mktemp("sync_out_old"))
    pipe = CDCPipeline(lake, num_partitions=4, time_travel_retain=2)
    full = expected_event_table(2400)
    pipe.apply(ray.data.from_arrow(full.slice(0, 400)))
    pipe.sync_changes(out)
    # six more commits blow past the 2-version retention window
    for i in range(6):
        pipe.apply(ray.data.from_arrow(full.slice(400 + i * 300, 300)))
    s = pipe.sync_changes(out)
    assert s["mode"] == "snapshot"  # cursor v1 no longer retained
    assert _mirror(out) == _live(pipe)


def test_sync_rejects_unknown_payload_column(ray_session, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_sync_cols"))
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(300)))
    with pytest.raises(ValueError):
        pipe.lake_changes(1, 1, columns=["nope"])


def test_sync_empty_change_window_advances_cursor(ray_session,
                                                  tmp_path_factory):
    """a version bump with no state change (compaction) must not crash the
    sync: zero-row window → no directory, cursor still advances."""
    lake = str(tmp_path_factory.mktemp("lake_sync_empty"))
    out = str(tmp_path_factory.mktemp("sync_out_empty"))
    pipe = CDCPipeline(lake, num_partitions=4)
    full = expected_event_table(1000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 600)))
    pipe.apply_delta(ray.data.from_arrow(full.slice(600)))
    pipe.sync_changes(out)
    pipe.compact_deltas()  # version bump, identical live state
    s = pipe.sync_changes(out)
    assert s["mode"] == "changes" and s["rows"] == 0 and s["path"] is None
    assert _mirror(out) == _live(pipe)
    assert pipe.sync_changes(out)["mode"] == "noop"  # cursor advanced


def test_sync_torn_attempt_with_intervening_commits(ray_session,
                                                    tmp_path_factory):
    """crash between data write and cursor advance, then MORE commits land
    (including deletes of keys born in the abandoned window): the retry
    must remove the stale torn directory or its rows replay as phantoms."""
    import shutil

    lake = str(tmp_path_factory.mktemp("lake_sync_torn"))
    out = str(tmp_path_factory.mktemp("sync_out_torn"))
    pipe = CDCPipeline(lake, num_partitions=4)
    full = expected_event_table(3000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1000)))
    pipe.sync_changes(out)                                   # cursor = v1
    pipe.apply(ray.data.from_arrow(full.slice(1000, 1000)))  # v2
    s2 = pipe.sync_changes(out)
    # crash: the v1→v2 data landed but the cursor never advanced
    with open(os.path.join(out, CDCPipeline.SYNC_CURSOR)) as f:
        json.load(f)  # sanity: cursor exists
    torn_dir = s2["path"]
    with open(os.path.join(out, CDCPipeline.SYNC_CURSOR), "w") as f:
        json.dump({"version": 1}, f)
    # more commits land before the retry (deletes among them)
    pipe.apply(ray.data.from_arrow(full.slice(2000)))        # v3
    s_retry = pipe.sync_changes(out)
    assert s_retry["v_from"] == 1 and s_retry["v_to"] == 3
    # the stale torn directory is gone and the mirror matches live state
    assert not os.path.isdir(torn_dir)
    assert _mirror(out) == _live(pipe)


def test_read_sync_mirror_distributed(ray_session, tmp_path_factory):
    """the distributed consumer fold (read_sync_mirror) equals both the
    driver-side name-order replay and the producer lake's live state —
    including after a re-snapshot that obsoletes earlier directories."""
    lake = str(tmp_path_factory.mktemp("lake_sync_reader"))
    out = str(tmp_path_factory.mktemp("sync_out_reader"))
    pipe = CDCPipeline(lake, num_partitions=8, time_travel_retain=2)
    full = expected_event_table(N)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1000)))
    pipe.sync_changes(out)
    pipe.apply(ray.data.from_arrow(full.slice(1000, 1000)))
    pipe.sync_changes(out)
    # blow past retention so the next sync is a mid-history re-snapshot
    for i in range(4):
        pipe.apply(ray.data.from_arrow(full.slice(2000 + i * 250, 250)))
    pipe.sync_changes(out)
    pipe.apply(ray.data.from_arrow(full.slice(N - 200)))
    pipe.sync_changes(out)

    folded = pa.concat_tables(
        [b for b in CDCPipeline.read_sync_mirror(out)
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["role"], r["lsn"])
           for r in folded.to_pylist()}
    assert got == _mirror(out) == _live(pipe)


def test_prune_sync_dirs_keeps_mirror_intact(ray_session, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_sync_gc"))
    out = str(tmp_path_factory.mktemp("sync_out_gc"))
    pipe = CDCPipeline(lake, num_partitions=4, time_travel_retain=2)
    full = expected_event_table(2000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 600)))
    pipe.sync_changes(out)                                  # snapshot 1
    pipe.apply(ray.data.from_arrow(full.slice(600, 400)))
    pipe.sync_changes(out)                                  # changes
    for i in range(4):  # blow retention → next sync re-snapshots
        pipe.apply(ray.data.from_arrow(full.slice(1000 + i * 200, 200)))
    pipe.sync_changes(out)                                  # snapshot 2
    pipe.apply(ray.data.from_arrow(full.slice(1800)))
    pipe.sync_changes(out)                                  # changes
    before = _mirror(out)
    dead = CDCPipeline.prune_sync_dirs(out)
    assert len(dead) == 2  # snapshot 1 + its change dir
    assert _mirror(out) == before == _live(pipe)
    assert CDCPipeline.prune_sync_dirs(out) == []  # idempotent


def test_consumer_ignores_torn_unconfirmed_dirs(ray_session,
                                                tmp_path_factory):
    """a torn producer attempt (dir on disk, cursor never advanced) must be
    invisible to the consumer: read_sync_mirror excludes it and
    prune_sync_dirs neither deletes confirmed history because of it nor
    touches the torn dir itself."""
    lake = str(tmp_path_factory.mktemp("lake_sync_torn2"))
    out = str(tmp_path_factory.mktemp("sync_out_torn2"))
    pipe = CDCPipeline(lake, num_partitions=4)
    full = expected_event_table(2000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1000)))
    pipe.sync_changes(out)
    pipe.apply(ray.data.from_arrow(full.slice(1000, 500)))
    pipe.sync_changes(out)
    confirmed_state = _mirror(out)
    # torn FUTURE attempt: a partial snapshot dir lands, cursor stays put
    torn = os.path.join(out, "sync-00000009-snapshot")
    os.makedirs(torn)
    t = pa.table({
        "conv_id": pa.array(["phantom"]), "turn_idx": pa.array([0], pa.int32()),
        "change_type": pa.array(["insert"]), "lsn": pa.array([1], pa.int64()),
        "role": pa.array(["user"]), "text": pa.array(["boo"]),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([0], pa.timestamp("ns", tz="UTC")),
    })
    pq.write_table(t, os.path.join(torn, "part.parquet"))
    folded = pa.concat_tables(
        [b for b in CDCPipeline.read_sync_mirror(out)
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["role"], r["lsn"])
           for r in folded.to_pylist()}
    assert ("phantom", 0) not in got
    assert got == confirmed_state == _live(pipe)
    # prune must not treat the torn snapshot as a reset point
    dead = CDCPipeline.prune_sync_dirs(out)
    assert dead == []  # no confirmed snapshot after the first → nothing dies
    assert os.path.isdir(torn)  # the producer's retry owns this dir
    assert _mirror_confirmed(out) == confirmed_state


def _mirror_confirmed(out_dir):
    """driver replay over cursor-confirmed dirs only (mirror of the
    consumer contract for assertions)."""
    mirror = {}
    for d in CDCPipeline._confirmed_sync_dirs(out_dir):
        full = os.path.join(out_dir, d)
        t = pa.concat_tables(
            [pq.read_table(os.path.join(full, f)) for f in os.listdir(full)],
            promote_options="permissive")
        if d.endswith("snapshot"):
            mirror.clear()
        for r in t.to_pylist():
            k = (r["conv_id"], r["turn_idx"])
            if r["change_type"] == "delete":
                mirror.pop(k, None)
            else:
                mirror[k] = (r["text"], r["role"], r["lsn"])
    return mirror


def test_empty_mirror_keeps_default_schema(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sync_out_schema"))
    with open(os.path.join(out, CDCPipeline.SYNC_CURSOR), "w") as f:
        json.dump({"version": 3}, f)
    ds = CDCPipeline.read_sync_mirror(out)
    sel = ds.map_batches(lambda b: b.select(["conv_id", "text", "lsn"]),
                         batch_format="pyarrow")
    assert sel.count() == 0  # column select resolves on the empty mirror


def test_sync_changes_across_repartition(ray_session, tmp_path_factory):
    """A mid-stream repartition must not break the downstream mirror: the
    next sync ships the key-level changes across the layout change (the
    change feed compares keys globally), not a re-snapshot."""
    import ray.data

    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    lake = str(tmp_path_factory.mktemp("lake_sync_repart"))
    mirror = str(tmp_path_factory.mktemp("mirror_repart"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(6000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 3000)))   # v1
    s1 = pipe.sync_changes(mirror)
    assert s1["mode"] == "snapshot"
    pipe.repartition_lake(8)                               # v2: layout only
    pipe.apply(ray.data.from_arrow(full.slice(3000)))      # v3
    s2 = pipe.sync_changes(mirror)
    assert s2["mode"] == "changes" and s2["v_from"] == 1
    assert s2["rows"] > 0
