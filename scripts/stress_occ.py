"""Multi-process optimistic-concurrency stress: N INDEPENDENT processes
(each with its own Ray session) apply overlapping slices of the same event
stream to ONE lake — mixed base merges, delta commits and compactions —
and the final folded state must equal the sequential oracle.

This is the real-deployment shape behind the OCC unit tests (which
interleave via an in-process hook): active-active redundant tailers
racing flock-guarded manifest commits across process boundaries.

    python scripts/stress_occ.py [--events 6000] [--writers 3] [--lake DIR]

Prints one JSON line: conflicts retried per writer, total wall, and the
state-vs-oracle verdict (exit 1 on mismatch).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import json, logging, os, sys
sys.path.insert(0, {repo!r})
import ray, ray.data
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR",
         object_store_memory=2 * 1024**3)  # N concurrent sessions: the
         # default ~30%-of-RAM reservation per session would oversubscribe
logging.getLogger("embulk_filter_timestamp_format_ray").setLevel(logging.ERROR)
try:
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )
    from embulk_filter_timestamp_format_ray.state import manifest as mf

    wid, n_events, lake = {wid}, {n_events}, {lake!r}
    full = expected_event_table(n_events, patch_permille={patch},
                                conv_delete_permille={convdel})
    vector = {vector}
    if vector:
        from embulk_filter_timestamp_format_ray.sources.changegen import (
            embed_batch,
        )

        full = embed_batch(full, dim=8)
    pipe = CDCPipeline(lake, num_partitions=8)
    exchange = "dataset"
    if {exchange!r} == "actor":
        # ONE persistent push-exchange pool per writer process, reused by
        # every commit it makes — the steady-state fast path under real
        # cross-process OCC races
        from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
            ActorExchange,
        )

        exchange = ActorExchange(lake, 8)
    conflicts = 0
    vv_conflicts = 0
    # every writer applies the WHOLE stream in 4 chunks, offset so the
    # writers overlap heavily (at-least-once redundant delivery)
    step = n_events // 4
    for i in range(4):
        lo = max(0, i * step - wid * (step // 3))
        hi = n_events if i == 3 else (i + 1) * step  # last chunk takes the
        chunk = full.slice(lo, hi - lo)              # n_events % 4 remainder
        mode = (wid + i) % 3  # rotate base / delta / delta+compact
        for attempt in range(64):
            try:
                if mode == 0:
                    pipe.apply(ray.data.from_arrow(chunk),
                               max_commit_retries=0, exchange=exchange)
                else:
                    pipe.apply_delta(ray.data.from_arrow(chunk),
                                     max_commit_retries=0,
                                     exchange=exchange)
                break
            except mf.CommitConflict:
                conflicts += 1
        else:
            raise SystemExit(f"writer {{wid}}: retries exhausted")
        if mode == 2:
            for attempt in range(64):
                try:
                    pipe.compact_deltas(max_commit_retries=0)
                    break
                except mf.CommitConflict:
                    conflicts += 1
        if vector:
            # every writer also maintains ONE SHARED vector view: build
            # races resolve via the generation-guarded commit; refresh
            # races converge (the loser re-reads the advanced cursor)
            from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
                VectorIndexView,
                ViewCommitConflict,
                _read_view_manifest,
            )

            vdir = lake + "_vv"
            for attempt in range(64):
                try:
                    view = VectorIndexView(pipe, vdir, n_centroids=4)
                    if _read_view_manifest(vdir) is None:
                        view.build()
                    else:
                        view.refresh()
                    break
                except (ViewCommitConflict, ValueError):
                    vv_conflicts += 1
            else:
                raise SystemExit(f"writer {{wid}}: view retries exhausted")
    print(json.dumps({{"wid": wid, "conflicts": conflicts,
                       "vv_conflicts": vv_conflicts}}))
finally:
    ray.shutdown()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=6000)
    ap.add_argument("--writers", type=int, default=3)
    ap.add_argument("--lake", default=None)
    ap.add_argument("--patch-permille", type=int, default=0)
    ap.add_argument("--conv-delete-permille", type=int, default=0)
    ap.add_argument("--exchange", choices=("dataset", "actor"),
                    default="dataset",
                    help="'actor' = one persistent push-exchange pool per "
                         "writer, reused across all its commits")
    ap.add_argument("--vector-view", action="store_true",
                    help="writers also race build/refresh of ONE shared "
                         "vector view (generation-guarded commits); the "
                         "final audit must be green")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lake = args.lake or os.path.join(
        tempfile.gettempdir(), f"stress_occ_{uuid.uuid4().hex[:8]}")

    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER.format(repo=repo, wid=w, n_events=args.events,
                           lake=lake, patch=args.patch_permille,
                           convdel=args.conv_delete_permille,
                           exchange=args.exchange,
                           vector=args.vector_view)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        for w in range(args.writers)
    ]
    writer_stats = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            print(json.dumps({"ok": False, "err": "writer failed",
                              "out": out[-500:]}))
            return 1
        writer_stats.append(json.loads(out.strip().splitlines()[-1]))
    wall = time.perf_counter() - t0

    # verify: folded lake state == sequential oracle (single-process)
    import ray
    import ray.data

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    try:
        from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
        from embulk_filter_timestamp_format_ray.sources.changegen import (
            expected_event_table,
        )

        pipe = CDCPipeline.from_lake(lake)
        got = pipe.final_state_sorted()
        solo_lake = os.path.join(
            tempfile.gettempdir(), f"stress_solo_{uuid.uuid4().hex[:8]}")
        solo = CDCPipeline(solo_lake, num_partitions=8)
        solo_events = expected_event_table(
            args.events, patch_permille=args.patch_permille,
            conv_delete_permille=args.conv_delete_permille)
        if args.vector_view:
            from embulk_filter_timestamp_format_ray.sources.changegen import (
                embed_batch,
            )

            solo_events = embed_batch(solo_events, dim=8)
        solo.apply(ray.data.from_arrow(solo_events))
        exp = solo.final_state_sorted()
        ok = got.equals(exp)
        out = {
            "ok": ok, "rows": got.num_rows, "writers": writer_stats,
            "total_conflicts": sum(w["conflicts"] for w in writer_stats),
            "wall_sec": round(wall, 2), "lake": lake,
        }
        if args.vector_view:
            from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
                VectorIndexView,
            )

            view = VectorIndexView(pipe, lake + "_vv", n_centroids=4)
            view.refresh()  # final catch-up past the last racer
            out["vector_view_verify"] = view.verify()
            out["vv_conflicts"] = sum(w.get("vv_conflicts", 0)
                                      for w in writer_stats)
            ok = ok and out["vector_view_verify"]["ok"]
            out["ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
