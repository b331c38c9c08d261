"""A/B: incremental vector-view refresh vs full index rebuild, plus
probe-pruned vs full-probe search latency.

Builds a lake of --events embedded upserts, builds the vector view, then
applies a --delta-events micro-batch and times (a) refresh() — change-feed
cost — against (b) a from-scratch build() at the new head — full-lake
cost.  Also times search() at nprobe=--nprobe vs nprobe=n_centroids on
the refreshed view.  The ratio (b)/(a) is the number that matters at
100 TB: refresh cost is ∝ the micro-batch, rebuild is ∝ the lake.

Usage: python scripts/bench_vector_ab.py [--events N] [--delta-events D]
       [--partitions P] [--centroids K] [--dim DIM] [--nprobe NP]
       [--num-cpus C]
Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--delta-events", type=int, default=20_000)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--centroids", type=int, default=16)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    import ray

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
        VectorIndexView,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        change_events,
        embed_events,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    root = tempfile.mkdtemp(prefix="vecab_")
    lake = os.path.join(root, "lake")
    try:
        pipe = CDCPipeline(lake, num_partitions=args.partitions)
        base = embed_events(change_events(args.events), dim=args.dim)
        pipe.apply(base)

        view = VectorIndexView(pipe, os.path.join(root, "view"),
                               n_centroids=args.centroids)
        t0 = time.perf_counter()
        built = view.build()
        t_build0 = time.perf_counter() - t0

        # micro-batch: a fresh lsn range beyond the base
        delta = embed_events(
            change_events(args.events + args.delta_events),
            dim=args.dim).filter(expr=f"lsn >= {args.events}")
        pipe.apply_delta(delta)

        t0 = time.perf_counter()
        ref = view.refresh()
        t_refresh = time.perf_counter() - t0

        t0 = time.perf_counter()
        rebuild = VectorIndexView(pipe, os.path.join(root, "rebuild"),
                                  n_centroids=args.centroids)
        rebuild.build()
        t_rebuild = time.perf_counter() - t0

        rng = np.random.default_rng(3)
        q = rng.standard_normal((8, args.dim))
        t0 = time.perf_counter()
        pruned = view.search(q, k=10, nprobe=args.nprobe).take_all()
        t_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        full = view.search(q, k=10, nprobe=args.centroids).take_all()
        t_full = time.perf_counter() - t0
        # recall@10 of the pruned probe vs the exact full probe — the
        # approximation is never silent (no-silent-caps rule)
        exact = {(r["query_id"], r["conv_id"], r["turn_idx"])
                 for r in full}
        hits = sum(1 for r in pruned
                   if (r["query_id"], r["conv_id"], r["turn_idx"]) in exact)
        recall = hits / max(len(full), 1)

        print(json.dumps({
            "metric": "vector_view_ab",
            "events": args.events, "delta_events": args.delta_events,
            "dim": args.dim, "centroids": args.centroids,
            "rows_indexed": built["rows_indexed"],
            "appended": ref["appended"], "tombstones": ref["tombstones"],
            "build_sec": round(t_build0, 3),
            "refresh_sec": round(t_refresh, 3),
            "rebuild_sec": round(t_rebuild, 3),
            "rebuild_over_refresh": round(t_rebuild / t_refresh, 2),
            "search_pruned_sec": round(t_pruned, 3),
            "search_full_sec": round(t_full, 3),
            "rows_pruned": len(pruned), "rows_full": len(full),
            "recall_at_10": round(recall, 4),
            "nprobe": args.nprobe,
            "num_cpus": args.num_cpus,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
