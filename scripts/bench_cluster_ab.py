"""A/B: ts-band analytics read on a clustered vs unclustered lake.

Builds two lakes from the SAME generated binlog (one then re-clustered
by ts via set_clustering), and times ``read_lake(where=[ts band])`` on
each, also counting the row groups the zone maps admit.  Simulates the
100-TB shape (many row groups per partition base) at fixture scale via
GRAFT_LAKE_ROW_GROUP_ROWS — at real scale partitions exceed the default
131072-row granule on their own.

Usage: python scripts/bench_cluster_ab.py [--events N] [--partitions P]
       [--row-group-rows G] [--band-frac F] [--reps R] [--num-cpus C]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--row-group-rows", type=int, default=16_384)
    ap.add_argument("--band-frac", type=float, default=0.10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    # must land before the package import so every writer (driver AND
    # inherited worker env) sees the experiment's row-group granule
    os.environ["GRAFT_LAKE_ROW_GROUP_ROWS"] = str(args.row_group_rows)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        import ray.data

        from embulk_filter_timestamp_format_ray.pipelines.cdc import (
            CDCPipeline,
            _matching_row_groups,
        )
        from embulk_filter_timestamp_format_ray.pipelines.constraints import (
            parse_constraint,
        )
        from embulk_filter_timestamp_format_ray.sources.changegen import (
            change_events,
        )
        from embulk_filter_timestamp_format_ray.state import manifest as mf

        run = str(int(time.time()))
        lakes = {}
        for name in ("plain", "clustered"):
            lake = f"/tmp/graft_clus_ab_{name}_{run}"
            pipe = CDCPipeline(lake, num_partitions=args.partitions)
            pipe.apply(change_events(args.events, seed=42, parallelism=16))
            if name == "clustered":
                t0 = time.perf_counter()
                pipe.set_clustering(["ts"])
                cluster_sec = round(time.perf_counter() - t0, 3)
            lakes[name] = pipe

        # band bounds from actual ts quantiles (mid band, band_frac wide)
        ts = pa.concat_tables(
            [b.select(["ts"]) for b in lakes["plain"].read_lake(
                columns=["ts"]).iter_batches(batch_format="pyarrow")],
            promote_options="permissive").column("ts")
        ns = ts.cast(pa.int64()).to_numpy()
        lo_q, hi_q = 0.5 - args.band_frac / 2, 0.5 + args.band_frac / 2
        lo_ns, hi_ns = (int(np.quantile(ns, q)) for q in (lo_q, hi_q))
        import datetime as dt
        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        iso = lambda v: dt.datetime.fromtimestamp(  # noqa: E731
            v / 1e9, dt.timezone.utc).strftime(fmt)
        spec = parse_constraint(f"ts:between:{iso(lo_ns)},{iso(hi_ns)}")

        out = {"events": args.events, "partitions": args.partitions,
               "row_group_rows": args.row_group_rows,
               "band_frac": args.band_frac, "num_cpus": args.num_cpus,
               "cluster_rewrite_sec": cluster_sec}
        for name, pipe in lakes.items():
            # zone-map selectivity over the base files (footer-only)
            matched = total = 0
            manifest = mf.read_manifest(pipe.lake_dir)
            for p in manifest["partitions"].values():
                if not p.get("path"):
                    continue
                pf = pq.ParquetFile(os.path.join(pipe.lake_dir, p["path"]))
                matched += len(_matching_row_groups(pf, [spec]))
                total += pf.metadata.num_row_groups
            secs, rows = [], None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                n = 0
                for b in pipe.read_lake(where=[spec]).iter_batches(
                        batch_format="pyarrow"):
                    n += b.num_rows
                secs.append(round(time.perf_counter() - t0, 3))
                rows = n
            out[name] = {"band_rows": rows, "read_sec": secs,
                         "best_sec": min(secs),
                         "row_groups_matched": matched,
                         "row_groups_total": total}
        assert out["plain"]["band_rows"] == out["clustered"]["band_rows"]
        out["speedup_best"] = round(
            out["plain"]["best_sec"] / out["clustered"]["best_sec"], 2)
        print(json.dumps(out))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
