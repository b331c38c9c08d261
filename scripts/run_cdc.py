"""`ray job submit`-able CDC entrypoint.

    ray job submit -- python scripts/run_cdc.py --events 10000000 \
        --lake /tmp/lake --partitions 256 [--micro-batches 10] [--resume]

Owns its Ray session (guarded init, clean shutdown) per the repo contract:
only bench.py, CLI entrypoints, and the test fixture may init Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mf_version(pipe) -> int:
    from embulk_filter_timestamp_format_ray.state import manifest as mf

    return int(mf.read_manifest(pipe.lake_dir).get("version", 0))


def _vector_view_sync(pipe, view_dir: str,
                      compact_every: "int | None" = None) -> dict:
    """Build the incremental vector index if it doesn't exist yet, else
    refresh it from the lake's change feed.  ``compact_every``: fold the
    view (and reclaim superseded generations) whenever the pending
    tombstone-file backlog reaches that many files — the steady-state
    daemon's bounded-read-amplification cadence, mirroring the lake's
    --compact-every."""
    from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
        VectorIndexView,
        _read_view_manifest,
    )

    view = VectorIndexView(pipe, view_dir)
    if _read_view_manifest(view_dir) is None:
        return {"vv_action": "built", **view.build()}
    res = {"vv_action": "refreshed", **view.refresh()}
    if compact_every:
        m = _read_view_manifest(view_dir)
        if len(m.get("tombstone_files", [])) >= compact_every:
            res["compact"] = view.compact()
            res["compact"]["gc"] = view.gc()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--lake", required=True)
    ap.add_argument("--partitions", type=int, default=None,
                    help="partition count when CREATING a lake (default "
                         "128); omitted on an existing lake, its committed "
                         "layout is adopted; given and mismatching, the run "
                         "is refused (repartition via repartition_lake)")
    ap.add_argument("--micro-batches", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip events at/below the committed low-watermark")
    ap.add_argument("--partition-mode", choices=("turn", "conv"),
                    default="turn",
                    help="fresh-lake partition key: (conv,turn) hash or "
                         "conv hash (conv keeps a conversation "
                         "partition-local — required by "
                         "--transcripts-view); an existing lake's "
                         "committed mode is adopted")
    ap.add_argument("--transcripts-view", action="store_true",
                    help="maintain the incremental transcript "
                         "materialization (assembled documents refreshed "
                         "at delta cost) after each micro-batch; needs a "
                         "conv-mode unsalted lake")
    ap.add_argument("--view", action="store_true",
                    help="maintain the incremental per-conversation stats "
                         "view after each micro-batch (<lake>_view)")
    ap.add_argument("--at-timestamp", default=None, metavar="MS_OR_ISO",
                    help="TIMESTAMP AS OF read: unix ms or an ISO-8601 "
                         "datetime (naive = UTC); resolves to the latest "
                         "retained version committed at or before it")
    ap.add_argument("--at-version", type=int, default=None,
                    help="read-only: report row count + retained versions of "
                         "the lake AS OF this manifest version, apply nothing")
    ap.add_argument("--gc", action="store_true",
                    help="remove txn dirs unreferenced by the manifest or "
                         "any retained snapshot, then apply nothing")
    ap.add_argument("--gc-dry-run", action="store_true",
                    help="report what --gc would reclaim, touch nothing")
    ap.add_argument("--history", action="store_true",
                    help="print one summary row per retained manifest "
                         "version (DESCRIBE HISTORY analog; metadata-only), "
                         "apply nothing")
    ap.add_argument("--diff", nargs=2, type=int, default=None,
                    metavar=("V_FROM", "V_TO"),
                    help="print the change feed summary between two "
                         "retained versions (insert/update/delete counts "
                         "via lake_changes — cost scales with the delta, "
                         "only changed partitions are read); add "
                         "--diff-out DIR to also write the change rows")
    ap.add_argument("--scd2-out", default=None, metavar="DIR",
                    help="write the lake's SCD Type-2 history (per-key "
                         "validity intervals at version granularity, "
                         "CDCPipeline.scd2) as parquet and exit")
    ap.add_argument("--diff-out", default=None, metavar="DIR",
                    help="with --diff: write the full change rows "
                         "(post-image payload) as parquet to DIR")
    ap.add_argument("--repartition-to", type=int, default=None,
                    metavar="P",
                    help="rewrite the committed lake under a new partition "
                         "count (distributed read -> reshuffle -> commit; "
                         "the escape hatch when partitions outgrow a merge "
                         "task), then apply nothing")
    ap.add_argument("--auto-repartition", type=int, default=None,
                    metavar="TARGET_ROWS",
                    help="policy form of --repartition-to: re-shard to "
                         "ceil(rows/TARGET_ROWS) partitions only when the "
                         "mean rows/partition drifts beyond 2x the target "
                         "either way (hysteresis band; in-band = "
                         "manifest-only no-op — safe in a maintenance "
                         "loop), then apply nothing")
    ap.add_argument("--cluster-by", default=None, metavar="COLS",
                    help="set the lake's durable base-file clustering "
                         "(comma-separated columns, e.g. 'ts'): one "
                         "exactly-once rewrite in (cluster cols, merge "
                         "key) order; every later writer keeps it, so "
                         "banded reads prune row groups. 'none' clears "
                         "back to merge-key order. Maintenance only "
                         "(--events 0), applies nothing")
    ap.add_argument("--cluster-mode", default="lex",
                    choices=["lex", "zorder"],
                    help="with --cluster-by: lexicographic (default) or "
                         "interleaved zorder (numeric/timestamp columns; "
                         "quantization bounds frozen from footer stats at "
                         "set time, so EVERY clustered column's zone maps "
                         "stay selective)")
    ap.add_argument("--text-index", default=None, metavar="COL",
                    help="durable token skip index: every base write drops "
                         "a per-row-group Bloom of COL's split-on-space "
                         "tokens, so has_token reads (e.g. --delete-where "
                         "text:has_token:word, read_lake where specs) open "
                         "only candidate row groups. 'none' clears. "
                         "Maintenance only (--events 0), one exactly-once "
                         "rewrite")
    ap.add_argument("--embed-dim", type=int, default=0, metavar="D",
                    help="attach a deterministic D-dim embedding value "
                         "column to the generated stream (vector-indexed "
                         "lake traffic; pure function of lsn, NULL on "
                         "tombstones)")
    ap.add_argument("--vector-view", default=None, metavar="DIR",
                    help="maintain an incremental IVF vector index over "
                         "the lake's embedding column at DIR: built once, "
                         "then refreshed from the change feed after every "
                         "commit (appends to frozen-centroid lists + "
                         "generation-bounded tombstones).  Standalone with "
                         "--events 0: build-or-refresh now")
    ap.add_argument("--vector-compact", action="store_true",
                    help="with --vector-view: fold the view's appends + "
                         "tombstones into one base file per centroid "
                         "list, then reclaim the superseded generation "
                         "files")
    ap.add_argument("--vector-compact-every", type=int, default=None,
                    metavar="N",
                    help="with --vector-view: auto-fold the view whenever "
                         "its pending tombstone-file backlog reaches N "
                         "files (the daemon's bounded-read-amplification "
                         "cadence)")
    ap.add_argument("--vector-retrain", type=int, default=None, nargs="?",
                    const=0, metavar="K",
                    help="with --vector-view --events 0: re-train the "
                         "frozen centroids (K lists; omit K to keep the "
                         "committed count) and rebuild every list as one "
                         "generation swap — the view's repartition analog "
                         "for distribution drift; superseded generations "
                         "are gc'd")
    ap.add_argument("--vector-stats", action="store_true",
                    help="with --vector-view --events 0: print the "
                         "metadata-only view health snapshot (per-list "
                         "row counts, skew ratio, pending tombstones)")
    ap.add_argument("--vector-verify", action="store_true",
                    help="with --vector-view: distributed audit that the "
                         "view's live rows equal the lake state at the "
                         "view cursor (per-key lsn included)")
    ap.add_argument("--fanout-to", default=None, metavar="DIR",
                    help="multi-table routing demo (apply_multi): tag the "
                         "generated stream by conv-id parity and fan it "
                         "into TWO lakes — even convs to --lake, odd convs "
                         "to DIR — in one normalize+exchange pass with "
                         "per-lake exactly-once commits")
    ap.add_argument("--clone-to", default=None, metavar="DIR",
                    help="zero-copy shallow clone: an independently "
                         "writable lake at DIR sharing this lake's "
                         "immutable data files (O(txn-dirs) symlinks + "
                         "manifest copies; no data moved)")
    ap.add_argument("--backfill-fill-nulls", default=None,
                    metavar="COL=VALUE",
                    help="distributed UPDATE (transform_lake): rewrite "
                         "every partition's live state filling COL's NULL "
                         "string values with VALUE — one exactly-once "
                         "commit, watermarks untouched, keys/lsns "
                         "contract-checked; combine with --events 0")
    ap.add_argument("--rollback-to", type=int, default=None,
                    help="restore the lake to this retained snapshot as a "
                         "NEW commit (metadata-only; watermarks roll back "
                         "with it so the undone lsn range can be re-tailed), "
                         "then apply nothing")
    ap.add_argument("--dlq", action="store_true",
                    help="quarantine bad events (invalid envelope / unknown "
                         "epoch / unparseable ts) into the lake's dead-letter "
                         "parquet instead of dropping or aborting")
    ap.add_argument("--patch-permille", type=int, default=0,
                    help="emit ~N/1000 of the generated upsert traffic as "
                         "op='patch' partial-column updates (NULL columns "
                         "= unchanged; fold_patch_runs semantics)")
    ap.add_argument("--conv-delete-permille", type=int, default=0,
                    help="emit ~N/1000 of the stream as op='delete_conv' "
                         "conversation tombstones (GDPR-style erasure of "
                         "every turn below the tombstone's lsn)")
    ap.add_argument("--evolve-lang-from", type=int, default=None,
                    metavar="LSN",
                    help="schema-evolution traffic: events carry an extra "
                         "'lang' column set from this lsn on (widen-only "
                         "evolution; the committed lake schema gains the "
                         "column, older rows read NULL)")
    ap.add_argument("--poison-permille", type=int, default=0,
                    help="corrupt ~N per 1000 generated events (op+ts_raw) "
                         "to exercise the dlq path")
    ap.add_argument("--heal-dlq", action="store_true",
                    help="after the applies, guess formats for quarantined "
                         "epochs (suggest_dlq_specs) and reprocess the DLQ")
    ap.add_argument("--stats", action="store_true",
                    help="read-only: print the lake health snapshot "
                         "(rows/bytes/skew/watermark spread/dlq backlog) "
                         "and exit")
    ap.add_argument("--fsck", action="store_true",
                    help="read-only: distributed lake invariant check "
                         "(routing/uniqueness/ordering/watermarks per "
                         "partition); exit 1 if violations are found")
    ap.add_argument("--bootstrap-from", default=None, metavar="PARQUET",
                    help="seed the EMPTY lake from a full-table snapshot "
                         "(parquet path/dir with the lake schema minus lsn) "
                         "before applying any events")
    ap.add_argument("--snapshot-lsn", type=int, default=None,
                    help="binlog position the snapshot is consistent with "
                         "(required with --bootstrap-from); the stream then "
                         "resumes from this position + 1")
    ap.add_argument("--tail-dir", default=None, metavar="DIR",
                    help="apply pending change-event parquet files from DIR "
                         "(footer-stats + sidecar pruning; idempotent) "
                         "instead of generating events")
    ap.add_argument("--follow", action="store_true",
                    help="with --tail-dir: keep polling for new binlog "
                         "files instead of a one-shot pass; exits after "
                         "--max-idle-polls empty polls (0 = forever)")
    ap.add_argument("--poll-interval", type=float, default=2.0,
                    help="--follow poll cadence in seconds")
    ap.add_argument("--max-idle-polls", type=int, default=3,
                    help="--follow exits after this many consecutive empty "
                         "polls (0 = run forever)")
    ap.add_argument("--files-per-batch", type=int, default=16,
                    help="files per exactly-once commit when tailing")
    ap.add_argument("--delta", action="store_true",
                    help="commit micro-batches as merge-on-read DELTA files "
                         "(append-only per-key winners; base parquet "
                         "untouched — write cost ∝ micro-batch, reads fold "
                         "base+deltas until compaction); with --tail-dir, "
                         "the tailer's steady-state mode")
    ap.add_argument("--sync-to", default=None, metavar="DIR",
                    help="after the applies (or standalone with --events "
                         "0), ship everything that changed since DIR's "
                         "last sync as partitioned parquet and advance its "
                         "cursor (first sync = full snapshot; stale cursor "
                         "= automatic re-snapshot)")
    ap.add_argument("--compact-every", type=int, default=8,
                    help="with --tail-dir --delta: fold the delta backlog "
                         "into base files every N commits (bounds read "
                         "amplification)")
    ap.add_argument("--compact", action="store_true",
                    help="fold pending delta files back into base parquet "
                         "(after the applies, or standalone with "
                         "--events 0)")
    ap.add_argument("--pregen", action="store_true",
                    help="materialize the synthetic event stream to parquet "
                         "ONCE before the timer starts, so multi-micro-batch "
                         "throughput measures the ENGINE, not repeated "
                         "stream generation (the generator re-runs per "
                         "batch otherwise)")
    ap.add_argument("--constraint", action="append", default=[],
                    metavar="SPEC",
                    help="commit-time expectation on the normalized event "
                         "(repeatable): col:not_null | col:in:a,b,c | "
                         "col:between:lo,hi | col:matches:regex.  Violations "
                         "drop with a warning, or quarantine under --dlq.  "
                         "Durable: recorded in the manifest and enforced by "
                         "every later writer until replaced; omit the flag "
                         "to adopt the committed set")
    ap.add_argument("--drop-constraints", action="store_true",
                    help="replace the lake's committed constraint set with "
                         "an empty one on the next commit")
    ap.add_argument("--max-delete-fraction", type=float, default=None,
                    metavar="F",
                    help="mass-delete circuit breaker: refuse any commit "
                         "whose tombstone share exceeds F of applied events "
                         "(an upstream TRUNCATE / bad producer filter "
                         "becomes a refused commit, not an emptied lake)")
    ap.add_argument("--delete-where", action="append", default=[],
                    metavar="SPEC",
                    help="distributed DELETE (retention/TTL): remove live "
                         "rows matching the spec (same grammar as "
                         "--constraint; repeatable = OR) as one exactly-"
                         "once commit — e.g. ts:between:,2024-01-01 drops "
                         "rows at or before the cutoff.  Standalone with "
                         "--events 0; no tombstones, watermarks unchanged; "
                         "partitions whose parquet footer stats prove no "
                         "match are skipped unread")
    ap.add_argument("--delete-mode", choices=("rewrite", "dv"),
                    default="rewrite",
                    help="--delete-where tier: 'rewrite' rewrites each "
                         "affected partition's survivors; 'dv' writes a "
                         "deletion vector (small key file subtracted at "
                         "read time, folded away by the next compaction) — "
                         "commit cost ∝ deleted rows, not partition size")
    ap.add_argument("--exchange", choices=("dataset", "actor"),
                    default="dataset",
                    help="partition exchange for the merge: 'dataset' = Ray "
                         "Data shuffle (default, spills, any scale); "
                         "'actor' = persistent push-exchange actor pool, "
                         "created once and reused across every micro-batch "
                         "commit of this run (bounded micro-batches only — "
                         "buffers live in actor heaps)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR",
                 **({"num_cpus": args.num_cpus} if args.num_cpus else {}))
    try:
        from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
        from embulk_filter_timestamp_format_ray.sources.changegen import change_events

        from embulk_filter_timestamp_format_ray.sources.changegen import (
            poison_events,
        )

        if args.constraint and args.drop_constraints:
            raise SystemExit("--constraint and --drop-constraints are "
                             "contradictory")
        from embulk_filter_timestamp_format_ray.pipelines.constraints import (
            parse_constraint,
        )

        # None = adopt the lake's committed set; an explicit list (or the
        # empty tuple from --drop-constraints) replaces it on commit
        constraints = None
        if args.constraint:
            constraints = tuple(parse_constraint(s) for s in args.constraint)
        elif args.drop_constraints:
            constraints = ()
        try:
            # an existing lake's committed layout is adopted; an EXPLICIT
            # mismatching --partitions is refused (the frozen-layout rule —
            # merging under a different layout silently duplicates keys)
            pipe = CDCPipeline.from_lake(
                args.lake, dlq=args.dlq, constraints=constraints,
                max_delete_fraction=args.max_delete_fraction)
            if args.partitions is not None \
                    and args.partitions != pipe.num_partitions:
                raise SystemExit(
                    f"lake {args.lake!r} was committed with "
                    f"num_partitions={pipe.num_partitions} but --partitions="
                    f"{args.partitions} was given; omit the flag to adopt "
                    "the committed layout, or repartition_lake to change it")
        except ValueError:
            if args.fsck:
                # a health check that would "pass" a lake that was never
                # committed (or a mistyped path) masks real failures
                print(json.dumps({"lake": args.lake, "error":
                                  "no committed lake at this path"}))
                return 2
            pipe = CDCPipeline(args.lake,
                               num_partitions=args.partitions or 128,
                               partition_mode=args.partition_mode,
                               dlq=args.dlq,
                               constraints=constraints,
                               max_delete_fraction=args.max_delete_fraction)

        def poison(ds):
            # with --heal-dlq, a third poison band carries a valid-but-
            # unconfigured layout so the healing loop has rows to recover
            ds = poison_events(ds, args.poison_permille,
                               unknown_epoch_band=args.heal_dlq)
            from embulk_filter_timestamp_format_ray.sources.changegen import (
                embed_events,
                evolve_events,
            )

            ds = evolve_events(ds, args.evolve_lang_from)
            if args.embed_dim:
                ds = embed_events(ds, dim=args.embed_dim)
            return ds

        if args.stats:
            print(json.dumps({"lake": args.lake, **pipe.table_stats()}))
            return
        if args.fsck:
            rep = pipe.fsck()
            print(json.dumps({"lake": args.lake, **rep}))
            return 1 if rep["violations"] else None
        if args.bootstrap_from is not None:
            if args.snapshot_lsn is None:
                ap.error("--bootstrap-from requires --snapshot-lsn")
            import ray.data

            boot = pipe.bootstrap(ray.data.read_parquet(args.bootstrap_from),
                                  snapshot_lsn=args.snapshot_lsn)
            print(json.dumps({"bootstrap": boot}))
            if args.events == 0:
                return
        if args.gc or args.gc_dry_run:
            removed = pipe.gc(dry_run=args.gc_dry_run)
            print(json.dumps({"lake": args.lake,
                              "dry_run": bool(args.gc_dry_run),
                              "orphan_txns": removed}))
            return
        if args.history:
            print(json.dumps({"lake": args.lake,
                              "history": pipe.history()}))
            return
        if args.scd2_out is not None:
            hist = pipe.scd2()
            hist.write_parquet(args.scd2_out)
            import ray.data as _rd

            done = _rd.read_parquet(args.scd2_out)
            cur = done.map_batches(
                lambda b: b.filter(b.column("is_current")),
                batch_format="pyarrow", zero_copy_batch=True)
            print(json.dumps({
                "lake": args.lake, "scd2_out": args.scd2_out,
                "versions": pipe.versions(),
                "history_rows": done.count(),
                "current_rows": cur.count(),
            }))
            return
        if args.diff is not None:
            v_from, v_to = args.diff
            cols = ["role", "text", "tool", "ts"] if args.diff_out else None
            feed = pipe.lake_changes(v_from, v_to, columns=cols)
            if args.diff_out:
                feed.write_parquet(args.diff_out)
                feed = ray.data.read_parquet(args.diff_out)
            import pyarrow as _pa  # noqa: F401

            counts = feed.groupby("change_type").count().to_pandas()
            print(json.dumps({
                "lake": args.lake, "v_from": v_from, "v_to": v_to,
                "changes": {str(r["change_type"]): int(r["count()"])
                            for _, r in counts.iterrows()},
                "out": args.diff_out,
            }))
            return
        if args.clone_to is not None:
            res = pipe.clone_lake(args.clone_to)
            print(json.dumps({"lake": args.lake, "clone": res}))
            return
        if args.fanout_to is not None:
            import pyarrow as _pa
            import pyarrow.compute as _pc

            from embulk_filter_timestamp_format_ray.pipelines.cdc import (
                apply_multi,
            )

            from embulk_filter_timestamp_format_ray.state import (
                manifest as _mf,
            )

            # dlq must match across the fan-out (one shared normalize pass)
            other = CDCPipeline.from_lake(args.fanout_to, dlq=args.dlq) \
                if _mf.read_manifest(args.fanout_to).get("version", 0) \
                else CDCPipeline(args.fanout_to, dlq=args.dlq,
                                 num_partitions=pipe.num_partitions)

            def tagged(b):
                digits = _pc.cast(_pc.utf8_slice_codeunits(
                    b.column("conv_id"), 5, 99), _pa.int64())
                tag = _pc.if_else(
                    _pc.equal(_pc.bit_wise_and(digits, 1), 0),
                    _pa.scalar("even"), _pa.scalar("odd"))
                return b.append_column("table", tag)

            ev = poison(change_events(
                args.events, seed=args.seed,
                patch_permille=args.patch_permille,
                conv_delete_permille=args.conv_delete_permille)).map_batches(
                    tagged, batch_format="pyarrow", zero_copy_batch=True)
            t0 = time.perf_counter()
            stats = apply_multi(ev, {"even": pipe, "odd": other},
                                delta=args.delta)
            print(json.dumps({
                "events": args.events,
                "sec": round(time.perf_counter() - t0, 3),
                "lakes": {t: {"applied": s["events_applied"],
                              "quarantined": s.get("events_quarantined", 0),
                              "version": s["version"]}
                          for t, s in stats.items()},
            }))
            return
        if args.backfill_fill_nulls is not None:
            col, sep, val = args.backfill_fill_nulls.partition("=")
            if not sep or not col:
                ap.error("--backfill-fill-nulls takes COL=VALUE")
            import pyarrow.compute as _pc

            def fill(state):
                i = state.schema.get_field_index(col)
                if i < 0:
                    raise SystemExit(
                        f"column {col!r} is not in the lake schema")
                return state.set_column(
                    i, col, _pc.fill_null(state.column(col), val))

            res = pipe.transform_lake(fill)
            print(json.dumps({"lake": args.lake, "backfill": res}))
            return
        if args.repartition_to is not None:
            res = pipe.repartition_lake(args.repartition_to)
            print(json.dumps({"lake": args.lake, "repartition": res,
                              "rows": pipe.read_lake().count()}))
            return
        if args.auto_repartition is not None:
            res = pipe.maybe_repartition(args.auto_repartition)
            print(json.dumps({"lake": args.lake,
                              "auto_repartition": res}))
            return
        if args.cluster_by is not None:
            cols = () if args.cluster_by.lower() in ("none", "") else \
                tuple(c.strip() for c in args.cluster_by.split(","))
            res = pipe.set_clustering(cols, mode=args.cluster_mode)
            print(json.dumps({"lake": args.lake, "cluster": res}))
            return
        if args.text_index is not None:
            col = None if args.text_index.lower() in ("none", "") else \
                args.text_index.strip()
            res = pipe.set_text_index(col)
            print(json.dumps({"lake": args.lake, "text_index": res}))
            return
        if args.vector_view is not None and args.events == 0 \
                and args.tail_dir is None:
            res = _vector_view_sync(pipe, args.vector_view)
            if args.vector_retrain is not None:
                from embulk_filter_timestamp_format_ray.pipelines.vector_view import (  # noqa: E501
                    VectorIndexView,
                )

                vvr = VectorIndexView(pipe, args.vector_view)
                res["retrain"] = vvr.retrain(
                    n_centroids=args.vector_retrain or None)
                res["retrain"]["gc"] = vvr.gc()
            if args.vector_stats:
                from embulk_filter_timestamp_format_ray.pipelines.vector_view import (  # noqa: E501
                    VectorIndexView,
                )

                res["stats"] = VectorIndexView(
                    pipe, args.vector_view).stats()
            if args.vector_compact:
                from embulk_filter_timestamp_format_ray.pipelines.vector_view import (  # noqa: E501
                    VectorIndexView,
                )

                vvc = VectorIndexView(pipe, args.vector_view)
                res["compact"] = vvc.compact()
                res["compact"]["gc"] = vvc.gc()
            if args.vector_verify:
                from embulk_filter_timestamp_format_ray.pipelines.vector_view import (  # noqa: E501
                    VectorIndexView,
                )

                res["verify"] = VectorIndexView(
                    pipe, args.vector_view).verify()
            print(json.dumps({"lake": args.lake,
                              "vector_view": args.vector_view, **res}))
            return 1 if (args.vector_verify
                         and not res["verify"]["ok"]) else None
        if args.delete_where:
            import numpy as _np

            specs = [parse_constraint(s) for s in args.delete_where]

            def selected(state):
                m = _np.zeros(state.num_rows, dtype=bool)
                for c in specs:
                    m |= c.matches(state)
                return m

            res = pipe.delete_where(selected, mode=args.delete_mode,
                                    prune=specs)
            print(json.dumps({"lake": args.lake, "delete_where":
                              args.delete_where,
                              "delete_mode": args.delete_mode, **res}))
            if args.events == 0:
                return
        if args.rollback_to is not None:
            res = pipe.rollback(args.rollback_to)
            print(json.dumps({"lake": args.lake, "rollback": res,
                              "rows": pipe.read_lake().count()}))
            return
        if args.at_version is not None:
            snap = pipe.read_lake_at(args.at_version)
            print(json.dumps({
                "lake": args.lake, "at_version": args.at_version,
                "rows": snap.count(), "versions": pipe.versions(),
            }))
            return
        if args.at_timestamp is not None:
            spec = args.at_timestamp
            try:
                ts_ms = int(spec)
            except ValueError:
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(spec)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                ts_ms = int(dt.timestamp() * 1000)
            v = pipe.version_at(ts_ms)
            snap = pipe.read_lake_at(v)
            print(json.dumps({
                "lake": args.lake, "at_timestamp_unix_ms": ts_ms,
                "resolved_version": v, "rows": snap.count(),
                "versions": pipe.versions(),
            }))
            return
        view = None
        view_refreshes = []
        if args.view:
            from embulk_filter_timestamp_format_ray.pipelines.views import (
                IncrementalView,
            )

            view = IncrementalView(args.lake,
                                   args.lake.rstrip("/") + "_view")
        tview = None
        tview_refreshes = []
        vv_syncs = []
        if args.vector_view is not None and args.events > 0 \
                and not args.embed_dim:
            ap.error("--vector-view over generated traffic needs "
                     "--embed-dim (the stream must carry an embedding "
                     "column to index)")
        if args.transcripts_view:
            from embulk_filter_timestamp_format_ray.pipelines.views import (
                transcript_view,
            )

            tview = transcript_view(args.lake,
                                    args.lake.rstrip("/") + "_tview")
        if args.tail_dir is not None:
            from embulk_filter_timestamp_format_ray.sources.tailer import (
                tail_directory,
            )

            exchange = "dataset"
            if args.exchange == "actor":
                from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
                    ActorExchange,
                )

                # persistent pool: spawned once, reused by every tail commit
                exchange = ActorExchange(pipe.lake_dir, pipe.num_partitions)
            t0 = time.perf_counter()
            if args.follow:
                from embulk_filter_timestamp_format_ray.sources.tailer import (
                    follow_directory,
                )

                # with --sync-to / --transcripts-view, ship changes and
                # refresh the materialization after every non-empty poll —
                # a continuously-mirroring CDC daemon
                def on_commit(_s):
                    if args.sync_to:
                        pipe.sync_changes(args.sync_to)
                    if tview is not None:
                        tview.refresh()
                    if args.vector_view is not None:
                        _vector_view_sync(pipe, args.vector_view,
                                          args.vector_compact_every)
                if not args.sync_to and tview is None \
                        and args.vector_view is None:
                    on_commit = None
                commits = follow_directory(
                    pipe, args.tail_dir,
                    poll_interval=args.poll_interval,
                    idle_polls=args.max_idle_polls,
                    files_per_batch=args.files_per_batch,
                    delta=args.delta, compact_every=args.compact_every,
                    on_commit=on_commit, exchange=exchange)
            else:
                commits = tail_directory(pipe, args.tail_dir,
                                         files_per_batch=args.files_per_batch,
                                         delta=args.delta,
                                         compact_every=args.compact_every,
                                         exchange=exchange)
            out = {
                "tail_dir": args.tail_dir,
                "commits": len(commits),
                "applied": sum(c["events_applied"] for c in commits),
                "quarantined": sum(c.get("events_quarantined", 0)
                                   for c in commits),
                "sec": round(time.perf_counter() - t0, 3),
            }
            if args.delta:
                st = pipe.table_stats()
                out["delta_files"] = st["delta_files"]
                out["delta_rows"] = st["delta_rows"]
            if args.compact:
                out["compact"] = pipe.compact_deltas()
            if args.sync_to:
                out["sync"] = pipe.sync_changes(args.sync_to)
            if tview is not None:
                tview.refresh()  # final catch-up (covers the no-follow path)
                out["view_docs"] = tview.read().count()
            if args.vector_view is not None:
                # final catch-up (covers the no-follow path)
                out["vector_view"] = _vector_view_sync(
                    pipe, args.vector_view, args.vector_compact_every)
            # read AFTER the inline compactions / --compact / --sync-to so
            # the reported version is the manifest's actual head
            out["lake_version"] = mf_version(pipe)
            print(json.dumps(out))
            return
        if (args.compact or args.sync_to) and args.events == 0:
            res = {"lake": args.lake}
            if args.compact:
                res["compact"] = pipe.compact_deltas()
            if args.sync_to:
                res["sync"] = pipe.sync_changes(args.sync_to)
            print(json.dumps(res))
            return
        start_lsn = pipe.resume_lsn() + 1 if args.resume else 0
        per_batch = max((args.events - start_lsn) // args.micro_batches, 1)
        exchange = "dataset"
        if args.exchange == "actor":
            from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
                ActorExchange,
            )

            # ONE pool for the whole run: reused by every micro-batch commit
            exchange = ActorExchange(pipe.lake_dir, pipe.num_partitions)
        pregen_dir = None
        if args.pregen:
            import shutil
            import tempfile

            import ray.data

            pregen_dir = tempfile.mkdtemp(prefix="cdc_pregen_")
            poison(change_events(
                args.events, seed=args.seed,
                patch_permille=args.patch_permille,
                conv_delete_permille=args.conv_delete_permille,
            )).write_parquet(pregen_dir)
        t0 = time.perf_counter()
        total = 0
        quarantined = 0
        for i in range(args.micro_batches):
            if pregen_dir is not None:
                import ray.data

                # block count matched to the session's CPUs — a handful of
                # write-sized blocks under-parallelizes the merge shuffle
                cpus = int(ray.cluster_resources().get("CPU", 8))
                ds = ray.data.read_parquet(pregen_dir,
                                           override_num_blocks=cpus * 2)
            else:
                ds = poison(change_events(
                    args.events, seed=args.seed,
                    patch_permille=args.patch_permille,
                    conv_delete_permille=args.conv_delete_permille))
            # the generator emits the full lsn range; the pipeline's
            # low-watermark prune drops already-committed events, so a resumed
            # run only pays to re-apply the uncommitted suffix
            apply = pipe.apply_delta if args.delta else pipe.apply
            stats = apply(ds, exchange=exchange) \
                if args.micro_batches == 1 else apply(
                ds.filter(
                    expr=f"lsn >= {start_lsn + i * per_batch} and "
                         f"lsn < {start_lsn + (i + 1) * per_batch}"
                    if i < args.micro_batches - 1
                    else f"lsn >= {start_lsn + i * per_batch}"),
                exchange=exchange,
            )
            total += stats["events_applied"]
            quarantined += stats.get("events_quarantined", 0)
            if view is not None:
                view_refreshes.append(view.refresh()["recomputed"])
            if tview is not None:
                tview_refreshes.append(tview.refresh()["recomputed"])
            if args.vector_view is not None:
                vv_syncs.append(_vector_view_sync(
                    pipe, args.vector_view, args.vector_compact_every))
        elapsed = time.perf_counter() - t0
        if pregen_dir is not None:
            import shutil

            shutil.rmtree(pregen_dir, ignore_errors=True)
        out = {
            "events": args.events, "applied": total,
            "sec": round(elapsed, 3),
            "events_per_sec": round(args.events / elapsed, 1),
        }
        if args.delta:
            st = pipe.table_stats()
            out["delta_files"] = st["delta_files"]
            out["delta_rows"] = st["delta_rows"]
        if args.compact:
            out["compact"] = pipe.compact_deltas()
        if args.dlq:
            out["quarantined"] = quarantined
            if args.heal_dlq:
                heal = pipe.reprocess_dlq(epoch_specs=pipe.suggest_dlq_specs())
                out["healed"] = int(heal.get("events_seen", 0)
                                    - heal.get("events_quarantined", 0))
            out["dlq_rows"] = pipe.read_dlq().num_rows
        if view is not None:
            out["view_rows"] = view.read().count()
            out["view_recomputed_per_batch"] = view_refreshes
        if tview is not None:
            out["view_docs"] = tview.read().count()
            out["tview_recomputed_per_batch"] = tview_refreshes
        if args.vector_view is not None:
            out["vector_view"] = {
                "built": sum(1 for s in vv_syncs
                             if s["vv_action"] == "built"),
                "appended_per_batch": [s.get("appended", s.get(
                    "rows_indexed", 0)) for s in vv_syncs],
                "tombstones": sum(s.get("tombstones", 0) for s in vv_syncs),
                "auto_compactions": sum(1 for s in vv_syncs
                                        if "compact" in s),
            }
            if args.vector_compact or args.vector_verify:
                from embulk_filter_timestamp_format_ray.pipelines.vector_view import (  # noqa: E501
                    VectorIndexView,
                )

                vv = VectorIndexView(pipe, args.vector_view)
                if args.vector_compact:
                    out["vector_view"]["compact"] = vv.compact()
                    out["vector_view"]["compact"]["gc"] = vv.gc()
                if args.vector_verify:
                    out["vector_view"]["verify"] = vv.verify()
        if args.sync_to:
            out["sync"] = pipe.sync_changes(args.sync_to)
        if args.evolve_lang_from is not None:
            from embulk_filter_timestamp_format_ray.state import manifest as _mf

            out["schema_columns"] = _mf.read_manifest(
                pipe.lake_dir).get("schema_columns")
        # read AFTER auto-compaction / --compact / --heal-dlq / --sync-to so
        # the reported version is the manifest's actual head
        out["lake_version"] = mf_version(pipe)
        print(json.dumps(out))
    except Exception as e:
        from embulk_filter_timestamp_format_ray.pipelines.cdc import (
            MassDeleteError,
        )

        if not isinstance(e, MassDeleteError):
            raise
        # a refused commit is an OPERATIONAL outcome, not a crash: one
        # parseable line + a distinct exit code for the scheduler
        print(json.dumps({"lake": args.lake, "refused": str(e)}))
        return 3
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
