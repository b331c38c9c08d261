"""Corpus-prep job CLI: documents parquet → filtered/deduped partitioned
corpus with a resumable manifest.

    python scripts/run_corpus.py --input /root/testdata/sf0.1/documents.parquet \
        --out /tmp/corpus --partitions 16 [--near-dup] [--resume]

Owns its Ray session per the repo contract (only bench.py, CLI entrypoints
and the test fixture may init Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/phones/SSNs before writing")
    ap.add_argument("--max-dup5", type=int, default=None, metavar="PERMILLE",
                    help="drop docs whose duplicated-5-gram mass exceeds "
                         "this per-mille (Gopher repetition rule)")
    ap.add_argument("--decontaminate", default=None, metavar="EVAL_PARQUET",
                    help="parquet of eval docs (doc_id, text); drop train "
                         "docs with >=20%% 5-gram overlap")
    ap.add_argument("--pack", type=int, default=None, metavar="SEQ_LEN",
                    help="emit concatenated training sequences of this "
                         "token budget instead of documents")
    ap.add_argument("--jsonl", action="store_true",
                    help="write newline-delimited JSON parts instead of "
                         "parquet")
    ap.add_argument("--dedup-store", default=None, metavar="DIR",
                    help="persistent LSH band store: the FIRST run seeds it "
                         "from this corpus; later runs drop docs that "
                         "near-duplicate anything previously accepted and "
                         "append their survivors (incremental ingest)")
    ap.add_argument("--compact-store", action="store_true",
                    help="after the job, fold the band store's per-shard "
                         "append pile into one file per shard (the corpus "
                         "analog of the lake's delta compaction)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR",
                 **({"num_cpus": args.num_cpus} if args.num_cpus else {}))
    try:
        import ray.data

        from embulk_filter_timestamp_format_ray.pipelines.corpus import (
            packed_sequences,
            prepared_corpus,
            write_corpus,
        )

        t0 = time.perf_counter()
        ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
        eval_ds = ray.data.read_parquet(
            args.decontaminate, columns=["doc_id", "text"]) \
            if args.decontaminate else None
        store_report = {}
        corpus = prepared_corpus(ds, min_tokens=args.min_tokens,
                                 near_dup=args.near_dup,
                                 redact_pii=args.redact_pii,
                                 max_dup5_x1000=args.max_dup5,
                                 eval_ds=eval_ds,
                                 dedup_store=args.dedup_store,
                                 store_report=store_report)
        if args.pack is not None:
            if args.pack < 1:
                raise SystemExit("--pack requires a positive token budget")
            corpus = packed_sequences(corpus, seq_len=args.pack)
        stats = write_corpus(corpus, args.out,
                             num_partitions=args.partitions,
                             resume=args.resume,
                             fmt="jsonl" if args.jsonl else "parquet")
        stats["sec"] = round(time.perf_counter() - t0, 3)
        if store_report:
            stats["dedup_store"] = store_report
        if args.compact_store:
            if not args.dedup_store:
                raise SystemExit("--compact-store requires --dedup-store")
            from embulk_filter_timestamp_format_ray.stages.dedup import (
                compact_band_store,
            )

            stats["store_compaction"] = compact_band_store(args.dedup_store)
        print(json.dumps(stats))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
