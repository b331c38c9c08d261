"""Resumable corpus-prep job: documents → filter/dedup → partitioned parquet.

The corpus-side analog of the CDC lake's resumable commit: output is one
parquet file per hash partition plus a manifest listing finished parts.  A
re-run with ``resume=True`` recomputes the (deterministic) pipeline but
skips writing — and thus skips the write bandwidth of — every partition the
manifest already records.  Because every stage is deterministic (seeded
hashes, id-arithmetic sampling), a resumed run produces byte-identical
remaining partitions.

Pipeline: language filter → min-token quality filter → exact dedup
(optionally MinHash near-dup removal) → hash-partition by doc_id → per-
partition sorted parquet.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST = "corpus_manifest.json"


def prepared_corpus(ds, *, min_tokens: int = 10, near_dup: bool = False,
                    near_dup_threshold: float = 0.85,
                    redact_pii: bool = False,
                    max_dup5_x1000: "int | None" = None,
                    eval_ds=None, decontam_threshold_pct: int = 20,
                    dedup_store: "str | None" = None,
                    store_report: "dict | None" = None):
    """documents (doc_id, text) → filtered + deduped corpus Dataset.

    Optional curation passes (all deterministic, so resume stays
    byte-identical): PII redaction (vectorized RE2 scrub), repetition
    filter (drop docs whose duplicated-5-gram mass exceeds
    ``max_dup5_x1000`` per-mille — Gopher rule), and eval-suite
    decontamination against ``eval_ds`` (drop docs with ≥threshold%
    benchmark 5-gram overlap).

    ``dedup_store`` makes the job INCREMENTAL: the first run seeds a
    persistent LSH band store from this corpus; every later run dedups
    its input against everything previously accepted (store collisions
    drop) and appends its survivors — the recurring-ingest corpus shape
    (stages/dedup.py band store; micro-batch contract applies).  When a
    dict is passed as ``store_report`` it receives the probe counts."""
    from embulk_filter_timestamp_format_ray.stages.dedup import (
        dedup_exact,
        dedup_near_duplicates,
    )
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        lang_id_batch,
        redact_pii_batch,
        token_count_batch,
    )

    ds = ds.map_batches(lang_id_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang_pred"), "en"))
        .select(["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_tokens_ws"),
                                            min_tokens))
        .select(["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    if redact_pii:
        ds = ds.map_batches(
            lambda b: redact_pii_batch(b).select(["doc_id", "text"]),
            batch_format="pyarrow", zero_copy_batch=True)
    if max_dup5_x1000 is not None:
        from embulk_filter_timestamp_format_ray.stages.ngrams import (
            repetition_stats_batch,
        )

        def rep_filter(b: pa.Table) -> pa.Table:
            st = repetition_stats_batch(b)  # row-aligned with b
            return b.filter(pc.less_equal(st.column("dup5_x1000"),
                                          max_dup5_x1000))

        ds = ds.map_batches(rep_filter, batch_format="pyarrow",
                            zero_copy_batch=True)
    if eval_ds is not None:
        from embulk_filter_timestamp_format_ray.stages.ngrams import (
            decontaminate,
        )

        ds = decontaminate(ds, eval_ds, k=5,
                           threshold_pct=decontam_threshold_pct,
                           drop=True)
    ds = dedup_exact(ds)
    if near_dup:
        ds = dedup_near_duplicates(ds, threshold=near_dup_threshold)
    if dedup_store is not None:
        import os

        from embulk_filter_timestamp_format_ray.stages.dedup import (
            _BS_SUCCESS,
            build_band_store,
            dedup_against_store,
        )

        if not os.path.exists(os.path.join(dedup_store, _BS_SUCCESS)):
            # first run: this corpus seeds the store (one streaming pass)
            build_band_store(ds, dedup_store)
            if store_report is not None:
                store_report["seeded"] = True
        else:
            ds, rep = dedup_against_store(ds, dedup_store)
            if store_report is not None:
                store_report.update(rep)
    return ds


def write_corpus(ds, out_dir: str, *, num_partitions: int = 16,
                 resume: bool = False, fmt: str = "parquet") -> dict:
    """Write the corpus as one sorted file per doc-id hash partition,
    committing a manifest of finished parts; ``resume`` skips partitions
    the manifest already lists (deterministic pipeline ⇒ identical bytes).
    ``fmt``: "parquet" (zstd) or "jsonl" (newline-delimited records — the
    layout most training loaders consume; serialization via pandas'
    vectorized to_json, one file per partition)."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported corpus format {fmt!r}")
    from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64

    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, MANIFEST)
    done: dict = {}
    if resume and os.path.exists(mpath):
        with open(mpath) as f:
            done = json.load(f).get("parts", {})

    def add_pid(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id").cast(pa.int64())).astype(np.uint64)
        pid = (splitmix64(ids, 3) % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("_pid", pa.array(pid))

    skip = frozenset(int(p) for p in done)

    def write_part(group: pa.Table) -> pa.Table:
        schema = pa.schema([("pid", pa.int64()), ("path", pa.string()),
                            ("rows", pa.int64()), ("skipped", pa.bool_())])
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in schema})
        pid = int(group.column("_pid")[0].as_py())
        ext = "jsonl" if fmt == "jsonl" else "parquet"
        rel = f"part-{pid:05d}.{ext}"
        if pid in skip:
            return pa.Table.from_pylist(
                [{"pid": pid, "path": rel, "rows": 0, "skipped": True}],
                schema=schema)
        g = group.drop_columns(["_pid"])
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        if fmt == "jsonl":
            g.to_pandas().to_json(os.path.join(out_dir, rel),
                                  orient="records", lines=True,
                                  force_ascii=True)
        else:
            pq.write_table(g, os.path.join(out_dir, rel),
                           compression="zstd")
        return pa.Table.from_pylist(
            [{"pid": pid, "path": rel, "rows": g.num_rows, "skipped": False}],
            schema=schema)

    rows = ds.map_batches(add_pid, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("_pid").map_groups(write_part, batch_format="pyarrow") \
        .take_all()  # tiny: ≤ num_partitions manifest rows

    parts = dict(done)
    written = 0
    for r in rows:
        if not r["skipped"]:
            parts[str(r["pid"])] = {"path": r["path"], "rows": int(r["rows"])}
            written += 1
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_partitions": num_partitions, "parts": parts}, f,
                  indent=1, sort_keys=True)
    os.replace(tmp, mpath)
    return {"partitions": len(parts), "written": written,
            "skipped": len(rows) - written,
            "rows": sum(p["rows"] for p in parts.values())}


def packed_sequences(corpus_ds, *, seq_len: int = 512,
                     bucket_size: int = 100_000):
    """Curated corpus (doc_id, text) → concatenated training sequences
    (seq_id, n_parts, text): token counts → distributed prefix-sum packing
    over the NARROW projection → seq_id joined back → ordered per-sequence
    concat.  Deterministic end-to-end, so packed output is resume-safe."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        concat_by_key,
        pack_sequences,
        shuffle_join,
    )
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        doc_token_counts,
    )

    # checkpoint the CURATED corpus once: it feeds both the narrow
    # token-count pass and the join side — without this, the whole
    # curation chain (near-dup, decontamination, ...) executes twice
    corpus_ds = corpus_ds.materialize()
    narrow = doc_token_counts(corpus_ds)
    packed = pack_sequences(narrow, "doc_id", "n_tokens", seq_len=seq_len,
                            bucket_size=bucket_size)
    packed = packed.map_batches(
        lambda b: b.select(["doc_id", "seq_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    tagged = shuffle_join(corpus_ds, packed, on="doc_id", how="inner")
    seqs = concat_by_key(tagged, "seq_id", "doc_id", "text")
    # downstream writers partition by doc_id — expose seq_id under that
    # name (it IS the document id of the packed corpus); text stays
    # large_string (concat_by_key's 2 GiB-offset rationale)
    return seqs.map_batches(
        lambda b: pa.table({"doc_id": b.column("seq_id"),
                            "n_parts": b.column("n_parts"),
                            "text": b.column("text")}),
        batch_format="pyarrow", zero_copy_batch=True)
