"""Word n-gram operators for training-data curation: decontamination
(eval-set n-gram overlap), Gopher-style repetition statistics, and
rarity-weighted term scoring (tf-idf family).

Scale shapes:
* The gram kernel hashes the whole batch's token stream at once (built on
  ``tokenize_column``'s dictionary-encoded token hashing): per-doc gram
  offsets come from token-count cumsums; the k-fold hash is k vectorized
  splitmix64 passes over shifted views — zero per-document Python.
* Decontamination broadcasts the EVAL gram-hash set once via ``ray.put``
  (eval suites are benchmark-sized — thousands of documents — by nature;
  that assumption is the contract, mirroring ``BroadcastJoinStage``), and
  each train batch tests membership with one ``np.searchsorted`` pass.
* Repetition stats are per-document-independent: one lexsort per batch
  over (doc, gram) finds within-doc gram runs; max-run and duplicated-run
  masses reduce per doc with ``reduceat``.  No shuffle at all.
* Term scoring shuffles once: per-(doc, term) count rows (built by the same
  run trick) → sharded DF aggregate; the vocabulary-sized DF table is
  broadcast back for the per-doc ranking pass (Zipf: vocab ≪ corpus).

All ratios are emitted as integer-exact scaled values (``(a * 1000) // b``)
so the DuckDB oracles replay them bit-for-bit — repo rule: never
hash-compare floats (DESIGN.md #17).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64
from embulk_filter_timestamp_format_ray.stages.dedup import (
    token_stream,
    tokenize_column,
)

logger = logging.getLogger(__name__)


def word_ngram_hashes(text: "pa.Array | pa.ChunkedArray", k: int):
    """Hash every word k-gram of every document in one vectorized pass.

    Returns ``(gh, ng, doc_of_g)``: flat uint64 gram hashes in document
    order, per-document gram counts (int64, ``max(n_tokens - k + 1, 0)``),
    and the owning document index of each flat gram.  Equal token sequences
    hash equal; different sequences collide with ~2^-64 probability (the
    fold salts each position, so grams are order-sensitive)."""
    tok_hash, cnt = tokenize_column(text)
    n_docs = len(cnt)
    ng = np.maximum(cnt - (k - 1), 0)
    total_g = int(ng.sum())
    if total_g == 0:
        return (np.empty(0, dtype=np.uint64), ng,
                np.empty(0, dtype=np.int64))
    tok_start = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(cnt[:-1], out=tok_start[1:])
    g_start = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(ng[:-1], out=g_start[1:])
    doc_of_g = np.repeat(np.arange(n_docs, dtype=np.int64), ng)
    within = np.arange(total_g, dtype=np.int64) - g_start[doc_of_g]
    pos0 = tok_start[doc_of_g] + within
    gh = np.zeros(total_g, dtype=np.uint64)
    for j in range(k):
        gh = splitmix64(gh ^ tok_hash[pos0 + j], 77 + j)
    return gh, ng, doc_of_g


def _gram_runs(gh: np.ndarray, doc_of_g: np.ndarray, n_docs: int):
    """Within-document gram runs: one lexsort by (doc, gram), then run
    boundaries.  Returns ``(run_doc, run_cnt, doc_first_run)`` where
    ``doc_first_run`` maps doc → index of its first run (searchsorted;
    docs with zero grams map onto the next doc's slot — callers must mask
    with ``ng > 0``)."""
    order = np.lexsort((gh, doc_of_g))
    d, g = doc_of_g[order], gh[order]
    starts = np.ones(len(g), dtype=bool)
    starts[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
    run_idx = np.nonzero(starts)[0]
    run_doc = d[run_idx]
    run_cnt = np.diff(np.r_[run_idx, len(g)])
    doc_first_run = np.searchsorted(run_doc, np.arange(n_docs))
    return run_doc, run_cnt, doc_first_run


# ------------------------------------------------------------- repetition


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition features per document (public Rae et al.
    2021 quality rules, re-expressed over word n-grams):

    * ``top2_x1000``  — occurrences of the most frequent 2-gram as a
      per-mille of all 2-gram occurrences (integer floor division).
    * ``dup5_x1000``  — per-mille of 5-gram occurrences whose gram occurs
      more than once within the document.

    Both are 0 for documents too short to have grams."""
    text = batch.column(text_col)
    n_docs = batch.num_rows
    out = {id_col: batch.column(id_col)}
    for k, mode, nm_n, nm_s in ((2, "top", "n_grams_2", "top2_x1000"),
                                (5, "dup", "n_grams_5", "dup5_x1000")):
        gh, ng, doc_of_g = word_ngram_hashes(text, k)
        stat = np.zeros(n_docs, dtype=np.int64)
        if len(gh):
            run_doc, run_cnt, first = _gram_runs(gh, doc_of_g, n_docs)
            has = ng > 0
            if mode == "top":
                per_doc = np.maximum.reduceat(run_cnt, first[has]) \
                    if has.any() else np.empty(0, dtype=np.int64)
            else:
                dup_mass = np.where(run_cnt > 1, run_cnt, 0)
                per_doc = np.add.reduceat(dup_mass, first[has]) \
                    if has.any() else np.empty(0, dtype=np.int64)
            stat[has] = (per_doc * 1000) // ng[has]
        out[nm_n] = pa.array(ng, type=pa.int64())
        out[nm_s] = pa.array(stat, type=pa.int64())
    return pa.table(out)


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level repetition statistics — purely per-batch, no shuffle."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------- decontamination


def build_eval_gram_set(ds, text_col: str = "text", k: int = 5) -> np.ndarray:
    """Distinct gram hashes of the EVAL dataset as a sorted int64 array.

    The driver collects only the deduplicated hashes — bounded by the eval
    suite's size (benchmarks are small by construction), not the corpus."""
    import ray

    def uniq(b: pa.Table) -> pa.Table:
        gh, _, _ = word_ngram_hashes(b.column(text_col), k)
        return pa.table({"gh": pa.array(np.unique(gh).astype(np.int64))})

    part = ds.map_batches(uniq, batch_format="pyarrow", zero_copy_batch=True)
    tbls = [ray.get(r) for r in part.to_arrow_refs()]
    merged = pa.concat_tables([t for t in tbls if t.num_rows] or
                              [pa.table({"gh": pa.array([], pa.int64())})])
    return np.unique(np.asarray(merged.column("gh")))


class DecontaminateStage:
    """map_batches: flag train documents whose word-k-gram occurrences
    overlap an eval suite's gram set at/above ``threshold_pct`` percent.

    The sorted eval hash array rides the object store (``ray.put`` once);
    each worker binds it in ``__init__``-equivalent lazy state and tests a
    whole batch's grams with one searchsorted."""

    def __init__(self, eval_ref, k: int = 5, threshold_pct: int = 20,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.eval_ref = eval_ref  # ray.ObjectRef | np.ndarray (sorted int64)
        self.k = k
        self.threshold_pct = threshold_pct
        self.text_col = text_col
        self.id_col = id_col
        self._eval = None

    def _eval_arr(self) -> np.ndarray:
        if self._eval is None:
            from embulk_filter_timestamp_format_ray.stages.relational import (
                resolve_broadcast,
            )

            self._eval = np.asarray(resolve_broadcast(self.eval_ref),
                                    dtype=np.int64)
        return self._eval

    def __call__(self, batch: pa.Table) -> pa.Table:
        ev = self._eval_arr()
        gh, ng, doc_of_g = word_ngram_hashes(batch.column(self.text_col),
                                             self.k)
        n_docs = batch.num_rows
        n_cont = np.zeros(n_docs, dtype=np.int64)
        if len(gh) and len(ev):
            sgh = gh.astype(np.int64)
            pos = np.searchsorted(ev, sgh)
            pos[pos == len(ev)] = 0
            hit = ev[pos] == sgh
            np.add.at(n_cont, doc_of_g, hit.astype(np.int64))
        flag = ((ng > 0) &
                (n_cont * 100 >= ng * self.threshold_pct)).astype(np.int64)
        # append (don't project) so compositions keep their payload columns
        return batch \
            .append_column("n_grams", pa.array(ng, type=pa.int64())) \
            .append_column("n_contaminated",
                           pa.array(n_cont, type=pa.int64())) \
            .append_column("contaminated", pa.array(flag, type=pa.int64()))


def decontaminate(train_ds, eval_ds, *, k: int = 5, threshold_pct: int = 20,
                  text_col: str = "text", id_col: str = "doc_id",
                  drop: bool = False):
    """Flag (or drop) train documents contaminated by an eval suite.

    Builds the eval gram set once, broadcasts it, and runs one stateless
    membership pass over the train corpus.  ``drop=True`` keeps only the
    clean documents (composition form for corpus-prep pipelines)."""
    import ray

    ev = build_eval_gram_set(eval_ds, text_col=text_col, k=k)
    ref = ray.put(ev) if ray.is_initialized() else ev
    flagged = train_ds.map_batches(
        DecontaminateStage(ref, k=k, threshold_pct=threshold_pct,
                           text_col=text_col, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    if not drop:
        return flagged.map_batches(
            lambda b: b.select([id_col, "n_grams", "n_contaminated",
                                "contaminated"]),
            batch_format="pyarrow", zero_copy_batch=True)
    return flagged.map_batches(
        lambda b: b.filter(pc.equal(b.column("contaminated"), 0))
        .drop_columns(["n_grams", "n_contaminated", "contaminated"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------- term scoring


def doc_term_count_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Per-(document, term) occurrence rows: (doc_id, term, cnt, n_tokens).

    One dictionary-encode + lexsort per batch; terms come back as strings
    via the batch vocabulary (small), never a per-token Python loop."""
    text = batch.column(text_col)
    n_docs = batch.num_rows
    tok, parent, cnt_per_doc = token_stream(text)
    enc = pc.dictionary_encode(tok)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices.cast(pa.int64())) if len(tok) else \
        np.empty(0, dtype=np.int64)
    order = np.lexsort((codes, parent))
    d, c = parent[order], codes[order]
    starts = np.ones(len(c), dtype=bool)
    starts[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    run_idx = np.nonzero(starts)[0]
    run_cnt = np.diff(np.r_[run_idx, len(c)])
    run_doc, run_code = d[run_idx], c[run_idx]
    ids = batch.column(id_col).combine_chunks() \
        if isinstance(batch.column(id_col), pa.ChunkedArray) \
        else batch.column(id_col)
    return pa.table({
        id_col: ids.take(pa.array(run_doc)),
        "term": enc.dictionary.take(pa.array(run_code)),
        "cnt": pa.array(run_cnt.astype(np.int64)),
        "n_tokens": pa.array(cnt_per_doc[run_doc]),
    })


def term_df(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Document frequency per term (vocabulary-sized result): per-batch
    (doc, term) rows → sharded count aggregate."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    rows = ds.map_batches(
        lambda b: doc_term_count_batch(b, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(rows, ["term"], {"df": ("term", "count")})


# Vocabulary-row bound below which the DF table broadcasts to every worker
# (one ray.put + per-batch index_in).  Above it the vocabulary never touches
# the driver: DF stays a Dataset and attaches via a term-sharded shuffle join
# (two-tier dispatch, same shape as dedup_near_duplicates' pair bound).
TFIDF_BROADCAST_VOCAB_ROWS = 2_000_000


def tfidf_top_terms(ds, *, top_k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id",
                    broadcast_vocab_rows: int = TFIDF_BROADCAST_VOCAB_ROWS):
    """Top characteristic terms per document by rarity-weighted frequency.

    Score is the integer-exact tf/df form ``cnt * 1_000_000 //
    (df * n_tokens)`` — the idf factor is 1/df rather than log(N/df) so the
    DuckDB oracle replays the ranking bit-for-bit (never hash floats,
    DESIGN.md #17); a float log-idf column would rank near-ties
    differently across engines.  Ties break by term ascending.

    Shape: one DF shuffle (vocabulary-sized output) materialized in the
    OBJECT STORE (spillable, never a driver collect).  The tier dispatch
    then reads the materialized row count (metadata, free):

    - vocab ≤ ``broadcast_vocab_rows``: DF broadcasts back via ``ray.put``
      and each batch ranks its own docs locally (one pass, no second
      exchange).
    - vocab above the bound (hapax-heavy web corpora — billions of distinct
      terms): DF is attached by a term-sharded ``shuffle_join`` and the
      per-doc ranking runs through ``top_k_by_group`` (doc-sharded
      exchange carrying ≤ top_k rows per doc per block).  The vocabulary
      never materializes on any single node.

    Both tiers produce identical rows (parity pytest forces the join tier
    on the same input and compares sorted outputs)."""
    import ray

    df_ds = term_df(ds, text_col, id_col).materialize()
    vocab_rows = df_ds.count()
    if vocab_rows > broadcast_vocab_rows:
        logger.info(
            "tfidf_top_terms: vocabulary %d rows > broadcast bound %d — "
            "using the distributed DF-join tier", vocab_rows,
            broadcast_vocab_rows)
        return _tfidf_top_terms_joined(ds, df_ds, top_k=top_k,
                                       text_col=text_col, id_col=id_col)

    df_tbl = pa.Table.from_pandas(df_ds.to_pandas())
    df_map_ref = ray.put(df_tbl) if ray.is_initialized() else df_tbl

    class _Rank:
        def __init__(self):
            self._df = None

        def _df_tbl(self) -> pa.Table:
            if self._df is None:
                from embulk_filter_timestamp_format_ray.stages.relational \
                    import resolve_broadcast

                self._df = resolve_broadcast(df_map_ref)
            return self._df

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = doc_term_count_batch(batch, text_col, id_col)
            dft = self._df_tbl()
            idx = pc.index_in(
                rows.column("term"),
                value_set=dft.column("term").combine_chunks())
            dfv = np.asarray(dft.column("df").combine_chunks().take(idx)
                             .cast(pa.int64()))
            cnt = np.asarray(rows.column("cnt"))
            ntok = np.asarray(rows.column("n_tokens"))
            score = (cnt * 1_000_000) // (dfv * np.maximum(ntok, 1))
            doc = rows.column(id_col).combine_chunks()
            dv = np.asarray(doc.cast(pa.int64()))
            term = rows.column("term").combine_chunks()
            enc = pc.dictionary_encode(term)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = np.asarray(enc.indices.cast(pa.int64()))
            # tie-break must be the term STRING ascending, and dictionary
            # codes are in first-appearance order — map code → alpha rank
            alpha = np.asarray(pc.sort_indices(enc.dictionary))
            t_rank = np.empty(len(alpha), dtype=np.int64)
            t_rank[alpha] = np.arange(len(alpha))
            # rank within doc by (-score, term): lexsort minor→major
            order = np.lexsort((t_rank[codes] if len(codes) else codes,
                                -score, dv))
            dsorted = dv[order]
            starts = np.ones(len(dsorted), dtype=bool)
            starts[1:] = dsorted[1:] != dsorted[:-1]
            seg_start = np.nonzero(starts)[0]
            rank = np.arange(len(dsorted)) - np.repeat(
                seg_start, np.diff(np.r_[seg_start, len(dsorted)]))
            keep = order[rank < top_k]
            out = pa.table({
                id_col: doc.take(pa.array(keep)),
                "term": term.take(pa.array(keep)),
                "cnt": rows.column("cnt").combine_chunks().take(pa.array(keep)),
                "df": pa.array(dfv[keep]),
                "score_ppm": pa.array(score[keep]),
            })
            return out

    return ds.map_batches(_Rank, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=4)


def _tfidf_top_terms_joined(ds, df_ds, *, top_k: int, text_col: str,
                            id_col: str):
    """Beyond-broadcast tfidf tier: the vocabulary stays distributed.

    (doc, term, cnt, n_tokens) rows shuffle-join the materialized DF
    Dataset on term (native hash join — the right side is provably NOT
    broadcastable here, so auto-broadcast is disabled), the integer score
    computes per batch, and ``top_k_by_group`` ranks per doc with the same
    (-score, term ascending) order as the broadcast tier.  The input re-
    scans once for the row stream (input-sized lineage re-scan, DESIGN
    #31); only the materialized DF avoids re-execution."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        shuffle_join,
        top_k_by_group,
    )

    rows = ds.map_batches(
        lambda b: doc_term_count_batch(b, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = shuffle_join(rows, df_ds, on="term",
                          auto_broadcast_bytes=None)

    def _np64(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.asarray(col.cast(pa.int64()))

    def score_batch(b: pa.Table) -> pa.Table:
        cnt = _np64(b.column("cnt"))
        ntok = _np64(b.column("n_tokens"))
        dfv = _np64(b.column("df"))
        score = (cnt * 1_000_000) // (dfv * np.maximum(ntok, 1))
        return b.append_column("score_ppm", pa.array(score))

    scored = joined.map_batches(score_batch, batch_format="pyarrow",
                                zero_copy_batch=True)
    ranked = top_k_by_group(scored, [id_col], "score_ppm", top_k,
                            descending=True, tie_col="term")
    return ranked.map_batches(
        lambda b: b.select([id_col, "term", "cnt", "df", "score_ppm"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------- heavy hitters


def heavy_hitter_words(ds, threshold: int, *, text_col: str = "text",
                       depth: int = 4, width: int = 1 << 14):
    """Exact corpus-wide heavy hitters (words with total count ≥
    ``threshold``) WITHOUT a full-vocabulary group-by — the sketch-then-
    verify shape for vocabularies too large to shuffle:

    1. **Sketch pass**: each batch folds its token stream into per-(row,
       bucket) partial counts (``depth`` hash rows × ``width`` buckets);
       one ``grouped_aggregate`` over ≤ depth×width keys merges them —
       the shuffle carries sketch cells, never words.
    2. **Fused nominate+count pass**: the merged sketch (a few MB)
       broadcasts back; each batch keeps its distinct words whose
       Count-Min estimate (min over rows) reaches the threshold — the
       candidate set is identical in every batch because the sketch is
       global — and emits those words' LOCAL counts in the same pass.
       One sharded aggregate then yields exact totals.  CMS never
       underestimates, so no true heavy hitter is lost; collisions only
       add false candidates that the final exact filter drops.

    Output: (word, n) with exact n ≥ threshold — identical to the naive
    ``GROUP BY word HAVING count(*) ≥ T`` (the SQL oracle)."""
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    def sketch_partial(b: pa.Table) -> pa.Table:
        tok_hash, _ = tokenize_column(b.column(text_col))
        rows, buckets, counts = [], [], []
        for j in range(depth):
            hj = splitmix64(tok_hash, 1000 + j) % np.uint64(width)
            cnt = np.bincount(hj.astype(np.int64), minlength=width)
            nz = np.nonzero(cnt)[0]
            rows.append(np.full(len(nz), j, dtype=np.int64))
            buckets.append(nz)
            counts.append(cnt[nz])
        return pa.table({
            "row": pa.array(np.concatenate(rows) if rows else
                            np.empty(0, dtype=np.int64)),
            "bucket": pa.array(np.concatenate(buckets).astype(np.int64)),
            "cnt": pa.array(np.concatenate(counts).astype(np.int64)),
        })

    cells = grouped_aggregate(
        ds.map_batches(sketch_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["row", "bucket"], {"cnt": ("cnt", "sum")}).to_pandas()
    sketch = np.zeros((depth, width), dtype=np.int64)
    sketch[cells["row"].to_numpy(), cells["bucket"].to_numpy()] = \
        cells["cnt"].to_numpy()
    sref = ray.put(sketch) if ray.is_initialized() else sketch

    class _CandidateCounts:
        """Fused nominate + local count: the GLOBAL sketch is broadcast,
        so every batch derives the identical candidate set independently —
        no driver-side candidate collection, and the verify counts ride
        the same pass."""

        def __init__(self):
            self._s = None

        def _sketch(self):
            if self._s is None:
                from embulk_filter_timestamp_format_ray.stages.relational \
                    import resolve_broadcast

                self._s = resolve_broadcast(sref)
            return self._s

        def __call__(self, b: pa.Table) -> pa.Table:
            s = self._sketch()
            rows = doc_term_count_batch(b, text_col=text_col,
                                        id_col=b.schema.names[0])
            terms = rows.column("term").combine_chunks()
            uniq = pc.unique(terms)
            empty = pa.table({"word": pa.array([], pa.string()),
                              "cnt": pa.array([], pa.int64())})
            if len(uniq) == 0:
                return empty
            # vocab-sized hash loop (same contract as tokenize_column)
            from embulk_filter_timestamp_format_ray.stages.dedup import (
                det_hash_str,
            )

            uh = np.array([det_hash_str(w) for w in uniq.to_pylist()],
                          dtype=np.uint64)
            est = np.full(len(uh), np.iinfo(np.int64).max, dtype=np.int64)
            for j in range(depth):
                hj = (splitmix64(uh, 1000 + j)
                      % np.uint64(width)).astype(np.int64)
                est = np.minimum(est, s[j][hj])
            cand = uniq.filter(pa.array(est >= threshold))
            if len(cand) == 0:
                return empty
            kept = rows.filter(pc.is_in(rows.column("term"),
                                        value_set=cand))
            return pa.table({"word": kept.column("term"),
                             "cnt": kept.column("cnt")})

    exact = grouped_aggregate(
        ds.map_batches(_CandidateCounts, batch_format="pyarrow",
                       zero_copy_batch=True, concurrency=4),
        ["word"], {"n": ("cnt", "sum")})
    return exact.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), threshold)),
        batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- source overlap


def source_gram_overlap(ds, *, k: int = 5, text_col: str = "text",
                        group_col: str = "source"):
    """Pairwise cross-source overlap matrix: for every source pair, how
    many DISTINCT word-k-grams they share — the "who copied whom" report
    that decides which sources need decontamination against each other.

    Shape: per-batch (gram-hash, source) rows dedup locally, ONE gram-hash
    shard exchange globally dedups and finds each gram's source set (a run
    after one sort), pairs emit per run via cached upper-triangle indices
    (runs are bounded by the SOURCE count — tens — so the per-length loop
    is over run-length classes, not grams), and a final tiny aggregate
    counts pairs.  Gram text never moves — only 8-byte hashes."""
    from embulk_filter_timestamp_format_ray.stages.dedup import (
        N_BUCKET_SHARDS,
        _triu,
    )
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    def gram_source(b: pa.Table) -> pa.Table:
        gh, _, doc_of_g = word_ngram_hashes(b.column(text_col), k)
        src = b.column(group_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices.cast(pa.int64()))[doc_of_g]
        # local distinct (gram, source)
        order = np.lexsort((codes, gh))
        g_s, c_s = gh[order], codes[order]
        keep = np.ones(len(g_s), dtype=bool)
        keep[1:] = (g_s[1:] != g_s[:-1]) | (c_s[1:] != c_s[:-1])
        gk, ck = g_s[keep], c_s[keep]
        shard = (gk % np.uint64(N_BUCKET_SHARDS)).astype(np.int32)
        return pa.table({
            "gh": pa.array(gk.astype(np.int64)),
            group_col: enc.dictionary.take(pa.array(ck)),
            "_shard": pa.array(shard),
        })

    rows = ds.map_batches(gram_source, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pairs_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        empty = pa.table({"source_a": pa.array([], pa.string()),
                          "source_b": pa.array([], pa.string())})
        if g.num_rows == 0:
            return empty
        src = g.column(group_col).combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # alphabetical codes so source_a < source_b lexicographically
        alpha = np.asarray(pc.sort_indices(enc.dictionary))
        rank = np.empty(len(alpha), dtype=np.int64)
        rank[alpha] = np.arange(len(alpha))
        codes = rank[np.asarray(enc.indices.cast(pa.int64()))]
        gh = np.asarray(g.column("gh"))
        order = np.lexsort((codes, gh))
        g_s, c_s = gh[order], codes[order]
        keep = np.ones(len(g_s), dtype=bool)  # global distinct
        keep[1:] = (g_s[1:] != g_s[:-1]) | (c_s[1:] != c_s[:-1])
        g_s, c_s = g_s[keep], c_s[keep]
        starts = np.nonzero(np.r_[True, g_s[1:] != g_s[:-1]])[0]
        lens = np.diff(np.r_[starts, len(g_s)])
        a_all, b_all = [], []
        for m in np.unique(lens):  # run-LENGTH classes ≤ #sources
            if m < 2:
                continue
            st = starts[lens == m]
            ti, tj = _triu(int(m))
            a_all.append((st[:, None] + ti[None, :]).ravel())
            b_all.append((st[:, None] + tj[None, :]).ravel())
        if not a_all:
            return empty
        ai = np.concatenate(a_all)
        bi = np.concatenate(b_all)
        sorted_dict = enc.dictionary.take(pa.array(alpha))
        return pa.table({
            "source_a": sorted_dict.take(pa.array(c_s[ai])),
            "source_b": sorted_dict.take(pa.array(c_s[bi])),
        })

    pair_rows = rows.groupby("_shard").map_groups(pairs_shard,
                                                  batch_format="pyarrow")
    return grouped_aggregate(pair_rows, ["source_a", "source_b"],
                             {"shared_grams": ("source_a", "count")})


# ------------------------------------------------------------------ BM25


def _corpus_stats(ds, text_col: str) -> "tuple[int, int]":
    """(n_docs, total_tokens) over the corpus — one map_batches partial
    (one 2-scalar row per block) folded on the driver (aggregate-sized)."""
    def partial(b: pa.Table) -> pa.Table:
        _, _, cnt_per_doc = token_stream(b.column(text_col))
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "total": pa.array([int(cnt_per_doc.sum())], pa.int64())})

    n_docs = 0
    total = 0
    for t in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow", batch_size=None):
        n_docs += int(pc.sum(t.column("n")).as_py() or 0)
        total += int(pc.sum(t.column("total")).as_py() or 0)
    return n_docs, total


def bm25_topk(ds, query_terms, *, k: int = 10, text_col: str = "text",
              id_col: str = "doc_id"):
    """BM25-style ranked retrieval: top-k documents for a bag of query
    terms, scored integer-exact so a SQL oracle replays the ranking
    bit-for-bit (DESIGN #17 — never hash floats):

    * rarity weight = the un-logged BM25 idf ratio
      ``(N - df + 0.5)/(df + 0.5)`` cleared of fractions —
      ``(1000*(2N - 2df + 1)) // (2df + 1)`` (log-free for cross-engine
      exactness, same rationale as tfidf_top_terms' 1/df);
    * tf saturation = classic k1=1.2 / b=0.75 BM25, fractions cleared by
      multiplying through by ``10*total``:
      ``(1000*22*tf*total) // (10*tf*total + 3*total + 9*dl*N)``;
    * doc score = SUM of the per-term floored components (int64; the
      intermediate ``22000*tf*total`` bounds the corpus at ~4e13 tokens
      per tf unit — beyond that, shift the 1000 scale down).

    Shape: pass 1 folds corpus stats to two scalars; pass 2 tokenizes and
    keeps only the query terms' postings (|Q| terms broadcast in the
    closure) and aggregates df (|Q| rows); pass 3 re-derives the postings
    (input-sized data re-scans — DESIGN #31), scores each posting
    vectorized, doc-shard-sums, and takes local-then-final top-k (each
    block ships ≤ k rows to the single final reduce)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    terms = sorted(set(query_terms))
    n_docs, total = _corpus_stats(ds, text_col)

    def postings(b: pa.Table) -> pa.Table:
        rows = doc_term_count_batch(b, text_col, id_col)
        return rows.filter(pc.is_in(rows.column("term"),
                                    value_set=pa.array(terms, pa.string())))

    posts = ds.map_batches(postings, batch_format="pyarrow",
                           zero_copy_batch=True)
    df_map = _bm25_df(posts)
    # second pass re-derives the postings (input re-scans — DESIGN #31)
    posts2 = ds.map_batches(postings, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _bm25_rank(posts2, terms, df_map, n_docs, total, k=k,
                      id_col=id_col, tf_col="cnt", dl_col="n_tokens")


def _bm25_df(posts_ds) -> "dict[str, int]":
    """Document frequency per query term from (doc, term)-unique postings
    rows (|Q|-sized result)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    df_tbl = pa.concat_tables(
        grouped_aggregate(posts_ds, ["term"], {"df": ("term", "count")})
        .iter_batches(batch_format="pyarrow", batch_size=None))
    return {r["term"]: int(r["df"]) for r in df_tbl.to_pylist()}


def _bm25_rank(posts_ds, terms, df_map, n_docs: int, total: int, *,
               k: int, id_col: str, tf_col: str, dl_col: str):
    """Shared BM25 scoring tail (see bm25_topk's formula docstring): score
    each posting vectorized, doc-shard-sum, local-then-final top-k.  Used
    by the tokenize-on-the-fly and on-disk-postings-index paths — both
    must produce identical integers."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    w_idf = {t: (1000 * (2 * n_docs - 2 * df + 1)) // (2 * df + 1)
             for t, df in df_map.items()}

    def score_components(rows: pa.Table) -> pa.Table:
        if rows.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "comp": pa.array([], pa.int64())})
        tf = np.asarray(rows.column(tf_col).combine_chunks()
                        .cast(pa.int64()))
        dl = np.asarray(rows.column(dl_col).combine_chunks()
                        .cast(pa.int64()))
        idf_by_term = np.array([w_idf.get(t, 0) for t in terms],
                               dtype=np.int64)  # |Q|-sized, built per batch
        pos = pc.index_in(rows.column("term"),
                          value_set=pa.array(list(terms), pa.string()))
        idf = idf_by_term[np.asarray(pos.combine_chunks().cast(pa.int64()))]
        w_tf = (1000 * 22 * tf * total) // (
            10 * tf * total + 3 * total + 9 * dl * n_docs)
        return pa.table({id_col: rows.column(id_col).cast(pa.int64()),
                         "comp": pa.array(idf * w_tf)})

    scored = grouped_aggregate(
        posts_ds.map_batches(score_components, batch_format="pyarrow",
                             zero_copy_batch=True),
        [id_col], {"score": ("comp", "sum")})

    def local_topk(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
        return b.take(order).slice(0, k)

    def final_topk(b: pa.Table) -> pa.Table:
        g = local_topk(b)
        return g.append_column(
            "rank", pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)))

    return (scored.map_batches(local_topk, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1)
            .map_batches(final_topk, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


# ------------------------------------------------- on-disk postings index


POSTINGS_SHARDS = 64


def build_postings_index(ds, index_dir: str, *, shards: int = POSTINGS_SHARDS,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Materialize an on-disk POSTINGS (inverted) index for BM25 — the
    sparse-retrieval analog of ``stages/ann.py build_ivf_index``.

    Layout::

        index_dir/postings/term_shard=<s>/*.parquet  (id_col, term, tf, dl)
        index_dir/params.json   (n_docs, total_tokens, shards, columns)
        index_dir/_SUCCESS

    ONE tokenize pass: each block fans its (doc, term) rows into
    term-hash shard files locally (hive-style ``partition_cols`` write —
    nothing shuffles); a query later opens ONLY its terms' shards, so
    query cost is postings-sized, independent of corpus size.  Sharding
    uses the deterministic ``det_hash_str`` (never process-seeded
    ``hash()``)."""
    import json
    import os

    from embulk_filter_timestamp_format_ray.stages.dedup import det_hash_str

    n_docs, total = _corpus_stats(ds, text_col)

    def post(b: pa.Table) -> pa.Table:
        rows = doc_term_count_batch(b, text_col, id_col)
        terms_col = rows.column("term").combine_chunks()
        enc = pc.dictionary_encode(terms_col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()  # per-batch vocabulary (small)
        shard_of = np.array([det_hash_str(t) % shards for t in vocab],
                            dtype=np.int32)
        sh = shard_of[np.asarray(enc.indices.cast(pa.int64()))] \
            if rows.num_rows else np.empty(0, np.int32)
        return pa.table({
            id_col: rows.column(id_col).cast(pa.int64()),
            "term": terms_col,
            "tf": rows.column("cnt").cast(pa.int64()),
            "dl": rows.column("n_tokens").cast(pa.int64()),
            "term_shard": pa.array(sh),
        })

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(post, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["term_shard"])
    with open(os.path.join(index_dir, "params.json"), "w") as f:
        json.dump({"n_docs": n_docs, "total_tokens": total,
                   "shards": shards, "id_col": id_col}, f)
    open(os.path.join(index_dir, "_SUCCESS"), "w").close()
    return index_dir


def bm25_topk_indexed(index_dir: str, query_terms, *, k: int = 10):
    """BM25 top-k served from a ``build_postings_index`` artifact: opens
    ONLY the query terms' shard directories (|Q| of ``shards`` — the read
    itself prunes, like the IVF probe), filters to the exact terms, then
    the SHARED scoring tail — bit-identical to ``bm25_topk`` over the
    same corpus (parity pytest)."""
    import json
    import os

    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import det_hash_str

    with open(os.path.join(index_dir, "params.json")) as f:
        params = json.load(f)
    shards, id_col = int(params["shards"]), params["id_col"]
    terms = sorted(set(query_terms))
    need = sorted({det_hash_str(t) % shards for t in terms})
    dirs = [os.path.join(index_dir, "postings", f"term_shard={s}")
            for s in need]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))

    def only_terms(b: pa.Table) -> pa.Table:
        b = b.select([id_col, "term", "tf", "dl"])
        return b.filter(pc.is_in(b.column("term"),
                                 value_set=pa.array(terms, pa.string())))

    def posts():
        return ray.data.read_parquet(paths).map_batches(
            only_terms, batch_format="pyarrow", zero_copy_batch=True)

    df_map = _bm25_df(posts())
    return _bm25_rank(posts(), terms, df_map, int(params["n_docs"]),
                      int(params["total_tokens"]), k=k, id_col=id_col,
                      tf_col="tf", dl_col="dl")


def append_to_postings_index(ds, index_dir: str, *, text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    """Incrementally add NEW documents to an existing
    ``build_postings_index`` layout — the growing-corpus maintenance path
    (same contract as ``stages/ann.py append_to_ivf_index``: the shard
    function is FROZEN by params.json, appended rows land as NEW parquet
    files inside their shard dirs, existing files are never rewritten, and
    a concurrent probe simply sees a prefix of the new postings).  The
    caller guarantees appended ``id_col`` values are new documents (df and
    corpus stats would double-count an update — re-build for rewrites).
    params.json's corpus stats accumulate, so a later query scores
    append-then-query ≡ build-all (parity pytest)."""
    import json
    import os

    from embulk_filter_timestamp_format_ray.stages.dedup import det_hash_str

    with open(os.path.join(index_dir, "params.json")) as f:
        params = json.load(f)
    shards = int(params["shards"])
    add_docs, add_total = _corpus_stats(ds, text_col)

    def post(b: pa.Table) -> pa.Table:
        rows = doc_term_count_batch(b, text_col, id_col)
        terms_col = rows.column("term").combine_chunks()
        enc = pc.dictionary_encode(terms_col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        shard_of = np.array([det_hash_str(t) % shards for t in vocab],
                            dtype=np.int32)
        sh = shard_of[np.asarray(enc.indices.cast(pa.int64()))] \
            if rows.num_rows else np.empty(0, np.int32)
        return pa.table({
            id_col: rows.column(id_col).cast(pa.int64()),
            "term": terms_col,
            "tf": rows.column("cnt").cast(pa.int64()),
            "dl": rows.column("n_tokens").cast(pa.int64()),
            "term_shard": pa.array(sh),
        })

    ds.map_batches(post, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["term_shard"])
    params["n_docs"] = int(params["n_docs"]) + add_docs
    params["total_tokens"] = int(params["total_tokens"]) + add_total
    tmp = os.path.join(index_dir, f"params.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, os.path.join(index_dir, "params.json"))
    return index_dir
