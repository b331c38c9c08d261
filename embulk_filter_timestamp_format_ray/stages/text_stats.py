"""Text analysis stages for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All per-batch functions are Arrow-kernel vectorized except the winnowing
fingerprint, whose inner loop is numpy-per-document (documented; it is the
rolling-hash state that defeats column kernels).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

# deterministic small English stopword set (public knowledge)
STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they i "
    "at be this have from or had by not word but what some we can out other "
    "were all there when up use your how said an each she"
).split()

_WORD_RE = r"\S+"
_BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_STOPWORD_RE = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
_PUNCT_RE = r"[.,!?;:]"
_UPPER_RE = r"[A-Z]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    text = batch.column(text_col)
    ws = pc.count_substring_regex(text, pattern=_WORD_RE)
    bpe = pc.count_substring_regex(text, pattern=_BPE_ISH_RE)
    return batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64())) \
                .append_column("n_tokens_bpe", pc.cast(bpe, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword / uppercase quality features and a
    composite [0,1] score."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(text, pattern=_WORD_RE), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern=_PUNCT_RE), pa.float64())
    n_upper = pc.cast(pc.count_substring_regex(text, pattern=_UPPER_RE), pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, pattern=_STOPWORD_RE), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    safe_words = pc.max_element_wise(n_words, 1.0)
    punct_ratio = pc.divide(n_punct, safe_chars)
    upper_ratio = pc.divide(n_upper, safe_chars)
    stop_ratio = pc.divide(n_stop, safe_words)
    mean_word_len = pc.divide(n_chars, safe_words)
    # composite: reward stopword presence and sane word lengths, punish
    # heavy punctuation/caps (deterministic arithmetic only)
    score = pc.subtract(
        pc.add(pc.multiply(stop_ratio, 2.0),
               pc.multiply(pc.min_element_wise(mean_word_len, 8.0), 0.05)),
        pc.add(pc.multiply(punct_ratio, 3.0), pc.multiply(upper_ratio, 1.0)),
    )
    score = pc.max_element_wise(pc.min_element_wise(score, 1.0), 0.0)
    out = batch
    for name, col in [("n_chars_q", pc.cast(n_chars, pa.int64())),
                      ("n_words", pc.cast(n_words, pa.int64())),
                      ("punct_ratio", punct_ratio), ("upper_ratio", upper_ratio),
                      ("stopword_ratio", stop_ratio), ("quality_score", score)]:
        out = out.append_column(name, col)
    return out


# PII patterns (RE2 syntax — identical semantics in Arrow and DuckDB, so
# the redaction oracle can mirror them term-for-term)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{7,15}"
PII_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


def redact_pii_batch(batch: pa.Table, text_col: str = "text",
                     out_col: "str | None" = None) -> pa.Table:
    """Scrub emails / E.164-ish phone numbers / SSN-shaped ids from a text
    column — the standard pre-training privacy pass — as three vectorized
    RE2 substitutions (no row loops).  Patterns are module constants so the
    SQL oracle and any downstream policy can reference the exact same
    expressions."""
    out_col = out_col or text_col
    col = batch.column(text_col)
    redacted = pc.replace_substring_regex(col, pattern=PII_EMAIL_RE,
                                          replacement="<EMAIL>")
    redacted = pc.replace_substring_regex(redacted, pattern=PII_PHONE_RE,
                                          replacement="<PHONE>")
    redacted = pc.replace_substring_regex(redacted, pattern=PII_SSN_RE,
                                          replacement="<SSN>")
    n_hits = pc.count_substring_regex(redacted,
                                      pattern="<EMAIL>|<PHONE>|<SSN>")
    if out_col in batch.schema.names:
        batch = batch.set_column(batch.schema.get_field_index(out_col),
                                 out_col, redacted)
    else:
        batch = batch.append_column(out_col, redacted)
    return batch.append_column("n_redactions", n_hits.cast(pa.int64()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """N-gram-heuristic language ID: English stopword density + ascii ratio.
    (The container has no language models; this is the documented heuristic
    tier with the same stage shape a fasttext-style model would use.)"""
    text = batch.column(text_col)
    n_words = pc.cast(pc.count_substring_regex(text, pattern=_WORD_RE), pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, pattern=_STOPWORD_RE), pa.float64())
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_ascii = pc.cast(pc.count_substring_regex(text, pattern=r"[\x00-\x7F]"), pa.float64())
    stop_ratio = pc.divide(n_stop, pc.max_element_wise(n_words, 1.0))
    ascii_ratio = pc.divide(n_ascii, pc.max_element_wise(n_chars, 1.0))
    is_en = pc.and_(pc.greater(stop_ratio, 0.05), pc.greater(ascii_ratio, 0.9))
    lang = pc.if_else(is_en, "en",
                      pc.if_else(pc.greater(ascii_ratio, 0.9), "latin-other", "non-latin"))
    return batch.append_column("lang_pred", lang) \
                .append_column("lang_confidence", stop_ratio) \
                .append_column("n_words_lang", pc.cast(n_words, pa.int64()))


class FingerprintStage:
    """Winnowing document fingerprints (rolling hash over byte 4-grams,
    window-min selection).  Callable-class stage: constants built once per
    worker; inner loop numpy-per-document."""

    def __init__(self, k: int = 4, window: int = 8):
        self.k = k
        self.window = window
        self._pow = np.power(np.uint64(31), np.arange(k, dtype=np.uint64)[::-1])

    def _doc_fingerprint(self, s: str) -> int:
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < self.k:
            return int(b.sum()) if len(b) else 0
        # rolling polynomial hash of k-grams via strided windows
        win = np.lib.stride_tricks.sliding_window_view(b, self.k).astype(np.uint64)
        grams = (win * self._pow).sum(axis=1)
        if len(grams) <= self.window:
            sel = grams.min()
            return int(sel)
        mins = np.lib.stride_tricks.sliding_window_view(grams, self.window).min(axis=1)
        # xor-fold the selected minima into one 64-bit fingerprint
        out = 0
        for v in np.unique(mins):
            out ^= (int(v) * 0x9E3779B97F4A7C15) % (1 << 64)
        return out

    def fingerprint_batch(self, text: "pa.Array | pa.ChunkedArray") -> np.ndarray:
        """Whole-batch winnowing, bit-identical to ``_doc_fingerprint`` (the
        scalar spec above; parity in tests/test_vector_dedup_parity.py).

        The rolling k-gram hash is computed ONCE over the batch's contiguous
        UTF-8 buffer (Arrow string storage is already the concatenated byte
        stream); document boundaries come from the offsets buffer.  Window
        minima, per-doc unique selection (sort + adjacent-dedup) and the
        XOR fold are all segment-vectorized — zero per-document Python."""
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n_docs = len(text)
        if n_docs == 0:
            return np.empty(0, dtype=np.uint64)
        bufs = text.buffers()
        off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
            text.offset:text.offset + n_docs + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
            else np.empty(0, dtype=np.uint8)
        region = data[offsets[0]:offsets[-1]]
        rel_base = offsets[:-1] - offsets[0]
        L = offsets[1:] - offsets[:-1]
        k, window = self.k, self.window
        total = len(region)
        fp = np.zeros(n_docs, dtype=np.uint64)

        # docs shorter than k bytes: fingerprint = byte sum (scalar rule)
        shorts = (L > 0) & (L < k)
        if shorts.any():
            ns = L[shorts]
            s_starts = np.zeros(len(ns), dtype=np.int64)
            np.cumsum(ns[:-1], out=s_starts[1:])
            doc_of_s = np.repeat(np.arange(len(ns)), ns)
            bidx = rel_base[shorts][doc_of_s] + \
                (np.arange(int(ns.sum())) - s_starts[doc_of_s])
            fp[shorts] = np.add.reduceat(region[bidx].astype(np.uint64), s_starts)

        # global rolling k-gram hash over the whole byte region
        if total >= k:
            n_g_total = total - k + 1
            grams = np.zeros(n_g_total, dtype=np.uint64)
            for j in range(k):
                grams += region[j:j + n_g_total].astype(np.uint64) * self._pow[j]
        else:
            grams = np.empty(0, dtype=np.uint64)

        # gather each doc's valid grams, concatenated in doc order
        ng = np.where(L >= k, L - k + 1, 0)
        total_g = int(ng.sum())
        g_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(ng[:-1], out=g_starts[1:])
        doc_of_g = np.repeat(np.arange(n_docs), ng)
        within_g = np.arange(total_g) - g_starts[doc_of_g]
        gflat = grams[rel_base[doc_of_g] + within_g]

        nzg = ng > 0
        if nzg.any():
            mins_all = np.minimum.reduceat(gflat, g_starts[nzg])
            docs_nzg = np.nonzero(nzg)[0]
            case_a = ng[docs_nzg] <= window
            fp[docs_nzg[case_a]] = mins_all[case_a]  # few grams: plain min

        # winnowing proper: per-doc sliding-window minima over the flat gram
        # stream, windows that straddle documents masked out by construction
        docs_w = ng > window
        if docs_w.any():
            sw = np.lib.stride_tricks.sliding_window_view(gflat, window).min(axis=1)
            nw = np.where(docs_w, ng - window + 1, 0)
            total_w = int(nw.sum())
            w_starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(nw[:-1], out=w_starts[1:])
            doc_of_w = np.repeat(np.arange(n_docs), nw)
            within_w = np.arange(total_w) - w_starts[doc_of_w]
            wm = sw[g_starts[doc_of_w] + within_w]
            # unique minima per doc: sort by (doc, value), drop adjacent dups
            order = np.lexsort((wm, doc_of_w))
            dw, vw = doc_of_w[order], wm[order]
            first = np.ones(len(vw), dtype=bool)
            first[1:] = (dw[1:] != dw[:-1]) | (vw[1:] != vw[:-1])
            dw, vw = dw[first], vw[first]
            folded = vw * np.uint64(0x9E3779B97F4A7C15)  # wraps mod 2^64
            seg = np.nonzero(np.r_[True, dw[1:] != dw[:-1]])[0]
            fp[dw[seg]] = np.bitwise_xor.reduceat(folded, seg)
        return fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = self.fingerprint_batch(batch.column("text"))
        return batch.append_column("fingerprint", pa.array(fps.astype(np.int64)))


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: "str | None" = None) -> pa.Table:
    """Standard corpus text normalization: lowercase → collapse whitespace
    runs to single spaces → trim → Unicode NFC.

    The lowercase/collapse/trim steps are Arrow kernels over the whole
    batch.  NFC has no Arrow kernel; the ASCII fast path skips it entirely
    (NFC is the identity on ASCII), and only the rows that actually
    contain non-ASCII bytes route through ``unicodedata.normalize`` —
    bounded by the non-ASCII row count, not the batch (for a mostly-ASCII
    web corpus that is a rounding error; a heavily non-Latin corpus should
    budget for it)."""
    import unicodedata

    out_col = out_col or text_col
    col = pc.fill_null(batch.column(text_col), "")
    t = pc.utf8_lower(col)
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    non_ascii = pc.greater(
        pc.count_substring_regex(t, pattern=r"[^\x00-\x7F]"), 0)
    import numpy as np  # noqa: F811 — local alias keeps kernel signature

    mask = np.asarray(non_ascii)
    if mask.any():
        idx = np.nonzero(mask)[0]
        sub = t.take(pa.array(idx)).to_pylist()  # only the non-ASCII rows
        t = pc.replace_with_mask(
            t, pa.array(mask),
            pa.array([unicodedata.normalize("NFC", s) for s in sub],
                     pa.string()))
    if out_col in batch.schema.names:
        batch = batch.set_column(batch.schema.get_field_index(out_col),
                                 out_col, t)
    else:
        batch = batch.append_column(out_col, t)
    return batch


def remove_boilerplate_lines(ds, *, min_docs: int, doc_id_col: str = "doc_id",
                             text_col: str = "text"):
    """CCNet-style line-level dedup: drop every line that occurs in at
    least ``min_docs`` DISTINCT documents (site headers, share buttons,
    cookie banners — the classic web-corpus boilerplate), preserving the
    remaining lines' order.  Output: (doc_id, text_clean,
    n_lines_removed).

    Shape: explode to per-doc-distinct (doc, line) pairs (one vectorized
    split + Arrow local distinct per batch), count distinct docs per line
    with ``grouped_count_distinct`` (only distinct pairs shuffle), then
    broadcast the ≥min_docs line SET once via ``ray.put`` and rebuild each
    document in one pass: flatten the split lists, one ``is_in`` mask,
    cumsum re-offsets, ``binary_join``.  No per-document callbacks.

    Scale assumption (logged): the boilerplate set — lines crossing the
    min_docs threshold — fits in worker memory as a broadcast.  That holds
    by construction for boilerplate thresholds (the set shrinks as
    min_docs grows); a pathological corpus would need the semi/anti
    shuffle-join fallback like dedup's drop set."""
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_count_distinct,
        resolve_broadcast,
    )

    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")

    def _split(batch: pa.Table):
        txt = pc.fill_null(batch.column(text_col), "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pc.split_pattern(txt, pattern="\n")

    def explode_lines(batch: pa.Table) -> pa.Table:
        lines = _split(batch)
        offs = np.asarray(lines.offsets, dtype=np.int64)
        ids = batch.column(doc_id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = np.asarray(ids.cast(pa.int64()))
        pairs = pa.table({doc_id_col: pa.array(np.repeat(ids, np.diff(offs))),
                          "line": lines.flatten()})
        # local per-doc distinct cuts the pair volume before the exchange
        return pairs.group_by([doc_id_col, "line"]).aggregate([])

    pairs = ds.map_batches(explode_lines, batch_format="pyarrow",
                           zero_copy_batch=True)
    df = grouped_count_distinct(pairs, "line", doc_id_col, out_col="df")
    boiler = df.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("df"), pa.scalar(min_docs, pa.int64()))).select(["line"]),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    logger.info("remove_boilerplate_lines: broadcasting %d boilerplate lines",
                len(boiler))
    bset_ref = ray.put(pa.array(sorted(boiler["line"]), pa.string()))

    def clean(batch: pa.Table) -> pa.Table:
        bl = resolve_broadcast(bset_ref)
        lines = _split(batch)
        flat = lines.flatten()
        keep = np.asarray(pc.invert(pc.is_in(flat, value_set=bl)))
        offs = np.asarray(lines.offsets, dtype=np.int64)
        cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        kept_counts = cs[offs[1:]] - cs[offs[:-1]]
        new_offs = np.concatenate([[0], np.cumsum(kept_counts)])
        cleaned_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep)))
        removed = np.diff(offs) - kept_counts
        return pa.table({
            doc_id_col: batch.column(doc_id_col),
            "text_clean": pc.binary_join(cleaned_list, "\n"),
            "n_lines_removed": pa.array(removed.astype(np.int64)),
        })

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def doc_token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) Dataset → (id, n_tokens) — THE canonical token-count
    pass for sequence packing.  Every packing caller (pack_sequences /
    materialize_sequences queries, the corpus CLI's --pack) must route
    through this one definition so packing boundaries stay bit-identical
    with the oracles."""
    def count(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pc.cast(pc.count_substring_regex(
                b.column(text_col), pattern=_WORD_RE), pa.int64()),
        })

    return ds.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True)


def chunk_documents_batch(batch: pa.Table, *, size: int, stride: int,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Token-window document chunking: split each document into overlapping
    windows of ``size`` whitespace tokens advancing by ``stride`` — the
    long-document → training-example step of a corpus pipeline.  One row
    per chunk: (doc_id, chunk_idx, chunk_tokens, chunk_text).

    Chunk count (integer-exact, mirrored by the SQL oracle):
    ``1 + max(0, ceil((n_tokens - size) / stride))`` — every token is
    covered, the last window may be short, a short/empty document yields
    exactly one chunk.

    Fully vectorized flat-map: one regex split per batch, the overlapping
    windows are materialized by a single integer gather over the flattened
    token buffer (overlap means a plain ListArray re-offset cannot express
    the windows — offsets must not overlap), then one run-length
    ``binary_join``.  No per-document callbacks, no shuffle."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern_regex(txt, pattern=r"\s+")
    n = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
    n_chunks = 1 + np.where(n > size, (n - size + stride - 1) // stride, 0)
    total = int(n_chunks.sum())
    rep = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    # chunk_idx within each document (segment-local arange)
    doc_first = np.cumsum(n_chunks) - n_chunks
    k = np.arange(total, dtype=np.int64) - doc_first[rep]
    start = k * stride
    end = np.minimum(start + size, n[rep])
    lens = end - start
    # gather indices into the flattened token stream
    flat = pc.list_flatten(toks)
    doc_off = np.asarray(toks.offsets.cast(pa.int64()))[:-1]
    chunk_first = np.cumsum(lens) - lens
    gather = (np.arange(int(lens.sum()), dtype=np.int64)
              - np.repeat(chunk_first, lens)
              + np.repeat(doc_off[rep] + start, lens))
    offsets = np.empty(total + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    gathered = flat.take(pa.array(gather))
    if isinstance(gathered, pa.ChunkedArray):
        gathered = gathered.combine_chunks()
    windows = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), gathered)
    chunk_text = pc.binary_join(windows, " ")
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_col: ids.take(pa.array(rep)),
        "chunk_idx": pa.array(k),
        "chunk_tokens": pa.array(lens),
        "chunk_text": chunk_text.cast(pa.string()),
    })


def chunk_documents(ds, *, size: int, stride: int, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Dataset wrapper over :func:`chunk_documents_batch` (stateless
    flat-map — streams, no shuffle; output rows ≈ input tokens / stride)."""
    return ds.map_batches(
        lambda b: chunk_documents_batch(b, size=size, stride=stride,
                                        id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
