"""N-gram curation operators: decontamination, repetition stats, term
scoring — batch-kernel parity vs naive Python specs, plus end-to-end
Dataset behavior."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.stages.ngrams import (
    DecontaminateStage,
    build_eval_gram_set,
    decontaminate,
    doc_term_count_batch,
    repetition_stats_batch,
    tfidf_top_terms,
    word_ngram_hashes,
)


def _naive_grams(t, k):
    ws = (t or "").split()
    return [tuple(ws[i:i + k]) for i in range(max(len(ws) - k + 1, 0))]


def _rand_docs(n, seed):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "y", "z", "the"]
    docs = []
    for _ in range(n):
        m = int(rng.integers(0, 14))
        docs.append(" ".join(rng.choice(vocab, size=m)) if m else "")
    docs[0] = None  # null doc
    docs.append("   ")  # whitespace-only
    return docs


def test_word_ngram_hashes_matches_naive_structure():
    docs = _rand_docs(60, seed=7)
    arr = pa.array(docs, pa.string())
    for k in (1, 2, 3, 5):
        gh, ng, doc_of_g = word_ngram_hashes(arr, k)
        naive = [_naive_grams(t, k) for t in docs]
        assert ng.tolist() == [len(g) for g in naive]
        assert doc_of_g.tolist() == [i for i, g in enumerate(naive)
                                     for _ in g]
        # equal gram tuples ⇔ equal hashes (injective on this data)
        flat = [g for gs in naive for g in gs]
        by_hash = {}
        for h, g in zip(gh.tolist(), flat):
            assert by_hash.setdefault(h, g) == g
        assert len({h for h in gh.tolist()}) == len(set(flat))


def test_repetition_stats_matches_naive():
    docs = _rand_docs(80, seed=11)
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
    out = repetition_stats_batch(batch).to_pandas().set_index("doc_id")
    for i, t in enumerate(docs):
        g2, g5 = _naive_grams(t, 2), _naive_grams(t, 5)
        c2, c5 = Counter(g2), Counter(g5)
        top2 = (max(c2.values()) * 1000) // len(g2) if g2 else 0
        dup5 = (sum(v for v in c5.values() if v > 1) * 1000) // len(g5) \
            if g5 else 0
        assert out.loc[i, "n_grams_2"] == len(g2)
        assert out.loc[i, "top2_x1000"] == top2
        assert out.loc[i, "n_grams_5"] == len(g5)
        assert out.loc[i, "dup5_x1000"] == dup5


def test_doc_term_counts_match_counter():
    docs = _rand_docs(50, seed=3)
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
    rows = doc_term_count_batch(batch).to_pandas()
    got = {(r.doc_id, r.term): (r.cnt, r.n_tokens)
           for r in rows.itertuples()}
    want = {}
    for i, t in enumerate(docs):
        ws = (t or "").split()
        for w, c in Counter(ws).items():
            want[(i, w)] = (c, len(ws))
    assert got == want


def test_decontaminate_stage_flags_copies(ray_session):
    import ray.data

    evals = ["the quick brown fox jumps over the lazy dog today",
             "pack my box with five dozen liquor jugs now"]
    train = [
        "the quick brown fox jumps over the lazy dog today",  # full copy
        "completely unrelated words about other topics entirely here",
        "intro text then the quick brown fox jumps over the lazy dog today",
    ]
    ev_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(evals)}))
    tr_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(train)}))
    out = decontaminate(tr_ds, ev_ds, k=5, threshold_pct=20) \
        .to_pandas().set_index("doc_id")
    assert out.loc[0, "contaminated"] == 1
    assert out.loc[0, "n_contaminated"] == out.loc[0, "n_grams"]
    assert out.loc[1, "contaminated"] == 0
    assert out.loc[1, "n_contaminated"] == 0
    assert out.loc[2, "contaminated"] == 1  # suffix overlap ≥ 20%
    # drop=True keeps only the clean doc
    kept = decontaminate(tr_ds, ev_ds, k=5, threshold_pct=20,
                         drop=True).to_pandas()
    assert kept["doc_id"].tolist() == [1]


def test_decontaminate_zero_gram_doc_not_flagged():
    ev = np.sort(np.array([1, 2, 3], dtype=np.int64))
    st = DecontaminateStage(ev, k=5)
    b = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["one two"])})  # < 5 tokens → 0 grams
    out = st(b).to_pandas()
    assert out["n_grams"].tolist() == [0]
    assert out["contaminated"].tolist() == [0]


def test_build_eval_gram_set_is_sorted_distinct(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["a b c d e a b c d e", "a b c d e"])}))
    ev = build_eval_gram_set(ds, k=5)
    assert ev.dtype == np.int64
    assert np.all(np.diff(ev) > 0)
    # "a b c d e" appears 3 times (incl. wrap overlap grams differ) but the
    # identical gram dedups: the two-doc set has 6 + 1 grams, ≤ 7 distinct
    assert 1 <= len(ev) <= 7


def test_tfidf_ranking_and_tiebreak(ray_session):
    import ray.data

    docs = [
        "rare rare common common",        # 'rare' df=1 cnt=2 should win
        "common common zeta zeta alpha",
        "common filler words here",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(docs)}))
    out = tfidf_top_terms(ds, top_k=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("score_ppm", ascending=False)
    assert d0.iloc[0]["term"] == "rare"
    # exact integer score replay: cnt*1e6 // (df * n_tokens)
    assert d0.iloc[0]["score_ppm"] == 2_000_000 // (1 * 4)
    d1 = out[out.doc_id == 1]
    assert set(d1["term"]) == {"zeta", "alpha"}  # both df=1 beat common
    # zeta cnt=2 outranks alpha cnt=1
    z = d1.set_index("term")["score_ppm"]
    assert z["zeta"] > z["alpha"]


def test_tfidf_tie_breaks_alphabetically(ray_session):
    import ray.data

    # two df=1 terms with identical cnt/n_tokens → identical score; top_k=1
    # must pick the alphabetically smaller term
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["zebra apple"])}))
    out = tfidf_top_terms(ds, top_k=1).to_pandas()
    assert out["term"].tolist() == ["apple"]


def test_tfidf_joined_tier_matches_broadcast(ray_session):
    """broadcast_vocab_rows=0 forces the distributed DF-join tier; rows
    must be identical to the broadcast tier on the same corpus (incl.
    score ties broken by term ascending and the top_k boundary)."""
    import ray.data

    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(40)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
            for _ in range(200)]
    tbl = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                    "text": pa.array(docs)})

    def norm(df):
        return (df.sort_values(["doc_id", "term"])
                .reset_index(drop=True)
                [["doc_id", "term", "cnt", "df", "score_ppm"]]
                .astype({"cnt": "int64", "df": "int64",
                         "score_ppm": "int64"}))

    base = norm(tfidf_top_terms(
        ray.data.from_arrow(tbl), top_k=3).to_pandas())
    joined = norm(tfidf_top_terms(
        ray.data.from_arrow(tbl), top_k=3,
        broadcast_vocab_rows=0).to_pandas())
    assert len(base) == len(joined) > 0
    assert base.equals(joined)


def test_decontaminate_drop_keeps_payload_columns(ray_session):
    import ray.data

    ev_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["aa bb cc dd ee ff gg"])}))
    tr_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["totally different words here now ok fine"]),
        "extra": pa.array([42], pa.int64())}))
    kept = decontaminate(tr_ds, ev_ds, k=5, drop=True).to_pandas()
    assert list(kept.columns) == ["doc_id", "text", "extra"]
    assert kept["extra"].tolist() == [42]


def test_prepared_corpus_curation_options(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.corpus import (
        prepared_corpus,
    )

    docs = [
        ("the quick brown fox jumps over the lazy dog and then some "
         "more words to pass the stopword language filter today"),  # clean
        ("the quick brown fox jumps over the lazy dog and then some "
         "more words to pass the stopword language filter today"),  # dup
        ("you can mail me at bob@example.com for all of the details "
         "about this and that or the other things we discussed"),   # PII
        ("spam " * 30 + "the of and a to in is it you that"),  # repetitive
        ("pack my box with five dozen liquor jugs and then have some "
         "of the people you know read all of it aloud"),  # eval copy
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(docs)}))
    ev = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([99], pa.int64()),
        "text": pa.array([docs[4]])}))
    out = prepared_corpus(ds, min_tokens=5, redact_pii=True,
                          max_dup5_x1000=500, eval_ds=ev).to_pandas()
    kept = set(out["doc_id"])
    assert 0 in kept and 2 in kept
    assert 1 not in kept          # exact dup removed
    assert 3 not in kept          # repetition filter
    assert 4 not in kept          # decontaminated
    pii_text = out.set_index("doc_id").loc[2, "text"]
    assert "<EMAIL>" in pii_text and "bob@example.com" not in pii_text


def test_heavy_hitters_exact_even_with_tiny_sketch(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        heavy_hitter_words,
    )

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish: word i appears ~ 400/(i+1) times total across docs
    stream = []
    for i, w in enumerate(vocab):
        stream += [w] * (400 // (i + 1))
    rng.shuffle(stream)
    docs = [" ".join(stream[i::20]) for i in range(20)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(docs)}))
    # width 16 forces heavy collisions — result must STILL be exact
    got = heavy_hitter_words(ds, threshold=50, width=16, depth=3) \
        .to_pandas().sort_values("word").reset_index(drop=True)
    want = {w: c for w, c in Counter(stream).items() if c >= 50}
    assert dict(zip(got["word"], got["n"])) == want


def test_normalize_text_batch_spec():
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        normalize_text_batch,
    )

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["  Hello\t\tWORLD  ",
                          "café",       # decomposed → composed
                          None,               # null → empty
                          "already clean"])})
    out = normalize_text_batch(batch).to_pandas()
    assert out["text"].tolist() == [
        "hello world", "café", "", "already clean"]
    # out_col creates a new column without touching the source
    out2 = normalize_text_batch(batch, out_col="norm").to_pandas()
    assert out2["text"].tolist()[0] == "  Hello\t\tWORLD  "
    assert out2["norm"].tolist()[0] == "hello world"


def test_write_corpus_jsonl_roundtrip_and_resume(ray_session, tmp_path):
    import json as _json

    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.corpus import (
        write_corpus,
    )

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"doc number {i} körper" for i in range(20)])}))
    out = str(tmp_path / "jl")
    st = write_corpus(ds, out, num_partitions=3, fmt="jsonl")
    assert st["rows"] == 20 and st["written"] == 3
    rows = []
    import os as _os
    for f in sorted(_os.listdir(out)):
        if f.endswith(".jsonl"):
            with open(_os.path.join(out, f)) as fh:
                rows += [_json.loads(line) for line in fh]
    assert len(rows) == 20
    assert {r["doc_id"] for r in rows} == set(range(20))
    assert rows[0]["text"].endswith("körper") or "k\\u" not in rows[0]["text"]
    # resume skips everything
    st2 = write_corpus(ds, out, num_partitions=3, fmt="jsonl", resume=True)
    assert st2["written"] == 0 and st2["skipped"] == 3


def test_source_overlap_matches_naive(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        source_gram_overlap,
    )

    rng = np.random.default_rng(9)
    vocab = ["a", "b", "c", "d", "e", "f"]
    docs, srcs = [], []
    for i in range(60):
        docs.append(" ".join(rng.choice(vocab, size=int(rng.integers(3, 12)))))
        srcs.append(f"s{int(rng.integers(0, 4))}")
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(docs), "source": pa.array(srcs)}))
    got = source_gram_overlap(ds, k=3).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    # naive: distinct (source, gram) then pair intersection counts
    sets = {}
    for t, s in zip(docs, srcs):
        sets.setdefault(s, set()).update(_naive_grams(t, 3))
    want = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a < b:
                n = len(sets[a] & sets[b])
                if n:
                    want[(a, b)] = n
    got_d = {(r.source_a, r.source_b): r.shared_grams
             for r in got.itertuples()}
    assert got_d == want


def test_assign_split_deterministic_and_ratioed(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.sampling import (
        assign_split,
    )

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(10_000, dtype=np.int64))}))
    out = assign_split(ds, "doc_id").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.07 < frac["val"] < 0.13
    assert 0.07 < frac["test"] < 0.13
    # deterministic: re-run identical
    out2 = assign_split(ds, "doc_id").to_pandas()
    assert out.sort_values("doc_id")["split"].tolist() == \
        out2.sort_values("doc_id")["split"].tolist()
    # out-of-contract ids refuse loudly (SQL parity would silently break)
    bad = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([-1], pa.int64())}))
    with pytest.raises(Exception):
        assign_split(bad, "doc_id").materialize()


def test_corpus_report_matches_pandas(ray_session):
    import ray.data

    import __ray_entry__ as entry

    got = entry.q_corpus_report("/root/testdata/sf0.001").to_pandas() \
        .sort_values("source").reset_index(drop=True)
    import duckdb

    con = duckdb.connect()
    con.execute("create view documents as select * from "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    want = con.execute(entry.oracle_sql()["corpus_report"]).fetchdf() \
        .sort_values("source").reset_index(drop=True)
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["total_tokens"].tolist() == want["total_tokens"].tolist()
    assert got["en_docs"].tolist() == want["en_docs"].tolist()
    assert got["mean_tokens_x100"].tolist() == \
        want["mean_tokens_x100"].tolist()


def test_packed_sequences_token_budget(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.corpus import (
        packed_sequences,
    )

    docs = [" ".join(f"w{i}t{j}" for j in range(20)) for i in range(30)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array(docs)}))
    out = packed_sequences(ds, seq_len=100, bucket_size=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # 30 docs x 20 tokens = 600 tokens / 100 per seq = 6 sequences of 5
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert out["n_parts"].tolist() == [5] * 6
    # concatenation preserves doc order within a sequence
    assert out.loc[0, "text"].startswith("w0t0")
    assert "w4t19 w5t0" not in out.loc[0, "text"]  # doc 5 is in seq 1
    assert out.loc[1, "text"].startswith("w5t0")


def test_bm25_topk_hand_checked(ray_session):
    """Integer-exact BM25 on a 3-doc corpus, components verified by hand:
    N=3, total=9; df(a)=1, df(c)=2; w_idf(a)=1666, w_idf(c)=600;
    w_tf = (198000*tf) // (90*tf + 27 + 27*dl)."""
    import pyarrow as pa
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.ngrams import bm25_topk

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["a a b", "b c", "c c c c"],
    })
    out = bm25_topk(ray.data.from_arrow(t).repartition(2), ("a", "c"),
                    k=2).to_pandas()
    # doc0: 1666 * (396000 // 288) = 1666*1375; doc2: 600 * (792000 // 495)
    assert out["doc_id"].tolist() == [0, 2]
    assert out["score"].tolist() == [1666 * 1375, 600 * 1600]
    assert out["rank"].tolist() == [1, 2]


def test_postings_index_parity_and_pruning(ray_session, tmp_path):
    """bm25_topk_indexed over the on-disk postings index is bit-identical
    to tokenize-on-the-fly bm25_topk, and the probe opens ONLY the query
    terms' shard dirs (renaming every other shard away must not break it)."""
    import os
    import shutil

    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import det_hash_str
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        bm25_topk,
        bm25_topk_indexed,
        build_postings_index,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(120)]
    t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(4)
    terms = ("w3", "w17", "w31")

    direct = bm25_topk(ds, terms, k=8).to_pandas()
    idx = str(tmp_path / "postings_idx")
    build_postings_index(ds, idx, shards=16)
    served = bm25_topk_indexed(idx, terms, k=8).to_pandas()
    assert direct[["doc_id", "score", "rank"]].values.tolist() == \
        served[["doc_id", "score", "rank"]].values.tolist()

    # pruning proof: hide every shard the query does NOT need
    need = {det_hash_str(tm) % 16 for tm in terms}
    pdir = os.path.join(idx, "postings")
    for name in os.listdir(pdir):
        s = int(name.split("=")[1])
        if s not in need:
            shutil.move(os.path.join(pdir, name),
                        os.path.join(idx, "hidden_" + name))
    pruned = bm25_topk_indexed(idx, terms, k=8).to_pandas()
    assert pruned[["doc_id", "score", "rank"]].values.tolist() == \
        served[["doc_id", "score", "rank"]].values.tolist()


def test_postings_index_incremental_append(ray_session, tmp_path):
    """build(half) + append(half) serves the SAME ranking as build(all):
    appended files land beside the existing shard files (never rewriting
    them) and params' corpus stats accumulate exactly."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        append_to_postings_index,
        bm25_topk_indexed,
        build_postings_index,
    )

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 25)))
             for _ in range(100)]
    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": pa.array(texts)})
    terms = ("w2", "w11")

    full_idx = str(tmp_path / "idx_full")
    build_postings_index(ray.data.from_arrow(t).repartition(3), full_idx,
                         shards=8)
    inc_idx = str(tmp_path / "idx_inc")
    build_postings_index(ray.data.from_arrow(t.slice(0, 60)).repartition(2),
                         inc_idx, shards=8)
    append_to_postings_index(ray.data.from_arrow(t.slice(60)).repartition(2),
                             inc_idx)

    want = bm25_topk_indexed(full_idx, terms, k=10).to_pandas()
    got = bm25_topk_indexed(inc_idx, terms, k=10).to_pandas()
    assert want[["doc_id", "score", "rank"]].values.tolist() == \
        got[["doc_id", "score", "rank"]].values.tolist()
