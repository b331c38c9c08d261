"""Tests for the training-data / relational operators (dedup, ANN, text
stats, multimodal stubs, grouped aggregation, sessionize)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.stages.ann import brute_force_topk
from embulk_filter_timestamp_format_ray.stages.dedup import (
    MinHashStage,
    SimHashStage,
    dedup_exact,
    dedup_minhash_pairs,
    dedup_simhash_pairs,
    embedding_neardup_pairs,
    ngram_jaccard,
)
from embulk_filter_timestamp_format_ray.stages.multimodal import (
    ImageDecodeStage,
    attach_fake_image_bytes,
)
from embulk_filter_timestamp_format_ray.stages.relational import (
    grouped_aggregate,
    latest_by_key,
    sessionize,
)
from embulk_filter_timestamp_format_ray.stages.text_stats import (
    FingerprintStage,
    lang_id_batch,
    quality_score_batch,
    token_count_batch,
)


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",          # exact dup
        "the quick brown fox leaps over the lazy dog",          # near dup
        "completely different content about spark engines",
        "zzz qqq xxx",                                          # low quality
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def test_dedup_exact(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs_table())
    out = dedup_exact(ds).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4]  # doc 1 deduped to 0


def test_minhash_signature_properties():
    st = MinHashStage(num_perm=64, shingle_k=3)
    a = st.signature("the quick brown fox jumps over the lazy dog")
    b = st.signature("the quick brown fox jumps over the lazy dog")
    c = st.signature("the quick brown fox leaps over the lazy dog")
    d = st.signature("completely different content about spark engines")
    assert (a == b).all()
    sim_near = (a == c).mean()
    sim_far = (a == d).mean()
    assert sim_near > sim_far
    assert sim_near > 0.3


def test_dedup_minhash_pairs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs_table())
    pairs = dedup_minhash_pairs(ds, threshold=0.9).to_pandas()
    assert {(0, 1)} <= set(zip(pairs["id_a"], pairs["id_b"]))


def test_connected_components_and_near_dedup(ray_session):
    import pandas as pd
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import (
        connected_components_from_pairs,
        dedup_near_duplicates,
    )

    pairs = pd.DataFrame({"id_a": [1, 2, 7], "id_b": [2, 3, 8]})
    comp = connected_components_from_pairs(pairs).to_pandas()
    by_id = dict(zip(comp["doc_id"], comp["cluster_id"]))
    assert by_id == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}

    ds = ray.data.from_arrow(_docs_table())
    kept = dedup_near_duplicates(ds, threshold=0.9).to_pandas()
    ids = set(kept["doc_id"])
    assert 1 not in ids          # exact dup of 0 clusters with it
    assert {0, 3, 4} <= ids      # representatives + singletons survive


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e", "a b c d x") < 1.0


def test_simhash_hamming_locality():
    st = SimHashStage()
    a = st.simhash("the quick brown fox jumps over the lazy dog")
    c = st.simhash("the quick brown fox leaps over the lazy dog")
    d = st.simhash("completely different content about spark engines")
    ham = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
    assert ham(a, c) < ham(a, d)


def test_dedup_simhash_pairs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs_table())
    pairs = dedup_simhash_pairs(ds, max_hamming=0).to_pandas()
    assert {(0, 1)} <= set(zip(pairs["id_a"], pairs["id_b"]))


def _emb_table(n=64, dim=8):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, dim)).astype(np.float32)
    x[1] = x[0] + 0.001  # planted near-dup
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array(list(x), pa.list_(pa.float32()))})


def test_embedding_neardup(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_emb_table())
    pairs = embedding_neardup_pairs(ds, dim=8, threshold=0.99, planes=8).to_pandas()
    assert (0, 1) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_brute_force_topk_exact(ray_session):
    import ray.data

    tbl = _emb_table(64, 8)
    ds = ray.data.from_arrow(tbl)
    x = np.stack([np.asarray(v) for v in tbl.column("embedding").to_pylist()])
    out = brute_force_topk(ds, x[:2], k=5).to_pandas()
    # exact: query 0's top hit is itself (cosine 1), then vec 1 (planted dup)
    q0 = out[out["query_id"] == 0].sort_values("rank")
    assert list(q0["vec_id"][:2]) == [0, 1]
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    expect = np.argsort(-(xn[:2] @ xn.T), kind="stable", axis=1)[:, :5]
    got0 = list(q0["vec_id"])
    assert got0 == list(expect[0])


def test_approx_count_distinct(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        approx_count_distinct,
    )

    n_distinct = 5000
    vals = np.repeat(np.arange(n_distinct, dtype=np.int64), 4)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    est = approx_count_distinct(ds, "v", precision=12)
    assert abs(est - n_distinct) / n_distinct < 0.05
    # string column path
    ds2 = ray.data.from_arrow(pa.table({"s": [f"u{i % 700}" for i in range(5000)]}))
    est2 = approx_count_distinct(ds2, "s", precision=12)
    assert abs(est2 - 700) / 700 < 0.05


def test_set_op_rows(ray_session):
    import duckdb
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        set_op_rows,
    )

    rng = np.random.default_rng(41)
    mk = lambda n: pa.table({  # noqa: E731
        "a": pa.array(rng.integers(0, 800, n), pa.int64()),
        "b": pa.array([f"s{v}" for v in rng.integers(0, 4, n)]),
    })
    lt, rt = mk(1_500), mk(900)  # partial overlap: both ops non-empty
    left = ray.data.from_arrow(lt).repartition(6)
    right = ray.data.from_arrow(rt).repartition(4)
    con = duckdb.connect()
    con.register("lt", lt.to_pandas())
    con.register("rt", rt.to_pandas())
    for op, sql_kw in (("intersect", "intersect"), ("except", "except")):
        got = set_op_rows(left, right, ["a", "b"], op).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        want = con.execute(
            f"select a, b from lt {sql_kw} select a, b from rt "
            "order by a, b").df()
        assert got["a"].tolist() == want["a"].tolist()
        assert got["b"].tolist() == want["b"].tolist()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="set op"):
        set_op_rows(left, right, ["a"], "union")


def test_bloom_filter(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        bloom_prefilter,
        build_bloom_filter,
    )

    rng = np.random.default_rng(31)
    build_keys = rng.choice(1_000_000, size=2_000, replace=False)
    build = ray.data.from_arrow(
        pa.table({"k": pa.array(build_keys, pa.int64())})).repartition(5)
    bloom = build_bloom_filter(build, "k", n_bits=1 << 18, k=4)

    probe_keys = np.arange(50_000, dtype=np.int64)
    probe = ray.data.from_arrow(pa.table({"k": pa.array(probe_keys)}))
    kept = set(bloom_prefilter(probe, "k", bloom).to_pandas()["k"])
    members = set(build_keys[build_keys < 50_000])
    # no false negatives: every true member survives the prefilter
    assert members <= kept
    # and it actually prunes: false-positive rate stays near the
    # theoretical (1 - e^(-kn/m))^k ≈ 0.03% at these parameters
    fp = len(kept - members) / (len(probe_keys) - len(members))
    assert fp < 0.01

    # string keys route through the polars pre-hash path
    sb = ray.data.from_arrow(pa.table({"s": [f"key-{i}" for i in range(500)]}))
    sbloom = build_bloom_filter(sb, "s", n_bits=1 << 16, k=4)
    sp = ray.data.from_arrow(
        pa.table({"s": [f"key-{i}" for i in range(400, 1400)]}))
    skept = set(bloom_prefilter(sp, "s", sbloom).to_pandas()["s"])
    assert {f"key-{i}" for i in range(400, 500)} <= skept
    assert len(skept) < 250


def test_remove_boilerplate_lines(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        remove_boilerplate_lines,
    )

    hdr, shr = "HEADER", "share-bar"
    docs = []
    for i in range(6):
        # header in all 6 docs, share-bar in only 2, unique bodies; doc 5
        # repeats the header INSIDE the body (within-doc dup counts once
        # for DF but both occurrences are removed)
        body = [f"body {i} alpha", f"body {i} beta"]
        lines = [hdr] + body + ([shr] if i < 2 else []) + \
            ([hdr] if i == 5 else [])
        docs.append("\n".join(lines))
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "text": pa.array(docs)})
    got = remove_boilerplate_lines(
        ray.data.from_arrow(tbl).repartition(3), min_docs=3
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # header (df=6) removed everywhere incl. both doc-5 occurrences;
    # share-bar (df=2 < 3) kept; body order preserved
    for i in range(6):
        want = [f"body {i} alpha", f"body {i} beta"] + \
            (["share-bar"] if i < 2 else [])
        assert got["text_clean"][i] == "\n".join(want)
    assert got["n_lines_removed"].tolist() == [1, 1, 1, 1, 1, 2]

    # a doc that is ALL boilerplate collapses to the empty string
    tbl2 = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": pa.array([hdr, hdr, hdr + "\nkeep me"])})
    got2 = remove_boilerplate_lines(
        ray.data.from_arrow(tbl2), min_docs=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got2["text_clean"].tolist() == ["", "", "keep me"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(ray.data.from_arrow(tbl2), min_docs=1)


def test_grouped_count_distinct(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_count_distinct,
    )

    rng = np.random.default_rng(17)
    n = 20_000
    groups = rng.integers(0, 7, n)
    vals = rng.integers(0, 900, n)
    # sprinkle NULL values: COUNT(DISTINCT v) must ignore them
    varr = pa.array(vals, pa.int64()).to_pandas()
    varr[::97] = None
    tbl = pa.table({"g": pa.array(groups, pa.int64()),
                    "v": pa.Array.from_pandas(varr, type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = grouped_count_distinct(ds, "g", "v", out_col="n").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    import duckdb

    want = duckdb.query_df(tbl.to_pandas(), "t",
                           "select g, count(distinct v) as n from t "
                           "group by g order by g").df()
    assert got["g"].tolist() == want["g"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_grouped_approx_count_distinct(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        approx_count_distinct,
        grouped_approx_count_distinct,
    )

    # one group must reproduce the global estimate exactly (same kernel,
    # same register content, same dense-sum estimate math)
    vals = np.repeat(np.arange(3000, dtype=np.int64), 3)
    one = pa.table({"g": pa.array(["only"] * len(vals)),
                    "v": pa.array(vals)})
    ds = ray.data.from_arrow(one).repartition(6)
    got = grouped_approx_count_distinct(ds, "g", "v").to_pandas()
    glob = approx_count_distinct(
        ray.data.from_arrow(one.select(["v"])).repartition(6), "v")
    assert got["approx_distinct"].tolist() == [int(np.floor(glob + 0.5))]

    # multi-group: each estimate within 5% of its group's truth, and
    # invariant to input partitioning (merge associativity)
    rng = np.random.default_rng(23)
    sizes = {"a": 400, "b": 2500, "c": 7000}
    gs, vs = [], []
    for g, k in sizes.items():
        gs += [g] * (2 * k)
        vs += list(rng.permutation(np.repeat(np.arange(k), 2)))
    tbl = pa.table({"g": pa.array(gs), "v": pa.array(vs, pa.int64())})
    for parts in (2, 9):
        est = grouped_approx_count_distinct(
            ray.data.from_arrow(tbl).repartition(parts), "g", "v"
        ).to_pandas().set_index("g")["approx_distinct"]
        for g, k in sizes.items():
            assert abs(est[g] - k) / k < 0.05
        if parts == 2:
            first = est.sort_index()
        else:
            assert est.sort_index().tolist() == first.tolist()

    # NULL group keys are refused, not silently dropped
    bad = ray.data.from_arrow(pa.table({
        "g": pa.array(["x", None]), "v": pa.array([1, 2], pa.int64())}))
    import pytest as _pytest

    with _pytest.raises(Exception, match="NULL group keys"):
        grouped_approx_count_distinct(bad, "g", "v").materialize()


def test_top_k_global(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        top_k_global,
    )

    rng = np.random.default_rng(8)
    vals = rng.permutation(10_000)
    t = pa.table({"v": pa.array(vals), "tag": pa.array(
        [f"t{v % 3}" for v in vals])})
    out = top_k_global(ray.data.from_arrow(t).repartition(9), "v", 5,
                       tie_cols=("tag",)).to_pandas()
    assert list(out["v"]) == [9999, 9998, 9997, 9996, 9995]
    asc = top_k_global(ray.data.from_arrow(t).repartition(9), "v", 3,
                       descending=False).to_pandas()
    assert list(asc["v"]) == [0, 1, 2]


def test_grouped_approx_quantiles(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_approx_quantiles,
    )

    rng = np.random.default_rng(4)
    vals = {"a": rng.uniform(0, 100, 8000), "b": rng.uniform(50, 60, 5000),
            "c": np.full(100, 7.0)}  # degenerate: constant group
    t = pa.table({
        "g": pa.array(sum(([k] * len(v) for k, v in vals.items()), [])),
        "v": pa.array(np.concatenate(list(vals.values()))),
    })
    out = grouped_approx_quantiles(
        ray.data.from_arrow(t).repartition(6), "g", "v",
        [0.1, 0.5, 0.9], bins=512).to_pandas()
    assert len(out) == 9
    for _, row in out.iterrows():
        exact = np.quantile(vals[row["g"]], row["q"])
        span = vals[row["g"]].max() - vals[row["g"]].min()
        assert abs(row["quantile"] - exact) <= max(span / 512 * 2, 1e-9), row


def test_asof_join(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import asof_join

    ts = lambda s: np.datetime64(s, "ns")  # noqa: E731
    left = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "u": ["a", "a", "a", "b"],
        "t": pa.array([ts("2024-01-01T00:05"), ts("2024-01-01T00:15"),
                       ts("2024-01-01T00:00"), ts("2024-01-01T00:10")]),
    }))
    right = ray.data.from_arrow(pa.table({
        "u": ["a", "a", "b"],
        "t": pa.array([ts("2024-01-01T00:00"), ts("2024-01-01T00:10"),
                       ts("2024-01-01T00:20")]),
        "v": [1.0, 2.0, 3.0],
    }))
    out = asof_join(left, right, by="u", on="t", value_cols=["v"]) \
        .to_pandas().sort_values("id")
    vals = list(out["v_asof"])
    assert vals[0] == 1.0          # 00:05 → snapshot 00:00
    assert vals[1] == 2.0          # 00:15 → snapshot 00:10
    assert vals[2] == 1.0          # 00:00 → equal-ts snapshot included
    import pandas as pd

    assert pd.isna(vals[3])        # b@00:10 has no prior snapshot → NULL
    # the no-match slot must be an Arrow NULL (DuckDB ASOF semantics), not
    # a float NaN — r1's one red CORRECTNESS row
    tbl = asof_join(left, right, by="u", on="t", value_cols=["v"]) \
        .to_arrow_refs()
    import ray as _ray

    blocks = [_ray.get(r) for r in tbl]
    blocks = [b for b in blocks if b.num_rows > 0]
    t = pa.concat_tables(blocks, promote_options="permissive")
    assert t.column("v_asof").null_count == 1


def test_asof_join_parity_random(ray_session):
    """Sharded backward-fill reduce vs an independent pd.merge_asof
    reference on messy data: many keys, duplicate left timestamps,
    equal-ts left/right collisions, keys with no right rows."""
    import pandas as pd
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import asof_join

    rng = np.random.default_rng(7)
    n_left, n_right = 5000, 800
    keys = [f"k{i}" for i in range(40)]
    lt = pd.DataFrame({
        "id": np.arange(n_left, dtype=np.int64),
        "u": rng.choice(keys, n_left),
        # coarse grid → plenty of exact-tie timestamps
        "t": pd.to_datetime(rng.integers(0, 500, n_left) * 60, unit="s"),
    })
    rt = pd.DataFrame({
        # last 5 keys never appear on the right → all-NULL keys
        "u": rng.choice(keys[:-5], n_right),
        "t": pd.to_datetime(rng.integers(0, 500, n_right) * 60, unit="s"),
        "v": np.round(rng.uniform(0, 100, n_right), 3),
    })
    # reference: merge_asof per key (backward, inclusive), independent impl
    rt_dedup = rt.sort_values(["u", "t"]).drop_duplicates(["u", "t"],
                                                          keep="last")
    expect = pd.merge_asof(
        lt.sort_values("t", kind="mergesort"), rt_dedup.sort_values("t"),
        on="t", by="u", direction="backward").sort_values("id")

    left = ray.data.from_arrow(pa.Table.from_pandas(lt)).repartition(6)
    right = ray.data.from_arrow(pa.Table.from_pandas(
        rt_dedup.reset_index(drop=True))).repartition(4)
    got = asof_join(left, right, by="u", on="t", value_cols=["v"]) \
        .to_pandas().sort_values("id")
    assert len(got) == n_left
    g = got["v_asof"].to_numpy(dtype=float)
    e = expect["v"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(g), np.isnan(e))
    m = ~np.isnan(g)
    assert np.allclose(g[m], e[m])
    # value types are preserved (not forced to float64): string payload
    rt2 = rt_dedup.assign(s=rt_dedup["v"].map(lambda x: f"s{x}"))
    right2 = ray.data.from_arrow(pa.Table.from_pandas(
        rt2.reset_index(drop=True))).repartition(4)
    got2 = asof_join(left, right2, by="u", on="t", value_cols=["s"]) \
        .to_pandas().sort_values("id")
    exp2 = np.where(np.isnan(e), None, [f"s{x}" for x in e])
    assert list(got2["s_asof"].where(got2["s_asof"].notna(), None)) == list(exp2)


def test_approx_quantiles(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import approx_quantiles

    rng = np.random.default_rng(2)
    vals = rng.uniform(0, 100, 20_000)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    got = approx_quantiles(ds, "v", [0.1, 0.5, 0.9], bins=4096)
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(vals, q)
        assert abs(got[q] - exact) < 100 / 4096 * 4, (q, got[q], exact)


def test_ivf_recall_vs_brute_force(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(5)
    # clustered data so IVF lists are meaningful
    centers = rng.standard_normal((8, 16)) * 3
    x = np.concatenate([c + rng.standard_normal((64, 16)) * 0.3 for c in centers])
    tbl = pa.table({"vec_id": pa.array(range(len(x)), pa.int64()),
                    "embedding": pa.array(list(x.astype(np.float32)),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    queries = x[:4]
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    approx = ivf_topk(ray.data.from_arrow(tbl), queries, k=10,
                      n_centroids=8, nprobe=3, sample_size=512).to_pandas()
    recalls = []
    for q in range(4):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.6


def test_text_stats_batches():
    out = token_count_batch(_docs_table())
    assert out.column("n_tokens_ws").to_pylist()[0] == 9
    q = quality_score_batch(_docs_table())
    scores = q.column("quality_score").to_pylist()
    assert scores[0] > scores[4]  # junk doc scores lower
    lid = lang_id_batch(_docs_table())
    assert lid.column("lang_pred").to_pylist()[0] == "en"


def test_fingerprint_deterministic():
    st = FingerprintStage()
    out1 = st(_docs_table()).column("fingerprint").to_pylist()
    out2 = st(_docs_table()).column("fingerprint").to_pylist()
    assert out1 == out2
    assert out1[0] == out1[1]  # identical docs → identical fingerprints
    assert out1[0] != out1[3]


def test_multimodal_stub_stage():
    batch = attach_fake_image_bytes(_docs_table())
    stage = ImageDecodeStage()
    out = stage(batch)
    assert out.column("n_bytes").to_pylist()[0] == len(
        _docs_table().column("text")[0].as_py().encode())
    if stage._pil is None:
        assert out.column("img_format").to_pylist()[0] == "FAKE"
    strict = ImageDecodeStage(strict=True)
    if strict._pil is None:
        with pytest.raises(NotImplementedError):
            strict(batch)


def test_redact_pii():
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        redact_pii_batch,
    )

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": ["mail me at a.b+c@x-corp.io today",
                           "call +4915512345678 or 123-45-6789",
                           "clean text, no pii",
                           None]})
    out = redact_pii_batch(t)
    texts = out.column("text").to_pylist()
    assert texts[0] == "mail me at <EMAIL> today"
    assert texts[1] == "call <PHONE> or <SSN>"
    assert texts[2] == "clean text, no pii"
    assert texts[3] is None
    assert out.column("n_redactions").to_pylist()[:3] == [1, 2, 0]


def test_multimodal_batch_kernel_parity():
    """The vectorized fake-embed / fake-decode / frame-sample kernels must
    match their per-payload scalar specs bit-for-bit on messy payloads
    (empty, null, 1-byte, multi-KB)."""
    from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        EmbedImageStage,
        FrameSampleStage,
        ImageDecodeStage,
    )

    rng = np.random.default_rng(3)
    payloads = [b"", None, b"\x00", b"x",
                bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
                bytes(rng.integers(0, 256, 137, dtype=np.uint8)),
                b"abc" * 2000]
    batch = pa.table({"image_bytes": pa.array(payloads, pa.binary()),
                      "video_bytes": pa.array(payloads, pa.binary())})

    embed = EmbedImageStage(dim=16)
    got = embed(batch).column("embedding").to_pylist()
    for p, vec in zip(payloads, got):
        assert np.array_equal(np.array(vec, np.float32),
                              embed.embed_scalar(p)), p

    dec = ImageDecodeStage()
    if dec._pil is None:
        out = dec(batch)
        for i, p in enumerate(payloads):
            w, h, f = dec._decode_fake(p or b"")
            assert out.column("img_width")[i].as_py() == w
            assert out.column("img_height")[i].as_py() == h
        assert out.column("n_bytes").to_pylist() == \
            [len(p or b"") for p in payloads]

    fs = FrameSampleStage(every_n=7)
    out = fs(batch).column("frame_offsets").to_pylist()
    for p, frames in zip(payloads, out):
        n = len(p or b"")
        assert frames == list(range(0, max(n // 1024, 1), 7)), p

    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        ImageResizeStage,
    )

    rs = ImageResizeStage(width=64, height=64)
    if rs._pil is None:
        target = 64 * 64 // 64
        got_rs = rs(batch).column("image_bytes").to_pylist()
        for p, rb in zip(payloads, got_rs):
            p = p or b""
            expect = (p * (target // max(len(p), 1) + 1))[:target]
            assert rb == expect, p


def test_multimodal_resize_and_embed_pipeline(ray_session):
    """Full multimodal plumbing: attach bytes → resize → embed → ANN —
    the decode/model steps are stubs, the Ray pipeline is real."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.ann import brute_force_topk
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        EmbedImageStage,
        ImageResizeStage,
        attach_fake_image_bytes,
    )

    ds = ray.data.from_arrow(_docs_table())
    ds = ds.map_batches(attach_fake_image_bytes, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(ImageResizeStage, fn_constructor_kwargs={"width": 64,
                                                                 "height": 64},
                        concurrency=(1, 2), batch_format="pyarrow", batch_size=16)
    ds = ds.map_batches(EmbedImageStage, fn_constructor_kwargs={"dim": 16},
                        concurrency=(1, 2), batch_format="pyarrow", batch_size=16)
    ds = ds.map_batches(lambda b: b.select(["doc_id", "embedding"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    emb = ds.to_pandas()
    assert len(emb) == 5 and len(emb["embedding"][0]) == 16
    # identical docs (0 and 1) produce identical embeddings → ANN finds them
    q = np.stack(emb.sort_values("doc_id")["embedding"].to_numpy())[:1]
    top = brute_force_topk(ray.data.from_arrow(pa.Table.from_pandas(emb)),
                           q, k=2, id_col="doc_id").to_pandas()
    assert set(top["doc_id"][:2]) == {0, 1}


def test_grouped_aggregate(ray_session):
    import ray.data

    t = pa.table({"k": ["a", "a", "b", "b", "b"],
                  "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    ds = ray.data.from_arrow(t)
    out = grouped_aggregate(ds, ["k"], {"s": ("v", "sum"), "n": ("v", "count"),
                                        "mx": ("v", "max")}).to_pandas()
    out = out.set_index("k")
    assert out.loc["a", "s"] == 3.0 and out.loc["a", "n"] == 2
    assert out.loc["b", "s"] == 12.0 and out.loc["b", "mx"] == 5.0


def test_distinct_and_topk(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        distinct,
        top_k_by_group,
    )

    t = pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "score": pa.array([9, 7, 8, 5, 6], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    d = distinct(ds, ["g"]).to_pandas()
    assert sorted(d["g"]) == ["a", "b"]
    top = top_k_by_group(ds, ["g"], "score", k=2, tie_col="id").to_pandas()
    top = top.sort_values(["g", "rank"])
    assert list(top["id"]) == [1, 3, 5, 4]  # a: 9,8; b: 6,5
    assert list(top["rank"]) == [1, 2, 1, 2]


def test_tumbling_window(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        tumbling_window_aggregate,
    )

    ts = pa.array(np.array([0, 100, 3700, 7300], dtype="datetime64[s]").astype(
        "datetime64[ns]"))
    t = pa.table({"u": ["x", "x", "x", "x"], "ts": ts,
                  "v": [1.0, 2.0, 3.0, 4.0]})
    out = tumbling_window_aggregate(
        ray.data.from_arrow(t), key="u", ts_col="ts", window_seconds=3600,
        aggs={"n": ("v", "count"), "s": ("v", "sum")}).to_pandas()
    out = out.sort_values("window_start")
    assert list(out["n"]) == [2, 1, 1]
    assert list(out["s"]) == [3.0, 3.0, 4.0]


def test_sliding_window(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        sliding_window_aggregate,
    )

    # events at t=0s, 30s, 70s; window=60s slide=30s
    ts = pa.array(np.array([0, 30, 70], dtype="datetime64[s]").astype(
        "datetime64[ns]"))
    t = pa.table({"u": ["x", "x", "x"], "ts": ts, "v": [1.0, 1.0, 1.0]})
    out = sliding_window_aggregate(
        ray.data.from_arrow(t), key="u", ts_col="ts", window_seconds=60,
        slide_seconds=30, aggs={"n": ("v", "count")}).to_pandas()
    secs = out["window_start"].astype("datetime64[ns]").astype("int64") // 10**9
    counts = dict(zip(secs, out["n"]))
    # windows: [-30,30):1  [0,60):2  [30,90):2  [60,120):1
    assert counts == {-30: 1, 0: 2, 30: 2, 60: 1}


def test_broadcast_join(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import broadcast_join

    big = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 2], pa.int64()), "v": [10.0, 20.0, 30.0, 40.0]}))
    small = pa.table({"k": pa.array([1, 2], pa.int64()), "name": ["a", "b"]})
    out = broadcast_join(big, small, on="k").to_pandas().sort_values("v")
    assert list(out["name"]) == ["a", "b", "b"]  # inner join drops k=3
    left = broadcast_join(big, small, on="k", how="left outer").to_pandas()
    assert len(left) == 4


def test_semi_anti_join_and_explode(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        broadcast_join,
        explode_list,
    )

    big = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()), "v": ["a", "b", "c"]}))
    small = pa.table({"k": pa.array([2, 3], pa.int64())})
    semi = broadcast_join(big, small, on="k", how="semi").to_pandas()
    assert sorted(semi["v"]) == ["b", "c"]
    anti = broadcast_join(big, small, on="k", how="anti").to_pandas()
    assert list(anti["v"]) == ["a"]

    lists = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "xs": pa.array([[10, 11], [12]], pa.list_(pa.int64()))}))
    flat = explode_list(lists, "xs", out_col="x").to_pandas().sort_values("x")
    assert list(flat["id"]) == [1, 1, 2]
    assert list(flat["x"]) == [10, 11, 12]


def test_latest_by_key_and_sessionize(ray_session):
    import ray.data

    t = pa.table({
        "k": ["x", "x", "y", "y"],
        "seq": pa.array([1, 2, 5, 4], pa.int64()),
        "val": [10.0, 0.5, 7.0, 8.0],
    })
    out = latest_by_key(ray.data.from_arrow(t), ["k"], "seq",
                        delete_expr=lambda b: pa.compute.less(b.column("val"), 1.0)
                        ).to_pandas()
    # x's latest (seq 2) is a delete → dropped; y keeps seq 5
    assert list(out["k"]) == ["y"] and list(out["seq"]) == [5]

    ts = pa.array(np.array([0, 10, 4000, 4010], dtype="datetime64[s]").astype(
        "datetime64[ns]"))
    t2 = pa.table({"u": ["a", "a", "a", "a"], "ts": ts})
    sess = sessionize(ray.data.from_arrow(t2), "u", "ts", 1800).to_pandas()
    assert list(sess["n_sessions"]) == [2]


def test_scd2_history(ray_session):
    """SCD2 interval assembly: upserts open versions, the NEXT event on the
    key (upsert or delete) closes them, deletes emit no row, re-insert after
    a delete re-opens history, and is_current marks open intervals only."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import scd2_history

    t = pa.table({
        # key a: v1 → v2 → delete → v4 (re-insert, still current)
        # key b: single version, current
        # key c: delete only → no history rows
        "k": ["a", "a", "a", "a", "b", "c"],
        "seq": pa.array([1, 2, 3, 4, 7, 9], pa.int64()),
        "val": [10.0, 20.0, 0.5, 40.0, 5.0, 0.5],
    })
    out = scd2_history(
        ray.data.from_arrow(t), ["k"], "seq",
        delete_expr=lambda b: pa.compute.less(b.column("val"), 1.0),
    ).to_pandas().sort_values(["k", "valid_from"]).reset_index(drop=True)

    assert list(out["k"]) == ["a", "a", "a", "b"]
    assert list(out["valid_from"]) == [1, 2, 4, 7]
    # pandas renders the nullable int column with NaN for open intervals
    vt = [None if pd.isna(v) else int(v) for v in out["valid_to"]]
    assert vt == [2, 3, None, None]
    assert list(out["is_current"]) == [False, False, True, True]
    assert list(out["val"]) == [10.0, 20.0, 40.0, 5.0]


def test_profile_table(ray_session):
    """Per-column profile: nulls counted, typed min/max (no string-order
    bugs: 9 < 10 for ints), exact distinct, heterogeneous types in one
    output schema."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import profile_table

    t = pa.table({
        "i": pa.array([9, 10, 10, None, 2], pa.int64()),
        "s": pa.array(["b", None, "a", "a", "c"], pa.string()),
    })
    out = profile_table(ray.data.from_arrow(t).repartition(3), ["i", "s"])
    rows = {r["column_name"]: r for r in out.to_pylist()}
    assert rows["i"] == {"column_name": "i", "n_rows": 5, "n_nulls": 1,
                         "min_str": "2", "max_str": "10", "n_distinct": 3}
    assert rows["s"] == {"column_name": "s", "n_rows": 5, "n_nulls": 1,
                         "min_str": "a", "max_str": "c", "n_distinct": 3}


def test_temporal_join_hand_checked(ray_session):
    """Point-in-time join vs SCD2 intervals: before-first-version, inside
    each interval, inside a post-delete GAP, open interval, unknown key."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        temporal_join,
    )

    hist = pa.table({
        "k": ["a", "a", "a", "b"],
        "valid_from": pa.array([1, 3, 7, 2], pa.int64()),
        # a: [1,3) [3,5) then a delete-gap [5,7) then [7,∞); b: [2,∞)
        "valid_to": pa.array([3, 5, None, None], pa.int64()),
        "val": pa.array([10, 20, 40, 5], pa.int64()),
    })
    facts = pa.table({
        "k": ["a", "a", "a", "a", "a", "a", "a", "b", "c"],
        "t": pa.array([0, 1, 2, 4, 5, 6, 100, 2, 9], pa.int64()),
    })
    out = temporal_join(
        ray.data.from_arrow(facts).repartition(2),
        ray.data.from_arrow(hist).repartition(2),
        keys=["k"], fact_seq="t", payload=["val"],
    ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)

    got = [None if pd.isna(v) else int(v) for v in out["val_dim"]]
    assert list(out["k"]) == ["a"] * 7 + ["b", "c"]
    assert list(out["t"]) == [0, 1, 2, 4, 5, 6, 100, 2, 9]
    assert got == [None, 10, 10, 20, None, None, 40, 5, None]


def test_keyed_window_group_guard(ray_session, caplog):
    """Skewed-key visibility (r1 verdict #8): sessionize/asof_join log a
    warning when one key's group exceeds the cap, instead of silently
    growing until a task OOMs."""
    import logging

    import ray.data

    from embulk_filter_timestamp_format_ray.stages import relational
    from embulk_filter_timestamp_format_ray.stages.relational import sessionize

    t = pa.table({
        "u": ["hot"] * 500 + ["cold"],
        "t": pa.array(np.arange(501, dtype="int64"),
                      pa.int64()).cast(pa.timestamp("ns")),
    })
    old = relational.KEY_GROUP_ROWS_WARN
    relational.KEY_GROUP_ROWS_WARN = 100
    try:
        with caplog.at_level(logging.WARNING,
                             logger="embulk_filter_timestamp_format_ray.stages.relational"):
            out = sessionize(ray.data.from_arrow(t), key="u", ts_col="t",
                             gap_seconds=10).to_pandas()
        assert len(out) == 2
        # map_groups runs in worker processes; exercise the guard in-process
        relational.warn_large_key_group(500, "sessionize", "'hot'")
        assert any("key group" in r.message for r in caplog.records)
    finally:
        relational.KEY_GROUP_ROWS_WARN = old


def test_minhash_low_shuffle_equivalent(ray_session):
    """carry_signatures=False (band rows without signatures + two hash
    joins) must produce the exact same pair set and estimates as the
    default carry path."""
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox leaps over the lazy dog again and again",
        "completely different content about ray data engines",
        "",
        None,
    ] * 5
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    a = dedup_minhash_pairs(ds, threshold=0.5).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = dedup_minhash_pairs(ds, threshold=0.5, carry_signatures=False) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(a) > 0
    assert a[["id_a", "id_b"]].equals(b[["id_a", "id_b"]])
    assert np.allclose(a["est_jaccard"], b["est_jaccard"])


def test_sampling_operators(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.sampling import (
        deterministic_sample,
        fraction_sample,
        mix_corpora,
        stratified_sample,
    )

    n = 4000
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "s": pa.array([f"s{i % 4}" for i in range(n)]),
    })
    ds = ray.data.from_arrow(t)

    out = deterministic_sample(ds, "id", 10).to_pandas()
    assert set(out["id"]) == set(range(0, n, 10))

    st = stratified_sample(ds, "s", "id", {"s0": 1, "s1": 2}).to_pandas()
    assert set(st[st["s"] == "s0"]["id"]) == set(range(0, n, 4))
    assert all(i % 2 == 0 for i in st[st["s"] == "s1"]["id"])
    assert not set(st["s"]) & {"s2", "s3"}  # unlisted strata dropped

    fr = fraction_sample(ds, "id", 0.25).to_pandas()
    assert 0.18 < len(fr) / n < 0.32  # ~25%, deterministic
    fr2 = fraction_sample(ds, "id", 0.25).to_pandas()
    assert list(fr["id"]) == list(fr2["id"])  # byte-reproducible

    mixed = mix_corpora([(ds, 1), (ds, 2)], "id").to_pandas()
    assert len(mixed) == n + n // 2


def test_sharded_reduces_match_pandas_reference(ray_session):
    """Property check on random data: latest_by_key / distinct /
    top_k_by_group / sessionize (all sharded reduces) must equal the
    obvious pandas implementations."""
    import pandas as pd
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        distinct,
        latest_by_key,
        sessionize,
        top_k_by_group,
    )

    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({
        "k": [f"u{i}" for i in rng.integers(0, 900, n)],
        "seq": rng.permutation(n),
        "v": rng.random(n),
        "t": pd.to_datetime(rng.integers(0, 10_000_000, n), unit="s"),
    })
    ds = ray.data.from_pandas(df).repartition(8)

    got = latest_by_key(ds, ["k"], "seq").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = df.sort_values("seq").groupby("k").last().reset_index() \
        .sort_values("k").reset_index(drop=True)
    assert got["seq"].tolist() == exp["seq"].tolist()

    assert sorted(distinct(ds, ["k"]).to_pandas()["k"]) == \
        sorted(df["k"].unique())

    got = top_k_by_group(ds, ["k"], "v", 3, tie_col="seq").to_pandas()
    exp_top = df.sort_values(["v", "seq"], ascending=[False, True]) \
        .groupby("k").head(3)
    assert len(got) == len(exp_top)
    gm = got.sort_values(["k", "rank"]).reset_index(drop=True)
    em = exp_top.sort_values(["k", "v"], ascending=[True, False]) \
        .reset_index(drop=True)
    assert np.allclose(gm["v"].to_numpy(), em["v"].to_numpy())

    got = sessionize(ds, "k", "t", gap_seconds=1800).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    def sess(g):
        ts = np.sort(g["t"].astype("int64").to_numpy())
        return 1 + int((np.diff(ts) > 1800 * 1e9).sum())

    exp = df.groupby("k").apply(sess, include_groups=False) \
        .sort_index()
    assert got["n_sessions"].tolist() == exp.tolist()


def test_label_propagation_matches_union_find(ray_session):
    """Distributed min-label propagation (the beyond-driver-bound scale
    path) must produce the exact components the union-find does, on a
    random graph with chains (diameter > 1), cliques, and singleton-free
    pairs."""
    import pandas as pd
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import (
        connected_components_distributed,
        connected_components_from_pairs,
    )

    rng = np.random.default_rng(7)
    # chains: 0-1-2-...-9, 100-101-...-109 (diameter 9) + random edges
    edges = [(i, i + 1) for i in range(9)] + \
            [(100 + i, 101 + i) for i in range(9)] + \
            [tuple(sorted(e)) for e in rng.integers(200, 400, (300, 2))
             if e[0] != e[1]]
    pairs = pa.table({
        "id_a": pa.array([a for a, b in edges], pa.int64()),
        "id_b": pa.array([b for a, b in edges], pa.int64()),
        "est_jaccard": pa.array([1.0] * len(edges)),
    })
    exp = connected_components_from_pairs(pd.DataFrame(
        {"id_a": pairs.column("id_a").to_pylist(),
         "id_b": pairs.column("id_b").to_pylist()})).to_pandas()
    got = connected_components_distributed(
        ray.data.from_arrow(pairs)).to_pandas()
    e = dict(zip(exp["doc_id"], exp["cluster_id"]))
    g = dict(zip(got["doc_id"], got["cluster_id"]))
    assert e == g


def test_near_dedup_distributed_path(ray_session):
    """Force the distributed components path (tiny max_driver_pairs) and
    check it removes the same docs as the driver path."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import (
        dedup_near_duplicates,
    )

    ds = ray.data.from_arrow(_docs_table())
    a = sorted(dedup_near_duplicates(ds, threshold=0.9).to_pandas()["doc_id"])
    b = sorted(dedup_near_duplicates(ds, threshold=0.9,
                                     max_driver_pairs=0).to_pandas()["doc_id"])
    assert a == b
    # force the fully-distributed drop path too: components AND the drop-set
    # application run without any driver materialization (shuffle anti join)
    c = sorted(dedup_near_duplicates(
        ds, threshold=0.9, max_driver_pairs=0,
        max_broadcast_drop=0).to_pandas()["doc_id"])
    assert a == c


def test_shuffle_join_partition_policy():
    from embulk_filter_timestamp_format_ray.stages.relational import (
        shuffle_join_partitions,
    )

    assert shuffle_join_partitions(32, 1) == 16     # single dev box: cpus/2
    assert shuffle_join_partitions(8, 1) == 4
    assert shuffle_join_partitions(2, 1) == 2       # floor
    assert shuffle_join_partitions(512, 16) == 256  # scales with nodes
    assert shuffle_join_partitions(512, 1) == 16    # one huge node: capped
    assert shuffle_join_partitions(64, 4) == 32     # cpus/2 still binds


def test_shuffle_semi_anti_join(ray_session):
    """Distributed semi/anti shuffle join vs the broadcast membership
    filter on the same inputs (incl. null and missing keys)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        broadcast_join,
        shuffle_join,
    )

    rng = np.random.default_rng(13)
    keys = rng.integers(0, 500, 4000)
    left_tbl = pa.table({
        "k": pa.array([None if i % 97 == 0 else int(k)
                       for i, k in enumerate(keys)], pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(4000)]),
    })
    right_tbl = pa.table({
        "k": pa.array(rng.integers(0, 300, 900), pa.int64()),
        "extra": pa.array(np.arange(900)),
    })
    left = ray.data.from_arrow(left_tbl).repartition(5)
    right = ray.data.from_arrow(right_tbl).repartition(3)
    for how in ("semi", "anti"):
        got = sorted(shuffle_join(left, right, on="k", how=how)
                     .to_pandas()["payload"])
        ref = sorted(broadcast_join(
            ray.data.from_arrow(left_tbl), right_tbl, on="k", how=how)
            .to_pandas()["payload"])
        assert got == ref, how
    # null left keys: dropped by semi, kept by anti
    anti = shuffle_join(left, right, on="k", how="anti").to_pandas()
    assert anti["k"].isna().sum() == left_tbl.column("k").null_count


def test_rollup_aggregate(ray_session):
    import pandas as pd
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        rollup_aggregate,
    )

    rng = np.random.RandomState(7)
    n = 4000
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], n)),
        "b": pa.array(rng.randint(0, 5, n), pa.int64()),
        "v": pa.array(rng.randint(0, 1000, n), pa.int64()),
    })
    out = rollup_aggregate(
        ray.data.from_arrow(t).repartition(7), ["a", "b"],
        {"total": ("v", "sum"), "n": ("v", "count"),
         "vmax": ("v", "max")}).to_pandas()
    df = t.to_pandas()

    def expect(group_cols):
        if group_cols:
            g = df.groupby(group_cols)["v"].agg(["sum", "count", "max"])
            return g.reset_index()
        return pd.DataFrame({"sum": [df.v.sum()], "count": [len(df)],
                             "max": [df.v.max()]})

    # finest level
    lvl2 = out[out.lvl == 2].sort_values(["a", "b"]).reset_index(drop=True)
    want2 = expect(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    assert (lvl2.total.values == want2["sum"].values).all()
    assert (lvl2.n.values == want2["count"].values).all()
    assert (lvl2.vmax.values == want2["max"].values).all()
    assert lvl2.b.notna().all() and lvl2.a.notna().all()
    # middle level: b rolled away → NULL
    lvl1 = out[out.lvl == 1].sort_values("a").reset_index(drop=True)
    want1 = expect(["a"]).sort_values("a").reset_index(drop=True)
    assert lvl1.b.isna().all()
    assert (lvl1.total.values == want1["sum"].values).all()
    assert (lvl1.vmax.values == want1["max"].values).all()
    # grand total
    lvl0 = out[out.lvl == 0]
    assert len(lvl0) == 1
    assert lvl0.a.isna().all() and lvl0.b.isna().all()
    assert int(lvl0.total.iloc[0]) == int(df.v.sum())
    assert int(lvl0.n.iloc[0]) == n


def test_rollup_single_key_and_errors(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        rollup_aggregate,
    )

    t = pa.table({"k": ["p", "q", "p"], "v": [1, 2, 4]})
    out = rollup_aggregate(ray.data.from_arrow(t), ["k"],
                           {"s": ("v", "sum")}).to_pandas()
    assert set(out.lvl) == {0, 1}
    assert int(out[out.lvl == 0].s.iloc[0]) == 7
    with pytest.raises(ValueError, match="at least one key"):
        rollup_aggregate(ray.data.from_arrow(t), [], {"s": ("v", "sum")})


def test_top_p_by_group(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.sampling import (
        top_p_by_group,
    )

    rng = np.random.RandomState(11)
    n = 3000
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "g": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "w": pa.array(rng.randint(0, 500, n), pa.int64()),
    })
    out = top_p_by_group(ray.data.from_arrow(t).repartition(9),
                         "g", "w", "id", 700).to_pandas()
    # naive spec: per group, sorted (w desc, id asc), keep while
    # 1000*cum_before < 700*total
    df = t.to_pandas()
    keep_ids = []
    for g, part in df.groupby("g"):
        part = part.sort_values(["w", "id"], ascending=[False, True])
        tot = int(part.w.sum())
        cum = 0
        for _, row in part.iterrows():
            if 1000 * cum < 700 * tot:
                keep_ids.append(int(row.id))
            cum += int(row.w)
    assert sorted(out.id) == sorted(keep_ids)
    # crossing row is kept: each group's coverage is >= 70%
    m = out.groupby("g").w.sum() / df.groupby("g").w.sum()
    assert (m >= 0.7).all()
    with pytest.raises(ValueError, match="p_permille"):
        top_p_by_group(ray.data.from_arrow(t), "g", "w", "id", 0)


def test_rank_in_group_and_event_gaps(ray_session):
    import pandas as pd
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        event_gap_us,
        rank_in_group,
    )

    rng = np.random.RandomState(3)
    n = 2000
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "u": pa.array(rng.randint(0, 40, n), pa.int64()),
        "v": pa.array(rng.randint(0, 50, n), pa.int64()),  # many ties
        "ts": pa.array(rng.randint(0, 10**9, n) * 1000,
                       pa.timestamp("us")),
    })
    out = rank_in_group(ray.data.from_arrow(t).repartition(7),
                        "u", "v", "id").to_pandas()
    df = t.to_pandas()
    df["rnk"] = df.sort_values(["v", "id"], ascending=[False, True]) \
                  .groupby("u").cumcount() + 1
    want = df.set_index("id")
    got = out.set_index("id")
    assert (got.rnk == want.rnk.reindex(got.index)).all()
    assert (got.n_group == df.groupby("u").u.transform("size")
            .reindex(got.index)).all()

    gaps = event_gap_us(ray.data.from_arrow(t).repartition(7),
                        "u", "ts", "id").to_pandas().set_index("id")
    df2 = df.sort_values(["u", "ts", "id"])
    us = df2.ts.astype("int64")
    lag = us.groupby(df2.u).shift(1)
    want_gap = (us - lag)
    # first event per key is NULL
    assert gaps.gap_us.reindex(df2.id).isna().equals(want_gap.isna()
                                                     .set_axis(df2.id))
    both = pd.DataFrame({"got": gaps.gap_us.reindex(df2.id).values,
                         "want": want_gap.values}).dropna()
    assert (both.got == both.want).all()


def test_grouping_sets_and_cube(ray_session):
    """GROUPING SETS folds each subset from one pinned finest aggregate;
    grouping_id carries the standard GROUPING bitmask (keys[0] = MSB)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        cube_aggregate,
        grouping_sets_aggregate,
    )

    t = pa.table({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", None],
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = grouping_sets_aggregate(
        ds, ["a", "b"], sets=[["a", "b"], ["b"], []],
        aggs={"n": ("v", "count"), "s": ("v", "sum")}).to_pandas()
    # grouping_id: (a,b)=0, (b only → a rolled)=2, ()=3
    assert sorted(out["grouping_id"].unique()) == [0, 2, 3]
    grand = out[out["grouping_id"] == 3]
    assert len(grand) == 1 and grand["s"].iloc[0] == 15 and grand["n"].iloc[0] == 5
    b_only = out[out["grouping_id"] == 2].set_index("b")
    # genuine NULL b value survives as its own group, distinct from padding
    assert b_only.loc["p", "s"] == 8 and b_only["a"].isna().all()
    assert int(b_only[b_only.index.isna()]["s"].iloc[0]) == 5

    cube = cube_aggregate(ds, ["a", "b"],
                          aggs={"s": ("v", "sum")}).to_pandas()
    assert sorted(cube["grouping_id"].unique()) == [0, 1, 2, 3]
    a_only = cube[cube["grouping_id"] == 1].set_index("a")
    assert a_only.loc["x", "s"] == 3 and a_only.loc["y", "s"] == 12

    with pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a"], sets=[["zzz"]], aggs={"s": ("v", "sum")})
    with pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a"], sets=[], aggs={"s": ("v", "sum")})


def test_chunk_documents_batch_windows():
    """Token-window chunking: coverage, overlap, short tail, empty doc."""
    import numpy as np

    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        chunk_documents_batch,
    )

    b = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e f g", "x y", ""]),
    })
    out = chunk_documents_batch(b, size=3, stride=2)
    rows = out.to_pylist()
    assert rows == [
        {"doc_id": 1, "chunk_idx": 0, "chunk_tokens": 3, "chunk_text": "a b c"},
        {"doc_id": 1, "chunk_idx": 1, "chunk_tokens": 3, "chunk_text": "c d e"},
        {"doc_id": 1, "chunk_idx": 2, "chunk_tokens": 3, "chunk_text": "e f g"},
        {"doc_id": 2, "chunk_idx": 0, "chunk_tokens": 2, "chunk_text": "x y"},
        {"doc_id": 3, "chunk_idx": 0, "chunk_tokens": 1, "chunk_text": ""},
    ]
    # random parity vs a per-doc scalar spec
    rng = np.random.default_rng(7)
    docs = [" ".join(f"t{rng.integers(50)}" for _ in range(rng.integers(1, 40)))
            for _ in range(60)]
    b2 = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                   "text": pa.array(docs)})
    for size, stride in [(5, 5), (8, 4), (16, 15), (1, 1)]:
        got = chunk_documents_batch(b2, size=size, stride=stride).to_pylist()
        want = []
        for i, doc in enumerate(docs):
            toks = doc.split(" ")
            n = len(toks)
            n_chunks = 1 + max(0, -((n - size) // -stride)) if n > size else 1
            for k in range(n_chunks):
                seg = toks[k * stride:k * stride + size]
                want.append({"doc_id": i, "chunk_idx": k,
                             "chunk_tokens": len(seg),
                             "chunk_text": " ".join(seg)})
        assert got == want, (size, stride)


def test_pagerank_hand_checked(ray_session):
    """Integer-exact PageRank on a 3-node cycle+fan, two supersteps
    verified by hand: N=3, r0=333333, teleport=50000."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.graph import pagerank

    edges = pa.table({
        "src": pa.array([1, 1, 2, 3], pa.int64()),
        "dst": pa.array([2, 3, 3, 1], pa.int64()),
    })
    out = pagerank(ray.data.from_arrow(edges).repartition(2), iters=2)
    got = {r["node"]: r["rank_x"] for r in out.take_all()}
    # iter1: insum = {1: 333333, 2: 166666, 3: 499999}
    # iter2: r = 50000 + 85*insum//100 with insum {1: 474999, 2: 166666,
    #        3: 358332}
    assert got == {1: 453749, 2: 191666, 3: 354582}


def test_attach_by_key_left_semantics(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.graph import attach_by_key

    left = pa.table({"k": pa.array([5, 7, 9], pa.int64()),
                     "tag": ["a", "b", "c"]})
    right = pa.table({"node": pa.array([7, 5], pa.int64()),
                      "v": pa.array([70, 50], pa.int64())})
    out = attach_by_key(
        ray.data.from_arrow(left).repartition(2), "k",
        ray.data.from_arrow(right), "node", "v", default=-1,
    ).to_pandas().sort_values("k")
    assert out["v"].tolist() == [50, 70, -1]
    assert out["tag"].tolist() == ["a", "b", "c"]


def test_pagerank_tier_parity(ray_session):
    """The broadcast and fully-distributed tiers floor identically —
    forcing broadcast_nodes=0 sends the same graph down the distributed
    path (the tfidf two-tier contract applied to graphs)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.graph import pagerank

    rng = np.random.default_rng(7)
    edges = pa.table({
        "src": pa.array(rng.integers(0, 40, 300), pa.int64()),
        "dst": pa.array(rng.integers(0, 50, 300), pa.int64()),
    })
    ds = ray.data.from_arrow(edges).repartition(3)
    fast = {r["node"]: r["rank_x"]
            for r in pagerank(ds, iters=3).take_all()}
    slow = {r["node"]: r["rank_x"]
            for r in pagerank(ds, iters=3, broadcast_nodes=0).take_all()}
    assert fast == slow and len(fast) == 50
