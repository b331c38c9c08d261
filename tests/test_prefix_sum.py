"""Distributed exclusive prefix sum + sequence packing: exactness vs a
single-process cumsum on shuffled, non-contiguous inputs."""

import numpy as np
import pyarrow as pa


def test_ordered_prefix_sum_matches_numpy(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        ordered_prefix_sum,
    )

    rng = np.random.default_rng(13)
    # non-contiguous, shuffled order keys spanning many buckets
    order = rng.permutation(np.arange(0, 30_000, 7, dtype=np.int64))
    vals = rng.integers(1, 50, size=len(order)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(order),
                                       "v": pa.array(vals)})) \
        .repartition(8)
    out = ordered_prefix_sum(ds, "k", "v", bucket_size=1_000) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    srt = np.argsort(order)
    want_cum = np.zeros(len(order), dtype=np.int64)
    np.cumsum(vals[srt][:-1], out=want_cum[1:])
    assert out["k"].to_numpy().tolist() == order[srt].tolist()
    assert out["cum_before"].to_numpy().tolist() == want_cum.tolist()


def test_pack_sequences_chunking(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        pack_sequences,
    )

    # 10 docs × 100 tokens, seq_len 256 → seq boundaries every 2.56 docs
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "n_tokens": pa.array(np.full(10, 100, dtype=np.int64))}))
    out = pack_sequences(ds, "doc_id", "n_tokens", seq_len=256,
                         bucket_size=4).to_pandas().sort_values("doc_id")
    # cum_before = 0,100,...,900; seq_id = cum // 256
    assert out["seq_id"].tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 3, 3]
    # every sequence's token mass is ≤ seq_len + max doc (straddle rule)
    assert out.groupby("seq_id")["n_tokens"].sum().max() <= 256 + 100


def test_prefix_sum_negative_order_keys(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        ordered_prefix_sum,
    )

    order = np.array([-250, -100, -1, 0, 99, 300], dtype=np.int64)
    vals = np.array([5, 7, 11, 13, 17, 19], dtype=np.int64)
    perm = np.array([3, 0, 5, 1, 4, 2])
    ds = ray.data.from_arrow(pa.table({"k": pa.array(order[perm]),
                                       "v": pa.array(vals[perm])}))
    out = ordered_prefix_sum(ds, "k", "v", bucket_size=100) \
        .to_pandas().sort_values("k")
    assert out["cum_before"].tolist() == [0, 5, 12, 23, 36, 53]


def test_quantile_bucket_assign_balanced_and_monotone(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        quantile_bucket_assign,
    )

    rng = np.random.default_rng(8)
    n = 2000
    tbl = pa.table({
        "g": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
        "v": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64))})
    out = quantile_bucket_assign(ray.data.from_arrow(tbl), "g", "v",
                                 n_buckets=4).to_pandas()
    for g in ("a", "b"):
        sub = out[out.g == g].sort_values("v")
        # monotone: bucket never decreases as value grows
        assert (np.diff(sub["bucket"].to_numpy()) >= 0).all()
        # roughly balanced quartiles (sketch-approximate)
        counts = sub.groupby("bucket").size()
        assert set(counts.index) == {0, 1, 2, 3}
        assert counts.min() > n / 2 * 0.15


def test_quantile_bucket_degenerate_group_all_top(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        quantile_bucket_assign,
    )

    # constant group: every edge equals the value → bucket n-1 for all
    tbl = pa.table({"g": pa.array(["c"] * 5),
                    "v": pa.array([7] * 5, pa.int64())})
    out = quantile_bucket_assign(ray.data.from_arrow(tbl), "g", "v",
                                 n_buckets=4).to_pandas()
    assert out["bucket"].tolist() == [3] * 5


def test_rolling_sum_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        rolling_sum_per_key,
    )

    rng = np.random.default_rng(23)
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 17, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    for w in (1, 3, 7):
        got = rolling_sum_per_key(ds, "k", "o", "v", window_rows=w,
                                  out_col="r") \
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
        want = df.sort_values(["k", "o"]).reset_index(drop=True)
        want["r"] = want.groupby("k")["v"] \
            .rolling(w, min_periods=1).sum().reset_index(drop=True) \
            .astype(np.int64)
        # pandas rolling returns in group order; realign by index
        want["r"] = want.groupby("k")["v"].transform(
            lambda s: s.rolling(w, min_periods=1).sum()).astype(np.int64)
        assert got["r"].tolist() == want["r"].tolist(), f"w={w}"


def test_pivot_counts_matches_crosstab(ray_session):
    import pandas as pd
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        pivot_counts,
    )

    rng = np.random.default_rng(3)
    cats = ["a", "b", "c"]
    df = pd.DataFrame({
        "k": rng.integers(0, 9, 400).astype(np.int64),
        "c": rng.choice(cats + ["other"], 400)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = pivot_counts(ds, "k", "c", cats).to_pandas() \
        .sort_values("k").set_index("k")
    for k in got.index:
        sub = df[df.k == k]["c"]
        for c in cats:
            assert got.loc[k, f"n_{c}"] == (sub == c).sum()


def test_concat_by_key_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        concat_by_key,
    )

    rng = np.random.default_rng(12)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "t": [f"w{i}" for i in range(n)]})
    df.loc[5, "t"] = None  # null joins as empty
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = concat_by_key(ds, "k", "o", "t", sep="|") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = df.assign(t=df["t"].fillna("")).sort_values(["k", "o"]) \
        .groupby("k").agg(n_parts=("t", "size"),
                          text=("t", lambda s: "|".join(s))) \
        .reset_index()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n_parts"].tolist() == want["n_parts"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
