"""Temporal band join: batch-searchsorted matcher vs a naive nested-loop
spec, boundary semantics, string keys, and the composite-overflow chunk
path."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _naive(left: pd.DataFrame, right: pd.DataFrame, lo, hi):
    rows = []
    for l in left.itertuples():
        for r in right.itertuples():
            if l.k == r.k and l.ts + lo < r.ts <= l.ts + hi:
                rows.append((l.lid, l.k, l.ts, r.val))
    return pd.DataFrame(rows, columns=["lid", "k", "ts", "val_r"]) \
        .sort_values(["lid", "val_r"]).reset_index(drop=True)


def _run(ray, left, right, lo, hi):
    from embulk_filter_timestamp_format_ray.stages.relational import (
        time_band_join,
    )

    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    out = time_band_join(lds, rds, key="k", ts_col="ts",
                         band_lo_us=lo, band_hi_us=hi,
                         right_payload=["val"]).to_pandas()
    if len(out) == 0:
        return out
    return out.sort_values(["lid", "val_r"]).reset_index(drop=True)


def test_matches_naive_random(ray_session):
    import ray

    rng = np.random.default_rng(31)
    nl, nr, nk = 300, 400, 12
    left = pd.DataFrame({
        "lid": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, nk, nl).astype(np.int64),
        "ts": rng.integers(0, 10_000, nl).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(0, nk, nr).astype(np.int64),
        "ts": rng.integers(0, 10_000, nr).astype(np.int64),
        "val": np.arange(nr, dtype=np.int64)})
    got = _run(ray, left, right, 0, 500)
    want = _naive(left, right, 0, 500)
    pd.testing.assert_frame_equal(
        got[["lid", "k", "ts", "val_r"]], want,
        check_dtype=False)


def test_band_boundaries_exclusive_inclusive(ray_session):
    import ray

    left = pd.DataFrame({"lid": [1], "k": [7], "ts": [100]})
    # rights at exactly ts+lo (excluded), ts+lo+1 (in), ts+hi (in),
    # ts+hi+1 (out)
    right = pd.DataFrame({"k": [7] * 4,
                          "ts": [110, 111, 150, 151],
                          "val": [0, 1, 2, 3]})
    got = _run(ray, left, right, 10, 50)
    assert got["val_r"].tolist() == [1, 2]


def test_negative_band_looks_backward(ray_session):
    import ray

    # band (-50, -10]: rights strictly BEFORE the left event —
    # window is (1000-50, 1000-10] = (950, 990]
    left = pd.DataFrame({"lid": [1], "k": [3], "ts": [1000]})
    right = pd.DataFrame({"k": [3] * 4,
                          "ts": [950, 951, 990, 991],
                          "val": [0, 1, 2, 3]})
    got = _run(ray, left, right, -50, -10)
    assert got["val_r"].tolist() == [1, 2]  # 950 excluded, 991 out


def test_string_keys(ray_session):
    import ray

    left = pd.DataFrame({"lid": [1, 2], "k": ["alice", "bob"],
                         "ts": [0, 0]})
    right = pd.DataFrame({"k": ["bob", "alice", "alice"],
                          "ts": [5, 5, 500],
                          "val": [10, 20, 30]})
    got = _run(ray, left, right, 0, 100)
    assert got[got.lid == 1]["val_r"].tolist() == [20]
    assert got[got.lid == 2]["val_r"].tolist() == [10]


def test_composite_overflow_chunk_path(ray_session):
    import ray

    rng = np.random.default_rng(7)
    # span ~2^52 us with 40 keys → chunk size 2^62/M ≈ 1024 ≥ 40, so force
    # smaller: use span so that chunk < nk (M ≈ 2^59 → chunk 8)
    nk, nl, nr = 40, 120, 150
    span = 1 << 59
    left = pd.DataFrame({
        "lid": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, nk, nl).astype(np.int64),
        "ts": rng.integers(0, span, nl).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(0, nk, nr).astype(np.int64),
        "ts": rng.integers(0, span, nr).astype(np.int64),
        "val": np.arange(nr, dtype=np.int64)})
    hi = span // 4
    got = _run(ray, left, right, 0, hi)
    want = _naive(left, right, 0, hi)
    pd.testing.assert_frame_equal(
        got[["lid", "k", "ts", "val_r"]], want, check_dtype=False)


def test_backward_band_at_shard_min_ts_no_false_match(ray_session):
    import ray

    # left at the global min timestamp with a backward band: its window
    # ends before min_ts, so a right ALSO at min_ts must NOT match
    left = pd.DataFrame({"lid": [1], "k": [3], "ts": [100]})
    right = pd.DataFrame({"k": [3], "ts": [100], "val": [9]})
    got = _run(ray, left, right, -50, -10)
    assert len(got) == 0


def test_backward_band_multi_key_shard_no_cross_key_matches(ray_session,
                                                            monkeypatch):
    """Regression: with band_hi_us < 0, the composite modulus must still
    exceed the shard's timestamp span, or adjacent keys' composite ranges
    overlap and searchsorted runs over an unsorted array — emitting
    matches from a DIFFERENT key.  Force many keys per shard to hit the
    multi-key path."""
    import ray

    from embulk_filter_timestamp_format_ray.stages import relational

    monkeypatch.setattr(relational, "_COMBINE_SHARDS", 2)
    rng = np.random.default_rng(41)
    nk, nl, nr = 300, 400, 400
    left = pd.DataFrame({
        "lid": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, nk, nl).astype(np.int64),
        "ts": rng.integers(0, 5000, nl).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(0, nk, nr).astype(np.int64),
        "ts": rng.integers(0, 5000, nr).astype(np.int64),
        "val": np.arange(nr, dtype=np.int64)})
    got = _run(ray, left, right, -600, -100)
    want = _naive(left, right, -600, -100)
    if len(got) == 0:
        assert len(want) == 0
    else:
        pd.testing.assert_frame_equal(
            got[["lid", "k", "ts", "val_r"]], want, check_dtype=False)
