"""Hypothesis fuzz: time_band_join vs the nested-loop spec over random
keys (int and string), bands (forward, backward, straddling zero), and
duplicate timestamps."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _naive(left, right, lo, hi):
    rows = []
    for l in left.itertuples():
        for r in right.itertuples():
            if l.k == r.k and l.ts + lo < r.ts <= l.ts + hi:
                rows.append((l.lid, r.val))
    return sorted(rows)


import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    # hypothesis can't take function args from fixtures; bind the shared
    # session once per module instead
    yield


@settings(max_examples=25, deadline=None)
@given(
    st.integers(-100, 100), st.integers(1, 150),
    st.lists(st.tuples(st.integers(0, 60), st.integers(0, 300)),
             min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 60), st.integers(0, 300)),
             min_size=1, max_size=40),
    st.booleans(),
)
def test_band_join_matches_naive(lo, span, lrows, rrows, str_keys):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        time_band_join,
    )

    hi = lo + span
    key = (lambda k: f"k{k}") if str_keys else (lambda k: k)
    left = pd.DataFrame({
        "lid": np.arange(len(lrows), dtype=np.int64),
        "k": [key(k) for k, _ in lrows],
        "ts": np.array([t for _, t in lrows], dtype=np.int64)})
    right = pd.DataFrame({
        "k": [key(k) for k, _ in rrows],
        "ts": np.array([t for _, t in rrows], dtype=np.int64),
        "val": np.arange(len(rrows), dtype=np.int64)})
    out = time_band_join(
        ray.data.from_arrow(pa.Table.from_pandas(left)),
        ray.data.from_arrow(pa.Table.from_pandas(right)),
        key="k", ts_col="ts", band_lo_us=lo, band_hi_us=hi,
        right_payload=["val"]).to_pandas()
    got = sorted(zip(out.get("lid", []), out.get("val_r", [])))
    assert got == _naive(left, right, lo, hi)
