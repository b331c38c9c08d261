"""Size-based shuffle→broadcast join auto-dispatch (stages/relational.py).

shuffle_join must return identical rows whether the right side dispatches
to the broadcast path (footer-stats small) or runs Ray's native hash join —
the r4 fix for the aggregator cold-start dominating small joins.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_filter_timestamp_format_ray.stages.relational import (
    _dataset_file_bytes,
    shuffle_join,
)


@pytest.fixture(scope="module")
def sides(ray_session, tmp_path_factory):
    import ray.data

    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("join")
    left_tbl = pa.table({
        "k": pa.array(rng.integers(0, 50, 2000), pa.int64()),
        "lv": pa.array(rng.standard_normal(2000)),
    })
    # some right keys unmatched on the left, some left keys unmatched on the
    # right (k>=40 absent), duplicate right keys for m:n fanout
    right_tbl = pa.table({
        "rk": pa.array(list(range(40)) * 2, pa.int64()),
        "rv": pa.array(rng.integers(0, 1000, 80), pa.int64()),
    })
    pq.write_table(left_tbl, str(d / "left.parquet"))
    pq.write_table(right_tbl, str(d / "right.parquet"))
    return str(d / "left.parquet"), str(d / "right.parquet")


def _run(sides, how, auto):
    import ray.data

    lp, rp = sides
    out = shuffle_join(ray.data.read_parquet(lp), ray.data.read_parquet(rp),
                       on="k", right_on="rk", how=how,
                       auto_broadcast_bytes=auto,
                       num_partitions=None if auto else 2)
    df = out.to_pandas()
    cols = sorted(c for c in df.columns if c in ("k", "lv", "rv"))
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_file_bytes_probe(sides, ray_session):
    import ray.data

    lp, rp = sides
    est = _dataset_file_bytes(ray.data.read_parquet(rp))
    assert est is not None and 0 < est < 100 * os.path.getsize(rp)
    # the probe must survive plan rewrites (select_columns broke
    # input_files(), the motivating bug)
    est2 = _dataset_file_bytes(
        ray.data.read_parquet(rp).select_columns(["rk"]))
    assert est2 == est
    # in-memory datasets have no sized Read leaf → None → never broadcast
    assert _dataset_file_bytes(ray.data.from_items([{"a": 1}])) is None


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_dispatch_parity(sides, ray_session, how):
    bc = _run(sides, how, auto=1 << 30)   # forces broadcast path
    sh = _run(sides, how, auto=None)      # forces native shuffle path
    assert len(bc) == len(sh)
    for c in bc.columns:
        a, b = bc[c].to_numpy(), sh[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, equal_nan=True)
        else:
            assert (a == b).all() or (
                (pa.array(a).is_null() == pa.array(b).is_null()).to_pylist()
                and all(x == y for x, y in zip(a, b)
                        if x == x and y == y))


def test_outer_types_never_broadcast(sides, ray_session):
    """right/full outer must stay on the shuffle path (per-batch broadcast
    can't see the global unmatched-right set) — just assert they run and
    carry the unmatched rows."""
    import ray.data

    lp, rp = sides
    out = shuffle_join(ray.data.read_parquet(lp), ray.data.read_parquet(rp),
                       on="k", right_on="rk", how="full_outer",
                       auto_broadcast_bytes=1 << 30)
    df = out.to_pandas()
    n_left = pq.read_table(lp).num_rows
    assert len(df) > n_left  # unmatched right keys present exactly once each


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_null_key_parity(ray_session, tmp_path, how):
    """SQL null semantics (null keys never match) must be identical on both
    sides of the dispatch boundary."""
    import ray.data

    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2, None, 3], pa.int64()),
                             "lv": [10, 20, 30, 40]}), lp)
    pq.write_table(pa.table({"rk": pa.array([1, None, 3], pa.int64()),
                             "rv": [100, 200, 300]}), rp)

    def run(auto):
        out = shuffle_join(ray.data.read_parquet(lp),
                           ray.data.read_parquet(rp),
                           on="k", right_on="rk", how=how,
                           auto_broadcast_bytes=auto,
                           num_partitions=None if auto else 2)
        return out.to_pandas().sort_values("lv").reset_index(drop=True)

    bc, sh = run(1 << 30), run(None)
    assert list(bc["lv"]) == list(sh["lv"])
    assert bc["rv"].fillna(-1).tolist() == sh["rv"].fillna(-1).tolist()
    if how == "inner":
        assert list(bc["lv"]) == [10, 40]  # null key row dropped
    else:
        assert list(bc["lv"]) == [10, 20, 30, 40]  # kept, rv null
