"""Interval (range) join: broadcast tier vs granule-shuffle tier parity,
overlap semantics, and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(ray, n_events=500, n_iv=12, seed=5):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 1_000_000, size=n_events).astype(np.int64)
    ev = pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts_us": pa.array(ts),
        "value": pa.array(rng.integers(0, 100, size=n_events)
                          .astype(np.int64)),
    })
    starts = rng.integers(0, 950_000, size=n_iv).astype(np.int64)
    lengths = rng.integers(1_000, 200_000, size=n_iv).astype(np.int64)
    iv = pa.table({
        "window_id": pa.array(np.arange(n_iv, dtype=np.int64)),
        "start": pa.array(starts),
        "end": pa.array(starts + lengths),  # overlapping by construction
    })
    return ray.data.from_arrow(ev), iv


def _naive(ev_tbl: pa.Table, iv_tbl: pa.Table) -> pd.DataFrame:
    ev = ev_tbl.to_pandas()
    iv = iv_tbl.to_pandas()
    rows = []
    for e in ev.itertuples():
        for w in iv.itertuples():
            if w.start <= e.ts_us < w.end:
                rows.append((e.event_id, e.ts_us, e.value, w.window_id))
    return pd.DataFrame(rows, columns=["event_id", "ts_us", "value",
                                       "window_id"]) \
        .sort_values(["event_id", "window_id"]).reset_index(drop=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["event_id", "window_id"]).reset_index(drop=True) \
        .astype({"event_id": "int64", "window_id": "int64"})


def test_broadcast_matches_naive(ray_session):
    import ray

    ev_ds, iv = _mk(ray)
    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    got = _canon(range_join(ev_ds, iv, ts_col="ts_us").to_pandas()
                 [["event_id", "ts_us", "value", "window_id"]])
    want = _canon(_naive(pa.concat_tables(
        [ray.get(r) for r in ev_ds.to_arrow_refs()]), iv))
    pd.testing.assert_frame_equal(got, want)


def test_granular_matches_broadcast(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    ev_ds, iv = _mk(ray, n_events=800, n_iv=20, seed=11)
    b = _canon(range_join(ev_ds, iv, ts_col="ts_us").to_pandas()
               [["event_id", "ts_us", "value", "window_id"]])
    # granule much smaller than intervals → heavy replication, still exact
    g = _canon(range_join(ev_ds, iv, ts_col="ts_us",
                          granule_us=10_000).to_pandas()
               [["event_id", "ts_us", "value", "window_id"]])
    pd.testing.assert_frame_equal(g, b)
    # granule larger than every interval → ≤2 replicas each, still exact
    g2 = _canon(range_join(ev_ds, iv, ts_col="ts_us",
                           granule_us=500_000).to_pandas()
                [["event_id", "ts_us", "value", "window_id"]])
    pd.testing.assert_frame_equal(g2, b)


def test_event_in_overlapping_intervals_matches_all(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts_us": pa.array([50], pa.int64())}))
    iv = pa.table({"window_id": pa.array([10, 20, 30], pa.int64()),
                   "start": pa.array([0, 40, 60], pa.int64()),
                   "end": pa.array([100, 55, 70], pa.int64())})
    out = range_join(ev, iv, ts_col="ts_us").to_pandas()
    assert sorted(out["window_id"]) == [10, 20]  # 30 starts after ts
    # end is exclusive, start inclusive
    ev2 = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts_us": pa.array([40, 55], pa.int64())}))
    out2 = range_join(ev2, iv.filter(
        pa.array([False, True, False])), ts_col="ts_us").to_pandas()
    assert out2["event_id"].tolist() == [1]  # 55 == end excluded


def test_no_match_yields_empty(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts_us": pa.array([5], pa.int64())}))
    iv = pa.table({"window_id": pa.array([1], pa.int64()),
                   "start": pa.array([100], pa.int64()),
                   "end": pa.array([200], pa.int64())})
    assert range_join(ev, iv, ts_col="ts_us").count() == 0
    assert range_join(ev, iv, ts_col="ts_us",
                      granule_us=50).count() == 0


def test_timestamp_typed_columns(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1_000_000, 10_000_000],
                       pa.timestamp("us"))}))
    iv = pa.table({"window_id": pa.array([7], pa.int64()),
                   "start": pa.array([0], pa.timestamp("us")),
                   "end": pa.array([5_000_000], pa.timestamp("us"))})
    out = range_join(ev, iv, ts_col="ts",
                     granule_us=1_000_000).to_pandas()
    assert out["event_id"].tolist() == [1]
    assert out["window_id"].tolist() == [7]


def test_interval_exactly_on_granule_boundary(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    # interval [100, 200) with granule 100: covers granules 1 only
    # (end exclusive — granule 2 must NOT see it); events at 100, 199, 200
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts_us": pa.array([100, 199, 200], pa.int64())}))
    iv = pa.table({"window_id": pa.array([5], pa.int64()),
                   "start": pa.array([100], pa.int64()),
                   "end": pa.array([200], pa.int64())})
    out = range_join(ev, iv, ts_col="ts_us", granule_us=100).to_pandas()
    assert sorted(out["event_id"]) == [1, 2]


def test_zero_length_interval_matches_nothing(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import range_join

    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts_us": pa.array([50], pa.int64())}))
    iv = pa.table({"window_id": pa.array([1], pa.int64()),
                   "start": pa.array([50], pa.int64()),
                   "end": pa.array([50], pa.int64())})
    assert range_join(ev, iv, ts_col="ts_us").count() == 0
    assert range_join(ev, iv, ts_col="ts_us", granule_us=10).count() == 0
