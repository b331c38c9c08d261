"""Incremental materialized view over the CDC lake: refresh recomputes
only the partitions a micro-batch touched; folded partials equal a full
recompute."""

import os
import tempfile
import uuid

import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.pipelines.views import IncrementalView
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)


def _mk_lake(ray, n_events=2000, parts=8):
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"viewtest_lake_{run}")
    pipe = CDCPipeline(lake, num_partitions=parts)
    pipe.apply(ray.data.from_arrow(expected_event_table(n_events)))
    view_dir = os.path.join(tempfile.gettempdir(), f"viewtest_view_{run}")
    return pipe, lake, view_dir


def _one_event(lsn, conv_id, turn_idx):
    return pa.table({
        "lsn": pa.array([lsn], pa.int64()),
        "op": pa.array(["upsert"]),
        "conv_id": pa.array([conv_id]),
        "turn_idx": pa.array([turn_idx], pa.int32()),
        "role": pa.array(["user"]),
        "text": pa.array(["late edit"]),
        "tool": pa.array([None], pa.string()),
        "ts_raw": pa.array(["2015-07-12 15:00:00.000000123 UTC"]),
        "schema_epoch": pa.array([0], pa.int8()),
    })


def test_refresh_then_cached(ray_session):
    import ray

    pipe, lake, view_dir = _mk_lake(ray)
    view = IncrementalView(lake, view_dir)
    first = view.refresh()
    assert first["recomputed"] > 0 and first["cached"] == 0
    again = view.refresh()
    assert again["recomputed"] == 0
    assert again["cached"] == first["recomputed"]


def test_microbatch_recomputes_only_touched_partitions(ray_session):
    import ray

    pipe, lake, view_dir = _mk_lake(ray, n_events=2000, parts=8)
    view = IncrementalView(lake, view_dir)
    total = view.refresh()["recomputed"]
    assert total == 8
    # one late event for one existing (conv, turn) key → exactly the
    # partitions that key hashes to get rewritten (1 with the default
    # merge-key layout)
    conv = pipe.read_lake().to_pandas()["conv_id"].iloc[0]
    pipe.apply(ray.data.from_arrow(_one_event(10_000_000, conv, 0)))
    second = view.refresh()
    assert 1 <= second["recomputed"] <= 2
    assert second["recomputed"] + second["cached"] == total


def test_view_equals_full_recompute(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    pipe, lake, view_dir = _mk_lake(ray)
    view = IncrementalView(lake, view_dir)
    view.refresh()
    got = view.read().to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    want = grouped_aggregate(
        pipe.read_lake().select_columns(["conv_id", "lsn"]),
        ["conv_id"], {"n_turns": ("lsn", "count"),
                      "max_lsn": ("lsn", "max")}) \
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert got.equals(want)


def test_view_reflects_late_update(ray_session):
    import ray

    pipe, lake, view_dir = _mk_lake(ray)
    view = IncrementalView(lake, view_dir)
    view.refresh()
    conv = pipe.read_lake().to_pandas()["conv_id"].iloc[0]
    before = view.read().to_pandas().set_index("conv_id")
    # a brand-new turn for that conversation
    new_turn = int(before.loc[conv, "n_turns"]) + 50
    pipe.apply(ray.data.from_arrow(
        _one_event(20_000_000, conv, new_turn)))
    view.refresh()
    after = view.read().to_pandas().set_index("conv_id")
    assert after.loc[conv, "n_turns"] == before.loc[conv, "n_turns"] + 1
    assert after.loc[conv, "max_lsn"] == 20_000_000
    # untouched conversations unchanged
    other = [c for c in before.index if c != conv][0]
    assert after.loc[other, "n_turns"] == before.loc[other, "n_turns"]


def test_view_under_patch_and_erasure_traffic(ray_session):
    """Patches and conversation tombstones flow through the view's
    partition folds: an incremental refresh over a patched+erased lake
    equals a from-scratch recompute of the same lake."""
    import shutil

    import ray

    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table as evt,
    )

    pipe, lake, view_dir = _mk_lake(ray)
    view = IncrementalView(lake, view_dir)
    view.refresh()
    # second micro-batch carries patches and a conversation erasure
    extra = evt(3000, patch_permille=200, conv_delete_permille=8)
    lsn = extra.column("lsn")
    import pyarrow.compute as pc

    pipe.apply_delta(ray.data.from_arrow(extra.filter(
        pc.greater_equal(lsn, pa.scalar(2000, pa.int64())))))
    inc = view.refresh()
    assert inc["recomputed"] > 0
    got = view.read().to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    fresh = IncrementalView(lake, view_dir + "_fresh")
    fresh.refresh()
    want = fresh.read().to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    assert got.equals(want)
    shutil.rmtree(view_dir + "_fresh", ignore_errors=True)


def test_view_survives_repartition(ray_session, tmp_path_factory):
    """A repartition invalidates every cached partial (pids and file
    signatures change); the next refresh recomputes the NEW layout and the
    folded view equals a from-scratch recompute."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    lake = str(tmp_path_factory.mktemp("lake_view_repart"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(5000)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    view = IncrementalView(lake, lake + "_view")
    assert view.refresh()["recomputed"] == 16
    pipe.repartition_lake(8)
    assert view.refresh()["recomputed"] == 8  # every new pid recomputed
    pipe.apply(ray.data.from_arrow(full.slice(2500)))
    view.refresh()
    fresh = IncrementalView(lake, lake + "_view_fresh")
    fresh.refresh()
    a = view.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = fresh.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert a.equals(b)
