"""Incrementally-maintained transcript materialization
(pipelines/views.py transcript_view).

Contract under test:

* the view equals a full assemble_conversations over the lake after any
  refresh sequence (the disjoint per-partition assembly is exact on an
  unsalted conv-mode lake)
* refresh cost ∝ touched partitions: an incremental micro-batch
  recomputes only the partitions it rewrote; a no-change refresh
  recomputes zero
* deletes propagate (an erased conversation leaves the view)
* salted / turn-mode lakes are refused (a conversation would split)
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.pipelines.transcripts import (
    assemble_conversations,
)
from embulk_filter_timestamp_format_ray.pipelines.views import transcript_view
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)


def _docs_dict(ds) -> dict:
    tbl = pa.concat_tables([b for b in ds.iter_batches(batch_format="pyarrow")],
                           promote_options="permissive")
    return {c: (n, t) for c, n, t in zip(tbl.column("conv_id").to_pylist(),
                                         tbl.column("n_turns").to_pylist(),
                                         tbl.column("transcript").to_pylist())}


def test_view_matches_full_assembly_incrementally(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(2000)
    cut = pa.scalar(1000, pa.int64())
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=8, partition_mode="conv")
    view = transcript_view(lake, str(tmp_path / "view"))

    pipe.apply(ray.data.from_arrow(full.filter(
        pc.less(full.column("lsn"), cut))))
    r1 = view.refresh()
    assert r1["recomputed"] > 0

    pipe.apply(ray.data.from_arrow(full.filter(
        pc.greater_equal(full.column("lsn"), cut))))
    r2 = view.refresh()
    assert r2["recomputed"] > 0

    got = _docs_dict(view.read())
    ref = _docs_dict(assemble_conversations(
        pipe.read_lake(columns=["conv_id", "turn_idx", "role", "text"])))
    assert got == ref

    # no lake change → zero recompute, same content
    r3 = view.refresh()
    assert r3["recomputed"] == 0 and r3["cached"] > 0
    assert _docs_dict(view.read()) == ref


def test_view_refresh_cost_tracks_touched_partitions(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(2000)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=16, partition_mode="conv")
    view = transcript_view(lake, str(tmp_path / "view"))
    pipe.apply(ray.data.from_arrow(full))
    view.refresh()

    # touch ONE conversation → one partition rewritten → one recompute
    conv = full.column("conv_id")[0].as_py()
    one = pa.table({
        "lsn": pa.array([99_999], pa.int64()),
        "op": pa.array(["upsert"]),
        "conv_id": pa.array([conv]),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"]), "text": pa.array(["edited"]),
        "tool": pa.array([None], pa.string()),
        "ts_raw": pa.array(["1000"]),
        "schema_epoch": pa.array([0], pa.int8()),
    })
    pipe.apply(ray.data.from_arrow(one))
    r = view.refresh()
    assert r["recomputed"] == 1
    docs = _docs_dict(view.read())
    assert "edited" in docs[conv][1]


def test_view_drops_erased_conversation(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(1000)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=8, partition_mode="conv")
    view = transcript_view(lake, str(tmp_path / "view"))
    pipe.apply(ray.data.from_arrow(full))
    view.refresh()
    conv = sorted(set(full.column("conv_id").to_pylist()))[0]
    assert conv in _docs_dict(view.read())

    tomb = pa.table({
        "lsn": pa.array([88_888], pa.int64()),
        "op": pa.array(["delete_conv"]),
        "conv_id": pa.array([conv]),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts_raw": pa.array([None], pa.string()),
        "schema_epoch": pa.array([0], pa.int8()),
    })
    pipe.apply(ray.data.from_arrow(tomb))
    view.refresh()
    assert conv not in _docs_dict(view.read())


def test_view_refuses_salted_and_turn_mode(ray_session, tmp_path):
    import ray.data

    salted = CDCPipeline(str(tmp_path / "salted"), num_partitions=4,
                         partition_mode="conv",
                         salt_keys=frozenset({"conv-00000000"}),
                         salt_factor=4)
    salted.apply(ray.data.from_arrow(expected_event_table(200)))
    with pytest.raises(ValueError, match="conv-mode"):
        transcript_view(salted.lake_dir, str(tmp_path / "v1")).refresh()

    turn = CDCPipeline(str(tmp_path / "turn"), num_partitions=4)
    turn.apply(ray.data.from_arrow(expected_event_table(200)))
    with pytest.raises(ValueError, match="conv-mode"):
        transcript_view(turn.lake_dir, str(tmp_path / "v2")).refresh()
