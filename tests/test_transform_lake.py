"""Distributed UPDATE / backfill (CDCPipeline.transform_lake).

Contract under test:

* fn rewrites every partition's live state as ONE exactly-once commit;
  watermarks unchanged (no binlog events applied), delta backlogs folded
  and cleared (a transform is also a compaction)
* fn may change value columns and ADD columns (widen-only evolution picks
  them up); it may not change keys, lsns, or the row count — violations
  raise and nothing commits
* the pre-transform version stays time-travel readable; applies after a
  transform compose normally (replay semantics untouched)
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf
from tests.test_schema_evolution import _split, _with_lang


def _evolved_lake(tmp_path, n=1600, cut=800, partitions=4,
                  second_as_delta=False):
    import ray.data

    full = expected_event_table(n)
    lo, hi = _split(full, cut)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=partitions)
    pipe.apply(ray.data.from_arrow(lo))
    apply2 = pipe.apply_delta if second_as_delta else pipe.apply
    apply2(ray.data.from_arrow(_with_lang(hi)))
    return pipe


def _make_fill_lang():
    """Built inside a factory so cloudpickle ships it by VALUE — a test-
    module-level function would pickle by reference and fail to import on
    workers."""
    import pyarrow.compute as _pc

    def fill_lang(state):
        i = state.schema.get_field_index("lang")
        return state.set_column(i, "lang",
                                _pc.fill_null(state.column("lang"), "und"))
    return fill_lang


def test_backfill_fills_evolved_nulls(ray_session, tmp_path):
    pipe = _evolved_lake(tmp_path)
    m0 = mf.read_manifest(pipe.lake_dir)
    wm0 = {p: m["last_applied_lsn"] for p, m in m0["partitions"].items()}
    before = pipe.final_state_sorted()

    res = pipe.transform_lake(_make_fill_lang())
    assert res["partitions_transformed"] > 0

    m1 = mf.read_manifest(pipe.lake_dir)
    assert m1["version"] == m0["version"] + 1
    # watermarks untouched: a transform applies no events
    assert {p: m["last_applied_lsn"]
            for p, m in m1["partitions"].items()} == wm0

    after = pipe.final_state_sorted()
    assert after.num_rows == before.num_rows
    assert pc.count(after.column("lang"), mode="only_null").as_py() == 0
    exp = pc.fill_null(before.column("lang"), "und")
    assert after.column("lang").to_pylist() == exp.to_pylist()

    # pre-transform version stays readable
    old = pipe.read_lake_at(m0["version"])
    got_nulls = sum(1 for v in
                    pa.concat_tables(
                        [b for b in old.iter_batches(batch_format="pyarrow")],
                        promote_options="permissive")
                    .column("lang").to_pylist() if v is None)
    assert got_nulls > 0
    assert pipe.fsck()["violations"] == []


def test_transform_introduces_column(ray_session, tmp_path):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(800)))

    def add_len(state: pa.Table) -> pa.Table:
        return state.append_column(
            "text_len", pc.cast(pc.utf8_length(state.column("text")),
                                pa.int64()))

    pipe.transform_lake(add_len)
    m = mf.read_manifest(pipe.lake_dir)
    assert m["schema_columns"][-1] == "text_len"
    final = pipe.final_state_sorted()
    got = final.column("text_len").to_pylist()
    exp = [len(t) for t in final.column("text").to_pylist()]
    assert got == exp
    assert pipe.fsck()["violations"] == []


def test_transform_folds_and_clears_delta_backlog(ray_session, tmp_path):
    pipe = _evolved_lake(tmp_path, second_as_delta=True)
    assert mf.has_deltas(mf.read_manifest(pipe.lake_dir))
    before = pipe.final_state_sorted()
    pipe.transform_lake(_make_fill_lang())
    m = mf.read_manifest(pipe.lake_dir)
    assert not mf.has_deltas(m)
    after = pipe.final_state_sorted()
    assert after.num_rows == before.num_rows
    assert pc.count(after.column("lang"), mode="only_null").as_py() == 0


@pytest.mark.parametrize("bad_fn, match", [
    (lambda s: s.slice(0, max(s.num_rows - 1, 0)), "row count"),
    (lambda s: s.set_column(
        s.schema.get_field_index("lsn"), "lsn",
        pa.array(np.asarray(s.column("lsn").combine_chunks()
                            .cast(pa.int64())) + 1)), "immutable"),
    (lambda s: s.drop_columns(["text"]), "core column"),
])
def test_transform_contract_violations_commit_nothing(ray_session, tmp_path,
                                                      bad_fn, match):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=2)
    pipe.apply(ray.data.from_arrow(expected_event_table(400)))
    m0 = mf.read_manifest(pipe.lake_dir)
    with pytest.raises(Exception, match=match):
        pipe.transform_lake(bad_fn)
    assert mf.read_manifest(pipe.lake_dir) == m0  # nothing committed


def test_apply_after_transform_composes(ray_session, tmp_path):
    """Transform introduces a column mid-history, then the stream keeps
    flowing: rows untouched afterwards keep the backfill, rows updated by
    later events take the event's value — identical to evolution-then-
    backfill in any order."""
    import ray.data

    full = expected_event_table(1200)
    lo, hi = _split(full, 600)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(lo))
    pipe.transform_lake(lambda s: s.append_column(
        "lang", pa.array(["und"] * s.num_rows)))
    pipe.apply(ray.data.from_arrow(_with_lang(hi)))

    # reference: no transform — winners below the boundary read lang NULL
    ref = CDCPipeline(str(tmp_path / "ref"), num_partitions=4)
    ref.apply(ray.data.from_arrow(lo))
    ref.apply(ray.data.from_arrow(_with_lang(hi)))

    a = pipe.final_state_sorted()
    b = ref.final_state_sorted()
    assert a.num_rows == b.num_rows
    for col in ("conv_id", "turn_idx", "role", "text", "tool", "lsn"):
        assert a.column(col).to_pylist() == b.column(col).to_pylist()
    fixed = [x if x is not None else "und"
             for x in b.column("lang").to_pylist()]
    assert a.column("lang").to_pylist() == fixed
