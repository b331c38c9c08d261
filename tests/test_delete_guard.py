"""Mass-delete circuit breaker (CDCPipeline max_delete_fraction).

Contract under test:

* a commit whose tombstone share exceeds the threshold is REFUSED before
  the manifest swap — lake state and version unchanged, staged txn files
  orphaned (GC-reclaimable)
* under-threshold traffic commits normally; replayed tombstones at or
  below the watermark do not count (they apply nothing)
* the guard fires identically on the delta write path and the actor
  exchange
* in the multi-table fan-out, ANY lake tripping refuses the WHOLE
  fan-out before any lake commits (no partial multi-tenant state)
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    MassDeleteError,
    apply_multi,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def _tombstone_heavy(n=600, from_lsn=0):
    """Every second event an explicit delete — the upstream-TRUNCATE /
    bad-producer-filter accident shape."""
    ev = expected_event_table(n)
    ops = ["delete" if i % 2 else "upsert" for i in range(n)]
    i = ev.schema.get_field_index("op")
    ev = ev.set_column(i, "op", pa.array(ops))
    if from_lsn:
        j = ev.schema.get_field_index("lsn")
        ev = ev.set_column(j, "lsn", pc.add(
            ev.column("lsn"), pa.scalar(from_lsn, pa.int64())))
    return ev


def test_guard_refuses_and_commits_nothing(ray_session, tmp_path):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4,
                       max_delete_fraction=0.3)
    pipe.apply(ray.data.from_arrow(expected_event_table(600)))
    v0 = mf.read_manifest(pipe.lake_dir)["version"]
    before = pipe.final_state_sorted()

    with pytest.raises(MassDeleteError, match="tombstones"):
        pipe.apply(ray.data.from_arrow(_tombstone_heavy(from_lsn=600)))
    assert mf.read_manifest(pipe.lake_dir)["version"] == v0
    assert pipe.final_state_sorted().equals(before)

    # the organic stream (few deletes) stays under the threshold
    pipe.apply(ray.data.from_arrow(
        expected_event_table(1200).slice(600)))
    assert mf.read_manifest(pipe.lake_dir)["version"] == v0 + 1


def test_replayed_tombstones_do_not_count(ray_session, tmp_path):
    import ray.data

    heavy = _tombstone_heavy()
    loose = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    loose.apply(ray.data.from_arrow(heavy))
    # replaying the SAME tombstone-heavy batch applies nothing — the
    # guard must not trip on a pure replay (deletes at/below watermark)
    strict = CDCPipeline.from_lake(loose.lake_dir, max_delete_fraction=0.1)
    res = strict.apply(ray.data.from_arrow(heavy))
    assert res["events_applied"] == 0


def test_guard_on_delta_and_actor_paths(ray_session, tmp_path):
    import ray.data

    for i, kwargs in enumerate((dict(), dict(exchange="actor"))):
        pipe = CDCPipeline(str(tmp_path / f"lake{i}"), num_partitions=2,
                           max_delete_fraction=0.3)
        pipe.apply(ray.data.from_arrow(expected_event_table(400)))
        v0 = mf.read_manifest(pipe.lake_dir)["version"]
        bad = ray.data.from_arrow(_tombstone_heavy(400, from_lsn=400))
        with pytest.raises(MassDeleteError):
            if kwargs:
                pipe.apply(bad, **kwargs)
            else:
                pipe.apply_delta(bad)
        assert mf.read_manifest(pipe.lake_dir)["version"] == v0


def test_fanout_refuses_all_lakes_before_any_commit(ray_session, tmp_path):
    import ray.data

    # _tombstone_heavy puts every delete on an ODD row index, so the
    # parity tag routes ALL tombstones to the "odd" lake — guard that one
    pipes = {
        "even": CDCPipeline(str(tmp_path / "even"), num_partitions=2),
        "odd": CDCPipeline(str(tmp_path / "odd"), num_partitions=2,
                           max_delete_fraction=0.3),
    }
    ev = _tombstone_heavy(600)
    tag = pa.array(["even" if i % 2 == 0 else "odd"
                    for i in range(ev.num_rows)])
    with pytest.raises(MassDeleteError):
        apply_multi(ray.data.from_arrow(ev.append_column("table", tag)),
                    pipes)
    # the UNGUARDED lake must not have committed either (no partial fan-out)
    for p in pipes.values():
        assert mf.read_manifest(p.lake_dir).get("version", 0) == 0


def test_threshold_validation(tmp_path):
    for bad in (0.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="max_delete_fraction"):
            CDCPipeline(str(tmp_path / "x"), num_partitions=2,
                        max_delete_fraction=bad)
