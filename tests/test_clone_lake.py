"""Zero-copy shallow clone (CDCPipeline.clone_lake).

Contract under test:

* the clone reads identically to the source at clone time, with ZERO data
  copied (txn dirs are symlinks into the source)
* clone and source are independent writer domains afterwards: commits on
  one are invisible to the other
* clone GC removes only the clone's symlinks, never the source's files;
  a repartition on the clone deepens it (all-local files)
* retained history copies over (time travel inside the clone); evolved
  schemas clone intact
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf
from tests.test_schema_evolution import _split, _with_lang


def _mk_lake(tmp_path, n=1200, partitions=4, retain=8):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "src"), num_partitions=partitions,
                       time_travel_retain=retain)
    full = expected_event_table(n)
    lo, hi = _split(full, n // 2)
    pipe.apply(ray.data.from_arrow(lo))
    pipe.apply(ray.data.from_arrow(hi))
    return pipe, full


def test_clone_reads_identically_zero_copy(ray_session, tmp_path):
    pipe, _ = _mk_lake(tmp_path)
    dest = str(tmp_path / "clone")
    res = pipe.clone_lake(dest)
    assert res["txn_dirs_linked"] > 0

    clone = CDCPipeline.from_lake(dest)
    assert clone.final_state_sorted().equals(pipe.final_state_sorted())
    # zero copy: every txn dir in the clone is a symlink, no parquet bytes
    txns = [d for d in os.listdir(dest) if d.startswith("txn-")]
    assert txns and all(os.path.islink(os.path.join(dest, d)) for d in txns)
    assert clone.fsck()["violations"] == []
    # time travel to the pre-clone version works inside the clone
    assert clone.read_lake_at(1).count() > 0


def test_clone_and_source_are_independent_writers(ray_session, tmp_path):
    import ray.data

    pipe, full = _mk_lake(tmp_path, n=1600)
    dest = str(tmp_path / "clone")
    pipe.clone_lake(dest)
    clone = CDCPipeline.from_lake(dest)
    at_clone = clone.final_state_sorted()

    # grow the SOURCE: clone must not see it
    more = expected_event_table(2400)
    tail = more.filter(pc.greater_equal(more.column("lsn"),
                                        pa.scalar(1600, pa.int64())))
    pipe.apply(ray.data.from_arrow(tail))
    assert clone.final_state_sorted().equals(at_clone)

    # grow the CLONE: source must not see it, and the clone's new txn is a
    # real local dir among the symlinks
    src_state = pipe.final_state_sorted()
    clone.apply(ray.data.from_arrow(tail))
    assert pipe.final_state_sorted().equals(src_state)
    new_dirs = [d for d in os.listdir(dest) if d.startswith("txn-")
                and not os.path.islink(os.path.join(dest, d))]
    assert new_dirs
    # both converge to the same logical state (same events applied)
    assert clone.final_state_sorted().equals(src_state)


def test_clone_gc_never_touches_source_files(ray_session, tmp_path):
    import ray.data

    pipe, _ = _mk_lake(tmp_path, n=800, retain=2)
    dest = str(tmp_path / "clone")
    pipe.clone_lake(dest)
    src_files = {os.path.join(dp, f)
                 for dp, _, fs in os.walk(pipe.lake_dir) for f in fs}

    clone = CDCPipeline.from_lake(dest, time_travel_retain=2,
                                  auto_gc=False)
    # deepen: repartition rewrites every partition into clone-local files,
    # then rotate history so the symlinked txns leave the retained window
    clone.repartition_lake(6)
    more = expected_event_table(1600)
    for lo, hi in ((800, 1200), (1200, 1600)):
        chunk = more.filter(pc.and_(
            pc.greater_equal(more.column("lsn"), pa.scalar(lo, pa.int64())),
            pc.less(more.column("lsn"), pa.scalar(hi, pa.int64()))))
        clone.apply(ray.data.from_arrow(chunk))

    removed = clone.gc()
    assert removed, "rotated symlinked txns should be collectable"
    # every removed entry was a symlink; the source lost NOTHING
    still = {os.path.join(dp, f)
             for dp, _, fs in os.walk(pipe.lake_dir) for f in fs}
    assert src_files <= still
    assert pipe.fsck()["violations"] == []
    assert clone.fsck()["violations"] == []


def test_clone_preserves_evolved_schema(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(1000)
    lo, hi = _split(full, 500)
    pipe = CDCPipeline(str(tmp_path / "src"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(lo))
    pipe.apply(ray.data.from_arrow(_with_lang(hi)))
    dest = str(tmp_path / "clone")
    pipe.clone_lake(dest)
    clone = CDCPipeline.from_lake(dest)
    m = mf.read_manifest(dest)
    assert m["schema_columns"][-1] == "lang"
    assert m["cloned_from"]["version"] == 2
    assert clone.final_state_sorted().equals(pipe.final_state_sorted())


def test_clone_refuses_empty_source_and_existing_dest(ray_session, tmp_path):
    empty = CDCPipeline(str(tmp_path / "empty"), num_partitions=2)
    with pytest.raises(ValueError, match="no committed state"):
        empty.clone_lake(str(tmp_path / "x"))

    pipe, _ = _mk_lake(tmp_path, n=400)
    dest = str(tmp_path / "clone")
    pipe.clone_lake(dest)
    with pytest.raises(ValueError, match="already holds"):
        pipe.clone_lake(dest)
