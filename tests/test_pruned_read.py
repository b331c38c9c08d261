"""Predicate-pushdown lake reads: ``read_lake(where=[Constraint...])``.

Contract under test:

* ``where`` is an AND of constraint specs evaluated on FOLDED live state
  with SQL semantics (NULL never matches) — the result equals the
  unfiltered read post-filtered by the same mask, bit for bit
* partitions whose parquet footer min/max stats prove no row can match
  ANY one of the AND'd specs are skipped without reading a data byte
  (the delete_where prune machinery, flipped to conjunction)
* the fold path (pending deltas + deletion vectors) and the clean-lake
  path agree; a where column the lake lacks yields an empty result
* column pruning composes: requested columns come back, where-only
  columns are dropped after filtering
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    parse_constraint,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    evolve_batch,
    expected_event_table,
)


def _lake(tmp_path, n=1200, partitions=4, delta_tail=False, dv=False):
    import ray.data

    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=partitions)
    if delta_tail:
        pipe.apply(ray.data.from_arrow(ev.slice(0, n // 2)))
        pipe.apply_delta(ray.data.from_arrow(ev.slice(n // 2)))
    else:
        pipe.apply(ray.data.from_arrow(ev))
    if dv:
        gone = parse_constraint("turn_idx:between:50,")
        pipe.delete_where(gone.matches, mode="dv")
    return pipe


def _collect(ds) -> pa.Table:
    tbls = [b for b in ds.iter_batches(batch_format="pyarrow")]
    if tbls:
        t = pa.concat_tables(tbls, promote_options="permissive")
    else:
        # iter_batches drops empty blocks; the dataset still carries the
        # lake schema — materialize it as an empty table
        sch = ds.schema()
        t = pa.Table.from_pylist(
            [], schema=pa.schema(zip(sch.names, sch.types)))
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _mask(specs, t: pa.Table) -> np.ndarray:
    m = np.ones(t.num_rows, dtype=bool)
    for c in specs:
        m &= c.matches(t)
    return m


@pytest.mark.parametrize("shape", ["clean", "delta", "dv"])
def test_where_read_equals_post_filter(ray_session, tmp_path, shape):
    pipe = _lake(tmp_path, delta_tail=(shape == "delta"),
                 dv=(shape == "dv"))
    specs = [parse_constraint("turn_idx:between:5,40"),
             parse_constraint("role:in:tool,assistant")]
    full = _collect(pipe.read_lake())
    expected = full.filter(pa.array(_mask(specs, full)))
    assert 0 < expected.num_rows < full.num_rows
    got = _collect(pipe.read_lake(where=specs))
    assert got.equals(expected)


def test_where_composes_with_column_pruning(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    specs = [parse_constraint("turn_idx:between:,10")]
    got = pa.concat_tables(
        [b for b in pipe.read_lake(columns=["conv_id", "role"], where=specs)
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    assert got.schema.names == ["conv_id", "role"]
    got = got.sort_by([("conv_id", "ascending"), ("role", "ascending")])
    full = _collect(pipe.read_lake())
    expected = full.filter(pa.array(_mask(specs, full))) \
        .select(["conv_id", "role"]) \
        .sort_by([("conv_id", "ascending"), ("role", "ascending")])
    assert got.equals(expected)


def test_where_impossible_range_is_empty_and_pruned(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    specs = [parse_constraint("turn_idx:between:10000,")]
    got = _collect(pipe.read_lake(where=specs))
    assert got.num_rows == 0
    # schema is still the lake schema (empty, not missing)
    assert "conv_id" in got.schema.names


def test_where_unknown_column_is_empty(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    # 'lang' is not in this lake's schema: NULL never matches, and the
    # footer prune proves it from metadata alone
    got = _collect(pipe.read_lake(where=[parse_constraint("lang:in:en")]))
    assert got.num_rows == 0


def test_where_null_never_matches(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    full = _collect(pipe.read_lake())
    n_null = full.column("tool").null_count
    assert n_null > 0
    got = _collect(pipe.read_lake(where=[
        parse_constraint("tool:not_null")]))
    assert got.num_rows == full.num_rows - n_null


def _rewrite_bases_small_row_groups(pipe, rows_per_group=64):
    """Rewrite every base file IN PLACE with small row groups (same rows,
    same order, same path — the manifest records paths + row counts, not
    byte sizes) so zone-map tests see multi-group files at fixture scale."""
    import pyarrow.parquet as pq

    from embulk_filter_timestamp_format_ray.state import manifest as mf

    manifest = mf.read_manifest(pipe.lake_dir)
    paths = []
    for p in manifest["partitions"].values():
        if p.get("path"):
            full = os.path.join(pipe.lake_dir, p["path"])
            t = pq.read_table(full)
            pq.write_table(t, full, compression="zstd",
                           row_group_size=rows_per_group)
            paths.append(full)
    return paths


def test_matching_row_groups_zone_map(ray_session, tmp_path):
    """The per-file zone map: merge-key-sorted bases give selective
    conv_id ranges per row group; the helper keeps exactly the groups a
    conv-band can touch, keeps everything for un-prunable kinds, and
    keeps nothing for a column the file lacks."""
    import pyarrow.parquet as pq

    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        _matching_row_groups,
    )

    pipe = _lake(tmp_path)
    paths = _rewrite_bases_small_row_groups(pipe, rows_per_group=64)
    multi = [p for p in paths
             if pq.ParquetFile(p).metadata.num_row_groups > 1]
    assert multi, "fixture lake should yield multi-row-group bases"
    pruned_somewhere = False
    for path in multi:
        pf = pq.ParquetFile(path)
        n = pf.metadata.num_row_groups
        # a one-conversation point band: sorted bases localize it
        first_conv = pf.read_row_group(0, columns=["conv_id"]) \
            .column("conv_id")[0].as_py()
        keep = _matching_row_groups(
            pf, [parse_constraint(f"conv_id:in:{first_conv}")])
        assert keep and 0 in keep
        if len(keep) < n:
            pruned_somewhere = True
        # un-prunable kind: conservative, keeps every group
        assert _matching_row_groups(
            pf, [parse_constraint("text:matches:x")]) == list(range(n))
        # column the file lacks: NULL never matches, keeps nothing
        assert _matching_row_groups(
            pf, [parse_constraint("lang:in:en")]) == []
    assert pruned_somewhere, "conv band should skip groups in sorted bases"


def test_where_read_equals_post_filter_multi_row_group(ray_session,
                                                       tmp_path):
    """End to end over multi-row-group bases: the zone-map read (clean
    partitions route through row-group pruning) returns exactly the
    post-filtered state, including a band that straddles group
    boundaries."""
    pipe = _lake(tmp_path, n=2000)
    _rewrite_bases_small_row_groups(pipe, rows_per_group=64)
    full = _collect(pipe.read_lake())
    lo, hi = "conv-00000002", "conv-00000007"
    specs = [parse_constraint(f"conv_id:between:{lo},{hi}"),
             parse_constraint("turn_idx:between:,35")]
    expected = full.filter(pa.array(_mask(specs, full)))
    assert 0 < expected.num_rows < full.num_rows
    got = _collect(pipe.read_lake(where=specs))
    assert got.equals(expected)


@pytest.mark.parametrize("shape", ["clean", "delta", "dv"])
def test_count_rows_equals_read_count(ray_session, tmp_path, shape):
    pipe = _lake(tmp_path, delta_tail=(shape == "delta"),
                 dv=(shape == "dv"))
    full = _collect(pipe.read_lake())
    assert pipe.count_rows() == full.num_rows
    specs = [parse_constraint("turn_idx:between:5,40")]
    assert pipe.count_rows(where=specs) == int(_mask(specs, full).sum())
    assert pipe.count_rows(where=[parse_constraint("lang:in:en")]) == 0


def test_count_rows_clean_lake_is_metadata_only(ray_session, tmp_path):
    """On a lake with no pending deltas/dvs the count must come from the
    manifest alone — no fold dataset is ever constructed."""
    pipe = _lake(tmp_path)
    full = _collect(pipe.read_lake())

    def boom(*a, **k):
        raise AssertionError("clean-lake count_rows must not fold")

    pipe._fold_dataset = boom
    assert pipe.count_rows() == full.num_rows


def test_where_on_evolved_column_skips_pre_evolution_rows(
        ray_session, tmp_path):
    import ray.data

    n = 1200
    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(ev.slice(0, n // 2)))
    # widen: the second half carries a 'lang' column
    pipe.apply(ray.data.from_arrow(evolve_batch(ev.slice(n // 2),
                                                from_lsn=n // 2)))
    full = _collect(pipe.read_lake())
    assert full.column("lang").null_count > 0  # pre-evolution rows pad NULL
    specs = [parse_constraint("lang:in:en")]
    got = _collect(pipe.read_lake(where=specs))
    expected = full.filter(pa.array(_mask(specs, full)))
    assert got.num_rows == expected.num_rows > 0
    assert set(pc.unique(got.column("lang")).to_pylist()) == {"en"}
