"""Durable base-file clustering: ``set_clustering(cols)``.

Contract under test:

* the clustering rewrite is a pure reorder — live state, watermarks and
  row counts are unchanged; the manifest records ``cluster_by``
* EVERY later base writer honors the committed order (base merge, delta
  compaction, delete_where rewrite, actor exchange) — the layout never
  decays; fsck's ordering tier validates the clustered order and stays
  warning-free
* row-group zone maps become selective for the clustered column: a
  ts-band ``read_lake(where=...)`` matches fewer row groups on a
  clustered lake than on an identical unclustered one
* ``set_clustering(())`` clears the property and restores merge-key
  order; rollback restores the snapshot's layout property
* an empty lake records the property metadata-only and the FIRST apply
  writes clustered bases directly
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    _matching_row_groups,
    is_lake_file_sorted,
    is_merge_key_sorted,
)
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    parse_constraint,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def _collect(ds) -> pa.Table:
    tbls = [b for b in ds.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tbls, promote_options="permissive")
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _base_paths(pipe) -> "list[str]":
    manifest = mf.read_manifest(pipe.lake_dir)
    return [os.path.join(pipe.lake_dir, p["path"])
            for p in manifest["partitions"].values() if p.get("path")]


def _lake(tmp_path, name="lake", n=1200, partitions=4, delta_tail=False):
    import ray.data

    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / name), num_partitions=partitions)
    if delta_tail:
        pipe.apply(ray.data.from_arrow(ev.slice(0, n // 2)))
        pipe.apply_delta(ray.data.from_arrow(ev.slice(n // 2)))
    else:
        pipe.apply(ray.data.from_arrow(ev))
    return pipe


def _fsck_clean(pipe):
    rep = pipe.fsck()
    assert rep["violations"] == []
    assert rep["warnings"] == []
    return rep


def test_set_clustering_is_a_pure_reorder(ray_session, tmp_path):
    pipe = _lake(tmp_path, delta_tail=True)
    before = _collect(pipe.read_lake())
    wm = mf.read_manifest(pipe.lake_dir)["partitions"]
    res = pipe.set_clustering(["ts"])
    assert res["cluster_by"] == ["ts"]
    manifest = mf.read_manifest(pipe.lake_dir)
    assert manifest["cluster_by"] == ["ts"]
    # pure reorder: same live state, same watermarks
    assert _collect(pipe.read_lake()).equals(before)
    for pid, p in manifest["partitions"].items():
        assert p["last_applied_lsn"] == wm[pid]["last_applied_lsn"]
    # every base is ts-ordered now (and NOT merge-key ordered, for any
    # partition with >1 conversation)
    for path in _base_paths(pipe):
        t = pq.read_table(path)
        assert is_lake_file_sorted(t, ["ts"])
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        assert np.all(ts[:-1] <= ts[1:])
    _fsck_clean(pipe)


def test_later_writers_keep_cluster_order(ray_session, tmp_path):
    import ray.data

    n = 1500
    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(ev.slice(0, 500)))
    pipe.set_clustering(["ts"])
    # base merge keeps the order
    pipe.apply(ray.data.from_arrow(ev.slice(500, 400)))
    _fsck_clean(pipe)
    # delta commit + compaction keep it
    pipe.apply_delta(ray.data.from_arrow(ev.slice(900, 300)))
    pipe.compact_deltas()
    _fsck_clean(pipe)
    # delete_where rewrite keeps it
    pipe.delete_where(parse_constraint("turn_idx:between:55,").matches)
    _fsck_clean(pipe)
    # actor exchange keeps it
    pipe.apply(ray.data.from_arrow(ev.slice(1200)), exchange="actor")
    _fsck_clean(pipe)
    for path in _base_paths(pipe):
        assert is_lake_file_sorted(pq.read_table(path), ["ts"])


def test_clear_clustering_restores_merge_key_order(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    pipe.set_clustering(["ts"])
    before = _collect(pipe.read_lake())
    res = pipe.set_clustering(())
    assert res["cluster_by"] == []
    assert "cluster_by" not in mf.read_manifest(pipe.lake_dir)
    for path in _base_paths(pipe):
        assert is_merge_key_sorted(pq.read_table(path))
    assert _collect(pipe.read_lake()).equals(before)
    _fsck_clean(pipe)


def test_unknown_cluster_column_is_refused(ray_session, tmp_path):
    pipe = _lake(tmp_path, n=200, partitions=2)
    with pytest.raises(ValueError, match="unknown cluster column"):
        pipe.set_clustering(["nope"])


def test_cluster_empty_lake_then_first_apply_is_clustered(
        ray_session, tmp_path):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    res = pipe.set_clustering(["ts"])
    assert res["partitions"] == 0
    assert mf.read_manifest(pipe.lake_dir)["cluster_by"] == ["ts"]
    pipe.apply(ray.data.from_arrow(expected_event_table(800)))
    for path in _base_paths(pipe):
        assert is_lake_file_sorted(pq.read_table(path), ["ts"])
    _fsck_clean(pipe)


def test_rollback_restores_layout_property(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    v_before = mf.read_manifest(pipe.lake_dir)["version"]
    pipe.set_clustering(["ts"])
    pipe.rollback(v_before)
    manifest = mf.read_manifest(pipe.lake_dir)
    assert "cluster_by" not in manifest
    # the restored bases are the pre-cluster files: merge-key sorted
    for path in _base_paths(pipe):
        assert is_merge_key_sorted(pq.read_table(path))
    _fsck_clean(pipe)


def _rewrite_bases_small_row_groups(pipe, rows_per_group=64):
    """In-place rewrite preserving row ORDER (manifests record paths and
    row counts, not byte sizes) so fixture-scale bases get multiple row
    groups for the zone-map assertions."""
    for path in _base_paths(pipe):
        t = pq.read_table(path)
        pq.write_table(t, path, compression="zstd",
                       row_group_size=rows_per_group)


def _mask(specs, t: pa.Table) -> np.ndarray:
    m = np.ones(t.num_rows, dtype=bool)
    for c in specs:
        m &= c.matches(t)
    return m


def _matching_groups_total(pipe, specs) -> "tuple[int, int]":
    matched = total = 0
    for path in _base_paths(pipe):
        pf = pq.ParquetFile(path)
        matched += len(_matching_row_groups(pf, specs))
        total += pf.metadata.num_row_groups
    return matched, total


def test_changefeed_across_clustering_is_empty(ray_session, tmp_path):
    """A clustering rewrite is a pure reorder: the CDF's equal-lsn pairs
    are rewrite survivors and must emit NOTHING (DESIGN #44 pairwise
    audit — a maintenance op must not masquerade as data change)."""
    import ray.data

    pipe = _lake(tmp_path, n=1500)
    v1 = mf.read_manifest(pipe.lake_dir)["version"]
    pipe.set_clustering(["ts"])
    v2 = mf.read_manifest(pipe.lake_dir)["version"]
    chg = pipe.lake_changes(v1, v2)
    assert chg.count() == 0
    # and a REAL change after the rewrite still surfaces
    ev = expected_event_table(1600)
    pipe.apply(ray.data.from_arrow(ev.slice(1500)))
    v3 = mf.read_manifest(pipe.lake_dir)["version"]
    assert pipe.lake_changes(v2, v3).count() > 0


def test_sync_across_clustering_ships_nothing(ray_session,
                                              tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_clus_sync"))
    out = str(tmp_path_factory.mktemp("clus_sync_out"))
    ev = expected_event_table(1800)
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(ev.slice(0, 1200)))
    s1 = pipe.sync_changes(out)
    assert s1["mode"] == "snapshot"
    pipe.set_clustering(["ts"])
    s2 = pipe.sync_changes(out)  # cursor advances over the reorder
    assert s2["rows"] == 0
    # later real changes still mirror exactly
    pipe.apply(ray.data.from_arrow(ev.slice(1200)))
    s3 = pipe.sync_changes(out)
    assert s3["rows"] > 0
    mirror = CDCPipeline.read_sync_mirror(out)
    got = _collect(mirror)
    want = _collect(pipe.read_lake())
    cols = sorted(want.schema.names)
    keys = [(c, "ascending") for c in cols]
    assert got.select(cols).sort_by(keys) \
        .equals(want.select(cols).sort_by(keys))


def test_incremental_view_stays_exact_across_clustering(ray_session,
                                                        tmp_path):
    from embulk_filter_timestamp_format_ray.pipelines.views import (
        IncrementalView,
    )

    def snap(view):
        t = pa.concat_tables(
            [b for b in view.read().iter_batches(batch_format="pyarrow")],
            promote_options="permissive")
        return t.sort_by([(c, "ascending") for c in t.schema.names])

    pipe = _lake(tmp_path, n=1500)
    view = IncrementalView(pipe.lake_dir, str(tmp_path / "view"))
    view.refresh()
    before = snap(view)
    pipe.set_clustering(["ts"])
    # base paths changed → signatures stale → recompute, same answer
    res = view.refresh()
    assert res["recomputed"] > 0
    assert snap(view).equals(before)


def test_zorder_pure_reorder_and_writers_keep_it(ray_session, tmp_path):
    import ray.data

    n = 1500
    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(ev.slice(0, 1000)))
    before = _collect(pipe.read_lake())
    res = pipe.set_clustering(["ts", "turn_idx"], mode="zorder")
    assert res["cluster_by"] == ["ts", "turn_idx"]
    manifest = mf.read_manifest(pipe.lake_dir)
    assert manifest["cluster_mode"] == "zorder"
    assert set(manifest["cluster_bounds"]) == {"ts", "turn_idx"}
    assert _collect(pipe.read_lake()).equals(before)
    _fsck_clean(pipe)
    # later base merge + compaction keep the zorder layout (fsck's
    # ordering tier recomputes z under the committed frozen bounds)
    pipe.apply(ray.data.from_arrow(ev.slice(1000, 300)))
    pipe.apply_delta(ray.data.from_arrow(ev.slice(1300)))
    pipe.compact_deltas()
    _fsck_clean(pipe)
    # clearing restores merge-key order and drops the zorder keys
    pipe.set_clustering(())
    m2 = mf.read_manifest(pipe.lake_dir)
    assert "cluster_mode" not in m2 and "cluster_bounds" not in m2
    _fsck_clean(pipe)


def test_zorder_refusals(ray_session, tmp_path):
    pipe = _lake(tmp_path, n=300, partitions=2)
    with pytest.raises(ValueError, match="numeric or timestamp"):
        pipe.set_clustering(["role"], mode="zorder")
    with pytest.raises(ValueError, match="unknown clustering mode"):
        pipe.set_clustering(["ts"], mode="hilbert")
    empty = CDCPipeline(str(tmp_path / "empty"), num_partitions=2)
    with pytest.raises(ValueError, match="freeze"):
        empty.set_clustering(["ts"], mode="zorder")


def test_zorder_prunes_on_every_clustered_column(ray_session, tmp_path):
    """The point of zorder over lex: a band on the SECOND clustered
    column alone still prunes row groups (lex only helps prefixes)."""
    n = 4000
    lex = _lake(tmp_path, name="lex", n=n)
    lex.set_clustering(["ts", "turn_idx"])
    zo = _lake(tmp_path, name="zo", n=n)
    zo.set_clustering(["ts", "turn_idx"], mode="zorder")
    _rewrite_bases_small_row_groups(lex)
    _rewrite_bases_small_row_groups(zo)
    # narrow band on turn_idx ONLY (the non-prefix column)
    specs = [parse_constraint("turn_idx:between:10,14")]
    m_lex, t_lex = _matching_groups_total(lex, specs)
    m_zo, t_zo = _matching_groups_total(zo, specs)
    assert t_lex > 4 and t_zo > 4
    assert m_lex == t_lex  # lex can't prune a non-prefix band
    assert m_zo < t_zo
    # exact results on both layouts
    full = _collect(lex.read_lake())
    expected = full.filter(pa.array(_mask(specs, full)))
    assert 0 < expected.num_rows < full.num_rows
    for pipe in (lex, zo):
        assert _collect(pipe.read_lake(where=specs)).equals(expected)


def test_clustered_zone_maps_prune_ts_bands(ray_session, tmp_path):
    n = 4000
    plain = _lake(tmp_path, name="plain", n=n)
    clustered = _lake(tmp_path, name="clustered", n=n)
    clustered.set_clustering(["ts"])
    _rewrite_bases_small_row_groups(plain)
    _rewrite_bases_small_row_groups(clustered)

    full = _collect(plain.read_lake())
    ts_sorted = sorted(full.column("ts").to_pylist())
    lo = ts_sorted[int(0.45 * len(ts_sorted))]
    hi = ts_sorted[int(0.55 * len(ts_sorted))]
    fmt = "%Y-%m-%dT%H:%M:%S.%f"
    specs = [parse_constraint(
        f"ts:between:{lo.strftime(fmt)},{hi.strftime(fmt)}")]

    m_plain, t_plain = _matching_groups_total(plain, specs)
    m_clus, t_clus = _matching_groups_total(clustered, specs)
    assert t_plain > 4 and t_clus > 4
    # unclustered bases are merge-key sorted: ts spreads across every
    # group, so a narrow band matches (nearly) all of them; clustering
    # localizes it
    assert m_clus < m_plain
    assert m_clus <= t_clus // 2

    # and the pruned read is still exact on both layouts
    expected = full.filter(pa.array(
        np.asarray(specs[0].matches(full), dtype=bool)))
    assert 0 < expected.num_rows < full.num_rows
    for pipe in (plain, clustered):
        got = _collect(pipe.read_lake(where=specs))
        assert got.equals(expected)
