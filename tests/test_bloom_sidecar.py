"""Row-group bloom sidecars (pipelines/cdc.py write_bloom_sidecar /
bloom_candidate_groups / audit_bloom_sidecar): clustering widens conv_id
zone maps, so point lookups on clustered lakes lose row-group pruning —
the sidecar (a per-row-group Bloom filter of distinct conv_ids, written
beside every clustered base file) buys it back.

Contract under test:

* every clustered base write (merge, set_clustering rewrite, compaction,
  actor exchange) drops ``part-NNNNN.bloom`` beside the parquet
* ``bloom_candidate_groups`` has NO false negatives (every group that
  holds a conv is a candidate) and prunes most non-owning groups
* ``read_conversation`` on a clustered lake is bit-equal to the
  unclustered answer — with a live sidecar, with a STALE one (group
  count drifted → ignored), and with a missing one (fallback)
* fsck: healthy sidecar = silent; missing = warning; stale = warning;
  a corrupted sidecar (false negatives) = violation
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    audit_bloom_sidecar,
    bloom_candidate_groups,
    bloom_sidecar_path,
    write_bloom_sidecar,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def _base_paths(pipe) -> "list[str]":
    manifest = mf.read_manifest(pipe.lake_dir)
    return [os.path.join(pipe.lake_dir, p["path"])
            for p in manifest["partitions"].values() if p.get("path")]


def _clustered_lake(tmp_path, name="lake", n=2000, partitions=4,
                    mode="lex"):
    import ray.data

    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / name), num_partitions=partitions)
    pipe.apply(ray.data.from_arrow(ev))
    cols = ["ts"] if mode == "lex" else ["ts", "turn_idx"]
    pipe.set_clustering(cols, mode=mode)
    return pipe


# ------------------------------------------------------------- unit tier


def _synthetic_clustered_file(tmp_path, n_convs=40, turns=12, granule=64):
    """A ts-clustered (i.e. NOT conv-grouped) parquet file + sidecar."""
    rng = np.random.default_rng(7)
    conv = np.repeat([f"conv-{i:04d}" for i in range(n_convs)], turns)
    order = rng.permutation(len(conv))  # clustering scatters convs
    tbl = pa.table({
        "conv_id": pa.array(conv[order]),
        "turn_idx": pa.array(np.tile(np.arange(turns, dtype=np.int32),
                                     n_convs)[order]),
    })
    full = str(tmp_path / "part-00000.parquet")
    pq.write_table(tbl, full, row_group_size=granule)
    write_bloom_sidecar(full, tbl, granule=granule)
    return full, tbl, granule


def test_candidates_no_false_negatives_and_prune(tmp_path):
    full, tbl, granule = _synthetic_clustered_file(tmp_path)
    md = pq.ParquetFile(full).metadata
    n_groups = md.num_row_groups
    assert n_groups > 4
    conv_col = np.asarray(tbl.column("conv_id"))
    admitted = kept = 0
    for conv in [f"conv-{i:04d}" for i in range(0, 40, 7)]:
        cands = bloom_candidate_groups(full, conv, n_groups)
        assert cands is not None
        # ground truth: the groups that actually hold the conv
        truth = {int(i) for i in
                 np.nonzero(conv_col == conv)[0] // granule}
        assert truth <= set(cands)  # NO false negatives
        admitted += len(cands)
        kept += len(truth)
    # pruning is real: admitted ≈ truth (false positives are rare)
    assert admitted < 6 * kept

    # a conv the file does not hold: usually zero candidates
    ghost = bloom_candidate_groups(full, "conv-9999", n_groups)
    assert ghost is not None and len(ghost) <= 2


def test_stale_and_missing_sidecars_are_detected(tmp_path):
    full, tbl, granule = _synthetic_clustered_file(tmp_path)
    n_groups = pq.ParquetFile(full).metadata.num_row_groups
    # stale: file rewritten with a different granule out-of-band
    pq.write_table(tbl, full, row_group_size=granule * 2)
    n2 = pq.ParquetFile(full).metadata.num_row_groups
    assert n2 != n_groups
    assert bloom_candidate_groups(full, "conv-0000", n2) is None
    v, w = audit_bloom_sidecar(full, tbl)
    assert v is None and w is not None and "stale" in w
    # missing: no sidecar at all
    os.unlink(bloom_sidecar_path(full))
    assert bloom_candidate_groups(full, "conv-0000", n2) is None
    v, w = audit_bloom_sidecar(full, tbl)
    assert v is None and w is not None and "no bloom sidecar" in w


def test_corrupt_sidecar_is_a_violation(tmp_path):
    full, tbl, granule = _synthetic_clustered_file(tmp_path)
    sc_path = bloom_sidecar_path(full)
    sc = pq.read_table(sc_path)
    # zero every bitmap: every real conv becomes a false negative
    zeroed = pa.table({
        "n_bits": sc.column("n_bits"),
        "words": pa.array([[0] * len(w) for w in
                           sc.column("words").to_pylist()],
                          pa.list_(pa.uint64())),
    }).replace_schema_metadata(sc.schema.metadata)
    pq.write_table(zeroed, sc_path)
    v, w = audit_bloom_sidecar(full, tbl)
    assert v is not None and "false negative" in v


# ------------------------------------------------------- lake integration


@pytest.mark.parametrize("mode", ["lex", "zorder"])
def test_clustered_point_lookup_exact_with_sidecars(ray_session, tmp_path,
                                                    mode):
    import ray.data

    n = 2000
    ev = expected_event_table(n)
    plain = CDCPipeline(str(tmp_path / "plain"), num_partitions=4)
    plain.apply(ray.data.from_arrow(ev))
    pipe = _clustered_lake(tmp_path, name=f"clus_{mode}", n=n, mode=mode)
    # every clustered base carries a sidecar
    for p in _base_paths(pipe):
        assert os.path.exists(bloom_sidecar_path(p))
    convs = sorted(set(ev.column("conv_id").to_pylist()))[:6]
    for conv in convs:
        want = plain.read_conversation(conv)
        got = pipe.read_conversation(conv)
        assert got.equals(want)
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []


def test_later_writers_and_fallbacks(ray_session, tmp_path):
    import ray.data

    n = 2400
    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(ev.slice(0, 1200)))
    pipe.set_clustering(["ts"])
    # base merge, delta + compaction, actor exchange all refresh sidecars
    pipe.apply(ray.data.from_arrow(ev.slice(1200, 600)))
    pipe.apply_delta(ray.data.from_arrow(ev.slice(1800, 300)))
    pipe.compact_deltas()
    pipe.apply(ray.data.from_arrow(ev.slice(2100)), exchange="actor")
    paths = _base_paths(pipe)
    assert paths and all(os.path.exists(bloom_sidecar_path(p))
                         for p in paths)
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []

    conv = sorted(set(ev.column("conv_id").to_pylist()))[3]
    want = pipe.read_conversation(conv)
    assert want.num_rows > 0

    # missing sidecars: reads fall back (exact), fsck warns
    for p in paths:
        os.unlink(bloom_sidecar_path(p))
    assert pipe.read_conversation(conv).equals(want)
    rep = pipe.fsck()
    assert rep["violations"] == []
    assert any("no bloom sidecar" in w["problems"]
               for w in rep["warnings"])

    # clearing the clustering: merge-key bases need (and write) none
    pipe.set_clustering(())
    for p in _base_paths(pipe):
        assert not os.path.exists(bloom_sidecar_path(p))
    assert pipe.read_conversation(conv).equals(want)
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []
