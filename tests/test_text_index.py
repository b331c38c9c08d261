"""Token skip index (pipelines/cdc.py set_text_index /
write_token_sidecar / token_candidate_groups + the ``has_token``
constraint kind): min/max zone maps can never prove a token absent, so
token searches scan every text byte — the committed ``text_index``
property makes every base writer drop a per-row-group Bloom of the
column's distinct split-on-space tokens, and ``read_lake(where=
[has_token])`` opens only candidate groups (exact post-filter on top;
a false positive costs one extra group, never a wrong row)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    audit_token_sidecar,
    token_candidate_groups,
    token_sidecar_path,
    write_token_sidecar,
)
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    Constraint,
    parse_constraint,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


# ---------------------------------------------------- has_token semantics


def test_has_token_matches_split_membership():
    c = parse_constraint("text:has_token:ab")
    texts = ["ab", "ab cd", "cd ab", "cd ab ef", "abc", "c ab", "cab",
             "ab  cd", "x  ab", " ab ", "", " ", None, "AB"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = c.matches(t)
    want = np.array([(x is not None and "ab" in x.split(" "))
                     for x in texts])
    assert (got == want).all()


def test_has_token_refusals():
    with pytest.raises(ValueError, match="non-empty token"):
        Constraint("text", "has_token")
    with pytest.raises(ValueError, match="contains a space"):
        parse_constraint("text:has_token:two words")


# ------------------------------------------------------------- unit tier


def _synthetic_text_file(tmp_path, granule=64):
    """Multi-group parquet where each group's texts carry a group-unique
    marker token plus shared filler."""
    rows, markers = [], []
    n_groups, per = 8, 64
    for g in range(n_groups):
        m = f"marker{g:02d}"
        markers.append(m)
        for i in range(per):
            rows.append(f"filler common {m} w{i % 7}")
    tbl = pa.table({"text": pa.array(rows)})
    full = str(tmp_path / "part-00000.parquet")
    pq.write_table(tbl, full, row_group_size=granule)
    write_token_sidecar(full, tbl, "text", granule=granule)
    return full, tbl, markers


def test_token_candidates_no_false_negatives_and_prune(tmp_path):
    full, tbl, markers = _synthetic_text_file(tmp_path)
    n = pq.ParquetFile(full).metadata.num_row_groups
    assert n == len(markers)
    admitted = 0
    for g, m in enumerate(markers):
        cands = token_candidate_groups(full, [m], n)
        assert cands is not None and g in cands  # no false negatives
        admitted += len(cands)
    assert admitted < 3 * len(markers)  # real pruning (few FPs)
    # shared token: every group is (correctly) a candidate
    assert token_candidate_groups(full, ["common"], n) == list(range(n))
    # AND'd tokens: marker + common still only the marker's group(s)
    cands = token_candidate_groups(full, [markers[3], "common"], n)
    assert 3 in cands and len(cands) <= 3
    # absent token: usually nothing
    assert len(token_candidate_groups(full, ["zzz-absent"], n)) <= 1
    # stale sidecar (out-of-band rewrite) is detected
    pq.write_table(tbl, full, row_group_size=128)
    n2 = pq.ParquetFile(full).metadata.num_row_groups
    assert token_candidate_groups(full, ["common"], n2) is None
    v, w = audit_token_sidecar(full, tbl, "text")
    assert v is None and "stale" in w


def test_corrupt_token_sidecar_is_a_violation(tmp_path):
    full, tbl, _ = _synthetic_text_file(tmp_path)
    sc_path = token_sidecar_path(full)
    sc = pq.read_table(sc_path)
    zeroed = pa.table({
        "n_bits": sc.column("n_bits"),
        "words": pa.array([[0] * len(w) for w in
                           sc.column("words").to_pylist()],
                          pa.list_(pa.uint64())),
    }).replace_schema_metadata(sc.schema.metadata)
    pq.write_table(zeroed, sc_path)
    v, w = audit_token_sidecar(full, tbl, "text")
    assert v is not None and "false negative" in v


# ------------------------------------------------------- lake integration


def _base_paths(pipe):
    manifest = mf.read_manifest(pipe.lake_dir)
    return [os.path.join(pipe.lake_dir, p["path"])
            for p in manifest["partitions"].values() if p.get("path")]


def _collect(ds) -> pa.Table:
    tbls = [b for b in ds.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tbls, promote_options="permissive") if tbls \
        else pa.table({})
    keys = [(c, "ascending") for c in sorted(t.schema.names)]
    return t.sort_by(keys) if t.num_rows else t


def test_text_index_end_to_end(ray_session, tmp_path):
    import ray.data

    n = 2000
    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(ray.data.from_arrow(ev.slice(0, 1000)))
    res = pipe.set_text_index("text")
    assert res["text_index"] == "text"
    assert mf.read_manifest(pipe.lake_dir)["text_index"] == "text"
    for p in _base_paths(pipe):
        assert os.path.exists(token_sidecar_path(p))
    # later writers keep the sidecars fresh
    pipe.apply(ray.data.from_arrow(ev.slice(1000, 500)))
    pipe.apply_delta(ray.data.from_arrow(ev.slice(1500, 300)))
    pipe.compact_deltas()
    pipe.apply(ray.data.from_arrow(ev.slice(1800)), exchange="actor")
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []

    # pick a real mid-frequency token and search for it
    full = _collect(pipe.read_lake())
    words = [w for x in full.column("text").to_pylist() if x
             for w in x.split(" ")]
    tok = sorted(set(words))[len(set(words)) // 2]
    spec = parse_constraint(f"text:has_token:{tok}")
    expected = full.filter(pa.array(spec.matches(full)))
    assert 0 < expected.num_rows < full.num_rows
    got = _collect(pipe.read_lake(where=[spec]))
    assert got.equals(_collect_sorted(expected))

    # composes with clustering: both sidecars beside every base
    pipe.set_clustering(["ts"])
    for p in _base_paths(pipe):
        assert os.path.exists(token_sidecar_path(p))
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []
    got = _collect(pipe.read_lake(where=[spec]))
    assert got.equals(_collect_sorted(expected))

    # clearing drops the property; reads stay exact
    pipe.set_text_index(None)
    assert "text_index" not in mf.read_manifest(pipe.lake_dir)
    got = _collect(pipe.read_lake(where=[spec]))
    assert got.equals(_collect_sorted(expected))
    rep = pipe.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []


def _collect_sorted(t: pa.Table) -> pa.Table:
    keys = [(c, "ascending") for c in sorted(t.schema.names)]
    return t.sort_by(keys)


def test_missing_sidecar_falls_back_and_warns(ray_session, tmp_path):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=2)
    pipe.apply(ray.data.from_arrow(expected_event_table(600)))
    pipe.set_text_index("text")
    full = _collect(pipe.read_lake())
    tok = full.column("text").to_pylist()[0].split(" ")[0]
    spec = parse_constraint(f"text:has_token:{tok}")
    want = _collect(pipe.read_lake(where=[spec]))
    for p in _base_paths(pipe):
        os.unlink(token_sidecar_path(p))
    assert _collect(pipe.read_lake(where=[spec])).equals(want)
    rep = pipe.fsck()
    assert rep["violations"] == []
    assert any("no token sidecar" in w["problems"]
               for w in rep["warnings"])


def test_text_index_refusals_and_empty_lake(ray_session, tmp_path):
    import ray.data

    pipe = CDCPipeline(str(tmp_path / "full"), num_partitions=2)
    pipe.apply(ray.data.from_arrow(expected_event_table(300)))
    with pytest.raises(ValueError, match="unknown text_index column"):
        pipe.set_text_index("nope")
    with pytest.raises(ValueError, match="string column"):
        pipe.set_text_index("turn_idx")
    # empty lake: metadata-only; the first apply writes sidecars
    empty = CDCPipeline(str(tmp_path / "empty"), num_partitions=2)
    res = empty.set_text_index("text")
    assert res["partitions"] == 0
    empty.apply(ray.data.from_arrow(expected_event_table(300)))
    for p in _base_paths(empty):
        assert os.path.exists(token_sidecar_path(p))
    rep = empty.fsck()
    assert rep["violations"] == [] and rep["warnings"] == []
