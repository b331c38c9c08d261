"""Incrementally-maintained vector index over a CDC lake
(pipelines/vector_view.py VectorIndexView): build assigns live rows to
frozen k-means centroids; refresh consumes ONLY the change feed (upserts
append to their lists, updates/deletes add LSN-bounded tombstones);
search reads only the probed lists' files and subtracts tombstones.

The load-bearing invariant: after any build/refresh/compact sequence, a
full-probe search equals the same search over a FRESH index built from
the lake head — i.e. the incremental view never drifts from live state
(updates that MOVE a key across centroid lists included)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
    VectorIndexView,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    embed_batch,
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf

N_EVENTS = 2_000
N_CENTROIDS = 4
DIM = 8


def _events() -> pa.Table:
    return embed_batch(expected_event_table(N_EVENTS, seed=42), dim=DIM)


def _queries(n=3) -> np.ndarray:
    rng = np.random.default_rng(9)
    return rng.standard_normal((n, DIM))


def _sorted_rows(ds) -> "list[tuple]":
    t = pa.Table.from_pylist(ds.take_all()) if ds.count() else None
    if t is None:
        return []
    order = pc.sort_indices(t, sort_keys=[
        ("query_id", "ascending"), ("rank", "ascending")])
    t = t.take(order)
    return list(zip(t.column("query_id").to_pylist(),
                    t.column("rank").to_pylist(),
                    t.column("conv_id").to_pylist(),
                    t.column("turn_idx").to_pylist()))


def _fresh_reference(pipe, tmp_path, tag, k=10) -> "list[tuple]":
    """Search results over a from-scratch index at the lake head."""
    ref = VectorIndexView(pipe, str(tmp_path / f"ref_{tag}"),
                          n_centroids=N_CENTROIDS)
    ref.build()
    return _sorted_rows(ref.search(_queries(), k=k, nprobe=N_CENTROIDS))


@pytest.fixture()
def lake(tmp_path):
    ev = _events()
    cut = pa.scalar(1_000, pa.int64())
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=8)
    pipe.apply(ray.data.from_arrow(
        ev.filter(pc.less(ev.column("lsn"), cut))))
    return pipe, ev, cut


def test_refresh_equals_rebuild(lake, tmp_path):
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    res = view.refresh()
    assert res["appended"] > 0 and res["tombstones"] > 0
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert got == _fresh_reference(pipe, tmp_path, "a")
    assert len(got) == 3 * 10


def test_refresh_is_noop_when_current(lake, tmp_path):
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    res = view.refresh()
    assert res == {"appended": 0, "tombstones": 0,
                   "cursor_version": mf.read_manifest(pipe.lake_dir)["version"]}


def test_cross_list_update_never_surfaces_stale_vector(lake, tmp_path):
    """An update that MOVES a key to a different centroid list must kill
    the old row wherever it lives: query AT the old vector and assert the
    key only appears via its (far-away) new embedding's ranking."""
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()

    # pick a live key from the base half and its current embedding
    live = pa.Table.from_pylist(pipe.read_lake(
        columns=["conv_id", "turn_idx", "lsn", "embedding"]).take_all())
    row = live.slice(0, 1).to_pylist()[0]
    old_vec = np.asarray(row["embedding"], dtype=np.float64)

    # upsert the SAME key with the opposite embedding (guaranteed to move
    # lists: its nearest centroid flips sign too)
    upd = pa.table({
        "lsn": pa.array([N_EVENTS + 10], pa.int64()),
        "op": pa.array(["upsert"]),
        "conv_id": pa.array([row["conv_id"]]),
        "turn_idx": pa.array([row["turn_idx"]], pa.int32()),
        "role": pa.array(["user"]),
        "text": pa.array(["moved"]),
        "tool": pa.array([None], pa.string()),
        "ts_raw": pa.array(["0"]),
        "schema_epoch": pa.array([0], pa.int64()),
        "embedding": pa.array([(-old_vec).tolist()],
                              pa.list_(pa.float64())),
    })
    pipe.apply_delta(ray.data.from_arrow(upd))
    view.refresh()

    # query exactly at the OLD vector with k covering everything nearby:
    # the stale row would rank 1 if it survived
    got = view.search(old_vec[None, :], k=5, nprobe=N_CENTROIDS).take_all()
    key = (row["conv_id"], row["turn_idx"])
    hits = [(r["conv_id"], r["turn_idx"]) for r in got]
    assert key not in hits
    assert got == _sorted_tail_ref(pipe, tmp_path, old_vec)


def _sorted_tail_ref(pipe, tmp_path, vec):
    ref = VectorIndexView(pipe, str(tmp_path / "ref_tail"),
                          n_centroids=N_CENTROIDS)
    ref.build()
    return ref.search(vec[None, :], k=5, nprobe=N_CENTROIDS).take_all()


def test_delete_then_reinsert(lake, tmp_path):
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    live = pa.Table.from_pylist(pipe.read_lake(
        columns=["conv_id", "turn_idx", "lsn", "embedding"]).take_all())
    row = live.slice(1, 1).to_pylist()[0]
    vec = np.asarray(row["embedding"], dtype=np.float64)

    def event(lsn, op, emb):
        return pa.table({
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array([op]),
            "conv_id": pa.array([row["conv_id"]]),
            "turn_idx": pa.array([row["turn_idx"]], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["x"]),
            "tool": pa.array([None], pa.string()),
            "ts_raw": pa.array(["0"]),
            "schema_epoch": pa.array([0], pa.int64()),
            "embedding": pa.array([emb], pa.list_(pa.float64())),
        })

    pipe.apply_delta(ray.data.from_arrow(
        event(N_EVENTS + 20, "delete", None)))
    view.refresh()
    got = view.search(vec[None, :], k=3, nprobe=N_CENTROIDS).take_all()
    assert (row["conv_id"], row["turn_idx"]) not in \
        [(r["conv_id"], r["turn_idx"]) for r in got]

    # re-insert with a higher lsn: the delete tombstone must NOT kill it
    pipe.apply_delta(ray.data.from_arrow(
        event(N_EVENTS + 30, "upsert", vec.tolist())))
    view.refresh()
    got = view.search(vec[None, :], k=3, nprobe=N_CENTROIDS).take_all()
    assert [(r["conv_id"], r["turn_idx"]) for r in got][0] == \
        (row["conv_id"], row["turn_idx"])


def test_probe_pruning_reads_only_probed_lists(lake, tmp_path):
    """Rename every NON-probed list's files: a search that prunes reads
    correctly never notices; reading anything else would crash."""
    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    view.build()
    m = json.load(open(os.path.join(idx, "view_manifest.json")))
    q = _queries(1)
    cent = np.asarray(m["centroids"])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probe = int(np.argmax(qn @ cent.T, axis=1)[0])
    renamed = []
    for c, rels in m["vector_files"].items():
        if int(c) == probe:
            continue
        for rel in rels:
            p = os.path.join(idx, rel)
            os.rename(p, p + ".hidden")
            renamed.append(p)
    assert renamed, "every list but one should exist at this scale"
    got = view.search(q, k=5, nprobe=1).take_all()
    assert len(got) == 5
    for p in renamed:
        os.rename(p + ".hidden", p)


def test_compact_folds_and_preserves_results(lake, tmp_path):
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    before = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    res = view.compact()
    assert res["tombstones_folded"] > 0
    m = json.load(open(os.path.join(str(tmp_path / "view"),
                                    "view_manifest.json")))
    assert m["tombstone_files"] == []
    assert all(len(fs) == 1 for fs in m["vector_files"].values())
    after = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert after == before
    # and a refresh after compaction still composes
    upd = _events().slice(0, 0)
    assert view.refresh()["appended"] == 0


def test_centroids_frozen_across_refresh(lake, tmp_path):
    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    view.build()
    c0 = json.load(open(os.path.join(idx, "view_manifest.json")))["centroids"]
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    c1 = json.load(open(os.path.join(idx, "view_manifest.json")))["centroids"]
    assert c0 == c1


def test_quantized_refresh_equals_quantized_rebuild(lake, tmp_path):
    """The int8 storage tier: refresh appends quantized rows matching what
    a from-scratch quantized build would store (the layout choice is
    committed in the manifest; the refresher adopts it)."""
    pipe, ev, cut = lake
    idx = str(tmp_path / "qview")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS,
                           quantized=True)
    view.build()
    m = json.load(open(os.path.join(idx, "view_manifest.json")))
    assert m["quantized"] is True
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    # a refresher handle WITHOUT the constructor flag still stores int8
    # (the manifest is the truth)
    VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS).refresh()
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    ref = VectorIndexView(pipe, str(tmp_path / "qref"),
                          n_centroids=N_CENTROIDS, quantized=True)
    ref.build()
    want = _sorted_rows(ref.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert got == want
    # stored files carry q + scale_ppm, never the float column
    import pyarrow.parquet as pq
    rel = next(iter(json.load(open(os.path.join(
        idx, "view_manifest.json")))["vector_files"].values()))[0]
    names = pq.read_schema(os.path.join(idx, rel)).names
    assert "q" in names and "scale_ppm" in names and "embedding" not in names


def test_quantized_compact_preserves_results(lake, tmp_path):
    pipe, ev, cut = lake
    idx = str(tmp_path / "qview")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS,
                           quantized=True)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    before = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    view.compact()
    assert _sorted_rows(view.search(_queries(), k=10,
                                    nprobe=N_CENTROIDS)) == before


def test_verify_green_then_catches_tamper(lake, tmp_path):
    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    rep = view.verify()
    assert rep["ok"] and rep["rows_view"] == rep["rows_lake"] > 0
    view.compact()
    assert view.verify()["ok"]
    # duplicate one stored row: count and hash-sum both shift
    import pyarrow.parquet as pq
    m = json.load(open(os.path.join(idx, "view_manifest.json")))
    rel = next(iter(m["vector_files"].values()))[0]
    path = os.path.join(idx, rel)
    t = pq.read_table(path)
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), path)
    assert not view.verify()["ok"]


def test_refresh_across_rollback(lake, tmp_path):
    """A lake rollback is just another commit to the change feed: the
    refresh diff (cursor → post-rollback head) re-kills the rolled-back
    upserts and re-inserts the restored rows, so the view tracks the
    RESTORED state exactly."""
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    v_base = mf.read_manifest(pipe.lake_dir)["version"]
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    pipe.rollback(v_base)
    view.refresh()
    assert view.verify()["ok"]
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert got == _fresh_reference(pipe, tmp_path, "rb")


def test_refresh_across_repartition(lake, tmp_path):
    """repartition_lake rewrites every file without changing live state —
    the change feed between the two versions is EMPTY (pinned elsewhere),
    so a view refresh across it appends nothing and stays verifiable."""
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    pipe.repartition_lake(4)
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    pipe2 = CDCPipeline.from_lake(pipe.lake_dir)
    view2 = VectorIndexView(pipe2, str(tmp_path / "view"),
                            n_centroids=N_CENTROIDS)
    res = view2.refresh()
    assert res["appended"] == 0 and res["tombstones"] == 0
    assert view2.verify()["ok"]


def test_fast_path_and_patch_fallback(lake, tmp_path):
    """A pure upsert/delete delta span refreshes from the delta files
    alone (source=delta_files, cost ∝ micro-batch); a span carrying PATCH
    events (partial columns — post-image needs the fold) falls back to
    the exact change feed, and both stay verify-green."""
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    res = view.refresh()
    assert res["source"] == "delta_files"
    assert view.verify()["ok"]

    evp = embed_batch(expected_event_table(
        N_EVENTS + 500, seed=42, patch_permille=400), dim=DIM)
    tail = evp.filter(pc.greater_equal(evp.column("lsn"),
                                       pa.scalar(N_EVENTS, pa.int64())))
    assert "patch" in set(tail.column("op").to_pylist())
    pipe.apply_delta(ray.data.from_arrow(tail))
    res = view.refresh()
    assert res["source"] == "change_feed"
    assert view.verify()["ok"]
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert got == _fresh_reference(pipe, tmp_path, "patch")


def test_filtered_search_payload_cols(lake, tmp_path):
    """Payload columns ride build → delta-file refresh → compaction, and
    search(where=[...]) selects BEFORE ranking: top-k is the best k among
    matching rows only."""
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS,
                           payload_cols=("role",))
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    assert view.refresh()["source"] == "delta_files"
    where = [parse_constraint("role:in:assistant")]
    got = view.search(_queries(), k=10, nprobe=N_CENTROIDS,
                      where=where).take_all()
    assert len(got) == 3 * 10

    # every hit is an assistant turn in the LIVE lake state
    live = pa.Table.from_pylist(pipe.read_lake(
        columns=["conv_id", "turn_idx", "role"]).take_all())
    roles = {(r["conv_id"], r["turn_idx"]): r["role"]
             for r in live.to_pylist()}
    assert all(roles[(r["conv_id"], r["turn_idx"])] == "assistant"
               for r in got)

    # filtering ≠ post-filtering the unfiltered top-k: the filtered list
    # must contain keys the global top-10 never surfaced
    plain = view.search(_queries(), k=10, nprobe=N_CENTROIDS).take_all()
    plain_keys = {(r["query_id"], r["conv_id"], r["turn_idx"])
                  for r in plain}
    assert any((r["query_id"], r["conv_id"], r["turn_idx"])
               not in plain_keys for r in got)

    # payload survives compaction; results identical
    def rows(res):
        return sorted((r["query_id"], r["rank"], r["conv_id"],
                       r["turn_idx"]) for r in res)
    before = rows(got)
    view.compact()
    assert rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS,
                            where=where).take_all()) == before

    # a where column the view doesn't store is refused loudly
    with pytest.raises(ValueError, match="payload_cols"):
        view.search(_queries(), k=3, nprobe=1,
                    where=[parse_constraint("text:not_null")])


def test_gc_reclaims_superseded_generations(lake, tmp_path):
    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    before = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert view.gc()["files_removed"] == 0  # everything still referenced
    view.compact()
    res = view.gc()
    assert res["files_removed"] > 0  # pre-compaction generations reclaimed
    assert view.gc()["files_removed"] == 0  # idempotent
    assert _sorted_rows(view.search(_queries(), k=10,
                                    nprobe=N_CENTROIDS)) == before
    assert view.verify()["ok"]


def test_quantized_filtered_compose(lake, tmp_path):
    """The int8 storage tier and payload filtering compose: payload
    columns ride the quantize map (which swaps only the vector column)
    and a filtered search over the quantized view matches the float
    view's filtered results rank-for-rank (the int8 round trip reorders
    no pair on this data — same property the quantized oracle pins)."""
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    pipe, ev, cut = lake
    where = [parse_constraint("role:in:assistant")]
    out = {}
    for tag, quant in (("f", False), ("q", True)):
        view = VectorIndexView(pipe, str(tmp_path / f"view_{tag}"),
                               n_centroids=N_CENTROIDS, quantized=quant,
                               payload_cols=("role",))
        view.build()
        out[tag] = _sorted_rows(view.search(_queries(), k=10,
                                            nprobe=N_CENTROIDS,
                                            where=where))
    assert out["f"] == out["q"]
    assert len(out["f"]) == 3 * 10


def test_payload_through_exact_feed(lake, tmp_path):
    """Payload columns must also ride the EXACT change-feed refresh path
    (patch traffic forces it): the post-image payload lands in the index
    and filtered search matches a fresh payload-built reference."""
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS,
                           payload_cols=("role",))
    view.build()
    evp = embed_batch(expected_event_table(
        N_EVENTS, seed=42, patch_permille=400), dim=DIM)
    pipe.apply_delta(ray.data.from_arrow(
        evp.filter(pc.greater_equal(evp.column("lsn"), cut))))
    assert view.refresh()["source"] == "change_feed"
    where = [parse_constraint("role:in:assistant")]
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS,
                                   where=where))
    ref = VectorIndexView(pipe, str(tmp_path / "ref"),
                          n_centroids=N_CENTROIDS, payload_cols=("role",))
    ref.build()
    want = _sorted_rows(ref.search(_queries(), k=10, nprobe=N_CENTROIDS,
                                   where=where))
    assert got == want and len(got) == 3 * 10
    assert view.verify()["ok"]


def test_commit_conflict_refused(lake, tmp_path):
    """Two writers racing on one view: the loser's commit is refused
    (its generation files stay as unreferenced gc fodder), never
    clobbering the winner — the lake's OCC discipline."""
    from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
        ViewCommitConflict,
    )

    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    view.build()
    m = json.load(open(os.path.join(idx, "view_manifest.json")))
    # a concurrent writer commits generation+1 behind our back
    view._commit({**m, "generation": m["generation"] + 1},
                 expected_generation=m["generation"])
    with pytest.raises(ViewCommitConflict, match="concurrent writer"):
        view._commit({**m, "generation": m["generation"] + 1},
                     expected_generation=m["generation"])
    # a second build() against the now-existing view is refused too
    with pytest.raises(ValueError, match="already holds"):
        view.build()


def test_refusals(lake, tmp_path):
    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    with pytest.raises(ValueError, match="no vector view"):
        view.refresh()
    view.build()
    with pytest.raises(ValueError, match="already holds"):
        view.build()
    other = VectorIndexView(pipe, idx, col="text")
    with pytest.raises(ValueError, match="indexes column"):
        other.refresh()


def test_retrain_equals_fresh_build(lake, tmp_path):
    """retrain(n_centroids=k') after a drift-y refresh must equal a fresh
    build at the same centroid count: identical committed centroids
    (same lake snapshot, sample and seed) and identical full-probe search
    results; pending tombstones fold away; verify stays green."""
    pipe, ev, cut = lake
    idx = str(tmp_path / "view")
    view = VectorIndexView(pipe, idx, n_centroids=N_CENTROIDS)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    assert view.stats()["tombstones_pending"] > 0

    k2 = 8
    res = view.retrain(n_centroids=k2)
    assert res["retrained"] and res["n_centroids"] == k2
    m = json.load(open(os.path.join(idx, "view_manifest.json")))
    ref = VectorIndexView(pipe, str(tmp_path / "ref"), n_centroids=k2)
    ref.build()
    m_ref = json.load(open(os.path.join(str(tmp_path / "ref"),
                                        "view_manifest.json")))
    assert m["centroids"] == m_ref["centroids"]
    assert m["tombstone_files"] == []
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=k2))
    want = _sorted_rows(ref.search(_queries(), k=10, nprobe=k2))
    assert got == want and len(got) == 3 * 10
    assert view.verify()["ok"]

    # the superseded pre-retrain generations are orphans now
    assert view.gc()["files_removed"] > 0
    assert _sorted_rows(view.search(_queries(), k=10, nprobe=k2)) == want

    # refresh keeps working against the NEW centroids
    extra = ev.filter(pc.greater_equal(ev.column("lsn"), cut)).slice(0, 0)
    del extra  # (no-op refresh path)
    assert view.refresh()["appended"] == 0
    assert view.verify()["ok"]


def test_retrain_quantized_no_drift(lake, tmp_path):
    """A quantized view retrains from LAKE float truth (never its stored
    int8 rows): results equal a fresh quantized build."""
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "vq"),
                           n_centroids=N_CENTROIDS, quantized=True)
    view.build()
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    view.retrain()
    ref = VectorIndexView(pipe, str(tmp_path / "vq_ref"),
                          n_centroids=N_CENTROIDS, quantized=True)
    ref.build()
    got = _sorted_rows(view.search(_queries(), k=10, nprobe=N_CENTROIDS))
    assert got == _sorted_rows(ref.search(_queries(), k=10,
                                          nprobe=N_CENTROIDS))
    assert view.verify()["ok"]


def test_stats_reports_list_skew(lake, tmp_path):
    pipe, ev, cut = lake
    view = VectorIndexView(pipe, str(tmp_path / "view"),
                           n_centroids=N_CENTROIDS)
    view.build()
    s = view.stats()
    assert s["generation"] == 0 and s["lists_live"] >= 1
    assert s["rows_stored"] == pipe.read_lake(
        columns=["conv_id"]).count()
    assert s["tombstones_pending"] == 0
    assert s["list_skew"] >= 1.0
    assert s["rows_per_list"]["max"] >= s["rows_per_list"]["min"] >= 0
    pipe.apply_delta(ray.data.from_arrow(
        ev.filter(pc.greater_equal(ev.column("lsn"), cut))))
    view.refresh()
    s2 = view.stats()
    assert s2["generation"] == 1 and s2["tombstones_pending"] > 0
    assert s2["files"] > s["files"]
