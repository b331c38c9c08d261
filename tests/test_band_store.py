"""Incremental dedup against a persistent LSH band store (stages/dedup.py)
— the CDC-fed corpus shape: each new micro-batch dedups against everything
already accepted, reading only the store shards its band keys hash into."""

import os

import numpy as np
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.stages.dedup import (
    BAND_STORE_SHARDS,
    MinHashStage,
    build_band_store,
    dedup_against_store,
)

PARAMS = dict(num_perm=32, bands=8, shingle_k=3)


def _doc(i, text):
    return {"doc_id": i, "text": text}


BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "completely different content about distributed data processing engines",
    "streaming executors schedule pipeline stages with backpressure control",
    "parquet row groups carry min max statistics for predicate pushdown",
]


def _batch(rows):
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    })


@pytest.fixture()
def store(ray_session, tmp_path):
    import ray.data

    d = str(tmp_path / "bandstore")
    base = _batch([_doc(i, t) for i, t in enumerate(BASE_TEXTS)])
    build_band_store(ray.data.from_arrow(base), d, **PARAMS)
    return d


def _collides(text_a, text_b):
    """Reference LSH collision check (scalar spec: any shared band)."""
    st = MinHashStage(PARAMS["num_perm"], PARAMS["shingle_k"])
    sa, sb = st.signature(text_a), st.signature(text_b)
    r = PARAMS["num_perm"] // PARAMS["bands"]
    return any((sa[b * r:(b + 1) * r] == sb[b * r:(b + 1) * r]).all()
               for b in range(PARAMS["bands"]))


def test_store_layout(store):
    assert os.path.exists(os.path.join(store, "_SUCCESS"))
    shards = os.listdir(os.path.join(store, "bands"))
    assert all(s.startswith("band_shard=") for s in shards)
    assert 1 <= len(shards) <= BAND_STORE_SHARDS


def test_incremental_dedup_vs_store_and_within_batch(ray_session, store):
    import ray.data

    # new batch: one exact dup of base doc 0, one near dup of base doc 2
    # (one word changed), two fresh docs, plus a within-batch exact pair
    near = BASE_TEXTS[2].replace("backpressure", "flow")
    assert _collides(BASE_TEXTS[2], near)  # planted near-dup really collides
    fresh1 = "novel text about timestamp parsing across heterogeneous formats"
    fresh2 = "another unrelated passage mentioning optimistic concurrency"
    new = _batch([
        _doc(10, BASE_TEXTS[0]),   # dup vs store (exact)
        _doc(11, near),            # dup vs store (near)
        _doc(12, fresh1),          # kept
        _doc(13, fresh2),          # kept
        _doc(14, fresh2),          # within-batch dup of 13 → dropped
    ])
    kept, rep = dedup_against_store(ray.data.from_arrow(new), store)
    kept_ids = sorted(kept.to_pandas()["doc_id"])
    assert kept_ids == [12, 13]
    assert rep["new_docs"] == 5
    assert rep["dup_vs_store"] == 2
    assert rep["dup_within_batch"] == 1
    assert rep["kept"] == 2

    # the survivors were appended: re-sending them now dedups vs store
    kept2, rep2 = dedup_against_store(
        ray.data.from_arrow(_batch([_doc(20, fresh1), _doc(21, fresh2)])),
        store)
    assert kept2.count() == 0
    assert rep2["dup_vs_store"] == 2

    # dropped docs were NOT appended (doc 14's text entered via doc 13)
    kept3, rep3 = dedup_against_store(
        ray.data.from_arrow(_batch([_doc(30, "entirely new final text "
                                              "about lakehouse manifests")])),
        store)
    assert sorted(kept3.to_pandas()["doc_id"]) == [30]


def test_update_false_leaves_store_unchanged(ray_session, store):
    import ray.data

    fresh = "text that appears in no other fixture document at all"
    b = _batch([_doc(40, fresh)])
    kept, rep = dedup_against_store(ray.data.from_arrow(b), store,
                                    update=False)
    assert rep["kept"] == 1
    # not appended → the same doc is still fresh on the next probe
    kept2, rep2 = dedup_against_store(ray.data.from_arrow(
        _batch([_doc(41, fresh)])), store, update=False)
    assert rep2["dup_vs_store"] == 0 and rep2["kept"] == 1


def test_store_param_contract(ray_session, tmp_path):
    import ray.data

    with pytest.raises(ValueError):
        dedup_against_store(
            ray.data.from_arrow(_batch([_doc(0, "x")])),
            str(tmp_path / "nosuch"))


def test_empty_batch(ray_session, store):
    import ray.data

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    kept, rep = dedup_against_store(ray.data.from_arrow(empty), store)
    assert rep == {"new_docs": 0, "dup_vs_store": 0,
                   "dup_within_batch": 0, "kept": 0}


def test_prepared_corpus_incremental(ray_session, tmp_path):
    """The composed corpus-prep flow: first run seeds the store, a rerun of
    overlapping input keeps only the genuinely new docs."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.corpus import (
        prepared_corpus,
    )

    store = str(tmp_path / "store")
    texts1 = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "streaming executors schedule pipeline stages with backpressure "
        "control across worker nodes",
    ]
    b1 = _batch([_doc(i, t) for i, t in enumerate(texts1)])
    rep1 = {}
    out1 = prepared_corpus(ray.data.from_arrow(b1), min_tokens=3,
                           dedup_store=store, store_report=rep1)
    assert out1.count() == 2 and rep1 == {"seeded": True}

    fresh = ("parquet row groups carry min max statistics enabling "
             "predicate pushdown at scan time")
    b2 = _batch([_doc(10, texts1[0]), _doc(11, fresh)])
    rep2 = {}
    out2 = prepared_corpus(ray.data.from_arrow(b2), min_tokens=3,
                           dedup_store=store, store_report=rep2)
    assert sorted(out2.to_pandas()["doc_id"]) == [11]
    assert rep2["dup_vs_store"] == 1 and rep2["kept"] == 1


def test_band_store_compaction(ray_session, store):
    """Each update appends files per touched shard; compaction folds every
    multi-file shard to ONE file, dedups replay copies, and changes no
    probe answer."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import (
        band_store_stats,
        compact_band_store,
    )

    texts = ["fresh passage number one about arrow compute kernels",
             "fresh passage number two about object store spilling"]
    for i, t in enumerate(texts):
        dedup_against_store(ray.data.from_arrow(_batch([_doc(50 + i, t)])),
                            store)
    s0 = band_store_stats(store)
    assert s0["files"] > s0["shards"]  # appends piled up
    rep = compact_band_store(store)
    assert rep["shards_compacted"] >= 1
    s1 = band_store_stats(store)
    assert s1["files"] == s1["shards"]          # one file per shard
    assert s1["rows"] <= s0["rows"]             # replay dups folded
    # probe answers unchanged: both texts still dedup as store hits
    kept, repp = dedup_against_store(
        ray.data.from_arrow(_batch([_doc(60, texts[0]),
                                    _doc(61, BASE_TEXTS[0])])),
        store, update=False)
    assert repp["dup_vs_store"] == 2 and repp["kept"] == 0
