"""Deterministic fixed-point k-means: topology-independence (the core
claim: integer sums are associative, so block splits cannot change the
result) and structural behavior."""

import numpy as np
import pyarrow as pa


def _toy(ray, n=300, seed=4):
    rng = np.random.default_rng(seed)
    # 3 well-separated planted clusters in 8-d
    centers = rng.standard_normal((3, 8)) * 5
    x = (centers[np.arange(n) % 3]
         + rng.standard_normal((n, 8)) * 0.2).astype(np.float32)
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
    }))


def test_kmeans_recovers_planted_clusters(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.ann import (
        kmeans_fit_predict,
    )

    ds = _toy(ray)
    assigned, cq = kmeans_fit_predict(ds, k=3, iters=6)
    df = assigned.to_pandas().sort_values("vec_id")
    truth = np.arange(len(df)) % 3
    # every planted cluster maps to exactly one predicted cluster
    for t in range(3):
        preds = df["cluster"].to_numpy()[truth == t]
        assert len(np.unique(preds)) == 1
    assert cq.shape == (3, 8) and cq.dtype == np.int64


def test_kmeans_is_topology_independent(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.ann import (
        kmeans_fit_predict,
    )

    ds = _toy(ray, n=400, seed=9)
    a1, c1 = kmeans_fit_predict(ds, k=4, iters=4)
    a2, c2 = kmeans_fit_predict(ds.repartition(13), k=4, iters=4)
    assert np.array_equal(c1, c2)
    d1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    d2 = a2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert d1.equals(d2)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.ann import (
        kmeans_fit_predict,
    )

    # 5 identical points, k=3: two clusters go empty and must keep their
    # init centroids without crashing
    x = np.ones((5, 4), dtype=np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(5, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
    }))
    assigned, cq = kmeans_fit_predict(ds, k=3, iters=3)
    df = assigned.to_pandas()
    assert len(np.unique(df["cluster"])) == 1
    assert cq.shape == (3, 4)


def test_kmeans_combine_modes_identical(ray_session):
    import ray

    from embulk_filter_timestamp_format_ray.stages.ann import (
        kmeans_fit_predict,
    )

    ds = _toy(ray, n=200, seed=21)
    a1, c1 = kmeans_fit_predict(ds, k=3, iters=3)
    a2, c2 = kmeans_fit_predict(ds, k=3, iters=3, combine="distributed")
    assert np.array_equal(c1, c2)
    assert a1.to_pandas().sort_values("vec_id").reset_index(drop=True) \
        .equals(a2.to_pandas().sort_values("vec_id").reset_index(drop=True))


def test_quantize_dequantize_roundtrip():
    from embulk_filter_timestamp_format_ray.stages.ann import (
        dequantize_embeddings_batch,
        quantize_embeddings_batch,
    )

    rng = np.random.default_rng(6)
    x = (rng.standard_normal((50, 16)) * 0.5).astype(np.float32)
    x[0] = 0.0  # all-zero vector: scale 0, no div-by-zero
    batch = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float32()))})
    q = quantize_embeddings_batch(batch)
    assert q.column("q").type.list_size == 16
    deq = dequantize_embeddings_batch(q).to_pandas()
    for i in range(50):
        rec = np.asarray(deq["embedding"][i], dtype=np.float64)
        scale = float(np.abs(x[i].astype(np.float64)).max())
        # max component error = scale/254 (half a quantization step)
        assert np.abs(rec - x[i].astype(np.float64)).max() \
            <= scale / 254 + 1e-9
    # zero vector reconstructs exactly
    assert np.abs(np.asarray(deq["embedding"][0])).max() == 0.0
