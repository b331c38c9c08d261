"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exactness baseline: query matrix broadcast once
  via ``ray.put``, each batch does one numpy matmul and emits only its local
  top-k rows (per-batch combiner), final top-k reduced from the tiny
  candidate set.  Scales linearly in corpus size with zero shuffle.
* ``ivf_topk`` — the scale path: k-means-lite (seeded, one refinement pass
  over a sample) coarse centroids; vectors assign to their nearest centroid
  inside ``map_batches``; queries probe the ``nprobe`` nearest centroid
  partitions only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from embulk_filter_timestamp_format_ray.stages.dedup import embeddings_to_matrix


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Per-batch combiner: emit each query's local top-k candidate rows."""

    def __init__(self, queries_ref, k: int, id_col: str):
        self.queries_ref = queries_ref  # ray ObjectRef | np.ndarray
        self.k = k
        self.id_col = id_col
        self._q = None

    def _queries(self) -> np.ndarray:
        if self._q is None:
            q = self.queries_ref
            try:
                import ray

                if isinstance(q, ray.ObjectRef):
                    q = ray.get(q)
            except Exception:
                pass
            self._q = _normalize(np.asarray(q, dtype=np.float64))
        return self._q

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = self._queries()
        x = _normalize(embeddings_to_matrix(batch))
        ids = np.asarray(batch.column(self.id_col))
        sim = q @ x.T  # (nq, nb)
        k = min(self.k, sim.shape[1])
        idx = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
        qids, nids, scores = [], [], []
        for qi in range(sim.shape[0]):
            qids.append(np.full(k, qi, dtype=np.int64))
            nids.append(ids[idx[qi]])
            scores.append(sim[qi, idx[qi]])
        return pa.table({
            "query_id": pa.array(np.concatenate(qids)),
            self.id_col: pa.array(np.concatenate(nids)),
            "cosine": pa.array(np.concatenate(scores)),
        })


def brute_force_topk(ds, queries, k: int = 10, id_col: str = "vec_id",
                     broadcast: bool = True):
    """Exact cosine top-k for each query row against the whole dataset.

    Returns a Dataset of (query_id, id_col, cosine, rank) with deterministic
    (-cosine, id) tie-breaking."""
    queries = np.asarray(queries, dtype=np.float64)
    ref = queries
    if broadcast:
        try:
            import ray

            ref = ray.put(queries)  # broadcast ONCE, read per task
        except Exception:
            pass
    cand = ds.map_batches(_BatchTopK(ref, k, id_col), batch_format="pyarrow",
                          zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("cosine", "descending"),
                                                  (id_col, "ascending")])
        g = group.take(order).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(1, g.num_rows + 1)))

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


# ------------------------------------------------------------------- IVF


def train_centroids(sample: np.ndarray, n_centroids: int, seed: int = 3,
                    iters: int = 3) -> np.ndarray:
    """Seeded k-means-lite on a driver-side sample (small)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IVFAssignStage:
    def __init__(self, centroids_ref, id_col: str = "vec_id"):
        self.centroids_ref = centroids_ref
        self.id_col = id_col
        self._c = None

    def _centroids(self):
        if self._c is None:
            c = self.centroids_ref
            try:
                import ray

                if isinstance(c, ray.ObjectRef):
                    c = ray.get(c)
            except Exception:
                pass
            self._c = np.asarray(c)
        return self._c

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _normalize(embeddings_to_matrix(batch))
        assign = np.argmax(x @ self._centroids().T, axis=1)
        return batch.append_column("ivf_list", pa.array(assign.astype(np.int64)))


def ivf_topk(ds, queries, k: int = 10, *, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", sample_size: int = 2048, seed: int = 3):
    """Approximate top-k: probe only the nprobe nearest IVF lists per query."""
    import ray

    queries = _normalize(np.asarray(queries, dtype=np.float64))
    sample_tbl = ds.limit(sample_size).to_pandas()
    sample = np.stack(sample_tbl["embedding"].to_numpy())
    centroids = train_centroids(sample.astype(np.float64), n_centroids, seed)
    cref = ray.put(centroids)
    assigned = ds.map_batches(IVFAssignStage(cref, id_col), batch_format="pyarrow",
                              zero_copy_batch=True)
    # probe set per query
    probe = np.argsort(-(queries @ centroids.T), axis=1)[:, :nprobe]
    probe_lists = sorted({int(c) for row in probe for c in row})
    probe_arr = pa.array(probe_lists, type=pa.int64())

    def probe_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("ivf_list"), value_set=probe_arr))

    # vectorized probe filter (a per-row lambda filter would be the exact
    # "Python loop in the hot path" anti-pattern)
    filtered = assigned.map_batches(probe_filter, batch_format="pyarrow",
                                    zero_copy_batch=True)
    qref = ray.put(queries)
    cand = filtered.map_batches(_BatchTopK(qref, k, id_col), batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("cosine", "descending"),
                                                  (id_col, "ascending")])
        g = group.take(order).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(1, g.num_rows + 1)))

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
