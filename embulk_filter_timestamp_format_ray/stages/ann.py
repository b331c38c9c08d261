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


# ------------------------------------------------- partitioned IVF index
#
# ``ivf_topk`` assigns lists in flight and then FILTERS every block by
# centroid id — correct and streaming, but the probe still scans the full
# corpus.  The scale path is to pay the assignment shuffle ONCE, persist the
# corpus as centroid-partitioned parquet, and prune AT THE READ: a query set
# probing ``nprobe`` lists opens only those directories' files, so the other
# (n_centroids - nprobe)/n_centroids of a 100-TB corpus never leaves storage.


_CENTROIDS_FILE = "centroids.parquet"
_VECTORS_DIR = "vectors"
_SUCCESS_FILE = "_SUCCESS"
_PARAMS_FILE = "params.json"


def load_ivf_params(index_dir: str) -> dict:
    """Layout contract of a built index; older indexes (no params.json)
    are the float layout with the default column names."""
    import json
    import os

    try:
        with open(os.path.join(index_dir, _PARAMS_FILE)) as f:
            return json.load(f)
    except OSError:
        return {"quantized": False, "id_col": "vec_id", "col": "embedding"}


def build_ivf_index(ds, index_dir: str, *, n_centroids: int = 16,
                    id_col: str = "vec_id", col: str = "embedding",
                    sample_size: int = 2048, seed: int = 3,
                    quantized: bool = False) -> str:
    """Materialize ``ds`` as an on-disk centroid-partitioned IVF index.

    Layout::

        index_dir/centroids.parquet            (ivf_list, centroid[dim])
        index_dir/vectors/ivf_list=<c>/*.parquet   (id_col, col)
        index_dir/_SUCCESS

    Training is the same seeded k-means-lite as ``ivf_topk``, but the init
    sample is sorted by ``id_col`` so the centroids (and hence the physical
    layout) are identical on any read topology.  The write is ONE pass:
    assign inside ``map_batches`` (centroids broadcast via ``ray.put``),
    then ``write_parquet(partition_cols=["ivf_list"])`` — Ray's hive-style
    partitioned write, which shuffles nothing (each block fans its rows
    into per-list files locally).

    ``quantized=True`` stores int8 per-vector symmetric quantization
    (``quantize_embeddings_batch``: q[int8×dim] + scale_ppm) instead of
    the float list — ~4× smaller on disk, which at 100 TB is the
    difference between an index that fits and one that doesn't; probes
    dequantize per batch (max per-component error scale/254).  The layout
    choice is recorded in params.json and resolved automatically at probe
    time."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    sample_tbl = ds.limit(sample_size).to_pandas() \
        .sort_values(id_col).reset_index(drop=True)
    sample = np.stack(sample_tbl[col].to_numpy())
    centroids = train_centroids(sample.astype(np.float64), n_centroids, seed)

    tmp_dir = index_dir.rstrip("/") + ".building"
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, _VECTORS_DIR), exist_ok=True)

    dim = centroids.shape[1]
    cent_tbl = pa.table({
        "ivf_list": pa.array(np.arange(len(centroids), dtype=np.int64)),
        "centroid": pa.FixedSizeListArray.from_arrays(
            pa.array(centroids.reshape(-1), pa.float64()), dim),
    })
    pq.write_table(cent_tbl, os.path.join(tmp_dir, _CENTROIDS_FILE))

    cref = ray.put(centroids) if ray.is_initialized() else centroids
    assigned = ds.select_columns([id_col, col]).map_batches(
        IVFAssignStage(cref, id_col), batch_format="pyarrow",
        zero_copy_batch=True)
    if quantized:
        def to_quantized(batch: pa.Table) -> pa.Table:
            qt = quantize_embeddings_batch(batch, col=col, id_col=id_col)
            # quantize keeps row order, so the assign column re-attaches
            return qt.append_column("ivf_list", batch.column("ivf_list"))

        assigned = assigned.map_batches(to_quantized, batch_format="pyarrow",
                                        zero_copy_batch=True)
    assigned.write_parquet(os.path.join(tmp_dir, _VECTORS_DIR),
                           partition_cols=["ivf_list"])
    with open(os.path.join(tmp_dir, _PARAMS_FILE), "w") as f:
        json.dump({"quantized": bool(quantized), "id_col": id_col,
                   "col": col, "n_centroids": int(n_centroids)}, f)
    with open(os.path.join(tmp_dir, _SUCCESS_FILE), "w") as f:
        f.write("ok\n")
    if os.path.exists(index_dir):
        import shutil

        shutil.rmtree(index_dir)
    os.rename(tmp_dir, index_dir)
    return index_dir


def append_to_ivf_index(ds, index_dir: str, *, id_col: str = "vec_id",
                        col: str = "embedding") -> str:
    """Incrementally add vectors to an existing ``build_ivf_index`` layout
    — the maintenance path a growing corpus needs (a 100-TB index cannot
    rebuild per ingest).  New vectors assign against the FROZEN centroids
    (no retrain: the physical layout is the contract, same reasoning as
    the CDC lake's committed partition config) and land as NEW parquet
    files inside their lists' directories (``write_parquet`` append mode
    never rewrites existing files).  Probe correctness is unaffected
    mid-append: every already-visible file is complete, so a concurrent
    ``ivf_topk_partitioned`` simply sees a prefix of the new vectors."""
    import os

    import ray

    if not os.path.exists(os.path.join(index_dir, _SUCCESS_FILE)):
        raise ValueError(f"{index_dir!r} is not a built IVF index")
    centroids = load_ivf_centroids(index_dir)
    cref = ray.put(centroids) if ray.is_initialized() else centroids
    assigned = ds.select_columns([id_col, col]).map_batches(
        IVFAssignStage(cref, id_col), batch_format="pyarrow",
        zero_copy_batch=True)
    if load_ivf_params(index_dir).get("quantized"):
        # the committed layout is quantized — appended rows must match it
        def to_quantized(batch: pa.Table) -> pa.Table:
            qt = quantize_embeddings_batch(batch, col=col, id_col=id_col)
            return qt.append_column("ivf_list", batch.column("ivf_list"))

        assigned = assigned.map_batches(to_quantized, batch_format="pyarrow",
                                        zero_copy_batch=True)
    assigned.write_parquet(os.path.join(index_dir, _VECTORS_DIR),
                           partition_cols=["ivf_list"])
    return index_dir


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(index_dir, _CENTROIDS_FILE))
    carr = tbl.column("centroid").combine_chunks()
    dim = carr.type.list_size
    order = np.argsort(np.asarray(tbl.column("ivf_list")))
    mat = np.asarray(carr.flatten()).reshape(-1, dim)
    return mat[order]


def ivf_probe_paths(index_dir: str, queries: np.ndarray, nprobe: int):
    """(probe_lists, partition_dirs) for a query set — the read-pruning
    contract: a probe touches AT MOST ``len(queries) × nprobe`` (deduped)
    of the n_centroids partition directories, never the whole corpus."""
    import os

    centroids = load_ivf_centroids(index_dir)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, len(centroids))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    lists = sorted({int(c) for row in probe for c in row})
    paths = []
    for c in lists:
        p = os.path.join(index_dir, _VECTORS_DIR, f"ivf_list={c}")
        if os.path.isdir(p):  # empty lists have no directory
            paths.append(p)
    return lists, paths


def ivf_topk_partitioned(index_dir: str, queries, k: int = 10, *,
                         nprobe: int = 4, id_col: str = "vec_id",
                         col: str = "embedding"):
    """Approximate top-k over a ``build_ivf_index`` layout.

    Unlike ``ivf_topk`` this PRUNES THE READ: only the probed lists'
    parquet files are opened (``read_parquet`` over the nprobe partition
    directories, ``columns=[id, embedding]``), then the standard broadcast
    query matrix + per-batch local-top-k combiner + tiny final reduce.
    A ``quantized=True`` index dequantizes per batch before scoring."""
    import ray

    params = load_ivf_params(index_dir)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    _, paths = ivf_probe_paths(index_dir, qn, nprobe)
    # read_parquet over an explicit path LIST wants files, not dirs —
    # expand each probed partition directory to its parquet files
    import os

    files = [os.path.join(d, f) for d in paths
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if params.get("quantized"):
        ds = ray.data.read_parquet(files, columns=[id_col, "q", "scale_ppm"])
        ds = ds.map_batches(
            lambda b: dequantize_embeddings_batch(b, out_col=col)
            .select([id_col, col]),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        ds = ray.data.read_parquet(files, columns=[id_col, col])
    qref = ray.put(qn) if ray.is_initialized() else qn
    cand = ds.map_batches(_BatchTopK(qref, k, id_col), batch_format="pyarrow",
                          zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("cosine", "descending"),
                                                  (id_col, "ascending")])
        g = group.take(order).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(1, g.num_rows + 1)))

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


# ---------------------------------------------------------------- k-means


KMEANS_SCALE = 1 << 16  # fixed-point grid: exact in float64, assoc. in int64


def _quantize(x: np.ndarray) -> np.ndarray:
    """float vectors → int64 fixed-point grid.  ×2^16 is exact in float64;
    rounding to int makes every later sum/distance integer arithmetic —
    associative in ANY combine order, so the distributed result is
    bit-identical to a sequential reference implementation."""
    return np.round(x.astype(np.float64) * KMEANS_SCALE).astype(np.int64)


def _centroid_update(sums: np.ndarray, counts: np.ndarray,
                     prev: np.ndarray) -> np.ndarray:
    """Integer round-half-up mean per cluster; empty clusters keep their
    previous centroid.  (2s+n) // (2n) == round(s/n) for n>0, consistently
    for negative sums (floor division both sides)."""
    out = prev.copy()
    nz = counts > 0
    n = counts[nz][:, None]
    out[nz] = (2 * sums[nz] + n) // (2 * n)
    return out


def _assign_quantized(xq: np.ndarray, cq: np.ndarray) -> np.ndarray:
    """argmin_k Σ(xq - cq_k)² in pure int64 (first minimum wins) — one
    vectorized pass per CENTROID, never per vector."""
    n = len(xq)
    best = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    assign = np.zeros(n, dtype=np.int64)
    for c in range(len(cq)):
        d = xq - cq[c]
        dist = np.einsum("ij,ij->i", d, d)
        better = dist < best
        best[better] = dist[better]
        assign[better] = c
    return assign


class _KMeansAssignStage:
    """map_batches: vectors → (id, cluster) against broadcast centroids."""

    def __init__(self, cent_ref, id_col: str = "vec_id",
                 col: str = "embedding"):
        self.cent_ref = cent_ref
        self.id_col = id_col
        self.col = col
        self._c = None

    def _cent(self) -> np.ndarray:
        if self._c is None:
            from embulk_filter_timestamp_format_ray.stages.relational import (
                resolve_broadcast,
            )

            self._c = np.asarray(resolve_broadcast(self.cent_ref),
                                 dtype=np.int64)
        return self._c

    def __call__(self, batch: pa.Table) -> pa.Table:
        xq = _quantize(embeddings_to_matrix(batch, self.col))
        assign = _assign_quantized(xq, self._cent())
        return pa.table({self.id_col: batch.column(self.id_col),
                         "cluster": pa.array(assign)})


def kmeans_fit_predict(ds, k: int = 10, iters: int = 5,
                       col: str = "embedding", id_col: str = "vec_id",
                       sample_size: int = 2048, seed: int = 17,
                       combine: str = "driver"):
    """Deterministic distributed k-means over an embedding column.

    Lloyd iterations in fixed-point arithmetic (``KMEANS_SCALE`` grid):
    quantized sums are int64 and therefore exactly associative, so the
    per-batch partial sums + sharded combine produce the SAME centroids as
    a sequential pass — no float summation-order drift, which is what makes
    the independent fixture oracle (scripts/make_fixtures.py) exact.

    Per iteration: centroids (k×dim int64, tiny) broadcast via ``ray.put``;
    each batch emits ≤k partial rows (cluster, per-dim sums, count).  The
    data never shuffles — only k×dim integers move.  Init is seeded choice
    from a bounded driver-side sample (same contract as ``ivf_topk``).

    ``combine="driver"`` (default) collects the partial rows directly —
    #blocks × k rows, ONE Ray job per iteration; right whenever
    blocks × k × dim ints fit driver memory (k-means k is small by
    nature).  ``combine="distributed"`` folds partials through the sharded
    aggregate first (k rows reach the driver) — one extra exchange per
    iteration, for extreme block counts.  Results are bit-identical either
    way (integer sums commute).

    Returns ``(assignments_ds, centroids_int)``: (id, cluster) rows plus
    the final quantized centroid matrix."""
    import ray

    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )

    # limit() returns blocks in nondeterministic order (parallel read) —
    # sort by id so the seeded init is identical on any topology
    sample_tbl = ds.limit(sample_size).to_pandas() \
        .sort_values(id_col).reset_index(drop=True)
    x0 = np.stack(sample_tbl[col].to_numpy())
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(x0), size=min(k, len(x0)), replace=False)
    cq = _quantize(x0)[pick]
    dim = cq.shape[1]
    sum_cols = [f"s{d}" for d in range(dim)]

    for _ in range(iters):
        cref = ray.put(cq) if ray.is_initialized() else cq

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            from embulk_filter_timestamp_format_ray.stages.relational import (
                resolve_broadcast,
            )

            c = np.asarray(resolve_broadcast(_cref), dtype=np.int64)
            xq = _quantize(embeddings_to_matrix(batch, col))
            assign = _assign_quantized(xq, c)
            acc = np.zeros((len(c), xq.shape[1]), dtype=np.int64)
            np.add.at(acc, assign, xq)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            cols = {"cluster": pa.array(np.arange(len(c), dtype=np.int64))}
            for d, nm in enumerate(sum_cols):
                cols[nm] = pa.array(acc[:, d])
            cols["n"] = pa.array(cnt)
            return pa.table(cols)

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        if combine == "distributed":
            agg = grouped_aggregate(
                parts, ["cluster"],
                {**{nm: (nm, "sum") for nm in sum_cols},
                 "n": ("n", "sum")}, shards=min(len(cq), 16)) \
                .to_pandas().sort_values("cluster")
            sums = agg[sum_cols].to_numpy(dtype=np.int64)
            counts = agg["n"].to_numpy(dtype=np.int64)
        else:
            pdf = parts.to_pandas()  # #blocks × k rows — tiny by contract
            cl = pdf["cluster"].to_numpy(dtype=np.int64)
            sums = np.zeros((len(cq), dim), dtype=np.int64)
            np.add.at(sums, cl, pdf[sum_cols].to_numpy(dtype=np.int64))
            counts = np.zeros(len(cq), dtype=np.int64)
            np.add.at(counts, cl, pdf["n"].to_numpy(dtype=np.int64))
        cq = _centroid_update(sums, counts, cq)

    cref = ray.put(cq) if ray.is_initialized() else cq
    assigned = ds.map_batches(_KMeansAssignStage(cref, id_col, col),
                              batch_format="pyarrow", zero_copy_batch=True)
    return assigned, cq


# ---------------------------------------------------------- quantization


def quantize_embeddings_batch(batch: pa.Table, col: str = "embedding",
                              id_col: str = "vec_id") -> pa.Table:
    """Symmetric per-vector int8 quantization — the storage form for bulky
    embedding columns (4× smaller than float32; at 100 TB the embedding
    column IS the dataset).  ``q_i = floor(127 * x_i / max|x| + 0.5)``
    clamped to ±127, plus the per-vector scale; fully deterministic IEEE
    double arithmetic, so a SQL engine replays it exactly.

    One vectorized pass per batch: the matrix comes from the Arrow list
    buffers (``embeddings_to_matrix``), scales from one ``np.abs().max``
    per row."""
    x = embeddings_to_matrix(batch, col)
    ma = np.abs(x).max(axis=1)
    safe = np.where(ma == 0.0, 1.0, ma)
    q = np.floor(127.0 * x / safe[:, None] + 0.5)
    q = np.clip(q, -127, 127).astype(np.int8)
    n, dim = q.shape
    qcol = pa.FixedSizeListArray.from_arrays(
        pa.array(q.reshape(-1), pa.int8()), dim)
    return pa.table({
        id_col: batch.column(id_col),
        "q": qcol,
        "scale_ppm": pa.array(np.floor(ma * 1_000_000 + 0.5)
                              .astype(np.int64)),
    })


def dequantize_embeddings_batch(batch: pa.Table, q_col: str = "q",
                                scale_col: str = "scale_ppm",
                                out_col: str = "embedding") -> pa.Table:
    """Inverse of ``quantize_embeddings_batch`` (x ≈ q/127 × scale); max
    reconstruction error is scale/254 per component."""
    qarr = batch.column(q_col)
    if isinstance(qarr, pa.ChunkedArray):
        qarr = qarr.combine_chunks()
    dim = qarr.type.list_size
    # flatten() honors a sliced array's offset; .values would not
    q = np.asarray(qarr.flatten().cast(pa.float64())).reshape(-1, dim)
    scale = np.asarray(batch.column(scale_col)).astype(np.float64) / 1e6
    x = (q / 127.0) * scale[:, None]
    out = pa.FixedSizeListArray.from_arrays(
        pa.array(x.reshape(-1).astype(np.float32), pa.float32()), dim)
    return batch.append_column(out_col, out)
