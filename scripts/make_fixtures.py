"""Generate the committed oracle fixtures under fixtures/.

The driver's correctness gate compares each queries() entry against DuckDB
SQL.  Five pipelines (winnowing fingerprint, MinHash/SimHash LSH pairs,
embedding near-dup, near-dup corpus removal) are not SQL-expressible, so
their oracle side is a fixture parquet generated HERE by independent
reference implementations:

* kernels: the SCALAR executable specs (``MinHashStage.signature``,
  ``SimHashStage.simhash``, ``FingerprintStage._doc_fingerprint``) — NOT the
  batch-vectorized kernels the Ray pipelines run, so the fixture is a true
  cross-check of the vectorized path;
* topology: plain Python dict/set banding + union-find — NOT the Ray
  groupby/anti-join path.

Also writes the deterministic CDC event stream (seed=42) that the flagship
``cdc_transcripts_final`` oracle SQL folds with an argmax-LSN window.

Fixtures are bound to sf0.01 (the driver's correctness scale).  Re-run after
any semantic change to the kernels:  python scripts/make_fixtures.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_filter_timestamp_format_ray.sources.changegen import (  # noqa: E402
    expected_event_table,
    splitmix64,
)
from embulk_filter_timestamp_format_ray.stages.dedup import (  # noqa: E402
    MinHashStage,
    SimHashStage,
)
from embulk_filter_timestamp_format_ray.stages.text_stats import (  # noqa: E402
    FingerprintStage,
)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
CDC_EVENTS = 20_000


def load_documents():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    return (np.asarray(t.column("doc_id")), t.column("text").to_pylist())


def minhash_pairs_reference(ids, texts, *, threshold, num_perm=64, bands=16,
                            shingle_k=3, max_bucket=256):
    """Independent LSH banding: scalar signatures + dict buckets."""
    stage = MinHashStage(num_perm, shingle_k)
    sigs = {int(i): stage.signature(t or "") for i, t in zip(ids, texts)}
    r = num_perm // bands
    pairs = {}
    for b in range(bands):
        buckets = defaultdict(list)
        for i, sig in sigs.items():
            h = np.uint64(0)
            for j in range(r):
                h = splitmix64(np.array([h ^ sig[b * r + j]], np.uint64),
                               31 + b)[0]
            buckets[int(h)].append(i)
        for members in buckets.values():
            if len(members) < 2 or len(members) > max_bucket:
                continue
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, c = members[x], members[y]
                    est = float((sigs[a] == sigs[c]).mean())
                    if est >= threshold:
                        key = (min(a, c), max(a, c))
                        pairs[key] = est
    return pairs


def simhash_pairs_reference(ids, texts, *, max_hamming=3, max_bucket=256):
    stage = SimHashStage()
    sh = {int(i): np.uint64(stage.simhash(t or "")) for i, t in zip(ids, texts)}
    pairs = {}
    for b in range(4):
        buckets = defaultdict(list)
        for i, v in sh.items():
            buckets[int((v >> np.uint64(16 * b)) & np.uint64(0xFFFF))].append(i)
        for members in buckets.values():
            if len(members) < 2 or len(members) > max_bucket:
                continue
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, c = members[x], members[y]
                    if a == c:
                        continue
                    d = bin(int(sh[a] ^ sh[c])).count("1")
                    if d <= max_hamming:
                        pairs[(min(a, c), max(a, c))] = d
    return pairs


def incremental_dedup_reference(ids, texts, *, num_perm=32, bands=8,
                                shingle_k=3):
    """Independent sequential replay of dedup_against_store's semantics:
    store = EVEN doc_ids' band keys; batch = ODD doc_ids.  A batch doc
    drops if any of its band keys is in the store, or (within-batch) if
    it is a non-min member of a union-find component over shared band
    keys.  Scalar signatures + dict sets — not the Ray path."""
    stage = MinHashStage(num_perm, shingle_k)
    r = num_perm // bands

    def band_keys(text):
        sig = stage.signature(text or "")
        keys = []
        for b in range(bands):
            h = np.uint64(0)
            for j in range(r):
                h = splitmix64(np.array([h ^ sig[b * r + j]], np.uint64),
                               31 + b)[0]
            keys.append((b, int(h)))
        return keys

    store = set()
    batch = []
    for i, t in zip(ids, texts):
        if int(i) % 2 == 0:
            store.update(band_keys(t))
        else:
            batch.append((int(i), band_keys(t)))
    dup_store = {i for i, keys in batch if any(k in store for k in keys)}
    by_key = defaultdict(list)
    for i, keys in batch:
        for k in set(keys):
            by_key[k].append(i)
    pairs = set()
    for members in by_key.values():
        members = sorted(set(members))
        for x in range(1, len(members)):
            pairs.add((members[0], members[x]))
    drop_within = set(union_find_drops(pairs))
    kept = sorted(i for i, _ in batch
                  if i not in dup_store and i not in drop_within)
    return kept


def union_find_drops(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n for n in parent if find(n) != n}


def union_find_survivors(ids, pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    drop = {n for n in parent if find(n) != n}
    return sorted(int(i) for i in ids if int(i) not in drop)


def embedding_pairs_reference(*, threshold=0.95, planes=12, seed=5):
    """Independent numpy re-run of plant-dups + hyperplane LSH + exact
    in-bucket cosine (mirrors __ray_entry__.q_embedding_neardup params)."""
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    emb = t.column("embedding").combine_chunks()
    x = np.asarray(emb.flatten(), dtype=np.float32).reshape(len(ids), -1)
    sel = ids < 32
    counters = (ids[sel][:, None] * x.shape[1]
                + np.arange(x.shape[1])[None, :]).astype(np.int64)
    u = (splitmix64(counters.ravel().astype(np.uint64), 123)
         >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    noisy = x[sel] + (0.02 * (u - 0.5)).reshape(x[sel].shape).astype(np.float32)
    all_ids = np.concatenate([ids, ids[sel] + 1_000_000])
    allx = np.vstack([x, noisy]).astype(np.float64)
    rng = np.random.default_rng(seed)
    pl = rng.standard_normal((allx.shape[1], planes))
    bits = (allx @ pl > 0)
    bucket = np.zeros(len(all_ids), dtype=np.uint64)
    for j in range(planes):
        bucket |= bits[:, j].astype(np.uint64) << np.uint64(j)
    pairs = {}
    for bk in np.unique(bucket):
        members = np.nonzero(bucket == bk)[0]
        if len(members) < 2 or len(members) > 4096:
            continue
        sub = allx[members]
        n = sub / np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
        sim = n @ n.T
        for xi in range(len(members)):
            for yi in range(xi + 1, len(members)):
                if sim[xi, yi] >= threshold:
                    a, c = int(all_ids[members[xi]]), int(all_ids[members[yi]])
                    pairs[(min(a, c), max(a, c))] = float(sim[xi, yi])
    return pairs


def kmeans_reference(*, k=10, iters=5, sample_size=2048, seed=17,
                     scale=1 << 16):
    """Independent SEQUENTIAL fixed-point k-means (pure Python-int inner
    loops — not the batch kernels).  Because the engine quantizes to the
    same int64 grid, every sum/distance is exact integer arithmetic and the
    distributed combine order cannot change the result, so this sequential
    replay is an exact oracle for ``kmeans_fit_predict``."""
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    rows = t.column("embedding").to_pylist()
    xq = [[round(float(v) * scale) for v in row] for row in rows]
    n = len(xq)
    rng = np.random.default_rng(seed)
    pick = rng.choice(min(n, sample_size), size=min(k, n), replace=False)
    cent = [list(xq[int(i)]) for i in pick]

    def assign_one(vec):
        best_d, best_c = None, 0
        for ci, c in enumerate(cent):
            d = sum((a - b) * (a - b) for a, b in zip(vec, c))
            if best_d is None or d < best_d:
                best_d, best_c = d, ci
        return best_c

    for _ in range(iters):
        sums = [[0] * len(xq[0]) for _ in range(len(cent))]
        counts = [0] * len(cent)
        assigns = []
        for vec in xq:
            ci = assign_one(vec)
            assigns.append(ci)
            counts[ci] += 1
            for d, v in enumerate(vec):
                sums[ci][d] += v
        for ci in range(len(cent)):
            if counts[ci]:
                cent[ci] = [(2 * s + counts[ci]) // (2 * counts[ci])
                            for s in sums[ci]]
    final = [assign_one(vec) for vec in xq]
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(final, pa.int64())})


def multimodal_ann_reference(ids, texts, *, dim=32, n_queries=2, k=5):
    """Independent reimplementation of the fake-embed + exact-cosine-top-k
    composition (q_multimodal_embed_ann): payload = utf-8 text bytes,
    embedding = counter-hashed floats, ranking by (-cosine, doc_id)."""
    def embed(text):
        b = np.frombuffer((text or "").encode("utf-8", "ignore") or b"\x00",
                          dtype=np.uint8)
        chunks = np.resize(b.astype(np.uint64), dim)
        h = splitmix64(chunks + np.arange(dim, dtype=np.uint64), 29)
        return (h >> np.uint64(11)).astype(np.float32) / np.float32(1 << 53) \
            - np.float32(0.5)

    x = np.stack([embed(t) for t in texts]).astype(np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    by_id = {int(i): j for j, i in enumerate(ids)}
    rows = []
    for qid in range(n_queries):
        sim = xn[by_id[qid]] @ xn.T
        order = sorted(range(len(ids)), key=lambda j: (-sim[j], int(ids[j])))
        for rank, j in enumerate(order[:k], 1):
            rows.append((qid, int(ids[j]), rank))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "rank": pa.array([r[2] for r in rows], pa.int64()),
    })


_HLL_MASK = (1 << 64) - 1


def _scalar_sm64(x: int, seed: int = 5) -> int:
    z = (x + (seed * 0x9E3779B97F4A7C15) % (1 << 64)) & _HLL_MASK
    z = (z + 0x9E3779B97F4A7C15) & _HLL_MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _HLL_MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _HLL_MASK
    return z ^ (z >> 31)


def _scalar_hll_add(regs: list, hv: int, precision: int) -> None:
    h = _scalar_sm64(int(hv) & _HLL_MASK)
    j = h >> (64 - precision)
    rest = (h << precision) & _HLL_MASK
    rank = (64 - precision + 1) if rest == 0 \
        else 64 - rest.bit_length() + 1
    if rank > regs[j]:
        regs[j] = rank


def _scalar_hll_estimate(regs: list, precision: int) -> int:
    import math

    m = 1 << precision
    alpha = 0.7213 / (1 + 1.079 / m)
    ranks = np.array(regs, dtype=np.int64)
    est = alpha * m * m / np.sum(np.power(2.0, -ranks))
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(math.floor(est + 0.5))


def hll_reference(precision: int = 12) -> pa.Table:
    """Independent SCALAR HyperLogLog over events.event_type (string hash
    path) and events.user_id (int path): per-value Python-int splitmix64 +
    bit_length ranks + dense register list — NOT the vectorized numpy
    leading-zero kernel or the sparse Ray register merge it cross-checks.
    The string pre-hash is the same polars-xxhash primitive the engine
    uses (it's the input under test, not the logic)."""
    import polars as pl_

    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                      columns=["event_type", "user_id"])

    def estimate(hashes) -> int:
        regs = [0] * (1 << precision)
        for hv in hashes:
            _scalar_hll_add(regs, hv, precision)
        return _scalar_hll_estimate(regs, precision)

    sh = pl_.from_arrow(t.column("event_type").combine_chunks()) \
        .hash(seed=42).to_numpy()
    return pa.table({
        "column_name": pa.array(["event_type", "user_id"], pa.string()),
        "approx_distinct": pa.array(
            [estimate(sh), estimate(np.asarray(t.column("user_id")))],
            pa.int64()),
    })


def hll_grouped_reference(precision: int = 12) -> pa.Table:
    """Independent per-group SCALAR HLL: events.event_id grouped by
    event_type via a plain Python dict of dense register lists — NOT the
    sparse segment-max sketch + shard fold it cross-checks
    (stages/relational.py grouped_approx_count_distinct).  event_id, not
    user_id: user_id is exactly 150 per type at sf0.01, which would give
    five identical register sets."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                      columns=["event_type", "event_id"])
    regs: dict = defaultdict(lambda: [0] * (1 << precision))
    for g, v in zip(t.column("event_type").to_pylist(),
                    t.column("event_id").to_pylist()):
        _scalar_hll_add(regs[g], v, precision)
    groups = sorted(regs)
    return pa.table({
        "event_type": pa.array(groups, pa.string()),
        "approx_distinct": pa.array(
            [_scalar_hll_estimate(regs[g], precision) for g in groups],
            pa.int64()),
    })


def pairs_table(pairs: dict, metric_name: str, metric_type) -> pa.Table:
    keys = sorted(pairs)
    return pa.table({
        "id_a": pa.array([k[0] for k in keys], pa.int64()),
        "id_b": pa.array([k[1] for k in keys], pa.int64()),
        metric_name: pa.array([pairs[k] for k in keys], metric_type),
    })


def main():
    os.makedirs(OUT, exist_ok=True)
    ids, texts = load_documents()

    fp = FingerprintStage()
    fps = [np.int64(np.uint64(fp._doc_fingerprint(t or ""))) for t in texts]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "fingerprint": pa.array(fps, pa.int64())}),
                   os.path.join(OUT, "doc_fingerprint_sf001.parquet"))
    print("doc_fingerprint:", len(fps))

    mh = minhash_pairs_reference(ids, texts, threshold=0.6)
    pq.write_table(pairs_table(mh, "est_jaccard", pa.float64()),
                   os.path.join(OUT, "dedup_minhash_sf001.parquet"))
    print("dedup_minhash pairs:", len(mh))

    sh = simhash_pairs_reference(ids, texts)
    pq.write_table(pairs_table(sh, "hamming", pa.int64()),
                   os.path.join(OUT, "dedup_simhash_sf001.parquet"))
    print("dedup_simhash pairs:", len(sh))

    mh85 = minhash_pairs_reference(ids, texts, threshold=0.85)
    survivors = union_find_survivors(ids, mh85)
    pq.write_table(pa.table({"doc_id": pa.array(survivors, pa.int64())}),
                   os.path.join(OUT, "dedup_near_corpus_sf001.parquet"))
    print("dedup_near_corpus survivors:", len(survivors))

    inc = incremental_dedup_reference(ids, texts)
    pq.write_table(pa.table({"doc_id": pa.array(inc, pa.int64())}),
                   os.path.join(OUT, "dedup_incremental_sf001.parquet"))
    print("dedup_incremental kept:", len(inc))

    ep = embedding_pairs_reference()
    pq.write_table(pairs_table(ep, "cosine", pa.float64()),
                   os.path.join(OUT, "embedding_neardup_sf001.parquet"))
    print("embedding_neardup pairs:", len(ep))

    mm = multimodal_ann_reference(ids, texts)
    pq.write_table(mm, os.path.join(OUT, "multimodal_ann_sf001.parquet"))
    print("multimodal_ann rows:", mm.num_rows)

    hll = hll_reference()
    pq.write_table(hll, os.path.join(OUT, "hll_distinct_sf001.parquet"))
    print("hll_distinct:", hll.column("approx_distinct").to_pylist())

    hg = hll_grouped_reference()
    pq.write_table(hg, os.path.join(OUT, "hll_grouped_sf001.parquet"))
    print("hll_grouped:", hg.column("approx_distinct").to_pylist())

    km = kmeans_reference()
    pq.write_table(km, os.path.join(OUT, "kmeans_clusters_sf001.parquet"))
    import collections

    print("kmeans cluster sizes:",
          dict(collections.Counter(km.column("cluster").to_pylist())))

    ev = expected_event_table(CDC_EVENTS, seed=42)
    pq.write_table(ev, os.path.join(OUT, f"cdc_events_{CDC_EVENTS}.parquet"))
    print("cdc events:", ev.num_rows, "cols:", ev.schema.names)

    # partial-column update stream: ~15% of upsert traffic becomes
    # op='patch' events (NULL value columns = unchanged) — the
    # cdc_patch_upserts oracle replays fold_patch_runs' per-column LWW +
    # delete-horizon rule in SQL over this table
    evp = expected_event_table(CDC_EVENTS, seed=42, patch_permille=150)
    pq.write_table(evp,
                   os.path.join(OUT, f"cdc_patch_events_{CDC_EVENTS}.parquet"))
    ops = evp.column("op").to_pylist()
    print("cdc patch events:", evp.num_rows, "patches:", ops.count("patch"))

    # conversation-erasure stream: ~0.5% of events are op='delete_conv'
    # tombstones that erase EVERY turn of their conversation below their
    # lsn — the cdc_conv_erasure oracle replays the conv-horizon rule
    evc = expected_event_table(CDC_EVENTS, seed=42, conv_delete_permille=5)
    pq.write_table(
        evc, os.path.join(OUT, f"cdc_convdel_events_{CDC_EVENTS}.parquet"))
    ops = evc.column("op").to_pylist()
    print("cdc convdel events:", evc.num_rows,
          "tombstones:", ops.count("delete_conv"))

    # vector-traffic stream: the standard event table + a deterministic
    # embedding value column (pure function of lsn; NULL on tombstones) —
    # the cdc_vector_search oracle brute-forces cosine top-k in SQL over
    # exactly these values (list_cosine_similarity), so the embedding is
    # full-precision doubles to keep ranking margins off the float edge
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        embed_batch,
    )

    evv = embed_batch(expected_event_table(CDC_EVENTS, seed=42), dim=8)
    pq.write_table(evv,
                   os.path.join(OUT, f"cdc_vec_events_{CDC_EVENTS}.parquet"))
    print("cdc vec events:", evv.num_rows,
          "dim:", len(evv.column("embedding")[0].as_py()))


if __name__ == "__main__":
    main()
