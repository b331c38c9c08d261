"""Incrementally-maintained vector index over a CDC lake (the "vector
search on your live table" tier a RAG / training-data platform pairs with
CDC ingest — Lance/Milvus's role, rebuilt on the lake's own change feed).

``VectorIndexView`` materializes a centroid-partitioned (IVF) index of one
``list<double>`` lake column and keeps it current at CHANGE-FEED COST:

* ``build()`` trains seeded k-means-lite centroids on a sample, assigns
  every live row inside ``map_batches`` (centroids broadcast via
  ``ray.put``) and writes hive-partitioned parquet per centroid list —
  one streaming pass over the lake, no shuffle (each block fans its rows
  into its lists' files locally).  The centroids are FROZEN into the view
  manifest: the physical layout is the contract (same reasoning as the
  lake's committed partition config and the z-order quantization bounds),
  so later refreshes place vectors identically on any topology.
* ``refresh()`` appends inserted/updated vectors to their frozen-centroid
  lists as NEW files and records per-key GENERATION-BOUNDED tombstones for
  updates/deletes (an update may move a key to a different list, so the
  stale row cannot be dropped in place without reading it; the tombstone
  kills it at probe time wherever it lives).  Change source per span:
  spans that only APPENDED pure-upsert/delete merge-on-read delta files
  are consumed from those files directly — cost ∝ the MICRO-BATCH — and
  everything else (compactions, rewrites, rollbacks, patch/erasure
  semantics) falls back to the exact ``lake_changes`` feed, cost ∝ the
  changed partitions.
* ``search()`` probes only the ``nprobe`` nearest lists' files (read
  pruning, never a corpus scan), subtracts the tombstones (broadcast once
  — they are change-feed-sized between compactions), optionally applies a
  metadata predicate over the view's stored ``payload_cols``
  (filter-then-top-k, the vector-DB pattern — ``where=[Constraint...]``),
  and reduces exact per-batch local top-k candidates,
  ``(-cosine, conv_id, turn_idx)`` tie-broken.
* ``compact()`` folds appends + tombstones per list back into one base
  file per list (the LSM fold — bounded read amplification).

Tombstone rule (one live row per key, proof by induction over refreshes):
every stored row is stamped with the GENERATION (refresh counter) that
wrote it, and a row is DEAD iff some tombstone (key, gen) has
``row.gen < gen``.  An update or delete of a key in generation g emits
tombstone (key, g): it kills every earlier-generation row of the key,
never the row the same refresh appends (gen == g) and never a later
re-insert (gen > g).  The change feed emits at most one row per key per
refresh, so each key has at most one live row and the view equals
``read_lake`` state exactly (pinned against a fresh rebuild in
tests/test_vector_view.py).  Generations — unlike LSN bounds — survive a
lake ROLLBACK: the rollback's change feed restores rows whose lsns move
BACKWARDS, and a generation stamp still orders the restore after what it
supersedes (test_refresh_across_rollback).

Crash safety mirrors the lake: each build/refresh/compact writes its files
under a fresh ``gen-NNNNNN/`` directory, then swaps ``view_manifest.json``
atomically (``state/manifest.py`` sidecar-rename).  A crash mid-generation
leaves unreferenced orphans; the previous manifest stays authoritative.

Reference analog: none (the reference is a single-column filter); this is
the similarity-search tier SURVEY.md's LLM-pipeline mandate adds, composed
with the CDC lake's exactly-once versioning.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from embulk_filter_timestamp_format_ray.stages.ann import (
    _normalize,
    embeddings_to_matrix,
    train_centroids,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf

VIEW_MANIFEST = "view_manifest.json"
VIEW_LOCK = ".view_commit.lock"
KEY_COLUMNS = ("conv_id", "turn_idx")
_UPSERT_TYPES = ("insert", "update")


class ViewCommitConflict(Exception):
    """The view manifest advanced between this writer's read and its
    commit — a concurrent refresher/compactor won the race.  Safe to
    retry whole: the loser's generation files are unreferenced orphans
    (``gc()`` reclaims them) and a re-read starts from the fresh
    manifest."""


def _read_view_manifest(index_dir: str) -> "dict | None":
    path = os.path.join(index_dir, VIEW_MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _gen_dir(index_dir: str, gen: int) -> str:
    """Writer-UNIQUE staging dir for one generation's files.  The uuid
    suffix is the lake's txn-dir discipline: two writers racing the same
    generation must never share a directory, because the winner collects
    its files by listing its own dir — a shared dir would make the winner
    reference the loser's files too (double-indexed rows; caught by
    stress_occ --vector-view).  The loser's whole dir becomes a gc-able
    orphan."""
    import uuid

    return os.path.join(index_dir, f"gen-{gen:06d}-{uuid.uuid4().hex[:8]}")


def _list_parquet_files(root: str) -> "dict[int, list[str]]":
    """{ivf_list: [relpaths under index_dir]} for one generation's
    hive-partitioned vectors dir (metadata-tier listing: ≤ n_centroids
    directories)."""
    out: "dict[int, list[str]]" = {}
    vdir = os.path.join(root, "vectors")
    if not os.path.isdir(vdir):
        return out
    for part in sorted(os.listdir(vdir)):
        if not part.startswith("ivf_list="):
            continue
        c = int(part.split("=", 1)[1])
        pdir = os.path.join(vdir, part)
        out[c] = [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                  if f.endswith(".parquet")]
    return out


class _AssignStage:
    """map_batches callable: append each row's frozen-centroid list id
    (centroids broadcast once via ``ray.put``; stages.ann.IVFAssignStage
    with the vector column name parameterized)."""

    def __init__(self, centroids_ref, col: str):
        self.centroids_ref = centroids_ref
        self.col = col
        self._c = None

    def _centroids(self) -> np.ndarray:
        if self._c is None:
            c = self.centroids_ref
            try:
                import ray

                if isinstance(c, ray.ObjectRef):
                    c = ray.get(c)
            except Exception:
                pass
            self._c = np.asarray(c, dtype=np.float64)
        return self._c

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list",
                                       pa.array([], pa.int64()))
        x = _normalize(embeddings_to_matrix(batch, col=self.col))
        assign = np.argmax(x @ self._centroids().T, axis=1)
        return batch.append_column("ivf_list",
                                   pa.array(assign.astype(np.int64)))


class _TombstoneFilter:
    """map_batches callable: drop index rows killed by a tombstone
    (``row.gen < gen`` for the row's key).  The tombstone table is
    broadcast ONCE via ``ray.put`` (change-feed-sized between
    compactions); the probe is one order-preserving pandas merge per
    batch — vectorized, no per-row lookups."""

    def __init__(self, tomb_ref):
        self.tomb_ref = tomb_ref
        self._tomb = None

    def _tombstones(self):
        if self._tomb is None:
            t = self.tomb_ref
            try:
                import ray

                if isinstance(t, ray.ObjectRef):
                    t = ray.get(t)
            except Exception:
                pass
            self._tomb = t.to_pandas()
        return self._tomb

    def __call__(self, batch: pa.Table) -> pa.Table:
        tomb = self._tombstones()
        if not len(tomb):
            return batch
        keys = batch.select(list(KEY_COLUMNS) + ["gen"]).to_pandas()
        merged = keys.merge(tomb, on=list(KEY_COLUMNS), how="left",
                            sort=False)
        bound = merged["tomb_gen"].to_numpy()
        gen = merged["gen"].to_numpy()
        dead = np.nan_to_num(bound, nan=-np.inf) > gen
        return batch.filter(pa.array(~dead))


class _LocalTopK:
    """Per-batch combiner: each query's local exact top-k candidates over
    the batch (composite-key variant of stages.ann._BatchTopK)."""

    def __init__(self, queries_ref, k: int, col: str):
        self.queries_ref = queries_ref
        self.k = k
        self.col = col
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
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "cosine": pa.array([], pa.float64()),
            })
        x = _normalize(embeddings_to_matrix(batch, col=self.col))
        sim = q @ x.T
        k = min(self.k, sim.shape[1])
        idx = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
        take = pa.array(idx.reshape(-1).astype(np.int64))
        rows = batch.select(list(KEY_COLUMNS)).take(take)
        return pa.table({
            "query_id": pa.array(
                np.repeat(np.arange(sim.shape[0], dtype=np.int64), k)),
            "conv_id": rows.column("conv_id"),
            "turn_idx": rows.column("turn_idx"),
            "cosine": pa.array(
                np.take_along_axis(sim, idx, axis=1).reshape(-1)),
        })


def _to_quantized_batch(batch: pa.Table, col: str, dim: int) -> pa.Table:
    """Swap the float vector column for its int8 storage form (q +
    scale_ppm — stages.ann.quantize_embeddings_batch's arithmetic), keeping
    every other column: ~4× less disk, and at 100 TB the embedding column
    IS the dataset.  ``dim`` is the view's committed dimension — an empty
    block can't reveal it, and block schemas must stay uniform."""
    out = batch.drop_columns([col])
    if batch.num_rows == 0:
        out = out.append_column("q", pa.FixedSizeListArray.from_arrays(
            pa.array([], pa.int8()), dim))
        return out.append_column("scale_ppm", pa.array([], pa.int64()))
    x = embeddings_to_matrix(batch, col)
    ma = np.abs(x).max(axis=1)
    safe = np.where(ma == 0.0, 1.0, ma)
    q = np.clip(np.floor(127.0 * x / safe[:, None] + 0.5),
                -127, 127).astype(np.int8)
    out = out.append_column("q", pa.FixedSizeListArray.from_arrays(
        pa.array(q.reshape(-1), pa.int8()), dim))
    return out.append_column(
        "scale_ppm",
        pa.array(np.floor(ma * 1_000_000 + 0.5).astype(np.int64)))


def _from_quantized_batch(batch: pa.Table, col: str) -> pa.Table:
    """Inverse storage map (x ≈ q/127 × scale, per-component float32 cast
    — bit-equal to stages.ann.dequantize_embeddings_batch so the SQL
    oracle replays it)."""
    from embulk_filter_timestamp_format_ray.stages.ann import (
        dequantize_embeddings_batch,
    )

    out = dequantize_embeddings_batch(batch, out_col=col)
    return out.drop_columns(["q", "scale_ppm"])


def _stamp_gen(gen: int):
    """map_batches callable: stamp every row with the generation that
    writes it (the tombstone rule's ordering stamp)."""
    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "gen", pa.array(np.full(batch.num_rows, gen, dtype=np.int64)))
    return f


def _is_in_filter(column: str, values: "tuple[str, ...]"):
    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(column),
                        value_set=pa.array(list(values))).fill_null(False)
        return batch.filter(mask)
    return f


class VectorIndexView:
    """Centroid-partitioned ANN index over one lake column, maintained
    incrementally from the lake's change feed (module docstring has the
    layout + tombstone invariants)."""

    def __init__(self, pipeline, index_dir: str, col: str = "embedding",
                 n_centroids: int = 16, sample_size: int = 2048,
                 seed: int = 3, quantized: bool = False,
                 payload_cols: "tuple[str, ...]" = ()):
        self.pipeline = pipeline
        self.index_dir = index_dir
        self.col = col
        self.n_centroids = n_centroids
        self.sample_size = sample_size
        self.seed = seed
        # filterable metadata stored IN the index rows (the vector-DB
        # payload pattern): search(where=[Constraint...]) selects on these
        # without touching the lake.  Committed at build() like the
        # storage form.
        self.payload_cols = tuple(payload_cols)
        # storage form decided at build() and COMMITTED in the manifest
        # (refresh/search/compact read it from there — the layout is the
        # contract, the constructor arg only matters for the first build)
        self.quantized = quantized

    # ------------------------------------------------------------ build

    def build(self) -> dict:
        """Full index build pinned to the lake's CURRENT version (one
        streaming assign+write pass; the version pin makes a concurrent
        commit invisible — the next refresh picks it up from the feed)."""
        import ray
        import ray.data  # noqa: F401

        if _read_view_manifest(self.index_dir) is not None:
            raise ValueError(
                f"{self.index_dir!r} already holds a vector view; "
                "refresh() maintains it (delete the directory to rebuild)")
        build_gen = -1  # commit-time guard: still no manifest / untouched
        v = mf.read_manifest(self.pipeline.lake_dir)["version"]
        overlap = set(self.payload_cols) & {*KEY_COLUMNS, "lsn", self.col}
        if overlap:
            raise ValueError(f"payload_cols overlap index columns: "
                             f"{sorted(overlap)}")
        cols = [*KEY_COLUMNS, "lsn", self.col, *self.payload_cols]
        ds = self.pipeline.read_lake_at(v, columns=cols)

        sample_tbl = ds.limit(self.sample_size).to_pandas() \
            .sort_values(list(KEY_COLUMNS)).reset_index(drop=True)
        if not len(sample_tbl):
            raise ValueError("cannot build a vector view over an empty lake")
        sample = np.stack(sample_tbl[self.col].to_numpy()).astype(np.float64)
        centroids = train_centroids(sample, self.n_centroids, self.seed)

        gen = 0
        gdir = _gen_dir(self.index_dir, gen)
        os.makedirs(os.path.join(gdir, "vectors"), exist_ok=True)
        cref = ray.put(centroids) if ray.is_initialized() else centroids
        assigned = ds.map_batches(_AssignStage(cref, self.col),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        assigned = assigned.map_batches(_stamp_gen(gen),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
        if self.quantized:
            col, dim = self.col, int(centroids.shape[1])
            assigned = assigned.map_batches(
                lambda b: _to_quantized_batch(b, col, dim),
                batch_format="pyarrow", zero_copy_batch=True)
        assigned.write_parquet(os.path.join(gdir, "vectors"),
                               partition_cols=["ivf_list"])
        files = _list_parquet_files(gdir)
        # row count from the written files' footers — a ds.count() here
        # would re-scan the whole lake a second time
        rows = sum(pq.read_metadata(p).num_rows
                   for fs in files.values() for p in fs)
        self._commit({
            "generation": gen,
            "cursor_version": v,
            "col": self.col,
            "dim": int(centroids.shape[1]),
            "n_centroids": int(len(centroids)),
            "centroids": centroids.tolist(),
            "quantized": bool(self.quantized),
            "payload_cols": list(self.payload_cols),
            "vector_files": {str(c): [os.path.relpath(p, self.index_dir)
                                      for p in fs]
                             for c, fs in files.items()},
            "tombstone_files": [],
            "rows_indexed": rows,
        }, expected_generation=build_gen)
        return {"built": True, "cursor_version": v, "rows_indexed": rows,
                "lists": len(files)}

    # ---------------------------------------------------------- refresh

    def refresh(self) -> dict:
        """Bring the view to the lake's committed head at change-feed cost:
        upserts append to their frozen-centroid lists, updates/deletes add
        generation-bounded tombstones.  Idempotent per version (a no-op
        when the cursor is current); atomic (manifest swap after all files
        land).

        Two change sources, picked per span:

        * **delta-file fast path** — when the span between cursor and head
          only APPENDED merge-on-read delta files (base paths, dv lists and
          the partition set all unchanged) and those files carry only
          upsert/delete ops, the new files themselves enumerate the
          changes: cost ∝ the micro-batch, never the lake.  Sound because
          the low-watermark prune guarantees every delta row's lsn exceeds
          every base row's lsn in its partition, so the per-key max-lsn
          delta row IS the live post-image.
        * **exact change feed** (``lake_changes``) — everything else:
          compactions, rewrites (delete/transform/clustering), rollbacks,
          repartitions, patch/delete_conv semantics, schema evolution.
          Cost ∝ changed partitions' data."""
        import ray
        import ray.data  # noqa: F401

        m = self._manifest()
        v_now = mf.read_manifest(self.pipeline.lake_dir)["version"]
        cursor = m["cursor_version"]
        if v_now == cursor:
            return {"appended": 0, "tombstones": 0,
                    "cursor_version": cursor}

        gen = m["generation"] + 1
        gdir = _gen_dir(self.index_dir, gen)
        os.makedirs(gdir, exist_ok=True)

        pair = self._delta_span_changes(cursor, v_now, gen)
        if pair == "noop":
            # metadata-only span (constraint commit etc.): just advance
            # the cursor — no files, no generation bump
            self._commit({**m, "cursor_version": v_now},
                         expected_generation=m["generation"])
            return {"appended": 0, "tombstones": 0,
                    "cursor_version": v_now, "source": "metadata_only"}
        source = "delta_files"
        if pair is None:
            source = "change_feed"
            # The feed is consumed twice (appends + tombstones); it is
            # delta-sized — the span between two commits, not the lake —
            # so materializing it avoids re-running the manifest-diff
            # lineage per consumer (DESIGN #31's aggregate-sized
            # exception).
            payload = tuple(m.get("payload_cols", ()))
            feed = self.pipeline.lake_changes(
                cursor, v_now,
                columns=[self.col, *payload]).materialize()

            def to_tombstones(batch: pa.Table) -> pa.Table:
                ct = batch.column("change_type")
                keep = pc.or_(pc.equal(ct, "update"),
                              pc.equal(ct, "delete")).fill_null(False)
                b = batch.filter(keep)
                # the key changed in THIS generation: kill every earlier-
                # generation row of the key (the same refresh's append —
                # if any — carries gen == this generation and survives;
                # so does any later re-insert).  Generation ordering is
                # rollback-proof where an lsn bound is not: a rollback
                # restores rows whose lsns move backwards.
                return pa.table({
                    "conv_id": b.column("conv_id"),
                    "turn_idx": b.column("turn_idx"),
                    "tomb_gen": pa.array(
                        np.full(b.num_rows, gen, dtype=np.int64)),
                })

            ups = feed.map_batches(
                _is_in_filter("change_type", _UPSERT_TYPES),
                batch_format="pyarrow", zero_copy_batch=True)
            ups = ups.map_batches(
                lambda b: b.select([*KEY_COLUMNS, "lsn", self.col,
                                    *payload]),
                batch_format="pyarrow", zero_copy_batch=True)
            tombs = feed.map_batches(to_tombstones, batch_format="pyarrow",
                                     zero_copy_batch=True)
        else:
            ups, tombs = pair

        centroids = np.asarray(m["centroids"], dtype=np.float64)
        cref = ray.put(centroids) if ray.is_initialized() else centroids
        ups = ups.map_batches(_AssignStage(cref, self.col),
                              batch_format="pyarrow", zero_copy_batch=True)
        ups = ups.map_batches(_stamp_gen(gen), batch_format="pyarrow",
                              zero_copy_batch=True)
        if m.get("quantized"):
            col, dim = self.col, int(m["dim"])
            ups = ups.map_batches(
                lambda b: _to_quantized_batch(b, col, dim),
                batch_format="pyarrow", zero_copy_batch=True)
        appended = int(ups.count())
        if appended:
            ups.write_parquet(os.path.join(gdir, "vectors"),
                              partition_cols=["ivf_list"])

        n_tombs = int(tombs.count())
        if n_tombs:
            tombs.write_parquet(os.path.join(gdir, "tombstones"))

        files = _list_parquet_files(gdir)
        vector_files = {c: list(fs)
                        for c, fs in m["vector_files"].items()}
        for c, fs in files.items():
            vector_files.setdefault(str(c), []).extend(
                os.path.relpath(p, self.index_dir) for p in fs)
        tomb_files = list(m["tombstone_files"])
        tdir = os.path.join(gdir, "tombstones")
        if os.path.isdir(tdir):
            tomb_files.extend(
                os.path.relpath(os.path.join(tdir, f), self.index_dir)
                for f in sorted(os.listdir(tdir)) if f.endswith(".parquet"))
        self._commit({**m, "generation": gen, "cursor_version": v_now,
                      "vector_files": vector_files,
                      "tombstone_files": tomb_files},
                     expected_generation=m["generation"])
        return {"appended": appended, "tombstones": n_tombs,
                "cursor_version": v_now, "source": source}

    def _delta_span_changes(self, cursor: int, v_now: int, gen: int):
        """Delta-file fast path: returns ``(ups, tombs)`` datasets computed
        from the span's NEW merge-on-read delta files alone (cost ∝ the
        micro-batch), or None when the span isn't a pure upsert/delete
        delta-append (then the exact change feed applies).

        Soundness: the low-watermark prune makes every delta row's lsn
        exceed every base row's lsn in its partition, so the per-key
        max-lsn row across the new files is the live post-image; a
        generation tombstone per touched key kills whatever it superseded
        (including cross-list moves) without reading it."""
        import ray.data

        from embulk_filter_timestamp_format_ray.stages.relational import (
            latest_by_key,
        )

        lake_dir = self.pipeline.lake_dir
        m_from = mf.read_manifest_at(lake_dir, cursor)
        m_to = mf.read_manifest_at(lake_dir, v_now)
        pf = m_from.get("partitions", {})
        pt = m_to.get("partitions", {})
        if set(pf) != set(pt):
            return None
        new_rels: "list[str]" = []
        for pid, meta_t in pt.items():
            meta_f = pf[pid]
            if meta_f.get("path") != meta_t.get("path"):
                return None  # base rewritten: compaction/rollback/rewrite
            df = [d["path"] for d in meta_f.get("deltas", [])]
            dt = [d["path"] for d in meta_t.get("deltas", [])]
            if df != dt[:len(df)]:
                return None  # deltas folded away mid-span
            if [d["path"] for d in meta_f.get("dvs", [])] != \
                    [d["path"] for d in meta_t.get("dvs", [])]:
                return None  # deletion vectors moved
            new_rels.extend(dt[len(df):])
        if not new_rels:
            return "noop"  # metadata-only span: live state untouched
        payload = tuple(self._manifest().get("payload_cols", ()))
        files = [os.path.join(lake_dir, r) for r in new_rels]
        need = {"op", *KEY_COLUMNS, "lsn", self.col, *payload}
        for f in files:  # driver-side footer peek, ≤ span's file count
            if not need <= set(pq.read_schema(f).names):
                return None  # e.g. files predating the vector column
        # micro-batch-sized and consumed by two passes (op scan + winners
        # fold) — materialize once instead of re-reading the parquet per
        # consumer (DESIGN #31's aggregate-sized exception)
        ds = ray.data.read_parquet(
            files,
            columns=["op", *KEY_COLUMNS, "lsn", self.col, *payload]) \
            .materialize()
        ops = {r["op"] for r in ds.map_batches(
            lambda b: pa.table({"op": b.column("op").unique()}),
            batch_format="pyarrow", zero_copy_batch=True).take_all()}
        if not ops <= {"upsert", "delete"}:
            return None  # patch / delete_conv semantics need the fold
        # winners: one row per touched key (map-side combined shuffle);
        # consumed twice (appends + tombstones) → materialize
        winners = latest_by_key(ds, list(KEY_COLUMNS), "lsn").materialize()
        col = self.col

        def to_ups(batch: pa.Table) -> pa.Table:
            keep = pc.and_(pc.equal(batch.column("op"), "upsert"),
                           pc.is_valid(batch.column(col)))
            return batch.filter(keep.fill_null(False)).select(
                [*KEY_COLUMNS, "lsn", col, *payload])

        def to_tombs(batch: pa.Table) -> pa.Table:
            return pa.table({
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "tomb_gen": pa.array(
                    np.full(batch.num_rows, gen, dtype=np.int64)),
            })

        ups = winners.map_batches(to_ups, batch_format="pyarrow",
                                  zero_copy_batch=True)
        tombs = winners.map_batches(to_tombs, batch_format="pyarrow",
                                    zero_copy_batch=True)
        return ups, tombs

    # ----------------------------------------------------------- search

    def search(self, queries, k: int = 10, nprobe: int = 4, where=None):
        """Exact-over-probed-lists cosine top-k: reads ONLY the probed
        lists' files (columns pruned to keys+gen+vector plus exactly the
        payload columns ``where`` touches), subtracts the broadcast
        tombstones, per-batch local top-k, tiny final reduce.

        ``where``: optional list of ``Constraint`` specs over the view's
        committed ``payload_cols`` — FILTERED vector search (the vector-DB
        metadata-predicate pattern): rows are selected BEFORE ranking, so
        top-k is the best k among matching rows, without touching the
        lake.  Returns a Dataset of (query_id, conv_id, turn_idx, rank)."""
        import ray
        import ray.data

        m = self._manifest()
        where = list(where or [])
        stored = set(m.get("payload_cols", []))
        bad = [c.column for c in where if c.column not in stored]
        if bad:
            raise ValueError(
                f"where column(s) {sorted(set(bad))} are not in the view's "
                f"payload_cols {sorted(stored)}; rebuild with "
                f"payload_cols=(...) to filter on them")
        where_cols = sorted({c.column for c in where})
        centroids = np.asarray(m["centroids"], dtype=np.float64)
        qn = _normalize(np.asarray(queries, dtype=np.float64))
        nprobe = min(nprobe, len(centroids))
        probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
        lists = sorted({int(c) for row in probe for c in row})
        files = [os.path.join(self.index_dir, rel)
                 for c in lists for rel in m["vector_files"].get(str(c), [])]

        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "rank": pa.array([], pa.int64()),
        })
        if not files:
            return ray.data.from_arrow(empty)

        if m.get("quantized"):
            col = self.col
            ds = ray.data.read_parquet(
                files, columns=[*KEY_COLUMNS, "gen", "q", "scale_ppm",
                                *where_cols])
            ds = ds.map_batches(lambda b: _from_quantized_batch(b, col),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
        else:
            ds = ray.data.read_parquet(
                files, columns=[*KEY_COLUMNS, "gen", self.col,
                                *where_cols])
        tomb = self._tombstone_table(m)
        if tomb.num_rows:
            tref = ray.put(tomb) if ray.is_initialized() else tomb
            ds = ds.map_batches(_TombstoneFilter(tref),
                                batch_format="pyarrow", zero_copy_batch=True)
        if where:
            def apply_where(batch: pa.Table, _specs=tuple(where)) -> pa.Table:
                mask = np.ones(batch.num_rows, dtype=bool)
                for spec in _specs:  # AND'd, like read_lake(where=...)
                    mask &= spec.matches(batch)
                return batch.filter(pa.array(mask))

            ds = ds.map_batches(apply_where, batch_format="pyarrow",
                                zero_copy_batch=True)
        qref = ray.put(qn) if ray.is_initialized() else qn
        cand = ds.map_batches(_LocalTopK(qref, k, self.col),
                              batch_format="pyarrow", zero_copy_batch=True)

        def final_topk(group: pa.Table) -> pa.Table:
            g = group.drop_columns(
                [c for c in ("_shard",) if c in group.schema.names])
            order = pc.sort_indices(g, sort_keys=[
                ("cosine", "descending"), ("conv_id", "ascending"),
                ("turn_idx", "ascending")])
            g = g.take(order).slice(0, k)
            return pa.table({
                "query_id": g.column("query_id"),
                "conv_id": g.column("conv_id"),
                "turn_idx": g.column("turn_idx"),
                "rank": pa.array(np.arange(1, g.num_rows + 1)),
            })

        return cand.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pyarrow")

    # ---------------------------------------------------------- retrain

    def retrain(self, n_centroids: "int | None" = None,
                sample_size: "int | None" = None,
                seed: "int | None" = None) -> dict:
        """Re-train the frozen centroids and rebuild every list under them
        as ONE generation swap — the view's ``repartition_lake`` analog for
        distribution drift (skewed lists degrade probe cost; ``stats()``
        makes the skew observable).

        Reads the LAKE at the view's cursor version (not the view's own
        files): identical inputs to a fresh ``build()`` at that version, so
        retrain ≡ delete-and-rebuild bit-for-bit (parity pytest), and a
        quantized view re-quantizes from float truth instead of
        round-tripping its stored int8 rows.  The cursor does not move; a
        concurrent lake commit is invisible and the next ``refresh()``
        picks it up against the NEW centroids.  Pending tombstones fold
        away (the lake read is already live state).  OCC-guarded like
        every other commit; the loser's generation files are gc() fodder.

        Cost ∝ lake size at the cursor — a full rewrite by design, like
        compaction of everything.  Requires the cursor version to still be
        retained (refresh() to head first if retention already dropped
        it)."""
        import ray
        import ray.data  # noqa: F401

        m = self._manifest()
        gen = m["generation"] + 1
        v = m["cursor_version"]
        k = int(n_centroids) if n_centroids else int(m["n_centroids"])
        n_sample = int(sample_size) if sample_size else self.sample_size
        rng_seed = self.seed if seed is None else int(seed)
        payload = tuple(m.get("payload_cols", ()))
        cols = [*KEY_COLUMNS, "lsn", m["col"], *payload]
        ds = self.pipeline.read_lake_at(v, columns=cols)

        sample_tbl = ds.limit(n_sample).to_pandas() \
            .sort_values(list(KEY_COLUMNS)).reset_index(drop=True)
        if not len(sample_tbl):
            raise ValueError("cannot retrain a vector view over an empty "
                             "lake snapshot")
        sample = np.stack(sample_tbl[m["col"]].to_numpy()).astype(np.float64)
        centroids = train_centroids(sample, k, rng_seed)

        gdir = _gen_dir(self.index_dir, gen)
        os.makedirs(os.path.join(gdir, "vectors"), exist_ok=True)
        cref = ray.put(centroids) if ray.is_initialized() else centroids
        assigned = ds.map_batches(_AssignStage(cref, m["col"]),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        assigned = assigned.map_batches(_stamp_gen(gen),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
        if m.get("quantized"):
            col, dim = m["col"], int(centroids.shape[1])
            assigned = assigned.map_batches(
                lambda b: _to_quantized_batch(b, col, dim),
                batch_format="pyarrow", zero_copy_batch=True)
        assigned.write_parquet(os.path.join(gdir, "vectors"),
                               partition_cols=["ivf_list"])
        files = _list_parquet_files(gdir)
        rows = sum(pq.read_metadata(p).num_rows
                   for fs in files.values() for p in fs)
        self._commit({**m, "generation": gen,
                      "n_centroids": int(len(centroids)),
                      "centroids": centroids.tolist(),
                      "vector_files": {
                          str(c): [os.path.relpath(p, self.index_dir)
                                   for p in fs]
                          for c, fs in files.items()},
                      "tombstone_files": [],
                      "rows_indexed": rows},
                     expected_generation=m["generation"])
        return {"retrained": True, "cursor_version": v,
                "rows_indexed": rows, "lists": len(files),
                "n_centroids": int(len(centroids))}

    # ------------------------------------------------------------ stats

    def stats(self) -> dict:
        """Metadata-only health snapshot: per-list row counts from parquet
        FOOTERS (≤ generations × lists files opened, zero data reads), the
        skew ratio that tells an operator when ``retrain()`` is due, and
        the pending-tombstone backlog that tells them when ``compact()``
        is.  Counts are pre-tombstone (footer-level; subtracting would
        need a data read — ``verify()`` is the exact tier)."""
        m = self._manifest()
        per_list = {
            int(c): sum(pq.read_metadata(
                os.path.join(self.index_dir, rel)).num_rows for rel in fs)
            for c, fs in m["vector_files"].items()}
        counts = np.array(list(per_list.values()), dtype=np.int64) \
            if per_list else np.zeros(0, dtype=np.int64)
        mean = float(counts.mean()) if len(counts) else 0.0
        tombs = sum(pq.read_metadata(
            os.path.join(self.index_dir, rel)).num_rows
            for rel in m["tombstone_files"])
        file_count = sum(len(fs) for fs in m["vector_files"].values())
        return {
            "generation": int(m["generation"]),
            "cursor_version": int(m["cursor_version"]),
            "n_centroids": int(m["n_centroids"]),
            "quantized": bool(m.get("quantized", False)),
            "lists_live": len(per_list),
            "files": file_count,
            "rows_stored": int(counts.sum()),
            "tombstones_pending": int(tombs),
            "rows_per_list": {"min": int(counts.min()) if len(counts) else 0,
                              "max": int(counts.max()) if len(counts) else 0,
                              "mean": round(mean, 1)},
            "list_skew": round(float(counts.max()) / mean, 3)
            if len(counts) and mean else 0.0,
        }

    # ---------------------------------------------------------- compact

    def compact(self) -> dict:
        """Fold every list's appends + the pending tombstones into one base
        file per list (the LSM fold): read amplification and the broadcast
        tombstone table both reset to zero.  One Ray task per list; atomic
        manifest swap."""
        import ray
        import ray.data

        m = self._manifest()
        gen = m["generation"] + 1
        gdir = _gen_dir(self.index_dir, gen)
        vdir = os.path.join(gdir, "vectors")
        os.makedirs(vdir, exist_ok=True)
        tomb = self._tombstone_table(m)
        index_dir = self.index_dir
        # compaction folds the STORED form as-is (quantized rows are the
        # committed truth — no de/re-quantization drift)
        tref = ray.put(tomb) if ray.is_initialized() else tomb
        filt = _TombstoneFilter(tref)

        items = pa.table({
            "ivf_list": pa.array([int(c) for c in m["vector_files"]],
                                 pa.int64()),
            "files": pa.array([json.dumps(m["vector_files"][c])
                               for c in m["vector_files"]], pa.string()),
        })

        def fold_list(batch: pa.Table) -> pa.Table:
            rows = []
            for item in batch.to_pylist():  # metadata-tier (≤ n_centroids)
                c, rels = item["ivf_list"], json.loads(item["files"])
                # full-column read: a compaction is a rewrite, and the
                # stored payload columns must ride through it
                tbls = [pq.read_table(os.path.join(index_dir, r))
                        for r in rels]
                live = filt(pa.concat_tables(tbls)) if tbls else None
                if live is None or live.num_rows == 0:
                    rows.append({"ivf_list": c, "path": "", "rows": 0})
                    continue
                ldir = os.path.join(vdir, f"ivf_list={c}")
                os.makedirs(ldir, exist_ok=True)
                path = os.path.join(ldir, "compact-00000.parquet")
                pq.write_table(live, path)
                rows.append({"ivf_list": c,
                             "path": os.path.relpath(path, index_dir),
                             "rows": live.num_rows})
            return pa.Table.from_pylist(rows) if rows else pa.table({
                "ivf_list": pa.array([], pa.int64()),
                "path": pa.array([], pa.string()),
                "rows": pa.array([], pa.int64())})

        folded = ray.data.from_arrow(items).repartition(items.num_rows or 1) \
            .map_batches(fold_list, batch_format="pyarrow").take_all() \
            if items.num_rows else []
        vector_files = {str(r["ivf_list"]): [r["path"]]
                        for r in folded if r["path"]}
        rows = sum(int(r["rows"]) for r in folded)
        self._commit({**m, "generation": gen,
                      "vector_files": vector_files,
                      "tombstone_files": [], "rows_indexed": rows},
                     expected_generation=m["generation"])
        return {"lists": len(vector_files), "rows_indexed": rows,
                "tombstones_folded": int(tomb.num_rows)}

    # --------------------------------------------------------------- gc

    def gc(self) -> dict:
        """Remove generation files the manifest no longer references —
        compaction supersedes every earlier generation's files, and a
        crashed build/refresh leaves a whole orphan gen dir.  Metadata-tier
        walk (≤ generations × lists files); the manifest is the liveness
        truth.  Like the lake's GC, run it from the maintenance path, not
        concurrently with a LIVE writer: an in-flight refresh's
        not-yet-committed generation files look like orphans (same
        reasoning as state/manifest.gc_orphan_txns' keep_txns)."""
        m = self._manifest()
        live = {rel for fs in m["vector_files"].values() for rel in fs}
        live |= set(m["tombstone_files"])
        removed = 0
        for entry in sorted(os.listdir(self.index_dir)):
            gdir = os.path.join(self.index_dir, entry)
            if not (entry.startswith("gen-") and os.path.isdir(gdir)):
                continue
            for dirpath, _dirs, names in os.walk(gdir, topdown=False):
                for name in names:
                    full = os.path.join(dirpath, name)
                    if os.path.relpath(full, self.index_dir) not in live:
                        os.remove(full)
                        removed += 1
                if not os.listdir(dirpath):
                    os.rmdir(dirpath)
        return {"files_removed": removed}

    # ----------------------------------------------------------- verify

    def verify(self) -> dict:
        """Distributed audit (the view's fsck): the view's live rows — all
        lists, tombstones subtracted — must equal the lake's live state AT
        THE VIEW CURSOR, per-key lsn included (rows whose vector column is
        NULL are exempt: they are unindexable by contract).  Both sides
        stream down to (row count, wraparound sum of a per-row 64-bit key
        hash); only per-block partials reach the driver, so the check runs
        at any scale.  A duplicate live row, a lost append, or an
        under-/over-killing tombstone all shift the sum."""
        import ray
        import ray.data

        m = self._manifest()
        files = [os.path.join(self.index_dir, rel)
                 for fs in m["vector_files"].values() for rel in fs]

        def digest(ds, null_exempt_col: "str | None"):
            from embulk_filter_timestamp_format_ray.sources.changegen import (
                splitmix64,
            )
            from embulk_filter_timestamp_format_ray.stages.dedup import (
                content_hash_batch,
            )

            def partial(batch: pa.Table) -> pa.Table:
                if null_exempt_col is not None:
                    batch = batch.filter(
                        pc.is_valid(batch.column(null_exempt_col)))
                if batch.num_rows == 0:
                    return pa.table({"cnt": pa.array([0], pa.int64()),
                                     "hsum": pa.array([0], pa.int64())})
                hc = np.asarray(content_hash_batch(
                    batch.select(["conv_id"]), text_col="conv_id",
                    out_col="h").column("h")).astype(np.uint64)
                ht = splitmix64(np.asarray(
                    batch.column("turn_idx").cast(pa.int64())), 101)
                hl = splitmix64(np.asarray(
                    batch.column("lsn").cast(pa.int64())), 202)
                row = splitmix64((hc ^ ht ^ hl).astype(np.int64), 303)
                with np.errstate(over="ignore"):
                    s = np.int64(np.sum(row, dtype=np.uint64).astype(
                        np.int64))
                return pa.table({
                    "cnt": pa.array([batch.num_rows], pa.int64()),
                    "hsum": pa.array([int(s)], pa.int64())})

            parts = ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True).take_all()
            cnt = sum(p["cnt"] for p in parts)
            hsum = 0
            for p in parts:  # metadata-tier: one row per block
                hsum = (hsum + p["hsum"]) & ((1 << 64) - 1)
            return cnt, hsum

        if files:
            vds = ray.data.read_parquet(
                files, columns=[*KEY_COLUMNS, "lsn", "gen"])
            tomb = self._tombstone_table(m)
            if tomb.num_rows:
                tref = ray.put(tomb) if ray.is_initialized() else tomb
                vds = vds.map_batches(_TombstoneFilter(tref),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
            v_cnt, v_sum = digest(vds, None)
        else:
            v_cnt, v_sum = 0, 0
        lds = self.pipeline.read_lake_at(
            m["cursor_version"], columns=[*KEY_COLUMNS, "lsn", self.col])
        l_cnt, l_sum = digest(lds, self.col)
        return {"rows_view": v_cnt, "rows_lake": l_cnt,
                "cursor_version": m["cursor_version"],
                "ok": bool(v_cnt == l_cnt and v_sum == l_sum)}

    # ---------------------------------------------------------- helpers

    def _manifest(self) -> dict:
        m = _read_view_manifest(self.index_dir)
        if m is None:
            raise ValueError(f"{self.index_dir!r} has no vector view; "
                             "build() it first")
        if m["col"] != self.col:
            raise ValueError(f"view indexes column {m['col']!r}, "
                             f"not {self.col!r}")
        return m

    def _commit(self, m: dict,
                expected_generation: "int | None" = None) -> None:
        """Atomic manifest swap under an exclusive flock (the lake's
        commit discipline, state/manifest.py).  ``expected_generation``
        adds optimistic concurrency: if another writer committed a newer
        generation since this writer read the manifest, raise — the
        caller's generation files stay unreferenced (gc fodder), never
        clobbering the winner."""
        os.makedirs(self.index_dir, exist_ok=True)
        with open(os.path.join(self.index_dir, VIEW_LOCK), "w") as lock:
            try:
                import fcntl

                fcntl.flock(lock, fcntl.LOCK_EX)
            except ImportError:  # pragma: no cover - non-POSIX fallback
                pass
            if expected_generation is not None:
                cur = _read_view_manifest(self.index_dir)
                if cur is not None and \
                        int(cur["generation"]) != int(expected_generation):
                    raise ViewCommitConflict(
                        f"view {self.index_dir!r} is at generation "
                        f"{cur['generation']}, but this writer read "
                        f"generation {expected_generation}; a concurrent "
                        f"writer committed first — re-read and retry "
                        f"(orphan files are gc()-reclaimable)")
            mf._atomic_write_json(
                os.path.join(self.index_dir, VIEW_MANIFEST), m)

    def _tombstone_table(self, m: dict) -> pa.Table:
        """Pending tombstones, folded to ONE row per key (max generation)
        — change-feed-sized between compactions, safe to broadcast."""
        schema = pa.schema([("conv_id", pa.string()),
                            ("turn_idx", pa.int32()),
                            ("tomb_gen", pa.int64())])
        if not m["tombstone_files"]:
            return schema.empty_table()
        t = pa.concat_tables([
            pq.read_table(os.path.join(self.index_dir, rel))
            for rel in m["tombstone_files"]]).cast(schema)
        gb = t.group_by(list(KEY_COLUMNS)).aggregate([("tomb_gen", "max")])
        return gb.rename_columns(["conv_id", "turn_idx", "tomb_gen"])
