"""Graph analytics over edge Datasets, Ray-Data-first.

Engine capability beyond the reference's single filter (SURVEY.md §2.12);
joins ``stages/dedup.py``'s connected components as the second member of
the iterative-graph family.

Design notes for 100 TB scale:
* Every superstep is expressed as ONE tag-union key-shard exchange
  (``attach_by_key`` — the time_band_join/temporal_join mechanics, no
  per-key callbacks) plus one map-side-combined aggregate
  (``grouped_aggregate``), so no Ray native-join aggregator actors spin
  up per iteration (their multi-second cold start × iterations would
  dominate; measured on shuffle_join_revenue).
* The rank vector and the degree-enriched edge relation are re-used by
  every iteration, so they are ``materialize()``d — the Pregel/GraphX
  superstep pin (an un-materialized lineage would re-run ALL prior
  iterations per consumer).  Both live in the OBJECT STORE (spillable),
  never on the driver; this is the documented iterative-algorithm
  exception to DESIGN #31.
* Scores are integer-exact (×``scale``, floor at every step — DESIGN
  #17/#64): an oracle replays ranks bit-for-bit; no float sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.stages.relational import (
    _with_key_shard,
    grouped_aggregate,
)


def attach_by_key(left_ds, key: str, right_ds, right_key: str,
                  value_col: str, default: int, out_col: "str | None" = None):
    """Distributed LEFT attach of ONE int64 value column onto ``left_ds``
    by an int64 key: tag + union both sides, ONE key-shard exchange, per
    shard a single sort of the right rows + a ``searchsorted`` gather
    (missing keys take ``default``).  The right side must be unique per
    key (an aggregate output); duplicate keys keep their last value."""
    out_col = out_col or value_col
    l_schema = left_ds.schema()
    l_names = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in l_names}
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["__key"] = b.column(key).cast(pa.int64())
        cols["__val"] = pa.nulls(b.num_rows, pa.int64())
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: pa.nulls(n, l_types[c]) for c in l_names}
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        cols["__key"] = b.column(right_key).cast(pa.int64())
        cols["__val"] = b.column(value_col).cast(pa.int64())
        return pa.table(cols)

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow",
                             zero_copy_batch=True)
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow",
                              zero_copy_batch=True)
    unioned = _with_key_shard(lt.union(rt), ["__key"])
    out_names = l_names + [out_col]

    def attach_shard(group: pa.Table) -> pa.Table:
        from embulk_filter_timestamp_format_ray.stages.relational import (
            warn_large_key_group,
        )

        g = group.drop_columns(["_shard"])
        warn_large_key_group(g.num_rows, "attach_by_key", "shard")
        side = np.asarray(g.column("__side"))
        l_mask = side == 0
        if not l_mask.any():
            return pa.table({c: pa.array([], l_types.get(c, pa.int64()))
                             for c in out_names})
        l_idx = np.nonzero(l_mask)[0]
        left = g.take(pa.array(l_idx))
        # nullable-safe int64 pulls (np.asarray on nullable → float64)
        lk = np.asarray(left.column("__key").combine_chunks()
                        .cast(pa.int64()))
        r_idx = np.nonzero(~l_mask)[0]
        vals = np.full(len(lk), default, dtype=np.int64)
        if len(r_idx):
            rk = np.asarray(g.column("__key").take(pa.array(r_idx))
                            .combine_chunks().cast(pa.int64()))
            rv = np.asarray(g.column("__val").take(pa.array(r_idx))
                            .combine_chunks().cast(pa.int64()))
            order = np.argsort(rk, kind="stable")
            rk_s, rv_s = rk[order], rv[order]
            pos = np.searchsorted(rk_s, lk, side="right") - 1
            safe = np.maximum(pos, 0)
            hit = (pos >= 0) & (rk_s[safe] == lk)
            vals[hit] = rv_s[safe[hit]]
        cols = {c: left.column(c) for c in l_names}
        cols[out_col] = pa.array(vals)
        return pa.table(cols)

    return unioned.groupby("_shard").map_groups(attach_shard,
                                                batch_format="pyarrow")


# Node-count bound below which the rank/degree vectors broadcast via
# ray.put and each superstep costs ONE map-side-combined exchange; above
# it the fully-distributed tier runs (rank vector never leaves the object
# store) — the tfidf_top_terms two-tier dispatch applied to graphs.
PAGERANK_BROADCAST_NODES = 2_000_000


def pagerank(edges_ds, *, iters: int = 3, damping_pct: int = 85,
             scale: int = 1_000_000,
             broadcast_nodes: int = PAGERANK_BROADCAST_NODES):
    """Integer-exact PageRank over a directed int64 edge Dataset
    (columns ``src``, ``dst``), fixed ``iters`` supersteps:

    * r0(v)     = ``scale // N``
    * contrib(u)= ``r_k(u) // outdeg(u)`` (dangling nodes contribute 0 —
      the simplified-PageRank mass leak, same convention the oracle
      replays)
    * r_{k+1}(v)= ``((100-damping_pct)·scale // 100) // N
      + (damping_pct · Σ_in contrib) // 100``

    Every floor happens in the same order on both engines, so a SQL
    oracle with unrolled iteration CTEs matches bit-for-bit (DESIGN #64).

    Two tiers (the tfidf dispatch, logged):

    * nodes ≤ ``broadcast_nodes``: the sorted (node, outdeg, rank) vectors
      broadcast once per superstep via ``ray.put``; each superstep is one
      pass over the pinned edges with per-batch partial dst-sums + one
      map-side-combined aggregate whose node-sized result returns to the
      driver — 1 exchange per superstep.
    * above the bound: the rank vector NEVER leaves the object store —
      per superstep one ``attach_by_key`` (rank onto edges by src), one
      combined sum by dst, one ``attach_by_key`` back onto the node set
      (3 key-shard exchanges; slower, unbounded).

    Both tiers floor identically (parity pytest forces the distributed
    tier on the same input).  The edge relation materializes once (the
    Pregel pin — see module docstring).  Returns a Dataset of
    (node, rank_x) with ``rank_x`` at ``scale``."""
    import logging

    logger = logging.getLogger(__name__)
    edges_ds = edges_ds.materialize()  # consumed once per superstep + setup
    deg = grouped_aggregate(edges_ds, ["src"], {"outdeg": ("src", "count")})

    def proj(col: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b.column(col).cast(pa.int64())})
        return f

    both = edges_ds.map_batches(proj("src"), batch_format="pyarrow",
                                zero_copy_batch=True).union(
        edges_ds.map_batches(proj("dst"), batch_format="pyarrow",
                             zero_copy_batch=True))
    nodes = grouped_aggregate(both, ["node"], {"n_refs": ("node", "count")})
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.int64()),
                                "rank_x": pa.array([], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
    r0 = scale // n_nodes
    teleport = ((100 - damping_pct) * scale // 100) // n_nodes

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "rank_x": pa.array(np.full(b.num_rows, r0, dtype=np.int64))})

    if n_nodes <= broadcast_nodes:
        return _pagerank_broadcast(edges_ds, deg, n_nodes, iters,
                                   damping_pct, r0, teleport)
    logger.info("pagerank: %d nodes > broadcast bound %d — using the "
                "fully-distributed tier", n_nodes, broadcast_nodes)
    return _pagerank_distributed(edges_ds, deg, nodes, iters, damping_pct,
                                 r0, teleport, seed)


def _pagerank_broadcast(edges_ds, deg, n_nodes: int, iters: int,
                        damping_pct: int, r0: int, teleport: int):
    """Broadcast tier: sorted node/outdeg/rank vectors ship once per
    superstep via ray.put; each superstep = one edge pass with per-batch
    PARTIAL dst-sums (np sort+reduceat combiner) + one combined aggregate
    whose node-sized result updates the driver-held vector (the bounded
    working set, exactly tfidf's broadcast tier)."""
    import ray
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import (
        resolve_broadcast,
    )

    deg_tbl = pa.concat_tables(deg.iter_batches(batch_format="pyarrow",
                                                batch_size=None))
    src_nodes = np.asarray(deg_tbl.column("src").combine_chunks()
                           .cast(pa.int64()))
    src_deg = np.asarray(deg_tbl.column("outdeg").combine_chunks()
                         .cast(pa.int64()))
    order = np.argsort(src_nodes, kind="stable")
    src_nodes, src_deg = src_nodes[order], src_deg[order]

    # full node universe (srcs ∪ dsts) — node-sized, bounded by dispatch
    def dst_only(b: pa.Table) -> pa.Table:
        d = np.unique(np.asarray(b.column("dst").combine_chunks()
                                 .cast(pa.int64())))
        return pa.table({"node": pa.array(d)})

    dsts = pa.concat_tables(
        grouped_aggregate(
            edges_ds.map_batches(dst_only, batch_format="pyarrow",
                                 zero_copy_batch=True),
            ["node"], {"n": ("node", "count")},
        ).iter_batches(batch_format="pyarrow", batch_size=None))
    all_nodes = np.union1d(src_nodes, np.asarray(
        dsts.column("node").combine_chunks().cast(pa.int64())))
    assert len(all_nodes) == n_nodes
    rank_src = np.full(len(src_nodes), r0, dtype=np.int64)
    if iters <= 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array(all_nodes),
            "rank_x": pa.array(np.full(len(all_nodes), r0,
                                       dtype=np.int64))}))

    for _ in range(iters):
        contrib_arr = rank_src // np.maximum(src_deg, 1)
        ref = ray.put((src_nodes, contrib_arr))

        def partial(b: pa.Table) -> pa.Table:
            nodes_b, contrib_b = resolve_broadcast(ref)
            s = np.asarray(b.column("src").combine_chunks()
                           .cast(pa.int64()))
            d = np.asarray(b.column("dst").combine_chunks()
                           .cast(pa.int64()))
            c = contrib_b[np.searchsorted(nodes_b, s)]
            o = np.argsort(d, kind="stable")
            d_s, c_s = d[o], c[o]
            starts = np.ones(len(d_s), dtype=bool)
            starts[1:] = d_s[1:] != d_s[:-1]
            idx = np.nonzero(starts)[0]
            return pa.table({
                "dst": pa.array(d_s[idx]),
                "c": pa.array(np.add.reduceat(c_s, idx)
                              if len(idx) else c_s[:0])})

        insum_tbl = pa.concat_tables(grouped_aggregate(
            edges_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
            ["dst"], {"insum": ("c", "sum")},
        ).iter_batches(batch_format="pyarrow", batch_size=None))
        insum = np.zeros(len(src_nodes), dtype=np.int64)
        i_dst = np.asarray(insum_tbl.column("dst").combine_chunks()
                           .cast(pa.int64()))
        i_sum = np.asarray(insum_tbl.column("insum").combine_chunks()
                           .cast(pa.int64()))
        # in-sums for nodes WITH out-edges update rank_src; pure sinks are
        # folded at the end (their rank needs only the LAST insum)
        pos = np.searchsorted(src_nodes, i_dst)
        hit = (pos < len(src_nodes))
        hit[hit] &= src_nodes[np.minimum(pos[hit], len(src_nodes) - 1)] \
            == i_dst[hit]
        rank_src = np.full(len(src_nodes), teleport, dtype=np.int64)
        rank_src[pos[hit]] += damping_pct * i_sum[hit] // 100
        last_dst, last_sum = i_dst, i_sum

    rank_all = np.full(len(all_nodes), teleport, dtype=np.int64)
    p_all = np.searchsorted(all_nodes, last_dst)
    rank_all[p_all] += damping_pct * last_sum // 100
    # nodes with out-edges already carry the same value; overwrite keeps
    # the single code path honest
    p_src = np.searchsorted(all_nodes, src_nodes)
    rank_all[p_src] = rank_src
    return ray.data.from_arrow(pa.table({
        "node": pa.array(all_nodes), "rank_x": pa.array(rank_all)}))


def _pagerank_distributed(edges_ds, deg, nodes, iters: int,
                          damping_pct: int, r0: int, teleport: int, seed):
    """Distributed tier: the rank vector never leaves the object store —
    per superstep one attach (rank→edges by src), one combined dst-sum,
    one attach (in-sums→node set); each rank vector materializes (the
    Pregel superstep barrier)."""
    edeg = attach_by_key(edges_ds, "src", deg, "src", "outdeg",
                         default=1).materialize()
    ranks = nodes.map_batches(seed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def contrib(b: pa.Table) -> pa.Table:
        r = np.asarray(b.column("rank_x").combine_chunks().cast(pa.int64()))
        d = np.asarray(b.column("outdeg").combine_chunks().cast(pa.int64()))
        return pa.table({"dst": b.column("dst").cast(pa.int64()),
                         "c": pa.array(r // np.maximum(d, 1))})

    def step(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("insum").combine_chunks()
                       .cast(pa.int64()))
        return pa.table({
            "node": b.column("node"),
            "rank_x": pa.array(teleport + damping_pct * s // 100)})

    for _ in range(iters):
        withr = attach_by_key(edeg, "src", ranks, "node", "rank_x",
                              default=0)
        insum = grouped_aggregate(
            withr.map_batches(contrib, batch_format="pyarrow",
                              zero_copy_batch=True),
            ["dst"], {"insum": ("c", "sum")})
        stepped = attach_by_key(ranks.select_columns(["node"]), "node",
                                insum, "dst", "insum", default=0)
        ranks = stepped.map_batches(step, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    return ranks
