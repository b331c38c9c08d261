"""Driver contract: entry() smoke pipeline, queries() per-operator callables,
oracle_sql() DuckDB equivalents (run side-by-side at sf=0.01).

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ray.init()/ray.shutdown().

Column-name contract: every computed column is named identically in the Ray
callable and its oracle SQL (the driver sorts columns by name before value
hashing).  Float aggregates are stabilised with floor(x*100+0.5)/100 on both
sides so association order cannot flip a hash.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))


# --------------------------------------------------------------------------
# timestamp_format operator queries (the reference competency, SURVEY.md §2)
# --------------------------------------------------------------------------

def q_ts_format_string(sf_dir: str):
    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    task = TaskConfig(columns=(
        ColumnConfig("ts", "string", to_format="%Y-%m-%d %H:%M:%S", to_timezone="UTC"),
    ))
    ds = _read(sf_dir, "events").select_columns(["event_id", "ts"])
    ds = ds.map_batches(TimestampFormatStage(task), batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(lambda b: b.rename_columns(["event_id", "ts_str"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_ts_to_epoch_ms(sf_dir: str):
    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    task = TaskConfig(columns=(ColumnConfig("ts", "long", to_unit="ms"),))
    ds = _read(sf_dir, "events").select_columns(["event_id", "ts"])
    ds = ds.map_batches(TimestampFormatStage(task), batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(lambda b: b.rename_columns(["event_id", "ts_ms"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_ts_unit_ms_to_sec(sf_dir: str):
    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    # timestamp → long(ms) → unit-change(ms → sec) exercises U5 truncation
    to_ms = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("ts", "long", to_unit="ms"),)))
    ms_to_sec = TimestampFormatStage(TaskConfig(
        columns=(ColumnConfig("ts", "long", from_unit="ms", to_unit="sec"),)))
    ds = _read(sf_dir, "events").select_columns(["event_id", "ts"])
    ds = ds.map_batches(to_ms, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(ms_to_sec, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(lambda b: b.rename_columns(["event_id", "ts_sec"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_ts_parse_roundtrip(sf_dir: str):
    """format → multi-format fallback parse → epoch micros (identity)."""
    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    fmt = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("ts", "string", to_format="%Y-%m-%d %H:%M:%S.%6N %z",
                     to_timezone="Asia/Tokyo"),)))
    parse = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("ts", "long",
                     from_format=("%Y-%m-%d %H:%M:%S.%N %z",
                                  "%Y-%m-%d %H:%M:%S %z"),
                     to_unit="us"),)))
    ds = _read(sf_dir, "events").select_columns(["event_id", "ts"])
    ds = ds.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(lambda b: b.rename_columns(["event_id", "ts_us"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_ts_json_path(sf_dir: str):
    """JSONPath rewrite inside a JSON-string document column."""
    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    build_fmt = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("ts", "string", to_format="%Y-%m-%d %H:%M:%S.%N",
                     to_timezone="UTC"),)))
    rewrite = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("$.doc.t", "long",
                     from_format=("%Y-%m-%d %H:%M:%S.%N",), from_timezone="UTC",
                     to_unit="ms"),)))

    def build_doc(b: pa.Table) -> pa.Table:
        doc = pc.binary_join_element_wise('{"t": "', b.column("ts"), '"}', "")
        return pa.table({"event_id": b.column("event_id"), "doc": doc})

    ds = _read(sf_dir, "events").select_columns(["event_id", "ts"])
    ds = ds.map_batches(build_fmt, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(build_doc, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# CDC / upsert queries
# --------------------------------------------------------------------------

def q_cdc_upsert_latest(sf_dir: str):
    """Last-write-wins upsert view of the events stream: key = (user_id,
    event_type), lsn = event_id, op = delete when value < 1.0."""
    from embulk_filter_timestamp_format_ray.stages.relational import latest_by_key

    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "event_type", "value"])
    out = latest_by_key(
        ds, keys=["user_id", "event_type"], seq_col="event_id",
        delete_expr=lambda t: pc.less(t.column("value"), 1.0),
    )
    return out.map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"), "event_type": b.column("event_type"),
            "lsn": b.column("event_id"), "value": b.column("value"),
        }), batch_format="pyarrow", zero_copy_batch=True)



def q_cdc_scd2(sf_dir: str):
    """SCD Type-2 history of the events stream (the APPLY CHANGES ... STORED
    AS SCD TYPE 2 analog): one row per key VERSION with its validity interval
    [valid_from, valid_to) in LSN units, delete events closing their
    predecessor without emitting a row.  One hash-shard exchange of the four
    selected columns, vectorized sort+shift per shard (stages/relational.py
    scd2_history)."""
    from embulk_filter_timestamp_format_ray.stages.relational import scd2_history

    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "event_type", "value"])
    out = scd2_history(
        ds, keys=["user_id", "event_type"], seq_col="event_id",
        delete_expr=lambda t: pc.less(t.column("value"), 1.0),
    )

    def proj(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(b.column("value"), 100.0), 0.5)), pa.int64())
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "valid_from": b.column("valid_from"),
            "valid_to": b.column("valid_to"),
            "is_current": b.column("is_current"),
            "value_cents": cents,
        })

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_profile_events(sf_dir: str):
    """Per-column data profile of the events stream (count / nulls / min /
    max / EXACT distinct) — the table-maintenance operator
    (stages/relational.py profile_table).  Floats are pre-scaled to cents so
    min/max stringification is integer-exact on both sides; the exact
    distinct pass is the honest cost of exactness (hll_distinct is the
    sketch tier)."""
    from embulk_filter_timestamp_format_ray.stages.relational import profile_table

    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        vc = pc.cast(pc.floor(pc.add(
            pc.multiply(b.column("value"), 100.0), 0.5)), pa.int64())
        return pa.table({
            "event_id": b.column("event_id"), "user_id": b.column("user_id"),
            "event_type": b.column("event_type"), "value_cents": vc})

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return profile_table(
        ds, ["event_id", "user_id", "event_type", "value_cents"])


def q_temporal_dim_join(sf_dir: str):
    """Point-in-time (AS OF) lookup against SCD2 history: even events form
    the dimension stream (folded to validity intervals by scd2_history),
    odd events are the fact stream; temporal_join attaches the dimension
    version valid at each fact's lsn (LEFT semantics — facts before the
    first version / in a post-delete gap / on unknown keys keep NULLs).
    One key-shard exchange per operator, rank-compressed searchsorted
    matching (stages/relational.py temporal_join)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        scd2_history,
        temporal_join,
    )

    ev = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "event_type", "value"])

    def parity(p: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(
                pc.bit_wise_and(b.column("event_id"), 1), p))
        return f

    hist = scd2_history(
        ev.map_batches(parity(0), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user_id", "event_type"], seq_col="event_id",
        delete_expr=lambda t: pc.less(t.column("value"), 1.0),
    )

    def dim_proj(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(b.column("value"), 100.0), 0.5)), pa.int64())
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "valid_from": b.column("valid_from"),
            "valid_to": b.column("valid_to"),
            "value_cents": cents,
        })

    hist = hist.map_batches(dim_proj, batch_format="pyarrow",
                            zero_copy_batch=True)
    facts = ev.map_batches(parity(1), batch_format="pyarrow",
                           zero_copy_batch=True).select_columns(
        ["event_id", "user_id", "event_type"])
    return temporal_join(facts, hist, keys=["user_id", "event_type"],
                         fact_seq="event_id",
                         payload=["value_cents", "valid_from"])


def q_pagerank_interactions(sf_dir: str):
    """Integer-exact PageRank (3 supersteps) over the customer–supplier
    interaction graph: distinct (o_custkey, l_suppkey) pairs from
    orders⋈lineitem become bidirectional edges (suppliers negated to keep
    one int64 node space).  Every superstep is one key-shard attach + one
    map-side-combined sum — no per-iteration join-actor cold starts
    (stages/graph.py pagerank, DESIGN #64)."""
    from embulk_filter_timestamp_format_ray.stages.graph import pagerank
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
        shuffle_join,
    )

    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_suppkey"])
    joined = shuffle_join(li, orders, on="l_orderkey",
                          right_on="o_orderkey")
    pairs = grouped_aggregate(
        joined, ["o_custkey", "l_suppkey"],
        {"n_items": ("l_suppkey", "count")})

    def expand(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("o_custkey").combine_chunks()
                       .cast(pa.int64()))
        s = -np.asarray(b.column("l_suppkey").combine_chunks()
                        .cast(pa.int64()))
        return pa.table({"src": pa.array(np.concatenate([c, s])),
                         "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(expand, batch_format="pyarrow",
                              zero_copy_batch=True)
    return pagerank(edges, iters=3)


_BM25_TERMS = ("merge", "spark", "window")

def _pagerank_sql(iters: int = 3) -> str:
    """Unrolled-iteration PageRank oracle (integer-exact: every // floors
    exactly where stages/graph.py pagerank floors — DESIGN #64).  The
    150000 teleport numerator = (100-85) * 1_000_000 // 100."""
    sql = (
        "with e0 as (select distinct o_custkey as c, l_suppkey as s "
        "from orders join lineitem on o_orderkey = l_orderkey), "
        "edges as (select c as src, -s as dst from e0 "
        "union all select -s as src, c as dst from e0), "
        "deg as (select src, count(*)::bigint as outdeg from edges "
        "group by src), "
        "nodes as (select src as node from edges "
        "union select dst from edges), "
        "p as (select count(*)::bigint as n from nodes), "
        "r0 as (select node, (1000000 // p.n)::bigint as r "
        "from nodes cross join p)")
    for k in range(1, iters + 1):
        sql += (
            f", i{k} as (select e.dst as node, "
            f"sum(r{k-1}.r // d.outdeg)::bigint as insum "
            f"from edges e join deg d on e.src = d.src "
            f"join r{k-1} on e.src = r{k-1}.node group by e.dst), "
            f"r{k} as (select nodes.node, ((150000 // p.n) + "
            f"(85 * coalesce(i{k}.insum, 0)) // 100)::bigint as r "
            f"from nodes cross join p "
            f"left join i{k} on nodes.node = i{k}.node)")
    return sql + f" select node, r as rank_x from r{iters}"


def _bm25_ctes(corpus_sql: str, id_col: str, terms) -> str:
    """Shared BM25 oracle CTE chain over an arbitrary (id, text) corpus:
    whitespace tokenization (== stages/dedup.py token_stream), corpus
    stats, query-term postings, df, integer-exact components, per-doc
    score — ends with ``sc(<id_col>, score)``."""
    in_list = "(" + ", ".join(f"'{t}'" for t in terms) + ")"
    return (
        f"with corpus as ({corpus_sql}), "
        f"d as (select {id_col}, list_filter(string_split_regex("
        "text, '\\s+'), x -> x <> '') as ws from corpus), "
        "s as (select count(*)::bigint as n, sum(len(ws))::bigint as total "
        "from d), "
        f"t as (select {id_col}, unnest(ws) as term, len(ws) as dl from d), "
        f"c as (select {id_col}, term, count(*)::bigint as tf, "
        f"any_value(dl)::bigint as dl from t where term in {in_list} "
        f"group by {id_col}, term), "
        "f as (select term, count(*)::bigint as df from c group by term), "
        f"comp as (select c.{id_col}, "
        "((1000 * (2 * s.n - 2 * f.df + 1)) // (2 * f.df + 1)) * "
        "((1000 * 22 * c.tf * s.total) // "
        "(10 * c.tf * s.total + 3 * s.total + 9 * c.dl * s.n)) as comp "
        "from c join f using(term) cross join s), "
        f"sc as (select {id_col}, sum(comp)::bigint as score from comp "
        f"group by {id_col}) "
    )


_BM25_ORACLE_CTES = _bm25_ctes("select doc_id, text from documents",
                               "doc_id", _BM25_TERMS)

# Hybrid RRF oracle (shared by the on-the-fly and fully-indexed variants —
# indexes are access paths, never semantics changes): sparse top-50 ∪ dense
# cosine top-50 (query vec_id 0), integer reciprocal-rank fusion, top-10.
_HYBRID_ORACLE = _BM25_ORACLE_CTES + (
    ", sp as (select doc_id, row_number() over "
    "(order by score desc, doc_id) as rank from sc "
    "qualify rank <= 50), "
    "q as (select embedding from embeddings where vec_id = 0), "
    "de as (select e.vec_id as doc_id, row_number() over "
    "(order by list_cosine_similarity(q.embedding, e.embedding) "
    "desc, e.vec_id) as rank from q cross join embeddings e "
    "qualify rank <= 50), "
    "u as (select doc_id, 1000000 // (60 + rank) as pts from sp "
    "union all select doc_id, 1000000 // (60 + rank) from de), "
    "fu as (select doc_id, sum(pts)::bigint as rrf_x1e6 from u "
    "group by doc_id) "
    "select doc_id, rrf_x1e6, row_number() over "
    "(order by rrf_x1e6 desc, doc_id) as rank from fu "
    "qualify rank <= 10"
)


def q_bm25_search(sf_dir: str):
    """BM25 sparse ranked retrieval over documents (integer-exact scoring,
    stages/ngrams.py bm25_topk): top-10 docs for a fixed 3-term query."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import bm25_topk

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = bm25_topk(ds, _BM25_TERMS, k=10)
    return out.map_batches(lambda b: b.select(["doc_id", "score", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _postings_index_dir(sf_dir: str) -> str:
    """Build (once, content-keyed cache) the on-disk postings index for
    sf_dir's documents table — same policy as _ivf_index_dir."""
    import hashlib

    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        build_postings_index,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:bm25v1"
        .encode()).hexdigest()[:16]
    idx = os.path.join("/tmp/graft_postings", key)
    if not os.path.exists(os.path.join(idx, "_SUCCESS")):
        os.makedirs("/tmp/graft_postings", exist_ok=True)
        ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        build_postings_index(ds, idx)
    return idx


def q_bm25_search_indexed(sf_dir: str):
    """BM25 served from the ON-DISK postings index (stages/ngrams.py
    build_postings_index / bm25_topk_indexed): the probe opens only the
    query terms' term-hash shard dirs, so query cost is postings-sized and
    independent of corpus size — the sparse analog of the IVF index.  Must
    hash-equal bm25_search (same SQL oracle): the index is an access path,
    never a semantics change."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        bm25_topk_indexed,
    )

    out = bm25_topk_indexed(_postings_index_dir(sf_dir), _BM25_TERMS, k=10)
    return out.map_batches(lambda b: b.select(["doc_id", "score", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_hybrid_retrieve(sf_dir: str):
    """Hybrid retrieval: BM25 sparse top-50 + dense cosine top-50 (query =
    embedding of vec_id 0) fused by integer reciprocal-rank fusion
    (rrf = Σ 1_000_000 // (60 + rank)), top-10 by fused score.  Both legs
    are distributed operators; the fusion itself is two ≤50-row lists
    (aggregate-sized, driver-side by design)."""
    from embulk_filter_timestamp_format_ray.stages.ann import brute_force_topk
    from embulk_filter_timestamp_format_ray.stages.ngrams import bm25_topk

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    sparse = pa.concat_tables(
        bm25_topk(docs, _BM25_TERMS, k=50).iter_batches(
            batch_format="pyarrow", batch_size=None))
    emb = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    dense = pa.concat_tables(
        brute_force_topk(emb, _ann_queries(sf_dir)[:1], k=50).iter_batches(
            batch_format="pyarrow", batch_size=None))

    fused: "dict[int, int]" = {}
    for r in sparse.to_pylist():
        fused[int(r["doc_id"])] = fused.get(int(r["doc_id"]), 0) \
            + 1_000_000 // (60 + int(r["rank"]))
    for r in dense.to_pylist():
        fused[int(r["vec_id"])] = fused.get(int(r["vec_id"]), 0) \
            + 1_000_000 // (60 + int(r["rank"]))
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf_x1e6": pa.array([s for _, s in top], pa.int64()),
        "rank": pa.array(range(1, len(top) + 1), pa.int64()),
    })


def q_hybrid_retrieve_indexed(sf_dir: str):
    """Fully-INDEXED hybrid retrieval: the sparse leg serves from the
    on-disk postings index (only the query terms' shards open), the dense
    leg from the centroid-partitioned IVF index probed at nprobe=all
    (exact ranking, pruned-read machinery); the two top-50 lists fuse with
    the same integer RRF as hybrid_retrieve — and the SAME SQL oracle,
    because both indexes are access paths, never semantics changes."""
    from embulk_filter_timestamp_format_ray.stages.ann import (
        ivf_topk_partitioned,
    )
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        bm25_topk_indexed,
    )

    pidx = _postings_index_dir(sf_dir)
    sparse = pa.concat_tables(
        bm25_topk_indexed(pidx, _BM25_TERMS, k=50).iter_batches(
            batch_format="pyarrow", batch_size=None))

    vidx = _ivf_index_dir(sf_dir)
    dense = pa.concat_tables(
        ivf_topk_partitioned(vidx, _ann_queries(sf_dir)[:1], k=50,
                             nprobe=16).iter_batches(
            batch_format="pyarrow", batch_size=None))

    fused: "dict[int, int]" = {}
    for r in sparse.to_pylist():
        fused[int(r["doc_id"])] = fused.get(int(r["doc_id"]), 0) \
            + 1_000_000 // (60 + int(r["rank"]))
    for r in dense.to_pylist():
        fused[int(r["vec_id"])] = fused.get(int(r["vec_id"]), 0) \
            + 1_000_000 // (60 + int(r["rank"]))
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf_x1e6": pa.array([s for _, s in top], pa.int64()),
        "rank": pa.array(range(1, len(top) + 1), pa.int64()),
    })


def q_quality_report(sf_dir: str):
    """Offline data-quality expectations report (the dbt-tests role) over
    the events stream: per-constraint checked/violating counts computed
    with the SAME value kernels the CDC commit gate enforces
    (pipelines/constraints.py validate_table — partial per block, scalars
    to the driver).  SQL CHECK semantics: NULL passes value rules,
    not_null counts nulls."""
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        Constraint,
        validate_table,
    )

    ds = _read(sf_dir, "events").select_columns(
        ["user_id", "event_type", "value"])
    return validate_table(ds, (
        Constraint("user_id", "not_null"),
        Constraint("event_type", "in_set", values=("click", "view")),
        Constraint("value", "between", lo="0.5"),
        Constraint("event_type", "matches", values=("^[a-z]+$",)),
    ))


def _token_counts(ds):
    """(doc_id, text) → (doc_id, n_tokens) — the ONE tokenizer-count pass
    shared by every packing caller (the count must stay bit-identical
    across curate_corpus / pack_sequences / materialize_sequences and
    their oracles)."""
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        doc_token_counts,
    )

    return doc_token_counts(ds)


def q_cdc_transcripts_final(sf_dir: str):
    """Flagship transcript CDC replay: synthetic binlog → normalized,
    hash-partitioned, watermarked merge → exactly-once lake → distributed
    sorted verification read (write_sorted → read_parquet; nothing
    materializes the lake on the driver).

    Oracled: the same deterministic event stream is committed as
    fixtures/cdc_events_20000.parquet; the oracle SQL folds it with an
    argmax-LSN window + delete-wins filter + epoch-2 role renames.  The
    ``ts`` column is excluded from the comparison (ns precision exceeds
    DuckDB's µs timestamps); ts parsing is oracled by the ts_* queries."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_lake_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_sorted_{run}")
    pipe.write_sorted(out_dir)
    final = ray.data.read_parquet(out_dir)
    return final.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_time_travel(sf_dir: str):
    """Time travel (VERSION AS OF): the deterministic 20k-event binlog is
    applied in two lsn-chunks (lsn < 10_000, then the rest) and the lake is
    read back AS OF the first commit via the retained manifest snapshot
    (pipelines/cdc.py read_lake_at / state/manifest.py history).  Oracle:
    the flagship argmax-LSN fold restricted to the lsn<10_000 prefix of the
    committed fixture — version 1's state IS that prefix fold."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_tt_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    asof_v1 = pipe.read_lake_at(1)
    return asof_v1.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_schema_evolution(sf_dir: str):
    """Widen-only lake schema evolution: the first apply commits the core
    schema (lsn < 10_000); the second carries an EXTRA ``lang`` column
    (deterministic lsn%3 → en/fr/de) that widens the committed schema
    (pipelines/cdc.py merge_schema_entries).  Rows whose winning event
    predates the column read it as NULL (pad-at-read).  Oracle: the
    flagship argmax-LSN fold with lang reconstructed by the same lsn rule,
    NULL below the evolution boundary."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_evo_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))

    def widened(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("lsn"), cut))
        lsn = np.asarray(b.column("lsn").combine_chunks().cast(pa.int64()))
        lang = pc.take(pa.array(["en", "fr", "de"]), pa.array(lsn % 3))
        return b.append_column("lang", lang)

    pipe.apply(ev.map_batches(widened, batch_format="pyarrow",
                              zero_copy_batch=True))
    return pipe.read_lake(
        columns=["conv_id", "turn_idx", "role", "text", "tool", "lsn",
                 "lang"])


def q_cdc_clone(sf_dir: str):
    """Zero-copy shallow clone as a fork point: the lsn<10_000 prefix
    commits to the source, clone_lake forks it (symlinked txn dirs — no
    data copied), and the REST of the stream applies to the CLONE only.
    Returning the clone's final state proves the fork carries watermarks,
    layout and history and keeps tailing exactly-once; the untouched
    source stays at the prefix.  Oracle: the flagship full-stream fold."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    src = os.path.join(tempfile.gettempdir(), f"graft_cdc_clsrc_{run}")
    dst = os.path.join(tempfile.gettempdir(), f"graft_cdc_cldst_{run}")
    pipe = CDCPipeline(src, num_partitions=32)
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    pipe.clone_lake(dst)
    clone = CDCPipeline.from_lake(dst)
    clone.apply(ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    return clone.read_lake(
        columns=["conv_id", "turn_idx", "role", "text", "tool", "lsn"])


def q_cdc_transcripts_view(sf_dir: str):
    """Incrementally-maintained transcript materialization
    (views.transcript_view): the lake's conversations as assembled
    documents kept fresh at DELTA cost — the two-chunk apply refreshes the
    view twice, the second refresh re-assembling only the partitions the
    second chunk rewrote.  Requires the conv-mode layout (conversations
    partition-local ⇒ per-partition assembly is exact and disjoint).
    Oracle: the assemble_transcripts string_agg fold."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.views import (
        transcript_view,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_tv_{run}")
    pipe = CDCPipeline(lake, num_partitions=32, partition_mode="conv")
    view = transcript_view(lake, lake + "_view")
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    view.refresh()
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    view.refresh()
    return view.read()


def q_cdc_multi_table(sf_dir: str):
    """Multi-table / multi-tenant fan-out (pipelines/cdc.py apply_multi):
    the 20k stream is tagged by conv-id parity and routed into TWO
    independent lakes in one normalize + composite-pid exchange pass —
    per-lake exactly-once commits, per-table map-side combine (tables may
    share merge keys).  Returns the union of both lakes tagged by table;
    oracle: the flagship fold with the same parity rule."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        CDCPipeline,
        apply_multi,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"graft_cdc_mt_{run}")
    pipes = {
        "a": CDCPipeline(base + "_a", num_partitions=16),
        "b": CDCPipeline(base + "_b", num_partitions=24),
    }

    def tagged(b: pa.Table) -> pa.Table:
        digits = pc.cast(pc.utf8_slice_codeunits(
            b.column("conv_id"), 5, 99), pa.int64())
        tag = pc.if_else(pc.equal(pc.bit_wise_and(digits, 1), 0),
                         pa.scalar("a"), pa.scalar("b"))
        return b.append_column("table", tag)

    ev = change_events(20_000, seed=42, parallelism=16).map_batches(
        tagged, batch_format="pyarrow", zero_copy_batch=True)
    apply_multi(ev, pipes)

    def tag_const(t):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("tbl", pa.array([t] * b.num_rows))
        return f

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "lsn"]
    sides = [pipes[t].read_lake(columns=cols).map_batches(
        tag_const(t), batch_format="pyarrow", zero_copy_batch=True)
        for t in ("a", "b")]
    return sides[0].union(sides[1])


def q_cdc_backfill(sf_dir: str):
    """Distributed UPDATE / backfill (CDCPipeline.transform_lake): after
    the schema-evolution replay (lang appears at lsn 10_000), ONE
    exactly-once transform commit fills the pre-evolution NULLs with 'und'
    AND introduces a derived text_len column — per-partition fold → fn →
    rewrite, watermarks untouched, keys/lsns contract-checked.  Oracle:
    the flagship fold with coalesce(lang rule, 'und') and length(text)."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_bf_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))

    def widened(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("lsn"), cut))
        lsn = np.asarray(b.column("lsn").combine_chunks().cast(pa.int64()))
        lang = pc.take(pa.array(["en", "fr", "de"]), pa.array(lsn % 3))
        return b.append_column("lang", lang)

    pipe.apply(ev.map_batches(widened, batch_format="pyarrow",
                              zero_copy_batch=True))

    def backfill(state: pa.Table) -> pa.Table:
        i = state.schema.get_field_index("lang")
        state = state.set_column(
            i, "lang", pc.fill_null(state.column("lang"), "und"))
        return state.append_column(
            "text_len", pc.cast(pc.utf8_length(state.column("text")),
                                pa.int64()))

    pipe.transform_lake(backfill)
    return pipe.read_lake(
        columns=["conv_id", "turn_idx", "role", "text", "tool", "lsn",
                 "lang", "text_len"])


def q_cdc_changefeed(sf_dir: str):
    """Change Data Feed between two lake versions: the two-chunk apply
    (lsn < 10_000, then the rest) commits versions 1 and 2; lake_changes
    diffs only the partitions whose data files changed (manifest diff) via
    one key-shard exchange + a vectorized sorted run-compare — emitting
    insert/update/delete rows with post-image lsn (pre-image for deletes).
    Oracle: FULL OUTER JOIN of the lsn-prefix fold against the full fold."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_cf_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    return pipe.lake_changes(1, 2)


def _scd2_fixture_lake() -> str:
    """Content-keyed cached 3-apply fixture lake over the deterministic
    20k-event binlog (same caching policy as _build_vector_lake): the
    lake build is untimed input prep shared by the scd2 / text-rank
    queries; each query's derivation is the timed part."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    fixture = os.path.join(_FIXTURES, "cdc_events_20000.parquet")
    key = hashlib.md5(open(fixture, "rb").read() + b"|scd2|v1").hexdigest()[:12]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_scd2fix_{key}")
    if not os.path.exists(os.path.join(lake, "_FIXTURE_DONE")):
        events = pq.read_table(fixture)
        lsn = events.column("lsn")
        tmp = lake + "." + uuid.uuid4().hex[:8]
        pipe = CDCPipeline(tmp, num_partitions=16)
        c1, c2 = pa.scalar(10_000, pa.int64()), pa.scalar(15_000, pa.int64())
        pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, c1))))
        pipe.apply(ray.data.from_arrow(events.filter(
            pc.and_(pc.greater_equal(lsn, c1), pc.less(lsn, c2)))))
        pipe.apply(ray.data.from_arrow(events.filter(
            pc.greater_equal(lsn, c2))))
        open(os.path.join(tmp, "_FIXTURE_DONE"), "w").close()
        try:
            os.rename(tmp, lake)
        except OSError:  # concurrent builder won the rename; adopt theirs
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return lake


def q_cdc_scd2_lake(sf_dir: str):
    """Lake-level SCD Type-2 at VERSION granularity: the 20k-event binlog is
    applied in THREE lsn-chunks (versions 1..3) and CDCPipeline.scd2()
    derives per-key validity intervals by composing the oldest retained
    snapshot (opening inserts) with the per-pair change feeds through the
    scd2_history interval kernel.  Oracle: seed fold ∪ two FULL-OUTER-JOIN
    state diffs, LEAD window over version, deletes dropped."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    return CDCPipeline.from_lake(_scd2_fixture_lake()).scd2(columns=())


_CDC_RANK_TERMS = ("merge", "agent", "stream")


def q_cdc_text_rank(sf_dir: str):
    """BM25 ranked search over the CDC LAKE's live turns (doc id = the
    surviving row's lsn — unique per live row): completes the lake-search
    triad (exact token skip index / dense vector view / ranked sparse).
    The corpus is the folded lake state read column-pruned to (lsn, text);
    the oracle replays the flagship argmax-LSN fold then the shared BM25
    CTE chain over it."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.stages.ngrams import bm25_topk

    pipe = CDCPipeline.from_lake(_scd2_fixture_lake())
    ds = pipe.read_lake(columns=["lsn", "text"])
    out = bm25_topk(ds, _CDC_RANK_TERMS, k=10, id_col="lsn")
    return out.map_batches(lambda b: b.select(["lsn", "score", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_dlq(sf_dir: str):
    """Dead-letter queue: the deterministic 20k-event binlog is poisoned in
    two disjoint lsn bands (changegen.poison_batch: lsn&1023<10 → corrupt
    op = invalid envelope; 10–19 → '<garbled>' ts_raw = unparseable in every
    epoch) and applied with ``CDCPipeline(dlq=True)``; the quarantine table
    (read_dlq) is returned DISTINCT over (lsn, conv_id, turn_idx,
    dlq_reason) — replayed copies of a poisoned event are byte-identical,
    so the at-least-once duplicates collapse.  Oracle: SQL replays the
    band rule over the committed event fixture."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        change_events,
        poison_events,
    )

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_dlq_{run}")
    pipe = CDCPipeline(lake, num_partitions=32, dlq=True)
    pipe.apply(poison_events(
        change_events(20_000, seed=42, parallelism=16), 20))
    dlq = pipe.read_dlq().select(["lsn", "conv_id", "turn_idx", "dlq_reason"])
    return dlq.group_by(
        ["lsn", "conv_id", "turn_idx", "dlq_reason"]).aggregate([])


def q_cdc_constraints(sf_dir: str):
    """Commit-time expectations (pipelines/constraints.py — Delta-style
    CHECK constraints) under the drop tier: the deterministic 20k-event
    binlog is applied with ``role:in:user,assistant,system`` committed on
    the lake, so every tool-role upsert is dropped at normalization (post
    role-rename, the same spot the reference's C10 stop_on_invalid_record
    surface acts — TimestampFormatFilterPlugin.java:64, third tier).
    Final lake state == the flagship argmax-LSN fold over the stream MINUS
    the violating upserts (deletes are payload-free and exempt), which is
    what the SQL oracle computes."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_constr_{run}")
    pipe = CDCPipeline(lake, num_partitions=32, constraints=(
        parse_constraint("role:in:user,assistant,system"),))
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"graft_cdc_constr_out_{run}")
    pipe.write_sorted(out_dir)
    final = ray.data.read_parquet(out_dir)
    return final.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_enriched(sf_dir: str):
    """Ingest-time dimension enrichment (the Debezium → enrich → sink
    shape): the raw change stream is broadcast-joined (stages/relational.py
    broadcast_join — dim shipped ONCE via ray.put, probed per batch)
    against a small role→channel dimension BEFORE apply; the enriched
    column rides through normalization as an evolved event column and
    widens the lake schema (widen-only evolution), so final state carries
    it with no lake-side code.  Oracle: the flagship argmax-LSN fold with
    the dimension applied as a CASE over the renamed role."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events
    from embulk_filter_timestamp_format_ray.stages.relational import (
        broadcast_join,
    )

    dim = pa.table({
        "role": ["human", "user", "ai", "assistant", "system", "tool"],
        "channel": ["web", "web", "model", "model", "platform", "platform"],
    })
    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_enr_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    ev = broadcast_join(change_events(20_000, seed=42, parallelism=16),
                        dim, on="role", how="left outer")
    pipe.apply(ev)
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_enr_out_{run}")
    pipe.write_sorted(out_dir)
    final = ray.data.read_parquet(out_dir)
    return final.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "channel",
                            "text", "tool", "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_retention(sf_dir: str):
    """Distributed DELETE WHERE (pipelines/cdc.py delete_where — the
    retention/TTL tier, SQL DELETE analog): the 20k-event binlog is
    applied, then every live row with ``turn_idx >= 30`` is removed as one
    exactly-once fold→filter→rewrite commit (no tombstones, watermarks
    unchanged, delta backlogs folded).  Final lake state == the flagship
    argmax-LSN fold restricted to surviving turn indexes, which is what
    the SQL oracle computes."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_ret_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    expired = parse_constraint("turn_idx:between:30,")
    pipe.delete_where(expired.matches)
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_ret_out_{run}")
    pipe.write_sorted(out_dir)
    final = ray.data.read_parquet(out_dir)
    return final.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_retention_dv(sf_dir: str):
    """Deletion-vector DELETE (pipelines/cdc.py delete_where mode='dv' —
    the merge-on-read tier of the retention sweep, Delta's
    deletion-vector cost model): the 20k-event binlog lands half as a
    base merge and half as a pending delta backlog, then every live row
    with ``turn_idx >= 30`` is removed by writing per-partition
    (conv_id, turn_idx, lsn) KEY files — commit cost ∝ deleted rows, not
    partition size; bases and the delta backlog stay untouched.  The
    lake is read while the vectors are still PENDING, so the result
    proves the fold subtracts them at read time (prune= also exercises
    footer-stats file skipping).  Final state == the rewrite-mode
    delete == the flagship argmax-LSN fold restricted to surviving turn
    indexes, which is what the SQL oracle computes."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_retdv_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(
        events.filter(pc.less(events.column("lsn"), cut))))
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(events.column("lsn"), cut))))
    expired = parse_constraint("turn_idx:between:30,")
    pipe.delete_where(expired.matches, mode="dv", prune=[expired])
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"graft_cdc_retdv_out_{run}")
    pipe.write_sorted(out_dir)
    final = ray.data.read_parquet(out_dir)
    return final.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_pruned_read(sf_dir: str):
    """Predicate-pushdown lake read (pipelines/cdc.py read_lake(where=) —
    the SELECT ... WHERE analog of delete_where's prune machinery): the
    20k-event binlog lands half as a base merge and half as a pending
    delta backlog, then the lake is read with an AND'd constraint list
    (turn_idx BETWEEN 5 AND 40, role IN (user, assistant)) and the scan
    pruned to 4 of the 7 lake columns.  Each fold task first checks the
    partition's parquet FOOTER min/max stats and skips the partition
    unread when any spec is provably unsatisfiable — at 100 TB a
    time-banded analytics read touches only overlapping files.  Result
    == the flagship argmax-LSN fold post-filtered by the same predicate,
    which is what the SQL oracle computes."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_pread_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(
        events.filter(pc.less(events.column("lsn"), cut))))
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(events.column("lsn"), cut))))
    specs = [parse_constraint("turn_idx:between:5,40"),
             parse_constraint("role:in:user,assistant")]
    return pipe.read_lake(columns=["conv_id", "turn_idx", "role", "lsn"],
                          where=specs)


def q_cdc_clustered_read(sf_dir: str):
    """Durable clustering + zone-map pruned read (pipelines/cdc.py
    set_clustering — Delta OPTIMIZE ZORDER's role as a COMMITTED layout
    property): the 20k-event binlog is applied, the lake is re-clustered
    by ``ts`` (one exactly-once rewrite; every later base writer keeps
    the order), then a ~20%-selectivity time band is read via
    read_lake(where=[ts band]) — on the clustered layout the band's rows
    are contiguous, so the zone-map read opens only the row groups whose
    footer stats overlap the band.  Result == the flagship argmax-LSN
    fold restricted to the band, which the SQL oracle computes with an
    epoch-aware ts parse (the three binlog ts formats)."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_clus_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events))
    pipe.set_clustering(["ts"])
    # whole-second bounds with ≥780µs clearance from every fixture row,
    # so the ns-resolution lake and the µs-resolution oracle agree
    specs = [parse_constraint(
        "ts:between:2024-01-01T02:12:56,2024-01-01T03:19:24")]
    return pipe.read_lake(columns=["conv_id", "turn_idx", "role", "lsn"],
                          where=specs)


def q_cdc_text_search(sf_dir: str):
    """Token skip index (pipelines/cdc.py set_text_index + the has_token
    constraint kind): the 20k-event binlog lands half base / half pending
    delta, the lake commits a durable text_index on ``text`` (per-row-
    group Bloom sidecars of distinct split-on-space tokens beside every
    base), then ``read_lake(where=[text:has_token:merge])`` returns the
    rows whose text contains the token 'merge' — clean partitions open
    only sidecar-admitted row groups (min/max zone maps can never prove
    token absence), dirty ones fold then mask exact.  Oracle: the
    flagship fold filtered by list_contains(string_split(text,' '),...)."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_txt_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(
        events.filter(pc.less(events.column("lsn"), cut))))
    pipe.set_text_index("text")
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(events.column("lsn"), cut))))
    specs = [parse_constraint("text:has_token:merge")]
    return pipe.read_lake(columns=["conv_id", "turn_idx", "role", "text",
                                   "lsn"], where=specs)


def _vec_search_queries(n: int = 3, dim: int = 8) -> "np.ndarray":
    """Deterministic full-precision query vectors shared by the Ray query
    and the SQL oracle's literals (splitmix64 lanes, same recipe as the
    fixture's embedding column but a disjoint seed)."""
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        _u01,
        splitmix64,
    )

    qid = np.arange(n, dtype=np.int64) + 101
    lanes = qid[:, None] * np.int64(dim) + np.arange(dim, dtype=np.int64)
    return _u01(splitmix64(lanes.reshape(-1), 11)).reshape(n, dim) * 2.0 - 1.0


def q_cdc_vector_search(sf_dir: str):
    """Incrementally-maintained vector index over the lake
    (pipelines/vector_view.py VectorIndexView): the 20k-event binlog (with
    a deterministic embedding value column) lands half base / half delta;
    the view builds at the base version, then REFRESHES from the change
    feed alone (upserts append to frozen-centroid lists, updates/deletes
    become LSN-bounded tombstones) — never re-reading the lake.  The
    search probes all lists (nprobe = n_centroids ⇒ exact), so the SQL
    brute-force cosine top-k over the folded live state is the oracle."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
        VectorIndexView,
    )

    return _cdc_vector_search(quantized=False)


def q_cdc_vector_search_quantized(sf_dir: str):
    """Quantized storage tier of the lake vector view: the index stores
    int8 q + scale_ppm (~4× less disk — at 100 TB the embedding column IS
    the dataset) and the probe dequantizes per batch.  The int8 round trip
    is deterministic IEEE double arithmetic, so the SQL oracle replays it
    over the folded live state and brute-forces the dequantized ranking."""
    return _cdc_vector_search(quantized=True)


def q_cdc_vector_search_filtered(sf_dir: str):
    """Filtered vector search (the vector-DB metadata-predicate pattern):
    the view stores ``role`` as a payload column — carried through build,
    the delta-file refresh, and compaction — and
    ``search(where=[role:in:assistant])`` selects BEFORE ranking, so top-k
    is the best k among assistant turns only, without touching the lake.
    Oracle: the SQL brute force over the folded live state restricted to
    role='assistant'."""
    return _cdc_vector_search(quantized=False, payload_cols=("role",),
                              where_specs=("role:in:assistant",))


def q_cdc_rag_retrieve(sf_dir: str):
    """RAG retrieval composition: the vector view returns top-5 KEYS per
    query (probe-pruned index, no payload duplication), then ONE pruned
    lake read (conv_id in_set → footer/zone-map partition pruning)
    fetches those turns' role+text from the primary store — the standard
    index-for-keys / table-for-payload retrieval path.  Oracle: brute-
    force cosine ranking joined back to the folded live payload."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        Constraint,
    )

    view, pipe = _build_vector_lake()
    hits = pa.Table.from_pylist(
        view.search(_vec_search_queries(), k=5, nprobe=8).take_all())
    convs = sorted(set(hits.column("conv_id").to_pylist()))
    spec = Constraint("conv_id", "in_set", values=tuple(convs))
    payload = pa.Table.from_pylist(pipe.read_lake(
        columns=["conv_id", "turn_idx", "role", "text"],
        where=[spec]).take_all())
    # driver-side join: hits are k×queries rows (tiny); payload is the
    # matched conversations' turns
    out = hits.join(payload, keys=["conv_id", "turn_idx"],
                    join_type="inner")
    order = pc.sort_indices(out, sort_keys=[("query_id", "ascending"),
                                            ("rank", "ascending")])
    return ray.data.from_arrow(out.take(order).select(
        ["query_id", "rank", "conv_id", "turn_idx", "role", "text"]))


def _build_vector_lake(quantized: bool = False, payload_cols=()):
    """Deterministic vector-query fixture (base apply → view build → delta
    apply → view refresh), CACHED per (quantized, payload_cols, fixture
    content) under a content-keyed tmp dir: the four vector queries share
    one lake per shape instead of rebuilding ~3-6 s of fixture each (the
    search itself is the query; the fixture is untimed input prep, same
    policy as bench.py _events_parquet).  Build lands in a writer-unique
    tmp dir and atomically renames in — a loser of the rename race just
    adopts the winner's identical (seeded, deterministic) fixture.  All
    lake/view manifest paths are relative, so the rename is layout-safe;
    queries only read/search the shared lake, never mutate it."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.vector_view import (
        VectorIndexView,
    )

    fixture = os.path.join(_FIXTURES, "cdc_vec_events_20000.parquet")
    key = hashlib.md5(
        (open(fixture, "rb").read()
         + f"|v1|q={int(quantized)}|p={','.join(payload_cols)}"
         .encode())).hexdigest()[:12]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_vecfix_{key}")
    done = os.path.join(lake, "_FIXTURE_DONE")
    if not os.path.exists(done):
        events = pq.read_table(fixture)
        cut = pa.scalar(10_000, pa.int64())
        tmp = lake + "." + uuid.uuid4().hex[:8]
        # 16 partitions: the 20k-row fixture is task-overhead-bound at 32
        pipe = CDCPipeline(tmp, num_partitions=16)
        pipe.apply(ray.data.from_arrow(
            events.filter(pc.less(events.column("lsn"), cut))))
        view = VectorIndexView(pipe, os.path.join(tmp, "_vector_view"),
                               n_centroids=8, quantized=quantized,
                               payload_cols=tuple(payload_cols))
        view.build()
        pipe.apply_delta(ray.data.from_arrow(
            events.filter(pc.greater_equal(events.column("lsn"), cut))))
        view.refresh()
        open(os.path.join(tmp, "_FIXTURE_DONE"), "w").close()
        try:
            os.rename(tmp, lake)
        except OSError:  # concurrent builder won the rename; adopt theirs
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    pipe = CDCPipeline.from_lake(lake)
    view = VectorIndexView(pipe, os.path.join(lake, "_vector_view"),
                           n_centroids=8, quantized=quantized,
                           payload_cols=tuple(payload_cols))
    return view, pipe


def _cdc_vector_search(quantized: bool, payload_cols=(), where_specs=()):
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    view, _pipe = _build_vector_lake(quantized=quantized,
                                     payload_cols=payload_cols)
    where = [parse_constraint(s) for s in where_specs] or None
    return view.search(_vec_search_queries(), k=10, nprobe=8, where=where)


def q_cdc_aggregate_pushdown(sf_dir: str):
    """MIN/MAX/SUM/COUNT(*) aggregate pushdown (pipelines/cdc.py
    aggregate_lake): the 20k-event binlog lands half base / half pending
    delta backlog, then the lake is aggregated twice — unfiltered
    (column-pruned fold: only turn_idx/lsn + merge keys leave storage,
    never text) and under a turn_idx band (the pruned fold skips
    non-overlapping partitions/row groups by footer stats).  Distributed
    per-block partials; the driver receives scalars.  Both equal the SQL
    aggregates over the flagship fold."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_agg_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(
        events.filter(pc.less(events.column("lsn"), cut))))
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(events.column("lsn"), cut))))
    full = pipe.aggregate_lake({
        "n_total": (None, "count"),
        "min_turn": ("turn_idx", "min"),
        "max_turn": ("turn_idx", "max"),
        "sum_lsn": ("lsn", "sum"),
    })
    band = pipe.aggregate_lake(
        {"n_band": (None, "count"), "band_sum_lsn": ("lsn", "sum")},
        where=[parse_constraint("turn_idx:between:5,40")])
    return pa.table({
        "n_total": pa.array([full["n_total"]], pa.int64()),
        "min_turn": pa.array([full["min_turn"]], pa.int64()),
        "max_turn": pa.array([full["max_turn"]], pa.int64()),
        "sum_lsn": pa.array([full["sum_lsn"]], pa.int64()),
        "n_band": pa.array([band["n_band"]], pa.int64()),
        "band_sum_lsn": pa.array([band["band_sum_lsn"]], pa.int64()),
    })


def q_cdc_zorder_read(sf_dir: str):
    """Z-order clustering + zone-map pruned read (pipelines/cdc.py
    set_clustering(mode='zorder')): the 20k-event binlog is applied, the
    lake is re-clustered by interleaved (ts, turn_idx) Z-order —
    quantization bounds frozen from footer stats at set time — then a
    narrow band on turn_idx ALONE is read via read_lake(where=...).
    turn_idx is the NON-PREFIX clustered column: lexicographic (ts,
    turn_idx) order can't prune this band at all, but the bit-interleaved
    key localizes both columns, so the zone-map read skips row groups for
    either.  Result == the flagship argmax-LSN fold restricted to the
    band (the layout is a pure optimization)."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_zo_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events))
    pipe.set_clustering(["ts", "turn_idx"], mode="zorder")
    specs = [parse_constraint("turn_idx:between:10,14")]
    return pipe.read_lake(columns=["conv_id", "turn_idx", "role", "lsn"],
                          where=specs)


def q_cdc_count(sf_dir: str):
    """COUNT(*) aggregate pushdown (pipelines/cdc.py count_rows): the
    20k-event binlog lands half base / half pending delta backlog, then
    the lake is counted twice — total (manifest row counts for clean
    partitions + a key-columns-only fold for the delta-backlogged ones;
    payload bytes never leave storage) and under a turn_idx band (the
    pruned-fold count, shipping only key + where columns).  Both equal
    the SQL oracle's COUNT(*) over the flagship fold."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        parse_constraint,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_count_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(
        events.filter(pc.less(events.column("lsn"), cut))))
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(events.column("lsn"), cut))))
    n_total = pipe.count_rows()
    n_band = pipe.count_rows(
        where=[parse_constraint("turn_idx:between:5,40")])
    return pa.table({"n_total": pa.array([n_total], pa.int64()),
                     "n_band": pa.array([n_band], pa.int64())})


def q_cdc_heal(sf_dir: str):
    """Self-healing DLQ loop, end to end: the 20k-event binlog is poisoned
    in THREE bands (changegen.poison_batch, permille=20 + unknown-epoch
    band: lsn&1023<10 corrupt op; 10–19 garbled ts; 20–29 valid ISO-Z under
    unconfigured epoch 7), applied with dlq=True, then
    suggest_dlq_specs → reprocess_dlq recovers the epoch-7 band with NO
    human-written spec.  Result: final lake state = the flagship argmax-LSN
    fold over every event OUTSIDE the two unhealable bands — which is
    exactly what the SQL oracle computes."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        change_events,
        poison_events,
    )

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_heal_{run}")
    pipe = CDCPipeline(lake, num_partitions=32, dlq=True)
    pipe.apply(poison_events(
        change_events(20_000, seed=42, parallelism=16), 20,
        unknown_epoch_band=True))
    pipe.reprocess_dlq(epoch_specs=pipe.suggest_dlq_specs())
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_heal_s_{run}")
    pipe.write_sorted(out_dir)
    final = ray.data.read_parquet(out_dir)
    return final.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_tail(sf_dir: str):
    """Binlog-file ingest front door: the committed 20k-event fixture is
    shipped as four lsn-chunked parquet files into a drop directory and
    applied via the tailer (sources/tailer.py — parquet footer-stats +
    sidecar pruning, two files per exactly-once commit).  The resulting
    lake must equal the flagship argmax-LSN fold — the tailer is a
    delivery mechanism, not a semantics change."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.tailer import tail_directory

    run = uuid.uuid4().hex[:8]
    drop = os.path.join(tempfile.gettempdir(), f"graft_cdc_drop_{run}")
    os.makedirs(drop)
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    step = events.num_rows // 4
    for i in range(4):
        chunk = events.slice(i * step, step if i < 3 else events.num_rows - 3 * step)
        pq.write_table(chunk, os.path.join(drop, f"events-{i:03d}.parquet"))
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_tail_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    tail_directory(pipe, drop, files_per_batch=2)
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_tail_s_{run}")
    pipe.write_sorted(out_dir)
    return ray.data.read_parquet(out_dir).map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_bootstrap(sf_dir: str):
    """Snapshot bootstrap → stream handoff: a throwaway lake folds the
    lsn<10_000 prefix; its state (minus lsn) seeds a SECOND lake via
    ``bootstrap(snapshot_lsn=9_999)``; the suffix stream then applies.
    Final state must equal the full-stream fold — ``lsn`` is excluded from
    the comparison because snapshot rows legitimately carry the snapshot
    position instead of their original lsn."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    ev = change_events(20_000, seed=42, parallelism=16)
    cut = pa.scalar(10_000, pa.int64())
    lake1 = os.path.join(tempfile.gettempdir(), f"graft_cdc_bs1_{run}")
    pipe1 = CDCPipeline(lake1, num_partitions=32)
    pipe1.apply(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    snapshot = pipe1.read_lake().map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    lake2 = os.path.join(tempfile.gettempdir(), f"graft_cdc_bs2_{run}")
    pipe2 = CDCPipeline(lake2, num_partitions=32)
    pipe2.bootstrap(snapshot, snapshot_lsn=9_999)
    pipe2.apply(ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_bs_s_{run}")
    pipe2.write_sorted(out_dir)
    return ray.data.read_parquet(out_dir).map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_merge_on_read(sf_dir: str):
    """Merge-on-read: the lsn<10_000 prefix of the 20k-event fixture is
    COMMITTED; the suffix is overlaid as an uncommitted pending stream via
    ``CDCPipeline.read_merged`` — the serve-fresh-reads half of the
    write/read-amplification tradeoff (hot micro-batches skip the parquet
    rewrite, compaction happens on the tailer's own cadence).  The view
    must equal the full-stream argmax-LSN fold bit-for-bit, because it
    reuses the commit path's own normalize/partition/merge operators."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_mor_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(
        events.filter(pc.less(events.column("lsn"), cut))))
    pending = ray.data.from_arrow(
        events.filter(pc.greater_equal(events.column("lsn"), cut)))
    return pipe.read_merged(pending).map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_sync(sf_dir: str):
    """Incremental downstream sync: first sync of an empty consumer dir
    ships a full snapshot; after the second commit, the next sync ships
    ONLY the change feed since the consumer's cursor, with post-image
    payload (pre-image text for deletes) — the lake→serving bridge
    (`pipelines/cdc.py sync_changes`, `run_cdc --sync-to`).  Returned:
    the second sync's shipped rows.  Oracle: CDF between the two prefix
    folds of the committed fixture, text added CDF-style."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    lsn = events.column("lsn")
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_sync_{run}")
    out = os.path.join(tempfile.gettempdir(), f"graft_cdc_syncout_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, cut))))
    pipe.sync_changes(out)                       # snapshot sync (cursor=v1)
    pipe.apply(ray.data.from_arrow(events.filter(pc.greater_equal(lsn, cut))))
    s = pipe.sync_changes(out, columns=("text",))
    assert s["mode"] == "changes"
    return ray.data.read_parquet(s["path"])


def q_cdc_repartition(sf_dir: str):
    """Lake re-shard: commit the fixture under 16 partitions (half as a
    pending delta backlog), repartition to 48 — a distributed read-fold →
    re-shard → rewrite that must preserve live state exactly and clear
    the backlog (`pipelines/cdc.py repartition_lake`).  Oracle: the
    flagship argmax-LSN fold."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    lsn = events.column("lsn")
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_rep_{run}")
    pipe = CDCPipeline(lake, num_partitions=16)
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, cut))))
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(lsn, cut))))
    pipe.repartition_lake(48)
    return pipe.read_lake().map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_incremental_view(sf_dir: str):
    """Incrementally-maintained materialized view: refresh after a base
    commit, then after a DELTA commit (staleness keys on the base+delta
    signature, so the second refresh re-aggregates only touched
    partitions and folds their pending deltas); read() folds the stored
    per-partition PARTIALS with the associative merge spec.  Oracle: the
    flagship fold grouped per conversation (count + max lsn)."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.views import (
        IncrementalView,
    )

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    lsn = events.column("lsn")
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_ivw_{run}")
    view_dir = os.path.join(tempfile.gettempdir(), f"graft_cdc_ivwv_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, cut))))
    view = IncrementalView(lake, view_dir)
    view.refresh()
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(lsn, cut))))
    view.refresh()
    return view.read()


def q_cdc_sync_mirror(sf_dir: str):
    """Consumer-side fold of a sync directory: after a snapshot sync and a
    change sync, `read_sync_mirror` (distributed: per-key latest-directory
    winner, deletes drop) must reproduce the lake's live state — i.e. the
    flagship argmax-LSN fold."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    lsn = events.column("lsn")
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_smr_{run}")
    out = os.path.join(tempfile.gettempdir(), f"graft_cdc_smrout_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, cut))))
    pipe.sync_changes(out)
    pipe.apply(ray.data.from_arrow(events.filter(pc.greater_equal(lsn, cut))))
    pipe.sync_changes(out)
    return CDCPipeline.read_sync_mirror(out).map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_delta_commits(sf_dir: str):
    """Durable merge-on-read DELTA commits: the lsn<8_000 prefix is a base
    commit; [8_000, 14_000) lands as a delta commit (append-only per-key
    winners, base parquet untouched — write cost ∝ micro-batch, not ∝
    state); ``compact_deltas`` folds that backlog into base; the tail
    lands as a second delta commit and stays PENDING — so the verification
    read exercises the per-partition base+delta fold (`_fold_dataset`, the
    Hudi-style MOR scan: no shuffle, the manifest names each partition's
    file set).  Final state must equal the full-stream argmax-LSN fold
    because DeltaWriter/compaction/fold all reuse keep_last_per_key."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    lsn = events.column("lsn")
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_delta_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    c1, c2 = pa.scalar(8_000, pa.int64()), pa.scalar(14_000, pa.int64())
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, c1))))
    pipe.apply_delta(ray.data.from_arrow(events.filter(pc.and_(
        pc.greater_equal(lsn, c1), pc.less(lsn, c2)))))
    pipe.compact_deltas()
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(lsn, c2))))
    return pipe.read_lake().map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_patch_upserts(sf_dir: str):
    """Partial-column updates (op='patch'): ~15% of the fixture stream's
    upsert traffic is sparse Debezium/Mongo-style patches that set only a
    hashed subset of {role, text, tool, ts} (NULL = unchanged).  The route
    exercises every write tier — base merge for the prefix, a delta commit
    folded by compaction, and a PENDING delta commit folded at read time —
    so the oracle checks that fold_patch_runs (per-column LWW under a
    delete horizon; pipelines/cdc.py) arbitrates identically in commit,
    compaction and merge-on-read fold.

    Oracle: SQL replay of the same rule — delete horizon per key, then
    per-column argmax-lsn among setters (upserts always set a column,
    patches set their non-NULL columns), joined back by setter lsn.  ``ts``
    is excluded like the flagship (ns precision vs DuckDB µs)."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(
        os.path.join(_FIXTURES, "cdc_patch_events_20000.parquet"))
    lsn = events.column("lsn")
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_patch_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    c1, c2 = pa.scalar(8_000, pa.int64()), pa.scalar(14_000, pa.int64())
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, c1))))
    pipe.apply_delta(ray.data.from_arrow(events.filter(pc.and_(
        pc.greater_equal(lsn, c1), pc.less(lsn, c2)))))
    pipe.compact_deltas()
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(lsn, c2))))
    return pipe.read_lake().map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_conv_erasure(sf_dir: str):
    """Conversation-level tombstones (GDPR erasure): ~0.5% of the fixture
    stream is op='delete_conv' — a conv-scoped tombstone that erases EVERY
    turn of its conversation below its lsn, replicated by PartitionStage to
    all partitions (a conversation spans partitions under turn hashing),
    carried through the combiner unfolded, persisted in delta files, and
    dropped once a base merge / compaction materializes the erasure
    (pipelines/cdc.py keep_last_per_key conv-horizon tier).  The route
    exercises base merge + delta commit + compaction + a PENDING delta
    folded at read.  Oracle: SQL replay — per-conv max delete_conv lsn
    joined as an extra delete horizon, then the argmax-LSN fold above it."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(
        os.path.join(_FIXTURES, "cdc_convdel_events_20000.parquet"))
    lsn = events.column("lsn")
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_cd_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    c1, c2 = pa.scalar(8_000, pa.int64()), pa.scalar(14_000, pa.int64())
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, c1))))
    pipe.apply_delta(ray.data.from_arrow(events.filter(pc.and_(
        pc.greater_equal(lsn, c1), pc.less(lsn, c2)))))
    pipe.compact_deltas()
    pipe.apply_delta(ray.data.from_arrow(
        events.filter(pc.greater_equal(lsn, c2))))
    return pipe.read_lake().map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_rollback(sf_dir: str):
    """Rollback (RESTORE VERSION AS OF): the lsn<10_000 prefix commits as
    v1; a CORRUPTED copy of the suffix commits as v2; ``rollback(1)``
    restores v1's partition table — data files, watermarks, DLQ — as
    metadata-only commit v3 (pipelines/cdc.py rollback; GC keeps
    snapshot-referenced files live); the CLEAN suffix then re-applies over
    the rolled-back watermarks.  Final state must equal the clean
    full-stream fold — proving rollback restored both the data AND the
    replay position.  Oracle: the flagship argmax-LSN fold."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES, "cdc_events_20000.parquet"))
    lsn = events.column("lsn")
    cut = pa.scalar(10_000, pa.int64())
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_rb_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events.filter(pc.less(lsn, cut))))
    suffix = events.filter(pc.greater_equal(lsn, cut))
    bad = suffix.set_column(
        suffix.schema.get_field_index("text"), "text",
        pc.binary_join_element_wise(suffix.column("text"), "<CORRUPT>", ""))
    pipe.apply(ray.data.from_arrow(bad))
    pipe.rollback(1)
    pipe.apply(ray.data.from_arrow(suffix))
    return pipe.read_lake().map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_assemble_transcripts(sf_dir: str):
    """Lake → corpus bridge: replay the CDC stream, then assemble each
    conversation's turns into one ordered transcript document
    ("role: text" lines) — the step that feeds transcripts into the
    dedup/quality/token corpus operators.

    Oracle: the same argmax-LSN fold as the flagship, topped with
    string_agg(... ORDER BY turn_idx)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.transcripts import (
        assemble_conversations,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import change_events

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_lake_a{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    # column-pruned lake scan: the assembly needs 4 of the 7 lake columns
    return assemble_conversations(
        pipe.read_lake(columns=["conv_id", "turn_idx", "role", "text"]))


def q_ts_unit_us_to_ns(sf_dir: str):
    """Unit widening us → ns over a long column (U5 upscale multiply)."""
    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    to_us = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("ts", "long", to_unit="us"),)))
    us_to_ns = TimestampFormatStage(TaskConfig(
        columns=(ColumnConfig("ts", "long", from_unit="us", to_unit="ns"),)))
    ds = _read(sf_dir, "events").select_columns(["event_id", "ts"])
    ds = ds.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(us_to_ns, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(lambda b: b.rename_columns(["event_id", "ts_ns"]),
                          batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# relational / window queries
# --------------------------------------------------------------------------

def q_join_revenue_by_nation(sf_dir: str):
    """Broadcast join (orders ⋈ customer ⋈ nation) + partial-agg groupby."""
    import pyarrow.parquet as pq

    from embulk_filter_timestamp_format_ray.stages.relational import (
        broadcast_join,
        grouped_aggregate,
    )

    customer = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                             columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    # pre-join the two small sides driver-side, broadcast once
    small = customer.join(nation.rename_columns(["c_nationkey", "n_name"]),
                          keys="c_nationkey").select(["c_custkey", "n_name"])
    small = small.rename_columns(["o_custkey", "n_name"])
    ds = _read(sf_dir, "orders").select_columns(["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, small, on="o_custkey")
    agg = grouped_aggregate(joined, keys=["n_name"],
                            aggs={"revenue": ("o_totalprice", "sum"),
                                  "n_orders": ("o_totalprice", "count")})

    def stabilise(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("revenue"), dtype=np.float64)
        return pa.table({
            "n_name": b.column("n_name"),
            "revenue": pa.array(np.floor(v * 100 + 0.5) / 100),
            "n_orders": b.column("n_orders"),
        })

    return agg.map_batches(stabilise, batch_format="pyarrow", zero_copy_batch=True)

def q_shuffle_join_revenue(sf_dir: str):
    """Large×large distributed hash join (lineitem ⋈ orders on orderkey —
    neither side broadcastable at 100 TB) + partial-agg rollup by order
    priority."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
        shuffle_join,
    )

    li = _read(sf_dir, "lineitem").select_columns(["l_orderkey", "l_extendedprice"])
    orders = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_orderpriority"])
    joined = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    agg = grouped_aggregate(joined, keys=["o_orderpriority"],
                            aggs={"revenue": ("l_extendedprice", "sum"),
                                  "n_items": ("l_extendedprice", "count")})

    def stabilise(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("revenue"), dtype=np.float64)
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "revenue": pa.array(np.floor(v * 100 + 0.5) / 100),
            "n_items": b.column("n_items"),
        })

    return agg.map_batches(stabilise, batch_format="pyarrow", zero_copy_batch=True)


def q_agg_q1(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.relational import grouped_aggregate

    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = grouped_aggregate(
        ds, keys=["l_returnflag", "l_linestatus"],
        aggs={"sum_qty": ("l_quantity", "sum"),
              "sum_base_price": ("l_extendedprice", "sum"),
              "count_order": ("l_quantity", "count")},
    )

    def stabilise(b: pa.Table) -> pa.Table:
        def r2(col):
            v = np.asarray(b.column(col), dtype=np.float64)
            return pa.array(np.floor(v * 100 + 0.5) / 100)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty": r2("sum_qty"),
            "sum_base_price": r2("sum_base_price"),
            "count_order": b.column("count_order"),
        })

    return out.map_batches(stabilise, batch_format="pyarrow", zero_copy_batch=True)


def q_rollup_sales(sf_dir: str):
    """GROUP BY ROLLUP over orders: totals at (status, priority), (status),
    and grand-total levels in ONE input scan (each coarser level folds the
    previous level's already-tiny aggregate rows —
    stages/relational.py rollup_aggregate).  Prices become integer cents
    BEFORE summation so every level's total is associative and replays
    bit-for-bit in DuckDB (DESIGN #17/#20)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        rollup_aggregate,
    )

    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            b.column("o_totalprice"), 100.0), 0.5)), pa.int64())
        return pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "o_orderpriority": b.column("o_orderpriority"),
            "cents": cents,
        })

    return rollup_aggregate(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderstatus", "o_orderpriority"],
        aggs={"n_orders": ("cents", "count"),
              "total_x100": ("cents", "sum")})


def q_cube_sales(sf_dir: str):
    """GROUP BY CUBE over orders: totals at (status, priority), (status),
    (priority), and grand-total in ONE input scan — every subset folds
    from the pinned finest aggregate (stages/relational.py
    cube_aggregate).  ``grouping_id`` is the standard GROUPING bitmask, so
    DuckDB's GROUPING(status, priority) replays it exactly; cents before
    summation keeps every level associative."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        cube_aggregate,
    )

    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            b.column("o_totalprice"), 100.0), 0.5)), pa.int64())
        return pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "o_orderpriority": b.column("o_orderpriority"),
            "cents": cents,
        })

    return cube_aggregate(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderstatus", "o_orderpriority"],
        aggs={"n_orders": ("cents", "count"),
              "total_x100": ("cents", "sum")})


def q_asof_join(sf_dir: str):
    """As-of join: every event picks up the value of its user's latest
    'snapshot' event (event_id % 97 == 0) at or before its timestamp."""
    from embulk_filter_timestamp_format_ray.stages.relational import asof_join

    events = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    snaps = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts",
                                                    "value"])
    def take_snapshots(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("event_id"))
        return b.filter(pa.array(ids % 97 == 0)).drop_columns(["event_id"])

    snaps = snaps.map_batches(take_snapshots, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = asof_join(events, snaps, by="user_id", on="ts", value_cols=["value"])
    # NULL-preserving scaled int64 (not nullable float): the float column's
    # NULL/NaN rendering was the driver's r1+r2 hash-mismatch — int64 with
    # Arrow NULLs is hash-unambiguous on both the Ray and DuckDB sides.
    return out.map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "value_asof_x100": pc.cast(pc.floor(pc.add(pc.multiply(
                b.column("value_asof"), 100.0), 0.5)), pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)


def q_tumbling_window(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.relational import (
        tumbling_window_aggregate,
    )

    ds = _read(sf_dir, "events").select_columns(["user_id", "ts", "value"])
    out = tumbling_window_aggregate(
        ds, key="user_id", ts_col="ts", window_seconds=3600,
        aggs={"n_events": ("value", "count"), "sum_value": ("value", "sum")})

    def stabilise(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("sum_value"), dtype=np.float64)
        ws = b.column("window_start")
        if isinstance(ws, pa.ChunkedArray):
            ws = ws.combine_chunks()
        return pa.table({
            "user_id": b.column("user_id"),
            "window_start": ws.cast(pa.timestamp("us")),
            "n_events": b.column("n_events"),
            "sum_value": pa.array(np.floor(v * 100 + 0.5) / 100),
        })

    return out.map_batches(stabilise, batch_format="pyarrow", zero_copy_batch=True)


def q_sliding_window(sf_dir: str):
    """Sliding event-time windows (1h window, 15m slide): each event
    replicates into the 4 windows containing it, then the tumbling
    partial/combine machinery aggregates (key, window_start)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        sliding_window_aggregate,
    )

    ds = _read(sf_dir, "events").select_columns(["user_id", "ts", "value"])
    out = sliding_window_aggregate(
        ds, key="user_id", ts_col="ts", window_seconds=3600, slide_seconds=900,
        aggs={"n_events": ("value", "count"), "sum_value": ("value", "sum")})

    def stabilise(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("sum_value"), dtype=np.float64)
        ws = b.column("window_start")
        if isinstance(ws, pa.ChunkedArray):
            ws = ws.combine_chunks()
        return pa.table({
            "user_id": b.column("user_id"),
            "window_start": ws.cast(pa.timestamp("us")),
            "n_events": b.column("n_events"),
            "sum_value": pa.array(np.floor(v * 100 + 0.5) / 100),
        })

    return out.map_batches(stabilise, batch_format="pyarrow", zero_copy_batch=True)


def q_top_p_sources(sf_dir: str):
    """Nucleus-style corpus curation: per source, keep the minimal head of
    documents (by n_chars desc, doc_id asc) covering 80% of the source's
    character mass — integer threshold compare, one hash-shard shuffle
    (stages/sampling.py top_p_by_group)."""
    from embulk_filter_timestamp_format_ray.stages.sampling import (
        top_p_by_group,
    )

    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "source", "n_chars"])
    return top_p_by_group(ds, group_col="source", weight_col="n_chars",
                          id_col="doc_id", p_permille=800)


def q_event_rank(sf_dir: str):
    """Per-user event ranking (row_number by value desc, id asc) + group
    size — the integer-exact percentile basis.  One key-shard exchange,
    segment arithmetic per shard (stages/relational.py rank_in_group)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        rank_in_group,
    )

    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "value"])
    out = rank_in_group(ds, group_col="user_id", order_col="value",
                        id_col="event_id", descending=True)
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "rnk", "n_group"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_event_gaps(sf_dir: str):
    """Per-user inter-event gaps in microseconds (lag difference in
    (ts, id) order; first event NULL) — the feature-engineering shape for
    activity cadence.  One key-shard exchange, shifted subtraction masked
    at key boundaries (stages/relational.py event_gap_us)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        event_gap_us,
    )

    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "ts"])
    out = event_gap_us(ds, key="user_id", ts_col="ts", id_col="event_id")
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "gap_us"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_sample_mod(sf_dir: str):
    """Deterministic pruning filter (pushdown-style row sampling)."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"])
    return ds.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), 7), 0)),
        batch_format="pyarrow", zero_copy_batch=True)


def q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic rebalancing: keep 1/1 of src0, 1/2 of
    src1, 1/4 of src2, 1/8 of src3; drop every other source."""
    from embulk_filter_timestamp_format_ray.stages.sampling import stratified_sample

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "source"])
    return stratified_sample(ds, "source", "doc_id",
                             {"src0": 1, "src1": 2, "src2": 4, "src3": 8})


def q_mix_corpora(sf_dir: str):
    """Training-mix: all English documents + 1/4 of the non-English ones,
    as one streamed union (deterministic, resumable)."""
    from embulk_filter_timestamp_format_ray.stages.sampling import mix_corpora

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "lang", "text"])
    en = docs.filter(expr="lang == 'en'")
    rest = docs.filter(expr="lang != 'en'")
    out = mix_corpora([(en, 1), (rest, 4)], "doc_id")
    return out.map_batches(lambda b: b.select(["doc_id", "lang"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_sessionize(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.relational import sessionize

    ds = _read(sf_dir, "events").select_columns(["user_id", "ts"])
    return sessionize(ds, key="user_id", ts_col="ts", gap_seconds=1800)


def q_semi_join_orders(sf_dir: str):
    """Broadcast semi-join: orders of BUILDING-segment customers."""
    import pyarrow.parquet as pq

    from embulk_filter_timestamp_format_ray.stages.relational import broadcast_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING")) \
               .select(["c_custkey"]).rename_columns(["o_custkey"])
    ds = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey",
                                                 "o_totalprice"])
    return broadcast_join(ds, keys, on="o_custkey", how="semi")


def q_anti_join_orders(sf_dir: str):
    """Broadcast anti-join: orders NOT from negative-balance customers."""
    import pyarrow.parquet as pq

    from embulk_filter_timestamp_format_ray.stages.relational import broadcast_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(pc.less(cust.column("c_acctbal"), 0.0)) \
               .select(["c_custkey"]).rename_columns(["o_custkey"])
    ds = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey"])
    return broadcast_join(ds, keys, on="o_custkey", how="anti")


def q_shuffle_semi_orders(sf_dir: str):
    """DISTRIBUTED semi join (both sides stream; no broadcast): orders of
    BUILDING-segment customers through the tag-union hash-shard membership
    filter — the large×large path when the key side outgrows memory."""
    from embulk_filter_timestamp_format_ray.stages.relational import shuffle_join

    cust = _read(sf_dir, "customer").select_columns(["c_custkey",
                                                     "c_mktsegment"])
    keys = cust.filter(expr="c_mktsegment == 'BUILDING'") \
               .select_columns(["c_custkey"])
    ds = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey",
                                                 "o_totalprice"])
    return shuffle_join(ds, keys, on="o_custkey", how="semi",
                        right_on="c_custkey")


def q_shuffle_anti_orders(sf_dir: str):
    """DISTRIBUTED anti join: orders NOT from negative-balance customers,
    same shape as the near-dup drop-set application at 100 TB."""
    from embulk_filter_timestamp_format_ray.stages.relational import shuffle_join

    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_acctbal"])
    keys = cust.filter(expr="c_acctbal < 0").select_columns(["c_custkey"])
    ds = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey"])
    return shuffle_join(ds, keys, on="o_custkey", how="anti",
                        right_on="c_custkey")


def q_explode_words(sf_dir: str):
    """List-flatten (flat_map analog): documents → one row per word."""
    from embulk_filter_timestamp_format_ray.stages.relational import explode_list

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "words": pc.split_pattern_regex(b.column("text"), pattern=r"\s+"),
        }), batch_format="pyarrow", zero_copy_batch=True)
    return explode_list(ds, "words", out_col="word")


def q_chunk_documents(sf_dir: str):
    """Token-window chunking with overlap: documents → training-example
    windows of 64 whitespace tokens advancing by 48 (every token covered,
    short tail window kept).  Overlap means a plain list re-offset cannot
    express the windows, so the kernel gathers the flattened token stream
    once and run-length-joins (stages/text_stats.py chunk_documents_batch).
    Oracle: regexp_split + unnest(range(n_chunks)) + list_slice replaying
    the identical integer chunk-count rule."""
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        chunk_documents,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return chunk_documents(ds, size=64, stride=48)


def q_cdc_point_lookup(sf_dir: str):
    """Indexed point lookup: one conversation read back from the committed
    lake via read_conversation — candidate-partition pruning (conv-hash →
    pid set) + conv_id row-group predicate pushdown inside those files
    (files are (conv_id, turn_idx)-sorted with bounded row groups), no full
    scan, no shuffle.  A hot conversation ('conv-00000003') is used so the
    key exists at every sf.  Oracle: the flagship fold filtered to the
    conversation."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        change_events,
    )

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_pt_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    tbl = pipe.read_conversation("conv-00000003")
    return tbl.select(["conv_id", "turn_idx", "role", "text", "tool",
                       "lsn"])


def q_cdc_point_lookup_clustered(sf_dir: str):
    """Point lookup on a CLUSTERED lake via the bloom sidecar
    (pipelines/cdc.py write_bloom_sidecar / bloom_candidate_groups):
    clustering by ts scatters a conversation across row groups (its
    conv_id zone maps widen to the whole file), so read_conversation
    probes the per-row-group Bloom sidecar written beside every clustered
    base and reads only the candidate groups — partition pruning AND
    row-group pruning survive the analytics-friendly layout.  Same answer
    as cdc_point_lookup (the sidecar is a pure read optimization); the
    20k fixture is used so the oracle matches the other cdc_* rows."""
    import pyarrow.parquet as pq
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

    run = uuid.uuid4().hex[:8]
    events = pq.read_table(os.path.join(_FIXTURES,
                                        "cdc_events_20000.parquet"))
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_ptc_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(ray.data.from_arrow(events))
    pipe.set_clustering(["ts"])
    tbl = pipe.read_conversation("conv-00000003")
    return tbl.select(["conv_id", "turn_idx", "role", "text", "tool",
                       "lsn"])


def q_transcripts_to_training(sf_dir: str):
    """The engine's raison d'être as ONE composition: exactly-once CDC
    replay → lake → per-conversation transcript assembly → overlapping
    token-window training chunks.  Every stage streams (one shuffle for the
    merge, one for assembly, chunking stateless).  Oracle: the flagship
    argmax-LSN fold + ordered string_agg + the unnest(range())/list_slice
    chunk replay, chained in one SQL statement."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.transcripts import (
        assemble_conversations,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        change_events,
    )
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        chunk_documents,
    )

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_train_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    docs = assemble_conversations(pipe.read_lake())
    return chunk_documents(docs, size=32, stride=24, id_col="conv_id",
                           text_col="transcript")


def q_distinct_event_types(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.relational import distinct

    return distinct(_read(sf_dir, "events").select_columns(["event_type"]),
                    ["event_type"])


def q_topk_docs_per_source(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.relational import top_k_by_group

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "source", "n_chars"])
    return top_k_by_group(ds, ["source"], "n_chars", k=3, descending=True,
                          tie_col="doc_id")


def q_corpus_prep(sf_dir: str):
    """Composed training-data prep flagship: language filter → quality
    filter → exact dedup → token counting — each stage an engine operator,
    the whole thing streaming with one shuffle (the dedup groupby)."""
    from embulk_filter_timestamp_format_ray.stages.dedup import dedup_exact
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        lang_id_batch,
        quality_score_batch,
        token_count_batch,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang_pred"), "en")).select(
            ["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_words"), 10)).select(
            ["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = dedup_exact(ds)
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(lambda b: b.select(["doc_id", "n_tokens_ws",
                                              "n_tokens_bpe"]),
                          batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# text analysis / dedup / ANN / multimodal
# --------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.text_stats import token_count_batch

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(lambda b: b.drop_columns(["text"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_text_quality_counts(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.text_stats import quality_score_batch

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow",
                        zero_copy_batch=True)

    def ints_only(b: pa.Table) -> pa.Table:
        n_punct = pc.cast(pc.multiply(b.column("punct_ratio"),
                                      pc.cast(pc.max_element_wise(
                                          b.column("n_chars_q"), 1), pa.float64())),
                          pa.float64())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_chars_q": b.column("n_chars_q"),
            "n_words": b.column("n_words"),
            "n_punct": pa.array(np.rint(np.asarray(n_punct)).astype(np.int64)),
        })

    return ds.map_batches(ints_only, batch_format="pyarrow", zero_copy_batch=True)


def q_quality_score(sf_dir: str):
    """Composite quality score, oracled: the SQL mirrors the pc arithmetic
    term-for-term (same association order → bit-equal doubles); outputs are
    scaled to int64 (×1e6, half-up) to keep the hash float-free."""
    from embulk_filter_timestamp_format_ray.stages.text_stats import quality_score_batch

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow",
                        zero_copy_batch=True)

    def scale(b: pa.Table) -> pa.Table:
        def x1e6(col):
            v = np.asarray(b.column(col), dtype=np.float64)
            return pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))

        return pa.table({
            "doc_id": b.column("doc_id"),
            "stopword_x1e6": x1e6("stopword_ratio"),
            "upper_x1e6": x1e6("upper_ratio"),
            "score_x1e6": x1e6("quality_score"),
        })

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_id(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.text_stats import lang_id_batch

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(lambda b: b.select(["doc_id", "lang_pred"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_doc_fingerprint(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.text_stats import FingerprintStage

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(FingerprintStage, concurrency=(1, 4),
                        batch_format="pyarrow")
    return ds.map_batches(lambda b: b.select(["doc_id", "fingerprint"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_word_jaccard_pairs(sf_dir: str):
    """Exact word-set Jaccard on fixed candidate pairs (doc i vs i+1,
    i < 50) — the verify kernel of the near-dup pipeline, oracled against
    DuckDB's list algebra. Scaled to int to keep hashing float-free."""
    from embulk_filter_timestamp_format_ray.stages.dedup import ngram_jaccard

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def pair_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = batch.column("text").to_pylist()
        by_id = dict(zip(ids.tolist(), texts))
        ia, jac = [], []
        for a in by_id:
            if a < 50 and (a + 1) in by_id:
                j = ngram_jaccard(by_id[a], by_id[a + 1], k=1)
                ia.append(a)
                jac.append(int(np.floor(100000 * j + 0.5)))
        return pa.table({"id_a": pa.array(ia, pa.int64()),
                         "jac_scaled": pa.array(jac, pa.int64())})

    # pairs need both docs co-resident: tiny id range → single repartition
    return ds.map_batches(lambda b: b.filter(pc.less_equal(b.column("doc_id"), 50)),
                          batch_format="pyarrow", zero_copy_batch=True) \
             .repartition(1) \
             .map_batches(pair_rows, batch_format="pyarrow", batch_size=None)


def q_dedup_exact(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.dedup import dedup_exact

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = dedup_exact(ds)
    return out.map_batches(lambda b: b.select(["doc_id", "text"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_near_corpus(sf_dir: str):
    """End-to-end near-dup removal: LSH pairs → connected components →
    anti-join the non-representatives out of the streaming corpus."""
    from embulk_filter_timestamp_format_ray.stages.dedup import dedup_near_duplicates

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = dedup_near_duplicates(ds, threshold=0.85)
    return out.map_batches(lambda b: b.select(["doc_id"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_minhash(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.dedup import dedup_minhash_pairs

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return dedup_minhash_pairs(ds, threshold=0.6)


def q_dedup_incremental(sf_dir: str):
    """Incremental dedup against a PERSISTENT LSH band store — the CDC-fed
    corpus shape: the store is built once from the accepted corpus (even
    doc_ids here); each new micro-batch (odd doc_ids) probes only the
    store shards its band keys hash into, drops store collisions plus
    within-batch duplicates, and appends its survivors.  Oracle: an
    independent sequential replay (scripts/make_fixtures.py
    incremental_dedup_reference)."""
    import shutil

    from embulk_filter_timestamp_format_ray.stages.dedup import (
        build_band_store,
        dedup_against_store,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def half(parity):
        def f(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"))
            return b.filter(pa.array(ids % 2 == parity))
        return f

    store_dir = tempfile.mkdtemp(prefix="bandstore_q_")
    try:
        build_band_store(
            docs.map_batches(half(0), batch_format="pyarrow",
                             zero_copy_batch=True),
            store_dir, num_perm=32, bands=8)
        kept, _rep = dedup_against_store(
            docs.map_batches(half(1), batch_format="pyarrow",
                             zero_copy_batch=True),
            store_dir)
        # kept is a broadcast semi-join of the odd half against the
        # driver-side kept-id table — consume it before the store dir goes
        ids = sorted(kept.to_pandas()["doc_id"].tolist())
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def q_dedup_simhash(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.dedup import dedup_simhash_pairs

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return dedup_simhash_pairs(ds, max_hamming=3)


def q_embedding_neardup(sf_dir: str):
    """The synthetic embeddings have no natural near-dups (max pairwise
    cosine ≈ 0.51), so plant deterministic perturbed copies of the first 32
    vectors; the LSH+verify pipeline must recover them."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.dedup import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])

    def plant_dups(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("vec_id"))
        sel = ids < 32
        if not sel.any():
            return b
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = np.asarray(emb.flatten(), dtype=np.float32).reshape(len(ids), -1)
        sub = x[sel]
        # counter-based noise (deterministic regardless of batch boundaries)
        from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64

        counters = (ids[sel][:, None] * sub.shape[1]
                    + np.arange(sub.shape[1])[None, :]).astype(np.int64)
        u = (splitmix64(counters.ravel().astype(np.uint64), 123)
             >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        noisy = sub + (0.02 * (u - 0.5)).reshape(sub.shape).astype(np.float32)
        dup = pa.table({
            "vec_id": pa.array(ids[sel] + 1_000_000),
            "embedding": pa.array(list(noisy), type=emb.type),
        })
        return pa.concat_tables([b, dup], promote_options="permissive")

    ds = ds.map_batches(plant_dups, batch_format="pyarrow", zero_copy_batch=True)
    first = _read(sf_dir, "embeddings").take(1)
    dim = len(first[0]["embedding"])
    return embedding_neardup_pairs(ds, dim, threshold=0.95, planes=12)


N_ANN_QUERIES = 4


def _ann_queries(sf_dir: str) -> np.ndarray:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"select embedding from read_parquet('{sf_dir}/embeddings.parquet') "
        f"where vec_id < {N_ANN_QUERIES} order by vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def q_ann_topk(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.ann import brute_force_topk

    ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    out = brute_force_topk(ds, _ann_queries(sf_dir), k=10)
    return out.map_batches(lambda b: b.select(["query_id", "vec_id", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _ivf_index_dir(sf_dir: str) -> str:
    """Build (once, content-keyed cache) the centroid-partitioned IVF index
    for sf_dir's embeddings table.  The index must outlive the returned lazy
    Dataset, so it lives in a keyed cache dir rather than a tempdir."""
    import hashlib

    from embulk_filter_timestamp_format_ray.stages.ann import build_ivf_index

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:v1".encode()
    ).hexdigest()[:16]
    idx = os.path.join("/tmp/graft_ivf", key)
    if not os.path.exists(os.path.join(idx, "_SUCCESS")):
        os.makedirs("/tmp/graft_ivf", exist_ok=True)
        ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
        build_ivf_index(ds, idx, n_centroids=16)
    return idx


def q_ann_ivf(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.ann import ivf_topk_partitioned

    # Scale path: the corpus is persisted as centroid-partitioned parquet and
    # the probe READS only the nprobe lists' files (the other 6/16 of the
    # corpus never leaves storage).  nprobe=10/16 still achieves exact top-k
    # on this data (pinned by tests), so the brute-force SQL is the oracle.
    idx = _ivf_index_dir(sf_dir)
    out = ivf_topk_partitioned(idx, _ann_queries(sf_dir), k=10, nprobe=10)
    return out.map_batches(lambda b: b.select(["query_id", "vec_id", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _ivf_quant_index_dir(sf_dir: str) -> str:
    import hashlib

    from embulk_filter_timestamp_format_ray.stages.ann import build_ivf_index

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:q1".encode()
    ).hexdigest()[:16]
    idx = os.path.join("/tmp/graft_ivf", key)
    if not os.path.exists(os.path.join(idx, "_SUCCESS")):
        os.makedirs("/tmp/graft_ivf", exist_ok=True)
        ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
        build_ivf_index(ds, idx, n_centroids=16, quantized=True)
    return idx


def q_ann_ivf_quantized(sf_dir: str):
    """Quantized IVF tier: the index stores int8 q + scale_ppm (~4× less
    disk — at 100 TB the embedding column IS the dataset) and the probe
    dequantizes per batch.  The int8 round-trip is deterministic IEEE
    double arithmetic, so DuckDB replays the dequantized vectors exactly
    and the brute-force ranking over them is the oracle (nprobe=10/16
    still achieves the exact dequantized top-k on this data)."""
    from embulk_filter_timestamp_format_ray.stages.ann import ivf_topk_partitioned

    idx = _ivf_quant_index_dir(sf_dir)
    out = ivf_topk_partitioned(idx, _ann_queries(sf_dir), k=10, nprobe=10)
    return out.map_batches(lambda b: b.select(["query_id", "vec_id", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_multimodal_embed_ann(sf_dir: str):
    """Composed multimodal → similarity-search pipeline: opaque binary
    payloads → actor-pool feature extraction (deterministic fake embedder —
    the real model slot is EmbedImageStage.__init__) → exact cosine top-5
    against the first two documents' embeddings.  Oracled against a fixture
    computed by an independent numpy reimplementation."""
    import duckdb

    from embulk_filter_timestamp_format_ray.stages.ann import brute_force_topk
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        EmbedImageStage,
        attach_fake_image_bytes,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(attach_fake_image_bytes, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(EmbedImageStage, fn_constructor_kwargs={"dim": 32},
                        concurrency=(1, 4), batch_size=256,
                        batch_format="pyarrow")
    ds = ds.map_batches(lambda b: b.select(["doc_id", "embedding"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    # queries: the first two docs' embeddings, derived with the same stage
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet') "
        "where doc_id < 2 order by doc_id").fetchall()
    qt = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                   "text": pa.array([r[1] for r in rows], pa.string())})
    qe = EmbedImageStage(dim=32)(attach_fake_image_bytes(qt))
    q = np.asarray(qe.column("embedding").combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(rows), -1)
    out = brute_force_topk(ds, q, k=5, id_col="doc_id")
    return out.map_batches(lambda b: b.select(["query_id", "doc_id", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_multimodal_decode(sf_dir: str):
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        attach_fake_image_bytes,
        decode_images,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = ds.map_batches(attach_fake_image_bytes, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = decode_images(ds, concurrency=(1, 4), batch_size=256)
    return ds.map_batches(lambda b: b.select(["doc_id", "n_bytes"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_multimodal_decode_png(sf_dir: str):
    """REAL-codec decode path end-to-end: deterministic PNG payloads
    (stdlib encoder, functions/imagecodec.py) attached per doc, decoded by
    the stage's tier chain (PIL → stdlib sniffer) inside the actor pool —
    dims/format verified against the closed-form SQL.  This is the
    non-stub branch of the multimodal pipeline under driver oracle."""
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        decode_images,
    )

    def attach_png(b: pa.Table) -> pa.Table:
        from embulk_filter_timestamp_format_ray.functions.imagecodec import (
            encode_png,
        )

        # per-item encoding is the codec tier's nature; dims are a pure
        # function of doc_id so DuckDB can replay them
        payloads = [
            encode_png(np.full((1 + int(i) % 9, 1 + int(i) % 16),
                               (int(i) * 37) % 256, np.uint8))
            for i in np.asarray(b.column("doc_id"))
        ]
        return b.append_column("image_bytes",
                               pa.array(payloads, pa.binary()))

    ds = _read(sf_dir, "documents").select_columns(["doc_id"])
    ds = ds.map_batches(attach_png, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = decode_images(ds, concurrency=(1, 4), batch_size=256)
    return ds.map_batches(
        lambda b: b.select(["doc_id", "img_width", "img_height",
                            "img_format"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_multimodal_decode_wav(sf_dir: str):
    """REAL stdlib audio decode end-to-end: deterministic 16-bit PCM WAV
    payloads (stdlib ``wave`` writer, functions/audiocodec.py) attached
    per doc, decoded by AudioDecodeStage inside the actor pool — rate /
    channels / frames / duration and the integer PCM feature verified
    against the closed-form SQL (every parameter is a pure function of
    doc_id).  Completes the multimodal family's audio tier; video's
    stdlib tier is multimodal_decode_y4m."""
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        decode_audio,
    )

    def attach_wav(b: pa.Table) -> pa.Table:
        from embulk_filter_timestamp_format_ray.functions.audiocodec import (
            encode_wav,
        )

        payloads = []
        for i in np.asarray(b.column("doc_id")):
            i = int(i)
            rate = 8000 + (i % 8) * 1000
            channels = 1 + i % 2
            n_frames = 100 + i % 50
            val = (i * 37) % 2000
            samples = np.full(n_frames * channels, val, dtype=np.int16)
            payloads.append(encode_wav(samples, rate, channels))
        return b.append_column("audio_bytes",
                               pa.array(payloads, pa.binary()))

    ds = _read(sf_dir, "documents").select_columns(["doc_id"])
    ds = ds.map_batches(attach_wav, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = decode_audio(ds, concurrency=(1, 4), batch_size=256, strict=True)
    return ds.map_batches(
        lambda b: b.select(["doc_id", "sample_rate", "n_channels",
                            "n_frames", "duration_ms", "mean_abs",
                            "audio_format"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_multimodal_decode_y4m(sf_dir: str):
    """REAL stdlib video decode end-to-end: deterministic YUV4MPEG2
    payloads (functions/videocodec.py — mixed Cmono / C420jpeg streams)
    attached per doc, decoded by VideoDecodeStage inside the actor pool —
    dims / fps / frame count / duration and the integer luma feature
    verified against closed-form SQL (every parameter is a pure function
    of doc_id).  Completes the multimodal family's video tier; compressed
    containers stay a documented refusal (strict tier)."""
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        decode_video,
    )

    def attach_y4m(b: pa.Table) -> pa.Table:
        from embulk_filter_timestamp_format_ray.functions.videocodec import (
            encode_y4m,
        )

        payloads = []
        for i in np.asarray(b.column("doc_id")):
            i = int(i)
            w, h = 16 + (i % 3) * 16, 8 + (i % 2) * 8
            n_frames = 3 + i % 5
            fps = 24 + i % 6
            val = (i * 53) % 256
            frames = np.full((n_frames, w * h), val, dtype=np.uint8)
            payloads.append(encode_y4m(
                frames, w, h, fps_num=fps, fps_den=1,
                colorspace="Cmono" if i % 2 else "C420jpeg"))
        return b.append_column("video_bytes",
                               pa.array(payloads, pa.binary()))

    ds = _read(sf_dir, "documents").select_columns(["doc_id"])
    ds = ds.map_batches(attach_y4m, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = decode_video(ds, concurrency=(1, 4), batch_size=128, strict=True)
    return ds.map_batches(
        lambda b: b.select(["doc_id", "width", "height", "fps_num",
                            "n_frames", "duration_ms", "mean_y",
                            "video_format"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_top_words(sf_dir: str):
    """Corpus-wide top-20 words: flat-map explode → sharded count aggregate
    → global top-k combiner (≤ k rows survive per block; no global sort,
    no driver rows)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        explode_list,
        grouped_aggregate,
        top_k_global,
    )

    ds = _read(sf_dir, "documents").select_columns(["text"])
    ds = ds.map_batches(
        lambda b: pa.table({
            "words": pc.split_pattern_regex(b.column("text"), pattern=r"\s+"),
        }), batch_format="pyarrow", zero_copy_batch=True)
    words = explode_list(ds, "words", out_col="word")
    counts = grouped_aggregate(words, ["word"], {"n": ("word", "count")})
    return top_k_global(counts, "n", 20, tie_cols=("word",))


def q_quality_filter_median(sf_dir: str):
    """The curation composition: per-language median n_chars from the
    grouped histogram sketch, broadcast back, keep docs at-or-above their
    language's median.  Oracle replays the sketch + join + filter."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        broadcast_join,
        grouped_approx_quantiles,
    )

    docs = _read(sf_dir, "documents").select_columns(["lang", "n_chars"])
    med = grouped_approx_quantiles(docs, "lang", "n_chars", [0.5], bins=256)
    med_tbl = pa.table({"lang": med.column("lang"),
                        "med": med.column("quantile")})
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "lang",
                                                    "n_chars"])
    joined = broadcast_join(ds, med_tbl, on="lang", how="inner")
    return joined.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("n_chars").cast(pa.float64()), b.column("med")))
        .select(["doc_id", "lang", "n_chars"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_grouped_quantiles(sf_dir: str):
    """Per-language n_chars quantiles via per-group histogram sketches
    ("keep the top X% per language" threshold picker).  Oracle: DuckDB
    replay of the sketch math, partitioned by lang."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_approx_quantiles,
    )

    t = grouped_approx_quantiles(
        _read(sf_dir, "documents").select_columns(["lang", "n_chars"]),
        "lang", "n_chars", [0.5, 0.9], bins=256)
    return pa.table({
        "lang": t.column("lang"),
        "q_x100": pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("q"), 100.0), 0.5)), pa.int64()),
        "quantile_value": pc.divide(pc.floor(pc.add(pc.multiply(
            t.column("quantile"), 100.0), 0.5)), 100.0),
    })


def q_redact_pii(sf_dir: str):
    """PII scrub over documents: inject deterministic synthetic PII
    (emails/phones/SSNs derived from doc_id — the corpus itself has none),
    then run the vectorized RE2 redaction pass.  The oracle mirrors both
    steps term-for-term in DuckDB (same RE2 patterns)."""
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        redact_pii_batch,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def inject(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").cast(pa.string())
        text = pc.binary_join_element_wise(
            pc.fill_null(b.column("text"), ""),
            " contact user", ids, "@example.com or +1555000", ids,
            " ssn 123-45-6789", "")
        return pa.table({"doc_id": b.column("doc_id"), "text": text})

    ds = ds.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(redact_pii_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(
        lambda b: b.select(["doc_id", "text", "n_redactions"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-count estimates over events (string + int hash
    paths).  Deterministic given the hash primitives, so the oracle is a
    fixture parquet from an independent SCALAR HLL reimplementation
    (scripts/make_fixtures.py) — a cross-check of the vectorized
    leading-zero kernel and the sparse register merge."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        approx_count_distinct,
    )

    est_type = approx_count_distinct(
        _read(sf_dir, "events").select_columns(["event_type"]), "event_type")
    est_user = approx_count_distinct(
        _read(sf_dir, "events").select_columns(["user_id"]), "user_id")
    return pa.table({
        "column_name": pa.array(["event_type", "user_id"], pa.string()),
        "approx_distinct": pa.array([int(np.floor(est_type + 0.5)),
                                     int(np.floor(est_user + 0.5))],
                                    pa.int64()),
    })


def _priority_pairs(sf_dir: str, priority: str):
    ds = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderstatus", "o_orderpriority"])
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderpriority"), priority))
        .select(["o_custkey", "o_orderstatus"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_set_intersect(sf_dir: str):
    """SQL INTERSECT via the sharded tagged-union run-compare
    (stages/relational.py set_op_rows): (custkey, status) pairs present
    under BOTH urgent and high order priorities."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        set_op_rows,
    )

    return set_op_rows(_priority_pairs(sf_dir, "1-URGENT"),
                       _priority_pairs(sf_dir, "2-HIGH"),
                       ["o_custkey", "o_orderstatus"], "intersect")


def q_set_except(sf_dir: str):
    """SQL EXCEPT via the same skeleton: urgent-only (custkey, status)
    pairs (stages/relational.py set_op_rows)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        set_op_rows,
    )

    return set_op_rows(_priority_pairs(sf_dir, "1-URGENT"),
                       _priority_pairs(sf_dir, "2-HIGH"),
                       ["o_custkey", "o_orderstatus"], "except")


def q_bloom_join_revenue(sf_dir: str):
    """Bloom-pruned large×large join: urgent orders' keys build a
    distributed Bloom filter (stages/relational.py build_bloom_filter),
    lineitem prefilters against the broadcast bitmap (~80% of probe rows
    never reach the exchange), and the exact shuffle join removes the
    false positives — so the result, and the oracle, is exactly the plain
    join SQL.  Revenue as per-row integer cents before the join keeps the
    float math SQL-replayable and the exchange narrow."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        bloom_prefilter,
        build_bloom_filter,
        grouped_aggregate,
        shuffle_join,
    )

    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderpriority"),
                                    "1-URGENT")).select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    bloom = build_bloom_filter(urgent, "o_orderkey")

    def cents(b: pa.Table) -> pa.Table:
        price = np.asarray(b.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(b.column("l_discount"), dtype=np.float64)
        rev = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_returnflag": b.column("l_returnflag"),
                         "rev_cents": pa.array(rev)})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    li = bloom_prefilter(li.map_batches(cents, batch_format="pyarrow",
                                        zero_copy_batch=True),
                         "l_orderkey", bloom)
    joined = shuffle_join(li, urgent, on="l_orderkey",
                          right_on="o_orderkey")
    return grouped_aggregate(joined, keys=["l_returnflag"],
                             aggs={"revenue_cents": ("rev_cents", "sum"),
                                   "n_items": ("rev_cents", "count")})


def q_remove_boilerplate(sf_dir: str):
    """CCNet-style line-level boilerplate removal over documents
    (stages/text_stats.py remove_boilerplate_lines).  sf documents are
    single-line, so the query first injects deterministic boilerplate —
    a universal header, a share-bar line, and a ``Footer v{doc_id % 120}``
    whose 4-to-5-doc variants straddle min_docs=5, exercising the
    threshold in both directions.  The oracle mirrors the injection and
    replays the DF rule with DuckDB list lambdas."""
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        remove_boilerplate_lines,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def inject(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        variant = pc.cast(pc.subtract(
            ids.cast(pa.int64()),
            pc.multiply(pc.divide(ids.cast(pa.int64()), 120),
                        pa.scalar(120, pa.int64()))), pa.string())
        footer = pc.binary_join_element_wise("Footer v", variant, "")
        txt = pc.binary_join_element_wise(
            "SITE HEADER", pc.fill_null(b.column("text"), ""),
            "Share on SocialApp", footer, "\n")
        return pa.table({"doc_id": b.column("doc_id"), "text": txt})

    ds = ds.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    return remove_boilerplate_lines(ds, min_docs=5)


def q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (stages/relational.py grouped_count_distinct): local distinct →
    one pair-hash exchange → partial/combine count rollup.  Exactly
    SQL-expressible, so the oracle is the direct DuckDB aggregate."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_count_distinct,
    )

    ds = _read(sf_dir, "events").select_columns(["event_type", "user_id"])
    return grouped_count_distinct(ds, "event_type", "user_id",
                                  out_col="n_users")


def q_hll_grouped(sf_dir: str):
    """Per-group HyperLogLog distinct-event_id estimates per event_type
    (stages/relational.py grouped_approx_count_distinct) — the sketch tier
    of distinct_users_by_type.  event_id (not user_id) so per-group
    register sets and estimates genuinely differ (user_id is exactly 150
    per type at sf0.01 — degenerate).  Deterministic given the hash
    primitives; oracle is a fixture parquet from an independent per-group
    SCALAR HLL (scripts/make_fixtures.py hll_grouped_reference)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_approx_count_distinct,
    )

    ds = _read(sf_dir, "events").select_columns(["event_type", "event_id"])
    return grouped_approx_count_distinct(ds, "event_type", "event_id")


def q_approx_quantiles(sf_dir: str):
    """Histogram-sketch approximate quantiles of events.value — the
    two-pass, no-sort quantile path.  The sketch math (trunc binning,
    cumulative search, bin-midpoint estimate) is SQL-expressible, so the
    oracle replays it exactly in DuckDB."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        approx_quantiles,
    )

    qs = [0.25, 0.5, 0.75, 0.9]
    res = approx_quantiles(
        _read(sf_dir, "events").select_columns(["value"]), "value", qs,
        bins=4096)
    return pa.table({
        "q_x100": pa.array([int(round(q * 100)) for q in qs], pa.int64()),
        "quantile_value": pa.array(
            [float(np.floor(res[q] * 100 + 0.5) / 100) for q in qs],
            pa.float64()),
    })


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition features per document (top-2-gram mass,
    duplicated-5-gram mass) — stateless batch kernel, no shuffle.  Ratios
    are integer per-mille so the DuckDB n-gram oracle replays them
    bit-for-bit."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        repetition_stats,
    )

    return repetition_stats(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def q_decontaminate(sf_dir: str):
    """Eval-suite decontamination: documents with doc_id % 37 == 0 play the
    held-out benchmark; the remaining (train) docs are flagged when ≥20% of
    their word-5-gram occurrences appear in the benchmark's gram set.  The
    eval gram-hash set is broadcast once via ray.put; membership is one
    searchsorted per batch."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import decontaminate

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    train = docs.map_batches(
        lambda b: b.filter(pc.not_equal(
            pc.subtract(b.column("doc_id"),
                        pc.multiply(pc.divide(b.column("doc_id"), 37), 37)),
            0)),
        batch_format="pyarrow", zero_copy_batch=True)
    evals = docs.map_batches(
        lambda b: b.filter(pc.equal(
            pc.subtract(b.column("doc_id"),
                        pc.multiply(pc.divide(b.column("doc_id"), 37), 37)),
            0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return decontaminate(train, evals, k=5, threshold_pct=20)


def q_dataset_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment via the Lehmer
    modular permutation of doc_id (replayable in SQL, resume-safe, no
    process-seeded randomness) — the split every training run needs to
    reproduce exactly.  Stateless vectorized pass."""
    from embulk_filter_timestamp_format_ray.stages.sampling import (
        assign_split,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "source"])
    return assign_split(docs, "doc_id", train_pct=80, val_pct=10)


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: distinct shared word-5-grams per
    source pair.  Only 8-byte gram hashes shuffle (one hash-shard
    exchange); pairs emit per gram run bounded by the source count."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        source_gram_overlap,
    )

    return source_gram_overlap(
        _read(sf_dir, "documents").select_columns(["text", "source"]), k=5)


def q_corpus_report(sf_dir: str):
    """Per-source corpus health report: doc/token/char totals, predicted-
    English share, mean doc length — one pass of vectorized per-batch
    stats + the map-side-combined aggregate.  All ratios integer-exact."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
    )
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        lang_id_batch,
    )

    docs = _read(sf_dir, "documents").select_columns(
        ["text", "source", "n_chars"])

    def stats(b: pa.Table) -> pa.Table:
        b = lang_id_batch(b)  # emits n_words_lang — no second regex scan
        return pa.table({
            "source": b.column("source"),
            "tokens": b.column("n_words_lang"),
            "chars": b.column("n_chars"),
            "is_en": pc.cast(pc.equal(b.column("lang_pred"), "en"),
                             pa.int64()),
        })

    per_doc = docs.map_batches(stats, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = grouped_aggregate(per_doc, ["source"],
                            {"n_docs": ("tokens", "count"),
                             "total_tokens": ("tokens", "sum"),
                             "total_chars": ("chars", "sum"),
                             "en_docs": ("is_en", "sum")})
    return agg.map_batches(
        lambda b: b.append_column(
            "mean_tokens_x100",
            pc.cast(pc.divide(pc.multiply(b.column("total_tokens"), 100),
                              b.column("n_docs")), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)


def q_materialize_sequences(sf_dir: str):
    """Training-batch materialization: pack docs into 512-token sequences
    (distributed prefix sum) and CONCATENATE each sequence's text in doc
    order — one key-shard exchange, one binary_join per shard run
    (stages/relational.py concat_by_key).  The oracle is the window
    cumsum + string_agg."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        concat_by_key,
        pack_sequences,
        shuffle_join,
    )

    # pack over the NARROW (doc_id, n_tokens) projection (prefix-sum
    # contract: the internal checkpoint must hold two slim columns, never
    # the text), then join seq_id back onto the text rows for the concat
    narrow = _token_counts(_read(sf_dir, "documents")
                           .select_columns(["doc_id", "text"]))
    packed = pack_sequences(narrow, "doc_id", "n_tokens", seq_len=512,
                            bucket_size=100)
    packed = packed.map_batches(
        lambda b: b.select(["doc_id", "seq_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    tagged = shuffle_join(docs, packed, on="doc_id", how="inner")
    return concat_by_key(tagged, "seq_id", "doc_id", "text")


def q_quantize_embeddings(sf_dir: str):
    """Int8 embedding quantization (per-vector symmetric scale) — the 4×
    storage compression for the corpus's bulkiest column.  Output is
    hash-exact: integer q-value aggregates plus the scale as a ppm int;
    the oracle replays the identical IEEE-double arithmetic with DuckDB
    list lambdas."""
    from embulk_filter_timestamp_format_ray.stages.ann import (
        quantize_embeddings_batch,
    )

    ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    qds = ds.map_batches(quantize_embeddings_batch, batch_format="pyarrow",
                         zero_copy_batch=True)

    def summarize(b: pa.Table) -> pa.Table:
        q = b.column("q")
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        dim = q.type.list_size
        m = np.asarray(q.flatten().cast(pa.int64())).reshape(-1, dim)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "scale_ppm": b.column("scale_ppm"),
            "q_sum": pa.array(m.sum(axis=1)),
            "q_min": pa.array(m.min(axis=1)),
            "q_max": pa.array(m.max(axis=1)),
        })

    return qds.map_batches(summarize, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_multimodal_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing: deterministic fake payloads (text
    repeated 64× cast to binary — real codecs are absent from the
    container), every-4th-frame offsets at 1 KiB/frame, summarized to
    hashable scalars.  The oracle replays the offset arithmetic from the
    payload byte length."""
    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        FrameSampleStage,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def fake_video(b: pa.Table) -> pa.Table:
        rep = pc.binary_repeat(pc.fill_null(b.column("text"), ""), 64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "video_bytes": rep.cast(pa.binary())})

    ds = docs.map_batches(fake_video, batch_format="pyarrow",
                          zero_copy_batch=True)
    ds = ds.map_batches(FrameSampleStage(every_n=4),
                        batch_format="pyarrow", zero_copy_batch=True)

    def summarize(b: pa.Table) -> pa.Table:
        fo = b.column("frame_offsets")
        if isinstance(fo, pa.ChunkedArray):
            fo = fo.combine_chunks()
        counts = np.asarray(pc.list_value_length(fo).cast(pa.int64()))
        flat = np.asarray(fo.flatten().cast(pa.int64()))
        ends = np.cumsum(counts) - 1
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_sampled": pa.array(counts),
            "last_offset": pa.array(flat[ends]),
        })

    return ds.map_batches(summarize, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_dequantize_roundtrip(sf_dir: str):
    """Quantize → dequantize reconstruction error per vector (x1e9 int).
    Every step is elementwise double arithmetic plus a max (both
    order-independent), so DuckDB replays the exact value with list
    lambdas — the oracle-checked guarantee that int8 storage loses at
    most scale/254 per component."""
    from embulk_filter_timestamp_format_ray.stages.ann import (
        dequantize_embeddings_batch,
        embeddings_to_matrix,
        quantize_embeddings_batch,
    )

    ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])

    def err(b: pa.Table) -> pa.Table:
        x = embeddings_to_matrix(b)
        q = quantize_embeddings_batch(b)
        # reconstruct in f64 (dequantize_embeddings_batch's OUTPUT column
        # is float32 by storage convention, which would perturb the error
        # at the 1e-8 level and break the exact oracle); same arithmetic
        qc = q.column("q")
        if isinstance(qc, pa.ChunkedArray):
            qc = qc.combine_chunks()
        m = np.asarray(qc.flatten().cast(pa.float64())) \
            .reshape(x.shape)
        scale = np.asarray(q.column("scale_ppm")).astype(np.float64) / 1e6
        xhat = (m / 127.0) * scale[:, None]
        e = np.abs(xhat - x).max(axis=1)
        # sanity-bind the real dequant op on the same batch (f32 path)
        dequantize_embeddings_batch(q, out_col="recon")
        return pa.table({
            "vec_id": b.column("vec_id"),
            "err_x1e9": pa.array(np.floor(e * 1e9 + 0.5)
                                 .astype(np.int64)),
        })

    return ds.map_batches(err, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_pivot_event_counts(sf_dir: str):
    """Long→wide pivot: per-user count column per event type (fixed
    category vocabulary) — one-hot indicators per batch, then the
    map-side-combined grouped aggregate.  Oracle: conditional counts."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        pivot_counts,
    )

    ev = _read(sf_dir, "events").select_columns(["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type",
                        ["click", "view", "purchase", "signup", "error"])


def q_rolling_user_value(sf_dir: str):
    """Row-based rolling window per key: for every event, the sum of the
    user's last 3 event values (x100 ints — exact in both engines).  One
    key-shard exchange; the whole shard's windows come from a cumsum and
    two gathers (stages/relational.py rolling_sum_per_key)."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        rolling_sum_per_key,
    )

    ev = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "ts", "value"])
    ev = ev.map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "value_x100": pc.cast(pc.floor(pc.add(
                pc.multiply(b.column("value"), 100.0), 0.5)), pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    out = rolling_sum_per_key(ev, "user_id", "ts", "value_x100",
                              window_rows=3, out_col="roll_x100",
                              tie_col="event_id")
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "roll_x100"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_normalize_text(sf_dir: str):
    """Corpus text normalization (lowercase → whitespace collapse → trim →
    Unicode NFC).  The corpus is already clean, so the query first injects
    deterministic mess — uppercase, tab runs, and a DECOMPOSED ``café``
    (e + U+0301) — and the oracle mirrors the injection; NFC must compose
    the accent identically on both sides."""
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        normalize_text_batch,
    )

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def mess(b: pa.Table) -> pa.Table:
        t = pc.binary_join_element_wise(
            "  ", pc.utf8_upper(pc.fill_null(b.column("text"), "")),
            "\t\tcafé  ", "")
        return pa.table({"doc_id": b.column("doc_id"), "text": t})

    ds = ds.map_batches(mess, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_heavy_hitters(sf_dir: str):
    """Count-Min sketch-then-verify heavy hitters: words with total corpus
    count ≥ 500, found without shuffling the vocabulary (the sketch cells
    shuffle; candidates verify exactly).  Output equals the naive
    GROUP BY ... HAVING oracle because CMS never undercounts."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        heavy_hitter_words,
    )

    return heavy_hitter_words(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        threshold=500)


def q_quartile_by_lang(sf_dir: str):
    """Ntile assignment: label every document with its per-language length
    quartile from the grouped histogram sketch — no sort; the edge matrix
    broadcasts once and assignment is one vectorized comparison pass.
    Oracle replays the sketch and the Σ(value >= edge) bucket rule."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        quantile_bucket_assign,
    )

    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "n_chars"])
    return quantile_bucket_assign(docs, "lang", "n_chars", n_buckets=4)


def q_sample_per_group(sf_dir: str):
    """Deterministic per-source sampling: keep 5 docs per source, chosen
    by a Lehmer-style modular permutation of doc_id (exactly replayable in
    SQL — no process-seeded hashing).  Uses the sharded per-group top-k
    (ascending) with its map-side combiner."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        top_k_by_group,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "source"])
    keyed = docs.map_batches(
        lambda b: b.append_column("h", pc.cast(
            pc.subtract(
                pc.multiply(b.column("doc_id"), 48271),
                pc.multiply(pc.divide(pc.multiply(b.column("doc_id"),
                                                  48271), 2147483647),
                            2147483647)), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    return top_k_by_group(keyed, ["source"], "h", 5, descending=False,
                          tie_col="doc_id")


def q_cdc_conv_stats(sf_dir: str):
    """Materialized-view layer: replay the CDC stream, then refresh the
    incremental per-conversation stats view (turn count + max lsn).  The
    view caches one aggregate parquet per lake partition keyed by the
    partition's committed data-file path, so a later micro-batch re-reads
    only the partitions it touched (pytest-pinned in tests/test_views.py).
    Oracle: the same argmax-LSN fixture fold, grouped by conv_id."""
    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.views import (
        IncrementalView,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        change_events,
    )

    run = uuid.uuid4().hex[:8]
    lake = os.path.join(tempfile.gettempdir(), f"graft_cdc_lake_{run}")
    pipe = CDCPipeline(lake, num_partitions=32)
    pipe.apply(change_events(20_000, seed=42, parallelism=16))
    view = IncrementalView(lake, os.path.join(
        tempfile.gettempdir(), f"graft_cdc_view_{run}"))
    view.refresh()
    return view.read()


def q_attribution_follow(sf_dir: str):
    """Temporal band join (attribution): for every click, the purchases by
    the same user within the following 10 minutes.  One key-shard
    exchange; per shard the right side sorts once and every left row's
    match window comes from a batch searchsorted over a (key-rank × time)
    composite — no per-key callbacks (see
    stages/relational.py:time_band_join).  Values round to x100 ints
    per event before summing."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
        time_band_join,
    )

    ev = _read(sf_dir, "events")
    clicks = ev.select_columns(["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("event_type"), "click"))
            .select(["event_id", "user_id", "ts"]),
            batch_format="pyarrow", zero_copy_batch=True)
    purchases = ev.select_columns(["user_id", "ts", "event_type", "value"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("event_type"), "purchase"))
            .select(["user_id", "ts", "value"]),
            batch_format="pyarrow", zero_copy_batch=True)
    pairs = time_band_join(clicks, purchases, key="user_id", ts_col="ts",
                           band_lo_us=0, band_hi_us=600_000_000,
                           right_payload=["value"])
    pairs = pairs.map_batches(
        lambda b: b.append_column("value_x100", pc.cast(pc.floor(
            pc.add(pc.multiply(b.column("value_r"), 100.0), 0.5)),
            pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(pairs, ["event_id"],
                             {"n_follow": ("value_x100", "count"),
                              "sum_value_x100": ("value_x100", "sum")})


def q_curate_corpus(sf_dir: str):
    """The end-to-end curation flagship: per-language median length filter
    (histogram sketch) → eval-suite decontamination (drop ≥20% 5-gram
    overlap; eval = doc_id % 37 == 0, excluded from train entirely) →
    exact dedup (min-id per distinct text) → 512-token sequence packing
    on the distributed prefix sum.  Every stage is SQL-replayable, so the
    whole composition has one exact DuckDB oracle."""
    from embulk_filter_timestamp_format_ray.stages.dedup import dedup_exact
    from embulk_filter_timestamp_format_ray.stages.ngrams import decontaminate
    from embulk_filter_timestamp_format_ray.stages.relational import (
        broadcast_join,
        grouped_approx_quantiles,
        pack_sequences,
    )

    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text", "lang", "n_chars"])
    med = grouped_approx_quantiles(
        _read(sf_dir, "documents").select_columns(["lang", "n_chars"]),
        "lang", "n_chars", [0.5], bins=256)
    med_tbl = pa.table({"lang": med.column("lang"),
                        "med": med.column("quantile")})
    joined = broadcast_join(docs, med_tbl, on="lang", how="inner")

    def keep_train(b: pa.Table) -> pa.Table:
        long_enough = pc.greater_equal(
            b.column("n_chars").cast(pa.float64()), b.column("med"))
        not_eval = pc.not_equal(
            pc.subtract(b.column("doc_id"),
                        pc.multiply(pc.divide(b.column("doc_id"), 37), 37)),
            0)
        return b.filter(pc.and_(long_enough, not_eval)) \
            .select(["doc_id", "text"])

    train = joined.map_batches(keep_train, batch_format="pyarrow",
                               zero_copy_batch=True)
    evals = _read(sf_dir, "documents").select_columns(["doc_id", "text"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(
                pc.subtract(b.column("doc_id"),
                            pc.multiply(pc.divide(b.column("doc_id"), 37),
                                        37)), 0)),
            batch_format="pyarrow", zero_copy_batch=True)
    clean = decontaminate(train, evals, k=5, threshold_pct=20, drop=True)
    uniq = dedup_exact(clean, id_col="doc_id", text_col="text")
    tok = _token_counts(uniq)
    return pack_sequences(tok, "doc_id", "n_tokens", seq_len=512,
                          bucket_size=100)


def q_kmeans_clusters(sf_dir: str):
    """Deterministic distributed k-means over the embedding column
    (fixed-point Lloyd iterations — integer sums are associative, so the
    distributed combine is bit-identical to the sequential fixture
    reference in scripts/make_fixtures.py)."""
    from embulk_filter_timestamp_format_ray.stages.ann import (
        kmeans_fit_predict,
    )

    ds = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    assigned, _ = kmeans_fit_predict(ds, k=10, iters=5)
    return assigned


def q_pack_sequences(sf_dir: str):
    """Training-batch sequence packing: docs concatenated in doc_id order
    and chunked into 512-token sequences; each doc's seq_id is
    tokens_before // 512.  Runs on the distributed exclusive prefix sum
    (bucket totals → driver offsets → per-bucket local cumsum), so no task
    sees the whole corpus.  The oracle is a plain window cumsum."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        pack_sequences,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ds = _token_counts(docs)
    return pack_sequences(ds, "doc_id", "n_tokens", seq_len=512,
                          bucket_size=100)


def q_range_join_windows(sf_dir: str):
    """Interval join: per campaign user (user_id % 10 == 0) a 6-hour window
    opens at their first event; every event (any user) inside a window
    joins it.  Uses the granule-shuffle tier (the 100-TB shape: intervals
    replicate to hour granules, one groupby co-locates events with exactly
    the intervals that can contain them), then aggregates per window.
    Values are per-event rounded to x100 ints BEFORE summing so the sum is
    order-independent on both sides."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        grouped_aggregate,
        range_join,
    )

    ev = _read(sf_dir, "events").select_columns(["user_id", "ts", "value"])
    camp = ev.map_batches(
        lambda b: b.filter(pc.equal(
            pc.subtract(b.column("user_id"),
                        pc.multiply(pc.divide(b.column("user_id"), 10), 10)),
            0)),
        batch_format="pyarrow", zero_copy_batch=True)
    firsts = grouped_aggregate(camp, ["user_id"],
                               {"s": ("ts", "min")}).to_pandas()
    s_us = firsts["s"].astype("datetime64[us]").astype("int64").to_numpy()
    intervals = pa.table({
        "window_id": pa.array(firsts["user_id"].to_numpy(), pa.int64()),
        "start": pa.array(s_us, pa.int64()),
        "end": pa.array(s_us + 6 * 3_600_000_000, pa.int64()),
    })
    joined = range_join(ev, intervals, ts_col="ts",
                        granule_us=3_600_000_000)
    joined = joined.map_batches(
        lambda b: b.append_column("value_x100", pc.cast(pc.floor(
            pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(joined, ["window_id"],
                             {"n_events": ("value_x100", "count"),
                              "sum_value_x100": ("value_x100", "sum")})


def q_tfidf_top_terms(sf_dir: str):
    """Top-3 characteristic terms per document by the integer-exact tf/df
    score (rarity-weighted frequency; see stages/ngrams.py on why the
    ranking avoids float log-idf).  One vocabulary-sized DF shuffle, DF
    broadcast back, per-doc ranking inside map_batches."""
    from embulk_filter_timestamp_format_ray.stages.ngrams import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        top_k=3)


# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship smoke pipeline at sf0.001: full CDC replay to a temp lake.
    Returns a pandas DataFrame (the entry() contract excludes pa.Table)."""
    return q_cdc_transcripts_final("/root/testdata/sf0.001").to_pandas()


def queries() -> "dict[str, Callable[[str], Any]]":
    return {
        "ts_format_string": q_ts_format_string,
        "ts_to_epoch_ms": q_ts_to_epoch_ms,
        "ts_unit_ms_to_sec": q_ts_unit_ms_to_sec,
        "ts_parse_roundtrip": q_ts_parse_roundtrip,
        "ts_unit_us_to_ns": q_ts_unit_us_to_ns,
        "ts_json_path": q_ts_json_path,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "shuffle_join_revenue": q_shuffle_join_revenue,
        "cdc_upsert_latest": q_cdc_upsert_latest,
        "cdc_scd2": q_cdc_scd2,
        "profile_events": q_profile_events,
        "quality_report": q_quality_report,
        "temporal_dim_join": q_temporal_dim_join,
        "pagerank_interactions": q_pagerank_interactions,
        "bm25_search": q_bm25_search,
        "bm25_search_indexed": q_bm25_search_indexed,
        "hybrid_retrieve": q_hybrid_retrieve,
        "hybrid_retrieve_indexed": q_hybrid_retrieve_indexed,
        "cdc_transcripts_final": q_cdc_transcripts_final,
        "cdc_time_travel": q_cdc_time_travel,
        "cdc_changefeed": q_cdc_changefeed,
        "cdc_scd2_lake": q_cdc_scd2_lake,
        "cdc_text_rank": q_cdc_text_rank,
        "cdc_dlq": q_cdc_dlq,
        "cdc_constraints": q_cdc_constraints,
        "cdc_retention": q_cdc_retention,
        "cdc_retention_dv": q_cdc_retention_dv,
        "cdc_pruned_read": q_cdc_pruned_read,
        "cdc_clustered_read": q_cdc_clustered_read,
        "cdc_zorder_read": q_cdc_zorder_read,
        "cdc_aggregate_pushdown": q_cdc_aggregate_pushdown,
        "cdc_text_search": q_cdc_text_search,
        "cdc_vector_search": q_cdc_vector_search,
        "cdc_vector_search_quantized": q_cdc_vector_search_quantized,
        "cdc_vector_search_filtered": q_cdc_vector_search_filtered,
        "cdc_rag_retrieve": q_cdc_rag_retrieve,
        "cdc_count": q_cdc_count,
        "cdc_enriched": q_cdc_enriched,
        "cdc_heal": q_cdc_heal,
        "cdc_tail": q_cdc_tail,
        "cdc_bootstrap": q_cdc_bootstrap,
        "cdc_merge_on_read": q_cdc_merge_on_read,
        "cdc_delta_commits": q_cdc_delta_commits,
        "cdc_patch_upserts": q_cdc_patch_upserts,
        "cdc_rollback": q_cdc_rollback,
        "cdc_schema_evolution": q_cdc_schema_evolution,
        "cdc_backfill": q_cdc_backfill,
        "cdc_clone": q_cdc_clone,
        "cdc_multi_table": q_cdc_multi_table,
        "cdc_transcripts_view": q_cdc_transcripts_view,
        "cdc_conv_erasure": q_cdc_conv_erasure,
        "cdc_sync": q_cdc_sync,
        "cdc_sync_mirror": q_cdc_sync_mirror,
        "cdc_incremental_view": q_cdc_incremental_view,
        "cdc_repartition": q_cdc_repartition,
        "assemble_transcripts": q_assemble_transcripts,
        "agg_q1": q_agg_q1,
        "rollup_sales": q_rollup_sales,
        "cube_sales": q_cube_sales,
        "asof_join": q_asof_join,
        "tumbling_window": q_tumbling_window,
        "sliding_window": q_sliding_window,
        "sample_mod": q_sample_mod,
        "top_p_sources": q_top_p_sources,
        "event_rank": q_event_rank,
        "event_gaps": q_event_gaps,
        "stratified_sample": q_stratified_sample,
        "mix_corpora": q_mix_corpora,
        "sessionize": q_sessionize,
        "semi_join_orders": q_semi_join_orders,
        "anti_join_orders": q_anti_join_orders,
        "shuffle_semi_orders": q_shuffle_semi_orders,
        "shuffle_anti_orders": q_shuffle_anti_orders,
        "explode_words": q_explode_words,
        "chunk_documents": q_chunk_documents,
        "transcripts_to_training": q_transcripts_to_training,
        "cdc_point_lookup": q_cdc_point_lookup,
        "cdc_point_lookup_clustered": q_cdc_point_lookup_clustered,
        "distinct_event_types": q_distinct_event_types,
        "topk_docs_per_source": q_topk_docs_per_source,
        "corpus_prep": q_corpus_prep,
        "token_count": q_token_count,
        "text_quality_counts": q_text_quality_counts,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "word_jaccard_pairs": q_word_jaccard_pairs,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_incremental": q_dedup_incremental,
        "dedup_near_corpus": q_dedup_near_corpus,
        "dedup_simhash": q_dedup_simhash,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_quantized": q_ann_ivf_quantized,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_decode_png": q_multimodal_decode_png,
        "multimodal_decode_wav": q_multimodal_decode_wav,
        "multimodal_decode_y4m": q_multimodal_decode_y4m,
        "multimodal_embed_ann": q_multimodal_embed_ann,
        "hll_distinct": q_hll_distinct,
        "distinct_users_by_type": q_distinct_users_by_type,
        "hll_grouped": q_hll_grouped,
        "remove_boilerplate": q_remove_boilerplate,
        "bloom_join_revenue": q_bloom_join_revenue,
        "set_intersect": q_set_intersect,
        "set_except": q_set_except,
        "approx_quantiles": q_approx_quantiles,
        "grouped_quantiles": q_grouped_quantiles,
        "redact_pii": q_redact_pii,
        "top_words": q_top_words,
        "quality_filter_median": q_quality_filter_median,
        "repetition_stats": q_repetition_stats,
        "decontaminate": q_decontaminate,
        "tfidf_top_terms": q_tfidf_top_terms,
        "range_join_windows": q_range_join_windows,
        "pack_sequences": q_pack_sequences,
        "kmeans_clusters": q_kmeans_clusters,
        "curate_corpus": q_curate_corpus,
        "attribution_follow": q_attribution_follow,
        "cdc_conv_stats": q_cdc_conv_stats,
        "quartile_by_lang": q_quartile_by_lang,
        "sample_per_group": q_sample_per_group,
        "heavy_hitters": q_heavy_hitters,
        "normalize_text": q_normalize_text,
        "pivot_event_counts": q_pivot_event_counts,
        "rolling_user_value": q_rolling_user_value,
        "quantize_embeddings": q_quantize_embeddings,
        "dequantize_roundtrip": q_dequantize_roundtrip,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "materialize_sequences": q_materialize_sequences,
        "corpus_report": q_corpus_report,
        "source_overlap": q_source_overlap,
        "dataset_split": q_dataset_split,
    }


_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _redact_pii_sql() -> str:
    from embulk_filter_timestamp_format_ray.stages.text_stats import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
        PII_SSN_RE,
    )

    return (
        "with injected as (select doc_id, coalesce(text, '') || "
        "' contact user' || cast(doc_id as varchar) || "
        "'@example.com or +1555000' || cast(doc_id as varchar) || "
        "' ssn 123-45-6789' as text from documents), "
        "red as (select doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g'), "
        f"'{PII_SSN_RE}', '<SSN>', 'g') as text from injected) "
        "select doc_id, text, "
        "len(regexp_extract_all(text, '<EMAIL>|<PHONE>|<SSN>'))::bigint "
        "as n_redactions from red")


_REDACT_PII_SQL = _redact_pii_sql()

_BPE_RE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_STOP_RE_SQL = (
    r"(?i)\b(the|of|and|a|to|in|is|it|you|that|he|was|for|on|are|as|with|his|"
    r"they|i|at|be|this|have|from|or|had|by|not|word|but|what|some|we|can|out|"
    r"other|were|all|there|when|up|use|your|how|said|an|each|she)\b"
)


def oracle_sql() -> "dict[str, str]":
    return {
        "ts_format_string":
            "select event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') as ts_str "
            "from events",
        "ts_to_epoch_ms":
            "select event_id, epoch_ms(ts) as ts_ms from events",
        "ts_unit_ms_to_sec":
            "select event_id, epoch_ms(ts) // 1000 as ts_sec from events",
        "ts_parse_roundtrip":
            "select event_id, epoch_us(ts) as ts_us from events",
        "ts_unit_us_to_ns":
            "select event_id, epoch_us(ts) * 1000 as ts_ns from events",
        "join_revenue_by_nation":
            "select n_name, floor(sum(o_totalprice) * 100 + 0.5) / 100 as revenue, "
            "count(*) as n_orders from orders "
            "join customer on o_custkey = c_custkey "
            "join nation on c_nationkey = n_nationkey group by n_name",
        "ts_json_path":
            "select event_id, '{\"t\":' || epoch_ms(ts)::varchar || '}' as doc "
            "from events",
        "shuffle_join_revenue":
            "select o_orderpriority, "
            "floor(sum(l_extendedprice) * 100 + 0.5) / 100 as revenue, "
            "count(*) as n_items from lineitem "
            "join orders on l_orderkey = o_orderkey group by o_orderpriority",
        "cdc_upsert_latest":
            "with ranked as (select user_id, event_type, event_id, value, "
            "row_number() over (partition by user_id, event_type "
            "order by event_id desc) as rn from events) "
            "select user_id, event_type, event_id as lsn, value "
            "from ranked where rn = 1 and value >= 1.0",
        # SCD2: LEAD over ALL events (deletes close their predecessor's
        # interval), delete rows themselves emit no version
        "cdc_scd2":
            "with w as (select user_id, event_type, event_id, value, "
            "lead(event_id) over (partition by user_id, event_type "
            "order by event_id) as valid_to from events) "
            "select user_id, event_type, event_id as valid_from, valid_to, "
            "(valid_to is null) as is_current, "
            "cast(floor(value * 100 + 0.5) as bigint) as value_cents "
            "from w where value >= 1.0",
        # Data profile: one UNION ALL branch per profiled column; floats
        # pre-scaled to integer cents so CAST(...AS VARCHAR) is exact
        "profile_events":
            "with t as (select event_id, user_id, event_type, "
            "cast(floor(value * 100 + 0.5) as bigint) as value_cents "
            "from events) "
            + " union all ".join(
                f"select '{c}' as column_name, count(*) as n_rows, "
                f"count(*) - count({c}) as n_nulls, "
                f"cast(min({c}) as varchar) as min_str, "
                f"cast(max({c}) as varchar) as max_str, "
                f"count(distinct {c}) as n_distinct from t"
                for c in ("event_id", "user_id", "event_type", "value_cents")),
        # Offline expectations report: SQL CHECK semantics (NULL passes
        # value rules; not_null counts nulls; matches = re.search)
        "quality_report":
            "with s as (select count(*)::bigint as n, "
            "(count(*) - count(user_id))::bigint as v_notnull, "
            "count(*) filter (where event_type is not null and "
            "event_type not in ('click', 'view'))::bigint as v_inset, "
            "count(*) filter (where value is not null and "
            "value < 0.5)::bigint as v_between, "
            "count(*) filter (where event_type is not null and "
            "not regexp_matches(event_type, '^[a-z]+$'))::bigint "
            "as v_matches from events) "
            "select 'user_id_not_null' as constraint_name, "
            "'user_id' as column_name, 'not_null' as kind, n as n_rows, "
            "v_notnull as n_violations, v_notnull = 0 as passed from s "
            "union all select 'event_type_in_set', 'event_type', "
            "'in_set', n, v_inset, v_inset = 0 from s "
            "union all select 'value_between', 'value', 'between', n, "
            "v_between, v_between = 0 from s "
            "union all select 'event_type_matches', 'event_type', "
            "'matches', n, v_matches, v_matches = 0 from s",
        # Point-in-time join: dimension = SCD2 over even events, facts =
        # odd events; each fact joins the ≤1 interval containing its lsn
        "temporal_dim_join":
            "with ev as (select event_id, user_id, event_type, value "
            "from events), "
            "w as (select user_id, event_type, event_id, value, "
            "lead(event_id) over (partition by user_id, event_type "
            "order by event_id) as valid_to from ev "
            "where event_id % 2 = 0), "
            "hist as (select user_id, event_type, event_id as valid_from, "
            "valid_to, cast(floor(value * 100 + 0.5) as bigint) "
            "as value_cents from w where value >= 1.0), "
            "facts as (select event_id, user_id, event_type from ev "
            "where event_id % 2 = 1) "
            "select f.event_id, f.user_id, f.event_type, "
            "h.value_cents as value_cents_dim, "
            "h.valid_from as valid_from_dim "
            "from facts f left join hist h on f.user_id = h.user_id "
            "and f.event_type = h.event_type "
            "and h.valid_from <= f.event_id "
            "and (h.valid_to is null or f.event_id < h.valid_to)",
        # PageRank, 3 supersteps unrolled (integer-exact floors both sides)
        "pagerank_interactions": _pagerank_sql(3),
        # BM25 (integer-exact: un-logged idf ratio + fraction-cleared
        # k1=1.2/b=0.75 saturation — stages/ngrams.py bm25_topk docstring)
        "bm25_search": _BM25_ORACLE_CTES +
            "select doc_id, score, row_number() over "
            "(order by score desc, doc_id) as rank from sc "
            "qualify rank <= 10",
        # the postings-index path is an access path, not a semantics
        # change — same oracle as bm25_search
        "bm25_search_indexed": _BM25_ORACLE_CTES +
            "select doc_id, score, row_number() over "
            "(order by score desc, doc_id) as rank from sc "
            "qualify rank <= 10",
        # Hybrid RRF: sparse top-50 ∪ dense cosine top-50 (query vec_id 0),
        # integer reciprocal-rank fusion, top-10
        "hybrid_retrieve": _HYBRID_ORACLE,
        # both legs indexed (postings shards + IVF nprobe=all) — access
        # paths only, so the oracle is IDENTICAL
        "hybrid_retrieve_indexed": _HYBRID_ORACLE,
        # Flagship: the deterministic seed=42 binlog is committed as a fixture
        # (scripts/make_fixtures.py); final lake state == argmax-LSN fold with
        # delete-wins + epoch-2 role renames.  Valid at the driver's sf0.01
        # scale (the stream is sf-independent).
        "cdc_transcripts_final":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Time travel: lake VERSION AS OF commit 1 == the same fold over the
        # lsn<10000 prefix (chunk 1 of the two-chunk apply in the query)
        "cdc_time_travel":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet') "
            "where lsn < 10000) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # CDF replay: diff of the two prefix folds; a key present in one
        # fold only is an insert/delete, differing lsn is an update, equal
        # lsn (rewrite survivor) emits nothing
        "cdc_changefeed":
            "with ev as (select * from "
            f"read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "r1 as (select *, row_number() over (partition by conv_id, "
            "turn_idx order by lsn desc) as rn from ev where lsn < 10000), "
            "f1 as (select conv_id, turn_idx, lsn from r1 "
            "where rn = 1 and op <> 'delete'), "
            "r2 as (select *, row_number() over (partition by conv_id, "
            "turn_idx order by lsn desc) as rn from ev), "
            "f2 as (select conv_id, turn_idx, lsn from r2 "
            "where rn = 1 and op <> 'delete') "
            "select coalesce(f2.conv_id, f1.conv_id) as conv_id, "
            "coalesce(f2.turn_idx, f1.turn_idx) as turn_idx, "
            "case when f1.lsn is null then 'insert' "
            "when f2.lsn is null then 'delete' else 'update' end "
            "as change_type, "
            "coalesce(f2.lsn, f1.lsn) as lsn "
            "from f1 full outer join f2 on f1.conv_id = f2.conv_id "
            "and f1.turn_idx = f2.turn_idx "
            "where f1.lsn is null or f2.lsn is null or f1.lsn <> f2.lsn",
        # Lake SCD2 at version granularity: seed fold (version 1) ∪ the two
        # FULL-OUTER state diffs (versions 2, 3), LEAD window closes each
        # interval at the key's next change, deletes emit no version row
        "cdc_scd2_lake":
            "with ev as (select * from "
            f"read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "f1 as (select conv_id, turn_idx, lsn from (select *, "
            "row_number() over (partition by conv_id, turn_idx "
            "order by lsn desc) as rn from ev where lsn < 10000) "
            "where rn = 1 and op <> 'delete'), "
            "f2 as (select conv_id, turn_idx, lsn from (select *, "
            "row_number() over (partition by conv_id, turn_idx "
            "order by lsn desc) as rn from ev where lsn < 15000) "
            "where rn = 1 and op <> 'delete'), "
            "f3 as (select conv_id, turn_idx, lsn from (select *, "
            "row_number() over (partition by conv_id, turn_idx "
            "order by lsn desc) as rn from ev) "
            "where rn = 1 and op <> 'delete'), "
            "seed as (select conv_id, turn_idx, lsn, "
            "'insert' as change_type, 1::bigint as version from f1), "
            "d12 as (select coalesce(a.conv_id, b.conv_id) as conv_id, "
            "coalesce(a.turn_idx, b.turn_idx) as turn_idx, "
            "coalesce(b.lsn, a.lsn) as lsn, "
            "case when a.lsn is null then 'insert' "
            "when b.lsn is null then 'delete' else 'update' end "
            "as change_type, 2::bigint as version "
            "from f1 a full outer join f2 b on a.conv_id = b.conv_id "
            "and a.turn_idx = b.turn_idx "
            "where a.lsn is null or b.lsn is null or a.lsn <> b.lsn), "
            "d23 as (select coalesce(a.conv_id, b.conv_id) as conv_id, "
            "coalesce(a.turn_idx, b.turn_idx) as turn_idx, "
            "coalesce(b.lsn, a.lsn) as lsn, "
            "case when a.lsn is null then 'insert' "
            "when b.lsn is null then 'delete' else 'update' end "
            "as change_type, 3::bigint as version "
            "from f2 a full outer join f3 b on a.conv_id = b.conv_id "
            "and a.turn_idx = b.turn_idx "
            "where a.lsn is null or b.lsn is null or a.lsn <> b.lsn), "
            "evs as (select * from seed union all select * from d12 "
            "union all select * from d23), "
            "w as (select *, lead(version) over (partition by conv_id, "
            "turn_idx order by version) as valid_to_version from evs) "
            "select conv_id, turn_idx, lsn, version as valid_from_version, "
            "valid_to_version, (valid_to_version is null) as is_current "
            "from w where change_type <> 'delete'",
        # Ranked search over the lake: flagship argmax-LSN fold as the
        # corpus (doc id = surviving lsn), then the shared BM25 chain
        "cdc_text_rank": _bm25_ctes(
            "select lsn, text from (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "where rn = 1 and op <> 'delete'",
            "lsn", _CDC_RANK_TERMS) +
            "select lsn, score, row_number() over "
            "(order by score desc, lsn) as rank from sc "
            "qualify rank <= 10",
        # DLQ: replay changegen.poison_batch's pure-function-of-lsn band rule
        # over the committed fixture; DISTINCT collapses the at-least-once
        # replay duplicates on both sides
        "cdc_dlq":
            "select distinct lsn, conv_id, turn_idx, "
            "case when (lsn & 1023) < 10 then 'invalid_envelope' "
            "else 'unparseable_ts' end as dlq_reason "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet') "
            "where (lsn & 1023) < 20",
        # Commit-time expectations, drop tier: the flagship fold over the
        # stream minus tool-role upserts (the committed in_set constraint
        # checks POST-rename roles; deletes are payload-free and exempt)
        "cdc_constraints":
            "with ev as (select lsn, op, conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "kept as (select * from ev where op <> 'upsert' "
            "or role in ('user', 'assistant', 'system')), "
            "ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            "from kept) "
            "select conv_id, turn_idx, role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Ingest enrichment: the dimension is a pure function of role, so
        # the fold + a CASE over the renamed role replays the broadcast
        # join (delete winners are excluded before channel matters)
        "cdc_enriched":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "renamed as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete') "
            "select conv_id, turn_idx, role, "
            "case when role = 'user' then 'web' "
            "when role = 'assistant' then 'model' "
            "else 'platform' end as channel, text, tool, lsn from renamed",
        # DELETE WHERE turn_idx >= 30 on folded state: the flagship fold
        # restricted to surviving turn indexes (turn_idx is part of the
        # merge key, so pre- vs post-fold filtering is equivalent)
        "cdc_retention":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete' and turn_idx < 30",
        # Deletion-vector tier: identical semantics to the rewrite-mode
        # retention sweep (the dv is a read-time subtraction, not a new
        # state) — the lake is read with the vectors still pending
        "cdc_retention_dv":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete' and turn_idx < 30",
        # Predicate-pushdown read: the flagship fold post-filtered by the
        # AND'd where specs, projected to the 4 requested columns (the
        # footer-stats skip is a pure optimization — same rows)
        "cdc_pruned_read":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, lsn "
            "from ranked where rn = 1 and op <> 'delete') "
            "select conv_id, turn_idx, role, lsn from folded "
            "where turn_idx between 5 and 40 "
            "and role in ('user', 'assistant')",
        # Clustered zone-map read: the flagship fold restricted to a ts
        # band; the binlog's ts_raw needs the epoch-aware parse (epoch 0
        # = epoch-ms digits; epochs 1/2 = rendered strings, first 6
        # fractional digits suffice at whole-second bounds)
        "cdc_clustered_read":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, lsn, "
            "case when schema_epoch = 0 then "
            "epoch_ms(cast(ts_raw as bigint)) "
            "else strptime(substr(ts_raw, 1, 26), "
            "'%Y-%m-%d %H:%M:%S.%f') end as ts "
            "from ranked where rn = 1 and op <> 'delete') "
            "select conv_id, turn_idx, role, lsn from folded "
            "where ts between timestamp '2024-01-01 02:12:56' "
            "and timestamp '2024-01-01 03:19:24'",
        # Z-order zone-map read: the flagship fold restricted to a band
        # on the NON-PREFIX clustered column (the layout — lex or zorder
        # — is a pure optimization; same rows either way)
        "cdc_zorder_read":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, lsn "
            "from ranked where rn = 1 and op <> 'delete' "
            "and turn_idx between 10 and 14",
        # Token search: the flagship fold filtered by exact split-on-space
        # token membership (the sidecar skip index is a pure optimization
        # — same rows); NULL text never matches
        "cdc_text_search":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, lsn "
            "from ranked where rn = 1 and op <> 'delete') "
            "select conv_id, turn_idx, role, text, lsn from folded "
            "where coalesce(list_contains(string_split(text, ' '), "
            "'merge'), false)",
        # Vector search: brute-force cosine top-k over the folded live
        # state (the IVF layout, change-feed refresh and tombstones are
        # pure optimizations — nprobe=all makes the probe exact); query
        # vectors inlined as full-precision double literals
        "cdc_vector_search":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_vec_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, embedding "
            "from ranked where rn = 1 and op <> 'delete'), "
            "q(query_id, qe) as (values " + ", ".join(
                f"(cast({i} as bigint), [{', '.join(repr(float(x)) for x in row)}]"
                "::double[])"
                for i, row in enumerate(_vec_search_queries())) + "), "
            "scored as (select q.query_id, f.conv_id, f.turn_idx, "
            "row_number() over (partition by q.query_id order by "
            "list_cosine_similarity(q.qe, f.embedding) desc, "
            "f.conv_id, f.turn_idx) as rank from q cross join folded f) "
            "select query_id, conv_id, turn_idx, rank from scored "
            "where rank <= 10",
        # RAG retrieval: top-5 keys by cosine per query, joined back to
        # the folded live payload (role normalized like every lake read)
        "cdc_rag_retrieve":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_vec_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, embedding "
            "from ranked where rn = 1 and op <> 'delete'), "
            "q(query_id, qe) as (values " + ", ".join(
                f"(cast({i} as bigint), [{', '.join(repr(float(x)) for x in row)}]"
                "::double[])"
                for i, row in enumerate(_vec_search_queries())) + "), "
            "scored as (select q.query_id, f.conv_id, f.turn_idx, f.role, "
            "f.text, row_number() over (partition by q.query_id order by "
            "list_cosine_similarity(q.qe, f.embedding) desc, "
            "f.conv_id, f.turn_idx) as rank from q cross join folded f) "
            "select query_id, rank, conv_id, turn_idx, role, text "
            "from scored where rank <= 5",
        # Filtered vector search: the same fold restricted to the payload
        # predicate BEFORE ranking (filter-then-top-k, the vector-DB
        # metadata-predicate semantics); the stored payload column is a
        # pure optimization — same rows as filtering the lake
        "cdc_vector_search_filtered":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_vec_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, embedding "
            "from ranked where rn = 1 and op <> 'delete' "
            "and (case role when 'human' then 'user' "
            "when 'ai' then 'assistant' else role end) = 'assistant'), "
            "q(query_id, qe) as (values " + ", ".join(
                f"(cast({i} as bigint), [{', '.join(repr(float(x)) for x in row)}]"
                "::double[])"
                for i, row in enumerate(_vec_search_queries())) + "), "
            "scored as (select q.query_id, f.conv_id, f.turn_idx, "
            "row_number() over (partition by q.query_id order by "
            "list_cosine_similarity(q.qe, f.embedding) desc, "
            "f.conv_id, f.turn_idx) as rank from q cross join folded f) "
            "select query_id, conv_id, turn_idx, rank from scored "
            "where rank <= 10",
        # Quantized vector search: the same fold, then DuckDB replays the
        # int8 round trip bit-for-bit (same IEEE double ops as
        # _to_quantized_batch / dequantize_embeddings_batch, incl. the
        # per-component float32 cast) and ranks over the DEQUANTIZED
        # corpus; queries stay un-quantized, exactly like the Ray path
        "cdc_vector_search_quantized":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_vec_events_20000.parquet')), "
            "folded as (select conv_id, turn_idx, embedding "
            "from ranked where rn = 1 and op <> 'delete'), "
            "s as (select conv_id, turn_idx, embedding, "
            "list_max(list_transform(embedding, x -> abs(x))) as ma "
            "from folded), "
            "d as (select conv_id, turn_idx, "
            "list_transform(generate_series(1, len(embedding)), i -> "
            "((greatest(least(floor(127 * embedding[i] / (case when ma = 0 "
            "then 1 else ma end) + 0.5), 127), -127) / 127.0) * "
            "(floor(ma * 1000000 + 0.5) / 1000000.0))::float) as emb "
            "from s), "
            "q(query_id, qe) as (values " + ", ".join(
                f"(cast({i} as bigint), [{', '.join(repr(float(x)) for x in row)}]"
                "::double[])"
                for i, row in enumerate(_vec_search_queries())) + "), "
            "scored as (select q.query_id, d.conv_id, d.turn_idx, "
            "row_number() over (partition by q.query_id order by "
            "list_cosine_similarity(q.qe, list_transform(d.emb, "
            "x -> x::double)) desc, d.conv_id, d.turn_idx) as rank "
            "from q cross join d) "
            "select query_id, conv_id, turn_idx, rank from scored "
            "where rank <= 10",
        # MIN/MAX/SUM/COUNT pushdown: SQL aggregates over the flagship
        # fold (column pruning / footer skipping are pure optimizations);
        # duckdb SUM(bigint) is hugeint — cast back to match the int64
        "cdc_aggregate_pushdown":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "folded as (select turn_idx, lsn "
            "from ranked where rn = 1 and op <> 'delete') "
            "select count(*) as n_total, "
            "cast(min(turn_idx) as bigint) as min_turn, "
            "cast(max(turn_idx) as bigint) as max_turn, "
            "cast(sum(lsn) as bigint) as sum_lsn, "
            "count(*) filter (where turn_idx between 5 and 40) as n_band, "
            "cast(sum(lsn) filter (where turn_idx between 5 and 40) "
            "as bigint) as band_sum_lsn "
            "from folded",
        # COUNT(*) pushdown: both counts over the flagship fold (the
        # manifest/metadata shortcut is a pure optimization — same rows)
        "cdc_count":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "folded as (select turn_idx "
            "from ranked where rn = 1 and op <> 'delete') "
            "select count(*) as n_total, "
            "count(*) filter (where turn_idx between 5 and 40) as n_band "
            "from folded",
        # Self-heal: the two unhealable poison bands (lsn&1023 < 20) stay
        # quarantined; everything else — including the healed epoch-7 band
        # (20–29) — lands in the lake, so the fold simply excludes band<20
        "cdc_heal":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet') "
            "where (lsn & 1023) >= 20) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Tailer delivery ≡ direct apply: same flagship fold
        "cdc_tail":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Committed prefix + uncommitted overlay ≡ full fold (the view
        # reuses the commit path's own merge operators)
        "cdc_merge_on_read":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Downstream sync: the shipped change set ≡ CDF between the two
        # prefix folds, text carried CDF-style (post-image; pre-image on
        # deletes)
        "cdc_sync":
            "with ev as (select * from "
            f"read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "r1 as (select *, row_number() over (partition by conv_id, "
            "turn_idx order by lsn desc) as rn from ev where lsn < 10000), "
            "f1 as (select conv_id, turn_idx, lsn, text from r1 "
            "where rn = 1 and op <> 'delete'), "
            "r2 as (select *, row_number() over (partition by conv_id, "
            "turn_idx order by lsn desc) as rn from ev), "
            "f2 as (select conv_id, turn_idx, lsn, text from r2 "
            "where rn = 1 and op <> 'delete') "
            "select coalesce(f2.conv_id, f1.conv_id) as conv_id, "
            "coalesce(f2.turn_idx, f1.turn_idx) as turn_idx, "
            "case when f1.lsn is null then 'insert' "
            "when f2.lsn is null then 'delete' else 'update' end "
            "as change_type, "
            "coalesce(f2.lsn, f1.lsn) as lsn, "
            "case when f2.lsn is null then f1.text else f2.text end as text "
            "from f1 full outer join f2 on f1.conv_id = f2.conv_id "
            "and f1.turn_idx = f2.turn_idx "
            "where f1.lsn is null or f2.lsn is null or f1.lsn <> f2.lsn",
        # Re-sharding (with a pending delta backlog folded in) preserves
        # live state exactly ≡ flagship fold
        "cdc_repartition":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Incremental view partials fold to per-conversation stats of the
        # flagship fold (n_turns = surviving turn count, max_lsn)
        "cdc_incremental_view":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "final as (select conv_id, lsn from ranked "
            "where rn = 1 and op <> 'delete') "
            "select conv_id, count(*)::bigint as n_turns, "
            "max(lsn) as max_lsn from final group by conv_id",
        # Consumer fold of the sync dirs ≡ live state ≡ flagship fold
        "cdc_sync_mirror":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Delta commits + compaction + pending fold ≡ full fold (DeltaWriter,
        # compact_deltas and the MOR read all reuse keep_last_per_key)
        "cdc_delta_commits":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Rollback: bad commit undone (restore v1 metadata + watermarks),
        # clean suffix re-applied ⇒ final state == the clean full fold
        "cdc_rollback":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Schema evolution: the lsn>=10000 chunk carries an extra `lang`
        # column (lsn%3 → en/fr/de); winners below the boundary read NULL
        "cdc_schema_evolution":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn, "
            "case when lsn >= 10000 then (case lsn % 3 when 0 then 'en' "
            "when 1 then 'fr' else 'de' end) end as lang "
            "from ranked where rn = 1 and op <> 'delete'",
        # Incremental transcript view: same fold as assemble_transcripts
        "cdc_transcripts_view":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "final as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text "
            "from ranked where rn = 1 and op <> 'delete') "
            "select conv_id, count(*)::bigint as n_turns, "
            "string_agg(coalesce(role, '') || ': ' || coalesce(text, ''), "
            "chr(10) order by turn_idx) as transcript "
            "from final group by conv_id",
        # Multi-table fan-out: per-table state is the flagship fold
        # restricted by the conv-parity routing rule
        "cdc_multi_table":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn, "
            "case when cast(substr(conv_id, 6) as int) % 2 = 0 "
            "then 'a' else 'b' end as tbl "
            "from ranked where rn = 1 and op <> 'delete'",
        # Clone-as-fork: prefix to the source, suffix to the clone — the
        # clone's state is the full-stream fold (same as the flagship)
        "cdc_clone":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Backfill: the evolution fold, then the transform's fill+derive
        # replayed in SQL (coalesce for the NULL fill, length() for the
        # introduced column)
        "cdc_backfill":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn, "
            "coalesce(case when lsn >= 10000 then (case lsn % 3 "
            "when 0 then 'en' when 1 then 'fr' else 'de' end) end, 'und') "
            "as lang, "
            "cast(length(text) as bigint) as text_len "
            "from ranked where rn = 1 and op <> 'delete'",
        # Conversation erasure: per-conv max delete_conv lsn is one more
        # delete horizon (greatest with the per-key delete horizon); the
        # fold keeps only upserts strictly above it.  Keys re-created after
        # the erasure (upsert lsn > horizon) survive.
        "cdc_conv_erasure":
            "with e as (select * from "
            f"read_parquet('{_FIXTURES}/cdc_convdel_events_20000.parquet')), "
            "cd as (select conv_id, max(lsn) as cdl from e "
            "where op = 'delete_conv' group by conv_id), "
            "h as (select e.conv_id, e.turn_idx, greatest("
            "coalesce(max(e.lsn) filter (where e.op = 'delete'), -1), "
            "coalesce(any_value(cd.cdl), -1)) as hz "
            "from e left join cd using (conv_id) "
            "where e.op <> 'delete_conv' group by e.conv_id, e.turn_idx), "
            "f as (select e.* from e join h using (conv_id, turn_idx) "
            "where e.op = 'upsert' and e.lsn > h.hz), "
            "ranked as (select *, row_number() over (partition by conv_id, "
            "turn_idx order by lsn desc) as rn from f) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1",
        # Partial-column updates: replay fold_patch_runs' rule in SQL —
        # delete horizon per key (dl), then per-column argmax-lsn among
        # SETTERS (upserts always; patches where the column is non-NULL),
        # value fetched by joining back on the setter lsn (lsns are unique
        # in the replay-free fixture).  A key whose max lsn is a delete has
        # no rows above dl and vanishes; a patch above dl resurrects.
        "cdc_patch_upserts":
            "with e as (select * from "
            f"read_parquet('{_FIXTURES}/cdc_patch_events_20000.parquet')), "
            "d as (select conv_id, turn_idx, "
            "coalesce(max(lsn) filter (where op = 'delete'), -1) as dl "
            "from e group by conv_id, turn_idx), "
            "f as (select e.* from e join d using (conv_id, turn_idx) "
            "where e.lsn > d.dl and e.op <> 'delete'), "
            "s as (select conv_id, turn_idx, max(lsn) as lsn, "
            "max(lsn) filter (where op = 'upsert' or role is not null) "
            "as s_role, "
            "max(lsn) filter (where op = 'upsert' or text is not null) "
            "as s_text, "
            "max(lsn) filter (where op = 'upsert' or tool is not null) "
            "as s_tool "
            "from f group by conv_id, turn_idx) "
            "select s.conv_id, s.turn_idx, "
            "case er.role when 'human' then 'user' when 'ai' then "
            "'assistant' else er.role end as role, et.text, eo.tool, s.lsn "
            "from s "
            "left join e er on er.conv_id = s.conv_id and "
            "er.turn_idx = s.turn_idx and er.lsn = s.s_role "
            "left join e et on et.conv_id = s.conv_id and "
            "et.turn_idx = s.turn_idx and et.lsn = s.s_text "
            "left join e eo on eo.conv_id = s.conv_id and "
            "eo.turn_idx = s.turn_idx and eo.lsn = s.s_tool",
        # Bootstrap+suffix ≡ full fold, minus lsn (snapshot rows carry the
        # snapshot position, legitimately differing from their source lsn)
        "cdc_bootstrap":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')) "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool "
            "from ranked where rn = 1 and op <> 'delete'",
        "assemble_transcripts":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "final as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text "
            "from ranked where rn = 1 and op <> 'delete') "
            "select conv_id, count(*)::bigint as n_turns, "
            "string_agg(coalesce(role, '') || ': ' || coalesce(text, ''), "
            "chr(10) order by turn_idx) as transcript "
            "from final group by conv_id",
        "agg_q1":
            "select l_returnflag, l_linestatus, "
            "floor(sum(l_quantity) * 100 + 0.5) / 100 as sum_qty, "
            "floor(sum(l_extendedprice) * 100 + 0.5) / 100 as sum_base_price, "
            "count(*) as count_order "
            "from lineitem group by l_returnflag, l_linestatus",
        # ROLLUP replay: integer-cents sums are associative, so each level
        # is an exact UNION ALL; lvl = number of active keys (2/1/0)
        "rollup_sales":
            "with base as (select o_orderstatus, o_orderpriority, "
            "cast(floor(o_totalprice * 100 + 0.5) as bigint) as cents "
            "from orders) "
            "select o_orderstatus, o_orderpriority, 2::bigint as lvl, "
            "count(*)::bigint as n_orders, sum(cents)::bigint as total_x100 "
            "from base group by o_orderstatus, o_orderpriority "
            "union all "
            "select o_orderstatus, null, 1::bigint, count(*)::bigint, "
            "sum(cents)::bigint from base group by o_orderstatus "
            "union all "
            "select null, null, 0::bigint, count(*)::bigint, "
            "sum(cents)::bigint from base",
        # CUBE replay: native GROUP BY CUBE with the standard GROUPING
        # bitmask (keys[0] = most significant bit) — same convention as
        # cube_aggregate's grouping_id
        "cube_sales":
            "with base as (select o_orderstatus, o_orderpriority, "
            "cast(floor(o_totalprice * 100 + 0.5) as bigint) as cents "
            "from orders) "
            "select o_orderstatus, o_orderpriority, "
            "grouping(o_orderstatus, o_orderpriority)::bigint as grouping_id, "
            "count(*)::bigint as n_orders, sum(cents)::bigint as total_x100 "
            "from base group by cube (o_orderstatus, o_orderpriority)",
        "asof_join":
            "select e.event_id, "
            "cast(floor(s.value * 100 + 0.5) as bigint) as value_asof_x100 "
            "from events e "
            "asof left join (select user_id, ts, value from events "
            "where event_id % 97 = 0) s "
            "on e.user_id = s.user_id and e.ts >= s.ts",
        "tumbling_window":
            "select user_id, date_trunc('hour', ts) as window_start, "
            "count(*) as n_events, "
            "floor(sum(value) * 100 + 0.5) / 100 as sum_value "
            "from events group by user_id, date_trunc('hour', ts)",
        "sliding_window":
            "with s as (select unnest(range(4)) as i), "
            "w as (select user_id, value, epoch(ts) as es, "
            "  ((floor(epoch(ts))::bigint // 900) - s.i) * 900 as ws_sec "
            "  from events cross join s) "
            "select user_id, make_timestamp(ws_sec * 1000000) as window_start, "
            "count(*) as n_events, "
            "floor(sum(value) * 100 + 0.5) / 100 as sum_value "
            "from w where es < ws_sec + 3600 group by user_id, ws_sec",
        "sample_mod":
            "select doc_id, n_chars from documents where doc_id % 8 = 0",
        # nucleus coverage replay: keep a row iff the cumulative mass BEFORE
        # it (weight desc, id asc within source) is short of 80% of the
        # source total — integer compare, no float thresholds
        "top_p_sources":
            "with w as (select doc_id, source, n_chars, "
            "sum(n_chars) over (partition by source "
            "order by n_chars desc, doc_id asc "
            "rows between unbounded preceding and current row) - n_chars "
            "as cum_before, "
            "sum(n_chars) over (partition by source) as tot from documents) "
            "select doc_id, source, n_chars from w "
            "where 1000 * cum_before < 800 * tot",
        # total (value desc, id asc) order makes row_number the exact rank
        "event_rank":
            "select event_id, user_id, "
            "row_number() over (partition by user_id "
            "order by value desc, event_id asc)::bigint as rnk, "
            "count(*) over (partition by user_id)::bigint as n_group "
            "from events",
        "event_gaps":
            "select event_id, user_id, "
            "(epoch_us(ts) - lag(epoch_us(ts)) over (partition by user_id "
            "order by ts, event_id))::bigint as gap_us "
            "from events",
        "stratified_sample":
            "select doc_id, source from documents where "
            "(source = 'src0') or (source = 'src1' and doc_id % 2 = 0) or "
            "(source = 'src2' and doc_id % 4 = 0) or "
            "(source = 'src3' and doc_id % 8 = 0)",
        "mix_corpora":
            "select doc_id, lang from documents where lang = 'en' "
            "union all select doc_id, lang from documents "
            "where lang <> 'en' and doc_id % 4 = 0",
        "sessionize":
            "with g as (select user_id, epoch(ts - lag(ts) over "
            "(partition by user_id order by ts)) as d from events) "
            "select user_id, (1 + count(*) filter (where d > 1800))::bigint "
            "as n_sessions from g group by user_id",
        "semi_join_orders":
            "select o_orderkey, o_custkey, o_totalprice from orders "
            "where o_custkey in (select c_custkey from customer "
            "where c_mktsegment = 'BUILDING')",
        "anti_join_orders":
            "select o_orderkey, o_custkey from orders where o_custkey not in "
            "(select c_custkey from customer where c_acctbal < 0)",
        "shuffle_semi_orders":
            "select o_orderkey, o_custkey, o_totalprice from orders "
            "where o_custkey in (select c_custkey from customer "
            "where c_mktsegment = 'BUILDING')",
        "shuffle_anti_orders":
            "select o_orderkey, o_custkey from orders where o_custkey not in "
            "(select c_custkey from customer where c_acctbal < 0)",
        "explode_words":
            "select doc_id, unnest(regexp_split_to_array(text, '\\s+')) as word "
            "from documents",
        # Token-window chunking: identical integer chunk-count rule
        # (1 + max(0, ceil((n-size)/stride))) replayed with unnest(range())
        # + list_slice; split regex mirrors the kernel's \s+
        "chunk_documents":
            r"with d as (select doc_id, regexp_split_to_array(text, '\s+') "
            "as toks from documents), "
            "c as (select doc_id, toks, len(toks) as n, "
            "1 + greatest(0, (len(toks) - 64 + 48 - 1) // 48) as n_chunks "
            "from d), "
            "x as (select doc_id, toks, n, unnest(range(0, n_chunks)) "
            "as chunk_idx from c) "
            "select doc_id, chunk_idx, "
            "least(chunk_idx*48 + 64, n) - chunk_idx*48 as chunk_tokens, "
            "array_to_string(list_slice(toks, chunk_idx*48 + 1, "
            "least(chunk_idx*48 + 64, n)), ' ') as chunk_text "
            "from x",
        # Point lookup == the flagship fold restricted to one conversation
        "cdc_point_lookup":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet') "
            "where conv_id = 'conv-00000003') "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # Clustered point lookup: the bloom sidecar is a pure read
        # optimization — identical semantics to cdc_point_lookup
        "cdc_point_lookup_clustered":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet') "
            "where conv_id = 'conv-00000003') "
            "select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text, tool, lsn "
            "from ranked where rn = 1 and op <> 'delete'",
        # The capstone chain: flagship fold → ordered transcript assembly →
        # token-window chunking, one statement
        "transcripts_to_training":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "final as (select conv_id, turn_idx, "
            "case role when 'human' then 'user' when 'ai' then 'assistant' "
            "else role end as role, text "
            "from ranked where rn = 1 and op <> 'delete'), "
            "docs as (select conv_id, "
            "string_agg(coalesce(role, '') || ': ' || coalesce(text, ''), "
            "chr(10) order by turn_idx) as transcript "
            "from final group by conv_id), "
            "d as (select conv_id, "
            r"regexp_split_to_array(transcript, '\s+') as toks from docs), "
            "c as (select conv_id, toks, len(toks) as n, "
            "1 + greatest(0, (len(toks) - 32 + 24 - 1) // 24) as n_chunks "
            "from d), "
            "x as (select conv_id, toks, n, unnest(range(0, n_chunks)) "
            "as chunk_idx from c) "
            "select conv_id, chunk_idx, "
            "least(chunk_idx*24 + 32, n) - chunk_idx*24 as chunk_tokens, "
            "array_to_string(list_slice(toks, chunk_idx*24 + 1, "
            "least(chunk_idx*24 + 32, n)), ' ') as chunk_text "
            "from x",
        "distinct_event_types":
            "select distinct event_type from events",
        "topk_docs_per_source":
            "select doc_id, source, n_chars, row_number() over "
            "(partition by source order by n_chars desc, doc_id) as rank "
            "from documents qualify rank <= 3",
        "corpus_prep":
            "with en as (select doc_id, text from documents where "
            f"coalesce(array_length(regexp_extract_all(text, '{_STOP_RE_SQL}')), 0) "
            r"  > 0.05 * greatest(coalesce(array_length(regexp_extract_all(text, '\S+')), 0), 1) "
            "  and coalesce(array_length(regexp_extract_all(text, '[\\x00-\\x7F]')), 0) "
            "  > 0.9 * greatest(length(text), 1)), "
            "q as (select * from en where "
            r"coalesce(array_length(regexp_extract_all(text, '\S+')), 0) >= 10), "
            "d as (select min(doc_id) as doc_id, text from q group by text) "
            "select doc_id, "
            r"coalesce(array_length(regexp_extract_all(text, '\S+')), 0)::bigint "
            "as n_tokens_ws, "
            f"coalesce(array_length(regexp_extract_all(text, '{_BPE_RE_SQL}')), 0)::bigint "
            "as n_tokens_bpe from d",
        "token_count":
            "select doc_id, "
            r"coalesce(array_length(regexp_extract_all(text, '\S+')), 0)::bigint "
            "as n_tokens_ws, "
            f"coalesce(array_length(regexp_extract_all(text, '{_BPE_RE_SQL}')), 0)::bigint "
            "as n_tokens_bpe from documents",
        "text_quality_counts":
            "select doc_id, length(text)::bigint as n_chars_q, "
            r"coalesce(array_length(regexp_extract_all(text, '\S+')), 0)::bigint "
            "as n_words, "
            "coalesce(array_length(regexp_extract_all(text, '[.,!?;:]')), 0)::bigint "
            "as n_punct from documents",
        "lang_id":
            "select doc_id, case "
            f"when coalesce(array_length(regexp_extract_all(text, '{_STOP_RE_SQL}')), 0) "
            r"  > 0.05 * greatest(coalesce(array_length(regexp_extract_all(text, '\S+')), 0), 1) "
            "  and coalesce(array_length(regexp_extract_all(text, '[\\x00-\\x7F]')), 0) "
            "  > 0.9 * greatest(length(text), 1) then 'en' "
            "when coalesce(array_length(regexp_extract_all(text, '[\\x00-\\x7F]')), 0) "
            "  > 0.9 * greatest(length(text), 1) then 'latin-other' "
            "else 'non-latin' end as lang_pred from documents",
        "word_jaccard_pairs":
            "with pairs as (select d1.doc_id as a, d1.text ta, d2.text tb "
            "from documents d1 join documents d2 on d2.doc_id = d1.doc_id + 1 "
            "where d1.doc_id < 50), "
            r"ws as (select a, list_distinct(regexp_split_to_array(ta, '\s+')) wa, "
            r"list_distinct(regexp_split_to_array(tb, '\s+')) wb from pairs) "
            "select a as id_a, floor(100000.0 * len(list_intersect(wa, wb)) "
            "/ len(list_distinct(list_concat(wa, wb))) + 0.5)::bigint as jac_scaled "
            "from ws",
        "dedup_exact":
            "select min(doc_id) as doc_id, text from documents group by text",
        "quality_score":
            # mirrors stages/text_stats.quality_score_batch term-for-term
            # (same association order → bit-equal IEEE doubles), ×1e6 half-up
            "with f as (select doc_id, "
            "  length(text)::double as nc, "
            r"  coalesce(array_length(regexp_extract_all(text, '\S+')), 0)::double as nw, "
            "  coalesce(array_length(regexp_extract_all(text, '[.,!?;:]')), 0)::double as np, "
            "  coalesce(array_length(regexp_extract_all(text, '[A-Z]')), 0)::double as nu, "
            f"  coalesce(array_length(regexp_extract_all(text, '{_STOP_RE_SQL}')), 0)::double as ns "
            "from documents), "
            "r as (select doc_id, "
            "  np / greatest(nc, 1.0) as punct_ratio, "
            "  nu / greatest(nc, 1.0) as upper_ratio, "
            "  ns / greatest(nw, 1.0) as stop_ratio, "
            "  nc / greatest(nw, 1.0) as mean_word_len from f), "
            "s as (select doc_id, stop_ratio, upper_ratio, "
            "  ((stop_ratio * 2.0) + (least(mean_word_len, 8.0) * 0.05)) - "
            "  ((punct_ratio * 3.0) + (upper_ratio * 1.0)) as raw from r) "
            "select doc_id, "
            "floor(stop_ratio * 1e6 + 0.5)::bigint as stopword_x1e6, "
            "floor(upper_ratio * 1e6 + 0.5)::bigint as upper_x1e6, "
            "floor(greatest(least(raw, 1.0), 0.0) * 1e6 + 0.5)::bigint "
            "as score_x1e6 from s",
        # same RE2 patterns as stages/text_stats.py PII_*_RE, mirrored
        # term-for-term (injection + three substitutions + marker count)
        "redact_pii": _REDACT_PII_SQL,
        # fixture oracle: independent scalar HLL (same public algorithm +
        # hash primitives, per-value Python loop) in scripts/make_fixtures.py
        "hll_distinct":
            "select column_name, approx_distinct "
            f"from read_parquet('{_FIXTURES}/hll_distinct_sf001.parquet')",
        "distinct_users_by_type":
            "select event_type, count(distinct user_id) as n_users "
            "from events group by event_type",
        "set_intersect":
            "select o_custkey, o_orderstatus from orders "
            "where o_orderpriority = '1-URGENT' "
            "intersect "
            "select o_custkey, o_orderstatus from orders "
            "where o_orderpriority = '2-HIGH'",
        "set_except":
            "select o_custkey, o_orderstatus from orders "
            "where o_orderpriority = '1-URGENT' "
            "except "
            "select o_custkey, o_orderstatus from orders "
            "where o_orderpriority = '2-HIGH'",
        # bloom prefilter has no false negatives, so the bloom-pruned
        # pipeline's oracle is the PLAIN join (bloom is pure pruning)
        "bloom_join_revenue":
            "select l_returnflag, "
            "cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ 0.5) as bigint)) as bigint) as revenue_cents, "
            "count(*) as n_items "
            "from lineitem join orders on l_orderkey = o_orderkey "
            "where o_orderpriority = '1-URGENT' group by l_returnflag",
        # mirrors q_remove_boilerplate's injection term-for-term, then
        # replays the line-DF rule with list lambdas
        "remove_boilerplate":
            "with d as (select doc_id, 'SITE HEADER' || chr(10) || "
            "coalesce(text, '') || chr(10) || 'Share on SocialApp' || "
            "chr(10) || 'Footer v' || cast(doc_id % 120 as varchar) as t "
            "from documents), "
            "l as (select doc_id, unnest(string_split(t, chr(10))) as line "
            "from d), "
            "df as (select line, count(distinct doc_id) as df from l "
            "group by line), "
            "b as (select coalesce(list(line), []) as bl from df "
            "where df >= 5), "
            "r as (select d.doc_id, list_filter(string_split(d.t, chr(10)), "
            "x -> not list_contains(b.bl, x)) as kept, "
            "len(string_split(d.t, chr(10))) as n0 from d, b) "
            "select doc_id, array_to_string(kept, chr(10)) as text_clean, "
            "cast(n0 - len(kept) as bigint) as n_lines_removed from r",
        # fixture oracle: independent per-group scalar HLL (same public
        # algorithm + hash primitives) in scripts/make_fixtures.py
        "hll_grouped":
            "select event_type, approx_distinct "
            f"from read_parquet('{_FIXTURES}/hll_grouped_sf001.parquet')",
        # SQL replay of the histogram sketch: same trunc binning, cumulative
        # search (first bin with cum >= q*total), bin-midpoint estimate
        "approx_quantiles":
            "with b as (select min(value) as lo, "
            "(max(value) - min(value)) / 4096.0 as w from events), "
            "hist as (select least(greatest(cast(trunc((value - b.lo) / b.w) "
            "as bigint), 0), 4095) as bin, count(*) as c "
            "from events, b group by 1), "
            "cum as (select bin, sum(c) over (order by bin) as cum, "
            "sum(c) over () as total from hist), "
            "qs as (select unnest([25, 50, 75, 90]) as q_x100), "
            "pick as (select q_x100, min(bin) as bin from qs, cum "
            "where cum.cum >= (q_x100 / 100.0) * cum.total group by q_x100) "
            "select p.q_x100, "
            "floor((b.lo + (p.bin + 0.5) * b.w) * 100 + 0.5) / 100 "
            "as quantile_value from pick p, b order by p.q_x100",
        # same split regex as explode_words; deterministic (n desc, word) order
        "top_words":
            "select word, count(*) as n from (select "
            "unnest(regexp_split_to_array(text, '\\s+')) as word "
            "from documents) group by word order by n desc, word limit 20",
        # replay of the per-lang median sketch + join + threshold filter
        "quality_filter_median":
            "with b as (select lang, min(n_chars) as lo, "
            "(max(n_chars) - min(n_chars)) / 256.0 as w "
            "from documents group by lang), "
            "hist as (select d.lang, least(greatest(cast(trunc("
            "(d.n_chars - b.lo) / b.w) as bigint), 0), 255) as bin, "
            "count(*) as c from documents d join b using(lang) "
            "where b.w > 0 group by 1, 2), "
            "cum as (select lang, bin, "
            "sum(c) over (partition by lang order by bin) as cum, "
            "sum(c) over (partition by lang) as total from hist), "
            "pick as (select lang, min(bin) as bin from cum "
            "where cum >= 0.5 * total group by lang), "
            "m as (select p.lang, b.lo + (p.bin + 0.5) * b.w as med "
            "from pick p join b using(lang) "
            "union all select lang, cast(lo as double) as med from b "
            "where w <= 0) "
            "select d.doc_id, d.lang, d.n_chars from documents d "
            "join m using(lang) where d.n_chars >= m.med",
        # SQL replay of the per-group histogram sketch (same math as
        # approx_quantiles, partitioned by lang; w<=0 groups → lo)
        "grouped_quantiles":
            "with b as (select lang, min(n_chars) as lo, max(n_chars) as hi, "
            "(max(n_chars) - min(n_chars)) / 256.0 as w "
            "from documents group by lang), "
            "hist as (select d.lang, least(greatest(cast(trunc("
            "(d.n_chars - b.lo) / b.w) as bigint), 0), 255) as bin, "
            "count(*) as c from documents d join b using(lang) "
            "where b.w > 0 group by 1, 2), "
            "cum as (select lang, bin, "
            "sum(c) over (partition by lang order by bin) as cum, "
            "sum(c) over (partition by lang) as total from hist), "
            "qs as (select unnest([50, 90]) as q_x100), "
            "pick as (select c.lang, q.q_x100, min(c.bin) as bin "
            "from qs q, cum c where c.cum >= (q.q_x100 / 100.0) * c.total "
            "group by 1, 2), "
            "res as (select p.lang, p.q_x100, "
            "b.lo + (p.bin + 0.5) * b.w as est from pick p join b using(lang) "
            "union all select b.lang, q.q_x100, cast(b.lo as double) as est "
            "from b, qs q where b.w <= 0) "
            "select lang, q_x100, floor(est * 100 + 0.5) / 100 "
            "as quantile_value from res",
        # Non-SQL-expressible pipelines: the oracle side is a committed
        # fixture parquet generated by INDEPENDENT reference implementations
        # (scalar spec kernels + Python dict banding / union-find) in
        # scripts/make_fixtures.py — a true cross-check of the vectorized
        # Ray path.  Bound to the driver's sf0.01 correctness scale.
        "doc_fingerprint":
            "select doc_id, fingerprint "
            f"from read_parquet('{_FIXTURES}/doc_fingerprint_sf001.parquet')",
        "dedup_minhash":
            "select id_a, id_b, est_jaccard "
            f"from read_parquet('{_FIXTURES}/dedup_minhash_sf001.parquet')",
        "dedup_simhash":
            "select id_a, id_b, hamming "
            f"from read_parquet('{_FIXTURES}/dedup_simhash_sf001.parquet')",
        "dedup_near_corpus":
            "select doc_id "
            f"from read_parquet('{_FIXTURES}/dedup_near_corpus_sf001.parquet')",
        "dedup_incremental":
            "select doc_id "
            f"from read_parquet('{_FIXTURES}/dedup_incremental_sf001.parquet')",
        "embedding_neardup":
            "select id_a, id_b, cosine "
            f"from read_parquet('{_FIXTURES}/embedding_neardup_sf001.parquet')",
        "ann_ivf":
            # nprobe=10/16 is exact on this data (pytest-pinned), so the
            # same brute-force ranking is the oracle
            f"with q as (select vec_id as qid, embedding from embeddings "
            f"where vec_id < {N_ANN_QUERIES}) "
            "select q.qid as query_id, e.vec_id, "
            "row_number() over (partition by q.qid order by "
            "list_cosine_similarity(q.embedding, e.embedding) desc, e.vec_id) "
            "as rank from q cross join embeddings e "
            "qualify rank <= 10",
        "ann_topk":
            f"with q as (select vec_id as qid, embedding from embeddings "
            f"where vec_id < {N_ANN_QUERIES}) "
            "select q.qid as query_id, e.vec_id, "
            "row_number() over (partition by q.qid order by "
            "list_cosine_similarity(q.embedding, e.embedding) desc, e.vec_id) "
            "as rank from q cross join embeddings e "
            "qualify rank <= 10",
        "ann_ivf_quantized":
            # DuckDB replays the int8 round-trip bit-for-bit (same IEEE
            # double ops as quantize/dequantize_embeddings_batch, incl.
            # the per-component float32 cast), then ranks by cosine over
            # the DEQUANTIZED corpus; queries stay un-quantized, exactly
            # like the Ray path
            "with s as (select vec_id, embedding, list_max(list_transform("
            "embedding, x -> abs(x::double))) as ma from embeddings), "
            "d as (select vec_id, list_transform(generate_series(1, "
            "len(embedding)), i -> ((greatest(least(floor(127 * "
            "embedding[i]::double / (case when ma = 0 then 1 else ma end) "
            "+ 0.5), 127), -127) / 127.0) * (floor(ma * 1000000 + 0.5) "
            "/ 1000000.0))::float) as emb from s), "
            f"q as (select vec_id as qid, embedding from embeddings "
            f"where vec_id < {N_ANN_QUERIES}) "
            "select q.qid as query_id, d.vec_id, "
            "row_number() over (partition by q.qid order by "
            "list_cosine_similarity(list_transform(q.embedding, "
            "x -> x::double), list_transform(d.emb, x -> x::double)) "
            "desc, d.vec_id) as rank from q cross join d "
            "qualify rank <= 10",
        "multimodal_decode":
            "select doc_id, strlen(text)::bigint as n_bytes from documents",
        "multimodal_decode_png":
            # dims are a pure function of doc_id (the payload PNGs are
            # synthesized that way), so SQL replays the REAL decode
            "select doc_id, (1 + doc_id % 16)::int as img_width, "
            "(1 + doc_id % 9)::int as img_height, 'PNG' as img_format "
            "from documents",
        "multimodal_decode_wav":
            # every WAV parameter is a pure function of doc_id (the
            # payloads are synthesized that way), so SQL replays the REAL
            # stdlib-wave decode incl. the integer PCM mean-abs feature
            "select doc_id, (8000 + (doc_id % 8) * 1000)::int as "
            "sample_rate, (1 + doc_id % 2)::int as n_channels, "
            "(100 + doc_id % 50)::bigint as n_frames, "
            "((100 + doc_id % 50) * 1000 // (8000 + (doc_id % 8) * 1000))"
            "::bigint as duration_ms, "
            "((doc_id * 37) % 2000)::bigint as mean_abs, "
            "'WAV' as audio_format from documents",
        # every Y4M parameter is likewise a pure function of doc_id; the
        # constant-fill frames make the integer luma mean exactly the fill
        "multimodal_decode_y4m":
            "select doc_id, (16 + (doc_id % 3) * 16)::int as width, "
            "(8 + (doc_id % 2) * 8)::int as height, "
            "(24 + doc_id % 6)::bigint as fps_num, "
            "(3 + doc_id % 5)::bigint as n_frames, "
            "((3 + doc_id % 5) * 1000 // (24 + doc_id % 6))::bigint "
            "as duration_ms, "
            "((doc_id * 53) % 256)::bigint as mean_y, "
            "'Y4M' as video_format from documents",
        "multimodal_embed_ann":
            "select query_id, doc_id, rank "
            f"from read_parquet('{_FIXTURES}/multimodal_ann_sf001.parquet')",
        # word n-grams via list slicing (same tokenization as tokenize_column:
        # regex-split on \s+, empties dropped); integer per-mille ratios
        "repetition_stats":
            "with d as (select doc_id, list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> '') as ws from documents), "
            "g2 as (select doc_id, unnest(list_transform(generate_series(1, "
            "len(ws) - 1), i -> array_to_string(ws[i:i+1], ' '))) as gram "
            "from d), "
            "c2 as (select doc_id, gram, count(*) as c from g2 "
            "group by doc_id, gram), "
            "a2 as (select doc_id, max(c) as mx, sum(c)::bigint as n "
            "from c2 group by doc_id), "
            "g5 as (select doc_id, unnest(list_transform(generate_series(1, "
            "len(ws) - 4), i -> array_to_string(ws[i:i+4], ' '))) as gram "
            "from d), "
            "c5 as (select doc_id, gram, count(*) as c from g5 "
            "group by doc_id, gram), "
            "a5 as (select doc_id, sum(case when c > 1 then c else 0 end)"
            "::bigint as dup, sum(c)::bigint as n from c5 group by doc_id) "
            "select d.doc_id, coalesce(a2.n, 0) as n_grams_2, "
            "coalesce((a2.mx * 1000) // a2.n, 0)::bigint as top2_x1000, "
            "coalesce(a5.n, 0) as n_grams_5, "
            "coalesce((a5.dup * 1000) // a5.n, 0)::bigint as dup5_x1000 "
            "from d left join a2 using(doc_id) left join a5 using(doc_id) "
            "order by doc_id",
        # docs with doc_id % 37 = 0 are the held-out benchmark; a train doc
        # is contaminated when ≥20% of its 5-gram occurrences hit the set
        "decontaminate":
            "with d as (select doc_id, list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> '') as ws from documents), "
            "g as (select doc_id, unnest(list_transform(generate_series(1, "
            "len(ws) - 4), i -> array_to_string(ws[i:i+4], ' '))) as gram "
            "from d), "
            "ev as (select distinct gram from g where doc_id % 37 = 0), "
            "st as (select g.doc_id, count(*)::bigint as n_grams, "
            "sum(case when ev.gram is not null then 1 else 0 end)::bigint "
            "as n_contaminated from g left join ev on g.gram = ev.gram "
            "where g.doc_id % 37 <> 0 group by g.doc_id) "
            "select b.doc_id, coalesce(st.n_grams, 0) as n_grams, "
            "coalesce(st.n_contaminated, 0) as n_contaminated, "
            "(case when coalesce(st.n_grams, 0) > 0 and "
            "coalesce(st.n_contaminated, 0) * 100 >= "
            "coalesce(st.n_grams, 0) * 20 then 1 else 0 end)::bigint "
            "as contaminated "
            "from (select doc_id from documents where doc_id % 37 <> 0) b "
            "left join st using(doc_id) order by b.doc_id",
        # integer-exact tf/df ranking (ties by term asc) — replays the
        # engine's score_ppm = cnt*1e6 // (df * n_tokens) bit-for-bit
        "tfidf_top_terms":
            "with d as (select doc_id, list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> '') as ws from documents), "
            "t as (select doc_id, unnest(ws) as term, len(ws) as n_tokens "
            "from d), "
            "c as (select doc_id, term, count(*)::bigint as cnt, "
            "any_value(n_tokens)::bigint as n_tokens from t "
            "group by doc_id, term), "
            "f as (select term, count(*)::bigint as df from c "
            "group by term), "
            "s as (select c.doc_id, c.term, c.cnt, f.df, "
            "(c.cnt * 1000000) // (f.df * greatest(c.n_tokens, 1)) "
            "as score_ppm, row_number() over (partition by c.doc_id "
            "order by (c.cnt * 1000000) // (f.df * greatest(c.n_tokens, 1)) "
            "desc, c.term) as rn from c join f using(term)) "
            "select doc_id, term, cnt, df, score_ppm::bigint as score_ppm "
            "from s where rn <= 3 order by doc_id, term",
        # interval containment join; values rounded to x100 ints per event
        # BEFORE summing so the aggregate is order-independent
        "range_join_windows":
            "with iv as (select user_id as window_id, min(ts) as s "
            "from events where user_id % 10 = 0 group by user_id), "
            "j as (select iv.window_id, "
            "floor(e.value * 100 + 0.5)::bigint as v from events e "
            "join iv on e.ts >= iv.s and e.ts < iv.s + interval 6 hour) "
            "select window_id, count(*)::bigint as n_events, "
            "sum(v)::bigint as sum_value_x100 from j "
            "group by window_id order by window_id",
        # exclusive window cumsum replays the distributed prefix sum
        "pack_sequences":
            "with t as (select doc_id, len(list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> ''))::bigint as n_tokens "
            "from documents), "
            "c as (select doc_id, n_tokens, coalesce(sum(n_tokens) over ("
            "order by doc_id rows between unbounded preceding and "
            "1 preceding), 0)::bigint as cum_before from t) "
            "select doc_id, n_tokens, cum_before, "
            "(cum_before // 512)::bigint as seq_id from c order by doc_id",
        # full curation chain: median-length filter (sketch replay) →
        # decontamination (n-gram replay) → exact dedup → packing (cumsum)
        "curate_corpus":
            "with b as (select lang, min(n_chars) as lo, "
            "(max(n_chars) - min(n_chars)) / 256.0 as w "
            "from documents group by lang), "
            "hist as (select d.lang, least(greatest(cast(trunc("
            "(d.n_chars - b.lo) / b.w) as bigint), 0), 255) as bin, "
            "count(*) as c from documents d join b using(lang) "
            "where b.w > 0 group by 1, 2), "
            "cum as (select lang, bin, "
            "sum(c) over (partition by lang order by bin) as cum, "
            "sum(c) over (partition by lang) as total from hist), "
            "pick as (select lang, min(bin) as bin from cum "
            "where cum >= 0.5 * total group by lang), "
            "m as (select p.lang, b.lo + (p.bin + 0.5) * b.w as med "
            "from pick p join b using(lang) "
            "union all select lang, cast(lo as double) as med from b "
            "where w <= 0), "
            "keepq as (select d.doc_id, d.text from documents d "
            "join m using(lang) "
            "where d.n_chars >= m.med and d.doc_id % 37 <> 0), "
            "dall as (select doc_id, list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> '') as ws from documents), "
            "ev as (select distinct gram from (select doc_id, "
            "unnest(list_transform(generate_series(1, len(ws) - 4), "
            "i -> array_to_string(ws[i:i+4], ' '))) as gram from dall "
            "where doc_id % 37 = 0)), "
            "tr as (select k.doc_id, unnest(list_transform("
            "generate_series(1, len(w2.ws) - 4), "
            "i -> array_to_string(w2.ws[i:i+4], ' '))) as gram "
            "from keepq k join dall w2 using(doc_id)), "
            "st as (select tr.doc_id, count(*) as n_grams, "
            "sum(case when ev.gram is not null then 1 else 0 end) "
            "as n_contaminated from tr left join ev on tr.gram = ev.gram "
            "group by tr.doc_id), "
            "clean as (select k.doc_id, k.text from keepq k "
            "left join st using(doc_id) where coalesce(st.n_grams, 0) = 0 "
            "or st.n_contaminated * 100 < st.n_grams * 20), "
            "uniq as (select min(doc_id) as doc_id from clean "
            "group by text), "
            "tok as (select u.doc_id, len(w3.ws)::bigint as n_tokens "
            "from uniq u join dall w3 using(doc_id)), "
            "c2 as (select doc_id, n_tokens, coalesce(sum(n_tokens) over ("
            "order by doc_id rows between unbounded preceding and "
            "1 preceding), 0)::bigint as cum_before from tok) "
            "select doc_id, n_tokens, cum_before, "
            "(cum_before // 512)::bigint as seq_id from c2 order by doc_id",
        # Lehmer permutation split — exact in both engines
        "dataset_split":
            "select doc_id, source, case "
            "when (doc_id * 48271) % 2147483647 % 100 < 80 then 'train' "
            "when (doc_id * 48271) % 2147483647 % 100 < 90 then 'val' "
            "else 'test' end as split from documents order by doc_id",
        # distinct-gram self-join per source pair (a < b)
        "source_overlap":
            "with d as (select source, list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> '') as ws from documents), "
            "g as (select distinct source, unnest(list_transform("
            "generate_series(1, len(ws) - 4), "
            "i -> array_to_string(ws[i:i+4], ' '))) as gram from d) "
            "select a.source as source_a, b.source as source_b, "
            "count(*)::bigint as shared_grams from g a "
            "join g b on a.gram = b.gram and a.source < b.source "
            "group by 1, 2 order by 1, 2",
        # lang heuristic mirrored from the green lang_id oracle; integer
        # totals and floor-div mean
        "corpus_report":
            "with langd as (select source, n_chars, "
            f"coalesce(array_length(regexp_extract_all(text, '{_STOP_RE_SQL}')), 0) as st, "
            r"coalesce(array_length(regexp_extract_all(text, '\S+')), 0) as wd, "
            "coalesce(array_length(regexp_extract_all(text, "
            "'[\\x00-\\x7F]')), 0) as asc_, length(text) as ln "
            "from documents), "
            "d as (select source, wd as tokens, n_chars as chars, "
            "case when st > 0.05 * greatest(wd, 1) "
            "and asc_ > 0.9 * greatest(ln, 1) then 1 else 0 end as is_en "
            "from langd) "
            "select source, count(*)::bigint as n_docs, "
            "sum(tokens)::bigint as total_tokens, "
            "sum(chars)::bigint as total_chars, "
            "sum(is_en)::bigint as en_docs, "
            "((sum(tokens) * 100) // count(*))::bigint as mean_tokens_x100 "
            "from d group by source order by source",
        # frame arithmetic from the payload byte length (1 KiB frames,
        # every 4th sampled): n = ceil(max(bytes//1024,1)/4)
        "multimodal_frame_sample":
            "with p as (select doc_id, octet_length(encode(repeat("
            "coalesce(text, ''), 64))) as nbytes from documents), "
            "f as (select doc_id, greatest(nbytes // 1024, 1) as n_frames "
            "from p) "
            "select doc_id, ((n_frames + 3) // 4)::bigint as n_sampled, "
            "(((n_frames + 3) // 4) - 1) * 4 as last_offset from f "
            "order by doc_id",
        # elementwise double ops + order-independent max → exact replay
        "dequantize_roundtrip":
            "with s as (select vec_id, embedding, list_max(list_transform("
            "embedding, x -> abs(x::double))) as ma from embeddings), "
            "p as (select vec_id, embedding, "
            "floor(ma * 1000000 + 0.5) / 1000000.0 as scale, "
            "list_transform(embedding, x -> greatest(least(floor("
            "127 * x::double / (case when ma = 0 then 1 else ma end) "
            "+ 0.5), 127), -127)) as qs from s) "
            "select vec_id, floor(list_max(list_transform("
            "generate_series(1, len(embedding)), i -> "
            "abs((qs[i] / 127.0) * scale - embedding[i]::double))) "
            "* 1000000000 + 0.5)::bigint as err_x1e9 from p "
            "order by vec_id",
        # window cumsum packing + ordered string_agg per sequence
        "materialize_sequences":
            "with t as (select doc_id, text, len(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> ''))::bigint "
            "as n_tokens from documents), "
            "c as (select doc_id, text, coalesce(sum(n_tokens) over ("
            "order by doc_id rows between unbounded preceding and "
            "1 preceding), 0)::bigint as cum from t), "
            "s as (select doc_id, text, (cum // 512) as seq_id from c) "
            "select seq_id::bigint as seq_id, count(*)::bigint as n_parts, "
            "string_agg(coalesce(text, ''), ' ' order by doc_id) as text "
            "from s group by seq_id order by seq_id",
        # identical IEEE-double arithmetic via list lambdas; q aggregates
        # are pure ints, the scale a ppm int
        "quantize_embeddings":
            "with s as (select vec_id, embedding, "
            "list_max(list_transform(embedding, x -> abs(x::double))) "
            "as ma from embeddings), "
            "q as (select vec_id, ma, list_transform(embedding, x -> "
            "greatest(least(floor(127 * x::double / "
            "(case when ma = 0 then 1 else ma end) + 0.5), 127), -127)"
            "::bigint) as qs from s) "
            "select vec_id, floor(ma * 1000000 + 0.5)::bigint as scale_ppm, "
            "list_sum(qs)::bigint as q_sum, "
            "list_min(qs)::bigint as q_min, "
            "list_max(qs)::bigint as q_max from q order by vec_id",
        # conditional counts == one-hot sums
        "pivot_event_counts":
            "select user_id, "
            "sum(case when event_type = 'click' then 1 else 0 end)::bigint "
            "as n_click, "
            "sum(case when event_type = 'view' then 1 else 0 end)::bigint "
            "as n_view, "
            "sum(case when event_type = 'purchase' then 1 else 0 end)"
            "::bigint as n_purchase, "
            "sum(case when event_type = 'signup' then 1 else 0 end)::bigint "
            "as n_signup, "
            "sum(case when event_type = 'error' then 1 else 0 end)::bigint "
            "as n_error from events group by user_id order by user_id",
        # per-event x100 ints before the window sum → order-independent
        "rolling_user_value":
            "with v as (select event_id, user_id, ts, "
            "floor(value * 100 + 0.5)::bigint as value_x100 from events) "
            "select event_id, user_id, "
            "sum(value_x100) over (partition by user_id "
            "order by ts, event_id rows between 2 preceding and "
            "current row)::bigint as roll_x100 from v order by event_id",
        # same injection (upper + tabs + decomposed e‑acute), then the
        # normalization chain; nfc_normalize must compose café identically
        "normalize_text":
            "select doc_id, nfc_normalize(trim(regexp_replace(lower("
            "'  ' || upper(coalesce(text, '')) || chr(9) || chr(9) || "
            "'cafe' || chr(769) || '  '), '\\s+', ' ', 'g'))) as text "
            "from documents order by doc_id",
        # CMS never undercounts → sketch-then-verify equals the naive
        # HAVING filter exactly (same split-and-drop-empties tokenization)
        "heavy_hitters":
            "select word, count(*)::bigint as n from (select "
            "unnest(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '')) as word from documents) "
            "group by word having count(*) >= 500 order by word",
        # sketch replay + Σ(value >= edge) bucket rule (edges kept as
        # exact doubles — both engines compare the identical values)
        "quartile_by_lang":
            "with b as (select lang, min(n_chars) as lo, "
            "(max(n_chars) - min(n_chars)) / 256.0 as w "
            "from documents group by lang), "
            "hist as (select d.lang, least(greatest(cast(trunc("
            "(d.n_chars - b.lo) / b.w) as bigint), 0), 255) as bin, "
            "count(*) as c from documents d join b using(lang) "
            "where b.w > 0 group by 1, 2), "
            "cum as (select lang, bin, "
            "sum(c) over (partition by lang order by bin) as cum, "
            "sum(c) over (partition by lang) as total from hist), "
            "qs as (select unnest([25, 50, 75]) as q_x100), "
            "pick as (select c.lang, q.q_x100, min(c.bin) as bin "
            "from qs q, cum c where c.cum >= (q.q_x100 / 100.0) * c.total "
            "group by 1, 2), "
            "res as (select p.lang, p.q_x100, "
            "b.lo + (p.bin + 0.5) * b.w as est from pick p "
            "join b using(lang) "
            "union all select b.lang, q.q_x100, cast(b.lo as double) as est "
            "from b, qs q where b.w <= 0), "
            "e as (select lang, "
            "max(case when q_x100 = 25 then est end) as e25, "
            "max(case when q_x100 = 50 then est end) as e50, "
            "max(case when q_x100 = 75 then est end) as e75 "
            "from res group by lang) "
            "select d.doc_id, d.lang, d.n_chars, "
            "((d.n_chars >= e.e25)::int + (d.n_chars >= e.e50)::int + "
            "(d.n_chars >= e.e75)::int)::bigint as bucket "
            "from documents d join e using(lang) order by d.doc_id",
        # Lehmer permutation h = doc_id*48271 mod 2147483647 (injective for
        # doc_id < 2^31) — exact in both engines, no process-seeded hashing
        "sample_per_group":
            "with keyed as (select doc_id, source, "
            "(doc_id * 48271) % 2147483647 as h from documents), "
            "ranked as (select *, row_number() over (partition by source "
            "order by h, doc_id) as rank from keyed) "
            "select doc_id, source, h, rank::bigint as rank from ranked "
            "where rank <= 5 order by source, rank",
        # incremental view == argmax-LSN fold grouped by conversation
        "cdc_conv_stats":
            "with ranked as (select *, row_number() over "
            "(partition by conv_id, turn_idx order by lsn desc) as rn "
            f"from read_parquet('{_FIXTURES}/cdc_events_20000.parquet')), "
            "final as (select conv_id, lsn from ranked "
            "where rn = 1 and op <> 'delete') "
            "select conv_id, count(*)::bigint as n_turns, "
            "max(lsn)::bigint as max_lsn from final "
            "group by conv_id order by conv_id",
        # band self-join: purchases within (ts, ts+10min] of a same-user
        # click; per-event x100 rounding keeps the sum order-independent
        "attribution_follow":
            "with j as (select c.event_id, "
            "floor(p.value * 100 + 0.5)::bigint as v "
            "from events c join events p on p.user_id = c.user_id "
            "and p.ts > c.ts and p.ts <= c.ts + interval 10 minute "
            "where c.event_type = 'click' and p.event_type = 'purchase') "
            "select event_id, count(*)::bigint as n_follow, "
            "sum(v)::bigint as sum_value_x100 from j "
            "group by event_id order by event_id",
        # sequential fixed-point k-means replay (exact: integer arithmetic)
        "kmeans_clusters":
            "select vec_id, cluster "
            f"from read_parquet('{_FIXTURES}/kmeans_clusters_sf001.parquet')",
    }
