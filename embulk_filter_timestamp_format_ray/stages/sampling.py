"""Deterministic sampling / corpus-mixing operators for training-data
pipelines.

All sampling here is DETERMINISTIC (id-arithmetic or seeded counter hash),
never RNG-per-task: the same input always yields the same sample, so a
resumed or retried job reproduces its output exactly — the property the CDC
layer's exactly-once story relies on, extended to the corpus side.

Scale shape: every operator is a stateless vectorized ``map_batches`` filter
— no shuffle, no driver state; rates/weights ride the task closure (tiny).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64


def deterministic_sample(ds, id_col: str, modulus: int, remainder: int = 0):
    """Keep rows where ``id % modulus == remainder`` — the cheapest
    reproducible thinning (used by the ``sample_mod`` driver query)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).cast(pa.int64()))
        return batch.filter(pa.array(ids % modulus == remainder))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, stratum_col: str, id_col: str,
                      rates: "dict[str, int]", default_modulus: "int | None" = None):
    """Per-stratum deterministic sampling: keep a row when
    ``id % rates[stratum] == 0``; strata absent from ``rates`` use
    ``default_modulus`` (None = dropped entirely).

    The training-data use: rebalance a corpus by source — keep 1/2 of a
    high-quality stratum, 1/8 of a boilerplate-heavy one, drop the rest —
    with byte-reproducible output."""

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).cast(pa.int64()))
        strata = batch.column(stratum_col)
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        # vectorized per-stratum modulus via dictionary lookup
        enc = pc.dictionary_encode(strata)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        mods = np.array(
            [rates.get(v, default_modulus or 0) or 0 for v in vocab],
            dtype=np.int64)
        m = mods[np.asarray(enc.indices.cast(pa.int64()))]
        keep = (m > 0) & (np.where(m > 0, ids % np.maximum(m, 1), 1) == 0)
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def fraction_sample(ds, id_col: str, fraction: float, seed: int = 7):
    """Keep ~``fraction`` of rows by seeded counter hash of the id —
    arbitrary (non-reciprocal) rates, still deterministic."""
    cut = np.uint64(int(fraction * float(1 << 53)))

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).cast(pa.int64())).astype(np.uint64)
        u = splitmix64(ids, seed) >> np.uint64(11)  # 53-bit uniform
        return batch.filter(pa.array(u < cut))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mix_corpora(parts: "list[tuple]", id_col: str):
    """Weighted deterministic mix of corpora: each ``(ds, modulus)`` part
    contributes rows with ``id % modulus == 0`` and the streams union —
    the "data mixing" step of a training pipeline (e.g. 1/1 of curated
    text + 1/4 of web scrape), reproducible across reruns and resumes.

    Parts must share a schema (align columns upstream).  Union in Ray Data
    is metadata-only — no shuffle, blocks stream from both inputs."""
    sampled = [deterministic_sample(ds, id_col, mod) for ds, mod in parts]
    out = sampled[0]
    for s in sampled[1:]:
        out = out.union(s)
    return out


def assign_split(ds, id_col: str = "doc_id", train_pct: int = 80,
                 val_pct: int = 10, out_col: str = "split"):
    """Deterministic train/val/test assignment via the Lehmer modular
    permutation ``(id * 48271) % 2147483647 % 100`` — SQL-replayable,
    resume-safe, no process-seeded randomness.  Requires ids in
    [0, 2^47): negatives flip the modulo sign convention vs SQL and
    larger ids overflow int64."""
    import numpy as np
    import pyarrow as pa

    def assign(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col))
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 47)):
            raise ValueError("assign_split requires ids in [0, 2^47)")
        bucket = ((ids * 48271) % 2147483647) % 100
        split = np.where(bucket < train_pct, "train",
                         np.where(bucket < train_pct + val_pct, "val",
                                  "test"))
        return b.append_column(out_col, pa.array(split))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def top_p_by_group(ds, group_col: str, weight_col: str, id_col: str,
                   p_permille: int):
    """Nucleus-style coverage filter: per group, keep the minimal head of
    rows — ordered (weight desc, id asc) — whose cumulative weight reaches
    ``p_permille``/1000 of the group's total.  A row survives iff the
    cumulative weight BEFORE it is still short of the threshold, so the
    crossing row is kept.  Integer arithmetic end-to-end
    (``1000*cum_before < p_permille*total``) — replays bit-for-bit in SQL
    window functions (DESIGN #20).

    One hash-shard shuffle; each shard sorts once and derives per-group
    prefix sums and totals with segment vectorization — no per-group
    callbacks.  The corpus-curation use: keep the documents covering p of
    each source's character/token mass, dropping the long tail."""
    from embulk_filter_timestamp_format_ray.stages.relational import (
        _same_as_prev_row,
        _with_key_shard,
        warn_large_key_group,
    )

    if not 0 < p_permille <= 1000:
        raise ValueError("p_permille must be in (0, 1000]")

    def filter_shard(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_shard"])
        if g.num_rows == 0:
            return g
        warn_large_key_group(g.num_rows, "top_p_by_group", "shard")
        order = pc.sort_indices(g, sort_keys=[
            (group_col, "ascending"), (weight_col, "descending"),
            (id_col, "ascending")])
        s = g.take(order)
        w = np.asarray(s.column(weight_col).combine_chunks().cast(pa.int64()))
        key_start = ~_same_as_prev_row(s, [group_col])
        key_ids = np.cumsum(key_start) - 1
        cum = np.cumsum(w)
        before = cum - w
        start_idx = np.nonzero(key_start)[0]
        base = before[start_idx]                       # global cum at group start
        cum_before = before - base[key_ids]
        ends = np.r_[start_idx[1:] - 1, len(w) - 1]
        totals = cum[ends] - base                      # per-group weight total
        keep = 1000 * cum_before < p_permille * totals[key_ids]
        return s.filter(pa.array(keep))

    ds = _with_key_shard(ds, [group_col])
    return ds.groupby("_shard").map_groups(filter_shard,
                                           batch_format="pyarrow")
