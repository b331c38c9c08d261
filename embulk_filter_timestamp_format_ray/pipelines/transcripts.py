"""Transcript assembly: CDC lake rows → one document per conversation.

The bridge between the engine's two halves — the exactly-once transcript
lake (conv_id, turn_idx, role, text, …) and the corpus operators (dedup,
quality, tokens, fingerprints) that consume a ``documents``-shaped table.

Scale shape: ONE hash-shard shuffle on conv_id; each SHARD sorts
(conv_id, turn_idx) once and renders every conversation's transcript in one
vectorized pass (run-length list offsets + ``pc.binary_join``) — no
per-conversation Python callbacks, no ``to_pylist`` — then streams straight
into downstream ``map_batches`` corpus stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.stages.relational import (
    _same_as_prev_row,
    _with_key_shard,
    warn_large_key_group,
)


def _assemble_shard(group: pa.Table) -> pa.Table:
    g = group.drop_columns(["_shard"])
    warn_large_key_group(g.num_rows, "assemble_conversations", "shard")
    return assemble_table(g)


def assemble_table(g: pa.Table) -> pa.Table:
    """One table of (conv_id, turn_idx, role, text, ...) rows → one row per
    conversation — the shard kernel, reusable wherever a conversation's
    turns are known to be CO-LOCATED in ``g`` (a key shard, or one
    unsalted conv-mode lake partition)."""
    if g.num_rows == 0:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "n_turns": pa.array([], pa.int64()),
                         "transcript": pa.array([], pa.string())})
    order = pc.sort_indices(g, sort_keys=[("conv_id", "ascending"),
                                          ("turn_idx", "ascending")])
    g = g.take(order)
    role = pc.fill_null(g.column("role"), "")
    text = pc.fill_null(g.column("text"), "")
    lines = pc.binary_join_element_wise(role, text, ": ")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    # one list entry per conversation run → a single vectorized join
    starts = np.nonzero(~_same_as_prev_row(g, ["conv_id"]))[0]
    offsets = np.append(starts, g.num_rows).astype(np.int32)
    runs = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), lines)
    transcripts = pc.binary_join(runs, "\n")
    return pa.table({
        "conv_id": g.column("conv_id").take(pa.array(starts)),
        "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
        "transcript": transcripts,
    })


def assemble_conversations(lake_ds):
    """(conv_id, turn_idx, role, text, ...) rows → one row per conversation:
    (conv_id, n_turns, transcript) with turns ordered and rendered as
    ``role: text`` lines."""
    ds = lake_ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    ds = _with_key_shard(ds, ["conv_id"])
    return ds.groupby("_shard").map_groups(_assemble_shard,
                                           batch_format="pyarrow")
