"""Transcript assembly: CDC lake rows → one document per conversation.

The bridge between the engine's two halves — the exactly-once transcript
lake (conv_id, turn_idx, role, text, …) and the corpus operators (dedup,
quality, tokens, fingerprints) that consume a ``documents``-shaped table.

Scale shape: ONE groupby(conv_id) shuffle; each group (one conversation,
small by construction) sorts its turns locally and joins the lines
vectorized — no driver materialization, streams straight into downstream
``map_batches`` corpus stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _assemble_group(group: pa.Table) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
    g = group.take(order)
    role = pc.fill_null(g.column("role"), "")
    text = pc.fill_null(g.column("text"), "")
    lines = pc.binary_join_element_wise(role, text, ": ")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    doc = "\n".join(lines.to_pylist())  # one conversation: tens of lines
    return pa.table({
        "conv_id": pa.array([g.column("conv_id")[0].as_py()], pa.string()),
        "n_turns": pa.array([g.num_rows], pa.int64()),
        "transcript": pa.array([doc], pa.string()),
    })


def assemble_conversations(lake_ds):
    """(conv_id, turn_idx, role, text, ...) rows → one row per conversation:
    (conv_id, n_turns, transcript) with turns ordered and rendered as
    ``role: text`` lines."""
    ds = lake_ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    return ds.groupby("conv_id").map_groups(_assemble_group,
                                            batch_format="pyarrow")
