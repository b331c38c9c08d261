"""Final-state verification (SURVEY.md §2.8 last row): read the committed
lake, impose the stable (conv_id, turn_idx) ordering, and compare against an
oracle state under the per-turn text-equality invariant (input_hint)."""

from __future__ import annotations

import pyarrow as pa

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline

COMPARED_COLUMNS = ("role", "text", "tool", "lsn")


#: lake_state_dict materializes EVERY row into a driver-side Python dict —
#: fixture-scale verification only.  Refuse anything that looks like real
#: data; production-scale invariant checking is ``CDCPipeline.fsck()``
#: (distributed, footer-driven).
MAX_VERIFY_ROWS = 5_000_000


def lake_state_dict(pipeline: CDCPipeline,
                    max_rows: int = MAX_VERIFY_ROWS) -> "dict[tuple, dict]":
    """Committed lake state keyed by (conv_id, turn_idx); raises on duplicate
    merge keys (a merge invariant violation).

    FIXTURE-SCALE ONLY: this drains the whole lake to the driver as Python
    objects (the point is an exact dict-vs-oracle comparison in tests).
    Guarded by ``max_rows``; at any real scale use ``CDCPipeline.fsck()``
    / ``pipelines.verify.diff_states`` over sampled partitions instead."""
    out: dict[tuple, dict] = {}
    final = pipeline.final_state_sorted()
    if final.num_rows > max_rows:
        raise ValueError(
            f"lake_state_dict is a fixture-scale test helper; lake has "
            f"{final.num_rows} rows (> {max_rows}).  Use CDCPipeline.fsck() "
            f"for production-scale invariant checks.")
    for row in final.to_pylist():
        key = (row["conv_id"], row["turn_idx"])
        if key in out:
            raise AssertionError(f"duplicate merge key in lake: {key}")
        out[key] = row
    return out


def diff_states(lake: "dict[tuple, dict]", oracle: "dict[tuple, dict]",
                columns=COMPARED_COLUMNS, max_diffs: int = 20) -> "list[str]":
    """Human-readable diffs between lake and oracle states (empty == match)."""
    diffs: list[str] = []
    for key in sorted(set(lake) | set(oracle)):
        if len(diffs) >= max_diffs:
            diffs.append("... (truncated)")
            break
        a, b = lake.get(key), oracle.get(key)
        if a is None:
            diffs.append(f"{key}: missing from lake (oracle lsn={b.get('lsn')})")
            continue
        if b is None:
            diffs.append(f"{key}: extra in lake (lsn={a.get('lsn')})")
            continue
        for c in columns:
            if a.get(c) != b.get(c):
                diffs.append(f"{key}.{c}: lake={a.get(c)!r} oracle={b.get(c)!r}")
    return diffs


def verify_replay(pipeline: CDCPipeline, oracle: "dict[tuple, dict]") -> None:
    """Assert the replayed lake equals the oracle (per-turn text equality
    under stable turn ordering)."""
    diffs = diff_states(lake_state_dict(pipeline), oracle)
    if diffs:
        raise AssertionError("lake/oracle mismatch:\n" + "\n".join(diffs))
