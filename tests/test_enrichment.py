"""Ingest-time dimension enrichment: broadcast_join on the raw change
stream BEFORE apply — the enriched column rides through normalization as
an evolved event column (widen-only schema evolution picks it up with no
lake-side code)."""

import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.stages.relational import (
    broadcast_join,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf

DIM = pa.table({
    "role": ["human", "user", "ai", "assistant", "system", "tool"],
    "channel": ["web", "web", "model", "model", "platform", "platform"],
})


def test_enriched_column_rides_evolution(ray_session, tmp_path):
    import ray.data

    ev = expected_event_table(800)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(broadcast_join(ray.data.from_arrow(ev), DIM,
                              on="role", how="left outer"))

    # the enriched column widened the committed schema
    m = mf.read_manifest(pipe.lake_dir)
    assert "channel" in manifest_columns(m)

    state = pipe.final_state_sorted()
    assert "channel" in state.column_names
    # channel is the dimension applied to the (renamed) winner's role
    role = state.column("role")
    want = pc.if_else(
        pc.equal(role, "user"), pa.scalar("web"),
        pc.if_else(pc.equal(role, "assistant"), pa.scalar("model"),
                   pa.scalar("platform")))
    assert state.column("channel").to_pylist() == want.to_pylist()
    assert pipe.fsck()["violations"] == []


def manifest_columns(m: dict) -> "list[str]":
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        manifest_schema_columns,
    )

    return manifest_schema_columns(m)


def test_enrichment_then_plain_tail_composes(ray_session, tmp_path):
    """A later UNENRICHED apply (a tailer that doesn't join) composes:
    its rows read NULL channel, prior enriched rows keep theirs."""
    import ray.data

    ev = expected_event_table(800)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    pipe.apply(broadcast_join(ray.data.from_arrow(ev.slice(0, 400)), DIM,
                              on="role", how="left outer"))
    pipe.apply(ray.data.from_arrow(ev.slice(400)))

    state = pipe.final_state_sorted()
    ch = state.column("channel")
    assert pc.count(ch, mode="only_null").as_py() > 0   # plain-tail rows
    assert pc.count(ch, mode="only_valid").as_py() > 0  # enriched rows
