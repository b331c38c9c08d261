"""Multi-table / multi-tenant fan-out (pipelines/cdc.py apply_multi).

Contract under test:

* ONE normalize + ONE composite-pid exchange routes a mixed change stream
  into N independent lakes; each lake's commit is exactly-once with its
  own watermarks, manifest, and OCC domain
* per-lake state equals applying that table's filtered stream alone —
  including when tables SHARE merge keys (the map-side combine must never
  fold across tables)
* replays dedup per lake; lakes may differ in partition count; unknown
  table values and MIXED dlq configs are refused
* with dlq on everywhere, each lake quarantines its own tagged rows
  through the same composite exchange (reserved negative pids) and
  matches the single-lake dlq reference bit-for-bit
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    apply_multi,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf


def _tagged(tbl: pa.Table, rule: str = "parity") -> pa.Table:
    """Deterministic table tag: conv id parity (disjoint key spaces) or
    lsn parity (OVERLAPPING key spaces across tables)."""
    if rule == "parity":
        digits = pc.cast(pc.utf8_slice_codeunits(
            tbl.column("conv_id"), 5, 99), pa.int64())
        tag = pc.if_else(pc.equal(pc.bit_wise_and(digits, 1), 0),
                         pa.scalar("a"), pa.scalar("b"))
    else:  # lsn parity — both tables see the same conv/turn keys
        tag = pc.if_else(pc.equal(pc.bit_wise_and(tbl.column("lsn"), 1), 0),
                         pa.scalar("a"), pa.scalar("b"))
    return tbl.append_column("table", tag)


def _single_lake_reference(tmp_path, events: pa.Table, name: str,
                           partitions: int) -> pa.Table:
    import ray.data

    pipe = CDCPipeline(str(tmp_path / name), num_partitions=partitions)
    pipe.apply(ray.data.from_arrow(events.drop_columns(["table"])))
    return pipe.final_state_sorted()


@pytest.mark.parametrize("rule", ["parity", "lsn"])
def test_multi_matches_per_table_reference(ray_session, tmp_path, rule):
    import ray.data

    events = _tagged(expected_event_table(2000), rule)
    pipes = {
        "a": CDCPipeline(str(tmp_path / "lake_a"), num_partitions=4),
        "b": CDCPipeline(str(tmp_path / "lake_b"), num_partitions=6),
    }
    stats = apply_multi(ray.data.from_arrow(events), pipes)
    assert set(stats) == {"a", "b"}
    assert all(s["events_applied"] > 0 for s in stats.values())

    for t in ("a", "b"):
        sub = events.filter(pc.equal(events.column("table"), t))
        ref = _single_lake_reference(tmp_path, sub, f"ref_{t}",
                                     pipes[t].num_partitions)
        got = pipes[t].final_state_sorted()
        assert got.equals(ref), f"table {t} diverged from its solo replay"
        assert pipes[t].fsck()["violations"] == []


def test_multi_replay_is_exactly_once(ray_session, tmp_path):
    import ray.data

    events = _tagged(expected_event_table(1200))
    pipes = {
        "a": CDCPipeline(str(tmp_path / "lake_a"), num_partitions=4),
        "b": CDCPipeline(str(tmp_path / "lake_b"), num_partitions=4),
    }
    apply_multi(ray.data.from_arrow(events), pipes)
    before = {t: pipes[t].final_state_sorted() for t in pipes}
    again = apply_multi(ray.data.from_arrow(events), pipes)
    assert all(s["events_applied"] == 0 for s in again.values())
    for t in pipes:
        assert pipes[t].final_state_sorted().equals(before[t])


def test_multi_incremental_chunks_advance_watermarks(ray_session, tmp_path):
    import ray.data

    events = _tagged(expected_event_table(1600))
    cut = pa.scalar(800, pa.int64())
    lo = events.filter(pc.less(events.column("lsn"), cut))
    hi = events.filter(pc.greater_equal(events.column("lsn"), cut))
    pipes = {
        "a": CDCPipeline(str(tmp_path / "lake_a"), num_partitions=4),
        "b": CDCPipeline(str(tmp_path / "lake_b"), num_partitions=4),
    }
    apply_multi(ray.data.from_arrow(lo), pipes)
    apply_multi(ray.data.from_arrow(hi), pipes)
    for t in ("a", "b"):
        sub = events.filter(pc.equal(events.column("table"), t))
        ref = _single_lake_reference(tmp_path, sub, f"ref_{t}", 4)
        assert pipes[t].final_state_sorted().equals(ref)
        assert pipes[t].resume_lsn() > 0


def test_multi_delta_mode_matches_base_mode(ray_session, tmp_path):
    """delta=True fan-out commits merge-on-read delta files per lake; the
    folded state equals base-mode fan-out, and per-lake compaction clears
    the backlogs without changing state."""
    import ray.data

    events = _tagged(expected_event_table(1600), "lsn")
    cut = pa.scalar(800, pa.int64())
    lo = events.filter(pc.less(events.column("lsn"), cut))
    hi = events.filter(pc.greater_equal(events.column("lsn"), cut))

    base_pipes = {
        "a": CDCPipeline(str(tmp_path / "base_a"), num_partitions=4),
        "b": CDCPipeline(str(tmp_path / "base_b"), num_partitions=4),
    }
    apply_multi(ray.data.from_arrow(lo), base_pipes)
    apply_multi(ray.data.from_arrow(hi), base_pipes)

    delta_pipes = {
        "a": CDCPipeline(str(tmp_path / "delta_a"), num_partitions=4),
        "b": CDCPipeline(str(tmp_path / "delta_b"), num_partitions=4),
    }
    apply_multi(ray.data.from_arrow(lo), delta_pipes)  # base seed
    stats = apply_multi(ray.data.from_arrow(hi), delta_pipes, delta=True)
    assert all(s["events_applied"] > 0 for s in stats.values())
    for t in ("a", "b"):
        assert mf.has_deltas(mf.read_manifest(delta_pipes[t].lake_dir))
        assert delta_pipes[t].final_state_sorted().equals(
            base_pipes[t].final_state_sorted())
        delta_pipes[t].compact_deltas()
        assert not mf.has_deltas(mf.read_manifest(delta_pipes[t].lake_dir))
        assert delta_pipes[t].final_state_sorted().equals(
            base_pipes[t].final_state_sorted())


def test_multi_refuses_bad_config(ray_session, tmp_path):
    import ray.data

    events = _tagged(expected_event_table(200))
    same = str(tmp_path / "same")
    with pytest.raises(ValueError, match="distinct"):
        apply_multi(ray.data.from_arrow(events), {
            "a": CDCPipeline(same, num_partitions=2),
            "b": CDCPipeline(same, num_partitions=2),
        })
    # MIXED dlq configs refused (all-on is supported; see
    # test_multi_dlq_matches_per_table_reference)
    with pytest.raises(ValueError, match="dlq"):
        apply_multi(ray.data.from_arrow(events), {
            "a": CDCPipeline(str(tmp_path / "la"), num_partitions=2,
                             dlq=True),
            "b": CDCPipeline(str(tmp_path / "lb"), num_partitions=2),
        })


def _with_poison(tagged: pa.Table, n_clean: int) -> pa.Table:
    """Two poison rows per table (lsns beyond the clean range)."""
    bad = pa.Table.from_pylist([
        {"lsn": n_clean + 0, "op": "bogus", "conv_id": "conv-bad",
         "turn_idx": 0, "role": "user", "text": "bad op", "tool": None,
         "ts_raw": "1704067200000", "schema_epoch": 0, "table": "a"},
        {"lsn": n_clean + 1, "op": "upsert", "conv_id": None,
         "turn_idx": 1, "role": "user", "text": "no conv", "tool": None,
         "ts_raw": "1704067200000", "schema_epoch": 0, "table": "a"},
        {"lsn": n_clean + 2, "op": "upsert", "conv_id": "conv-epoch9",
         "turn_idx": 2, "role": "user", "text": "future epoch", "tool": None,
         "ts_raw": "2024-01-01T00:00:00Z", "schema_epoch": 9, "table": "b"},
        {"lsn": n_clean + 3, "op": "upsert", "conv_id": "conv-unparse",
         "turn_idx": 3, "role": "user", "text": "bad ts", "tool": None,
         "ts_raw": "not a timestamp", "schema_epoch": 1, "table": "b"},
    ], schema=tagged.schema)
    return pa.concat_tables([tagged, bad])


def test_multi_dlq_matches_per_table_reference(ray_session, tmp_path):
    """Fan-out with dlq on: each lake's state AND quarantine equal the
    single-lake dlq apply of that table's filtered stream; replays stay
    exactly-once for state and at-least-once for the quarantine."""
    import ray.data

    n = 2000
    events = _with_poison(_tagged(expected_event_table(n)), n)
    pipes = {
        "a": CDCPipeline(str(tmp_path / "lake_a"), num_partitions=4,
                         dlq=True),
        "b": CDCPipeline(str(tmp_path / "lake_b"), num_partitions=6,
                         dlq=True),
    }
    stats = apply_multi(ray.data.from_arrow(events), pipes)
    assert {t: s["events_quarantined"] for t, s in stats.items()} == \
           {"a": 2, "b": 2}

    def dlq_sorted(p):
        t = p.read_dlq()
        return t.take(pc.sort_indices(
            t, sort_keys=[("lsn", "ascending")])).to_pylist()

    for t in ("a", "b"):
        sub = events.filter(pc.equal(events.column("table"), t))
        ref = CDCPipeline(str(tmp_path / f"ref_{t}"),
                          num_partitions=pipes[t].num_partitions, dlq=True)
        ref.apply(ray.data.from_arrow(sub.drop_columns(["table"])))
        assert pipes[t].final_state_sorted().equals(ref.final_state_sorted())
        assert dlq_sorted(pipes[t]) == dlq_sorted(ref)
        assert pipes[t].fsck()["violations"] == []

    again = apply_multi(ray.data.from_arrow(events), pipes)
    assert all(s["events_applied"] == 0 for s in again.values())
    assert {t: s["events_quarantined"] for t, s in again.items()} == \
           {"a": 2, "b": 2}
    assert pipes["a"].read_dlq().num_rows == 4


def test_multi_unknown_table_value_aborts(ray_session, tmp_path):
    import ray.data

    events = _tagged(expected_event_table(200))
    i = events.schema.get_field_index("table")
    events = events.set_column(
        i, "table", pa.array(["zzz"] * events.num_rows))
    pipes = {"a": CDCPipeline(str(tmp_path / "lake_a"), num_partitions=2)}
    with pytest.raises(Exception, match="zzz"):
        apply_multi(ray.data.from_arrow(events), pipes)


def test_multi_evolution_flows_through_fanout(ray_session, tmp_path):
    """Schema evolution composes with the fan-out: an extra column on the
    mixed stream (values on table a's rows, NULL on b's) widens BOTH
    lakes — a's rows carry the values, b's read NULL."""
    import ray.data

    events = _tagged(expected_event_table(1000))
    is_a = pc.equal(events.column("table"), "a")
    lsn = np.asarray(events.column("lsn").combine_chunks().cast(pa.int64()))
    lang = pc.take(pa.array(["en", "fr", "de"]), pa.array(lsn % 3))
    events = events.append_column(
        "lang", pc.if_else(is_a, lang, pa.scalar(None, pa.string())))
    pipes = {
        "a": CDCPipeline(str(tmp_path / "lake_a"), num_partitions=4),
        "b": CDCPipeline(str(tmp_path / "lake_b"), num_partitions=4),
    }
    apply_multi(ray.data.from_arrow(events), pipes)
    m_a = mf.read_manifest(pipes["a"].lake_dir)
    assert m_a["schema_columns"][-1] == "lang"
    state_a = pipes["a"].final_state_sorted()
    assert all(v is not None for v in state_a.column("lang").to_pylist())
    state_b = pipes["b"].final_state_sorted()
    if "lang" in state_b.column_names:
        assert all(v is None for v in state_b.column("lang").to_pylist())
