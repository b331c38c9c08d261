"""Widen-only lake schema evolution (pipelines/cdc.py schema helpers).

Contract under test:

* change events may carry EXTRA value columns beyond the envelope; they
  merge with the exact same max-LSN / per-column-patch-LWW semantics as the
  core columns and WIDEN the committed lake schema
* rows written before a column existed read it as NULL (pad-at-read), on
  every read path: read_lake, point lookup, folds, change feed, views
* the manifest records the evolved column list + Arrow types; time travel
  to a pre-evolution version shows the old schema
* rewrite commits (delta, compaction, repartition, bootstrap, actor
  exchange) preserve the evolved schema
* reserved internal names and per-column type changes are rejected
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    NormalizeStage,
    fold_partition_state,
    merge_partition_table,
    merge_schema_entries,
    extras_schema_b64,
)
from embulk_filter_timestamp_format_ray.functions.casts import CastError
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf

_TS = pa.timestamp("ns", tz="UTC")


def _core_state(convs, lsns):
    n = len(convs)
    return pa.table({
        "conv_id": pa.array(convs), "turn_idx": pa.array([0] * n, pa.int32()),
        "role": pa.array(["user"] * n), "text": pa.array(["t"] * n),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([0] * n, _TS), "lsn": pa.array(lsns, pa.int64()),
    })


def _events(ops, convs, lsns, **extras):
    n = len(convs)
    cols = {
        "op": pa.array(ops), "conv_id": pa.array(convs),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "role": pa.array(["user"] * n), "text": pa.array(["x"] * n),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([0] * n, _TS), "lsn": pa.array(lsns, pa.int64()),
    }
    cols.update(extras)
    return pa.table(cols)


# ------------------------------------------------------------- kernel tier

def test_merge_kernel_widens_prior_without_extra():
    prior = _core_state(["a"], [1])
    fresh = _events(["upsert"], ["b"], [2], lang=pa.array(["en"]))
    state, wm, applied = merge_partition_table(fresh, prior, watermark=-1)
    assert state.schema.names[-1] == "lang"
    by_conv = dict(zip(state.column("conv_id").to_pylist(),
                       state.column("lang").to_pylist()))
    assert by_conv == {"a": None, "b": "en"}
    assert wm == 2 and applied == 1


def test_merge_kernel_pads_fresh_without_extra():
    """An upsert from a source that predates the column resets it to NULL
    (whole-row set semantics)."""
    prior = _core_state(["a"], [1]).append_column("lang", pa.array(["fr"]))
    fresh = _events(["upsert"], ["a"], [2])
    state, _, _ = merge_partition_table(fresh, prior, watermark=1)
    assert state.column("lang").to_pylist() == [None]
    assert state.column("lsn").to_pylist() == [2]


def test_patch_sets_only_extra_column():
    """A patch carrying only the evolved column updates it and keeps every
    core column from the prior row (per-column LWW, column-agnostic)."""
    prior = _core_state(["a"], [1]).append_column("lang", pa.array(["fr"]))
    fresh = _events(["patch"], ["a"], [5], lang=pa.array(["de"]))
    # patch semantics: NULL = unchanged, so null out the core payload
    null_s = pa.scalar(None, pa.string())
    for c in ("role", "text"):
        i = fresh.schema.get_field_index(c)
        fresh = fresh.set_column(i, c, pa.nulls(1, pa.string()))
    fresh = fresh.set_column(fresh.schema.get_field_index("ts"),
                             "ts", pa.nulls(1, _TS))
    state, _, _ = merge_partition_table(fresh, prior, watermark=1)
    row = state.to_pylist()[0]
    assert row["lang"] == "de"
    assert row["role"] == "user" and row["text"] == "t"  # kept from prior
    assert row["lsn"] == 5


def test_fold_pads_heterogeneous_deltas():
    base = _core_state(["a", "b"], [1, 2])
    d1 = _events(["upsert"], ["c"], [3], lang=pa.array(["en"]))
    folded = fold_partition_state(base, [d1])
    assert set(folded.schema.names) == {"conv_id", "turn_idx", "role",
                                        "text", "tool", "ts", "lsn", "lang"}
    langs = dict(zip(folded.column("conv_id").to_pylist(),
                     folded.column("lang").to_pylist()))
    assert langs == {"a": None, "b": None, "c": "en"}


def test_schema_entries_union_is_deterministic():
    t1 = _core_state(["a"], [1]).append_column("zz", pa.array([1], pa.int64()))
    t2 = _core_state(["a"], [1]).append_column("aa", pa.array([0.5]))
    entry = merge_schema_entries(
        {"schema_columns": None},
        [extras_schema_b64(t1), extras_schema_b64(t2)])
    # fresh extras append in sorted-name order regardless of report order
    assert entry["schema_columns"][-2:] == ["aa", "zz"]
    entry2 = merge_schema_entries(
        {"schema_columns": None},
        [extras_schema_b64(t2), extras_schema_b64(t1)])
    assert entry2["schema_columns"] == entry["schema_columns"]


def test_type_conflict_rejected():
    t1 = _core_state(["a"], [1]).append_column("v", pa.array([1], pa.int64()))
    committed = merge_schema_entries({"schema_columns": None},
                                     [extras_schema_b64(t1)])
    committed["partitions"] = {}
    t2 = _core_state(["a"], [1]).append_column("v", pa.array(["s"]))
    with pytest.raises(ValueError, match="type conflict"):
        merge_schema_entries(committed, [extras_schema_b64(t2)])


def test_normalize_passes_extras_and_rejects_reserved():
    ev = expected_event_table(64)
    ev = ev.append_column("lang", pa.array(["en"] * ev.num_rows))
    out = NormalizeStage()(ev)
    assert "lang" in out.schema.names
    assert out.column("lang").to_pylist() == ["en"] * out.num_rows
    bad = ev.append_column("_pid", pa.array([0] * ev.num_rows, pa.int32()))
    with pytest.raises(CastError, match="reserved"):
        NormalizeStage()(bad)


def test_normalize_tombstone_nulls_extras():
    ev = _events(["delete_conv", "upsert"], ["a", "b"], [1, 2],
                 lang=pa.array(["xx", "en"]))
    # NormalizeStage consumes ts_raw/schema_epoch, not ts
    ev = ev.drop_columns(["ts"])
    ev = ev.append_column("ts_raw", pa.array(["1000", "1000"]))
    ev = ev.append_column("schema_epoch", pa.array([0, 0], pa.int8()))
    out = NormalizeStage()(ev)
    by_op = dict(zip(out.column("op").to_pylist(),
                     out.column("lang").to_pylist()))
    assert by_op == {"delete_conv": None, "upsert": "en"}


# ------------------------------------------------------------ lake tier

def _with_lang(tbl: pa.Table) -> pa.Table:
    lsn = np.asarray(tbl.column("lsn").combine_chunks().cast(pa.int64()))
    lang = pc.take(pa.array(["en", "fr", "de"]), pa.array(lsn % 3))
    return tbl.append_column("lang", lang)


def _split(tbl: pa.Table, cut: int):
    lo = tbl.filter(pc.less(tbl.column("lsn"), cut))
    hi = tbl.filter(pc.greater_equal(tbl.column("lsn"), cut))
    return lo, hi


def _expected_lang(lsn: int, cut: int):
    return ["en", "fr", "de"][lsn % 3] if lsn >= cut else None


def _check_lang(tbl: pa.Table, cut: int):
    for conv, lsn, lang in zip(tbl.column("conv_id").to_pylist(),
                               tbl.column("lsn").to_pylist(),
                               tbl.column("lang").to_pylist()):
        assert lang == _expected_lang(lsn, cut), (conv, lsn)


def test_evolution_end_to_end(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(3000)
    lo, hi = _split(full, 1500)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=8)
    pipe.apply(ray.data.from_arrow(lo))
    pipe.apply(ray.data.from_arrow(_with_lang(hi)))

    m = mf.read_manifest(lake)
    assert m["schema_columns"] == ["conv_id", "turn_idx", "role", "text",
                                   "tool", "ts", "lsn", "lang"]
    final = pipe.final_state_sorted()
    assert "lang" in final.schema.names
    _check_lang(final, 1500)

    # column-pruned evolved read
    two = pipe.read_lake(columns=["conv_id", "lang"])
    assert two.schema().names == ["conv_id", "lang"]

    # point lookup carries the evolved column
    conv = final.column("conv_id")[0].as_py()
    look = pipe.read_conversation(conv)
    assert "lang" in look.schema.names
    _check_lang(look, 1500)

    # time travel: v1 predates the column
    assert "lang" not in pipe.read_lake_at(1).schema().names

    # invariants hold on the evolved lake
    assert pipe.fsck()["violations"] == []

    # change feed with evolved payload across the evolution boundary
    feed = pipe.lake_changes(1, 2, columns=["lang"]).take_all()
    assert feed, "evolution commit must produce changes"
    for r in feed:
        if r["change_type"] in ("insert", "update"):
            assert r["lang"] == _expected_lang(r["lsn"], 1500)


def test_unknown_column_error_names_evolved_schema(ray_session, tmp_path):
    import ray.data

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(
        _with_lang(expected_event_table(300))))
    with pytest.raises(ValueError, match="lang"):
        pipe.read_lake(columns=["conv_id", "nope"])


def test_delta_commits_and_compaction_preserve_extras(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(2400)
    lo, hi = _split(full, 1200)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=8)
    pipe.apply(ray.data.from_arrow(lo))
    pipe.apply_delta(ray.data.from_arrow(_with_lang(hi)))

    m = mf.read_manifest(lake)
    assert m["schema_columns"][-1] == "lang"
    folded = pipe.final_state_sorted()
    _check_lang(folded, 1200)

    pipe.compact_deltas()
    assert not mf.has_deltas(mf.read_manifest(lake))
    compacted = pipe.final_state_sorted()
    assert compacted.equals(folded.select(compacted.schema.names)) or (
        compacted.num_rows == folded.num_rows)
    _check_lang(compacted, 1200)


def test_repartition_preserves_evolved_schema(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(1600)
    lo, hi = _split(full, 800)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(lo))
    pipe.apply(ray.data.from_arrow(_with_lang(hi)))
    before = pipe.final_state_sorted()

    pipe.repartition_lake(12)
    m = mf.read_manifest(lake)
    assert m["schema_columns"][-1] == "lang"
    after = pipe.final_state_sorted()
    assert after.equals(before)
    assert pipe.fsck()["violations"] == []


def test_read_merged_overlay_shows_pending_extra(ray_session, tmp_path):
    import ray.data

    full = expected_event_table(1000)
    lo, hi = _split(full, 500)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(lo))
    # pending (uncommitted) events carry a column the lake has never seen
    view = pipe.read_merged(ray.data.from_arrow(_with_lang(hi)))
    tbl = pa.concat_tables(
        [b for b in view.iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    assert "lang" in tbl.schema.names
    _check_lang(tbl, 500)
    # the lake itself is untouched (view-only overlay)
    assert "lang" not in mf.read_manifest(lake).get("schema_columns")


def test_bootstrap_with_extra_column(ray_session, tmp_path):
    import ray.data

    snap = pa.table({
        "conv_id": pa.array(["a", "b"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["t1", "t2"]),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([0, 0], _TS),
        "lang": pa.array(["en", "fr"]),
    })
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.bootstrap(ray.data.from_arrow(snap), snapshot_lsn=10)
    m = mf.read_manifest(lake)
    assert m["schema_columns"][-1] == "lang"
    final = pipe.final_state_sorted()
    assert dict(zip(final.column("conv_id").to_pylist(),
                    final.column("lang").to_pylist())) == {"a": "en",
                                                           "b": "fr"}


def test_actor_exchange_commits_evolved_schema(ray_session, tmp_path):
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
        apply_with_actor_exchange,
    )

    full = expected_event_table(1200)
    lo, hi = _split(full, 600)
    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    apply_with_actor_exchange(pipe, ray.data.from_arrow(lo))
    apply_with_actor_exchange(pipe, ray.data.from_arrow(_with_lang(hi)))
    m = mf.read_manifest(lake)
    assert m["schema_columns"][-1] == "lang"
    _check_lang(pipe.final_state_sorted(), 600)


def test_fsck_flags_uncommitted_column_and_type_drift(ray_session, tmp_path):
    """A file column outside the committed schema (or with a drifted type)
    is an fsck violation — readers' NULL-padding must never silently mask
    a writer that bypassed merge_schema_entries."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(400)))
    assert pipe.fsck()["violations"] == []

    m = mf.read_manifest(lake)
    rel = next(p["path"] for p in m["partitions"].values() if p.get("path"))
    full = os.path.join(lake, rel)
    t = pq.read_table(full)
    pq.write_table(t.append_column("rogue", pa.nulls(t.num_rows, pa.int64())),
                   full)
    rep = pipe.fsck()
    assert any("rogue" in v["problems"] for v in rep["violations"])

    # type drift on a committed column
    pq.write_table(t.set_column(t.schema.get_field_index("lsn"), "lsn",
                                t.column("lsn").cast(pa.int32())), full)
    rep = pipe.fsck()
    assert any("lsn" in v["problems"] and "type" in v["problems"]
               for v in rep["violations"])


def test_evolve_events_equals_midstream_appearance(ray_session, tmp_path):
    """The CLI's evolution traffic (evolve_batch: column on every row, NULL
    below the boundary) commits the same end state as a true mid-stream
    column appearance (column absent before the boundary)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.sources.changegen import (
        evolve_batch,
    )

    full = expected_event_table(1600)
    cut = 800
    lo, hi = _split(full, cut)

    mid = CDCPipeline(str(tmp_path / "mid"), num_partitions=4)
    mid.apply(ray.data.from_arrow(lo))
    mid.apply(ray.data.from_arrow(_with_lang(hi)))

    cli = CDCPipeline(str(tmp_path / "cli"), num_partitions=4)
    cli.apply(ray.data.from_arrow(evolve_batch(lo, cut)))
    cli.apply(ray.data.from_arrow(evolve_batch(hi, cut)))

    a, b = mid.final_state_sorted(), cli.final_state_sorted()
    assert a.equals(b.select(a.schema.names))


def test_sync_mirror_across_evolution_boundary(ray_session, tmp_path):
    """A consumer that starts shipping an evolved payload column
    mid-history folds cleanly: pre-evolution snapshot rows read the
    column as NULL, post-evolution change rows carry its values."""
    import ray.data

    full = expected_event_table(800)
    lo, hi = _split(full, 400)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4)
    mirror = str(tmp_path / "mirror")
    pipe.apply(ray.data.from_arrow(lo))
    assert pipe.sync_changes(mirror)["mode"] == "snapshot"  # core columns
    pipe.apply(ray.data.from_arrow(_with_lang(hi)))
    assert pipe.sync_changes(
        mirror, columns=("role", "text", "tool", "ts", "lang"))["mode"] \
        == "changes"

    got = pa.concat_tables(
        [b for b in CDCPipeline.read_sync_mirror(mirror)
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    exp = pipe.final_state_sorted()
    assert got.num_rows == exp.num_rows
    g = {(c, t): l for c, t, l in zip(got.column("conv_id").to_pylist(),
                                      got.column("turn_idx").to_pylist(),
                                      got.column("lang").to_pylist())}
    for c, t, lsn, lang in zip(exp.column("conv_id").to_pylist(),
                               exp.column("turn_idx").to_pylist(),
                               exp.column("lsn").to_pylist(),
                               exp.column("lang").to_pylist()):
        # mirror winners whose post-image shipped in the change window
        # carry lang; snapshot-era rows read NULL
        assert g[(c, t)] == (lang if lsn >= 400 else None), (c, t)


def test_dlq_reprocess_preserves_extras(ray_session, tmp_path):
    import ray.data

    from embulk_filter_timestamp_format_ray.config import ColumnConfig

    full = expected_event_table(600)
    ev = _with_lang(full)
    # epoch 7 is unconfigured → quarantined with its lang payload
    epochs = ev.column("schema_epoch").to_pylist()
    lsns = ev.column("lsn").to_pylist()
    poisoned = [7 if lsn % 5 == 0 else e for e, lsn in zip(epochs, lsns)]
    i = ev.schema.get_field_index("schema_epoch")
    ev = ev.set_column(i, "schema_epoch", pa.array(poisoned, pa.int8()))

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    stats = pipe.apply(ray.data.from_arrow(ev))
    assert stats["events_quarantined"] > 0
    dlq = pipe.read_dlq()
    assert "lang" in dlq.column_names

    # heal: epoch 7 events were epoch-0-style strings? no — they carry the
    # ORIGINAL raw ts; reprocess under a spec that parses epoch 1/2 rows.
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        DEFAULT_EPOCH_SPECS,
        EPOCH1_FORMAT,
    )

    specs = dict(DEFAULT_EPOCH_SPECS)
    specs[7] = ColumnConfig("ts_raw", "timestamp",
                            from_format=(EPOCH1_FORMAT, "%Q",
                                         DEFAULT_EPOCH_SPECS[2].from_format[0]),
                            from_timezone="UTC")
    healed = pipe.reprocess_dlq(epoch_specs=specs)
    assert healed["events_applied"] > 0
    final = pipe.final_state_sorted()
    assert "lang" in final.schema.names
    # every surviving row keeps its generator-derived lang
    _check_lang(final, 0)
