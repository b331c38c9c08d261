"""End-to-end CDC replay tests (FIXTURES.md F2 / SURVEY.md §5 plan):

* full replay incl. duplicated + reordered events and all three
  schema-evolution epochs must equal the sequentially-applied oracle under
  per-turn text equality and stable (conv_id, turn_idx) ordering
* re-applying an overlapping stream (crash/restart simulation) converges to
  the same state (idempotent replay via per-partition LSN watermarks)
* exactly-once: a failed (uncommitted) txn leaves the committed state
  untouched; orphan files are GC-able
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.functions.parser import TimestampParser
from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    NormalizeStage,
    merge_partition_table,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    EPOCH1_FORMAT,
    EPOCH2_FORMAT,
    EPOCH2_TZ,
    ROLE_RENAMES_EPOCH2,
    change_events,
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf

N_EVENTS = 4000


def sequential_oracle(num_events: int, seed: int = 42,
                      lsn_below: "int | None" = None) -> "dict[tuple, dict]":
    """Apply the pure (replay-free) event stream one-by-one in lsn order;
    ``lsn_below`` folds only the stream prefix (same generator params)."""
    tbl = expected_event_table(num_events, seed=seed)
    renames = {v: k for k, v in ROLE_RENAMES_EPOCH2.items()}
    parsers = {
        0: TimestampParser(["%Q"], "UTC"),
        1: TimestampParser([EPOCH1_FORMAT], "UTC"),
        2: TimestampParser([EPOCH2_FORMAT], EPOCH2_TZ),
    }
    state: dict[tuple, dict] = {}
    for row in tbl.to_pylist():
        if lsn_below is not None and row["lsn"] >= lsn_below:
            continue
        key = (row["conv_id"], row["turn_idx"])
        if row["op"] == "delete":
            state.pop(key, None)
            continue
        ts = parsers[row["schema_epoch"]].parse(row["ts_raw"])
        state[key] = {
            "role": renames.get(row["role"], row["role"]),
            "text": row["text"], "tool": row["tool"],
            "ts_ns": ts.ns, "lsn": row["lsn"],
        }
    return state


def _lake_as_dict(pipeline: CDCPipeline) -> "dict[tuple, dict]":
    final = pipeline.final_state_sorted()
    out = {}
    for row in final.to_pylist():
        key = (row["conv_id"], row["turn_idx"])
        assert key not in out, f"duplicate merge key {key} in lake"
        ts = row["ts"]
        out[key] = {
            "role": row["role"], "text": row["text"], "tool": row["tool"],
            "ts_ns": int(ts.timestamp() * 1e9) if ts else None, "lsn": row["lsn"],
        }
    return out


def _assert_matches_oracle(lake: dict, oracle: dict):
    assert set(lake) == set(oracle)
    for key in oracle:
        got, exp = lake[key], oracle[key]
        assert got["text"] == exp["text"], key          # per-turn text equality
        assert got["role"] == exp["role"], key
        assert got["tool"] == exp["tool"], key
        assert got["lsn"] == exp["lsn"], key
        # ts equality at ns resolution (float roundtrip in test helper only)
        assert abs(got["ts_ns"] - exp["ts_ns"]) < 1000, key


@pytest.fixture(scope="module")
def oracle():
    return sequential_oracle(N_EVENTS)


def test_full_replay_matches_oracle(ray_session, tmp_path_factory, oracle):
    lake = str(tmp_path_factory.mktemp("lake_full"))
    pipe = CDCPipeline(lake, num_partitions=16)
    events = change_events(N_EVENTS, seed=42, parallelism=8)
    stats = pipe.apply(events)
    assert stats["events_applied"] > 0
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_incremental_apply_in_epoch_chunks(ray_session, tmp_path_factory, oracle):
    # three applies (one per schema epoch window) — exercises schema
    # unification against prior state + watermark advance
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_inc"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    thirds = [full.slice(0, 1500), full.slice(1500, 1000), full.slice(2500)]
    versions = []
    for chunk in thirds:
        stats = pipe.apply(ray.data.from_arrow(chunk))
        versions.append(stats["version"])
    assert versions == [1, 2, 3]
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_scd2_lake_invariants(ray_session, tmp_path_factory):
    """Lake-level SCD2 (CDCPipeline.scd2): current rows ≡ final lake state,
    closed intervals end at a later retained version, and every key that
    vanished from the lake has a closed last interval."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_scd2"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    for chunk in (full.slice(0, 1500), full.slice(1500, 1000),
                  full.slice(2500)):
        pipe.apply(ray.data.from_arrow(chunk))

    hist = pa.Table.from_pylist(pipe.scd2(columns=("role",)).take_all())
    cur = hist.filter(hist.column("is_current"))
    # 1) current slice == final lake state (key, lsn, role)
    lake_rows = {(r["conv_id"], r["turn_idx"]): (r["lsn"], r["role"])
                 for r in pipe.read_lake(
                     columns=["conv_id", "turn_idx", "lsn", "role"]
                 ).take_all()}
    cur_rows = {(r["conv_id"], r["turn_idx"]): (r["lsn"], r["role"])
                for r in cur.to_pylist()}
    assert cur_rows == lake_rows and len(cur_rows) == cur.num_rows
    # 2) every interval is well-formed; closed ⟺ not current
    for r in hist.to_pylist():
        if r["is_current"]:
            assert r["valid_to_version"] is None
        else:
            assert r["valid_to_version"] is not None
            assert r["valid_to_version"] > r["valid_from_version"]
            assert r["valid_to_version"] in (2, 3)
    # 3) a key deleted from the lake appears only as closed history
    gone = [r for r in hist.to_pylist()
            if (r["conv_id"], r["turn_idx"]) not in lake_rows]
    assert gone, "stream contains deletes; some history must be closed"
    assert all(not r["is_current"] for r in gone)


def test_timestamp_as_of(ray_session, tmp_path_factory):
    """TIMESTAMP AS OF: version_at resolves the latest retained commit at
    or before a wall-clock instant; read_lake_at_ts equals the versioned
    read; pre-history timestamps refuse."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_tsaof"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2000)))
    pipe.apply(ray.data.from_arrow(full.slice(2000)))
    hist = {r["version"]: r["committed_at_unix_ms"] for r in pipe.history()}
    assert set(hist) == {1, 2} and hist[2] >= hist[1]
    assert pipe.version_at(hist[1]) in (1, 2)  # ms ties resolve forward
    if hist[2] > hist[1]:
        assert pipe.version_at(hist[1]) == 1
        assert pipe.version_at(hist[2] - 1) == 1
    assert pipe.version_at(hist[2]) == 2
    assert pipe.version_at(hist[2] + 10_000) == 2
    rows_ts = sorted((r["conv_id"], r["turn_idx"], r["lsn"]) for r in
                     pipe.read_lake_at_ts(
                         hist[2], columns=["conv_id", "turn_idx", "lsn"]
                     ).take_all())
    rows_v = sorted((r["conv_id"], r["turn_idx"], r["lsn"]) for r in
                    pipe.read_lake_at(
                        2, columns=["conv_id", "turn_idx", "lsn"]
                    ).take_all())
    assert rows_ts == rows_v
    with pytest.raises(ValueError, match="no retained version"):
        pipe.version_at(hist[1] - 1_000_000)


def test_scd2_tier_parity(ray_session, tmp_path_factory):
    """The feed and snapshot scd2 tiers produce IDENTICAL history on the
    same lake (incl. payload columns); auto dispatch picks snapshot on
    this dense-update fixture (most partitions change every version)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_scd2_tiers"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    for chunk in (full.slice(0, 1500), full.slice(1500, 1000),
                  full.slice(2500)):
        pipe.apply(ray.data.from_arrow(chunk))

    def rows(mode):
        return sorted(map(tuple, (
            (r["conv_id"], r["turn_idx"], r["lsn"], r["role"],
             r["valid_from_version"], r["valid_to_version"],
             r["is_current"])
            for r in pipe.scd2(columns=("role",), mode=mode).take_all())))

    feed = rows("feed")
    snap = rows("snapshot")
    assert feed == snap and len(feed) > 0
    assert pipe._scd2_changed_fraction(pipe.versions()) > \
        CDCPipeline.SCD2_SNAPSHOT_FRACTION
    with pytest.raises(ValueError, match="unknown scd2 mode"):
        pipe.scd2(mode="bogus")


def test_scd2_interop_repartition_and_rollback(ray_session,
                                               tmp_path_factory):
    """SCD2 across layout/lineage maintenance: a repartition commit is a
    pure rewrite (empty change feed) so the history is IDENTICAL before
    and after it; a rollback closes the undone intervals at the rollback
    version and re-opens the restored state, whose current slice equals
    the rolled-back snapshot."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_scd2_interop"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2000)))
    pipe.apply(ray.data.from_arrow(full.slice(2000)))

    def rows(p):
        return sorted(
            (r["conv_id"], r["turn_idx"], r["lsn"],
             r["valid_from_version"], r["valid_to_version"],
             r["is_current"])
            for r in p.scd2(columns=()).take_all())

    base = rows(pipe)
    pipe.repartition_lake(8)
    pipe2 = CDCPipeline.from_lake(lake)
    assert rows(pipe2) == base  # rewrite commit = empty feed = no intervals

    pipe2.rollback(1)
    hist = pipe2.scd2(columns=()).take_all()
    cur = {(r["conv_id"], r["turn_idx"]): r["lsn"]
           for r in hist if r["is_current"]}
    want = {(r["conv_id"], r["turn_idx"]): r["lsn"]
            for r in pipe2.read_lake(
                columns=["conv_id", "turn_idx", "lsn"]).take_all()}
    v1 = {(r["conv_id"], r["turn_idx"]): r["lsn"]
          for r in pipe2.read_lake_at(
              1, columns=["conv_id", "turn_idx", "lsn"]).take_all()}
    assert cur == want == v1
    # every interval the rollback closed ends exactly at the new head
    head = max(r["valid_from_version"] for r in hist)
    closed_at_head = [r for r in hist
                      if r["valid_to_version"] == head]
    assert head > 2 and closed_at_head, \
        "rollback must close the undone intervals at the restored head"


def test_restart_overlapping_stream_idempotent(ray_session, tmp_path_factory, oracle):
    # crash-restart: re-deliver an overlapping suffix; watermarks make the
    # replayed prefix a no-op
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_restart"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    before = _lake_as_dict(pipe)
    # restart re-reads from an older offset: delivers [1000, N) again
    pipe2 = CDCPipeline(lake, num_partitions=16)
    stats = pipe2.apply(ray.data.from_arrow(full.slice(1000)))
    assert stats["events_applied"] <= N_EVENTS - 2500 + 16  # replays dropped
    _assert_matches_oracle(_lake_as_dict(pipe2), oracle)
    # prefix state unchanged for keys not touched after lsn 2500
    assert set(before) <= set(_lake_as_dict(pipe2)) | set(before)


def test_exactly_once_uncommitted_txn_invisible(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_2pc"))
    pipe = CDCPipeline(lake, num_partitions=4)
    full = expected_event_table(500)
    pipe.apply(ray.data.from_arrow(full))
    committed = mf.read_manifest(lake)
    # simulate a crashed txn: orphan staged files, no manifest swap
    orphan = os.path.join(lake, "txn-deadbeef")
    os.makedirs(orphan)
    pa.parquet.write_table(pa.table({"x": [1]}), os.path.join(orphan, "part-00000.parquet"))
    assert mf.read_manifest(lake) == committed  # commit point untouched
    removed = mf.gc_orphan_txns(lake, keep_txns=set())
    assert "txn-deadbeef" in removed
    # live files survive GC
    for p in mf.data_files(mf.read_manifest(lake)):
        assert os.path.exists(os.path.join(lake, p))


def test_merge_task_retry_idempotent(ray_session, tmp_path_factory):
    """At-least-once execution: invoking the merge applier twice for the
    same group (a retried task) writes identical staged content and the
    commit is unaffected."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        MergeApplier,
        NormalizeStage,
    )
    from embulk_filter_timestamp_format_ray.stages.partition import PartitionStage

    lake = str(tmp_path_factory.mktemp("lake_retry"))
    events = expected_event_table(300)
    normalized = NormalizeStage()(events)
    parted = PartitionStage(1)(normalized)
    applier = MergeApplier(lake, "txnretry", {})
    r1 = applier(parted).to_pylist()[0]
    r2 = applier(parted).to_pylist()[0]  # retry: same group, same txn
    assert r1 == r2
    import pyarrow.parquet as pq

    t = pq.read_table(f"{lake}/{r1['path']}")
    assert t.num_rows == r1["rows"]


def test_conv_partition_mode_and_point_lookup(ray_session, tmp_path_factory, oracle):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_conv"))
    pipe = CDCPipeline(lake, num_partitions=16, partition_mode="conv")
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)  # same final state
    # point lookup reads one partition and returns ordered turns
    conv = next(iter(oracle))[0]
    t = pipe.read_conversation(conv)
    assert t.num_rows == sum(1 for k in oracle if k[0] == conv)
    turns = t.column("turn_idx").to_pylist()
    assert turns == sorted(turns)
    # turn-mode lookup returns identical rows (slow path)
    lake2 = str(tmp_path_factory.mktemp("lake_turn"))
    pipe2 = CDCPipeline(lake2, num_partitions=16)
    pipe2.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    t2 = pipe2.read_conversation(conv)
    assert t2.select(["conv_id", "turn_idx", "text"]).equals(
        t.select(["conv_id", "turn_idx", "text"]))


def test_conv_mode_with_salted_hot_keys(ray_session, tmp_path_factory, oracle):
    """Salting hot conversations (conv mode) must not change the final
    state: the salt derives from turn_idx, so every (conv, turn) key still
    lands on a stable partition."""
    import ray.data

    hot = frozenset(k[0] for k in list(oracle)[:5])
    lake = str(tmp_path_factory.mktemp("lake_salt"))
    pipe = CDCPipeline(lake, num_partitions=16, partition_mode="conv",
                       salt_keys=hot)
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # incremental apply re-finds the salted partitions
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_transcript_analytics_over_lake(ray_session, tmp_path_factory):
    """Composition over the engine's own lake: CDC replay → per-conversation
    aggregates (turn counts, roles, duration) via grouped_aggregate — the
    lake is a first-class queryable table."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.relational import grouped_aggregate

    lake = str(tmp_path_factory.mktemp("lake_analytics"))
    pipe = CDCPipeline(lake, num_partitions=8)
    pipe.apply(ray.data.from_arrow(expected_event_table(2000)))
    lake_ds = pipe.read_lake().map_batches(
        lambda b: b.append_column("ts_ns", b.column("ts").cast(
            pa.timestamp("ns")).cast(pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    stats = grouped_aggregate(
        lake_ds, keys=["conv_id"],
        aggs={"n_turns": ("turn_idx", "count"),
              "first_ts": ("ts_ns", "min"),
              "last_ts": ("ts_ns", "max"),
              "max_lsn": ("lsn", "max")}).to_pandas()
    # cross-check against a driver-side pandas computation on the same lake
    flat = pipe.final_state_sorted().to_pandas()
    flat["ts_ns"] = flat["ts"].astype("datetime64[ns, UTC]").astype("int64")
    expect = flat.groupby("conv_id").agg(
        n_turns=("turn_idx", "count"), first_ts=("ts_ns", "min"),
        last_ts=("ts_ns", "max"), max_lsn=("lsn", "max")).reset_index()
    got = stats.sort_values("conv_id").reset_index(drop=True)
    expect = expect.sort_values("conv_id").reset_index(drop=True)
    assert got.equals(expect[got.columns])


def test_export_formatted(ray_session, tmp_path_factory):
    import os

    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_export"))
    out = str(tmp_path_factory.mktemp("export_out"))
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(400)))
    pipe.export_formatted(out, to_format="%Y-%m-%d %H:%M:%S", to_timezone="Asia/Tokyo")
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    t = pa.concat_tables([pq.read_table(os.path.join(out, f)) for f in files])
    assert t.num_rows == pipe.final_state_sorted().num_rows
    assert t.schema.field("ts").type == pa.string()
    sample = t.column("ts").to_pylist()[0]
    assert len(sample) == 19 and sample[4] == "-" and sample[13] == ":"


def test_merge_semantics_unit():
    ts = pa.array([0], pa.timestamp("ns", tz="UTC"))

    def ev(lsn, op, conv, turn, text):
        return pa.table({
            "lsn": pa.array([lsn], pa.int64()), "op": pa.array([op]),
            "conv_id": pa.array([conv]), "turn_idx": pa.array([turn], pa.int32()),
            "role": pa.array(["user"]), "text": pa.array([text]),
            "tool": pa.array([None], pa.string()), "ts": ts,
        })

    delta = pa.concat_tables([
        ev(1, "upsert", "c1", 0, "v1"),
        ev(2, "upsert", "c1", 0, "v2"),     # supersedes lsn 1
        ev(2, "upsert", "c1", 0, "v2"),     # exact duplicate (replay)
        ev(3, "delete", "c1", 1, ""),       # delete of absent key: no-op
        ev(4, "upsert", "c2", 0, "x"),
        ev(5, "delete", "c2", 0, ""),       # delete wins over lsn 4
        ev(6, "upsert", "c2", 1, "y"),
    ])
    state, watermark, applied = merge_partition_table(delta, None, -1)
    assert watermark == 6 and applied == 7
    rows = {(r["conv_id"], r["turn_idx"]): r for r in state.to_pylist()}
    assert rows[("c1", 0)]["text"] == "v2" and rows[("c1", 0)]["lsn"] == 2
    assert ("c2", 0) not in rows
    assert rows[("c2", 1)]["text"] == "y"
    # second round: replay below watermark is dropped; reinsert after delete
    delta2 = pa.concat_tables([
        ev(2, "upsert", "c1", 0, "stale-replay"),
        ev(7, "upsert", "c2", 0, "reborn"),
    ])
    state2, wm2, applied2 = merge_partition_table(delta2, state, watermark)
    assert wm2 == 7 and applied2 == 1
    rows2 = {(r["conv_id"], r["turn_idx"]): r for r in state2.to_pylist()}
    assert rows2[("c1", 0)]["text"] == "v2"
    assert rows2[("c2", 0)]["text"] == "reborn"


def test_schema_evolution_missing_tool_column(ray_session, tmp_path_factory):
    """Epoch-0 batches lack the `tool` column ENTIRELY (F2: added-column
    evolution); later epochs carry it.  Merge must unify schemas."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_evo"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(1200)
    epoch0 = full.filter(
        pa.compute.equal(full.column("schema_epoch"), pa.scalar(0, pa.int8())))
    rest = full.filter(
        pa.compute.not_equal(full.column("schema_epoch"), pa.scalar(0, pa.int8())))
    pipe.apply(ray.data.from_arrow(epoch0.drop_columns(["tool"])))
    first = pipe.final_state_sorted()
    assert "tool" in first.schema.names  # null-filled by normalization
    assert first.column("tool").null_count == first.num_rows
    pipe.apply(ray.data.from_arrow(rest))
    final = pipe.final_state_sorted()
    tools = [t for t in final.column("tool").to_pylist() if t]
    assert tools, "later epochs should contribute real tool values"


def test_write_sorted_distributed(ray_session, tmp_path_factory):
    import os

    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_ws"))
    out = str(tmp_path_factory.mktemp("sorted_out"))
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(500)))
    pipe.write_sorted(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    t = pa.concat_tables([pa.parquet.read_table(os.path.join(out, f)) for f in files])
    assert t.num_rows == pipe.final_state_sorted().num_rows


def test_actor_exchange_matches_oracle(ray_session, tmp_path_factory, oracle):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_actorx"))
    pipe = CDCPipeline(lake, num_partitions=16)
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)),
               exchange="actor")
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # incremental second apply through the actor path too
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)),
               exchange="actor")
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_actor_exchange_conv_mode_routing(ray_session, tmp_path_factory, oracle):
    """ADVICE r1 (high): the actor-exchange apply must route with the
    pipeline's partition_mode/salt_keys — on a conv-mode lake a second
    exchange='actor' apply previously partitioned by_turn, sending keys to
    different pids than their committed state → duplicate keys."""
    import ray.data

    hot = frozenset(k[0] for k in list(oracle)[:3])
    lake = str(tmp_path_factory.mktemp("lake_actorx_conv"))
    pipe = CDCPipeline(lake, num_partitions=16, partition_mode="conv",
                       salt_keys=hot)
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)),
               exchange="actor")
    # _lake_as_dict asserts no duplicate (conv_id, turn_idx) keys
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_persistent_actor_exchange_across_commits(ray_session,
                                                  tmp_path_factory, oracle):
    """One ActorExchange pool reused for a delta-commit micro-batch loop
    plus a base-merge apply (the tail steady state the persistence exists
    for) — final state must equal the sequential oracle, and the pool must
    refuse a pipeline it isn't bound to."""
    import pyarrow.compute as pc
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
        ActorExchange,
    )

    lake = str(tmp_path_factory.mktemp("lake_actorx_persist"))
    pipe = CDCPipeline(lake, num_partitions=16)
    ex = ActorExchange(lake, 16)
    tbl = expected_event_table(N_EVENTS)
    cut = N_EVENTS // 3
    for lo, hi in ((0, cut), (cut, 2 * cut), (2 * cut, N_EVENTS)):
        sl = tbl.filter(pc.and_(pc.greater_equal(tbl.column("lsn"), lo),
                                pc.less(tbl.column("lsn"), hi)))
        pipe.apply_delta(ray.data.from_arrow(sl), exchange=ex)
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # a base merge through the SAME pool (buffers must be clean between
    # commits); full replay is a watermark-pruned no-op → state unchanged
    pipe.apply(ray.data.from_arrow(tbl), exchange=ex)
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # the pool is bound to its lake/partitioning
    other = CDCPipeline(str(tmp_path_factory.mktemp("lake_actorx_other")),
                        num_partitions=16)
    with pytest.raises(ValueError):
        other.apply(ray.data.from_arrow(tbl), exchange=ex)
    ex.shutdown()


def test_salted_conversation_point_lookup(ray_session, tmp_path_factory, oracle):
    """ADVICE r1 (medium): point lookup of a SALTED conversation must read
    the whole salt-candidate pid set, not just the unsalted pid."""
    import ray.data

    hot = frozenset(k[0] for k in list(oracle)[:5])
    lake = str(tmp_path_factory.mktemp("lake_salt_lookup"))
    pipe = CDCPipeline(lake, num_partitions=16, partition_mode="conv",
                       salt_keys=hot)
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    for conv in hot:
        expected = sum(1 for k in oracle if k[0] == conv)
        t = pipe.read_conversation(conv)
        assert t.num_rows == expected, conv
        turns = t.column("turn_idx").to_pylist()
        assert turns == sorted(turns)


def test_manifest_partition_config_mismatch_raises(ray_session, tmp_path_factory):
    """ADVICE r1 (medium): reopening a lake with a different partition
    count / mode / salt config must raise, not silently corrupt."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_cfg"))
    CDCPipeline(lake, num_partitions=16).apply(
        ray.data.from_arrow(expected_event_table(500)))
    small = ray.data.from_arrow(expected_event_table(100))
    with pytest.raises(ValueError, match="num_partitions"):
        CDCPipeline(lake, num_partitions=8).apply(small)
    with pytest.raises(ValueError, match="partition_mode"):
        CDCPipeline(lake, num_partitions=16, partition_mode="conv").apply(small)
    with pytest.raises(ValueError, match="salt_keys"):
        CDCPipeline(lake, num_partitions=16,
                    salt_keys=frozenset({"c0"})).apply(small)
    # actor exchange validates too
    with pytest.raises(ValueError, match="num_partitions"):
        CDCPipeline(lake, num_partitions=8).apply(small, exchange="actor")
    # matching config still applies fine
    stats = CDCPipeline(lake, num_partitions=16).apply(small)
    assert stats["version"] == 2


def test_manifest_hash_algo_recorded_and_enforced(ray_session, tmp_path_factory):
    """ADVICE r1 (low): the manifest freezes the partition-hash algorithm;
    a lake written under a different hash implementation is refused."""
    import json

    import ray.data

    from embulk_filter_timestamp_format_ray.stages.partition import hash_algo_id

    lake = str(tmp_path_factory.mktemp("lake_hash"))
    pipe = CDCPipeline(lake, num_partitions=8)
    pipe.apply(ray.data.from_arrow(expected_event_table(500)))
    manifest = mf.read_manifest(lake)
    assert manifest["partition_config"]["hash_algo"] == hash_algo_id()
    # simulate a lake written under a different hash implementation
    manifest["partition_config"]["hash_algo"] = "other-hash/0.0"
    mf.commit_manifest(lake, manifest)
    with pytest.raises(ValueError, match="hash_algo"):
        CDCPipeline(lake, num_partitions=8).apply(
            ray.data.from_arrow(expected_event_table(100)))


def test_repartition_lake_rebounds_state(ray_session, tmp_path_factory, oracle):
    """r1 verdict #6: an oversized partition can be split.  Drive a 2-way
    lake (big per-partition state), repartition to 16, verify (a) per-task
    state shrank below the old per-partition size, (b) final state is
    unchanged, (c) subsequent applies under the OLD count are refused and
    under the new count merge correctly, (d) point-lookup still works."""
    import ray.data

    from embulk_filter_timestamp_format_ray.state import manifest as mf_mod

    lake = str(tmp_path_factory.mktemp("lake_repart"))
    pipe = CDCPipeline(lake, num_partitions=2, partition_mode="conv")
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 3000)))
    before = {str(p): m["rows"] for p, m in
              mf_mod.read_manifest(lake)["partitions"].items()}
    assert max(before.values()) > 400  # meaningfully large per-partition

    stats = pipe.repartition_lake(16)
    assert stats["num_partitions"] == 16
    manifest = mf_mod.read_manifest(lake)
    assert manifest["partition_config"]["num_partitions"] == 16
    after = [m["rows"] for m in manifest["partitions"].values()]
    assert len(after) == 16
    assert max(after) < max(before.values())  # per-task state re-bounded
    assert sum(after) == sum(before.values())  # no rows lost

    # stale layout refused; pipeline object itself adopted the new layout
    with pytest.raises(ValueError, match="num_partitions"):
        CDCPipeline(lake, num_partitions=2, partition_mode="conv").apply(
            ray.data.from_arrow(full.slice(3000, 100)))
    pipe.apply(ray.data.from_arrow(full.slice(3000)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # fresh pipeline under the new layout reads a conversation fine
    pipe2 = CDCPipeline(lake, num_partitions=16, partition_mode="conv")
    conv = next(iter(oracle))[0]
    t = pipe2.read_conversation(conv)
    assert t.num_rows == sum(1 for k in oracle if k[0] == conv)


def test_repartition_changes_salt_config(ray_session, tmp_path_factory, oracle):
    """Salt keys are frozen in the manifest (changing them mid-lake corrupts
    routing); repartition_lake is the sanctioned migration: it rewrites the
    layout AND commits the new salt config atomically."""
    import ray.data

    from embulk_filter_timestamp_format_ray.state import manifest as mf_mod

    hot = frozenset(k[0] for k in list(oracle)[:2])
    lake = str(tmp_path_factory.mktemp("lake_saltmig"))
    pipe = CDCPipeline(lake, num_partitions=8, partition_mode="conv")
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 3000)))
    # direct salt change is refused…
    with pytest.raises(ValueError, match="salt_keys"):
        CDCPipeline(lake, num_partitions=8, partition_mode="conv",
                    salt_keys=hot).apply(ray.data.from_arrow(full.slice(3000)))
    # …but migrating through repartition_lake works
    pipe.repartition_lake(8, salt_keys=hot)
    cfg = mf_mod.read_manifest(lake)["partition_config"]
    assert cfg["salt_keys"] == sorted(hot)
    pipe.apply(ray.data.from_arrow(full.slice(3000)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    # salted point lookup on the migrated lake
    pipe2 = CDCPipeline(lake, num_partitions=8, partition_mode="conv",
                        salt_keys=hot)
    conv = sorted(hot)[0]
    t = pipe2.read_conversation(conv)
    assert t.num_rows == sum(1 for k in oracle if k[0] == conv)


def test_actor_pool_normalize_matches(ray_session, tmp_path_factory, oracle):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_actor"))
    pipe = CDCPipeline(lake, num_partitions=16, normalize_concurrency=(1, 2))
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_resume_lsn(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_resume"))
    pipe = CDCPipeline(lake, num_partitions=4)
    assert pipe.resume_lsn() == -1
    pipe.apply(ray.data.from_arrow(expected_event_table(400)))
    # all partitions committed → low-watermark is some applied lsn
    assert 0 <= pipe.resume_lsn() < 400


def test_merge_associativity_random_streams():
    """Property: merging any partitioning of a random event stream (with
    replays, deletes, arbitrary order) equals the single-shot merge — the
    algebra the map-side combiner and incremental applies rely on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ts0 = pa.array([0], pa.timestamp("ns", tz="UTC"))

    def mk(events):
        n = len(events)
        return pa.table({
            "lsn": pa.array([e[0] for e in events], pa.int64()),
            "op": pa.array([e[1] for e in events]),
            "conv_id": pa.array([e[2] for e in events]),
            "turn_idx": pa.array([e[3] for e in events], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"t{e[0]}" for e in events]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.concat_arrays([ts0] * n) if n else ts0.slice(0, 0),
        })

    event = st.tuples(
        st.integers(min_value=0, max_value=40),           # lsn
        st.sampled_from(["upsert", "delete"]),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=2),
    )

    @given(events=st.lists(event, min_size=1, max_size=24),
           split=st.integers(min_value=0, max_value=24))
    @settings(max_examples=80, deadline=None)
    def check(events, split):
        # dedupe same-lsn different-content collisions (binlog contract)
        seen = {}
        for e in events:
            seen.setdefault(e[0], e)
        events = [seen[k] for k in sorted(seen)]
        split = min(split, len(events))
        one_shot, wm1, _ = merge_partition_table(mk(events), None, -1)
        first, wma, _ = merge_partition_table(mk(events[:split]), None, -1)
        two_step, wm2, _ = merge_partition_table(mk(events[split:]), first, wma)
        key = lambda t: sorted(  # noqa: E731
            (r["conv_id"], r["turn_idx"], r["lsn"], r["text"])
            for r in t.to_pylist())
        assert key(one_shot) == key(two_step)
        assert wm1 == wm2

    check()


def test_normalize_accepts_int64_ts_raw():
    """Schema evolution: a source that ships ts_raw as raw epoch-ms int64
    (not digit strings) normalizes identically via the from_unit config."""
    stage = NormalizeStage()
    batch = pa.table({
        "lsn": pa.array([0], pa.int64()), "op": pa.array(["upsert"]),
        "conv_id": pa.array(["a"]), "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"]), "text": pa.array(["t"]),
        "tool": pa.array([None], pa.string()),
        "ts_raw": pa.array([1436713200100], pa.int64()),
        "schema_epoch": pa.array([0], pa.int8()),
    })
    out = stage(batch)
    assert out.column("ts").to_pylist()[0].timestamp() == pytest.approx(1436713200.1)


def test_normalize_stage_epochs():
    stage = NormalizeStage()
    batch = pa.table({
        "lsn": pa.array([0, 1, 2], pa.int64()),
        "op": pa.array(["upsert", "upsert", "bogus"]),
        "conv_id": pa.array(["a", "b", "c"]),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "role": pa.array(["human", "ai", "user"]),
        "text": pa.array(["t0", "t1", "t2"]),
        "tool": pa.array([None, "tool-1", None], pa.string()),
        "ts_raw": pa.array(["1436713200100",
                            "2015-07-12 15:00:00.100000000 +0000",
                            "whatever"]),
        "schema_epoch": pa.array([0, 1, 0], pa.int8()),
    })
    out = stage(batch)
    assert out.num_rows == 2  # invalid envelope dropped
    assert out.column("role").to_pylist() == ["user", "assistant"]
    ts = out.column("ts").to_pylist()
    assert ts[0].timestamp() == pytest.approx(1436713200.1)
    assert ts[1].timestamp() == pytest.approx(1436713200.1)


def test_assemble_conversations(ray_session):
    """Lake rows → one ordered transcript doc per conversation."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.transcripts import (
        assemble_conversations,
    )

    t = pa.table({
        "conv_id": ["b", "a", "a", "a"],
        "turn_idx": pa.array([0, 2, 0, 1], pa.int32()),
        "role": ["user", "tool", "user", None],
        "text": ["hi b", "ran", "hi a", "mid"],
    })
    out = assemble_conversations(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    assert list(out["conv_id"]) == ["a", "b"]
    assert list(out["n_turns"]) == [3, 1]
    assert out["transcript"][0] == "user: hi a\n: mid\ntool: ran"
    assert out["transcript"][1] == "user: hi b"


def test_assemble_conversations_parity_many(ray_session):
    """Sharded vectorized assembly vs an independent per-conversation
    Python reference over many conversations spread across blocks."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.transcripts import (
        assemble_conversations,
    )

    rng = np.random.default_rng(11)
    rows = []
    expect = {}
    for c in range(300):
        cid = f"conv-{c:04d}"
        n = int(rng.integers(1, 9))
        roles = [["user", "assistant", "tool", None][int(rng.integers(4))]
                 for _ in range(n)]
        texts = [f"t{c}-{i}" if rng.random() > 0.05 else None
                 for i in range(n)]
        order = rng.permutation(n)
        for i in order:
            rows.append((cid, i, roles[i], texts[i]))
        expect[cid] = "\n".join(
            f"{roles[i] or ''}: {texts[i] or ''}" for i in range(n))
    rng.shuffle(rows)
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
    })
    out = assemble_conversations(
        ray.data.from_arrow(t).repartition(7)).to_pandas()
    assert len(out) == 300
    got = dict(zip(out["conv_id"], out["transcript"]))
    assert got == expect
    n_turns = dict(zip(out["conv_id"], out["n_turns"]))
    assert all(n_turns[k] == len(v.split("\n")) for k, v in expect.items())


# ------------------------------------------------------------------ DLQ


def _events_with_bad_rows(n_clean: int = 300) -> "tuple[pa.Table, int]":
    """Clean stream + 4 poison rows (lsns beyond the clean range)."""
    clean = expected_event_table(n_clean)
    bad = pa.Table.from_pylist([
        {"lsn": n_clean + 0, "op": "bogus", "conv_id": "conv-bad",
         "turn_idx": 0, "role": "user", "text": "bad op", "tool": None,
         "ts_raw": "1704067200000", "schema_epoch": 0},
        {"lsn": n_clean + 1, "op": "upsert", "conv_id": None,
         "turn_idx": 1, "role": "user", "text": "no conv", "tool": None,
         "ts_raw": "1704067200000", "schema_epoch": 0},
        {"lsn": n_clean + 2, "op": "upsert", "conv_id": "conv-epoch9",
         "turn_idx": 2, "role": "user", "text": "future epoch", "tool": None,
         "ts_raw": "2024-01-01T00:00:00Z", "schema_epoch": 9},
        {"lsn": n_clean + 3, "op": "upsert", "conv_id": "conv-unparse",
         "turn_idx": 3, "role": "user", "text": "bad ts", "tool": None,
         "ts_raw": "not a timestamp", "schema_epoch": 1},
    ], schema=clean.schema)
    return pa.concat_tables([clean, bad]), n_clean


def test_dlq_quarantines_and_keeps_lake_clean(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_dlq"))
    events, n_clean = _events_with_bad_rows()
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    stats = pipe.apply(ray.data.from_arrow(events))
    assert stats["events_quarantined"] == 4
    # applied = post-combine per-key winners (map-side combine collapses
    # same-key updates within a block); all that matters is: nothing poison
    assert 0 < stats["events_applied"] <= n_clean

    dlq = pipe.read_dlq()
    assert dlq.num_rows == 4
    reasons = dict(zip(dlq.column("lsn").to_pylist(),
                       dlq.column("dlq_reason").to_pylist()))
    assert reasons[n_clean + 0] == "invalid_envelope"
    assert reasons[n_clean + 1] == "invalid_envelope"
    assert reasons[n_clean + 2] == "unknown_epoch"
    assert reasons[n_clean + 3] == "unparseable_ts"
    # forensic raw payload survives
    raws = dict(zip(dlq.column("lsn").to_pylist(),
                    dlq.column("ts_raw").to_pylist()))
    assert raws[n_clean + 3] == "not a timestamp"

    # the lake itself contains ONLY clean-stream state, matching the oracle
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(n_clean))
    # and no dlq columns leak into the lake schema
    cols = set(pipe.read_lake().schema().names)
    assert "dlq_reason" not in cols and "ts_raw" not in cols


def test_dlq_replay_requarantines_but_lake_idempotent(ray_session,
                                                      tmp_path_factory):
    """At-least-once quarantine: replaying the same micro-batch re-adds the
    poison rows to the DLQ (their lsns never advance watermarks) while the
    lake state stays exactly-once."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_dlq_replay"))
    events, n_clean = _events_with_bad_rows()
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    pipe.apply(ray.data.from_arrow(events))
    stats2 = pipe.apply(ray.data.from_arrow(events))
    assert stats2["events_applied"] == 0  # watermarks dedup clean replays
    assert stats2["events_quarantined"] == 4
    assert pipe.read_dlq().num_rows == 8
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(n_clean))


def test_dlq_actor_exchange_bit_equal(ray_session, tmp_path_factory):
    """The actor exchange's reserved dead-letter lane quarantines the same
    rows and leaves the same lake state as the dataset exchange — base
    (apply) and merge-on-read (apply_delta) commits both, through one
    persistent pool."""
    import pyarrow.compute as pc
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
        ActorExchange,
    )

    events, n_clean = _events_with_bad_rows()
    lsn = events.column("lsn")
    cut = pa.scalar(n_clean // 2, pa.int64())
    first = events.filter(pc.less(lsn, cut))            # clean prefix
    second = events.filter(pc.greater_equal(lsn, cut))  # rest + 4 poison

    def build(kind):
        lake = str(tmp_path_factory.mktemp(f"dlq_x_{kind}") / "lake")
        pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
        if kind == "dataset":
            s1 = pipe.apply(ray.data.from_arrow(first))
            s2 = pipe.apply_delta(ray.data.from_arrow(second))
            return pipe, s1, s2
        pool = ActorExchange(lake, 4)
        try:
            s1 = pipe.apply(ray.data.from_arrow(first), exchange=pool)
            s2 = pipe.apply_delta(ray.data.from_arrow(second), exchange=pool)
        finally:
            pool.shutdown()
        return pipe, s1, s2

    ds_pipe, d1, d2 = build("dataset")
    ac_pipe, a1, a2 = build("actor")
    assert (d1["events_quarantined"], d2["events_quarantined"]) == (0, 4)
    assert (a1["events_quarantined"], a2["events_quarantined"]) == (0, 4)

    def dlq_rows(p):
        t = p.read_dlq()
        return t.take(pc.sort_indices(
            t, sort_keys=[("lsn", "ascending")])).to_pylist()

    assert dlq_rows(ac_pipe) == dlq_rows(ds_pipe)
    _assert_matches_oracle(_lake_as_dict(ds_pipe), sequential_oracle(n_clean))
    assert _lake_as_dict(ac_pipe) == _lake_as_dict(ds_pipe)
    assert ac_pipe.fsck()["violations"] == []


def test_dlq_files_survive_gc_and_repartition(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_dlq_gc"))
    events, n_clean = _events_with_bad_rows(120)
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True,
                       time_travel_retain=1)
    pipe.apply(ray.data.from_arrow(events))
    dlq_paths = [e["path"] for e in mf.read_manifest(lake)["dlq"]]
    assert len(dlq_paths) == 1
    # later clean applies + gc must not collect the quarantine file
    pipe.apply(ray.data.from_arrow(expected_event_table(200).slice(120)))
    pipe.gc()
    for p in dlq_paths:
        assert os.path.exists(os.path.join(lake, p))
    # repartition rewrites the layout but carries the quarantine forward
    pipe.repartition_lake(8)
    pipe.gc()
    assert [e["path"] for e in mf.read_manifest(lake)["dlq"]] == dlq_paths
    for p in dlq_paths:
        assert os.path.exists(os.path.join(lake, p))
    assert pipe.read_dlq().num_rows == 4


def test_dlq_policy_validation():
    with pytest.raises(ValueError):
        NormalizeStage(dlq=True, stop_on_invalid=True)
    with pytest.raises(ValueError):
        CDCPipeline("/tmp/x", dlq=True, stop_on_invalid=True)
    with pytest.raises(ValueError):
        CDCPipeline("/tmp/x", dlq=True, wire_encode=True)


def test_dlq_default_mode_unchanged(ray_session, tmp_path_factory):
    """Reference-parity default: invalid envelopes drop with a warning and
    an unparseable ts applies as a NULL-ts row (C10 warn+NULL semantics)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_nodlq"))
    events, n_clean = _events_with_bad_rows(100)
    # default mode has no spec for epoch 9 and would abort — that poison row
    # is exactly what dlq mode exists for; drop it here
    import pyarrow.compute as pc
    events = events.filter(pc.not_equal(events.column("schema_epoch"), 9))
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(events))
    state = _lake_as_dict(pipe)
    # poison rows with valid envelopes applied (NULL ts for the unparseable
    # one); invalid envelopes silently dropped
    assert ("conv-unparse", 3) in state
    assert state[("conv-unparse", 3)]["ts_ns"] is None
    assert ("conv-bad", 0) not in state
    assert (None, 1) not in state


def test_dlq_reprocess_recovers_fixed_epoch(ray_session, tmp_path_factory):
    """The operational loop: an unknown-epoch event is quarantined, the
    spec catches up, reprocess_dlq applies it and shrinks the quarantine to
    the still-bad remainder (REPLACE, not append)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.config import ColumnConfig
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        DEFAULT_EPOCH_SPECS,
    )

    lake = str(tmp_path_factory.mktemp("lake_dlq_rp"))
    events, n_clean = _events_with_bad_rows()
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    pipe.apply(ray.data.from_arrow(events))
    assert pipe.read_dlq().num_rows == 4

    specs = dict(DEFAULT_EPOCH_SPECS)
    specs[9] = ColumnConfig("ts_raw", "timestamp",
                            from_format=("%Y-%m-%dT%H:%M:%SZ",),
                            from_timezone="UTC")
    stats = pipe.reprocess_dlq(epoch_specs=specs)
    assert stats["events_seen"] == 4
    assert stats["events_quarantined"] == 3  # 2 invalid env + 1 unparseable
    dlq = pipe.read_dlq()
    assert dlq.num_rows == 3
    assert "unknown_epoch" not in dlq.column("dlq_reason").to_pylist()
    state = _lake_as_dict(pipe)
    assert state[("conv-epoch9", 2)]["text"] == "future epoch"
    assert state[("conv-epoch9", 2)]["ts_ns"] == 1704067200 * 10**9
    # clean-stream state untouched by the reprocess
    oracle = sequential_oracle(300)
    for key in oracle:
        assert state[key]["text"] == oracle[key]["text"]
    # idempotent: a second reprocess (no new specs) changes nothing
    stats2 = pipe.reprocess_dlq()
    assert stats2["events_quarantined"] == 3
    assert pipe.read_dlq().num_rows == 3
    assert _lake_as_dict(pipe) == state


def test_dlq_reprocess_lww_arbitration(ray_session, tmp_path_factory):
    """Recovered events keep their ORIGINAL lsns: an old quarantined update
    never overwrites a newer applied one, and a newer quarantined one wins."""
    import ray.data

    from embulk_filter_timestamp_format_ray.config import ColumnConfig
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        DEFAULT_EPOCH_SPECS,
    )

    lake = str(tmp_path_factory.mktemp("lake_dlq_lww"))
    schema = expected_event_table(1).schema

    def ev(lsn, conv, text, epoch=0, ts="1704067200000"):
        return {"lsn": lsn, "op": "upsert", "conv_id": conv, "turn_idx": 0,
                "role": "user", "text": text, "tool": None, "ts_raw": ts,
                "schema_epoch": epoch}

    batch1 = pa.Table.from_pylist([
        ev(50, "old-loses", "quarantined-old", epoch=9,
           ts="2024-01-01T00:00:00Z"),
        ev(70, "new-wins", "quarantined-new", epoch=9,
           ts="2024-01-01T00:00:00Z"),
    ], schema=schema)
    batch2 = pa.Table.from_pylist([
        ev(60, "old-loses", "applied"),
        ev(60, "new-wins", "applied"),
    ], schema=schema)
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    pipe.apply(ray.data.from_arrow(batch1))  # both quarantined
    pipe.apply(ray.data.from_arrow(batch2))  # both applied
    assert pipe.read_dlq().num_rows == 2

    specs = dict(DEFAULT_EPOCH_SPECS)
    specs[9] = ColumnConfig("ts_raw", "timestamp",
                            from_format=("%Y-%m-%dT%H:%M:%SZ",),
                            from_timezone="UTC")
    pipe.reprocess_dlq(epoch_specs=specs)
    assert pipe.read_dlq().num_rows == 0
    state = _lake_as_dict(pipe)
    assert state[("old-loses", 0)]["text"] == "applied"         # lsn 60 > 50
    assert state[("new-wins", 0)]["text"] == "quarantined-new"  # lsn 70 > 60


def test_dlq_null_epoch_is_invalid_envelope(ray_session, tmp_path_factory):
    import ray.data

    schema = expected_event_table(1).schema
    bad = pa.Table.from_pylist([
        {"lsn": 5, "op": "upsert", "conv_id": "c", "turn_idx": 0,
         "role": "user", "text": "x", "tool": None,
         "ts_raw": "1704067200000", "schema_epoch": None},
    ], schema=schema)
    lake = str(tmp_path_factory.mktemp("lake_dlq_nullep"))
    pipe = CDCPipeline(lake, num_partitions=2, dlq=True)
    stats = pipe.apply(ray.data.from_arrow(bad))
    assert stats["events_quarantined"] == 1
    assert pipe.read_dlq().column("dlq_reason").to_pylist() == [
        "invalid_envelope"]


def test_table_stats_health_snapshot(ray_session, tmp_path_factory):
    """Manifest-only health surface: totals, skew, watermark spread, dlq
    backlog — no data files are read."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_stats"))
    pipe = CDCPipeline(lake, num_partitions=8, dlq=True)
    assert pipe.table_stats()["rows"] == 0  # empty lake is well-defined
    events, n_clean = _events_with_bad_rows(400)
    pipe.apply(ray.data.from_arrow(events))
    s = pipe.table_stats()
    final = pipe.final_state_sorted()
    assert s["rows"] == final.num_rows
    assert s["partitions"] == 8
    assert s["bytes"] > 0
    assert s["dlq_rows"] == 4
    assert s["version"] == 1 and s["retained_versions"] == 1
    assert s["watermark_min"] <= s["watermark_max"]
    assert s["watermark_spread"] == s["watermark_max"] - s["watermark_min"]
    assert s["max_partition_rows"] >= s["rows"] / 8
    assert s["row_skew"] >= 1.0


# ------------------------------------------------------------ bootstrap


def test_bootstrap_snapshot_then_stream(ray_session, tmp_path_factory):
    """Debezium-style initial load: seed the lake from a snapshot taken at
    binlog position L, then tail the stream from L+1 — overlap replays at
    or below L dedup away, post-snapshot events apply normally."""
    import ray.data

    # snapshot = the oracle fold of the STREAM's first 2000 events (the
    # generator's fields depend on (num_events, num_convs), so the prefix
    # must come from the same 4000-event parameterization)
    snap_state = sequential_oracle(N_EVENTS, lsn_below=2000)
    snap_tbl = pa.table({
        "conv_id": pa.array([k[0] for k in snap_state]),
        "turn_idx": pa.array([k[1] for k in snap_state], pa.int32()),
        "role": pa.array([v["role"] for v in snap_state.values()]),
        "text": pa.array([v["text"] for v in snap_state.values()]),
        "tool": pa.array([v["tool"] for v in snap_state.values()]),
        "ts": pa.array([v["ts_ns"] for v in snap_state.values()],
                       pa.int64()).cast(pa.timestamp("ns")).cast(
                           pa.timestamp("ns", tz="UTC")),
    })
    lake = str(tmp_path_factory.mktemp("lake_boot"))
    pipe = CDCPipeline(lake, num_partitions=8)
    stats = pipe.bootstrap(ray.data.from_arrow(snap_tbl), snapshot_lsn=1999)
    assert stats["rows"] == len(snap_state)
    assert pipe.resume_lsn() == 1999
    # a cautious tailer re-reads from lsn 1500: the overlap is a no-op,
    # the suffix applies
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.filter(
        pa.compute.greater_equal(full.column("lsn"), 1500))))
    lake_state = _lake_as_dict(pipe)
    oracle = sequential_oracle(N_EVENTS)
    # snapshot rows keep lsn=1999 where never updated after the snapshot,
    # so compare text/role/tool only for those; updated keys match fully
    assert set(lake_state) == set(oracle)
    for key, exp in oracle.items():
        got = lake_state[key]
        assert got["text"] == exp["text"], key
        assert got["role"] == exp["role"], key
        assert got["tool"] == exp["tool"], key


def test_bootstrap_refuses_nonempty_lake(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_boot_ne"))
    pipe = CDCPipeline(lake, num_partitions=4)
    pipe.apply(ray.data.from_arrow(expected_event_table(100)))
    snap = pa.table({
        "conv_id": ["x"], "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"], "text": ["t"], "tool": pa.array([None], pa.string()),
    })
    with pytest.raises(ValueError, match="EMPTY lake"):
        pipe.bootstrap(ray.data.from_arrow(snap), snapshot_lsn=0)

def _view_as_dict(view_ds) -> "dict[tuple, dict]":
    out = {}
    for row in view_ds.take_all():
        key = (row["conv_id"], row["turn_idx"])
        assert key not in out, f"duplicate merge key {key} in view"
        ts = row["ts"]
        out[key] = {
            "role": row["role"], "text": row["text"], "tool": row["tool"],
            "ts_ns": int(ts.timestamp() * 1e9) if ts else None,
            "lsn": row["lsn"],
        }
    return out


def test_read_merged_view_equals_commit(ray_session, tmp_path_factory, oracle):
    """Merge-on-read: committed prefix + uncommitted pending suffix overlay
    must equal the state apply(pending) would commit — and must not commit
    anything (manifest version unchanged)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_mor"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    version_before = mf.read_manifest(lake)["version"]
    view = pipe.read_merged(ray.data.from_arrow(full.slice(2500)))
    _assert_matches_oracle(_view_as_dict(view), oracle)
    assert mf.read_manifest(lake)["version"] == version_before
    # the view did not change what a subsequent commit produces
    pipe.apply(ray.data.from_arrow(full.slice(2500)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)


def test_read_merged_overlapping_pending(ray_session, tmp_path_factory, oracle):
    """Replayed pending events at or below the committed watermark are
    no-ops in the view (same idempotence as a committed re-apply)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_mor_ovl"))
    pipe = CDCPipeline(lake, num_partitions=16)
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 2500)))
    # pending re-delivers [1000, N): the [1000, 2500) replays must not
    # resurrect deleted keys or regress any winner
    view = pipe.read_merged(ray.data.from_arrow(full.slice(1000)))
    _assert_matches_oracle(_view_as_dict(view), oracle)


def test_read_merged_empty_pending_is_lake(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_mor_empty"))
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(500)
    pipe.apply(ray.data.from_arrow(full))
    empty = ray.data.from_arrow(full.slice(0, 0))
    view = _view_as_dict(pipe.read_merged(empty))
    lake_state = _lake_as_dict(pipe)
    assert view == lake_state


def test_fsck_clean_after_repartition(ray_session, tmp_path_factory):
    """A repartition resets watermarks to the global low while rows keep
    their lsns — the recorded lsn_ceiling must keep fsck green through
    that window, and drop once a later apply ratchets the watermarks
    past it (r4: the --repartition-to CLI surfaced fsck flagging a
    correct lake)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_repart_fsck"))
    pipe = CDCPipeline(lake, num_partitions=16)
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    assert pipe.fsck()["violations"] == []

    pipe.repartition_lake(8)
    m = mf.read_manifest(lake)
    assert m.get("lsn_ceiling", -1) >= 0  # ceiling recorded
    rep = pipe.fsck()
    assert rep["violations"] == [], rep["violations"][:3]

    # a later apply that moves every watermark past the ceiling drops it
    pipe.apply(ray.data.from_arrow(expected_event_table(2 * N_EVENTS)))
    m2 = mf.read_manifest(lake)
    assert "lsn_ceiling" not in m2
    assert pipe.fsck()["violations"] == []


def test_lake_changes_empty_across_repartition(ray_session,
                                               tmp_path_factory):
    """A repartition changes every partition's FILES but no key's STATE —
    the change feed between the two versions must be empty (the row-level
    compare is key-global, so the layout change cancels out)."""
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_repart_diff"))
    pipe = CDCPipeline(lake, num_partitions=16)
    pipe.apply(ray.data.from_arrow(expected_event_table(N_EVENTS)))
    pipe.repartition_lake(8)
    assert pipe.lake_changes(1, 2).count() == 0


def test_dlq_heal_after_repartition(ray_session, tmp_path_factory):
    """The quarantine is layout-independent: a repartition carries it
    untouched and a heal afterwards routes reprocessed rows under the NEW
    layout (fsck-clean)."""
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        poison_events,
    )

    lake = str(tmp_path_factory.mktemp("lake_dlq_repart"))
    pipe = CDCPipeline(lake, num_partitions=16, dlq=True)
    ev = poison_events(change_events(N_EVENTS, seed=42), 30,
                       unknown_epoch_band=True)
    stats = pipe.apply(ev)
    assert stats["events_quarantined"] > 0
    pipe.repartition_lake(8)
    assert pipe.read_dlq().num_rows == stats["events_quarantined"]
    heal = pipe.reprocess_dlq(epoch_specs=pipe.suggest_dlq_specs())
    assert heal["events_applied"] > 0
    assert pipe.fsck()["violations"] == []


def test_bootstrap_then_repartition_then_tail(ray_session,
                                              tmp_path_factory):
    """Snapshot bootstrap → repartition → resumed tail must converge to
    the same state as a full replay: the repartition preserves the
    bootstrap's resume position (global low) and the continued stream
    routes under the new layout."""
    import pyarrow.compute as pc2
    import ray.data

    full = expected_event_table(6000)
    snap_pipe = CDCPipeline(str(tmp_path_factory.mktemp("snap_src")),
                            num_partitions=4)
    snap_pipe.apply(ray.data.from_arrow(full.slice(0, 3000)))
    snapshot = snap_pipe.final_state_sorted().drop_columns(["lsn"])

    lake = str(tmp_path_factory.mktemp("lake_boot_repart"))
    pipe = CDCPipeline(lake, num_partitions=16)
    pipe.bootstrap(ray.data.from_arrow(snapshot), snapshot_lsn=2999)
    pipe.repartition_lake(8)
    assert pipe.resume_lsn() == 2999
    pipe.apply(ray.data.from_arrow(full.filter(
        pc2.greater_equal(full.column("lsn"), 3000))))
    ref = CDCPipeline(str(tmp_path_factory.mktemp("lake_boot_ref")),
                      num_partitions=8)
    ref.apply(ray.data.from_arrow(full))
    assert pipe.final_state_sorted().drop_columns(["lsn"]).equals(
        ref.final_state_sorted().drop_columns(["lsn"]))
    assert pipe.fsck()["violations"] == []


def test_apply_retries_when_concurrent_gc_collects_inputs(
        ray_session, tmp_path_factory, monkeypatch):
    """Reader-vs-GC race (the two-concurrent-followers flake): a writer
    snapshots the manifest, then a CONCURRENT commit supersedes its input
    files and gc_orphan_txns collects them once they rotate out of retained
    history — the merge tasks hit FileNotFoundError on a ``txn-*`` path.
    That is a CommitConflict observed at read time, and apply() must retry
    against the fresh manifest instead of surfacing the task error."""
    import copy

    import pyarrow.compute as pc
    import ray.data  # noqa: F401  (Dataset ops below)

    lake = str(tmp_path_factory.mktemp("lake_stale_gc"))
    pipe = CDCPipeline(lake, num_partitions=4, time_travel_retain=0)
    ev = change_events(N_EVENTS, seed=42, parallelism=4)
    cut = pa.scalar(N_EVENTS // 2, pa.int64())
    pipe.apply_delta(ev.map_batches(
        lambda b: b.filter(pc.less(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    stale = copy.deepcopy(mf.read_manifest(lake))
    delta_paths = [os.path.join(lake, d["path"])
                   for p in stale["partitions"].values()
                   for d in p.get("deltas", [])]
    assert delta_paths
    pipe.compact_deltas()
    # retain=0: the compaction's auto-GC collected the folded delta files,
    # so the stale manifest now references vanished inputs
    assert not any(os.path.exists(p) for p in delta_paths)

    real = mf.read_manifest
    fed = {"stale": False}

    def stale_first(lake_dir, *a, **k):
        if not fed["stale"] \
                and os.path.abspath(lake_dir) == os.path.abspath(lake):
            fed["stale"] = True
            return copy.deepcopy(stale)
        return real(lake_dir, *a, **k)

    monkeypatch.setattr(mf, "read_manifest", stale_first)
    stats = pipe.apply(ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("lsn"), cut)),
        batch_format="pyarrow", zero_copy_batch=True))
    assert fed["stale"]  # attempt 1 really ran against the stale manifest
    assert stats["events_applied"] > 0
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N_EVENTS))


def test_maybe_repartition_policy(ray_session, tmp_path_factory, oracle):
    """Auto-repartition hook: within the hysteresis band it is a
    manifest-only no-op; growth past drift_factor x target triggers ONE
    re-shard to the recommended count, after which state matches the
    oracle and fsck is green."""
    import ray.data

    from embulk_filter_timestamp_format_ray.state import manifest as mf_mod

    lake = str(tmp_path_factory.mktemp("lake_autorepart"))
    pipe = CDCPipeline(lake, num_partitions=2, partition_mode="conv")
    full = expected_event_table(N_EVENTS)
    pipe.apply(ray.data.from_arrow(full.slice(0, 1000)))

    rows_now = pipe.table_stats()["rows"]
    mean = rows_now / 2
    # in-band: no-op (target chosen so mean is within 2x either way)
    res = pipe.maybe_repartition(int(mean), drift_factor=2.0)
    assert res["repartitioned"] is False
    assert res["recommended_partitions"] >= 1
    assert mf_mod.read_manifest(lake)["partition_config"][
        "num_partitions"] == 2

    # growth past the band: one re-shard to ceil(rows/target)
    pipe.apply(ray.data.from_arrow(full.slice(1000, 2000)))
    rows_now = pipe.table_stats()["rows"]
    target = max(rows_now // 8, 1)  # mean/target = 4 > drift 2
    res = pipe.maybe_repartition(target, drift_factor=2.0)
    assert res["repartitioned"] is True
    want_p = -(-rows_now // target)
    assert res["result"]["num_partitions"] == want_p
    assert mf_mod.read_manifest(lake)["partition_config"][
        "num_partitions"] == want_p
    # idempotent: immediately after, the lake is in band
    assert pipe.maybe_repartition(target,
                                  drift_factor=2.0)["repartitioned"] is False

    # state unchanged by the policy rewrite; later applies merge correctly
    pipe.apply(ray.data.from_arrow(full.slice(3000)))
    _assert_matches_oracle(_lake_as_dict(pipe), oracle)
    assert pipe.fsck()["violations"] == []


def test_maybe_repartition_refusals(ray_session, tmp_path_factory):
    import ray.data

    lake = str(tmp_path_factory.mktemp("lake_autorepart_ref"))
    pipe = CDCPipeline(lake, num_partitions=2)
    pipe.apply(ray.data.from_arrow(expected_event_table(200)))
    with pytest.raises(ValueError, match="positive"):
        pipe.recommended_partitions(0)
    with pytest.raises(ValueError, match="drift_factor"):
        pipe.maybe_repartition(100, drift_factor=1.0)


def test_validate_table_report(ray_session):
    """Offline expectations report: SQL CHECK semantics (NULL passes value
    rules, not_null counts nulls), missing column = all-NULL column."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.constraints import (
        Constraint,
        validate_table,
    )

    t = pa.table({
        "a": pa.array([1, None, 5], pa.int64()),
        "s": pa.array(["ok", "BAD", None], pa.string()),
    })
    rep = validate_table(ray.data.from_arrow(t).repartition(2), (
        Constraint("a", "not_null"),
        Constraint("a", "between", lo="2"),       # 1 violates; NULL passes
        Constraint("s", "matches", values=("^[a-z]+$",)),  # BAD violates
        Constraint("missing", "not_null"),        # absent col = all NULL
        Constraint("missing", "in_set", values=("x",)),    # NULLs pass
    ))
    rows = {r["constraint_name"]: r for r in rep.to_pylist()}
    assert all(r["n_rows"] == 3 for r in rows.values())
    assert rows["a_not_null"]["n_violations"] == 1
    assert rows["a_between"]["n_violations"] == 1
    assert rows["s_matches"]["n_violations"] == 1
    assert rows["missing_not_null"]["n_violations"] == 3
    assert rows["missing_in_set"]["n_violations"] == 0
    assert rows["missing_in_set"]["passed"] is True
    assert rows["a_between"]["passed"] is False
