"""Commit-time expectations (pipelines/constraints.py) — Delta-Lake-style
CHECK constraints on the CDC lake.

Contract under test:

* three enforcement tiers mirroring the reference's C10 error surface
  (stop_on_invalid_record, TimestampFormatFilterPlugin.java:64): abort /
  drop-with-warning / quarantine with ``constraint:<name>``
* SQL CHECK semantics: NULL passes value checks; ``not_null`` applies to
  full-payload upserts only; payload-free ops (delete / delete_conv) are
  exempt from everything
* durability: the enforced set is recorded in the manifest; a writer
  constructed without ``constraints=`` adopts it, an explicit tuple
  replaces it, the empty tuple drops it
* maintenance commits (compaction / repartition / transform) carry the
  committed set; rollback restores the snapshot's set
* fsck re-checks value kinds on the folded live state (catching
  violations a transform smuggled past ingest)
* the quarantine heals after relaxing the constraint (reprocess_dlq)
* both exchanges and the multi-table fan-out enforce identically
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import (
    CDCPipeline,
    apply_multi,
)
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    Constraint,
    constraints_from_manifest,
    parse_constraint,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.state import manifest as mf

ROLE_SET = "role:in:assistant,system,user,tool"


def _with_bad_roles(ev: pa.Table, every: int = 80) -> pa.Table:
    roles = ev.column("role").to_pylist()
    bad = [i for i in range(0, ev.num_rows, every)
           if ev.column("op")[i].as_py() == "upsert"]
    for i in bad:
        roles[i] = "robot"
    i = ev.schema.get_field_index("role")
    return ev.set_column(i, "role", pa.array(roles)), len(bad)


def _shift_lsn(ev: pa.Table, by: int) -> pa.Table:
    i = ev.schema.get_field_index("lsn")
    return ev.set_column(
        i, "lsn", pc.add(ev.column("lsn"), pa.scalar(by, pa.int64())))


# --------------------------------------------------------------- unit tier
def test_parse_constraint_kinds():
    c = parse_constraint("role:not_null")
    assert (c.column, c.kind) == ("role", "not_null")
    c = parse_constraint(ROLE_SET)
    assert c.kind == "in_set" and c.values == (
        "assistant", "system", "user", "tool")
    c = parse_constraint("lsn:between:0,1000")
    assert (c.lo, c.hi) == ("0", "1000")
    c = parse_constraint("lsn:between:,1000")
    assert (c.lo, c.hi) == (None, "1000")
    c = parse_constraint(r"conv_id:matches:^conv-\d+$")
    assert c.kind == "matches" and c.values == (r"^conv-\d+$",)
    # round trip
    for spec in ("role:not_null", ROLE_SET, "lsn:between:5,",
                 "text:matches:a|b"):
        c = parse_constraint(spec)
        assert Constraint.from_json(c.to_json()) == c


def test_parse_constraint_rejects():
    for bad in ("role", "role:shouty", "role:not_null:x", "x:in:",
                "lsn:between:1", "text:matches:???"):
        with pytest.raises(ValueError):
            parse_constraint(bad)
    with pytest.raises(ValueError):
        Constraint("x", "in_set")  # no values


def test_null_passes_value_checks_and_op_scoping():
    t = pa.table({
        "op": ["upsert", "upsert", "delete", "patch", "upsert"],
        "role": ["user", None, "robot", "robot", "robot"],
    })
    in_set = Constraint("role", "in_set", values=("user",))
    # NULL passes; payload-free delete exempt; patch + upsert violate
    assert in_set.violations(t).tolist() == [False, False, False, True, True]
    nn = Constraint("role", "not_null")
    # not_null binds upserts only (a patch asserts nothing about the column)
    t2 = pa.table({
        "op": ["upsert", "patch", "delete", "upsert"],
        "role": [None, None, None, "user"],
    })
    assert nn.violations(t2).tolist() == [True, False, False, False]
    # fsck view (no op column): value kinds on every row, not_null skipped
    t3 = pa.table({"role": ["user", "robot", None]})
    assert in_set.violations(t3).tolist() == [False, True, False]
    assert nn.violations(t3).tolist() == [False, False, False]
    # a column the table lacks entirely reads NULL (passes value checks)
    assert in_set.violations(pa.table({"op": ["upsert"]})).tolist() == [False]


def test_between_casts_bounds_to_column_type():
    t = pa.table({"op": ["upsert"] * 3, "lsn": pa.array([1, 5, 9], pa.int64())})
    c = parse_constraint("lsn:between:2,8")
    assert c.violations(t).tolist() == [True, False, True]
    ts = pa.array([0, 10**18], pa.timestamp("ns", tz="UTC"))
    t2 = pa.table({"op": ["upsert"] * 2, "ts": ts})
    c2 = parse_constraint("ts:between:1980-01-01,")
    assert c2.violations(t2).tolist() == [True, False]


# -------------------------------------------------------- enforcement tiers
def test_drop_tier_and_durability(ray_session, tmp_path):
    import ray.data

    ev, n_bad = _with_bad_roles(expected_event_table(800))
    assert n_bad > 0
    c = parse_constraint(ROLE_SET)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4,
                       constraints=(c,))
    pipe.apply(ray.data.from_arrow(ev))
    state = pipe.final_state_sorted()
    assert pc.sum(pc.cast(pc.equal(state.column("role"), "robot"),
                          pa.int64())).as_py() in (0, None)
    committed = constraints_from_manifest(mf.read_manifest(pipe.lake_dir))
    assert committed == (c,)

    # a later writer with no constraints= ADOPTS the committed set
    tail = CDCPipeline.from_lake(pipe.lake_dir)
    tail.apply(ray.data.from_arrow(_shift_lsn(ev, 800)))
    state = tail.final_state_sorted()
    assert pc.sum(pc.cast(pc.equal(state.column("role"), "robot"),
                          pa.int64())).as_py() in (0, None)

    # the empty tuple DROPS the committed set; violations then flow through
    off = CDCPipeline.from_lake(pipe.lake_dir, constraints=())
    off.apply(ray.data.from_arrow(_shift_lsn(ev, 1600)))
    m = mf.read_manifest(pipe.lake_dir)
    assert "constraints" not in m
    state = off.final_state_sorted()
    assert pc.sum(pc.cast(pc.equal(state.column("role"), "robot"),
                          pa.int64())).as_py() > 0


def test_abort_tier(ray_session, tmp_path):
    import ray.data

    ev, _ = _with_bad_roles(expected_event_table(400))
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=2,
                       constraints=(parse_constraint(ROLE_SET),),
                       stop_on_invalid=True)
    with pytest.raises(Exception, match="violate constraint role_in_set"):
        pipe.apply(ray.data.from_arrow(ev))
    assert mf.read_manifest(pipe.lake_dir).get("version", 0) == 0


def test_dlq_tier_quarantines_and_heals(ray_session, tmp_path):
    import ray.data

    ev, n_bad = _with_bad_roles(expected_event_table(800))
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4,
                       constraints=(parse_constraint(ROLE_SET),), dlq=True)
    pipe.apply(ray.data.from_arrow(ev))
    dlq = pipe.read_dlq()
    assert dlq.num_rows == n_bad
    assert set(pc.unique(dlq.column("dlq_reason")).to_pylist()) == {
        "constraint:role_in_set"}

    # relax the expectation, reprocess: quarantine drains, rows merge with
    # their ORIGINAL lsns, the manifest records the relaxed set
    pipe.constraints = (parse_constraint(ROLE_SET + ",robot"),)
    res = pipe.reprocess_dlq()
    assert res["events_seen"] == n_bad
    assert res["events_quarantined"] == 0
    assert pipe.read_dlq().num_rows == 0
    state = pipe.final_state_sorted()
    assert pc.sum(pc.cast(pc.equal(state.column("role"), "robot"),
                          pa.int64())).as_py() > 0
    committed = constraints_from_manifest(mf.read_manifest(pipe.lake_dir))
    assert committed == pipe.constraints


def test_actor_exchange_enforces(ray_session, tmp_path):
    import ray.data

    ev, _ = _with_bad_roles(expected_event_table(600))
    c = parse_constraint(ROLE_SET)
    a = CDCPipeline(str(tmp_path / "a"), num_partitions=2, constraints=(c,))
    a.apply(ray.data.from_arrow(ev), exchange="actor")
    b = CDCPipeline(str(tmp_path / "b"), num_partitions=2, constraints=(c,))
    b.apply(ray.data.from_arrow(ev))
    sa, sb = a.final_state_sorted(), b.final_state_sorted()
    assert sa.equals(sb)  # bit-identical across exchanges
    assert constraints_from_manifest(mf.read_manifest(a.lake_dir)) == (c,)


def test_apply_multi_per_lake_constraints(ray_session, tmp_path):
    import ray.data

    # odd stride so violations land in BOTH parity-tagged lakes
    ev, n_bad = _with_bad_roles(expected_event_table(600), every=79)
    tag = pa.array(["even" if i % 2 == 0 else "odd"
                    for i in range(ev.num_rows)])
    ev = ev.append_column("table", tag)
    c = parse_constraint(ROLE_SET)
    pipes = {
        "even": CDCPipeline(str(tmp_path / "even"), num_partitions=2,
                            constraints=(c,)),
        "odd": CDCPipeline(str(tmp_path / "odd"), num_partitions=2),
    }
    apply_multi(ray.data.from_arrow(ev), pipes)
    even = pipes["even"].final_state_sorted()
    odd = pipes["odd"].final_state_sorted()
    n_even = pc.sum(pc.cast(pc.equal(even.column("role"), "robot"),
                            pa.int64())).as_py() or 0
    n_odd = pc.sum(pc.cast(pc.equal(odd.column("role"), "robot"),
                           pa.int64())).as_py() or 0
    assert n_even == 0            # constrained lake stays clean
    assert n_odd > 0              # unconstrained lake admits the rows
    assert constraints_from_manifest(
        mf.read_manifest(pipes["even"].lake_dir)) == (c,)
    assert "constraints" not in mf.read_manifest(pipes["odd"].lake_dir)


# ------------------------------------------------- durability across commits
def test_maintenance_commits_carry_constraints(ray_session, tmp_path):
    import ray.data

    ev = expected_event_table(800)
    c = parse_constraint(ROLE_SET)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=4,
                       constraints=(c,))
    pipe.apply(ray.data.from_arrow(ev.slice(0, 400)))
    pipe.apply_delta(ray.data.from_arrow(ev.slice(400)))
    pipe.compact_deltas()
    assert constraints_from_manifest(mf.read_manifest(pipe.lake_dir)) == (c,)
    pipe.repartition_lake(8)
    assert constraints_from_manifest(mf.read_manifest(pipe.lake_dir)) == (c,)
    pipe.transform_lake(lambda s: s)
    assert constraints_from_manifest(mf.read_manifest(pipe.lake_dir)) == (c,)

    # rollback restores the snapshot's constraint metadata with the rest
    v_before = mf.read_manifest(pipe.lake_dir)["version"]
    CDCPipeline.from_lake(pipe.lake_dir, constraints=()).apply(
        ray.data.from_arrow(_shift_lsn(ev, 800)))
    assert "constraints" not in mf.read_manifest(pipe.lake_dir)
    pipe.rollback(v_before)
    assert constraints_from_manifest(mf.read_manifest(pipe.lake_dir)) == (c,)


def test_fsck_flags_smuggled_violation(ray_session, tmp_path):
    import ray.data

    ev = expected_event_table(600)
    c = parse_constraint(ROLE_SET)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=3,
                       constraints=(c,))
    pipe.apply(ray.data.from_arrow(ev))
    assert pipe.fsck()["violations"] == []

    # transform_lake's contract guards keys/lsns, not values — it can
    # smuggle a constraint violation into committed state; fsck catches it
    def corrupt(state):
        roles = state.column("role").to_pylist()
        if roles:
            roles[0] = "robot"
        i = state.schema.get_field_index("role")
        return state.set_column(i, "role", pa.array(roles, pa.string()))

    pipe.transform_lake(corrupt)
    rep = pipe.fsck()
    assert rep["violations"]
    assert all("constraint role_in_set" in v["problems"]
               for v in rep["violations"])
