"""Driver-contract guard: queries()/oracle_sql() stay consistent, and
results are invariant to input block/batch boundaries (no accidental
block-dependence in any operator)."""

import sys

import pyarrow as pa

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entry  # noqa: E402


def test_oracles_subset_of_queries():
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    assert os_ <= qs, f"oracle without query: {os_ - qs}"
    # r2: every query has an oracle (fixture-backed for the
    # non-SQL-expressible ops — see scripts/make_fixtures.py)
    assert qs - os_ == set()


def test_callables_are_lazy():
    # building the dict must not touch Ray or the filesystem
    qs = entry.queries()
    assert len(qs) >= 30
    for fn in qs.values():
        assert callable(fn)


def test_cdc_final_state_block_invariant(ray_session, tmp_path_factory):
    """Same event stream split into different block counts must commit the
    identical final lake state (combiner effects are block-local only)."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    full = expected_event_table(1500)
    states = []
    for blocks in (1, 7):
        lake = str(tmp_path_factory.mktemp(f"lake_blocks{blocks}"))
        pipe = CDCPipeline(lake, num_partitions=8)
        ds = ray.data.from_arrow(full).repartition(blocks)
        pipe.apply(ds)
        t = pipe.final_state_sorted()
        states.append(t.select(["conv_id", "turn_idx", "text", "lsn"]))
    assert states[0].equals(states[1])
