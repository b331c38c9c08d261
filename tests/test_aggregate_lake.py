"""Aggregate pushdown (pipelines/cdc.py aggregate_lake): MIN/MAX/SUM/
COUNT(*) over folded live state — column-pruned, partition/row-group
pruned, distributed partial+combine; results equal the same aggregates
computed over a full read_lake() on every lake shape."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.pipelines.constraints import (
    parse_constraint,
)
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)


def _lake(tmp_path, n=1200, partitions=4, delta_tail=False, dv=False):
    import ray.data

    ev = expected_event_table(n)
    pipe = CDCPipeline(str(tmp_path / "lake"), num_partitions=partitions)
    if delta_tail:
        pipe.apply(ray.data.from_arrow(ev.slice(0, n // 2)))
        pipe.apply_delta(ray.data.from_arrow(ev.slice(n // 2)))
    else:
        pipe.apply(ray.data.from_arrow(ev))
    if dv:
        pipe.delete_where(parse_constraint("turn_idx:between:50,").matches,
                          mode="dv")
    return pipe


def _full(pipe) -> pa.Table:
    tbls = [b for b in pipe.read_lake().iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tbls, promote_options="permissive")


AGGS = {
    "n": (None, "count"),
    "min_turn": ("turn_idx", "min"),
    "max_turn": ("turn_idx", "max"),
    "sum_lsn": ("lsn", "sum"),
    "max_lsn": ("lsn", "max"),
}


def _expected(t: pa.Table) -> dict:
    return {
        "n": t.num_rows,
        "min_turn": pc.min(t.column("turn_idx")).as_py(),
        "max_turn": pc.max(t.column("turn_idx")).as_py(),
        "sum_lsn": pc.sum(t.column("lsn")).as_py(),
        "max_lsn": pc.max(t.column("lsn")).as_py(),
    }


@pytest.mark.parametrize("shape", ["clean", "delta", "dv"])
def test_aggregate_equals_full_read(ray_session, tmp_path, shape):
    pipe = _lake(tmp_path, delta_tail=(shape == "delta"),
                 dv=(shape == "dv"))
    got = pipe.aggregate_lake(AGGS)
    assert got == _expected(_full(pipe))


def test_aggregate_with_where_band(ray_session, tmp_path):
    pipe = _lake(tmp_path, delta_tail=True)
    specs = [parse_constraint("turn_idx:between:5,40")]
    t = _full(pipe)
    mask = np.ones(t.num_rows, dtype=bool)
    for c in specs:
        mask &= c.matches(t)
    band = t.filter(pa.array(mask))
    assert 0 < band.num_rows < t.num_rows
    got = pipe.aggregate_lake(AGGS, where=specs)
    assert got == _expected(band)


def test_count_only_short_circuits_and_refusals(ray_session, tmp_path):
    pipe = _lake(tmp_path)
    n = pipe.aggregate_lake({"n": (None, "count"),
                             "n2": ("turn_idx", "count")})
    assert n == {"n": pipe.count_rows(), "n2": pipe.count_rows()}
    with pytest.raises(ValueError, match="unknown aggregate 'avg'"):
        pipe.aggregate_lake({"x": ("lsn", "avg")})
    with pytest.raises(ValueError, match="unknown aggregate column"):
        pipe.aggregate_lake({"x": ("nope", "max")})


def test_empty_selection_yields_sql_nulls(ray_session, tmp_path):
    pipe = _lake(tmp_path, n=400, partitions=2)
    got = pipe.aggregate_lake(
        AGGS, where=[parse_constraint("turn_idx:between:90000,")])
    assert got["n"] == 0
    assert got["min_turn"] is None and got["sum_lsn"] is None
