"""Hypothesis fuzzing of TimestampFormatStage: random configs over random
inputs must never crash — invalid values become NULL (warn policy) and
valid values round-trip through the scalar spec."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_filter_timestamp_format_ray.config import ColumnConfig, TaskConfig
from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.units import Ts
from embulk_filter_timestamp_format_ray.stages.timestamp_format import TimestampFormatStage

FORMATS = st.sampled_from([
    "%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d",
    "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd",
])
OUT_TYPES = st.sampled_from(["string", "timestamp", "long", "double"])
ZONES = st.sampled_from(["UTC", "Asia/Tokyo", "America/New_York", "+05:30"])

text_like = st.one_of(
    st.none(),
    st.text(max_size=24),
    st.integers(min_value=0, max_value=2_000_000_000).map(
        lambda s: TimestampFormatter("%Y-%m-%d %H:%M:%S", "UTC").format(Ts(s, 0))),
)


@given(fmt=FORMATS, out_type=OUT_TYPES, zone=ZONES,
       values=st.lists(text_like, min_size=1, max_size=20))
@settings(max_examples=120, deadline=None)
def test_stage_never_crashes_on_garbage(fmt, out_type, zone, values):
    task = TaskConfig(
        columns=(ColumnConfig("c", out_type, from_format=(fmt,),
                              to_timezone=zone),),
        default_from_timezone=zone,
    )
    stage = TimestampFormatStage(task)
    out = stage(pa.table({"c": pa.array(values, type=pa.string())}))
    assert out.num_rows == len(values)
    col = out.column("c").to_pylist()
    for v_in, v_out in zip(values, col):
        if v_in is None:
            assert v_out is None  # null passthrough, cast never invoked


@given(secs=st.lists(st.integers(min_value=0, max_value=2_000_000_000),
                     min_size=1, max_size=16),
       zone=ZONES)
@settings(max_examples=60, deadline=None)
def test_valid_inputs_always_cast(secs, zone):
    f = TimestampFormatter("%Y-%m-%d %H:%M:%S %z", "UTC")
    texts = [f.format(Ts(s, 0)) for s in secs]
    task = TaskConfig(columns=(ColumnConfig("c", "long", to_unit="sec",
                                            from_format=("%Y-%m-%d %H:%M:%S %z",)),),
                      default_from_timezone=zone)
    out = TimestampFormatStage(task)(pa.table({"c": texts}))
    assert out.column("c").to_pylist() == secs
