"""Stage robustness across Arrow input shapes: RecordBatch, chunked columns,
large_string, dictionary round-trips."""

import pyarrow as pa

from embulk_filter_timestamp_format_ray.config import ColumnConfig, TaskConfig
from embulk_filter_timestamp_format_ray.stages.timestamp_format import TimestampFormatStage

TASK = TaskConfig(
    columns=(ColumnConfig("s", "long", to_unit="ms"),),
    default_from_timestamp_format=("%Y-%m-%d %H:%M:%S %z", "%Y-%m-%d"),
)
ROWS = ["2015-07-13", "2015-07-12 16:00:00 UTC"]
EXPECT = [1436745600000, 1436716800000]


def test_record_batch_input():
    rb = pa.RecordBatch.from_pydict({"s": ROWS})
    out = TimestampFormatStage(TASK)(rb)
    assert out.column("s").to_pylist() == EXPECT


def test_chunked_column_input():
    t = pa.Table.from_batches([
        pa.RecordBatch.from_pydict({"s": ROWS[:1]}),
        pa.RecordBatch.from_pydict({"s": ROWS[1:]}),
    ])
    assert t.column("s").num_chunks == 2
    out = TimestampFormatStage(TASK)(t)
    assert out.column("s").to_pylist() == EXPECT


def test_large_string_input():
    t = pa.table({"s": pa.array(ROWS, type=pa.large_string())})
    out = TimestampFormatStage(TASK)(t)
    assert out.column("s").to_pylist() == EXPECT


def test_stage_reuse_across_batches():
    # kernels are built once and reused (R3); second call must not rebuild
    stage = TimestampFormatStage(TASK)
    t = pa.table({"s": ROWS})
    out1 = stage(t)
    kernel = stage._plain["s"]
    vp_before = kernel.vparser
    out2 = stage(t)
    assert stage._plain["s"].vparser is vp_before
    assert out1.equals(out2)
