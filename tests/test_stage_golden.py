"""Golden end-to-end tests for TimestampFormatStage over Arrow tables,
mirroring the reference example configs + committed preview outputs
(example/from_string.yml → from_string.txt, from_long, from_double,
from_timestamp, timezone, nested incl. bracket notation, empty)."""

import json

import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.config import (
    ColumnConfig,
    ConfigError,
    TaskConfig,
    derive_output_schema,
    validate,
)
from embulk_filter_timestamp_format_ray.functions.casts import CastError
from embulk_filter_timestamp_format_ray.stages.timestamp_format import TimestampFormatStage

FROM_STRING_ROWS = [
    "2015-07-13", "2015-07-13 UTC", "2015-07-13 00:00:00",
    "2015-07-12 16:00:00 UTC", "2015-07-12 16:00:00.1 UTC",
    "2015-07-12 16:00:00.12 UTC", "2015-07-12 16:00:00.123 UTC",
    "2015-07-12 16:00:00.1234 UTC", "2015-07-12 16:00:00.12345 UTC",
    "2015-07-12 16:00:00.123456 UTC", "2015-07-12 16:00:00.1234567 UTC",
    "2015-07-12 16:00:00.12345678 UTC", "2015-07-12 16:00:00.123456789 UTC",
]

EXPECT_STRING1 = [
    "2015-07-13 00:00:00.000000000", "2015-07-13 08:00:00.000000000",
    "2015-07-13 00:00:00.000000000", "2015-07-13 00:00:00.000000000",
    "2015-07-13 00:00:00.100000000", "2015-07-13 00:00:00.120000000",
    "2015-07-13 00:00:00.123000000", "2015-07-13 00:00:00.123400000",
    "2015-07-13 00:00:00.123450000", "2015-07-13 00:00:00.123456000",
    "2015-07-13 00:00:00.123456700", "2015-07-13 00:00:00.123456780",
    "2015-07-13 00:00:00.123456789",
]

EXPECT_LONG_MS = [
    1436716800000, 1436745600000, 1436716800000, 1436716800000,
    1436716800100, 1436716800120, 1436716800123, 1436716800123,
    1436716800123, 1436716800123, 1436716800123, 1436716800123, 1436716800123,
]


def _from_string_task():
    fmts = ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z",
            "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %z", "%Y-%m-%d"]
    return TaskConfig(
        columns=(
            ColumnConfig("string1", "string"),
            ColumnConfig("string2", "long", to_unit="ms"),
            ColumnConfig("string3", "double", to_unit="ms"),
            ColumnConfig("string4", "timestamp"),
        ),
        default_from_timezone="Asia/Taipei",
        default_from_timestamp_format=tuple(fmts),
        default_to_timezone="Asia/Taipei",
        default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
    )


def _from_string_table():
    return pa.table({f"string{i}": FROM_STRING_ROWS for i in range(1, 5)})


def test_from_string_golden():
    stage = TimestampFormatStage(_from_string_task())
    out = stage(_from_string_table())
    assert out.column("string1").to_pylist() == EXPECT_STRING1
    assert out.column("string2").to_pylist() == EXPECT_LONG_MS
    s3 = out.column("string3").to_pylist()
    assert s3[0] == 1.4367168e12
    assert s3[4] == 1436716800100.0
    assert s3[7] == pytest.approx(1436716800123.4, abs=1e-3)
    ts4 = out.column("string4")
    assert str(ts4.type) == "timestamp[ns, tz=UTC]"
    # 2015-07-12 16:00:00 UTC epoch ns
    assert ts4.to_pylist()[0].timestamp() == 1436716800.0


def test_from_string_with_nested_record_golden():
    # the FULL example.yml config: 4 plain string columns + JSONPath targets
    # inside the record column in one task (example/from_string.txt record col)
    fmts = ("%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z",
            "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %z", "%Y-%m-%d")
    task = TaskConfig(
        columns=(
            ColumnConfig("string1", "string"),
            ColumnConfig("string2", "long", to_unit="ms"),
            ColumnConfig("$.record.string1", "string", to_timezone="Asia/Taipei",
                         to_format="%Y-%m-%d %H:%M:%S.%N"),
            ColumnConfig("$.record.string2", "long", to_unit="ms"),
            ColumnConfig("$.record.string3", "double", to_unit="ms"),
        ),
        default_from_timezone="Asia/Taipei",
        default_from_timestamp_format=fmts,
        default_to_timezone="Asia/Taipei",
        default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
    )
    records = [json.dumps({"string1": v, "string2": v, "string3": v})
               for v in FROM_STRING_ROWS]
    t = pa.table({"string1": FROM_STRING_ROWS, "string2": FROM_STRING_ROWS,
                  "record": records})
    out = TimestampFormatStage(task)(t)
    assert out.column("string1").to_pylist() == EXPECT_STRING1
    assert out.column("string2").to_pylist() == EXPECT_LONG_MS
    docs = [json.loads(s) for s in out.column("record").to_pylist()]
    # golden rows from example/from_string.txt record:json column
    assert [d["string1"] for d in docs] == EXPECT_STRING1
    assert [d["string2"] for d in docs] == EXPECT_LONG_MS
    assert docs[0]["string3"] == 1.4367168e12
    assert docs[4]["string3"] == 1436716800100.0


def test_from_string_java_formats_golden():
    # example/from_string_java.yml
    task = TaskConfig(
        columns=(
            ColumnConfig("string1", "string"),
            ColumnConfig("string2", "long", to_unit="ms"),
        ),
        default_from_timezone="Asia/Taipei",
        default_from_timestamp_format=(
            "yyyy-MM-dd", "yyyy-MM-dd z", "yyyy-MM-dd HH:mm:ss.nnnnnnnnn z",
            "yyyy-MM-dd HH:mm:ss z", "yyyy-MM-dd HH:mm:ss"),
        default_to_timezone="Asia/Taipei",
        default_to_timestamp_format="yyyy-MM-dd HH:mm:ss.nnnnnn Z",
    )
    stage = TimestampFormatStage(task)
    out = stage(pa.table({"string1": FROM_STRING_ROWS, "string2": FROM_STRING_ROWS}))
    got = out.column("string1").to_pylist()
    assert got[0] == "2015-07-13 00:00:00.000000 +0800"
    assert got[1] == "2015-07-13 08:00:00.000000 +0800"
    assert got[4] == "2015-07-13 00:00:00.100000 +0800"
    assert got[12] == "2015-07-13 00:00:00.123456 +0800"
    assert out.column("string2").to_pylist() == EXPECT_LONG_MS


def test_from_string_auto_java_same_results():
    # example/from_string_auto_java.yml: ruby formats converted to java must
    # produce identical output to the pure-ruby config
    task = _from_string_task()
    auto = TaskConfig(**{**task.__dict__, "timestamp_parser": "auto_java",
                         "default_from_timestamp_format": (
                             "%Y-%m-%d", "%Y-%m-%d %Z", "%Y-%m-%d %H:%M:%S.%N %Z",
                             "%Y-%m-%d %H:%M:%S %Z", "%Y-%m-%d %H:%M:%S")})
    out = TimestampFormatStage(auto)(_from_string_table())
    assert out.column("string1").to_pylist() == EXPECT_STRING1
    assert out.column("string2").to_pylist() == EXPECT_LONG_MS


def test_from_long_golden():
    # example/from_long.yml + from_long.txt
    task = TaskConfig(
        columns=(
            ColumnConfig("long1", "string", to_timezone="Asia/Tokyo",
                         to_format="%Y-%m-%d %H:%M:%S.%N"),
            ColumnConfig("long2", "long"),
            ColumnConfig("long3", "double"),
            ColumnConfig("long4", "timestamp"),
        ),
        default_from_timestamp_unit="ms",
    )
    t = pa.table({f"long{i}": [1436713200100] for i in range(1, 5)})
    out = TimestampFormatStage(task)(t)
    assert out.column("long1").to_pylist() == ["2015-07-13 00:00:00.100000000"]
    assert out.column("long2").to_pylist() == [1436713200]
    assert out.column("long3").to_pylist() == [1.4367132e9]  # integer div first!
    assert out.column("long4").to_pylist()[0].timestamp() == pytest.approx(1436713200.1)


def test_from_double_golden():
    # example/from_double.yml + from_double.txt (float artifact .100199936)
    task = TaskConfig(
        columns=(
            ColumnConfig("double1", "string", to_timezone="Asia/Tokyo",
                         to_format="%Y-%m-%d %H:%M:%S.%N"),
            ColumnConfig("double2", "long"),
            ColumnConfig("double3", "double"),
            ColumnConfig("double4", "timestamp"),
        ),
        default_from_timestamp_unit="ms",
    )
    t = pa.table({f"double{i}": [1436713200100.2] for i in range(1, 5)})
    out = TimestampFormatStage(task)(t)
    assert out.column("double1").to_pylist() == ["2015-07-13 00:00:00.100199936"]
    assert out.column("double2").to_pylist() == [1436713200]
    assert out.column("double3").to_pylist() == [pytest.approx(1.4367132001002e9)]


def test_from_timestamp_golden():
    # example/from_timestamp.yml + from_timestamp.txt
    task = TaskConfig(
        columns=(
            ColumnConfig("timestamp1", "string", to_format="%Y-%m-%d %H:%M:%S.%N"),
            ColumnConfig("timestamp2", "long", to_unit="ms"),
            ColumnConfig("timestamp3", "double", to_unit="ms"),
            ColumnConfig("timestamp4", "timestamp"),
        ),
        default_to_timezone="Asia/Tokyo",
        default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
    )
    ts = pa.array([1436713200100000000], type=pa.int64()).cast(pa.timestamp("ns")).cast(
        pa.timestamp("ns", tz="UTC"))
    t = pa.table({f"timestamp{i}": ts for i in range(1, 5)})
    out = TimestampFormatStage(task)(t)
    assert out.column("timestamp1").to_pylist() == ["2015-07-13 00:00:00.100000000"]
    assert out.column("timestamp2").to_pylist() == [1436713200100]
    assert out.column("timestamp3").to_pylist() == [1.4367132001e12]
    assert out.column("timestamp4").to_pylist()[0].timestamp() == pytest.approx(1436713200.1)


def test_timezone_golden():
    # example/timezone.yml + timezone.txt ("+0900" rendering)
    task = TaskConfig(
        columns=(
            ColumnConfig("string1", "string", to_format="%Y-%m-%d",
                         to_timezone="Asia/Tokyo"),
            ColumnConfig("string2", "string", to_format="%Y-%m-%d %H:%M:%S.%N %z",
                         to_timezone="Asia/Tokyo"),
        ),
        default_from_timestamp_format=("%Y-%m-%d %H:%M:%S.%N %z",
                                       "%Y-%m-%d %H:%M:%S %z"),
    )
    rows = ["2015-07-12 15:00:00 UTC", "2015-07-12 15:00:00.1 UTC"]
    out = TimestampFormatStage(task)(pa.table({"string1": rows, "string2": rows}))
    assert out.column("string1").to_pylist() == ["2015-07-13", "2015-07-13"]
    assert out.column("string2").to_pylist() == [
        "2015-07-13 00:00:00.000000000 +0900",
        "2015-07-13 00:00:00.100000000 +0900",
    ]


NESTED_DOCS = [
    {"timestamp": "2015-07-12 15:00:00 UTC",
     "nested": {"nested": [{"timestamp": "2015-07-12 15:00:00 UTC"}]},
     "ignore_nested": {"timestamp": "2015-07-12 15:00:00 UTC"}},
    {"timestamp": "2015-07-12 15:00:00.1 UTC",
     "nested": {"nested": [{"timestamp": "2015-07-12 15:00:00.1 UTC"}]},
     "ignore_nested": {"timestamp": "2015-07-12 15:00:00.1 UTC"}},
]

NESTED_TASK = TaskConfig(
    columns=(
        ColumnConfig("$.record.timestamp", "long",
                     from_format=("%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"),
                     to_unit="ms"),
        ColumnConfig("$.record.nested.nested[0].timestamp", "string",
                     from_format=("%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z")),
    ),
    default_to_timezone="Asia/Tokyo",
    default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
)


def test_nested_json_string_golden():
    # example/nested.yml + nested.txt over JSON-encoded string column
    t = pa.table({"record": [json.dumps(d) for d in NESTED_DOCS]})
    out = TimestampFormatStage(NESTED_TASK)(t)
    docs = [json.loads(s) for s in out.column("record").to_pylist()]
    assert docs[0]["timestamp"] == 1436713200000
    assert docs[1]["timestamp"] == 1436713200100
    assert docs[0]["nested"]["nested"][0]["timestamp"] == "2015-07-13 00:00:00.000000000"
    assert docs[1]["nested"]["nested"][0]["timestamp"] == "2015-07-13 00:00:00.100000000"
    # untouched sibling subtree passes through (shouldVisit pruning)
    assert docs[0]["ignore_nested"]["timestamp"] == "2015-07-12 15:00:00 UTC"
    assert docs[1]["ignore_nested"]["timestamp"] == "2015-07-12 15:00:00.1 UTC"


def test_nested_struct_golden():
    # same semantics over a typed Arrow struct column
    t = pa.table({"record": pa.array(NESTED_DOCS)})
    out = TimestampFormatStage(NESTED_TASK)(t)
    docs = out.column("record").to_pylist()
    assert docs[0]["timestamp"] == 1436713200000
    assert docs[1]["timestamp"] == 1436713200100
    assert docs[0]["nested"]["nested"][0]["timestamp"] == "2015-07-13 00:00:00.000000000"
    assert docs[0]["ignore_nested"]["timestamp"] == "2015-07-12 15:00:00 UTC"


def test_bracket_notation_same_as_dot():
    task = TaskConfig(
        columns=(
            ColumnConfig("$['record']['timestamp']", "long",
                         from_format=("%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"),
                         to_unit="ms"),
            ColumnConfig("$['record']['nested']['nested'][0]['timestamp']", "string",
                         from_format=("%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z")),
        ),
        default_to_timezone="Asia/Tokyo",
        default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
    )
    t = pa.table({"record": [json.dumps(d) for d in NESTED_DOCS]})
    out = TimestampFormatStage(task)(t)
    docs = [json.loads(s) for s in out.column("record").to_pylist()]
    assert docs[0]["timestamp"] == 1436713200000
    assert docs[0]["nested"]["nested"][0]["timestamp"] == "2015-07-13 00:00:00.000000000"


def test_wildcard_rewrites_every_element():
    task = TaskConfig(
        columns=(ColumnConfig("$.record.arr[*].t", "string",
                              from_format=("%Y-%m-%d %H:%M:%S %z",)),),
        default_to_timestamp_format="%Y-%m-%d",
        default_to_timezone="Asia/Tokyo",
    )
    doc = {"arr": [{"t": "2015-07-12 15:00:00 UTC"}, {"t": "2015-07-13 15:00:00 UTC"}]}
    t = pa.table({"record": pa.array([doc])})
    out = TimestampFormatStage(task)(t)
    got = out.column("record").to_pylist()[0]
    assert [e["t"] for e in got["arr"]] == ["2015-07-13", "2015-07-14"]


def test_wildcard_type_change_on_struct_list():
    # list<struct<t: string>> with [*] cast to long — the whole leaf column
    # changes type (homogeneous), exercising list rebuild with a new child type
    task = TaskConfig(
        columns=(ColumnConfig("$.record.arr[*].t", "long",
                              from_format=("%Y-%m-%d %H:%M:%S %z",),
                              to_unit="ms"),),
    )
    doc = {"arr": [{"t": "2015-07-12 15:00:00 UTC"}, {"t": "2015-07-12 16:00:00 UTC"}]}
    t = pa.table({"record": pa.array([doc])})
    out = TimestampFormatStage(task)(t)
    got = out.column("record").to_pylist()[0]
    assert [e["t"] for e in got["arr"]] == [1436713200000, 1436716800000]


def test_empty_config_noop():
    t = _from_string_table()
    out = TimestampFormatStage(TaskConfig())(t)
    assert out.equals(t)


def test_null_passthrough():
    task = _from_string_task()
    t = pa.table({
        "string1": ["2015-07-13", None], "string2": ["2015-07-13", None],
        "string3": ["2015-07-13", None], "string4": ["2015-07-13", None],
    })
    out = TimestampFormatStage(task)(t)
    assert out.column("string1").to_pylist()[1] is None
    assert out.column("string2").to_pylist()[1] is None
    assert out.column("string4").to_pylist()[1] is None


def test_error_policy_warn_null():
    task = _from_string_task()
    t = pa.table({
        "string1": ["2015-07-13", "INVALID"], "string2": ["2015-07-13", "x"],
        "string3": ["2015-07-13", "x"], "string4": ["2015-07-13", "x"],
    })
    stage = TimestampFormatStage(task)
    out = stage(t)
    assert out.column("string1").to_pylist() == ["2015-07-13 00:00:00.000000000", None]
    assert out.column("string2").to_pylist()[1] is None
    assert stage.invalid_total == 4


def test_error_policy_stop_on_invalid():
    task = TaskConfig(**{**_from_string_task().__dict__, "stop_on_invalid_record": True})
    t = pa.table({
        "string1": ["INVALID"], "string2": ["2015-07-13"],
        "string3": ["2015-07-13"], "string4": ["2015-07-13"],
    })
    with pytest.raises(CastError):
        TimestampFormatStage(task)(t)


def test_json_mode_stop_on_invalid():
    task = TaskConfig(
        columns=(ColumnConfig("$.doc.t", "long",
                              from_format=("%Y-%m-%d",), to_unit="ms"),),
        stop_on_invalid_record=True,
    )
    t = pa.table({"doc": [json.dumps({"t": "not-a-date"})]})
    with pytest.raises(CastError):
        TimestampFormatStage(task)(t)
    # warn mode nulls the leaf instead
    task2 = TaskConfig(columns=task.columns, stop_on_invalid_record=False)
    out = TimestampFormatStage(task2)(t)
    assert json.loads(out.column("doc").to_pylist()[0])["t"] is None


def test_validation_errors():
    schema = pa.schema([pa.field("a", pa.string())])
    with pytest.raises(ConfigError):
        validate(TaskConfig(columns=(ColumnConfig("missing"),)), schema)
    with pytest.raises(ConfigError):
        validate(TaskConfig(columns=(ColumnConfig("a", "boolean"),)), schema)
    with pytest.raises(ConfigError):
        validate(TaskConfig(columns=(ColumnConfig("a", "json"),)), schema)
    with pytest.raises(ConfigError):
        validate(TaskConfig(columns=(ColumnConfig("$.a.b", "timestamp"),)), schema)


def test_output_schema_derivation():
    schema = pa.schema([("s", pa.string()), ("keep", pa.int64())])
    task = TaskConfig(columns=(ColumnConfig("s", "timestamp"),))
    out = derive_output_schema(task, schema)
    assert out.names == ["s", "keep"]
    assert out.field("s").type == pa.timestamp("ns", tz="UTC")
    assert out.field("keep").type == pa.int64()


def test_wide_range_year_9999_parse():
    """Reference parity (TimestampParser.java:149, TimestampUnit.java:59):
    the reference's (epochSecond: long, nano: int) type parses any year a
    long holds.  r2: the stage retries vector-tier rejects through the
    scalar spec, so wide dates survive for long/double/string outputs; only
    the Arrow timestamp[ns] output type NULLs them (documented divergence,
    explicit error under stop_on_invalid)."""
    import pytest

    from embulk_filter_timestamp_format_ray import ColumnConfig, TaskConfig
    from embulk_filter_timestamp_format_ray.functions.casts import CastError
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    arr = pa.table({"c": pa.array(
        ["9999-12-31 23:59:59.123456789", "1500-01-01 00:00:00.000000000",
         "2016-05-12 15:02:39.123456789", "not a date"])})
    fmt = ["%Y-%m-%d %H:%M:%S.%N"]

    long_stage = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("c", "long", from_format=fmt, from_timezone="UTC",
                     to_unit="sec"),)))
    got = long_stage(arr).column("c").to_pylist()
    assert got == [253402300799, -14831769600, 1463065359, None]

    str_stage = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("c", "string", from_format=fmt, from_timezone="UTC",
                     to_format="%Y-%m-%d %H:%M:%S.%N %z"),)))
    got = str_stage(arr).column("c").to_pylist()
    assert got[0] == "9999-12-31 23:59:59.123456789 +0000"
    assert got[1] == "1500-01-01 00:00:00.000000000 +0000"
    assert got[3] is None

    ts_stage = TimestampFormatStage(TaskConfig(columns=(
        ColumnConfig("c", "timestamp", from_format=fmt, from_timezone="UTC"),)))
    got = ts_stage(arr).column("c").to_pylist()
    assert got[0] is None and got[1] is None and got[2] is not None

    strict = TimestampFormatStage(TaskConfig(
        stop_on_invalid_record=True,
        columns=(ColumnConfig("c", "timestamp", from_format=fmt,
                              from_timezone="UTC"),)))
    with pytest.raises(CastError, match="timestamp\\[ns\\] range"):
        strict(pa.table({"c": pa.array(["9999-12-31 23:59:59.000000000"])}))
