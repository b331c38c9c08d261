"""JSONPath dialect restrictions (JsonPathUtil.java:33-77) and the
[i] → [*] array fallback (JsonVisitor.java:101-103)."""

import json

import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.config import ColumnConfig, TaskConfig
from embulk_filter_timestamp_format_ray.stages.jsonpath import (
    JsonPathError,
    canonical,
    parse_json_path,
)
from embulk_filter_timestamp_format_ray.stages.timestamp_format import TimestampFormatStage


def test_dot_and_bracket_parse_same():
    assert parse_json_path("$.a.b[0].c") == parse_json_path("$['a']['b'][0]['c']")
    assert canonical("$.a.b[0]") == "$['a']['b'][0]"
    assert canonical("$.arr[*]") == "$['arr'][*]"


def test_rejections():
    with pytest.raises(JsonPathError):
        parse_json_path("$..scan")           # scan
    with pytest.raises(JsonPathError):
        parse_json_path("$.a[?(@.b==1)]")    # predicate
    with pytest.raises(JsonPathError):
        parse_json_path("$.a[1:3]")          # slice
    with pytest.raises(JsonPathError):
        parse_json_path("$.a[0,1]")          # multi-index
    with pytest.raises(JsonPathError):
        parse_json_path("no-dollar")


def test_bracket_notation_key_containing_dot():
    # README.md:73: $['payload']['key1.key2'] — dots inside bracket-quoted
    # keys are literal, not path separators
    steps = parse_json_path("$['payload']['key1.key2']")
    assert steps == [("field", "payload"), ("field", "key1.key2")]
    task = TaskConfig(
        columns=(ColumnConfig("$['doc']['a.b']", "long",
                              from_format=("%Y-%m-%d",), to_unit="ms"),),
    )
    out = TimestampFormatStage(task)(
        pa.table({"doc": ['{"a.b": "2015-07-13", "a": {"b": "keep"}}']}))
    got = json.loads(out.column("doc").to_pylist()[0])
    assert got["a.b"] == 1436745600000
    assert got["a"]["b"] == "keep"  # the dotted sibling path is untouched


def test_index_falls_back_to_wildcard():
    # config targets arr[*]; document visits index 0 and 1 → both rewritten
    # via the [i] → [*] fallback
    task = TaskConfig(
        columns=(ColumnConfig("$.doc.arr[*].t", "long",
                              from_format=("%Y-%m-%d %H:%M:%S %z",),
                              to_unit="ms"),),
    )
    doc = {"arr": [{"t": "2015-07-12 15:00:00 UTC"},
                   {"t": "2015-07-12 16:00:00 UTC"}]}
    out = TimestampFormatStage(task)(pa.table({"doc": [json.dumps(doc)]}))
    got = json.loads(out.column("doc").to_pylist()[0])
    assert got["arr"][0]["t"] == 1436713200000
    assert got["arr"][1]["t"] == 1436716800000


def test_exact_index_only_touches_that_element():
    task = TaskConfig(
        columns=(ColumnConfig("$.doc.arr[1].t", "long",
                              from_format=("%Y-%m-%d %H:%M:%S %z",),
                              to_unit="ms"),),
    )
    doc = {"arr": [{"t": "2015-07-12 15:00:00 UTC"},
                   {"t": "2015-07-12 16:00:00 UTC"}]}
    out = TimestampFormatStage(task)(pa.table({"doc": [json.dumps(doc)]}))
    got = json.loads(out.column("doc").to_pylist()[0])
    assert got["arr"][0]["t"] == "2015-07-12 15:00:00 UTC"  # untouched
    assert got["arr"][1]["t"] == 1436716800000
