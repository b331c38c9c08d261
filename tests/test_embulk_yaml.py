"""Reference YAML configs run verbatim against the engine.

The reference's user surface is the embulk YAML dialect
(/root/reference/README.md:27-64); these tests load the example configs
from /root/reference/example/*.yml unchanged, run them through
TaskConfig.from_yaml + run_embulk_config, and compare against the
committed preview goldens (example/*.txt) already encoded in
tests/test_stage_golden.py.
"""

import os

import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.config import ConfigError, TaskConfig
from tests.test_stage_golden import EXPECT_LONG_MS, EXPECT_STRING1

EXAMPLES = "/root/reference/example"

needs_reference = pytest.mark.skipif(not os.path.isdir(EXAMPLES),
                                     reason="reference examples not present")


def _collect(ds) -> pa.Table:
    import ray

    blocks = [ray.get(r) for r in ds.to_arrow_refs()]
    return pa.concat_tables([b for b in blocks if b.num_rows],
                            promote_options="permissive")


@needs_reference
def test_from_yaml_parses_example_config():
    task = TaskConfig.from_yaml(os.path.join(EXAMPLES, "example.yml"))
    assert task.default_from_timezone == "Asia/Taipei"
    assert task.default_to_timestamp_format == "%Y-%m-%d %H:%M:%S.%N"
    assert len(task.columns) == 7
    by_name = {c.name: c for c in task.columns}
    assert by_name["string2"].type == "long"
    assert by_name["string2"].to_unit == "ms"
    assert by_name["$.record.string1"].to_timezone == "Asia/Taipei"
    assert task.default_from_timestamp_format[0] == "%Y-%m-%d %H:%M:%S.%N %z"


@needs_reference
def test_from_yaml_bare_filter_mapping():
    task = TaskConfig.from_yaml(
        "columns:\n  - {name: c1, type: long, to_unit: ms}\n")
    assert task.columns[0].name == "c1"
    assert task.columns[0].to_unit == "ms"


def test_from_yaml_rejects_unknown_keys():
    with pytest.raises(ConfigError):
        TaskConfig.from_yaml("columns:\n  - {name: c1, bogus_key: 1}\n")
    with pytest.raises(ConfigError):
        TaskConfig.from_yaml("default_bogus: 1\n")
    with pytest.raises(ConfigError):
        TaskConfig.from_yaml("in: {type: file}\nfilters:\n  - type: other\n")


@needs_reference
def test_run_from_string_yml_verbatim(ray_session):
    """example/from_string.yml end-to-end: csv in → filter → golden rows
    from example/from_string.txt."""
    from embulk_filter_timestamp_format_ray.sources.embulk_yaml import (
        run_embulk_config,
    )

    out = _collect(run_embulk_config(os.path.join(EXAMPLES, "from_string.yml")))
    assert out.num_rows == 13
    assert sorted(out.column("string1").to_pylist()) == sorted(EXPECT_STRING1)
    assert sorted(out.column("string2").to_pylist()) == sorted(EXPECT_LONG_MS)
    assert str(out.column("string4").type) == "timestamp[ns, tz=UTC]"


@needs_reference
def test_run_from_timestamp_yml_verbatim(ray_session):
    """example/from_timestamp.yml: the csv parser's timestamp-typed source
    columns (parser-level default_timestamp_format) feed the filter.
    Goldens from example/from_timestamp.txt."""
    from embulk_filter_timestamp_format_ray.sources.embulk_yaml import (
        run_embulk_config,
    )

    out = _collect(
        run_embulk_config(os.path.join(EXAMPLES, "from_timestamp.yml")))
    assert out.num_rows == 1
    assert out.column("timestamp1").to_pylist() == ["2015-07-13 00:00:00.100000000"]
    assert out.column("timestamp2").to_pylist() == [1436713200100]
    assert out.column("timestamp3").to_pylist() == [1436713200100.0]
    ts4 = out.column("timestamp4").to_pylist()[0]
    assert ts4.timestamp() == pytest.approx(1436713200.1)


@needs_reference
def test_run_from_long_yml_verbatim(ray_session):
    """example/from_long.yml incl. its JSONPath targets inside record:json.
    Goldens from example/from_long.txt."""
    import json

    from embulk_filter_timestamp_format_ray.sources.embulk_yaml import (
        run_embulk_config,
    )

    out = _collect(run_embulk_config(os.path.join(EXAMPLES, "from_long.yml")))
    assert out.num_rows == 1
    assert out.column("long1").to_pylist() == ["2015-07-13 00:00:00.100000000"]
    assert out.column("long2").to_pylist() == [1436713200]
    assert out.column("long3").to_pylist() == [1436713200.0]
    rec = json.loads(out.column("record").to_pylist()[0])
    assert rec["long1"] == "2015-07-13 00:00:00.100000000"
    assert rec["long2"] == 1436713200


# ------------------------------------------------------------------ r4:
# the remaining reference example configs, run VERBATIM (yml files loaded
# unchanged from /root/reference/example) against their .txt preview goldens.


def _run(name: str):
    from embulk_filter_timestamp_format_ray.sources.embulk_yaml import (
        run_embulk_config,
    )

    return _collect(run_embulk_config(os.path.join(EXAMPLES, name)))


@needs_reference
def test_run_timezone_yml_verbatim(ray_session):
    """example/timezone.yml vs timezone.txt (+0900 rendering)."""
    out = _run("timezone.yml")
    assert out.num_rows == 2
    assert sorted(out.column("string1").to_pylist()) == ["2015-07-13"] * 2
    assert sorted(out.column("string2").to_pylist()) == [
        "2015-07-13 00:00:00.000000000 +0900",
        "2015-07-13 00:00:00.100000000 +0900",
    ]


@needs_reference
def test_run_from_double_yml_verbatim(ray_session):
    """example/from_double.yml vs from_double.txt (the .100199936 float
    artifact is the golden, not a bug)."""
    import json

    out = _run("from_double.yml")
    assert out.num_rows == 1
    assert out.column("double1").to_pylist() == ["2015-07-13 00:00:00.100199936"]
    assert out.column("double2").to_pylist() == [1436713200]
    assert out.column("double3").to_pylist() == [pytest.approx(1.4367132001002e9)]
    assert out.column("double4").cast(pa.int64()).to_pylist() == \
        [1436713200_100199936]
    rec = json.loads(out.column("record").to_pylist()[0])
    assert rec["double1"] == "2015-07-13 00:00:00.100199936"
    assert rec["double2"] == 1436713200
    assert rec["double3"] == pytest.approx(1.4367132001002e9)


NESTED_EXPECT_TS_MS = [1436713200000, 1436713200100]
NESTED_EXPECT_INNER = ["2015-07-13 00:00:00.000000000",
                       "2015-07-13 00:00:00.100000000"]
NESTED_EXPECT_IGNORED = ["2015-07-12 15:00:00 UTC", "2015-07-12 15:00:00.1 UTC"]


def _check_nested_golden(out):
    """Shared golden for nested.yml / bracket_notation.yml (nested.txt and
    bracket_notation.txt hold the same values — only JSONPath spelling
    differs)."""
    import json

    assert out.num_rows == 2
    docs = sorted((json.loads(s) for s in out.column("record").to_pylist()),
                  key=lambda d: d["timestamp"])
    assert [d["timestamp"] for d in docs] == NESTED_EXPECT_TS_MS
    assert [d["nested"]["nested"][0]["timestamp"] for d in docs] == \
        NESTED_EXPECT_INNER
    assert [d["ignore_nested"]["timestamp"] for d in docs] == \
        NESTED_EXPECT_IGNORED


@needs_reference
def test_run_nested_yml_verbatim(ray_session):
    """example/nested.yml (JSONL source → single 'record' json column, the
    embulk JsonParserPlugin contract) vs nested.txt."""
    _check_nested_golden(_run("nested.yml"))


@needs_reference
def test_run_bracket_notation_yml_verbatim(ray_session):
    """example/bracket_notation.yml ($['record']['...'] spelling) vs
    bracket_notation.txt — identical values to nested.yml."""
    _check_nested_golden(_run("bracket_notation.yml"))


EXPECT_STRING1_JAVA = [
    "2015-07-13 00:00:00.000000 +0800", "2015-07-13 08:00:00.000000 +0800",
    "2015-07-13 00:00:00.000000 +0800", "2015-07-13 00:00:00.000000 +0800",
    "2015-07-13 00:00:00.100000 +0800", "2015-07-13 00:00:00.120000 +0800",
    "2015-07-13 00:00:00.123000 +0800", "2015-07-13 00:00:00.123400 +0800",
    "2015-07-13 00:00:00.123450 +0800", "2015-07-13 00:00:00.123456 +0800",
    "2015-07-13 00:00:00.123456 +0800", "2015-07-13 00:00:00.123456 +0800",
    "2015-07-13 00:00:00.123456 +0800",
]

EXPECT_TS4_NS = [
    1436716800_000000000, 1436745600_000000000,
    1436716800_000000000, 1436716800_000000000,
    1436716800_100000000, 1436716800_120000000, 1436716800_123000000,
    1436716800_123400000, 1436716800_123450000, 1436716800_123456000,
    1436716800_123456700, 1436716800_123456780, 1436716800_123456789,
]


@needs_reference
def test_run_from_string_java_yml_verbatim(ray_session):
    """example/from_string_java.yml (pure java directives, incl. the
    'yyyy-MM-dd HH:mm:ss.nnnnnn Z' output format) vs from_string_java.txt."""
    import json

    out = _run("from_string_java.yml")
    assert out.num_rows == 13
    assert sorted(out.column("string1").to_pylist()) == sorted(EXPECT_STRING1_JAVA)
    assert sorted(out.column("string2").to_pylist()) == sorted(EXPECT_LONG_MS)
    assert sorted(out.column("string4").cast(pa.int64()).to_pylist()) == \
        sorted(EXPECT_TS4_NS)
    docs = [json.loads(s) for s in out.column("record").to_pylist()]
    assert sorted(d["string1"] for d in docs) == sorted(EXPECT_STRING1_JAVA)
    assert sorted(d["string2"] for d in docs) == sorted(EXPECT_LONG_MS)


@needs_reference
def test_run_from_string_auto_java_yml_verbatim(ray_session):
    """example/from_string_auto_java.yml (timestamp_parser: auto_java — ruby
    directives converted to java at plan time) vs from_string_auto_java.txt:
    same values as the pure-ruby from_string run."""
    import json

    out = _run("from_string_auto_java.yml")
    assert out.num_rows == 13
    assert sorted(out.column("string1").to_pylist()) == sorted(EXPECT_STRING1)
    assert sorted(out.column("string2").to_pylist()) == sorted(EXPECT_LONG_MS)
    assert sorted(out.column("string4").cast(pa.int64()).to_pylist()) == \
        sorted(EXPECT_TS4_NS)
    docs = [json.loads(s) for s in out.column("record").to_pylist()]
    assert sorted(d["string1"] for d in docs) == sorted(EXPECT_STRING1)
    assert sorted(d["string2"] for d in docs) == sorted(EXPECT_LONG_MS)


@needs_reference
def test_run_empty_yml_verbatim(ray_session, tmp_path):
    """example/empty.yml (a timestamp_format filter with NO columns) must be
    an exact passthrough.  The reference repo ships no example.jsonl, so the
    input is synthesized; the config text runs unchanged."""
    import json

    from embulk_filter_timestamp_format_ray.sources.embulk_yaml import (
        run_embulk_config,
    )

    lines = [json.dumps({"a": 1, "ts": "2015-07-12 15:00:00 UTC"}),
             json.dumps({"a": 2, "ts": "2015-07-12 15:00:00.1 UTC"})]
    (tmp_path / "example").mkdir()
    (tmp_path / "example" / "example.jsonl").write_text("\n".join(lines) + "\n")
    with open(os.path.join(EXAMPLES, "empty.yml")) as f:
        yml_text = f.read()
    out = _collect(run_embulk_config(yml_text, base_dir=str(tmp_path)))
    assert sorted(out.column("record").to_pylist()) == sorted(lines)
