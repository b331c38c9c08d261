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
