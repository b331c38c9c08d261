"""Run the reference's full YAML configs against the Ray engine.

The reference's user surface is an embulk YAML config
(/root/reference/README.md:27-64, example/example.yml:1-11): an ``in:``
file source with a csv/json parser, a ``filters:`` list containing the
``timestamp_format`` entry, and an ``out:`` sink.  This module maps that
dialect onto Ray Data so the example configs run verbatim:

* ``in: type: file`` + ``parser: type: csv`` → ``read_csv_with_schema``
  with the declared column list (embulk csv parsers declare names/types, no
  header).  ``timestamp``-typed source columns are parsed with the
  parser-level ``default_timestamp_format`` / ``default_timezone``
  (CsvParserPlugin semantics) via the engine's own parser kernels.
* ``parser: type: json`` → text lines as ONE json column named ``record``
  (embulk JsonParserPlugin semantics — the examples' JSONPaths start
  ``$.record.``), feeding the filter's dynamic JSON-string mode.
* the ``timestamp_format`` filter → ``TimestampFormatStage`` built by
  ``TaskConfig.from_yaml``.
* ``out:`` is ignored — callers consume the returned Dataset (the examples
  all use ``out: type: "null"``).
"""

from __future__ import annotations

import os

import pyarrow as pa

from embulk_filter_timestamp_format_ray.config import (
    ColumnConfig,
    ConfigError,
    TaskConfig,
)

# embulk CsvParserPlugin defaults (reference example/from_timestamp.yml
# relies on the parser-level default_timestamp_format)
_CSV_DEFAULT_TS_FORMAT = "%Y-%m-%d %H:%M:%S.%N %z"

_CSV_TYPES = {
    "string": pa.string(),
    "json": pa.string(),     # opaque JSON text; JSONPath configs rewrite it
    "long": pa.int64(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
}


def load_input(doc: dict, base_dir: "str | None" = None):
    """Build a Ray Dataset from a config's ``in:`` section."""
    in_cfg = doc.get("in")
    if not isinstance(in_cfg, dict) or in_cfg.get("type") != "file":
        raise ConfigError("only 'in: {type: file}' sources are supported")
    path = in_cfg.get("path_prefix")
    if not path:
        raise ConfigError("in: section needs a path_prefix")
    if base_dir is not None:
        path = os.path.join(base_dir, path)
    parser = in_cfg.get("parser") or {}
    ptype = parser.get("type", "csv")
    if ptype == "json":
        # embulk's json parser (JsonParserPlugin) emits ONE json-typed column
        # named "record" per input line — the example configs' JSONPath
        # targets all start "$.record." for this reason.  The engine's json
        # representation is a JSON-encoded string column (dynamic mode of
        # TimestampFormatStage), so: text lines → column "record".
        import ray.data

        return ray.data.read_text(path).map_batches(
            lambda b: b.rename_columns(["record"]),
            batch_format="pyarrow", zero_copy_batch=True)
    if ptype != "csv":
        raise ConfigError(f"unsupported parser type {ptype!r}")
    from embulk_filter_timestamp_format_ray.sources.readers import (
        read_csv_with_schema,
    )

    schema = {}
    ts_cols = []
    for c in parser.get("columns") or ():
        t = c.get("type", "string")
        if t == "timestamp":
            schema[c["name"]] = pa.string()
            ts_cols.append(c)
        elif t in _CSV_TYPES:
            schema[c["name"]] = _CSV_TYPES[t]
        else:
            raise ConfigError(f"unsupported csv column type {t!r}")
    if not schema:
        raise ConfigError("csv parser needs a columns: list")
    ds = read_csv_with_schema(path, schema,
                              delimiter=parser.get("delimiter", ","))
    if ts_cols:
        from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
            TimestampFormatStage,
        )

        fmt = parser.get("default_timestamp_format", _CSV_DEFAULT_TS_FORMAT)
        pre = TaskConfig(
            columns=tuple(
                ColumnConfig(c["name"], "timestamp",
                             from_format=(c.get("format") or fmt,))
                for c in ts_cols),
            default_from_timezone=parser.get("default_timezone", "UTC"))
        ds = ds.map_batches(TimestampFormatStage(pre), batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds


def run_embulk_config(yml_src: str, base_dir: "str | None" = None):
    """Load a reference-dialect YAML config (path or YAML text) and return
    the lazily-built Ray Dataset: in: source → timestamp_format filter."""
    import yaml

    text = yml_src
    if ("\n" not in yml_src) and os.path.exists(yml_src):
        if base_dir is None:
            # embulk resolves path_prefix relative to the invocation cwd;
            # for a config file the natural default is its parent-of-parent
            # (examples use "example/<file>" prefixes)
            base_dir = os.path.dirname(os.path.dirname(os.path.abspath(yml_src)))
        with open(yml_src) as f:
            text = f.read()
    doc = yaml.safe_load(text) or {}
    if not isinstance(doc, dict):
        raise ConfigError("config must be a YAML mapping")
    task = TaskConfig.from_yaml(text)
    ds = load_input(doc, base_dir=base_dir)
    from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
        TimestampFormatStage,
    )

    return ds.map_batches(TimestampFormatStage(task), batch_format="pyarrow",
                          zero_copy_batch=True)
