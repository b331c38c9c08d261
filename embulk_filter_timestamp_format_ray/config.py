"""Plan-time configuration: per-column cast configs, task defaults,
validation, and output-schema derivation.

Reference mapping (/root/reference/src/main/java/org/embulk/filter/
timestamp_format/TimestampFormatFilterPlugin.java):

* ColumnConfig fields: name/type/from_format/from_timezone/to_format/
  to_timezone/from_unit/to_unit  (:38-55)
* PluginTask defaults: default_from_timestamp_format
  ["%Y-%m-%d %H:%M:%S.%N %z"], default_from_timezone "UTC",
  default_to_timestamp_format "%Y-%m-%d %H:%M:%S.%6N %z",
  default_to_timezone "UTC", default units "second",
  stop_on_invalid_record false, timestamp_parser "auto"  (:57-79 and
  TimestampParser.java:27-35, TimestampFormatter.java:24-33)
* validation: configured column must exist (JSONPath → top-level column);
  cast to boolean/json rejected; JSONPath → timestamp rejected  (:92-122)
* output schema = input schema with configured columns' types replaced,
  same names and order  (buildOuputSchema, :124-140)
"""

from __future__ import annotations

import dataclasses

import pyarrow as pa

from embulk_filter_timestamp_format_ray.functions.units import TimestampUnit, parse_unit

DEFAULT_FROM_FORMAT = ["%Y-%m-%d %H:%M:%S.%N %z"]
DEFAULT_TO_FORMAT = "%Y-%m-%d %H:%M:%S.%6N %z"

_VALID_TYPES = ("string", "timestamp", "long", "double")


class ConfigError(ValueError):
    pass


def is_json_path(name: str) -> bool:
    return name.startswith("$")


def json_path_top_column(name: str) -> str:
    """Top-level column of a JSONPath (JsonPathUtil.java:20-32)."""
    from embulk_filter_timestamp_format_ray.stages.jsonpath import parse_json_path

    steps = parse_json_path(name)
    if not steps or steps[0][0] != "field":
        raise ConfigError(f"jsonpath {name}: must start with a property")
    return steps[0][1]


@dataclasses.dataclass(frozen=True)
class ColumnConfig:
    name: str
    type: str = "string"
    from_format: "tuple[str, ...] | None" = None
    from_timezone: "str | None" = None
    to_format: "str | None" = None
    to_timezone: "str | None" = None
    from_unit: "str | TimestampUnit | None" = None
    to_unit: "str | TimestampUnit | None" = None

    def __post_init__(self):
        if isinstance(self.from_format, list):
            object.__setattr__(self, "from_format", tuple(self.from_format))


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    columns: "tuple[ColumnConfig, ...]" = ()
    default_from_timestamp_format: "tuple[str, ...]" = tuple(DEFAULT_FROM_FORMAT)
    default_from_timezone: str = "UTC"
    default_to_timestamp_format: str = DEFAULT_TO_FORMAT
    default_to_timezone: str = "UTC"
    default_from_timestamp_unit: "str | TimestampUnit" = "second"
    default_to_timestamp_unit: "str | TimestampUnit" = "second"
    stop_on_invalid_record: bool = False
    timestamp_parser: str = "auto"  # or "auto_java"

    def __post_init__(self):
        if isinstance(self.columns, list):
            object.__setattr__(self, "columns", tuple(self.columns))
        if isinstance(self.default_from_timestamp_format, list):
            object.__setattr__(
                self, "default_from_timestamp_format",
                tuple(self.default_from_timestamp_format),
            )

    # ---------------- resolved per-column accessors (ColumnCaster.java:62-141)

    def resolved_from_format(self, col: ColumnConfig) -> "tuple[str, ...]":
        return col.from_format or self.default_from_timestamp_format

    def resolved_from_timezone(self, col: ColumnConfig) -> str:
        return col.from_timezone or self.default_from_timezone

    def resolved_to_format(self, col: ColumnConfig) -> str:
        return col.to_format or self.default_to_timestamp_format

    def resolved_to_timezone(self, col: ColumnConfig) -> str:
        return col.to_timezone or self.default_to_timezone

    def resolved_from_unit(self, col: ColumnConfig) -> TimestampUnit:
        return parse_unit(col.from_unit or self.default_from_timestamp_unit)

    def resolved_to_unit(self, col: ColumnConfig) -> TimestampUnit:
        return parse_unit(col.to_unit or self.default_to_timestamp_unit)

    # ---------------- embulk YAML dialect front end

    @classmethod
    def from_dict(cls, d: "dict") -> "TaskConfig":
        """Build a TaskConfig from the reference's filter-config mapping
        (the dict under a ``filters:`` entry — same snake_case keys as the
        dataclass fields; ``type: timestamp_format`` is ignored)."""
        col_fields = {f.name for f in dataclasses.fields(ColumnConfig)}
        cols = []
        for c in d.get("columns") or ():
            unknown = set(c) - col_fields
            if unknown:
                raise ConfigError(
                    f"unknown column config keys {sorted(unknown)} for "
                    f"{c.get('name')!r}")
            cols.append(ColumnConfig(**c))
        task_fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k not in ("columns", "type")}
        unknown = set(kwargs) - task_fields
        if unknown:
            raise ConfigError(f"unknown task config keys {sorted(unknown)}")
        return cls(columns=tuple(cols), **kwargs)

    @classmethod
    def from_yaml(cls, src: str) -> "TaskConfig":
        """Parse the reference's YAML config dialect
        (/root/reference/README.md:27-64, example/example.yml:1-11).

        ``src`` is a path to a .yml file or a YAML string.  Accepts either a
        bare filter mapping or a full embulk config, in which case the first
        ``filters:`` entry with ``type: timestamp_format`` is used."""
        import os

        import yaml

        text = src
        if ("\n" not in src) and os.path.exists(src):
            with open(src) as f:
                text = f.read()
        doc = yaml.safe_load(text) or {}
        if not isinstance(doc, dict):
            raise ConfigError("config must be a YAML mapping")
        if "filters" in doc:
            for flt in doc["filters"] or ():
                if isinstance(flt, dict) and flt.get("type") == "timestamp_format":
                    return cls.from_dict(flt)
            raise ConfigError("no timestamp_format entry under filters:")
        return cls.from_dict(doc)


def validate(task: TaskConfig, input_schema: pa.Schema) -> None:
    """Plan-time checks (TimestampFormatFilterPlugin.java:92-122)."""
    for col in task.columns:
        name = col.name
        top = json_path_top_column(name) if is_json_path(name) else name
        if input_schema.get_field_index(top) < 0:
            raise ConfigError(f"column {top!r} is not found in input schema")
        if col.type not in _VALID_TYPES:
            if col.type in ("boolean", "json"):
                raise ConfigError(f'casting to {col.type} is not available: "{name}"')
            raise ConfigError(f"unknown cast type {col.type!r} for {name!r}")
        if is_json_path(name) and col.type == "timestamp":
            raise ConfigError(
                f'casting a json path into timestamp is not available: "{name}"'
            )
        parse_unit(col.from_unit or task.default_from_timestamp_unit)
        parse_unit(col.to_unit or task.default_to_timestamp_unit)


_ARROW_TYPES = {
    "string": pa.string(),
    "timestamp": pa.timestamp("ns", tz="UTC"),
    "long": pa.int64(),
    "double": pa.float64(),
}


def derive_output_schema(task: TaskConfig, input_schema: pa.Schema) -> pa.Schema:
    """Same names/order, configured plain columns get their target type
    (buildOuputSchema, TimestampFormatFilterPlugin.java:124-140).  JSONPath
    configs do not change the top-level column type (leaf types change inside
    the nested value)."""
    plain = {c.name: c for c in task.columns if not is_json_path(c.name)}
    fields = []
    for field in input_schema:
        cfg = plain.get(field.name)
        if cfg is not None:
            fields.append(pa.field(field.name, _ARROW_TYPES[cfg.type]))
        else:
            fields.append(field)
    return pa.schema(fields)
