"""TimestampFormatStage — the reference's one logical operator as a
zero-copy Arrow ``map_batches`` callable.

Reference mapping:
* per-task setup done once in ``__init__``/first batch (parser/formatter
  tables, ColumnCaster.java:51-57; shouldCastSet, ColumnVisitorImpl.java:47-64)
* per-batch work is vectorized kernel dispatch per (input type → output type)
  pair — the 4x4 cast matrix of ColumnCaster.java:144-244 — instead of the
  reference's per-row visitor loop (TimestampFormatFilterPlugin.java:177-185)
* null in → null out without invoking the cast (ColumnVisitorImpl.java:82-84)
* error policy: invalid value → warn + NULL, or raise when
  stop_on_invalid_record (ColumnVisitorImpl.java:79-99)
* ``timestamp_parser: auto_java`` rewrites ruby from_formats through the
  converter before building parsers (ColumnCaster.java:76-90)
* untouched columns pass through zero-copy (performance trick #2,
  SURVEY.md §4)

Nested data: Arrow struct/list columns are rewritten structurally
(JsonVisitor.java:89-140 analog with subtree pruning by construction — only
addressed children are rebuilt); string columns holding JSON documents use a
dynamic per-row visitor with the same semantics (runtime-type leaf dispatch,
JsonCaster.java:46-110; ``[i]`` → ``[*]`` fallback, JsonVisitor.java:101-103).

Usage:
    stage = TimestampFormatStage(task)
    ds = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
"""

from __future__ import annotations

import json
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.config import (
    ColumnConfig,
    ConfigError,
    TaskConfig,
    is_json_path,
    json_path_top_column,
    validate,
)
from embulk_filter_timestamp_format_ray.functions.casts import CastError
from embulk_filter_timestamp_format_ray.functions.format_convert import to_java_format
from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.parser import ParseError, TimestampParser
from embulk_filter_timestamp_format_ray.functions.units import (
    NANOS_PER_SEC,
    TimestampUnit,
    Ts,
    change_unit_double,
    change_unit_long,
    double_to_timestamp,
    long_to_timestamp,
    timestamp_to_double,
    timestamp_to_long,
    v_change_unit_double,
    v_change_unit_long,
    v_double_to_ns,
    v_long_to_ns,
    v_ns_to_double,
    v_ns_to_long,
)
from embulk_filter_timestamp_format_ray.functions.vectorized import (
    VectorParser,
    make_vector_formatter,
)
from embulk_filter_timestamp_format_ray.stages.jsonpath import parse_json_path

logger = logging.getLogger(__name__)

_TS_NS_UTC = pa.timestamp("ns", tz="UTC")


def _resolve_from_formats(task: TaskConfig, cfg: ColumnConfig) -> "list[str]":
    fmts = list(task.resolved_from_format(cfg))
    if task.timestamp_parser == "auto_java":
        out = []
        for f in fmts:
            if "%" in f:
                j = to_java_format(f)
                out.append(j if j is not None else f)
            else:
                out.append(f)
        return out
    return fmts


class ColumnKernel:
    """Vectorized caster for one configured column (or one nested leaf)."""

    def __init__(self, task: TaskConfig, cfg: ColumnConfig):
        self.name = cfg.name
        self.out_type = cfg.type
        self.stop_on_invalid = task.stop_on_invalid_record
        self.from_formats = _resolve_from_formats(task, cfg)
        self.from_tz = task.resolved_from_timezone(cfg)
        self.to_format = task.resolved_to_format(cfg)
        self.to_tz = task.resolved_to_timezone(cfg)
        self.from_unit = task.resolved_from_unit(cfg)
        self.to_unit = task.resolved_to_unit(cfg)
        # built once per worker (actor __init__ / first task batch), reused
        # for every batch: R3 pattern
        self._vparser: "VectorParser | None" = None
        self._vformatter = None
        self._scalar_parser: "TimestampParser | None" = None
        self._scalar_formatter: "TimestampFormatter | None" = None

    # lazy builders keep pickled stage payloads tiny (only config strings
    # cross the driver→worker boundary)
    @property
    def vparser(self) -> VectorParser:
        if self._vparser is None:
            self._vparser = VectorParser(self.from_formats, self.from_tz)
        return self._vparser

    @property
    def vformatter(self):
        if self._vformatter is None:
            self._vformatter = make_vector_formatter(self.to_format, self.to_tz)
        return self._vformatter

    @property
    def scalar_parser(self) -> TimestampParser:
        if self._scalar_parser is None:
            self._scalar_parser = TimestampParser(self.from_formats, self.from_tz)
        return self._scalar_parser

    @property
    def scalar_formatter(self) -> TimestampFormatter:
        if self._scalar_formatter is None:
            self._scalar_formatter = TimestampFormatter(self.to_format, self.to_tz)
        return self._scalar_formatter

    # ------------------------------------------------------------ array cast

    def cast_array(self, arr: "pa.Array | pa.ChunkedArray") -> "tuple[pa.Array, int]":
        """Apply the configured cast to a column; → (new array, n_invalid)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        if pa.types.is_boolean(t):
            return arr, 0  # boolean always passes through (R1)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return self._from_string(arr)
        if pa.types.is_integer(t):
            return self._from_long(arr), 0
        if pa.types.is_floating(t):
            return self._from_double(arr), 0
        if pa.types.is_timestamp(t):
            return self._from_timestamp(arr), 0
        raise CastError(f"unsupported input type {t} for column {self.name!r}")

    def _emit_from_ns(self, ns: np.ndarray, null_mask: "np.ndarray | None") -> pa.Array:
        """ns epoch array (+ null mask) → configured output type."""
        if self.out_type == "string":
            out = self.vformatter.format_array(ns)
        elif self.out_type == "timestamp":
            out = pa.array(ns).cast(pa.timestamp("ns")).cast(_TS_NS_UTC)
        elif self.out_type == "long":
            out = pa.array(v_ns_to_long(ns, self.to_unit))
        else:  # double
            out = pa.array(v_ns_to_double(ns, self.to_unit))
        if null_mask is not None and null_mask.any():
            out = pc.if_else(pa.array(~null_mask), out, pa.scalar(None, out.type))
        return out

    def _null_mask(self, arr: pa.Array) -> "np.ndarray | None":
        if arr.null_count == 0:
            return None
        return np.asarray(pc.is_null(arr))

    def _from_string(self, arr: pa.Array) -> "tuple[pa.Array, int]":
        ns, valid, is_null = self.vparser.parse_array(arr)
        invalid = ~valid & ~is_null
        # Wide-envelope fallback (reference parity, TimestampParser.java:149 /
        # TimestampUnit.java:59): the scalar spec carries (epoch sec, nano)
        # for ANY year a long can hold, while the vector tier's int64-ns
        # window spans 1678–2261.  Rows the vector tier rejected are retried
        # through the scalar parser; successes are "wide" timestamps —
        # representable for long/double/string outputs, unrepresentable only
        # for the Arrow timestamp[ns] output type.
        wide: "list[tuple[int, Ts]]" = []
        if invalid.any():
            strs = None
            for i in np.nonzero(invalid)[0]:
                if strs is None:
                    strs = arr.to_pylist()
                try:
                    ts = self.scalar_parser.parse(strs[i])
                except (ParseError, ValueError):
                    continue
                wide.append((int(i), ts))
                invalid[i] = False
        n_invalid = int(invalid.sum())
        if n_invalid and self.stop_on_invalid:
            bad = arr.filter(pa.array(invalid))[0].as_py()
            raise CastError(f'failed to parse string: "{bad}"')
        if wide and self.out_type == "timestamp":
            if self.stop_on_invalid:
                raise CastError(
                    f"{len(wide)} parsed timestamp(s) fall outside the Arrow "
                    f"timestamp[ns] range (years 1678-2261) for column "
                    f"{self.name!r}; use type long/double/string for "
                    f"wide-range dates (documented divergence from the "
                    f"reference's (sec,nano) in-memory type)")
            logger.warning(
                "%d parsed timestamp(s) outside the timestamp[ns] range set "
                "to NULL (use long/double/string output for wide dates)",
                len(wide))
            for i, _ in wide:
                invalid[i] = True
            n_invalid += len(wide)
            wide = []
        null_mask = is_null | invalid
        if wide:
            wide_rows = np.array([i for i, _ in wide])
            null_mask = null_mask.copy()
            null_mask[wide_rows] = True  # placeholder; patched below
        out = self._emit_from_ns(ns, null_mask if null_mask.any() else None)
        if wide:
            vals = out.to_pylist()  # wide rows are rare; per-row patch is fine
            for i, ts in wide:
                if self.out_type == "long":
                    vals[i] = timestamp_to_long(ts, self.to_unit)
                elif self.out_type == "double":
                    vals[i] = timestamp_to_double(ts, self.to_unit)
                else:  # string
                    vals[i] = self.scalar_formatter.format(ts)
            out = pa.array(vals, type=out.type)
        return out, n_invalid

    def _from_long(self, arr: pa.Array) -> pa.Array:
        null_mask = self._null_mask(arr)
        vals = np.asarray(pc.fill_null(arr.cast(pa.int64()), 0))
        if self.out_type == "long":
            out = pa.array(v_change_unit_long(vals, self.from_unit, self.to_unit))
        elif self.out_type == "double":
            # LongCast.asDouble: integer changeUnit first, then widen
            out = pa.array(
                v_change_unit_long(vals, self.from_unit, self.to_unit).astype(np.float64)
            )
        else:
            return self._emit_from_ns(v_long_to_ns(vals, self.from_unit), null_mask)
        if null_mask is not None:
            out = pc.if_else(pa.array(~null_mask), out, pa.scalar(None, out.type))
        return out

    def _from_double(self, arr: pa.Array) -> pa.Array:
        null_mask = self._null_mask(arr)
        vals = np.asarray(pc.fill_null(arr.cast(pa.float64()), 0.0))
        if self.out_type == "long":
            # DoubleCast.asLong: (long) changeUnit — trunc toward zero
            out = pa.array(
                np.trunc(v_change_unit_double(vals, self.from_unit, self.to_unit)).astype(np.int64)
            )
        elif self.out_type == "double":
            out = pa.array(v_change_unit_double(vals, self.from_unit, self.to_unit))
        else:
            return self._emit_from_ns(v_double_to_ns(vals, self.from_unit), null_mask)
        if null_mask is not None:
            out = pc.if_else(pa.array(~null_mask), out, pa.scalar(None, out.type))
        return out

    def _from_timestamp(self, arr: pa.Array) -> pa.Array:
        null_mask = self._null_mask(arr)
        ns_arr = arr.cast(pa.timestamp("ns", tz=arr.type.tz) if arr.type.tz else pa.timestamp("ns"))
        ns = np.asarray(pc.fill_null(ns_arr.cast(pa.int64()), 0))
        if self.out_type == "timestamp":
            return arr.cast(_TS_NS_UTC)
        return self._emit_from_ns(ns, null_mask)

    # ------------------------------------------------------- scalar leaf cast

    def cast_scalar_json_value(self, value):
        """Runtime-type dispatch for dynamic JSON leaves (JsonCaster analog).
        Raises CastError for invalid strings."""
        if isinstance(value, bool) or value is None:
            return value
        if isinstance(value, int):
            ts = long_to_timestamp(value, self.from_unit)
        elif isinstance(value, float):
            ts = double_to_timestamp(value, self.from_unit)
        elif isinstance(value, str):
            try:
                ts = self.scalar_parser.parse(value)
            except (ParseError, ValueError) as exc:
                raise CastError(f'failed to parse string: "{value}"') from exc
        else:
            return value
        if self.out_type == "string":
            return self.scalar_formatter.format(ts)
        if self.out_type == "long":
            if isinstance(value, int):
                return change_unit_long(value, self.from_unit, self.to_unit)
            if isinstance(value, float):
                return int(change_unit_double(value, self.from_unit, self.to_unit))
            return timestamp_to_long(ts, self.to_unit)
        if self.out_type == "double":
            if isinstance(value, int):
                return float(change_unit_long(value, self.from_unit, self.to_unit))
            if isinstance(value, float):
                return change_unit_double(value, self.from_unit, self.to_unit)
            return timestamp_to_double(ts, self.to_unit)
        raise CastError(f"json leaf cannot cast to {self.out_type}")


# ---------------------------------------------------------------- nested


class _StructRewriter:
    """Rewrite Arrow struct/list columns along compiled paths."""

    def __init__(self, paths: "list[tuple[list, ColumnKernel]]"):
        self.paths = paths

    def rewrite(self, arr: "pa.Array | pa.ChunkedArray") -> "tuple[pa.Array, int]":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        total_invalid = 0
        for steps, kernel in self.paths:
            arr, n = self._apply(arr, steps[1:], kernel)  # steps[0] is the column
            total_invalid += n
        return arr, total_invalid

    def _apply(self, arr: pa.Array, steps: list, kernel: ColumnKernel):
        if not steps:
            return kernel.cast_array(arr)
        kind, val = steps[0]
        if pa.types.is_struct(arr.type):
            if kind != "field":
                raise ConfigError(f"path step {steps[0]} does not match struct")
            idx = arr.type.get_field_index(val)
            if idx < 0:
                return arr, 0  # missing field: untouched (prune)
            children = [arr.field(i) for i in range(arr.type.num_fields)]
            new_child, n = self._apply(children[idx], steps[1:], kernel)
            children[idx] = new_child
            fields = [
                pa.field(arr.type.field(i).name, children[i].type)
                for i in range(arr.type.num_fields)
            ]
            mask = None
            if arr.null_count:
                mask = pc.is_null(arr)
            out = pa.StructArray.from_arrays(children, fields=fields, mask=mask)
            return out, n
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            if kind == "field":
                raise ConfigError(f"path step {steps[0]} does not match list")
            values = arr.values
            if kind == "wildcard":
                new_values, n = self._apply(values, steps[1:], kernel)
            else:  # single index: transform only matching slots
                offsets = np.asarray(arr.offsets)
                lengths = np.diff(offsets)
                target = offsets[:-1] + val
                sel = target[(val >= 0) & (val < lengths)]
                if len(sel) == 0:
                    return arr, 0
                sub = values.take(pa.array(sel))
                new_sub, n = self._apply(sub, steps[1:], kernel)
                if new_sub.type != values.type:
                    raise ConfigError(
                        f"single-index cast changing leaf type ({values.type} -> "
                        f"{new_sub.type}) requires a wildcard [*] or a JSON-string "
                        f"column (Arrow lists are homogeneously typed)"
                    )
                mask = np.zeros(len(values), dtype=bool)
                mask[sel] = True
                # scatter: positions sel replaced by new_sub
                scatter_idx = np.full(len(values), -1, dtype=np.int64)
                scatter_idx[sel] = np.arange(len(sel))
                taken = new_sub.take(pa.array(np.where(mask, scatter_idx, 0)))
                new_values = pc.if_else(pa.array(mask), taken, values)
            out = pa.ListArray.from_arrays(
                pa.array(np.asarray(arr.offsets), type=pa.int32()),
                new_values,
            )
            if arr.null_count:
                # re-apply validity
                out = pc.if_else(pc.is_valid(arr), out, pa.scalar(None, out.type))
            return out, n
        raise ConfigError(f"cannot descend into {arr.type} with step {steps[0]}")


class _JsonStringRewriter:
    """Dynamic JSON documents in a string column: faithful JsonVisitor port
    (shouldVisit pruning, [i]→[*] fallback, runtime-type leaf dispatch)."""

    def __init__(self, paths: "list[tuple[list, ColumnKernel]]", stop_on_invalid: bool):
        self.stop_on_invalid = stop_on_invalid
        #  canonical partial path ("$['a'][0]") → prune set; full path → kernel
        self.kernels: dict[str, ColumnKernel] = {}
        self.should_visit: set[str] = set()
        for steps, kernel in paths:
            partial = "$"
            for kind, val in steps[1:]:  # steps[0] is the column itself
                if kind == "field":
                    partial += f"['{val}']"
                elif kind == "index":
                    partial += f"[{val}]"
                else:
                    partial += "[*]"
                self.should_visit.add(partial)
            self.kernels[partial] = kernel

    def rewrite(self, arr: "pa.Array | pa.ChunkedArray") -> "tuple[pa.Array, int]":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        out = []
        n_invalid = 0
        for s in arr.to_pylist():
            if s is None:
                out.append(None)
                continue
            try:
                doc = json.loads(s)
            except (ValueError, TypeError):
                out.append(s)
                continue
            doc, bad = self._visit("$", doc)
            n_invalid += bad
            out.append(json.dumps(doc, separators=(",", ":")))
        return pa.array(out, type=arr.type), n_invalid

    def _visit(self, path: str, value):
        if path != "$" and path not in self.should_visit:
            return value, 0
        bad = 0
        if isinstance(value, dict):
            out = {}
            for k, v in value.items():
                nv, b = self._visit(f"{path}['{k}']", v)
                out[k] = nv
                bad += b
            return out, bad
        if isinstance(value, list):
            out_l = []
            for i, v in enumerate(value):
                k = f"{path}[{i}]"
                if k not in self.should_visit:
                    k = f"{path}[*]"  # [i] → [*] fallback
                nv, b = self._visit(k, v)
                out_l.append(nv)
                bad += b
            return out_l, bad
        kernel = self.kernels.get(path)
        if kernel is None or isinstance(value, bool) or value is None:
            return value, 0
        try:
            return kernel.cast_scalar_json_value(value), 0
        except CastError:
            if self.stop_on_invalid:
                raise
            logger.warning('failed to cast json leaf at %s: "%s"', path, value)
            return None, 1


# ---------------------------------------------------------------- the stage


class TimestampFormatStage:
    """Callable class for ``map_batches(..., batch_format="pyarrow")``.

    Stateless-cheap: parser/formatter tables are built lazily on the worker
    on first use and reused for every subsequent batch (works equally as a
    plain task closure or as an actor pool via ``concurrency=``).
    """

    def __init__(self, task: TaskConfig):
        self.task = task
        self._plain: "dict[str, ColumnKernel] | None" = None
        self._nested: "dict[str, list] | None" = None
        self._validated = False
        self.invalid_total = 0

    def _build(self, schema: pa.Schema) -> None:
        if not self._validated:
            validate(self.task, schema)
            self._validated = True
        plain: dict[str, ColumnKernel] = {}
        nested: dict[str, list] = {}
        for cfg in self.task.columns:
            if is_json_path(cfg.name):
                steps = parse_json_path(cfg.name)
                top = json_path_top_column(cfg.name)
                nested.setdefault(top, []).append((steps, ColumnKernel(self.task, cfg)))
            else:
                plain[cfg.name] = ColumnKernel(self.task, cfg)
        self._plain = plain
        self._nested = nested

    def __call__(self, batch: "pa.Table | pa.RecordBatch") -> pa.Table:
        if isinstance(batch, pa.RecordBatch):
            batch = pa.Table.from_batches([batch])
        if self._plain is None:
            self._build(batch.schema)
        columns = []
        names = batch.schema.names
        n_invalid = 0
        for i, name in enumerate(names):
            col = batch.column(i)
            kernel = self._plain.get(name)
            if kernel is not None:
                new_col, bad = kernel.cast_array(col)
                n_invalid += bad
                columns.append(new_col)
                continue
            paths = self._nested.get(name)
            if paths is not None:
                col_c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                if pa.types.is_string(col_c.type) or pa.types.is_large_string(col_c.type):
                    rewriter = _JsonStringRewriter(paths, self.task.stop_on_invalid_record)
                else:
                    rewriter = _StructRewriter(paths)
                new_col, bad = rewriter.rewrite(col_c)
                n_invalid += bad
                columns.append(new_col)
                continue
            columns.append(col)  # zero-copy passthrough
        if n_invalid:
            self.invalid_total += n_invalid
            logger.warning("timestamp_format: %d invalid values set to NULL", n_invalid)
        return pa.table(dict(zip(names, columns)))


def apply_timestamp_format(ds, task: TaskConfig, **map_kwargs):
    """Convenience: attach the stage to a ray.data.Dataset (zero-copy)."""
    defaults = dict(batch_format="pyarrow", zero_copy_batch=True)
    defaults.update(map_kwargs)
    return ds.map_batches(TimestampFormatStage(task), **defaults)
