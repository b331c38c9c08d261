"""Commit-time data-quality constraints (Delta-Lake-style CHECK
expectations) for the CDC lake.

A :class:`Constraint` is a small declarative check over the NORMALIZED
change event (so role renames and ts parsing have already happened when it
runs — a ``ts between`` constraint sees the parsed timestamp, a ``role
in_set`` constraint sees the unified enum).  Enforcement lives in
``NormalizeStage`` and follows the same three error tiers as the
reference's C10 surface (``stop_on_invalid_record``,
/root/reference/src/main/java/org/embulk/filter/timestamp_format/
TimestampFormatFilterPlugin.java:64, extended one tier like the DLQ):

* ``stop_on_invalid=True``  → the batch aborts on the first violation;
* default                   → violating events are DROPPED with a warning;
* ``dlq=True``              → violating events are QUARANTINED with reason
  ``constraint:<name>`` — healable by relaxing the constraint on the
  pipeline handle and running ``reprocess_dlq()``.

Semantics (SQL CHECK + CDC op scoping):

* a NULL value PASSES every value constraint (``in_set`` / ``between`` /
  ``matches``) — standard SQL CHECK semantics, which also makes patch
  events ("NULL = unchanged") and pre-evolution padding behave correctly
  for free;
* ``not_null`` is checked only on full-payload upserts: a patch that
  leaves the column unchanged asserts nothing about it;
* payload-free ops (``delete`` / ``delete_conv``) are exempt from every
  check — the merge ignores their value columns anyway.

Constraints are DURABLE lake properties, not job flags: the first
constrained apply records them in the manifest, and any later writer
constructed without an explicit ``constraints=`` argument adopts the
committed list (pass an explicit empty tuple to drop them).  ``fsck``
re-checks the value-kind constraints against every partition's FOLDED
live state (``not_null`` is ingest-scoped: evolution padding legitimately
reads NULL), catching violations smuggled in by ``transform_lake`` — whose
contract guards keys and lsns, not values.
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: ops that carry a full value payload — ``not_null`` applies only here
UPSERT_OPS = ("upsert",)
#: ops that carry no value payload at all — exempt from every check
PAYLOAD_FREE_OPS = ("delete", "delete_conv")

KINDS = ("not_null", "in_set", "between", "matches", "has_token")


def _bound_scalar(v: str, typ: pa.DataType) -> pa.Scalar:
    """Cast a between-bound string to the column's type lazily.  A bare
    zone-less timestamp bound against a tz-aware column reads as UTC (the
    lake's canonical zone, functions/zones.py precedence)."""
    if pa.types.is_timestamp(typ) and typ.tz is not None:
        try:
            return pa.scalar(v).cast(typ)
        except pa.lib.ArrowInvalid:
            naive = pa.scalar(v).cast(pa.timestamp(typ.unit))
            return pc.assume_timezone(naive, typ.tz)
    return pa.scalar(v).cast(typ)


def _coerce_like(v: str, sample):
    """Coerce a constraint bound/member string to the python type of a
    parquet-footer statistic value so the two compare (range pruning).
    Raises TypeError/ValueError when no sound coercion exists — the caller
    treats that as un-prunable."""
    import datetime as _dt

    if isinstance(sample, bool):  # before int: bool is an int subclass
        raise TypeError("no range pruning over booleans")
    if isinstance(sample, int):
        return int(v)
    if isinstance(sample, float):
        return float(v)
    if isinstance(sample, _dt.datetime):
        out = _dt.datetime.fromisoformat(str(v))
        if sample.tzinfo is not None and out.tzinfo is None:
            # zone-less bound against a tz-aware stat reads as UTC — the
            # same precedence rule as _bound_scalar
            out = out.replace(tzinfo=_dt.timezone.utc)
        elif sample.tzinfo is None and out.tzinfo is not None:
            out = out.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return out
    if isinstance(sample, str):
        return str(v)
    if isinstance(sample, bytes):
        return str(v).encode()
    raise TypeError(f"cannot coerce bound {v!r} to {type(sample)}")


@dataclasses.dataclass(frozen=True)
class Constraint:
    """One declarative check on one column of the normalized event."""

    column: str
    kind: str
    values: "tuple[str, ...]" = ()      # in_set membership
    lo: "str | None" = None             # between bounds (inclusive), cast
    hi: "str | None" = None             # to the column's Arrow type lazily
    name: str = ""

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"unknown constraint kind {self.kind!r}; "
                             f"one of {KINDS}")
        if self.kind == "in_set" and not self.values:
            raise ValueError(f"in_set constraint on {self.column!r} needs "
                             "at least one value")
        if self.kind == "between" and self.lo is None and self.hi is None:
            raise ValueError(f"between constraint on {self.column!r} needs "
                             "a lo and/or hi bound")
        if self.kind == "matches":
            if not self.values or len(self.values) != 1:
                raise ValueError(f"matches constraint on {self.column!r} "
                                 "needs exactly one regex")
            try:
                re.compile(self.values[0])  # fail fast on a bad pattern
            except re.error as e:
                raise ValueError(f"matches constraint on {self.column!r}: "
                                 f"bad regex {self.values[0]!r}: {e}") from e
        if self.kind == "has_token":
            if not self.values or len(self.values) != 1 or not self.values[0]:
                raise ValueError(f"has_token constraint on {self.column!r} "
                                 "needs exactly one non-empty token")
            if " " in self.values[0]:
                raise ValueError(f"has_token token {self.values[0]!r} "
                                 "contains a space — it could never be a "
                                 "single split-on-space token")
        if not self.name:
            object.__setattr__(self, "name", f"{self.column}_{self.kind}")

    # ------------------------------------------------------------- evaluate
    def _value_violations(self, col) -> "pa.BooleanArray":
        """Per-row violation of the VALUE rule alone (no op scoping).
        NULL passes everything except not_null (SQL CHECK semantics)."""
        if self.kind == "not_null":
            return pc.is_null(col)
        valid = pc.is_valid(col)
        if self.kind == "in_set":
            ok = pc.is_in(col, value_set=pa.array(list(self.values),
                                                  type=col.type))
        elif self.kind == "between":
            ok = pa.array(np.ones(len(col), dtype=bool))
            if self.lo is not None:
                ok = pc.and_(ok, pc.greater_equal(
                    col, _bound_scalar(self.lo, col.type)))
            if self.hi is not None:
                ok = pc.and_(ok, pc.less_equal(
                    col, _bound_scalar(self.hi, col.type)))
        elif self.kind == "has_token":
            # token membership under split-on-single-space semantics,
            # exactly SQL's list_contains(string_split(col, ' '), tok):
            # tok ∈ split(s, ' ')  ⇔  ' '+s+' ' contains ' '+tok+' '
            # (tok is guaranteed non-empty and space-free)
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            padded = pc.binary_join_element_wise(" ", col, " ", "")
            ok = pc.match_substring(padded, f" {self.values[0]} ")
        else:  # matches
            ok = pc.match_substring_regex(col, self.values[0])
        return pc.and_(valid, pc.invert(pc.fill_null(ok, True)))

    def violations(self, table: pa.Table) -> np.ndarray:
        """Boolean violation mask over ``table`` (True = row violates).

        ``table`` is a normalized-event table when it has an ``op`` column
        (op scoping applies); a folded lake-state table otherwise (every
        row is live data — fsck's view, where ``not_null`` is skipped
        because pre-evolution padding legitimately reads NULL)."""
        n = table.num_rows
        if self.column not in table.schema.names:
            col = pa.nulls(n, pa.string())
        else:
            col = table.column(self.column)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_null(col.type):
                col = col.cast(pa.string())
        if "op" not in table.schema.names:
            if self.kind == "not_null":
                return np.zeros(n, dtype=bool)
            return np.asarray(self._value_violations(col))
        op = table.column("op")
        if self.kind == "not_null":
            scope = pc.is_in(op, value_set=pa.array(list(UPSERT_OPS)))
        else:
            scope = pc.invert(pc.is_in(
                op, value_set=pa.array(list(PAYLOAD_FREE_OPS))))
        scope = pc.fill_null(scope, False)
        return np.asarray(pc.and_(scope, self._value_violations(col)))

    def matches(self, table: pa.Table) -> np.ndarray:
        """Boolean mask of rows whose column value SATISFIES the value
        rule (no op scoping; NULL never matches; ``not_null`` matches
        non-null rows).  This is the row-selection surface — e.g.
        ``delete_where``'s CLI spec: ``role:in:tool`` selects tool rows,
        ``ts:between:,2024-01-01`` selects rows at or before a retention
        cutoff."""
        n = table.num_rows
        if self.column not in table.schema.names:
            return np.zeros(n, dtype=bool)
        col = table.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        valid = pc.is_valid(col)
        if self.kind == "not_null":
            return np.asarray(valid)
        return np.asarray(pc.and_(valid,
                                  pc.invert(self._value_violations(col))))

    def range_possible(self, rng) -> bool:
        """Can ANY value in the footer-stats range ``rng`` satisfy this
        constraint's value rule?  The partition-pruning surface for
        ``delete_where``: ``rng`` is ``None`` when stats are unavailable
        (must stay conservative → True), ``()`` when the column holds no
        non-null value in any file (NULL never matches → False), else an
        inclusive ``(min, max)`` pair of python values from the parquet
        footers.  Coercion failures and un-prunable kinds (``matches``)
        return True — a false "possible" only costs the fold the stats
        would have skipped, a false "impossible" would lose deletes."""
        if rng is None:
            return True
        if rng == ():
            return False
        lo, hi = rng
        if self.kind in ("not_null", "matches", "has_token"):
            # min/max string stats can't prove token absence — has_token
            # pruning happens at the token-bloom sidecar tier instead
            return True
        try:
            if self.kind == "between":
                if self.lo is not None and hi < _coerce_like(self.lo, lo):
                    return False
                if self.hi is not None and lo > _coerce_like(self.hi, lo):
                    return False
                return True
            # in_set: possible iff any member falls inside [lo, hi]
            return any(lo <= _coerce_like(v, lo) <= hi
                       for v in self.values)
        except (TypeError, ValueError):
            return True

    # ----------------------------------------------------------- round-trip
    def to_json(self) -> dict:
        out = {"column": self.column, "kind": self.kind, "name": self.name}
        if self.values:
            out["values"] = list(self.values)
        if self.lo is not None:
            out["lo"] = self.lo
        if self.hi is not None:
            out["hi"] = self.hi
        return out

    @classmethod
    def from_json(cls, j: dict) -> "Constraint":
        return cls(column=j["column"], kind=j["kind"],
                   values=tuple(j.get("values", ())),
                   lo=j.get("lo"), hi=j.get("hi"), name=j.get("name", ""))


def parse_constraint(spec: str) -> Constraint:
    """CLI surface: ``col:not_null`` | ``col:in:a,b,c`` |
    ``col:between:lo,hi`` (empty side = unbounded) | ``col:matches:regex``
    (the regex may itself contain colons/commas)."""
    parts = spec.split(":", 2)
    if len(parts) < 2:
        raise ValueError(f"constraint spec {spec!r}: want col:kind[:args]")
    column, kind = parts[0].strip(), parts[1].strip()
    arg = parts[2] if len(parts) == 3 else ""
    if kind == "not_null":
        if arg:
            raise ValueError(f"not_null takes no argument: {spec!r}")
        return Constraint(column, "not_null")
    if kind in ("in", "in_set"):
        vals = tuple(v.strip() for v in arg.split(",") if v.strip())
        return Constraint(column, "in_set", values=vals)
    if kind == "between":
        bounds = arg.split(",")
        if len(bounds) != 2:
            raise ValueError(f"between wants lo,hi (either may be empty): "
                             f"{spec!r}")
        lo = bounds[0].strip() or None
        hi = bounds[1].strip() or None
        return Constraint(column, "between", lo=lo, hi=hi)
    if kind == "matches":
        return Constraint(column, "matches", values=(arg,))
    if kind == "has_token":
        return Constraint(column, "has_token", values=(arg,))
    raise ValueError(f"unknown constraint kind {kind!r} in {spec!r}")


def constraints_from_manifest(manifest: dict) -> "tuple[Constraint, ...]":
    return tuple(Constraint.from_json(j)
                 for j in manifest.get("constraints", []))


def carry_constraints(manifest: dict, new_manifest: dict) -> None:
    """Maintenance commits (compaction / repartition / transform / fan-out)
    carry the committed constraint list forward untouched; applies record
    the pipeline's effective list themselves."""
    if manifest.get("constraints") and "constraints" not in new_manifest:
        new_manifest["constraints"] = manifest["constraints"]


def validate_table(ds, constraints) -> pa.Table:
    """Offline data-quality REPORT over any Dataset — the dbt-tests /
    expectations-suite role — evaluated with the SAME value kernels the
    commit gate enforces (``Constraint._value_violations``), so a rule
    that passes here passes at ingest and vice versa.

    Pure VALUE semantics (no CDC op scoping): NULL passes every value
    rule, ``not_null`` counts nulls, a missing column counts every row as
    a ``not_null`` violation and passes value rules (all-NULL column).

    Scale shape: one ``map_batches`` partial (one #constraints-wide row
    per block) folded on the driver — #blocks × #constraints scalars,
    aggregate-sized by construction; the data never leaves the workers.
    Returns one row per constraint: (constraint_name, column_name, kind,
    n_rows, n_violations, passed)."""
    cons = tuple(constraints)

    def col_of(b: pa.Table, c: Constraint):
        if c.column not in b.schema.names:
            return pa.nulls(b.num_rows, pa.string())
        col = b.column(c.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        return col

    def partial(b: pa.Table) -> pa.Table:
        cols = {"n": pa.array([b.num_rows], pa.int64())}
        for i, c in enumerate(cons):
            col = col_of(b, c)
            bad = pc.is_null(col) if c.kind == "not_null" \
                else c._value_violations(col)
            n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            cols[f"v{i}"] = pa.array([int(n_bad)], pa.int64())
        return pa.table(cols)

    parts = list(ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    n_rows = sum(int(pc.sum(t.column("n")).as_py() or 0) for t in parts)
    viol = [sum(int(pc.sum(t.column(f"v{i}")).as_py() or 0) for t in parts)
            for i in range(len(cons))]
    return pa.table({
        "constraint_name": pa.array([c.name for c in cons], pa.string()),
        "column_name": pa.array([c.column for c in cons], pa.string()),
        "kind": pa.array([c.kind for c in cons], pa.string()),
        "n_rows": pa.array([n_rows] * len(cons), pa.int64()),
        "n_violations": pa.array(viol, pa.int64()),
        "passed": pa.array([v == 0 for v in viol], pa.bool_()),
    })
