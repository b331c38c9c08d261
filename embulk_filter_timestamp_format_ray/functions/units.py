"""Timestamp unit conversions, semantics-exact to the reference.

Reference: /root/reference/src/main/java/org/embulk/filter/timestamp_format/
TimestampUnit.java:7-111 (scale tables, truncation-not-rounding semantics) and
TimestampUnitDeserializer.java:16-40 (the 21 alias spellings).

A timestamp value is ``Ts(sec, nano)`` with ``0 <= nano < 1e9`` (the Embulk
``Timestamp.ofEpochSecond(sec, nanoAdjustment)`` floor normalization).  The
vectorized variants operate on int64 numpy arrays and replicate Java's
truncate-toward-zero ``/`` on longs (numpy ``//`` floors, so negatives need the
sign trick).
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import numpy as np

NANOS_PER_SEC = 1_000_000_000


class Ts(NamedTuple):
    """(epoch seconds, nanos-of-second) — nano always in [0, 1e9)."""

    sec: int
    nano: int

    @staticmethod
    def of(sec: int, nano_adjustment: int = 0) -> "Ts":
        # Java Timestamp.ofEpochSecond uses floorDiv/floorMod
        total = sec * NANOS_PER_SEC + nano_adjustment
        return Ts(total // NANOS_PER_SEC, total % NANOS_PER_SEC)

    @property
    def ns(self) -> int:
        return self.sec * NANOS_PER_SEC + self.nano


class TimestampUnit(enum.Enum):
    Second = (1, 1_000_000_000)
    MilliSecond = (1_000, 1_000_000)
    MicroSecond = (1_000_000, 1_000)
    NanoSecond = (1_000_000_000, 1)

    @property
    def scale(self) -> int:
        return self.value[0]

    @property
    def scale_to_nano(self) -> int:
        return self.value[1]


# TimestampUnitDeserializer.java:16-40
UNIT_ALIASES: dict[str, TimestampUnit] = {
    "Second": TimestampUnit.Second,
    "second": TimestampUnit.Second,
    "sec": TimestampUnit.Second,
    "MilliSecond": TimestampUnit.MilliSecond,
    "millisecond": TimestampUnit.MilliSecond,
    "milli_second": TimestampUnit.MilliSecond,
    "milli": TimestampUnit.MilliSecond,
    "msec": TimestampUnit.MilliSecond,
    "ms": TimestampUnit.MilliSecond,
    "MicroSecond": TimestampUnit.MicroSecond,
    "microsecond": TimestampUnit.MicroSecond,
    "micro_second": TimestampUnit.MicroSecond,
    "micro": TimestampUnit.MicroSecond,
    "usec": TimestampUnit.MicroSecond,
    "us": TimestampUnit.MicroSecond,
    "NanoSecond": TimestampUnit.NanoSecond,
    "nanosecond": TimestampUnit.NanoSecond,
    "nano_second": TimestampUnit.NanoSecond,
    "nano": TimestampUnit.NanoSecond,
    "nsec": TimestampUnit.NanoSecond,
    "ns": TimestampUnit.NanoSecond,
}


def parse_unit(value: "str | TimestampUnit") -> TimestampUnit:
    if isinstance(value, TimestampUnit):
        return value
    try:
        return UNIT_ALIASES[value]
    except KeyError:
        raise ValueError(
            f"Unknown type name '{value}'. Supported types are: "
            + ", ".join(UNIT_ALIASES)
        ) from None


# ---------------------------------------------------------------- scalar ops

def long_to_timestamp(value: int, from_unit: TimestampUnit) -> Ts:
    return Ts.of(0, value * from_unit.scale_to_nano)


def double_to_timestamp(value: float, from_unit: TimestampUnit) -> Ts:
    # Java: (long)(value * scaleToNano) — truncation toward zero
    return Ts.of(0, int(value * from_unit.scale_to_nano))


def timestamp_to_long(ts: Ts, to_unit: TimestampUnit) -> int:
    return ts.sec * to_unit.scale + ts.nano // to_unit.scale_to_nano


def timestamp_to_double(ts: Ts, to_unit: TimestampUnit) -> float:
    nano_int = ts.nano // to_unit.scale_to_nano
    nano_dec = ts.nano - nano_int * to_unit.scale_to_nano
    return ts.sec * to_unit.scale + nano_int + nano_dec / to_unit.scale_to_nano


def _java_div(value: int, divisor: int) -> int:
    # Java long division truncates toward zero
    q = abs(value) // divisor
    return q if value >= 0 else -q


def change_unit_long(value: int, from_unit: TimestampUnit, to_unit: TimestampUnit) -> int:
    if from_unit.scale == to_unit.scale:
        return value
    if from_unit.scale < to_unit.scale:
        return value * (to_unit.scale // from_unit.scale)
    return _java_div(value, from_unit.scale // to_unit.scale)


def change_unit_double(value: float, from_unit: TimestampUnit, to_unit: TimestampUnit) -> float:
    if from_unit.scale == to_unit.scale:
        return value
    if from_unit.scale < to_unit.scale:
        return value * (to_unit.scale // from_unit.scale)
    return value / float(from_unit.scale // to_unit.scale)


# ------------------------------------------------------------ vectorized ops
# All operate on numpy arrays; ns-since-epoch is int64.

def v_long_to_ns(values: np.ndarray, from_unit: TimestampUnit) -> np.ndarray:
    return values.astype(np.int64) * from_unit.scale_to_nano


def v_double_to_ns(values: np.ndarray, from_unit: TimestampUnit) -> np.ndarray:
    # trunc toward zero like Java's (long) cast
    return np.trunc(values * from_unit.scale_to_nano).astype(np.int64)


def v_ns_to_long(ns: np.ndarray, to_unit: TimestampUnit) -> np.ndarray:
    # sec = floor(ns/1e9); nano = ns mod 1e9 (always >= 0)
    sec = np.floor_divide(ns, NANOS_PER_SEC)
    nano = ns - sec * NANOS_PER_SEC
    return sec * to_unit.scale + nano // to_unit.scale_to_nano


def v_ns_to_double(ns: np.ndarray, to_unit: TimestampUnit) -> np.ndarray:
    sec = np.floor_divide(ns, NANOS_PER_SEC)
    nano = ns - sec * NANOS_PER_SEC
    nano_int = nano // to_unit.scale_to_nano
    nano_dec = nano - nano_int * to_unit.scale_to_nano
    return (sec * to_unit.scale + nano_int).astype(np.float64) + nano_dec / float(
        to_unit.scale_to_nano
    )


def v_change_unit_long(
    values: np.ndarray, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> np.ndarray:
    values = values.astype(np.int64)
    if from_unit.scale == to_unit.scale:
        return values
    if from_unit.scale < to_unit.scale:
        return values * (to_unit.scale // from_unit.scale)
    div = from_unit.scale // to_unit.scale
    q = np.abs(values) // div
    return np.where(values >= 0, q, -q)


def v_change_unit_double(
    values: np.ndarray, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> np.ndarray:
    if from_unit.scale == to_unit.scale:
        return values
    if from_unit.scale < to_unit.scale:
        return values * (to_unit.scale // from_unit.scale)
    return values / float(from_unit.scale // to_unit.scale)
