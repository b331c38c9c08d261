"""The 4x4 scalar cast matrix (from {long,double,string,timestamp} to
{string,timestamp,long,double}).

Reference: /root/reference/src/main/java/org/embulk/filter/timestamp_format/
cast/LongCast.java:12-31, DoubleCast.java:12-31, StringCast.java:19-72,
TimestampCast.java:12-30.  String-parse failures raise ``CastError`` so the
error policy (stop_on_invalid_record, ColumnVisitorImpl.java:79-99) can catch
them uniformly.

These scalars are the executable spec; the hot path uses the vectorized
kernels in stages/timestamp_format.py.
"""

from __future__ import annotations

from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.parser import ParseError, TimestampParser
from embulk_filter_timestamp_format_ray.functions.units import (
    TimestampUnit,
    Ts,
    change_unit_double,
    change_unit_long,
    double_to_timestamp,
    long_to_timestamp,
    timestamp_to_double,
    timestamp_to_long,
)


class CastError(ValueError):
    """Equivalent of Embulk's DataException for invalid records."""


# -- from long (epoch value in from_unit) -----------------------------------

def long_as_string(value: int, from_unit: TimestampUnit, formatter: TimestampFormatter) -> str:
    return formatter.format(long_to_timestamp(value, from_unit))


def long_as_timestamp(value: int, from_unit: TimestampUnit) -> Ts:
    return long_to_timestamp(value, from_unit)


def long_as_long(value: int, from_unit: TimestampUnit, to_unit: TimestampUnit) -> int:
    return change_unit_long(value, from_unit, to_unit)


def long_as_double(value: int, from_unit: TimestampUnit, to_unit: TimestampUnit) -> float:
    return float(change_unit_long(value, from_unit, to_unit))


# -- from double ------------------------------------------------------------

def double_as_string(value: float, from_unit: TimestampUnit, formatter: TimestampFormatter) -> str:
    return formatter.format(double_to_timestamp(value, from_unit))


def double_as_timestamp(value: float, from_unit: TimestampUnit) -> Ts:
    return double_to_timestamp(value, from_unit)


def double_as_long(value: float, from_unit: TimestampUnit, to_unit: TimestampUnit) -> int:
    return int(change_unit_double(value, from_unit, to_unit))


def double_as_double(value: float, from_unit: TimestampUnit, to_unit: TimestampUnit) -> float:
    return change_unit_double(value, from_unit, to_unit)


# -- from string ------------------------------------------------------------

def _parse(value: str, parser: TimestampParser) -> Ts:
    try:
        return parser.parse(value)
    except (ParseError, ValueError) as exc:
        raise CastError(f'failed to parse string: "{value}"') from exc


def string_as_string(value: str, parser: TimestampParser, formatter: TimestampFormatter) -> str:
    return formatter.format(_parse(value, parser))


def string_as_timestamp(value: str, parser: TimestampParser) -> Ts:
    return _parse(value, parser)


def string_as_long(value: str, parser: TimestampParser, to_unit: TimestampUnit) -> int:
    return timestamp_to_long(_parse(value, parser), to_unit)


def string_as_double(value: str, parser: TimestampParser, to_unit: TimestampUnit) -> float:
    return timestamp_to_double(_parse(value, parser), to_unit)


# -- from timestamp ---------------------------------------------------------

def timestamp_as_string(value: Ts, formatter: TimestampFormatter) -> str:
    return formatter.format(value)


def timestamp_as_timestamp(value: Ts) -> Ts:
    return value


def timestamp_as_long(value: Ts, to_unit: TimestampUnit) -> int:
    return timestamp_to_long(value, to_unit)


def timestamp_as_double(value: Ts, to_unit: TimestampUnit) -> float:
    return timestamp_to_double(value, to_unit)
