"""Port of TestTimestampFormatConverter.java:33-109: table conversions,
flag-prefix stripping, literal quoting, and the ruby-format → java-parse
round trip over every table entry."""

import pytest

from embulk_filter_timestamp_format_ray.functions.format_convert import (
    RUBY_TO_JAVA_FORMAT_TABLE,
    to_java_format,
)
from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.parser import TimestampParser
from embulk_filter_timestamp_format_ray.functions.units import Ts

TS = Ts(1463130159, 123456789)  # 2016-05-13 09:02:39.123456789 UTC


def test_table_with_flag_prefix():
    # TestTimestampFormatConverter.java:57-65 — "%-2X" strips to table value
    for key, java in RUBY_TO_JAVA_FORMAT_TABLE.items():
        assert to_java_format(f"%-2{key}") == java


def test_literal_quoting():
    # TestTimestampFormatConverter.java:67-109
    assert to_java_format("%Y-%m-%d %H:%M:%S.%6N %:z") == "yyyy-MM-dd HH:mm:ss.nnnnnnnnn Z"
    assert to_java_format("%Y-%m-%d %H:%M:%S.%6N UTC") == "yyyy-MM-dd HH:mm:ss.nnnnnnnnn 'UTC'"
    assert to_java_format("%Y-%m-%d %H:%M:%S.%6N +00:00") == "yyyy-MM-dd HH:mm:ss.nnnnnnnnn '+00:00'"


def test_unconvertible_returns_none():
    assert to_java_format("%Y %Q") is None  # %Q not in the table


@pytest.mark.parametrize("key,java", sorted(RUBY_TO_JAVA_FORMAT_TABLE.items()))
def test_round_trip_parse(key, java):
    # TestTimestampFormatConverter.java:33-55: format with ruby, parse the
    # ruby-formatted text with the java pattern — must not throw
    ruby_fmt = f"%{key}"
    ruby_formatted = TimestampFormatter("." + ruby_fmt, "UTC").format(TS)
    ruby_parser = TimestampParser(["." + ruby_fmt], "UTC")
    ruby_parser.parse(ruby_formatted)  # must not throw
    java_parser = TimestampParser(["." + java], "UTC")
    java_parser.parse(ruby_formatted)  # must not throw


def test_converted_formats_parse_golden_values():
    java = to_java_format("%Y-%m-%d %H:%M:%S.%6N %:z")
    p = TimestampParser([java], "UTC")
    assert p.parse("2016-05-12 20:14:13.123456789 +09:00") == Ts(1463051653, 123456789)
    java_utc = to_java_format("%Y-%m-%d %H:%M:%S.%6N UTC")
    p2 = TimestampParser([java_utc], "UTC")
    ts = p2.parse("2016-05-12 20:14:13.123456789 UTC")
    assert ts.nano == 123456789
