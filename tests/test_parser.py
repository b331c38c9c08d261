"""Port of TestTimestampParser.java golden cases + example/from_string
fallback/zone semantics (example/from_string.yml + from_string.txt)."""

import pytest

from embulk_filter_timestamp_format_ray.functions.parser import (
    ParseError,
    TimestampParser,
    parse_nano_regex,
)
from embulk_filter_timestamp_format_ray.functions.units import Ts


def test_ruby_parse_golden():
    # TestTimestampParser.java:29-44
    p = TimestampParser(["%Y-%m-%d %H:%M:%S.%N %:z"], "UTC")
    assert p.parse("2016-05-13 00:02:39.123456789 +09:00") == Ts(1463065359, 123456789)


def test_java_parse_golden():
    # TestTimestampParser.java:47-59
    p = TimestampParser(["yyyy-MM-dd HH:mm:ss.nnnnnnnnn Z"], "UTC")
    assert p.parse("2016-05-13 00:02:39.123456789 +09:00") == Ts(1463065359, 123456789)


FROM_STRING_FORMATS = [
    "%Y-%m-%d %H:%M:%S.%N %z",
    "%Y-%m-%d %H:%M:%S %z",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %z",
    "%Y-%m-%d",
]


@pytest.fixture(scope="module")
def taipei_parser():
    return TimestampParser(FROM_STRING_FORMATS, "Asia/Taipei")


def test_multi_format_fallback_and_zone_default(taipei_parser):
    # example/from_string.txt rows 1-4: default zone Asia/Taipei (+08:00)
    assert taipei_parser.parse("2015-07-13") == Ts(1436716800, 0)
    # explicit zone in text overrides the default (P5)
    assert taipei_parser.parse("2015-07-13 UTC") == Ts(1436745600, 0)
    assert taipei_parser.parse("2015-07-13 00:00:00") == Ts(1436716800, 0)
    assert taipei_parser.parse("2015-07-12 16:00:00 UTC") == Ts(1436716800, 0)


@pytest.mark.parametrize(
    "frac,nano",
    [("1", 100000000), ("12", 120000000), ("123", 123000000),
     ("1234", 123400000), ("12345", 123450000), ("123456", 123456000),
     ("1234567", 123456700), ("12345678", 123456780), ("123456789", 123456789)],
)
def test_fraction_digits(taipei_parser, frac, nano):
    assert taipei_parser.parse(f"2015-07-12 16:00:00.{frac} UTC") == Ts(1436716800, nano)


def test_all_formats_fail_raises_last(taipei_parser):
    with pytest.raises((ParseError, ValueError)):
        taipei_parser.parse("not a date")


def test_full_match_required(taipei_parser):
    # "%Y-%m-%d" must NOT match "2015-07-13 trailing"
    p = TimestampParser(["%Y-%m-%d"], "UTC")
    with pytest.raises((ParseError, ValueError)):
        p.parse("2015-07-13 garbage")


def test_java_format_list_from_example():
    # example/from_string_java.yml fallback list
    p = TimestampParser(
        ["yyyy-MM-dd", "yyyy-MM-dd z", "yyyy-MM-dd HH:mm:ss.nnnnnnnnn z",
         "yyyy-MM-dd HH:mm:ss z", "yyyy-MM-dd HH:mm:ss"],
        "Asia/Taipei",
    )
    assert p.parse("2015-07-13") == Ts(1436716800, 0)
    assert p.parse("2015-07-13 UTC") == Ts(1436745600, 0)
    assert p.parse("2015-07-12 16:00:00.1 UTC") == Ts(1436716800, 100000000)
    assert p.parse("2015-07-12 16:00:00.123456789 UTC") == Ts(1436716800, 123456789)


def test_mixed_family_list_ruby_shadows_java():
    # reference quirk: jruby list non-empty -> java formats unreachable
    p = TimestampParser(["%Y-%m-%d", "yyyy-MM-dd HH:mm:ss"], "UTC")
    assert p.parse("2015-07-13") == Ts(1436745600, 0)
    with pytest.raises((ParseError, ValueError)):
        p.parse("2015-07-13 00:00:00")  # java format is shadowed


def test_parse_nano_regex_quirks():
    # TimestampParser.java:157-167 incl. the (long) Math.pow truncation
    assert parse_nano_regex("12:00:00.123") == 123000000
    assert parse_nano_regex("12:00:00.123456789") == 123456789
    assert parse_nano_regex("12:00:00.1234567891") == 0  # 10 digits -> pow -> 0
    assert parse_nano_regex("12:00:00") == -1


def test_java_no_fraction_text_gives_negative_nano_normalization():
    # javaParse with handleNanoResolution and no '.' in text: nsec=-1 and
    # Timestamp.ofEpochSecond floor-normalizes (reference behavior)
    p = TimestampParser(["yyyy-MM-dd HH:mm:ss.nnnnnnnnn z", "yyyy-MM-dd HH:mm:ss z"], "UTC")
    # first format requires the '.', so the second matches cleanly
    assert p.parse("2015-07-12 16:00:00 UTC") == Ts(1436716800, 0)


def test_compact_formats_fixed_width():
    # ruby/joda rule: adjacent numeric directives parse at fixed width
    assert TimestampParser(["%Y%m%d"], "UTC").parse("20150713") == Ts(1436745600, 0)
    assert TimestampParser(["yyyyMMdd"], "UTC").parse("20150713") == Ts(1436745600, 0)
    assert TimestampParser(["%Y%m%d%H%M%S"], "UTC").parse("20150713010203").sec \
        == 1436745600 + 3723
    # separated fields still accept short digits
    assert TimestampParser(["%Y-%m-%d"], "UTC").parse("2015-7-3").sec \
        == TimestampParser(["%Y-%m-%d"], "UTC").parse("2015-07-03").sec


def test_reference_bench_config_formats():
    # bench/config_java.yml: SSSSSSSSS is a plain Joda fraction (ms
    # resolution, first-3-digit truncation) — NOT the nano-regex path
    p = TimestampParser(["yyyy-MM-dd HH:mm:ss.SSSSSSSSS"], "UTC")
    got = p.parse("2015-07-12 01:02:03.123456789")
    assert got.nano == 123000000
    # bench/config_nano.yml: nnnnnnnnn IS the nano path
    pn = TimestampParser(["yyyy-MM-dd HH:mm:ss.nnnnnnnnn"], "UTC")
    assert pn.parse("2015-07-12 01:02:03.123456789").nano == 123456789


def test_epoch_directives():
    p = TimestampParser(["%s"], "UTC")
    assert p.parse("1436716800") == Ts(1436716800, 0)
    pq = TimestampParser(["%Q"], "UTC")
    assert pq.parse("1436716800123") == Ts(1436716800, 123000000)


def test_named_zone_in_text():
    p = TimestampParser(["%Y-%m-%d %H:%M:%S %z"], "UTC")
    assert p.parse("2015-07-13 00:00:00 JST") == Ts(1436713200, 0)
    assert p.parse("2015-07-13 00:00:00 Asia/Tokyo") == Ts(1436713200, 0)


def test_offset_variants():
    p = TimestampParser(["%Y-%m-%d %H:%M:%S %z"], "UTC")
    base = p.parse("2015-07-13 00:00:00 +00:00").sec
    assert p.parse("2015-07-13 09:00:00 +09:00").sec == base
    assert p.parse("2015-07-13 09:00:00 +0900").sec == base
    assert p.parse("2015-07-12 15:00:00 -09:00").sec == base
