"""Formatter goldens from the reference examples (example/*.txt) and the
family-dispatch / splice semantics of TimestampFormatter.java."""

from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.units import Ts


def test_ruby_default_format():
    # default_to_timestamp_format "%Y-%m-%d %H:%M:%S.%6N %z" (UTC)
    f = TimestampFormatter("%Y-%m-%d %H:%M:%S.%6N %z", "UTC")
    assert f.format(Ts(1463065359, 123456789)) == "2016-05-12 15:02:39.123456 +0000"


def test_ruby_nano_format_tokyo():
    # example/from_long.txt: ms 1436713200100 @ Asia/Tokyo
    f = TimestampFormatter("%Y-%m-%d %H:%M:%S.%N", "Asia/Tokyo")
    assert f.format(Ts(1436713200, 100000000)) == "2015-07-13 00:00:00.100000000"


def test_ruby_offset_rendering():
    # example/timezone.txt: "+0900" (no colon) for %z
    f = TimestampFormatter("%Y-%m-%d %H:%M:%S.%N %z", "Asia/Tokyo")
    assert f.format(Ts(1436713200, 0)) == "2015-07-13 00:00:00.000000000 +0900"
    assert f.format(Ts(1436713200, 100000000)) == "2015-07-13 00:00:00.100000000 +0900"


def test_ruby_colon_offsets():
    f1 = TimestampFormatter("%:z", "Asia/Tokyo")
    assert f1.format(Ts(0, 0)) == "+09:00"
    f2 = TimestampFormatter("%::z", "Asia/Tokyo")
    assert f2.format(Ts(0, 0)) == "+09:00:00"


def test_ruby_date_only_tokyo():
    f = TimestampFormatter("%Y-%m-%d", "Asia/Tokyo")
    assert f.format(Ts(1436713200, 0)) == "2015-07-13"


def test_java_micro_splice():
    # example/from_string_java.txt: "yyyy-MM-dd HH:mm:ss.nnnnnn Z" @ Asia/Taipei
    f = TimestampFormatter("yyyy-MM-dd HH:mm:ss.nnnnnn Z", "Asia/Taipei")
    assert f.format(Ts(1436716800, 123456789)) == "2015-07-13 00:00:00.123456 +0800"
    assert f.format(Ts(1436716800, 0)) == "2015-07-13 00:00:00.000000 +0800"


def test_java_nano_splice():
    f = TimestampFormatter("yyyy-MM-dd HH:mm:ss.nnnnnnnnn", "UTC")
    assert f.format(Ts(1436716800, 123456789)) == "2015-07-12 16:00:00.123456789"


def test_java_ms_path_truncates_nanos():
    # non-splice java path prints at ms resolution (TimestampFormatter.java:130-133)
    f = TimestampFormatter("yyyy-MM-dd HH:mm:ss.SSS", "UTC")
    assert f.format(Ts(1436716800, 123456789)) == "2015-07-12 16:00:00.123"


def test_java_zone_name():
    f = TimestampFormatter("yyyy-MM-dd HH:mm:ss z", "Asia/Tokyo")
    assert f.format(Ts(1436713200, 0)) == "2015-07-13 00:00:00 JST"
    f2 = TimestampFormatter("yyyy-MM-dd HH:mm:ss z", "UTC")
    assert f2.format(Ts(1436713200, 0)) == "2015-07-12 15:00:00 UTC"


def test_ruby_nano_width_variants():
    f3 = TimestampFormatter("%3N", "UTC")
    assert f3.format(Ts(0, 123456789)) == "123"
    f9 = TimestampFormatter("%9N", "UTC")
    assert f9.format(Ts(0, 123456789)) == "123456789"
    f12 = TimestampFormatter("%12N", "UTC")
    assert f12.format(Ts(0, 123456789)) == "123456789000"


def test_ruby_literal_passthrough():
    f = TimestampFormatter("%Y-%m-%dT%H:%M:%SZ", "UTC")
    assert f.format(Ts(1436716800, 0)) == "2015-07-12T16:00:00Z"


def test_unknown_directive_prints_literally():
    # ruby strftime leaves unrecognized %-sequences untouched
    f = TimestampFormatter("%Y %q %Y", "UTC")
    assert f.format(Ts(0, 0)) == "1970 %q 1970"


def test_ruby_misc_directives():
    ts = Ts(1463130159, 123456789)  # 2016-05-13 09:02:39 UTC (Friday)
    cases = {
        "%A": "Friday", "%a": "Fri", "%B": "May", "%b": "May", "%C": "20",
        "%D": "05/13/16", "%F": "2016-05-13", "%H": "09", "%I": "09",
        "%L": "123", "%M": "02", "%N": "123456789", "%P": "am", "%p": "AM",
        "%R": "09:02", "%r": "09:02:39 AM", "%S": "39", "%T": "09:02:39",
        "%Y": "2016", "%y": "16", "%Z": "UTC", "%z": "+0000",
        "%j": "134", "%e": "13", "%d": "13", "%m": "05", "%h": "May",
        "%u": "5", "%w": "5", "%X": "09:02:39", "%x": "05/13/16",
        "%s": "1463130159",
    }
    for fmt, expect in cases.items():
        assert TimestampFormatter(fmt, "UTC").format(ts) == expect, fmt
