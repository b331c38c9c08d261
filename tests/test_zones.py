"""Zone resolution edge coverage (functions/zones.py)."""

import datetime as dt

import pytest

from embulk_filter_timestamp_format_ray.functions.zones import (
    ZoneResolveError,
    fixed_offset_seconds,
    offset_seconds_from_text,
    resolve_zone,
)


def test_offset_text_variants():
    assert offset_seconds_from_text("+09:00") == 9 * 3600
    assert offset_seconds_from_text("+0900") == 9 * 3600
    assert offset_seconds_from_text("-05") == -5 * 3600
    assert offset_seconds_from_text("+05:30") == 5 * 3600 + 1800
    assert offset_seconds_from_text("+01:02:03") == 3723
    assert offset_seconds_from_text("Z") == 0
    assert offset_seconds_from_text("UTC") == 0
    assert offset_seconds_from_text("utc") == 0
    assert offset_seconds_from_text("JST") == 9 * 3600
    assert offset_seconds_from_text("PST") == -8 * 3600
    assert offset_seconds_from_text("GMT+09:00") == 9 * 3600
    assert offset_seconds_from_text("Asia/Tokyo") is None  # needs zoneinfo


def test_resolve_zone_kinds():
    utc = resolve_zone("UTC")
    assert fixed_offset_seconds(utc) == 0
    tokyo = resolve_zone("Asia/Tokyo")
    assert fixed_offset_seconds(tokyo) is None
    assert tokyo.utcoffset(dt.datetime(2020, 1, 1)) == dt.timedelta(hours=9)
    off = resolve_zone("+05:30")
    assert fixed_offset_seconds(off) == 5 * 3600 + 1800
    with pytest.raises(ZoneResolveError):
        resolve_zone("Not/AZone")


def test_dst_zone_offsets_differ_by_season():
    ny = resolve_zone("America/New_York")
    winter = dt.datetime(2020, 1, 15, 12, tzinfo=ny).utcoffset()
    summer = dt.datetime(2020, 7, 15, 12, tzinfo=ny).utcoffset()
    assert winter == dt.timedelta(hours=-5)
    assert summer == dt.timedelta(hours=-4)
