"""Timezone resolution for parse/format.

The reference resolves zone text via Joda ``DateTimeZone`` / Ruby's zonetab
(TimestampParser.java:73-78; config values like "Asia/Tokyo", "+09:00",
"UTC" — README.md:33-44).  We map:

* fixed offsets (``+09:00`` / ``+0900`` / ``+09`` / ``Z``) → ``datetime.timezone``
* IANA ids (``Asia/Tokyo``) → ``zoneinfo.ZoneInfo``
* common abbreviations (``UTC``, ``GMT``, ``JST``…) → fixed offsets per the
  Ruby zonetab subset below.
"""

from __future__ import annotations

import datetime as _dt
import functools
import re
from zoneinfo import ZoneInfo

# Subset of Ruby's Date::Format zonetab (offsets in seconds) that covers the
# reference examples and common logs. DST-named entries resolve to their fixed
# offsets exactly as the ruby table does.
ZONE_ABBREVIATIONS: dict[str, int] = {
    "ut": 0, "gmt": 0, "est": -5 * 3600, "edt": -4 * 3600,
    "cst": -6 * 3600, "cdt": -5 * 3600, "mst": -7 * 3600, "mdt": -6 * 3600,
    "pst": -8 * 3600, "pdt": -7 * 3600,
    "a": 1 * 3600, "b": 2 * 3600, "n": -1 * 3600, "z": 0,
    "utc": 0, "wet": 0, "bst": 1 * 3600, "cet": 1 * 3600, "cest": 2 * 3600,
    "eet": 2 * 3600, "eest": 3 * 3600, "msk": 3 * 3600, "ist": 5 * 3600 + 1800,
    "jst": 9 * 3600, "kst": 9 * 3600, "hst": -10 * 3600, "akst": -9 * 3600,
    "akdt": -8 * 3600, "aest": 10 * 3600, "aedt": 11 * 3600,
    "nzst": 12 * 3600, "nzdt": 13 * 3600,
}

_OFFSET_RE = re.compile(r"^([+-])(\d{2}):?(\d{2})?:?(\d{2})?$")


class ZoneResolveError(ValueError):
    pass


def offset_seconds_from_text(text: str) -> "int | None":
    """Parse an in-text zone token to a UTC offset in seconds, else None."""
    m = _OFFSET_RE.match(text)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        h = int(m.group(2))
        mi = int(m.group(3) or 0)
        s = int(m.group(4) or 0)
        return sign * (h * 3600 + mi * 60 + s)
    low = text.strip().lower()
    if low in ZONE_ABBREVIATIONS:
        return ZONE_ABBREVIATIONS[low]
    if low.startswith("gmt"):
        rest = text.strip()[3:]
        if rest:
            return offset_seconds_from_text(rest)
    return None


@functools.lru_cache(maxsize=256)
def resolve_zone(zone_id: str) -> _dt.tzinfo:
    """Resolve a config zone id (IANA name, offset, or abbreviation)."""
    off = offset_seconds_from_text(zone_id)
    if off is not None:
        if off == 0:
            return _dt.timezone.utc
        return _dt.timezone(_dt.timedelta(seconds=off))
    try:
        return ZoneInfo(zone_id)
    except Exception as exc:  # noqa: BLE001
        raise ZoneResolveError(f"unknown timezone: {zone_id!r}") from exc


def is_fixed_offset(tz: _dt.tzinfo) -> bool:
    return isinstance(tz, _dt.timezone)


def fixed_offset_seconds(tz: _dt.tzinfo) -> "int | None":
    """Offset in seconds if the zone is a fixed offset, else None."""
    if isinstance(tz, _dt.timezone):
        return int(tz.utcoffset(None).total_seconds())
    return None


@functools.lru_cache(maxsize=4096)
def zone_offset_at_wall(tz_key: str, naive_epoch_sec_bucket: int) -> int:
    """Offset (sec) of named zone for a *wall-clock* time bucket (1-day grain).

    Used by the vectorized path to resolve DST offsets per day instead of per
    row; exact per-row fallback handles rows near transitions.
    """
    tz = resolve_zone(tz_key)
    wall = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=naive_epoch_sec_bucket * 86400)
    off = wall.replace(tzinfo=tz).utcoffset()
    return int(off.total_seconds())
