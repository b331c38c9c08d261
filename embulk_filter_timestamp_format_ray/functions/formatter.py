"""Scalar timestamp formatting: ruby strftime and Joda-style families.

Reference: /root/reference/src/main/java/org/embulk/filter/timestamp_format/
TimestampFormatter.java:62-134.

* family dispatch: ``%`` in format → ruby strftime (full directive set incl.
  ``%N``/``%6N``/``%:z``), else Joda pattern (TimestampFormatter.java:66-85)
* java nano/micro splice: ``nnnnnnnnn`` → printf ``%09d`` of nano,
  ``nnnnnn`` → ``%06d`` of nano/1000 (TimestampFormatter.java:71-80,120-129);
  the non-splice java path prints at ms resolution from
  ``sec*1000 + nano/1e6`` (TimestampFormatter.java:130-133)
* the ruby path formats the sec part in ``to_timezone`` and takes fraction
  digits from nano independently (TimestampFormatter.java:112-118), i.e.
  ``%S`` never rounds up from nanos.
"""

from __future__ import annotations

import datetime as _dt
import re

from embulk_filter_timestamp_format_ray.functions.parser import _lex_java, days_from_civil
from embulk_filter_timestamp_format_ray.functions.units import Ts
from embulk_filter_timestamp_format_ray.functions.zones import resolve_zone

_MONTH_ABBREV = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_FULL = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]
_DAY_ABBREV = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_DAY_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]

_RUBY_FMT_RE = re.compile(r"%([-_^#0]?)(\d*)(:{0,3})([A-Za-z%])")


class _Wall:
    """Broken-down wall-clock components of an instant in a zone."""

    __slots__ = ("year", "month", "day", "hour", "minute", "sec", "nano",
                 "wday", "yday", "off_sec", "zone_abbrev")

    def __init__(self, ts: Ts, tz: _dt.tzinfo):
        local_sec_dt = _dt.datetime.fromtimestamp(ts.sec, tz)
        self.year = local_sec_dt.year
        self.month = local_sec_dt.month
        self.day = local_sec_dt.day
        self.hour = local_sec_dt.hour
        self.minute = local_sec_dt.minute
        self.sec = local_sec_dt.second
        self.nano = ts.nano
        self.wday = local_sec_dt.weekday()  # 0=Mon
        self.yday = local_sec_dt.timetuple().tm_yday
        self.off_sec = int(local_sec_dt.utcoffset().total_seconds())
        self.zone_abbrev = local_sec_dt.tzname() or "UTC"


def _pad(value: int, flag: str, width: int, default_width: int, default_zero: bool) -> str:
    w = width or default_width
    if flag == "-":
        return str(value)
    if flag == "_" or (not default_zero and flag == ""):
        return str(value).rjust(w)
    return str(value).zfill(w)


def _offset_str(off_sec: int, colons: int) -> str:
    sign = "+" if off_sec >= 0 else "-"
    a = abs(off_sec)
    h, rem = divmod(a, 3600)
    m, s = divmod(rem, 60)
    if colons == 0:
        return f"{sign}{h:02d}{m:02d}"
    if colons == 1:
        return f"{sign}{h:02d}:{m:02d}"
    if colons == 2:
        return f"{sign}{h:02d}:{m:02d}:{s:02d}"
    # %:::z — shortest representation
    if s:
        return f"{sign}{h:02d}:{m:02d}:{s:02d}"
    if m:
        return f"{sign}{h:02d}:{m:02d}"
    return f"{sign}{h:02d}"


class RubyFormatter:
    """Ruby strftime over (sec in to_timezone, nano) — jruby-path analog."""

    def __init__(self, fmt: str, tz: _dt.tzinfo):
        self.fmt = fmt
        self.tz = tz

    def format(self, ts: Ts) -> str:
        w = _Wall(ts, self.tz)
        return _RUBY_FMT_RE.sub(lambda m: self._directive(m, w, ts), self.fmt)

    def _directive(self, m: "re.Match[str]", w: _Wall, ts: Ts) -> str:
        flag, width_s, colons, d = m.groups()
        width = int(width_s) if width_s else 0
        try:
            out = self._value(d, flag, width, len(colons), w, ts)
        except ValueError:
            return m.group(0)  # ruby strftime: unknown directives print as-is
        if flag == "^":
            out = out.upper()
        elif flag == "#":
            out = out.swapcase()
        return out

    def _value(self, d: str, flag: str, width: int, colons: int, w: _Wall, ts: Ts) -> str:
        if d == "%":
            return "%"
        if d == "Y":
            return _pad(w.year, flag, width, 4, True)
        if d == "y":
            return _pad(w.year % 100, flag, width, 2, True)
        if d == "C":
            return _pad(w.year // 100, flag, width, 2, True)
        if d == "m":
            return _pad(w.month, flag, width, 2, True)
        if d == "d":
            return _pad(w.day, flag, width, 2, True)
        if d == "e":
            return _pad(w.day, "_" if flag == "" else flag, width, 2, False)
        if d == "j":
            return _pad(w.yday, flag, width, 3, True)
        if d == "H":
            return _pad(w.hour, flag, width, 2, True)
        if d == "k":
            return _pad(w.hour, "_" if flag == "" else flag, width, 2, False)
        if d == "I":
            return _pad((w.hour % 12) or 12, flag, width, 2, True)
        if d == "l":
            return _pad((w.hour % 12) or 12, "_" if flag == "" else flag, width, 2, False)
        if d == "M":
            return _pad(w.minute, flag, width, 2, True)
        if d == "S":
            return _pad(w.sec, flag, width, 2, True)
        if d == "L":
            return _pad(w.nano // 1_000_000, flag, width, 3, True)
        if d == "N":
            digits = width or 9
            nano9 = f"{w.nano:09d}"
            if digits <= 9:
                return nano9[:digits]
            return nano9 + "0" * (digits - 9)
        if d == "b" or d == "h":
            return _MONTH_ABBREV[w.month - 1]
        if d == "B":
            return _MONTH_FULL[w.month - 1]
        if d == "a":
            return _DAY_ABBREV[w.wday]
        if d == "A":
            return _DAY_FULL[w.wday]
        if d == "u":
            return str(w.wday + 1)
        if d == "w":
            return str((w.wday + 1) % 7)
        if d == "p":
            return "PM" if w.hour >= 12 else "AM"
        if d == "P":
            return "pm" if w.hour >= 12 else "am"
        if d == "s":
            return str(ts.sec)
        if d == "Q":
            return str(ts.sec * 1000 + ts.nano // 1_000_000)
        if d == "z":
            return _offset_str(w.off_sec, colons)
        if d == "Z":
            return w.zone_abbrev
        if d == "n":
            return "\n"
        if d == "t":
            return "\t"
        if d == "U":
            return _pad(self._week(w, 6), flag, width, 2, True)
        if d == "W":
            return _pad(self._week(w, 0), flag, width, 2, True)
        if d in ("V", "G", "g"):
            iso_year, iso_week, _ = _dt.date(w.year, w.month, w.day).isocalendar()
            if d == "V":
                return _pad(iso_week, flag, width, 2, True)
            if d == "G":
                return _pad(iso_year, flag, width, 4, True)
            return _pad(iso_year % 100, flag, width, 2, True)
        if d == "D" or d == "x":
            return f"{w.month:02d}/{w.day:02d}/{w.year % 100:02d}"
        if d == "F":
            return f"{w.year:04d}-{w.month:02d}-{w.day:02d}"
        if d == "T" or d == "X":
            return f"{w.hour:02d}:{w.minute:02d}:{w.sec:02d}"
        if d == "R":
            return f"{w.hour:02d}:{w.minute:02d}"
        if d == "r":
            h12 = (w.hour % 12) or 12
            ampm = "PM" if w.hour >= 12 else "AM"
            return f"{h12:02d}:{w.minute:02d}:{w.sec:02d} {ampm}"
        if d == "c":
            return (f"{_DAY_ABBREV[w.wday]} {_MONTH_ABBREV[w.month - 1]} "
                    f"{w.day:2d} {w.hour:02d}:{w.minute:02d}:{w.sec:02d} {w.year}")
        if d == "v":
            return f"{w.day:2d}-{_MONTH_ABBREV[w.month - 1].upper()}-{w.year}"
        raise ValueError(f"unsupported ruby format directive %{d}")

    @staticmethod
    def _week(w: _Wall, first_wday: int) -> int:
        # week-of-year, week 01 starting at the year's first `first_wday`
        # (6=Sunday for %U, 0=Monday for %W); days before it are week 00.
        # glibc/ruby formula: (yday0 + 7 - weekday_rel_first_day) // 7
        yday0 = w.yday - 1
        wd_mon = _dt.date(w.year, w.month, w.day).weekday()  # Mon=0
        wd = (wd_mon + 1) % 7 if first_wday == 6 else wd_mon
        return (yday0 + 7 - wd) // 7


class JavaFormatter:
    """Joda-pattern printer with the nano/micro printf-splice paths."""

    def __init__(self, fmt: str, tz: _dt.tzinfo):
        self.fmt = fmt
        self.tz = tz
        self.handle_nano = "nnnnnnnnn" in fmt
        self.handle_micro = (not self.handle_nano) and ("nnnnnn" in fmt)
        if self.handle_nano:
            pattern = fmt.replace("nnnnnnnnn", "\x00")
        elif self.handle_micro:
            pattern = fmt.replace("nnnnnn", "\x00")
        else:
            pattern = fmt
        self.tokens = _lex_java(pattern)

    def format(self, ts: Ts) -> str:
        if self.handle_nano or self.handle_micro:
            # print from sec*1000 only (nano dropped), then splice digits
            w = _Wall(Ts(ts.sec, 0), self.tz)
            base = self._print(w, 0)
            digits = f"{ts.nano:09d}" if self.handle_nano else f"{ts.nano // 1000:06d}"
            return base.replace("\x00", digits)
        msec = ts.sec * 1000 + ts.nano // 1_000_000
        sec = msec // 1000
        ms = msec - sec * 1000
        w = _Wall(Ts(sec, 0), self.tz)
        return self._print(w, ms)

    def _print(self, w: _Wall, millis: int) -> str:
        out: list[str] = []
        for kind, payload in self.tokens:
            if kind == "lit":
                out.append(payload)
                continue
            c, ln = payload[0], len(payload)
            if c == "\x00":
                out.append("\x00")
            elif c in ("y", "Y"):
                out.append(f"{w.year % 100:02d}" if ln == 2 else str(w.year).zfill(ln))
            elif c == "C":
                out.append(str(w.year // 100).zfill(ln))
            elif c == "M":
                if ln <= 2:
                    out.append(str(w.month).zfill(ln))
                elif ln == 3:
                    out.append(_MONTH_ABBREV[w.month - 1])
                else:
                    out.append(_MONTH_FULL[w.month - 1])
            elif c == "d":
                out.append(str(w.day).zfill(ln))
            elif c == "D":
                out.append(str(w.yday).zfill(ln))
            elif c == "E":
                out.append(_DAY_FULL[w.wday] if ln >= 4 else _DAY_ABBREV[w.wday])
            elif c == "e":
                out.append(str(w.wday + 1).zfill(ln))
            elif c == "H":
                out.append(str(w.hour).zfill(ln))
            elif c == "k":
                out.append(str(w.hour or 24).zfill(ln))
            elif c == "h":
                out.append(str((w.hour % 12) or 12).zfill(ln))
            elif c == "K":
                out.append(str(w.hour % 12).zfill(ln))
            elif c == "m":
                out.append(str(w.minute).zfill(ln))
            elif c == "s":
                out.append(str(w.sec).zfill(ln))
            elif c == "S":
                # fraction-of-second digits from millis
                out.append(f"{millis:03d}"[:ln] if ln <= 3 else f"{millis:03d}" + "0" * (ln - 3))
            elif c == "a":
                out.append("PM" if w.hour >= 12 else "AM")
            elif c == "z":
                out.append(w.zone_abbrev)
            elif c == "Z":
                out.append(_offset_str(w.off_sec, 1 if ln >= 2 else 0))
            elif c == "G":
                out.append("AD" if w.year > 0 else "BC")
            elif c == "w":
                out.append(str(_dt.date(w.year, w.month, w.day).isocalendar()[1]).zfill(ln))
            else:
                raise ValueError(f"unsupported java print letter {c!r} in {self.fmt!r}")
        return "".join(out)


class TimestampFormatter:
    """Family-dispatch formatter (TimestampFormatter.java:62-85)."""

    def __init__(self, fmt: str, timezone: "str | _dt.tzinfo" = "UTC"):
        tz = resolve_zone(timezone) if isinstance(timezone, str) else timezone
        self.tz = tz
        self.fmt = fmt
        if "%" in fmt:
            self._impl: "RubyFormatter | JavaFormatter" = RubyFormatter(fmt, tz)
        else:
            self._impl = JavaFormatter(fmt, tz)

    def format(self, ts: Ts) -> str:
        return self._impl.format(ts)
