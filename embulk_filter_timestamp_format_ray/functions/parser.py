"""Scalar timestamp parsing: ruby-strptime and Joda-style pattern families.

Semantics-exact port of the reference behavior (NOT the implementation):

* family dispatch — a format containing ``%`` uses the ruby parser, else the
  Java/Joda parser (TimestampParser.java:62-84)
* multi-format fallback — try each format in declared order, first success
  wins, all-fail throws the last error (TimestampParser.java:101-155).  When
  the list mixes families, ruby formats win and java formats are IGNORED,
  exactly like the reference's two-list dispatch (TimestampParser.java:91-99).
* nano extraction for java patterns containing ``nnnnnnnnn`` — Joda is
  ms-resolution, so nanos come from the first ``\\.(\\d+)`` in the raw text,
  scaled by ``10^(9-len)`` with Java's ``(long) Math.pow`` truncation
  (TimestampParser.java:133-135,157-167); the parsed ms fraction is discarded
  and ``sec = msec/1000`` (TimestampParser.java:147-151).
* default-zone application — an explicit zone in the text overrides the
  configured ``from_timezone`` (TimestampParser.java:73,78; golden rows
  example/from_string.txt:10-11).

The parse result is ``Ts(sec, nano)`` at nanosecond resolution.
"""

from __future__ import annotations

import datetime as _dt
import re

from embulk_filter_timestamp_format_ray.functions.units import Ts
from embulk_filter_timestamp_format_ray.functions.zones import (
    offset_seconds_from_text,
    resolve_zone,
)


class ParseError(ValueError):
    def __init__(self, text: str, reason: str = "does not match format"):
        super().__init__(f"failed to parse string: \"{text}\" ({reason})")
        self.text = text


_MONTH_ABBREV = ["jan", "feb", "mar", "apr", "may", "jun",
                 "jul", "aug", "sep", "oct", "nov", "dec"]
_MONTH_FULL = ["january", "february", "march", "april", "may", "june", "july",
               "august", "september", "october", "november", "december"]
_DAY_ABBREV = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"]
_DAY_FULL = ["monday", "tuesday", "wednesday", "thursday", "friday",
             "saturday", "sunday"]

_ZONE_RE = r"[+-]\d{2}:?\d{2}:?\d{2}|[+-]\d{2}:?\d{2}|[+-]\d{2}|Z|[A-Za-z][A-Za-z0-9+\-/_]*"

# ruby composite directives expanded before compilation
_RUBY_COMPOSITES = {
    "D": "%m/%d/%y", "F": "%Y-%m-%d", "T": "%H:%M:%S", "X": "%H:%M:%S",
    "R": "%H:%M", "r": "%I:%M:%S %p", "c": "%a %b %e %H:%M:%S %Y",
    "v": "%e-%b-%Y", "x": "%m/%d/%y",
}

_RUBY_DIRECTIVE_RE = re.compile(r"%([-_^#0-9:]*)([A-Za-z%])")


def days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 (proleptic Gregorian). Works on ints and numpy."""
    y = y - (m <= 2)
    era = y // 400  # floor division is correct for negatives in python/numpy
    yoe = y - era * 400
    mp = (m + 9) % 12
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _java_trunc_div(value: int, divisor: int) -> int:
    q = abs(value) // divisor
    return q if value >= 0 else -q


def parse_nano_regex(text: str) -> int:
    """First ``\\.(\\d+)`` in text → nanos (TimestampParser.java:157-167).

    Replicates ``digits * (long) Math.pow(10, 9 - len)``: for >9 digits the
    pow truncates to 0, giving nsec = 0.
    """
    m = re.search(r"\.(\d+)", text)
    if m is None:
        return -1
    digits = m.group(1)
    exp = 9 - len(digits)
    mult = int(10.0 ** exp) if exp >= 0 else 0
    return int(digits) * mult


def _frac_to_nano(digits: str) -> int:
    """Fraction digits → nanos, ruby rational-floor semantics."""
    d9 = (digits + "000000000")[:9]
    return int(d9)


class _Fields:
    __slots__ = ("year", "year2", "century", "month", "day", "yday", "hour",
                 "hour12", "minute", "sec", "nano", "ampm", "zone", "epoch",
                 "epochms", "msec_frac")

    def __init__(self):
        self.year = None
        self.year2 = None
        self.century = None
        self.month = None
        self.day = None
        self.yday = None
        self.hour = None
        self.hour12 = None
        self.minute = None
        self.sec = None
        self.nano = None
        self.ampm = None
        self.zone = None
        self.epoch = None
        self.epochms = None
        self.msec_frac = None


class _CompiledPattern:
    """A single compiled format: regex + per-group field actions."""

    def __init__(self, regex: "re.Pattern[str]", actions: list, default_tz: _dt.tzinfo):
        self.regex = regex
        self.actions = actions  # list of (group_name, kind)
        self.default_tz = default_tz

    def match_fields(self, text: str) -> _Fields:
        m = self.regex.match(text)
        if m is None or m.end() != len(text):
            raise ParseError(text)
        f = _Fields()
        for gname, kind in self.actions:
            val = m.group(gname)
            if val is None:
                continue
            if kind == "year":
                f.year = int(val)
            elif kind == "year2":
                v = int(val)
                f.year2 = v
            elif kind == "century":
                f.century = int(val)
            elif kind == "month":
                f.month = int(val)
            elif kind == "monthname":
                low = val.lower()[:3]
                f.month = _MONTH_ABBREV.index(low) + 1
            elif kind == "day":
                f.day = int(val)
            elif kind == "yday":
                f.yday = int(val)
            elif kind == "hour":
                f.hour = int(val)
            elif kind == "hour12":
                f.hour12 = int(val)
            elif kind == "min":
                f.minute = int(val)
            elif kind == "sec":
                f.sec = int(val)
            elif kind == "frac":
                f.nano = _frac_to_nano(val)
            elif kind == "fracms":
                # Joda fraction-of-second at ms resolution (truncating)
                f.msec_frac = int((val + "000")[:3])
            elif kind == "ampm":
                f.ampm = val.lower().startswith("p")
            elif kind == "zone":
                f.zone = val
            elif kind == "epoch":
                f.epoch = int(val)
            elif kind == "epochms":
                f.epochms = int(val)
            # "ignore": no-op
        return f

    def resolve_epoch_sec(self, f: _Fields, text: str) -> "tuple[int, int]":
        """(epoch_sec, nano) from parsed fields applying zone precedence."""
        if f.epoch is not None:
            return f.epoch, f.nano or 0
        if f.epochms is not None:
            sec = f.epochms // 1000
            return sec, (f.epochms - sec * 1000) * 1_000_000 + (f.nano or 0)

        year = f.year if f.year is not None else 1970
        if f.year2 is not None:
            year = (2000 + f.year2) if f.year2 <= 68 else (1900 + f.year2)
        if f.century is not None:
            year = f.century * 100 + (year % 100 if (f.year2 is not None or f.year is not None) else 0)
        month = f.month or 1
        day = f.day or 1
        hour = f.hour or 0
        if f.hour12 is not None:
            h = f.hour12 % 12
            hour = h + 12 if f.ampm else h
        elif f.ampm and hour < 12:
            hour += 12
        minute = f.minute or 0
        sec = f.sec or 0
        nano = f.nano or 0

        if f.yday is not None:
            days = days_from_civil(year, 1, 1) + f.yday - 1
        else:
            days = days_from_civil(year, month, day)
        naive = days * 86400 + hour * 3600 + minute * 60 + sec

        if f.zone is not None:
            off = offset_seconds_from_text(f.zone)
            if off is None:
                try:
                    tz = resolve_zone(f.zone)
                except Exception:
                    raise ParseError(text, f"unknown zone {f.zone!r}") from None
                return self._localize(naive, tz), nano
            return naive - off, nano
        tz = self.default_tz
        return self._localize(naive, tz), nano

    @staticmethod
    def _localize(naive_epoch_sec: int, tz: _dt.tzinfo) -> int:
        off = tz.utcoffset(None) if isinstance(tz, _dt.timezone) else None
        if off is not None:
            return naive_epoch_sec - int(off.total_seconds())
        # named zone: interpret as wall-clock in tz (fold=0, like Joda)
        wall = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
            seconds=naive_epoch_sec
        )
        local = wall.replace(tzinfo=tz)
        return int(local.timestamp())


_RUBY_NUMERIC_DIRECTIVES = set("YyCmdejHkIlMSLNUVWGuwsQ")


def _ruby_next_is_numeric(fmt: str, pos: int) -> bool:
    """True when the directive starting at fmt[pos] is immediately followed
    by another numeric directive (no separator) — ruby/joda then parse the
    current numeric field at FIXED width ("%Y%m%d" → 4+2+2 digits)."""
    m = _RUBY_DIRECTIVE_RE.match(fmt, pos)
    if m is None:
        return False
    nxt = _RUBY_DIRECTIVE_RE.match(fmt, m.end())
    return nxt is not None and nxt.group(2) in _RUBY_NUMERIC_DIRECTIVES


def _compile_ruby(fmt: str, default_tz: _dt.tzinfo) -> _CompiledPattern:
    # expand composites (possibly nested one level: %c contains simple ones)
    for _ in range(3):
        out = _RUBY_DIRECTIVE_RE.sub(
            lambda m: _RUBY_COMPOSITES.get(m.group(2), m.group(0))
            if m.group(2) in _RUBY_COMPOSITES
            else m.group(0),
            fmt,
        )
        if out == fmt:
            break
        fmt = out

    parts: list[str] = []
    actions: list = []
    gid = 0

    def grp(pattern: str, kind: str) -> str:
        nonlocal gid
        name = f"g{gid}"
        gid += 1
        actions.append((name, kind))
        return f"(?P<{name}>{pattern})"

    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "%":
            m = _RUBY_DIRECTIVE_RE.match(fmt, i)
            if m is None:
                parts.append(re.escape(ch))
                i += 1
                continue
            d = m.group(2)
            # adjacent numeric directives parse at FIXED width, the
            # ruby/joda compact-format rule ("%Y%m%d" → 4+2+2 digits)
            fixed = _ruby_next_is_numeric(fmt, i)
            two = r"\d{2}" if fixed else r"\d{1,2}"
            i = m.end()
            if d == "%":
                parts.append("%")
            elif d == "Y":
                parts.append(grp(r"\d{4}" if fixed else r"[+-]?\d{1,5}", "year"))
            elif d == "y":
                parts.append(grp(two, "year2"))
            elif d == "C":
                parts.append(grp(two, "century"))
            elif d == "m":
                parts.append(grp(two, "month"))
            elif d in ("b", "h"):
                parts.append(grp("|".join(_MONTH_ABBREV), "monthname"))
            elif d == "B":
                parts.append(grp("|".join(_MONTH_FULL), "monthname"))
            elif d == "d":
                parts.append(grp(two, "day"))
            elif d == "e":
                parts.append(r"\s?" + grp(two, "day"))
            elif d == "j":
                parts.append(grp(r"\d{3}" if fixed else r"\d{1,3}", "yday"))
            elif d == "H":
                parts.append(grp(two, "hour"))
            elif d == "k":
                parts.append(r"\s?" + grp(two, "hour"))
            elif d == "I":
                parts.append(grp(two, "hour12"))
            elif d == "l":
                parts.append(r"\s?" + grp(two, "hour12"))
            elif d == "M":
                parts.append(grp(two, "min"))
            elif d == "S":
                parts.append(grp(two, "sec"))
            elif d == "L":
                parts.append(grp(r"\d{3}" if fixed else r"\d{1,3}", "frac"))
            elif d == "N":
                parts.append(grp(r"\d+", "frac"))
            elif d in ("U", "W", "V"):
                parts.append(grp(r"\d{1,2}", "ignore"))
            elif d == "G":
                parts.append(grp(r"[+-]?\d{1,5}", "year"))
            elif d == "A":
                parts.append(grp("|".join(_DAY_FULL), "ignore"))
            elif d == "a":
                parts.append(grp("|".join(_DAY_ABBREV), "ignore"))
            elif d in ("u", "w"):
                parts.append(grp(r"\d", "ignore"))
            elif d in ("p", "P"):
                parts.append(grp(r"[AaPp]\.?[Mm]\.?", "ampm"))
            elif d == "s":
                parts.append(grp(r"[+-]?\d+", "epoch"))
            elif d == "Q":
                parts.append(grp(r"[+-]?\d+", "epochms"))
            elif d in ("z", "Z"):
                parts.append(grp(_ZONE_RE, "zone"))
            elif d in ("n", "t"):
                parts.append(r"\s+")
            else:
                raise ValueError(f"unsupported ruby directive %{d} in {fmt!r}")
        elif ch.isspace():
            parts.append(r"\s+")
            while i < n and fmt[i].isspace():
                i += 1
        else:
            parts.append(re.escape(ch))
            i += 1
    regex = re.compile("".join(parts), re.IGNORECASE)
    return _CompiledPattern(regex, actions, default_tz)


def _lex_java(pattern: str) -> "list[tuple[str, str]]":
    """Lex a Joda-style pattern into (kind, payload): ('lit', s) | ('tok', run)."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "'":
            # quoted literal; '' is an escaped quote
            j = i + 1
            buf = []
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(pattern[j])
                j += 1
            if not buf and j == i + 1:
                buf = ["'"]  # lone '' means literal quote
            out.append(("lit", "".join(buf)))
            i = j + 1
        elif ch.isalpha():
            j = i
            while j < n and pattern[j] == ch:
                j += 1
            out.append(("tok", pattern[i:j]))
            i = j
        else:
            j = i
            while j < n and not pattern[j].isalpha() and pattern[j] != "'":
                j += 1
            out.append(("lit", pattern[i:j]))
            i = j
    return out


def _compile_java(pattern: str, default_tz: _dt.tzinfo) -> _CompiledPattern:
    parts: list[str] = []
    actions: list = []
    gid = 0

    def grp(rx: str, kind: str) -> str:
        nonlocal gid
        name = f"g{gid}"
        gid += 1
        actions.append((name, kind))
        return f"(?P<{name}>{rx})"

    tokens = _lex_java(pattern)
    numeric_letters = set("yYCdDHhKkms") | {"M"}  # M numeric when run ≤ 2

    def _is_numeric_tok(tok) -> bool:
        kind, payload = tok
        if kind != "tok":
            return False
        c0, l0 = payload[0], len(payload)
        if c0 == "M":
            return l0 <= 2
        return c0 in numeric_letters or c0 == "S"

    for ti, (kind, payload) in enumerate(tokens):
        if kind == "lit":
            parts.append(re.escape(payload))
            continue
        c, ln = payload[0], len(payload)
        # joda compact rule: a numeric field directly followed by another
        # numeric field parses at exactly its pattern width ("yyyyMMdd")
        fixed = (_is_numeric_tok((kind, payload))
                 and ti + 1 < len(tokens) and _is_numeric_tok(tokens[ti + 1]))

        def num(default_rx: str) -> str:
            return (r"\d{%d}" % ln) if fixed else default_rx

        if c == "y":
            if ln == 2:
                parts.append(grp(r"\d{2}", "year2"))
            else:
                parts.append(grp(num(r"[+-]?\d{1,5}"), "year"))
        elif c == "Y":  # weekyear ~ year for parse purposes
            parts.append(grp(num(r"[+-]?\d{1,5}"), "year"))
        elif c == "C":
            parts.append(grp(num(r"\d{1,2}"), "century"))
        elif c == "M":
            if ln <= 2:
                parts.append(grp(num(r"\d{1,2}"), "month"))
            elif ln == 3:
                parts.append(grp("|".join(_MONTH_ABBREV), "monthname"))
            else:
                parts.append(grp("|".join(_MONTH_FULL), "monthname"))
        elif c == "d":
            parts.append(grp(num(r"\d{1,2}"), "day"))
        elif c == "D":
            parts.append(grp(num(r"\d{1,3}"), "yday"))
        elif c == "E":
            names = _DAY_FULL if ln >= 4 else _DAY_ABBREV
            parts.append(grp("|".join(names), "ignore"))
        elif c == "e":
            parts.append(grp(num(r"\d{1,2}"), "ignore"))
        elif c in ("H", "k"):
            parts.append(grp(num(r"\d{1,2}"), "hour"))
        elif c in ("h", "K"):
            parts.append(grp(num(r"\d{1,2}"), "hour12"))
        elif c == "m":
            parts.append(grp(num(r"\d{1,2}"), "min"))
        elif c == "s":
            parts.append(grp(num(r"\d{1,2}"), "sec"))
        elif c == "S":
            parts.append(grp(num(r"\d{1,%d}" % max(ln, 1)), "fracms"))
        elif c == "a":
            parts.append(grp(r"[AaPp]\.?[Mm]\.?", "ampm"))
        elif c in ("z", "Z"):
            parts.append(grp(_ZONE_RE, "zone"))
        elif c == "G":
            parts.append(grp(r"AD|BC|CE|BCE", "ignore"))
        elif c == "w":
            parts.append(grp(r"\d{1,2}", "ignore"))
        else:
            raise ValueError(f"unsupported java pattern letter {c!r} in {pattern!r}")
    regex = re.compile("".join(parts), re.IGNORECASE)
    return _CompiledPattern(regex, actions, default_tz)


class RubySingleParser:
    def __init__(self, fmt: str, default_tz: _dt.tzinfo):
        self.fmt = fmt
        self.compiled = _compile_ruby(fmt, default_tz)

    def parse(self, text: str) -> Ts:
        f = self.compiled.match_fields(text)
        sec, nano = self.compiled.resolve_epoch_sec(f, text)
        return Ts.of(sec, nano)


class JavaSingleParser:
    """Joda-pattern parser at ms resolution with the optional nano-regex path
    (TimestampParser.java:66-84,123-155)."""

    def __init__(self, fmt: str, default_tz: _dt.tzinfo):
        self.fmt = fmt
        self.handle_nano = "nnnnnnnnn" in fmt
        pattern = fmt.replace("n", "S") if self.handle_nano else fmt
        self.compiled = _compile_java(pattern, default_tz)

    def parse_msec(self, text: str) -> int:
        f = self.compiled.match_fields(text)
        sec, _ = self.compiled.resolve_epoch_sec(f, text)
        return sec * 1000 + (f.msec_frac or 0)

    def parse(self, text: str) -> Ts:
        msec = self.parse_msec(text)
        if self.handle_nano:
            nsec = parse_nano_regex(text)
            sec = _java_trunc_div(msec, 1000)
            return Ts.of(sec, nsec)
        return Ts.of(0, msec * 1_000_000)


class TimestampParser:
    """Multi-format fallback parser (TimestampParser.java:42-121)."""

    def __init__(self, format_list: "list[str]", default_timezone: "str | _dt.tzinfo" = "UTC"):
        if not format_list:
            raise ValueError("format list must not be empty")
        tz = resolve_zone(default_timezone) if isinstance(default_timezone, str) else default_timezone
        self.default_tz = tz
        self.ruby_parsers: list[RubySingleParser] = []
        self.java_parsers: list[JavaSingleParser] = []
        for fmt in format_list:
            if "%" in fmt:
                self.ruby_parsers.append(RubySingleParser(fmt, tz))
            else:
                self.java_parsers.append(JavaSingleParser(fmt, tz))

    def parse(self, text: str) -> Ts:
        last: "Exception | None" = None
        # reference quirk: ruby parsers, when any exist, shadow java parsers
        parsers = self.ruby_parsers if self.ruby_parsers else self.java_parsers
        for p in parsers:
            try:
                return p.parse(text)
            except (ParseError, ValueError) as exc:
                last = exc
        raise last if last is not None else ParseError(text)
