"""Vectorized (Arrow/numpy) timestamp parse + format kernels.

This is the engine's analog of the reference's fast Java/Joda path vs the
slow JRuby path (README.md:118-127 shows a 50x gap; our two tiers are
regex-compiled Arrow kernels vs per-row scalar fallback).  The scalar
implementations in parser.py/formatter.py are the executable spec; these
kernels must agree bit-for-bit and the stage falls back to them per-row for
anything the vector path cannot express (exotic directives, IANA zone names
inside the text).

Parse pipeline per format:  pc.extract_regex (RE2, same pattern source as
the scalar parser) → int casts → Hinnant civil→days arithmetic in numpy →
zone resolution (constant offset, per-unique-token table, or pandas
tz_localize for DST zones) → int64 ns since epoch.

Format pipeline: ns → local wall-clock via offset trick
(pandas tz_convert(zone).tz_localize(None) is vectorized C) → days→civil →
digit strings via pyarrow utf8_lpad / take — no per-row Python.
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from embulk_filter_timestamp_format_ray.functions.parser import (
    JavaSingleParser,
    ParseError,
    RubySingleParser,
    _compile_java,
    _compile_ruby,
)
from embulk_filter_timestamp_format_ray.functions.formatter import (
    JavaFormatter,
    RubyFormatter,
    _offset_str,
)
from embulk_filter_timestamp_format_ray.functions.units import Ts
from embulk_filter_timestamp_format_ray.functions.zones import (
    fixed_offset_seconds,
    offset_seconds_from_text,
    resolve_zone,
)

NS = 1_000_000_000

_MONTH_ABBREV = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_FULL = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]
_DAY_ABBREV = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_DAY_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]

_POW10 = np.power(10, np.arange(19), dtype=np.int64)


def civil_from_days(days: np.ndarray):
    """Inverse of days_from_civil, vectorized (Hinnant civil_from_days)."""
    z = days + 719468
    era = np.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = np.where(mp < 10, mp + 3, mp - 9)
    y = y + (m <= 2)
    return y, m, d


def v_days_from_civil(y, m, d):
    y = y - (m <= 2)
    era = np.floor_divide(y, 400)
    yoe = y - era * 400
    mp = (m + 9) % 12
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _wall_components(ns: np.ndarray, off_sec: np.ndarray):
    """ns since epoch + per-row offset → (y, mo, d, hh, mm, ss, nano, days)."""
    sec = np.floor_divide(ns, NS)
    nano = ns - sec * NS
    local = sec + off_sec
    days = np.floor_divide(local, 86400)
    sod = local - days * 86400
    y, mo, d = civil_from_days(days)
    hh = sod // 3600
    mm = (sod % 3600) // 60
    ss = sod % 60
    return y, mo, d, hh, mm, ss, nano, days


def _offsets_for_zone(ns: np.ndarray, tz_key: str) -> np.ndarray:
    """Per-row UTC offset seconds of instants `ns` in zone (vectorized)."""
    tz = resolve_zone(tz_key)
    fixed = fixed_offset_seconds(tz)
    if fixed is not None:
        return np.full(len(ns), fixed, dtype=np.int64)
    idx = pd.DatetimeIndex(ns.view("datetime64[ns]"), tz="UTC").tz_convert(tz_key)
    local_ns = idx.tz_localize(None).asi8
    return (local_ns - ns) // NS


def _localize_wall_sec(naive_sec: np.ndarray, tz_key: str):
    """Wall-clock seconds in zone → epoch seconds. Returns (epoch, ok)."""
    tz = resolve_zone(tz_key)
    fixed = fixed_offset_seconds(tz)
    if fixed is not None:
        return naive_sec - fixed, np.ones(len(naive_sec), dtype=bool)
    idx = pd.DatetimeIndex((naive_sec * NS).view("datetime64[ns]"))
    try:
        aware = idx.tz_localize(tz_key, ambiguous="NaT", nonexistent="NaT")
    except Exception:  # pragma: no cover - defensive
        return naive_sec, np.zeros(len(naive_sec), dtype=bool)
    vals = aware.asi8
    ok = ~pd.isna(aware)
    out = np.where(ok, vals, 0) // NS
    return out, np.asarray(ok)


# ------------------------------------------------------------------ parsing

_VECTOR_PARSE_KINDS = {
    "year", "year2", "century", "month", "monthname", "day", "yday", "hour",
    "hour12", "min", "sec", "frac", "fracms", "ampm", "zone", "epoch",
    "epochms", "ignore",
}


class _VectorSingleParser:
    """One compiled format evaluated over a whole Arrow string array."""

    def __init__(self, fmt: str, default_tz_key: str, family: str):
        self.fmt = fmt
        self.family = family
        self.default_tz_key = default_tz_key
        self.handle_nano = False
        if family == "java":
            self.handle_nano = "nnnnnnnnn" in fmt
            pattern = fmt.replace("n", "S") if self.handle_nano else fmt
            compiled = _compile_java(pattern, resolve_zone(default_tz_key))
            self.scalar = JavaSingleParser(fmt, resolve_zone(default_tz_key))
        else:
            compiled = _compile_ruby(fmt, resolve_zone(default_tz_key))
            self.scalar = RubySingleParser(fmt, resolve_zone(default_tz_key))
        self.actions = compiled.actions
        for _, kind in self.actions:
            if kind not in _VECTOR_PARSE_KINDS:
                raise ValueError(f"not vectorizable: {kind}")
        body = compiled.regex.pattern
        # (?i) only when the pattern actually matches letters (RE2 runs
        # noticeably faster case-sensitive on digit/punct-only patterns)
        stripped = re.sub(r"\\.|\(\?P<[^>]+>", "", body)
        flags = "(?i)" if re.search(r"[A-Za-z]", stripped) else ""
        self.pattern = flags + "^" + body + "$"
        # when the java format's prefix before the fraction run ends with the
        # only '.' in it, the raw-text first-dot regex
        # (TimestampParser.java:157-167) is guaranteed to capture exactly the
        # main pattern's fraction group — reuse it and skip a second scan
        self.nano_group: "str | None" = None
        if self.handle_nano:
            s_pattern = fmt.replace("n", "S")
            idx = s_pattern.find("S")
            prefix = s_pattern[:idx]
            if prefix.endswith(".") and "." not in prefix[:-1]:
                for gname, kind in self.actions:
                    if kind == "fracms":
                        self.nano_group = gname
                        break
        # RE2 rejects some python-isms; validate eagerly via arrow
        pc.extract_regex(pa.array([], type=pa.string()), pattern=self.pattern)

    def parse_array(self, full_arr: pa.Array):
        """→ (ns int64 np.ndarray, ok bool np.ndarray). Input nulls → ok False
        (caller handles null passthrough before calling)."""
        n_full = len(full_arr)
        ex_full = pc.extract_regex(full_arr, pattern=self.pattern)
        matched = np.asarray(pc.is_valid(ex_full))
        matched &= ~np.asarray(pc.is_null(full_arr))
        if not matched.any():
            return np.zeros(n_full, dtype=np.int64), matched
        # work densely on matched rows only (struct children at null slots
        # hold garbage), scatter back at the end; skip the filter entirely in
        # the common everything-matched case
        all_matched = bool(matched.all())
        if all_matched:
            arr, ex, match_idx = full_arr, ex_full, None
        else:
            matched_pa = pa.array(matched)
            arr = full_arr.filter(matched_pa)
            ex = ex_full.filter(matched_pa)
            match_idx = np.nonzero(matched)[0]
        n = len(arr)
        ok = np.ones(n, dtype=bool)

        def _ints(field_arr, default=0):
            vals = pc.cast(field_arr, pa.int64())
            if vals.null_count:
                vals = pc.fill_null(vals, default)
            return np.asarray(vals)

        # scalar defaults broadcast through the arithmetic — fields that the
        # format never captures cost zero allocations
        year = 1970
        month = 1
        day = 1
        hour = 0
        minute = 0
        sec = 0
        nano = 0
        msec_frac = 0
        yday = None
        hour12 = None
        ampm_pm = None
        zone_tokens = None
        epoch = None
        epochms = None
        year2 = None
        century = None

        for gname, kind in self.actions:
            f = ex.field(gname)
            if kind == "ignore":
                continue
            if kind == "year":
                year = _ints(pc.utf8_ltrim(f, "+"), 1970)
            elif kind == "year2":
                year2 = _ints(f)
            elif kind == "century":
                century = _ints(f)
            elif kind == "month":
                month = _ints(f, 1)
            elif kind == "monthname":
                low3 = pc.utf8_lower(pc.utf8_slice_codeunits(f, 0, 3))
                idx = pc.index_in(low3, pa.array([m.lower() for m in _MONTH_ABBREV]))
                month = _ints(idx, 0) + 1
            elif kind == "day":
                day = _ints(f, 1)
            elif kind == "yday":
                yday = _ints(f, 1)
            elif kind == "hour":
                hour = _ints(f)
            elif kind == "hour12":
                hour12 = _ints(f)
            elif kind == "min":
                minute = _ints(f)
            elif kind == "sec":
                sec = _ints(f)
            elif kind == "frac":
                digits9 = pc.utf8_slice_codeunits(f, 0, 9)
                ln = np.asarray(pc.fill_null(pc.utf8_length(digits9), 0))
                val = _ints(digits9)
                nano = val * _POW10[np.clip(9 - ln, 0, 18)]
            elif kind == "fracms":
                digits3 = pc.utf8_slice_codeunits(f, 0, 3)
                ln = np.asarray(pc.fill_null(pc.utf8_length(digits3), 0))
                val = _ints(digits3)
                msec_frac = val * _POW10[np.clip(3 - ln, 0, 18)]
            elif kind == "ampm":
                low = pc.utf8_lower(pc.utf8_slice_codeunits(f, 0, 1))
                ampm_pm = np.asarray(pc.fill_null(pc.equal(low, "p"), False))
            elif kind == "zone":
                zone_tokens = f
            elif kind == "epoch":
                epoch = _ints(f)
            elif kind == "epochms":
                epochms = _ints(f)

        year_captured = not np.isscalar(year)
        if year2 is not None:
            year = np.where(year2 <= 68, 2000 + year2, 1900 + year2)
            year_captured = True
        if century is not None:
            # mirror the scalar spec: without a captured year/year2 the
            # century alone yields year = century*100 (not default%100)
            year = century * 100 + ((year % 100) if year_captured else 0)
        if hour12 is not None:
            h = hour12 % 12
            hour = np.where(ampm_pm, h + 12, h) if ampm_pm is not None else h
        elif ampm_pm is not None:
            hour = np.where(ampm_pm & (hour < 12), hour + 12, hour)

        if yday is not None:
            days = v_days_from_civil(year, 1, 1) + yday - 1
        else:
            days = v_days_from_civil(year, month, day)
        naive = days * 86400 + hour * 3600 + minute * 60 + sec
        if np.isscalar(naive) or np.ndim(naive) == 0:
            naive = np.full(n, naive, dtype=np.int64)

        # int64-ns representable window (documented engine domain): years
        # outside it cannot round-trip through timestamp[ns] — mark invalid
        # (NULL under the warn policy) instead of silently wrapping
        year_arr = year if not np.isscalar(year) else np.full(n, year)
        in_range = (year_arr >= 1678) & (year_arr <= 2261)
        ok &= in_range
        # LMT-era wall clocks (pre-standardized offsets like +08:06) go
        # through the scalar spec per row — pandas and datetime disagree on
        # sub-minute historical offsets
        lmt_era = in_range & (year_arr < 1930)

        # rows rescued by the per-row scalar parser override everything below
        rescued_idx: list[int] = []
        rescued_ns: list[int] = []

        def _scalar_rescue(rows: np.ndarray, strs=None):
            if strs is None:
                strs = arr.to_pylist()
            for i in np.nonzero(rows)[0]:
                try:
                    ts = self.scalar.parse(strs[i])
                    rescued_idx.append(int(i))
                    rescued_ns.append(ts.ns)
                except (ParseError, ValueError):
                    ok[i] = False

        # ---- zone resolution
        if zone_tokens is not None:
            tok = pc.fill_null(zone_tokens, "")
            uniq = pc.unique(tok)
            uniq_list = uniq.to_pylist()
            off_map = np.zeros(len(uniq_list), dtype=np.int64)
            scalar_u = np.zeros(len(uniq_list), dtype=bool)
            for j, u in enumerate(uniq_list):
                off = offset_seconds_from_text(u) if u else 0
                if off is None:
                    scalar_u[j] = True  # IANA name in text: rare, per-row scalar
                else:
                    off_map[j] = off
            idx = np.asarray(pc.index_in(tok, uniq))
            off_arr = off_map[idx]
            epoch_sec = naive - off_arr
            scalar_rows = scalar_u[idx] & ok
            if scalar_rows.any():
                _scalar_rescue(scalar_rows)
        else:
            epoch_sec, loc_ok = _localize_wall_sec(naive, self.default_tz_key)
            bad = ok & (~loc_ok | lmt_era)
            if bad.any():
                _scalar_rescue(bad)

        if epoch is not None:
            epoch_sec = epoch
        if epochms is not None:
            epoch_sec = np.floor_divide(epochms, 1000)
            nano = (epochms - epoch_sec * 1000) * 1_000_000 + nano

        if self.family == "java":
            msec = epoch_sec * 1000 + msec_frac
            if self.handle_nano:
                # nanos from the raw-text first-dot regex with the Math.pow
                # quirk; reuse the main pattern's fraction capture when the
                # format guarantees they coincide (skips a second regex scan)
                if self.nano_group is not None:
                    fdig = ex.field(self.nano_group)
                    fvalid = np.asarray(pc.is_valid(fdig))
                else:
                    fx = pc.extract_regex(arr, pattern=r"\.(?P<f>\d+)")
                    # struct children at non-matching slots hold garbage
                    # (e.g. '') — mask by the struct validity before casting
                    fvalid = np.asarray(pc.is_valid(fx))
                    fdig = pc.if_else(pa.array(fvalid), fx.field("f"), "0")
                ln = np.where(fvalid,
                              np.asarray(pc.fill_null(pc.utf8_length(fdig), 0)), 0)
                val = np.asarray(pc.fill_null(
                    pc.cast(pc.utf8_slice_codeunits(pc.fill_null(fdig, "0"),
                                                    0, 18), pa.int64()), 0))
                val = np.where(fvalid, val, 0)
                # digits * (long)10^(9-len); >9 digits → multiplier 0; the
                # full digit count (not the slice) drives the exponent
                mult = np.where(ln <= 9, _POW10[np.clip(9 - ln, 0, 18)], 0)
                nsec = np.where(ln > 0, val * mult, -1)
                s = np.sign(msec) * (np.abs(msec) // 1000)  # java trunc div
                ns_out = s * NS + nsec  # Ts.of floor-normalization == plain add
            else:
                ns_out = msec * 1_000_000
        else:
            ns_out = epoch_sec * NS + nano
        ns_out = ns_out.astype(np.int64, copy=False)
        if rescued_idx:
            ns_out[np.array(rescued_idx)] = np.array(rescued_ns, dtype=np.int64)
        if all_matched:
            return ns_out, ok
        # scatter dense results back to full length
        full_ns = np.zeros(n_full, dtype=np.int64)
        full_ok = np.zeros(n_full, dtype=bool)
        full_ns[match_idx] = ns_out
        full_ok[match_idx] = ok
        return full_ns, full_ok


class VectorParser:
    """Multi-format fallback over Arrow arrays with per-row scalar rescue.

    Mirrors TimestampParser.java:101-155: formats tried in order per row,
    first success wins; the ruby-family list shadows java formats when both
    are present.
    """

    def __init__(self, format_list, default_timezone: str = "UTC"):
        ruby = [f for f in format_list if "%" in f]
        java = [f for f in format_list if "%" not in f]
        active = ruby if ruby else java
        family = "ruby" if ruby else "java"
        self.parsers = []
        for fmt in active:
            try:
                self.parsers.append(_VectorSingleParser(fmt, default_timezone, family))
            except Exception:
                # non-vectorizable format: scalar-only tier
                if family == "ruby":
                    self.parsers.append(RubySingleParser(fmt, resolve_zone(default_timezone)))
                else:
                    self.parsers.append(JavaSingleParser(fmt, resolve_zone(default_timezone)))

    def parse_array(self, arr: "pa.Array | pa.ChunkedArray"):
        """→ (ns int64, valid mask, null-input mask)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        is_null = np.asarray(pc.is_null(arr))
        out = np.zeros(n, dtype=np.int64)
        done = is_null.copy()  # nulls pass through
        for p in self.parsers:
            if done.all():
                break
            remaining = ~done
            if isinstance(p, _VectorSingleParser):
                sub = arr.filter(pa.array(remaining))
                ns_sub, ok_sub = p.parse_array(sub)
                idx = np.nonzero(remaining)[0]
                good = idx[ok_sub]
                out[good] = ns_sub[ok_sub]
                done[good] = True
            else:  # scalar fallback format
                strs = arr.to_pylist()
                for i in np.nonzero(remaining)[0]:
                    try:
                        ts = p.parse(strs[i])
                        out[i] = ts.ns
                        done[i] = True
                    except (ParseError, ValueError):
                        pass
        valid = done & ~is_null
        return out, valid, is_null


# ---------------------------------------------------------------- formatting

def _join_pieces(pieces: list, n: int) -> pa.Array:
    """Join literal str / Arrow-array pieces element-wise into one column."""
    if len(pieces) == 1:
        p = pieces[0]
        if isinstance(p, (pa.Array, pa.ChunkedArray)):
            return p
        return pa.array([p] * n, type=pa.string())
    # scalars are broadcast by binary_join_element_wise
    return pc.binary_join_element_wise(*pieces, "")


def _lpad(col: np.ndarray, width: int) -> pa.Array:
    return pc.utf8_lpad(pc.cast(pa.array(col), pa.string()), width=width, padding="0")


def _spad(col: np.ndarray, width: int) -> pa.Array:
    return pc.utf8_lpad(pc.cast(pa.array(col), pa.string()), width=width, padding=" ")


_RUBY_FMT_RE = re.compile(r"%([-_^#0]?)(\d*)(:{0,3})([A-Za-z%])")


class VectorFormatter:
    """Vectorized formatter over int64 ns arrays → Arrow string array.

    Raises ValueError at construction for directives that need the scalar
    path; the stage then falls back wholly to the scalar formatter.
    """

    def __init__(self, fmt: str, timezone: str = "UTC"):
        self.fmt = fmt
        self.tz_key = timezone
        self.family = "ruby" if "%" in fmt else "java"
        if self.family == "ruby":
            self.tokens = self._tokenize_ruby(fmt)
            self.scalar = RubyFormatter(fmt, resolve_zone(timezone))
        else:
            self.tokens = self._tokenize_java(fmt)
            self.scalar = JavaFormatter(fmt, resolve_zone(timezone))

    _RUBY_OK = set("YyCmdejHkIlMSLNbBaApPuwzZsQntTFDRrXx%")

    def _tokenize_ruby(self, fmt: str):
        tokens = []
        pos = 0
        for m in _RUBY_FMT_RE.finditer(fmt):
            if m.start() > pos:
                tokens.append(("lit", fmt[pos:m.start()]))
            flag, width, colons, d = m.groups()
            if d not in self._RUBY_OK:
                raise ValueError(f"scalar-only ruby directive %{d}")
            if flag in ("^", "#"):
                raise ValueError("case flags are scalar-only")
            tokens.append(("dir", (flag, int(width) if width else 0, len(colons), d)))
            pos = m.end()
        if pos < len(fmt):
            tokens.append(("lit", fmt[pos:]))
        return tokens

    def _tokenize_java(self, fmt: str):
        from embulk_filter_timestamp_format_ray.functions.parser import _lex_java

        handle_nano = "nnnnnnnnn" in fmt
        handle_micro = (not handle_nano) and ("nnnnnn" in fmt)
        if handle_nano:
            fmt2 = fmt.replace("nnnnnnnnn", "\x00")
        elif handle_micro:
            fmt2 = fmt.replace("nnnnnn", "\x00")
        else:
            fmt2 = fmt
        self._java_nano = handle_nano
        self._java_micro = handle_micro
        toks = _lex_java(fmt2)
        for kind, payload in toks:
            if kind == "tok" and payload[0] not in "yYCMdDEeHkhKmsSazZ\x00":
                raise ValueError(f"scalar-only java letter {payload[0]}")
        return toks

    def format_array(self, ns: np.ndarray) -> pa.Array:
        n = len(ns)
        off = _offsets_for_zone(ns, self.tz_key)
        if self.family == "java":
            return self._format_java(ns, off)
        return self._format_ruby(ns, off)

    # ---- shared helpers

    def _zone_abbrevs(self, ns, off) -> pa.Array:
        # resolve one abbreviation per unique offset via a representative row
        tz = resolve_zone(self.tz_key)
        out = np.empty(len(ns), dtype=object)
        for o in np.unique(off):
            mask = off == o
            i = int(np.nonzero(mask)[0][0])
            dt = _dt.datetime.fromtimestamp(int(ns[i] // NS), tz)
            out[mask] = dt.tzname() or "UTC"
        return pa.array(out, type=pa.string())

    def _offset_strings(self, off: np.ndarray, colons: int) -> pa.Array:
        out = np.empty(len(off), dtype=object)
        for o in np.unique(off):
            out[off == o] = _offset_str(int(o), colons)
        return pa.array(out, type=pa.string())

    def _format_ruby(self, ns, off) -> pa.Array:
        y, mo, d, hh, mm, ss, nano, days = _wall_components(ns, off)
        wday = (days + 3) % 7
        pieces: list = []
        for kind, payload in self.tokens:
            if kind == "lit":
                pieces.append(payload)
                continue
            flag, width, colons, dd = payload
            pieces.append(self._ruby_piece(dd, flag, width, colons,
                                           y, mo, d, hh, mm, ss, nano, days,
                                           wday, ns, off))
        return _join_pieces(pieces, len(ns))

    def _ruby_piece(self, d, flag, width, colons,
                    y, mo, dday, hh, mm, ss, nano, days, wday, ns, off):
        def num(v, defw, zero=True):
            if flag == "-":
                return pc.cast(pa.array(v), pa.string())
            w = width or defw
            return _lpad(v, w) if (zero and flag != "_") else _spad(v, w)

        if d == "%":
            return "%"
        if d == "Y":
            return num(y, 4)
        if d == "y":
            return num(y % 100, 2)
        if d == "C":
            return num(y // 100, 2)
        if d == "m":
            return num(mo, 2)
        if d == "d":
            return num(dday, 2)
        if d == "e":
            return num(dday, 2, zero=False)
        if d == "j":
            return num(days - v_days_from_civil(y, np.ones_like(y), np.ones_like(y)) + 1, 3)
        if d == "H":
            return num(hh, 2)
        if d == "k":
            return num(hh, 2, zero=False)
        if d == "I":
            return num(np.where(hh % 12 == 0, 12, hh % 12), 2)
        if d == "l":
            return num(np.where(hh % 12 == 0, 12, hh % 12), 2, zero=False)
        if d == "M":
            return num(mm, 2)
        if d == "S":
            return num(ss, 2)
        if d == "L":
            return num(nano // 1_000_000, 3)
        if d == "N":
            digits = width or 9
            nine = _lpad(nano, 9)
            if digits == 9:
                return nine
            if digits < 9:
                return pc.utf8_slice_codeunits(nine, 0, digits)
            return pc.binary_join_element_wise(
                nine,
                pa.array(np.full(len(nano), "0" * (digits - 9), dtype=object)),
                "",
            )
        if d in ("b", "h"):
            return pa.array(_MONTH_ABBREV, type=pa.string()).take(pa.array(mo - 1))
        if d == "B":
            return pa.array(_MONTH_FULL, type=pa.string()).take(pa.array(mo - 1))
        if d == "a":
            return pa.array(_DAY_ABBREV, type=pa.string()).take(pa.array(wday))
        if d == "A":
            return pa.array(_DAY_FULL, type=pa.string()).take(pa.array(wday))
        if d == "u":
            return pc.cast(pa.array(wday + 1), pa.string())
        if d == "w":
            return pc.cast(pa.array((wday + 1) % 7), pa.string())
        if d == "p":
            return pa.array(["AM", "PM"], type=pa.string()).take(pa.array((hh >= 12).astype(np.int64)))
        if d == "P":
            return pa.array(["am", "pm"], type=pa.string()).take(pa.array((hh >= 12).astype(np.int64)))
        if d == "s":
            return pc.cast(pa.array(np.floor_divide(ns, NS)), pa.string())
        if d == "Q":
            sec = np.floor_divide(ns, NS)
            return pc.cast(pa.array(sec * 1000 + (ns - sec * NS) // 1_000_000), pa.string())
        if d == "z":
            return self._offset_strings(off, colons)
        if d == "Z":
            return self._zone_abbrevs(ns, off)
        if d == "n":
            return "\n"
        if d == "t":
            return "\t"
        if d in ("T", "X"):
            return pc.binary_join_element_wise(_lpad(hh, 2), _lpad(mm, 2), _lpad(ss, 2), ":")
        if d == "F":
            return pc.binary_join_element_wise(_lpad(y, 4), _lpad(mo, 2), _lpad(dday, 2), "-")
        if d in ("D", "x"):
            return pc.binary_join_element_wise(_lpad(mo, 2), _lpad(dday, 2), _lpad(y % 100, 2), "/")
        if d == "R":
            return pc.binary_join_element_wise(_lpad(hh, 2), _lpad(mm, 2), ":")
        if d == "r":
            h12 = np.where(hh % 12 == 0, 12, hh % 12)
            hmsp = pc.binary_join_element_wise(_lpad(h12, 2), _lpad(mm, 2), _lpad(ss, 2), ":")
            ap = pa.array([" AM", " PM"], type=pa.string()).take(pa.array((hh >= 12).astype(np.int64)))
            return pc.binary_join_element_wise(hmsp, ap, "")
        raise AssertionError(d)

    def _format_java(self, ns, off) -> pa.Array:
        if self._java_nano or self._java_micro:
            sec = np.floor_divide(ns, NS)
            nano = ns - sec * NS
            base_ns = sec * NS
            y, mo, d, hh, mm, ss, _, days = _wall_components(base_ns, off)
            millis = np.zeros(len(ns), dtype=np.int64)
            splice = _lpad(nano, 9) if self._java_nano else _lpad(nano // 1000, 6)
        else:
            sec = np.floor_divide(ns, NS)
            nano = ns - sec * NS
            msec_total = sec * 1000 + nano // 1_000_000
            s2 = np.floor_divide(msec_total, 1000)
            millis = msec_total - s2 * 1000
            y, mo, d, hh, mm, ss, _, days = _wall_components(s2 * NS, off)
            splice = None
        wday = (days + 3) % 7
        pieces: list = []
        for kind, payload in self.tokens:
            if kind == "lit":
                if "\x00" in payload:
                    subs = payload.split("\x00")
                    for j, sub in enumerate(subs):
                        if j:
                            pieces.append(splice)
                        if sub:
                            pieces.append(sub)
                else:
                    pieces.append(payload)
                continue
            c, ln = payload[0], len(payload)
            if c == "\x00":
                pieces.append(splice)
            elif c in ("y", "Y"):
                pieces.append(_lpad(y % 100, 2) if ln == 2 else _lpad(y, ln))
            elif c == "C":
                pieces.append(_lpad(y // 100, ln))
            elif c == "M":
                if ln <= 2:
                    pieces.append(_lpad(mo, ln))
                elif ln == 3:
                    pieces.append(pa.array(_MONTH_ABBREV, type=pa.string()).take(pa.array(mo - 1)))
                else:
                    pieces.append(pa.array(_MONTH_FULL, type=pa.string()).take(pa.array(mo - 1)))
            elif c == "d":
                pieces.append(_lpad(d, ln))
            elif c == "D":
                pieces.append(_lpad(days - v_days_from_civil(y, np.ones_like(y), np.ones_like(y)) + 1, ln))
            elif c == "E":
                names = _DAY_FULL if ln >= 4 else _DAY_ABBREV
                pieces.append(pa.array(names, type=pa.string()).take(pa.array(wday)))
            elif c == "e":
                pieces.append(_lpad(wday + 1, ln))
            elif c == "H":
                pieces.append(_lpad(hh, ln))
            elif c == "k":
                pieces.append(_lpad(np.where(hh == 0, 24, hh), ln))
            elif c == "h":
                pieces.append(_lpad(np.where(hh % 12 == 0, 12, hh % 12), ln))
            elif c == "K":
                pieces.append(_lpad(hh % 12, ln))
            elif c == "m":
                pieces.append(_lpad(mm, ln))
            elif c == "s":
                pieces.append(_lpad(ss, ln))
            elif c == "S":
                three = _lpad(millis, 3)
                if ln <= 3:
                    pieces.append(pc.utf8_slice_codeunits(three, 0, ln))
                else:
                    pieces.append(pc.binary_join_element_wise(
                        three, pa.array(np.full(len(ns), "0" * (ln - 3), dtype=object)), ""))
            elif c == "a":
                pieces.append(pa.array(["AM", "PM"], type=pa.string()).take(pa.array((hh >= 12).astype(np.int64))))
            elif c == "z":
                pieces.append(self._zone_abbrevs(ns, off))
            elif c == "Z":
                pieces.append(self._offset_strings(off, 1 if ln >= 2 else 0))
            else:
                raise AssertionError(c)
        return _join_pieces(pieces, len(ns))


def make_vector_formatter(fmt: str, timezone: str = "UTC"):
    """VectorFormatter, or a scalar-loop shim when not vectorizable."""
    try:
        return VectorFormatter(fmt, timezone)
    except ValueError:
        from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter

        scalar = TimestampFormatter(fmt, timezone)

        class _ScalarShim:
            fmt_ = fmt

            @staticmethod
            def format_array(ns: np.ndarray) -> pa.Array:
                sec = np.floor_divide(ns, NS)
                nano = ns - sec * NS
                return pa.array(
                    [scalar.format(Ts(int(s), int(nn))) for s, nn in zip(sec, nano)],
                    type=pa.string(),
                )

        return _ScalarShim()
