"""External-oracle kernel checks: our formatter/parser vs DuckDB's strftime/
strptime over shared directives and random instants (independent evidence
beyond the scalar↔vector parity suite)."""

import duckdb
import numpy as np
import pytest

from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.parser import TimestampParser
from embulk_filter_timestamp_format_ray.functions.units import Ts

SHARED_FORMATS = [
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%d/%m/%Y",
    "%H:%M:%S",
    "%Y-%m-%d %I:%M %p",
    "%a %b %d %Y",
    "%j %Y",
    "%Y-%m-%dT%H:%M:%SZ",
    "%m/%d/%y",
    "%H:%M",
]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.fixture(scope="module")
def instants():
    rng = np.random.default_rng(3)
    return rng.integers(0, 2_000_000_000, 200).tolist()


@pytest.mark.parametrize("fmt", SHARED_FORMATS)
def test_format_matches_duckdb(con, fmt, instants):
    ours = TimestampFormatter(fmt, "UTC")
    for sec in instants:
        got = ours.format(Ts(int(sec), 0))
        exp = con.execute(
            "select strftime(to_timestamp(?)::timestamp, ?)", [int(sec), fmt]
        ).fetchone()[0]
        assert got == exp, (fmt, sec)


@pytest.mark.parametrize("fmt", ["%Y-%m-%d %H:%M:%S", "%d/%m/%Y", "%Y-%m-%dT%H:%M:%S"])
def test_parse_matches_duckdb(con, fmt, instants):
    ours_fmt = TimestampFormatter(fmt, "UTC")
    parser = TimestampParser([fmt], "UTC")
    for sec in instants[:100]:
        text = ours_fmt.format(Ts(int(sec), 0))
        got = parser.parse(text).sec
        exp = con.execute(
            "select epoch(strptime(?, ?))", [text, fmt]
        ).fetchone()[0]
        assert got == int(exp), (fmt, text)


EXOTIC_DIRECTIVES = [
    # ISO week-year family, week numbers, century, epoch, paddings, flags —
    # the r1-verdict "directive zoo" audit (glibc strftime == ruby semantics
    # for every one of these)
    "%G", "%g", "%V", "%u", "%w", "%U", "%W", "%C", "%s",
    "%e", "%k", "%l", "%P", "%j",
    "%-d", "%_d", "%^a", "%^b", "%03e", "%6Y",
]


@pytest.mark.parametrize("d", EXOTIC_DIRECTIVES)
def test_exotic_directive_matches_glibc(d):
    """r2: %U/%W had an off-by-one (week-00 handling) caught by this oracle;
    the whole exotic set is now pinned against glibc strftime."""
    from datetime import datetime, timezone

    ours = TimestampFormatter(d, "UTC")
    rng = np.random.default_rng(11)
    for sec in rng.integers(-2_000_000_000, 4_000_000_000, 300).tolist():
        got = ours.format(Ts(int(sec), 0))
        exp = datetime.fromtimestamp(sec, tz=timezone.utc).strftime(d)
        assert got == exp, (d, sec)


def test_epoch_directive_roundtrip():
    # %s both ways: format then parse recovers the instant
    f = TimestampFormatter("%s", "UTC")
    p = TimestampParser(["%s"], "UTC")
    for sec in (-1, 0, 253402300799, 1463065359):
        assert p.parse(f.format(Ts(sec, 0))).sec == sec
