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
