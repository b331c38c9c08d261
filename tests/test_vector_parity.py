"""Property tests: the vectorized kernels must agree bit-for-bit with the
scalar reference implementations (the executable spec) across formats,
zones, and randomized inputs."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_filter_timestamp_format_ray.functions.formatter import TimestampFormatter
from embulk_filter_timestamp_format_ray.functions.parser import TimestampParser
from embulk_filter_timestamp_format_ray.functions.units import Ts
from embulk_filter_timestamp_format_ray.functions.vectorized import (
    VectorParser,
    make_vector_formatter,
)

FORMATS = [
    ("%Y-%m-%d %H:%M:%S.%N %z", "UTC"),
    ("%Y-%m-%d %H:%M:%S.%N %z", "Asia/Tokyo"),
    ("%Y-%m-%d %H:%M:%S", "Asia/Taipei"),
    ("%Y-%m-%dT%H:%M:%SZ", "UTC"),
    ("%Y-%m-%d", "America/New_York"),
    ("%d/%m/%Y %H:%M", "UTC"),
    ("%Y-%m-%d %I:%M:%S %p", "UTC"),
    ("yyyy-MM-dd HH:mm:ss.nnnnnnnnn z", "UTC"),
    ("yyyy-MM-dd HH:mm:ss.SSS", "Asia/Tokyo"),
    ("yyyy-MM-dd HH:mm:ss", "Asia/Taipei"),
    ("MM/dd/yyyy", "UTC"),
    ("%y-%m-%d %H:%M", "UTC"),
    ("%Y-%b-%d %H:%M", "UTC"),
    ("%d %B %Y", "UTC"),
    ("%Y-%j %H:%M:%S", "UTC"),
    ("%Y-%m-%d %H:%M:%S %Z", "Asia/Tokyo"),
    ("yyyy-MM-dd hh:mm a", "UTC"),
    ("yy/MM/dd HH:mm", "UTC"),
]

FORMAT_ONLY = [
    ("%Y-%m-%d %H:%M:%S.%6N %z", "Asia/Tokyo"),
    ("%Y-%m-%d %H:%M:%S.%3N", "UTC"),
    ("%F %T", "UTC"),
    ("%s", "UTC"),
    ("%b %e %Y %l:%M %p", "UTC"),
    ("yyyy-MM-dd HH:mm:ss.nnnnnn Z", "Asia/Taipei"),
    ("EEE, dd MMM yyyy HH:mm:ss", "UTC"),
    ("%A %B %d", "America/New_York"),
]


@pytest.mark.parametrize("fmt,tz", FORMATS + FORMAT_ONLY)
def test_format_parity(fmt, tz):
    rng = np.random.default_rng(7)
    ns = (rng.integers(0, 2_000_000_000, 300) * 1_000_000_000
          + rng.integers(0, 1_000_000_000, 300)).astype(np.int64)
    vf = make_vector_formatter(fmt, tz)
    sf = TimestampFormatter(fmt, tz)
    got = vf.format_array(ns).to_pylist()
    exp = [sf.format(Ts(int(x) // 10**9, int(x) % 10**9)) for x in ns]
    assert got == exp, fmt


@pytest.mark.parametrize("fmt,tz", FORMATS)
def test_parse_parity_roundtrip(fmt, tz):
    # format with the scalar formatter, then parse with BOTH parsers
    rng = np.random.default_rng(11)
    ns = (rng.integers(0, 2_000_000_000, 300) * 1_000_000_000
          + rng.integers(0, 1_000_000_000, 300)).astype(np.int64)
    sf = TimestampFormatter(fmt, tz)
    texts = [sf.format(Ts(int(x) // 10**9, int(x) % 10**9)) for x in ns]
    sp = TimestampParser([fmt], tz)
    vp = VectorParser([fmt], tz)
    v_ns, ok, _ = vp.parse_array(pa.array(texts))
    assert ok.all(), fmt
    for t, v in zip(texts, v_ns):
        assert sp.parse(t).ns == int(v), (fmt, t)


def test_nano_format_without_dot_separator():
    """Regression: nnnnnnnnn with a non-dot (or no) separator must not crash
    the vector tier — the raw-text nano regex finds no dot, and the
    reference semantics then give nsec=-1 (floor-normalized)."""
    for fmt in ("nnnnnnnnn yyyy", "ss'T'nnnnnnnnn", "HH:nnnnnnnnn"):
        sp = TimestampParser([fmt], "UTC")
        vp = VectorParser([fmt], "UTC")
        text = TimestampFormatter(fmt, "UTC").format(Ts(1436713200, 123456789))
        v_ns, ok, _ = vp.parse_array(pa.array([text]))
        assert ok[0], fmt
        assert sp.parse(text).ns == int(v_ns[0]), fmt


def test_dst_transition_parse_parity():
    """Wall-clock strings around a US DST transition (spring-forward gap and
    fall-back ambiguity) — the vector path localizes via pandas with NaT
    fallback to the scalar parser; both must agree."""
    fmt = "%Y-%m-%d %H:%M:%S"
    tz = "America/New_York"
    texts = [
        "2021-03-14 01:59:59",  # before the gap
        "2021-03-14 03:00:00",  # after the gap
        "2021-11-07 00:30:00",  # before fall-back
        "2021-11-07 01:30:00",  # ambiguous (occurs twice)
        "2021-11-07 02:30:00",  # after fall-back
        "2021-06-01 12:00:00",  # plain summer
        "2021-12-01 12:00:00",  # plain winter
    ]
    sp = TimestampParser([fmt], tz)
    vp = VectorParser([fmt], tz)
    v_ns, ok, _ = vp.parse_array(pa.array(texts))
    assert ok.all()
    for t, v in zip(texts, v_ns):
        assert sp.parse(t).ns == int(v), t


@given(st.integers(min_value=-10**9, max_value=4 * 10**9),
       st.integers(min_value=0, max_value=10**9 - 1))
@settings(max_examples=200, deadline=None)
def test_default_roundtrip_identity(sec, nano):
    """parse(format(ts)) == ts for the task-default formats at ns resolution."""
    f = TimestampFormatter("%Y-%m-%d %H:%M:%S.%9N %z", "UTC")
    p = TimestampParser(["%Y-%m-%d %H:%M:%S.%N %z"], "UTC")
    assert p.parse(f.format(Ts(sec, nano))) == Ts(sec, nano)


@given(st.lists(st.integers(min_value=0, max_value=2 * 10**9), min_size=1,
                max_size=40))
@settings(max_examples=50, deadline=None)
def test_vector_scalar_parse_agreement_random_batches(secs):
    f = TimestampFormatter("%Y-%m-%d %H:%M:%S %z", "Asia/Tokyo")
    texts = [f.format(Ts(s, 0)) for s in secs]
    fmts = ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"]
    sp = TimestampParser(fmts, "UTC")
    vp = VectorParser(fmts, "UTC")
    v_ns, ok, _ = vp.parse_array(pa.array(texts))
    assert ok.all()
    assert [sp.parse(t).ns for t in texts] == [int(v) for v in v_ns]
