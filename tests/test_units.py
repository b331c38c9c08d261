"""Port of TestTimestampUnit.java:10-190 — exact truncation semantics —
plus the vectorized numpy equivalents."""

import numpy as np
import pytest

from embulk_filter_timestamp_format_ray.functions.units import (
    TimestampUnit,
    Ts,
    change_unit_double,
    change_unit_long,
    double_to_timestamp,
    long_to_timestamp,
    parse_unit,
    timestamp_to_double,
    timestamp_to_long,
    v_change_unit_long,
    v_double_to_ns,
    v_long_to_ns,
    v_ns_to_double,
    v_ns_to_long,
)

NS = 1462087147100200300
SEC = 1462087147

S, MS, US, N = (
    TimestampUnit.Second,
    TimestampUnit.MilliSecond,
    TimestampUnit.MicroSecond,
    TimestampUnit.NanoSecond,
)


def test_long_to_timestamp():
    assert long_to_timestamp(NS // 10**9, S) == Ts(SEC, 0)
    assert long_to_timestamp(NS // 10**6, MS) == Ts(SEC, 100000000)
    assert long_to_timestamp(NS // 10**3, US) == Ts(SEC, 100200000)
    assert long_to_timestamp(NS, N) == Ts(SEC, 100200300)


def test_double_to_timestamp():
    d = 1462087147100200192.0
    ts = double_to_timestamp(d / 10**9, S)
    assert ts.sec == SEC and abs(ts.nano - 100200192) <= 200
    ts = double_to_timestamp(d / 10**6, MS)
    assert ts.sec == SEC and abs(ts.nano - 100200192) <= 200
    ts = double_to_timestamp(d, N)
    assert ts == Ts(SEC, 100200192)


def test_timestamp_to_long():
    ts = Ts.of(0, NS)
    assert timestamp_to_long(ts, S) == NS // 10**9
    assert timestamp_to_long(ts, MS) == NS // 10**6
    assert timestamp_to_long(ts, US) == NS // 10**3
    assert timestamp_to_long(ts, N) == NS


def test_timestamp_to_double():
    ns = 1462087147100200192
    ts = Ts.of(0, ns)
    assert timestamp_to_double(ts, S) == pytest.approx(ns / 1e9, abs=2)
    assert timestamp_to_double(ts, MS) == pytest.approx(ns / 1e6, abs=2)
    assert timestamp_to_double(ts, N) == pytest.approx(float(ns), abs=2)


def test_long_change_unit_full_matrix():
    vals = {S: NS // 10**9, MS: NS // 10**6, US: NS // 10**3, N: NS}
    for fu, v in vals.items():
        for tu in (S, MS, US, N):
            got = change_unit_long(v, fu, tu)
            if fu.scale <= tu.scale:
                assert got == v * (tu.scale // fu.scale)
            else:
                assert got == v // (fu.scale // tu.scale)


def test_java_truncation_toward_zero():
    # Java -1234/1000 == -1 (trunc), python // gives -2 (floor)
    assert change_unit_long(-1234, MS, S) == -1
    assert v_change_unit_long(np.array([-1234, 1234]), MS, S).tolist() == [-1, 1]


def test_double_change_unit():
    d = 1462087147100200192.0
    assert change_unit_double(d / 1e6, MS, S) == pytest.approx(d / 1e9, abs=2)
    assert change_unit_double(d / 1e9, S, N) == pytest.approx(d, rel=1e-15)


def test_unit_aliases():
    for alias, unit in [("ms", MS), ("msec", MS), ("milli", MS), ("sec", S),
                        ("us", US), ("usec", US), ("nano", N), ("ns", N),
                        ("NanoSecond", N), ("milli_second", MS)]:
        assert parse_unit(alias) is unit
    with pytest.raises(ValueError):
        parse_unit("fortnight")


def test_vectorized_matches_scalar():
    longs = np.array([NS // 10**6, 0, -1234, 987654321], dtype=np.int64)
    assert v_long_to_ns(longs, MS).tolist() == [
        x * 10**6 for x in longs.tolist()
    ]
    ns_arr = np.array([NS, -NS, 0], dtype=np.int64)
    for tu in (S, MS, US, N):
        expect = [timestamp_to_long(Ts.of(0, int(x)), tu) for x in ns_arr]
        assert v_ns_to_long(ns_arr, tu).tolist() == expect
        expect_d = [timestamp_to_double(Ts.of(0, int(x)), tu) for x in ns_arr]
        np.testing.assert_allclose(v_ns_to_double(ns_arr, tu), expect_d, rtol=1e-15)
    doubles = np.array([1436713200100.2, -5.5], dtype=np.float64)
    got = v_double_to_ns(doubles, MS)
    assert got[0] == int(1436713200100.2 * 10**6)
    assert got[1] == int(-5.5 * 10**6)


def test_double_precision_artifact_from_reference_golden():
    # example/from_double.txt: 1436713200100.2 ms -> .100199936 nanos
    ts = double_to_timestamp(1436713200100.2, MS)
    assert ts == Ts(1436713200, 100199936)
