"""Timestamp-format guessing (functions/guess.py) and the self-healing DLQ
loop (quarantine → suggest_dlq_specs → reprocess_dlq)."""

import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.functions.guess import guess_format
from embulk_filter_timestamp_format_ray.functions.parser import TimestampParser


@pytest.mark.parametrize("samples,expected", [
    (["2024-01-05 10:11:12", "1999-12-31 23:59:59"], "%Y-%m-%d %H:%M:%S"),
    (["2024-01-05 10:11:12.123456789 +0900"], "%Y-%m-%d %H:%M:%S.%N %z"),
    (["2024-01-05T10:11:12Z", "2030-06-01T00:00:00Z"], "%Y-%m-%dT%H:%M:%S%z"),
    (["2024-01-05T10:11:12.500Z"], "%Y-%m-%dT%H:%M:%S.%N%z"),
    (["05/Feb/2024:10:11:12 +0000"], "%d/%b/%Y:%H:%M:%S %z"),
    (["Mon, 05 Feb 2024 10:11:12 +0000"], "%a, %d %b %Y %H:%M:%S %z"),
    (["20240105"], "%Y%m%d"),
    (["2024-01-05", "2025-12-31"], "%Y-%m-%d"),
    (["1704067200"], "%s"),
    (["1704067200123"], "%Q"),
    (["-120"], "%s"),
])
def test_guess_known_layouts(samples, expected):
    fmt = guess_format(samples)
    assert fmt == expected
    # the guess must actually parse every sample with the repo's own parser
    p = TimestampParser([fmt], "UTC")
    for s in samples:
        p.parse(s)


def test_guess_rejects_garbage_and_mixed_below_bar():
    assert guess_format(["<garbled>", "not a ts"]) is None
    # 50% parse rate < 0.8 bar
    assert guess_format(["2024-01-05 10:11:12", "junk", "junk", "junk"]) is None
    assert guess_format([]) is None
    assert guess_format([None, ""]) is None


def test_guess_zone_preserved():
    """A zone-bearing layout must win over a naive prefix so offsets are
    honored, not silently dropped."""
    fmt = guess_format(["2024-01-05 10:11:12 +0900"])
    assert "%z" in fmt
    ts = TimestampParser([fmt], "UTC").parse("2024-01-05 10:11:12 +0900")
    utc_naive = 1704449472  # 2024-01-05 10:11:12 UTC
    assert ts.sec == utc_naive - 9 * 3600


def test_dlq_self_healing_loop(ray_session, tmp_path_factory):
    """Unknown-epoch events quarantine, suggest_dlq_specs guesses their
    layout, reprocess applies them — no human-written spec involved."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    clean = expected_event_table(200)
    bad = pa.Table.from_pylist([
        {"lsn": 200 + i, "op": "upsert", "conv_id": f"conv-new-{i}",
         "turn_idx": 0, "role": "user", "text": f"epoch7 row {i}",
         "tool": None, "ts_raw": f"2024-03-0{i + 1}T06:00:00Z",
         "schema_epoch": 7}
        for i in range(5)
    ] + [
        {"lsn": 300, "op": "upsert", "conv_id": "conv-hopeless", "turn_idx": 0,
         "role": "user", "text": "never parses", "tool": None,
         "ts_raw": "<garbled>", "schema_epoch": 1},
    ], schema=clean.schema)
    lake = str(tmp_path_factory.mktemp("lake_selfheal"))
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    pipe.apply(ray.data.from_arrow(pa.concat_tables([clean, bad])))
    assert pipe.read_dlq().num_rows == 6

    specs = pipe.suggest_dlq_specs()
    assert specs[7].from_format[0] in ("%Y-%m-%dT%H:%M:%S%z",
                                       "%Y-%m-%dT%H:%M:%SZ")
    # epoch 1's garbage must NOT have clobbered its good committed spec
    assert specs[1].from_format == pipe.epoch_specs[1].from_format \
        if pipe.epoch_specs else True

    stats = pipe.reprocess_dlq(epoch_specs=specs)
    assert stats["events_quarantined"] == 1  # only the hopeless row remains
    dlq = pipe.read_dlq()
    assert dlq.column("conv_id").to_pylist() == ["conv-hopeless"]
    final = pipe.final_state_sorted()
    texts = dict(zip(final.column("conv_id").to_pylist(),
                     final.column("text").to_pylist()))
    for i in range(5):
        assert texts[f"conv-new-{i}"] == f"epoch7 row {i}"


def test_suggest_extends_widened_epoch_format(ray_session, tmp_path_factory):
    """An epoch whose layout WIDENED keeps its old format as the first
    fallback (reference C3 multi-format chain), so old-layout rows still
    parse after the fix."""
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    clean = expected_event_table(100)
    # epoch 1 rows in a NEW layout its committed spec can't parse
    widened = pa.Table.from_pylist([
        {"lsn": 100 + i, "op": "upsert", "conv_id": f"conv-w{i}",
         "turn_idx": 0, "role": "user", "text": f"w{i}", "tool": None,
         "ts_raw": f"2024/03/0{i + 1} 06:00:00", "schema_epoch": 1}
        for i in range(3)
    ], schema=clean.schema)
    lake = str(tmp_path_factory.mktemp("lake_widen"))
    pipe = CDCPipeline(lake, num_partitions=4, dlq=True)
    pipe.apply(ray.data.from_arrow(pa.concat_tables([clean, widened])))
    assert pipe.read_dlq().num_rows == 3

    specs = pipe.suggest_dlq_specs()
    from embulk_filter_timestamp_format_ray.pipelines.cdc import (
        DEFAULT_EPOCH_SPECS,
    )
    old = DEFAULT_EPOCH_SPECS[1].from_format
    assert specs[1].from_format[:len(old)] == old       # old layout first
    assert "%Y/%m/%d %H:%M:%S" in specs[1].from_format  # new layout appended

    pipe.reprocess_dlq(epoch_specs=specs)
    assert pipe.read_dlq().num_rows == 0
    # and NEW epoch-1 traffic in the old layout still applies cleanly
    more_old = pa.Table.from_pylist([
        {"lsn": 500, "op": "upsert", "conv_id": "conv-old-layout",
         "turn_idx": 0, "role": "user", "text": "still fine", "tool": None,
         "ts_raw": "2015-07-12 15:00:00.100000000 +0000", "schema_epoch": 1},
    ], schema=clean.schema)
    pipe.apply(ray.data.from_arrow(more_old))
    assert pipe.read_dlq().num_rows == 0
