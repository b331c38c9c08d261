"""Source readers + skew distribution + verify helpers."""

import numpy as np
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.config import ColumnConfig, TaskConfig
from embulk_filter_timestamp_format_ray.sources.changegen import change_events
from embulk_filter_timestamp_format_ray.sources.readers import (
    read_csv_with_schema,
    read_parquet,
)
from embulk_filter_timestamp_format_ray.stages.partition import PartitionStage
from embulk_filter_timestamp_format_ray.stages.timestamp_format import TimestampFormatStage


def test_csv_declared_schema_through_stage(ray_session, tmp_path):
    # the reference's file-CSV → filter flow (example/example.yml) end-to-end
    csv = tmp_path / "in.csv"
    csv.write_text(
        "2015-07-13,2015-07-13\n"
        "2015-07-12 16:00:00.123456789 UTC,2015-07-12 16:00:00.123456789 UTC\n"
    )
    ds = read_csv_with_schema(str(csv), {"s1": pa.string(), "s2": pa.string()})
    task = TaskConfig(
        columns=(ColumnConfig("s1", "string"), ColumnConfig("s2", "long", to_unit="ms")),
        default_from_timezone="Asia/Taipei",
        default_from_timestamp_format=(
            "%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z",
            "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %z", "%Y-%m-%d"),
        default_to_timezone="Asia/Taipei",
        default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
    )
    out = ds.map_batches(TimestampFormatStage(task), batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    # block order out of to_pandas() is not deterministic — sort by value
    out = out.sort_values("s2").reset_index(drop=True)
    assert list(out["s1"]) == ["2015-07-13 00:00:00.000000000",
                               "2015-07-13 00:00:00.123456789"]
    assert list(out["s2"]) == [1436716800000, 1436716800123]


def test_jsonl_nested_through_stage(ray_session, tmp_path):
    # the reference's example.jsonl flow: JSONL → struct column → JSONPath
    # rewrite (README.md example: nested timestamp reformatted to Tokyo)
    from embulk_filter_timestamp_format_ray.sources.readers import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"timestamp":"2015-07-12 15:00:00 UTC","nested":{"timestamp":"2015-07-12 15:00:00 UTC"}}\n'
        '{"timestamp":"2015-07-12 15:00:00.1 UTC","nested":{"timestamp":"2015-07-12 15:00:00.1 UTC"}}\n'
    )
    task = TaskConfig(
        columns=(
            ColumnConfig("timestamp", "long", to_unit="ms"),
            ColumnConfig("$.nested.timestamp", "string"),
        ),
        default_from_timestamp_format=("%Y-%m-%d %H:%M:%S.%N %z",
                                       "%Y-%m-%d %H:%M:%S %z"),
        default_to_timezone="Asia/Tokyo",
        default_to_timestamp_format="%Y-%m-%d %H:%M:%S.%N",
    )
    ds = read_jsonl(str(p))
    out = ds.map_batches(TimestampFormatStage(task), batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    out = out.sort_values("timestamp").reset_index(drop=True)
    assert list(out["timestamp"]) == [1436713200000, 1436713200100]
    nested = [n["timestamp"] for n in out["nested"]]
    assert nested == ["2015-07-13 00:00:00.000000000",
                      "2015-07-13 00:00:00.100000000"]


def test_parquet_column_pruning(ray_session, tmp_path):
    p = tmp_path / "t.parquet"
    pa.parquet.write_table(
        pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]}), str(p))
    ds = read_parquet(str(p), columns=["a", "c"])
    assert set(ds.schema().names) == {"a", "c"}


def test_partition_distribution_under_skew():
    """Zipf-skewed conv_ids + hot-key boost must still spread ~uniformly
    because the shuffle key is hash(conv_id, turn_idx)."""
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        ChangeEventBatchGenerator,
    )

    gen = ChangeEventBatchGenerator(seed=42, num_events=50_000, num_convs=100)
    tbl = gen(pa.table({"id": np.arange(50_000, dtype=np.int64)}))
    part = PartitionStage(32)
    out = part(tbl)
    counts = np.bincount(np.asarray(out.column("_pid")), minlength=32)
    assert counts.max() / counts.mean() < 1.5
    # conv-local mode concentrates hot convs (the problem salting solves)
    out2 = PartitionStage(32, by_turn=False)(tbl)
    counts2 = np.bincount(np.asarray(out2.column("_pid")), minlength=32)
    assert counts2.max() / counts2.mean() > counts.max() / counts.mean()


def test_detect_hot_keys(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.partition import detect_hot_keys

    conv = ["hot"] * 500 + [f"c{i}" for i in range(500)]
    ds = ray.data.from_arrow(pa.table({"conv_id": conv}))
    hot = detect_hot_keys(ds, sample_rows=1000, hot_fraction=0.05)
    assert hot == frozenset({"hot"})


def test_auto_gc_bounds_disk(ray_session, tmp_path):
    import os

    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    lake = str(tmp_path / "lake")
    # retain only the current version so GC reclaims every superseded txn
    pipe = CDCPipeline(lake, num_partitions=4, auto_gc=True,
                       time_travel_retain=1)
    full = expected_event_table(900)
    for i in range(3):
        pipe.apply(ray.data.from_arrow(full.slice(i * 300, 300)))
    txns = [d for d in os.listdir(lake) if d.startswith("txn-")]
    # only txns still referenced by the manifest survive (≤ applies, bounded)
    from embulk_filter_timestamp_format_ray.state import manifest as mf

    live = {p.split("/")[0] for p in mf.data_files(mf.read_manifest(lake))}
    assert set(txns) == live
    # and the lake still reads correctly
    assert pipe.final_state_sorted().num_rows > 0


def test_verify_helpers(ray_session, tmp_path):
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.pipelines.verify import (
        diff_states,
        lake_state_dict,
        verify_replay,
    )
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )
    from tests.test_cdc import sequential_oracle

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=8)
    pipe.apply(ray.data.from_arrow(expected_event_table(800)))
    oracle_state = sequential_oracle(800)
    oracle_rows = {
        k: {"role": v["role"], "text": v["text"], "tool": v["tool"], "lsn": v["lsn"]}
        for k, v in oracle_state.items()
    }
    verify_replay(pipe, oracle_rows)  # must not raise
    # a poisoned oracle produces diffs
    bad = dict(oracle_rows)
    some_key = next(iter(bad))
    bad[some_key] = {**bad[some_key], "text": "WRONG"}
    assert diff_states(lake_state_dict(pipe), bad)
    with pytest.raises(AssertionError):
        verify_replay(pipe, bad)


def test_apply_stream_microbatches(ray_session, tmp_path):
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
    from embulk_filter_timestamp_format_ray.sources.changegen import (
        expected_event_table,
    )

    lake = str(tmp_path / "lake")
    pipe = CDCPipeline(lake, num_partitions=8)
    full = expected_event_table(900)
    chunks = [ray.data.from_arrow(full.slice(i * 300, 300)) for i in range(3)]
    stats = pipe.apply_stream(chunks)
    assert [s["version"] for s in stats] == [1, 2, 3]


def test_corpus_write_resume(ray_session, tmp_path):
    """Resumable corpus output: second run skips committed partitions;
    deleting one partition + manifest entry re-writes only that part with
    identical bytes (deterministic pipeline)."""
    import json
    import os

    import pyarrow as pa
    import ray.data

    from embulk_filter_timestamp_format_ray.pipelines.corpus import (
        MANIFEST,
        prepared_corpus,
        write_corpus,
    )

    texts = [f"the quick brown fox number {i} jumps over the lazy dog "
             f"again and again and again" for i in range(200)]
    texts[5] = texts[4]  # exact dup
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})

    def corpus():
        return prepared_corpus(ray.data.from_arrow(t), min_tokens=5)

    out = str(tmp_path / "corpus")
    s1 = write_corpus(corpus(), out, num_partitions=4)
    assert s1["written"] == 4 and s1["rows"] == 199  # dup removed
    s2 = write_corpus(corpus(), out, num_partitions=4, resume=True)
    assert s2["written"] == 0 and s2["skipped"] == 4
    assert s2["rows"] == 199  # manifest totals preserved
    # drop one part: resume re-writes exactly it, bytes identical
    m = json.load(open(os.path.join(out, MANIFEST)))
    victim = sorted(m["parts"])[0]
    before = open(os.path.join(out, m["parts"][victim]["path"]), "rb").read()
    os.unlink(os.path.join(out, m["parts"][victim]["path"]))
    del m["parts"][victim]
    json.dump(m, open(os.path.join(out, MANIFEST), "w"))
    s3 = write_corpus(corpus(), out, num_partitions=4, resume=True)
    assert s3["written"] == 1 and s3["skipped"] == 3
    after = open(os.path.join(out, f"part-{int(victim):05d}.parquet"), "rb").read()
    assert before == after
