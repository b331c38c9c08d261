"""Manifest / exactly-once state unit tests (state/manifest.py)."""

import json
import os

from embulk_filter_timestamp_format_ray.state import manifest as mf


def test_empty_manifest(tmp_path):
    m = mf.read_manifest(str(tmp_path))
    assert m["version"] == 0 and m["partitions"] == {}
    assert mf.partition_watermark(m, 3) == -1
    assert mf.min_watermark(m, 4) == -1


def test_commit_is_atomic_replace(tmp_path):
    lake = str(tmp_path)
    m = {"version": 1, "partitions": {"0": {
        "path": "txn-a/part-00000.parquet", "rows": 5,
        "last_applied_lsn": 99, "lineage": []}}}
    mf.commit_manifest(lake, m)
    assert mf.read_manifest(lake)["version"] == 1
    # no tmp files left behind
    assert [f for f in os.listdir(lake) if f.endswith(".json")] == ["manifest.json"]
    assert mf.partition_watermark(mf.read_manifest(lake), 0) == 99


def test_min_watermark_requires_all_partitions(tmp_path):
    m = {"version": 1, "partitions": {
        "0": {"path": "p", "rows": 1, "last_applied_lsn": 10, "lineage": []},
        "1": {"path": "p", "rows": 1, "last_applied_lsn": 30, "lineage": []},
    }}
    # only 2 of 4 partitions have ever committed → cannot prune anything
    assert mf.min_watermark(m, 4) == -1
    assert mf.min_watermark(m, 2) == 10


def test_corrupt_tmp_never_becomes_commit(tmp_path):
    lake = str(tmp_path)
    mf.commit_manifest(lake, {"version": 1, "partitions": {}})
    # a crashed writer leaves a tmp file; reads ignore it
    with open(os.path.join(lake, "manifest.json.tmp.999"), "w") as f:
        f.write("{corrupt")
    assert mf.read_manifest(lake)["version"] == 1
    assert json.load(open(os.path.join(lake, "manifest.json")))["version"] == 1


def test_gc_dry_run_reports_without_deleting(tmp_path):
    import os

    from embulk_filter_timestamp_format_ray.state import manifest as mf

    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(lake, "txn-live"))
    os.makedirs(os.path.join(lake, "txn-orphan"))
    open(os.path.join(lake, "txn-orphan", "part.parquet"), "w").close()
    mf.commit_manifest(lake, {
        "version": 1,
        "partitions": {"0": {"path": "txn-live/part.parquet", "rows": 0,
                             "last_applied_lsn": 0}},
    })
    would = mf.gc_orphan_txns(lake, keep_txns=set(), dry_run=True)
    assert would == ["txn-orphan"]
    assert os.path.isdir(os.path.join(lake, "txn-orphan"))  # untouched
    removed = mf.gc_orphan_txns(lake, keep_txns=set())
    assert removed == ["txn-orphan"]
    assert not os.path.isdir(os.path.join(lake, "txn-orphan"))
