"""Directory tailer: footer-stats pruning + bounded sidecar checkpoint
(sources/tailer.py) feeding the exactly-once CDC apply."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_filter_timestamp_format_ray.pipelines.cdc import CDCPipeline
from embulk_filter_timestamp_format_ray.sources.changegen import (
    expected_event_table,
)
from embulk_filter_timestamp_format_ray.sources.tailer import (
    SIDECAR_NAME,
    file_lsn_range,
    pending_files,
    tail_directory,
)

N = 3000


@pytest.fixture()
def binlog_dir(tmp_path_factory):
    """The 3000-event stream shipped as 6 lsn-chunked files."""
    d = str(tmp_path_factory.mktemp("binlog"))
    full = expected_event_table(N)
    step = N // 6
    for i in range(6):
        chunk = full.slice(i * step, step)
        pq.write_table(chunk, os.path.join(d, f"events-{i:04d}.parquet"))
    return d


def test_file_lsn_range_footer_only(binlog_dir):
    lo, hi = file_lsn_range(os.path.join(binlog_dir, "events-0000.parquet"))
    assert (lo, hi) == (0, N // 6 - 1)


def test_tail_applies_all_then_noop(ray_session, binlog_dir, tmp_path_factory):
    from tests.test_cdc import _assert_matches_oracle, _lake_as_dict, \
        sequential_oracle

    lake = str(tmp_path_factory.mktemp("lake_tail"))
    pipe = CDCPipeline(lake, num_partitions=8)
    stats = tail_directory(pipe, binlog_dir, files_per_batch=2)
    assert len(stats) == 3  # 6 files / 2 per commit
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N))
    # rerun on an unchanged directory: nothing pending, nothing applied
    assert tail_directory(pipe, binlog_dir) == []
    # sidecar holds only the ambiguous tail (bounded), never all 6 files
    side = json.load(open(os.path.join(lake, SIDECAR_NAME)))
    assert len(side) <= 6
    resume = pipe.resume_lsn()
    assert all(hi > resume for hi in side.values())


def test_tail_picks_up_new_files_and_crash_resume(ray_session, binlog_dir,
                                                  tmp_path_factory):
    from tests.test_cdc import _assert_matches_oracle, _lake_as_dict, \
        sequential_oracle

    lake = str(tmp_path_factory.mktemp("lake_tail2"))
    pipe = CDCPipeline(lake, num_partitions=8)
    tail_directory(pipe, binlog_dir)
    # shipper drops a 7th file extending the stream
    extra = expected_event_table(N + 600).filter(
        pa.compute.greater_equal(
            expected_event_table(N + 600).column("lsn"), N))
    pq.write_table(extra, os.path.join(binlog_dir, "events-0006.parquet"))
    stats = tail_directory(pipe, binlog_dir)
    assert len(stats) == 1 and stats[0]["events_applied"] > 0
    # crash simulation: lose the sidecar entirely → restart re-applies at
    # most the ambiguous tail, and the table state is unchanged
    os.unlink(os.path.join(lake, SIDECAR_NAME))
    before = _lake_as_dict(pipe)
    tail_directory(pipe, binlog_dir)
    assert _lake_as_dict(pipe) == before


def test_pending_files_prunes_by_footer(binlog_dir):
    # resume past files 0-2 (lsn < 1500): only 3 remain pending
    pending = pending_files(binlog_dir, resume_lsn=1499)
    assert pending == [f"events-{i:04d}.parquet" for i in (3, 4, 5)]
    # sidecar-named files drop out regardless of lsn
    pending = pending_files(binlog_dir, resume_lsn=1499,
                            ingested={"events-0004.parquet": 2499})
    assert pending == ["events-0003.parquet", "events-0005.parquet"]


def test_tail_delta_mode_with_compaction_cadence(ray_session, binlog_dir,
                                                 tmp_path_factory):
    """steady-state delta tailing: every commit is a merge-on-read delta,
    the backlog folds every compact_every commits, the trailing partial
    backlog stays pending, and the final state matches the oracle."""
    from embulk_filter_timestamp_format_ray.state import manifest as mf
    from tests.test_cdc import _assert_matches_oracle, _lake_as_dict, \
        sequential_oracle

    lake = str(tmp_path_factory.mktemp("lake_tail_delta"))
    pipe = CDCPipeline(lake, num_partitions=8)
    stats = tail_directory(pipe, binlog_dir, files_per_batch=1,
                           delta=True, compact_every=4)
    assert len(stats) == 6  # 6 files, 1 per commit
    m = mf.read_manifest(lake)
    # 6 delta commits + 1 compaction after the 4th → commits 5-6 pending
    assert mf.has_deltas(m)
    backlog = sum(len(p.get("deltas", [])) for p in m["partitions"].values())
    assert backlog <= 2 * pipe.num_partitions  # only the post-compaction tail
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N))
    # idempotent rerun: footer-pruned, no new commits, backlog unchanged
    assert tail_directory(pipe, binlog_dir, delta=True) == []
    assert sum(len(p.get("deltas", []))
               for p in mf.read_manifest(lake)["partitions"].values()) \
        == backlog
    pipe.compact_deltas()
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N))


def test_follow_applies_files_landing_mid_loop(ray_session, tmp_path_factory):
    """follow_directory: files dropped BETWEEN polls are picked up; the
    loop exits after idle_polls empty polls; final state equals the
    sequential oracle."""
    import threading
    import time

    from embulk_filter_timestamp_format_ray.sources.tailer import (
        follow_directory,
    )
    from tests.test_cdc import _assert_matches_oracle, _lake_as_dict, \
        sequential_oracle

    d = str(tmp_path_factory.mktemp("binlog_follow"))
    full = expected_event_table(N)
    step = N // 6
    # first two chunks are present at start; the rest land while following
    for i in range(2):
        pq.write_table(full.slice(i * step, step),
                       os.path.join(d, f"events-{i:04d}.parquet"))

    def shipper():
        for i in range(2, 6):
            time.sleep(0.3)
            tmp = os.path.join(d, f".tmp-{i}")
            pq.write_table(full.slice(i * step, step), tmp)
            # atomic rename: the tailer never sees a half-written file
            os.replace(tmp, os.path.join(d, f"events-{i:04d}.parquet"))

    lake = str(tmp_path_factory.mktemp("lake_follow"))
    pipe = CDCPipeline(lake, num_partitions=8)
    commits = []
    t = threading.Thread(target=shipper)
    t.start()
    stats = follow_directory(pipe, d, poll_interval=0.2, idle_polls=4,
                             files_per_batch=2,
                             on_commit=lambda s: commits.append(len(s)))
    t.join()
    assert sum(s["events_applied"] for s in stats) > 0
    assert len(commits) >= 2  # landed in at least two separate polls
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N))
    # a fresh follow on the drained directory exits with nothing applied
    assert follow_directory(pipe, d, poll_interval=0.05, idle_polls=2) == []


def test_two_concurrent_followers_one_lake(ray_session, tmp_path_factory):
    """Active-active REDUNDANT tailers in one process: two follow loops,
    each shipping the FULL stream (per-writer in-order — the documented
    active-active shape, same as stress_occ across processes), racing
    delta commits + compactions into one lake via OCC — final state equals
    the sequential oracle.

    Contract note: redundancy is required.  Two sources shipping DISJOINT
    lsn ranges concurrently would violate the in-order delivery assumption
    behind the watermark replay-prune (a source that jumps the watermark
    ahead makes the other's older unapplied events look like replays);
    multi-source disjoint streams need per-source lsn spaces, which is out
    of the single-binlog contract."""
    import threading

    # ray.data's read path re-attempts `from fsspec.implementations.http
    # import HTTPFileSystem` on EVERY read_parquet call; aiohttp is absent
    # in this container so the import always fails, is evicted from
    # sys.modules, and two threads racing the attempt can observe each
    # other's partially-initialized module (ImportError: cannot import
    # name...).  Stubbing aiohttp/yarl lets the fsspec module import ONCE
    # successfully and stay cached — test-scope only; nothing here touches
    # http:// paths.
    import sys
    import types
    for _name in ("aiohttp", "yarl"):
        sys.modules.setdefault(_name, types.ModuleType(_name))
    import fsspec.implementations.http  # noqa: F401

    from embulk_filter_timestamp_format_ray.sources.tailer import (
        follow_directory,
    )
    from tests.test_cdc import _assert_matches_oracle, _lake_as_dict, \
        sequential_oracle

    base = tmp_path_factory.mktemp("two_followers")
    d1, d2 = str(base / "binlog_a"), str(base / "binlog_b")
    os.makedirs(d1)
    os.makedirs(d2)
    full = expected_event_table(N)
    step = N // 6
    # BOTH directories carry the whole stream (redundant shippers); the
    # followers apply their copies in min-lsn order and race per chunk
    for i in range(6):
        chunk = full.slice(i * step, N - i * step if i == 5 else step)
        pq.write_table(chunk, os.path.join(d1, f"a-{i:03d}.parquet"))
        pq.write_table(chunk, os.path.join(d2, f"b-{i:03d}.parquet"))

    lake = str(base / "lake")
    pipe = CDCPipeline(lake, num_partitions=8)
    results = {}

    errors = {}

    def run(name, d):
        # each follower uses its own pipeline handle (shared manifest via
        # OCC); delta mode with a short compaction cadence maximizes
        # commit-path interleaving
        try:
            p = CDCPipeline(lake, num_partitions=8) if name == "b" else pipe
            # commit_retries=32 (> the tail default 8): inside the shared
            # pytest Ray session the commit path runs slower than in a
            # fresh session, so two racers' OCC windows stretch and an
            # 8-deep budget intermittently exhausts (~1 in 3 full-suite
            # runs); retries are idempotent under the watermark prune
            results[name] = follow_directory(
                p, d, poll_interval=0.1, idle_polls=3, files_per_batch=1,
                delta=True, compact_every=2, commit_retries=32)
        except Exception as e:  # surfaced after join
            errors[name] = repr(e)

    ta = threading.Thread(target=run, args=("a", d1))
    tb = threading.Thread(target=run, args=("b", d2))
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert errors == {}, errors
    assert results["a"] and results["b"]
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N))
    assert CDCPipeline.from_lake(lake).fsck()["violations"] == []


def test_tail_delta_with_persistent_actor_exchange(ray_session, binlog_dir,
                                                   tmp_path_factory):
    """The tail loop's steady-state fast path: ONE ActorExchange pool
    reused across every delta commit of the tail — same final state as the
    dataset-exchange tail."""
    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
        ActorExchange,
    )
    from tests.test_cdc import _assert_matches_oracle, _lake_as_dict, \
        sequential_oracle

    lake = str(tmp_path_factory.mktemp("lake_tail_ax"))
    pipe = CDCPipeline(lake, num_partitions=8)
    ex = ActorExchange(lake, 8)
    stats = tail_directory(pipe, binlog_dir, files_per_batch=2, delta=True,
                           compact_every=2, exchange=ex)
    assert len(stats) == 3
    _assert_matches_oracle(_lake_as_dict(pipe), sequential_oracle(N))
    # idempotent re-tail through the same pool
    assert tail_directory(pipe, binlog_dir, delta=True, exchange=ex) == []
    ex.shutdown()


def test_follow_daemon_full_composition(ray_session, binlog_dir,
                                        tmp_path_factory):
    """The whole steady-state daemon in one flow: follow_directory polling
    a binlog dir, DELTA commits through a persistent actor-exchange pool,
    compaction cadence, and a per-poll downstream mirror — final mirror
    fold must equal the lake's folded state, and fsck must be clean."""
    from embulk_filter_timestamp_format_ray.pipelines.actor_exchange import (
        ActorExchange,
    )
    from embulk_filter_timestamp_format_ray.sources.tailer import (
        follow_directory,
    )
    from tests.test_sync import _live, _mirror

    lake = str(tmp_path_factory.mktemp("lake_daemon"))
    mirror_dir = str(tmp_path_factory.mktemp("mirror_daemon"))
    pipe = CDCPipeline(lake, num_partitions=8)
    ex = ActorExchange(lake, 8)
    commits = follow_directory(
        pipe, binlog_dir, poll_interval=0.2, idle_polls=2,
        files_per_batch=2, delta=True, compact_every=2, exchange=ex,
        on_commit=lambda _s: pipe.sync_changes(mirror_dir))
    assert len(commits) == 3  # 6 files / 2 per commit
    pipe.sync_changes(mirror_dir)  # final catch-up (idempotent)
    assert pipe.fsck()["violations"] == []
    assert _mirror(mirror_dir) == _live(pipe)
    ex.shutdown()
