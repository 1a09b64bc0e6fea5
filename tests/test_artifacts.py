"""plans/artifacts.py session-artifact cache: build-once under
concurrency, stale-session eviction, eviction callback error tolerance.
Pure python — no Spark needed (the cache is engine-agnostic)."""

from __future__ import annotations

import threading
import time

from clickhouse_build_spark.plans.artifacts import session_artifact


def test_concurrent_first_touch_builds_once():
    cache: dict = {}
    builds = []
    gate = threading.Barrier(8)

    def build():
        builds.append(1)
        time.sleep(0.05)  # widen the race window
        return "artifact"

    def worker(results):
        gate.wait()
        results.append(session_artifact(cache, ("app1", "sf"), build))

    results: list = []
    threads = [
        threading.Thread(target=worker, args=(results,)) for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1  # double-checked lock: one build total
    assert results == ["artifact"] * 8
    assert cache == {("app1", "sf"): "artifact"}


def test_stale_session_entries_evicted_on_next_build():
    cache = {
        ("dead-app", "sf", "a"): "old-a",
        ("dead-app", "sf", "b"): "old-b",
        ("live-app", "sf", "a"): "keep",
    }
    evicted = []
    out = session_artifact(
        cache, ("live-app", "sf", "b"), lambda: "new-b", evict=evicted.append
    )
    assert out == "new-b"
    assert sorted(evicted) == ["old-a", "old-b"]
    assert cache == {
        ("live-app", "sf", "a"): "keep",
        ("live-app", "sf", "b"): "new-b",
    }


def test_eviction_callback_errors_do_not_block_the_build():
    cache = {("dead-app", "x"): "old"}

    def bad_evict(_):
        raise OSError("already gone")

    assert (
        session_artifact(cache, ("live", "x"), lambda: "new", evict=bad_evict)
        == "new"
    )
    assert ("dead-app", "x") not in cache


def test_cache_hit_skips_lock_and_build():
    cache = {("app", "k"): "cached"}

    def boom():
        raise AssertionError("must not rebuild")

    assert session_artifact(cache, ("app", "k"), boom) == "cached"


def test_nested_builds_reenter_the_lock():
    """shared_dedup_keepers' shape: one artifact's build requests
    another — the shared lock must be re-entrant."""
    cache: dict = {}

    def build_outer():
        inner = session_artifact(cache, ("app", "inner"), lambda: "i")
        return f"outer({inner})"

    assert session_artifact(cache, ("app", "outer"), build_outer) == "outer(i)"
    assert cache[("app", "inner")] == "i"
