"""Regression tests for the round-11 ADVICE items.

1. (medium) sinks/upsert.py evict_pooled_connection: the old
   mark-without-connection loss signal died as soon as a writer
   re-acquired after the forced evict and deferred NEW work — the
   generation bumped, commit_pooled found a live connection, committed
   it, and cleared the mark, silently reporting the rolled-back rows
   applied. The loss is now a _POOL_LOST tombstone that commit_pooled
   raises on REGARDLESS of later re-pooling / generation bumps.
2. (low) the _acquire unstamped+dirty adopt branch rested on marks
   never outliving their connection; evict_pooled_connection used to
   deliberately leave one. Marks are now popped with the connection in
   every eviction path, so the adopt heuristic can never match a mark
   describing a dead connection.
3. (low) tools/trigger_curve.py events_per_sec mixed warm-up rows into
   a nominal-sleep denominator; it now counts only the percentile
   batches over their actual first-to-last wall-clock span.
"""

import sqlite3

import pytest

from xxt_cdc_spark.sinks.upsert import (
    _CONN_POOL,
    _POOL_DIRTY,
    _POOL_FPS,
    _POOL_LOST,
    JdbcUpsertWriter,
    close_pooled_connections,
    commit_pooled,
    evict_pooled_connection,
)


class FakeConn:
    def __init__(self, commit_error: Exception | None = None):
        self.closed = self.rolled = False
        self.commits = 0
        self._commit_error = commit_error

    def close(self):
        self.closed = True

    def rollback(self):
        self.rolled = True

    def commit(self):
        if self._commit_error is not None:
            raise self._commit_error
        self.commits += 1


@pytest.fixture(autouse=True)
def _clean_pool():
    close_pooled_connections()
    yield
    close_pooled_connections()


class TestForcedEvictTombstone:
    def test_tombstone_survives_repool_and_new_dirty_work(self):
        """THE r11 ADVICE medium scenario: forced evict of a dirty key,
        then a writer re-acquires and defers NEW work (generation
        bumps, live connection present). commit_pooled must still fail
        the batch — the old path committed the new connection and
        reported the rolled-back rows applied."""
        key = "r11adv:forced"
        old = FakeConn()
        _CONN_POOL[key] = old
        _POOL_DIRTY[key] = 7
        evict_pooled_connection(key)
        assert old.rolled and old.closed
        assert key in _POOL_LOST

        # writer re-acquires: fresh connection pooled under the SAME
        # key, new deferred work marks it dirty at a NEW generation
        fresh = FakeConn()
        _CONN_POOL[key] = fresh
        _POOL_DIRTY[key] = 99

        with pytest.raises(RuntimeError, match="uncommitted coalesced work"):
            commit_pooled([key])
        assert fresh.commits == 0, "the loss must fail the batch, not commit over it"
        # the new connection's own pending work stays marked (it is
        # still uncommitted; the replay re-flushes and commits it)
        assert _POOL_DIRTY.get(key) == 99
        assert key not in _POOL_LOST, "one loss signals exactly one failure"

        # replay path: commit proceeds and clears the mark
        commit_pooled([key])
        assert fresh.commits == 1
        assert key not in _POOL_DIRTY

    def test_clean_evict_leaves_no_tombstone(self):
        key = "r11adv:clean"
        conn = FakeConn()
        _CONN_POOL[key] = conn
        evict_pooled_connection(key)
        assert conn.closed and not conn.rolled
        assert key not in _POOL_LOST
        commit_pooled([key])  # nothing pending, nothing lost: no raise

    def test_tombstone_pops_dead_mark_when_no_connection(self):
        """If nothing re-pooled before the commit attempt, the raise
        also clears the (dead) mark so the replay starts clean."""
        key = "r11adv:noreuse"
        _CONN_POOL[key] = FakeConn()
        _POOL_DIRTY[key] = 3
        evict_pooled_connection(key)
        with pytest.raises(RuntimeError, match="uncommitted coalesced work"):
            commit_pooled([key])
        assert key not in _POOL_DIRTY and key not in _POOL_LOST
        commit_pooled([key])


class TestCommitFailureTombstonesSiblings:
    def test_out_of_set_dirty_keys_get_tombstoned(self):
        """commit_pooled's failure eviction drops EVERY key on the
        failed connection. Keys inside the commit set are signaled by
        the raise; a dirty key OUTSIDE the set belongs to a caller the
        raise cannot reach — it must find a tombstone, not silence."""
        boom = FakeConn(commit_error=RuntimeError("server went away"))
        k_mine, k_sibling, k_idle = "r11adv:mine", "r11adv:sib", "r11adv:idle"
        for k in (k_mine, k_sibling, k_idle):
            _CONN_POOL[k] = boom
        _POOL_DIRTY[k_mine] = 1
        _POOL_DIRTY[k_sibling] = 2  # another caller's deferred rows

        with pytest.raises(RuntimeError, match="server went away"):
            commit_pooled([k_mine])
        assert boom.closed
        # my key: the raise signaled me — no tombstone, no crash-loop
        assert k_mine not in _POOL_LOST
        # sibling's dirty key: tombstoned; idle key: just evicted
        assert k_sibling in _POOL_LOST
        assert k_idle not in _POOL_LOST
        for k in (k_mine, k_sibling, k_idle):
            assert k not in _CONN_POOL and k not in _POOL_DIRTY

        # the sibling's commit attempt fails loudly exactly once
        with pytest.raises(RuntimeError, match="uncommitted coalesced work"):
            commit_pooled([k_sibling])
        commit_pooled([k_sibling])


class TestAdoptHeuristicAfterForcedEvict:
    def test_fingerprinted_writer_does_not_adopt_post_evict_connection(self, tmp_path):
        """The r11 ADVICE low scenario: forced evict of a dirty key used
        to leave a stale mark; if a non-stamping path then pooled a
        fresh connection, a fingerprinted writer's unstamped+dirty
        adopt branch would adopt an unknown-target connection. With
        marks popped at evict time, the planted connection is unstamped
        + CLEAN -> conservative eviction, never adoption."""
        key = "r11adv:adopt"
        dirty_old = FakeConn()
        _CONN_POOL[key] = dirty_old
        _POOL_DIRTY[key] = 11
        evict_pooled_connection(key)
        assert key not in _POOL_DIRTY

        # non-stamping path pools a fresh (unknown-target) connection
        planted = sqlite3.connect(str(tmp_path / "other_target.db"))
        _CONN_POOL[key] = planted

        db = str(tmp_path / "real_target.db")
        w = JdbcUpsertWriter(
            connect_fn=lambda: sqlite3.connect(db, timeout=60),
            table="t",
            columns=["k", "v"],
            key_cols=["k"],
            dialect="sqlite",
            pool_key=key,
        )
        w._target_fingerprint = db
        conn, pooled = w._acquire()
        assert pooled
        assert conn is not planted, "unknown-target connection must be evicted, not adopted"
        assert _POOL_FPS.get(key) == db, "the writer's own connection is stamped"
        # the planted connection was closed by the conservative evict
        with pytest.raises(sqlite3.ProgrammingError):
            planted.execute("SELECT 1")
        # and the forced-evict loss still signals through the new pool
        with pytest.raises(RuntimeError, match="uncommitted coalesced work"):
            commit_pooled([key])


class TestTriggerCurveRate:
    def test_parse_ts_roundtrip(self):
        import sys

        sys.path.insert(0, "tools")
        try:
            from trigger_curve import _parse_ts
        finally:
            sys.path.pop(0)
        t = _parse_ts("2026-08-16T13:03:37.500Z")
        assert t is not None
        t2 = _parse_ts("2026-08-16T13:03:38.500Z")
        assert abs((t2 - t) - 1.0) < 1e-6
        assert _parse_ts(None) is None
        assert _parse_ts("not-a-timestamp") is None

    def test_rate_uses_measured_batches_over_actual_span(self):
        """The rate arithmetic extracted from run_point: warm-up rows
        (first 3 batches) are excluded, and the denominator covers the
        ARRIVAL window of the counted rows — anchored at the previous
        batch's start, not the first measured batch's start (which
        shrank the span by one trigger interval and overstated the
        rate ~11% at few-batch counts, r12 ADVICE)."""
        trigger_ms = 250
        batches = [
            (100.0, 400.0, 5000),  # warm-up: big slow batches
            (100.5, 400.0, 5000),
            (101.0, 400.0, 5000),
            (101.25, 150.0, 1250),  # steady state: 1250 rows / 250 ms
            (101.50, 150.0, 1250),
            (101.75, 150.0, 1250),
            (102.00, 150.0, 1250),
        ]
        measured = batches[3:]
        rows = sum(b[2] for b in measured)
        prev = batches[2]
        span = (measured[-1][0] - prev[0]) + measured[-1][1] / 1000.0
        assert rows == 5000
        # span now includes measured[0]'s arrival interval (101.0 →
        # 101.25): 1.15 s instead of the old 0.9 s
        assert abs(span - 1.15) < 1e-9
        # old first-measured anchor: 5000 / 0.9 = 5556 (+11% for a
        # true 5k ev/s feed); previous-batch anchor: 4348 — the bias
        # now UNDERstates slightly at tiny batch counts (prev was a
        # slow warm-up batch) and vanishes as batches accumulate
        assert round(rows / span) == 4348
        # fallback when no prior batch carries a timestamp: first
        # measured start minus one trigger interval
        span_fb = (
            (measured[-1][0] - (measured[0][0] - trigger_ms / 1000.0))
            + measured[-1][1] / 1000.0
        )
        assert abs(span_fb - 1.15) < 1e-9
