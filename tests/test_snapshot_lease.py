"""Single-writer snapshot lease (VERDICT r6 #4): the contract
`sinks/atomic.py` used to only document is now executable — a second
concurrent writer fails LOUDLY, a live writer's staging cannot be
destroyed by an eager reader's heal, and a crashed writer's stale
lease is reclaimed and healed.

Pure-filesystem tests: the snapshot protocol is POSIX rename/O_EXCL
arithmetic, no Spark needed (the through-the-store crash suites live
in test_atomic_sinks.py).
"""

from __future__ import annotations

import os
import time

import pytest

from purpleair_data_logger_spark.sinks import atomic


def _member(base: str, name: str, *, staged_success: bool = True) -> str:
    """A live table dir plus a staged rewrite (with its _SUCCESS
    commit record unless told otherwise)."""
    live = os.path.join(base, name)
    os.makedirs(os.path.join(live, "d=2024-01-01"), exist_ok=True)
    staged = atomic.staging_path(live)
    os.makedirs(os.path.join(staged, "d=2024-01-01"), exist_ok=True)
    with open(os.path.join(staged, "d=2024-01-01", "part-0.parquet"), "w") as f:
        f.write("new")
    if staged_success:
        with open(os.path.join(staged, atomic.SUCCESS_FILE), "w") as f:
            f.write("")
    return live


def _age_lease(base: str, by: float) -> None:
    lease = os.path.join(base, atomic.SNAPSHOT_LEASE)
    t = time.time() - by
    os.utime(lease, (t, t))


def test_second_writer_fails_loudly_mid_snapshot(tmp_path):
    base = str(tmp_path)
    live = _member(base, "t1")
    token = atomic.snapshot_begin(base, [live], writer_id="writer-A")
    assert token == "writer-A"
    # a second concurrent snapshot_begin must not touch ANY state
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.snapshot_begin(base, [live], writer_id="writer-B")
    assert atomic._lease_owner(base) == "writer-A"
    assert os.path.exists(os.path.join(base, atomic.SNAPSHOT_PENDING))
    # the owner finishes normally and the lease is released with it
    atomic.snapshot_commit(base, writer_id=token)
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))
    # after release the next writer acquires cleanly
    atomic.snapshot_begin(base, [live], writer_id="writer-B")


def test_reader_heal_refuses_while_lease_fresh(tmp_path):
    """An eager reader healing mid-snapshot would destroy a LIVE
    writer's staging; with the writer's heartbeat fresh, heal must
    refuse loudly instead — for both marker states."""
    base = str(tmp_path)
    live = _member(base, "t1")
    atomic.snapshot_begin(base, [live], writer_id="writer-A")
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.heal_snapshot(base)  # reader: no token
    # staging untouched by the refused heal
    assert os.path.isdir(atomic.staging_path(live))
    # ...including after the marker flip (commit in flight)
    os.replace(
        os.path.join(base, atomic.SNAPSHOT_PENDING),
        os.path.join(base, atomic.SNAPSHOT_COMMIT),
    )
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.heal_snapshot(base)
    # the OWNER may heal its own snapshot (upsert_wide's failure path)
    assert atomic.heal_snapshot(base, writer_id="writer-A") == "rolled_forward"
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))


def test_stale_lease_reclaimed_and_healed(tmp_path):
    """Crashed writer: heartbeat stops, lease goes stale, a reader's
    heal rolls the snapshot back and reclaims the lease; the next
    writer acquires cleanly."""
    base = str(tmp_path)
    live = _member(base, "t1", staged_success=False)
    atomic.snapshot_begin(base, [live], writer_id="dead-writer")
    _age_lease(base, atomic.DEFAULT_LEASE_TTL + 60)
    assert atomic.heal_snapshot(base) == "rolled_back"
    assert not os.path.isdir(atomic.staging_path(live))
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))
    token = atomic.snapshot_begin(base, [live], writer_id="writer-B")
    assert token == "writer-B"


def test_stale_lease_reclaimed_by_next_begin(tmp_path):
    """A crashed writer that never wrote its pending marker (died
    between lease acquire and marker write): the next snapshot_begin
    reclaims the stale lease directly."""
    base = str(tmp_path)
    live = _member(base, "t1")
    atomic.acquire_lease(base, "dead-writer")
    _age_lease(base, atomic.DEFAULT_LEASE_TTL + 60)
    token = atomic.snapshot_begin(base, [live], writer_id="writer-B")
    assert token == "writer-B"
    assert atomic._lease_owner(base) == "writer-B"


def test_heartbeat_keeps_lease_fresh(tmp_path):
    base = str(tmp_path)
    atomic.acquire_lease(base, "writer-A")
    _age_lease(base, atomic.DEFAULT_LEASE_TTL + 60)
    atomic.snapshot_heartbeat(base)
    assert atomic._lease_fresh(base, atomic.DEFAULT_LEASE_TTL)
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.acquire_lease(base, "writer-B")


def test_commit_refuses_after_lease_reclaimed(tmp_path):
    """A writer that stalls past the TTL without heartbeats loses the
    lease; when it wakes and tries to publish, snapshot_commit must
    refuse (publishing would interleave with the reclaimer)."""
    base = str(tmp_path)
    live = _member(base, "t1")
    token = atomic.snapshot_begin(base, [live], writer_id="slow-writer")
    # reclaimer takes over
    lease = os.path.join(base, atomic.SNAPSHOT_LEASE)
    with open(lease, "w") as f:
        f.write("reclaiming-writer\n")
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.snapshot_commit(base, writer_id=token)
    # pending marker untouched by the refused commit
    assert os.path.exists(os.path.join(base, atomic.SNAPSHOT_PENDING))


def test_tokenless_commit_still_works(tmp_path):
    """Back-compat: callers that never pass writer_id (single-process
    flows, older tests) keep working; the lease is still released."""
    base = str(tmp_path)
    live = _member(base, "t1")
    atomic.snapshot_begin(base, [live])
    atomic.snapshot_commit(base)
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))
    assert os.path.isdir(os.path.join(live, "d=2024-01-01"))


def test_ownership_verified_release_preserves_foreign_lease(tmp_path):
    """ADVICE r7: release must remove only the caller's OWN lease — a
    slow healer finishing after a mid-heal stale reclaim must not
    delete the new writer's live lease."""
    base = str(tmp_path)
    atomic.acquire_lease(base, "writer-NEW")
    # a stale former owner tries to release with its old token
    assert atomic.release_lease(base, owner="writer-OLD") is False
    assert atomic._lease_owner(base) == "writer-NEW"
    # the heartbeat mtime survives the put-back (freshness preserved)
    assert atomic._lease_fresh(base, atomic.DEFAULT_LEASE_TTL)
    # the real owner's release succeeds
    assert atomic.release_lease(base, owner="writer-NEW") is True
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))
    # releasing when no lease exists is a quiet no-op either way
    assert atomic.release_lease(base, owner="writer-NEW") is False
    assert atomic.release_lease(base) is False


def test_heal_holds_lease_for_its_duration(tmp_path):
    """The healer of a crashed writer's snapshot takes OWNERSHIP of
    the lease before the slow roll (not a one-shot staleness check),
    so a concurrent writer cannot acquire mid-heal, and the heal's
    final release is ownership-verified."""
    base = str(tmp_path)
    live = _member(base, "t1", staged_success=False)
    atomic.snapshot_begin(base, [live], writer_id="dead-writer")
    _age_lease(base, atomic.DEFAULT_LEASE_TTL + 60)
    # simulate: between the healer's staleness check and its roll, we
    # can't interleave in-process — instead verify the primitive: the
    # heal replaces the stale lease with a FRESH one it owns, which a
    # concurrent acquire_lease would refuse. Run the real heal and
    # check the end state (markers healed, lease gone).
    assert atomic.heal_snapshot(base) == "rolled_back"
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))
    # and a foreign FRESH lease installed after a reclaim is never
    # deleted by a late ownership-verified release (the mid-heal race
    # distilled to its release step):
    atomic.acquire_lease(base, "writer-NEW")
    assert atomic.release_lease(base, owner="dead-writer") is False
    assert atomic._lease_owner(base) == "writer-NEW"


def test_commit_refuses_when_lease_vanished(tmp_path):
    """ADVICE r7: owner=None at commit used to slip through the
    ownership check — a vanished lease (reclaimed, healed, released)
    must fail as loudly as a reassigned one."""
    base = str(tmp_path)
    live = _member(base, "t1")
    token = atomic.snapshot_begin(base, [live], writer_id="slow-writer")
    os.remove(os.path.join(base, atomic.SNAPSHOT_LEASE))
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.snapshot_commit(base, writer_id=token)


def test_heartbeat_tolerates_missing_lease(tmp_path):
    """ADVICE r7: a reclaimed-away lease must not blow up the
    (background) heartbeat — the loud failure belongs to commit."""
    base = str(tmp_path)
    assert atomic.snapshot_heartbeat(base) is False  # no lease at all
    atomic.acquire_lease(base, "writer-A")
    assert atomic.snapshot_heartbeat(base) is True


def test_heal_releases_lease_when_roll_raises(tmp_path):
    """ADVICE r8: heal_snapshot acquires a heal_token before the roll;
    if the roll raises (staged-without-_SUCCESS contract violation
    under a committed marker) the lease must be released on the way
    out — leaking it would block every writer for a full lease TTL."""
    base = str(tmp_path)
    live = _member(base, "t1", staged_success=False)
    atomic.snapshot_begin(base, [live], writer_id="crashed-writer")
    # Corrupt state a crash can leave: marker flipped to COMMITTED but
    # a member staged without _SUCCESS (snapshot_commit itself refuses
    # this, so flip manually).
    os.replace(
        os.path.join(base, atomic.SNAPSHOT_PENDING),
        os.path.join(base, atomic.SNAPSHOT_COMMIT),
    )
    _age_lease(base, atomic.DEFAULT_LEASE_TTL + 60)
    with pytest.raises(RuntimeError, match="despite the committed"):
        atomic.heal_snapshot(base)
    # The failure exit released the heal lease: an operator can retry
    # (or a writer can heal) immediately instead of waiting out the TTL.
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))


def test_heal_releases_lease_when_markers_vanish_mid_heal(tmp_path, monkeypatch):
    """ADVICE r8: a concurrent healer finishing between heal's marker
    check and its branch dispatch leaves this healer holding a lease
    with nothing to do — it must return None AND release the lease."""
    base = str(tmp_path)
    live = _member(base, "t1")
    atomic.snapshot_begin(base, [live], writer_id="crashed-writer")
    _age_lease(base, atomic.DEFAULT_LEASE_TTL + 60)
    real_acquire = atomic.acquire_lease
    def racing_acquire(b, writer_id=None, ttl=atomic.DEFAULT_LEASE_TTL):
        token = real_acquire(b, writer_id, ttl)
        # Simulate the concurrent healer completing its rollback inside
        # the window after this healer's marker check.
        pending = os.path.join(b, atomic.SNAPSHOT_PENDING)
        if os.path.exists(pending):
            os.remove(pending)
        return token
    monkeypatch.setattr(atomic, "acquire_lease", racing_acquire)
    assert atomic.heal_snapshot(base) is None
    assert not os.path.exists(os.path.join(base, atomic.SNAPSHOT_LEASE))
    # Store is immediately writable again.
    atomic.snapshot_begin(base, [live], writer_id="writer-next")
