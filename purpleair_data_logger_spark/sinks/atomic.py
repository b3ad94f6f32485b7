"""Crash-safe rewrite protocol for plain-parquet tables.

Plain parquet has no transaction log, so destructive rewrites
(`SensorTableStore.upsert_wide`, `.compact`) need their own commit
protocol; the atomicity unit is POSIX rename(2). Protocol per table:

1. The job writes the replacement partitions to ``<live>__staging``
   (a sibling dir, invisible to readers of ``<live>``). Spark's
   ``_SUCCESS`` marker at the staging root is the COMMIT RECORD: its
   presence means the replacement data is complete.
2. `commit` swaps each staged date-partition dir into the live root:
   rename live partition aside (``__retired``), rename staged
   partition in, delete the retired copy. Untouched live partitions
   are never renamed — work stays O(touched partitions).
3. `heal` makes any crash point recoverable: with ``_SUCCESS``
   present it rolls FORWARD (re-runs the idempotent commit loop);
   without it, it rolls BACKWARD (drops the incomplete staging,
   restores any retired dir). A reader that heals first therefore
   always sees either the complete old state or the complete new
   state of every partition — never a lost or half-written one.

Single-writer-per-table is assumed (the reference's loggers are
single-writer too); concurrent writers would need a lock or a real
table format (Delta/Iceberg) — documented in COVERAGE.md.

Multi-table snapshots (VERDICT r5 #5): the reference commits all nine
per-reading INSERTs in ONE transaction
(`PurpleAirPSQLDataLogger.py:347` — `self.__db_conn.commit()` after
the nine statements), so a reader never sees reading R in
``pm2_5_fields`` but missing from ``environmental_fields``. Per-table
staging alone can't give that: a crash between two tables' commits
breaks the J1 reconstruction join's PK-completeness invariant
mid-publish. The cross-table layer adds one intent marker at the
store root:

1. `snapshot_begin` writes ``_SNAPSHOT_PENDING`` (listing the member
   tables) BEFORE any staging write. While it exists, every member
   staging — even a finished one with ``_SUCCESS`` — is provisional.
2. All member tables stage as usual.
3. `snapshot_commit` verifies every member staged completely, then
   atomically renames the marker to ``_SNAPSHOT_COMMIT`` — THE
   all-or-none flip (one rename(2)) — then runs each table's
   `commit`, then retracts the marker.
4. `heal_snapshot` recovers any crash point: ``_SNAPSHOT_COMMIT``
   present → roll every member FORWARD; ``_SNAPSHOT_PENDING``
   present → roll every member BACK (drop staging, _SUCCESS or not).
   A reader that heals first therefore sees all members wholly old
   or all wholly new. Tables NOT inside a snapshot keep the
   single-table `heal` semantics unchanged.
"""

from __future__ import annotations

import os
import shutil

STAGING_SUFFIX = "__staging"
RETIRED_SUFFIX = "__retired"
SUCCESS_FILE = "_SUCCESS"
SNAPSHOT_PENDING = "_SNAPSHOT_PENDING"
SNAPSHOT_COMMIT = "_SNAPSHOT_COMMIT"


def staging_path(live: str) -> str:
    return live + STAGING_SUFFIX


def is_committed(staged: str) -> bool:
    """The staging write finished: Spark wrote its _SUCCESS marker."""
    return os.path.exists(os.path.join(staged, SUCCESS_FILE))


def _partition_entries(root: str) -> list[str]:
    return sorted(
        e
        for e in os.listdir(root)
        if "=" in e and os.path.isdir(os.path.join(root, e))
    )


def commit(live: str) -> None:
    """Swap a committed staging dir's partitions into the live root.

    Idempotent and re-entrant: `heal` re-runs it verbatim after a
    crash at any point, including mid-partition (where a retired dir
    may exist with or without its replacement already in place).
    """
    staged = staging_path(live)
    if not is_committed(staged):
        raise RuntimeError(
            f"refusing to commit {staged}: no {SUCCESS_FILE} commit record "
            "(the staging write did not finish)"
        )
    os.makedirs(live, exist_ok=True)
    for entry in _partition_entries(staged):
        live_e = os.path.join(live, entry)
        staged_e = os.path.join(staged, entry)
        retired_e = live_e + RETIRED_SUFFIX
        if os.path.isdir(live_e):
            if os.path.isdir(retired_e):  # double-crash leftover
                shutil.rmtree(retired_e)
            os.rename(live_e, retired_e)
        os.rename(staged_e, live_e)
        if os.path.isdir(retired_e):
            shutil.rmtree(retired_e)
    # Commit complete: retract the commit record, then the empty husk.
    os.remove(os.path.join(staged, SUCCESS_FILE))
    shutil.rmtree(staged)


def heal(live: str) -> str | None:
    """Recover an interrupted rewrite; returns the action taken.

    * staging dir with ``_SUCCESS`` → roll forward (finish `commit`);
    * staging dir without it → roll back (drop the partial staging,
      restore any retired partition the old state still owns).
    """
    staged = staging_path(live)
    if os.path.isdir(staged):
        if is_committed(staged):
            commit(live)
            return "rolled_forward"
        shutil.rmtree(staged)
        _restore_retired(live)
        return "rolled_back"
    return _restore_retired(live)


def snapshot_begin(base: str, lives: list[str]) -> None:
    """Declare a multi-table rewrite: every path in ``lives`` (given
    relative to ``base`` or absolute under it) is provisional until
    `snapshot_commit` flips the marker. Refuses to nest."""
    pending = os.path.join(base, SNAPSHOT_PENDING)
    committed = os.path.join(base, SNAPSHOT_COMMIT)
    if os.path.exists(pending) or os.path.exists(committed):
        raise RuntimeError(
            f"snapshot already in progress under {base}; heal_snapshot first"
        )
    os.makedirs(base, exist_ok=True)
    tmp = pending + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(os.path.relpath(l, base) for l in lives) + "\n")
    os.replace(tmp, pending)


def snapshot_commit(base: str) -> None:
    """All-or-none publish of every member table's staged rewrite.

    The single atomicity point is the PENDING→COMMIT marker rename:
    before it, `heal_snapshot` rolls every member back; after it,
    forward. Idempotent per member (`commit` is re-entrant), so
    `heal_snapshot` re-runs the loop verbatim after a crash at any
    point between two tables' commits — the window the per-table
    protocol alone leaves open.
    """
    pending = os.path.join(base, SNAPSHOT_PENDING)
    if not os.path.exists(pending):
        raise RuntimeError(f"no {SNAPSHOT_PENDING} under {base}")
    lives = _snapshot_members(base, pending)
    not_ready = [l for l in lives if not is_committed(staging_path(l))]
    if not_ready:
        raise RuntimeError(
            f"refusing snapshot commit: incomplete staging for {not_ready}"
        )
    committed = os.path.join(base, SNAPSHOT_COMMIT)
    os.replace(pending, committed)  # THE all-or-none flip
    for l in lives:
        commit(l)
    os.remove(committed)


def heal_snapshot(base: str) -> str | None:
    """Recover an interrupted multi-table snapshot; returns the action.

    * ``_SNAPSHOT_COMMIT`` present → the snapshot committed: finish
      every member's swap (skipping members already swapped).
    * ``_SNAPSHOT_PENDING`` present → it did not: drop every member's
      staging — a member's own ``_SUCCESS`` does NOT make it
      publishable, the SNAPSHOT never committed — and restore any
      retired dirs.
    * neither → nothing to do (single-table `heal` handles the rest).
    """
    committed = os.path.join(base, SNAPSHOT_COMMIT)
    pending = os.path.join(base, SNAPSHOT_PENDING)
    if os.path.exists(committed):
        for l in _snapshot_members(base, committed):
            staged = staging_path(l)
            if os.path.isdir(staged):
                if is_committed(staged):
                    commit(l)
                elif _partition_entries(staged):
                    raise RuntimeError(
                        f"snapshot member {l} has partitions staged but no "
                        f"{SUCCESS_FILE} despite the committed snapshot marker"
                    )
                else:  # husk: crash between _SUCCESS retraction and rmtree
                    shutil.rmtree(staged)
            else:
                _restore_retired(l)
        os.remove(committed)
        return "rolled_forward"
    if os.path.exists(pending):
        for l in _snapshot_members(base, pending):
            staged = staging_path(l)
            if os.path.isdir(staged):
                shutil.rmtree(staged)
            _restore_retired(l)
        os.remove(pending)
        return "rolled_back"
    return None


def _snapshot_members(base: str, marker: str) -> list[str]:
    with open(marker) as f:
        rels = [line.strip() for line in f if line.strip()]
    return [os.path.join(base, r) for r in rels]


def _restore_retired(live: str) -> str | None:
    """Put back any partition that was renamed aside but whose
    replacement never landed (defensive: `commit` normally removes
    these itself)."""
    if not os.path.isdir(live):
        return None
    action = None
    for entry in sorted(os.listdir(live)):
        if not entry.endswith(RETIRED_SUFFIX):
            continue
        retired_e = os.path.join(live, entry)
        live_e = retired_e[: -len(RETIRED_SUFFIX)]
        if os.path.isdir(live_e):
            shutil.rmtree(retired_e)
        else:
            os.rename(retired_e, live_e)
        action = "restored_retired"
    return action
