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
"""

from __future__ import annotations

import os
import shutil

STAGING_SUFFIX = "__staging"
RETIRED_SUFFIX = "__retired"
SUCCESS_FILE = "_SUCCESS"


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
