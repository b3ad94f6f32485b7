"""Injectable filesystem seam for the rename-based maintenance paths
(VERDICT r12 #3).

`sinks/atomic.py` and `streaming/compaction.py` build their crash
safety on three POSIX guarantees: atomic `rename(2)`/`replace` (the
commit point), `O_CREAT|O_EXCL` (the lease test-and-set), and
list-after-write consistency (heal scans see every committed dir).
Local disk and HDFS-like mounts provide all three; the object stores a
100 TB lake actually lives on (S3/GCS-style) provide NONE of them —
directory "rename" is a non-atomic copy, exclusive-create is absent or
conditional-PUT-shaped, and listings may trail writes.

Running the rename-based protocol on such a store would not fail
loudly — it would corrupt quietly (a half-"renamed" fold dir is
visible to readers mid-copy). So the file ops are routed through this
seam and every protocol entry point calls :func:`require` first: a
filesystem that cannot declare the needed capabilities raises the
named :class:`FilesystemCapabilityError` BEFORE any mutation, turning
the silent-corruption mode into a refusal.

Object-store variant — IMPLEMENTED for the compaction tick
(`streaming/compaction.py`, ``commit_mode="manifest"``): the fold is
written under its final unique name (no staging rename), visibility
flows ONLY from the atomically-swapped `_folded.json` state file
(conditional PUT / generation-precondition on a real store — the
:data:`ATOMIC_FILE_PUT` capability), the read path trusts the state
file alone, and heal DELETES unrecorded fold dirs instead of adopting
them (the state swap is the commit, so an unrecorded dir is an
uncommitted write whose sources were never deleted). The mode is
recorded in the lake's state and enforced per lake. `sinks/atomic.py`
remains rename-bound (its multi-table swap semantics genuinely need
rename; on an object store use a real table format instead, per
COVERAGE.md).

Durability note (ADVICE r13 input): POSIX `rename` is atomic but not
durable — a power cut can forget a committed rename unless the file
contents AND the parent directory entry are fsynced. `PosixFS`
exposes `fsync_file` / `fsync_dir`; the compaction tick syncs the
fold manifest and the lake dir around its commit point.
"""

from __future__ import annotations

import os
import shutil

#: Capabilities the rename-based protocol needs. A filesystem must
#: declare ALL of these or `require` refuses with the named error.
ATOMIC_RENAME = "atomic_rename"
EXCLUSIVE_CREATE = "exclusive_create"
CONSISTENT_LISTING = "consistent_listing"
#: Atomic whole-object put/overwrite of a SINGLE small file — the one
#: primitive every real object store has (S3 conditional PUT / GCS
#: generation precondition), and all the manifest-commit compaction
#: mode needs: visibility flows from one atomically-swapped state
#: file, never from directory renames or listings.
ATOMIC_FILE_PUT = "atomic_file_put"
REQUIRED_CAPABILITIES = frozenset(
    {ATOMIC_RENAME, EXCLUSIVE_CREATE, CONSISTENT_LISTING}
)
#: What `streaming/compaction.py` needs per commit_mode.
RENAME_COMMIT_CAPS = REQUIRED_CAPABILITIES
MANIFEST_COMMIT_CAPS = frozenset({ATOMIC_FILE_PUT})


class FilesystemCapabilityError(RuntimeError):
    """The bound filesystem cannot host the rename-based protocol."""


def require(fs: "PosixFS", needed: frozenset = REQUIRED_CAPABILITIES) -> None:
    """Executable capability contract: fail loudly BEFORE any mutation
    when ``fs`` lacks a required capability (e.g. an object-store
    binding without atomic rename)."""
    missing = needed - fs.capabilities()
    if missing:
        raise FilesystemCapabilityError(
            f"{type(fs).__name__} lacks required filesystem capabilities "
            f"{sorted(missing)} — the rename-based maintenance protocol "
            "would corrupt silently here. Use a POSIX/HDFS-backed path, "
            "or — for streaming-sink compaction on an object store — the "
            "manifest-commit mode (fold_closed_batches(..., "
            'commit_mode="manifest"), needs only atomic_file_put).'
        )


class PosixFS:
    """Local/POSIX binding: 1:1 delegation to os/shutil, so the
    audited race semantics in `sinks/atomic.py` are unchanged. Every
    method mirrors its os-level namesake's contract exactly."""

    def capabilities(self) -> frozenset:
        return REQUIRED_CAPABILITIES | {ATOMIC_FILE_PUT}

    # --- namespace ---
    def listdir(self, path: str) -> list:
        return os.listdir(path)

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    # --- atomic commit primitives ---
    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def link(self, src: str, dst: str) -> None:
        os.link(src, dst)

    def create_exclusive(self, path: str, content: str) -> None:
        """O_CREAT|O_EXCL test-and-set; raises FileExistsError for the
        loser exactly as the raw syscall does."""
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(content)

    # --- plain I/O ---
    def open_read(self, path: str):
        return open(path)

    def open_write(self, path: str):
        return open(path, "w")

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        shutil.rmtree(path, ignore_errors=ignore_errors)

    # --- metadata ---
    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def utime(self, path: str) -> None:
        os.utime(path)

    # --- durability ---
    def fsync_file(self, path: str) -> None:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def fsync_dir(self, path: str) -> None:
        fd = os.open(path, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


#: The default binding. `sinks/atomic.py` binds module-globally
#: (monkeypatchable in tests); `streaming/compaction.py` takes an
#: ``fs=`` kwarg on every public function.
POSIX = PosixFS()
