"""The injectable filesystem seam under the rename-based maintenance
paths (VERDICT r12 #3): a binding that cannot declare atomic rename /
exclusive create / consistent listing is refused LOUDLY with the named
error BEFORE any mutation, on every protocol entry point. No Spark
needed — the contract fires ahead of all file work."""

import pytest

from purpleair_data_logger_spark import fsio
from purpleair_data_logger_spark.sinks import atomic
from purpleair_data_logger_spark.streaming import compaction as C


class ObjectStoreLikeFS(fsio.PosixFS):
    """An object-store-shaped binding: listing works, but rename is a
    non-atomic copy and exclusive create is absent — exactly the
    profile that would corrupt the rename protocol silently."""

    def capabilities(self):
        return frozenset({fsio.CONSISTENT_LISTING})


def test_require_names_missing_capabilities():
    with pytest.raises(fsio.FilesystemCapabilityError) as e:
        fsio.require(ObjectStoreLikeFS())
    msg = str(e.value)
    assert fsio.ATOMIC_RENAME in msg and fsio.EXCLUSIVE_CREATE in msg
    assert "manifest" in msg  # points at the implemented variant
    fsio.require(fsio.POSIX)  # the POSIX binding passes


def test_manifest_commit_capability_sets():
    """The per-mode capability split: rename mode needs the full POSIX
    triple, manifest mode ONLY atomic single-file put — a put-only
    binding passes the manifest contract and is refused by the rename
    one; POSIX passes both."""

    class PutOnlyFS(fsio.PosixFS):
        def capabilities(self):
            return frozenset({fsio.ATOMIC_FILE_PUT})

    fsio.require(PutOnlyFS(), fsio.MANIFEST_COMMIT_CAPS)
    with pytest.raises(fsio.FilesystemCapabilityError):
        fsio.require(PutOnlyFS(), fsio.RENAME_COMMIT_CAPS)
    fsio.require(fsio.POSIX, fsio.RENAME_COMMIT_CAPS)
    fsio.require(fsio.POSIX, fsio.MANIFEST_COMMIT_CAPS)
    # rename-mode compaction on a put-only binding refuses up front
    with pytest.raises(fsio.FilesystemCapabilityError):
        C.fold_closed_batches(
            None, "/nonexistent/s", "/nonexistent/l",
            fs=PutOnlyFS(), commit_mode="rename",
        )


def test_compaction_entry_points_refuse_object_store(tmp_path):
    """Every MUTATING entry point refuses a capability-less binding
    before touching anything. `read_stream_output` is deliberately
    absent: reads are read-only and exempt from the contract (both
    crash shapes leave reads correct without healing — code-review
    r13)."""
    bad = ObjectStoreLikeFS()
    with pytest.raises(fsio.FilesystemCapabilityError):
        C.heal_lake(str(tmp_path / "lake"), fs=bad)
    with pytest.raises(fsio.FilesystemCapabilityError):
        C.fold_closed_batches(None, str(tmp_path / "s"), str(tmp_path / "l"), fs=bad)
    with pytest.raises(fsio.FilesystemCapabilityError):
        C.vacuum_lake(str(tmp_path / "lake"), fs=bad)


def test_atomic_entry_points_refuse_object_store(tmp_path, monkeypatch):
    monkeypatch.setattr(atomic, "FS", ObjectStoreLikeFS())
    base = str(tmp_path / "store")
    with pytest.raises(fsio.FilesystemCapabilityError):
        atomic.acquire_lease(base)
    with pytest.raises(fsio.FilesystemCapabilityError):
        atomic.commit(str(tmp_path / "t1"))
    with pytest.raises(fsio.FilesystemCapabilityError):
        atomic.heal(str(tmp_path / "t1"))
    with pytest.raises(fsio.FilesystemCapabilityError):
        atomic.heal_snapshot(base)
    with pytest.raises(fsio.FilesystemCapabilityError):
        atomic.gc_orphans(base)
    assert not (tmp_path / "store").exists()  # refused BEFORE mutation


def test_atomic_protocol_runs_through_injected_fs(tmp_path, monkeypatch):
    """A tracing subclass proves the lease protocol's syscalls all
    route through the seam (no hidden os.* bypass on the audited
    paths), with semantics unchanged."""
    calls = []

    class TracingFS(fsio.PosixFS):
        def __getattribute__(self, name):
            attr = super().__getattribute__(name)
            if callable(attr) and not name.startswith("_") and name != "capabilities":
                def wrap(*a, **k):
                    calls.append(name)
                    return attr(*a, **k)
                return wrap
            return attr

    monkeypatch.setattr(atomic, "FS", TracingFS())
    base = str(tmp_path / "store")
    token = atomic.acquire_lease(base)
    with pytest.raises(atomic.SnapshotLeaseHeld):
        atomic.acquire_lease(base)  # O_EXCL loser, via the seam
    assert atomic.release_lease(base, owner=token)
    assert {"makedirs", "create_exclusive", "rename", "open_read"} <= set(calls)


def test_posixfs_fsync_and_exclusive_create(tmp_path):
    fs = fsio.PosixFS()
    p = str(tmp_path / "f.txt")
    fs.create_exclusive(p, "x\n")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, "y\n")
    fs.fsync_file(p)
    fs.fsync_dir(str(tmp_path))
    with fs.open_read(p) as f:
        assert f.read() == "x\n"
