"""Small-files compaction for Structured Streaming parquet sinks
(VERDICT r11 #5).

A streaming parquet sink appends one file per micro-batch per
partition — at the reference's 65 s cadence that is ~1.3 k files per
day per directory (`streaming/pack.py`, `streaming/encode.py` sinks),
which at 100 TB turns every downstream scan into a listing storm. The
batch store already has crash-safe compaction (`sinks/tables.py::
compact_older_than`), but nothing ticked over streaming outputs.

The sink directory is NOT rewritable in place: Spark's FileStreamSink
owns a ``_spark_metadata`` transaction log there, readers that trust
the log would miss rewritten files, and the running stream keeps
appending. So the tick uses the bronze-buffer → compacted-lake shape
instead:

- the sink dir stays a WRITE-ONLY ingestion buffer owned by the
  stream (its checkpoint + metadata log are never touched);
- `fold_closed_batches` moves CLOSED files — committed to the sink
  log, and never attributed to the newest ``keep_last_batches`` log
  entries — into a compacted parquet lake via a staged-directory
  rename (one atomic rename per fold, the `sinks/atomic` discipline),
  then deletes the folded buffer files;
- `read_stream_output` is the read surface: lake ∪ the not-yet-folded
  buffer tail. In-flight files (present on disk but not yet in the
  sink log) are invisible to the fold by construction and excluded
  from reads exactly as the sink log itself excludes them.

State is tracked per FILE PATH, not per batch id (code-review r12):
Spark compacts its own sink log (``fileSink.log.compactInterval``,
default 10) and deletes superseded plain entries after a delay, after
which a ``.compact`` entry re-lists EVERY historical path under one
batch id — batch-id bookkeeping would misattribute already-folded
files and read deleted paths. Folded paths live in the lake's
``_folded.json`` AND in a ``_FOLDED_SOURCES.json`` manifest written
INSIDE each fold dir before its atomic rename, so a crash between the
rename-commit and the watermark write heals forward completely: the
next tick re-records the fold from its manifest and finishes deleting
its source files (underscore-prefixed files are invisible to parquet
readers by convention).

Crash-window hardening (ADVICE r12, closed r13):

- fold names come from the next FREE ``fold_NNNNNN`` index on disk —
  max over existing fold dirs (ours, torn, or foreign squatters),
  staging leftovers, and recorded state — never ``len(folds)``, so a
  torn fold dir that `heal_lake` skipped can no longer wedge every
  subsequent tick on a rename collision;
- the fold manifest and the staging dir are fsynced before the
  rename, and the lake dir after it, so a power cut cannot commit the
  rename while forgetting the manifest the heal path depends on;
- each deleting tick also sweeps leftover source files of ALREADY
  recorded folds (a crash between `_save_folded` and the delete loop
  used to leak them forever — reads stayed correct, but the buffer
  regrew the small-files problem). The sweep runs only under
  ``delete_folded=True``, so keep-sources callers are untouched.

Filesystem binding (VERDICT r12 #3): every file op goes through the
`fsio` seam and each MUTATING entry point (`fold_closed_batches`,
`heal_lake`, `vacuum_lake`) runs the capability check for the lake's
COMMIT MODE (recorded in the state file, pinned per lake at the first
tick, BEFORE the first fold can crash); `read_stream_output` is
read-only and exempt:

* ``rename`` (default, POSIX/HDFS) — staged write + atomic dir rename
  as the commit point; requires atomic rename / O_EXCL / consistent
  listing, refused loudly (`FilesystemCapabilityError`) otherwise;
* ``manifest`` (object stores) — the fold is written under its FINAL
  unique name and the atomic swap of ``_folded.json`` IS the commit
  (conditional PUT on a real store); readers trust the state file
  alone, heal DELETES unrecorded fold dirs (uncommitted writes whose
  sources were never deleted), and only `fsio.ATOMIC_FILE_PUT` is
  required — no dir rename, no O_EXCL, no listing-consistency on the
  read path.

(Spark itself writes the fold parquet via its own JVM path — the seam
governs the protocol's metadata and commit ops, which is where the
atomicity assumptions live.)

CONCURRENCY CONTRACT: one maintenance owner per lake. The fold tick
and heal act on a loaded-then-acted-on state snapshot, so two
overlapping ticks could GC each other's in-progress work (in manifest
mode heal deletes what it believes uncommitted). Readers are safe by
construction — `read_stream_output` never heals or mutates — so the
only serialization the protocol needs is what the policy scheduler
already provides: one `run_policies` task per store. Crash-kill of
the single owner at ANY mutation point is recovered by the next
tick's heal (pinned by the exhaustive crash sweep in
test_storage_streaming).

Scale shape: each tick's cost is O(files folded) — the buffer is
bounded by fold cadence × micro-batch rate, the lake grows by one
O(target_files) fold dir per tick, and nothing ever re-reads or
re-writes previously folded data (the `neardup_incremental_batch`
discipline applied to sink maintenance).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from .. import fsio

_FOLDED_STATE = "_folded.json"
_FOLD_MANIFEST = "_FOLDED_SOURCES.json"
_STAGING_PREFIX = "_staging_fold_"
_FOLD_NAME_RE = re.compile(r"fold_(\d{6,})$")


def _read_log_entries(log_file: str, fs: fsio.PosixFS = fsio.POSIX) -> list[str]:
    """Data-file paths listed by one sink-log file (v1 JSON lines)."""
    out: list[str] = []
    with fs.open_read(log_file) as fh:
        for line in fh:
            line = line.strip()
            if not line or line == "v1":
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("action") not in (None, "add"):
                continue
            path = rec.get("path", "")
            if path.startswith("file:"):
                path = path[len("file:") :]
                while path.startswith("//"):
                    path = path[1:]
            if path:
                out.append(path)
    return out


def _sink_log(sink_path: str, fs: fsio.PosixFS = fsio.POSIX) -> dict[int, tuple[bool, str]]:
    """batch id → (is_compact, log-file path), one entry per batch id
    (a ``.compact`` supersedes a plain file of the same id)."""
    meta = os.path.join(sink_path, "_spark_metadata")
    if not fs.isdir(meta):
        return {}
    by_id: dict[int, tuple[bool, str]] = {}
    for name in fs.listdir(meta):
        if name.startswith(".") or name.endswith(".crc"):
            continue
        is_compact = name.endswith(".compact")
        base = name[: -len(".compact")] if is_compact else name
        try:
            bid = int(base)
        except ValueError:
            continue
        prev = by_id.get(bid)
        if prev is None or (is_compact and not prev[0]):
            by_id[bid] = (is_compact, os.path.join(meta, name))
    return by_id


def _sink_committed_files(sink_path: str, fs: fsio.PosixFS = fsio.POSIX) -> list[str]:
    """The sink log's authoritative CURRENT file set: every add listed
    by the latest ``.compact`` (which replays all history) plus all
    later plain entries — correct even after Spark deletes superseded
    plain log files. Order is log order; duplicates collapse."""
    log = _sink_log(sink_path, fs=fs)
    if not log:
        return []
    compacts = [b for b, (c, _) in log.items() if c]
    start = max(compacts) if compacts else min(log)
    seen: set[str] = set()
    out: list[str] = []
    for bid in sorted(b for b in log if b >= start):
        for p in _read_log_entries(log[bid][1], fs=fs):
            if p not in seen:
                seen.add(p)
                out.append(p)
    return out


def _hot_tail_files(
    sink_path: str, keep_last_batches: int, fs: fsio.PosixFS = fsio.POSIX
) -> set[str]:
    """Files attributed to the newest ``keep_last_batches`` log
    entries — the conservative hot tail the fold never touches. A
    ``.compact`` entry in the tail re-lists history, which only makes
    the tail LARGER (under-folding for one tick), never smaller."""
    log = _sink_log(sink_path, fs=fs)
    hot: set[str] = set()
    for bid in sorted(log)[-keep_last_batches:] if log else []:
        hot.update(_read_log_entries(log[bid][1], fs=fs))
    return hot


def _load_folded(lake_path: str, fs: fsio.PosixFS = fsio.POSIX) -> dict:
    p = os.path.join(lake_path, _FOLDED_STATE)
    if not fs.exists(p):
        return {"files": [], "folds": [], "pending_delete": [],
                "commit_mode": "rename"}
    with fs.open_read(p) as fh:
        state = json.load(fh)
    state.setdefault("files", [])
    state.setdefault("folds", [])
    state.setdefault("pending_delete", [])
    state.setdefault("commit_mode", "rename")
    return state


def _has_state(lake_path: str, fs: fsio.PosixFS) -> bool:
    return fs.exists(os.path.join(lake_path, _FOLDED_STATE))


def _resolve_mode(
    state: dict, commit_mode: str | None, has_state: bool
) -> str:
    """Per-lake commit-mode pin: the mode is recorded in the state
    file at the first save and every later caller must match — mixing
    rename-commit and manifest-commit semantics on one lake would
    make heal adopt another mode's garbage (or GC its commits)."""
    recorded = state["commit_mode"] if has_state else None
    if commit_mode is None:
        return recorded or "rename"
    if commit_mode not in ("rename", "manifest"):
        raise ValueError(f"unknown commit_mode {commit_mode!r}")
    if recorded is not None and recorded != commit_mode:
        raise ValueError(
            f"lake was committed with commit_mode={recorded!r}; "
            f"refusing {commit_mode!r} (one mode per lake)"
        )
    return commit_mode


def _mode_caps(mode: str) -> frozenset:
    return (
        fsio.RENAME_COMMIT_CAPS
        if mode == "rename"
        else fsio.MANIFEST_COMMIT_CAPS
    )


def _save_folded(lake_path: str, state: dict, fs: fsio.PosixFS = fsio.POSIX) -> None:
    fs.makedirs(lake_path, exist_ok=True)
    tmp = os.path.join(lake_path, _FOLDED_STATE + ".tmp")
    with fs.open_write(tmp) as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    fs.fsync_file(tmp)
    fs.replace(tmp, os.path.join(lake_path, _FOLDED_STATE))
    fs.fsync_dir(lake_path)


def _next_fold_index(lake_path: str, state: dict, fs: fsio.PosixFS = fsio.POSIX) -> int:
    """Next FREE fold index: one past the max over every fold-shaped
    name on disk (committed, torn, foreign squatter, or abandoned
    staging) and every recorded fold. ``len(folds)`` was wrong twice
    over (ADVICE r12): a torn fold dir heal_lake skips isn't in state,
    and a foreign ``fold_000007`` squatter isn't ours — either made
    the tick's rename collide forever."""
    top = -1
    if fs.isdir(lake_path):
        for name in fs.listdir(lake_path):
            if name.startswith(_STAGING_PREFIX):
                name = name[len(_STAGING_PREFIX) :]
            m = _FOLD_NAME_RE.match(name)
            if m:
                top = max(top, int(m.group(1)))
    for f in state["folds"]:
        m = _FOLD_NAME_RE.match(f["dir"])
        if m:
            top = max(top, int(m.group(1)))
    return top + 1


def heal_lake(
    lake_path: str,
    *,
    fs: fsio.PosixFS = fsio.POSIX,
    commit_mode: str | None = None,
) -> None:
    """Crash recovery, per the lake's recorded commit mode
    (``commit_mode`` is only a hint for a lake whose FIRST fold
    crashed before any state file existed; a recorded mode wins).

    ``rename`` mode (the commit point is the staging→final dir
    rename): remove abandoned staging dirs; re-record any fold dir
    that committed before its watermark write landed, from the
    manifest the fold carries INSIDE itself — and finish deleting that
    fold's source files (the crash-window leak, code-review r12).
    Fold-named dirs without a readable manifest are skipped, never a
    crash (`_next_fold_index` keeps them from wedging later ticks).

    ``manifest`` mode (the commit point is the atomic state-file
    swap): an unrecorded fold dir is an UNCOMMITTED write — its source
    files were never deleted and the write may be torn — so heal
    DELETES it; the next tick refolds the same sources under a fresh
    name. No adoption, no dir renames, no listing-consistency
    dependence on the read path (readers trust the state file alone).

    Healing is an OWNER-side action (the fold ticker, or an operator
    running this function): it deletes and re-records. Readers never
    heal — both crash shapes leave reads correct by construction (see
    `read_stream_output`) — so heal never races a reader; the single
    maintenance owner is serialized with itself.
    """
    state = _load_folded(lake_path, fs=fs)
    mode = _resolve_mode(state, commit_mode, _has_state(lake_path, fs))
    fsio.require(fs, _mode_caps(mode))  # refuse BEFORE any mutation
    if not fs.isdir(lake_path):
        return
    _heal_into(lake_path, state, mode, fs)


def _heal_into(lake_path: str, state: dict, mode: str, fs: fsio.PosixFS) -> dict:
    """`heal_lake`'s body over an already-loaded state dict, so the
    fold tick loads the state file and lists the lake ONCE per tick
    (each is a remote round-trip on an object store). Mutates and
    persists ``state`` if anything changed; returns it either way."""
    known = {f["dir"] for f in state["folds"]}
    folded = set(state["files"])
    changed = False
    for name in sorted(fs.listdir(lake_path)):
        full = os.path.join(lake_path, name)
        if name.startswith(_STAGING_PREFIX):
            fs.rmtree(full, ignore_errors=True)
            continue
        if not (name.startswith("fold_") and fs.isdir(full)):
            continue
        if name in known:
            continue
        if mode == "manifest":
            # an unrecorded dir with OUR naming shape is an uncommitted
            # write (the state swap never happened) — roll it back; the
            # sources were never deleted, the next tick refolds them.
            # Foreign fold_* dirs outside the fold_NNNNNN shape are
            # left alone (the protocol never writes such names).
            if _FOLD_NAME_RE.match(name):
                fs.rmtree(full, ignore_errors=True)
            continue
        manifest = os.path.join(full, _FOLD_MANIFEST)
        try:
            with fs.open_read(manifest) as fh:
                sources = json.load(fh)
        except (OSError, ValueError):
            continue  # not one of ours (or torn) — leave it alone
        state["folds"].append({"dir": name, "n_files": len(sources)})
        folded.update(sources)
        for p in sources:  # finish the interrupted source deletion
            try:
                fs.remove(p)
            except OSError:
                pass
        changed = True
    if changed:
        state["files"] = sorted(folded)
        _save_folded(lake_path, state, fs=fs)
    return state


def _sweep_pending_deletes(
    lake_path: str, state: dict, fs: fsio.PosixFS = fsio.POSIX
) -> None:
    """Finish the PREVIOUS tick's interrupted source deletion (ADVICE
    r12: a crash between `_save_folded` and the delete loop leaked the
    folded buffer files permanently — heal_lake only finishes deletion
    for folds it newly re-records). The fold tick records its delete
    intent in ``state['pending_delete']`` BEFORE deleting and clears
    it after, so this sweep is O(one crash window's files), never
    O(every file ever folded). Runs only on deleting ticks; reads
    never delete."""
    if not state["pending_delete"]:
        return
    for p in state["pending_delete"]:
        try:
            fs.remove(p)
        except OSError:
            pass
    state["pending_delete"] = []
    _save_folded(lake_path, state, fs=fs)


def vacuum_lake(lake_path: str, *, fs: fsio.PosixFS = fsio.POSIX) -> int:
    """One-shot retroactive sweep: delete EVERY still-on-disk source
    file recorded as folded (``state['files']``). O(all files ever
    folded) — for manual/periodic cleanup of leaks that predate the
    ``pending_delete`` ledger, not for the per-tick path. Returns the
    number of files removed."""
    state = _load_folded(lake_path, fs=fs)
    fsio.require(
        fs, _mode_caps(_resolve_mode(state, None, _has_state(lake_path, fs)))
    )
    if not fs.isdir(lake_path):
        return 0
    removed = 0
    for p in state["files"]:
        if fs.exists(p):
            try:
                fs.remove(p)
                removed += 1
            except OSError:
                pass
    return removed


def fold_closed_batches(
    spark: SparkSession,
    sink_path: str,
    lake_path: str,
    *,
    keep_last_batches: int = 1,
    target_files: int = 1,
    delete_folded: bool = True,
    fs: fsio.PosixFS = fsio.POSIX,
    commit_mode: str | None = None,
) -> int:
    """One maintenance tick: compact every CLOSED sink file into the
    lake. Closed = committed to the sink's ``_spark_metadata`` log,
    not yet folded, and not attributed to the newest
    ``keep_last_batches`` log entries (the conservative hot tail — the
    log entry is durable, but the stream owner may still be serving
    readers the raw path for its freshest batch). Returns the number
    of FILES folded; 0 is a normal idle tick.

    ``commit_mode`` (pinned per lake at first fold, None = recorded):

    * ``"rename"`` (default) — POSIX/HDFS: staged write, fsync, one
      atomic dir rename as the commit point;
    * ``"manifest"`` — object stores: the fold is written under its
      FINAL unique name, and the atomic swap of the state file IS the
      commit (conditional PUT on a real store — only the
      `fsio.ATOMIC_FILE_PUT` capability is required; no dir rename,
      no O_EXCL, and readers never depend on listings).
    """
    if keep_last_batches < 1:
        raise ValueError(
            f"keep_last_batches must be >= 1 (the in-flight guard), "
            f"got {keep_last_batches}"
        )
    state = _load_folded(lake_path, fs=fs)
    mode = _resolve_mode(state, commit_mode, _has_state(lake_path, fs))
    fsio.require(fs, _mode_caps(mode))
    state["commit_mode"] = mode
    if not _has_state(lake_path, fs):
        # pin the mode BEFORE any fold can crash: a first fold dying
        # pre-commit must not leave a mode-less lake that a later
        # hint-less heal would recover under the WRONG mode (rename
        # heal adopts what manifest heal must roll back)
        _save_folded(lake_path, state, fs=fs)
    if fs.isdir(lake_path):
        state = _heal_into(lake_path, state, mode, fs)
    committed = _sink_committed_files(sink_path, fs=fs)
    if delete_folded:
        _sweep_pending_deletes(lake_path, state, fs=fs)
    if not committed:
        return 0
    folded = set(state["files"])
    hot = _hot_tail_files(sink_path, keep_last_batches, fs=fs)
    files = [
        p
        for p in committed
        if p not in folded and p not in hot and fs.exists(p)
    ]
    if not files:
        return 0
    fold_name = f"fold_{_next_fold_index(lake_path, state, fs=fs):06d}"
    final = os.path.join(lake_path, fold_name)
    if mode == "rename":
        staging = os.path.join(lake_path, _STAGING_PREFIX + fold_name)
        fs.rmtree(staging, ignore_errors=True)
    else:
        staging = final  # manifest mode: write at the final name
    (
        spark.read.parquet(*files)
        .coalesce(target_files)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(staging)
    )
    # the manifest rides inside the fold: heal_lake (rename mode) can
    # always finish a fold from the fold alone, and audits can map any
    # fold back to its sources in either mode
    manifest = os.path.join(staging, _FOLD_MANIFEST)
    with fs.open_write(manifest) as fh:
        json.dump(sorted(files), fh)
    fs.fsync_file(manifest)
    if mode == "rename":
        # fsync staging dir first and the lake dir after — rename is
        # atomic but NOT durable without them (ADVICE r12)
        fs.fsync_dir(staging)
        fs.replace(staging, final)  # the single atomic commit point
        fs.fsync_dir(lake_path)
    # manifest mode: no rename — the _save_folded swap below is THE
    # commit; a crash before it leaves an unrecorded dir that heal
    # rolls back, never a half-visible fold
    state["folds"].append({"dir": fold_name, "n_files": len(files)})
    state["files"] = sorted(folded | set(files))
    # record the delete intent WITH the fold commit: a crash anywhere
    # inside the delete loop is finished by the next tick's
    # _sweep_pending_deletes instead of leaking the buffer files. A
    # keep-sources tick PRESERVES any crashed prior tick's ledger
    # (its sweep is skipped, so clearing here would wipe the intent
    # while the files still sit on disk — the exact leak the ledger
    # closes)
    if delete_folded:
        state["pending_delete"] = sorted(files)
    _save_folded(lake_path, state, fs=fs)
    if delete_folded:
        for p in files:
            try:
                fs.remove(p)
            except OSError:
                pass
        state["pending_delete"] = []
        _save_folded(lake_path, state, fs=fs)
    return len(files)


def read_stream_output(
    spark: SparkSession,
    sink_path: str,
    lake_path: str,
    *,
    schema=None,
    fs: fsio.PosixFS = fsio.POSIX,
) -> DataFrame:
    """The read surface for a compacted streaming sink: compacted lake
    folds ∪ the buffer's not-yet-folded committed files. Matches a
    plain metadata-log read of the sink bit-for-bit at every point in
    the fold lifecycle (pinned in tests); in-flight files — on disk
    but absent from the sink log — are excluded exactly as the sink
    log itself excludes them. Robust to Spark compacting/cleaning its
    own sink log: both sides are tracked per file path.

    ``schema`` handles the nothing-committed-yet edge (ADVICE r12): a
    fresh stream that has written its ``_spark_metadata`` log but no
    committed data file cannot have its schema inferred — with
    ``schema`` given an empty DataFrame of that shape is returned,
    without it the error names the situation instead of surfacing
    Spark's bare 'unable to infer schema'.

    Reads are strictly READ-ONLY: no healing, no capability
    requirement (the contract guards mutation paths). Both crash
    shapes leave reads correct by construction — a rename-mode fold
    that committed before its watermark write is invisible to the lake
    side while its sources are still committed in the sink log (read
    from the tail); a manifest-mode fold whose state swap never
    happened is likewise invisible with its sources intact. Crash GC
    belongs to the owner's tick, so a reader never races the ticker's
    in-progress fold (code-review r13)."""
    state = _load_folded(lake_path, fs=fs)
    folded = set(state["files"])
    tail = [
        p
        for p in _sink_committed_files(sink_path, fs=fs)
        if p not in folded and fs.exists(p)
    ]
    parts = []
    for f in state["folds"]:
        d = os.path.join(lake_path, f["dir"])
        if fs.isdir(d):
            parts.append(spark.read.parquet(d))
    if tail:
        parts.append(spark.read.parquet(*tail))
    if not parts:
        if schema is not None:
            return spark.createDataFrame([], schema)
        try:
            return spark.read.parquet(sink_path).limit(0)
        except Exception as exc:  # AnalysisException: no data files yet
            raise RuntimeError(
                f"streaming sink {sink_path} has no committed data files "
                "and no compacted folds — a fresh stream before its first "
                "batch. Pass schema= to read_stream_output to get an "
                "empty DataFrame of the expected shape."
            ) from exc
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
