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

Scale shape: each tick's cost is O(files folded) — the buffer is
bounded by fold cadence × micro-batch rate, the lake grows by one
O(target_files) fold dir per tick, and nothing ever re-reads or
re-writes previously folded data (the `neardup_incremental_batch`
discipline applied to sink maintenance).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_FOLDED_STATE = "_folded.json"
_FOLD_MANIFEST = "_FOLDED_SOURCES.json"
_STAGING_PREFIX = "_staging_fold_"


def _read_log_entries(log_file: str) -> list[str]:
    """Data-file paths listed by one sink-log file (v1 JSON lines)."""
    out: list[str] = []
    with open(log_file) as fh:
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


def _sink_log(sink_path: str) -> dict[int, tuple[bool, str]]:
    """batch id → (is_compact, log-file path), one entry per batch id
    (a ``.compact`` supersedes a plain file of the same id)."""
    meta = os.path.join(sink_path, "_spark_metadata")
    if not os.path.isdir(meta):
        return {}
    by_id: dict[int, tuple[bool, str]] = {}
    for name in os.listdir(meta):
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


def _sink_committed_files(sink_path: str) -> list[str]:
    """The sink log's authoritative CURRENT file set: every add listed
    by the latest ``.compact`` (which replays all history) plus all
    later plain entries — correct even after Spark deletes superseded
    plain log files. Order is log order; duplicates collapse."""
    log = _sink_log(sink_path)
    if not log:
        return []
    compacts = [b for b, (c, _) in log.items() if c]
    start = max(compacts) if compacts else min(log)
    seen: set[str] = set()
    out: list[str] = []
    for bid in sorted(b for b in log if b >= start):
        for p in _read_log_entries(log[bid][1]):
            if p not in seen:
                seen.add(p)
                out.append(p)
    return out


def _hot_tail_files(sink_path: str, keep_last_batches: int) -> set[str]:
    """Files attributed to the newest ``keep_last_batches`` log
    entries — the conservative hot tail the fold never touches. A
    ``.compact`` entry in the tail re-lists history, which only makes
    the tail LARGER (under-folding for one tick), never smaller."""
    log = _sink_log(sink_path)
    hot: set[str] = set()
    for bid in sorted(log)[-keep_last_batches:] if log else []:
        hot.update(_read_log_entries(log[bid][1]))
    return hot


def _load_folded(lake_path: str) -> dict:
    p = os.path.join(lake_path, _FOLDED_STATE)
    if not os.path.exists(p):
        return {"files": [], "folds": []}
    with open(p) as fh:
        state = json.load(fh)
    state.setdefault("files", [])
    state.setdefault("folds", [])
    return state


def _save_folded(lake_path: str, state: dict) -> None:
    os.makedirs(lake_path, exist_ok=True)
    tmp = os.path.join(lake_path, _FOLDED_STATE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(lake_path, _FOLDED_STATE))


def heal_lake(lake_path: str) -> None:
    """Remove abandoned staging dirs; re-record any fold dir that
    committed (rename done) before its watermark write landed, from
    the manifest the fold carries INSIDE itself — and finish deleting
    that fold's source files (the crash-window leak, code-review r12).
    Fold-named dirs without a readable manifest are skipped, never a
    crash."""
    if not os.path.isdir(lake_path):
        return
    state = _load_folded(lake_path)
    known = {f["dir"] for f in state["folds"]}
    folded = set(state["files"])
    changed = False
    for name in sorted(os.listdir(lake_path)):
        full = os.path.join(lake_path, name)
        if name.startswith(_STAGING_PREFIX):
            shutil.rmtree(full, ignore_errors=True)
            continue
        if not (name.startswith("fold_") and os.path.isdir(full)):
            continue
        if name in known:
            continue
        manifest = os.path.join(full, _FOLD_MANIFEST)
        try:
            with open(manifest) as fh:
                sources = json.load(fh)
        except (OSError, ValueError):
            continue  # not one of ours (or torn) — leave it alone
        state["folds"].append({"dir": name, "n_files": len(sources)})
        folded.update(sources)
        for p in sources:  # finish the interrupted source deletion
            try:
                os.remove(p)
            except OSError:
                pass
        changed = True
    if changed:
        state["files"] = sorted(folded)
        _save_folded(lake_path, state)


def fold_closed_batches(
    spark: SparkSession,
    sink_path: str,
    lake_path: str,
    *,
    keep_last_batches: int = 1,
    target_files: int = 1,
    delete_folded: bool = True,
) -> int:
    """One maintenance tick: compact every CLOSED sink file into the
    lake. Closed = committed to the sink's ``_spark_metadata`` log,
    not yet folded, and not attributed to the newest
    ``keep_last_batches`` log entries (the conservative hot tail — the
    log entry is durable, but the stream owner may still be serving
    readers the raw path for its freshest batch). Returns the number
    of FILES folded; 0 is a normal idle tick."""
    if keep_last_batches < 1:
        raise ValueError(
            f"keep_last_batches must be >= 1 (the in-flight guard), "
            f"got {keep_last_batches}"
        )
    heal_lake(lake_path)
    committed = _sink_committed_files(sink_path)
    if not committed:
        return 0
    state = _load_folded(lake_path)
    folded = set(state["files"])
    hot = _hot_tail_files(sink_path, keep_last_batches)
    files = [
        p
        for p in committed
        if p not in folded and p not in hot and os.path.exists(p)
    ]
    if not files:
        return 0
    fold_name = f"fold_{len(state['folds']):06d}"
    staging = os.path.join(lake_path, _STAGING_PREFIX + fold_name)
    final = os.path.join(lake_path, fold_name)
    shutil.rmtree(staging, ignore_errors=True)
    (
        spark.read.parquet(*files)
        .coalesce(target_files)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(staging)
    )
    # the manifest rides inside the fold, BEFORE the atomic rename:
    # heal_lake can always finish a fold from the fold alone
    with open(os.path.join(staging, _FOLD_MANIFEST), "w") as fh:
        json.dump(sorted(files), fh)
    os.replace(staging, final)  # the single atomic commit point
    state["folds"].append({"dir": fold_name, "n_files": len(files)})
    state["files"] = sorted(folded | set(files))
    _save_folded(lake_path, state)
    if delete_folded:
        for p in files:
            try:
                os.remove(p)
            except OSError:
                pass
    return len(files)


def read_stream_output(
    spark: SparkSession, sink_path: str, lake_path: str
) -> DataFrame:
    """The read surface for a compacted streaming sink: compacted lake
    folds ∪ the buffer's not-yet-folded committed files. Matches a
    plain metadata-log read of the sink bit-for-bit at every point in
    the fold lifecycle (pinned in tests); in-flight files — on disk
    but absent from the sink log — are excluded exactly as the sink
    log itself excludes them. Robust to Spark compacting/cleaning its
    own sink log: both sides are tracked per file path."""
    heal_lake(lake_path)
    state = (
        _load_folded(lake_path)
        if os.path.isdir(lake_path)
        else {"files": [], "folds": []}
    )
    folded = set(state["files"])
    tail = [
        p
        for p in _sink_committed_files(sink_path)
        if p not in folded and os.path.exists(p)
    ]
    parts = []
    for f in state["folds"]:
        d = os.path.join(lake_path, f["dir"])
        if os.path.isdir(d):
            parts.append(spark.read.parquet(d))
    if tail:
        parts.append(spark.read.parquet(*tail))
    if not parts:
        return spark.read.parquet(sink_path).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
