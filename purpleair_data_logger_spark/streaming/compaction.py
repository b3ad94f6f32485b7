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
- `fold_closed_batches` moves CLOSED micro-batches — committed to the
  sink log, and never the newest ``keep_last_batches`` — into a
  compacted parquet lake via a staged-directory rename (one atomic
  rename per fold, the `sinks/atomic` discipline), then deletes the
  folded buffer files;
- `read_stream_output` is the read surface: lake ∪ the not-yet-folded
  buffer tail. In-flight files (present on disk but not yet in the
  sink log) are invisible to the fold by construction and excluded
  from reads exactly as the sink log itself excludes them.

Crash safety: the fold dir name is deterministic from the batch range,
so a crash between the rename-commit and the watermark write is healed
on the next tick (the existing dir is detected and recorded, never
re-folded or double-counted); a crash mid-stage leaves only a
``_staging``-prefixed dir that the next tick removes.

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
_STAGING_PREFIX = "_staging_fold_"


def _sink_batch_files(sink_path: str) -> dict[int, list[str]]:
    """Per-batch NEW data files from the FileStreamSink's
    ``_spark_metadata`` log, batch id → absolute paths. Only files the
    sink has durably committed appear; a ``.compact`` log entry
    repeats history, so adds are diffed against everything seen in
    earlier batches."""
    meta = os.path.join(sink_path, "_spark_metadata")
    if not os.path.isdir(meta):
        return {}
    batches: list[tuple[int, str]] = []
    for name in os.listdir(meta):
        if name.startswith(".") or name.endswith(".crc"):
            continue
        base = name[: -len(".compact")] if name.endswith(".compact") else name
        try:
            bid = int(base)
        except ValueError:
            continue
        # a plain file and its .compact sibling share a batch id —
        # prefer the .compact (it is the authoritative superset)
        batches.append((bid, os.path.join(meta, name)))
    batches.sort(key=lambda t: (t[0], t[1].endswith(".compact")))
    by_id: dict[int, str] = {}
    for bid, p in batches:
        by_id[bid] = p  # later (compact) entry wins per the sort
    seen: set[str] = set()
    out: dict[int, list[str]] = {}
    for bid in sorted(by_id):
        entries: list[str] = []
        with open(by_id[bid]) as fh:
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
                    entries.append(path)
        adds = [p for p in entries if p not in seen]
        seen.update(entries)
        out[bid] = adds
    return out


def _load_folded(lake_path: str) -> dict:
    p = os.path.join(lake_path, _FOLDED_STATE)
    if not os.path.exists(p):
        return {"batches": [], "folds": []}
    with open(p) as fh:
        return json.load(fh)


def _save_folded(lake_path: str, state: dict) -> None:
    os.makedirs(lake_path, exist_ok=True)
    tmp = os.path.join(lake_path, _FOLDED_STATE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(lake_path, _FOLDED_STATE))


def heal_lake(lake_path: str) -> None:
    """Remove abandoned staging dirs and record any fold dir that
    committed (rename done) before its watermark write landed — the
    forward-heal of a crash between the two steps."""
    if not os.path.isdir(lake_path):
        return
    state = _load_folded(lake_path)
    known = {f["dir"] for f in state["folds"]}
    changed = False
    for name in sorted(os.listdir(lake_path)):
        full = os.path.join(lake_path, name)
        if name.startswith(_STAGING_PREFIX):
            shutil.rmtree(full, ignore_errors=True)
            continue
        if name.startswith("fold_") and os.path.isdir(full) and name not in known:
            # committed fold whose bookkeeping was lost: batch range is
            # encoded in the dir name — restore the record
            rng = name[len("fold_") :].split("-")
            bids = list(range(int(rng[0]), int(rng[-1]) + 1))
            state["folds"].append({"dir": name, "batches": bids})
            state["batches"] = sorted(set(state["batches"]) | set(bids))
            changed = True
    if changed:
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
    """One maintenance tick: compact every CLOSED micro-batch's sink
    files into the lake. Closed = committed to the sink's
    ``_spark_metadata`` log AND not among the newest
    ``keep_last_batches`` (the conservative hot tail — the log entry
    is durable, but the stream owner may still be serving readers the
    raw path for its freshest batch). Returns the number of batches
    folded; 0 is a normal idle tick."""
    if keep_last_batches < 1:
        raise ValueError(
            f"keep_last_batches must be >= 1 (the in-flight guard), "
            f"got {keep_last_batches}"
        )
    heal_lake(lake_path)
    batch_files = _sink_batch_files(sink_path)
    if not batch_files:
        return 0
    state = _load_folded(lake_path)
    done = set(state["batches"])
    closed = sorted(bid for bid in batch_files if bid not in done)[
        : -keep_last_batches or None
    ]
    closed = [b for b in closed if batch_files[b]]
    if not closed:
        return 0
    files = [p for b in closed for p in batch_files[b]]
    fold_name = f"fold_{closed[0]}-{closed[-1]}"
    final = os.path.join(lake_path, fold_name)
    if not os.path.isdir(final):  # crash-heal: rename may have landed
        staging = os.path.join(lake_path, _STAGING_PREFIX + fold_name)
        shutil.rmtree(staging, ignore_errors=True)
        (
            spark.read.parquet(*files)
            .coalesce(target_files)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(staging)
        )
        os.replace(staging, final)  # the single atomic commit point
    state["folds"].append({"dir": fold_name, "batches": closed})
    state["batches"] = sorted(set(state["batches"]) | set(closed))
    _save_folded(lake_path, state)
    if delete_folded:
        for p in files:
            try:
                os.remove(p)
            except OSError:
                pass
    return len(closed)


def read_stream_output(
    spark: SparkSession, sink_path: str, lake_path: str
) -> DataFrame:
    """The read surface for a compacted streaming sink: compacted lake
    folds ∪ the buffer's not-yet-folded committed batches. Matches a
    plain metadata-log read of the sink bit-for-bit at every point in
    the fold lifecycle (pinned in tests); in-flight files — on disk
    but absent from the sink log — are excluded exactly as the sink
    log itself excludes them."""
    heal_lake(lake_path)
    state = (
        _load_folded(lake_path) if os.path.isdir(lake_path) else
        {"batches": [], "folds": []}
    )
    done = set(state["batches"])
    batch_files = _sink_batch_files(sink_path)
    tail = [
        p
        for b in sorted(batch_files)
        if b not in done
        for p in batch_files[b]
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
