"""Materialize-once seam for within-query reuse points (r14).

Several operators build an intermediate that is consumed by MORE THAN
ONE downstream subtree of the same query — the LSH band index (both
self-join sides), candidate-pair sets (two semi-joins + the fetch
join), per-doc element-set tables (up to four consumers), phash
signature tables (band explode + both Hamming-verify sides). Spark
compiles a shared subplan into every consumer, so without an explicit
materialization the producing pipeline EXECUTES once per consumer
(r13 measured 2-6 scans/aggregate pipelines per query).

The r13 fix was a bare ``localCheckpoint(eager=False)`` at each site.
That is the right local/bench default (zero extra I/O, blocks live in
executor storage), but local-checkpoint blocks have NO lineage
fallback: on a real cluster an executor loss — or a dynamic-allocation
decommission — mid-query makes the job unrecoverable instead of
recomputing the lost partitions (VERDICT r13 #2). This module is the
one injectable seam those sites now go through:

* default: ``localCheckpoint(eager=False)`` — single-node / bench /
  tests, where executor loss == driver loss anyway;
* ``SPARK_GRAFT_CHECKPOINT_DIR=<cluster-visible path>``: reliable
  ``df.checkpoint(eager=False)`` into that directory — a lost executor
  recomputes its partitions from the checkpoint files, the posture a
  100 TB deployment runs with (SCALE.md "Materialize-once sites").

Lazy either way: the stored plan is truncated at first use, so
plan-census tooling that only compiles still runs no jobs, and the
materialization happens inside the first consuming job rather than as
an extra eager job.

Lifecycle note (ADVICE r13): checkpointed blocks are freed by the
ContextCleaner once the RDD handle is garbage-collected; sessions built
by `session.get_spark` bound the wait with
``spark.cleaner.periodicGC.interval`` (default 1min there, overridable
via ``SPARK_GRAFT_PERIODIC_GC``). Library callers embedding these
operators in a foreign SparkSession inherit Spark's 30-min default and
should either set the interval themselves or unpersist at their own
query boundaries.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: Cluster deployments set this to an HDFS/S3/cluster-visible path to
#: swap every materialize-once site from executor-memory localCheckpoint
#: to reliable checkpoint files (read once per process change below).
CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"

_dir_set_for: str | None = None


def checkpoint_dir() -> str | None:
    """The reliable-checkpoint directory currently configured, or None
    for the local default. Read from the environment per call so tests
    can monkeypatch it."""
    return os.environ.get(CHECKPOINT_DIR_ENV) or None


def materialize_once(df: DataFrame, *, serialized: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage and store its rows at first use, so
    every downstream consumer scans the stored rows instead of
    re-executing the producing pipeline.

    ``serialized=True`` stores compact serialized blocks
    (StorageLevel.MEMORY_AND_DISK — PySpark's name for the serialized
    level) instead of the deserialized default: right for wide
    object-heavy rows (token/element arrays) whose live objects would
    otherwise inflate every GC for the session's lifetime (r13). Only
    honored on the local path; reliable checkpoints are files and have
    no in-memory object form to begin with.
    """
    global _dir_set_for
    reliable = checkpoint_dir()
    if reliable:
        sc = df.sparkSession.sparkContext
        if _dir_set_for != reliable:
            sc.setCheckpointDir(reliable)
            _dir_set_for = reliable
        return df.checkpoint(eager=False)
    if serialized:
        return df.localCheckpoint(
            eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
    return df.localCheckpoint(eager=False)
