"""Parquet table layer: the nine sensor tables, Spark-native.

Replaces the reference's sink zoo (TimescaleDB hypertables + SQLite +
CSV; SURVEY.md §2.8) with partitioned, clustered parquet tables:

* hypertable time-chunking  → ``partitionBy(reading_date)`` + Catalyst
  partition pruning (reference ``PurpleAirPSQLDataLogger.py:105-112``);
* columnar compression with ``segmentby sensor_index / orderby
  data_time_stamp`` (``:129-136``) → ZSTD parquet written
  ``repartition(sensor_index).sortWithinPartitions(data_time_stamp)``,
  so each file covers few sensors in time order — the same locality the
  TimescaleDB policy buys, but at write time;
* PK-duplicate crash (plain INSERT, ``:153-347``) → idempotent
  dedup-on-write (documented deviation, SURVEY.md §7.4);
* retention policy → `apply_retention` partition-drop job;
* DROP ALL (``PurpleAirPSQLQueryStatements.py:543-553``) → `drop_all`.

At 100 TB: the date partition bounds every maintenance job, writes
shuffle once on sensor_index (well distributed — millions of sensors),
and readers get pruning on both the partition column and the
sensor_index sort within row groups (min/max page stats).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purpleair_data_logger_spark import schema as S
from purpleair_data_logger_spark.operators.transforms import vertical_split
from purpleair_data_logger_spark.sinks import atomic

PARTITION_COL = "reading_date"


class SensorTableStore:
    """Nine partitioned parquet tables rooted at ``base_path``."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        *,
        cluster_partitions: int | None = None,
        files_per_partition: int = 1,
    ):
        self.spark = spark
        self.base_path = base_path
        self.cluster_partitions = cluster_partitions
        self.files_per_partition = files_per_partition
        self.heal()

    def heal(self) -> dict[str, str]:
        """Recover any rewrite a crash interrupted (see `sinks.atomic`).
        Run on construction and before/after every destructive rewrite;
        returns {table: action} for the tables that needed repair. A
        multi-table snapshot (upsert_wide's all-or-none publish) heals
        FIRST, as a unit — its members must never be healed
        per-table, or a staged-but-unpublished member would roll
        forward alone."""
        actions = {}
        snap = atomic.heal_snapshot(self.base_path)
        if snap:
            actions["__snapshot__"] = snap
        for t in S.TABLE_NAMES:
            p = os.path.join(self.base_path, t)
            action = atomic.heal(p)
            if action:
                actions[t] = action
        return actions

    def path(self, table: str) -> str:
        if table not in S.TABLE_NAMES:
            raise ValueError(f"unknown table {table!r}")
        return os.path.join(self.base_path, table)

    # -- write path --------------------------------------------------------

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Shuffle ON the partition column (+ a bounded sensor salt), so
        each output file covers exactly one date: files per table =
        dates × files_per_partition, independent of task count.
        Repartitioning on sensor_index instead would emit tasks × dates
        files (the classic partitioned-write small-file explosion —
        measured 5x slower at sf0.1). Rows stay clustered by
        (sensor_index, ts) within each file via the local sort, which is
        what gives row-group min/max pruning on sensor lookups.
        """
        clustered = df.withColumn(
            PARTITION_COL, F.to_date(F.col("data_time_stamp"))
        )
        salt = F.pmod(
            F.xxhash64(F.col("sensor_index")), F.lit(self.files_per_partition)
        )
        n = self.cluster_partitions
        args = ([n] if n else []) + [F.col(PARTITION_COL), salt]
        return clustered.repartition(*args).sortWithinPartitions(
            PARTITION_COL, "sensor_index", "data_time_stamp"
        )

    def append_wide(
        self,
        wide: DataFrame,
        *,
        dedup: bool = True,
        dedup_against_existing: bool = False,
    ) -> None:
        """Write one wide at-rest frame into all nine tables.

        One micro-batch = one write per table (vs the reference's 9
        INSERTs + commit per reading). ``dedup`` drops PK duplicates
        within the batch deterministically. ``dedup_against_existing``
        additionally anti-joins the batch against already-stored keys
        (R6 exactly-once on re-delivery): the anti-join probes only the
        date partitions the batch touches — partition pruning keeps it
        O(batch), not O(table), at any scale.
        """
        if dedup:
            wide = wide.dropDuplicates(S.KEY_COLUMNS)
        if dedup_against_existing and os.path.isdir(self.path(S.STATION)):
            batch_dates = [
                r[0]
                for r in wide.select(
                    F.to_date(F.col("data_time_stamp")).alias("d")
                )
                .distinct()
                .collect()
            ]
            existing = (
                self.spark.read.parquet(self.path(S.STATION))
                .filter(F.col(PARTITION_COL).isin(batch_dates))
                .select(*S.KEY_COLUMNS)
            )
            wide = wide.join(existing, on=S.KEY_COLUMNS, how="left_anti")
        # Nine narrow pipelines, NOT one cached wide one: Catalyst prunes
        # each table's pipeline down to its own ~15 columns end-to-end
        # (scan → transform → shuffle → sort → write all narrow), so the
        # nine "recomputations" collectively do about one wide frame of
        # work. Caching the clustered wide frame instead materializes all
        # 117 columns and defeats pruning — measured 3x slower at sf0.1.
        # The nine jobs are submitted from driver threads so they share
        # the executor pool concurrently (narrow jobs rarely saturate
        # it); append targets are disjoint directories, so ordering is
        # irrelevant.
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        def _write(item):
            table, part = item
            self._prepare(part).write.mode("append").partitionBy(
                PARTITION_COL
            ).parquet(self.path(table))

        with ThreadPoolExecutor(max_workers=len(S.TABLE_NAMES)) as pool:
            list(pool.map(_write, vertical_split(wide).items()))

    def upsert_wide(self, wide: DataFrame) -> None:
        """Upsert: new readings insert, existing PKs take the batch's
        values — partition-scoped, crash-safe MERGE on plain parquet.

        Only the date partitions the batch touches are rewritten:
        stored rows from those partitions that are NOT in the batch
        survive via anti-join + union. Work is O(touched partitions),
        never O(table) — the parquet equivalent of Delta MERGE for this
        PK shape. The rewrite goes through `sinks.atomic`: replacement
        partitions are staged to a sibling dir (readers never see
        them), then rename-swapped in only after Spark's _SUCCESS
        commit record exists; a crash at any point leaves every
        partition wholly old or wholly new, and `heal` finishes or
        discards the interrupted rewrite.
        """
        self.heal()
        wide = wide.dropDuplicates(S.KEY_COLUMNS)
        batch_dates = [
            r[0]
            for r in wide.select(F.to_date(F.col("data_time_stamp")).alias("d"))
            .distinct()
            .collect()
        ]
        # All-or-none across the nine tables (the reference's
        # one-transaction contract, PurpleAirPSQLDataLogger.py:347):
        # stage EVERY table first under a _SNAPSHOT_PENDING intent
        # marker, then flip the marker and swap — a reader healing
        # after a crash at ANY point sees reading R in all nine tables
        # or in none, preserving the J1 reconstruction join's
        # PK-completeness invariant mid-publish. Staging writes are
        # independent per table, so they share the executor pool from
        # driver threads like append_wide's.
        parts = vertical_split(wide)
        # Single-writer lease (atomic.py): a second concurrent
        # upsert_wide on the same store fails loudly here instead of
        # silently interleaving snapshot markers.
        token = atomic.snapshot_begin(
            self.base_path, [self.path(t) for t in parts]
        )

        def _stage(item):
            table, part = item
            out = part
            if os.path.isdir(self.path(table)):
                survivors = (
                    self.spark.read.parquet(self.path(table))
                    .filter(F.col(PARTITION_COL).isin(batch_dates))
                    .drop(PARTITION_COL)
                    .join(
                        part.select(*S.KEY_COLUMNS),
                        on=S.KEY_COLUMNS,
                        how="left_anti",
                    )
                )
                out = part.unionByName(survivors)
            self._prepare(out).write.mode("overwrite").partitionBy(
                PARTITION_COL
            ).parquet(atomic.staging_path(self.path(table)))

        import threading  # noqa: PLC0415
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        # Heartbeat from a TIMER THREAD, not per staged-table
        # completion (ADVICE r7: pool.map yields in submission order,
        # so one staging longer than the lease TTL starved the
        # heartbeat and let a live writer be stale-reclaimed). A
        # vanished lease stops the beat quietly — the loud failure is
        # snapshot_commit's ownership check, not a daemon's traceback.
        stop_beat = threading.Event()

        def _beat() -> None:
            while not stop_beat.wait(atomic.HEARTBEAT_INTERVAL):
                if not atomic.snapshot_heartbeat(self.base_path):
                    # A missing lease is USUALLY a reclaim (stop quietly;
                    # the loud failure is snapshot_commit's ownership
                    # check) — but another store's release_lease momentarily
                    # renames the file aside before linking it back
                    # (ADVICE r8), so retry once after a short sleep
                    # before concluding the lease is really gone.
                    if stop_beat.wait(0.2):
                        return
                    if not atomic.snapshot_heartbeat(self.base_path):
                        return
        beater = threading.Thread(
            target=_beat, name="snapshot-lease-heartbeat", daemon=True
        )
        beater.start()
        try:
            with ThreadPoolExecutor(max_workers=len(parts)) as pool:
                list(pool.map(_stage, parts.items()))
        except BaseException:
            # in-process failure: roll the whole snapshot back now
            # (a crash instead would be healed identically on reopen);
            # the owner token authorizes healing our own fresh lease.
            # If the lease was reclaimed while we staged, the
            # reclaimer owns cleanup — don't mask the original error
            # with SnapshotLeaseHeld.
            stop_beat.set()
            beater.join(timeout=5)
            try:
                atomic.heal_snapshot(self.base_path, writer_id=token)
            except atomic.SnapshotLeaseHeld:
                pass
            raise
        stop_beat.set()
        beater.join(timeout=5)
        atomic.snapshot_commit(self.base_path, writer_id=token)

    # -- read path ---------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table)).drop(PARTITION_COL)

    def reconstruct_reading(self, tables: list[str] | None = None) -> DataFrame:
        """J1: the N-way PK equi-join rebuilding the logical wide row.

        All nine tables share partitioning and sort order, so at scale
        this plans as co-partitioned sort-merge joins with no extra
        sort; filtered single-sensor lookups broadcast the station row.
        """
        names = tables or list(S.TABLE_NAMES)
        out = self.read(names[0])
        for t in names[1:]:
            out = out.join(self.read(t), on=S.KEY_COLUMNS, how="inner")
        return out

    # -- lifecycle ---------------------------------------------------------

    def apply_retention(self, table: str, *, keep_days: int, now=None) -> list[str]:
        """R7: drop date partitions older than ``keep_days``. Returns
        dropped partition dirs. Pure partition-prune-and-delete — never
        rewrites surviving data."""
        import datetime as _dt

        now = now or _dt.datetime.now(_dt.timezone.utc)
        cutoff = (now - _dt.timedelta(days=keep_days)).date()
        root = self.path(table)
        dropped = []
        if not os.path.isdir(root):
            return dropped
        for entry in os.listdir(root):
            if not entry.startswith(f"{PARTITION_COL}="):
                continue
            date_str = entry.split("=", 1)[1]
            try:
                d = _dt.date.fromisoformat(date_str)
            except ValueError:
                continue
            if d < cutoff:
                shutil.rmtree(os.path.join(root, entry))
                dropped.append(entry)
        return dropped

    def compact(self, table: str, *, target_partitions: int) -> None:
        """Compaction job: rewrite a table to ``target_partitions``
        files per date partition (small-file cleanup for long-running
        streaming appends). Crash-safe via `sinks.atomic`: the full
        rewrite is staged to a sibling dir, then every date partition is
        rename-swapped in — an interrupted compaction is healed forward
        (staging complete) or backward (old files intact), never a loss.
        """
        self.heal()
        df = self.spark.read.parquet(self.path(table))
        (
            df.repartition(target_partitions, "sensor_index")
            .sortWithinPartitions("sensor_index", "data_time_stamp")
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(atomic.staging_path(self.path(table)))
        )
        atomic.commit(self.path(table))

    # -- policy catalog (F8) ----------------------------------------------

    _POLICIES_FILE = "_policies.json"

    def _policies_path(self) -> str:
        return os.path.join(self.base_path, self._POLICIES_FILE)

    def _load_policies(self) -> list[dict]:
        import json

        p = self._policies_path()
        if not os.path.exists(p):
            return []
        with open(p) as fh:
            return json.load(fh)

    def _save_policies(self, policies: list[dict]) -> None:
        import json

        os.makedirs(self.base_path, exist_ok=True)
        tmp = self._policies_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(policies, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._policies_path())

    def add_retention_policy(self, table: str, *, keep_days: int) -> bool:
        """Register a retention policy (drop date partitions older than
        ``keep_days``); returns whether a new policy was added. Mirrors
        the reference's add-if-absent flow: it SELECTs the Timescale
        job catalog for an existing policy before adding one
        (`PurpleAirPSQLDataLogger.py:120-127` over the F8 lookup,
        `PurpleAirPSQLQueryStatements.py:557-560`) — here the same
        check is one line against the persisted policy file, and
        duplicate registration is a no-op."""
        return self._add_policy(
            "policy_retention", table, {"keep_days": int(keep_days)}
        )

    def add_compression_policy(
        self, table: str, *, after_days: int, target_partitions: int = 1
    ) -> bool:
        """Register a compression/compaction policy: date partitions
        older than ``after_days`` are rewritten to ``target_partitions``
        ZSTD files clustered on (sensor_index, ts) — the Spark analog
        of Timescale's `add_compression_policy(..., INTERVAL '14 days')`
        (`PurpleAirPSQLDataLogger.py:129-136`). Add-if-absent like
        `add_retention_policy`."""
        return self._add_policy(
            "policy_compression",
            table,
            {
                "after_days": int(after_days),
                "target_partitions": int(target_partitions),
            },
        )

    def add_stream_compaction_policy(
        self,
        sink_name: str,
        *,
        sink_path: str,
        lake_path: str,
        keep_last_batches: int = 1,
        target_files: int = 1,
        commit_mode: str | None = None,
    ) -> bool:
        """Register a streaming-sink compaction policy: each
        `run_policies` tick runs `streaming.compaction.
        fold_closed_batches` over ``sink_path`` → ``lake_path``, so the
        small-files tick shares the one scheduled maintenance entry
        point with retention and compression instead of needing its own
        scheduler slot. ``sink_name`` is a free-form label (stream
        sinks are not one of the nine store tables); add-if-absent per
        (kind, label) like the other policies. ``commit_mode`` pins the
        lake's commit protocol ("rename" POSIX/HDFS, "manifest" object
        stores) exactly as `fold_closed_batches` documents."""
        if commit_mode not in (None, "rename", "manifest"):
            raise ValueError(f"unknown commit_mode {commit_mode!r}")
        return self._add_policy(
            "policy_stream_compaction",
            sink_name,
            {
                "sink_path": sink_path,
                "lake_path": lake_path,
                "keep_last_batches": int(keep_last_batches),
                "target_files": int(target_files),
                "commit_mode": commit_mode,
            },
            validate_table=False,
        )

    def _add_policy(
        self,
        proc_name: str,
        table: str,
        config: dict,
        *,
        validate_table: bool = True,
    ) -> bool:
        if validate_table and table not in S.TABLE_NAMES:
            raise ValueError(f"unknown table {table!r}")
        policies = self._load_policies()
        for p in policies:
            if p["proc_name"] == proc_name and p["table"] == table:
                return False  # already registered — reference's no-op path
        policies.append(
            {"proc_name": proc_name, "table": table, "config": config}
        )
        self._save_policies(policies)
        return True

    def policy_catalog(self, proc_name: str | None = None) -> DataFrame:
        """F8: the policy-catalog introspection read — one row per
        registered lifecycle policy, optionally filtered by job kind,
        the exact query shape of the reference's
        ``SELECT ... FROM timescaledb_information.jobs WHERE
        proc_name='policy_compression'``. The catalog is data the
        store owns (a persisted JSON registry), so the read is a tiny
        driver-built DataFrame, never a scan."""
        import json

        rows = [
            (p["proc_name"], p["table"], json.dumps(p["config"], sort_keys=True))
            for p in self._load_policies()
        ]
        df = self.spark.createDataFrame(
            rows, "proc_name string, table_name string, config string"
        )
        if proc_name is not None:
            df = df.filter(F.col("proc_name") == proc_name)
        return df

    def run_policies(self, *, now=None, stream_fs=None) -> dict[str, object]:
        """Execute every registered policy once — the scheduled
        maintenance tick (Timescale's background job runner; here the
        caller owns scheduling, e.g. one Airflow/cron task). Returns
        {f"{proc_name}:{table}": outcome} — dropped partition dirs for
        retention, compacted partition count for compression, files
        folded for stream compaction.

        ``stream_fs``: filesystem binding handed to the
        stream-compaction ticks (the store's own nine tables are
        rename-bound by design, but a stream lake registered with
        ``commit_mode="manifest"`` lives on an object store whose
        binding must be injected here — without it the default POSIX
        binding would see no sink log on a remote path and quietly
        report 0 files folded forever, code-review r13)."""
        from purpleair_data_logger_spark import fsio as _fsio

        stream_fs = stream_fs or _fsio.POSIX
        results: dict[str, object] = {}
        for p in self._load_policies():
            key = f"{p['proc_name']}:{p['table']}"
            if p["proc_name"] == "policy_retention":
                results[key] = self.apply_retention(
                    p["table"], keep_days=p["config"]["keep_days"], now=now
                )
            elif p["proc_name"] == "policy_compression":
                results[key] = self.compact_older_than(
                    p["table"],
                    after_days=p["config"]["after_days"],
                    target_partitions=p["config"]["target_partitions"],
                    now=now,
                )
            elif p["proc_name"] == "policy_stream_compaction":
                from purpleair_data_logger_spark.streaming import (
                    compaction as _compaction,
                )

                cfg = p["config"]
                results[key] = _compaction.fold_closed_batches(
                    self.spark,
                    cfg["sink_path"],
                    cfg["lake_path"],
                    keep_last_batches=cfg["keep_last_batches"],
                    target_files=cfg["target_files"],
                    commit_mode=cfg.get("commit_mode"),
                    fs=stream_fs,
                )
        return results

    def compact_older_than(
        self,
        table: str,
        *,
        after_days: int,
        target_partitions: int = 1,
        now=None,
    ) -> int:
        """Compression-tier rewrite bounded to COLD date partitions
        (older than ``after_days``): each is rewritten in place to
        ``target_partitions`` clustered ZSTD files via the crash-safe
        staged rename. Hot partitions are untouched, so the job's cost
        is bounded by the cold set, not table size. Returns the number
        of partitions rewritten."""
        import datetime as _dt

        now = now or _dt.datetime.now(_dt.timezone.utc)
        cutoff = (now - _dt.timedelta(days=after_days)).date()
        root = self.path(table)
        if not os.path.isdir(root):
            return 0
        self.heal()
        cold: list[_dt.date] = []
        for entry in sorted(os.listdir(root)):
            if not entry.startswith(f"{PARTITION_COL}="):
                continue
            try:
                d = _dt.date.fromisoformat(entry.split("=", 1)[1])
            except ValueError:
                continue
            if d < cutoff:
                cold.append(d)
        if not cold:
            return 0
        # the staged rewrite carries ONLY the cold partitions, and the
        # commit swap is O(staged partitions): hot data is never read,
        # rewritten, or renamed — the job's cost is the cold set.
        df = self.spark.read.parquet(root).filter(
            F.col(PARTITION_COL).cast("date").isin(cold)
        )
        (
            df.repartition(target_partitions, "sensor_index")
            .sortWithinPartitions("sensor_index", "data_time_stamp")
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .option("compression", "zstd")
            .parquet(atomic.staging_path(root))
        )
        atomic.commit(root)
        return len(cold)

    def drop_all(self, *, confirm: bool) -> None:
        """K4: destructive reset behind an explicit confirm flag
        (reference gates this on interactive y/n). Also clears any
        staging/retired leftovers from interrupted rewrites."""
        if not confirm:
            raise ValueError("drop_all requires confirm=True")
        for t in S.TABLE_NAMES:
            for p in (self.path(t), atomic.staging_path(self.path(t))):
                if os.path.isdir(p):
                    shutil.rmtree(p)


def write_csv_sink(df: DataFrame, path: str, *, mode: str = "append") -> None:
    """K3: CSV sink. Spark's writer quotes/escapes correctly — the
    reference's hand-rolled ``str(v) + ','`` concatenation corrupts on
    commas (PurpleAirCSVDataLogger.py:151-309); documented deviation."""
    df.write.mode(mode).option("header", True).csv(path)


def write_jdbc_sink(df: DataFrame, url: str, table: str, properties: dict, *, mode: str = "append") -> None:
    """K1/K2: JDBC sink (PSQL/SQLite parity) — one batched write per
    micro-batch instead of 9 row-at-a-time INSERTs."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties)
