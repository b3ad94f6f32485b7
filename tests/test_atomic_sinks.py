"""Crash-injection tests for the `sinks.atomic` rewrite protocol:
every interruption point of upsert/compact must leave a store that a
fresh `SensorTableStore` (which heals on construction) reads as wholly
old or wholly new data — never lost or half-written partitions."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from purpleair_data_logger_spark import schema as S
from purpleair_data_logger_spark.operators import transforms as X
from purpleair_data_logger_spark.sinks import atomic
from purpleair_data_logger_spark.sinks.tables import PARTITION_COL, SensorTableStore

BASE_TS = 1659710232  # 2022-08-05 … UTC


def _payload(ts, rows):
    return {
        "api_version": "V1",
        "time_stamp": ts + 56,
        "data_time_stamp": ts,
        "fields": ["sensor_index", "name", "humidity", "pm2.5_atm", "last_seen"],
        "data": rows,
    }


def _wide(spark, ts, rows):
    return X.to_storage_form(X.zip_fields_data(spark, _payload(ts, rows)))


def _seeded_store(spark, tmp_path):
    """Two dates, two sensors, all nine tables."""
    store = SensorTableStore(spark, str(tmp_path / "tables"), cluster_partitions=2)
    store.append_wide(_wide(spark, BASE_TS, [[1, "s1", 40, 1.5, 0], [2, "s2", 50, 2.5, 0]]))
    store.append_wide(_wide(spark, BASE_TS + 86400, [[1, "s1", 41, 1.6, 0]]))
    return store


def _stage_upsert_then_crash(spark, store):
    """Replay upsert_wide's staging write for one table, then 'crash'
    before atomic.commit — the staging dir is complete (_SUCCESS) but
    nothing was swapped."""
    live = store.path(S.ENVIRONMENTAL)
    batch = _wide(spark, BASE_TS, [[1, "s1", 99, 9.9, 0]])
    part = X.vertical_split(batch.dropDuplicates(S.KEY_COLUMNS))[S.ENVIRONMENTAL]
    survivors = (
        spark.read.parquet(live)
        .filter(F.col(PARTITION_COL).isin([r[0] for r in batch.select(
            F.to_date(F.col("data_time_stamp")).alias("d")).distinct().collect()]))
        .drop(PARTITION_COL)
        .join(part.select(*S.KEY_COLUMNS), on=S.KEY_COLUMNS, how="left_anti")
    )
    store._prepare(part.unionByName(survivors)).write.mode("overwrite").partitionBy(
        PARTITION_COL
    ).parquet(atomic.staging_path(live))


def test_crash_before_commit_rolls_forward(spark, tmp_path):
    """Staging complete (+_SUCCESS), crash before any swap: heal-on-open
    rolls the committed upsert forward."""
    store = _seeded_store(spark, tmp_path)
    _stage_upsert_then_crash(spark, store)
    assert os.path.isdir(atomic.staging_path(store.path(S.ENVIRONMENTAL)))

    reopened = SensorTableStore(spark, store.base_path, cluster_partitions=2)
    assert not os.path.isdir(atomic.staging_path(reopened.path(S.ENVIRONMENTAL)))
    env = {
        (r["sensor_index"], r["data_time_stamp"]): r["humidity"]
        for r in reopened.read(S.ENVIRONMENTAL).collect()
    }
    assert len(env) == 3  # nothing lost
    assert 99 in env.values()  # the staged upsert landed


def test_crash_mid_swap_rolls_forward(spark, tmp_path):
    """Crash mid-commit: one live partition already renamed aside, its
    replacement not yet moved in. Heal finishes the swap."""
    store = _seeded_store(spark, tmp_path)
    live = store.path(S.ENVIRONMENTAL)
    _stage_upsert_then_crash(spark, store)
    # simulate the commit loop dying between rename-aside and rename-in
    entry = next(
        e for e in os.listdir(atomic.staging_path(live))
        if e.startswith(f"{PARTITION_COL}=")
    )
    os.rename(os.path.join(live, entry), os.path.join(live, entry) + atomic.RETIRED_SUFFIX)

    reopened = SensorTableStore(spark, store.base_path, cluster_partitions=2)
    rows = reopened.read(S.ENVIRONMENTAL).collect()
    assert len(rows) == 3
    assert not any(
        e.endswith(atomic.RETIRED_SUFFIX) for e in os.listdir(live)
    )


def test_crash_with_incomplete_staging_rolls_back(spark, tmp_path):
    """Staging dir without _SUCCESS (write died midway): heal discards
    it and the old table reads back untouched."""
    store = _seeded_store(spark, tmp_path)
    live = store.path(S.ENVIRONMENTAL)
    before = sorted(
        (r["sensor_index"], r["data_time_stamp"], r["humidity"])
        for r in store.read(S.ENVIRONMENTAL).collect()
    )
    staged = atomic.staging_path(live)
    os.makedirs(os.path.join(staged, f"{PARTITION_COL}=2022-08-05"))
    with open(os.path.join(staged, f"{PARTITION_COL}=2022-08-05", "junk.parquet"), "w") as f:
        f.write("partial garbage")

    reopened = SensorTableStore(spark, store.base_path, cluster_partitions=2)
    assert not os.path.isdir(staged)
    after = sorted(
        (r["sensor_index"], r["data_time_stamp"], r["humidity"])
        for r in reopened.read(S.ENVIRONMENTAL).collect()
    )
    assert after == before


def test_commit_refuses_uncommitted_staging(spark, tmp_path):
    store = _seeded_store(spark, tmp_path)
    live = store.path(S.ENVIRONMENTAL)
    os.makedirs(atomic.staging_path(live), exist_ok=True)
    try:
        atomic.commit(live)
        raise AssertionError("commit must refuse staging without _SUCCESS")
    except RuntimeError:
        pass
    finally:
        shutil.rmtree(atomic.staging_path(live), ignore_errors=True)


def _stage_snapshot_then_crash(spark, store, *, tables_to_stage=None):
    """Replay upsert_wide's snapshot staging (intent marker + staged
    rewrite per table), then 'crash' before the marker flip. With
    ``tables_to_stage`` given, only those members finish staging —
    simulating a crash mid-staging."""
    batch = _wide(spark, BASE_TS, [[1, "s1", 99, 9.9, 0]])
    parts = X.vertical_split(batch.dropDuplicates(S.KEY_COLUMNS))
    atomic.snapshot_begin(store.base_path, [store.path(t) for t in parts])
    batch_dates = [
        r[0]
        for r in batch.select(
            F.to_date(F.col("data_time_stamp")).alias("d")
        ).distinct().collect()
    ]
    for table, part in parts.items():
        if tables_to_stage is not None and table not in tables_to_stage:
            continue
        survivors = (
            spark.read.parquet(store.path(table))
            .filter(F.col(PARTITION_COL).isin(batch_dates))
            .drop(PARTITION_COL)
            .join(part.select(*S.KEY_COLUMNS), on=S.KEY_COLUMNS, how="left_anti")
        )
        store._prepare(part.unionByName(survivors)).write.mode(
            "overwrite"
        ).partitionBy(PARTITION_COL).parquet(
            atomic.staging_path(store.path(table))
        )
    # The 'crashed' writer stops heartbeating: age its lease past the
    # TTL so a healing reader treats it as dead (within the TTL a
    # reader correctly REFUSES to heal — see test_snapshot_lease.py).
    _age_lease(store.base_path)
    return parts


def _age_lease(base):
    import time as _time

    lease = os.path.join(base, atomic.SNAPSHOT_LEASE)
    stale = _time.time() - atomic.DEFAULT_LEASE_TTL - 60
    os.utime(lease, (stale, stale))


def _pk_sets(store):
    return {
        t: frozenset(
            (r["sensor_index"], r["data_time_stamp"])
            for r in store.read(t).select(*S.KEY_COLUMNS).collect()
        )
        for t in S.TABLE_NAMES
    }


def test_snapshot_crash_between_table_commits_rolls_all_forward(spark, tmp_path):
    """The window VERDICT r5 #5 names: writer dies BETWEEN two tables'
    commits (some members swapped, some still staged, marker flipped).
    A healing reader must see the new reading in ALL nine tables —
    never the J1-breaking partial publish."""
    store = _seeded_store(spark, tmp_path)
    parts = _stage_snapshot_then_crash(spark, store)
    # the snapshot committed (marker flipped)…
    import os as _os

    _os.replace(
        _os.path.join(store.base_path, atomic.SNAPSHOT_PENDING),
        _os.path.join(store.base_path, atomic.SNAPSHOT_COMMIT),
    )
    # …but the writer died after swapping only three member tables
    for t in list(parts)[:3]:
        atomic.commit(store.path(t))

    reopened = SensorTableStore(spark, store.base_path, cluster_partitions=2)
    pks = _pk_sets(reopened)
    assert len(set(pks.values())) == 1  # all nine tables agree on PKs
    env = {
        (r["sensor_index"], r["data_time_stamp"]): r["humidity"]
        for r in reopened.read(S.ENVIRONMENTAL).collect()
    }
    assert len(env) == 3 and 99 in env.values()  # the snapshot landed
    assert not _os.path.exists(
        _os.path.join(store.base_path, atomic.SNAPSHOT_COMMIT)
    )


def test_snapshot_crash_mid_staging_rolls_all_back(spark, tmp_path):
    """Writer dies mid-staging: some members staged COMPLETELY (their
    own _SUCCESS present), others not, marker still PENDING. A member's
    private _SUCCESS must NOT publish it — the snapshot never
    committed, so every table reads back wholly old."""
    store = _seeded_store(spark, tmp_path)
    before = _pk_sets(store)
    env_before = sorted(
        (r["sensor_index"], r["data_time_stamp"], r["humidity"])
        for r in store.read(S.ENVIRONMENTAL).collect()
    )
    _stage_snapshot_then_crash(
        spark, store, tables_to_stage={S.ENVIRONMENTAL, S.STATION}
    )
    import os as _os

    assert atomic.is_committed(atomic.staging_path(store.path(S.ENVIRONMENTAL)))

    reopened = SensorTableStore(spark, store.base_path, cluster_partitions=2)
    assert _pk_sets(reopened) == before
    env_after = sorted(
        (r["sensor_index"], r["data_time_stamp"], r["humidity"])
        for r in reopened.read(S.ENVIRONMENTAL).collect()
    )
    assert env_after == env_before  # the staged-with-_SUCCESS member too
    for t in S.TABLE_NAMES:
        assert not _os.path.isdir(atomic.staging_path(store.path(t)))
    for marker in (atomic.SNAPSHOT_PENDING, atomic.SNAPSHOT_COMMIT):
        assert not _os.path.exists(_os.path.join(store.base_path, marker))


def test_upsert_and_compact_end_to_end_after_crash_history(spark, tmp_path):
    """Full-path sanity: a store that has healed from a crash still
    upserts and compacts correctly afterwards."""
    store = _seeded_store(spark, tmp_path)
    _stage_upsert_then_crash(spark, store)
    store = SensorTableStore(spark, store.base_path, cluster_partitions=2)

    store.upsert_wide(_wide(spark, BASE_TS, [[2, "s2", 77, 7.7, 0]]))
    env = {
        (r["sensor_index"], r["data_time_stamp"]): r["humidity"]
        for r in store.read(S.ENVIRONMENTAL).collect()
    }
    assert len(env) == 3
    assert 77 in env.values() and 99 in env.values()

    store.compact(S.ENVIRONMENTAL, target_partitions=1)
    assert store.read(S.ENVIRONMENTAL).count() == 3
    assert not os.path.isdir(atomic.staging_path(store.path(S.ENVIRONMENTAL)))
