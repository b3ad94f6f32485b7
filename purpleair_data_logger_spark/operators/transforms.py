"""Row-transform operators: flatten, zip, conformance, casts, vertical split.

Spark-first re-expressions of the reference's per-dict transforms
(SURVEY.md §2.2 T1-T7). Each works on whole DataFrames — one narrow
projection the optimizer can fuse, instead of the reference's
row-at-a-time dict mutation.

Reference parity notes (file:line in /root/reference/purpleair_data_logger/):

* T1 flatten        — PurpleAirDataLogger.py:118-148
* T2 fields×data    — PurpleAirDataLogger.py:193-208
* T3 conformance    — PurpleAirDataLogger.py:81-99 (dup: PurpleAirAPI.py:348-363)
* T4 vertical split — PurpleAirPSQLDataLogger.py:153-347 (9 projection blocks)
* T5 epoch cast     — PurpleAirPSQLDataLogger.py:138-151
* T7 rename map     — PurpleAirPSQLDataLogger.py:311-328
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from purpleair_data_logger_spark import schema as S

# Extra columns the reference flatten produces that are NOT part of the
# accepted field universe (PurpleAirDataLogger.py:128,135,145). The
# reference carries them in the dict and its sinks silently ignore them.
_STATS_EXTRA_COLUMNS = ("stats_pm2.5", "pm2.5_time_stamp", "time_stamp_a", "time_stamp_b")

_STATS_KEYS = (
    "pm2.5",
    "pm2.5_10minute",
    "pm2.5_30minute",
    "pm2.5_60minute",
    "pm2.5_6hour",
    "pm2.5_24hour",
    "pm2.5_1week",
    "time_stamp",
)


def _nested(parent: str, key: str) -> Column:
    # Keys like "pm2.5" need backtick quoting inside a field path.
    return F.col(f"{parent}.`{key}`")


def flatten_sensor_struct(df: DataFrame, *, keep_extras: bool = False) -> DataFrame:
    """T1: single-sensor payload → one-level frame (API field names).

    Input shape: columns ``api_version, time_stamp, data_time_stamp,
    sensor`` where ``sensor`` is the nested struct from
    ``GET /v1/sensors/{index}`` (fixture shape: FIXTURES.md §2.1).

    Mirrors PurpleAirDataLogger.py:118-148: ``sensor.stats`` maps to the
    un-suffixed pseudo-average columns (plus the quirky ``stats_pm2.5``
    and ``pm2.5_time_stamp`` extras), ``sensor.stats_a``/``stats_b`` map
    to ``_a``/``_b``-suffixed columns (plus ``time_stamp_a/b``), every
    other ``sensor.*`` key passes through. Pure nested projection — no
    Python per row, stays in whole-stage codegen.
    """
    sensor_type = dict(zip(df.schema.fieldNames(), df.schema.fields))["sensor"].dataType
    sensor_keys = [f.name for f in sensor_type.fields]

    # (alias, column) pairs; duplicates collapse last-wins below, matching
    # the reference's dict-overwrite behavior when a scalar key (e.g.
    # "pm2.5_a") coexists with its stats_a-derived twin.
    pairs: list[tuple[str, Column]] = [("data_time_stamp", F.col("data_time_stamp"))]
    for key in sensor_keys:
        if key == "stats":
            if keep_extras:
                pairs.append(("stats_pm2.5", _nested("sensor.stats", "pm2.5")))
            for k in _STATS_KEYS[1:-1]:
                pairs.append((k, _nested("sensor.stats", k)))
            if keep_extras:
                pairs.append(("pm2.5_time_stamp", _nested("sensor.stats", "time_stamp")))
        elif key in ("stats_a", "stats_b"):
            suffix = key[-1]
            for k in _STATS_KEYS[:-1]:
                pairs.append((f"{k}_{suffix}", _nested(f"sensor.{key}", k)))
            if keep_extras:
                pairs.append((f"time_stamp_{suffix}", _nested(f"sensor.{key}", "time_stamp")))
        else:
            pairs.append((key, _nested("sensor", key)))

    last: dict[str, Column] = {}
    for name, c in pairs:
        last[name] = c  # later assignment wins, like dict insert
    return df.select(*[c.alias(n) for n, c in last.items()])


def zip_fields_data(
    spark: SparkSession,
    payload: Mapping,
    *,
    conform_after: bool = True,
) -> DataFrame:
    """T2: multi-sensor payload (``fields`` list + ``data`` rows) → frame.

    The payload's ``fields`` is a positional header for each row of
    ``data`` (shape documented at PurpleAirDataLogger.py:184-190); the
    shared ``data_time_stamp`` is stamped onto every row
    (PurpleAirDataLogger.py:202). Spark-native: apply the header as a
    schema in one ``createDataFrame`` instead of zipping per row.
    """
    fields: Sequence[str] = list(payload["fields"])
    stamp = payload["data_time_stamp"]
    rows = [tuple(r) + (stamp,) for r in payload["data"]]
    col_names = [*fields, "data_time_stamp"]
    schema_fields = []
    for name in col_names:
        reg = S.BY_API_NAME.get(name)
        schema_fields.append(
            f"`{name}` {reg.wire_type.simpleString()}" if reg else f"`{name}` string"
        )
    df = spark.createDataFrame(rows, schema=", ".join(schema_fields))
    return conform(df) if conform_after else df


def conform(
    df: DataFrame,
    *,
    use_null: bool = False,
    keep_extras: bool = False,
) -> DataFrame:
    """T3: schema conformance — every accepted field present, gaps filled.

    Default preserves the reference's observable sentinel semantics
    (missing/NULL → ``0`` / ``0.0`` / ``""``, PurpleAirDataLogger.py:81-99
    — note the DDL allows NULL but the reference always fills sentinels).
    ``use_null=True`` switches to honest SQL NULLs (SURVEY.md §7.4 risk 1).

    Output column order is fixed: keys, then registry order — so every
    downstream vertical split / write sees one stable wide schema.
    """
    present = set(df.columns)
    cols: list[Column] = []
    for f in S.KEY_FIELDS + S.FIELDS:
        name = f.api_name
        typ = f.wire_type.simpleString()
        if name in present:
            c = F.col(f"`{name}`").cast(typ)
            if not use_null and f.group != "__key__":
                c = F.coalesce(c, F.lit(f.sentinel).cast(typ))
        elif use_null or f.group == "__key__":
            c = F.lit(None).cast(typ)
        else:
            c = F.lit(f.sentinel).cast(typ)
        cols.append(c.alias(name))
    if keep_extras:
        registry = {f.api_name for f in S.KEY_FIELDS + S.FIELDS}
        cols += [F.col(f"`{c}`") for c in df.columns if c not in registry]
    return df.select(*cols)


def rename_to_sql(df: DataFrame) -> DataFrame:
    """T7: API names → SQL-safe names (``pm2.5``→``pm2_5``, …)."""
    return df.select(
        *[F.col(f"`{c}`").alias(S.API_TO_SQL.get(c, c)) for c in df.columns]
    )


def rename_to_api(df: DataFrame) -> DataFrame:
    """T7 inverse: SQL-safe names → API names."""
    return df.select(
        *[F.col(f"`{c}`").alias(S.SQL_TO_API.get(c, c)) for c in df.columns]
    )


def cast_epoch_to_timestamp(df: DataFrame) -> DataFrame:
    """T5: epoch-seconds columns → UTC timestamps.

    Spark-native ``timestamp_seconds`` replaces the reference's per-value
    ``datetime.fromtimestamp(ts, timezone.utc)`` loop
    (PurpleAirPSQLDataLogger.py:138-151). NULL passes through, matching
    the reference's ``None`` branch.
    """
    epoch_cols = [c for c in df.columns if c in S.EPOCH_FIELDS]
    out = df
    for c in epoch_cols:
        out = out.withColumn(c, F.timestamp_seconds(F.col(c)))
    return out


def to_storage_form(df: DataFrame, *, use_null: bool = False) -> DataFrame:
    """Payload frame (API names, wire types) → at-rest wide frame.

    conform → rename → epoch cast: the full write-path projection chain,
    still a single Catalyst-fusable select pipeline.
    """
    return cast_epoch_to_timestamp(rename_to_sql(conform(df, use_null=use_null)))


def vertical_split(df: DataFrame) -> dict[str, DataFrame]:
    """T4: one wide at-rest frame → the nine per-group frames.

    Each output selects the shared key plus its field group — the
    Spark-native form of the reference's nine INSERT projections
    (PurpleAirPSQLDataLogger.py:153-347). Column pruning means each
    written table only materializes its own columns.
    """
    out: dict[str, DataFrame] = {}
    for table in S.TABLE_NAMES:
        cols = S.KEY_COLUMNS + [f.sql_name for f in S.group_fields(table)]
        out[table] = df.select(*cols)
    return out


def reading_from_json_payload(
    spark: SparkSession, payload: Mapping, *, keep_extras: bool = False
) -> DataFrame:
    """Single-sensor JSON payload (parsed dict) → flattened 1-row frame.

    Builds the nested frame via ``spark.read.json`` semantics
    (createDataFrame on the raw dict), then applies T1. Used by the
    streaming poll source and the fixture-driven tests.
    """
    import json as _json

    parsed = spark.read.json(
        spark.sparkContext.parallelize([_json.dumps(payload)], 1)
    )
    return flatten_sensor_struct(parsed, keep_extras=keep_extras)
