"""Field registry: the single source of truth for the sensor data model.

The reference fixes its schema as a closed dictionary of ~110 accepted
field names with sentinel null-defaults (reference
``purpleair_data_logger/PurpleAirAPIConstants.py:20-51``) and vertically
partitions one logical reading into nine relational tables sharing the
composite key ``(data_time_stamp, sensor_index)`` (DDL at reference
``purpleair_data_logger/PurpleAirPSQLQueryStatements.py:11-192``).

This module re-expresses that data model Spark-natively:

* each field carries its API name (as it appears in PurpleAir JSON
  payloads, e.g. ``pm2.5_atm`` or ``0.3_um_count``), its SQL-safe name
  (identifiers can't start with a digit or contain dots, e.g.
  ``pm2_5_atm`` / ``um_count_0_3`` — the reference's rename convention,
  visible at ``PurpleAirPSQLDataLogger.py:311-328``), its Spark type,
  its sentinel default, and its field-group (= target table);
* per-table ``StructType`` schemas are derived by slicing the registry,
  never hand-maintained;
* the sentinel-fill convention ("missing → 0 / 0.0 / ''", not NULL —
  reference ``PurpleAirDataLogger.py:81-99``) is preserved as the
  default and flag-gated where operators accept ``use_null``.

Epoch-seconds fields (``last_seen``, ``last_modified``, ``date_created``
and the key ``data_time_stamp``) arrive as integers and are stored as
UTC timestamps, mirroring the reference's
``_convert_unix_epoch_timestamp_to_psql_timestamp``
(``PurpleAirPSQLDataLogger.py:138-151``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Table (field-group) names — reference PurpleAirPSQLDataLogger.py:51-61.
# ---------------------------------------------------------------------------

STATION = "station_information_and_status_fields"
ENVIRONMENTAL = "environmental_fields"
MISCELLANEOUS = "miscellaneous_fields"
PM1_0 = "pm1_0_fields"
PM2_5 = "pm2_5_fields"
PM2_5_PSEUDO = "pm2_5_pseudo_average_fields"
PM10_0 = "pm10_0_fields"
PARTICLE_COUNT = "particle_count_fields"
THINGSPEAK = "thingspeak_fields"

TABLE_NAMES: tuple[str, ...] = (
    STATION,
    ENVIRONMENTAL,
    MISCELLANEOUS,
    PM1_0,
    PM2_5,
    PM2_5_PSEUDO,
    PM10_0,
    PARTICLE_COUNT,
    THINGSPEAK,
)

# Logical type tags. EPOCH_TS: integer seconds on the wire, timestamp at
# rest. INT/DOUBLE/STRING map 1:1 onto Spark types.
INT = "int"
DOUBLE = "double"
STRING = "string"
EPOCH_TS = "epoch_ts"

_SPARK_TYPE = {
    INT: T.IntegerType(),
    DOUBLE: T.DoubleType(),
    STRING: T.StringType(),
    EPOCH_TS: T.TimestampType(),
}

# Wire (API JSON) type for each logical tag — what the field looks like
# *before* the epoch→timestamp cast.
_WIRE_TYPE = {
    INT: T.IntegerType(),
    DOUBLE: T.DoubleType(),
    STRING: T.StringType(),
    EPOCH_TS: T.LongType(),
}

_SENTINEL = {INT: 0, DOUBLE: 0.0, STRING: "", EPOCH_TS: 0}


@dataclass(frozen=True)
class Field:
    """One entry of the closed field universe."""

    api_name: str  # name in the PurpleAir JSON payload
    sql_name: str  # SQL-safe identifier used in tables / DataFrames
    type_tag: str  # INT | DOUBLE | STRING | EPOCH_TS
    group: str  # owning table name

    @property
    def spark_type(self) -> T.DataType:
        return _SPARK_TYPE[self.type_tag]

    @property
    def wire_type(self) -> T.DataType:
        return _WIRE_TYPE[self.type_tag]

    @property
    def sentinel(self):
        return _SENTINEL[self.type_tag]


def _sql_safe(api_name: str) -> str:
    """``pm2.5_atm`` → ``pm2_5_atm``; ``0.3_um_count`` → ``um_count_0_3``.

    Mirrors the reference's rename convention for identifiers that
    contain dots or start with digits (comments at reference
    ``PurpleAirPSQLQueryStatements.py:72,89,109,135,152``).
    """
    if api_name[0].isdigit():
        # "0.3_um_count" / "0.3_um_count_a" → "um_count_0_3" / "um_count_a_0_3"
        size, _, rest = api_name.partition("_um_count")
        suffix = rest.lstrip("_")  # "" | "a" | "b"
        parts = ["um_count"] + ([suffix] if suffix else []) + size.split(".")
        return "_".join(parts)
    return api_name.replace(".", "_")


def _fields(group: str, type_tag: str, api_names: Iterable[str]) -> list[Field]:
    return [Field(n, _sql_safe(n), type_tag, group) for n in api_names]


def _abx(*bases: str) -> list[str]:
    """Expand each base name into [base, base_a, base_b] triples."""
    out: list[str] = []
    for b in bases:
        out += [b, f"{b}_a", f"{b}_b"]
    return out


# ---------------------------------------------------------------------------
# Key fields — composite PK across all nine tables.
# ---------------------------------------------------------------------------

KEY_FIELDS: list[Field] = [
    Field("data_time_stamp", "data_time_stamp", EPOCH_TS, "__key__"),
    Field("sensor_index", "sensor_index", INT, "__key__"),
]

# ---------------------------------------------------------------------------
# The closed field universe, grouped exactly as the reference's nine
# tables group them (field lists per PurpleAirAPIConstants.py:20-51,
# grouping per the DDL in PurpleAirPSQLQueryStatements.py:11-192).
# ---------------------------------------------------------------------------

FIELDS: list[Field] = (
    _fields(STATION, STRING, ["name"])
    + _fields(STATION, INT, ["icon"])
    + _fields(STATION, STRING, ["model", "hardware"])
    + _fields(STATION, INT, ["location_type", "private"])
    + _fields(STATION, DOUBLE, ["latitude", "longitude", "altitude"])
    + _fields(STATION, INT, ["position_rating", "led_brightness"])
    + _fields(STATION, STRING, ["firmware_version", "firmware_upgrade"])
    + _fields(STATION, INT, ["rssi", "uptime", "pa_latency", "memory"])
    + _fields(STATION, EPOCH_TS, ["last_seen", "last_modified", "date_created"])
    + _fields(
        STATION,
        INT,
        [
            "channel_state",
            "channel_flags",
            "channel_flags_manual",
            "channel_flags_auto",
            "confidence",
            "confidence_manual",
            "confidence_auto",
        ],
    )
    + _fields(ENVIRONMENTAL, INT, _abx("humidity", "temperature"))
    + _fields(ENVIRONMENTAL, DOUBLE, _abx("pressure"))
    + _fields(MISCELLANEOUS, DOUBLE, _abx("voc") + ["ozone1", "analog_input"])
    + _fields(PM1_0, DOUBLE, _abx("pm1.0", "pm1.0_atm", "pm1.0_cf_1"))
    + _fields(PM2_5, DOUBLE, _abx("pm2.5_alt", "pm2.5", "pm2.5_atm", "pm2.5_cf_1"))
    + _fields(
        PM2_5_PSEUDO,
        DOUBLE,
        _abx(
            "pm2.5_10minute",
            "pm2.5_30minute",
            "pm2.5_60minute",
            "pm2.5_6hour",
            "pm2.5_24hour",
            "pm2.5_1week",
        ),
    )
    + _fields(PM10_0, DOUBLE, _abx("pm10.0", "pm10.0_atm", "pm10.0_cf_1"))
    + _fields(
        PARTICLE_COUNT,
        DOUBLE,
        _abx(
            "0.3_um_count",
            "0.5_um_count",
            "1.0_um_count",
            "2.5_um_count",
            "5.0_um_count",
            "10.0_um_count",
        ),
    )
    + _fields(
        THINGSPEAK,
        INT,
        ["primary_id_a"],
    )
    + _fields(THINGSPEAK, STRING, ["primary_key_a"])
    + _fields(THINGSPEAK, INT, ["secondary_id_a"])
    + _fields(THINGSPEAK, STRING, ["secondary_key_a"])
    + _fields(THINGSPEAK, INT, ["primary_id_b"])
    + _fields(THINGSPEAK, STRING, ["primary_key_b"])
    + _fields(THINGSPEAK, INT, ["secondary_id_b"])
    + _fields(THINGSPEAK, STRING, ["secondary_key_b"])
)

# ---------------------------------------------------------------------------
# Derived lookups.
# ---------------------------------------------------------------------------

BY_API_NAME: dict[str, Field] = {f.api_name: f for f in KEY_FIELDS + FIELDS}
BY_SQL_NAME: dict[str, Field] = {f.sql_name: f for f in KEY_FIELDS + FIELDS}

#: api_name → sentinel default; the Spark-native equivalent of the
#: reference's ACCEPTED_FIELD_NAMES_DICT (PurpleAirAPIConstants.py:20-51).
ACCEPTED_FIELDS: dict[str, object] = {f.api_name: f.sentinel for f in FIELDS}

#: Bidirectional rename maps (SURVEY.md §2.2 T7).
API_TO_SQL: dict[str, str] = {f.api_name: f.sql_name for f in KEY_FIELDS + FIELDS}
SQL_TO_API: dict[str, str] = {v: k for k, v in API_TO_SQL.items()}


def group_fields(table: str) -> list[Field]:
    """Fields belonging to one of the nine tables (keys excluded)."""
    if table not in TABLE_NAMES:
        raise ValueError(f"unknown table {table!r}; expected one of {TABLE_NAMES}")
    return [f for f in FIELDS if f.group == table]


def table_schema(table: str, *, at_rest: bool = True) -> T.StructType:
    """StructType for one table: keys first, then its field group.

    ``at_rest=True`` gives timestamp types for epoch fields (stored
    form); ``at_rest=False`` gives the wire form (epoch seconds as
    longs), useful when building DataFrames straight from payloads.
    """
    fields = KEY_FIELDS + group_fields(table)
    pick = (lambda f: f.spark_type) if at_rest else (lambda f: f.wire_type)
    return T.StructType(
        [T.StructField(f.sql_name, pick(f), nullable=f.group != "__key__") for f in fields]
    )


def wide_schema(*, at_rest: bool = True) -> T.StructType:
    """The full ~110-column logical reading: keys + every field group."""
    fields = KEY_FIELDS + FIELDS
    pick = (lambda f: f.spark_type) if at_rest else (lambda f: f.wire_type)
    return T.StructType(
        [T.StructField(f.sql_name, pick(f), nullable=f.group != "__key__") for f in fields]
    )


#: Columns every table shares; the composite primary key.
KEY_COLUMNS: list[str] = [f.sql_name for f in KEY_FIELDS]

#: Fields that arrive as epoch seconds and are stored as timestamps.
EPOCH_FIELDS: list[str] = [f.sql_name for f in KEY_FIELDS + FIELDS if f.type_tag == EPOCH_TS]
