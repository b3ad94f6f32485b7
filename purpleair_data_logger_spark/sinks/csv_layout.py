"""Reference CSV layout: the nine per-table append files.

The reference's CSV logger writes each sensor reading into nine fixed
files whose names and column headers are declared in
``PurpleAirCSVDataLoggerConstants.py:1-193`` (e.g. ``pm2.5_fields.csv``
with header ``data_time_stamp,sensor_index,pm2.5,...``). This module
reproduces that layout Spark-first:

- one *directory* per reference file name (Spark's parallel CSV writer
  emits part files; a directory named ``pm2.5_fields.csv`` is the
  distributed equivalent of the reference's single append file),
- headers use the reference's wire (API) field names — dots and all —
  in the exact reference order (verified 1:1 against the reference
  constants by ``tests/test_csv_layout.py``),
- timestamp-typed columns are re-encoded as epoch seconds, matching the
  raw payload values the reference writes
  (``PurpleAirCSVDataLogger.py:151-309`` serializes the JSON values
  verbatim),
- quoting/escaping is Spark's RFC-4180 writer — the reference's
  hand-rolled ``str(v) + ","`` concatenation corrupts on embedded
  commas; documented deviation, shared with ``write_csv_sink``.

Scale posture: nine narrow projections of the same wide batch, each a
column-pruned parallel write — no shuffle, no collect.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S


def reference_csv_file_name(table: str) -> str:
    """``pm2_5_pseudo_average_fields`` → ``pm2.5_pseudo_average_fields.csv``.

    Inverts the ``_sql_safe`` rename for the table-name digits (the
    reference file names keep the API-style dots).
    """
    return re.sub(r"^pm(\d+)_(\d+)", r"pm\1.\2", table) + ".csv"


CSV_FILE_NAMES: dict[str, str] = {t: reference_csv_file_name(t) for t in S.TABLE_NAMES}


def csv_header(table: str) -> list[str]:
    """Reference header for one file: key fields then the table's wire
    field names in registry (== reference) order."""
    return [f.api_name for f in S.KEY_FIELDS] + [
        f.api_name for f in S.FIELDS if f.group == table
    ]


def _wire_projection(wide: DataFrame, table: str) -> DataFrame:
    """Project one table's columns off the wide frame, renamed back to
    wire names with EPOCH_TS columns re-encoded as epoch seconds."""
    cols = []
    for f in S.KEY_FIELDS + [x for x in S.FIELDS if x.group == table]:
        c = F.col(f.sql_name)
        if f.type_tag == S.EPOCH_TS:
            c = F.unix_timestamp(c).cast("long")
        cols.append(c.alias(f.api_name))
    return wide.select(*cols)


def write_reference_csv_layout(
    wide: DataFrame, root: str, *, mode: str = "append"
) -> dict[str, str]:
    """K3 with reference file-layout parity: split a wide batch into the
    nine reference CSV files under ``root``. Returns table → path."""
    paths = {}
    for table in S.TABLE_NAMES:
        path = os.path.join(root, CSV_FILE_NAMES[table])
        (
            _wire_projection(wide, table)
            .write.mode(mode)
            .option("header", True)
            .csv(path)
        )
        paths[table] = path
    return paths
