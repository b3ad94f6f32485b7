"""Type-lint every catalog oracle's output schema via DuckDB DESCRIBE.

Round-4 post-mortem: `time_weighted_hourly` was bit-exact against its
oracle yet red at the driver's hash gate because the oracle emitted a
bare `sum(BIGINT)` — DuckDB widens that to HUGEINT (int128), which the
driver serializes differently from Spark's long. Rather than grepping
SELECT lists (fragile), this test asks DuckDB itself for each oracle's
output column types and fails on any type Spark cannot produce, so no
future rotation can trip on the same serialization artifact.

No Spark session needed — DESCRIBE only plans the query.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from purpleair_data_logger_spark.io import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# DuckDB types with no Spark/driver-hash-stable analog. HUGEINT is the
# one that bit us; the rest are the same class of silent widenings.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def _connect():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


@pytest.fixture(scope="module")
def con():
    c = _connect()
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_output_types_are_spark_representable(con, name):
    sql = entrymod.oracle_sql()[name]
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in rows
        if any(f in typ.upper() for f in _FORBIDDEN)
    ]
    assert not offenders, (
        f"oracle '{name}' emits driver-hash-unstable column types "
        f"{offenders}; wrap the aggregate in CAST(... AS BIGINT/DOUBLE) "
        f"(DuckDB sum(BIGINT) widens to HUGEINT — see round-4 "
        f"time_weighted_hourly)"
    )
