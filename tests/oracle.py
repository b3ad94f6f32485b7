"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row counts and values with columns
sorted by name and rows sorted by all columns — the same shape the
driver hashes. Floats compare with a small tolerance locally (the
catalog rounds everything that's order-sensitive, so exact equality is
the norm)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from purpleair_data_logger_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return round(v, 9)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str, *, float_tol: float = 1e-6):
    """Return (ok, message). Sorts columns by name, then rows."""
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(c.lower() for c in o_cols) and sorted(
        s_cols
    ) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])

    def key(row, order):
        return tuple(str(_norm(row[i])) for i in order)

    s_sorted = sorted(([_norm(row[i]) for i in s_order] for row in s_rows), key=lambda r: [str(x) for x in r])
    o_sorted = sorted(([_norm(row[i]) for i in o_order] for row in o_rows), key=lambda r: [str(x) for x in r])

    for ridx, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for cidx, (sv, ov) in enumerate(zip(sr, orow)):
            if isinstance(sv, float) and isinstance(ov, float):
                if math.isnan(sv) and math.isnan(ov):
                    continue
                if abs(sv - ov) > float_tol * max(1.0, abs(ov)):
                    return False, (
                        f"value mismatch row {ridx} col {sorted(s_cols)[cidx]}: "
                        f"spark={sv!r} oracle={ov!r}"
                    )
            elif sv != ov:
                return False, (
                    f"value mismatch row {ridx} col {sorted(s_cols)[cidx]}: "
                    f"spark={sv!r} oracle={ov!r}"
                )
    return True, f"ok ({len(s_rows)} rows)"
