from __future__ import annotations

from pyspark.sql import types as T

from purpleair_data_logger_spark import schema as S


def test_field_universe_size_matches_reference():
    # Reference ACCEPTED_FIELD_NAMES_DICT has 115 entries
    # (PurpleAirAPIConstants.py:20-51); keys are separate.
    assert len(S.FIELDS) == 115
    assert len(S.KEY_FIELDS) == 2


def test_sentinel_defaults():
    assert S.ACCEPTED_FIELDS["name"] == ""
    assert S.ACCEPTED_FIELDS["icon"] == 0
    assert S.ACCEPTED_FIELDS["pm2.5_atm"] == 0.0
    assert S.ACCEPTED_FIELDS["0.3_um_count"] == 0.0
    assert S.ACCEPTED_FIELDS["last_seen"] == 0


def test_sql_rename_map():
    assert S.API_TO_SQL["pm2.5"] == "pm2_5"
    assert S.API_TO_SQL["pm2.5_cf_1_a"] == "pm2_5_cf_1_a"
    assert S.API_TO_SQL["0.3_um_count"] == "um_count_0_3"
    assert S.API_TO_SQL["0.3_um_count_a"] == "um_count_a_0_3"
    assert S.API_TO_SQL["10.0_um_count_b"] == "um_count_b_10_0"
    assert S.API_TO_SQL["pm10.0_cf_1"] == "pm10_0_cf_1"
    # round trip
    for api, sql in S.API_TO_SQL.items():
        assert S.SQL_TO_API[sql] == api


def test_nine_tables_and_group_sizes():
    # Field-group sizes per the reference DDL
    # (PurpleAirPSQLQueryStatements.py:11-192; see FIXTURES.md §1).
    sizes = {t: len(S.group_fields(t)) for t in S.TABLE_NAMES}
    assert sizes == {
        S.STATION: 27,
        S.ENVIRONMENTAL: 9,
        S.MISCELLANEOUS: 5,
        S.PM1_0: 9,
        S.PM2_5: 12,
        S.PM2_5_PSEUDO: 18,
        S.PM10_0: 9,
        S.PARTICLE_COUNT: 18,
        S.THINGSPEAK: 8,
    }
    assert sum(sizes.values()) == 115


def test_table_schema_types():
    env = S.table_schema(S.ENVIRONMENTAL)
    by_name = {f.name: f.dataType for f in env.fields}
    assert by_name["data_time_stamp"] == T.TimestampType()
    assert by_name["sensor_index"] == T.IntegerType()
    assert by_name["humidity"] == T.IntegerType()
    assert by_name["pressure_b"] == T.DoubleType()

    st = S.table_schema(S.STATION, at_rest=False)
    by_name = {f.name: f.dataType for f in st.fields}
    # wire form keeps epochs as longs
    assert by_name["last_seen"] == T.LongType()
    assert by_name["data_time_stamp"] == T.LongType()

    wide = S.wide_schema()
    assert len(wide.fields) == 117


def test_bench_compare_absolute_guard_and_best_prior(tmp_path):
    """bench_compare: sub-threshold baselines get the absolute-seconds
    guard (ADVICE r3), and multiple baselines compare per-query best."""
    import json
    import subprocess
    import sys

    b1 = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
          "queries": {"fast": 0.1, "slow": 2.0}}
    b2 = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
          "queries": {"fast": 0.2, "slow": 1.0}}
    now_bad = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
               "queries": {"fast": 1.5, "slow": 1.5}}  # fast: +1.4s over best 0.1
    now_ok = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
              "queries": {"fast": 0.5, "slow": 1.9}}   # fast +0.4s ok; slow < 2x best 1.0
    paths = {}
    for name, data in [("b1", b1), ("b2", b2), ("bad", now_bad), ("ok", now_ok)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(data))
        paths[name] = str(p)
    import os
    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scripts", "bench_compare.py")
    r = subprocess.run([sys.executable, script, paths["bad"], paths["b1"], paths["b2"]],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "fast" in r.stdout
    r = subprocess.run([sys.executable, script, paths["ok"], paths["b1"], paths["b2"]],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no regressions" in r.stdout


def test_bench_compare_jitter_band_and_pinned_evidence(tmp_path):
    """ADVICE r7: (a) a sub-second row >2x best but within the +1s
    absolute band is scheduler jitter, not a regression (asof_last_click
    spanned 0.42-1.14s across identical-code runs); (b) the evidence
    classification is a committed constant — an artifact declaring its
    own regressed row as evidence is rejected, not honored."""
    import json
    import os
    import subprocess
    import sys

    base = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
            "queries": {"jittery": 0.42, "big": 3.0}}
    # jittery 0.42 -> 1.13: 2.7x but only +0.71s -> jitter band, ok;
    # big 3.0 -> 4.2: +1.2s but only 1.4x -> ok.
    now_jitter = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
                  "queries": {"jittery": 1.13, "big": 4.2}}
    # big 3.0 -> 7.0: 2.3x AND +4.0s -> regression even though the
    # artifact tries to exempt it via its own evidence_legs field.
    now_selfcert = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
                    "queries": {"jittery": 0.5, "big": 7.0},
                    "evidence_legs": ["big"]}
    paths = {}
    for name, data in [("base", base), ("jit", now_jitter), ("sc", now_selfcert)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(data))
        paths[name] = str(p)
    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scripts", "bench_compare.py")
    r = subprocess.run([sys.executable, script, paths["jit"], paths["base"]],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no regressions" in r.stdout
    r = subprocess.run([sys.executable, script, paths["sc"], paths["base"]],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "COMMITTED classification" in (r.stdout + r.stderr)
    # a pinned evidence row, by contrast, IS excluded from the guard
    base_e = dict(base, queries={"embedding_neardup_cosine": 1.0, "big": 3.0})
    now_e = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
             "queries": {"embedding_neardup_cosine": 9.0, "big": 3.1},
             "evidence_legs": ["embedding_neardup_cosine"]}
    pe = tmp_path / "base_e.json"; pe.write_text(json.dumps(base_e))
    ne = tmp_path / "now_e.json"; ne.write_text(json.dumps(now_e))
    r = subprocess.run([sys.executable, script, str(ne), str(pe)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_bench_compare_midrange_factor_only(tmp_path):
    """ADVICE r8: the +1s jitter band is a SUB-second-baseline filter
    only — at/above JITTER_BASELINE_SEC the factor alone decides, so
    the absolute band can never waive a mid-range plan regression
    (even if ABS_REGRESSION_SEC is later raised)."""
    import json
    import os
    import subprocess
    import sys

    base = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
            "queries": {"sub": 0.45, "mid": 1.2}}
    # sub 0.45 -> 1.3: 2.9x but +0.85s -> inside the sub-second jitter
    # band, waived; mid 1.2 -> 1.9: 1.6x -> fine.
    now_ok = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
              "queries": {"sub": 1.3, "mid": 1.9}}
    # mid 1.2 -> 2.9: 2.4x -> regression by factor alone.
    now_bad = {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
               "queries": {"sub": 0.5, "mid": 2.9}}
    paths = {}
    for name, data in [("base", base), ("ok", now_ok), ("bad", now_bad)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(data))
        paths[name] = str(p)
    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scripts", "bench_compare.py")
    r = subprocess.run([sys.executable, script, paths["ok"], paths["base"]],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run([sys.executable, script, paths["bad"], paths["base"]],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "mid" in r.stdout


def test_bench_compare_creep_tripwire(tmp_path):
    """VERDICT r12 #1: the per-query dual baseline goes quiet once a
    creeping regression outlives the 10-run recent window (the bad
    times BECOME the recent baseline). The third tripwire asserts the
    rolling median of the stable-subset subtotal against the all-time
    best subtotal (CREEP_FACTOR) — it never self-heals. Synthetic
    histories: (a) the measured r12 host-era pattern stays green,
    (b) a 12-run creep that the dual bound waives trips the creep
    guard."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "bench_compare.py")

    def run_case(root, hist_rows, now_row):
        root.mkdir(exist_ok=True)
        with open(root / "BENCH_HISTORY.jsonl", "w") as fh:
            for row in hist_rows:
                fh.write(json.dumps(row) + "\n")
        now_p = root / "now.json"
        now_p.write_text(json.dumps(now_row))
        env = dict(os.environ, BENCH_COMPARE_ROOT=str(root))
        return subprocess.run([sys.executable, script, str(now_p)],
                              capture_output=True, text=True, env=env)

    def entry(ts, q_sec, stable):
        return {"metric": "m", "value": 1, "unit": "sec", "sf": 0.1,
                "run_id": f"r{ts}", "wall_clock_unix": ts,
                "queries": {"q": q_sec}, "stable_subset_sec": stable}

    # (a) host-era shift (r12 evidence): early quiet-host runs at the
    # all-time best, recent runs co-elevated ~1.15-1.35x on identical
    # code. Median of last 3 = ~20.5/16.8 = 1.22x < 1.8x -> green.
    hist_a = [entry(1000 + i, 1.0, 16.8 + 0.1 * i) for i in range(5)]
    hist_a += [entry(2000 + i, 1.3, 19.5 + 0.5 * i) for i in range(4)]
    now_a = dict(entry(3000, 1.35, 20.5), run_id="now_a")
    r = run_case(tmp_path / "a", hist_a, now_a)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "creep guard:" in r.stdout
    assert "no regressions" in r.stdout

    # (b) a slow creep: 5 good runs (q=1.0, stable=17), then 12 runs
    # drifting q 1.9->3.4 / stable 19->35. The newest 10 runs all have
    # q >= 2.1, so now q=3.6 is only 1.06x the recent-window best
    # (dual bound quiet: trips all-time 3.6x but NOT recent), yet the
    # stable-subset median of the last 3 runs [33.6, 35.0, 36.0] = 35.0
    # is 2.06x the all-time best 17 -> creep trips, exit 1.
    hist_b = [entry(1000 + i, 1.0, 17.0) for i in range(5)]
    hist_b += [entry(2000 + i, 1.9 + 0.14 * i, 19.0 + 1.46 * i)
               for i in range(12)]
    now_b = dict(entry(3000, 3.6, 36.0), run_id="now_b")
    r = run_case(tmp_path / "b", hist_b, now_b)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "STABLE-SUBSET CREEP" in r.stdout
    # and the per-query dual bound really was quiet (the point of the
    # third tripwire): no REGRESSIONS block in the output
    assert "REGRESSIONS" not in r.stdout
