from __future__ import annotations

from pyspark.sql import functions as F

from purpleair_data_logger_spark import dashboard as dash
from purpleair_data_logger_spark import schema as S
from purpleair_data_logger_spark.io import load_table
from purpleair_data_logger_spark.operators import skew
from purpleair_data_logger_spark.operators import transforms as X
from purpleair_data_logger_spark.sinks.tables import SensorTableStore

BASE = 1659708000  # hour-aligned


def _seeded_store(spark, tmp_path) -> SensorTableStore:
    store = SensorTableStore(spark, str(tmp_path / "t"), cluster_partitions=2)
    rows = []
    for sensor in (1, 2):
        for i in range(24):
            ts = BASE + i * 300
            rows.append(
                [sensor, f"sensor {sensor}", 40 + i % 5, 1.0 * i, 20 + sensor, ts]
            )
    payload = {
        "data_time_stamp": BASE,
        "fields": ["sensor_index", "name", "humidity", "pm2.5_atm", "temperature", "last_seen"],
        "data": rows,
    }
    wide = X.to_storage_form(X.zip_fields_data(spark, payload)).withColumn(
        "data_time_stamp", F.col("last_seen")
    )
    store.append_wide(wide)
    return store


def test_directory_and_panels(spark, tmp_path):
    store = _seeded_store(spark, tmp_path)

    d = dash.directory(store).collect()
    assert [r["sensor_index"] for r in d] == [1, 2]
    assert d[0]["name_and_sensor_index"] == "sensor 1, 1"

    p = dash.panel(
        store,
        "environmental",
        sensor_index=1,
        start_epoch=BASE,
        end_epoch=BASE + 7200,
        interval_seconds=600,
    ).collect()
    assert len(p) == 12  # 24 readings @300s → 12 buckets of 600s
    assert all(r["max_temperature"] == 21 for r in p)

    txt = dash.station_text_panel(
        store, start_epoch=BASE, end_epoch=BASE + 7200
    ).collect()
    assert len(txt) == 48
    assert txt[0]["name"] in ("sensor 1", "sensor 2")

    ts = dash.thingspeak_text_panel(
        store, start_epoch=BASE, end_epoch=BASE + 7200
    ).collect()
    assert len(ts) == 48
    assert "primary_id_a" in ts[0].asDict()


def test_register_views_sql_entry(spark, tmp_path):
    store = _seeded_store(spark, tmp_path)
    dash.register_views(store)
    out = spark.sql(
        f"""
        SELECT sensor_index, max(humidity) AS max_humidity
        FROM {S.ENVIRONMENTAL}
        GROUP BY sensor_index ORDER BY sensor_index
        """
    ).collect()
    assert [r["sensor_index"] for r in out] == [1, 2]
    assert out[0]["max_humidity"] == 44


def test_salted_agg_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): r
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): r
        for r in skew.salted_agg(e, ["event_type"], "value").collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k]["n"] == salted[k]["n"]
        assert abs(plain[k]["sum"] - salted[k]["sum"]) < 1e-6
        assert plain[k]["min"] == salted[k]["min"]
        assert plain[k]["max"] == salted[k]["max"]


def test_replicated_skew_join_matches_broadcast(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = e.join(c, "user_id").count()
    salted = skew.replicated_skew_join(e, c, "user_id").count()
    assert plain == salted


def test_sessionize_operator(spark):
    import datetime

    def t(m):
        return datetime.datetime(2024, 1, 1, 10, m)

    from purpleair_data_logger_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(1, t(0)), (1, t(10)), (1, t(50)), (2, t(0))],
        "user_id int, ts timestamp",
    )
    out = {(r["user_id"], r["ts"].minute): r["session_id"] for r in sessionize(df, "user_id", "ts", gap_seconds=1800).collect()}
    assert out[(1, 0)] == 1
    assert out[(1, 10)] == 1  # within 30 min gap
    assert out[(1, 50)] == 2  # 40 min gap → new session
    assert out[(2, 0)] == 1
