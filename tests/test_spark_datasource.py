from __future__ import annotations

import glob
import json
import os

import pytest

from purpleair_data_logger_spark import schema as S
from purpleair_data_logger_spark.operators.transforms import cast_epoch_to_timestamp
from purpleair_data_logger_spark.sources import spark_datasource as ds

from tests.conftest import REFERENCE_FIXTURES

FIXTURES = sorted(glob.glob(os.path.join(REFERENCE_FIXTURES, "*.json")))


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    ds.register(spark)


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures unavailable")
def test_batch_read_single_sensor_fixture(spark):
    fixture = FIXTURES[-1]  # the 3.0 variant with stats structs
    with open(fixture) as f:
        payload = json.load(f)
    df = spark.read.format("purpleair").option("fixture_path", fixture).load()
    assert df.columns == [f.sql_name for f in S.KEY_FIELDS + S.FIELDS]
    row = df.collect()[0].asDict()
    assert row["sensor_index"] == payload["sensor"]["sensor_index"]
    assert row["data_time_stamp"] == payload["data_time_stamp"]
    # stats_a flattened with suffix
    if "stats_a" in payload["sensor"]:
        assert row["pm2_5_10minute_a"] == payload["sensor"]["stats_a"]["pm2.5_10minute"]
    # absent fields sentinel-filled
    if "ozone1" not in payload["sensor"]:
        assert row["ozone1"] == 0.0
    # stats["pm2.5"] must NOT clobber the instantaneous sensor["pm2.5"]
    # ('stats' follows 'pm2.5' in payload order; the reference keeps
    # them separate — PurpleAirDataLogger.py:126-127)
    if "pm2.5" in payload["sensor"] and "stats" in payload["sensor"]:
        assert row["pm2_5"] == payload["sensor"]["pm2.5"]
    # storage chain composes
    ts_row = cast_epoch_to_timestamp(df).collect()[0]
    assert ts_row["data_time_stamp"].year >= 2022


def test_batch_read_multi_sensor_payload(spark, tmp_path):
    payload = {
        "api_version": "V1",
        "time_stamp": 1659710288,
        "data_time_stamp": 1659710232,
        "fields": ["sensor_index", "name", "pm2.5_atm", "humidity"],
        "data": [[1, "s1", 1.5, 40], [2, "s2", 2.5, 50]],
    }
    p = tmp_path / "multi.json"
    p.write_text(json.dumps(payload))
    df = spark.read.format("purpleair").option("fixture_path", str(p)).load()
    rows = {r["sensor_index"]: r.asDict() for r in df.collect()}
    assert len(rows) == 2
    assert rows[1]["pm2_5_atm"] == 1.5
    assert rows[2]["humidity"] == 50
    assert rows[1]["model"] == ""  # sentinel


def test_stream_read_polls_per_microbatch(spark, tmp_path):
    payload = {
        "data_time_stamp": 1659710232,
        "fields": ["sensor_index", "name", "pm2.5_atm"],
        "data": [[1, "s1", 1.5]],
    }
    p = tmp_path / "m.json"
    p.write_text(json.dumps(payload))
    q = (
        spark.readStream.format("purpleair")
        .option("fixture_path", str(p))
        .load()
        .writeStream.format("memory")
        .queryName("pa_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM pa_stream_test").collect()
    assert len(out) >= 1
    assert out[0]["sensor_index"] == 1
    assert out[0]["pm2_5_atm"] == 1.5


def test_streaming_ingest_end_to_end(spark, tmp_path):
    """DataSource stream → foreachBatch → 9-table store: the complete
    Structured Streaming ingestion path (BASELINE.json north star)."""
    from purpleair_data_logger_spark.sinks.tables import SensorTableStore
    from purpleair_data_logger_spark.streaming.ingest import start_ingest

    payload = {
        "data_time_stamp": 1659710232,
        "fields": ["sensor_index", "name", "pm2.5_atm", "humidity"],
        "data": [[1, "s1", 1.5, 40], [2, "s2", 2.5, 50]],
    }
    p = tmp_path / "m.json"
    p.write_text(json.dumps(payload))
    store = SensorTableStore(spark, str(tmp_path / "tables"), cluster_partitions=2)
    q = start_ingest(
        spark,
        store,
        checkpoint_path=str(tmp_path / "ckpt"),
        source_options={"fixture_path": str(p)},
        available_now=True,
    )
    q.awaitTermination(180)
    env = store.read(S.ENVIRONMENTAL)
    assert env.count() == 2
    assert {r["humidity"] for r in env.collect()} == {40, 50}
    station = store.read(S.STATION)
    assert {r["name"] for r in station.collect()} == {"s1", "s2"}
    assert station.collect()[0]["data_time_stamp"].year == 2022
