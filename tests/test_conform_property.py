"""Property-based round-trip invariant (SURVEY.md §5.4): conform()
always yields exactly the registry schema with sentinel fill, no matter
which fields the payload dropped — mirroring the reference's
``_validate_sensor_data_before_insert`` semantics
(PurpleAirDataLogger.py:81-99)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from purpleair_data_logger_spark import schema as S
from purpleair_data_logger_spark.operators import transforms as X

FIELD_NAMES = [f.api_name for f in S.FIELDS]


@given(
    subset=st.sets(st.sampled_from(FIELD_NAMES), max_size=12),
    sensor_index=st.integers(min_value=0, max_value=10**6),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_conform_always_full_registry(spark, subset, sensor_index):
    fields = ["sensor_index", *subset]
    values = [sensor_index]
    for name in subset:
        f = S.BY_API_NAME[name]
        values.append({"int": 7, "double": 1.5, "string": "x", "epoch_ts": 1659710000}[f.type_tag])
    payload = {
        "data_time_stamp": 1659710232,
        "fields": fields,
        "data": [values],
    }
    df = X.zip_fields_data(spark, payload)
    assert df.columns == [f.api_name for f in S.KEY_FIELDS + S.FIELDS]
    row = df.collect()[0].asDict()
    for f in S.FIELDS:
        if f.api_name not in subset:
            assert row[f.api_name] == f.sentinel, f.api_name
        else:
            assert row[f.api_name] is not None
