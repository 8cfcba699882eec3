import pytest

from matdb_spark.schema import Dimension, Schema, Value


def grid_schema():
    # FIXTURES.md F1 (reference tests/matdb.rs:14-22)
    return Schema(
        dimensions=[Dimension("time", 50), Dimension("sensor_id", 10)],
        values=[Value("value")],
    )


def test_roundtrip_json(tmp_path):
    s = grid_schema()
    p = str(tmp_path / "schema.json")
    s.save(p)
    loaded = Schema.load(p)
    assert loaded == s
    assert loaded.dim_names == ["time", "sensor_id"]
    assert loaded.value_names == ["value"]
    assert loaded.chunk_cols == ["__chunk_time", "__chunk_sensor_id"]


def test_spark_schema_nullability():
    s = grid_schema()
    st = s.spark_schema()
    assert [f.nullable for f in st.fields] == [False, False, True]
    assert st.fieldNames() == ["time", "sensor_id", "value"]


def test_validation():
    with pytest.raises(ValueError):
        Schema(dimensions=[], values=[Value("v")])
    with pytest.raises(ValueError):
        Schema(dimensions=[Dimension("a"), Dimension("a")], values=[])
    with pytest.raises(ValueError):
        Schema(dimensions=[Dimension("__txn")], values=[])
    with pytest.raises(ValueError):
        Schema(dimensions=[Dimension("a", type="nonsense")], values=[]).spark_schema()
