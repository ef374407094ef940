"""V1 DataSource interface conformance (SURVEY §5 verify_datasource_interface)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from intake_spark import datatypes as dt
from intake_spark.readers import SparkParquet
from intake_spark.v1source import V1SourceAdapter


@pytest.fixture()
def src(spark):
    reader = SparkParquet(data=dt.Parquet(url=f"{SF_SMALL}/nation.parquet"))
    return V1SourceAdapter(reader, spark=spark)


def test_interface_conformance(src):
    assert V1SourceAdapter.verify_interface(src)
    assert src.container == "dataframe"


def test_discover(src):
    schema = src.discover()
    assert schema["dtype"]["n_nationkey"] == "int"
    assert schema["shape"][1] == 3
    assert schema["npartitions"] >= 1


def test_read_and_partitions(src):
    full = src.read()
    assert len(full) == 25
    parts = [src.read_partition(i) for i in range(src.discover()["npartitions"])]
    assert sum(len(p) for p in parts) == 25
    chunked = sum(len(c) for c in src.read_chunked())
    assert chunked == 25
    with pytest.raises(IndexError):
        src.read_partition(999)


def test_to_spark_and_close(src):
    df = src.to_spark()
    assert df.count() == 25
    src.close()
    assert src._df is None
    # context-manager form
    with src as s:
        assert len(s.read()) == 25
