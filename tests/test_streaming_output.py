"""Streaming + sinks + inspection tests."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from intake_spark import datatypes as dt
from intake_spark import output
from intake_spark.inspection import inspect_dataset, schema_report
from intake_spark.session import load_table
from intake_spark.streaming import FileStream, run_stream_to_memory, windowed_counts


def test_streaming_window_matches_batch(spark, tmp_path):
    """File-watch stream over events → windowed agg ≡ same agg on batch.
    (approx_count_distinct used in both, so results are comparable.)"""
    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src)

    batch_df = spark.read.parquet(src)
    expected = {
        r.window_start: (r.n_events, r.value_sum)
        for r in windowed_counts(batch_df, window="1 day").collect()
    }

    stream = FileStream(data=dt.Parquet(url=src)).read(
        spark=spark, schema=batch_df.schema, max_files_per_trigger=2
    )
    assert stream.isStreaming
    agg = windowed_counts(stream, window="1 day", watermark="2 days")
    run_stream_to_memory(agg, "win_test", timeout_s=120)
    got = {
        r.window_start: (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    assert got == expected


def test_file_stream_requires_schema(spark, tmp_path):
    src = str(tmp_path / "s2")
    load_table(spark, SF_SMALL, "region").write.mode("overwrite").parquet(src)
    with pytest.raises(Exception):
        FileStream(data=dt.Parquet(url=src)).read(spark=spark)  # no schema


def test_sinks_roundtrip(spark, tmp_path):
    region = load_table(spark, SF_SMALL, "region")
    for fn, cls in [
        (output.to_parquet, dt.Parquet),
        (output.to_csv, dt.CSV),
        (output.to_json, dt.JSONFile),
        (output.to_orc, dt.ORC),
    ]:
        url = str(tmp_path / cls.__name__.lower())
        desc = fn(region, url)
        assert isinstance(desc, cls)
        back = desc.to_reader().read(spark=spark)
        assert back.count() == 5


def test_partitioned_parquet_sink(spark, tmp_path):
    nation = load_table(spark, SF_SMALL, "nation")
    url = str(tmp_path / "nation_part")
    output.to_parquet(nation, url, partition_by=["n_regionkey"])
    import os

    subdirs = [d for d in os.listdir(url) if d.startswith("n_regionkey=")]
    assert len(subdirs) == 5
    # partition pruning: filter on the partition key reads 1/5 of dirs
    back = spark.read.parquet(url).filter("n_regionkey = 2")
    assert back.count() == 5


def test_save_as_table(spark):
    region = load_table(spark, SF_SMALL, "region")
    output.to_table(region, "region_tbl", comment="five regions")
    assert spark.sql("SELECT count(*) AS n FROM region_tbl").first().n == 5
    spark.sql("DROP TABLE region_tbl")


def test_catalog_yaml_sink(tmp_path):
    from intake_spark.catalog import Catalog
    from intake_spark.readers import SparkParquet

    cat = Catalog()
    cat["r"] = SparkParquet(data=dt.Parquet(url=f"{SF_SMALL}/region.parquet"))
    desc = output.catalog_to_yaml(cat, str(tmp_path / "c.yaml"))
    assert isinstance(desc, dt.CatalogData)


def test_inspect_dataset(spark):
    rep = inspect_dataset(f"{SF_SMALL}/lineitem.parquet", spark=spark)
    assert rep["datatype"] == "Parquet"
    assert "l_orderkey" in rep["columns"]
    assert rep["bytes"] > 0 and rep["n_files"] == 1
    assert rep["npartitions"] >= 1


def test_schema_report(spark):
    rep = schema_report(load_table(spark, SF_SMALL, "orders"))
    assert rep["dtypes"]["o_orderkey"] == "bigint"
