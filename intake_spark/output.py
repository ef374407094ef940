"""Sinks: writes that return a datatype description of the written artifact,
so outputs are immediately re-catalogable (parity: intake/readers/
output.py:1-7 — "all return a new datatype instance").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from intake_spark import datatypes as dt


def to_parquet(df: DataFrame, url: str, mode: str = "overwrite", partition_by: list[str] | None = None, **options) -> dt.Parquet:
    """df → parquet directory (parity: PandasToParquet output.py:36-45).
    ``partition_by`` yields hive-partitioned layout → partition pruning for
    downstream readers."""
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(url)
    return dt.Parquet(url=url)


def to_csv(df: DataFrame, url: str, mode: str = "overwrite", **options) -> dt.CSV:
    """(parity: PandasToCSV output.py:48-57)"""
    df.write.mode(mode).options(header="true", **options).csv(url)
    return dt.CSV(url=url)


def to_json(df: DataFrame, url: str, mode: str = "overwrite", **options) -> dt.JSONFile:
    df.write.mode(mode).options(**options).json(url)
    return dt.JSONFile(url=url)


def to_orc(df: DataFrame, url: str, mode: str = "overwrite", **options) -> dt.ORC:
    df.write.mode(mode).options(**options).orc(url)
    return dt.ORC(url=url)


def to_xml(df: DataFrame, url: str, row_tag: str = "row", mode: str = "overwrite", **options) -> dt.XML:
    """Native Spark 4 XML sink."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).options(**options).save(url)
    return dt.XML(url=url)


def to_delta(df: DataFrame, url: str, mode: str = "overwrite", **options) -> dt.DeltalakeTable:
    """Requires delta-spark on the classpath (import-gated at call time)."""
    df.write.mode(mode).format("delta").options(**options).save(url)
    return dt.DeltalakeTable(url=url)


def to_table(df: DataFrame, name: str, mode: str = "overwrite", comment: str | None = None) -> str:
    """saveAsTable into the Spark catalog (parity: V2 PandasToDuck
    CREATE TABLE AS + COMMENT, convert.py:183-220)."""
    df.write.mode(mode).saveAsTable(name)
    if comment:
        ident = ".".join("`" + p.replace("`", "``") + "`" for p in name.split("."))
        df.sparkSession.sql(
            f"ALTER TABLE {ident} SET TBLPROPERTIES ('comment' = '{comment.replace(chr(39), chr(39) * 2)}')"
        )
    return name


def to_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> str:
    """Write a hash-bucketed (optionally sorted) table. Joins/aggregations
    between tables bucketed the same way on the join key run with NO
    shuffle — the pre-partitioning is the 100 TB co-location strategy for
    repeatedly-joined fact tables. Requires a metastore table (bucket
    metadata lives in the catalog, not the files)."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)
    return name


def to_feather(df: DataFrame, url: str) -> dt.Feather2:
    """Driver-side Arrow write — Feather is a small-data interchange format
    (parity: PandasToFeather output.py:72-82). Big data belongs in parquet."""
    df.toPandas().to_feather(url)
    return dt.Feather2(url=url)


def catalog_to_yaml(catalog, path: str) -> dt.CatalogData:
    """(parity: CatalogToJson output.py:252-260)"""
    catalog.to_yaml_file(path)
    out = dt.CatalogData()
    out.metadata["path"] = path
    return out
