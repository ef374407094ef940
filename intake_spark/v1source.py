"""V1 DataSource interface adapter: the reference's V1 plugin surface
(container / discover / read / read_chunked / read_partition / to_spark /
close — intake/source/base.py:16-203, conformance checked by
intake/source/tests/util.py:verify_datasource_interface) implemented over
any of our readers.

Semantics: ``read()``-family methods return *pandas* (V1's in-memory
container contract — only sane for small/aggregated data); ``to_spark()``
returns the lazy DataFrame and is the scale path. ``read_partition``
addresses one Spark partition by index without materializing the rest.
"""

from __future__ import annotations

from typing import Any, Iterator

from intake_spark.utils import Tokenizable


class Schema(dict):
    """dtype/shape/npartitions bundle (parity: source/base.py:16-18)."""


class V1SourceAdapter(Tokenizable):
    container = "dataframe"
    version = "2.0"
    partition_access = True

    def __init__(self, reader, spark=None, metadata: dict | None = None):
        self.reader = reader
        self.metadata = metadata or {}
        self._spark = spark
        self._df = None
        self._schema: Schema | None = None

    # -- lifecycle -----------------------------------------------------------

    def _get_df(self):
        if self._df is None:
            self._df = self.reader.read(spark=self._spark)
        return self._df

    def _get_schema(self) -> Schema:
        if self._schema is None:
            df = self._get_df()
            self._schema = Schema(
                dtype=dict(df.dtypes),
                shape=(None, len(df.columns)),
                npartitions=df.rdd.getNumPartitions(),
                extra_metadata=dict(self.metadata),
            )
        return self._schema

    def discover(self) -> Schema:
        """Schema on first access, row count unknown without a scan
        (parity: source/base.py:153-162)."""
        return self._get_schema()

    def read(self):
        """Full materialization to pandas (V1 container contract)."""
        return self._get_df().toPandas()

    def read_chunked(self) -> Iterator:
        """Iterate partition-sized pandas chunks (parity: read_chunked)."""
        for i in range(self._get_schema()["npartitions"]):
            yield self.read_partition(i)

    def read_partition(self, i: int):
        """One Spark partition as pandas, others untouched
        (parity: source/base.py:177-187 read_partition(i))."""
        n = self._get_schema()["npartitions"]
        if not 0 <= i < n:
            raise IndexError(f"partition {i} out of range [0, {n})")
        df = self._get_df()
        spark = df.sparkSession
        part = df.rdd.mapPartitionsWithIndex(
            lambda idx, rows: rows if idx == i else iter([])
        )
        return spark.createDataFrame(part, schema=df.schema).toPandas()

    def to_spark(self):
        """The scale path: the lazy DataFrame itself (parity: V1
        CSVSource.to_spark routing to V2 readers, source/csv.py:28-38)."""
        return self._get_df()

    def close(self) -> None:
        if self._df is not None and self._df.is_cached:
            self._df.unpersist()
        self._df = None
        self._schema = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- interface conformance (mirrors verify_datasource_interface) --------

    REQUIRED_ATTRS = ("container", "version", "metadata", "partition_access")
    REQUIRED_METHODS = (
        "discover",
        "read",
        "read_chunked",
        "read_partition",
        "to_spark",
        "close",
    )

    @classmethod
    def verify_interface(cls, obj) -> bool:
        return all(hasattr(obj, a) for a in cls.REQUIRED_ATTRS) and all(
            callable(getattr(obj, m, None)) for m in cls.REQUIRED_METHODS
        )
