"""Dataset inspection: structured schema/size report for a URL or DataFrame.

Parity with intake/readers/inspect.py:778-1162 — but the reference's
"laziness tiers" collapse: Spark is always tier 1 (lazy schema from file
footers; no data read). The report shape (columns, dtypes, npartitions,
size) follows inspect.py:216-510's per-container extraction.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame

from intake_spark.datatypes import recommend
from intake_spark.session import get_session


def schema_report(df: DataFrame) -> dict[str, Any]:
    return {
        "columns": df.columns,
        "dtypes": dict(df.dtypes),
        "schema_json": df.schema.jsonValue(),
        "npartitions": df.rdd.getNumPartitions(),
    }


def _dir_size(path: str) -> tuple[int, int]:
    total, files = 0, 0
    if os.path.isfile(path):
        return os.path.getsize(path), 1
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(root, n))
                files += 1
            except OSError:
                pass
    return total, files


def inspect_dataset(url: str, spark=None) -> dict[str, Any]:
    """Detect datatype, build the lazy reader, report schema + file stats.
    Never triggers a data-reading Spark action (schemas come from file
    metadata/footers)."""
    spark = spark or get_session()
    candidates = recommend(url)
    report: dict[str, Any] = {"url": url, "candidates": [c.__name__ for c in candidates]}
    size, n_files = _dir_size(url)
    report["bytes"] = size
    report["n_files"] = n_files
    for cls in candidates:
        try:
            data = cls(url=url)
            reader = data.to_reader()
            df = reader.read(spark=spark)
            report.update(schema_report(df))
            report["datatype"] = cls.__name__
            report["reader"] = type(reader).__name__
            return report
        except Exception as exc:  # try next candidate (inspect.py:1092-1162)
            report.setdefault("errors", []).append(f"{cls.__name__}: {exc}")
    return report
