"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every headline operator from
SURVEY.md §2 plus the LLM-pipeline layer (intake_spark/benchqueries.py and
intake_spark/llm/queries.py) for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from intake_spark.benchqueries import get_queries

    return get_queries()["q05_nation_volume"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented headline operator (SURVEY.md §2)."""
    from intake_spark.benchqueries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for LSH-bucketed ops whose
    candidate generation is engine-side; those get rows-only checks)."""
    from intake_spark.benchqueries import get_oracle_sql

    return get_oracle_sql()
