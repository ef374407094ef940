#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end: plan build + full execution into the
``noop`` write sink, which materializes every output column (``.count()``
would let Catalyst skip computing projected expressions).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from intake_spark.benchqueries import get_queries
    from intake_spark.session import get_session

    spark = get_session("intake_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = get_queries()

    # JVM/codegen/IO warmup so no timed query absorbs engine startup or
    # cold-file cost (measures the engine, not JVM boot / first-touch IO;
    # per-query numbers stay order-independent).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from intake_spark.session import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
