#!/usr/bin/env python
"""Multi-row-group scaling experiment (r11 VERDICT #5): run scan-bound
queries against the sf1.0-scale MULTI-row-group dataset
(scale_dataset.py ... 1024) at $SPARK_GRAFT_CPUS cores and print
per-query warm medians, plus a spread_small_scan no-op check — with
inputs that already split to >= cluster parallelism, the helper must
add NO exchange.

Split sizing: the fixture files are MB-scale, so the default 128 MB
maxPartitionBytes / 4 MB openCostInBytes would still pack each table
into a handful of splits; the experiment session sets them down so the
scan splits like a cluster-scale input does (this is the documented
scale-dataset recipe, a measurement harness knob — the engine itself
keeps Spark defaults).

Usage: SPARK_GRAFT_CPUS=32 python probe_scaling.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1.0"

import os as _os

from pyspark.sql import SparkSession

n = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{n}]")
    .appName("probe_scaling")
    .config("spark.sql.shuffle.partitions", str(n))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "1m")
    .config("spark.sql.files.openCostInBytes", "65536")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from intake_spark.benchqueries import get_queries  # noqa: E402
from intake_spark.session import (  # noqa: E402
    TABLE_NAMES,
    load_table,
    spread_small_scan,
)

for t in TABLE_NAMES:
    load_table(spark, sf_dir, t).count()
spark.range(1_000_000).selectExpr("sum(id)").collect()

# spread no-op check: documents scans with >= n splits, so the helper
# must return the frame unchanged (no RoundRobinPartitioning)
docs = load_table(spark, sf_dir, "documents")
parts = docs.rdd.getNumPartitions()
spread = spread_small_scan(docs)
added = "RoundRobinPartitioning" in spread._jdf.queryExecution().optimizedPlan().toString() or (
    "Repartition" in spread._jdf.queryExecution().logical().toString()
)
print(f"documents scan partitions={parts} (cores={n}); "
      f"spread_small_scan added exchange: {added}", flush=True)

QUERIES = [
    "q02_select_filter", "q06_forecast_revenue", "q23_minhash_signatures",
    "q27_text_quality", "q51_doc_chunking", "q52_repetition_stats",
    "q68_char_diversity", "q74_waiting_suppliers",
    "q106_gopher_repetition", "q108_curation_funnel",
]
qs = get_queries()
for name in QUERIES:
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    w = sorted(ts[1:])
    print(f"{name}: median(warm) {w[len(w)//2]:.3f} runs "
          f"{[round(x, 3) for x in ts]}", flush=True)
