#!/usr/bin/env python
"""Profile the five untouched heavies (r11 VERDICT #6): per-query noop
loops with /proc/stat steal sampling, plus per-phase timing hooks for
q107 (classifier) and q119 (k-means). Run on a quiet host; writes
results to stdout."""
from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
loops = int(os.environ.get("PROBE_LOOPS", "5"))
only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

from intake_spark.benchqueries import get_queries  # noqa: E402
from intake_spark.session import get_session  # noqa: E402

spark = get_session("probe_heavies")
spark.sparkContext.setLogLevel("ERROR")

HEAVIES = [
    "q107_quality_classifier",
    "q108_curation_funnel",
    "q119_kmeans_clusters",
    "q120_incremental_dedup",
    "q32_minhash_lsh_pairs",
]
if only:
    HEAVIES = [n for n in HEAVIES if any(n.startswith(p) for p in only)]

queries = get_queries()


def steal():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)


# table-cache warmup (bench does the same before timing)
from intake_spark.session import TABLE_NAMES, load_table  # noqa: E402

spark.range(1_000_000).selectExpr("sum(id)").collect()
for t in TABLE_NAMES:
    try:
        load_table(spark, sf_dir, t).count()
    except Exception:
        pass

for name in HEAVIES:
    fn = queries[name]
    times = []
    for i in range(loops):
        s0, t0_ = steal()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name} probe {i}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        s1, t1_ = steal()
        stl = (s1 - s0) / max(1, t1_ - t0_)
        times.append(dt)
        print(f"{name} run{i}: {dt:.3f}s steal={stl:.3%}", flush=True)
    times.sort()
    print(f"{name} MEDIAN {times[len(times)//2]:.3f}s min {times[0]:.3f}s",
          flush=True)
