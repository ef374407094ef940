#!/usr/bin/env python
"""Bisect which suite prefix degrades q132/q133/q134.
Usage: probe_prefix.py <prefix_spec>
prefix_spec: comma-separated name prefixes to run ONCE before timing the
media trio 3x (in suite order). 'none' = no prefix.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_JAVA_OPTS",
                      "-Xms16g -XX:+UseG1GC -XX:G1HeapRegionSize=32m "
                      "-XX:InitiatingHeapOccupancyPercent=30")

from intake_spark.session import get_session, ensure_py_deps  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("probe_prefix")
spark.sparkContext.setLogLevel("ERROR")
ensure_py_deps(spark)

from intake_spark.benchqueries import get_queries  # noqa: E402
queries = get_queries()
names = sorted(queries)

spec = sys.argv[1] if len(sys.argv) > 1 else "none"

# pool warmup like bench
def _warm(batches):
    import intake_spark.llm.multimodal  # noqa: F401
    yield from batches

_n = spark.sparkContext.defaultParallelism * 2
spark.range(_n, numPartitions=_n).mapInPandas(_warm, "id long").count()

if spec != "none":
    prefixes = tuple(spec.split(","))
    ran = []
    for n in names:
        if n.startswith(prefixes):
            t0 = time.perf_counter()
            queries[n](spark, SF).write.mode("overwrite").format("noop").save()
            ran.append((n.split("_")[0], round(time.perf_counter() - t0, 2)))
    print(json.dumps({"prefix_ran": ran}), flush=True)

MEDIA = ["q132_image_phash_pairs", "q133_audio_landmark_pairs",
         "q134_transcode_normalize"]
for rnd in range(3):
    for q in MEDIA:
        t0 = time.perf_counter()
        queries[q](spark, SF).write.mode("overwrite").format("noop").save()
        print(json.dumps({"round": rnd, "q": q.split("_")[0],
                          "s": round(time.perf_counter() - t0, 3)}),
              flush=True)
