#!/usr/bin/env python
"""Time a block of queries interleaved N rounds in one session, with
per-run steal and worker-CPU deltas. Usage:
  probe_block.py <comma-prefixes> [rounds]
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
spark = get_session("probe_block")
spark.sparkContext.setLogLevel("ERROR")
ensure_py_deps(spark)
from intake_spark.benchqueries import get_queries  # noqa: E402
queries = get_queries()
names = sorted(queries)
prefixes = tuple(sys.argv[1].split(","))
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
todo = [n for n in names if n.startswith(prefixes)]


def cpu():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v


def _warm(b):
    import intake_spark.llm.multimodal  # noqa: F401
    yield from b


_n = spark.sparkContext.defaultParallelism * 2
spark.range(_n, numPartitions=_n).mapInPandas(_warm, "id long").count()

for rnd in range(rounds):
    for qn in todo:
        c0 = cpu()
        t0 = time.perf_counter()
        queries[qn](spark, SF).write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        c1 = cpu()
        d = [b - a for a, b in zip(c0, c1)]
        tot = max(1, sum(d))
        print(json.dumps({"r": rnd, "q": qn.split("_")[0],
                          "s": round(el, 3),
                          "steal%": round(100 * d[7] / tot, 1),
                          "idle%": round(100 * d[3] / tot, 1)}),
              flush=True)
