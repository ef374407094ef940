#!/usr/bin/env python
"""Catch q133 spikes: time it 25x, recording /proc/stat deltas (user,
sys, idle, iowait, steal) across each run, plus aggregate worker-CPU
deltas — classifies a spike as host-steal vs CPU-amplification vs wait.
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
spark = get_session("probe_spike")
spark.sparkContext.setLogLevel("ERROR")
ensure_py_deps(spark)
from intake_spark.benchqueries import get_queries  # noqa: E402
queries = get_queries()


def cpu():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    # user, nice, system, idle, iowait, irq, softirq, steal
    return v


def workers_cpu():
    """Sum utime+stime of every python worker process."""
    import glob
    tot = 0
    for st in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(st, "rb") as f:
                cmd = f.read()
            if b"daemon_prewarm" in cmd or b"pyspark.daemon" in cmd:
                pid = st.split("/")[2]
                with open(f"/proc/{pid}/stat") as f:
                    p = f.read().rsplit(")", 1)[1].split()
                tot += int(p[11]) + int(p[12])
        except Exception:
            pass
    return tot


QN = sys.argv[1] if len(sys.argv) > 1 else "q133_audio_landmark_pairs"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 25

# warm pool
def _warm(b):
    import intake_spark.llm.multimodal  # noqa: F401
    yield from b
_n = spark.sparkContext.defaultParallelism * 2
spark.range(_n, numPartitions=_n).mapInPandas(_warm, "id long").count()

# one untimed warmup run (codegen compile)
queries[QN](spark, SF).write.mode("overwrite").format("noop").save()

for i in range(N):
    c0, w0 = cpu(), workers_cpu()
    t0 = time.perf_counter()
    queries[QN](spark, SF).write.mode("overwrite").format("noop").save()
    el = time.perf_counter() - t0
    c1, w1 = cpu(), workers_cpu()
    d = [b - a for a, b in zip(c0, c1)]
    tot = max(1, sum(d))
    print(json.dumps({
        "i": i, "s": round(el, 3),
        "user%": round(100 * (d[0] + d[1]) / tot, 1),
        "sys%": round(100 * d[2] / tot, 1),
        "idle%": round(100 * d[3] / tot, 1),
        "iow%": round(100 * d[4] / tot, 1),
        "steal%": round(100 * d[7] / tot, 1) if len(d) > 7 else None,
        "wcpu_s": round((w1 - w0) / 100.0, 1),
    }), flush=True)
