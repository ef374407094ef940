#!/usr/bin/env python
"""Round-12 experiment: reproduce the q132/q133/q134 32-core defect and
attribute it. Phases:
  1. session + pool warmup (like bench.py)
  2. probe worker state (pids, prewarm-marker module present?)
  3. steady-state timing of q132/q133/q134 (3x each, noop sink)
  4. churn: run q141 (applyInPandasWithState replaces the whole pool)
  5. probe again + immediate re-timing of q132/q133/q134
Prints one JSON line per measurement to stdout.
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
spark = get_session("probe_storm")
spark.sparkContext.setLogLevel("ERROR")
ensure_py_deps(spark)

from intake_spark.benchqueries import get_queries  # noqa: E402
queries = get_queries()


def probe(tag):
    """One row per worker: pid, prewarm marker, import cost of the codec
    stack if not already present."""
    par = spark.sparkContext.defaultParallelism

    def f(batches):
        import sys as s
        import time as t
        pid = os.getpid()
        marker = "intake_spark.llm.jpeg2000" in s.modules
        t0 = t.time()
        import intake_spark.llm.jpeg2000  # noqa: F401
        import intake_spark.llm.multimodal  # noqa: F401
        import intake_spark.llm.flac  # noqa: F401
        cost = t.time() - t0
        import pandas as pd
        for b in batches:
            yield pd.DataFrame({"pid": [pid], "marker": [marker],
                                "cost": [cost]})

    rows = (spark.range(par * 2, numPartitions=par * 2)
            .mapInPandas(f, "pid long, marker boolean, cost double")
            .collect())
    pids = sorted({r.pid for r in rows})
    n_marked = len({r.pid for r in rows if r.marker})
    mx = max(r.cost for r in rows)
    print(json.dumps({"probe": tag, "workers": len(pids),
                      "prewarmed": n_marked, "max_import_s": round(mx, 3),
                      "pids": pids[:50]}), flush=True)
    return set(pids)


def timeq(name, n=3):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        queries[name](spark, SF).write.mode("overwrite").format("noop").save()
        out.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "samples": out}), flush=True)
    return out


def steal():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7] if len(v) > 7 else 0, sum(v)


MEDIA = ["q132_image_phash_pairs", "q133_audio_landmark_pairs",
         "q134_transcode_normalize"]

s0, t0 = steal()
p1 = probe("cold")
for q in MEDIA:
    timeq(q)
p2 = probe("post-media")
print(json.dumps({"note": "churn via q141"}), flush=True)
t_churn0 = time.perf_counter()
queries["q141_stream_guard_minhash"](spark, SF).write.mode(
    "overwrite").format("noop").save()
print(json.dumps({"q141_s": round(time.perf_counter() - t_churn0, 3)}),
      flush=True)
p3 = probe("post-churn")
print(json.dumps({"replaced": len(p3 - p2), "kept": len(p3 & p2)}),
      flush=True)
for q in MEDIA:
    timeq(q)
s1, t1 = steal()
print(json.dumps({"steal_pct": round((s1 - s0) / max(1, t1 - t0), 4)}),
      flush=True)
