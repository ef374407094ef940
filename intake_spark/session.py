"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]`` but every default here is chosen to also
be sane on a multi-executor cluster: AQE on (runtime coalesce + skew-join
handling), Arrow on (vectorized pandas-UDF exchange), shuffle partitions
sized by parallelism rather than the 200 default, UTC session timezone so
timestamp semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(app_name: str = "intake_spark", cpus: int | None = None) -> SparkSession:
    """Get or create the engine's SparkSession.

    If a session already exists (e.g. the driver passed one in), returns it
    unchanged — all engine code must work against a caller-provided session.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    n = cpus or DEFAULT_CPUS
    # Pre-warmed worker daemon: workers FORK from the daemon, so heavy
    # imports done there (numpy/pandas/pyarrow + this package's codec
    # stack) are inherited copy-on-write by every worker — which makes
    # the worker-pool churn that stateful streaming stages cause nearly
    # free instead of a ~1 s-per-worker import storm (see
    # daemon_prewarm.py). Only safe when a fresh `python -m` can import
    # this package from the filesystem: export PYTHONPATH so the
    # JVM-spawned daemon inherits it (local mode: the JVM is this
    # process's child). On a cluster the stock daemon is kept.
    daemon_conf = {}
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from pyspark import SparkContext

    # Only when the JVM has NOT launched yet: the gateway JVM snapshots
    # this process's env at launch, so a PYTHONPATH exported now reaches
    # the daemon only through a fresh JVM. Against a pre-existing
    # gateway (driver session stopped, then get_session), the daemon
    # would spawn without PYTHONPATH, fail to import, and kill every
    # task — keep the stock daemon there.
    jvm_fresh = SparkContext._gateway is None
    if jvm_fresh:
        # The JVM-side accept timeout below has a PYTHON-side twin: a
        # spawned worker/runner connects back through
        # local_connect_and_auth, whose socket connect timeout is the
        # SPARK_AUTH_SOCKET_TIMEOUT env (default 15 s). Under sustained
        # host contention the JVM's accept loop can lag past 15 s, and
        # the worker then dies with CANNOT_OPEN_SOCKET before the JVM's
        # raised accept window even matters (observed killing q145's
        # PythonStreamingSourceRunner twice in one degraded bench pass,
        # exhausting drain_stream's retry). The env must be exported
        # before the JVM launches — workers inherit env from the JVM.
        os.environ.setdefault("SPARK_AUTH_SOCKET_TIMEOUT", "300")
    if jvm_fresh and os.path.exists(
        os.path.join(pkg_root, "intake_spark", "daemon_prewarm.py")
    ):
        existing = os.environ.get("PYTHONPATH", "")
        if pkg_root not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_root + (os.pathsep + existing if existing else "")
            )
        daemon_conf["spark.python.daemon.module"] = "intake_spark.daemon_prewarm"
    builder = SparkSession.builder.master(f"local[{n}]")
    for k, v in daemon_conf.items():
        builder = builder.config(k, v)
    return (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # GC pinning hook (bench.py sets this to a fixed-heap G1 profile so
        # per-query timings aren't contaminated by heap-resize/GC alignment;
        # empty default = Spark's stock JVM flags)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Python workers (incl. the Python-DataSource streaming source
        # runner) connect BACK to the JVM after a fresh-process import
        # of pyspark; under full 32-thread load that cold start can
        # exceed the 15s default accept timeout and kill the stage with
        # "Python worker failed to connect back" (observed: q145's
        # PythonStreamingSourceRunner dying mid-bench). Headroom is
        # free — the socket is local and the timeout only bounds a
        # failure path. 300s matches drain_stream's drain bound: a
        # worker slower than the whole drain budget is dead anyway
        # (120s was measured insufficient in a degraded window — a cold
        # runner's fresh-process pyspark import under contention
        # outlasted it twice in one pass).
        .config("spark.python.authenticate.socketTimeout", "300s")
        .getOrCreate()
    )


_PYFILES_ADDED: set[tuple] = set()


def ensure_py_deps(spark: SparkSession) -> None:
    """Make ``intake_spark`` importable on executor Python workers.

    Any Python-UDF stage (mapInPandas / pandas_udf) pickles references to
    functions in this package; executors must be able to import it even when
    the driver process was launched outside the repo. Zips the package once
    per SparkContext and ships it with ``addPyFile`` — works identically in
    local mode and on a real cluster.
    """
    sc = spark.sparkContext
    # applicationId disambiguates a recycled id() after a context restart;
    # the per-pid zip name avoids cross-process write races on a shared
    # tempdir (two drivers rewriting one file mid-addPyFile)
    key = (id(sc), sc.applicationId)
    if key in _PYFILES_ADDED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"intake_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _PYFILES_ADDED.add(key)


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_SCAN_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one synthetic table (TESTDATA.md). Columnar parquet scan —
    Catalyst prunes columns/filters pushed from downstream operators.

    The LAZY scan DataFrame is cached per (session, sf_dir, table):
    ``spark.read.parquet`` costs ~80 ms of driver work per call (footer
    read + schema resolution + file-index build), paid inside every
    query's timed region and multiplied across a 145-query suite — and
    on a real cluster the file LISTING behind it is the expensive part
    (guide §6). Nothing is materialized: a DataFrame is an immutable
    plan, every action still reads the parquet from disk, and the cache
    dies with the process (no cross-run persistence). Bounded FIFO like
    every other session cache; keyed by applicationId so a restarted
    context never hands out plans bound to a dead session.

    ``events.parquet`` may store TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long (legacy conf) and, when ``ts`` comes
    back as a long, convert to a microsecond timestamp column — same value
    DuckDB produces when casting ns→µs. Files already written with µs
    timestamps pass through untouched.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    got = _SCAN_CACHE.get(key)
    if got is not None:
        return got
    df = _load_table_uncached(spark, sf_dir, name)
    while len(_SCAN_CACHE) >= 64:
        _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
    _SCAN_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str):
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # set the legacy conf only long enough to RESOLVE the scan schema
        # (captured in the plan at read time), then restore: leaving it on
        # would make every later nanos-parquet read in the caller's session
        # silently return raw longs instead of failing loudly
        try:
            prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        except Exception:
            prev = None
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            is_long = isinstance(df.schema["ts"].dataType, LongType)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        if is_long:
            # ns-since-epoch → TIMESTAMP_NTZ via an NTZ base: the naive wall
            # clock is preserved regardless of the caller session's timezone
            # (timestamp_micros would yield LTZ and shift under non-UTC
            # sessions, breaking date_trunc/window parity with the oracle).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES):
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread_small_scan(df, min_parts: int | None = None):
    """Round-robin repartition a DataFrame whose current plan has fewer
    partitions than the cluster's parallelism — a no-op (NO shuffle)
    otherwise.

    The trap this guards: a small input file (one parquet row group, one
    gzip member) scans as a single task, and every per-row mapper above
    it — shingle explode, signature hashing, quality-rule expression
    stacks — runs serially until the first exchange, however many cores
    the cluster has. A repartition cannot parallelize the SCAN itself
    (a row group is unsplittable), so this only pays where the
    downstream per-row work outweighs one small shuffle; call it at
    those operators' entry, not on every load. At real scale the scan
    has more splits than cores and this returns the input unchanged, so
    no shuffle is added where the natural partitioning is already
    right (the repartition-or-not decision is data-adaptive, never a
    tuned constant). Streaming DataFrames are returned unchanged
    (``df.rdd`` is undefined for them; their micro-batch sources size
    their own partitions).

    The partition-count probe (``df.rdd.getNumPartitions``) is gated on
    the frame being SCAN-SHAPED (scan + filters/projections only): under
    AQE, ``df.rdd`` on a frame that already contains shuffle-inducing
    operators materializes the upstream query stages as a throwaway job
    — silently executing that work twice (r11 ADVICE). A frame with an
    exchange in it is partitioned by ``spark.sql.shuffle.partitions``
    (== the cluster parallelism here) anyway, so returning it unchanged
    is both safe and what the probe would have decided."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    par = min_parts if min_parts is not None else sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        scan_shaped = all(
            ln.lstrip(" +-:").startswith(
                ("Project", "Filter", "Relation", "LogicalRDD",
                 "LocalRelation", "ColumnPruning")
            )
            for ln in plan.splitlines()
            if ln.strip(" +-:")
        )
    except Exception:
        scan_shaped = False
    if not scan_shaped:
        return df
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def ntz_epoch_micros(ref: str):
    """Naive-epoch microseconds of a TIMESTAMP_NTZ expression via pure
    FIELD EXTRACTION — timezone-proof by construction. ``ref`` is an SQL
    fragment (a column name, backquoted if needed, or an expression).

    ``timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', tn)`` is
    NOT safe: Spark coerces through the session zone, so a wall-clock
    value inside a DST spring-forward gap (e.g. 02:30 on the transition
    day under America/New_York) silently shifts by an hour. Date diff +
    hour/minute/fractional-second extracts never consult a timezone.
    The reverse direction (``timestampadd`` of micros onto an NTZ base)
    is coercion-free and stays the idiom for micros -> NTZ."""
    from pyspark.sql import functions as F

    r = f"({ref})"
    # every term goes through BIGINT before its multiply: minute()*6e7 in
    # INT arithmetic overflows (ANSI raises, legacy wraps)
    return F.expr(
        f"CAST(datediff(CAST({r} AS DATE), DATE'1970-01-01') AS BIGINT)"
        f" * 86400000000 + CAST(hour({r}) AS BIGINT)*3600000000"
        f" + CAST(minute({r}) AS BIGINT)*60000000"
        f" + CAST(extract(SECOND FROM {r}) * 1000000 AS BIGINT)"
    )
