"""Stateful streaming operator, streaming catalog entries, watermark/window
verbs, token-keyed materialization."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from intake_spark import datatypes as dt
from intake_spark.session import load_table
from intake_spark.steps import run_steps
from intake_spark.streaming import (
    FileStream,
    run_stream_to_memory,
    stateful_running_max,
)


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ev_src"))
    load_table(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(src)
    return src


def test_stateful_running_max_stream_matches_batch(spark, events_src):
    batch = spark.read.parquet(events_src)
    expected = {
        r.key: (r.running_max, r.n_seen)
        for r in stateful_running_max(batch).collect()
    }

    stream = FileStream(data=dt.Parquet(url=events_src)).read(
        spark=spark, schema=batch.schema, max_files_per_trigger=2
    )
    out = stateful_running_max(stream, inactivity_timeout_ms=None)
    q = (
        out.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not terminate"
    q.stop()
    # update mode emits one row per key per batch: keep the last per key
    rows = spark.sql("SELECT * FROM state_test").collect()
    got: dict = {}
    for r in rows:
        prev = got.get(r.key)
        if prev is None or r.n_seen >= prev[1]:
            got[r.key] = (r.running_max, r.n_seen)
    assert got == expected


def test_streaming_catalog_entry(spark, events_src):
    """A catalog entry that rehydrates to a STREAMING DataFrame: FileStream
    reader with a DDL schema string persisted through YAML."""
    from intake_spark.catalog import Catalog, open_catalog

    ddl = "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    cat = Catalog()
    cat["ev_stream"] = FileStream(data=dt.Parquet(url=events_src), schema=ddl)
    import tempfile

    path = tempfile.mktemp(suffix=".yaml")
    cat.to_yaml_file(path)
    cat2 = open_catalog(path)
    sdf = cat2["ev_stream"].read(spark=spark)
    assert sdf.isStreaming
    assert "event_type" in sdf.columns


def test_watermark_window_verbs(spark, events_src):
    ev = load_table(spark, SF_SMALL, "events")
    out = run_steps(
        {"events": ev},
        [
            {"target": "events"},
            {"watermark": {"col": "ts", "delay": "1 day"}},
            {"time_window": {"col": "ts", "duration": "1 day",
                             "agg": {"n": "count(*)"}, "by": ["event_type"]}},
        ],
    )
    rows = out.collect()
    assert rows and {"window_start", "window_end", "event_type", "n"} <= set(out.columns)
    total = sum(r.n for r in rows)
    assert total == ev.count()


def test_materialize_cache(spark, tmp_path):
    from intake_spark.catalog import Catalog
    from intake_spark.readers import SparkParquet

    cat = Catalog()
    cat["li_small"] = SparkParquet(
        data=dt.Parquet(url=f"{SF_SMALL}/lineitem.parquet")
    ).filter("l_quantity > 45")[["l_orderkey"]]
    cache = str(tmp_path / "cache")
    a = cat.materialize("li_small", cache, spark=spark)
    n = a.count()
    assert n > 0
    import os

    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".parquet")
    # second call hits the cache (same token → same path, no rewrite)
    mtime = os.path.getmtime(os.path.join(cache, files[0], "_SUCCESS"))
    b = cat.materialize("li_small", cache, spark=spark)
    assert b.count() == n
    assert os.path.getmtime(os.path.join(cache, files[0], "_SUCCESS")) == mtime


def test_q36_restores_session_conf(spark):
    """q36 needs the legacy nanosAsLong conf while its stream runs, but must
    not leak it into the shared session (VERDICT r1 #4)."""
    from intake_spark.benchqueries import QUERIES

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.unset(key)
        out = QUERIES["q36_streaming_hourly"](spark, SF_SMALL)
        assert out.count() > 0
        assert spark.conf.get(key, None) is None
    finally:
        if prev is not None:
            spark.conf.set(key, prev)


def test_stream_near_dup_flags_matches_batch(spark, tmp_path):
    """Stream arm ≡ batch arm on id-ordered ingestion, INCLUDING state
    carried across micro-batches (the dup arrives in a later file)."""
    from intake_spark.streaming import stream_near_dup_flags

    base = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight"),
        (3, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 1
    ]
    later = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (11, "totally fresh words never seen anywhere else ok"),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "docs_src"
    src.mkdir()
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(later, schema).coalesce(1).write.parquet(str(src / "f1"))

    batch = spark.read.schema(schema).parquet(str(src / "*"))
    expected = sorted(
        (r.id, r.band_id, r.is_dup_band)
        for r in stream_near_dup_flags(batch).collect()
    )
    assert any(f for (_id, _b, f) in expected), "planted dups must flag"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stream_near_dup_flags(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("near_dup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not terminate"
    q.stop()
    got = sorted(
        (r.id, r.band_id, r.is_dup_band)
        for r in spark.sql("SELECT * FROM near_dup_test").collect()
    )
    assert got == expected
    # doc-level rollup agrees with the batch-arm policy operator
    from intake_spark.llm.dedup import near_dup_first_seen

    flags = {}
    for rid, _b, f in got:
        flags[rid] = max(flags.get(rid, 0), f)
    pol = {r.doc_id: r.is_dup for r in near_dup_first_seen(batch).collect()}
    assert flags == pol
    assert pol[10] == 1 and pol[1] == 0


def test_stream_to_parquet_exactly_once(spark, events_src, tmp_path):
    """availableNow drain lands every row once; a SECOND run with the same
    checkpoint sees no new offsets and writes nothing new."""
    from intake_spark.streaming import stream_to_parquet

    batch = spark.read.parquet(events_src)
    stream = FileStream(data=dt.Parquet(url=events_src)).read(
        spark=spark, schema=batch.schema, max_files_per_trigger=2
    )
    dst, ckpt = str(tmp_path / "landed"), str(tmp_path / "ckpt")
    stream_to_parquet(stream, dst, ckpt)
    landed = spark.read.parquet(dst)
    assert landed.count() == batch.count()
    # idempotent restart: same checkpoint, no duplication
    stream2 = FileStream(data=dt.Parquet(url=events_src)).read(
        spark=spark, schema=batch.schema, max_files_per_trigger=2
    )
    stream_to_parquet(stream2, dst, ckpt)
    assert spark.read.parquet(dst).count() == batch.count()


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    """The mapper-only text-quality operators run UNCHANGED on a stream
    (no stateful agg in the pipeline), so ingestion-time quality gating
    is the same expression as the batch pass."""
    from tests.conftest import SF_SMALL

    from intake_spark.llm.text import with_quality

    docs = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    gate = lambda df: with_quality(df).filter("uniq_ratio >= 0.5").select("doc_id")  # noqa: E731
    expected = sorted(r.doc_id for r in gate(batch).collect())
    assert 0 < len(expected) < batch.count()  # non-vacuous gate

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        gate(stream).writeStream.format("memory")
        .queryName("qgate").outputMode("append")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    q.stop()
    got = sorted(r.doc_id for r in spark.sql("SELECT * FROM qgate").collect())
    assert got == expected


def test_stream_winnow_dup_flags_matches_batch(spark, tmp_path):
    """Winnowing stream arm ≡ batch arm on id-ordered ingestion, with the
    duplicate span arriving in a later micro-batch (state carry)."""
    from intake_spark.streaming import stream_winnow_dup_flags

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    base = [
        (1, f"{shared} tail words here"),
        (2, "one two three four five six seven eight nine"),
    ]
    later = [
        (10, f"lead in {shared} different end"),  # shares the long span
        (11, "totally fresh words never seen anywhere else ok"),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "wdocs_src"
    src.mkdir()
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(later, schema).coalesce(1).write.parquet(str(src / "f1"))

    batch = spark.read.schema(schema).parquet(str(src / "*"))
    expected = sorted(
        (r.id, r.fingerprint, r.is_dup_fp)
        for r in stream_winnow_dup_flags(batch).collect()
    )
    assert any(f for (_i, _fp, f) in expected), "planted span must flag"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_winnow_dup_flags(stream)
        .writeStream.format("memory")
        .queryName("winnow_dup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not terminate"
    q.stop()
    got = sorted(
        (r.id, r.fingerprint, r.is_dup_fp)
        for r in spark.sql("SELECT * FROM winnow_dup_test").collect()
    )
    assert got == expected
    flags = {}
    for rid, _fp, f in got:
        flags[rid] = max(flags.get(rid, 0), f)
    assert flags[10] == 1 and flags[1] == 0 and flags[11] == 0


def test_stream_semantic_dup_flags_matches_batch(spark, tmp_path):
    """Semantic (embedding) stream guard ≡ batch arm on id-ordered
    ingestion, with the near-duplicate vector arriving in a later
    micro-batch (cluster-state carry)."""
    from intake_spark.streaming import stream_semantic_dup_flags

    seeds = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    base = [
        (1, [0.9, 0.1, 0.0]),    # cluster 0
        (2, [0.1, 0.9, 0.0]),    # cluster 1
        (3, [-0.8, 0.05, 0.6]),  # cluster 1 (weak), far from 2
    ]
    later = [
        (10, [0.89, 0.11, 0.01]),  # near-dup of 1, same cluster
        (11, [0.0, -1.0, 0.0]),    # cluster 0 (tie at -0? anti-aligned), no dup
    ]
    schema = "vec_id long, embedding array<double>"
    src = tmp_path / "vec_src"
    src.mkdir()
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(later, schema).coalesce(1).write.parquet(str(src / "f1"))

    batch = spark.read.schema(schema).parquet(str(src / "*"))
    expected = sorted(
        (r.id, r.cluster_id, r.is_semantic_dup)
        for r in stream_semantic_dup_flags(
            batch, threshold=0.95, seeds=seeds
        ).collect()
    )
    assert any(f for (_i, _c, f) in expected), "planted near-dup must flag"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_semantic_dup_flags(stream, threshold=0.95, seeds=seeds)
        .writeStream.format("memory")
        .queryName("semdup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not terminate"
    q.stop()
    got = sorted(
        (r.id, r.cluster_id, r.is_semantic_dup)
        for r in spark.sql("SELECT * FROM semdup_test").collect()
    )
    assert got == expected
    flags = {rid: f for rid, _c, f in got}
    assert flags[10] == 1 and flags[1] == 0 and flags[11] == 0


def test_stream_semantic_dup_requires_seeds_and_caps_state(spark, tmp_path):
    from intake_spark.streaming import stream_semantic_dup_flags

    schema = "vec_id long, embedding array<double>"
    src = tmp_path / "vec_src2"
    src.mkdir()
    rows = [(i, [1.0, float(i) * 1e-3, 0.0]) for i in range(6)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / "f0"))

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seeds"):
        stream_semantic_dup_flags(stream)

    # capped batch arm: with max_state=1 only the first vector is a
    # representative; all near-parallel followers flag against it
    batch = spark.read.schema(schema).parquet(str(src / "f0"))
    out = {
        r.id: r.is_semantic_dup
        for r in stream_semantic_dup_flags(
            batch, threshold=0.999, seeds=[(0, [1.0, 0.0, 0.0])], max_state=1
        ).collect()
    }
    assert out[0] == 0 and all(out[i] == 1 for i in range(1, 6))


def test_stream_guard_first_claim_no_steal(spark, tmp_path):
    """Out-of-ID-order ingestion: a smaller id arriving AFTER the bucket
    was claimed must be FLAGGED, not silently steal the claim (the steal
    let a duplicate pair through with neither row flagged)."""
    from intake_spark.streaming import stream_winnow_dup_flags

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    schema = "doc_id long, text string"
    src = tmp_path / "steal_src"
    src.mkdir()
    # batch 1: the HIGH id arrives first and claims the fingerprints
    spark.createDataFrame([(10, f"{shared} one tail")], schema).coalesce(1).write.parquet(
        str(src / "f0")
    )
    # batch 2: the LOW id near-dup arrives later
    spark.createDataFrame([(5, f"{shared} two tail")], schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_winnow_dup_flags(stream)
        .writeStream.format("memory")
        .queryName("steal_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()
    flags = {}
    for r in spark.sql("SELECT * FROM steal_test").collect():
        flags[r.id] = max(flags.get(r.id, 0), r.is_dup_fp)
    assert flags[10] == 0  # the claimer
    assert flags[5] == 1   # the later arrival is the duplicate


def test_r6_streaming_parity_guards(spark):
    """Regressions (r6 review): batch arms must mirror the stream arms —
    string keys in stateful_running_max, keep-first exact dedup,
    zero-norm cosine guard, and loud non-numeric-id errors."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from intake_spark import streaming as st

    # stateful_running_max: string key preserved, running_max double
    ev = spark.createDataFrame(
        [("alice", 2, "2024-01-01 00:00:00"), ("alice", 9, "2024-01-01 00:01:00")],
        "user_id string, value long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = st.stateful_running_max(ev).collect()
    assert out[0].key == "alice" and out[0].running_max == 9.0
    assert dict(st.stateful_running_max(ev).dtypes)["running_max"] == "double"

    # exact dedup batch arm keeps the EARLIEST row per key
    dup = spark.createDataFrame(
        [(1, "late", "2024-01-01 00:05:00"), (1, "first", "2024-01-01 00:00:00")],
        "k long, payload string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    kept = st.stream_exact_dedup(dup, subset=["k"]).collect()
    assert len(kept) == 1 and kept[0].payload == "first"

    # zero-norm embedding is NOT a semantic dup batch-side (NaN cosine)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    vals = [r.is_semantic_dup for r in st.stream_semantic_dup_flags(emb, n_seeds=1).collect()]
    assert all(v == 0 for v in vals)

    # non-numeric ids raise loudly in the batch near-dup guard
    docs = spark.createDataFrame(
        [("doc-a", "x y z w"), ("doc-b", "x y z w")], "doc_id string, text string"
    )
    with _pytest.raises(Exception, match="numeric ids"):
        st.stream_near_dup_flags(docs, num_hashes=4, bands=2, k=2).collect()


def test_streaming_gopher_rules_match_batch(spark, tmp_path):
    """The full Gopher rule pair (quality + repetition) is stateless per
    row, so both run UNCHANGED on a stream — ingestion-time filtering
    with the exact batch semantics, sorted-run HOF scan included."""
    from tests.conftest import SF_SMALL

    from intake_spark.llm.text import gopher_filter, gopher_repetition

    docs = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs_gsrc")
    docs.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    # both flag sets from the same rows via stateless maps (a join of
    # two streaming frames would need state; per-row gating doesn't)
    def gate1(df):
        gq = gopher_filter(df, min_words=20, stop_min=1)
        gr = gopher_repetition(df)
        # same rows, independent stateless maps — compose by recompute
        return gq.select("doc_id", "keep").union(
            gr.select("doc_id", "keep")
        )

    expected = sorted(
        (r.doc_id, r.keep) for r in gate1(batch).collect()
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        gate1(stream).writeStream.format("memory")
        .queryName("gopher_gate").outputMode("append")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    q.stop()
    got = sorted(
        (r.doc_id, r.keep)
        for r in spark.sql("SELECT * FROM gopher_gate").collect()
    )
    assert got == expected


def test_stream_decontaminate_flags_matches_batch(spark, tmp_path):
    """Stateless decontamination guard: stream arm ≡ batch arm ≡ the
    batch assembly operators, with the contaminated doc arriving in a
    later micro-batch (no state needed — proves the stateless claim)."""
    from intake_spark.llm.assembly import contamination_scores, decontaminate
    from intake_spark.streaming import stream_decontaminate_flags

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    base = [(1, "alpha beta gamma here now"), (2, "unrelated words entirely here yes")]
    later = [(10, "x alpha beta gamma delta y"), (11, "zz")]  # 11: sub-k tokens
    schema = "doc_id long, text string"
    src = tmp_path / "decon_src"
    src.mkdir()
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(later, schema).coalesce(1).write.parquet(str(src / "f1"))

    batch = spark.read.schema(schema).parquet(str(src / "*"))
    got_b = {
        r.doc_id: r for r in stream_decontaminate_flags(batch, bench).collect()
    }
    # parity with the batch operators (same shingling, same counts)
    cs = {r.doc_id: r for r in contamination_scores(batch, bench).collect()}
    dc = {r.doc_id: r for r in decontaminate(batch, bench).collect()}
    for d in got_b:
        assert got_b[d].n_shingles == cs[d].n_shingles
        assert got_b[d].n_overlap == cs[d].n_overlap == dc[d].n_overlap
        assert bool(got_b[d].contaminated) == dc[d].contaminated
    assert got_b[1].contaminated == 1 and got_b[10].contaminated == 1
    assert got_b[2].contaminated == 0
    assert got_b[11].n_shingles == 0 and got_b[11].contaminated == 0

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_decontaminate_flags(stream, bench)
        .writeStream.format("memory")
        .queryName("decon_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()
    got_s = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.contaminated)
        for r in spark.sql("SELECT * FROM decon_gate").collect()
    }
    assert got_s == {
        d: (r.n_shingles, r.n_overlap, r.contaminated) for d, r in got_b.items()
    }


def test_stream_incremental_dedup_flags_matches_batch(spark, tmp_path):
    """Stateless incremental-dedup ingestion guard: stream arm ≡ batch arm
    ≡ dedup.incremental_dedup row for row (same best match, same tie-break,
    same rounding), with the near-dup arriving in a later micro-batch."""
    from intake_spark.llm.dedup import incremental_dedup
    from intake_spark.streaming import stream_incremental_dedup_flags

    archive = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "the quick brown fox jumps over the lazy dog today"),
            (102, "completely different archive text about spark engines"),
        ],
        "doc_id long, text string",
    )
    base = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "nothing shared with anything in that corpus")]
    later = [(10, "completely different archive text about flink engines"),
             (11, "tiny doc")]
    schema = "doc_id long, text string"
    src = tmp_path / "incdedup_src"
    src.mkdir()
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(later, schema).coalesce(1).write.parquet(str(src / "f1"))

    batch = spark.read.schema(schema).parquet(str(src / "*"))
    got_b = {
        r.doc_id: (r.match_id, r.n_common, r.jaccard_r, r.keep)
        for r in stream_incremental_dedup_flags(
            batch, archive, threshold=0.5
        ).collect()
    }
    want = {
        r.doc_id: (r.match_id, r.n_common, r.jaccard_r, r.keep)
        for r in incremental_dedup(batch, archive, threshold=0.5).collect()
    }
    assert got_b == want
    # semantics spot checks: tie to LOWEST archive id; dropped at >= thr
    assert got_b[1][0] == 100 and got_b[1][3] == 0
    assert got_b[11] == (None, 0, None, 1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_incremental_dedup_flags(stream, archive, threshold=0.5)
        .writeStream.format("memory")
        .queryName("incdedup_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()
    got_s = {
        r.doc_id: (r.match_id, r.n_common, r.jaccard_r, r.keep)
        for r in spark.sql("SELECT * FROM incdedup_gate").collect()
    }
    assert got_s == got_b


def test_stream_incremental_dedup_cross_type_ids(spark):
    """match_id carries ARCHIVE ids: a string-id stream screened against
    a bigint-id archive must type match_id from the archive side
    (review finding)."""
    from intake_spark.streaming import stream_incremental_dedup_flags

    archive = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [("a1", "the quick brown fox jumps over the lazy dog"),
         ("b2", "nothing in common with that corpus at all")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in stream_incremental_dedup_flags(
        new, archive, threshold=0.5).collect()}
    assert out["a1"].match_id == 100 and out["a1"].keep == 0
    assert out["b2"].match_id is None and out["b2"].keep == 1


def test_stream_guard_broadcast_caps(spark):
    """The broadcast-archive ingestion guards refuse a reference set
    above the configurable shingle cap, naming the batch alternative —
    the sinks' max_bytes pattern applied to driver collects."""
    import pytest

    from intake_spark.streaming import (
        stream_decontaminate_flags,
        stream_incremental_dedup_flags,
    )

    stream_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    big_ref = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} v{i}") for i in range(10)],
        "doc_id long, text string",
    )  # 10 docs x 3 shingles = 30 shingle rows
    with pytest.raises(ValueError, match="bloom_decontaminate"):
        stream_decontaminate_flags(
            stream_df, big_ref, max_reference_shingles=10
        )
    with pytest.raises(ValueError, match="incremental_dedup"):
        stream_incremental_dedup_flags(
            stream_df, big_ref, max_archive_shingles=10
        )
    # at/under the cap both run
    n = stream_decontaminate_flags(
        stream_df, big_ref, max_reference_shingles=30
    ).count()
    assert n == 1
    n = stream_incremental_dedup_flags(
        stream_df, big_ref, max_archive_shingles=30
    ).count()
    assert n == 1


def test_stream_phash_dup_flags_matches_batch(spark, tmp_path):
    """Perceptual-image ingestion guard: stream arm ≡ batch arm, with
    the affine-remapped copy arriving in a LATER micro-batch (state
    carry), and band-level flags catching it at Hamming distance 0."""
    import numpy as np

    from intake_spark.output import _png_bytes
    from intake_spark.streaming import stream_phash_dup_flags

    def png(seed=None, affine_of=None):
        if affine_of is not None:
            a = (2 * affine_of.astype(np.int64) + 10).astype(np.uint8)
        else:
            a = np.random.default_rng(seed).integers(
                0, 101, (32, 32), dtype=np.uint8
            )
        return a, bytearray(_png_bytes(a.tolist()))

    img1, b1 = png(seed=1)
    img2, b2 = png(seed=2)
    _, b3 = png(affine_of=img1)   # brightness/contrast copy of 1
    _, b4 = png(affine_of=img2)   # copy of 2, arrives in a later file
    img5, b5 = png(seed=5)
    schema = "image_id long, image binary"
    src = tmp_path / "imgs_src"
    src.mkdir()
    spark.createDataFrame([(1, b1), (2, b2), (3, b3)], schema).coalesce(
        1
    ).write.parquet(str(src / "f0"))
    spark.createDataFrame([(10, b4), (11, b5)], schema).coalesce(
        1
    ).write.parquet(str(src / "f1"))

    batch = spark.read.schema(schema).parquet(str(src / "*"))
    expected = sorted(
        (r.id, r.band_id, r.is_dup_band)
        for r in stream_phash_dup_flags(batch).collect()
    )
    dup_ids = {i for (i, _b, f) in expected if f}
    assert dup_ids == {3, 10}, dup_ids  # every band of a copy flags

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stream_phash_dup_flags(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("phash_dup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not terminate"
    q.stop()
    got = sorted(
        (r.id, r.band_id, r.is_dup_band)
        for r in spark.sql("SELECT * FROM phash_dup_test").collect()
    )
    assert got == expected


def test_drain_stream_retries_transient_spawn_failures(monkeypatch):
    """drain_stream retries the Python-worker spawn flake (both the JVM
    accept signature and the worker-side CANNOT_OPEN_SOCKET) up to
    three times with a FRESH query per attempt and a growing backoff
    between attempts, and stays fatal for every other failure including
    a drain timeout. Pure-fake harness: no Spark session involved; the
    backoff sleep is stubbed out."""
    import time as _time

    from intake_spark.streaming import drain_stream

    monkeypatch.setattr(_time, "sleep", lambda s: None)

    class FakeQuery:
        def __init__(self, fail_with=None, finish=True):
            self.fail_with = fail_with
            self.finish = finish
            self.stopped = False

        def awaitTermination(self, timeout_s):
            if self.fail_with is not None:
                raise RuntimeError(self.fail_with)
            return self.finish

        def stop(self):
            self.stopped = True

    # three transient failures (both signatures), then success
    seq = [
        FakeQuery(fail_with="Python worker failed to connect back"),
        FakeQuery(fail_with="[CANNOT_OPEN_SOCKET] Can not open socket"),
        FakeQuery(fail_with="failed to connect back"),
        FakeQuery(),
    ]
    started = []

    def start_fn():
        q = seq[len(started)]
        started.append(q)
        return q

    drain_stream(start_fn, timeout_s=1.0, what="fake")
    assert len(started) == 4  # fresh query per attempt

    # four transient failures exhaust the retries and surface the error
    seq = [FakeQuery(fail_with="failed to connect back") for _ in range(4)]
    started = []
    with pytest.raises(RuntimeError, match="connect back"):
        drain_stream(start_fn, timeout_s=1.0, what="fake")
    assert len(started) == 4

    # a non-transient failure is fatal on the FIRST attempt
    seq = [FakeQuery(fail_with="some other explosion")]
    started = []
    with pytest.raises(RuntimeError, match="other explosion"):
        drain_stream(start_fn, timeout_s=1.0, what="fake")
    assert len(started) == 1

    # a drain timeout is fatal (never retried) and stops the query
    seq = [FakeQuery(finish=False)]
    started = []
    with pytest.raises(TimeoutError, match="did not drain"):
        drain_stream(start_fn, timeout_s=0.01, what="fake")
    assert started[0].stopped
