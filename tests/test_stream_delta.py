"""stream_to_delta: idempotent streaming sink via the Delta protocol's
``txn`` action (appId/version ladder).  Mirrors what delta-spark's
streaming sink does (reference: intake delegates Delta writes to the
deltalake package), but jar-free on the stdlib _delta_log writer.

Covers: (1) an available-now drain lands every source row exactly once;
(2) replaying an already-committed batch id is a no-op (restart safety);
(3) the txn ladder survives ``delta_checkpoint`` so a vacuumed log still
refuses the replay."""

from __future__ import annotations

import os

import pytest

from intake_spark import datatypes as dt
from intake_spark.lakehouse import DeltaLakeReader, delta_checkpoint, delta_log_state
from intake_spark.output import to_delta
from intake_spark.session import load_table
from intake_spark.streaming import FileStream, stream_to_delta
from tests.conftest import SF_SMALL


def _read_delta(spark, root):
    return DeltaLakeReader(data=dt.DeltalakeTable(url=root)).read(spark=spark)


def test_stream_to_delta_available_now(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events").limit(300)
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = FileStream(data=dt.Parquet(url=src)).read(
        spark=spark, schema=batch.schema, max_files_per_trigger=2
    )
    root = str(tmp_path / "delta_sink")
    ckpt = str(tmp_path / "ckpt")
    stream_to_delta(stream, root, checkpoint=ckpt, timeout_s=180)

    got = _read_delta(spark, root)
    assert got.count() == batch.count()
    assert sorted(r.event_id for r in got.select("event_id").collect()) == sorted(
        r.event_id for r in batch.select("event_id").collect()
    )
    # the txn ladder was recorded, one entry per micro-batch app
    state = delta_log_state(os.path.join(root, "_delta_log"), spark)
    assert state["txns"], "txn actions missing from the log"
    assert all(v >= 0 for v in state["txns"].values())


def test_txn_ladder_blocks_replayed_batch(spark, tmp_path):
    """Appending with txn=(app, v) twice keeps only one copy when the
    writer honors the ladder, and delta_log_state exposes the latest
    version so a restarted stream can skip."""
    df = load_table(spark, SF_SMALL, "nation")
    root = str(tmp_path / "tbl")
    to_delta(df, root, mode="overwrite", txn=("appA", 0))
    log = os.path.join(root, "_delta_log")
    state = delta_log_state(log, spark)
    assert state["txns"] == {"appA": 0}

    # a restarted incarnation sees version 0 committed and must skip it
    last = state["txns"].get("appA", -1)
    assert 0 <= last  # the stream_to_delta guard condition
    # batch 1 is new -> append goes through and bumps the ladder
    to_delta(df, root, mode="append", txn=("appA", 1))
    state = delta_log_state(log, spark)
    assert state["txns"] == {"appA": 1}
    assert _read_delta(spark, root).count() == 2 * df.count()


def test_txn_survives_checkpoint(spark, tmp_path):
    """delta_checkpoint must carry txn actions into the parquet
    checkpoint: after checkpointing (and even if old JSON commits were
    vacuumed), the ladder still reports the committed version."""
    df = load_table(spark, SF_SMALL, "region")
    root = str(tmp_path / "tbl")
    to_delta(df, root, mode="overwrite", txn=("appS", 4))
    to_delta(df, root, mode="append", txn=("appS", 5))
    log = os.path.join(root, "_delta_log")

    v = delta_checkpoint(root, spark=spark)
    assert v >= 1
    # simulate log cleanup: drop the pre-checkpoint JSON commits
    for f in os.listdir(log):
        if f.endswith(".json") and f[0].isdigit() and int(f[:20]) <= v:
            os.remove(os.path.join(log, f))

    state = delta_log_state(log, spark)
    assert state["txns"] == {"appS": 5}
    assert _read_delta(spark, root).count() == 2 * df.count()


def test_stream_to_delta_restart_no_duplicates(spark, tmp_path):
    """Kill-and-restart simulation: drain once, then rerun the same
    available-now query with the SAME checkpoint — no new rows. Then
    rerun with a FRESH checkpoint (lost-checkpoint scenario, source
    re-reads from batch 0) but the same app_id — the txn ladder must
    refuse every replayed batch."""
    events = load_table(spark, SF_SMALL, "events").limit(120)
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    root = str(tmp_path / "delta_sink")

    def drain(ckpt_name):
        stream = FileStream(data=dt.Parquet(url=src)).read(
            spark=spark, schema=batch.schema, max_files_per_trigger=1
        )
        stream_to_delta(
            stream,
            root,
            checkpoint=str(tmp_path / ckpt_name),
            timeout_s=180,
            app_id="restart-test",
        )

    drain("ckpt1")
    n1 = _read_delta(spark, root).count()
    assert n1 == batch.count()
    drain("ckpt1")  # same checkpoint: source yields nothing new
    assert _read_delta(spark, root).count() == n1
    drain("ckpt2")  # fresh checkpoint: batches replay, ladder refuses
    assert _read_delta(spark, root).count() == n1
