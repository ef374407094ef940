"""Engine-mode robustness: the driver owns its SparkSession, so the
engine must produce oracle-identical results under BOTH Spark 4's
default ANSI mode (the whole suite runs there) and legacy mode
(spark.sql.ansi.enabled=false). A full 103-query sweep under ANSI off
was run by hand (zero divergences); this test pins the mode-sensitive
subset in CI via a subprocess (one JVM cannot host two sessions with
different ANSI confs)."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest


@pytest.mark.slow  # config-matrix sweep; default gate runs ANSI default
def test_ansi_off_matches_oracle_subset():
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as m
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.sql.ansi.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        qs, os_ = m.queries(), m.oracle_sql()
        import duckdb
        import numpy as np
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'/root/testdata/sf0.01/{t}.parquet'")
        # the mode-sensitive set: null handling, quantization (division
        # guards), asof (null fill), fixed-point scoring, prefix sums
        NAMES = ["q42_null_handling", "q61_quantize_embeddings",
                 "q18_asof_join", "q86_bigram_lm_score",
                 "q95_token_budget_selection", "q87_bm25_search",
                 "q105_dsir_weights", "q106_gopher_repetition",
                 "q107_quality_classifier", "q110_hll_distinct",
                 "q111_cms_term_counts", "q119_kmeans_clusters",
                 "q120_incremental_dedup"]
        for name in NAMES:
            sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
            odf = con.sql(os_[name]).df()
            assert len(sdf) == len(odf), (name, len(sdf), len(odf))
            cols = sorted(sdf.columns)
            assert cols == sorted(odf.columns), name
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                av, bv = a[c], b[c]
                if str(av.dtype).startswith(("float", "datetime")):
                    ok = (av.isna() == bv.isna()).all() and (
                        av.fillna(0) == bv.fillna(0)).all()
                else:
                    ok = (av.astype(str) == bv.astype(str)).all()
                assert ok, (name, c)
        print("ANSI-OFF-SUBSET-OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420, cwd="/tmp",
    )
    assert "ANSI-OFF-SUBSET-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_ntz_epoch_micros_dst_gap_non_utc_session():
    """Regression: timestampdiff(MICROSECOND, NTZ_epoch, tn) coerces NTZ
    through the SESSION zone — a wall clock inside the DST spring-forward
    gap (02:30 on 2021-03-14 under America/New_York) silently shifted an
    hour. ntz_epoch_micros uses pure field extraction; the round trip
    through timestampadd must be identity in any session timezone."""
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        import datetime
        from pyspark.sql import SparkSession, functions as F
        from intake_spark.session import ntz_epoch_micros
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.session.timeZone", "America/New_York")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        vals = [datetime.datetime(2021, 3, 14, 2, 30, 45, 123456),  # DST gap
                datetime.datetime(2021, 11, 7, 1, 30, 0),           # DST fold
                datetime.datetime(1969, 12, 31, 23, 0, 0, 500000)]  # pre-epoch
        df = spark.createDataFrame([(v,) for v in vals], "tn timestamp_ntz")
        out = df.select(
            "tn",
            F.timestamp_micros(F.lit(0)).alias("_x"),  # force analysis
            ntz_epoch_micros("tn").alias("m"),
        ).withColumn(
            "rt",
            F.expr("timestampadd(MICROSECOND, m, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        ).collect()
        for r in out:
            assert r.rt == r.tn, (r.tn, r.rt)
        print("NTZ-DST-OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, cwd="/tmp",
    )
    assert "NTZ-DST-OK" in out.stdout, out.stdout[-1500:] + out.stderr[-1500:]


@pytest.mark.slow  # TZ core covered by test_ntz_epoch_micros_dst_gap_non_utc_session
def test_non_utc_session_matches_oracle_time_subset():
    """The driver's session timezone is unknown; every time-bearing query
    must be oracle-identical under a non-UTC session. A full manual
    103-query sweep under America/New_York found zero divergences after
    the ntz_epoch_micros fix; this pins the time-heavy subset."""
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as m
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.sql.session.timeZone", "America/New_York")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        qs, os_ = m.queries(), m.oracle_sql()
        import duckdb
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'/root/testdata/sf0.01/{t}.parquet'")
        NAMES = ["q17_hourly_windows", "q36_streaming_hourly",
                 "q46_sessionize", "q76_event_deltas", "q11_date_accessors",
                 "q78_retention_cohort"]
        for name in NAMES:
            sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
            odf = con.sql(os_[name]).df()
            assert len(sdf) == len(odf), (name, len(sdf), len(odf))
            cols = sorted(sdf.columns)
            assert cols == sorted(odf.columns), name
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                av, bv = a[c], b[c]
                assert (av.isna() == bv.isna()).all(), (name, c)
                assert (av.dropna().astype(str).values
                        == bv.dropna().astype(str).values).all(), (name, c)
        print("NY-SUBSET-OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420, cwd="/tmp",
    )
    assert "NY-SUBSET-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
