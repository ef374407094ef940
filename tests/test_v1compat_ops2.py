"""V1-format catalog loading, open_<driver> surface, salted join,
sessionization (batch ≡ streaming)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


V1_YAML = """
name: legacy_cat
metadata:
  owner: data-team
sources:
  trips:
    description: small parquet table
    driver: parquet
    args:
      urlpath: '{{ CATALOG_DIR }}/orders.parquet'
  trips_csv:
    description: csv with a user parameter in the path
    driver: csv
    parameters:
      region:
        description: region file selector
        type: str
        default: "all"
        allowed: ["all", "na", "eu"]
    args:
      urlpath: '{{ CATALOG_DIR }}/trips_{{ region }}.csv'
      sep: ','
"""


@pytest.fixture()
def v1_dir(tmp_path, spark):
    # place real parquet + csv fixtures beside the YAML
    import shutil

    shutil.copy(f"{SF_SMALL}/orders.parquet", tmp_path / "orders.parquet")
    (tmp_path / "trips_all.csv").write_text("a,b\n1,x\n2,y\n3,z\n")
    (tmp_path / "trips_na.csv").write_text("a,b\n9,q\n")
    (tmp_path / "cat.yml").write_text(V1_YAML)
    return tmp_path


def test_v1_catalog_loads(spark, v1_dir):
    from intake_spark.catalog import open_catalog

    cat = open_catalog(str(v1_dir / "cat.yml"))
    assert {"trips", "trips_csv"} <= set(cat.aliases)
    assert cat.metadata["v1_name"] == "legacy_cat"
    df = cat["trips"].read(spark=spark)
    assert df.count() == 1500


def test_v1_parameter_substitution(spark, v1_dir):
    from intake_spark.catalog import open_catalog

    cat = open_catalog(str(v1_dir / "cat.yml"))
    assert cat["trips_csv"].read(spark=spark).count() == 3  # default region=all
    assert cat.to_reader("trips_csv", region="na").read(spark=spark).count() == 1
    with pytest.raises(ValueError):
        cat.to_reader("trips_csv", region="mars")  # not in allowed list


def test_v1_env_template(tmp_path, monkeypatch):
    from intake_spark.v1compat import render_template

    monkeypatch.setenv("DATA_ROOT", "/data/x")
    out = render_template({"u": '{{ env("DATA_ROOT") }}/f.csv'}, {})
    assert out == {"u": "/data/x/f.csv"}


def test_v1_roundtrip_to_v2(spark, v1_dir, tmp_path):
    """V1 catalog loads → persists in V2 format → still reads."""
    from intake_spark.catalog import open_catalog

    cat = open_catalog(str(v1_dir / "cat.yml"))
    v2_path = str(tmp_path / "v2.yaml")
    cat.to_yaml_file(v2_path)
    cat2 = open_catalog(v2_path)
    assert cat2["trips"].read(spark=spark).count() == 1500


def test_open_driver_surface(spark):
    import intake_spark

    r = intake_spark.open_parquet(f"{SF_SMALL}/region.parquet")
    assert r.read(spark=spark).count() == 5
    with pytest.raises(AttributeError):
        intake_spark.open_nonexistent_driver


def test_salted_join_correctness(spark):
    from intake_spark.operators import salted_join
    from intake_spark.session import load_table

    o = load_table(spark, SF_SMALL, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load_table(spark, SF_SMALL, "customer")
    plain = o.join(c, "c_custkey").count()
    salted = salted_join(o, c, on="c_custkey", n_salts=8).count()
    assert salted == plain


def test_salted_join_rejects_outer(spark):
    from intake_spark.operators import salted_join
    from intake_spark.session import load_table

    c = load_table(spark, SF_SMALL, "customer")
    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(c, c, on="c_custkey", how=bad)


def test_npy_header_rejects_non_literal(tmp_path):
    from intake_spark.arrays import _parse_npy_header

    # a crafted header that eval() would execute but literal_eval must reject
    evil = b"{'descr': '<f8', 'fortran_order': False, 'shape': (().__class__,)}"
    buf = b"\x93NUMPY\x01\x00" + len(evil).to_bytes(2, "little") + evil
    with pytest.raises((ValueError, SyntaxError)):
        _parse_npy_header(buf)


def test_to_table_comment_with_quote(spark):
    from intake_spark import output
    from intake_spark.session import load_table

    r = load_table(spark, SF_SMALL, "region").limit(1)
    output.to_table(r, "region_quote_tbl", comment="it's quoted")
    assert spark.catalog.getTable("region_quote_tbl").description == "it's quoted"
    spark.sql("DROP TABLE region_quote_tbl")


def test_sessionize_batch(spark):
    import datetime as dtm

    from intake_spark.streaming import sessionize

    T = dtm.datetime.fromisoformat
    ev = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00")),
            (1, T("2024-01-01 10:10:00")),  # same session (gap 30m)
            (1, T("2024-01-01 11:30:00")),  # new session
            (2, T("2024-01-01 10:05:00")),
        ],
        ["user_id", "ts"],
    )
    out = sessionize(ev, gap="30 minutes")
    rows = sorted(
        [(r.user_id, r.n_events) for r in out.collect()]
    )
    assert rows == [(1, 1), (1, 2), (2, 1)]


def test_sessionize_stream_matches_batch(spark, tmp_path):
    from intake_spark import datatypes as dt
    from intake_spark.session import load_table
    from intake_spark.streaming import FileStream, run_stream_to_memory, sessionize

    events = load_table(spark, SF_SMALL, "events").select("user_id", "ts")
    src = str(tmp_path / "sess_src")
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    expected = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(batch, gap="10 minutes").collect()
    }
    stream = FileStream(data=dt.Parquet(url=src)).read(spark=spark, schema=batch.schema)
    agg = sessionize(stream, gap="10 minutes", watermark="1 day")
    run_stream_to_memory(agg, "sess_test", timeout_s=120)
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    assert got == expected


def test_alias_source_and_choosers(spark, tmp_path):
    """V1 alias fixture parity (reference catalog_alias.yml): static alias,
    parameter-mapped alias, and a first_discoverable fallback chain."""
    from intake_spark.v1compat import open_v1_catalog

    (tmp_path / "states.csv").write_text("state,code\nIowa,IA\nOhio,OH\n")
    (tmp_path / "cat.yaml").write_text(
        f"""
sources:
  input_data:
    driver: csv
    args:
      urlpath: "{{{{ CATALOG_DIR }}}}/states.csv"
  other_data:
    driver: parquet
    args:
      urlpath: "{SF_SMALL}/region.parquet"
  broken:
    driver: parquet
    args:
      urlpath: "/nonexistent/nowhere.parquet"
  alias0:
    driver: alias
    args:
      target: input_data
  alias1:
    driver: alias
    args:
      target: "{{{{choice}}}}"
      mapping:
        first: input_data
        second: other_data
    parameters:
      choice:
        type: str
        default: first
        allowed: ["first", "second"]
  fallback:
    driver: intake.source.derived.AliasSource
    args:
      targets: ["broken", "other_data"]
      chooser: first_discoverable
"""
    )
    cat = open_v1_catalog(str(tmp_path / "cat.yaml"))
    assert cat["alias0"].read(spark=spark).count() == 2
    assert cat["alias1"].read(spark=spark).count() == 2  # default choice=first
    r = cat.to_reader("alias1", choice="second")
    assert r.read(spark=spark).count() == 5
    assert cat["fallback"].read(spark=spark).count() == 5  # skips broken

    from intake_spark.v1compat import AliasReader

    with pytest.raises(ValueError, match="outside a catalog"):
        AliasReader(target="x").read(spark=spark)


def _double_a(df, factor=2):
    from pyspark.sql import functions as F

    return df.withColumn("a", F.col("a") * factor)


def test_v1_derived_sources(spark, tmp_path):
    """V1 derived drivers (Columns / GenericTransform / DataFrameTransform,
    reference derived.py:216-313) over catalog targets."""
    from intake_spark.v1compat import open_v1_catalog

    (tmp_path / "t.csv").write_text("a,b,c\n1,x,10\n2,y,20\n")
    (tmp_path / "cat.yaml").write_text(
        """
sources:
  base:
    driver: csv
    args:
      urlpath: "{{ CATALOG_DIR }}/t.csv"
  just_cols:
    driver: intake.source.derived.Columns
    args:
      targets: [base]
      columns: ["a", "b"]
  doubled:
    driver: intake.source.derived.DataFrameTransform
    args:
      targets: [base]
      transform: "tests.test_v1compat_ops2:_double_a"
      transform_kwargs:
        factor: 3
"""
    )
    cat = open_v1_catalog(str(tmp_path / "cat.yaml"))
    cols = cat["just_cols"].read(spark=spark)
    assert cols.columns == ["a", "b"] and cols.count() == 2
    doubled = cat["doubled"].read(spark=spark)
    assert sorted(r.a for r in doubled.collect()) == [3, 6]

    from intake_spark.config import conf, reset

    try:
        conf["allow_import"] = False
        with pytest.raises(PermissionError):
            cat["doubled"].read(spark=spark)
    finally:
        reset()


def test_v1_numpy_and_open_driver(spark, tmp_path):
    """V1 'numpy' driver + open_numpy dynamic API (reference
    catalog_alias.yml uses driver: numpy with a path arg)."""
    import numpy as np

    import intake_spark
    from intake_spark.v1compat import open_v1_catalog

    arr = np.arange(12, dtype="<f8").reshape(6, 2)
    np.save(str(tmp_path / "small.npy"), arr)
    (tmp_path / "cat.yaml").write_text(
        """
sources:
  arr:
    driver: numpy
    args:
      path: "{{ CATALOG_DIR }}/small.npy"
"""
    )
    cat = open_v1_catalog(str(tmp_path / "cat.yaml"))
    rows = cat["arr"].read(spark=spark).collect()
    total = sum(sum(r.values) for r in rows)
    assert total == arr.sum()
    r2 = intake_spark.open_numpy(str(tmp_path / "small.npy"))
    assert sum(sum(r.values) for r in r2.read(spark=spark).collect()) == arr.sum()


def test_v1_jinja_params_in_any_arg(tmp_path):
    """{{ param }} templates outside urlpath (e.g. sql_expr) must convert
    to the {param} form too."""
    import yaml

    from intake_spark.v1compat import from_v1_dict

    doc = yaml.safe_load(
        """
sources:
  q:
    driver: sql
    args:
      uri: jdbc:postgresql://h/db
      sql_expr: "SELECT * FROM t WHERE x > {{ threshold }}"
    parameters:
      threshold:
        type: int
        default: 5
"""
    )
    cat = from_v1_dict(doc)
    tok = cat.aliases["q"]
    payload = str(cat.entries[tok].to_dict())
    assert "{threshold}" in payload and "{{" not in payload


def test_v1_nested_catalog_sibling_refs(tmp_path):
    """An alias inside a nested catalog must still resolve its sibling by
    the un-prefixed name after the merge."""
    import yaml

    from intake_spark.v1compat import from_v1_dict

    sub = {
        "sources": {
            "raw": {"driver": "csv", "args": {"urlpath": str(tmp_path / "x.csv")}},
            "best": {"driver": "alias", "args": {"target": "raw"}},
        }
    }
    subp = tmp_path / "sub.yaml"
    subp.write_text(yaml.safe_dump(sub))
    root = {
        "sources": {
            "inner": {"driver": "yaml_file_cat", "args": {"path": str(subp)}}
        }
    }
    cat = from_v1_dict(root)
    assert "inner.best" in cat.aliases and "inner.raw" in cat.aliases
    # sibling reference target resolves through the kept un-prefixed alias
    assert "raw" in cat.aliases
