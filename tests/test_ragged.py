"""Awkward-style ragged namespace: module verbs, the recorded-step
``reader.ak.*`` accessor, and the named reader aliases (reference
readers.py:927-978 — AwkwardParquet/JSON/AVRO)."""

from __future__ import annotations

import pytest

from intake_spark import datatypes as dt
from intake_spark import ragged


@pytest.fixture()
def rag(spark):
    rows = [
        (1, [3, 1, 4, 1, 5], [True, False, True, True, False]),
        (2, [], []),
        (3, [None, 7], [True, True]),
    ]
    return spark.createDataFrame(
        rows, "id long, xs array<int>, keep array<boolean>"
    )


def _by_id(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_num_flatten_firsts(spark, rag):
    assert _by_id(ragged.num(rag, "xs"), "xs_num") == {1: 5, 2: 0, 3: 2}
    assert _by_id(ragged.firsts(rag, "xs"), "xs_first") == {1: 3, 2: None, 3: None}
    nested = spark.createDataFrame(
        [(1, [[1, 2], [3]]), (2, [[], [4]])], "id long, xs array<array<int>>"
    )
    assert _by_id(ragged.flatten(nested, "xs"), "xs") == {1: [1, 2, 3], 2: [4]}
    # explode_ragged is the row-expansion form
    assert ragged.explode_ragged(rag, "xs").count() == 7


def test_pad_fill_mask(rag):
    got = _by_id(ragged.pad_none(rag, "xs", 4), "xs")
    assert got[2] == [None, None, None, None]
    assert got[1] == [3, 1, 4, 1, 5]  # no clip: longer lists untouched
    got = _by_id(ragged.pad_none(rag, "xs", 4, clip=True), "xs")
    assert got[1] == [3, 1, 4, 1] and got[3] == [None, 7, None, None]
    got = _by_id(ragged.fill_none(rag, "xs", 0), "xs")
    assert got[3] == [0, 7]
    got = _by_id(ragged.mask(rag, "xs", "keep"), "xs")
    assert got[1] == [3, None, 4, 1, None] and got[2] == []


def test_zip_unzip_local_index(rag):
    z = ragged.zip_arrays(rag, "pairs", "xs", "keep")
    row = {r["id"]: r["pairs"] for r in z.collect()}[3]
    assert [tuple(p) for p in row] == [(None, True), (7, True)]
    u = ragged.unzip(z, "pairs")
    assert _by_id(u, "pairs_xs") == _by_id(rag, "xs")
    assert _by_id(u, "pairs_keep") == _by_id(rag, "keep")
    idx = _by_id(ragged.local_index(rag, "xs"), "xs_index")
    assert idx == {1: [0, 1, 2, 3, 4], 2: [], 3: [0, 1]}


def test_reductions(rag):
    assert _by_id(ragged.sum_ragged(rag, "xs"), "xs_sum") == {1: 14, 2: 0, 3: 7}
    assert _by_id(ragged.max_ragged(rag, "xs"), "xs_max") == {1: 5, 2: None, 3: 7}
    assert _by_id(ragged.min_ragged(rag, "xs"), "xs_min") == {1: 1, 2: None, 3: 7}
    means = _by_id(ragged.mean_ragged(rag, "xs"), "xs_mean")
    assert means[1] == 14 / 5 and means[2] is None and means[3] == 7.0
    counts = _by_id(ragged.count_matching(rag, "xs", "x >= 4"), "xs_count")
    assert counts == {1: 2, 2: 0, 3: 1}


def test_ragged_plan_stays_codegen(rag):
    """The verbs must compile to JVM expressions: no BatchEvalPython /
    ArrowEvalPython nodes, single stage, row count preserved."""
    d = ragged.num(rag, "xs", out="n")
    d = ragged.mean_ragged(d, "xs", out="m")
    d = ragged.count_matching(d, "xs", "x > 1", out="c")
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_awkward_reader_aliases_and_catalog_roundtrip(spark, tmp_path):
    """AwkwardParquet reads nested parquet with lists intact, and an
    ``.ak``-step pipeline survives dict serialization (steps recorded by
    function NAME, the catalog contract)."""
    from intake_spark.pipeline import Pipeline
    from intake_spark.ragged import AwkwardParquet

    src = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, []), (3, [9, None])], "id long, xs array<int>"
    )
    path = str(tmp_path / "nested.parquet")
    src.write.parquet(path)

    rdr = AwkwardParquet(data=dt.Parquet(url=path))
    back = rdr.read(spark=spark)
    assert dict(back.dtypes)["xs"] == "array<int>"
    assert back.count() == 3

    pipe = rdr.ak.num("xs", out="n").ak.sum_ragged("xs", out="s")
    d = pipe.to_dict()
    revived = Pipeline.from_dict(d)
    got = {r["id"]: (r["n"], r["s"]) for r in revived.read(spark=spark).collect()}
    assert got == {1: (3, 6), 2: (0, 0), 3: (2, 9)}


def test_awkward_avro_alias(spark, tmp_path):
    """AwkwardAvro rides the stdlib OCF reader (no jar)."""
    from intake_spark.output import to_avro
    from intake_spark.ragged import AwkwardAvro

    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = str(tmp_path / "t.avro")
    to_avro(src, path)
    back = AwkwardAvro(data=dt.AVRO(url=path)).read(spark=spark)
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_namespace_rejects_unknown(rag):
    from intake_spark.ragged import apply_ragged

    with pytest.raises(ValueError, match="namespace"):
        apply_ragged(rag, "collect")  # not a ragged verb — no method smuggling


def test_awkward_readers_in_registry():
    """register_all picks up the ragged reader aliases, and their
    priority keeps the plain readers as the auto-selected default."""
    from intake_spark import datatypes as dt
    from intake_spark.readers import SparkParquet, readers_for

    dt.register_all()
    cands = readers_for(dt.Parquet)
    names = [c.__name__ for c in cands]
    assert "AwkwardParquet" in names
    assert names.index("SparkParquet") < names.index("AwkwardParquet")


def test_local_index_null_list_propagates_null(spark):
    """Regression: a NULL list must yield a NULL index (ak.local_index
    convention, same as num/firsts) — not [], which made a missing list
    indistinguishable from a present-but-empty one."""
    df = spark.createDataFrame(
        [(1, [7, 8]), (2, []), (3, None)], "id long, xs array<int>"
    )
    idx = {r["id"]: r["xs_index"] for r in ragged.local_index(df, "xs").collect()}
    assert idx == {1: [0, 1], 2: [], 3: None}
