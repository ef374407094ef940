"""Declarative DataFramePipeline verb tests, pandas-checked (mirrors the
reference's test strategy: expected values from a trusted in-process engine,
intake/source/tests/test_derived.py:19-187)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMALL

from intake_spark.session import load_table
from intake_spark.steps import MissingTargetError, StepError, run_steps


@pytest.fixture(scope="module")
def targets(spark):
    return {
        "orders": load_table(spark, SF_SMALL, "orders"),
        "customer": load_table(spark, SF_SMALL, "customer"),
        "nation": load_table(spark, SF_SMALL, "nation"),
        "lineitem": load_table(spark, SF_SMALL, "lineitem"),
    }


@pytest.fixture(scope="module")
def pdfs(targets):
    return {k: v.toPandas() for k, v in targets.items()}


def test_cols_query(targets, pdfs):
    out = run_steps(
        targets,
        [{"target": "orders"}, {"query": "o_totalprice > 300000"}, {"cols": ["o_orderkey", "o_totalprice"]}],
    ).toPandas()
    exp = pdfs["orders"].query("o_totalprice > 300000")[["o_orderkey", "o_totalprice"]]
    assert len(out) == len(exp)
    assert sorted(out.o_orderkey) == sorted(exp.o_orderkey)


def test_assign_expr(targets):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"assign": {"tp2": "expr:o_totalprice * 2", "tag": "x"}},
            {"limit": 5},
        ],
    ).toPandas()
    assert (out.tp2 == out.o_totalprice * 2).all() and (out.tag == "x").all()


def test_groupby_agg(targets, pdfs):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"groupby": {"by": "o_orderstatus", "agg": {"n": {"fn": "count", "col": "o_orderkey"},
                                                        "total": {"fn": "sum", "col": "o_totalprice"}}}},
        ],
    ).toPandas().set_index("o_orderstatus").sort_index()
    exp = pdfs["orders"].groupby("o_orderstatus").agg(n=("o_orderkey", "count"), total=("o_totalprice", "sum")).sort_index()
    assert (out.n == exp.n).all()
    assert abs(out.total - exp.total).max() < 1e-6


def test_groupby_then_agg_step(targets):
    out = run_steps(
        targets,
        [{"target": "orders"}, {"groupby": "o_orderpriority"}, {"agg": {"n": "count(*)"}}],
    ).toPandas()
    assert set(out.columns) == {"o_orderpriority", "n"}


def test_merge_on_key(spark, targets, pdfs):
    # customer.c_nationkey == nation.n_nationkey via rename first
    steps = [
        {"target": "customer"},
        {"rename": {"c_nationkey": "n_nationkey"}},
        {"merge": {"right": "nation", "on": "n_nationkey", "how": "inner", "broadcast": True}},
        {"cols": ["c_custkey", "n_name"]},
    ]
    out = run_steps(targets, steps, spark=spark).toPandas()
    exp = pdfs["customer"].merge(
        pdfs["nation"], left_on="c_nationkey", right_on="n_nationkey"
    )
    assert len(out) == len(exp)


def test_join_with_suffix(spark, targets):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"join": {"other": ["orders"], "on": "o_orderkey", "rsuffix": "_r", "how": "inner"}},
        ],
        spark=spark,
    )
    assert "o_totalprice_r" in out.columns and "o_totalprice" in out.columns


def test_concat(targets, pdfs):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"query": "o_totalprice > 400000"},
            {"concat": ["orders"]},
        ],
    ).count()
    n_hi = len(pdfs["orders"].query("o_totalprice > 400000"))
    assert out == n_hi + len(pdfs["orders"])


def test_sort_limit_distinct(targets, pdfs):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"sort": {"by": ["o_totalprice"], "ascending": False}},
            {"limit": 3},
            {"cols": ["o_totalprice"]},
        ],
    ).toPandas()
    exp = pdfs["orders"].nlargest(3, "o_totalprice")
    assert list(out.o_totalprice) == list(exp.o_totalprice)

    n = run_steps(targets, [{"target": "orders"}, {"distinct": ["o_orderstatus"]}]).count()
    assert n == pdfs["orders"].o_orderstatus.nunique()


def test_accessor_and_window(targets, pdfs):
    out = run_steps(
        targets,
        [
            {"target": "customer"},
            {"accessor": {"namespace": "str", "fn": "lower", "col": "c_name", "out": "lc"}},
            {"window": {"partition_by": ["c_nationkey"], "order_by": ["c_acctbal"],
                        "desc": True, "exprs": {"rn": "row_number()"}}},
            {"query": "rn = 1"},
        ],
    ).toPandas()
    assert (out.lc == out.c_name.str.lower()).all()
    # one top-balance customer per nation present in data
    assert out.c_nationkey.is_unique


def test_dt_accessor(targets):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"accessor": {"namespace": "dt", "fn": "year", "col": "o_orderdate", "out": "yr"}},
            {"distinct": ["yr"]},
        ],
    ).toPandas()
    assert out.yr.between(1990, 2010).all()


def test_apply_step(targets):
    out = run_steps(
        targets,
        [{"target": "orders"}, {"apply": {"func": "tests.test_steps:_test_take_head"}}],
    )
    assert out.count() == 11


def test_missing_target_and_step_errors(targets):
    with pytest.raises(MissingTargetError):
        run_steps(targets, [{"target": "nope"}])
    with pytest.raises(StepError) as ei:
        run_steps(targets, [{"target": "orders"}, {"nonsense_verb": {}}])
    assert ei.value.step_index == 1
    with pytest.raises(ValueError):
        run_steps(targets, [{"query": "1=1"}])  # first step must be target


def test_sample(targets):
    n = run_steps(
        targets, [{"target": "lineitem"}, {"sample": {"fraction": 0.1, "seed": 7}}]
    ).count()
    assert 300 < n < 900  # ~10% of 6000


# helper imported by test_apply_step (must be module-level importable)
def _test_take_head(df):
    return df.limit(11)
