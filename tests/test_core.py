"""Kernel tests: tokenization, import strings, pattern utilities, config."""

from __future__ import annotations

import pytest

from intake_spark import utils
from intake_spark.config import conf, reset


def test_tokenize_deterministic():
    a = {"x": 1, "y": [1, 2], "z": {"a": "b"}}
    b = {"z": {"a": "b"}, "y": [1, 2], "x": 1}
    assert utils.tokenize(a) == utils.tokenize(b)
    assert len(utils.tokenize(a)) == 16
    assert utils.tokenize(a) != utils.tokenize({"x": 2})


def test_tokenizable_equality():
    from intake_spark.datatypes import Parquet

    a = Parquet(url="/tmp/x.parquet")
    b = Parquet(url="/tmp/x.parquet")
    c = Parquet(url="/tmp/y.parquet")
    assert a == b and a.token == b.token
    assert a != c and hash(a) != hash(c)


def test_func_roundtrip():
    import math

    s = utils.func_to_str(math.sqrt)
    assert s == "{func(math:sqrt)}"
    assert utils.str_to_func(s)(4) == 2.0


def test_func_rejects_lambda():
    with pytest.raises(ValueError):
        utils.func_to_str(lambda x: x)


def test_func_gate():
    with pytest.raises(PermissionError):
        utils.str_to_func("{func(math:sqrt)}", allow_import=False)


def test_reverse_format():
    got = utils.reverse_format("data_{year}_{month}.csv", "data_2024_01.csv")
    assert got == {"year": "2024", "month": "01"}
    with pytest.raises(ValueError):
        utils.reverse_format("a_{x}.csv", "b_1.csv")


def test_pattern_to_glob():
    assert utils.pattern_to_glob("s3://b/{year}/{month}/*.csv") == "s3://b/*/*/*.csv"


def test_subclasses():
    from intake_spark.datatypes import BaseData, FileData, Parquet

    subs = utils.subclasses(BaseData)
    assert FileData in subs and Parquet in subs


def test_config_reset(monkeypatch):
    conf["allow_import"] = False
    reset()
    assert conf["allow_import"] is True
    monkeypatch.setenv("INTAKE_SPARK_ALLOW_IMPORT", "false")
    reset()
    assert conf["allow_import"] is False
    monkeypatch.delenv("INTAKE_SPARK_ALLOW_IMPORT")
    reset()
