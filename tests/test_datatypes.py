"""Datatype detection tests (scoring contract of SURVEY §2.6)."""

from __future__ import annotations

import gzip

from intake_spark import datatypes as dt


def test_recommend_by_url():
    out = dt.recommend("s3://bucket/table/part-0.parquet")
    assert out and out[0] is dt.Parquet
    out = dt.recommend("/data/file.csv")
    assert dt.CSV in out[:2]
    out = dt.recommend("http://x/y.json")
    assert dt.JSONFile in out[:2]


def test_recommend_by_mime():
    assert dt.recommend(mime="text/csv")[0] is dt.CSV
    assert dt.recommend(mime="application/pdf")[0] is dt.PDF


def test_recommend_magic_beats_pattern():
    # parquet magic bytes but .csv extension: magic (1.5) outranks pattern (1.1)
    out = dt.recommend("weird.csv", head=b"PAR1xxxxxxxx")
    assert out[0] is dt.Parquet


def test_head_veto():
    # .json extension but head is clearly not JSON: JSONFile vetoed
    out = dt.recommend("x.json", head=b"\x00\x01binarygarbage")
    assert dt.JSONFile not in out


def test_magic_offset():
    head = b"\x00\x00\x00\x18ftypmp42rest"
    assert dt.MP4 in dt.recommend("clip.bin", head=head)


def test_compressed_recursion(tmp_path):
    p = tmp_path / "table.csv.gz"
    p.write_bytes(gzip.compress(b"a,b,c\n1,2,3\n4,5,6\n"))
    out = dt.recommend(str(p))
    assert out and out[0] is dt.CSV


def test_real_file_magic(tmp_path):
    out = dt.recommend("/root/testdata/sf0.001/lineitem.parquet")
    assert out[0] is dt.Parquet


def test_to_reader_cls():
    from intake_spark.readers import SparkParquet

    assert dt.Parquet(url="/x.parquet").to_reader_cls() is SparkParquet


def test_reader_avoid(monkeypatch):
    from intake_spark.config import conf

    monkeypatch.setitem(conf, "reader_avoid", ["SparkParquet"])
    try:
        cls = dt.Parquet(url="/x.parquet").to_reader_cls()
        assert cls.__name__ != "SparkParquet"
    except ValueError:
        pass  # acceptable: no alternative reader registered
