"""DOCX/EPUB/GeoJSON readers, XML round-trip, new step verbs."""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from tests.conftest import SF_SMALL

from intake_spark.session import load_table
from intake_spark.steps import run_steps


def _make_docx(paras: list[str]) -> bytes:
    ns = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    body = "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paras)
    doc = f'<?xml version="1.0"?><w:document {ns}><w:body>{body}</w:body></w:document>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _make_epub(chapters: list[str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        for i, ch in enumerate(chapters):
            z.writestr(f"ch{i}.xhtml", f"<html><body><p>{ch}</p></body></html>")
    return buf.getvalue()


def test_docx_reader(spark, tmp_path):
    from intake_spark.documents import DOCX, DOCXReader

    (tmp_path / "a.docx").write_bytes(_make_docx(["Hello world", "Second para"]))
    out = DOCXReader(data=DOCX(url=str(tmp_path / "a.docx"))).read(spark=spark).first()
    assert out.text == "Hello world\nSecond para" and out.n_chars == len(out.text)


def test_epub_reader(spark, tmp_path):
    from intake_spark.documents import EPUB, EPUBReader

    (tmp_path / "b.epub").write_bytes(_make_epub(["Chapter one text", "Chapter two"]))
    out = EPUBReader(data=EPUB(url=str(tmp_path / "b.epub"))).read(spark=spark).first()
    assert "Chapter one text" in out.text and "Chapter two" in out.text


def test_docx_dir_scan(spark, tmp_path):
    from intake_spark.documents import DOCX, DOCXReader

    for i in range(3):
        (tmp_path / f"d{i}.docx").write_bytes(_make_docx([f"doc {i}"]))
    (tmp_path / "noise.txt").write_text("ignore me")
    out = DOCXReader(data=DOCX(url=str(tmp_path))).read(spark=spark)
    assert out.count() == 3


def test_geojson_reader(spark, tmp_path):
    from intake_spark.documents import GeoJSON, GeoJSONReader

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "a1",
                "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
                "properties": {"name": "spot"},
            }
        ],
    }
    p = tmp_path / "f.geojson"
    p.write_text(json.dumps(fc))
    out = GeoJSONReader(data=GeoJSON(url=str(p))).read(spark=spark).first()
    assert out.geometry_type == "Point" and json.loads(out.properties)["name"] == "spot"


def test_xml_roundtrip(spark, tmp_path):
    from intake_spark import datatypes as dt
    from intake_spark.output import to_xml

    region = load_table(spark, SF_SMALL, "region")
    url = str(tmp_path / "region_xml")
    desc = to_xml(region, url, row_tag="region")
    assert isinstance(desc, dt.XML)
    back = desc.to_reader().read(spark=spark, rowTag="region")
    assert back.count() == 5 and set(back.columns) == {"r_regionkey", "r_name"}


@pytest.fixture(scope="module")
def targets(spark):
    return {"orders": load_table(spark, SF_SMALL, "orders")}


def test_pivot_verb(targets):
    out = run_steps(
        targets,
        [
            {"target": "orders"},
            {"pivot": {"by": "o_orderpriority", "pivot": "o_orderstatus",
                       "values": ["O", "F", "P"],
                       "agg": {"n": {"fn": "count", "col": "o_orderkey"}}}},
        ],
    ).toPandas()
    assert {"O_n", "F_n", "P_n"} <= set(out.columns) or {"O", "F", "P"} <= set(out.columns)


def test_rollup_cube_verbs(targets):
    roll = run_steps(
        targets,
        [{"target": "orders"},
         {"rollup": {"by": ["o_orderstatus"], "agg": {"n": "count(*)"}}}],
    ).toPandas()
    assert roll.o_orderstatus.isna().sum() == 1  # grand-total row

    cube = run_steps(
        targets,
        [{"target": "orders"},
         {"cube": {"by": ["o_orderstatus", "o_orderpriority"], "agg": {"n": "count(*)"}}}],
    )
    assert cube.count() > roll.shape[0]


def test_explode_verb(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], ["id", "tags"])
    out = run_steps({"t": df}, [{"target": "t"}, {"explode": {"col": "tags", "out": "tag"}}])
    assert out.count() == 3
