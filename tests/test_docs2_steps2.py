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


def _make_xlsx(header, rows) -> bytes:
    """Minimal xlsx writer (inline strings + numbers) for testing."""
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'

    def cell(ref, v):
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    def row(i, vals):
        cells = "".join(cell(f"{chr(65+j)}{i}", v) for j, v in enumerate(vals))
        return f'<row r="{i}">{cells}</row>'

    body = row(1, header) + "".join(row(i + 2, r) for i, r in enumerate(rows))
    sheet = f'<?xml version="1.0"?><worksheet {ns}><sheetData>{body}</sheetData></worksheet>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", "<workbook/>")
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def test_xlsx_reader_stdlib(spark, tmp_path):
    from intake_spark import datatypes as dt
    from intake_spark.documents import XLSXReader

    p = tmp_path / "book.xlsx"
    p.write_bytes(_make_xlsx(["name", "qty"], [["apple", 3], ["beet", 5]]))
    out = XLSXReader(data=dt.Excel(url=str(p))).read(spark=spark)
    rows = {r.name: r.qty for r in out.collect()}
    assert rows == {"apple": 3.0, "beet": 5.0}


def test_zip_container_detection(tmp_path):
    from intake_spark import datatypes as dt

    zp = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("data/table.csv", "a,b\n1,2\n")
    out = dt.recommend(str(zp))
    assert out and out[0] is dt.CSV


# --- round-5 long-tail document readers -------------------------------------


def test_rst_reader(spark, tmp_path):
    from intake_spark.documents import ReStructuredText, ReStructuredTextReader

    (tmp_path / "doc.rst").write_text(
        "Project Title\n=============\n\nbody text\n\nUsage\n-----\nmore\n"
    )
    (tmp_path / "flat.rst").write_text("no sections here\njust text\n")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in
            ReStructuredTextReader(data=ReStructuredText(url=str(tmp_path))).read(spark=spark).collect()}
    assert rows["doc.rst"].n_sections == 2
    assert rows["doc.rst"].title == "Project Title"
    assert rows["flat.rst"].n_sections == 0


def test_svg_reader(spark, tmp_path):
    from intake_spark.documents import SVG, SVGReader

    (tmp_path / "pic.svg").write_text(
        '<svg xmlns="http://www.w3.org/2000/svg" width="120" height="80" '
        'viewBox="0 0 120 80"><rect x="0" y="0"/><circle r="5"/>'
        "<circle r='9'/></svg>"
    )
    r = SVGReader(data=SVG(url=str(tmp_path))).read(spark=spark).collect()[0]
    assert (r.width, r.height) == ("120", "80")
    assert r.viewbox == "0 0 120 80"
    assert r.element_counts["circle"] == 2 and r.element_counts["rect"] == 1
    assert r.n_elements == 4  # svg + rect + 2 circles


def test_sdf_reader(spark, tmp_path):
    from intake_spark.documents import SDF, SDFReader

    mol = (
        "aspirin\n  prog\ncomment\n"
        " 13 13  0  0  0  0  0  0  0  0999 V2000\n"
        "atoms...\n"
        "M  END\n"
        "> <MW>\n180.16\n\n"
        ">  <FORMULA>\nC9H8O4\n\n"
        "$$$$\n"
        "water\n  prog\n\n"
        "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
        "M  END\n"
        "$$$$\n"
    )
    (tmp_path / "mols.sdf").write_text(mol)
    rows = sorted(
        SDFReader(data=SDF(url=str(tmp_path))).read(spark=spark).collect(),
        key=lambda r: r.mol_index,
    )
    assert [r.title for r in rows] == ["aspirin", "water"]
    assert rows[0].n_atoms == 13 and rows[0].n_bonds == 13
    assert rows[0].properties == {"MW": "180.16", "FORMULA": "C9H8O4"}
    assert rows[1].n_atoms == 3 and rows[1].properties == {}


def test_yaml_config_reader(spark, tmp_path):
    from intake_spark.documents import YAMLConfigReader, YAMLFile

    (tmp_path / "app.yaml").write_text(
        "server:\n  host: x\n  port: 8080\nflags:\n  debug: true\n"
    )
    out = {r.key: r.value for r in
           YAMLConfigReader(data=YAMLFile(url=str(tmp_path))).read(spark=spark).collect()}
    assert out["server.host"] == "x" and out["server.port"] == "8080"
    assert out["flags.debug"] in ("true", "True")


def test_python_source_reader(spark, tmp_path):
    from intake_spark.documents import PythonSourceCode, PythonSourceReader

    (tmp_path / "mod.py").write_text(
        "import os\nfrom json import dumps\n\n"
        "class A:\n    def m(self):\n        pass\n\n"
        "def f():\n    return 1\n"
    )
    (tmp_path / "broken.py").write_text("def broken(:\n")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in
            PythonSourceReader(data=PythonSourceCode(url=str(tmp_path))).read(spark=spark).collect()}
    m = rows["mod.py"]
    assert m.n_classes == 1 and m.n_functions == 2 and m.syntax_ok
    assert m.imports == ["json", "os"]
    assert not rows["broken.py"].syntax_ok


def test_pickle_reader_gated(spark, tmp_path):
    import pickle

    import pytest as _pytest

    from intake_spark import config as isconf
    from intake_spark.documents import PickleFile, PickleReader

    p = tmp_path / "rows.pkl"
    p.write_bytes(pickle.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]))
    rdr = PickleReader(data=PickleFile(url=str(p)))
    # default posture: unpickling disabled
    assert isconf.conf["allow_pickle"] is False
    with _pytest.raises(PermissionError, match="allow_pickle"):
        rdr.read(spark=spark)
    isconf.conf["allow_pickle"] = True
    try:
        rows = sorted((r.a, r.b) for r in rdr.read(spark=spark).collect())
        assert rows == [(1, "x"), (2, "y")]
        # non-record pickles become one repr row
        p2 = tmp_path / "obj.pkl"
        p2.write_bytes(pickle.dumps({"k": [1, 2]}))
        r = PickleReader(data=PickleFile(url=str(p2))).read(spark=spark).first()
        assert "k" in r.value
    finally:
        isconf.reset()


def test_python_module_reader_gated(tmp_path):
    import pytest as _pytest

    from intake_spark import config as isconf
    from intake_spark.documents import PythonModuleReader, PythonSourceCode

    p = tmp_path / "mymod.py"
    p.write_text("X = 41\n\ndef f(y):\n    return X + y\n")
    rdr = PythonModuleReader(data=PythonSourceCode(url=str(p)))
    isconf.conf["allow_import"] = False
    try:
        with _pytest.raises(PermissionError, match="allow_import"):
            rdr.read()
    finally:
        isconf.reset()
    # default posture allows imports (parity with the templating layer)
    mod = rdr.read()
    assert mod.__name__ == "mymod" and mod.f(1) == 42
    named = PythonModuleReader(data=PythonSourceCode(url=str(p))).read(
        module_name="other"
    )
    assert named.__name__ == "other"


def test_xlsx_sheet_index_numeric_order(spark, tmp_path):
    """sheet_index must follow numeric sheet order: lexicographic naming
    puts sheet10.xml before sheet2.xml."""
    import zipfile

    from intake_spark import datatypes as dt
    from intake_spark.documents import XLSXReader

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'

    def sheet_xml(marker):
        return (
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            f'<row r="1"><c r="A1" t="str"><v>h</v></c></row>'
            f'<row r="2"><c r="A2"><v>{marker}</v></c></row>'
            "</sheetData></worksheet>"
        )

    p = tmp_path / "many.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        for i in range(1, 12):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml(i * 100))
    df = XLSXReader(data=dt.Excel(url=str(p))).read(spark=spark, sheet_index=1)
    assert [r[0] for r in df.collect()] == [200.0] or [r[0] for r in df.collect()] == [200]


def test_html_nested_table_rows_stay_in_outer(spark, tmp_path):
    from intake_spark.documents import HTMLFile, HTMLTableReader

    html = """<html><body><table>
      <tr><th>k</th></tr>
      <tr><td><table><tr><th>i</th></tr><tr><td>inner</td></tr></table></td></tr>
      <tr><td>outer-after</td></tr>
    </table></body></html>"""
    p = tmp_path / "t.html"
    p.write_text(html)
    outer = HTMLTableReader(data=HTMLFile(url=str(p))).read(spark=spark, table_index=0)
    vals = {r.k for r in outer.collect()}
    assert "outer-after" in vals  # previously swallowed by the inner table
    inner = HTMLTableReader(data=HTMLFile(url=str(p))).read(spark=spark, table_index=1)
    assert {r.i for r in inner.collect()} == {"inner"}


def test_to_npy_truncation_guard(spark, tmp_path):
    import pytest as _pytest

    from intake_spark.output import to_npy

    rows = [(0, 0, [2, 4], [1.0, 2.0, 3.0, 4.0])]
    df = spark.createDataFrame(
        rows, "chunk_id long, offset0 long, shape array<long>, values array<double>"
    )
    # drop half the elements but keep the declared shape: must refuse
    bad = df.selectExpr("chunk_id", "offset0", "shape", "slice(values, 1, 2) as values")
    with _pytest.raises(ValueError, match="truncated"):
        to_npy(bad, str(tmp_path / "bad.npy"))
    import os

    assert not os.path.exists(str(tmp_path / "bad.npy"))
