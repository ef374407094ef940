"""FlatGeobuf reader — fixture built with a minimal flatbuffers builder
(back-to-front assembly, same wire format the reader parses)."""

from __future__ import annotations

import json
import struct

import pytest


from intake_spark.geo import FBBuilder as MiniFB


def _geometry(fb: MiniFB, gtype: int, xy=None, ends=None, parts=None) -> int:
    fields = []
    if parts:
        pref = fb.vec_offsets(parts)
        fields.append((7, "offset", pref))
    if xy is not None:
        xref = fb.vec_scalars("d", xy)
        fields.append((1, "offset", xref))
    if ends:
        eref = fb.vec_scalars("I", ends)
        fields.append((0, "offset", eref))
    fields.append((6, "scalar:B", gtype))
    return fb.table(sorted(fields))


def _feature(geom_builder, props: bytes) -> bytes:
    fb = MiniFB()
    gref = geom_builder(fb)
    fields = [(0, "offset", gref)]
    if props:
        pref = fb.vec_scalars("B", list(props))
        fields.append((1, "offset", pref))
    return fb.finish(fb.table(fields))


def _header(columns, features_count, geometry_type=0, node_size=0) -> bytes:
    fb = MiniFB()
    col_refs = []
    for name, ctype in columns:
        nref = fb.string(name)
        col_refs.append(fb.table([(0, "offset", nref), (1, "scalar:B", ctype)]))
    cvec = fb.vec_offsets(col_refs)
    nref = fb.string("test-layer")
    root = fb.table(
        [
            (0, "offset", nref),
            (2, "scalar:B", geometry_type),
            (7, "offset", cvec),
            (8, "scalar:Q", features_count),
            (9, "scalar:H", node_size),
        ]
    )
    return fb.finish(root)


COLUMNS = [("name", 11), ("pop", 7), ("frac", 10), ("flag", 2)]


def _props(*pairs) -> bytes:
    out = b""
    for ci, val in pairs:
        out += struct.pack("<H", ci)
        ctype = COLUMNS[ci][1]
        if ctype == 11:
            b = val.encode()
            out += struct.pack("<I", len(b)) + b
        elif ctype == 7:
            out += struct.pack("<q", val)
        elif ctype == 10:
            out += struct.pack("<d", val)
        elif ctype == 2:
            out += struct.pack("<?", val)
    return out


@pytest.fixture(scope="module")
def fgb_file(tmp_path_factory):
    from intake_spark.geo import FGB_MAGIC

    f0 = _feature(
        lambda fb: _geometry(fb, 1, xy=[30.0, 10.0]),
        _props((0, "a"), (1, 7)),
    )
    f1 = _feature(
        lambda fb: _geometry(
            fb, 3, xy=[0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 0.0], ends=[4]
        ),
        _props((2, 0.5)),
    )

    def multipoly(fb):
        p1 = _geometry(fb, 3, xy=[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0])
        p2 = _geometry(fb, 3, xy=[9.0, 9.0, 8.0, 9.0, 8.0, 8.0, 9.0, 9.0])
        return _geometry(fb, 6, parts=[p1, p2])

    f2 = _feature(multipoly, _props((3, True)))

    header = _header(COLUMNS, 3)
    blob = FGB_MAGIC + struct.pack("<I", len(header)) + header
    for f in (f0, f1, f2):
        blob += struct.pack("<I", len(f)) + f
    p = tmp_path_factory.mktemp("fgb") / "layer.fgb"
    p.write_bytes(blob)
    return str(p)


def test_flatgeobuf_reader_end_to_end(spark, fgb_file):
    from intake_spark.geo import FlatGeobuf, FlatGeobufReader

    df = FlatGeobufReader(data=FlatGeobuf(url=fgb_file)).read(spark=spark)
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 3

    assert rows[0].geometry_type == "Point"
    assert json.loads(rows[0].geometry) == {"type": "Point", "coordinates": [30.0, 10.0]}
    assert json.loads(rows[0].properties) == {"name": "a", "pop": 7}

    g1 = json.loads(rows[1].geometry)
    assert g1["type"] == "Polygon"
    assert g1["coordinates"] == [[[0, 0], [4, 0], [4, 4], [0, 0]]]
    assert json.loads(rows[1].properties) == {"frac": 0.5}

    g2 = json.loads(rows[2].geometry)
    assert g2["type"] == "MultiPolygon"
    assert g2["coordinates"][0] == [[[0, 0], [1, 0], [1, 1], [0, 0]]]
    assert g2["coordinates"][1] == [[[9, 9], [8, 9], [8, 8], [9, 9]]]
    assert json.loads(rows[2].properties) == {"flag": True}


def test_flatgeobuf_manifest_partitioning(spark, fgb_file):
    from intake_spark.geo import FlatGeobuf, FlatGeobufReader

    # one feature per task still yields every row exactly once
    df = FlatGeobufReader(data=FlatGeobuf(url=fgb_file)).read(
        spark=spark, features_per_task=1
    )
    assert sorted(r.id for r in df.collect()) == [0, 1, 2]


def test_flatgeobuf_recommend(fgb_file):
    from intake_spark.datatypes import recommend
    from intake_spark.geo import FlatGeobuf

    got = recommend(fgb_file)
    assert any(isinstance(d, FlatGeobuf) or d is FlatGeobuf for d in got) or any(
        getattr(d, "__name__", type(d).__name__) == "FlatGeobuf" for d in got
    )


def test_flatgeobuf_index_size():
    from intake_spark.geo import _fgb_index_size

    # 3 features, node 16: leaf level 3 + root 1 = 4 nodes * 40 bytes
    assert _fgb_index_size(3, 16) == 160
    assert _fgb_index_size(0, 16) == 0
    assert _fgb_index_size(5, 0) == 0
    # two levels: 100 leaves -> 7 -> 1
    assert _fgb_index_size(100, 16) == (100 + 7 + 1) * 40
    # do-while level count (flatbush): 1 feature still has a root above
    # the leaf -> 2 nodes, not 1 (external writers index this way)
    assert _fgb_index_size(1, 16) == 80
    # exactly node_size features: leaf level 16 + root 1
    assert _fgb_index_size(16, 16) == (16 + 1) * 40


def test_flatgeobuf_write_read_roundtrip(spark, fgb_file, tmp_path):
    from intake_spark.geo import FlatGeobuf, FlatGeobufReader
    from intake_spark.output import to_flatgeobuf

    src = FlatGeobufReader(data=FlatGeobuf(url=fgb_file)).read(spark=spark)
    out = str(tmp_path / "round.fgb")
    res = to_flatgeobuf(src, out)
    assert res.metadata["rows_written"] == 3

    back = FlatGeobufReader(data=FlatGeobuf(url=out)).read(spark=spark)
    a = sorted(
        (r.geometry_type, r.geometry, r.properties) for r in src.collect()
    )
    b = sorted(
        (r.geometry_type, r.geometry, r.properties) for r in back.collect()
    )
    assert a == b


def test_flatgeobuf_write_guard(spark, fgb_file, tmp_path):
    from intake_spark.geo import FlatGeobuf, FlatGeobufReader
    from intake_spark.output import to_flatgeobuf

    src = FlatGeobufReader(data=FlatGeobuf(url=fgb_file)).read(spark=spark)
    with pytest.raises(ValueError, match="max_bytes"):
        to_flatgeobuf(src, str(tmp_path / "g.fgb"), max_bytes=64)


def test_geojson_wkb_roundtrip_all_types():
    from intake_spark.geo import _wkb_geom, geojson_to_wkb

    docs = [
        {"type": "Point", "coordinates": [3.5, -2.0]},
        {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]},
        {"type": "MultiPoint", "coordinates": [[0, 0], [5, 5]]},
        {"type": "Polygon", "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 0]],
                                            [[1, 1], [2, 1], [2, 2], [1, 1]]]},
        {"type": "MultiLineString", "coordinates": [[[0, 0], [1, 0]], [[2, 2], [3, 3]]]},
        {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [1, 0], [1, 1], [0, 0]]],
            [[[9, 9], [8, 9], [8, 8], [9, 9]]]]},
        {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [1.0, 2.0]},
            {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}]},
    ]
    for doc in docs:
        gtype, coords, _ = _wkb_geom(geojson_to_wkb(doc), 0)
        assert gtype == doc["type"]
        def asfloat(c):
            if isinstance(c, list):
                return [asfloat(x) for x in c]
            return float(c)

        if gtype == "GeometryCollection":
            got = [{"type": g["type"], "coordinates": g["coordinates"]} for g in coords]
            want = [
                {"type": g["type"], "coordinates": asfloat(g["coordinates"])}
                for g in doc["geometries"]
            ]
            assert got == want
        else:
            assert coords == asfloat(doc["coordinates"])


def test_to_geoparquet_roundtrip(spark, fgb_file, tmp_path):
    from intake_spark.geo import FlatGeobuf, FlatGeobufReader, GeoParquet, GeoParquetReader
    from intake_spark.output import to_geoparquet

    src = FlatGeobufReader(data=FlatGeobuf(url=fgb_file)).read(spark=spark)
    url = str(tmp_path / "geo_pq")
    # geometry_type is re-derived by the reader on the way back in
    res = to_geoparquet(src.drop("geometry_type"), url)
    assert res.metadata["rows_written"] == 3

    back = GeoParquetReader(data=GeoParquet(url=url)).read(spark=spark)
    a = sorted((r.id, r.geometry_type, r.geometry) for r in src.collect())
    b = sorted((r.id, r.geometry_type, r.geometry) for r in back.collect())
    assert [x[0] for x in a] == [x[0] for x in b]

    # overwrite semantics: a re-run with fewer rows/partitions must clear
    # stale part files, not leave them for readers to silently merge
    res2 = to_geoparquet(src.drop("geometry_type").limit(1).coalesce(1), url)
    assert res2.metadata["rows_written"] == 1
    back2 = GeoParquetReader(data=GeoParquet(url=url)).read(spark=spark)
    assert back2.count() == 1
    assert [x[1] for x in a] == [x[1] for x in b]
    assert [json.loads(x[2]) for x in a] == [json.loads(x[2]) for x in b]


def test_wkt_geojson_roundtrip_all_types():
    from intake_spark.geo import geojson_to_wkt, wkt_to_geojson

    cases = [
        "POINT (30 10)",
        "LINESTRING (30 10, 10 30, 40 40)",
        "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
        "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
        "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
        "MULTIPOINT (10 40, 40 30)",
        "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
        "((15 5, 40 10, 10 20, 5 10, 15 5)))",
        "GEOMETRYCOLLECTION (POINT (40 10), LINESTRING (10 10, 20 20, 10 40))",
        "point (1.5 -2.25)",
    ]
    for wkt in cases:
        gtype, doc = wkt_to_geojson(wkt)
        assert doc is not None and doc["type"] == gtype
        # encode back and re-parse: fixed point
        gtype2, doc2 = wkt_to_geojson(geojson_to_wkt(doc))
        assert (gtype2, doc2) == (gtype, doc), wkt

    t, d = wkt_to_geojson("POLYGON EMPTY")
    assert t == "Polygon" and d is None


def test_decode_wkt_column_and_wkb_parity(spark):
    from intake_spark.geo import _wkb_geom, decode_wkt_column, geojson_to_wkb

    rows = [
        (1, "POINT (3 4)"),
        (2, "POLYGON ((0 0, 2 0, 2 2, 0 0))"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, wkt string")
    out = {r.id: r for r in decode_wkt_column(df).collect()}
    assert out[1].geometry_type == "Point"
    assert json.loads(out[1].geometry) == {"type": "Point", "coordinates": [3.0, 4.0]}
    assert out[3].geometry is None

    # the GeoJSON emitted by the WKT path feeds the WKB encoder unchanged
    gtype, coords, _ = _wkb_geom(geojson_to_wkb(json.loads(out[2].geometry)), 0)
    assert gtype == "Polygon" and coords[0][0] == [0.0, 0.0]


# --- review-pass regressions ----------------------------------------------


def test_wkt_scientific_notation_roundtrip():
    from intake_spark.geo import geojson_to_wkt, wkt_to_geojson

    doc = {"type": "Point", "coordinates": [1.5e20, 2.5e-10]}
    _t, back = wkt_to_geojson(geojson_to_wkt(doc))
    assert back == doc


def test_fgb_index_node_size_one_raises():
    from intake_spark.geo import _fgb_index_size

    with pytest.raises(ValueError, match="index_node_size"):
        _fgb_index_size(10, 1)


def test_to_flatgeobuf_late_key_and_nested_values(spark, tmp_path):
    from intake_spark.geo import FlatGeobuf, FlatGeobufReader
    from intake_spark.output import to_flatgeobuf

    rows = [
        (0, json.dumps({"type": "Point", "coordinates": [0.0, 0.0]}),
         json.dumps({"a": 1})),
        (1, json.dumps({"type": "Point", "coordinates": [1.0, 1.0]}),
         json.dumps({"a": 2.5, "late": "x", "tags": ["u", "v"]})),
    ]
    df = spark.createDataFrame(rows, "id long, geometry string, properties string")
    url = str(tmp_path / "late.fgb")
    to_flatgeobuf(df, url)
    back = {
        r.id: json.loads(r.properties)
        for r in FlatGeobufReader(data=FlatGeobuf(url=url)).read(spark=spark).collect()
    }
    # mixed int/float 'a' resolves upward to String (lossless, no crash);
    # the key first appearing on a later row is NOT dropped
    assert back[1]["late"] == "x"
    assert json.loads(back[1]["tags"]) == ["u", "v"]
    assert {"a", "late", "tags"} <= set(back[1])


def test_select_token_budget_null_text(spark):
    from intake_spark.llm import assembly

    rows = [(1, "alpha beta gamma"), (2, None), (3, "one two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = assembly.select_token_budget(df, budget=100)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3]
    assert all(r.n_tokens > 0 for r in out.collect())
