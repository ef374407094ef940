"""GeoPackageReader vs a hand-built .gpkg (stdlib sqlite3 + spec WKB
blobs): layer selection, all basic geometry types, distributed rowid
pages, canonical GeoJSON output."""

from __future__ import annotations

import json
import sqlite3
import struct

import pytest

from intake_spark.geo import GeoPackage, GeoPackageReader, gpkg_blob_to_geojson


def _wkb_point(x, y):
    return struct.pack("<BI2d", 1, 1, x, y)


def _wkb_linestring(pts):
    return struct.pack("<BII", 1, 2, len(pts)) + b"".join(
        struct.pack("<2d", *p) for p in pts
    )


def _wkb_polygon(rings):
    out = struct.pack("<BII", 1, 3, len(rings))
    for r in rings:
        out += struct.pack("<I", len(r)) + b"".join(struct.pack("<2d", *p) for p in r)
    return out


def _wkb_multipoint(pts):
    return struct.pack("<BII", 1, 4, len(pts)) + b"".join(_wkb_point(*p) for p in pts)


def _gp_blob(wkb: bytes, envelope: bool = False) -> bytes:
    flags = 0x01 | (0x02 if envelope else 0)  # LE srs_id + env indicator 1
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", 4326)
    if envelope:
        head += struct.pack("<4d", 0, 0, 0, 0)
    return head + wkb


def make_gpkg(path, layers: dict[str, list[tuple[bytes, dict]]]) -> str:
    con = sqlite3.connect(str(path))
    con.execute(
        "CREATE TABLE gpkg_contents (table_name text, data_type text, "
        "identifier text, srs_id int)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name text, column_name text, "
        "geometry_type_name text, srs_id int, z int, m int)"
    )
    for name, feats in layers.items():
        attrs = sorted({k for _, props in feats for k in props})
        cols = ", ".join(f'"{a}"' for a in attrs)
        con.execute(
            f'CREATE TABLE "{name}" (fid INTEGER PRIMARY KEY, geom BLOB'
            + (", " + cols if attrs else "")
            + ")"
        )
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?, 'features', ?, 4326)", (name, name)
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'GEOMETRY', 4326, 0, 0)",
            (name,),
        )
        for blob, props in feats:
            ph = ", ".join("?" for _ in range(1 + len(attrs)))
            con.execute(
                f'INSERT INTO "{name}" (geom{"".join(", " + chr(34) + a + chr(34) for a in attrs)}) '
                f"VALUES ({ph})",
                [blob] + [props.get(a) for a in attrs],
            )
    con.commit()
    con.close()
    return str(path)


def test_gpkg_geometries_and_properties(spark, tmp_path):
    feats = [
        (_gp_blob(_wkb_point(2.5, -3.5)), {"name": "pt", "pop": 12}),
        (_gp_blob(_wkb_linestring([[0, 0], [1, 1], [2, 0.5]]), envelope=True), {"name": "ln", "pop": 0}),
        (_gp_blob(_wkb_polygon([[[0, 0], [4, 0], [4, 4], [0, 0]], [[1, 1], [2, 1], [1, 2], [1, 1]]])), {"name": "pg", "pop": None}),
        (_gp_blob(_wkb_multipoint([[5, 6], [7, 8]])), {"name": "mp", "pop": 3}),
    ]
    url = make_gpkg(tmp_path / "v.gpkg", {"places": feats})
    rdr = GeoPackageReader(data=GeoPackage(url=url))
    rows = {json.loads(r.properties)["name"]: r for r in rdr.read(spark=spark).collect()}
    assert len(rows) == 4
    assert json.loads(rows["pt"].geometry) == {"type": "Point", "coordinates": [2.5, -3.5]}
    assert rows["ln"].geometry_type == "LineString"
    assert json.loads(rows["ln"].geometry)["coordinates"] == [[0, 0], [1, 1], [2, 0.5]]
    pg = json.loads(rows["pg"].geometry)
    assert len(pg["coordinates"]) == 2 and pg["coordinates"][0][1] == [4, 0]
    assert json.loads(rows["mp"].geometry)["coordinates"] == [[5, 6], [7, 8]]
    assert json.loads(rows["pt"].properties) == {"name": "pt", "pop": 12}
    assert rdr.data.metadata["layer"] == "places"


def test_gpkg_layer_selection_and_pages(spark, tmp_path):
    a = [(_gp_blob(_wkb_point(float(i), 0.0)), {"i": i}) for i in range(23)]
    b = [(_gp_blob(_wkb_point(9.0, 9.0)), {"i": 99})]
    url = make_gpkg(tmp_path / "two.gpkg", {"alpha": a, "beta": b})
    df = GeoPackageReader(data=GeoPackage(url=url)).read(spark=spark, table="alpha", rows_per_task=5)
    rows = df.collect()
    assert len(rows) == 23
    assert sorted(json.loads(r.properties)["i"] for r in rows) == list(range(23))
    df_b = GeoPackageReader(data=GeoPackage(url=url)).read(spark=spark, table="beta")
    assert df_b.count() == 1
    with pytest.raises(KeyError, match="not in"):
        GeoPackageReader(data=GeoPackage(url=url)).read(spark=spark, table="nope")


def test_gpkg_blob_edge_cases():
    # empty-geometry flag
    blob = b"GP" + bytes([0, 0x11]) + struct.pack("<i", 0)
    assert gpkg_blob_to_geojson(blob) == ("", None)
    # Z geometry rejected
    zpt = struct.pack("<BI3d", 1, 1001, 1, 2, 3)
    with pytest.raises(ValueError, match="Z/M"):
        gpkg_blob_to_geojson(_gp_blob(zpt))


def test_recommend_picks_gpkg(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_gpkg(tmp_path / "r.gpkg", {"l": [(_gp_blob(_wkb_point(0, 0)), {})]})
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("GeoPackage" in k for k in kinds)


def _wkb_point(x, y):
    import struct

    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(pts):
    import struct

    out = struct.pack("<BII", 1, 2, len(pts))
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def test_geoparquet_reader(spark, tmp_path):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from intake_spark.geo import GeoParquet, GeoParquetReader

    tbl = pa.table(
        {
            "name": ["a", "b", "c"],
            "pop": [10, 20, 30],
            "geom": [
                _wkb_point(1.5, 2.5),
                _wkb_linestring([(0, 0), (1, 1), (2, 0)]),
                None,
            ],
        }
    )
    meta = {
        b"geo": json.dumps(
            {"version": "1.0.0", "primary_column": "geom",
             "columns": {"geom": {"encoding": "WKB"}}}
        ).encode()
    }
    tbl = tbl.replace_schema_metadata(meta)
    p = str(tmp_path / "places.geo.parquet")
    pq.write_table(tbl, p)

    rdr = GeoParquetReader(data=GeoParquet(url=p))
    out = rdr.read(spark=spark)
    rows = {r.name: r for r in out.collect()}
    assert rows["a"].geometry_type == "Point"
    assert json.loads(rows["a"].geometry) == {"type": "Point", "coordinates": [1.5, 2.5]}
    assert rows["b"].geometry_type == "LineString"
    assert json.loads(rows["b"].geometry)["coordinates"] == [[0, 0], [1, 1], [2, 0]]
    assert rows["c"].geometry is None
    assert rows["a"].pop == 10  # attribute column intact
    assert rdr.data.metadata["geo"]["primary_column"] == "geom"
    # attribute pruning/pushdown stays native: scan plan reads parquet
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="geometry column"):
        rdr.read(spark=spark, geometry_col="nope")
