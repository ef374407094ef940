"""Geo long-tail readers: KML, GPX, MBTiles — stdlib-only, Spark-first
(the reference gates these on fiona/geopandas: KMLReader readers.py:2287,
GPXReader :2301, MBTilesReader :2315).

KML/GPX are XML: many files parse in parallel via binaryFile +
Arrow-batched mapInPandas (ElementTree on executors). MBTiles is a sqlite
db — driver-side sqlite3 for the (small) metadata table; the tiles table
streams through ``fetchmany`` batches into Arrow so the driver never holds
the full tile pyramid.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import types as T

from intake_spark import datatypes as dt
from intake_spark.readers import BaseReader


class KML(dt.FileData):
    filepattern = r"kml$"
    structure = {"table", "nested"}


class GPX(dt.FileData):
    filepattern = r"gpx$"
    structure = {"table", "timeseries"}


class MBTiles(dt.FileData):
    filepattern = r"mbtiles$"
    magic = (b"SQLite format 3",)
    structure = {"table", "image"}


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _kml_rows(content: bytes) -> list[dict]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    rows = []
    for pm in root.iter():
        if _strip_ns(pm.tag) != "Placemark":
            continue
        name, desc, gtype, coords = "", "", "", []
        for el in pm.iter():
            t = _strip_ns(el.tag)
            if t == "name":
                name = (el.text or "").strip()
            elif t == "description":
                desc = (el.text or "").strip()
            elif t in ("Point", "LineString", "Polygon"):
                gtype = t
            elif t == "coordinates" and el.text:
                for tok in el.text.split():
                    parts = tok.split(",")
                    if len(parts) >= 2:
                        coords.append([float(parts[0]), float(parts[1])])
        rows.append(
            {"name": name, "description": desc, "geom_type": gtype, "coordinates": coords}
        )
    return rows


_KML_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("geom_type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


class KMLReader(BaseReader):
    """KML placemarks → (path, name, description, geom_type, coordinates)."""

    implements = {KML}

    def _read(self, spark, glob: str = "*.kml", **kwargs):
        from intake_spark.session import ensure_py_deps

        ensure_py_deps(spark)
        files = (
            spark.read.format("binaryFile").load(self.data.url)
            if "*" in self.data.url
            else spark.read.format("binaryFile").option("pathGlobFilter", glob).load(self.data.url)
        )

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    for r in _kml_rows(content):
                        rows.append({"path": path, **r})
                yield pd.DataFrame(
                    rows,
                    columns=["path", "name", "description", "geom_type", "coordinates"],
                )

        return files.select("path", "content").mapInPandas(parse, schema=_KML_SCHEMA)


_GPX_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("track", T.StringType()),
        T.StructField("segment", T.IntegerType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("ele", T.DoubleType()),
        T.StructField("time", T.StringType()),
    ]
)


def _gpx_rows(content: bytes) -> list[dict]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    rows = []
    for trk in root.iter():
        if _strip_ns(trk.tag) != "trk":
            continue
        tname = ""
        for el in trk:
            if _strip_ns(el.tag) == "name":
                tname = (el.text or "").strip()
        seg_i = 0
        for seg in trk.iter():
            if _strip_ns(seg.tag) != "trkseg":
                continue
            for pt in seg:
                if _strip_ns(pt.tag) != "trkpt":
                    continue
                ele, time = None, ""
                for el in pt:
                    t = _strip_ns(el.tag)
                    if t == "ele" and el.text:
                        ele = float(el.text)
                    elif t == "time":
                        time = (el.text or "").strip()
                rows.append(
                    {
                        "track": tname,
                        "segment": seg_i,
                        "lat": float(pt.get("lat")),
                        "lon": float(pt.get("lon")),
                        "ele": ele,
                        "time": time,
                    }
                )
            seg_i += 1
    return rows


class GPXReader(BaseReader):
    """GPX trackpoints → (path, track, segment, lat, lon, ele, time)."""

    implements = {GPX}

    def _read(self, spark, glob: str = "*.gpx", **kwargs):
        from intake_spark.session import ensure_py_deps

        ensure_py_deps(spark)
        files = (
            spark.read.format("binaryFile").load(self.data.url)
            if "*" in self.data.url
            else spark.read.format("binaryFile").option("pathGlobFilter", glob).load(self.data.url)
        )

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    for r in _gpx_rows(content):
                        rows.append({"path": path, **r})
                yield pd.DataFrame(
                    rows,
                    columns=["path", "track", "segment", "lat", "lon", "ele", "time"],
                )

        return files.select("path", "content").mapInPandas(parse, schema=_GPX_SCHEMA)


class MBTilesReader(BaseReader):
    """MBTiles → tile rows (zoom_level, tile_column, tile_row, tile_data)
    or the metadata table (``table="metadata"``). Stdlib sqlite3, batched
    fetch so the driver holds one batch at a time."""

    implements = {MBTiles}
    lazy = False  # sqlite is driver-local; batched, but not cluster-parallel

    def _read(self, spark, table: str = "tiles", zoom: int | None = None, batch: int = 10_000, **kwargs):
        import sqlite3

        con = sqlite3.connect(self.data.url)
        try:
            if table == "metadata":
                rows = con.execute("SELECT name, value FROM metadata").fetchall()
                return spark.createDataFrame(rows or [("", "")], "name string, value string")
            q = "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
            if zoom is not None:
                q += f" WHERE zoom_level = {int(zoom)}"
            cur = con.execute(q)
            schema = "zoom_level int, tile_column int, tile_row int, tile_data binary"
            dfs = []
            while True:
                chunk = cur.fetchmany(batch)
                if not chunk:
                    break
                dfs.append(spark.createDataFrame(chunk, schema))
            if not dfs:
                return spark.createDataFrame([], schema)
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out
        finally:
            con.close()
