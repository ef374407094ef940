"""THREDDS catalog descend + merged dataset, against a mocked two-level
InvCatalog-1.0 XML tree whose datasets are real netCDF3 files on disk —
catalogRef descent, fileServer base resolution, fnmatch selection, and
the unionByName merge are all exercised offline."""

from __future__ import annotations

import numpy as np
import pytest

from intake_spark.services import (
    THREDDSCatalogData,
    ThreddsCatalogReader,
    thredds_catalog,
    thredds_merged_dataset,
)
from tests.test_bio_geo_stats import _make_netcdf3

NS = 'xmlns="http://www.unidata.ucar.edu/namespaces/thredds/InvCatalog/v1.0" ' \
     'xmlns:xlink="http://www.w3.org/1999/xlink"'


def _tree(tmp_path):
    """Root catalog -> catalogRef 'obs' -> sub-catalog with 3 datasets
    (2 matching temp_*.nc, 1 other)."""
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    a = np.arange(12, dtype="<f8").reshape(3, 4)
    b = (np.arange(12, dtype="<f8") * 2).reshape(3, 4)
    c = np.ones((2, 2), dtype="<f8")
    (d / "temp_2001.nc").write_bytes(_make_netcdf3("t", a))
    (d / "temp_2002.nc").write_bytes(_make_netcdf3("t", b))
    (d / "salinity.nc").write_bytes(_make_netcdf3("s", c))

    # offline/injectable-fetch catalog: a LOCAL base URL, so root-relative
    # hrefs (the local service base "{d}/") resolve to local files. An
    # http(s) catalog URL would — correctly — force root-relative hrefs
    # onto the catalog's host (see test_thredds_server_relative_dap_base).
    root_url = "/mock/catalog.xml"
    sub_url = "/mock/obs/catalog.xml"
    root_xml = f"""<?xml version="1.0"?>
    <catalog {NS} name="root">
      <service name="all" serviceType="Compound" base="">
        <service name="http" serviceType="HTTPServer" base="{d}/"/>
        <service name="odap" serviceType="OPeNDAP" base="/thredds/dodsC/"/>
      </service>
      <dataset name="top">
        <catalogRef xlink:href="obs/catalog.xml" xlink:title="obs"/>
      </dataset>
    </catalog>"""
    sub_xml = f"""<?xml version="1.0"?>
    <catalog {NS} name="obs">
      <service name="http" serviceType="HTTPServer" base="{d}/"/>
      <dataset name="observations">
        <dataset name="temp_2001.nc" urlPath="temp_2001.nc"/>
        <dataset name="temp_2002.nc" urlPath="temp_2002.nc"/>
        <dataset name="salinity.nc" urlPath="salinity.nc"/>
      </dataset>
    </catalog>"""
    pages = {root_url: root_xml.encode(), sub_url: sub_xml.encode()}

    def fetch(url: str) -> bytes:
        return pages[url]

    return root_url, fetch, (a, b)


def test_thredds_catalog_walk(tmp_path):
    root_url, fetch, _ = _tree(tmp_path)
    cat = thredds_catalog(THREDDSCatalogData(url=root_url), fetch=fetch)
    assert list(cat) == ["obs"]
    sub = cat["obs"].read(fetch=fetch)
    assert sorted(sub) == ["salinity.nc", "temp_2001.nc", "temp_2002.nc"]


def test_thredds_merged_dataset(spark, tmp_path):
    root_url, fetch, (a, b) = _tree(tmp_path)
    df = thredds_merged_dataset(spark, root_url, "obs/temp_*.nc", fetch=fetch)
    rows = df.collect()
    assert {r.source for r in rows} == {"temp_2001.nc", "temp_2002.nc"}
    got_a = np.concatenate(
        [r.values for r in sorted(rows, key=lambda r: r.offset0) if r.source == "temp_2001.nc"]
    ).reshape(3, 4)
    np.testing.assert_array_equal(got_a, a)
    got_b = np.concatenate(
        [r.values for r in sorted(rows, key=lambda r: r.offset0) if r.source == "temp_2002.nc"]
    ).reshape(3, 4)
    np.testing.assert_array_equal(got_b, b)


def test_thredds_merged_no_match_raises(spark, tmp_path):
    root_url, fetch, _ = _tree(tmp_path)
    with pytest.raises(ValueError, match="no datasets match"):
        thredds_merged_dataset(spark, root_url, "obs/nope_*.nc", fetch=fetch)


def test_thredds_reader_entry(tmp_path):
    root_url, fetch, _ = _tree(tmp_path)
    cat = ThreddsCatalogReader(data=THREDDSCatalogData(url=root_url)).read(fetch=fetch)
    assert "obs" in list(cat)


# --- OpenDAP (DAP2) ---------------------------------------------------------


def test_opendap_dds_and_dods_fixture(spark):
    """DAP2 wire-format reader over an injectable fetch: DDS parse
    (atomic arrays + Grid ARRAY parts, MAPS skipped), server-side
    variable subsetting via the ?var constraint, XDR twin-count payload
    decode into chunk rows."""
    import struct as st

    import numpy as np

    from intake_spark.services import OpenDAPReader, OpenDAPService, parse_dds

    dds_text = (
        "Dataset {\n"
        "    Float64 temp[time = 4][lat = 3];\n"
        "    Grid {\n"
        "     ARRAY:\n"
        "        Int32 counts[time = 2];\n"
        "     MAPS:\n"
        "        Float64 time[time = 2];\n"
        "    } counts;\n"
        "} test%2Edata;\n"
    )
    parsed = parse_dds(dds_text)
    assert parsed["temp"] == {"type": "Float64", "dims": [("time", 4), ("lat", 3)]}
    assert parsed["counts"] == {"type": "Int32", "dims": [("time", 2)]}
    assert "time" not in parsed  # MAPS coordinate stays out of the var list

    # note .astype AFTER the arithmetic: `* 1.5` silently promotes to
    # native byte order, which is exactly the bug class XDR tests exist for
    temp = (np.arange(12).reshape(4, 3) * 1.5).astype(">f8")
    counts = np.array([7, 9], dtype=">i4")

    def fetch(url):
        if url.endswith(".dds"):
            return dds_text.encode()
        if url.endswith(".dods?temp"):
            return b"Dataset { x } y;\n" + b"Data:\n" + st.pack(">II", 12, 12) + temp.tobytes()
        if url.endswith(".dods?counts"):
            return b"Dataset { x } y;\n" + b"Data:\n" + st.pack(">II", 2, 2) + counts.tobytes()
        raise AssertionError(url)

    rdr = OpenDAPReader(data=OpenDAPService(url="https://dap.example/data"))
    df = rdr.read(spark=spark, variable="temp", fetch=fetch)
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    got = np.concatenate([np.asarray(r.values) for r in rows]).reshape(4, 3)
    np.testing.assert_array_equal(got, temp.astype("<f8"))
    assert rdr.data.metadata["variables"]["counts"]["type"] == "Int32"

    c = OpenDAPReader(data=OpenDAPService(url="https://dap.example/data")).read(
        spark=spark, variable="counts", fetch=fetch
    )
    assert [v for r in c.collect() for v in r.values] == [7.0, 9.0]

    import pytest as _pytest

    with _pytest.raises(KeyError, match="available"):
        OpenDAPReader(data=OpenDAPService(url="https://dap.example/data")).read(
            spark=spark, variable="nope", fetch=fetch
        )


def test_thredds_opendap_only_datasets(spark):
    """A catalog whose only data service is OPeNDAP now yields working
    entries: each dataset rehydrates as an OpenDAPReader on the DAP
    endpoint (this package ships its own DAP2 client)."""
    import struct as st

    import numpy as np

    from intake_spark.services import THREDDSCatalogData, thredds_catalog

    cat_url = "http://mock/dap/catalog.xml"
    xml = f"""<?xml version="1.0"?>
    <catalog {NS} name="daponly">
      <service name="odap" serviceType="OPeNDAP" base="http://mock/dodsC/"/>
      <dataset name="grid">
        <dataset name="sst" urlPath="sst"/>
      </dataset>
    </catalog>"""
    arr = (np.arange(6).reshape(2, 3) * 2.0).astype(">f8")
    dds = "Dataset {\n    Float64 sst[time = 2][lat = 3];\n} sst;\n"

    def fetch(url):
        if url == cat_url:
            return xml.encode()
        if url == "http://mock/dodsC/sst.dds":
            return dds.encode()
        if url == "http://mock/dodsC/sst.dods?sst":
            return b"x\nData:\n" + st.pack(">II", 6, 6) + arr.tobytes()
        raise AssertionError(url)

    cat = thredds_catalog(THREDDSCatalogData(url=cat_url), fetch=fetch)
    assert list(cat.aliases) == ["sst"]
    rdr = cat["sst"]
    assert type(rdr).__name__ == "OpenDAPReader"
    df = rdr.read(spark=spark, fetch=fetch)
    got = np.concatenate(
        [np.asarray(r.values) for r in sorted(df.collect(), key=lambda r: r.offset0)]
    ).reshape(2, 3)
    np.testing.assert_array_equal(got, arr.astype("<f8"))


def test_thredds_server_relative_dap_base(spark):
    """The stock TDS form — OPeNDAP service base '/thredds/dodsC/' — must
    resolve against the catalog's scheme+host, not become a local path."""
    from intake_spark.services import THREDDSCatalogData, thredds_catalog

    cat_xml = """<?xml version="1.0"?>
    <catalog xmlns="http://www.unidata.ucar.edu/namespaces/thredds/InvCatalog/v1.0">
      <service name="odap" serviceType="OPeNDAP" base="/thredds/dodsC/"/>
      <dataset name="sst" urlPath="sst"/>
    </catalog>"""

    def fetch(url):
        assert url == "http://server.example:8080/thredds/catalog.xml"
        return cat_xml.encode()

    cat = thredds_catalog(
        THREDDSCatalogData(url="http://server.example:8080/thredds/catalog.xml"),
        fetch=fetch,
    )
    rdr = cat["sst"]
    assert rdr.data.url == "http://server.example:8080/thredds/dodsC/sst"


def test_thredds_join_http_base_ignores_local_collision(tmp_path):
    """A root-relative href from an http(s) catalog must resolve against
    the catalog's host even when an identically-named LOCAL path exists —
    otherwise a server href like '/tmp/...' silently becomes a local file
    read."""
    from intake_spark.services import _thredds_join

    local = tmp_path / "collide"
    local.mkdir()
    href = str(local)  # exists on this machine
    got = _thredds_join("http://server.example:8080/thredds/catalog.xml", href)
    assert got == f"http://server.example:8080{href}"
    # local catalog: absolute local href stays local
    assert _thredds_join("/cat/catalog.xml", href) == href
    assert _thredds_join("file:///cat/catalog.xml", href) == href
