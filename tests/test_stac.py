"""STAC catalog walk, search, and band stacking against a static on-disk
catalog tree whose assets are real spec-built TIFFs — child/item link
descent, bbox/datetime filtering, and the unionByName band stack all run
offline (the same injectable-fetch design as the THREDDS tests)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from intake_spark.services import (
    STACCatalogData,
    StacCatalogReader,
    stac_catalog,
    stac_search,
    stac_stack_bands,
)
from tests.test_tiff import make_tiff


def _tree(tmp_path):
    """catalog.json -> collection.json -> two items, each with red/nir
    TIFF assets (item2 outside the test bbox / datetime window)."""
    d = tmp_path / "stac"
    (d / "assets").mkdir(parents=True, exist_ok=True)
    red = np.arange(12, dtype=np.uint8).reshape(3, 4)
    nir = (np.arange(12, dtype=np.uint8) * 2).reshape(3, 4)
    for item in ("item1", "item2"):
        (d / "assets" / f"{item}_red.tif").write_bytes(make_tiff(red))
        (d / "assets" / f"{item}_nir.tif").write_bytes(make_tiff(nir))

    def item_doc(iid, bbox, dt):
        return {
            "type": "Feature",
            "id": iid,
            "collection": "imagery",
            "bbox": bbox,
            "properties": {"datetime": dt},
            "assets": {
                "red": {"href": f"assets/{iid}_red.tif", "type": "image/tiff"},
                "nir": {"href": f"assets/{iid}_nir.tif", "type": "image/tiff"},
                "meta": {"href": f"assets/{iid}.xyz"},  # no reader recommends
            },
            "links": [],
        }

    (d / "item1.json").write_text(
        json.dumps(item_doc("item1", [0.0, 0.0, 1.0, 1.0], "2024-06-01T00:00:00Z"))
    )
    (d / "item2.json").write_text(
        json.dumps(item_doc("item2", [50.0, 50.0, 51.0, 51.0], "2020-01-01T00:00:00Z"))
    )
    (d / "collection.json").write_text(
        json.dumps(
            {
                "type": "Collection",
                "id": "imagery",
                "links": [
                    {"rel": "item", "href": "item1.json"},
                    {"rel": "item", "href": "item2.json"},
                ],
            }
        )
    )
    (d / "catalog.json").write_text(
        json.dumps(
            {
                "type": "Catalog",
                "id": "root",
                "links": [
                    {"rel": "child", "href": "collection.json", "title": "imagery"}
                ],
            }
        )
    )
    return d


def test_stac_catalog_walk_and_asset_read(spark, tmp_path):
    d = _tree(tmp_path)
    cat = stac_catalog(STACCatalogData(url=str(d / "catalog.json")))
    assert cat.metadata["stac_id"] == "root"
    sub = cat["imagery"]
    assert isinstance(sub, StacCatalogReader)
    subcat = sub.read()
    names = sorted(subcat)
    assert "item1/red" in names and "item2/nir" in names
    assert not any(n.endswith("/meta") for n in names)  # unreadable asset skipped
    df = subcat["item1/red"].read(spark=spark)
    rows = df.collect()
    assert len(rows) >= 1  # chunk-row frame from the TIFF reader


def test_stac_search_filters(spark, tmp_path):
    d = _tree(tmp_path)
    url = str(d / "catalog.json")
    allr = stac_search(spark, url).collect()
    assert {r.item_id for r in allr} == {"item1", "item2"}
    assert all(r.media_type == "image/tiff" for r in allr if r.asset_key != "meta")
    got = stac_search(spark, url, bbox=(0.5, 0.5, 2.0, 2.0)).collect()
    assert {r.item_id for r in got} == {"item1"}
    got = stac_search(
        spark, url, datetime_range=("2023-01-01", "2025-01-01")
    ).collect()
    assert {r.item_id for r in got} == {"item1"}
    got = stac_search(spark, url, bbox=(80.0, 80.0, 90.0, 90.0)).collect()
    assert got == []


def test_stac_stack_bands_union(spark, tmp_path):
    d = _tree(tmp_path)
    out = stac_stack_bands(spark, str(d / "item1.json"), bands=["red", "nir"])
    rows = out.collect()
    assert {r.band for r in rows} == {"red", "nir"}
    assert {r.item_id for r in rows} == {"item1"}
    with pytest.raises(ValueError, match="no assets matched"):
        stac_stack_bands(spark, str(d / "item1.json"), bands=["swir"])


def test_stac_index_registry(tmp_path):
    """stacindex.org registry → Catalog: private entries dropped, API
    entries rehydrate as StacSearchReader, static ones as
    StacCatalogReader, registry metadata carried through."""
    from intake_spark.services import STACIndexData, STACIndexReader

    listing = [
        {"slug": "pub-api", "url": "https://api.example/stac", "isPrivate": False,
         "isApi": True, "title": "A public API", "summary": "searchable",
         "created": "2020-01-01", "updated": "2024-01-01"},
        {"slug": "pub-static", "url": "https://static.example/catalog.json",
         "isPrivate": False, "isApi": False, "title": "Static cat",
         "summary": "walkable", "created": "2019-01-01", "updated": "2023-01-01"},
        {"slug": "secret", "url": "https://x", "isPrivate": True, "isApi": True},
    ]
    p = tmp_path / "index.json"
    p.write_text(json.dumps(listing))
    cat = STACIndexReader(data=STACIndexData(url=str(p))).read()
    assert set(cat.aliases) == {"pub-api", "pub-static"}
    api = cat["pub-api"]
    static = cat["pub-static"]
    assert type(api).__name__ == "StacSearchReader"
    assert type(static).__name__ == "StacCatalogReader"
    assert api.data.metadata["title"] == "A public API"
    assert static.data.url.endswith("catalog.json")


def test_stac_search_reader_wraps_search(spark, tmp_path):
    """StacSearchReader ≡ stac_search as a catalogable reader entry."""
    from intake_spark.services import StacSearchReader

    root = _tree(tmp_path)
    df = StacSearchReader(
        data=STACCatalogData(url=str(root / "catalog.json")),
        bbox=(0.0, 0.0, 10.0, 10.0),
    ).read(spark=spark)
    rows = df.collect()
    assert {r.item_id for r in rows} == {"item1"}


def test_earthdata_cmr_catalog_and_granules(tmp_path):
    """Mocked-CMR discovery (reference catalogs.py:666-731 shape):
    collection search → per-concept EarthdataReader entries; a reader
    lists granules and rehydrates an engine reader per download URL."""
    from intake_spark.services import (
        EarthdataCMR,
        EarthdataCatalogReader,
    )

    collections = {"feed": {"entry": [
        {"id": "C100-PROV", "title": "Precip L3", "summary": "daily precip",
         "time_start": "2002-01-01T00:00:00Z", "archive_center": "GES_DISC"},
        {"id": "C200-PROV", "title": "SST L4", "summary": "sea surface temp"},
    ]}}
    granules = {"feed": {"entry": [
        {"id": "G1-PROV", "title": "day one", "granule_size": "3.5",
         "links": [
             {"rel": "http://esipfed.org/ns/fedsearch/1.1/metadata#",
              "href": "https://x/meta.xml"},
             {"rel": "http://esipfed.org/ns/fedsearch/1.1/data#",
              "href": "https://data.example/prec_2002_01_01.nc"},
         ]},
        {"id": "G2-PROV", "title": "no data link", "links": []},
    ]}}

    calls = []

    def fetch(url):
        calls.append(url)
        if "/search/collections.json" in url:
            return collections
        if "/search/granules.json" in url:
            return granules
        raise AssertionError(url)

    cat = EarthdataCatalogReader(data=EarthdataCMR(url="https://cmr.example")).read(
        temporal=("2002-01-01", "2002-01-02"), fetch=fetch
    )
    assert set(cat.aliases) == {"C100-PROV", "C200-PROV"}
    assert "temporal=2002-01-01%2C2002-01-02" in calls[0]

    rdr = cat["C100-PROV"]
    assert type(rdr).__name__ == "EarthdataReader"
    assert rdr.data.metadata["archive_center"] == "GES_DISC"
    gcat = rdr.read(fetch=fetch)
    # granule with a data link resolves to the NetCDF reader; linkless one dropped
    assert set(gcat.aliases) == {"G1-PROV"}
    g = gcat["G1-PROV"]
    assert g.data.url.endswith(".nc")
    assert g.data.metadata["size_mb"] == 3.5
    assert "concept_id=C100-PROV" in calls[-1]
