"""Tiled node→Catalog and search converters over a mocked JSON API —
no network, no tiled client (reference parity: TiledNodeToCatalog /
TiledSearch, convert.py:312-351)."""

from __future__ import annotations

import pytest

from intake_spark.services import (
    TiledCatalogReader,
    TiledReader,
    TiledService,
    _tiled_search_url,
    tiled_node_to_catalog,
    tiled_search,
)


def _fake_api(urls_seen: list):
    """A two-level fake Tiled server: root has a container and two tables;
    the container has one table inside."""

    def fetch(url: str) -> dict:
        urls_seen.append(url)
        if "/api/v1/search/runs" in url:
            return {
                "data": [
                    {
                        "id": "temperature",
                        "attributes": {"structure_family": "table", "metadata": {"units": "K"}},
                    }
                ]
            }
        return {
            "data": [
                {"id": "runs", "attributes": {"structure_family": "container", "metadata": {"n": 2}}},
                {"id": "summary", "attributes": {"structure_family": "table", "metadata": {}}},
                {"id": "events", "attributes": {"structure_family": "table", "metadata": {}}},
            ]
        }

    return fetch


def test_node_to_catalog_entries():
    seen: list = []
    svc = TiledService(url="http://tiled.example", path="")
    cat = tiled_node_to_catalog(svc, fetch=_fake_api(seen))
    assert set(cat.aliases) == {"runs", "summary", "events"}
    # dataset children rehydrate to TiledReader, containers to the
    # catalog-producing reader
    summary = cat["summary"]
    assert isinstance(summary, TiledReader)
    assert summary.data.path == "summary"
    runs = cat["runs"]
    assert isinstance(runs, TiledCatalogReader)
    # reading the container entry walks one level deeper (mock again —
    # rehydrated readers carry no fetch closure)
    sub = runs.read(fetch=_fake_api(seen))
    assert set(sub.aliases) == {"temperature"}
    temp = sub["temperature"]
    assert isinstance(temp, TiledReader)
    assert temp.data.path == "runs/temperature"


def test_search_composes_lazily_and_hits_url():
    seen: list = []
    svc = TiledService(url="http://tiled.example", path="bl531")
    narrowed = tiled_search(svc, fulltext="calibration")
    narrowed = tiled_search(narrowed, plan_name="scan")
    # lazy: nothing fetched yet
    assert seen == []
    assert narrowed.options["search"] == {"fulltext": "calibration", "plan_name": "scan"}
    tiled_node_to_catalog(narrowed, fetch=_fake_api(seen))
    assert len(seen) == 1
    url = seen[0]
    assert url.startswith("http://tiled.example/api/v1/search/bl531?")
    assert "filter%5Bfulltext%5D%5Bcondition%5D%5Btext%5D=calibration" in url
    assert "plan_name" in url and "%22scan%22" in url


def test_search_url_no_terms_is_plain():
    assert _tiled_search_url("http://x/", "a/b", {}) == "http://x/api/v1/search/a/b"
    assert _tiled_search_url("http://x", "", {}) == "http://x/api/v1/search"


def test_catalog_roundtrips_through_yaml(tmp_path):
    """Tiled entries survive catalog persistence (serializable payloads)."""
    from intake_spark.catalog import Catalog

    seen: list = []
    cat = tiled_node_to_catalog(
        TiledService(url="http://tiled.example", path=""), fetch=_fake_api(seen)
    )
    p = tmp_path / "tiled.yaml"
    cat.to_yaml_file(str(p))
    back = Catalog.from_yaml_file(str(p))
    assert set(back.aliases) == {"runs", "summary", "events"}
    assert isinstance(back["events"], TiledReader)
    assert back["events"].data.url == "http://tiled.example"
