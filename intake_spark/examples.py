"""Example datasets: ready-made catalog entries over public data.

Parity with the reference's examples surface (intake/readers/examples.py:5,76
— ``ms_building_parquet`` / ``ms_delta_buildings``, both STAC entries on the
Microsoft Planetary Computer). The entries here rehydrate to STAC catalog
readers over public APIs; building the entry is pure metadata (offline), the
``.read()`` walk needs network and is therefore gated in offline containers —
the same split the reference has (its examples import ``planetary_computer``
and hit the API only on read).
"""

from __future__ import annotations


def examples_catalog():
    """Catalog of example entries over public endpoints.

    - ``planetary_computer_stac`` — the Microsoft Planetary Computer STAC
      API root (the catalog the reference's two examples search; walking one
      level lists its collections as sub-catalogs).
    - ``earth_search_stac`` — Element 84's Earth Search STAC API over the
      AWS open-data Sentinel/Landsat archives.
    """
    from intake_spark.catalog import Catalog
    from intake_spark.services import STACCatalogData, StacCatalogReader

    cat = Catalog(metadata={"description": "intake_spark example datasets"})
    cat.add_entry(
        StacCatalogReader(
            data=STACCatalogData(
                url="https://planetarycomputer.microsoft.com/api/stac/v1",
                metadata={"requires_network": True},
            )
        ),
        name="planetary_computer_stac",
    )
    cat.add_entry(
        StacCatalogReader(
            data=STACCatalogData(
                url="https://earth-search.aws.element84.com/v1",
                metadata={"requires_network": True},
            )
        ),
        name="earth_search_stac",
    )
    return cat
