"""LASReader vs spec-built ASPRS LAS fixtures: point formats 0-3, scale/
offset application, 1.4 64-bit counts, oversize vendor records, LAZ
rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.sci import LAS, LASReader, _las_header


def make_las(
    path,
    points: list[dict],
    fmt: int = 0,
    scales=(0.01, 0.01, 0.001),
    offsets=(1000.0, 2000.0, 0.0),
    minor: int = 2,
    extra_bytes: int = 0,
) -> str:
    core = 20 + (8 if fmt in (1, 3) else 0) + (6 if fmt in (2, 3) else 0)
    rec_len = core + extra_bytes
    hsize = 375 if minor >= 4 else 227
    recs = b""
    for p in points:
        r = struct.pack(
            "<3iHBBbBH",
            p["X"], p["Y"], p["Z"], p.get("intensity", 0), 0,
            p.get("classification", 0), 0, 0, p.get("psid", 0),
        )
        if fmt in (1, 3):
            r += struct.pack("<d", p.get("gps_time", 0.0))
        if fmt in (2, 3):
            r += struct.pack("<3H", *p.get("rgb", (0, 0, 0)))
        recs += r + b"\xee" * extra_bytes
    hdr = bytearray(hsize)
    hdr[0:4] = b"LASF"
    hdr[24], hdr[25] = 1, minor
    struct.pack_into("<H", hdr, 94, hsize)
    struct.pack_into("<I", hdr, 96, hsize)
    hdr[104] = fmt
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, 0 if minor >= 4 else len(points))
    struct.pack_into("<3d", hdr, 131, *scales)
    struct.pack_into("<3d", hdr, 155, *offsets)
    if minor >= 4:
        struct.pack_into("<Q", hdr, 247, len(points))
    path.write_bytes(bytes(hdr) + recs)
    return str(path)


def test_las_fmt0_scaling(spark, tmp_path):
    pts = [
        {"X": 100, "Y": -200, "Z": 5000, "intensity": 77, "classification": 2, "psid": 9},
        {"X": 0, "Y": 0, "Z": 0},
    ]
    url = make_las(tmp_path / "a.las", pts)
    rdr = LASReader(data=LAS(url=url))
    rows = sorted(rdr.read(spark=spark).collect(), key=lambda r: -r.x)
    assert abs(rows[0].x - 1001.0) < 1e-9
    assert abs(rows[0].y - 1998.0) < 1e-9
    assert abs(rows[0].z - 5.0) < 1e-9
    assert rows[0].intensity == 77 and rows[0].classification == 2
    assert rows[1].x == 1000.0 and rows[1].y == 2000.0
    assert rdr.data.metadata["n_points"] == 2


def test_las_fmt3_gps_rgb_and_14_header(spark, tmp_path):
    pts = [{"X": i, "Y": i, "Z": i, "gps_time": 1e9 + i, "rgb": (i, 2 * i, 3 * i)} for i in range(30)]
    url = make_las(tmp_path / "c.las", pts, fmt=3, minor=4)
    df = LASReader(data=LAS(url=url)).read(spark=spark, points_per_task=7)
    rows = sorted(df.collect(), key=lambda r: r.gps_time)
    assert len(rows) == 30
    assert rows[5].red == 5 and rows[5].green == 10 and rows[5].blue == 15
    assert abs(rows[29].gps_time - (1e9 + 29)) < 1e-6


def test_las_vendor_extra_bytes(spark, tmp_path):
    """rec_len larger than the format core (vendor extensions) must not
    shift subsequent records."""
    pts = [{"X": i * 10, "Y": 0, "Z": 0} for i in range(5)]
    url = make_las(tmp_path / "e.las", pts, extra_bytes=7)
    rows = sorted(LASReader(data=LAS(url=url)).read(spark=spark).collect(), key=lambda r: r.x)
    assert [round((r.x - 1000.0) / 0.01) for r in rows] == [0, 10, 20, 30, 40]


def test_las_laz_rejected(tmp_path):
    url = make_las(tmp_path / "z.las", [{"X": 0, "Y": 0, "Z": 0}])
    blob = bytearray(open(url, "rb").read())
    blob[104] |= 0x80  # compressed-format flag
    p = tmp_path / "z.laz.las"
    p.write_bytes(bytes(blob))
    import io

    with pytest.raises(ValueError, match="LAZ"):
        _las_header(io.BytesIO(bytes(blob)))


def test_recommend_picks_las(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_las(tmp_path / "r.las", [{"X": 0, "Y": 0, "Z": 0}])
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any(k == "LAS" or "LAS" in k for k in kinds)
