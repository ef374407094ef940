"""GRIB2Reader vs hand-assembled WMO FM 92 edition-2 messages (cfgrib
absent): indicator scan, sections 1-8, simple packing with binary/decimal
scale factors, 8-bit/12-bit/constant fields, multi-message files."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.sci import GRIB2, GRIB2Reader, _grib_decode_message


def _sec1(ref=(2026, 8, 13, 12, 0, 0)) -> bytes:
    return (
        struct.pack(">IB", 21, 1)
        + struct.pack(">HHBBB", 7, 0, 2, 1, 1)
        + struct.pack(">HBBBBB", *ref)
        + bytes([0, 1])
    )


def _sec3(ni: int, nj: int, la1=40_000_000, lo1=250_000_000) -> bytes:
    return (
        struct.pack(">IBB", 72, 3, 0)
        + struct.pack(">I", ni * nj)
        + bytes([0, 0])
        + struct.pack(">H", 0)  # template 3.0
        + bytes(16)  # shape-of-earth octets
        + struct.pack(">II", ni, nj)
        + struct.pack(">II", 0, 0)
        + struct.pack(">ii", la1, lo1)
        + bytes([48])
        + struct.pack(">ii", 0, 0)
        + struct.pack(">II", 1_000_000, 1_000_000)
        + bytes([0])
    )


def _sec4(category: int, parameter: int) -> bytes:
    return (
        struct.pack(">IB", 34, 4)
        + struct.pack(">HH", 0, 0)
        + bytes([category, parameter])
        + bytes(34 - 11)
    )


def _pack_bits(xs: list[int], nbits: int) -> bytes:
    bits = []
    for x in xs:
        bits.extend((x >> (nbits - 1 - i)) & 1 for i in range(nbits))
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - i) for i, b in enumerate(bits[k : k + 8]))
        for k in range(0, len(bits), 8)
    )


def _field(values: np.ndarray, e: int = 0, d: int = 0, nbits: int = 8) -> bytes:
    """sections 5+6+7 for simple packing: value = (R + X*2^e)/10^d."""
    scaled = values * (10.0 ** d)
    r = float(scaled.min())
    xs = [int(round((v - r) / (2.0 ** e))) for v in scaled.ravel()]
    sec5 = (
        struct.pack(">IB", 21, 5)
        + struct.pack(">I", values.size)
        + struct.pack(">H", 0)  # template 5.0
        + struct.pack(">f", r)
        + struct.pack(">HH", e if e >= 0 else (0x8000 | -e), d if d >= 0 else (0x8000 | -d))
        + bytes([nbits, 0])
    )
    sec6 = struct.pack(">IB", 6, 6) + bytes([255])
    data = _pack_bits(xs, nbits) if nbits else b""
    sec7 = struct.pack(">IB", 5 + len(data), 7) + data
    return sec5 + sec6 + sec7


def make_grib2(path, grids: list[tuple[int, int, np.ndarray, dict]]) -> str:
    """One message per (category, parameter, 2-D values, field-kwargs)."""
    out = b""
    for cat, par, vals, kw in grids:
        nj, ni = vals.shape
        body = _sec1() + _sec3(ni, nj) + _sec4(cat, par) + _field(vals, **kw) + b"7777"
        out += b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    path.write_bytes(out)
    return str(path)


def test_grib2_simple_packing_variants(spark, tmp_path):
    t2m = np.array([[250.0, 251.5], [252.0, 255.5], [260.0, 261.5]])  # 3x2
    wind = np.arange(12, dtype=float).reshape(2, 6) * 0.25  # needs D scaling
    const = np.full((2, 2), 101325.0)
    url = make_grib2(
        tmp_path / "f.grib2",
        [
            (0, 0, t2m, {"e": 1, "nbits": 8}),     # binary scale 2^1
            (2, 2, wind, {"d": 2, "nbits": 12}),   # decimal scale 10^2
            (3, 0, const, {"nbits": 0}),           # constant field
        ],
    )
    rdr = GRIB2Reader(data=GRIB2(url=url))
    rows = {(r.category, r.parameter): r for r in rdr.read(spark=spark).collect()}
    assert len(rows) == 3
    r = rows[(0, 0)]
    assert (r.ni, r.nj) == (2, 3) and r.ref_time == "2026-08-13T12:00:00"
    assert abs(r.lat0 - 40.0) < 1e-9 and abs(r.lon0 - 250.0) < 1e-9
    np.testing.assert_allclose(np.array(r.values).reshape(3, 2), t2m, atol=1.0)
    np.testing.assert_allclose(
        np.array(rows[(2, 2)].values).reshape(2, 6), wind, atol=0.01
    )
    np.testing.assert_allclose(np.array(rows[(3, 0)].values), 101325.0)


def test_grib2_exact_when_lossless():
    """Integer-valued field with e=0,d=0 decodes bit-exact."""
    vals = np.array([[0.0, 1.0, 5.0], [7.0, 3.0, 255.0]])
    body = _sec1() + _sec3(3, 2) + _sec4(0, 0) + _field(vals, nbits=8) + b"7777"
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    (fld,) = _grib_decode_message(msg)
    np.testing.assert_array_equal(fld["values"].reshape(2, 3), vals)


def test_grib2_unsupported_templates_rejected(tmp_path):
    vals = np.zeros((1, 2))
    url = make_grib2(tmp_path / "b.grib2", [(0, 0, vals, {"nbits": 8})])
    blob = bytearray(open(url, "rb").read())
    # corrupt the grid template number (octets 13-14 of section 3)
    s3_off = 16 + 21
    struct.pack_into(">H", blob, s3_off + 12, 30)  # Lambert conformal
    with pytest.raises(ValueError, match="3.30"):
        _grib_decode_message(bytes(blob))
    with pytest.raises(ValueError, match="edition"):
        from intake_spark.sci import _grib_messages

        p = tmp_path / "ed1.grib"
        p.write_bytes(b"GRIB\x00\x00\x00\x01" + bytes(8))
        _grib_messages(str(p))


def test_recommend_picks_grib2(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_grib2(tmp_path / "r.grib2", [(0, 0, np.zeros((1, 2)), {"nbits": 8})])
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("GRIB2" in k for k in kinds)
