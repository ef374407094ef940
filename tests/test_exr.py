"""OpenEXRReader vs spec-built scanline EXR fixtures: NONE/ZIPS/ZIP
compression (including the ImfZip predictor+interleave transform),
HALF/FLOAT channels, partial last block."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from intake_spark.sci import OpenEXR, OpenEXRReader, _exr_header


def _attr(name: str, atype: str, value: bytes) -> bytes:
    return name.encode() + b"\x00" + atype.encode() + b"\x00" + struct.pack("<i", len(value)) + value


def _chlist(channels: list[tuple[str, int]]) -> bytes:
    out = b""
    for name, ptype in sorted(channels):
        out += name.encode() + b"\x00" + struct.pack("<i", ptype)
        out += b"\x00" * 4 + struct.pack("<ii", 1, 1)
    return out + b"\x00"


def _preprocess(raw: bytes) -> bytes:
    n = len(raw)
    half = (n + 1) // 2
    t = bytearray(n)
    t[:half] = raw[0::2]
    t[half:] = raw[1::2]
    for i in range(n - 1, 0, -1):
        t[i] = (t[i] - t[i - 1] + 128) & 0xFF
    return bytes(t)


def _imfzip(raw: bytes) -> bytes:
    return zlib.compress(_preprocess(raw))


def _imfrle(raw: bytes) -> bytes:
    """Forward OpenEXR RLE over the preprocessed bytes (runs >= 3 use the
    repeat form; literals otherwise)."""
    data = _preprocess(raw)
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 127:
            run += 1
        if run >= 3:
            out += bytes([run - 1, data[i]])
            i += run
        else:
            j = i
            lit = bytearray()
            while j < n and len(lit) < 127 and not (
                j + 2 < n and data[j] == data[j + 1] == data[j + 2]
            ):
                lit.append(data[j])
                j += 1
            out += bytes([256 - len(lit)]) + lit
            i = j
    return bytes(out)


def make_exr(path, channels: dict[str, np.ndarray], compression: int = 0) -> str:
    """channels: {name: (H, W) array}; dtype f2 → HALF, f4 → FLOAT,
    u4 → UINT. All channels must share a shape."""
    names = sorted(channels)
    h, w = channels[names[0]].shape
    ptypes = {"<u4": 0, "uint32": 0, "float16": 1, "float32": 2}
    chl = [(n, ptypes[channels[n].dtype.name]) for n in names]
    hdr = b"\x76\x2f\x31\x01" + struct.pack("<I", 2)
    hdr += _attr("channels", "chlist", _chlist(chl))
    hdr += _attr("compression", "compression", bytes([compression]))
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr += _attr("dataWindow", "box2i", box)
    hdr += _attr("displayWindow", "box2i", box)
    hdr += _attr("lineOrder", "lineOrder", b"\x00")
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\x00"
    lpb = {0: 1, 1: 1, 2: 1, 3: 16}[compression]
    n_blocks = -(-h // lpb)
    table_off = len(hdr)
    blocks = []
    for b in range(n_blocks):
        y = b * lpb
        n_lines = min(lpb, h - y)
        raw = b""
        for line in range(n_lines):
            for n in names:
                raw += channels[n][y + line].tobytes()
        if compression in (1, 2, 3):
            comp = _imfrle(raw) if compression == 1 else _imfzip(raw)
            data = comp if len(comp) < len(raw) else raw
        else:
            data = raw
        blocks.append(struct.pack("<ii", y, len(data)) + data)
    offsets = []
    cur = table_off + 8 * n_blocks
    for blk in blocks:
        offsets.append(cur)
        cur += len(blk)
    out = hdr + b"".join(struct.pack("<Q", o) for o in offsets) + b"".join(blocks)
    path.write_bytes(out)
    return str(path)


def _collect(df):
    out = {}
    for r in df.collect():
        out[(r.y, r.channel)] = np.asarray(r.values)
    return out


@pytest.mark.parametrize("compression", [0, 1, 2, 3])
def test_exr_half_float_roundtrip(spark, tmp_path, compression):
    rng = np.random.default_rng(13)
    h, w = 20, 6  # ZIP (16 lines/block) gets a partial last block
    g = rng.standard_normal((h, w)).astype(np.float16)
    r = rng.standard_normal((h, w)).astype(np.float32)
    url = make_exr(tmp_path / f"c{compression}.exr", {"G": g, "R": r}, compression)
    rdr = OpenEXRReader(data=OpenEXR(url=url))
    df = rdr.read(spark=spark)
    got = _collect(df)
    assert len(got) == 2 * h
    for y in range(h):
        np.testing.assert_allclose(got[(y, "G")], g[y].astype(np.float64))
        np.testing.assert_allclose(got[(y, "R")], r[y].astype(np.float64))
    assert rdr.data.metadata["channels"] == ["G", "R"]
    assert rdr.data.metadata["width"] == w and rdr.data.metadata["height"] == h


def test_exr_uint_channel(spark, tmp_path):
    a = np.arange(12, dtype="<u4").reshape(3, 4) * 1000
    url = make_exr(tmp_path / "u.exr", {"ID": a})
    got = _collect(OpenEXRReader(data=OpenEXR(url=url)).read(spark=spark))
    for y in range(3):
        np.testing.assert_array_equal(got[(y, "ID")], a[y].astype(np.float64))


def test_exr_unsupported_rejected(tmp_path):
    a = np.zeros((2, 2), dtype=np.float16)
    url = make_exr(tmp_path / "p.exr", {"Y": a})
    blob = bytearray(open(url, "rb").read())
    idx = bytes(blob).find(b"compression\x00compression\x00") + len(b"compression\x00compression\x00") + 4
    blob[idx] = 4  # PIZ
    p = tmp_path / "piz.exr"
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="PIZ"):
        _exr_header(str(p))


def test_recommend_picks_exr(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_exr(tmp_path / "r.exr", {"Y": np.zeros((2, 2), dtype=np.float16)})
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("EXR" in k for k in kinds)
