"""JPEG 2000 irreversible (9/7) path, quantized QCD, multi-tile, and
subsampled components — the gates round 7 left named.

The 9/7 lifting is verified against the ITU-T T.800 Table F.4
CONVOLUTION taps, an independent derivation of the same filter: a
mirrored encoder/decoder misreading of the lifting constants or the
K-scaling placement cannot pass that test. Everything else round-trips
through the repo encoder with error bounds that follow from the
quantizer step.

Reference surface: intake delegates J2K to PIL/glymur (reference
readers.py:2228); this repo decodes natively.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.llm.jpeg2000 import (
    _fwd_axis,
    _inv_axis,
    decode_jpeg2000,
    dwt_forward_boxed,
    dwt_inverse_boxed,
    encode_jpeg2000,
)

# T.800 Table F.4 irreversible analysis filter taps (published constants,
# independent of the lifting implementation under test)
_H_LOW = np.array([
    0.026748757411, -0.016864118443, -0.078223266529, 0.266864118443,
    0.602949018236, 0.266864118443, -0.078223266529, -0.016864118443,
    0.026748757411,
])  # offsets -4..4 around an even sample
_G_HIGH = np.array([
    0.091271763114, -0.057543526229, -0.591271763114, 1.115087052457,
    -0.591271763114, -0.057543526229, 0.091271763114,
])  # offsets -3..3 around an odd sample


def test_97_lifting_matches_table_f4_convolution_taps():
    """Impulse responses of the lifting implementation equal the Table
    F.4 analysis taps — including the 1/K (low) vs K (high) scaling."""
    n = 33
    for shift in range(-4, 5):
        x = np.zeros(n)
        x[16 + shift] = 1.0
        L, _H = _fwd_axis(x[None, :], 0, True, axis=1)
        assert abs(L[0, 8] - _H_LOW[shift + 4]) < 1e-9
    for shift in range(-3, 4):
        x = np.zeros(n)
        x[17 + shift] = 1.0
        _L, H = _fwd_axis(x[None, :], 0, True, axis=1)
        assert abs(H[0, 8] - _G_HIGH[shift + 3]) < 1e-9


def test_97_dwt_reconstructs_and_respects_parity():
    rng = np.random.default_rng(0)
    for box0 in [(0, 0), (1, 0), (0, 1), (5, 3)]:
        for shape in [(8, 8), (13, 9), (1, 6), (4, 17)]:
            x0, y0 = box0
            box = (x0, y0, x0 + shape[1], y0 + shape[0])
            a = rng.normal(size=shape) * 100
            for lv in (1, 2, 3):
                ll, bands = dwt_forward_boxed(a, box, lv, True)
                back = dwt_inverse_boxed(ll, bands, box, True)
                assert np.abs(back - a).max() < 1e-8


def test_97_single_sample_axes_parity_rule():
    """Length-1 signals follow the T.800 degenerate parity rule for
    BOTH filters: even start → identity, odd start → ×2 (analysis) / /2
    (synthesis) — NO K scaling (review finding r8: K here would
    mis-scale 1-sample tile strips of third-party codestreams)."""
    a = np.array([[3.5]])
    L, H = _fwd_axis(a, 0, True, axis=1)
    assert L[0, 0] == 3.5 and H.shape[-1] == 0  # identity, not /K
    assert _inv_axis(L, H, 0, True, axis=1)[0, 0] == 3.5
    L, H = _fwd_axis(a, 1, True, axis=1)
    assert H[0, 0] == 7.0 and L.shape[-1] == 0  # x2, not xK
    assert _inv_axis(L, H, 1, True, axis=1)[0, 0] == 3.5


def test_irreversible_roundtrip_gray_and_quant_step():
    """quant_shift=0 → unit step: reconstruction within the midpoint
    dequantization error; a coarser step degrades gracefully."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 29), dtype=np.uint8)
    blob = encode_jpeg2000(img, levels=3, irreversible=True)
    back = decode_jpeg2000(blob)
    assert back.shape == img.shape and back.dtype == np.uint8
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 3
    coarse = decode_jpeg2000(
        encode_jpeg2000(img, levels=3, irreversible=True, quant_shift=3)
    )
    err = np.abs(coarse.astype(int) - img.astype(int))
    assert err.mean() < 8  # lossy but sane

    # the codestream really is 9/7: COD transform byte is 0
    cod = blob.find(b"\xff\x52")
    assert blob[cod + 4 + 9] == 0


def test_irreversible_derived_qcd_roundtrip():
    """Sqcd=1 (scalar derived): one (exponent, mantissa) pair, per-band
    steps derived with the E.1.1 exponent ladder."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_jpeg2000(img, levels=2, irreversible=True, qcd_style="derived")
    qcd = blob.find(b"\xff\x5c")
    (ln,) = struct.unpack_from(">H", blob, qcd + 2)
    assert ln == 5 and blob[qcd + 4] & 0x1F == 1  # single pair, style 1
    back = decode_jpeg2000(blob)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 8


def test_irreversible_color_uses_ict():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (24, 19, 3), dtype=np.uint8)
    back = decode_jpeg2000(encode_jpeg2000(rgb, levels=2, irreversible=True))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 6


def test_multitile_reversible_exact():
    """Tiles smaller than the image, edge tiles partial, tile origins at
    ODD coordinates (tw=7) so the DWT interleave parity and the
    mid-grid code-block anchoring are both exercised. Bit-exact."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    for tile, lv, cbe in [((7, 5), 2, 2), ((16, 16), 3, 6), ((8, 23), 1, 4)]:
        blob = encode_jpeg2000(img, levels=lv, cb_exp=cbe, tile_size=tile)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img,
                                      err_msg=f"tile={tile}")
    # multi-tile RGB with RCT
    rgb = rng.integers(0, 256, (17, 21, 3), dtype=np.uint8)
    blob = encode_jpeg2000(rgb, levels=2, tile_size=(9, 9))
    np.testing.assert_array_equal(decode_jpeg2000(blob), rgb)
    # 16-bit multi-tile
    deep = rng.integers(0, 65536, (12, 15)).astype(np.int64)
    blob = encode_jpeg2000(deep, levels=1, tile_size=(5, 12))
    np.testing.assert_array_equal(decode_jpeg2000(blob).astype(np.int64), deep)


def test_multitile_irreversible():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 26), dtype=np.uint8)
    blob = encode_jpeg2000(img, levels=2, irreversible=True, tile_size=(11, 7))
    back = decode_jpeg2000(blob)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 3


def test_multiple_tile_parts_single_tile():
    """Split one tile's packet stream across two tile-parts (TPsot 0/1)
    by marker surgery: the SOT walk must reassemble them in order."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_jpeg2000(img, levels=1)
    sot = blob.find(b"\xff\x90")
    sod = blob.find(b"\xff\x93", sot)
    payload = blob[sod + 2 : -2]
    cut = len(payload) // 2
    part = lambda tp, tn, data: (  # noqa: E731
        b"\xff\x90" + struct.pack(">HHIBB", 10, 0, 12 + 2 + len(data), tp, tn)
        + b"\xff\x93" + data
    )
    spliced = (
        blob[:sot]
        + part(0, 2, payload[:cut])
        + part(1, 2, payload[cut:])
        + b"\xff\xd9"
    )
    np.testing.assert_array_equal(decode_jpeg2000(spliced), img)
    # out-of-order tile-parts in the stream still assemble by TPsot
    swapped = (
        blob[:sot]
        + part(1, 2, payload[cut:])
        + part(0, 2, payload[:cut])
        + b"\xff\xd9"
    )
    np.testing.assert_array_equal(decode_jpeg2000(swapped), img)


def test_multiple_tile_parts_across_tiles():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (14, 18), dtype=np.uint8)
    blob = encode_jpeg2000(img, levels=1, tile_size=(10, 14))
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_subsampled_components_420_and_422():
    """XRsiz/YRsiz > 1: per-component geometry and the nearest-upsample
    policy (each output pixel takes its covering low-res sample)."""
    rng = np.random.default_rng(8)
    H, W = 21, 26
    y = rng.integers(0, 256, (H, W)).astype(np.int64)
    cb = rng.integers(0, 256, (-(-H // 2), -(-W // 2))).astype(np.int64)
    cr = rng.integers(0, 256, (-(-H // 2), -(-W // 2))).astype(np.int64)
    blob = encode_jpeg2000(
        [y, cb, cr], levels=2, subsampling=[(1, 1), (2, 2), (2, 2)]
    )
    out = decode_jpeg2000(blob)
    assert out.shape == (H, W, 3)
    np.testing.assert_array_equal(out[:, :, 0], y)
    rows, cols = np.arange(H) // 2, np.arange(W) // 2
    np.testing.assert_array_equal(out[:, :, 1], cb[np.ix_(rows, cols)])
    np.testing.assert_array_equal(out[:, :, 2], cr[np.ix_(rows, cols)])
    # 4:2:2 (horizontal only) + tiles
    cb2 = rng.integers(0, 256, (H, -(-W // 2))).astype(np.int64)
    cr2 = rng.integers(0, 256, (H, -(-W // 2))).astype(np.int64)
    blob = encode_jpeg2000(
        [y, cb2, cr2], levels=1, subsampling=[(1, 1), (2, 1), (2, 1)],
        tile_size=(13, 11),
    )
    out = decode_jpeg2000(blob)
    np.testing.assert_array_equal(out[:, :, 0], y)
    np.testing.assert_array_equal(out[:, :, 1], cb2[:, cols])

    # image_meta width/height are the full grid regardless of subsampling
    from intake_spark.llm.multimodal import image_meta

    m = image_meta(blob)
    assert (m["width"], m["height"]) == (W, H)


def test_subsampling_shape_validation():
    y = np.zeros((10, 10), dtype=np.int64)
    c = np.zeros((5, 6), dtype=np.int64)  # wrong: should be 5x5
    with pytest.raises(ValueError, match="does not match its subsampling"):
        encode_jpeg2000([y, c, c], subsampling=[(1, 1), (2, 2), (2, 2)])
    with pytest.raises(ValueError, match="full resolution"):
        encode_jpeg2000([c, c], subsampling=[(2, 2), (2, 2)])


def test_dicom_j2k_lossy_91_end_to_end(spark, tmp_path):
    """DICOM 1.2.840.10008.1.2.4.91 with a genuinely IRREVERSIBLE (9/7 +
    quantized QCD) frame — the gate that blocked lossy DICOM J2K."""
    from intake_spark.sci import DICOM, DicomReader
    from tests.test_nrrd_dicom import _encapsulate, _rebuild

    rng = np.random.default_rng(9)
    px = rng.integers(0, 4096, size=(19, 23)).astype(np.uint16)
    frame = encode_jpeg2000(px.astype(np.int64), levels=2, irreversible=True)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.91\x00", 19, 23, [frame], bits=16, signed=False
    )
    p = tmp_path / "j2k91_lossy.dcm"
    p.write_bytes(blob)
    got = _rebuild(DicomReader(data=DICOM(url=str(p))).read(spark=spark))
    assert got.shape == (19, 23)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 3


def test_decode_image_routes_lossy_j2k_natively():
    from intake_spark.llm.multimodal import decode_image

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    arr = decode_image(encode_jpeg2000(img, levels=1, irreversible=True))
    assert arr.shape == (9, 11, 1)
    assert np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_grid_offset_parity():
    """Non-zero SIZ XOsiz/YOsiz: odd origins flip the DWT interleave
    parity for the whole image — bit-exact reversible round-trip, and
    image_meta reports the T.800 A.5.1 extent (not the grid size)."""
    from intake_spark.llm.multimodal import image_meta

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (14, 11), dtype=np.uint8)
    for off in [(1, 0), (0, 1), (3, 5), (2, 2)]:
        blob = encode_jpeg2000(img, levels=2, grid_offset=off)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img,
                                      err_msg=f"offset {off}")
        m = image_meta(blob)
        assert (m["width"], m["height"]) == (11, 14)
    # offset + tiles (tile grid stays anchored at 0, so the first tile
    # row/column is clipped by the image origin)
    blob = encode_jpeg2000(img, levels=1, grid_offset=(3, 1), tile_size=(8, 8))
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # offset + irreversible
    blob = encode_jpeg2000(img, levels=2, grid_offset=(1, 3), irreversible=True)
    back = decode_jpeg2000(blob)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 3


def test_tile_size_must_reach_grid_offset():
    """T.800 A.5.1: the first tile must overlap the image region; a tile
    grid anchored at 0 with tile_size <= grid_offset would emit
    zero-area leading tiles that conformant decoders may reject (review
    finding r8) — the encoder refuses."""
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="does not reach grid_offset"):
        encode_jpeg2000(img, tile_size=(4, 4), grid_offset=(7, 5))
    # equal-or-larger tile is fine
    decode_jpeg2000(encode_jpeg2000(img, tile_size=(8, 8), grid_offset=(7, 5)))
