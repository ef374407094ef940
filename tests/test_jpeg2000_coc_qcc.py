"""JPEG 2000 per-component overrides + ROI + progression changes
(round 9): COC (coding style per component), QCC (quantization per
component), RGN (implicit MAXSHIFT ROI), POC (progression order
changes). With these the decoder's named gates reduce to HTJ2K; the
markers are what per-component medical/remote-sensing encoders emit.
Reference surface: the reference opens .jp2 via pillow/glymur
(/root/reference/intake/readers/readers.py:2228)."""

import numpy as np
import pytest

from intake_spark.llm.jpeg2000 import (
    CBSTY_BYPASS,
    CBSTY_SEGSYM,
    decode_jpeg2000,
    encode_jpeg2000,
)


def _img(h, w, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_coc_per_component_levels_and_blocks():
    """COC overrides decomposition levels and code-block size for one
    component; the others ride the COD defaults. Lossless."""
    img = _img(50, 66, 3, seed=1)
    blob = encode_jpeg2000(
        img, levels=3, cb_exp=5,
        per_comp={1: {"levels": 1, "cb_exp": 3},
                  2: {"levels": 0}},
    )
    assert blob.count(b"\xff\x53") == 2  # two COC segments
    assert blob.count(b"\xff\x5d") == 2  # with their QCC overrides
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_coc_per_component_styles_and_precincts():
    img = _img(40, 56, 3, seed=2)
    blob = encode_jpeg2000(
        img, levels=2, layers=2,
        per_comp={0: {"precincts": (4, 4)},
                  2: {"cb_style": CBSTY_BYPASS | CBSTY_SEGSYM}},
    )
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # per-component precincts + global precincts together
    blob = encode_jpeg2000(
        img, levels=2, precincts=(5, 5),
        per_comp={1: {"precincts": (4, 6)}},
    )
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_coc_mixed_transforms():
    """5/3 on two components, 9/7 on the third (mct off): the 5/3
    planes stay bit-exact while the 9/7 plane is a close approximation
    — per-component QCC carries the differing quantization styles."""
    img = _img(50, 66, 3, seed=3)
    blob = encode_jpeg2000(img, levels=2, mct=False,
                           per_comp={2: {"irreversible": True}})
    out = decode_jpeg2000(blob)
    np.testing.assert_array_equal(out[:, :, :2], img[:, :, :2])
    err = np.abs(out[:, :, 2].astype(int) - img[:, :, 2].astype(int))
    assert 0 < float(err.mean()) < 3.0
    with pytest.raises(ValueError, match="MCT"):
        encode_jpeg2000(img, mct=True,
                        per_comp={2: {"irreversible": True}})


def test_coc_with_tiles_and_subsampling():
    img = _img(48, 64, 3, seed=4)
    blob = encode_jpeg2000(img, levels=2, tile_size=(32, 32),
                           per_comp={1: {"levels": 1, "cb_exp": 3}},
                           layers=3)
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    h, w = img.shape[:2]
    planes = [img[:, :, 0], img[: h // 2, : w // 2, 1]]
    blob = encode_jpeg2000(planes, subsampling=[(1, 1), (2, 2)],
                           per_comp={1: {"levels": 1}})
    out = decode_jpeg2000(blob)
    np.testing.assert_array_equal(out[:, :, 0], img[:, :, 0])


def test_rgn_implicit_maxshift_roundtrip():
    """RGN (Srgn=0): ROI coefficients travel up-shifted; the decoder
    re-scales magnitudes at/above 2^shift. Bit-exact on 5/3."""
    gray = _img(40, 40, seed=5)
    blob = encode_jpeg2000(gray, levels=2, rgn={0: 14})
    assert b"\xff\x5e" in blob
    np.testing.assert_array_equal(decode_jpeg2000(blob), gray)
    # multi-component: ROI on one plane only
    img = _img(30, 30, 3, seed=6)
    blob = encode_jpeg2000(img, levels=1, rgn={1: 14})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # too-small shift is rejected loudly, not encoded wrong
    with pytest.raises(ValueError, match="rgn shift"):
        encode_jpeg2000(gray, levels=2, rgn={0: 1})


def test_rgn_nonzero_style_is_gated():
    import struct

    gray = _img(16, 16, seed=7)
    blob = encode_jpeg2000(gray, levels=1, rgn={0: 14})
    i = blob.find(b"\xff\x5e")
    bad = bytearray(blob)
    bad[i + 5] = 1  # Srgn=1: not a defined style
    with pytest.raises(NotImplementedError, match="RGN style"):
        decode_jpeg2000(bytes(bad))


def test_poc_progression_changes():
    """POC: low resolutions first in LRCP, the rest in RLCP — packets
    re-ordered on the wire, pixels identical."""
    img = _img(45, 61, 3, seed=8)
    base = encode_jpeg2000(img, levels=2, layers=2)
    blob = encode_jpeg2000(img, levels=2, layers=2,
                           poc=[(0, 0, 2, 1, 3, "lrcp"),
                                (0, 0, 2, 3, 3, "rlcp")])
    assert b"\xff\x5f" in blob
    assert blob != base  # the packet order genuinely changed
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # layer-split POC: layer 0 of everything, then layer 1
    blob = encode_jpeg2000(img, levels=2, layers=2,
                           poc=[(0, 0, 1, 3, 3, "rlcp"),
                                (0, 0, 2, 3, 3, "lrcp")])
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # POC that starves the decoder is rejected at encode time
    with pytest.raises(ValueError, match="POC segments"):
        encode_jpeg2000(img, levels=2, layers=2,
                        poc=[(0, 0, 2, 1, 3, "lrcp")])


def test_everything_with_overrides():
    """COC + QCC + RGN + POC + layers + precincts + PPT in one stream."""
    img = _img(66, 82, 3, seed=9)
    blob = encode_jpeg2000(
        img, levels=2, layers=2, precincts=(5, 5),
        per_comp={1: {"cb_exp": 3, "cb_style": CBSTY_SEGSYM}},
        rgn={0: 16},
        poc=[(0, 0, 2, 2, 3, "lrcp"), (0, 0, 2, 3, 3, "rlcp")],
        packed_headers="ppt", sop=True, eph=True,
    )
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_option_surface_fuzz_with_overrides():
    import random

    rng = np.random.default_rng(77)
    rnd = random.Random(77)
    for _trial in range(20):
        h, w = rnd.randint(8, 60), rnd.randint(8, 60)
        nc = rnd.choice([1, 3])
        img = rng.integers(
            0, 256, (h, w) if nc == 1 else (h, w, nc), dtype=np.uint8
        )
        kw = dict(levels=rnd.randint(1, 3), cb_exp=rnd.randint(3, 6),
                  layers=rnd.choice([1, 2, 4]), mct=False)
        pc = {}
        for ci in range(nc):
            if rnd.random() < 0.5:
                ov = {}
                if rnd.random() < 0.5:
                    ov["levels"] = rnd.randint(0, kw["levels"])
                if rnd.random() < 0.5:
                    ov["cb_exp"] = rnd.randint(2, 5)
                if rnd.random() < 0.3:
                    ov["cb_style"] = rnd.choice([CBSTY_BYPASS, CBSTY_SEGSYM])
                if rnd.random() < 0.3:
                    ov["precincts"] = (rnd.randint(3, 7), rnd.randint(3, 7))
                if ov:
                    pc[ci] = ov
        if pc:
            kw["per_comp"] = pc
        if rnd.random() < 0.3:
            kw["rgn"] = {rnd.randrange(nc): 16}
        blob = encode_jpeg2000(img, **kw)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_undercovering_poc_fails_loudly():
    """A POC sequence that misses packets must not silently drop them:
    splice a one-segment POC (layer 0 only) into a two-layer stream and
    the decoder reports leftover tile data instead of wrong pixels."""
    import struct

    img = _img(40, 40, seed=10)
    blob = encode_jpeg2000(img, levels=1, layers=2)
    # craft a POC covering only layer 0 of everything
    poc = b"\xff\x5f" + struct.pack(">H", 2 + 7) + struct.pack(
        ">BBHBBB", 0, 0, 1, 2, 1, 0
    )
    sot = blob.find(b"\xff\x90")
    bad = blob[:sot] + poc + blob[sot:]
    with pytest.raises(ValueError, match="POC"):
        decode_jpeg2000(bad)


def test_per_tile_cod_qcd_overrides():
    """Tile-part COD/QCD (r9 late): per-tile levels/cb/style/precinct
    tuning — the Kakadu pattern; tile COD beats the main header per
    T.800 precedence. Lossless across mixed tiles."""
    img = _img(50, 66, 3, seed=20)
    blob = encode_jpeg2000(
        img, levels=3, cb_exp=5, tile_size=(32, 32),
        per_tile={1: {"levels": 1, "cb_exp": 3},
                  2: {"cb_style": CBSTY_BYPASS | CBSTY_SEGSYM,
                      "precincts": (4, 4)}},
    )
    # the tile-part headers genuinely carry COD+QCD (>= because the
    # byte pair can also appear inside entropy data by chance)
    assert blob.count(b"\xff\x52") >= 3  # main + 2 tile overrides
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # 9/7 with per-tile levels (QCD exponent list length differs)
    blob = encode_jpeg2000(img, levels=2, irreversible=True,
                           tile_size=(32, 32), per_tile={0: {"levels": 1}})
    out = decode_jpeg2000(blob)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 3
    # layers + per-tile levels together
    blob = encode_jpeg2000(img, levels=2, layers=3, tile_size=(32, 32),
                           per_tile={3: {"levels": 0}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    with pytest.raises(ValueError, match="per_tile"):
        encode_jpeg2000(img, per_tile={0: {"levels": 1}},
                        per_comp={0: {"levels": 1}})


def test_per_tile_rgn_decodes_and_nonzero_srgn_stays_gated():
    """Per-tile RGN decodes natively since late r9; a tile-part RGN
    with a non-MAXSHIFT style is still the named gate."""
    import struct

    img = _img(20, 20, seed=21)
    blob = encode_jpeg2000(img, levels=1, rgn_tiles={0: {0: 14}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    plain = encode_jpeg2000(img, levels=1)
    sot = plain.find(b"\xff\x90")
    sod = plain.find(b"\xff\x93", sot)
    (psot,) = struct.unpack_from(">I", plain, sot + 6)
    trgn = b"\xff\x5e" + struct.pack(">HBBB", 5, 0, 3, 7)  # Srgn=3
    bad = bytearray(plain[:sod] + trgn + plain[sod:])
    struct.pack_into(">I", bad, sot + 6, psot + len(trgn))
    with pytest.raises(NotImplementedError, match="RGN style"):
        decode_jpeg2000(bytes(bad))


def test_mixed_component_precision_roundtrip():
    """SIZ Ssiz is per component (T.800 A.5.1): a 12-bit image with an
    8-bit plane and a 1-bit mask round-trips losslessly, each plane
    clipped/shifted at its OWN precision; off-reference components get
    an automatic QCC carrying their exponents."""
    rng = np.random.default_rng(61)
    a = rng.integers(0, 4096, (24, 30), dtype=np.int64)   # 12-bit
    b = rng.integers(0, 256, (24, 30), dtype=np.int64)    # 8-bit
    m = rng.integers(0, 2, (24, 30), dtype=np.int64)      # 1-bit mask
    blob = encode_jpeg2000([a, b, m], precisions=[12, 8, 1], levels=2)
    # components 1 and 2 differ from the QCD reference -> main-header
    # QCC for each
    hdr = blob[: blob.find(b"\xff\x90")]
    assert hdr.count(b"\xff\x5d") == 2
    out = decode_jpeg2000(blob)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out[:, :, 0].astype(np.int64), a)
    np.testing.assert_array_equal(out[:, :, 1].astype(np.int64), b)
    np.testing.assert_array_equal(out[:, :, 2].astype(np.int64), m)

    # signed mixed precision
    sa = rng.integers(-2048, 2048, (16, 18), dtype=np.int64)
    sb = rng.integers(-32, 32, (16, 18), dtype=np.int64)
    blob = encode_jpeg2000([sa, sb], precisions=[12, 6], signed=True,
                           levels=1)
    out = decode_jpeg2000(blob)
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out[:, :, 0].astype(np.int64), sa)
    np.testing.assert_array_equal(out[:, :, 1].astype(np.int64), sb)

    # 9/7 with mixed precision: per-component Rb drives the step sizes
    blob = encode_jpeg2000([a, b], precisions=[12, 8], levels=2,
                           irreversible=True, mct=False)
    out = decode_jpeg2000(blob)
    err0 = float(np.abs(out[:, :, 0].astype(np.int64) - a).mean())
    err1 = float(np.abs(out[:, :, 1].astype(np.int64) - b).mean())
    assert err0 < 4096 * 0.01 and err1 < 256 * 0.01

    # guards: MCT needs equal precision on components 0-2; declared
    # range must hold
    rgb = [rng.integers(0, 256, (8, 8), dtype=np.int64) for _ in range(3)]
    with pytest.raises(ValueError, match="equal precision"):
        encode_jpeg2000(rgb, precisions=[8, 8, 9], mct=True)
    with pytest.raises(ValueError, match="exceed"):
        encode_jpeg2000([a], precisions=[8])


def test_mixed_mct_tiles():
    """A per-tile COD may flip the MCT flag (T.800 A.6.1 precedence):
    the inverse color transform is per-tile state, so a decoder that
    applied it plane-wide would corrupt exactly the flipped tile."""
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)

    # main header RCT on, tile 1 opts out
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=1, mct=True,
                           per_tile={1: {"mct": False}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)

    # main header off, tile 0 opts in
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=1, mct=False,
                           per_tile={0: {"mct": True}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)

    # 9/7 + ICT variant: each tile reconstructs within tolerance
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=2, mct=True,
                           irreversible=True,
                           per_tile={1: {"mct": False}})
    out = decode_jpeg2000(blob)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 3.0

    # mct composes with the other per-tile COD overrides
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=2, mct=True,
                           per_tile={1: {"mct": False, "levels": 1,
                                         "cb_exp": 4}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
