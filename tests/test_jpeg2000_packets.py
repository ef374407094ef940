"""JPEG 2000 packet-layer features (round 9): multiple quality layers,
precinct subdivision, code-block style options, PPM/PPT packed packet
headers, SOP/EPH, all five progression orders, and quality-progressive
truncation semantics.

These are the T.800 options real encoders (OpenJPEG/Kakadu) emit by
default on large images — reference surface: PILImageReader /
ImageIOReader open .jp2 files via pillow/glymur
(/root/reference/intake/readers/readers.py:2228)."""

import struct

import numpy as np
import pytest

from intake_spark.llm.jpeg2000 import (
    CBSTY_BYPASS,
    CBSTY_RESET,
    CBSTY_SEGSYM,
    CBSTY_TERMALL,
    CBSTY_VSC,
    _pass_list,
    decode_jpeg2000,
    encode_jpeg2000,
    t1_decode,
    t1_encode,
)


def _img(h, w, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_multilayer_lossless_roundtrip():
    """All layers together reconstruct exactly — the pass split across
    layers is a re-ordering, not a loss."""
    img = _img(37, 53, seed=1)
    for L in (2, 3, 5, 16):
        blob = encode_jpeg2000(img, layers=L)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    rgb = _img(40, 30, 3, seed=2)
    blob = encode_jpeg2000(rgb, layers=4, irreversible=True)
    out = decode_jpeg2000(blob)
    assert float(np.abs(out.astype(int) - rgb.astype(int)).mean()) < 3.0


def test_multilayer_cod_signals_layer_count():
    blob = encode_jpeg2000(_img(16, 16), layers=7)
    cod = blob.find(b"\xff\x52")
    (nlayers,) = struct.unpack_from(">H", blob, cod + 6)
    assert nlayers == 7


def test_precinct_roundtrip_with_tiles_and_offset():
    """Precinct subdivision caps the code-block size (T.800 B.7) and
    splits packets per precinct with per-precinct tag trees."""
    img = _img(70, 90, 3, seed=3)
    for prec in [(6, 6), (5, 7), (3, 3)]:
        blob = encode_jpeg2000(img, levels=3, cb_exp=5, precincts=prec)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    blob = encode_jpeg2000(img, levels=2, cb_exp=4, precincts=(4, 5),
                           layers=3, tile_size=(48, 40), grid_offset=(3, 5))
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # per-resolution precinct list + COD Scod bit 0 signalled
    blob = encode_jpeg2000(img, levels=2, precincts=[(8, 8), (6, 6), (5, 5)])
    cod = blob.find(b"\xff\x52")
    assert blob[cod + 4] & 1
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_cb_style_roundtrips():
    """Bypass / reset / termall / vertically-causal / segmentation
    symbols, alone and combined, with and without layers/9-7."""
    img = _img(64, 48, seed=4)
    styles = (CBSTY_BYPASS, CBSTY_RESET, CBSTY_TERMALL, CBSTY_VSC,
              CBSTY_SEGSYM, CBSTY_BYPASS | CBSTY_TERMALL,
              CBSTY_BYPASS | CBSTY_RESET | CBSTY_VSC | CBSTY_SEGSYM)
    for sty in styles:
        blob = encode_jpeg2000(img, cb_style=sty, layers=2)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    blob = encode_jpeg2000(_img(33, 29, 3, seed=5), cb_style=styles[-1],
                           irreversible=True, layers=3)
    assert decode_jpeg2000(blob).shape == (33, 29, 3)


def test_t1_bypass_schedule_matches_spec():
    """T.800 D.6: the first 10 passes are MQ; from pass 10 on, SPP/MRP
    are raw and terminations fall at the mode switches."""
    pl = _pass_list(6, CBSTY_BYPASS)
    # passes 0..9 MQ, term at pass 9 (CUP of plane numbps-4)
    assert all(not raw for _t, _p, raw, _tm in pl[:10])
    assert pl[9][3] is True
    # thereafter SPP/MRP raw (term at MRP), CUP MQ (term)
    for i in range(10, len(pl)):
        t_, _p, raw, term = pl[i]
        assert raw == (t_ != 2)
        assert term == (t_ in (1, 2)) or i == len(pl) - 1


def test_t1_segment_boundaries_are_decodable_in_pieces():
    """Each terminated codeword segment decodes from its own byte
    slice — the decoder must NOT need the concatenated stream."""
    rng = np.random.default_rng(6)
    mags = [int(v) for v in rng.integers(0, 3000, 12 * 9)]
    sgns = [int(s) if m else 0 for s, m in zip(rng.integers(0, 2, 12 * 9), mags)]
    for sty in (CBSTY_TERMALL, CBSTY_BYPASS, CBSTY_BYPASS | CBSTY_TERMALL):
        data, npass, nbps, meta = t1_encode(sgns, mags, 12, 9, 2, sty)
        segs, prev = [], 0
        for cum, term in meta:
            if term:
                segs.append(data[prev:cum])
                prev = cum
        assert prev == len(data) and len(segs) > 1
        s2, m2 = t1_decode(segs, npass, nbps, 12, 9, 2, sty)
        assert m2 == mags and s2 == sgns


def test_t1_prefix_sufficiency():
    """pass_meta cumulative byte counts are truncation points: the
    prefix decodes passes 0..k identically to the full stream."""
    rng = np.random.default_rng(7)
    mags = [int(v) for v in rng.integers(0, 500, 8 * 8)]
    sgns = [int(s) if m else 0 for s, m in zip(rng.integers(0, 2, 64), mags)]
    data, npass, nbps, meta = t1_encode(sgns, mags, 8, 8, 0)
    for k in range(1, npass + 1):
        a = t1_decode(data[: meta[k - 1][0]], k, nbps, 8, 8, 0)
        b = t1_decode(data, k, nbps, 8, 8, 0)
        assert a == b


def test_segmentation_symbol_detects_corruption():
    """SEGSYM exists for error resilience: corrupt block bytes surface
    as the named segmentation-symbol ValueError, not silent pixels."""
    img = _img(32, 32, seed=8)
    blob = bytearray(encode_jpeg2000(img, cb_style=CBSTY_SEGSYM, levels=0))
    sod = blob.find(b"\xff\x93")
    # smash bytes in the middle of the tile body
    mid = sod + 2 + (len(blob) - sod) // 2
    for i in range(mid, mid + 4):
        blob[i] ^= 0x55
    with pytest.raises(ValueError):
        decode_jpeg2000(bytes(blob))


def test_packed_headers_ppm_ppt():
    img = _img(70, 90, 3, seed=9)
    for ph in ("ppm", "ppt"):
        blob = encode_jpeg2000(img, packed_headers=ph, layers=2,
                               precincts=(5, 5), tile_size=(64, 64))
        marker = b"\xff\x60" if ph == "ppm" else b"\xff\x61"
        assert marker in blob
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # PPM multi-tile: chunks map to tile-parts in codestream order
    blob = encode_jpeg2000(img, packed_headers="ppm", tile_size=(32, 32),
                           layers=3)
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_ppm_and_ppt_together_rejected():
    img = _img(16, 16, seed=10)
    a = encode_jpeg2000(img, packed_headers="ppm")
    b = encode_jpeg2000(img, packed_headers="ppt")
    # graft b's PPT-carrying tile-part into a's main header stream
    sot_b = b.find(b"\xff\x90")
    sot_a = a.find(b"\xff\x90")
    franken = a[:sot_a] + b[sot_b:]
    with pytest.raises(ValueError, match="PPM and PPT"):
        decode_jpeg2000(franken)


def test_progression_orders_roundtrip():
    img = _img(45, 61, 3, seed=11)
    for prog in ("lrcp", "rlcp", "rpcl", "pcrl", "cprl"):
        blob = encode_jpeg2000(img, prog=prog, layers=2)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    blob = encode_jpeg2000(img, prog="rpcl", layers=3, precincts=(5, 5),
                           cb_exp=4)
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    # RLCP with subsampled components: per-component precinct grids
    h, w = img.shape[:2]
    planes = [img[:, :, 0], img[: (h + 1) // 2, : (w + 1) // 2, 1],
              img[: (h + 1) // 2, : (w + 1) // 2, 2]]
    blob = encode_jpeg2000(planes, subsampling=[(1, 1), (2, 2), (2, 2)],
                           prog="rlcp", layers=2, precincts=(4, 4), cb_exp=3)
    out = decode_jpeg2000(blob)
    np.testing.assert_array_equal(out[:, :, 0], img[:, :, 0])


def test_layer_truncation_is_progressive():
    """Cutting the codestream at layer boundaries decodes an
    approximation whose error shrinks monotonically as layers are
    kept — layers ARE embedded truncation points (T.800 B.10.7)."""
    y, x = np.mgrid[0:64, 0:80]
    img = ((np.sin(x / 9.0) + np.cos(y / 7.0) + 2) * 60).astype(np.uint8)
    L = 4
    blob = encode_jpeg2000(img, layers=L, sop=True, irreversible=True)
    sot = blob.find(b"\xff\x90")
    sod = blob.find(b"\xff\x93", sot)
    tile = blob[sod + 2 : -2]
    sops, i = [], 0
    while True:
        j = tile.find(b"\xff\x91", i)
        if j < 0:
            break
        sops.append(j)
        i = j + 2
    npk = len(sops) // L
    errs = []
    for keep in (1, 2, 3):
        t = bytearray(blob[: sod + 2] + tile[: sops[keep * npk]])
        struct.pack_into(">I", t, sot + 6, len(t) - sot)
        t += b"\xff\xd9"
        out = decode_jpeg2000(bytes(t))
        assert out.shape == img.shape
        errs.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
    full_err = float(
        np.abs(decode_jpeg2000(blob).astype(int) - img.astype(int)).mean()
    )
    assert errs[0] > errs[1] > errs[2] > full_err
    assert full_err < 1.0


def test_sop_eph_markers():
    img = _img(24, 24, seed=12)
    blob = encode_jpeg2000(img, sop=True, eph=True, layers=2)
    assert b"\xff\x91" in blob and b"\xff\x92" in blob
    cod = blob.find(b"\xff\x52")
    assert blob[cod + 4] & 6 == 6  # Scod SOP+EPH bits
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)
    blob = encode_jpeg2000(img, sop=True, eph=True, packed_headers="ppt")
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_everything_at_once():
    """The full option surface in one codestream: 9/7 + ICT, tiles,
    grid offset, precincts, 3 layers, bypass+segsym, PPT, SOP/EPH."""
    img = _img(66, 82, 3, seed=13)
    blob = encode_jpeg2000(
        img, levels=2, cb_exp=4, irreversible=True, tile_size=(40, 36),
        grid_offset=(5, 2), precincts=(4, 4), layers=3,
        cb_style=CBSTY_BYPASS | CBSTY_SEGSYM, packed_headers="ppt",
        sop=True, eph=True,
    )
    out = decode_jpeg2000(blob)
    assert out.shape == img.shape
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 4.0


def test_option_surface_fuzz():
    """Seeded fuzz over the whole option surface: every legal combo of
    layers / precincts / styles / progression / packed headers / tiles
    / offsets must round-trip losslessly (5/3)."""
    import random

    rng = np.random.default_rng(99)
    rnd = random.Random(99)
    for _trial in range(30):
        h, w = rnd.randint(1, 70), rnd.randint(1, 70)
        nc = rnd.choice([1, 1, 3])
        img = rng.integers(
            0, 256, (h, w) if nc == 1 else (h, w, nc), dtype=np.uint8
        )
        kw = dict(
            levels=rnd.randint(0, 4), cb_exp=rnd.randint(2, 6),
            layers=rnd.choice([1, 2, 3, 7]),
            cb_style=rnd.choice([0, CBSTY_BYPASS, CBSTY_TERMALL,
                                 CBSTY_VSC, CBSTY_SEGSYM, 0x2F]),
            prog=rnd.choice(["lrcp", "rlcp", "rpcl", "pcrl", "cprl"]),
            sop=rnd.random() < 0.3, eph=rnd.random() < 0.3,
        )
        if rnd.random() < 0.5:
            kw["precincts"] = (rnd.randint(2, 8), rnd.randint(2, 8))
        if rnd.random() < 0.3:
            kw["tile_size"] = (rnd.randint(8, 64), rnd.randint(8, 64))
        if rnd.random() < 0.3:
            kw["packed_headers"] = rnd.choice(["ppm", "ppt"])
        blob = encode_jpeg2000(img, **kw)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)


# ---------------------------------------------------------------------------
# positional progression orders (T.800 B.12.1.3-5) — r9 closes the
# per-component-grid RPCL and multi-precinct PCRL/CPRL gates
# ---------------------------------------------------------------------------

def _pos_geom():
    """Hand-built geometry for the worked example below: 8x8 tile at
    the origin, comp0 full-res, comp1 subsampled (2,2), one DWT level,
    precinct exponents (2,2) at every resolution."""
    from intake_spark.llm.jpeg2000 import _precinct_grid, _res_boxes

    sub = [(1, 1), (2, 2)]
    levels = [1, 1]
    precs = [[(2, 2), (2, 2)], [(2, 2), (2, 2)]]
    pgeo = {}
    for ci, box in enumerate([(0, 0, 8, 8), (0, 0, 4, 4)]):
        rb = _res_boxes(box, levels[ci])
        for r in range(levels[ci] + 1):
            pgeo[(ci, r)] = _precinct_grid(rb[r], *precs[ci][r])
    return {"tile": (0, 0, 8, 8), "sub": sub, "levels": levels,
            "precs": precs, "pgeo": pgeo}


def test_positional_order_matches_hand_derivation():
    """The packet sequences below were derived BY HAND from the T.800
    B.12.1.3-5 position rules (precinct spans: comp0 r0=8, r1=4 with 4
    precincts; comp1 r0=16, r1=8 with 1 precinct each), independently
    of the implementation."""
    from intake_spark.llm.jpeg2000 import _packet_order

    geom = _pos_geom()
    pc = {k: v[2] * v[3] for k, v in geom["pgeo"].items()}
    assert pc == {(0, 0): 1, (0, 1): 4, (1, 0): 1, (1, 1): 1}
    rpcl = _packet_order(2, 1, 2, 2, pc, geom=geom)
    assert rpcl == [(0, 0, 0, 0), (0, 0, 1, 0), (0, 1, 0, 0),
                    (0, 1, 1, 0), (0, 1, 0, 1), (0, 1, 0, 2),
                    (0, 1, 0, 3)]
    pcrl = _packet_order(3, 1, 2, 2, pc, geom=geom)
    assert pcrl == [(0, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0),
                    (0, 1, 1, 0), (0, 1, 0, 1), (0, 1, 0, 2),
                    (0, 1, 0, 3)]
    cprl = _packet_order(4, 1, 2, 2, pc, geom=geom)
    assert cprl == [(0, 0, 0, 0), (0, 1, 0, 0), (0, 1, 0, 1),
                    (0, 1, 0, 2), (0, 1, 0, 3), (0, 0, 1, 0),
                    (0, 1, 1, 0)]


def test_positional_orders_are_permutations_of_lrcp():
    """Every positional order emits exactly the LRCP packet SET — the
    progression permutes, never drops or duplicates."""
    from intake_spark.llm.jpeg2000 import _packet_order

    geom = _pos_geom()
    pc = {k: v[2] * v[3] for k, v in geom["pgeo"].items()}
    base = _packet_order(0, 3, 2, 2, pc)
    for prog in (2, 3, 4):
        got = _packet_order(prog, 3, 2, 2, pc, geom=geom)
        assert len(got) == len(base)
        assert set(got) == set(base)


def test_rpcl_per_component_precinct_grids_roundtrip():
    """The exact combination the r8 gate named: RPCL + subsampled
    components + precinct subdivision."""
    img = _img(40, 56, 3, seed=41)
    h, w = img.shape[:2]
    planes = [img[:, :, 0], img[: (h + 1) // 2, : (w + 1) // 2, 1],
              img[: (h + 1) // 2, : (w + 1) // 2, 2]]
    blob = encode_jpeg2000(planes, subsampling=[(1, 1), (2, 2), (2, 2)],
                           prog="rpcl", layers=2, precincts=(4, 4),
                           cb_exp=3)
    out = decode_jpeg2000(blob)
    np.testing.assert_array_equal(out[:, :, 0], img[:, :, 0])


def test_pcrl_cprl_multi_precinct_roundtrip():
    img = _img(52, 44, 3, seed=42)
    for prog in ("pcrl", "cprl"):
        blob = encode_jpeg2000(img, prog=prog, layers=3,
                               precincts=(4, 3), cb_exp=3)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_positional_orders_with_grid_offset():
    """A non-zero XOsiz/YOsiz misaligns trx0 from the precinct grid —
    the B.12.1.3 tile-origin parity term must fire or the first
    precinct's packets are never emitted."""
    img = _img(33, 47, seed=43)
    for prog in ("rpcl", "pcrl", "cprl"):
        blob = encode_jpeg2000(img, prog=prog, grid_offset=(5, 3),
                               precincts=(4, 4), cb_exp=3, layers=2)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_positional_orders_multi_tile():
    img = _img(50, 66, 3, seed=44)
    for prog in ("rpcl", "pcrl", "cprl"):
        blob = encode_jpeg2000(img, prog=prog, tile_size=(32, 28),
                               precincts=(3, 4), cb_exp=3)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_poc_positional_segments_with_precincts():
    """POC whose segments use positional progressions over a
    precinct-subdivided, subsampled codestream."""
    img = _img(40, 48, 3, seed=45)
    h, w = img.shape[:2]
    planes = [img[:, :, 0], img[: (h + 1) // 2, : (w + 1) // 2, 1],
              img[: (h + 1) // 2, : (w + 1) // 2, 2]]
    poc = [(0, 0, 2, 1, 3, "cprl"), (0, 0, 2, 4, 3, "rpcl")]
    blob = encode_jpeg2000(planes, subsampling=[(1, 1), (2, 2), (2, 2)],
                           layers=2, precincts=(4, 4), cb_exp=3, poc=poc)
    out = decode_jpeg2000(blob)
    np.testing.assert_array_equal(out[:, :, 0], img[:, :, 0])


def test_jpeg2000_tile_rgn_poc():
    """Per-tile RGN and POC (T.800 A.6.3/A.6.6 tile-part-header
    precedence) decode natively: lossless round-trips only succeed if
    the decoder applies each tile's own override, not the main
    header's."""
    img = _img(40, 60, seed=51)

    # tile 1 carries an ROI the main header knows nothing about
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=1,
                           rgn_tiles={1: {0: 14}})
    assert b"\xff\x5e" in blob[blob.find(b"\xff\x90"):]
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)

    # main-header RGN shift 14, tile 1 overrides with 17: a decoder
    # that applied the main shift to tile 1 (or the tile shift to
    # tile 0) would mis-scale magnitudes and fail the exact compare
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=1,
                           rgn={0: 14}, rgn_tiles={1: {0: 17}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)

    # tile-part POC replaces the main-header POC for that tile only
    img3 = _img(36, 52, 3, seed=52)
    tpoc = [(0, 0, 2, 1, 3, "cprl"), (0, 0, 2, 4, 3, "rlcp")]
    blob = encode_jpeg2000(img3, tile_size=(28, 36), layers=2,
                           poc_tiles={1: tpoc})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img3)
    blob = encode_jpeg2000(img3, tile_size=(28, 36), layers=2,
                           poc=[(0, 0, 2, 4, 3, "rpcl")],
                           poc_tiles={0: tpoc})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img3)

    # per-tile ROI composes with per-tile COD/QCD overrides
    blob = encode_jpeg2000(img, tile_size=(32, 40), levels=2,
                           per_tile={1: {"levels": 1, "cb_exp": 4}},
                           rgn_tiles={1: {0: 14}})
    np.testing.assert_array_equal(decode_jpeg2000(blob), img)

    # guards: 9/7 components and out-of-range shifts are refused
    with pytest.raises(ValueError, match="5/3"):
        encode_jpeg2000(img, tile_size=(32, 40), irreversible=True,
                        rgn_tiles={0: {0: 4}})
    with pytest.raises(ValueError, match="1..31"):
        encode_jpeg2000(img, tile_size=(32, 40), rgn_tiles={0: {0: 0}})


def test_positional_orders_with_per_component_overrides():
    """COC overrides interact with the positional scans: a component
    with FEWER resolutions contributes no packets above its own level
    count, and per-component precinct grids change each component's
    position triggers independently."""
    img = _img(44, 52, 3, seed=46)
    for prog in ("rpcl", "pcrl", "cprl"):
        blob = encode_jpeg2000(img, levels=2, prog=prog, mct=False,
                               per_comp={2: {"levels": 1, "cb_exp": 4}},
                               precincts=(4, 4), cb_exp=3, layers=2)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)
        blob = encode_jpeg2000(img, levels=1, prog=prog, mct=False,
                               per_comp={1: {"precincts": (3, 3)}},
                               precincts=(4, 4), cb_exp=3)
        np.testing.assert_array_equal(decode_jpeg2000(blob), img)


def test_positional_order_permutation_property_fuzz():
    """Implementation-independent invariant over random geometries:
    every positional order emits EXACTLY the LRCP packet multiset —
    subsampling, per-component levels, per-resolution precincts and
    grid offsets may reorder packets but never drop or duplicate one."""
    import random

    from intake_spark.llm.jpeg2000 import (
        _ceil_div,
        _packet_order,
        _precinct_grid,
        _res_boxes,
    )

    rnd = random.Random(7)
    for _trial in range(60):
        nc = rnd.randint(1, 4)
        sub = [(1, 1)] + [
            (rnd.choice([1, 2, 4]), rnd.choice([1, 2, 4]))
            for _ in range(nc - 1)
        ]
        levels = [rnd.randint(0, 3) for _ in range(nc)]
        tx0 = rnd.randint(0, 9)
        ty0 = rnd.randint(0, 9)
        tx1 = tx0 + rnd.randint(1, 70)
        ty1 = ty0 + rnd.randint(1, 70)
        precs = []
        for ci in range(nc):
            pr = []
            for r in range(levels[ci] + 1):
                lo = 0 if r == 0 else 1
                pr.append((rnd.randint(lo, 5), rnd.randint(lo, 5)))
            precs.append(pr)
        pgeo = {}
        for ci in range(nc):
            xr, yr = sub[ci]
            box = (_ceil_div(tx0, xr), _ceil_div(ty0, yr),
                   _ceil_div(tx1, xr), _ceil_div(ty1, yr))
            rb = _res_boxes(box, levels[ci])
            for r in range(levels[ci] + 1):
                pgeo[(ci, r)] = _precinct_grid(rb[r], *precs[ci][r])
        geom = {"tile": (tx0, ty0, tx1, ty1), "sub": sub,
                "levels": levels, "precs": precs, "pgeo": pgeo}
        pc = {k: v[2] * v[3] for k, v in pgeo.items()}
        L = rnd.randint(1, 3)
        R = max(levels) + 1
        base = _packet_order(0, L, R, nc, pc)
        for prog in (2, 3, 4):
            got = _packet_order(prog, L, R, nc, pc, geom=geom)
            assert len(got) == len(base), (prog, _trial)
            assert set(got) == set(base), (prog, _trial)
