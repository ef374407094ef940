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
    # corrupt the grid template number (octets 13-14 of section 3):
    # 3.30 Lambert decodes since r9; 3.90 space-view stays rejected
    s3_off = 16 + 21
    struct.pack_into(">H", blob, s3_off + 12, 90)
    with pytest.raises(ValueError, match="3.90"):
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


def _sm_bytes(v: int, width: int) -> bytes:
    """Signed-magnitude big-endian of byte ``width`` (GRIB convention)."""
    top = 1 << (width * 8 - 1)
    return ((top | -v) if v < 0 else v).to_bytes(width, "big")


def _field_complex(values: np.ndarray, e: int = 0, d: int = 0,
                   group_len: int = 4, sd_order: int = 0,
                   sd_ws: int = 2, mvm: int = 0,
                   miss1=None, miss2=None,
                   rmiss=(9.999e20, 8.888e20)) -> bytes:
    """Sections 5+6+7 for complex packing (template 5.2) or complex
    packing with spatial differencing (5.3): the scaled integers are
    split into fixed-size groups, each coded at its own reference and
    width — hand-built per the WMO template layouts.

    With ``mvm`` 1/2 (octet 23 missing-value management), ``miss1`` /
    ``miss2`` are boolean masks of primary/secondary missing points:
    in-group all-ones codes mark them (all-ones-minus-1 secondary),
    width-0 groups signal via a reference equal to the marker at the
    reference width, and spatial differences run over the compacted
    present sequence — the g2clib compack conventions."""
    flat = values.ravel()
    n = flat.size
    m1 = (np.zeros(n, dtype=bool) if miss1 is None
          else np.asarray(miss1).ravel().astype(bool))
    m2 = (np.zeros(n, dtype=bool) if miss2 is None
          else np.asarray(miss2).ravel().astype(bool))
    present = ~(m1 | m2)
    scaled = flat[present] * (10.0 ** d)
    r = float(scaled.min()) if scaled.size else 0.0
    xs_p = np.array([int(round((v - r) / (2.0 ** e))) for v in scaled],
                    dtype=np.int64)
    firsts = b""
    if sd_order:
        orig = xs_p.copy()
        diffs = xs_p.copy()
        if sd_order == 1:
            diffs[1:] = orig[1:] - orig[:-1]
        else:
            diffs[2:] = orig[2:] - 2 * orig[1:-1] + orig[:-2]
        gmin = (int(diffs[sd_order:].min())
                if xs_p.size > sd_order else 0)
        stream = diffs.copy()
        stream[sd_order:] -= gmin
        stream[: min(sd_order, len(stream))] = 0  # travel explicitly
        firsts = b"".join(_sm_bytes(int(orig[i]), sd_ws)
                          for i in range(min(sd_order, orig.size)))
        firsts += b"".join(_sm_bytes(0, sd_ws)
                           for _ in range(sd_order - min(sd_order, orig.size)))
        firsts += _sm_bytes(gmin, sd_ws)
        xs_p = stream
    # grid-order stream: present slots take successive compacted
    # values; missing slots carry the marker sentinel -1 / -2
    xs = np.empty(n, dtype=np.int64)
    xs[present] = xs_p
    xs[m1] = -1
    xs[m2] = -2
    groups = [xs[i: i + group_len] for i in range(0, n, group_len)]

    grefs, gwidths, payloads = [], [], []
    for g in groups:
        pres = g[g >= 0]
        gref = int(pres.min()) if pres.size else 0
        maxd = int((pres - gref).max()) if pres.size else 0
        if mvm and not pres.size:
            # all-missing group: one marker type -> width 0, reference
            # is the marker; mixed types need the width path
            kinds = set(int(v) for v in g)
            if kinds == {-1} or kinds == {-2}:
                grefs.append(("M1" if kinds == {-1} else "M2"))
                gwidths.append(0)
                payloads.append([])
                continue
        if mvm:
            w = 1
            while (1 << w) - 1 - mvm < maxd:
                w += 1
        else:
            w = maxd.bit_length()
        if not mvm and maxd == 0:
            w = 0
        grefs.append(gref)
        gwidths.append(w)
        row = []
        if w:
            wm1 = (1 << w) - 1
            for v in g:
                if v == -1:
                    row.append(wm1)
                elif v == -2:
                    row.append(wm1 - 1)
                else:
                    row.append(int(v) - gref)
        payloads.append(row)

    real_refs = [gr for gr in grefs if not isinstance(gr, str)]
    nbits = max((int(gr).bit_length() for gr in real_refs), default=1) or 1
    if mvm:
        nbits = max(nbits, 2)
        while (1 << nbits) - 1 - mvm < max(real_refs, default=0):
            nbits += 1
    ref_m1 = (1 << nbits) - 1
    grefs = [ref_m1 if gr == "M1" else (ref_m1 - 1 if gr == "M2" else gr)
             for gr in grefs]
    w_bits = max(w.bit_length() for w in gwidths) or 1
    l_bits = 8
    ng = len(groups)
    if mvm:
        subst = struct.pack(">ff", rmiss[0], rmiss[1])
    else:
        subst = bytes(8)
    sec5 = (
        struct.pack(">IB", (49 if sd_order else 47), 5)
        + struct.pack(">I", n)
        + struct.pack(">H", 3 if sd_order else 2)
        + struct.pack(">f", r)
        + struct.pack(">HH", e if e >= 0 else (0x8000 | -e),
                      d if d >= 0 else (0x8000 | -d))
        + bytes([nbits, 0])          # octets 20-21 (21: original type = float)
        + bytes([1, mvm])            # octet 22 split method, 23 missing mgmt
        + subst                      # octets 24-31 missing substitutes
        + struct.pack(">I", ng)      # octets 32-35
        + bytes([0, w_bits])         # octets 36-37: width ref + bits
        + struct.pack(">I", 0)       # octets 38-41: length ref
        + bytes([1])                 # octet 42: length increment
        + struct.pack(">I", len(groups[-1]))  # octets 43-46 last length
        + bytes([l_bits])            # octet 47: bits for scaled lengths
        + (bytes([sd_order, sd_ws]) if sd_order else b"")
    )
    sec6 = struct.pack(">IB", 6, 6) + bytes([255])
    stream_bits = []

    def put(v, width):
        stream_bits.extend((int(v) >> (width - 1 - i)) & 1
                           for i in range(width))

    def pad():
        while len(stream_bits) % 8:
            stream_bits.append(0)  # WMO: each sequence pads to an octet

    for gr in grefs:
        put(gr, nbits)
    pad()
    for w in gwidths:
        put(w, w_bits)
    pad()
    for g in groups:
        put(len(g), l_bits)  # scaled length (increment 1, ref 0)
    pad()
    for row, w in zip(payloads, gwidths):
        for v in row:
            put(v, w)
    while len(stream_bits) % 8:
        stream_bits.append(0)
    payload = bytes(
        sum(b << (7 - i) for i, b in enumerate(stream_bits[k : k + 8]))
        for k in range(0, len(stream_bits), 8)
    )
    data = firsts + payload
    sec7 = struct.pack(">IB", 5 + len(data), 7) + data
    return sec5 + sec6 + sec7


def test_grib2_complex_packing(spark, tmp_path):
    """Templates 5.2/7.2 (grouped values, per-group reference+width) and
    5.3/7.3 (spatial differencing orders 1 and 2) reconstruct exactly —
    the packings operational NWP output (GFS) actually uses."""
    rng = np.random.default_rng(41)
    ivals = rng.integers(0, 500, (6, 7)).astype(float) + 250.0
    qvals = rng.integers(0, 500, (6, 7)) * 0.25 + 250.0  # exact at d=2

    for vals, kw in ((ivals, {"group_len": 5}),
                     (qvals, {"group_len": 4, "d": 2}),
                     (ivals, {"sd_order": 1, "group_len": 6}),
                     (ivals, {"sd_order": 2, "group_len": 5}),
                     (qvals, {"sd_order": 2, "group_len": 4, "d": 2,
                              "sd_ws": 3})):
        nj, ni = vals.shape
        body = (_sec1() + _sec3(ni, nj) + _sec4(0, 0)
                + _field_complex(vals, **kw) + b"7777")
        msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
        fields = _grib_decode_message(msg)
        assert len(fields) == 1
        got = np.array(fields[0]["values"]).reshape(nj, ni)
        np.testing.assert_allclose(got, vals, atol=1e-9)

    # sequence padding: force ng*nbits (and the width/length streams)
    # off octet boundaries — real GFS files pad each sequence to a
    # byte (g2clib comunpack), and an unpadded reader shears the
    # width/length streams
    odd = (rng.integers(0, 1000, (3, 7)).astype(float) + 100.0)  # ng=3 @ len 7? -> 21 pts, group_len 5 -> ng=5
    body = (_sec1() + _sec3(7, 3) + _sec4(0, 0)
            + _field_complex(odd, group_len=5) + b"7777")
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    got = np.array(_grib_decode_message(msg)[0]["values"]).reshape(3, 7)
    np.testing.assert_allclose(got, odd, atol=1e-9)

    # reserved missing-value management codes stay loud
    body5 = bytearray(_field_complex(ivals))
    body5[22] = 3  # sec5 octet 23 = missing-value management
    body = _sec1() + _sec3(7, 6) + _sec4(0, 0) + bytes(body5) + b"7777"
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    with pytest.raises(ValueError, match="missing-value management"):
        _grib_decode_message(msg)


def test_grib2_complex_packing_missing_values(spark, tmp_path):
    """Missing-value management (octet 23 = 1/2) for templates 5.2 and
    5.3: in-group all-ones markers, width-0 all-missing groups signaled
    through the reference, secondary missing, and spatial differencing
    integrated over the compacted present sequence — the encoding
    operational GFS/NAM precipitation and soil fields ship."""
    rng = np.random.default_rng(43)
    vals = rng.integers(0, 500, (6, 7)).astype(float) + 250.0
    n = vals.size
    r1 = float(np.float32(9.999e20))
    r2 = float(np.float32(8.888e20))

    def run(mvm, m1, m2=None, **kw):
        body = (_sec1() + _sec3(7, 6) + _sec4(0, 0)
                + _field_complex(vals, mvm=mvm, miss1=m1, miss2=m2, **kw)
                + b"7777")
        msg = (b"GRIB\x00\x00\x00\x02"
               + struct.pack(">Q", 16 + len(body)) + body)
        fields = _grib_decode_message(msg)
        assert len(fields) == 1
        return np.array(fields[0]["values"])

    # 5.2, primary only: scattered missing + one whole group missing
    # (group_len 4 -> positions 8..11 form a width-0 marker group)
    m1 = np.zeros(n, dtype=bool)
    m1[[2, 5, 17, 30]] = True
    m1[8:12] = True
    got = run(1, m1, group_len=4)
    exp = vals.ravel().copy()
    exp[m1] = r1
    np.testing.assert_allclose(got, exp, atol=1e-9)

    # 5.2, primary + secondary, incl. a mixed all-missing group (12..15:
    # no single marker reference fits -> width path) and an all-m2 group
    m1 = np.zeros(n, dtype=bool)
    m2 = np.zeros(n, dtype=bool)
    m1[[0, 7, 12, 13, 29]] = True
    m2[[3, 14, 15, 40]] = True
    m2[16:20] = True
    got = run(2, m1, m2, group_len=4)
    exp = vals.ravel().copy()
    exp[m1] = r1
    exp[m2] = r2
    np.testing.assert_allclose(got, exp, atol=1e-9)

    # 5.3 spatial differencing orders 1 and 2 with missing: the
    # explicit first values and minimum apply to the compacted
    # present sequence
    for order in (1, 2):
        m1 = np.zeros(n, dtype=bool)
        m1[[1, 6, 20, 21, 22, 41]] = True
        got = run(1, m1, sd_order=order, sd_ws=3, group_len=5)
        exp = vals.ravel().copy()
        exp[m1] = r1
        np.testing.assert_allclose(got, exp, atol=1e-9)

    # missing at position 0 with spatial differencing: the first
    # explicit value belongs to the first PRESENT point
    m1 = np.zeros(n, dtype=bool)
    m1[[0, 1, 2]] = True
    got = run(1, m1, sd_order=2, sd_ws=3, group_len=6)
    exp = vals.ravel().copy()
    exp[m1] = r1
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_grib2_bitmap(spark, tmp_path):
    """Section-6 bitmaps (masked grids): coded values scatter onto the
    grid, unset points become NaN — simple AND complex packing."""
    mask = np.array([[1, 0, 1, 1], [0, 1, 1, 0], [1, 1, 0, 1]], bool)
    full = np.where(mask, np.arange(12, dtype=float).reshape(3, 4) + 270.0,
                    np.nan)
    present = full[mask]

    def bitmap_sec():
        bits = mask.ravel().astype(np.uint8)
        return (struct.pack(">IB", 6 + (bits.size + 7) // 8, 6)
                + bytes([0]) + np.packbits(bits).tobytes())

    for builder in (
        lambda v: _field(v, nbits=8),
        lambda v: _field_complex(v, group_len=3),
        lambda v: _field_complex(v, sd_order=2, group_len=3),
    ):
        f = builder(present.reshape(1, -1))
        # swap the no-bitmap sec6 for a real bitmap section
        i5 = 0
        (l5,) = struct.unpack(">I", f[:4])
        sec5, rest = f[:l5], f[l5:]
        (l6,) = struct.unpack(">I", rest[:4])
        sec7 = rest[l6:]
        body = (_sec1() + _sec3(4, 3) + _sec4(0, 0)
                + sec5 + bitmap_sec() + sec7 + b"7777")
        msg = (b"GRIB\x00\x00\x00\x02"
               + struct.pack(">Q", 16 + len(body)) + body)
        fields = _grib_decode_message(msg)
        got = np.array(fields[0]["values"], dtype=float).reshape(3, 4)
        np.testing.assert_allclose(got, full, atol=1e-9, equal_nan=True)

    # inconsistent bitmap/count fails loudly
    f = _field(present.reshape(1, -1), nbits=8)
    (l5,) = struct.unpack(">I", f[:4])
    sec5, rest = f[:l5], f[l5:]
    (l6,) = struct.unpack(">I", rest[:4])
    bad_mask = bitmap_sec()[:6] + bytes([0xFF, 0xFF])  # all-ones bitmap
    body = (_sec1() + _sec3(4, 3) + _sec4(0, 0)
            + sec5 + struct.pack(">IB", 6 + 2, 6) + bytes([0]) + b"\xff\xff"
            + rest[l6:] + b"7777")
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    with pytest.raises(ValueError, match="bitmap marks"):
        _grib_decode_message(msg)


def test_grib2_grid_templates(spark, tmp_path):
    """Grid templates beyond lat/lon 3.0: Gaussian 3.40 (ERA5) shares
    3.0's layout; polar-stereo 3.20 / Lambert 3.30 (HRRR/NAM) carry
    La1/Lo1 at octets 39-46 (no basic-angle block). Values decode
    identically; geometry fields land in the row."""
    vals = np.arange(6, dtype=float).reshape(2, 3) + 300.0

    def sec3_40(ni, nj):
        s = bytearray(_sec3(ni, nj))
        struct.pack_into(">H", s, 12, 40)  # template number
        return bytes(s)

    def sec3_lcc(ni, nj, tmpl, la1=38_500_000, lo1=262_500_000):
        body = (
            struct.pack(">IBB", 81, 3, 0)
            + struct.pack(">I", ni * nj)
            + bytes([0, 0])
            + struct.pack(">H", tmpl)
            + bytes(16)  # shape of earth
            + struct.pack(">II", ni, nj)
            + struct.pack(">II", la1, lo1)  # octets 39-46
            + bytes(81 - 46)
        )
        return body

    for sec3b, want in ((sec3_40(3, 2), (40.0, 250.0)),
                        (sec3_lcc(3, 2, 30), (38.5, 262.5)),
                        (sec3_lcc(3, 2, 20), (38.5, 262.5))):
        body = (_sec1() + sec3b + _sec4(0, 0)
                + _field(vals, nbits=8) + b"7777")
        msg = (b"GRIB\x00\x00\x00\x02"
               + struct.pack(">Q", 16 + len(body)) + body)
        fields = _grib_decode_message(msg)
        assert (fields[0]["lat0"], fields[0]["lon0"]) == want
        got = np.array(fields[0]["values"]).reshape(2, 3)
        np.testing.assert_allclose(got, vals, atol=1e-9)

    # unknown grid templates stay a loud error
    bad = bytearray(sec3_lcc(3, 2, 30))
    struct.pack_into(">H", bad, 12, 90)  # space-view
    body = _sec1() + bytes(bad) + _sec4(0, 0) + _field(vals, nbits=8) + b"7777"
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    with pytest.raises(ValueError, match="3.90"):
        _grib_decode_message(msg)


def test_grib2_ieee_float_packing():
    """Template 5.4/7.4: raw big-endian IEEE floats, no scaling."""
    vals = np.array([[1.5, -2.25, 300.125], [0.0, 1e-3, -4.75]])
    for code, dt in ((1, ">f4"), (2, ">f8")):
        sec5 = (struct.pack(">IB", 12, 5) + struct.pack(">I", vals.size)
                + struct.pack(">H", 4) + bytes([code]))
        sec6 = struct.pack(">IB", 6, 6) + bytes([255])
        data = vals.ravel().astype(dt).tobytes()
        sec7 = struct.pack(">IB", 5 + len(data), 7) + data
        body = (_sec1() + _sec3(3, 2) + _sec4(0, 0)
                + sec5 + sec6 + sec7 + b"7777")
        msg = (b"GRIB\x00\x00\x00\x02"
               + struct.pack(">Q", 16 + len(body)) + body)
        got = np.array(_grib_decode_message(msg)[0]["values"]).reshape(2, 3)
        np.testing.assert_allclose(got, vals, rtol=1e-6 if code == 1 else 0)
    # unknown precision codes are loud
    sec5 = (struct.pack(">IB", 12, 5) + struct.pack(">I", 6)
            + struct.pack(">H", 4) + bytes([3]))
    body = (_sec1() + _sec3(3, 2) + _sec4(0, 0) + sec5
            + struct.pack(">IB", 6, 6) + bytes([255])
            + struct.pack(">IB", 5, 7) + b"7777")
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    with pytest.raises(ValueError, match="precision code"):
        _grib_decode_message(msg)


def test_encode_grib2_complex_roundtrip():
    """The product-side fixture encoder (sci.encode_grib2_complex, the
    q135 store builder) round-trips through the real decoder across
    5.2/5.3 x missing-management — independently of this file's own
    builder, which stays the adversarial validator."""
    from intake_spark.sci import encode_grib2_complex

    i = np.arange(1024)
    vals = ((i * 37 + 11) % 251).astype(float).reshape(32, 32)
    mask = (i % 97 == 5).reshape(32, 32)
    r1 = float(np.float32(9.999e20))
    for sd in (0, 1, 2):
        for mvm, m in ((0, None), (1, mask)):
            blob = encode_grib2_complex(vals, sd_order=sd, mvm=mvm, miss1=m)
            got = np.array(_grib_decode_message(blob)[0]["values"])
            exp = vals.ravel().copy()
            if m is not None:
                exp[m.ravel()] = r1
            np.testing.assert_allclose(got, exp, atol=1e-9, err_msg=f"sd={sd} mvm={mvm}")
    # decimal scaling stays exact for quarter-steps
    q = (np.arange(35, dtype=float).reshape(5, 7) * 0.25 + 100.0)
    got = np.array(_grib_decode_message(
        encode_grib2_complex(q, d=2, sd_order=1, group_len=6))[0]["values"])
    np.testing.assert_allclose(got, q.ravel(), atol=1e-9)
    with pytest.raises(ValueError, match="mvm"):
        encode_grib2_complex(vals, miss1=mask)


def test_grib2_bitmap_indicator_254_reuses_previous():
    """Bitmap indicator 254 re-uses the bitmap previously defined in
    the SAME message (repeated sections 4-7); 254 with no prior bitmap
    and predefined codes 1-253 stay loud."""
    mask = np.array([[1, 0, 1, 1], [0, 1, 1, 0], [1, 1, 0, 1]], bool)
    full = np.where(mask, np.arange(12, dtype=float).reshape(3, 4) + 270.0,
                    np.nan)
    present = full[mask]
    f = _field(present.reshape(1, -1), nbits=8)
    (l5,) = struct.unpack(">I", f[:4])
    sec5, rest = f[:l5], f[l5:]
    (l6,) = struct.unpack(">I", rest[:4])
    sec7 = rest[l6:]
    bits = np.packbits(mask.ravel().astype(np.uint8)).tobytes()
    sec6_real = (struct.pack(">IB", 6 + len(bits), 6) + bytes([0]) + bits)
    sec6_254 = struct.pack(">IB", 6, 6) + bytes([254])
    # field 1 defines the bitmap; field 2 re-uses it via 254
    body = (_sec1() + _sec3(4, 3) + _sec4(0, 0)
            + sec5 + sec6_real + sec7
            + _sec4(0, 1) + sec5 + sec6_254 + sec7 + b"7777")
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    fields = _grib_decode_message(msg)
    assert len(fields) == 2
    for fld in fields:
        got = np.array(fld["values"], dtype=float).reshape(3, 4)
        np.testing.assert_allclose(got, full, atol=1e-9, equal_nan=True)

    # 254 with no prior bitmap is loud
    body = (_sec1() + _sec3(4, 3) + _sec4(0, 0)
            + sec5 + sec6_254 + sec7 + b"7777")
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    with pytest.raises(ValueError, match="254"):
        _grib_decode_message(msg)

    # predefined codes stay a named gate
    sec6_pre = struct.pack(">IB", 6, 6) + bytes([7])
    body = (_sec1() + _sec3(4, 3) + _sec4(0, 0)
            + sec5 + sec6_pre + sec7 + b"7777")
    msg = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(body)) + body
    with pytest.raises(ValueError, match="out-of-band"):
        _grib_decode_message(msg)
