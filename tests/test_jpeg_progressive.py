"""Progressive JPEG (SOF2) decoder vs a hand-built progressive encoder.

The tests implement the T.81 Annex G ENCODER side (DC first/refine, AC
first/refine with EOB runs and buffered correction bits — the same
algorithms libjpeg's jcphuff.c uses) and verify the repo decoder two ways:

1. pixel-for-pixel equality against the BASELINE (SOF0) encoding of the
   SAME final coefficients — the baseline path is independently verified
   in test_jpeg.py against hand-written spec bitstreams, so a mirrored
   misreading between this encoder and the decoder would still have to
   agree with the sequential process to pass;
2. targeted hand cases (EOB runs, ZRL with embedded correction bits,
   restart markers, non-interleaved sequential scans, 12-bit SOF1).

Reference surface: the reference delegates progressive JPEG to pillow
(reference readers.py:2228 PILImageReader); this repo decodes it natively.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.llm.multimodal import _JPEG_ZIGZAG, decode_image, decode_jpeg

# Self-consistent canonical tables covering EVERY symbol (not Annex K —
# the decoder builds its table from the same DHT bytes, so generality
# beats matching any particular encoder's table choice):
#   DC: 17 categories (0..16) at code length 8
#   AC: all 256 run/size bytes, 128 at length 9 + 128 at length 10
#       (a DHT Li count is one byte, so a single length can't hold 256)
DC_BITS = [0, 0, 0, 0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(17))
AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0]
AC_VALS = list(range(256))


def _canonical(bits, vals):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODES = _canonical(DC_BITS, DC_VALS)
AC_CODES = _canonical(AC_BITS, AC_VALS)


class BW:
    """MSB-first bit writer; flush() pads with 1s and byte-stuffs."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, ln: int):
        self.bits += [(value >> i) & 1 for i in range(ln - 1, -1, -1)]

    def bit(self, b: int):
        self.bits.append(b & 1)

    def dc_sym(self, t: int):
        ln, code = DC_CODES[t]
        self.put(code, ln)

    def ac_sym(self, rs: int):
        ln, code = AC_CODES[rs]
        self.put(code, ln)

    def amp(self, v: int, t: int):
        """Amplitude bits: v itself if positive, ones-complement if negative."""
        self.put(v if v >= 0 else v + (1 << t) - 1, t)

    def flush(self) -> bytes:
        bits = self.bits + [1] * ((8 - len(self.bits) % 8) % 8)
        raw = bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[k : k + 8]))
            for k in range(0, len(bits), 8)
        )
        return raw.replace(b"\xff", b"\xff\x00")


def _seg(marker: int, body: bytes) -> bytes:
    return b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body


def _tables(prec16: bool = False, dqt: "bool | bytes" = True) -> bytes:
    if dqt is False:
        dqt = b""
    elif prec16:
        dqt = _seg(0xDB, bytes([0x10]) + struct.pack(">64H", *([256] * 64)))
    else:
        dqt = _seg(0xDB, bytes([0]) + bytes([1] * 64))
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    dht += _seg(
        0xC4,
        bytes([0x10])
        + bytes(AC_BITS)
        + bytes(AC_VALS),
    )
    return dqt + dht


def _sof(marker: int, w: int, h: int, comps, prec: int = 8) -> bytes:
    body = bytes([prec]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hv in comps:
        body += bytes([cid, hv, 0])
    return _seg(marker, body)


def _sos(comps, ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comps)])
    for cid in comps:
        body += bytes([cid, 0x00])  # Td=0, Ta=0 (the full tables above)
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


# --- encoder scan kinds (T.81 Annex G / libjpeg jcphuff.c) -----------------


def enc_dc_first(bw: BW, dcs, al: int):
    pred = 0
    for dc in dcs:
        v = int(dc) >> al  # DC point transform is an arithmetic shift
        diff = v - pred
        pred = v
        t = abs(diff).bit_length()
        bw.dc_sym(t)
        if t:
            bw.amp(diff, t)


def enc_dc_refine(bw: BW, dcs, al: int):
    for dc in dcs:
        bw.bit((int(dc) >> al) & 1)


class ACFirstEnc:
    """AC first scan for one band: run/size coding with EOB runs."""

    def __init__(self, bw: BW, al: int):
        self.bw, self.al, self.eobrun = bw, al, 0

    def _flush_eob(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.bw.ac_sym(r << 4)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0

    def block(self, coefz, ss: int, se: int):
        r = 0
        for k in range(ss, se + 1):
            v = int(coefz[k])
            mag = abs(v) >> self.al  # AC point transform shifts the magnitude
            if mag == 0:
                r += 1
                continue
            self._flush_eob()
            while r > 15:
                self.bw.ac_sym(0xF0)
                r -= 16
            t = mag.bit_length()
            self.bw.ac_sym((r << 4) | t)
            self.bw.amp(mag if v >= 0 else -mag, t)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def end(self):
        self._flush_eob()


class ACRefineEnc:
    """AC refinement scan: new ±1 coefficients + buffered correction bits."""

    def __init__(self, bw: BW, al: int):
        self.bw, self.al = bw, al
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits folded into the EOB run

    def _flush_eob(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.bw.ac_sym(r << 4)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.pending:
                self.bw.bit(b)
            self.pending = []

    def block(self, coefz, ss: int, se: int):
        absval = {k: abs(int(coefz[k])) >> self.al for k in range(ss, se + 1)}
        eobpos = max((k for k in absval if absval[k] == 1), default=ss - 1)
        r = 0
        br: list[int] = []  # correction bits since the last emitted symbol
        for k in range(ss, se + 1):
            t = absval[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                self._flush_eob()
                self.bw.ac_sym(0xF0)
                r -= 16
                for b in br:
                    self.bw.bit(b)
                br = []
            if t > 1:  # history coefficient: one correction bit, run unchanged
                br.append(t & 1)
                continue
            self._flush_eob()
            self.bw.ac_sym((r << 4) | 1)
            self.bw.bit(1 if int(coefz[k]) >= 0 else 0)
            for b in br:
                self.bw.bit(b)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending += br
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def end(self):
        self._flush_eob()


def enc_sequential_block(bw: BW, coefz, pred: int) -> int:
    dc = int(coefz[0])
    diff = dc - pred
    t = abs(diff).bit_length()
    bw.dc_sym(t)
    if t:
        bw.amp(diff, t)
    r = 0
    for k in range(1, 64):
        v = int(coefz[k])
        if v == 0:
            r += 1
            continue
        while r > 15:
            bw.ac_sym(0xF0)
            r -= 16
        t = abs(v).bit_length()
        bw.ac_sym((r << 4) | t)
        bw.amp(v, t)
        r = 0
    if r:
        bw.ac_sym(0x00)
    return dc


# --- fixture builders --------------------------------------------------------


def make_gray_baseline(w: int, h: int, blocks) -> bytes:
    """blocks: (by, bx, 64) zigzag-order coefficients."""
    # raster order = MCU order for 1x1 sampling
    flat = BW()
    pred = 0
    for by in range(blocks.shape[0]):
        for bx in range(blocks.shape[1]):
            pred = enc_sequential_block(flat, blocks[by, bx], pred)
    return (
        b"\xff\xd8"
        + _tables()
        + _sof(0xC0, w, h, [(1, 0x11)])
        + _sos([1], 0, 63, 0, 0)
        + flat.flush()
        + b"\xff\xd9"
    )


def make_gray_progressive(w: int, h: int, blocks, bands=((1, 5), (6, 63))) -> bytes:
    """Full successive-approximation ladder: DC Al=2→0, AC Al=1→0 per band."""
    dcs = [int(blocks[by, bx, 0]) for by in range(blocks.shape[0])
           for bx in range(blocks.shape[1])]
    flat = [blocks[by, bx] for by in range(blocks.shape[0])
            for bx in range(blocks.shape[1])]
    out = b"\xff\xd8" + _tables() + _sof(0xC2, w, h, [(1, 0x11)])

    bw = BW()
    enc_dc_first(bw, dcs, 2)
    out += _sos([1], 0, 0, 0, 2) + bw.flush()
    for ss, se in bands:
        bw = BW()
        enc = ACFirstEnc(bw, 1)
        for coefz in flat:
            enc.block(coefz, ss, se)
        enc.end()
        out += _sos([1], ss, se, 0, 1) + bw.flush()
    bw = BW()
    enc_dc_refine(bw, dcs, 1)
    out += _sos([1], 0, 0, 2, 1) + bw.flush()
    bw = BW()
    enc_dc_refine(bw, dcs, 0)
    out += _sos([1], 0, 0, 1, 0) + bw.flush()
    for ss, se in bands:
        bw = BW()
        enc = ACRefineEnc(bw, 0)
        for coefz in flat:
            enc.block(coefz, ss, se)
        enc.end()
        out += _sos([1], ss, se, 1, 0) + bw.flush()
    return out + b"\xff\xd9"


def random_blocks(rng, bh: int, bw_: int, dense: float = 0.25, amp: int = 60):
    """Sparse random zigzag coefficient blocks with sign and long runs."""
    blocks = np.zeros((bh, bw_, 64), dtype=np.int64)
    mask = rng.random((bh, bw_, 64)) < dense
    vals = rng.integers(-amp, amp + 1, size=(bh, bw_, 64))
    blocks[mask] = vals[mask]
    blocks[..., 0] = rng.integers(-400, 401, size=(bh, bw_))
    # a few all-zero-AC blocks to force EOB runs spanning blocks
    for by in range(bh):
        for bx in range(bw_):
            if rng.random() < 0.3:
                blocks[by, bx, 1:] = 0
    return blocks


# --- tests -------------------------------------------------------------------


def test_progressive_matches_baseline_randomized():
    """The full SA ladder reconstructs exactly the coefficients the
    baseline scan encodes — pixels must be identical, over many random
    sparse/dense/EOB-run-heavy layouts."""
    rng = np.random.default_rng(7)
    for trial in range(6):
        bh, bw_ = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        w, h = bw_ * 8 - int(rng.integers(0, 3)), bh * 8 - int(rng.integers(0, 3))
        blocks = random_blocks(rng, bh, bw_, dense=float(rng.uniform(0.05, 0.6)))
        base = decode_jpeg(make_gray_baseline(w, h, blocks))
        prog = decode_jpeg(make_gray_progressive(w, h, blocks))
        np.testing.assert_array_equal(prog, base, err_msg=f"trial {trial}")


def test_progressive_spectral_selection_only():
    """Al=0 everywhere (pure spectral selection, no SA): three AC bands."""
    rng = np.random.default_rng(11)
    blocks = random_blocks(rng, 2, 2)
    out = b"\xff\xd8" + _tables() + _sof(0xC2, 16, 16, [(1, 0x11)])
    dcs = [int(blocks[by, bx, 0]) for by in range(2) for bx in range(2)]
    flat = [blocks[by, bx] for by in range(2) for bx in range(2)]
    bw = BW()
    enc_dc_first(bw, dcs, 0)
    out += _sos([1], 0, 0, 0, 0) + bw.flush()
    for ss, se in ((1, 2), (3, 20), (21, 63)):
        bw = BW()
        enc = ACFirstEnc(bw, 0)
        for coefz in flat:
            enc.block(coefz, ss, se)
        enc.end()
        out += _sos([1], ss, se, 0, 0) + bw.flush()
    out += b"\xff\xd9"
    base = decode_jpeg(make_gray_baseline(16, 16, blocks))
    np.testing.assert_array_equal(decode_jpeg(out), base)


def test_progressive_eob_run_spans_blocks():
    """EOBRUN > 1: four blocks where only the first has AC energy — the
    EOB run must skip the remaining three; final pixels prove it."""
    blocks = np.zeros((1, 4, 64), dtype=np.int64)
    blocks[0, 0, 0] = 8 * (200 - 128)
    blocks[0, 0, 1] = 3
    blocks[0, 1, 0] = 8 * (90 - 128)
    blocks[0, 2, 0] = 8 * (90 - 128)
    blocks[0, 3, 0] = 8 * (90 - 128)
    base = decode_jpeg(make_gray_baseline(32, 8, blocks))
    prog = decode_jpeg(make_gray_progressive(32, 8, blocks, bands=((1, 63),)))
    np.testing.assert_array_equal(prog, base)
    np.testing.assert_array_equal(prog[:, 8:], 90)


def test_progressive_zrl_with_correction_bits():
    """AC refinement ZRL path: a history coefficient sits inside a >16-zero
    run before a new coefficient, so the refine scan must emit ZRL with the
    history coefficient's correction bit embedded."""
    blocks = np.zeros((1, 1, 64), dtype=np.int64)
    blocks[0, 0, 1] = 5    # history at refine time (5>>1 = 2 > 1)
    blocks[0, 0, 40] = -1  # newly nonzero at Al=0, 38 zeros before it
    base = decode_jpeg(make_gray_baseline(8, 8, blocks))
    prog = decode_jpeg(make_gray_progressive(8, 8, blocks, bands=((1, 63),)))
    np.testing.assert_array_equal(prog, base)


def test_progressive_dc_restart_markers():
    """Restart markers inside a progressive DC scan reset the predictor
    and the bit reader."""
    dcs = [8 * (60 - 128), 8 * (220 - 128)]
    out = b"\xff\xd8" + _tables()
    out += _seg(0xDD, struct.pack(">H", 1))  # DRI = 1 MCU
    out += _sof(0xC2, 16, 8, [(1, 0x11)])
    bw1 = BW()
    enc_dc_first(bw1, dcs[:1], 0)
    bw2 = BW()
    enc_dc_first(bw2, dcs[1:], 0)  # absolute again after RST
    out += _sos([1], 0, 0, 0, 0) + bw1.flush() + b"\xff\xd0" + bw2.flush()
    out += b"\xff\xd9"
    img = decode_jpeg(out)
    np.testing.assert_array_equal(img[:, :8], 60)
    np.testing.assert_array_equal(img[:, 8:], 220)


def test_progressive_color_420_with_noninterleaved_ac():
    """3-component 4:2:0 progressive: interleaved DC scan over the padded
    MCU grid, then per-component AC scans over the NON-interleaved block
    grid (3x3 for Y at 20x20, 2x2 padded grid for chroma)."""
    rng = np.random.default_rng(3)
    w = h = 20
    # Y: padded 4x4 blocks, ni grid 3x3; chroma: 2x2 both
    yb = random_blocks(rng, 4, 4, dense=0.15, amp=20)
    yb[3, :, :] = 0
    yb[:, 3, :] = 0
    yb[3, :, 0] = 64  # padding blocks: DC allowed, AC must be 0
    yb[:, 3, 0] = 64
    cbb = random_blocks(rng, 2, 2, dense=0.1, amp=10)
    crb = random_blocks(rng, 2, 2, dense=0.1, amp=10)

    comps = [(1, 0x22), (2, 0x11), (3, 0x11)]
    sof_body = lambda m: _sof(m, w, h, comps)  # noqa: E731
    sos_hdr = _sos([1, 2, 3], 0, 63, 0, 0)

    # baseline: interleaved MCUs over the padded grid, full band
    bw = BW()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(2):
        for mx in range(2):
            for by in range(2):
                for bx in range(2):
                    preds[1] = enc_sequential_block(
                        bw, yb[my * 2 + by, mx * 2 + bx], preds[1]
                    )
            preds[2] = enc_sequential_block(bw, cbb[my, mx], preds[2])
            preds[3] = enc_sequential_block(bw, crb[my, mx], preds[3])
    base_bytes = b"\xff\xd8" + _tables() + sof_body(0xC0) + sos_hdr + bw.flush() + b"\xff\xd9"

    # progressive: interleaved DC-first Al=1, DC refine, per-component AC
    out = b"\xff\xd8" + _tables() + sof_body(0xC2)
    bw = BW()
    preds = {1: 0, 2: 0, 3: 0}
    dc_seq = []
    for my in range(2):
        for mx in range(2):
            for by in range(2):
                for bx in range(2):
                    dc_seq.append((1, int(yb[my * 2 + by, mx * 2 + bx, 0])))
            dc_seq.append((2, int(cbb[my, mx, 0])))
            dc_seq.append((3, int(crb[my, mx, 0])))
    for cid, dc in dc_seq:
        v = dc >> 1
        diff = v - preds[cid]
        preds[cid] = v
        t = abs(diff).bit_length()
        bw.dc_sym(t)
        if t:
            bw.amp(diff, t)
    out += _sos([1, 2, 3], 0, 0, 0, 1) + bw.flush()
    bw = BW()
    for _cid, dc in dc_seq:
        bw.bit(dc & 1)
    out += _sos([1, 2, 3], 0, 0, 1, 0) + bw.flush()
    # AC scans: non-interleaved — Y covers ONLY its 3x3 ni grid
    for cid, arr, nby, nbx in ((1, yb, 3, 3), (2, cbb, 2, 2), (3, crb, 2, 2)):
        bw = BW()
        enc = ACFirstEnc(bw, 0)
        for by in range(nby):
            for bx in range(nbx):
                enc.block(arr[by, bx], 1, 63)
        enc.end()
        out += _sos([cid], 1, 63, 0, 0) + bw.flush()
    out += b"\xff\xd9"

    base = decode_jpeg(base_bytes)
    prog = decode_jpeg(out)
    assert base.shape == (20, 20, 3)
    np.testing.assert_array_equal(prog, base)


def test_sequential_noninterleaved_multiscan():
    """SOF0 with one scan per component (legal sequential layout) decodes
    identically to the interleaved encoding of the same coefficients."""
    rng = np.random.default_rng(5)
    comps = [(1, 0x11), (2, 0x11), (3, 0x11)]
    arrs = {cid: random_blocks(rng, 2, 2, dense=0.2, amp=30) for cid, _ in comps}
    bw = BW()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(2):
        for mx in range(2):
            for cid, _ in comps:
                preds[cid] = enc_sequential_block(bw, arrs[cid][my, mx], preds[cid])
    base_bytes = (
        b"\xff\xd8" + _tables() + _sof(0xC0, 16, 16, comps)
        + _sos([1, 2, 3], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    out = b"\xff\xd8" + _tables() + _sof(0xC0, 16, 16, comps)
    for cid, _ in comps:
        bw = BW()
        pred = 0
        for by in range(2):
            for bx in range(2):
                pred = enc_sequential_block(bw, arrs[cid][by, bx], pred)
        out += _sos([cid], 0, 63, 0, 0) + bw.flush()
    out += b"\xff\xd9"
    np.testing.assert_array_equal(decode_jpeg(out), decode_jpeg(base_bytes))


def test_extended_sequential_12bit_sof1():
    """SOF1 with 12-bit samples and a 16-bit quantization table: level
    shift 2048, q=256 → DC of 5 gives a constant 2208 uint16 block."""
    bw = BW()
    bw.dc_sym(3)
    bw.amp(5, 3)
    bw.ac_sym(0x00)
    blob = (
        b"\xff\xd8" + _tables(prec16=True)
        + _sof(0xC1, 8, 8, [(1, 0x11)], prec=12)
        + _sos([1], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    assert img.dtype == np.uint16
    np.testing.assert_array_equal(img, 2048 + 5 * 256 // 8)


def test_arithmetic_and_hierarchical_still_gate():
    blob = b"\xff\xd8" + _seg(
        0xC9, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="SOF0/SOF1/SOF2"):
        decode_jpeg(blob + b"\xff\xd9")


def test_decode_image_routes_progressive():
    """decode_image reaches the native progressive path (no pillow
    needed) and normalizes grayscale to (H, W, 1)."""
    blocks = np.zeros((1, 1, 64), dtype=np.int64)
    blocks[0, 0, 0] = 8 * (50 - 128)
    arr = decode_image(make_gray_progressive(8, 8, blocks))
    assert arr.shape == (8, 8, 1)
    np.testing.assert_array_equal(arr[:, :, 0], 50)


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    The multi-scan walk must skip them instead of desyncing (review
    finding r8: a fill byte before the second SOS silently corrupted
    pixels)."""
    rng = np.random.default_rng(21)
    blocks = random_blocks(rng, 2, 2)
    blob = make_gray_progressive(16, 16, blocks)
    want = decode_jpeg(blob)
    # insert a fill byte before EVERY marker segment after SOI
    padded = bytearray(blob[:2])
    i = 2
    n = len(blob)
    while i < n:
        if blob[i] == 0xFF and i + 1 < n and 0xC0 <= blob[i + 1] <= 0xDF:
            padded += b"\xff"
        padded.append(blob[i])
        i += 1
    np.testing.assert_array_equal(decode_jpeg(bytes(padded)), want)


def _app14(transform: int) -> bytes:
    return _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform]))


def test_adobe_cmyk_jpeg_decodes_to_rgb():
    """4-component Adobe CMYK (APP14 transform 0, ink-inverted storage):
    constant blocks decode exactly, so RGB = stored_C*stored_K/255 etc.
    is hand-checkable."""
    stored = (200, 150, 100, 220)  # stored (inverted) C, M, Y, K
    bw = BW()
    pred = {i: 0 for i in range(4)}
    for i, v in enumerate(stored):
        dc = 8 * (v - 128)
        diff = dc - pred[i]
        pred[i] = dc
        t = abs(diff).bit_length()
        bw.dc_sym(t)
        if t:
            bw.amp(diff, t)
        bw.ac_sym(0x00)
    comps = [(i + 1, 0x11) for i in range(4)]
    blob = (
        b"\xff\xd8" + _app14(0) + _tables()
        + _sof(0xC0, 8, 8, comps)
        + _sos([1, 2, 3, 4], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    assert img.shape == (8, 8, 3)
    c, m, y, k = stored
    exp = [round(c * k / 255), round(m * k / 255), round(y * k / 255)]
    np.testing.assert_array_equal(img[0, 0], exp)
    np.testing.assert_array_equal(img, np.broadcast_to(exp, (8, 8, 3)))


def test_adobe_ycck_jpeg_decodes_to_rgb():
    """YCCK (APP14 transform 2): YCbCr inverse recovers the stored
    (inverted) C/M/Y, K passes through."""
    y0, cb0, cr0, k0 = 120, 128, 128, 240  # neutral chroma: C=M=Y=y0
    bw = BW()
    for v in (y0, cb0, cr0, k0):
        dc = 8 * (v - 128)
        t = abs(dc).bit_length()
        bw.dc_sym(t)
        if t:
            bw.amp(dc, t)
        bw.ac_sym(0x00)
    comps = [(i + 1, 0x11) for i in range(4)]
    blob = (
        b"\xff\xd8" + _app14(2) + _tables()
        + _sof(0xC0, 8, 8, comps)
        + _sos([1, 2, 3, 4], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    exp = round(y0 * k0 / 255)
    np.testing.assert_array_equal(img, np.full((8, 8, 3), exp, dtype=np.uint8))


def test_app14_transform0_rgb_jpeg():
    """3-component JPEG with APP14 transform 0 is RGB — no YCbCr inverse."""
    vals = (40, 90, 200)
    bw = BW()
    for v in vals:
        dc = 8 * (v - 128)
        t = abs(dc).bit_length()
        bw.dc_sym(t)
        if t:
            bw.amp(dc, t)
        bw.ac_sym(0x00)
    comps = [(i + 1, 0x11) for i in range(3)]
    blob = (
        b"\xff\xd8" + _app14(0) + _tables()
        + _sof(0xC0, 8, 8, comps)
        + _sos([1, 2, 3], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    np.testing.assert_array_equal(img, np.broadcast_to(vals, (8, 8, 3)))


def test_fill_byte_before_in_scan_restart_marker():
    """A 0xFF fill byte may precede an RST marker INSIDE entropy data
    (T.81 B.1.1.2); dropping the rest of the scan there is silent pixel
    corruption (review finding r8, second pass)."""
    dcs = [8 * (60 - 128), 8 * (220 - 128)]
    out = b"\xff\xd8" + _tables()
    out += _seg(0xDD, struct.pack(">H", 1))
    out += _sof(0xC0, 16, 8, [(1, 0x11)])
    bw1 = BW()
    pred = 0
    t = abs(dcs[0]).bit_length()
    bw1.dc_sym(t)
    bw1.amp(dcs[0], t)
    bw1.ac_sym(0x00)
    bw2 = BW()
    t = abs(dcs[1]).bit_length()
    bw2.dc_sym(t)
    bw2.amp(dcs[1], t)
    bw2.ac_sym(0x00)
    entropy = bw1.flush() + b"\xff" + b"\xff\xd0" + bw2.flush()  # fill + RST0
    out += _sos([1], 0, 63, 0, 0) + entropy + b"\xff\xd9"
    img = decode_jpeg(out)
    np.testing.assert_array_equal(img[:, :8], 60)
    np.testing.assert_array_equal(img[:, 8:], 220)


def test_plain_cmyk_without_adobe_marker_not_inverted():
    """4-component JPEG with NO APP14: samples are plain ink values —
    R = (maxv-C)(maxv-K)/maxv, not the Adobe inverted formula."""
    inks = (55, 105, 155, 35)  # plain C, M, Y, K inks
    bw = BW()
    for v in inks:
        dc = 8 * (v - 128)
        t = abs(dc).bit_length()
        bw.dc_sym(t)
        if t:
            bw.amp(dc, t)
        bw.ac_sym(0x00)
    comps = [(i + 1, 0x11) for i in range(4)]
    blob = (
        b"\xff\xd8" + _tables()
        + _sof(0xC0, 8, 8, comps)
        + _sos([1, 2, 3, 4], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    c, m, y, k = inks
    exp = [round((255 - c) * (255 - k) / 255),
           round((255 - m) * (255 - k) / 255),
           round((255 - y) * (255 - k) / 255)]
    np.testing.assert_array_equal(img, np.broadcast_to(exp, (8, 8, 3)))


def test_decode_image_scales_12bit_to_uint8():
    """decode_image's contract is uint8 (H, W, C): a 12-bit SOF1 JPEG is
    scaled 0..4095 → 0..255 at the decode_image boundary, while direct
    decode_jpeg callers (the DICOM pixel path) keep raw uint16."""
    bw = BW()
    bw.dc_sym(3)
    bw.amp(5, 3)
    bw.ac_sym(0x00)
    blob = (
        b"\xff\xd8" + _tables(prec16=True)
        + _sof(0xC1, 8, 8, [(1, 0x11)], prec=12)
        + _sos([1], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    raw = decode_jpeg(blob)
    assert raw.dtype == np.uint16
    img = decode_image(blob)
    assert img.dtype == np.uint8 and img.shape == (8, 8, 1)
    np.testing.assert_array_equal(img[:, :, 0], (2048 + 5 * 256 // 8) >> 4)


def test_missing_dqt_raises_named_error():
    """A scan referencing an undefined quantization table raises the
    codec's named ValueError (not a raw KeyError) so decode_image's
    except clauses and image_features' err labeling keep working."""
    bw = BW()
    bw.dc_sym(0)
    bw.ac_sym(0x00)
    blob = (
        b"\xff\xd8" + _tables(dqt=False)
        + _sof(0xC0, 8, 8, [(1, 0x11)])
        + _sos([1], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="quantization table"):
        decode_jpeg(blob)
