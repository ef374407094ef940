"""Baseline JPEG decoder vs hand-encoded bitstreams: the tests write DQT/
DHT/SOF0/SOS segments and the entropy bits directly from the T.81 spec
(no PIL, no encoder under test) — DC prediction, AC run/size coding,
4:2:0 chroma, restart markers."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.llm.multimodal import decode_image, decode_jpeg

# Annex K.3 luminance DC table: category n ↦ canonical code
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# minimal AC table: len2 → EOB, (0,1); len3 → (1,1), (0,2), ZRL
AC_BITS = [0, 2, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
AC_VALS = [0x00, 0x01, 0x11, 0x02, 0xF0]


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
    def __init__(self):
        self.bits: list[int] = []

    def put(self, code: int, ln: int):
        self.bits += [(code >> i) & 1 for i in range(ln - 1, -1, -1)]

    def dc(self, diff: int):
        t = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        ln, code = DC_CODES[t]
        self.put(code, ln)
        if t:
            self.put(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def ac_eob(self):
        ln, code = AC_CODES[0x00]
        self.put(code, ln)

    def ac(self, run_size: int, value: int):
        ln, code = AC_CODES[run_size]
        self.put(code, ln)
        s = run_size & 0xF
        self.put(value if value >= 0 else value + (1 << s) - 1, s)

    def flush(self) -> bytes:
        bits = self.bits + [1] * ((8 - len(self.bits) % 8) % 8)
        raw = bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[k : k + 8]))
            for k in range(0, len(bits), 8)
        )
        return raw.replace(b"\xff", b"\xff\x00")


def _seg(marker: int, body: bytes) -> bytes:
    return b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body


def _tables() -> bytes:
    dqt = _seg(0xDB, bytes([0]) + bytes([1] * 64))
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    dht += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    return dqt + dht


def make_gray_jpeg(w: int, h: int, entropy: bytes, dri: int = 0) -> bytes:
    out = b"\xff\xd8" + _tables()
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def make_color420_jpeg(w: int, h: int, entropy: bytes) -> bytes:
    out = b"\xff\xd8" + _tables()
    comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + comps)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def test_constant_block():
    bw = BW()
    bw.dc(8 * (200 - 128))  # DC-only: pixel = 128 + DC/8
    bw.ac_eob()
    img = decode_jpeg(make_gray_jpeg(8, 8, bw.flush()))
    assert img.shape == (8, 8)
    np.testing.assert_array_equal(img, np.full((8, 8), 200, dtype=np.uint8))


def test_dc_prediction_across_blocks():
    values = [100, 150, 250]
    bw = BW()
    prev = 0
    for v in values:
        dc = 8 * (v - 128)
        bw.dc(dc - prev)
        prev = dc
        bw.ac_eob()
    img = decode_jpeg(make_gray_jpeg(24, 8, bw.flush()))
    assert img.shape == (8, 24)
    for i, v in enumerate(values):
        np.testing.assert_array_equal(img[:, i * 8 : (i + 1) * 8], v)


def test_single_ac_coefficient():
    """DC + one AC at zigzag 1 (natural (0,1)) — compare against an
    independent cosine-sum IDCT."""
    bw = BW()
    bw.dc(0)
    bw.ac(0x01, 1)  # (run 0, size 1): coefficient 1 at zigzag index 1
    bw.ac_eob()
    img = decode_jpeg(make_gray_jpeg(8, 8, bw.flush()))
    C = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2
    C[0, :] *= 1 / np.sqrt(2)
    expected = 128.0 + np.outer(C[0], C[1])  # coef B[0,1] = 1
    np.testing.assert_array_equal(img, np.clip(expected.round(), 0, 255).astype(np.uint8))


def test_ac_run_and_second_row_coefficient():
    """(run 1, size 1) places a coefficient at zigzag 2 = natural (1,0)."""
    bw = BW()
    bw.dc(0)
    bw.ac(0x11, -1)  # skip zigzag 1, set zigzag 2 to -1
    bw.ac_eob()
    img = decode_jpeg(make_gray_jpeg(8, 8, bw.flush()))
    C = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2
    C[0, :] *= 1 / np.sqrt(2)
    expected = 128.0 - np.outer(C[1], C[0])
    np.testing.assert_array_equal(img, np.clip(expected.round(), 0, 255).astype(np.uint8))


def test_color_420_constant():
    y, cb, cr = 120, 140, 90
    bw = BW()
    prev = 0
    for _ in range(4):  # four Y blocks in the 2x2 MCU
        dc = 8 * (y - 128)
        bw.dc(dc - prev)
        prev = dc
        bw.ac_eob()
    bw.dc(8 * (cb - 128))
    bw.ac_eob()
    bw.dc(8 * (cr - 128))
    bw.ac_eob()
    img = decode_jpeg(make_color420_jpeg(16, 16, bw.flush()))
    assert img.shape == (16, 16, 3)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    exp = np.clip(np.round([r, g, b]), 0, 255).astype(np.uint8)
    assert (img == exp[None, None, :]).all()


def test_restart_markers_reset_dc():
    bw1 = BW()
    bw1.dc(8 * (60 - 128))
    bw1.ac_eob()
    bw2 = BW()
    bw2.dc(8 * (220 - 128))  # absolute again: predictor reset at RST
    bw2.ac_eob()
    entropy = bw1.flush() + b"\xff\xd0" + bw2.flush()
    img = decode_jpeg(make_gray_jpeg(16, 8, entropy, dri=1))
    np.testing.assert_array_equal(img[:, :8], 60)
    np.testing.assert_array_equal(img[:, 8:], 220)


def test_cropping_non_multiple_of_8():
    bw = BW()
    bw.dc(8 * (77 - 128))
    bw.ac_eob()
    img = decode_jpeg(make_gray_jpeg(5, 6, bw.flush()))
    assert img.shape == (6, 5)
    np.testing.assert_array_equal(img, 77)


def test_arithmetic_rejected():
    # named codec gate (NotImplementedError): decode_image delegates this
    # to pillow when installed; bare decode_jpeg always gates. Progressive
    # (SOF2) decodes natively now — see test_jpeg_progressive.py.
    blob = b"\xff\xd8" + _seg(0xCA, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="SOF0/SOF1/SOF2"):
        decode_jpeg(blob + b"\xff\xd9")


def test_decode_image_routes_jpeg():
    bw = BW()
    bw.dc(8 * (10 - 128))
    bw.ac_eob()
    img = decode_image(make_gray_jpeg(8, 8, bw.flush()))
    np.testing.assert_array_equal(img, 10)


def test_grayscale_jpeg_through_image_features(spark, tmp_path):
    """decode_image normalizes 1-component JPEGs to (H, W, 1) so the
    image_features pipeline handles them like PNG/TIFF."""
    from intake_spark.llm import multimodal

    bw = BW()
    bw.dc(32)
    bw.ac_eob()
    blob = make_gray_jpeg(8, 8, bw.flush())
    arr = multimodal.decode_image(blob)
    assert arr.ndim == 3 and arr.shape[2] == 1
    (tmp_path / "g.jpg").write_bytes(blob)
    files = multimodal.read_binary_dir(spark, str(tmp_path), glob="*.jpg")
    row = multimodal.image_features(files, keep_cols=["path"]).collect()[0]
    assert (row.width, row.height, row.n_channels) == (8, 8, 1)
    assert len(row.thumb) == 64
