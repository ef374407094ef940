"""Lossless JPEG (ITU T.81 process 14, SOF3): spec-built encoder in
this file round-trips the package decoder over predictors 1-7, 8/12/16
bit precisions, point transform, multi-component interleave, restart
markers, and the DICOM JPEG Lossless transfer syntaxes (.4.57/.4.70 —
the reference delegates these to pydicom plugins)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.llm.multimodal import decode_jpeg_lossless

# one shared canonical Huffman table: all 17 categories at code length 5
_BITS = [0, 0, 0, 0, 17] + [0] * 11
_VALS = bytes(range(17))
_CODES = {sym: (5, code) for code, sym in enumerate(range(17))}


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)  # pad with 1s
        return bytes(self.out)


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 1,
    precision: int | None = None,
    pt: int = 0,
    restart_interval: int = 0,
    per_scan: bool = False,
    sampling=None,
) -> bytes:
    """Minimal spec-faithful SOF3 encoder (fixed all-length-5 table).
    ``per_scan=True`` writes one SOS per component (the non-interleaved
    layout some DICOM color encoders emit) instead of one interleaved
    scan."""
    if sampling is not None and not per_scan:
        # plane-list input, ONE interleaved scan: Hi x Vi MCU sample
        # blocks per component in scan order (T.81 A.2.3/H.2), planes
        # padded up to whole MCUs by edge replication
        planes = [np.asarray(c).astype(np.int64) for c in img]
        C = len(planes)
        hmax = max(fh for fh, _fv in sampling)
        vmax = max(fv for _fh, fv in sampling)
        H, W = planes[0].shape
        H = -(-H * vmax // sampling[0][1])
        W = -(-W * hmax // sampling[0][0])
        P = precision or max(
            2, max(int(c.max()).bit_length() for c in planes)
        )
        assert not restart_interval, "restart+interleaved-MCU not built"
        mcux = -(-W // hmax)
        mcuy = -(-H // vmax)
        default = 1 << (P - pt - 1)
        pads = []
        for pl, (fh, fv) in zip(planes, sampling):
            v = (pl >> pt) if pt else pl
            pad = np.zeros((mcuy * fv, mcux * fh), dtype=np.int64)
            pad[: v.shape[0], : v.shape[1]] = v
            # edge-replicate so padding predicts cheaply and never
            # influences the cropped region
            if v.shape[0] < pad.shape[0]:
                pad[v.shape[0]:, : v.shape[1]] = v[-1:, :]
            if v.shape[1] < pad.shape[1]:
                pad[:, v.shape[1]:] = pad[:, v.shape[1] - 1: v.shape[1]]
            pads.append(pad)
        bw = _BW()
        for my in range(mcuy):
            for mx in range(mcux):
                for pad, (fh, fv) in zip(pads, sampling):
                    for vv in range(fv):
                        y = my * fv + vv
                        for hh in range(fh):
                            x = mx * fh + hh
                            if y == 0 and x == 0:
                                px = default
                            elif y == 0:
                                px = pad[y, x - 1]
                            elif x == 0:
                                px = pad[y - 1, x]
                            else:
                                a, b = pad[y, x - 1], pad[y - 1, x]
                                cc = pad[y - 1, x - 1]
                                px = (
                                    a if predictor == 1 else
                                    b if predictor == 2 else
                                    cc if predictor == 3 else
                                    a + b - cc if predictor == 4 else
                                    a + ((b - cc) >> 1) if predictor == 5
                                    else
                                    b + ((a - cc) >> 1) if predictor == 6
                                    else (a + b) >> 1
                                )
                            d = (int(pad[y, x]) - int(px)) & 0xFFFF
                            if d > 32768:
                                d -= 65536
                            t = 16 if d == 32768 else abs(d).bit_length()
                            ln, code = _CODES[t]
                            bw.put(code, ln)
                            if 0 < t < 16:
                                bw.put(
                                    d & ((1 << t) - 1) if d >= 0
                                    else (d - 1) & ((1 << t) - 1), t,
                                )
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 17) + b"\x00"
        out += bytes(_BITS) + _VALS
        out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * C, P, H, W, C)
        for c, (fh, fv) in enumerate(sampling):
            out += bytes([c + 1, (fh << 4) | fv, 0])
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * C, C)
        for c in range(C):
            out += bytes([c + 1, 0x00])
        out += bytes([predictor, 0, pt])
        out += bw.flush()
        return bytes(out) + b"\xff\xd9"
    if sampling is not None:
        # plane-list input with T.81 sampling factors: per-scan only
        assert per_scan and isinstance(img, (list, tuple))
        planes = [np.asarray(c) for c in img]
        C = len(planes)
        hmax = max(fh for fh, _fv in sampling)
        vmax = max(fv for _fh, fv in sampling)
        H, W = planes[0].shape
        H = -(-H * vmax // sampling[0][1])  # frame dims from comp 0
        W = -(-W * hmax // sampling[0][0])
        P = precision or max(
            2, max(int(c.max()).bit_length() for c in planes)
        )
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 17) + b"\x00"
        out += bytes(_BITS) + _VALS
        out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * C, P, H, W, C)
        for c, (fh, fv) in enumerate(sampling):
            out += bytes([c + 1, (fh << 4) | fv, 0])
        if restart_interval:
            out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        for c, pl in enumerate(planes):
            out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
            out += bytes([c + 1, 0x00, predictor, 0, pt])
            v = (pl.astype(np.int64) >> pt) if pt else pl.astype(np.int64)
            out += _lossless_scan_bytes(
                v[:, :, None], predictor, P, pt, restart_interval
            )
        return bytes(out) + b"\xff\xd9"
    if img.ndim == 2:
        img = img[:, :, None]
    H, W, C = img.shape
    P = precision or max(2, int(img.max()).bit_length())
    vals = (img.astype(np.int64) >> pt) if pt else img.astype(np.int64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 17) + b"\x00"
    out += bytes(_BITS) + _VALS
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * C, P, H, W, C)
    for c in range(C):
        out += bytes([c + 1, 0x11, 0])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if per_scan:
        for c in range(C):
            out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
            out += bytes([c + 1, 0x00, predictor, 0, pt])
            out += _lossless_scan_bytes(
                vals[:, :, c : c + 1], predictor, P, pt, restart_interval
            )
        return bytes(out) + b"\xff\xd9"
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * C, C)
    for c in range(C):
        out += bytes([c + 1, 0x00])
    out += bytes([predictor, 0, pt])
    out += _lossless_scan_bytes(vals, predictor, P, pt, restart_interval)
    return bytes(out) + b"\xff\xd9"


def _lossless_scan_bytes(vals, predictor, P, pt, restart_interval):
    H, W, C = vals.shape
    bw = _BW()
    chunks = []
    default = 1 << (P - pt - 1)
    use_default = True
    oned_y = -1  # T.81 H.1.2.1: 1-D Ra line at each restart-interval start
    done = 0
    for y in range(H):
        for x in range(W):
            for c in range(C):
                pl = vals[:, :, c]
                if use_default:
                    px = default
                elif y == 0 or y == oned_y:
                    px = pl[y, x - 1]
                elif x == 0:
                    px = pl[y - 1, x]
                else:
                    a, b, cc = pl[y, x - 1], pl[y - 1, x], pl[y - 1, x - 1]
                    px = (
                        a if predictor == 1 else
                        b if predictor == 2 else
                        cc if predictor == 3 else
                        a + b - cc if predictor == 4 else
                        a + ((b - cc) >> 1) if predictor == 5 else
                        b + ((a - cc) >> 1) if predictor == 6 else
                        (a + b) >> 1
                    )
                d = (int(pl[y, x]) - int(px)) & 0xFFFF
                if d > 32768:
                    d -= 65536
                if d == 32768:
                    t = 16
                else:
                    t = abs(d).bit_length()
                ln, code = _CODES[t]
                bw.put(code, ln)
                if 0 < t < 16:
                    bw.put(d & ((1 << t) - 1) if d >= 0 else (d - 1) & ((1 << t) - 1), t)
            if use_default:
                use_default = False
                oned_y = y
            done += 1
            if restart_interval and done % restart_interval == 0 and done < H * W:
                chunks.append(bw.flush())
                bw = _BW()
                use_default = True
    chunks.append(bw.flush())
    data = bytearray(chunks[0])
    for i, ch in enumerate(chunks[1:]):
        data += bytes([0xFF, 0xD0 + (i % 8)]) + ch
    return bytes(data)


def test_lossless_jpeg_predictors_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 17), dtype=np.uint8)
    for sv in range(1, 8):
        back = decode_jpeg_lossless(encode_jpeg_lossless(img, predictor=sv))
        np.testing.assert_array_equal(back, img, err_msg=f"sv={sv}")


def test_lossless_jpeg_precisions_and_shapes():
    rng = np.random.default_rng(5)
    for img in (
        rng.integers(0, 4096, (9, 14)).astype(np.uint16),   # 12-bit
        rng.integers(0, 65536, (7, 8)).astype(np.uint16),   # 16-bit
        rng.integers(0, 256, (1, 40), dtype=np.uint8),
        rng.integers(0, 256, (40, 1), dtype=np.uint8),
        np.full((12, 12), 200, dtype=np.uint8),
    ):
        prec = 16 if img.max() > 4095 else (12 if img.max() > 255 else 8)
        back = decode_jpeg_lossless(encode_jpeg_lossless(img, precision=prec))
        np.testing.assert_array_equal(back, img)


def test_lossless_jpeg_multicomponent_and_point_transform():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    back = decode_jpeg_lossless(encode_jpeg_lossless(rgb, predictor=4))
    np.testing.assert_array_equal(back, rgb)
    # point transform: low bits dropped, decoder re-scales by 2^Pt
    img = (rng.integers(0, 64, (10, 10)) << 2).astype(np.uint8)
    back = decode_jpeg_lossless(encode_jpeg_lossless(img, pt=2, precision=8))
    np.testing.assert_array_equal(back, img)


def test_lossless_jpeg_restart_markers():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (13, 19), dtype=np.uint8)
    blob = encode_jpeg_lossless(img, predictor=2, restart_interval=37)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), img)


def test_decode_image_dispatches_sof3():
    from intake_spark.llm.multimodal import decode_image

    img = (np.add.outer(np.arange(6), np.arange(11)) * 9 % 256).astype(np.uint8)
    arr = decode_image(encode_jpeg_lossless(img))
    assert arr.shape == (6, 11, 1)
    np.testing.assert_array_equal(arr[:, :, 0], img)


def test_lossless_jpeg_gates():
    rng = np.random.default_rng(1)
    # interleaved + subsampled decodes since r10; the remaining named
    # gate is RESTART INTERVALS inside such a scan — splice a DRI
    # segment into an MCU-interleaved stream
    y = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    cb = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    blob = bytearray(encode_jpeg_lossless(
        [y, cb, cb], sampling=[(2, 2), (1, 1), (1, 1)]
    ))
    idx = blob.find(b"\xff\xda")
    import struct as _s

    blob[idx:idx] = b"\xff\xdd" + _s.pack(">HH", 4, 2)
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_lossless(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_lossless(b"nope")
    # a single-component frame with non-1x1 factors is NOT subsampled
    # (factors are relative): decodes to the full grid
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    blob = bytearray(encode_jpeg_lossless(img))
    idx = blob.find(b"\xff\xc3")
    blob[idx + 2 + 2 + 6 + 1] = 0x22
    np.testing.assert_array_equal(decode_jpeg_lossless(bytes(blob)), img)


def test_dicom_jpeg_lossless_transfer_syntaxes(spark, tmp_path):
    """DICOM 1.2.840.10008.1.2.4.70 (SV1) and .57: encapsulated frames
    decode bit-exactly, incl. 16-bit and signed reinterpretation."""
    from intake_spark.sci import DICOM, DicomReader
    from tests.test_nrrd_dicom import _encapsulate, _rebuild

    rng = np.random.default_rng(2)
    f0 = rng.integers(0, 4096, size=(6, 9)).astype(np.uint16)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.70\x00", 6, 9,
        [encode_jpeg_lossless(f0, precision=12)], bits=16, signed=False,
    )
    p = tmp_path / "jl70.dcm"
    p.write_bytes(blob)
    rdr = DicomReader(data=DICOM(url=str(p)))
    got = _rebuild(rdr.read(spark=spark))
    np.testing.assert_array_equal(got.reshape(6, 9), f0)
    assert rdr.data.metadata["transfer_syntax"] == "1.2.840.10008.1.2.4.70"

    # .57 with predictor 4 and signed pixels (two's complement view)
    s0 = rng.integers(-2000, 3000, size=(5, 7)).astype(np.int16)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.57\x00", 5, 7,
        [encode_jpeg_lossless(s0.view(np.uint16), predictor=4, precision=16)],
        bits=16, signed=True,
    )
    p2 = tmp_path / "jl57.dcm"
    p2.write_bytes(blob)
    got = _rebuild(DicomReader(data=DICOM(url=str(p2))).read(spark=spark))
    np.testing.assert_array_equal(got.reshape(5, 7), s0)


def test_lossless_fill_byte_before_restart():
    """SOF3 path shares _jpeg_entropy_intervals: a fill byte before an
    in-scan RST must not truncate the scan (review finding r8)."""
    import numpy as np

    from intake_spark.llm.multimodal import decode_jpeg_lossless

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_jpeg_lossless(img, restart_interval=32)
    rst0 = blob.find(b"\xff\xd0")
    assert rst0 > 0
    padded = blob[:rst0] + b"\xff" + blob[rst0:]
    np.testing.assert_array_equal(decode_jpeg_lossless(padded), img)


def test_lossless_jpeg_per_component_scans():
    """One SOS per component (non-interleaved SOF3, the layout some
    DICOM color encoders emit): values identical to the interleaved
    form; DHT between scans honored; per-scan point transforms apply
    to their own plane; restart markers restart per scan."""
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    for sv in (1, 4, 7):
        blob = encode_jpeg_lossless(rgb, predictor=sv, per_scan=True)
        assert blob.count(b"\xff\xda") == 3
        np.testing.assert_array_equal(decode_jpeg_lossless(blob), rgb)

    # per-scan + restart markers (counter restarts per scan)
    blob = encode_jpeg_lossless(rgb, predictor=2, per_scan=True,
                                restart_interval=11)
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), rgb)

    # 16-bit per-component scans
    wide = rng.integers(0, 4096, (5, 6, 3)).astype(np.uint16)
    blob = encode_jpeg_lossless(wide, predictor=5, per_scan=True,
                                precision=12)
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), wide)

    # a component scanned twice fails loudly
    blob = encode_jpeg_lossless(rgb, per_scan=True)
    first_sos = blob.find(b"\xff\xda")
    second_sos = blob.find(b"\xff\xda", first_sos + 2)
    dup = blob[:second_sos] + blob[first_sos:second_sos] + blob[second_sos:]
    with pytest.raises(ValueError, match="scanned twice"):
        decode_jpeg_lossless(dup)

    # a missing component scan fails loudly
    trunc = blob[:second_sos] + b"\xff\xd9"
    with pytest.raises(ValueError, match="without scans"):
        decode_jpeg_lossless(trunc)


def test_lossless_jpeg_subsampled_per_component():
    """Subsampled components in per-component scans: each scan decodes
    at its own ceil(dim*f/fmax) grid and nearest-upsamples to the
    frame — the 4:2:0-style layout, now decodable (was a blanket
    gate)."""
    rng = np.random.default_rng(23)
    H, W = 10, 14
    y = rng.integers(0, 256, (H, W)).astype(np.int64)
    cb = rng.integers(0, 256, (5, 7)).astype(np.int64)
    cr = rng.integers(0, 256, (5, 7)).astype(np.int64)
    blob = encode_jpeg_lossless(
        [y, cb, cr], predictor=4, per_scan=True,
        sampling=[(2, 2), (1, 1), (1, 1)],
    )
    out = decode_jpeg_lossless(blob)
    assert out.shape == (H, W, 3)
    np.testing.assert_array_equal(out[:, :, 0], y)
    # chroma planes upsample by sample replication
    rows = np.minimum(np.arange(H) * 5 // H, 4)
    cols = np.minimum(np.arange(W) * 7 // W, 6)
    np.testing.assert_array_equal(out[:, :, 1], cb[np.ix_(rows, cols)])
    np.testing.assert_array_equal(out[:, :, 2], cr[np.ix_(rows, cols)])


def test_lossless_jpeg_interleaved_subsampled_mcu():
    """Interleaved SOF3 scan with subsampled components (T.81 A.2.3
    MCU sample blocks): the 4:2:0/4:2:2 layouts decode exactly at each
    component's own grid and nearest-upsample to the frame."""
    rng = np.random.default_rng(21)
    for (fy, fc), shape_c in ((((2, 2), (1, 1)), (5, 4)),
                              (((2, 1), (1, 1)), (10, 4))):
        y = rng.integers(0, 256, (10, 8), dtype=np.uint8)
        cb = rng.integers(0, 256, shape_c, dtype=np.uint8)
        cr = rng.integers(0, 256, shape_c, dtype=np.uint8)
        for pred in (1, 4, 7):
            blob = encode_jpeg_lossless(
                [y, cb, cr], predictor=pred,
                sampling=[fy, fc, fc],
            )
            out = decode_jpeg_lossless(blob)
            assert out.shape == (10, 8, 3)
            np.testing.assert_array_equal(out[:, :, 0], y)
            rows = np.arange(10) * fc[1] // fy[1]
            cols = np.arange(8) * fc[0] // fy[0]
            np.testing.assert_array_equal(
                out[:, :, 1], cb[np.ix_(np.minimum(rows, shape_c[0] - 1),
                                        np.minimum(cols, shape_c[1] - 1))]
            )
    # odd frame dims force MCU padding on both axes
    y = rng.integers(0, 4096, (7, 9)).astype(np.uint16)
    c2 = rng.integers(0, 4096, (4, 5)).astype(np.uint16)
    blob = encode_jpeg_lossless([y, c2, c2], sampling=[(2, 2), (1, 1), (1, 1)])
    out = decode_jpeg_lossless(blob)
    assert out.shape == (7, 9, 3)
    np.testing.assert_array_equal(out[:, :, 0], y)
