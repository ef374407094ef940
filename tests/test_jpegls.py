"""JPEG-LS (ITU-T T.87) codec: lossless/near-lossless round-trips over
adversarial shapes, the LSE/limited-Golomb/run-mode machinery, the
decode_image dispatch, and the DICOM JPEG-LS transfer syntaxes end to
end (reference delegates these to pydicom codec plugins,
readers.py:1644 — here they decode natively like RLE/baseline-JPEG)."""

from __future__ import annotations

import numpy as np
import pytest

from intake_spark.llm.jpegls import decode_jpegls, encode_jpegls


def _cases():
    rng = np.random.default_rng(7)
    return {
        "flat": np.full((16, 24), 130, dtype=np.uint8),
        "noise8": rng.integers(0, 256, (32, 41), dtype=np.uint8),
        "gradient": (np.add.outer(np.arange(20), np.arange(30)) * 3 % 256).astype(np.uint8),
        "mostly-flat": np.where(
            rng.random((25, 33)) < 0.7, 100, rng.integers(0, 256, (25, 33))
        ).astype(np.uint8),
        "noise12": rng.integers(0, 4096, (17, 23)).astype(np.uint16),
        "single-pixel": np.array([[5]], dtype=np.uint8),
        "one-row": rng.integers(0, 256, (1, 50), dtype=np.uint8),
        "one-col": rng.integers(0, 256, (50, 1), dtype=np.uint8),
        "checker": (np.indices((9, 13)).sum(0) % 2 * 255).astype(np.uint8),
    }


def test_jpegls_lossless_roundtrip_shapes():
    for name, img in _cases().items():
        blob = encode_jpegls(img)
        back = decode_jpegls(blob)
        np.testing.assert_array_equal(
            back.astype(np.int64), img.astype(np.int64), err_msg=name
        )
    # run coding actually compresses the flat image
    flat = _cases()["flat"]
    assert len(encode_jpegls(flat)) < flat.size // 4


def test_jpegls_lossless_random_sweep():
    rng = np.random.default_rng(11)
    for _ in range(60):
        h, w = rng.integers(1, 20, 2)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_jpegls(encode_jpegls(img)), img)


def test_jpegls_near_lossless_error_bound():
    rng = np.random.default_rng(13)
    for near in (1, 2, 3):
        for img in (
            rng.integers(0, 256, (30, 37), dtype=np.uint8),
            rng.integers(0, 4096, (15, 21)).astype(np.uint16),
        ):
            back = decode_jpegls(encode_jpegls(img, near=near))
            err = np.abs(back.astype(np.int64) - img.astype(np.int64)).max()
            assert err <= near
    # NEAR>0 on a noisy image is smaller than lossless
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    assert len(encode_jpegls(img, near=3)) < len(encode_jpegls(img))


def test_jpegls_gates_and_errors():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpegls(b"\x00\x01")
    # multi-component ILV-0/1/2 all decode since r10; a multi-component
    # scan claiming ILV 0 (or a reserved mode) is invalid by name
    import struct

    sof = b"\xff\xd8\xff\xf7" + struct.pack(">HBHHB", 8 + 9, 8, 4, 4, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    sos_bad = b"\xff\xda" + struct.pack(">HB", 6 + 6, 3)
    sos_bad += bytes([1, 0, 2, 0, 3, 0, 0, 3, 0])  # ns=3, NEAR=0, ILV=3
    with pytest.raises(ValueError, match="ILV"):
        decode_jpegls(sof + sos_bad)
    # a frame whose components never get a scan is a hard error
    with pytest.raises(ValueError, match="truncated|without scans"):
        decode_jpegls(sof + b"\xff\xd9")
    # truncated scan data
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_jpegls(img)
    with pytest.raises(ValueError):
        decode_jpegls(blob[: len(blob) // 2])


def test_decode_image_dispatches_jpegls():
    from intake_spark.llm.multimodal import decode_image

    img = (np.add.outer(np.arange(12), np.arange(9)) * 7 % 256).astype(np.uint8)
    arr = decode_image(encode_jpegls(img))
    assert arr.shape == (12, 9, 1)
    np.testing.assert_array_equal(arr[:, :, 0], img)


def test_dicom_jpegls_transfer_syntaxes(spark, tmp_path):
    """DICOM JPEG-LS lossless (1.2.840.10008.1.2.4.80): encapsulated
    frames decode bit-exactly, incl. 16-bit and multi-frame; the
    near-lossless syntax (.81) respects the NEAR bound."""
    from intake_spark.sci import DICOM, DicomReader
    from tests.test_nrrd_dicom import _encapsulate, _rebuild

    rng = np.random.default_rng(5)
    f0 = rng.integers(0, 4096, size=(7, 6)).astype(np.uint16)
    f1 = rng.integers(0, 4096, size=(7, 6)).astype(np.uint16)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.80\x00", 7, 6,
        [encode_jpegls(f0), encode_jpegls(f1)], bits=16, signed=False,
    )
    p = tmp_path / "jls.dcm"
    p.write_bytes(blob)
    rdr = DicomReader(data=DICOM(url=str(p)))
    got = _rebuild(rdr.read(spark=spark))
    np.testing.assert_array_equal(got, np.stack([f0, f1]))
    assert rdr.data.metadata["transfer_syntax"] == "1.2.840.10008.1.2.4.80"

    near = 2
    g = rng.integers(0, 256, size=(9, 11)).astype(np.uint8)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.81\x00", 9, 11,
        [encode_jpegls(g, near=near)], bits=8, signed=False,
    )
    p2 = tmp_path / "jls_near.dcm"
    p2.write_bytes(blob)
    got = _rebuild(DicomReader(data=DICOM(url=str(p2))).read(spark=spark))
    assert np.abs(got.reshape(9, 11) - g.astype(np.int64)).max() <= near


def test_dicom_single_frame_multi_fragment_merges(spark, tmp_path):
    """PS3.5 A.4: ONE frame may span several fragments — they
    concatenate before decode (multi-frame without 1:1 still raises)."""
    from intake_spark.sci import DICOM, DicomReader
    from tests.test_nrrd_dicom import _encapsulate, _rebuild

    import struct as _s

    from tests.test_nrrd_dicom import _el_explicit

    rng = np.random.default_rng(8)
    f0 = rng.integers(0, 4096, size=(8, 5)).astype(np.uint16)
    blob_jls = encode_jpegls(f0)
    cut = len(blob_jls) // 2
    if cut % 2:
        cut += 1  # fragments are even-length; split on an even boundary

    def build(n_frames_tag, fragments):
        meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.80\x00")
        meta = _el_explicit(0x0002, 0x0000, b"UL", _s.pack("<I", len(meta))) + meta
        ds = b""
        if n_frames_tag:
            ds += _el_explicit(0x0028, 0x0008, b"IS", n_frames_tag)
        ds += _el_explicit(0x0028, 0x0010, b"US", _s.pack("<H", 8))
        ds += _el_explicit(0x0028, 0x0011, b"US", _s.pack("<H", 5))
        ds += _el_explicit(0x0028, 0x0100, b"US", _s.pack("<H", 16))
        ds += _el_explicit(0x0028, 0x0103, b"US", _s.pack("<H", 0))
        ds += _s.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
        ds += _s.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty BOT
        for payload in fragments:
            if len(payload) % 2:
                payload += b"\x00"
            ds += _s.pack("<HHI", 0xFFFE, 0xE000, len(payload)) + payload
        ds += _s.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        return b"\x00" * 128 + b"DICM" + meta + ds

    # single frame (no NumberOfFrames tag) split across two fragments
    p = tmp_path / "frag.dcm"
    p.write_bytes(build(None, [blob_jls[:cut], blob_jls[cut:]]))
    got = _rebuild(DicomReader(data=DICOM(url=str(p))).read(spark=spark))
    np.testing.assert_array_equal(got.reshape(8, 5), f0)

    # multi-frame with mismatched fragment count still raises by name
    import pytest as _pytest

    p2 = tmp_path / "bad_multi.dcm"
    p2.write_bytes(
        build(b"2 ", [blob_jls[:cut], blob_jls[cut:], encode_jpegls(f0)])
    )
    with _pytest.raises(ValueError, match="MULTI-frame"):
        DicomReader(data=DICOM(url=str(p2))).read(spark=spark)


def test_image_meta_reports_jpegls_dims():
    from intake_spark.llm.multimodal import image_meta

    img = np.zeros((12, 34), dtype=np.uint8)
    m = image_meta(encode_jpegls(img))
    assert m == {"format": "jpeg-ls", "width": 34, "height": 12}


def test_jpegls_lse_zero_means_default_and_dri_gate():
    """Review findings: LSE preset fields with value 0 mean 'default'
    (T.87 C.2.4.1.1 — CharLS writes 0 for unset MAXVAL/RESET); a DRI
    larger than the image is one interval (no markers), while a DRI
    that PROMISES markers the stream lacks fails loudly."""
    import struct

    from intake_spark.llm.jpegls import _default_thresholds

    img = (np.add.outer(np.arange(10), np.arange(14)) * 11 % 256).astype(np.uint8)
    blob = encode_jpegls(img)
    # splice an LSE carrying MAXVAL=0/RESET=0 and the DEFAULT thresholds
    t1, t2, t3 = _default_thresholds(255, 0)
    lse = b"\xff\xf8" + struct.pack(">HB5H", 2 + 11, 1, 0, t1, t2, t3, 0)
    idx = blob.find(b"\xff\xda")
    spliced = blob[:idx] + lse + blob[idx:]
    np.testing.assert_array_equal(decode_jpegls(spliced), img)

    # DRI >= height: one interval, no markers expected -> decodes
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 32)
    np.testing.assert_array_equal(decode_jpegls(blob[:idx] + dri + blob[idx:]), img)
    # DRI < height on a stream WITHOUT markers: loud error, because the
    # intervals would otherwise decode with stale neighbor context
    dri4 = b"\xff\xdd" + struct.pack(">HH", 4, 4)
    with pytest.raises(ValueError):
        decode_jpegls(blob[:idx] + dri4 + blob[idx:])
    # DRI with interval 0 (= disabled) is fine
    dri0 = b"\xff\xdd" + struct.pack(">HH", 4, 0)
    np.testing.assert_array_equal(decode_jpegls(blob[:idx] + dri0 + blob[idx:]), img)


def test_jpegls_multicomponent_ilv0():
    """Plane-interleaved (ILV-0, one scan per component) color and
    subsampled frames round-trip; subsampled components nearest-upsample
    to the frame grid; 16-bit multi-component and NEAR>0 both hold."""
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    back = decode_jpegls(encode_jpegls(rgb))
    assert back.shape == (13, 17, 3)
    np.testing.assert_array_equal(back, rgb)

    # Y at 2x2 factors, chroma at 1x1 (4:2:0-style), odd frame dims
    H, W = 15, 22
    y = rng.integers(0, 256, (H, W)).astype(np.int64)
    cb = rng.integers(0, 256, (8, 11)).astype(np.int64)
    cr = rng.integers(0, 256, (8, 11)).astype(np.int64)
    blob = encode_jpegls([y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)])
    out = decode_jpegls(blob)
    assert out.shape == (H, W, 3)
    np.testing.assert_array_equal(out[:, :, 0], y)
    rows, cols = np.arange(H) // 2, np.arange(W) // 2
    np.testing.assert_array_equal(out[:, :, 1], cb[np.ix_(rows, cols)])
    np.testing.assert_array_equal(out[:, :, 2], cr[np.ix_(rows, cols)])

    two = rng.integers(0, 4096, (9, 7, 2)).astype(np.int64)
    np.testing.assert_array_equal(
        decode_jpegls(encode_jpegls(two)).astype(np.int64), two
    )
    near = decode_jpegls(encode_jpegls(rgb, near=2))
    assert np.abs(near.astype(int) - rgb.astype(int)).max() <= 2

    # shape validation
    with pytest.raises(ValueError, match="does not match sampling"):
        encode_jpegls([y, cb[:, :5], cr], sampling=[(2, 2), (1, 1), (1, 1)])
    with pytest.raises(ValueError, match="maximum sampling"):
        encode_jpegls([cb, y, cr], sampling=[(1, 1), (2, 2), (1, 1)])


def test_jpegls_fill_bytes_before_markers():
    """0xFF fill bytes before inter-scan markers are legal padding; the
    post-scan resync + marker walk must skip them (review finding r8)."""
    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = encode_jpegls(rgb)
    # pad before every SOS and the EOI
    out = bytearray()
    i = 0
    while i < len(blob):
        if blob[i] == 0xFF and i + 1 < len(blob) and blob[i + 1] in (0xDA, 0xD9):
            out += b"\xff\xff"  # two fill bytes
        out.append(blob[i])
        i += 1
    back = decode_jpegls(bytes(out))
    np.testing.assert_array_equal(back, rgb)


def test_jpegls_restart_intervals():
    """DRI/RSTm (T.87 C.2.5): every interval is an independently-coded
    unit — modeling state and the line above reset — and the decoder
    enforces the RSTm modulo-8 sequence."""
    import struct

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (40, 30), dtype=np.uint8)
    for ri in (1, 7, 8, 40, 100):
        blob = encode_jpegls(img, restart_interval=ri)
        assert (b"\xff\xdd" in blob) and (ri >= 40 or b"\xff\xd0" in blob)
        np.testing.assert_array_equal(decode_jpegls(blob), img)

    # color planes chunk independently; near-lossless keeps its bound
    rgb = rng.integers(0, 256, (33, 21, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpegls(encode_jpegls(rgb, restart_interval=10)), rgb
    )
    out = decode_jpegls(encode_jpegls(rgb, near=2, restart_interval=9))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2

    # an out-of-sequence restart marker fails loudly, not as wrong rows
    blob = bytearray(encode_jpegls(img, restart_interval=8))
    i = blob.find(b"\xff\xd0")
    assert i > 0
    blob[i + 1] = 0xD3
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpegls(bytes(blob))

    # a missing restart marker (truncated stream) fails loudly too
    blob = encode_jpegls(img, restart_interval=8)
    i = blob.find(b"\xff\xd0")
    with pytest.raises(ValueError):
        decode_jpegls(blob[:i] + b"\xff\xd9")

    # each interval decodes like a fresh scan: byte-identical to
    # encoding the slice as its own image (the independence contract)
    blob = encode_jpegls(img, restart_interval=16)
    sos = blob.find(b"\xff\xda")
    first_rst = blob.find(b"\xff\xd0", sos)
    seg0 = blob[sos + 2 + 6 + 2 : first_rst].rstrip(b"\x00")
    solo = encode_jpegls(img[:16])
    ssos = solo.find(b"\xff\xda")
    sseg = solo[ssos + 2 + 6 + 2 : -2].rstrip(b"\x00")
    assert seg0 == sseg


def test_jpegls_ilv1_ilv2_roundtrip():
    """Line (ILV 1) and sample (ILV 2) interleaved scans round-trip
    bit-exactly (lossless) / within the bound (NEAR>0), across random,
    run-heavy, and 16-bit content — CharLS semantics: shared context
    statistics, per-component run index (ILV 1), all-component run
    gating + RItype-0 interruptions (ILV 2)."""
    rng = np.random.default_rng(50)
    for ilv in (1, 2):
        for near in (0, 2):
            for shape in ((16, 16, 3), (7, 5, 3), (1, 9, 3), (24, 3, 4)):
                img = rng.integers(0, 256, shape, dtype=np.uint8)
                back = decode_jpegls(encode_jpegls(img, near=near, ilv=ilv))
                assert back.shape == img.shape
                err = np.abs(back.astype(int) - img.astype(int)).max()
                assert err <= near, (ilv, near, shape, err)
            # run-heavy content exercises the shared run machinery
            img = np.full((12, 40, 3), 77, dtype=np.uint8)
            img[:, 30:, :] = 200
            back = decode_jpegls(encode_jpegls(img, near=near, ilv=ilv))
            assert np.abs(back.astype(int) - img.astype(int)).max() <= near
            img16 = (np.arange(15 * 20 * 3).reshape(15, 20, 3)
                     % 1021).astype(np.uint16)
            back = decode_jpegls(encode_jpegls(img16, near=near, ilv=ilv))
            assert np.abs(back.astype(int) - img16.astype(int)).max() <= near
    # components that only differ per channel (catches channel mixups)
    base = rng.integers(0, 256, (10, 10), dtype=np.uint8)
    img = np.stack([base, base + 0, 255 - base], axis=-1)
    for ilv in (1, 2):
        np.testing.assert_array_equal(
            decode_jpegls(encode_jpegls(img, ilv=ilv)), img
        )


def test_jpegls_ilv1_with_sampling_factors():
    """ILV-1 line groups honor per-component V factors: component i
    contributes V_i lines per group; subsampled chroma upsamples
    nearest to the frame grid."""
    rng = np.random.default_rng(51)
    y = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    cb = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    cr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    blob = encode_jpegls([y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)],
                         ilv=1)
    back = decode_jpegls(blob)
    assert back.shape == (16, 16, 3)
    np.testing.assert_array_equal(back[:, :, 0], y)
    up = cb[np.arange(16) // 2][:, np.arange(16) // 2]
    np.testing.assert_array_equal(back[:, :, 1], up)


def test_jpegls_ilv_gates():
    """Mismatched ILV-2 dimensions stay loud; reserved ILV values are
    invalid."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="ilv"):
        encode_jpegls(img, ilv=3)
    y = np.zeros((8, 8), dtype=np.uint8)
    c = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="identical"):
        encode_jpegls([y, c, c], sampling=[(2, 2), (1, 1), (1, 1)], ilv=2)


def test_jpegls_ilv1_subsampled_restart_intervals():
    """DRI/RSTm inside a SUBSAMPLED line-interleaved scan: the interval
    counts line GROUPS (V_i lines of component i per group — the
    CharLS interleave-unit reading of T.87 C.2.5's ambiguous "lines"),
    each interval an independently coded unit. Covers ragged final
    groups (odd frame heights), interval = 1 group, lossless and
    near-lossless, and V=4 factors."""
    rng = np.random.default_rng(93)
    for H, W, ri_ in ((16, 16, 2), (15, 13, 3), (11, 9, 1), (16, 8, 5)):
        y = rng.integers(0, 256, (H, W), dtype=np.uint8)
        ch, cw = -(-H // 2), -(-W // 2)
        cb = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        cr = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        for near in (0, 1):
            blob = encode_jpegls(
                [y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)],
                ilv=1, restart_interval=ri_, near=near,
            )
            back = decode_jpegls(blob)
            assert back.shape == (H, W, 3)
            err = np.abs(back[:, :, 0].astype(int) - y.astype(int)).max()
            assert err <= near, (H, W, ri_, near)
            up = cb[np.minimum(np.arange(H) // 2, ch - 1)][
                :, np.minimum(np.arange(W) // 2, cw - 1)]
            err = np.abs(back[:, :, 1].astype(int) - up.astype(int)).max()
            assert err <= near, (H, W, ri_, near)
    # V=4 luma against V=1 chroma: 4+1+1 lines per group
    y = rng.integers(0, 256, (17, 8), dtype=np.uint8)
    c4 = rng.integers(0, 256, (5, 8), dtype=np.uint8)
    blob = encode_jpegls([y, c4, c4], sampling=[(1, 4), (1, 1), (1, 1)],
                         ilv=1, restart_interval=2)
    back = decode_jpegls(blob)
    np.testing.assert_array_equal(back[:, :, 0], y)
    # restart markers actually present (ngroups=5, ri=2 -> 2 RSTms)
    assert blob.count(b"\xff\xd0") + blob.count(b"\xff\xd1") >= 2


def test_jpegls_ilv2_equal_factor_restart_intervals():
    """DRI/RSTm inside a sample-interleaved scan whose components all
    carry the same >1 V factor (identical dims, so ILV-2 is legal):
    one line group = V component rows."""
    rng = np.random.default_rng(94)
    planes = [rng.integers(0, 256, (7, 5), dtype=np.uint8)
              for _ in range(3)]
    blob = encode_jpegls(planes, sampling=[(2, 2), (2, 2), (2, 2)],
                         ilv=2, restart_interval=2)
    back = decode_jpegls(blob)
    # every component carries the max factors, so no upsampling: the
    # frame grid IS the component grid; ngroups=ceil(7/2)=4, ri=2 -> one
    # RSTm between the two intervals
    assert back.shape == (7, 5, 3)
    for i, pl in enumerate(planes):
        np.testing.assert_array_equal(back[:, :, i], pl)
    assert b"\xff\xd0" in blob


def test_jpegls_ilv_restart_intervals():
    """DRI/RSTm inside interleaved scans (1x1 factors): every interval
    is an independently coded unit — fresh modeling state, run indexes
    and line buffers — across both interleave modes, lossless and
    near-lossless, run-heavy and noisy content."""
    rng = np.random.default_rng(77)
    for ilv in (1, 2):
        for ri_ in (1, 2, 5):
            for near in (0, 2):
                img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
                blob = encode_jpegls(img, near=near, ilv=ilv,
                                     restart_interval=ri_)
                back = decode_jpegls(blob)
                err = np.abs(back.astype(int) - img.astype(int)).max()
                assert err <= near, (ilv, ri_, near, err)
    img = np.full((9, 30, 3), 55, np.uint8)
    img[:, 20:, :] = 200
    for ilv in (1, 2):
        blob = encode_jpegls(img, ilv=ilv, restart_interval=2)
        np.testing.assert_array_equal(decode_jpegls(blob), img)
        # an out-of-sequence restart marker is loud
        i = blob.find(b"\xff\xd0")
        bad = bytearray(blob)
        bad[i + 1] = 0xD5
        with pytest.raises(ValueError, match="out of sequence"):
            decode_jpegls(bytes(bad))


def test_dicom_color_jpegls_ilv2(spark, tmp_path):
    """DICOM color JPEG-LS (.4.80, SamplesPerPixel 3) commonly ships
    sample-interleaved scans — the full path through DicomReader
    reconstructs the RGB frame exactly."""
    from intake_spark.sci import DICOM, DicomReader
    from tests.test_nrrd_dicom import _encapsulate, _rebuild

    rng = np.random.default_rng(52)
    rgb = rng.integers(0, 256, size=(9, 7, 3)).astype(np.uint8)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.80\x00", 9, 7,
        [encode_jpegls(rgb, ilv=2)], bits=8, spp=3, signed=False,
    )
    p = tmp_path / "jls_rgb.dcm"
    p.write_bytes(blob)
    got = _rebuild(DicomReader(data=DICOM(url=str(p))).read(spark=spark))
    np.testing.assert_array_equal(got.reshape(9, 7, 3), rgb)


def test_jpegls_sof_sampling_factor_guard():
    """A zero sampling factor in SOF55 is invalid (T.81 frame syntax)
    and must raise by name — not exit the ILV-1 line-group loop with
    undecoded rows."""
    import struct

    sof = b"\xff\xd8\xff\xf7" + struct.pack(">HBHHB", 8 + 9, 8, 4, 4, 3)
    sof += bytes([1, 0x11, 0, 2, 0x10, 0, 3, 0x11, 0])  # comp 2: v = 0
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpegls(sof + b"\xff\xd9")
