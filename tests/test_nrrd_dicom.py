"""NRRD and DICOM readers vs spec-built fixtures (pynrrd/pydicom absent):
NRRD raw/gzip encodings and endianness; DICOM Part 10 explicit+implicit
VR, undefined-length sequence skip, signed 16-bit pixels."""

from __future__ import annotations

import gzip
import struct

import numpy as np
import pytest

from intake_spark.sci import (
    DICOM,
    NRRD,
    DicomReader,
    NRRDReader,
    _dicom_meta,
)
from intake_spark import datatypes as dt  # noqa: F401


def _rebuild(df) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    shape = list(rows[0].shape)
    flat = np.concatenate([np.asarray(r.values) for r in rows])
    return flat.reshape([-1] + shape[1:])


# --------------------------- NRRD ------------------------------------------


def make_nrrd(path, arr: np.ndarray, encoding: str = "raw", endian: str = "little") -> str:
    tname = {"u1": "uint8", "i2": "int16", "u2": "uint16", "f4": "float", "f8": "double"}[
        arr.dtype.str[1:]
    ]
    # NRRD sizes are fastest-axis-first; numpy C-order shape reversed
    sizes = " ".join(str(s) for s in arr.shape[::-1])
    head = f"NRRD0004\ntype: {tname}\ndimension: {arr.ndim}\nsizes: {sizes}\n"
    if arr.dtype.itemsize > 1:
        head += f"endian: {endian}\n"
    head += f"encoding: {encoding}\n\n"
    bo = ">" if endian == "big" else "<"
    raw = arr.astype(bo + arr.dtype.str[1:] if arr.dtype.itemsize > 1 else arr.dtype).tobytes()
    path.write_bytes(head.encode() + (gzip.compress(raw) if encoding == "gzip" else raw))
    return str(path)


def test_nrrd_raw_roundtrip(spark, tmp_path):
    arr = np.arange(24, dtype="<i2").reshape(4, 6) - 5
    url = make_nrrd(tmp_path / "a.nrrd", arr)
    rdr = NRRDReader(data=NRRD(url=url))
    df = rdr.read(spark=spark, rows_per_chunk=3)
    np.testing.assert_array_equal(_rebuild(df), arr)
    assert rdr.data.metadata["shape"] == [4, 6]


def test_nrrd_gzip_and_bigendian(spark, tmp_path):
    arr = (np.arange(12, dtype=">f4") / 3.0).reshape(3, 4)
    url = make_nrrd(tmp_path / "g.nrrd", arr, encoding="gzip", endian="big")
    df = NRRDReader(data=NRRD(url=url)).read(spark=spark, rows_per_chunk=2)
    np.testing.assert_allclose(_rebuild(df), arr.astype("<f8"))


def test_nrrd_unsupported_encoding(tmp_path, spark):
    p = tmp_path / "b.nrrd"
    p.write_bytes(b"NRRD0004\ntype: uint8\ndimension: 1\nsizes: 2\nencoding: bzip2\n\nxx")
    with pytest.raises(ValueError, match="encoding"):
        NRRDReader(data=NRRD(url=str(p))).read(spark=spark)


# --------------------------- DICOM -----------------------------------------

_LONG = {b"OB", b"OW", b"SQ", b"UT", b"UN"}


def _el_explicit(group, el, vr: bytes, data: bytes) -> bytes:
    if vr in _LONG:
        return struct.pack("<HH2sHI", group, el, vr, 0, len(data)) + data
    return struct.pack("<HH2sH", group, el, vr, len(data)) + data


def _el_implicit(group, el, data: bytes) -> bytes:
    return struct.pack("<HHI", group, el, len(data)) + data


def make_dicom(path, pixels: np.ndarray, implicit: bool = False, with_seq: bool = False) -> str:
    transfer = b"1.2.840.10008.1.2\x00" if implicit else b"1.2.840.10008.1.2.1\x00"
    meta = _el_explicit(0x0002, 0x0010, b"UI", transfer)
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))) + meta
    rows, cols = pixels.shape

    def E(group, elem, vr, data):
        return _el_implicit(group, elem, data) if implicit else _el_explicit(group, elem, vr, data)

    ds = E(0x0008, 0x0060, b"CS", b"CT")
    ds += E(0x0010, 0x0010, b"PN", b"Doe^Jane")
    if with_seq:  # undefined-length sequence the walk must skip
        item = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\x00" * 4
        endseq = struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        if implicit:
            ds += struct.pack("<HHI", 0x0008, 0x1140, 0xFFFFFFFF) + item + endseq
        else:
            ds += struct.pack("<HH2sHI", 0x0008, 0x1140, b"SQ", 0, 0xFFFFFFFF) + item + endseq
    ds += E(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    ds += E(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    ds += E(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    ds += E(0x0028, 0x0100, b"US", struct.pack("<H", pixels.dtype.itemsize * 8))
    ds += E(0x0028, 0x0103, b"US", struct.pack("<H", 1 if pixels.dtype.kind == "i" else 0))
    ds += E(0x7FE0, 0x0010, b"OW", pixels.astype(pixels.dtype.newbyteorder("<")).tobytes())
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + ds)
    return str(path)


@pytest.mark.parametrize("implicit", [False, True])
def test_dicom_pixel_roundtrip(spark, tmp_path, implicit):
    rng = np.random.default_rng(11)
    px = rng.integers(-1024, 3000, size=(16, 12), dtype=np.int16)
    url = make_dicom(tmp_path / f"d{implicit}.dcm", px, implicit=implicit, with_seq=True)
    rdr = DicomReader(data=DICOM(url=url))
    df = rdr.read(spark=spark, rows_per_chunk=5)
    np.testing.assert_array_equal(_rebuild(df), px)
    assert rdr.data.metadata["modality"] == "CT"
    assert rdr.data.metadata["patient_name"] == "Doe^Jane"
    assert rdr.data.metadata["rows"] == 16 and rdr.data.metadata["cols"] == 12


def test_dicom_compressed_transfer_rejected(tmp_path):
    px = np.zeros((2, 2), dtype=np.uint8)
    url = make_dicom(tmp_path / "c.dcm", px)
    blob = bytearray(open(url, "rb").read())
    # swap the transfer syntax UID for JPEG baseline (same length)
    old = b"1.2.840.10008.1.2.1\x00"
    new = b"1.2.840.10008.1.2.4\x00"
    idx = bytes(blob).find(old)
    blob[idx : idx + len(old)] = new
    p = tmp_path / "c2.dcm"
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="transfer syntax"):
        _dicom_meta(str(p))


def test_recommend_picks_nrrd_and_dicom(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_nrrd(tmp_path / "r.nrrd", np.zeros(3, dtype="u1"))
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("NRRD" in k for k in kinds)
    url = make_dicom(tmp_path / "r.dcm", np.zeros((2, 2), dtype=np.uint8))
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("DICOM" in k for k in kinds)


def _packbits_literal(data: bytes) -> bytes:
    """Valid PackBits using only literal runs (copy n+1 bytes)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _encapsulate(transfer: bytes, rows, cols, frames_payloads, bits=16, spp=1, signed=True):
    """Part 10 file with encapsulated PixelData: BOT item + one item per
    frame + sequence delimiter."""
    meta = _el_explicit(0x0002, 0x0010, b"UI", transfer)
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))) + meta
    ds = _el_explicit(0x0008, 0x0060, b"CS", b"MR")
    ds += _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", spp))
    if len(frames_payloads) > 1:
        ds += _el_explicit(0x0028, 0x0008, b"IS", str(len(frames_payloads)).encode())
    ds += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    ds += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    ds += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    ds += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0))
    # PixelData OB, undefined length
    ds += struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    ds += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty Basic Offset Table
    for payload in frames_payloads:
        if len(payload) % 2:
            payload += b"\x00"
        ds += struct.pack("<HHI", 0xFFFE, 0xE000, len(payload)) + payload
    ds += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    return b"\x00" * 128 + b"DICM" + meta + ds


def _rle_frame(px: np.ndarray) -> bytes:
    """DICOM RLE frame: segment header + MSB/LSB PackBits planes."""
    flat = px.astype(">i2" if px.dtype.kind == "i" else ">u2").tobytes()
    msb = _packbits_literal(flat[0::2])
    lsb = _packbits_literal(flat[1::2])
    if len(msb) % 2:
        msb += b"\x00"
    header = struct.pack("<16I", 2, 64, 64 + len(msb), *([0] * 13))
    return header + msb + lsb


def test_dicom_rle_lossless_roundtrip(spark, tmp_path):
    """RLE Lossless (1.2.840.10008.1.2.5): encapsulated frames decode
    with the package's own PackBits planes — bit-exact, incl. signed
    16-bit and multi-frame."""
    rng = np.random.default_rng(5)
    f0 = rng.integers(-2000, 3000, size=(6, 5), dtype=np.int16)
    f1 = rng.integers(-2000, 3000, size=(6, 5), dtype=np.int16)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.5\x00", 6, 5, [_rle_frame(f0), _rle_frame(f1)]
    )
    p = tmp_path / "rle.dcm"
    p.write_bytes(blob)
    rdr = DicomReader(data=DICOM(url=str(p)))
    df = rdr.read(spark=spark)
    got = _rebuild(df)
    np.testing.assert_array_equal(got, np.stack([f0, f1]))
    assert rdr.data.metadata["transfer_syntax"] == "1.2.840.10008.1.2.5"


def test_dicom_jpeg_baseline_frame(spark, tmp_path):
    """JPEG Baseline (1.2.840.10008.1.2.4.50): each fragment is a plain
    baseline JPEG decoded by the package's own DCT decoder."""
    from tests.test_jpeg import BW, make_gray_jpeg

    bw = BW()
    bw.dc(8 * (200 - 128))  # constant gray 200, 8x8
    bw.ac_eob()
    jpg = make_gray_jpeg(8, 8, bw.flush())
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.50\x00", 8, 8, [jpg], bits=8, signed=False
    )
    p = tmp_path / "jb.dcm"
    p.write_bytes(blob)
    df = DicomReader(data=DICOM(url=str(p))).read(spark=spark)
    got = _rebuild(df)
    assert got.shape[:2] == (8, 8)
    np.testing.assert_array_equal(got.reshape(8, 8), np.full((8, 8), 200.0))


def test_dicom_jpeg_extended_12bit_frame(spark, tmp_path):
    """JPEG Extended (1.2.840.10008.1.2.4.51): a 12-bit SOF1 fragment with
    a 16-bit quantization table decodes through the native DCT path."""
    from tests.test_jpeg_progressive import BW, _sof, _sos, _tables

    bw = BW()
    bw.dc_sym(3)
    bw.amp(5, 3)  # DC 5 · q 256 / 8 + 2048 = 2208
    bw.ac_sym(0x00)
    jpg = (
        b"\xff\xd8" + _tables(prec16=True)
        + _sof(0xC1, 8, 8, [(1, 0x11)], prec=12)
        + _sos([1], 0, 63, 0, 0) + bw.flush() + b"\xff\xd9"
    )
    # 12-bit pixels ride in BitsAllocated=16 containers (PS3.5 §8.1.1)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.51\x00", 8, 8, [jpg], bits=16, signed=False
    )
    p = tmp_path / "jx.dcm"
    p.write_bytes(blob)
    df = DicomReader(data=DICOM(url=str(p))).read(spark=spark)
    got = _rebuild(df)
    np.testing.assert_array_equal(got.reshape(8, 8), np.full((8, 8), 2208.0))


def test_dicom_jpeg_progressive_baseline_syntax(spark, tmp_path):
    """Real-world .4.50 files are sometimes progressive (encoders mislabel
    or use the extended family); the native SOF2 path now covers them."""
    from tests.test_jpeg_progressive import make_gray_progressive

    blocks = np.zeros((1, 1, 64), dtype=np.int64)
    blocks[0, 0, 0] = 8 * (150 - 128)
    jpg = make_gray_progressive(8, 8, blocks)
    blob = _encapsulate(
        b"1.2.840.10008.1.2.4.50\x00", 8, 8, [jpg], bits=8, signed=False
    )
    p = tmp_path / "jp.dcm"
    p.write_bytes(blob)
    df = DicomReader(data=DICOM(url=str(p))).read(spark=spark)
    got = _rebuild(df)
    np.testing.assert_array_equal(got.reshape(8, 8), np.full((8, 8), 150.0))


def test_dicom_unsupported_compressed_still_named(tmp_path):
    """An unknown compressed syntax still raises a NAMED error (the
    JPEG family root UID is not a concrete syntax)."""
    px = np.zeros((2, 2), dtype=np.uint8)
    url = make_dicom(tmp_path / "c.dcm", px)
    blob = bytearray(open(url, "rb").read())
    old = b"1.2.840.10008.1.2.1\x00"
    new = b"1.2.840.10008.1.2.4\x00"  # JPEG family root (not baseline .50)
    idx = bytes(blob).find(old)
    blob[idx : idx + len(old)] = new
    p = tmp_path / "c2.dcm"
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="not supported"):
        _dicom_meta(str(p))


def test_dicom_defined_length_compressed_rejected(tmp_path):
    """Regression (r6 review): a nonconformant RLE-syntax file with a
    DEFINED-length PixelData must raise, not silently reinterpret the
    compressed byte stream as raw little-endian samples."""
    from intake_spark.sci import _dicom_meta

    px = np.arange(4 * 4, dtype="<i2").reshape(4, 4)
    frame = _rle_frame(px)
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.5\x00")
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))) + meta
    ds = _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 4))
    ds += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 4))
    ds += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    if len(frame) % 2:
        frame += b"\x00"
    ds += struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, len(frame)) + frame
    p = tmp_path / "bad.dcm"
    p.write_bytes(b"\x00" * 128 + b"DICM" + meta + ds)
    with pytest.raises(ValueError, match="nonconformant"):
        _dicom_meta(str(p))


def test_dicom_bytes_writer_roundtrip(spark, tmp_path):
    """The product-side Part-10 writer (sci.dicom_bytes, the q136 store
    builder) round-trips through the real DicomReader for native
    Explicit-VR-LE and encapsulated JPEG-LS, single- and multi-frame;
    unsupported syntaxes stay loud."""
    import pytest as _pytest

    from intake_spark.sci import DICOM, DicomReader, dicom_bytes

    rng = np.random.default_rng(14)
    f0 = rng.integers(0, 1021, (9, 7)).astype(np.uint16)
    f1 = rng.integers(0, 1021, (9, 7)).astype(np.uint16)
    for ts in ("1.2.840.10008.1.2.1", "1.2.840.10008.1.2.4.80"):
        p = tmp_path / f"w_{ts[-2:]}.dcm"
        p.write_bytes(dicom_bytes([f0, f1], transfer_syntax=ts))
        got = _rebuild(DicomReader(data=DICOM(url=str(p))).read(spark=spark))
        np.testing.assert_array_equal(got, np.stack([f0, f1]), err_msg=ts)
    # 8-bit path picks BitsAllocated 8
    g = rng.integers(0, 200, (5, 6)).astype(np.uint16)
    p = tmp_path / "w8.dcm"
    p.write_bytes(dicom_bytes([g]))
    got = _rebuild(DicomReader(data=DICOM(url=str(p))).read(spark=spark))
    np.testing.assert_array_equal(got.reshape(5, 6), g)
    with _pytest.raises(ValueError, match="transfer syntax"):
        dicom_bytes([g], transfer_syntax="1.2.840.10008.1.2.4.50")


def test_dicom_bytes_mandatory_file_meta():
    """PS3.10 7.1 mandatory group-0002 elements are present, ascending,
    and inside the declared group length; SOP Class/Instance UIDs match
    between file meta and dataset; the instance UID is the
    registration-free 2.25.<decimal-uuid> form, deterministic per
    content (same frames -> byte-identical file)."""
    from intake_spark.sci import dicom_bytes

    f = (np.arange(20) % 7).astype(np.uint16).reshape(4, 5)
    blob = dicom_bytes([f])
    assert blob == dicom_bytes([f])  # deterministic
    body = blob[132:]
    # group length element
    grp, el, vr, ln = struct.unpack("<HH2sH", body[:8])
    assert (grp, el, vr) == (0x0002, 0x0000, b"UL")
    (meta_len,) = struct.unpack("<I", body[8:12])
    pos, elems = 12, []
    while pos < 12 + meta_len:
        grp, el, vr = struct.unpack("<HH2s", body[pos : pos + 6])
        assert grp == 0x0002
        if vr in (b"OB", b"OW", b"SQ", b"UN"):
            (ln,) = struct.unpack("<I", body[pos + 8 : pos + 12])
            val = body[pos + 12 : pos + 12 + ln]
            pos += 12 + ln
        else:
            (ln,) = struct.unpack("<H", body[pos + 6 : pos + 8])
            val = body[pos + 8 : pos + 8 + ln]
            pos += 8 + ln
        elems.append((el, vr, val))
    tags = [e[0] for e in elems]
    assert tags == sorted(tags)
    d = {e[0]: e for e in elems}
    assert d[0x0001][2] == b"\x00\x01"  # FileMetaInformationVersion
    sop_class = d[0x0002][2].rstrip(b"\x00")
    sop_inst = d[0x0003][2].rstrip(b"\x00")
    assert sop_class == b"1.2.840.10008.5.1.4.1.1.7"
    assert sop_inst.startswith(b"2.25.") and len(sop_inst) <= 64
    assert d[0x0010][2].rstrip(b"\x00") == b"1.2.840.10008.1.2.1"
    # dataset repeats the SOP pair (0008,0016)/(0008,0018)
    rest = body[12 + meta_len :]
    assert el_value(rest, 0x0008, 0x0016).rstrip(b"\x00") == sop_class
    assert el_value(rest, 0x0008, 0x0018).rstrip(b"\x00") == sop_inst


def el_value(buf: bytes, group: int, elem: int) -> bytes:
    """Scan an explicit-VR-LE element stream for (group,elem)."""
    pos = 0
    while pos + 8 <= len(buf):
        g, e, vr = struct.unpack("<HH2s", buf[pos : pos + 6])
        if vr in (b"OB", b"OW", b"SQ", b"UN"):
            (ln,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
            val, pos = buf[pos + 12 : pos + 12 + ln], pos + 12 + ln
        else:
            (ln,) = struct.unpack("<H", buf[pos + 6 : pos + 8])
            val, pos = buf[pos + 8 : pos + 8 + ln], pos + 8 + ln
        if (g, e) == (group, elem):
            return val
    raise KeyError((hex(group), hex(elem)))
