"""E57 point-cloud container: header + CRC-paged XML section walk
(fixture built from the ASTM E2807 layout: 48-byte header, 1024-byte
physical pages each ending in a 4-byte CRC word)."""

from __future__ import annotations

import struct

import pytest

PAGE = 1024

XML = """<?xml version="1.0" encoding="UTF-8"?>
<e57Root xmlns="http://www.astm.org/COMMIT/E57/2010-e57-v1.0" type="Structure">
  <formatName type="String"><![CDATA[ASTM E57 3D Imaging Data File]]></formatName>
  <data3D type="Vector" allowHeterogeneousChildren="1">
    <vectorChild type="Structure">
      <name type="String"><![CDATA[scan-alpha]]></name>
      <points type="CompressedVector" fileOffset="2048" recordCount="12345">
        <prototype type="Structure">
          <cartesianX type="Float"/>
          <cartesianY type="Float"/>
          <cartesianZ type="Float"/>
          <intensity type="Integer" minimum="0" maximum="255"/>
        </prototype>
      </points>
      <cartesianBounds type="Structure">
        <xMinimum type="Float">-1.5</xMinimum>
        <xMaximum type="Float">2.5</xMaximum>
        <yMinimum type="Float">0.0</yMinimum>
        <yMaximum type="Float">10.0</yMaximum>
        <zMinimum type="Float">-0.25</zMinimum>
        <zMaximum type="Float">0.75</zMaximum>
      </cartesianBounds>
    </vectorChild>
    <vectorChild type="Structure">
      <name type="String"><![CDATA[scan-beta]]></name>
      <points type="CompressedVector" fileOffset="4096" recordCount="77"/>
    </vectorChild>
  </data3D>
</e57Root>
"""


def _paged(logical: bytes, start_page: int) -> bytes:
    """Lay logical bytes into PAGE-byte pages (payload PAGE-4 + dummy CRC)."""
    out = bytearray()
    payload = PAGE - 4
    for i in range(0, len(logical), payload):
        chunk = logical[i : i + payload]
        chunk = chunk + b"\x00" * (payload - len(chunk))
        out += chunk + b"\xde\xad\xbe\xef"
    return bytes(out)


@pytest.fixture()
def e57_file(tmp_path):
    xml = XML.encode()
    # header page (page 0) is payload too; put XML from page 1 onward
    xml_phys_offset = PAGE  # start of page 1 == physical offset 1024
    body = _paged(xml, 1)
    total = PAGE + len(body)
    hdr = b"ASTM-E57" + struct.pack("<II", 1, 0) + struct.pack(
        "<QQQQ", total, xml_phys_offset, len(xml), PAGE
    )
    page0 = hdr + b"\x00" * (PAGE - 4 - len(hdr)) + b"\x00\x00\x00\x00"
    path = tmp_path / "cloud.e57"
    path.write_bytes(page0 + body)
    return str(path)


def test_e57_meta_reader(spark, e57_file):
    from intake_spark.sci import E57, E57MetaReader

    rdr = E57MetaReader(data=E57(url=e57_file))
    rows = {r.scan_idx: r for r in rdr.read(spark=spark).collect()}
    assert len(rows) == 2
    a = rows[0]
    assert a.name == "scan-alpha" and a.record_count == 12345
    assert a.file_offset == 2048
    assert a.proto_fields == ["cartesianX", "cartesianY", "cartesianZ", "intensity"]
    assert a.x_min == -1.5 and a.z_max == 0.75
    b = rows[1]
    assert b.name == "scan-beta" and b.record_count == 77 and b.x_min is None
    assert rdr.data.metadata["version"] == "1.0"
    assert rdr.data.metadata["page_size"] == PAGE


def test_e57_xml_spans_pages(spark, tmp_path):
    """XML longer than one page payload must reassemble across the CRC
    boundaries exactly."""
    from intake_spark.sci import E57, E57MetaReader

    pad = "".join(
        f'<vectorChild type="Structure"><name type="String">'
        f"<![CDATA[s{i:04d}]]></name>"
        f'<points type="CompressedVector" fileOffset="0" recordCount="{i}"/>'
        f"</vectorChild>"
        for i in range(40)
    )
    xml = (
        '<?xml version="1.0"?><e57Root '
        'xmlns="http://www.astm.org/COMMIT/E57/2010-e57-v1.0" type="Structure">'
        f'<data3D type="Vector">{pad}</data3D></e57Root>'
    ).encode()
    assert len(xml) > 3 * (PAGE - 4)
    body = _paged(xml, 1)
    hdr = b"ASTM-E57" + struct.pack("<II", 1, 0) + struct.pack(
        "<QQQQ", PAGE + len(body), PAGE, len(xml), PAGE
    )
    page0 = hdr + b"\x00" * (PAGE - 4 - len(hdr)) + b"\x00\x00\x00\x00"
    p = tmp_path / "big.e57"
    p.write_bytes(page0 + body)
    rows = E57MetaReader(data=E57(url=str(p))).read(spark=spark).collect()
    assert len(rows) == 40
    assert {r.record_count for r in rows} == set(range(40))


def test_e57_recommend(e57_file):
    from intake_spark import datatypes as dt

    with open(e57_file, "rb") as f:
        head = f.read(64)
    got = dt.recommend(url=e57_file, head=head)
    assert any(c.__name__ == "E57" for c in got)


def _phys(logical: int) -> int:
    return (logical // (PAGE - 4)) * PAGE + (logical % (PAGE - 4))


def _pack_bits(vals, w: int) -> bytes:
    big = 0
    mask = (1 << w) - 1
    for j, v in enumerate(vals):
        big |= (int(v) & mask) << (j * w)
    nbytes = (len(vals) * w + 7) // 8
    return big.to_bytes(nbytes, "little") if nbytes else b""


def _data_packet(bufs) -> bytes:
    body = struct.pack("<H", len(bufs))
    body += b"".join(struct.pack("<H", len(b)) for b in bufs)
    body += b"".join(bufs)
    plen = 4 + len(body)
    pad = (-plen) % 4
    return struct.pack("<BBH", 1, 0, plen + pad - 1) + body + b"\x00" * pad


def _e57_string_stream(strings) -> bytes:
    """String bytestream: per record the low-bit-flagged length prefix
    (1 byte, bit0=0, len=b>>1 for 0..127; else 8 LE bytes, bit0=1,
    len=u64>>1) + UTF-8 bytes — the libE57Format coding the decoder
    implements."""
    out = bytearray()
    for s in strings:
        b = s.encode()
        if len(b) <= 127:
            out.append(len(b) << 1)
        else:
            out += ((len(b) << 1) | 1).to_bytes(8, "little")
        out += b
    return bytes(out)


def _points_e57(tmp_path, scans):
    """Full E57 with CompressedVector sections: scans is a list of
    {field name: values} dicts (cartesianX ScaledInteger 0.01, intensity
    Integer 0..255, cartesianY Float single, classification constant 5,
    optional label String). Each field's bitstream is split across TWO
    data packets at an odd byte so values span the packet boundary,
    with an empty packet between them."""
    import numpy as np

    with_label = any("label" in vals for vals in scans)
    logical = bytearray(b"\x00" * 48)  # header placeholder
    sections = []
    for vals in scans:
        sec_start = len(logical)
        x_raw = [round(v / 0.01) + 1000 for v in vals["cartesianX"]]
        bufs = [
            _pack_bits(x_raw, 11),
            np.asarray(vals["cartesianY"], dtype="<f4").tobytes(),
            _pack_bits(vals["intensity"], 8),
            b"",  # classification: 0-bit constant field
        ]
        cut = [7, 21, 13, 0]
        if with_label:
            bufs.append(_e57_string_stream(vals["label"]))
            cut.append(9)  # split inside a record's UTF-8 bytes
        pk1 = _data_packet([b[:c] for b, c in zip(bufs, cut)])
        pk_empty = struct.pack("<BBH", 2, 0, 3)
        pk2 = _data_packet([b[c:] for b, c in zip(bufs, cut)])
        packets = pk1 + pk_empty + pk2
        sec_len = 32 + len(packets)
        data_phys = _phys(sec_start + 32)
        sec_head = bytes([1]) + b"\x00" * 7 + struct.pack(
            "<QQQ", sec_len, data_phys, 0
        )
        logical += sec_head + packets
        while len(logical) % 4:
            logical += b"\x00"
        sections.append((sec_start, len(vals["cartesianX"])))
    label_xml = '<label type="String"/>' if with_label else ""
    scans_xml = "".join(
        f'<vectorChild type="Structure">'
        f'<name type="String"><![CDATA[scan-{i}]]></name>'
        f'<points type="CompressedVector" fileOffset="{_phys(off)}" '
        f'recordCount="{rc}">'
        '<prototype type="Structure">'
        '<cartesianX type="ScaledInteger" minimum="-1000" maximum="1000" '
        'scale="0.01" offset="0"/>'
        '<cartesianY type="Float" precision="single"/>'
        '<intensity type="Integer" minimum="0" maximum="255"/>'
        '<classification type="Integer" minimum="5" maximum="5"/>'
        f"{label_xml}"
        "</prototype></points></vectorChild>"
        for i, (off, rc) in enumerate(sections)
    )
    xml = (
        '<?xml version="1.0"?><e57Root '
        'xmlns="http://www.astm.org/COMMIT/E57/2010-e57-v1.0" '
        f'type="Structure"><data3D type="Vector">{scans_xml}</data3D>'
        "</e57Root>"
    ).encode()
    xml_off = _phys(len(logical))
    xml_len = len(xml)
    logical += xml
    body = _paged(bytes(logical), 0)
    hdr = b"ASTM-E57" + struct.pack("<II", 1, 0) + struct.pack(
        "<QQQQ", len(body), xml_off, xml_len, PAGE
    )
    body = hdr + body[48:]
    p = tmp_path / "points.e57"
    p.write_bytes(body)
    return str(p)


def test_e57_points_decode(spark, tmp_path):
    """CompressedVector point decode: ScaledInteger/Float/Integer and a
    0-bit constant field, values spanning data-packet boundaries, an
    empty packet mid-stream, and two scans decoded in parallel."""
    import numpy as np

    from intake_spark.sci import E57, E57PointsReader

    rng = np.random.default_rng(3)
    scans = []
    for n in (50, 23):
        scans.append({
            "cartesianX": np.round(rng.uniform(-9, 9, n), 2).tolist(),
            "cartesianY": np.asarray(
                rng.uniform(-5, 5, n), dtype="<f4"
            ).astype(float).tolist(),
            "intensity": rng.integers(0, 256, n).tolist(),
        })
    url = _points_e57(tmp_path, scans)
    df = E57PointsReader(data=E57(url=url)).read(spark=spark)
    assert df.columns == [
        "scan_idx", "cartesianX", "cartesianY", "intensity", "classification"
    ]
    got = df.toPandas().sort_values(
        ["scan_idx"], kind="stable"
    ).reset_index(drop=True)
    assert len(got) == 73
    for i, vals in enumerate(scans):
        g = got[got.scan_idx == i]
        np.testing.assert_allclose(
            g["cartesianX"].to_numpy(), vals["cartesianX"], atol=1e-9
        )
        np.testing.assert_allclose(
            g["cartesianY"].to_numpy(),
            np.asarray(vals["cartesianY"], dtype="<f4").astype(float),
        )
        np.testing.assert_array_equal(
            g["intensity"].to_numpy(), vals["intensity"]
        )
        assert (g["classification"] == 5).all()
    # scan_idx selection
    one = E57PointsReader(data=E57(url=url)).read(spark=spark, scan_idx=1)
    assert one.count() == 23


def test_e57_unpack_bits_paths_agree():
    """Review finding: the vectorized w<=56 unpack must match the exact
    big-int path (and be the one used — the big-int form is O(n^2))."""
    import numpy as np

    from intake_spark.sci import _e57_unpack_bits

    rng = np.random.default_rng(4)
    for w in (1, 3, 8, 11, 24, 33, 56):
        vals = rng.integers(0, 1 << min(w, 62), 257, dtype=np.int64)
        big = 0
        for j, v in enumerate(vals.tolist()):
            big |= (int(v) & ((1 << w) - 1)) << (j * w)
        s = big.to_bytes((257 * w + 7) // 8, "little")
        got = _e57_unpack_bits(s, 257, w)
        np.testing.assert_array_equal(got, vals & ((1 << w) - 1))
    # wide path (>56 bits) still exact
    vals = rng.integers(0, 1 << 62, 31, dtype=np.int64)
    w = 60
    big = 0
    for j, v in enumerate(vals.tolist()):
        big |= (int(v) & ((1 << w) - 1)) << (j * w)
    s = big.to_bytes((31 * w + 7) // 8, "little")
    np.testing.assert_array_equal(
        _e57_unpack_bits(s, 31, w), vals & ((1 << w) - 1)
    )


def test_e57_points_string_field(spark, tmp_path):
    """String fields inside a point prototype decode: low-bit-flagged
    1- and 8-byte length prefixes, empty strings, multi-byte UTF-8, a
    record split across data-packet boundaries; a truncated stream and
    an unknown prototype node stay loud."""
    import numpy as np

    from intake_spark.sci import E57, E57PointsReader, _e57_decode_strings

    rng = np.random.default_rng(8)
    n = 9
    labels = [
        "", "a", "tree", "λαμπρός", "x" * 127,  # 1-byte prefixes
        "y" * 128, "z" * 300,                    # 8-byte prefixes
        "ground", "végét",
    ]
    scans = [{
        "cartesianX": np.round(rng.uniform(-9, 9, n), 2).tolist(),
        "cartesianY": np.asarray(
            rng.uniform(-5, 5, n), dtype="<f4").astype(float).tolist(),
        "intensity": rng.integers(0, 256, n).tolist(),
        "label": labels,
    }]
    url = _points_e57(tmp_path, scans)
    df = E57PointsReader(data=E57(url=url)).read(spark=spark)
    assert dict(df.dtypes)["label"] == "string"
    got = df.toPandas()
    assert got["label"].tolist() == labels
    np.testing.assert_array_equal(
        got["intensity"].to_numpy(), scans[0]["intensity"]
    )
    # loud failures: exhausted stream / length past the buffer
    with pytest.raises(ValueError, match="exhausted"):
        _e57_decode_strings(b"\x02a", 2, "label")
    with pytest.raises(ValueError, match="runs past"):
        _e57_decode_strings(b"\x08abc", 1, "label")
    with pytest.raises(ValueError, match="truncated 8-byte"):
        _e57_decode_strings(b"\x01\x00\x00", 1, "label")


def test_e57_prototype_structure_gate():
    """Structure/Vector nodes inside a prototype stay a loud gate (they
    are not point data); String no longer trips it."""
    import xml.etree.ElementTree as ET

    from intake_spark.sci import _e57_prototype

    scan = ET.fromstring(
        '<vectorChild type="Structure">'
        '<points type="CompressedVector" fileOffset="0" recordCount="1">'
        '<prototype type="Structure">'
        '<pose type="Structure"/>'
        "</prototype></points></vectorChild>"
    )
    with pytest.raises(NotImplementedError, match="Structure"):
        _e57_prototype(scan)
