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


def test_e57_points_gate_and_recommend(e57_file):
    from intake_spark import datatypes as dt
    from intake_spark.sci import E57, E57PointsReader

    with pytest.raises(NotImplementedError, match="CompressedVector"):
        E57PointsReader(data=E57(url=e57_file)).read(spark=None)

    with open(e57_file, "rb") as f:
        head = f.read(64)
    got = dt.recommend(url=e57_file, head=head)
    assert any(c.__name__ == "E57" for c in got)
