"""Legacy .xls reader against hand-built OLE2/CFB + BIFF8 fixtures:
mini-stream and regular-FAT container paths, SST CONTINUE character
spans, RK/MULRK/NUMBER/LABELSST/BOOLERR cells."""

from __future__ import annotations

import struct

import pytest

END, FREE, FATSECT = 0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFD


def _dir_entry(name: str, etype: int, start: int, size: int) -> bytes:
    raw = name.encode("utf-16-le")
    e = bytearray(128)
    e[: len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw) + 2)
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, FREE, FREE, FREE)  # no tree links
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _make_cfb(streams: dict[str, bytes]) -> bytes:
    """Minimal [MS-CFB] v3 file: one FAT sector, one directory sector,
    mini streams (<4096) in a root mini stream with one miniFAT sector,
    larger streams in regular chains."""
    ssz = 512
    minis = {n: b for n, b in streams.items() if len(b) < 4096}
    regs = {n: b for n, b in streams.items() if len(b) >= 4096}

    # mini stream assembly (64-byte mini sectors)
    mini_chunks, minifat, mini_starts = [], [], {}
    for n, b in minis.items():
        nsec = (len(b) + 63) // 64
        mini_starts[n] = len(minifat)
        for i in range(nsec):
            mini_chunks.append(b[i * 64 : (i + 1) * 64].ljust(64, b"\x00"))
            minifat.append(len(minifat) + 1 if i < nsec - 1 else END)
    ministream = b"".join(mini_chunks)

    # sector plan: s0 FAT | s1 directory | s2 miniFAT | ministream | regs
    sectors: list[bytes] = [b"", b"", b""]
    fat: list[int] = [FATSECT, END, END]  # dir & minifat are 1-sector chains

    mini_first = END
    if ministream:
        mini_first = len(sectors)
        nsec = (len(ministream) + ssz - 1) // ssz
        for i in range(nsec):
            sectors.append(ministream[i * ssz : (i + 1) * ssz].ljust(ssz, b"\x00"))
            fat.append(len(fat) + 1 if i < nsec - 1 else END)

    reg_starts = {}
    for n, b in regs.items():
        reg_starts[n] = len(sectors)
        nsec = (len(b) + ssz - 1) // ssz
        for i in range(nsec):
            sectors.append(b[i * ssz : (i + 1) * ssz].ljust(ssz, b"\x00"))
            fat.append(len(fat) + 1 if i < nsec - 1 else END)

    entries = [_dir_entry("Root Entry", 5, mini_first, len(ministream))]
    for n in streams:
        start = mini_starts[n] if n in minis else reg_starts[n]
        entries.append(_dir_entry(n, 2, start, len(streams[n])))
    sectors[1] = b"".join(entries).ljust(ssz, b"\x00")
    sectors[2] = (
        b"".join(struct.pack("<I", v) for v in minifat).ljust(ssz, b"\xff")
        if minifat
        else b"\xff" * ssz
    )
    sectors[0] = b"".join(
        struct.pack("<I", v) for v in fat + [FREE] * (ssz // 4 - len(fat))
    )

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", hdr, 24, 0x3E)      # minor
    struct.pack_into("<H", hdr, 26, 3)         # major
    struct.pack_into("<H", hdr, 28, 0xFFFE)    # byte order
    struct.pack_into("<H", hdr, 30, 9)         # sector shift
    struct.pack_into("<H", hdr, 32, 6)         # mini shift
    struct.pack_into("<I", hdr, 44, 1)         # n FAT sectors
    struct.pack_into("<I", hdr, 48, 1)         # first dir sector
    struct.pack_into("<I", hdr, 56, 4096)      # mini cutoff
    struct.pack_into("<I", hdr, 60, 2 if minifat else END)
    struct.pack_into("<I", hdr, 64, 1 if minifat else 0)
    struct.pack_into("<I", hdr, 68, END)       # first DIFAT
    struct.pack_into("<I", hdr, 72, 0)
    difat = [0] + [FREE] * 108
    struct.pack_into("<109I", hdr, 76, *difat)
    return bytes(hdr) + b"".join(sectors)


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt_: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt_, 0x0DBB, 0x07CC, 0, 0))


def _sst_plain(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        e = s.encode("latin-1")
        body += struct.pack("<HB", len(e), 0) + e
    return _rec(0x00FC, body)


def _labelsst(row: int, col: int, isst: int) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", row, col, 0, isst))


def _number(row: int, col: int, v: float) -> bytes:
    return _rec(0x0203, struct.pack("<HHH", row, col, 0) + struct.pack("<d", v))


def _rk_int(v: int, cents: bool = False) -> int:
    return ((v << 2) | 2 | (1 if cents else 0)) & 0xFFFFFFFF


def _rk(row: int, col: int, rk: int) -> bytes:
    return _rec(0x027E, struct.pack("<HHHI", row, col, 0, rk))


def _make_xls(strings, sheet_cells, pad_rows: int = 0) -> bytes:
    """One-sheet BIFF8 workbook. ``sheet_cells``: list of record bytes."""
    sheet = _bof(0x0010) + b"".join(sheet_cells)
    for r in range(pad_rows):  # bulk NUMBERs to push past the mini cutoff
        sheet += _number(100 + r, 0, float(r))
    sheet += _rec(0x000A, b"")
    # globals with a placeholder BOUNDSHEET offset, then patch
    name = b"Sheet1"
    bs_payload = struct.pack("<IBB", 0, 0, 0) + bytes([len(name), 0]) + name
    globals_ = _bof(0x0005) + _sst_plain(strings) + _rec(0x0085, bs_payload) + _rec(0x000A, b"")
    bs_off = len(globals_) - len(_rec(0x000A, b"")) - len(_rec(0x0085, bs_payload))
    wb = bytearray(globals_ + sheet)
    struct.pack_into("<I", wb, bs_off + 4, len(globals_))
    return bytes(wb)


def _basic_cells():
    return [
        _labelsst(0, 0, 0), _labelsst(0, 1, 1), _labelsst(0, 2, 2),
        _labelsst(0, 3, 5),  # header: name qty price ok
        _labelsst(1, 0, 3), _rk(1, 1, _rk_int(7)), _number(1, 2, 12.5),
        _rec(0x0205, struct.pack("<HHHBB", 1, 3, 0, 1, 0)),   # TRUE
        _labelsst(2, 0, 4), _rk(2, 1, _rk_int(1234, cents=True)),
        _number(2, 2, 99.0),
        _rec(0x0205, struct.pack("<HHHBB", 2, 3, 0, 0, 0)),   # FALSE
    ]


def _check_basic(spark, path):
    from intake_spark.documents import XLS, XLSReader

    rdr = XLSReader(data=XLS(url=str(path)))
    df = rdr.read(spark=spark)
    rows = {r.name: r for r in df.collect()}
    assert rows["alpha"].qty == 7.0 and rows["alpha"].price == 12.5
    assert rows["alpha"].ok is True
    assert abs(rows["beta"].qty - 12.34) < 1e-9
    assert rows["beta"].price == 99.0 and rows["beta"].ok is False
    assert rdr.data.metadata["sheets"] == ["Sheet1"]


def test_xls_ministream_path(spark, tmp_path):
    wb = _make_xls(["name", "qty", "price", "alpha", "beta", "ok"], _basic_cells())
    assert len(wb) < 4096
    p = tmp_path / "small.xls"
    p.write_bytes(_make_cfb({"Workbook": wb}))
    _check_basic(spark, p)
    from intake_spark.datatypes import recommend

    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__
             for c in recommend(str(p))]
    assert "XLS" in kinds


def test_xls_regular_fat_path(spark, tmp_path):
    wb = _make_xls(["name", "qty", "price", "alpha", "beta", "ok"], _basic_cells(),
                   pad_rows=400)
    assert len(wb) >= 4096
    p = tmp_path / "big.xls"
    p.write_bytes(_make_cfb({"Workbook": wb}))
    _check_basic(spark, p)


def test_xls_sst_continue_span(spark, tmp_path):
    """A long SST string split across SST/CONTINUE with a fresh flags
    byte at the continuation start (the [MS-XLS] 2.5.293 rule)."""
    long = "x" * 40
    head = struct.pack("<II", 3, 3)
    head += struct.pack("<HB", 4, 0) + b"name"
    head += struct.pack("<HB", len(long), 0) + long[:10].encode()
    cont = bytes([0]) + long[10:].encode()          # flags byte + rest
    cont += struct.pack("<HB", 5, 0) + b"value"     # new string, no flags
    sst = _rec(0x00FC, head) + _rec(0x003C, cont)

    name = b"Sheet1"
    bs_payload = struct.pack("<IBB", 0, 0, 0) + bytes([len(name), 0]) + name
    globals_ = _bof(0x0005) + sst + _rec(0x0085, bs_payload) + _rec(0x000A, b"")
    sheet = _bof(0x0010) + b"".join(
        [_labelsst(0, 0, 0), _labelsst(0, 1, 2),
         _labelsst(1, 0, 1), _number(1, 1, 1.0)]
    ) + _rec(0x000A, b"")
    bs_off = len(globals_) - len(_rec(0x000A, b"")) - len(_rec(0x0085, bs_payload))
    wb = bytearray(globals_ + sheet)
    struct.pack_into("<I", wb, bs_off + 4, len(globals_))

    p = tmp_path / "cont.xls"
    p.write_bytes(_make_cfb({"Workbook": bytes(wb)}))
    from intake_spark.documents import XLS, XLSReader

    df = XLSReader(data=XLS(url=str(p))).read(spark=spark)
    r = df.collect()[0]
    assert r.name == long
    assert r.value == 1.0


def test_xls_bad_container_raises(tmp_path):
    from intake_spark.documents import XLS, XLSReader, _cfb_streams

    with pytest.raises(ValueError, match="compound file"):
        _cfb_streams(b"not ole2" * 64)
    p = tmp_path / "nostream.xls"
    p.write_bytes(_make_cfb({"Other": b"\x00" * 100}))
    with pytest.raises(ValueError, match="Workbook"):
        XLSReader(data=XLS(url=str(p))).read(spark=None)


# --- ODS -----------------------------------------------------------------


def _make_ods(rows) -> bytes:
    """Spec-built minimal ODS: zip with content.xml table cells."""
    import io
    import zipfile

    def cell(v):
        if v is None:
            return '<table:table-cell/>'
        if isinstance(v, bool):
            b = "true" if v else "false"
            return (f'<table:table-cell office:value-type="boolean" '
                    f'office:boolean-value="{b}"><text:p>{v}</text:p></table:table-cell>')
        if isinstance(v, (int, float)):
            return (f'<table:table-cell office:value-type="float" '
                    f'office:value="{v}"><text:p>{v}</text:p></table:table-cell>')
        return (f'<table:table-cell office:value-type="string">'
                f'<text:p>{v}</text:p></table:table-cell>')

    body = "".join(
        "<table:table-row>" + "".join(cell(v) for v in row) + "</table:table-row>"
        for row in rows
    )
    xml = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet>'
        f'<table:table table:name="S1">{body}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", xml)
    return buf.getvalue()


def test_ods_reader(spark, tmp_path):
    from intake_spark.documents import ODS, ODSReader

    p = tmp_path / "t.ods"
    p.write_bytes(
        _make_ods(
            [
                ["name", "qty", "ok"],
                ["alpha", 7.5, True],
                ["beta", -2.0, False],
                ["gamma", None, True],
            ]
        )
    )
    rdr = ODSReader(data=ODS(url=str(p)))
    df = rdr.read(spark=spark)
    rows = {r.name: r for r in df.collect()}
    assert rows["alpha"].qty == 7.5 and rows["alpha"].ok is True
    assert rows["beta"].qty == -2.0 and rows["beta"].ok is False
    assert rows["gamma"].qty is None
    assert rdr.data.metadata["sheet"] == "S1"
    import pytest as _pytest

    with _pytest.raises(IndexError):
        rdr.read(spark=spark, sheet_index=5)


def test_ods_number_rows_repeated_expands(spark, tmp_path):
    """LibreOffice run-length-encodes consecutive identical ROWS
    (table:number-rows-repeated) — including identical data rows, which
    must expand, not silently collapse to one."""
    import io
    import zipfile

    cell_n = ('<table:table-cell office:value-type="float" '
              'office:value="{v}"><text:p>{v}</text:p></table:table-cell>')
    cell_s = ('<table:table-cell office:value-type="string">'
              '<text:p>{v}</text:p></table:table-cell>')
    body = (
        "<table:table-row>" + cell_s.format(v="name") + cell_s.format(v="qty")
        + "</table:table-row>"
        + '<table:table-row table:number-rows-repeated="3">'
        + cell_s.format(v="dup") + cell_n.format(v="1.5") + "</table:table-row>"
        + "<table:table-row>" + cell_s.format(v="tail") + cell_n.format(v="9")
        + "</table:table-row>"
    )
    xml = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet>'
        f'<table:table table:name="S1">{body}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", xml)
    p = tmp_path / "rep.ods"
    p.write_bytes(buf.getvalue())

    from intake_spark.documents import ODS, ODSReader

    rows = ODSReader(data=ODS(url=str(p))).read(spark=spark).collect()
    assert len(rows) == 4
    assert sum(1 for r in rows if r.name == "dup" and r.qty == 1.5) == 3
    assert sum(1 for r in rows if r.name == "tail") == 1


def test_cfb_v4_sector_offsets():
    """MS-CFB: sector n lives at (n+1)*sector_size. A version-4 file
    (4096-byte sectors) must not be read with the v3 512-byte header
    offset."""
    from intake_spark.documents import _cfb_streams

    ssz = 4096
    # header sector padded to 4096, then sector 0 = FAT, sector 1 = dir,
    # sector 2 = stream data
    header = bytearray(512)
    header[0:8] = bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1])
    import struct as _s

    _s.pack_into("<H", header, 26, 4)       # major version 4
    _s.pack_into("<H", header, 30, 12)      # sector shift -> 4096
    _s.pack_into("<I", header, 44, 1)       # one FAT sector
    _s.pack_into("<I", header, 48, 1)       # first directory sector = 1
    _s.pack_into("<I", header, 56, 16)      # mini cutoff (payload uses FAT)
    _s.pack_into("<I", header, 60, 0xFFFFFFFE)  # no minifat
    _s.pack_into("<I", header, 68, 0xFFFFFFFE)  # no difat chain
    _s.pack_into("<I", header, 76, 0)       # DIFAT[0] -> FAT at sector 0
    # remaining DIFAT entries = FREE
    for i in range(1, 109):
        _s.pack_into("<I", header, 76 + 4 * i, 0xFFFFFFFF)

    fat = bytearray(ssz)
    for i, v in enumerate([0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE]):  # FAT, dir end, stream end
        _s.pack_into("<I", fat, i * 4, v)
    for i in range(3, ssz // 4):
        _s.pack_into("<I", fat, i * 4, 0xFFFFFFFF)

    def dirent(name, typ, start, size):
        e = bytearray(128)
        nm = name.encode("utf-16-le")
        e[0 : len(nm)] = nm
        _s.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = typ
        _s.pack_into("<I", e, 116, start)
        _s.pack_into("<Q", e, 120, size)
        return bytes(e)

    payload = b"HELLO-V4" * 4
    directory = bytearray(ssz)
    directory[0:128] = dirent("Root Entry", 5, 0xFFFFFFFE, 0)
    directory[128:256] = dirent("Book", 2, 2, len(payload))

    stream_sec = bytearray(ssz)
    stream_sec[: len(payload)] = payload

    blob = bytes(header) + bytes(3584) + bytes(fat) + bytes(directory) + bytes(stream_sec)
    streams = _cfb_streams(blob)
    assert streams["Book"][: len(payload)] == payload
