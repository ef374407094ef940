"""BigWigReader vs spec-built bbi fixtures (pyBigWig absent): 64-byte
header, chromosome B+ tree, R-tree index, bedGraph/varStep/fixedStep
sections, compressed and raw."""

from __future__ import annotations

import struct
import zlib

import pytest

from intake_spark.bio import BigWig, BigWigReader, _bw_decode_block


def _section(chrom_id: int, btype: int, items, step: int = 0, span: int = 1) -> bytes:
    if btype == 1:
        start, end = items[0][0], items[-1][1]
        body = b"".join(struct.pack("<IIf", s, e, v) for s, e, v in items)
    elif btype == 2:
        start, end = items[0][0], items[-1][0] + span
        body = b"".join(struct.pack("<If", s, v) for s, v in items)
    else:
        start = items[0]
        end = start + step * len(items[1:]) + span
        body = b"".join(struct.pack("<f", v) for v in items[1:])
        items = items[1:]
    head = struct.pack("<IIIIIBBH", chrom_id, start, end, step, span, btype, 0, len(items))
    return head + body


def make_bigwig(path, chroms: dict[str, int], sections: list[bytes], compress: bool) -> str:
    """Assemble: header @0, chrom B+ tree @64, data blocks, R-tree index."""
    key_size = max(len(n) for n in chroms)
    # chrom B+ tree: 32-byte header + one leaf node
    ct = struct.pack("<4I", 0x78CA8C91, 1, key_size, 8)
    ct += struct.pack("<QQ", len(chroms), 0)
    ct += struct.pack("<BBH", 1, 0, len(chroms))
    for cid, (name, size) in enumerate(sorted(chroms.items())):
        ct += name.encode().ljust(key_size, b"\x00") + struct.pack("<II", cid, size)
    data_off = 64 + len(ct)
    blocks = [zlib.compress(s) if compress else s for s in sections]
    offs = []
    cur = data_off
    for b in blocks:
        offs.append(cur)
        cur += len(b)
    index_off = cur
    # R-tree: 48-byte header + one leaf node covering everything
    rt = struct.pack("<IIQ", 0x2468ACE0, 256, len(blocks))
    rt += struct.pack("<4I", 0, 0, len(chroms) - 1, 1 << 29)
    rt += struct.pack("<QII", index_off, 512, 0)
    rt += struct.pack("<BBH", 1, 0, len(blocks))
    for (off, blk) in zip(offs, blocks):
        rt += struct.pack("<4I", 0, 0, len(chroms) - 1, 1 << 29)
        rt += struct.pack("<QQ", off, len(blk))
    hdr = struct.pack(
        "<IHHQQQHHQQIQ",
        0x888FFC26, 4, 0, 64, data_off, index_off, 0, 0, 0, 0,
        (1 << 16) if compress else 0, 0,
    )
    assert len(hdr) == 64
    path.write_bytes(hdr + ct + b"".join(blocks) + rt)
    return str(path)


@pytest.mark.parametrize("compress", [True, False])
def test_bigwig_all_section_types(spark, tmp_path, compress):
    secs = [
        _section(0, 1, [(10, 20, 0.5), (20, 35, 1.5)]),            # bedGraph
        _section(0, 2, [(100, 2.0), (130, 2.5)], span=5),          # varStep
        _section(1, 3, [1000, 7.0, 8.0, 9.0], step=10, span=10),   # fixedStep
    ]
    url = make_bigwig(
        tmp_path / f"x_{compress}.bw", {"chr1": 10_000, "chr2": 5_000}, secs, compress
    )
    rdr = BigWigReader(data=BigWig(url=url))
    rows = sorted(
        ((r.chrom, r.start, r.end, round(r.value, 4)) for r in rdr.read(spark=spark).collect())
    )
    assert rows == [
        ("chr1", 10, 20, 0.5),
        ("chr1", 20, 35, 1.5),
        ("chr1", 100, 105, 2.0),
        ("chr1", 130, 135, 2.5),
        ("chr2", 1000, 1010, 7.0),
        ("chr2", 1010, 1020, 8.0),
        ("chr2", 1020, 1030, 9.0),
    ]
    assert rdr.data.metadata["chroms"] == ["chr1", "chr2"]
    assert rdr.data.metadata["n_blocks"] == 3


def test_bigwig_bad_magic_and_bigbed_rejected(spark, tmp_path):
    p = tmp_path / "bad.bw"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        BigWigReader(data=BigWig(url=str(p))).read(spark=spark)
    url = make_bigwig(tmp_path / "bb.bw", {"chr1": 100}, [_section(0, 1, [(0, 1, 1.0)])], False)
    blob = bytearray(open(url, "rb").read())
    struct.pack_into("<H", blob, 32, 3)  # fieldCount=3 → bigBed
    (tmp_path / "bb2.bw").write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="bigBed"):
        BigWigReader(data=BigWig(url=str(tmp_path / "bb2.bw"))).read(spark=spark)


def test_bigwig_unknown_section_type():
    buf = struct.pack("<IIIIIBBH", 0, 0, 0, 0, 0, 9, 0, 0)
    with pytest.raises(ValueError, match="section type"):
        _bw_decode_block(buf, "<")


def test_recommend_picks_bigwig(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_bigwig(tmp_path / "r.bw", {"chr1": 100}, [_section(0, 1, [(0, 1, 1.0)])], True)
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("BigWig" in k for k in kinds)
