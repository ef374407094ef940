"""Stdlib HDF5 reader vs spec-built .h5 fixtures — classic (superblock v0,
v1 object headers, symbol-table groups with B-tree/SNOD/local heap) and
modern (superblock v2, v2 'OHDR' object headers with Link messages), both
assembled here directly from the public HDF5 file-format spec (h5py is not
in this container)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark import datatypes as dt
from intake_spark.hdf5 import HDF5Reader

UNDEF = b"\xff" * 8


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _msg_v1(mtype: int, data: bytes) -> bytes:
    data = _pad8(data)
    return struct.pack("<HHB3x", mtype, len(data), 0) + data


def _oh_v1(msgs: list[bytes]) -> bytes:
    body = b"".join(msgs)
    return struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(body)) + body


def _dt_msg(arr: np.ndarray) -> bytes:
    d = arr.dtype
    be = d.str[0] == ">"
    if d.kind == "f":
        b0 = 0x20 | (1 if be else 0)  # implied-MSB norm + byte order
        if d.itemsize == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        else:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        head = struct.pack("<BBBBI", 0x11, b0, 8 * d.itemsize - 1, 0, d.itemsize)
    else:
        b0 = (0x08 if d.kind == "i" else 0) | (1 if be else 0)
        props = struct.pack("<HH", 0, 8 * d.itemsize)
        head = struct.pack("<BBBBI", 0x10, b0, 0, 0, d.itemsize)
    return _msg_v1(0x03, head + props)


def _space_msg(shape: tuple) -> bytes:
    return _msg_v1(
        0x01,
        struct.pack("<BBB5x", 1, len(shape), 0)
        + b"".join(struct.pack("<Q", s) for s in shape),
    )


def _ds_oh(arr: np.ndarray, data_addr: int) -> bytes:
    layout = _msg_v1(0x08, struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes))
    return _oh_v1([_space_msg(arr.shape), _dt_msg(arr), layout])


def _superblock_v0(eof: int, root_addr: int) -> bytes:
    head = b"\x89HDF\r\n\x1a\n" + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    head += struct.pack("<HHI", 4, 16, 0)
    head += struct.pack("<Q", 0) + UNDEF + struct.pack("<Q", eof) + UNDEF
    # root group symbol table entry (cache type 0: nothing cached)
    head += struct.pack("<QQII", 0, root_addr, 0, 0) + b"\x00" * 16
    assert len(head) == 96
    return head


def h5_classic(datasets: dict[str, np.ndarray]) -> bytes:
    """v0 superblock + v1 object headers + B-tree/SNOD/heap group."""
    names = sorted(datasets)
    root_addr = 96
    root_size = len(_oh_v1([_msg_v1(0x11, struct.pack("<QQ", 0, 0))]))
    btree_addr = root_addr + root_size
    btree_size = 24 + 8 + 8 + 8  # header + key0/child0/key1 (one SNOD)
    heap_addr = btree_addr + btree_size
    heap_data_addr = heap_addr + 32
    heap_data = b"\x00" * 8
    name_offs = {}
    for nm in names:
        name_offs[nm] = len(heap_data)
        heap_data += _pad8(nm.encode() + b"\x00")
    snod_addr = heap_data_addr + len(heap_data)
    snod_size = 8 + 40 * len(names)
    cur = snod_addr + snod_size
    ds_addrs = {}
    for nm in names:
        ds_addrs[nm] = cur
        cur += len(_ds_oh(datasets[nm], 0))
    data_addrs = {}
    for nm in names:
        data_addrs[nm] = cur
        cur += datasets[nm].nbytes
    eof = cur

    out = _superblock_v0(eof, root_addr)
    out += _oh_v1([_msg_v1(0x11, struct.pack("<QQ", btree_addr, heap_addr))])
    out += (
        b"TREE" + bytes([0, 0]) + struct.pack("<H", 1) + UNDEF + UNDEF
        + struct.pack("<QQQ", 0, snod_addr, name_offs[names[-1]])
    )
    out += b"HEAP" + bytes([0, 0, 0, 0]) + struct.pack("<QQQ", len(heap_data), 0, heap_data_addr)
    out += heap_data
    out += b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
    for nm in names:
        out += struct.pack("<QQII", name_offs[nm], ds_addrs[nm], 0, 0) + b"\x00" * 16
    for nm in names:
        out += _ds_oh(datasets[nm], data_addrs[nm])
    for nm in names:
        out += datasets[nm].tobytes()
    assert len(out) == eof
    return out


def h5_v2(datasets: dict[str, np.ndarray]) -> bytes:
    """v2 superblock + v2 root object header with Link messages (dataset
    object headers stay v1 — mixed versions are legal)."""
    names = sorted(datasets)

    def link_msg(name: str, addr: int) -> bytes:
        nm = name.encode()
        data = bytes([1, 0, len(nm)]) + nm + struct.pack("<Q", addr)
        return struct.pack("<BHB", 0x06, len(data), 0) + data

    chunk0_size = sum(4 + 3 + len(n.encode()) + 8 for n in names)
    root_addr = 48
    root_size = 4 + 2 + 2 + chunk0_size + 4  # OHDR+ver/flags+size+msgs+csum
    cur = root_addr + root_size
    ds_addrs = {}
    for nm in names:
        ds_addrs[nm] = cur
        cur += len(_ds_oh(datasets[nm], 0))
    data_addrs = {}
    for nm in names:
        data_addrs[nm] = cur
        cur += datasets[nm].nbytes
    eof = cur

    out = b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0])
    out += struct.pack("<Q", 0) + UNDEF + struct.pack("<QQ", eof, root_addr)
    out += struct.pack("<I", 0)  # superblock checksum (not validated)
    assert len(out) == 48
    chunk0 = b"".join(link_msg(nm, ds_addrs[nm]) for nm in names)
    assert len(chunk0) == chunk0_size
    out += b"OHDR" + bytes([2, 1]) + struct.pack("<H", len(chunk0)) + chunk0
    out += struct.pack("<I", 0)  # object header checksum (not validated)
    for nm in names:
        out += _ds_oh(datasets[nm], data_addrs[nm])
    for nm in names:
        out += datasets[nm].tobytes()
    assert len(out) == eof
    return out


def _rebuild(df) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    shape = list(rows[0].shape)
    flat = np.concatenate([np.asarray(r.values) for r in rows])
    return flat.reshape([-1] + shape[1:])


def test_classic_roundtrip_f8(spark, tmp_path):
    arr = np.linspace(-3, 3, 60, dtype="<f8").reshape(10, 6)
    p = tmp_path / "a.h5"
    p.write_bytes(h5_classic({"temps": arr}))
    rdr = HDF5Reader(data=dt.HDF5(url=str(p)))
    df = rdr.read(spark=spark, rows_per_chunk=3)
    np.testing.assert_array_equal(_rebuild(df), arr)
    assert rdr.data.metadata["dataset"] == "temps"
    assert rdr.data.metadata["shape"] == [10, 6]


def test_classic_multiple_datasets_and_selection(spark, tmp_path):
    a = np.arange(12, dtype="<i4").reshape(3, 4)
    b = np.arange(5, dtype="<f8") * 1.5
    p = tmp_path / "m.h5"
    p.write_bytes(h5_classic({"ints": a, "floats": b}))
    df_a = HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark, dataset="ints")
    np.testing.assert_array_equal(_rebuild(df_a), a)
    df_b = HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark, dataset="floats")
    np.testing.assert_allclose(_rebuild(df_b).ravel(), b)
    # default = first in sorted order
    rdr = HDF5Reader(data=dt.HDF5(url=str(p)))
    rdr.read(spark=spark)
    assert rdr.data.metadata["dataset"] == "floats"
    with pytest.raises(KeyError, match="available"):
        HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark, dataset="nope")


def test_classic_big_endian_and_unsigned(spark, tmp_path):
    be = np.array([[1.5, -2.25], [3.0, 4.5]], dtype=">f4")
    u2 = np.array([0, 1, 65535], dtype="<u2")
    p = tmp_path / "be.h5"
    p.write_bytes(h5_classic({"be_floats": be, "u16": u2}))
    np.testing.assert_allclose(
        _rebuild(HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark, dataset="be_floats")),
        be.astype("<f8"),
    )
    np.testing.assert_array_equal(
        _rebuild(HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark, dataset="u16")).ravel(),
        u2.astype("<f8"),
    )


def test_v2_superblock_link_messages(spark, tmp_path):
    arr = np.arange(24, dtype="<f8").reshape(6, 4) / 7.0
    p = tmp_path / "v2.h5"
    p.write_bytes(h5_v2({"data": arr}))
    rdr = HDF5Reader(data=dt.HDF5(url=str(p)))
    df = rdr.read(spark=spark, rows_per_chunk=2)
    np.testing.assert_array_equal(_rebuild(df), arr)
    assert rdr.data.metadata["dataset"] == "data"


def _apply_filters(raw: bytes, filters: list[tuple[int, list[int]]], itemsize: int) -> bytes:
    import zlib

    for fid, _vals in filters:
        if fid == 2:  # shuffle
            arr = np.frombuffer(raw, dtype=np.uint8)
            raw = arr.reshape(len(arr) // itemsize, itemsize).T.tobytes()
        elif fid == 1:  # deflate
            raw = zlib.compress(raw, 6)
        elif fid == 3:  # fletcher32: reader strips the trailing checksum
            raw = raw + b"\x00\x00\x00\x00"
    return raw


def h5_chunked(
    arr: np.ndarray,
    chunk_dims: tuple,
    filters: list[tuple[int, list[int]]],
    skip: set | None = None,
    fill: float | None = None,
) -> bytes:
    """Classic file whose single dataset uses the chunked layout (v1 chunk
    B-tree) with an optional filter pipeline, built from the spec. Chunk
    coords in ``skip`` are left out of the B-tree and payload (sparse
    write); ``fill`` adds a new-style fill-value message (0x05 v2). If ALL
    chunks are skipped the layout points at an undefined B-tree address."""
    rank = arr.ndim
    grid = [range(0, s, c) for s, c in zip(arr.shape, chunk_dims)]
    import itertools

    chunks = []
    for coords in itertools.product(*grid):
        if skip and coords in skip:
            continue
        full = np.zeros(chunk_dims, dtype=arr.dtype)
        sel = tuple(slice(c, min(c + d, s)) for c, d, s in zip(coords, chunk_dims, arr.shape))
        dst = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        full[dst] = arr[sel]
        chunks.append((coords, _apply_filters(full.tobytes(), filters, arr.itemsize)))

    def filt_msg() -> bytes:
        if not filters:
            return b""
        body = struct.pack("<BB6x", 1, len(filters))
        for fid, vals in filters:
            body += struct.pack("<HHHH", fid, 0, 0, len(vals))
            body += b"".join(struct.pack("<I", v) for v in vals)
            if len(vals) % 2:
                body += b"\x00" * 4
        return _msg_v1(0x0B, body)

    def ds_oh(btree_addr: int) -> bytes:
        layout = _msg_v1(
            0x08,
            struct.pack("<BBB", 3, 2, rank + 1)
            + struct.pack("<Q", btree_addr)
            + b"".join(struct.pack("<I", d) for d in chunk_dims)
            + struct.pack("<I", arr.itemsize),
        )
        msgs = [_space_msg(arr.shape), _dt_msg(arr), layout]
        if fill is not None:
            fv = np.array([fill], dtype=arr.dtype).tobytes()
            msgs.append(
                _msg_v1(0x05, struct.pack("<BBBB", 2, 2, 0, 1)
                        + struct.pack("<I", len(fv)) + fv)
            )
        fm = filt_msg()
        if fm:
            msgs.append(fm)
        return _oh_v1(msgs)

    name = b"data\x00"
    root_addr = 96
    root_size = len(_oh_v1([_msg_v1(0x11, struct.pack("<QQ", 0, 0))]))
    gb_addr = root_addr + root_size
    gb_size = 24 + 8 + 8 + 8
    heap_addr = gb_addr + gb_size
    heap_data_addr = heap_addr + 32
    heap_data = b"\x00" * 8 + _pad8(name)
    snod_addr = heap_data_addr + len(heap_data)
    ds_addr = snod_addr + 8 + 40
    ds_size = len(ds_oh(0))
    btree_addr = ds_addr + ds_size
    # B-tree node: header + entries*(key+child) + final key
    key_size = 4 + 4 + 8 * (rank + 1)
    bt_size = 0 if not chunks else 24 + len(chunks) * (key_size + 8) + key_size
    cur = btree_addr + bt_size
    chunk_addrs = []
    for _coords, payload in chunks:
        chunk_addrs.append(cur)
        cur += len(payload)
    eof = cur

    out = _superblock_v0(eof, root_addr)
    out += _oh_v1([_msg_v1(0x11, struct.pack("<QQ", gb_addr, heap_addr))])
    out += (
        b"TREE" + bytes([0, 0]) + struct.pack("<H", 1) + UNDEF + UNDEF
        + struct.pack("<QQQ", 0, snod_addr, 8)
    )
    out += b"HEAP" + bytes(4) + struct.pack("<QQQ", len(heap_data), 0, heap_data_addr)
    out += heap_data
    out += b"SNOD" + bytes([1, 0]) + struct.pack("<H", 1)
    out += struct.pack("<QQII", 8, ds_addr, 0, 0) + b"\x00" * 16
    out += ds_oh(0xFFFFFFFFFFFFFFFF if not chunks else btree_addr)
    if chunks:
        bt = b"TREE" + bytes([1, 0]) + struct.pack("<H", len(chunks)) + UNDEF + UNDEF
        for (coords, payload), addr in zip(chunks, chunk_addrs):
            bt += struct.pack("<II", len(payload), 0)
            bt += b"".join(struct.pack("<Q", c) for c in coords) + struct.pack("<Q", 0)
            bt += struct.pack("<Q", addr)
        bt += struct.pack("<II", 0, 0)  # final (rightmost) key
        bt += b"".join(struct.pack("<Q", s) for s in arr.shape) + struct.pack("<Q", 0)
        assert len(bt) == bt_size
        out += bt
    for _coords, payload in chunks:
        out += payload
    assert len(out) == eof
    return out


def test_chunked_uncompressed_roundtrip(spark, tmp_path):
    arr = np.arange(35, dtype="<f8").reshape(7, 5)
    p = tmp_path / "c.h5"
    p.write_bytes(h5_chunked(arr, (3, 4), []))
    df = HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df), arr)
    # one chunk row per dim-0 slab of the chunk grid
    assert df.count() == 3


def test_chunked_shuffle_deflate_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(3)
    arr = rng.randn(10, 6).astype("<f8")
    p = tmp_path / "cz.h5"
    p.write_bytes(h5_chunked(arr, (4, 4), [(2, [8]), (1, [6])]))
    df = HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df), arr)


def test_chunked_fletcher32_and_1d(spark, tmp_path):
    arr = np.arange(11, dtype="<i4")
    p = tmp_path / "cf.h5"
    p.write_bytes(h5_chunked(arr, (4,), [(3, [])]))
    df = HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark)
    np.testing.assert_array_equal(_rebuild(df).ravel(), arr)


def test_chunked_unknown_filter_rejected(spark, tmp_path):
    arr = np.zeros((4, 4), dtype="<f8")
    p = tmp_path / "cu.h5"
    p.write_bytes(h5_chunked(arr, (2, 2), [(32015, [])]))  # zstd: not stdlib
    with pytest.raises(Exception, match="filter id 32015"):
        HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark).collect()


def test_hdf5_sink_roundtrip(spark, tmp_path):
    """to_hdf5 writes a classic-layout file that the reader round-trips,
    with the dataset name resolvable and the single-file size guard
    active."""
    from intake_spark import output
    from intake_spark.arrays import NumpyArrayReader

    arr = np.linspace(-1, 1, 48, dtype="<f8").reshape(12, 4)
    npy = str(tmp_path / "in.npy")
    np.save(npy, arr)
    chunks = NumpyArrayReader(data=dt.NumpyFile(url=npy)).read(spark=spark, rows_per_chunk=5)
    out = output.to_hdf5(chunks, str(tmp_path / "out.h5"), dataset="grid")
    rdr = HDF5Reader(data=dt.HDF5(url=out.url))
    df = rdr.read(spark=spark, dataset="grid", rows_per_chunk=7)
    np.testing.assert_array_equal(_rebuild(df), arr)
    assert rdr.data.metadata["dataset"] == "grid"
    with pytest.raises(ValueError, match="to_zarr"):
        output.to_hdf5(chunks, str(tmp_path / "big.h5"), max_bytes=100)


def test_recommend_picks_hdf5(tmp_path):
    from intake_spark.datatypes import recommend

    arr = np.ones(3, dtype="<f8")
    p = tmp_path / "r.h5"
    p.write_bytes(h5_classic({"ones": arr}))
    kinds = [type(c).__name__ if not isinstance(c, type) else c.__name__ for c in recommend(str(p))]
    assert any("HDF5" in k for k in kinds)


def test_chunked_sparse_chunks_fill_value(spark, tmp_path):
    """Chunks absent from the B-tree materialize as the dataset's fill
    value — including a whole dim-0 slab with no written chunks, which
    must still appear in the output (not be silently dropped)."""
    arr = np.arange(35, dtype="<f8").reshape(7, 5)
    p = tmp_path / "sparse.h5"
    # skip one interior chunk and the ENTIRE last dim-0 slab (rows 6..7)
    p.write_bytes(h5_chunked(arr, (3, 4), [], skip={(0, 4), (6, 0), (6, 4)}, fill=-9.5))
    got = _rebuild(HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark))
    want = arr.copy()
    want[0:3, 4:5] = -9.5
    want[6:7, :] = -9.5
    np.testing.assert_array_equal(got, want)


def test_chunked_unallocated_btree_is_all_fill(spark, tmp_path):
    """A chunked dataset with no written chunks (B-tree address undefined)
    reads as an all-fill array instead of erroring."""
    arr = np.zeros((5, 3), dtype="<f8")
    p = tmp_path / "empty.h5"
    p.write_bytes(h5_chunked(arr, (2, 3), [], skip={(0, 0), (2, 0), (4, 0)}, fill=2.25))
    got = _rebuild(HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark))
    np.testing.assert_array_equal(got, np.full((5, 3), 2.25))


def test_chunked_default_fill_is_zero(spark, tmp_path):
    """No fill-value message → missing chunks read as 0 (libhdf5 default)."""
    arr = np.arange(12, dtype="<f8").reshape(4, 3)
    p = tmp_path / "dflt.h5"
    p.write_bytes(h5_chunked(arr, (2, 3), [], skip={(2, 0)}))
    got = _rebuild(HDF5Reader(data=dt.HDF5(url=str(p))).read(spark=spark))
    want = arr.copy()
    want[2:4, :] = 0.0
    np.testing.assert_array_equal(got, want)


def test_hdf5_group_catalog(spark, tmp_path):
    """Dataset hierarchy → catalog entries over HDF5Reader (the HDF5
    twin of zarr_group_catalog): entries carry shape/dtype metadata and
    read back the right dataset; component= filters the namespace."""
    from intake_spark.hdf5 import hdf5_group_catalog

    a = np.arange(12, dtype="<i4").reshape(3, 4)
    b = np.arange(5, dtype="<f8") * 1.5
    p = tmp_path / "cat.h5"
    p.write_bytes(h5_classic({"ints": a, "floats": b}))

    cat = hdf5_group_catalog(str(p))
    assert set(cat.aliases) == {"ints", "floats"}
    meta = cat["ints"].data.metadata
    assert meta["shape"] == [3, 4]
    got = _rebuild(cat["ints"].read(spark=spark))
    np.testing.assert_array_equal(got, a)

    only = hdf5_group_catalog(str(p), component="floats")
    assert set(only.aliases) == {"/"}
    np.testing.assert_allclose(_rebuild(only["/"].read(spark=spark)).ravel(), b)

    with pytest.raises(ValueError, match="no datasets"):
        hdf5_group_catalog(str(p), component="missing")
