"""MatrixMarket and MATLAB v5 readers vs hand-built fixtures (scipy absent
in this container; the .mat bytes are assembled from the public MAT-file
v5 spec, the .mtx text from the format definition)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from intake_spark.sci import (
    MatlabMat,
    MatlabMatReader,
    MatrixMarket,
    MatrixMarketReader,
)

_MX_CLASS = {"f8": 6, "f4": 7, "i1": 8, "u1": 9, "i2": 10, "u2": 11, "i4": 12, "u4": 13}
_MI_TYPE = {"f8": 9, "f4": 7, "i1": 1, "u1": 2, "i2": 3, "u2": 4, "i4": 5, "u4": 6}


def _sub(mtype: int, data: bytes) -> bytes:
    nb = len(data)
    if 0 < nb <= 4:
        return struct.pack("<I", (nb << 16) | mtype) + data.ljust(4, b"\x00")
    pad = (8 - nb % 8) % 8
    return struct.pack("<II", mtype, nb) + data + b"\x00" * pad


def _matrix_element(name: str, arr: np.ndarray) -> bytes:
    key = arr.dtype.str[1:]
    payload = _sub(6, bytes([_MX_CLASS[key], 0, 0, 0]) + b"\x00" * 4)
    payload += _sub(5, b"".join(struct.pack("<i", d) for d in arr.shape))
    payload += _sub(1, name.encode())
    payload += _sub(_MI_TYPE[key], arr.ravel(order="F").tobytes())
    return payload


def make_mat(path, variables: dict[str, np.ndarray], compress: set[str] = frozenset()):
    out = b"MATLAB 5.0 MAT-file, spec-built test fixture".ljust(116)
    out += b"\x00" * 8 + struct.pack("<H", 0x0100) + b"IM"
    for name, arr in variables.items():
        payload = _matrix_element(name, arr)
        elem = struct.pack("<II", 14, len(payload)) + payload
        if name in compress:
            comp = zlib.compress(elem)
            pad = (8 - len(comp) % 8) % 8
            out += struct.pack("<II", 15, len(comp)) + comp + b"\x00" * pad
        else:
            out += elem
    path.write_bytes(out)
    return str(path)


def _rebuild(df) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    shape = list(rows[0].shape)
    flat = np.concatenate([np.asarray(r.values) for r in rows])
    return flat.reshape([-1] + shape[1:])


def test_mtx_coordinate_general(spark, tmp_path):
    p = tmp_path / "a.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment line\n"
        "4 5 4\n"
        "1 1 2.5\n"
        "2 3 -1\n"
        "4 5 7.25\n"
        "4 1 0.5\n"
    )
    got = {
        (r.row, r.col): r.value
        for r in MatrixMarketReader(data=MatrixMarket(url=str(p))).read(spark=spark).collect()
    }
    assert got == {(0, 0): 2.5, (1, 2): -1.0, (3, 4): 7.25, (3, 0): 0.5}


def test_mtx_symmetric_and_pattern(spark, tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 3\n"
        "1 1\n"
        "2 1\n"
        "3 2\n"
    )
    got = {
        (r.row, r.col): r.value
        for r in MatrixMarketReader(data=MatrixMarket(url=str(p))).read(spark=spark).collect()
    }
    # diagonal stays single; off-diagonals mirror with value 1.0
    assert got == {(0, 0): 1.0, (1, 0): 1.0, (0, 1): 1.0, (2, 1): 1.0, (1, 2): 1.0}

    skew = tmp_path / "k.mtx"
    skew.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n"
        "2 1 5.0\n"
    )
    got = {
        (r.row, r.col): r.value
        for r in MatrixMarketReader(data=MatrixMarket(url=str(skew))).read(spark=spark).collect()
    }
    assert got == {(1, 0): 5.0, (0, 1): -5.0}


def test_mtx_array_dense(spark, tmp_path):
    dense = np.array([[1.0, 4.0], [2.0, 5.0], [3.0, 6.0]])  # 3x2
    p = tmp_path / "d.mtx"
    body = "\n".join(str(v) for v in dense.ravel(order="F"))
    p.write_text(f"%%MatrixMarket matrix array real general\n3 2\n{body}\n")
    rows = MatrixMarketReader(data=MatrixMarket(url=str(p))).read(spark=spark).collect()
    out = np.zeros((3, 2))
    for r in rows:
        out[r.row, r.col] = r.value
    np.testing.assert_array_equal(out, dense)


def test_mat_uncompressed_roundtrip(spark, tmp_path):
    arr = np.linspace(0, 1, 12, dtype="<f8").reshape(4, 3)
    url = make_mat(tmp_path / "u.mat", {"grid": arr})
    rdr = MatlabMatReader(data=MatlabMat(url=url))
    df = rdr.read(spark=spark, rows_per_chunk=2)
    np.testing.assert_allclose(_rebuild(df), arr)
    assert rdr.data.metadata["variable"] == "grid"


def test_mat_compressed_and_selection(spark, tmp_path):
    a = np.arange(6, dtype="<i2").reshape(2, 3)
    b = np.array([[1.5, 2.5]], dtype="<f4")
    url = make_mat(tmp_path / "c.mat", {"small_ints": a, "floats": b}, compress={"small_ints", "floats"})
    rdr = MatlabMatReader(data=MatlabMat(url=url))
    df = rdr.read(spark=spark, variable="small_ints")
    np.testing.assert_array_equal(_rebuild(df), a.astype("<f8"))
    assert set(rdr.data.metadata["variables"]) == {"small_ints", "floats"}
    np.testing.assert_allclose(
        _rebuild(MatlabMatReader(data=MatlabMat(url=url)).read(spark=spark, variable="floats")),
        b.astype("<f8"),
    )
    with pytest.raises(KeyError, match="not in"):
        MatlabMatReader(data=MatlabMat(url=url)).read(spark=spark, variable="nope")


def test_recommend_picks_mtx_and_mat(tmp_path):
    from intake_spark.datatypes import recommend

    p = tmp_path / "r.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n1 1 1\n1 1 3.0\n")
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(p))]
    assert any("MatrixMarket" in k for k in kinds)
    url = make_mat(tmp_path / "r.mat", {"x": np.ones(2)})
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("Matlab" in k for k in kinds)
