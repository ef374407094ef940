"""ASDFReader vs spec-built fixtures: YAML tree with !core/ndarray tags,
big-endian block headers, multiple blocks, array selection by path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intake_spark.sci import ASDF, ASDFReader, _asdf_parse


def _block(data: bytes) -> bytes:
    head = struct.pack(">I", 0)  # flags
    head += b"\x00" * 4  # compression: none
    head += struct.pack(">QQQ", len(data), len(data), len(data))
    head += b"\x00" * 16  # checksum (not validated)
    return b"\xd3BLK" + struct.pack(">H", len(head)) + head + data


def make_asdf(path, arrays: dict[str, np.ndarray]) -> str:
    yaml_lines = [
        "#ASDF 1.0.0",
        "#ASDF_STANDARD 1.5.0",
        "%YAML 1.1",
        "--- !core/asdf-1.1.0",
    ]
    blobs = []
    for i, (name, arr) in enumerate(sorted(arrays.items())):
        bo = "big" if arr.dtype.str[0] == ">" else "little"
        dt_name = arr.dtype.name
        yaml_lines += [
            f"{name}: !core/ndarray-1.0.0",
            f"  source: {i}",
            f"  datatype: {dt_name}",
            f"  byteorder: {bo}",
            f"  shape: [{', '.join(str(s) for s in arr.shape)}]",
        ]
        blobs.append(arr.tobytes())
    yaml_lines.append("...")
    out = ("\n".join(yaml_lines) + "\n").encode()
    for b in blobs:
        out += _block(b)
    path.write_bytes(out)
    return str(path)


def _rebuild(df) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    shape = list(rows[0].shape)
    flat = np.concatenate([np.asarray(r.values) for r in rows])
    return flat.reshape([-1] + shape[1:])


def test_asdf_roundtrip_and_selection(spark, tmp_path):
    a = np.linspace(0, 5, 24, dtype="<f8").reshape(6, 4)
    b = np.arange(10, dtype=">i4")
    url = make_asdf(tmp_path / "x.asdf", {"alpha": a, "beta": b})
    rdr = ASDFReader(data=ASDF(url=url))
    df = rdr.read(spark=spark, rows_per_chunk=2)  # default = first sorted
    np.testing.assert_allclose(_rebuild(df), a)
    assert rdr.data.metadata["array"] == "alpha"
    assert rdr.data.metadata["arrays"] == ["alpha", "beta"]
    df_b = ASDFReader(data=ASDF(url=url)).read(spark=spark, array="beta")
    np.testing.assert_array_equal(_rebuild(df_b).ravel(), b.astype("<f8"))
    with pytest.raises(KeyError, match="not in"):
        ASDFReader(data=ASDF(url=url)).read(spark=spark, array="nope")


def test_asdf_block_scan(tmp_path):
    a = np.ones(3, dtype="<f4")
    url = make_asdf(tmp_path / "s.asdf", {"only": a})
    tree, blocks = _asdf_parse(url)
    assert len(blocks) == 1 and blocks[0]["data_size"] == 12
    assert "only" in tree


def test_recommend_picks_asdf(tmp_path):
    from intake_spark.datatypes import recommend

    url = make_asdf(tmp_path / "r.asdf", {"z": np.zeros(2)})
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(url)]
    assert any("ASDF" in k for k in kinds)
