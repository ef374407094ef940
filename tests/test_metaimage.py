"""MetaImage (.mha/.mhd) reader vs fixtures written directly from the
public MetaIO spec: tag-based text header, inline (.mha) and detached
(.mhd + .raw) payloads, zlib compression, big-endian, multi-channel."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from intake_spark import datatypes as dt
from intake_spark.sci import MetaImage, MetaImageReader


def _rebuild(df) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    shape = list(rows[0].shape)
    flat = np.concatenate([np.asarray(r.values) for r in rows])
    return flat.reshape([-1] + shape[1:])


def mha_header(arr: np.ndarray, datafile: str, compressed: bool = False,
               nch: int = 1) -> bytes:
    dims = list(arr.shape[::-1])
    if nch > 1:
        dims = dims[1:]  # the channel axis is the FASTEST; DimSize omits it
    met = {v: k for k, v in
           {"MET_UCHAR": "u1", "MET_SHORT": "i2", "MET_USHORT": "u2",
            "MET_INT": "i4", "MET_FLOAT": "f4", "MET_DOUBLE": "f8"}.items()}
    lines = [
        "ObjectType = Image",
        f"NDims = {len(dims)}",
        "BinaryData = True",
        f"BinaryDataByteOrderMSB = {'True' if arr.dtype.str[0] == '>' else 'False'}",
        f"CompressedData = {'True' if compressed else 'False'}",
        f"DimSize = {' '.join(str(d) for d in dims)}",
        f"ElementNumberOfChannels = {nch}",
        f"ElementType = {met[arr.dtype.str[1:]]}",
        f"ElementDataFile = {datafile}",
    ]
    return ("\n".join(lines) + "\n").encode()


def test_mha_inline_roundtrip(spark, tmp_path):
    arr = np.arange(24, dtype="<f8").reshape(2, 3, 4)
    p = tmp_path / "vol.mha"
    p.write_bytes(mha_header(arr, "LOCAL") + arr.tobytes())
    rdr = MetaImageReader(data=MetaImage(url=str(p)))
    got = _rebuild(rdr.read(spark=spark))
    np.testing.assert_array_equal(got, arr)
    assert rdr.data.metadata["shape"] == [2, 3, 4]


def test_mhd_detached_raw(spark, tmp_path):
    arr = (np.arange(12, dtype="<i2") * 3).reshape(3, 4)
    (tmp_path / "img.raw").write_bytes(arr.tobytes())
    p = tmp_path / "img.mhd"
    p.write_bytes(mha_header(arr, "img.raw"))
    got = _rebuild(MetaImageReader(data=MetaImage(url=str(p))).read(spark=spark))
    np.testing.assert_array_equal(got, arr)


def test_mha_compressed_big_endian(spark, tmp_path):
    arr = np.linspace(-2, 2, 30, dtype=">f4").reshape(5, 6)
    p = tmp_path / "c.mha"
    p.write_bytes(mha_header(arr, "LOCAL", compressed=True) + zlib.compress(arr.tobytes()))
    got = _rebuild(MetaImageReader(data=MetaImage(url=str(p))).read(spark=spark))
    np.testing.assert_allclose(got, arr.astype("<f8"))


def test_mha_multichannel(spark, tmp_path):
    arr = np.arange(24, dtype="<u1").reshape(2, 4, 3)  # 4x2 image, 3 channels
    p = tmp_path / "rgb.mha"
    p.write_bytes(mha_header(arr, "LOCAL", nch=3) + arr.tobytes())
    rdr = MetaImageReader(data=MetaImage(url=str(p)))
    got = _rebuild(rdr.read(spark=spark))
    assert rdr.data.metadata["shape"] == [2, 4, 3]
    np.testing.assert_array_equal(got, arr)


def test_metaimage_rejects_and_recommend(spark, tmp_path):
    arr = np.ones((2, 2), dtype="<f4")
    p = tmp_path / "bad.mha"
    p.write_bytes(mha_header(arr, "LIST") + arr.tobytes())
    with pytest.raises(ValueError, match="slice-list"):
        MetaImageReader(data=MetaImage(url=str(p))).read(spark=spark)
    from intake_spark.datatypes import recommend

    ok = tmp_path / "ok.mha"
    ok.write_bytes(mha_header(arr, "LOCAL") + arr.tobytes())
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(ok))]
    assert any("MetaImage" in k for k in kinds)
