"""IcechunkReader offline tests: the reader must honor the session-store
MAPPING (an icechunk repo directory is an object store — refs/snapshots/
manifests/chunks — not a zarr tree, so walking it directly can never
work; r6 review finding). A fake store injects the mapping protocol."""

from __future__ import annotations

import os

import numpy as np
import pytest

from intake_spark import datatypes as dt
from intake_spark.services import IcechunkReader, IcechunkRepo
from tests.test_documents_arrays import _write_zarr_v2


def _store_from_dir(root: str, prefix: str = "") -> dict[str, bytes]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root).replace(os.sep, "/")
            out[prefix + rel] = open(p, "rb").read()
    return out


class _ListPrefixStore:
    """zarr-v3-style store: list_prefix + get returning a Buffer-like."""

    class _Buf:
        def __init__(self, b):
            self._b = b

        def to_bytes(self):
            return self._b

    def __init__(self, d):
        self._d = d

    def list_prefix(self, prefix):
        async def gen():
            for k in self._d:
                if k.startswith(prefix):
                    yield k

        return gen()

    def get(self, key):
        async def go():
            return self._Buf(self._d[key])

        return go()


def test_icechunk_reader_mapping_store(spark, tmp_path):
    arr = np.arange(6 * 4, dtype="<f8").reshape(6, 4)
    src = str(tmp_path / "plain.zarr")
    _write_zarr_v2(src, arr, chunks=[3, 4])
    store = _store_from_dir(src)

    rd = IcechunkReader(data=IcechunkRepo(url="local_filesystem"))
    df = rd.read(spark=spark, store=store)
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    rebuilt = np.concatenate(
        [np.array(r.values).reshape(-1, 4) for r in rows], axis=0
    )
    np.testing.assert_array_equal(rebuilt, arr)


def test_icechunk_reader_root_prefix_and_async_store(spark, tmp_path):
    arr = (np.arange(4 * 4, dtype="<i4") % 7).reshape(4, 4)
    src = str(tmp_path / "g.zarr")
    _write_zarr_v2(src, arr, chunks=[2, 2])
    # repo carries the array under group "temps/" plus unrelated keys
    d = _store_from_dir(src, prefix="temps/")
    d["other/junk"] = b"xx"
    rd = IcechunkReader(
        data=IcechunkRepo(url="local_filesystem", root="temps")
    )
    df = rd.read(spark=spark, store=_ListPrefixStore(d))
    rows = sorted(df.collect(), key=lambda r: r.offset0)
    rebuilt = np.concatenate(
        [np.array(r.values).reshape(-1, 4) for r in rows], axis=0
    )
    np.testing.assert_array_equal(rebuilt, arr)


def test_icechunk_reader_empty_root_raises(spark):
    rd = IcechunkReader(
        data=IcechunkRepo(url="local_filesystem", root="missing")
    )
    with pytest.raises(ValueError, match="no keys"):
        rd.read(spark=spark, store={"a/b": b"1"})
