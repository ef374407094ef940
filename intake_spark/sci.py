"""Scientific/medical image formats: FITS and NIfTI-1 readers (stdlib +
numpy — the formats are fixed-layout headers plus raw arrays), DICOM
import-gated (parity: FITSReader readers.py:1616, NibabelNiftiReader
readers.py:1604, DicomReader readers.py:1644 — the reference gates all
three on astropy/nibabel/pydicom).

Both real readers emit the engine's chunk-row encoding
(arrays.CHUNK_SCHEMA): the header parses driver-side (tiny), the payload
decodes on executors via a byte-range manifest — same distributed recipe
as NumpyArrayReader.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from intake_spark import datatypes as dt
from intake_spark.readers import BaseReader


class FITS(dt.FileData):
    filepattern = r"(fits|fts|fit)$"
    magic = (b"SIMPLE  =",)
    structure = {"array"}


class NIfTI(dt.FileData):
    filepattern = r"nii$"
    structure = {"array"}


class DICOM(dt.FileData):
    filepattern = r"(dcm|dicom)$"
    magic = ((128, b"DICM"),)
    structure = {"array", "image"}


_FITS_BITPIX = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def _parse_fits_header(f) -> tuple[dict, int]:
    """Parse the primary HDU header (2880-byte blocks of 80-char cards);
    returns (cards, data_offset)."""
    cards: dict[str, str] = {}
    off = 0
    done = False
    while not done:
        block = f.read(2880)
        if len(block) < 2880:
            raise ValueError("truncated FITS header")
        off += 2880
        for i in range(36):
            card = block[i * 80 : (i + 1) * 80].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if "=" in card:
                val = card[9:].split("/")[0].strip()
                cards[key] = val
    return cards, off


def _chunked_array_df(spark, url: str, dtype: str, shape: list[int], data_off: int, rows_per_chunk: int):
    """Byte-range manifest → mapInPandas decode → chunk rows. Shared by
    FITS/NIfTI (same shape as NumpyArrayReader, arrays.py)."""
    import numpy as np

    from intake_spark.arrays import CHUNK_SCHEMA
    from intake_spark.session import ensure_py_deps

    ensure_py_deps(spark)
    row_elems = 1
    for s in shape[1:]:
        row_elems *= s
    n0 = shape[0] if shape else 1
    itemsize = np.dtype(dtype).itemsize
    manifest = [
        (i, start, min(start + rows_per_chunk, n0))
        for i, start in enumerate(range(0, n0, rows_per_chunk))
    ]
    mdf = spark.createDataFrame(manifest, ["chunk_id", "row_start", "row_end"])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            with open(url, "rb") as f:
                for _, r in pdf.iterrows():
                    n_el = int(r.row_end - r.row_start) * row_elems
                    f.seek(data_off + int(r.row_start) * row_elems * itemsize)
                    vals = np.frombuffer(f.read(n_el * itemsize), dtype=np.dtype(dtype))
                    out.append(
                        {
                            "chunk_id": int(r.chunk_id),
                            "offset0": int(r.row_start),
                            "shape": shape,
                            "values": vals.astype(np.float64).tolist(),
                        }
                    )
            yield pd.DataFrame(out, columns=["chunk_id", "offset0", "shape", "values"])

    return mdf.mapInPandas(decode, schema=CHUNK_SCHEMA)


class FITSReader(BaseReader):
    """FITS primary-HDU image → chunk-row DataFrame. Header cards land in
    the data's ``metadata`` dict; data is big-endian per BITPIX."""

    implements = {FITS}

    def _read(self, spark, rows_per_chunk: int = 1024, **kwargs):
        url = self.data.url
        with open(url, "rb") as f:
            cards, data_off = _parse_fits_header(f)
        if cards.get("SIMPLE", "").strip() != "T":
            raise ValueError("not a standard FITS file")
        naxis = int(cards["NAXIS"])
        # FITS axis order is fortran-like: NAXIS1 varies fastest → reverse
        shape = [int(cards[f"NAXIS{i}"]) for i in range(naxis, 0, -1)]
        dtype = _FITS_BITPIX[int(cards["BITPIX"])]
        self.data.metadata.update({k: v for k, v in cards.items() if k not in ("SIMPLE",)})
        return _chunked_array_df(spark, url, dtype, shape, data_off, rows_per_chunk)


_NIFTI_DTYPES = {2: "<u1", 4: "<i2", 8: "<i4", 16: "<f4", 64: "<f8", 256: "<i1", 512: "<u2"}


class NIfTIReader(BaseReader):
    """NIfTI-1 (.nii single-file) volume → chunk-row DataFrame. The 348-byte
    header is fixed-layout struct fields: dim[8] @40 (int16), datatype @70
    (int16), vox_offset @108 (float32), magic 'n+1' @344."""

    implements = {NIfTI}

    def _read(self, spark, rows_per_chunk: int = 64, **kwargs):
        url = self.data.url
        with open(url, "rb") as f:
            hdr = f.read(352)
        if hdr[344:347] != b"n+1":
            raise ValueError("not a single-file NIfTI-1 (.nii) file")
        dim = struct.unpack("<8h", hdr[40:56])
        ndim = dim[0]
        # spec endianness rule: dim[0] outside 1..7 ⇒ the header is
        # byte-swapped (big-endian writer); the magic is endian-independent
        # so without this check a BE file would silently decode to garbage
        if not 1 <= ndim <= 7:
            raise ValueError(
                f"dim[0]={ndim}: header is byte-swapped (big-endian NIfTI) "
                "or corrupt; only little-endian .nii supported"
            )
        shape = list(dim[1 : 1 + ndim])[::-1]  # row-major: slowest axis first
        (datatype,) = struct.unpack("<h", hdr[70:72])
        if datatype not in _NIFTI_DTYPES:
            raise ValueError(f"unsupported NIfTI datatype code {datatype}")
        (vox_offset,) = struct.unpack("<f", hdr[108:112])
        return _chunked_array_df(
            spark, url, _NIFTI_DTYPES[datatype], shape, int(vox_offset), rows_per_chunk
        )


class DicomReader(BaseReader):
    """DICOM → pixel array chunk rows + tag metadata — import-gated on
    pydicom (the tag dictionary and transfer-syntax decoders are the
    package's value; absent in this container)."""

    implements = {DICOM}
    imports = {"pydicom"}

    def _read(self, spark, **kwargs):
        import pydicom  # noqa: F401  (gated)

        raise NotImplementedError(
            "DICOM decode requires pydicom; plumbing model: binaryFile → "
            "per-file parse UDF → chunk rows + tag columns (see FITSReader)"
        )


class NetCDF3(dt.FileData):
    filepattern = r"(nc|cdf)$"
    magic = (b"CDF\x01", b"CDF\x02")
    structure = {"array", "hierarchy"}

    def __init__(self, url, variable: str = "", storage_options=None, metadata=None):
        super().__init__(url, storage_options, metadata)
        self.variable = variable


_NC_TYPES = {1: (">i1", 1), 2: ("S1", 1), 3: (">i2", 2), 4: (">i4", 4), 5: (">f4", 4), 6: (">f8", 8)}


def _nc_name(buf: bytes, i: int) -> tuple[str, int]:
    (n,) = struct.unpack(">I", buf[i : i + 4])
    name = buf[i + 4 : i + 4 + n].decode("utf-8", errors="replace")
    pad = (4 - n % 4) % 4
    return name, i + 4 + n + pad


def _nc_skip_atts(buf: bytes, i: int) -> int:
    tag, cnt = struct.unpack(">II", buf[i : i + 8])
    i += 8
    if tag == 0:  # ABSENT
        return i
    for _ in range(cnt):
        _, i = _nc_name(buf, i)
        typ, nelems = struct.unpack(">II", buf[i : i + 8])
        i += 8
        size = _NC_TYPES[typ][1] * nelems
        i += size + (4 - size % 4) % 4
    return i


def parse_netcdf3_header(buf: bytes) -> dict:
    """Classic netCDF (CDF-1/CDF-2) header → dims, vars (name → shape,
    dtype, begin, record?) and record geometry. Spec-layout parse, stdlib
    struct only."""
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic netCDF3 file")
    offfmt = ">I" if buf[3] == 1 else ">Q"
    offsz = 4 if buf[3] == 1 else 8
    (numrecs,) = struct.unpack(">I", buf[4:8])
    i = 8
    tag, cnt = struct.unpack(">II", buf[i : i + 8])
    i += 8
    dims = []
    if tag == 0x0A:
        for _ in range(cnt):
            name, i = _nc_name(buf, i)
            (size,) = struct.unpack(">I", buf[i : i + 4])
            i += 4
            dims.append((name, size))
    i = _nc_skip_atts(buf, i)
    tag, cnt = struct.unpack(">II", buf[i : i + 8])
    i += 8
    out: dict = {"dims": dims, "numrecs": numrecs, "vars": {}}
    if tag != 0x0B:
        return out
    for _ in range(cnt):
        name, i = _nc_name(buf, i)
        (nd,) = struct.unpack(">I", buf[i : i + 4])
        i += 4
        dimids = struct.unpack(f">{nd}I", buf[i : i + 4 * nd]) if nd else ()
        i += 4 * nd
        i = _nc_skip_atts(buf, i)
        typ, _vsize = struct.unpack(">II", buf[i : i + 8])
        i += 8
        (begin,) = struct.unpack(offfmt, buf[i : i + offsz])
        i += offsz
        is_record = bool(nd) and dims[dimids[0]][1] == 0
        shape = [dims[d][1] for d in dimids]
        if is_record:
            shape[0] = numrecs
        out["vars"][name] = {
            "dtype": _NC_TYPES[typ][0],
            "shape": shape,
            "begin": begin,
            "record": is_record,
        }
    return out


class NetCDF3Reader(BaseReader):
    """Classic netCDF3 variable → chunk-row DataFrame, no netCDF4/xarray
    packages: stdlib header parse (driver), numpy byte-range decode in
    mapInPandas (executors). Fixed-size variables only — record-dimension
    variables interleave per record and need a strided manifest (rejected
    with a clear error; the reference reads them via xarray/scipy).
    Parity: XArrayDatasetReader's netCDF path, readers.py:1340-1440."""

    implements = {NetCDF3}

    def _read(self, spark, variable: str | None = None, rows_per_chunk: int = 1024, **kwargs):
        url = self.data.url
        with open(url, "rb") as f:
            hdr = parse_netcdf3_header(f.read(1 << 20))
        var = variable or getattr(self.data, "variable", "") or ""
        if not var:
            fixed = [k for k, v in hdr["vars"].items() if not v["record"]]
            if not fixed:
                raise ValueError("no fixed-size variables in file")
            var = fixed[0]
        if var not in hdr["vars"]:
            raise KeyError(f"variable {var!r} not in {sorted(hdr['vars'])}")
        meta = hdr["vars"][var]
        if meta["record"]:
            raise ValueError(
                f"variable {var!r} uses the record dimension; strided record "
                "reads not supported by this stdlib reader"
            )
        self.data.metadata.update({"dims": hdr["dims"], "variable": var})
        return _chunked_array_df(
            spark, url, meta["dtype"], meta["shape"] or [1], meta["begin"], rows_per_chunk
        )
