"""ML dataset formats: TFRecord (stdlib wire-format parser) and the
sklearn example datasets (import-gated).

Parity: TFRecordReader readers.py:905 (reference needs tensorflow),
SKLearnExampleReader readers.py:569. TFRecord framing and the tf.train
.Example protobuf are both simple fixed encodings, so records parse with
struct + a ~60-line protobuf wire-format walk — no tensorflow/protobuf
dependency, and the per-file parse runs distributed via binaryFile +
Arrow-batched mapInPandas.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import types as T

from intake_spark import datatypes as dt
from intake_spark.readers import BaseReader


class TFRecord(dt.FileData):
    filepattern = r"tfrecords?$"
    structure = {"sequence", "nested"}


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Walk protobuf wire format: yields (field_no, wire_type, payload)."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
            yield field, wt, val
        elif wt == 1:  # 64-bit
            yield field, wt, buf[i : i + 8]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _to_signed_i64(v: int) -> int:
    # int64 varints are two's-complement (10-byte encoding when negative)
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_feature(buf: bytes) -> tuple[list[bytes], list[float], list[int]]:
    """tf.train.Feature: bytes_list=1 / float_list=2 / int64_list=3."""
    bvals: list[bytes] = []
    fvals: list[float] = []
    ivals: list[int] = []
    for field, wt, payload in _fields(buf):
        if field == 1:  # BytesList{repeated bytes value = 1}
            bvals.extend(p for f2, _, p in _fields(payload) if f2 == 1)
        elif field == 2:  # FloatList{repeated float value = 1 [packed]}
            for f2, wt2, p in _fields(payload):
                if f2 != 1:
                    continue
                if wt2 == 2:  # packed
                    fvals.extend(struct.unpack(f"<{len(p) // 4}f", p))
                else:
                    fvals.append(struct.unpack("<f", p)[0])
        elif field == 3:  # Int64List{repeated int64 value = 1 [packed]}
            for f2, wt2, p in _fields(payload):
                if f2 != 1:
                    continue
                if wt2 == 2:
                    i = 0
                    while i < len(p):
                        v, i = _read_varint(p, i)
                        ivals.append(_to_signed_i64(v))
                else:
                    ivals.append(_to_signed_i64(p))
    return bvals, fvals, ivals


def _parse_example(buf: bytes) -> dict[str, tuple]:
    """tf.train.Example{Features features=1}; Features{map feature=1}."""
    out: dict[str, tuple] = {}
    for field, _, payload in _fields(buf):
        if field != 1:
            continue
        for f2, _, entry in _fields(payload):
            if f2 != 1:
                continue
            key, feat = "", b""
            for f3, _, p in _fields(entry):
                if f3 == 1:
                    key = p.decode("utf-8", errors="replace")
                elif f3 == 2:
                    feat = p
            out[key] = _parse_feature(feat)
    return out


def _tfrecord_frames(content: bytes) -> Iterator[bytes]:
    """TFRecord framing: u64 length + u32 crc + payload + u32 crc. CRCs are
    crc32c (masked); framing is parsed by lengths, CRCs not verified."""
    i = 0
    while i + 12 <= len(content):
        (ln,) = struct.unpack("<Q", content[i : i + 8])
        start = i + 12
        yield content[start : start + ln]
        i = start + ln + 4


_TFRECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("bytes_vals", T.ArrayType(T.BinaryType())),
        T.StructField("float_vals", T.ArrayType(T.DoubleType())),
        T.StructField("int64_vals", T.ArrayType(T.LongType())),
    ]
)


class TFRecordReader(BaseReader):
    """TFRecord of tf.train.Example → long-format typed rows
    (path, record_idx, key, bytes_vals, float_vals, int64_vals) — pivot to
    wide with groupBy(record_idx).pivot(key) downstream if wanted."""

    implements = {TFRecord}

    def _read(self, spark, glob: str = "*.tfrecord*", **kwargs):
        from intake_spark.session import ensure_py_deps

        ensure_py_deps(spark)
        files = (
            spark.read.format("binaryFile").load(self.data.url)
            if "*" in self.data.url
            else spark.read.format("binaryFile").option("pathGlobFilter", glob).load(self.data.url)
        )

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    for idx, frame in enumerate(_tfrecord_frames(bytes(content))):
                        for key, (bv, fv, iv) in _parse_example(frame).items():
                            rows.append(
                                {
                                    "path": path,
                                    "record_idx": idx,
                                    "key": key,
                                    "bytes_vals": bv,
                                    "float_vals": [float(x) for x in fv],
                                    "int64_vals": iv,
                                }
                            )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "path", "record_idx", "key", "bytes_vals", "float_vals", "int64_vals",
                    ],
                )

        return files.select("path", "content").mapInPandas(parse, schema=_TFRECORD_SCHEMA)


class SKLearnExample(dt.BaseData):
    """Named sklearn example dataset (parity: datatypes side of
    SKLearnExampleReader readers.py:569)."""

    structure = {"table"}

    def __init__(self, name: str = "iris", metadata=None):
        super().__init__(metadata)
        self.name = name


class SKLearnExampleReader(BaseReader):
    """sklearn.datasets.load_<name>() → DataFrame — import-gated on
    scikit-learn (absent in this container)."""

    implements = {SKLearnExample}
    imports = {"sklearn"}
    lazy = False

    def _read(self, spark, **kwargs):
        import sklearn.datasets as skd

        bunch = getattr(skd, f"load_{self.data.name}")()
        pdf = pd.DataFrame(bunch.data, columns=list(bunch.feature_names))
        pdf["target"] = bunch.target
        return spark.createDataFrame(pdf)
