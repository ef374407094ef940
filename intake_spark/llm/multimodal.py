"""Multimodal (image/audio/video/document) columns as opaque binary + typed
metadata, with Arrow-batched decode plumbing.

Model (SURVEY §1.2 ``array``/``image`` structures): media lives in a
``content: binary`` column — ingested via ``spark.read.format("binaryFile")``
— alongside typed metadata (``path``, ``modificationTime``, ``length``) and
decoded-feature columns produced by ``mapInPandas`` stages.

The actual codec step is STUBBED in this container (no PIL / librosa /
decord): ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless the library import succeeds, and :func:`fake_decode_meta` provides a
deterministic stand-in so the Spark-side plumbing — schema, Arrow batch
iteration, partition parallelism — is real and tested end-to-end.

Scale: binaryFile scans parallelize per file; decode UDFs are
embarrassingly parallel; `maxPartitionBytes`/`filesMaxPartitionNum` size the
tasks. Feature outputs (fixed-width arrays) are shuffle-friendly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime, length,
    content) rows — Spark's binaryFile source; one task per file group."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def binary_from_text(df: DataFrame, text_col: str = "text", out_col: str = "content") -> DataFrame:
    """Test helper: materialize an opaque binary column from a string column
    (UTF-8 bytes) so multimodal plumbing is exercisable on the synthetic
    ``documents`` table without media files."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(content: bytes):
    """Real PNG decode with the stdlib + numpy: IHDR/PLTE/IDAT parse, zlib
    inflate, scanline unfilter (all 5 filter types incl. Paeth) → uint8
    ndarray of shape (H, W, C). Supports bit depth 8, color types
    gray/RGB/palette/gray-alpha/RGBA, non-interlaced."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, idat, plte = 8, b"", None
    width = height = ctype = depth = interlace = None
    while i + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[i : i + 4])
        tag = content[i + 4 : i + 8]
        payload = content[i + 8 : i + 8 + ln]
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + ln
    if depth != 8 or interlace:
        raise ValueError(f"unsupported PNG (bit depth {depth}, interlace {interlace})")
    nch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(idat)
    stride = width * nch
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).copy()
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 0xFF
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        out[y] = line
        prev = out[y]
    arr = out.reshape(height, width, nch)
    if ctype == 3:  # palette lookup → RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        arr = plte[arr[:, :, 0]]
    return arr


def decode_wav(content: bytes):
    """Real WAV decode (stdlib ``wave``): → (rate, uint8/int16 ndarray of
    shape (n_frames, n_channels))."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content)) as w:
        rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sw == 3:  # 24-bit PCM: sign-extend each 3-byte sample into int32
        b3 = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        pad = np.where(b3[:, 2] >= 0x80, 0xFF, 0).astype(np.uint8)
        b4 = np.column_stack([b3, pad]).tobytes()
        arr = np.frombuffer(b4, dtype="<i4").reshape(-1, nch)
        return rate, arr
    try:
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[sw]
    except KeyError:
        raise ValueError(f"unsupported WAV sample width {sw} bytes") from None
    arr = np.frombuffer(frames, dtype=dtype).reshape(-1, nch)
    return rate, arr


def resize_nearest(arr, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (H, W, C) array — numpy indexing only;
    the standard cheap thumbnail/feature-normalization step."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows][:, cols]


def decode_image(content: bytes):
    """Image decode: PNG and baseline TIFF decode with the stdlib paths;
    other formats (JPEG's DCT pipeline etc.) need PIL, which this
    container lacks."""
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        from intake_spark.sci import decode_tiff

        return decode_tiff(content)
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "non-PNG image decode requires pillow; container lacks media "
            "libs — PNG decodes natively, use fake_decode_meta for plumbing "
            "tests of other codecs"
        ) from exc
    return Image.open(io.BytesIO(content))  # pragma: no cover


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),
    ]
)


def image_features(
    df: DataFrame,
    content_col: str = "content",
    keep_cols: list[str] | None = None,
    thumb_size: int = 8,
) -> DataFrame:
    """REAL decode → feature-extract → resize stage for PNG/TIFF columns:
    Arrow-batched mapInPandas produces (width, height, n_channels,
    mean_intensity, thumb) where ``thumb`` is a flattened nearest-neighbor
    grayscale thumbnail — the end-to-end multimodal pipeline with no fake
    and no media libraries."""
    from intake_spark.session import ensure_py_deps

    ensure_py_deps(df.sparkSession)
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != content_col]
    out_schema = T.StructType([df.schema[c] for c in keep] + list(IMAGE_FEATURES_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "n_channels", "mean_intensity", "thumb")}
            for content in pdf[content_col]:
                arr = decode_image(bytes(content))
                gray = arr.mean(axis=2)
                thumb = resize_nearest(arr, thumb_size, thumb_size).mean(axis=2)
                rows["width"].append(arr.shape[1])
                rows["height"].append(arr.shape[0])
                rows["n_channels"].append(arr.shape[2])
                rows["mean_intensity"].append(float(gray.mean()))
                rows["thumb"].append([float(x) for x in thumb.ravel()])
            out = pdf[keep].copy()
            out["width"] = pd.array(rows["width"], dtype="int32")
            out["height"] = pd.array(rows["height"], dtype="int32")
            out["n_channels"] = pd.array(rows["n_channels"], dtype="int32")
            out["mean_intensity"] = rows["mean_intensity"]
            out["thumb"] = rows["thumb"]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def _fake_meta(content: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in decode: md5-derived pseudo dimensions."""
    digest = hashlib.md5(content).hexdigest()
    return (
        len(content),
        digest,
        int(digest[:4], 16) % 1920 + 1,
        int(digest[4:8], 16) % 1080 + 1,
        int(digest[8:10], 16) % 4 + 1,
    )


def fake_decode_meta(
    df: DataFrame, content_col: str = "content", keep_cols: list[str] | None = None
) -> DataFrame:
    """Arrow-batched ``mapInPandas`` 'decode' stage producing IMAGE_META_SCHEMA
    columns from the binary column. Swap ``_fake_meta`` for a real codec and
    the plumbing (schema, batching, parallelism) is unchanged."""
    from intake_spark.session import ensure_py_deps

    ensure_py_deps(df.sparkSession)
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != content_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep] + list(IMAGE_META_SCHEMA.fields)
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[content_col].map(_fake_meta)
            out = pdf[keep].copy()
            out["byte_len"] = [m[0] for m in meta]
            out["content_hash"] = [m[1] for m in meta]
            out["width"] = pd.array([m[2] for m in meta], dtype="int32")
            out["height"] = pd.array([m[3] for m in meta], dtype="int32")
            out["n_channels"] = pd.array([m[4] for m in meta], dtype="int32")
            yield out

    return df.mapInPandas(decode_batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, content_col: str = "content", every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    Decoder stubbed (no decord/ffmpeg here): frame count is derived
    deterministically from the byte length; the explode shape — media row →
    many frame rows, each later decodable independently — is the real part.
    """
    n_frames = (F.length(F.col(content_col)) / 100 + 1).cast("int")
    return df.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
    )
