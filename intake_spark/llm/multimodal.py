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


def decode_image(content: bytes):
    """Real image decode — gated on PIL availability (not in this container)."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "image decode requires pillow; container lacks media libs — "
            "use fake_decode_meta for plumbing tests"
        ) from exc
    return Image.open(io.BytesIO(content))  # pragma: no cover


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
