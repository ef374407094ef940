"""Bioinformatics file readers: FASTA / FASTQ / VCF, Spark-first and
stdlib-only (the reference gates these on biopython/pysam —
BioPythonFASTAReader/FASTQ/PySAMVCFReader, intake/readers/readers.py:
2455-2521; here the text formats parse directly).

Scale model: FASTA/FASTQ parse per *file* (binaryFile listing →
Arrow-batched mapInPandas), so a directory of files parallelizes across
executors — the standard recipe for record formats with multi-line records.
VCF is line-oriented after the header, so it uses ``spark.read.text``:
fully distributed splitting even within one large file.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intake_spark import datatypes as dt
from intake_spark.readers import BaseReader


class FASTA(dt.FileData):
    filepattern = r"(fa|fasta|fna|faa)$"
    # no magic: a 1-byte ">" prefix would claim arbitrary text files
    structure = {"sequence"}


class FASTQ(dt.FileData):
    filepattern = r"(fq|fastq)$"
    structure = {"sequence"}


class VCF(dt.FileData):
    filepattern = r"vcf$"
    magic = (b"##fileformat=VCF",)
    structure = {"table"}


def _binary_files(spark, url: str, glob: str):
    """binaryFile listing for a url that may be a glob, a single file, or a
    directory. ``pathGlobFilter`` applies only to the directory case — a
    single file already names its target, and filtering it against the glob
    silently drops extensions the glob misses (e.g. '.fna' vs '*.fa*')."""
    import os

    reader = spark.read.format("binaryFile")
    if "*" not in url and os.path.isdir(url):
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(url)


_FASTA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("seq_id", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("sequence", T.StringType()),
        T.StructField("length", T.IntegerType()),
    ]
)


def _parse_fasta(text: str) -> list[dict]:
    records = []
    seq_id, desc, seq = None, "", []
    for line in text.splitlines():
        if line.startswith(">"):
            if seq_id is not None:
                records.append(
                    {"seq_id": seq_id, "description": desc, "sequence": "".join(seq)}
                )
            head = line[1:].strip()
            seq_id, _, desc = head.partition(" ")
            seq = []
        elif line.strip():
            seq.append(line.strip())
    if seq_id is not None:
        records.append({"seq_id": seq_id, "description": desc, "sequence": "".join(seq)})
    return records


class FASTAReader(BaseReader):
    """FASTA files → (path, seq_id, description, sequence, length) rows."""

    implements = {FASTA}

    def _read(self, spark, glob: str = "*.{fa,fasta,fna,faa}", **kwargs):
        from intake_spark.session import ensure_py_deps

        ensure_py_deps(spark)
        files = _binary_files(spark, self.data.url, glob)

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    for rec in _parse_fasta(content.decode("utf-8", errors="replace")):
                        rows.append(
                            {**rec, "path": path, "length": len(rec["sequence"])}
                        )
                yield pd.DataFrame(
                    rows, columns=["path", "seq_id", "description", "sequence", "length"]
                )

        return files.select("path", "content").mapInPandas(parse, schema=_FASTA_SCHEMA)


_FASTQ_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("seq_id", T.StringType()),
        T.StructField("sequence", T.StringType()),
        T.StructField("quality", T.StringType()),
        T.StructField("length", T.IntegerType()),
    ]
)


class FASTQReader(BaseReader):
    """FASTQ files → (path, seq_id, sequence, quality, length) rows
    (4-line records: @id / seq / + / qual)."""

    implements = {FASTQ}

    def _read(self, spark, glob: str = "*.{fq,fastq}", **kwargs):
        from intake_spark.session import ensure_py_deps

        ensure_py_deps(spark)
        files = _binary_files(spark, self.data.url, glob)

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    lines = content.decode("utf-8", errors="replace").splitlines()
                    for i in range(0, len(lines) - 3, 4):
                        rows.append(
                            {
                                "path": path,
                                "seq_id": lines[i].lstrip("@").split(" ")[0],
                                "sequence": lines[i + 1],
                                "quality": lines[i + 3],
                                "length": len(lines[i + 1]),
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=["path", "seq_id", "sequence", "quality", "length"]
                )

        return files.select("path", "content").mapInPandas(parse, schema=_FASTQ_SCHEMA)


_VCF_CORE = ["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]


class VCFReader(BaseReader):
    """VCF → typed rows over the 8 core columns (+ raw extra fields array).

    Line-oriented after the header, so ``spark.read.text`` distributes the
    split/cast across executors even for one huge file — no per-file
    bottleneck, filters on CHROM/POS prune early.
    """

    implements = {VCF}

    def _read(self, spark, **kwargs):
        lines = spark.read.text(self.data.url)
        data = lines.filter(~F.col("value").startswith("#"))
        parts = F.split("value", "\t")
        return data.select(
            parts.getItem(0).alias("CHROM"),
            parts.getItem(1).cast("long").alias("POS"),
            parts.getItem(2).alias("ID"),
            parts.getItem(3).alias("REF"),
            parts.getItem(4).alias("ALT"),
            F.when(parts.getItem(5) == ".", None)
            .otherwise(parts.getItem(5))
            .cast("double")
            .alias("QUAL"),
            parts.getItem(6).alias("FILTER"),
            parts.getItem(7).alias("INFO"),
            F.slice(parts, 9, 1000).alias("extra"),
        )
