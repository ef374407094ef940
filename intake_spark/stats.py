"""Statistical-package file readers: Stata / SAS / SPSS via pandas
(parity: PandasStataReader / PandasSASReader / PandasSPSSReader /
PyreadstatReader, intake/readers/readers.py:2394-2454).

pandas reads Stata and SAS natively (no extra package); SPSS needs
pyreadstat and stays import-gated. These are driver-side parses
(``lazy = False``): stats files are survey/panel-sized by nature, and the
reference's pandas readers have the same cost model. A directory of many
files distributes via the ``pattern`` kwarg (binaryFile + mapInPandas).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from intake_spark import datatypes as dt
from intake_spark.readers import BaseReader


class Stata(dt.FileData):
    filepattern = r"dta$"
    structure = {"table"}


class SAS(dt.FileData):
    filepattern = r"(sas7bdat|xpt)$"
    structure = {"table"}


class SPSS(dt.FileData):
    filepattern = r"(sav|zsav)$"
    magic = (b"$FL2",)
    structure = {"table"}


class _PandasFileReader(BaseReader):
    """Shared recipe: single file → driver pandas parse → createDataFrame;
    many files (url contains a glob) → binaryFile + Arrow-batched parse."""

    lazy = False
    _parse = None  # staticmethod(bytes -> pandas.DataFrame), set by subclass

    def _read(self, spark, **kwargs):
        url = self.data.url
        if "*" not in url:
            pdf = type(self)._parse(open(url, "rb").read(), **kwargs)
            return spark.createDataFrame(pdf)
        from intake_spark.session import ensure_py_deps

        ensure_py_deps(spark)
        files = spark.read.format("binaryFile").load(url)
        schema = getattr(self, "_schema_cache", None)
        if schema is None:
            # schema from one sample file — resolved with a driver-side
            # glob (no Spark job); the binaryFile .first() probe is only
            # the fallback for non-posix URLs. Cached on the reader so
            # re-reads skip the probe entirely.
            import glob as _glob

            matches = sorted(_glob.glob(url))
            if matches:
                sample_path = matches[0]
            else:
                sample_path = files.select("path").first()[0].removeprefix("file:")
            sample = type(self)._parse(open(sample_path, "rb").read(), **kwargs)
            schema = spark.createDataFrame(sample.head(10)).schema
            self._schema_cache = schema
        parse_fn, kw = type(self)._parse, kwargs

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                for content in b["content"]:
                    yield parse_fn(content, **kw)

        return files.select("content").mapInPandas(parse, schema=schema)


class StataReader(_PandasFileReader):
    """.dta → DataFrame (pandas.read_stata; no extra dependency)."""

    implements = {Stata}

    @staticmethod
    def _parse(content: bytes, **kw) -> pd.DataFrame:
        import io

        return pd.read_stata(io.BytesIO(content), **kw)


class SASReader(_PandasFileReader):
    """.sas7bdat/.xpt → DataFrame (pandas.read_sas; format inferred from
    the content by pandas)."""

    implements = {SAS}

    @staticmethod
    def _parse(content: bytes, **kw) -> pd.DataFrame:
        import io

        # pandas can't infer the format from a buffer: sniff the magic
        if "format" not in kw:
            kw["format"] = "xport" if content.startswith(b"HEADER RECORD") else "sas7bdat"
        return pd.read_sas(io.BytesIO(content), **kw)


class SPSSReader(_PandasFileReader):
    """.sav → DataFrame — import-gated on pyreadstat (pandas.read_spss
    requires it; absent in this container)."""

    implements = {SPSS}
    imports = {"pyreadstat"}

    @staticmethod
    def _parse(content: bytes, **kw) -> pd.DataFrame:
        import tempfile

        # pyreadstat reads from paths only
        with tempfile.NamedTemporaryFile(suffix=".sav") as f:
            f.write(content)
            f.flush()
            return pd.read_spss(f.name, **kw)
