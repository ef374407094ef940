"""Awkward-style ragged-array surface over Spark ``ArrayType`` columns.

Parity: the reference's awkward family (readers.py:927-978 —
AwkwardParquet/AwkwardJSON/AwkwardAVRO returning ``awkward.Array``) and the
``.ak`` accessor idioms of the awkward library. Spark already IS a ragged
engine — nested ``array<...>`` columns stay columnar (Parquet repetition
levels), and the higher-order functions (``transform``/``filter``/
``aggregate``/``zip_with``) run JVM-side inside whole-stage codegen — so
this module is a thin, named vocabulary over those builtins, NOT a Python
re-implementation: zero UDFs, zero explodes except the one operation whose
semantics IS row-expansion (``explode_ragged`` = ak.flatten axis=0→rows).

Two surfaces:

* module functions ``num``/``flatten``/``firsts``/``pad_none``/
  ``fill_none``/``mask``/``zip_arrays``/``unzip``/``local_index``/
  ``sum_ragged``/``mean_ragged``/``max_ragged``/``min_ragged``/
  ``count_matching`` — each takes (df, col, ...) and returns a DataFrame
  with the result column;
* the recorded-step ``reader.ak.<fn>(...)`` namespace
  (:class:`RaggedNamespace`), the ragged twin of ``reader.F.*`` —
  steps serialize by function NAME, so catalogs round-trip.

The named reader aliases (:class:`AwkwardParquet` etc.) make the
reference's reader surface discoverable: they are the plain Spark readers
— nested columns come back nested; nothing to convert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intake_spark import datatypes as dt
from intake_spark.lakehouse import AvroOCFReader
from intake_spark.readers import SparkJSON, SparkParquet

__all__ = [
    "AwkwardAvro",
    "AwkwardJSON",
    "AwkwardParquet",
    "RaggedNamespace",
    "apply_ragged",
    "count_matching",
    "explode_ragged",
    "fill_none",
    "firsts",
    "flatten",
    "local_index",
    "mask",
    "max_ragged",
    "mean_ragged",
    "min_ragged",
    "num",
    "pad_none",
    "sum_ragged",
    "unzip",
    "zip_arrays",
]


# -- named reader aliases ----------------------------------------------------


class AwkwardParquet(SparkParquet):
    """Ragged/nested parquet → DataFrame with nested columns intact
    (reference AwkwardParquet, readers.py:934-943: awkward.from_parquet).
    Spark's parquet scan reads repetition/definition levels natively, so
    the alias adds only the name + a row-group-sized discover."""

    implements = {dt.Parquet}
    priority = 5  # plain SparkParquet stays the auto-selected default

    def discover(self, spark=None):
        # reference discover reads row_groups=[0]; a limit keeps the scan
        # to the first pages the same way
        return self.read(spark=spark).limit(100)


class AwkwardJSON(SparkJSON):
    """Ragged JSON → nested DataFrame (reference AwkwardJSON,
    readers.py:953-957: awkward.from_json). Spark's JSON reader infers
    nested array/struct schemas natively."""

    implements = {dt.JSONFile}
    priority = 5


class AwkwardAvro(AvroOCFReader):
    """Ragged Avro → nested DataFrame (reference AwkwardAVRO,
    readers.py:960-968: awkward.from_avro_file) — backed by the stdlib
    OCF block reader, no spark-avro jar needed."""

    implements = {dt.AVRO}
    priority = 5


# -- ragged operations (all JVM higher-order functions) ----------------------


def _elem_type(df: DataFrame, col: str) -> str:
    dtype = df.schema[col].dataType
    try:
        return dtype.elementType.simpleString()
    except AttributeError:
        raise TypeError(f"column {col!r} is {dtype.simpleString()}, not an array") from None


def num(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.num(axis=1): per-row list length."""
    return df.withColumn(out or f"{col}_num", F.size(col))


def flatten(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.flatten(axis=2): array<array<T>> → array<T>, one depth level,
    row count unchanged (columnar, no explode)."""
    return df.withColumn(out or col, F.flatten(F.col(col)))


def explode_ragged(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.flatten(axis=1) to ROWS: one output row per element — the only
    ragged verb whose semantics is row expansion."""
    return df.withColumn(out or col, F.explode(F.col(col)))


def firsts(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.firsts: first element, null for empty lists."""
    return df.withColumn(out or f"{col}_first", F.get(F.col(col), 0))


def pad_none(
    df: DataFrame, col: str, target: int, clip: bool = False, out: str | None = None
) -> DataFrame:
    """ak.pad_none: pad each list with nulls up to ``target`` elements;
    ``clip=True`` also truncates longer lists to exactly ``target``."""
    et = _elem_type(df, col)
    # array_repeat, NOT sequence(1, n): Spark's sequence auto-steps -1
    # when start > stop, so sequence(1, 0) is [1, 0], not empty
    padded = F.expr(
        f"concat({col}, array_repeat(cast(null as {et}),"
        f" greatest({target} - size({col}), 0)))"
    )
    if clip:
        padded = F.slice(padded, 1, target)
    return df.withColumn(out or col, padded)


def fill_none(df: DataFrame, col: str, value, out: str | None = None) -> DataFrame:
    """ak.fill_none: replace null ELEMENTS with a constant."""
    lit = F.lit(value)
    return df.withColumn(
        out or col, F.transform(F.col(col), lambda x: F.coalesce(x, lit))
    )


def mask(df: DataFrame, col: str, mask_col: str, out: str | None = None) -> DataFrame:
    """ak.mask: element-wise null-out where the parallel boolean list is
    false (lists must be equal length, as in awkward)."""
    return df.withColumn(
        out or col,
        F.zip_with(F.col(col), F.col(mask_col), lambda x, m: F.when(m, x)),
    )


def zip_arrays(df: DataFrame, out: str, *cols: str) -> DataFrame:
    """ak.zip: parallel lists → one list of structs (arrays_zip)."""
    return df.withColumn(out, F.arrays_zip(*[F.col(c) for c in cols]))


def unzip(df: DataFrame, col: str, fields: list[str] | None = None) -> DataFrame:
    """ak.unzip: list-of-structs → one list column per struct field."""
    if fields is None:
        dtype = df.schema[col].dataType.elementType
        fields = [f.name for f in dtype.fields]
    for name in fields:
        # closure factory, NOT a default arg: F.transform treats a 2-param
        # lambda as (element, index) and would bind the index to `n`
        def _getter(nm):
            return lambda x: x[nm]

        df = df.withColumn(f"{col}_{name}", F.transform(F.col(col), _getter(name)))
    return df


def local_index(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.local_index(axis=1): [0, 1, ..., len-1] per row (empty for
    empty lists, NULL for NULL lists — matching ak.local_index and the
    NULL convention of the sibling ops num/firsts/sum_ragged, so a
    missing list stays distinguishable from a present-but-empty one)."""
    idx = (
        F.when(F.col(col).isNull(), F.lit(None).cast("array<int>"))
        .when(F.size(col) > 0, F.sequence(F.lit(0), F.size(col) - 1))
        .otherwise(F.array().cast("array<int>"))
    )
    return df.withColumn(out or f"{col}_index", idx)


def _sum_expr(df: DataFrame, col: str):
    """Fold sum in the element's own numeric family: integral elements
    accumulate exactly in bigint; fractional elements in double (a bigint
    accumulator would silently TRUNCATE floats)."""
    et = _elem_type(df, col)
    acc_t = "bigint" if et in ("tinyint", "smallint", "int", "bigint") else "double"
    zero = F.lit(0).cast(acc_t)
    return F.aggregate(
        F.col(col),
        zero,
        lambda acc, x: acc + F.coalesce(x.cast(acc_t), F.lit(0).cast(acc_t)),
    )


def sum_ragged(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.sum(axis=1) — JVM aggregate fold; nulls count as 0 like ak."""
    return df.withColumn(out or f"{col}_sum", _sum_expr(df, col))


def mean_ragged(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.mean(axis=1): null (not NaN) for empty lists — exact sum in the
    element's numeric family, one IEEE division at the end."""
    s = _sum_expr(df, col)
    n = F.size(F.filter(F.col(col), lambda x: x.isNotNull()))
    return df.withColumn(
        out or f"{col}_mean", F.when(n > 0, s.cast("double") / n.cast("double"))
    )


def max_ragged(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.max(axis=1): null for empty lists (array_max skips nulls)."""
    return df.withColumn(out or f"{col}_max", F.array_max(F.col(col)))


def min_ragged(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """ak.min(axis=1)."""
    return df.withColumn(out or f"{col}_min", F.array_min(F.col(col)))


def count_matching(
    df: DataFrame, col: str, predicate_sql: str, out: str | None = None
) -> DataFrame:
    """ak.count_nonzero over an element predicate: ``predicate_sql`` is a
    SQL lambda body over element ``x`` (e.g. ``"length(x) >= 7"``)."""
    return df.withColumn(
        out or f"{col}_count", F.expr(f"size(filter({col}, x -> {predicate_sql}))")
    )


# -- recorded-step namespace (reader.ak.*) -----------------------------------

_NS_FUNCS = {
    "num", "flatten", "explode_ragged", "firsts", "pad_none", "fill_none",
    "mask", "zip_arrays", "unzip", "local_index", "sum_ragged",
    "mean_ragged", "max_ragged", "min_ragged", "count_matching",
}


def apply_ragged(df: DataFrame, fn_name: str, *args, **kwargs) -> DataFrame:
    """Importable executor for ``.ak`` steps (by-name, never pickled —
    the same serialization contract as namespaces.apply_function)."""
    if fn_name not in _NS_FUNCS:
        raise ValueError(f"{fn_name!r} is not a ragged namespace function")
    import intake_spark.ragged as mod

    return getattr(mod, fn_name)(df, *args, **kwargs)


class RaggedNamespace:
    """``reader.ak.<fn>(col, ...)`` — records a serializable pipeline step
    per ragged operation (the awkward twin of ``reader.F``)."""

    def __init__(self, owner):
        self._owner = owner

    def __dir__(self):
        return sorted(_NS_FUNCS)

    def __getattr__(self, fn_name: str):
        if fn_name.startswith("_") or fn_name not in _NS_FUNCS:
            raise AttributeError(fn_name)

        def record(*args, **kwargs):
            pipe = self._owner._as_pipeline()
            return pipe.with_step(
                (
                    "apply",
                    "{func(intake_spark.ragged:apply_ragged)}",
                    [fn_name, *args],
                    kwargs,
                )
            )

        return record
