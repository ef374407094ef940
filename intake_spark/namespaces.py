"""Function-namespace accessors for pipelines: ``pipe.F.upper("col")``.

Parity with the reference's numpy/pandas namespace accessors on readers
(intake/readers/namespaces.py:16-94) — tab-completable library functions
become recorded pipeline stages. Here the namespace is
``pyspark.sql.functions``: ``pipe.F.<fn>(col, *args, out="name")`` appends a
``withColumn`` step applying the JVM-side function, keeping the pipeline
serializable (the step records the function *name*, never the object).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def apply_function(df, fn_name: str, col: str, *args, out: str | None = None):
    """Importable executor for namespace steps: importable by name so the
    recorded step stays YAML-serializable."""
    fn = getattr(F, fn_name)
    return df.withColumn(out or col, fn(col, *args))


class FunctionNamespace:
    """Bound to a reader/pipeline; attribute access yields step recorders."""

    def __init__(self, owner):
        self._owner = owner

    def __dir__(self):
        return [n for n in dir(F) if not n.startswith("_")]

    def __getattr__(self, fn_name: str):
        if fn_name.startswith("_"):
            raise AttributeError(fn_name)
        if not hasattr(F, fn_name):
            raise AttributeError(f"pyspark.sql.functions has no {fn_name!r}")

        def record(col: str, *args, out: str | None = None):
            pipe = self._owner._as_pipeline()
            return pipe.with_step(
                (
                    "apply",
                    "{func(intake_spark.namespaces:apply_function)}",
                    [fn_name, col, *args],
                    {"out": out},
                )
            )

        return record
