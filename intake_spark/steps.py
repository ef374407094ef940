"""Declarative dataframe pipeline: YAML-able step verbs over named targets.

Parity with the reference's V1 ``DataFramePipeline`` (intake/source/
derived.py:316-478) — the closest thing it has to a logical plan — with
every verb lowered to a lazy Spark DataFrame operation so Catalyst does the
physical planning (join strategy, pushdown, AQE). Verbs:

    cols / query / assign / join / merge / concat / groupby / agg /
    sort / limit / distinct / dropna / fillna / rename / sample /
    window / accessor methods (str.*, dt.*) / apply (importable func)

A step is ``{verb: args}``; a plan is ``{"targets": {...}, "steps": [...]}``.
Targets are DataFrames, readers, or catalog entry names.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from intake_spark.config import conf
from intake_spark.utils import str_to_func, is_func_str


class MissingTargetError(KeyError):
    """A step referenced an undeclared target (parity: derived.py:19-22)."""


class StepError(RuntimeError):
    """Step-indexed failure (parity: PipelineStepError derived.py:15-18)."""

    def __init__(self, i: int, verb: str, cause: Exception):
        super().__init__(f"step {i} ({verb}) failed: {cause}")
        self.step_index = i
        self.verb = verb


# accessor namespace → pyspark function mapping for ``str.x`` / ``dt.x``
# steps (parity: derived.py:405-409 pandas accessor passthrough)
_STR_FUNCS = {
    "lower": F.lower,
    "upper": F.upper,
    "trim": F.trim,
    "length": F.length,
    "reverse": F.reverse,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
}
_DT_FUNCS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "dayofweek": F.dayofweek,
    "dayofyear": F.dayofyear,
    "quarter": F.quarter,
    "date": F.to_date,
}

_AGG_FUNCS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "first": F.first,
    "last": F.last,
    "countDistinct": F.countDistinct,
    "stddev": F.stddev,
    "variance": F.variance,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}


def _agg_exprs(spec: dict[str, Any]) -> list[Column]:
    """{"out_col": {"fn": "sum", "col": "x"}} or {"out": "sum(x)"} forms."""
    out = []
    for name, how in spec.items():
        if isinstance(how, str):
            out.append(F.expr(how).alias(name))
        else:
            fn = _AGG_FUNCS[how["fn"]]
            out.append(fn(how["col"]).alias(name))
    return out


class DataFramePipeline:
    """Executes a declarative step list against named targets.

    ``targets`` values may be DataFrames, readers/pipelines (``.read()``
    called lazily), or callables returning DataFrames.
    """

    def __init__(self, targets: dict[str, Any], steps: list[dict], spark=None):
        self.targets = targets
        self.steps = steps
        self.spark = spark

    def _target(self, name: str) -> DataFrame:
        if name not in self.targets:
            raise MissingTargetError(name)
        t = self.targets[name]
        if isinstance(t, DataFrame):
            return t
        if hasattr(t, "read"):
            return t.read(spark=self.spark)
        if callable(t):
            return t(self.spark)
        raise TypeError(f"target {name!r} is not a DataFrame/reader/callable")

    # -- verb implementations -----------------------------------------------

    def _v_target(self, df, arg):
        return self._target(arg)

    def _v_cols(self, df, arg):
        cols = arg["columns"] if isinstance(arg, dict) else arg
        return df.select(*cols)

    def _v_query(self, df, arg):
        return df.filter(arg)

    def _v_assign(self, df, arg: dict):
        for name, spec in arg.items():
            if isinstance(spec, str) and spec.startswith("expr:"):
                df = df.withColumn(name, F.expr(spec[5:]))
            elif isinstance(spec, dict) and "target" in spec:
                # column from another entry, joined on an index column
                other = self._target(spec["target"]).select(
                    spec["on"], F.col(spec["column"]).alias(name)
                )
                df = df.join(other, on=spec["on"], how="left")
            else:
                df = df.withColumn(name, F.lit(spec))
        return df

    def _v_join(self, df, arg: dict):
        """Index-style join vs other targets with suffix renames
        (parity: derived.py:425-436)."""
        others = arg["other"] if isinstance(arg["other"], list) else [arg["other"]]
        on = arg["on"]
        on_cols = on if isinstance(on, list) else [on]
        rsuffix = arg.get("rsuffix", "_r")
        for name in others:
            other = self._target(name)
            clash = (set(df.columns) & set(other.columns)) - set(on_cols)
            for c in clash:
                other = other.withColumnRenamed(c, c + rsuffix)
            df = df.join(other, on=on, how=arg.get("how", "left"))
        return df

    def _v_merge(self, df, arg: dict):
        """Relational merge (parity: derived.py:438-445); Catalyst picks
        broadcast vs sort-merge; pass ``broadcast: true`` to hint."""
        right = self._target(arg["right"])
        if arg.get("broadcast"):
            right = F.broadcast(right)
        return df.join(right, on=arg["on"], how=arg.get("how", "inner"))

    def _v_concat(self, df, arg):
        """Row union by name (parity: derived.py:452-455 axis=0)."""
        names = arg["dfs"] if isinstance(arg, dict) else arg
        out = df
        for name in names:
            out = out.unionByName(self._target(name), allowMissingColumns=True)
        return out

    def _v_groupby(self, df, arg):
        by = arg["by"] if isinstance(arg, dict) else arg
        by = [by] if isinstance(by, str) else list(by)
        if isinstance(arg, dict) and "agg" in arg:
            return df.groupBy(*by).agg(*_agg_exprs(arg["agg"]))
        # bare groupby waits for a following agg/method step
        return df.groupBy(*by)

    def _v_agg(self, df, arg):
        # DataFrame and GroupedData share the agg surface
        return df.agg(*_agg_exprs(arg))

    def _v_sort(self, df, arg):
        if isinstance(arg, dict):
            cols = arg["by"] if isinstance(arg["by"], list) else [arg["by"]]
            asc = arg.get("ascending", True)
            ascs = asc if isinstance(asc, list) else [asc] * len(cols)
            exprs = [F.asc(c) if a else F.desc(c) for c, a in zip(cols, ascs)]
            return df.orderBy(*exprs)
        return df.orderBy(arg)

    def _v_limit(self, df, arg):
        return df.limit(int(arg))

    def _v_distinct(self, df, arg):
        if isinstance(arg, (list, tuple)):
            return df.dropDuplicates(list(arg))
        return df.distinct()

    def _v_dropna(self, df, arg):
        if isinstance(arg, dict):
            return df.dropna(**arg)
        return df.dropna()

    def _v_fillna(self, df, arg):
        return df.fillna(arg)

    def _v_rename(self, df, arg: dict):
        for old, new in arg.items():
            df = df.withColumnRenamed(old, new)
        return df

    def _v_sample(self, df, arg: dict):
        return df.sample(
            fraction=float(arg["fraction"]), seed=int(arg.get("seed", 42)),
            withReplacement=bool(arg.get("replace", False)),
        )

    def _v_window(self, df, arg: dict):
        """Window verb: {"partition_by": [...], "order_by": [...],
        "exprs": {"out": "row_number()" | "sum(x)"}, "desc": bool}."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(*arg.get("partition_by", []))
        order = arg.get("order_by", [])
        if order:
            exprs = [F.desc(c) if arg.get("desc") else F.asc(c) for c in order]
            w = w.orderBy(*exprs)
        for name, expr in arg["exprs"].items():
            df = df.withColumn(name, F.expr(expr).over(w))
        return df

    def _v_pivot(self, df, arg: dict):
        """{"by": group_cols, "pivot": col, "values": [..], "agg": {...}}.
        Explicit ``values`` keeps the plan single-pass (no distinct scan)."""
        by = arg["by"] if isinstance(arg["by"], list) else [arg["by"]]
        g = df.groupBy(*by).pivot(arg["pivot"], arg.get("values"))
        return g.agg(*_agg_exprs(arg["agg"]))

    def _v_explode(self, df, arg):
        """{"col": c, "out": o} or just the column name."""
        col = arg["col"] if isinstance(arg, dict) else arg
        out = arg.get("out", col) if isinstance(arg, dict) else col
        return df.withColumn(out, F.explode(col))

    def _v_rollup(self, df, arg: dict):
        by = arg["by"] if isinstance(arg["by"], list) else [arg["by"]]
        return df.rollup(*by).agg(*_agg_exprs(arg["agg"]))

    def _v_cube(self, df, arg: dict):
        by = arg["by"] if isinstance(arg["by"], list) else [arg["by"]]
        return df.cube(*by).agg(*_agg_exprs(arg["agg"]))

    def _v_watermark(self, df, arg: dict):
        """{"col": ts_col, "delay": "2 hours"} — event-time watermark
        (streaming state bound; no-op semantics change on batch)."""
        return df.withWatermark(arg["col"], arg["delay"])

    def _v_time_window(self, df, arg: dict):
        """{"col": ts, "duration": "1 hour", "slide": opt, "agg": {...},
        "by": opt extra keys} — tumbling/sliding event-time windows."""
        w = (
            F.window(arg["col"], arg["duration"], arg["slide"])
            if arg.get("slide")
            else F.window(arg["col"], arg["duration"])
        )
        keys = [w.alias("window")] + [F.col(c) for c in arg.get("by", [])]
        out = df.groupBy(*keys).agg(*_agg_exprs(arg["agg"]))
        return out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[c for c in out.columns if c != "window"],
        )

    def _v_accessor(self, df, arg: dict):
        """{"namespace": "str"|"dt", "fn": "lower", "col": "c", "out": "o"}"""
        table = _STR_FUNCS if arg["namespace"] == "str" else _DT_FUNCS
        fn = table[arg["fn"]]
        return df.withColumn(arg.get("out", arg["col"]), fn(arg["col"]))

    def _v_apply(self, df, arg):
        """Arbitrary importable function stage (parity: derived.py:447-450),
        gated like all function templates."""
        if isinstance(arg, dict):
            func = arg["func"]
            kwargs = arg.get("kwargs", {})
        else:
            func, kwargs = arg, {}
        if isinstance(func, str):
            fstr = func if is_func_str(func) else f"{{func({func})}}"
            func = str_to_func(fstr, allow_import=conf["allow_import"])
        return func(df, **kwargs)

    def _v_method(self, df, arg):
        """Fallback: a DataFrame method by name (parity: derived.py:457-461),
        restricted to the same replayable-method allowlist the recorded
        pipeline uses — the reference's unrestricted passthrough admits
        properties (a confusing 'list is not callable' at run time) and
        unvetted side-effecting calls from catalog YAML."""
        from intake_spark.pipeline import _ALLOWED_METHODS

        name = arg["name"] if isinstance(arg, dict) else arg
        args = arg.get("args", []) if isinstance(arg, dict) else []
        kwargs = arg.get("kwargs", {}) if isinstance(arg, dict) else {}
        if name not in _ALLOWED_METHODS:
            raise ValueError(
                f"method {name!r} is not a replayable DataFrame method"
            )
        return getattr(df, name)(*args, **kwargs)

    # -- driver --------------------------------------------------------------

    def execute(self) -> DataFrame:
        if not self.steps:
            raise ValueError("empty step list")
        first = self.steps[0]
        if "target" not in first:
            raise ValueError("first step must be {'target': name}")
        df: Any = None
        for i, step in enumerate(self.steps):
            if len(step) != 1:
                # a two-key mapping is an easy YAML indentation mistake;
                # keep the step-indexed error contract for it too
                raise StepError(
                    i,
                    "/".join(map(str, step)),
                    ValueError("each step must be a single {verb: arg} mapping"),
                )
            (verb, arg), = step.items()
            impl = getattr(self, f"_v_{verb}", None)
            if impl is None:
                raise StepError(i, verb, ValueError(f"unknown verb {verb!r}"))
            try:
                df = impl(df, arg)
            except StepError:
                raise
            except MissingTargetError:
                raise
            except Exception as exc:  # noqa: BLE001
                raise StepError(i, verb, exc) from exc
        return df


def run_steps(targets: dict[str, Any], steps: list[dict], spark=None) -> DataFrame:
    return DataFramePipeline(targets, steps, spark=spark).execute()
