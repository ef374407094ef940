"""Lazy, serializable pipelines: recorded step chains over a reader.

Re-expresses the reference's Pipeline/mixin design (intake/readers/
convert.py:855-1069, intake/readers/mixins.py) with one deliberate delta:
method calls are recorded as *data* — ``("method", name, args, kwargs)`` —
never as bound methods or closures, so every pipeline serializes to YAML
trivially and replays against a live DataFrame at ``read()`` time
(SURVEY §3.3 notes this as the porting plan).

Steps:
- ``("getitem", key)``        → ``df[key]`` / ``df.select(cols)``
- ``("method", name, a, kw)`` → whitelisted method call on current object
- ``("apply", func_str, a, kw)`` → arbitrary importable function (gated)

Each chaining call returns a NEW Pipeline (immutable accumulation, like
reference ``with_step`` convert.py:1004-1013).
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame
from pyspark.sql.group import GroupedData

from intake_spark.config import conf
from intake_spark.utils import Tokenizable, func_to_str, is_func_str, str_to_func

# Methods replayable on intermediate objects. Computed from the live classes
# so the allowlist tracks the installed Spark version; dunder and private
# names stay excluded (the reference's Method passthrough is unrestricted —
# mixins.py:15-31 — which is unsafe to serialize; this is the safe subset).
_ALLOWED_METHODS: set[str] = {
    name
    for cls in (DataFrame, GroupedData)
    for name in dir(cls)
    # properties/attributes (df.columns, df.schema) are not replayable
    # method steps — admitting them defers a clean record-time error to a
    # confusing 'list is not callable' at run time
    if not name.startswith("_") and callable(getattr(cls, name, None))
}


class PipelineError(RuntimeError):
    """Raised with the failing step index (parity: PipelineStepError,
    intake/source/derived.py:15-22)."""

    def __init__(self, stage: int, step, cause: Exception):
        super().__init__(f"pipeline step {stage} {step!r} failed: {cause}")
        self.stage = stage
        self.step = step
        self.cause = cause


class PipelineMixin:
    """Adds ``reader[...]`` / ``reader.method(...)`` / ``reader.apply(f)``
    chaining to readers; every call records a step and returns a Pipeline."""

    def _as_pipeline(self) -> "Pipeline":
        from intake_spark.readers import BaseReader

        assert isinstance(self, BaseReader)
        return Pipeline(reader=self, steps=[])

    @property
    def F(self):
        """pyspark.sql.functions namespace accessor (parity: reference
        reader.np/.pd namespaces, intake/readers/namespaces.py:16-94)."""
        from intake_spark.namespaces import FunctionNamespace

        return FunctionNamespace(self)

    @property
    def ak(self):
        """Ragged-array namespace accessor — awkward-style verbs over
        ArrayType columns as recorded steps (parity: the reference's
        awkward reader family, readers.py:927-978)."""
        from intake_spark.ragged import RaggedNamespace

        return RaggedNamespace(self)

    def __getitem__(self, item):
        return self._as_pipeline().with_step(("getitem", item))

    def __getattr__(self, name: str):
        if name.startswith("_") or name in self.__dict__:
            raise AttributeError(name)
        if name not in _ALLOWED_METHODS:
            raise AttributeError(
                f"{name!r} is not an allowed pipeline method (DataFrame/GroupedData API only)"
            )
        pipeline = self._as_pipeline()

        def record(*args, **kwargs):
            return pipeline.with_step(("method", name, list(args), kwargs))

        return record

    def apply(self, func, *args, **kwargs):
        """Append an arbitrary function stage: ``func(prev, *args, **kwargs)``.
        ``func`` must be importable (serialized by name, never pickled)."""
        return self._as_pipeline().with_step(("apply", func_to_str(func), list(args), kwargs))


class Pipeline(PipelineMixin, Tokenizable):
    def __init__(self, reader, steps: Iterable[tuple] | None = None):
        self.reader = reader
        self.steps = [tuple(s) for s in (steps or [])]

    # -- building -----------------------------------------------------------

    def with_step(self, step: tuple) -> "Pipeline":
        return Pipeline(reader=self.reader, steps=[*self.steps, step])

    def _as_pipeline(self) -> "Pipeline":
        return self

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in _ALLOWED_METHODS:
            raise AttributeError(f"{name!r} is not an allowed pipeline method")

        def record(*args, **kwargs):
            return self.with_step(("method", name, list(args), kwargs))

        return record

    # -- executing ----------------------------------------------------------

    @staticmethod
    def _run_step(obj: Any, step: tuple, stage: int) -> Any:
        try:
            kind = step[0]
            if kind == "getitem":
                key = step[1]
                if isinstance(obj, DataFrame) and isinstance(key, (list, tuple)):
                    return obj.select(*key)
                if isinstance(obj, DataFrame) and isinstance(key, str):
                    # df['col'] is an unbound Column, useless as a pipeline
                    # stage result — a recorded single-column getitem means
                    # the one-column frame
                    return obj.select(key)
                return obj[key]
            if kind == "method":
                _, name, args, kwargs = step
                return getattr(obj, name)(*args, **kwargs)
            if kind == "apply":
                _, func_str, args, kwargs = step
                func = str_to_func(func_str, allow_import=conf["allow_import"])
                return func(obj, *args, **kwargs)
            raise ValueError(f"unknown step kind {kind!r}")
        except Exception as exc:  # noqa: BLE001 - rewrap with stage index
            if isinstance(exc, PipelineError):
                raise
            raise PipelineError(stage, step, exc) from exc

    def read(self, spark=None, first_n_stages: int | None = None):
        """Execute: reader.read() then replay steps (all lazy DataFrame ops
        until an action). ``first_n_stages`` enables stepwise debugging
        (parity: convert.py:1015-1069)."""
        obj = self.reader.read(spark=spark)
        n = len(self.steps) if first_n_stages is None else first_n_stages
        for i, step in enumerate(self.steps[:n]):
            obj = self._run_step(obj, step, i)
        return obj

    def discover(self, spark=None):
        """Sample execution: source sampled, transforms run normally
        (policy parity: convert.py:936-954)."""
        obj = self.reader.discover(spark=spark)
        for i, step in enumerate(self.steps):
            obj = self._run_step(obj, step, i)
        return obj

    def read_stepwise(self, spark=None) -> "PipelineExecution":
        return PipelineExecution(self, spark=spark)

    # -- description --------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "reader": self.reader.to_dict(),
            "steps": [list(s) for s in self.steps],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Pipeline":
        from intake_spark.readers import reader_from_dict

        return cls(reader=reader_from_dict(d["reader"]), steps=[tuple(s) for s in d["steps"]])


class PipelineExecution:
    """Stepwise executor for debugging (reference convert.py:1015-1069)."""

    def __init__(self, pipeline: Pipeline, spark=None):
        self.pipeline = pipeline
        self.spark = spark
        self.stage = 0
        self.current: Any = None

    def step(self):
        if self.done:
            raise StopIteration(
                f"pipeline execution finished after {len(self.pipeline.steps)} steps"
            )
        if self.stage == 0:
            self.current = self.pipeline.reader.read(spark=self.spark)
        else:
            self.current = Pipeline._run_step(
                self.current, self.pipeline.steps[self.stage - 1], self.stage - 1
            )
        self.stage += 1
        return self.current

    @property
    def done(self) -> bool:
        return self.stage > len(self.pipeline.steps)


class Condition:
    """Ternary over readers (parity: readers.py:1657-1670): pick which
    lineage to build, driver-side."""

    def __init__(self, if_true, if_false, condition):
        self.if_true = if_true
        self.if_false = if_false
        self.condition = condition

    def read(self, spark=None):
        cond = self.condition
        if callable(cond):
            cond = cond(spark)
        chosen = self.if_true if cond else self.if_false
        return chosen.read(spark=spark)


class Retry:
    """Retry a reader/pipeline with exponential backoff (parity:
    readers.py:1748-1796). Spark task-level retries are built-in; this
    covers *driver-side* failures (flaky services, eventual consistency)."""

    def __init__(self, reader, max_tries=3, allowed_exceptions=(Exception,), backoff0=0.1, backoff_factor=2.0):
        if max_tries < 1:
            # a 0-try retry would silently return None from read()
            raise ValueError(f"max_tries must be >= 1, got {max_tries}")
        self.reader = reader
        self.max_tries = max_tries
        self.allowed_exceptions = tuple(allowed_exceptions)
        self.backoff0 = backoff0
        self.backoff_factor = backoff_factor

    def read(self, spark=None):
        import time

        delay = self.backoff0
        for attempt in range(self.max_tries):
            try:
                return self.reader.read(spark=spark)
            except self.allowed_exceptions:
                if attempt == self.max_tries - 1:
                    raise
                time.sleep(delay)
                delay *= self.backoff_factor
