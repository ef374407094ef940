"""Core kernel: deterministic tokenization, subclass registries,
import-string function serialization, and nested-kwargs helpers.

Re-expresses (without copying) the reference's kernel behavior:
- ``Tokenizable`` deterministic hashing — intake/readers/utils.py:249-317
- ``subclasses`` registry walk — intake/readers/utils.py:19-29
- function ↔ import-string round-trip — intake/readers/utils.py:101-131
- nested merge / template walk — intake/readers/utils.py:33-99
"""

from __future__ import annotations

import hashlib
import importlib
import re
from typing import Any, Callable


def qname(obj) -> str:
    """Qualified name ``module:ClassName`` for a class or instance type."""
    cls = obj if isinstance(obj, type) else type(obj)
    return f"{cls.__module__}:{cls.__name__}"


def import_name(name: str) -> Any:
    """Import ``module:attr`` / ``module.attr`` strings back to objects."""
    if ":" in name:
        mod, _, attr = name.partition(":")
    else:
        mod, _, attr = name.rpartition(".")
    obj = importlib.import_module(mod)
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj


def func_to_str(func: Callable) -> str:
    """Serialize a named function/class to ``{func(module:qualname)}``.

    Dynamically-defined and lambda functions are rejected — a catalog file
    must never require pickling code to rehydrate.
    """
    if not callable(func):
        raise TypeError(f"not callable: {func!r}")
    name = getattr(func, "__qualname__", getattr(func, "__name__", ""))
    mod = getattr(func, "__module__", "")
    if not mod or "<lambda>" in name or "<locals>" in name or mod == "__main__":
        raise ValueError(
            f"cannot serialize dynamic/lambda/__main__ function {func!r}; "
            "define it in an importable module"
        )
    return f"{{func({mod}:{name})}}"


_FUNC_RE = re.compile(r"^\{func\(([^)]+)\)\}$")


def str_to_func(text: str, allow_import: bool = True) -> Callable:
    m = _FUNC_RE.match(text)
    if not m:
        raise ValueError(f"not a func template: {text!r}")
    if not allow_import:
        raise PermissionError(
            "function import from catalog is disabled (conf['allow_import']=False)"
        )
    return import_name(m.group(1))


def is_func_str(value: Any) -> bool:
    return isinstance(value, str) and bool(_FUNC_RE.match(value))


def subclasses(cls: type) -> set[type]:
    """All (transitive) subclasses of ``cls`` currently imported."""
    out: set[type] = set()
    stack = [cls]
    while stack:
        c = stack.pop()
        for sub in c.__subclasses__():
            if sub not in out:
                out.add(sub)
                stack.append(sub)
    return out


def _canonical(obj: Any) -> Any:
    """Reduce an object tree to deterministic, hashable primitives."""
    if isinstance(obj, Tokenizable):
        return {"__cls__": qname(obj), **{k: _canonical(v) for k, v in sorted(obj.__dict__.items()) if not k.startswith("_")}}
    if isinstance(obj, dict):
        return {str(k): _canonical(v) for k, v in sorted(obj.items(), key=lambda kv: str(kv[0]))}
    if isinstance(obj, (list, tuple)):
        return [_canonical(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    if isinstance(obj, type):
        return f"{obj.__module__}:{obj.__name__}"
    if callable(obj):
        try:
            return func_to_str(obj)
        except ValueError:
            return repr(obj)
    return repr(obj)


def tokenize(obj: Any) -> str:
    """Deterministic 16-hex-char content token (md5 of the canonical repr).

    Tokens are the content-addressed keys of catalog entries; equal
    descriptions always collide, so re-adding a known entry dedups for free.
    """
    import json

    payload = json.dumps(_canonical(obj), sort_keys=True, default=repr)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


class Tokenizable:
    """Base for datatypes / readers / entries: deterministic identity token
    derived from class + public attributes; equality and hashing follow."""

    @property
    def token(self) -> str:
        return tokenize(self)

    def __hash__(self) -> int:
        return int(self.token, 16)

    def __eq__(self, other) -> bool:
        return isinstance(other, Tokenizable) and self.token == other.token

    def __repr__(self) -> str:
        attrs = ", ".join(
            f"{k}={v!r}" for k, v in sorted(self.__dict__.items()) if not k.startswith("_")
        )
        return f"{type(self).__name__}({attrs})"


def merge_dicts(base: dict, override: dict) -> dict:
    """Recursive dict merge (override wins; nested dicts merge)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def walk_replace(obj: Any, fn: Callable[[Any], Any]) -> Any:
    """Apply ``fn`` to every leaf of a nested dict/list/tuple structure."""
    if isinstance(obj, dict):
        return {k: walk_replace(v, fn) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(walk_replace(v, fn) for v in obj)
    return fn(obj)


def pattern_to_glob(pattern: str) -> str:
    """Convert a ``{field}``-style path pattern to a glob: ``{...}`` → ``*``.

    Mirrors the reference's pattern→glob behavior
    (intake/readers/utils.py:435-474) for path-derived columns.
    """
    return re.sub(r"\{[^}]*\}", "*", pattern)


def reverse_format(pattern: str, value: str) -> dict[str, str]:
    """Extract ``{field}`` captures from a concrete string.

    ``reverse_format("a_{x}_{y}.csv", "a_1_2.csv") -> {"x": "1", "y": "2"}``
    (behavioral parity with intake/source/utils.py:73-154, fresh impl).
    """
    names, rx = pattern_capture_regex(pattern)
    m = re.match(rx, value)
    if not m:
        raise ValueError(f"{value!r} does not match pattern {pattern!r}")
    return dict(zip(names, m.groups()))


def pattern_capture_regex(pattern: str) -> tuple[list, str]:
    """``{field}`` pattern → (field names, capture regex) — the ONE parse
    shared by the driver-side reverse_format and the Spark-side
    PatternCSV/array pattern readers (two copies had to stay in sync
    before)."""
    names = re.findall(r"\{([^}:]*)(?::[^}]*)?\}", pattern)
    parts = re.split(r"\{[^}]*\}", pattern)
    rx = "(.*?)".join(re.escape(p) for p in parts) + "$"
    return names, rx


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit (public algorithm; the hash Iceberg's bucket[N]
    partition transform specifies, Appendix B). Returns the UNSIGNED
    32-bit value; Iceberg buckets via (h & 0x7FFFFFFF) % N."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    ln = len(data)
    rounded = ln - (ln & 3)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= ln
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def iceberg_bucket(value, n: int, kind: str) -> "int | None":
    """Iceberg bucket[N] transform for one value: murmur3_32 of the
    spec's single-value serialization (ints/longs/dates/timestamps as
    8-byte little-endian signed longs — dates as epoch days, timestamps
    as epoch micros — strings as UTF-8), then (h & Int.MaxValue) % N."""
    import datetime as _dtm

    # None, float NaN (nullable int columns reach a pandas_udf as
    # float64) and NaT all mean null -> null bucket. NaN/NaT are the
    # only values that are != themselves.
    if value is None or value != value:
        return None
    if kind == "string":
        b = str(value).encode("utf-8")
    elif kind == "date":
        if isinstance(value, _dtm.datetime):
            value = value.date()
        days = (value - _dtm.date(1970, 1, 1)).days
        b = days.to_bytes(8, "little", signed=True)
    elif kind in ("timestamp", "timestamptz"):
        if hasattr(value, "to_pydatetime"):
            value = value.to_pydatetime()
        epoch = _dtm.datetime(1970, 1, 1, tzinfo=value.tzinfo)
        micros = round((value - epoch).total_seconds() * 1_000_000)
        b = micros.to_bytes(8, "little", signed=True)
    else:  # int / long
        b = int(value).to_bytes(8, "little", signed=True)
    h = murmur3_32(b)
    return (h & 0x7FFFFFFF) % n


def trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — the Spark SQL ``div`` /
    DuckDB ``(a - a % b) / b`` convention. Python's ``//`` floors, which
    differs on negative operands; the fixed-point trainers (classifier,
    power-iteration PCA) replay engine arithmetic on the driver, so their
    division must match the engines bit for bit."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q
