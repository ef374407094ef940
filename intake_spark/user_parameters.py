"""User parameters: typed, validated, templated values for catalog entries.

Parity with intake/readers/user_parameters.py:78-165 (parameter classes)
and :170-313 (template substitution). Templates supported in entry kwargs:

- ``"{param}"``          → substitute parameter value (whole-string keeps type)
- ``"env(NAME)"``        → environment variable
- ``"{func(mod:name)}"`` → importable function (gated by conf['allow_import'])
- ``"{data(token)}"``    → reference to another catalog entry (resolved by
  the catalog at rehydrate time, not here)
"""

from __future__ import annotations

import os
import re
from typing import Any

from intake_spark.utils import Tokenizable, is_func_str, str_to_func, walk_replace
from intake_spark.config import conf


class BaseUserParameter(Tokenizable):
    def __init__(self, default=None, description: str = ""):
        self.default = default
        self.description = description

    def coerce(self, value):
        return value

    def validate(self, value) -> bool:
        return True

    def set_value(self, value):
        value = self.coerce(value)
        if not self.validate(value):
            raise ValueError(f"invalid value {value!r} for {self}")
        return value

    def to_dict(self) -> dict:
        from intake_spark.utils import qname

        return {"cls": qname(self), **{k: v for k, v in self.__dict__.items() if not k.startswith("_")}}

    @classmethod
    def from_dict(cls, d: dict) -> "BaseUserParameter":
        from intake_spark.utils import import_name

        d = dict(d)
        pcls = import_name(d.pop("cls"))
        obj = pcls.__new__(pcls)
        obj.__dict__.update(d)
        return obj


class SimpleUserParameter(BaseUserParameter):
    """Coerce to a python type (parity: user_parameters.py:78-97)."""

    def __init__(self, dtype: type = str, default=None, description: str = ""):
        super().__init__(default=default, description=description)
        self.dtype_name = dtype.__name__ if isinstance(dtype, type) else str(dtype)

    @property
    def _dtype(self):
        import builtins

        return getattr(builtins, self.dtype_name)

    def coerce(self, value):
        if value is None:
            return None
        return value if isinstance(value, self._dtype) else self._dtype(value)


class OptionsUserParameter(SimpleUserParameter):
    """Value must be one of the declared options (user_parameters.py:100-120)."""

    def __init__(self, options: list, dtype: type = str, default=None, description: str = ""):
        super().__init__(dtype=dtype, default=default, description=description)
        self.options = list(options)

    def validate(self, value) -> bool:
        return value in self.options


class MultiOptionUserParameter(OptionsUserParameter):
    """List of values, each from options (user_parameters.py:123-140)."""

    def coerce(self, value):
        if value is None:
            return []
        return [super(OptionsUserParameter, self).coerce(v) for v in value]

    def validate(self, value) -> bool:
        return all(v in self.options for v in value)


class BoundedNumberUserParameter(SimpleUserParameter):
    """Numeric value within [min, max] (user_parameters.py:143-165)."""

    def __init__(self, min_value=None, max_value=None, dtype: type = float, default=None, description: str = ""):
        super().__init__(dtype=dtype, default=default, description=description)
        self.min_value = min_value
        self.max_value = max_value

    def validate(self, value) -> bool:
        if value is None:
            return True
        lo_ok = self.min_value is None or value >= self.min_value
        hi_ok = self.max_value is None or value <= self.max_value
        return lo_ok and hi_ok


_PARAM_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")
_ENV_RE = re.compile(r"^env\(([A-Za-z_][A-Za-z0-9_]*)\)$")
DATA_REF_RE = re.compile(r"^\{data\(([0-9a-f]{16})\)\}$")


def substitute(obj: Any, params: dict[str, Any]) -> Any:
    """Walk nested kwargs applying template substitution.

    Whole-string ``"{param}"`` keeps the parameter's python type; embedded
    ``"a{param}b"`` interpolates as text (parity: user_parameters.py:252-313).
    ``{data(...)}`` refs are left intact for the catalog to resolve.
    """

    def one(v):
        if not isinstance(v, str):
            return v
        env = _ENV_RE.match(v)
        if env:
            return os.environ.get(env.group(1), "")
        if is_func_str(v):
            return str_to_func(v, allow_import=conf["allow_import"])
        if DATA_REF_RE.match(v):
            return v
        m = _PARAM_RE.fullmatch(v)
        if m and m.group(1) in params:
            return params[m.group(1)]

        def interp(match):
            name = match.group(1)
            return str(params[name]) if name in params else match.group(0)

        return _PARAM_RE.sub(interp, v)

    return walk_replace(obj, one)
