"""Engine configuration (behavioral parity with intake/config.py:29-40).

``allow_import`` / ``allow_pickle`` are the security gates between "a
catalog file" and "arbitrary code execution": templates like
``{func(mod:name)}`` and ``{pickle64(...)}`` only resolve when enabled.
"""

from __future__ import annotations

import os
from typing import Any

defaults: dict[str, Any] = {
    # resolve {func(...)}/{import(...)} templates from catalogs
    "allow_import": True,
    # resolve {pickle64(...)} templates from catalogs (off: riskiest gate)
    "allow_pickle": False,
    # reader classes never to auto-select in recommendation/planning
    "reader_avoid": [],
    # max bytes sniffed from a file head during datatype detection
    "head_bytes": 2**20,
    # extra catalog search paths for the default combo catalog
    # (``intake_spark.cat``); env INTAKE_SPARK_CATALOG_PATH, pathsep-split
    "catalog_path": [],
}

conf: dict[str, Any] = dict(defaults)


def reset() -> None:
    conf.clear()
    conf.update(defaults)
    for key in defaults:
        env = os.environ.get(f"INTAKE_SPARK_{key.upper()}")
        if env is not None:
            if isinstance(defaults[key], bool):
                conf[key] = env.lower() in ("1", "true", "yes")
            elif isinstance(defaults[key], int):
                conf[key] = int(env)
            elif isinstance(defaults[key], list):
                conf[key] = [p for p in env.split(os.pathsep) if p]
            else:
                conf[key] = env


reset()
