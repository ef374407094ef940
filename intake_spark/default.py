"""Default user/global catalogs and the ``intake_spark.cat`` entry point.

Behavioral parity with the reference's out-of-box catalog discovery
(intake/catalog/default.py:21-96 — ``load_user_catalog`` /
``load_global_catalog`` / ``load_combo_catalog`` and the lazily-built
``intake.cat`` "builtin" catalog): YAML catalog files dropped into the
platform user data directory, the active environment's ``share`` directory,
or any path listed in ``conf["catalog_path"]`` are unioned into one catalog
without any per-project configuration.

Directory resolution is stdlib-only (the reference uses platformdirs):

- user dir: ``$XDG_DATA_HOME`` (or the platform equivalent) +
  ``intake_spark``
- global dir: the active virtualenv/conda prefix + ``share/intake_spark``,
  else the platform site data dir
- extra paths: ``conf["catalog_path"]`` (settable via the
  ``INTAKE_SPARK_CATALOG_PATH`` env var, ``os.pathsep``-separated; entries
  may be directories or direct ``.yaml``/``.yml`` paths)

Everything here is driver-side metadata work — no Spark session is touched
until an entry is actually read.
"""

from __future__ import annotations

import glob as _glob
import os
import sys

from intake_spark.config import conf


def user_data_dir() -> str:
    """Platform-specific per-user data directory for catalog files."""
    if sys.platform == "win32":
        base = os.environ.get("APPDATA") or os.path.expanduser("~")
    elif sys.platform == "darwin":
        base = os.path.expanduser("~/Library/Application Support")
    else:
        base = os.environ.get("XDG_DATA_HOME") or os.path.expanduser("~/.local/share")
    return os.path.join(base, "intake_spark")


def global_data_dir() -> str:
    """Environment-wide data directory: the active virtualenv/conda prefix's
    ``share/intake_spark``, else the platform site data dir."""
    prefix = os.environ.get("VIRTUAL_ENV") or os.environ.get("CONDA_PREFIX")
    if prefix:
        return os.path.join(prefix, "share", "intake_spark")
    if sys.platform == "win32":
        base = os.environ.get("PROGRAMDATA") or "C:/ProgramData"
        return os.path.join(base, "intake_spark")
    if sys.platform == "darwin":
        return "/Library/Application Support/intake_spark"
    return "/usr/local/share/intake_spark"


def _catalog_from_dir(cat_dir: str):
    """Union every ``*.yaml``/``*.yml`` in a directory into one Catalog
    (empty catalog when the directory does not exist — same contract as the
    reference's ``load_user_catalog``)."""
    from intake_spark.catalog import Catalog, open_catalog

    if not os.path.isdir(cat_dir):
        return Catalog()
    merged = Catalog()
    for pat in ("*.yaml", "*.yml"):
        for path in sorted(_glob.glob(os.path.join(cat_dir, pat))):
            merged += open_catalog(path)
    return merged


def load_user_catalog():
    """Catalog over the per-user data directory."""
    return _catalog_from_dir(user_data_dir())


def load_global_catalog():
    """Catalog over the environment/site data directory."""
    return _catalog_from_dir(global_data_dir())


def load_combo_catalog():
    """Union of user + global + ``conf["catalog_path"]`` catalogs — the
    out-of-box ``intake_spark.cat`` surface."""
    from intake_spark.catalog import Catalog, open_catalog

    from intake_spark.examples import examples_catalog

    merged = Catalog()
    merged += load_user_catalog()
    merged += load_global_catalog()
    merged += examples_catalog()
    for entry in conf.get("catalog_path", []):
        if not entry:
            continue
        if entry.endswith((".yaml", ".yml")):
            if os.path.exists(entry):
                merged += open_catalog(entry)
        else:
            merged += _catalog_from_dir(entry)
    merged.metadata["description"] = (
        "Generated from catalog files found on the intake_spark search path"
    )
    return merged
