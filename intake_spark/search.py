"""Search terms: composable boolean predicates over catalog entries.

Parity with intake/readers/search.py:11-139 — Text / And / Or / Not / Any /
All / Importable; evaluated against an entry description dict.
"""

from __future__ import annotations


class SearchBase:
    def __call__(self, entry: dict) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def __and__(self, other):
        return And(self, other)

    def __or__(self, other):
        return Or(self, other)

    def __invert__(self):
        return Not(self)


class Text(SearchBase):
    """Case-insensitive substring over the entry's full text description."""

    def __init__(self, text: str):
        self.text = text.lower()

    def __call__(self, entry: dict) -> bool:
        return self.text in repr(entry).lower()


class And(SearchBase):
    def __init__(self, *terms):
        self.terms = terms

    def __call__(self, entry: dict) -> bool:
        return all(t(entry) for t in self.terms)


class Or(SearchBase):
    def __init__(self, *terms):
        self.terms = terms

    def __call__(self, entry: dict) -> bool:
        return any(t(entry) for t in self.terms)


class Not(SearchBase):
    def __init__(self, term):
        self.term = term

    def __call__(self, entry: dict) -> bool:
        return not self.term(entry)


class Any(SearchBase):
    """Any of several substrings."""

    def __init__(self, *texts: str):
        self.terms = [Text(t) for t in texts]

    def __call__(self, entry: dict) -> bool:
        return any(t(entry) for t in self.terms)


class All(SearchBase):
    def __init__(self, *texts: str):
        self.terms = [Text(t) for t in texts]

    def __call__(self, entry: dict) -> bool:
        return all(t(entry) for t in self.terms)


class Importable(SearchBase):
    """Entry's reader class has its imports available."""

    def __call__(self, entry: dict) -> bool:
        from intake_spark.utils import import_name

        payload = entry.get("payload", entry)
        cls_str = payload.get("cls") or payload.get("reader", {}).get("cls", "")
        try:
            return import_name(cls_str).check_importable()
        except Exception:
            return False
