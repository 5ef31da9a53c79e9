"""Tokenizer — the single source of truth for term boundaries.

Semantics from the reference's collection schema (``db.py:241``
``token_separators: [".", "-", "_", "@", "/"]`` plus Typesense's default
whitespace splitting, lowercased): split on whitespace and ``. - _ @ /``,
lowercase, drop empties. ``plone.api`` → ``[plone, api]``,
``@plone/volto`` → ``[plone, volto]``.

The hot path is the JVM-side column expression (whole-stage codegen, no
Python): ``tokenize_col``. ``tokenize_py`` is the identical pure-Python
implementation shared by the NumPy oracle and unit tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyf_aggregator_spark import TOKEN_SEP_RE

_SEP = re.compile(TOKEN_SEP_RE)


def tokenize_col(col: Column | str) -> Column:
    """Array<string> of lowercase terms; JVM-side (codegen'd), no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SEP_RE), lambda t: t != F.lit(""))


def tokenize_py(text: str) -> list[str]:
    """Reference tokenizer (oracle + tests); must agree with tokenize_col."""
    return [t for t in _SEP.split(text.lower()) if t]
