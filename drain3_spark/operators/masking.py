"""Catalyst-native masking chain.

The reference applies masking instructions sequentially per message in
Python (drain3/masking.py:57-60).  Here the same chain is a left fold of
``regexp_replace`` column expressions — JVM-side, whole-stage-codegen'd,
zero Python in the hot path.  Order is preserved because each
``regexp_replace`` wraps the previous expression.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, functions as F

from drain3_spark.config import MaskRule


def java_regex(py_pattern: str) -> str:
    """Translate the Python-regex constructs the reference config surface
    uses into Java regex (named groups / named back-references).  Both
    dialects share lookaround, classes, and quantifiers."""
    out = py_pattern.replace("(?P<", "(?<")
    out = re.sub(r"\(\?P=(\w+)\)", r"\\k<\1>", out)
    return out


def _literal_replacement(text: str) -> str:
    """Escape '$' and '\\' which are special in Java replacement strings."""
    return text.replace("\\", "\\\\").replace("$", "\\$")


def mask_col(col: Column, rules: Sequence[MaskRule],
             mask_prefix: str = "<", mask_suffix: str = ">") -> Column:
    """Fold the masking chain over ``col`` (reference drain3/masking.py:57-60)."""
    out = col
    for rule in rules:
        replacement = _literal_replacement(mask_prefix + rule.mask_with + mask_suffix)
        out = F.regexp_replace(out, java_regex(rule.pattern), replacement)
    return out
