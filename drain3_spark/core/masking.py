"""Python-side masking (regex canonicalization).

Semantics per reference drain3/masking.py:25-67: each rule substitutes
its regex hits with ``mask_prefix + mask_with + mask_suffix``; rules apply
sequentially in configuration order (order matters).

The Spark hot path applies the same chain as Catalyst-native
``regexp_replace`` expressions (drain3_spark.operators.masking); this class
backs the parameter-extraction regex builder and the mining UDFs, which
need the instruction registry grouped by mask name.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

from drain3_spark.config import MaskRule


class Masker:
    def __init__(self, rules: Sequence[MaskRule],
                 mask_prefix: str = "<", mask_suffix: str = ">") -> None:
        self.mask_prefix = mask_prefix
        self.mask_suffix = mask_suffix
        self.rules = list(rules)
        self._compiled = [(re.compile(r.pattern), r.mask_with) for r in self.rules]
        by_name: Dict[str, List[MaskRule]] = {}
        for r in self.rules:
            by_name.setdefault(r.mask_with, []).append(r)
        self._by_name = by_name

    @property
    def mask_names(self) -> List[str]:
        return list(self._by_name.keys())

    def rules_for(self, mask_name: str) -> List[MaskRule]:
        return self._by_name.get(mask_name, [])

    def mask(self, content: str) -> str:
        for rx, name in self._compiled:
            content = rx.sub(self.mask_prefix + name + self.mask_suffix, content)
        return content
