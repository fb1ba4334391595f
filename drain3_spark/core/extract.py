"""Template-slot parameter extraction.

Given a mined template (``... <NUM> ... <*> ...``) and a raw message,
recover the ordered slot values and their mask names.  Behavior mirrors
reference drain3/template_miner.py:205-331:

* each ``prefix+name+suffix`` placeholder in the (escaped) template is
  replaced by a uniquely-named capture group whose body is the union of
  that mask's source regexes (exact mode) and/or a lazy catch-all,
* named groups inside source regexes are renamed to fresh names to avoid
  collisions (back-references follow), unnamed numeric back-references are
  relaxed to ``(?:.+?)``,
* literal spaces become ``\\s+`` and the whole pattern is anchored,
* a non-matching message yields ``None``.

Regex construction runs once per distinct (template, exact) pair behind an
LRU cache (capacity per reference drain3/template_miner_config.py:29);
templates repeat heavily so per-row cost is one ``re.match``.
"""

from __future__ import annotations

import re
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

from drain3_spark.core.masking import Masker


class ParamExtractor:
    def __init__(self, masker: Masker, cache_capacity: int = 3000,
                 extra_delimiters: Tuple[str, ...] = ()) -> None:
        self.masker = masker
        self.cache_capacity = cache_capacity
        # applied as regex substitutions to the raw message
        # (reference drain3/template_miner.py:228-229)
        self.extra_delimiters = tuple(extra_delimiters)
        self._cache: "OrderedDict[Tuple[str, bool], Tuple[re.Pattern, Dict[str, str]]]" = \
            OrderedDict()

    # ------------------------------------------------------------- regex build

    def _build(self, template: str, exact: bool) -> Tuple[re.Pattern, Dict[str, str]]:
        group_to_mask: Dict[str, str] = {}
        counter = [0]

        def fresh_name() -> str:
            name = f"p_{counter[0]}"
            counter[0] += 1
            return name

        def capture_for(mask_name: str) -> str:
            bodies: List[str] = []
            if exact:
                for rule in self.masker.rules_for(mask_name):
                    body = rule.pattern
                    for gname in re.compile(body).groupindex:
                        alias = fresh_name()
                        body = body.replace(f"(?P<{gname}>", f"(?P<{alias}>")
                        body = body.replace(f"(?P={gname}", f"(?P={alias}")
                    # relax unnamed numeric back-references (simple cases)
                    body = re.sub(r"\\(?!0)\d{1,2}", r"(?:.+?)", body)
                    bodies.append(body)
            if not exact or mask_name == "*":
                bodies.append(r".+?")
            slot = fresh_name()
            group_to_mask[slot] = mask_name
            return f"(?P<{slot}>{'|'.join(bodies)})"

        names = set(self.masker.mask_names)
        names.add("*")  # the mining wildcard is always a valid slot
        pfx = re.escape(self.masker.mask_prefix)
        sfx = re.escape(self.masker.mask_suffix)
        pattern = re.escape(template)
        for mask_name in names:
            placeholder = pfx + re.escape(mask_name) + sfx
            while placeholder in pattern:
                pattern = pattern.replace(placeholder, capture_for(mask_name), 1)
        pattern = re.sub(r"\\ ", r"\\s+", pattern)  # whitespace-tolerant
        return re.compile(f"^{pattern}$"), group_to_mask

    def _cached(self, template: str, exact: bool) -> Tuple[re.Pattern, Dict[str, str]]:
        key = (template, exact)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        built = self._build(template, exact)
        if len(self._cache) >= self.cache_capacity:
            self._cache.popitem(last=False)
        self._cache[key] = built
        return built

    # ------------------------------------------------------------- extraction

    def extract(self, template: str, message: str,
                exact_matching: bool = True) -> Optional[List[Tuple[str, str]]]:
        """Ordered ``(value, mask_name)`` pairs, or None on mismatch
        (reference drain3/template_miner.py:205-249)."""
        for d in self.extra_delimiters:
            message = re.sub(d, " ", message)
        rx, group_to_mask = self._cached(template, exact_matching)
        m = rx.match(message)
        if m is None:
            return None
        out: List[Tuple[str, str]] = []
        for gname, value in m.groupdict().items():
            mask_name = group_to_mask.get(gname)
            if mask_name is not None:
                out.append((value, mask_name))
        return out

    def values(self, template: str, message: str) -> List[str]:
        """Values-only convenience (reference drain3/template_miner.py:188-203,
        non-exact matching)."""
        pairs = self.extract(template, message, exact_matching=False)
        return [v for v, _ in pairs] if pairs else []
