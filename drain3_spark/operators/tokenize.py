"""Tokenization and mining-group-key derivation as column expressions.

Tokenization semantics per reference drain3/drain.py:181-186: strip,
replace each extra delimiter with a space, split on whitespace runs;
an empty string yields an empty array (``"".split() == []``).

The group key re-expresses the reference's fixed-depth prefix tree
(drain3/drain.py:282-318) as a *partitioning scheme*: level 1 is the
token count, deeper levels are the first ``depth-2 - 1`` tokens with
digit-containing tokens canonicalized to the wildcard
(drain3/drain.py:356-362).  Hash-partitioning on this key gives each
task exactly the candidate set a tree descent would reach.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, functions as F

from drain3_spark.config import EngineConfig


def tokens_col(col: Column, extra_delimiters: Sequence[str] = ()) -> Column:
    out = col
    for d in extra_delimiters:
        out = F.replace(out, F.lit(d), F.lit(" "))
    # (?U) = UNICODE_CHARACTER_CLASS: Java's bare \s matches ASCII
    # whitespace only, but the reference tokenizes with str.split()
    # (drain3/drain.py:181-186) which splits on Unicode whitespace
    # ( ,  , ...) — the kernel parity tests feed both paths
    arr = F.split(out, r"(?U)\s+")
    # split("") == [""] and leading whitespace yields "" — drop empty
    # fragments to match "".split() == [] (strip+split semantics)
    return F.filter(arr, lambda t: t != "")


def group_key_cols(tokens: Column, cfg: EngineConfig) -> List[Column]:
    """Mining group key columns: [token_count] in exact mode, plus the
    canonical prefix in scalable mode.

    The jaccard engine's level-1 tree key is the FIRST token
    (drain3/jaccard_drain.py:22-31), so its groups are keyed on that —
    exact in both modes (variable-length clusters stay co-grouped)."""
    count = F.size(tokens).alias("token_count")
    if cfg.engine == "jaccard":
        return [F.coalesce(F.get(tokens, 0), F.lit("")).alias("first_token")]
    if cfg.mining_mode == "exact":
        return [count]
    prefix_len = max(cfg.max_node_depth - 1, 0)
    wildcard = F.lit(cfg.param_str)
    prefix = F.slice(tokens, 1, prefix_len)
    if cfg.parametrize_numeric_tokens:
        prefix = F.transform(prefix, lambda t: F.when(t.rlike(r"\d"), wildcard).otherwise(t))
    # prefix shorter than the token count only (last token is never a tree level:
    # reference drain3/drain.py:308-309 stops at the last token)
    prefix = F.when(F.size(tokens) > prefix_len, prefix) \
        .otherwise(F.slice(prefix, 1, F.greatest(F.size(tokens) - 1, F.lit(0))))
    return [count, F.concat_ws("", prefix).alias("prefix_key")]
