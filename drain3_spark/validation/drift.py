"""Distribution-drift checks across time partitions (SURVEY.md C7).

No scipy in the sandbox — the statistics are hand-rolled on *aggregated*
tables: Spark does the single heavy ``groupBy`` per check, the statistic
runs in numpy on a histogram of at most (n_ds × distinct-values) rows.
This is the scale design too: at 10^12 rows the KS input is still a
few-thousand-row histogram per partition — ``dur_ms`` has bounded value
cardinality; genuinely continuous columns must pass ``bucket_width`` so
the aggregation bins them first (the cube is only safe when the grouped
value domain is bounded).

* KS two-sample D statistic with asymptotic critical value
  ``c(alpha) * sqrt((n+m)/(n*m))``, c(0.05)=1.3581.
* Pearson chi-square on the (ds × category) contingency table with a
  Wilson–Hilferty critical-value approximation (alpha=0.05).

Reference precedent: the LRU "adapt to recent templates" rationale
(README.md:246-248) — drift of the input distribution is a first-class
signal here rather than an eviction heuristic.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame, functions as F

KS_C_ALPHA = {0.10: 1.2238, 0.05: 1.3581, 0.01: 1.6276}
_Z = {0.10: 1.2816, 0.05: 1.6449, 0.01: 2.3263}


def _chi2_critical(dof: int, alpha: float) -> float:
    """Wilson–Hilferty approximation of the chi-square quantile."""
    z = _Z.get(alpha, 1.6449)
    if dof <= 0:
        return float("inf")
    return dof * (1.0 - 2.0 / (9.0 * dof) + z * math.sqrt(2.0 / (9.0 * dof))) ** 3


def ks_drift(clips: Optional[DataFrame], value_col: str = "dur_ms",
             baseline_ds: str | None = None,
             alpha: float = 0.05,
             hist: Optional[List[tuple]] = None,
             bucket_width: Optional[float] = None) -> List[dict]:
    """Two-sample KS of each ds partition against the baseline partition.

    One Spark aggregation → value histogram per ds; exact D computed on
    the merged support in numpy.  Returns one record per non-baseline ds.
    ``hist`` short-circuits the aggregation with precomputed
    (ds, value, n) rows (shared-cube path, runner.validate).
    ``bucket_width`` bins a genuinely continuous column before the
    aggregation so the histogram stays bounded (KS on binned data is the
    standard large-N approximation; D error is at most one bin's mass).
    """
    if hist is None:
        vcol = F.col(value_col)
        if bucket_width:
            vcol = F.floor(vcol / F.lit(float(bucket_width))) * F.lit(float(bucket_width))
        hist = (clips.groupBy("ds", vcol.alias("_v"))
                .agg(F.count(F.lit(1)).alias("n")).collect())
        hist = [(r["ds"], r["_v"], r["n"]) for r in hist]
    by_ds: Dict[str, Dict[float, int]] = {}
    for ds, value, n in hist:
        by_ds.setdefault(ds, {})[float(value)] = \
            by_ds.setdefault(ds, {}).get(float(value), 0) + int(n)
    if not by_ds:
        return []
    baseline_ds = baseline_ds or min(by_ds)
    base = by_ds.get(baseline_ds, {})
    n_base = sum(base.values())
    out = []
    for ds in sorted(by_ds):
        if ds == baseline_ds:
            continue
        cur = by_ds[ds]
        n_cur = sum(cur.values())
        support = np.array(sorted(set(base) | set(cur)))
        cdf_a = np.cumsum([base.get(v, 0) for v in support]) / max(n_base, 1)
        cdf_b = np.cumsum([cur.get(v, 0) for v in support]) / max(n_cur, 1)
        d = float(np.max(np.abs(cdf_a - cdf_b))) if len(support) else 0.0
        crit = KS_C_ALPHA.get(alpha, 1.3581) * math.sqrt(
            (n_base + n_cur) / max(n_base * n_cur, 1))
        out.append({"ds": ds, "check": f"drift_ks_{value_col}", "statistic": d,
                    "threshold": crit, "passed": d <= crit,
                    "rows": n_cur, "baseline_ds": baseline_ds})
    return out


def chisq_drift(clips: Optional[DataFrame], cat_col: str = "codec",
                baseline_ds: str | None = None,
                alpha: float = 0.05,
                hist: Optional[List[tuple]] = None) -> List[dict]:
    """Pearson chi-square of each ds partition's category frequencies
    against the baseline partition's.  ``hist`` short-circuits the
    aggregation with precomputed (ds, category, n) rows."""
    if hist is None:
        hist = (clips.groupBy("ds", cat_col)
                .agg(F.count(F.lit(1)).alias("n")).collect())
        hist = [(r["ds"], r[cat_col], r["n"]) for r in hist]
    by_ds: Dict[str, Dict[str, int]] = {}
    for ds, cat, n in hist:
        by_ds.setdefault(ds, {})[str(cat)] = \
            by_ds.setdefault(ds, {}).get(str(cat), 0) + int(n)
    if not by_ds:
        return []
    baseline_ds = baseline_ds or min(by_ds)
    base = by_ds.get(baseline_ds, {})
    n_base = sum(base.values())
    out = []
    for ds in sorted(by_ds):
        if ds == baseline_ds:
            continue
        cur = by_ds[ds]
        n_cur = sum(cur.values())
        cats = sorted(set(base) | set(cur))
        stat = 0.0
        dof = -1
        for c in cats:
            o = cur.get(c, 0)
            # expected count under the baseline's proportions
            e = n_cur * (base.get(c, 0) / max(n_base, 1))
            if e > 0:
                stat += (o - e) ** 2 / e
                dof += 1
            elif o > 0:
                stat = float("inf")
        crit = _chi2_critical(max(dof, 1), alpha)
        out.append({"ds": ds, "check": f"drift_chisq_{cat_col}", "statistic": stat,
                    "threshold": crit, "passed": stat <= crit,
                    "rows": n_cur, "baseline_ds": baseline_ds})
    return out
