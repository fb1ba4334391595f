"""Per-section engine profiler (reference A17: SimpleProfiler,
drain3/simple_profiler.py:20-155, recast for Spark stages).

The reference wraps each step of ``add_log_message`` in
``start_section/end_section`` and reports, per section: total took
seconds, percent of the enclosing section, sample count, ms per 1000
samples, and samples/sec (simple_profiler.py:133-155).  Here a
*section* is one Spark stage of the validation/mining flow and the
sample counts are measured INSIDE the job with ``DataFrame.observe``
(pyspark.sql.Observation) — exact counters collected by the executors
during the action, not a second driver-side count.

Usage::

    prof = EngineProfiler()
    with prof.enclosing("validate"):
        df = prof.observe("checks_jvm", violations_df)   # attach counter
        with prof.section("checks_jvm"):
            df.persist().count()                         # the action
    prof.report_df(spark).show()     # or prof.report_text()
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.observation import Observation


class _Section:
    __slots__ = ("name", "took_sec", "samples", "calls", "observations")

    def __init__(self, name: str) -> None:
        self.name = name
        self.took_sec = 0.0
        self.samples = 0
        self.calls = 0
        self.observations: List[Observation] = []


class EngineProfiler:
    """Wall-time + in-job-counter profiler with the reference's report
    columns (took s, took %, samples, ms/1000 samples, hz)."""

    def __init__(self, enclosing_section_name: str = "total") -> None:
        self.enclosing_section_name = enclosing_section_name
        self._sections: Dict[str, _Section] = {}
        self._starts: Dict[str, float] = {}

    # ------------------------------------------------------------ timing

    def start_section(self, name: str) -> None:
        # mirrors simple_profiler.py:52-60 (one active start per section)
        self._starts[name] = time.monotonic()

    def end_section(self, name: str) -> None:
        start = self._starts.pop(name, None)
        if start is None:
            raise ValueError(f"section not started: {name}")
        sec = self._sections.setdefault(name, _Section(name))
        sec.took_sec += time.monotonic() - start
        sec.calls += 1

    @contextmanager
    def section(self, name: str):
        self.start_section(name)
        try:
            yield self
        finally:
            self.end_section(name)

    @contextmanager
    def enclosing(self, name: Optional[str] = None):
        """Times the whole run; per-section took%% is relative to it
        (reference enclosing_section_name, simple_profiler.py:27-33)."""
        if name is not None:
            self.enclosing_section_name = name
        with self.section(self.enclosing_section_name):
            yield self

    # ---------------------------------------------------------- counters

    def observe(self, name: str, df: DataFrame) -> DataFrame:
        """Attach an in-job row counter to ``df``; the count the NEXT
        action computes is credited to section ``name``.  One Observation
        per call (Spark allows a single action per Observation).  The
        observed DataFrame MUST be acted on before the report is built —
        ``Observation.get`` waits for the first action."""
        sec = self._sections.setdefault(name, _Section(name))
        obs = Observation(f"{name}#{len(sec.observations)}@{id(df)}")
        sec.observations.append(obs)
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def add_samples(self, name: str, n: int) -> None:
        """Credit driver-side-known samples (e.g. collected cube rows)."""
        self._sections.setdefault(name, _Section(name)).samples += int(n)

    def _drain_observations(self) -> None:
        for sec in self._sections.values():
            for obs in sec.observations:
                # waits for the observed action's completion (first
                # action only — Observation semantics)
                sec.samples += int(obs.get.get("rows", 0))
            sec.observations.clear()

    # ------------------------------------------------------------ report

    def report_rows(self) -> List[tuple]:
        """(section, took_sec, took_pct, samples, ms_per_1k, hz) sorted
        by took_sec desc (reference sort, simple_profiler.py:114)."""
        self._drain_observations()
        enclosing = self._sections.get(self.enclosing_section_name)
        total = enclosing.took_sec if enclosing else 0.0
        rows = []
        for sec in sorted(self._sections.values(),
                          key=lambda s: s.took_sec, reverse=True):
            if sec.name == self.enclosing_section_name:
                continue
            pct = 100.0 * sec.took_sec / total if total > 0 else None
            ms_per_1k = (1000.0 * 1000.0 * sec.took_sec / sec.samples
                         if sec.samples else None)
            hz = sec.samples / sec.took_sec if sec.took_sec > 0 else None
            rows.append((sec.name, round(sec.took_sec, 6),
                         round(pct, 2) if pct is not None else None,
                         sec.samples,
                         round(ms_per_1k, 4) if ms_per_1k is not None else None,
                         round(hz, 2) if hz is not None else None))
        return rows

    def report_df(self, spark: SparkSession) -> DataFrame:
        from drain3_spark.util import local_df
        return local_df(
            spark, self.report_rows(),
            "section string, took_sec double, took_pct double, "
            "samples long, ms_per_1k_samples double, hz double")

    def report_text(self) -> str:
        """Reference-formatted lines (simple_profiler.py:133-155)."""
        lines = []
        for name, took, pct, samples, ms1k, hz in self.report_rows():
            took_txt = f"{took:>8.2f} s"
            if pct is not None:
                took_txt += f" ({pct:>6.2f}%)"
            lines.append(
                f"{name: <15}: took {took_txt}, {samples: >10,} samples, "
                f"{(ms1k if ms1k is not None else 0): 7.2f} ms / 1000 samples, "
                f"{(hz if hz is not None else 0): 15,.2f} hz")
        return "\n".join(lines)
