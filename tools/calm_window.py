"""Calm-window watchdog for graded bench/scaling runs (memory rule:
never grade a single run on this noisy shared host).

Polls the raw-CPU hardware control (pure multiprocess numpy — no
Spark/JVM) until the delivered 2->8 speedup clears ``threshold``, then
exits 0 so a shell `&&` can launch the graded run inside the calm
window.  Exits 1 on timeout (callers may still run and report the
same-window control alongside, per BASELINE.md protocol).

Usage: python tools/calm_window.py [threshold=3.05] [max_wait_min=45]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_scaling import raw_cpu_speedup  # noqa: E402


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 3.05
    max_wait = float(sys.argv[2]) if len(sys.argv) > 2 else 45.0
    t0 = time.time()
    while True:
        s = raw_cpu_speedup(2, 8, units=32)["speedup"]
        waited = (time.time() - t0) / 60.0
        print(f"[calm_window] raw 2->8 = {s:.3f} "
              f"(threshold {threshold}, waited {waited:.1f} min)", flush=True)
        if s >= threshold:
            return 0
        if waited >= max_wait:
            print("[calm_window] timeout — window never calmed", flush=True)
            return 1
        time.sleep(120)


if __name__ == "__main__":
    sys.exit(main())
