#!/usr/bin/env python3
"""One-command correctness gate (VERDICT r04 ask #6).

Round 4's highest-yield technique was the adversarial-data program, but it
only helps if it re-runs after every operator/oracle change — and it was
five manual invocations.  This gate chains all of them, runs every
independent step to completion (one summary, all failures visible), skips
an oracle sweep whose table-generation step failed (a stale directory
passing would muddy diagnosis), and exits nonzero if ANY step failed:

  1. full pytest suite (`python -m pytest tests/ -q`)
  2. full-registry cross-engine check vs DuckDB at the driver's gate scale
     (sf0.01 by default)
  3. the three adversarial sweeps — hostile (NULL/CJK/malformed), skew
     (mass duplication + hot keys), and zero-row tables — each regenerated
     fresh, then the full registry vs DuckDB on each

Usage:
  python scripts/run_all_checks.py            # everything (~25-35 min)
  python scripts/run_all_checks.py --fast     # sf0.001 + skip pytest
                                              # (oracle sweeps only, ~8 min)
  SPARK_GRAFT_CPUS=16 ...                     # parallelism override
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def run(label: str, cmd: list[str]) -> tuple[str, float, int]:
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    t0 = time.monotonic()
    rc = subprocess.call(cmd, cwd=REPO)
    dt = time.monotonic() - t0
    print(f"=== {label}: {'OK' if rc == 0 else f'FAILED rc={rc}'} ({dt:.1f}s)",
          flush=True)
    return label, dt, rc


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.001" if fast else "/root/testdata/sf0.01",
    )
    py = sys.executable
    steps: list[tuple[str, list[str]]] = []
    if not fast:
        steps.append(("pytest", [py, "-m", "pytest", "tests/", "-q"]))
    steps.append((f"oracle@{sf}",
                  [py, "scripts/cross_scale_check.py", sf, CPUS]))
    for variant, flag in (("adversarial", None),
                          ("adversarial_skew", "--skew"),
                          ("adversarial_empty", "--empty")):
        out = os.path.join(REPO, "bench_data", variant)
        gen = [py, "scripts/adversarial_tables.py"]
        if flag:
            gen.append(flag)
        gen.append(out)
        # the oracle sweep depends on its gen step: mark it so a failed
        # generation skips the sweep instead of re-checking stale tables
        steps.append((f"gen:{variant}", gen))
        steps.append((f"oracle@{variant}",
                      [py, "scripts/cross_scale_check.py", out, CPUS]))

    results = []
    failed_gens: set[str] = set()
    for label, cmd in steps:
        if label.startswith("oracle@adversarial") and \
                label.split("@", 1)[1] in failed_gens:
            print(f"\n=== {label}: SKIPPED (generation failed)", flush=True)
            results.append((label, 0.0, 1))
            continue
        results.append(run(label, cmd))
        if label.startswith("gen:") and results[-1][2] != 0:
            failed_gens.add(label.split(":", 1)[1])
    print("\n==== gate summary ====")
    bad = 0
    for label, dt, rc in results:
        print(f"  {'PASS' if rc == 0 else 'FAIL'}  {label:28s} {dt:8.1f}s")
        bad += rc != 0
    print(f"==== {'ALL GREEN' if not bad else f'{bad} step(s) FAILED'} ====")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
