"""Full-suite test runner: the record of truth, with per-module isolation.

Why this exists
---------------
Running all ~200 tests in ONE process on this host eventually dies with a
native crash (`Fatal Python error: Segmentation fault`) inside XLA:CPU's
pjit compile/execute path — reproduced 2026-08-20 in
`tests/test_robustness.py::test_failure_triggers_fire_on_catastrophic_depth_loss`
after ~25 minutes / ~180 tests, and earlier by the round-4 review in
`test_edge_dvo_recovers_pose_under_degradation` (VERDICT.md weak #3). Every
crashing test passes in a fresh process, host RAM stays ~flat (125 GB box,
>120 GB free at crash time), and the crash point moves between runs — the
failure is cumulative in-process XLA:CPU state (hundreds of live compiled
executables), not any single test and not host OOM. Upstream-shaped bug; the
durable workaround is process isolation per test module, which this runner
provides. The suite ALSO keeps a persistent XLA compile cache
(tests/conftest.py) so per-module process restarts do not re-pay compiles.

Usage
-----
  python tools/run_suite.py            # full suite, one process per module
  python tools/run_suite.py --fast     # the <5-min fast tier, single process
  python tools/run_suite.py --retier   # full suite + regenerate the
                                       # slow-test manifest from measured
                                       # durations (tests/slow_manifest.txt)

Exit status is non-zero if any module fails.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLOW_CUTOFF_S = 5.0
MANIFEST = os.path.join(REPO, "tests", "slow_manifest.txt")

MANIFEST_HEADER = """\
# Slow-test manifest: nodeids here get the `slow` marker at collection
# (tests/conftest.py::pytest_collection_modifyitems), so
# `pytest -m "not slow"` is a true <5-minute cold fast tier on this
# single-core host. Regenerate with `python tools/run_suite.py --retier`
# after adding tests: entries are tests measured >= 5 s cold (call phase),
# except that every module keeps its fastest test in the fast tier for
# subsystem coverage. The FULL suite (this list included) remains the
# record of truth: run it with `python tools/run_suite.py`, which isolates
# modules in separate processes (see the XLA:CPU in-process accumulation
# crash note there).
"""


def _modules() -> list[str]:
    mods = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    return [os.path.relpath(m, REPO) for m in mods]


def run_full(extra: list[str], collect_durations: bool = False):
    """One pytest process per module. Returns (ok, durations dict)."""
    t0 = time.time()
    failures: list[str] = []
    durations: dict[str, float] = {}
    for mod in _modules():
        cmd = [sys.executable, "-m", "pytest", mod, "-q", *extra]
        if collect_durations:
            cmd.append("--durations=0")
        print(f"=== {mod}", flush=True)
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        out = r.stdout + r.stderr
        tail = [l for l in out.strip().splitlines()[-3:]]
        print("   " + " | ".join(tail[-1:]), flush=True)
        # rc 5 = no tests collected (e.g. all deselected) — not a failure
        if r.returncode not in (0, 5):
            failures.append(mod)
            print(out, flush=True)
        if collect_durations:
            for line in out.splitlines():
                m = re.match(r"\s*([\d.]+)s call\s+(\S+)", line)
                if m:
                    durations[m.group(2)] = float(m.group(1))
    dt = time.time() - t0
    if failures:
        print(f"\nFAILED modules ({dt:.0f}s): {failures}")
    else:
        print(f"\nALL MODULES GREEN in {dt:.0f}s ({len(_modules())} modules)")
    return not failures, durations


def retier(durations: dict[str, float]) -> None:
    """Regenerate tests/slow_manifest.txt from measured call durations."""
    slow = {t for t, d in durations.items() if d >= SLOW_CUTOFF_S}
    # subsystem coverage: every module keeps its fastest test in the fast tier
    by_mod: dict[str, list[tuple[float, str]]] = {}
    for t, d in durations.items():
        by_mod.setdefault(t.split("::")[0], []).append((d, t))
    for mod, entries in by_mod.items():
        if all(t in slow for _, t in entries):
            entries.sort()
            slow.discard(entries[0][1])
    with open(MANIFEST, "w") as f:
        f.write(MANIFEST_HEADER)
        f.write("\n".join(sorted(slow)) + "\n")
    print(f"wrote {MANIFEST}: {len(slow)} slow entries of {len(durations)} measured")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true", help="run only the fast tier, one process")
    ap.add_argument("--retier", action="store_true", help="full run + regenerate slow manifest")
    ap.add_argument("rest", nargs="*", help="extra pytest args")
    args = ap.parse_args()
    if args.fast:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "not slow", *args.rest],
            cwd=REPO,
        )
        return r.returncode
    ok, durations = run_full(args.rest, collect_durations=args.retier)
    if args.retier and durations:
        retier(durations)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
