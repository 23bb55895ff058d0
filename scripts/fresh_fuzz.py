"""Fresh-seed adversarial sweep over the cross-engine dialect-twin
property suites (round 16 — VERDICT r15 item 6).

The round-15 trim-form slip (``acf821e``) shipped in a cross-engine
SQL string and was caught one commit later ONLY because a fuzz suite
happened to re-run with a fresh seed. This script makes that luck a
protocol: it re-runs every Spark↔DuckDB↔Python agreement suite under
R explicitly fresh hypothesis seeds, so every change to a dialect
twin / SQL-compiler string gets fresh adversarial draws before the
round closes instead of replaying the seeds an earlier run already
survived.

ROUND-CLOSE STEP (recorded in PLAN_AUDIT): after the last code change
that touches a ``*_sql`` twin, a dialect string, or an oracle entry,
run

    python scripts/fresh_fuzz.py [reps]

(default 2 reps ≈ 2× the suites' own example budgets, each rep a new
seed) and record the seeds + outcome in the round's PLAN_AUDIT note.
Any failure is a real cross-engine bug by construction — these suites
compare engines, not expectations.

Usage: python scripts/fresh_fuzz.py [reps] [-k EXPR]
"""

from __future__ import annotations

import os
import secrets
import subprocess
import sys
import time

#: every hypothesis suite that pins two+ engines against each other:
#: *_parity (incl. three_way), *_twin_*, and the rules-compiler
#: agreement fuzz that caught the r15 trim slip
DEFAULT_K = "parity or twin or three_way or agree"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    reps = int(args.pop(0)) if args and args[0].isdigit() else 2
    k = DEFAULT_K
    if "-k" in args:
        k = args[args.index("-k") + 1]
    failures = []
    for i in range(reps):
        seed = secrets.randbelow(2**32)
        cmd = [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_properties.py",
            "-q",
            "-k",
            k,
            f"--hypothesis-seed={seed}",
        ]
        print(f"[fresh_fuzz] rep {i + 1}/{reps} seed={seed}", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO)
        print(
            f"[fresh_fuzz] rep {i + 1} exit={r.returncode} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if r.returncode != 0:
            failures.append(seed)
    if failures:
        print(f"[fresh_fuzz] FAILING SEEDS (reproduce with --hypothesis-seed): {failures}")
        raise SystemExit(1)
    print(f"[fresh_fuzz] {reps} fresh-seed reps green")


if __name__ == "__main__":
    main()
