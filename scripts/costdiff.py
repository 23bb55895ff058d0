"""Diff two bench sidecars' deterministic cost tables (round 16 —
VERDICT r15 item 1).

Wall-clock on this box swings ±30% on the shuffle-heaviest entries
(three rounds of hand-adjudicated scd2/pagerank drift), but shuffle
bytes, task counts, and stage counts are decided by the PLAN, not the
box. This tool turns "is that 1.5× a regression?" into a hard check:

- a query whose wall-clock moved but whose cost row is byte-identical
  is box noise BY CONSTRUCTION — close the question, no A/B needed;
- a query whose shuffle bytes / task count moved is a real plan
  change — find the commit.

Usage:
    python scripts/costdiff.py OLD_SIDECAR NEW_SIDECAR [--threshold R]

Compares the ``"cost"`` tables (final timed pass) of two
``bench_readings.json``-shaped files. Flags any query whose task or
stage count changed at all, or whose byte metrics moved by more than
the threshold ratio (default 1.05 — byte metrics are near-exact; the
tolerance absorbs AQE's input-split jitter on cached/compacted
inputs). Exit code 1 if anything is flagged, so a round-close script
can gate on it.
"""

from __future__ import annotations

import json
import sys

_BYTES = ("shuffle_read_bytes", "shuffle_write_bytes", "input_bytes", "output_bytes")
_COUNTS = ("tasks", "stages", "jobs")


def _ratio(old: int, new: int) -> float:
    if old == new:
        return 1.0
    if old == 0 or new == 0:
        return float("inf")
    return max(old, new) / min(old, new)


def diff(old: dict, new: dict, threshold: float) -> list[str]:
    flags: list[str] = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            flags.append(f"{name}: only in {'NEW' if o is None else 'OLD'}")
            continue
        moved = []
        for k in _COUNTS:
            if o.get(k, 0) != n.get(k, 0):
                moved.append(f"{k} {o.get(k, 0)}→{n.get(k, 0)}")
        for k in _BYTES:
            r = _ratio(o.get(k, 0), n.get(k, 0))
            if r > threshold:
                moved.append(f"{k} {o.get(k, 0)}→{n.get(k, 0)} ({r:.2f}x)")
        if moved:
            flags.append(f"{name}: " + "; ".join(moved))
    return flags


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.05
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
        args = [a for a in args if a != str(threshold)]
    if len(args) != 2:
        print(__doc__)
        raise SystemExit(2)
    old_doc = json.load(open(args[0]))
    new_doc = json.load(open(args[1]))
    old, new = old_doc.get("cost") or {}, new_doc.get("cost") or {}
    if not old or not new:
        missing = args[0] if not old else args[1]
        print(f"no 'cost' table in {missing} (pre-round-16 sidecar?)")
        raise SystemExit(2)
    flags = diff(old, new, threshold)
    shared = sorted(set(old) & set(new))
    stable = [n for n in shared if f"{n}:" not in "\n".join(flags)]
    print(
        f"{len(shared)} shared queries; {len(stable)} cost-identical "
        f"(≤{threshold}x bytes, exact counts); {len(flags)} flagged"
    )
    for f in flags:
        print("  MOVED", f)
    unstable_new = [
        n for n, ok in (new_doc.get("cost_stable") or {}).items() if not ok
    ]
    if unstable_new:
        print(
            "note: queries with pass-to-pass byte variance in NEW "
            f"(AQE/runtime-dependent plans): {unstable_new}"
        )
    raise SystemExit(1 if flags else 0)


if __name__ == "__main__":
    main()
