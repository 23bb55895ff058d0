"""Per-query scale-ratio table between two bench runs (round 17 —
VERDICT r16 item 5: the sf1 sweep as a STANDING protocol).

A scale regression — a plan whose cost grows super-linearly in the
data — can hide inside sf0.1 box noise but shows immediately as a
moved sf0.1→sf1 ratio. This tool turns the round's two bench JSON
lines into the ratio table PLAN_AUDIT records, plus a diff against
the previous round's ratios when given.

Usage:
    python scripts/sfratio.py SMALL_BENCH BIG_BENCH [--prev RATIOS_JSON]
                              [--out RATIOS_JSON]

SMALL_BENCH / BIG_BENCH are bench.py summary JSONs (e.g. the official
sf0.1 run and the sf1 sweep). ``--out`` writes this round's ratio
map for the next round's ``--prev``. The diff flags ratios that moved
by more than ``--tolerance`` (default 1.5x — wall-clock ratios carry
both passes' box noise; the point is catching a 2x complexity move,
not a 20% drift).
"""

from __future__ import annotations

import argparse
import json


def ratios(small: dict, big: dict) -> dict[str, float]:
    qs, qb = small["queries"], big["queries"]
    return {
        name: round(qb[name] / qs[name], 2)
        for name in sorted(qs)
        if name in qb and qs[name] > 0
    }


def main() -> None:
    ap = argparse.ArgumentParser(
        description="sfX→sfY per-query wall-clock ratio table"
    )
    ap.add_argument("small_bench")
    ap.add_argument("big_bench")
    ap.add_argument("--prev", help="previous round's --out file to diff")
    ap.add_argument("--out", help="write this round's ratio map here")
    ap.add_argument("--tolerance", type=float, default=1.5)
    args = ap.parse_args()
    try:
        small = json.load(open(args.small_bench))
        big = json.load(open(args.big_bench))
    except (OSError, json.JSONDecodeError) as e:
        print(f"cannot read bench JSON: {e}")
        raise SystemExit(2) from None
    for label, doc in (("small", small), ("big", big)):
        if "queries" not in doc or "value" not in doc:
            print(f"no bench summary shape in the {label} file "
                  "(expected bench.py's JSON line with 'queries'/'value')")
            raise SystemExit(2)
    r = ratios(small, big)
    if not r:
        print("no shared queries with nonzero small-run timings — "
              "nothing to ratio (disjoint suites, or a zeroed run?)")
        raise SystemExit(2)
    scale = big["sf"] / small["sf"] if small.get("sf") else float("nan")
    total = round(big["value"] / small["value"], 2)
    print(
        f"sf{small.get('sf')}→sf{big.get('sf')} ({scale:g}× data): "
        f"total {small['value']:.1f}s → {big['value']:.1f}s = {total}×"
    )
    width = max(len(n) for n in r)
    for name, v in sorted(r.items(), key=lambda kv: -kv[1]):
        print(f"  {name:<{width}}  {small['queries'][name]:>7.2f}s "
              f"→ {big['queries'][name]:>8.2f}s   {v:>6.2f}×")
    worst = max(r.values())
    print(f"worst per-query ratio: {worst}× (data scale {scale:g}×)")
    moved = []
    if args.prev:
        prev = json.load(open(args.prev))
        prev_r = prev.get("ratios", prev)
        for name in sorted(set(r) & set(prev_r)):
            a, b = prev_r[name], r[name]
            if a > 0 and max(a, b) / min(a, b) > args.tolerance:
                moved.append(f"{name}: {a}× → {b}×")
        if moved:
            print(f"RATIO MOVES vs {args.prev} (>{args.tolerance}x):")
            for m in moved:
                print("  ", m)
        else:
            print(
                f"no ratio moved >{args.tolerance}x vs {args.prev} "
                f"({len(set(r) & set(prev_r))} compared)"
            )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {
                    "small_sf": small.get("sf"),
                    "big_sf": big.get("sf"),
                    "total_ratio": total,
                    "worst_ratio": worst,
                    "ratios": r,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.out}")
    raise SystemExit(1 if moved else 0)


if __name__ == "__main__":
    main()
