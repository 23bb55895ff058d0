"""Per-query scale-ratio table between two bench runs (round 17 —
VERDICT r16 item 5: the sf1 sweep as a STANDING protocol; round 18 —
VERDICT r17 item 3: the ratio-move gate made noise-robust IN THE
TOOL).

A scale regression — a plan whose cost grows super-linearly in the
data — can hide inside sf0.1 box noise but shows immediately as a
moved sf0.1→sf1 ratio. This tool turns the round's two bench JSON
lines into the ratio table PLAN_AUDIT records, plus a diff against
the previous round's ratios when given.

Usage:
    python scripts/sfratio.py SMALL_BENCH BIG_BENCH [--prev RATIOS_JSON]
                              [--out RATIOS_JSON]
                              [--cost-prev SIDECAR --cost-cur SIDECAR]

SMALL_BENCH / BIG_BENCH are bench.py summary JSONs (e.g. the official
sf0.1 run and the sf1 sweep). ``--out`` writes this round's ratio
map (including the small-run walls) for the next round's ``--prev``.
The diff flags ratios that moved by more than ``--tolerance``
(default 1.5x — wall-clock ratios carry both passes' box noise; the
point is catching a 2x complexity move, not a 20% drift).

Noise robustness (round 18): a wall ratio is two wall clocks divided,
so the gate adjudicates flagged moves before they fail the run:

- SUB-SECOND entries (small-run wall < ``--min-sec`` in either round)
  are exempt from the wall-ratio gate — ~0.16s of box jitter flips a
  0.32s entry's ratio past any tolerance; their moves print as notes.
- With ``--cost-prev``/``--cost-cur`` (the two rounds' BIG-run
  sidecars), a flagged move whose big-SF cost row is cost-identical
  (exact task/stage/job counts, bytes within the costdiff threshold)
  is box noise BY CONSTRUCTION and demotes to a note — the same
  mechanical adjudication scripts/costdiff.py applies round-to-round.

Exit 1 only for moves that survive both adjudications.
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


def adjudicate_moves(
    moved: list[tuple[str, float, float]],
    small_walls: dict[str, float],
    prev_small_walls: dict[str, float],
    min_sec: float,
    cost_prev: dict | None,
    cost_cur: dict | None,
    cost_threshold: float = 1.10,
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """Split raw ratio moves into (flags, notes) of (name, message).

    A move demotes to a note when the entry is sub-second in either
    round's SMALL run (wall jitter dominates the ratio) or when both
    big-run cost sidecars agree the entry is cost-identical (the plan
    did not change — the wall move is box noise by construction).
    Count moves in the cost rows always stay flagged."""
    try:  # repo-root import (tests) or sibling import (CLI)
        from scripts.costdiff import _unstable_entries, diff
    except ImportError:
        from costdiff import _unstable_entries, diff

    flags: list[tuple[str, str]] = []
    notes: list[tuple[str, str]] = []
    tolerant = (
        _unstable_entries(cost_prev or {}, cost_cur or {})
        if cost_prev is not None or cost_cur is not None
        else set()
    )
    for name, a, b in moved:
        msg = f"{a}× → {b}×"
        walls = [
            w
            for w in (small_walls.get(name), prev_small_walls.get(name))
            if w is not None
        ]
        if walls and min(walls) < min_sec:
            notes.append(
                (name, f"{msg} [sub-second small-run wall "
                       f"{min(walls):.2f}s < {min_sec}s — jitter-dominated, "
                       "exempt from the wall-ratio gate]")
            )
            continue
        if cost_prev is not None and cost_cur is not None:
            o, n = cost_prev.get("cost") or {}, cost_cur.get("cost") or {}
            if name in o and name in n:
                cflags, _ = diff(
                    {name: o[name]}, {name: n[name]}, cost_threshold, tolerant
                )
                if not cflags:
                    notes.append(
                        (name, f"{msg} [big-SF cost row identical "
                               f"(≤{cost_threshold}x bytes, exact counts) — "
                               "box noise by construction]")
                    )
                    continue
                flags.append(
                    (name, f"{msg} [cost row moved too: "
                           + "; ".join(m for _, m in cflags) + "]")
                )
                continue
        flags.append((name, msg))
    return flags, notes


def main() -> None:
    ap = argparse.ArgumentParser(
        description="sfX→sfY per-query wall-clock ratio table"
    )
    ap.add_argument("small_bench")
    ap.add_argument("big_bench")
    ap.add_argument("--prev", help="previous round's --out file to diff")
    ap.add_argument("--out", help="write this round's ratio map here")
    ap.add_argument("--tolerance", type=float, default=1.5)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=1.0,
        help="small-run wall below which an entry's ratio moves are "
        "jitter-exempt (default 1.0s)",
    )
    ap.add_argument(
        "--cost-prev",
        help="previous round's BIG-run bench sidecar (cost table) for "
        "mechanical adjudication of flagged moves",
    )
    ap.add_argument(
        "--cost-cur", help="this round's BIG-run bench sidecar (cost table)"
    )
    args = ap.parse_args()
    try:
        small = json.load(open(args.small_bench))
        big = json.load(open(args.big_bench))
        prev = json.load(open(args.prev)) if args.prev else None
        cost_prev = json.load(open(args.cost_prev)) if args.cost_prev else None
        cost_cur = json.load(open(args.cost_cur)) if args.cost_cur else None
    except (OSError, json.JSONDecodeError) as e:
        print(f"cannot read input JSON: {e}")
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
    flags: list[tuple[str, str]] = []
    if prev is not None:
        prev_r = prev.get("ratios", prev)
        moved = []
        for name in sorted(set(r) & set(prev_r)):
            a, b = prev_r[name], r[name]
            if a > 0 and max(a, b) / min(a, b) > args.tolerance:
                moved.append((name, a, b))
        flags, notes = adjudicate_moves(
            moved,
            small["queries"],
            prev.get("small_queries") or {},
            args.min_sec,
            cost_prev,
            cost_cur,
        )
        if flags:
            print(f"RATIO MOVES vs {args.prev} (>{args.tolerance}x):")
            for name, msg in flags:
                print(f"  MOVED {name}: {msg}")
        for name, msg in notes:
            print(f"  note  {name}: {msg}")
        if not flags:
            print(
                f"no unexplained ratio move >{args.tolerance}x vs {args.prev} "
                f"({len(set(r) & set(prev_r))} compared, "
                f"{len(notes)} adjudicated to noise)"
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
                    # small-run walls ride along so the NEXT round's
                    # sub-second exemption can consult both rounds
                    "small_queries": small["queries"],
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.out}")
    raise SystemExit(1 if flags else 0)


if __name__ == "__main__":
    main()
