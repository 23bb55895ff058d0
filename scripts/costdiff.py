"""Diff two bench sidecars' deterministic cost tables (round 16 —
VERDICT r15 item 1; argparse + per-entry byte tolerance round 17 —
VERDICT r16 items 2/ADVICE).

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
inputs). Entries that EITHER sidecar's own ``cost_stable`` marks
byte-unstable across same-code passes (AQE input-split jitter —
events_asof / entity_match / chunk_documents on the r16 baseline) get
their byte moves demoted to notes: their bytes vary run-to-run with
identical code, so a byte move there carries no signal — but their
COUNT moves still flag (counts stay exact even for those entries).
Exit code 1 if anything is flagged, so a round-close script can gate
on it.

Adjudicating an INPUT-BYTE-only flag with EXACT counts (round 18,
measured): entries whose plans re-read persisted/cached intermediates
report cached-block reads as inputBytes, and in-memory block sizes
vary with JVM/session state — pass-stable WITHIN a run (so the
sidecar's own cost_stable cannot exempt them) yet 5-16% different
across sessions with identical code. The mechanical adjudicator is a
same-box A/B: run the flagged entry's cost probe at BOTH commits in
one sitting (old commit via a git worktree); byte-identical rows =
cross-session state, not a plan change. Shuffle bytes and all counts
stay exact across sessions — only a count or shuffle move is
unconditional evidence of a plan change.
"""

from __future__ import annotations

import argparse
import json
from collections.abc import Iterable

_BYTES = ("shuffle_read_bytes", "shuffle_write_bytes", "input_bytes", "output_bytes")
_COUNTS = ("tasks", "stages", "jobs")


def _ratio(old: int, new: int) -> float:
    if old == new:
        return 1.0
    if old == 0 or new == 0:
        return float("inf")
    return max(old, new) / min(old, new)


def diff(
    old: dict,
    new: dict,
    threshold: float,
    byte_tolerant: Iterable[str] = (),
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """(flags, notes), each a list of ``(query_name, message)`` pairs
    (structured — formatting happens at print time only, so a query
    name containing ':' cannot be misparsed back out of the message;
    round 18, ADVICE r17). Flags are real moves — presence changes,
    ANY count change, or byte moves past ``threshold`` on byte-stable
    entries; notes are byte moves on ``byte_tolerant`` entries (their
    bytes vary across same-code passes, so the move is not evidence
    of a plan change — count moves on them still flag)."""
    tolerant = set(byte_tolerant)
    flags: list[tuple[str, str]] = []
    notes: list[tuple[str, str]] = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            flags.append((name, f"only in {'NEW' if o is None else 'OLD'}"))
            continue
        count_moves = [
            f"{k} {o.get(k, 0)}→{n.get(k, 0)}"
            for k in _COUNTS
            if o.get(k, 0) != n.get(k, 0)
        ]
        byte_moves = []
        for k in _BYTES:
            r = _ratio(o.get(k, 0), n.get(k, 0))
            if r > threshold:
                byte_moves.append(f"{k} {o.get(k, 0)}→{n.get(k, 0)} ({r:.2f}x)")
        if name in tolerant and byte_moves and not count_moves:
            notes.append(
                (name, "; ".join(byte_moves) + " [byte-unstable entry]")
            )
        elif count_moves or byte_moves:
            flags.append((name, "; ".join(count_moves + byte_moves)))
    return flags, notes


def _unstable_entries(*docs: dict) -> set[str]:
    """Entries EITHER sidecar's own cost_stable marks byte-unstable
    across its same-code passes."""
    out: set[str] = set()
    for doc in docs:
        for name, ok in (doc.get("cost_stable") or {}).items():
            if not ok:
                out.add(name)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Diff two bench sidecars' deterministic cost tables."
    )
    ap.add_argument("old_sidecar")
    ap.add_argument("new_sidecar")
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.05,
        help="byte-metric ratio above which a byte-stable entry flags "
        "(counts always compare exactly; default 1.05)",
    )
    args = ap.parse_args()
    try:
        old_doc = json.load(open(args.old_sidecar))
        new_doc = json.load(open(args.new_sidecar))
    except (OSError, json.JSONDecodeError) as e:
        print(f"cannot read sidecar JSON: {e}")
        raise SystemExit(2) from None
    old, new = old_doc.get("cost") or {}, new_doc.get("cost") or {}
    if not old or not new:
        missing = args.old_sidecar if not old else args.new_sidecar
        print(
            f"no 'cost' table in {missing} "
            "(pre-round-16 sidecar, or the run's UI REST read failed)"
        )
        raise SystemExit(2)
    tolerant = _unstable_entries(old_doc, new_doc)
    flags, notes = diff(old, new, args.threshold, tolerant)
    shared = sorted(set(old) & set(new))
    flagged_names = {name for name, _ in flags}
    noted_names = {name for name, _ in notes}
    # a noted entry's bytes DID move past the threshold — it is
    # exempted, not verified; counting it as "cost-identical" would
    # misstate what the gate checked (r17 review)
    stable = [
        n for n in shared if n not in flagged_names and n not in noted_names
    ]
    print(
        f"{len(shared)} shared queries; {len(stable)} cost-identical "
        f"(≤{args.threshold}x bytes, exact counts); {len(flags)} flagged; "
        f"{len(notes)} byte-exempt"
    )
    for name, msg in flags:
        print(f"  MOVED {name}: {msg}")
    for name, msg in notes:
        print(f"  note  {name}: {msg}")
    if tolerant:
        print(
            "byte-tolerant entries (pass-to-pass byte variance in their "
            f"own sidecar): {sorted(tolerant)}"
        )
    raise SystemExit(1 if flags else 0)


if __name__ == "__main__":
    main()
