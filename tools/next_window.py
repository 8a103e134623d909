"""Print the NEXT round's planned certification window.

Usage: python tools/next_window.py [--check]

Composition rule (registry.py docstring): STAGED_RESERVE slots are
reserved for staged entrants (never-certified names need first rows
and must not starve once the registry exceeds the 150-name rotation
capacity), then rotation-debt names fill (oldest greens first — the
freshness covenant; rotation_debt() is computed from the
CORRECTNESS_r*.json artifacts and sorts (latest, name), so a
truncation drops the freshest debt, never the oldest), then any
remaining room goes to further staged entrants in STAGED_PRIORITY
order.  Debt that does not fit slips one round and is reported
loudly — it re-enters the next plan as the oldest cohort.

--check additionally asserts the invariants the recomposition relies
on: debt names are all currently registered, staged names are all
currently pending, no overlap, and the window fills to exactly
DRIVER_WINDOW when debt+staged >= DRIVER_WINDOW.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from chain_sync_spark import registry  # noqa: E402

# Window slots guaranteed to staged entrants each round even when
# rotation debt alone could fill the window.  Raised 2 -> 4 late in
# round 9 (11 staged entrants queued; at 2/round they would take 6
# rounds to earn first rows): 46 debt slots x the 4-round pytest
# backstop = 184 capacity >= the 162-name oracled registry, so the
# covenant still holds — the 3-round aim degrades to ~3.5 as the
# steady-state cost of the larger intake.
# = 5 since the round-9 fourth wave: 22 staged entrants at 4/round
# would take 5.5 recompositions; 45 debt slots x the 4-round pytest
# backstop = 180 capacity >= the 173-name oracled registry (7 names
# of headroom for further staging).
STAGED_RESERVE = 5


def planned_window() -> tuple[list[str], list[str], list[str]]:
    """(window, pending_after, slipped_debt): the next-round WINDOW,
    the staged names that stay PENDING one more round, and the debt
    names that slip to the round after (non-empty only when the
    registry exceeds the window's rotation capacity)."""
    debt = registry.rotation_debt()
    pending = set(registry.pending_queries()[0])
    staged = [n for n in registry.STAGED_PRIORITY if n in pending]
    staged += sorted(pending - set(staged))  # unprioritized: loudly last
    reserve = min(len(staged), STAGED_RESERVE)
    debt_take = debt[: registry.DRIVER_WINDOW - reserve]
    slipped = debt[len(debt_take) :]
    room = registry.DRIVER_WINDOW - len(debt_take)
    take = staged[: max(room, 0)]
    return debt_take + take, staged[max(room, 0) :], slipped


def main() -> int:
    window, leftover, slipped = planned_window()
    check = "--check" in sys.argv
    if check:
        q = registry.all_queries()
        pq = registry.pending_queries()[0]
        debt = registry.rotation_debt()
        assert all(n in q for n in debt), "debt name not registered"
        assert not set(debt) & set(pq), "debt/staged overlap"
        assert len(set(window)) == len(window), "duplicate in window"
        if len(debt) + len(pq) >= registry.DRIVER_WINDOW:
            assert len(window) == registry.DRIVER_WINDOW, "window not full"
        print(
            f"# invariants ok: {len(debt)} debt + {len(pq)} staged",
            file=sys.stderr,
        )
    print("WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if leftover:
        print(f"# stays PENDING for the round after: {leftover}")
    if slipped:
        print(
            "# COVENANT SLIP — debt deferred one round by the staged "
            f"reserve: {slipped}"
        )
    due = [n for n in window if n in registry.HARDENING_QUEUE]
    for n in due:
        print(f"# HARDENING DUE this window: {n} — {registry.HARDENING_QUEUE[n]}")
    print(
        "# pre-flight: python tools/oracle_check.py /root/testdata/sf0.01 "
        + " ".join(window[:3])
        + " ...",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
