"""Print the NEXT round's planned certification window.

Usage: python tools/next_window.py [--check]

Composition rule (registry.py docstring): rotation-debt names first
(oldest greens — the freshness covenant), then staged entrants in
their PENDING declaration order, truncated to DRIVER_WINDOW; staged
entrants that don't fit stay PENDING for the round after (the
source_overlap_matrix / round-10 case).  Output is a ready-to-paste
python list for registry.WINDOW plus the oracle_check command that
pre-flights it.

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


def planned_window() -> tuple[list[str], list[str]]:
    """(window, still_pending_after): the next-round WINDOW and the
    staged names that must stay PENDING one more round."""
    debt = registry.rotation_debt()
    pending = set(registry.pending_queries()[0])
    staged = [n for n in registry.STAGED_PRIORITY if n in pending]
    staged += sorted(pending - set(staged))  # unprioritized: loudly last
    room = registry.DRIVER_WINDOW - len(debt)
    take = staged[: max(room, 0)]
    return debt + take, staged[max(room, 0) :]


def main() -> int:
    window, leftover = planned_window()
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
        print(f"# invariants ok: {len(debt)} debt + {len(pq)} staged", file=sys.stderr)
    print("WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if leftover:
        print(f"# stays PENDING for the round after: {leftover}")
    print(
        "# pre-flight: python tools/oracle_check.py /root/testdata/sf0.01 "
        + " ".join(window[:3])
        + " ...",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
