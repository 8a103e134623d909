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
order.

Deferral vs covenant break (round-10 distinction): a registry larger
than 150 oracled names CANNOT give every name a green row every 3
rounds through a 50-slot window — one debt tail defers each round as
the steady state.  That is safe by construction as long as (a) every
deferred name is at gap 3 when it defers (it re-enters the next plan
as the OLDEST cohort, sorts first, and lands its re-cert at exactly
gap 4 — the pytest-backstop bound) and (b) total oracled names never
exceed the four-round capacity (DRIVER_WINDOW - STAGED_RESERVE) x 4.
--check asserts both and hard-fails on a TRUE covenant break: a
deferred name already at the backstop age, or a registry grown past
capacity.  The old behavior reported every deferral as a "COVENANT
SLIP", conflating the steady state with a break.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from chain_sync_spark import registry  # noqa: E402

# Window slots guaranteed to staged entrants each round even when
# rotation debt alone could fill the window.  Raised 2 -> 4 late in
# round 9 (11 staged entrants queued), then 4 -> 5 at the round-9
# fourth wave (22 queued).  Round 10 froze net-new staging (VERDICT
# r9 item 4): the queue drains at 5/round while only judge-sanctioned
# entrants (sync_round_digest) may join, so the reserve drops to the
# queue size once it falls below 5 and the freed slots return to debt.
STAGED_RESERVE = 5

# The freshness covenant: aim for a green row every AIM rounds; the
# pytest suite is the backstop for a gap of BACKSTOP rounds.  A name
# deferred at gap AIM re-certifies at gap BACKSTOP — never past it.
FRESHNESS_AIM = 3
FRESHNESS_BACKSTOP = 4


def planned_window() -> tuple[list[str], list[str], list[str]]:
    """(window, pending_after, deferred_debt): the next-round WINDOW,
    the staged names that stay PENDING one more round, and the debt
    names that defer to the round after (non-empty only when the
    registry exceeds the window's rotation capacity — the steady
    state past 150 oracled names)."""
    debt = registry.rotation_debt()
    pending = set(registry.pending_queries()[0])
    staged = [n for n in registry.STAGED_PRIORITY if n in pending]
    staged += sorted(pending - set(staged))  # unprioritized: loudly last
    reserve = min(len(staged), STAGED_RESERVE)
    debt_take = debt[: registry.DRIVER_WINDOW - reserve]
    deferred = debt[len(debt_take) :]
    room = registry.DRIVER_WINDOW - len(debt_take)
    take = staged[: max(room, 0)]
    return debt_take + take, staged[max(room, 0) :], deferred


def main() -> int:
    window, leftover, deferred = planned_window()
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
        # capacity: every oracled name — including the staged ones,
        # which are committed future registrations — must fit through
        # the debt slots within the backstop period, or deferrals
        # compound past gap 4
        oracled = (set(q) & set(registry.all_oracles())) | set(pq)
        capacity = (
            registry.DRIVER_WINDOW - STAGED_RESERVE
        ) * FRESHNESS_BACKSTOP
        assert len(oracled) <= capacity, (
            f"COVENANT BREAK: {len(oracled)} oracled names exceed the "
            f"{capacity}-name four-round capacity — shrink the registry "
            f"or the staged reserve"
        )
        # every deferred name must still be able to make the backstop:
        # it defers at gap FRESHNESS_AIM and re-certifies at gap
        # FRESHNESS_BACKSTOP because it sorts first next round
        latest = registry._latest_green()
        planning = max(latest.values()) + 1 if latest else 0
        late = [
            n
            for n in deferred
            if latest.get(n, 0) < planning - FRESHNESS_AIM
        ]
        assert not late, (
            f"COVENANT BREAK: deferred names already past gap "
            f"{FRESHNESS_AIM} would miss the {FRESHNESS_BACKSTOP}-round "
            f"backstop: {late}"
        )
        print(
            f"# invariants ok: {len(debt)} debt + {len(pq)} staged; "
            f"{len(oracled)}/{capacity} of four-round capacity",
            file=sys.stderr,
        )
    print("WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if leftover:
        print(f"# stays PENDING for the round after: {leftover}")
    if deferred:
        print(
            "# deferred debt (steady-state, NOT a break): re-enters next "
            f"round as the oldest cohort, re-certifies at gap "
            f"{FRESHNESS_BACKSTOP} exactly — {deferred}"
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
