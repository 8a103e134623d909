"""Registry ordering contract: the driver's correctness artifact only
records the first ``DRIVER_WINDOW`` entries, so iteration order must
place every query family inside that window (see registry.py docstring).
"""

from importlib import import_module

from chain_sync_spark.registry import (
    DRIVER_WINDOW,
    _MODULES,
    _PROMOTED_RELATIONAL,
    all_oracles,
    all_queries,
)


def _module_names(suffix: str) -> set[str]:
    mod = next(m for m in _MODULES if m.endswith(suffix))
    return set(import_module(mod).QUERIES)


def test_every_family_inside_driver_window():
    window = list(all_queries())[:DRIVER_WINDOW]
    window_set = set(window)
    for family in ("llm_pipeline", "temporal", "scalars", "sync_queries"):
        names = _module_names(family)
        missing = names - window_set
        assert not missing, f"{family} queries outside driver window: {missing}"
    for name in _PROMOTED_RELATIONAL:
        assert name in window_set, f"promoted relational rep {name} fell out of window"


def test_window_is_exactly_full():
    # A short window wastes driver-green capacity; an overflow silently
    # drops the tail of a family. Keep it exactly full.
    names = list(all_queries())
    assert len(names) >= DRIVER_WINDOW
    non_relational = sum(
        len(_module_names(f))
        for f in ("llm_pipeline", "temporal", "scalars", "sync_queries")
    )
    assert non_relational + len(_PROMOTED_RELATIONAL) == DRIVER_WINDOW, (
        "window layout drifted: adjust _PROMOTED_RELATIONAL so the first "
        f"{DRIVER_WINDOW} entries stay exactly one window"
    )


def test_every_query_has_oracle_or_is_documented_rows_only():
    oracles = all_oracles()
    rows_only = {n for n in all_queries() if n not in oracles}
    assert rows_only == {"sync_markdown_parse"}, (
        f"unexpected rows-only queries: {rows_only}"
    )
