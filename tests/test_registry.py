"""Registry window contract: the driver hash-checks exactly the first
50 queries in ``queries()`` iteration order, so the window must (a) be
exactly 50 real names, (b) lead iteration order, and (c) cover every
operator module — the round-2 failure mode was whole modules (ml,
streaming, multimodal, sources, bucketing) never receiving a driver
row because they registered after slot 50."""

from __future__ import annotations

from bigdata_deepfakeanalysis_spark import registry


def test_window_is_exactly_50_unique_registered_names():
    win = registry.window()
    assert len(win) == 50
    assert len(set(win)) == 50
    qs = registry.all_queries()
    missing = [n for n in win if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_leads_iteration_order():
    first50 = list(registry.all_queries())[:50]
    assert first50 == registry.window()
    # oracles iterate in the same priority order (driver zips by key,
    # but keep both surfaces consistent anyway)
    oracle_names = list(registry.all_oracles())
    windowed_oracles = [n for n in registry.window() if n in oracle_names]
    assert oracle_names[: len(windowed_oracles)] == windowed_oracles


def test_window_covers_every_query_module():
    qs = registry.all_queries()
    win = set(registry.window())
    by_module: dict[str, list[str]] = {}
    for name, fn in qs.items():
        by_module.setdefault(fn.__module__, []).append(name)
    uncovered = {
        mod: names
        for mod, names in by_module.items()
        if not (set(names) & win)
    }
    assert not uncovered, f"modules with no windowed query: {uncovered}"


def test_all_queries_registered_beyond_window_still_present():
    qs = registry.all_queries()
    assert len(qs) >= 96  # nothing dropped by the reorder
