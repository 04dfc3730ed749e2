"""The driver's correctness gate checks the FIRST 50 registered queries;
registry._WINDOW_FIRST pins that set each round and _WINDOW_DEFERRED
documents everything consciously left out. These assertions make the
rotation mechanical: adding a query without placing it in exactly one of
the two lists fails CI, so a query can never silently drop out of the
verification rotation (VERDICT r4 demand #8)."""

from __future__ import annotations

from iot_big_data_engineering_spark import registry

_DRIVER_WINDOW_SLOTS = 50


def test_window_and_deferred_tile_registry():
    names = set(registry.all_queries())
    window = registry._WINDOW_FIRST
    deferred = registry._WINDOW_DEFERRED
    assert len(window) == len(set(window)), "duplicate names in window"
    assert len(deferred) == len(set(deferred)), "duplicate names in deferred"
    overlap = set(window) & set(deferred)
    assert not overlap, f"queries in both lists: {sorted(overlap)}"
    missing = names - set(window) - set(deferred)
    assert not missing, (
        f"registered queries in neither the window nor the documented "
        f"deferral list: {sorted(missing)}"
    )
    ghosts = (set(window) | set(deferred)) - names
    assert not ghosts, f"listed but not registered: {sorted(ghosts)}"


def test_window_fills_driver_slots_exactly():
    # fewer wastes externally-verified slots; more silently pushes the
    # tail queries out of the gate
    assert len(registry._WINDOW_FIRST) == _DRIVER_WINDOW_SLOTS


def test_window_is_registry_prefix():
    names = list(registry.all_queries())
    assert names[: len(registry._WINDOW_FIRST)] == registry._WINDOW_FIRST
