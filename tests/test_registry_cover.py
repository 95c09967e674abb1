"""Ordering-contract guard for ``queries/registry.py``.

The external driver gates only the first 50 registry entries. Round 3's
verdict found 31 operator ids (all S*, VS*, O5-O7, ST4-ST6, ...) had never
received an external correctness signal because their only gates sat past
the cutoff. These tests pin the fix: the first 50 entries must form a set
cover of every tag used anywhere in the registry, so every SURVEY §2 id is
externally checked each round.
"""

from __future__ import annotations

from neomarket_clickhouse_indexer_spark.queries.registry import _SPECS

DRIVER_CUTOFF = 50


def test_first_50_cover_all_operator_ids():
    prefix_tags: set[str] = set()
    for s in _SPECS[:DRIVER_CUTOFF]:
        prefix_tags |= set(s.tags)
    all_tags: set[str] = set()
    for s in _SPECS:
        all_tags |= set(s.tags)
    # BONUS marks beyond-reference extras, not a §2 id
    uncovered = (all_tags - {"BONUS"}) - prefix_tags
    assert not uncovered, (
        f"operator ids with no gate inside the driver's first-{DRIVER_CUTOFF} "
        f"cutoff: {sorted(uncovered)}"
    )


def test_registry_names_unique():
    names = [s.name for s in _SPECS]
    assert len(names) == len(set(names))


def test_every_entry_has_tags():
    untagged = [s.name for s in _SPECS if not s.tags]
    assert not untagged, untagged
