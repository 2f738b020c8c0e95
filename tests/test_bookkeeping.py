"""Doc-vs-code sync gates: the SURVEY is the blueprint, so its totals
line must match the registry exactly (round-7 verdict #3: '147 vs 149'
drift class)."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_survey_totals_match_registry():
    from file_indexer_spark import registry

    text = open(os.path.join(REPO, "SURVEY.md")).read()
    matches = re.findall(
        r"Totals after round (\d+): \*\*(\d+) registered queries, (\d+) with full DuckDB\s*\n?oracles\*\*",
        text,
    )
    assert matches, "SURVEY totals line missing"
    latest = max(matches, key=lambda m: int(m[0]))
    assert int(latest[1]) == len(registry.QUERIES), (
        f"SURVEY says {latest[1]} queries, registry has {len(registry.QUERIES)}"
    )
    assert int(latest[2]) == len(registry.ORACLES), (
        f"SURVEY says {latest[2]} oracles, registry has {len(registry.ORACLES)}"
    )


def test_driver_priority_names_are_registered():
    """A typo'd name in _DRIVER_PRIORITY silently falls out of the
    driver's 50-slot window — fail here instead."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from file_indexer_spark import registry

    unknown = [n for n in e._DRIVER_PRIORITY if n not in registry.QUERIES]
    assert unknown == [], unknown
