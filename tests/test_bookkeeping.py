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


# Extension-operator families documented in SURVEY §2.9a.  Core
# reference-parity families (a/j/p/s/d and the w write-path gates) live
# in the §2.1–§2.8 tables instead and are not checked here.
_EXT_FAMILIES = (
    "t", "dd", "sim", "e", "sp", "ct", "ch", "mx",
    "pp", "inf", "sd", "st", "m", "x", "h",
)


def test_survey_2_9a_table_covers_registry():
    """Every base-numbered extension query in the registry must have a
    row in the SURVEY §2.9a inventory table (round-10 verdict #2: the
    12 round-10 operators were documented only in prose — the table
    the coverage review grades against had drifted)."""
    from file_indexer_spark import registry

    text = open(os.path.join(REPO, "SURVEY.md")).read()
    sec = text.split("### 2.9a")[1].split("### 2.9 ")[0]
    table_ids = set(re.findall(r"^\| ([A-Z]+\d+) \|", sec, re.M))
    missing = set()
    for key in registry.QUERIES:
        m = re.match(r"^([a-z]+)(\d+)_", key)  # base ops only (no a/b/c suffix)
        if not m or m.group(1) not in _EXT_FAMILIES:
            continue
        fid = (m.group(1) + m.group(2)).upper()
        if fid not in table_ids:
            missing.add(fid)
    assert missing == set(), (
        f"SURVEY §2.9a table is missing rows for registered operators: "
        f"{sorted(missing)}"
    )
    # and no phantom rows: every extension-family table ID must map to
    # at least one registered query
    registered = {
        (m.group(1) + m.group(2)).upper()
        for key in registry.QUERIES
        if (m := re.match(r"^([a-z]+)(\d+)", key))
    }
    phantom = {
        i for i in table_ids
        if re.match(r"^([A-Z]+)", i).group(1).lower() in _EXT_FAMILIES
        and i not in registered
    }
    assert phantom == set(), f"SURVEY §2.9a rows with no registered query: {sorted(phantom)}"


def test_driver_priority_names_are_registered():
    """A typo'd name in _DRIVER_PRIORITY silently falls out of the
    driver's 50-slot window — fail here instead."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from file_indexer_spark import registry

    unknown = [n for n in e._DRIVER_PRIORITY if n not in registry.QUERIES]
    assert unknown == [], unknown
