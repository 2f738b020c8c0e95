"""Differential test: every registered query hash-matches its DuckDB
oracle at the smoke scale factor (driver runs the same gate at sf0.01).
"""

from __future__ import annotations

import pytest

from file_indexer_spark import registry
from tests.oracle import compare

NAMES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_smoke, name):
    fn = registry.QUERIES[name]
    df = fn(spark, sf_smoke)
    if name not in registry.ORACLES:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare(df, registry.ORACLES[name], sf_smoke)
    assert not problems, f"{name}: " + "\n".join(problems)
