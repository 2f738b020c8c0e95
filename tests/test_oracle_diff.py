"""Differential test: every registered query hash-matches its DuckDB
oracle at the smoke scale factor (driver runs the same gate at sf0.01).
"""

from __future__ import annotations

import pytest

from file_indexer_spark import registry
from tests.oracle import compare

NAMES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_smoke, query_df, name):
    df = query_df(name)
    if name not in registry.ORACLES:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    # Guard: the driver's pandas canonicalizer sorts result columns, and
    # numpy arrays / Rows are unhashable — an oracle-bearing query must
    # serialize complex columns (to_json) before registration.  This bug
    # class shipped twice (a12 round 1, sim7 round 5); fail fast here.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: oracle-gated output has unserialized complex columns "
        f"{complex_cols} — the driver canonicalizer cannot hash them; "
        "serialize with to_json on BOTH engines (see a12/sim7)"
    )
    problems = compare(df, registry.ORACLES[name], sf_smoke)
    assert not problems, f"{name}: " + "\n".join(problems)
