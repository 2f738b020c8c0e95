from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_indexer_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# Test-session sizing (round-13 suite-runtime fix, OPTIMIZATION_r13.md):
# the suite runs hundreds of actions over sf0.001/sf0.01 fixtures, where
# a 32-way local master is pure scheduling overhead — the profiled
# 56-min run spent 24 min in SYSTEM time (thread thrash), and the same
# suite at local[8]/8 shuffle partitions is dramatically faster with
# identical results (every assertion is value- or plan-shape-based, not
# core-count-based). Production/bench sessions are untouched — they
# size from $SPARK_GRAFT_CPUS per the driver contract.
TEST_CPUS = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "file_indexer_spark_tests",
        shuffle_partitions=TEST_CPUS,
        cpus=TEST_CPUS,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def query_df(spark, sf_smoke):
    """Session-scoped lazy cache of CONSTRUCTED registered-query
    DataFrames at the smoke SF. Gate construction is expensive (many
    gates materialize index tables to parquet at construction time) and
    was previously paid twice — once by tests/test_oracle_diff.py and
    again by tests/test_plans.py's whole-registry cartesian scan (417 s
    of the profiled 56-min suite). A DataFrame is a lazy plan over
    on-disk parquet, so sharing the constructed object across tests
    changes nothing about what each test checks."""
    from file_indexer_spark import registry

    cache: dict[str, object] = {}

    def get(name: str):
        if name not in cache:
            cache[name] = registry.QUERIES[name](spark, sf_smoke)
        return cache[name]

    return get
