"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <float>}

Each query is fully executed via a no-op sink (``noop`` data source) so
timings measure scan + compute + shuffle, not driver-side collection.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from file_indexer_spark import registry  # noqa: E402
from file_indexer_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family — full-table scan+sort excluded
# (pure I/O), the rest cover window dedup, grouped join, multi-agg
# stats, top-k, timeline, semi-join work selection, search pushdown.
HEADLINE = [
    "d5_duplicates_report",
    "j2_duplicate_groups",
    "j3_duplicate_groups_pattern",
    "a1_database_stats",
    "a9_size_histogram",
    "a10_extension_stats",
    "a11_modification_timeline",
    "a12_duplicate_groups_nested",
    "a7b_phase2_files_to_hash",
    "p1_search_multidim",
    "p2_search_recency_page",
]


def run_query(fn, spark, sf_dir: str) -> float:
    start = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else -1.0

    spark = get_spark("file_indexer_spark_bench")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    extra = [n for n in sorted(registry.QUERIES) if n not in HEADLINE and registry.QUERIES[n].__dict__.get("bench", False)]
    names += extra

    # warm-up pass: JVM JIT / codegen / parquet-footer caches, not
    # counted — we measure steady-state engine throughput
    for name in names:
        run_query(registry.QUERIES[name], spark, sf_dir)

    timings: dict[str, float] = {}
    for name in names:
        timings[name] = round(run_query(registry.QUERIES[name], spark, sf_dir), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
