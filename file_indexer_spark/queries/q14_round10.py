"""Registered queries — round 10: graph centrality over the dedup
graph (dd18), ranked retrieval (t15), diversified ANN serving (sim16),
multi-touch attribution (e19), distribution-drift monitoring (ct6),
and source-interleaved curriculum ordering (sp13).

Each fills a pattern gap the earlier 192 queries don't cover: an
ITERATIVE vertex program with an unrolled exact oracle (dd18), BM25 —
the lexical ranking every retrieval-augmented pipeline runs beside the
sim-family's dense ANN (t15), greedy submodular re-ranking (sim16),
value ALLOCATION across a time-window join rather than selection from
it (e19), two-sample distribution comparison for corpus monitoring
(ct6), and fair round-robin interleaving for training order (sp13).

Reference parity: the raw-SQL passthrough surface
(file_indexer_go/db/database.go:269-317) accepts arbitrary analytic
SQL; these are the declarative DataFrame renditions with exact DuckDB
twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from file_indexer_spark.operators import dedup as dd
from file_indexer_spark.operators import graph as gr
from file_indexer_spark.queries.q06_ddmat_sampling import _DD7_PAIRS_CTES
from file_indexer_spark.registry_core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _table,
    register,
)
from file_indexer_spark.session import tune_session

# ------------------------------------------------------------- dd18

# The oracle unrolls the fixed iteration count verbatim — one CTE per
# round, every update in BIGINT integer division, so the recursive
# computation is exact and engine-agnostic (no float accumulation).


def _pagerank_round(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT n.doc_id,
               CAST({gr.BASE_E6} + (({gr.DAMPING_E2} *
                    COALESCE(CAST(SUM(p.rank_e6 // ed.deg) AS BIGINT), 0))
                    // 100) AS BIGINT) AS rank_e6
        FROM nodes n
        LEFT JOIN ed ON ed.dst = n.doc_id
        LEFT JOIN {prev} p ON p.doc_id = ed.src
        GROUP BY n.doc_id)"""


_PR_ROUNDS = ",".join(
    _pagerank_round(f"r{i}", f"r{i + 1}") for i in range(gr.ITERATIONS)
)

_DD18_SQL = f"""
    -- Fixed-point PageRank centrality over the dd3 near-dup graph:
    -- rank'(v) = base + (85 * sum(rank(u) // deg(u))) // 100, all
    -- BIGINT micro-units, {gr.ITERATIONS} unrolled rounds. Documents
    -- outside the pair subgraph hold the teleport base from round 1.
    WITH
    {_DD7_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    degs AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
             FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN degs d USING (src)),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    r0 AS (SELECT doc_id, CAST({gr.R0_E6} AS BIGINT) AS rank_e6 FROM nodes),
    {_PR_ROUNDS}
    SELECT d.doc_id,
           CAST(COALESCE(dg.deg, 0) AS BIGINT) AS deg,
           CAST(COALESCE(rf.rank_e6, {gr.BASE_E6}) AS BIGINT) AS rank_e6
    FROM documents d
    LEFT JOIN r{gr.ITERATIONS} rf ON rf.doc_id = d.doc_id
    LEFT JOIN degs dg ON dg.src = d.doc_id
    ORDER BY d.doc_id
    """


@register("dd18_pagerank_centrality", _DD18_SQL)
def dd18_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD18: PageRank centrality over the near-dup pair graph — the
    canonical-document signal (keep the most CENTRAL member of a dup
    neighborhood, not an arbitrary min-id). Iteration state is
    O(pair subgraph); corpus-wide rows join in once at the end."""
    tune_session(spark)
    docs = _table(spark, sf_dir, "documents")
    return gr.pagerank(docs, dd.minhash_lsh_pairs(docs))
