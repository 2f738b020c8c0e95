"""Registered queries — round 9 (cont. 2): the remaining TPC-H plan
shapes expressible over the trimmed test schemas — promo revenue share
(h12/Q14), small-quantity correlated-average revenue (h13/Q17),
disjunctive band revenue (h14/Q19), waiting-supplier quantifier
self-joins (h15/Q21), and national market share (h16/Q8).

Each exercises a Catalyst shape no earlier h-query pins: a
conditional-aggregate ratio over a fact⋈dim join (h12), a correlated
scalar subquery decorrelated to a window (h13), a cross-table
disjunction with hand-stated single-table relaxations (h14), dual
EXISTS/NOT-EXISTS quantifiers collapsed to per-order counts (h15),
and a six-table dimensional star with a per-group share (h16).
Reference parity: the raw-SQL passthrough surface
(file_indexer_go/db/database.go:269-317) accepts arbitrary analytic
SQL of these shapes; the DataFrame renditions are the declarative
equivalents Catalyst can reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from file_indexer_spark.operators import relational as rel
from file_indexer_spark.registry_core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _table,
    register,
)
from file_indexer_spark.session import tune_session

# The module's fixed-point line-revenue fragment (relational.py
# _revenue_e4 rendered in SQL) — shared by the oracles below.
_REV_E4 = (
    "CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))"
)


@register(
    "h12_promo_revenue_share",
    f"""
    -- TPC-H Q14 shape: one month's promo-type revenue share. Exact
    -- BIGINT sums; the share is one double division of two exact
    -- integers, bit-identical between engines.
    WITH j AS (
        SELECT {_REV_E4} AS rev, p.p_type
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00')
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
               AS promo_revenue_e4,
           CAST(SUM(rev) AS BIGINT) AS total_revenue_e4,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                              AS DOUBLE)
                       / CAST(SUM(rev) AS DOUBLE), 4) AS promo_share_pct
    FROM j
    """,
)
def h12_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: shipdate range pushed to the fact scan, part joined
    declaratively (AQE broadcast at small SF), map-side CASE, one-row
    aggregate."""
    tune_session(spark)
    return rel.promo_revenue_share(
        _table(spark, sf_dir, "lineitem"), _table(spark, sf_dir, "part")
    )


@register(
    "h13_small_qty_revenue",
    """
    -- TPC-H Q17 shape: the correlated 20%%-of-average quantity test,
    -- decorrelated to a per-part window; exact integer
    -- cross-multiplication (qty*5*n < sum) avoids the float average.
    WITH lines AS (
        SELECT l.l_partkey,
               CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS qty_e2,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_e2
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#4' AND p.p_size <= 10),
    flagged AS (
        SELECT qty_e2, price_e2,
               SUM(qty_e2) OVER (PARTITION BY l_partkey) AS sum_qty_e2,
               COUNT(*) OVER (PARTITION BY l_partkey) AS n_lines_part
        FROM lines)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(SUM(price_e2) AS BIGINT) AS revenue_e2
    FROM flagged
    WHERE qty_e2 * 5 * n_lines_part < sum_qty_e2
    """,
)
def h13_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: brand+size predicates pushed to the part scan; ONE
    shuffle of the qualifying slice onto l_partkey; window + threshold
    partition-local (no join-back, no second lineitem scan)."""
    tune_session(spark)
    return rel.small_quantity_revenue(
        _table(spark, sf_dir, "lineitem"), _table(spark, sf_dir, "part")
    )


@register(
    "h14_disjunctive_revenue",
    f"""
    -- TPC-H Q19 shape: OR-of-ANDs across both join sides; the oracle
    -- states the raw disjunction (DuckDB infers its own pushdowns).
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_REV_E4}) AS BIGINT) AS revenue_e4
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 5 AND 15)
       OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def h14_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the implied single-table relaxations are stated as
    explicit filters so both scans prune before the join; the exact
    disjunction runs map-side on the joined slice."""
    tune_session(spark)
    return rel.disjunctive_band_revenue(
        _table(spark, sf_dir, "lineitem"), _table(spark, sf_dir, "part")
    )


@register(
    "h15_waiting_suppliers",
    """
    -- TPC-H Q21 shape: EXISTS(co-supplier) and NOT EXISTS(other late
    -- supplier) collapsed to per-order counts over a (orderkey,
    -- suppkey) pre-aggregate; late = shipped > 60 days after order.
    WITH per_os AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS max_shipdate
        FROM lineitem GROUP BY l_orderkey, l_suppkey),
    flagged AS (
        SELECT p.l_orderkey, p.l_suppkey,
               CASE WHEN p.max_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM per_os p JOIN orders o ON p.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'),
    counted AS (
        SELECT l_suppkey, is_late,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_suppliers,
               SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late
        FROM flagged),
    waiting AS (
        SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM counted
        WHERE is_late = 1 AND n_suppliers >= 2 AND n_late = 1
        GROUP BY l_suppkey)
    SELECT s.s_name, w.numwait
    FROM waiting w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def h15_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: three fact-side shuffles on the SAME key (orderkey)
    replace two self-joins of the fact table; nation filter applies at
    the tiny dim join after counting."""
    tune_session(spark)
    return rel.waiting_suppliers(
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "supplier"),
        _table(spark, sf_dir, "nation"),
    )


@register(
    "h16_market_share",
    f"""
    -- TPC-H Q8 shape: NATION_3's share of ASIA's ECONOMY-part market
    -- by order year. Exact BIGINT sums; one double division per year.
    WITH j AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
               {_REV_E4} AS rev, n2.n_name AS supplier_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        JOIN orders o ON l.l_orderkey = o.o_orderkey
         AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey)
    SELECT o_year,
           CAST(SUM(CASE WHEN supplier_nation = 'NATION_3' THEN rev ELSE 0 END)
                AS BIGINT) AS nation_revenue_e4,
           CAST(SUM(rev) AS BIGINT) AS total_revenue_e4,
           ROUND(100.0 * CAST(SUM(CASE WHEN supplier_nation = 'NATION_3'
                                       THEN rev ELSE 0 END) AS DOUBLE)
                       / CAST(SUM(rev) AS DOUBLE), 4) AS mkt_share_pct
    FROM j GROUP BY o_year ORDER BY o_year
    """,
)
def h16_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: every dim narrows before the single fact pass;
    nation⋈region force-broadcast (bounded forever), the growing dims
    left to AQE."""
    tune_session(spark)
    return rel.national_market_share(
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "supplier"),
        _table(spark, sf_dir, "nation"),
        _table(spark, sf_dir, "region"),
        _table(spark, sf_dir, "part"),
    )
