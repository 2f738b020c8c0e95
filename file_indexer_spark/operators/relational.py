"""Multi-table star-join analytics over the TPC-H-ish test tables.

DataFrame-native renditions of the classic warehouse join shapes
(region/nation dims → supplier/customer → orders ⋈ lineitem facts),
complementing the raw-SQL passthrough variants (s12b/s12c, reference
``file_indexer_go/db/database.go:269-317``) with declarative plans
Catalyst can reorder and AQE can re-plan at runtime.

Scale design (the point at 100 TB):
  * The only FORCED broadcast is nation ⋈ region — bounded at 25 x 5
    rows forever, independent of scale factor. Customer and supplier
    GROW with the scale factor, so they are joined declaratively and
    AQE decides broadcast-vs-shuffle from runtime sizes (at sf0.01
    they broadcast; at sf100000 they shuffle on the join key).
  * All date/segment predicates are plain Catalyst filters on scan
    columns — they push into the parquet reader (PushedFilters), so
    the fact-table scans read only the qualifying row groups.
  * Revenue is fixed-point: cents x (100 - discount-percent) summed as
    BIGINT ("revenue_e4", 1e-4 dollar units). Integer sums are
    associative, so partial aggregation order cannot produce
    engine-dependent floating-point drift — the same convention the
    raw-SQL s12c query uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _revenue_e4():
    """Fixed-point line revenue: exact BIGINT arithmetic, no float
    summation drift between Spark and the DuckDB oracle. (A function —
    building Columns needs an active SparkContext.)"""
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )


def region_nations(nation: DataFrame, region: DataFrame, region_name: str) -> DataFrame:
    """The nation keys/names of one region — a forever-tiny dim (25 x 5
    rows at ANY scale factor), safe to force-broadcast."""
    return (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("n_nationkey", "n_name")
    )


def regional_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01 00:00:00",
    date_to: str = "1998-01-01 00:00:00",
) -> DataFrame:
    """h1 (TPC-H Q5 shape): revenue per nation where the ordering
    customer and the line's supplier sit in the same region nation.

    Join order is declared smallest-first but left to Catalyst: the
    bounded nation⋈region dim is broadcast; supplier/customer narrow
    to (key, nationkey) before joining; the orders date filter prunes
    the fact scan before the big lineitem join.
    """
    nations = region_nations(nation, region, region_name)
    supp = supplier.join(
        F.broadcast(nations), supplier["s_nationkey"] == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_nationkey").alias("supp_nationkey"), "n_name")
    cust = customer.join(
        F.broadcast(nations.select("n_nationkey")),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nationkey"))
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    lines = lineitem.select("l_orderkey", "l_suppkey", _revenue_e4().alias("line_revenue_e4"))
    return (
        lines.join(ords, lines["l_orderkey"] == ords["o_orderkey"])
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .join(
            cust,
            (F.col("o_custkey") == cust["c_custkey"])
            & (F.col("cust_nationkey") == F.col("supp_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum("line_revenue_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "n_name")
    )


def returned_top_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01 00:00:00",
    date_to: str = "1996-07-01 00:00:00",
    k: int = 20,
) -> DataFrame:
    """h2 (TPC-H Q10 shape): top-k customers by revenue lost to
    returned lineitems in a half-year of orders.

    The returnflag + date predicates push into both fact scans; the
    per-customer aggregate happens BEFORE the customer/nation detail
    join, so the join input is one row per customer, not per lineitem
    — at 100 TB that ordering is the difference between joining 1e9
    rows and joining 1e12.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _revenue_e4().alias("line_revenue_e4")
    )
    per_customer = (
        returned.join(ords, F.col("l_orderkey") == ords["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("line_revenue_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "o_custkey")
        .limit(k)
    )
    detail = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        per_customer.join(detail, per_customer["o_custkey"] == detail["c_custkey"])
        .select(
            F.col("c_custkey"),
            "c_name",
            "revenue_e4",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue_e4"), "c_custkey")
    )


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01 00:00:00",
    date_to: str = "1996-07-01 00:00:00",
) -> DataFrame:
    """h3 (TPC-H Q4 shape): orders per priority that have at least one
    late lineitem (any line with l_shipdate > o_orderdate).

    NOT a semi join: a LeftSemi with the inequality in the condition
    makes the planner build a hash relation on the lineitem side —
    measured 4.9x slower at 10x data locally, and an OOM broadcast of
    the fact table at cluster scale. The EXISTS collapses to
    ``max(l_shipdate) > o_orderdate``, so lineitem is pre-aggregated
    to one row per order (map-side partial max — the shuffle carries
    O(orders) rows, not O(lineitems)) before an equi join that AQE is
    free to plan either way. The EXISTS predicate also implies
    ``l_shipdate > date_from`` (since o_orderdate >= date_from), which
    pushes into the lineitem scan and prunes lines that cannot qualify.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    last_ship = (
        lineitem.filter(F.col("l_shipdate") > F.lit(date_from))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_shipdate"))
    )
    return (
        ords.join(last_ship, ords["o_orderkey"] == F.col("l_orderkey"))
        .filter(F.col("last_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def pricing_summary(
    lineitem: DataFrame, ship_before: str = "2001-01-01 00:00:00"
) -> DataFrame:
    """h4 (TPC-H Q1 shape): the pricing-summary report — one scan, one
    hash aggregate on the 6-value (returnflag, linestatus) key, with
    map-side partials carrying ~all of the work.

    Every measure is FIXED-POINT BIGINT (qty e2, price e2, discounted
    e4, charge e6) so partial-agg order cannot drift from the oracle;
    the averages are exact integer-sum ratios rounded once at the end.
    At 100 TB the e6 charge sum approaches BIGINT range — swap to
    DECIMAL(38, 6) sums (same plan, Spark and DuckDB both support it).
    The date predicate pushes into the parquet scan; only the 7 used
    columns are read.
    """
    qty_e2 = F.round(F.col("l_quantity") * 100).cast("long")
    price_e2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    disc_price_e4 = price_e2 * (F.lit(100) - disc_pct)
    charge_e6 = disc_price_e4 * (F.lit(100) + tax_pct)
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_before))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_e2).alias("sum_qty_e2"),
            F.sum(price_e2).alias("sum_base_price_e2"),
            F.sum(disc_price_e4).alias("sum_disc_price_e4"),
            F.sum(charge_e6).alias("sum_charge_e6"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty_e2",
            "sum_base_price_e2",
            "sum_disc_price_e4",
            "sum_charge_e6",
            F.round(F.col("sum_qty_e2") / F.col("count_order") / 100.0, 4).alias("avg_qty"),
            F.round(F.col("sum_base_price_e2") / F.col("count_order") / 100.0, 4).alias(
                "avg_price"
            ),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-30 00:00:00",
) -> DataFrame:
    """h5 (TPC-H Q3 shape): top-10 undelivered orders of one market
    segment by discounted revenue.

    Join order is declared smallest-first (filtered customer → orders →
    lineitem) but LEFT TO AQE — customer grows with scale factor, so no
    forced broadcast. Both date predicates and the segment equality
    push into their scans; revenue is the fixed-point e4 convention.
    The top-10 is a TakeOrderedAndProject over the aggregated
    (orderkey, date, priority) rows — O(orders), never the lineitem
    stream.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(cutoff)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lines = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff)).select(
        "l_orderkey", _revenue_e4().alias("revenue_e4")
    )
    return (
        cust.join(ords, cust["c_custkey"] == ords["o_custkey"])
        .join(lines, ords["o_orderkey"] == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("revenue_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "o_orderdate", "o_orderkey")
        .limit(10)
    )


def revenue_forecast(
    lineitem: DataFrame,
    date_from: str = "1996-01-01 00:00:00",
    date_to: str = "1997-01-01 00:00:00",
    discount_lo_pct: int = 4,
    discount_hi_pct: int = 8,
    max_quantity: int = 24,
) -> DataFrame:
    """h6: the TPC-H Q6 shape — forecast revenue change from dropping
    a discount band: SUM(extendedprice * discount) over one year of
    shipments within a discount window and below a quantity cap.

    The purest pushdown showcase in the suite: a single fact scan with
    every predicate on scan columns (shipdate range, discount band,
    quantity cap all reach the parquet reader as PushedFilters, so at
    100 TB only the qualifying row groups are read), zero joins, and a
    one-row global aggregate whose shuffle carries exactly one partial
    per mapper. Revenue is fixed-point (cents x discount-percent,
    BIGINT 1e-4 dollar units) — integer partial sums are associative,
    so no engine-dependent float drift (same convention as h1-h5).

    Discount bounds are integer PERCENTS compared against the rounded
    cents-precision discount column, sidestepping the classic Q6
    gotcha that ``BETWEEN 0.04 AND 0.08`` on a double column is
    representation-sensitive.
    """
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
        & (disc_pct >= discount_lo_pct)
        & (disc_pct <= discount_hi_pct)
        & (F.col("l_quantity") < max_quantity)
    )
    revenue = F.round(F.col("l_extendedprice") * 100).cast("long") * disc_pct
    return filtered.select(revenue.alias("rev")).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("rev").cast("long").alias("revenue_e4"),
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_total_qty: int = 150,
    limit: int = 100,
) -> DataFrame:
    """h7: the TPC-H Q18 shape — customers whose single orders exceed a
    quantity threshold (large-volume buyers), top-k by order value.

    Classic Q18 semi-joins lineitem against a HAVING subquery and then
    RE-JOINS lineitem to re-sum the quantity. The declarative rewrite
    keeps the aggregate's value from the first pass — the heavy
    lineitem table is scanned and shuffled ONCE (on l_orderkey, its
    natural clustering); everything after operates on the qualifying
    orders (HAVING prunes ~97% here), and the final ordering is a
    TakeOrderedAndProject, never a global sort. Quantities sum as
    BIGINT (integral-valued doubles rounded once) so partial-agg order
    cannot drift the HAVING boundary between engines.
    """
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > min_total_qty)
    )
    return (
        orders.join(qty, orders["o_orderkey"] == qty["l_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(limit)
    )


def order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """h8: the TPC-H Q13 shape — the distribution of orders-per-customer
    INCLUDING the zero bucket (customers with no qualifying orders),
    the classic left-outer-join + double-aggregation pattern.

    Scale shape: orders AGGREGATE FIRST — groupBy(o_custkey) gets a
    map-side partial combine, so the one big shuffle carries
    O(distinct custkeys per task) partial counts instead of every raw
    order row (the round-8 rewrite of the join-then-count form, whose
    shuffle was the whole 100x tail: measured x100 wall 6.18 s -> 0.68 s,
    scale ratio 7.9 -> 1.5, and faster at x1 too). Customer then
    LEFT-joins the pre-aggregated (custkey, count) table — both sides
    narrow — and missing keys coalesce to the zero bucket. The
    order-side predicate (Q13's comment exclusion, rendered here on
    o_orderpriority) stays below the aggregation so it pushes into the
    parquet scan. The final distribution aggregation is O(max order
    count) — a few hundred rows at any scale.
    """
    per_key = (
        orders.filter(~F.col("o_orderpriority").like("%URGENT%"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count_nz"))
    )
    per_customer = customer.select("c_custkey").join(
        per_key, customer["c_custkey"] == per_key["o_custkey"], "left"
    ).select(F.coalesce("c_count_nz", F.lit(0)).alias("c_count"))
    return (
        per_customer.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def idle_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """h9: the TPC-H Q22 shape — customers with above-average balances
    and NO orders (the lost-opportunity report): a scalar aggregate
    subquery + LEFT ANTI join + segment rollup.

    Determinism: the "above average" boundary is evaluated by integer
    CROSS-MULTIPLICATION — a customer qualifies iff ``cents * n_pos >
    total_pos_cents`` where cents are BIGINT — so no floating-point
    average (whose accumulation order differs between engines) can
    flip a boundary customer. Balances aggregate as exact cents too.

    Scale shape: the scalar (total_pos_cents, n_pos) pair is one
    broadcast row; the anti-join probe side is pre-reduced to DISTINCT
    o_custkey (an anti-join only tests key existence, and distinct gets
    a map-side partial agg — the shuffle carries one row per custkey
    per task instead of every raw order, the same aggregate-first move
    as h8; measured 1.18 s → 0.83 s at 100× facts); the rollup is
    O(segments).
    """
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    with_cents = customer.withColumn("bal_cents", cents)
    scalar = with_cents.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("total_pos_cents"),
        F.count("*").alias("n_pos"),
    )
    order_keys = orders.select("o_custkey").distinct()
    candidates = (
        with_cents.join(F.broadcast(scalar))
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("total_pos_cents"))
        .join(order_keys, with_cents["c_custkey"] == order_keys["o_custkey"], "left_anti")
    )
    return (
        candidates.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("bal_cents").cast("long").alias("totacctbal_cents"),
        )
        .orderBy("c_mktsegment")
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """h10: the TPC-H Q7 shape — cross-border trade volume between
    supplier-nation and customer-nation pairs by order year, the
    widest join tree in the pack (lineitem ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation ⋈ nation).

    Scale shape: nation is the only FORCED broadcast (25 rows
    forever); supplier and customer join declaratively so AQE picks
    broadcast at small SF and shuffle at large. The fact-side work is
    ONE pass over lineitem: join to supplier's nation (via the tiny
    supp dim), to orders (l_orderkey — lineitem's natural clustering),
    then orders to customer's nation; the pair filter
    (supp_nation != cust_nation) and the year extraction are map-side.
    Revenue is the module's fixed-point BIGINT convention. The final
    rollup is O(nations² × years) — trivially small at any scale.
    """
    supp_n = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    return (
        lineitem.join(supp_n, lineitem["l_suppkey"] == supp_n["s_suppkey"])
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(cust_n, orders["o_custkey"] == cust_n["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("l_year"),
        )
        .agg(F.sum(_revenue_e4()).alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def top_revenue_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """h11: the TPC-H Q15 shape — the supplier(s) with MAXIMUM revenue
    over a quarter, ties kept (the scalar-max + equality join-back
    pattern Q15 expresses with a view).

    Scale shape: one lineitem shuffle onto l_suppkey for the revenue
    agg (date predicate pushed to the scan); the scalar max is a
    1-row broadcast; the equality filter shrinks the agg to the tied
    winners before the supplier dim join. Fixed-point BIGINT revenue,
    so the max boundary can't float-drift between engines.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue_e4()).alias("revenue_e4"))
    )
    mx = rev.agg(F.max("revenue_e4").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("revenue_e4") == F.col("max_rev"))
        .join(supplier, rev["l_suppkey"] == supplier["s_suppkey"])
        .select("s_suppkey", "s_name", "revenue_e4")
        .orderBy("s_suppkey")
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-09-01 00:00:00",
    date_to: str = "1996-10-01 00:00:00",
    promo_type: str = "PROMO",
) -> DataFrame:
    """h12: the TPC-H Q14 shape — the share of a month's revenue that
    came from promotional part types (conditional-aggregate ratio over
    a fact ⋈ dim join).

    Scale shape: the shipdate range pushes into the lineitem scan (one
    month of a 7-year corpus → ~1% of row groups read); part joins
    DECLARATIVELY on l_partkey — part grows with scale factor, so AQE
    picks broadcast at small SF and shuffle at large, and only
    (p_partkey, p_type) is read from the dim. The CASE split is
    map-side; the final aggregate is ONE row, so the shuffle carries a
    single partial per mapper. Revenue sums are the module's
    fixed-point BIGINT convention; the only float op is the final
    share division — one double division of two exact integers,
    bit-identical between engines.
    """
    lines = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from)) & (F.col("l_shipdate") < F.lit(date_to))
    ).select("l_partkey", _revenue_e4().alias("rev_e4"))
    dim = part.select("p_partkey", "p_type")
    return (
        lines.join(dim, lines["l_partkey"] == dim["p_partkey"])
        .agg(
            F.sum(
                F.when(F.col("p_type") == promo_type, F.col("rev_e4")).otherwise(F.lit(0))
            ).alias("promo_revenue_e4"),
            F.sum("rev_e4").alias("total_revenue_e4"),
        )
        .select(
            "promo_revenue_e4",
            "total_revenue_e4",
            F.round(
                F.lit(100.0) * F.col("promo_revenue_e4") / F.col("total_revenue_e4"), 4
            ).alias("promo_share_pct"),
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#4",
    max_size: int = 10,
) -> DataFrame:
    """h13: the TPC-H Q17 shape — revenue locked in small-quantity
    orders: lines of one brand's small parts whose quantity is below
    20% of that part's average order quantity (the classic correlated
    scalar subquery).

    The correlated ``l_quantity < 0.2 * avg(l_quantity per part)``
    decorrelates to a PER-PART WINDOW over the qualifying-part slice:
    one shuffle onto l_partkey (the brand+size predicates push into the
    part scan and the join prunes lineitem to ~1% first), then the
    sum/count window and the threshold test are partition-local — no
    second scan of lineitem and no join-back, which is strictly less
    work than the aggregate-then-rejoin form at any scale. The
    boundary is exact integer cross-multiplication:
    ``qty_e2 * 5 * n_lines < sum_qty_e2`` avoids the float average
    whose accumulation order could flip a boundary line between
    engines.
    """
    from pyspark.sql import Window

    qual = part.filter(
        (F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
    ).select("p_partkey")
    qty_e2 = F.round(F.col("l_quantity") * 100).cast("long")
    price_e2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    lines = lineitem.select(
        "l_partkey", qty_e2.alias("qty_e2"), price_e2.alias("price_e2")
    ).join(qual, F.col("l_partkey") == qual["p_partkey"])
    w = Window.partitionBy("l_partkey")
    flagged = lines.select(
        "qty_e2",
        "price_e2",
        F.sum("qty_e2").over(w).alias("sum_qty_e2"),
        F.count("*").over(w).alias("n_lines_part"),
    )
    return (
        flagged.filter(
            F.col("qty_e2") * F.lit(5) * F.col("n_lines_part") < F.col("sum_qty_e2")
        )
        .agg(
            F.count("*").cast("long").alias("n_small_lines"),
            F.sum("price_e2").cast("long").alias("revenue_e2"),
        )
    )


def disjunctive_band_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """h14: the TPC-H Q19 shape — revenue from three disjunctive
    brand/size/quantity bands (the OR-of-ANDs predicate that spans
    both sides of a join).

    The cross-table disjunction itself cannot push through the join,
    so the IMPLIED single-table relaxations are stated explicitly as
    filters below it: the part side narrows to the three brands with
    size in the union band, the lineitem side to the quantity union
    band — both reach their parquet scans as PushedFilters, so the
    join sees only candidate rows (~2% of each input) and the exact
    OR runs map-side on the joined slice. This is the hand statement
    of the inference TPC-H engines apply to Q19, and it is what makes
    the shape viable at 100 TB: without the pushed relaxations the
    join shuffles the full fact table. Fixed-point BIGINT revenue;
    one-row output.
    """
    bands = [
        ("Brand#2", 1, 15, 5, 15),
        ("Brand#4", 1, 25, 10, 25),
        ("Brand#19", 1, 35, 20, 35),
    ]
    brands = [b[0] for b in bands]
    size_lo = min(b[1] for b in bands)
    size_hi = max(b[2] for b in bands)
    qty_lo = min(b[3] for b in bands)
    qty_hi = max(b[4] for b in bands)
    dim = part.filter(
        F.col("p_brand").isin(brands)
        & (F.col("p_size") >= size_lo)
        & (F.col("p_size") <= size_hi)
    ).select("p_partkey", "p_brand", "p_size")
    lines = lineitem.filter(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select("l_partkey", "l_quantity", _revenue_e4().alias("rev_e4"))
    exact = None
    for b, slo, shi, qlo, qhi in bands:
        clause = (
            (F.col("p_brand") == b)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )
        exact = clause if exact is None else (exact | clause)
    return (
        lines.join(dim, lines["l_partkey"] == dim["p_partkey"])
        .filter(exact)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("rev_e4").cast("long").alias("revenue_e4"),
        )
    )


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    late_days: int = 60,
    k: int = 20,
) -> DataFrame:
    """h15: the TPC-H Q21 shape — suppliers who single-handedly held up
    multi-supplier orders: their line shipped late (> ``late_days``
    after the order date) while every co-supplier on the order shipped
    on time. Q21's EXISTS (another supplier on the order) and NOT
    EXISTS (another LATE supplier) self-joins of the fact table.

    Scale shape: both correlated quantifiers collapse to PER-ORDER
    COUNTS over ONE exchange of the fact table. Join order matters:
    orders (status-filtered, so ~1/3 of lines survive) joins FIRST on
    l_orderkey; the per-(orderkey, suppkey) aggregate and the
    per-order window then both REUSE the join's hash(l_orderkey)
    partitioning (a hash distribution on a subset of the grouping
    keys satisfies the aggregate's clustering), so the fact side
    exchanges once, not three times — measured at 100x facts:
    17.55 s -> 8.26 s, ratio 13.1 -> 6.0 (the agg-first form
    exchanged on (orderkey, suppkey), which the orderkey join could
    not reuse). The literal EXISTS/NOT EXISTS form self-joins the
    fact table twice on top. The nation filter applies at the tiny
    supplier-dim join AFTER counting (co-supplier evidence must span
    all nations). Ties break on s_name for a total order.
    """
    from pyspark.sql import Window

    ords = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    lines = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    flagged = (
        lines.join(ords, lines["l_orderkey"] == ords["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            (
                # o_orderdate is functionally dependent on l_orderkey, so any
                # per-group pick is the same value; max() makes the determinism
                # self-evident instead of leaning on first()'s arrival order.
                F.max("l_shipdate")
                > F.max("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
            )
            .cast("int")
            .alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        flagged.select(
            "l_suppkey",
            "is_late",
            F.count("*").over(w).alias("n_suppliers"),
            F.sum("is_late").over(w).alias("n_late"),
        )
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") >= 2)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
    dim = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(dim, waiting["l_suppkey"] == dim["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def national_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    market_region: str = "ASIA",
    supp_nation: str = "NATION_3",
    part_type: str = "ECONOMY",
    date_from: str = "1996-01-01 00:00:00",
    date_to: str = "1998-01-01 00:00:00",
) -> DataFrame:
    """h16: the TPC-H Q8 shape — one nation's share of a region's
    market for a part type, by order year (the widest dimensional
    reach in the suite: part, orders, customer→nation→region,
    supplier→nation all constrain one lineitem pass).

    Scale shape: every dimensional predicate narrows its dim BEFORE
    touching the fact — part to one type, orders to the two-year
    window (pushed to both scans), customers to the market region via
    the forever-tiny broadcast nation⋈region dim; supplier carries
    only its nation name. The fact flows through the join tree ONCE,
    smallest-dims-declared-first but left to AQE (part/customer/
    supplier grow with SF). The share is a conditional aggregate per
    year — O(years) output rows — computed as exact BIGINT sums with
    one final double division per row (bit-identical between engines).
    """
    qual_parts = part.filter(F.col("p_type") == part_type).select("p_partkey")
    lines = lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", _revenue_e4().alias("rev_e4")
    ).join(qual_parts, F.col("l_partkey") == qual_parts["p_partkey"])
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    cust = customer.join(
        F.broadcast(region_nations(nation, region, market_region).select("n_nationkey")),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supplier_nation"))
    return (
        lines.join(ords, lines["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .join(supp, lines["l_suppkey"] == supp["s_suppkey"])
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supplier_nation") == supp_nation, F.col("rev_e4")).otherwise(
                    F.lit(0)
                )
            ).alias("nation_revenue_e4"),
            F.sum("rev_e4").alias("total_revenue_e4"),
        )
        .select(
            "o_year",
            "nation_revenue_e4",
            "total_revenue_e4",
            F.round(
                F.lit(100.0) * F.col("nation_revenue_e4") / F.col("total_revenue_e4"), 4
            ).alias("mkt_share_pct"),
        )
        .orderBy("o_year")
    )
