"""Bounds-companion queries: driver-checkable VIOLATION SETS for the
rows-only operators (round-6 verdict #1).

Sketch-backed and MLlib-backed operators (percentile_approx, HLL++,
MinHashLSH, BRP-LSH, kmeans||) have implementation-defined output that
no external SQL engine can replicate, so their direct registrations
carry no oracle and the driver records ``err: "no_oracle"``. Their
TOLERANCE CONTRACTS, however, are perfectly SQL-shaped: compute the
violation set entirely in Spark (join the sketch against its exact
twin, emit every row that breaks the pinned bound) and gate it against
an EMPTY oracle of the same schema. A hash-match on the empty set IS a
driver-verifiable assertion of the contract — if the sketch drifts
past its bound, the Spark side emits rows and the gate fails loudly.

Shared output schema (all companions): ``scope`` (the violated group
key, or 'global'), ``metric`` (which bound), ``observed``, ``lo``,
``hi`` — the observed value and the closed interval it was required to
sit in (NULL hi = unbounded above).

Scale shape: every companion is the union of its operator's own plan
(sketch + exact twin, both already 100 TB-shaped) plus one key-aligned
join and an O(groups) conditional explode — no new shuffle class. The
MLlib recall companions reduce two bounded pair sets to ONE stats row
(two count aggregates + a cross of 1-row frames), never materializing
pairs to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the DuckDB side of every bounds companion: an empty relation with
#: the shared violation schema (the contract is "no violations").
EMPTY_VIOLATIONS_SQL = """
SELECT CAST(NULL AS VARCHAR) AS scope,
       CAST(NULL AS VARCHAR) AS metric,
       CAST(NULL AS DOUBLE) AS observed,
       CAST(NULL AS DOUBLE) AS lo,
       CAST(NULL AS DOUBLE) AS hi
WHERE FALSE
"""

# a check is (condition, scope, metric, observed, lo, hi)
Check = tuple


def _violations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check per row in ONE pass: a conditional array of
    violation structs, nulls filtered, exploded. A row violating no
    check contributes nothing; the all-green result is empty."""
    arr = F.array(
        *[
            F.when(
                cond,
                F.struct(
                    scope.cast("string").alias("scope"),
                    F.lit(metric).alias("metric"),
                    observed.cast("double").alias("observed"),
                    lo.cast("double").alias("lo"),
                    hi.cast("double").alias("hi"),
                ),
            )
            for cond, scope, metric, observed, lo, hi in checks
        ]
    )
    return (
        df.select(F.explode(F.filter(arr, lambda x: x.isNotNull())).alias("v"))
        .select("v.scope", "v.metric", "v.observed", "v.lo", "v.hi")
        .orderBy("scope", "metric")
    )


def _present(df: DataFrame, key: str, prefix: str) -> DataFrame:
    return df.select(
        key,
        *[F.col(c).alias(f"{prefix}_{c}") for c in df.columns if c != key],
        F.lit(1).alias(f"{prefix}_present"),
    )


def percentile_bounds(
    raw: DataFrame,
    exact: DataFrame,
    approx: DataFrame,
    key: str,
    val: str,
    pcols: list[tuple[str, float]],
    rank_tol: float = 0.02,
) -> DataFrame:
    """t6a/e12a companion: the rank-tolerance contract as a violation
    set. The sketch returns a real element of its group, so the check
    is on the element's ATTAINABLE RANK interval — with lt/le = the
    counts of group values strictly below / at-or-below the sketch
    value, the element occupies ranks (lt, le]/n, and the contract is
    that this interval intersects [p - rank_tol, p + rank_tol]. Rank
    space sidesteps value interpolation entirely, so the bound is
    exact at ANY group size (a value-interval rendition breaks on
    small groups, where interpolated exact percentiles fall between
    elements). Non-percentile columns must equal the exact twin's
    bit-for-bit; group keys must agree exactly (a missing/extra group
    is a 'key_mismatch' row).

    Scale shape: rank counting is ONE conditional aggregation over
    ``raw`` with the tiny approx row set broadcast-joined on the group
    key — the same single-pass-over-raw cost as the sketch itself."""
    a = _present(approx, key, "a")
    ranked = raw.select(key, val).join(F.broadcast(a), key)
    aggs = [F.count("*").cast("double").alias("n")]
    for c, _p in pcols:
        aggs.append(
            F.sum((F.col(val) < F.col(f"a_{c}")).cast("long")).cast("double").alias(f"lt_{c}")
        )
        aggs.append(
            F.sum((F.col(val) <= F.col(f"a_{c}")).cast("long")).cast("double").alias(f"le_{c}")
        )
    r = ranked.groupBy(key).agg(*aggs)
    rank_checks: list[Check] = []
    for c, p in pcols:
        lo_f = F.col(f"lt_{c}") / F.col("n")  # lowest attainable rank frac
        hi_f = F.col(f"le_{c}") / F.col("n")  # highest attainable rank frac
        rank_checks.append(
            (
                # NULL rank bounds (e.g. a NULL sketch value nulling the
                # comparison sums) are a violation, not a pass
                lo_f.isNull() | hi_f.isNull()
                | (lo_f > p + rank_tol) | (hi_f < p - rank_tol),
                F.col(key),
                c,
                hi_f,
                F.lit(max(p - rank_tol, 0.0)),
                F.lit(min(p + rank_tol, 1.0)),
            )
        )
    v_rank = _violations(r, rank_checks)

    pset = {c for c, _ in pcols}
    eq_cols = [c for c in exact.columns if c != key and c not in pset]
    j = _present(exact, key, "e").join(a, key, "full_outer")
    both = F.col("e_present").isNotNull() & F.col("a_present").isNotNull()
    checks: list[Check] = [
        (
            F.col("e_present").isNull() | F.col("a_present").isNull(),
            F.col(key),
            "key_mismatch",
            F.coalesce("e_present", "a_present"),
            F.lit(1),
            F.lit(1),
        )
    ]
    for c in eq_cols:
        # null-safe native comparison — see twin_mismatch for why
        e_c, a_c = F.col(f"e_{c}"), F.col(f"a_{c}")
        checks.append((both & ~a_c.eqNullSafe(e_c), F.col(key), c, a_c, e_c, e_c))
    return v_rank.unionByName(_violations(j, checks)).orderBy("scope", "metric")


def hll_bounds(
    exact: DataFrame,
    approx: DataFrame,
    key: str = "day",
    exact_col: str = "n_users",
    approx_col: str = "n_users_approx",
    rel_tol: float = 0.2,
    abs_tol: float = 2.0,
) -> DataFrame:
    """e13a companion: the HLL++ estimate must sit within
    ``max(rel_tol * exact, abs_tol)`` of the exact distinct count for
    every group (rel_tol = 4 sigma at rsd 0.05), and the non-sketch
    n_events column must be exact."""
    j = _present(exact, key, "e").join(_present(approx, key, "a"), key, "full_outer")
    both = F.col("e_present").isNotNull() & F.col("a_present").isNotNull()
    tol = F.greatest(F.lit(rel_tol) * F.col(f"e_{exact_col}"), F.lit(abs_tol))
    checks: list[Check] = [
        (
            F.col("e_present").isNull() | F.col("a_present").isNull(),
            F.col(key),
            "key_mismatch",
            F.coalesce("e_present", "a_present"),
            F.lit(1),
            F.lit(1),
        ),
        (
            both & ~F.col("a_n_events").eqNullSafe(F.col("e_n_events")),
            F.col(key),
            "n_events",
            F.col("a_n_events"),
            F.col("e_n_events"),
            F.col("e_n_events"),
        ),
        (
            both
            & (
                F.col(f"a_{approx_col}").isNull()
                | ~F.col(f"a_{approx_col}").between(
                    F.col(f"e_{exact_col}") - tol, F.col(f"e_{exact_col}") + tol
                )
            ),
            F.col(key),
            approx_col,
            F.col(f"a_{approx_col}"),
            F.col(f"e_{exact_col}") - tol,
            F.col(f"e_{exact_col}") + tol,
        ),
    ]
    return _violations(j, checks)


def twin_mismatch(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """st6 companion: a BIT-IDENTICAL twin contract (the streaming HLL
    merge must equal the batch sketch exactly — register merges are
    lossless). Emits one row per column value that differs, plus
    key_mismatch rows for groups present on one side only. Columns are
    matched by name; both frames must share the schema."""
    cols = [c for c in left.columns if c != key]
    j = _present(left, key, "l").join(_present(right, key, "r"), key, "full_outer")
    both = F.col("l_present").isNotNull() & F.col("r_present").isNotNull()
    checks: list[Check] = [
        (
            F.col("l_present").isNull() | F.col("r_present").isNull(),
            F.col(key),
            "key_mismatch",
            F.coalesce("l_present", "r_present"),
            F.lit(1),
            F.lit(1),
        )
    ]
    for c in cols:
        # null-safe NATIVE comparison: `!=` returns NULL (no violation)
        # when either side is NULL, and a double cast silently nulls
        # non-numeric columns — either would make the check vacuous in
        # exactly the corruption cases it exists to catch.
        l_c, r_c = F.col(f"l_{c}"), F.col(f"r_{c}")
        checks.append((both & ~l_c.eqNullSafe(r_c), F.col(key), c, l_c, r_c, r_c))
    return _violations(j, checks)


def recall_floor(
    base: DataFrame,
    probe: DataFrame,
    keys: list[str],
    floor: float,
    min_base: int,
    metric: str,
    extra_checks=None,
) -> DataFrame:
    """dd6/sim3 companion: the probe (MLlib) result must recover at
    least ``floor`` of the base (deterministic twin) rows, and the base
    set must be big enough to make the floor meaningful (the fixture
    guarantee ``min_base`` — a shrunken base would make the recall
    check vacuous, so it IS a violation). Two count aggregates + a
    1-row cross; pair sets never leave the executors."""
    n_base = base.agg(F.count("*").cast("double").alias("n_base"))
    n_hit = (
        base.join(probe, keys, "left_semi")
        .agg(F.count("*").cast("double").alias("n_hit"))
    )
    stats = (
        n_hit.crossJoin(n_base)
        .withColumn("recall", F.col("n_hit") / F.col("n_base"))
    )
    checks: list[Check] = [
        (
            F.col("recall") < floor,
            F.lit("global"),
            metric,
            F.col("recall"),
            F.lit(floor),
            F.lit(1.0),
        ),
        (
            F.col("n_base") < min_base,
            F.lit("global"),
            "base_row_count",
            F.col("n_base"),
            F.lit(float(min_base)),
            F.lit(None),
        ),
    ]
    if extra_checks:
        for cond_df, check in extra_checks:
            stats = stats.crossJoin(cond_df)
            checks.append(check)
    return _violations(stats, checks)


def kmeans_bounds(
    embeddings: DataFrame,
    k: int | None = None,
    max_iter: int | None = None,
    sse_slack: float = 1.0001,
) -> DataFrame:
    """sim8 companion: the k-means invariants that are TRUE invariants
    as a violation set — between 1 and k non-empty clusters (MLlib can
    legitimately converge to fewer than k), every vector assigned
    exactly once, and the model's own reported objective
    (``summary.trainingCost``) must agree with an INDEPENDENT
    distributed recomputation of the SSE under nearest-centroid
    assignment to the model's centers. ``trainingCost`` is evaluated
    BEFORE the final center update, and both Lloyd steps only improve
    the objective, so the recomputed SSE is at most ``trainingCost``
    (observed ~0.999x of it) — a genuinely one-sided invariant, gated
    at ``trainingCost * sse_slack``. The recomputation uses OUR SQL
    arithmetic, so a wrong centroid extraction or cast shows up as a
    violation too (typically blowing the upper bound by far more than
    the slack).

    The previous revision compared against the one-shot md5-sampled
    seeding's SSE, presented as "iterating only improves the
    objective" — but Lloyd monotonically improves only its OWN
    kmeans|| init, not an unrelated seed set, so that check could fail
    on valid data. It is NOT part of the hard gate (empirically it
    held at every tested sf, but an empirical observation is pytest
    material, not a driver contract).

    The SSE is computed distributed: k centroids broadcast against
    the corpus, per-vector min squared distance (strict left-to-right
    IEEE fold, the sim1 arithmetic), one sum. The model's own k
    centers are a k x dim driver-side constant — the legitimate small
    side of a broadcast."""
    from file_indexer_spark.operators import similarity as sim

    k = sim.KMEANS_K if k is None else int(k)
    max_iter = sim.KMEANS_MAX_ITER if max_iter is None else int(max_iter)

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    vecs = sim._spread(embeddings).select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, maxIter=max_iter, seed=20240813, featuresCol="features").fit(vecs)

    cluster_stats = (
        model.transform(vecs)
        .groupBy(F.col("prediction").alias("cluster_id"))
        .agg(F.count("*").alias("n_vectors"))
        .agg(
            F.count("*").cast("double").alias("n_clusters"),
            F.sum("n_vectors").cast("double").alias("n_assigned"),
        )
    )
    n_total = embeddings.agg(F.count("*").cast("double").alias("n_total"))

    sqd = (
        "aggregate(zip_with(v_emb, c_emb, (x, y) -> "
        "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        "0D, (acc, v) -> acc + v)"
    )

    def sse_of(cents: DataFrame, name: str) -> DataFrame:
        v = embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v_emb")
        )
        return (
            v.join(F.broadcast(cents))
            .withColumn("d2", F.expr(sqd))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("d2"))
            .agg(F.sum("d2").alias(name))
        )

    lloyd = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, c_emb array<double>",
    )
    training_cost = float(model.summary.trainingCost)
    stats = (
        cluster_stats.crossJoin(n_total)
        .crossJoin(sse_of(lloyd, "sse_lloyd"))
    )
    checks: list[Check] = [
        (
            (F.col("n_clusters") < 1) | (F.col("n_clusters") > k),
            F.lit("global"),
            "n_nonempty_clusters",
            F.col("n_clusters"),
            F.lit(1.0),
            F.lit(float(k)),
        ),
        (
            ~F.col("n_assigned").eqNullSafe(F.col("n_total")),
            F.lit("global"),
            "n_assigned",
            F.col("n_assigned"),
            F.col("n_total"),
            F.col("n_total"),
        ),
        (
            F.col("sse_lloyd").isNull()
            | (F.col("sse_lloyd") > training_cost * sse_slack),
            F.lit("global"),
            "sse_vs_training_cost",
            F.col("sse_lloyd") / F.lit(training_cost),
            F.lit(0.0),
            F.lit(sse_slack),
        ),
    ]
    return _violations(stats, checks)
