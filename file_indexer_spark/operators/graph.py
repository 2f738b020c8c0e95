"""Graph analytics over operator-derived pair lists (round 10).

The dedup family materializes document GRAPHS (dd3's near-dup pairs,
sim5's kNN edges); this module computes vertex-centrality measures over
them — the curation signal a training pipeline uses to pick CANONICAL
documents (keep the most central member of a duplicate neighborhood,
not an arbitrary min-id) and to weight sampling toward well-connected,
non-orphaned content.

Reference parity: the reference has no graph operator — this extends
the engine the way a 100 TB curation pipeline needs. The iterative
shape mirrors dd7's connected components (``dedup.py``
``_connected_components``): per-round lineage cuts, work proportional
to the PAIR SUBGRAPH, never the corpus.

Determinism contract (the repo-wide fixed-point discipline, cf.
``text.py bigram_surprisal`` and ``relational.py _revenue_e4``): ranks
are BIGINT micro-units and every update is integer arithmetic
(``DIV``), so Spark and the DuckDB oracle agree bit-for-bit — no float
accumulation order to diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# PageRank fixed-point parameters. R0_E6 is the per-vertex initial rank
# in micro-units; DAMPING_E2 the classic 0.85 as an integer percentage;
# BASE_E6 the teleport term (1 - d) * R0. ITERATIONS is fixed (and
# unrolled verbatim in the oracle SQL) — rank ORDER stabilizes long
# before rank VALUES at d=0.85, and 5 rounds is the conventional
# "centrality, not stationary distribution" budget.
R0_E6 = 1_000_000
DAMPING_E2 = 85
BASE_E6 = R0_E6 * (100 - DAMPING_E2) // 100
ITERATIONS = 5


def pagerank(
    docs: DataFrame,
    pairs: DataFrame,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """dd18: fixed-point PageRank centrality over an undirected pair
    graph (dd3's near-dup pairs), returning every document's rank.

    Update rule (all BIGINT, both engines):
        rank'(v) = BASE_E6 + (DAMPING_E2 * sum_{u~v} (rank(u) DIV deg(u))) DIV 100

    Integer division drops remainder mass (a deterministic variant of
    the dangling-mass simplification); what matters for the curation
    use-case is the induced ORDER, which integer quanta of 1e-6
    preserve.

    Scale shape for 100 TB:
      * iteration state is O(pair-subgraph vertices), never O(corpus):
        a document in no pair provably holds rank BASE_E6 from round 1
        on (no inflow), so those rows are emitted by one final
        left-join coalesce instead of being dragged through 5 rounds;
      * edges are degree-annotated once and hash-partitioned by src;
        each round is one join ranks⋈edges on src (reusing that
        partitioning) plus one groupBy(dst) exchange — the canonical
        2-exchange PageRank round, with map-side partial sums;
      * per-round ``localCheckpoint`` cuts lineage exactly like dd7's
        component iteration, so round N's plan does not replay rounds
        1..N-1 under executor loss at gate scale (durable
        ``checkpoint()`` is the cluster-grade variant).
    """
    if iterations < 1:
        raise ValueError("pagerank needs >= 1 iteration")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    degs = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    edges_d = (
        edges.join(degs, "src")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    # NOT checkpointed: the distinct leaves `sub` hash-partitioned on
    # doc_id and Spark reuses that exchange across rounds (ReusedExchange);
    # a localCheckpoint here would ERASE the partitioning metadata
    # (ExistingRDD => UnknownPartitioning) and force a fresh exchange
    # every round — measured 1.6x slower on dd20's twin (round-13 A/B).
    sub = edges_d.select(F.col("src").alias("doc_id")).distinct()
    ranks = sub.withColumn("rank_e6", F.lit(R0_E6).cast("long"))
    for _ in range(iterations):
        inflow = (
            edges_d.join(ranks, edges_d["src"] == ranks["doc_id"])
            .select("dst", F.expr("rank_e6 DIV deg").alias("quota"))
            .groupBy("dst")
            .agg(F.sum("quota").cast("long").alias("inflow"))
        )
        ranks = (
            sub.join(inflow, sub["doc_id"] == inflow["dst"], "left")
            .select(
                "doc_id",
                (
                    F.lit(BASE_E6)
                    + F.expr(
                        f"{DAMPING_E2} * coalesce(inflow, 0L) DIV 100"
                    )
                )
                .cast("long")
                .alias("rank_e6"),
            )
            .localCheckpoint(eager=False)
        )
    # read the degree off the CHECKPOINTED edge table — deriving it
    # from `degs` would replay the pair computation a second time
    out_deg = edges_d.select(F.col("src").alias("doc_id"), "deg").distinct()
    return (
        docs.select("doc_id")
        .join(ranks.withColumnRenamed("rank_e6", "sub_rank"), "doc_id", "left")
        .join(out_deg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("sub_rank", F.lit(BASE_E6)).cast("long").alias("rank_e6"),
        )
        .orderBy("doc_id")
    )


# dd20: personalization. Seeds are the anchor slice (the sim-family's
# query convention, vec_id < PPR_SEED_MAX); teleport mass goes ONLY to
# seeds, so rank measures weighted proximity to the anchor set.
PPR_SEED_MAX = 10


def personalized_pagerank(
    knn: DataFrame,
    corpus_ids: DataFrame,
    seed_max: int = PPR_SEED_MAX,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """dd20: WEIGHTED personalized PageRank over sim5's kNN graph —
    random-walk-with-restart proximity to a seed/anchor set, the
    label-propagation / seed-expansion primitive (find the corpus
    neighborhood of a curated exemplar set by graph proximity, not
    just direct cosine).

    Weighted + personalized, extending dd18's machinery:
      * edges are sim5's DIRECTED top-k links; the weight is the
        cosine in integer micro-units, and only POSITIVE weights
        propagate (a non-positive similarity carries no mass; this
        also keeps every out-weight sum > 0, so the integer division
        is total on both engines);
      * inflow is weight-proportional: quota(u->v) =
        (rank(u) * w_e6(u,v)) DIV W_e6(u), with W the vertex's total
        positive out-weight — the rank*weight product is
        try_multiply-guarded (t14's rule: at extreme seed counts the
        product could pass BIGINT headroom; fail loudly, never wrap);
      * teleport mass goes ONLY to seeds: rank'(v) =
        [v is seed] * BASE_E6 + (DAMPING_E2 * inflow(v)) DIV 100,
        starting from R0 on seeds and 0 elsewhere.

    All arithmetic BIGINT (the dd18 determinism contract); the oracle
    unrolls the rounds verbatim over sim5's replicated kNN CTEs.

    Scale shape: iteration state is O(kNN subgraph + seeds) — the
    corpus joins in once at the end with rank 0 for unreached
    vectors; per-round ``localCheckpoint`` cuts lineage (dd18's
    contract); edges are weight-annotated once and hash-partitioned
    by src.
    """
    if iterations < 1:
        raise ValueError("personalized_pagerank needs >= 1 iteration")
    edges = knn.select(
        F.col("vec_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        F.expr("CAST(ROUND(cosine * 1000000) AS BIGINT)").alias("w_e6"),
    ).filter(F.col("w_e6") > 0)
    wtot = edges.groupBy("src").agg(F.sum("w_e6").cast("long").alias("w_tot"))
    edges_w = (
        edges.join(wtot, "src")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    seeds = corpus_ids.filter(F.col("vec_id") < seed_max).select("vec_id")
    # NOT checkpointed (same ReusedExchange argument as pagerank's
    # `sub`: a cut erases the distinct's hash partitioning and costs an
    # exchange per round — measured 5.66 -> 8.94 s on dd20, round-13 A/B)
    nodes = (
        edges_w.select(F.col("src").alias("vec_id"))
        .unionByName(edges_w.select(F.col("dst").alias("vec_id")))
        .unionByName(seeds)
        .distinct()
    )
    seed_rank = F.when(F.col("vec_id") < seed_max, F.lit(R0_E6)).otherwise(F.lit(0))
    ranks = nodes.select("vec_id", seed_rank.cast("long").alias("rank_e6"))
    quota = (
        "ifnull(try_multiply(rank_e6, w_e6), CAST(raise_error("
        "'dd20: rank*weight product past BIGINT headroom; rescale R0_E6 "
        "or the seed set') AS BIGINT)) DIV w_tot"
    )
    base = F.when(F.col("vec_id") < seed_max, F.lit(BASE_E6)).otherwise(F.lit(0))
    for _ in range(iterations):
        inflow = (
            edges_w.join(ranks, edges_w["src"] == ranks["vec_id"])
            .select("dst", F.expr(quota).alias("quota"))
            .groupBy("dst")
            .agg(F.sum("quota").cast("long").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["vec_id"] == inflow["dst"], "left")
            .select(
                "vec_id",
                (
                    base
                    + F.expr(f"{DAMPING_E2} * coalesce(inflow, 0L) DIV 100")
                )
                .cast("long")
                .alias("rank_e6"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        corpus_ids.select("vec_id")
        .join(ranks, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("rank_e6", F.lit(0)).cast("long").alias("rank_e6"),
        )
        .orderBy("vec_id")
    )


def pagerank_refresh(
    stored_ranks: DataFrame,
    stored_pairs: DataFrame,
    union_assign: DataFrame,
    new_pairs: DataFrame,
    new_docs: DataFrame,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """dd19: maintain dd18's rank table under a batch ingest — the
    dd13 pattern applied to the vertex program. Inputs: the
    MATERIALIZED base ranks and base pair list, the REFRESHED cluster
    assignment over the union corpus (dd13's output), the dd12 pairs
    (>= 1 new side), and the batch.

    Exactness: PageRank's update rule is COMPONENT-LOCAL — a vertex's
    rank depends only on in-neighbors, so ranks outside a connected
    component never influence it, and every iteration starts from the
    same R0. New edges change only the components that contain their
    endpoints (dd13's refreshed assignment names exactly those), so
    re-running the vertex program over the affected components' union
    edge set — their stored base-base pairs plus the new pairs — and
    passing every other row through untouched provably equals dd18
    recomputed from scratch, which is exactly what the gate oracles.

    Scale shape: the iteration runs over O(affected members + new
    pairs); the untouched corpus is one anti-join passthrough of the
    stored rank table. A 100 TB corpus with a 1 GB ingest re-ranks in
    batch-sized time.
    """
    # both probe output and affected set feed MULTIPLE consumers below
    # (edge filter, vertex rerun, two anti-joins) — cut their lineage
    # once, or each consumer replays the dd12 probe / dd13 component
    # iteration from scratch (measured 2x slowdown on the realistic
    # incremental bench before the cut)
    new_pairs = new_pairs.localCheckpoint(eager=False)
    # the refreshed assignment feeds two semi-joins (label set + member
    # set); uncut, each replays the dd13 refresh's join chain
    union_assign = union_assign.localCheckpoint(eager=False)
    pair_ids = (
        new_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(new_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    affected_labels = (
        union_assign.join(pair_ids, "doc_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    affected = (
        union_assign.join(affected_labels, "cluster_id", "left_semi")
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    # components are closed: doc_a affected => doc_b affected
    aff_pairs = stored_pairs.select("doc_a", "doc_b").join(
        affected.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
    ).unionByName(new_pairs.select("doc_a", "doc_b"))
    recomputed = pagerank(affected, aff_pairs, iterations=iterations)
    untouched = stored_ranks.join(affected, "doc_id", "left_anti").select(
        "doc_id", "deg", "rank_e6"
    )
    new_isolated = (
        new_docs.select("doc_id")
        .join(affected, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("deg"),
            F.lit(BASE_E6).cast("long").alias("rank_e6"),
        )
    )
    return (
        untouched.unionByName(recomputed.select("doc_id", "deg", "rank_e6"))
        .unionByName(new_isolated)
        .orderBy("doc_id")
    )


# dd21: the refresh gate's OLD seed bound — the stored rank table was
# walked with seeds vec_id < PPR_SEED_MAX_OLD; the curation loop then
# expands the anchor set to dd20's vec_id < PPR_SEED_MAX.
PPR_SEED_MAX_OLD = 5


def personalized_pagerank_refresh(
    knn: DataFrame,
    corpus_ids: DataFrame,
    stored_ranks: DataFrame,
    old_seed_max: int = PPR_SEED_MAX_OLD,
    seed_max: int = PPR_SEED_MAX,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """dd21: maintain dd20's personalized-rank table under a SEED-SET
    EDIT — the curation loop's most common move (expand or trim the
    exemplar anchor set) currently costs a full re-walk; this is the
    dd19 affected-components pattern applied to the personalized walk.

    Exactness: teleport mass is SEED-LOCAL and inflow travels only
    along positive-weight edges, so a vertex's rank is a function of
    its weakly-connected component of the positive-weight kNN graph
    alone (WCC closure covers directed reachability).  A seed edit
    changes the teleport term only at the EDITED vertices (the
    symmetric difference of the two seed ranges), hence only the
    components containing an edited vertex can change rank; every
    iteration starts from the same seed-determined state, so re-running
    the walk over exactly those components with the NEW seed rule and
    passing every other stored row through untouched provably equals
    dd20 recomputed from scratch — which is what the gate oracles.

    Scale shape: the component labeling runs over the positive-weight
    PAIR SUBGRAPH (Kiveris star contractions, O(log n) rounds — the
    shared ``_connected_components``); the re-walk is O(affected
    members); the untouched corpus is one anti-join passthrough of the
    stored rank table.  A 100 TB corpus with a ten-exemplar seed edit
    re-ranks in neighborhood-sized time.
    """
    from file_indexer_spark.operators.dedup import _connected_components

    lo, hi = sorted((old_seed_max, seed_max))
    edited = corpus_ids.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select("vec_id")
    # the SAME positive-weight edge set the walk propagates over — a
    # non-positive edge carries no mass, so it cannot connect a vertex
    # to an edited seed for rank purposes
    pairs = (
        knn.select(
            F.col("vec_id").alias("doc_a"),
            F.col("neighbor_id").alias("doc_b"),
            F.expr("CAST(ROUND(cosine * 1000000) AS BIGINT)").alias("w_e6"),
        )
        .filter(F.col("w_e6") > 0)
        .select("doc_a", "doc_b")
    )
    labels, _ = _connected_components(pairs)
    # NOT checkpointed despite two consumers: the CC labels end at a
    # hash aggregate whose exchange Spark reuses between them, and the
    # final CC edge table is already a materialized checkpoint — a cut
    # here erases the partitioning instead (the dd20 A/B, round-13)
    labels = labels.select(F.col("doc_id").alias("vec_id"), "label")
    aff_labels = (
        labels.join(edited, "vec_id", "left_semi").select("label").distinct()
    )
    affected = (
        labels.join(aff_labels, "label", "left_semi")
        .select("vec_id")
        .unionByName(edited)  # edited vertices in no pair (isolated seeds)
        .distinct()
        .localCheckpoint(eager=False)  # feeds the edge filter, the
        # re-walk's corpus arg, AND the passthrough anti-join
    )
    sub_knn = knn.join(affected, "vec_id", "left_semi")
    recomputed = personalized_pagerank(
        sub_knn, affected, seed_max=seed_max, iterations=iterations
    )
    untouched = stored_ranks.join(affected, "vec_id", "left_anti").select(
        "vec_id", "rank_e6"
    )
    return untouched.unionByName(
        recomputed.select("vec_id", "rank_e6")
    ).orderBy("vec_id")


# dd22: fixed round budget for label propagation — communities on kNN
# graphs stabilize in a handful of synchronous rounds; the count is
# unrolled verbatim in the oracle SQL (the dd18/dd20 discipline).
LP_ITERATIONS = 4


def lp_edges(knn: DataFrame) -> DataFrame:
    """THE positive-weight directed edge derivation of the dd20/dd22
    graph family (sim5's top-k links, cosine in BIGINT micro-units,
    non-positive weights dropped) — the propagation and its refresh
    must agree edge-for-edge, so both read this one definition."""
    return knn.select(
        F.col("vec_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        F.expr("CAST(ROUND(cosine * 1000000) AS BIGINT)").alias("w_e6"),
    ).filter(F.col("w_e6") > 0)


def label_propagation(
    knn: DataFrame,
    corpus_ids: DataFrame,
    iterations: int = LP_ITERATIONS,
) -> DataFrame:
    """dd22: WEIGHTED label propagation over sim5's kNN graph — the
    community-detection primitive the curation loop pairs with dd20's
    seed expansion (dd20 answers "how close is every doc to my
    exemplars"; dd22 answers "what natural groups does the corpus fall
    into" without any seeds).

    Semantics (deterministic by construction, no RNG, no async order):
      * edges are sim5's directed top-k links with positive cosine
        micro-unit weights (the dd20 edge machinery verbatim) — a
        non-positive similarity casts no vote;
      * every vertex starts labeled with its own id;
      * each SYNCHRONOUS round, a vertex adopts the label with the
        largest incoming weight sum, ties broken by MIN label; a
        vertex with no incoming edges keeps its current label.  All
        weight sums are BIGINT — no float accumulation order to
        diverge, so Spark and the unrolled DuckDB oracle agree
        bit-for-bit;
      * a FIXED number of rounds (unrolled verbatim in the oracle):
        synchronous LP can 2-cycle on bipartite structures, so a fixed
        budget is the determinism contract, not a convergence claim —
        the curation use-case wants stable groupings, which kNN graphs
        reach in a few rounds.

    Scale shape for 100 TB: per round ONE join ranks⋈edges on src
    (reusing the weight-annotated edge table's hash partitioning) and
    ONE groupBy(dst, label) with map-side partial sums — O(edges)
    exchanged, never O(corpus^2); label state is O(subgraph vertices);
    per-round ``localCheckpoint`` cuts lineage (dd18's contract); the
    corpus joins in once at the end, isolated vectors keeping their
    own id as a singleton community.
    """
    if iterations < 1:
        raise ValueError("label_propagation needs >= 1 iteration")
    edges_w = lp_edges(knn).repartition("src").localCheckpoint(eager=False)
    nodes = (
        edges_w.select(F.col("src").alias("vec_id"))
        .unionByName(edges_w.select(F.col("dst").alias("vec_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("vec_id", F.col("vec_id").alias("lbl"))
    for _ in range(iterations):
        votes = (
            edges_w.join(labels, edges_w["src"] == labels["vec_id"])
            .select("dst", "lbl", "w_e6")
            .groupBy("dst", "lbl")
            .agg(F.sum("w_e6").cast("long").alias("wsum"))
        )
        # argmax via max_by — a hash aggregate with map-side partials
        # instead of the previous row_number window (which sorted every
        # (dst, lbl) vote row per round — guide §2.4, round-13). The
        # tie rule is IDENTICAL: maximize (wsum, -lbl) = largest weight
        # sum, ties to the MIN label (pinned by the dd22/dd23 oracles
        # and the LP property suites).
        best = votes.groupBy(F.col("dst").alias("vec_id")).agg(
            F.expr("max_by(lbl, struct(wsum, -lbl))").alias("new_lbl")
        )
        labels = (
            labels.join(best, "vec_id", "left")
            .select(
                "vec_id",
                F.coalesce("new_lbl", "lbl").cast("long").alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        corpus_ids.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("lbl", F.col("vec_id")).cast("long").alias("community"),
        )
        .orderBy("vec_id")
    )


def label_propagation_refresh(
    knn: DataFrame,
    corpus_ids: DataFrame,
    stored_edges: DataFrame,
    stored_labels: DataFrame,
    iterations: int = LP_ITERATIONS,
) -> DataFrame:
    """dd23: maintain dd22's community table under a BATCH INGEST —
    the dd19/dd21 affected-components pattern applied to label
    propagation, completing the incremental leg of the graph family
    (dd18→dd19 centrality, dd20→dd21 seed proximity, dd22→dd23
    communities).

    Inputs: the UNION-corpus kNN graph (new vectors change existing
    vectors' neighbor lists, so the graph must be re-scored — the same
    honest boundary dd21 records), the MATERIALIZED base edge table
    (:func:`lp_edges` over the base kNN, the compute-once discipline)
    and the stored community table.

    Exactness: with every vertex seeded by its own id, a fixed-round
    synchronous propagation is COMPONENT-LOCAL — labels originate and
    travel only inside a weakly-connected component of the
    positive-weight graph, so a vertex's community is a function of
    its component's edge set alone.  The ingest changes edges only
    where the union and base edge tables differ (new vertices' links
    plus existing vertices whose top-k lists the batch displaced);
    re-running the propagation over exactly the union-graph components
    containing a changed endpoint and passing every other stored row
    through untouched provably equals dd22 recomputed from scratch —
    which is what the gate oracles, verbatim.

    Scale shape: the edge diff is two anti-joins over narrow
    (src, dst, w) rows; the component labeling runs over the union
    pair subgraph (Kiveris star contractions, the shared
    ``_connected_components``); the re-propagation is O(affected
    members' edges x rounds); the untouched corpus is one anti-join
    passthrough of the stored table.  A 100 TB corpus with a 1 GB
    ingest re-groups in batch-neighborhood-sized time — with dd21's
    caveat recorded honestly: on a near-globally-connected synthetic
    kNN graph the affected set covers most vertices, and the pattern's
    win appears once the near-dup graph shatters (dd13's
    realistic-density measurement).
    """
    from file_indexer_spark.operators.dedup import _connected_components

    union_edges = lp_edges(knn).localCheckpoint(eager=False)
    # endpoints of the edge symmetric difference: every vertex whose
    # incident edge set the ingest changed (weight changes included).
    # Computed with ONE union + ONE aggregate — a single shuffle of both
    # sides — instead of two exceptAll legs (each of which exchanges
    # both inputs; 4 exchanges total — guide §2.4, round-12
    # optimization). The ±1 side-count imbalance equals exceptAll's
    # MULTISET symmetric difference regardless of duplicates (a nonzero
    # imbalance ⇔ differing multiplicities), so correctness does not
    # rest on the inputs being sets; that both edge tables ARE sets by
    # construction (kNN top-k links unique per (src, dst)) only bounds
    # the aggregate's size (ADVICE r12).
    changed = (
        union_edges.select("src", "dst", "w_e6", F.lit(1).alias("side"))
        .unionByName(
            stored_edges.select("src", "dst", "w_e6", F.lit(-1).alias("side"))
        )
        .groupBy("src", "dst", "w_e6")
        .agg(F.sum("side").alias("imbalance"))
        .filter(F.col("imbalance") != 0)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    changed_ids = (
        changed.select(F.col("src").alias("vec_id"))
        .unionByName(changed.select(F.col("dst").alias("vec_id")))
        .distinct()
    )
    # no distinct here: _connected_components canonicalizes and
    # dedups its input edges itself — the extra exchange+aggregate over
    # the round's largest frame bought nothing (guide §2.4)
    pairs = union_edges.select(
        F.least("src", "dst").alias("doc_a"),
        F.greatest("src", "dst").alias("doc_b"),
    )
    labels, _ = _connected_components(pairs)
    # NOT checkpointed despite two consumers: the CC labels end at a
    # hash aggregate whose exchange Spark reuses between them, and the
    # final CC edge table is already a materialized checkpoint — a cut
    # here erases the partitioning instead (the dd20 A/B, round-13)
    labels = labels.select(F.col("doc_id").alias("vec_id"), "label")
    aff_labels = (
        labels.join(changed_ids, "vec_id", "left_semi").select("label").distinct()
    )
    affected = (
        labels.join(aff_labels, "label", "left_semi")
        .select("vec_id")
        .unionByName(changed_ids)  # changed vertices in no union pair
        .distinct()
        .localCheckpoint(eager=False)  # feeds the subgraph filter, the
        # re-propagation's corpus arg, AND the passthrough anti-join
    )
    sub_knn = knn.join(affected, "vec_id", "left_semi")
    recomputed = label_propagation(sub_knn, affected, iterations=iterations)
    untouched = stored_labels.join(affected, "vec_id", "left_anti").select(
        "vec_id", "community"
    )
    merged = untouched.unionByName(
        recomputed.select("vec_id", "community")
    )
    # new vertices with no positive edge at all appear in neither the
    # stored table nor the affected set — singleton fallback, exactly
    # dd22's corpus left-join rule
    return (
        corpus_ids.select("vec_id")
        .join(merged, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("community", F.col("vec_id")).cast("long").alias("community"),
        )
        .orderBy("vec_id")
    )
