"""Bounds-companion queries (round-7): the rows-only operators'
tolerance contracts as driver-checkable violation sets.

Two properties per companion:
  * GREEN on the real corpus — the registered query is empty and
    hash-matches the empty oracle (covered by test_oracle_diff over
    the registry; re-asserted here at smoke scale for the fast loop);
  * NON-VACUOUS — a corrupted twin/sketch produces violation rows.
    Without this, an always-empty query would "pass" even if its
    checks were dead code (the h9 lesson from ADVICE r6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_indexer_spark.operators import bounds as bd

VCOLS = ["scope", "metric", "observed", "lo", "hi"]


def _docs(spark):
    return spark.createDataFrame(
        [(i, "s%d" % (i % 2), 100 + 7 * i) for i in range(40)],
        "doc_id long, source string, n_chars long",
    )


def test_percentile_bounds_green_and_detects_drift(spark):
    from file_indexer_spark.operators import text as tx

    docs = _docs(spark)
    exact = tx.length_percentiles(docs)
    approx = tx.length_percentiles_approx(docs)
    ok = bd.percentile_bounds(
        docs, exact, approx, "source", "n_chars",
        [("p50_chars", 0.5), ("p90_chars", 0.9), ("p99_chars", 0.99)],
    )
    assert ok.columns == VCOLS and ok.count() == 0

    # corrupt the sketch: shift one group's p50 beyond any rank bound
    bad = approx.withColumn(
        "p50_chars",
        F.when(F.col("source") == "s0", F.col("p50_chars") + 1e6).otherwise(
            F.col("p50_chars")
        ),
    )
    out = bd.percentile_bounds(
        docs, exact, bad, "source", "n_chars",
        [("p50_chars", 0.5), ("p90_chars", 0.9), ("p99_chars", 0.99)],
    ).collect()
    assert [(r["scope"], r["metric"]) for r in out] == [("s0", "p50_chars")]
    assert out[0]["observed"] > out[0]["hi"]

    # corrupt a non-percentile column: exact-equality violation
    bad2 = approx.withColumn("n_docs", F.col("n_docs") + 1)
    out2 = bd.percentile_bounds(
        docs, exact, bad2, "source", "n_chars",
        [("p50_chars", 0.5), ("p90_chars", 0.9), ("p99_chars", 0.99)],
    )
    assert {r["metric"] for r in out2.collect()} == {"n_docs"}

    # drop a group: key_mismatch
    out3 = bd.percentile_bounds(
        docs, exact, approx.filter(F.col("source") != "s1"),
        "source", "n_chars",
        [("p50_chars", 0.5), ("p90_chars", 0.9), ("p99_chars", 0.99)],
    ).collect()
    assert [(r["scope"], r["metric"]) for r in out3] == [("s1", "key_mismatch")]


def test_hll_bounds_detects_estimate_drift(spark):
    exact = spark.createDataFrame(
        [("d1", 100, 50), ("d2", 200, 80)], "day string, n_events long, n_users long"
    )
    approx_ok = spark.createDataFrame(
        [("d1", 100, 55), ("d2", 200, 70)],
        "day string, n_events long, n_users_approx long",
    )
    assert bd.hll_bounds(exact, approx_ok).count() == 0
    # estimate outside 20%: violation; mismatched count: violation
    approx_bad = spark.createDataFrame(
        [("d1", 100, 80), ("d2", 199, 80)],
        "day string, n_events long, n_users_approx long",
    )
    got = {(r["scope"], r["metric"]) for r in bd.hll_bounds(exact, approx_bad).collect()}
    assert got == {("d1", "n_users_approx"), ("d2", "n_events")}


def test_twin_mismatch_detects_any_divergence(spark):
    a = spark.createDataFrame(
        [("d1", 1, 2), ("d2", 3, 4)], "day string, x long, y long"
    )
    assert bd.twin_mismatch(a, a, "day").count() == 0
    b = spark.createDataFrame(
        [("d1", 1, 99), ("d3", 3, 4)], "day string, x long, y long"
    )
    got = {(r["scope"], r["metric"]) for r in bd.twin_mismatch(a, b, "day").collect()}
    assert got == {("d1", "y"), ("d2", "key_mismatch"), ("d3", "key_mismatch")}


def test_recall_floor_detects_lost_pairs_and_shrunken_base(spark):
    base = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    assert bd.recall_floor(base, base, ["doc_a", "doc_b"], 0.9, 20, "recall").count() == 0
    # probe lost 80% of base pairs -> recall violation
    probe = base.filter(F.col("doc_a") % 5 == 0)
    out = bd.recall_floor(base, probe, ["doc_a", "doc_b"], 0.9, 20, "recall").collect()
    assert [r["metric"] for r in out] == ["recall"]
    assert out[0]["observed"] < 0.9 and out[0]["lo"] == 0.9
    # base below the fixture guarantee -> base_row_count violation
    out2 = bd.recall_floor(
        base.limit(5), base, ["doc_a", "doc_b"], 0.9, 20, "recall"
    ).collect()
    assert [r["metric"] for r in out2] == ["base_row_count"]


def test_kmeans_bounds_green_and_emission_path(spark, sf_smoke):
    from file_indexer_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    ok = bd.kmeans_bounds(emb, k=8)
    assert ok.columns == VCOLS and ok.count() == 0
    # sse_slack=0 makes the SSE check unsatisfiable (sse_lloyd > 0):
    # proves the violation path emits (the check is live, not dead code)
    out = bd.kmeans_bounds(emb, k=8, sse_slack=0.0).collect()
    assert [r["metric"] for r in out] == ["sse_vs_training_cost"]
    # recomputed SSE sits just under MLlib's trainingCost (the final
    # center update's half-step improvement) — the bound the real gate
    # pins one-sidedly at sse_slack=1.0001
    assert 0.9 < out[0]["observed"] <= 1.0001


def test_registered_bounds_queries_empty_at_smoke(spark, sf_smoke):
    """The five cheap companions must be empty on the real corpus at
    smoke scale (the MLlib-heavy dd6/sim8 companions run under the
    oracle-diff gate at sf0.01 instead)."""
    from file_indexer_spark import registry

    for name in ["t6a_bounds", "e12a_bounds", "e13a_bounds", "st6_bounds"]:
        df = registry.QUERIES[name](spark, sf_smoke)
        assert df.columns == VCOLS, name
        assert df.count() == 0, name
