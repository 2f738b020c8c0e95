"""Batch model inference over embedding columns — the classifier-based
filtering stage of a training-data pipeline (quality classifiers in the
FineWeb-Edu / phi-style curation recipes score every document and the
pipeline keeps a threshold slice).

The "model" here is a linear probe: sigmoid(w . x + b) with a
deterministic closed-form weight vector, so the DuckDB oracle can
recompute the exact same scores — the Spark-side plumbing (broadcast
weights as a codegen literal, map-side fold, fixed-point aggregation)
is the real subject. Swapping in learned weights (or an MLlib /
ONNX-runtime pandas-UDF scorer) changes only the expression, not the
plan: one corpus scan, zero shuffles before the per-label rollup.

Determinism contract: the dot product folds left in both engines
(Spark ``aggregate``, DuckDB ``list_reduce``); per-row scores are
snapped to integer micro-units (round(score * 1e6) as BIGINT) BEFORE
aggregation, so group sums are exact integer arithmetic and the
mean/threshold results cannot drift with partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
BIAS = 0.1
KEEP_THRESHOLD_E6 = 500_000  # score >= 0.5, compared in micro-units


def _weights():
    """w_i = ((i*37 mod 29) - 14) / 29 for i = 1..DIM — pseudo-random in
    [-0.48, 0.48], identical closed form in the DuckDB oracle."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: ((i * 37 % 29) - 14).cast("double") / F.lit(29.0),
    )


def classifier_scores(embeddings: DataFrame) -> DataFrame:
    """inf1: score = sigmoid(w . embedding + b) per vector; per-label
    volume, mean score, and kept-above-threshold counts.

    Plan: the score is one codegen expression over the scan (zip_with +
    left fold — no UDF, no Python, no shuffle); the only exchange is
    the O(labels) rollup. At 100 TB this is scan-bound, exactly like a
    real classifier-filter pass.
    """
    scored = embeddings.select("label", _score_e6().alias("s_e6"))
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(
                F.sum("s_e6").cast("double") / F.count("*") / 1_000_000.0, 6
            ).alias("mean_score"),
            F.sum((F.col("s_e6") >= KEEP_THRESHOLD_E6).cast("long"))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("label")
    )


# inf2: reliability-diagram bins. "Relevant" ground truth on the
# synthetic corpus is the label-parity rule (label % 2 = 0) — a
# deterministic stand-in for the human labels a real calibration pass
# consumes; the OPERATOR is the real thing (bin, count, confidence,
# accuracy, gap).
CALIB_BINS = 10


def _score_e6():
    """inf1's sigmoid score in integer micro-units — THE shared scoring
    expression (classifier_scores and calibration_bins must never
    diverge)."""
    z = (
        F.aggregate(
            F.zip_with(
                F.col("embedding"), _weights(), lambda x, w: x.cast("double") * w
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(BIAS)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return F.round(score * 1_000_000).cast("long")


def calibration_bins(embeddings: DataFrame) -> DataFrame:
    """inf2: classifier calibration — the reliability diagram as a
    table: decile-bin the predicted score, compare mean confidence
    against the observed positive rate per bin. The eval every
    quality-classifier gate (inf1/ct5) should run before its threshold
    is trusted; a |gap| that grows off-diagonal means the scores are
    NOT probabilities and the keep-threshold is miscalibrated.

    Determinism: scores snap to integer micro-units (inf1's contract),
    bins are integer division, and the per-bin confidence/accuracy are
    single divisions of exact integers rounded to 6 — no float
    accumulation anywhere.

    Scale shape: one codegen scoring expression over the scan, one
    hash aggregate onto <= CALIB_BINS keys with map-side combine —
    scan-bound, like inf1 itself.
    """
    scored = embeddings.select(
        _score_e6().alias("s_e6"),
        (F.col("label") % 2 == 0).alias("is_pos"),
    )
    binned = scored.select(
        F.expr(f"CAST(LEAST(s_e6 DIV 100000, {CALIB_BINS - 1}) AS INT)").alias(
            "bin"
        ),
        "s_e6",
        "is_pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum(F.col("is_pos").cast("long")).cast("long").alias("n_pos"),
            F.sum("s_e6").cast("long").alias("sum_s_e6"),
        )
        .select(
            "bin",
            "n_vectors",
            "n_pos",
            F.round(
                F.col("sum_s_e6").cast("double") / F.col("n_vectors") / 1_000_000.0,
                6,
            ).alias("mean_confidence"),
            F.round(
                F.col("n_pos").cast("double") / F.col("n_vectors"), 6
            ).alias("pos_rate"),
            F.round(
                F.abs(
                    F.col("sum_s_e6").cast("double")
                    / F.col("n_vectors")
                    / 1_000_000.0
                    - F.col("n_pos").cast("double") / F.col("n_vectors")
                ),
                6,
            ).alias("calib_gap"),
        )
        .orderBy("bin")
    )


def roc_auc(embeddings: DataFrame) -> DataFrame:
    """inf3: EXACT ROC-AUC of the quality classifier against the
    label-parity ground truth (inf2's rule) — the eval number every
    threshold decision (inf1's keep slice, ct5's gate) should quote
    beside the calibration table.  Computed as the Mann-Whitney U
    rank statistic with MIDRANK tie handling, in exact integer
    arithmetic end to end:

        AUC = (2*R_pos - P*(P+1)) / (2*P*N)

    where 2*R_pos = sum over positive rows of (min_rank + max_rank)
    of the row's score group — doubled midranks stay integers, so the
    numerator and denominator are exact BIGINTs and only the final
    single division rounds (to 6, the repo's float contract).

    Scale shape: scores snap to integer micro-units (inf1's shared
    expression), so the rank pass groups onto AT MOST 1e6+1 distinct
    keys REGARDLESS of corpus size — the cumulative window runs over
    a bounded, metadata-sized table, never the corpus.  One scan +
    one bounded hash aggregate + one bounded window: scan-bound like
    inf1 itself.
    """
    scored = embeddings.select(
        _score_e6().alias("s"),
        (F.col("label") % 2 == 0).cast("long").alias("pos"),
    )
    return _auc_from_scored(scored)


def _auc_from_scored(scored: DataFrame) -> DataFrame:
    """The rank-statistic back half over any (s, pos) row set —
    split out so the property test can drive it with arbitrary
    score/label mixes."""
    from pyspark.sql.window import Window

    by_s = scored.groupBy("s").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("np"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_s.withColumn(
        "below", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    agg = cum.agg(
        F.sum(F.col("np") * (2 * F.col("below") + F.col("n") + 1))
        .cast("long")
        .alias("two_rank_sum"),
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_total"),
    )
    num = (F.col("two_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
        "long"
    )
    den = (2 * F.col("n_pos") * (F.col("n_total") - F.col("n_pos"))).cast("long")
    return agg.select(
        "n_pos",
        (F.col("n_total") - F.col("n_pos")).cast("long").alias("n_neg"),
        num.alias("auc_num"),
        den.alias("auc_den"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("auc"),
    )
