"""Corpus-curation operators for training-data pipelines.

The curation passes a 100 TB pretraining pipeline runs between raw
ingestion and packing, beyond the dedup/quality operators in
``operators.dedup`` / ``operators.text``:

  * benchmark_contamination — n-gram overlap of every candidate
    document against a benchmark/eval set (decontamination: a doc whose
    shingles are mostly benchmark shingles leaks eval data into
    training and must be dropped).
  * pii_scrub — pattern-based PII / blocked-term accounting and
    redaction sizing (emails, IPv4, phone numbers, plus a policy
    blocklist) rolled up per source.
  * repetition_stats — Gopher-style repetition signals per document
    (top-word fraction, distinct-bigram fraction): the cheap filter
    that catches boilerplate and degenerate generations before any
    pairwise dedup runs.
  * token_chunking — token-budget chunking with overlap (stride <
    chunk size): the layout pass that turns long documents into
    model-window-sized training rows.
  * mixture_resample — deterministic per-source downsampling to target
    mixture rates, keyed on ``md5(doc_id:source)`` so the sample is
    stable across re-runs, retries, and cluster sizes (same rationale
    as ``sampling.hash_split`` — Spark task retries re-evaluate
    ``rand()``).

All operators are pure Catalyst expression programs (no Python UDFs):
per-document work is map-side; shuffles carry only exploded n-gram
rows into partially-aggregated counts or tiny per-source rollups.
Every emitted value is computed by an identical expression tree in the
DuckDB oracles (registry ct1/ct2/ct3/ch1/mx1), so results hash-match.

The reference has no curation operators (its corpus is file metadata);
these extend SURVEY.md §2.9a as first-class components over the
driver's ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from file_indexer_spark.functions import hashing as H

# --------------------------------------------------------- ct1 contamination

# Benchmark membership: first hex char of md5(doc_id) == '0' (~1/16 of
# the corpus stands in for the eval set; in production this is a real
# benchmark table on the same shingle schema).
BENCH_HEX = "0"
CONTAMINATION_THRESHOLD = 0.5


def benchmark_contamination(docs: DataFrame) -> DataFrame:
    """ct1: shingle-overlap decontamination check.

    Every candidate (non-benchmark) document is scored by the fraction
    of its distinct word-3-gram shingle hashes that also occur anywhere
    in the benchmark set; ``contaminated`` flags docs over the
    threshold.

    Scale shape: shingle arrays are materialized once and exploded
    (Generate fuses its child projection — see PERFORMANCE.md); the
    benchmark shingle set is DISTINCT and bounded by the benchmark
    corpus size (eval sets are millions of shingles, not billions), so
    the overlap join is an AQE-broadcast-able equi-join on the hash;
    the per-doc rollup is one partially-aggregated shuffle on doc_id.
    """
    arrays = (
        docs.select(
            "doc_id",
            (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == BENCH_HEX).alias(
                "is_bench"
            ),
            F.split("text", " ").alias("words"),
        )
        .select(
            "doc_id",
            "is_bench",
            F.expr(H.spark_shingle_hashes_from_words()).alias("shingles"),
        )
        .localCheckpoint(eager=False)
    )
    bench = (
        arrays.filter(F.col("is_bench"))
        .select(F.explode("shingles").alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = arrays.filter(~F.col("is_bench")).select("doc_id", F.explode("shingles").alias("h"))
    overlap_frac = F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")
    return (
        cand.join(bench, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(overlap_frac, 6).alias("overlap_frac"),
            (overlap_frac >= CONTAMINATION_THRESHOLD).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- ct2 pii scrub

EMAIL_PAT = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
IPV4_PAT = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
# Policy blocklist (whole words). The synthetic corpus has no real PII,
# so the blocklist terms exercise the match/redact path end-to-end.
BLOCKED_TERMS = ("customer", "merge")
BLOCKED_PAT = "\\b(" + "|".join(BLOCKED_TERMS) + ")\\b"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """ct2: per-source PII / blocked-term accounting.

    Counts pattern hits (emails, IPv4 addresses, policy blocklist) and
    sizes the redaction (characters that ``regexp_replace`` would
    remove). Pure map-side regex expressions + one tiny per-source
    rollup — the shape is a full-scan-once pass regardless of corpus
    size, which is exactly what a compliance sweep must be at 100 TB.
    """
    # patterns go in as Column literals, NOT interpolated into F.expr —
    # Spark SQL string literals process backslash escapes ('\b' would
    # become a backspace character before the regex engine sees it)
    n_email = F.size(F.regexp_extract_all("text", F.lit(EMAIL_PAT), F.lit(0)))
    n_ip = F.size(F.regexp_extract_all("text", F.lit(IPV4_PAT), F.lit(0)))
    n_blocked = F.size(F.regexp_extract_all("text", F.lit(BLOCKED_PAT), F.lit(0)))
    redacted = F.length("text") - F.length(F.regexp_replace("text", BLOCKED_PAT, ""))
    per_doc = docs.select(
        "source",
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_blocked.alias("n_blocked"),
        redacted.alias("redacted_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("n_email") > 0).cast("long")).cast("long").alias("docs_with_email"),
            F.sum((F.col("n_ip") > 0).cast("long")).cast("long").alias("docs_with_ip"),
            F.sum((F.col("n_blocked") > 0).cast("long")).cast("long").alias("docs_with_blocked"),
            F.sum("n_blocked").cast("long").alias("total_blocked_hits"),
            F.sum("redacted_chars").cast("long").alias("total_redacted_chars"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------- ct3 repetition stats

TOP_WORD_FRAC_MAX = 0.12
DISTINCT_BIGRAM_FRAC_MIN = 0.8


def repetition_stats(docs: DataFrame) -> DataFrame:
    """ct3: Gopher-style repetition signals per document.

    Two signals: the fraction of tokens that are the single most
    frequent token (degenerate repetition), and the fraction of word
    bigrams that are distinct (copy-paste boilerplate). ``repetitive``
    flags documents failing either bound.

    Scale shape: two explode→aggregate passes, each with map-side
    partial aggregation; both shuffles are keyed by (doc_id[, gram]) —
    high-cardinality uniform keys, no skew. No pairwise work: this is
    the O(corpus) filter that runs BEFORE the O(pairs) dedup operators.
    """
    words = docs.select("doc_id", F.split("text", " ").alias("words")).localCheckpoint(
        eager=False
    )
    tok = words.select("doc_id", F.explode("words").alias("w"))
    top_word = (
        tok.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.max("c").cast("long").alias("top_word_count"),
        )
    )
    bigram_expr = (
        "case when size(words) < 2 then cast(array() as array<string>) else "
        "transform(sequence(1, size(words) - 1), "
        "i -> array_join(slice(words, i, 2), ' ')) end"
    )
    bigrams = words.select("doc_id", F.explode(F.expr(bigram_expr)).alias("g"))
    bg = bigrams.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.countDistinct("g").cast("long").alias("n_distinct_bigrams"),
    )
    top_frac = F.col("top_word_count").cast("double") / F.col("n_tokens").cast("double")
    distinct_frac = F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams").cast("double")
    return (
        top_word.join(bg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "top_word_count",
            F.round(top_frac, 6).alias("top_word_frac"),
            "n_bigrams",
            "n_distinct_bigrams",
            F.round(distinct_frac, 6).alias("distinct_bigram_frac"),
            ((top_frac > TOP_WORD_FRAC_MAX) | (distinct_frac < DISTINCT_BIGRAM_FRAC_MIN)).alias(
                "repetitive"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------- ch1 token chunking

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def token_chunking(
    docs: DataFrame, chunk_size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """ch1: overlapping token-window chunking.

    Splits every document into ``chunk_size``-token windows starting at
    0, stride, 2*stride, … — the standard layout pass for embedding /
    retrieval corpora where documents exceed the model window. Emits
    one row per chunk with its token offsets and an md5 content hash
    (the downstream join key for chunk-level dedup).

    Scale shape: entirely map-side — one projection computes the word
    array, one Generate explodes the start offsets (array materialized
    first; Generate re-evaluates a fused child expression per output
    row), one projection slices and hashes. No shuffle at all until the
    final presentation sort.
    """
    starts_expr = f"sequence(0, greatest(size(words) - 1, 0), {stride})"
    chunks = (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .withColumn("starts", F.expr(starts_expr))
        .localCheckpoint(eager=False)
        .select("doc_id", "words", F.posexplode("starts").alias("chunk_idx", "start_token"))
        .withColumn("chunk", F.expr(f"slice(words, start_token + 1, {chunk_size})"))
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_token").cast("long").alias("start_token"),
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


# ------------------------------------------------------ mx1 mixture resample

MIX_SALT = "mix"


def mixture_rate_expr() -> F.Column:
    """Target keep-rate per source: a pure function of the source name
    (numeric suffix mod 4 → 0.25 / 0.50 / 0.75 / 1.00), so both engines
    derive identical rates with no side-channel config."""
    suffix = F.substring(F.col("source"), 4, 10).cast("int")
    return ((suffix % 4 + 1).cast("double") / F.lit(4.0)).alias("target_rate")


def mixture_resample(docs: DataFrame) -> DataFrame:
    """mx1: deterministic mixture resampling accounting.

    Downsamples each source to its target rate by thresholding the
    first 4 hex digits of ``md5(doc_id:source)`` against
    ``rate * 65536`` — content-stable (a doc's fate never changes
    across runs or retries) and unbiased (md5 is uniform). Emits the
    per-source before/after table a pipeline reviews to confirm the
    achieved mixture.

    Scale shape: map-side hash + filter, one tiny per-source rollup.
    The sampled subset itself is ``docs.filter(keep_expr)`` — this
    operator materializes the accounting view of that filter.
    """
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(MIX_SALT), "source")), 1, 4),
        16,
        10,
    ).cast("long")
    tagged = docs.select(
        "source",
        mixture_rate_expr(),
        (bucket < (mixture_rate_expr() * 65536).cast("long")).alias("keep"),
    )
    return (
        tagged.groupBy("source", "target_rate")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.round(
                F.sum(F.col("keep").cast("long")).cast("double") / F.count("*").cast("double"), 6
            ).alias("achieved_rate"),
        )
        .orderBy("source")
    )


BOILERPLATE_N = 5
BOILERPLATE_TOP_K = 20


def boilerplate_ngrams(
    docs: DataFrame, n: int = BOILERPLATE_N, k: int = BOILERPLATE_TOP_K
) -> DataFrame:
    """ct4: boilerplate mining — the corpus-wide most-repeated word
    n-grams ranked by document frequency, the table a curation pass
    reads to build its template/boilerplate strip list (headers,
    footers, license blocks repeat verbatim across millions of docs).

    Shape: n-gram generation is a map-side transform over the token
    array (a Generate, no shuffle); one hash agg keyed by gram computes
    occurrences + doc frequency with map-side partials; top-k is
    TakeOrderedAndProject. The gram key space is bounded by the corpus,
    and skew is impossible by construction — each gram's partial rows
    collapse per mapper before the shuffle.
    """
    toks = F.split("text", " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select("doc_id", F.explode(grams).alias("gram"))
    return (
        exploded.groupBy("gram")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("doc_freq"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("n_occurrences"), "gram")
        .limit(k)
    )


# ------------------------------------------- ct5 quality rank filter

KEEP_FRACTION = 0.75
# pp1/st7's quality gate: keep docs with t2 composite >= this (the
# same default threshold t2's low_quality flag uses)
QUALITY_THRESHOLD = 0.5


def quality_rank_filter(docs: DataFrame, keep_fraction: float = KEEP_FRACTION) -> DataFrame:
    """ct5: per-source quality thresholding by RANK, not by value — keep
    the top ``keep_fraction`` of each source's documents by composite
    quality score (the same signal t2 computes), and report the
    per-source cutoff the filter induced.

    Rank-based thresholding is the robust form: a fixed score cutoff
    drops whole sources whose score distribution sits low (transcripts,
    OCR), while a per-source rank keeps every source represented at its
    best. Ranking on the ROUNDED score with doc_id tie-breaks makes the
    kept set integer-deterministic — no knife-edge float comparisons
    between engines (a value cutoff on an interpolated percentile can
    flip membership on 1-ulp differences).

    Scale shape: score is map-side codegen (t2's expressions); the two
    windows (count + row_number) share one shuffle on ``source``.
    Source is low-cardinality/high-volume, so at 100 TB the window sort
    within a giant source is the cost — swap to approx_percentile
    value-cutoff (t6a-style) if exact rank semantics aren't required.
    """
    from pyspark.sql.window import Window

    from file_indexer_spark.operators.text import quality_composite, quality_signal_columns

    sig = quality_signal_columns()
    d = docs.select(
        "doc_id",
        "source",
        sig["n_tokens"].alias("n_tokens"),
        sig["n_distinct_tokens"].alias("n_distinct_tokens"),
        sig["n_stopwords"].alias("n_stopwords"),
    )
    score = F.round(quality_composite(), 6)
    scored = d.select("doc_id", "source", score.alias("quality_score"))
    w = Window.partitionBy("source")
    wr = w.orderBy(F.desc("quality_score"), "doc_id")
    ranked = scored.select(
        "source",
        "quality_score",
        F.count("*").over(w).alias("n_docs"),
        F.row_number().over(wr).alias("rn"),
    )
    kept = ranked.filter(
        F.col("rn") <= F.ceil(F.col("n_docs").cast("double") * keep_fraction).cast("long")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_kept"),
            F.min("quality_score").alias("cutoff_score"),
        )
        .orderBy("source")
    )


# ------------------------------------------- mx2 temperature mixture

MIX_ALPHA = 0.5  # temperature exponent: weight ∝ n^alpha
MIX_BUDGET = 10_000  # documents in the hypothetical training mix


def temperature_mixture(docs: DataFrame, budget: int = MIX_BUDGET) -> DataFrame:
    """mx2: temperature-based mixture weighting — per-source sampling
    weights proportional to ``n_docs ** alpha`` (alpha = 0.5), the
    standard multilingual/multi-source rebalancing (mT5-style alpha
    sampling): big sources are dampened, tail sources up-weighted
    relative to their natural share.

    Determinism across engines: sqrt is IEEE-correctly-rounded in both
    Spark and DuckDB; the normalizing SUM runs over DECIMAL(20,9)
    (exact, order-independent — a double sum's value depends on
    partial-aggregation order), and the final weight division happens
    once per source on doubles, rounded to 6 places.

    Scale shape: one tiny per-source agg, one window over the O(sources)
    rollup — nothing corpus-sized past the first aggregation.
    """
    from pyspark.sql.window import Window

    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    w_dec = F.round(F.sqrt(F.col("n_docs").cast("double")), 9).cast("decimal(20,9)")
    tagged = counts.select("source", "n_docs", w_dec.alias("w"))
    tot = Window.partitionBy()
    weight = F.round(
        F.col("w").cast("double") / F.sum("w").over(tot).cast("double"), 6
    )
    share = F.round(
        F.col("n_docs").cast("double") / F.sum("n_docs").over(tot).cast("double"), 6
    )
    return (
        tagged.select(
            "source",
            "n_docs",
            share.alias("base_share"),
            weight.alias("temp_weight"),
            F.floor(weight * budget).cast("long").alias("target_docs"),
        )
        .orderBy("source")
    )


# ------------------------------------------- pp1 curation pipeline

def curation_pipeline(docs: DataFrame) -> DataFrame:
    """pp1: the end-to-end curation funnel as ONE composed query —
    per-source accounting of a real training-data pass:

      raw → exact dedup (md5 keeper rule, dd1's semantics)
          → quality filter (t2's composite score ≥ 0.5)
          → decontamination (drop benchmark docs and ct1-contaminated
            candidates)

    with final token totals and retention. This is the table a data
    lead reviews before a training run; each stage reuses the exact
    deterministic rule its standalone operator (dd1/t2/ct1) is gated
    on, so the funnel is fully oracle-checkable.

    Scale shape: one md5 window for the keeper rule (shuffle on the
    content hash), map-side quality signals, ct1's bounded-benchmark
    overlap join + per-doc rollup joined back on doc_id, then a tiny
    per-source rollup. No stage materializes an intermediate corpus.
    """
    from pyspark.sql.window import Window

    from file_indexer_spark.operators.text import quality_composite, quality_signal_columns

    sig = quality_signal_columns()
    base = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("content_hash"),
        sig["n_tokens"].alias("n_tokens"),
        sig["n_distinct_tokens"].alias("n_distinct_tokens"),
        sig["n_stopwords"].alias("n_stopwords"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == BENCH_HEX).alias("is_bench"),
    )
    keeper = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("content_hash"))
    quality_ok = quality_composite() >= F.lit(QUALITY_THRESHOLD)

    contaminated = benchmark_contamination(docs).select("doc_id", "contaminated")
    staged = (
        base.withColumn("keep_dedup", keeper.cast("long"))
        .join(contaminated, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            "keep_dedup",
            ((F.col("keep_dedup") == 1) & quality_ok).cast("long").alias("keep_quality"),
            (
                (F.col("keep_dedup") == 1)
                & quality_ok
                & ~F.col("is_bench")
                & ~F.coalesce("contaminated", F.lit(False))
            ).cast("long").alias("keep_final"),
        )
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.sum("keep_dedup").cast("long").alias("n_after_dedup"),
            F.sum("keep_quality").cast("long").alias("n_after_quality"),
            F.sum("keep_final").cast("long").alias("n_final"),
            F.sum(F.col("n_tokens") * F.col("keep_final")).cast("long").alias("tokens_final"),
            F.round(
                F.sum("keep_final").cast("double") / F.count("*").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("source")
    )


def neardup_split_pipeline(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """pp2: the NEAR-DUP-aware training-prep pass as one composed
    query — per-split accounting of the modern pipeline:

      raw → near-dup clusters (dd3→dd7's components)
          → quality-keeper selection (dd15's rule: keep the highest-
            t2-quality member per cluster; singletons keep themselves)
          → leakage-safe split (sp10's rule: md5 of the CLUSTER label,
            so near-dup groups never straddle train/test)

    with per-split doc/token totals before and after keeper selection
    and the retention ratio. pp1 is the classic exact-dedup funnel;
    pp2 is the near-dup upgrade a modern curation run performs — each
    stage reuses the exact deterministic rule its standalone operator
    (dd7/dd15/sp10) is gated on, so the pipeline is fully
    oracle-checkable end to end.

    Scale shape: everything upstream is dd3/dd7's bucketed machinery;
    the pipeline itself adds ONE cluster_id window (keeper rank — the
    split tag shares the same shuffled key) and a 3-row rollup. No
    stage materializes an intermediate corpus.
    """
    from pyspark.sql.window import Window

    from file_indexer_spark.operators.sampling import split_expr
    from file_indexer_spark.operators.text import (
        quality_composite,
        quality_signal_columns,
    )

    sig = quality_signal_columns()
    scored = docs.select(
        "doc_id",
        sig["n_tokens"].alias("n_tokens"),
        sig["n_distinct_tokens"].alias("n_distinct_tokens"),
        sig["n_stopwords"].alias("n_stopwords"),
    ).select("doc_id", "n_tokens", quality_composite().alias("q"))
    joined = clusters.select("doc_id", "cluster_id").join(scored, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("q"), "doc_id")
    flagged = joined.select(
        "cluster_id",
        "n_tokens",
        (F.row_number().over(w) == 1).cast("long").alias("is_kept"),
    ).withColumn("split", split_expr(F.col("cluster_id")))
    return (
        flagged.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs_raw"),
            F.sum("is_kept").cast("long").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("tokens_raw"),
            F.sum(F.col("is_kept") * F.col("n_tokens")).cast("long").alias("tokens_kept"),
        )
        .withColumn(
            "doc_retention",
            F.round(F.col("n_kept") / F.col("n_docs_raw"), 6),
        )
        .orderBy("split")
    )


# ct6: distribution-drift monitor. Bin width / cap chosen for the
# fixture's 44..577 n_chars range; the shape is range-free (the cap
# bin absorbs the tail).
DRIFT_BIN_CHARS = 50
DRIFT_MAX_BIN = 11
DRIFT_BATCH_MOD = 10
DRIFT_BATCH_REM = 7  # the dd12 "new batch" slice convention


def distribution_drift(docs: DataFrame) -> DataFrame:
    """ct6: two-sample distribution drift between an incoming batch
    (the dd12 ``doc_id % 10 = 7`` slice) and the base corpus, over the
    doc-length histogram — the monitor a 100 TB ingestion pipeline
    runs per crawl snapshot BEFORE letting a batch into training
    (sudden length-profile shifts flag scraper regressions and
    boilerplate floods).

    Two drift measures per bin, one exact and one conventional:
      * ``l1_num_total`` — the L1 histogram distance as an EXACT
        integer: sum |a*B - b*A| over bins (the common denominator
        A*B cleared), so the headline gate is integer-deterministic;
      * ``psi_bin`` / ``psi_total`` — the Population Stability Index
        with +0.5 per-bin smoothing, doubles computed by the identical
        expression text on both engines and rounded.

    Scale shape: one map-side bin expression, one (is_batch, bin) hash
    aggregate with map-side combine (output = 2 x #bins rows), then
    arithmetic over the tiny histogram — the corpus is touched exactly
    once, no joins against it.
    """
    return drift_from_histogram(drift_histogram(docs))


def drift_bin_columns() -> dict:
    """The (bin, is_batch) projection ct6 and its streaming rendition
    (st16) share — THE single binning definition, the _QUALITY_CTE
    pattern."""
    return {
        "bin": F.expr(
            f"CAST(LEAST(n_chars DIV {DRIFT_BIN_CHARS}, {DRIFT_MAX_BIN}) AS INT)"
        ),
        "is_batch": F.expr(f"doc_id % {DRIFT_BATCH_MOD} = {DRIFT_BATCH_REM}"),
    }


def drift_histogram(docs: DataFrame) -> DataFrame:
    """ct6's aggregation front: one (bin) hash aggregate with map-side
    combine over the binned projection — output 2 x #bins counters."""
    cols = drift_bin_columns()
    binned = docs.select(cols["bin"].alias("bin"), cols["is_batch"].alias("is_batch"))
    return binned.groupBy("bin").agg(
        F.sum(F.when(~F.col("is_batch"), 1).otherwise(0))
        .cast("long")
        .alias("base_n"),
        F.sum(F.when(F.col("is_batch"), 1).otherwise(0))
        .cast("long")
        .alias("batch_n"),
    )


def drift_from_histogram(hist: DataFrame) -> DataFrame:
    """ct6's arithmetic back half over a (bin, base_n, batch_n)
    histogram — shared verbatim by the streaming rendition, whose
    histogram comes from stateful update-mode counts instead of one
    batch aggregate."""
    nbins = DRIFT_MAX_BIN + 1
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    totals = hist.select(
        "bin",
        "base_n",
        "batch_n",
        F.sum("base_n").over(w).cast("long").alias("base_total"),
        F.sum("batch_n").over(w).cast("long").alias("batch_total"),
    )
    psi_bin = (
        f"((CAST(base_n AS DOUBLE) + 0.5) / (CAST(base_total AS DOUBLE)"
        f" + {0.5 * nbins})"
        f" - (CAST(batch_n AS DOUBLE) + 0.5) / (CAST(batch_total AS DOUBLE)"
        f" + {0.5 * nbins}))"
        f" * ln(((CAST(base_n AS DOUBLE) + 0.5) / (CAST(base_total AS DOUBLE)"
        f" + {0.5 * nbins}))"
        f" / ((CAST(batch_n AS DOUBLE) + 0.5) / (CAST(batch_total AS DOUBLE)"
        f" + {0.5 * nbins})))"
    )
    enriched = totals.select(
        "bin",
        "base_n",
        "batch_n",
        # Each cross-product scales with corpus size squared (counts past
        # ~3e9 rows per side push a*B toward BIGINT max); non-ANSI Spark
        # would wrap silently while the DuckDB oracle raises.  t14's
        # discipline: try_multiply + loud raise_error on overflow.
        F.expr(
            "ABS("
            "ifnull(try_multiply(base_n, batch_total), CAST(raise_error("
            "'ct6: histogram cross-product overflow past BIGINT headroom; "
            "rescale counts before drift') AS BIGINT))"
            " - ifnull(try_multiply(batch_n, base_total), CAST(raise_error("
            "'ct6: histogram cross-product overflow past BIGINT headroom; "
            "rescale counts before drift') AS BIGINT))"
            ")"
        )
        .cast("long")
        .alias("l1_num"),
        F.expr(psi_bin).alias("psi_raw"),
    )
    return enriched.select(
        "bin",
        "base_n",
        "batch_n",
        "l1_num",
        F.round("psi_raw", 6).alias("psi_bin"),
        F.sum("l1_num").over(w).cast("long").alias("l1_num_total"),
        F.round(F.sum("psi_raw").over(w), 6).alias("psi_total"),
    ).orderBy("bin")


# mx3: annealing schedule — alpha per epoch, restricted to quarter
# powers so every weight is a composition of IEEE-correctly-rounded
# sqrt calls (n, sqrt(n)*sqrt(sqrt(n)), sqrt(n), sqrt(sqrt(n))) and the
# schedule stays bit-deterministic across engines (pow() would not be).
ANNEAL_ALPHAS = ((0, 1.0), (1, 0.75), (2, 0.5), (3, 0.25))


def annealed_mixture(docs: DataFrame, budget: int = MIX_BUDGET) -> DataFrame:
    """mx3: curriculum mixture ANNEALING — mx2's temperature weighting
    extended over a training schedule: epoch 0 samples sources at
    their natural share (alpha = 1), later epochs anneal toward strong
    rebalancing (alpha = 0.25), the standard curriculum for
    multi-source pretraining (start on-distribution, end
    diversity-heavy). Output is the full epoch x source sampling plan
    a dataloader consumes.

    Determinism: mx2's discipline per epoch — weights snap to
    DECIMAL(20,9) before the normalizing SUM (exact,
    order-independent), one double division per row, rounded 6.

    Scale shape: one per-source aggregate over the corpus; everything
    after is O(sources x epochs) — window per epoch partition over a
    tiny frame.
    """
    from pyspark.sql.window import Window

    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    n = F.col("n_docs").cast("double")
    raws = {
        0: n,
        1: F.sqrt(n) * F.sqrt(F.sqrt(n)),
        2: F.sqrt(n),
        3: F.sqrt(F.sqrt(n)),
    }
    tagged = counts.select(
        "source",
        "n_docs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e).cast("int").alias("epoch"),
                        F.lit(a).alias("alpha"),
                        F.round(raws[e], 9).cast("decimal(20,9)").alias("w"),
                    )
                    for e, a in ANNEAL_ALPHAS
                ]
            )
        ).alias("x"),
    ).select("source", "n_docs", "x.epoch", "x.alpha", "x.w")
    per_epoch = Window.partitionBy("epoch")
    weight = F.round(
        F.col("w").cast("double") / F.sum("w").over(per_epoch).cast("double"), 6
    )
    return (
        tagged.select(
            "epoch",
            "alpha",
            "source",
            "n_docs",
            weight.alias("temp_weight"),
            F.floor(weight * budget).cast("long").alias("target_docs"),
        )
        .orderBy("epoch", "source")
    )


# ------------------------------------------------- ct7 contamination spans


def contamination_spans(docs: DataFrame, n: int = H.SHINGLE_N) -> DataFrame:
    """ct7: benchmark-contamination EXTENTS — for every candidate
    (non-benchmark) document, the merged token intervals covered by
    word n-grams that also occur anywhere in the benchmark set.

    ct1 makes the drop-whole-doc decision (overlap FRACTION over a
    threshold); ct7 emits the surgical alternative — the exact token
    ranges a strip pass would excise, which is what GPT-3-style
    decontamination actually does when the collision is a quoted
    benchmark question inside an otherwise-clean document (dropping a
    10k-token page over a 13-token collision wastes the page).  The
    span list is dd9's gaps-and-islands machinery pointed at an
    EXTERNAL gram set instead of the corpus's own repeats.

    Benchmark membership and the gram definition are ct1's verbatim
    (first hex char of md5(doc_id) == BENCH_HEX; hash60 word n-grams
    with the whole-doc fallback for sub-gram-width docs), so the two
    operators agree on what "the eval set" is.

    Scale shape for 100 TB: the benchmark gram set is DISTINCT and
    bounded by the eval corpus (millions of grams, not billions) — it
    broadcasts, so marking is a map-side semi-join over the exploded
    candidate gram stream (one row per gram occurrence, keeping its
    token offset; Generate fuses the projection).  The only shuffle is
    the per-doc gaps-and-islands window, linear in MATCHED gram
    occurrences — contamination is rare by construction, so the window
    input is a small fraction of the corpus.
    """
    is_bench = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == BENCH_HEX
    )
    shingle = f"array_join(slice(words, i, {n}), ' ')"
    grams = (
        docs.filter(~is_bench)
        .select("doc_id", F.split("text", " ").alias("words"))
        .select(
            "doc_id",
            F.size("words").alias("n_tokens"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(size(words) - {n - 1}, 1)), "
                    f"i -> {H.spark_hash60(shingle)})"
                )
            ).alias("pos0", "h"),
        )
        .select("doc_id", "n_tokens", (F.col("pos0") + 1).alias("p"), "h")
    )
    bench = (
        docs.filter(is_bench)
        .select(F.split("text", " ").alias("words"))
        .select(
            F.explode(F.expr(H.spark_shingle_hashes_from_words(n=n))).alias("h")
        )
        .distinct()
    )
    marked = grams.join(F.broadcast(bench), "h", "left_semi").select(
        "doc_id", "n_tokens", "p"
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    flagged = marked.withColumn(
        "new_island",
        (F.col("p") > F.coalesce(F.lag("p").over(wdoc), F.lit(-10)) + n).cast(
            "long"
        ),
    ).withColumn(
        "island",
        F.sum("new_island").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            # clamp to the doc's token count (whole-doc fallback grams
            # of sub-gram-width docs have raw end p + n - 1 past EOF)
            F.least(F.max("p") + (n - 1), F.max("n_tokens"))
            .cast("long")
            .alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .orderBy("doc_id", "span_start")
    )
