"""Deterministic sampling/splitting for training-data pipelines.

Two primitives a 100 TB corpus pipeline needs that plain SQL engines
usually hand-roll:

  * hash_split — content-stable train/val/test assignment keyed on
    ``md5(doc_id)``: a document keeps its split across re-runs, corpus
    grows, and cluster sizes, because the assignment is a pure function
    of the row key (no RNG, no ``rand()`` non-determinism across
    retries/speculative tasks — Spark task retries re-evaluate
    ``rand()`` and can emit a different sample).
  * source_cap_sample — cap each source at N docs, keeping a
    deterministic hash-ordered prefix: the standard guard against a
    dominant crawl source swamping the mixture.

Both are pure Catalyst expression programs: the hash is JVM-side
``md5``, the split is a string-range comparison on the hex digest
(identical in any engine that md5s the same bytes — the DuckDB oracles
replicate it verbatim), and the per-source cap is one window over
``source`` (high-cardinality-safe: partitions are per-source, skew
bounded by the biggest source's row count; salt the window key if one
source is the whole corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# First-byte hex ranges of md5(doc_id): [00,10) test, [10,20) val,
# [20,ff] train — 6.25 % / 6.25 % / 87.5 %.
TEST_UPPER = "10"
VAL_UPPER = "20"


def _digest(key: F.Column) -> F.Column:
    return F.md5(key.cast("string"))


def split_expr(key: F.Column) -> F.Column:
    """train/val/test from the first hex byte of md5(key)."""
    b = F.substring(_digest(key), 1, 2)
    return (
        F.when(b < TEST_UPPER, F.lit("test"))
        .when(b < VAL_UPPER, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def hash_split(docs: DataFrame) -> DataFrame:
    """Per-split corpus accounting: doc counts, token totals, source
    spread — the sanity table printed before any training run."""
    tagged = docs.select(
        split_expr(F.col("doc_id")).alias("split"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        "source",
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("split")
    )


def source_cap_sample(docs: DataFrame, cap: int) -> DataFrame:
    """Keep at most ``cap`` docs per source — the deterministic
    hash-ordered prefix (md5 order is a stable pseudo-random shuffle,
    so the kept prefix is an unbiased sample of the source)."""
    w = Window.partitionBy("source").orderBy(_digest(F.col("doc_id")), "doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "source")
    )


PACK_BUDGET = 2048
N_PACKERS = 16  # first hex char of md5(doc_id) → 16 independent token streams


def sequence_pack(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Concat-and-chunk packing plan: the GPT-style pretraining layout
    where each packer's documents are concatenated into one token
    stream and cut into fixed-``budget`` training sequences (documents
    straddle cuts; nothing is padded away).

    Scale shape: docs are sharded to ``N_PACKERS`` independent streams
    by a content-stable hash (same md5 trick as ``hash_split``, so the
    plan is retry-deterministic and reproducible across runs), and the
    only shuffle is one window cumsum per packer. At 100 TB raise
    N_PACKERS to O(cores) — packer streams never interact, so the
    window's per-partition state is a running sum, not a buffer.

    Emits one row per document: its packer, the first/last sequence it
    lands in, and its offset inside the first one — the full physical
    layout, from which a writer stage can emit the actual token shards.
    """
    w = (
        Window.partitionBy("packer")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        "doc_id",
        F.substring(_digest(F.col("doc_id")), 1, 1).alias("packer"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return (
        d.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "packer",
            "n_tokens",
            (F.col("cum") - F.col("n_tokens")).alias("start"),
            F.col("cum").alias("end"),
        )
        .select(
            "doc_id",
            "packer",
            "n_tokens",
            F.floor(F.col("start") / budget).cast("long").alias("seq_first"),
            F.floor((F.col("end") - 1) / budget).cast("long").alias("seq_last"),
            (F.col("start") % budget).cast("long").alias("seq_offset"),
        )
    )


STRATUM_TARGET = 60  # expected docs kept per stratum (lang)
STRAT_SALT = "strat"


def stratified_sample(docs: DataFrame, target_per_stratum: int = STRATUM_TARGET) -> DataFrame:
    """sp5: rate-based stratified sampling accounting, stratified by
    ``lang`` — the balancing pass that keeps ~``target_per_stratum``
    docs from every language regardless of how skewed the corpus is
    (English is usually 100x the tail languages; an unstratified sample
    reproduces the skew).

    Per-stratum keep rate = min(1, target / n_stratum); a doc is kept
    iff the first 4 hex digits of ``md5(doc_id:strat:lang)`` fall under
    ``floor(rate * 65536)`` — the same content-stable thresholding as
    mx1 (no ``rand()``: task retries and speculative execution replay
    the identical decision). Expected kept count is target ± binomial
    noise; the exact-cap alternative is sp2's per-key window.

    Scale shape: one tiny per-lang count agg (broadcast back onto the
    scan — AQE chooses broadcast since the stratum table is O(langs)
    rows), then a map-side hash + filter. No window over the corpus, so
    a 10^11-doc stratum costs the same per row as a 10^3-doc one.
    """
    counts = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    rate = F.least(F.lit(1.0), F.lit(float(target_per_stratum)) / F.col("n_docs").cast("double"))
    strata = counts.select("lang", "n_docs", rate.alias("rate"))
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(STRAT_SALT), "lang")),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    tagged = (
        docs.select("doc_id", "lang")
        .join(strata, "lang")
        .select(
            "lang",
            "n_docs",
            "rate",
            # explicit floor: Spark's double→long cast truncates but
            # DuckDB's rounds, so the threshold must be floored before
            # any cast for the two engines to agree.
            (bucket < F.floor(F.col("rate") * 65536).cast("long")).alias("keep"),
        )
    )
    return (
        tagged.groupBy("lang", "n_docs", "rate")
        .agg(
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.round(
                F.sum(F.col("keep").cast("long")).cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("achieved_rate"),
        )
        .select(
            "lang",
            "n_docs",
            F.round("rate", 6).alias("target_rate"),
            "n_kept",
            "achieved_rate",
        )
        .orderBy("lang")
    )


N_SHARDS = 16


def shard_assignment(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """sp4: content-stable export sharding — the layout step that turns
    a curated corpus into N balanced output shards for training-job
    consumption.

    shard = first 8 hex digits of md5(doc_id) mod N: a pure function of
    the row key, so shard membership survives re-runs, retries, and
    corpus growth (only new docs land anywhere new), and any engine
    that md5s the same bytes agrees. Per-shard accounting (docs,
    tokens, source spread) is the balance report: uniform to ~1/sqrt
    of shard size by the hash. Zero shuffles before the O(shards) agg;
    the physical write would be partitionBy(shard) with the same
    expression.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).alias("shard")
    tagged = docs.select(
        shard,
        F.size(F.split("text", " ")).alias("n_tokens"),
        "source",
    )
    return (
        tagged.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("shard")
    )


def export_sharded(docs: DataFrame, out_dir: str, n_shards: int = N_SHARDS) -> None:
    """Materialize sp4's layout physically: write the corpus as
    parquet partitioned by the content-stable shard key — one
    ``shard=K/`` directory per shard, the on-disk layout a training job
    consumes shard-by-shard.

    ``partitionBy`` routes rows to their directory during the write
    (no pre-shuffle needed — the key is a map-side expression), and
    because the key is a pure function of doc_id, re-running the export
    rewrites byte-identical shard memberships. At 100 TB add
    ``maxRecordsPerFile`` to bound individual file sizes inside each
    shard directory.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).alias("shard")
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars", shard)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )


EPOCH_SHARDS = 16


def epoch_shuffle(docs: DataFrame, seed: int = 0, n_shards: int = EPOCH_SHARDS) -> DataFrame:
    """sp6: deterministic global training-order shuffle for one epoch.

    Training runs must visit the corpus in a pseudo-random order that
    is (a) different per epoch, (b) identical across re-runs/retries,
    and (c) computable without a single-partition global sort. The
    standard scalable shape: a content-stable order key
    ``md5(seed:doc_id)`` routes each doc to one of ``n_shards``
    epoch shards (consumed in shard order), and within a shard the
    key's lexicographic order is the read order — so the "sort" is
    n_shards independent window ranks, never one global row_number.
    Changing ``seed`` reshuffles everything; same seed replays the
    exact order (pre-emptions and task retries land identically).

    Output: (doc_id, epoch_shard, shard_pos, n_tokens) ordered by
    (epoch_shard, shard_pos) — the epoch's full read plan.
    """
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).alias("epoch_shard")
    w = Window.partitionBy("epoch_shard").orderBy("order_key", "doc_id")
    return (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            key.alias("order_key"),
            shard,
        )
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "epoch_shard", "shard_pos", "n_tokens")
        .orderBy("epoch_shard", "shard_pos")
    )


ZORDER_BITS = 8       # bits per dimension in the Morton interleave
ZORDER_SHARDS = 4096  # top Morton-prefix shards (z >> 4: 16-value tiles)


def zorder_value(x: F.Column, y: F.Column, bits: int = ZORDER_BITS) -> F.Column:
    """Morton (Z-order) interleave of two ``bits``-wide non-negative
    keys: bit i of x lands at position 2i, bit i of y at 2i+1. A pure
    bit expression (shifts/ands/ors — whole-stage codegen, no UDF),
    identical in any engine with integer bit ops."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(events: DataFrame, bits: int = ZORDER_BITS, n_shards: int = ZORDER_SHARDS) -> DataFrame:
    """sp7: multi-dimensional data LAYOUT via a Z-order (Morton) curve
    over (user_id, event day) — the clustering step that makes parquet
    min/max pruning work for BOTH predicate dimensions at once.

    Why this matters at 100 TB: sorting by time alone gives every file
    the FULL user range (user predicates prune nothing); sorting by
    user gives every file the full time range. Writing in Morton order
    bounds each file to a square-ish (user, day) tile, so a scan with
    either — or both — predicates skips most files. The physical write
    is ``repartitionByRange(z).sortWithinPartitions(z)``; this
    operator computes the curve and the per-shard tile report that
    PROVES the locality (each Morton-prefix shard's user span and day
    span are both ~range/2^(prefix/2), not the full range — pinned in
    tests against a time-sorted layout).

    Determinism: shards are fixed-width Morton prefixes (z >> (2·bits
    − log2(n_shards)) — 4-bit tiles: ≤ 4 consecutive values per
    dimension), never sampled range boundaries, so the report is
    bit-identical across engines and runs, and shard granularity
    adapts to however much of the key grid the corpus occupies. Keys fold into ``bits``
    dimensions by masking (the layout only needs locality, not
    invertibility). One O(shards) aggregation; the curve itself is
    map-side codegen.
    """
    # shards are fixed-width Morton PREFIXES: n_shards must be a power
    # of two (and fit the 2*bits curve) or the prefix arithmetic is
    # silently wrong — and the registered sp7 oracle pins bits=8 /
    # n_shards=4096, so non-default calls are engine-only anyway.
    if n_shards <= 0 or (n_shards & (n_shards - 1)) != 0:
        raise ValueError(f"n_shards must be a power of two, got {n_shards}")
    if n_shards > (1 << (2 * bits)):
        raise ValueError(f"n_shards={n_shards} exceeds the {2 * bits}-bit curve")
    prefix_shift = 2 * bits - n_shards.bit_length() + 1
    mask = (1 << bits) - 1
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    x = F.col("user_id").bitwiseAND(F.lit(mask))
    y = day.cast("long").bitwiseAND(F.lit(mask))
    tagged = events.select(x.alias("xk"), y.alias("yk")).withColumn(
        "z", zorder_value(F.col("xk"), F.col("yk"), bits)
    )
    return (
        tagged.groupBy(F.shiftright(F.col("z"), prefix_shift).alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("xk").cast("long").alias("user_min"),
            F.max("xk").cast("long").alias("user_max"),
            F.min("yk").cast("long").alias("day_min"),
            F.max("yk").cast("long").alias("day_max"),
        )
        .orderBy("shard")
    )


# ------------------------------------------------------------- sp8
# fractional upsampling: per-source mixture weights materialized as
# actual row multiplicity. floor(w) guaranteed copies; the fractional
# remainder becomes one extra copy for a deterministic md5-selected
# subset of the source's docs (frac(w) of them in expectation, with
# the same content-stable hash contract as hash_split: a doc's copy
# count never changes across runs or engines).
REPEAT_SALT = "sp8"


def repeat_weight_expr() -> F.Column:
    """Per-source target weight: a pure function of the source name
    (the numeric suffix), standing in for a mixture config table —
    spans downsampling (w<1), pass-through (w=1) and fractional
    upsampling (w>1): w = 0.25 + (suffix mod 8) * 0.45 ∈ {0.25 … 3.4}."""
    idx = F.substring(F.col("source"), 4, 10).cast("long")
    return F.lit(0.25) + (idx % 8).cast("double") * F.lit(0.45)


def weighted_repeat(docs: DataFrame) -> DataFrame:
    """sp8: materialize a weighted mixture as physical row repeats
    (epoch construction for non-integer domain weights — the step
    after mx2 computes WHAT the mixture should be, this emits the
    actual training rows).

    ``n_copies = floor(w) + [md5_frac(doc_id) < frac(w)]`` — the md5
    threshold is the sp5 idiom (first 4 hex digits vs floor(frac *
    65536)), so the kept-extra set is integer-deterministic across
    engines and re-runs. The repeat itself is ``array_repeat`` +
    ``posexplode``: pure map-side generation, ZERO shuffles — each
    task inflates its own partition, which is exactly the shape that
    survives 100 TB (output volume is the corpus times the mean
    weight; no key ever concentrates).

    A doc whose source downsamples (w < 1, floor = 0) and whose hash
    misses the remainder threshold emits no rows — posexplode over an
    empty array drops it, no filter needed.
    """
    w = repeat_weight_expr()
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(REPEAT_SALT))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    frac_thresh = F.floor((w - F.floor(w)) * 65536).cast("long")
    n_copies = (F.floor(w) + F.when(bucket < frac_thresh, 1).otherwise(0)).cast("int")
    tagged = docs.select(
        "doc_id",
        "source",
        F.round(w, 6).alias("weight"),
        n_copies.alias("n_copies"),
    )
    return (
        tagged.select(
            "doc_id",
            "source",
            "weight",
            "n_copies",
            F.posexplode(F.expr("array_repeat(1, n_copies)")).alias("pos", "_one"),
        )
        .select(
            "doc_id",
            "source",
            "weight",
            "n_copies",
            (F.col("pos") + 1).cast("long").alias("copy"),
        )
        .orderBy("doc_id", "copy")
    )


# ------------------------------------------------------------- sp9
BUDGET_TOKENS = 16000  # global token budget for the selection gate


def budget_select(docs: DataFrame, budget: int = BUDGET_TOKENS) -> DataFrame:
    """sp9: EXACT take-while selection under a global token budget —
    "the best docs that fit in N training tokens": order by quality
    (t2's composite, milli-quantized) desc then doc_id, keep each doc
    whose inclusive running token total stays within the budget.

    The naive formulation is a global-order running sum — one window
    over the corpus in a single partition, the classic scale killer.
    The exact distributed decomposition:
      1. ONE shuffle rolls tokens up per quality value (O(distinct
         scores) rows);
      2. the running total over that rollup (a single-partition window
         over the metadata-sized rollup only — t10's discipline) splits
         quality groups into fully-kept (cum <= budget), fully-dropped
         (base >= budget), and the ONE boundary group;
      3. fully-kept docs pass via a broadcast semi-join — no ordering
         work at all; only the boundary group's docs run a doc-level
         cumsum, a window over that single bounded group.
    Finer score quantization shrinks the boundary group; the result is
    bit-identical to the naive global cumsum (the oracle computes
    exactly that).
    """
    from file_indexer_spark.operators.text import (
        quality_composite,
        quality_signal_columns,
    )

    sig = quality_signal_columns()
    per_doc = (
        docs.select(
            "doc_id",
            sig["n_tokens"].alias("n_tokens"),
            sig["n_distinct_tokens"].alias("n_distinct_tokens"),
            sig["n_stopwords"].alias("n_stopwords"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.floor(F.round(quality_composite(), 6) * 1000)
            .cast("long")
            .alias("q_milli"),
        )
    )
    grp = per_doc.groupBy("q_milli").agg(
        F.sum("n_tokens").cast("long").alias("grp_tokens")
    )
    w = Window.orderBy(F.desc("q_milli")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running = grp.withColumn("cum", F.sum("grp_tokens").over(w)).withColumn(
        "base", F.col("cum") - F.col("grp_tokens")
    )
    full_groups = running.filter(F.col("cum") <= budget).select("q_milli")
    boundary = running.filter(
        (F.col("base") < budget) & (F.col("cum") > budget)
    ).select("q_milli", "base")
    kept_full = per_doc.join(F.broadcast(full_groups), "q_milli", "left_semi")
    bw = Window.partitionBy("q_milli").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept_boundary = (
        per_doc.join(F.broadcast(boundary), "q_milli")
        .withColumn("prefix", F.col("base") + F.sum("n_tokens").over(bw))
        .filter(F.col("prefix") <= budget)
        .select("doc_id", "q_milli", "n_tokens")
    )
    return (
        kept_full.select("doc_id", "q_milli", "n_tokens")
        .unionByName(kept_boundary)
        .orderBy(F.desc("q_milli"), "doc_id")
    )


def leakage_safe_split(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """sp10: the LEAKAGE-SAFE train/val/test split — sp1's content-hash
    rule applied to the near-dup CLUSTER label instead of the doc_id,
    so every member of a near-dup cluster lands on the same side and
    no test document has a training-set near-copy by construction
    (dd16 measures the leakage the naive per-doc split admits).

    Same accounting schema as sp1 (drop-in replacement). Split shares
    stay ~6.25/6.25/87.5 in expectation: singleton docs keep their own
    id as the cluster label, and multi-doc clusters move as indivisible
    units (the test fraction's variance grows with the largest cluster,
    which is the unavoidable price of leak-freedom).

    Scale shape: one O(docs) equi-join against the assignment table
    (everything upstream is dd7's bucketed machinery); the tag is a
    map-side md5 of the label; the rollup shuffle carries 3 partials
    per task.
    """
    tagged = docs.join(clusters.select("doc_id", "cluster_id"), "doc_id").select(
        split_expr(F.col("cluster_id")).alias("split"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        "source",
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("split")
    )


def bin_packing(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """sp12: NO-STRADDLE sequence packing — next-fit bin packing of
    whole documents into fixed-``budget`` training sequences. sp3's
    concat-and-chunk lets documents straddle sequence cuts (maximum
    density, but cross-document attention contamination unless the
    trainer masks); sp12 is the other production layout: a document
    never spans two sequences, the residual tail of each bin is
    padding, and the doc→bin map is what the writer stage materializes.

    Why this is the Pandas tier and not a window: next-fit's bin
    boundary depends on a running fill that RESETS data-dependently —
    a sequential recurrence no fixed window frame expresses. Each
    packer's stream is scanned once inside an Arrow-batched
    applyInPandas; the oracle replicates the recurrence with a
    recursive CTE, so the gate stays bit-for-bit.

    Scale shape: one shuffle onto ``N_PACKERS`` content-stable hash
    shards (sp3's discipline — streams never interact; raise
    N_PACKERS to O(cores) at 100 TB), then a single partition-local
    sequential pass per packer; per-packer state is two integers.
    Docs order by doc_id within a packer (sp3's order), so the plan
    is retry-deterministic. A document longer than the budget gets a
    bin of its own (documented overflow, same rule both engines).
    """
    import pandas as pd

    d = docs.select(
        "doc_id",
        F.substring(_digest(F.col("doc_id")), 1, 1).alias("packer"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += n
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "packer", "n_tokens", "bin_id"]]

    return (
        d.groupBy("packer")
        .applyInPandas(pack, "doc_id long, packer string, n_tokens long, bin_id long")
        .orderBy("packer", "doc_id")
    )


def source_interleave(docs: DataFrame, seed: int = 13) -> DataFrame:
    """sp13: fair round-robin interleaving across sources — the epoch
    composition rule that prevents SOURCE CLUMPING in training order
    (a run of consecutive same-source batches skews gradient mixture;
    sp6 randomizes globally but guarantees nothing per window).

    Each source's docs get a content-stable pseudo-random order
    (``md5(seed:doc_id)`` — sp6's key), and round r of the epoch reads
    the r-th doc OF EVERY SOURCE that still has one, in source order:
    every window of n_sources consecutive docs contains each live
    source exactly once. Exhausted sources drop out; the tail
    degrades gracefully to the surviving sources.

    Scale shape: one shuffle on source for the per-source ranks
    (parallel across sources; a single giant source shards exactly as
    sp6's ranks do), one O(sources)-wide window per round for the
    slot numbers — never a global row_number over the corpus. The
    (round, slot) pair IS the global read order, so no global rank
    column is needed.
    """
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col("doc_id").cast("string"))
    )
    w_src = Window.partitionBy("source").orderBy("order_key", "doc_id")
    ranked = docs.select("doc_id", "source", key.alias("order_key")).withColumn(
        "round", F.row_number().over(w_src).cast("long")
    )
    w_round = Window.partitionBy("round").orderBy("source")
    return (
        ranked.withColumn("slot", F.row_number().over(w_round).cast("long"))
        .select("doc_id", "source", "round", "slot")
        .orderBy("round", "slot")
    )
