"""Deterministic text-hashing primitives shared by the dedup operators
and their DuckDB oracles.

Both engines must compute bit-identical hashes, so everything reduces
to md5 (identical everywhere) reinterpreted as integers:

    hash60(s) = first 15 hex digits of md5(s) as a 60-bit BIGINT

Spark renders that as ``conv(substr(md5(s),1,15),16,10)``, DuckDB as
``('0x' || substring(md5(s),1,15))::BIGINT``. MinHash permutations are
the standard universal-hash family ``(a*h + b) mod P`` over the
Mersenne prime P = 2^31 - 1 with fixed (a, b) drawn once from a seeded
PRNG at import — the same constants are interpolated into the Spark
expressions and the oracle SQL.
"""

from __future__ import annotations

import random

MERSENNE_P = 2_147_483_647  # 2^31 - 1
NUM_PERM = 32  # minhash signature length
LSH_BANDS = 8  # 8 bands x 4 rows
LSH_ROWS = NUM_PERM // LSH_BANDS
SHINGLE_N = 3  # words per shingle for near-dup detection
SIMHASH_BITS = 60  # hash60 width
SIMHASH_BANDS = 4  # 15-bit bands => recall 1.0 for hamming <= 3
SIMHASH_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS
HAMMING_MAX = 3

_rng = random.Random(20240813)
PERM_A = [_rng.randrange(1, MERSENNE_P) for _ in range(NUM_PERM)]
PERM_B = [_rng.randrange(0, MERSENNE_P) for _ in range(NUM_PERM)]


def spark_hash60(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def duck_hash60(expr: str) -> str:
    return f"('0x' || substring(md5({expr}), 1, 15))::BIGINT"


def spark_shingle_hashes(text_expr: str = "text", n: int = SHINGLE_N) -> str:
    """Distinct hash60 values of word n-gram shingles (Spark SQL)."""
    shingle = f"array_join(slice(split({text_expr}, ' '), i, {n}), ' ')"
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(split({text_expr}, ' ')) - {n - 1}, 1)), "
        f"i -> {spark_hash60(shingle)}))"
    )


def spark_shingle_hashes_from_words(words_col: str = "words", n: int = SHINGLE_N) -> str:
    """Same as :func:`spark_shingle_hashes`, but over a pre-split word
    array column. Hoisting ``split(text)`` into its own projection
    evaluates it once per document instead of once per shingle (lambda
    bodies get no common-subexpression elimination), and CollapseProject
    won't inline a non-cheap expression referenced more than once."""
    shingle = f"array_join(slice({words_col}, i, {n}), ' ')"
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({words_col}) - {n - 1}, 1)), "
        f"i -> {spark_hash60(shingle)}))"
    )


def duck_shingle_hashes(text_expr: str = "text", n: int = SHINGLE_N) -> str:
    """Identical shingle hash set in DuckDB SQL (1-indexed slices)."""
    shingle = f"array_to_string(string_split({text_expr}, ' ')[i:i+{n - 1}], ' ')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(string_split({text_expr}, ' ')) - {n - 1}, 1) + 1), "
        f"i -> {duck_hash60(shingle)}))"
    )


def _perm_pairs_sql(struct_fn: str) -> str:
    return ", ".join(
        f"{struct_fn}('a', {a}, 'b', {b})" if struct_fn == "named_struct" else f"{{'a': {a}, 'b': {b}}}"
        for a, b in zip(PERM_A, PERM_B)
    )


def duck_minhash_sig(hashes_expr: str) -> str:
    pairs = _perm_pairs_sql("{}")
    return (
        f"list_transform([{pairs}], p -> "
        f"list_min(list_transform({hashes_expr}, h -> (p.a * (h % {MERSENNE_P}) + p.b) % {MERSENNE_P})))"
    )


def spark_band_hashes(sig_expr: str) -> str:
    """LSH band digests: md5 of each 4-row slice of the signature."""
    return (
        f"transform(sequence(0, {LSH_BANDS - 1}), j -> "
        f"md5(array_join(transform(slice({sig_expr}, j * {LSH_ROWS} + 1, {LSH_ROWS}), "
        f"x -> cast(x as string)), '-')))"
    )


def duck_band_hash(sig_expr: str, band_var: str = "j") -> str:
    lo = f"{band_var} * {LSH_ROWS} + 1"
    hi = f"{band_var} * {LSH_ROWS} + {LSH_ROWS}"
    return (
        f"md5(array_to_string(list_transform({sig_expr}[{lo}:{hi}], "
        f"x -> x::VARCHAR), '-'))"
    )


def duck_simhash(hashes_expr: str) -> str:
    vote = f"list_sum(list_transform({hashes_expr}, h -> ((h >> b) & 1) * 2 - 1))"
    return (
        f"CAST(list_sum(list_transform(range(0, {SIMHASH_BITS}), b -> "
        f"(CASE WHEN {vote} > 0 THEN 1::BIGINT ELSE 0::BIGINT END) << b)) AS BIGINT)"
    )
