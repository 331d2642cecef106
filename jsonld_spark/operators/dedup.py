"""Deduplication operators: exact and near-duplicate.

Exact dedup is a hash-groupBy (map-side partial agg for free). MinHash
LSH: shingle → 64-bit hashes → k minima → band buckets → candidate
pairs by bucket join — only candidate pairs are verified, never the
full cross product, so the shuffle stays O(n·bands) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per distinct text hash + group size."""
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dupes")))


def _minhash_expr(text_col: str, shingle_len: int, num_hashes: int):
    """Column expr: k independent min-hashes over character shingles.
    Uses xxhash64 with per-hash seeds — all JVM-side built-ins."""
    t = F.col(text_col)
    n = F.length(t) - shingle_len + 1
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    shingles = F.transform(idx, lambda i: t.substr(i, F.lit(shingle_len)))
    mins = [F.array_min(F.transform(shingles,
                                    lambda s: F.xxhash64(s, F.lit(seed))))
            for seed in range(num_hashes)]
    return F.array(*mins)


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", shingle_len: int = 5,
                       num_hashes: int = 16) -> DataFrame:
    return docs.select(id_col,
                       _minhash_expr(text_col, shingle_len, num_hashes)
                       .alias("sig"))


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", shingle_len: int = 5,
                            num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """LSH banding: equal band-hash ⇒ candidate pair (id_a < id_b)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, shingle_len, num_hashes)
    banded = sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band))
            for b in range(bands)])).alias("band", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.band_hash") == F.col("b.band_hash"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .dropDuplicates())


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    token-hash bits, built from array/aggregate expressions."""
    tokens = F.split(F.col(text_col), r"\s+")
    hashes = F.transform(tokens, lambda tok: F.xxhash64(tok))
    bit_cols = []
    for i in range(bits):
        # +1 when bit set, -1 otherwise, summed over tokens
        vote = F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << i).cast("long")) != 0,
                                        F.lit(1)).otherwise(F.lit(-1)))
        bit_cols.append(F.when(vote > 0, F.lit(1 << i).cast("long"))
                        .otherwise(F.lit(0).cast("long")))
    sim = bit_cols[0]
    for c in bit_cols[1:]:
        sim = sim.bitwiseOR(c)
    return docs.select(id_col, sim.alias("simhash"))
