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


def h32(col, seed: int):
    """Cross-engine 32-bit string hash: int of the first 8 hex chars of
    md5(s || '#seed'). Reproducible in any SQL dialect
    (``('0x'||substr(md5(s||'#k'),1,8))::BIGINT`` in DuckDB), which is
    what makes the LSH queries oracle-checkable. For throughput-critical
    paths where no oracle is needed, pass ``hash_fn='xxhash64'`` — same
    topology, JVM-native hashing."""
    return (F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))),
                               1, 8), 16, 10).cast("long"))


def _hash_one(col, seed: int, hash_fn: str):
    if hash_fn == "md5":
        return h32(col, seed)
    return F.xxhash64(col, F.lit(seed))


def _minhash_cols(text_col: str, shingle_len: int, num_hashes: int,
                  hash_fn: str) -> list:
    """k independent min-hashes over character shingles — all JVM-side
    built-in expressions, vectorized by codegen."""
    t = F.col(text_col)
    n = F.length(t) - shingle_len + 1
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    shingles = F.transform(idx, lambda i: t.substr(i, F.lit(shingle_len)))
    return [F.array_min(F.transform(
                shingles, lambda s: _hash_one(s, seed, hash_fn)))
            for seed in range(num_hashes)]


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", shingle_len: int = 5,
                       num_hashes: int = 16,
                       hash_fn: str = "xxhash64") -> DataFrame:
    mins = _minhash_cols(text_col, shingle_len, num_hashes, hash_fn)
    return docs.select(id_col, F.array(*mins).alias("sig"))


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", shingle_len: int = 5,
                            num_hashes: int = 16, bands: int = 4,
                            hash_fn: str = "xxhash64") -> DataFrame:
    """LSH banding: equal band-hash ⇒ candidate pair (id_a < id_b).
    Shuffle is O(n·bands) bucket rows — never the cross product."""
    rows_per_band = num_hashes // bands
    mins = _minhash_cols(text_col, shingle_len, num_hashes, hash_fn)
    if hash_fn == "md5":
        band_hashes = [F.md5(F.concat_ws(",", *[
            m.cast("string")
            for m in mins[b * rows_per_band:(b + 1) * rows_per_band]]))
            for b in range(bands)]
    else:
        band_hashes = [
            F.hash(F.array(*mins[b * rows_per_band:(b + 1) * rows_per_band]))
            .cast("string") for b in range(bands)]
    banded = docs.select(
        id_col, F.posexplode(F.array(*band_hashes)).alias("band", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.band_hash") == F.col("b.band_hash"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .dropDuplicates())


def word_ngrams(text_col: str, n: int = 3):
    """Distinct word n-grams as an array column (space-joined)."""
    toks = F.split(F.col(text_col), " ")
    m = F.size(toks) - n + 1
    idx = F.sequence(F.lit(1), F.greatest(m, F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(queries: DataFrame, corpus: DataFrame, n: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Jaccard similarity over word n-gram sets between a (small,
    broadcast) query side and the corpus: |A∩B| / |A∪B|.
    Pure array built-ins — no Python, no shuffle on the corpus side."""
    q = queries.select(F.col(id_col).alias("id_a"),
                       word_ngrams(text_col, n).alias("g_a"))
    c = corpus.select(F.col(id_col).alias("id_b"),
                      word_ngrams(text_col, n).alias("g_b"))
    j = c.crossJoin(F.broadcast(q)).where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size(F.array_union("g_a", "g_b")).cast("double")
    return j.select("id_a", "id_b", (inter / union).alias("jaccard"))


def simhash32(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash with the cross-engine md5 token hash: per-bit
    majority vote over whitespace tokens (oracle-checkable variant of
    ``simhash``)."""
    tokens = F.split(F.col(text_col), " ")
    hashes = F.transform(tokens, lambda tok: h32(tok, 0))
    sim = F.lit(0).cast("long")
    for i in range(32):
        vote = F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(
                h.bitwiseAND(F.lit(1 << i).cast("long")) != 0,
                F.lit(1)).otherwise(F.lit(-1)))
        sim = sim + F.when(vote > 0, F.lit(1 << i).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return docs.select(id_col, sim.alias("simhash"))


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
