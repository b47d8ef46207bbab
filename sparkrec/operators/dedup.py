"""Deduplication operators for training-data pipelines.

The reference's only dedup is per-doc ``set(tokens)`` and per-article link
dedup (``list(set(...))``, reference data_utils.py:947, model.py:425). A
100 TB corpus pipeline needs document-level dedup; this module provides
the standard ladder, each designed around its shuffle profile:

- **exact**: md5-groupBy. One shuffle on a 32-byte key; group state is a
  count + min — O(1) per group, no skew risk (hash keys are uniform).
- **ngram Jaccard**: shingle inverted index → candidate pairs by shared
  shingle → exact Jaccard. The candidate join is the classic quadratic
  trap; rare-shingle pruning (drop shingles with df > cap) bounds each
  shingle's pair fan-out, and all-pairs work only happens *within* a
  shingle bucket (prefix-filter style). At 100 TB you'd also bucket by
  doc-length band — implemented via a band key in the candidate join.
- **MinHash + LSH**: per-doc signature (vectorized numpy inside one
  ``mapInPandas`` pass — no per-row Python), banded into ``n_bands``
  keys; a groupBy per band emits candidate pairs; exact verify joins
  back. Shuffle volume is n_bands keys/doc regardless of corpus size —
  the linear-scale near-dup path.
- **SimHash**: 64-bit signature via per-token hash sign aggregation,
  Hamming-distance candidates through bit-band buckets.
- **embedding cosine**: see operators/simsearch.py (near_dup_pairs).

All pair outputs are canonicalized (a < b) and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrec.functions.sqltok import sql_tokenize_expr

MERSENNE_61 = (1 << 61) - 1


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(text_md5, n_dups, keeper) — one row per distinct text; keeper is
    the smallest doc_id. Filter ``n_dups > 1`` for actual duplicates."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper"),
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per distinct text. Broadcast-free:
    groups carry min-id state; survivors join back on (md5, id)."""
    keepers = exact_dup_groups(docs, id_col, text_col).select(
        "text_md5", F.col("keeper").alias(id_col)
    )
    with_md5 = docs.withColumn("text_md5", F.md5(F.col(text_col)))
    return with_md5.join(keepers, ["text_md5", id_col]).drop("text_md5")


def ngrams_expr(toks, n: int):
    """Word n-grams of a token array as 'w1 w2 .. wn' strings, in order,
    duplicates kept (corpus-level n-gram mining needs occurrence counts —
    the gensim Phrases pair counting at reference data_utils.py:819-864)."""
    if n == 1:
        return toks
    # indices 1..size-n+1; ngram i = concat(toks[i..i+n-1]).
    # (sequence(1, 0) would count DOWN — guard short docs explicitly)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _shingles_expr(text_col, n: int):
    """Distinct word n-gram shingles per doc (set semantics for Jaccard)."""
    return F.array_distinct(ngrams_expr(sql_tokenize_expr(text_col), n))


def shingle_df(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded distinct word-n-gram table."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingles_expr(F.col(text_col), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold.

    Plan: shingle table → per-doc set sizes → candidate pairs via
    self-join on shingle (pruning shingles shared by > max_shingle_df
    docs — those contribute pairs that will be found through their rarer
    shingles if truly similar, and are the quadratic-blowup source) →
    intersection counts by pair → Jaccard = i / (|A| + |B| - i).
    """
    sh = shingle_df(docs, n, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))

    sh_df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    pruned = sh.join(
        sh_df.filter(F.col("sdf") <= max_shingle_df).select("shingle"), "shingle"
    )

    a = pruned.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("isect"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("set_size").alias("size_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("set_size").alias("size_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("isect").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("isect")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_61, size=n_hashes, dtype=np.int64).astype(
        np.uint64
    )
    b = rng.integers(0, MERSENNE_61, size=n_hashes, dtype=np.int64).astype(
        np.uint64
    )
    return a, b


def _shingle_base_hash(shingles: pd.Series) -> list[np.ndarray]:
    """Stable 64-bit FNV-1a per shingle string, vectorized per doc."""
    out = []
    for arr in shingles:
        hs = np.fromiter(
            (_fnv1a(s) for s in arr), dtype=np.uint64, count=len(arr)
        )
        out.append(hs)
    return out


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures.

    Shingling is a Catalyst expression; the hash family
    h_i(x) = (a_i·x + b_i) mod (2^61-1) is evaluated vectorized in numpy
    over one Arrow batch per partition — (n_shingles × n_hashes) matrix
    min-reduced per doc, no per-row Python, no shuffle at all (map-only).
    """
    a, b = _minhash_params(n_hashes, seed)
    shingled = docs.select(
        F.col(id_col).alias("doc_id"),
        _shingles_expr(F.col(text_col), shingle_n).alias("shingles"),
    )

    def sign(batches):
        for pdf in batches:
            base = _shingle_base_hash(pdf["shingles"])
            sigs = []
            for hs in base:
                if len(hs) == 0:
                    sigs.append(np.full(n_hashes, MERSENNE_61, dtype=np.int64))
                    continue
                # (n_shingles, n_hashes) — mod 2^61-1 after 128-bit-safe mult
                prod = (
                    hs[:, None].astype(object) * a[None, :].astype(object)
                    + b[None, :].astype(object)
                ) % MERSENNE_61
                sigs.append(prod.min(axis=0).astype(np.int64))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sig": [list(map(int, s)) for s in sigs]}
            )

    return shingled.mapInPandas(sign, schema="doc_id long, sig array<long>")


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 16
) -> DataFrame:
    """Band the signatures and emit (doc_a, doc_b) sharing ≥1 band bucket.

    Shuffle profile: n_bands rows per doc, keys are (band, hash-of-rows) —
    uniformly distributed, so no skew; pair fan-out per bucket is bounded
    by actual near-duplicate cluster sizes.
    """
    sig_len = F.size("sig")
    rows_per_band = (sig_len / n_bands).cast("int")
    bands = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.hash(
                        F.slice("sig", i * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 128,
    n_bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold.

    End-to-end near-dup path: signature (map-only) → banded candidates
    (one shuffle) → exact verify via shingle intersection join restricted
    to candidate pairs (semi-join pushdown keeps the verify linear in
    candidates, not corpus²).
    """
    sigs = minhash_signatures(docs, n_hashes, shingle_n, seed, id_col, text_col)
    cands = lsh_candidate_pairs(sigs, n_bands)

    sh = shingle_df(docs, shingle_n, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(F.broadcast(cands), "doc_a")
        .join(b, ["shingle", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("isect"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("set_size").alias("size_a")), "doc_a")
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("set_size").alias("size_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("isect").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("isect")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash: bigint) 64-bit SimHash over token xxhash64 bits.

    Pure Catalyst: per token the 64 hash bits vote ±tf; signature bit j is
    the sign of the vote sum. Expressed as an aggregate over a 64-element
    sequence — no Python, map-side only.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(sql_tokenize_expr(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    h = F.xxhash64("term")
    # bit j's vote: +tf if hash bit j set, else -tf (j is a Python int —
    # the 64 expressions are unrolled into one array literal)
    bits = F.array(
        *[
            F.when(
                h.bitwiseAND(F.lit(_signed64(1 << j))) != 0, F.col("tf")
            ).otherwise(-F.col("tf"))
            for j in range(64)
        ]
    )
    # posexplode keeps aggregation state O(1) per (doc, bit) — a doc with
    # millions of distinct terms never builds driver-sized buffers.
    votes = tf.select("doc_id", F.posexplode(bits).alias("j", "vote"))
    summed = votes.groupBy("doc_id", "j").agg(F.sum("vote").alias("vote_sum"))
    powers = F.array(*[F.lit(_signed64(1 << j)).cast("long") for j in range(64)])
    sig_bit = F.when(
        F.col("vote_sum") > 0, F.element_at(powers, F.col("j").cast("int") + 1)
    ).otherwise(F.lit(0).cast("long"))
    return summed.groupBy("doc_id").agg(F.bit_or(sig_bit).alias("simhash"))


def _signed64(v: int) -> int:
    """Two's-complement wrap so 1<<63 is representable as a Spark long."""
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_near_pairs(
    signatures: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ max_hamming) via bit-band blocking.

    Pigeonhole: two signatures within Hamming distance d < n_bands must
    agree exactly on ≥1 of n_bands 16-bit bands → candidates share a band
    value; exact popcount verifies.
    """
    width = 64 // n_bands
    bands = signatures.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("bucket"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "band", "bucket",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "band", "bucket",
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
