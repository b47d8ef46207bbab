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

Cache lifetime: multi-branch intermediates (shingle tables, band tables,
candidate pairs) are cached via ``session.scoped_cache`` so the expensive
branch computes once per call. Long-lived sessions should call
``sparkrec.session.release_caches()`` after materializing the returned
DataFrames — otherwise repeated dedup calls accumulate cache entries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrec.functions.sqltok import sql_tokenize_expr
from sparkrec.session import scoped_cache

MERSENNE_61 = (1 << 61) - 1


# ---------------------------------------------------------------------------
# Hash families
# ---------------------------------------------------------------------------
# Production default is xxhash64 (fastest JVM-side 64-bit hash). The
# "md5_60" family — the first 15 hex chars of md5 as a non-negative
# 60-bit BIGINT — computes to the identical value in Spark and DuckDB
# (`('0x' || substr(md5(x),1,15))::BIGINT`), which is what lets the
# MinHash-LSH and SimHash contract entries carry exact value-hash
# oracles instead of rows-only checks. Same pipeline, same shuffle
# shape; only the base hash differs.


def md5_60_expr(col):
    """Non-negative 60-bit hash: first 15 hex chars of md5 as a long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_md5_60(col_sql: str) -> str:
    """The identical 60-bit hash as a DuckDB SQL fragment."""
    return f"('0x' || substr(md5({col_sql}), 1, 15))::BIGINT"


def _hash_expr(hash_fn: str, col):
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return md5_60_expr(col)
    raise ValueError(f"unknown hash family: {hash_fn}")


def _hash_bits(hash_fn: str) -> int:
    return 64 if hash_fn == "xxhash64" else 60


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
    the gensim Phrases pair counting at reference data_utils.py:819-864).

    ``toks`` MUST be a materialized array column (AttributeReference), not
    a tokenizer expression: Catalyst re-evaluates a non-trivial lambda-
    captured expression on every ``element_at`` access, turning an O(T)
    gram build into O(T²) regexp work per row (measured 30× slowdown).
    Project tokens into a column first, then call this.
    """
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


def _shingled(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, shingles: array<string>) — tokens materialized into a real
    column BEFORE the gram build (see ngrams_expr docstring)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        sql_tokenize_expr(F.col(text_col)).alias("_toks"),
    )
    return toks.select(
        "doc_id",
        F.array_distinct(ngrams_expr(F.col("_toks"), n)).alias("shingles"),
    )


def shingle_df(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded distinct word-n-gram table."""
    return _shingled(docs, n, id_col, text_col).select(
        "doc_id", F.explode("shingles").alias("shingle")
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

    The shingle table feeds four plan branches (sizes, df-prune, both
    join sides); it is cached so tokenize+shingle runs once — the
    in-memory equivalent of materializing the shingle table, which is
    what you'd do at 100 TB (write it, read it thrice).
    """
    sh = scoped_cache(shingle_df(docs, n, id_col, text_col))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))

    sh_df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    pruned = sh.join(
        sh_df.filter(F.col("sdf") <= max_shingle_df).select("shingle"), "shingle"
    )

    a = pruned.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "shingle")
    # shuffle_hash: corpus-sized self-join — never broadcast (see
    # lsh_candidate_pairs)
    inter = (
        a.join(b.hint("shuffle_hash"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("isect"))
    )
    return (
        inter.join(
            sizes.hint("shuffle_hash").select(
                F.col("doc_id").alias("doc_a"),
                F.col("set_size").alias("size_a")),
            "doc_a",
        )
        .join(
            sizes.hint("shuffle_hash").select(
                F.col("doc_id").alias("doc_b"),
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

_MINHASH_P = np.uint64(4294967311)  # smallest prime > 2^32


def _minhash_params(n_hashes: int, seed: int = 42):
    """(a, b) with a < 2^31, b < P: a·x + b for x < 2^32 stays < 2^64, so
    the whole permutation family runs in native uint64 — no object dtype,
    no Python bignums."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 1 << 32, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures.

    Shingling AND base hashing are Catalyst expressions (``xxhash64`` per
    shingle by default, JVM-side, codegen'd; ``hash_fn="md5_60"`` is the
    DuckDB-replayable family — see module notes); the Arrow batch hands
    numpy int64 arrays, never strings. The permutation family
    h_i(x) = (a_i·x32 + b_i) mod P (P prime > 2^32, x32 = low 32 hash
    bits) is evaluated as one (total_shingles × n_hashes) uint64 matrix
    per chunk with ``np.minimum.reduceat`` folding per-doc minima — no
    per-row Python, no shuffle at all (map-only). Chunks cap peak memory
    at ~n_hashes·2^18·8B regardless of batch size.
    """
    a, b = _minhash_params(n_hashes, seed)
    shingled = _shingled(docs, shingle_n, id_col, text_col).select(
        "doc_id",
        F.transform(
            "shingles", lambda s: _hash_expr(hash_fn, s)
        ).alias("sh_hashes"),
    )
    chunk_budget = 1 << 18  # shingle rows per matrix chunk

    def sign(batches):
        for pdf in batches:
            hash_lists = [
                np.asarray(h, dtype=np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
                for h in pdf["sh_hashes"]
            ]
            n_docs_b = len(hash_lists)
            sigs = np.full((n_docs_b, n_hashes), np.iinfo(np.int64).max,
                           dtype=np.uint64)
            i = 0
            while i < n_docs_b:
                j, total = i, 0
                while j < n_docs_b and (total == 0 or total + len(hash_lists[j]) <= chunk_budget):
                    total += len(hash_lists[j])
                    j += 1
                lens = np.array([len(hash_lists[d]) for d in range(i, j)])
                nonempty = np.flatnonzero(lens)
                if len(nonempty):
                    flat = np.concatenate([hash_lists[i + d] for d in nonempty])
                    mat = (flat[:, None] * a[None, :] + b[None, :]) % _MINHASH_P
                    starts = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
                    sigs[i + nonempty] = np.minimum.reduceat(mat, starts, axis=0)
                i = j
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sig": list(sigs.astype(np.int64)),
                }
            )

    return shingled.mapInPandas(sign, schema="doc_id long, sig array<long>")


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 16, bucket_mode: str = "hash"
) -> DataFrame:
    """Band the signatures and emit (doc_a, doc_b) sharing ≥1 band bucket.

    Shuffle profile: n_bands rows per doc, keys are (band, hash-of-rows) —
    uniformly distributed, so no skew; pair fan-out per bucket is bounded
    by actual near-duplicate cluster sizes.

    ``bucket_mode="hash"`` (default) keys buckets by a Murmur3 hash of
    the band slice (compact 4-byte shuffle keys); ``"concat"`` keys them
    by the comma-joined slice values — byte-identical grouping (equal
    slices ⇔ equal keys either way), but the key is engine-portable, so
    the DuckDB oracle replays it exactly.
    """
    sig_len = F.size("sig")
    rows_per_band = (sig_len / n_bands).cast("int")

    def bucket_of(i):
        sl = F.slice("sig", i * rows_per_band + 1, rows_per_band)
        if bucket_mode == "hash":
            return F.hash(sl)
        return F.concat_ws(",", F.transform(sl, lambda v: v.cast("string")))

    # cached: both sides of the bucket self-join read this table — without
    # the cache the (expensive) signature computation runs twice
    bands = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.struct(
                    i.alias("band"), bucket_of(i).alias("bucket")
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    bands = scoped_cache(bands)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    # shuffle_hash: the self-join sides scale with the corpus — Spark's
    # byte-stats would auto-broadcast them at test scale, which (a) OOMs
    # at real scale and (b) serialises the expensive signature compute
    # into the single-threaded broadcast-exchange path
    return (
        a.join(b.hint("shuffle_hash"), ["band", "bucket"])
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
    hash_fn: str = "xxhash64",
    bucket_mode: str = "hash",
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold.

    End-to-end near-dup path: signature (map-only) → banded candidates
    (one shuffle) → exact verify via shingle intersection join restricted
    to candidate pairs (semi-join pushdown keeps the verify linear in
    candidates, not corpus²).
    """
    sigs = minhash_signatures(
        docs, n_hashes, shingle_n, seed, id_col, text_col, hash_fn
    )
    cands = scoped_cache(lsh_candidate_pairs(sigs, n_bands, bucket_mode))
    # materialize NOW, with a normal parallel job: `cands` is consumed via
    # broadcast below, and a lazy broadcast subquery executes its whole
    # child DAG (signature UDF included) single-threaded inside the
    # broadcast-exchange thread — measured 32 s single-task vs 3 s wide
    cands.count()

    # cached: feeds sizes + both sides of the verify join (see
    # ngram_jaccard_pairs for the rationale)
    sh = scoped_cache(shingle_df(docs, shingle_n, id_col, text_col))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(cands.hint("shuffle_hash"), "doc_a")
        .join(b.hint("shuffle_hash"), ["shingle", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("isect"))
    )
    return (
        inter.join(
            sizes.hint("shuffle_hash").select(
                F.col("doc_id").alias("doc_a"),
                F.col("set_size").alias("size_a")), "doc_a")
        .join(
            sizes.hint("shuffle_hash").select(
                F.col("doc_id").alias("doc_b"),
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
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, simhash: bigint) SimHash over per-token hash bits —
    64 bits with xxhash64 (default), 60 with the DuckDB-replayable
    ``md5_60`` family.

    Pure Catalyst: per token occurrence the hash bits vote ±1 (so a
    term with frequency tf votes ±tf overall); signature bit j is the
    sign of the vote sum. One shuffle, n_bits codegen'd SUM aggregates.
    """
    n_bits = _hash_bits(hash_fn)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(sql_tokenize_expr(F.col(text_col))).alias("term"),
    )
    h = _hash_expr(hash_fn, "term")
    # bit j's vote: +1 per occurrence if hash bit j set, else -1. The
    # votes are n_bits parallel SUM aggregates over the exploded token
    # rows — ONE shuffle keyed by doc_id, map-side partial aggregation,
    # O(n_bits) state per group. (The alternative posexplode formulation
    # is an n_bits× row blowup plus a second shuffle.)
    votes = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(_signed64(1 << j))) != 0, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"v{j}")
        for j in range(n_bits)
    ]
    summed = toks.groupBy("doc_id").agg(*votes)
    sig = None
    for j in range(n_bits):
        bit = F.when(
            F.col(f"v{j}") > 0, F.lit(_signed64(1 << j)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return summed.select("doc_id", sig.alias("simhash"))


def _signed64(v: int) -> int:
    """Two's-complement wrap so 1<<63 is representable as a Spark long."""
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_near_pairs(
    signatures: DataFrame, max_hamming: int = 3, n_bands: int = 4,
    n_bits: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ max_hamming) via bit-band blocking.

    Pigeonhole: two signatures within Hamming distance d < n_bands must
    agree exactly on ≥1 of n_bands (n_bits/n_bands)-wide bands →
    candidates share a band value; exact popcount verifies.
    """
    width = n_bits // n_bands
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
    bands = scoped_cache(bands)
    # cached: self-joined below (same rationale as lsh_candidate_pairs)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "band", "bucket",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "band", "bucket",
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # shuffle_hash: corpus-sized self-join — never broadcast (see
    # lsh_candidate_pairs)
    return (
        a.join(b.hint("shuffle_hash"), ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
