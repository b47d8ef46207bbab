"""Approximate/exact nearest-neighbor search over embedding columns.

The reference materializes a dense N×N cosine matrix
(``gen_sim_matrix``, reference model.py:256-290 — the 5-10 GB pickles)
and scans a row per query (model.py:372-381). Here similarity is computed
*at query time* against the embeddings table:

- ``cosine_topk``: brute-force exact top-k. One pass over the table, the
  dot product is a Catalyst ``aggregate`` over ``zip_with`` (JVM-side,
  codegen'd; no Python). Top-k is ``TakeOrderedAndProject`` — O(k) state
  per partition, no global sort. This is the 100 TB-safe *baseline*: it
  reads everything but shuffles only k rows per partition.
- ``cosine_topk_lsh``: random-hyperplane LSH. Signatures are map-only;
  query probes only its own bucket (+ multiprobe neighbors) — the scan is
  partition-pruned by bucket when the table is written partitioned by
  ``bucket``. Recall < 1.0 by construction; tests measure it against the
  brute-force baseline.
- ``near_dup_pairs``: all-pairs cosine ≥ threshold within LSH buckets —
  the embedding-space near-dup detector for training corpora.

Vectors are ``array<float>`` columns; norms are precomputed once
(``with_norm``) so repeated queries don't recompute them.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in float64 — zip_with + aggregate, fixed fold order so the
    result is deterministic at any parallelism."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", norm_expr(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cos) — rounded to 6 for
    cross-engine comparability, tie-break (cos desc, vec_id asc)."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = dot_expr(F.col(vec_col), qlit) / (
        norm_expr(F.col(vec_col)) * F.lit(qnorm)
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id over n_planes random hyperplanes — pure
    Catalyst (each plane is a literal array; dot via zip_with/aggregate)."""
    bits = []
    for j, p in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot_expr(vec, plit) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def add_lsh_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` column; at scale, write partitioned by it so query
    probes become partition-pruned scans."""
    planes = _hyperplanes(dim, n_planes, seed)
    return emb.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))


def _probe_buckets(qv: np.ndarray, planes: np.ndarray, multiprobe: int) -> list[int]:
    """Query bucket + the ``multiprobe`` buckets whose single differing
    hyperplane has the smallest |margin| (most likely sign flips)."""
    proj = planes @ qv
    base = int(sum((1 << j) for j, v in enumerate(proj) if v > 0))
    order = np.argsort(np.abs(proj))
    return [base] + [base ^ (1 << int(j)) for j in order[:multiprobe]]


def cosine_topk_lsh(
    emb_bucketed: DataFrame,
    query_vec: list[float],
    k: int,
    dim: int,
    n_planes: int = 8,
    multiprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only the query's LSH bucket (+ multiprobe flips).

    At 100 TB: the ``bucket IN (...)`` predicate prunes both parquet row
    groups and Iceberg partitions — the scan touches
    (multiprobe+1)/2^n_planes of the table instead of all of it.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    probes = _probe_buckets(qv, planes, multiprobe)
    cand = emb_bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """(vec_a, vec_b, cos ≥ threshold) embedding near-duplicates.

    exact=True: all-pairs within the full table (O(N²) — only for oracle
    comparison at small scale). Default: pairs restricted to shared LSH
    buckets, making the join linear in bucket sizes.
    """
    e = with_norm(emb, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "_norm"
    )
    if not exact:
        if dim is None:
            raise ValueError("dim required for LSH mode")
        planes = _hyperplanes(dim, n_planes, seed)
        e = e.withColumn("bucket", lsh_bucket_expr(F.col("_v"), planes))
        join_keys = ["bucket"]
        a = e.select(
            F.col("_id").alias("vec_a"), F.col("_v").alias("va"),
            F.col("_norm").alias("na"), "bucket",
        )
        b = e.select(
            F.col("_id").alias("vec_b"), F.col("_v").alias("vb"),
            F.col("_norm").alias("nb"), "bucket",
        )
        pairs = a.join(b, join_keys)
    else:
        a = e.select(
            F.col("_id").alias("vec_a"), F.col("_v").alias("va"),
            F.col("_norm").alias("na"),
        )
        b = e.select(
            F.col("_id").alias("vec_b"), F.col("_v").alias("vb"),
            F.col("_norm").alias("nb"),
        )
        pairs = a.crossJoin(b)
    cos = dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .distinct()
    )
