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


def cosine_scores(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(vec_id, cos) for EVERY row — the virtualized sim-matrix row the
    reference reads (model.py:340 ``sim_matrix[i]``), computed on scan."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = dot_expr(F.col(vec_col), qlit) / (
        norm_expr(F.col(vec_col)) * F.lit(qnorm)
    )
    return emb.select(
        F.col(id_col).alias("vec_id"), F.round(cos, round_to).alias("cos")
    )


def euclidean_dist_expr(a: Column, b: Column) -> Column:
    """√Σ(aᵢ−bᵢ)² in float64 — fixed fold order, JVM-side."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def euclidean_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """gen_sim_matrix(metric='euclidean') + row scan as one query: the
    k NEAREST rows by L2 distance — ascending, vec_id tie-break, exactly
    the reference's euclidean branch (model.py:377-379 sorts distances
    with ``reverse=False``, lower is better)."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    dist = euclidean_dist_expr(F.col(vec_col), qlit)
    return (
        emb.select(F.col(id_col).alias("vec_id"), F.round(dist, 6).alias("dist"))
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(k)
    )


def recommend_embeddings(
    emb_titled: DataFrame,
    inputs: list[str],
    ratings: list[float] | None = None,
    n: int = 10,
    metric: str = "cosine",
    title_col: str = "title",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The reference's embedding-method recommend chain (gen_embeddings →
    gen_sim_matrix → model.recommend, model.py:198-383) as one query:
    title→vector broadcast lookup, one sim-matrix ROW per input computed
    on scan (never an N×N materialization), the order-dependent ratings
    fold (T2), input exclusion, top-n.

    metric='cosine' ranks folded similarity descending;
    metric='euclidean' ranks folded distance ascending — both match the
    reference's recommend() sort directions (model.py:374-379). Per-input
    scores are rounded to 6 BEFORE the fold so any SQL twin folds
    identical doubles."""
    from sparkrec.operators.recommend import fold_multi_input_scores

    if metric not in ("cosine", "euclidean"):
        raise ValueError("metric must be cosine or euclidean")
    qrows = (
        emb_titled.filter(F.col(title_col).isin(list(inputs)))
        .select(title_col, id_col, vec_col)
        .collect()
    )
    by_title = {r[title_col]: r for r in qrows}
    missing = [t for t in inputs if t not in by_title]
    if missing:
        raise KeyError(f"inputs not found: {missing}")
    per_input = []
    for t in inputs:
        qv = [float(x) for x in by_title[t][vec_col]]
        if metric == "cosine":
            s = cosine_scores(emb_titled, qv, id_col=id_col, vec_col=vec_col)
            per_input.append(s.select(F.col("vec_id"), F.col("cos").alias("score")))
        else:
            qlit = F.array(*[F.lit(float(x)) for x in qv])
            d = euclidean_dist_expr(F.col(vec_col), qlit)
            per_input.append(
                emb_titled.select(
                    F.col(id_col).alias("vec_id"),
                    F.round(d, 6).alias("score"),
                )
            )
    folded = fold_multi_input_scores(per_input, ratings, id_col="vec_id")
    input_ids = [by_title[t][id_col] for t in inputs]
    ranked = folded.filter(~F.col("vec_id").isin(input_ids)).select(
        "vec_id", F.round("score", 6).alias("score")
    )
    order = (
        [F.desc("score"), F.asc("vec_id")]
        if metric == "cosine"
        else [F.asc("score"), F.asc("vec_id")]
    )
    out = ranked.orderBy(*order).limit(n)
    titles = emb_titled.select(F.col(id_col).alias("vec_id"), title_col)
    return out.join(F.broadcast(titles), "vec_id").orderBy(*order).select(
        title_col, "score"
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


def banded_bucket_exprs(vec: Column, planes: np.ndarray, n_tables: int):
    """``n_tables`` independent sign-pattern buckets (planes split into
    bands, minhash-LSH style OR-construction): a pair is a candidate when
    it agrees on ALL planes of ANY one band. More tables ⇒ higher recall
    at linear signature cost."""
    per = len(planes) // n_tables
    return [
        lsh_bucket_expr(vec, planes[t * per: (t + 1) * per])
        for t in range(n_tables)
    ]


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 4,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    exact_max_rows: int = 200_000,
) -> DataFrame:
    """(vec_a, vec_b, cos ≥ threshold) embedding near-duplicates.

    Default (the 100 TB path): banded multi-table LSH — ``n_tables``
    independent buckets of ``n_planes`` hyperplanes each; candidate
    pairs share ≥1 (table, bucket) key, found by a self-join on that key
    (``shuffle_hash``-hinted: both sides are corpus-sized). Shuffle
    volume is n_tables rows/vector; quadratic work only inside a bucket.
    Recall < 1 by construction — measured against the exact path in
    tests/test_simsearch_recall.py.

    exact=True: all-pairs O(N²) crossJoin for small-N oracle comparison
    ONLY — guarded by ``exact_max_rows`` (one count action) so the
    quadratic path cannot silently reach production scale.
    """
    e = with_norm(emb, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "_norm"
    )
    if not exact:
        if dim is None:
            raise ValueError("dim required for LSH mode")
        planes = _hyperplanes(dim, n_planes * n_tables, seed)
        buckets = banded_bucket_exprs(F.col("_v"), planes, n_tables)
        e = e.withColumn(
            "tb",
            F.explode(
                F.array(*[
                    F.struct(F.lit(t).alias("tbl"), b.alias("bucket"))
                    for t, b in enumerate(buckets)
                ])
            ),
        ).select("_id", "_v", "_norm", "tb.tbl", "tb.bucket")
        a = e.select(
            F.col("_id").alias("vec_a"), F.col("_v").alias("va"),
            F.col("_norm").alias("na"), "tbl", "bucket",
        )
        b = e.select(
            F.col("_id").alias("vec_b"), F.col("_v").alias("vb"),
            F.col("_norm").alias("nb"), "tbl", "bucket",
        )
        pairs = a.join(b.hint("shuffle_hash"), ["tbl", "bucket"])
    else:
        n = emb.count()
        if n > exact_max_rows:
            raise ValueError(
                f"exact near-dup is O(N²); {n} rows > exact_max_rows="
                f"{exact_max_rows} — use the LSH path at scale"
            )
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
