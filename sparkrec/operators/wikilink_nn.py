"""WikilinkNN training-data generation (SURVEY.md §2.4 J5).

The reference's ``_wikilink_nn`` (model.py:386-560) trains a Keras
dot-product embedding over (article, link) pairs. The single-node Keras
fit itself is replaced Spark-first by ``wikilinknn_embeddings`` (ALS
implicit-feedback factorization of the same article×link incidence —
see its docstring for the optimizer divergence); the corpus-touching
parts the data engine owes that pipeline:

- positive pairs (model.py:424-462): per-article DISTINCT links →
  lowercase → boilerplate drop → keep links with corpus count ≥ 4
  ("desired links") → dense ``link_index`` → one (article, link) pair
  per raw link occurrence whose lowercase form is desired. NOTE the
  reference iterates RAW ``article_links`` when emitting pairs, so a
  link repeated inside one article yields repeated pairs (multiplicity
  preserved here too); only the ≥4 count uses per-article distinct.
- negative sampling (model.py:495-533): random (article, link) pairs
  rejected against the positive set. The reference uses
  ``random.SystemRandom`` (irreproducible by design); here the stream is
  a seeded LCG — pure 64-bit integer arithmetic, so the SAME stream is
  reproducible in any engine (the DuckDB oracle twin replays it
  bit-for-bit) and on any cluster size. Candidates are generated as a
  ``spark.range`` map (no driver loop), rejected with one left-anti
  join against DISTINCT positives (the ``pairs_set`` check), and the
  first ``k`` surviving indices are kept — order-deterministic at any
  parallelism.

Index-identity note (J2/J4): the reference keys articles by their
positional index in file order (``article_index``); here articles carry
explicit ids (``doc_id``), replacing positional identity with keyed
identity. ``link_index`` is dense by (count desc, link asc) — the
reference's count-desc sort made deterministic by the asc tie-break
(Counter insertion order is corpus-order-dependent; divergence
documented).

Scale: desired-links is vocabulary-sized → broadcast into the pair join;
negative rejection shuffles candidate-count rows on uniform (art, link)
keys. No driver-side materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkrec.operators.recommend import wikilink_frequencies

# Seeded quadratic mixer mod the Mersenne prime 2^31−1: u = mix(seed, i)
# (linear), then SQUARED mod M before the final Lehmer step — the
# squaring is the nonlinearity that kills the low-bit/arithmetic-
# progression structure a plain LCG stream has (power-of-2-modulus LCGs
# have constant-parity low bits; prime-modulus linear streams are
# arithmetic progressions whose small-modulus residues run in long
# constant runs). Every intermediate fits signed 64-bit ((M−1)² < 2^62),
# so Spark with ANSI overflow checks and DuckDB BIGINT arithmetic
# reproduce the stream bit-for-bit.
_MIX = 2654435761          # Knuth multiplicative-hash constant
_LEHMER_A = 48271          # MINSTD multiplier
_LEHMER_C = 12345
_M31 = (1 << 31) - 1


def _draw(seed: int, i, offset: int):
    """Column expr: pseudo-random BIGINT in [0, M31) for candidate i.
    ``i`` may be a Column or int; pure +,*,% so the DuckDB twin is the
    same formula verbatim."""
    u = (F.lit(seed % _M31) + (i * 2 + offset) * _MIX) % _M31
    v = (u * u) % _M31
    return (v * _LEHMER_A + _LEHMER_C) % _M31


def link_index(
    corpus: DataFrame,
    min_count: int = 4,
    links_col: str = "wikilinks",
) -> DataFrame:
    """(link, link_idx, cnt): dense 0-based ids for desired links,
    ordered by (cnt desc, link asc). The desired-link set is
    vocabulary-sized (≥4 filter), so the single-partition ranking window
    is bounded; at 100 TB the heavy work is the count in
    ``wikilink_frequencies`` (one shuffle), not this ranking."""
    freqs = wikilink_frequencies(corpus, min_count=min_count, links_col=links_col)
    w = Window.orderBy(F.desc("cnt"), F.asc("link"))
    return freqs.select(
        "link", (F.row_number().over(w) - 1).alias("link_idx"), "cnt"
    )


def wikilink_pairs(
    corpus: DataFrame,
    min_count: int = 4,
    id_col: str = "doc_id",
    links_col: str = "wikilinks",
) -> DataFrame:
    """Positive training pairs (article, link_idx, link) with the
    reference's multiplicity semantics (model.py:449-462).

    Plan: explode raw links (map-only) → lower → broadcast-join the
    desired-link index (vocabulary-sized). Zero corpus-sized shuffles."""
    links = corpus.select(
        F.col(id_col).alias("article"),
        F.explode(links_col).alias("link"),
    ).select("article", F.lower("link").alias("link"))
    idx = link_index(corpus, min_count=min_count, links_col=links_col)
    return links.join(F.broadcast(idx), "link").select(
        "article", "link_idx", "link"
    )


def negative_sample_pairs(
    spark: SparkSession,
    positives: DataFrame,
    n_articles: int,
    n_links: int,
    k: int,
    seed: int = 42,
    oversample: int = 4,
    max_oversample: int = 256,
    num_buckets: int = 256,
) -> DataFrame:
    """First ``k`` seeded pseudo-random (article, link_idx) draws that
    are NOT positive pairs — the distributed restatement of the
    reference's rejection loop (model.py:512-525), labeled 0.

    Each candidate i derives two independent quadratic-mixer draws from
    (seed, i); rejection is one left-anti join against distinct
    positives; ``cand_idx`` ordering makes "first k" deterministic at
    any parallelism.

    "First k" ranking is exact WITHOUT a global sort: survivors are
    range-bucketed by cand_idx, per-bucket counts roll into driver-side
    cumulative offsets (≤ num_buckets rows), and rank = offset +
    bucket-local row_number — the same two-phase scheme as
    docs.assign_doc_ids and sample.seeded_sample(scale_safe=True). At
    training scale k ≈ 2×|positives| is corpus-sized, so a
    ``Window.orderBy(cand_idx)`` (single-partition Exchange) would sort
    billions of rows in one task; the bucket scheme keeps every task
    bounded by k·oversample/num_buckets.

    Under-delivery is never silent: the bucket counts expose the
    survivor total for free; when fewer than k candidates survive the
    rejection, the sampler retries with 4× the oversample (the candidate
    stream is a pure function of (seed, i), so a longer stream EXTENDS
    the shorter one — "first k" stays deterministic across retries), and
    raises once ``max_oversample`` is exhausted."""
    from sparkrec.session import scoped_cache

    total = k * oversample
    cand = spark.range(total).select(
        F.col("id").alias("cand_idx"),
        (_draw(seed, F.col("id"), 1) % n_articles).alias("article"),
        (_draw(seed, F.col("id"), 2) % n_links).alias("link_idx"),
    )
    pos = positives.select("article", "link_idx").distinct()
    # cached: feeds the bucket-count action AND the final ranked output
    kept = scoped_cache(cand.join(pos, ["article", "link_idx"], "left_anti"))
    span = max(1, -(-total // num_buckets))
    n_buckets = -(-total // span)
    bucketed = kept.withColumn(
        "_b", (F.col("cand_idx") / F.lit(span)).cast("int")
    )
    counts = {
        r["_b"]: r["cnt"]
        for r in bucketed.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    survivors = sum(counts.values())
    if survivors < k:
        kept.unpersist()
        if oversample >= max_oversample:
            raise ValueError(
                f"negative sampling exhausted: only {survivors} of k={k} "
                f"candidates survive rejection at oversample={oversample}; "
                f"the positive set covers too much of the "
                f"{n_articles}x{n_links} grid"
            )
        return negative_sample_pairs(
            spark, positives, n_articles, n_links, k, seed,
            oversample * 4, max_oversample, num_buckets,
        )
    offsets, acc = {}, 0
    for bkt in range(n_buckets):
        offsets[bkt] = acc
        acc += counts.get(bkt, 0)
    off = F.element_at(
        F.array(*[F.lit(offsets[bkt]) for bkt in range(n_buckets)]),
        F.col("_b") + 1,
    )
    w = Window.partitionBy("_b").orderBy("cand_idx")
    return (
        bucketed.withColumn("_rank", F.row_number().over(w) - 1 + off)
        .filter(F.col("_rank") < k)
        .select("cand_idx", "article", "link_idx", F.lit(0).alias("label"))
    )


def training_pairs(
    spark: SparkSession,
    corpus: DataFrame,
    negative_ratio: float = 2.0,
    min_count: int = 4,
    seed: int = 42,
    id_col: str = "doc_id",
    links_col: str = "wikilinks",
) -> DataFrame:
    """Full labeled training set: positives (label 1) ∪ seeded negatives
    (label 0, ``negative_ratio``× the positive count) — what the
    reference's ``_generate_batch`` yields per epoch, as one DataFrame a
    downstream trainer (Spark ML, Horovod, or single-node) can consume."""
    pos = wikilink_pairs(
        corpus, min_count=min_count, id_col=id_col, links_col=links_col
    ).cache()
    n_pos = pos.count()
    n_articles = corpus.select(id_col).distinct().count()
    n_links = pos.agg(F.max("link_idx")).collect()[0][0]
    n_links = (n_links or 0) + 1
    neg = negative_sample_pairs(
        spark, pos, n_articles, n_links, k=int(n_pos * negative_ratio),
        seed=seed,
    )
    out = pos.select("article", "link_idx", F.lit(1).alias("label")).unionByName(
        neg.select("article", "link_idx", "label")
    )
    return out


def wikilinknn_embeddings(
    corpus: DataFrame,
    embedding_size: int = 75,
    min_count: int = 4,
    seed: int = 42,
    max_iter: int = 10,
    reg: float = 0.01,
    id_col: str = "doc_id",
    links_col: str = "wikilinks",
) -> DataFrame:
    """(doc_id, embedding: array<double>) — article embeddings learned
    from wikilink co-occurrence, the Spark-first restatement of the
    reference's Keras dot-product network (``_wikilink_nn``,
    model.py:386-560; ``embedding_size=75`` default at model.py:44).

    The reference factorizes the implicit article×link incidence matrix
    with an embedding-layer NN trained by SGD on sampled positives and
    negatives. The canonical distributed solver for exactly that
    objective is ALS with implicit feedback (Hu, Koren & Volinsky 2008;
    ``pyspark.ml.recommendation.ALS``): positives weighted by their pair
    multiplicity (the reference emits one pair per raw link occurrence),
    every unobserved (article, link) cell acting as a weak negative —
    subsuming the sampled-negative trick, which exists only because SGD
    cannot afford the full cell set. Rows are L2-normalized like the
    reference's returned weights (model.py:192), so downstream cosine
    consumers (gen_sim_matrix → recommend) compose identically.

    Divergences, documented: least-squares alternating updates instead
    of Adam-on-MSE (different optimizer, same dot-product model);
    articles with NO desired link are absent from the output (the
    reference returns their untrained random init rows, which carry no
    signal).
    """
    from pyspark.ml.recommendation import ALS

    pairs = wikilink_pairs(
        corpus, min_count=min_count, id_col=id_col, links_col=links_col
    )
    # pyspark.ml ALS requires 32-bit ids; a plain (non-ANSI) cast("int")
    # silently WRAPS doc_ids >= 2^31, colliding distinct articles into
    # one factor row. Guard with a codegen'd raise instead: ids beyond
    # INT_MAX need a dense re-map (docs.dense_id_map) before this fit.
    INT_MAX = 2**31 - 1

    def _als_id(c: str):
        return (
            F.when(
                F.col(c) > F.lit(INT_MAX),
                F.raise_error(
                    F.concat(
                        F.lit(f"{c} exceeds INT_MAX (ALS uses 32-bit ids;"
                              " densify ids first): "),
                        F.col(c).cast("string"),
                    )
                ),
            )
            .otherwise(F.col(c))
            .cast("int")
            .alias(c)
        )

    ratings = (
        pairs.groupBy("article", "link_idx")
        .agg(F.count(F.lit(1)).cast("float").alias("cnt"))
        .select(_als_id("article"), _als_id("link_idx"), "cnt")
    )
    als = ALS(
        rank=embedding_size,
        maxIter=max_iter,
        regParam=reg,
        implicitPrefs=True,
        seed=seed,
        userCol="article",
        itemCol="link_idx",
        ratingCol="cnt",
    )
    model = als.fit(ratings)
    # materialize the norm as a COLUMN before the transform lambda — an
    # expression captured in a higher-order function re-evaluates per
    # element (the tokenizer-expression pitfall, dedup.ngrams_expr)
    vecs = model.userFactors.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("features").cast("array<double>").alias("_v"),
    ).withColumn(
        "_n",
        F.sqrt(F.aggregate("_v", F.lit(0.0), lambda a, x: a + x * x)),
    )
    return vecs.select(
        "doc_id",
        F.transform("_v", lambda x: x / F.col("_n")).alias("embedding"),
    )
