"""Seeded exact-size sampling (SURVEY.md §2.5 T8).

The reference samples *selected indices*:
``np.random.choice(idxs, size=int(sample_size * original_len),
replace=False)`` — exact size, without replacement, seeded, and a no-op
when the corpus is already at or below the target size
(/root/reference/src/wikirec/data_utils.py:995-1005, guard at :996).

Distributed restatement: rows are ranked by a seeded hash of their key
and the smallest k are kept. The hash (md5 of ``seed:id``) is a pure
column expression both Spark and DuckDB evaluate identically, so the
selected id set is deterministic, parallelism-independent, and
oracle-checkable. (numpy's Mersenne-Twister stream itself is not
reproducible as a relational expression — the *semantics* match: a
seeded uniform exact-size draw without replacement.)

Two physical paths:

- ``seeded_sample`` (default): ``orderBy(h).limit(k)`` — Spark plans
  TakeOrderedAndProject, which keeps only k rows per partition and k at
  the driver. Right when k is serving-sized (≤ ~10^6).
- ``seeded_sample(scale_safe=True)``: for corpus-sized k (sampling 10%
  of 10^12 docs), no driver bottleneck is acceptable. The k-th smallest
  hash is estimated by distributed ``approx_quantile`` with a safety
  margin, the filter runs scan-side, and the survivors (≈k(1+ε) rows)
  get exact ranks via the same two-phase bucket-offset scheme as doc-id
  assignment (operators/docs.py) — one extra shuffle, no global sort, no
  row ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_hash_expr(id_col, seed: int):
    """Seeded rank key: md5('seed:id') — identical in Spark and DuckDB."""
    return F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )


def duck_sample_hash(id_col: str, seed: int) -> str:
    """The identical rank key as a DuckDB SQL fragment."""
    return f"md5('{seed}' || ':' || {id_col}::VARCHAR)"


def seeded_sample(
    df: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    scale_safe: bool = False,
) -> DataFrame:
    """Exactly ``min(k, count)`` rows, seeded, without replacement.

    The reference's no-op guard (corpus already ≤ target) falls out of
    ``limit``/rank semantics — no count action needed on the common path.
    """
    h = sample_hash_expr(id_col, seed)
    if not scale_safe:
        return (
            df.withColumn("_h", h)
            .orderBy("_h", id_col)
            .limit(k)
            .drop("_h")
        )

    hashed = df.withColumn("_h", h)
    # distributed quantile of the rank key at k/n (+25% margin; the exact
    # rank pass below trims the overshoot). approxQuantile needs a
    # numeric column, so the cut runs on the hash's 15-hex-char prefix as
    # a long — prefix-numeric order equals the hex-string order used for
    # ranking, so the cut is a coarse superset of the true top-k.
    # relativeError 0.01 keeps the sketch driver-side tiny at any scale.
    n = hashed.count()
    if n <= k:
        return hashed.drop("_h")
    hashed = hashed.withColumn(
        "_hn", F.conv(F.substring("_h", 1, 15), 16, 10).cast("double")
    )
    cut = hashed.select("_hn").approxQuantile(
        "_hn", [min(1.0, 1.25 * k / n)], 0.01
    )[0]
    cand = hashed.filter(F.col("_hn") <= cut).drop("_hn")
    # exact rank via bucket offsets (no global sort): bucket by hash
    # prefix, count per bucket, cumulative offsets driver-side (256 rows),
    # rank = offset + local row_number.
    nb = 256
    bucketed = cand.withColumn(
        "_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
    )
    counts = {
        r["_b"]: r["cnt"]
        for r in bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in range(nb):
        offsets[b] = acc
        acc += counts.get(b, 0)
    if acc < k:
        # margin too tight for a skewed hash prefix (vanishingly unlikely
        # with md5): fall back to the exact top-k path
        return (
            hashed.orderBy("_h", id_col).limit(k).drop("_h", "_hn")
        )
    off = F.element_at(
        F.array(*[F.lit(offsets[b]) for b in range(nb)]), F.col("_b") + 1
    )
    w = Window.partitionBy("_b").orderBy("_h", id_col)
    return (
        bucketed.withColumn("_rank", F.row_number().over(w) - 1 + off)
        .filter(F.col("_rank") < k)
        .drop("_h", "_b", "_rank")
    )


def sample_fraction(
    df: DataFrame,
    sample_size: float,
    original_len: int,
    seed: int = 42,
    id_col: str = "doc_id",
    scale_safe: bool = False,
) -> DataFrame:
    """The reference's exact call shape: target = int(sample_size *
    original_len), where ``original_len`` is the PRE-filter corpus size
    (data_utils.py:983, 998) — so ``sample_size=1`` is always a no-op."""
    k = int(sample_size * original_len)
    return seeded_sample(df, k, seed, id_col, scale_safe)
