"""Recommendation-surface operators: the reference ``recommend()`` API
re-expressed over BM25 scores.

- ``fold_multi_input_scores``: the reference's order-dependent
  recency-weighted score merge (reference model.py:331-358): for the r-th
  input (r = 0-based), ``sims = mean(r * sims_prev, w_r * sims_r)``
  elementwise, where ``w_r = rating_r / 10`` when ratings are given
  (model.py:334, 350-358). NOT a plain average — the fold must run in
  input order (SURVEY.md §2.5 T2), so it is computed as a left-fold over
  per-input score columns joined on doc_id, never via ``groupBy`` (whose
  combine order is arbitrary).
- ``exclude_inputs_topn``: sort desc, drop the inputs themselves, take n
  (model.py:372-383 — exclusion happens before the limit, after the sort;
  both orderings agree because excluded rows can only free up slots).
- ``fuzzy_suggestions``: top-5 closest titles for a missed input
  (reference utils.py:24-57) — ``SequenceMatcher.ratio`` becomes a
  levenshtein-based similarity available JVM-side in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_multi_input_scores(
    per_input_scores: list[DataFrame],
    ratings: list[float] | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Fold per-input score tables in input order.

    Each element of ``per_input_scores`` is (doc_id, score) for one input.
    Missing docs score 0 (full outer join, coalesce) — mirrors the dense
    sim-matrix rows where unmatched docs simply have low similarity.
    Ratings ∈ [0, 10] are validated like model.py:331-333.
    """
    if ratings is not None:
        if len(ratings) != len(per_input_scores):
            raise ValueError("ratings length must match inputs")
        if any(r < 0 or r > 10 for r in ratings):
            raise ValueError("ratings must be between 0 and 10")
        weights = [r / 10.0 for r in ratings]
    else:
        weights = [1.0] * len(per_input_scores)

    acc = per_input_scores[0].select(
        F.col(id_col),
        (F.col(score_col) * F.lit(weights[0])).alias("_acc"),
    )
    for r in range(1, len(per_input_scores)):
        nxt = per_input_scores[r].select(
            F.col(id_col), (F.col(score_col) * F.lit(weights[r])).alias("_s")
        )
        acc = (
            acc.join(nxt, id_col, "full_outer")
            .select(
                F.col(id_col),
                (
                    (
                        F.lit(float(r)) * F.coalesce(F.col("_acc"), F.lit(0.0))
                        + F.coalesce(F.col("_s"), F.lit(0.0))
                    )
                    / F.lit(2.0)
                ).alias("_acc"),
            )
        )
    return acc.select(F.col(id_col), F.col("_acc").alias(score_col))


def exclude_inputs_topn(
    scores: DataFrame,
    input_ids: list,
    n: int,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """model.py:372-383: sort desc (deterministic doc_id asc tie-break),
    exclude the inputs, take n — Spark plans this as
    TakeOrderedAndProject, no global sort materialization."""
    return (
        scores.filter(~F.col(id_col).isin(list(input_ids)))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(n)
    )


WIKILINK_BOILERPLATE = [
    "hardcover", "paperback", "hardback", "e-book",
    "wikipedia:wikiproject books", "wikipedia:wikiproject novels",
]


def wikilink_frequencies(
    corpus: DataFrame,
    min_count: int = 4,
    to_remove: list[str] | None = None,
    links_col: str = "wikilinks",
) -> DataFrame:
    """(link, cnt) for links kept by the reference's wikilink filter
    (model.py:424-443): per-article DISTINCT links (``list(set(a[2]))``),
    lowercased, boilerplate removed, kept when corpus count ≥ min_count.

    explode(array_distinct) → lower → anti-filter → hash agg → HAVING:
    one shuffle, uniform keys (link strings), partial aggregation."""
    to_remove = WIKILINK_BOILERPLATE if to_remove is None else to_remove
    links = corpus.select(
        F.explode(F.array_distinct(F.col(links_col))).alias("link")
    ).select(F.lower("link").alias("link"))
    if to_remove:
        links = links.filter(~F.col("link").isin(list(to_remove)))
    return (
        links.groupBy("link")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def fuzzy_suggestions(
    titles: DataFrame,
    missed: str,
    n: int = 5,
    title_col: str = "title",
) -> DataFrame:
    """Top-n closest titles by normalized levenshtein similarity
    (utils.py:24-57 analogue; SequenceMatcher.ratio → 1 - lev/maxlen,
    which both Spark and DuckDB evaluate identically on integers).
    Tie-break: title asc."""
    sim = F.round(
        F.lit(1.0)
        - F.levenshtein(F.lower(F.col(title_col)), F.lit(missed.lower()))
        .cast("double")
        / F.greatest(
            F.length(F.col(title_col)), F.lit(len(missed)), F.lit(1)
        ),
        6,
    )
    return (
        titles.select(F.col(title_col).alias("title"), sim.alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc("title"))
        .limit(n)
    )
