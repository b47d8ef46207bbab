"""``clean()`` — the reference's flagship preprocessing API, end-to-end.

Reference: ``wikirec.data_utils.clean(texts, ...)``
(/root/reference/src/wikirec/data_utils.py:670-1008) — seven sequential
full-corpus passes. Spark restatement (SURVEY.md §3.2): one lazy
DataFrame DAG with two corpus-level aggregation jobs (phrase mining,
document frequency) feeding broadcast rewrites; everything else is
Catalyst column expressions or one vectorized Arrow stage (stemming).

Stage map (reference line numbers):

1-2. normalize + tokenize (759-812)      → textprep column expressions
3. n-gram mine + greedy rewrite (817-864)→ operators/phrases.py
4. lower/remove unwanted (876-887)       → lower_remove_unwanted_expr
5. lemma→stem→identity chain (893-940)   → functions/languages.base_form_mode
                                           + functions/stem.stem_tokens
6. DF count + min-freq/min-len (945-969) → ``vocab_min_freq_filter`` (A2)
7. min-tokens filter (976-978), truncate (981-991), seeded sample
   (995-1005)                            → filter + slice + operators/sample

Key semantic rewrites for distribution (SURVEY.md §1.1):

- document identity is the explicit ``id_col``, never list position;
  the returned DataFrame IS both ``text_corpus`` and ``selected_idxs``.
- the min-tokens filter is STRICT ``>`` (reference :977).
- ``max_token_index`` keeps Python slice semantics, including the
  default ``-1`` which drops the LAST token (reference :987 quirk,
  textprep.subset_and_combine_expr).
- ``original_len`` for the sample target is the PRE-filter corpus size
  (reference :983) — computed only when ``sample_size < 1`` (the
  ``sample_size=1`` default short-circuits with zero extra actions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrec.functions.languages import base_form_mode
from sparkrec.functions.textprep import (
    lower_remove_unwanted_expr,
    normalize_expr,
)


@dataclass
class CleanConfig:
    """Canonical parameter set (examples/rec_books.ipynb cell 14 uses
    min_token_freq=5, min_token_len=3, min_tokens=50, sample_size=1)."""

    language: str = "en"
    min_token_freq: int = 2
    min_token_len: int = 3
    min_tokens: int = 0
    max_token_index: int = -1
    min_ngram_count: int = 3
    phrase_threshold: float = 5.0
    mine_phrases: bool = True
    mine_trigrams: bool = True
    remove_stopwords: bool = True
    ignore_words: list[str] = field(default_factory=list)
    remove_names: bool = False
    names: list[str] = field(default_factory=list)
    sample_size: float = 1.0
    seed: int = 42
    vocab_broadcast: bool = True


def vocab_min_freq_filter(
    doc_tokens: DataFrame,
    min_token_freq: int = 2,
    min_token_len: int = 3,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    vocab_broadcast: bool = True,
) -> DataFrame:
    """A2 (reference data_utils.py:945-969): corpus document frequency →
    keep tokens with ``df >= min_token_freq`` and
    ``len >= min_token_len``, preserving in-document order; documents
    whose tokens are all dropped survive with an empty array (the
    min-tokens stage decides their fate, as in the reference).

    Plan: DF is one explode+hash-agg job (distinct-per-doc semantics,
    ``set(tokens)`` at reference :947). The rewrite is
    posexplode → join the kept-vocabulary on ``term`` → regroup by doc
    with in-group position sort. The vocabulary side is
    dimension-table-sized after the frequency cut, so it broadcasts by
    default; at extreme vocabularies pass ``vocab_broadcast=False`` for
    a shuffle-hash join on term. Order restoration happens inside the
    regroup aggregation buffer (``array_sort`` on (pos, term) structs) —
    never a global sort.
    """
    df_tab = (
        doc_tokens.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.col(tokens_col))).alias("term"),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    kept_vocab = df_tab.filter(F.col("df") >= min_token_freq).select("term")
    if vocab_broadcast:
        kept_vocab = F.broadcast(kept_vocab)

    pos = doc_tokens.select(
        F.col(id_col),
        F.posexplode(F.col(tokens_col)).alias("pos", "term"),
    ).filter(F.length("term") >= min_token_len)
    regrouped = (
        pos.join(kept_vocab, "term")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ).alias("_kept")
        )
    )
    return (
        doc_tokens.drop(tokens_col)
        .join(regrouped, id_col, "left")
        .withColumn(
            tokens_col,
            F.coalesce(F.col("_kept"), F.array().cast("array<string>")),
        )
        .drop("_kept")
    )


def clean_tokens(
    doc_tokens: DataFrame,
    cfg: CleanConfig | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    stop_words: list[str] | None = None,
) -> DataFrame:
    """Stages 3-7 over an already-tokenized corpus.

    Returns the selected documents: (``id_col``, ``tokens``, ``doc_len``)
    — tokens kept as an array (join to a string only at API edges,
    SURVEY.md §1.1).
    """
    cfg = cfg or CleanConfig()
    stop_words = list(stop_words or [])

    toks = doc_tokens.select(
        F.col(id_col), F.col(tokens_col).alias("tokens")
    )

    # 3. phrase mining + greedy rewrite (corpus aggregate → broadcast)
    if cfg.mine_phrases:
        from sparkrec.operators.phrases import mine_and_rewrite

        toks = mine_and_rewrite(
            toks,
            min_count=cfg.min_ngram_count,
            threshold=cfg.phrase_threshold,
            trigrams=cfg.mine_trigrams,
            tokens_col="tokens",
            id_col=id_col,
            # the reference passes its stopword list to BOTH Phrases
            # passes (data_utils.py:823/:830), independent of whether
            # stopwords are later removed in stage 4
            connector_words=stop_words,
        )

    # 4. unwanted-token drop + lowercase (pre-lowercase membership order)
    toks = toks.withColumn(
        "tokens",
        lower_remove_unwanted_expr(
            F.col("tokens"),
            remove_names=cfg.remove_names,
            words_to_ignore=cfg.ignore_words,
            stop_words=stop_words if cfg.remove_stopwords else [],
            names=cfg.names,
        ),
    )

    # 5. base form: lemma → stem → identity (driver picks the mode once)
    mode, resolved = base_form_mode(cfg.language)
    if mode == "stem" and resolved == "english":
        from sparkrec.functions.stem import stem_tokens

        toks = stem_tokens(toks, "tokens")

    # 6. corpus DF → min-freq + min-len token filter (A2)
    toks = vocab_min_freq_filter(
        toks,
        min_token_freq=cfg.min_token_freq,
        min_token_len=cfg.min_token_len,
        tokens_col="tokens",
        id_col=id_col,
        vocab_broadcast=cfg.vocab_broadcast,
    )

    # 7. min-tokens (STRICT >), truncate, sample
    if cfg.sample_size < 1.0:
        original_len = toks.count()  # pre-filter size (reference :983)
    selected = toks.filter(F.size("tokens") > cfg.min_tokens)

    mti = cfg.max_token_index
    if mti >= 0:
        sliced = F.slice("tokens", 1, mti)
    else:
        sliced = F.slice(
            "tokens", 1, F.greatest(F.size("tokens") + F.lit(mti), F.lit(0))
        )
    selected = selected.withColumn("tokens", sliced).withColumn(
        "doc_len", F.size("tokens")
    )

    if cfg.sample_size < 1.0:
        from sparkrec.operators.sample import sample_fraction

        selected = sample_fraction(
            selected, cfg.sample_size, original_len, cfg.seed, id_col
        )
    return selected


def clean(
    docs: DataFrame,
    cfg: CleanConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    stop_words: list[str] | None = None,
) -> DataFrame:
    """The full reference pipeline from raw text.

    Tokenization preserves case (reference stages 1-2 don't lowercase —
    lowering happens per-token in stage 4, AFTER phrase mining, so
    phrases are mined on surface forms exactly as gensim sees them)."""
    cfg = cfg or CleanConfig()
    doc_tokens = docs.select(
        F.col(id_col),
        F.split(
            normalize_expr(F.col(text_col), lowercase=False), r"\s+"
        ).alias("tokens"),
    ).withColumn("tokens", F.filter("tokens", lambda t: t != F.lit("")))
    return clean_tokens(doc_tokens, cfg, "tokens", id_col, stop_words)
