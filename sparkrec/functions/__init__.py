from sparkrec.functions.textprep import (  # noqa: F401
    EN_STOPWORDS,
    normalize_expr,
    tokenize_expr,
    references_strip_expr,
    py_normalize_text,
    py_tokenize,
    py_lemma_lite,
    lemmatize_tokens,
)
