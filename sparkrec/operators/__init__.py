from sparkrec.operators.docs import assemble_docs, assign_doc_ids  # noqa: F401
from sparkrec.operators.bm25 import (  # noqa: F401
    tokenize_docs,
    term_freqs,
    doc_freqs,
    corpus_stats,
    bm25_topk,
    query_terms_df,
)
