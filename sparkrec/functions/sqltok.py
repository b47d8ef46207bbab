"""SQL-parity tokenizer — one definition, two engines.

The engine's native tokenizer (functions/textprep.py) mirrors wikirec's
``clean()`` (reference data_utils.py:670-1008) and is verified against the
pure-Python oracle. The *driver's* correctness gate, however, compares a
Spark DataFrame against DuckDB ANSI SQL via value hashes — so every
oracle-facing query needs a tokenizer whose semantics are expressible
identically in both engines. This module pins that definition:

    tokens(text) = [ t  for t in split(regexp_replace(lower(text),
                                        '[^a-z0-9]+', ' '), ' ')
                     if len(t) >= 2 and not t.isdigit() ]

Both sides use the same regex, the same split, the same filters, so term
sets, TFs, DFs and BM25 scores agree exactly (scores are rounded in the
query output to absorb float summation-order differences across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"
NUMERIC_RE = "^[0-9]+$"
MIN_TOKEN_LEN = 2


def sql_tokenize_expr(col: Column) -> Column:
    """array<string> of SQL-parity tokens — pure Catalyst, codegen'd."""
    toks = F.split(F.regexp_replace(F.lower(col), TOKEN_RE, " "), " ")
    return F.filter(
        toks,
        lambda t: (F.length(t) >= F.lit(MIN_TOKEN_LEN)) & ~t.rlike(NUMERIC_RE),
    )


def duck_tokenize(col_sql: str) -> str:
    """The identical tokenizer as a DuckDB SQL fragment (list<varchar>)."""
    return (
        f"list_filter(string_split(regexp_replace(lower({col_sql}), "
        f"'{TOKEN_RE}', ' ', 'g'), ' '), "
        f"t -> len(t) >= {MIN_TOKEN_LEN} AND NOT regexp_matches(t, '{NUMERIC_RE}'))"
    )


def py_sql_tokenize(s: str) -> list[str]:
    """Python twin for unit tests."""
    import re

    parts = re.sub(TOKEN_RE, " ", s.lower()).split(" ")
    return [
        t
        for t in parts
        if len(t) >= MIN_TOKEN_LEN and not re.match(NUMERIC_RE, t)
    ]
