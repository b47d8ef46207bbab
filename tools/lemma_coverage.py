#!/usr/bin/env python
"""Quantify the rule-lemmatizer's behavior over the full testdata
vocabulary (VERDICT r3 next-round #7: publish the divergence BOUND, not
spaCy parity — no spaCy model ships in this container).

For every distinct corpus token (all /root/testdata/*/documents.parquet,
engine tokenization), classify:

- ``exception``: resolved by the irregular dictionary,
- ``rule``: changed by an AGID-style inflection rule,
- ``unchanged``: left as-is.

The divergence bound is the ``unchanged ∧ stem-changed`` bucket: tokens
the conservative lemmatizer keeps but Snowball would reduce — the
superset of tokens where spaCy COULD disagree with us (spaCy can also
disagree inside `rule`, but those families are golden-tested). Prints a
markdown table for COVERAGE.md plus the most frequent bound tokens.

    python tools/lemma_coverage.py
"""

from __future__ import annotations

import glob
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from sparkrec.functions.lemma import _EXCEPTIONS, lemma_en
    from sparkrec.functions.sqltok import duck_tokenize
    from sparkrec.functions.stem import snowball_en

    con = duckdb.connect()
    freq: Counter[str] = Counter()
    for path in sorted(glob.glob("/root/testdata/*/documents.parquet")):
        q = (
            f"SELECT t, count(*) FROM (SELECT unnest({duck_tokenize('text')})"
            f" AS t FROM read_parquet('{path}')) GROUP BY t"
        )
        for t, c in con.execute(q).fetchall():
            freq[t] += c

    vocab = sorted(freq)
    n_exc = n_rule = n_unchanged = 0
    occ_exc = occ_rule = occ_unchanged = 0
    bound: list[tuple[int, str, str]] = []  # (occurrences, token, stem)
    agree = 0
    for t in vocab:
        lem = lemma_en(t)
        stem = snowball_en(t)
        if t in _EXCEPTIONS:
            n_exc += 1
            occ_exc += freq[t]
        elif lem != t:
            n_rule += 1
            occ_rule += freq[t]
        else:
            n_unchanged += 1
            occ_unchanged += freq[t]
            if stem != t:
                bound.append((freq[t], t, stem))
        if lem == stem:
            agree += 1

    total = len(vocab)
    occ_total = sum(freq.values())
    bound.sort(reverse=True)
    bound_occ = sum(c for c, _, _ in bound)

    def pct(a, b):
        return f"{100.0 * a / b:.2f}%" if b else "n/a"

    print(f"vocabulary: {total} distinct tokens, {occ_total} occurrences")
    print()
    print("| bucket | vocab share | occurrence share |")
    print("|---|---|---|")
    print(f"| exception-dict hit | {n_exc} ({pct(n_exc, total)}) "
          f"| {pct(occ_exc, occ_total)} |")
    print(f"| rule-family change | {n_rule} ({pct(n_rule, total)}) "
          f"| {pct(occ_rule, occ_total)} |")
    print(f"| unchanged | {n_unchanged} ({pct(n_unchanged, total)}) "
          f"| {pct(occ_unchanged, occ_total)} |")
    print(f"| divergence bound (unchanged ∧ stem-changed) | {len(bound)} "
          f"({pct(len(bound), total)}) | {pct(bound_occ, occ_total)} |")
    print(f"| lemma == stem (engines agree outright) | {agree} "
          f"({pct(agree, total)}) | |")
    print()
    print("top divergence-bound tokens (occurrences, token, snowball stem):")
    for c, t, s in bound[:25]:
        print(f"  {c:>8}  {t}  ->  {s}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
