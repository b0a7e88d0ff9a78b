"""Multi-pattern substring matching — the 10^5-term blocklist problem.

``blocklist_gate`` (webx/textstats.py) chains per-term ``contains``
calls: perfect codegen for a handful of terms, O(terms × text) and a
codegen-size explosion at dictionary scale (UT1 adult list ~4M hosts,
keyword lists 10^4-10^5 terms). Presence-of-any-term is a classic
automaton problem; two implementations with IDENTICAL semantics
(the set of dictionary terms occurring as substrings, overlaps
included):

* ``impl='regex'`` — one Java-regex lookahead alternation
  ``(?=(t1|t2|…))`` evaluated JVM-side by ``regexp_extract_all``.
  Zero Python, fuses into the scan. The lookahead makes overlapping
  occurrences visible (a plain alternation consumes characters: terms
  ['abc','bcd'] on 'abcd' would miss 'bcd'). Practical to ~10^3-10^4
  terms (regex compile size grows linearly; the JVM handles it but
  compile time and per-char alternation cost climb).

* ``impl='aho'`` — Aho-Corasick (1975): build the goto/fail automaton
  ONCE on the driver (O(Σ term lengths)), ship it to executors inside
  the ``mapInPandas`` closure, scan each text in O(len(text)) total
  regardless of dictionary size. The per-char loop is Python (same
  CPython-floor story as the tokenizer before its C kernel — the
  automaton inner loop is the next ``webx/_ctok.c`` candidate), but
  the ALGORITHMIC scaling is what matters at 10^5 terms: the regex
  path degrades with dictionary size, the automaton does not.

Both return the same frame; tests A/B them on overlapping-term corpora
and the driver oracle checks per-term presence independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class AhoCorasick:
    """Plain-dict Aho-Corasick automaton: ``find_set`` returns the set
    of dictionary terms occurring in a text (overlaps included)."""

    def __init__(self, terms):
        self.terms = list(terms)
        # goto as list of dicts; output as list of frozensets of term ids
        self.goto = [{}]
        self.out = [set()]
        for tid, t in enumerate(self.terms):
            node = 0
            for ch in t:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(set())
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].add(tid)
        # BFS fail links
        from collections import deque

        self.fail = [0] * len(self.goto)
        dq = deque()
        for ch, nxt in self.goto[0].items():
            dq.append(nxt)
        while dq:
            node = dq.popleft()
            for ch, nxt in self.goto[node].items():
                dq.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt] |= self.out[self.fail[nxt]]

    def find_set(self, text: str) -> set:
        node = 0
        hits: set = set()
        for ch in text:
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            if self.out[node]:
                hits |= self.out[node]
        return {self.terms[t] for t in hits}


def multi_term_match(
    docs: DataFrame,
    terms: tuple,
    col: str = "text",
    impl: str = "regex",
) -> DataFrame:
    """Adds ``matched_terms`` (sorted array of dictionary terms present
    as substrings of lower(col), overlaps included) and ``n_matched``.
    Matching is case-insensitive via lowercase on both sides."""
    lterms = tuple(sorted({t.lower() for t in terms}))
    if not lterms:
        raise ValueError("terms must be non-empty")
    if impl == "regex":
        import re as _re

        pat = "(?=(" + "|".join(_re.escape(t) for t in lterms) + "))"
        src = F.lower(F.coalesce(F.col(col), F.lit("")))
        found = F.array_sort(
            F.array_distinct(F.regexp_extract_all(src, F.lit(pat), 1))
        )
        return docs.select(
            "*",
            found.alias("matched_terms"),
            F.size(found).alias("n_matched"),
        )
    if impl == "aho":
        import pandas as pd

        ac = AhoCorasick(lterms)
        out_cols = docs.columns

        def fn(batches):
            for pdf in batches:
                txt = pdf[col].fillna("")
                matched = [sorted(ac.find_set(t.lower())) for t in txt]
                res = pdf[out_cols].copy()
                res["matched_terms"] = matched
                res["n_matched"] = [len(m) for m in matched]
                yield res

        schema_parts = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
        )
        schema = schema_parts + ", matched_terms array<string>, n_matched int"
        return docs.mapInPandas(fn, schema=schema)
    raise ValueError("impl must be 'regex' or 'aho'")
