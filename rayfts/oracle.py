"""Brute-force pure-Python BM25 oracle — the executable spec.

Analog of the reference's golden-output tests (byte-exact JSON at
``dao/EntityDaoITest.java:57,79-81`` etc.): obviously-correct, slow,
~100 LoC. The engine must be rank-identical with scores equal to 1e-9
against this oracle (SURVEY §5) — the sandbox cannot run ES 2.1, so this
file IS the scoring spec.

Spec pinned here:
  tokenize: lowercase, tokens = maximal runs of word chars (``\\w+``).
  dl(d)   = token count of doc d;  avgdl = mean dl;  N = doc count.
  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))          [Lucene BM25]
  score(q,d) = sum over UNIQUE query terms t (ascending term order,
               float64 accumulation in that order):
               qtf(t)*idf(t) * ( tf(t,d)*(k1+1) / (tf(t,d) + k1*(1-b+b*dl/avgdl)) )
  where qtf(t) = multiplicity of t in the query (repeated query terms
  count multiply, like duplicate TermQuery clauses in a BooleanQuery).
  Match semantics: OR — only docs containing >=1 query term are hits.
  top-k order: (score desc, doc_id asc).
"""

from __future__ import annotations

import math
import re
from collections import Counter

_WORD = re.compile(r"\w+", re.UNICODE)
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)$")


def tokenize(text: str) -> list[str]:
    return _WORD.findall(text.lower())


def query_weights(query: str) -> dict[str, float]:
    """Lucene query-string clause boosts, spec form: each whitespace
    clause may end in ``^boost``; every analyzed term of the clause adds
    the boost (1.0 when absent) to its weight. Boost-free queries give
    exactly Counter(tokenize(query)) as floats."""
    qtf: dict[str, float] = {}
    for clause in query.split():
        boost, body = 1.0, clause
        m = _BOOST.search(clause)
        if m:
            boost = float(m.group(1))
            body = clause[: m.start()]
        for t in tokenize(body):
            qtf[t] = qtf.get(t, 0.0) + boost
    return qtf


def levenshtein(a: str, b: str) -> int:
    """Plain-Python edit distance — the executable spec the engine's
    vectorized ``levenshtein_vec`` must agree with."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class BruteForceIndex:
    """In-memory reference index over (doc_id -> text)."""

    def __init__(self, docs: dict[int, str], k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        self.texts: dict[int, str] = dict(docs)
        self.doc_tfs: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, text in docs.items():
            toks = tokenize(text)
            tf = Counter(toks)
            self.doc_tfs[doc_id] = tf
            self.dl[doc_id] = len(toks)
            for term in tf:
                self.df[term] += 1
        self.N = len(docs)
        self.total_dl = sum(self.dl.values())
        self.avgdl = (self.total_dl / self.N) if self.N else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10, mode: str = "or",
               must_not: str | None = None) -> list[tuple[int, float]]:
        """``mode="and"``: hits must contain ALL query terms (ES bool must
        rewrite — scores still sum every term's contribution).
        ``must_not``: drop docs containing ANY of its analyzed terms.
        Clause boosts (``spark^3``) multiply that clause's idf weight."""
        qtf = query_weights(query)
        scores: dict[int, float] = {}
        for term in sorted(qtf):          # fixed accumulation order
            if term not in self.df:
                continue
            w = qtf[term] * self.idf(term)
            for doc_id, tf in self.doc_tfs.items():
                f = tf.get(term, 0)
                if f == 0:
                    continue
                norm = self.k1 * (1.0 - self.b + self.b * self.dl[doc_id] / self.avgdl)
                # op order pinned: w * (tf_part) — tf_part is the
                # query-independent factor the engine precomputes per term
                scores[doc_id] = scores.get(doc_id, 0.0) + w * (
                    f * (self.k1 + 1.0) / (f + norm)
                )
        if mode == "and":
            need = set(qtf)
            scores = {
                d: s for d, s in scores.items()
                if all(self.doc_tfs[d].get(t, 0) > 0 for t in need)
            }
        if must_not:
            ban = set(tokenize(must_not))
            scores = {
                d: s for d, s in scores.items()
                if not any(self.doc_tfs[d].get(t, 0) > 0 for t in ban)
            }
        hits = sorted(scores.items(), key=lambda it: (-it[1], it[0]))
        return hits[:k]

    def search_phrase(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact-phrase (slop=0) spec — the Lucene PhraseQuery analog:
        pf(d) = number of positions where every phrase slot's term appears
        consecutively; W = sum over SLOTS (phrase order, duplicates count
        multiply) of idf(df(slot term));
        score = W * pf*(k1+1)/(pf + k1*(1-b+b*dl/avgdl)).
        Order: (score desc, doc_id asc)."""
        slots = tokenize(phrase)
        if not slots or any(t not in self.df for t in set(slots)):
            return []
        W = 0.0
        for t in slots:  # slot order — the engine accumulates identically
            W += self.idf(t)
        hits = []
        for doc_id, text in self.texts.items():
            toks = tokenize(text)
            pf = sum(
                1
                for s in range(len(toks) - len(slots) + 1)
                if toks[s : s + len(slots)] == slots
            )
            if pf == 0:
                continue
            norm = self.k1 * (1.0 - self.b + self.b * self.dl[doc_id] / self.avgdl)
            hits.append((doc_id, W * (pf * (self.k1 + 1.0) / (pf + norm))))
        hits.sort(key=lambda it: (-it[1], it[0]))
        return hits[:k]

    def prefix_docs(self, prefix: str, limit: int = 20) -> list[tuple[int, int]]:
        """ES prefix-query analog (constant-score rewrite over the expanded
        term set): (doc_id, number of DISTINCT matching terms in the doc),
        ascending doc_id, first ``limit`` docs."""
        terms = {t for t in self.df if t.startswith(prefix)}
        return self._docs_for_terms(terms, limit)

    def wildcard_docs(self, pattern: str, limit: int = 20) -> list[tuple[int, int]]:
        """ES wildcard-query spec: anchored glob, ``*`` = any run
        (incl. empty), ``?`` = exactly one char, all else literal."""
        import re as _re

        rx = _re.compile(
            "^"
            + "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in pattern
            )
            + "$"
        )
        terms = {t for t in self.df if rx.match(t)}
        return self._docs_for_terms(terms, limit)

    def _docs_for_terms(self, terms: set, limit: int) -> list[tuple[int, int]]:
        out = []
        for doc_id in sorted(self.doc_tfs):
            n = sum(1 for t in self.doc_tfs[doc_id] if t in terms)
            if n:
                out.append((doc_id, n))
        return out[:limit]

    def expand_fuzzy(self, term: str, max_edits: int = 1,
                     prefix_length: int = 0,
                     max_expansions: int = 50) -> list[tuple[str, int]]:
        """FuzzyQuery expansion spec: vocabulary terms within
        ``max_edits`` Levenshtein distance (exact-prefix ``prefix_length``
        chars required), closest-first then lexicographic, truncated to
        ``max_expansions``."""
        q = tokenize(term)[0]
        hits = []
        for t in self.df:
            if prefix_length and not t.startswith(q[:prefix_length]):
                continue
            if abs(len(t) - len(q)) > max_edits:
                continue
            d = levenshtein(q, t)
            if d <= max_edits:
                hits.append((d, t))
        hits.sort()
        return [(t, d) for d, t in hits[:max_expansions]]

    def fuzzy_docs(self, term: str, max_edits: int = 1, limit: int = 20,
                   prefix_length: int = 0,
                   max_expansions: int = 50) -> list[tuple[int, int]]:
        exp = self.expand_fuzzy(term, max_edits, prefix_length, max_expansions)
        return self._docs_for_terms({t for t, _ in exp}, limit)
