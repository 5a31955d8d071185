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


def tokenize(text: str) -> list[str]:
    return _WORD.findall(text.lower())


class BruteForceIndex:
    """In-memory reference index over (doc_id -> text)."""

    def __init__(self, docs: dict[int, str], k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
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

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        qtf = Counter(tokenize(query))
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
        hits = sorted(scores.items(), key=lambda it: (-it[1], it[0]))
        return hits[:k]
