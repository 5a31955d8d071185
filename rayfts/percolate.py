"""Percolator — the ES percolate-query analog (reverse search).

ES stores queries in a percolator index and matches INCOMING documents
against them; the canonical use here is streaming classification — route
every new transcript turn to the registered alert/routing queries it
matches, without building an index over the stream. Ref analog: the
plugin pushes documents INTO the same ES node that serves percolation;
this engine re-expresses the matcher as a vectorized batch kernel plus a
Ray Data actor-pool stage (``PercolateRunner`` in ``map_batches`` — the
query registry loads once per actor, batches stream through).

Supported query surface (documented subset of the ES percolator, which
accepts arbitrary queries): analyzed term queries with ``mode`` "or"
(default, ES should/match semantics: >= 1 distinct term) or "and" (ES
bool.must: every distinct term), exact-adjacency PHRASE queries
(``{"phrase": "a b"}`` — term prefilter then one vectorized
position-key adjacency pass over the whole batch, the match_phrase
percolation case), plus ``must_not`` (no banned term) and ``min_match``
(explicit minimum_should_match count overriding mode). The SAME
analyzer runs over incoming docs as over queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .search import tokenize_query


class Percolator:
    """Registered-query matcher.

    Registration builds term -> query-id arrays once (the inverted index
    OVER QUERIES — percolation's core trick); ``percolate_table`` then
    matches a whole Arrow batch vectorized: one analyzer pass, one
    distinct-(doc, term) reduction, one bincount per candidate term run.
    The per-TERM Python loop touches only batch-vocabulary terms that
    some registered query mentions (dict-gated), never per row.
    """

    def __init__(self, queries: dict[str, dict], stopwords=()):
        if not queries:
            raise ValueError("percolator needs at least one query")
        self.query_ids = sorted(queries)
        qidx = {q: i for i, q in enumerate(self.query_ids)}
        self.req = np.zeros(len(self.query_ids), dtype=np.int64)
        self.term_qids: dict[str, list[int]] = {}
        self.term_bans: dict[str, list[int]] = {}
        stops = frozenset(stopwords)
        self.phrases: dict[int, list[tuple[str, int]]] = {}
        for qid, spec in queries.items():
            if "phrase" in spec:
                if "query" in spec:
                    raise ValueError(
                        f"query {qid!r}: phrase and query are exclusive"
                    )
                # stop slots drop but their positions stay as GAPS —
                # the same enablePositionIncrements semantics as
                # search_phrase (shifts rebased to the first survivor)
                pairs = [
                    (t, i)
                    for i, t in enumerate(tokenize_query(spec["phrase"]))
                    if t not in stops
                ]
                if not pairs:
                    raise ValueError(f"query {qid!r} analyzes to no terms")
                pairs = [(t, s - pairs[0][1]) for t, s in pairs]
                toks = sorted({t for t, _ in pairs})
                # prefilter: every slot term present; adjacency verified
                # in ONE batch-wide position-key pass afterwards
                self.phrases[qidx[qid]] = pairs
                req = len(toks)
            else:
                toks = sorted(
                    t for t in set(tokenize_query(spec["query"]))
                    if t not in stops
                )
                if not toks:
                    raise ValueError(f"query {qid!r} analyzes to no terms")
                mode = spec.get("mode", "or")
                if mode not in ("or", "and"):
                    raise ValueError(
                        f"unknown mode {mode!r} for query {qid!r}"
                    )
                req = spec.get("min_match", len(toks) if mode == "and" else 1)
                if not 1 <= req <= len(toks):
                    raise ValueError(f"min_match out of range for {qid!r}")
            self.req[qidx[qid]] = req
            for t in toks:
                self.term_qids.setdefault(t, []).append(qidx[qid])
            # must_not runs through the same analyzer: a banned stopword
            # has no postings index-side, so it bans nothing here either
            for t in sorted(
                set(tokenize_query(spec.get("must_not", ""))) - stops
            ):
                self.term_bans.setdefault(t, []).append(qidx[qid])
        # every term any query mentions — the O(registry) scan list
        self.reg_terms = sorted(set(self.term_qids) | set(self.term_bans))
        self.nq = len(self.query_ids)

    def percolate_table(self, batch: pa.Table,
                        text_col: str = "text",
                        id_col: str | None = None) -> pa.Table:
        """Match every row of ``batch`` against the registered queries.

        Returns a table (row matches explode) with columns ``query_id``
        plus either ``row`` (batch-local row index) or, when ``id_col``
        is given, that column's value — ordered (row asc, query_id asc),
        the deterministic layout the oracle replicates."""
        from .analysis import tokens_flat

        texts = batch[text_col]
        texts = texts.combine_chunks() if isinstance(
            texts, pa.ChunkedArray
        ) else texts
        ndocs = len(texts)
        flat, parent = tokens_flat(texts)
        hit_doc: list[np.ndarray] = []
        hit_qid: list[np.ndarray] = []
        ban_doc: list[np.ndarray] = []
        ban_qid: list[np.ndarray] = []
        reg_codes: dict[str, int] = {}
        if len(flat):
            denc = pc.dictionary_encode(flat)
            tidx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            # distinct (term, doc) pairs, term-major -> contiguous runs
            pair = np.unique(tidx * ndocs + parent)
            t_arr, d_arr = pair // ndocs, pair % ndocs
            # O(registry) scan: locate ONLY registered terms in the batch
            # dictionary (pc.index_in), then slice each term's doc run
            # with two searchsorteds — batch vocabulary size never enters
            hits_idx = pc.index_in(
                pa.array(self.reg_terms, pa.string()),
                value_set=denc.dictionary,
            ).to_pylist()
            for term, code in zip(self.reg_terms, hits_idx):
                if code is None:
                    continue
                reg_codes[term] = int(code)
                lo = int(np.searchsorted(t_arr, code))
                hi = int(np.searchsorted(t_arr, code, side="right"))
                if lo == hi:
                    continue
                docs = d_arr[lo:hi]
                qs = self.term_qids.get(term)
                if qs:
                    hit_doc.append(np.repeat(docs, len(qs)))
                    hit_qid.append(np.tile(np.asarray(qs, np.int64),
                                           docs.size))
                bs = self.term_bans.get(term)
                if bs:
                    ban_doc.append(np.repeat(docs, len(bs)))
                    ban_qid.append(np.tile(np.asarray(bs, np.int64),
                                           docs.size))
        if hit_doc:
            key = np.concatenate(hit_doc) * self.nq + np.concatenate(hit_qid)
            ukey, cnt = np.unique(key, return_counts=True)
            match = cnt >= self.req[ukey % self.nq]
            ukey = ukey[match]
            if ban_doc:
                bkey = np.unique(
                    np.concatenate(ban_doc) * self.nq
                    + np.concatenate(ban_qid)
                )
                ukey = ukey[~np.isin(ukey, bkey)]
            if self.phrases and ukey.size:
                pos = self._pos_in_doc(parent)
                for qx, pairs in self.phrases.items():
                    pd = self._phrase_docs(pairs, tidx, parent, pos, reg_codes)
                    is_q = (ukey % self.nq) == qx
                    ukey = ukey[~is_q | np.isin(ukey // self.nq, pd)]
            rows = ukey // self.nq
            qids = ukey % self.nq
        else:
            rows = qids = np.empty(0, dtype=np.int64)
        qcol = pa.array(
            [self.query_ids[int(q)] for q in qids], pa.string()
        )
        if id_col is not None:
            ids = batch[id_col].combine_chunks() if isinstance(
                batch[id_col], pa.ChunkedArray
            ) else batch[id_col]
            return pa.table(
                {id_col: ids.take(pa.array(rows)), "query_id": qcol}
            )
        return pa.table(
            {"row": pa.array(rows, pa.int64()), "query_id": qcol}
        )


    @staticmethod
    def _pos_in_doc(parent: np.ndarray) -> np.ndarray:
        """Within-doc position of every token (tokens arrive doc-major
        from the analyzer) — one diff + segmented subtraction."""
        from .codec import run_spread

        n = parent.size
        if n == 0:
            return np.empty(0, np.int64)
        run_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(parent)) + 1]
        ).astype(np.int64)
        return np.arange(n, dtype=np.int64) - run_spread(
            run_starts, run_starts, n
        )

    def _phrase_docs(self, pairs: list[tuple[str, int]], tidx: np.ndarray,
                     parent: np.ndarray, pos: np.ndarray,
                     reg_codes: dict) -> np.ndarray:
        """Batch rows where the slot pairs (term, shift) occur at their
        RELATIVE positions (gaps from dropped stopwords included): the
        _phrase_freqs position-key pattern applied to the incoming
        batch's token stream (one isin per slot — no per-row Python).
        Batch positions are unfiltered, so index-side gap semantics line
        up exactly."""
        codes = [reg_codes.get(t, -1) for t, _ in pairs]
        if any(c < 0 for c in codes):
            return np.empty(0, np.int64)
        max_shift = pairs[-1][1]
        L = int(np.bincount(parent).max()) + max_shift + 2
        key = parent.astype(np.int64) * L + pos
        k0 = key[tidx == codes[0]]
        surv = np.ones(k0.size, dtype=bool)
        for (t, shift), c in list(zip(pairs, codes))[1:]:
            surv &= np.isin(k0 + shift, key[tidx == c])
            if not surv.any():
                return np.empty(0, np.int64)
        return np.unique(k0[surv] // L)


class PercolateRunner:
    """Ray Data actor-pool stage: registry built once per actor
    (``__init__``), batches stream through ``__call__`` — route a corpus
    (or a live stream) to matching queries with
    ``ds.map_batches(PercolateRunner, fn_constructor_kwargs=...,
    batch_format="pyarrow", concurrency=N)``."""

    def __init__(self, queries: dict[str, dict], text_col: str = "text",
                 id_col: str | None = None, stopwords=()):
        self.perc = Percolator(queries, stopwords=stopwords)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.perc.percolate_table(
            batch, text_col=self.text_col, id_col=self.id_col
        )
