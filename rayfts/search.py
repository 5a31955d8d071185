"""Query path: BM25 top-k over compressed postings + point lookups.

Reference read paths (SURVEY §3.3): order-preserving multiget
(``dao/EntityDao.java:180-248``, order pinned by
``dao/EntityDaoITest.java:266-280``; missing id -> DaoException at 241-243),
count (``integration/PluginIntegrationITest.java:43-45``) and search queries
delegated to ES. Here search is explicit: exact Lucene-style BM25
(k1=1.2, b=0.75) with two interchangeable executors —

  * TAAT ("term-at-a-time"): vectorized numpy accumulator, the executable
    reference implementation;
  * block-max WAND: heap top-k with pivot skipping over the per-block
    (max_tf, min_dl) impact bounds stored by the codec.

Both accumulate per-doc contributions in ascending unique-term order with
float64 throughout, so they are bit-identical to each other and to
``rayfts.oracle.BruteForceIndex`` (the spec). Top-k order:
(score desc, doc_id asc).
"""

from __future__ import annotations

import heapq
import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .build import term_bucket_py
from .codec import decode_blocks, decode_postings
from .manifest import load_manifest

_WORD = re.compile(r"\w+", re.UNICODE)


def tokenize_query(q: str) -> list[str]:
    return _WORD.findall(q.lower())


class Postings:
    __slots__ = ("term", "df", "cf", "doc_ids", "tfs", "blocks")

    def __init__(self, term, df, cf, doc_ids, tfs, blocks):
        self.term, self.df, self.cf = term, df, cf
        self.doc_ids, self.tfs, self.blocks = doc_ids, tfs, blocks


class Searcher:
    """Reader over a published index directory (manifest-gated).

    Designed as the per-actor state of a query actor pool: construct once
    (loads stats + dense norms array, opens the postings dataset), then
    serve many queries. At multi-node scale one Searcher instance serves
    one doc-range segment and a driver merges per-segment top-k heaps; on
    this sandbox a single instance covers the whole index.
    """

    def __init__(self, index_dir: str):
        import os

        self.index_dir = index_dir
        m = load_manifest(index_dir)
        self.manifest = m
        self.N = m["n_docs"]
        self.avgdl = float(m["avgdl"])
        self.k1 = float(m["k1"])
        self.b = float(m["b"])
        self.num_buckets = m["term_buckets"]
        # dense norms: doc_id -> dl (doc_ids are dense 0..N-1 by construction)
        norms = pq.read_table(os.path.join(index_dir, "norms"))
        self.dl = np.zeros(self.N, dtype=np.int32)
        self.dl[norms["doc_id"].to_numpy()] = norms["dl"].to_numpy()
        self._postings_ds = pads.dataset(
            os.path.join(index_dir, "postings"), partitioning="hive"
        )
        self._docstore_dir = os.path.join(index_dir, "docstore")
        self._cache: dict[str, Postings | None] = {}

    # ------------------------------------------------------------------
    # postings access
    # ------------------------------------------------------------------

    def lookup(self, term: str) -> Postings | None:
        if term in self._cache:
            return self._cache[term]
        bucket = term_bucket_py(term, self.num_buckets)
        t = self._postings_ds.to_table(
            filter=(pads.field("bucket") == bucket) & (pads.field("term") == term)
        )
        if t.num_rows == 0:
            self._cache[term] = None
            return None
        row = {c: t[c][0].as_py() for c in ("df", "cf", "doc_bytes", "tf_bytes", "block_bytes")}
        doc_ids, tfs = decode_postings(row["doc_bytes"], row["tf_bytes"])
        p = Postings(
            term, row["df"], row["cf"],
            doc_ids.astype(np.int64), tfs, decode_blocks(row["block_bytes"]),
        )
        self._cache[term] = p
        return p

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------------
    # BM25 search
    # ------------------------------------------------------------------

    def search(self, query: str, k: int = 10, algo: str = "wand"):
        """Top-k [(doc_id, score)] — (score desc, doc_id asc)."""
        if k <= 0:
            return []
        qtf = Counter(tokenize_query(query))
        terms = sorted(qtf)
        plist = [(t, qtf[t], self.lookup(t)) for t in terms]
        plist = [(t, q, p) for t, q, p in plist if p is not None]
        if not plist:
            return []
        if algo == "taat":
            return self._search_taat(plist, k)
        return self._search_wand(plist, k)

    def _term_weight(self, qtf: int, df: int) -> float:
        return qtf * self.idf(df)

    def _search_taat(self, plist, k):
        scores = np.zeros(self.N, dtype=np.float64)
        for term, qn, p in plist:  # ascending term order == oracle order
            w = self._term_weight(qn, p.df)
            tfs = p.tfs.astype(np.float64)
            dls = self.dl[p.doc_ids].astype(np.float64)
            contrib = w * tfs * (self.k1 + 1.0) / (
                tfs + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl)
            )
            scores[p.doc_ids] += contrib
        idx = np.flatnonzero(scores > 0.0)
        sc = scores[idx]
        order = np.lexsort((idx, -sc))[:k]
        return [(int(idx[i]), float(sc[i])) for i in order]

    def _score_one(self, doc_id: int, entries) -> float:
        """Score one doc given [(weight, tf, dl)] in ascending-term order —
        the exact float64 op sequence of the oracle/TAAT."""
        score = 0.0
        for w, tf, dl in entries:
            score += w * tf * (self.k1 + 1.0) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            )
        return score

    def _search_wand(self, plist, k):
        k1, b, avgdl = self.k1, self.b, self.avgdl

        class Cur:
            __slots__ = ("term", "w", "p", "i", "ub")

        curs = []
        for term, qn, p in plist:
            c = Cur()
            c.term, c.p, c.i = term, p, 0
            c.w = self._term_weight(qn, p.df)
            blk = p.blocks
            mt = blk["max_tf"].astype(np.float64)
            md = blk["min_dl"].astype(np.float64)
            ubs = c.w * mt * (k1 + 1.0) / (mt + k1 * (1.0 - b + b * md / avgdl))
            c.ub = float(ubs.max())
            curs.append(c)

        INF = np.iinfo(np.int64).max
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap

        def cur_doc(c):
            return int(c.p.doc_ids[c.i]) if c.i < c.p.doc_ids.size else INF

        def advance_to(c, target):
            # galloping via searchsorted on the remaining postings
            c.i += int(np.searchsorted(c.p.doc_ids[c.i :], target, side="left"))

        slop = 1.0 + 1e-12  # UB sums must never round below a true score
        while True:
            curs.sort(key=lambda c: (cur_doc(c), c.term))
            threshold = heap[0][0] if len(heap) >= k else -1.0
            acc, pivot = 0.0, -1
            for j, c in enumerate(curs):
                if cur_doc(c) == INF:
                    break
                acc += c.ub
                if acc * slop > threshold:
                    pivot = j
                    break
            if pivot < 0:
                break
            pivot_doc = cur_doc(curs[pivot])
            if pivot_doc == INF:
                break
            if cur_doc(curs[0]) == pivot_doc:
                on_doc = [c for c in curs if cur_doc(c) == pivot_doc]
                on_doc.sort(key=lambda c: c.term)
                dl = float(self.dl[pivot_doc])
                entries = [(c.w, float(c.p.tfs[c.i]), dl) for c in on_doc]
                score = self._score_one(pivot_doc, entries)
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                for c in on_doc:
                    c.i += 1
            else:
                # advance the lagging cursor with the largest UB (classic WAND)
                lag = max(
                    (c for c in curs[:pivot] if cur_doc(c) < pivot_doc),
                    key=lambda c: c.ub,
                    default=curs[0],
                )
                advance_to(lag, pivot_doc)

        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [(-d, s) for s, d in out]

    # ------------------------------------------------------------------
    # point lookups / counts (ref: EntityDao.find/findAll, count)
    # ------------------------------------------------------------------

    def get(self, keys: list[tuple]) -> pa.Table:
        """Order-preserving multiget by (conv_id, turn_idx). Missing key ->
        KeyError (analog of DaoException, dao/EntityDao.java:241-243)."""
        conv_ids = list({k[0] for k in keys})
        ds = pads.dataset(self._docstore_dir)
        t = ds.to_table(filter=pads.field("conv_id").isin(conv_ids))
        index = {}
        cid = t["conv_id"].to_pylist()
        tix = t["turn_idx"].to_pylist()
        for i, key in enumerate(zip(cid, tix)):
            index[key] = i
        rows = []
        for key in keys:
            key = (key[0], int(key[1]))
            if key not in index:
                raise KeyError(f"document not found: {key}")
            rows.append(index[key])
        return t.take(pa.array(rows, pa.int64()))

    def get_by_doc_id(self, doc_ids: list[int]) -> pa.Table:
        """Order-preserving multiget by doc_id, partition-pruned via the
        manifest's per-partition doc ranges (lineage metadata)."""
        import os

        wanted = set(int(d) for d in doc_ids)
        parts = [
            p
            for p in self.manifest["docstore"]["partitions"]
            if any(p["min_doc_id"] <= d <= p["max_doc_id"] for d in wanted)
        ]
        tables = []
        for p in parts:
            t = pq.read_table(os.path.join(self.index_dir, p["file"]))
            t = t.filter(pc.is_in(t["doc_id"], pa.array(sorted(wanted), pa.int64())))
            tables.append(t)
        t = pa.concat_tables(tables) if tables else None
        index = {d: i for i, d in enumerate(t["doc_id"].to_pylist())} if t else {}
        rows = []
        for d in doc_ids:
            if int(d) not in index:
                raise KeyError(f"document not found: doc_id={d}")
            rows.append(index[int(d)])
        return t.take(pa.array(rows, pa.int64()))

    def count(self, **equals) -> int:
        """Doc count with optional keyword-column equality filters
        (ref: index count API, PluginIntegrationITest.java:44-45)."""
        if not equals:
            return self.N
        ds = pads.dataset(self._docstore_dir)
        expr = None
        for col, val in equals.items():
            e = pads.field(col) == val
            expr = e if expr is None else (expr & e)
        return ds.count_rows(filter=expr)


class QueryRunner:
    """map_batches actor: batch of query rows -> top-k hit rows.

    The distributed query path: ``ray.data`` dataset of queries ->
    ``map_batches(QueryRunner, concurrency=N)`` — one Searcher per actor
    (state loaded once, SURVEY ST5/actor-pool rule).
    """

    def __init__(self, index_dir: str, k: int = 10, algo: str = "wand"):
        self.searcher = Searcher(index_dir)
        self.k = k
        self.algo = algo

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, queries, ranks, docs, scores = [], [], [], [], []
        for qid, q in zip(batch["query_id"].to_pylist(), batch["query"].to_pylist()):
            for rank, (doc_id, score) in enumerate(
                self.searcher.search(q, k=self.k, algo=self.algo), start=1
            ):
                qids.append(qid)
                queries.append(q)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "query": pa.array(queries, pa.string()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def run_queries(
    index_dir: str,
    queries: list[str],
    k: int = 10,
    algo: str = "wand",
    concurrency=(1, 8),
):
    """Run a query set as a Ray Data pipeline; returns a Dataset of hits."""
    import ray.data as rd

    qds = rd.from_items(
        [{"query_id": i, "query": q} for i, q in enumerate(queries)]
    )
    return qds.map_batches(
        QueryRunner,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "algo": algo},
        batch_format="pyarrow",
        batch_size=max(1, len(queries) // 64) if queries else 1,
        concurrency=concurrency,
    )
