"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per Arrow batch against a
broadcast query matrix (`ray.put` once, read per actor — never re-shipped
per batch). Scale path: LSH-bucketed variant (random-hyperplane signs)
that prunes candidates before exact scoring.

Top-k protocol: per-batch local top-k, then a driver-side merge of the
small candidate tables — no global sort shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


class CosineScorer:
    """Actor stage: query matrix fetched from the object store ONCE per actor."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)
        if self.q.ndim == 1:
            self.q = self.q[None, :]
        self.qnorm = np.sqrt((self.q * self.q).sum(axis=1))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col)
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        sims = (m @ self.q.T) / (norms[:, None] * self.qnorm[None, :])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            take = min(self.k, s.size)
            part = np.argpartition(-s, take - 1)[:take] if take else []
            for j in part:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_sim.append(float(s[j]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine_sim": pa.array(out_sim, pa.float64()),
            }
        )


def knn_cosine(
    ds: rd.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> pa.Table:
    """Exact brute-force cosine top-k for each query row.

    Returns pa.Table(query_idx, vec_id, cosine_sim) with exactly k rows per
    query, ordered (query_idx, sim desc, vec_id asc).
    """
    query_ref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    cands = ds.map_batches(
        CosineScorer,
        fn_constructor_kwargs={
            "query_ref": query_ref,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    t = pa.concat_tables([t for t in ray.get(cands.to_arrow_refs()) if t.num_rows])
    qs = t["query_idx"].to_numpy()
    sims = t["cosine_sim"].to_numpy()
    ids = t["vec_id"].to_numpy()
    order = np.lexsort((ids, -sims, qs))
    out_rows = []
    seen: dict[int, int] = {}
    for i in order:
        q = int(qs[i])
        if seen.get(q, 0) < k:
            seen[q] = seen.get(q, 0) + 1
            out_rows.append(i)
    t = t.take(pa.array(out_rows, pa.int64()))
    return t


class HyperplaneLSH:
    """Scale path: random-hyperplane sign buckets; candidates only from the
    query's bucket (and optionally neighboring buckets by Hamming radius)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        weights = (1 << np.arange(self.planes.shape[0])).astype(np.int64)
        return signs.astype(np.int64) @ weights


def knn_cosine_lsh(
    ds: rd.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: score only vectors whose LSH bucket matches the
    query's. Recall depends on n_planes; exactness is NOT claimed (use
    knn_cosine for the exact baseline)."""
    q = np.asarray(query_vec, dtype=np.float64)
    lsh = HyperplaneLSH(q.shape[-1], n_planes)
    qb = int(lsh.bucket(q[None, :])[0])

    def filter_bucket(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        keep = lsh.bucket(m) == qb
        return batch.filter(pa.array(keep))

    filtered = ds.map_batches(filter_bucket, batch_format="pyarrow")
    return knn_cosine(filtered, q, k=k, id_col=id_col, vec_col=vec_col)


def embedding_near_dup(
    ds: rd.Dataset,
    threshold: float = 0.98,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Embedding-cosine near-duplicate clusters: hyperplane-LSH buckets ->
    in-bucket exact cosine >= threshold pairs -> driver union-find.
    Returns pa.Table(vec_id, cluster_id); cluster = min vec_id of the
    component. Candidates only form within a bucket (documented recall
    limit of single-table LSH; raise n_planes tables for higher recall)."""
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    lsh = HyperplaneLSH(dim, n_planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        return pa.table(
            {
                "bucket": pa.array(lsh.bucket(m), pa.int64()),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        m = _batch_matrix(group, vec_col)
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        sims = (m @ m.T) / (norms[:, None] * norms[None, :])
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        return pa.table(
            {
                "a": pa.array(ids[iu[keep]], pa.int64()),
                "b": pa.array(ids[ju[keep]], pa.int64()),
            }
        )

    pair_tables = [
        t
        for t in ray.get(
            bucketed.groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx > ry:
                rx, ry = ry, rx
            parent[ry] = rx

    for t in pair_tables:
        for a, b in sorted(zip(t["a"].to_pylist(), t["b"].to_pylist())):
            union(a, b)
    all_ids = sorted(r[id_col] for r in ds.select_columns([id_col]).take_all())
    return pa.table(
        {
            id_col: pa.array(all_ids, pa.int64()),
            "cluster_id": pa.array([find(d) for d in all_ids], pa.int64()),
        }
    )


class IVFQuantizer:
    """Coarse quantizer for IVF-style ANN: deterministic numpy k-means on a
    driver-side sample (seeded init, fixed iterations). Centroids are
    broadcast via ray.put; assignment is a vectorized matmul per batch."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (C, dim), L2-normalized

    @staticmethod
    def train(sample: np.ndarray, n_centroids: int = 16, iters: int = 10,
              seed: int = 5) -> "IVFQuantizer":
        rng = np.random.default_rng(seed)
        x = np.asarray(sample, dtype=np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = x / norms
        init = rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]),
                          replace=False)
        c = x[np.sort(init)].copy()
        for _ in range(iters):
            assign = (x @ c.T).argmax(axis=1)  # cosine on normalized vecs
            for j in range(c.shape[0]):
                members = x[assign == j]
                if members.size:
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        c[j] = m / n
        return IVFQuantizer(c)

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return ((vecs / norms) @ self.centroids.T).argmax(axis=1)

    def probe(self, query: np.ndarray, nprobe: int) -> np.ndarray:
        q = np.asarray(query, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        sims = self.centroids @ q
        return np.argsort(-sims)[:nprobe]


def knn_cosine_ivf(
    ds: rd.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-style approximate top-k: train a coarse quantizer on a sample,
    keep only vectors whose centroid is among the query's ``nprobe``
    nearest, exact-score the survivors. nprobe == n_centroids -> exact
    (scans everything); smaller nprobe trades recall for a ~C/nprobe scan
    reduction — the scale path for 10^9+ vectors (per-centroid partition
    files + probe-pruned reads)."""
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    quant = IVFQuantizer.train(sample, n_centroids)
    probes = set(int(p) for p in quant.probe(query_vec, nprobe))
    quant_ref = ray.put(quant.centroids)

    class ProbeFilter:
        def __init__(self, ref, probes):
            self.quant = IVFQuantizer(ref if isinstance(ref, np.ndarray) else ray.get(ref))
            self.probes = probes

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch, vec_col)
            keep = np.isin(self.quant.assign(m), list(self.probes))
            return batch.filter(pa.array(keep))

    filtered = ds.map_batches(
        ProbeFilter,
        fn_constructor_kwargs={"ref": quant_ref, "probes": probes},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return knn_cosine(filtered, np.asarray(query_vec, dtype=np.float64), k=k,
                      id_col=id_col, vec_col=vec_col)
