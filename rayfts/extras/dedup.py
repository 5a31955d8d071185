"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard.

Scale design notes (100 TB):
  * exact: content hash computed map-side (vectorized), then a
    hash-partitioned groupby keeps min doc_id per hash — the only shuffle
    moves (hash, doc_id) pairs, never text.
  * minhash-LSH: shingle->minhash signatures map-side; the shuffle moves
    (band_id, band_hash, doc_id) rows; candidate verification re-reads only
    candidate docs; union-find runs on the driver over the candidate PAIRS
    only (assumption: near-dup pairs << corpus — documented, standard for
    LSH dedup; if violated, swap the driver union-find for iterative
    min-label propagation via groupby).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..analysis import tokenize


def _md5_hex(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup keyed on content hash; keeps the smallest id per group.

    Reference analog: ES index-by-_id upsert idempotency
    (dao/EntityDao.java:96,114) — same content collapses to one doc.
    Returns Dataset(text_hash, keep_doc_id, dup_cnt).
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_hash": pa.array(_md5_hex(batch[text_col].to_pylist())),
                id_col: batch[id_col],
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        return pa.table(
            {
                "text_hash": group["text_hash"].slice(0, 1),
                "keep_doc_id": pa.array([int(ids.min())], pa.int64()),
                "dup_cnt": pa.array([len(ids)], pa.int64()),
            }
        )

    return hashed.groupby("text_hash").map_groups(keep_min, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Word k-shingles -> stable 64-bit hashes (md5-derived, python-hash-free)."""
    if len(tokens) < k:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in set(shingles)
        ),
        dtype=np.uint64,
    )
    return out


class MinHasher:
    """Actor-pool stage: permutation params built once per actor (ST1 rule)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, bands: int = 8):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.num_perm, self.k, self.bands = num_perm, shingle_k, bands
        self.rows_per_band = num_perm // bands

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = shingle_hashes(tokens, self.k)
        if sh.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # sig[p] = min over shingles of (a_p * x + b_p) mod M  (uint64 wrap is
        # fine for min-stability as long as it is deterministic — it is)
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """batch(doc_id, text) -> (band_id, band_hash, doc_id) rows."""
        token_lists = tokenize(batch["text"]).to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        band_ids, band_hashes, out_docs = [], [], []
        for doc_id, toks in zip(doc_ids, token_lists):
            toks = [t for t in toks if t]
            sig = self.signature(toks)
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                band_hashes.append(hash_band(chunk))
                band_ids.append(bnd)
                out_docs.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(out_docs, pa.int64()),
            }
        )


def hash_band(chunk: np.ndarray) -> int:
    h = hashlib.md5(chunk.tobytes()).digest()[:8]
    return int.from_bytes(h, "little", signed=True)


def jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa = set(shingle_hashes(tokens_a, k).tolist())
    sb = set(shingle_hashes(tokens_b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.8,
    concurrency=(1, 4),
):
    """Near-dedup clusters. Returns pa.Table(doc_id, cluster_id) where
    cluster_id = min doc_id of the connected component (docs with no
    near-dup map to themselves).

    Pipeline: map_batches(MinHasher actor) -> groupby(band) -> candidate
    pairs -> exact Jaccard verify (re-reads only candidate texts) ->
    driver union-find over verified pairs.
    """
    if text_col != "text" or id_col != "doc_id":
        ds = ds.map_batches(
            lambda t: pa.table({"doc_id": t[id_col], "text": t[text_col]}),
            batch_format="pyarrow",
        )
    bands_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        lo, hi = [], []
        anchor = ids[0]
        for other in ids[1:]:  # star pairs suffice for connectivity
            lo.append(anchor)
            hi.append(other)
        return pa.table({"a": pa.array(lo, pa.int64()), "b": pa.array(hi, pa.int64())})

    pairs = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray as _ray

    pair_tables = [t for t in _ray.get(pairs) if t.num_rows]
    cand = set()
    for t in pair_tables:
        cand.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))

    # verify candidates with exact shingle Jaccard
    need_ids = sorted({d for p in cand for d in p})
    texts: dict[int, list[str]] = {}
    if need_ids:
        id_arr = pa.array(need_ids, pa.int64())
        sub = ds.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t["doc_id"], value_set=id_arr)
            ),
            batch_format="pyarrow",
        ).take_all()
        for row in sub:
            toks = [t for t in tokenize(pa.array([row["text"]]))[0].as_py() if t]
            texts[row["doc_id"]] = toks

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

    for a, b in sorted(cand):
        if a in texts and b in texts and jaccard(texts[a], texts[b], shingle_k) >= threshold:
            union(a, b)

    all_ids = [r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all()]
    return pa.table(
        {
            "doc_id": pa.array(sorted(all_ids), pa.int64()),
            "cluster_id": pa.array(
                [find(d) for d in sorted(all_ids)], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: 64-bit SimHash over token crc32-derived hashes.

    sig bit b = sign of sum over tokens of tf * (+1 if bit b of h(token)
    else -1). Near-dup candidates = docs sharing a 16-bit band (4 bands),
    verified by Hamming distance <= ``max_hamming``.
    """

    def __init__(self, bands: int = 4):
        self.bands = bands
        self.band_bits = 64 // bands

    @staticmethod
    def signature(tokens: list[str]) -> int:
        if not tokens:
            return 0
        from collections import Counter as _C

        acc = np.zeros(64, dtype=np.int64)
        for tok, tf in _C(tokens).items():
            # md5, not crc32: crc is GF(2)-linear, so similar tokens give
            # correlated bit patterns and the per-bit sums stop behaving
            # like independent random walks (measured: hamming distance of
            # a 1-word edit did not shrink with doc length)
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += tf * (2 * bits.astype(np.int64) - 1)
        sig = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        return int(sig)

    def __call__(self, batch: pa.Table) -> pa.Table:
        token_lists = tokenize(batch["text"]).to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        out_band, out_key, out_doc, out_sig = [], [], [], []
        for doc_id, toks in zip(doc_ids, token_lists):
            toks = [t for t in toks if t]
            sig = self.signature(toks)
            for b in range(self.bands):
                key = (sig >> (b * self.band_bits)) & ((1 << self.band_bits) - 1)
                out_band.append(b)
                out_key.append(key)
                out_doc.append(doc_id)
                out_sig.append(sig - (1 << 63))  # store as signed int64
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_key, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "sig": pa.array(out_sig, pa.int64()),
            }
        )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency=(1, 4),
) -> pa.Table:
    """Near-dedup clusters via SimHash banding + Hamming verification.
    Returns pa.Table(doc_id, cluster_id) (cluster = min doc_id of the
    connected component). Same band-groupby -> candidate-pairs -> driver
    union-find shape as minhash_dedup (candidates << corpus assumption)."""
    if text_col != "text" or id_col != "doc_id":
        ds = ds.map_batches(
            lambda t: pa.table({"doc_id": t[id_col], "text": t[text_col]}),
            batch_format="pyarrow",
        )
    bands_ds = ds.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=concurrency
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group["doc_id"].to_pylist(), group["sig"].to_pylist())
        )
        a_out, b_out = [], []
        anchor_doc, anchor_sig = rows[0]
        for doc, sig in rows[1:]:
            a_out.append(anchor_doc)
            b_out.append(doc)
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    import ray as _ray

    pair_tables = [
        t
        for t in _ray.get(
            bands_ds.groupby(["band_id", "band_hash"])
            .map_groups(emit_pairs, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    cand = set()
    for t in pair_tables:
        cand.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))

    # collect signatures of candidate docs for Hamming verification
    need = sorted({d for p in cand for d in p})
    sigs: dict[int, int] = {}
    if need:
        id_arr = pa.array(need, pa.int64())
        sub = bands_ds.map_batches(
            lambda t: t.filter(pa.compute.is_in(t["doc_id"], value_set=id_arr)),
            batch_format="pyarrow",
        ).take_all()
        for row in sub:
            sigs[row["doc_id"]] = row["sig"] + (1 << 63)

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

    for a, b in sorted(cand):
        if a in sigs and b in sigs and hamming64(sigs[a], sigs[b]) <= max_hamming:
            union(a, b)

    all_ids = sorted(r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all())
    return pa.table(
        {
            "doc_id": pa.array(all_ids, pa.int64()),
            "cluster_id": pa.array([find(d) for d in all_ids], pa.int64()),
        }
    )
