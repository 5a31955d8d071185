"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (100 TB):
  * exact: content hash computed map-side (vectorized), then a
    hash-partitioned groupby keeps min doc_id per hash — the only shuffle
    moves (hash, doc_id) pairs, never text.
  * minhash-LSH / simhash: signatures are computed fully VECTORIZED per
    batch (one md5 per distinct token, numpy folds/mins for everything
    else); the shuffle moves (band_id, band_hash, doc_id) rows; candidate
    verification touches only candidate docs; union-find runs on the driver
    over the candidate PAIRS only (candidates << corpus — documented,
    standard for LSH dedup); final (doc_id, cluster_id) labeling is a
    broadcast-map ``map_batches`` over the streamed corpus — the driver
    never materializes corpus rows or ids.
  * every hash in the spec (md5-lower64 token hash, C-fold shingle/band
    hashes mod 2^64, (a*x+b mod 2^64) mod 2^61-1 permutations) is chosen to
    be replicable in DuckDB SQL (md5_number_lower + HUGEINT arithmetic), so
    the near-dedup pipelines face a REAL value oracle, not a rows-only
    check. See __ray_entry__.oracle_sql.

Reference analog: ES index-by-_id upsert idempotency
(dao/EntityDao.java:96,114) — the D1 exact-dedup semantic; near-dedup is the
training-data extension the brief requires.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..analysis import tokens_flat
from .hashing import (
    FOLD_C,
    U64,
    components_min_label,
    hash_tokens_unique,
    label_dataset,
    md5_lower64,
    u64_to_i64,
)

# ---------------------------------------------------------------------------
# shared near-dedup spec constants (mirrored in the SQL oracle)
# ---------------------------------------------------------------------------

M61 = (1 << 61) - 1  # Mersenne modulus for the minhash permutations
DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 8
DEFAULT_SHINGLE_K = 3
MAX_BUCKET_ALL_PAIRS = 4096  # above this, fall back to chain pairs (logged)


def perm_params(num_perm: int = DEFAULT_NUM_PERM, seed: int = 7):
    """Deterministic minhash permutation constants (shared with the SQL
    oracle, which embeds them as literals)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, M61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, M61, size=num_perm, dtype=np.uint64)
    return a, b


def threshold_fraction(threshold: float) -> tuple[int, int]:
    """Jaccard threshold as an exact fraction so the verify compare is pure
    integer math on BOTH the engine and SQL side (no float boundary)."""
    f = Fraction(str(threshold)).limit_denominator(10_000)
    return f.numerator, f.denominator


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
# shingles (shared by MinHash signature + exact-Jaccard verification)
# ---------------------------------------------------------------------------


def shingle_hashes_batch(
    flat_h: np.ndarray, parent: np.ndarray, n_rows: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-k-shingle hashes for a whole batch.

    ``flat_h``: uint64 token hashes (md5-lower64) in row-major token order;
    ``parent``: row index per token (non-decreasing). Shingle hash = C-fold
    of the k token hashes mod 2^64 (SQL-replicable). Docs with 0 < L < k
    tokens contribute ONE shingle folding all their tokens; empty docs
    contribute none. Returns (sh, sh_parent) sorted by parent.
    """
    nt = flat_h.size
    L = np.bincount(parent, minlength=n_rows) if nt else np.zeros(n_rows, np.int64)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(L, out=starts[1:])
    out_sh, out_parent = [], []
    cc = U64(FOLD_C)
    with np.errstate(over="ignore"):
        if nt >= k:
            base = flat_h[: nt - k + 1]
            valid = parent[: nt - k + 1] == parent[k - 1 :]
            acc = base.copy()
            for j in range(1, k):
                acc = acc * cc + flat_h[j : nt - k + 1 + j]
            out_sh.append(acc[valid])
            out_parent.append(parent[: nt - k + 1][valid])
        short_rows = np.flatnonzero((L > 0) & (L < k))
        if short_rows.size:
            acc_s = flat_h[starts[short_rows]].copy()
            ls = L[short_rows]
            for j in range(1, k):
                m = ls > j
                acc_s[m] = acc_s[m] * cc + flat_h[starts[short_rows[m]] + j]
            out_sh.append(acc_s)
            out_parent.append(short_rows.astype(parent.dtype if nt else np.int64))
    if not out_sh:
        return np.empty(0, U64), np.empty(0, np.int64)
    sh = np.concatenate(out_sh)
    sh_parent = np.concatenate(out_parent).astype(np.int64)
    order = np.argsort(sh_parent, kind="stable")
    return sh[order], sh_parent[order]


def shingle_hash_set(tokens: list[str], k: int = DEFAULT_SHINGLE_K) -> set[int]:
    """Per-doc reference: the distinct shingle-hash set (verification unit)."""
    h = np.fromiter((md5_lower64(t) for t in tokens), dtype=U64, count=len(tokens))
    sh, _ = shingle_hashes_batch(h, np.zeros(len(tokens), np.int64), 1, k)
    return set(int(x) for x in sh)


def jaccard(tokens_a: list[str], tokens_b: list[str], k: int = DEFAULT_SHINGLE_K) -> float:
    sa, sb = shingle_hash_set(tokens_a, k), shingle_hash_set(tokens_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: permutation params built once per actor (ST1 rule);
    the whole batch is signed with numpy kernels — one md5 per distinct
    token, then folds / broadcast-min / reduceat. No per-row Python."""

    PERM_CHUNK = 8  # perms processed per (perm x shingle) broadcast chunk

    def __init__(
        self,
        num_perm: int = DEFAULT_NUM_PERM,
        shingle_k: int = DEFAULT_SHINGLE_K,
        bands: int = DEFAULT_BANDS,
    ):
        assert num_perm % bands == 0
        self.a, self.b = perm_params(num_perm)
        self.num_perm, self.k, self.bands = num_perm, shingle_k, bands
        self.rows_per_band = num_perm // bands

    def signatures_batch(
        self, flat_h: np.ndarray, parent: np.ndarray, n_rows: int
    ) -> np.ndarray:
        """(num_perm, n_rows) uint64 signature matrix; empty docs -> M61."""
        sh, sh_parent = shingle_hashes_batch(flat_h, parent, n_rows, self.k)
        sig = np.full((self.num_perm, n_rows), U64(M61), dtype=U64)
        if sh.size == 0:
            return sig
        change = np.flatnonzero(np.diff(sh_parent)) + 1
        seg_starts = np.concatenate([[0], change])
        present = sh_parent[seg_starts]
        m61 = U64(M61)
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perm, self.PERM_CHUNK):
                a = self.a[p0 : p0 + self.PERM_CHUNK, None]
                b = self.b[p0 : p0 + self.PERM_CHUNK, None]
                v = (a * sh[None, :] + b) % m61  # uint64 wrap then mod M61
                mins = np.minimum.reduceat(v, seg_starts, axis=1)
                sig[p0 : p0 + self.PERM_CHUNK, present] = mins
        return sig

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(bands, n_rows) uint64: C-fold of each band's sig rows mod 2^64."""
        n = sig.shape[1]
        bh = np.zeros((self.bands, n), dtype=U64)
        cc = U64(FOLD_C)
        with np.errstate(over="ignore"):
            for bnd in range(self.bands):
                acc = np.zeros(n, dtype=U64)
                for r in range(self.rows_per_band):
                    acc = acc * cc + sig[bnd * self.rows_per_band + r]
                bh[bnd] = acc
        return bh

    def signature(self, tokens: list[str]) -> np.ndarray:
        """Per-doc reference path (tests/spec) — same kernels, one row."""
        h = np.fromiter(
            (md5_lower64(t) for t in tokens), dtype=U64, count=len(tokens)
        )
        return self.signatures_batch(h, np.zeros(len(tokens), np.int64), 1)[:, 0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """batch(doc_id, text) -> (band_id, band_hash, doc_id) rows."""
        n = batch.num_rows
        flat, parent = tokens_flat(batch["text"])
        flat_h = hash_tokens_unique(flat)
        sig = self.signatures_batch(flat_h, parent, n)
        bh = self.band_hashes(sig)  # (bands, n)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(u64_to_i64(bh.ravel()), pa.int64()),
                "doc_id": pa.array(np.tile(doc_ids, self.bands), pa.int64()),
            }
        )


def _emit_all_pairs(group: pa.Table) -> pa.Table:
    """ALL in-bucket pairs (a<b). Star pairs under-merge when the anchor
    fails verification while others are true near-dups (round-1 advisory);
    buckets are small under the candidates << corpus assumption, with a
    chain fallback above MAX_BUCKET_ALL_PAIRS as an O(n^2) guard."""
    ids = np.unique(group["doc_id"].to_numpy())
    g = ids.size
    if g < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if g > MAX_BUCKET_ALL_PAIRS:
        return pa.table(
            {"a": pa.array(ids[:-1], pa.int64()), "b": pa.array(ids[1:], pa.int64())}
        )
    iu, ju = np.triu_indices(g, k=1)
    return pa.table(
        {"a": pa.array(ids[iu], pa.int64()), "b": pa.array(ids[ju], pa.int64())}
    )


def _candidate_pairs(bands_ds: rd.Dataset) -> set[tuple[int, int]]:
    refs = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(_emit_all_pairs, batch_format="pyarrow")
        .to_arrow_refs()
    )
    cand: set[tuple[int, int]] = set()
    for t in ray.get(refs):
        if t.num_rows:
            cand.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    return cand


class _ShingleEmitter:
    """Candidate-only pass: emit (doc_id, shingle) DISTINCT rows for docs in
    the broadcast candidate-id set."""

    def __init__(self, ids_ref, shingle_k: int):
        ids = ray.get(ids_ref) if not isinstance(ids_ref, np.ndarray) else ids_ref
        self.ids = ids  # sorted int64
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch["doc_id"], value_set=pa.array(self.ids, pa.int64()))
        sub = batch.filter(keep)
        if sub.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.int64())}
            )
        flat, parent = tokens_flat(sub["text"])
        flat_h = hash_tokens_unique(flat)
        sh, sh_parent = shingle_hashes_batch(flat_h, parent, sub.num_rows, self.k)
        doc_ids = sub["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (doc, shingle)
        key = np.stack([sh_parent.astype(np.int64), sh.view(np.int64)], axis=1)
        uniq = np.unique(key, axis=0) if key.size else key.reshape(0, 2)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[uniq[:, 0]], pa.int64()),
                "sh": pa.array(uniq[:, 1], pa.int64()),
            }
        )


def minhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.8,
    concurrency=(1, 4),
) -> rd.Dataset:
    """Near-dedup clusters. Returns Dataset(doc_id, cluster_id) where
    cluster_id = min doc_id of the connected component (docs with no
    near-dup map to themselves).

    Pipeline: map_batches(MinHasher actor, vectorized) -> groupby(band) ->
    ALL in-bucket candidate pairs -> exact shingle-Jaccard verify with
    INTEGER threshold compare (candidate docs only) -> driver union-find
    over verified pairs -> broadcast-label map_batches (no corpus take_all
    on the driver, ever).
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
    cand = _candidate_pairs(bands_ds)
    verified: set[tuple[int, int]] = set()
    if cand:
        need = np.array(sorted({d for p in cand for d in p}), dtype=np.int64)
        ids_ref = ray.put(need)
        sh_rows = ds.map_batches(
            _ShingleEmitter,
            fn_constructor_kwargs={"ids_ref": ids_ref, "shingle_k": shingle_k},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        shingles: dict[int, set[int]] = {int(d): set() for d in need}
        for t in ray.get(sh_rows.to_arrow_refs()):
            for d, s in zip(t["doc_id"].to_pylist(), t["sh"].to_pylist()):
                shingles[d].add(s)
        tnum, tden = threshold_fraction(threshold)
        for a, b in cand:
            sa, sb = shingles.get(a, set()), shingles.get(b, set())
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            # inter/union >= tnum/tden as exact integer compare; union==0
            # (two empty docs) counts as a duplicate pair (J := 1)
            if inter * tden >= tnum * union:
                verified.add((a, b))
    roots = components_min_label(verified)
    return label_dataset(ds.select_columns(["doc_id"]), roots, id_col="doc_id")


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: 64-bit SimHash over md5-lower64 token hashes.

    sig bit b = sign of sum over token OCCURRENCES of (+1 if bit b of
    h(token) else -1) — occurrence-summing equals tf-weighting. Vectorized:
    the ±1 bit matrix is reduced per doc with np.add.reduceat in 16-bit
    chunks. Near-dup candidates = docs sharing a 16-bit band (4 bands),
    verified in-bucket by Hamming distance <= ``max_hamming``.
    """

    BIT_CHUNK = 16

    def __init__(self, bands: int = 4):
        self.bands = bands
        self.band_bits = 64 // bands

    @staticmethod
    def signatures_batch(
        flat_h: np.ndarray, parent: np.ndarray, n_rows: int
    ) -> np.ndarray:
        """(n_rows,) uint64 signatures; empty docs -> 0."""
        sig = np.zeros(n_rows, dtype=U64)
        if flat_h.size == 0:
            return sig
        L = np.bincount(parent, minlength=n_rows)
        present = np.flatnonzero(L > 0)
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(L, out=starts[1:])
        seg_starts = starts[present]
        for c0 in range(0, 64, SimHasher.BIT_CHUNK):
            shifts = np.arange(c0, c0 + SimHasher.BIT_CHUNK, dtype=U64)
            bits = ((flat_h[:, None] >> shifts[None, :]) & U64(1)).astype(np.int32)
            pm = 2 * bits - 1  # (n_tokens, chunk)
            acc = np.add.reduceat(pm, seg_starts, axis=0)  # (n_present, chunk)
            set_bits = acc > 0
            weights = (U64(1) << shifts).astype(U64)
            sig[present] |= (set_bits * weights[None, :]).sum(axis=1, dtype=U64)
        return sig

    @staticmethod
    def signature(tokens: list[str]) -> int:
        """Per-doc reference path (tests/spec)."""
        h = np.fromiter(
            (md5_lower64(t) for t in tokens), dtype=U64, count=len(tokens)
        )
        return int(
            SimHasher.signatures_batch(h, np.zeros(len(tokens), np.int64), 1)[0]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parent = tokens_flat(batch["text"])
        flat_h = hash_tokens_unique(flat)
        sig = self.signatures_batch(flat_h, parent, n)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = U64((1 << self.band_bits) - 1)
        out = []
        for b in range(self.bands):
            key = (sig >> U64(b * self.band_bits)) & mask
            out.append(
                pa.table(
                    {
                        "band_id": pa.array(
                            np.full(n, b, dtype=np.int32), pa.int32()
                        ),
                        "band_hash": pa.array(key.astype(np.int64), pa.int64()),
                        "doc_id": pa.array(doc_ids, pa.int64()),
                        # two's-complement reinterpret (SQL: x>=2^63 ? x-2^64 : x)
                        "sig": pa.array(sig.view(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency=(1, 4),
) -> rd.Dataset:
    """Near-dedup clusters via SimHash banding + in-bucket Hamming
    verification. Returns Dataset(doc_id, cluster_id) (cluster = min doc_id
    of the connected component). Verification happens INSIDE the band
    group (signatures ride along with the band rows), so only verified
    pairs reach the driver union-find; labeling is broadcast-map."""
    if text_col != "text" or id_col != "doc_id":
        ds = ds.map_batches(
            lambda t: pa.table({"doc_id": t[id_col], "text": t[text_col]}),
            batch_format="pyarrow",
        )
    bands_ds = ds.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=concurrency
    )

    def verified_pairs(group: pa.Table) -> pa.Table:
        docs = group["doc_id"].to_numpy()
        sigs = group["sig"].to_numpy().view(U64)
        order = np.argsort(docs, kind="stable")
        docs, sigs = docs[order], sigs[order]
        keep = np.concatenate([[True], docs[1:] != docs[:-1]])
        docs, sigs = docs[keep], sigs[keep]
        g = docs.size
        if g < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        if g > MAX_BUCKET_ALL_PAIRS:
            iu = np.arange(g - 1)
            ju = iu + 1
        else:
            iu, ju = np.triu_indices(g, k=1)
        x = sigs[iu] ^ sigs[ju]
        ham = (
            np.unpackbits(x.view(np.uint8))
            .reshape(x.size, 64)
            .sum(axis=1)
        )
        ok = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(docs[iu[ok]], pa.int64()),
                "b": pa.array(docs[ju[ok]], pa.int64()),
            }
        )

    refs = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(verified_pairs, batch_format="pyarrow")
        .to_arrow_refs()
    )
    verified: set[tuple[int, int]] = set()
    for t in ray.get(refs):
        if t.num_rows:
            verified.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    roots = components_min_label(verified)
    return label_dataset(ds.select_columns(["doc_id"]), roots, id_col="doc_id")
