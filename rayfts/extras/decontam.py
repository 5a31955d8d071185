"""Benchmark decontamination: flag corpus docs sharing token n-grams with
an evaluation set.

The training-data op every LLM pipeline runs before training: a document
that shares at least one k-token shingle with a benchmark document leaks
eval data and must be dropped (or flagged for audit). The benchmark side
is SMALL by construction (eval sets are thousands of docs; the corpus is
billions), so this is the canonical broadcast-membership pattern — the
same asymmetry the reference exploits for its --used-node id-set filter
(SURVEY §2.4 J2 semi-join analog):

  1. benchmark -> distinct shingle hashes (the dedup family's md5-fold
     kernel, ``shingle_hashes_batch``), unioned into ONE sorted uint64
     array. Driver memory is O(distinct benchmark shingles), never
     O(corpus).
  2. ``ray.put`` the array once; every corpus task reads it zero-copy
     from the object store (no per-batch re-ship).
  3. the corpus streams through one vectorized ``map_batches``:
     per-batch shingles -> ``np.isin`` membership against the broadcast
     array -> per-doc DISTINCT-hit counts via a lexsort dedup. No
     shuffle anywhere; the corpus is touched exactly once.

Shingle semantics match ``rayfts.extras.dedup`` exactly (k-token C-fold
of md5-lower64 token hashes; 0 < L < k tokens fold to one shingle; empty
docs contribute none), so the DuckDB oracle reuses the same SQL shingle
CTE that already pins the minhash pipeline bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..analysis import tokens_flat
from .dedup import DEFAULT_SHINGLE_K, shingle_hashes_batch
from .hashing import U64, hash_tokens_unique, u64_view_i64


def _batch_shingles(batch: pa.Table, text_col: str, k: int):
    flat, parent = tokens_flat(batch[text_col])
    flat_h = hash_tokens_unique(flat)
    return shingle_hashes_batch(flat_h, parent, batch.num_rows, k)


def benchmark_shingle_array(
    bench_ds: rd.Dataset,
    text_col: str = "text",
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> np.ndarray:
    """Distinct shingle hashes of the benchmark side as one SORTED uint64
    array — the broadcast small side. Each task emits its batch's
    distinct set; the driver unions the (small) per-block results."""

    def distinct_sh(batch: pa.Table) -> pa.Table:
        sh, _ = _batch_shingles(batch, text_col, shingle_k)
        # bit-reinterpret (NOT bias-shift) so the .view(uint64) below is
        # the exact inverse
        return pa.table(
            {"sh": pa.array(u64_view_i64(np.unique(sh)), pa.int64())}
        )

    parts = bench_ds.map_batches(distinct_sh, batch_format="pyarrow")
    tables = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.empty(0, U64)
    allsh = pa.concat_tables(tables)["sh"].to_numpy(zero_copy_only=False)
    return np.unique(allsh.astype(np.int64).view(np.uint64))


class Decontaminator:
    """Actor-pool stage: the broadcast benchmark array is fetched once
    per actor (zero-copy object-store view); each batch is scored with
    numpy kernels only — no per-row Python."""

    def __init__(self, bench_ref, text_col: str, id_col: str, shingle_k: int):
        self.bench = ray.get(bench_ref)  # sorted uint64
        self.text_col, self.id_col, self.k = text_col, id_col, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sh, parent = _batch_shingles(batch, self.text_col, self.k)
        n_hits = np.zeros(n, dtype=np.int64)
        if sh.size and self.bench.size:
            hit = np.isin(sh, self.bench, assume_unique=False)
            hs, hp = sh[hit], parent[hit]
            if hs.size:
                # distinct (doc, shingle) pairs: lexsort + adjacent-dedup
                order = np.lexsort((hs, hp))
                hs, hp = hs[order], hp[order]
                first = np.ones(hs.size, dtype=bool)
                first[1:] = (hp[1:] != hp[:-1]) | (hs[1:] != hs[:-1])
                np.add.at(n_hits, hp[first], 1)
        ids = batch[self.id_col]
        return pa.table(
            {
                self.id_col: ids,
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0, pa.bool_()),
            }
        )


def decontaminate(
    corpus_ds: rd.Dataset,
    bench_ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = DEFAULT_SHINGLE_K,
    concurrency=(1, 8),
) -> rd.Dataset:
    """(id, n_hits, contaminated) per corpus doc: n_hits = DISTINCT
    shingles shared with ANY benchmark doc. Filter
    ``contaminated == False`` downstream to drop leaks, or keep the
    counts for audit."""
    sh = benchmark_shingle_array(bench_ds, text_col, shingle_k)
    ref = ray.put(sh)
    return corpus_ds.map_batches(
        Decontaminator,
        fn_constructor_kwargs={
            "bench_ref": ref,
            "text_col": text_col,
            "id_col": id_col,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def split_leakage(ds: rd.Dataset, key_col: str = "doc_id",
                  text_col: str = "text", prefix_tokens: int = 5,
                  buckets: int = 100,
                  train_buckets: int = 90) -> pa.Table:
    """Train/holdout LEAKAGE AUDIT: after the deterministic md5-bucket
    split (the split_dataset rule on ``key_col``), count holdout docs
    whose DOCUMENT OPENING — the first ``prefix_tokens`` analyzed
    tokens, the cheap opening-fingerprint heuristic of dedup studies —
    also opens at least one TRAIN doc. Returns one row
    (overlap_keys, contaminated_holdout_docs, holdout_docs).

    Distributed shape: one streaming pass emits per-batch per-opening
    (n_train, n_holdout) partials (map-side combine), one groupby on
    the opening key sums them (hash shuffle over O(distinct openings)
    partial rows, never documents), and the final reduce is a pair of
    Sum aggregates over indicator columns — the driver sees scalars.
    Tokenizer and split rule are pinned shared specs, so the SQL twin
    (regexp_extract_all + list_slice + the md5-prefix bucket CAST)
    reproduces both bit-for-bit."""
    from ray.data.aggregate import Sum

    from .sampling import hash_bucket

    if prefix_tokens < 1:
        raise ValueError("prefix_tokens must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(batch[text_col])
        toks = flat.to_pylist()
        n = batch.num_rows
        # first prefix_tokens per doc, in order (flatten order is
        # doc-major): positions within each parent via running starts
        firsts: list[list[str]] = [[] for _ in range(n)]
        for t, p in zip(toks, parent):
            row = firsts[p]
            if len(row) < prefix_tokens:
                row.append(t)
        keys = [" ".join(r) for r in firsts]
        ids = [str(k) for k in batch[key_col].to_pylist()]
        is_train = hash_bucket(ids, buckets) < train_buckets
        agg: dict = {}
        for k, tr in zip(keys, is_train):
            a = agg.setdefault(k, [0, 0])
            a[0 if tr else 1] += 1
        ks = sorted(agg)
        return pa.table({
            "opening": pa.array(ks, pa.string()),
            "nt": pa.array([agg[k][0] for k in ks], pa.int64()),
            "nh": pa.array([agg[k][1] for k in ks], pa.int64()),
        })

    per_key = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("opening")
        .aggregate(Sum("nt"), Sum("nh"))
    )

    def flags(batch: pa.Table) -> pa.Table:
        nt = batch["sum(nt)"].to_numpy(zero_copy_only=False)
        nh = batch["sum(nh)"].to_numpy(zero_copy_only=False)
        leak = (nt > 0) & (nh > 0)
        return pa.table({
            "overlap_keys": pa.array(
                leak.astype(np.int64), pa.int64()
            ),
            "contaminated": pa.array(
                np.where(leak, nh, 0).astype(np.int64), pa.int64()
            ),
            "holdout": pa.array(nh.astype(np.int64), pa.int64()),
        })

    tot = (
        per_key.map_batches(flags, batch_format="pyarrow")
        .aggregate(Sum("overlap_keys"), Sum("contaminated"),
                   Sum("holdout"))
    )
    return pa.table({
        "overlap_keys": pa.array(
            [int(tot["sum(overlap_keys)"] or 0)], pa.int64()
        ),
        "contaminated_holdout_docs": pa.array(
            [int(tot["sum(contaminated)"] or 0)], pa.int64()
        ),
        "holdout_docs": pa.array(
            [int(tot["sum(holdout)"] or 0)], pa.int64()
        ),
    })


def semantic_decontaminate(
    corpus: rd.Dataset,
    benchmark_vecs: "np.ndarray",
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 8),
) -> rd.Dataset:
    """Semantic (embedding-level) decontamination: flag corpus rows
    whose max cosine to ANY benchmark embedding reaches ``threshold``
    — the paraphrase-robust complement of the n-gram shingle check
    (n-grams miss reworded eval leakage; embeddings catch it). Same
    broadcast asymmetry as the shingle path: the benchmark matrix is
    small, so it ships ONCE via ray.put and the corpus streams through
    one vectorized map_batches (a [batch, bench] matmul per batch, no
    shuffle, corpus touched exactly once). Returns Dataset(id_col,
    max_sim, flagged); zero-norm rows score 0."""
    import ray

    m = np.asarray(benchmark_vecs, dtype=np.float64)
    ref = ray.put(m)

    class SemScan:
        def __init__(self):
            self.bench = ray.get(ref)
            bn = np.sqrt((self.bench * self.bench).sum(axis=1))
            bn[bn == 0.0] = 1.0
            self.bnorm = bn

        def __call__(self, b: pa.Table) -> pa.Table:
            v = np.asarray(
                b[vec_col].combine_chunks().flatten().to_numpy(
                    zero_copy_only=False
                ), dtype=np.float64,
            ).reshape(b.num_rows, -1)
            nrm = np.sqrt((v * v).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            # dot first, one divide — the SQL twin's rounding order
            sims = (v @ self.bench.T) / (nrm * self.bnorm[None, :])
            mx = sims.max(axis=1) if sims.size else np.zeros(b.num_rows)
            return pa.table({
                id_col: b[id_col],
                "max_sim": pa.array(mx, pa.float64()),
                "flagged": pa.array(mx >= threshold),
            })

    return corpus.map_batches(SemScan, batch_format="pyarrow",
                              concurrency=concurrency)
