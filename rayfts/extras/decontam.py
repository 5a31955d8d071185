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
