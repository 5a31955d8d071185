"""Sequence packing — token-budget chunk assignment for training windows.

A pretraining pipeline concatenates documents into fixed-token context
windows. The deterministic rule here (SQL-verifiable, order-stable):
docs in ``doc_id`` order, each doc's chunk is

    chunk_id = (exclusive prefix sum of token counts) // budget

i.e. a doc starts a new chunk exactly when the tokens BEFORE it fill a
whole number of budgets. Chunks are contiguous doc ranges, a doc never
splits, and a chunk may overflow the budget by at most one document —
the classic "greedy fill, close on overflow" packing, expressed as a
closed form so the oracle is one SQL window function.

Distributed shape (the whole point): a global running sum is the
textbook two-pass prefix scan —

  pass 1: per-BUCKET token totals (bucket = doc_id // bucket_docs) via
          map-side partial sums + one O(n_buckets) groupby;
  driver: exclusive prefix over the sorted bucket totals — O(n_buckets)
          scalars, never rows;
  pass 2: ``groupby(bucket).map_groups`` — each bucket sorts its own
          docs, takes its LOCAL exclusive cumsum, adds the broadcast
          bucket offset, divides by the budget. Group size is bounded
          by ``bucket_docs``, so the shuffle is uniform by construction
          (doc_id buckets, no skew possible).

At 10^12 turns: pass 1 ships one row per bucket per block, the driver
holds n_buckets ints, pass 2 is a bounded-group shuffle — no stage
materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..analysis import tokens_flat


def _token_counts(batch: pa.Table, text_col: str) -> np.ndarray:
    _, parent = tokens_flat(batch[text_col])
    return np.bincount(parent, minlength=batch.num_rows).astype(np.int64)


def pack_chunks(ds: rd.Dataset, budget: int, bucket_docs: int = 4096,
                text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """Assign every doc its packing chunk. Returns a Dataset
    (doc_id, n_tokens, chunk_id). ``budget`` = tokens per context
    window; ``bucket_docs`` bounds pass-2 group size (tune so one
    group's rows fit a worker heap)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        ntok = _token_counts(batch, text_col)
        bucket = ids // bucket_docs
        uniq, inv = np.unique(bucket, return_inverse=True)
        sums = np.bincount(inv, weights=ntok).astype(np.int64)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "tok_p": pa.array(sums, pa.int64())})

    # pass 1 + driver prefix: O(n_buckets) scalars on the driver
    totals = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("tok_p"))
        .to_pandas()
        .sort_values("bucket")
    )
    buckets = totals["bucket"].to_numpy().astype(np.int64)
    csum = np.concatenate(
        [[0], np.cumsum(totals["sum(tok_p)"].to_numpy())[:-1]]
    ).astype(np.int64)
    # offsets ship through the object store ONCE (zero-copy numpy views
    # per task), never inside the task closure — at 10^12 rows the
    # bucket table is itself large
    import ray

    offsets_ref = ray.put((buckets, csum))

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        bks, offs = _ray.get(offsets_ref)
        group = group.sort_values(id_col)
        tbl = pa.Table.from_pandas(group, preserve_index=False)
        ntok = _token_counts(tbl, text_col)
        bucket = int(group[id_col].iloc[0]) // bucket_docs
        off = int(offs[np.searchsorted(bks, bucket)])
        before = off + np.concatenate(
            [[0], np.cumsum(ntok)[:-1]]
        )
        return pd.DataFrame({
            id_col: group[id_col].to_numpy(),
            "n_tokens": ntok,
            "chunk_id": before // budget,
        })

    keyed = ds.map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.array(
                b[id_col].to_numpy(zero_copy_only=False) // bucket_docs,
                pa.int64(),
            ),
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return keyed.groupby("bucket").map_groups(assign)


def chunk_stats(ds: rd.Dataset, budget: int,
                bucket_docs: int = 4096, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Per-chunk (chunk_id, n_docs, tokens) summary — the packing QA
    view (budget adherence / tail chunk). O(chunks) result."""
    packed = pack_chunks(ds, budget, bucket_docs=bucket_docs,
                         text_col=text_col, id_col=id_col)
    out = (
        packed.groupby("chunk_id")
        .aggregate(Count(), Sum("n_tokens"))
        .to_pandas()
        .sort_values("chunk_id")
    )
    return pa.table({
        "chunk_id": pa.array(out["chunk_id"].astype("int64")),
        "n_docs": pa.array(out["count()"].astype("int64")),
        "tokens": pa.array(out["sum(n_tokens)"].astype("int64")),
    })


def chunk_passages(ds: rd.Dataset, width: int, stride: int | None = None,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> rd.Dataset:
    """Token-window passage chunking — the RAG / eval-harness prep op:
    each doc explodes into overlapping passages, passage p covering
    analyzed tokens [p*stride, p*stride + width). Deterministic rule,
    pinned for the SQL twin: passages start at every stride multiple
    BELOW n_tokens (so the tail passage may be short, and a doc shorter
    than one stride still emits passage 0); token text joins with a
    single space (the analyzer's lossy-but-deterministic rendering —
    passage ids and hashes are the durable artifact, not byte
    offsets). Empty docs emit nothing. One streaming flat-map pass —
    no shuffle, no driver state. Returns
    (id, passage_id, n_tokens, passage_md5)."""
    if width < 1:
        raise ValueError("width must be >= 1")
    stride = width if stride is None else stride
    if not 1 <= stride <= width:
        raise ValueError("stride must be in [1, width]")

    import hashlib

    def explode(batch: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(batch[text_col])
        toks = flat.to_pylist()
        n_rows = batch.num_rows
        per_doc: list[list[str]] = [[] for _ in range(n_rows)]
        for t, p in zip(toks, parent):
            per_doc[p].append(t)
        ids = batch[id_col].to_pylist()
        out_id, out_pid, out_n, out_md5 = [], [], [], []
        for rid, row in zip(ids, per_doc):
            n = len(row)
            if n == 0:
                continue
            for pid, start in enumerate(range(0, n, stride)):
                window = row[start:start + width]
                out_id.append(rid)
                out_pid.append(pid)
                out_n.append(len(window))
                out_md5.append(
                    hashlib.md5(" ".join(window).encode()).hexdigest()
                )
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "passage_id": pa.array(out_pid, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "passage_md5": pa.array(out_md5, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)
