"""Deterministic hash-based dataset splitting — the training-data
holdout/sampling operator.

A training pipeline needs splits that are (a) deterministic across reruns
and machines, (b) key-stable (every row of a conversation lands in the
same split), and (c) computable streamingly with no shuffle — exactly
what modulo-ing a cryptographic hash of the split key gives. This is the
standard web-scale recipe (hash(url) % N buckets); random_shuffle/sample
would violate (a) and (b).

The hash rule is pinned for the DuckDB oracle: bucket = the first 8 hex
chars of md5(key-as-string) parsed as an integer, modulo ``buckets``
(SQL twin: ``CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) % buckets``).
A row is in the TRAIN split when bucket < train_buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def md5_prefix_u32(keys) -> np.ndarray:
    """THE md5-prefix rule (first 8 hex chars as an int in [0, 2^32)) —
    the single definition shared by the hash-split stage and
    ``Searcher.random_score`` so their DuckDB oracle twin
    (``CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT)``) stays pinned to
    one implementation. One C-speed md5 per row; unavoidable without an
    Arrow md5 kernel — same note as exact_dedup."""
    return np.fromiter(
        (
            int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16)
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def hash_bucket(keys: list[str], buckets: int = 100) -> np.ndarray:
    """md5-prefix bucket per key (see md5_prefix_u32)."""
    return md5_prefix_u32(keys) % buckets


class SplitAssigner:
    """Ray Data actor-pool stage: append ``split`` ("train"/"holdout")
    and ``bucket`` columns keyed on ``key_col`` (stringified — so int64
    doc ids and string conv ids both work). Streaming, shuffle-free,
    rerun-stable."""

    def __init__(self, key_col: str, buckets: int = 100,
                 train_buckets: int = 90):
        if buckets <= 0:
            raise ValueError("buckets must be positive")
        if not 0 <= train_buckets <= buckets:
            raise ValueError("train_buckets must be within [0, buckets]")
        self.key_col = key_col
        self.buckets = buckets
        self.train_buckets = train_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = [
            str(k) for k in batch[self.key_col].to_pylist()
        ]
        b = hash_bucket(keys, self.buckets)
        split = np.where(b < self.train_buckets, "train", "holdout")
        return batch.append_column(
            "bucket", pa.array(b, pa.int64())
        ).append_column("split", pa.array(split.tolist(), pa.string()))


def split_dataset(ds: rd.Dataset, key_col: str, buckets: int = 100,
                  train_buckets: int = 90,
                  concurrency=(1, 8)) -> rd.Dataset:
    """Append deterministic split columns to a Dataset (lazy)."""
    return ds.map_batches(
        SplitAssigner,
        fn_constructor_kwargs={
            "key_col": key_col,
            "buckets": buckets,
            "train_buckets": train_buckets,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
