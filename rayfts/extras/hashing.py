"""Shared hash kernels + distributed cluster labeling for the dedup family.

Every hash here is chosen to be reproducible BOTH as a vectorized numpy
kernel (engine side) and in ANSI-ish SQL on DuckDB (oracle side):

  * token hash  = little-endian uint64 of the LAST 8 bytes of md5(token)
                  == DuckDB ``md5_number_lower(token)`` (verified) — computed
                  once per DISTINCT token per batch (vocab-bounded), then
                  gathered to occurrences via the dictionary indices;
  * fold hash   = ``acc = (acc * C + x) mod 2^64`` — uint64 wraparound numpy
                  side, ``% 18446744073709551616`` HUGEINT arithmetic SQL
                  side (C is small so acc*C fits in HUGEINT).

Cluster labeling replaces the round-1 driver-side ``take_all()`` over the
whole corpus (the 100-TB scale-killer): the union-find parent map — tiny,
candidate pairs only — is broadcast via ``ray.put`` once and every batch is
labeled by a vectorized ``np.searchsorted`` lookup inside ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

U64 = np.uint64
MOD64 = 1 << 64
FOLD_C = 1000003  # fold multiplier; small so HUGEINT a*C never overflows


def md5_lower64(s: str) -> int:
    """Python reference of DuckDB md5_number_lower (uint64)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def hash_tokens_unique(flat: pa.Array) -> np.ndarray:
    """md5-lower64 over a flat token array, one md5 per DISTINCT token.

    Token streams are Zipf-distributed, so the per-batch vocabulary is far
    smaller than the occurrence count — dictionary-encode, hash the
    dictionary, gather by index. Returns uint64 per occurrence.
    """
    if len(flat) == 0:
        return np.empty(0, dtype=U64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    denc = pc.dictionary_encode(flat)
    uniq = denc.dictionary.to_pylist()
    uh = np.fromiter((md5_lower64(t) for t in uniq), dtype=U64, count=len(uniq))
    idx = denc.indices.to_numpy(zero_copy_only=False)
    return uh[idx]


def fold_u64(parts: list[np.ndarray], c: int = FOLD_C) -> np.ndarray:
    """Vectorized order-sensitive fold: acc = acc*c + x per element arrays.

    ``parts`` are aligned arrays (x_0 ... x_{k-1}); uint64 wraparound is the
    intended modulus (SQL: ``% 18446744073709551616`` HUGEINT math).
    """
    acc = parts[0].astype(U64).copy()
    cc = U64(c)
    with np.errstate(over="ignore"):
        for x in parts[1:]:
            acc = acc * cc + x.astype(U64)
    return acc


def u64_to_i64(u: np.ndarray) -> np.ndarray:
    """Shift-reinterpret uint64 -> int64 (value - 2^63), order-preserving.
    SQL twin: ``CAST(x - 9223372036854775808 AS BIGINT)`` for x in [0,2^64)."""
    return (u ^ U64(1 << 63)).view(np.int64)


def u64_view_i64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 bits as two's-complement int64 (no shift).
    SQL twin: ``CASE WHEN x >= 2^63 THEN x - 2^64 ELSE x END``."""
    return u.view(np.int64)


class UnionFind:
    """Streaming union-find with min-label roots. Edges arrive in any
    order and may repeat; memory is O(distinct touched ids) — NEVER
    O(edges) — which is what bounds the driver on a pathological
    all-duplicates corpus (the edge set can approach |corpus|^2 per
    bucket cap, the node set cannot exceed the corpus)."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            # min-id root: component label = min member, independent of
            # edge arrival order (connectivity + min are order-free)
            self.parent[rb] = ra

    def union_edge_block(self, a: np.ndarray, b: np.ndarray) -> None:
        """Union one verified-pair block (two int arrays) without ever
        materializing the pair set."""
        union = self.union
        for x, y in zip(a.tolist(), b.tolist()):
            union(x, y)

    def min_label_map(self) -> dict[int, int]:
        """FULLY-COMPRESSED {member -> min id of its component} for
        non-singleton members only — O(touched ids), broadcastable."""
        return {x: self.find(x) for x in self.parent}


def components_min_label(pairs) -> dict[int, int]:
    """Union-find over verified pairs (any iterable of (a, b)); returns
    the min-label root map (see UnionFind.min_label_map). The map is
    O(candidate docs) — small by the candidates << corpus assumption —
    and broadcastable."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return uf.min_label_map()


def spanning_edges(batch: pa.Table) -> pa.Table:
    """Per-block pre-collapse for verified-pair streams: run a LOCAL
    union-find over the block's (a, b) pairs and emit only the
    spanning-forest edges (member -> local root). Output rows are
    bounded by the block's distinct ids (minus components) however many
    duplicate/cyclic pairs the block carries — the map-side combiner
    that keeps the driver's edge intake near the node count."""
    if batch.num_rows == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    uf = UnionFind()
    uf.union_edge_block(
        batch["a"].to_numpy(zero_copy_only=False),
        batch["b"].to_numpy(zero_copy_only=False),
    )
    roots = uf.min_label_map()
    a_out, b_out = [], []
    for x, r in roots.items():
        if x != r:
            a_out.append(r)
            b_out.append(x)
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
        }
    )


def components_min_label_from_blocks(tables) -> dict[int, int]:
    """Streaming min-label components over an iterable of Arrow tables
    with (a, b) verified-pair columns: edges are consumed block by
    block, so driver memory is O(distinct candidate ids), not
    O(verified pairs)."""
    uf = UnionFind()
    for t in tables:
        if t.num_rows:
            uf.union_edge_block(
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False),
            )
    return uf.min_label_map()


class ClusterLabeler:
    """Actor-pool stage: broadcast root map fetched once per actor; each
    batch labels ``cluster_id = roots.get(id, id)`` via vectorized
    searchsorted."""

    def __init__(self, roots_ref, id_col: str):
        keys, vals = ray.get(roots_ref) if not isinstance(roots_ref, tuple) else roots_ref
        self.keys = keys
        self.vals = vals
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cluster = ids.copy()
        if self.keys.size:
            pos = np.searchsorted(self.keys, ids)
            pos_c = np.minimum(pos, self.keys.size - 1)
            hit = self.keys[pos_c] == ids
            cluster[hit] = self.vals[pos_c[hit]]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cluster, pa.int64()),
            }
        )


def label_dataset(
    ds: rd.Dataset, roots: dict[int, int], id_col: str = "doc_id"
) -> rd.Dataset:
    """Distributed (id, cluster_id) labeling: NO driver-side corpus
    materialization — the corpus stays a streamed Dataset, only the small
    root map crosses the driver."""
    keys = np.array(sorted(roots), dtype=np.int64)
    vals = np.array([roots[k] for k in keys], dtype=np.int64)
    roots_ref = ray.put((keys, vals))
    return ds.map_batches(
        ClusterLabeler,
        fn_constructor_kwargs={"roots_ref": roots_ref, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
