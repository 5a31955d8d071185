"""Streaming hit export — the ES scroll / point-in-time analog.

ES pages a full result set through the scroll API because clients pull
over HTTP; a Ray-native engine streams it as a Dataset instead: the hit
set becomes a packed bitmask broadcast ONCE via ray.put (N/8 bytes for a
segment — the mask is per-SEGMENT state, never global: at web scale each
index segment exports itself with its locally-computed mask, so the
payload scales with segment size, not corpus size), and the docstore
streams through a vectorized map_batches filter with pruned columns.
Nothing lands on the driver; consume with write_parquet / iter_batches.

Ref analog: the plugin's full-index read-back paths (EntityDao.find*
over whole types); scale analog: dataset export jobs that feed training
pipelines from a filtered index.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .search import Searcher


class _HitFilter:
    """Actor-pool stage: unpack the broadcast hit bitmask once per actor
    (__init__), filter each docstore batch by a vectorized doc_id gather
    (__call__). Zero-copy Arrow in/out."""

    def __init__(self, packed_ref, n_docs: int):
        packed = ray.get(packed_ref) if not isinstance(
            packed_ref, np.ndarray
        ) else packed_ref
        self.mask = np.unpackbits(packed, count=n_docs).astype(bool)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(self.mask[ids]))


def export_hits(
    index_dir: str,
    query: str,
    columns: list[str] | None = None,
    where: dict | None = None,
    mode: str = "or",
    must_not: str | None = None,
    concurrency: int = 4,
    batch_size: int = 8192,
    slice_id: int | None = None,
    slice_max: int | None = None,
) -> rd.Dataset:
    """Stream EVERY doc matching ``query`` (posting-union hit set, the
    same restriction composition as search: where / mode / must_not /
    tombstones) out of the docstore as a lazy Dataset with pruned
    columns. The bitmask ships to the actor pool once; per-batch work is
    one gather + one Arrow filter.

    ``slice_id``/``slice_max`` is the ES sliced-scroll analog: slice
    ``i`` of ``max`` keeps exactly the hits with dense doc_id % max == i
    (ES slices on a doc-id hash; dense ids here are already uniform), so
    ``max`` independent consumers partition one result set with no
    coordination and their union is exactly the unsliced export. The
    slice restricts the broadcast MASK — the docstore read is shared
    machinery either way."""
    s = Searcher(index_dir)
    hits = s._hit_mask(query, where, mode, must_not)
    if hits is None:
        hits = np.zeros(s.N, dtype=bool)
    if slice_id is not None and slice_max is None:
        raise ValueError("slice_id requires slice_max")
    if slice_max is not None:
        if slice_id is None or not (0 <= slice_id < slice_max):
            raise ValueError("slice_id must be in [0, slice_max)")
        hits = hits & (np.arange(hits.size) % slice_max == slice_id)
    packed_ref = ray.put(np.packbits(hits))
    cols = None
    if columns is not None:
        cols = list(columns)
        if "doc_id" not in cols:
            cols = ["doc_id"] + cols
    ds = rd.read_parquet(os.path.join(index_dir, "docstore"), columns=cols)
    return ds.map_batches(
        _HitFilter,
        fn_constructor_args=(packed_ref, int(hits.size)),
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling pool: min 1 actor so the stage never starves the
        # upstream read of CPU slots on small clusters
        concurrency=(1, concurrency),
    )
