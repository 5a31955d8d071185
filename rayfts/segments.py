"""Segmented (multi-node) index builds — the 10^12-turn deployment shape.

SCALE.md: at 10^12 docs one global index is impractical; the deployment
builds one independent, resumable SEGMENT per key range (e.g. one per
date-partitioned export, ~10^8 docs each) and serves queries through
``search.MultiSearcher``, which merges per-segment top-k under GLOBAL
statistics — bit-identical to a single index over the union corpus
(pinned by tests/test_multisearcher.py).

This module packages that composition as an API:

  dirs = build_segments([files_2024, files_2025], root, cfg)   # S1/S7
  ms   = open_multisearcher(root, shared=True)                 # ST5/T1

Reference analog: ES shards the index 5 ways and fans queries out across
shards with merged global stats (plugin.properties:8; Lucene per-segment
search) — here segments are explicit doc-range units with their own
manifests, checkpoints and tombstones.

Segment inputs MUST cover disjoint, ascending key ranges in list order
(the W2 ordering invariant lifted to segment granularity): global doc ids
are segment offset + local dense ids, so an overlap would break the
global (conv_id, turn_idx) order. This is VERIFIED from the built
docstores (first/last key of each segment), never assumed — overlapping
inputs raise before a manifest-complete root is published.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from .build import build_index
from .config import IndexJobConfig

ROOT_MANIFEST = "segments.json"


def _segment_key_range(index_dir: str, key_cols) -> tuple | None:
    """(first_key, last_key) of a built segment, read from its docstore's
    first/last partition files only (two small column-pruned reads)."""
    from .manifest import load_manifest

    m = load_manifest(index_dir)
    parts = m["docstore"]["partitions"]
    if not parts:
        return None
    cols = list(key_cols)
    first = pq.read_table(os.path.join(index_dir, parts[0]["file"]), columns=cols)
    last = pq.read_table(os.path.join(index_dir, parts[-1]["file"]), columns=cols)
    lo = tuple(first[c][0].as_py() for c in cols)
    hi = tuple(last[c][last.num_rows - 1].as_py() for c in cols)
    return lo, hi


def build_segments(
    sources: list,
    root_dir: str,
    cfg: IndexJobConfig | None = None,
    rows_per_part: int = 250_000,
) -> list[str]:
    """Build one index segment per entry of ``sources`` (each a parquet
    path/list or Dataset) under ``root_dir/segment-NNNN``; returns the
    segment dirs in order. Each segment is a full, independently
    resumable build (cfg.resume skips its finished units). After all
    builds, key ranges are verified disjoint-ascending across segments
    and a root manifest is published atomically."""
    cfg = cfg or IndexJobConfig()
    os.makedirs(root_dir, exist_ok=True)
    dirs: list[str] = []
    for i, src in enumerate(sources):
        d = os.path.join(root_dir, f"segment-{i:04d}")
        build_index(src, index_dir=d, cfg=cfg.replace(index_dir=d),
                    rows_per_part=rows_per_part)
        dirs.append(d)
    prev_hi = None
    ranges = []
    for d in dirs:
        rng = _segment_key_range(d, cfg.key_cols)
        ranges.append(rng)
        if rng is None:
            continue
        lo, hi = rng
        if prev_hi is not None and lo <= prev_hi:
            raise ValueError(
                f"segment key ranges overlap: {d} starts at {lo!r} but a "
                f"previous segment ends at {prev_hi!r} — segment inputs "
                "must cover disjoint ascending key ranges in list order"
            )
        prev_hi = hi
    tmp = os.path.join(root_dir, ROOT_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "segments": [os.path.basename(d) for d in dirs],
                "key_cols": list(cfg.key_cols),
                "key_ranges": [
                    [list(r[0]), list(r[1])] if r else None for r in ranges
                ],
            },
            f,
        )
    os.replace(tmp, os.path.join(root_dir, ROOT_MANIFEST))
    return dirs


def append_segment(
    root_dir: str,
    source,
    cfg: IndexJobConfig | None = None,
    rows_per_part: int = 250_000,
) -> str:
    """Incremental ingest: index ``source`` as a NEW segment of an
    existing segment root and republish the root manifest atomically —
    the ES bulk-index-then-refresh lifecycle (new docs land in a fresh
    segment; readers see them only at the manifest swap, never a
    half-built segment). The new segment's key range must start after
    the current last segment's (the disjoint-ascending invariant
    build_segments enforces); queries over the reopened MultiSearcher
    are bit-identical to a single fresh build over the union corpus
    (global-stats merge)."""
    cfg = cfg or IndexJobConfig()
    path = os.path.join(root_dir, ROOT_MANIFEST)
    with open(path) as f:
        meta = json.load(f)
    if list(cfg.key_cols) != list(meta["key_cols"]):
        raise ValueError(
            f"append_segment key_cols {list(cfg.key_cols)!r} disagree "
            f"with the root's {meta['key_cols']!r}"
        )
    i = len(meta["segments"])
    d = os.path.join(root_dir, f"segment-{i:04d}")
    build_index(source, index_dir=d, cfg=cfg.replace(index_dir=d),
                rows_per_part=rows_per_part)
    rng = _segment_key_range(d, cfg.key_cols)
    prev = [r for r in meta["key_ranges"] if r is not None]
    if rng is not None and prev:
        prev_hi = tuple(prev[-1][1])
        if tuple(rng[0]) <= prev_hi:
            raise ValueError(
                f"appended segment starts at {rng[0]!r} but the root "
                f"ends at {prev_hi!r} — incremental segments must cover "
                "a strictly later key range"
            )
    meta["segments"].append(os.path.basename(d))
    meta["key_ranges"].append(
        [list(rng[0]), list(rng[1])] if rng else None
    )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)
    return d


def open_multisearcher(root_dir: str, shared: bool = False):
    """Open a MultiSearcher over a built segment root. ``shared=True``
    decodes every segment into the object store once (SharedIndexHandle
    per segment — the per-node zero-copy path)."""
    from .search import MultiSearcher, SharedIndexHandle

    with open(os.path.join(root_dir, ROOT_MANIFEST)) as f:
        meta = json.load(f)
    dirs = [os.path.join(root_dir, name) for name in meta["segments"]]
    if shared:
        return MultiSearcher([SharedIndexHandle(d) for d in dirs])
    return MultiSearcher(dirs)


def open_pit(root_dir: str) -> dict:
    """ES point-in-time (PIT) analog: capture the root's segment list
    AND every segment's tombstone set as they stand right now. Searches
    opened from the returned token (``open_pit_searcher``) see exactly
    this state — a later ``append_segment`` (new segment dir + atomic
    root-manifest swap) or ``delete_docs`` (tombstones.json grows,
    posting files untouched) never leaks in, because segment files are
    immutable once published. This is the keep_alive contract minus
    expiry: the token is a plain dict, serializable, valid as long as
    the captured segment dirs exist (i.e. until a compaction replaces
    the root — the ES analog being a merged-away PIT)."""
    from .admin import excluded_docs

    with open(os.path.join(root_dir, ROOT_MANIFEST)) as f:
        meta = json.load(f)
    return {
        "root": root_dir,
        "segments": list(meta["segments"]),
        "excluded": [
            excluded_docs(os.path.join(root_dir, name))
            for name in meta["segments"]
        ],
    }


def open_pit_searcher(pit: dict):
    """MultiSearcher pinned to a PIT token from ``open_pit``: exactly
    the captured segments with exactly the captured tombstones —
    bit-identical results to the moment the PIT was opened."""
    from .search import MultiSearcher

    dirs = [os.path.join(pit["root"], name) for name in pit["segments"]]
    return MultiSearcher(dirs, excluded=pit["excluded"])


__all__ = [
    "append_segment", "build_segments", "open_multisearcher",
    "open_pit", "open_pit_searcher", "ROOT_MANIFEST",
]
