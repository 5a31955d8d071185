"""Segment compaction — merge built index segments into ONE index,
purging tombstones.

The Lucene ``SegmentMerger`` / ``forceMerge(1)`` + ``expungeDeletes``
analog (ES ``_forcemerge``): the reference's ES cluster merges Lucene
segments continuously in the background after the osmosis bulk load
(dao/EntityDao.java bulk writes land in segments; the refresh in
service/IndexAdminService.java:80-83 publishes them). Here segments are
the explicit per-key-range units produced by ``segments.build_segments``
(or any independent ``build_index`` runs over disjoint ascending key
ranges, in list order), and compaction is an offline Ray job:

- docstore: live rows re-partitioned into dense ``rows_per_part`` ranges,
  doc_ids renumbered to the dense global order (tombstoned rows dropped);
- postings: each term-bucket file is decoded ONCE per segment
  (vectorized stream decode), tombstoned postings dropped, doc ids
  remapped, and the streams re-merged through the SAME reduce core the
  build uses (``build._merge_posting_streams``) — so the compacted bucket
  files are BYTE-IDENTICAL to a fresh ``build_index`` over the
  concatenated live input (pinned by tests/test_compact.py);
- norms/stats/manifest recomputed; the output carries no tombstones.

Scale shape: one Ray task per output docstore partition + one per term
bucket, each touching only the input files that overlap its range; the
only broadcast is the dense live-dl array (int32 per doc, same as the
build's). No stage materializes the corpus on the driver.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .build import (
    FORMAT_VERSION,
    _empty_postings_table,
    _merge_posting_streams,
    _write_bucket_file,
    _write_norms,
)
from .manifest import (
    load_manifest,
    publish_manifest,
    read_checkpoints,
    write_checkpoint,
)


def _concat_binary(col) -> np.ndarray:
    """Concatenate a pa.binary() column's value bytes into one contiguous
    uint8 array (buffer-level — no per-row Python slicing)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for a in chunks:
        if len(a) == 0:
            continue
        offs = np.frombuffer(a.buffers()[1], np.int32)[
            a.offset : a.offset + len(a) + 1
        ]
        data = np.frombuffer(a.buffers()[2], np.uint8)
        parts.append(data[offs[0] : offs[-1]])
    if not parts:
        return np.empty(0, np.uint8)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _decode_bucket_table(t: pa.Table, positions: bool):
    """Bucket parquet -> (terms, df, docs_abs, tfs, pos): one vectorized
    stream decode for the WHOLE file (per-term boundaries are analytic —
    df for doc/tf streams, cf for the occurrence stream)."""
    from .codec import segmented_delta_decode, varint_decode

    df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    seg_starts = np.zeros(df.size, np.int64)
    np.cumsum(df[:-1], out=seg_starts[1:])
    gaps = varint_decode(_concat_binary(t["doc_bytes"]))
    docs = segmented_delta_decode(gaps, seg_starts)
    tfs = varint_decode(_concat_binary(t["tf_bytes"])).astype(np.int32)
    pos = None
    if positions:
        pos = varint_decode(_concat_binary(t["pos_bytes"])).astype(np.uint32)
    terms = t["term"].combine_chunks()
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.chunk(0) if terms.num_chunks else pa.array([], pa.string())
    return terms, df, docs, tfs, pos


def _tomb_mask(docs: np.ndarray, tomb: np.ndarray) -> np.ndarray:
    """Live mask for ``docs`` against the sorted tombstone array."""
    idx = np.searchsorted(tomb, docs)
    hit = np.zeros(docs.size, dtype=bool)
    inb = idx < tomb.size
    hit[inb] = tomb[idx[inb]] == docs[inb]
    return ~hit


@ray.remote(num_returns=2)
def _live_dl(segment_dirs: list, tombs: list, n_docs_list: list):
    """Dense dl array over the compacted (live, renumbered) doc space +
    its total — the one broadcast the bucket merges need (same shape as
    the build's _assemble_dl)."""
    parts = []
    for d, tomb, n in zip(segment_dirs, tombs, n_docs_list):
        dl = np.zeros(n, np.int32)
        ndir = os.path.join(d, "norms")
        if os.path.isdir(ndir) and n:
            t = pq.read_table(ndir)
            dl[t["doc_id"].to_numpy()] = t["dl"].to_numpy()
        if tomb.size:
            keep = np.ones(n, dtype=bool)
            keep[tomb] = False
            dl = dl[keep]
        parts.append(dl)
    out = np.concatenate(parts) if parts else np.zeros(0, np.int32)
    return out, int(out.sum())


@ray.remote
def _compact_docstore_part(
    part_id: int, lo: int, hi: int, seg_plans: list,
    docstore_dir: str, norms_dir: str, out_dir: str, dl: np.ndarray,
) -> dict:
    """Assemble output docstore partition [lo, hi) (new dense doc ids)
    from the segment partition files that overlap it, dropping tombstoned
    rows and renumbering; writes the partition + its norms slice
    atomically and checkpoints (resume granularity = partition).

    ``seg_plans`` entries: (segment_dir, offset, live, tomb, part_files)
    with part_files = [(relpath, min_doc_id, max_doc_id), ...].
    """
    pieces = []
    for seg_dir, offset, live, tomb, part_files in seg_plans:
        a = max(lo, offset) - offset          # local live-rank range [a, b)
        b = min(hi, offset + live) - offset
        if a >= b:
            continue
        # old-id bounds of live ranks [a, b): old(r) = r + |{t <= old(r)}|,
        # solved with t_adj = tomb - arange (non-decreasing)
        if tomb.size:
            t_adj = tomb - np.arange(tomb.size, dtype=np.int64)
            old_lo = a + int(np.searchsorted(t_adj, a, side="right"))
            old_hi = (b - 1) + int(np.searchsorted(t_adj, b - 1, side="right"))
        else:
            old_lo, old_hi = a, b - 1
        tabs = [
            pq.read_table(os.path.join(seg_dir, rel))
            for rel, mn, mx in part_files
            if mn <= old_hi and mx >= old_lo
        ]
        t = pa.concat_tables(tabs)
        old = t["doc_id"].to_numpy()
        if tomb.size:
            keep = _tomb_mask(old, tomb)
            rank = old - np.searchsorted(tomb, old, side="left")
            sel = keep & (rank >= a) & (rank < b)
        else:
            rank = old
            sel = (rank >= a) & (rank < b)
        t = t.filter(pa.array(sel))
        new_ids = rank[sel] + offset  # global live rank IS the new id
        t = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(new_ids, pa.int64()),
        )
        pieces.append(t)
    out = pa.concat_tables(pieces).combine_chunks()
    if out.num_rows != hi - lo:
        raise RuntimeError(
            f"compaction partition {part_id} assembled {out.num_rows} rows, "
            f"expected {hi - lo} — inconsistent segment inputs"
        )
    fname = f"part-{part_id:06d}.parquet"
    final = os.path.join(docstore_dir, fname)
    tmp = final + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, final)
    with open(final, "rb") as f:
        checksum = hashlib.md5(f.read()).hexdigest()
    _write_norms(
        norms_dir, pa.array(np.arange(lo, hi, dtype=np.int64)), dl[lo:hi]
    )
    info = {
        "part_id": part_id,
        "file": f"docstore/{fname}",
        "rows": out.num_rows,
        "min_doc_id": lo,
        "max_doc_id": hi - 1,
        "checksum": checksum,
        "bytes": os.path.getsize(final),
    }
    write_checkpoint(out_dir, "docstore", f"part-{part_id:06d}", info)
    return info


@ray.remote
def _compact_bucket(
    bucket_id: int, seg_buckets: list, positions: bool,
    postings_dir: str, out_dir: str, dl: np.ndarray,
) -> dict:
    """Merge one term bucket across segments: decode each segment's bucket
    file once, drop tombstoned postings (occurrence groups travel with
    their posting), remap doc ids to the compacted dense space, and
    re-encode through the build's shared reduce core — byte-identical
    output to a fresh build over the live union.

    ``seg_buckets`` entries: (bucket_path | None, offset, tomb).
    """
    terms_p, df_p, docs_p, tfs_p, pos_p = [], [], [], [], []
    for path, offset, tomb in seg_buckets:
        if path is None or not os.path.exists(path):
            continue
        t = pq.read_table(path)
        if t.num_rows == 0:
            continue
        terms, df, docs, tfs, pos = _decode_bucket_table(t, positions)
        if tomb.size:
            keep = _tomb_mask(docs, tomb)
            row_starts = np.zeros(df.size, np.int64)
            np.cumsum(df[:-1], out=row_starts[1:])
            df_new = np.add.reduceat(keep.astype(np.int64), row_starts)
            if pos is not None:
                pos = pos[np.repeat(keep, tfs)]
            new_docs = (
                docs[keep]
                - np.searchsorted(tomb, docs[keep], side="left")
                + offset
            )
            tfs = tfs[keep]
            nz = df_new > 0
            if not nz.any():
                continue
            terms = terms.filter(pa.array(nz))
            df = df_new[nz]
            docs = new_docs
        else:
            docs = docs + offset
        terms_p.append(terms)
        df_p.append(df)
        docs_p.append(docs)
        tfs_p.append(tfs)
        if pos is not None:
            pos_p.append(pos)
    if not terms_p:
        merged = _empty_postings_table(positions)
    else:
        merged = _merge_posting_streams(
            terms_p, df_p, docs_p, tfs_p, pos_p, dl, bucket_id, positions
        )
    return _write_bucket_file(merged, postings_dir, out_dir, bucket_id)


def compact_segments(
    segment_dirs: list[str],
    out_dir: str,
    rows_per_part: int = 250_000,
    resume: bool = False,
    extra_tombstones: list | None = None,
) -> dict:
    """Compact built segments (disjoint ascending key ranges, in list
    order) into one published index at ``out_dir``; tombstones are purged
    and doc ids renumbered densely. Returns the published manifest.

    ``extra_tombstones`` (one sequence of segment-local doc ids per
    segment, or None) purges additional docs WITHOUT mutating the input
    segments — the ES delete_by_query + _forcemerge composition.

    Invariants carried over from the inputs are VERIFIED, not assumed:
    format_version / term_buckets / k1 / b / positions / text & key cols
    must agree across segments, and (when >1 segment) docstore key ranges
    must be disjoint ascending — same check as segments.build_segments.
    """
    from .admin import excluded_docs

    if not segment_dirs:
        raise ValueError("compact_segments needs at least one segment dir")
    mans = [load_manifest(d) for d in segment_dirs]
    head = mans[0]
    for d, m in zip(segment_dirs, mans):
        for k in ("format_version", "term_buckets", "k1", "b", "positions",
                  "text_col", "key_cols", "stopwords"):
            if m.get(k) != head.get(k):
                raise ValueError(
                    f"segment {d} disagrees on {k!r}: {m.get(k)!r} != "
                    f"{head.get(k)!r} — segments must share one build config"
                )
    if len(segment_dirs) > 1 and head.get("key_cols"):
        from .segments import _segment_key_range

        prev_hi = None
        for d in segment_dirs:
            rng = _segment_key_range(d, head["key_cols"])
            if rng is None:
                continue
            lo_k, hi_k = rng
            if prev_hi is not None and lo_k <= prev_hi:
                raise ValueError(
                    f"segment key ranges overlap at {d}: {lo_k!r} <= "
                    f"{prev_hi!r} — compaction preserves global key order"
                )
            prev_hi = hi_k

    t_start = time.perf_counter()
    metrics: dict = {}
    if os.path.isdir(out_dir) and not resume:
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    n_docs_list = [m["n_docs"] for m in mans]
    if extra_tombstones is not None and len(extra_tombstones) != len(segment_dirs):
        raise ValueError("extra_tombstones must have one entry per segment")
    tombs = []
    for i, d in enumerate(segment_dirs):
        t = set(excluded_docs(d))
        if extra_tombstones is not None and extra_tombstones[i] is not None:
            t.update(int(x) for x in extra_tombstones[i])
        tombs.append(np.array(sorted(t), dtype=np.int64))
    lives = [n - t.size for n, t in zip(n_docs_list, tombs)]
    offsets = np.zeros(len(lives) + 1, np.int64)
    np.cumsum(lives, out=offsets[1:])
    n_docs = int(offsets[-1])
    positions = bool(head.get("positions"))
    B = head["term_buckets"]

    dl_ref, total_dl_ref = _live_dl.remote(
        list(segment_dirs), tombs, n_docs_list
    )

    # ---- docstore + norms: one task per dense output partition ----
    t0 = time.perf_counter()
    docstore_dir = os.path.join(out_dir, "docstore")
    norms_dir = os.path.join(out_dir, "norms")
    os.makedirs(docstore_dir, exist_ok=True)
    seg_plans = [
        (
            d,
            int(offsets[i]),
            int(lives[i]),
            tombs[i],
            [
                (p["file"], p["min_doc_id"], p["max_doc_id"])
                for p in mans[i]["docstore"]["partitions"]
            ],
        )
        for i, d in enumerate(segment_dirs)
    ]
    nparts = (n_docs + rows_per_part - 1) // rows_per_part
    done_parts = read_checkpoints(out_dir, "docstore") if resume else {}
    part_infos, part_futs = [], []
    for p in range(nparts):
        lo, hi = p * rows_per_part, min((p + 1) * rows_per_part, n_docs)
        unit = f"part-{p:06d}"
        fpath = os.path.join(docstore_dir, f"{unit}.parquet")
        if unit in done_parts and os.path.exists(fpath):
            part_infos.append(done_parts[unit])
            continue
        overlapping = [
            sp for sp in seg_plans if sp[1] < hi and sp[1] + sp[2] > lo
        ]
        part_futs.append(
            _compact_docstore_part.remote(
                p, lo, hi, overlapping, docstore_dir, norms_dir, out_dir,
                dl_ref,
            )
        )

    # ---- postings: one task per term bucket ----
    postings_dir = os.path.join(out_dir, "postings")
    done_buckets = read_checkpoints(out_dir, "postings") if resume else {}
    bucket_infos, bucket_futs = [], []
    for b in range(B):
        unit = f"bucket-{b:04d}"
        fpath = os.path.join(postings_dir, f"{unit}.parquet")
        if unit in done_buckets and os.path.exists(fpath):
            bucket_infos.append(done_buckets[unit])
            continue
        seg_buckets = [
            (
                os.path.join(d, "postings", f"bucket-{b:04d}.parquet"),
                int(offsets[i]),
                tombs[i],
            )
            for i, d in enumerate(segment_dirs)
        ]
        bucket_futs.append(
            _compact_bucket.remote(
                b, seg_buckets, positions, postings_dir, out_dir, dl_ref
            )
        )
    part_infos.extend(ray.get(part_futs))
    part_infos.sort(key=lambda i: i["part_id"])
    metrics["docstore_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    bucket_infos.extend(ray.get(bucket_futs))
    bucket_infos.sort(key=lambda i: i["bucket"])
    metrics["postings_sec"] = round(time.perf_counter() - t0, 3)

    total_dl = ray.get(total_dl_ref)
    n_terms = sum(i["terms"] for i in bucket_infos)
    postings_bytes = sum(i["postings_bytes"] for i in bucket_infos)
    manifest = {
        "format_version": FORMAT_VERSION,
        "n_docs": n_docs,
        "total_dl": total_dl,
        "avgdl": (total_dl / n_docs) if n_docs else 0.0,
        "n_terms": n_terms,
        "postings_bytes": postings_bytes,
        "postings_files": [i["file"] for i in bucket_infos],
        "term_buckets": B,
        "k1": head["k1"],
        "b": head["b"],
        "positions": positions,
        "stopwords": list(head.get("stopwords", [])),
        "key_cols": list(head.get("key_cols", [])),
        "text_col": head.get("text_col", "text"),
        "docstore": {
            "partitions": part_infos,
            "rows": n_docs,
            "num_partitions": nparts,
        },
        "input_files": [
            f for m in mans for f in (m.get("input_files") or [])
        ],
        "compacted_from": [os.path.abspath(d) for d in segment_dirs],
        "purged_tombstones": int(sum(t.size for t in tombs)),
        "metrics": {
            **metrics,
            "turns_indexed": n_docs,
            "terms_indexed": n_terms,
            "postings_bytes": postings_bytes,
            "total_sec": round(time.perf_counter() - t_start, 3),
        },
    }
    publish_manifest(out_dir, manifest)
    return manifest


def compact_index(index_dir: str, out_dir: str, **kw) -> dict:
    """Rewrite ONE index without its tombstoned docs (expungeDeletes /
    forceMerge(1) analog): doc ids renumber densely, stats recompute, the
    output carries no tombstones file."""
    return compact_segments([index_dir], out_dir, **kw)


__all__ = ["compact_segments", "compact_index"]
