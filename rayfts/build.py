"""Index build pipeline — the Ray-Data restatement of the reference's ingest.

Reference lifecycle (SURVEY §3.1, ``ElasticSearchWriterTask.java:40-82``):
Osmosis pushes entities into a bounded queue, 5 worker threads buffer and
bulk-index into Elasticsearch, ways join node coords already indexed, then
post-pass builders run. Here the same dataflow is a streaming Dataset
pipeline; the Elasticsearch/Lucene internals (postings, stats, norms) are
built explicitly:

  read_parquet(transcripts)                                     [S1]
    -> sort by (conv_id, turn_idx)   (range shuffle; W2 order invariant)
    -> dense doc_id per sorted position (block-metadata prefix sum —
       driver touches ONLY per-block row counts, never rows)
    -> docstore partitions written by raw Ray tasks (temp+rename,
       per-partition checkpoint + lineage)                      [S7/M4]
    -> map_batches(AnalyzePartials)  partial postings + norms side-files
                                                                [M9/ST1]
    -> groupby(term).map_groups(merge, sort, delta+varint encode,
       block max-impact)             (the term-sharded shuffle)  [T3/A3]
    -> postings parquet partitioned by bucket=hash(term)%B
    -> global stats (N, avgdl, df) + atomic manifest publish    [A3/S10]

Scale notes (100 TB design):
  * The only all-to-all exchanges are the docID sort and the term groupby;
    the term shuffle moves pre-aggregated partials (O(postings)), not raw
    tokens. Hot terms ("the", tool names) are bounded per-batch by the
    map-side combine; their merge groups are single tasks — the salting
    escape hatch (split encode by doc_id range, concat delta blocks) is
    documented in codec.encode_postings and planned behind
    ``hot_term_df_threshold``.
  * The driver never materializes rows: docID assignment reads block
    metadata only; all writes happen in tasks.
  * Norms/docstore/postings are partitioned files -> a rerun with
    resume=True skips checkpointed units.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .analysis import partial_postings_batch
from .codec import encode_postings
from .config import IndexJobConfig
from .manifest import (
    checkpoint_done,
    load_manifest,
    publish_manifest,
    read_checkpoints,
    write_checkpoint,
)

logger = logging.getLogger(__name__)

FORMAT_VERSION = 1


def term_bucket_py(term: str, num_buckets: int) -> int:
    """Deterministic term -> bucket hash (crc32; stable across processes,
    unlike Python's seeded hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def _term_buckets_arrow(terms: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    arr = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    py = arr.to_pylist()
    return pa.array(
        [zlib.crc32(t.encode("utf-8")) % num_buckets for t in py], type=pa.int32()
    )


# ---------------------------------------------------------------------------
# docID assignment + docstore write
# ---------------------------------------------------------------------------


@ray.remote
def _count_rows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote(num_returns=2)
def _write_docstore_part(
    slices: list,
    part_id: int,
    offset: int,
    docstore_dir: str,
    index_dir: str,
):
    """Assemble one docstore partition from sorted block slices, assign the
    dense doc_id range [offset, offset+rows), write atomically, checkpoint.

    Raises on failure so Ray retries the task — deliberately NOT the
    reference's swallow-bulk-errors behavior (dao/EntityDao.java:155-159);
    a partial index must never be published.

    ``slices`` items are (ObjectRef[pa.Table], start, stop): refs nested in
    a list are NOT auto-dereferenced by Ray, so resolve them here (and only
    the blocks this partition needs).
    """
    tables = [
        ray.get(ref).slice(start, stop - start) for ref, start, stop in slices
    ]
    t = pa.concat_tables(tables)
    ids = pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64))
    t = t.add_column(0, "doc_id", ids)
    fname = f"part-{part_id:06d}.parquet"
    final = os.path.join(docstore_dir, fname)
    tmp = final + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, final)
    with open(final, "rb") as f:
        checksum = hashlib.md5(f.read()).hexdigest()
    info = {
        "part_id": part_id,
        "file": f"docstore/{fname}",
        "rows": t.num_rows,
        "min_doc_id": offset,
        "max_doc_id": offset + t.num_rows - 1,
        "checksum": checksum,
        "bytes": os.path.getsize(final),
    }
    write_checkpoint(index_dir, "docstore", f"part-{part_id:06d}", info)
    return info, t


def _plan_partitions(counts: list[int], rows_per_part: int):
    """Deterministic doc-range partitioning over sorted blocks.

    Returns list of (part_id, offset, [(block_idx, start, stop), ...]).
    Partition p always covers doc_ids [p*R, min((p+1)*R, N)) regardless of
    how the sort chunked the data — this is what makes resume and the
    N-vs-4N scaling runs produce identical partitions (SURVEY §7 hard
    part (a): docID map is a function of the input manifest only).
    """
    total = int(sum(counts))
    if total == 0:
        return []
    nparts = (total + rows_per_part - 1) // rows_per_part
    block_starts = np.concatenate([[0], np.cumsum(counts)])
    plans = []
    for p in range(nparts):
        lo, hi = p * rows_per_part, min((p + 1) * rows_per_part, total)
        slices = []
        for b, (bs, be) in enumerate(zip(block_starts[:-1], block_starts[1:])):
            s, e = max(lo, bs), min(hi, be)
            if s < e:
                slices.append((b, int(s - bs), int(e - bs)))
        plans.append((p, lo, slices))
    return plans


def build_docstore(
    ds: rd.Dataset, index_dir: str, cfg: IndexJobConfig, rows_per_part: int
) -> dict:
    """Sort by key, assign dense doc_ids, write partitioned docstore."""
    docstore_dir = os.path.join(index_dir, "docstore")
    os.makedirs(docstore_dir, exist_ok=True)

    sorted_ds = ds.sort(list(cfg.key_cols))
    mat = sorted_ds.materialize()
    block_refs, counts = [], []
    for bundle in mat.iter_internal_ref_bundles():
        for blk_ref, meta in bundle.blocks:
            block_refs.append(blk_ref)
            counts.append(
                meta.num_rows
                if meta.num_rows is not None
                else ray.get(_count_rows.remote(blk_ref))
            )

    plans = _plan_partitions(counts, rows_per_part)
    done = read_checkpoints(index_dir, "docstore") if cfg.resume else {}
    info_futures, part_refs = [], []
    infos = []
    any_skipped = False
    for part_id, offset, slices in plans:
        unit = f"part-{part_id:06d}"
        if unit in done and os.path.exists(
            os.path.join(docstore_dir, f"{unit}.parquet")
        ):
            infos.append(done[unit])
            any_skipped = True
            continue
        info_ref, tbl_ref = _write_docstore_part.remote(
            [(block_refs[b], s, e) for b, s, e in slices],
            part_id,
            offset,
            docstore_dir,
            index_dir,
        )
        info_futures.append(info_ref)
        part_refs.append(tbl_ref)
    infos.extend(ray.get(info_futures))
    infos.sort(key=lambda i: i["part_id"])
    total_rows = sum(i["rows"] for i in infos)
    return {
        "partitions": infos,
        "rows": total_rows,
        "num_partitions": len(infos),
        # fresh build: id-assigned blocks are still in the object store —
        # the postings stage consumes them directly (no disk round-trip).
        # On resume some partitions were skipped, so fall back to reading
        # the docstore files (lineage-correct either way).
        "_block_refs": None if any_skipped else part_refs,
    }


# ---------------------------------------------------------------------------
# analyze -> partial postings (stateful actor pool) + norms side-files
# ---------------------------------------------------------------------------


def analyze_partials_fn(
    batch: pa.Table, norms_dir: str, text_col: str, num_buckets: int = 64
) -> pa.Table:
    """Analyze stage (SURVEY M9/ST1), run as stateless elastic tasks.

    Emits partial-postings rows keyed by ``bucket = crc32(term) % B`` — the
    merge shuffles on the BUCKET, not the term: range-partitioning on raw
    terms puts the (alphabetically adjacent) Zipf-head terms into one range
    and creates a straggler reduce partition (observed: one 436 MB block,
    18.9 s task); hashing mixes hot terms evenly across buckets.

    As a side effect writes the batch's norms (doc_id, dl) file named by
    its doc_id range — deterministic and disjoint across batches, so
    retries overwrite idempotently.
    """
    partials, doc_lens = partial_postings_batch(batch, text_col=text_col)
    partials = partials.append_column(
        "bucket", _term_buckets_arrow(partials["term"], num_buckets)
    )
    doc_ids = batch["doc_id"].combine_chunks()
    lo = pc.min(doc_ids).as_py()
    hi = pc.max(doc_ids).as_py()
    os.makedirs(norms_dir, exist_ok=True)
    norms = pa.table({"doc_id": doc_ids, "dl": pa.array(doc_lens, type=pa.int32())})
    tmp = os.path.join(norms_dir, f".dl-{lo}-{hi}.tmp")
    pq.write_table(norms, tmp)
    os.replace(tmp, os.path.join(norms_dir, f"dl-{lo}-{hi}.parquet"))
    return partials


# ---------------------------------------------------------------------------
# term merge -> encoded segment
# ---------------------------------------------------------------------------


def merge_encode_bucket(group: pa.Table) -> pa.Table:
    """map_groups fn: ALL partials of one hash bucket -> encoded postings
    rows (one per term).

    Avoids Arrow take/sort on chunked list columns entirely (observed to be
    10x+ slower than the encode itself on 200+-chunk groups): walks each
    chunk's flattened values + offsets, gathers per-term slices, then
    delta+varint encodes per term.
    """
    if group.num_rows == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int32()),
                "df": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
                "doc_bytes": pa.array([], pa.binary()),
                "tf_bytes": pa.array([], pa.binary()),
                "block_bytes": pa.array([], pa.binary()),
            }
        )
    bucket = int(group["bucket"][0].as_py())
    per_term: dict[str, list] = {}
    # operate per original chunk: flatten is cheap per chunk, and no Arrow
    # take/sort ever touches the list columns
    doc_col = group["doc_ids"]
    tf_col = group["tfs"]
    dl_col = group["dls"]
    term_col = group["term"]
    for ci in range(doc_col.num_chunks):
        dch = doc_col.chunk(ci)
        tch = tf_col.chunk(ci)
        lch = dl_col.chunk(ci)
        terms_py = term_col.chunk(ci).to_pylist()
        fd = dch.flatten().to_numpy(zero_copy_only=False)
        ft = tch.flatten().to_numpy(zero_copy_only=False)
        fl = lch.flatten().to_numpy(zero_copy_only=False)
        # offsets of a SLICED ListArray are raw (not rebased to flatten()'s
        # output) — rebase by the first offset
        offs = dch.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        for i, term in enumerate(terms_py):
            v0, v1 = offs[i], offs[i + 1]
            per_term.setdefault(term, []).append((fd[v0:v1], ft[v0:v1], fl[v0:v1]))
    out_terms, out_df, out_cf = [], [], []
    out_doc_b, out_tf_b, out_blk_b = [], [], []
    for term in sorted(per_term):
        slices = per_term[term]
        doc_ids = np.concatenate([x[0] for x in slices]).astype(np.int64)
        tfs = np.concatenate([x[1] for x in slices]).astype(np.int32)
        dls = np.concatenate([x[2] for x in slices]).astype(np.int32)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        doc_bytes, tf_bytes, block_bytes = encode_postings(doc_ids, tfs, dls)
        out_terms.append(term)
        out_df.append(int(doc_ids.size))
        out_cf.append(int(tfs.sum()))
        out_doc_b.append(doc_bytes)
        out_tf_b.append(tf_bytes)
        out_blk_b.append(block_bytes)
    return pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "bucket": pa.array([bucket] * len(out_terms), pa.int32()),
            "df": pa.array(out_df, pa.int64()),
            "cf": pa.array(out_cf, pa.int64()),
            "doc_bytes": pa.array(out_doc_b, pa.binary()),
            "tf_bytes": pa.array(out_tf_b, pa.binary()),
            "block_bytes": pa.array(out_blk_b, pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# full build
# ---------------------------------------------------------------------------


def build_index(
    source: str | list[str] | rd.Dataset,
    index_dir: str | None = None,
    cfg: IndexJobConfig | None = None,
    rows_per_part: int = 250_000,
) -> dict:
    """End-to-end index build. Returns the published manifest (dict).

    ``source`` is a parquet path/paths or an existing Dataset with the
    transcript schema. Ray must already be initialized by the caller
    (driver contract) or auto-inits on first Dataset op.
    """
    cfg = cfg or IndexJobConfig()
    index_dir = index_dir or cfg.index_dir
    metrics: dict = {}
    t_start = time.perf_counter()

    if os.path.isdir(index_dir) and cfg.overwrite and not cfg.resume:
        # ref drop-if-exists: service/IndexAdminService.java:22
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    input_files: list[str] = []
    if isinstance(source, rd.Dataset):
        ds = source
    else:
        paths = [source] if isinstance(source, str) else list(source)
        for p in paths:
            if os.path.isdir(p):
                input_files.extend(
                    sorted(
                        os.path.join(p, f)
                        for f in os.listdir(p)
                        if f.endswith(".parquet")
                    )
                )
            else:
                input_files.append(p)
        # parallelize the read/sort regardless of input file count: a
        # 3-file corpus would otherwise become <=3 blocks and the sort's
        # map+reduce would run on 1-3 tasks (observed: 1-task sort at sf0.1)
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        ds = rd.read_parquet(input_files, override_num_blocks=max(ncpu * 2, len(input_files)))

    # ---- stage 1: docstore (sort + dense doc_id + partitioned write) ----
    t0 = time.perf_counter()
    if cfg.resume and checkpoint_done(index_dir, "stage", "docstore"):
        doc_info = read_checkpoints(index_dir, "stage")["docstore"]["result"]
    else:
        doc_info = build_docstore(ds, index_dir, cfg, rows_per_part)
        write_checkpoint(
            index_dir,
            "stage",
            "docstore",
            {"result": {k: v for k, v in doc_info.items() if not k.startswith("_")}},
        )
    metrics["docstore_sec"] = round(time.perf_counter() - t0, 3)
    n_docs = doc_info["rows"]

    # ---- stage 2: analyze -> partials -> term merge -> postings ----
    t0 = time.perf_counter()
    postings_dir = os.path.join(index_dir, "postings")
    norms_dir = os.path.join(index_dir, "norms")
    if not (cfg.resume and checkpoint_done(index_dir, "stage", "postings")):
        for stale in (postings_dir, norms_dir):
            if os.path.isdir(stale):
                shutil.rmtree(stale)  # batch boundaries may differ run-to-run
        block_refs = doc_info.get("_block_refs")
        if block_refs:
            src = rd.from_arrow_refs(block_refs).map_batches(
                lambda t: t.select(["doc_id", cfg.text_col]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            src = rd.read_parquet(
                os.path.join(index_dir, "docstore"),
                columns=["doc_id", cfg.text_col],
            )
        analyzed = src.map_batches(
            analyze_partials_fn,
            fn_kwargs={
                "norms_dir": norms_dir,
                "text_col": cfg.text_col,
                "num_buckets": cfg.term_buckets,
            },
            batch_format="pyarrow",
            batch_size=cfg.analyze_batch_size,
            zero_copy_batch=True,
        )
        merged = analyzed.groupby("bucket").map_groups(
            merge_encode_bucket,
            batch_format="pyarrow",
        )
        merged.write_parquet(postings_dir, partition_cols=["bucket"])
        write_checkpoint(index_dir, "stage", "postings", {})
    metrics["postings_sec"] = round(time.perf_counter() - t0, 3)

    # ---- stage 3: global stats + manifest publish (refresh analog) ----
    t0 = time.perf_counter()
    norms_tbl = pq.read_table(norms_dir, columns=["dl"])
    total_dl = int(pc.sum(norms_tbl["dl"]).as_py() or 0)
    n_norms = norms_tbl.num_rows
    post_meta = pq.read_table(postings_dir, columns=["df", "cf"])
    n_terms = post_meta.num_rows
    postings_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(postings_dir)
        for f in files
    )
    metrics["stats_sec"] = round(time.perf_counter() - t0, 3)
    if n_norms != n_docs:
        raise RuntimeError(
            f"norms rows {n_norms} != docstore rows {n_docs} — inconsistent build"
        )

    doc_info = {k: v for k, v in doc_info.items() if not k.startswith("_")}
    manifest = {
        "format_version": FORMAT_VERSION,
        "n_docs": n_docs,
        "total_dl": total_dl,
        "avgdl": (total_dl / n_docs) if n_docs else 0.0,
        "n_terms": n_terms,
        "postings_bytes": postings_bytes,
        "term_buckets": cfg.term_buckets,
        "k1": cfg.k1,
        "b": cfg.b,
        "key_cols": list(cfg.key_cols),
        "text_col": cfg.text_col,
        "docstore": doc_info,
        "input_files": input_files,
        "metrics": {
            **metrics,
            "turns_indexed": n_docs,
            "terms_indexed": n_terms,
            "postings_bytes": postings_bytes,
            "total_sec": round(time.perf_counter() - t_start, 3),
        },
    }
    publish_manifest(index_dir, manifest)
    return manifest


__all__ = ["build_index", "build_docstore", "term_bucket_py", "load_manifest"]
