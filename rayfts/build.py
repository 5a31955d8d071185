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
    -> per-partition analyze: partials pre-aggregated per batch, split
       into bucket=fnv1a(term)%B shards; norms side-files       [M9/ST1]
    -> hand-rolled hash shuffle: one merge task per bucket gathers its
       shard from every analyze output, merges, doc_id-sorts,
       delta+varint encodes with block max-impact metadata      [T3/A3]
    -> postings/bucket-NNNN.parquet (one file per bucket,
       per-bucket checkpoint)
    -> global stats (N, avgdl, df) + atomic manifest publish    [A3/S10]

Scale notes (100 TB design):
  * The only all-to-all exchanges are the docID sort and the postings
    bucket shuffle; the bucket shuffle moves pre-aggregated partials
    (O(postings), not O(token occurrences)). Shuffling on hashed buckets
    (not raw terms) spreads the Zipf-head terms evenly — range
    partitioning on terms measured a 436 MB straggler reduce block.
    The bucket exchange is raw Ray tasks (map num_returns=B, reduce
    per bucket): the Dataset groupby expression of the same exchange
    measured 3-10x slower (sort shuffle + chunked-list take) and flat
    8->32 CPU scaling. At 10^12 turns raise term_buckets and add one
    hierarchical combine level per bucket.
  * The driver never materializes rows: docID assignment reads block
    metadata only; all writes happen in tasks.
  * Norms/docstore/postings are partitioned files -> a rerun with
    resume=True skips checkpointed docstore partitions and postings
    buckets individually.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .analysis import partial_stream_batch
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

FORMAT_VERSION = 3  # 3: FNV-1a term bucket hash; 2: flat bucket layout

# FNV-1a 64-bit: chosen over round-1's crc32 because it vectorizes — the
# numpy kernel below hashes a whole Arrow string column with one pass per
# BYTE POSITION (loop length = longest term, vectorized across all terms),
# no per-term Python call in the analyze hot path.
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def term_bucket_py(term: str, num_buckets: int) -> int:
    """Deterministic term -> bucket hash (FNV-1a 64 over UTF-8 bytes;
    stable across processes, unlike Python's seeded hash()). Pure-Python
    reference of the vectorized kernel (property-tested equal)."""
    h = _FNV_OFFSET
    for byte in term.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h % num_buckets


def _term_buckets_arrow(terms: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Vectorized FNV-1a 64 over an Arrow string column: operate directly on
    the UTF-8 data buffer + offsets; one vectorized update per byte
    position j over all terms still longer than j."""
    arr = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.int32())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, lens = offsets[:-1], np.diff(offsets)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max())):
            m = lens > j
            h[m] = (h[m] ^ data[starts[m] + j].astype(np.uint64)) * prime
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32), type=pa.int32())


# ---------------------------------------------------------------------------
# docID assignment + docstore write
# ---------------------------------------------------------------------------


@ray.remote
def _count_rows(block: pa.Table) -> int:
    return block.num_rows


def pack_tags(t: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    """F7 dynamic tags: pack ``cols`` into a ``tags: map<string,string>``
    column (ref ESEntity tags map, ESEntity.java:14,18-22; dynamic mapping
    templates plugin.properties:10-11). Null values are OMITTED from the
    row's map — dynamic-map semantics, vectorized (no per-row Python).
    Entry order per row = declared column order."""
    n = t.num_rows
    rows_l, keyn_l, item_l = [], [], []
    for j, c in enumerate(cols):
        col = pc.cast(t[c], pa.string()).combine_chunks()
        idxs = np.flatnonzero(pc.is_valid(col).to_numpy(zero_copy_only=False))
        rows_l.append(idxs)
        keyn_l.append(np.full(idxs.size, j, dtype=np.int64))
        item_l.append(col.take(pa.array(idxs, pa.int64())))
    rows = np.concatenate(rows_l) if rows_l else np.empty(0, np.int64)
    keyn = np.concatenate(keyn_l) if keyn_l else np.empty(0, np.int64)
    order = np.lexsort((keyn, rows))  # row-major, then declared col order
    keys = pa.array(np.asarray(cols, dtype=object)[keyn[order]], pa.string())
    items = (
        pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in item_l])
        .take(pa.array(order, pa.int64()))
        if item_l
        else pa.array([], pa.string())
    )
    counts = np.bincount(rows, minlength=n) if rows.size else np.zeros(n, np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    tags = pa.MapArray.from_arrays(pa.array(offsets), keys, items)
    return t.append_column("tags", tags)


def tags_lookup(tags_col, key: str):
    """Vectorized map-key lookup: tags['key'] per row (null if absent)."""
    arr = tags_col.combine_chunks() if isinstance(tags_col, pa.ChunkedArray) else tags_col
    return pc.map_lookup(arr, query_key=key, occurrence="first")


@ray.remote
def _assemble_part(slices: list, offset: int, tag_map_cols: tuple = ()) -> pa.Table:
    """Assemble one docstore partition from sorted block slices and assign
    its dense doc_id range [offset, offset+rows).

    ``slices`` items are (ObjectRef[pa.Table], start, stop): refs nested in
    a list are NOT auto-dereferenced by Ray, so resolve them here (and only
    the blocks this partition needs).
    """
    tables = [
        ray.get(ref).slice(start, stop - start) for ref, start, stop in slices
    ]
    t = pa.concat_tables(tables)
    if tag_map_cols:
        t = pack_tags(t, tuple(tag_map_cols))
    ids = pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64))
    return t.add_column(0, "doc_id", ids)


@ray.remote
def _write_docstore_part(
    t: pa.Table, part_id: int, offset: int, docstore_dir: str,
    index_dir: str, key_cols: tuple = (),
) -> dict:
    """Write one assembled partition atomically + checkpoint it. Runs
    CONCURRENTLY with the analyze stage (which consumes the assembled
    table from the object store, not the file).

    Raises on failure so Ray retries the task — deliberately NOT the
    reference's swallow-bulk-errors behavior (dao/EntityDao.java:155-159);
    a partial index must never be published.
    """
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
    if key_cols and t.num_rows:
        # the global sort makes each partition a contiguous key range —
        # record it so point gets prune to owning partitions (lineage
        # metadata, like min/max_doc_id); JSON-safe key types only
        lo = [t[c][0].as_py() for c in key_cols]
        hi = [t[c][t.num_rows - 1].as_py() for c in key_cols]
        if all(isinstance(v, (str, int, float, bool)) for v in lo + hi):
            info["min_key"] = lo
            info["max_key"] = hi
    write_checkpoint(index_dir, "docstore", f"part-{part_id:06d}", info)
    return info


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


def dedup_by_key(ds: rd.Dataset, key_cols, order_col: str = "ts") -> rd.Dataset:
    """Exact key dedup, last-write-wins (SURVEY D1): the ES index-by-_id
    upsert (dao/EntityDao.java:96,114) collapses duplicate keys to one doc.
    Batch analog of "last write": the row with the max ``order_col``
    (ties: stable sort keeps the later input row). One extra key shuffle —
    only enabled via cfg.dedup_keys when inputs may contain duplicates."""

    def keep_last(g: pa.Table) -> pa.Table:
        if g.num_rows == 1:
            return g
        g = g.sort_by([(order_col, "ascending")])
        return g.slice(g.num_rows - 1, 1)

    return ds.groupby(list(key_cols)).map_groups(keep_last, batch_format="pyarrow")


@ray.remote(num_returns=2)
def _load_and_check_sorted(path: str, key_cols: list):
    """Load one input file and verify it is key-sorted (vectorized lexicographic
    non-decreasing check). Returns (meta, table): meta carries first/last key
    + row count so the driver can verify the files chain into a global order
    without touching rows."""
    t = pq.read_table(path)
    n = t.num_rows
    if n == 0:
        return {"sorted": True, "rows": 0, "first": None, "last": None}, t
    decided = np.zeros(n - 1, dtype=bool)
    out_of_order = np.zeros(n - 1, dtype=bool)
    for c in key_cols:
        col = t[c].combine_chunks()
        a, b = col.slice(0, n - 1), col.slice(1)
        lt = pc.less(a, b).to_numpy(zero_copy_only=False)
        gt = pc.greater(a, b).to_numpy(zero_copy_only=False)
        out_of_order |= ~decided & gt
        decided |= lt | gt
    meta = {
        "sorted": not bool(out_of_order.any()),
        "rows": n,
        "first": tuple(t[c][0].as_py() for c in key_cols),
        "last": tuple(t[c][n - 1].as_py() for c in key_cols),
    }
    return meta, t


def _sorted_input_fastpath(input_files: list[str], key_cols) -> tuple | None:
    """Verified sorted-input fast path: if every input file is key-sorted and
    the files chain into disjoint non-decreasing key ranges, the global sort
    shuffle is unnecessary — the files ARE the sorted blocks. This is
    DETECTED (every file's order is checked vectorized), never assumed; any
    violation falls back to the sort. Typical win: range-partitioned
    exports, log-structured corpora (the docstore stage drops from
    sort-shuffle cost to a parallel read)."""
    pairs = [
        _load_and_check_sorted.remote(f, list(key_cols)) for f in input_files
    ]
    metas = ray.get([p[0] for p in pairs])
    if not all(m["sorted"] for m in metas):
        return None
    nonempty = [(m, pairs[i][1]) for i, m in enumerate(metas) if m["rows"]]
    nonempty.sort(key=lambda mt: mt[0]["first"])
    for (m1, _), (m2, _) in zip(nonempty[:-1], nonempty[1:]):
        if m1["last"] > m2["first"]:
            return None  # overlapping ranges -> need the real sort
    return (
        [t_ref for _, t_ref in nonempty],
        [m["rows"] for m, _ in nonempty],
    )


def build_docstore(
    ds: rd.Dataset,
    index_dir: str,
    cfg: IndexJobConfig,
    rows_per_part: int,
    input_files: list[str] | None = None,
) -> dict:
    """Sort by key (or take the verified sorted-input fast path), assign
    dense doc_ids, write partitioned docstore."""
    docstore_dir = os.path.join(index_dir, "docstore")
    os.makedirs(docstore_dir, exist_ok=True)

    if cfg.dedup_keys:
        ds = dedup_by_key(ds, cfg.key_cols, cfg.dedup_order_col)

    fast = None
    if input_files and not cfg.dedup_keys and cfg.detect_sorted_input:
        fast = _sorted_input_fastpath(input_files, cfg.key_cols)
    if fast is not None:
        block_refs, counts = fast
    else:
        mat = ds.sort(list(cfg.key_cols)).materialize()
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
    info_futures = []
    infos = []
    part_srcs = []  # per-partition analyze source, in plan order
    for part_id, offset, slices in plans:
        unit = f"part-{part_id:06d}"
        fpath = os.path.join(docstore_dir, f"{unit}.parquet")
        if unit in done and os.path.exists(fpath):
            infos.append(done[unit])
            # checkpointed partition: analyze re-reads the parquet file
            part_srcs.append(fpath)
            continue
        tbl_ref = _assemble_part.remote(
            [(block_refs[b], s, e) for b, s, e in slices], offset,
            cfg.tag_map_cols,
        )
        info_futures.append(
            _write_docstore_part.remote(
                tbl_ref, part_id, offset, docstore_dir, index_dir,
                tuple(cfg.key_cols),
            )
        )
        # fresh/rebuilt partition: the id-assigned table is still in the
        # object store — analyze consumes it directly (no disk round-trip)
        # WHILE the parquet write proceeds concurrently; the write futures
        # are joined before the manifest is published. Carrying the ref
        # here (not doc_info['partitions'], which at analyze time lists
        # only checkpointed partitions) is what keeps a resume with BOTH a
        # docstore partition and a postings bucket missing consistent —
        # analyze must cover every partition or norms != docstore rows.
        part_srcs.append(tbl_ref)
    total_rows = int(sum(counts))
    return {
        "partitions": infos,  # checkpointed (skipped) partitions only, so far
        "rows": total_rows,
        "num_partitions": len(plans),
        "_part_srcs": part_srcs,
        "_info_futures": info_futures,
    }


# ---------------------------------------------------------------------------
# analyze -> partial postings (stateful actor pool) + norms side-files
# ---------------------------------------------------------------------------


def _write_norms(norms_dir: str, doc_ids: pa.Array, doc_lens: np.ndarray) -> None:
    """Norms (doc_id, dl) side-file named by the slice's doc range —
    deterministic and disjoint across batches, so retries overwrite
    idempotently."""
    lo = pc.min(doc_ids).as_py()
    hi = pc.max(doc_ids).as_py()
    os.makedirs(norms_dir, exist_ok=True)
    norms = pa.table({"doc_id": doc_ids, "dl": pa.array(doc_lens, type=pa.int32())})
    tmp = os.path.join(norms_dir, f".dl-{lo}-{hi}.tmp")
    pq.write_table(norms, tmp)
    os.replace(tmp, os.path.join(norms_dir, f"dl-{lo}-{hi}.parquet"))


def _empty_shard() -> dict:
    return {
        "term": pa.array([], pa.string()),
        "df": np.empty(0, np.int64),
        "first_doc": np.empty(0, np.int64),
        "doc_buf": b"",
        "tf_buf": b"",
        "doc_codec": "u16",
        "tf_codec": "u16",
        "pos_buf": b"",
        "pos_codec": "u16",
    }


@ray.remote
def _analyze_partition(
    src,
    norms_dir: str,
    text_col: str,
    num_buckets: int,
    batch_size: int,
    exchange_codec: str = "u16",
    hot_terms: list[str] | None = None,
    index_positions: bool = False,
    stopwords: tuple = (),
    stemmer: str = "",
    shingle_size: int = 0,
    index_prefixes: tuple = (),
):
    """Map side of the hand-rolled hash shuffle: one docstore partition ->
    ``num_buckets`` stream-encoded shard dicts + the partition's dl array
    (``num_buckets + 1`` returns).

    Shard payload (what actually crosses the exchange) is the stream form:
    per shard a term column, per-term posting counts + absolute first doc
    ids (one int64 per row), and two contiguous value buffers — doc-id
    GAPS (0 at each segment start; the absolute start rides in the
    first_doc column) and tfs. Codec per cfg.exchange_codec:

      u16 (default)  : fixed-width little-endian u16 (u32 fallback per
                       stream on overflow) — 4 B/posting vs the 16 B of
                       round-1's list<int64> partials, at pure cast cost.
                       Gaps within one analyze batch are < batch doc span,
                       so u16 is the common case by construction.
      varint         : LEB128 streams, ~1-2 B/posting (~8x cut) — measured
                       1.8x slower end-to-end on this memory-bandwidth-
                       bound single node (extra encode/decode passes), the
                       right knob when the exchange crosses a network.

    The per-posting doc-length stream is dropped from the shuffle entirely
    (the reduce reads a broadcast dl array instead). Shuffling on
    ``bucket = fnv1a64(term) % B`` — not term ranges — keeps the Zipf head
    spread evenly (a term-range partition measured a 436 MB straggler
    block in round 1). Encoding is one vectorized pass over the whole
    partition's stream; per-bucket slicing uses byte lengths computed
    analytically, so no per-term Python runs here.

    The Dataset ``groupby(bucket).map_groups`` expression of this exchange
    measured 3-10x slower at 2.4M turns and showed no CPU scaling 8->32;
    per SURVEY §2 custom-operator rule (c), THE wide shuffle is raw Ray
    tasks. ``src`` is either a pa.Table (object-store handoff from the
    docstore stage) or a parquet file path (resume path).
    """
    from .codec import varint_encode, varint_nbytes

    if isinstance(src, str):
        t = pq.read_table(src, columns=["doc_id", text_col])
    else:
        t = src.select(["doc_id", text_col])
    terms_l, df_l, gaps_l, tfs_l, dl_l, pos_l = [], [], [], [], [], []
    for off in range(0, t.num_rows, batch_size):
        b = t.slice(off, batch_size)
        terms, df, gaps, tfs, dls, pgaps = partial_stream_batch(
            b, text_col=text_col, positions=index_positions,
            stopwords=stopwords, stemmer=stemmer,
            shingle_size=shingle_size, index_prefixes=index_prefixes,
        )
        _write_norms(norms_dir, b["doc_id"].combine_chunks(), dls)
        dl_l.append(dls)
        if len(terms):
            terms_l.append(
                terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
            )
            df_l.append(df)
            gaps_l.append(gaps)
            tfs_l.append(tfs)
            if index_positions:
                pos_l.append(pgaps)
    lo = int(t["doc_id"][0].as_py()) if t.num_rows else 0
    dl_part = {
        "lo": lo,
        "dl": np.concatenate(dl_l) if dl_l else np.empty(0, np.int32),
    }
    hot_terms = hot_terms or []
    n_shards = num_buckets + len(hot_terms)
    if not terms_l:
        return tuple([_empty_shard()] * n_shards) + (dl_part,)
    terms_all = pa.concat_arrays(terms_l)
    df_all = np.concatenate(df_l)
    gaps_all = np.concatenate(gaps_l)
    tfs_all = np.concatenate(tfs_l)
    buckets = _term_buckets_arrow(terms_all, num_buckets).to_numpy()
    if hot_terms:
        # hot terms bypass their natural bucket: shard num_buckets+h carries
        # ONLY hot term h's rows, so the reduce can merge it per docID salt
        # range in parallel tasks (SURVEY §4 skew row)
        hidx = pc.fill_null(
            pc.index_in(terms_all, value_set=pa.array(hot_terms, pa.string())),
            -1,
        ).to_numpy(zero_copy_only=False)
        buckets = np.where(hidx >= 0, num_buckets + hidx, buckets).astype(np.int32)
    order = np.argsort(buckets, kind="stable")
    # vectorized segment gather: reorder both value streams into bucket-
    # sorted row order in one fancy-index pass
    nrows = df_all.size
    seg_starts = np.zeros(nrows, np.int64)
    np.cumsum(df_all[:-1], out=seg_starts[1:])
    lens = df_all[order]
    src_starts = seg_starts[order]
    total = int(lens.sum())
    out_starts = np.zeros(nrows, np.int64)
    np.cumsum(lens[:-1], out=out_starts[1:])
    from .codec import run_ranges

    idx = run_ranges(src_starts, out_starts, total)
    gaps_o = gaps_all[idx]
    tfs_o = tfs_all[idx]
    # positions ride the exchange as a third stream, gathered by the SAME
    # row permutation at OCCURRENCE granularity (posting j owns tfs[j]
    # consecutive values; per-(term,doc) delta groups move intact)
    pos_buf, pos_codec, pos_bb = b"", "u16", None
    if index_positions:
        pos_all = np.concatenate(pos_l) if pos_l else np.empty(0, np.uint32)
        row_occ = np.add.reduceat(tfs_all.astype(np.int64), seg_starts)
        occ_src_starts = np.zeros(nrows, np.int64)
        np.cumsum(row_occ[:-1], out=occ_src_starts[1:])
        occ_lens = row_occ[order]
        occ_out_starts = np.zeros(nrows, np.int64)
        np.cumsum(occ_lens[:-1], out=occ_out_starts[1:])
        idxo = run_ranges(occ_src_starts[order], occ_out_starts, int(pos_all.size))
        pos_o = pos_all[idxo]
        if exchange_codec == "varint":
            pos_buf = varint_encode(pos_o)
            row_pos_nb = np.add.reduceat(varint_nbytes(pos_o), occ_out_starts)
            pos_codec = "varint"
        else:
            pos_dt = np.uint16 if int(pos_o.max(initial=0)) < 65536 else np.uint32
            pos_buf = pos_o.astype(pos_dt).tobytes()
            row_pos_nb = occ_lens * np.dtype(pos_dt).itemsize
            pos_codec = "u16" if pos_dt is np.uint16 else "u32"
        pos_bb = np.zeros(nrows + 1, np.int64)
        np.cumsum(row_pos_nb, out=pos_bb[1:])
    # absolute segment starts move to a per-row column; the stream keeps 0
    # there so every stream value is a small gap
    first_doc = gaps_o[out_starts].astype(np.int64)
    gaps_o[out_starts] = 0
    if exchange_codec == "varint":
        doc_buf = varint_encode(gaps_o)
        tf_buf = varint_encode(tfs_o)
        row_doc_nb = np.add.reduceat(varint_nbytes(gaps_o), out_starts)
        row_tf_nb = np.add.reduceat(varint_nbytes(tfs_o), out_starts)
        doc_codec = tf_codec = "varint"
    else:
        doc_dt = np.uint16 if int(gaps_o.max(initial=0)) < 65536 else np.uint32
        tf_dt = np.uint16 if int(tfs_o.max(initial=0)) < 65536 else np.uint32
        doc_buf = gaps_o.astype(doc_dt).tobytes()
        tf_buf = tfs_o.astype(tf_dt).tobytes()
        row_doc_nb = lens * np.dtype(doc_dt).itemsize
        row_tf_nb = lens * np.dtype(tf_dt).itemsize
        doc_codec = "u16" if doc_dt is np.uint16 else "u32"
        tf_codec = "u16" if tf_dt is np.uint16 else "u32"
    terms_sorted = terms_all.take(pa.array(order, pa.int64()))
    df_sorted = df_all[order]
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(n_shards + 1))
    doc_bb = np.zeros(nrows + 1, np.int64)
    np.cumsum(row_doc_nb, out=doc_bb[1:])
    tf_bb = np.zeros(nrows + 1, np.int64)
    np.cumsum(row_tf_nb, out=tf_bb[1:])
    out = []
    for b in range(n_shards):
        r0, r1 = int(bounds[b]), int(bounds[b + 1])
        if r0 == r1:
            out.append(_empty_shard())
            continue
        out.append(
            {
                # concat_arrays compacts the slice: pickling a bare Arrow
                # Array SLICE serializes the whole underlying buffer (the
                # full partition term column, x64 shards — measured 780 KB
                # shipped for a 12 KB logical slice); Ray's zero-copy Arrow
                # serializer only covers pa.Table, not arrays in dicts
                "term": pa.concat_arrays([terms_sorted.slice(r0, r1 - r0)]),
                "df": df_sorted[r0:r1],
                "first_doc": first_doc[r0:r1],
                "doc_buf": doc_buf[doc_bb[r0] : doc_bb[r1]],
                "tf_buf": tf_buf[tf_bb[r0] : tf_bb[r1]],
                "doc_codec": doc_codec,
                "tf_codec": tf_codec,
                "pos_buf": (
                    pos_buf[pos_bb[r0] : pos_bb[r1]] if pos_bb is not None else b""
                ),
                "pos_codec": pos_codec,
            }
        )
    return tuple(out) + (dl_part,)


@ray.remote
def _combine_shards(*shards) -> dict:
    """Hierarchical-combine level (tree reduce) for one bucket: pure
    concatenation of shard dicts — streams are either self-delimiting
    (varint) or fixed-width with counts in ``df``, so NO decode/re-encode
    happens here. Mixed u16/u32 doc/tf streams are widened to u32 first
    (a cast, the only non-concat work). At 10^6 map partitions this keeps
    any single gather at ``merge_fanin`` inputs."""
    live = [s for s in shards if s["df"].size]
    if not live:
        return _empty_shard()

    def widen(key_buf: str, key_codec: str) -> tuple[bytes, str]:
        codecs = {s[key_codec] for s in live}
        if len(codecs) == 1:
            return b"".join(s[key_buf] for s in live), codecs.pop()
        assert "varint" not in codecs, "cannot mix varint with fixed-width"
        parts = []
        for s in live:
            if s[key_codec] == "u16":
                parts.append(
                    np.frombuffer(s[key_buf], np.uint16)
                    .astype(np.uint32)
                    .tobytes()
                )
            else:
                parts.append(s[key_buf])
        return b"".join(parts), "u32"

    doc_buf, doc_codec = widen("doc_buf", "doc_codec")
    tf_buf, tf_codec = widen("tf_buf", "tf_codec")
    pos_buf, pos_codec = widen("pos_buf", "pos_codec")
    return {
        "term": pa.concat_arrays(
            [
                s["term"].combine_chunks()
                if isinstance(s["term"], pa.ChunkedArray)
                else s["term"]
                for s in live
            ]
        ),
        "df": np.concatenate([s["df"] for s in live]),
        "first_doc": np.concatenate([s["first_doc"] for s in live]),
        "doc_buf": doc_buf,
        "tf_buf": tf_buf,
        "doc_codec": doc_codec,
        "tf_codec": tf_codec,
        "pos_buf": pos_buf,
        "pos_codec": pos_codec,
    }


@ray.remote
def _assemble_dl(n_docs: int, *dl_parts) -> np.ndarray:
    """Dense doc-length array from the per-partition pieces; broadcast once
    via its object ref to every bucket merge (zero-copy plasma view) so the
    shuffle never carries per-posting doc lengths."""
    dl = np.zeros(n_docs, dtype=np.int32)
    for p in dl_parts:
        dl[p["lo"] : p["lo"] + p["dl"].size] = p["dl"]
    return dl


def _decode_stream(buf: bytes, codec: str) -> np.ndarray:
    """Decode one exchange value stream (shared by bucket + salt merges)."""
    from .codec import varint_decode

    if codec == "varint":
        return varint_decode(np.frombuffer(buf, np.uint8))
    return np.frombuffer(buf, np.uint16 if codec == "u16" else np.uint32)


# ---------------------------------------------------------------------------
# hot-term salting (SURVEY §4 skew row; round-2 verdict item 1)
#
# Ref analog: ES spreads _id across 5 shards (plugin.properties:8). A
# Zipf-head term's merge is split by contiguous docID salt range: analyze
# routes the hot term's shards to a dedicated virtual shard per term; each
# salt range merges in its own task; 128-aligned encode ranges make the
# final codec.concat_postings stitch BYTE-IDENTICAL to an unsalted encode
# (interior blocks are always full, varint is per-value). The stitched row
# then joins its natural bucket's table in term-sorted position.
# ---------------------------------------------------------------------------


@ray.remote
def _detect_hot_terms(
    src, text_col: str, sample_rows: int, threshold: int, n_docs: int, max_hot: int
) -> list[str]:
    """Skew pre-pass: estimate global df per term from a bounded sample of
    the FIRST docstore partition (deterministic — same sample regardless of
    parallelism level, so the hot set is resume/scaling stable). Zipf-head
    terms appear in any sample by definition; the estimate only needs to be
    right about the head. Returns the (<= max_hot) terms whose estimated
    global df >= threshold, sorted."""
    from .analysis import tokens_flat

    t = (
        pq.read_table(src, columns=[text_col])
        if isinstance(src, str)
        else src.select([text_col])
    )
    t = t.slice(0, sample_rows)
    n_sample = t.num_rows
    if n_sample == 0:
        return []
    flat, parent = tokens_flat(t[text_col])
    if len(flat) == 0:
        return []
    denc = pc.dictionary_encode(
        flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    )
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # df in sample = distinct (term, doc) pairs per term
    key = idx * np.int64(n_sample) + parent.astype(np.int64)
    uk = np.unique(key)
    df = np.bincount(uk // n_sample, minlength=len(denc.dictionary))
    est = df.astype(np.float64) * (float(n_docs) / n_sample)
    hot_idx = np.flatnonzero(est >= threshold)
    if hot_idx.size > max_hot:
        hot_idx = hot_idx[np.argsort(-df[hot_idx], kind="stable")[:max_hot]]
        hot_idx.sort()
    return sorted(
        denc.dictionary.take(pa.array(hot_idx, pa.int64())).to_pylist()
    )


@ray.remote(num_returns=4)
def _merge_salt_part(index_positions: bool, *shards):
    """Merge ONE hot term's shards from one contiguous docID salt range:
    decode each stream once, order segments by first_doc, gather. Returns
    (count, docs, tfs, pos_gaps) — the arrays stay in the object store so
    the aligned-range encode tasks read them zero-copy. ``pos_gaps`` is the
    occurrence-major per-doc delta stream (empty when positions are off)."""
    from .codec import run_ranges, segmented_prefix_sum

    docs_p, tfs_p, df_p, first_p, pos_p = [], [], [], [], []
    for sh in shards:
        if sh["df"].size == 0:
            continue
        df = sh["df"]
        seg_starts = np.zeros(df.size, np.int64)
        np.cumsum(df[:-1], out=seg_starts[1:])
        gaps = _decode_stream(sh["doc_buf"], sh["doc_codec"])
        docs_p.append(segmented_prefix_sum(gaps, seg_starts, sh["first_doc"]))
        tfs_p.append(_decode_stream(sh["tf_buf"], sh["tf_codec"]).astype(np.int32))
        if index_positions:
            pos_p.append(
                _decode_stream(sh["pos_buf"], sh["pos_codec"]).astype(np.uint32)
            )
        df_p.append(df)
        first_p.append(sh["first_doc"])
    empty_pos = np.empty(0, np.uint32)
    if not docs_p:
        return 0, np.empty(0, np.int64), np.empty(0, np.int32), empty_pos
    docs_all = np.concatenate(docs_p)
    tfs_all = np.concatenate(tfs_p)
    df_all = np.concatenate(df_p)
    firsts = np.concatenate(first_p)
    order = np.argsort(firsts, kind="stable")
    row_starts = np.zeros(df_all.size, np.int64)
    np.cumsum(df_all[:-1], out=row_starts[1:])
    lens = df_all[order]
    src_starts = row_starts[order]
    total = int(lens.sum())
    out_starts = np.zeros(df_all.size, np.int64)
    np.cumsum(lens[:-1], out=out_starts[1:])
    idx = run_ranges(src_starts, out_starts, total)
    docs_o = docs_all[idx]
    tfs_o = tfs_all[idx]
    pos_o = empty_pos
    if index_positions:
        pos_all = np.concatenate(pos_p) if pos_p else empty_pos
        row_occ = np.add.reduceat(tfs_all.astype(np.int64), row_starts)
        occ_src = np.zeros(df_all.size, np.int64)
        np.cumsum(row_occ[:-1], out=occ_src[1:])
        occ_lens = row_occ[order]
        occ_out = np.zeros(df_all.size, np.int64)
        np.cumsum(occ_lens[:-1], out=occ_out[1:])
        idxo = run_ranges(occ_src[order], occ_out, int(pos_all.size))
        pos_o = pos_all[idxo]
    if docs_o.size > 1 and not (docs_o[1:] > docs_o[:-1]).all():
        o2 = np.argsort(docs_o, kind="stable")  # safety net, not the path
        if index_positions and pos_o.size:
            occ_pre = np.zeros(docs_o.size, np.int64)
            np.cumsum(tfs_o[:-1].astype(np.int64), out=occ_pre[1:])
            occ_out2 = np.zeros(docs_o.size, np.int64)
            np.cumsum(tfs_o[o2][:-1].astype(np.int64), out=occ_out2[1:])
            gi = run_ranges(occ_pre[o2], occ_out2, int(pos_o.size))
            pos_o = pos_o[gi]
        docs_o, tfs_o = docs_o[o2], tfs_o[o2]
    return int(docs_o.size), docs_o, tfs_o, pos_o


@ray.remote
def _encode_salt_range(
    dl: np.ndarray, lo: int, hi: int, part_starts, part_counts,
    docs_refs: list, tfs_refs: list, pos_refs: list | None = None,
) -> dict:
    """Encode the hot term's global posting range [lo, hi) — slices the salt
    parts it overlaps (zero-copy object-store views). Interior range starts
    are multiples of BLOCK_SIZE, so every interior block is full and the
    stitched block metadata equals a whole-list encode byte-for-byte.

    With positions, each posting's occurrence group ([cumsum(tfs)] slice of
    the part's pos stream) travels with it; groups are self-contained
    (first value absolute within the doc), so range slicing at posting
    boundaries needs no re-delta."""
    docs_p, tfs_p, pos_p = [], [], []
    for i, (gstart, cnt, dref, tref) in enumerate(
        zip(part_starts, part_counts, docs_refs, tfs_refs)
    ):
        if gstart + cnt <= lo or gstart >= hi:
            continue  # no overlap: never fetched
        d = ray.get(dref)
        f = ray.get(tref)
        s0, s1 = max(lo - gstart, 0), min(hi - gstart, cnt)
        docs_p.append(d[s0:s1])
        tfs_p.append(f[s0:s1])
        if pos_refs is not None:
            p = ray.get(pos_refs[i])
            occ = np.zeros(cnt + 1, np.int64)
            np.cumsum(f.astype(np.int64), out=occ[1:])
            pos_p.append(p[occ[s0] : occ[s1]])
    docs = np.concatenate(docs_p)
    tfs = np.concatenate(tfs_p)
    doc_b, tf_b, blk_b = encode_postings(docs, tfs, dl[docs])
    out = {
        "doc_bytes": doc_b,
        "tf_bytes": tf_b,
        "block_bytes": blk_b,
        "df": int(docs.size),
        "cf": int(tfs.sum()),
    }
    if pos_refs is not None:
        from .codec import varint_encode

        out["pos_bytes"] = varint_encode(np.concatenate(pos_p))
    return out


@ray.remote
def _stitch_hot_term(term: str, bucket_id: int, *parts) -> dict:
    """O(sum bytes) stitch of the salt-encoded chunks (concat_postings
    rebases only each chunk's first varint and shifts block starts)."""
    from .codec import concat_postings

    live = [p for p in parts if p["df"]]
    doc_b, tf_b, blk_b = concat_postings(
        [(p["doc_bytes"], p["tf_bytes"], p["block_bytes"]) for p in live]
    )
    out = {
        "term": term,
        "bucket": bucket_id,
        "df": sum(p["df"] for p in live),
        "cf": sum(p["cf"] for p in live),
        "doc_bytes": doc_b,
        "tf_bytes": tf_b,
        "block_bytes": blk_b,
    }
    if live and "pos_bytes" in live[0]:
        # per-doc position groups are self-contained: byte concat == the
        # unsalted whole-stream encode (LEB128 is per-value)
        out["pos_bytes"] = b"".join(p["pos_bytes"] for p in live)
    return out


def _merge_posting_streams(
    terms_p: list, df_p: list, docs_p: list, tfs_p: list, pos_p: list,
    dl: np.ndarray, bucket_id: int, index_positions: bool,
) -> pa.Table:
    """Merge decoded posting shards into one encoded bucket table.

    Shard i contributes per-row (terms_p[i], df_p[i]) term runs over the
    flat absolute-docID stream docs_p[i] (+ aligned tfs / occurrence-major
    positions). Rows are ordered by (term, first_doc) with an Arrow sort,
    value streams gathered term-contiguously in one fancy-index pass, then
    delta+varint encoded per term with block max-impact metadata — the
    shared reduce core of the exchange merge (_merge_write_bucket) AND the
    segment compactor (rayfts.compact), so both produce byte-identical
    bucket files to a fresh single build (Lucene SegmentMerger analog).
    """
    from .codec import encode_postings_segmented

    terms_all = pa.concat_arrays(terms_p)
    df_all = np.concatenate(df_p)
    docs_all = np.concatenate(docs_p)
    tfs_all = np.concatenate(tfs_p)
    nrows = df_all.size
    row_starts = np.zeros(nrows, np.int64)
    np.cumsum(df_all[:-1], out=row_starts[1:])
    first_doc = docs_all[row_starts]
    rt = pa.table(
        {
            "term": terms_all,
            "fd": pa.array(first_doc, pa.int64()),
            "row": pa.array(np.arange(nrows), pa.int64()),
        }
    )
    order = rt.sort_by(
        [("term", "ascending"), ("fd", "ascending")]
    )["row"].to_numpy()
    from .codec import run_ranges

    lens = df_all[order]
    src_starts = row_starts[order]
    total = int(lens.sum())
    out_starts = np.zeros(nrows, np.int64)
    np.cumsum(lens[:-1], out=out_starts[1:])
    idx = run_ranges(src_starts, out_starts, total)
    docs_o = docs_all[idx]
    tfs_o = tfs_all[idx]
    pos_o = None
    if index_positions:
        # occurrence-level gather by the SAME row permutation: row r's
        # position payload is the next sum(tfs of row r) stream values
        pos_all = np.concatenate(pos_p) if pos_p else np.empty(0, np.uint32)
        row_occ = np.add.reduceat(tfs_all.astype(np.int64), row_starts)
        occ_src_starts = np.zeros(nrows, np.int64)
        np.cumsum(row_occ[:-1], out=occ_src_starts[1:])
        occ_lens = row_occ[order]
        occ_out_starts = np.zeros(nrows, np.int64)
        np.cumsum(occ_lens[:-1], out=occ_out_starts[1:])
        idxo = run_ranges(
            occ_src_starts[order], occ_out_starts, int(pos_all.size)
        )
        pos_o = pos_all[idxo]
    terms_sorted = terms_all.take(pa.array(order, pa.int64()))
    if nrows > 1:
        neq = pc.not_equal(
            terms_sorted.slice(1), terms_sorted.slice(0, nrows - 1)
        ).to_numpy(zero_copy_only=False)
        term_row_starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
    else:
        term_row_starts = np.zeros(1, np.int64)
    term_post_starts = out_starts[term_row_starts]
    uniq_terms = terms_sorted.take(pa.array(term_row_starts, pa.int64()))
    # per-term doc ids are ascending by construction (disjoint batch doc
    # ranges ordered by first_doc); verify vectorized and repair only
    # the violating segments (cheap safety net, not the path)
    if total > 1:
        is_start = np.zeros(total, dtype=bool)
        is_start[term_post_starts] = True
        bad = np.flatnonzero((docs_o[1:] <= docs_o[:-1]) & ~is_start[1:])
        if bad.size:
            term_post_ends = np.append(term_post_starts[1:], total)
            segs = np.unique(
                np.searchsorted(term_post_starts, bad + 1, side="right") - 1
            )
            occ_pre = None
            if pos_o is not None:
                occ_pre = np.zeros(total + 1, np.int64)
                np.cumsum(tfs_o, out=occ_pre[1:])
            for ti in segs:
                p0, p1 = int(term_post_starts[ti]), int(term_post_ends[ti])
                o2 = np.argsort(docs_o[p0:p1], kind="stable")
                if pos_o is not None:
                    # per-posting position groups move intact with their
                    # posting (each group's first value is absolute
                    # within its doc, so no re-delta is needed)
                    q0, q1 = int(occ_pre[p0]), int(occ_pre[p1])
                    loc_starts = occ_pre[p0:p1][o2] - q0
                    loc_lens = tfs_o[p0:p1][o2].astype(np.int64)
                    loc_out = np.zeros(o2.size, np.int64)
                    np.cumsum(loc_lens[:-1], out=loc_out[1:])
                    gi = run_ranges(loc_starts, loc_out, q1 - q0)
                    pos_o[q0:q1] = pos_o[q0:q1][gi]
                docs_o[p0:p1] = docs_o[p0:p1][o2]
                tfs_o[p0:p1] = tfs_o[p0:p1][o2]
    # segmented encode: the whole bucket's terms in one vectorized pass
    # (byte-identical to per-term encode_postings; round-2 verdict #4
    # removed the ~vocab/B-iteration Python loop here)
    doc_arr, tf_arr, blk_arr, df_out, cf_out = encode_postings_segmented(
        docs_o, tfs_o, dl[docs_o], term_post_starts, total
    )
    cols = {
        "term": uniq_terms,
        "bucket": pa.array(
            np.full(len(uniq_terms), bucket_id, np.int32), pa.int32()
        ),
        "df": pa.array(df_out, pa.int64()),
        "cf": pa.array(cf_out, pa.int64()),
        "doc_bytes": doc_arr,
        "tf_bytes": tf_arr,
        "block_bytes": blk_arr,
    }
    if pos_o is not None:
        # the stream is already per-(term,doc) delta groups; one varint
        # pass + analytic per-term byte lengths (no per-term loop)
        from .codec import _binary_from_lengths, varint_encode, varint_nbytes

        occ_prefix = np.zeros(total + 1, np.int64)
        np.cumsum(tfs_o, out=occ_prefix[1:])
        term_occ_starts = occ_prefix[term_post_starts]
        pos_stream = varint_encode(pos_o)
        if pos_o.size:
            term_pos_nb = np.add.reduceat(varint_nbytes(pos_o), term_occ_starts)
        else:
            term_pos_nb = np.zeros(term_post_starts.size, np.int64)
        cols["pos_bytes"] = _binary_from_lengths(pos_stream, term_pos_nb)
    return pa.table(cols)


def _write_bucket_file(
    merged: pa.Table, postings_dir: str, index_dir: str, bucket_id: int
) -> dict:
    """Atomic bucket-file write + per-bucket resume checkpoint."""
    os.makedirs(postings_dir, exist_ok=True)
    fname = f"bucket-{bucket_id:04d}.parquet"
    final = os.path.join(postings_dir, fname)
    tmp = final + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, final)
    info = {
        "bucket": bucket_id,
        "file": f"postings/{fname}",
        "terms": merged.num_rows,
        "cf_total": int(pc.sum(merged["cf"]).as_py() or 0) if merged.num_rows else 0,
        "postings_bytes": os.path.getsize(final),
    }
    write_checkpoint(index_dir, "postings", f"bucket-{bucket_id:04d}", info)
    return info


def _empty_postings_table(index_positions: bool = False) -> pa.Table:
    cols = {
        "term": pa.array([], pa.string()),
        "bucket": pa.array([], pa.int32()),
        "df": pa.array([], pa.int64()),
        "cf": pa.array([], pa.int64()),
        "doc_bytes": pa.array([], pa.binary()),
        "tf_bytes": pa.array([], pa.binary()),
        "block_bytes": pa.array([], pa.binary()),
    }
    if index_positions:
        cols["pos_bytes"] = pa.array([], pa.binary())
    return pa.table(cols)


@ray.remote
def _merge_write_bucket(
    bucket_id: int, postings_dir: str, index_dir: str, dl: np.ndarray,
    hot_rows: list, index_positions: bool, *shards
):
    """Reduce side: gather one bucket's varint shards from every map task,
    decode each ONCE (vectorized stream decode + segmented delta), order
    rows by (term, first_doc) with an Arrow sort, gather the value streams
    into term-contiguous layout with one fancy-index pass, then
    delta+varint encode per term with block max-impact metadata. Writes the
    bucket file atomically + checkpoints (per-bucket resume granularity).

    ``dl`` arrives auto-dereferenced from the broadcast _assemble_dl ref.
    Per-term doc ids are already ascending after the (term, first_doc)
    ordering — each doc lives in exactly one batch and batch doc-ranges are
    disjoint — the sort fallback below is a cheap safety net, not the path.
    """
    from .codec import segmented_prefix_sum

    terms_p, df_p, docs_p, tfs_p, pos_p = [], [], [], [], []
    for sh in shards:
        if sh["df"].size == 0:
            continue
        df = sh["df"]
        seg_starts = np.zeros(df.size, np.int64)
        np.cumsum(df[:-1], out=seg_starts[1:])
        gaps = _decode_stream(sh["doc_buf"], sh["doc_codec"])
        docs_p.append(segmented_prefix_sum(gaps, seg_starts, sh["first_doc"]))
        tfs_p.append(_decode_stream(sh["tf_buf"], sh["tf_codec"]).astype(np.int32))
        if index_positions:
            pos_p.append(
                _decode_stream(sh["pos_buf"], sh["pos_codec"]).astype(np.uint32)
            )
        terms_p.append(
            sh["term"].combine_chunks()
            if isinstance(sh["term"], pa.ChunkedArray)
            else sh["term"]
        )
        df_p.append(df)
    if not terms_p:
        merged = _empty_postings_table(index_positions)
    else:
        merged = _merge_posting_streams(
            terms_p, df_p, docs_p, tfs_p, pos_p, dl, bucket_id,
            index_positions,
        )
    if hot_rows:
        # stitched hot terms rejoin their natural bucket in term-sorted
        # position — the file is byte-identical to an unsalted build
        rows = ray.get(list(hot_rows))  # refs in a list arg: resolve here
        hcols = {
            "term": pa.array([r["term"] for r in rows], pa.string()),
            "bucket": pa.array(
                np.full(len(rows), bucket_id, np.int32), pa.int32()
            ),
            "df": pa.array([r["df"] for r in rows], pa.int64()),
            "cf": pa.array([r["cf"] for r in rows], pa.int64()),
            "doc_bytes": pa.array([r["doc_bytes"] for r in rows], pa.binary()),
            "tf_bytes": pa.array([r["tf_bytes"] for r in rows], pa.binary()),
            "block_bytes": pa.array(
                [r["block_bytes"] for r in rows], pa.binary()
            ),
        }
        if index_positions:
            hcols["pos_bytes"] = pa.array([r["pos_bytes"] for r in rows], pa.binary())
        hot_tbl = pa.table(hcols)
        merged = (
            pa.concat_tables([merged, hot_tbl])
            .sort_by([("term", "ascending")])
            .combine_chunks()
        )
    return _write_bucket_file(merged, postings_dir, index_dir, bucket_id)


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
        doc_info = build_docstore(
            ds, index_dir, cfg, rows_per_part, input_files=input_files or None
        )
        # stage checkpoint is written after the write futures are joined
        # (below) — recording it here would list incomplete partitions
    metrics["docstore_sec"] = round(time.perf_counter() - t0, 3)
    n_docs = doc_info["rows"]

    # ---- stage 2: analyze -> bucket hash shuffle (raw tasks) -> postings ----
    t0 = time.perf_counter()
    postings_dir = os.path.join(index_dir, "postings")
    norms_dir = os.path.join(index_dir, "norms")
    B = cfg.term_buckets
    done_buckets = read_checkpoints(index_dir, "postings") if cfg.resume else {}
    missing = [
        b
        for b in range(B)
        if f"bucket-{b:04d}" not in done_buckets
        or not os.path.exists(os.path.join(postings_dir, f"bucket-{b:04d}.parquet"))
    ]
    bucket_infos = [
        done_buckets[f"bucket-{b:04d}"] for b in range(B) if b not in set(missing)
    ]
    if missing:
        if os.path.isdir(norms_dir):
            shutil.rmtree(norms_dir)  # analyze rewrites norms deterministically
        # one source per planned partition: rebuilt partitions are live
        # object-store refs, checkpointed ones are their parquet files (the
        # stage-checkpoint resume path has no refs — all partitions are on
        # disk then)
        sources = doc_info.get("_part_srcs") or [
            os.path.join(index_dir, p["file"]) for p in doc_info["partitions"]
        ]
        # hot-term resolution: explicit config terms + sample-pre-pass
        # detection (deterministic — first partition, fixed sample size)
        hot_terms = sorted(set(cfg.salt_hot_terms))
        if cfg.salt_df_threshold > 0 and sources and n_docs:
            detected = ray.get(
                _detect_hot_terms.remote(
                    sources[0], cfg.text_col, cfg.hot_sample_rows,
                    cfg.salt_df_threshold, n_docs, cfg.max_hot_terms,
                )
            )
            hot_terms = sorted(set(hot_terms) | set(detected))
        H = len(hot_terms)
        shard_lists = [
            _analyze_partition.options(num_returns=B + H + 1).remote(
                src, norms_dir, cfg.text_col, B, cfg.analyze_batch_size,
                cfg.exchange_codec, hot_terms, cfg.index_positions,
                tuple(cfg.stopwords), cfg.stemmer, cfg.shingle_size,
                tuple(cfg.index_prefixes),
            )
            for src in sources
        ]
        # last return of each map task = the partition's dl slice; assemble
        # the dense dl array once and broadcast its ref to every merge (the
        # shuffle itself never carries per-posting doc lengths)
        dl_ref = _assemble_dl.remote(n_docs, *[sl[B + H] for sl in shard_lists])

        def bucket_shards(b: int) -> list:
            shards = [sl[b] for sl in shard_lists]
            fanin = cfg.merge_fanin
            # tree reduce: cap any single gather at `fanin` inputs
            while fanin and len(shards) > fanin:
                shards = [
                    _combine_shards.remote(*shards[i : i + fanin])
                    for i in range(0, len(shards), fanin)
                ]
            return shards

        # salted hot-term pipeline: per hot term, merge each contiguous
        # docID salt range in parallel, encode 128-aligned ranges, stitch
        # with concat_postings; the stitched row joins its natural bucket
        missing_set = set(missing)
        hot_rows: dict[int, list] = {}
        if H:
            P = len(sources)
            S = max(1, min(cfg.hot_term_salts, P))
            salt_of_part = (np.arange(P) * S) // P
            salt_shards = {
                s: [p for p in range(P) if salt_of_part[p] == s]
                for s in range(S)
            }
            plans = []  # (term, nat_bucket, [(cnt_ref, docs_ref, tfs_ref, pos_ref)])
            for h, term in enumerate(hot_terms):
                nat_b = term_bucket_py(term, B)
                if nat_b not in missing_set:
                    continue  # bucket checkpointed: its hot row already on disk
                triples = [
                    _merge_salt_part.options(num_returns=4).remote(
                        cfg.index_positions,
                        *[shard_lists[p][B + h] for p in parts],
                    )
                    for parts in salt_shards.values()
                    if parts
                ]
                plans.append((term, nat_b, triples))
            # one driver round-trip for ALL hot terms' salt counts
            all_counts = ray.get(
                [tr[0] for _, _, triples in plans for tr in triples]
            )
            ci = 0
            for term, nat_b, triples in plans:
                counts = all_counts[ci : ci + len(triples)]
                ci += len(triples)
                total = int(sum(counts))
                if total == 0:
                    continue  # term absent from corpus: no row (== unsalted)
                cum = np.zeros(len(counts) + 1, np.int64)
                np.cumsum(counts, out=cum[1:])
                from .codec import BLOCK_SIZE

                bnds = (
                    [0]
                    + [int((c // BLOCK_SIZE) * BLOCK_SIZE) for c in cum[1:-1]]
                    + [total]
                )
                docs_refs = [tr[1] for tr in triples]
                tfs_refs = [tr[2] for tr in triples]
                pos_refs = (
                    [tr[3] for tr in triples] if cfg.index_positions else None
                )
                enc_refs = [
                    _encode_salt_range.remote(
                        dl_ref, lo2, hi2, cum[:-1].tolist(), counts,
                        docs_refs, tfs_refs, pos_refs,
                    )
                    for lo2, hi2 in zip(bnds[:-1], bnds[1:])
                    if lo2 < hi2
                ]
                hot_rows.setdefault(nat_b, []).append(
                    _stitch_hot_term.remote(term, nat_b, *enc_refs)
                )

        merge_futs = [
            _merge_write_bucket.remote(
                b, postings_dir, index_dir, dl_ref, hot_rows.get(b, []),
                cfg.index_positions, *bucket_shards(b)
            )
            for b in missing
        ]
        bucket_infos.extend(ray.get(merge_futs))
        metrics["hot_terms_salted"] = hot_terms
    bucket_infos.sort(key=lambda i: i["bucket"])
    metrics["postings_sec"] = round(time.perf_counter() - t0, 3)

    # ---- stage 3: global stats + manifest publish (refresh analog) ----
    t0 = time.perf_counter()
    if os.path.isdir(norms_dir):
        norms_tbl = pq.read_table(norms_dir, columns=["dl"])
        total_dl = int(pc.sum(norms_tbl["dl"]).as_py() or 0)
        n_norms = norms_tbl.num_rows
    else:  # empty corpus: analyze never wrote a norms file
        total_dl = 0
        n_norms = 0
    n_terms = sum(i["terms"] for i in bucket_infos)
    postings_bytes = sum(i["postings_bytes"] for i in bucket_infos)
    # join the overlapped docstore writes before publishing anything
    if doc_info.get("_info_futures"):
        written = ray.get(doc_info["_info_futures"])
        doc_info["partitions"] = sorted(
            list(doc_info["partitions"]) + written, key=lambda i: i["part_id"]
        )
        doc_info["_info_futures"] = None
        write_checkpoint(
            index_dir,
            "stage",
            "docstore",
            {"result": {k: v for k, v in doc_info.items() if not k.startswith("_")}},
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
        "postings_files": [i["file"] for i in bucket_infos],
        "term_buckets": cfg.term_buckets,
        "k1": cfg.k1,
        "b": cfg.b,
        "positions": cfg.index_positions,
        "stopwords": sorted(cfg.stopwords),
        "stemmer": cfg.stemmer,
        "shingle_size": cfg.shingle_size,
        "index_prefixes": list(cfg.index_prefixes),
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
