"""Posting-list compression: delta + LEB128 varint, block max-impact metadata.

The reference delegates posting storage to Lucene (opaque to the plugin);
the north star requires it explicit here: ``term -> sorted docID deltas
with varint compression plus per-block max-impact metadata``.

All encode/decode paths are numpy-vectorized — no per-value Python loop —
so they stay fast inside ``map_batches`` / ``map_groups`` hot stages.

Wire format of one posting list (one term):
  doc_bytes  : varint(delta(doc_ids))     deltas: first = doc_ids[0], then diffs
  tf_bytes   : varint(tfs)
  blocks     : per 128-posting block: (last_doc_id:int64, offset:int32 into
               posting index space, max_tf:int32) — enough to reconstruct
               block-max impact bounds at query time for any (k1, b, avgdl).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per skip block (Lucene uses 128 too)

_U64 = np.uint64
_SEVEN = _U64(7)
_LOW7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array, fully vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + one extra per 7 bits above the first 7
    nbytes = np.ones(v.size, dtype=np.int64)
    for shift in range(7, 64, 7):
        nbytes += (v >= (_U64(1) << _U64(shift))).astype(np.int64)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        chunk = ((v[mask] >> (_SEVEN * _U64(j))) & _LOW7).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j)
        out[starts[mask] + j] = chunk | np.where(cont, _CONT, np.uint8(0))
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & _CONT) == 0
    ends = np.flatnonzero(is_end)
    nvals = ends.size
    starts = np.empty(nvals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    value_idx = np.repeat(np.arange(nvals, dtype=np.int64), lengths)
    pos_in_value = np.arange(b.size, dtype=np.int64) - starts[value_idx]
    acc = np.zeros(nvals, dtype=np.uint64)
    np.add.at(
        acc,
        value_idx,
        (b & np.uint8(0x7F)).astype(np.uint64) << (pos_in_value.astype(np.uint64) * _SEVEN),
    )
    return acc


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (same formula varint_encode uses) —
    lets callers slice a stream-encoded buffer per logical row without
    decoding it."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    for shift in range(7, 64, 7):
        nbytes += (v >= (_U64(1) << _U64(shift))).astype(np.int64)
    return nbytes


def run_spread(values: np.ndarray, seg_starts: np.ndarray, total: int) -> np.ndarray:
    """``np.repeat(values, seg_lens)`` for contiguous segments starting at
    ``seg_starts`` (seg_starts[0] == 0), via scatter + cumsum.
    np.repeat with per-element counts measured ~10 us PER SEGMENT of fixed
    overhead (0.39 s for 39k segments); this is three linear passes.
    uint64 wraparound in the diff/cumsum round-trips exactly."""
    out = np.zeros(total, dtype=values.dtype)
    if total == 0 or values.size == 0:
        return out
    with np.errstate(over="ignore"):
        out[0] = values[0]
        out[seg_starts[1:]] = values[1:] - values[:-1]
        np.cumsum(out, out=out)
    return out


def run_ranges(starts: np.ndarray, seg_starts: np.ndarray, total: int) -> np.ndarray:
    """Gather-index stream of consecutive runs: for each segment s (contiguous
    output range seg_starts[s]..), emit starts[s], starts[s]+1, ... — the
    fancy-index array for a segmented gather. Single allocation + one
    scatter + one in-place cumsum (a run_spread + arange + add measured 3x
    the memory traffic in fresh-page writes)."""
    out = np.ones(total, dtype=np.int64)
    if total == 0 or starts.size == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.diff(np.append(seg_starts, total))
    out[0] = starts[0]
    out[seg_starts[1:]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    np.cumsum(out, out=out)
    return out


def segmented_prefix_sum(
    gaps: np.ndarray, seg_starts: np.ndarray, firsts: np.ndarray
) -> np.ndarray:
    """Decode a concatenated gap stream whose segment FIRST values are 0 and
    whose absolute segment starts live in ``firsts`` (one per segment):
    abs[i] = firsts[seg] + sum(gaps[seg_start..i]). One cumsum + one repeat;
    uint64 wraparound keeps it exact across segment boundaries."""
    g = np.ascontiguousarray(gaps, dtype=np.uint64)
    if g.size == 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        S = np.cumsum(g, dtype=np.uint64)
        base = firsts.astype(np.uint64) - S[seg_starts]
        return (S + run_spread(base, seg_starts, g.size)).astype(np.int64)


def segmented_delta_decode(gaps: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Decode a CONCATENATED delta stream where each segment's first value
    is absolute (codec delta_encode convention per segment), in one
    vectorized pass: abs[i] = cumsum(gaps)[i] - cumsum(gaps)[seg_start-1].
    uint64 wraparound keeps the subtraction exact even if the global cumsum
    overflows."""
    g = np.ascontiguousarray(gaps, dtype=np.uint64)
    if g.size == 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        S = np.cumsum(g, dtype=np.uint64)
        seg_corr = np.where(
            seg_starts > 0, S[np.maximum(seg_starts, 1) - 1], np.uint64(0)
        )
        corr = run_spread(seg_corr, seg_starts, g.size)
        return (S - corr).astype(np.int64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending int64 ids -> gap array (first value kept as-is)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    out = np.empty(a.size, dtype=np.uint64)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:], casting="unsafe")
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64))


BLOCK_DTYPE = np.dtype(
    [("last_doc", "<i8"), ("start", "<i4"), ("max_tf", "<i4"), ("min_dl", "<i4")]
)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray | None = None
) -> tuple[bytes, bytes, bytes]:
    """Compress one term's postings (doc_ids strictly ascending).

    Returns (doc_bytes, tf_bytes, block_bytes). block_bytes is the skip
    metadata: for each BLOCK_SIZE-chunk, (last_doc_id:int64, start:int32,
    max_tf:int32, min_dl:int32) little-endian — start is the posting index of
    the block's first entry, so blocks are independently addressable after
    full decode (and concatenable across disjoint doc_id ranges, which is
    what makes hot-term salting by doc range mergeable; SURVEY §4 skew row).

    (max_tf, min_dl) give a query-time block-max BM25 upper bound that does
    NOT depend on global stats at build time: the per-term score is
    increasing in tf and decreasing in dl, so
    impact(block) <= idf*(k1+1)*max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl)).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int32)
    if dls is None:
        dls = np.zeros(doc_ids.size, dtype=np.int32)
    dls = np.ascontiguousarray(dls, dtype=np.int32)
    n = doc_ids.size
    doc_bytes = varint_encode(delta_encode(doc_ids))
    tf_bytes = varint_encode(tfs.astype(np.uint64))
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    blocks = np.empty(nblocks, dtype=BLOCK_DTYPE)
    if nblocks:
        # vectorized block metadata (a per-block Python loop is 75k
        # iterations for a 9.6M-posting hot term)
        starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
        ends = np.minimum(starts + BLOCK_SIZE, n)
        blocks["last_doc"] = doc_ids[ends - 1]
        blocks["start"] = starts.astype(np.int32)
        blocks["max_tf"] = np.maximum.reduceat(tfs, starts)
        blocks["min_dl"] = np.minimum.reduceat(dls, starts)
    return doc_bytes, tf_bytes, blocks.tobytes()


def _binary_from_lengths(data: bytes, lengths: np.ndarray):
    """Zero-copy pa.binary() array over a concatenated byte stream sliced by
    per-row lengths (offsets built analytically — no per-row Python slicing)."""
    import pyarrow as pa

    offs = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    if offs[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            "bucket byte stream exceeds 2 GiB — raise term_buckets so each "
            "bucket file stays below the pa.binary() offset limit"
        )
    return pa.Array.from_buffers(
        pa.binary(),
        int(lengths.size),
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()), pa.py_buffer(data)],
    )


def encode_postings_segmented(
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    seg_starts: np.ndarray,
    total: int,
):
    """Encode MANY terms' postings in one vectorized pass.

    ``docs``/``tfs``/``dls`` are the bucket's posting streams laid out
    term-contiguously (term i owns ``[seg_starts[i], seg_starts[i+1])``,
    tiling ``[0, total)``); doc ids must be ascending within each segment.
    Byte-identical to calling :func:`encode_postings` per term (LEB128 is
    per-value, so stream concatenation == per-term concatenation; block
    tiling restarts at each segment start) — pinned by tests — but with NO
    per-term Python loop: a real vocabulary is ~10M terms and a per-term
    call is 150k+ Python iterations per bucket (round-2 verdict item 4).

    Returns (doc_bytes, tf_bytes, block_bytes) as pa.binary() arrays plus
    (df, cf) int64 arrays, one row per term.
    """
    nseg = seg_starts.size
    if nseg == 0 or total == 0:
        import pyarrow as pa

        empty_b = pa.array([], pa.binary())
        empty_i = np.empty(0, np.int64)
        return empty_b, empty_b, empty_b, empty_i, empty_i
    docs = np.ascontiguousarray(docs, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int32)
    dls = np.ascontiguousarray(dls, dtype=np.int32)
    df = np.diff(np.append(seg_starts, total))
    # per-segment delta: first value absolute, rest gaps
    gaps = np.empty(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        gaps[0] = docs[0]
        np.subtract(docs[1:], docs[:-1], out=gaps[1:], casting="unsafe")
        gaps[seg_starts] = docs[seg_starts]
    doc_stream = varint_encode(gaps)
    tf_stream = varint_encode(tfs.astype(np.uint64))
    doc_lens = np.add.reduceat(varint_nbytes(gaps), seg_starts)
    tf_lens = np.add.reduceat(varint_nbytes(tfs.astype(np.uint64)), seg_starts)
    # block metadata: blocks tile each segment in BLOCK_SIZE chunks
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    tot_blocks = int(nblocks.sum())
    blk_of_term = np.repeat(np.arange(nseg, dtype=np.int64), nblocks)
    blk_cum = np.zeros(nseg, np.int64)
    np.cumsum(nblocks[:-1], out=blk_cum[1:])
    blk_in_term = np.arange(tot_blocks, dtype=np.int64) - blk_cum[blk_of_term]
    bstarts = seg_starts[blk_of_term] + BLOCK_SIZE * blk_in_term
    bends = np.minimum(bstarts + BLOCK_SIZE, (seg_starts + df)[blk_of_term])
    blocks = np.empty(tot_blocks, dtype=BLOCK_DTYPE)
    blocks["last_doc"] = docs[bends - 1]
    blocks["start"] = (BLOCK_SIZE * blk_in_term).astype(np.int32)
    # reduceat over the GLOBAL streams: block ranges tile [0, total), so
    # segment [bstarts[i], bstarts[i+1]) == block i's posting range exactly
    blocks["max_tf"] = np.maximum.reduceat(tfs, bstarts)
    blocks["min_dl"] = np.minimum.reduceat(dls, bstarts)
    doc_arr = _binary_from_lengths(doc_stream, doc_lens)
    tf_arr = _binary_from_lengths(tf_stream, tf_lens)
    blk_arr = _binary_from_lengths(
        blocks.tobytes(), nblocks * BLOCK_DTYPE.itemsize
    )
    cf = np.add.reduceat(tfs.astype(np.int64), seg_starts)
    return doc_arr, tf_arr, blk_arr, df.astype(np.int64), cf


def decode_postings(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    doc_ids = delta_decode(varint_decode(doc_bytes))
    tfs = varint_decode(tf_bytes).astype(np.int32)
    return doc_ids, tfs


def decode_blocks(block_bytes: bytes) -> np.ndarray:
    return np.frombuffer(block_bytes, dtype=BLOCK_DTYPE)


def concat_postings(parts: list[tuple[bytes, bytes, bytes]]) -> tuple[bytes, bytes, bytes]:
    """Concatenate independently-encoded posting chunks whose doc_id ranges
    are disjoint and ascending (chunk i's last doc < chunk i+1's first doc).

    This is the hot-term SALTING primitive (SURVEY §4 skew row): at 10^12
    scale a single hot term's postings are encoded per doc-range salt by
    separate tasks, then stitched with this O(sum bytes) concat — only the
    first varint of each subsequent chunk is rewritten (rebased from
    absolute doc_id to the delta vs the previous chunk's last doc).
    tf streams and block metadata concatenate unchanged (block `start`
    indices are shifted by the preceding posting count).
    """
    parts = [p for p in parts if p[2]]  # drop empty chunks
    if not parts:
        return b"", b"", b""
    if len(parts) == 1:
        return parts[0]
    out_doc = bytearray()
    out_tf = bytearray()
    out_blocks = []
    prev_last = None
    n_so_far = 0
    for doc_b, tf_b, blk_b in parts:
        blocks = np.frombuffer(blk_b, dtype=BLOCK_DTYPE).copy()
        vals = varint_decode(doc_b)
        if prev_last is None:
            out_doc += doc_b
        else:
            first_abs = int(vals[0])
            if first_abs <= prev_last:
                raise ValueError(
                    f"chunks not disjoint-ascending: {first_abs} <= {prev_last}"
                )
            rebased = varint_encode(np.array([first_abs - prev_last], dtype=np.uint64))
            first_len = len(varint_encode(vals[:1]))
            out_doc += rebased + doc_b[first_len:]
        prev_last = int(blocks["last_doc"][-1])
        blocks["start"] += n_so_far
        n_so_far += int(vals.size)
        out_blocks.append(blocks)
        out_tf += tf_b
    return bytes(out_doc), bytes(out_tf), np.concatenate(out_blocks).tobytes()
