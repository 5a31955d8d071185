"""Codec unit tests — round-trip + block metadata (FIXTURES.md §2).

Analog of the reference's golden/codec-level unit tests
(model/entity/ESNodeUTest.java byte-exact JSON asserts): exact byte-level
expectations for the posting wire format.
"""

import numpy as np
import pytest

from rayfts.codec import (
    BLOCK_SIZE,
    decode_blocks,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_known_bytes():
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([1])) == b"\x01"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 56, size=10_000, dtype=np.uint64)
    vals[:100] = rng.integers(0, 128, size=100)  # exercise 1-byte path
    vals[100] = 0
    out = varint_decode(varint_encode(vals))
    np.testing.assert_array_equal(out, vals)


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 1000, 10**12], dtype=np.int64)
    np.testing.assert_array_equal(delta_decode(delta_encode(ids)), ids)


def test_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_postings_roundtrip_and_blocks():
    rng = np.random.default_rng(42)
    n = 5 * BLOCK_SIZE + 17
    doc_ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int32)
    dls = rng.integers(1, 500, size=n).astype(np.int32)
    db, tb, bb = encode_postings(doc_ids, tfs, dls)
    d2, t2 = decode_postings(db, tb)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)
    blocks = decode_blocks(bb)
    assert len(blocks) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    for i, blk in enumerate(blocks):
        lo, hi = i * BLOCK_SIZE, min(n, (i + 1) * BLOCK_SIZE)
        assert blk["last_doc"] == doc_ids[hi - 1]
        assert blk["start"] == lo
        assert blk["max_tf"] == tfs[lo:hi].max()
        assert blk["min_dl"] == dls[lo:hi].min()


def test_merge_of_disjoint_partials_equals_whole():
    """Partial postings from disjoint doc ranges concat+sort to the same
    encoding as a single-shot encode (the hot-term salting premise)."""
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(10**6, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=1000).astype(np.int32)
    dls = rng.integers(1, 99, size=1000).astype(np.int32)
    whole = encode_postings(doc_ids, tfs, dls)
    cut = 400
    parts = [(doc_ids[:cut], tfs[:cut], dls[:cut]), (doc_ids[cut:], tfs[cut:], dls[cut:])]
    m_doc = np.concatenate([p[0] for p in parts])
    m_tf = np.concatenate([p[1] for p in parts])
    m_dl = np.concatenate([p[2] for p in parts])
    order = np.argsort(m_doc, kind="stable")
    merged = encode_postings(m_doc[order], m_tf[order], m_dl[order])
    assert merged == whole


def test_concat_postings_equals_whole_encode():
    """Salting mechanics: per-doc-range encoded chunks stitch back to the
    byte-exact single-shot encoding."""
    from rayfts.codec import concat_postings

    rng = np.random.default_rng(11)
    n = 1000
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=n).astype(np.int32)
    dls = rng.integers(1, 99, size=n).astype(np.int32)
    whole = encode_postings(doc_ids, tfs, dls)
    cuts = [0, 257, 640, n]  # non-block-aligned salt boundaries
    parts = [
        encode_postings(doc_ids[a:b], tfs[a:b], dls[a:b])
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    stitched = concat_postings(parts)
    s_docs, s_tfs = decode_postings(stitched[0], stitched[1])
    np.testing.assert_array_equal(s_docs, doc_ids)
    np.testing.assert_array_equal(s_tfs, tfs)
    # block metadata: same last_doc/max_tf/min_dl content per chunk-block
    blocks = decode_blocks(stitched[2])
    assert blocks["last_doc"][-1] == doc_ids[-1]
    assert (blocks["start"] < n).all() and (np.diff(blocks["start"]) > 0).all()
    with pytest.raises(ValueError, match="disjoint"):
        concat_postings([parts[1], parts[0]])


def test_segmented_encode_byte_identical_to_per_term():
    """encode_postings_segmented must be byte-identical to per-term
    encode_postings — the bucket-reduce hot path relies on it."""
    from rayfts.codec import encode_postings_segmented

    rng = np.random.default_rng(3)
    docs_l, tfs_l, dls_l, starts = [], [], [], []
    off = 0
    # segment sizes straddle block boundaries: 1, <128, ==128, >128, >>128
    for n in (1, 7, 128, 129, 400, 1000, 2, 128 * 3):
        ids = np.sort(rng.choice(50_000, size=n, replace=False)).astype(np.int64)
        docs_l.append(ids)
        tfs_l.append(rng.integers(1, 300, n).astype(np.int32))
        dls_l.append(rng.integers(1, 500, n).astype(np.int32))
        starts.append(off)
        off += n
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    seg_starts = np.array(starts, np.int64)
    doc_a, tf_a, blk_a, df, cf = encode_postings_segmented(
        docs, tfs, dls, seg_starts, off
    )
    for i in range(len(docs_l)):
        eb, et, ebl = encode_postings(docs_l[i], tfs_l[i], dls_l[i])
        assert doc_a[i].as_py() == eb
        assert tf_a[i].as_py() == et
        assert blk_a[i].as_py() == ebl
        assert df[i] == docs_l[i].size
        assert cf[i] == int(tfs_l[i].sum())


def test_segmented_encode_empty():
    from rayfts.codec import encode_postings_segmented

    doc_a, tf_a, blk_a, df, cf = encode_postings_segmented(
        np.empty(0, np.int64), np.empty(0, np.int32), np.empty(0, np.int32),
        np.empty(0, np.int64), 0,
    )
    assert len(doc_a) == 0 and df.size == 0
