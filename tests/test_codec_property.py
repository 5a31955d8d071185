"""Property-based codec tests (hypothesis): round-trip for arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rayfts.codec import (
    concat_postings,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_any(values):
    arr = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_any(rows):
    rows.sort()
    doc_ids = np.array([r[0] for r in rows], dtype=np.int64)
    tfs = np.array([r[1] for r in rows], dtype=np.int32)
    dls = np.array([r[2] for r in rows], dtype=np.int32)
    db, tb, bb = encode_postings(doc_ids, tfs, dls)
    d2, t2 = decode_postings(db, tb)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=2,
        max_size=500,
        unique=True,
    ),
    st.integers(min_value=1, max_value=499),
)
@settings(max_examples=100, deadline=None)
def test_concat_any_split(ids, cut):
    ids = np.array(sorted(ids), dtype=np.int64)
    cut = min(cut, ids.size - 1)
    tfs = np.ones(ids.size, dtype=np.int32)
    dls = np.ones(ids.size, dtype=np.int32)
    parts = [
        encode_postings(ids[:cut], tfs[:cut], dls[:cut]),
        encode_postings(ids[cut:], tfs[cut:], dls[cut:]),
    ]
    st_doc, st_tf, _ = concat_postings(parts)
    d2, t2 = decode_postings(st_doc, st_tf)
    np.testing.assert_array_equal(d2, ids)
    np.testing.assert_array_equal(t2, tfs)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_term_bucket_kernel_matches_python(terms, buckets):
    """The vectorized FNV-1a Arrow-buffer kernel must agree with the
    pure-Python reference for arbitrary unicode terms (incl. empty,
    multi-byte, and sliced arrays)."""
    import pyarrow as pa

    from rayfts.build import _term_buckets_arrow, term_bucket_py

    arr = pa.array(terms, pa.string())
    got = _term_buckets_arrow(arr, buckets).to_pylist()
    exp = [term_bucket_py(t, buckets) for t in terms]
    assert got == exp
    # sliced array (non-zero offset) must hash identically
    if len(terms) > 1:
        got2 = _term_buckets_arrow(arr.slice(1), buckets).to_pylist()
        assert got2 == exp[1:]
