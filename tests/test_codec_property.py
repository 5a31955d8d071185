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


@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=100, deadline=None)
def test_segmented_helpers_match_numpy_reference(lens, base):
    """run_spread/run_ranges/segmented_prefix_sum vs plain numpy refs."""
    import numpy as np

    from rayfts.codec import run_ranges, run_spread, segmented_prefix_sum

    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    seg_starts = np.zeros(lens.size, np.int64)
    np.cumsum(lens[:-1], out=seg_starts[1:])
    rng = np.random.default_rng(base % 2**32)
    vals = rng.integers(0, 2**50, lens.size).astype(np.int64)
    np.testing.assert_array_equal(
        run_spread(vals, seg_starts, total), np.repeat(vals, lens)
    )
    starts = rng.integers(0, 2**30, lens.size).astype(np.int64)
    expected_idx = np.concatenate(
        [np.arange(s, s + ln) for s, ln in zip(starts, lens)]
    )
    np.testing.assert_array_equal(
        run_ranges(starts, seg_starts, total), expected_idx
    )
    # segmented_prefix_sum: gaps with 0 at starts + absolute firsts
    gaps = rng.integers(0, 1000, total).astype(np.uint64)
    gaps[seg_starts] = 0
    firsts = rng.integers(0, 2**40, lens.size).astype(np.int64)
    expected = np.concatenate(
        [f + np.cumsum(gaps[s : s + ln].astype(np.int64))
         for f, s, ln in zip(firsts, seg_starts, lens)]
    )
    np.testing.assert_array_equal(
        segmented_prefix_sum(gaps, seg_starts, firsts), expected
    )


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_parse_query_string_total(q):
    """The query_string grammar is TOTAL: any input parses without
    raising, clause classifications are structurally sound, and boosts
    are finite non-negative floats (Lucene accepts ``term^0``: the
    clause still matches, it just contributes zero score)."""
    import math

    from rayfts.search import parse_query_string

    out = parse_query_string(q)
    assert set(out) == {"must", "should", "must_not", "phrases"}
    for body, boost in out["must"] + out["should"]:
        assert body and isinstance(boost, float)
        assert boost >= 0 and math.isfinite(boost)
        assert not body.startswith(("+", "-")) or len(body) > 1
    for body in out["must_not"]:
        assert isinstance(body, str) and body
    for sign, raw, boost in out["phrases"]:
        assert sign in ("", "+", "-")
        assert isinstance(raw, str)
        assert isinstance(boost, float) and boost > 0


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_parse_simple_query_string_total(q):
    """The simple_query_string grammar is TOTAL (the ES contract: this
    query never raises on any input): every atom is structurally
    sound — non-empty group lists, known kinds, prefix payloads free of
    '*', term payloads free of operator characters."""
    from rayfts.search import parse_simple_query_string

    groups = parse_simple_query_string(q)
    for g in groups:
        assert g  # no empty groups
        for neg, kind, payload in g:
            assert isinstance(neg, bool)
            assert kind in ("term", "phrase", "prefix")
            assert isinstance(payload, str)
            if kind == "prefix":
                assert payload and "*" not in payload
            if kind == "term":
                assert "*" not in payload and "|" not in payload


def test_parse_simple_query_string_shapes():
    """Pinned parses: operator precedence (AND > OR), whitespace-OR,
    negation binding, prefix/phrase atoms, lenient degradation."""
    from rayfts.search import parse_simple_query_string as p

    assert p("a + b | c") == [
        [(False, "term", "a"), (False, "term", "b")],
        [(False, "term", "c")],
    ]
    assert p("a b") == [[(False, "term", "a")], [(False, "term", "b")]]
    assert p('sma* + -window | "x y"') == [
        [(False, "prefix", "sma"), (True, "term", "window")],
        [(False, "phrase", "x y")],
    ]
    assert p('"unterminated ph') == [[(False, "phrase", "unterminated ph")]]
    assert p("( a + b )") == [[(False, "term", "a"), (False, "term", "b")]]
    assert p("* | + - |") == []
    assert p("-a") == [[(True, "term", "a")]]


# ---------------------------------------------------------------------------
# grok / dissect compiler properties
# ---------------------------------------------------------------------------

_KEY = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_LIT = st.from_regex(r"[A-Za-z0-9 .,:=/()\[\]{}#@!?+*^$|\\-]{1,8}",
                     fullmatch=True)
_VAL = st.from_regex(r"[a-z0-9_]{1,8}", fullmatch=True)


@given(
    st.lists(st.tuples(_LIT, _KEY, _VAL), min_size=1, max_size=4),
    _LIT,
)
@settings(max_examples=200, deadline=None)
def test_dissect_compile_roundtrip(parts, tail):
    """Property: for any delimiter/key/value composition whose values
    avoid the adjacent delimiter characters, the compiled dissect
    regex extracts exactly the substituted values. Keys are made
    unique by suffixing; values are delimiter-free by construction."""
    import re

    from rayfts.ingest import compile_dissect

    pattern, text, want = "", "", {}
    for i, (lit, key, val) in enumerate(parts):
        k = f"{key}{i}"
        pattern += lit + "%{" + k + "}"
        text += lit + val
        want[k] = val
    pattern += tail
    text += tail
    # exact round-trip only holds for UNAMBIGUOUS compositions: no
    # value may contain its following delimiter (the documented
    # dissect rule — a non-greedy capture stops at the first
    # occurrence and misparses shift every later field)
    from hypothesis import assume

    for i, (lit, key, val) in enumerate(parts):
        nxt = parts[i + 1][0] if i + 1 < len(parts) else tail
        assume((val + nxt).find(nxt) == len(val))
    rx = re.compile(compile_dissect(pattern))
    m = rx.match(text)
    assert m is not None, (pattern, text)
    for i, (lit, key, val) in enumerate(parts):
        assert m.group(f"{key}{i}") == val, (pattern, text,
                                             m.groupdict())


@given(st.lists(st.from_regex(r"[a-z0-9_]{1,8}", fullmatch=True),
                min_size=2, max_size=5))
@settings(max_examples=200, deadline=None)
def test_grok_word_chain_roundtrip(words):
    """Property: a grok %{WORD:wN} chain joined by single spaces
    extracts every word exactly; the python-re twin of the compiled
    RE2 agrees with the Arrow execution path."""
    import re

    import pyarrow as pa

    from rayfts.ingest import IngestPipeline, compile_grok

    pattern = " ".join(f"%{{WORD:w{i}}}" for i in range(len(words)))
    text = " ".join(words)
    rx = re.compile(compile_grok(pattern))
    m = rx.match(text)
    assert m is not None
    assert [m.group(f"w{i}") for i in range(len(words))] == words
    out = IngestPipeline([
        {"grok": {"field": "t", "pattern": pattern}},
    ]).transform_batch(pa.table({"t": [text, "x"]}))
    assert [out[f"w{i}"][0].as_py() for i in range(len(words))] == words
    assert all(out[f"w{i}"][1].as_py() is None
               for i in range(len(words)) if len(words) > 1)


@given(
    st.text(alphabet="ab*?\n_% ", min_size=0, max_size=8),
    st.text(alphabet="ab\n_% ", min_size=0, max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_esql_like_matches_duckdb(pattern, value):
    """Property: the ES|QL LIKE compiler (*,? wildcards over \\Z-anchored
    DOTALL regex) agrees with DuckDB's LIKE (%,_ with ESCAPE) on every
    pattern/value pair — including newline-bearing values, the case the
    '$' anchor got wrong."""
    import re

    import duckdb

    rx = re.compile("".join(
        "(?s:.*)" if ch == "*" else "(?s:.)" if ch == "?"
        else re.escape(ch)
        for ch in pattern
    ) + r"\Z")
    got = bool(rx.match(value))
    sql_pat = "".join(
        "%" if ch == "*" else "_" if ch == "?"
        else "\\" + ch if ch in ("%", "_", "\\") else ch
        for ch in pattern
    )
    want = duckdb.sql(
        "SELECT ? LIKE ? ESCAPE '\\'", params=[value, sql_pat]
    ).fetchone()[0]
    assert got == bool(want), (pattern, value, sql_pat)
