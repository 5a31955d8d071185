"""Search-as-you-type — Lucene ShingleFilter / ES search_as_you_type
``._2gram`` subfield + multi_match type=bool_prefix.

Spec pinned here:
  * make_shingles emits adjacent n-token windows per doc (space-joined,
    one per start position, none across doc boundaries);
  * a shingle index's df/tf/dl live on the shingle stream (dl = shingle
    count), and queries shingle with the same n;
  * match_bool_prefix on a shingle index prefix-matches the LAST
    shingle (the in-flight word) and scores earlier shingles as BM25
    should-clauses;
  * sharded == single-index, bit-identical.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rayfts.analysis import make_shingles, tokens_flat
from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.oracle import BruteForceIndex, tokenize
from rayfts.search import MultiSearcher, Searcher


def test_make_shingles_matches_bruteforce():
    texts = pa.array(
        ["the quick brown fox", "one", "", "a b a b a", "x y"],
        pa.string(),
    )
    flat, parent = tokens_flat(texts)
    for n in (2, 3):
        sh, par = make_shingles(flat, parent, n)
        want = []
        for row, t in enumerate(texts.to_pylist()):
            toks = tokenize(t)
            for i in range(len(toks) - n + 1):
                want.append((" ".join(toks[i:i + n]), row))
        assert list(zip(sh.to_pylist(), par.tolist())) == want, n


DOCS = {
    0: "spark join the data stream fast",
    1: "join the data spark join data",
    2: "data join spark stream",
    3: "the quick spark join",
    4: "spark alone",
}


@pytest.fixture(scope="module")
def g2_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("g2idx")
    t = pa.table(
        {
            "src_doc_id": pa.array(sorted(DOCS), pa.int64()),
            "text": pa.array([DOCS[i] for i in sorted(DOCS)], pa.string()),
        }
    )
    build_index(
        rd.from_arrow(t),
        cfg=IndexJobConfig(
            index_dir=str(d), key_cols=("src_doc_id",), keyword_cols=(),
            term_buckets=4, shingle_size=2,
        ),
    )
    return str(d)


@pytest.fixture(scope="module")
def g2_oracle():
    """BruteForceIndex over the shingle stream, '_'-joined so shingles
    re-tokenize to themselves ('spark join' <-> 'spark_join')."""
    docs = {}
    for i, s in DOCS.items():
        toks = tokenize(s)
        docs[i] = " ".join(
            f"{a}_{b}" for a, b in zip(toks, toks[1:])
        )
    return BruteForceIndex(docs)


def test_shingle_index_stats(g2_index, g2_oracle):
    s = Searcher(g2_index)
    # dl = shingles per doc; df/tf on shingle terms
    assert s.manifest["total_dl"] == g2_oracle.total_dl
    for sh in ["spark join", "join the", "the data", "data spark"]:
        p = s.lookup(sh)
        want = g2_oracle.df.get(sh.replace(" ", "_"), 0)
        assert (p.df if p else 0) == want, sh
    # unigrams emit nothing on the shingle field
    assert s.lookup("spark") is None


def test_shingle_bm25_rank_identical(g2_index, g2_oracle):
    s = Searcher(g2_index)
    for q in ["spark join the data", "join the data", "data spark join"]:
        toks = q.split()
        oq = " ".join(f"{a}_{b}" for a, b in zip(toks, toks[1:]))
        want = g2_oracle.search(oq, k=10)
        got = s.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=1e-9), q


def test_sayt_last_shingle_prefix(g2_index):
    """'spark join da': term clause 'spark join' + prefix 'join da%'
    (matches 'join data' docs with constant 1.0)."""
    s = Searcher(g2_index)
    got = dict(s.match_bool_prefix("spark join da", k=10))
    term_scores = dict(s.search("spark join", k=10))
    pref_docs = {d for d in DOCS if "join da" in " ".join(
        f"{a} {b}" for a, b in zip(tokenize(DOCS[d]), tokenize(DOCS[d])[1:])
    )}
    want = {}
    for d in set(term_scores) | pref_docs:
        want[d] = term_scores.get(d, 0.0) + (1.0 if d in pref_docs else 0.0)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_make_edge_prefixes_matches_bruteforce():
    from rayfts.analysis import make_edge_prefixes

    texts = pa.array(["alpha be c", "", "dd eee ffff ggggg"], pa.string())
    flat, parent = tokens_flat(texts)
    got_f, got_p = make_edge_prefixes(flat, parent, 2, 4)
    want = []
    for row, t in enumerate(texts.to_pylist()):
        for tok in tokenize(t):
            for n in range(2, 5):
                if len(tok) >= n:
                    want.append((tok[:n], row))
    # order within the stream is per-length-pass; compare as multisets
    assert sorted(zip(got_f.to_pylist(), got_p.tolist())) == sorted(want)


def test_index_prefixes_exact_probe(tmp_path_factory):
    """On a (2,4) prefix index: in-range prefixes resolve by ONE exact
    term probe and equal the brute-force LIKE set; out-of-range lengths
    fall back to the dictionary scan and still agree."""
    d = tmp_path_factory.mktemp("pfxidx")
    docs = {0: "spark join", 1: "sparse data", 2: "join spin",
            3: "data spa", 4: "unrelated words"}
    t = pa.table({
        "src_doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
    })
    build_index(
        rd.from_arrow(t),
        cfg=IndexJobConfig(
            index_dir=str(d), key_cols=("src_doc_id",), keyword_cols=(),
            term_buckets=4, index_prefixes=(2, 4),
        ),
    )
    s = Searcher(str(d))
    def brute(pre):
        return sorted(
            i for i, x in docs.items()
            if any(tok.startswith(pre) for tok in tokenize(x))
        )
    for pre in ["sp", "spa", "spar", "jo", "da", "zz"]:   # in range
        assert s.prefix_exact_docs(pre, limit=10) == brute(pre), pre
        # the in-range probe IS one dictionary lookup
        p = s.lookup(pre)
        assert (p.df if p else 0) == len(brute(pre)), pre
    # out of range: shorter-than-min scans the subfield dictionary;
    # longer-than-max routes to the ROOT-field searcher (the ES split)
    root_dir = tmp_path_factory.mktemp("pfxroot")
    build_index(
        rd.from_arrow(t),
        cfg=IndexJobConfig(
            index_dir=str(root_dir), key_cols=("src_doc_id",),
            keyword_cols=(), term_buckets=4,
        ),
    )
    root = Searcher(str(root_dir))
    for pre in ["s", "spark"]:
        assert s.prefix_exact_docs(pre, limit=10, root=root) == brute(pre), pre


def test_sharded_shingle_mbp_equals_global(g2_index, tmp_path_factory):
    from rayfts.segments import build_segments, open_multisearcher

    d = tmp_path_factory.mktemp("g2segs")
    t = pa.table(
        {
            "src_doc_id": pa.array(sorted(DOCS), pa.int64()),
            "text": pa.array([DOCS[i] for i in sorted(DOCS)], pa.string()),
        }
    )
    build_segments(
        [rd.from_arrow(t.slice(0, 3)), rd.from_arrow(t.slice(3))],
        str(d),
        cfg=IndexJobConfig(
            key_cols=("src_doc_id",), keyword_cols=(), term_buckets=4,
            shingle_size=2,
        ),
    )
    ms = open_multisearcher(str(d))
    s = Searcher(g2_index)
    for q in ["spark join da", "join the data st"]:
        a = s.match_bool_prefix(q, k=10)
        b = ms.match_bool_prefix(q, k=10)
        assert [(d1, pytest.approx(x, abs=1e-12)) for d1, x in a] == b, q
