"""Index-time stop filtering — Lucene StopFilter / ES analyzer stopwords.

Spec pinned here:
  * stop tokens emit NO postings and do not count toward dl (norms);
  * their POSITIONS remain as gaps in the positional sidecar
    (enablePositionIncrements=true), so a phrase across a removed
    stopword matches whatever token occupies the gap;
  * the same stop list applies to queries (one analyzer), so a stop
    term inside a mode="and" query is dropped, not treated as a failed
    required clause.
"""

import numpy as np
import pytest

import ray.data as rd

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.fixtures import REFERENCE_QUERIES, generate_transcripts
from rayfts.oracle import BruteForceIndex, tokenize
from rayfts.search import (
    MultiSearcher,
    Searcher,
    SharedIndexHandle,
    SharedSearcher,
)

STOPS = ("the", "a", "to", "ok")
N_CONVS = 40
SEED = 42


def _table():
    t = generate_transcripts(N_CONVS, seed=SEED)
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


@pytest.fixture(scope="module")
def stop_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("stopidx")
    build_index(
        rd.from_arrow(_table()),
        cfg=IndexJobConfig(
            index_dir=str(d), term_buckets=8, index_positions=True,
            stopwords=STOPS,
        ),
    )
    return str(d)


@pytest.fixture(scope="module")
def stop_oracle():
    """BruteForceIndex over stop-FILTERED text: tf/df/dl then equal the
    stop-analyzed index's statistics exactly."""
    t = _table()
    docs = {
        i: " ".join(tok for tok in tokenize(s) if tok not in STOPS)
        for i, s in enumerate(t["text"].to_pylist())
    }
    return BruteForceIndex(docs), t


def test_stop_terms_absent_and_norms_filtered(stop_index, stop_oracle):
    idx, _ = stop_oracle
    s = Searcher(stop_index)
    for t in STOPS:
        assert s.lookup(t) is None, t
    assert s.manifest["total_dl"] == idx.total_dl
    assert abs(s.avgdl - idx.avgdl) < 1e-9
    for term in ["w0007", "bash", "edit"]:
        p = s.lookup(term)
        assert (p.df if p else 0) == idx.df.get(term, 0), term


def test_stop_index_rank_identical(stop_index, stop_oracle):
    """Queries containing stopwords rank identically to the filtered
    oracle on every executor (the stop terms drop on both sides)."""
    idx, _ = stop_oracle
    s = Searcher(stop_index)
    ss = SharedSearcher(SharedIndexHandle(stop_index))
    for q in REFERENCE_QUERIES + ["the a to ok", "the w0007 bash"]:
        want = idx.search(q, k=10)
        for ex, algo in ((s, "taat"), (s, "wand"), (ss, "taat")):
            got = ex.search(q, k=10, algo=algo)
            assert [d for d, _ in got] == [d for d, _ in want], (q, algo)
            for (_, a), (_, b) in zip(got, want):
                assert a == pytest.approx(b, abs=1e-9), (q, algo)


def test_stop_term_in_and_query_is_dropped_not_required(stop_index):
    """ES behavior: the analyzer removes 'the' BEFORE the must check, so
    mode='and' with a stopword equals the query without it — not []."""
    s = Searcher(stop_index)
    got = s.search("the w0007 bash", k=10, mode="and")
    want = s.search("w0007 bash", k=10, mode="and")
    assert got == want and got
    # all-stopword query -> no terms -> empty
    assert s.search("the a to", k=10) == []


def test_phrase_across_stopword_gap(stop_index, stop_oracle):
    """'x the y' matches docs where y sits two RAW positions after x —
    the removed stopword leaves a position gap that any token of the doc
    may occupy (Lucene enablePositionIncrements)."""
    idx, t = stop_oracle
    s = Searcher(stop_index)
    raw = [tokenize(x) for x in t["text"].to_pylist()]
    # pick the most frequent (tok[i], tok[i+2]) non-stop pair from data
    from collections import Counter

    pairs = Counter()
    for toks in raw:
        for i in range(len(toks) - 2):
            if toks[i] not in STOPS and toks[i + 2] not in STOPS:
                pairs[(toks[i], toks[i + 2])] += 1
    (x, y), _ = pairs.most_common(1)[0]
    expect = {}
    for d, toks in enumerate(raw):
        pf = sum(
            1 for i in range(len(toks) - 2)
            if toks[i] == x and toks[i + 2] == y
        )
        if pf:
            expect[d] = pf
    assert expect, "fixture should contain gap-phrase matches"
    got = s.search_phrase(f"{x} the {y}", k=len(expect) + 5)
    assert {d: None for d, _ in got}.keys() == expect.keys()
    # scores follow the phrase spec with pf over the gap matches
    W = idx.idf(x) + idx.idf(y)
    for d, sc in got:
        pf = expect[d]
        dl = idx.dl[d]
        want = W * (
            pf * (idx.k1 + 1.0)
            / (pf + idx.k1 * (1.0 - idx.b + idx.b * dl / idx.avgdl))
        )
        assert sc == pytest.approx(want, abs=1e-9), d
    # leading stopword: phrase reduces to the surviving slots, rebased
    assert s.search_phrase("the w0007", k=10) == \
        s.search_phrase("w0007", k=10)


def test_phrase_keyspace_survives_stopword_dense_doc(tmp_path_factory):
    """Regression: a doc whose STORED positions far exceed its
    stop-filtered dl ('the '*40 + payload → dl=2, max position=41) must
    not overflow the (doc, position) key space used by _phrase_freqs /
    span_near_docs — L is derived from the postings' max position, not
    dl. Before the fix this raised IndexError (phantom doc ids) or
    silently returned wrong docs."""
    import pyarrow as pa
    import ray.data as rd

    texts = [
        "the " * 40 + "alpha beta",   # doc 0: dl=2, positions 40,41
        "alpha gamma beta",           # doc 1: alpha..beta NOT adjacent
        "beta alpha",                 # doc 2: reversed
        "the alpha the beta the",     # doc 3: alpha@1 beta@3 (gap)
    ]
    n = len(texts)
    t = pa.table({
        "conv_id": pa.array([f"conv-{i:07d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([1_000_000 * i for i in range(n)],
                       pa.timestamp("us")),
    })
    d = tmp_path_factory.mktemp("stopdense")
    build_index(
        rd.from_arrow(t),
        cfg=IndexJobConfig(
            index_dir=str(d), term_buckets=4, index_positions=True,
            stopwords=("the",),
        ),
    )
    s = Searcher(str(d))
    hits = s.search_phrase("alpha beta", k=10)
    assert [doc for doc, _ in hits] == [0]
    # 'alpha the beta' = alpha with beta two raw positions later — the
    # gap may hold ANY token: doc 3 (gap=the) and doc 1 (gap=gamma);
    # doc 3 ranks first (smaller dl)
    assert [doc for doc, _ in s.search_phrase("alpha the beta", k=10)] \
        == [3, 1]
    # span_near over the same corpus: in-order chains within slop
    assert s.span_near_docs(["alpha", "beta"], slop=0) == [(0, 1)]
    assert sorted(s.span_near_docs(["alpha", "beta"], slop=1)) == \
        [(0, 1), (1, 1), (3, 1)]
    # phrase_prefix shares _phrase_freqs; suggest path shares _bigram_count
    assert [doc for doc, _ in s.search_phrase_prefix("alpha bet", k=10)] \
        == [0]
    assert s._bigram_count("alpha", "beta") == 1


def test_sharded_stop_index_equals_global(stop_index, tmp_path_factory):
    import pyarrow.compute as pc

    t = _table()
    cut = "conv-0000020"
    root = tmp_path_factory.mktemp("stopseg")
    dirs = []
    for name, tbl in [
        ("a", t.filter(pc.less(t["conv_id"], cut))),
        ("b", t.filter(pc.greater_equal(t["conv_id"], cut))),
    ]:
        d = str(root / name)
        build_index(
            rd.from_arrow(tbl),
            cfg=IndexJobConfig(
                index_dir=d, term_buckets=8, index_positions=True,
                stopwords=STOPS,
            ),
        )
        dirs.append(d)
    single = Searcher(stop_index)
    multi = MultiSearcher(dirs)
    for q in ["the w0007 bash", "the a to ok", "w0007"]:
        assert multi.search(q, k=10) == single.search(q, k=10), q
        assert multi.search(q, k=10, algo="wand") == \
            single.search(q, k=10), q
    assert multi.search_phrase("the w0007", k=10) == \
        single.search_phrase("the w0007", k=10)


def test_analyze_preserves_stop_gaps(stop_index):
    """_analyze on a stop-filtered index: stop tokens vanish but their
    position slots remain (enablePositionIncrements)."""
    s = Searcher(stop_index)
    assert s.analyze("the big cat a dog") == \
        [("big", 1), ("cat", 2), ("dog", 4)]


def test_analyze_api_stop_gaps_and_fold(stop_index):
    """_analyze: token stream under the index's analyzer — stopwords
    removed, positions keep gaps; fold=True folds accents first."""
    s = Searcher(stop_index)
    got = s.analyze("The quick ok fox to jumps")
    assert got == [("quick", 1), ("fox", 3), ("jumps", 5)]
    assert s.analyze("the a to ok") == []
    assert s.analyze("") == []
    # fold knob: accents collapse with the asciifolding kernel
    assert s.analyze("Crème brûlée", fold=True) == \
        [("creme", 0), ("brulee", 1)]
    assert s.analyze("Crème brûlée") == [("crème", 0), ("brûlée", 1)]


def test_field_masked_span_cross_index(stop_index, tmp_path_factory):
    """field_masking_span: slots from the UNSTOPPED index ('the' — which
    the stop subfield doesn't even hold) and the STOP index (content
    term at raw-stream positions) chain on one position axis; the result
    equals the raw-stream span_near spec. Degenerate masking (all slots
    one index) is exactly span_near_docs; mismatched doc spaces raise."""
    from rayfts.search import field_masked_span_near_docs

    d = tmp_path_factory.mktemp("fullidx")
    build_index(
        rd.from_arrow(_table()),
        cfg=IndexJobConfig(
            index_dir=str(d), term_buckets=8, index_positions=True,
        ),
    )
    full = Searcher(str(d))
    stop = Searcher(stop_index)
    assert stop.lookup("the") is None  # the masked field can't serve it
    big = 10**6
    for t2, slop in [("bash", 3), ("w0007", 5)]:
        got = field_masked_span_near_docs(
            [(full, "the"), (stop, t2)], slop=slop, limit=big
        )
        want = full.span_near_docs(["the", t2], slop=slop, limit=big)
        assert got == want, t2
        assert want, t2  # fixture must exercise real chains
    got = field_masked_span_near_docs(
        [(full, "the"), (full, "bash")], slop=2, limit=50
    )
    assert got == full.span_near_docs(["the", "bash"], slop=2, limit=50)
    assert field_masked_span_near_docs(
        [(full, "zzzz_absent"), (stop, "bash")]
    ) == []
    tiny_dir = tmp_path_factory.mktemp("tinyidx")
    build_index(
        rd.from_arrow(generate_transcripts(3, seed=7)),
        cfg=IndexJobConfig(
            index_dir=str(tiny_dir), term_buckets=2, index_positions=True,
        ),
    )
    with pytest.raises(ValueError, match="doc space"):
        field_masked_span_near_docs(
            [(full, "the"), (Searcher(str(tiny_dir)), "bash")]
        )
