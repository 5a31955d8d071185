"""Index-time stemming — Lucene EnglishMinimalStemFilter / ES analyzer
``stemmer: minimal_english`` (the Harman S-stemmer).

Spec pinned here:
  * the per-token rules match Lucene's per-char switch exactly
    (pinned examples + a pure-Python reference over mixed vocab);
  * postings/df/tf meet on STEMMED terms (plural and singular forms
    merge); dl/avgdl are unchanged (token->token 1:1 map);
  * the same kernel stems query terms, so plural queries hit singular
    docs and duplicate post-stem clauses merge with summed weights.
"""

import pyarrow as pa
import pytest

import ray.data as rd

from rayfts.analysis import minimal_english_stem
from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.oracle import BruteForceIndex, tokenize
from rayfts.search import Searcher


def stem_ref(w: str) -> str:
    """Pure-Python port of Lucene EnglishMinimalStemmer.stem (char switch)."""
    if len(w) < 3 or not w.endswith("s"):
        return w
    if w[-2] in "us":
        return w
    if w[-2] == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaoe":
            return w
    return w[:-1]


PINNED = {
    "ponies": "pony",
    "ties": "ty",
    "cats": "cat",
    "dogs": "dog",
    "days": "day",
    "gas": "ga",
    "this": "thi",
    "news": "new",
    "bus": "bus",       # us$
    "mess": "mess",     # ss$
    "goes": "goes",     # oes$
    "sees": "sees",     # ees$
    "aies": "aies",     # ies$ with a before i
    "ies": "ies",       # len>3 fails
    "is": "is",         # len<3
    "us": "us",
    "s": "s",
    "join": "join",     # no trailing s
    "123s": "123",
}


def test_minimal_english_pinned_examples():
    got = minimal_english_stem(pa.array(list(PINNED), pa.string())).to_pylist()
    assert got == list(PINNED.values())


def test_kernel_matches_python_reference():
    vocab = (
        list(PINNED)
        + ["makes", "queries", "tables", "files", "classes", "boxes",
           "cafés", "übers", "w0007s", "spark", "joins", "xs",
           "ass", "eies", "oies", "uies", "axes", "iés"]
    )
    got = minimal_english_stem(pa.array(vocab, pa.string())).to_pylist()
    assert got == [stem_ref(w) for w in vocab]


DOCS = {
    0: "ponies run fast and the pony jumps over tables",
    1: "a pony likes tables and chairs and boxes",
    2: "cats chase dogs while the cat sleeps",
    3: "spark joins data with join keys and merges streams",
    4: "the bus goes past the mess in the news",
    5: "query engines run queries over files and classes",
}


@pytest.fixture(scope="module")
def stem_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("stemidx")
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
            term_buckets=4, stemmer="minimal_english",
        ),
    )
    return str(d)


@pytest.fixture(scope="module")
def stem_oracle():
    """BruteForceIndex over PRE-STEMMED text: tf/df/dl/scores then equal
    the stem-analyzed index exactly (stems re-tokenize to themselves)."""
    docs = {
        i: " ".join(stem_ref(tok) for tok in tokenize(s))
        for i, s in DOCS.items()
    }
    return BruteForceIndex(docs)


def test_postings_merge_on_stems(stem_index, stem_oracle):
    s = Searcher(stem_index)
    # plural + singular forms collapsed: one posting list per stem
    for term, df in [("pony", 2), ("table", 2), ("cat", 1), ("join", 1),
                     ("query", 1), ("boxe", 1), ("chair", 1)]:
        p = s.lookup(term)
        assert (p.df if p else 0) == df == stem_oracle.df.get(term, 0), term
    # raw plural forms emit no postings of their own
    for raw in ["ponies", "tables", "cats", "joins", "queries"]:
        assert s.lookup(raw) is None, raw
    # dl is UNCHANGED by stemming (1:1 token map)
    assert s.manifest["total_dl"] == sum(
        len(tokenize(t)) for t in DOCS.values()
    )


def test_stem_index_rank_identical(stem_index, stem_oracle):
    s = Searcher(stem_index)
    for q in ["pony tables", "ponies table", "cats dogs", "query files",
              "joins data", "bus goes mess"]:
        want = stem_oracle.search(" ".join(stem_ref(t) for t in q.split()), k=10)
        for algo in ("taat", "wand"):
            got = s.search(q, k=10, algo=algo)
            assert [d for d, _ in got] == [d for d, _ in want], (q, algo)
            for (_, a), (_, b) in zip(got, want):
                assert a == pytest.approx(b, abs=1e-9), (q, algo)


def test_duplicate_post_stem_clauses_merge(stem_index):
    """'ponies pony' stems to pony+pony -> ONE clause of weight 2 ==
    the explicit boost form 'pony^2' (Lucene duplicate clauses sum)."""
    s = Searcher(stem_index)
    assert s.search("ponies pony", k=10) == s.search("pony^2", k=10)
