"""Positional postings + phrase/bool/prefix queries — conformance + layout.

The positional sidecar is the Lucene .pos analog (SURVEY T3 extension);
phrase scoring is the PhraseQuery analog with the spec pinned in
``rayfts.oracle.BruteForceIndex.search_phrase``. Tests verify:
  * engine phrase top-k rank+score-identical to the oracle (file, shared
    and sharded executors);
  * decoded positions equal the re-tokenized corpus exactly;
  * salted positional builds stay byte-identical to unsalted ones (the
    concat-stitch invariant extends to the .pos stream);
  * both exchange codecs produce identical positional indexes;
  * ES bool-query semantics (mode="and" / must_not) and prefix expansion
    match the oracle across executors.
"""

import os

import numpy as np
import pytest

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.fixtures import generate_transcripts, write_transcripts
from rayfts.oracle import BruteForceIndex, tokenize
from rayfts.search import MultiSearcher, Searcher, SharedIndexHandle, SharedSearcher

N_CONVS = 50
SEED = 42

PHRASES = [
    "same text across",        # fixture sentinel rows (2 docs)
    "the w0007",
    "the a",                   # hot bigram, many docs
    "a the",
    "the the",                 # repeated slot
    "to ok the",               # hot trigram
    "zzzz_absent the",         # absent term -> empty
    "w0007",                   # single-slot degenerate
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pcorpus")
    write_transcripts(str(d), n_convs=N_CONVS, seed=SEED)
    return str(d)


@pytest.fixture(scope="module")
def pos_index(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("pindex")
    cfg = IndexJobConfig(index_dir=str(d), term_buckets=8, index_positions=True)
    build_index(corpus, cfg=cfg, rows_per_part=100)
    return str(d)


@pytest.fixture(scope="module")
def oracle():
    t = generate_transcripts(N_CONVS, seed=SEED)
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    docs = {i: s for i, s in enumerate(t["text"].to_pylist())}
    return BruteForceIndex(docs)


def _rounded(hits):
    return [(d, round(s, 9)) for d, s in hits]


def test_phrase_rank_identical(pos_index, oracle):
    s = Searcher(pos_index)
    for phrase in PHRASES:
        assert _rounded(s.search_phrase(phrase, k=10)) == _rounded(
            oracle.search_phrase(phrase, k=10)
        ), phrase


def test_phrase_shared_and_sharded_identical(corpus, pos_index, oracle, tmp_path_factory):
    from rayfts.segments import build_segments, open_multisearcher

    ss = SharedSearcher(SharedIndexHandle(pos_index))
    root = tmp_path_factory.mktemp("psegs")
    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    # split the corpus in sorted halves -> 2 disjoint key-range segments
    import pyarrow.parquet as pq

    t = pq.read_table(files).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(root / "h0.parquet"))
    pq.write_table(t.slice(half), str(root / "h1.parquet"))
    cfg = IndexJobConfig(term_buckets=8, index_positions=True)
    build_segments(
        [str(root / "h0.parquet"), str(root / "h1.parquet")],
        str(root / "idx"),
        cfg,
        rows_per_part=100,
    )
    ms = open_multisearcher(str(root / "idx"))
    for phrase in PHRASES:
        want = _rounded(oracle.search_phrase(phrase, k=10))
        assert _rounded(ss.search_phrase(phrase, k=10)) == want, f"shared {phrase}"
        assert _rounded(ms.search_phrase(phrase, k=10)) == want, f"sharded {phrase}"
    # sharded multi-fragment highlight == single-index fragments
    single = Searcher(pos_index)
    q = "the w0007"
    assert ms.highlight_fragments(q, k=10, window=2) == \
        single.highlight_fragments(q, k=10, window=2)
    # sharded span_near == single-index chains
    for terms, slop in [(["the", "w0007"], 3), (["the", "a", "the"], 2)]:
        assert ms.span_near_docs(terms, slop, limit=10**6) == \
            single.span_near_docs(terms, slop, limit=10**6), (terms, slop)
    # sharded enclosing spans == single-index
    assert ms.span_containing_docs(["the", "bash"], 4, "w0000",
                                   limit=10**6) == \
        single.span_containing_docs(["the", "bash"], 4, "w0000",
                                    limit=10**6)
    assert ms.span_within_docs("w0000", ["the", "bash"], 4,
                               limit=10**6) == \
        single.span_within_docs("w0000", ["the", "bash"], 4, limit=10**6)


def test_run_queries_mixed_kinds(pos_index, oracle):
    """The distributed runner dispatches per-row kinds (_msearch body
    types) and equals the direct calls."""
    from rayfts.search import run_queries

    s = Searcher(pos_index)
    mixed = [
        "the w0007",
        ("the w0007", "phrase"),
        ('+"the w0007" bash -sed', "query_string"),
    ]
    out = run_queries(pos_index, mixed, k=5, concurrency=(1, 2)).to_pandas()
    for qid, want in [
        (0, s.search("the w0007", k=5)),
        (1, s.search_phrase("the w0007", k=5)),
        (2, s.query_string('+"the w0007" bash -sed', k=5)),
    ]:
        got = out[out.query_id == qid].sort_values("rank")
        assert got.doc_id.tolist() == [d for d, _ in want], qid
        for a, (_, b) in zip(got.score.tolist(), want):
            assert a == pytest.approx(b, rel=1e-12)
    # unknown kinds raise — never a silent BM25 fallback
    from rayfts.search import QueryRunner

    with pytest.raises(ValueError, match="kind"):
        QueryRunner(pos_index, k=3)._run_one("the", "phrse")


def test_query_string_matches_bruteforce(pos_index, oracle):
    """Parsed bool composition: must/must_not/should terms + signed
    phrases + boosts, recomputed clause by clause."""
    import math

    s = Searcher(pos_index)
    cases = [
        '+"the w0007" bash grep^2 -sed',
        'w0007 bash',                      # pure should
        '+w0007 +bash -"the a"',           # must terms + neg phrase
        '-w0007 bash',                     # neg term
        '+zzzz_absent bash',               # impossible must -> empty
        '"the w0007"^3 bash',              # boosted phrase clause
    ]
    for q in cases:
        from rayfts.search import parse_query_string
        cl = parse_query_string(q)
        weights: dict = {}
        for body, boost in cl["must"] + cl["should"]:
            for t in tokenize(body):
                weights[t] = weights.get(t, 0.0) + boost
        want = {}
        for d, toks_text in oracle.texts.items():
            toks = tokenize(toks_text)
            tset = set(toks)
            sc = 0.0
            matched = False
            for term in sorted(weights):
                f = oracle.doc_tfs[d].get(term, 0)
                if not f or term not in oracle.df:
                    continue
                matched = True
                norm = oracle.k1 * (
                    1.0 - oracle.b + oracle.b * oracle.dl[d] / oracle.avgdl
                )
                sc += (weights[term] * oracle.idf(term)) * (
                    f * (oracle.k1 + 1.0) / (f + norm)
                )
            ok = True
            for sign, raw, pb in cl["phrases"]:
                slots = tokenize(raw)
                n = len(slots)
                pf = sum(
                    1 for i in range(len(toks) - n + 1)
                    if toks[i:i + n] == slots
                )
                if sign == "-":
                    ok &= pf == 0
                    continue
                if pf:
                    matched = True
                    W = pb * sum(oracle.idf(t) for t in slots)
                    norm = oracle.k1 * (
                        1.0 - oracle.b + oracle.b * oracle.dl[d] / oracle.avgdl
                    )
                    sc += W * (pf * (oracle.k1 + 1.0) / (pf + norm))
                if sign == "+":
                    ok &= pf > 0
            for body, _ in cl["must"]:
                for t in tokenize(body):
                    ok &= t in tset
            for body in cl["must_not"]:
                ok &= not (set(tokenize(body)) & tset)
            if ok and matched:
                want[d] = sc
        exp = sorted(want.items(), key=lambda h: (-h[1], h[0]))[:10]
        got = s.query_string(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-9), q


def test_highlight_fragments_matches_bruteforce(pos_index, oracle):
    """Multi-fragment highlight: greedy non-overlapping window selection
    over ALL query-term occurrences, recomputed from raw tokens."""
    s = Searcher(pos_index)
    q, window, nf = "the w0007", 2, 3
    got = s.highlight_fragments(q, k=10, window=window, n_fragments=nf)
    assert [(d, sc) for d, sc, _ in got] == s.search(q, k=10)
    qterms = set(q.split())
    for d, _, frags in got:
        toks = tokenize(oracle.texts[d])
        ms = [(i, t) for i, t in enumerate(toks) if t in qterms]
        want = []
        next_ok = -1
        for ppos, t in ms:
            if ppos < next_ok:
                continue
            lo = max(0, ppos - window)
            want.append((ppos, t, " ".join(toks[lo:ppos + window + 1])))
            if len(want) >= nf:
                break
            next_ok = ppos + 2 * window + 1
        assert frags == want, d
        assert 1 <= len(frags) <= nf
        # fragments never overlap
        for (a, *_), (b, *_) in zip(frags, frags[1:]):
            assert b - a > 2 * window


def test_span_near_matches_bruteforce(pos_index, oracle):
    """Chain counting: all strictly-increasing in-order position chains
    with end - start - (n-1) <= slop, recomputed with nested loops."""
    from itertools import product

    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    cases = [
        (["the", "w0007"], 0), (["the", "w0007"], 3),
        (["the", "a", "the"], 2), (["w0007", "bash"], 5),
        (["the", "zzzz_absent"], 4),
    ]
    for terms, slop in cases:
        n = len(terms)
        want = []
        for d, toks in tok_docs.items():
            slots = [
                [i for i, t in enumerate(toks) if t == term]
                for term in terms
            ]
            c = sum(
                1 for chain in product(*slots)
                if all(b > a for a, b in zip(chain, chain[1:]))
                and chain[-1] - chain[0] - (n - 1) <= slop
            )
            if c:
                want.append((d, c))
        want.sort()
        got = s.span_near_docs(terms, slop, limit=10**6)
        assert got == want, (terms, slop)
    assert s.span_near_docs(["the", "w0007"], 0, limit=3) == \
        s.span_near_docs(["the", "w0007"], 0, limit=10**6)[:3]
    with pytest.raises(ValueError):
        s.span_near_docs(["the"], -1)


def test_termvectors_match_positional_index(pos_index, oracle):
    """Re-analysis termvectors == the doc's slice of the decoded
    positional postings, term by term."""
    s = Searcher(pos_index)
    for doc in [0, 7, s.N - 1]:
        tv = s.termvectors(doc)
        assert tv == sorted(tv)  # term-ascending
        toks = tokenize(oracle.texts[doc])
        assert sum(tf for _, tf, _ in tv) == len(toks)
        for term, tf, positions in tv:
            p = s.lookup(term)
            j = int(np.searchsorted(p.doc_ids, doc))
            assert p.doc_ids[j] == doc
            pos, occ = s._positions(p)
            assert pos[occ[j]:occ[j + 1]].tolist() == positions, term
            assert p.tfs[j] == tf


def test_phrase_prefix_matches_bruteforce(pos_index, oracle):
    """match_phrase_prefix: pf sums disjoint member alignments, W = fixed
    idfs + blended (max-df) idf for the expanded position — recomputed
    from raw token lists."""
    import math

    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    for phrase, me in [("the w00", 5), ("the a w00", 50), ("w0007", 3),
                       ("the zzzz_absent", 5)]:
        slots = phrase.split()
        prefix, fixed = slots[-1], slots[:-1]
        exp = sorted(t for t in oracle.df if t.startswith(prefix))[:me]
        want = []
        if exp:
            dfb = max(oracle.df[t] for t in exp)
            W = 0.0
            for t in fixed:
                W += oracle.idf(t)
            W += math.log(1.0 + (oracle.N - dfb + 0.5) / (dfb + 0.5))
            eset = set(exp)
            for d, toks in tok_docs.items():
                n = len(slots)
                pf = sum(
                    1 for i in range(len(toks) - n + 1)
                    if toks[i:i + n - 1] == fixed and toks[i + n - 1] in eset
                )
                if pf:
                    norm = oracle.k1 * (
                        1.0 - oracle.b + oracle.b * oracle.dl[d] / oracle.avgdl
                    )
                    want.append(
                        (d, W * (pf * (oracle.k1 + 1.0) / (pf + norm)))
                    )
            want.sort(key=lambda h: (-h[1], h[0]))
        got = s.search_phrase_prefix(phrase, k=10, max_expansions=me)
        assert [d for d, _ in got] == [d for d, _ in want[:10]], phrase
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9), phrase


def test_positions_roundtrip_exact(pos_index, oracle):
    """Decoded positions == the re-tokenized corpus, term by term."""
    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    for term in ["the", "w0007", "same", "longturn", "foo_bar"]:
        p = s.lookup(term)
        assert p is not None, term
        pos, occ = s._positions(p)
        for j, doc in enumerate(p.doc_ids.tolist()):
            want = [i for i, t in enumerate(tok_docs[doc]) if t == term]
            got = pos[occ[j] : occ[j + 1]].tolist()
            assert got == want, (term, doc)


def test_phrase_requires_positional_index(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("nopos")
    build_index(
        corpus,
        cfg=IndexJobConfig(index_dir=str(d), term_buckets=8),
        rows_per_part=100,
    )
    s = Searcher(str(d))
    with pytest.raises(ValueError, match="positions"):
        s.search_phrase("the a", k=5)


def _bucket_bytes(d):
    out = {}
    pdir = os.path.join(d, "postings")
    for f in sorted(os.listdir(pdir)):
        with open(os.path.join(pdir, f), "rb") as fh:
            out[f] = fh.read()
    return out


def test_salted_positional_build_byte_identical(corpus, pos_index, tmp_path_factory):
    """Hot-term salting must stitch the .pos stream too: per-doc position
    groups are self-contained, so the salted bucket files equal the
    unsalted positional build byte-for-byte."""
    d = tmp_path_factory.mktemp("psalt")
    cfg = IndexJobConfig(
        index_dir=str(d), term_buckets=8, index_positions=True,
        salt_hot_terms=("the", "w0007"), hot_term_salts=3,
    )
    build_index(corpus, cfg=cfg, rows_per_part=100)
    assert _bucket_bytes(str(d)) == _bucket_bytes(pos_index)


def test_varint_exchange_positional_identical(corpus, pos_index, tmp_path_factory):
    d = tmp_path_factory.mktemp("pvarint")
    cfg = IndexJobConfig(
        index_dir=str(d), term_buckets=8, index_positions=True,
        exchange_codec="varint",
    )
    build_index(corpus, cfg=cfg, rows_per_part=100)
    assert _bucket_bytes(str(d)) == _bucket_bytes(pos_index)


BOOL_CASES = [
    ("the w0007", "and", None),
    ("the a to", "and", None),
    ("w0007 bash", "and", None),
    ("the zzzz_absent", "and", None),      # required term absent -> []
    ("the w0007", "or", "bash"),
    ("the a", "or", "w0007 ok"),
    ("the a to", "and", "w0042"),
]


def test_bool_and_must_not_match_oracle(pos_index, oracle):
    s = Searcher(pos_index)
    ss = SharedSearcher(SharedIndexHandle(pos_index))
    for q, mode, mn in BOOL_CASES:
        want = _rounded(oracle.search(q, k=10, mode=mode, must_not=mn))
        for algo in ("taat", "wand"):
            got = _rounded(s.search(q, k=10, algo=algo, mode=mode, must_not=mn))
            assert got == want, (q, mode, mn, algo)
        got = _rounded(ss.search(q, k=10, mode=mode, must_not=mn))
        assert got == want, (q, mode, mn, "shared")


def test_bool_sharded_identical(pos_index, oracle, tmp_path_factory):
    ms = MultiSearcher([pos_index])  # 1-segment MultiSearcher == global
    for q, mode, mn in BOOL_CASES:
        want = _rounded(oracle.search(q, k=10, mode=mode, must_not=mn))
        for algo in ("taat", "wand"):
            got = _rounded(ms.search(q, k=10, algo=algo, mode=mode, must_not=mn))
            assert got == want, (q, mode, mn, algo)


def test_rescore_window_matches_manual(pos_index, oracle):
    """ES rescore: combined = qw*base + rw*phrase over the top-window
    ONLY — membership comes from the base ranking, docs outside the
    window can never enter, phrase-less docs keep their weighted base."""
    s = Searcher(pos_index)
    q, ph, win = "the w0007 bash", "the a", 15
    base = s.search(q, k=win)
    psc = dict(s.search_phrase(ph, k=10**6))
    want = sorted(
        ((d, 1.0 * sc + 2.0 * psc.get(d, 0.0)) for d, sc in base),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    got = s.rescore(q, ph, window_size=win, k=10,
                    query_weight=1.0, rescore_weight=2.0)
    assert got == want
    assert {d for d, _ in got} <= {d for d, _ in base}
    assert s.rescore("zzzz_absent", ph) == []


def test_highlight_matches_tokenized_text(pos_index, oracle):
    """Highlight locates the first query-term occurrence from the
    positional sidecar; cross-checked against re-tokenized stored text,
    which the engine never reads for this."""
    import os

    import pyarrow.parquet as pq

    from rayfts.oracle import tokenize

    s = Searcher(pos_index)
    t = pq.read_table(os.path.join(pos_index, "docstore"),
                      columns=["doc_id", "text"])
    txt = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    q = "w0007 bash the"
    got = s.highlight(q, k=10, window=3)
    assert [(d, sc) for d, sc, *_ in got] == s.search(q, k=10)
    terms = set(q.split())
    for d, _, p, term, snip in got:
        toks = tokenize(txt[d])
        assert p == min(i for i, tok in enumerate(toks) if tok in terms)
        assert toks[p] == term
        assert snip == " ".join(toks[max(p - 3, 0) : p + 4])
    assert s.highlight("zzzz_absent") == []


def test_sharded_highlight_equals_global(corpus, pos_index, tmp_path_factory):
    """Two positional segments: global ranking + per-segment sidecar
    lookups reproduce the single-index highlight exactly."""
    import pyarrow.compute as pc_

    import ray.data as rd

    from rayfts.fixtures import generate_transcripts

    root = tmp_path_factory.mktemp("hseg")
    t = generate_transcripts(50, seed=42)  # same corpus as pos_index
    cut = "conv-0000025"
    dirs = []
    for name, tbl in [
        ("a", t.filter(pc_.less(t["conv_id"], cut))),
        ("b", t.filter(pc_.greater_equal(t["conv_id"], cut))),
    ]:
        d = str(root / name)
        build_index(
            rd.from_arrow(tbl),
            cfg=IndexJobConfig(
                index_dir=d, term_buckets=8, index_positions=True
            ),
        )
        dirs.append(d)
    single = Searcher(pos_index)
    multi = MultiSearcher(dirs)
    for q in ["w0007 bash the", "the a", "zzzz_absent"]:
        assert multi.highlight(q, k=10, window=2) == \
            single.highlight(q, k=10, window=2), q


def test_prefix_docs_match_oracle(pos_index, oracle):
    s = Searcher(pos_index)
    for prefix in ["w00", "w0007", "the", "zz", "long"]:
        assert s.prefix_docs(prefix, limit=25) == oracle.prefix_docs(
            prefix, limit=25
        ), prefix
    # expansion list is sorted + truncated deterministically
    exp = s.expand_prefix("w00", max_expansions=5)
    assert exp == sorted(exp) and len(exp) == 5


def test_wildcard_docs_match_oracle(pos_index, oracle):
    """ES WildcardQuery analog: glob expansion (* = any run, ? = one
    char, everything else literal incl. regex metachars) + constant-score
    rewrite match the oracle; file and sharded executors agree."""
    s = Searcher(pos_index)
    ms = MultiSearcher([pos_index])
    for pattern in [
        "w0*",        # prefix-shaped glob
        "w000?",      # fixed-length tail
        "*0007",      # leading-star (no literal pre-prune possible)
        "t?e",        # the
        "*",          # matches every term
        "w:*",        # ':' must be treated literally -> no matches
        "zz*zz",      # no matches
    ]:
        want = oracle.wildcard_docs(pattern, limit=25)
        assert s.wildcard_docs(pattern, limit=25) == want, pattern
        assert ms.wildcard_docs(pattern, limit=25) == want, pattern
    # expansion list is sorted + truncated deterministically
    exp = s.expand_wildcard("w0*", max_expansions=5)
    assert exp == sorted(exp) and len(exp) == 5
    full = s.expand_wildcard("w0*", max_expansions=10_000)
    assert exp == full[:5]


FUZZY_CASES = [
    # (term, max_edits, prefix_length)
    ("w0007", 1, 0),    # id-token neighborhood: w0000..w9999 all at d<=1
    ("w0007", 2, 0),
    ("w0007", 1, 3),    # exact-prefix knob prunes the neighborhood
    ("the", 1, 0),
    ("tha", 1, 0),      # misspelling, exact term absent
    ("zzzzzz", 2, 0),   # nothing within 2 edits -> empty
    ("same", 2, 0),
]


def test_fuzzy_expansion_and_docs_match_oracle(pos_index, oracle):
    s = Searcher(pos_index)
    for term, me, pl in FUZZY_CASES:
        assert s.expand_fuzzy(term, me, pl) == oracle.expand_fuzzy(
            term, me, pl
        ), (term, me, pl)
        assert s.fuzzy_docs(term, max_edits=me, limit=25,
                            prefix_length=pl) == oracle.fuzzy_docs(
            term, max_edits=me, limit=25, prefix_length=pl
        ), (term, me, pl)
    # max_expansions truncation keeps the CLOSEST terms first
    full = s.expand_fuzzy("w0007", 2, 0, max_expansions=10_000)
    cut = s.expand_fuzzy("w0007", 2, 0, max_expansions=7)
    assert cut == full[:7] and [d for _, d in cut] == sorted(d for _, d in cut)


def test_fuzzy_vec_kernel_matches_python():
    import numpy as np

    from rayfts.oracle import levenshtein
    from rayfts.search import levenshtein_vec

    rng = np.random.default_rng(7)
    alpha = "abcde_01"
    cands = np.array(
        [
            "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
            for _ in range(300)
        ]
        + ["", "abc", "abcdefgh"],
        dtype=object,
    )
    for q in ["abc", "a", "abcdefgh", "e0_1d"]:
        got = levenshtein_vec(q, cands)
        want = [levenshtein(q, c) for c in cands.tolist()]
        assert got.tolist() == want, q


def test_fuzzy_sharded_and_shared_identical(corpus, pos_index, tmp_path_factory):
    from rayfts.segments import build_segments, open_multisearcher

    import pyarrow.parquet as pq

    ss = SharedSearcher(SharedIndexHandle(pos_index))
    root = tmp_path_factory.mktemp("fzseg")
    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    t = pq.read_table(files).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(root / "h0.parquet"))
    pq.write_table(t.slice(half), str(root / "h1.parquet"))
    cfg = IndexJobConfig(term_buckets=8, index_positions=True)
    build_segments(
        [str(root / "h0.parquet"), str(root / "h1.parquet")],
        str(root / "idx"),
        cfg,
        rows_per_part=100,
    )
    ms = open_multisearcher(str(root / "idx"))
    s = Searcher(pos_index)
    for term, me, pl in FUZZY_CASES:
        want_exp = s.expand_fuzzy(term, me, pl)
        want_docs = s.fuzzy_docs(term, max_edits=me, limit=25, prefix_length=pl)
        assert ss.expand_fuzzy(term, me, pl) == want_exp, (term, "shared")
        assert ss.fuzzy_docs(term, max_edits=me, limit=25,
                             prefix_length=pl) == want_docs, (term, "shared")
        assert ms.expand_fuzzy(term, me, pl) == want_exp, (term, "sharded")
        assert ms.fuzzy_docs(term, max_edits=me, limit=25,
                             prefix_length=pl) == want_docs, (term, "sharded")


def test_phrase_and_prefix_respect_tombstones(corpus, tmp_path_factory, oracle):
    from rayfts.admin import exclude_docs

    d = tmp_path_factory.mktemp("ptomb")
    cfg = IndexJobConfig(index_dir=str(d), term_buckets=8, index_positions=True)
    build_index(corpus, cfg=cfg, rows_per_part=100)
    s0 = Searcher(str(d))
    base = s0.search_phrase("same text across", k=10)
    assert len(base) == 2
    dead = base[0][0]
    exclude_docs(str(d), [dead])
    s1 = Searcher(str(d))
    hits = s1.search_phrase("same text across", k=10)
    assert [h[0] for h in hits] == [h[0] for h in base if h[0] != dead]
    assert all(d_ != dead for d_, _ in s1.prefix_docs("same", limit=50))


def test_phrase_pagination(pos_index, oracle):
    """Phrase pagination: offset slices the full phrase ranking; the
    search_after cursor walk reconstructs it exactly (ties resume on
    doc_id)."""
    s = Searcher(pos_index)
    for phrase in PHRASES:
        full = s.search_phrase(phrase, k=10**6)
        for off in (0, 1, 3, len(full)):
            assert s.search_phrase(phrase, k=5, offset=off) == \
                full[off:off + 5], (phrase, off)
        walked, cursor = [], None
        while True:
            page = s.search_phrase(phrase, k=3, search_after=cursor)
            if not page:
                break
            walked.extend(page)
            cursor = page[-1]
            assert len(walked) <= len(full), (phrase, "cursor loop")
        assert walked == full, phrase
    with pytest.raises(ValueError):
        s.search_phrase(PHRASES[0], k=3, offset=2, search_after=(0, 1.0))


def test_span_first_matches_bruteforce(pos_index, oracle):
    """span_first: occurrences at 0-based position < end, per-doc count,
    recomputed with a plain enumerate scan; sharded == single."""
    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    for term, end in [("the", 1), ("the", 4), ("w0007", 6),
                      ("bash", 2), ("zzzz_absent", 3)]:
        want = []
        for d, toks in tok_docs.items():
            c = sum(1 for i, t in enumerate(toks[:end]) if t == term)
            if c:
                want.append((d, c))
        want.sort()
        got = s.span_first_docs(term, end, limit=10**6)
        assert got == want, (term, end)
    assert s.span_first_docs("the", 4, limit=5) == \
        s.span_first_docs("the", 4, limit=10**6)[:5]
    with pytest.raises(ValueError):
        s.span_first_docs("the", 0)


def test_sharded_span_first_equals_global(pos_index, corpus, tmp_path_factory):
    from rayfts.segments import build_segments, open_multisearcher

    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("sf_segs")
    files = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    t = pq.read_table(files).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(root / "h0.parquet"))
    pq.write_table(t.slice(half), str(root / "h1.parquet"))
    build_segments(
        [str(root / "h0.parquet"), str(root / "h1.parquet")],
        str(root / "idx"),
        IndexJobConfig(term_buckets=8, index_positions=True),
        rows_per_part=100,
    )
    multi = open_multisearcher(str(root / "idx"))
    single = Searcher(pos_index)
    for term, end in [("the", 3), ("w0007", 6), ("zzzz_absent", 2)]:
        assert multi.span_first_docs(term, end, limit=10**6) == \
            single.span_first_docs(term, end, limit=10**6), (term, end)
    # span_or / span_not ride the same segment build: per-doc counts,
    # so sharded concatenation must equal the single index verbatim
    for terms in (["the", "w0007"], ["bash", "ok"], ["zzzz_absent"]):
        assert multi.span_or_docs(terms, limit=10**6) == \
            single.span_or_docs(terms, limit=10**6), terms
    for inc, exc, pre, post in [("the", "a", 1, 2), ("w0007", "the", 0, 3)]:
        assert multi.span_not_docs(inc, exc, pre=pre, post=post,
                                   limit=10**6) == \
            single.span_not_docs(inc, exc, pre=pre, post=post,
                                 limit=10**6), (inc, exc)
    for terms, slop in [(["the", "w0007"], 2), (["w0007", "bash"], 5)]:
        assert multi.span_near_unordered_docs(terms, slop,
                                              limit=10**6) == \
            single.span_near_unordered_docs(terms, slop, limit=10**6), \
            (terms, slop)


def test_span_or_matches_bruteforce(pos_index, oracle):
    """span_or: per-doc total occurrences of any clause term, recomputed
    with a plain token scan; clauses dedupe; absent terms drop out."""
    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    for terms in [["the", "w0007"], ["bash", "ok", "bash"],
                  ["zzzz_absent"], ["zzzz_absent", "w0007"], []]:
        uniq = set(terms)
        want = []
        for d, toks in tok_docs.items():
            c = sum(1 for t in toks if t in uniq)
            if c:
                want.append((d, c))
        want.sort()
        got = s.span_or_docs(terms, limit=10**6)
        assert got == want, terms
    assert s.span_or_docs(["the", "w0007"], limit=5) == \
        s.span_or_docs(["the", "w0007"], limit=10**6)[:5]


def test_span_not_matches_bruteforce(pos_index, oracle):
    """span_not: include occurrences surviving unless an exclude
    occurrence sits in [pos - pre, pos + post], recomputed with a plain
    positional scan; include == exclude kills everything."""
    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    cases = [("the", "a", 0, 0), ("the", "a", 1, 2), ("the", "ok", 2, 1),
             ("w0007", "the", 0, 3), ("the", "zzzz_absent", 1, 1),
             ("zzzz_absent", "the", 1, 1)]
    for inc, exc, pre, post in cases:
        want = []
        for d, toks in tok_docs.items():
            ipos = [i for i, t in enumerate(toks) if t == inc]
            epos = [i for i, t in enumerate(toks) if t == exc]
            c = sum(
                1 for p in ipos
                if not any(p - pre <= q <= p + post for q in epos)
            )
            if c:
                want.append((d, c))
        want.sort()
        got = s.span_not_docs(inc, exc, pre=pre, post=post, limit=10**6)
        assert got == want, (inc, exc, pre, post)
    assert s.span_not_docs("the", "the", limit=10**6) == []
    assert s.span_not_docs("the", "a", pre=1, post=2, limit=5) == \
        s.span_not_docs("the", "a", pre=1, post=2, limit=10**6)[:5]
    with pytest.raises(ValueError):
        s.span_not_docs("the", "a", pre=-1)


def _chains_ref(toks, terms, slop):
    """All in-order chains (start, end) of `terms` within total slack."""
    n = len(terms)
    out = []
    positions = [
        [i for i, w in enumerate(toks) if w == t] for t in terms
    ]

    def rec(slot, prev, start):
        if slot == n:
            out.append((start, prev))
            return
        for p in positions[slot]:
            if p > prev and (slot < n - 1 or p - start - (n - 1) <= slop):
                if p - start - (n - 1) <= slop:
                    rec(slot + 1, p, start)
    for p0 in positions[0]:
        rec(1, p0, p0)
    return out


def test_span_containing_and_within_bruteforce(pos_index):
    """Enclosing span queries vs a per-doc reference enumeration."""
    s = Searcher(pos_index)
    t = generate_transcripts(N_CONVS, seed=SEED)
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = t["text"].to_pylist()
    big = ["the", "bash"]
    little = "w0000"
    slop = 4
    want_c, want_w = [], []
    for d, tx in enumerate(texts):
        toks = tokenize(tx)
        chains = _chains_ref(toks, big, slop)
        lp = {i for i, w in enumerate(toks) if w == little}
        nc = sum(1 for a, b in chains if any(a <= p <= b for p in lp))
        nw = sum(1 for p in lp if any(a <= p <= b for a, b in chains))
        if nc:
            want_c.append((d, nc))
        if nw:
            want_w.append((d, nw))
    got_c = s.span_containing_docs(big, slop, little, limit=10 ** 6)
    got_w = s.span_within_docs(little, big, slop, limit=10 ** 6)
    assert got_c == want_c
    assert got_w == want_w
    assert want_c and want_w  # non-trivial probe
    # absent little / big clauses
    assert s.span_containing_docs(big, slop, "zzzz_absent") == []
    assert s.span_within_docs("zzzz_absent", big, slop) == []
    assert s.span_containing_docs(["zzzz_absent"], slop, little) == []


def test_span_near_unordered_matches_bruteforce(pos_index, oracle):
    """Unordered window counting: all position tuples (one per distinct
    term, any order) with max - min <= slop + k - 1, recomputed with
    nested loops; duplicate terms rejected."""
    from itertools import product

    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    cases = [
        (["the", "w0007"], 0), (["the", "w0007"], 3),
        (["w0007", "the"], 3),       # order of TERMS is irrelevant
        (["the", "a", "w0007"], 2), (["w0007", "bash"], 5),
        (["the", "zzzz_absent"], 4),
    ]
    for terms, slop in cases:
        k = len(terms)
        want = []
        for d, toks in tok_docs.items():
            slots = [
                [i for i, t in enumerate(toks) if t == term]
                for term in terms
            ]
            c = sum(
                1 for tup in product(*slots)
                if max(tup) - min(tup) <= slop + k - 1
            )
            if c:
                want.append((d, c))
        want.sort()
        got = s.span_near_unordered_docs(terms, slop, limit=10**6)
        assert got == want, (terms, slop)
    # term-order invariance, limit, errors
    a = s.span_near_unordered_docs(["the", "w0007"], 2, limit=10**6)
    b = s.span_near_unordered_docs(["w0007", "the"], 2, limit=10**6)
    assert a == b
    assert s.span_near_unordered_docs(["the", "w0007"], 2, limit=3) \
        == a[:3]
    with pytest.raises(ValueError):
        s.span_near_unordered_docs(["the", "the"], 1)
    with pytest.raises(ValueError):
        s.span_near_unordered_docs(["the", "w0007"], -1)


def test_intervals_ordered_matches_bruteforce(pos_index, oracle):
    """Intervals all_of(ordered, max_gaps) with any_of slots: all
    strictly-increasing chains where slot i matches ANY alternative,
    end - start - (n-1) <= max_gaps — recomputed with nested loops."""
    from itertools import product

    s = Searcher(pos_index)
    tok_docs = {d: tokenize(t) for d, t in oracle.texts.items()}
    cases = [
        ([("the",), ("w0007", "bash")], 2),
        ([("the",), ("a", "ok"), ("the",)], 3),
        ([("w0007", "zzzz_absent")], 0),          # single any_of slot
        ([("the",), ("zzzz_absent",)], 4),        # dead slot -> empty
    ]
    for slots, gaps in cases:
        n = len(slots)
        want = []
        for d, toks in tok_docs.items():
            idx = [
                [i for i, t in enumerate(toks) if t in alts]
                for alts in slots
            ]
            c = sum(
                1 for chain in product(*idx)
                if all(b > a for a, b in zip(chain, chain[1:]))
                and chain[-1] - chain[0] - (n - 1) <= gaps
            )
            if c:
                want.append((d, c))
        want.sort()
        got = s.intervals_ordered_docs(list(slots), gaps, limit=10**6)
        assert got == want, (slots, gaps)
    # singleton slots reduce exactly to span_near
    assert s.intervals_ordered_docs(["the", "a", "the"], 2, limit=10**6) \
        == s.span_near_docs(["the", "a", "the"], 2, limit=10**6)
    assert s.intervals_ordered_docs([], 3) == []
    with pytest.raises(ValueError):
        s.intervals_ordered_docs(["the"], -1)


def test_simple_query_string_semantics(pos_index, oracle):
    """simple_query_string against its own spec via equivalences with
    already-verified queries: OR of singleton term groups == match OR
    (same BM25 sum); an AND group == query_string's +musts; a lone
    phrase group == query_string's phrase; prefix groups add constant
    1.0; pure-negative input matches nothing."""
    s = Searcher(pos_index)
    # OR of two term groups == the match query (BM25 spec shared)
    assert s.simple_query_string("the w0007", k=50) == \
        s.search("the w0007", k=50)
    # AND group == query_string must clauses
    assert s.simple_query_string("the + w0007", k=50) == \
        s.query_string("+the +w0007", k=50)
    # lone phrase group == query_string phrase clause
    assert s.simple_query_string('"the w0007"', k=50) == \
        s.query_string('"the w0007"', k=50)
    # negation: AND NOT == query_string must + must_not
    assert s.simple_query_string("the + -w0007", k=50) == \
        s.query_string("+the -w0007", k=50)
    # prefix group: every doc holding an expansion, constant score 1.0
    hits = s.simple_query_string("w000*", k=10**6)
    terms = s.expand_prefix("w000")
    want = sorted(
        int(d) for d in np.flatnonzero(s._present_mask(terms))
    )
    assert sorted(d for d, _ in hits) == want
    assert all(sc == 1.0 for _, sc in hits)
    # pure-negative group matches nothing (Lucene rule)
    assert s.simple_query_string("-the", k=50) == []
    # lenient: operator soup is empty, never raises
    assert s.simple_query_string("| + - ( * )", k=10) == []
    # group match is all-positive-atoms: doc set of 'the + w0007'
    # is the posting intersection
    got = {d for d, _ in s.simple_query_string("the + w0007", k=10**6)}
    m = s._present_mask(["the"]) & s._present_mask(["w0007"])
    assert got == set(np.flatnonzero(m).tolist())


def test_span_multi_matches_expanded_intervals(pos_index, oracle):
    """span_multi == intervals over the explicit term-dictionary
    expansions (Lucene's SpanMultiTermQueryWrapper rewrite), with a
    brute-force chain recount; empty expansions match nothing; unknown
    wrappers raise."""
    from itertools import product

    s = Searcher(pos_index)
    slots = [("prefix", "w00"), "the"]
    exp = s.expand_prefix("w00")
    assert exp                     # the corpus has w00xx tokens
    got = s.span_multi_near_docs(slots, slop=2, limit=10**6)
    assert got == s.intervals_ordered_docs(
        [tuple(exp), ("the",)], max_gaps=2, limit=10**6
    )
    want = []
    for d, toks in {d: tokenize(t) for d, t in oracle.texts.items()}.items():
        idx = [
            [i for i, t in enumerate(toks) if t.startswith("w00")],
            [i for i, t in enumerate(toks) if t == "the"],
        ]
        c = sum(
            1 for ch in product(*idx)
            if ch[1] > ch[0] and ch[1] - ch[0] - 1 <= 2
        )
        if c:
            want.append((d, c))
    assert got == sorted(want)
    # wildcard wrapper goes through expand_wildcard
    assert s.span_multi_near_docs([("wildcard", "w00?7"), "the"], 2,
                                  limit=10**6) == \
        s.intervals_ordered_docs(
            [tuple(s.expand_wildcard("w00?7")), ("the",)], 2, limit=10**6
        )
    # a slot expanding to nothing matches nothing
    assert s.span_multi_near_docs([("prefix", "zzzz"), "the"], 2) == []
    with pytest.raises(ValueError):
        s.span_multi_near_docs([("regexp", "w0+"), "the"], 1)
