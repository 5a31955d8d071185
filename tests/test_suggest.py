"""ES _suggest API analogs: term / phrase / completion suggesters.

Conformance vs a brute-force recompute from the oracle's term statistics
(term suggester scoring rule, StupidBackoff bigram LM), plus the sharded
(MultiSearcher) and shared-segment executors pinned bit-identical to the
single global index — the same equivalence contract every other query
feature carries.
"""

import math
import os

import pytest

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.fixtures import generate_transcripts, write_transcripts
from rayfts.oracle import BruteForceIndex, levenshtein, tokenize
from rayfts.search import MultiSearcher, Searcher, SharedIndexHandle, SharedSearcher

N_CONVS = 40
SEED = 42


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("sgcorpus")
    write_transcripts(str(d), n_convs=N_CONVS, seed=SEED)
    return str(d)


@pytest.fixture(scope="module")
def pos_index(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("sgindex")
    cfg = IndexJobConfig(index_dir=str(d), term_buckets=8, index_positions=True)
    build_index(corpus, cfg=cfg, rows_per_part=100)
    return str(d)


@pytest.fixture(scope="module")
def oracle():
    t = generate_transcripts(N_CONVS, seed=SEED)
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    docs = {i: s for i, s in enumerate(t["text"].to_pylist())}
    return BruteForceIndex(docs)


def _brute_term_suggest(idx, text, size=5, suggest_mode="missing",
                        max_edits=2, prefix_length=1, min_word_length=4,
                        accuracy=0.5):
    out = []
    for tok in tokenize(text):
        if len(tok) < min_word_length:
            continue
        df_tok = idx.df.get(tok, 0)
        if suggest_mode == "missing" and df_tok > 0:
            continue
        rows = []
        for term, df in idx.df.items():
            if prefix_length and not term.startswith(tok[:prefix_length]):
                continue
            d = levenshtein(tok, term)
            if not (1 <= d <= max_edits):
                continue
            score = 1.0 - d / max(len(tok), len(term))
            if score < accuracy:
                continue
            if suggest_mode == "popular" and df <= df_tok:
                continue
            rows.append((term, df, score))
        rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
        out.extend((tok, t, d, s) for t, d, s in rows[:size])
    return out


@pytest.mark.parametrize("mode", ["missing", "popular", "always"])
def test_suggest_term_matches_bruteforce(pos_index, oracle, mode):
    s = Searcher(pos_index)
    for text in ["bsah w0007", "greb the", "sme zzzz w0008x"]:
        got = s.suggest_term(text, suggest_mode=mode)
        want = _brute_term_suggest(oracle, text, suggest_mode=mode)
        assert [(a, b, c) for a, b, c, _ in got] == \
            [(a, b, c) for a, b, c, _ in want], (text, mode)
        for g, w in zip(got, want):
            assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_suggest_term_knobs(pos_index, oracle):
    s = Searcher(pos_index)
    # min_word_length gates short tokens entirely
    assert s.suggest_term("abc", min_word_length=4) == []
    # accuracy=1.0 excludes everything (dist >= 1 -> score < 1)
    assert s.suggest_term("bsah", accuracy=1.0) == []
    with pytest.raises(ValueError, match="suggest_mode"):
        s.suggest_term("bsah", suggest_mode="sometimes")
    # popular mode on a present term only returns more-frequent terms
    df_w8 = oracle.df["w0008"]
    for _, t, df, _ in s.suggest_term("w0008", suggest_mode="popular"):
        assert df > df_w8, t


def test_suggest_completion_matches_bruteforce(pos_index, oracle):
    s = Searcher(pos_index)
    for prefix in ["w00", "ba", "zzz_absent", ""]:
        want = sorted(
            ((t, d) for t, d in oracle.df.items() if t.startswith(prefix)),
            key=lambda r: (-r[1], r[0]),
        )[:7]
        assert s.suggest_completion(prefix, size=7) == want, prefix


def test_suggest_completion_fuzzy_matches_bruteforce(pos_index, oracle):
    """fuzzy completion: exact prefix_length anchor + levenshtein on
    the query-length head; exact matches (distance 0) always included;
    rank unchanged (df desc, term asc)."""
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    s = Searcher(pos_index)
    for prefix, fz, pl in [("w00", 1, 1), ("bq", 1, 1), ("wash", 2, 2),
                           ("zzz_absent", 1, 1)]:
        want = sorted(
            ((t, d) for t, d in oracle.df.items()
             if t.startswith(prefix[:pl])
             and lev(prefix, t[:len(prefix)]) <= fz),
            key=lambda r: (-r[1], r[0]),
        )[:7]
        got = s.suggest_completion_fuzzy(prefix, size=7, fuzziness=fz,
                                         prefix_length=pl)
        assert got == want, (prefix, fz, pl)
        # fuzzy set contains the exact-prefix completions
        exact = dict(s.suggest_completion(prefix, size=10_000))
        assert all(t in dict(s.suggest_completion_fuzzy(
            prefix, size=10_000, fuzziness=fz, prefix_length=pl
        )) for t in exact), prefix


def _brute_phrase_suggest(idx, text, size=3, max_errors=1,
                          candidates_per_slot=3, discount=0.4):
    """StupidBackoff recompute from raw tokenized docs."""
    toks = tokenize(text)
    total = float(idx.total_dl)
    cf = {}
    big = {}
    for d, t in idx.texts.items():
        dt = tokenize(t)
        for w in dt:
            cf[w] = cf.get(w, 0) + 1
        for a, b in zip(dt, dt[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1

    def uni(w):
        return (cf.get(w, 0) + 0.5) / (total + 1.0)

    slot_cands = []
    for tok in toks:
        cands = [tok]
        for _, t, _, _ in _brute_term_suggest(
            idx, tok, size=candidates_per_slot, suggest_mode="always"
        ):
            if t not in cands:
                cands.append(t)
        slot_cands.append(cands)
    phrases = []

    def gen(i, cur, errs):
        if i == len(toks):
            phrases.append(tuple(cur))
            return
        for c in slot_cands[i]:
            e = errs + (c != toks[i])
            if e <= max_errors:
                gen(i + 1, cur + [c], e)

    gen(0, [], 0)
    scored = []
    for ph in phrases:
        sc = math.log(uni(ph[0]))
        for a, b in zip(ph, ph[1:]):
            c = big.get((a, b), 0)
            sc += math.log(c / cf[a] if c > 0 else discount * uni(b))
        s = " ".join(ph)
        if s != " ".join(toks):
            scored.append((s, sc))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:size]


def test_suggest_phrase_matches_bruteforce(pos_index, oracle):
    s = Searcher(pos_index)
    for text, me in [("the bsah", 1), ("w0007 greb", 1), ("bsah greb", 2)]:
        got = s.suggest_phrase(text, max_errors=me)
        want = _brute_phrase_suggest(oracle, text, max_errors=me)
        assert [p for p, _ in got] == [p for p, _ in want], text
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-12)
    # a corrected phrase must outrank staying with the misspelling
    top = s.suggest_phrase("the bsah", max_errors=1)
    assert top and top[0][0] == "the bash"


def test_sharded_and_shared_suggest_equal_global(corpus, pos_index,
                                                 tmp_path_factory):
    import pyarrow.parquet as pq

    from rayfts.segments import build_segments, open_multisearcher

    root = tmp_path_factory.mktemp("sgsegs")
    files = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
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
        str(root / "idx"), cfg, rows_per_part=100,
    )
    single = Searcher(pos_index)
    executors = [
        open_multisearcher(str(root / "idx")),
        SharedSearcher(SharedIndexHandle(pos_index)),
    ]
    for ex in executors:
        name = type(ex).__name__
        for mode in ("missing", "always"):
            assert ex.suggest_term("bsah greb", suggest_mode=mode) == \
                single.suggest_term("bsah greb", suggest_mode=mode), (name, mode)
        assert ex.suggest_completion("w0", size=9) == \
            single.suggest_completion("w0", size=9), name
        for text, me in [("the bsah", 1), ("bsah greb", 2)]:
            assert ex.suggest_phrase(text, max_errors=me) == \
                single.suggest_phrase(text, max_errors=me), (name, text)


def test_suggest_completion_ctx_matches_bruteforce(pos_index):
    """context completion: weight = df within the keyword filter —
    recomputed from the raw table; empty context -> []; context that
    matches everything == the plain completion ranking."""
    t = generate_transcripts(N_CONVS, seed=SEED).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    texts = t["text"].to_pylist()
    roles = t["role"].to_pylist()
    s = Searcher(pos_index)
    for prefix in ["w00", "ba", "zzz_absent"]:
        for role in ["user", "assistant"]:
            df: dict = {}
            for i, txt in enumerate(texts):
                if roles[i] != role:
                    continue
                for tok in set(tokenize(txt)):
                    if tok.startswith(prefix):
                        df[tok] = df.get(tok, 0) + 1
            want = sorted(df.items(), key=lambda r: (-r[1], r[0]))[:7]
            got = s.suggest_completion_ctx(
                prefix, {"role": role}, size=7
            )
            assert got == want, (prefix, role)
    assert s.suggest_completion_ctx("w00", {"role": "no_such"}) == []


def test_sharded_suggest_completion_ctx_equal_global(corpus, pos_index,
                                                     tmp_path_factory):
    import pyarrow.parquet as pq

    from rayfts.segments import build_segments, open_multisearcher

    root = tmp_path_factory.mktemp("ctxsegs")
    files = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
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
        str(root / "idx"), cfg, rows_per_part=100,
    )
    single = Searcher(pos_index)
    multi = open_multisearcher(str(root / "idx"))
    for prefix in ["w0", "ba"]:
        assert multi.suggest_completion_ctx(
            prefix, {"role": "user"}, size=9
        ) == single.suggest_completion_ctx(
            prefix, {"role": "user"}, size=9
        ), prefix
