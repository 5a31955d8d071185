"""Analyzer unit tests — tokenizer word-break semantics pinned (FIXTURES.md §1)."""

import numpy as np
import pyarrow as pa

from rayfts.analysis import analyze_batch, partial_postings_batch, tokenize
from rayfts.oracle import tokenize as py_tokenize


def _toks(s: str) -> list[str]:
    lists = tokenize(pa.array([s]))
    return [t for t in lists[0].as_py() if t != ""]


def test_tokenizer_semantics():
    assert _toks("The quick  Brown fox") == ["the", "quick", "brown", "fox"]
    assert _toks("héllo, wörld! foo_bar") == ["héllo", "wörld", "foo_bar"]
    assert _toks("…") == []
    assert _toks("") == []
    assert _toks("a-b c.d") == ["a", "b", "c", "d"]
    assert _toks("X9 42") == ["x9", "42"]


def test_tokenizer_matches_python_oracle_on_fixture_text():
    from rayfts.fixtures import generate_transcripts

    t = generate_transcripts(10, seed=42)
    for s in t["text"].to_pylist():
        assert _toks(s) == py_tokenize(s), s[:80]


def test_analyze_batch_tf_and_dl():
    batch = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(["a b a", "…", "b B c"], pa.string()),
        }
    )
    tf, doc_lens = analyze_batch(batch)
    np.testing.assert_array_equal(doc_lens, [3, 0, 3])
    rows = list(
        zip(tf["term"].to_pylist(), tf["doc_id"].to_pylist(), tf["tf"].to_pylist())
    )
    assert rows == [("a", 10, 2), ("b", 10, 1), ("b", 12, 2), ("c", 12, 1)]


def test_partial_postings():
    batch = pa.table(
        {
            "doc_id": pa.array([5, 6], pa.int64()),
            "text": pa.array(["x y x", "y z"], pa.string()),
        }
    )
    partials, doc_lens = partial_postings_batch(batch)
    np.testing.assert_array_equal(doc_lens, [3, 2])
    d = {
        r["term"]: r
        for r in partials.to_pylist()
    }
    assert d["x"]["doc_ids"] == [5] and d["x"]["tfs"] == [2] and d["x"]["dls"] == [3]
    assert d["y"]["doc_ids"] == [5, 6] and d["y"]["tfs"] == [1, 1] and d["y"]["dls"] == [3, 2]
    assert d["z"]["doc_ids"] == [6] and d["z"]["df_partial"] == 1


def test_tokens_flat_matches_regex_path():
    """The ASCII fast-path tokenizer must agree exactly with the RE2 regex
    path — token values AND parent rows — including empty strings,
    punctuation-only rows, leading/trailing separators, underscores,
    digits, nulls, and sliced arrays; non-ASCII batches fall back."""
    import pyarrow as pa

    from rayfts.analysis import flatten_tokens, tokenize, tokens_flat

    texts = [
        "Hello, World! foo_bar BAZ-42",
        "",
        "!!! ... ---",
        "  leading and trailing  ",
        "a",
        "_",
        "tab\tnewline\nmixed  spaces",
        "UPPER lower 123abc abc123",
        None,
        "x" * 300 + " y",
    ]
    arr = pa.array(texts, pa.string())
    for candidate in (arr, arr.slice(1), arr.slice(2, 5)):
        filled = pa.compute.fill_null(candidate, "")
        exp_flat, exp_parent = flatten_tokens(tokenize(filled))
        got_flat, got_parent = tokens_flat(candidate)
        assert got_flat.to_pylist() == exp_flat.to_pylist()
        assert got_parent.tolist() == exp_parent.tolist()

    # non-ASCII falls back to the regex path wholesale — same output
    uni = pa.array(["héllo wörld", "plain ascii", "日本語 テスト x1"])
    exp_flat, exp_parent = flatten_tokens(tokenize(uni))
    got_flat, got_parent = tokens_flat(uni)
    assert got_flat.to_pylist() == exp_flat.to_pylist()
    assert got_parent.tolist() == exp_parent.tolist()


def test_tokens_flat_property(corpus_texts=None):
    """Randomized equivalence over ASCII strings drawn from a hostile
    alphabet (separators, digits, underscores)."""
    import numpy as np
    import pyarrow as pa

    from rayfts.analysis import flatten_tokens, tokenize, tokens_flat

    rng = np.random.default_rng(123)
    alphabet = list("ab Z_9.!-\t\n,")
    for trial in range(20):
        texts = [
            "".join(rng.choice(alphabet, size=rng.integers(0, 40)))
            for _ in range(50)
        ]
        arr = pa.array(texts, pa.string())
        exp_flat, exp_parent = flatten_tokens(tokenize(arr))
        got_flat, got_parent = tokens_flat(arr)
        assert got_flat.to_pylist() == exp_flat.to_pylist(), trial
        assert got_parent.tolist() == exp_parent.tolist(), trial
