"""Percolator (reverse search) conformance: vectorized batch matcher vs a
per-row brute force, spec validation, and the Ray Data actor-pool stage."""

import pyarrow as pa
import pytest

from rayfts.fixtures import generate_transcripts
from rayfts.oracle import tokenize
from rayfts.percolate import PercolateRunner, Percolator

QUERIES = {
    "q_and": {"query": "w0007 bash", "mode": "and"},
    "q_or": {"query": "grep sed awk"},
    "q_not": {"query": "the", "must_not": "w0007 bash"},
    "q_two": {"query": "the a to ok", "min_match": 2},
}


def _brute(texts, queries):
    out = []
    for row, text in enumerate(texts):
        toks = set(tokenize(text))
        for qid in sorted(queries):
            spec = queries[qid]
            qt = set(tokenize(spec["query"]))
            req = spec.get(
                "min_match",
                len(qt) if spec.get("mode") == "and" else 1,
            )
            if len(toks & qt) < req:
                continue
            if toks & set(tokenize(spec.get("must_not", ""))):
                continue
            out.append((row, qid))
    return out


@pytest.fixture(scope="module")
def texts():
    t = generate_transcripts(30, seed=42)
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t["text"].to_pylist()


def test_percolate_matches_bruteforce(texts):
    p = Percolator(QUERIES)
    got = p.percolate_table(pa.table({"text": pa.array(texts)}))
    rows = list(zip(got["row"].to_pylist(), got["query_id"].to_pylist()))
    assert rows == _brute(texts, QUERIES)
    # id_col passthrough
    ids = [f"d{i:04d}" for i in range(len(texts))]
    got2 = p.percolate_table(
        pa.table({"text": pa.array(texts), "k": pa.array(ids)}), id_col="k"
    )
    assert got2["k"].to_pylist() == [ids[r] for r, _ in rows]
    # empty batch
    empty = p.percolate_table(pa.table({"text": pa.array([], pa.string())}))
    assert empty.num_rows == 0


def test_percolate_phrase_queries(texts):
    """Phrase percolation: adjacency verified on the batch token stream,
    vs per-row brute force."""
    queries = {
        "p_hot": {"phrase": "the a"},
        "p_w": {"phrase": "the w0007"},
        "p_not": {"phrase": "same text across"},
        "p_absent": {"phrase": "zzzz absent phrase"},
        "p_banned": {"phrase": "the a", "must_not": "w0007"},
    }
    p = Percolator(queries)
    got = list(zip(
        *[c.to_pylist() for c in p.percolate_table(
            pa.table({"text": pa.array(texts)})
        ).columns]
    ))
    want = []
    for row, text in enumerate(texts):
        toks = tokenize(text)
        for qid in sorted(queries):
            slots = tokenize(queries[qid]["phrase"])
            n = len(slots)
            ok = any(
                toks[i:i + n] == slots
                for i in range(len(toks) - n + 1)
            )
            if ok and not (
                set(tokenize(queries[qid].get("must_not", ""))) & set(toks)
            ):
                want.append((row, qid))
    assert got == want
    assert any(q == "p_hot" for _, q in want)       # non-trivial probe
    assert all(q != "p_absent" for _, q in want)
    with pytest.raises(ValueError, match="exclusive"):
        Percolator({"q": {"phrase": "a b", "query": "c"}})


def test_percolate_stopword_semantics():
    """One analyzer everywhere: phrase stop slots keep position GAPS
    (enablePositionIncrements, like search_phrase) and a banned stopword
    bans nothing (it has no postings index-side either)."""
    p = Percolator({"q": {"phrase": "big red dog"}}, stopwords=("red",))
    t = p.percolate_table(pa.table({"text": pa.array(
        ["big red dog here", "big dog here", "big blue dog here"]
    )}))
    # the gap position must stay: any filler matches, adjacency does not
    assert t["row"].to_pylist() == [0, 2]
    p2 = Percolator(
        {"q": {"query": "bash", "must_not": "the"}}, stopwords=("the",)
    )
    t2 = p2.percolate_table(
        pa.table({"text": pa.array(["the bash prompt"])})
    )
    assert t2.num_rows == 1


def test_percolate_spec_validation():
    with pytest.raises(ValueError, match="at least one"):
        Percolator({})
    with pytest.raises(ValueError, match="no terms"):
        Percolator({"q": {"query": "   "}})
    with pytest.raises(ValueError, match="mode"):
        Percolator({"q": {"query": "a", "mode": "xor"}})
    with pytest.raises(ValueError, match="min_match"):
        Percolator({"q": {"query": "a b", "min_match": 3}})
    # stopwords filter the query side too (one analyzer everywhere)
    p = Percolator({"q": {"query": "the bash"}}, stopwords=("the",))
    t = p.percolate_table(pa.table({"text": pa.array(["the the the"])}))
    assert t.num_rows == 0


def test_percolate_ray_stage(texts, tmp_path):
    """The map_batches actor-pool stage equals the local matcher."""
    import pyarrow.parquet as pq
    import ray.data as rd

    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        path,
    )
    ds = rd.read_parquet(path).map_batches(
        PercolateRunner,
        fn_constructor_kwargs={"queries": QUERIES, "id_col": "doc_id"},
        batch_format="pyarrow",
        concurrency=2,
    )
    # ONE execution: two to_pandas() calls re-run the pipeline and Ray
    # Data does not guarantee block order across runs — zipping columns
    # from separate executions misaligns rows intermittently
    df = ds.to_pandas()
    got = sorted(zip(df["doc_id"].tolist(), df["query_id"].tolist()))
    assert got == _brute(texts, QUERIES)


def test_percolator_registry_scale_memory_bound():
    """SCALE.md claim made test: registry state is ∝ registered queries
    (term -> qid postings over QUERY terms), percolation holds NO
    per-corpus state — 100k registered queries build in bounded memory
    and a batch percolates against them correctly."""
    import tracemalloc

    n_q, vocab = 100_000, 50_000
    queries = {
        f"q{i:06d}": {"query": f"w{i % vocab:05d} w{(i * 7 + 1) % vocab:05d}",
                      "mode": "and"}
        for i in range(n_q)
    }
    tracemalloc.start()
    p = Percolator(queries)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # ~200k (term, qid) postings; generous ceiling that still catches a
    # per-corpus or quadratic blow-up by orders of magnitude
    assert peak < 400 * 1024 * 1024, peak
    assert len(p.term_qids) <= 2 * n_q
    assert sum(len(v) for v in p.term_qids.values()) == 2 * n_q

    # registry state does not grow with percolated corpus
    batch = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(
                [
                    "w00000 w00001 filler",   # matches q000000
                    "w00000 alone",           # AND fails
                    "nothing registered",
                ]
            ),
        }
    )
    before = (len(p.term_qids), sum(len(v) for v in p.term_qids.values()))
    out = p.percolate_table(batch, id_col="doc_id")
    # both q000000 and q050000 register {w00000, w00001} (i mod vocab)
    assert out["query_id"].to_pylist() == ["q000000", "q050000"]
    assert out["doc_id"].to_pylist() == [0, 0]
    after = (len(p.term_qids), sum(len(v) for v in p.term_qids.values()))
    assert before == after
