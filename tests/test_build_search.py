"""E2E conformance: build over the seeded corpus, verify against the oracle.

Analog of the reference's integration suite (PluginIntegrationITest exact-count
asserts; EntityDaoITest round-trip + order-preservation + missing-id tests).
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from rayfts.config import IndexJobConfig
from rayfts.build import build_index
from rayfts.fixtures import REFERENCE_QUERIES, generate_transcripts, write_transcripts
from rayfts.oracle import BruteForceIndex, tokenize
from rayfts.search import Searcher, run_queries

N_CONVS = 50
SEED = 42


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_transcripts(str(d), n_convs=N_CONVS, seed=SEED)
    return str(d)


@pytest.fixture(scope="module")
def index_dir(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("index")
    cfg = IndexJobConfig(index_dir=str(d), term_buckets=8)
    build_index(corpus, cfg=cfg, rows_per_part=100)
    return str(d)


@pytest.fixture(scope="module")
def oracle():
    t = generate_transcripts(N_CONVS, seed=SEED)
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    docs = {i: s for i, s in enumerate(t["text"].to_pylist())}
    return BruteForceIndex(docs), t


def test_corpus_stats_match_oracle(index_dir, oracle):
    idx, _ = oracle
    s = Searcher(index_dir)
    assert s.N == idx.N
    assert s.manifest["total_dl"] == idx.total_dl
    assert abs(s.avgdl - idx.avgdl) < 1e-9
    # df for probe terms (analog of the exact 777/57 count asserts)
    for term in ["the", "a", "w0007", "bash", "héllo", "foo_bar", "longturn", "zzzz_absent"]:
        p = s.lookup(term)
        assert (p.df if p else 0) == idx.df.get(term, 0), term


def test_docstore_roundtrip_text_equality(index_dir, oracle):
    """Per-turn text equality under stable (conv_id, turn_idx) order —
    the per-row invariant from BASELINE.json input_hint."""
    import pyarrow.parquet as pq

    _, expected = oracle
    got = pq.read_table(os.path.join(index_dir, "docstore")).sort_by(
        [("doc_id", "ascending")]
    )
    assert got.num_rows == expected.num_rows
    assert got["doc_id"].to_pylist() == list(range(expected.num_rows))
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        assert got[col].to_pylist() == expected[col].to_pylist(), col


@pytest.mark.parametrize("k", [1, 10, 100])
@pytest.mark.parametrize("algo", ["taat", "wand"])
def test_reference_queries_rank_identical(index_dir, oracle, algo, k):
    idx, _ = oracle
    s = Searcher(index_dir)
    for q in REFERENCE_QUERIES:
        expected = idx.search(q, k=k)
        got = s.search(q, k=k, algo=algo)
        assert [d for d, _ in got] == [d for d, _ in expected], (q, algo, k)
        for (d1, s1), (d2, s2) in zip(got, expected):
            assert abs(s1 - s2) < 1e-9, (q, d1, s1, s2)


def test_wand_equals_taat_exactly(index_dir):
    s = Searcher(index_dir)
    for q in REFERENCE_QUERIES + ["w0000 w0001 w0002 the a to ok bash"]:
        assert s.search(q, k=25, algo="wand") == s.search(q, k=25, algo="taat"), q


def test_case_variant_query(index_dir):
    s = Searcher(index_dir)
    assert s.search("The", k=10) == s.search("the", k=10)


def test_absent_term_empty(index_dir):
    assert Searcher(index_dir).search("zzzz_absent", k=10) == []


def test_equal_scores_tiebreak_doc_id(index_dir, oracle):
    """Two identical texts in different convs -> equal scores, doc_id asc."""
    idx, expected = oracle
    s = Searcher(index_dir)
    hits = s.search("same text across convs", k=10)
    assert len(hits) >= 2
    assert hits[0][0] < hits[1][0]
    assert abs(hits[0][1] - hits[1][1]) < 1e-12


def test_get_order_preserving_and_missing_raises(index_dir, oracle):
    _, expected = oracle
    s = Searcher(index_dir)
    keys = [
        (expected["conv_id"][5].as_py(), expected["turn_idx"][5].as_py()),
        (expected["conv_id"][0].as_py(), expected["turn_idx"][0].as_py()),
        (expected["conv_id"][9].as_py(), expected["turn_idx"][9].as_py()),
    ]
    got = s.get(keys)
    assert list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist())) == [
        (k[0], k[1]) for k in keys
    ]
    with pytest.raises(KeyError):
        s.get([("conv-99999", 0)])
    got2 = s.get_by_doc_id([7, 3, 7])
    assert got2["doc_id"].to_pylist() == [7, 3, 7]
    with pytest.raises(KeyError):
        s.get_by_doc_id([10**9])


def test_get_reads_only_owning_partitions(index_dir, oracle, monkeypatch):
    """Point-get scale contract (mirror of the IVF probe-pruning test):
    get(keys) opens exactly the docstore partitions whose manifest key
    range owns the requested conv_ids — never the whole docstore."""
    _, expected = oracle
    s = Searcher(index_dir)
    parts = s.manifest["docstore"]["partitions"]
    assert len(parts) > 3 and "min_key" in parts[0]

    opened = []
    import rayfts.search as S

    real = S.pq.read_table

    def spy(path, *a, **kw):
        opened.append(os.path.basename(str(path)))
        return real(path, *a, **kw)

    monkeypatch.setattr(S.pq, "read_table", spy)
    # one key from the FIRST partition, one from the LAST
    first_key = (expected["conv_id"][0].as_py(),
                 expected["turn_idx"][0].as_py())
    n = expected.num_rows
    last_key = (expected["conv_id"][n - 1].as_py(),
                expected["turn_idx"][n - 1].as_py())
    got = s.get([last_key, first_key])
    assert got.num_rows == 2
    owning = {
        os.path.basename(p["file"])
        for p in parts
        if p["min_key"][0] <= first_key[0] <= p["max_key"][0]
        or p["min_key"][0] <= last_key[0] <= p["max_key"][0]
    }
    assert set(opened) == owning and len(opened) < len(parts)


def test_count_with_keyword_filters(index_dir, oracle):
    _, expected = oracle
    s = Searcher(index_dir)
    roles = expected["role"].to_pylist()
    assert s.count() == len(roles)
    assert s.count(role="tool") == sum(1 for r in roles if r == "tool")
    assert s.count(role="user", tool=None) >= 0  # null filter path doesn't crash


def test_distributed_query_runner(index_dir, oracle):
    idx, _ = oracle
    out = (
        run_queries(index_dir, REFERENCE_QUERIES, k=5, concurrency=(1, 2))
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    for qid, q in enumerate(REFERENCE_QUERIES):
        expected = idx.search(q, k=5)
        sub = out[out.query_id == qid]
        assert list(sub.doc_id) == [d for d, _ in expected], q
        np.testing.assert_allclose(
            list(sub.score), [sc for _, sc in expected], rtol=0, atol=1e-9
        )


def test_dedup_keys_upsert_semantics(tmp_path):
    """Duplicate (conv_id, turn_idx) keys collapse to the max-ts row
    (ES index-by-_id upsert analog, dao/EntityDao.java:96,114)."""
    import pyarrow.parquet as pq2
    import ray.data as rd

    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig

    t = generate_transcripts(6, seed=42)
    dup = t.slice(2, 1).to_pylist()[0]
    dup["text"] = "updated text wins"
    dup["ts"] = dup["ts"].replace(year=2027)
    full = pa.concat_tables([t, pa.Table.from_pylist([dup], schema=t.schema)])

    d = str(tmp_path / "idx")
    m = build_index(
        rd.from_arrow(full),
        cfg=IndexJobConfig(index_dir=d, term_buckets=4, dedup_keys=True),
    )
    assert m["n_docs"] == t.num_rows  # duplicate collapsed
    store = pq2.read_table(os.path.join(d, "docstore"))
    key = (dup["conv_id"], dup["turn_idx"])
    row = store.filter(
        pa.compute.and_(
            pa.compute.equal(store["conv_id"], key[0]),
            pa.compute.equal(store["turn_idx"], key[1]),
        )
    )
    assert row.num_rows == 1
    assert row["text"][0].as_py() == "updated text wins"


def test_shared_searcher_identical(index_dir):
    """SharedSearcher (object-store decoded segment) must match the
    file-based Searcher exactly, including through the query pipeline."""
    from rayfts.search import SharedIndexHandle, SharedSearcher

    handle = SharedIndexHandle(index_dir)
    shared = SharedSearcher(handle)
    plain = Searcher(index_dir)
    for q in REFERENCE_QUERIES + ["the a w0003", "zzzz_absent"]:
        assert shared.search(q, k=25) == plain.search(q, k=25), q
        # WAND runs on the shared zero-copy segment too (tf_part/block_ub
        # are all the skipping executor needs) — bit-identical across all
        # four (searcher x executor) combinations
        assert shared.search(q, k=25, algo="wand") == plain.search(q, k=25), q
        assert shared.search(q, k=25, algo="wand") == plain.search(
            q, k=25, algo="wand"
        ), q
    # grouped-scoring features ride the shared segment too (the shared
    # _dense_scores path over zero-copy postings)
    q = "the w0007 bash"
    assert shared.search_collapse(q, "role", k=10) == \
        plain.search_collapse(q, "role", k=10)
    assert shared.has_child_search(q, "conv_id", k=5, inner_hits=2) == \
        plain.has_child_search(q, "conv_id", k=5, inner_hits=2)
    assert shared.facet_top_hits(q, "role", size=3, top_n=2) == \
        plain.facet_top_hits(q, "role", size=3, top_n=2)
    assert shared.composite_agg(q, "role", size=2) == \
        plain.composite_agg(q, "role", size=2)
    assert shared.significant_terms(q, size=5) == \
        plain.significant_terms(q, size=5)
    assert shared.query_string('+w0007 bash -sed') == \
        plain.query_string('+w0007 bash -sed')
    out = (
        run_queries(index_dir, list(REFERENCE_QUERIES), k=5, concurrency=(1, 2),
                    shared_handle=handle)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    base = (
        run_queries(index_dir, list(REFERENCE_QUERIES), k=5, concurrency=(1, 2))
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    assert out.doc_id.tolist() == base.doc_id.tolist()
    assert out.score.tolist() == base.score.tolist()


def test_golden_exact_counts(index_dir):
    """Frozen literal expectations for the seed=42 sf-small corpus — the
    analog of the reference's exact '777 nodes, 57 ways' asserts
    (integration/PluginIntegrationITest.java:44-45). These numbers were
    computed once by the brute-force oracle and frozen; any engine change
    that shifts them is a correctness regression, not a tune."""
    s = Searcher(index_dir)
    assert s.N == 356
    assert s.manifest["total_dl"] == 19450
    assert s.manifest["n_terms"] == 1678
    golden_df = {
        "the": 181, "a": 204, "to": 208, "ok": 193,
        "bash": 205, "read": 202, "write": 183, "grep": 187, "edit": 207,
        "w0007": 99, "héllo": 1, "foo_bar": 1, "longturn": 1,
    }
    for term, df in golden_df.items():
        assert s.lookup(term).df == df, term
    top3 = [(d, round(sc, 6)) for d, sc in s.search("w0007 bash", k=3)]
    assert top3 == [(218, 2.951148), (228, 2.905533), (243, 2.877895)]


def test_sorted_input_fastpath_equals_sort(tmp_path):
    """The verified sorted-input fast path must produce the identical index
    as the sort path, and must FALL BACK when files overlap or are
    unsorted."""
    import pyarrow.parquet as pq2

    from rayfts.build import _sorted_input_fastpath, build_index

    t = generate_transcripts(30, seed=42).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    corpus = tmp_path / "sorted_corpus"
    corpus.mkdir()
    half = t.num_rows // 2
    pq2.write_table(t.slice(0, half), str(corpus / "part-0.parquet"))
    pq2.write_table(t.slice(half), str(corpus / "part-1.parquet"))

    d_fast = str(tmp_path / "idx_fast")
    d_sort = str(tmp_path / "idx_sort")
    m_fast = build_index(
        str(corpus), cfg=IndexJobConfig(index_dir=d_fast, term_buckets=4)
    )
    m_sort = build_index(
        str(corpus),
        cfg=IndexJobConfig(
            index_dir=d_sort, term_buckets=4, detect_sorted_input=False
        ),
    )
    assert m_fast["n_docs"] == m_sort["n_docs"]
    assert m_fast["avgdl"] == m_sort["avgdl"]

    a = pq2.read_table(os.path.join(d_fast, "docstore")).sort_by(
        [("doc_id", "ascending")]
    )
    b = pq2.read_table(os.path.join(d_sort, "docstore")).sort_by(
        [("doc_id", "ascending")]
    )
    assert a["conv_id"].to_pylist() == b["conv_id"].to_pylist()
    assert a["text"].to_pylist() == b["text"].to_pylist()
    for q in REFERENCE_QUERIES:
        assert Searcher(d_fast).search(q, k=10) == Searcher(d_sort).search(q, k=10)

    # unsorted file -> no fast path
    shuf = tmp_path / "shuffled"
    shuf.mkdir()
    import numpy as np2

    perm = np2.random.default_rng(0).permutation(t.num_rows)
    pq2.write_table(t.take(pa.array(perm)), str(shuf / "part-0.parquet"))
    assert (
        _sorted_input_fastpath(
            [str(shuf / "part-0.parquet")], ("conv_id", "turn_idx")
        )
        is None
    )
    # overlapping ranges -> no fast path
    overl = tmp_path / "overlap"
    overl.mkdir()
    pq2.write_table(t, str(overl / "part-0.parquet"))
    pq2.write_table(t, str(overl / "part-1.parquet"))
    assert (
        _sorted_input_fastpath(
            [str(overl / f"part-{i}.parquet") for i in (0, 1)],
            ("conv_id", "turn_idx"),
        )
        is None
    )


def test_tombstone_exclusion(tmp_path_factory, corpus):
    """Per-doc delete analog (ref dao/EntityDao.java:269-280,
    IndexAdminService.java:72-78): an excluded doc never appears in top-k
    (taat, wand, shared), multiget raises for it, count() skips it, and
    clearing restores everything — postings files untouched."""
    from rayfts.admin import clear_exclusions, exclude_docs
    from rayfts.search import SharedIndexHandle, SharedSearcher

    d = str(tmp_path_factory.mktemp("index_tomb"))
    build_index(corpus, cfg=IndexJobConfig(index_dir=d, term_buckets=4))
    s0 = Searcher(d)
    q = "the w0007"
    base = s0.search(q, k=10)
    assert base
    victim = base[0][0]

    exclude_docs(d, [victim])
    s1 = Searcher(d)  # tombstones are searcher-construction state (refresh)
    for algo in ("taat", "wand"):
        hits = s1.search(q, k=10, algo=algo)
        assert victim not in [doc for doc, _ in hits], algo
    shared = SharedSearcher(SharedIndexHandle(d))
    assert victim not in [doc for doc, _ in shared.search(q, k=10)]
    assert victim not in [doc for doc, _ in shared.search(q, k=10, algo="wand")]
    # the survivors keep their exact scores (no stats rewrite — Lucene
    # deleted-docs semantics: stats reflect the segment, not the deletes)
    kept = [h for h in base if h[0] != victim]
    assert s1.search(q, k=len(kept))[: len(kept)] == kept[: len(kept)]

    with pytest.raises(KeyError, match="excluded"):
        s1.get_by_doc_id([victim])
    with pytest.raises(KeyError, match="deleted"):
        s1.termvectors(victim)  # deleted content must not resurface
    assert s1.count() == s0.count() - 1

    clear_exclusions(d)
    s2 = Searcher(d)
    assert s2.search(q, k=10) == base
    assert s2.count() == s0.count()


def test_tag_map_column(tmp_path):
    """F7 dynamic tags: (role, tool) packed into a map<string,string>
    column, carried through the docstore parquet; null tool is OMITTED
    from that row's map (dynamic-map semantics), and map_lookup reads the
    values back vectorized."""
    import pyarrow.parquet as pq2
    import ray.data as rd

    from rayfts.build import tags_lookup

    t = generate_transcripts(8, seed=42)
    d = str(tmp_path / "idx")
    build_index(
        rd.from_arrow(t),
        cfg=IndexJobConfig(
            index_dir=d, term_buckets=4, tag_map_cols=("role", "tool")
        ),
    )
    store = pq2.read_table(os.path.join(d, "docstore")).sort_by(
        [("doc_id", "ascending")]
    )
    assert "tags" in store.column_names
    roles = store["role"].to_pylist()
    tools = store["tool"].to_pylist()
    tags = store["tags"].to_pylist()
    for i, entries in enumerate(tags):
        m = dict(entries)
        assert m["role"] == roles[i]
        if tools[i] is None:
            assert "tool" not in m  # nulls omitted, not stored as null
        else:
            assert m["tool"] == tools[i]
    looked = tags_lookup(store["tags"], "role").to_pylist()
    assert looked == roles


def test_exchange_codecs_build_identical_indexes(corpus, tmp_path_factory):
    """The u16 (fixed-width) and varint exchange codecs must produce
    byte-identical postings files — the codec only changes what crosses
    the shuffle, never the published index."""
    import hashlib as _h

    import pyarrow.parquet as pq2

    dirs = {}
    for codec in ("u16", "varint"):
        d = str(tmp_path_factory.mktemp(f"index_{codec}"))
        build_index(
            corpus,
            cfg=IndexJobConfig(index_dir=d, term_buckets=4, exchange_codec=codec),
            rows_per_part=100,
        )
        dirs[codec] = d

    def bucket_hashes(d):
        out = {}
        for f in sorted(os.listdir(os.path.join(d, "postings"))):
            t = pq2.read_table(os.path.join(d, "postings", f))
            h = _h.md5()
            for c in t.column_names:
                for v in t[c].to_pylist():
                    h.update(repr(v).encode())
            out[f] = h.hexdigest()
        return out

    assert bucket_hashes(dirs["u16"]) == bucket_hashes(dirs["varint"])
    q = "the w0007 bash"
    assert Searcher(dirs["u16"]).search(q, k=10) == Searcher(dirs["varint"]).search(q, k=10)


def test_empty_corpus_builds_and_searches(tmp_path):
    """Degenerate input: zero rows must publish a valid (empty) index —
    searches return [], count is 0, no crash anywhere in the pipeline."""
    import ray.data as rd

    from rayfts.fixtures import TRANSCRIPT_SCHEMA

    empty = pa.Table.from_pylist([], schema=TRANSCRIPT_SCHEMA)
    d = str(tmp_path / "idx")
    m = build_index(
        rd.from_arrow(empty), cfg=IndexJobConfig(index_dir=d, term_buckets=4)
    )
    assert m["n_docs"] == 0 and m["n_terms"] == 0 and m["avgdl"] == 0.0
    s = Searcher(d)
    assert s.search("anything", k=5) == []
    assert s.count() == 0


def test_hierarchical_combine_identical_index(corpus, tmp_path_factory):
    """merge_fanin=2 inserts tree-combine levels into the bucket exchange;
    the published index must be identical to the flat gather."""
    import hashlib as _h

    import pyarrow.parquet as pq2

    dirs = {}
    for fanin in (0, 2):
        d = str(tmp_path_factory.mktemp(f"index_fanin{fanin}"))
        build_index(
            corpus,
            cfg=IndexJobConfig(index_dir=d, term_buckets=4, merge_fanin=fanin),
            rows_per_part=100,  # many partitions -> several combine levels
        )
        dirs[fanin] = d

    def bucket_hashes(d):
        out = {}
        for f in sorted(os.listdir(os.path.join(d, "postings"))):
            t = pq2.read_table(os.path.join(d, "postings", f))
            h = _h.md5()
            for c in t.column_names:
                for v in t[c].to_pylist():
                    h.update(repr(v).encode())
            out[f] = h.hexdigest()
        return out

    assert bucket_hashes(dirs[0]) == bucket_hashes(dirs[2])
    assert Searcher(dirs[0]).search("the w0007", k=10) == Searcher(
        dirs[2]
    ).search("the w0007", k=10)


def test_maxscore_prune_bit_identical(index_dir):
    """The MaxScore candidate-only path must return EXACTLY what the full
    TAAT scatter returns (it falls back whenever its bound cannot prove
    pruning) — across hot+cold mixes, all-hot, all-cold, absent terms, and
    k larger than the candidate sets."""
    s_fast = Searcher(index_dir)
    s_full = Searcher(index_dir)
    s_full._search_maxscore = (
        lambda plist, k, mask=None, after=None: None  # force full path
    )
    queries = [
        "the w0007",          # hot + cold
        "the a",              # hot + hot
        "w0007 w0008",        # cold + cold
        "the w0007 bash ok",  # mixed
        "zzzz_absent the",    # absent + hot
        "same text across convs",
    ] + list(REFERENCE_QUERIES)
    for q in queries:
        for k in (1, 5, 25, 200):
            assert s_fast.search(q, k=k) == s_full.search(q, k=k), (q, k)


def test_hot_term_salting_byte_identical(corpus, tmp_path_factory):
    """SURVEY §4 skew row: a forced-hot term merged via parallel docID salt
    ranges + concat_postings stitch must produce bucket FILES byte-identical
    to the unsalted build (round-2 verdict item 1's done-criterion)."""
    base = str(tmp_path_factory.mktemp("unsalted"))
    salted = str(tmp_path_factory.mktemp("salted"))
    cfg = IndexJobConfig(index_dir=base, term_buckets=8)
    build_index(corpus, cfg=cfg, rows_per_part=100)
    # "the" is the Zipf head of the fixture corpus; also salt a mid-df term,
    # a term colliding into the same bucket set, and an ABSENT term
    build_index(
        corpus,
        cfg=cfg.replace(
            index_dir=salted,
            salt_hot_terms=("the", "to", "w0007", "zz-absent-term"),
            hot_term_salts=3,
        ),
        rows_per_part=100,
    )
    for f in sorted(os.listdir(os.path.join(base, "postings"))):
        with open(os.path.join(base, "postings", f), "rb") as fh:
            b1 = fh.read()
        with open(os.path.join(salted, "postings", f), "rb") as fh:
            b2 = fh.read()
        assert b1 == b2, f"bucket file {f} differs under salting"
    q = "the w0007 bash"
    assert Searcher(base).search(q, k=10) == Searcher(salted).search(q, k=10)


def test_hot_term_autodetection_salts_zipf_head(corpus, tmp_path_factory):
    """salt_df_threshold > 0 runs the sample pre-pass; the detected set must
    contain the corpus's Zipf head and the index must stay byte-identical."""
    base = str(tmp_path_factory.mktemp("unsalted2"))
    auto = str(tmp_path_factory.mktemp("auto"))
    cfg = IndexJobConfig(index_dir=base, term_buckets=4)
    build_index(corpus, cfg=cfg, rows_per_part=100)
    m = build_index(
        corpus,
        cfg=cfg.replace(
            index_dir=auto, salt_df_threshold=50, hot_term_salts=2,
            hot_sample_rows=200,
        ),
        rows_per_part=100,
    )
    hot = m["metrics"]["hot_terms_salted"]
    assert "the" in hot, hot
    for f in sorted(os.listdir(os.path.join(base, "postings"))):
        with open(os.path.join(base, "postings", f), "rb") as fh:
            b1 = fh.read()
        with open(os.path.join(auto, "postings", f), "rb") as fh:
            b2 = fh.read()
        assert b1 == b2, f"bucket file {f} differs under auto-salting"


def test_tombstone_block_skipping_and_single_term(tmp_path_factory, corpus):
    """Round-2 verdict item 6: (a) REGRESSION — a single-term query must not
    leak a tombstoned doc through the few-blocks early path; (b) a large
    exclusion set covering whole blocks tightens block bounds to 0 so the
    pruned executor touches FEWER blocks, with results identical to
    filtering the unexcluded ranking."""
    from rayfts.admin import exclude_docs
    from rayfts.search import SharedIndexHandle, SharedSearcher

    big = str(tmp_path_factory.mktemp("corpus_tomb2"))
    write_transcripts(big, n_convs=600, seed=7)  # "the" df >> 8 blocks
    d = str(tmp_path_factory.mktemp("index_tomb2"))
    build_index(big, cfg=IndexJobConfig(index_dir=d, term_buckets=4))
    s0 = Searcher(d)

    # (a) single-term leak regression (df small -> nblocks <= 4 early path)
    victim = s0.search("w0007", k=1)[0][0]
    exclude_docs(d, [victim])
    s1 = Searcher(d)
    assert victim not in [doc for doc, _ in s1.search("w0007", k=10)]

    # (b) exclude every doc of blocks 2..5 of the hottest term
    p = s0.lookup("the")
    assert p.block_ub.size > 8, "fixture corpus should give 'the' many blocks"
    kill = p.doc_ids[2 * 128 : 6 * 128].tolist()
    exclude_docs(d, kill)  # appends to the previous exclusion
    s2 = Searcher(d)
    full = s0.search("the", k=s0.N)
    gone = set(kill) | {victim}
    expect = [h for h in full if h[0] not in gone][:10]
    for algo in ("taat", "wand"):
        assert s2.search("the", k=10, algo=algo) == expect, algo
    shared = SharedSearcher(SharedIndexHandle(d))
    assert shared.search("the", k=10) == expect
    assert shared.search("the", k=10, algo="wand") == expect
    # fewer blocks touched: 4 whole blocks carry ub 0 and are never sliced
    s0._blocks_scored = 0
    s0.search("the", k=10)
    base_blocks = s0._blocks_scored
    s2._blocks_scored = 0
    s2.search("the", k=10)
    assert s2._blocks_scored <= base_blocks - 4


def test_filtered_search_all_executors(index_dir, oracle):
    """Filtered BM25 (ref analog: ES filtered search, ESNodeITest.java
    filter tests with the geo payload swapped for keyword columns): hits
    restrict to the keyword filter, scores keep GLOBAL stats — equal to
    filtering the unfiltered ranking. All executors + shared agree."""
    import pyarrow.parquet as pq2

    from rayfts.search import SharedIndexHandle, SharedSearcher

    s = Searcher(index_dir)
    store = pq2.read_table(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "role"]
    ).sort_by([("doc_id", "ascending")])
    roles = store["role"].to_pylist()
    shared = SharedSearcher(SharedIndexHandle(index_dir))
    for q in ["the w0007 bash", "the a", "w0007"]:
        full = s.search(q, k=s.N)
        for role in ("user", "tool"):
            expect = [h for h in full if roles[h[0]] == role][:10]
            got = s.search(q, k=10, where={"role": role})
            assert got == expect, (q, role)
            assert s.search(q, k=10, algo="wand", where={"role": role}) == expect
            assert shared.search(q, k=10, where={"role": role}) == expect
    # filters compose (role AND tool), and a no-match filter returns []
    tools = pq2.read_table(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "tool"]
    ).sort_by([("doc_id", "ascending")])["tool"].to_pylist()
    full = s.search("the", k=s.N)
    expect2 = [
        h for h in full if roles[h[0]] == "tool" and tools[h[0]] == "bash"
    ][:5]
    assert s.search("the", k=5, where={"role": "tool", "tool": "bash"}) == expect2
    assert s.search("the", k=5, where={"role": "no-such-role"}) == []


def test_range_filter_search_and_count(index_dir):
    """ES range-query analog (the numeric/date range filters the
    reference's mappings enable, plugin.properties:10-11): where values of
    the form {"gte": lo, "lt": hi} restrict hits by column range with
    GLOBAL scoring stats, boundary ops are exact, ranges compose with
    keyword equality, and count() agrees. All executors + shared agree."""
    import pyarrow.parquet as pq2

    from rayfts.search import SharedIndexHandle, SharedSearcher

    s = Searcher(index_dir)
    store = pq2.read_table(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "ts", "role"]
    ).sort_by([("doc_id", "ascending")])
    ts = store["ts"].to_pylist()
    roles = store["role"].to_pylist()
    srt = sorted(ts)
    lo, hi = srt[len(srt) // 4], srt[3 * len(srt) // 4]
    rng = {"ts": {"gte": lo, "lt": hi}}
    full = s.search("the", k=s.N)
    expect = [h for h in full if lo <= ts[h[0]] < hi][:10]
    assert expect, "fixture ts quartiles should keep some hits"
    assert s.search("the", k=10, where=rng) == expect
    assert s.search("the", k=10, algo="wand", where=rng) == expect
    shared = SharedSearcher(SharedIndexHandle(index_dir))
    assert shared.search("the", k=10, where=rng) == expect
    # count() with ranges; boundary ops differ exactly at the bounds
    assert s.count(ts={"gte": lo, "lt": hi}) == sum(
        1 for t in ts if lo <= t < hi
    )
    assert s.count(ts={"gt": lo, "lte": hi}) == sum(
        1 for t in ts if lo < t <= hi
    )
    # composes with keyword equality in one where spec
    got = s.search("the", k=10, where={"ts": {"gte": lo, "lt": hi},
                                       "role": "user"})
    expect2 = [
        h for h in full if lo <= ts[h[0]] < hi and roles[h[0]] == "user"
    ][:10]
    assert got == expect2
    # unknown range op is rejected loudly, not silently ignored
    with pytest.raises(ValueError):
        s.filter_mask(ts={"between": (lo, hi)})


def test_facet_counts_match_bruteforce(index_dir):
    """ES terms-aggregation analog: value -> doc-count buckets over ALL
    query hits (not the top-k page), ordered (count desc, value asc),
    nulls form no bucket; composes with where/must_not; file and shared
    executors agree."""
    from collections import Counter as C

    import pyarrow.parquet as pq2

    from rayfts.search import SharedIndexHandle, SharedSearcher

    s = Searcher(index_dir)
    store = pq2.read_table(
        os.path.join(index_dir, "docstore"),
        columns=["doc_id", "role", "tool"],
    ).sort_by([("doc_id", "ascending")])
    roles = store["role"].to_pylist()
    tools = store["tool"].to_pylist()
    shared = SharedSearcher(SharedIndexHandle(index_dir))

    def brute(q, col, size=10, pred=None):
        hits = [d for d, _ in s.search(q, k=s.N)]
        vals = [
            col[d] for d in hits
            if col[d] is not None and (pred is None or pred(d))
        ]
        ranked = sorted(C(vals).items(), key=lambda e: (-e[1], e[0]))
        return ranked[:size]

    for q in ["the w0007 bash", "the a", "w0007", "zzz_absent"]:
        want = brute(q, roles)
        assert s.facet_counts(q, "role") == want, q
        assert shared.facet_counts(q, "role") == want, q
        # null tool values form no bucket
        want_t = brute(q, tools)
        assert s.facet_counts(q, "tool") == want_t, q
    # size truncation keeps the biggest buckets
    full = s.facet_counts("the", "tool", size=100)
    assert s.facet_counts("the", "tool", size=2) == full[:2]
    # composes with where (counts only filtered hits)
    want = brute("the", tools, pred=lambda d: roles[d] == "tool")
    assert s.facet_counts("the", "tool", where={"role": "tool"}) == want
    # composes with must_not
    p = s.lookup("bash")
    dead = set(p.doc_ids.tolist())
    want = brute("the", roles, pred=lambda d: d not in dead)
    assert s.facet_counts("the", "role", must_not="bash") == want


# ----------------------------------------------------------------------
# pagination: ES from/size offset + search_after cursor
# (ref analog: scroll/pagination over the indexed OSM entities —
#  the reference pages via ES search APIs; here both page modes are
#  first-class on every executor)
# ----------------------------------------------------------------------

PAGE_QUERIES = REFERENCE_QUERIES + ["same text across convs"]  # incl. ties


@pytest.mark.parametrize("algo", ["taat", "wand"])
def test_pagination_offset_matches_slice(index_dir, algo):
    s = Searcher(index_dir)
    for q in PAGE_QUERIES:
        full = s.search(q, k=10**6, algo=algo)
        for off in (0, 1, 5, 17, 39, len(full), len(full) + 9):
            page = s.search(q, k=10, algo=algo, offset=off)
            assert page == full[off:off + 10], (q, algo, off)


@pytest.mark.parametrize("algo", ["taat", "wand"])
def test_search_after_walks_entire_ranking(index_dir, algo):
    """Cursor pages of size 7 must reconstruct the ENTIRE ranking exactly —
    covers score ties (equal-score docs split across a page boundary must
    resume on doc_id) because the fixture corpus contains identical texts."""
    s = Searcher(index_dir)
    for q in PAGE_QUERIES:
        full = s.search(q, k=10**6, algo=algo)
        walked, cursor = [], None
        while True:
            page = s.search(q, k=7, algo=algo, search_after=cursor)
            if not page:
                break
            walked.extend(page)
            cursor = page[-1]
            assert len(walked) <= len(full), (q, "cursor loop")
        assert walked == full, (q, algo)


def test_search_after_equals_offset_pages(index_dir):
    s = Searcher(index_dir)
    for q in PAGE_QUERIES:
        p1 = s.search(q, k=10)
        if not p1:
            continue
        assert s.search(q, k=10, search_after=p1[-1]) == \
            s.search(q, k=10, offset=10), q


def test_pagination_composes_with_filters(index_dir):
    s = Searcher(index_dir)
    where = {"role": "assistant"}
    full = s.search("the a to", k=10**6, where=where)
    page2 = s.search("the a to", k=10, where=where, offset=10)
    assert page2 == full[10:20]
    after = s.search("the a to", k=10, where=where, search_after=full[9])
    assert after == full[10:20]


def test_pagination_mutual_exclusion(index_dir):
    s = Searcher(index_dir)
    with pytest.raises(ValueError):
        s.search("the", k=10, offset=5, search_after=(1.0, 3))


def test_search_after_exhausted_returns_empty(index_dir):
    s = Searcher(index_dir)
    full = s.search("w0007", k=10**6)
    assert s.search("w0007", k=10, search_after=full[-1]) == []
    assert s.search("w0007", k=10, search_after=full[-1], algo="wand") == []


def test_shared_searcher_pagination_identical(index_dir):
    from rayfts.search import SharedIndexHandle, SharedSearcher

    s = Searcher(index_dir)
    sh = SharedSearcher(SharedIndexHandle(index_dir))
    for q in PAGE_QUERIES:
        p1 = s.search(q, k=5)
        if not p1:
            continue
        cursor = p1[-1]
        for kw in ({"offset": 10}, {"search_after": cursor}):
            assert sh.search(q, k=10, **kw) == s.search(q, k=10, **kw), (q, kw)


def test_search_by_field_matches_bruteforce(index_dir, oracle):
    """ES sort-by-field: numeric asc/desc, keyword (string) lexicographic,
    missing-field hits last in doc_id order, doc_id asc tie-break."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx", "tool"])
    tix = dict(zip(t["doc_id"].to_pylist(), t["turn_idx"].to_pylist()))
    tool = dict(zip(t["doc_id"].to_pylist(), t["tool"].to_pylist()))
    q = "the w0007"
    hits = sorted(_brute_hits(index_dir, oracle, q))
    for order in ("asc", "desc"):
        want = sorted(hits)
        want = sorted(want, key=lambda d: tix[d], reverse=(order == "desc"))
        want = [(d, float(tix[d])) for d in want][:10]
        assert s.search_by_field(q, "turn_idx", order, k=10) == want, order
    # keyword column with nulls: valued hits lexicographic, missing last
    valued = sorted(
        [d for d in hits if tool[d] is not None],
        key=lambda d: (tool[d], d),
    )
    missing = [d for d in hits if tool[d] is None]
    want = ([(d, tool[d]) for d in valued] + [(d, None) for d in missing])[:40]
    assert s.search_by_field(q, "tool", "asc", k=40) == want
    assert s.search_by_field("zzzz_absent", "turn_idx") == []
    with pytest.raises(ValueError):
        s.search_by_field(q, "turn_idx", order="sideways")


def test_min_should_match_matches_bruteforce(index_dir, oracle):
    """ES minimum_should_match: restriction-only semantics — the msm
    top-k equals the unrestricted ranking filtered to docs matching >= m
    distinct terms, with identical scores, on every executor."""
    idx, _ = oracle
    from rayfts.oracle import tokenize

    s = Searcher(index_dir)
    q = "the a w0007 bash"
    terms = sorted(set(tokenize(q)))
    full = s.search(q, k=100_000)
    for m in (2, 3, 4):
        allowed = {
            d for d, tf in idx.doc_tfs.items()
            if sum(1 for t in terms if tf.get(t, 0) > 0) >= m
        }
        want = [(d, sc) for d, sc in full if d in allowed][:10]
        for algo in ("taat", "wand"):
            got = s.search(q, k=10, algo=algo, min_should_match=m)
            assert got == want, (m, algo)
    assert s.search(q, k=10, min_should_match=len(terms) + 1) == []
    # msm=1 / None are no-ops
    assert s.search(q, k=10, min_should_match=1) == full[:10]
    with pytest.raises(ValueError):
        s.search(q, k=10, mode="and", min_should_match=2)


# ----------------------------------------------------------------------
# stats + histogram aggregations (ES stats-agg / histogram-agg analogs)
# ----------------------------------------------------------------------

def _brute_hits(index_dir, oracle, q):
    """Doc ids matching ANY analyzed query term (OR hit set)."""
    idx, _ = oracle
    from rayfts.oracle import tokenize

    terms = set(tokenize(q))
    return {
        d for d, tf in idx.doc_tfs.items()
        if any(tf.get(t, 0) > 0 for t in terms)
    }


def test_stats_agg_matches_bruteforce(index_dir, oracle):
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx"])
    tix = np.zeros(s.N, dtype=np.int64)
    tix[t["doc_id"].to_numpy()] = t["turn_idx"].to_numpy()
    for q in ["the w0007", "bash", "zzzz_absent", "the a to ok"]:
        hits = sorted(_brute_hits(index_dir, oracle, q))
        got = s.stats_agg(q, "turn_idx")
        if not hits:
            assert got == {"count": 0, "min": None, "max": None, "sum": 0.0}
            continue
        vals = tix[np.array(hits)]
        assert got["count"] == len(hits), q
        assert got["min"] == float(vals.min()), q
        assert got["max"] == float(vals.max()), q
        assert got["sum"] == float(vals.sum()), q


def test_histogram_agg_matches_bruteforce(index_dir, oracle):
    import pyarrow.parquet as pq
    from collections import Counter as C

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx"])
    tix = np.zeros(s.N, dtype=np.int64)
    tix[t["doc_id"].to_numpy()] = t["turn_idx"].to_numpy()
    q = "the a"
    hits = sorted(_brute_hits(index_dir, oracle, q))
    want = sorted(C(
        float(np.floor(tix[d] / 3.0) * 3.0) for d in hits
    ).items())
    assert s.histogram_agg(q, "turn_idx", 3.0) == want
    with pytest.raises(ValueError):
        s.histogram_agg(q, "turn_idx", 0)


def test_sessionize_gap_semantics():
    """Gap-based session windows: boundary inclusive/exclusive pinned
    (gap == GAP stays one session; gap > GAP splits)."""
    import pyarrow.parquet as pq
    import tempfile

    from rayfts.pipelines import SESSION_GAP_US, events_sessionize

    g = SESSION_GAP_US
    ts = [0, g, 2 * g + 1, 2 * g + 2]  # [0,g] one session; then a split
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(4), pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array([7] * 4, pa.int64()),
                }
            ),
            f"{d}/events.parquet",
        )
        rows = sorted(
            events_sessionize(d).to_pandas().itertuples(index=False)
        )
    assert [(r.session_start_us, r.n_events, r.dur_us) for r in rows] == [
        (0, 2, g), (2 * g + 1, 2, 1)
    ]


def test_wildcard_infix_plan_equals_scan(index_dir):
    """The gram-prefiltered wildcard plan returns the IDENTICAL answer
    set to the dictionary-scan plan on every pattern shape: infix,
    leading-*, trailing-*, ?-mixed, short-run fallback, no-match."""
    s = Searcher(index_dir)
    for pat in ["*ash*", "*w00*", "bas*", "*0007", "b?sh*", "*a*",
                "*zzz_absent*", "w0?07*"]:
        assert s.wildcard_infix_docs(pat, limit=50) == \
            s.wildcard_docs(pat, limit=50), pat


def test_fuzziness_auto_ladder():
    from rayfts.search import fuzziness_auto

    assert [fuzziness_auto(x) for x in
            ["", "ab", "abc", "abcde", "abcdef", "cusstomer"]] == \
        [0, 0, 1, 1, 2, 2]


def test_eql_sequence_matches_bruteforce():
    """EQL sequence semantics pinned: strictly-after lower bound,
    inclusive maxspan upper bound, one count per matching click, users
    without a completed sequence absent."""
    import tempfile

    import pyarrow.parquet as pq

    from rayfts.pipelines import EQL_MAXSPAN_US, events_eql_sequence

    rng = np.random.default_rng(5)
    n = 400
    users = rng.integers(0, 6, n)
    ts = np.sort(rng.integers(0, 40 * EQL_MAXSPAN_US, n))
    types = rng.choice(["click", "purchase", "view"], n)
    # pin the boundary cases explicitly on user 9
    extra_u = [9, 9, 9, 9]
    extra_t = [0, EQL_MAXSPAN_US, 10 * EQL_MAXSPAN_US,
               11 * EQL_MAXSPAN_US + 1]
    extra_e = ["click", "purchase", "click", "purchase"]
    users = np.concatenate([users, extra_u])
    ts = np.concatenate([ts, extra_t])
    types = np.array(list(types) + extra_e)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({
                "event_id": pa.array(range(users.size), pa.int64()),
                "ts": pa.array(ts.astype("int64"), pa.timestamp("us")),
                "user_id": pa.array(users.astype("int64"), pa.int64()),
                "event_type": pa.array(types, pa.string()),
            }),
            f"{d}/events.parquet",
        )
        got = {
            int(r.user_id): int(r.n_seq)
            for r in events_eql_sequence(d).to_pandas().itertuples()
        }
    want: dict = {}
    for u in set(users.tolist()):
        m = users == u
        a = ts[m & (types == "click")]
        b = ts[m & (types == "purchase")]
        c = sum(
            1 for x in a if ((b > x) & (b <= x + EQL_MAXSPAN_US)).any()
        )
        if c:
            want[int(u)] = c
    assert got == want
    # boundary pins: purchase AT ts+maxspan matches; +1 past it doesn't
    assert want.get(9, 0) == 1


def test_eql_until_matches_bruteforce():
    """EQL until: error strictly between click and purchase kills the
    sequence; error at exactly the purchase ts does NOT (open
    interval, the pinned rule); first-purchase kernel == ANY-purchase
    brute force."""
    import tempfile

    import pyarrow.parquet as pq

    from rayfts.pipelines import EQL_MAXSPAN_US, events_eql_until

    rng = np.random.default_rng(11)
    n = 600
    users = rng.integers(0, 6, n)
    ts = np.sort(rng.integers(0, 40 * EQL_MAXSPAN_US, n))
    types = rng.choice(["click", "purchase", "error", "view"], n)
    # boundary pins on user 9:
    #  - click 0, error 50, purchase 100  -> killed
    #  - click 10*S, purchase 10*S+60, error 10*S+60 (same ts) -> lives
    extra_u = [9] * 6
    S = EQL_MAXSPAN_US
    extra_t = [0, 50, 100, 10 * S, 10 * S + 60, 10 * S + 60]
    extra_e = ["click", "error", "purchase",
               "click", "purchase", "error"]
    users = np.concatenate([users, extra_u])
    ts = np.concatenate([ts, extra_t])
    types = np.array(list(types) + extra_e)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({
                "event_id": pa.array(range(users.size), pa.int64()),
                "ts": pa.array(ts.astype("int64"), pa.timestamp("us")),
                "user_id": pa.array(users.astype("int64"), pa.int64()),
                "event_type": pa.array(types, pa.string()),
            }),
            f"{d}/events.parquet",
        )
        got = {
            int(r.user_id): int(r.n_seq)
            for r in events_eql_until(d).to_pandas().itertuples()
        }
    want: dict = {}
    for u in set(users.tolist()):
        m = users == u
        a = ts[m & (types == "click")]
        b = ts[m & (types == "purchase")]
        e = ts[m & (types == "error")]
        c = 0
        for x in a:
            ok = False
            for p in b[(b > x) & (b <= x + EQL_MAXSPAN_US)]:
                if not ((e > x) & (e < p)).any():
                    ok = True
                    break
            c += ok
        if c:
            want[int(u)] = c
    assert got == want
    assert want.get(9, 0) == 1  # killed + same-ts-survivor = exactly 1


def test_eql_seq3_matches_bruteforce():
    """3-stage EQL: per-adjacent-pair maxspan bound, existence counting
    (any (view, purchase) witness completes the click)."""
    import tempfile

    import pyarrow.parquet as pq

    from rayfts.pipelines import EQL3_MAXSPAN_US, events_eql_seq3

    rng = np.random.default_rng(17)
    n = 600
    users = rng.integers(0, 5, n)
    ts = np.sort(rng.integers(0, 30 * EQL3_MAXSPAN_US, n))
    types = rng.choice(["click", "view", "purchase", "error"], n)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts.astype("int64"), pa.timestamp("us")),
                "user_id": pa.array(users.astype("int64"), pa.int64()),
                "event_type": pa.array(types, pa.string()),
            }),
            f"{d}/events.parquet",
        )
        got = {
            int(r.user_id): int(r.n_seq)
            for r in events_eql_seq3(d).to_pandas().itertuples()
        }
    want: dict = {}
    S = EQL3_MAXSPAN_US
    for u in set(users.tolist()):
        m = users == u
        a = ts[m & (types == "click")]
        v = ts[m & (types == "view")]
        b = ts[m & (types == "purchase")]
        c = sum(
            1 for x in a
            if any(
                ((b > y) & (b <= y + S)).any()
                for y in v[(v > x) & (v <= x + S)]
            )
        )
        if c:
            want[int(u)] = c
    assert got == want and want


def test_pipeline_aggs_over_histogram(index_dir, oracle):
    from rayfts.search import pipeline_aggs

    s = Searcher(index_dir)
    buckets = s.histogram_agg("the a", "turn_idx", 2.0)
    rows = pipeline_aggs(buckets)
    cum = 0
    prev = 0
    for (k, c), (k2, c2, cm, dv) in zip(buckets, rows):
        cum += c
        assert (k2, c2, cm, dv) == (k, c, cum, c - prev)
        prev = c
    # bucket_selector drops, bucket_sort reorders + truncates
    kept = pipeline_aggs(buckets, selector=lambda k, c: c > buckets[0][1])
    assert all(c > buckets[0][1] for _, c, _, _ in kept)
    top2 = pipeline_aggs(buckets, sort_desc_by_count=2)
    assert len(top2) == 2 and top2[0][1] >= top2[1][1]
    assert pipeline_aggs([]) == []


def test_boosting_and_decay_match_bruteforce(index_dir, oracle):
    import math

    idx, t = oracle
    s = Searcher(index_dir)
    q, negq = "the w0007 bash", "grep sed"
    base = dict(idx.search(q, k=idx.N))
    negset = set(negq.split())
    # boosting: demote, never exclude
    want = sorted(
        (
            (d, sc * (0.25 if any(idx.doc_tfs[d].get(t_, 0) for t_ in negset)
                      else 1.0))
            for d, sc in base.items()
        ),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    got = s.boosting_search(q, negq, negative_boost=0.25, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)
    # the plain top-10 contains demotable docs, and demoting them
    # actually changed the ranking (non-vacuous negative branch)
    plain = s.search(q, k=10)
    assert any(
        any(idx.doc_tfs[d].get(t_, 0) for t_ in negset) for d, _ in plain
    )
    assert got != plain
    assert s.boosting_search(q, "zzzz_absent", k=10) == plain
    with pytest.raises(ValueError):
        s.boosting_search(q, negq, negative_boost=1.5)
    # gauss decay on turn_idx: factor == decay at |v-origin| == scale
    tv = dict(enumerate(t["turn_idx"].to_pylist()))
    lam = math.log(1.0 / 0.5)
    want = sorted(
        (
            (d, sc * math.exp((-((tv[d] - 2.0) * (tv[d] - 2.0)))
                              * lam / (3.0 * 3.0)))
            for d, sc in base.items()
        ),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    got = s.decay_score(q, "turn_idx", origin=2.0, scale=3.0, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)
    with pytest.raises(ValueError):
        s.decay_score(q, "turn_idx", origin=0, scale=0)
    # random_score: seeded determinism + md5 rule
    import hashlib

    r1 = s.random_score(q, seed=3, k=10)
    assert r1 == s.random_score(q, seed=3, k=10)
    assert r1 != s.random_score(q, seed=4, k=10)
    want = sorted(
        (
            (d, sc * (int(hashlib.md5(f"3:{d}".encode()).hexdigest()[:8],
                          16) / 4294967296.0))
            for d, sc in base.items()
        ),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    assert [d for d, _ in r1] == [d for d, _ in want]
    for (_, a), (_, b) in zip(r1, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_has_child_search_matches_bruteforce(index_dir, oracle):
    """Join-field parent search: every ES score_mode recomputed from the
    full ranking grouped by conv_id."""
    idx, t = oracle
    s = Searcher(index_dir)
    convs = dict(enumerate(t["conv_id"].to_pylist()))
    q = "the w0007 bash"
    full = idx.search(q, k=idx.N)
    groups: dict = {}
    for d, sc in sorted(full):  # ascending doc: the engine's sum order
        g = groups.setdefault(convs[d], [0.0, -1e18, 0])
        g[0] += sc
        g[1] = max(g[1], sc)
        g[2] += 1
    for sm, pick in [("max", lambda g: g[1]), ("sum", lambda g: g[0]),
                     ("avg", lambda g: g[0] / g[2]),
                     ("none", lambda g: 0.0)]:
        want = sorted(
            ((v, pick(g), g[2]) for v, g in groups.items()),
            key=lambda r: (-r[1], r[0]),
        )[:10]
        got = s.has_child_search(q, "conv_id", k=10, score_mode=sm)
        assert [(v, n) for v, _, n in got] == \
            [(v, n) for v, _, n in want], sm
        for (_, a, _), (_, b, _) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9), sm
    # inner_hits: each selected parent's top children == the full ranking
    # restricted to that conv
    ih = s.has_child_search(q, "conv_id", k=5, inner_hits=2)
    for v, _, n, kids in ih:
        want_kids = [(d, sc) for d, sc in full if convs[d] == v][:2]
        assert [(d, round(sc, 9)) for d, sc in kids] == \
            [(d, round(sc, 9)) for d, sc in want_kids], v
        assert len(kids) == min(2, n)
    # min_children gate
    mc = s.has_child_search(q, "conv_id", k=50, min_children=3)
    assert all(n >= 3 for _, _, n in mc)
    assert s.has_child_search("zzzz_absent", "conv_id") == []
    with pytest.raises(ValueError):
        s.has_child_search(q, "conv_id", score_mode="product")


def test_extended_stats_weighted_avg_match_bruteforce(index_dir, oracle):
    idx, t = oracle
    s = Searcher(index_dir)
    q = "the w0007"
    hits = sorted(_brute_hits(index_dir, oracle, q))
    tv = dict(enumerate(t["turn_idx"].to_pylist()))
    vals = [tv[d] for d in hits]
    n = len(vals)
    st = s.extended_stats_agg(q, "turn_idx")
    assert st["count"] == n
    assert st["sum"] == sum(vals)
    assert st["sum_sq"] == sum(v * v for v in vals)
    var = (n * st["sum_sq"] - st["sum"] ** 2) / (n * n)
    assert st["variance"] == var and st["std_dev"] == pytest.approx(var**0.5)
    empty = s.extended_stats_agg("zzzz_absent", "turn_idx")
    assert empty["count"] == 0 and empty["variance"] is None
    # weighted_avg: turn_idx self-weighted (integral, exact int path)
    wa = s.weighted_avg_agg(q, "turn_idx", "turn_idx")
    num = sum(tv[d] * tv[d] for d in hits)
    den = sum(tv[d] for d in hits)
    assert (wa["num"], wa["den"]) == (num, den)
    assert wa["value"] == num / den
    assert s.weighted_avg_agg("zzzz_absent", "turn_idx", "turn_idx") == {
        "count": 0, "num": 0, "den": 0, "value": None
    }


def test_explain_reproduces_search_scores(index_dir, oracle):
    """Summing explain()'s per-clause contributions in clause order is
    bit-identical to search()'s score for every top hit."""
    idx, _ = oracle
    s = Searcher(index_dir)
    for q in REFERENCE_QUERIES + ["the w0007 bash", "spark^3 the"]:
        for d, sc in s.search(q, k=10):
            ex = s.explain(q, d)
            assert ex["matched"] and ex["doc_id"] == d
            assert ex["score"] == sc, (q, d)
            total = 0.0
            for det in ex["details"]:
                assert det["contribution"] == pytest.approx(
                    det["boost"] * det["idf"] * det["tf_part"], rel=1e-12
                )
                total += det["contribution"]
            assert total == sc
            assert [det["term"] for det in ex["details"]] == sorted(
                {det["term"] for det in ex["details"]}
            )
    # non-matching doc
    miss = s.explain("zzzz_absent", 0)
    assert miss == {"doc_id": 0, "matched": False, "score": 0.0,
                    "details": []}
    with pytest.raises(KeyError):
        s.explain("the", 10**9)


def test_regexp_terms_set_exists_match_bruteforce(index_dir, oracle):
    import re

    idx, t = oracle
    s = Searcher(index_dir)
    # regexp: anchored full-term match (Lucene semantics)
    pat = "w00(07|11)|ba.*"
    rx = re.compile(f"^(?:{pat})$")
    match_terms = {tm for tm in idx.df if rx.fullmatch(tm) or rx.match(tm)}
    want = sorted(
        (d, sum(1 for tm in tf if tm in match_terms))
        for d, tf in idx.doc_tfs.items()
        if any(tm in match_terms for tm in tf)
    )[:20]
    assert s.regexp_docs(pat, limit=20) == want
    assert s.regexp_docs("zzz+", limit=20) == []
    # terms_set: >= m distinct members
    terms, m = ["the", "w0007", "bash", "grep"], 3
    want = sorted(
        (d, c) for d, c in (
            (d, sum(1 for tm in terms if tf.get(tm, 0) > 0))
            for d, tf in idx.doc_tfs.items()
        ) if c >= m
    )[:20]
    assert s.terms_set_docs(terms, m, limit=20) == want
    with pytest.raises(ValueError):
        s.terms_set_docs(terms, 0)
    # exists: non-null keyword field
    tools = t["tool"].to_pylist()
    want_ids = [i for i, v in enumerate(tools) if v is not None]
    assert s.exists_docs("tool", limit=15) == want_ids[:15]
    assert s.exists_count("tool") == len(want_ids)
    assert s.exists_count("role") == idx.N


def test_range_filters_missing_aggs_match_bruteforce(index_dir, oracle):
    import pyarrow.dataset as pads

    idx, t = oracle
    s = Searcher(index_dir)
    q = "the w0007"
    hits = _brute_hits(index_dir, oracle, q)
    dls = {d: idx.dl[d] for d in hits}
    # range agg over the dl-like numeric column: use turn_idx
    tvals = dict(enumerate(t["turn_idx"].to_pylist()))
    ranges = [(None, 2), (2, 5), (5, None), (1, 4)]
    got = s.range_agg(q, "turn_idx", ranges)
    for (f, to), (key, c) in zip(ranges, got):
        want = sum(
            1 for d in hits
            if (f is None or tvals[d] >= f) and (to is None or tvals[d] < to)
        )
        assert c == want, key
    assert got[0][0] == "*-2" and got[2][0] == "5-*"
    assert s.range_agg("zzzz_absent", "turn_idx", ranges) == [
        ("*-2", 0), ("2-5", 0), ("5-*", 0), ("1-4", 0)
    ]
    # filters agg: named role buckets
    roles = dict(enumerate(t["role"].to_pylist()))
    flt = {"users": {"role": "user"}, "tools": {"role": "tool"}}
    got = s.filters_agg(q, flt)
    assert got == [
        ("users", sum(1 for d in hits if roles[d] == "user")),
        ("tools", sum(1 for d in hits if roles[d] == "tool")),
    ]
    # adjacency_matrix: filters + pairwise intersections, empties omitted
    adj = {"u": {"role": "user"}, "t": {"role": "tool"},
           "a": {"role": "assistant"}}
    got = s.adjacency_matrix_agg(q, adj)
    want = []
    for name, r in [("a", "assistant"), ("t", "tool"), ("u", "user")]:
        c = sum(1 for d in hits if roles[d] == r)
        if c:
            want.append((name, c))
    assert got == sorted(want)  # same-column pairs always intersect empty
    assert s.adjacency_matrix_agg("zzzz_absent", adj) == []
    # missing agg: tool column is null off tool turns
    tools = dict(enumerate(t["tool"].to_pylist()))
    assert s.missing_agg(q, "tool") == sum(
        1 for d in hits if tools[d] is None
    )
    assert s.missing_agg("zzzz_absent", "tool") == 0


def test_search_collapse_matches_bruteforce(index_dir, oracle):
    """Field collapsing == full ranking reduced to best-hit-per-group."""
    import pyarrow.dataset as pads

    idx, _ = oracle
    s = Searcher(index_dir)
    t = pads.dataset(os.path.join(index_dir, "docstore")).to_table(
        columns=["doc_id", "role"]
    )
    role = dict(zip(t["doc_id"].to_pylist(), t["role"].to_pylist()))
    for q in ["the w0007 bash", "zzzz_absent", "w0003"]:
        full = idx.search(q, k=idx.N)
        best: dict = {}
        for d, sc in full:  # already (score desc, doc asc)
            v = role.get(d)
            if v not in best:
                best[v] = (d, sc)
        want = sorted(best.values(), key=lambda h: (-h[1], h[0]))[:10]
        got = s.search_collapse(q, "role", k=10)
        assert [(d, v) for d, _, v in got] == \
            [(d, role[d]) for d, _ in want], q
        for (gd, gs, _), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), (q, gd)
    # each group value appears at most once
    vals = [v for _, _, v in s.search_collapse("the a", "role", k=50)]
    assert len(vals) == len(set(vals))


def test_composite_agg_paginates_all_buckets(index_dir, oracle):
    """Walking the composite cursor reproduces the full value-asc facet
    histogram in bounded pages, no overlap, no gaps."""
    s = Searcher(index_dir)
    q = "the a"
    full = sorted(s._facet_hist(q, "role").items())
    pages, after = [], None
    while True:
        page = s.composite_agg(q, "role", size=2, after_key=after)
        if not page:
            break
        pages.extend(page)
        after = page[-1][0]
    assert pages == full
    assert s.composite_agg("zzzz_absent", "role") == []


def test_significant_terms_matches_bruteforce(index_dir, oracle):
    """JLH scoring over the hit set vs a full recompute from doc_tfs."""
    idx, _ = oracle
    s = Searcher(index_dir)
    q = "w0007 bash"
    hits = _brute_hits(index_dir, oracle, q)
    nh, n = len(hits), idx.N
    fg: dict[str, int] = {}
    for d in hits:
        for t in idx.doc_tfs[d]:
            fg[t] = fg.get(t, 0) + 1
    want = []
    for t, f in fg.items():
        df = idx.df[t]
        fgp, bgp = f / nh, df / n
        if f >= 3 and fgp > bgp:
            want.append((t, f, df, (fgp - bgp) * (fgp / bgp)))
    want.sort(key=lambda e: (-e[3], e[0]))
    got = s.significant_terms(q, size=10, min_doc_count=3)
    assert [(t, f, d) for t, f, d, _ in got] == \
        [(t, f, d) for t, f, d, _ in want[:10]]
    for (_, _, _, a), (_, _, _, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-12)
    # the query's own terms should surface as significant
    assert "w0007" in {t for t, *_ in got}
    # sampler knob: >= hits is exact; a small sample stays well-formed
    assert s.significant_terms(q, size=10, min_doc_count=3,
                               sample_size=10**9) == got
    sampled = s.significant_terms(q, size=10, min_doc_count=1,
                                  sample_size=5)
    assert sampled and all(f <= 5 for _, f, _, _ in sampled)
    scores = [sc for *_, sc in sampled]
    assert scores == sorted(scores, reverse=True)
    # deterministic: the sample is top-hits-by-score, not random
    assert sampled == s.significant_terms(q, size=10, min_doc_count=1,
                                          sample_size=5)


def test_cardinality_agg_matches_bruteforce(index_dir, oracle):
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "role"])
    role = dict(zip(t["doc_id"].to_pylist(), t["role"].to_pylist()))
    for q in ["the w0007", "bash", "zzzz_absent", "the a to ok"]:
        hits = _brute_hits(index_dir, oracle, q)
        want = len({role[d] for d in hits if role[d] is not None})
        assert s.cardinality_agg(q, "role") == want, q


def test_percentiles_agg_matches_numpy(index_dir, oracle):
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx"])
    tix = np.zeros(s.N, dtype=np.int64)
    tix[t["doc_id"].to_numpy()] = t["turn_idx"].to_numpy()
    percents = (0.0, 10.0, 50.0, 90.0, 99.5, 100.0)
    for q in ["the w0007", "bash", "the a to ok"]:
        vals = tix[np.array(sorted(_brute_hits(index_dir, oracle, q)))]
        got = s.percentiles_agg(q, "turn_idx", percents)
        for p in percents:
            want = float(np.percentile(vals, p, method="linear"))
            assert got[p] == pytest.approx(want, abs=1e-12), (q, p)
    empty = s.percentiles_agg("zzzz_absent", "turn_idx", percents)
    assert all(v is None for v in empty.values())


def test_calendar_floor_matches_datetime():
    """The vectorized datetime64 truncation agrees with Python datetime
    calendar arithmetic for every supported unit across 1971-2035."""
    from datetime import datetime, timezone

    from rayfts.search import calendar_floor

    rng = np.random.default_rng(7)
    epochs = rng.integers(31_536_000, 2_051_222_400, size=500)
    dts = [datetime.fromtimestamp(int(e), tz=timezone.utc) for e in epochs]

    def ts(dt):
        return int(dt.timestamp())

    want = {
        "m": [ts(d.replace(second=0)) for d in dts],
        "h": [ts(d.replace(minute=0, second=0)) for d in dts],
        "D": [ts(d.replace(hour=0, minute=0, second=0)) for d in dts],
        "W": [
            ts(d.replace(hour=0, minute=0, second=0))
            - d.weekday() * 86400
            for d in dts
        ],
        "M": [ts(d.replace(day=1, hour=0, minute=0, second=0)) for d in dts],
        "Y": [
            ts(d.replace(month=1, day=1, hour=0, minute=0, second=0))
            for d in dts
        ],
    }
    for unit, exp in want.items():
        got = calendar_floor(epochs.astype(np.int64), unit)
        assert got.tolist() == exp, unit


def test_date_histogram_agg_counts_and_errors(index_dir, oracle):
    s = Searcher(index_dir)
    q = "the a"
    n_hits = s.stats_agg(q, "turn_idx")["count"]
    # turn_idx as epoch seconds: every hit lands in the 1970-01-01 minute
    assert s.date_histogram_agg(q, "turn_idx", "minute") == [(0, n_hits)]
    assert s.date_histogram_agg("zzzz_absent", "turn_idx", "day") == []
    with pytest.raises(ValueError):
        s.date_histogram_agg(q, "turn_idx", "fortnight")


def test_multi_match_most_fields(corpus, index_dir, oracle, tmp_path_factory):
    """multi_match most_fields: a second field index (text_col='tool',
    mostly null) over the SAME doc space; score = 1*text + 2*tool with
    each field's own df/dl/avgdl statistics."""
    from rayfts.search import MultiFieldSearcher

    d = tmp_path_factory.mktemp("toolidx")
    cfg = IndexJobConfig(index_dir=str(d), term_buckets=4, text_col="tool")
    build_index(corpus, cfg=cfg, rows_per_part=100)
    idx_text, t = oracle
    tool_docs = {
        i: (v if v is not None else "")
        for i, v in enumerate(t["tool"].to_pylist())
    }
    idx_tool = BruteForceIndex(tool_docs)
    mf = MultiFieldSearcher(
        {"text": (Searcher(index_dir), 1.0), "tool": (Searcher(str(d)), 2.0)}
    )
    q = "w0007 bash edit"
    a = dict(idx_text.search(q, k=10**6))
    b = dict(idx_tool.search(q, k=10**6))
    combined = {
        doc: 1.0 * a.get(doc, 0.0) + 2.0 * b.get(doc, 0.0)
        for doc in set(a) | set(b)
    }
    want = sorted(combined.items(), key=lambda h: (-h[1], h[0]))[:10]
    got = mf.search(q, k=10)
    assert [x for x, _ in got] == [x for x, _ in want]
    for (_, x), (_, y) in zip(got, want):
        assert x == pytest.approx(y, abs=1e-9)
    with pytest.raises(ValueError):
        MultiFieldSearcher({})
    # best_fields / dis_max: max + tie_breaker * rest, per-field stats
    for tb in (0.0, 0.3):
        combined = {
            doc: max(1.0 * a.get(doc, 0.0), 2.0 * b.get(doc, 0.0))
            + tb * (
                (2.0 * b.get(doc, 0.0) + 1.0 * a.get(doc, 0.0))
                - max(1.0 * a.get(doc, 0.0), 2.0 * b.get(doc, 0.0))
            )
            for doc in set(a) | set(b)
        }
        want = sorted(combined.items(), key=lambda h: (-h[1], h[0]))[:10]
        got = mf.search(q, k=10, match_type="best_fields", tie_breaker=tb)
        assert [x for x, _ in got] == [x for x, _ in want], tb
        for (_, x), (_, y) in zip(got, want):
            assert x == pytest.approx(y, abs=1e-9)
    # cross_fields: one blended idf per term, max saturation over fields
    def sat(idx2, doc, term):
        f = idx2.doc_tfs[doc].get(term, 0)
        if f == 0:
            return 0.0
        norm = idx2.k1 * (
            1.0 - idx2.b + idx2.b * idx2.dl[doc] / idx2.avgdl
        )
        return f * (idx2.k1 + 1.0) / (f + norm)

    import math

    combined = {}
    for doc in set(a) | set(b):
        sc = 0.0
        for term in sorted(set(q.split())):
            df_blend = max(idx_text.df.get(term, 0), idx_tool.df.get(term, 0))
            if df_blend == 0:
                continue
            m = max(1.0 * sat(idx_text, doc, term),
                    2.0 * sat(idx_tool, doc, term))
            if m:
                w = math.log(
                    1.0 + (idx_text.N - df_blend + 0.5) / (df_blend + 0.5)
                )
                sc += w * m
        if sc:
            combined[doc] = sc
    want = sorted(combined.items(), key=lambda h: (-h[1], h[0]))[:10]
    got = mf.search(q, k=10, match_type="cross_fields")
    assert [x for x, _ in got] == [x for x, _ in want]
    for (_, x), (_, y) in zip(got, want):
        assert x == pytest.approx(y, abs=1e-9)
    with pytest.raises(ValueError):
        mf.search(q, match_type="phrase_fields")
    # combined_fields / BM25F: ONE pseudo-field — weighted tf/dl sums,
    # blended max-df idf, saturation on the combined quantities
    import math as _math

    from rayfts.oracle import tokenize as _tok

    wt, wo = 1.0, 2.0  # "text" < "tool" — engine field order
    tok_t = {d: _tok(x) for d, x in idx_text.texts.items()}
    tok_o = {d: _tok(x) for d, x in tool_docs.items()}
    N = len(tok_t)
    cdl = {d: wt * len(tok_t[d]) + wo * len(tok_o[d]) for d in tok_t}
    cavgdl = (wt * sum(len(v) for v in tok_t.values())
              + wo * sum(len(v) for v in tok_o.values())) / N
    combined = {}
    for term in sorted(set(_tok(q))):
        df_b = max(
            sum(1 for v in tok_t.values() if term in v),
            sum(1 for v in tok_o.values() if term in v),
        )
        if df_b == 0:
            continue
        w = _math.log(1.0 + (N - df_b + 0.5) / (df_b + 0.5))
        for d in tok_t:
            ctf = (wt * tok_t[d].count(term) + wo * tok_o[d].count(term))
            if ctf == 0:
                continue
            sat = ctf * 2.2 / (ctf + 1.2 * (0.25 + 0.75 * cdl[d] / cavgdl))
            combined[d] = combined.get(d, 0.0) + w * sat
    want = sorted(combined.items(), key=lambda h: (-h[1], h[0]))[:10]
    got = mf.search(q, k=10, match_type="combined_fields")
    assert [x for x, _ in got] == [x for x, _ in want]
    for (_, x), (_, y) in zip(got, want):
        assert x == pytest.approx(y, abs=1e-9)


def test_match_bool_prefix_matches_bruteforce(index_dir, oracle):
    """match_bool_prefix: BM25 over all-but-last tokens + constant 1.0
    for docs containing any term with the last token's prefix."""
    idx, _ = oracle
    s = Searcher(index_dir)
    tok_docs = {d: tokenize(t) for d, t in idx.texts.items()}
    for q in ["the w00", "bash w0007 ed", "w00", "zzzz_absent qq"]:
        toks = tokenize(q)
        rest, prefix = toks[:-1], toks[-1]
        base = dict(idx.search(" ".join(rest), k=10**6)) if rest else {}
        pref = {
            d for d, tk in tok_docs.items()
            if any(t.startswith(prefix) for t in tk)
        }
        comb = {
            d: base.get(d, 0.0) + (1.0 if d in pref else 0.0)
            for d in set(base) | pref
        }
        want = sorted(comb.items(), key=lambda h: (-h[1], h[0]))[:10]
        got = s.match_bool_prefix(q, k=10)
        assert [x for x, _ in got] == [x for x, _ in want], q
        for (_, x), (_, y) in zip(got, want):
            assert x == pytest.approx(y, abs=1e-9), q
    assert s.match_bool_prefix("", k=10) == []
    assert s.match_bool_prefix("the w00", k=0) == []


def test_pinned_search_promotes_in_order(index_dir, oracle):
    """pinned: given ids first (input order, deduped, absent ids
    skipped), each with its organic dense score; organic tail excludes
    the pinned set."""
    idx, _ = oracle
    s = Searcher(index_dir)
    organic = s.search("the w0007 bash", k=10**6)
    pin = [organic[3][0], 5, 5, s.N + 100, organic[0][0]]
    got = s.pinned_search(pin, "the w0007 bash", k=10)
    want_ids = [organic[3][0], 5, organic[0][0]]
    assert [d for d, _, p in got[:3]] == want_ids
    assert all(p for _, _, p in got[:3])
    by_id = dict((d, sc) for d, sc in organic)
    for d, sc, p in got[:3]:
        assert sc == pytest.approx(by_id.get(d, 0.0), abs=1e-12)
    tail = [d for d, _, p in got[3:]]
    assert all(not p for _, _, p in got[3:])
    want_tail = [d for d, _ in organic if d not in set(want_ids)][:7]
    assert tail == want_tail
    # k smaller than the pin list truncates inside the pins
    assert [d for d, _, _ in s.pinned_search(pin, "the", k=2)] == \
        want_ids[:2]


def test_synonym_search_matches_bruteforce(index_dir, oracle):
    """SynonymQuery semantics: per group df = max over members, tf = sum
    of member tfs, one idf*saturation contribution per group in
    head-term order."""
    idx, _ = oracle
    s = Searcher(index_dir)
    q = "w0007 edit"
    syns = {"w0007": ("w0001",), "edit": ("bash",)}
    want_scores = {}
    for head in sorted(set(q.split())):
        group = [head, *syns.get(head, ())]
        df_b = max(idx.df.get(t, 0) for t in group)
        if df_b == 0:
            continue
        w = 1.0 * float(np.log(1.0 + (idx.N - df_b + 0.5) / (df_b + 0.5)))
        for d, tf in idx.doc_tfs.items():
            t_sum = sum(tf.get(t, 0) for t in group)
            if t_sum == 0:
                continue
            norm = idx.k1 * (1.0 - idx.b + idx.b * idx.dl[d] / idx.avgdl)
            want_scores[d] = want_scores.get(d, 0.0) + w * (
                t_sum * (idx.k1 + 1.0) / (t_sum + norm)
            )
    want = sorted(want_scores.items(), key=lambda h: (-h[1], h[0]))[:10]
    got = s.synonym_search(q, syns, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)
    # no synonyms == plain search
    assert s.synonym_search("w0007 bash", {}, k=10) == \
        s.search("w0007 bash", k=10)
    assert s.synonym_search("zzzz_absent", {"zzzz_absent": ("zzz2",)}) == []


def test_function_score_matches_bruteforce(index_dir, oracle):
    """field_value_factor rescoring: final = BM25 * ln(1+field), ranked
    over the WHOLE hit set (a rescore can promote any hit into the
    top-k), doc_id-asc ties, null fields pass through with factor 1."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx"])
    tix = dict(zip(t["doc_id"].to_pylist(), t["turn_idx"].to_pylist()))
    q = "the w0007 bash"
    full = s.search(q, k=100_000)
    resc = sorted(
        ((d, sc * float(np.log(1.0 + float(tix[d])))) for d, sc in full),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    got = s.function_score(q, "turn_idx", k=10, modifier="log1p")
    assert [d for d, _ in got] == [d for d, _ in resc]
    for (_, a), (_, b) in zip(got, resc):
        assert a == pytest.approx(b, abs=1e-12)
    assert s.function_score("zzzz_absent", "turn_idx") == []
    with pytest.raises(ValueError):
        s.function_score(q, "turn_idx", modifier="cube")


def test_more_like_this_matches_bruteforce(index_dir, oracle):
    """MLT term selection (tf*idf desc, term asc, df/tf floors) and the
    resulting source-excluded ranking match a recompute from the oracle's
    doc_tfs/df tables."""
    idx, _ = oracle
    s = Searcher(index_dir)
    for doc in (0, 17, 123):
        tf = idx.doc_tfs[doc]
        cands = sorted(
            (-(f * idx.idf(t)), t)
            for t, f in tf.items()
            if f >= 1 and idx.df.get(t, 0) >= 2
        )
        terms = [t for _, t in cands[:25]]
        assert s.mlt_terms(doc) == terms, doc
        want = [
            h for h in idx.search(" ".join(sorted(terms)), k=11)
            if h[0] != doc
        ][:10]
        got = s.more_like_this(doc, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], doc
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=1e-9), doc


def test_export_hits_streams_full_hit_set(index_dir, oracle):
    """Scroll analog: the exported Dataset carries exactly the hit set,
    composes with restrictions, and prunes columns."""
    from rayfts.export import export_hits

    q = "the w0007"
    ds = export_hits(index_dir, q, columns=["conv_id"])
    got = ds.to_pandas()
    assert sorted(got.columns) == ["conv_id", "doc_id"]
    assert sorted(got["doc_id"]) == sorted(_brute_hits(index_dir, oracle, q))
    s = Searcher(index_dir)
    filt = export_hits(index_dir, q, columns=["role"],
                       where={"role": "user"}).to_pandas()
    assert set(filt["role"]) == {"user"}
    assert len(filt) == int(s._hit_mask(q, where={"role": "user"}).sum())
    assert export_hits(index_dir, "zzzz_absent").count() == 0
    # slice_id without slice_max is a caller bug (would silently export
    # the FULL hit set per consumer) — must raise, not ignore
    with pytest.raises(ValueError, match="slice_max"):
        export_hits(index_dir, q, slice_id=2)


def test_exact_int_sums_widen_past_int64():
    """The exact-sum helpers behind extended_stats/t_test/weighted_avg/
    matrix_stats must not wrap where naive int64 sums do (doc_id^2 sums
    pass int64 at ~3.1M docs; epoch-ms squares overflow per term)."""
    from rayfts.search import _exact_int_sum, _exact_prod_sum

    a = np.full(10_000, (1 << 60), dtype=np.int64)  # naive sum wraps
    assert _exact_int_sum(a) == 10_000 * (1 << 60)
    assert _exact_int_sum(np.array([], dtype=np.int64)) == 0
    assert _exact_int_sum(np.array([0, 0], dtype=np.int64)) == 0
    rng = np.random.default_rng(7)
    b = rng.integers(-(1 << 40), 1 << 40, size=5_000)
    assert _exact_int_sum(b) == sum(int(x) for x in b)
    # per-term product fits int64 but the sum wraps
    c = np.full(100, 1 << 31, dtype=np.int64)
    assert _exact_prod_sum(c, c) == 100 * (1 << 62)
    # per-term product itself exceeds int64 -> object-dtype fallback
    d = np.full(10, 1 << 33, dtype=np.int64)
    assert _exact_prod_sum(d, d) == 10 * (1 << 66)
    assert _exact_prod_sum(b, b) == sum(int(x) * int(x) for x in b)


def test_rare_and_multi_terms_match_bruteforce(index_dir, oracle):
    """rare_terms == facet histogram filtered/reordered; multi_terms ==
    pair-count brute force with the (count desc, key asc) order and the
    drop-if-any-field-missing rule; both reject bad params."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    q = "the w0007"
    full = dict(s.facet_counts(q, "role", size=10_000))
    for mdc in (1, 2, max(full.values())):
        want = sorted(((v, c) for v, c in full.items() if c <= mdc),
                      key=lambda e: (e[1], e[0]))
        assert s.rare_terms_agg(q, "role", max_doc_count=mdc) == want
    assert s.rare_terms_agg(q, "role",
                            max_doc_count=max(full.values()),
                            size=1) == \
        s.rare_terms_agg(q, "role", max_doc_count=max(full.values()))[:1]
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "role", "tool"])
    by_doc = {
        int(d): (r, tl) for d, r, tl in zip(
            t["doc_id"].to_pylist(), t["role"].to_pylist(),
            t["tool"].to_pylist())
    }
    hits = np.flatnonzero(s._hit_mask(q))
    pairs: dict = {}
    for d in hits:
        r, tl = by_doc[int(d)]
        if r is None or tl is None:
            continue
        pairs[(r, tl)] = pairs.get((r, tl), 0) + 1
    want = sorted(pairs.items(), key=lambda e: (-e[1], e[0]))[:5]
    assert s.multi_terms_agg(q, ["role", "tool"], size=5) == want
    with pytest.raises(ValueError):
        s.rare_terms_agg(q, "role", max_doc_count=0)
    with pytest.raises(ValueError):
        s.multi_terms_agg(q, ["role"])


def test_facet_include_exclude(index_dir):
    """terms include/exclude full-match regexes filter bucket keys
    BEFORE size truncation; plain call unchanged."""
    import re

    s = Searcher(index_dir)
    q = "the w0007"
    full = dict(s.facet_counts(q, "tool", size=10_000))
    inc, exc = r".*a.*", r"bash"
    want = sorted(
        ((v, c) for v, c in full.items()
         if re.fullmatch(inc, v) and not re.fullmatch(exc, v)),
        key=lambda e: (-e[1], e[0]),
    )
    got = s.facet_counts(q, "tool", size=10_000, include=inc, exclude=exc)
    assert got == want and got
    # truncation happens AFTER filtering: size=1 returns the best
    # SURVIVING bucket, not the best overall
    assert s.facet_counts(q, "tool", size=1, include=inc,
                          exclude=exc) == want[:1]


def test_facet_missing_mdc_and_hist_offset(index_dir):
    """terms `missing` buckets field-less hits under the given value;
    `min_doc_count` floors merged counts pre-truncation; histogram
    `offset` shifts boundaries."""
    s = Searcher(index_dir)
    q = "the w0007"
    hits = s._hit_mask(q)
    n_hits = int(hits.sum())
    plain = dict(s.facet_counts(q, "tool", size=10_000))
    with_missing = dict(s.facet_counts(q, "tool", size=10_000,
                                       missing="none"))
    n_missing = n_hits - sum(plain.values())
    assert with_missing.get("none", 0) == plain.get("none", 0) + n_missing
    assert sum(with_missing.values()) == n_hits
    # min_doc_count floors the (merged, missing-included) counts
    mdc = 2
    floored = s.facet_counts(q, "tool", size=10_000, missing="none",
                             min_doc_count=mdc)
    assert floored == sorted(
        ((v, c) for v, c in with_missing.items() if c >= mdc),
        key=lambda e: (-e[1], e[0]))
    # histogram offset: key = floor((v-off)/i)*i + off, brute force
    vals, valid = s._numeric_col("turn_idx")
    sel = vals[hits & valid]
    import collections

    off, interval = 1.5, 4.0
    want_h = collections.Counter(
        np.floor((sel - off) / interval) * interval + off)
    assert s.histogram_agg(q, "turn_idx", interval, offset=off) == \
        sorted((float(k), int(c)) for k, c in want_h.items())


def test_date_hist_metric_and_bucket_script(index_dir):
    """date_hist_metric_agg == per-bucket (count, exact int sum) brute
    force; bucket_script evaluates the ratio AST per bucket and SKIPS
    zero-denominator buckets (the ES gap policy)."""
    from rayfts.search import bucket_script_buckets

    s = Searcher(index_dir)
    q = "the w0007"
    # the transcripts fixture has no ts_epoch/n_chars; use turn_idx as
    # both the date axis (epoch seconds) and the metric
    rows = s.date_hist_metric_agg(q, "turn_idx", "year", "turn_idx")
    want: dict = {}
    hits = np.flatnonzero(s._hit_mask(q))
    tv, tvalid = s._numeric_col("turn_idx")
    from rayfts.search import calendar_floor

    for d in hits:
        if not tvalid[d]:
            continue
        k = int(calendar_floor(np.array([int(tv[d])]), "Y")[0])
        c, m = want.get(k, (0, 0))
        want[k] = (c + 1, m + int(tv[d]))
    assert rows == [(k, *want[k]) for k in sorted(want)]
    out = bucket_script_buckets(
        rows, {"op": "/", "a": {"var": "metric_sum"}, "b": {"var": "_count"}}
    )
    assert [(k, n, m) for k, n, m, _ in out] == rows
    for k, n, m, v in out:
        assert v == pytest.approx(m / n, abs=0)
    # zero denominator -> bucket skipped
    skip = bucket_script_buckets(
        [(0, 1, 5)], {"op": "/", "a": 1.0, "b": {"var": "_count"}})
    assert len(skip) == 1
    assert bucket_script_buckets(
        [(0, 0, 5)], {"op": "/", "a": 1.0, "b": {"var": "_count"}}) == []


def test_reverse_nested_matches_bruteforce(index_dir):
    """reverse_nested == per-child-bucket (doc count, DISTINCT parent
    count) brute force over the hit set, (n_docs desc, value asc)."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    q = "the w0007"
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "role", "tool"])
    by_doc = {
        int(d): (r, tl) for d, r, tl in zip(
            t["doc_id"].to_pylist(), t["role"].to_pylist(),
            t["tool"].to_pylist())
    }
    hits = np.flatnonzero(s._hit_mask(q))
    n_docs: dict = {}
    parents: dict = {}
    for d in hits:
        r, tl = by_doc[int(d)]
        if r is None or tl is None:
            continue
        n_docs[r] = n_docs.get(r, 0) + 1
        parents.setdefault(r, set()).add(tl)
    want = [
        (v, c, len(parents[v]))
        for v, c in sorted(n_docs.items(), key=lambda e: (-e[1], e[0]))
    ][:10]
    assert s.reverse_nested_agg(q, "role", "tool", size=10) == want


def test_facet_top_hits_matches_search(index_dir, oracle):
    """terms + top_hits: bucket order == facet_counts; in-bucket hits ==
    the full ranking filtered to the bucket (identical scores — the
    sub-agg never reweights)."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "role"])
    role = dict(zip(t["doc_id"].to_pylist(), t["role"].to_pylist()))
    q = "the w0007 bash"
    full = s.search(q, k=100_000)
    got = s.facet_top_hits(q, "role", size=3, top_n=4)
    assert [(v, c) for v, c, _ in got] == s.facet_counts(q, "role", size=3)
    for v, _, hits in got:
        want = [(d, sc) for d, sc in full if role[d] == v][:4]
        assert hits == want, v
    assert s.facet_top_hits("zzzz_absent", "role") == []


def test_aggs_compose_with_filters_and_tombstones(index_dir, oracle):
    s = Searcher(index_dir)
    full = s.stats_agg("the a", "turn_idx")
    filt = s.stats_agg("the a", "turn_idx", where={"role": "user"})
    assert 0 < filt["count"] < full["count"]
    # where-restriction == manually intersecting the hit mask
    m = s._hit_mask("the a", where={"role": "user"})
    assert filt["count"] == int(m.sum())


def test_rank_feature_matches_bruteforce(index_dir, oracle):
    """rank_feature saturation: final = BM25 + boost * v/(v+pivot),
    additive should clause over the whole hit set, doc_id-asc ties."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx"])
    tix = dict(zip(t["doc_id"].to_pylist(), t["turn_idx"].to_pylist()))
    q = "the w0007 bash"
    full = s.search(q, k=100_000)
    want = sorted(
        ((d, sc + 1.5 * (float(tix[d]) / (float(tix[d]) + 2.0)))
         for d, sc in full),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    got = s.rank_feature(q, "turn_idx", pivot=2.0, k=10, boost=1.5)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)
    assert s.rank_feature("zzzz_absent", "turn_idx", pivot=2.0) == []
    with pytest.raises(ValueError):
        s.rank_feature(q, "turn_idx", pivot=0.0)


def test_distance_feature_matches_bruteforce(index_dir, oracle):
    """distance_feature: final = BM25 + boost * pivot/(pivot+|v-origin|);
    the boost is exactly boost/2 at |v-origin| == pivot."""
    import pyarrow.parquet as pq

    s = Searcher(index_dir)
    t = pq.read_table(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "turn_idx"])
    tix = dict(zip(t["doc_id"].to_pylist(), t["turn_idx"].to_pylist()))
    q = "the w0007 bash"
    full = s.search(q, k=100_000)
    want = sorted(
        ((d, sc + 2.0 * (1.0 / (1.0 + abs(float(tix[d]) - 3.0))))
         for d, sc in full),
        key=lambda h: (-h[1], h[0]),
    )[:10]
    got = s.distance_feature(q, "turn_idx", origin=3.0, pivot=1.0,
                             k=10, boost=2.0)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)
    assert s.distance_feature("zzzz_absent", "turn_idx",
                              origin=0.0, pivot=1.0) == []
    with pytest.raises(ValueError):
        s.distance_feature(q, "turn_idx", origin=0.0, pivot=-1.0)


def test_new_metric_aggs_match_bruteforce(index_dir, oracle):
    """value_count / mad / boxplot / string_stats / matrix_stats over
    the OR hit set, recomputed from the corpus (numpy quantile 'linear'
    is the quantile_cont rule the engine pins)."""
    import math
    from collections import Counter

    idx, t = oracle
    s = Searcher(index_dir)
    q = "the a"
    qterms = set(tokenize(q))
    hits = sorted(d for d, tf in idx.doc_tfs.items() if qterms & tf.keys())
    x = np.array([t["turn_idx"].to_pylist()[d] for d in hits], np.float64)

    tools = t["tool"].to_pylist()
    assert s.value_count_agg(q, "turn_idx") == len(hits)
    assert s.value_count_agg(q, "tool") == \
        sum(1 for d in hits if tools[d] is not None)
    assert s.value_count_agg("zzzz_absent", "turn_idx") == 0

    st = s.median_absolute_deviation_agg(q, "turn_idx")
    med = float(np.quantile(x, 0.5))
    assert st["count"] == len(hits)
    assert st["median"] == pytest.approx(med, abs=1e-12)
    assert st["mad"] == pytest.approx(
        float(np.quantile(np.abs(x - med), 0.5)), abs=1e-12
    )
    assert s.median_absolute_deviation_agg("zzzz_absent", "turn_idx") == \
        {"count": 0, "median": None, "mad": None}

    bp = s.boxplot_agg(q, "turn_idx")
    assert bp["count"] == len(hits)
    assert bp["min"] == x.min() and bp["max"] == x.max()
    for key, p in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
        assert bp[key] == pytest.approx(float(np.quantile(x, p)), abs=1e-12)

    roles = t["role"].to_pylist()
    vals = [roles[d] for d in hits if roles[d] is not None]
    cc = Counter("".join(vals))
    tot = sum(len(v) for v in vals)
    ent = -sum((c / tot) * math.log2(c / tot)
               for _, c in sorted(cc.items()))
    ss = s.string_stats_agg(q, "role")
    assert ss["count"] == len(vals)
    assert ss["min_length"] == min(len(v) for v in vals)
    assert ss["max_length"] == max(len(v) for v in vals)
    assert ss["len_sum"] == tot
    assert ss["entropy"] == pytest.approx(ent, abs=1e-12)

    y = np.array(hits, np.float64)  # doc_id column over the hit set
    ms = s.matrix_stats_agg(q, "turn_idx", "doc_id")
    n = len(hits)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    assert (ms["count"], ms["sx"], ms["sy"], ms["sxx"], ms["syy"],
            ms["sxy"]) == (n, sx, sy, sxx, syy, sxy)
    cov_num = n * sxy - sx * sy
    assert ms["covariance"] == pytest.approx(cov_num / (n * n), abs=1e-9)
    assert ms["correlation"] == pytest.approx(
        cov_num / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        abs=1e-12,
    )
    empty = s.matrix_stats_agg("zzzz_absent", "turn_idx", "doc_id")
    assert empty["count"] == 0 and empty["correlation"] is None


def test_moving_window_and_auto_date_hist(index_dir, oracle):
    """moving_fn/serial_diff over parent buckets (trailing window incl.
    current, coalesce-0 lag under-run) + auto_date_histogram interval
    choice (smallest ladder rung fitting the target)."""
    from rayfts.search import moving_window_aggs

    buckets = [(0, 3), (10, 1), (20, 4), (30, 1), (40, 5)]
    rows = moving_window_aggs(buckets, window=3, lag=2)
    counts = [c for _, c in buckets]
    for i, (key, cnt, msum, mcnt, mmin, mmax, sdiff) in enumerate(rows):
        w = counts[max(0, i - 2): i + 1]
        assert (key, cnt) == buckets[i]
        assert (msum, mcnt, mmin, mmax) == (sum(w), len(w), min(w), max(w))
        assert sdiff == cnt - (counts[i - 2] if i >= 2 else 0)
    with pytest.raises(ValueError):
        moving_window_aggs(buckets, window=0)
    with pytest.raises(ValueError):
        moving_window_aggs(buckets, lag=0)

    import math
    s = Searcher(index_dir)
    idx, _ = oracle
    q = "the a"
    st = s.stats_agg(q, "turn_idx")
    interval, got = s.auto_date_histogram_agg(q, "turn_idx", 4)
    ladder = Searcher.AUTO_DATE_LADDER
    want_iv = next(
        i for i in ladder
        if math.floor(st["max"] / i) - math.floor(st["min"] / i) + 1 <= 4
    )
    assert interval == want_iv
    assert got == s.histogram_agg(q, "turn_idx", float(interval))
    assert sum(c for _, c in got) == st["count"]
    assert len(got) <= 4
    # fine target -> finest rung that fits; absent query -> empty
    iv1, b1 = s.auto_date_histogram_agg(q, "turn_idx", 10**6)
    assert iv1 == 1 and len(b1) > 0
    assert s.auto_date_histogram_agg("zzzz_absent", "turn_idx", 4) == \
        (ladder[-1], [])
    with pytest.raises(ValueError):
        s.auto_date_histogram_agg(q, "turn_idx", 0)


def test_top_metrics_and_rank_eval(index_dir, oracle):
    """top_metrics rows == search_by_field head + gathered metrics;
    rank_eval metrics recomputed from the search page and the judgment
    mask."""
    import math

    idx, t = oracle
    s = Searcher(index_dir)
    q = "the a"
    rows = s.top_metrics(q, "turn_idx", ["turn_idx"], size=5)
    head = [(d, v) for d, v in s.search_by_field(q, "turn_idx", "desc", 5)
            if v is not None]
    assert [(d, v) for d, v, _ in rows] == head
    for d, v, m in rows:
        assert m["turn_idx"] == v
    assert s.top_metrics("zzzz_absent", "turn_idx", ["turn_idx"]) == []

    roles = t["role"].to_pylist()
    ev = s.rank_eval(q, {"role": "user"}, k=10)
    hits = s.search(q, k=10)
    rel_ranks = [i for i, (d, _) in enumerate(hits) if roles[d] == "user"]
    n_rel = sum(1 for r in roles if r == "user")
    assert ev["k"] == 10 and ev["n_rel"] == n_rel
    assert ev["rel_at_k"] == len(rel_ranks)
    assert ev["precision"] == pytest.approx(len(rel_ranks) / 10)
    assert ev["recall"] == pytest.approx(len(rel_ranks) / n_rel)
    assert ev["rr"] == pytest.approx(
        1.0 / (rel_ranks[0] + 1) if rel_ranks else 0.0
    )
    assert ev["dcg"] == pytest.approx(
        sum(1.0 / math.log2(i + 2) for i in rel_ranks), abs=1e-12
    )
    idcg = sum(1.0 / math.log2(i + 2) for i in range(min(n_rel, 10)))
    assert ev["ndcg"] == pytest.approx(ev["dcg"] / idcg, abs=1e-12)
    assert ev["err"] == pytest.approx(
        sum(0.5 ** (j + 1) / (i + 1) for j, i in enumerate(rel_ranks)),
        abs=1e-12,
    )
    none = s.rank_eval("zzzz_absent", {"role": "user"}, k=10)
    assert none["rel_at_k"] == 0 and none["rr"] == 0.0 and none["dcg"] == 0.0
    assert none["ndcg"] == 0.0 and none["err"] == 0.0
    with pytest.raises(ValueError):
        s.rank_eval(q, {"role": "user"}, k=0)


def test_profile_search_counters(index_dir, oracle):
    """profile API: hits identical to the normal (cached) search for
    both executors; clause df == corpus df; postings_scanned == sum of
    live clause postings; the absent-term query profiles to zero
    clauses scanned."""
    idx, t = oracle
    s = Searcher(index_dir)
    for algo in ("taat", "wand"):
        for q in ("the a", "w0007"):
            hits, prof = s.profile_search(q, k=10, algo=algo)
            assert hits == s.search(q, k=10, algo=algo), (algo, q)
            assert prof["algo"] == algo
            assert prof["n_clauses"] == len(set(q.split()))
            assert prof["postings_scanned"] == sum(
                c["postings"] for c in prof["clauses"]
            ) > 0
            for c in prof["clauses"]:
                assert c["df"] == idx.df[c["term"]]
            assert set(prof["breakdown_us"]) == \
                {"analyze", "lookup", "execute"}
    hits, prof = s.profile_search("zzzz_absent", k=10)
    assert hits == [] and prof["postings_scanned"] == 0
    assert prof["clauses"] == []
    with pytest.raises(ValueError):
        s.profile_search("the", algo="frob")


def test_field_usage_stats_counters(index_dir):
    """_field_usage_stats: 'text' bumps per analyzed query, keyword /
    numeric fields per agg access, filter fields per filter_mask call
    (cached masks still count); a fresh searcher starts empty."""
    s = Searcher(index_dir)
    assert s.field_usage_stats() == {}
    s.search("the a", k=5)
    u1 = s.field_usage_stats()
    assert u1.get("text", 0) >= 1
    base_role = u1.get("role", 0)
    s.facet_counts("the", "role")
    s.count(role="user")
    s.count(role="user")  # repeated use still counts
    u2 = s.field_usage_stats()
    assert u2["role"] >= base_role + 3
    assert "turn_idx" not in u2
    s.stats_agg("the", "turn_idx")
    assert s.field_usage_stats()["turn_idx"] >= 1
    # monotone: counters only grow, text grew with the extra queries
    assert s.field_usage_stats()["text"] >= u1["text"]


def test_diversified_top_hits_matches_bruteforce(index_dir, oracle):
    """diversified_sampler: per-value rank cutoff over the full BM25
    ranking (missing keys unlimited), recomputed with a dict walk."""
    idx, t = oracle
    s = Searcher(index_dir)
    tools = t["tool"].to_pylist()
    for q, m in [("the a", 1), ("the a", 2), ("w0007 bash", 1)]:
        full = s.search(q, k=10**6)
        kept: dict = {}
        want = []
        for d, sc in full:
            v = tools[d]
            if v is not None:
                if kept.get(v, 0) >= m:
                    continue
                kept[v] = kept.get(v, 0) + 1
            want.append((d, sc))
        got = s.diversified_top_hits(q, "tool", max_per_key=m, k=10)
        assert got == want[:10], (q, m)
    assert s.diversified_top_hits("zzzz_absent", "tool") == []
    with pytest.raises(ValueError):
        s.diversified_top_hits("the", "tool", max_per_key=0)


def test_has_parent_matches_bruteforce(index_dir, oracle):
    """has_parent: children inherit their conv group's has_child-style
    score; order (parent score desc, doc asc); child_where filters the
    returned children only."""
    idx, t = oracle
    s = Searcher(index_dir)
    convs = dict(enumerate(t["conv_id"].to_pylist()))
    roles = dict(enumerate(t["role"].to_pylist()))
    q = "the w0007 bash"
    full = dict(idx.search(q, k=idx.N))
    gmax: dict = {}
    gsum: dict = {}
    gcnt: dict = {}
    for d in sorted(full):
        v = convs[d]
        gmax[v] = max(gmax.get(v, -1e18), full[d])
        gsum[v] = gsum.get(v, 0.0) + full[d]
        gcnt[v] = gcnt.get(v, 0) + 1
    for sm, pick in [("max", gmax),
                     ("sum", gsum),
                     ("avg", {v: gsum[v] / gcnt[v] for v in gsum})]:
        want = sorted(
            ((d, pick[convs[d]], convs[d]) for d in range(idx.N)
             if convs[d] in pick),
            key=lambda r: (-r[1], r[0]),
        )[:10]
        got = s.has_parent_search(q, "conv_id", k=10, score_mode=sm)
        assert [(d, v) for d, _, v in got] == [(d, v) for d, _, v in want], sm
        for (_, a, _), (_, b, _) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9), sm
    # child_where: only docs passing the keyword filter return
    got = s.has_parent_search(q, "conv_id", k=10,
                              child_where={"role": "tool"})
    assert got and all(roles[d] == "tool" for d, _, _ in got)
    # score=False: constant 0, doc-ascending
    flat = s.has_parent_search(q, "conv_id", k=10, score=False)
    assert [sc for _, sc, _ in flat] == [0.0] * len(flat)
    assert [d for d, _, _ in flat] == sorted(d for d, _, _ in flat)
    assert s.has_parent_search("zzzz_absent", "conv_id") == []
    with pytest.raises(ValueError):
        s.has_parent_search(q, "conv_id", score_mode="product")


def test_terms_enum_sorted_paging(index_dir, oracle):
    """terms_enum: term-ascending dictionary paging with dfs; size
    truncates, min_df prunes."""
    idx, _ = oracle
    s = Searcher(index_dir)
    want = sorted(
        (t, df) for t, df in idx.df.items() if t.startswith("w00")
    )
    assert s.terms_enum("w00", size=1 << 20) == want
    assert s.terms_enum("w00", size=3) == want[:3]
    hi = [(t, df) for t, df in want if df >= 3]
    assert s.terms_enum("w00", size=1 << 20, min_df=3) == hi
    assert s.terms_enum("zzzz_absent") == []


def test_t_test_agg_matches_closed_form(index_dir, oracle):
    """t_test: exact integer moments per group; Welch and pooled t match
    the closed form recomputed from the brute-force hit set."""
    import math

    idx, t = oracle
    s = Searcher(index_dir)
    roles = t["role"].to_pylist()
    tix = t["turn_idx"].to_pylist()
    q = "the bash"
    hits = {d for d, _ in idx.search(q, k=idx.N)}
    a = [tix[d] for d in hits if roles[d] == "user"]
    b = [tix[d] for d in hits if roles[d] == "assistant"]
    n1, s1, ss1 = len(a), sum(a), sum(x * x for x in a)
    n2, s2, ss2 = len(b), sum(b), sum(x * x for x in b)
    r = s.t_test_agg(q, "turn_idx", {"role": "user"},
                     {"role": "assistant"})
    assert (r["n_a"], r["sum_a"], r["sum_sq_a"]) == (n1, s1, ss1)
    assert (r["n_b"], r["sum_b"], r["sum_sq_b"]) == (n2, s2, ss2)
    v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))
    v2 = (n2 * ss2 - s2 * s2) / (n2 * (n2 - 1))
    t_w = (s1 / n1 - s2 / n2) / math.sqrt(v1 / n1 + v2 / n2)
    assert r["t"] == pytest.approx(t_w, rel=1e-12)
    sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
    t_p = (s1 / n1 - s2 / n2) / math.sqrt(sp2 * (1 / n1 + 1 / n2))
    rp = s.t_test_agg(q, "turn_idx", {"role": "user"},
                      {"role": "assistant"}, ttype="homoscedastic")
    assert rp["t"] == pytest.approx(t_p, rel=1e-12)
    # degenerate group (< 2 values) -> t None, stats still exact
    r0 = s.t_test_agg("zzzz_absent", "turn_idx",
                      {"role": "user"}, {"role": "assistant"})
    assert r0["t"] is None and r0["n_a"] == 0 and r0["n_b"] == 0
    with pytest.raises(ValueError):
        s.t_test_agg(q, "turn_idx", {}, {}, ttype="paired")


def test_scripted_metric_map_reduce(index_dir, oracle):
    """scripted_metric: per-shard vectorized map + driver reduce computes
    a statistic no built-in agg covers (covariance numerator)."""
    idx, t = oracle
    s = Searcher(index_dir)
    q = "the bash"
    hits = sorted(d for d, _ in idx.search(q, k=idx.N))
    tix = t["turn_idx"].to_pylist()
    xs = hits
    ys = [tix[d] for d in hits]
    want = len(xs) * sum(x * y for x, y in zip(xs, ys)) \
        - sum(xs) * sum(ys)

    def map_script(fields):
        import numpy as np

        x = fields("doc_id").astype(np.int64)
        y = fields("turn_idx").astype(np.int64)
        return (int(x.size), int(x.sum()), int(y.sum()),
                int((x * y).sum()))

    def reduce_script(states):
        n = sum(st[0] for st in states)
        return n * sum(st[3] for st in states) \
            - sum(st[1] for st in states) * sum(st[2] for st in states)

    assert s.scripted_metric(q, map_script, reduce_script) == want
    # empty hit set -> reduce over zero shard states
    assert s.scripted_metric("zzzz_absent", map_script,
                             lambda st: st) == []


def test_sibling_bucket_aggs_unit():
    """sibling pipeline aggs: extremes carry the ES keys ARRAY (ties),
    sums exact, empty parent -> the ES empty-agg shape."""
    from rayfts.search import sibling_bucket_aggs

    agg = sibling_bucket_aggs([(10, 4), (20, 1), (30, 4), (40, 1)])
    assert agg == {"n_buckets": 4, "sum": 10, "min": 1, "max": 4,
                   "min_keys": [20, 40], "max_keys": [10, 30]}
    empty = sibling_bucket_aggs([])
    assert empty["n_buckets"] == 0 and empty["min"] is None \
        and empty["max_keys"] == []


def test_export_slices_partition_hit_set(index_dir, oracle):
    """Sliced scroll: slices are disjoint, their union is exactly the
    unsliced export, and each slice holds doc_id % max == id."""
    from rayfts.export import export_hits

    q = "the w0007 bash"
    full = sorted(
        export_hits(index_dir, q, columns=["turn_idx"])
        .to_pandas()["doc_id"].tolist()
    )
    seen = []
    for i in range(3):
        part = export_hits(index_dir, q, columns=["turn_idx"],
                           slice_id=i, slice_max=3).to_pandas()
        ids = part["doc_id"].tolist()
        assert all(d % 3 == i for d in ids), i
        seen.extend(ids)
    assert sorted(seen) == full
    with pytest.raises(ValueError):
        export_hits(index_dir, q, slice_id=3, slice_max=3)


def test_knn_hybrid_search_sum_rule(index_dir, oracle):
    """Hybrid knn+query: text-only docs keep BM25, vector-only docs get
    boost*sim, overlap docs SUM — verified against the brute-force
    ranking; out-of-range knn ids ignored."""
    idx, _ = oracle
    s = Searcher(index_dir)
    q = "the w0007 bash"
    full = dict(idx.search(q, k=idx.N))
    # deterministic fake ANN results: every 7th doc, sim in (0, 1]
    knn = [(d, ((d * 37) % 100 + 1) / 100.0) for d in range(0, idx.N, 7)]
    boost = 2.5
    scores = dict(full)
    for d, sim in knn:
        scores[d] = scores.get(d, 0.0) + boost * sim
    want = sorted(scores.items(), key=lambda r: (-r[1], r[0]))[:10]
    got = s.knn_hybrid_search(q, knn + [(idx.N + 5, 0.9), (-3, 0.9)],
                              k=10, knn_boost=boost)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)
    # no text hits: pure vector ranking
    vec_only = s.knn_hybrid_search("zzzz_absent", knn[:5], k=5,
                                   knn_boost=1.0)
    assert [d for d, _ in vec_only] == \
        [d for d, _ in sorted(knn[:5], key=lambda r: (-r[1], r[0]))]
    assert s.knn_hybrid_search("zzzz_absent", [], k=5) == []


def test_variable_width_buckets_exact_optimum():
    """DP == exhaustive enumeration of every contiguous k-partition
    (weighted SSE objective) on random small histograms; plus shape
    properties and degenerate cases."""
    from itertools import combinations

    from rayfts.search import variable_width_buckets

    rng = np.random.default_rng(3)

    def sse(vals, w):
        W = w.sum()
        mu = (vals * w).sum() / W
        return (w * (vals - mu) ** 2).sum()

    for trial in range(8):
        m = int(rng.integers(3, 9))
        vals = np.sort(rng.choice(np.arange(0, 50), size=m, replace=False)
                       ).astype(float)
        w = rng.integers(1, 6, size=m).astype(float)
        hist = {float(v): int(c) for v, c in zip(vals, w)}
        for k in range(1, m + 1):
            got = variable_width_buckets(hist, k)
            got_cost = 0.0
            for vmin, vmax, _, _ in got:
                sel = (vals >= vmin) & (vals <= vmax)
                got_cost += sse(vals[sel], w[sel])
            best = min(
                sum(
                    sse(vals[a:b], w[a:b])
                    for a, b in zip((0,) + cuts, cuts + (m,))
                )
                for cuts in combinations(range(1, m), k - 1)
            )
            assert got_cost == pytest.approx(best, abs=1e-9), (trial, k)
            # coverage: counts sum, buckets ordered and disjoint
            assert sum(r[2] for r in got) == int(w.sum())
            for (a, b), (c, d) in zip(
                [(r[0], r[1]) for r in got],
                [(r[0], r[1]) for r in got[1:]],
            ):
                assert b < c
    # k >= distinct values: one bucket per value
    hist = {1.0: 2, 5.0: 1}
    assert variable_width_buckets(hist, 10) == \
        [(1.0, 1.0, 2, 2.0), (5.0, 5.0, 1, 5.0)]
    assert variable_width_buckets({}, 3) == []
    with pytest.raises(ValueError):
        variable_width_buckets(hist, 0)


def test_variable_width_agg_mtermvectors_shards(index_dir, oracle):
    """Searcher surface: variable_width over the hit set consumes the
    exact value histogram; mtermvectors preserves order and raises on
    missing; shards() descriptor is coherent."""
    idx, t = oracle
    s = Searcher(index_dir)
    q = "the bash"
    hits = sorted(d for d, _ in idx.search(q, k=idx.N))
    tix = t["turn_idx"].to_pylist()
    vals = [tix[d] for d in hits]
    rows = s.variable_width_histogram_agg(q, "turn_idx", buckets=3)
    assert sum(r[2] for r in rows) == len(vals)
    assert sum(r[3] for r in rows) == sum(vals)
    assert rows[0][0] == min(vals) and rows[-1][1] == max(vals)
    # mtermvectors == per-doc termvectors, order preserved
    got = s.mtermvectors([5, 2, 9])
    assert [d for d, _ in got] == [5, 2, 9]
    for d, tv in got:
        assert tv == s.termvectors(d)
    with pytest.raises(KeyError):
        s.mtermvectors([0, 10 ** 9])
    sh = s.shards()
    assert len(sh) == 1 and sh[0]["n_docs"] == idx.N \
        and sh[0]["live_docs"] == idx.N


def test_search_similarity_matches_bruteforce(index_dir, oracle):
    """Similarity modules: lmd / classic / boolean recomputed from raw
    token streams (python floats, same op order) — rank + score(1e-9)
    identical; tombstones and unknown names covered."""
    import math

    from collections import Counter

    _, t = oracle
    s = Searcher(index_dir)
    toks = [tokenize(x) for x in t["text"].to_pylist()]
    tfs = [Counter(x) for x in toks]
    dl = [len(x) for x in toks]
    TC = float(sum(dl))
    N = len(toks)
    q = "the w0007 bash"
    q_terms = sorted(set(tokenize(q)))
    df = {w: sum(1 for c in tfs if c[w] > 0) for w in q_terms}
    cf = {w: sum(c[w] for c in tfs) for w in q_terms}
    mu = 2000.0

    def brute(sim):
        rows = []
        for d in range(N):
            m = [w for w in q_terms if tfs[d][w] > 0]
            if not m:
                continue
            if sim == "boolean":
                sc = float(len(m))
            elif sim == "lmd":
                sc = sum(
                    max(0.0, math.log1p(tfs[d][w] * (TC / (mu * cf[w])))
                        + math.log(mu / (dl[d] + mu)))
                    for w in m
                )
            else:
                sc = sum(
                    math.sqrt(tfs[d][w])
                    * (1 + math.log(N / (df[w] + 1.0))) ** 2
                    for w in m
                ) * len(m) / len(q_terms) / math.sqrt(dl[d])
            rows.append((d, sc))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:10]

    for sim in ("lmd", "classic", "boolean"):
        got = s.search_similarity(q, k=10, similarity=sim)
        want = brute(sim)
        assert [d for d, _ in got] == [d for d, _ in want], sim
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9), sim
    assert s.search_similarity("zzzz_absent", similarity="lmd") == []
    with pytest.raises(ValueError):
        s.search_similarity(q, similarity="bm42")


def test_levenshtein_vec_osa_transpositions(index_dir, oracle):
    """OSA (transpositions=True) kernel vs a scalar reference DP on
    random strings, and end-to-end: a transposed vocab word matches at
    one edit only under the ES-default metric."""
    import random

    from rayfts.search import levenshtein_vec

    def osa_ref(a, b):
        m, n = len(a), len(b)
        D = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            D[i][0] = i
        for j in range(n + 1):
            D[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                D[i][j] = min(
                    D[i - 1][j] + 1, D[i][j - 1] + 1,
                    D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
                if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                        and a[i - 2] == b[j - 1]):
                    D[i][j] = min(D[i][j], D[i - 2][j - 2] + 1)
        return D[m][n]

    rng = random.Random(5)
    for _ in range(40):
        q = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
        cands = np.array([
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8)))
            for _ in range(30)
        ])
        got = levenshtein_vec(q, cands, transpositions=True)
        assert got.tolist() == [osa_ref(q, c) for c in cands], q
        # plain stays plain
        got_p = levenshtein_vec(q, cands)
        assert all(a <= b for a, b in zip(got, got_p))
    s = Searcher(index_dir)
    # 'whta' = transposed 'what'-like probe: use a term from the corpus
    # vocabulary ('bash' -> 'absh' transposes the first pair)
    assert s.expand_fuzzy("absh", max_edits=1) == []
    osa = s.expand_fuzzy("absh", max_edits=1, transpositions=True)
    assert ("bash", 1) in osa
    d_plain = s.fuzzy_docs("absh", max_edits=1)
    d_osa = s.fuzzy_docs("absh", max_edits=1, transpositions=True)
    assert d_plain == [] and len(d_osa) > 0


def test_min_score_and_analyze_api(index_dir, oracle):
    """min_score = exact prefix filter of the sorted top-k; _analyze
    returns index-analyzer tokens with stop gaps preserved."""
    idx, _ = oracle
    s = Searcher(index_dir)
    q = "the w0007 bash"
    full = s.search(q, k=10)
    cut = full[4][1]  # 5th score as threshold
    got = s.search_min_score(q, k=10, min_score=cut)
    assert got == [(d, sc) for d, sc in full if sc >= cut]
    assert 1 <= len(got) <= 10
    assert s.search_min_score(q, k=10, min_score=1e9) == []
    # analyze: no stop list on this index -> every token, 0-based slots
    toks = s.analyze("The W0007   bash!")
    assert toks == [("the", 0), ("w0007", 1), ("bash", 2)]


def test_cli_introspection_subcommands(index_dir, capsys):
    """CLI terms-enum / analyze / validate drive the same APIs (read-only
    subcommands — no Ray session of their own)."""
    import json as _json

    from rayfts.cli import main

    assert main(["terms-enum", "--index", index_dir,
                 "--prefix", "w00", "--size", "3"]) == 0
    rows = [_json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    s = Searcher(index_dir)
    assert [(r["term"], r["df"]) for r in rows] == \
        s.terms_enum("w00", size=3)
    assert main(["analyze", "--index", index_dir,
                 "--text", "The w0007 Bash"]) == 0
    assert _json.loads(capsys.readouterr().out) == [
        {"token": "the", "position": 0},
        {"token": "w0007", "position": 1},
        {"token": "bash", "position": 2},
    ]
    assert main(["validate", "--index", index_dir,
                 "--query", "the zzzz_absent"]) == 0
    v = _json.loads(capsys.readouterr().out)
    assert v["valid"] and v["n_clauses"] == 2
    assert ["zzzz_absent", 0, 0] in v["terms"]
    # dsl: the request-body executor from the command line
    assert main(["dsl", "--index", index_dir, "--body",
                 '{"query": {"match": {"text": "the w0007"}},'
                 ' "size": 3,'
                 ' "aggs": {"r": {"terms": {"field": "role"}}}}']) == 0
    out = _json.loads(capsys.readouterr().out)
    s2 = Searcher(index_dir)
    assert [(h["_id"], h["_score"]) for h in out["hits"]["hits"]] == \
        s2.search("the w0007", k=3)
    assert [tuple(r) for r in out["aggregations"]["r"]] == \
        s2.facet_counts("the w0007", "role")


def test_rrf_search_fuse_semantics(index_dir, oracle):
    """RRF: fused == 1/(K+r_bm25) + 1/(K+r_knn) recomputed from the two
    rankings; ranks are spent (not renumbered) by dropped knn ids;
    text-only and knn-only docs both surface."""
    s = Searcher(index_dir)
    q = "the w0007"
    window, K = 25, 60
    bm25 = s.search(q, k=window)
    knn = [d for d, _ in s.search("bash", k=10)] + [s.N + 9]
    got = dict(s.rrf_search(q, knn, k=1000, rank_window=window, rrf_k=K))
    want: dict = {}
    for r, (d, _) in enumerate(bm25, 1):
        want[d] = want.get(d, 0.0) + 1.0 / (K + r)
    for r, d in enumerate(knn[:window], 1):
        if 0 <= d < s.N:   # invalid id SPENDS rank r
            want[d] = want.get(d, 0.0) + 1.0 / (K + r)
    assert got == want
    # both-list docs beat single-list docs at comparable ranks
    both = [d for d in want if d in dict(bm25) and d in set(knn)]
    if both:
        assert got[both[0]] > 1.0 / (K + window)
    assert s.rrf_search(q, [], k=5) == [
        (d, 1.0 / (K + r)) for r, (d, _) in enumerate(bm25[:5], 1)
    ]
    assert s.rrf_search(q, knn, k=0) == []
    with pytest.raises(ValueError):
        s.rrf_search(q, knn, rrf_k=-1)


def test_linear_retriever_fuse_semantics(index_dir, oracle):
    """Linear retriever: combined == weighted sum of independently
    minmax-normalized lists recomputed by hand; degenerate single-item
    list normalizes to 1.0; normalizer='none' keeps raw scores."""
    s = Searcher(index_dir)
    q = "the w0007"
    window = 25
    bm25 = s.search(q, k=window)
    knn = [(d, 0.5 + 0.01 * i) for i, (d, _) in
           enumerate(s.search("bash", k=8))]
    got = dict(s.linear_retriever_search(
        q, knn, k=1000, rank_window=window,
        text_weight=1.0, knn_weight=2.0,
    ))
    lo = min(sc for _, sc in bm25)
    hi = max(sc for _, sc in bm25)
    tn = {d: (sc - lo) / (hi - lo) for d, sc in bm25}
    klo = min(sc for _, sc in knn)
    khi = max(sc for _, sc in knn)
    kn = {d: (sc - klo) / (khi - klo) for d, sc in knn}
    want = {
        d: 1.0 * tn.get(d, 0.0) + 2.0 * kn.get(d, 0.0)
        for d in set(tn) | set(kn)
    }
    assert got == want
    # degenerate: one knn hit -> normalized 1.0
    one = dict(s.linear_retriever_search(q, [(3, 0.42)], k=1000,
                                         rank_window=window))
    assert one[3] == 1.0 * tn.get(3, 0.0) + 1.0
    # none normalizer keeps raw scores
    raw = dict(s.linear_retriever_search(
        q, knn, k=1000, rank_window=window, normalizer="none"
    ))
    want_raw = {
        d: dict(bm25).get(d, 0.0) + dict(knn).get(d, 0.0)
        for d in set(tn) | set(kn)
    }
    assert raw == want_raw
    with pytest.raises(ValueError):
        s.linear_retriever_search(q, knn, normalizer="zscore")


def test_new_aggs_match_bruteforce(index_dir, oracle):
    """Round-5 agg additions against direct recomputation: global
    (query-scope escape), sampler (terms inside the top-N sample),
    date_range (ISO boundaries on an epoch field), normalize
    (percent_of_sum)."""
    import math

    from rayfts.search import normalize_aggs

    idx, t = oracle
    s = Searcher(index_dir)
    q = "the w0007"
    hits = {d for d, _ in idx.search(q, k=10**6)}
    # global: n_hits is query-scoped, the rest whole-corpus
    g = s.global_stats_agg(q, "turn_idx")
    turn = t["turn_idx"].to_pylist()
    assert g == {
        "n_hits": len(hits), "n_global": s.N, "n_field": s.N,
        "sum_field": float(sum(turn)),
    }
    # sampler: top-shard_size sample then role counts
    roles = t["role"].to_pylist()
    for shard in (7, 40):
        sample = [d for d, _ in idx.search(q, k=shard)]
        want: dict = {}
        for d in sample:
            want[roles[d]] = want.get(roles[d], 0) + 1
        rows = sorted(want.items(), key=lambda r: (-r[1], r[0]))
        assert s.sampler_terms_agg(q, "role", shard, 10) == rows, shard
    assert s.sampler_terms_agg("zzzz_absent", "role") == []
    # date_range on turn_idx-as-epoch: 1970-01-02 == 86400 s
    got = s.date_range_agg(
        q, "turn_idx", [(None, "1970-01-02"), ("1970-01-01", None)]
    )
    n_all = len(hits)  # every turn_idx < 86400 and >= 0
    assert got == [("*-1970-01-02", n_all), ("1970-01-01-*", n_all)]
    # normalize: shares of the month histogram sum to ~100%
    buckets = [("a", 3), ("b", 1)]
    assert normalize_aggs(buckets) == [
        ("a", 3, int(math.floor(75e6 + 0.5))),
        ("b", 1, int(math.floor(25e6 + 0.5))),
    ]
    assert normalize_aggs([]) == []
    assert normalize_aggs([("a", 0)]) == []


def test_match_fuzzy_matches_composition(index_dir, oracle):
    """Scored fuzzy match: max_edits=0 degrades to the plain match
    query exactly; for an OOV token the blended score equals the sum of
    0.5 * single-term BM25 over the OSA-1 expansion set."""
    s = Searcher(index_dir)
    for q in ("the w0007", "bash"):
        assert s.match_fuzzy(q, k=30, max_edits=0) == s.search(q, k=30)
    exp = s.expand_fuzzy("teh", 1, transpositions=True)
    assert exp  # 'the' is an OSA-1 transposition neighbor of 'teh'
    want: dict = {}
    for term, ed in exp:
        w = (2 - ed) / 2.0
        for d, sc in s.search(term, k=10**6):
            want[d] = want.get(d, 0.0) + w * sc
    got = s.match_fuzzy("teh", k=10**6, max_edits=1)
    assert sorted(d for d, _ in got) == sorted(want)
    for d, sc in got:
        assert sc == pytest.approx(want[d], abs=1e-12)
    assert s.match_fuzzy("zzqqzzqq", k=10) == []  # no neighbors at 1


def test_cumulative_cardinality_and_template(index_dir, oracle):
    """cumulative_cardinality: single-bucket case == (n_hits, distinct
    roles among hits); render_search_template: mustache substitution
    incl. the missing-param empty rule."""
    import pyarrow.dataset as pads

    from rayfts.search import render_search_template

    idx, t = oracle
    s = Searcher(index_dir)
    q = "the w0007"
    hits = {d for d, _ in idx.search(q, k=10**6)}
    roles = t["role"].to_pylist()
    rows = s.cumulative_cardinality_agg(q, "turn_idx", "role", "minute")
    assert rows == [(0, len(hits), len({roles[d] for d in hits}))]
    assert s.cumulative_cardinality_agg("zzzz_absent", "turn_idx",
                                        "role") == []
    with pytest.raises(ValueError):
        s.cumulative_cardinality_agg(q, "turn_idx", "role", "fortnight")
    assert render_search_template(
        "{{a}} x {{ b }} {{missing}}!", {"a": "one", "b": 2}
    ) == "one x 2 !"
    # template render + search == direct search
    assert s.search(render_search_template("{{q}}", {"q": q}), k=10) == \
        s.search(q, k=10)


def test_moving_percentiles_matches_numpy():
    """moving_percentiles over a pinned bucket series == trailing-frame
    numpy linear-interpolation percentiles (incl. short head frames)."""
    from rayfts.search import moving_percentiles_aggs

    buckets = [(0, 5), (1, 1), (2, 9), (3, 4), (4, 4), (5, 100)]
    rows = moving_percentiles_aggs(buckets, window=3,
                                   percents=(25.0, 50.0, 90.0))
    counts = [c for _, c in buckets]
    for i, r in enumerate(rows):
        frame = counts[max(0, i - 2): i + 1]
        want = np.percentile(np.asarray(frame, float),
                             [25.0, 50.0, 90.0], method="linear")
        assert r[0] == buckets[i][0] and r[1] == buckets[i][1]
        for got, w in zip(r[2:], want):
            assert got == pytest.approx(w, abs=1e-12), (i, r)
    with pytest.raises(ValueError):
        moving_percentiles_aggs(buckets, window=0)


def test_runtime_fields_match_direct_columns(index_dir, oracle):
    """Runtime fields: the derived column equals hand-computed values
    through stats/range/sort; division marks zero denominators invalid;
    unknown ops refuse."""
    idx, t = oracle
    s = Searcher(index_dir)
    q = "the w0007"
    s.define_runtime_field(
        "rt", {"op": "+", "a": {"op": "*", "b": 2,
                                "a": {"col": "turn_idx"}}, "b": 1})
    hits = {d for d, _ in idx.search(q, k=10**6)}
    turn = t["turn_idx"].to_pylist()
    st = s.stats_agg(q, "rt")
    want = [turn[d] * 2 + 1 for d in hits]
    assert st == {"count": len(want), "min": float(min(want)),
                  "max": float(max(want)), "sum": float(sum(want))}
    rng = s.range_agg(q, "rt", [(None, 5), (5, None)])
    assert rng == [("*-5", sum(1 for v in want if v < 5)),
                   ("5-*", sum(1 for v in want if v >= 5))]
    # identity against the direct column
    s.define_runtime_field("same", {"col": "turn_idx"})
    assert s.stats_agg(q, "same") == s.stats_agg(q, "turn_idx")
    # zero denominators drop from the agg (validity), like nulls
    s.define_runtime_field(
        "inv", {"op": "/", "a": 1, "b": {"col": "turn_idx"}})
    st = s.stats_agg(q, "inv")
    nz = [1.0 / turn[d] for d in hits if turn[d] != 0]
    assert st["count"] == len(nz)
    assert st["sum"] == pytest.approx(sum(sorted(nz)), rel=1e-12)
    with pytest.raises(ValueError, match="runtime field op"):
        s.define_runtime_field("bad", {"op": "^", "a": 1, "b": 2})
        s.stats_agg(q, "bad")


def test_rate_buckets_calendar_lengths():
    """rate: true calendar month/year lengths in the denominator (leap
    February included), floor(x+0.5) e6 rounding, week/day fixed."""
    import math

    from rayfts.search import rate_buckets

    feb24 = 1706745600   # 2024-02-01 (leap: 29 days)
    mar24 = 1709251200   # 2024-03-01 (31 days)
    rows = rate_buckets([(feb24, 58), (mar24, 62)], "month", "day")
    assert rows == [
        (feb24, 58, 29, 2_000_000),
        (mar24, 62, 31, int(math.floor(62 * 1e6 / 31 + 0.5))),
    ]
    y24 = 1704067200     # 2024-01-01 (leap year: 366 days)
    assert rate_buckets([(y24, 366)], "year", "day") == \
        [(y24, 366, 366, 1_000_000)]
    wk = 1704672000      # 2024-01-08, a Monday
    assert rate_buckets([(wk, 7)], "week", "day") == \
        [(wk, 7, 7, 1_000_000)]
    assert rate_buckets([(wk, 48)], "day", "hour") == \
        [(wk, 48, 24, 2_000_000)]
    assert rate_buckets([], "month", "day") == []
    with pytest.raises(ValueError):
        rate_buckets([(wk, 1)], "month", "fortnight")
    with pytest.raises(ValueError):
        rate_buckets([(wk, 1)], "quarter", "day")


def test_bucket_correlation_matches_numpy():
    """bucket_correlation == np.corrcoef on the union-aligned series;
    missing buckets count 0; constant side -> None."""
    from rayfts.search import bucket_correlation

    a = [(1, 3), (2, 5), (4, 9)]
    b = [(1, 2), (3, 7), (4, 4)]
    keys = [1, 2, 3, 4]
    x = np.array([3, 5, 0, 9], float)
    y = np.array([2, 0, 7, 4], float)
    n, corr_e6 = bucket_correlation(a, b)
    assert n == len(keys)
    want = np.corrcoef(x, y)[0, 1]
    assert abs(corr_e6 / 1e6 - want) < 1e-6
    assert bucket_correlation([(1, 2), (2, 2)], [(1, 1), (2, 9)])[1] is None
    assert bucket_correlation([], []) == (0, None)
    # perfect correlation is exactly 1.0
    assert bucket_correlation([(1, 1), (2, 2)], [(1, 10), (2, 20)]) \
        == (2, 1_000_000)


def test_change_point_mean_shift():
    """change_point finds a planted level shift; ties break to the
    smallest prefix; < 2 buckets -> None."""
    import math

    from rayfts.search import change_point

    series = [(10, 5), (20, 5), (30, 5), (40, 50), (50, 50)]
    key, t, stat_e6 = change_point(series)
    assert (key, t) == (40, 3)       # split right before the jump
    n, tot, p = 5, 115, 15
    want = abs(p / 3 - (tot - p) / 2) * math.sqrt(3 * 2 / 5)
    assert stat_e6 == int(math.floor(want * 1e6 + 0.5))
    # symmetric series: both splits tie -> smallest t wins
    assert change_point([(1, 1), (2, 2), (3, 1)])[1] == 1
    assert change_point([(1, 1)]) is None


def test_sparse_vector_matches_bruteforce(index_dir, oracle):
    """sparse_vector == the plain Σ w_t · tf(d,t) recompute over the
    oracle's term frequencies; order (score desc, doc asc)."""
    idx, _ = oracle
    s = Searcher(index_dir)
    w = {"the": 2.0, "w0007": 1.5, "bash": 1.0, "zz_none": 7.0}
    got = s.sparse_vector_search(w, k=15)
    want = {}
    for d, toks in idx.doc_tfs.items():
        sc = sum(wt * toks.get(t, 0) for t, wt in w.items())
        if sc > 0:
            want[d] = sc
    top = sorted(want.items(), key=lambda e: (-e[1], e[0]))[:15]
    assert [(d, pytest.approx(sc)) for d, sc in top] == got


def test_bucket_count_ks_test_bruteforce():
    """KS statistic == max CDF gap on union-aligned series; identical
    series -> 0; disjoint series -> 1; empty side -> None."""
    from rayfts.search import bucket_count_ks_test

    a = [(1, 4), (2, 4), (3, 2)]
    n, ks = bucket_count_ks_test(a, a)
    assert (n, ks) == (3, 0)
    n, ks = bucket_count_ks_test([(1, 5)], [(9, 5)])
    assert (n, ks) == (2, 1_000_000)
    a = [(1, 1), (2, 3)]
    b = [(1, 3), (2, 1)]
    # cdfs: a = .25, 1 ; b = .75, 1 -> max gap .5
    assert bucket_count_ks_test(a, b) == (2, 500_000)
    assert bucket_count_ks_test([], [(1, 1)]) == (1, None)
    assert bucket_count_ks_test([(1, 0)], [(1, 1)])[1] is None


def test_script_score_search_semantics(index_dir):
    """script_score: expression over numeric cols + _score recomputed
    per hit; null-column docs drop; negative scripts raise; constant
    script = constant score with doc-asc order."""
    s = Searcher(index_dir)
    q = "the w0007"
    base = dict(s.search(q, k=s.N))
    expr = {"op": "+", "a": {"op": "*", "a": {"col": "_score"}, "b": 2},
            "b": {"op": "/", "a": {"col": "turn_idx"}, "b": 10}}
    got = s.script_score_search(q, expr, k=8)
    ti, tok = s._numeric_col("turn_idx")
    want = sorted(
        ((d, 2 * sc + ti[d] / 10) for d, sc in base.items() if tok[d]),
        key=lambda e: (-e[1], e[0]),
    )[:8]
    assert [(d, pytest.approx(v)) for d, v in want] == got
    # negative script refuses (the ES contract)
    with pytest.raises(ValueError, match="negative"):
        s.script_score_search(q, {"op": "-", "a": 0, "b": 1}, k=3)
    # constant script: every hit scores the constant, doc-asc
    const = s.script_score_search(q, 1.5, k=5)
    hits_sorted = sorted(base)[:5]
    assert const == [(d, 1.5) for d in hits_sorted]


def test_rrf_multi_search_generalizes_two_leg(index_dir):
    """N-leg rrf: with the same two legs it equals rrf_search exactly;
    a third leg adds its reciprocal contributions; tombstoned /
    out-of-range ids spend their rank without renumbering."""
    s = Searcher(index_dir)
    q = "the w0007"
    W = 20
    bm25 = [d for d, _ in s.search(q, k=W)]
    knn = list(range(0, 40, 2))
    two = s.rrf_search(q, knn, k=10, rank_window=W, rrf_k=60)
    multi = s.rrf_multi_search([bm25, knn[:W]], k=10, rrf_k=60)
    assert multi == two
    # third leg shifts scores by exactly its contributions
    leg3 = [d for d, _ in s.search_by_field(q, "turn_idx",
                                            order="desc", k=W)]
    three = dict(s.rrf_multi_search([bm25, knn[:W], leg3], k=s.N,
                                    rrf_k=60))
    base = dict(s.rrf_multi_search([bm25, knn[:W]], k=s.N, rrf_k=60))
    for r, d in enumerate(leg3, 1):
        assert three[d] == pytest.approx(
            base.get(d, 0.0) + 1.0 / (60 + r))
    # out-of-range ids contribute nothing but spend their rank
    spent = s.rrf_multi_search([[10**9, bm25[0]]], k=5, rrf_k=60)
    assert spent[0] == (bm25[0], pytest.approx(1.0 / 62))


def test_random_sampler_matches_bruteforce(index_dir, oracle):
    """random_sampler == the md5-rule recompute over the brute-force hit
    set; probability=1.0 degenerates to the plain terms agg over every
    hit; invalid probability raises."""
    import hashlib as _hl

    idx, t = oracle
    s = Searcher(index_dir)
    roles = t["role"].to_pylist()
    for q in ["the a", "w0007 bash"]:
        hits = sorted(d for d, _ in idx.search(q, k=10**6))
        for p, seed in [(0.5, 7), (0.25, 0)]:
            thresh = int(p * 4294967296.0)
            sample = [
                d for d in hits
                if int(_hl.md5(f"{seed}:{d}".encode()).hexdigest()[:8],
                       16) < thresh
            ]
            want: dict = {}
            for d in sample:
                want[roles[d]] = want.get(roles[d], 0) + 1
            rows = sorted(want.items(), key=lambda r: (-r[1], r[0]))
            got_n, got_rows = s.random_sampler_terms_agg(
                q, "role", probability=p, seed=seed, size=10)
            assert got_n == len(sample), (q, p)
            assert got_rows == rows, (q, p)
        n1, rows1 = s.random_sampler_terms_agg(q, "role", probability=1.0)
        assert n1 == len(hits)
        assert rows1 == s.facet_counts(q, "role", size=10)
    assert s.random_sampler_terms_agg("zzzz_absent", "role") == (0, [])
    with pytest.raises(ValueError):
        s.random_sampler_terms_agg("the", "role", probability=0.0)
    with pytest.raises(ValueError):
        s.random_sampler_terms_agg("the", "role", probability=1.5)


def test_percentiles_bucket_aggs():
    """percentiles_bucket: quantile_cont rule over bucket counts; empty
    parent -> the ES null shape."""
    from rayfts.search import percentiles_bucket_aggs

    buckets = [("a", 1), ("b", 2), ("c", 3), ("d", 10)]
    pr = percentiles_bucket_aggs(buckets, (0.0, 50.0, 100.0))
    assert pr[0.0] == 1.0 and pr[100.0] == 10.0
    assert pr[50.0] == 2.5  # linear interpolation between 2 and 3
    # quartile grid: rank 0.25*(n-1) = 0.75 -> 1 + 0.75*(2-1)
    pr = percentiles_bucket_aggs(buckets, (25.0,))
    assert pr[25.0] == 1.75
    assert percentiles_bucket_aggs([], (50.0,)) == {}


def test_children_terms_agg_matches_bruteforce(index_dir, oracle):
    """children agg == two-hop recompute over the brute-force hit set:
    matched parents -> all their docs -> field histogram."""
    idx, t = oracle
    s = Searcher(index_dir)
    tools = t["tool"].to_pylist()
    roles = t["role"].to_pylist()
    for q in ["the a", "w0007 bash"]:
        hits = {d for d, _ in idx.search(q, k=10**6)}
        parents = {tools[d] for d in hits if tools[d] is not None}
        kids = [d for d in range(len(tools)) if tools[d] in parents]
        want: dict = {}
        for d in kids:
            if roles[d] is not None:
                want[roles[d]] = want.get(roles[d], 0) + 1
        rows = sorted(want.items(), key=lambda r: (-r[1], r[0]))
        got_n, got_rows = s.children_terms_agg(q, "tool", "role", size=10)
        assert got_n == len(kids), q
        assert got_rows == rows, q
    assert s.children_terms_agg("zzzz_absent", "tool", "role") == (0, [])
