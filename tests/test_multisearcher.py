"""Segment-sharded search must be EXACTLY equivalent to one global index.

This pins the 10^12-scale query architecture: per-segment searchers with
merged global statistics produce rank- AND score-identical top-k vs a
single index over the union corpus.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.fixtures import REFERENCE_QUERIES, generate_transcripts
from rayfts.search import MultiSearcher, Searcher


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    import ray.data as rd

    root = tmp_path_factory.mktemp("multi")
    t = generate_transcripts(40, seed=42)
    # split by conv range so segment order matches global (conv_id) order
    cut = "conv-0000020"
    a = t.filter(pc.less(t["conv_id"], cut))
    b = t.filter(pc.greater_equal(t["conv_id"], cut))
    dirs = {}
    for name, tbl in [("full", t), ("a", a), ("b", b)]:
        d = str(root / name)
        build_index(
            rd.from_arrow(tbl), cfg=IndexJobConfig(index_dir=d, term_buckets=4)
        )
        dirs[name] = d
    return dirs


def test_sharded_equals_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    assert multi.N == single.N
    assert abs(multi.avgdl - single.avgdl) < 1e-12
    for q in REFERENCE_QUERIES + ["the a to ok", "w0001 w0002 bash"]:
        s_hits = single.search(q, k=25)
        m_hits = multi.search(q, k=25)
        assert [d for d, _ in m_hits] == [d for d, _ in s_hits], q
        for (d1, s1), (d2, s2) in zip(m_hits, s_hits):
            assert abs(s1 - s2) < 1e-12, (q, d1, s1, s2)
        # per-segment block-max WAND with global weights merges to the
        # SAME top-k (bit-identical scores) as the global index
        w_hits = multi.search(q, k=25, algo="wand")
        assert w_hits == m_hits, q


def test_sharded_facets_equal_global(indexes):
    """Sharded terms-agg sums untruncated per-segment histograms — exact
    vs the global index (no shard_size approximation)."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in REFERENCE_QUERIES + ["the a to ok", "zzz_absent"]:
        for field in ("role", "tool"):
            assert multi.facet_counts(q, field, size=50) == single.facet_counts(
                q, field, size=50
            ), (q, field)
    assert multi.facet_counts(
        "the", "tool", where={"role": "tool"}, size=50
    ) == single.facet_counts("the", "tool", where={"role": "tool"}, size=50)


def test_sharded_collapse_equals_global(indexes):
    """Groups span segments; the per-segment untruncated best-merge must
    equal the single-index collapse bit-for-bit."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in REFERENCE_QUERIES + ["the a to ok"]:
        for field in ("role", "tool"):
            s_rows = single.search_collapse(q, field, k=20)
            m_rows = multi.search_collapse(q, field, k=20)
            assert [(d, v) for d, _, v in m_rows] == \
                [(d, v) for d, _, v in s_rows], (q, field)
            for (_, a, _), (_, b, _) in zip(m_rows, s_rows):
                assert abs(a - b) < 1e-12, (q, field)


def test_sharded_range_filters_missing_equal_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    q = "the w0007"
    ranges = [(None, 2), (2, 5), (5, None)]
    assert multi.range_agg(q, "turn_idx", ranges) == \
        single.range_agg(q, "turn_idx", ranges)
    flt = {"users": {"role": "user"}, "tools": {"role": "tool"}}
    assert multi.filters_agg(q, flt) == single.filters_agg(q, flt)
    assert multi.missing_agg(q, "tool") == single.missing_agg(q, "tool")
    assert multi.extended_stats_agg(q, "turn_idx") == \
        single.extended_stats_agg(q, "turn_idx")
    assert multi.weighted_avg_agg(q, "turn_idx", "turn_idx") == \
        single.weighted_avg_agg(q, "turn_idx", "turn_idx")
    for d in (0, 5, single.N - 1):
        assert multi.termvectors(d) == single.termvectors(d)
    # has_child: parents span segments; scores equal within float merge
    for sm in ("max", "sum", "avg", "none"):
        s_rows = single.has_child_search(q, "conv_id", k=30, score_mode=sm)
        m_rows = multi.has_child_search(q, "conv_id", k=30, score_mode=sm)
        assert [(v, n) for v, _, n in m_rows] == \
            [(v, n) for v, _, n in s_rows], sm
        for (_, a, _), (_, b, _) in zip(m_rows, s_rows):
            assert a == pytest.approx(b, abs=1e-12), sm
    # composite + significant_terms: sharded == single
    pages_s = single.composite_agg(q, "role", size=2)
    assert multi.composite_agg(q, "role", size=2) == pages_s
    # two-source composite: sharded pages == single, incl. the cursor
    p2s = single.composite_date_terms_agg(q, "turn_idx", "year", "role",
                                          size=2)
    assert multi.composite_date_terms_agg(
        q, "turn_idx", "year", "role", size=2) == p2s
    if p2s:
        ak2 = p2s[-1][0]
        assert multi.composite_date_terms_agg(
            q, "turn_idx", "year", "role", size=2, after_key=ak2) == \
            single.composite_date_terms_agg(
                q, "turn_idx", "year", "role", size=2, after_key=ak2)
    if pages_s:
        ak = pages_s[-1][0]
        assert multi.composite_agg(q, "role", size=2, after_key=ak) == \
            single.composite_agg(q, "role", size=2, after_key=ak)
    s_sig = single.significant_terms(q, size=10)
    m_sig = multi.significant_terms(q, size=10)
    assert [(t, f, d) for t, f, d, _ in m_sig] == \
        [(t, f, d) for t, f, d, _ in s_sig]
    for (*_, a), (*_, b) in zip(m_sig, s_sig):
        assert a == pytest.approx(b, rel=1e-12)
    s_ih = single.has_child_search(q, "conv_id", k=5, inner_hits=3)
    m_ih = multi.has_child_search(q, "conv_id", k=5, inner_hits=3)
    for (v1, _, n1, k1), (v2, _, n2, k2) in zip(s_ih, m_ih):
        assert (v1, n1) == (v2, n2)
        assert [d for d, _ in k1] == [d for d, _ in k2]
        for (_, a), (_, b) in zip(k1, k2):
            assert a == pytest.approx(b, abs=1e-12)


def test_sharded_multiget_routing(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    ids = [0, single.N - 1, 5]
    got = multi.get_by_global_doc_id(ids)
    exp = single.get_by_doc_id(ids)
    assert got["conv_id"].to_pylist() == exp["conv_id"].to_pylist()
    assert got["text"].to_pylist() == exp["text"].to_pylist()
    with pytest.raises(KeyError):
        multi.get_by_global_doc_id([10**9])


def test_sharded_over_shared_segments_identical(indexes):
    """MultiSearcher over SharedIndexHandle segments (zero-copy decode-once
    path) must be bit-identical to the file-based sharded searcher and to
    the single global index — both executors (round-2 verdict item 7)."""
    from rayfts.search import SharedIndexHandle

    single = Searcher(indexes["full"])
    shared = MultiSearcher(
        [SharedIndexHandle(indexes["a"]), SharedIndexHandle(indexes["b"])]
    )
    for q in REFERENCE_QUERIES + ["the a to ok", "w0001 w0002 bash"]:
        s_hits = single.search(q, k=25)
        assert shared.search(q, k=25) == s_hits or [
            (d, round(s, 12)) for d, s in shared.search(q, k=25)
        ] == [(d, round(s, 12)) for d, s in s_hits], q
        m = shared.search(q, k=25)
        assert [d for d, _ in m] == [d for d, _ in s_hits], q
        for (d1, s1), (d2, s2) in zip(m, s_hits):
            assert abs(s1 - s2) < 1e-12, (q, d1, s1, s2)
        assert shared.search(q, k=25, algo="wand") == m, q
    # multiget routes through the shared segments' docstores too
    ids = [0, single.N - 1, 5]
    got = shared.get_by_global_doc_id(ids)
    assert got["text"].to_pylist() == single.get_by_doc_id(ids)["text"].to_pylist()


def test_build_segments_api(tmp_path_factory):
    """segments.build_segments + open_multisearcher: the packaged multi-node
    composition is bit-identical to one global index, verifies disjoint
    key ranges, and serves the shared zero-copy path."""
    import ray.data as rd

    from rayfts.segments import build_segments, open_multisearcher

    root = str(tmp_path_factory.mktemp("segroot"))
    t = generate_transcripts(40, seed=42)
    cut1, cut2 = "conv-0000014", "conv-0000028"
    parts = [
        t.filter(pc.less(t["conv_id"], cut1)),
        t.filter(
            pc.and_(
                pc.greater_equal(t["conv_id"], cut1), pc.less(t["conv_id"], cut2)
            )
        ),
        t.filter(pc.greater_equal(t["conv_id"], cut2)),
    ]
    full_dir = str(tmp_path_factory.mktemp("segfull"))
    build_index(
        rd.from_arrow(t), cfg=IndexJobConfig(index_dir=full_dir, term_buckets=4)
    )
    dirs = build_segments(
        [rd.from_arrow(p) for p in parts],
        root,
        cfg=IndexJobConfig(term_buckets=4),
    )
    assert len(dirs) == 3
    single = Searcher(full_dir)
    for shared in (False, True):
        ms = open_multisearcher(root, shared=shared)
        assert ms.N == single.N
        for q in REFERENCE_QUERIES + ["the a to ok"]:
            assert ms.search(q, k=20) == single.search(q, k=20), (q, shared)

    # overlapping segment inputs must raise (W2 invariant at segment level)
    import pytest as _pt

    with _pt.raises(ValueError, match="overlap"):
        build_segments(
            [rd.from_arrow(parts[1]), rd.from_arrow(parts[0])],
            str(tmp_path_factory.mktemp("segbad")),
            cfg=IndexJobConfig(term_buckets=4),
        )


def test_sharded_pagination_equals_global(indexes):
    """offset and search_after distribute across segments: the global
    cursor is rebased per segment (disjoint doc ranges + global scores),
    per-segment after-page top-k heads merge to exactly the single-index
    page — both executors."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in REFERENCE_QUERIES + ["the a to ok"]:
        full = single.search(q, k=10**6)
        if not full:
            assert multi.search(q, k=10, offset=3) == []
            continue
        for algo in ("taat", "wand"):
            for off in (0, 5, 17, len(full)):
                assert multi.search(q, k=10, algo=algo, offset=off) == \
                    full[off:off + 10], (q, algo, off)
            cursor = full[min(9, len(full) - 1)]
            got = multi.search(q, k=10, algo=algo, search_after=cursor)
            want = single.search(q, k=10, search_after=cursor)
            assert got == want, (q, algo)


def test_sharded_aggs_equal_global(indexes):
    """stats/histogram aggregations merge exactly across segments:
    count/min/max/sum are associative; histogram bucket keys are global
    constants. turn_idx sums are integer-valued, so the float64 partial
    sums are exact and the merge is bit-identical to the global index."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in REFERENCE_QUERIES + ["the a to ok", "zzzz_absent"]:
        assert multi.stats_agg(q, "turn_idx") == \
            single.stats_agg(q, "turn_idx"), q
        assert multi.histogram_agg(q, "turn_idx", 3.0) == \
            single.histogram_agg(q, "turn_idx", 3.0), q
    got = multi.stats_agg("the", "turn_idx", where={"role": "user"})
    want = single.stats_agg("the", "turn_idx", where={"role": "user"})
    assert got == want


def test_sharded_function_score_equals_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a w0007", "bash w0001", "zzzz_absent"]:
        for mod in ("log1p", "sqrt"):
            assert multi.function_score(q, "turn_idx", k=10, modifier=mod) \
                == single.function_score(q, "turn_idx", k=10, modifier=mod), \
                (q, mod)


def test_sharded_facet_top_hits_equals_global(indexes):
    """top_hits heads merge bit-identically: global bucket selection +
    per-segment global-weight scoring == the single-index sub-agg."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a w0007", "bash w0001", "zzzz_absent"]:
        assert multi.facet_top_hits(q, "role", size=3, top_n=3) == \
            single.facet_top_hits(q, "role", size=3, top_n=3), q


def test_sharded_search_by_field_equals_global(indexes):
    """Sort-by-field merges raw column values (globally comparable);
    numeric and keyword-with-nulls pages match the global index."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a w0007", "bash", "zzzz_absent"]:
        for field, order in (("turn_idx", "desc"), ("turn_idx", "asc"),
                             ("tool", "asc")):
            assert multi.search_by_field(q, field, order, k=15) == \
                single.search_by_field(q, field, order, k=15), (q, field)


def test_sharded_min_should_match_equals_global(indexes):
    """msm distributes per segment (a doc's matched terms all live in its
    owning segment), bit-identical to the global index on both executors."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a w0007", "the a to ok"]:
        for m in (2, 3):
            want = single.search(q, k=10, min_should_match=m)
            assert multi.search(q, k=10, min_should_match=m) == want, (q, m)
            assert multi.search(
                q, k=10, algo="wand", min_should_match=m
            ) == want, (q, m)


def test_sharded_cardinality_percentiles_datehist_equal_global(indexes):
    """cardinality (distinct-value-set union), percentiles (sorted merge
    of disjoint per-segment hit values) and date_histogram (global
    calendar bucket keys) all merge exactly across segments."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in REFERENCE_QUERIES + ["the a to ok", "zzzz_absent"]:
        assert multi.cardinality_agg(q, "role") == \
            single.cardinality_agg(q, "role"), q
        assert multi.percentiles_agg(q, "turn_idx") == \
            single.percentiles_agg(q, "turn_idx"), q
        assert multi.date_histogram_agg(q, "turn_idx", "minute") == \
            single.date_histogram_agg(q, "turn_idx", "minute"), q


def test_sharded_feature_queries_equal_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a w0007", "bash w0001", "zzzz_absent"]:
        assert multi.rank_feature(q, "turn_idx", pivot=2.0, k=10,
                                  boost=1.5) == \
            single.rank_feature(q, "turn_idx", pivot=2.0, k=10,
                                boost=1.5), q
        assert multi.distance_feature(q, "turn_idx", origin=3.0,
                                      pivot=1.0, k=10, boost=2.0) == \
            single.distance_feature(q, "turn_idx", origin=3.0,
                                    pivot=1.0, k=10, boost=2.0), q


def test_sharded_match_bool_prefix_and_pinned_equal_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the w00", "bash w0007 ed", "w00", "zzzz_absent qq"]:
        assert multi.match_bool_prefix(q, k=10) == \
            single.match_bool_prefix(q, k=10), q
    organic = single.search("the w0007", k=6)
    pin = [organic[2][0], 3, single.N + 99, organic[0][0]]
    assert multi.pinned_search(pin, "the w0007", k=10) == \
        single.pinned_search(pin, "the w0007", k=10)
    assert multi.pinned_search(pin, "the w0007", k=2) == \
        single.pinned_search(pin, "the w0007", k=2)
    # where kwarg parity (the sharded twins accept and honor it)
    w = {"role": "user"}
    for q in ["the w00", "bash w0007 ed"]:
        assert multi.match_bool_prefix(q, k=10, where=w) == \
            single.match_bool_prefix(q, k=10, where=w), q
    assert multi.pinned_search(pin, "the w0007", k=10, where=w) == \
        single.pinned_search(pin, "the w0007", k=10, where=w)


def test_sharded_percentile_ranks_equal_global(indexes):
    """percentile_ranks: integer (count, n) partials merge exactly."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the w0007", "zzz_absent"]:
        assert multi.percentile_ranks_agg(q, "turn_idx",
                                          (0.0, 2.0, 5.5, 99.0)) == \
            single.percentile_ranks_agg(q, "turn_idx",
                                        (0.0, 2.0, 5.5, 99.0)), q


def test_sharded_rrf_equals_global(indexes):
    """RRF fuse is pure rank arithmetic over the exact sharded BM25
    ranking plus a global knn list — fused scores bit-identical."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    knn = [5, 3, single.N - 1, 0, 7, single.N + 50]  # incl. out-of-range
    for q in ["the w0007", "zzz_absent"]:
        for window in (5, 50):
            assert multi.rrf_search(q, knn, k=10, rank_window=window) \
                == single.rrf_search(q, knn, k=10, rank_window=window), \
                (q, window)
    with pytest.raises(ValueError):
        multi.rrf_search("the", knn, rank_window=0)
    # linear retriever rides the same exact sharded search + knn list
    knn_sc = [(d, 0.9 - 0.1 * i) for i, d in enumerate(knn[:4])]
    for q in ["the w0007", "zzz_absent"]:
        assert multi.linear_retriever_search(
            q, knn_sc, k=10, rank_window=25, knn_weight=2.0
        ) == single.linear_retriever_search(
            q, knn_sc, k=10, rank_window=25, knn_weight=2.0
        ), q


def test_sharded_rare_and_multi_terms_equal_global(indexes):
    """rare_terms: per-segment histograms sum BEFORE the cutoff (global
    rare-ness); multi_terms: value-tuple histograms sum exactly;
    keyword significant_terms: fg/bg integer partials merge exactly."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the w0007", "w0003", "zzz_absent"]:
        assert multi.significant_keyword_terms(q, "role",
                                               min_doc_count=1) == \
            single.significant_keyword_terms(q, "role",
                                             min_doc_count=1), q
        assert multi.significant_keyword_terms(
            q, "role", min_doc_count=1, heuristic="chi_square") == \
            single.significant_keyword_terms(
                q, "role", min_doc_count=1, heuristic="chi_square"), q
        assert multi.significant_keyword_terms(
            q, "role", min_doc_count=1,
            heuristic="mutual_information") == \
            single.significant_keyword_terms(
                q, "role", min_doc_count=1,
                heuristic="mutual_information"), q
    for q in ["the w0007", "zzz_absent"]:
        for mdc in (1, 3, 10_000):
            assert multi.rare_terms_agg(q, "role", max_doc_count=mdc) \
                == single.rare_terms_agg(q, "role", max_doc_count=mdc), \
                (q, mdc)
        assert multi.multi_terms_agg(q, ["role", "tool"], size=7) == \
            single.multi_terms_agg(q, ["role", "tool"], size=7), q
        assert multi.reverse_nested_agg(q, "role", "tool", size=7) == \
            single.reverse_nested_agg(q, "role", "tool", size=7), q
        assert multi.terms_stats_agg(q, "role", "turn_idx", size=7) == \
            single.terms_stats_agg(q, "role", "turn_idx", size=7), q
        # search_after on a field sort: cursor pages == offset slices of
        # the full order, on BOTH executors, numeric and keyword fields
        for fld, order in [("turn_idx", "desc"), ("turn_idx", "asc"),
                           ("tool", "asc")]:
            full = single.search_by_field(q, fld, order=order, k=10_000)
            for page in range(0, min(len(full), 9), 3):
                if page == 0:
                    continue
                av, ad = full[page - 1][1], full[page - 1][0]
                want = full[page:page + 3]
                assert single.search_by_field(
                    q, fld, order=order, k=3, after=(av, ad)) == want, \
                    (q, fld, order, page)
                assert multi.search_by_field(
                    q, fld, order=order, k=3, after=(av, ad)) == want, \
                    (q, fld, order, page)
        assert multi.date_hist_metric_agg(q, "turn_idx", "year",
                                          "turn_idx") == \
            single.date_hist_metric_agg(q, "turn_idx", "year",
                                        "turn_idx"), q
        assert multi.facet_counts(q, "tool", size=5, include=r".*a.*",
                                  exclude=r"bash") == \
            single.facet_counts(q, "tool", size=5, include=r".*a.*",
                                exclude=r"bash"), q
        assert multi.facet_counts(q, "tool", size=50, missing="none",
                                  min_doc_count=2) == \
            single.facet_counts(q, "tool", size=50, missing="none",
                                min_doc_count=2), q
        assert multi.histogram_agg(q, "turn_idx", 4.0, offset=1.5) == \
            single.histogram_agg(q, "turn_idx", 4.0, offset=1.5), q
        # min_doc_count=0: dense axis, zero fill, non-empty rows equal
        filled_s = single.histogram_agg(q, "turn_idx", 5.0,
                                        min_doc_count=0)
        assert multi.histogram_agg(q, "turn_idx", 5.0,
                                   min_doc_count=0) == filled_s, q
        if filled_s:
            keys = [k for k, _ in filled_s]
            assert keys == [keys[0] + 5.0 * i for i in range(len(keys))]
            assert [r for r in filled_s if r[1] > 0] == \
                single.histogram_agg(q, "turn_idx", 5.0), q


def test_terminate_after_per_shard_semantics(indexes):
    """count_hits: uncapped == exact hit count everywhere; capped is
    min(n, cap) on one index and sum of PER-SEGMENT mins on the
    sharded run (the ES per-shard semantic — the one documented
    exception to sharded==global)."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    q = "the w0007"
    n, t = single.count_hits(q)
    assert (n, t) == (int(single._hit_mask(q).sum()), False)
    assert multi.count_hits(q) == (n, False)
    cap = max(1, n // 3)
    assert single.count_hits(q, terminate_after=cap) == (cap, True)
    per_seg = [
        seg.count_hits(q, terminate_after=cap) for seg in multi.segments
    ]
    want = (sum(c for c, _ in per_seg), any(t for _, t in per_seg))
    assert multi.count_hits(q, terminate_after=cap) == want


def test_sharded_new_metric_aggs_equal_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a", "w0007", "zzzz_absent"]:
        assert multi.value_count_agg(q, "turn_idx") == \
            single.value_count_agg(q, "turn_idx"), q
        assert multi.median_absolute_deviation_agg(q, "turn_idx") == \
            single.median_absolute_deviation_agg(q, "turn_idx"), q
        assert multi.boxplot_agg(q, "turn_idx") == \
            single.boxplot_agg(q, "turn_idx"), q
        assert multi.string_stats_agg(q, "role") == \
            single.string_stats_agg(q, "role"), q
        # doc_id is a LOCAL column per segment, so the sharded pair must
        # use content columns (the single-index doc_id contract queries
        # run on one index, where dense == global)
        assert multi.matrix_stats_agg(q, "turn_idx", "turn_idx") == \
            single.matrix_stats_agg(q, "turn_idx", "turn_idx"), q


def test_sharded_auto_date_hist_equals_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q, tgt in [("the a", 3), ("w0007", 5), ("zzzz_absent", 4)]:
        assert multi.auto_date_histogram_agg(q, "turn_idx", tgt) == \
            single.auto_date_histogram_agg(q, "turn_idx", tgt), q


def test_sharded_top_metrics_and_rank_eval_equal_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a", "w0007", "zzzz_absent"]:
        assert multi.top_metrics(q, "turn_idx", ["turn_idx"], size=5) == \
            single.top_metrics(q, "turn_idx", ["turn_idx"], size=5), q
        assert multi.rank_eval(q, {"role": "user"}, k=10) == \
            single.rank_eval(q, {"role": "user"}, k=10), q


def test_sharded_terms_agg_meta_equal_global(indexes):
    """terms_agg_meta: untruncated-histogram merge makes buckets,
    sum_other_doc_count and the 0 error bound identical sharded vs
    global; sum_other == total hits minus top-bucket counts."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a", "w0007", "zzzz_absent"]:
        got = multi.terms_agg_meta(q, "role", size=1)
        want = single.terms_agg_meta(q, "role", size=1)
        assert got == want, q
        top, other, err = want
        full = dict(single.facet_counts(q, "role", size=10**6))
        assert err == 0
        assert other == sum(full.values()) - sum(c for _, c in top)


def test_sharded_diversified_equals_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a", "w0007 bash", "zzzz_absent"]:
        for m in (1, 2):
            assert multi.diversified_top_hits(q, "tool", max_per_key=m,
                                              k=10) == \
                single.diversified_top_hits(q, "tool", max_per_key=m,
                                            k=10), (q, m)
            assert multi.diversified_top_hits(q, "role", max_per_key=m,
                                              k=15) == \
                single.diversified_top_hits(q, "role", max_per_key=m,
                                            k=15), (q, m)


def test_sharded_round5_batch2_equal_global(indexes):
    """terms_enum / t_test / scripted_metric / has_parent: sharded ==
    global (dictionary dfs sum, moments add exactly, per-shard map
    states reduce, parent scores merge then children fetch per segment)."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    # terms_enum: summed dictionary dfs, global term-asc truncation
    for prefix, size, min_df in [("w00", 5, 1), ("w00", 1 << 20, 3),
                                 ("b", 10, 1), ("zzz", 5, 1)]:
        assert multi.terms_enum(prefix, size=size, min_df=min_df) == \
            single.terms_enum(prefix, size=size, min_df=min_df), prefix
    q = "the bash"
    # t_test: int moments identical, hence bit-identical t
    rs = single.t_test_agg(q, "turn_idx", {"role": "user"},
                           {"role": "assistant"})
    rm = multi.t_test_agg(q, "turn_idx", {"role": "user"},
                          {"role": "assistant"})
    assert rm == rs
    # scripted_metric: per-shard states reduce to the same exact ints
    def map_script(fields):
        import numpy as np

        y = fields("turn_idx").astype(np.int64)
        return (int(y.size), int(y.sum()), int((y * y).sum()))

    def reduce_script(states):
        return (sum(s[0] for s in states), sum(s[1] for s in states),
                sum(s[2] for s in states))

    assert multi.scripted_metric(q, map_script, reduce_script) == \
        single.scripted_metric(q, map_script, reduce_script)
    # has_parent: same children, bit-close scores, every score_mode
    for sm in ("max", "sum", "avg"):
        hs = single.has_parent_search(q, "conv_id", k=15, score_mode=sm)
        hm = multi.has_parent_search(q, "conv_id", k=15, score_mode=sm)
        assert [(d, v) for d, _, v in hm] == [(d, v) for d, _, v in hs], sm
        for (_, a, _), (_, b, _) in zip(hm, hs):
            assert abs(a - b) < 1e-12, sm
    hw = single.has_parent_search(q, "conv_id", k=15,
                                  child_where={"role": "tool"})
    mw = multi.has_parent_search(q, "conv_id", k=15,
                                 child_where={"role": "tool"})
    assert [(d, v) for d, _, v in mw] == [(d, v) for d, _, v in hw]


def test_sharded_knn_hybrid_equals_global(indexes):
    """Hybrid knn+query: per-segment combine with offset-routed knn adds
    merges to the single-index ranking bit-for-bit."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    knn = [(d, ((d * 13) % 97 + 1) / 97.0) for d in range(0, single.N, 5)]
    for q in ("the w0007 bash", "zzzz_absent"):
        hs = single.knn_hybrid_search(q, knn, k=12, knn_boost=1.7)
        hm = multi.knn_hybrid_search(q, knn, k=12, knn_boost=1.7)
        assert [d for d, _ in hm] == [d for d, _ in hs], q
        for (_, a), (_, b) in zip(hm, hs):
            assert abs(a - b) < 1e-12, q


def test_sharded_var_width_mtv_shards_equal_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    q = "the bash"
    assert multi.variable_width_histogram_agg(q, "turn_idx", buckets=4) \
        == single.variable_width_histogram_agg(q, "turn_idx", buckets=4)
    ids = [3, multi.N - 1, 0]
    assert multi.mtermvectors(ids) == single.mtermvectors(ids)
    sh = multi.shards()
    assert len(sh) == 2
    assert sh[0]["offset"] == 0 and sh[1]["offset"] == sh[0]["n_docs"]
    assert sum(x["n_docs"] for x in sh) == single.N


def test_sharded_similarity_equals_global(indexes):
    """Similarity modules: global df/cf/N/total-token stats make the
    sharded run bit-identical to the single index."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for sim in ("lmd", "classic", "boolean"):
        for q in REFERENCE_QUERIES[:3] + ["the w0007 bash"]:
            hs = single.search_similarity(q, k=15, similarity=sim)
            hm = multi.search_similarity(q, k=15, similarity=sim)
            assert [d for d, _ in hm] == [d for d, _ in hs], (sim, q)
            for (_, a), (_, b) in zip(hm, hs):
                assert abs(a - b) < 1e-12, (sim, q)


def test_sharded_osa_fuzzy_equals_global(indexes):
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for probe in ("absh", "w0100", "bath"):
        assert multi.expand_fuzzy(probe, 2, transpositions=True) == \
            single.expand_fuzzy(probe, 2, transpositions=True), probe
        assert multi.fuzzy_docs(probe, 2, limit=50,
                                transpositions=True) == \
            single.fuzzy_docs(probe, 2, limit=50, transpositions=True)



def test_indices_boost_and_validate_query(indexes):
    """indices_boost: 1.0 everywhere == search(); a fresh-index boost
    multiplies that segment's scores; validate_query reports per-clause
    stats without executing, identically on both searchers."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    q = "the w0007 bash"
    base = multi.search(q, k=15)
    flat = multi.search_indices_boost(q, [1.0, 1.0], k=15)
    assert [(d, round(s, 9)) for d, s in flat] == \
        [(d, round(s, 9)) for d, s in base]
    boosted = multi.search_indices_boost(q, [1.0, 3.0], k=10 ** 6)
    want = sorted(
        ((d, s * (3.0 if d >= multi.offsets[1] else 1.0))
         for d, s in multi.search(q, k=10 ** 6)),
        key=lambda r: (-r[1], r[0]),
    )
    assert [(d, round(s, 9)) for d, s in boosted] == \
        [(d, round(s, 9)) for d, s in want]
    with pytest.raises(ValueError):
        multi.search_indices_boost(q, [1.0])
    with pytest.raises(ValueError):
        multi.search_indices_boost(q, [1.0, 0.0])
    vs = single.validate_query(q)
    vm = multi.validate_query(q)
    assert vm == vs
    assert vm["valid"] and vm["n_clauses"] == 3
    for t, df, cf in vm["terms"]:
        p = single.lookup(t)
        assert (p.df if p else 0) == df and (p.cf if p else 0) == cf


def test_sharded_new_aggs_equal_global(indexes):
    """Round-5 agg additions: date_range / global / sampler sharded ==
    single-index, including the ISO boundary keys and the global-scope
    escape."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    q = "the w0007"
    ranges = ((None, "1970-01-02"), ("1970-01-01", None))
    assert multi.date_range_agg(q, "turn_idx", list(ranges)) == \
        single.date_range_agg(q, "turn_idx", list(ranges))
    sg = single.global_stats_agg(q, "turn_idx")
    mg = multi.global_stats_agg(q, "turn_idx")
    assert {k: mg[k] for k in ("n_hits", "n_global", "n_field")} == \
        {k: sg[k] for k in ("n_hits", "n_global", "n_field")}
    assert mg["sum_field"] == pytest.approx(sg["sum_field"], abs=1e-9)
    for shard_size in (5, 50, 10**6):
        assert multi.sampler_terms_agg(q, "role", shard_size, 10) == \
            single.sampler_terms_agg(q, "role", shard_size, 10), shard_size


def test_append_segment_incremental_ingest(tmp_path_factory):
    """append_segment: new docs land in a fresh segment with an atomic
    manifest republish; the reopened MultiSearcher is bit-identical to
    a fresh global build over the union; overlapping key ranges and
    disagreeing key_cols refuse."""
    import ray.data as rd

    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.segments import (
        append_segment,
        build_segments,
        open_multisearcher,
    )

    root = str(tmp_path_factory.mktemp("aroot"))
    t = generate_transcripts(30, seed=11)
    cut = "conv-0000020"
    base = t.filter(pc.less(t["conv_id"], cut))
    extra = t.filter(pc.greater_equal(t["conv_id"], cut))
    cfg = IndexJobConfig(term_buckets=4)
    build_segments([rd.from_arrow(base)], root, cfg=cfg)
    before = open_multisearcher(root)
    n_before = before.N
    d = append_segment(root, rd.from_arrow(extra), cfg=cfg)
    assert d.endswith("segment-0001")
    multi = open_multisearcher(root)
    assert multi.N == t.num_rows and n_before < multi.N
    full_dir = str(tmp_path_factory.mktemp("afull"))
    build_index(rd.from_arrow(t),
                cfg=IndexJobConfig(index_dir=full_dir, term_buckets=4))
    single = Searcher(full_dir)
    for q in REFERENCE_QUERIES:
        assert multi.search(q, k=20) == single.search(q, k=20), q
    # overlapping append refuses (same range again)
    with pytest.raises(ValueError, match="strictly later"):
        append_segment(root, rd.from_arrow(extra), cfg=cfg)
    with pytest.raises(ValueError, match="key_cols"):
        append_segment(root, rd.from_arrow(extra),
                       cfg=IndexJobConfig(key_cols=("conv_id",)))


def test_sharded_sparse_vector_equals_global(indexes):
    """sparse_vector: per-doc tf dot has no corpus stats, so the
    sharded merge is bit-identical to the single index; absent tokens
    contribute nothing."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for w in [
        {"the": 1.0, "w0007": 3.0, "bash": 0.5},
        {"zzz_absent": 9.0},
        {"the": 0.25},
    ]:
        assert multi.sparse_vector_search(w, k=12) == \
            single.sparse_vector_search(w, k=12), w
    assert multi.sparse_vector_search({"the": 1.0}, k=0) == []


def test_terms_metric_agg_bruteforce_and_sharded(indexes):
    """terms agg ordered by a metric sub-agg: buckets ranked by exact
    integer avg_e6 (round half-up) desc, key asc — vs a raw-table
    recompute; sharded merge (summed integer triples) is identical."""
    from rayfts.oracle import tokenize

    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    t = generate_transcripts(40, seed=42)
    roles = t["role"].to_pylist()
    idxs = t["turn_idx"].to_pylist()
    texts = t["text"].to_pylist()
    for q in ("the", "the w0007 bash", "zzz_absent"):
        qt = set(q.split())
        agg: dict = {}
        for r, ti, tx in zip(roles, idxs, texts):
            if qt & set(tokenize(tx)):
                c, n, s = agg.get(r, (0, 0, 0))
                agg[r] = (c + 1, n + 1, s + int(ti))
        want = sorted(
            ((v, c, n, (2_000_000 * s + n) // (2 * n))
             for v, (c, n, s) in agg.items()),
            key=lambda e: (-e[3], e[0]),
        )[:10]
        got = single.terms_metric_agg(q, "role", "turn_idx", size=10)
        assert got == want, q
        assert multi.terms_metric_agg(
            q, "role", "turn_idx", size=10
        ) == got, q


def test_collapse_inner_hits_bruteforce_and_sharded(indexes):
    """collapse.inner_hits: top-k groups by best hit, each group's own
    top-n (score desc, doc asc) — vs a recompute from search_collapse +
    the full ranked hit list; sharded == single bit-for-bit."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ("the", "the w0007 bash"):
        k, n = 5, 2
        got = single.collapse_inner_hits(q, "tool", k=k, n=n)
        # brute force: full ranked hits (k=N upper bound), group by tool
        allhits = single.search(q, k=single.N)
        groups: dict = {}
        codes, values = single._field_codes("tool")
        for d, s in allhits:
            v = values[codes[d]] if codes[d] >= 0 else None
            groups.setdefault(v, []).append((d, s))
        ranked_groups = sorted(
            groups.items(), key=lambda e: (-e[1][0][1], e[1][0][0])
        )[:k]
        want = [
            (v, r + 1, d, s)
            for v, rs in ranked_groups
            for r, (d, s) in enumerate(rs[:n])
        ]
        assert got == want, q
        assert multi.collapse_inner_hits(q, "tool", k=k, n=n) == got, q
        # group heads must agree with plain collapse's group order
        heads = [(r[2], r[3], r[0]) for r in got if r[1] == 1]
        assert heads == single.search_collapse(q, "tool", k=k), q


def test_point_in_time_pins_segments_and_tombstones(tmp_path_factory):
    """ES PIT analog: a token from open_pit keeps serving the state at
    open time — a later append_segment and a later delete are both
    invisible under the PIT, while a fresh open sees them; PIT results
    are bit-identical to the pre-change searcher."""
    import ray.data as rd

    from rayfts.admin import exclude_docs
    from rayfts.segments import (
        append_segment, build_segments, open_multisearcher, open_pit,
        open_pit_searcher,
    )

    root = str(tmp_path_factory.mktemp("pitroot"))
    t = generate_transcripts(40, seed=42)
    cut = "conv-0000020"
    a = t.filter(pc.less(t["conv_id"], cut))
    b = t.filter(
        pc.and_(pc.greater_equal(t["conv_id"], cut),
                pc.less(t["conv_id"], "conv-0000030"))
    )
    c = t.filter(pc.greater_equal(t["conv_id"], "conv-0000030"))
    build_segments(
        [rd.from_arrow(a), rd.from_arrow(b)], root,
        cfg=IndexJobConfig(term_buckets=4),
    )
    pit = open_pit(root)
    before = {
        q: open_multisearcher(root).search(q, k=15)
        for q in REFERENCE_QUERIES
    }
    # mutate: append a third segment AND tombstone a hit in segment 0
    append_segment(root, rd.from_arrow(c),
                   cfg=IndexJobConfig(term_buckets=4))
    victim = before[REFERENCE_QUERIES[0]][0][0]
    exclude_docs(f"{root}/segment-0000", [victim])

    fresh = open_multisearcher(root)
    pinned = open_pit_searcher(pit)
    assert pinned.N < fresh.N
    for q in REFERENCE_QUERIES:
        assert pinned.search(q, k=15) == before[q], q
    # the fresh reader sees both mutations
    assert victim not in [
        d for d, _ in fresh.search(REFERENCE_QUERIES[0], k=15)
    ]
    # a second PIT opened NOW pins the post-mutation state
    pit2 = open_pit(root)
    for q in REFERENCE_QUERIES:
        assert open_pit_searcher(pit2).search(q, k=15) == \
            fresh.search(q, k=15), q


def test_sharded_rrf_multi_equals_global(indexes):
    """N-leg RRF sharded == single (pure rank arithmetic, exclusions
    resolved per owning segment)."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    q = "the w0007"
    legs = [
        [d for d, _ in single.search(q, k=20)],
        list(range(0, 30, 3)),
        [d for d, _ in single.search_by_field(q, "turn_idx",
                                              order="desc", k=20)],
    ]
    assert multi.rrf_multi_search(legs, k=12) == \
        single.rrf_multi_search(legs, k=12)


def test_sig_terms_background_filter_sharded(indexes):
    """significant_terms background_filter: the narrowed background
    changes scores exactly as a hand-filtered recompute; sharded ==
    single with the filter applied per segment."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    kw = {"size": 20, "min_doc_count": 1,
          "background_where": {"role": "user"}}
    got = single.significant_keyword_terms("the", "tool", **kw)
    assert multi.significant_keyword_terms("the", "tool", **kw) == got
    # the filtered background must differ from the unfiltered one
    # whenever the role slice has a different tool mix
    plain = single.significant_keyword_terms(
        "the", "tool", size=20, min_doc_count=1)
    assert got != plain


def test_date_histogram_min_doc_count_zero(indexes):
    """min_doc_count=0: every in-range calendar period appears, zeros
    included, non-zero rows identical to the default agg; month unit
    steps true calendar lengths; sharded fill == single."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for unit in ("day", "month"):
        dense = single.date_histogram_agg(
            "w0007", "turn_idx", unit, min_doc_count=0)
        sparse = dict(single.date_histogram_agg(
            "w0007", "turn_idx", unit))
        assert dict((k, v) for k, v in dense if v > 0) == sparse
        keys = [k for k, _ in dense]
        assert keys == sorted(keys)
        assert multi.date_histogram_agg(
            "w0007", "turn_idx", unit, min_doc_count=0) == dense


def test_date_histogram_time_zone_offset(indexes):
    """time_zone fixed offset: buckets == shift-floor-unshift recompute
    from the raw values; composes with min_doc_count=0 (local-axis
    fill); sharded == single."""
    import numpy as np

    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    off = 7200
    got = single.date_histogram_agg("the", "turn_idx", "day",
                                    time_zone_offset_s=off)
    sel, _ = single._date_hist_values("the", "turn_idx", "day",
                                      None, "or", None)
    days = ((sel.astype(np.int64) + off) // 86400) * 86400 - off
    want = sorted(
        (int(k), int(c))
        for k, c in zip(*np.unique(days, return_counts=True))
    )
    assert got == want
    assert multi.date_histogram_agg(
        "the", "turn_idx", "day", time_zone_offset_s=off) == got
    dense = single.date_histogram_agg(
        "the", "turn_idx", "day", min_doc_count=0,
        time_zone_offset_s=off)
    assert dict((k, v) for k, v in dense if v > 0) == dict(got)
    assert all((k + off) % 86400 == 0 for k, _ in dense)


def test_sharded_random_sampler_equals_global(indexes):
    """random_sampler: hashing GLOBAL ids makes sample membership
    location-independent, so sharded == single exactly (n_sampled and
    every sub-agg bucket)."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a", "w0007 bash", "zzzz_absent"]:
        for p, seed in [(0.5, 7), (0.25, 0), (1.0, 3)]:
            assert multi.random_sampler_terms_agg(
                q, "role", probability=p, seed=seed, size=10) == \
                single.random_sampler_terms_agg(
                    q, "role", probability=p, seed=seed, size=10), (q, p)


def test_sharded_children_agg_equals_global(indexes):
    """children agg: parent value sets union across segments BEFORE the
    step-down, so sharded == single exactly."""
    single = Searcher(indexes["full"])
    multi = MultiSearcher([indexes["a"], indexes["b"]])
    for q in ["the a", "w0007 bash", "zzzz_absent"]:
        assert multi.children_terms_agg(q, "tool", "role", size=10) == \
            single.children_terms_agg(q, "tool", "role", size=10), q
