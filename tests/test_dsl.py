"""ES request-body executor: every supported DSL shape must equal the
direct engine call it normalizes to, and unsupported shapes must raise
UnsupportedDSL (never approximate)."""

import numpy as np
import pytest

import ray.data as rd

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.dsl import UnsupportedDSL, execute_dsl, normalize_query
from rayfts.fixtures import generate_transcripts
from rayfts.search import MultiSearcher, Searcher


@pytest.fixture(scope="module")
def dsl_index(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsl") / "idx")
    build_index(
        rd.from_arrow(generate_transcripts(40, seed=42)),
        cfg=IndexJobConfig(index_dir=d, term_buckets=4,
                           index_positions=True),
    )
    return d


def _hits(res):
    return [(h["_id"], h["_score"]) for h in res["hits"]["hits"]]


def test_dsl_queries_equal_direct_calls(dsl_index):
    s = Searcher(dsl_index)
    q = "the w0007 bash"
    assert _hits(execute_dsl(s, {"query": {"match": {"text": q}},
                                 "size": 7})) == s.search(q, k=7)
    assert _hits(execute_dsl(s, {
        "query": {"match": {"text": {"query": q, "operator": "and"}}},
        "size": 5,
    })) == s.search(q, k=5, mode="and")
    assert _hits(execute_dsl(s, {
        "query": {"match": {"text": {"query": q,
                                     "minimum_should_match": 2}}},
    })) == s.search(q, k=10, min_should_match=2)
    assert _hits(execute_dsl(s, {
        "query": {"match_phrase": {"text": "the w0007"}}, "size": 4,
    })) == s.search_phrase("the w0007", k=4)
    assert _hits(execute_dsl(s, {
        "query": {"query_string": {"query": "+the w0007 -bash"}},
    })) == s.query_string("+the w0007 -bash", k=10)
    # from/size pagination == offset
    assert _hits(execute_dsl(s, {"query": {"match": {"text": q}},
                                 "size": 3, "from": 2})) == \
        s.search(q, k=3, offset=2)
    # min_score option
    assert _hits(execute_dsl(s, {"query": {"match": {"text": q}},
                                 "min_score": 1.0, "size": 5})) == \
        s.search_min_score(q, k=5, min_score=1.0)


def test_dsl_bool_filter_context_and_sort(dsl_index):
    s = Searcher(dsl_index)
    q = "the w0007"
    body = {"query": {"bool": {
        "must": [{"match": {"text": q}}],
        "filter": [{"term": {"role": "user"}},
                   {"range": {"turn_idx": {"gte": 1, "lte": 6}}}],
        "must_not": [{"term": {"text": "bash"}}],
    }}, "size": 8}
    want = s.search(q, k=8,
                    where={"role": "user",
                           "turn_idx": {"gte": 1, "lte": 6}},
                    must_not="bash")
    assert _hits(execute_dsl(s, body)) == want
    # terms membership filter (engine isin extension)
    got = execute_dsl(s, {"query": {"bool": {
        "must": [{"match": {"text": q}}],
        "filter": [{"terms": {"role": ["user", "tool"]}}],
    }}})
    assert _hits(got) == s.search(q, k=10,
                                  where={"role": ("user", "tool")})
    # pure filter context: every live doc passing, constant score 1.0
    fc = execute_dsl(s, {"query": {"term": {"role": "tool"}},
                         "size": 10**6})
    ids = [h["_id"] for h in fc["hits"]["hits"]]
    mask = s.filter_mask(role="tool")
    assert ids == [int(d) for d in np.flatnonzero(mask)]
    assert all(h["_score"] == 1.0 for h in fc["hits"]["hits"])
    # sort-by-field
    st = execute_dsl(s, {"query": {"match": {"text": q}},
                         "sort": [{"turn_idx": {"order": "desc"}}],
                         "size": 5})
    assert [(h["_id"], h["_sort"]) for h in st["hits"]["hits"]] == \
        s.search_by_field(q, "turn_idx", order="desc", k=5)
    # bool.should merge with minimum_should_match
    sh = execute_dsl(s, {"query": {"bool": {
        "should": [{"match": {"text": "the"}},
                   {"match": {"text": "w0007"}}],
        "minimum_should_match": 2,
    }}})
    assert _hits(sh) == s.search("the w0007", k=10, min_should_match=2)


def test_dsl_aggs_equal_direct_calls(dsl_index):
    s = Searcher(dsl_index)
    q = "the w0007"
    res = execute_dsl(s, {
        "query": {"match": {"text": q}},
        "aggs": {
            "roles": {"terms": {"field": "role", "size": 4}},
            "ti": {"stats": {"field": "turn_idx"}},
            "card": {"cardinality": {"field": "role"}},
            "hist": {"histogram": {"field": "turn_idx",
                                   "interval": 3}},
            "pr": {"percentile_ranks": {"field": "turn_idx",
                                        "values": [2, 5]}},
        },
    })["aggregations"]
    assert res["roles"] == s.facet_counts(q, "role", size=4)
    assert res["ti"] == s.stats_agg(q, "turn_idx")
    assert res["card"] == s.cardinality_agg(q, "role")
    assert res["hist"] == s.histogram_agg(q, "turn_idx", 3)
    assert res["pr"] == s.percentile_ranks_agg(q, "turn_idx", (2, 5))
    # round-5 agg clauses: date_range / global / sampler
    r5 = execute_dsl(s, {
        "query": {"match": {"text": q}},
        "aggs": {
            "dr": {"date_range": {"field": "turn_idx", "ranges": [
                {"to": "1970-01-02"}, {"from": "1970-01-01"}]}},
            "g": {"global": {"field": "turn_idx"}},
            "samp": {"sampler": {"field": "role", "shard_size": 7}},
        },
    })["aggregations"]
    assert r5["dr"] == s.date_range_agg(
        q, "turn_idx", [(None, "1970-01-02"), ("1970-01-01", None)])
    assert r5["g"] == s.global_stats_agg(q, "turn_idx")
    assert r5["samp"] == s.sampler_terms_agg(q, "role", shard_size=7)
    # runtime_mappings: derived field flows into any numeric agg
    rt = execute_dsl(s, {
        "runtime_mappings": {"rt": {"type": "double", "script": {
            "op": "*", "a": {"col": "turn_idx"}, "b": 3}}},
        "query": {"match": {"text": q}},
        "aggs": {"st": {"stats": {"field": "rt"}}},
    })["aggregations"]
    base = execute_dsl(s, {
        "query": {"match": {"text": q}},
        "aggs": {"st": {"stats": {"field": "turn_idx"}}},
    })["aggregations"]
    assert rt["st"]["count"] == base["st"]["count"]
    assert rt["st"]["sum"] == base["st"]["sum"] * 3
    # filter-context aggs (match_all + where) — the query=None path
    fa = execute_dsl(s, {
        "query": {"term": {"role": "user"}},
        "aggs": {"ti": {"stats": {"field": "turn_idx"}}},
    })["aggregations"]
    assert fa["ti"] == s.stats_agg(None, "turn_idx",
                                   where={"role": "user"})


def test_dsl_works_sharded_and_rejects_unsupported(dsl_index):
    multi = MultiSearcher([dsl_index])
    single = Searcher(dsl_index)
    body = {"query": {"match": {"text": "the w0007"}}, "size": 6}
    assert _hits(execute_dsl(multi, body)) == \
        _hits(execute_dsl(single, body))
    # sharded filter context concatenates per-segment masks globally
    fc = {"query": {"term": {"role": "user"}}, "size": 50}
    assert _hits(execute_dsl(multi, fc)) == _hits(execute_dsl(single, fc))
    # sharded aggs dispatch to the exact MultiSearcher twins
    ag = {"query": {"match": {"text": "the w0007"}},
          "aggs": {"r": {"terms": {"field": "role"}}}}
    assert execute_dsl(multi, ag)["aggregations"] == \
        execute_dsl(single, ag)["aggregations"]
    # a query kind the sharded surface lacks fails loudly, not wrongly
    with pytest.raises(UnsupportedDSL, match="not available"):
        execute_dsl(multi, {"query": {"query_string": {"query": "a b"}}})
    # min_score composes with bool restrictions exactly
    ms = {"query": {"bool": {
        "must": [{"match": {"text": {"query": "the w0007",
                                     "operator": "and"}}}],
        "must_not": [{"term": {"text": "bash"}}],
    }}, "min_score": 0.5, "size": 5}
    assert _hits(execute_dsl(single, ms)) == single.search_min_score(
        "the w0007", k=5, min_score=0.5, mode="and", must_not="bash"
    )
    for bad in [
        {"query": {"fuzzy_weird": {}}},
        # options that would silently change the hit set must refuse
        {"query": {"match_phrase": {"text": "a b"}},
         "sort": [{"turn_idx": "asc"}]},
        {"query": {"match_phrase": {"text": "a b"}},
         "aggs": {"r": {"terms": {"field": "role"}}}},
        {"query": {"match": {"text": {"query": "a b",
                                      "minimum_should_match": 2}}},
         "aggs": {"r": {"terms": {"field": "role"}}}},
        {"query": {"match_phrase": {"text": "a b"}}, "min_score": 1.0},
        {"query": {"term": {"role": "user"}}, "min_score": 1.0},
        {"query": {"bool": {"must": [{"match_phrase": {"text": "a"}}],
                            "must_not": [{"term": {"text": "b"}}]}}},
        # fixed_interval is supported since round 5 — the refusal is
        # now the unsupported unit (weeks need calendar_interval)
        {"query": {"match": {"text": "a"}},
         "aggs": {"d": {"date_histogram": {"field": "ts",
                                           "fixed_interval": "4w"}}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}},
                                     {"match": {"text": "b"}}]}}},
        {"query": {"bool": {"filter": [{"geo_shape": {}}]}}},
        {"query": {"match": {"text": {"query": "x",
                                      "operator": "xor"}}}},
        {"query": {"match": {"text": "x"}},
         "sort": [{"a": "asc"}, {"b": "asc"}]},
        {"query": {"match": {"text": "x"}},
         "aggs": {"g": {"geo_grid": {}}}},
    ]:
        with pytest.raises(UnsupportedDSL):
            execute_dsl(single, bad)
    # normalize_query is pure and reports the filter-only kind
    spec = normalize_query({"term": {"role": "user"}})
    assert spec.kind == "all" and spec.where == {"role": "user"}


@pytest.fixture(scope="module")
def pos_dsl_index(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dslpos") / "idx")
    build_index(
        rd.from_arrow(generate_transcripts(30, seed=42)),
        cfg=IndexJobConfig(index_dir=d, term_buckets=4,
                           index_positions=True),
    )
    return d


def test_dsl_hybrid_retriever_highlight_explain(pos_dsl_index):
    s = Searcher(pos_dsl_index)
    q = "the w0007"
    knn = [(d, 0.9 - 0.05 * i) for i, (d, _) in
           enumerate(s.search("bash", k=6))]
    # top-level knn clause == knn_hybrid_search sum rule
    got = execute_dsl(s, {"query": {"match": {"text": q}},
                          "knn": {"boost": 2.0}, "size": 5},
                      knn_hits=knn)
    assert _hits(got) == s.knn_hybrid_search(q, knn, k=5, knn_boost=2.0)
    # retriever rrf / linear trees
    rrf = execute_dsl(s, {"retriever": {"rrf": {
        "retrievers": [{"standard": {"query": {"match": {"text": q}}}},
                       {"knn": {}}],
        "rank_window_size": 20, "rank_constant": 60,
    }}, "size": 5}, knn_hits=knn)
    assert _hits(rrf) == s.rrf_search(q, [d for d, _ in knn], k=5,
                                      rank_window=20, rrf_k=60)
    lin = execute_dsl(s, {"retriever": {"linear": {
        "retrievers": [{"standard": {"query": {"match": {"text": q}}}},
                       {"knn": {}}],
        "rank_window_size": 20, "weights": [1.0, 2.0],
    }}, "size": 5}, knn_hits=knn)
    assert _hits(lin) == s.linear_retriever_search(
        q, knn, k=5, rank_window=20, text_weight=1.0, knn_weight=2.0)
    # highlight + explain ride the ranked hits
    res = execute_dsl(s, {"query": {"match": {"text": q}}, "size": 3,
                          "highlight": {"window": 2}, "explain": True})
    want_hl = {d: (p, t, sn) for d, _, p, t, sn in
               s.highlight(q, k=3, window=2)}
    for h in res["hits"]["hits"]:
        hl = h["highlight"]
        assert (hl["first_pos"], hl["first_term"], hl["snippet"]) == \
            want_hl[h["_id"]]
        ex = h["_explanation"]
        assert ex["matched"] and abs(ex["score"] - h["_score"]) < 1e-12
    # missing knn_hits and malformed trees refuse
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"query": {"match": {"text": q}}, "knn": {}})
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"retriever": {"rrf": {"retrievers": []}}},
                    knn_hits=knn)
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"query": {"match_phrase": {"text": q}},
                        "highlight": {}})


def test_dsl_knn_similarity_floor(pos_dsl_index):
    """ES 8.8 knn.similarity: below-floor ANN candidates drop BEFORE
    the hybrid combine — equal to pre-filtering the knn_hits list; no
    floor = the full list; an all-dropping floor leaves pure BM25."""
    s = Searcher(pos_dsl_index)
    q = "the w0007"
    knn = [(d, 0.9 - 0.05 * i) for i, (d, _) in
           enumerate(s.search("bash", k=6))]
    body = {"query": {"match": {"text": q}},
            "knn": {"boost": 2.0, "similarity": 0.8}, "size": 5}
    got = execute_dsl(s, body, knn_hits=knn)
    kept = [(d, v) for d, v in knn if v >= 0.8]
    assert len(kept) < len(knn)          # the floor actually cuts
    assert _hits(got) == s.knn_hybrid_search(q, kept, k=5,
                                             knn_boost=2.0)
    hi = execute_dsl(s, {"query": {"match": {"text": q}},
                         "knn": {"similarity": 99.0}, "size": 5},
                     knn_hits=knn)
    assert _hits(hi) == s.knn_hybrid_search(q, [], k=5)


def test_dsl_wrapper_query_transparent(pos_dsl_index):
    """wrapper query: base64-encoded clause == the clause itself;
    garbage payloads refuse loudly."""
    import base64
    import json

    s = Searcher(pos_dsl_index)
    inner = {"match": {"text": "the w0007"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    got = execute_dsl(s, {"query": {"wrapper": {"query": b64}},
                          "size": 5})
    assert _hits(got) == _hits(execute_dsl(s, {"query": inner,
                                               "size": 5}))
    # nested wrapper unwraps recursively
    b64b = base64.b64encode(json.dumps(
        {"wrapper": {"query": b64}}).encode()).decode()
    got2 = execute_dsl(s, {"query": {"wrapper": {"query": b64b}},
                           "size": 5})
    assert _hits(got2) == _hits(got)
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"query": {"wrapper": {"query": "!!notb64!!"}}})


def test_dsl_text_similarity_reranker(pos_dsl_index):
    """text_similarity_reranker: the child's top rank_window hits
    reorder by the provided inference scores; unscored docs drop;
    malformed trees refuse."""
    s = Searcher(pos_dsl_index)
    q = "the w0007"
    window = s.search(q, k=8)
    assert len(window) >= 4
    # score the first, third and fourth hits (reversed preference)
    knn = [(window[0][0], 0.2), (window[2][0], 0.9),
           (window[3][0], 0.5)]
    got = execute_dsl(s, {"retriever": {"text_similarity_reranker": {
        "retriever": {"standard": {"query": {"match": {"text": q}}}},
        "rank_window_size": 8,
    }}, "size": 2}, knn_hits=knn)
    assert _hits(got) == [(window[2][0], 0.9), (window[3][0], 0.5)]
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"retriever": {"text_similarity_reranker": {}}},
                    knn_hits=knn)
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"retriever": {"text_similarity_reranker": {
            "retriever": {"standard": {"query": {"match": {"text": q}}}},
        }}})   # no knn_hits


def test_dsl_date_histogram_fixed_interval(dsl_index):
    """fixed_interval compiles to the epoch-floor histogram kernel;
    malformed/conflicting intervals refuse."""
    s = Searcher(dsl_index)
    q = "the w0007"
    body = {"query": {"match": {"text": q}}, "size": 0,
            "aggs": {"h": {"date_histogram": {
                "field": "turn_idx", "fixed_interval": "2s"}}}}
    got = execute_dsl(s, body)["aggregations"]["h"]
    want = s.histogram_agg(q, "turn_idx", 2.0)
    assert got == want and want
    for bad in [{"field": "turn_idx", "fixed_interval": "2w"},
                {"field": "turn_idx", "fixed_interval": "0s"},
                {"field": "turn_idx", "fixed_interval": "1h",
                 "calendar_interval": "day"}]:
        with pytest.raises(UnsupportedDSL):
            execute_dsl(s, {"query": {"match": {"text": q}}, "size": 0,
                            "aggs": {"h": {"date_histogram": bad}}})


def test_dsl_script_filter(dsl_index):
    """script query in filter context: the AST bound prunes hits like
    the equivalent range where on a pre-registered runtime field;
    malformed bodies refuse."""
    s = Searcher(dsl_index)
    q = "the w0007"
    expr = {"op": "*", "a": {"col": "turn_idx"}, "b": 2}
    got = execute_dsl(s, {
        "query": {"bool": {"must": [{"match": {"text": q}}],
                           "filter": [{"script": {"expr": expr,
                                                  "gte": 4.0}}]}},
        "size": 10,
    })["hits"]["hits"]
    s.define_runtime_field("rt_twice", expr)
    want = s.search(q, k=10, where={"rt_twice": {"gte": 4.0}})
    assert [(h["_id"], h["_score"]) for h in got] == want and got
    with pytest.raises(UnsupportedDSL):
        normalize_query({"bool": {"filter": [{"script": {"expr": expr}}]}})
    with pytest.raises(UnsupportedDSL):
        normalize_query({"bool": {"filter": [{"script": {
            "expr": expr, "eq": 4}}]}})


def test_dsl_rescorer_retriever(pos_dsl_index):
    """rescorer retriever == the direct rescore API bit-for-bit;
    malformed trees refuse."""
    s = Searcher(pos_dsl_index)
    q, ph = "the w0007", "the w0007"
    body = {"retriever": {"rescorer": {
        "retriever": {"standard": {"query": {"match": {"text": q}}}},
        "rescore": {
            "window_size": 6,
            "query": {"rescore_query": {"match_phrase": {"text": ph}},
                      "query_weight": 1.5, "rescore_weight": 0.5},
        },
    }}, "size": 4}
    got = _hits(execute_dsl(s, body))
    want = s.rescore(q, ph, window_size=6, k=4,
                     query_weight=1.5, rescore_weight=0.5)
    assert got == want and got
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"retriever": {"rescorer": {
            "retriever": {"standard": {"query": {"match": {"text": q}}}},
        }}})  # no rescore body
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"retriever": {"rescorer": {
            "retriever": {"standard": {"query": {"match": {"text": q}}}},
            "rescore": {"query": {"rescore_query": {
                "match": {"text": ph}}}},
        }}})  # rescore_query must be a phrase


def test_dsl_parent_id_clause(dsl_index):
    """ES parent_id query: exact keyword filter on the join field
    (relation name == join field), constant score in filter context,
    composable inside bool.filter; malformed bodies refuse."""
    spec = normalize_query(
        {"parent_id": {"type": "role", "id": "user"}}
    )
    assert spec.kind == "all" and spec.where == {"role": "user"}

    s = Searcher(dsl_index)
    got = execute_dsl(s, {
        "query": {"parent_id": {"type": "role", "id": "user"}},
        "size": 5,
    })["hits"]["hits"]
    want = execute_dsl(s, {
        "query": {"constant_score": {
            "filter": {"term": {"role": "user"}}}},
        "size": 5,
    })["hits"]["hits"]
    assert [(h["_id"], h["_score"]) for h in got] \
        == [(h["_id"], h["_score"]) for h in want]
    assert all(h["_score"] == 1.0 for h in got) and len(got) == 5

    # bool.filter composition: parent_id beside a scoring match
    mixed = execute_dsl(s, {
        "query": {"bool": {
            "must": [{"match": {"text": "the w0007"}}],
            "filter": [{"parent_id": {"type": "role", "id": "user"}}],
        }},
        "size": 5,
    })["hits"]["hits"]
    assert [(h["_id"], h["_score"]) for h in mixed] \
        == s.search("the w0007", k=5, where={"role": "user"})

    with pytest.raises(UnsupportedDSL):
        normalize_query({"parent_id": {"type": "role"}})
    with pytest.raises(UnsupportedDSL):
        normalize_query({"parent_id": {"id": "user"}})
    with pytest.raises(UnsupportedDSL):
        normalize_query({"parent_id": {"type": "role", "id": "user",
                                       "boost": 2.0}})


def test_dsl_terms_ordered_by_metric_subagg(dsl_index):
    """terms agg with order:{m: desc} + one avg sub-agg dispatches to
    terms_metric_agg; every other sub-agg shape refuses."""
    s = Searcher(dsl_index)
    node = {"terms": {"field": "role", "size": 5,
                      "order": {"m": "desc"}},
            "aggs": {"m": {"avg": {"field": "turn_idx"}}}}
    got = execute_dsl(s, {"query": {"match": {"text": "the"}},
                          "size": 0, "aggs": {"by_role": node}})
    assert got["aggregations"]["by_role"] == s.terms_metric_agg(
        "the", "role", "turn_idx", size=5
    )
    bad_shapes = [
        {"terms": {"field": "role"}, "aggs": {"m": {"avg": {
            "field": "turn_idx"}}}},                       # no order
        {"terms": {"field": "role", "order": {"m": "asc"}},
         "aggs": {"m": {"avg": {"field": "turn_idx"}}}},   # asc
        {"terms": {"field": "role", "order": {"x": "desc"}},
         "aggs": {"m": {"avg": {"field": "turn_idx"}}}},   # name miss
        {"terms": {"field": "role", "order": {"m": "desc"}},
         "aggs": {"m": {"sum": {"field": "turn_idx"}}}},   # not avg
    ]
    for node in bad_shapes:
        with pytest.raises(UnsupportedDSL):
            execute_dsl(s, {"query": {"match": {"text": "the"}},
                            "size": 0, "aggs": {"a": node}})


def test_dsl_rule_retriever_pins_by_criteria(dsl_index):
    """rule retriever: rules whose criteria all match pin their ids in
    ruleset order ahead of the organic ranking (== pinned_search);
    non-matching rules contribute nothing; malformed shapes refuse."""
    s = Searcher(dsl_index)
    q = "the w0007"
    organic = s.search(q, k=8)
    pin = [organic[3][0], organic[1][0]]
    body = {"retriever": {"rule": {
        "retriever": {"standard": {"query": {"match": {"text": q}}}},
        "ruleset": [
            {"criteria": {"user_segment": "vip"}, "pinned_ids": pin},
            {"criteria": {"user_segment": "other"},
             "pinned_ids": [organic[0][0]]},
        ],
        "match_criteria": {"user_segment": "vip", "extra": "x"},
    }}, "size": 6}
    got = execute_dsl(s, body)["hits"]["hits"]
    want = s.pinned_search(pin, q, k=6)
    assert [(h["_id"], h["_score"], h["_pinned"]) for h in got] == want
    assert [h["_id"] for h in got][:2] == pin
    # no matching rule: pure organic order
    body["retriever"]["rule"]["match_criteria"] = {"user_segment": "no"}
    got2 = execute_dsl(s, body)["hits"]["hits"]
    assert [h["_id"] for h in got2] == [d for d, _ in organic[:6]]
    with pytest.raises(UnsupportedDSL):
        execute_dsl(s, {"retriever": {"rule": {
            "retriever": {"standard": {"query": {"match": {"text": q}}}},
            "ruleset": [{"pinned_ids": [1]}],
            "match_criteria": {},
        }}})
