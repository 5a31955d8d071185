"""ES _search request-body executor — the switch-over surface.

A consumer of the reference plugin queries Elasticsearch with the JSON
query DSL; this module lets those request bodies run against a
:class:`rayfts.search.Searcher` (or a sharded ``MultiSearcher`` — every
dispatched method has an exact sharded twin) without rewriting them into
engine calls. The executor NORMALIZES the ``query`` clause into the
engine's (text, mode, min_should_match, where, must_not) spec, runs the
ranked search or the filter-context scan, then dispatches each ``aggs``
entry to the engine's exact aggregation of the same name.

Deliberately a SUBSET, failing loudly: clause shapes the engine cannot
reproduce exactly raise ``UnsupportedDSL`` instead of approximating —
the contract is "what runs, runs with ES semantics", not "everything
parses". Supported today:

  query:  match (operator and/or, minimum_should_match), match_all,
          match_phrase, match_phrase_prefix, match_bool_prefix,
          query_string, constant_score(filter), term / terms / range /
          parent_id (filter context; the join relation name is the
          join field), bool{must: one match-family clause,
          filter: term/terms/range/parent_id list, must_not: one
          match/term}
  body:   size, from, sort ([{field: {order}}], doc-id tiebreak),
          min_score
  aggs:   terms, rare_terms, multi_terms, significant_terms (keyword
          field), stats, extended_stats, value_count, cardinality,
          percentiles, percentile_ranks, histogram, date_histogram,
          range, missing, filters; terms + order:{m: desc} with one
          avg metric sub-agg (the exact terms_metric_agg path)

Filter-context-only requests (no scoring clause) hit every live doc
with the ES constant_score value 1.0, ordered doc_id ascending.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class UnsupportedDSL(ValueError):
    """The request uses a clause shape this executor does not map."""


@dataclass
class QuerySpec:
    """The engine-normal form of a DSL query clause."""

    text: str | None = None          # analyzed match text (None = all)
    mode: str = "or"
    min_should_match: int | None = None
    where: dict = dc_field(default_factory=dict)
    must_not: str | None = None
    kind: str = "match"              # match | phrase | phrase_prefix |
    #                                  bool_prefix | query_string | all
    # script filter clauses: [(runtime AST, {gte/gt/lte/lt bounds})] —
    # materialized by execute_dsl as anonymous runtime fields
    scripts: list = dc_field(default_factory=list)


def _as_match(field: str, body) -> tuple[str, str, int | None]:
    """(text, mode, msm) of a match clause; str body = default or."""
    if isinstance(body, str):
        return body, "or", None
    if not isinstance(body, dict) or "query" not in body:
        raise UnsupportedDSL(f"match[{field}] needs a query")
    op = body.get("operator", "or")
    if op not in ("or", "and"):
        raise UnsupportedDSL(f"match operator {op!r}")
    msm = body.get("minimum_should_match")
    if msm is not None:
        msm = int(msm)
    return str(body["query"]), op, msm


def _filter_clause(spec: QuerySpec, clause: dict) -> None:
    """Fold one filter-context clause (term/terms/range) into where."""
    if len(clause) != 1:
        raise UnsupportedDSL(f"filter clause {sorted(clause)}")
    kind, body = next(iter(clause.items()))
    if kind == "term":
        (f, v), = body.items()
        spec.where[f] = v.get("value") if isinstance(v, dict) else v
    elif kind == "terms":
        (f, vs), = body.items()
        if not isinstance(vs, list):
            raise UnsupportedDSL("terms filter needs a value list")
        spec.where[f] = tuple(vs)
    elif kind == "range":
        (f, b), = body.items()
        if not b or set(b) - {"gte", "gt", "lte", "lt"}:
            raise UnsupportedDSL("range filter bounds gte/gt/lte/lt")
        spec.where[f] = dict(b)  # the engine's native ES-range where
    elif kind == "parent_id":
        # ES parent_id query: children joined to ONE parent. The join
        # relation name IS the join field in this engine (the same
        # convention has_child/has_parent use), so this is an exact
        # keyword filter on that field.
        if (not isinstance(body, dict) or "type" not in body
                or "id" not in body
                or set(body) - {"type", "id", "ignore_unmapped"}):
            raise UnsupportedDSL("parent_id needs type + id")
        spec.where[str(body["type"])] = body["id"]
    elif kind == "script":
        # ES script query (filter context): the engine's runtime-field
        # arithmetic AST stands in for a boolean Painless source — the
        # doc matches when the expression satisfies the bound(s):
        # {"script": {"expr": AST, "gt": 0}} (any of gte/gt/lte/lt)
        if not isinstance(body, dict) or "expr" not in body:
            raise UnsupportedDSL("script filter needs expr + bound(s)")
        bounds = {k: v for k, v in body.items()
                  if k in ("gte", "gt", "lte", "lt")}
        if not bounds or set(body) - ({"expr"} | set(bounds)):
            raise UnsupportedDSL("script filter bounds gte/gt/lte/lt")
        spec.scripts.append((body["expr"], dict(bounds)))
    else:
        raise UnsupportedDSL(f"filter clause {kind!r}")


def normalize_query(q: dict | None) -> QuerySpec:
    """DSL query dict -> engine QuerySpec (raises UnsupportedDSL)."""
    spec = QuerySpec()
    if q is None or q == {}:
        spec.kind = "all"
        return spec
    if len(q) != 1:
        raise UnsupportedDSL(f"query with keys {sorted(q)}")
    kind, body = next(iter(q.items()))
    if kind == "wrapper":
        # ES wrapper query: a base64-encoded JSON clause — decode and
        # normalize the inner clause (the whole point of the wrapper is
        # that it is transparent to execution)
        import base64
        import json

        try:
            inner = json.loads(base64.b64decode(body["query"]))
        except Exception as e:
            raise UnsupportedDSL(f"wrapper query undecodable: {e}")
        return normalize_query(inner)
    if kind == "match_all":
        spec.kind = "all"
        return spec
    if kind == "match":
        (f, b), = body.items()
        spec.text, spec.mode, spec.min_should_match = _as_match(f, b)
    elif kind in ("match_phrase", "match_phrase_prefix",
                  "match_bool_prefix"):
        (f, b), = body.items()
        spec.text = b["query"] if isinstance(b, dict) else str(b)
        spec.kind = {
            "match_phrase": "phrase",
            "match_phrase_prefix": "phrase_prefix",
            "match_bool_prefix": "bool_prefix",
        }[kind]
    elif kind == "query_string":
        spec.text = str(body["query"])
        spec.kind = "query_string"
    elif kind == "constant_score":
        inner = normalize_query(body.get("filter"))
        if inner.text is not None:
            raise UnsupportedDSL("constant_score over a scoring clause")
        inner.kind = "all"
        return inner
    elif kind in ("term", "terms", "range", "parent_id"):
        spec.kind = "all"
        _filter_clause(spec, {kind: body})
    elif kind == "bool":
        must = body.get("must", [])
        if isinstance(must, dict):
            must = [must]
        if len(must) > 1:
            raise UnsupportedDSL("bool.must supports one scoring clause")
        if must:
            inner = normalize_query(must[0])
            if inner.where or inner.must_not:
                raise UnsupportedDSL("nested bool in must")
            spec.text = inner.text
            spec.mode = inner.mode
            spec.min_should_match = inner.min_should_match
            spec.kind = inner.kind if inner.text is not None else "all"
        should = body.get("should", [])
        if should:
            if must:
                raise UnsupportedDSL("bool.should beside must")
            texts, msm = [], body.get("minimum_should_match")
            for c in should:
                if set(c) != {"match"}:
                    raise UnsupportedDSL("bool.should supports match")
                (f, b), = c["match"].items()
                t, op, _ = _as_match(f, b)
                if op != "or":
                    raise UnsupportedDSL("should clause operator=and")
                texts.append(t)
            spec.text = " ".join(texts)
            spec.min_should_match = int(msm) if msm is not None else None
        for c in body.get("filter", []) if isinstance(
                body.get("filter", []), list) else [body["filter"]]:
            _filter_clause(spec, c)
        mn = body.get("must_not", [])
        if isinstance(mn, dict):
            mn = [mn]
        if len(mn) > 1:
            raise UnsupportedDSL("bool.must_not supports one clause")
        if mn:
            c = mn[0]
            if set(c) == {"match"}:
                (f, b), = c["match"].items()
                spec.must_not = _as_match(f, b)[0]
            elif set(c) == {"term"}:
                # term-level exclusion of an ANALYZED token
                (f, v), = c["term"].items()
                spec.must_not = str(
                    v.get("value") if isinstance(v, dict) else v
                )
            else:
                raise UnsupportedDSL("must_not supports match/term")
        if spec.text is None:
            spec.kind = "all"
    else:
        raise UnsupportedDSL(f"query clause {kind!r}")
    return spec


_AGG_DISPATCH = {
    "terms": lambda s, sp, b: s.facet_counts(
        sp.text, b["field"], size=int(b.get("size", 10)),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "rare_terms": lambda s, sp, b: s.rare_terms_agg(
        sp.text, b["field"],
        max_doc_count=int(b.get("max_doc_count", 1)),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "multi_terms": lambda s, sp, b: s.multi_terms_agg(
        sp.text, [t["field"] for t in b["terms"]],
        size=int(b.get("size", 10)),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "significant_terms": lambda s, sp, b: s.significant_keyword_terms(
        sp.text, b["field"], size=int(b.get("size", 10)),
        min_doc_count=int(b.get("min_doc_count", 3)),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "stats": lambda s, sp, b: s.stats_agg(
        sp.text, b["field"], where=sp.where or None, mode=sp.mode,
        must_not=sp.must_not),
    "extended_stats": lambda s, sp, b: s.extended_stats_agg(
        sp.text, b["field"], where=sp.where or None, mode=sp.mode,
        must_not=sp.must_not),
    "value_count": lambda s, sp, b: s.value_count_agg(
        sp.text, b["field"], where=sp.where or None, mode=sp.mode,
        must_not=sp.must_not),
    "cardinality": lambda s, sp, b: s.cardinality_agg(
        sp.text, b["field"], where=sp.where or None, mode=sp.mode,
        must_not=sp.must_not),
    "percentiles": lambda s, sp, b: s.percentiles_agg(
        sp.text, b["field"],
        percents=tuple(b.get("percents", (25.0, 50.0, 75.0, 95.0,
                                          99.0))),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "percentile_ranks": lambda s, sp, b: s.percentile_ranks_agg(
        sp.text, b["field"], values=tuple(b["values"]),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "histogram": lambda s, sp, b: s.histogram_agg(
        sp.text, b["field"], float(b["interval"]),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "date_histogram": lambda s, sp, b: _agg_date_histogram(s, sp, b),
    "range": lambda s, sp, b: s.range_agg(
        sp.text, b["field"],
        [(r.get("from"), r.get("to")) for r in b["ranges"]],
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    "missing": lambda s, sp, b: s.missing_agg(
        sp.text, b["field"], where=sp.where or None, mode=sp.mode,
        must_not=sp.must_not),
    "filters": lambda s, sp, b: _agg_filters(s, sp, b),
    "date_range": lambda s, sp, b: s.date_range_agg(
        sp.text, b["field"],
        [(r.get("from"), r.get("to")) for r in b["ranges"]],
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not),
    # global escapes the query scope; the stats sub-agg field rides
    # flattened in the body ({"global": {"field": ...}}) since this
    # executor takes no nested sub-aggs
    "global": lambda s, sp, b: s.global_stats_agg(sp.text, b["field"]),
    "sampler": lambda s, sp, b: s.sampler_terms_agg(
        sp.text, b["field"],
        shard_size=int(b.get("shard_size", 100)),
        size=int(b.get("size", 10))),
}


def _execute_retriever(searcher, body: dict, knn_hits) -> dict:
    """ES retriever-API trees: rrf / linear over {standard: {query},
    knn} legs. The knn leg consumes ``knn_hits`` (rank order for rrf,
    (id, score) pairs for linear)."""
    tree = body["retriever"]
    if len(tree) != 1:
        raise UnsupportedDSL(f"retriever with keys {sorted(tree)}")
    kind, node = next(iter(tree.items()))
    if kind not in ("rrf", "linear", "text_similarity_reranker",
                    "rule", "rescorer"):
        raise UnsupportedDSL(f"retriever kind {kind!r}")
    if kind == "rescorer":
        # ES 8.18 rescorer retriever: the child retriever's top
        # window_size hits re-rank by query_weight*base +
        # rescore_weight*rescore_query score — dispatched to the
        # engine's rescore API (positional work never leaves the
        # window). The rescore query must be a match_phrase.
        child = node.get("retriever")
        if not isinstance(child, dict) or "standard" not in child:
            raise UnsupportedDSL("rescorer retriever needs a standard child")
        spec = normalize_query(child["standard"]["query"])
        if spec.kind != "match" or spec.where or spec.must_not or spec.scripts:
            raise UnsupportedDSL(
                "rescorer child supports a plain match query"
            )
        rs = node.get("rescore")
        if not isinstance(rs, dict) or "query" not in rs:
            raise UnsupportedDSL("rescorer needs a rescore body")
        rq = rs["query"].get("rescore_query", {})
        if set(rq) != {"match_phrase"}:
            raise UnsupportedDSL("rescore_query must be a match_phrase")
        phrase = next(iter(rq["match_phrase"].values()))
        rows = searcher.rescore(
            spec.text, phrase,
            window_size=int(rs.get("window_size", 10)),
            k=int(body.get("size", 10)),
            query_weight=float(rs["query"].get("query_weight", 1.0)),
            rescore_weight=float(rs["query"].get("rescore_weight", 1.0)),
        )
        return {"hits": {"hits": [
            {"_id": d, "_score": s} for d, s in rows
        ]}}
    if kind == "rule":
        # ES query-rules retriever: rules whose criteria ALL match the
        # request's match_criteria pin their ids (ruleset order, first
        # occurrence wins) ahead of the child retriever's organic
        # ranking — dispatched to the engine's pinned_search.
        child = node.get("retriever")
        if not isinstance(child, dict) or "standard" not in child:
            raise UnsupportedDSL("rule retriever needs a standard child")
        spec = normalize_query(child["standard"]["query"])
        if spec.kind != "match" or spec.where or spec.must_not or spec.scripts:
            raise UnsupportedDSL(
                "rule retriever child supports a plain match query"
            )
        ruleset = node.get("ruleset")
        mc = node.get("match_criteria")
        if not isinstance(ruleset, list) or not isinstance(mc, dict):
            raise UnsupportedDSL(
                "rule retriever needs ruleset (list) + match_criteria"
            )
        pinned, seen = [], set()
        for rule in ruleset:
            if set(rule) != {"criteria", "pinned_ids"}:
                raise UnsupportedDSL(f"rule shape {sorted(rule)}")
            if all(mc.get(k) == v for k, v in rule["criteria"].items()):
                for d in rule["pinned_ids"]:
                    if int(d) not in seen:
                        seen.add(int(d))
                        pinned.append(int(d))
        rows = searcher.pinned_search(
            pinned, spec.text, k=int(body.get("size", 10))
        )
        return {"hits": {"hits": [
            {"_id": d, "_score": s, "_pinned": p} for d, s, p in rows
        ]}}
    if knn_hits is None:
        raise UnsupportedDSL(
            "retriever needs knn_hits from the ANN stage"
        )
    if kind == "text_similarity_reranker":
        # ES 8.15 semantic reranker: the child retriever's top
        # rank_window hits reorder by the inference score — here the
        # ANN/scoring stage's (id, score) output, the knn_hits
        # contract standing in for the inference endpoint. Docs the
        # model did not score DROP (they have no rerank score).
        child = node.get("retriever")
        if not isinstance(child, dict) or "standard" not in child:
            raise UnsupportedDSL(
                "text_similarity_reranker needs a standard child"
            )
        spec = normalize_query(child["standard"]["query"])
        if spec.kind != "match" or spec.where or spec.must_not or spec.scripts:
            raise UnsupportedDSL(
                "reranker child supports a plain match query"
            )
        window = int(node.get("rank_window_size", 100))
        size = int(body.get("size", 10))
        simmap = {int(d): float(s) for d, s in knn_hits}
        rows = sorted(
            ((d, simmap[d]) for d, _ in
             searcher.search(spec.text, k=window) if d in simmap),
            key=lambda e: (-e[1], e[0]),
        )[:size]
        return {"hits": {"hits": [
            {"_id": d, "_score": s} for d, s in rows
        ]}}
    legs = node.get("retrievers", [])
    texts = [
        leg["standard"]["query"] for leg in legs if "standard" in leg
    ]
    if len(texts) != 1:
        raise UnsupportedDSL("retriever needs exactly one standard leg")
    spec = normalize_query(texts[0])
    if spec.kind != "match" or spec.where or spec.must_not or spec.scripts:
        raise UnsupportedDSL(
            "retriever standard leg supports a plain match query"
        )
    size = int(body.get("size", 10))
    window = int(node.get("rank_window_size", 100))
    if kind == "rrf":
        rows = searcher.rrf_search(
            spec.text, [d for d, _ in knn_hits], k=size,
            rank_window=window,
            rrf_k=int(node.get("rank_constant", 60)),
        )
    else:
        weights = node.get("weights", [1.0, 1.0])
        rows = searcher.linear_retriever_search(
            spec.text, list(knn_hits), k=size, rank_window=window,
            text_weight=float(weights[0]),
            knn_weight=float(weights[1] if len(weights) > 1 else 1.0),
            normalizer=node.get("normalizer", "minmax"),
        )
    return {"hits": {"hits": [
        {"_id": d, "_score": s} for d, s in rows
    ]}}


_FIXED_UNIT_S = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _agg_date_histogram(s, sp, b):
    extra = set(b) - {"field", "calendar_interval", "fixed_interval"}
    if extra:   # refuse unknown knobs, never silently default
        raise UnsupportedDSL(f"date_histogram options {sorted(extra)}")
    if "fixed_interval" in b:
        # ES fixed_interval ("90m", "1h", "7d"): a plain epoch-floor
        # histogram over the date column — the documented equivalence
        # the engine's histogram kernel implements
        if "calendar_interval" in b:
            raise UnsupportedDSL(
                "date_histogram takes calendar_interval OR fixed_interval"
            )
        import re as _re

        m = _re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
        if not m:
            raise UnsupportedDSL(
                f"fixed_interval {b['fixed_interval']!r} (N + s|m|h|d)"
            )
        secs = int(m.group(1)) * _FIXED_UNIT_S[m.group(2)]
        if secs <= 0:
            raise UnsupportedDSL("fixed_interval must be positive")
        return s.histogram_agg(
            sp.text, b["field"], float(secs),
            where=sp.where or None, mode=sp.mode, must_not=sp.must_not,
        )
    return s.date_histogram_agg(
        sp.text, b["field"],
        calendar_interval=b.get("calendar_interval", "day"),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not,
    )


def _agg_filters(s, sp, b):
    # each named filter is a filter-context clause — reuse the query
    # normalizer so term value-objects and ranges map correctly
    if "filters" not in b:
        raise UnsupportedDSL(
            "filters agg needs the ES {'filters': {name: clause}} body"
        )
    named = {}
    for name, clause in b["filters"].items():
        sub = QuerySpec()
        _filter_clause(sub, clause)
        named[name] = sub.where
    return s.filters_agg(sp.text, named, where=sp.where or None,
                         mode=sp.mode, must_not=sp.must_not)


def _terms_ordered_by_metric(s, sp: QuerySpec, node: dict) -> list:
    """ES terms agg with order: {m: desc} and one avg metric sub-agg —
    dispatches to the engine's exact terms_metric_agg. Every other
    sub-agg shape raises (the fail-loudly contract)."""
    tb, subs = node["terms"], node["aggs"]
    order = tb.get("order")
    if (not isinstance(order, dict) or len(order) != 1
            or len(subs) != 1):
        raise UnsupportedDSL(
            "terms sub-agg supports exactly order:{metric: desc} "
            "with one metric sub-agg"
        )
    (oname, direction), = order.items()
    if direction != "desc" or oname not in subs:
        raise UnsupportedDSL(
            f"terms order {order!r} must be {{<sub-agg name>: 'desc'}}"
        )
    sub = subs[oname]
    if set(sub) != {"avg"} or "field" not in sub["avg"]:
        raise UnsupportedDSL("terms order metric supports avg{field}")
    return s.terms_metric_agg(
        sp.text, tb["field"], sub["avg"]["field"],
        size=int(tb.get("size", 10)),
        where=sp.where or None, mode=sp.mode, must_not=sp.must_not,
    )


def execute_dsl(searcher, body: dict, knn_hits=None) -> dict:
    """Run one ES _search request body. Returns
    {"hits": {"hits": [{"_id", "_score"|"_sort"}...]},
     "aggregations": {name: engine-native result}}; raises
    UnsupportedDSL on clause shapes the engine does not map.

    Hybrid clauses: a top-level ``knn`` clause (ES 8 sum rule) or a
    ``retriever`` tree (``rrf`` / ``linear``) needs the ANN stage's
    result — pass it as ``knn_hits`` ([(doc_id, similarity)], the
    extras.similarity output mapped to this index's id space); the
    vector-search phase runs out in Ray Data, this call is the driver
    combine. ``highlight`` (positional builds) and ``explain: true``
    ride the hit list."""
    if "runtime_mappings" in body:
        # ES runtime fields: {name: {"type": "double", "script": AST}}
        # — the engine's arithmetic AST stands in for Painless source
        for name, node in body["runtime_mappings"].items():
            expr = node.get("script") if isinstance(node, dict) and \
                "script" in node else node
            searcher.define_runtime_field(name, expr)
    if "retriever" in body:
        return _execute_retriever(searcher, body, knn_hits)
    if "knn" in body:
        if knn_hits is None:
            raise UnsupportedDSL(
                "knn clause needs knn_hits from the ANN stage"
            )
        spec = normalize_query(body.get("query"))
        if spec.kind != "match" or spec.where or spec.must_not or spec.scripts:
            raise UnsupportedDSL(
                "knn combines with a plain match query only"
            )
        boost = float(body["knn"].get("boost", 1.0))
        hits_in = list(knn_hits)
        sim_floor = body["knn"].get("similarity")
        if sim_floor is not None:
            # ES 8.8 knn.similarity: candidates below the floor are not
            # matches — they drop BEFORE the hybrid combine, so they
            # neither score nor spend a rank
            hits_in = [
                (d, s) for d, s in hits_in if s >= float(sim_floor)
            ]
        rows = searcher.knn_hybrid_search(
            spec.text, hits_in, k=int(body.get("size", 10)),
            knn_boost=boost,
        )
        return {"hits": {"hits": [
            {"_id": d, "_score": s} for d, s in rows
        ]}}
    spec = normalize_query(body.get("query"))
    for i, (expr, bounds) in enumerate(spec.scripts):
        # script filters become anonymous runtime fields + range wheres
        name = f"__script_{i}"
        searcher.define_runtime_field(name, expr)
        spec.where[name] = bounds
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    min_score = body.get("min_score")

    # fail-loudly guards: options only exact on the plain-match path
    plain = spec.kind in ("match", "all")
    if min_score is not None and not plain:
        raise UnsupportedDSL(f"min_score with a {spec.kind} query")
    if min_score is not None and spec.text is None:
        raise UnsupportedDSL("min_score in pure filter context")
    if spec.must_not is not None and not plain:
        raise UnsupportedDSL(f"must_not beside a {spec.kind} clause")

    sort = body.get("sort")
    if sort is not None:
        if (not isinstance(sort, list) or len(sort) != 1
                or not isinstance(sort[0], dict)):
            raise UnsupportedDSL("sort supports one {field: order}")
        if not plain or spec.min_should_match is not None:
            # search_by_field's hit set is the plain match mask —
            # sorting a phrase/msm hit set would silently widen it
            raise UnsupportedDSL(
                f"sort with a {spec.kind} query"
                if not plain else "sort with minimum_should_match"
            )
        (f, o), = sort[0].items()
        order = o.get("order", "asc") if isinstance(o, dict) else o
        rows = searcher.search_by_field(
            spec.text, f, order=order, k=offset + size,
            where=spec.where or None, mode=spec.mode,
            must_not=spec.must_not,
        )[offset:]
        hits = [{"_id": d, "_sort": v} for d, v in rows]
    elif spec.kind == "all" and spec.text is None:
        # pure filter context: constant_score 1.0, doc_id ascending
        # (per-segment masks concatenate in global order when sharded)
        import numpy as np

        ids: list[int] = []
        segs = getattr(searcher, "segments", None)
        if segs is not None:
            for si, seg in enumerate(segs):
                m = seg._hit_mask(None, spec.where or None,
                                  must_not=spec.must_not)
                if m is None:
                    continue
                off = int(searcher.offsets[si])
                ids.extend(int(d) + off for d in np.flatnonzero(m))
                if len(ids) >= offset + size:
                    break
        else:
            m = searcher._hit_mask(None, spec.where or None,
                                   must_not=spec.must_not)
            if m is not None:
                ids = [int(d) for d in np.flatnonzero(m)]
        hits = [{"_id": d, "_score": 1.0}
                for d in ids[offset:offset + size]]
    else:
        def method(name: str):
            fn = getattr(searcher, name, None)
            if fn is None:
                raise UnsupportedDSL(
                    f"{name} not available on "
                    f"{type(searcher).__name__}"
                )
            return fn

        if spec.kind == "phrase":
            rows = method("search_phrase")(
                spec.text, k=offset + size, where=spec.where or None
            )[offset:]
        elif spec.kind == "phrase_prefix":
            rows = method("search_phrase_prefix")(
                spec.text, k=offset + size, where=spec.where or None
            )[offset:]
        elif spec.kind == "bool_prefix":
            rows = method("match_bool_prefix")(
                spec.text, k=offset + size, where=spec.where or None
            )[offset:]
        elif spec.kind == "query_string":
            rows = method("query_string")(
                spec.text, k=offset + size, where=spec.where or None
            )[offset:]
        elif min_score is not None:
            if spec.min_should_match is not None:
                raise UnsupportedDSL(
                    "min_score with minimum_should_match"
                )
            rows = searcher.search_min_score(
                spec.text, k=offset + size, min_score=float(min_score),
                where=spec.where or None, mode=spec.mode,
                must_not=spec.must_not,
            )[offset:]
        else:
            rows = searcher.search(
                spec.text, k=size, where=spec.where or None,
                mode=spec.mode, must_not=spec.must_not, offset=offset,
                min_should_match=spec.min_should_match,
            )
        hits = [{"_id": d, "_score": s} for d, s in rows]

    if body.get("highlight") is not None:
        if (spec.kind != "match" or spec.text is None
                or spec.min_should_match is not None or sort):
            raise UnsupportedDSL("highlight on a non-plain-match query")
        hl = body["highlight"]
        window = int(hl.get("window", 3)) if isinstance(hl, dict) else 3
        snips = {
            d: {"first_pos": p, "first_term": t, "snippet": sn}
            for d, _, p, t, sn in searcher.highlight(
                spec.text, k=offset + size, window=window,
                where=spec.where or None,
            )
        }
        for h in hits:
            if h["_id"] in snips:
                h["highlight"] = snips[h["_id"]]
    if body.get("explain"):
        if spec.kind != "match" or spec.text is None or sort:
            raise UnsupportedDSL("explain on a non-plain-match query")
        for h in hits:
            h["_explanation"] = searcher.explain(spec.text, h["_id"])

    out = {"hits": {"hits": hits}}
    aggs = body.get("aggs") or body.get("aggregations") or {}
    if aggs:
        if not plain or spec.min_should_match is not None:
            # the agg hit set is the plain match mask — aggregating a
            # phrase/prefix/query_string/msm hit set would silently
            # widen it to the OR-match set
            raise UnsupportedDSL(
                f"aggs with a {spec.kind} query" if not plain
                else "aggs with minimum_should_match"
            )
        res = {}
        for name, node in aggs.items():
            if set(node) == {"terms", "aggs"}:
                # the ONE supported sub-agg shape: terms ordered by its
                # single avg metric sub-agg (order: {m: desc})
                res[name] = _terms_ordered_by_metric(searcher, spec, node)
                continue
            if len(node) != 1:
                raise UnsupportedDSL(f"agg {name}: sub-aggs unsupported")
            akind, abody = next(iter(node.items()))
            fn = _AGG_DISPATCH.get(akind)
            if fn is None:
                raise UnsupportedDSL(f"agg kind {akind!r}")
            res[name] = fn(searcher, spec, abody)
        out["aggregations"] = res
    return out
