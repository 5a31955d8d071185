"""Driver contract for the rayfts engine (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in rayfts) calls ray.init()/ray.shutdown().

Each ``queries()`` entry is one implemented operator/pipeline from
SURVEY.md §2 (+ the training-data extras); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for everything SQL-expressible. Column names match
exactly between both sides (driver hashes values after sorting columns by
name). Float-valued results are rounded identically (see notes per query).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from rayfts import pipelines as P
from rayfts.extras import dedup as _DD  # winnow spec constants
from rayfts.extras import similarity as _SIM  # maxsim sub-vector spec
from rayfts.extras import oracles as _X
from rayfts.extras import textstats as _QF  # quality-funnel thresholds
from rayfts.search import Searcher as _S  # AUTO_DATE_LADDER for the oracle

# Token class shared with rayfts.analysis.SPLIT_PATTERN (RE2 in both engines).
_TOK = r"[\p{L}\p{N}_]+"
_MAXSIM_D = 64 // _SIM.MAXSIM_SUBS  # dims per maxsim sub-vector

_TOKS_CTE = (
    "toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
    f"'{_TOK}')) AS term FROM documents)"
)

# k-means oracle: two Lloyd iterations unrolled (init = smallest-id
# vectors, dist surrogate |c|^2 - 2 v.c, ties -> smaller cid — all
# shared with extras.similarity.kmeans_lloyd); a3 = final assignment
_KMEANS_CTES = f"""WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, i, val FROM v WHERE vec_id < {P.KMEANS_K}),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY sum(c.val * c.val) - 2 * sum(v.val * c.val),
                      c.cid) AS rn
    FROM v JOIN c0 c USING (i) GROUP BY v.vec_id, c.cid
  ) WHERE rn = 1
),
c1 AS (SELECT a1.cid, v.i, avg(v.val) AS val
       FROM v JOIN a1 USING (vec_id) GROUP BY a1.cid, v.i
       UNION ALL  -- empty cluster keeps its centroid (engine rule)
       SELECT cid, i, val FROM c0
       WHERE cid NOT IN (SELECT DISTINCT cid FROM a1)),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY sum(c.val * c.val) - 2 * sum(v.val * c.val),
                      c.cid) AS rn
    FROM v JOIN c1 c USING (i) GROUP BY v.vec_id, c.cid
  ) WHERE rn = 1
),
c2 AS (SELECT a2.cid, v.i, avg(v.val) AS val
       FROM v JOIN a2 USING (vec_id) GROUP BY a2.cid, v.i
       UNION ALL  -- empty cluster keeps its centroid (engine rule)
       SELECT cid, i, val FROM c1
       WHERE cid NOT IN (SELECT DISTINCT cid FROM a2)),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY sum(c.val * c.val) - 2 * sum(v.val * c.val),
                      c.cid) AS rn
    FROM v JOIN c2 c USING (i) GROUP BY v.vec_id, c.cid
  ) WHERE rn = 1
)"""


def _kmeans_ctes_sub(p: str, lo: int, hi: int, k: int) -> str:
    """Per-SUBSPACE Lloyd CTEs (dims lo < i <= hi of the shared ``vv``
    unnest) — the _KMEANS_CTES shape with prefixed names; the PQ oracle
    trains one block per subspace. Same pinned spec: smallest-id init,
    |c|^2 - 2 v.c surrogate, ties -> smaller cid, empty clusters keep
    their centroid."""
    def assign(src_v: str, src_c: str, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY sum(c.val * c.val) - 2 * sum(v.val * c.val),
                      c.cid) AS rn
    FROM {src_v} v JOIN {src_c} c USING (i) GROUP BY v.vec_id, c.cid
  ) WHERE rn = 1
)"""

    def means(src_a: str, prev_c: str, out: str) -> str:
        return f"""{out} AS (SELECT a.cid, v.i, avg(v.val) AS val
       FROM v{p} v JOIN {src_a} a USING (vec_id) GROUP BY a.cid, v.i
       UNION ALL
       SELECT cid, i, val FROM {prev_c}
       WHERE cid NOT IN (SELECT DISTINCT cid FROM {src_a}))"""

    return ",\n".join([
        f"v{p} AS (SELECT vec_id, i, val FROM vv "
        f"WHERE i > {lo} AND i <= {hi})",
        f"c0{p} AS (SELECT vec_id AS cid, i, val FROM v{p} "
        f"WHERE vec_id < {k})",
        assign(f"v{p}", f"c0{p}", f"a1{p}"),
        means(f"a1{p}", f"c0{p}", f"c1{p}"),
        assign(f"v{p}", f"c1{p}", f"a2{p}"),
        means(f"a2{p}", f"c1{p}", f"c2{p}"),
        assign(f"v{p}", f"c2{p}", f"a3{p}"),
    ])


# PQ ADC oracle: two per-subspace Lloyd blocks (pinned kmeans spec) ->
# per-code squared-distance LUT vs the query slice -> code gather +
# subspace sum, (dist asc, vec_id) top-10. Shared by pq_adc_top10 (flat
# code scan) and pq_ivf_adc_top10 (probe-pruned partition files with
# nprobe == n_centroids — same exact ADC result).
_PQ_ADC_SQL = f"""
WITH vv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
{_kmeans_ctes_sub('s0', 0, 32, P.PQ_CODES)},
{_kmeans_ctes_sub('s1', 32, 64, P.PQ_CODES)},
kq AS (SELECT i, val FROM vv WHERE vec_id = {P.HYBRID_QUERY_VEC}),
lut0 AS (
  SELECT c.cid, sum((k.val - c.val) * (k.val - c.val)) AS d2
  FROM c2s0 c JOIN kq k USING (i) GROUP BY c.cid
),
lut1 AS (
  SELECT c.cid, sum((k.val - c.val) * (k.val - c.val)) AS d2
  FROM c2s1 c JOIN kq k USING (i) GROUP BY c.cid
),
adc AS (
  SELECT a.vec_id, l0.d2 + l1.d2 AS dist
  FROM a3s0 a JOIN a3s1 b USING (vec_id)
       JOIN lut0 l0 ON l0.cid = a.cid
       JOIN lut1 l1 ON l1.cid = b.cid
)
SELECT vec_id, CAST(round(dist * 1e6) AS BIGINT) AS adc_e6
FROM adc ORDER BY dist, vec_id LIMIT 10
"""


_DL_CTE = (
    "dl AS (SELECT d.doc_id, count(t.term) AS dl "
    "FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY d.doc_id)"
)


def _bm25_sql(query_terms: list[str], k: int, where_sql: str = "",
              require_all: bool = False, must_not: list[str] | None = None,
              offset: int = 0, min_match: int | None = None,
              boosts: dict[str, float] | None = None) -> str:
    """``where_sql`` restricts the FINAL hits (Lucene filtered-query
    semantics: df/avgdl/N stay corpus-global, the filter only prunes).
    ``require_all`` = ES bool must rewrite (doc must match every query
    term); ``must_not`` drops docs containing any of the given terms;
    ``min_match`` = ES minimum_should_match (>= m distinct terms) —
    all candidate restrictions, never reweights. ``boosts`` maps terms to
    Lucene clause boosts (default 1.0 — the literal 1.0 multiply is a
    float no-op, so unboosted oracles are value-identical to before)."""
    mn_sql = ""
    if must_not:
        mn_terms = ",".join(f"'{t}'" for t in sorted(set(must_not)))
        mn_sql = (
            f"AND s2.doc_id NOT IN (SELECT doc_id FROM toks WHERE term IN ({mn_terms}))"
        )
        if not where_sql:
            mn_sql = "WHERE " + mn_sql[4:]
    return f"""
{_bm25_with(query_terms, require_all, min_match, boosts)}
SELECT s2.doc_id, CAST(round(s2.score * 1e6) AS BIGINT) AS score_e6
FROM scores s2 JOIN documents d2 USING (doc_id) {where_sql} {mn_sql}
ORDER BY s2.score DESC, s2.doc_id LIMIT {k} OFFSET {offset}
"""


# minimal_english S-stemmer as a DuckDB CASE (RE2 both sides) — the SQL
# twin of rayfts.analysis.minimal_english_stem; applied to the corpus
# token stream when _bm25_with(stem=True)
_STEM_CASE = (
    "CASE WHEN regexp_matches({t}, '([^ae])ies$') "
    r"THEN regexp_replace({t}, '([^ae])ies$', '\1y') "
    "WHEN regexp_matches({t}, '^.{{2,}}s$') "
    "AND NOT regexp_matches({t}, '(us|ss|[iaoe]es)$') "
    "THEN regexp_replace({t}, 's$', '') ELSE {t} END"
)


def _bm25_with(query_terms: list[str], require_all: bool = False,
               min_match: int | None = None,
               boosts: dict[str, float] | None = None,
               stops: tuple = (), stem: bool = False) -> str:
    """The shared WITH prefix ending in a ``scores(doc_id, score)`` CTE —
    BM25 over the OR hit set, accumulation ORDER BY term (the engine's
    ascending-term float op order). ``stops`` filters the token stream
    (index-time StopFilter twin): df, dl and avgdl all reflect it."""
    boosts = boosts or {}
    vals = ",".join(
        f"('{t}', {float(boosts.get(t, 1.0))!r})" for t in query_terms
    )
    having = f"HAVING count(*) = {len(query_terms)}" if require_all else ""
    if min_match is not None:
        having = f"HAVING count(*) >= {min_match}"
    toks_cte = _TOKS_CTE
    if stops:
        stop_list = ",".join(f"'{s}'" for s in sorted(stops))
        toks_cte = (
            "toks AS (SELECT doc_id, term FROM (SELECT doc_id, "
            f"unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term "
            f"FROM documents) WHERE term NOT IN ({stop_list}))"
        )
    if stem:
        # stemming is token->token 1:1, so dl (row count of toks) is
        # unchanged — only the term strings map through the S-stemmer
        stem_expr = _STEM_CASE.format(t="term")
        toks_cte = (
            f"toks AS (SELECT doc_id, {stem_expr} AS term "
            "FROM (SELECT doc_id, "
            f"unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term "
            "FROM documents))"
        )
    return f"""
WITH {toks_cte},
{_DL_CTE},
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
qterms(term, boost) AS (VALUES {vals}),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( (q.boost * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)))
              * ( tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
              ORDER BY tf.term ) AS score
  FROM tf JOIN df USING (term) JOIN qterms q USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id {having}
)"""


def _phrase_sql(slots: list[str], k: int) -> str:
    """Exact-adjacency phrase oracle: token positions via zipped
    unnest/generate_subscripts, one self-join per phrase slot, BM25 with
    pf = adjacency count and W = idf sum in SLOT order (duplicates count
    multiply) — mirrors oracle.BruteForceIndex.search_phrase exactly."""
    n = len(slots)
    df_cols = ",\n               ".join(
        f"(SELECT count(DISTINCT doc_id) FROM ptoks WHERE term='{t}') AS df{i}"
        for i, t in enumerate(slots)
    )
    slot_ctes = ",\n".join(
        f"p{i} AS (SELECT doc_id, pos FROM ptoks WHERE term='{t}')"
        for i, t in enumerate(slots)
    )
    joins = "\n  ".join(
        f"JOIN p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        for i in range(1, n)
    )
    w_expr = " + ".join(
        f"ln(1 + (s.n - f.df{i} + 0.5) / (f.df{i} + 0.5))" for i in range(n)
    )
    return f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos FROM lists),
dl AS (SELECT doc_id, len(l) AS dl FROM lists),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
dfs AS (SELECT {df_cols}),
{slot_ctes},
matches AS (
  SELECT p0.doc_id, count(*) AS pf
  FROM p0
  {joins}
  GROUP BY p0.doc_id
),
scores AS (
  SELECT m.doc_id,
         ({w_expr})
           * (m.pf * (1.2 + 1.0) / (m.pf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)))
           AS score
  FROM matches m JOIN dl d USING (doc_id) CROSS JOIN stats s CROSS JOIN dfs f
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT {k}
"""


def _phrase_scores_ctes(slots: list[str]) -> str:
    """Phrase-score CTE chain (ph_-prefixed, terminating in
    ph_scores(doc_id, score)) that composes AFTER _bm25_with — it reuses
    that prefix's dl/stats CTEs (no stop filter on the flagship index,
    so dl == len(token list))."""
    n = len(slots)
    df_cols = ",\n         ".join(
        f"(SELECT count(DISTINCT doc_id) FROM ph_ptoks WHERE term='{t}') AS df{i}"
        for i, t in enumerate(slots)
    )
    slot_ctes = ",\n".join(
        f"ph_p{i} AS (SELECT doc_id, pos FROM ph_ptoks WHERE term='{t}')"
        for i, t in enumerate(slots)
    )
    joins = "\n  ".join(
        f"JOIN ph_p{i} ON ph_p{i}.doc_id = ph_p0.doc_id "
        f"AND ph_p{i}.pos = ph_p0.pos + {i}"
        for i in range(1, n)
    )
    w_expr = " + ".join(
        f"ln(1 + (s.n - f.df{i} + 0.5) / (f.df{i} + 0.5))" for i in range(n)
    )
    return f"""
ph_lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
             FROM documents),
ph_ptoks AS (SELECT doc_id, unnest(l) AS term,
                    generate_subscripts(l, 1) - 1 AS pos FROM ph_lists),
ph_dfs AS (SELECT {df_cols}),
{slot_ctes},
ph_matches AS (
  SELECT ph_p0.doc_id, count(*) AS pf
  FROM ph_p0
  {joins}
  GROUP BY ph_p0.doc_id
),
ph_scores AS (
  SELECT m.doc_id,
         ({w_expr})
           * (m.pf * (1.2 + 1.0)
              / (m.pf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
  FROM ph_matches m JOIN dl d USING (doc_id)
       CROSS JOIN stats s CROSS JOIN ph_dfs f
)"""


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the inverted index over the
    documents corpus and run a fixed query set through the distributed
    query runner. Returns a Dataset of (query_id, query, rank, doc_id,
    score) hits."""
    from rayfts.search import run_queries

    sf_dir = "/root/testdata/sf0.001"
    index_dir = P.documents_index(sf_dir)
    flagship_queries = [
        P.BM25_QUERY,
        P.BM25_QUERY_HOT,
        "window scan merge",
        "zz_absent_zz",
        "The Data",
    ]
    return run_queries(index_dir, flagship_queries, k=10, concurrency=(1, 2))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # full-text core (SURVEY §2: M9 analyzer, A3/A4 stats, T1 top-k,
        # S8 doc-by-id, M4/M6 round-trip)
        "fts_term_stats": P.fts_term_stats,
        "fts_doc_stats": P.fts_doc_stats,
        "fts_bm25_top10": P.fts_bm25_top10,
        "fts_bm25_top10_wand": P.fts_bm25_top10_wand,
        "fts_bm25_hot_top20": P.fts_bm25_hot_top20,
        "fts_bm25_filtered_top10": P.fts_bm25_filtered_top10,
        "fts_bm25_range_top10": P.fts_bm25_range_top10,  # ES range query
        "fts_bm25_page2_offset": P.fts_bm25_page2_offset,  # ES from/size
        "fts_bm25_page2_cursor": P.fts_bm25_page2_cursor,  # ES search_after
        "fts_bm25_msm2_top10": P.fts_bm25_msm2_top10,  # minimum_should_match
        "fts_bm25_boosted_top10": P.fts_bm25_boosted_top10,  # clause boosts
        "fts_phrase_top10": P.fts_phrase_top10,      # positional PhraseQuery
        "fts_bool_top10": P.fts_bool_top10,          # ES bool must/must_not
        "fts_prefix_docs": P.fts_prefix_docs,        # PrefixQuery expansion
        "fts_index_prefix_docs": P.fts_index_prefix_docs,  # index_prefixes
        "fts_wildcard_docs": P.fts_wildcard_docs,    # WildcardQuery glob
        "fts_fuzzy_docs": P.fts_fuzzy_docs,          # FuzzyQuery (levenshtein)
        "fts_fuzzy_auto_docs": P.fts_fuzzy_auto_docs,  # fuzziness=AUTO
        "fts_wildcard_infix_docs": P.fts_wildcard_infix_docs,  # wildcard field
        "fts_facet_source": P.fts_facet_source,      # terms aggregation
        "fts_terms_other_count": P.fts_terms_other_count,  # sum_other
        "fts_profile_clauses": P.fts_profile_clauses,  # profile API
        "fts_terms_avg_order": P.fts_terms_avg_order,
        "fts_rare_terms_hits": P.fts_rare_terms,     # rare_terms over hit set
        "fts_sig_keyword_source": P.fts_sig_keyword_source,  # keyword JLH
        "fts_sig_chi2_source": P.fts_sig_chi2_source,  # chi_square heuristic
        "fts_sig_mi_source": P.fts_sig_mi_source,  # mutual_information
        "fts_dsl_bool_top10": P.fts_dsl_bool_top10,  # ES request-body exec
        "fts_multi_terms_hits": P.fts_multi_terms,   # multi_terms over hit set
        "fts_reverse_nested": P.fts_reverse_nested,  # reverse_nested agg
        "fts_terms_stats": P.fts_terms_stats,        # terms + stats sub-agg
        "fts_terms_include": P.fts_terms_include,    # terms include/exclude
        "fts_terms_missing_knob": P.fts_terms_missing_knob,  # missing + mdc
        "fts_hist_offset": P.fts_hist_offset,        # histogram offset
        "fts_hist_empty_buckets": P.fts_hist_empty_buckets,  # mdc=0 fill
        "fts_top_hits_by_source": P.fts_top_hits_by_source,  # top_hits sub-agg
        "fts_stats_nchars": P.fts_stats_nchars,      # stats aggregation
        "fts_hist_nchars": P.fts_hist_nchars,        # histogram aggregation
        "fts_sort_by_nchars_top10": P.fts_sort_by_nchars_top10,  # sort-by-field
        "fts_sort_after_page2": P.fts_sort_after_page2,  # search_after on sort
        "fts_cardinality_source": P.fts_cardinality_source,  # cardinality agg
        "fts_boosting_top10": P.fts_boosting_top10,  # boosting (soft must_not)
        "fts_random_score_top10": P.fts_random_score_top10,  # seeded random
        "fts_decay_nchars_top10": P.fts_decay_nchars_top10,  # gauss decay
        "fts_collapse_by_source": P.fts_collapse_by_source,  # field collapsing
        "fts_collapse_inner_hits": P.fts_collapse_inner_hits,
        "fts_script_score_top10": P.fts_script_score_top10,
        "fts_rrf3_top10": P.fts_rrf3_top10,
        "fts_sig_terms_bg_filter": P.fts_sig_terms_bg_filter,
        "fts_date_hist_empty_buckets": P.fts_date_hist_empty_buckets,
        "fts_date_hist_timezone": P.fts_date_hist_timezone,
        "fts_phrase_prefix_top10": P.fts_phrase_prefix_top10,  # match_phrase_prefix
        "fts_query_string_top10": P.fts_query_string_top10,  # query_string
        "fts_has_child_by_source": P.fts_has_child_by_source,  # join-field
        "fts_percolate": P.fts_percolate,            # percolator (streaming)
        "fts_span_near_docs": P.fts_span_near_docs,  # span_near query
        "fts_span_multi_docs": P.fts_span_multi_docs,  # span_multi wrapper
        "fts_span_unordered_docs": P.fts_span_unordered_docs,  # in_order=false
        "fts_span_first_docs": P.fts_span_first_docs,  # span_first query
        "fts_span_or_docs": P.fts_span_or_docs,  # span_or query
        "fts_span_not_docs": P.fts_span_not_docs,  # span_not query
        "fts_extended_stats": P.fts_extended_stats,  # extended_stats agg
        "fts_weighted_avg": P.fts_weighted_avg,      # weighted_avg agg
        "fts_value_count": P.fts_value_count,        # value_count agg
        "fts_mad_nchars": P.fts_mad_nchars,          # median_absolute_deviation
        "fts_boxplot_nchars": P.fts_boxplot_nchars,  # boxplot agg
        "fts_string_stats_source": P.fts_string_stats_source,  # string_stats
        "fts_matrix_stats": P.fts_matrix_stats,      # matrix_stats agg
        "fts_regexp_docs": P.fts_regexp_docs,        # RegexpQuery
        "fts_terms_set_docs": P.fts_terms_set_docs,  # terms_set query
        "fts_range_nchars": P.fts_range_nchars,      # range aggregation
        "fts_filters_agg": P.fts_filters_agg,        # filters aggregation
        "fts_adjacency_matrix": P.fts_adjacency_matrix,  # adjacency_matrix
        "fts_suggest_term": P.fts_suggest_term,      # term suggester
        "fts_suggest_completion": P.fts_suggest_completion,  # completion
        # completion with category contexts (in-context df weight)
        "fts_suggest_completion_ctx": P.fts_suggest_completion_ctx,
        "fts_suggest_completion_fuzzy": P.fts_suggest_completion_fuzzy,
        "fts_suggest_phrase": P.fts_suggest_phrase,  # phrase suggester (LM)
        "fts_composite_page2": P.fts_composite_page2,  # composite agg cursor
        "fts_composite_date_terms_page2": P.fts_composite_date_terms_page2,
        "fts_significant_terms": P.fts_significant_terms,  # significant_terms
        "fts_date_hist_month": P.fts_date_hist_month,  # calendar date_histogram
        "fts_date_hist_pipeline": P.fts_date_hist_pipeline,  # pipeline aggs
        "fts_bucket_script": P.fts_bucket_script,  # bucket_script ratio
        "fts_date_hist_moving": P.fts_date_hist_moving,  # moving_fn+serial_diff
        "fts_auto_date_hist": P.fts_auto_date_hist,  # auto_date_histogram
        "fts_top_metrics": P.fts_top_metrics,  # top_metrics agg
        "fts_rank_eval": P.fts_rank_eval,      # rank_eval API
        "fts_diversified_top10": P.fts_diversified_top10,  # diversified_sampler
        "fts_percentiles_nchars": P.fts_percentiles_nchars,  # percentiles agg
        "fts_percentile_ranks": P.fts_percentile_ranks,  # CDF inverse
        "fts_highlight_top10": P.fts_highlight_top10,  # highlight / snippets
        "fts_more_like_this": P.fts_more_like_this,  # MLT query
        "fts_function_score_top10": P.fts_function_score_top10,  # function_score
        "fts_rank_feature_top10": P.fts_rank_feature_top10,  # saturation boost
        "fts_rank_feature_sigmoid_top10": P.fts_rank_feature_sigmoid_top10,
        "fts_fields_top10": P.fts_fields_top10,  # fields fetch phase
        "fts_msearch": P.fts_msearch,            # _msearch body lines
        "fts_cat_stats": P.fts_cat_stats,        # _cat/_stats bookkeeping
        "fts_explain_top1": P.fts_explain_top1,  # _explain breakdown
        "fts_validate_query": P.fts_validate_query,  # _validate/query
        "fts_termvectors_top1": P.fts_termvectors_top1,  # _termvectors
        "fts_distance_feature_top10": P.fts_distance_feature_top10,
        "fts_stop_bm25_top10": P.fts_stop_bm25_top10,  # analyzer stopwords
        "fts_stem_bm25_top10": P.fts_stem_bm25_top10,  # stemmer filter
        "fts_bm25_k1b_top10": P.fts_bm25_k1b_top10,  # custom k1/b knobs
        "fts_rescore_top10": P.fts_rescore_top10,    # rescore window API
        "fts_dsl_rescorer_top10": P.fts_dsl_rescorer_top10,  # rescorer retriever
        "fts_synonym_top10": P.fts_synonym_top10,    # SynonymQuery expansion
        "fts_multi_match_top10": P.fts_multi_match_top10,  # most_fields
        "fts_combined_fields_top10": P.fts_combined_fields_top10,  # BM25F
        "fts_match_bool_prefix_top10": P.fts_match_bool_prefix_top10,
        "fts_sayt_top10": P.fts_sayt_top10,  # search_as_you_type (_2gram)
        "fts_pinned_top10": P.fts_pinned_top10,  # pinned query
        "fts_dis_max_top10": P.fts_dis_max_top10,    # best_fields / dis_max
        "fts_cross_fields_top10": P.fts_cross_fields_top10,  # cross_fields
        "fts_export_hits": P.fts_export_hits,        # scroll / full-hit export
        "fts_term_doc_count": P.fts_term_doc_count,
        "fts_terminate_after": P.fts_terminate_after,  # capped _count
        "fts_docstore_roundtrip": P.fts_docstore_roundtrip,
        "fts_compact_docstore": P.fts_compact_docstore,  # delete-by-query + forceMerge
        "fts_tags_filter_count": P.fts_tags_filter_count,  # F7 dynamic tags
        # keyword / relational / windowed (M1 filters, A1 counts, J1 join,
        # W-series windows)
        "keyword_count_by_lang": P.keyword_count_by_lang,
        "events_tumbling_1h": P.events_tumbling_1h,
        "events_sessionize": P.events_sessionize,    # session windows
        "events_eql_sequence": P.events_eql_sequence,  # EQL sequence
        "events_eql_seq3": P.events_eql_seq3,  # 3-stage EQL sequence
        "events_eql_until": P.events_eql_until,  # EQL until clause
        "sample_split_counts": P.sample_split_counts,  # hash holdout split
        "sample_shuffle_order": P.sample_shuffle_order,
        "events_hopping_2h1h": P.events_hopping_2h1h,
        "events_pivot_transform": P.events_pivot_transform,
        "events_downsample_1h": P.events_downsample_1h,  # _downsample API
        "events_transform_latest": P.events_transform_latest,  # latest mode
        "sample_stratified_counts": P.sample_stratified_counts,  # per-key quota
        "temperature_mix_counts": P.temperature_mix_counts,  # n^alpha mixing
        "quality_ntile_counts": P.quality_ntile_counts,  # curriculum deciles
        "split_leakage_audit": P.split_leakage_audit,  # cross-split leakage
        "q1_pricing": P.q1_pricing,
        "join_revenue_by_segment": P.join_revenue_by_segment,
        "semi_join_lineitem_part": P.semi_join_lineitem_part,
        "union_distinct_keys": P.union_distinct_keys,
        "events_top20_by_value": P.events_top20_by_value,
        # geo family (the reference's query payload: GeoDistance filter,
        # geo-distance sort, geo_bounding_box, geo_centroid — over a
        # deterministic (lat, lon) grid derived from event ids)
        "fts_geo_distance_sort": P.geo_distance_sort_q,
        "fts_geo_sort_after": P.geo_sort_after_q,  # geo-sort cursor page
        "fts_geo_bbox_count": P.geo_bbox_count_q,
        "fts_geo_centroid": P.geo_centroid_q,
        "fts_geo_polygon_count": P.geo_polygon_count_q,
        "fts_geo_bounds": P.geo_bounds_q,
        "fts_geo_distance_ranges": P.geo_distance_ranges_q,
        "fts_geohash_grid": P.geohash_grid_q,
        "fts_way_shapes": P.way_shapes_q,  # ESWay/ESShape.build pipeline
        "fts_geo_line": P.geo_line_q,      # geo_line aggregation
        "fts_geotile_grid": P.geotile_grid_q,
        "fts_way_envelope_relations": P.way_envelope_relations_q,
        # training-data extras (dedup / similarity / text analysis)
        "dedup_exact": P.dedup_exact_q,
        "dedup_minhash": P.dedup_minhash_q,
        # exact blocked n-gram Jaccard pairs (recall-complete in-block)
        "dedup_jaccard": P.dedup_jaccard_q,
        "dedup_cluster_sizes": P.dedup_cluster_sizes_q,  # size histogram
        "decontaminate_ngrams": P.decontaminate_q,   # eval-set leak detection
        "decontaminate_by_source": P.decontaminate_by_source_q,
        "dedup_simhash": P.dedup_simhash_q,
        "embedding_near_dup": P.embedding_near_dup_q,
        "knn_cosine_top10": P.knn_cosine_top10,
        "fts_maxsim_top10": P.fts_maxsim_top10,
        "knn_hard_negatives": P.knn_hard_negatives,
        # ES 8.8 knn similarity floor over the exact path
        "knn_similarity_cutoff": P.knn_similarity_cutoff,
        # sparse_vector / rank_features dot-product query
        "fts_sparse_vector_top10": P.fts_sparse_vector_top10,
        "knn_cosine_lsh": P.knn_cosine_lsh_q,
        "knn_cosine_ivf": P.knn_cosine_ivf_q,
        "knn_int8_rescore_top10": P.knn_int8_rescore_top10,  # SQ + rescore
        "knn_binary_rescore_top10": P.knn_binary_rescore_top10,  # BBQ
        "knn_matryoshka_top10": P.knn_matryoshka_top10,  # MRL prefix
        "knn_l2_top10": P.knn_l2_top10,  # similarity=l2_norm
        "knn_mip_top10": P.knn_mip_top10,  # similarity=max_inner_product
        "text_token_stats": P.text_token_stats,
        "text_fertility_by_lang": P.text_fertility_by_lang,
        "text_quality": P.text_quality,
        "text_repetition": P.text_repetition_q,
        "lang_id": P.lang_id_q,
        "text_fingerprint": P.text_fingerprint_q,
        "text_winnow_fingerprints": P.text_winnow_fingerprints,
        "fts_terms_subagg": P.terms_subagg_q,
        "fts_multi_terms": P.multi_terms_q,
        "fts_rare_terms": P.rare_terms_q,
        # round-5 batch 2: terms_enum API, sibling pipeline aggs,
        # t_test / scripted_metric aggs, has_parent join, sliced scroll
        "fts_terms_enum": P.fts_terms_enum,
        "fts_date_hist_siblings": P.fts_date_hist_siblings,
        "fts_t_test": P.fts_t_test,
        "fts_scripted_metric": P.fts_scripted_metric,
        "fts_has_parent": P.fts_has_parent,
        "fts_parent_id_docs": P.fts_parent_id_docs,
        "fts_export_slice": P.fts_export_slice,
        # round-5 batch 3: training-data prep — PII redaction (RE2
        # kernel chain) + sequence packing (distributed prefix scan)
        "text_redact": P.text_redact,
        "pack_chunk_stats": P.pack_chunk_stats,
        # round-5 batch 4: ES 8 hybrid retrieval (knn + query sum rule)
        "fts_hybrid_knn": P.fts_hybrid_knn,
        # variable_width_histogram: deterministic exact 1D k-means —
        # intentionally NO oracle_sql entry (the DP optimum is not
        # SQL-expressible; ES's own result is collection-order-dependent).
        # The pytest twin proves optimality by exhaustive enumeration.
        "fts_var_width_hist": P.fts_var_width_hist,
        # round-5 batch 6: ES similarity modules (same index, pluggable
        # scoring — classic TF-IDF is the reference-era ES default)
        "fts_lmd_top10": P.fts_lmd_top10,
        "fts_classic_top10": P.fts_classic_top10,
        "fts_boolean_top10": P.fts_boolean_top10,
        # round-5 batch 7: ES-default OSA fuzzy + LM quality signal
        "fts_fuzzy_osa_docs": P.fts_fuzzy_osa_docs,
        "text_unigram_xent": P.text_unigram_xent,
        # CCNet-style perplexity quartiles over the exact xent score
        "perplexity_bucket_counts": P.perplexity_bucket_counts,
        "text_bigram_xent": P.text_bigram_xent,   # conditional-LM fluency
        "fts_rrf_top10": P.fts_rrf_top10,         # reciprocal rank fusion
        "fts_linear_retriever_top10": P.fts_linear_retriever_top10,  # linear
        "pq_adc_top10": P.pq_adc_top10,           # product quantization
        "pq_ivf_adc_top10": P.pq_ivf_adc_top10,   # IVF-PQ (code partitions)
        "knn_filtered_top10": P.knn_filtered_top10,  # ES 8 knn.filter
        "passage_chunk_stats": P.passage_chunk_stats,  # RAG passage windows
        # span family completion: enclosing span queries
        "fts_span_containing_docs": P.fts_span_containing_docs,
        "fts_span_within_docs": P.fts_span_within_docs,
        # tokenizer-merge prep: corpus bigram statistic
        "vocab_top_bigrams": P.vocab_top_bigrams,
        "bpe_merge_table": P.bpe_merge_table,   # rows-only: iterative alg
        # embedding clustering: distributed Lloyd k-means
        "embedding_kmeans_sizes": P.embedding_kmeans_sizes,
        "fts_min_score_top10": P.fts_min_score_top10,  # min_score option
        # composed stage: k-means clusters as sampling strata
        "cluster_balanced_sample": P.cluster_balanced_sample,
        # intervals query: ordered max_gaps chain with any_of slots
        "fts_intervals_docs": P.fts_intervals_docs,
        # simple_query_string: lenient OR-of-AND-groups grammar
        "fts_simple_query_string_top10": P.fts_simple_query_string_top10,
        # aggregation-surface completion
        "fts_missing_count": P.fts_missing_count,      # missing agg
        "fts_global_agg": P.fts_global_agg,            # global agg
        "fts_sampler_terms": P.fts_sampler_terms,      # sampler agg
        "fts_date_range_agg": P.fts_date_range_agg,    # date_range agg
        "fts_date_hist_normalize": P.fts_date_hist_normalize,  # normalize
        "fts_date_hist_zscore": P.fts_date_hist_zscore,  # z-score method
        "fts_date_hist_bucket_sort": P.fts_date_hist_bucket_sort,
        # substring-level dedup: duplicated token-window counts per doc
        "dedup_window_spans": P.dedup_window_spans,
        # filter-context query rewrites: exists / constant_score / ids
        "fts_exists_docs": P.fts_exists_docs,
        "fts_constant_score_docs": P.fts_constant_score_docs,
        "fts_ids_docs": P.fts_ids_docs,
        # match + fuzziness: blended scoring over OSA expansions
        "fts_match_fuzzy_top10": P.fts_match_fuzzy_top10,
        # text analysis: per-source TF-IDF keyword extraction
        "doc_tfidf_keywords": P.doc_tfidf_keywords,
        # quality-filter funnel: C4/Gopher rule stack with drop counts
        "quality_filter_counts": P.quality_filter_counts,
        "prep_funnel_counts": P.prep_funnel_counts,
        # terms lookup: filter values fetched from another doc
        "fts_terms_lookup_docs": P.fts_terms_lookup_docs,
        # search template: mustache render -> standard search
        "fts_search_template_top10": P.fts_search_template_top10,
        # cumulative_cardinality: running distinct under the date hist
        "fts_cumulative_cardinality": P.fts_cumulative_cardinality,
        # moving_percentiles: trailing-window quantiles of bucket counts
        "fts_date_hist_moving_pct": P.fts_date_hist_moving_pct,
        # percentiles_bucket: sibling quantiles of the month counts
        "fts_percentiles_bucket": P.fts_percentiles_bucket,
        # random_sampler: md5-rule probability sample + terms sub-agg
        "fts_random_sampler": P.fts_random_sampler,
        # children agg: parent select -> step down -> terms sub-agg
        "fts_children_agg": P.fts_children_agg,
        # field_masking_span: cross-field span chain on one pos axis
        "fts_field_masked_span": P.fts_field_masked_span,
        # _delete_by_query: tombstone the hit set, survivors re-agg
        "fts_delete_by_query": P.fts_delete_by_query,
        # _update_by_query: ingest chain on hits + republish
        "fts_update_by_query": P.fts_update_by_query,
        # runtime fields: query-time derived numeric column in aggs
        "fts_runtime_field_stats": P.fts_runtime_field_stats,
        "fts_dsl_script_filter_top10": P.fts_dsl_script_filter_top10,
        "fts_esql_stats": P.fts_esql_stats,  # ES|QL piped language
        "fts_esql_eval": P.fts_esql_eval,    # ES|QL EVAL runtime field
        "fts_esql_grok": P.fts_esql_grok,    # ES|QL GROK/DISSECT derive
        "fts_esql_lookup": P.fts_esql_lookup,  # ES|QL LOOKUP JOIN
        "fts_esql_like": P.fts_esql_like,      # ES|QL LIKE + IN
        "fts_esql_eval_cols": P.fts_esql_eval_cols,  # EVAL col OP col
        "fts_esql_distinct": P.fts_esql_distinct,  # COUNT_DISTINCT
        "fts_esql_median": P.fts_esql_median,  # MEDIAN quantile_cont
        # Heaps-law vocabulary growth (first-occurrence histogram)
        "vocab_growth_curve": P.vocab_growth_curve,
        "vocab_zipf_slope": P.vocab_zipf_slope,
        # per-doc OOV rate vs the exact top-K corpus vocabulary
        "vocab_oov_rate": P.vocab_oov_rate,
        "text_length_gini": P.text_length_gini,
        "text_token_entropy": P.text_token_entropy,
        "text_ingest_processors": P.text_ingest_processors,
        "keyword_count_by_family": P.keyword_count_by_family,
        # grok + dissect ingest processors (field extraction)
        "text_grok_dissect": P.text_grok_dissect,
        # split/fingerprint/convert/drop processors
        "text_ingest_extract": P.text_ingest_extract,
        # ANN eval harness: LSH recall@k vs the exact baseline
        "knn_recall_at_k": P.knn_recall_at_k,
        # MMR diversity reranking (retrieve-then-diversify)
        "fts_mmr_rerank": P.fts_mmr_rerank,
        # SemDeDup: kmeans clusters + within-cluster cosine dedup
        "semantic_dedup_counts": P.semantic_dedup_counts,
        # rate agg: calendar-month counts normalized to per-day
        "fts_date_hist_rate": P.fts_date_hist_rate,
        "fts_date_hist_rate_sum": P.fts_date_hist_rate_sum,  # rate w/ field
        # bucket_correlation pipeline agg (count_correlation)
        "fts_bucket_correlation": P.fts_bucket_correlation,
        # change_point agg: scaled mean-shift scan over weekly buckets
        "fts_change_point": P.fts_change_point,
        # bucket_count_ks_test: two-sample KS over weekly CDFs
        "fts_ks_test": P.fts_ks_test,
        # ip_prefix / ip_range aggs over the derived IPv4 column
        "fts_ip_prefix": P.fts_ip_prefix,
        "fts_ip_range": P.fts_ip_range,
        # DSIR: hashed-unigram importance-weight data selection
        "dsir_select_top": P.dsir_select_top,
        # semantic decontamination: max-cosine-vs-benchmark flags
        "semantic_decontaminate_counts": P.semantic_decontaminate_counts,
        # frequent_item_sets agg: market-basket over keyword fields
        "fts_frequent_item_sets": P.fts_frequent_item_sets,
        # _analyze API: the analyzer's (token, position) stream
        "fts_analyze_text": P.fts_analyze_text,
        # categorize_text agg: masked-template buckets, top-N
        "fts_categorize_text": P.fts_categorize_text,
    }


def _mmr_sql() -> str:
    """MMR rerank twin: BM25 top-MMR_CANDS candidates, minmax rel,
    candidate-pairwise cosine, then the MMR_K greedy picks UNROLLED as
    CTE stages (the kmeans-oracle precedent — greedy selection has no
    closed relational form, so each pick is one argmax CTE)."""
    lam = P.MMR_LAMBDA
    stages = []
    stages.append(
        "sel1 AS (SELECT doc_id FROM cands ORDER BY rel DESC, doc_id "
        "LIMIT 1),\nacc1 AS (SELECT doc_id FROM sel1)"
    )
    for i in range(2, P.MMR_K + 1):
        stages.append(f"""sel{i} AS (
  SELECT c.doc_id FROM cands c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM acc{i - 1})
  ORDER BY {lam!r} * c.rel - {1.0 - lam!r} * (
      SELECT max(s.s) FROM sims s
      JOIN acc{i - 1} t ON s.db = t.doc_id
      WHERE s.da = c.doc_id
    ) DESC, c.doc_id
  LIMIT 1
),
acc{i} AS (SELECT doc_id FROM acc{i - 1}
           UNION ALL SELECT doc_id FROM sel{i})""")
    ranks = " UNION ALL ".join(
        f"SELECT {i} AS rank, doc_id FROM sel{i}"
        for i in range(1, P.MMR_K + 1)
    )
    return f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
top AS (
  SELECT doc_id, score FROM scores
  WHERE doc_id IN (SELECT vec_id FROM embeddings)
  ORDER BY score DESC, doc_id LIMIT {P.MMR_CANDS}
),
bounds AS (SELECT min(score) AS lo, max(score) AS hi FROM top),
cands AS (
  SELECT doc_id,
         CASE WHEN b.hi = b.lo THEN 1.0
              ELSE (score - b.lo) / (b.hi - b.lo) END AS rel
  FROM top CROSS JOIN bounds b
),
ce AS (
  SELECT e.vec_id AS doc_id, generate_subscripts(e.embedding, 1) AS i,
         unnest(e.embedding)::DOUBLE AS val
  FROM embeddings e
  WHERE e.vec_id IN (SELECT doc_id FROM cands)
),
nrm AS (SELECT doc_id, sqrt(sum(val * val)) AS n FROM ce GROUP BY 1),
dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db, sum(a.val * b.val) AS d
  FROM ce a JOIN ce b USING (i) GROUP BY 1, 2
),
sims AS (
  SELECT da, db, d / (na.n * nb.n) AS s
  FROM dots JOIN nrm na ON na.doc_id = da JOIN nrm nb ON nb.doc_id = db
),
{",".join(stages)}
SELECT rank, doc_id FROM ({ranks}) ORDER BY rank
"""


def _iso_epoch(iso: str) -> int:
    """UTC-midnight epoch seconds for an ISO date — the date_range
    oracle's boundary constant (mirrors Searcher.date_range_agg)."""
    import datetime as _dt

    return int(_dt.datetime.strptime(iso, "%Y-%m-%d").replace(
        tzinfo=_dt.timezone.utc).timestamp())


def _adjacency_values() -> str:
    """VALUES rows for the adjacency_matrix oracle: every named filter
    plus every pairwise AND, keys sorted with the ES 'a&b' rule."""
    cond = lambda flt: " AND ".join(  # noqa: E731
        f"{c} = '{v}'" for c, v in flt.items()
    )
    names = sorted(P.ADJ_FILTERS)
    rows = []
    for i, a in enumerate(names):
        rows.append((a, cond(P.ADJ_FILTERS[a])))
        for b in names[i + 1:]:
            rows.append((
                f"{a}&{b}",
                cond(P.ADJ_FILTERS[a]) + " AND " + cond(P.ADJ_FILTERS[b]),
            ))
    return ",\n".join(
        f"  ('{k}', (SELECT count(*) FROM h WHERE {c}))" for k, c in rows
    )


# Shared CTE for the geo oracles: derived grid points + haversine
# distance to GEO_ORIGIN (pipelines.GEO_* constants inlined — keep in
# sync). Term order mirrors rayfts.geo.haversine_km:
#   a = sin(dphi/2)^2 + (cos(phi0) * cos(phi) * sin(dlmb/2)^2)
#   d = 2 * R * asin(sqrt(least(a, 1)))
_GEO_DIST_CTE = """
WITH pts AS (
  SELECT event_id,
         (user_id * 7919) % 18000 AS lat_e2,
         (event_id * 104729) % 36000 AS lon_e2,
         ((user_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM events
), d AS (
  SELECT event_id, lat_e2, lon_e2,
         2.0 * 6371.0088 * asin(sqrt(least(
           sin(radians(lat - 37.77) / 2.0)
             * sin(radians(lat - 37.77) / 2.0)
           + (cos(radians(37.77)) * cos(radians(lat))
              * (sin(radians(lon - (-122.42)) / 2.0)
                 * sin(radians(lon - (-122.42)) / 2.0))),
           1.0))) AS dist_km
  FROM pts
)
"""


def _poly_half_plane_pred() -> str:
    """Strict half-plane containment predicate for the convex CCW
    GEO_POLY over columns (lat, lon): cross((v_j - v_i), (p - v_i)) > 0
    for every edge. Legal as the geo_polygon oracle ONLY because the
    polygon is convex and its edges avoid the data grid (see
    pipelines.GEO_POLY note); the engine side is general ray casting."""
    terms = []
    poly = P.GEO_POLY
    for i in range(len(poly)):
        (yi, xi), (yj, xj) = poly[i], poly[(i + 1) % len(poly)]
        terms.append(
            f"(({xj!r} - {xi!r}) * (lat - {yi!r})"
            f" - ({yj!r} - {yi!r}) * (lon - {xi!r})) > 0"
        )
    return "(" + "\n   AND ".join(terms) + ")"


def _morton_expr(lon_bits: int, lat_bits: int) -> str:
    """Integer arithmetic for the geohash bit-interleave (lon-first from
    the MSB, alternating): ordering by this value IS ordering by the
    geohash string (the base32 alphabet is monotonic), which is the
    engine's tie order in geohash_grid. Bit placement is derived from
    the widths so both even precisions (lon_bits == lat_bits; lon bit j
    lands at global 2j+1) and odd precisions (lon_bits == lat_bits + 1;
    lon bit j lands at global 2j) come out right."""
    total = lon_bits + lat_bits
    parts = []
    for j in range(lon_bits):
        g = total - 1 - 2 * (lon_bits - 1 - j)
        parts.append(f"((lon_bin // {1 << j}) % 2) * {1 << g}")
    for j in range(lat_bits):
        g = total - 1 - (2 * (lat_bits - 1 - j) + 1)
        parts.append(f"((lat_bin // {1 << j}) % 2) * {1 << g}")
    return "(" + " + ".join(parts) + ")"


def _geohash_lon_bits() -> int:
    """Longitude bit width at P.GEOHASH_PRECISION: a geohash char holds
    5 bits, interleaved lon-first, so lon takes the extra odd bit."""
    return (5 * P.GEOHASH_PRECISION + 1) // 2


def _geohash_lat_bits() -> int:
    return (5 * P.GEOHASH_PRECISION) // 2


def _geo_ring_values() -> str:
    """VALUES rows (key, lo, hi) for the geo_distance ring buckets,
    [from, to) with open ends; key strings are exactly the engine's
    search._range_agg_key('from-to', '*' for open) over the same
    Python float reprs so the join keys match byte-for-byte."""
    from rayfts.search import _range_agg_key

    bounds = [None, *[float(v) for v in P.GEO_RING_EDGES_KM], None]
    rows = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        lo_s = "NULL" if lo is None else f"{lo!r}"
        hi_s = "NULL" if hi is None else f"{hi!r}"
        rows.append(f"('{_range_agg_key(lo, hi)}', {lo_s}, {hi_s})")
    return ", ".join(rows)


# way-shape oracle: mirrors pipelines.way_shapes_q term for term. All
# sums — shoelace, centroid AND the length leg — are exact integer
# (BIGINT/HUGEINT) in centidegree units: each segment length snaps to
# micro-units via floor(sqrt * 1e6 + 0.5) (floor(x+0.5) is identical
# per-double on numpy and DuckDB, unlike round's half-even vs
# half-away split), so neither side depends on float summation order.
# Vertex order = event_id; closure = natural (first == last) or the
# even-user spec rule.
_WAY_SHAPES_SQL = """
WITH pts AS (
  SELECT user_id, event_id,
         (user_id * 7919 + event_id * 31) % 18000 AS y,
         (event_id * 104729) % 36000 AS x
  FROM events
), bounds AS (
  SELECT user_id, count(*) AS n,
         arg_min(x, event_id) AS fx, arg_min(y, event_id) AS fy,
         arg_max(x, event_id) AS lx, arg_max(y, event_id) AS ly
  FROM pts GROUP BY user_id
), seq AS (
  SELECT p.user_id, p.x, p.y, b.n,
         (b.n > 1 AND ((b.fx = b.lx AND b.fy = b.ly)
                       OR p.user_id % 2 = 0)) AS closed,
         (b.n > 1 AND b.fx = b.lx AND b.fy = b.ly) AS nat_closed,
         b.fx, b.fy,
         lead(p.x) OVER (PARTITION BY p.user_id ORDER BY p.event_id) AS nx,
         lead(p.y) OVER (PARTITION BY p.user_id ORDER BY p.event_id) AS ny
  FROM pts p JOIN bounds b USING (user_id)
), edges AS (
  SELECT user_id, n, closed, x, y,
         coalesce(nx, CASE WHEN closed AND NOT nat_closed THEN fx END) AS ex,
         coalesce(ny, CASE WHEN closed AND NOT nat_closed THEN fy END) AS ey
  FROM seq
), agg AS (
  SELECT user_id, max(n) AS n_pts, bool_or(closed) AS closed,
         sum(CASE WHEN ex IS NOT NULL THEN
             CAST(floor(sqrt(((ex - x) * (ex - x)
                              + (ey - y) * (ey - y))::DOUBLE)
                        * 1e6 + 0.5) AS BIGINT)
             END) AS seglen_u,
         sum(CASE WHEN ex IS NOT NULL THEN x * ey - ex * y END) AS s2,
         sum(CASE WHEN ex IS NOT NULL
             THEN (x + ex) * (x * ey - ex * y) END) AS cxn,
         sum(CASE WHEN ex IS NOT NULL
             THEN (y + ey) * (x * ey - ex * y) END) AS cyn
  FROM edges GROUP BY user_id
)
SELECT user_id, n_pts,
  CASE WHEN n_pts = 1 THEN 'POINT'
       WHEN closed THEN 'POLYGON' ELSE 'LINESTRING' END AS stype,
  CAST(floor(coalesce(seglen_u, 0)::DOUBLE / 1e6 / 100.0
             * (pi() / 180.0 * 6371.0088) * 1e3 + 0.5) AS BIGINT)
    AS length_m,
  CASE WHEN closed THEN
    CAST(floor(abs(s2::DOUBLE) / 2.0 / 1e4
               * ((pi() / 180.0 * 6371.0088) * (pi() / 180.0 * 6371.0088))
               * 1e6 + 0.5) AS BIGINT)
  ELSE 0 END AS area_e6,
  CASE WHEN closed AND s2 <> 0 THEN
    CAST(floor((cyn::DOUBLE / (3.0 * s2) / 100.0 - 90.0) * 1e6 + 0.5)
         AS BIGINT)
  END AS clat_e6,
  CASE WHEN closed AND s2 <> 0 THEN
    CAST(floor((cxn::DOUBLE / (3.0 * s2) / 100.0 - 180.0) * 1e6 + 0.5)
         AS BIGINT)
  END AS clon_e6
FROM agg
ORDER BY area_e6 DESC, length_m DESC, user_id LIMIT 20
"""


def oracle_sql() -> dict[str, str]:
    stop_list = ",".join(f"'{s}'" for s in P.STOPWORDS_SQL)
    # quality-funnel first-failing-rule classifier — shared between the
    # standalone funnel and the composed prep pipeline
    qf_cls = f"""docs_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS arr
  FROM documents
),
toksq AS (
  SELECT doc_id, unnest(arr) AS term,
         unnest(range(1, len(arr) + 1)) AS pos
  FROM docs_arr
),
tc AS (SELECT doc_id, term, count(*) AS c FROM toksq GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(c) AS tcnt, max(c) AS topc FROM tc GROUP BY 1),
grams AS (
  SELECT a.doc_id, a.term AS t1, b.term AS t2
  FROM toksq a JOIN toksq b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
gc AS (SELECT doc_id, t1, t2, count(*) AS c FROM grams GROUP BY 1, 2, 3),
gagg AS (SELECT doc_id, sum(c) AS ng,
                sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dp
         FROM gc GROUP BY 1),
cls AS (
  SELECT d.doc_id,
         CASE
           WHEN coalesce(a.tcnt, 0) < {_QF.QF_MIN_TOKENS} THEN 'min_tokens'
           WHEN a.topc * {_QF.QF_TOP_Q} > a.tcnt * {_QF.QF_TOP_P}
             THEN 'top_token'
           WHEN coalesce(g.dp, 0) * {_QF.QF_GRAM_Q}
                > coalesce(g.ng, 0) * {_QF.QF_GRAM_P} THEN 'dup_2gram'
           ELSE 'kept'
         END AS rule
  FROM documents d LEFT JOIN agg a USING (doc_id)
       LEFT JOIN gagg g USING (doc_id)
)"""
    token_stats_core = f"""
WITH {_TOKS_CTE},
st AS (
  SELECT d.doc_id,
         count(t.term) AS token_cnt,
         count(CASE WHEN t.term IN ({stop_list}) THEN 1 END) AS stop_cnt,
         coalesce(sum(length(t.term)), 0) AS len_sum
  FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY d.doc_id
)"""
    return {
        "fts_term_stats": f"""
WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM toks GROUP BY term
""",
        "fts_doc_stats": f"""
WITH {_TOKS_CTE},
{_DL_CTE}
SELECT doc_id, dl FROM dl
""",
        "fts_bm25_top10": _bm25_sql(sorted(set(P.BM25_QUERY.split())), 10),
        "fts_bm25_top10_wand": _bm25_sql(sorted(set(P.BM25_QUERY.split())), 10),
        "fts_bm25_filtered_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10, "WHERE d2.lang = 'en'"
        ),
        # ES|QL: the piped-language compile of MATCH + range + STATS BY
        "fts_esql_stats": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS total,
       max(n_chars)::BIGINT AS biggest
FROM documents JOIN hits USING (doc_id)
WHERE n_chars >= 100
GROUP BY lang ORDER BY n DESC, lang LIMIT 10
""",
        # ES|QL EVAL: derived integer column feeding STATS BY
        "fts_esql_eval": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT source, sum(n_chars * 3)::BIGINT AS s,
       max(n_chars * 3)::BIGINT AS mx
FROM documents JOIN hits USING (doc_id)
GROUP BY source ORDER BY s DESC, source LIMIT 5
""",
        # ES|QL GROK + DISSECT: the same anchored RE2 the commands
        # compile, via DuckDB regexp (regexp_matches guard — DuckDB
        # regexp_extract returns '' on no-match); null w1 forms no
        # bucket (the _field_codes -1 rule)
        "fts_esql_grok": r"""
WITH g AS (
  SELECT CASE WHEN regexp_matches(text, '^(\w+) (.*)$')
              THEN regexp_extract(text, '^(\w+) (.*)$', 1) END AS w1
  FROM documents
  WHERE lang = 'en'
    AND CASE WHEN regexp_matches(source, '^src(.*)$')
             THEN regexp_extract(source, '^src(.*)$', 1) END = '3'
)
SELECT w1, count(*)::BIGINT AS n FROM g WHERE w1 IS NOT NULL
GROUP BY w1 ORDER BY n DESC, w1 ASC LIMIT 10
""",
        # ES|QL MEDIAN: quantile_cont(0.5), floor(+0.5)-e6 both sides
        "fts_esql_median": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang,
       CAST(floor(quantile_cont(n_chars, 0.5) * 1e6 + 0.5) AS BIGINT)
         AS m,
       count(*)::BIGINT AS n
FROM documents JOIN hits USING (doc_id)
GROUP BY lang ORDER BY n DESC, lang LIMIT 5
""",
        # ES|QL COUNT_DISTINCT: exact cardinality (engine dictionary
        # codes == SQL count(DISTINCT ...))
        "fts_esql_distinct": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang, count(DISTINCT source)::BIGINT AS d, count(*)::BIGINT AS n
FROM documents JOIN hits USING (doc_id)
GROUP BY lang ORDER BY n DESC, lang LIMIT 5
""",
        # ES|QL EVAL col OP col: exact integer squared-length sums
        "fts_esql_eval_cols": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang, sum(n_chars * n_chars)::BIGINT AS s, count(*)::BIGINT AS n
FROM documents JOIN hits USING (doc_id)
GROUP BY lang ORDER BY s DESC, lang LIMIT 5
""",
        # ES|QL LIKE (*->%, ?->_) + IN membership
        "fts_esql_like": """
SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS total
FROM documents
WHERE source LIKE 'src1%' AND lang IN ('en', 'fr')
GROUP BY source ORDER BY source
""",
        # ES|QL LOOKUP JOIN: the broadcast dict replayed as a VALUES
        # inner join (unmatched langs drop — the null-bucket rule)
        "fts_esql_lookup": f"""
WITH fam(lang, family) AS (VALUES
  {", ".join(f"('{k}', '{v}')" for k, v in sorted(P.LANG_FAMILY.items()))}
)
SELECT f.family, count(*)::BIGINT AS n, sum(d.n_chars)::BIGINT AS total
FROM documents d JOIN fam f USING (lang)
GROUP BY f.family ORDER BY f.family
""",
        # script query (filter context): the AST (n_chars*7 - 100)/4
        # > 500 prunes hits; df/avgdl stay corpus-global; /4.0 and the
        # integer pre-ops are exact in both float engines
        "fts_dsl_script_filter_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10,
            "WHERE (d2.n_chars * 7 - 100) / 4.0 > 500.0",
        ),
        # ES request-body executor: bool{match must, term+range filter}
        # == the direct filtered search, one oracle for both layers
        "fts_dsl_bool_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10,
            "WHERE d2.lang = 'en' AND d2.n_chars >= 100 "
            "AND d2.n_chars <= 700",
        ),
        "fts_bm25_range_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10,
            "WHERE d2.n_chars >= 200 AND d2.n_chars < 600",
        ),
        "fts_bm25_hot_top20": _bm25_sql(sorted(set(P.BM25_QUERY_HOT.split())), 20),
        # both pagination modes face the SAME LIMIT/OFFSET oracle: the
        # offset path slices a top-20 pool, the cursor path re-enters with
        # page 1's last hit — rank-identical by construction
        "fts_bm25_page2_offset": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10, offset=10
        ),
        "fts_bm25_page2_cursor": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10, offset=10
        ),
        "fts_bm25_msm2_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10, min_match=2
        ),
        "fts_bm25_boosted_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10, boosts=P.BM25_BOOSTS
        ),
        "fts_phrase_top10": _phrase_sql(P.PHRASE_QUERY.split(), 10),
        "fts_bool_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10,
            require_all=True, must_not=P.BOOL_MUST_NOT.split(),
        ),
        "fts_prefix_docs": f"""
WITH {_TOKS_CTE}
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term LIKE '{P.PREFIX_QUERY}%'
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # index_prefixes fast path: same answer as LIKE 'da%', resolved
        # engine-side by one exact probe of the prefix-subfield term
        "fts_index_prefix_docs": f"""
WITH {_TOKS_CTE}
SELECT DISTINCT doc_id FROM toks
WHERE term LIKE '{P.IDX_PREFIX_QUERY}%'
ORDER BY doc_id LIMIT 20
""",
        # WILDCARD_QUERY "s?a*" == SQL LIKE 's_a%' (? -> _, * -> %)
        "fts_wildcard_docs": f"""
WITH {_TOKS_CTE}
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term LIKE 's_a%'
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # fuzzy expansion = closest-first, lexicographic tie-break, first
        # 50 (ES max_expansions default) — mirrored exactly by the engine
        "fts_fuzzy_docs": f"""
WITH {_TOKS_CTE},
fz AS (
  SELECT term FROM (SELECT DISTINCT term FROM toks)
  WHERE levenshtein(term, '{P.FUZZY_QUERY}') <= {P.FUZZY_EDITS}
  ORDER BY levenshtein(term, '{P.FUZZY_QUERY}'), term LIMIT 50
)
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term IN (SELECT term FROM fz)
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # wildcard field type: leading-wildcard glob == LIKE infix
        "fts_wildcard_infix_docs": f"""
WITH {_TOKS_CTE}
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term LIKE '%ustome%'
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # fuzziness=AUTO: 9-char query term -> the AUTO:3,6 ladder
        # grants 2 edits (the {len(P.FUZZY_AUTO_QUERY)}-char length band)
        "fts_fuzzy_auto_docs": f"""
WITH {_TOKS_CTE},
fz AS (
  SELECT term FROM (SELECT DISTINCT term FROM toks)
  WHERE levenshtein(term, '{P.FUZZY_AUTO_QUERY}') <= 2
  ORDER BY levenshtein(term, '{P.FUZZY_AUTO_QUERY}'), term LIMIT 50
)
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term IN (SELECT term FROM fz)
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # terms agg over the FULL hit set (docs containing any query
        # term); bucket order (count desc, value asc) truncated to 8
        "fts_facet_source": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT source, count(*) AS n_docs FROM documents JOIN hits USING (doc_id)
GROUP BY source ORDER BY n_docs DESC, source LIMIT 8
""",
        # profile API deterministic slice: per-clause df == postings ==
        # distinct-doc recount (no tombstones in the contract index),
        # scanned = the clause sum
        "fts_profile_clauses": f"""
WITH {_TOKS_CTE},
cl AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
       WHERE term IN
         ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})
       GROUP BY term)
SELECT term, df, df AS postings,
       (SELECT sum(df) FROM cl)::BIGINT AS postings_scanned
FROM cl ORDER BY term
""",
        # terms-agg metadata: exact sum_other_doc_count (sentinel row)
        # + error bound exactly 0 (untruncated-histogram merge)
        "fts_terms_other_count": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (SELECT source AS v, count(*)::BIGINT AS c
         FROM documents JOIN hits USING (doc_id) GROUP BY source),
top5 AS (SELECT v, c FROM hist ORDER BY c DESC, v LIMIT 5)
SELECT v AS source, c AS n_docs, 0::BIGINT AS err_bound FROM top5
UNION ALL
SELECT '__other__',
       (SELECT coalesce(sum(c), 0)::BIGINT FROM hist
        WHERE v NOT IN (SELECT v FROM top5)),
       0::BIGINT
""",
        # terms ordered by a metric sub-agg: exact-integer e6 avg
        # ((2e6·sum + n) // 2n — round half-up), key-asc ties
        "fts_terms_avg_order": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
b AS (SELECT source, count(*)::BIGINT AS n_docs,
             count(n_chars)::BIGINT AS n_vals,
             sum(n_chars)::HUGEINT AS s
      FROM documents JOIN hits USING (doc_id) GROUP BY source)
SELECT source, n_docs, n_vals,
       ((2000000 * s + n_vals) // (2 * n_vals))::BIGINT AS avg_nchars_e6
FROM b ORDER BY avg_nchars_e6 DESC, source LIMIT {P.TERMS_METRIC_SIZE}
""",
        # keyword significant_terms: exact fg/bg histograms, JLH with
        # the engine's op order (fgp - bgp) * (fgp / bgp)
        "fts_sig_keyword_source": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term = '{P.SIG_KEYWORD_QUERY}'),
fg AS (SELECT source, count(*) AS fdf
       FROM documents JOIN hits USING (doc_id) GROUP BY source),
tot AS (SELECT count(*) AS nh FROM hits),
bg AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
nl AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT fg.source, fdf, df,
         ((fdf::DOUBLE / nh) - (df::DOUBLE / n))
           * ((fdf::DOUBLE / nh) / (df::DOUBLE / n)) AS score
  FROM fg JOIN bg USING (source) CROSS JOIN tot CROSS JOIN nl
  WHERE fdf >= 2 AND fdf::DOUBLE / nh > df::DOUBLE / n
)
SELECT source, fdf AS fg_df, df,
       CAST(round(score * 1e9) AS BIGINT) AS score_e9
FROM sc ORDER BY score DESC, source LIMIT 6
""",
        # chi_square heuristic: exact int64 cross difference, float
        # grouping N * (diff*diff) / ((ab*cd) * (ac*bd)) — parens pinned
        "fts_sig_chi2_source": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term = '{P.SIG_KEYWORD_QUERY}'),
fg AS (SELECT source, count(*) AS fdf
       FROM documents JOIN hits USING (doc_id) GROUP BY source),
tot AS (SELECT count(*) AS nh FROM hits),
bg AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
nl AS (SELECT count(*) AS n FROM documents),
cells AS (
  SELECT fg.source, fdf, df, nh, n,
         fdf AS a, df - fdf AS b, nh - fdf AS c,
         n - df - (nh - fdf) AS d
  FROM fg JOIN bg USING (source) CROSS JOIN tot CROSS JOIN nl
  WHERE fdf >= 2 AND fdf::DOUBLE / nh > df::DOUBLE / n
),
sc AS (
  SELECT source, fdf, df,
         (CAST(n AS DOUBLE)
           * (CAST(a * d - b * c AS DOUBLE)
              * CAST(a * d - b * c AS DOUBLE)))
         / ((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE))
            * (CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))) AS score
  FROM cells
)
SELECT source, fdf AS fg_df, df,
       CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM sc ORDER BY score DESC, source LIMIT 6
""",
        # mutual_information: pointwise-MI over the 2x2 table, term
        # order (11,10,01,00) and per-term op order pinned
        "fts_sig_mi_source": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term = '{P.SIG_KEYWORD_QUERY}'),
fg AS (SELECT source, count(*) AS fdf
       FROM documents JOIN hits USING (doc_id) GROUP BY source),
tot AS (SELECT count(*) AS nh FROM hits),
bg AS (SELECT source, count(*) AS df FROM documents GROUP BY source),
nl AS (SELECT count(*) AS n FROM documents),
cells AS (
  SELECT fg.source, fdf, df, nh, n,
         fdf AS n11, nh - fdf AS n10, df - fdf AS n01,
         n - df - (nh - fdf) AS n00
  FROM fg JOIN bg USING (source) CROSS JOIN tot CROSS JOIN nl
  WHERE fdf >= 2 AND fdf::DOUBLE / nh > df::DOUBLE / n
),
sc AS (
  SELECT source, fdf, df,
    ((CASE WHEN n11 = 0 THEN 0.0 ELSE (n11::DOUBLE / n)
        * log2((CAST(n AS DOUBLE) * n11) / (CAST(nh AS DOUBLE) * df))
      END
      + CASE WHEN n10 = 0 THEN 0.0 ELSE (n10::DOUBLE / n)
        * log2((CAST(n AS DOUBLE) * n10)
               / (CAST(nh AS DOUBLE) * (n - df))) END)
     + (CASE WHEN n01 = 0 THEN 0.0 ELSE (n01::DOUBLE / n)
        * log2((CAST(n AS DOUBLE) * n01)
               / (CAST(n - nh AS DOUBLE) * df)) END
        + CASE WHEN n00 = 0 THEN 0.0 ELSE (n00::DOUBLE / n)
        * log2((CAST(n AS DOUBLE) * n00)
               / (CAST(n - nh AS DOUBLE) * (n - df))) END)) AS score
  FROM cells
)
SELECT source, fdf AS fg_df, df,
       CAST(round(score * 1e9) AS BIGINT) AS score_e9
FROM sc ORDER BY score DESC, source LIMIT 6
""",
        # significant_terms + background_filter: bg histogram and N
        # restricted to the lang slice (the reference-population knob)
        "fts_sig_terms_bg_filter": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term = '{P.SIG_KEYWORD_QUERY}'),
fg AS (SELECT source, count(*) AS fdf
       FROM documents JOIN hits USING (doc_id) GROUP BY source),
tot AS (SELECT count(*) AS nh FROM hits),
bg AS (SELECT source, count(*) AS df FROM documents
       WHERE lang = '{P.SIG_BG_LANG}' GROUP BY source),
nl AS (SELECT count(*) AS n FROM documents
       WHERE lang = '{P.SIG_BG_LANG}'),
sc AS (
  SELECT fg.source, fdf, df,
         ((fdf::DOUBLE / nh) - (df::DOUBLE / n))
           * ((fdf::DOUBLE / nh) / (df::DOUBLE / n)) AS score
  FROM fg JOIN bg USING (source) CROSS JOIN tot CROSS JOIN nl
  WHERE fdf >= 2 AND fdf::DOUBLE / nh > df::DOUBLE / n
)
SELECT source, fdf AS fg_df, df,
       CAST(round(score * 1e9) AS BIGINT) AS score_e9
FROM sc ORDER BY score DESC, source LIMIT 6
""",
        # rare_terms over the QUERY HIT SET (the Searcher-surface twin
        # of the Dataset-level fts_rare_terms): buckets with count <=
        # cutoff, (count asc, value asc); exact, no CuckooFilter
        "fts_rare_terms_hits": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang, count(*) AS n_docs FROM documents JOIN hits USING (doc_id)
GROUP BY lang HAVING count(*) <= {P.RARE_MAX_DOC_COUNT}
ORDER BY n_docs, lang
""",
        # multi_terms over the QUERY HIT SET (Searcher-surface twin of
        # the Dataset-level fts_multi_terms): (lang, source) pair
        # buckets, (count desc, key asc), top 6
        "fts_multi_terms_hits": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang, source, count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY lang, source ORDER BY n_docs DESC, lang, source LIMIT 6
""",
        # terms include/exclude: full-match regexes filter bucket keys
        # BEFORE truncation (regexp_full_match == Java matches())
        "fts_terms_include": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT source, count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
WHERE regexp_full_match(source, '{P.TERMS_INCLUDE}')
  AND NOT regexp_full_match(source, '{P.TERMS_EXCLUDE}')
GROUP BY source ORDER BY n_docs DESC, source LIMIT 20
""",
        # terminate_after: capped count + early-termination flag
        "fts_terminate_after": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT least(count(*), {P.TERMINATE_AFTER})::BIGINT AS n,
       (count(*) > {P.TERMINATE_AFTER})::BIGINT AS terminated_early
FROM hits
""",
        # terms missing + min_doc_count: NULL size_tag buckets under
        # 'untagged'; merged counts below 3 drop before truncation
        "fts_terms_missing_knob": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT coalesce(size_tag, '{P.TERMS_MISSING_VALUE}') AS size_tag,
       count(*) AS n_docs
FROM (SELECT doc_id,
             CASE WHEN n_chars >= {P.SIZE_TAG_MIN} THEN 'big' END
               AS size_tag
      FROM documents) d JOIN hits USING (doc_id)
GROUP BY 1 HAVING count(*) >= {P.TERMS_MDC}
ORDER BY n_docs DESC, size_tag LIMIT 20
""",
        # histogram min_doc_count=0: generate_series gap fill between
        # the first and last non-empty bucket
        "fts_hist_empty_buckets": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term = '{P.SIG_KEYWORD_QUERY}'),
hist AS (
  SELECT CAST(floor(n_chars / 100.0) * 100.0 AS BIGINT) AS bucket,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
),
axis AS (
  SELECT unnest(generate_series((SELECT min(bucket) FROM hist),
                                (SELECT max(bucket) FROM hist),
                                100)) AS bucket
)
SELECT a.bucket, coalesce(h.n_docs, 0)::BIGINT AS n_docs
FROM axis a LEFT JOIN hist h USING (bucket) ORDER BY a.bucket
""",
        # histogram offset: boundaries shifted by 50
        "fts_hist_offset": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(floor((n_chars - {P.HIST_OFFSET!r}) / 100.0) * 100.0
            + {P.HIST_OFFSET!r} AS BIGINT) AS bucket,
       count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY 1
""",
        # terms + stats sub-agg: per-bucket n_chars stat tuple
        "fts_terms_stats": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT source, count(*) AS n_docs, count(n_chars)::BIGINT AS n_vals,
       min(n_chars)::BIGINT AS mn, max(n_chars)::BIGINT AS mx,
       sum(n_chars)::BIGINT AS total
FROM documents JOIN hits USING (doc_id)
GROUP BY source ORDER BY n_docs DESC, source LIMIT 8
""",
        # reverse_nested: child terms buckets (lang) over the hit set,
        # each counting DISTINCT parents (source = the join field)
        "fts_reverse_nested": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT lang, count(*) AS n_docs,
       count(DISTINCT source) AS n_parents
FROM documents JOIN hits USING (doc_id)
GROUP BY lang ORDER BY n_docs DESC, lang LIMIT 20
""",
        # terms + top_hits: bucket selection = facet order (count desc,
        # value asc, top 3); in-bucket ranking = (score desc, doc_id)
        "fts_top_hits_by_source": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
bucket AS (
  SELECT source, count(*) AS n_docs
  FROM documents JOIN scores USING (doc_id)
  GROUP BY source ORDER BY n_docs DESC, source LIMIT 3
),
ranked AS (
  SELECT d.source, b.n_docs, s2.doc_id, s2.score,
         row_number() OVER (
           PARTITION BY d.source ORDER BY s2.score DESC, s2.doc_id
         ) AS rn
  FROM scores s2 JOIN documents d USING (doc_id)
       JOIN bucket b ON b.source = d.source
)
SELECT source, n_docs, doc_id,
       CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM ranked WHERE rn <= 2
""",
        "fts_stats_nchars": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT count(*) AS n_hits,
       min(n_chars) AS min_nc,
       max(n_chars) AS max_nc,
       CAST(sum(n_chars) AS BIGINT) AS sum_nc,
       CAST((sum(n_chars) * 1000000) // count(*) AS BIGINT) AS avg_e6
FROM documents JOIN hits USING (doc_id)
""",
        "fts_hist_nchars": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(floor(n_chars / 100.0) * 100 AS BIGINT) AS bucket,
       count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY 1
""",
        "fts_sort_by_nchars_top10": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT doc_id, n_chars FROM documents JOIN hits USING (doc_id)
ORDER BY n_chars DESC, doc_id LIMIT 10
""",
        # search_after on a field sort: cursor page == OFFSET on the
        # (n_chars desc, doc asc) total order
        "fts_sort_after_page2": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT doc_id, n_chars FROM documents JOIN hits USING (doc_id)
ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 10
""",
        "fts_cardinality_source": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT count(DISTINCT source) AS n_distinct
FROM documents JOIN hits USING (doc_id)
""",
        # percolator: term/bool query registry matched per doc
        "fts_percolate": f"""
WITH {_TOKS_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT doc_id, 'pq_spark_and_join' AS query_id FROM dt
WHERE term IN ('join', 'spark') GROUP BY doc_id HAVING count(*) = 2
UNION ALL
SELECT doc_id, 'pq_window' FROM dt
WHERE term = 'window'
  AND doc_id NOT IN (SELECT doc_id FROM dt WHERE term = 'slow')
GROUP BY doc_id
UNION ALL
SELECT doc_id, 'pq_two_of' FROM dt
WHERE term IN ('batch', 'scan', 'sort')
GROUP BY doc_id HAVING count(*) >= 2
UNION ALL
SELECT DISTINCT a.doc_id, 'pq_phrase' FROM
  (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
   FROM (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
         FROM documents)) a
JOIN (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
            FROM documents)) b
  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'the' AND b.term = 'batch'
""",
        # query_string: required phrase + boosted shoulds + negated term;
        # score = coalesce(term bm25, 0) + phrase score (engine op order)
        "fts_query_string_top10": f"""
{_bm25_with(["join", "spark"], boosts={"join": 2.0})},
{_phrase_scores_ctes(["the", "batch"])}
SELECT p.doc_id,
       CAST(round((coalesce(s2.score, 0.0) + p.score) * 1e6) AS BIGINT)
         AS score_e6
FROM ph_scores p LEFT JOIN scores s2 USING (doc_id)
WHERE p.doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'window')
ORDER BY (coalesce(s2.score, 0.0) + p.score) DESC, p.doc_id LIMIT 10
""",
        # has_child (join field): parents ranked by best child score
        "fts_has_child_by_source": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
grp AS (
  SELECT d2.source AS parent, max(s2.score) AS score,
         count(*) AS n_children
  FROM scores s2 JOIN documents d2 USING (doc_id)
  GROUP BY d2.source
)
SELECT parent, CAST(round(score * 1e6) AS BIGINT) AS score_e6, n_children
FROM grp ORDER BY score DESC, parent LIMIT 10
""",
        # span_near: in-order chains p1<p2<p3 with end-start-(n-1)<=slop,
        # chain count = the engine's relational spec verbatim
        "fts_span_near_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
{",".join(
    f"p{i} AS (SELECT doc_id, pos FROM ptoks WHERE term = '{t}')"
    for i, t in enumerate(P.SPAN_TERMS)
)}
SELECT a.doc_id, count(*) AS n_matches
FROM p0 a
{" ".join(
    f"JOIN p{i} s{i} ON s{i}.doc_id = a.doc_id AND s{i}.pos > "
    + ("a.pos" if i == 1 else f"s{i - 1}.pos")
    for i in range(1, len(P.SPAN_TERMS))
)}
WHERE s{len(P.SPAN_TERMS) - 1}.pos
      <= a.pos + {len(P.SPAN_TERMS) - 1 + P.SPAN_SLOP}
GROUP BY a.doc_id ORDER BY a.doc_id LIMIT 20
""",
        # unordered span_near: any-order window tuples,
        # greatest - least <= slop + k - 1 (the Lucene matchLength rule)
        "fts_span_unordered_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
{",".join(
    f"p{i} AS (SELECT doc_id, pos FROM ptoks WHERE term = '{t}')"
    for i, t in enumerate(P.SPAN_TERMS)
)}
SELECT p0.doc_id, count(*) AS n_matches
FROM p0
{" ".join(
    f"JOIN p{i} ON p{i}.doc_id = p0.doc_id"
    for i in range(1, len(P.SPAN_TERMS))
)}
WHERE greatest({", ".join(f"p{i}.pos" for i in range(len(P.SPAN_TERMS)))})
    - least({", ".join(f"p{i}.pos" for i in range(len(P.SPAN_TERMS)))})
    <= {P.SPAN_SLOP + len(P.SPAN_TERMS) - 1}
GROUP BY p0.doc_id ORDER BY p0.doc_id LIMIT 20
""",
        # span_first: 0-based position < end, per-doc qualifying count
        "fts_span_first_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists)
SELECT doc_id, count(*) AS n_matches FROM ptoks
WHERE term = '{P.SPAN_FIRST_TERM}' AND pos < {P.SPAN_FIRST_END}
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # span_or: union of single-term spans — total occurrences of any
        # clause term per doc
        "fts_span_or_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term FROM lists)
SELECT doc_id, count(*) AS n_matches FROM ptoks
WHERE term IN ({",".join(f"'{t}'" for t in sorted(set(P.SPAN_OR_TERMS)))})
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # span_not: include occurrences with NO exclude occurrence in
        # [pos - pre, pos + post] — the engine's window test verbatim
        "fts_span_not_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists)
SELECT i.doc_id, count(*) AS n_matches
FROM ptoks i
WHERE i.term = '{P.SPAN_NOT_INCLUDE}' AND NOT EXISTS (
  SELECT 1 FROM ptoks e
  WHERE e.doc_id = i.doc_id AND e.term = '{P.SPAN_NOT_EXCLUDE}'
    AND e.pos >= i.pos - {P.SPAN_NOT_PRE}
    AND e.pos <= i.pos + {P.SPAN_NOT_POST})
GROUP BY i.doc_id ORDER BY i.doc_id LIMIT 20
""",
        # extended_stats: integer-exact sum/sum_sq + variance numerator
        "fts_extended_stats": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT count(*) AS n_hits,
       CAST(sum(n_chars) AS BIGINT) AS sum_nc,
       CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq,
       CAST(count(*) * sum(n_chars * n_chars)
            - sum(n_chars) * sum(n_chars) AS BIGINT) AS var_num
FROM documents JOIN hits USING (doc_id)
""",
        # weighted_avg: exact integer numerator/denominator
        "fts_weighted_avg": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT count(*) AS n_hits,
       CAST(sum(n_chars * doc_id) AS BIGINT) AS num,
       CAST(sum(doc_id) AS BIGINT) AS den
FROM documents JOIN hits USING (doc_id)
""",
        # regexp query: DuckDB regexp_full_match == the engine's anchored
        # RE2 over the term dictionary (both are RE2)
        "fts_regexp_docs": f"""
WITH {_TOKS_CTE}
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE regexp_full_match(term, '{P.REGEXP_QUERY}')
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # terms_set: >= min distinct terms of the set
        "fts_terms_set_docs": f"""
WITH {_TOKS_CTE}
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term IN ({",".join(f"'{t}'" for t in sorted(P.TERMS_SET))})
GROUP BY doc_id HAVING count(DISTINCT term) >= {P.TERMS_SET_MIN}
ORDER BY doc_id LIMIT 20
""",
        # match_phrase_prefix: last slot expanded (sorted-first, max 50),
        # pf sums disjoint member alignments, W = fixed idfs + blended
        # idf (df = max over expansion members) in engine op order
        "fts_phrase_prefix_top10": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
dl AS (SELECT doc_id, len(l) AS dl FROM lists),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl) * 1.0
                   / (SELECT count(*) FROM documents) AS avgdl),
exp AS (SELECT DISTINCT term FROM ptoks
        WHERE term LIKE '{P.PHRASE_PREFIX_QUERY.split()[-1]}%'
        ORDER BY term LIMIT 50),
dfb AS (SELECT max(df) AS v FROM (
  SELECT count(DISTINCT doc_id) AS df FROM ptoks
  WHERE term IN (SELECT term FROM exp) GROUP BY term)),
f0 AS (SELECT count(DISTINCT doc_id) AS df FROM ptoks
       WHERE term = '{P.PHRASE_PREFIX_QUERY.split()[0]}'),
p0 AS (SELECT doc_id, pos FROM ptoks
       WHERE term = '{P.PHRASE_PREFIX_QUERY.split()[0]}'),
pl AS (SELECT doc_id, pos FROM ptoks
       WHERE term IN (SELECT term FROM exp)),
matches AS (SELECT p0.doc_id, count(*) AS pf
            FROM p0 JOIN pl ON pl.doc_id = p0.doc_id
                           AND pl.pos = p0.pos + 1
            GROUP BY 1),
scores AS (
  SELECT m.doc_id,
         (ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
          + ln(1 + (s.n - b.v + 0.5) / (b.v + 0.5)))
           * (m.pf * (1.2 + 1.0)
              / (m.pf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
  FROM matches m JOIN dl d USING (doc_id)
  CROSS JOIN stats s CROSS JOIN f0 f CROSS JOIN dfb b
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # range agg: independent from-inclusive/to-exclusive buckets
        "fts_range_nchars": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
h AS (SELECT n_chars, lang, source FROM documents JOIN hits USING (doc_id))
SELECT * FROM (VALUES
{",".join(
    "  ('" + ("*" if f is None else str(f)) + "-" + ("*" if t is None else str(t))
    + "', (SELECT count(*) FROM h WHERE 1=1"
    + (f" AND n_chars >= {f}" if f is not None else "")
    + (f" AND n_chars < {t}" if t is not None else "") + "))"
    for f, t in P.RANGE_BUCKETS
)}
) t(bucket, n_docs)
""",
        # filters agg: named keyword-filter buckets over the hit set
        "fts_filters_agg": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
h AS (SELECT lang, source FROM documents JOIN hits USING (doc_id))
SELECT * FROM (VALUES
{",".join(
    "  ('" + name + "', (SELECT count(*) FROM h WHERE "
    + " AND ".join(f"{col} = '{val}'" for col, val in flt.items()) + "))"
    for name, flt in P.FILTER_BUCKETS
)}
) t(name, n_docs)
""",
        # random_score: seeded md5-prefix factor, deterministic
        "fts_random_score_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round((s2.score *
         (CAST(('0x' || substr(md5('7:' || CAST(s2.doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) / 4294967296.0)) * 1e6)
            AS BIGINT) AS score_e6
FROM scores s2
ORDER BY s2.score *
  (CAST(('0x' || substr(md5('7:' || CAST(s2.doc_id AS VARCHAR)),
                 1, 8)) AS BIGINT) / 4294967296.0) DESC, s2.doc_id
LIMIT 10
""",
        # boosting query: demote-not-exclude (score * nb | 1.0)
        "fts_boosting_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round((s2.score * CASE WHEN s2.doc_id IN
         (SELECT doc_id FROM toks WHERE term = '{P.BOOL_MUST_NOT}')
         THEN 0.5 ELSE 1.0 END) * 1e6) AS BIGINT) AS score_e6
FROM scores s2
ORDER BY s2.score * CASE WHEN s2.doc_id IN
  (SELECT doc_id FROM toks WHERE term = '{P.BOOL_MUST_NOT}')
  THEN 0.5 ELSE 1.0 END DESC, s2.doc_id
LIMIT 10
""",
        # gauss decay: factor == decay at |v-origin| == scale; float op
        # order matches the engine verbatim
        "fts_decay_nchars_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round((s2.score * exp(
         (-((CAST(d2.n_chars AS DOUBLE) - 200.0)
            * (CAST(d2.n_chars AS DOUBLE) - 200.0)))
         * ln(1.0 / 0.5) / (100.0 * 100.0))) * 1e6) AS BIGINT) AS score_e6
FROM scores s2 JOIN documents d2 USING (doc_id)
ORDER BY s2.score * exp(
  (-((CAST(d2.n_chars AS DOUBLE) - 200.0)
     * (CAST(d2.n_chars AS DOUBLE) - 200.0)))
  * ln(1.0 / 0.5) / (100.0 * 100.0)) DESC, s2.doc_id
LIMIT 10
""",
        # adjacency_matrix: named filters + pairwise intersections,
        # empty buckets omitted
        "fts_adjacency_matrix": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
h AS (SELECT lang, source FROM documents JOIN hits USING (doc_id))
SELECT * FROM (VALUES
{_adjacency_values()}
) t(key, n_docs) WHERE n_docs > 0
""",
        # field collapsing: best hit per source (row_number twin of the
        # engine's per-group lexsort argmax), groups ranked by best hit
        "fts_collapse_by_source": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
grp AS (
  SELECT s2.doc_id, s2.score, d2.source,
         row_number() OVER (PARTITION BY d2.source
                            ORDER BY s2.score DESC, s2.doc_id) AS rn
  FROM scores s2 JOIN documents d2 USING (doc_id)
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6, source
FROM grp WHERE rn = 1 ORDER BY score DESC, doc_id LIMIT 10
""",
        # script_score: 2·bm25 + n_chars/100 (the pinned AST), raw-score
        # order with doc tiebreak, e6 emit — the collapse precedent
        "fts_script_score_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s.doc_id,
       CAST(round((s.score * 2 + d.n_chars / 100) * 1e6) AS BIGINT)
         AS score_e6
FROM scores s JOIN documents d USING (doc_id)
ORDER BY (s.score * 2 + d.n_chars / 100) DESC, s.doc_id LIMIT 10
""",
        # collapse + inner_hits: top-k groups by best hit, each with its
        # own top-n hits (rn = the engine's 1-based inner rank)
        "fts_collapse_inner_hits": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
grp AS (
  SELECT s2.doc_id, s2.score, d2.source,
         row_number() OVER (PARTITION BY d2.source
                            ORDER BY s2.score DESC, s2.doc_id) AS rn
  FROM scores s2 JOIN documents d2 USING (doc_id)
),
heads AS (
  SELECT source, row_number() OVER (ORDER BY score DESC, doc_id) AS gr
  FROM grp WHERE rn = 1
)
SELECT g.source, g.rn AS inner_rank, g.doc_id,
       CAST(round(g.score * 1e6) AS BIGINT) AS score_e6
FROM grp g JOIN heads h USING (source)
WHERE h.gr <= {P.COLLAPSE_IH_GROUPS} AND g.rn <= {P.COLLAPSE_IH_N}
ORDER BY h.gr, g.rn
""",
        # term suggester: normalized-Levenshtein rule replicated exactly
        # (score = 1 - dist/max(len(token), len(term)); missing-mode inputs
        # chosen OOV; prefix_length=1, max_edits=2, accuracy=0.5, size=5)
        "fts_suggest_term": f"""
WITH {_TOKS_CTE},
v AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
inp(token) AS (VALUES {",".join(f"('{t}')" for t in P.SUGGEST_TEXT.split())}),
cand AS (
  SELECT i.token, v.term, v.df, 1.0 - levenshtein(v.term, i.token)
           / greatest(length(i.token), length(v.term)) AS score
  FROM inp i JOIN v ON v.term LIKE substr(i.token, 1, 1) || '%'
  WHERE levenshtein(v.term, i.token) BETWEEN 1 AND 2
    AND NOT EXISTS (SELECT 1 FROM v vv WHERE vv.term = i.token)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY token ORDER BY score DESC, df DESC, term) AS rn
  FROM cand WHERE score >= 0.5
)
SELECT token, term AS suggestion, df,
       CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM ranked WHERE rn <= 5
""",
        # completion suggester: prefix completions weighted by df
        "fts_suggest_completion": f"""
WITH {_TOKS_CTE},
v AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term, df FROM v WHERE term LIKE '{P.COMPLETE_PREFIX}%'
ORDER BY df DESC, term LIMIT 10
""",
        # fuzzy completion: 1-char exact anchor + levenshtein <= 1 on
        # the query-prefix-length head, rank unchanged (df desc, term)
        "fts_suggest_completion_fuzzy": f"""
WITH {_TOKS_CTE},
v AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term, df FROM v
WHERE substr(term, 1, 1) = '{P.FUZZY_COMPLETION_PREFIX[0]}'
  AND levenshtein('{P.FUZZY_COMPLETION_PREFIX}',
                  substr(term, 1, {len(P.FUZZY_COMPLETION_PREFIX)})) <= 1
ORDER BY df DESC, term LIMIT 5
""",
        # completion contexts: df within the lang filter
        "fts_suggest_completion_ctx": f"""
WITH {_TOKS_CTE},
v AS (
  SELECT term, count(DISTINCT t.doc_id) AS df
  FROM toks t JOIN documents d USING (doc_id)
  WHERE d.lang = '{P.COMPLETE_CTX_LANG}' GROUP BY term
)
SELECT term, df FROM v WHERE term LIKE '{P.COMPLETE_PREFIX}%'
ORDER BY df DESC, term LIMIT 8
""",
        # phrase suggester: StupidBackoff bigram LM replicated float-op
        # exact — uni(w) = (cf+0.5)/(total+1), S = bg/cf(a) | 0.4*uni(b),
        # score = ln(uni(w0)) + ln(S(w1|w0)); candidates per slot = the
        # original token + term-suggester top-3 (always mode)
        "fts_suggest_phrase": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
v AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
      FROM ptoks GROUP BY term),
tot AS (SELECT sum(cf) * 1.0 AS total FROM v),
big AS (SELECT a.term AS ta, b.term AS tb, count(*) AS c
        FROM ptoks a JOIN ptoks b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2),
c0 AS (
  SELECT term, df, 1.0 - levenshtein(term, '{P.PHRASE_SUGGEST_TEXT.split()[0]}')
           / greatest({len(P.PHRASE_SUGGEST_TEXT.split()[0])}, length(term)) AS score
  FROM v WHERE term LIKE '{P.PHRASE_SUGGEST_TEXT.split()[0][0]}%'
    AND levenshtein(term, '{P.PHRASE_SUGGEST_TEXT.split()[0]}') BETWEEN 1 AND 2
),
c0top AS (SELECT term FROM c0 WHERE score >= 0.5
          ORDER BY score DESC, df DESC, term LIMIT 3),
cand0 AS (SELECT '{P.PHRASE_SUGGEST_TEXT.split()[0]}' AS w
          UNION ALL SELECT term FROM c0top),
c1 AS (
  SELECT term, df, 1.0 - levenshtein(term, '{P.PHRASE_SUGGEST_TEXT.split()[1]}')
           / greatest({len(P.PHRASE_SUGGEST_TEXT.split()[1])}, length(term)) AS score
  FROM v WHERE term LIKE '{P.PHRASE_SUGGEST_TEXT.split()[1][0]}%'
    AND levenshtein(term, '{P.PHRASE_SUGGEST_TEXT.split()[1]}') BETWEEN 1 AND 2
),
c1top AS (SELECT term FROM c1 WHERE score >= 0.5
          ORDER BY score DESC, df DESC, term LIMIT 3),
cand1 AS (SELECT '{P.PHRASE_SUGGEST_TEXT.split()[1]}' AS w
          UNION ALL SELECT term FROM c1top),
ph AS (SELECT c0.w AS w0, c1.w AS w1 FROM cand0 c0 CROSS JOIN cand1 c1
       WHERE NOT (c0.w = '{P.PHRASE_SUGGEST_TEXT.split()[0]}'
                  AND c1.w = '{P.PHRASE_SUGGEST_TEXT.split()[1]}')),
scored AS (
  SELECT w0 || ' ' || w1 AS phrase,
    ln((coalesce((SELECT cf FROM v WHERE term = w0), 0) + 0.5) / (total + 1.0))
    + CASE WHEN coalesce((SELECT c FROM big WHERE ta = w0 AND tb = w1), 0) > 0
        THEN ln((SELECT c FROM big WHERE ta = w0 AND tb = w1) * 1.0
                / (SELECT cf FROM v WHERE term = w0))
        ELSE ln(0.4 * ((coalesce((SELECT cf FROM v WHERE term = w1), 0) + 0.5)
                       / (total + 1.0)))
      END AS score
  FROM ph CROSS JOIN tot
)
SELECT phrase, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scored ORDER BY score DESC, phrase LIMIT 3
""",
        # composite agg: value-asc buckets, after_key == OFFSET here
        # (values are unique and ordered)
        "fts_composite_page2": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT source, count(*) AS n_docs FROM documents JOIN hits USING (doc_id)
GROUP BY source ORDER BY source OFFSET 5 LIMIT 5
""",
        # significant_terms (JLH): score = (fg/nh - df/n) * ((fg/nh)/(df/n)),
        # identical float op order engine-side
        "fts_significant_terms": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
fg AS (SELECT term, count(DISTINCT doc_id) AS fg FROM toks
       JOIN hits USING (doc_id) GROUP BY term),
bg AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
c AS (SELECT (SELECT count(*) FROM documents) AS n,
             (SELECT count(*) FROM hits) AS nh)
SELECT term, fg, df,
       CAST(round(((fg * 1.0 / nh - df * 1.0 / n)
                   * ((fg * 1.0 / nh) / (df * 1.0 / n))) * 1e6) AS BIGINT)
         AS score_e6
FROM fg JOIN bg USING (term) CROSS JOIN c
WHERE fg >= 3 AND fg * 1.0 / nh > df * 1.0 / n
ORDER BY (fg * 1.0 / nh - df * 1.0 / n) * ((fg * 1.0 / nh) / (df * 1.0 / n))
         DESC, term
LIMIT 10
""",
        # ts_epoch is the docstore's synthetic timestamp column — derived
        # from doc_id with the SAME constants on both sides (TS_EPOCH0 +
        # 7h per doc); month buckets are true calendar months
        # time_zone fixed offset: truncate shifted wall time, unshift —
        # keys are UTC epoch of the LOCAL day start
        "fts_date_hist_timezone": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(epoch(date_trunc('day',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200
                         + {P.DATE_HIST_TZ_OFFSET_S}) * 1000000)))
       AS BIGINT) - {P.DATE_HIST_TZ_OFFSET_S} AS day_start,
       count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY 1
""",
        # min_doc_count=0: generate_series over the in-range day axis,
        # zero-coalesced left join — the engine's calendar_range fill
        "fts_date_hist_empty_buckets": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
b AS (
  SELECT CAST(epoch(date_trunc('day',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000)))
         AS BIGINT) AS day_start,
         count(*) AS n
  FROM documents JOIN hits USING (doc_id)
  WHERE lang = 'zh' GROUP BY 1
),
axis AS (
  SELECT CAST(epoch(unnest(generate_series(
    (SELECT to_timestamp(min(day_start)) FROM b),
    (SELECT to_timestamp(max(day_start)) FROM b),
    INTERVAL 1 DAY))) AS BIGINT) AS day_start
)
SELECT a.day_start, coalesce(b.n, 0)::BIGINT AS n_docs
FROM axis a LEFT JOIN b USING (day_start) ORDER BY a.day_start
""",
        "fts_date_hist_month": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(epoch(date_trunc('month',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
         AS month_start,
       count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY 1
""",
        # two-source composite page 2: cursor == OFFSET on the ordered
        # (month, source) key set
        "fts_composite_date_terms_page2": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(epoch(date_trunc('month',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
         AS month_start,
       source, count(*) AS n_docs
FROM documents JOIN hits USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
LIMIT {P.COMPOSITE2_PAGE} OFFSET {P.COMPOSITE2_PAGE}
""",
        # bucket_script: ratio of the sum sub-agg to doc_count per
        # month bucket, pinned by flooring the single-divide double
        "fts_bucket_script": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(epoch(date_trunc('month',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
         AS month_start,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS sum_nchars,
       CAST(floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 1e6)
            AS BIGINT) AS ratio_e6
FROM documents JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY 1
""",
        # pipeline aggs: window functions over the date_histogram buckets
        "fts_date_hist_pipeline": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT month_start, n_docs,
       CAST(sum(n_docs) OVER (ORDER BY month_start) AS BIGINT) AS cum_docs,
       CAST(n_docs - coalesce(lag(n_docs) OVER (ORDER BY month_start), 0)
            AS BIGINT) AS deriv
FROM hist ORDER BY month_start
""",
        # moving_fn: trailing window incl. current (ROWS BETWEEN w-1
        # PRECEDING), totality at the series head via short windows;
        # serial_diff: coalesce(lag(n, L), 0) — the derivative convention
        "fts_date_hist_moving": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT month_start, n_docs,
  CAST(sum(n_docs) OVER w AS BIGINT) AS mov_sum,
  CAST(count(*) OVER w AS BIGINT) AS mov_cnt,
  CAST(round((sum(n_docs) OVER w)::DOUBLE / (count(*) OVER w) * 1e6)
       AS BIGINT) AS mov_avg_e6,
  CAST(min(n_docs) OVER w AS BIGINT) AS mov_min,
  CAST(max(n_docs) OVER w AS BIGINT) AS mov_max,
  CAST(n_docs - coalesce(lag(n_docs, {P.SERIAL_LAG})
                         OVER (ORDER BY month_start), 0) AS BIGINT) AS sdiff
FROM hist
WINDOW w AS (ORDER BY month_start
             ROWS BETWEEN {P.MOVING_WINDOW - 1} PRECEDING AND CURRENT ROW)
ORDER BY month_start
""",
        # auto_date_histogram: smallest fixed-seconds ladder rung whose
        # spanned bucket count fits the target, then the plain
        # floor(ts/i)*i histogram — interval choice mirrored exactly
        "fts_auto_date_hist": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT ({P.TS_EPOCH0} + doc_id * 25200) AS ts
      FROM documents JOIN hits USING (doc_id)),
mm AS (SELECT min(ts) AS mn, max(ts) AS mx FROM v),
ladder(i) AS (VALUES {",".join(f"({v})" for v in _S.AUTO_DATE_LADDER)}),
sel AS (SELECT coalesce(min(i), {_S.AUTO_DATE_LADDER[-1]}) AS iv
        FROM ladder, mm
        WHERE floor(mx / i) - floor(mn / i) + 1 <= {P.AUTO_HIST_TARGET})
SELECT (SELECT iv FROM sel) AS interval_s,
       CAST(floor(ts / (SELECT iv FROM sel)) * (SELECT iv FROM sel)
            AS BIGINT) AS bucket_start,
       count(*) AS n_docs
FROM v GROUP BY 2 ORDER BY 2
""",
        # diversified_sampler: per-value rank cutoff in the global
        # (score desc, doc_id) order — row_number PARTITION BY value;
        # NULL keys never diversify away
        "fts_diversified_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
, sel AS (
  SELECT s.doc_id, s.score, d.source,
         CASE WHEN d.source IS NULL THEN 0
              ELSE row_number() OVER (PARTITION BY d.source
                                      ORDER BY s.score DESC, s.doc_id)
         END AS rnk
  FROM scores s JOIN documents d USING (doc_id))
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM sel WHERE source IS NULL OR rnk <= {P.DIVERSIFIED_MAX_PER_KEY}
ORDER BY score DESC, doc_id LIMIT 10
""",
        # top_metrics: top-size by sort field (doc_id tiebreak, valued
        # rows only), metrics gathered per row; rank pins the order
        "fts_top_metrics": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT doc_id, n_chars,
             CAST({P.TS_EPOCH0} + doc_id * 25200 AS BIGINT) AS ts_epoch
      FROM documents JOIN hits USING (doc_id)
      WHERE n_chars IS NOT NULL)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
              AS BIGINT) AS rank,
         doc_id, n_chars, ts_epoch
  FROM v
) WHERE rank <= {P.TOP_METRICS_SIZE} ORDER BY rank
""",
        # rank_eval: ranking = the bm25 scores CTE's (score desc, doc_id)
        # order; judgment = lang='en'; dcg sums 1/log2(rn+1) rank-asc
        "fts_rank_eval": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
, ranked AS (SELECT s.doc_id,
             row_number() OVER (ORDER BY s.score DESC, s.doc_id) AS rn
             FROM scores s)
, rel AS (SELECT r.rn FROM ranked r JOIN documents d USING (doc_id)
          WHERE r.rn <= {P.RANK_EVAL_K} AND d.lang = 'en')
SELECT {P.RANK_EVAL_K} AS k,
  (SELECT count(*) FROM rel) AS rel_at_k,
  (SELECT count(*) FROM documents WHERE lang = 'en') AS n_rel,
  CAST(round((SELECT count(*) FROM rel) / {float(P.RANK_EVAL_K)!r} * 1e6)
       AS BIGINT) AS precision_e6,
  CAST(round(coalesce(1.0 / (SELECT min(rn) FROM rel), 0.0) * 1e6)
       AS BIGINT) AS rr_e6,
  CAST(round(coalesce(
      (SELECT sum(1.0 / log2(rn + 1) ORDER BY rn) FROM rel), 0.0) * 1e6)
       AS BIGINT) AS dcg_e6,
  CAST(floor(coalesce(
      (SELECT sum(1.0 / log2(rn + 1) ORDER BY rn) FROM rel), 0.0)
      / (SELECT sum(CASE WHEN i <= (SELECT count(*) FROM documents
                                    WHERE lang = 'en')
                         THEN 1.0 / log2(i + 1) ELSE 0.0 END
                    ORDER BY i)
         FROM generate_series(1, {P.RANK_EVAL_K}) AS t(i)) * 1e6 + 0.5)
       AS BIGINT) AS ndcg_e6,
  CAST(floor(coalesce(
      (SELECT sum(power(0.5, rj) / rn ORDER BY rn)
       FROM (SELECT rn, row_number() OVER (ORDER BY rn) AS rj
             FROM rel)), 0.0) * 1e6 + 0.5)
       AS BIGINT) AS err_e6
""",
        # quantile_cont == the engine's rank = q*(n-1) linear interpolation
        "fts_percentiles_nchars": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT n_chars FROM documents JOIN hits USING (doc_id))
{" UNION ALL ".join(
    f"SELECT {p} AS pct, CAST(round(quantile_cont(n_chars, {p / 100.0}) * 1e6)"
    f" AS BIGINT) AS value_e6 FROM v"
    for p in P.PERCENTS
)}
""",
        # percentile_ranks: exact CDF — (count(v <= x) / n) * 100, the
        # pinned divide-then-multiply order the engine uses
        "fts_percentile_ranks": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT n_chars FROM documents JOIN hits USING (doc_id)
      WHERE n_chars IS NOT NULL)
{" UNION ALL ".join(
    f"SELECT CAST({x} AS DOUBLE) AS value, CAST(round("
    f"(sum(CASE WHEN n_chars <= {x} THEN 1 ELSE 0 END)::DOUBLE"
    f" / count(*)) * 100.0 * 1e6) AS BIGINT) AS pct_e6 FROM v"
    for x in P.PR_VALUES
)}
""",
        # value_count: non-null field values over the hit set
        "fts_value_count": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT count(n_chars) AS n FROM documents JOIN hits USING (doc_id)
""",
        # median_absolute_deviation: EXACT quantile_cont medians —
        # integer inputs make median/mad multiples of 0.25, so the e6
        # columns are exact on both sides
        "fts_mad_nchars": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT n_chars FROM documents JOIN hits USING (doc_id)),
med AS (SELECT quantile_cont(n_chars, 0.5) AS m FROM v)
SELECT count(*) AS n,
  CAST(round((SELECT m FROM med) * 1e6) AS BIGINT) AS median_e6,
  CAST(round(quantile_cont(abs(n_chars - (SELECT m FROM med)), 0.5)
             * 1e6) AS BIGINT) AS mad_e6
FROM v
""",
        # boxplot: exact five-number summary, quantile_cont quartiles
        "fts_boxplot_nchars": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT n_chars FROM documents JOIN hits USING (doc_id))
SELECT count(*) AS n,
  CAST(min(n_chars) AS BIGINT) AS min_v,
  CAST(round(quantile_cont(n_chars, 0.25) * 1e6) AS BIGINT) AS q1_e6,
  CAST(round(quantile_cont(n_chars, 0.5) * 1e6) AS BIGINT) AS q2_e6,
  CAST(round(quantile_cont(n_chars, 0.75) * 1e6) AS BIGINT) AS q3_e6,
  CAST(max(n_chars) AS BIGINT) AS max_v
FROM v
""",
        # string_stats: exact length stats + Shannon entropy of the
        # character distribution (ascending-char accumulation — the
        # engine's op order)
        "fts_string_stats_source": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
sv AS (SELECT source FROM documents JOIN hits USING (doc_id)
       WHERE source IS NOT NULL),
ch AS (SELECT unnest(regexp_extract_all(source, '.')) AS c FROM sv),
cc AS (SELECT c, count(*) AS cnt FROM ch GROUP BY c),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cc)
SELECT (SELECT count(*) FROM sv) AS n,
  (SELECT CAST(min(length(source)) AS BIGINT) FROM sv) AS min_len,
  (SELECT CAST(max(length(source)) AS BIGINT) FROM sv) AS max_len,
  (SELECT t FROM tot) AS len_sum,
  CAST(round(-(SELECT sum((cnt::DOUBLE / (SELECT t FROM tot))
                          * log2(cnt::DOUBLE / (SELECT t FROM tot))
                          ORDER BY c) FROM cc) * 1e6) AS BIGINT)
    AS entropy_e6
""",
        # matrix_stats: exact integer moment sums for the (n_chars,
        # doc_id) pair + Pearson correlation (population-vs-sample
        # normalization cancels)
        "fts_matrix_stats": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
v AS (SELECT n_chars AS x, doc_id AS y
      FROM documents JOIN hits USING (doc_id))
SELECT count(*) AS n,
  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
  CAST(sum(x * x) AS BIGINT) AS sxx,
  CAST(sum(y * y) AS BIGINT) AS syy,
  CAST(sum(x * y) AS BIGINT) AS sxy,
  CAST(round((count(*) * sum(x * y) - sum(x) * sum(y))::DOUBLE
             / sqrt(((count(*) * sum(x * x) - sum(x) * sum(x))
                     * (count(*) * sum(y * y) - sum(y) * sum(y)))::DOUBLE)
             * 1e6) AS BIGINT) AS corr_e6
FROM v
""",
        # multi_match most_fields: per-FIELD BM25 statistics (each field
        # is its own index), contributions summed ORDER BY (field, term)
        # — the engine's field-name-asc, term-asc accumulation order
        "fts_multi_match_top10": f"""
WITH ttoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}'))
               AS term FROM documents),
tdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN ttoks t USING (doc_id) GROUP BY d.doc_id),
stoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(source), '{_TOK}'))
          AS term FROM documents),
sdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN stoks t USING (doc_id) GROUP BY d.doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM tdl) * 1.0 / (SELECT count(*) FROM documents) AS t_avgdl,
              (SELECT sum(dl) FROM sdl) * 1.0 / (SELECT count(*) FROM documents) AS s_avgdl),
qt(term) AS (VALUES {",".join(f"('{t}')" for t in sorted(set(P.MULTI_QUERY.split())))}),
ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY term),
stf AS (SELECT doc_id, term, count(*) AS tf FROM stoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
contribs AS (
  SELECT stf.doc_id, 'source' AS fld, stf.term,
         ({P.MULTI_BOOSTS["source"]!r} * ln(1 + (st.n - sdf.df + 0.5) / (sdf.df + 0.5)))
           * (stf.tf * (1.2 + 1.0)
              / (stf.tf + 1.2 * (1.0 - 0.75 + 0.75 * sdl.dl / st.s_avgdl))) AS c
  FROM stf JOIN sdf USING (term) JOIN sdl USING (doc_id) CROSS JOIN st
  UNION ALL
  SELECT ttf.doc_id, 'text' AS fld, ttf.term,
         ({P.MULTI_BOOSTS["text"]!r} * ln(1 + (st.n - tdf.df + 0.5) / (tdf.df + 0.5)))
           * (ttf.tf * (1.2 + 1.0)
              / (ttf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tdl.dl / st.t_avgdl))) AS c
  FROM ttf JOIN tdf USING (term) JOIN tdl USING (doc_id) CROSS JOIN st
),
scores AS (SELECT doc_id, sum(c ORDER BY fld, term) AS score
           FROM contribs GROUP BY doc_id)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # best_fields / dis_max: same per-field contribs, combined as
        # greatest + tie_breaker * rest (engine op order: per-field sums
        # terms-asc, total summed fields-asc = ss + ts)
        "fts_dis_max_top10": f"""
WITH ttoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}'))
               AS term FROM documents),
tdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN ttoks t USING (doc_id) GROUP BY d.doc_id),
stoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(source), '{_TOK}'))
          AS term FROM documents),
sdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN stoks t USING (doc_id) GROUP BY d.doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM tdl) * 1.0 / (SELECT count(*) FROM documents) AS t_avgdl,
              (SELECT sum(dl) FROM sdl) * 1.0 / (SELECT count(*) FROM documents) AS s_avgdl),
qt(term) AS (VALUES {",".join(f"('{t}')" for t in sorted(set(P.MULTI_QUERY.split())))}),
ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY term),
stf AS (SELECT doc_id, term, count(*) AS tf FROM stoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
tsc AS (
  SELECT ttf.doc_id, sum(
         ({P.MULTI_BOOSTS["text"]!r} * ln(1 + (st.n - tdf.df + 0.5) / (tdf.df + 0.5)))
           * (ttf.tf * (1.2 + 1.0)
              / (ttf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tdl.dl / st.t_avgdl)))
         ORDER BY ttf.term) AS s
  FROM ttf JOIN tdf USING (term) JOIN tdl USING (doc_id) CROSS JOIN st
  GROUP BY ttf.doc_id
),
ssc AS (
  SELECT stf.doc_id, sum(
         ({P.MULTI_BOOSTS["source"]!r} * ln(1 + (st.n - sdf.df + 0.5) / (sdf.df + 0.5)))
           * (stf.tf * (1.2 + 1.0)
              / (stf.tf + 1.2 * (1.0 - 0.75 + 0.75 * sdl.dl / st.s_avgdl)))
         ORDER BY stf.term) AS s
  FROM stf JOIN sdf USING (term) JOIN sdl USING (doc_id) CROSS JOIN st
  GROUP BY stf.doc_id
),
allsc AS (
  SELECT coalesce(t.doc_id, s.doc_id) AS doc_id,
         coalesce(t.s, 0.0) AS ts, coalesce(s.s, 0.0) AS ss
  FROM tsc t FULL OUTER JOIN ssc s ON t.doc_id = s.doc_id
),
scores AS (
  SELECT doc_id,
         greatest(ts, ss) + 0.3 * ((ss + ts) - greatest(ts, ss)) AS score
  FROM allsc
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # cross_fields: blended idf (df = max over fields) * best-field
        # saturation, summed terms-ascending
        "fts_cross_fields_top10": f"""
WITH ttoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}'))
               AS term FROM documents),
tdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN ttoks t USING (doc_id) GROUP BY d.doc_id),
stoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(source), '{_TOK}'))
          AS term FROM documents),
sdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN stoks t USING (doc_id) GROUP BY d.doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM tdl) * 1.0 / (SELECT count(*) FROM documents) AS t_avgdl,
              (SELECT sum(dl) FROM sdl) * 1.0 / (SELECT count(*) FROM documents) AS s_avgdl),
qt(term) AS (VALUES {",".join(f"('{t}')" for t in sorted(set(P.MULTI_QUERY.split())))}),
ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY term),
stf AS (SELECT doc_id, term, count(*) AS tf FROM stoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
dfb AS (SELECT q.term,
               greatest(coalesce(tdf.df, 0), coalesce(sdf.df, 0)) AS df
        FROM qt q LEFT JOIN tdf USING (term) LEFT JOIN sdf USING (term)),
sats AS (
  SELECT stf.doc_id, stf.term,
         ({P.MULTI_BOOSTS["source"]!r} * (stf.tf * (1.2 + 1.0)
           / (stf.tf + 1.2 * (1.0 - 0.75 + 0.75 * sdl.dl / st.s_avgdl)))) AS c
  FROM stf JOIN sdl USING (doc_id) CROSS JOIN st
  UNION ALL
  SELECT ttf.doc_id, ttf.term,
         ({P.MULTI_BOOSTS["text"]!r} * (ttf.tf * (1.2 + 1.0)
           / (ttf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tdl.dl / st.t_avgdl)))) AS c
  FROM ttf JOIN tdl USING (doc_id) CROSS JOIN st
),
tmax AS (SELECT doc_id, term, max(c) AS c FROM sats GROUP BY 1, 2),
scores AS (
  SELECT t.doc_id,
         sum((1.0 * ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5))) * t.c
             ORDER BY t.term) AS score
  FROM tmax t JOIN dfb d USING (term) CROSS JOIN st
  WHERE d.df > 0
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # combined_fields (Lucene CombinedFieldQuery / BM25F): ONE
        # pseudo-field — ctf = ws*tf_s + wt*tf_t (source first, the
        # engine's ascending-field order), cdl likewise, cavgdl from the
        # EXACT integer per-field token totals, idf on the blended max
        # df; saturation on the combined quantities, summed terms-asc
        "fts_combined_fields_top10": f"""
WITH ttoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}'))
               AS term FROM documents),
tdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN ttoks t USING (doc_id) GROUP BY d.doc_id),
stoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(source), '{_TOK}'))
          AS term FROM documents),
sdl AS (SELECT d.doc_id, count(t.term) AS dl
        FROM documents d LEFT JOIN stoks t USING (doc_id) GROUP BY d.doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              ({P.MULTI_BOOSTS["source"]!r} * (SELECT sum(dl) FROM sdl)
               + {P.MULTI_BOOSTS["text"]!r} * (SELECT sum(dl) FROM tdl))
              / (SELECT count(*) FROM documents) AS cavgdl),
qt(term) AS (VALUES {",".join(f"('{t}')" for t in sorted(set(P.MULTI_QUERY.split())))}),
ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY term),
stf AS (SELECT doc_id, term, count(*) AS tf FROM stoks
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
dfb AS (SELECT q.term,
               greatest(coalesce(tdf.df, 0), coalesce(sdf.df, 0)) AS df
        FROM qt q LEFT JOIN tdf USING (term) LEFT JOIN sdf USING (term)),
cf AS (
  SELECT coalesce(t.doc_id, s.doc_id) AS doc_id,
         coalesce(t.term, s.term) AS term,
         coalesce({P.MULTI_BOOSTS["source"]!r} * s.tf, 0.0)
           + coalesce({P.MULTI_BOOSTS["text"]!r} * t.tf, 0.0) AS ctf
  FROM ttf t FULL OUTER JOIN stf s
    ON t.doc_id = s.doc_id AND t.term = s.term),
cdl AS (SELECT tdl.doc_id,
               {P.MULTI_BOOSTS["source"]!r} * sdl.dl
                 + {P.MULTI_BOOSTS["text"]!r} * tdl.dl AS cdl
        FROM tdl JOIN sdl USING (doc_id)),
scores AS (
  SELECT cf.doc_id,
         sum((1.0 * ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)))
             * (cf.ctf * (1.2 + 1.0)
                / (cf.ctf + 1.2 * (1.0 - 0.75 + 0.75 * cdl.cdl / st.cavgdl)))
             ORDER BY cf.term) AS score
  FROM cf JOIN dfb d USING (term) JOIN cdl USING (doc_id) CROSS JOIN st
  WHERE d.df > 0
  GROUP BY cf.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # match_bool_prefix: last token -> constant-score-1.0 prefix
        # clause (any term LIKE 'p%'), earlier tokens -> BM25 should
        # clauses; score = bm25_sum + 1.0 (the engine's add order)
        "fts_match_bool_prefix_top10": f"""
{_bm25_with(sorted(set(P.MBP_QUERY.split()[:-1])))}
, pref AS (SELECT DISTINCT doc_id FROM toks
           WHERE term LIKE '{P.MBP_QUERY.split()[-1]}%')
, allh AS (
  SELECT coalesce(s.doc_id, p.doc_id) AS doc_id,
         coalesce(s.score, 0.0)
           + (CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS score
  FROM scores s FULL OUTER JOIN pref p ON s.doc_id = p.doc_id)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM allh ORDER BY score DESC, doc_id LIMIT 10
""",
        # search_as_you_type: root match_bool_prefix leg + ._2gram shingle
        # leg (shingle BM25 clauses, LAST shingle prefix-matched), legs
        # summed per doc — dl2/avgdl2/df2 all live on the shingle stream
        "fts_sayt_top10": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM toks) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'spark') GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
root_scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ( tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
              ORDER BY tf.term ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
root_pref AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'da%'),
root_leg AS (
  SELECT coalesce(sc.doc_id, p.doc_id) AS doc_id,
         coalesce(sc.score, 0.0)
           + (CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS score
  FROM root_scores sc FULL OUTER JOIN root_pref p ON sc.doc_id = p.doc_id),
ptk AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
        FROM documents)
),
sh2 AS (
  SELECT doc_id, sterm FROM (
    SELECT doc_id, term || ' ' ||
           lead(term) OVER (PARTITION BY doc_id ORDER BY i) AS sterm
    FROM ptk
  ) WHERE sterm IS NOT NULL
),
dl2 AS (SELECT doc_id, count(*) AS dl FROM sh2 GROUP BY doc_id),
stats2 AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM sh2) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf2 AS (SELECT doc_id, count(*) AS tf FROM sh2
        WHERE sterm = 'spark join' GROUP BY doc_id),
df2 AS (SELECT count(*) AS df FROM tf2),
g2_scores AS (
  SELECT tf2.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * ( tf2.tf * (1.2 + 1.0)
               / (tf2.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl2.dl / s.avgdl)) )
           AS score
  FROM tf2 CROSS JOIN df2 d JOIN dl2 USING (doc_id) CROSS JOIN stats2 s
),
g2_pref AS (SELECT DISTINCT doc_id FROM sh2 WHERE sterm LIKE 'join da%'),
g2_leg AS (
  SELECT coalesce(sc.doc_id, p.doc_id) AS doc_id,
         coalesce(sc.score, 0.0)
           + (CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS score
  FROM g2_scores sc FULL OUTER JOIN g2_pref p ON sc.doc_id = p.doc_id),
total AS (
  SELECT coalesce(r.doc_id, g.doc_id) AS doc_id,
         coalesce(r.score, 0.0) + coalesce(g.score, 0.0) AS score
  FROM root_leg r FULL OUTER JOIN g2_leg g ON r.doc_id = g.doc_id)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM total ORDER BY score DESC, doc_id LIMIT 10
""",
        # pinned: pin rows (input order via prio) above organic hits;
        # absent pinned ids drop; the rank column pins the promotion
        # order through the order-insensitive value hash
        "fts_pinned_top10": f"""
{_bm25_with(sorted(set(P.PINNED_QUERY.split())))}
, pin AS (SELECT * FROM (VALUES {",".join(
    f"({int(i)}, {j})" for j, i in enumerate(P.PINNED_IDS)
)}) AS v(doc_id, prio)
          WHERE doc_id IN (SELECT doc_id FROM documents))
, unioned AS (
  SELECT p.doc_id, coalesce(s.score, 0.0) AS score, 1 AS pinned, p.prio
  FROM pin p LEFT JOIN scores s USING (doc_id)
  UNION ALL
  SELECT s.doc_id, s.score, 0 AS pinned, NULL AS prio
  FROM scores s WHERE s.doc_id NOT IN (SELECT doc_id FROM pin))
SELECT CAST(row_number() OVER
            (ORDER BY pinned DESC, prio ASC, score DESC, doc_id ASC)
            AS BIGINT) AS rank,
       doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6,
       CAST(pinned AS BIGINT) AS pinned
FROM unioned ORDER BY rank LIMIT 10
""",
        # SynonymQuery: per clause group, df = max over members (blended),
        # tf = sum of member tfs; one idf*saturation term per group,
        # accumulated in head-term order
        "fts_synonym_top10": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
qgroups(gterm, term) AS (VALUES {",".join(
    f"('{h}', '{m}')"
    for h in sorted(set(P.SYN_QUERY.split()))
    for m in [h, *P.SYNONYMS.get(h, ())]
)}),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
dfg AS (
  SELECT g.gterm, max(coalesce(d.df, 0)) AS df
  FROM qgroups g LEFT JOIN dft d USING (term) GROUP BY g.gterm
),
tfg AS (
  SELECT g.gterm, t.doc_id, count(*) AS tf
  FROM toks t JOIN qgroups g USING (term) GROUP BY 1, 2
),
scores AS (
  SELECT tfg.doc_id,
         sum( ln(1 + (s.n - dfg.df + 0.5) / (dfg.df + 0.5))
              * ( tfg.tf * (1.2 + 1.0)
                  / (tfg.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
              ORDER BY tfg.gterm ) AS score
  FROM tfg JOIN dfg USING (gterm) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE dfg.df > 0
  GROUP BY tfg.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # rescore: top-30 window by base score, combined = 1*base +
        # 2*phrase (docs without the phrase keep their weighted base)
        "fts_rescore_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
{_phrase_scores_ctes(P.PHRASE_QUERY.split())},
win AS (
  SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT 30
)
SELECT w.doc_id,
       CAST(round((1.0 * w.score + 2.0 * coalesce(p.score, 0)) * 1e6)
            AS BIGINT) AS score_e6
FROM win w LEFT JOIN ph_scores p USING (doc_id)
ORDER BY (1.0 * w.score + 2.0 * coalesce(p.score, 0)) DESC, w.doc_id
LIMIT 10
""",
        # rescorer retriever (request-body form of rescore): window 25,
        # combined = 1.5*base + 0.5*phrase
        "fts_dsl_rescorer_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
{_phrase_scores_ctes(P.PHRASE_QUERY.split())},
win AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, doc_id LIMIT {P.RESCORER_WINDOW}
)
SELECT w.doc_id,
       CAST(round(({P.RESCORER_QW!r} * w.score
              + {P.RESCORER_RW!r} * coalesce(p.score, 0)) * 1e6)
            AS BIGINT) AS score_e6
FROM win w LEFT JOIN ph_scores p USING (doc_id)
ORDER BY ({P.RESCORER_QW!r} * w.score
           + {P.RESCORER_RW!r} * coalesce(p.score, 0)) DESC, w.doc_id
LIMIT 10
""",
        # analyzer stopwords: the SAME stop list filters the token stream
        # (df/dl/avgdl all shift) and the query — one analyzer both sides
        "fts_stop_bm25_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())), stops=P.STOPWORDS_SQL)}
SELECT s2.doc_id, CAST(round(s2.score * 1e6) AS BIGINT) AS score_e6
FROM scores s2
ORDER BY s2.score DESC, s2.doc_id LIMIT 10
""",
        # custom BM25 parameters (k1=0.9, b=0.3) from the config
        # cascade — same literals, same float op order both sides
        "fts_bm25_k1b_top10": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({",".join(
      f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ( tf.tf * ({P.BM25_CUSTOM_K1!r} + 1.0)
                  / (tf.tf + {P.BM25_CUSTOM_K1!r}
                     * (1.0 - {P.BM25_CUSTOM_B!r}
                        + {P.BM25_CUSTOM_B!r} * dl.dl / s.avgdl)) )
              ORDER BY tf.term ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # analyzer stemmer (minimal_english S-stemmer): the corpus token
        # stream maps through the SQL stem CASE; the engine's query-side
        # stemming is pinned by the VALUES list — 'joins'+'join' merge to
        # one clause of weight 2, so a broken query stemmer diverges
        "fts_stem_bm25_top10": f"""
{_bm25_with(["data", "join", "the"], boosts={"join": 2.0}, stem=True)}
SELECT s2.doc_id, CAST(round(s2.score * 1e6) AS BIGINT) AS score_e6
FROM scores s2
ORDER BY s2.score DESC, s2.doc_id LIMIT 10
""",
        # function_score: rescore = score * ln(1 + n_chars), identical op
        # sequence engine-side (np.log(1.0 + v), not log1p)
        "fts_function_score_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round(s2.score * ln(1 + 1.0 * d2.n_chars) * 1e6) AS BIGINT)
         AS score_e6
FROM scores s2 JOIN documents d2 USING (doc_id)
ORDER BY s2.score * ln(1 + 1.0 * d2.n_chars) DESC, s2.doc_id LIMIT 10
""",
        # rank_feature saturation: additive boost * v/(v + pivot), same
        # float op order as the engine (divide, * boost, + base)
        "fts_rank_feature_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round((s2.score + {P.RANK_FEATURE_BOOST!r} *
         (CAST(d2.n_chars AS DOUBLE)
          / (CAST(d2.n_chars AS DOUBLE) + {P.RANK_FEATURE_PIVOT!r})))
         * 1e6) AS BIGINT) AS score_e6
FROM scores s2 JOIN documents d2 USING (doc_id)
ORDER BY s2.score + {P.RANK_FEATURE_BOOST!r} *
  (CAST(d2.n_chars AS DOUBLE)
   / (CAST(d2.n_chars AS DOUBLE) + {P.RANK_FEATURE_PIVOT!r})) DESC,
  s2.doc_id
LIMIT 10
""",
        # tokenizer fertility: chars-per-token per lang; Σdl (norms)
        # cross-checked against a full token recount
        "text_fertility_by_lang": f"""
WITH {_TOKS_CTE},
tl AS (SELECT d.lang, count(*) AS n_tokens
       FROM toks t JOIN documents d USING (doc_id) GROUP BY d.lang),
cl AS (SELECT lang, sum(n_chars) AS n_chars FROM documents
       GROUP BY lang)
SELECT lang, n_tokens::BIGINT AS n_tokens, cl.n_chars::BIGINT AS n_chars,
       CAST(floor(CAST(cl.n_chars AS DOUBLE) / tl.n_tokens * 1e6)
            AS BIGINT) AS cpt_e6
FROM tl JOIN cl USING (lang) ORDER BY lang
""",
        # _termvectors: per-term tf + first 0-based position for the
        # top-1 hit, recounted from the positional token stream
        "fts_termvectors_top1": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
top1 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id LIMIT 1),
ptk AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos,
         unnest(l) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
        FROM documents)
)
SELECT t.doc_id, p.term, count(*)::BIGINT AS tf,
       min(p.pos)::BIGINT AS first_pos
FROM top1 t JOIN ptk p USING (doc_id)
GROUP BY t.doc_id, p.term ORDER BY p.term
""",
        # _validate/query: per-clause df/cf dictionary stats recounted
        "fts_validate_query": f"""
WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS cf
FROM toks
WHERE term IN ({",".join(
    f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})
GROUP BY term ORDER BY term
""",
        # _explain: per-clause recompute for the top-1 hit
        "fts_explain_top1": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
top1 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id LIMIT 1)
SELECT t.doc_id, tf.term, df.df, tf.tf,
       CAST(round( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ( tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
              * 1e6) AS BIGINT) AS contrib_e6
FROM top1 t
JOIN tf ON tf.doc_id = t.doc_id
JOIN df USING (term)
JOIN dl ON dl.doc_id = t.doc_id
CROSS JOIN stats s
ORDER BY tf.term
""",
        # _cat/_stats: manifest bookkeeping vs a full corpus recount
        "fts_cat_stats": f"""
WITH {_TOKS_CTE}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS total_dl
FROM toks
""",
        # _msearch: three body lines (match / phrase / query_string),
        # each leg the corresponding single-query oracle, top-5 per line
        "fts_msearch": f"""
SELECT 0 AS query_id, doc_id, score_e6 FROM (
{_bm25_sql(sorted(set(P.MSEARCH_LINES[0][0].split())), 5)}
)
UNION ALL
SELECT 1 AS query_id, doc_id, score_e6 FROM (
{_phrase_sql(P.MSEARCH_LINES[1][0].split(), 5)}
)
UNION ALL
SELECT 2 AS query_id, doc_id, score_e6 FROM (
{_bm25_sql(["customer"], 5, must_not=["slow"])}
)
""",
        # fields fetch phase: top-10 + requested doc fields
        "fts_fields_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id, CAST(round(s2.score * 1e6) AS BIGINT) AS score_e6,
       d2.lang, d2.n_chars
FROM scores s2 JOIN documents d2 USING (doc_id)
ORDER BY s2.score DESC, s2.doc_id LIMIT 10
""",
        # rank_feature sigmoid (exponent pinned at 2): exact products
        "fts_rank_feature_sigmoid_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round((s2.score + {P.RANK_FEATURE_BOOST!r} *
         ((CAST(d2.n_chars AS DOUBLE) * d2.n_chars)
          / (CAST(d2.n_chars AS DOUBLE) * d2.n_chars
             + {P.RANK_FEATURE_PIVOT!r} * {P.RANK_FEATURE_PIVOT!r})))
         * 1e6) AS BIGINT) AS score_e6
FROM scores s2 JOIN documents d2 USING (doc_id)
ORDER BY s2.score + {P.RANK_FEATURE_BOOST!r} *
  ((CAST(d2.n_chars AS DOUBLE) * d2.n_chars)
   / (CAST(d2.n_chars AS DOUBLE) * d2.n_chars
      + {P.RANK_FEATURE_PIVOT!r} * {P.RANK_FEATURE_PIVOT!r})) DESC,
  s2.doc_id
LIMIT 10
""",
        # distance_feature: additive boost * pivot/(pivot + |v-origin|)
        "fts_distance_feature_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT s2.doc_id,
       CAST(round((s2.score + {P.DIST_FEATURE_BOOST!r} *
         ({P.DIST_FEATURE_PIVOT!r} / ({P.DIST_FEATURE_PIVOT!r}
           + abs(CAST(d2.n_chars AS DOUBLE) - {P.DIST_FEATURE_ORIGIN!r}))))
         * 1e6) AS BIGINT) AS score_e6
FROM scores s2 JOIN documents d2 USING (doc_id)
ORDER BY s2.score + {P.DIST_FEATURE_BOOST!r} *
  ({P.DIST_FEATURE_PIVOT!r} / ({P.DIST_FEATURE_PIVOT!r}
    + abs(CAST(d2.n_chars AS DOUBLE) - {P.DIST_FEATURE_ORIGIN!r}))) DESC,
  s2.doc_id
LIMIT 10
""",
        # more_like_this: the term-selection spec (tf*idf desc, term asc,
        # top 25, tf>=1 df>=2) is replicated exactly, then plain BM25
        # over the selected terms excluding the source doc
        "fts_more_like_this": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
dtf AS (SELECT term, count(*) AS f FROM toks WHERE doc_id = {P.MLT_DOC}
        GROUP BY term),
adf AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
qsel AS (
  SELECT t.term FROM dtf t JOIN adf a USING (term) CROSS JOIN stats s
  WHERE t.f >= 1 AND a.df >= 2
  ORDER BY t.f * ln(1 + (s.n - a.df + 0.5) / (a.df + 0.5)) DESC, t.term
  LIMIT 25
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qsel) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ( tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
              ORDER BY tf.term ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores WHERE doc_id != {P.MLT_DOC}
ORDER BY score DESC, doc_id LIMIT 10
""",
        # highlight: first matching token position via the SAME position
        # space as the engine's sidecar (token index, 0-based); snippet =
        # 1-based inclusive list_slice of the analyzed tokens
        "fts_highlight_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
topk AS (SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT 10),
lists AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
  FROM documents WHERE doc_id IN (SELECT doc_id FROM topk)
),
pt AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
       FROM lists),
firstpos AS (
  SELECT doc_id, min(pos) AS fp FROM pt
  WHERE term IN ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})
  GROUP BY doc_id
)
SELECT t.doc_id, CAST(round(t.score * 1e6) AS BIGINT) AS score_e6,
       f.fp AS first_pos, l.l[f.fp + 1] AS first_term,
       array_to_string(
         l.l[greatest(f.fp + 1 - 3, 1):least(f.fp + 1 + 3, len(l.l))], ' '
       ) AS snippet
FROM topk t JOIN firstpos f USING (doc_id) JOIN lists l USING (doc_id)
""",
        "fts_export_hits": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT doc_id, lang FROM documents JOIN hits USING (doc_id)
""",
        "fts_term_doc_count": f"""
WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE term IN ({",".join(f"'{t}'" for t in P.PROBE_TERMS)})
GROUP BY term
""",
        "fts_docstore_roundtrip": "SELECT doc_id, text FROM documents",
        # compaction purges doc_id % 10 == 3 and renumbers densely in key
        # order — row_number over the surviving rows IS the spec
        "fts_compact_docstore": """
SELECT row_number() OVER (ORDER BY doc_id) - 1 AS new_doc_id,
       doc_id AS src_doc_id, text
FROM documents WHERE doc_id % 10 != 3
""",
        "fts_tags_filter_count": (
            "SELECT lang AS tag_value, count(*) AS n_docs "
            "FROM documents GROUP BY lang"
        ),
        "keyword_count_by_lang": (
            "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"
        ),
        "events_tumbling_1h": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
""",
        # EQL sequence by user_id, maxspan 2h: click completed by ANY
        # later purchase inside the span; one count per matching click
        "events_eql_sequence": f"""
SELECT user_id, count(*)::BIGINT AS n_seq FROM (
  SELECT c.user_id FROM events c
  WHERE c.event_type = 'click' AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
      AND epoch_us(p.ts) > epoch_us(c.ts)
      AND epoch_us(p.ts) <= epoch_us(c.ts) + {P.EQL_MAXSPAN_US}
  )
) GROUP BY user_id ORDER BY user_id
""",
        # 3-stage EQL: click -> view -> purchase, each hop maxspan-
        # bounded (8h); existence counting (any witness pair)
        "events_eql_seq3": f"""
SELECT user_id, count(*)::BIGINT AS n_seq FROM (
  SELECT c.user_id FROM events c
  WHERE c.event_type = 'click' AND EXISTS (
    SELECT 1 FROM events v JOIN events p
      ON p.user_id = v.user_id AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(v.ts)
     AND epoch_us(p.ts) <= epoch_us(v.ts) + {P.EQL3_MAXSPAN_US}
    WHERE v.user_id = c.user_id AND v.event_type = 'view'
      AND epoch_us(v.ts) > epoch_us(c.ts)
      AND epoch_us(v.ts) <= epoch_us(c.ts) + {P.EQL3_MAXSPAN_US}
  )
) GROUP BY user_id ORDER BY user_id
""",
        # EQL until: error strictly between click and purchase kills
        # the pending sequence (ANY-purchase form == the kernel's
        # first-purchase form — see events_eql_until docstring)
        "events_eql_until": f"""
SELECT user_id, count(*)::BIGINT AS n_seq FROM (
  SELECT c.user_id FROM events c
  WHERE c.event_type = 'click' AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
      AND epoch_us(p.ts) > epoch_us(c.ts)
      AND epoch_us(p.ts) <= epoch_us(c.ts) + {P.EQL_MAXSPAN_US}
      AND NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.user_id = c.user_id AND e.event_type = 'error'
          AND epoch_us(e.ts) > epoch_us(c.ts)
          AND epoch_us(e.ts) < epoch_us(p.ts)
      )
  )
) GROUP BY user_id ORDER BY user_id
""",
        # downsample: fixed_interval 1h rollup, gauge stat tuple
        # (value_count/min/max/sum) in exact integer cents; epoch-floor
        # bucket start (ts is UTC microseconds, so date_trunc('hour')
        # equals the engine's 3.6e9-us integer floor)
        "events_downsample_1h": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(value)::BIGINT AS n_values,
       min(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS min_cents,
       max(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS max_cents,
       sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS sum_cents
FROM events GROUP BY 1, 2
""",
        # transform latest: newest row per key by (ts, event_id)
        "events_transform_latest": """
SELECT event_type, event_id,
       epoch_us(ts)::BIGINT AS ts_us,
       CAST(round(value * 100.0) AS BIGINT) AS value_cents
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY event_type
""",
        # transform pivot: (type, day) summary — integer-cents sums so
        # the incremental-merge dest equals this full GROUP BY exactly
        "events_pivot_transform": """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT
         AS sum_value_cents,
       max(CAST(round(value * 100.0) AS BIGINT))::BIGINT
         AS max_value_cents
FROM events GROUP BY 1, 2
""",
        # hopping window (size 2h, hop 1h): each event doubled into its
        # two covering window starts — engine's integer-us floor shared
        "events_hopping_2h1h": f"""
SELECT event_type,
       make_timestamp(((epoch_us(ts) // 3600000000) - k.k)
                      * 3600000000) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events CROSS JOIN (VALUES (0), (1)) k(k)
GROUP BY 1, 2
""",
        # deterministic shuffle: global order by (md5rank, doc_id),
        # positions 0-based — the permutation itself is checked
        "sample_shuffle_order": f"""
SELECT row_number() OVER (ORDER BY rnk, doc_id) - 1 AS position,
       doc_id
FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS rnk
  FROM documents
) ORDER BY position LIMIT {P.SHUFFLE_HEAD}
""",
        # hash split: md5-prefix bucket rule replicated verbatim
        "sample_split_counts": """
WITH b AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train' ELSE 'holdout' END AS split,
       count(*) AS n_docs, count(DISTINCT bucket) AS n_buckets
FROM b GROUP BY 1
""",
        # stratified quota sample: row_number over (md5rank, key) per
        # stratum — the boundary-broadcast filter's exact SQL twin
        "sample_stratified_counts": f"""
WITH r AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS rnk
  FROM documents WHERE source IS NOT NULL
),
k AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY rnk, CAST(doc_id AS VARCHAR)) AS rn
  FROM r
)
SELECT source, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM k WHERE rn <= {P.SAMPLE_QUOTA}
GROUP BY source ORDER BY source
""",
        # temperature mixing: per-stratum quota = floor(sqrt(n_s)) * MULT
        # (alpha = 0.5; floor of a correctly-rounded sqrt is the exact
        # isqrt for n < 2^52, so both sides compute the SAME quota),
        # then the md5-rank row_number rule
        "temperature_mix_counts": f"""
WITH r AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS rnk
  FROM documents WHERE source IS NOT NULL
),
q AS (
  SELECT source,
         CAST(floor(sqrt(count(*))) AS BIGINT) * {P.TEMP_MULT} AS quota
  FROM documents WHERE source IS NOT NULL GROUP BY source
),
k AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY rnk, CAST(doc_id AS VARCHAR)) AS rn
  FROM r
)
SELECT k.source, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM k JOIN q ON k.source = q.source
WHERE rn <= quota GROUP BY k.source ORDER BY k.source
""",
        # split-leakage audit: md5-bucket split + opening-fingerprint
        # (first K analyzed tokens) overlap between splits
        "split_leakage_audit": f"""
WITH p AS (
  SELECT doc_id,
         array_to_string(list_slice(
           regexp_extract_all(lower(text), '{_TOK}'),
           1, {P.LEAK_PREFIX_TOKENS}), ' ') AS opening,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 100 < 90
              THEN 1 ELSE 0 END AS tr
  FROM documents
),
a AS (
  SELECT opening, sum(tr) AS nt, sum(1 - tr) AS nh
  FROM p GROUP BY opening
)
SELECT
  CAST(sum(CASE WHEN nt > 0 AND nh > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS overlap_keys,
  CAST(sum(CASE WHEN nt > 0 AND nh > 0 THEN nh ELSE 0 END) AS BIGINT)
    AS contaminated_holdout_docs,
  CAST(sum(nh) AS BIGINT) AS holdout_docs
FROM a
""",
        # curriculum deciles: exact ntile over (n_chars, doc_id)
        "quality_ntile_counts": f"""
WITH b AS (
  SELECT doc_id,
         ntile({P.NTILE_BINS}) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT bin, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM b GROUP BY bin ORDER BY bin
""",
        # session windows: lag-gap break flags + running sum = session id
        "events_sessionize": f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
o AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {P.SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
       count(*) AS n_events,
       CAST(max(us) - min(us) AS BIGINT) AS dur_us
FROM s GROUP BY user_id, sid
""",
        # per-row integer cents BEFORE the sums: float-accumulated cents
        # hit a rounding boundary at ~1e9-cent magnitudes (one ulp flipped
        # a cent at sf0.1); integer sums are order-independent and exact
        "q1_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
       count(*) AS n_rows
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""",
        "join_revenue_by_segment": """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
        "semi_join_lineitem_part": """
SELECT l_partkey, count(*) AS n_items,
       CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 25)
GROUP BY 1
""",
        "union_distinct_keys": """
SELECT count(DISTINCT id) AS n_distinct FROM (
  SELECT o_custkey AS id FROM orders
  UNION ALL SELECT c_custkey FROM customer
)
""",
        "events_top20_by_value": """
SELECT event_id, CAST(round(value * 100.0) AS BIGINT) AS value_cents
FROM events ORDER BY value DESC, event_id LIMIT 20
""",
        # geo oracles: lat/lon derive from the ids via exact integer
        # arithmetic (see pipelines._events_geo); the haversine term
        # order mirrors rayfts.geo.haversine_km exactly so both sides
        # produce bit-equal doubles before the e6 rounding.
        "fts_geo_distance_sort": _GEO_DIST_CTE + """
SELECT event_id,
       CAST(round(dist_km * 1e6) AS BIGINT) AS dist_e6
FROM d WHERE dist_km <= 3000.0
ORDER BY dist_km, event_id LIMIT 20
""",
        # geo-sort search_after: cursor page == OFFSET on the
        # (dist asc, id asc) order inside the radius
        "fts_geo_sort_after": _GEO_DIST_CTE + """
SELECT event_id,
       CAST(round(dist_km * 1e6) AS BIGINT) AS dist_e6
FROM d WHERE dist_km <= 3000.0
ORDER BY dist_km, event_id LIMIT 20 OFFSET 20
""",
        "fts_geo_bbox_count": """
WITH pts AS (
  SELECT ((user_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM events
)
SELECT count(*) AS n FROM pts
WHERE lat BETWEEN 20.0 AND 60.0 AND lon BETWEEN -30.0 AND 60.0
""",
        "fts_geo_centroid": _GEO_DIST_CTE + """
SELECT count(*) AS n,
       CAST(round(((sum(lat_e2)::DOUBLE / count(*)) / 100.0 - 90.0) * 1e6)
            AS BIGINT) AS lat_e6,
       CAST(round(((sum(lon_e2)::DOUBLE / count(*)) / 100.0 - 180.0) * 1e6)
            AS BIGINT) AS lon_e6
FROM d WHERE dist_km <= 3000.0
""",
        "fts_geo_polygon_count": f"""
WITH pts AS (
  SELECT ((user_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM events
)
SELECT count(*) AS n FROM pts
WHERE {_poly_half_plane_pred()}
""",
        "fts_geo_bounds": _GEO_DIST_CTE + """
SELECT count(*) AS n,
       CAST(round((max(lat_e2) / 100.0 - 90.0) * 1e6) AS BIGINT) AS top_e6,
       CAST(round((min(lon_e2) / 100.0 - 180.0) * 1e6) AS BIGINT) AS left_e6,
       CAST(round((min(lat_e2) / 100.0 - 90.0) * 1e6) AS BIGINT)
         AS bottom_e6,
       CAST(round((max(lon_e2) / 100.0 - 180.0) * 1e6) AS BIGINT)
         AS right_e6
FROM d WHERE dist_km <= 3000.0
""",
        "fts_geo_distance_ranges": _GEO_DIST_CTE + f"""
SELECT k.key, count(d.event_id) AS doc_count
FROM (VALUES {_geo_ring_values()}) AS k(key, lo, hi)
LEFT JOIN d ON (k.lo IS NULL OR d.dist_km >= k.lo)
           AND (k.hi IS NULL OR d.dist_km < k.hi)
GROUP BY k.key
""",
        # bin factors and morton widths derive from the precision knob
        # (geohash: 5 bits/char, lon gets the extra odd bit) so changing
        # P.GEOHASH_PRECISION keeps engine and oracle in lockstep
        "fts_geohash_grid": f"""
WITH pts AS (
  SELECT ((user_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM events
), bins AS (
  SELECT CAST(floor((lon + 180.0) / 360.0
              * {1 << _geohash_lon_bits()}) AS BIGINT) AS lon_bin,
         CAST(floor((lat + 90.0) / 180.0
              * {1 << _geohash_lat_bits()}) AS BIGINT) AS lat_bin
  FROM pts
), cells AS (
  SELECT lon_bin, lat_bin, count(*) AS doc_count
  FROM bins GROUP BY 1, 2
)
SELECT lon_bin, lat_bin, doc_count FROM cells
ORDER BY doc_count DESC,
  {_morton_expr(_geohash_lon_bits(), _geohash_lat_bits())}
LIMIT {P.GEOHASH_TOP_N}
""",
        "fts_way_shapes": _WAY_SHAPES_SQL,
        # geo_line: per-user track ordered by event_id, truncated to the
        # first GEO_LINE_SIZE points; exact integer coordinate sums
        # fingerprint the included prefix
        "fts_geo_line": f"""
WITH pts AS (
  SELECT user_id, event_id,
         (user_id * 7919 + event_id * 31) % 18000 AS y,
         (event_id * 104729) % 36000 AS x
  FROM events
), rn AS (
  SELECT user_id, x, y,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_total
  FROM pts
)
SELECT user_id, CAST(max(n_total) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_included,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y
FROM rn WHERE rn <= {P.GEO_LINE_SIZE}
GROUP BY user_id ORDER BY max(n_total) DESC, user_id LIMIT 20
""",
        # geotile: mercator y mirrors geo.geotile_bins term for term
        # (radians -> tan + 1/cos -> ln -> /pi); both sides clamp the
        # bins because the +-85.0511287798066 lat clamp can land an ulp
        # past the pole tile boundary
        "fts_geotile_grid": f"""
WITH pts AS (
  SELECT ((user_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM events
), bins AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0
             * {1 << P.GEOTILE_ZOOM}) AS BIGINT), 0),
           {(1 << P.GEOTILE_ZOOM) - 1}) AS tile_x,
         least(greatest(CAST(floor(
             (1.0 - ln(tan(radians(lc)) + 1.0 / cos(radians(lc))) / pi())
             / 2.0 * {1 << P.GEOTILE_ZOOM}) AS BIGINT), 0),
           {(1 << P.GEOTILE_ZOOM) - 1}) AS tile_y
  FROM (SELECT lon, least(greatest(lat, -85.0511287798066),
                          85.0511287798066) AS lc FROM pts)
), cells AS (
  SELECT tile_x, tile_y, count(*) AS doc_count
  FROM bins GROUP BY 1, 2
)
SELECT tile_x, tile_y, doc_count FROM cells
ORDER BY doc_count DESC, tile_x, tile_y LIMIT {P.GEOTILE_TOP_N}
""",
        # envelope relations: CASE order == the engine's overwrite
        # precedence (DISJOINT > WITHIN > CONTAINS > INTERSECTS); pure
        # integer comparisons, exact on both sides. Clustered vertex
        # grid (_events_geo_cluster): per-user center + per-user span
        # so every relation class is populated at sf0.01+
        "fts_way_envelope_relations": f"""
WITH pts AS (
  SELECT user_id,
         (user_id * 7919) % 18000
           + (event_id * 31) % (100 + (user_id % 8) * 2600) AS y,
         (user_id * 104729) % 36000
           + (event_id * 53) % (200 + (user_id % 8) * 5200) AS x
  FROM events
), env AS (
  SELECT user_id, min(y) AS ymin, max(y) AS ymax,
         min(x) AS xmin, max(x) AS xmax
  FROM pts GROUP BY user_id
), rel AS (
  SELECT CASE
    WHEN xmax < {P.WAY_QUERY_ENV[1]} OR xmin > {P.WAY_QUERY_ENV[3]}
      OR ymax < {P.WAY_QUERY_ENV[0]} OR ymin > {P.WAY_QUERY_ENV[2]}
      THEN 'DISJOINT'
    WHEN xmin >= {P.WAY_QUERY_ENV[1]} AND xmax <= {P.WAY_QUERY_ENV[3]}
      AND ymin >= {P.WAY_QUERY_ENV[0]} AND ymax <= {P.WAY_QUERY_ENV[2]}
      THEN 'WITHIN'
    WHEN xmin <= {P.WAY_QUERY_ENV[1]} AND xmax >= {P.WAY_QUERY_ENV[3]}
      AND ymin <= {P.WAY_QUERY_ENV[0]} AND ymax >= {P.WAY_QUERY_ENV[2]}
      THEN 'CONTAINS'
    ELSE 'INTERSECTS' END AS relation
  FROM env
)
SELECT relation, count(*) AS n FROM rel GROUP BY relation ORDER BY relation
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS dup_cnt
FROM documents GROUP BY 1
""",
        "knn_cosine_top10": """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
dots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i) GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT) AS cosine_sim_e6
FROM dots ORDER BY cosine_sim_e6 DESC, vec_id LIMIT 10
""",
        # l2_norm similarity: ||v||^2 - 2 v.q + ||q||^2, distance asc
        "knn_l2_top10": """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
d AS (
  SELECT v.vec_id,
         sum(v.val * v.val) - 2.0 * sum(v.val * q.val)
           + sum(q.val * q.val) AS dist
  FROM v JOIN q USING (i) GROUP BY v.vec_id
)
SELECT vec_id, CAST(floor(dist * 1e6 + 0.5) AS BIGINT) AS score_e6
FROM d ORDER BY dist, vec_id LIMIT 10
""",
        # max_inner_product similarity: raw dot desc
        "knn_mip_top10": """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
d AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot
  FROM v JOIN q USING (i) GROUP BY v.vec_id
)
SELECT vec_id, CAST(floor(dot * 1e6 + 0.5) AS BIGINT) AS score_e6
FROM d ORDER BY dot DESC, vec_id LIMIT 10
""",
        # BBQ binary-quantized knn: sign-bit hamming candidates (exact
        # ints, ham asc / vec_id asc), exact-cosine rescore
        "knn_binary_rescore_top10": f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
ham AS (
  SELECT v.vec_id,
         sum(CASE WHEN (v.val > 0) != (q.val > 0) THEN 1 ELSE 0 END)::BIGINT AS h
  FROM v JOIN q USING (i) GROUP BY v.vec_id
),
cand AS (SELECT vec_id FROM ham ORDER BY h, vec_id
         LIMIT {10 * P.KNN_BBQ_OVERSAMPLE}),
dots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i)
  WHERE v.vec_id IN (SELECT vec_id FROM cand) GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(floor(dot / (sqrt(n2) * sqrt(q2)) * 1e6 + 0.5) AS BIGINT)
         AS cosine_sim_e6
FROM dots ORDER BY cosine_sim_e6 DESC, vec_id LIMIT 10
""",
        # Matryoshka truncated-dim knn: exact prefix-cosine candidates
        # (first {KNN_MRL_DIMS} dims), exact full-dim rescore
        "knn_matryoshka_top10": f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
pdots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i) WHERE v.i <= {P.KNN_MRL_DIMS}
  GROUP BY v.vec_id
),
cand AS (SELECT vec_id FROM pdots
         ORDER BY dot / (sqrt(n2) * sqrt(q2)) DESC, vec_id
         LIMIT {10 * P.KNN_MRL_OVERSAMPLE}),
dots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i)
  WHERE v.vec_id IN (SELECT vec_id FROM cand) GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(floor(dot / (sqrt(n2) * sqrt(q2)) * 1e6 + 0.5) AS BIGINT)
         AS cosine_sim_e6
FROM dots ORDER BY cosine_sim_e6 DESC, vec_id LIMIT 10
""",
        # int8 scalar-quantized knn + rescore: per-dim min/max envelope,
        # code = floor((v-mn)/(mx-mn)*255 + 0.5) (identical op order in
        # the engine kernel), EXACT integer-dot candidate stage (k·3,
        # dot desc / vec_id asc), float-cosine rescore of candidates only
        "knn_int8_rescore_top10": f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
mm AS (SELECT i, min(val) AS mn, max(val) AS mx FROM v GROUP BY i),
qv AS (SELECT i, val FROM v WHERE vec_id = 0),
cq AS (
  SELECT i, CASE WHEN mx = mn THEN 0
                 ELSE CAST(floor((val - mn) / (mx - mn) * 255.0 + 0.5)
                           AS BIGINT) END AS q
  FROM qv JOIN mm USING (i)
),
cv AS (
  SELECT vec_id, i,
         CASE WHEN mx = mn THEN 0
              ELSE CAST(floor((val - mn) / (mx - mn) * 255.0 + 0.5)
                        AS BIGINT) END AS q
  FROM v JOIN mm USING (i)
),
dots_q AS (
  SELECT cv.vec_id, sum(cv.q * cq.q) AS dot
  FROM cv JOIN cq USING (i) GROUP BY cv.vec_id
),
cand AS (SELECT vec_id FROM dots_q
         ORDER BY dot DESC, vec_id LIMIT {10 * P.KNN_SQ_OVERSAMPLE}),
exact AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN qv q USING (i)
  WHERE v.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT)
         AS cosine_sim_e6
FROM exact ORDER BY cosine_sim_e6 DESC, vec_id LIMIT 10
""",
        # hard-negative mining: per query vector, top-k cosine among
        # DIFFERENT-label candidates (rounded-e6 rank, vec_id tiebreak)
        "knn_hard_negatives": f"""
WITH ql AS (
  SELECT vec_id AS qid, label AS qlabel FROM embeddings
  WHERE vec_id < {P.HARDNEG_QUERIES}
),
q AS (
  SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id < {P.HARDNEG_QUERIES}
),
v AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
dots AS (
  SELECT q.qid, v.vec_id, v.label,
         sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i) GROUP BY q.qid, v.vec_id, v.label
),
sc AS (
  SELECT d.qid, d.vec_id,
         CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT)
           AS cosine_sim_e6
  FROM dots d JOIN ql ON d.qid = ql.qid
  WHERE d.label <> ql.qlabel
)
SELECT qid AS query_idx, vec_id, cosine_sim_e6 FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY cosine_sim_e6 DESC, vec_id) AS rn
  FROM sc
) WHERE rn <= {P.HARDNEG_K}
ORDER BY query_idx, cosine_sim_e6 DESC, vec_id
""",
        # late-interaction maxsim: embeddings sliced into SUBS contiguous
        # sub-vectors; score = sum over query slices of max doc-slice
        # cosine (ES rank_vectors maxSim / ColBERT)
        "fts_maxsim_top10": f"""
WITH qe AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = {P.MAXSIM_QUERY_VEC_ID}
),
q AS (SELECT i // {_MAXSIM_D} AS qi, i % {_MAXSIM_D} AS di, val FROM qe),
ve AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
v AS (SELECT vec_id, i // {_MAXSIM_D} AS vj, i % {_MAXSIM_D} AS di, val
      FROM ve),
qn AS (SELECT qi, sqrt(sum(val * val)) AS qn FROM q GROUP BY qi),
vn AS (SELECT vec_id, vj, sqrt(sum(val * val)) AS vn
       FROM v GROUP BY vec_id, vj),
dots AS (
  SELECT v.vec_id, q.qi, v.vj, sum(v.val * q.val) AS dot
  FROM v JOIN q USING (di) GROUP BY v.vec_id, q.qi, v.vj
),
cos AS (
  SELECT d.vec_id, d.qi, max(d.dot / (vn.vn * qn.qn)) AS best
  FROM dots d
  JOIN vn ON d.vec_id = vn.vec_id AND d.vj = vn.vj
  JOIN qn ON d.qi = qn.qi
  GROUP BY d.vec_id, d.qi
),
sc AS (SELECT vec_id, sum(best) AS score FROM cos GROUP BY vec_id)
SELECT vec_id, CAST(round(score * 1e6) AS BIGINT) AS maxsim_e6
FROM sc ORDER BY maxsim_e6 DESC, vec_id LIMIT 10
""",
        # knn similarity floor: same cosine CTE, below-floor candidates
        # are not matches (exact path: post-filter == pre-k drop)
        "knn_similarity_cutoff": f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
dots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i) GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT) AS cosine_sim_e6
FROM dots WHERE dot / (sqrt(n2) * sqrt(q2)) >= {P.KNN_SIM_FLOOR}
ORDER BY cosine_sim_e6 DESC, vec_id LIMIT {P.KNN_SIM_K}
""",
        "text_token_stats": f"""{token_stats_core}
SELECT doc_id, token_cnt, stop_cnt,
       stop_cnt * 1.0 / greatest(token_cnt, 1) AS stop_ratio,
       len_sum * 1.0 / greatest(token_cnt, 1) AS avg_token_len
FROM st
""",
        "text_quality": f"""{token_stats_core}
SELECT doc_id, token_cnt,
       stop_cnt * 1.0 / greatest(token_cnt, 1) AS stop_ratio,
       least(token_cnt / 64.0, 1.0)
         * (0.5 + 0.5 * least((stop_cnt * 1.0 / greatest(token_cnt, 1)) * 4.0, 1.0))
         AS quality
FROM st
""",
        # Gopher repetition signals: positional toks CTE (parallel unnest
        # keeps token order), (doc, term) and (doc, 2-gram) multiplicity
        # counts, same float divisions as the numpy kernel
        "text_repetition": f"""
WITH docs_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS arr
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(arr) AS term,
         unnest(range(1, len(arr) + 1)) AS pos
  FROM docs_arr
),
tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(c) AS token_cnt, count(*) AS uniq_cnt,
               max(c) AS top_c
        FROM tc GROUP BY 1),
grams AS (
  SELECT a.doc_id, a.term AS t1, b.term AS t2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
gc AS (SELECT doc_id, t1, t2, count(*) AS c FROM grams GROUP BY 1, 2, 3),
gagg AS (SELECT doc_id, sum(c) AS n_grams,
                sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_pos
         FROM gc GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(a.token_cnt, 0) AS BIGINT) AS token_cnt,
  CAST(coalesce(a.uniq_cnt, 0) AS BIGINT) AS uniq_cnt,
  CASE WHEN coalesce(a.token_cnt, 0) > 0
       THEN 1.0 - a.uniq_cnt * 1.0 / a.token_cnt ELSE 0.0 END
    AS dup_token_frac,
  CASE WHEN coalesce(a.token_cnt, 0) > 0
       THEN a.top_c * 1.0 / a.token_cnt ELSE 0.0 END AS top_token_frac,
  CASE WHEN coalesce(g.n_grams, 0) > 0
       THEN g.dup_pos * 1.0 / g.n_grams ELSE 0.0 END AS dup_2gram_frac
FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN gagg g USING (doc_id)
""",
        # multi_terms: compound-key buckets, count desc then keys asc
        "fts_multi_terms": f"""
SELECT source, lang, count(*) AS doc_count
FROM documents GROUP BY 1, 2
ORDER BY doc_count DESC, source, lang LIMIT {P.MULTI_TERMS_TOP_N}
""",
        # rare_terms: df <= max_doc_count, ordered df asc then term asc
        "fts_rare_terms": f"""
WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
HAVING count(DISTINCT doc_id) <= {P.RARE_TERMS_MAX_DF}
ORDER BY df, term LIMIT {P.RARE_TERMS_TOP_N}
""",
        # nested terms agg: parents ranked (count desc, key asc) LIMIT 5,
        # children ranked inside each kept parent LIMIT 3 via row_number
        "fts_terms_subagg": """
WITH par AS (
  SELECT source, count(*) AS source_count FROM documents GROUP BY 1
  ORDER BY source_count DESC, source LIMIT 5
),
kid AS (
  SELECT d.source, d.lang, count(*) AS lang_count,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY count(*) DESC, d.lang) AS rk
  FROM documents d JOIN par USING (source)
  GROUP BY d.source, d.lang
)
SELECT k.source, p.source_count, k.lang, k.lang_count
FROM kid k JOIN par p USING (source) WHERE k.rk <= 3
""",
        # near-dedup / LSH / text-analysis extras: every hash in the engine
        # spec (md5-lower64 tokens == DuckDB md5_number_lower, C-fold mod
        # 2^64 via HUGEINT, integer-fraction Jaccard threshold, seeded
        # hyperplane literals) was chosen to be SQL-replicable, so these
        # get REAL value oracles (generated in rayfts.extras.oracles).
        "dedup_minhash": _X.minhash_dedup_sql(),
        "dedup_jaccard": _X.ngram_jaccard_sql(),
        # cluster-size histogram over the same labeling
        "dedup_cluster_sizes": f"""
WITH base AS ({_X.minhash_dedup_sql()})
SELECT sz, count(*)::BIGINT AS n_clusters FROM (
  SELECT cluster_id, count(*)::BIGINT AS sz FROM base GROUP BY cluster_id
) GROUP BY sz ORDER BY sz
""",
        "decontaminate_ngrams": _X.decontaminate_sql(),
        # per-source contamination report over the same flag pass
        "decontaminate_by_source": f"""
WITH base AS ({_X.decontaminate_sql()})
SELECT d.source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN b.contaminated THEN 1 ELSE 0 END)::BIGINT
         AS n_contaminated,
       CAST(floor(sum(CASE WHEN b.contaminated THEN 1 ELSE 0 END)::DOUBLE
                  / count(*) * 1e6) AS BIGINT) AS rate_e6
FROM base b JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
""",
        "dedup_window_spans": _X.dup_window_sql(),
        "dedup_simhash": _X.simhash_dedup_sql(),
        "embedding_near_dup": _X.embedding_near_dup_sql(threshold=0.95, dim=64),
        "knn_cosine_lsh": _X.knn_lsh_sql(k=10, n_planes=4, dim=64),
        "lang_id": _X.lang_id_sql(),
        "text_fingerprint": _X.fingerprint_sql(),
        "text_winnow_fingerprints": _X.winnow_sql(
            k=_DD.WINNOW_K, w=_DD.WINNOW_W
        ),
        # knn_cosine_ivf: the gate query probes ALL centroids — exact by
        # construction — so the partitioned-storage round-trip faces the
        # same top-k value oracle as brute force. (Replicating the seeded
        # k-means in SQL for a PRUNED probe would be float-order-sensitive;
        # the nprobe < C read-pruning contract is pinned by pytest.)
        "knn_cosine_ivf": """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
dots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i) GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT) AS cosine_sim_e6
FROM dots ORDER BY cosine_sim_e6 DESC, vec_id LIMIT 10
""",
        # terms_enum: sorted-term dictionary paging with df (build-time
        # stats — the corpus has no tombstones, so distinct-doc counts
        # ARE the dictionary dfs)
        "fts_terms_enum": f"""
WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE term LIKE '{P.TERMS_ENUM_PREFIX}%'
GROUP BY term ORDER BY term LIMIT {P.TERMS_ENUM_SIZE}
""",
        # sibling pipeline aggs over the monthly date_histogram buckets;
        # extreme keys = the ES keys array (ties legal), ascending
        "fts_date_hist_siblings": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT count(*) AS n_buckets,
       CAST(sum(n_docs) AS BIGINT) AS sum_docs,
       CAST(min(n_docs) AS BIGINT) AS min_docs,
       CAST(max(n_docs) AS BIGINT) AS max_docs,
       CAST(round(sum(n_docs)::DOUBLE / count(*) * 1e6) AS BIGINT) AS avg_e6,
       (SELECT string_agg(month_start::VARCHAR, ',' ORDER BY month_start)
        FROM hist WHERE n_docs = (SELECT min(n_docs) FROM hist)) AS min_keys,
       (SELECT string_agg(month_start::VARCHAR, ',' ORDER BY month_start)
        FROM hist WHERE n_docs = (SELECT max(n_docs) FROM hist)) AS max_keys
FROM hist
""",
        # t_test (Welch): exact integer moments per lang group over the
        # hit set, t from the SAME closed form/op order as the engine
        "fts_t_test": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
m AS (
  SELECT lang, count(*) AS n, sum(n_chars) AS s,
         sum(n_chars * n_chars) AS ss
  FROM documents JOIN hits USING (doc_id)
  WHERE lang IN ('{P.T_TEST_LANG_A}', '{P.T_TEST_LANG_B}')
  GROUP BY lang
)
SELECT a.n AS n_a, b.n AS n_b,
       CAST(a.s AS BIGINT) AS sum_a, CAST(b.s AS BIGINT) AS sum_b,
       CAST(a.ss AS BIGINT) AS sum_sq_a, CAST(b.ss AS BIGINT) AS sum_sq_b,
       CAST(round(
         ((a.s / a.n::DOUBLE) - (b.s / b.n::DOUBLE))
         / sqrt( ((a.n * a.ss - a.s * a.s) / (a.n * (a.n - 1.0))) / a.n
               + ((b.n * b.ss - b.s * b.s) / (b.n * (b.n - 1.0))) / b.n )
         * 1e6) AS BIGINT) AS t_e6
FROM (SELECT * FROM m WHERE lang = '{P.T_TEST_LANG_A}') a,
     (SELECT * FROM m WHERE lang = '{P.T_TEST_LANG_B}') b
""",
        # scripted_metric: covariance numerator n*Sxy - Sx*Sy between
        # doc_id and n_chars over the hit set — HUGEINT intermediate,
        # the result fits BIGINT at the tested scales
        "fts_scripted_metric": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT count(*) AS n,
       CAST(sum(doc_id) AS BIGINT) AS sum_x,
       CAST(sum(n_chars) AS BIGINT) AS sum_y,
       CAST(count(*)::HUGEINT * sum(doc_id * n_chars)::HUGEINT
            - sum(doc_id)::HUGEINT * sum(n_chars)::HUGEINT
            AS BIGINT) AS cov_num
FROM documents JOIN hits USING (doc_id)
""",
        # has_parent (join field): children inherit their parent group's
        # best-child BM25 score; child-side lang filter; order
        # (parent score desc, doc asc)
        # parent_id: children of one parent on the join field — constant
        # score 1.0 in filter context, doc ascending
        "fts_parent_id_docs": f"""
SELECT doc_id, 1000000::BIGINT AS score_e6
FROM documents WHERE source = '{P.PARENT_ID_PARENT}'
ORDER BY doc_id LIMIT {P.PARENT_ID_SIZE}
""",
        "fts_has_parent": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
pscore AS (
  SELECT d2.source AS parent, max(s2.score) AS ps
  FROM scores s2 JOIN documents d2 USING (doc_id)
  GROUP BY d2.source
)
SELECT d.doc_id, CAST(round(p.ps * 1e6) AS BIGINT) AS score_e6,
       d.source AS parent
FROM documents d JOIN pscore p ON d.source = p.parent
WHERE d.lang = '{P.HAS_PARENT_CHILD_LANG}'
ORDER BY p.ps DESC, d.doc_id LIMIT 10
""",
        # sliced scroll: slice i of max keeps hits with doc_id % max == i
        # (dense ids == the documents table's dense doc_id here)
        "fts_export_slice": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT doc_id, lang FROM documents JOIN hits USING (doc_id)
WHERE doc_id % {P.EXPORT_SLICE_MAX} = {P.EXPORT_SLICE_ID}
""",
        # PII redaction: augmented deterministic spans (ts_epoch
        # precedent), patterns applied IN ORDER on progressively
        # redacted text — nested regexp_replace, both engines RE2
        "text_redact": r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com via 10.0.' ||
         ((doc_id // 256) % 256) || '.' || (doc_id % 256) ||
         ' call +1555' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')
         AS t
  FROM documents
),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
       FROM aug),
s2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
              regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
       FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4,
              len(regexp_extract_all(t, '\+\d{7,15}\b')) AS n_phone,
              regexp_replace(t, '\+\d{7,15}\b', '<PHONE>', 'g') AS t
       FROM s2),
s4 AS (SELECT doc_id, n_email, n_ipv4, n_phone,
              len(regexp_extract_all(t, '\b[0-9a-f]{32,}\b')) AS n_hexkey,
              regexp_replace(t, '\b[0-9a-f]{32,}\b', '<KEY>', 'g') AS t
       FROM s3)
SELECT doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_phone AS BIGINT) AS n_phone,
       CAST(n_hexkey AS BIGINT) AS n_hexkey,
       CAST(n_email + n_ipv4 + n_phone + n_hexkey AS BIGINT) AS n_redacted,
       t AS redacted
FROM s4
""",
        # sequence packing: chunk = exclusive token prefix // budget
        # (one SQL window) — budget/tokenizer shared with the engine
        "pack_chunk_stats": f"""
WITH nt AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{_TOK}')) AS ntok
  FROM documents
),
c AS (
  SELECT doc_id, ntok,
         CAST((sum(ntok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok)
              // {P.PACK_BUDGET} AS BIGINT) AS chunk_id
  FROM nt
)
SELECT chunk_id, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS tokens
FROM c GROUP BY chunk_id ORDER BY chunk_id
""",

        # hybrid retrieval: BM25 scores CTE + knn cosine section (the
        # knn_cosine_top10 formula), sum rule over a FULL OUTER JOIN
        # PQ ADC: two per-subspace Lloyd blocks (pinned kmeans spec)
        # -> per-code squared-distance LUT vs the query slice -> code
        # gather + subspace sum, (dist asc, vec_id) top-10
        "pq_adc_top10": _PQ_ADC_SQL,
        # IVF-PQ with nprobe == n_centroids reads every partition, so
        # the result is the SAME exact ADC — one oracle, two engines
        # (flat code scan vs probe-pruned partition files)
        "pq_ivf_adc_top10": _PQ_ADC_SQL,
        # passage chunking: window p covers pos in [p*stride,
        # p*stride+width); md5 of the space-joined window pins content
        "passage_chunk_stats": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
nd AS (SELECT doc_id, count(*) AS n FROM ptoks GROUP BY doc_id),
pid AS (
  SELECT doc_id,
         unnest(generate_series(0, (n - 1) // {P.PASSAGE_STRIDE}))
           AS passage_id
  FROM nd WHERE n > 0
),
pass AS (
  SELECT p.doc_id, p.passage_id, t.pos, t.term
  FROM pid p JOIN ptoks t ON t.doc_id = p.doc_id
    AND t.pos >= p.passage_id * {P.PASSAGE_STRIDE}
    AND t.pos < p.passage_id * {P.PASSAGE_STRIDE} + {P.PASSAGE_WIDTH}
)
SELECT doc_id, passage_id, count(*) AS n_tokens,
       md5(string_agg(term, ' ' ORDER BY pos)) AS passage_md5
FROM pass GROUP BY doc_id, passage_id
""",
        # filtered kNN: cosine top-10 restricted to lang-qualified docs
        # (pre-filtering — the restriction applies before the top-k)
        "knn_filtered_top10": f"""
WITH kq AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = {P.HYBRID_QUERY_VEC}
),
kv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
  WHERE d.lang = '{P.KNN_FILTER_LANG}'
),
kd AS (
  SELECT kv.vec_id, sum(kv.val * kq.val) AS dot,
         sum(kv.val * kv.val) AS n2, sum(kq.val * kq.val) AS q2
  FROM kv JOIN kq USING (i) GROUP BY kv.vec_id
)
SELECT vec_id,
       CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT)
         AS cos_e6
FROM kd ORDER BY dot / (sqrt(n2) * sqrt(q2)) DESC, vec_id LIMIT 10
""",
        # linear retriever: per-list minmax normalize (degenerate range
        # -> 1.0) then weighted sum — the engine's exact float op order
        "fts_linear_retriever_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
kq AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = {P.HYBRID_QUERY_VEC}
),
kv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
kd AS (
  SELECT kv.vec_id, sum(kv.val * kq.val) AS dot,
         sum(kv.val * kv.val) AS n2, sum(kq.val * kq.val) AS q2
  FROM kv JOIN kq USING (i) GROUP BY kv.vec_id
),
kt AS (
  SELECT doc_id, s FROM (
    SELECT vec_id AS doc_id, dot / (sqrt(n2) * sqrt(q2)) AS s,
           row_number() OVER (
             ORDER BY dot / (sqrt(n2) * sqrt(q2)) DESC, vec_id) AS r
    FROM kd
  ) WHERE r <= {P.RRF_WINDOW}
),
kn AS (
  SELECT doc_id, CASE WHEN max(s) OVER () = min(s) OVER () THEN 1.0
                      ELSE (s - min(s) OVER ())
                           / (max(s) OVER () - min(s) OVER ()) END AS v
  FROM kt
),
bt AS (
  SELECT doc_id, score FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scores
  ) WHERE r <= {P.RRF_WINDOW}
),
bn AS (
  SELECT doc_id, CASE WHEN max(score) OVER () = min(score) OVER ()
                      THEN 1.0
                      ELSE (score - min(score) OVER ())
                           / (max(score) OVER () - min(score) OVER ())
                 END AS v
  FROM bt
),
f AS (
  SELECT coalesce(bn.doc_id, kn.doc_id) AS doc_id,
         {P.LINEAR_TEXT_W} * coalesce(bn.v, 0.0)
           + {P.LINEAR_KNN_W} * coalesce(kn.v, 0.0) AS combined
  FROM bn FULL OUTER JOIN kn USING (doc_id)
)
SELECT doc_id, CAST(round(combined * 1e6) AS BIGINT) AS combined_e6
FROM f ORDER BY combined DESC, doc_id LIMIT 10
""",
        # RRF hybrid: rank_window-truncated row_number ranks per list,
        # fused = 1/(K + r_bm25) + 1/(K + r_knn), same add order as the
        # engine's two-pass accumulate
        "fts_rrf_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
kq AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = {P.HYBRID_QUERY_VEC}
),
kv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
kd AS (
  SELECT kv.vec_id, sum(kv.val * kq.val) AS dot,
         sum(kv.val * kv.val) AS n2, sum(kq.val * kq.val) AS q2
  FROM kv JOIN kq USING (i) GROUP BY kv.vec_id
),
kr AS (
  SELECT doc_id, r FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (
             ORDER BY dot / (sqrt(n2) * sqrt(q2)) DESC, vec_id) AS r
    FROM kd
  ) WHERE r <= {P.RRF_WINDOW}
),
br AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scores
  ) WHERE r <= {P.RRF_WINDOW}
),
f AS (
  SELECT coalesce(br.doc_id, kr.doc_id) AS doc_id,
         coalesce(1.0 / ({P.RRF_RANK_K} + br.r), 0.0)
           + coalesce(1.0 / ({P.RRF_RANK_K} + kr.r), 0.0) AS fused
  FROM br FULL OUTER JOIN kr USING (doc_id)
)
SELECT doc_id, CAST(round(fused * 1e9) AS BIGINT) AS fused_e9
FROM f ORDER BY fused DESC, doc_id LIMIT 10
""",
        # 3-leg rrf: bm25 + knn + n_chars-sorted standard retriever
        # (fused contributions summed per doc)
        "fts_rrf3_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
kq AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = {P.HYBRID_QUERY_VEC}
),
kv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
kd AS (
  SELECT kv.vec_id, sum(kv.val * kq.val) AS dot,
         sum(kv.val * kv.val) AS n2, sum(kq.val * kq.val) AS q2
  FROM kv JOIN kq USING (i) GROUP BY kv.vec_id
),
kr AS (
  SELECT doc_id, r FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (
             ORDER BY dot / (sqrt(n2) * sqrt(q2)) DESC, vec_id) AS r
    FROM kd
  ) WHERE r <= {P.RRF_WINDOW}
),
br AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scores
  ) WHERE r <= {P.RRF_WINDOW}
),
nr AS (
  SELECT doc_id, r FROM (
    SELECT s.doc_id,
           row_number() OVER (ORDER BY d.n_chars DESC, s.doc_id) AS r
    FROM scores s JOIN documents d USING (doc_id)
  ) WHERE r <= {P.RRF_WINDOW}
),
f AS (
  SELECT doc_id, sum(c) AS fused FROM (
    SELECT doc_id, 1.0 / ({P.RRF_RANK_K} + r) AS c FROM br
    UNION ALL SELECT doc_id, 1.0 / ({P.RRF_RANK_K} + r) FROM kr
    UNION ALL SELECT doc_id, 1.0 / ({P.RRF_RANK_K} + r) FROM nr
  ) GROUP BY doc_id
)
SELECT doc_id, CAST(round(fused * 1e9) AS BIGINT) AS fused_e9
FROM f ORDER BY fused DESC, doc_id LIMIT 10
""",
        "fts_hybrid_knn": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
kq AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id = {P.HYBRID_QUERY_VEC}
),
kv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
kd AS (
  SELECT kv.vec_id, sum(kv.val * kq.val) AS dot,
         sum(kv.val * kv.val) AS n2, sum(kq.val * kq.val) AS q2
  FROM kv JOIN kq USING (i) GROUP BY kv.vec_id
),
knn AS (
  SELECT vec_id AS doc_id, dot / (sqrt(n2) * sqrt(q2)) AS cos
  FROM kd ORDER BY cos DESC, vec_id LIMIT {P.HYBRID_KNN_K}
),
cand AS (
  SELECT coalesce(s2.doc_id, kn.doc_id) AS doc_id,
         coalesce(s2.score, 0.0)
           + coalesce({P.HYBRID_KNN_BOOST} * kn.cos, 0.0) AS h
  FROM scores s2 FULL OUTER JOIN knn kn USING (doc_id)
)
SELECT doc_id, CAST(round(h * 1e6) AS BIGINT) AS score_e6
FROM cand ORDER BY h DESC, doc_id LIMIT 10
""",
        # similarity modules: per-doc closed forms over the toks/dl
        # CTEs — one float-op order shared with the engine
        "fts_lmd_top10": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('data','join','spark','the') GROUP BY doc_id, term),
cs AS (SELECT term, count(*) AS cf FROM toks
       WHERE term IN ('data','join','spark','the') GROUP BY term),
tot AS (SELECT count(*) AS tc FROM toks),
sc AS (
  SELECT tf.doc_id,
         sum(greatest(0, ln(1 + tf.tf * (tot.tc / (2000.0 * cs.cf)))
                         + ln(2000.0 / (dl.dl + 2000.0)))) AS score
  FROM tf JOIN cs USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM sc ORDER BY score DESC, doc_id LIMIT 10
""",
        "fts_classic_top10": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('data','join','spark','the') GROUP BY doc_id, term),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
        WHERE term IN ('data','join','spark','the') GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT tf.doc_id,
         sum(sqrt(tf.tf) * (1 + ln(n.n / (dfs.df + 1.0)))
                         * (1 + ln(n.n / (dfs.df + 1.0)))) AS s,
         count(*) AS m
  FROM tf JOIN dfs USING (term) CROSS JOIN n
  GROUP BY tf.doc_id
)
SELECT sc.doc_id,
       CAST(round(sc.s * sc.m / 4 / sqrt(dl.dl) * 1e6) AS BIGINT)
         AS score_e6
FROM sc JOIN dl USING (doc_id)
ORDER BY sc.s * sc.m / 4 / sqrt(dl.dl) DESC, sc.doc_id LIMIT 10
""",
        "fts_boolean_top10": f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(count(DISTINCT term) * 1000000 AS BIGINT) AS score_e6
FROM toks WHERE term IN ('data','join','spark','the')
GROUP BY doc_id
ORDER BY count(DISTINCT term) DESC, doc_id LIMIT 10
""",
        # OSA fuzzy: at max_edits=1, OSA == full Damerau-Levenshtein,
        # so the duckdb function is exact
        "fts_fuzzy_osa_docs": f"""
WITH {_TOKS_CTE},
fz AS (
  SELECT term FROM (SELECT DISTINCT term FROM toks)
  WHERE damerau_levenshtein(term, '{P.FUZZY_OSA_QUERY}') <= 1
  ORDER BY damerau_levenshtein(term, '{P.FUZZY_OSA_QUERY}'), term LIMIT 50
)
SELECT doc_id, count(DISTINCT term) AS n_terms FROM toks
WHERE term IN (SELECT term FROM fz)
GROUP BY doc_id ORDER BY doc_id LIMIT 20
""",
        # unigram-LM cross-entropy: tf rows JOIN vocab stats (the
        # distributed hash join) -> per-doc sum / dl
        "text_unigram_xent": f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
cs AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
tot AS (SELECT count(*) AS tc FROM toks),
d AS (
  SELECT tf.doc_id,
         sum(tf.tf * -ln(cs.cf / tot.tc::DOUBLE)) AS s,
         sum(tf.tf) AS dl
  FROM tf JOIN cs USING (term) CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       CAST(round(s / dl * 1e6) AS BIGINT) AS xent_e6
FROM d
""",
        # sparse_vector: weighted tf dot via a VALUES weight table
        "fts_sparse_vector_top10": f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
w(term, wt) AS (VALUES {",".join(
    f"('{t}', {v})" for t, v in sorted(P.SPARSE_WEIGHTS.items())
)}),
sc AS (SELECT doc_id, sum(w.wt * tf.tf) AS score
       FROM tf JOIN w USING (term) GROUP BY 1)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM sc ORDER BY score DESC, doc_id LIMIT 10
""",
        # perplexity buckets: the xent CTE + one ntile window (the
        # quality_ntile_counts rule: ORDER BY value, key)
        "perplexity_bucket_counts": f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
cs AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
tot AS (SELECT count(*) AS tc FROM toks),
d AS (
  SELECT tf.doc_id,
         sum(tf.tf * -ln(cs.cf / tot.tc::DOUBLE)) AS s,
         sum(tf.tf) AS dl
  FROM tf JOIN cs USING (term) CROSS JOIN tot
  GROUP BY tf.doc_id
),
x AS (SELECT doc_id, CAST(round(s / dl * 1e6) AS BIGINT) AS xent_e6
      FROM d),
nt AS (SELECT doc_id, xent_e6,
              ntile({P.PPL_BINS}) OVER (ORDER BY xent_e6, doc_id) AS bin
       FROM x)
SELECT bin, count(*) AS n_docs,
       CAST(sum(xent_e6) AS BIGINT) AS sum_xent_e6
FROM nt GROUP BY 1 ORDER BY 1
""",
        # bigram conditional LM: p(w2|w1) = cf(w1,w2)/cf1(w1) MLE,
        # positional self-join pairs; < 2-token docs drop (inner joins)
        "text_bigram_xent": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
big AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM ptoks a JOIN ptoks b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
dtf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM big
        GROUP BY doc_id, w1, w2),
cf2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
cf1 AS (SELECT w1, sum(c2) AS c1 FROM cf2 GROUP BY w1),
d AS (
  SELECT dtf.doc_id,
         sum(dtf.tf * -ln(cf2.c2 / cf1.c1::DOUBLE)) AS s,
         sum(dtf.tf) AS nb
  FROM dtf JOIN cf2 USING (w1, w2) JOIN cf1 USING (w1)
  GROUP BY dtf.doc_id
)
SELECT doc_id, CAST(nb AS BIGINT) AS n_pairs,
       CAST(round(s / nb * 1e6) AS BIGINT) AS xent_e6
FROM d
""",
        # enclosing spans: the chains CTE is the span_near spec, the
        # little clause a positional EXISTS within [s, e]
        "fts_span_containing_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
{",".join(
    f"p{i} AS (SELECT doc_id, pos FROM ptoks WHERE term = '{t}')"
    for i, t in enumerate(P.SPAN_TERMS)
)},
pl AS (SELECT doc_id, pos FROM ptoks WHERE term = '{P.SPAN_LITTLE}'),
chains AS (
  SELECT a.doc_id, a.pos AS s, s{len(P.SPAN_TERMS) - 1}.pos AS e
  FROM p0 a
  {" ".join(
    f"JOIN p{i} s{i} ON s{i}.doc_id = a.doc_id AND s{i}.pos > "
    + ("a.pos" if i == 1 else f"s{i - 1}.pos")
    for i in range(1, len(P.SPAN_TERMS))
  )}
  WHERE s{len(P.SPAN_TERMS) - 1}.pos
        <= a.pos + {len(P.SPAN_TERMS) - 1 + P.SPAN_SLOP}
)
SELECT c.doc_id, count(*) AS n_matches
FROM chains c
WHERE EXISTS (SELECT 1 FROM pl WHERE pl.doc_id = c.doc_id
              AND pl.pos >= c.s AND pl.pos <= c.e)
GROUP BY c.doc_id ORDER BY c.doc_id LIMIT 20
""",
        "fts_span_within_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
{",".join(
    f"p{i} AS (SELECT doc_id, pos FROM ptoks WHERE term = '{t}')"
    for i, t in enumerate(P.SPAN_TERMS)
)},
pl AS (SELECT doc_id, pos FROM ptoks WHERE term = '{P.SPAN_LITTLE}'),
chains AS (
  SELECT a.doc_id, a.pos AS s, s{len(P.SPAN_TERMS) - 1}.pos AS e
  FROM p0 a
  {" ".join(
    f"JOIN p{i} s{i} ON s{i}.doc_id = a.doc_id AND s{i}.pos > "
    + ("a.pos" if i == 1 else f"s{i - 1}.pos")
    for i in range(1, len(P.SPAN_TERMS))
  )}
  WHERE s{len(P.SPAN_TERMS) - 1}.pos
        <= a.pos + {len(P.SPAN_TERMS) - 1 + P.SPAN_SLOP}
)
SELECT pl.doc_id, count(*) AS n_matches
FROM pl
WHERE EXISTS (SELECT 1 FROM chains c WHERE c.doc_id = pl.doc_id
              AND c.s <= pl.pos AND c.e >= pl.pos)
GROUP BY pl.doc_id ORDER BY pl.doc_id LIMIT 20
""",
        # corpus bigrams: positional self-join, (n desc, pair asc)
        "vocab_top_bigrams": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists)
SELECT a.term AS w1, b.term AS w2, count(*) AS n
FROM ptoks a JOIN ptoks b
  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
GROUP BY a.term, b.term
ORDER BY n DESC, w1, w2 LIMIT {P.BIGRAM_TOP_N}
""",
        # k-means: two Lloyd iterations unrolled as CTEs; init =
        # smallest-id vectors, dist surrogate |c|^2 - 2 v.c, ties ->
        # smaller cid — all shared with the engine. Float means may
        # differ in the last ulp (sum order), flipping an assignment
        # only on a near-exact tie — none exist in this corpus
        "embedding_kmeans_sizes": f"""
{_KMEANS_CTES}
SELECT cid AS cluster, count(*) AS n_vecs
FROM a3 GROUP BY cid ORDER BY cid
""",
        # SemDeDup: final kmeans assignment (a3) + one within-cluster
        # smaller-id pair join; dropped = EXISTS cos >= tau witness
        "semantic_dedup_counts": f"""
{_KMEANS_CTES},
sd_norm AS (SELECT vec_id, sqrt(sum(val * val)) AS n FROM v GROUP BY 1),
sd_pairs AS (
  SELECT lo.vec_id AS a, hi.vec_id AS b
  FROM a3 lo JOIN a3 hi
    ON hi.cid = lo.cid AND lo.vec_id < hi.vec_id
),
sd_dot AS (
  SELECT p.a, p.b, sum(x.val * y.val) AS dot
  FROM sd_pairs p
  JOIN v x ON x.vec_id = p.a
  JOIN v y ON y.vec_id = p.b AND y.i = x.i
  GROUP BY p.a, p.b
),
sd_drop AS (
  SELECT DISTINCT d.b AS vec_id
  FROM sd_dot d
  JOIN sd_norm na ON na.vec_id = d.a
  JOIN sd_norm nb ON nb.vec_id = d.b
  WHERE d.dot / (na.n * nb.n) >= {P.SEMDEDUP_TAU}
)
SELECT a3.cid AS cluster,
       count(*) AS n_members,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN a3.vec_id ELSE 0 END)
            AS BIGINT) AS sum_kept_id
FROM a3 LEFT JOIN sd_drop d USING (vec_id)
GROUP BY a3.cid ORDER BY a3.cid
""",
        "fts_min_score_top10": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))}
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores WHERE score >= {P.MIN_SCORE}
ORDER BY score DESC, doc_id LIMIT 10
""",
        # composed: kmeans assignment CTEs + the md5-rank quota window
        "cluster_balanced_sample": f"""
{_KMEANS_CTES},
r AS (
  SELECT cid, vec_id,
         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS rnk
  FROM a3
),
k AS (
  SELECT cid, vec_id,
         row_number() OVER (PARTITION BY cid
                            ORDER BY rnk, CAST(vec_id AS VARCHAR)) AS rn
  FROM r
)
SELECT cid AS cluster, count(*) AS n_kept,
       CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
FROM k WHERE rn <= {P.CLUSTER_QUOTA}
GROUP BY cid ORDER BY cid
""",
        # intervals query: ordered chain whose slots are term IN (...)
        # alternative sets — width rule end - start - (k-1) <= max_gaps
        "fts_intervals_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
{",".join(
    "p{i} AS (SELECT doc_id, pos FROM ptoks WHERE term IN ({alts}))".format(
        i=i,
        alts=",".join(
            "'{}'".format(t)
            for t in (s if isinstance(s, tuple) else (s,))
        ),
    )
    for i, s in enumerate(P.INTERVALS_SLOTS)
)}
SELECT a.doc_id, count(*) AS n_matches
FROM p0 a
{" ".join(
    f"JOIN p{i} s{i} ON s{i}.doc_id = a.doc_id AND s{i}.pos > "
    + ("a.pos" if i == 1 else f"s{i - 1}.pos")
    for i in range(1, len(P.INTERVALS_SLOTS))
)}
WHERE s{len(P.INTERVALS_SLOTS) - 1}.pos
      <= a.pos + {len(P.INTERVALS_SLOTS) - 1 + P.INTERVALS_MAX_GAPS}
GROUP BY a.doc_id ORDER BY a.doc_id LIMIT 20
""",
        # span_multi: multi-term slots as LIKE predicates (prefix ->
        # 'p%', wildcard ? -> '_'), then the 2-slot ordered chain rule
        "fts_span_multi_docs": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
p0 AS (SELECT doc_id, pos FROM ptoks WHERE term LIKE 'dat%'),
p1 AS (SELECT doc_id, pos FROM ptoks WHERE term LIKE 'jo_n')
SELECT a.doc_id, count(*) AS n_matches
FROM p0 a JOIN p1 s1 ON s1.doc_id = a.doc_id AND s1.pos > a.pos
WHERE s1.pos <= a.pos + {1 + P.SPAN_MULTI_SLOP}
GROUP BY a.doc_id ORDER BY a.doc_id LIMIT 20
""",
        # simple_query_string: (spark AND data) | "the customer" |
        # (sma* AND NOT window) — matched groups sum their positive
        # atoms' scores: require-all BM25 + phrase spec + prefix 1.0
        "fts_simple_query_string_top10": f"""
{_bm25_with(["data", "spark"], require_all=True)},
{_phrase_scores_ctes(["the", "customer"])},
sqs_pref AS (
  SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'sma%'
  AND doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'window')
),
sqs_hits AS (
  SELECT doc_id FROM scores
  UNION SELECT doc_id FROM ph_scores
  UNION SELECT doc_id FROM sqs_pref
)
SELECT h.doc_id,
       CAST(round((coalesce(s2.score, 0.0) + coalesce(p.score, 0.0)
                   + (CASE WHEN pr.doc_id IS NULL THEN 0.0 ELSE 1.0 END))
                  * 1e6) AS BIGINT) AS score_e6
FROM sqs_hits h
LEFT JOIN scores s2 USING (doc_id)
LEFT JOIN ph_scores p USING (doc_id)
LEFT JOIN sqs_pref pr USING (doc_id)
ORDER BY (coalesce(s2.score, 0.0) + coalesce(p.score, 0.0)
          + (CASE WHEN pr.doc_id IS NULL THEN 0.0 ELSE 1.0 END)) DESC,
         h.doc_id
LIMIT 10
""",
        # missing agg: NULL size_tag == n_chars below the tag threshold
        "fts_missing_count": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT CAST(sum(CASE WHEN n_chars < {P.SIZE_TAG_MIN} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missing,
       CAST(sum(CASE WHEN n_chars >= {P.SIZE_TAG_MIN} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_present
FROM documents JOIN hits USING (doc_id)
""",
        # global agg: whole-corpus bucket next to the query hit count
        "fts_global_agg": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))}))
SELECT (SELECT count(*) FROM hits) AS n_hits,
       (SELECT count(*) FROM documents) AS n_global,
       (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS sum_nchars
""",
        # sampler agg: terms on source inside the top-100 BM25 sample
        "fts_sampler_terms": f"""
{_bm25_with(sorted(set(P.BM25_QUERY.split())))},
sample AS (
  SELECT doc_id FROM scores
  ORDER BY score DESC, doc_id LIMIT {P.SAMPLER_SHARD_SIZE}
)
SELECT source, count(*) AS doc_count
FROM documents JOIN sample USING (doc_id)
GROUP BY source ORDER BY doc_count DESC, source LIMIT 10
""",
        # date_range agg: ISO-keyed [from, to) buckets on ts_epoch
        "fts_date_range_agg": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
h AS (SELECT ({P.TS_EPOCH0} + doc_id * 25200) AS ts
      FROM documents JOIN hits USING (doc_id))
{" UNION ALL ".join(
    "SELECT '{key}' AS key, count(*) AS doc_count FROM h WHERE {cond}"
    .format(
        key=f"{f or '*'}-{t or '*'}",
        cond=" AND ".join(
            c for c in (
                None if f is None else f"ts >= {_iso_epoch(f)}",
                None if t is None else f"ts < {_iso_epoch(t)}",
            ) if c
        ) or "TRUE",
    )
    for f, t in P.DATE_RANGES_ISO
)}
""",
        # normalize pipeline agg: percent_of_sum over date-hist buckets
        "fts_date_hist_normalize": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT month_start, n_docs,
       CAST(floor(n_docs * 100.0 * 1000000
                  / (SELECT sum(n_docs) FROM hist) + 0.5) AS BIGINT)
         AS pct_e6
FROM hist ORDER BY month_start
""",
        # normalize z-score: exact integer moments, pinned float order
        # mean = S/n; std = sqrt(n*S2 - S^2)/n; z = (v-mean)/std
        "fts_date_hist_zscore": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
),
mo AS (
  SELECT count(*) AS n, sum(n_docs) AS s,
         sum(n_docs * n_docs) AS s2
  FROM hist
)
SELECT h.month_start, h.n_docs,
       CASE WHEN m.n * m.s2 - m.s * m.s = 0 THEN 0
            ELSE CAST(floor(
              (h.n_docs - CAST(m.s AS DOUBLE) / m.n)
              / (sqrt(CAST(m.n * m.s2 - m.s * m.s AS DOUBLE)) / m.n)
              * 1e6 + 0.5) AS BIGINT) END AS z_e6
FROM hist h CROSS JOIN mo m ORDER BY h.month_start
""",
        # bucket_selector + bucket_sort over the date-hist buckets
        "fts_date_hist_bucket_sort": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT month_start, n_docs FROM hist
WHERE n_docs >= {P.BUCKET_SORT_MIN}
ORDER BY n_docs DESC, month_start LIMIT {P.BUCKET_SORT_K}
""",
        # exists query: non-null size_tag == n_chars >= the tag floor
        "fts_exists_docs": f"""
SELECT doc_id,
       (SELECT count(*) FROM documents
        WHERE n_chars >= {P.SIZE_TAG_MIN}) AS n_exists
FROM documents WHERE n_chars >= {P.SIZE_TAG_MIN}
ORDER BY doc_id LIMIT 20
""",
        # constant_score: filter context, every hit scores the boost
        "fts_constant_score_docs": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term = '{P.CONST_SCORE_TERM}')
SELECT doc_id,
       CAST({int(round(P.CONST_SCORE_BOOST * 1e6))} AS BIGINT) AS score_e6
FROM documents JOIN hits USING (doc_id)
WHERE n_chars >= {P.CONST_SCORE_MIN_NCHARS}
ORDER BY doc_id LIMIT 20
""",
        # ids query: distinct ascending id filter, constant score
        "fts_ids_docs": f"""
SELECT doc_id, n_chars, CAST(1000000 AS BIGINT) AS score_e6
FROM documents
WHERE doc_id IN ({",".join(str(i) for i in sorted(set(P.IDS_PROBE)))})
ORDER BY doc_id
""",
        # match + fuzziness: per-token OSA<=1 expansions (closest-first
        # cap 50 — damerau_levenshtein is DuckDB's OSA), each scoring
        # BM25 with its own df, decayed (E+1-ed)/(E+1), same-term
        # weights summed, accumulation ORDER BY term
        "fts_match_fuzzy_top10": f"""
WITH {_TOKS_CTE},
{_DL_CTE},
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
vocab AS (SELECT DISTINCT term FROM toks),
{",".join(
    "exp{i} AS (SELECT term, damerau_levenshtein(term, '{q}') AS ed "
    "FROM vocab WHERE damerau_levenshtein(term, '{q}') <= {e} "
    "ORDER BY ed, term LIMIT 50)".format(
        i=i, q=q, e=P.FUZZY_MATCH_EDITS)
    for i, q in enumerate(P.FUZZY_MATCH_QUERY.split())
)},
qt AS (
  SELECT term,
         sum(({P.FUZZY_MATCH_EDITS} + 1 - ed)
             / ({P.FUZZY_MATCH_EDITS} + 1.0)) AS boost
  FROM ({" UNION ALL ".join(
      f"SELECT * FROM exp{i}"
      for i in range(len(P.FUZZY_MATCH_QUERY.split()))
  )})
  GROUP BY term
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( (q.boost * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)))
              * ( tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
              ORDER BY tf.term ) AS score
  FROM tf JOIN df USING (term) JOIN qt q USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM scores ORDER BY score DESC, doc_id LIMIT 10
""",
        # per-source TF-IDF keywords: group tf * ln(1 + N/df), top 3
        "doc_tfidf_keywords": f"""
WITH {_TOKS_CTE},
tf AS (
  SELECT d.source AS grp, t.term, count(*) AS tf
  FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2
),
dfx AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT grp, term,
         CAST(floor(tf * ln(1 + nn.n / dfx.df::DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS score_e6
  FROM tf JOIN dfx USING (term) CROSS JOIN nn
),
r AS (
  SELECT grp, term, score_e6,
         row_number() OVER (PARTITION BY grp
                            ORDER BY score_e6 DESC, term) AS rk
  FROM sc
)
SELECT grp AS source, term, score_e6 FROM r WHERE rk <= {P.TFIDF_TOP_K}
""",
        # quality funnel: first-failing-rule attribution, integer
        # cross-multiplied thresholds (no float compares)
        # composed prep funnel: quality kept -> exact dedup (min-id per
        # md5(text) within kept) -> md5-bucket split; (count, id_sum)
        # per stage checks membership, not just totals
        "prep_funnel_counts": f"""
WITH {qf_cls},
kept AS (SELECT doc_id FROM cls WHERE rule = 'kept'),
dk AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d JOIN kept USING (doc_id)
  GROUP BY md5(d.text)
),
sp AS (
  SELECT doc_id,
         CASE WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8)) AS BIGINT) % 100) < 90
              THEN 'train' ELSE 'holdout' END AS split
  FROM dk
)
SELECT 'input' AS stage, count(*)::BIGINT AS n_docs,
       coalesce(sum(doc_id), 0)::BIGINT AS id_sum FROM documents
UNION ALL
SELECT 'quality_kept', count(*)::BIGINT,
       coalesce(sum(doc_id), 0)::BIGINT FROM kept
UNION ALL
SELECT 'dedup_kept', count(*)::BIGINT,
       coalesce(sum(doc_id), 0)::BIGINT FROM dk
UNION ALL
SELECT s.n, coalesce(t.c, 0)::BIGINT, coalesce(t.s, 0)::BIGINT
FROM (VALUES ('train'), ('holdout')) s(n)
LEFT JOIN (SELECT split, count(*) AS c, sum(doc_id) AS s
           FROM sp GROUP BY split) t ON t.split = s.n
""",
        "quality_filter_counts": f"""
WITH {qf_cls},
names(rule) AS (VALUES ('min_tokens'), ('top_token'), ('dup_2gram'),
                       ('kept'))
SELECT n.rule, CAST(coalesce(c.n, 0) AS BIGINT) AS n_docs
FROM names n LEFT JOIN (SELECT rule, count(*) AS n FROM cls GROUP BY 1) c
  USING (rule)
""",
        # terms lookup: values read from TERMS_LOOKUP_DOC's lang field
        "fts_terms_lookup_docs": f"""
WITH lk AS (SELECT lang FROM documents
            WHERE doc_id = {P.TERMS_LOOKUP_DOC}),
hits AS (SELECT doc_id FROM documents
         WHERE lang IN (SELECT lang FROM lk))
SELECT doc_id, (SELECT count(*) FROM hits) AS n_hits
FROM hits ORDER BY doc_id LIMIT 20
""",
        # search template: the render resolves to BM25_QUERY verbatim,
        # so the oracle is the flagship BM25 top-10
        "fts_search_template_top10": _bm25_sql(
            sorted(set(P.BM25_QUERY.split())), 10
        ),
        # cumulative_cardinality: correlated running distinct per month
        "fts_cumulative_cardinality": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
h AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         source
  FROM documents JOIN hits USING (doc_id)
),
hist AS (SELECT month_start, count(*) AS n_docs FROM h GROUP BY 1)
SELECT hist.month_start, hist.n_docs,
       (SELECT count(DISTINCT h2.source) FROM h h2
        WHERE h2.month_start <= hist.month_start) AS cum_distinct
FROM hist ORDER BY hist.month_start
""",
        # moving_percentiles: quantile_cont over the trailing frame
        "fts_date_hist_moving_pct": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT month_start, n_docs,
{",".join(
    "       CAST(round(quantile_cont(n_docs, {q}) OVER w * 1e6) AS BIGINT)"
    " AS p{n}_e6".format(q=p / 100.0, n=int(p))
    for p in P.MOVING_PCTS
)}
FROM hist
WINDOW w AS (ORDER BY month_start
             ROWS BETWEEN {P.MOVING_PCT_WINDOW - 1} PRECEDING
             AND CURRENT ROW)
ORDER BY month_start
""",
        # percentiles_bucket: quantile_cont over the month-bucket counts
        "fts_percentiles_bucket": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))) AS BIGINT)
           AS month_start,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT
{",".join(
    "  CAST(round(quantile_cont(n_docs, {q}) * 1e6) AS BIGINT) AS p{n}_e6"
    .format(q=p / 100.0, n=int(p)) for p in P.PCT_BUCKET_PCTS
)}
FROM hist
""",
        # random_sampler: md5-prefix rule (the random_score / hash-split
        # twin) at probability {P.RANDOM_SAMPLER_PROB}, terms sub-agg
        "fts_random_sampler": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
samp AS (
  SELECT doc_id FROM hits
  WHERE CAST(('0x' || substr(md5('{P.RANDOM_SAMPLER_SEED}:'
          || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        < {int(P.RANDOM_SAMPLER_PROB * 4294967296.0)}
)
SELECT source, count(*) AS n_docs,
       (SELECT count(*) FROM samp) AS n_sampled
FROM documents JOIN samp USING (doc_id)
GROUP BY source ORDER BY n_docs DESC, source LIMIT 8
""",
        # _delete_by_query: survivors = documents minus lang-filtered hits
        "fts_delete_by_query": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
del AS (
  SELECT d.doc_id FROM documents d JOIN hits USING (doc_id)
  WHERE d.lang = '{P.DBQ_LANG}'
)
SELECT lang, count(*) AS n_docs FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM del)
GROUP BY lang ORDER BY n_docs DESC, lang LIMIT 10
""",
        # _update_by_query: hits re-case lang, everyone else unchanged
        "fts_update_by_query": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
upd AS (
  SELECT d.doc_id FROM documents d JOIN hits USING (doc_id)
  WHERE d.n_chars >= {P.UBQ_MIN_NCHARS}
)
SELECT CASE WHEN doc_id IN (SELECT doc_id FROM upd)
            THEN upper(lang) ELSE lang END AS lang,
       count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY n_docs DESC, lang LIMIT 20
""",
        # field_masking_span: the cross-field chain equals the raw-stream
        # two-term span_near spec (stop filter preserves positions)
        "fts_field_masked_span": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos FROM lists),
p0 AS (SELECT doc_id, pos FROM ptoks
       WHERE term = '{P.MASKED_SPAN_TERMS[0]}'),
p1 AS (SELECT doc_id, pos FROM ptoks
       WHERE term = '{P.MASKED_SPAN_TERMS[1]}')
SELECT a.doc_id, count(*) AS n_matches
FROM p0 a JOIN p1 b ON b.doc_id = a.doc_id AND b.pos > a.pos
WHERE b.pos <= a.pos + {1 + P.MASKED_SPAN_SLOP}
GROUP BY a.doc_id ORDER BY a.doc_id LIMIT 20
""",
        # children agg: parents = sources with a long-doc hit, children
        # bucket = every doc under them, lang terms sub-agg
        "fts_children_agg": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
parents AS (
  SELECT DISTINCT source FROM documents JOIN hits USING (doc_id)
  WHERE n_chars >= {P.CHILDREN_MIN_NCHARS}
),
kids AS (SELECT d.lang FROM documents d JOIN parents USING (source))
SELECT lang, count(*) AS n_docs,
       (SELECT count(*) FROM kids) AS n_children
FROM kids GROUP BY lang ORDER BY n_docs DESC, lang LIMIT 10
""",
        # runtime field: (n_chars*7 - 100)/4 evaluated at query time —
        # quarters, so min/max/sum are float-order-free
        "fts_runtime_field_stats": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
rt AS (SELECT doc_id, (n_chars * 7 - 100) / 4.0 AS v
       FROM documents JOIN hits USING (doc_id))
SELECT count(*) AS n,
       CAST(round(min(v) * 1e6) AS BIGINT) AS min_e6,
       CAST(round(max(v) * 1e6) AS BIGINT) AS max_e6,
       CAST(round(sum(v) * 1e6) AS BIGINT) AS sum_e6,
       CAST(sum(CASE WHEN v < 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN v >= 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM rt
""",
        # vocab growth: first-occurrence doc per term, bucket histogram
        # + running cumsum (Heaps curve)
        # ingest pipeline: the processor chain replayed in SQL — nested
        # transforms IN ORDER (lowercase -> digit gsub -> trim), set ->
        # constant, rename -> aliased column
        "text_ingest_processors": """
SELECT doc_id, lang AS lang_code, 'norm_v1' AS pipeline,
       length(trim(regexp_replace(lower(text), '[0-9]+', '#', 'g')))
         ::BIGINT AS n_out_chars
FROM documents
""",
        # grok %{WORD:w1} %{GREEDYDATA:rest} + dissect src%{src_num}:
        # the SAME anchored RE2 the processors compile, through DuckDB's
        # RE2; non-matching texts (no space) -> null w1 group (the
        # regexp_matches guard — DuckDB regexp_extract returns '' on
        # no-match, not null)
        "text_grok_dissect": r"""
SELECT CASE WHEN regexp_matches(text, '^(\w+) (.*)$')
            THEN regexp_extract(text, '^(\w+) (.*)$', 1) END AS w1,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN regexp_matches(source, '^src(.*)$')
                THEN CAST(regexp_extract(source, '^src(.*)$', 1)
                          AS BIGINT) END)::BIGINT AS sum_src_num
FROM documents
GROUP BY 1 ORDER BY 1
""",
        # split/fingerprint/convert/drop: list length == regex-split
        # cell count, md5 of the '|' join, int->varchar cast, and the
        # drop processor's row filter
        "text_ingest_extract": """
SELECT doc_id,
       len(string_split_regex(text, ' '))::BIGINT AS n_tokens,
       md5(lang || '|' || source) AS fp,
       n_chars::VARCHAR AS n_chars_str
FROM documents WHERE lang != 'de'
""",
        # enrich processor: the broadcast lookup replayed as a VALUES
        # join (unmatched -> null family; engine groupby counts nulls
        # under the pandas string 'None' — match via coalesce... the
        # synthetic langs all match, pinned by the pytest instead)
        "keyword_count_by_family": f"""
WITH fam(lang, family) AS (VALUES
  {", ".join(f"('{k}', '{v}')" for k, v in sorted(P.LANG_FAMILY.items()))}
)
SELECT f.family, count(*)::BIGINT AS n_docs
FROM documents d JOIN fam f USING (lang)
GROUP BY f.family ORDER BY f.family
""",
        # token entropy: H = ln(n) - (sum c*ln c)/n per doc, e6; empty
        # docs coalesce to 0 (the engine's pos-mask rule)
        "text_token_entropy": f"""
WITH {_TOKS_CTE},
tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
ag AS (SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS s
       FROM tc GROUP BY 1)
SELECT d.doc_id, coalesce(a.n, 0)::BIGINT AS n_tokens,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(round((ln(a.n) - a.s / a.n) * 1e6) AS BIGINT)
            ELSE 0 END AS entropy_e6
FROM documents d LEFT JOIN ag a USING (doc_id)
""",
        # length Gini: exact pairwise-difference identity over the
        # length histogram, HUGEINT throughout, round-half-up e6
        "text_length_gini": f"""
WITH {_TOKS_CTE},
dl AS (
  SELECT d.doc_id, count(t.term)::HUGEINT AS L
  FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY d.doc_id
),
h AS (SELECT L, count(*)::HUGEINT AS c FROM dl GROUP BY L),
w AS (
  SELECT L, c,
    coalesce(sum(c) OVER (ORDER BY L
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bn,
    coalesce(sum(L * c) OVER (ORDER BY L
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bs
  FROM h
),
agg AS (
  SELECT sum(c) AS n, sum(L * c) AS s,
         sum(c * (L * bn - bs)) AS p
  FROM w
)
SELECT n::BIGINT AS n_docs, s::BIGINT AS total_tokens,
       ((2000000 * p + n * s) // (2 * n * s))::BIGINT AS gini_e6
FROM agg
""",
        # Zipf slope: OLS of ln(tf) on ln(rank) over the exact top-R
        # terms (tf desc, term asc); e6 rounding absorbs sum-order ulps
        # per-doc OOV rate: exact top-K vocabulary (cf desc, term asc),
        # exact integer (n_toks, n_oov) per doc; empty docs -> (0, 0)
        "vocab_oov_rate": f"""
WITH {_TOKS_CTE},
cf AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term),
vocab AS (SELECT term FROM cf ORDER BY c DESC, term
          LIMIT {P.OOV_VOCAB_K}),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_toks,
         sum(CASE WHEN term NOT IN (SELECT term FROM vocab)
             THEN 1 ELSE 0 END)::BIGINT AS n_oov
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, coalesce(p.n_toks, 0)::BIGINT AS n_toks,
       coalesce(p.n_oov, 0)::BIGINT AS n_oov
FROM documents d LEFT JOIN per p USING (doc_id)
""",
        "vocab_zipf_slope": f"""
WITH {_TOKS_CTE},
tf AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY term),
top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r
  FROM tf ORDER BY n DESC, term LIMIT {P.ZIPF_TOP_R}
)
SELECT count(*)::BIGINT AS n_terms,
       CAST(round(regr_slope(ln(n), ln(r)) * 1e6) AS BIGINT) AS slope_e6,
       CAST(round(regr_intercept(ln(n), ln(r)) * 1e6) AS BIGINT)
         AS intercept_e6
FROM top
""",
        "vocab_growth_curve": f"""
WITH {_TOKS_CTE},
firsts AS (SELECT term, min(doc_id) AS min_doc FROM toks GROUP BY term),
hist AS (
  SELECT min_doc // {P.VOCAB_GROWTH_BUCKET} AS bucket,
         count(*) AS n_new
  FROM firsts GROUP BY 1
)
SELECT (bucket + 1) * {P.VOCAB_GROWTH_BUCKET} AS bucket_end,
       n_new AS n_new_terms,
       CAST(sum(n_new) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size
FROM hist ORDER BY bucket
""",
        # ANN recall@k: per-probe exact top-k vs LSH-bucketed top-k
        # (same seeded plane literals as the knn_cosine_lsh oracle)
        "knn_recall_at_k": f"""
WITH
planes(pid, i, val) AS (VALUES {_X._planes_values(P.RECALL_PLANES, 64, 11)}),
probes(qid) AS (VALUES {",".join(f"({q})" for q in P.RECALL_PROBES)}),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
qv AS (SELECT p.qid, v.i, v.val FROM v JOIN probes p ON v.vec_id = p.qid),
dots AS (
  SELECT q.qid, v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN qv q USING (i) GROUP BY q.qid, v.vec_id
),
sims AS (
  SELECT qid, vec_id,
         CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT) AS s
  FROM dots
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY s DESC, vec_id) AS rk
    FROM sims
  ) WHERE rk <= {P.RECALL_K}
),
vdot AS (
  SELECT v.vec_id, p.pid, sum(v.val * p.val) AS dot
  FROM v JOIN planes p USING (i) GROUP BY v.vec_id, p.pid
),
vb AS (
  SELECT vec_id, sum(CASE WHEN dot > 0 THEN 1 << pid ELSE 0 END) AS b
  FROM vdot GROUP BY vec_id
),
qb AS (SELECT p.qid, vb.b FROM probes p JOIN vb ON vb.vec_id = p.qid),
lsh AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, s.vec_id,
           row_number() OVER (PARTITION BY s.qid
                              ORDER BY s.s DESC, s.vec_id) AS rk
    FROM sims s
    JOIN vb ON vb.vec_id = s.vec_id
    JOIN qb ON qb.qid = s.qid AND qb.b = vb.b
  ) WHERE rk <= {P.RECALL_K}
)
SELECT p.qid AS query_id,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(l.n, 0) AS BIGINT) AS n_lsh,
       CAST(floor(coalesce(o.n, 0) * 1e6 / {P.RECALL_K} + 0.5) AS BIGINT)
         AS recall_e6
FROM probes p
LEFT JOIN (
  SELECT e.qid, count(*) AS n FROM exact e
  JOIN lsh USING (qid, vec_id) GROUP BY e.qid
) o ON o.qid = p.qid
LEFT JOIN (SELECT qid, count(*) AS n FROM lsh GROUP BY qid) l
  ON l.qid = p.qid
ORDER BY p.qid
""",
        # MMR rerank: greedy picks unrolled as CTE stages
        "fts_mmr_rerank": _mmr_sql(),
        # semantic decontamination: per-corpus-row max cosine vs the
        # benchmark slice, flag at the tau floor
        "semantic_decontaminate_counts": f"""
WITH bv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id < {P.SEMDECON_BENCH_N}
),
cv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings WHERE vec_id >= {P.SEMDECON_BENCH_N}
),
bn AS (SELECT vec_id, sqrt(sum(val * val)) AS n FROM bv GROUP BY 1),
cn AS (SELECT vec_id, sqrt(sum(val * val)) AS n FROM cv GROUP BY 1),
dots AS (
  SELECT c.vec_id AS cid, b.vec_id AS bid, sum(c.val * b.val) AS dot
  FROM cv c JOIN bv b USING (i) GROUP BY 1, 2
),
mx AS (
  SELECT d.cid AS vec_id, max(d.dot / (cn.n * bn.n)) AS m
  FROM dots d JOIN cn ON cn.vec_id = d.cid
  JOIN bn ON bn.vec_id = d.bid
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_corpus,
       CAST(sum(CASE WHEN m >= {P.SEMDECON_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
       CAST(sum(CASE WHEN m >= {P.SEMDECON_TAU} THEN vec_id ELSE 0 END)
            AS BIGINT) AS sum_flagged_id
FROM mx
""",
        # frequent_item_sets: UNION ALL of the 7 subset shapes, support
        # floor, (support desc, n_items desc, key asc)
        "fts_frequent_item_sets": f"""
WITH d AS (
  SELECT 'lang=' || lang AS la, 'source=' || source AS so,
         CASE WHEN n_chars >= {P.SIZE_TAG_MIN} THEN 'size=big' END AS sz
  FROM documents
),
sets AS (
  SELECT la AS key FROM d
  UNION ALL SELECT so FROM d
  UNION ALL SELECT sz FROM d WHERE sz IS NOT NULL
  UNION ALL SELECT la || '|' || so FROM d
  UNION ALL SELECT la || '|' || sz FROM d WHERE sz IS NOT NULL
  UNION ALL SELECT so || '|' || sz FROM d WHERE sz IS NOT NULL
  UNION ALL SELECT la || '|' || so || '|' || sz FROM d
    WHERE sz IS NOT NULL
),
f AS (SELECT key, count(*) AS support FROM sets GROUP BY 1
      HAVING count(*) >= {P.FIS_MIN_SUPPORT})
SELECT key, support,
       CAST(length(key) - length(replace(key, '|', '')) + 1 AS BIGINT)
         AS n_items
FROM f ORDER BY support DESC, n_items DESC, key LIMIT {P.FIS_TOP_N}
""",
        # DSIR: md5-bucket histograms of target slice vs corpus,
        # Laplace log-ratio per bucket, per-doc instance sum
        "dsir_select_top": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
th AS (SELECT doc_id,
              CAST(md5_number_lower(unnest(l)) % {P.DSIR_BUCKETS}
                   AS BIGINT) AS b
       FROM lists),
raw AS (SELECT b, count(*) AS n FROM th GROUP BY 1),
tgt AS (SELECT th.b, count(*) AS n FROM th
        JOIN documents d USING (doc_id)
        WHERE d.source = '{P.DSIR_TARGET_SOURCE}' GROUP BY 1),
tots AS (SELECT (SELECT count(*) FROM th) AS nr,
                (SELECT count(*) FROM th
                 JOIN documents d USING (doc_id)
                 WHERE d.source = '{P.DSIR_TARGET_SOURCE}') AS nt),
lr AS (
  SELECT r.b,
         ln((coalesce(t.n, 0) + 1) / (tots.nt + {P.DSIR_BUCKETS}))
         - ln((r.n + 1) / (tots.nr + {P.DSIR_BUCKETS})) AS lw
  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tots
),
sc AS (SELECT th.doc_id, sum(lr.lw) AS logw
       FROM th JOIN lr USING (b) GROUP BY 1)
SELECT doc_id, CAST(floor(logw * 1e6 + 0.5) AS BIGINT) AS logw_e6
FROM sc ORDER BY logw DESC, doc_id LIMIT {P.DSIR_TOP_N}
""",
        # _analyze: the ptoks token stream restricted to the probe docs
        "fts_analyze_text": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents WHERE doc_id < {P.ANALYZE_DOCS})
SELECT doc_id, generate_subscripts(l, 1) - 1 AS position,
       unnest(l) AS token
FROM lists ORDER BY doc_id, position
""",
        # categorize_text: first-k digit-masked tokens joined as the
        # template key, top-N (count desc, key asc)
        "fts_categorize_text": f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS l
               FROM documents),
keys AS (
  SELECT array_to_string(
           list_transform(l[1:{P.CAT_K_TOKENS}],
                          t -> regexp_replace(t, '[0-9]+', '#', 'g')),
           ' ') AS category
  FROM lists
)
SELECT category, count(*) AS n_docs
FROM keys GROUP BY 1
ORDER BY n_docs DESC, category LIMIT {P.CAT_TOP_N}
""",
        # rate agg: month count / true calendar days, floor(x+0.5) e6
        "fts_date_hist_rate": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))
           AS m,
         count(*) AS n_docs
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT CAST(epoch(m) AS BIGINT) AS month_start,
       n_docs,
       CAST(date_diff('day', m, m + INTERVAL 1 MONTH) AS BIGINT) AS days,
       CAST(floor(n_docs * 1e6
                  / date_diff('day', m, m + INTERVAL 1 MONTH) + 0.5)
            AS BIGINT) AS rate_e6
FROM hist ORDER BY 1
""",
        # rate with a field: sum(n_chars) per true month-length day
        "fts_date_hist_rate_sum": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT date_trunc('month',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000))
           AS m,
         sum(n_chars) AS s
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
)
SELECT CAST(epoch(m) AS BIGINT) AS month_start,
       s::BIGINT AS sum_nchars,
       CAST(date_diff('day', m, m + INTERVAL 1 MONTH) AS BIGINT) AS days,
       CAST(floor(s * 1e6
                  / date_diff('day', m, m + INTERVAL 1 MONTH) + 0.5)
            AS BIGINT) AS rate_e6
FROM hist ORDER BY 1
""",
        # bucket_correlation: weekly series of both queries aligned on
        # the union of weeks (missing -> 0), exact integer moments
        "fts_bucket_correlation": f"""
WITH {_TOKS_CTE},
ha AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hb AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{P.CORR_QUERY_B}'),
wa AS (SELECT CAST(epoch(date_trunc('week',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000)))
         AS BIGINT) AS wk, count(*) AS n
       FROM documents JOIN ha USING (doc_id) GROUP BY 1),
wb AS (SELECT CAST(epoch(date_trunc('week',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000)))
         AS BIGINT) AS wk, count(*) AS n
       FROM documents JOIN hb USING (doc_id) GROUP BY 1),
u AS (SELECT coalesce(wa.n, 0) AS x, coalesce(wb.n, 0) AS y
      FROM wa FULL OUTER JOIN wb ON wa.wk = wb.wk),
mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
       FROM u)
SELECT CAST(n AS BIGINT) AS n_buckets,
       CAST(floor((n * sxy - sx * sy)
                  / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                  * 1e6 + 0.5) AS BIGINT) AS corr_e6
FROM mo
""",
        # bucket_count_ks_test: max |cdf_a - cdf_b| over union-aligned
        # weekly buckets, exact integer prefix sums
        "fts_ks_test": f"""
WITH {_TOKS_CTE},
ha AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hb AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{P.CORR_QUERY_B}'),
wa AS (SELECT CAST(epoch(date_trunc('week',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000)))
         AS BIGINT) AS wk, count(*) AS n
       FROM documents JOIN ha USING (doc_id) GROUP BY 1),
wb AS (SELECT CAST(epoch(date_trunc('week',
         make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000)))
         AS BIGINT) AS wk, count(*) AS n
       FROM documents JOIN hb USING (doc_id) GROUP BY 1),
u AS (SELECT coalesce(wa.wk, wb.wk) AS wk,
             coalesce(wa.n, 0) AS x, coalesce(wb.n, 0) AS y
      FROM wa FULL OUTER JOIN wb ON wa.wk = wb.wk),
c AS (SELECT wk,
             sum(x) OVER (ORDER BY wk) AS p,
             sum(y) OVER (ORDER BY wk) AS q,
             sum(x) OVER () AS na, sum(y) OVER () AS nb
      FROM u)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(floor(max(abs(p / na - q / nb)) * 1e6 + 0.5) AS BIGINT)
         AS ks_e6
FROM c
""",
        # ip_prefix: /len blocks of the derived IPv4 ints, dotted keys
        "fts_ip_prefix": f"""
WITH e AS (
  SELECT {P.IP_BASE} + (user_id * {P.IP_MULT}) % 16777216 AS ip
  FROM events
),
p AS (SELECT (ip // {1 << (32 - P.IP_PREFIX_LEN)})
               * {1 << (32 - P.IP_PREFIX_LEN)} AS pfx,
             count(*) AS doc_count
      FROM e GROUP BY 1)
SELECT CAST(pfx // 16777216 % 256 AS VARCHAR) || '.'
       || CAST(pfx // 65536 % 256 AS VARCHAR) || '.'
       || CAST(pfx // 256 % 256 AS VARCHAR) || '.'
       || CAST(pfx % 256 AS VARCHAR) || '/{P.IP_PREFIX_LEN}' AS prefix,
       doc_count
FROM p ORDER BY pfx
""",
        # ip_range: [from, to) rings with '*' open ends
        "fts_ip_range": f"""
WITH e AS (
  SELECT {P.IP_BASE} + (user_id * {P.IP_MULT}) % 16777216 AS ip
  FROM events
)
{" UNION ALL ".join(
    "SELECT '{key}' AS key, count(*) AS doc_count FROM e WHERE {cond}"
    .format(
        key=("*" if f is None else P._dotted(f)) + "-"
            + ("*" if t is None else P._dotted(t)),
        cond=" AND ".join(
            ([f"ip >= {f}"] if f is not None else [])
            + ([f"ip < {t}"] if t is not None else [])
        ) or "TRUE",
    )
    for f, t in P.IP_RANGE_EDGES
)}
""",
        # change_point: argmax of |mean_l - mean_r| * sqrt(t(n-t)/n)
        # over weekly prefix splits, ties -> smallest t
        "fts_change_point": f"""
WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN
  ({",".join(f"'{t}'" for t in sorted(set(P.BM25_QUERY.split())))})),
hist AS (
  SELECT CAST(epoch(date_trunc('week',
           make_timestamp(({P.TS_EPOCH0} + doc_id * 25200) * 1000000)))
           AS BIGINT) AS wk, count(*) AS n
  FROM documents JOIN hits USING (doc_id) GROUP BY 1
),
ser AS (
  SELECT wk, n,
         row_number() OVER (ORDER BY wk) AS rn,
         count(*) OVER () AS nb,
         sum(n) OVER () AS s,
         sum(n) OVER (ORDER BY wk) AS p,
         lead(wk) OVER (ORDER BY wk) AS right_key
  FROM hist
),
st AS (
  SELECT right_key, rn AS t,
         abs(p / rn - (s - p) / (nb - rn))
           * sqrt(rn * (nb - rn) / nb) AS stat
  FROM ser WHERE rn < nb
)
SELECT right_key AS split_key, CAST(t AS BIGINT) AS left_n,
       CAST(floor(stat * 1e6 + 0.5) AS BIGINT) AS stat_e6
FROM st ORDER BY stat DESC, t LIMIT 1
""",
    }
