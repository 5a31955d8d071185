"""Driver-facing query pipelines over the sf testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names + values match the DuckDB oracle SQL in ``__ray_entry__.py``
(the driver's correctness gate). The `documents` table plays the transcript
corpus role here (doc_id/text); the authoritative transcript-schema paths
are exercised by tests/bench over the seeded fixture corpus.

Everything is Ray-Data-first: vectorized map_batches, pre-aggregated
groupbys, broadcast small sides, no driver-side row loops over big data.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .analysis import analyze_batch
from .build import build_index
from .config import IndexJobConfig
from .search import Searcher, run_queries

# Frozen probe constants shared with oracle_sql (keep in sync).
BM25_QUERY = "spark join the data"
# stemmed-index query: plural forms stem onto corpus terms; 'joins' and
# 'join' collapse to ONE clause of weight 2 (Lucene duplicate clauses)
STEM_QUERY = "joins join the data"
BM25_QUERY_HOT = "the customer"
BM25_BOOSTED = "spark^3 join the^0.5 data"  # Lucene clause boosts
BM25_BOOSTS = {"spark": 3.0, "the": 0.5}    # oracle twin of the ^ suffixes
SYN_QUERY = "spark join scan"               # synonym-expansion probe
SYNONYMS = {"join": ("merge",), "scan": ("filter",)}
MULTI_QUERY = "spark data src7"             # multi_match probe (text+source)
MULTI_BOOSTS = {"text": 1.0, "source": 2.0}
PHRASE_QUERY = "the data"          # exact-adjacency phrase (slot order matters)
BOOL_MUST_NOT = "window"           # must_not clause of the bool query
PREFIX_QUERY = "s"                 # term-dictionary prefix probe
WILDCARD_QUERY = "s?a*"            # glob probe (scan, small, spark at sf*)
FUZZY_QUERY = "bat"                # fuzzy probe (absent term, 6 matches @2)
FUZZY_EDITS = 2
PROBE_TERMS = ("the", "spark", "join", "window", "zz_absent_zz")
SUGGEST_TEXT = "bacth jion"        # term-suggester probes (both OOV at sf*)
COMPLETE_PREFIX = "s"              # completion-suggester prefix probe
PHRASE_SUGGEST_TEXT = "smal jion"  # phrase-suggester probe (2 OOV slots)
MLT_DOC = 7                        # more_like_this probe document (src id)
STOPWORDS_SQL = ("the", "a", "to", "ok", "and", "of", "in", "is", "it")
TS_EPOCH0 = 1_735_689_600          # 2025-01-01T00:00:00Z — synthetic ts base
PERCENTS = (25.0, 50.0, 75.0, 95.0, 99.0)


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# full-text core (documents table as the corpus)
# ---------------------------------------------------------------------------


def documents_index(sf_dir: str) -> str:
    """Build (once, cached by sf_dir) the inverted index over `documents`.

    The table's own doc_id becomes the sort key (src_doc_id), and because it
    is dense from 0 the engine's assigned dense doc_id coincides — but the
    mapping is carried explicitly and never assumed.
    """
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    # content fingerprint in the tag: a changed documents.parquet at the
    # same path must never serve results from a stale cached index
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|pos4".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    def prep(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        )
        # deterministic synthetic timestamp (the documents table carries
        # none): 2025-01-01T00:00:00Z + 7h per doc — UTC epoch seconds,
        # derived identically in the DuckDB oracles; exercises the
        # date_histogram calendar kernel over a real docstore column
        ts = pc.add(
            pc.multiply(t["src_doc_id"], pa.scalar(25_200, pa.int64())),
            pa.scalar(TS_EPOCH0, pa.int64()),
        )
        t = t.append_column("ts_epoch", ts)
        # nullable keyword: 'big' for long docs, NULL otherwise — gives
        # the missing aggregation a field that is genuinely absent on
        # some docs (lang/source are always present)
        big = pc.if_else(
            pc.greater_equal(t["n_chars"], pa.scalar(SIZE_TAG_MIN)),
            pa.scalar("big", pa.string()), pa.scalar(None, pa.string()),
        )
        return t.append_column("size_tag", big)

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet")).map_batches(
        prep, batch_format="pyarrow"
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        keyword_cols=("lang", "source", "size_tag"),
        # F7 dynamic tags: carry (lang, source) as a map<string,string>
        # column through the docstore too
        tag_map_cols=("lang", "source"),
        term_buckets=16,
        # hot-term salting on the flagship path too (bucket files are
        # byte-identical to an unsalted build — pinned by tests)
        salt_df_threshold=200,
        hot_term_salts=4,
        # positional postings: phrase queries run over the same cached index
        index_positions=True,
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


def documents_stop_index(sf_dir: str) -> str:
    """Build (once, cached) the STOP-FILTERED index over `documents` —
    the ES analyzer-with-stopwords configuration (STOPWORDS_SQL is the
    stop list on both the engine and oracle sides)."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|stop2".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    ds = rd.read_parquet(src).map_batches(
        lambda t: t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        keyword_cols=("lang", "source"),
        term_buckets=16,
        stopwords=STOPWORDS_SQL,
        index_positions=True,
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


BM25_CUSTOM_K1, BM25_CUSTOM_B = 0.9, 0.3


def documents_k1b_index(sf_dir: str) -> str:
    """Build (once, cached) an index with NON-DEFAULT BM25 parameters
    (k1=0.9, b=0.3 — the ES similarity-module knobs): the pair rides
    the config cascade into the manifest and every Searcher scores
    with it."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|k1b1".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    ds = rd.read_parquet(src).map_batches(
        lambda t: t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        keyword_cols=("lang", "source"),
        term_buckets=16,
        k1=BM25_CUSTOM_K1,
        b=BM25_CUSTOM_B,
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


def fts_bm25_k1b_top10(sf_dir: str) -> pa.Table:
    """BM25 with non-default (k1=0.9, b=0.3) from the config cascade:
    saturation and length normalization both shift; postings/df/dl are
    identical to the default index (parameters are scoring-time, like
    the ES similarity module)."""
    index_dir = documents_k1b_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def documents_stem_index(sf_dir: str) -> str:
    """Build (once, cached) the STEMMED index over `documents` — the ES
    ``stemmer: minimal_english`` analyzer (Lucene EnglishMinimalStemFilter,
    the Harman S-stemmer). Postings/df/tf meet on stemmed terms; dl and
    avgdl are UNCHANGED (token->token 1:1 map, norms count emitted
    tokens); the same kernel stems query terms in every Searcher."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|stem1".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    ds = rd.read_parquet(src).map_batches(
        lambda t: t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        keyword_cols=("lang", "source"),
        term_buckets=16,
        stemmer="minimal_english",
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


def fts_stem_bm25_top10(sf_dir: str) -> pa.Table:
    """BM25 over the minimal_english-STEMMED index: plural query forms in
    STEM_QUERY collapse onto their corpus stems ('joins' and 'join' merge
    to one clause of weight 2; df/tf meet on stemmed terms; dl/avgdl
    unchanged) — the ES analyzer-with-stemmer configuration end to end.
    The testdata vocab itself carries no plural tokens (the corpus-side
    stem map is pinned by tests/test_stemmer.py on handcrafted docs)."""
    index_dir = documents_stem_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(STEM_QUERY, k=10)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def documents_2gram_index(sf_dir: str) -> str:
    """Build (once, cached) the 2-GRAM SHINGLE index over `documents` —
    the ES search_as_you_type ``._2gram`` subfield (Lucene ShingleFilter):
    terms are adjacent space-joined token pairs, dl = shingles per doc,
    sharing the root index's dense doc space (same src_doc_id order)."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|sh2g1".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    ds = rd.read_parquet(src).map_batches(
        lambda t: t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        keyword_cols=("lang", "source"),
        term_buckets=16,
        shingle_size=2,
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


def documents_prefix_index(sf_dir: str) -> str:
    """Build (once, cached) the EDGE-PREFIX index over `documents` —
    the ES ``index_prefixes`` subfield (min_chars=2, max_chars=4):
    every token's 2..4-codepoint prefixes become terms, so an in-range
    prefix query is ONE exact dictionary probe."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|pfx1".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    ds = rd.read_parquet(src).map_batches(
        lambda t: t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        keyword_cols=("lang", "source"),
        term_buckets=16,
        index_prefixes=(2, 4),
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


IDX_PREFIX_QUERY = "da"  # length inside the subfield's [2, 4] range


def fts_index_prefix_docs(sf_dir: str) -> pa.Table:
    """ES index_prefixes fast path: IDX_PREFIX_QUERY (in the subfield's
    [2,4] range) resolves by ONE exact dictionary probe on the prefix
    index — first 20 matching docs ascending. Same answer set as the
    scan-based prefix query, different (O(1)) execution plan."""
    index_dir = documents_prefix_index(sf_dir)
    s = Searcher(index_dir)
    docs = s.prefix_exact_docs(IDX_PREFIX_QUERY, limit=20)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {"doc_id": pa.array([int(to_src[d]) for d in docs], pa.int64())}
    )


SAYT_QUERY = "spark join da"  # in-flight last word: the SAYT keystroke


def fts_sayt_top10(sf_dir: str) -> pa.Table:
    """ES search_as_you_type: multi_match type=bool_prefix over the root
    field and its ``._2gram`` shingle subfield. Each leg is the pinned
    match_bool_prefix form (BM25 should-clauses in sorted-term TAAT
    order + constant 1.0 for the last clause's prefix expansion — on the
    2-gram leg clauses are SHINGLES and the last shingle 'join da'
    prefix-matches 'join data...'); the two legs' dense score buffers
    add elementwise over the SHARED dense doc space (both indexes sort
    by src_doc_id). Driver-side here for the contract query; the
    sharded path sums the same per-segment buffers inside QueryRunner
    actors (each segment holds both fields' buckets)."""
    root = Searcher(documents_index(sf_dir))
    g2 = Searcher(documents_2gram_index(sf_dir))
    h1, b1 = root._mbp_dense(SAYT_QUERY)
    h2, b2 = g2._mbp_dense(SAYT_QUERY)
    hits = h1 | h2
    buf = b1 + b2
    idx = np.flatnonzero(hits)
    top = root._topk_from(idx, buf[idx], 10)
    dense_to_src = _dense_to_src(documents_index(sf_dir))
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in top], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in top], pa.int64()
            ),
        }
    )


def documents_source_index(sf_dir: str) -> str:
    """Build (once, cached) a SECOND field index over `documents` —
    text_col='source' — sharing the text index's doc space: the Lucene
    per-field-index model behind multi_match."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|srcf1".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/rayfts_qidx/{tag}"
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        import json

        from .build import FORMAT_VERSION

        with open(manifest_path) as f:
            if json.load(f).get("format_version") == FORMAT_VERSION:
                return index_dir
    ds = rd.read_parquet(src).map_batches(
        lambda t: t.rename_columns(
            ["src_doc_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cfg = IndexJobConfig(
        index_dir=index_dir,
        key_cols=("src_doc_id",),
        text_col="source",
        keyword_cols=("lang",),
        term_buckets=4,
    )
    build_index(ds, cfg=cfg, rows_per_part=100_000)
    return index_dir


def _dense_to_src(index_dir: str) -> np.ndarray:
    t = pq.read_table(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "src_doc_id"]
    )
    out = np.zeros(t.num_rows, dtype=np.int64)
    out[t["doc_id"].to_numpy()] = t["src_doc_id"].to_numpy()
    return out


def fts_term_stats(sf_dir: str) -> rd.Dataset:
    """(term, df, cf) over documents.text — A3/A4 corpus statistics.

    Map-side combine: each batch ships ONE row per distinct term
    (df_partial, cf_partial) instead of one per (term, doc) pair, so the
    term shuffle moves O(vocab x batches), not O(postings)."""
    def partial(batch: pa.Table) -> pa.Table:
        tf, _ = analyze_batch(batch)
        g = tf.group_by("term", use_threads=False).aggregate(
            [("doc_id", "count"), ("tf", "sum")]
        )
        return g.rename_columns(["term", "df_p", "cf_p"])

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df_p"), Sum("cf_p"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "df": pc.cast(t["sum(df_p)"], pa.int64()),
                "cf": pc.cast(t["sum(cf_p)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def fts_doc_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, dl) — BM25 doc-length input (M8 analog)."""
    from .analysis import tokens_flat

    def dl(batch: pa.Table) -> pa.Table:
        _, parent = tokens_flat(batch["text"])
        lens = np.bincount(parent, minlength=batch.num_rows).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "dl": pa.array(lens)})

    return _docs(sf_dir).map_batches(dl, batch_format="pyarrow", zero_copy_batch=True)


def _bm25(sf_dir: str, query: str, k: int, algo: str) -> pa.Table:
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(query, k=k, algo=algo)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            # scaled int: decimal-rounded doubles differ between engines at
            # the ulp level; integer micro-scores compare exactly
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_bm25_top10(sf_dir: str) -> pa.Table:
    return _bm25(sf_dir, BM25_QUERY, 10, "taat")


def fts_bm25_top10_wand(sf_dir: str) -> pa.Table:
    """Same spec as fts_bm25_top10 but through the block-max WAND executor —
    both face the same SQL oracle, proving executor equivalence."""
    return _bm25(sf_dir, BM25_QUERY, 10, "wand")


def fts_bm25_hot_top20(sf_dir: str) -> pa.Table:
    return _bm25(sf_dir, BM25_QUERY_HOT, 20, "wand")


# ELSER-style token->weight query; the absent token pins the
# missing-feature rule (contributes nothing, costs nothing)
SPARSE_WEIGHTS = {"spark": 2.0, "join": 1.5, "data": 1.0,
                  "zz_absent_token": 4.0}


def fts_sparse_vector_top10(sf_dir: str) -> pa.Table:
    """ES sparse_vector / rank_features query (learned sparse
    retrieval): top-10 by the Σ w_t · tf(d,t) dot product over the
    inverted index — weights exactly representable, so scores are
    exact integers-in-doubles on both sides."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.sparse_vector_search(SPARSE_WEIGHTS, k=10)
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(to_src[d]) for d, _ in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
        ),
    })


def fts_bm25_page2_offset(sf_dir: str) -> pa.Table:
    """ES from/size pagination: hits ranked 11-20 via offset=10 — faces a
    plain SQL LIMIT/OFFSET oracle (the engine slices a top-20 pool)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10, offset=10)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_bm25_page2_cursor(sf_dir: str) -> pa.Table:
    """search_after pagination: page 1's last hit becomes the stateless
    cursor, page 2 is the top-10 ranked strictly after it — must equal the
    SAME LIMIT/OFFSET oracle as the offset path (cursor == deep-page scale
    path: O(k) pool at any depth). Runs through the WAND executor so the
    skipping path's cursor admission is oracle-checked too."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    page1 = s.search(BM25_QUERY, k=10, algo="wand")
    hits = s.search(BM25_QUERY, k=10, algo="wand", search_after=page1[-1])
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_bm25_filtered_top10(sf_dir: str) -> pa.Table:
    """Filtered BM25 (ES filtered-search analog, ESNodeITest.java:61-172
    with the geo filter swapped for a keyword column): top-10 restricted
    to lang='en', scoring statistics GLOBAL (Lucene filter semantics)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10, where={"lang": "en"})
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_bm25_range_top10(sf_dir: str) -> pa.Table:
    """ES numeric range query composed with BM25 (range-filter analog of
    the ES mappings the reference enables, plugin.properties:10-11): top-10
    restricted to 200 <= n_chars < 600; scoring statistics stay GLOBAL
    (Lucene filter semantics — the filter prunes, never reweights)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(
        BM25_QUERY, k=10, where={"n_chars": {"gte": 200, "lt": 600}}
    )
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_bm25_boosted_top10(sf_dir: str) -> pa.Table:
    """Lucene query-string clause boosts: 'spark^3 join the^0.5 data' —
    each ^b multiplies that clause's idf weight (summed across duplicate
    clauses), reweighting the ranking while statistics stay global. All
    executors honor the weights (MaxScore/WAND bounds scale with them)."""
    return _bm25(sf_dir, BM25_BOOSTED, 10, "taat")


def fts_bm25_msm2_top10(sf_dir: str) -> pa.Table:
    """ES minimum_should_match analog: BM25 top-10 restricted to docs
    matching >= 2 distinct query terms (mode='or' with an msm doc-set
    mask — scoring statistics stay global, like every restriction)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10, min_should_match=2)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_phrase_top10(sf_dir: str) -> pa.Table:
    """Exact-phrase top-10 (Lucene PhraseQuery analog over the positional
    sidecar): pf = adjacency count, W = slot-order idf sum — spec pinned in
    rayfts.oracle.BruteForceIndex.search_phrase."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search_phrase(PHRASE_QUERY, k=10)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_bool_top10(sf_dir: str) -> pa.Table:
    """ES bool-query analog: must = all BM25_QUERY terms (conjunctive,
    scores still sum every term), must_not = BOOL_MUST_NOT. Statistics stay
    corpus-global — the clauses only restrict the candidate doc set."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10, mode="and", must_not=BOOL_MUST_NOT)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in hits], pa.int64()),
            "score_e6": pa.array([round(sc * 1e6) for _, sc in hits], pa.int64()),
        }
    )


def fts_prefix_docs(sf_dir: str) -> pa.Table:
    """ES prefix-query analog (constant-score rewrite): first 20 docs
    containing a PREFIX_QUERY-prefixed term, with the count of DISTINCT
    matching terms per doc (term-dictionary expansion, column-pruned)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.prefix_docs(PREFIX_QUERY, limit=20)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def fts_wildcard_docs(sf_dir: str) -> pa.Table:
    """ES WildcardQuery analog (constant-score rewrite): first 20 docs
    containing a term matching the WILDCARD_QUERY glob (`?` = one char,
    `*` = any run), with the count of DISTINCT matching terms per doc —
    the DuckDB LIKE 's_a%' oracle pins the glob semantics exactly."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.wildcard_docs(WILDCARD_QUERY, limit=20)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def fts_fuzzy_docs(sf_dir: str) -> pa.Table:
    """ES FuzzyQuery analog (constant-score rewrite): first 20 docs
    containing a term within FUZZY_EDITS Levenshtein distance of
    FUZZY_QUERY, with the count of DISTINCT matching terms per doc.
    Expansion is closest-first/lexicographic, truncated at the ES
    default max_expansions=50 — the DuckDB levenshtein() oracle pins
    both the distance metric and the selection order."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.fuzzy_docs(FUZZY_QUERY, max_edits=FUZZY_EDITS, limit=20)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


WILDCARD_INFIX = "*ustome*"  # leading wildcard: the gram-plan case


def fts_wildcard_infix_docs(sf_dir: str) -> pa.Table:
    """ES `wildcard` field-type plan: the leading-wildcard glob
    '*ustome*' resolves through the 3-gram prefilter + candidate-only
    regex verify instead of a dictionary scan; first 20 docs with a
    matching term + distinct-term counts (identical answer set to the
    scan plan, pinned by test)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.wildcard_infix_docs(WILDCARD_INFIX, limit=20)
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


FUZZY_AUTO_QUERY = "cusstomer"  # 9 chars -> AUTO allows 2 edits


def fts_fuzzy_auto_docs(sf_dir: str) -> pa.Table:
    """ES fuzziness=AUTO: the edit budget comes from the TERM LENGTH
    (AUTO:3,6 — 0 edits under 3 chars, 1 for 3-5, 2 for 6+); the
    9-char misspelling 'cusstomer' gets 2 edits and reaches
    'customer'."""
    from .search import fuzziness_auto

    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.fuzzy_docs(
        FUZZY_AUTO_QUERY, max_edits=fuzziness_auto(FUZZY_AUTO_QUERY),
        limit=20,
    )
    to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def fts_facet_source(sf_dir: str) -> pa.Table:
    """ES terms-aggregation analog: doc counts per `source` keyword value
    over ALL docs matching BM25_QUERY (OR semantics — the agg runs on the
    full hit set, not the top-k page). Buckets ordered (count desc, value
    asc) and truncated to 8, exercising the deterministic tie-break the
    oracle mirrors with ORDER BY n_docs DESC, source."""
    s = Searcher(documents_index(sf_dir))
    rows = s.facet_counts(BM25_QUERY, "source", size=8)
    return pa.table(
        {
            "source": pa.array([v for v, _ in rows], pa.string()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_terms_other_count(sf_dir: str) -> pa.Table:
    """ES terms-agg response metadata: top-5 source buckets PLUS the
    exact sum_other_doc_count row ('__other__' sentinel) — the engine
    merges untruncated histograms, so the ES doc_count_error_upper_bound
    is exactly 0 (emitted as the sentinel row's err column; buckets
    carry err 0 too)."""
    s = Searcher(documents_index(sf_dir))
    top, other, err = s.terms_agg_meta(BM25_QUERY, "source", size=5)
    return pa.table({
        "source": pa.array([v for v, _ in top] + ["__other__"],
                           pa.string()),
        "n_docs": pa.array([c for _, c in top] + [other], pa.int64()),
        "err_bound": pa.array([err] * (len(top) + 1), pa.int64()),
    })


def fts_profile_clauses(sf_dir: str) -> pa.Table:
    """ES profile-API analog (deterministic slice): the per-clause
    {term, df, postings} rows of profile_search(BM25_QUERY) plus the
    postings_scanned total — the collector counters the oracle can
    recount (wall timings stay out of the contract; the hits
    themselves are pinned by fts_bm25_top10)."""
    s = Searcher(documents_index(sf_dir))
    _, prof = s.profile_search(BM25_QUERY, k=10)
    return pa.table({
        "term": pa.array([c["term"] for c in prof["clauses"]],
                         pa.string()),
        "df": pa.array([c["df"] for c in prof["clauses"]], pa.int64()),
        "postings": pa.array([c["postings"] for c in prof["clauses"]],
                             pa.int64()),
        "postings_scanned": pa.array(
            [prof["postings_scanned"]] * len(prof["clauses"]),
            pa.int64(),
        ),
    })


def fts_dsl_bool_top10(sf_dir: str) -> pa.Table:
    """ES request-body execution (the switch-over surface): an ES JSON
    bool query — match must + term filter — runs through
    `rayfts.dsl.execute_dsl` verbatim and must equal the engine's
    direct filtered search bit-for-bit (same oracle shape as
    fts_bm25_filtered_top10 with range composed in)."""
    from .dsl import execute_dsl

    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": BM25_QUERY}}],
            "filter": [{"term": {"lang": "en"}},
                       {"range": {"n_chars": {"gte": 100,
                                              "lte": 700}}}],
        }},
        "size": 10,
    }
    rows = execute_dsl(s, body)["hits"]["hits"]
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(to_src[h["_id"]]) for h in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(h["_score"] * 1e6)) for h in rows], pa.int64()
        ),
    })


SIG_KEYWORD_QUERY = "spark"   # keyword-significance foreground query


def fts_sig_keyword_source(sf_dir: str) -> pa.Table:
    """ES significant_terms over the `source` KEYWORD field (doc-values
    form): sources overrepresented in the SIG_KEYWORD_QUERY hit set vs
    the corpus, exact JLH over exact histograms."""
    s = Searcher(documents_index(sf_dir))
    rows = s.significant_keyword_terms(
        SIG_KEYWORD_QUERY, "source", size=6, min_doc_count=2
    )
    return pa.table({
        "source": pa.array([v for v, _, _, _ in rows], pa.string()),
        "fg_df": pa.array([f for _, f, _, _ in rows], pa.int64()),
        "df": pa.array([d for _, _, d, _ in rows], pa.int64()),
        "score_e9": pa.array(
            [int(round(sc * 1e9)) for _, _, _, sc in rows], pa.int64()
        ),
    })


def fts_sig_mi_source(sf_dir: str) -> pa.Table:
    """ES significant_terms mutual_information heuristic over the same
    exact fg/bg histograms: pointwise-MI sum over the 2x2 table, term
    and float op order pinned."""
    s = Searcher(documents_index(sf_dir))
    rows = s.significant_keyword_terms(
        SIG_KEYWORD_QUERY, "source", size=6, min_doc_count=2,
        heuristic="mutual_information",
    )
    return pa.table({
        "source": pa.array([v for v, _, _, _ in rows], pa.string()),
        "fg_df": pa.array([f for _, f, _, _ in rows], pa.int64()),
        "df": pa.array([d for _, _, d, _ in rows], pa.int64()),
        "score_e9": pa.array(
            [int(round(sc * 1e9)) for _, _, _, sc in rows], pa.int64()
        ),
    })


FUZZY_COMPLETION_PREFIX = "sba"  # 'spa' with a typo; anchor 's' exact


def fts_suggest_completion_fuzzy(sf_dir: str) -> pa.Table:
    """ES completion suggester with fuzzy: 'sba' (a typo for 'spa')
    still completes to the spark/span/... family — anchor = first char
    exact, candidate head within Levenshtein 1 of the query prefix;
    rank (df desc, term asc)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.suggest_completion_fuzzy(
        FUZZY_COMPLETION_PREFIX, size=5, fuzziness=1, prefix_length=1
    )
    return pa.table({
        "term": pa.array([t for t, _ in rows], pa.string()),
        "df": pa.array([d for _, d in rows], pa.int64()),
    })


def fts_sig_chi2_source(sf_dir: str) -> pa.Table:
    """ES significant_terms with the chi_square heuristic
    (include_negatives=false, background_is_superset=true): the 2x2
    contingency score over the same exact fg/bg histograms as the JLH
    query — exact int64 cross difference, pinned float grouping."""
    s = Searcher(documents_index(sf_dir))
    rows = s.significant_keyword_terms(
        SIG_KEYWORD_QUERY, "source", size=6, min_doc_count=2,
        heuristic="chi_square",
    )
    return pa.table({
        "source": pa.array([v for v, _, _, _ in rows], pa.string()),
        "fg_df": pa.array([f for _, f, _, _ in rows], pa.int64()),
        "df": pa.array([d for _, _, d, _ in rows], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, _, _, sc in rows], pa.int64()
        ),
    })


RARE_MAX_DOC_COUNT = 80   # rare_terms cutoff (drops the majority lang)


def fts_rare_terms(sf_dir: str) -> pa.Table:
    """ES rare_terms-aggregation analog (exact, not CuckooFilter-
    approximate): `lang` values whose doc count over the BM25_QUERY hit
    set is <= RARE_MAX_DOC_COUNT, ordered (count asc, value asc) — the
    long-tail complement of the terms agg."""
    s = Searcher(documents_index(sf_dir))
    rows = s.rare_terms_agg(BM25_QUERY, "lang",
                            max_doc_count=RARE_MAX_DOC_COUNT)
    return pa.table({
        "lang": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


def fts_multi_terms(sf_dir: str) -> pa.Table:
    """ES multi_terms-aggregation analog: buckets keyed by the
    (lang, source) value pair over the BM25_QUERY hit set, ordered
    (count desc, key asc), top 6."""
    s = Searcher(documents_index(sf_dir))
    rows = s.multi_terms_agg(BM25_QUERY, ["lang", "source"], size=6)
    return pa.table({
        "lang": pa.array([k[0] for k, _ in rows], pa.string()),
        "source": pa.array([k[1] for k, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


TERMINATE_AFTER = 40


def fts_terminate_after(sf_dir: str) -> pa.Table:
    """ES _count with terminate_after: the BM25_QUERY hit count capped
    at TERMINATE_AFTER with the terminated_early flag — deterministic
    (collection order is dense doc order, so the cap is exact)."""
    s = Searcher(documents_index(sf_dir))
    n, term = s.count_hits(BM25_QUERY, terminate_after=TERMINATE_AFTER)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "terminated_early": pa.array([int(term)], pa.int64()),
    })


TERMS_MISSING_VALUE = "untagged"
TERMS_MDC = 3


def fts_terms_missing_knob(sf_dir: str) -> pa.Table:
    """ES terms agg `missing` + `min_doc_count` knobs: `size_tag` is
    NULL on short docs, so missing='untagged' buckets them explicitly;
    min_doc_count=3 floors the merged counts before truncation."""
    s = Searcher(documents_index(sf_dir))
    rows = s.facet_counts(
        BM25_QUERY, "size_tag", size=20,
        missing=TERMS_MISSING_VALUE, min_doc_count=TERMS_MDC,
    )
    return pa.table({
        "size_tag": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


HIST_OFFSET = 50.0


def fts_hist_offset(sf_dir: str) -> pa.Table:
    """ES histogram `offset` knob: n_chars buckets of width 100 with
    boundaries shifted by 50 (key = floor((v-50)/100)*100 + 50)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.histogram_agg(BM25_QUERY, "n_chars", 100.0,
                           offset=HIST_OFFSET)
    return pa.table({
        "bucket": pa.array([int(k) for k, _ in rows], pa.int64()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


def fts_hist_empty_buckets(sf_dir: str) -> pa.Table:
    """ES histogram min_doc_count=0: every 100-wide n_chars bucket
    between the first and last non-empty one appears, zeros filled —
    over a NARROW hit set (one rare term) so real gaps exist."""
    s = Searcher(documents_index(sf_dir))
    rows = s.histogram_agg(
        SIG_KEYWORD_QUERY, "n_chars", 100.0, min_doc_count=0
    )
    return pa.table({
        "bucket": pa.array([int(k) for k, _ in rows], pa.int64()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


TERMS_INCLUDE, TERMS_EXCLUDE = r"src1\d", r"src15"


def fts_terms_include(sf_dir: str) -> pa.Table:
    """ES terms agg include/exclude regexes: `source` buckets over the
    BM25_QUERY hit set keep only full-match src1\\d keys minus src15 —
    filtering happens BEFORE size truncation (the ES order)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.facet_counts(
        BM25_QUERY, "source", size=20,
        include=TERMS_INCLUDE, exclude=TERMS_EXCLUDE,
    )
    return pa.table({
        "source": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


def fts_terms_stats(sf_dir: str) -> pa.Table:
    """ES terms + stats sub-agg: per `source` bucket of the BM25_QUERY
    hit set, the n_chars stats tuple (count/min/max/sum) — one
    bincount + minimum.at/maximum.at pass, exact ints."""
    s = Searcher(documents_index(sf_dir))
    rows = s.terms_stats_agg(BM25_QUERY, "source", "n_chars", size=8)
    return pa.table({
        "source": pa.array([v for v, *_ in rows], pa.string()),
        "n_docs": pa.array([c for _, c, *_ in rows], pa.int64()),
        "n_vals": pa.array([nv for _, _, nv, *_ in rows], pa.int64()),
        "mn": pa.array([mn for *_, mn, _, _ in rows], pa.int64()),
        "mx": pa.array([mx for *_, mx, _ in rows], pa.int64()),
        "total": pa.array([t for *_, t in rows], pa.int64()),
    })


def fts_reverse_nested(sf_dir: str) -> pa.Table:
    """ES reverse_nested analog over the join-field model: terms agg on
    the CHILD axis (`lang`) over the BM25_QUERY hit set, each bucket
    stepping back up to count DISTINCT parents (`source` — the join
    field has_child/children use); n_docs = child doc count, n_parents
    = reverse_nested doc_count."""
    s = Searcher(documents_index(sf_dir))
    rows = s.reverse_nested_agg(BM25_QUERY, "lang", "source", size=20)
    return pa.table({
        "lang": pa.array([v for v, _, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c, _ in rows], pa.int64()),
        "n_parents": pa.array([p for _, _, p in rows], pa.int64()),
    })


RESCORER_WINDOW = 25
RESCORER_QW, RESCORER_RW = 1.5, 0.5


def fts_dsl_rescorer_top10(sf_dir: str) -> pa.Table:
    """ES 8.18 rescorer retriever (request-body form): standard child
    retrieves BM25_QUERY, the rescore node re-ranks its top
    RESCORER_WINDOW hits by 1.5*base + 0.5*phrase — the full JSON tree
    runs through execute_dsl and must equal the direct rescore API
    bit-for-bit."""
    from .dsl import execute_dsl

    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    body = {
        "retriever": {"rescorer": {
            "retriever": {"standard": {
                "query": {"match": {"text": BM25_QUERY}}}},
            "rescore": {
                "window_size": RESCORER_WINDOW,
                "query": {
                    "rescore_query": {
                        "match_phrase": {"text": PHRASE_QUERY}},
                    "query_weight": RESCORER_QW,
                    "rescore_weight": RESCORER_RW,
                },
            },
        }},
        "size": 10,
    }
    rows = execute_dsl(s, body)["hits"]["hits"]
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(to_src[h["_id"]]) for h in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(h["_score"] * 1e6)) for h in rows], pa.int64()
        ),
    })


def fts_top_hits_by_source(sf_dir: str) -> pa.Table:
    """ES terms + top_hits sub-aggregation analog: the 3 biggest `source`
    buckets over the BM25_QUERY hit set, each with its 2 best-BM25 hits —
    scores identical to search (same TAAT op order), one scoring pass for
    all buckets."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    buckets = s.facet_top_hits(BM25_QUERY, "source", size=3, top_n=2)
    dense_to_src = _dense_to_src(index_dir)
    src, nd, did, sc = [], [], [], []
    for v, c, hits in buckets:
        for d, score in hits:
            src.append(v)
            nd.append(c)
            did.append(int(dense_to_src[d]))
            sc.append(int(round(score * 1e6)))
    return pa.table(
        {
            "source": pa.array(src, pa.string()),
            "n_docs": pa.array(nd, pa.int64()),
            "doc_id": pa.array(did, pa.int64()),
            "score_e6": pa.array(sc, pa.int64()),
        }
    )


def fts_stats_nchars(sf_dir: str) -> pa.Table:
    """ES stats-aggregation analog over the full BM25_QUERY hit set:
    count/min/max/sum of the numeric n_chars docstore column plus an
    exact integer-division mean (avg_e6 = sum*1e6 // count — integer
    arithmetic on both sides, no float-rounding divergence vs SQL)."""
    s = Searcher(documents_index(sf_dir))
    st = s.stats_agg(BM25_QUERY, "n_chars")
    total = int(round(st["sum"]))  # n_chars is integral: float64-exact
    return pa.table(
        {
            "n_hits": pa.array([st["count"]], pa.int64()),
            "min_nc": pa.array([int(st["min"])], pa.int64()),
            "max_nc": pa.array([int(st["max"])], pa.int64()),
            "sum_nc": pa.array([total], pa.int64()),
            "avg_e6": pa.array(
                [(total * 1_000_000) // st["count"]], pa.int64()
            ),
        }
    )


def fts_hist_nchars(sf_dir: str) -> pa.Table:
    """ES histogram-aggregation analog: fixed 100-char buckets
    (key = floor(n_chars/100)*100) over ALL BM25_QUERY hits, non-empty
    buckets ascending — the date_histogram computation over any epoch
    column is the identical kernel."""
    s = Searcher(documents_index(sf_dir))
    rows = s.histogram_agg(BM25_QUERY, "n_chars", 100.0)
    return pa.table(
        {
            "bucket": pa.array([int(b) for b, _ in rows], pa.int64()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_sort_by_nchars_top10(sf_dir: str) -> pa.Table:
    """ES sort-by-field analog: top-10 BM25_QUERY hits ordered by the
    n_chars docstore column DESC (doc_id asc tie-break) — no relevance
    scoring runs at all, the ES fast path when sort omits _score."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search_by_field(BM25_QUERY, "n_chars", order="desc", k=10)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "n_chars": pa.array([int(v) for _, v in hits], pa.int64()),
        }
    )


def fts_sort_after_page2(sf_dir: str) -> pa.Table:
    """ES search_after on a FIELD sort (not _score): page 1 of the
    n_chars-desc sort yields the (value, doc) cursor, page 2 resumes
    strictly after it — equal to rows [10, 20) of the total order
    (what the SQL OFFSET twin checks)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    p1 = s.search_by_field(BM25_QUERY, "n_chars", order="desc", k=10)
    after = (p1[-1][1], p1[-1][0]) if p1 else None
    p2 = s.search_by_field(BM25_QUERY, "n_chars", order="desc", k=10,
                           after=after)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in p2], pa.int64()
            ),
            "n_chars": pa.array([int(v) for _, v in p2], pa.int64()),
        }
    )


def fts_composite_page2(sf_dir: str) -> pa.Table:
    """ES composite-aggregation analog: value-ascending source buckets
    over the BM25_QUERY hit set, page 2 of size 5 via the after_key
    cursor (page 1's last value passed back — the stateless agg cursor
    for unbounded-cardinality aggregations)."""
    s = Searcher(documents_index(sf_dir))
    page1 = s.composite_agg(BM25_QUERY, "source", size=5)
    rows = (
        s.composite_agg(BM25_QUERY, "source", size=5, after_key=page1[-1][0])
        if page1 else []
    )
    return pa.table(
        {
            "source": pa.array([v for v, _ in rows], pa.string()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_significant_terms(sf_dir: str) -> pa.Table:
    """ES significant_terms analog: the 10 most overrepresented terms in
    the BM25_QUERY hit set vs the corpus (JLH score), foreground dfs
    from one vectorized re-analysis of the hit docs."""
    s = Searcher(documents_index(sf_dir))
    rows = s.significant_terms(BM25_QUERY, size=10, min_doc_count=3)
    return pa.table(
        {
            "term": pa.array([t for t, *_ in rows], pa.string()),
            "fg": pa.array([f for _, f, _, _ in rows], pa.int64()),
            "df": pa.array([d for _, _, d, _ in rows], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for *_, sc in rows], pa.int64()
            ),
        }
    )


PHRASE_PREFIX_QUERY = "the s"      # match_phrase_prefix probe (6 expansions)
REGEXP_QUERY = "(sc|sp)a.*"        # anchored RegexpQuery probe (scan, spark)
SPAN_TERMS = ("the", "data", "batch")  # span_near probe (in order)
QS_QUERY = '+"the batch" spark join^2 -window'  # query_string probe
SPAN_SLOP = 4
TERMS_SET = ("spark", "join", "data", "window")  # terms_set probe
TERMS_SET_MIN = 2
RANGE_BUCKETS = ((None, 150), (150, 300), (300, None), (100, 400))
FILTER_BUCKETS = (
    ("english", {"lang": "en"}),
    ("de_src7", {"lang": "de", "source": "src7"}),
)


PERC_QUERIES = {
    "pq_spark_and_join": {"query": "spark join", "mode": "and"},
    "pq_window": {"query": "window", "must_not": "slow"},
    "pq_two_of": {"query": "batch scan sort", "min_match": 2},
    "pq_phrase": {"phrase": "the batch"},
}


def fts_percolate(sf_dir: str):
    """ES percolate analog as a streaming Ray Data stage: route every
    document to the registered queries it matches (actor-pool
    map_batches; the query registry loads once per actor). Returns the
    lazy Dataset of (doc_id, query_id) matches."""
    import ray.data as rd

    from .percolate import PercolateRunner

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return ds.map_batches(
        PercolateRunner,
        fn_constructor_kwargs={"queries": PERC_QUERIES, "id_col": "doc_id"},
        batch_format="pyarrow",
        concurrency=2,
    )


def fts_query_string_top10(sf_dir: str) -> pa.Table:
    """ES query_string analog: '+\"the batch\" spark join^2 -window' —
    required phrase, boosted + plain should terms, negated term, one
    bool-composed scoring pass."""
    s = Searcher(documents_index(sf_dir))
    hits = s.query_string(QS_QUERY, k=10)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in hits], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_has_child_by_source(sf_dir: str) -> pa.Table:
    """ES has_child analog over the `source` join field: top parents by
    best-matching child (score_mode=max)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.has_child_search(BM25_QUERY, "source", k=10, score_mode="max")
    return pa.table(
        {
            "parent": pa.array([v for v, _, _ in rows], pa.string()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc, _ in rows], pa.int64()
            ),
            "n_children": pa.array([n for _, _, n in rows], pa.int64()),
        }
    )


def fts_span_near_docs(sf_dir: str) -> pa.Table:
    """ES span_near analog (in_order, total-slack slop): docs with the
    SPAN_TERMS chain within SPAN_SLOP, each with its chain count."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_near_docs(list(SPAN_TERMS), SPAN_SLOP, limit=20)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_matches": pa.array([c for _, c in rows], pa.int64()),
        }
    )


SEMDECON_BENCH_N = 32   # benchmark slice: vec_id < this
SEMDECON_TAU = 0.32     # max-cosine contamination floor (gap >= 3e-5)


def semantic_decontaminate_counts(sf_dir: str) -> pa.Table:
    """Semantic decontamination: corpus embeddings (vec_id >=
    SEMDECON_BENCH_N) whose max cosine to ANY benchmark embedding
    (vec_id < SEMDECON_BENCH_N) reaches SEMDECON_TAU are contamination
    flags — the paraphrase-robust complement of the n-gram
    decontaminate_ngrams check. Benchmark matrix broadcasts once; the
    corpus streams through ONE map_batches; the driver sees three ints
    (count, flagged count, exact flagged-id sum)."""
    from .extras.decontam import semantic_decontaminate

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    bench = pq.read_table(
        emb_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", SEMDECON_BENCH_N)],
    )
    bvecs = np.asarray(
        bench["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ), dtype=np.float64,
    ).reshape(bench.num_rows, -1)
    corpus = rd.read_parquet(
        emb_path, columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["vec_id"], SEMDECON_BENCH_N)
        ),
        batch_format="pyarrow",
    )
    flags = semantic_decontaminate(corpus, bvecs, SEMDECON_TAU)

    def partial(b: pa.Table) -> pa.Table:
        fl = b["flagged"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        vid = b["vec_id"].combine_chunks().to_numpy()
        return pa.table({
            "n_p": pa.array([b.num_rows], pa.int64()),
            "f_p": pa.array([int(fl.sum())], pa.int64()),
            "s_p": pa.array(
                [int(vid[fl].sum()) if fl.any() else 0], pa.int64()
            ),
        })

    t = pa.concat_tables([
        b for b in ray.get(
            flags.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        ) if b.num_rows
    ])
    return pa.table({
        "n_corpus": pa.array([pc.sum(t["n_p"]).as_py()], pa.int64()),
        "n_flagged": pa.array([pc.sum(t["f_p"]).as_py()], pa.int64()),
        "sum_flagged_id": pa.array(
            [pc.sum(t["s_p"]).as_py()], pa.int64()
        ),
    })


FIS_MIN_SUPPORT = 20   # frequent_item_sets support floor
FIS_TOP_N = 15


def fts_frequent_item_sets(sf_dir: str) -> pa.Table:
    """ES frequent_item_sets aggregation analog (the 8.4 market-basket
    agg) over the keyword fields (lang, source, size_tag): every
    non-empty subset of a doc's PRESENT field items is an itemset
    (key 'lang=en|source=src1|size=big' in field order; NULL size_tag
    means the item is absent), support >= FIS_MIN_SUPPORT, top
    FIS_TOP_N by (support desc, n_items desc, key asc). EXACT where ES
    samples, and every frequent subset reports (no closed-set pruning
    — documented divergence the SQL twin repeats). Map-side combine
    (one row per distinct itemset per batch) + one O(itemsets)
    groupby."""

    def partial(b: pa.Table) -> pa.Table:
        def col(name: str) -> pa.Array:
            c = b[name]
            return (c.combine_chunks()
                    if isinstance(c, pa.ChunkedArray) else c)

        pre = pa.array(["lang="] * b.num_rows)
        la = pc.binary_join_element_wise(pre, col("lang"), "")
        so = pc.binary_join_element_wise(
            pa.array(["source="] * b.num_rows), col("source"), ""
        )
        sz = pc.if_else(
            pc.greater_equal(col("n_chars"), pa.scalar(SIZE_TAG_MIN)),
            pa.scalar("size=big", pa.string()),
            pa.scalar(None, pa.string()),
        )
        parts = []
        for mask in ((la,), (so,), (sz,), (la, so), (la, sz),
                     (so, sz), (la, so, sz)):
            keys = (mask[0] if len(mask) == 1
                    else pc.binary_join_element_wise(*mask, "|"))
            keys = keys.drop_null()
            if len(keys) == 0:
                continue
            enc = keys.dictionary_encode()
            cnt = np.bincount(
                enc.indices.to_numpy(zero_copy_only=False),
                minlength=len(enc.dictionary),
            )
            parts.append(pa.table({
                "key": enc.dictionary,
                "n_p": pa.array(cnt.astype(np.int64)),
            }))
        if not parts:
            return pa.table({
                "key": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
            })
        return pa.concat_tables(parts)

    out = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n_p"))
        .to_pandas()
    )
    out = out[out["sum(n_p)"] >= FIS_MIN_SUPPORT].copy()
    out["n_items"] = out["key"].str.count(r"\|") + 1
    out = out.sort_values(
        ["sum(n_p)", "n_items", "key"], ascending=[False, False, True]
    ).head(FIS_TOP_N)
    return pa.table({
        "key": pa.array(out["key"].tolist(), pa.string()),
        "support": pa.array(
            [int(v) for v in out["sum(n_p)"]], pa.int64()
        ),
        "n_items": pa.array(
            [int(v) for v in out["n_items"]], pa.int64()
        ),
    })


DSIR_BUCKETS = 256         # hashed-unigram feature buckets
DSIR_TARGET_SOURCE = "src3"  # the trusted-domain slice
DSIR_TOP_N = 20


def dsir_select_top(sf_dir: str) -> pa.Table:
    """DSIR data selection (Xie et al. 2023): importance-weight every
    document against the DSIR_TARGET_SOURCE slice via hashed-unigram
    bucket ratios (DSIR_BUCKETS buckets, Laplace smoothing), keep the
    DSIR_TOP_N highest log-weights (logw desc, doc_id asc). Two
    streaming passes (count histograms -> broadcast ratio table ->
    score) + a block-head top-N merge; the driver holds O(buckets)
    ints and O(blocks · top_n) head rows."""
    from .extras.sampling import (
        dsir_bucket_counts,
        dsir_log_ratio,
        dsir_scores,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    raw, tgt = dsir_bucket_counts(
        docs, "source", DSIR_TARGET_SOURCE, DSIR_BUCKETS
    )
    scores = dsir_scores(docs, dsir_log_ratio(raw, tgt))

    def head(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("logw", "descending"), ("doc_id", "ascending"),
        ])
        return b.take(idx.slice(0, DSIR_TOP_N))

    heads = pa.concat_tables([
        t for t in ray.get(
            scores.map_batches(head, batch_format="pyarrow")
            .to_arrow_refs()
        ) if t.num_rows
    ])
    top = heads.take(pc.sort_indices(heads, sort_keys=[
        ("logw", "descending"), ("doc_id", "ascending"),
    ]).slice(0, DSIR_TOP_N))
    logw = top["logw"].to_numpy()
    return pa.table({
        "doc_id": pc.cast(top["doc_id"], pa.int64()),
        "logw_e6": pa.array(
            np.floor(logw * 1e6 + 0.5).astype(np.int64)
        ),
    })


ANALYZE_DOCS = 3       # _analyze probe: token streams of doc_id < 3
CAT_K_TOKENS = 3       # categorize_text template width
CAT_TOP_N = 10


def fts_analyze_text(sf_dir: str) -> pa.Table:
    """ES _analyze API analog: the (token, position) stream each of the
    first ANALYZE_DOCS documents produces under the index's analyzer
    (no stopwords on this index, so positions are consecutive). Rows
    (doc_id, position, token) ordered doc, position."""
    s = Searcher(documents_index(sf_dir))
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", ANALYZE_DOCS)],
    )
    rows = []
    for d, x in sorted(zip(t["doc_id"].to_pylist(),
                           t["text"].to_pylist())):
        rows.extend((int(d), p, tok) for tok, p in s.analyze(x))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "position": pa.array([r[1] for r in rows], pa.int64()),
        "token": pa.array([r[2] for r in rows], pa.string()),
    })


def fts_categorize_text(sf_dir: str) -> pa.Table:
    """ES categorize_text aggregation analog over the documents table:
    drain-style template buckets (first CAT_K_TOKENS analyzer tokens,
    digit runs masked to '#'), top CAT_TOP_N by (count desc, key asc).
    Map-side combine + one O(categories) groupby."""
    from .extras.textstats import categorize_texts

    rows = categorize_texts(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["text"]),
        k_tokens=CAT_K_TOKENS, top_n=CAT_TOP_N,
    )
    return pa.table({
        "category": pa.array([c for c, _ in rows], pa.string()),
        "n_docs": pa.array([v for _, v in rows], pa.int64()),
    })


SPAN_MULTI_SLOTS = (("prefix", "dat"), ("wildcard", "jo?n"))
SPAN_MULTI_SLOP = 3


def fts_span_multi_docs(sf_dir: str) -> pa.Table:
    """ES span_multi analog (SpanMultiTermQueryWrapper): an ordered
    span_near whose slots are a prefix and a wildcard multi-term query,
    each rewritten to the SpanOr of its term-dictionary expansions.
    Docs with a dat* < jo?n chain within SPAN_MULTI_SLOP, chain
    counts, doc asc, first 20."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_multi_near_docs(
        list(SPAN_MULTI_SLOTS), SPAN_MULTI_SLOP, limit=20
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_matches": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_span_unordered_docs(sf_dir: str) -> pa.Table:
    """ES span_near with in_order=false: docs where all SPAN_TERMS
    appear in ANY order within a window of slop SPAN_SLOP (Lucene's
    matchLength rule: max(p) - min(p) <= slop + k - 1), with the exact
    tuple count per doc."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_near_unordered_docs(
        list(SPAN_TERMS), SPAN_SLOP, limit=20
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_matches": pa.array([c for _, c in rows], pa.int64()),
        }
    )


SPAN_FIRST_TERM = "data"
SPAN_FIRST_END = 5


def fts_span_first_docs(sf_dir: str) -> pa.Table:
    """ES span_first analog: docs where SPAN_FIRST_TERM occurs at a
    0-based position < SPAN_FIRST_END, with the qualifying-occurrence
    count; doc_id asc, first 20."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_first_docs(SPAN_FIRST_TERM, SPAN_FIRST_END, limit=20)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_matches": pa.array([c for _, c in rows], pa.int64()),
        }
    )


SPAN_OR_TERMS = ("vector", "merge", "spark")
SPAN_NOT_INCLUDE = "data"
SPAN_NOT_EXCLUDE = "table"
SPAN_NOT_PRE = 1
SPAN_NOT_POST = 2


def fts_span_or_docs(sf_dir: str) -> pa.Table:
    """ES span_or analog: docs containing any SPAN_OR_TERMS clause, with
    n_matches = total occurrences across the clause set; doc_id asc,
    first 20."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_or_docs(list(SPAN_OR_TERMS), limit=20)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_matches": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_span_not_docs(sf_dir: str) -> pa.Table:
    """ES span_not analog: occurrences of SPAN_NOT_INCLUDE surviving
    unless a SPAN_NOT_EXCLUDE occurrence sits within PRE tokens before /
    POST after; doc_id asc, first 20."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_not_docs(
        SPAN_NOT_INCLUDE, SPAN_NOT_EXCLUDE,
        pre=SPAN_NOT_PRE, post=SPAN_NOT_POST, limit=20,
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_matches": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_extended_stats(sf_dir: str) -> pa.Table:
    """ES extended_stats analog over the BM25_QUERY hit set: exact
    integer sum/sum_sq plus the integer variance numerator
    n·sum_sq − sum² (variance = that / n², float-free compare)."""
    s = Searcher(documents_index(sf_dir))
    st = s.extended_stats_agg(BM25_QUERY, "n_chars")
    n, total, sum_sq = st["count"], int(st["sum"]), int(st["sum_sq"])
    return pa.table(
        {
            "n_hits": pa.array([n], pa.int64()),
            "sum_nc": pa.array([total], pa.int64()),
            "sum_sq": pa.array([sum_sq], pa.int64()),
            "var_num": pa.array([n * sum_sq - total * total], pa.int64()),
        }
    )


def fts_weighted_avg(sf_dir: str) -> pa.Table:
    """ES weighted_avg analog (value=n_chars, weight=doc_id): exact
    integer numerator/denominator."""
    s = Searcher(documents_index(sf_dir))
    st = s.weighted_avg_agg(BM25_QUERY, "n_chars", "doc_id")
    return pa.table(
        {
            "n_hits": pa.array([st["count"]], pa.int64()),
            "num": pa.array([int(st["num"])], pa.int64()),
            "den": pa.array([int(st["den"])], pa.int64()),
        }
    )


def fts_regexp_docs(sf_dir: str) -> pa.Table:
    """ES regexp-query analog: docs containing a term fully matching the
    anchored pattern (constant-score rewrite)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.regexp_docs(REGEXP_QUERY, limit=20)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def fts_terms_set_docs(sf_dir: str) -> pa.Table:
    """ES terms_set-query analog: docs matching >= TERMS_SET_MIN distinct
    terms of the set."""
    s = Searcher(documents_index(sf_dir))
    rows = s.terms_set_docs(list(TERMS_SET), TERMS_SET_MIN, limit=20)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "n_terms": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def fts_phrase_prefix_top10(sf_dir: str) -> pa.Table:
    """ES match_phrase_prefix analog: exact-adjacency phrase with the
    last slot prefix-expanded (MultiPhraseQuery), blended-df idf for the
    expanded position."""
    s = Searcher(documents_index(sf_dir))
    hits = s.search_phrase_prefix(PHRASE_PREFIX_QUERY, k=10)
    dense_to_src = _dense_to_src(documents_index(sf_dir))
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_range_nchars(sf_dir: str) -> pa.Table:
    """ES range-aggregation analog: independent (possibly overlapping)
    n_chars buckets counted over the full BM25_QUERY hit set."""
    s = Searcher(documents_index(sf_dir))
    rows = s.range_agg(BM25_QUERY, "n_chars", list(RANGE_BUCKETS))
    return pa.table(
        {
            "bucket": pa.array([k for k, _ in rows], pa.string()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


ADJ_FILTERS = {
    "en": {"lang": "en"},
    "de": {"lang": "de"},
    "s7": {"source": "src7"},
}


def fts_adjacency_matrix(sf_dir: str) -> pa.Table:
    """ES adjacency_matrix analog: per-filter and pairwise-intersection
    counts over the BM25_QUERY hit set."""
    s = Searcher(documents_index(sf_dir))
    rows = s.adjacency_matrix_agg(BM25_QUERY, ADJ_FILTERS)
    return pa.table(
        {
            "key": pa.array([k for k, _ in rows], pa.string()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_filters_agg(sf_dir: str) -> pa.Table:
    """ES filters-aggregation analog: named keyword-filter buckets
    counted over the full BM25_QUERY hit set."""
    s = Searcher(documents_index(sf_dir))
    rows = s.filters_agg(BM25_QUERY, dict(FILTER_BUCKETS))
    return pa.table(
        {
            "name": pa.array([n for n, _ in rows], pa.string()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_random_score_top10(sf_dir: str) -> pa.Table:
    """ES random_score analog (seed 7): deterministic seeded shuffle of
    the BM25_QUERY hit set — the reproducible-sampling contract."""
    s = Searcher(documents_index(sf_dir))
    hits = s.random_score(BM25_QUERY, seed=7, k=10)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in hits], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_boosting_top10(sf_dir: str) -> pa.Table:
    """ES boosting-query analog: BM25_QUERY hits with docs containing
    the negative term demoted by 0.5 instead of excluded."""
    s = Searcher(documents_index(sf_dir))
    hits = s.boosting_search(BM25_QUERY, BOOL_MUST_NOT, negative_boost=0.5,
                             k=10)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in hits], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_decay_nchars_top10(sf_dir: str) -> pa.Table:
    """ES function_score gauss-decay analog: BM25_QUERY rescored by
    exp-decay of |n_chars - 200| with scale 100 (factor 0.5 at the
    scale boundary)."""
    s = Searcher(documents_index(sf_dir))
    hits = s.decay_score(BM25_QUERY, "n_chars", origin=200.0, scale=100.0,
                         k=10)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in hits], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_collapse_by_source(sf_dir: str) -> pa.Table:
    """ES field-collapsing analog: top-10 BM25 hits with each `source`
    value contributing only its single best hit."""
    s = Searcher(documents_index(sf_dir))
    rows = s.search_collapse(BM25_QUERY, "source", k=10)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in rows], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc, _ in rows], pa.int64()
            ),
            "source": pa.array([v for _, _, v in rows], pa.string()),
        }
    )


def fts_suggest_term(sf_dir: str) -> pa.Table:
    """ES term-suggester analog: spelling corrections for the OOV probe
    tokens from the index term dictionary (normalized-Levenshtein score,
    suggest_mode=missing defaults)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.suggest_term(SUGGEST_TEXT)
    return pa.table(
        {
            "token": pa.array([t for t, *_ in rows], pa.string()),
            "suggestion": pa.array([c for _, c, _, _ in rows], pa.string()),
            "df": pa.array([d for _, _, d, _ in rows], pa.int64()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for *_, sc in rows], pa.int64()
            ),
        }
    )


def fts_suggest_completion(sf_dir: str) -> pa.Table:
    """ES completion-suggester analog: top prefix completions by weight
    (weight = df on this corpus)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.suggest_completion(COMPLETE_PREFIX, size=10)
    return pa.table(
        {
            "term": pa.array([t for t, _ in rows], pa.string()),
            "df": pa.array([d for _, d in rows], pa.int64()),
        }
    )


COMPLETE_CTX_LANG = "en"           # completion-context category probe


def fts_suggest_completion_ctx(sf_dir: str) -> pa.Table:
    """ES completion suggester with CONTEXTS: prefix completions ranked
    by df WITHIN the lang=COMPLETE_CTX_LANG context (category contexts
    as a filter — the ES semantics), top 8."""
    s = Searcher(documents_index(sf_dir))
    rows = s.suggest_completion_ctx(
        COMPLETE_PREFIX, {"lang": COMPLETE_CTX_LANG}, size=8
    )
    return pa.table(
        {
            "term": pa.array([t for t, _ in rows], pa.string()),
            "df": pa.array([d for _, d in rows], pa.int64()),
        }
    )


def fts_suggest_phrase(sf_dir: str) -> pa.Table:
    """ES phrase-suggester analog: whole-phrase corrections of the 2-slot
    OOV probe ranked by the StupidBackoff bigram LM over the positional
    index (max_errors=2 so both slots may correct)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.suggest_phrase(PHRASE_SUGGEST_TEXT, size=3, max_errors=2)
    return pa.table(
        {
            "phrase": pa.array([p for p, _ in rows], pa.string()),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
            ),
        }
    )


def fts_cardinality_source(sf_dir: str) -> pa.Table:
    """ES cardinality-aggregation analog: EXACT distinct count of the
    `source` keyword column over ALL BM25_QUERY hits (ES approximates with
    HyperLogLog++; the engine's dictionary-code hit masks make the exact
    answer one np.unique — see Searcher.cardinality_agg)."""
    s = Searcher(documents_index(sf_dir))
    n = s.cardinality_agg(BM25_QUERY, "source")
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def fts_date_hist_month(sf_dir: str) -> pa.Table:
    """ES date_histogram with calendar_interval=month over ALL BM25_QUERY
    hits: true calendar buckets (variable month lengths) over the
    docstore's ts_epoch column via vectorized datetime64 unit casts.
    Bucket key = epoch seconds of the month start, ascending."""
    s = Searcher(documents_index(sf_dir))
    rows = s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month")
    return pa.table(
        {
            "month_start": pa.array([b for b, _ in rows], pa.int64()),
            "n_docs": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def fts_date_hist_pipeline(sf_dir: str) -> pa.Table:
    """ES pipeline aggregations (cumulative_sum + derivative) over the
    calendar date_histogram buckets; the first bucket's derivative diffs
    against 0 (coalesce(lag, 0) — the documented divergence)."""
    from .search import pipeline_aggs

    s = Searcher(documents_index(sf_dir))
    rows = pipeline_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month")
    )
    return pa.table(
        {
            "month_start": pa.array([r[0] for r in rows], pa.int64()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "cum_docs": pa.array([r[2] for r in rows], pa.int64()),
            "deriv": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# bucket_script: per-bucket chars-per-doc ratio over the buckets_path
# pair (sum sub-agg / doc count) — the canonical ES ratio script
BUCKET_SCRIPT_EXPR = {
    "op": "/", "a": {"var": "metric_sum"}, "b": {"var": "_count"},
}


def fts_bucket_script(sf_dir: str) -> pa.Table:
    """ES bucket_script pipeline agg: monthly date_histogram of
    BM25_QUERY hits carrying a sum(n_chars) sub-agg, then the per-bucket
    script metric_sum / _count (buckets_path → painless-AST). The float
    ratio is pinned by FLOORING at e6 (identical single-divide op order
    both sides — no round-half ambiguity)."""
    from .search import bucket_script_buckets

    s = Searcher(documents_index(sf_dir))
    rows = s.date_hist_metric_agg(BM25_QUERY, "ts_epoch", "month", "n_chars")
    out = bucket_script_buckets(rows, BUCKET_SCRIPT_EXPR)
    return pa.table({
        "month_start": pa.array([k for k, _, _, _ in out], pa.int64()),
        "n_docs": pa.array([n for _, n, _, _ in out], pa.int64()),
        "sum_nchars": pa.array([m for _, _, m, _ in out], pa.int64()),
        "ratio_e6": pa.array(
            [int(np.floor(v * 1e6)) for _, _, _, v in out], pa.int64()
        ),
    })


def fts_date_hist_rate(sf_dir: str) -> pa.Table:
    """ES rate aggregation (unit=day) under the calendar-month
    date_histogram of BM25_QUERY hits: per-bucket docs-per-day with the
    bucket's TRUE month length in the denominator."""
    from .search import rate_buckets

    s = Searcher(documents_index(sf_dir))
    rows = rate_buckets(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month"),
        "month", "day",
    )
    return pa.table({
        "month_start": pa.array([r[0] for r in rows], pa.int64()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "days": pa.array([r[2] for r in rows], pa.int64()),
        "rate_e6": pa.array([r[3] for r in rows], pa.int64()),
    })


def fts_date_hist_rate_sum(sf_dir: str) -> pa.Table:
    """ES rate aggregation with a FIELD (rate of sum(n_chars) per day)
    under the calendar-month date_histogram: the metric sum rides the
    same true-month-length normalization as the doc-count rate."""
    from .search import rate_buckets

    s = Searcher(documents_index(sf_dir))
    rows3 = s.date_hist_metric_agg(BM25_QUERY, "ts_epoch", "month",
                                   "n_chars")
    rows = rate_buckets([(k, m) for k, _, m in rows3], "month", "day")
    return pa.table({
        "month_start": pa.array([r[0] for r in rows], pa.int64()),
        "sum_nchars": pa.array([r[1] for r in rows], pa.int64()),
        "days": pa.array([r[2] for r in rows], pa.int64()),
        "rate_e6": pa.array([r[3] for r in rows], pa.int64()),
    })


CORR_QUERY_B = "customer"   # the second count series of the correlation


def fts_bucket_correlation(sf_dir: str) -> pa.Table:
    """ES bucket_correlation pipeline agg (count_correlation): Pearson
    correlation between the WEEKLY hit-count series of BM25_QUERY and of
    CORR_QUERY_B, aligned on the union of weeks (missing -> 0). One
    (n_buckets, corr_e6) row from exact integer moments."""
    from .search import bucket_correlation

    s = Searcher(documents_index(sf_dir))
    n, corr_e6 = bucket_correlation(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "week"),
        s.date_histogram_agg(CORR_QUERY_B, "ts_epoch", "week"),
    )
    return pa.table({
        "n_buckets": pa.array([n], pa.int64()),
        "corr_e6": pa.array([corr_e6], pa.int64()),
    })


def fts_ks_test(sf_dir: str) -> pa.Table:
    """ES bucket_count_ks_test pipeline agg: two-sample KS statistic
    between the WEEKLY hit-count CDFs of BM25_QUERY and CORR_QUERY_B
    (union-aligned buckets, missing -> 0). One (n_buckets, ks_e6) row
    from exact integer prefix sums."""
    from .search import bucket_count_ks_test

    s = Searcher(documents_index(sf_dir))
    n, ks_e6 = bucket_count_ks_test(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "week"),
        s.date_histogram_agg(CORR_QUERY_B, "ts_epoch", "week"),
    )
    return pa.table({
        "n_buckets": pa.array([n], pa.int64()),
        "ks_e6": pa.array([ks_e6], pa.int64()),
    })


IP_BASE = 167772160            # 10.0.0.0 — the derived-IP space
IP_MULT = 2654435761           # Knuth multiplicative hash
IP_PREFIX_LEN = 12
# ip_range boundaries ([from, to), None = open):
# *-10.64.0.0, 10.64.0.0-10.128.0.0, 10.128.0.0-*
IP_RANGE_EDGES = (
    (None, IP_BASE + (1 << 22)),
    (IP_BASE + (1 << 22), IP_BASE + (2 << 22)),
    (IP_BASE + (2 << 22), None),
)


def _event_ips(sf_dir: str) -> rd.Dataset:
    """events + a derived IPv4 column (integer form): ip = 10.0.0.0 +
    (user_id · IP_MULT) mod 2^24 — deterministic, exact int64
    arithmetic the SQL twin repeats verbatim (the ts_epoch
    precedent)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )

    def derive(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy().astype(np.int64)
        ip = IP_BASE + (uid * IP_MULT) % (1 << 24)
        return pa.table({"ip": pa.array(ip, pa.int64())})

    return ds.map_batches(derive, batch_format="pyarrow")


def _dotted(ip: int) -> str:
    return f"{(ip >> 24) & 255}.{(ip >> 16) & 255}." \
           f"{(ip >> 8) & 255}.{ip & 255}"


def fts_ip_prefix(sf_dir: str) -> pa.Table:
    """ES ip_prefix aggregation: event counts per /IP_PREFIX_LEN
    network of the derived IPv4 column, keys 'a.b.c.d/len' ascending.
    Map-side combine (per-batch prefix bincount rows) + one
    O(prefixes) groupby."""
    mask = ~((1 << (32 - IP_PREFIX_LEN)) - 1) & 0xFFFFFFFF

    def partial(b: pa.Table) -> pa.Table:
        ip = b["ip"].combine_chunks().to_numpy()
        pfx = ip & mask
        u, c = np.unique(pfx, return_counts=True)
        return pa.table({
            "pfx": pa.array(u.astype(np.int64)),
            "n_p": pa.array(c.astype(np.int64)),
        })

    out = (
        _event_ips(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pfx")
        .aggregate(Sum("n_p"))
        .to_pandas()
        .sort_values("pfx")
    )
    return pa.table({
        "prefix": pa.array(
            [f"{_dotted(int(p))}/{IP_PREFIX_LEN}" for p in out["pfx"]],
            pa.string(),
        ),
        "doc_count": pa.array(
            [int(v) for v in out["sum(n_p)"]], pa.int64()
        ),
    })


def fts_ip_range(sf_dir: str) -> pa.Table:
    """ES ip_range aggregation: event counts per [from, to) ring of the
    derived IPv4 column, keys 'from-to' with '*' open ends (the range
    agg convention), in IP_RANGE_EDGES order."""
    edges = IP_RANGE_EDGES

    def partial(b: pa.Table) -> pa.Table:
        ip = b["ip"].combine_chunks().to_numpy()
        cnt = [
            int((((ip >= f) if f is not None else True)
                 & ((ip < t) if t is not None else True)).sum())
            for f, t in edges
        ]
        return pa.table({
            "ridx": pa.array(range(len(edges)), pa.int64()),
            "n_p": pa.array(cnt, pa.int64()),
        })

    out = (
        _event_ips(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ridx")
        .aggregate(Sum("n_p"))
        .to_pandas()
        .sort_values("ridx")
    )
    keys = [
        f"{'*' if f is None else _dotted(f)}-"
        f"{'*' if t is None else _dotted(t)}"
        for f, t in edges
    ]
    return pa.table({
        "key": pa.array([keys[int(i)] for i in out["ridx"]], pa.string()),
        "doc_count": pa.array(
            [int(v) for v in out["sum(n_p)"]], pa.int64()
        ),
    })


def fts_change_point(sf_dir: str) -> pa.Table:
    """ES change_point aggregation over the weekly date_histogram of
    BM25_QUERY hits: the split maximizing the scaled mean-shift
    statistic (ties -> smallest prefix), as (right-segment first bucket,
    left length, stat_e6)."""
    from .search import change_point

    s = Searcher(documents_index(sf_dir))
    key, t, stat_e6 = change_point(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "week")
    )
    return pa.table({
        "split_key": pa.array([key], pa.int64()),
        "left_n": pa.array([t], pa.int64()),
        "stat_e6": pa.array([stat_e6], pa.int64()),
    })


DIVERSIFIED_MAX_PER_KEY = 2


def fts_diversified_top10(sf_dir: str) -> pa.Table:
    """ES diversified_sampler + top_hits: BM25_QUERY top-10 with at
    most DIVERSIFIED_MAX_PER_KEY hits per source value (per-value rank
    cutoff in the global score-desc/doc-asc order; missing keys
    unlimited)."""
    s = Searcher(documents_index(sf_dir))
    hits = s.diversified_top_hits(
        BM25_QUERY, "source", max_per_key=DIVERSIFIED_MAX_PER_KEY, k=10
    )
    dense_to_src = _dense_to_src(documents_index(sf_dir))
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in hits], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
        ),
    })


TOP_METRICS_SIZE = 3


def fts_top_metrics(sf_dir: str) -> pa.Table:
    """ES top_metrics aggregation: the TOP_METRICS_SIZE hits of
    BM25_QUERY with the largest n_chars (doc_id tiebreak), each
    carrying its ts_epoch metric; rank column pins the order."""
    s = Searcher(documents_index(sf_dir))
    rows = s.top_metrics(
        BM25_QUERY, "n_chars", ["ts_epoch"], size=TOP_METRICS_SIZE
    )
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "doc_id": pa.array([d for d, _, _ in rows], pa.int64()),
        "n_chars": pa.array([int(v) for _, v, _ in rows], pa.int64()),
        "ts_epoch": pa.array(
            [int(m["ts_epoch"]) for _, _, m in rows], pa.int64()
        ),
    })


RANK_EVAL_K = 10
RANK_EVAL_REL = {"lang": "en"}  # judgment set: English docs are relevant


def fts_rank_eval(sf_dir: str) -> pa.Table:
    """ES rank_eval API: precision@k / reciprocal rank / binary-gain
    DCG of the BM25_QUERY ranking against the lang='en' judgment set
    (exact metric suite; recall rides as the exact (rel_at_k, n_rel)
    integer pair)."""
    s = Searcher(documents_index(sf_dir))
    ev = s.rank_eval(BM25_QUERY, RANK_EVAL_REL, k=RANK_EVAL_K)
    return pa.table({
        "k": pa.array([ev["k"]], pa.int64()),
        "rel_at_k": pa.array([ev["rel_at_k"]], pa.int64()),
        "n_rel": pa.array([ev["n_rel"]], pa.int64()),
        "precision_e6": pa.array(
            [int(round(ev["precision"] * 1e6))], pa.int64()
        ),
        "rr_e6": pa.array([int(round(ev["rr"] * 1e6))], pa.int64()),
        "dcg_e6": pa.array([int(round(ev["dcg"] * 1e6))], pa.int64()),
        "ndcg_e6": pa.array(
            [None if ev["ndcg"] is None else
             int(np.floor(ev["ndcg"] * 1e6 + 0.5))], pa.int64()
        ),
        "err_e6": pa.array([int(np.floor(ev["err"] * 1e6 + 0.5))],
                           pa.int64()),
    })


MOVING_WINDOW = 3  # moving_fn trailing window (incl. current bucket)
SERIAL_LAG = 2     # serial_diff lag


def fts_date_hist_moving(sf_dir: str) -> pa.Table:
    """ES moving_fn (trailing window including the current bucket —
    the ROWS BETWEEN w-1 PRECEDING frame) + serial_diff (lag
    SERIAL_LAG, coalesce-0 under-run) over the monthly date_histogram;
    mov_avg emitted e6 from the exact (sum, cnt) pair."""
    from .search import moving_window_aggs

    s = Searcher(documents_index(sf_dir))
    rows = moving_window_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month"),
        window=MOVING_WINDOW, lag=SERIAL_LAG,
    )
    return pa.table({
        "month_start": pa.array([int(r[0]) for r in rows], pa.int64()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "mov_sum": pa.array([r[2] for r in rows], pa.int64()),
        "mov_cnt": pa.array([r[3] for r in rows], pa.int64()),
        "mov_avg_e6": pa.array(
            [int(round(float(r[2]) / r[3] * 1e6)) for r in rows], pa.int64()
        ),
        "mov_min": pa.array([r[4] for r in rows], pa.int64()),
        "mov_max": pa.array([r[5] for r in rows], pa.int64()),
        "sdiff": pa.array([r[6] for r in rows], pa.int64()),
    })


AUTO_HIST_TARGET = 12  # auto_date_histogram bucket budget


def fts_auto_date_hist(sf_dir: str) -> pa.Table:
    """ES auto_date_histogram analog: smallest fixed-seconds ladder
    interval fitting AUTO_HIST_TARGET buckets over the BM25_QUERY hit
    span, then the plain fixed-interval histogram."""
    s = Searcher(documents_index(sf_dir))
    interval, buckets = s.auto_date_histogram_agg(
        BM25_QUERY, "ts_epoch", AUTO_HIST_TARGET
    )
    return pa.table({
        "interval_s": pa.array([interval] * len(buckets), pa.int64()),
        "bucket_start": pa.array(
            [int(k) for k, _ in buckets], pa.int64()
        ),
        "n_docs": pa.array([c for _, c in buckets], pa.int64()),
    })


def fts_percentiles_nchars(sf_dir: str) -> pa.Table:
    """ES percentiles-aggregation analog: EXACT linear-interpolation
    percentiles (the quantile_cont definition) of n_chars over ALL
    BM25_QUERY hits, e6-rounded like every float-valued query here."""
    s = Searcher(documents_index(sf_dir))
    pct = s.percentiles_agg(BM25_QUERY, "n_chars", PERCENTS)
    return pa.table(
        {
            "pct": pa.array(list(PERCENTS), pa.float64()),
            "value_e6": pa.array(
                [int(round(pct[p] * 1e6)) for p in PERCENTS], pa.int64()
            ),
        }
    )


PR_VALUES = (100.0, 300.0, 800.0)   # percentile_ranks probe values


def fts_percentile_ranks(sf_dir: str) -> pa.Table:
    """ES percentile_ranks analog (the percentiles inverse), EXACT:
    percent of BM25_QUERY-hit n_chars values <= each probe — the CDF
    partials (count, n) merge exactly across shards, unlike the
    forward percentiles."""
    s = Searcher(documents_index(sf_dir))
    pr = s.percentile_ranks_agg(BM25_QUERY, "n_chars", PR_VALUES)
    return pa.table({
        "value": pa.array(list(PR_VALUES), pa.float64()),
        "pct_e6": pa.array(
            [int(round(pr[v] * 1e6)) for v in PR_VALUES], pa.int64()
        ),
    })


def fts_value_count(sf_dir: str) -> pa.Table:
    """ES value_count aggregation: non-null n_chars values over the
    BM25_QUERY hit set."""
    s = Searcher(documents_index(sf_dir))
    n = s.value_count_agg(BM25_QUERY, "n_chars")
    return pa.table({"n": pa.array([n], pa.int64())})


def fts_mad_nchars(sf_dir: str) -> pa.Table:
    """ES median_absolute_deviation (EXACT, quantile_cont median) of
    n_chars over the BM25_QUERY hits. Integer inputs make median/mad
    exact multiples of 0.25, so the e6 columns are exact integers on
    both sides."""
    s = Searcher(documents_index(sf_dir))
    st = s.median_absolute_deviation_agg(BM25_QUERY, "n_chars")
    return pa.table({
        "n": pa.array([st["count"]], pa.int64()),
        "median_e6": pa.array([int(round(st["median"] * 1e6))], pa.int64()),
        "mad_e6": pa.array([int(round(st["mad"] * 1e6))], pa.int64()),
    })


def fts_boxplot_nchars(sf_dir: str) -> pa.Table:
    """ES boxplot aggregation (EXACT five-number summary,
    quantile_cont interpolation) of n_chars over the BM25_QUERY hits."""
    s = Searcher(documents_index(sf_dir))
    st = s.boxplot_agg(BM25_QUERY, "n_chars")
    e6 = lambda v: int(round(v * 1e6))  # noqa: E731
    return pa.table({
        "n": pa.array([st["count"]], pa.int64()),
        "min_v": pa.array([int(st["min"])], pa.int64()),
        "q1_e6": pa.array([e6(st["q1"])], pa.int64()),
        "q2_e6": pa.array([e6(st["q2"])], pa.int64()),
        "q3_e6": pa.array([e6(st["q3"])], pa.int64()),
        "max_v": pa.array([int(st["max"])], pa.int64()),
    })


def fts_string_stats_source(sf_dir: str) -> pa.Table:
    """ES string_stats aggregation over the source keyword column of
    the BM25_QUERY hit set: exact length stats + Shannon entropy of
    the character distribution (ascending-char accumulation, the op
    order the SQL oracle mirrors)."""
    s = Searcher(documents_index(sf_dir))
    st = s.string_stats_agg(BM25_QUERY, "source")
    return pa.table({
        "n": pa.array([st["count"]], pa.int64()),
        "min_len": pa.array([st["min_length"]], pa.int64()),
        "max_len": pa.array([st["max_length"]], pa.int64()),
        "len_sum": pa.array([st["len_sum"]], pa.int64()),
        "entropy_e6": pa.array(
            [int(round(st["entropy"] * 1e6))], pa.int64()
        ),
    })


def fts_matrix_stats(sf_dir: str) -> pa.Table:
    """ES matrix_stats for the (n_chars, doc_id) numeric pair over the
    BM25_QUERY hits: exact integer moment sums + Pearson correlation
    (scale-invariant, so the population-vs-sample choice cancels)."""
    s = Searcher(documents_index(sf_dir))
    st = s.matrix_stats_agg(BM25_QUERY, "n_chars", "doc_id")
    return pa.table({
        "n": pa.array([st["count"]], pa.int64()),
        "sx": pa.array([int(st["sx"])], pa.int64()),
        "sy": pa.array([int(st["sy"])], pa.int64()),
        "sxx": pa.array([int(st["sxx"])], pa.int64()),
        "syy": pa.array([int(st["syy"])], pa.int64()),
        "sxy": pa.array([int(st["sxy"])], pa.int64()),
        "corr_e6": pa.array(
            [None if st["correlation"] is None
             else int(round(st["correlation"] * 1e6))], pa.int64()
        ),
    })


def fts_multi_match_top10(sf_dir: str) -> pa.Table:
    """ES multi_match type=most_fields: MULTI_QUERY scored over the text
    index (boost 1) AND the source field index (boost 2) — per-field
    statistics, summed contributions in (field, term) order."""
    from .search import MultiFieldSearcher

    text_dir = documents_index(sf_dir)
    src_dir = documents_source_index(sf_dir)
    mf = MultiFieldSearcher(
        {
            "text": (Searcher(text_dir), MULTI_BOOSTS["text"]),
            "source": (Searcher(src_dir), MULTI_BOOSTS["source"]),
        }
    )
    hits = mf.search(MULTI_QUERY, k=10)
    dense_to_src = _dense_to_src(text_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_dis_max_top10(sf_dir: str) -> pa.Table:
    """ES multi_match type=best_fields (Lucene DisjunctionMaxQuery,
    tie_breaker=0.3): per-field BM25 with each field's own statistics,
    doc score = best field + 0.3 * the others."""
    from .search import MultiFieldSearcher

    text_dir = documents_index(sf_dir)
    src_dir = documents_source_index(sf_dir)
    mf = MultiFieldSearcher(
        {
            "text": (Searcher(text_dir), MULTI_BOOSTS["text"]),
            "source": (Searcher(src_dir), MULTI_BOOSTS["source"]),
        }
    )
    hits = mf.search(
        MULTI_QUERY, k=10, match_type="best_fields", tie_breaker=0.3
    )
    dense_to_src = _dense_to_src(text_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_cross_fields_top10(sf_dir: str) -> pa.Table:
    """ES multi_match type=cross_fields (Lucene BlendedTermQuery): one
    blended idf per term (df = max across fields), saturation = best
    field's boosted tf_part."""
    from .search import MultiFieldSearcher

    text_dir = documents_index(sf_dir)
    src_dir = documents_source_index(sf_dir)
    mf = MultiFieldSearcher(
        {
            "text": (Searcher(text_dir), MULTI_BOOSTS["text"]),
            "source": (Searcher(src_dir), MULTI_BOOSTS["source"]),
        }
    )
    hits = mf.search(MULTI_QUERY, k=10, match_type="cross_fields")
    dense_to_src = _dense_to_src(text_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_combined_fields_top10(sf_dir: str) -> pa.Table:
    """ES combined_fields query (Lucene CombinedFieldQuery / BM25F):
    text+source merge into one pseudo-field — boost-weighted tf/dl
    sums, blended max-df idf, BM25 saturation on the combined
    quantities."""
    from .search import MultiFieldSearcher

    text_dir = documents_index(sf_dir)
    src_dir = documents_source_index(sf_dir)
    mf = MultiFieldSearcher(
        {
            "text": (Searcher(text_dir), MULTI_BOOSTS["text"]),
            "source": (Searcher(src_dir), MULTI_BOOSTS["source"]),
        }
    )
    hits = mf.search(MULTI_QUERY, k=10, match_type="combined_fields")
    dense_to_src = _dense_to_src(text_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


MBP_QUERY = "data quer"  # match_bool_prefix probe: term clause + prefix


def fts_match_bool_prefix_top10(sf_dir: str) -> pa.Table:
    """ES match_bool_prefix: MBP_QUERY's last token is a prefix clause
    (constant-score 1.0), earlier tokens BM25 should-clauses."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.match_bool_prefix(MBP_QUERY, k=10)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


PINNED_IDS = (42, 7, 9999999, 17)  # src doc ids; the absent one skips
PINNED_QUERY = BM25_QUERY


def fts_pinned_top10(sf_dir: str) -> pa.Table:
    """ES pinned query: PINNED_IDS promoted above the organic
    PINNED_QUERY hits in the given order; rank column pins the
    promotion order through the driver's order-insensitive hash."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    dense_to_src = _dense_to_src(index_dir)
    src_to_dense = np.full(
        int(dense_to_src.max(initial=-1)) + 1, -1, dtype=np.int64
    )
    src_to_dense[dense_to_src] = np.arange(dense_to_src.size)
    pinned_dense = [
        int(src_to_dense[i]) if 0 <= i < src_to_dense.size else -1
        for i in PINNED_IDS
    ]
    rows = s.pinned_search(pinned_dense, PINNED_QUERY, k=10)
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _, _ in rows], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc, _ in rows], pa.int64()
            ),
            "pinned": pa.array(
                [int(p) for _, _, p in rows], pa.int64()
            ),
        }
    )


def fts_synonym_top10(sf_dir: str) -> pa.Table:
    """Query-time synonym expansion (Lucene SynonymQuery): each clause
    of SYN_QUERY scores as one pseudo-term over its group — df = max of
    the group (blended), tf = sum of the group's tfs per doc."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.synonym_search(SYN_QUERY, SYNONYMS, k=10)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_rescore_top10(sf_dir: str) -> pa.Table:
    """ES rescore API analog: BM25_QUERY retrieves a 30-hit window, the
    PHRASE_QUERY rescorer re-ranks ONLY that window (combined = 1.0*bm25
    + 2.0*phrase_score, score_mode=total) — positional work never touches
    the full hit set."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.rescore(
        BM25_QUERY, PHRASE_QUERY, window_size=30, k=10,
        query_weight=1.0, rescore_weight=2.0,
    )
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_stop_bm25_top10(sf_dir: str) -> pa.Table:
    """BM25 over the STOP-FILTERED index: 'the' in BM25_QUERY is dropped
    by the analyzer (query side too), df/dl/avgdl all reflect the stop
    filter — the ES analyzer-stopwords configuration end to end."""
    index_dir = documents_stop_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_function_score_top10(sf_dir: str) -> pa.Table:
    """ES function_score analog (field_value_factor, modifier=log1p,
    boost_mode=multiply): final = BM25 * ln(1 + n_chars) — the whole hit
    set rescores in one vectorized multiply, never a per-candidate loop."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.function_score(BM25_QUERY, "n_chars", k=10, modifier="log1p")
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


RANK_FEATURE_PIVOT = 300.0
RANK_FEATURE_BOOST = 1.5
DIST_FEATURE_ORIGIN = 400.0
DIST_FEATURE_PIVOT = 100.0
DIST_FEATURE_BOOST = 2.0


def fts_rank_feature_top10(sf_dir: str) -> pa.Table:
    """ES rank_feature (saturation) analog: final = BM25 +
    boost * n_chars/(n_chars + pivot) — additive should clause, whole
    hit set rescored in one vectorized pass."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.rank_feature(
        BM25_QUERY, "n_chars", pivot=RANK_FEATURE_PIVOT,
        k=10, boost=RANK_FEATURE_BOOST,
    )
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


MSEARCH_LINES = [
    ("spark join the data", "match"),
    ("the batch", "phrase"),
    ("+customer -slow", "query_string"),
]


COMPOSITE2_PAGE = 4


def fts_composite_date_terms_page2(sf_dir: str) -> pa.Table:
    """ES composite with TWO sources (date_histogram month + terms
    source) over the BM25_QUERY hit set: page 1 (size 4) yields the
    tuple after_key, page 2 resumes strictly after it — on the ordered
    key set the cursor page equals rows [size, 2·size) (what the SQL
    OFFSET twin checks)."""
    s = Searcher(documents_index(sf_dir))
    kw = dict(size=COMPOSITE2_PAGE)
    p1 = s.composite_date_terms_agg(
        BM25_QUERY, "ts_epoch", "month", "source", **kw)
    after = p1[-1][0] if p1 else None
    p2 = s.composite_date_terms_agg(
        BM25_QUERY, "ts_epoch", "month", "source", after_key=after, **kw)
    return pa.table({
        "month_start": pa.array([k[0] for k, _ in p2], pa.int64()),
        "source": pa.array([k[1] for k, _ in p2], pa.string()),
        "n_docs": pa.array([c for _, c in p2], pa.int64()),
    })


def fts_termvectors_top1(sf_dir: str) -> pa.Table:
    """ES _termvectors API: (term, tf, first_pos) for the BM25_QUERY
    top-1 hit — the gate recounts tf and the first 0-based token
    position from the corpus text."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    top = s.search(BM25_QUERY, k=1)
    rows = s.termvectors(top[0][0])
    dense_to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[top[0][0]])] * len(rows), pa.int64()
        ),
        "term": pa.array([t for t, _, _ in rows], pa.string()),
        "tf": pa.array([int(f) for _, f, _ in rows], pa.int64()),
        "first_pos": pa.array(
            [int(p[0]) for _, _, p in rows], pa.int64()
        ),
    })


def fts_validate_query(sf_dir: str) -> pa.Table:
    """ES _validate/query?explain: BM25_QUERY's per-clause (term, df,
    cf) from dictionary lookups only — no execution; the gate recounts
    df (distinct docs) and cf (total occurrences) from the corpus."""
    s = Searcher(documents_index(sf_dir))
    v = s.validate_query(BM25_QUERY)
    return pa.table({
        "term": pa.array([t for t, _, _ in v["terms"]], pa.string()),
        "df": pa.array([int(d) for _, d, _ in v["terms"]], pa.int64()),
        "cf": pa.array([int(c) for _, _, c in v["terms"]], pa.int64()),
    })


def fts_explain_top1(sf_dir: str) -> pa.Table:
    """ES _explain API: the per-clause breakdown of BM25_QUERY against
    its own top-1 hit — (term, df, tf, contribution_e6) per matched
    clause; summing contributions in term order reproduces the search
    score bit-for-bit (the gate recomputes each clause in SQL)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    top = s.search(BM25_QUERY, k=1)
    ex = s.explain(BM25_QUERY, top[0][0])
    dense_to_src = _dense_to_src(index_dir)
    rows = ex["details"]
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[ex["doc_id"]])] * len(rows), pa.int64()
        ),
        "term": pa.array([r["term"] for r in rows], pa.string()),
        "df": pa.array([int(r["df"]) for r in rows], pa.int64()),
        "tf": pa.array([int(r["tf"]) for r in rows], pa.int64()),
        "contrib_e6": pa.array(
            [int(round(r["contribution"] * 1e6)) for r in rows],
            pa.int64(),
        ),
    })


def text_fertility_by_lang(sf_dir: str) -> pa.Table:
    """Tokenizer-fertility audit: per lang, chars-per-analyzed-token
    (floor-e6 of Σn_chars / Σdl) — the compression proxy a tokenizer
    evaluation reads per language; Σdl comes from the index NORMS (the
    BM25 |d| array), so the gate also cross-checks norms against a full
    SQL token recount per lang."""
    s = Searcher(documents_index(sf_dir))
    codes, values = s._field_codes("lang")
    live = np.ones(s.N, dtype=bool)
    if s.excluded.size:
        live[s.excluded] = False
    nch, nv = s._numeric_col("n_chars")
    sel = live & nv & (codes >= 0)
    V = len(values)
    toks = np.bincount(codes[sel], weights=s.dl[sel].astype(np.float64),
                       minlength=V)
    chars = np.bincount(codes[sel], weights=nch[sel], minlength=V)
    rows = [
        (values[i], int(toks[i]), int(chars[i]),
         int(np.floor(chars[i] / toks[i] * 1e6)))
        for i in range(V) if toks[i] > 0
    ]
    rows.sort(key=lambda r: r[0])
    return pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        "cpt_e6": pa.array([r[3] for r in rows], pa.int64()),
    })


def fts_cat_stats(sf_dir: str) -> pa.Table:
    """ES _cat/indices + _stats analog: the index's headline stats read
    from the MANIFEST (docs.count, distinct terms, total token count /
    total_dl) — the gate cross-checks the build's bookkeeping against a
    full SQL recount of the corpus, so a stats drift can't hide."""
    s = Searcher(documents_index(sf_dir))
    m = s.manifest
    return pa.table({
        "n_docs": pa.array([int(m["n_docs"])], pa.int64()),
        "n_terms": pa.array([int(m["n_terms"])], pa.int64()),
        "total_dl": pa.array([int(m["total_dl"])], pa.int64()),
    })


def fts_msearch(sf_dir: str) -> pa.Table:
    """ES _msearch: a 3-line body (match / phrase / query_string kinds)
    streamed through the distributed QueryRunner actor pool
    (`search.run_queries` — a Dataset OF QUERIES); per-line top-5 rows
    keyed by query_id, bit-identical to the single-query APIs."""
    index_dir = documents_index(sf_dir)
    out = run_queries(index_dir, MSEARCH_LINES, k=5)
    t = pa.concat_tables(
        [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    )
    dense_to_src = _dense_to_src(index_dir)
    qid = t["query_id"].to_numpy(zero_copy_only=False)
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    sc = t["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((did, -sc, qid))
    return pa.table({
        "query_id": pa.array(qid[order].astype("int64"), pa.int64()),
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d in did[order]], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(s * 1e6)) for s in sc[order]], pa.int64()
        ),
    })


def fts_fields_top10(sf_dir: str) -> pa.Table:
    """ES `fields` response shaping (the query-then-fetch phase): the
    BM25_QUERY top-10 plus requested doc fields (lang, n_chars) fetched
    ONLY for the k hits via the manifest-routed multiget — the fetch
    reads the owning docstore partitions, never the corpus."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.search(BM25_QUERY, k=10)
    docs = s.get_by_doc_id([d for d, _ in hits])
    dense_to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in hits], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
        ),
        "lang": docs["lang"].combine_chunks().cast(pa.string()),
        "n_chars": docs["n_chars"].combine_chunks().cast(pa.int64()),
    })


def fts_rank_feature_sigmoid_top10(sf_dir: str) -> pa.Table:
    """ES rank_feature sigmoid variant (exponent pinned at 2): final =
    BM25 + boost * n_chars^2/(n_chars^2 + pivot^2) — exact products, no
    cross-engine pow()."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.rank_feature(
        BM25_QUERY, "n_chars", pivot=RANK_FEATURE_PIVOT,
        k=10, boost=RANK_FEATURE_BOOST, func="sigmoid",
    )
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_distance_feature_top10(sf_dir: str) -> pa.Table:
    """ES distance_feature analog over a numeric field: final = BM25 +
    boost * pivot/(pivot + |n_chars - origin|) — proximity-to-origin
    additive boost, exactly boost/2 at distance == pivot."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    hits = s.distance_feature(
        BM25_QUERY, "n_chars", origin=DIST_FEATURE_ORIGIN,
        pivot=DIST_FEATURE_PIVOT, k=10, boost=DIST_FEATURE_BOOST,
    )
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_more_like_this(sf_dir: str) -> pa.Table:
    """ES more_like_this analog: select doc MLT_DOC's top-25 tf*idf terms
    (tf>=1, df>=2, term-asc ties), run them as an unboosted OR query,
    exclude the source doc, top-10."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    dense_to_src = _dense_to_src(index_dir)
    inv = np.empty_like(dense_to_src)
    inv[dense_to_src] = np.arange(dense_to_src.size)
    hits = s.more_like_this(int(inv[MLT_DOC]), k=10)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, _ in hits], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
            ),
        }
    )


def fts_highlight_top10(sf_dir: str) -> pa.Table:
    """ES highlight analog: first query-term occurrence per top-10 hit,
    located from the positional sidecar (term-vectors strategy, no text
    re-analysis), plus a ±3-token analyzed snippet."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.highlight(BM25_QUERY, k=10, window=3)
    dense_to_src = _dense_to_src(index_dir)
    return pa.table(
        {
            "doc_id": pa.array(
                [int(dense_to_src[d]) for d, *_ in rows], pa.int64()
            ),
            "score_e6": pa.array(
                [int(round(sc * 1e6)) for _, sc, *_ in rows], pa.int64()
            ),
            "first_pos": pa.array([p for _, _, p, _, _ in rows], pa.int64()),
            "first_term": pa.array(
                [t for _, _, _, t, _ in rows], pa.string()
            ),
            "snippet": pa.array([sn for *_, sn in rows], pa.string()),
        }
    )


def fts_export_hits(sf_dir: str) -> rd.Dataset:
    """ES scroll analog, Ray-native: stream EVERY BM25_QUERY hit out of
    the docstore as a Dataset (broadcast packed bitmask + vectorized
    map_batches filter, pruned columns) — the full-result-set path that
    must never land on the driver."""
    from .export import export_hits

    index_dir = documents_index(sf_dir)
    ds = export_hits(index_dir, BM25_QUERY, columns=["src_doc_id", "lang"])

    def present(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["src_doc_id"], "lang": t["lang"]}
        )

    return ds.map_batches(present, batch_format="pyarrow")


def fts_term_doc_count(sf_dir: str) -> pa.Table:
    """df for fixed probe terms (exact-count conformance, A2 analog)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    terms, dfs = [], []
    for t in PROBE_TERMS:
        p = s.lookup(t)
        if p is not None:
            terms.append(t)
            dfs.append(p.df)
    return pa.table(
        {"term": pa.array(terms, pa.string()), "df": pa.array(dfs, pa.int64())}
    )


def fts_compact_docstore(sf_dir: str) -> pa.Table:
    """Delete-by-query + forceMerge round-trip (S9/compaction analog):
    purge every doc with src_doc_id % 10 == 3 from the built index via
    ``compact.compact_segments`` and read back the renumbered docstore.
    Verifies dense renumbering, tombstone purge, and text round-trip
    through the real compaction path (not a table-side filter)."""
    from .compact import compact_segments

    index_dir = documents_index(sf_dir)
    out_dir = index_dir + "-compacted"
    manifest_path = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(manifest_path):
        ds = pq.read_table(
            os.path.join(index_dir, "docstore"),
            columns=["doc_id", "src_doc_id"],
        )
        src = ds["src_doc_id"].to_numpy()
        victims = ds["doc_id"].to_numpy()[src % 10 == 3]
        compact_segments(
            [index_dir], out_dir, extra_tombstones=[victims]
        )
    t = pq.read_table(
        os.path.join(out_dir, "docstore"),
        columns=["doc_id", "src_doc_id", "text"],
    ).sort_by([("doc_id", "ascending")])
    return pa.table(
        {
            "new_doc_id": t["doc_id"],
            "src_doc_id": t["src_doc_id"],
            "text": t["text"],
        }
    )


def fts_docstore_roundtrip(sf_dir: str) -> pa.Table:
    """(doc_id, text) back out of the built docstore — the per-row text
    equality invariant (M4/M6 round-trip analog)."""
    index_dir = documents_index(sf_dir)
    t = pq.read_table(
        os.path.join(index_dir, "docstore"), columns=["src_doc_id", "text"]
    )
    return pa.table({"doc_id": t["src_doc_id"], "text": t["text"]})


# ---------------------------------------------------------------------------
# keyword / relational / windowed operators (M1, A1, J-series analogs)
# ---------------------------------------------------------------------------


def fts_tags_filter_count(sf_dir: str) -> rd.Dataset:
    """F7 dynamic-tags surface: count docs per tags['lang'] value read from
    the docstore's map<string,string> column via a vectorized map_lookup —
    proving the tag map survives write/read and is keyword-filterable
    (ref: dynamic tags map ESEntity.java:14,18-22 + not_analyzed template
    plugin.properties:11)."""
    from .build import tags_lookup

    index_dir = documents_index(sf_dir)
    ds = rd.read_parquet(os.path.join(index_dir, "docstore"), columns=["tags"])

    def extract(batch: pa.Table) -> pa.Table:
        return pa.table({"tag_value": tags_lookup(batch["tags"], "lang")})

    agg = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("tag_value")
        .aggregate(Count())
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"tag_value": t["tag_value"], "n_docs": pc.cast(t["count()"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def keyword_count_by_lang(sf_dir: str) -> rd.Dataset:
    """not_analyzed keyword aggregation (A1 per-type counts analog)."""
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang", use_threads=False).aggregate([("lang", "count")])
        return g.rename_columns(["lang", "n_p"])

    agg = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["lang"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("n_p"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"lang": t["lang"], "n_docs": pc.cast(t["sum(n_p)"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def events_tumbling_1h(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event_type (streaming-analog W-series):
    (event_type, window_start, n_events, sum_value)."""
    HOUR_US = 3_600_000_000

    def window_partial(batch: pa.Table) -> pa.Table:
        """Map-side combine: one row per (event_type, window) per batch —
        the shuffle moves per-batch window aggregates, not raw events."""
        us = pc.cast(batch["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, HOUR_US), HOUR_US)  # int64 divide truncates; ts>0 so == floor
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": pc.cast(win, pa.timestamp("us")),
                # integer cents per row BEFORE the sums: float-accumulated
                # cents can flip a rounding boundary at large magnitudes
                "value_c": pc.cast(
                    pc.round(pc.multiply(batch["value"], 100.0)), pa.int64()
                ),
            }
        )
        g = t.group_by(["event_type", "window_start"], use_threads=False).aggregate(
            [("value_c", "count"), ("value_c", "sum")]
        )
        return g.rename_columns(["event_type", "window_start", "n_p", "sum_p"])

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )
        .map_batches(window_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_p"), Sum("sum_p"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "window_start": t["window_start"],
                "n_events": pc.cast(t["sum(n_p)"], pa.int64()),
                "sum_value_cents": pc.cast(t["sum(sum_p)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sample_split_counts(sf_dir: str) -> pa.Table:
    """Deterministic hash-split of documents into train/holdout (90/100
    md5 buckets keyed on doc_id — rerun-stable, shuffle-free): per-split
    doc count + distinct bucket count. The streaming splitter is
    `extras.sampling.split_dataset`; only the ≤100-row (split, bucket)
    histogram reaches the driver."""
    from .extras.sampling import split_dataset

    ds = split_dataset(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ),
        "doc_id",
        buckets=100,
        train_buckets=90,
    )
    t = ds.groupby(["split", "bucket"]).count().to_pandas()
    g = (
        t.groupby("split")
        .agg(n_docs=("count()", "sum"), n_buckets=("bucket", "nunique"))
        .reset_index()
        .sort_values("split")
    )
    return pa.table(
        {
            "split": pa.array(g["split"].tolist(), pa.string()),
            "n_docs": pa.array(
                [int(v) for v in g["n_docs"]], pa.int64()
            ),
            "n_buckets": pa.array(
                [int(v) for v in g["n_buckets"]], pa.int64()
            ),
        }
    )


SAMPLE_QUOTA = 50  # per-stratum quota (per-domain cap analog)


def sample_stratified_counts(sf_dir: str) -> pa.Table:
    """Deterministic per-stratum quota sampling of documents (stratum =
    source, key = doc_id, quota = SAMPLE_QUOTA): the per-domain-cap
    stage. Keeps each stratum's quota rows with the smallest
    (md5rank, key) pairs — `extras.sampling.stratified_sample`
    (block-head candidates -> O(strata) boundary broadcast -> one
    streaming filter). The contract row fingerprints each stratum's
    kept set with its exact doc_id sum."""
    from .extras.sampling import stratified_sample

    kept = stratified_sample(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source"],
        ),
        key_col="doc_id",
        stratum_col="source",
        quota=SAMPLE_QUOTA,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("source", use_threads=False).aggregate(
            [("doc_id", "count"), ("doc_id", "sum")]
        )
        return pa.table({
            "source": g["source"],
            "n": g["doc_id_count"],
            "s": g["doc_id_sum"],
        })

    rows = kept.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = rows.groupby("source", as_index=False).agg(
        n_kept=("n", "sum"), sum_doc_id=("s", "sum")
    ).sort_values("source")
    return pa.table({
        "source": pa.array(g["source"].tolist(), pa.string()),
        "n_kept": pa.array([int(v) for v in g["n_kept"]], pa.int64()),
        "sum_doc_id": pa.array(
            [int(v) for v in g["sum_doc_id"]], pa.int64()
        ),
    })


TEMP_MULT = 3   # temperature-resample quota multiplier (3 * isqrt(n_s))


def temperature_mix_counts(sf_dir: str) -> pa.Table:
    """Temperature-based mixture resampling of documents (stratum =
    source, alpha = 0.5, quota_s = floor(sqrt(n_s)) * TEMP_MULT): the
    multinomial data-mixing rule of multi-domain pretraining, alpha < 1
    flattening the mixture toward tail domains. Deterministic md5-rank
    selection per stratum; the contract row fingerprints each stratum's
    kept set with its exact doc_id sum (the sample_stratified_counts
    convention)."""
    from .extras.sampling import temperature_resample

    kept, quota = temperature_resample(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source"],
        ),
        key_col="doc_id",
        stratum_col="source",
        alpha=0.5,
        mult=TEMP_MULT,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("source", use_threads=False).aggregate(
            [("doc_id", "count"), ("doc_id", "sum")]
        )
        return pa.table({
            "source": g["source"],
            "n": g["doc_id_count"],
            "s": g["doc_id_sum"],
        })

    rows = kept.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = rows.groupby("source", as_index=False).agg(
        n_kept=("n", "sum"), sum_doc_id=("s", "sum")
    ).sort_values("source")
    return pa.table({
        "source": pa.array(g["source"].tolist(), pa.string()),
        "n_kept": pa.array([int(v) for v in g["n_kept"]], pa.int64()),
        "sum_doc_id": pa.array(
            [int(v) for v in g["sum_doc_id"]], pa.int64()
        ),
    })


LEAK_PREFIX_TOKENS = 5   # opening-fingerprint width for the leakage audit


def split_leakage_audit(sf_dir: str) -> pa.Table:
    """Train/holdout leakage audit over documents: after the md5-bucket
    90/10 split, how many holdout docs share their first
    LEAK_PREFIX_TOKENS analyzed tokens (the opening fingerprint) with a
    train doc. One streaming pass + one O(distinct openings) groupby;
    the driver sees three scalars."""
    from .extras.decontam import split_leakage

    return split_leakage(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ),
        prefix_tokens=LEAK_PREFIX_TOKENS,
    )


NTILE_BINS = 10   # curriculum decile binning


def quality_ntile_counts(sf_dir: str) -> pa.Table:
    """Curriculum/quality percentile binning: documents bucketed into
    NTILE_BINS exact ntiles by n_chars (ties broken by doc_id — the SQL
    ntile total order), emitting per-bin (n_docs, sum_doc_id). The
    distributed shape is one exact value histogram + a broadcast
    value->bin map + a streaming pass; only boundary-straddling value
    groups (<= bins-1 of them) rank within-group."""
    from .extras.sampling import ntile_bins

    binned = ntile_bins(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        ),
        value_col="n_chars",
        key_col="doc_id",
        n_bins=NTILE_BINS,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("bin", use_threads=False).aggregate(
            [("doc_id", "count"), ("doc_id", "sum")]
        )
        return pa.table({
            "bin": g["bin"],
            "n": g["doc_id_count"],
            "s": g["doc_id_sum"],
        })

    rows = binned.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = rows.groupby("bin", as_index=False).agg(
        n_docs=("n", "sum"), sum_doc_id=("s", "sum")
    ).sort_values("bin")
    return pa.table({
        "bin": pa.array([int(v) for v in g["bin"]], pa.int64()),
        "n_docs": pa.array([int(v) for v in g["n_docs"]], pa.int64()),
        "sum_doc_id": pa.array(
            [int(v) for v in g["sum_doc_id"]], pa.int64()
        ),
    })


SESSION_GAP_US = 1_800_000_000  # 30-min inactivity gap


def events_sessionize(sf_dir: str) -> rd.Dataset:
    """Session windows (gap-based sessionization — the W-series analog a
    transcript/telemetry pipeline actually needs): per user, events
    closer than SESSION_GAP_US belong to one session. One hash shuffle
    on user_id, then a fully vectorized per-group pass (sort + diff +
    cumsum + reduceat boundaries) — per-user groups are small; a
    pathological single-user firehose would salt by time range first.
    Returns one row per session: (user_id, session_start_us, n_events,
    dur_us)."""

    def sessionize(g: pa.Table) -> pa.Table:
        us = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        eid = g["event_id"].combine_chunks().to_numpy()
        order = np.lexsort((eid, us))  # (ts, event_id) — tie-stable
        us = us[order]
        new = np.ones(us.size, dtype=bool)
        new[1:] = np.diff(us) > SESSION_GAP_US
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], us.size) - 1
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array([uid] * starts.size, pa.int64()),
                "session_start_us": pa.array(us[starts], pa.int64()),
                "n_events": pa.array(
                    (ends - starts + 1).astype("int64"), pa.int64()
                ),
                "dur_us": pa.array(us[ends] - us[starts], pa.int64()),
            }
        )

    return (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id"],
        )
        .groupby("user_id")
        .map_groups(sessionize, batch_format="pyarrow")
    )


EQL_MAXSPAN_US = 7_200_000_000  # 2h


def events_eql_sequence(sf_dir: str) -> pa.Table:
    """ES EQL sequence query analog: ``sequence by user_id with
    maxspan=2h [event_type=="click"] [event_type=="purchase"]``.
    Pinned match rule (deterministic + relational): a click completes a
    sequence when ANY purchase by the same user falls strictly inside
    (ts_click, ts_click + maxspan]; each click counts at most once
    (existence, so no tie-pick rule is needed). Same distributed shape
    as sessionize: ONE hash shuffle on the `by` key, then a fully
    vectorized per-group pass (sort + two searchsorted bounds per click
    — O(n log n) per user, no Python loop). Returns (user_id, n_seq)
    for users with >= 1 completed sequence, ascending."""

    def seq_kernel(g: pa.Table) -> pa.Table:
        et = g["event_type"].combine_chunks()
        us = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        is_a = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        is_b = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        a_us = us[is_a]
        b_us = np.sort(us[is_b])
        if a_us.size == 0 or b_us.size == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_seq": pa.array([], pa.int64()),
            })
        lo = np.searchsorted(b_us, a_us, side="right")
        hi = np.searchsorted(b_us, a_us + EQL_MAXSPAN_US, side="right")
        n = int((hi > lo).sum())
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_seq": pa.array([], pa.int64()),
            })
        uid = int(g["user_id"][0].as_py())
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_seq": pa.array([n], pa.int64()),
        })

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        .groupby("user_id")
        .map_groups(seq_kernel, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


def events_eql_until(sf_dir: str) -> pa.Table:
    """EQL ``until`` clause: ``sequence by user_id with maxspan=2h
    [click] [purchase] until [error]`` — an error event TERMINATES the
    pending sequence state, so a click completes only when a purchase
    lands in its window with no error strictly between them. Pinned
    equivalence (proved in the docstring test): the first purchase in
    the window is the only candidate that matters — if an error
    precedes it, it precedes every later purchase too. So the kernel
    is three searchsorted passes (first purchase, window bound, first
    error) and one vectorized compare; an error at exactly the
    purchase timestamp does NOT kill (open interval, documented).
    Same ONE-shuffle sessionize shape as the other EQL kernels."""

    def seq_kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_seq": pa.array([], pa.int64()),
        })
        et = g["event_type"].combine_chunks()
        us = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        a_us = us[pc.equal(et, "click").to_numpy(zero_copy_only=False)]
        b_us = np.sort(
            us[pc.equal(et, "purchase").to_numpy(zero_copy_only=False)]
        )
        e_us = np.sort(
            us[pc.equal(et, "error").to_numpy(zero_copy_only=False)]
        )
        if a_us.size == 0 or b_us.size == 0:
            return empty
        lo = np.searchsorted(b_us, a_us, side="right")
        valid = lo < b_us.size
        fp = np.where(valid, b_us[np.minimum(lo, b_us.size - 1)],
                      np.iinfo(np.int64).max)
        in_window = valid & (fp <= a_us + EQL_MAXSPAN_US)
        if e_us.size:
            el = np.searchsorted(e_us, a_us, side="right")
            fe = np.where(el < e_us.size,
                          e_us[np.minimum(el, e_us.size - 1)],
                          np.iinfo(np.int64).max)
        else:
            fe = np.full(a_us.size, np.iinfo(np.int64).max)
        n = int((in_window & (fe >= fp)).sum())
        if n == 0:
            return empty
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())],
                                pa.int64()),
            "n_seq": pa.array([n], pa.int64()),
        })

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        .groupby("user_id")
        .map_groups(seq_kernel, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


EQL3_MAXSPAN_US = 28_800_000_000  # 8h — 3 hops are rarer, wider window


def events_eql_seq3(sf_dir: str) -> pa.Table:
    """Three-stage EQL sequence: ``sequence by user_id with maxspan=8h
    [click] [view] [purchase]`` — a click completes when SOME view v in
    (ts_c, ts_c+span] has SOME purchase in (ts_v, ts_v+span] (each hop
    bounded by maxspan, the EQL per-adjacent-pair rule pinned here).
    Vectorized per group: mark each view that has a purchase in its
    forward window (two searchsorted passes), then count clicks whose
    window holds >= 1 marked view via a prefix-sum range count — no
    greedy tie-pick needed (pure existence, any witness works)."""

    def seq_kernel(g: pa.Table) -> pa.Table:
        et = g["event_type"].combine_chunks()
        us = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        a_us = us[pc.equal(et, "click").to_numpy(zero_copy_only=False)]
        v_us = np.sort(
            us[pc.equal(et, "view").to_numpy(zero_copy_only=False)]
        )
        b_us = np.sort(
            us[pc.equal(et, "purchase").to_numpy(zero_copy_only=False)]
        )
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_seq": pa.array([], pa.int64()),
        })
        if a_us.size == 0 or v_us.size == 0 or b_us.size == 0:
            return empty
        # view v is "backed" iff a purchase falls in (v, v+span]
        lo_b = np.searchsorted(b_us, v_us, side="right")
        hi_b = np.searchsorted(b_us, v_us + EQL3_MAXSPAN_US, side="right")
        backed = (hi_b > lo_b).astype(np.int64)
        pref = np.concatenate([[0], np.cumsum(backed)])
        # click c completes iff >= 1 backed view in (c, c+span]
        lo_v = np.searchsorted(v_us, a_us, side="right")
        hi_v = np.searchsorted(v_us, a_us + EQL3_MAXSPAN_US, side="right")
        n = int((pref[hi_v] > pref[lo_v]).sum())
        if n == 0:
            return empty
        uid = int(g["user_id"][0].as_py())
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_seq": pa.array([n], pa.int64()),
        })

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        .groupby("user_id")
        .map_groups(seq_kernel, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


def q1_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-style scan+filter+aggregate over lineitem (M1/A-series):
    pre-aggregated map-side, tiny global groupby.

    Values convert to INTEGER cents per row BEFORE aggregation (the money
    columns are 2-decimal), so the sums are order-independent and exact —
    float-accumulated cents hit a rounding boundary at ~1e9-cent
    magnitudes (observed: one ulp flipped sum_disc by a cent at sf0.1).
    disc_e4 = price_cents * (100 - disc_cents) is exact in 1e-4 dollars.
    """
    CUTOFF = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))

    def cents(col) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less_equal(batch["l_shipdate"], CUTOFF))
        price_c = cents(b["l_extendedprice"])
        disc_c = cents(b["l_discount"])
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_c": cents(b["l_quantity"]),
                "base_c": price_c,
                "disc_e4": pc.multiply(
                    price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
                ),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("disc_e4", "sum"), ("qty_c", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base", "sum_disc", "n_rows"]
        )

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty"), Sum("sum_base"), Sum("sum_disc"), Sum("n_rows"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty_cents": pc.cast(t["sum(sum_qty)"], pa.int64()),
                "sum_base_cents": pc.cast(t["sum(sum_base)"], pa.int64()),
                "sum_disc_e4": pc.cast(t["sum(sum_disc)"], pa.int64()),
                "n_rows": pc.cast(t["sum(n_rows)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def join_revenue_by_segment(sf_dir: str) -> rd.Dataset:
    """orders x customer broadcast hash join (J1 small-side pattern:
    `ray.put` once, dict lookup per batch — no shuffle)."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    # broadcast the small side ONCE as Arrow arrays; per batch the probe is
    # a vectorized pc.index_in + take (no Python loop over keys)
    seg_map_ref = ray.put(
        (
            pc.cast(cust["c_custkey"].combine_chunks(), pa.int64()),
            cust["c_mktsegment"].combine_chunks(),
        )
    )

    class JoinSegment:
        def __init__(self, ref):
            self.keys, self.segs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(
                pc.cast(batch["o_custkey"], pa.int64()), value_set=self.keys
            )
            seg = pc.take(self.segs, idx)  # null index -> null segment
            out = pa.table(
                {"c_mktsegment": seg, "o_totalprice": batch["o_totalprice"]}
            )
            # inner-join semantics: drop orders with no matching customer;
            # then map-side combine — the shuffle moves one row per
            # segment per batch (5 segments), not per order
            out = out.filter(pc.is_valid(out["c_mktsegment"]))
            out = pa.table(
                {
                    "c_mktsegment": out["c_mktsegment"],
                    "price_c": pc.cast(
                        pc.round(pc.multiply(out["o_totalprice"], 100.0)),
                        pa.int64(),
                    ),
                }
            )
            g = out.group_by("c_mktsegment", use_threads=False).aggregate(
                [("price_c", "count"), ("price_c", "sum")]
            )
            return g.rename_columns(["c_mktsegment", "n_p", "sum_p"])

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        .map_batches(
            JoinSegment,
            fn_constructor_kwargs={"ref": seg_map_ref},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("c_mktsegment")
        .aggregate(Sum("n_p"), Sum("sum_p"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": pc.cast(t["sum(n_p)"], pa.int64()),
                # integer cents summed exactly (per-row conversion)
                "total_revenue_cents": pc.cast(t["sum(sum_p)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# training-data extras
# ---------------------------------------------------------------------------


def semi_join_lineitem_part(sf_dir: str) -> rd.Dataset:
    """Semi-join (J2, the --used-node analog): lineitems whose partkey is in
    a filtered part set — broadcast the key set, filter inside map_batches
    (no shuffle), then aggregate."""
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"]
    )
    keys = part.filter(pc.greater(part["p_size"], 25))["p_partkey"]
    key_ref = ray.put(pc.cast(keys.combine_chunks(), pa.int64()))

    class SemiFilter:
        def __init__(self, ref):
            self.keys = ray.get(ref)  # broadcast Arrow key array, once/actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(
                pc.cast(batch["l_partkey"], pa.int64()), value_set=self.keys
            )
            sub = batch.filter(mask)
            sub = pa.table(
                {
                    "l_partkey": sub["l_partkey"],
                    "qty_c": pc.cast(
                        pc.round(pc.multiply(sub["l_quantity"], 100.0)),
                        pa.int64(),
                    ),
                }
            )
            # map-side combine before the key shuffle
            g = sub.group_by("l_partkey", use_threads=False).aggregate(
                [("qty_c", "count"), ("qty_c", "sum")]
            )
            return g.rename_columns(["l_partkey", "n_p", "sum_p"])

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity"],
        )
        .map_batches(
            SemiFilter,
            fn_constructor_kwargs={"ref": key_ref},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("l_partkey")
        .aggregate(Sum("n_p"), Sum("sum_p"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "n_items": pc.cast(t["sum(n_p)"], pa.int64()),
                "sum_qty_cents": pc.cast(t["sum(sum_p)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def union_distinct_keys(sf_dir: str) -> pa.Table:
    """Union (D2 analog): orders.o_custkey UNION ALL customer.c_custkey ->
    distinct count via ds.union + groupby."""
    # map-side unique shrinks the distinct shuffle to per-block key sets
    a = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    ).map_batches(
        lambda t: pa.table({"id": pc.unique(t["o_custkey"].combine_chunks())}),
        batch_format="pyarrow",
    )
    b = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {"id": pc.cast(pc.unique(t["c_custkey"].combine_chunks()), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    n = a.union(b).groupby("id").count().count()
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


# geo probe constants (shared with oracle_sql — keep in sync). The events
# table has no geometry, so lat/lon derive DETERMINISTICALLY from the ids
# via integer arithmetic that SQL reproduces exactly: the only float ops
# are the final /100.0 - offset, identical on both sides.
GEO_ORIGIN = (37.77, -122.42)        # query origin (lat, lon), SF-ish
GEO_RADIUS_KM = 3000.0
GEO_K = 20
GEO_BOX_TL = (60.0, -30.0)           # top-left (lat, lon)
GEO_BOX_BR = (20.0, 60.0)            # bottom-right (lat, lon)
# convex CCW pentagon (lat, lon); vertices sit on half/1.5-centi
# offsets chosen so NO centidegree grid point lies exactly on any edge
# (verified in exact 0.005-unit integer arithmetic: every edge's
# interior lattice points have at least one odd coordinate; min
# grid-to-edge distance ~4e-7 deg, far above float noise) — which makes
# the engine's ray-casting and the oracle's strict half-plane test
# provably agree on the data (test_geo pins it)
GEO_POLY = [(10.005, -40.005), (-20.005, -20.005), (-15.005, 25.005),
            (15.015, 40.005), (30.005, 5.005)]
GEO_RING_EDGES_KM = [1000.0, 3000.0, 8000.0]  # geo_distance agg rings
# precision 2 = 32x32 cells: the derived grid has only ~n_users distinct
# latitudes, so finer cells would be all count-1 (a tie-order test, not
# an aggregation test); at 2 the cells hold meaningful counts
GEOHASH_PRECISION = 2
GEOHASH_TOP_N = 15
GEOTILE_ZOOM = 7                      # 128x128 web-mercator tiles
GEOTILE_TOP_N = 15
# query envelope for the GeoShape-relation pipeline, in the clustered
# way grid's centidegree units (ymin, xmin, ymax, xmax) — sized so all
# four relation classes are populated at sf0.01+ against the per-user
# span distribution of _events_geo_cluster
WAY_QUERY_ENV = (4000, 9000, 12000, 27000)


def _events_geo(sf_dir: str) -> rd.Dataset:
    """events + derived (lat, lon) point per event: lat/lon centidegree
    grids from user_id/event_id (exact int arithmetic; see GEO_* note).
    lat_e2/lon_e2 carry the exact integer micro-units so downstream
    centroids can aggregate without float summation-order drift."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].combine_chunks().to_numpy()
        uid = batch["user_id"].combine_chunks().to_numpy()
        lat_e2 = (uid.astype(np.int64) * 7919) % 18000
        lon_e2 = (eid.astype(np.int64) * 104729) % 36000
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lat": pa.array(lat_e2 / 100.0 - 90.0, pa.float64()),
                "lon": pa.array(lon_e2 / 100.0 - 180.0, pa.float64()),
                "lat_e2": pa.array(lat_e2, pa.int64()),
                "lon_e2": pa.array(lon_e2, pa.int64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


def geo_distance_sort_q(sf_dir: str) -> pa.Table:
    """GeoDistance filter + geo-distance sort (ESNodeITest.java:138-194
    semantics): the GEO_K events nearest GEO_ORIGIN within
    GEO_RADIUS_KM, (dist asc, event_id asc)."""
    from .geo import geo_distance_topk

    t = geo_distance_topk(
        _events_geo(sf_dir), "lat", "lon", GEO_ORIGIN,
        k=GEO_K, id_col="event_id", radius_km=GEO_RADIUS_KM,
    )
    return pa.table(
        {
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "dist_e6": pc.cast(
                pc.round(pc.multiply(t["dist_km"], 1e6)), pa.int64()
            ),
        }
    )


def geo_sort_after_q(sf_dir: str) -> pa.Table:
    """search_after on the geo-distance sort: page 1's last (dist, id)
    cursors page 2 — rows [GEO_K, 2·GEO_K) of the (dist asc, id asc)
    order inside the radius (the SQL OFFSET twin)."""
    from .geo import geo_distance_topk

    kw = dict(k=GEO_K, id_col="event_id", radius_km=GEO_RADIUS_KM)
    p1 = geo_distance_topk(
        _events_geo(sf_dir), "lat", "lon", GEO_ORIGIN, **kw)
    after = None
    if p1.num_rows:
        after = (p1["dist_km"][-1].as_py(), p1["event_id"][-1].as_py())
    p2 = geo_distance_topk(
        _events_geo(sf_dir), "lat", "lon", GEO_ORIGIN, after=after, **kw)
    return pa.table(
        {
            "event_id": pc.cast(p2["event_id"], pa.int64()),
            "dist_e6": pc.cast(
                pc.round(pc.multiply(p2["dist_km"], 1e6)), pa.int64()
            ),
        }
    )


def geo_bbox_count_q(sf_dir: str) -> pa.Table:
    """geo_bounding_box filter consumed as a count (pure comparisons on
    the derived grid — no trig, exact on both sides)."""
    from .geo import geo_bounding_box_count

    n = geo_bounding_box_count(
        _events_geo(sf_dir), "lat", "lon", GEO_BOX_TL, GEO_BOX_BR
    )
    return pa.table({"n": pa.array([n], pa.int64())})


def geo_centroid_q(sf_dir: str) -> pa.Table:
    """geo_centroid aggregation (ESShape.java:160-185 mean-of-points)
    over the events within GEO_RADIUS_KM of GEO_ORIGIN. Aggregates the
    exact integer micro-unit columns, so the mean is deterministic
    (block order can't drift the sum); the final division sequence is
    mirrored in the SQL oracle."""
    from .geo import geo_centroid, geo_distance_filter

    within = geo_distance_filter(
        _events_geo(sf_dir), "lat", "lon", GEO_ORIGIN, GEO_RADIUS_KM
    )
    lat_u, lon_u, n = geo_centroid(within, "lat_e2", "lon_e2")
    if n == 0:
        # NaN sentinels from the empty hit set -> the oracle's
        # (n=0, NULL, NULL) row, not a ValueError from rounding NaN
        return pa.table({
            "n": pa.array([0], pa.int64()),
            "lat_e6": pa.array([None], pa.int64()),
            "lon_e6": pa.array([None], pa.int64()),
        })
    lat = lat_u / 100.0 - 90.0
    lon = lon_u / 100.0 - 180.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "lat_e6": pa.array([int(np.round(lat * 1e6))], pa.int64()),
            "lon_e6": pa.array([int(np.round(lon * 1e6))], pa.int64()),
        }
    )


def geo_polygon_count_q(sf_dir: str) -> pa.Table:
    """ES geo_polygon query consumed as a count. The engine filter is
    general even-odd ray casting (rayfts.geo.point_in_polygon); the SQL
    oracle uses the convex half-plane test, legal because GEO_POLY is
    convex and its edges avoid the centidegree data grid (vertices sit
    on .005 half-centi offsets) — agreement of the two predicates on
    this polygon is pinned by test_geo.test_raycast_equals_halfplane."""
    from .geo import geo_polygon_count

    n = geo_polygon_count(_events_geo(sf_dir), "lat", "lon", GEO_POLY)
    return pa.table({"n": pa.array([n], pa.int64())})


def geo_bounds_q(sf_dir: str) -> pa.Table:
    """ES geo_bounds aggregation over the events within GEO_RADIUS_KM of
    GEO_ORIGIN: the tight box as e6-rounded ints (pure min/max on exact
    grid values — deterministic on both sides)."""
    from .geo import geo_bounds, geo_distance_filter

    within = geo_distance_filter(
        _events_geo(sf_dir), "lat", "lon", GEO_ORIGIN, GEO_RADIUS_KM
    )
    top, left, bottom, right, n = geo_bounds(within, "lat", "lon")
    # empty hit set: geo_bounds returns NaN sentinels; emit the same
    # (n=0, NULL box) row the SQL oracle's count/max-over-nothing yields
    # instead of crashing on int(round(nan))
    e6 = lambda v: None if n == 0 else int(np.round(v * 1e6))  # noqa: E731
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "top_e6": pa.array([e6(top)], pa.int64()),
        "left_e6": pa.array([e6(left)], pa.int64()),
        "bottom_e6": pa.array([e6(bottom)], pa.int64()),
        "right_e6": pa.array([e6(right)], pa.int64()),
    })


def geo_distance_ranges_q(sf_dir: str) -> pa.Table:
    """ES geo_distance aggregation: doc counts per distance ring around
    GEO_ORIGIN with boundaries GEO_RING_EDGES_KM ([from, to) buckets,
    keyed like the range agg)."""
    from .geo import geo_distance_range_counts

    rows = geo_distance_range_counts(
        _events_geo(sf_dir), "lat", "lon", GEO_ORIGIN, GEO_RING_EDGES_KM
    )
    return pa.table({
        "key": pa.array([k for k, _ in rows], pa.string()),
        "doc_count": pa.array([c for _, c in rows], pa.int64()),
    })


def geohash_grid_q(sf_dir: str) -> pa.Table:
    """ES geohash_grid aggregation at precision GEOHASH_PRECISION: top
    GEOHASH_TOP_N cells by doc count (count desc, geohash asc). The
    contract row carries the cell's integer (lon_bin, lat_bin) decoded
    from the geohash string so the SQL oracle can reproduce the cell by
    plain float binning — the string<->bins bijection is pinned by the
    public-vector tests in test_geo."""
    from .geo import geohash_decode_bins, geohash_grid

    cells = geohash_grid(
        _events_geo(sf_dir), "lat", "lon",
        precision=GEOHASH_PRECISION, top_n=GEOHASH_TOP_N,
    )
    bins = [geohash_decode_bins(h) for h, _ in cells]
    return pa.table({
        "lon_bin": pa.array([b[0] for b in bins], pa.int64()),
        "lat_bin": pa.array([b[1] for b in bins], pa.int64()),
        "doc_count": pa.array([c for _, c in cells], pa.int64()),
    })


GEO_LINE_SIZE = 16


def geo_line_q(sf_dir: str, k: int = 20) -> pa.Table:
    """ES geo_line aggregation analog: per user (group), the track of
    its event points ordered by event_id (the agg's sort field),
    truncated to the first GEO_LINE_SIZE points (ES geo_line's ``size``
    keeps the prefix in sort order). The contract row fingerprints the
    included prefix with EXACT integer coordinate sums (centidegree
    units, the _events_geo_path grid); rows ordered total-points desc,
    user asc, first ``k``. Same shuffle shape as way_shapes_q: one
    groupby on user_id, vectorized per-group kernel."""

    def line_kernel(g: pa.Table) -> pa.Table:
        eid = g["event_id"].combine_chunks().to_numpy()
        order = np.argsort(eid)  # event_id unique -> total order
        x = g["x"].combine_chunks().to_numpy()[order].astype(np.int64)
        y = g["y"].combine_chunks().to_numpy()[order].astype(np.int64)
        inc = min(x.size, GEO_LINE_SIZE)
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
            "n_total": pa.array([x.size], pa.int64()),
            "n_included": pa.array([inc], pa.int64()),
            "sum_x": pa.array([int(x[:inc].sum())], pa.int64()),
            "sum_y": pa.array([int(y[:inc].sum())], pa.int64()),
        })

    lines = (
        _events_geo_path(sf_dir)
        .groupby("user_id")
        .map_groups(line_kernel, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(lines.to_arrow_refs()) if b.num_rows]
    )
    keys = [("n_total", "descending"), ("user_id", "ascending")]
    return t.take(pc.sort_indices(t, sort_keys=keys).slice(0, k))


def _events_geo_path(sf_dir: str) -> rd.Dataset:
    """events + derived path vertices in integer centidegree units for
    the way-shape pipeline. UNLIKE _events_geo (whose lat is constant
    per user — fine for point queries, degenerate for polygons), both
    coordinates vary within a user here:

        y = (user_id*7919 + event_id*31) % 18000   # lat centi-units
        x = (event_id*104729) % 36000              # lon centi-units

    Exact int64 arithmetic; the SQL oracle repeats it verbatim."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].combine_chunks().to_numpy().astype(np.int64)
        uid = batch["user_id"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "y": pa.array((uid * 7919 + eid * 31) % 18000, pa.int64()),
            "x": pa.array((eid * 104729) % 36000, pa.int64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow")


def way_shapes_q(sf_dir: str, k: int = 20) -> pa.Table:
    """The ESWay/ESShape.build() pipeline (ESWay.java:18-33 +
    ESShape.java:160-228): each user's events, ordered by event_id, form
    one way's vertex list; the shape is classified POINT / LINESTRING /
    POLYGON (ESShape.java:176-187 — with the spec twist that EVEN user
    ids are closed by appending the first vertex, since derived grids
    rarely self-close), then planar degree-space length, shoelace area
    and the JTS area centroid are computed exactly as the reference
    converts them (degrees2Dist / degree2ToKm2).

    Determinism contract with the SQL oracle: shoelace cross terms,
    centroid numerators AND the length leg are EXACT integer sums over
    centidegree units (segments snap to micro-units via floor(x + 0.5)
    before summing; translation/scale handled in one final float
    sequence mirrored in the SQL) — no float-summation-order
    dependence anywhere. One groupby shuffle on user_id,
    vectorized per-group kernel (sessionize's shape); per-way vertex
    lists are small — a monster way would salt by vertex range first.

    Returns the k largest ways (area desc, length desc, user asc)."""
    from .geo import DEG_TO_KM

    def shape_kernel(g: pa.Table) -> pa.Table:
        eid = g["event_id"].combine_chunks().to_numpy()
        order = np.argsort(eid)  # event_id is unique -> total order
        x = g["x"].combine_chunks().to_numpy()[order].astype(np.int64)
        y = g["y"].combine_chunks().to_numpy()[order].astype(np.int64)
        uid = int(g["user_id"][0].as_py())
        n_pts = x.size
        nat_closed = n_pts > 1 and x[0] == x[-1] and y[0] == y[-1]
        if n_pts > 1 and uid % 2 == 0 and not nat_closed:
            x = np.append(x, x[0])
            y = np.append(y, y[0])
        closed = n_pts > 1 and (nat_closed or uid % 2 == 0)
        stype = ("POINT" if n_pts == 1
                 else "POLYGON" if closed else "LINESTRING")
        # exact-int squared lengths (centi-units < 2^53), then one
        # correctly-rounded sqrt each — bit-identical to the oracle's
        # sqrt((dx*dx + dy*dy)::DOUBLE); np.hypot would NOT be.
        # Each segment is then snapped to integer micro-units with
        # floor(x + 0.5) (identical per-double on numpy and DuckDB,
        # unlike round's half-even vs half-away split) so the length
        # total is an EXACT integer sum — no dependence on float
        # summation order between numpy pairwise and DuckDB sum()
        dx = np.diff(x)
        dy = np.diff(y)
        seg_u = np.floor(
            np.sqrt((dx * dx + dy * dy).astype(np.float64)) * 1e6 + 0.5
        ).astype(np.int64)
        # terms <= ~4.03e10 (max planar seg ~40250 centideg * 1e6):
        # int64-safe below ~2.2e8 segments, exact object sum above
        len_u = (int(seg_u.sum()) if seg_u.size < 200_000_000
                 else int(seg_u.astype(object).sum()))
        length_m = int(np.floor(
            float(len_u) / 1e6 / 100.0 * DEG_TO_KM * 1e3 + 0.5
        ))
        area_e6, clat_e6, clon_e6 = 0, None, None
        if closed:
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]  # exact int64
            # centroid numerator terms reach ~4.7e13 each, so a plain
            # int64 .sum() wraps silently past ~195k vertices; the SQL
            # oracle sums in HUGEINT. Accumulate exactly: fast int64
            # path for normal ways, arbitrary-precision Python-int path
            # above the safe bound (2**63 / 4.7e13 ~= 1.9e5 terms).
            def exact_sum(a: np.ndarray) -> int:
                if a.size < 150_000:
                    return int(a.sum())
                return int(a.astype(object).sum())

            s2 = exact_sum(cross)  # terms ~6.5e8: wrap needs ~1.4e10 pts
            area_km2 = abs(float(s2)) / 2.0 / 1e4 * (DEG_TO_KM * DEG_TO_KM)
            # floor(x + 0.5): big shoelace areas DO land on exact .5
            # ulps (hit at sf0.1), where np.round's half-even and SQL
            # round's half-away split — the snap convention used for
            # length_m is the one identical on both sides
            area_e6 = int(np.floor(area_km2 * 1e6 + 0.5))
            if s2 != 0:
                cx = float(exact_sum((x[:-1] + x[1:]) * cross)) / (3.0 * s2)
                cy = float(exact_sum((y[:-1] + y[1:]) * cross)) / (3.0 * s2)
                clat_e6 = int(np.floor((cy / 100.0 - 90.0) * 1e6 + 0.5))
                clon_e6 = int(np.floor((cx / 100.0 - 180.0) * 1e6 + 0.5))
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_pts": pa.array([n_pts], pa.int64()),
            "stype": pa.array([stype], pa.string()),
            "length_m": pa.array([length_m], pa.int64()),
            "area_e6": pa.array([area_e6], pa.int64()),
            "clat_e6": pa.array([clat_e6], pa.int64()),
            "clon_e6": pa.array([clon_e6], pa.int64()),
        })

    shapes = (
        _events_geo_path(sf_dir)
        .groupby("user_id")
        .map_groups(shape_kernel, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(shapes.to_arrow_refs()) if b.num_rows]
    )
    keys = [("area_e6", "descending"), ("length_m", "descending"),
            ("user_id", "ascending")]
    return t.take(pc.sort_indices(t, sort_keys=keys).slice(0, k))


def geotile_grid_q(sf_dir: str) -> pa.Table:
    """ES geotile_grid aggregation at zoom GEOTILE_ZOOM: top
    GEOTILE_TOP_N web-mercator tiles by doc count (count desc, then
    (x, y) asc). Tiles are exposed as integer (tile_x, tile_y) columns
    so the SQL oracle reproduces them with the same pinned double
    expression (mercator boundaries are transcendental in lat, so no
    grid point sits on one)."""
    from .geo import geotile_grid

    tiles = geotile_grid(
        _events_geo(sf_dir), "lat", "lon",
        zoom=GEOTILE_ZOOM, top_n=GEOTILE_TOP_N,
    )
    return pa.table({
        "tile_x": pa.array([t[0] for t in tiles], pa.int64()),
        "tile_y": pa.array([t[1] for t in tiles], pa.int64()),
        "doc_count": pa.array([t[2] for t in tiles], pa.int64()),
    })


def _events_geo_cluster(sf_dir: str) -> rd.Dataset:
    """events + derived CLUSTERED way vertices: each user's points sit
    inside a per-user box (center from user_id, per-user span cycling
    small..world-sized via ``user_id % 8``) so way envelopes range from
    tiny to env-covering and all four shape relations are populated:

        y = (user_id*7919) % 18000 + (event_id*31) % (100 + (user_id%8)*2600)
        x = (user_id*104729) % 36000 + (event_id*53) % (200 + (user_id%8)*5200)

    Planar (unwrapped) exact int64 coordinates; the SQL oracle repeats
    the expressions verbatim. _events_geo_path keeps the uniform scatter
    (right for the shape-math pipeline); this one exists because a
    scatter envelope always covers any fixed query box."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].combine_chunks().to_numpy().astype(np.int64)
        uid = batch["user_id"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "y": pa.array(
                (uid * 7919) % 18000 + (eid * 31) % (100 + (uid % 8) * 2600),
                pa.int64()),
            "x": pa.array(
                (uid * 104729) % 36000 + (eid * 53) % (200 + (uid % 8) * 5200),
                pa.int64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow")


def way_envelope_relations_q(sf_dir: str) -> pa.Table:
    """The GeoShape post-filter analog (ESNodeITest.java:61-130,
    ESWayITest.java:97-160: filter ways by a square shape, ES default
    relation INTERSECTS): classify every way's envelope against
    WAY_QUERY_ENV and count per relation class. Envelope build is a
    map-side combine (per-block per-user min/max partials) followed by
    one keyed groupby aggregate over the tiny partials — never a
    row-level shuffle; classification is a final vectorized pass.
    Exact integer centidegree coordinates end to end."""
    from .geo import envelope_relation

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].combine_chunks().to_numpy().astype(np.int64)
        x = batch["x"].combine_chunks().to_numpy().astype(np.int64)
        y = batch["y"].combine_chunks().to_numpy().astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, x, y = uid[order], x[order], y[order]
        users, starts = np.unique(uid, return_index=True)
        return pa.table({
            "user_id": pa.array(users),
            "ymin": pa.array(np.minimum.reduceat(y, starts)),
            "ymax": pa.array(np.maximum.reduceat(y, starts)),
            "xmin": pa.array(np.minimum.reduceat(x, starts)),
            "xmax": pa.array(np.maximum.reduceat(x, starts)),
        })

    envs = (
        _events_geo_cluster(sf_dir)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("ymin"), Max("ymax"), Min("xmin"), Max("xmax"))
    )

    def classify(batch: pa.Table) -> pa.Table:
        rel = envelope_relation(
            batch["min(ymin)"].combine_chunks().to_numpy(),
            batch["min(xmin)"].combine_chunks().to_numpy(),
            batch["max(ymax)"].combine_chunks().to_numpy(),
            batch["max(xmax)"].combine_chunks().to_numpy(),
            WAY_QUERY_ENV,
        )
        keys, counts = np.unique(rel.astype(str), return_counts=True)
        return pa.table({
            "relation": pa.array(keys.tolist(), pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    acc: dict[str, int] = {}
    for r in envs.map_batches(classify, batch_format="pyarrow").take_all():
        acc[r["relation"]] = acc.get(r["relation"], 0) + r["n"]
    rows = sorted(acc.items())
    return pa.table({
        "relation": pa.array([k for k, _ in rows], pa.string()),
        "n": pa.array([v for _, v in rows], pa.int64()),
    })


def events_top20_by_value(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k with secondary key (T1/T2): per-block partial top-k inside
    map_batches, then a driver merge of the tiny candidates — NO global
    sort shuffle for 20 rows (a ds.sort here is a full range-exchange)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("value", "descending"), ("event_id", "ascending")],
        )
        return batch.take(idx.slice(0, k))

    cands = pa.concat_tables(
        t for t in ray.get(
            ds.map_batches(local_topk, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    )
    idx = pc.sort_indices(
        cands, sort_keys=[("value", "descending"), ("event_id", "ascending")]
    )
    t = cands.take(idx.slice(0, k))
    return pa.table(
        {
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value_cents": pc.cast(
                pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
            ),
        }
    )


def dedup_exact_q(sf_dir: str):
    from .extras.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def dedup_minhash_q(sf_dir: str) -> pa.Table:
    from .extras.dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir))


def dedup_jaccard_q(sf_dir: str) -> pa.Table:
    """Exact n-gram Jaccard near-dup pairs (see
    extras.dedup.ngram_jaccard_pairs): every (lang, length-bucket)
    in-block pair exactly verified at threshold 0.5 — the
    deterministic recall-complete twin of the MinHash estimate."""
    from .extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang", "n_chars"],
        )
    )


def dedup_cluster_sizes_q(sf_dir: str) -> pa.Table:
    """Dedup audit report: the MinHash+LSH cluster-SIZE histogram
    (size -> number of clusters) — the curator-facing summary of how
    much duplication the corpus carries, derived from the labeling
    pass's O(docs) (doc_id, cluster_id) output."""
    t = dedup_minhash_q(sf_dir)
    if isinstance(t, rd.Dataset):
        t = pa.concat_tables(ray.get(t.to_arrow_refs()))
    sizes = t.group_by(["cluster_id"], use_threads=False).aggregate(
        [("cluster_id", "count")]
    ).rename_columns(["cluster_id", "sz"])
    hist = sizes.group_by(["sz"], use_threads=False).aggregate(
        [("sz", "count")]
    ).rename_columns(["sz", "n_clusters"])
    out = pa.table({
        "sz": pc.cast(hist["sz"], pa.int64()),
        "n_clusters": pc.cast(hist["n_clusters"], pa.int64()),
    })
    return out.take(pc.sort_indices(out, sort_keys=[("sz", "ascending")]))


def decontaminate_q(sf_dir: str) -> pa.Table:
    """Benchmark decontamination over `documents`: docs with
    doc_id % 17 == 0 play the eval set; every other doc is scored for
    distinct shared 3-shingles via the broadcast-membership pipeline
    (no shuffle, corpus streamed once)."""
    from .extras.decontam import decontaminate

    def _mod_filter(want_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 17 == 0) == want_bench))

        return f

    docs = _docs(sf_dir)
    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow")
    corpus = docs.map_batches(_mod_filter(False), batch_format="pyarrow")
    out = decontaminate(corpus, bench)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    return t.sort_by([("doc_id", "ascending")])


def decontaminate_by_source_q(sf_dir: str) -> pa.Table:
    """Per-SOURCE contamination report (the audit a data curator reads
    before dropping a provider): the decontamination pass's flags
    joined back to `source`, per-source doc/contaminated counts and a
    floor-e6 rate. The flag pass is the same broadcast-membership
    stream as decontaminate_ngrams; the join/groupby run over its
    O(corpus-row flags) output, never the text."""
    flags = decontaminate_q(sf_dir)
    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )
    j = flags.select(["doc_id", "contaminated"]).join(src, "doc_id")
    g = pa.table({
        "source": j["source"],
        "c": pc.cast(j["contaminated"], pa.int64()),
    }).group_by(["source"], use_threads=False).aggregate(
        [("c", "count"), ("c", "sum")]
    ).rename_columns(["source", "n_docs", "n_contaminated"])
    rate = pa.array(
        [
            int(np.floor(int(c) / int(n) * 1e6))
            for n, c in zip(g["n_docs"].to_pylist(),
                            g["n_contaminated"].to_pylist())
        ],
        pa.int64(),
    )
    out = pa.table({
        "source": g["source"],
        "n_docs": pc.cast(g["n_docs"], pa.int64()),
        "n_contaminated": pc.cast(g["n_contaminated"], pa.int64()),
        "rate_e6": rate,
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("source", "ascending")]
    ))


def dedup_simhash_q(sf_dir: str) -> pa.Table:
    from .extras.dedup import simhash_dedup

    return simhash_dedup(_docs(sf_dir))


def embedding_near_dup_q(sf_dir: str) -> pa.Table:
    from .extras.similarity import embedding_near_dup

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return embedding_near_dup(ds, threshold=0.95)


def knn_cosine_top10(sf_dir: str) -> pa.Table:
    from .extras.similarity import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(), dtype=np.float64
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_cosine(ds, qvec, k=10)
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cosine_sim_e6": pc.cast(
                pc.round(pc.multiply(t["cosine_sim"], 1e6)), pa.int64()
            ),
        }
    )


KNN_SQ_OVERSAMPLE = 3  # ES rescore_vector.oversample


def knn_int8_rescore_top10(sf_dir: str) -> pa.Table:
    """ES int8-quantized kNN with oversample+rescore: stage 1 ranks the
    corpus by the EXACT integer dot of per-dim min/max scalar-quantized
    codes (1 byte/dim scanned) and keeps k·oversample candidates; stage
    2 rescores only those with exact float cosine. Candidate selection
    is integer arithmetic, so the final set is bit-reproducible and the
    SQL twin replays it exactly."""
    from .extras.similarity import knn_int8_rescore

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_int8_rescore(ds, qvec, k=10, oversample=KNN_SQ_OVERSAMPLE)
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cosine_sim_e6": pc.cast(
                pc.round(pc.multiply(t["cosine_sim"], 1e6)), pa.int64()
            ),
        }
    )


KNN_BBQ_OVERSAMPLE = 4
KNN_MRL_DIMS = 8
KNN_MRL_OVERSAMPLE = 4


def knn_binary_rescore_top10(sf_dir: str) -> pa.Table:
    """ES BBQ-style binary-quantized kNN (sign-bit hamming candidate
    stage — exact integers, bit-reproducible — then exact cosine
    rescore of k·oversample candidates)."""
    from .extras.similarity import knn_binary_rescore

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_binary_rescore(ds, qvec, k=10, oversample=KNN_BBQ_OVERSAMPLE)
    return pa.table({
        "vec_id": t["vec_id"],
        "cosine_sim_e6": pc.cast(pc.floor(pc.add(
            pc.multiply(t["cosine_sim"], 1e6), 0.5)), pa.int64()),
    })


def knn_matryoshka_top10(sf_dir: str) -> pa.Table:
    """Matryoshka (MRL) truncated-dimension ANN: exact cosine over the
    first KNN_MRL_DIMS dims ranks candidates (dim/8 fewer bytes
    scanned), exact full-dim cosine rescores the k·oversample head."""
    from .extras.similarity import knn_matryoshka_rescore

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_matryoshka_rescore(
        ds, qvec, k=10, prefix_dims=KNN_MRL_DIMS,
        oversample=KNN_MRL_OVERSAMPLE,
    )
    return pa.table({
        "vec_id": t["vec_id"],
        "cosine_sim_e6": pc.cast(pc.floor(pc.add(
            pc.multiply(t["cosine_sim"], 1e6), 0.5)), pa.int64()),
    })


def _knn_metric_q(sf_dir: str, metric: str) -> pa.Table:
    from .extras.similarity import knn_metric

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_metric(ds, qvec, k=10, metric=metric)
    # floor(x + 0.5): the snap convention identical in numpy and
    # DuckDB (pc.round is half-even, SQL round half-away — they split
    # on exact .5 ulps, the way_shapes lesson)
    return pa.table({
        "vec_id": t["vec_id"],
        "score_e6": pc.cast(pc.floor(pc.add(
            pc.multiply(t["score"], 1e6), 0.5)), pa.int64()),
    })


def knn_l2_top10(sf_dir: str) -> pa.Table:
    """ES dense_vector similarity=l2_norm: exact top-10 by squared
    euclidean distance ascending (||v||^2 - 2 v.q + ||q||^2 — the
    pinned op order the SQL twin replays), vec_id ties ascending."""
    return _knn_metric_q(sf_dir, "l2_norm")


def knn_mip_top10(sf_dir: str) -> pa.Table:
    """ES dense_vector similarity=max_inner_product: exact top-10 by
    raw dot product descending."""
    return _knn_metric_q(sf_dir, "max_inner_product")


KNN_SIM_FLOOR = 0.25   # ES 8.8 knn `similarity` minimum
KNN_SIM_K = 50


def knn_similarity_cutoff(sf_dir: str) -> pa.Table:
    """ES 8.8 knn ``similarity`` floor: exact cosine search around the
    vec-0 query with candidates below KNN_SIM_FLOOR not matching. For
    an EXACT search, dropping below-floor candidates before k and
    post-filtering the top-k are the same set (both = the best
    min(k, |{sim >= floor}|) hits), so this rides knn_cosine + one
    filter; the floor cuts inside the top-KNN_SIM_K at every sf
    (picked against the real similarity tail, >= 6e-4 from any
    value). The same floor is a DSL knob (knn.similarity)."""
    from .extras.similarity import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_cosine(ds, qvec, k=KNN_SIM_K)
    t = t.filter(pc.greater_equal(t["cosine_sim"],
                                  pa.scalar(KNN_SIM_FLOOR)))
    return pa.table({
        "vec_id": t["vec_id"],
        "cosine_sim_e6": pc.cast(
            pc.round(pc.multiply(t["cosine_sim"], 1e6)), pa.int64()
        ),
    })


def knn_cosine_lsh_q(sf_dir: str) -> pa.Table:
    from .extras.similarity import knn_cosine_lsh

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(), dtype=np.float64
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_cosine_lsh(ds, qvec, k=10, n_planes=4)
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cosine_sim_e6": pc.cast(
                pc.round(pc.multiply(t["cosine_sim"], 1e6)), pa.int64()
            ),
        }
    )


def knn_cosine_ivf_q(sf_dir: str) -> pa.Table:
    """IVF over the PERSISTED per-centroid partition files; the index is
    built once and cached keyed by content fingerprint.

    The gate query probes ALL centroids (nprobe == n_centroids), which is
    EXACT by construction — so this row faces the same DuckDB top-k value
    oracle as brute force, verifying the partitioned storage round-trip
    (no vector lost or duplicated by the k-means split, probe ordering,
    per-partition reads, merge). The recall-tradeoff path (nprobe < C
    reads only the probed partition files) is pinned by
    tests/test_extras.py::test_ivf_reads_only_probed_partitions.
    """
    from .extras.similarity import knn_cosine_ivf

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    tag = hashlib.md5(
        f"{os.path.abspath(emb_path)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], 0))["embedding"][0].as_py(), dtype=np.float64
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    t = knn_cosine_ivf(
        ds, qvec, k=10, n_centroids=8, nprobe=8,
        index_dir=f"/tmp/rayfts_ivf/{tag}",
    )
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cosine_sim_e6": pc.cast(
                pc.round(pc.multiply(t["cosine_sim"], 1e6)), pa.int64()
            ),
        }
    )


def text_token_stats(sf_dir: str) -> rd.Dataset:
    from .extras.textstats import token_stats_batch

    return _docs(sf_dir).map_batches(
        token_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def text_quality(sf_dir: str) -> rd.Dataset:
    from .extras.textstats import quality_score_batch

    ds = _docs(sf_dir).map_batches(
        quality_score_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.map_batches(
        lambda t: t.select(["doc_id", "token_cnt", "stop_ratio", "quality"]),
        batch_format="pyarrow",
    )


def lang_id_q(sf_dir: str) -> rd.Dataset:
    from .extras.textstats import lang_id_batch

    return _docs(sf_dir).map_batches(
        lang_id_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def text_repetition_q(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition signals per document (dup-token /
    top-token / duplicate-2-gram fractions): one streaming map_batches
    pass, no shuffle."""
    from .extras.textstats import repetition_stats_batch

    return _docs(sf_dir).map_batches(
        repetition_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def terms_subagg_q(sf_dir: str, parent_n: int = 5, child_n: int = 3) -> pa.Table:
    """ES nested terms aggregation: terms agg on ``source`` with a terms
    SUB-aggregation on ``lang`` — top ``parent_n`` sources by doc count
    (count desc, key asc) and, within each, the top ``child_n`` langs
    (count desc, key asc). One pre-aggregation inside map_batches (per
    block, per (source, lang) counts — the combiner), then a tiny keyed
    groupby over the partials; ranking happens on the O(sources×langs)
    result table on the driver. Scale: rows shuffled = distinct pairs
    per block, never documents."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table(
            {"source": g["source"], "lang": g["lang"], "n": g["count_all"]}
        )

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "lang"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n"))
    )
    t = pa.concat_tables(
        [b for b in ray.get(parts.to_arrow_refs()) if b.num_rows]
    )
    src = t["source"].to_pylist()
    lang = t["lang"].to_pylist()
    cnt = t["sum(n)"].to_pylist()
    per_src: dict[str, int] = {}
    pairs: dict[str, list[tuple[str, int]]] = {}
    for s, lg, c in zip(src, lang, cnt):
        per_src[s] = per_src.get(s, 0) + int(c)
        pairs.setdefault(s, []).append((lg, int(c)))
    top_src = sorted(per_src.items(), key=lambda kv: (-kv[1], kv[0]))[:parent_n]
    rows = []
    for s, tot in top_src:
        kids = sorted(pairs[s], key=lambda kv: (-kv[1], kv[0]))[:child_n]
        for lg, c in kids:
            rows.append((s, tot, lg, c))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "source_count": pa.array([r[1] for r in rows], pa.int64()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "lang_count": pa.array([r[3] for r in rows], pa.int64()),
    })


MULTI_TERMS_TOP_N = 12
# max_doc_count sits between the planted rare term (df=25) and the
# Zipf body (~370+ of 500 docs at sf0.01) but below the densest terms,
# so the result exercises the df cut, asc ordering AND term tie-breaks
RARE_TERMS_MAX_DF = 380
RARE_TERMS_TOP_N = 20


def multi_terms_q(sf_dir: str) -> pa.Table:
    """ES multi_terms aggregation: doc counts per COMPOUND key
    (source, lang), top MULTI_TERMS_TOP_N buckets ordered count desc
    then keys asc — the flat compound-key cousin of terms_subagg. Same
    combiner shape: per-block pair counts, keyed groupby over partials,
    driver ranks the O(pairs) result."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table(
            {"source": g["source"], "lang": g["lang"], "n": g["count_all"]}
        )

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "lang"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n"))
    )
    t = pa.concat_tables(
        [b for b in ray.get(parts.to_arrow_refs()) if b.num_rows]
    )
    rows = sorted(
        zip(t["source"].to_pylist(), t["lang"].to_pylist(),
            (int(c) for c in t["sum(n)"].to_pylist())),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:MULTI_TERMS_TOP_N]
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "doc_count": pa.array([r[2] for r in rows], pa.int64()),
    })


def rare_terms_q(sf_dir: str) -> pa.Table:
    """ES rare_terms aggregation over the analyzed text: terms whose doc
    frequency is <= RARE_TERMS_MAX_DF (the ES max_doc_count knob),
    ordered df asc then term asc, first RARE_TERMS_TOP_N. Rides the
    map-side-combined term-stats pipeline — the long tail is exactly
    what the combiner ships cheaply (one partial row per distinct term
    per block)."""
    stats = fts_term_stats(sf_dir)

    def keep_rare(t: pa.Table) -> pa.Table:
        m = pc.less_equal(t["df"], RARE_TERMS_MAX_DF)
        t = t.filter(m)
        return pa.table({"term": t["term"], "df": t["df"]})

    t = pa.concat_tables(
        [b for b in ray.get(
            stats.map_batches(keep_rare, batch_format="pyarrow")
            .to_arrow_refs()
        ) if b.num_rows]
    )
    keys = [("df", "ascending"), ("term", "ascending")]
    return t.take(pc.sort_indices(t, sort_keys=keys).slice(0, RARE_TERMS_TOP_N))


def text_fingerprint_q(sf_dir: str) -> rd.Dataset:
    from .extras.textstats import fingerprint_batch

    return _docs(sf_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# round-5 batch 2: terms_enum API, sibling pipeline aggs, t_test,
# scripted_metric, has_parent join, sliced export
# ---------------------------------------------------------------------------

TERMS_ENUM_PREFIX = "s"   # term-dictionary paging probe (shared w/ oracle)
TERMS_ENUM_SIZE = 15


def fts_terms_enum(sf_dir: str) -> pa.Table:
    """ES _terms_enum API: first TERMS_ENUM_SIZE index terms with
    TERMS_ENUM_PREFIX, term-ascending, each with its dictionary df —
    the sorted-term paging call query UIs use for autocomplete."""
    s = Searcher(documents_index(sf_dir))
    rows = s.terms_enum(TERMS_ENUM_PREFIX, size=TERMS_ENUM_SIZE)
    return pa.table({
        "term": pa.array([t for t, _ in rows], pa.string()),
        "df": pa.array([d for _, d in rows], pa.int64()),
    })


def fts_date_hist_siblings(sf_dir: str) -> pa.Table:
    """ES sibling pipeline aggs (sum_bucket / avg_bucket / min_bucket /
    max_bucket / stats_bucket) NEXT TO the monthly date_histogram of
    BM25_QUERY hits: one summary row; extreme keys emitted as the ES
    keys ARRAY (comma-joined ascending — ties are legal)."""
    from .search import sibling_bucket_aggs

    s = Searcher(documents_index(sf_dir))
    agg = sibling_bucket_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month")
    )
    return pa.table({
        "n_buckets": pa.array([agg["n_buckets"]], pa.int64()),
        "sum_docs": pa.array([agg["sum"]], pa.int64()),
        "min_docs": pa.array([agg["min"]], pa.int64()),
        "max_docs": pa.array([agg["max"]], pa.int64()),
        "avg_e6": pa.array(
            [int(round(agg["sum"] / agg["n_buckets"] * 1e6))], pa.int64()
        ),
        "min_keys": pa.array(
            [",".join(str(k) for k in agg["min_keys"])], pa.string()
        ),
        "max_keys": pa.array(
            [",".join(str(k) for k in agg["max_keys"])], pa.string()
        ),
    })


T_TEST_LANG_A = "en"
T_TEST_LANG_B = "de"


def fts_t_test(sf_dir: str) -> pa.Table:
    """ES t_test aggregation (heteroscedastic / Welch — the ES default)
    over n_chars of BM25_QUERY hits, population A = lang en vs B = de.
    Emits the exact sufficient statistics plus t (e6) — the engine's
    pinned divergence: the statistic, not the p-value (no t-CDF in SQL)."""
    s = Searcher(documents_index(sf_dir))
    r = s.t_test_agg(
        BM25_QUERY, "n_chars",
        {"lang": T_TEST_LANG_A}, {"lang": T_TEST_LANG_B},
    )
    return pa.table({
        "n_a": pa.array([r["n_a"]], pa.int64()),
        "n_b": pa.array([r["n_b"]], pa.int64()),
        "sum_a": pa.array([int(r["sum_a"])], pa.int64()),
        "sum_b": pa.array([int(r["sum_b"])], pa.int64()),
        "sum_sq_a": pa.array([int(r["sum_sq_a"])], pa.int64()),
        "sum_sq_b": pa.array([int(r["sum_sq_b"])], pa.int64()),
        "t_e6": pa.array([int(round(r["t"] * 1e6))], pa.int64()),
    })


def fts_scripted_metric(sf_dir: str) -> pa.Table:
    """ES scripted_metric aggregation: per-shard map script gathers the
    exact (n, Σx, Σy, Σxy) moments of (src_doc_id, n_chars) over the
    BM25_QUERY hit set (vectorized numpy, ints exact), the reduce script
    folds shards and emits the covariance NUMERATOR n·Σxy − Σx·Σy — a
    statistic no built-in agg covers, which is the point of the API."""
    s = Searcher(documents_index(sf_dir))

    def map_script(fields):
        x = fields("src_doc_id").astype(np.int64)
        y = fields("n_chars").astype(np.int64)
        return (int(x.size), int(x.sum()), int(y.sum()),
                int((x * y).sum()))

    def reduce_script(states):
        n = sum(st[0] for st in states)
        sx = sum(st[1] for st in states)
        sy = sum(st[2] for st in states)
        sxy = sum(st[3] for st in states)
        return {"n": n, "sum_x": sx, "sum_y": sy,
                "cov_num": n * sxy - sx * sy}

    r = s.scripted_metric(BM25_QUERY, map_script, reduce_script)
    return pa.table({
        "n": pa.array([r["n"]], pa.int64()),
        "sum_x": pa.array([r["sum_x"]], pa.int64()),
        "sum_y": pa.array([r["sum_y"]], pa.int64()),
        "cov_num": pa.array([r["cov_num"]], pa.int64()),
    })


HAS_PARENT_CHILD_LANG = "en"   # child-side filter of the has_parent probe


def fts_has_parent(sf_dir: str) -> pa.Table:
    """ES has_parent query over the source join field: top-10 children
    (lang=en) of the parents matching BM25_QUERY, each child scored by
    its parent's group score (max child BM25 — the score:true mode),
    order (parent score desc, doc asc)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.has_parent_search(
        BM25_QUERY, "source", k=10,
        child_where={"lang": HAS_PARENT_CHILD_LANG},
    )
    dense_to_src = _dense_to_src(documents_index(sf_dir))
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _, _ in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc, _ in rows], pa.int64()
        ),
        "parent": pa.array([p for _, _, p in rows], pa.string()),
    })


EXPORT_SLICE_ID = 1
EXPORT_SLICE_MAX = 3


def fts_export_slice(sf_dir: str) -> rd.Dataset:
    """ES sliced-scroll analog: slice EXPORT_SLICE_ID of
    EXPORT_SLICE_MAX of the BM25_QUERY hit export — dense doc_id % max
    partitioning, so independent consumers split one result set and
    their union is exactly fts_export_hits."""
    from .export import export_hits

    index_dir = documents_index(sf_dir)
    ds = export_hits(
        index_dir, BM25_QUERY, columns=["src_doc_id", "lang"],
        slice_id=EXPORT_SLICE_ID, slice_max=EXPORT_SLICE_MAX,
    )

    def present(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["src_doc_id"], "lang": t["lang"]})

    return ds.map_batches(present, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# round-5 batch 3: PII redaction + sequence packing (training-data prep)
# ---------------------------------------------------------------------------

PACK_BUDGET = 2048       # tokens per context window (packing probe)
PACK_BUCKET_DOCS = 64    # small buckets force the multi-bucket prefix path


def text_redact(sf_dir: str) -> rd.Dataset:
    """PII redaction over the documents corpus. The synthetic corpus
    carries no PII, so each doc is augmented with DETERMINISTIC spans
    derived from doc_id (the ts_epoch precedent — same constants both
    sides): an email, an IPv4, a phone. The redaction stage itself is
    the real vectorized RE2 kernel chain (count + replace per pattern,
    in order, no Python rows)."""
    from .extras.redact import redact_batch

    def aug_and_redact(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        s = ids.astype(str)
        o1 = ((ids // 256) % 256).astype(str)
        o2 = (ids % 256).astype(str)
        ph = np.char.zfill((ids % 10_000_000).astype(str), 7)
        txt = t["text"].to_numpy(zero_copy_only=False).astype(str)
        aug = txt
        for piece in (" contact user", s, "@example.com via 10.0.",
                      o1, ".", o2, " call +1555", ph):
            aug = np.char.add(aug, piece)
        return redact_batch(
            pa.table({"doc_id": t["doc_id"],
                      "text": pa.array(aug, pa.string())})
        )

    return _docs(sf_dir).map_batches(
        aug_and_redact, batch_format="pyarrow", zero_copy_batch=True
    )


def pack_chunk_stats(sf_dir: str) -> pa.Table:
    """Sequence packing: token-budget chunk assignment in doc_id order
    (chunk = exclusive token prefix sum // PACK_BUDGET — contiguous,
    never splits a doc), summarized per chunk. Distributed two-pass
    prefix scan: O(buckets) on the driver, bounded-group shuffle."""
    from .extras.packing import chunk_stats

    return chunk_stats(
        _docs(sf_dir), budget=PACK_BUDGET, bucket_docs=PACK_BUCKET_DOCS
    )


# ---------------------------------------------------------------------------
# round-5 batch 4: hybrid retrieval (ES 8 top-level knn + query)
# ---------------------------------------------------------------------------

HYBRID_KNN_K = 20       # knn section size (the ES `k` under `knn`)
HYBRID_KNN_BOOST = 2.0  # knn section boost
HYBRID_QUERY_VEC = 0    # query vector = embeddings row 0 (deterministic)


PQ_SUBSPACES = 2   # PQ: m contiguous subspaces
PQ_CODES = 4       # PQ: k centroids per subspace (m*log2 k bits/vec)


def pq_adc_top10(sf_dir: str) -> pa.Table:
    """Product-quantization ADC retrieval over the embeddings table:
    train PQ_SUBSPACES deterministic per-subspace codebooks (the pinned
    Lloyd spec), compress every vector to PQ codes, and answer the
    query (vector = embeddings row HYBRID_QUERY_VEC) by asymmetric
    distance — a [m, k] lookup table gathered over uint8 codes. The
    memory-scale ANN path: at 10^12 vectors the scan touches m bytes
    per vector, not dim floats."""
    from .extras.similarity import pq_adc_search, pq_encode, pq_train

    import pyarrow.dataset as pads

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = rd.read_parquet(emb_path)
    books = pq_train(emb, m_subspaces=PQ_SUBSPACES, k_codes=PQ_CODES,
                     iters=KMEANS_ITERS)
    codes = pq_encode(emb, books)
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    t = pq_adc_search(codes, books, qvec, k=10)
    return pa.table({
        "vec_id": pa.array(t["vec_id"].to_pylist(), pa.int64()),
        "adc_e6": pa.array(
            [int(np.round(d * 1e6))
             for d in t["adc_dist"].to_pylist()],
            pa.int64(),
        ),
    })


PASSAGE_WIDTH = 6    # tokens per RAG passage window
PASSAGE_STRIDE = 4   # window start step (overlap = width - stride)


def passage_chunk_stats(sf_dir: str) -> rd.Dataset:
    """Token-window passage chunking of documents (RAG prep): one
    row per overlapping passage — (doc_id, passage_id, n_tokens,
    passage_md5), the md5 fingerprinting the space-joined analyzed
    tokens so the oracle can value-check passage CONTENT without
    shipping strings."""
    from .extras.packing import chunk_passages

    return chunk_passages(
        _docs(sf_dir), width=PASSAGE_WIDTH, stride=PASSAGE_STRIDE
    )


KNN_FILTER_LANG = "en"   # the knn.filter restriction of the gate query


def knn_filtered_top10(sf_dir: str) -> pa.Table:
    """ES 8 filtered kNN (`knn.filter`) — PRE-filtering semantics:
    exact top-10 by cosine among vectors whose document has
    lang == KNN_FILTER_LANG (post-filtering a plain top-k can starve
    below k; this never does). The allowed-id set comes from one
    pruned documents read and broadcasts as a packed bitmask."""
    import pyarrow.dataset as pads

    from .extras.similarity import knn_cosine_filtered

    docs = pads.dataset(
        os.path.join(sf_dir, "documents.parquet")
    ).to_table(columns=["doc_id", "lang"])
    allowed = docs.filter(
        pc.equal(docs["lang"], KNN_FILTER_LANG)
    )["doc_id"].to_numpy()
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    t = knn_cosine_filtered(
        rd.read_parquet(emb_path), qvec, allowed, k=10
    )
    return pa.table({
        "vec_id": pa.array(t["vec_id"].to_pylist(), pa.int64()),
        "cos_e6": pa.array(
            [int(round(c * 1e6)) for c in t["cosine_sim"].to_pylist()],
            pa.int64(),
        ),
    })


PQ_IVF_CENTROIDS = 8   # coarse lists in the IVF-PQ gate query


def pq_ivf_adc_top10(sf_dir: str) -> pa.Table:
    """IVF-PQ retrieval (Faiss IndexIVFPQ shape): coarse partition
    routing over code-only partition files + ADC within. The gate
    query probes ALL centroids, so the result is EXACT ADC — identical
    to pq_adc_top10's oracle — while the probe-pruned read path is
    what executes (partition files hold m uint8 codes per vector,
    never the vectors)."""
    import tempfile

    import pyarrow.dataset as pads

    from .extras.similarity import build_ivfpq_index, ivfpq_search

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    idx = os.path.join(
        tempfile.gettempdir(),
        f"rayfts_ivfpq_{abs(hash(os.path.abspath(sf_dir))) % 10**8}",
    )
    if not os.path.exists(os.path.join(idx, "ivfpq.json")):
        build_ivfpq_index(
            rd.read_parquet(emb_path), idx,
            n_centroids=PQ_IVF_CENTROIDS, m_subspaces=PQ_SUBSPACES,
            k_codes=PQ_CODES, iters=KMEANS_ITERS,
        )
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    t = ivfpq_search(idx, qvec, k=10, nprobe=PQ_IVF_CENTROIDS)
    return pa.table({
        "vec_id": pa.array(t["vec_id"].to_pylist(), pa.int64()),
        "adc_e6": pa.array(
            [int(np.round(d * 1e6)) for d in t["adc_dist"].to_pylist()],
            pa.int64(),
        ),
    })


RRF_WINDOW = 40   # rank_window_size per retriever list
RRF_RANK_K = 60   # the ES rank_constant default


def fts_rrf_top10(sf_dir: str) -> pa.Table:
    """ES retriever-API rrf analog (the ES 8.8+ hybrid default):
    reciprocal-rank fusion of the BM25_QUERY ranking and the cosine-kNN
    ranking (query vector = embeddings row HYBRID_QUERY_VEC), each
    truncated to RRF_WINDOW; fused = Σ 1/(RRF_RANK_K + rank). Rank
    arithmetic only — no score normalization, the point of RRF."""
    import pyarrow.dataset as pads

    from .extras.similarity import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    knn = knn_cosine(rd.read_parquet(emb_path), qvec, k=RRF_WINDOW)

    index_dir = documents_index(sf_dir)
    dense_to_src = _dense_to_src(index_dir)
    src_to_dense = np.zeros(dense_to_src.size, dtype=np.int64)
    src_to_dense[dense_to_src] = np.arange(dense_to_src.size)
    # order-preserving map: the ANN stage's (cos desc, vec_id) ranking
    # IS the knn rank list
    knn_ranked = [int(src_to_dense[v])
                  for v in knn["vec_id"].to_pylist()]
    s = Searcher(index_dir)
    rows = s.rrf_search(BM25_QUERY, knn_ranked, k=10,
                        rank_window=RRF_WINDOW, rrf_k=RRF_RANK_K)
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in rows], pa.int64()
        ),
        "fused_e9": pa.array(
            [int(round(sc * 1e9)) for _, sc in rows], pa.int64()
        ),
    })


LINEAR_TEXT_W = 1.0   # linear-retriever weights
LINEAR_KNN_W = 2.0


def fts_linear_retriever_top10(sf_dir: str) -> pa.Table:
    """ES retriever-API `linear` analog: minmax-normalize each
    retriever's top-RRF_WINDOW scores independently, then weighted sum
    (text 1.0, knn 2.0) — the score-calibrated hybrid beside rrf's
    rank-based one."""
    import pyarrow.dataset as pads

    from .extras.similarity import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    knn = knn_cosine(rd.read_parquet(emb_path), qvec, k=RRF_WINDOW)

    index_dir = documents_index(sf_dir)
    dense_to_src = _dense_to_src(index_dir)
    src_to_dense = np.zeros(dense_to_src.size, dtype=np.int64)
    src_to_dense[dense_to_src] = np.arange(dense_to_src.size)
    knn_hits = [
        (int(src_to_dense[v]), float(c))
        for v, c in zip(knn["vec_id"].to_pylist(),
                        knn["cosine_sim"].to_pylist())
    ]
    s = Searcher(index_dir)
    rows = s.linear_retriever_search(
        BM25_QUERY, knn_hits, k=10, rank_window=RRF_WINDOW,
        text_weight=LINEAR_TEXT_W, knn_weight=LINEAR_KNN_W,
    )
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in rows], pa.int64()
        ),
        "combined_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
        ),
    })


def fts_hybrid_knn(sf_dir: str) -> pa.Table:
    """ES 8 hybrid retrieval: top-level `knn` (cosine top-HYBRID_KNN_K
    over the embeddings table — the DISTRIBUTED ANN stage, per-block
    matmul + driver merge of O(k) candidates) combined with `query`
    (BM25_QUERY); scores of the two sections ADD for docs in both —
    the ES sum rule. vec_id joins documents.doc_id; the src->dense
    mapping is carried explicitly, never assumed."""
    import pyarrow.dataset as pads

    from .extras.similarity import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    knn = knn_cosine(rd.read_parquet(emb_path), qvec, k=HYBRID_KNN_K)

    index_dir = documents_index(sf_dir)
    dense_to_src = _dense_to_src(index_dir)
    src_to_dense = np.zeros(dense_to_src.size, dtype=np.int64)
    src_to_dense[dense_to_src] = np.arange(dense_to_src.size)
    knn_hits = [
        (int(src_to_dense[v]), float(c))
        for v, c in zip(knn["vec_id"].to_pylist(),
                        knn["cosine_sim"].to_pylist())
    ]
    s = Searcher(index_dir)
    rows = s.knn_hybrid_search(
        BM25_QUERY, knn_hits, k=10, knn_boost=HYBRID_KNN_BOOST
    )
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
        ),
    })


VAR_WIDTH_BUCKETS = 5


def fts_var_width_hist(sf_dir: str) -> pa.Table:
    """ES variable_width_histogram over n_chars of BM25_QUERY hits —
    the engine's deterministic exact-1D-k-means variant (ES's own
    output is collection-order-dependent, so there is no SQL oracle;
    the pytest twin proves DP optimality by exhaustive partition
    enumeration)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.variable_width_histogram_agg(
        BM25_QUERY, "n_chars", buckets=VAR_WIDTH_BUCKETS
    )
    return pa.table({
        "bucket": pa.array(range(len(rows)), pa.int64()),
        "vmin": pa.array([int(r[0]) for r in rows], pa.int64()),
        "vmax": pa.array([int(r[1]) for r in rows], pa.int64()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
        "total": pa.array([int(r[3]) for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# round-5 batch 6: ES similarity modules (the mapping-level `similarity`
# setting — reference-era ES defaulted to Lucene classic TF-IDF)
# ---------------------------------------------------------------------------


def _sim_table(sf_dir: str, similarity: str) -> pa.Table:
    s = Searcher(documents_index(sf_dir))
    rows = s.search_similarity(BM25_QUERY, k=10, similarity=similarity)
    dense_to_src = _dense_to_src(documents_index(sf_dir))
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
        ),
    })


def fts_lmd_top10(sf_dir: str) -> pa.Table:
    """LM Dirichlet similarity (Lucene LMDirichletSimilarity, mu=2000)
    over BM25_QUERY — same index, different scoring model."""
    return _sim_table(sf_dir, "lmd")


def fts_classic_top10(sf_dir: str) -> pa.Table:
    """Lucene classic TF-IDF (the reference-era ES default similarity):
    coord * sum(sqrt(tf) * idf^2) / sqrt(dl), queryNorm omitted
    (rank-invariant), norms exact (no byte quantization)."""
    return _sim_table(sf_dir, "classic")


def fts_boolean_top10(sf_dir: str) -> pa.Table:
    """BooleanSimilarity: score = matched clause count (boost sum)."""
    return _sim_table(sf_dir, "boolean")


# ---------------------------------------------------------------------------
# round-5 batch 7: unigram-LM cross-entropy quality signal (distributed
# hash join on term — the stats side is vocab-sized, too big to broadcast
# at web scale, so this is the repo's true shuffle-join shape)
# ---------------------------------------------------------------------------


def unigram_xent_ds(sf_dir: str) -> rd.Dataset:
    """Distributed core of text_unigram_xent: Dataset(doc_id, dl,
    xent_e6) with the per-doc cross-entropy as an e6-rounded INTEGER —
    the form downstream consumers (perplexity bucketing) can bin with
    exact parity. Same stages as the table twin below."""
    stats = fts_term_stats(sf_dir)
    tc = float(
        stats.map_batches(
            lambda t: pa.table(
                {"cf_p": pa.array([pc.sum(t["cf"]).as_py() or 0],
                                  pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("cf_p")
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        tf, _ = analyze_batch(batch)
        return tf.select(["doc_id", "term", "tf"])

    joined = (
        _docs(sf_dir)
        .map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
        .join(
            stats.map_batches(
                lambda t: t.select(["term", "cf"]), batch_format="pyarrow"
            # .repartition: normalize possible 0-column empty blocks out
            # of the groupby-output right side (Ray 2.49 join crash —
            # see text_bigram_xent)
            ).repartition(8),
            join_type="inner", num_partitions=8, on=("term",),
        )
    )

    def partials(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        cf = t["cf"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "tf_p": pc.cast(t["tf"], pa.int64()),
            "s_p": pa.array(tf * -np.log(cf / tc), pa.float64()),
        })

    def finish(t: pa.Table) -> pa.Table:
        dl = t["sum(tf_p)"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = t["sum(s_p)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "dl": pa.array(dl),
            "xent_e6": pa.array(
                np.round(s / dl * 1e6).astype(np.int64)
            ),
        })

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("tf_p"), Sum("s_p"))
        .map_batches(finish, batch_format="pyarrow")
    )


def text_unigram_xent(sf_dir: str) -> pa.Table:
    """Corpus-LM quality scoring: per-doc unigram cross-entropy
    xent(d) = Σ_t tf(d,t) · (−ln(cf(t)/TC)) / dl(d) — high values flag
    rare-token-heavy (noisy) docs, low values boilerplate; the classic
    cheap LM filter for pretraining corpora. Pipeline: map-side tf rows
    → vocab stats (map-combine + term groupby, the fts_term_stats
    machinery) → DISTRIBUTED hash join on term (vocab is unbounded at
    corpus scale — never a broadcast) → per-doc groupby sum. Empty docs
    drop (inner-join semantics, as in the SQL twin)."""
    t = pa.concat_tables([
        b for b in ray.get(unigram_xent_ds(sf_dir).to_arrow_refs())
        if b.num_rows
    ])
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


PPL_BINS = 4   # CCNet-style perplexity quartiles


def perplexity_bucket_counts(sf_dir: str) -> pa.Table:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): the
    per-doc LM cross-entropy (text_unigram_xent's exact e6-INTEGER
    score) cut into PPL_BINS exact ntiles — the head/middle/tail split
    a pretraining mix filters on. Per-bin doc counts + exact score
    sums fingerprint the assignment. Composition: the distributed xent
    Dataset feeds the exact-ntile sampler on an integer column, so
    bit-parity with the SQL window twin is inherited from both
    parents; rows never shuffle (ntile_bins' histogram + broadcast
    passes)."""
    from .extras.sampling import ntile_bins

    binned = ntile_bins(
        unigram_xent_ds(sf_dir).map_batches(
            lambda t: t.select(["doc_id", "xent_e6"]),
            batch_format="pyarrow",
        ),
        value_col="xent_e6", key_col="doc_id", n_bins=PPL_BINS,
    )
    out = (
        binned.groupby("bin")
        .aggregate(Count(), Sum("xent_e6"))
        .to_pandas()
        .sort_values("bin")
    )
    return pa.table({
        "bin": pa.array(out["bin"].astype("int64")),
        "n_docs": pa.array(out["count()"].astype("int64")),
        "sum_xent_e6": pa.array(out["sum(xent_e6)"].astype("int64")),
    })


FUZZY_OSA_QUERY = "saprk"   # transposed 'spark': OSA distance 1, plain 2


def fts_fuzzy_osa_docs(sf_dir: str) -> pa.Table:
    """ES-default fuzzy matching (transpositions=true — OSA metric):
    docs within ONE OSA edit of FUZZY_OSA_QUERY. The probe is a
    transposed vocabulary word, so the plain-Levenshtein path finds
    nothing at max_edits=1 while OSA matches — pinning the metric. At
    max_edits=1 OSA == full Damerau-Levenshtein, so DuckDB's
    damerau_levenshtein() is an exact oracle."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.fuzzy_docs(FUZZY_OSA_QUERY, max_edits=1, limit=20,
                        transpositions=True)
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
        "n_terms": pa.array([n for _, n in rows], pa.int64()),
    })


SPAN_LITTLE = "hash"    # little clause of span_within / span_containing


def fts_span_containing_docs(sf_dir: str) -> pa.Table:
    """ES span_containing: SPAN_TERMS chains (slop SPAN_SLOP) that
    enclose a SPAN_LITTLE occurrence; per-doc surviving chain count."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_containing_docs(
        list(SPAN_TERMS), SPAN_SLOP, SPAN_LITTLE, limit=20
    )
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "n_matches": pa.array([c for _, c in rows], pa.int64()),
    })


def fts_span_within_docs(sf_dir: str) -> pa.Table:
    """ES span_within — the dual: SPAN_LITTLE occurrences enclosed by a
    SPAN_TERMS chain; per-doc enclosed occurrence count."""
    s = Searcher(documents_index(sf_dir))
    rows = s.span_within_docs(
        SPAN_LITTLE, list(SPAN_TERMS), SPAN_SLOP, limit=20
    )
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "n_matches": pa.array([c for _, c in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# round-5 batch 8: corpus bigram statistics (tokenizer-merge prep — the
# BPE first-merge statistic at corpus scale)
# ---------------------------------------------------------------------------

BIGRAM_TOP_N = 15


def _bigram_rows(batch: pa.Table, per_doc: bool) -> pa.Table:
    """Adjacent-pair rows: corpus counts (w1, w2, c) or per-doc tfs
    (doc_id, w1, w2, tf) — one analyzer pass, pairs never cross docs."""
    from .analysis import tokens_flat

    flat, parent = tokens_flat(batch["text"])
    empty_cols = {"w1": pa.array([], pa.string()),
                  "w2": pa.array([], pa.string())}
    if len(flat) < 2:
        if per_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             **empty_cols,
                             "tf": pa.array([], pa.int64())})
        return pa.table({**empty_cols, "c": pa.array([], pa.int64())})
    adj = parent[1:] == parent[:-1]
    cols = {
        "w1": flat.slice(0, len(flat) - 1).filter(pa.array(adj)),
        "w2": flat.slice(1).filter(pa.array(adj)),
    }
    if per_doc:
        ids = batch["doc_id"].combine_chunks().take(
            pa.array(parent[1:][adj])
        )
        t = pa.table({"doc_id": ids, **cols})
        g = t.group_by(["doc_id", "w1", "w2"], use_threads=False) \
             .aggregate([("w1", "count")])
        return g.rename_columns(["doc_id", "w1", "w2", "tf"])
    g = pa.table(cols).group_by(["w1", "w2"], use_threads=False) \
          .aggregate([("w1", "count")])
    return g.rename_columns(["w1", "w2", "c"])


def text_bigram_xent(sf_dir: str) -> pa.Table:
    """Bigram-LM quality scoring — the conditional upgrade of
    text_unigram_xent: xent(d) = Σ_pairs tf(d,w1w2) ·
    (−ln(cf(w1,w2) / cf1(w1))) / n_pairs(d), where cf1(w1) sums the
    corpus bigram counts left-marginally (the MLE p(w2|w1) — the
    KenLM-style fluency filter, exact instead of smoothed). Docs with
    < 2 tokens drop (no pairs — the SQL twin's inner joins agree).

    Pipeline: per-doc pair tfs and corpus pair counts are two
    map-combined passes over the same analyzer output; the conditional
    join is DISTRIBUTED on (w1, w2) then w1 (bigram vocab is unbounded
    at corpus scale — never a broadcast); one per-doc groupby sum."""
    docs = _docs(sf_dir)
    bg = (
        docs.map_batches(
            lambda b: _bigram_rows(b, per_doc=False),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("c"))
        .map_batches(
            lambda t: pa.table({
                "w1": t["w1"], "w2": t["w2"],
                "cf2": pc.cast(t["sum(c)"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
    lm = (
        bg.map_batches(
            lambda t: t.select(["w1", "cf2"]), batch_format="pyarrow"
        )
        .groupby("w1")
        .aggregate(Sum("cf2"))
        .map_batches(
            lambda t: pa.table({
                "w1": t["w1"],
                "cf1": pc.cast(t["sum(cf2)"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
    joined = (
        docs.map_batches(
            lambda b: _bigram_rows(b, per_doc=True),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # Ray 2.49: hash-shuffle outputs (join/groupby) can carry
        # 0-column empty partition blocks that crash a downstream
        # join's acero key lookup; a no-shuffle repartition rebuilds
        # them with the real schema
        .join(bg.repartition(8), join_type="inner", num_partitions=8,
              on=("w1", "w2"))
        .repartition(8)
        .join(lm.repartition(8), join_type="inner", num_partitions=8,
              on=("w1",))
    )

    def partials(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        cf2 = t["cf2"].to_numpy(zero_copy_only=False).astype(np.float64)
        cf1 = t["cf1"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "tf_p": pc.cast(t["tf"], pa.int64()),
            "s_p": pa.array(tf * -np.log(cf2 / cf1), pa.float64()),
        })

    agg = (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("tf_p"), Sum("s_p"))
        .to_pandas()
        .sort_values("doc_id")
    )
    nb = agg["sum(tf_p)"].to_numpy().astype(np.int64)
    s = agg["sum(s_p)"].to_numpy()
    return pa.table({
        "doc_id": pa.array(agg["doc_id"].to_numpy().astype(np.int64)),
        "n_pairs": pa.array(nb),
        "xent_e6": pa.array(np.round(s / nb * 1e6).astype(np.int64)),
    })


BPE_MERGES = 10   # tokenizer-training merge rounds in the gate query


def bpe_merge_table(sf_dir: str) -> pa.Table:
    """Distributed BPE tokenizer training over documents (the full
    iterative merge loop — vocab_top_bigrams is round 1's statistic):
    BPE_MERGES deterministic merges, each one vocab-Dataset pass + an
    exact pair groupby; the corpus is read once. No SQL twin (the
    left-greedy merge scan is an iterative algorithm outside relational
    expressibility — rows-only check); conformance is pinned by the
    sequential-reference test."""
    from .extras.bpe import bpe_train

    merges = bpe_train(_docs(sf_dir), BPE_MERGES)
    return pa.table({
        "merge_idx": pa.array(range(len(merges)), pa.int64()),
        "a": pa.array([m[0] for m in merges], pa.string()),
        "b": pa.array([m[1] for m in merges], pa.string()),
        "n": pa.array([m[2] for m in merges], pa.int64()),
    })


def vocab_top_bigrams(sf_dir: str) -> pa.Table:
    """Top adjacent token pairs corpus-wide (n desc, pair asc) — the
    statistic a BPE/merge-table trainer computes each round. Map-side
    combine (one row per distinct pair per batch, never per occurrence),
    one (w1, w2) groupby shuffle, then EXACT top-N without a global
    sort: after the groupby each pair exists once, so any global top-N
    row is inside its block's local top-N — blocks ship O(N) candidate
    rows to the driver. 2-grams never cross doc boundaries."""
    from .analysis import tokens_flat

    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(batch["text"])
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        adj = parent[1:] == parent[:-1]
        t = pa.table({
            "w1": flat.slice(0, len(flat) - 1).filter(pa.array(adj)),
            "w2": flat.slice(1).filter(pa.array(adj)),
        })
        g = t.group_by(["w1", "w2"], use_threads=False).aggregate(
            [("w1", "count")]
        )
        return g.rename_columns(["w1", "w2", "c"])

    def local_top(t: pa.Table) -> pa.Table:
        keys = [("n", "descending"), ("w1", "ascending"),
                ("w2", "ascending")]
        return t.take(pc.sort_indices(t, sort_keys=keys)
                      .slice(0, BIGRAM_TOP_N))

    agg = (
        _docs(sf_dir)
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .aggregate(Sum("c"))
        .map_batches(
            lambda t: local_top(pa.table({
                "w1": t["w1"], "w2": t["w2"],
                "n": pc.cast(t["sum(c)"], pa.int64()),
            })),
            batch_format="pyarrow",
        )
    )
    t = pa.concat_tables(
        [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    )
    keys = [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    return t.take(pc.sort_indices(t, sort_keys=keys)
                  .slice(0, BIGRAM_TOP_N))


KMEANS_K = 4
KMEANS_ITERS = 2


def embedding_kmeans_sizes(sf_dir: str) -> pa.Table:
    """Distributed Lloyd k-means over the embeddings table (k=KMEANS_K,
    KMEANS_ITERS iterations, deterministic smallest-id init and
    smallest-id tie-break) — the embedding-clustering stage before
    per-cluster sampling/dedup. Emits final cluster sizes; the SQL twin
    unrolls the same two iterations as CTEs."""
    from .extras.similarity import kmeans_lloyd

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _, assigns = kmeans_lloyd(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    out = (
        assigns.groupby("cluster").count().to_pandas()
        .sort_values("cluster")
    )
    return pa.table({
        "cluster": pa.array(out["cluster"].astype("int64")),
        "n_vecs": pa.array(out["count()"].astype("int64")),
    })


MIN_SCORE = 1.6   # min_score search-option probe (cuts inside the top-10)


def fts_min_score_top10(sf_dir: str) -> pa.Table:
    """ES min_score option: BM25_QUERY top-10 restricted to scores >=
    MIN_SCORE (exact prefix-filter rewrite of the sorted top-k)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    rows = s.search_min_score(BM25_QUERY, k=10, min_score=MIN_SCORE)
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array([int(to_src[d]) for d, _ in rows], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
        ),
    })


CLUSTER_QUOTA = 40   # per-cluster cap of the balanced sample


def cluster_balanced_sample(sf_dir: str) -> pa.Table:
    """Cluster-balanced sampling — the composed training-data stage:
    distributed k-means assigns every embedding a cluster, then the
    deterministic md5-rank quota sampler caps each cluster at
    CLUSTER_QUOTA rows (the per-domain-cap machinery with cluster as
    the stratum). Emits per-cluster kept counts + exact vec_id sums."""
    from .extras.sampling import stratified_sample
    from .extras.similarity import kmeans_lloyd

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _, assigns = kmeans_lloyd(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    kept = stratified_sample(
        assigns, key_col="vec_id", stratum_col="cluster",
        quota=CLUSTER_QUOTA,
    )
    out = (
        kept.groupby("cluster")
        .aggregate(Count(), Sum("vec_id"))
        .to_pandas()
        .sort_values("cluster")
    )
    return pa.table({
        "cluster": pa.array(out["cluster"].astype("int64")),
        "n_kept": pa.array(out["count()"].astype("int64")),
        "sum_vec_id": pa.array(out["sum(vec_id)"].astype("int64")),
    })


# within-cluster cosine drop threshold: the synthetic embeddings carry
# no planted near-dups (max pairwise cos ~0.51), so the knob sits inside
# the real similarity tail (a few hundred crossing pairs at every sf,
# nearest pair >= 1e-6 from the threshold — ulp-safe vs the SQL twin);
# a production corpus would run the paper's 0.95-ish setting
SEMDEDUP_TAU = 0.35


def semantic_dedup_counts(sf_dir: str) -> pa.Table:
    """SemDeDup over the embeddings table (k=KMEANS_K clusters,
    KMEANS_ITERS Lloyd iterations, tau=SEMDEDUP_TAU): per-cluster member
    / kept counts with the exact kept-id sum fingerprinting the kept
    set. The drop rule (smaller-id witness with cosine >= tau inside
    the final cluster) is a plain EXISTS, so the SQL twin is the kmeans
    CTEs + one within-cluster pair join."""
    from .extras.similarity import semantic_dedup

    flags = semantic_dedup(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]),
        k=KMEANS_K, iters=KMEANS_ITERS, threshold=SEMDEDUP_TAU,
    )

    def partial(b: pa.Table) -> pa.Table:
        kept = b["kept"].combine_chunks().to_numpy(zero_copy_only=False)
        vid = b["vec_id"].combine_chunks().to_numpy()
        return pa.table({
            "cluster": b["cluster"],
            "one": pa.array(np.ones(b.num_rows, np.int64)),
            "kept_i": pa.array(kept.astype(np.int64)),
            "kept_id": pa.array(np.where(kept, vid, 0).astype(np.int64)),
        })

    out = (
        flags.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("one"), Sum("kept_i"), Sum("kept_id"))
        .to_pandas()
        .sort_values("cluster")
    )
    return pa.table({
        "cluster": pa.array(out["cluster"].astype("int64")),
        "n_members": pa.array(out["sum(one)"].astype("int64")),
        "n_kept": pa.array(out["sum(kept_i)"].astype("int64")),
        "sum_kept_id": pa.array(out["sum(kept_id)"].astype("int64")),
    })


# ---------------------------------------------------------------------------
# round-5 session F: intervals query (the last positional-query family
# member ES has that the span family can't express — per-slot any_of
# alternatives inside an ordered max_gaps chain)
# ---------------------------------------------------------------------------

INTERVALS_SLOTS = ("the", ("data", "batch"), "join")
INTERVALS_MAX_GAPS = 3


def fts_intervals_docs(sf_dir: str) -> pa.Table:
    """ES intervals query analog — ``all_of(ordered=true,
    max_gaps=INTERVALS_MAX_GAPS)`` whose middle slot is an ``any_of``
    of two match intervals: docs with a strictly-increasing chain
    the < (data|batch) < join of width <= slots + max_gaps, with the
    exact chain count (the relational spec; SQL twin uses term IN
    inequality joins). doc_id asc, first 20."""
    s = Searcher(documents_index(sf_dir))
    rows = s.intervals_ordered_docs(
        list(INTERVALS_SLOTS), INTERVALS_MAX_GAPS, limit=20
    )
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "n_matches": pa.array([c for _, c in rows], pa.int64()),
    })


SQS_QUERY = 'spark + data | "the customer" | sma* + -window'


def fts_simple_query_string_top10(sf_dir: str) -> pa.Table:
    """ES simple_query_string analog — the lenient never-raising
    sibling of query_string: OR of AND-groups
    (spark AND data) | "the customer" | (sma* AND NOT window), each
    matched group contributing its positive atoms' scores (term BM25 +
    phrase spec + constant-score prefix)."""
    s = Searcher(documents_index(sf_dir))
    hits = s.simple_query_string(SQS_QUERY, k=10)
    return pa.table({
        "doc_id": pa.array([d for d, _ in hits], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
        ),
    })


# ---------------------------------------------------------------------------
# round-5 session F: aggregation-surface completion — missing / global /
# sampler / date_range aggs, normalize + bucket_selector/bucket_sort
# pipeline aggs as driver-gated entries
# ---------------------------------------------------------------------------

SIZE_TAG_MIN = 300    # n_chars >= this -> size_tag='big', else NULL


def fts_missing_count(sf_dir: str) -> pa.Table:
    """ES missing aggregation: BM25_QUERY hits whose nullable keyword
    ``size_tag`` is NULL (docs under SIZE_TAG_MIN chars), next to the
    present-count complement."""
    s = Searcher(documents_index(sf_dir))
    n_missing = s.missing_agg(BM25_QUERY, "size_tag")
    n_hits = s._hit_count(BM25_QUERY)
    return pa.table({
        "n_missing": pa.array([n_missing], pa.int64()),
        "n_present": pa.array([n_hits - n_missing], pa.int64()),
    })


def fts_global_agg(sf_dir: str) -> pa.Table:
    """ES global aggregation: a bucket escaping the query scope —
    query hit count alongside whole-index doc count and n_chars sum
    (the global+stats composition)."""
    s = Searcher(documents_index(sf_dir))
    g = s.global_stats_agg(BM25_QUERY, "n_chars")
    return pa.table({
        "n_hits": pa.array([g["n_hits"]], pa.int64()),
        "n_global": pa.array([g["n_global"]], pa.int64()),
        "sum_nchars": pa.array([int(g["sum_field"])], pa.int64()),
    })


SAMPLER_SHARD_SIZE = 100


def fts_sampler_terms(sf_dir: str) -> pa.Table:
    """ES sampler aggregation (plain): terms agg on ``source`` inside
    the top SAMPLER_SHARD_SIZE hits by relevance (score desc, doc_id
    asc), count desc then value asc."""
    s = Searcher(documents_index(sf_dir))
    rows = s.sampler_terms_agg(
        BM25_QUERY, "source", shard_size=SAMPLER_SHARD_SIZE, size=10
    )
    return pa.table({
        "source": pa.array([v for v, _ in rows], pa.string()),
        "doc_count": pa.array([c for _, c in rows], pa.int64()),
    })


DATE_RANGES_ISO = (
    (None, "2025-04-01"),
    ("2025-04-01", "2025-08-01"),
    ("2025-08-01", None),
)


def fts_date_range_agg(sf_dir: str) -> pa.Table:
    """ES date_range aggregation over the synthetic ts_epoch column:
    ISO-keyed [from, to) buckets (UTC midnight boundaries), in input
    order like the range agg."""
    s = Searcher(documents_index(sf_dir))
    rows = s.date_range_agg(
        BM25_QUERY, "ts_epoch", list(DATE_RANGES_ISO)
    )
    return pa.table({
        "key": pa.array([k for k, _ in rows], pa.string()),
        "doc_count": pa.array([c for _, c in rows], pa.int64()),
    })


def fts_date_hist_zscore(sf_dir: str) -> pa.Table:
    """ES normalize pipeline agg, method=z-score, over the monthly
    date_histogram of BM25_QUERY hits: exact integer moments, pinned
    float sequence, floor-e6."""
    from .search import zscore_aggs

    s = Searcher(documents_index(sf_dir))
    rows = zscore_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month")
    )
    return pa.table({
        "month_start": pa.array([k for k, _, _ in rows], pa.int64()),
        "n_docs": pa.array([c for _, c, _ in rows], pa.int64()),
        "z_e6": pa.array([z for _, _, z in rows], pa.int64()),
    })


def fts_date_hist_normalize(sf_dir: str) -> pa.Table:
    """ES normalize pipeline agg (percent_of_sum) over the calendar
    date_histogram buckets: each month's share of the hit total,
    e6-rounded percent."""
    from .search import normalize_aggs

    s = Searcher(documents_index(sf_dir))
    rows = normalize_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month")
    )
    return pa.table({
        "month_start": pa.array([r[0] for r in rows], pa.int64()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "pct_e6": pa.array([r[2] for r in rows], pa.int64()),
    })


BUCKET_SORT_MIN = 50   # bucket_selector floor
BUCKET_SORT_K = 3      # bucket_sort truncation


def fts_date_hist_bucket_sort(sf_dir: str) -> pa.Table:
    """ES bucket_selector + bucket_sort pipeline aggs over the calendar
    date_histogram: keep months with >= BUCKET_SORT_MIN hits, re-order
    count desc then month asc, truncate to BUCKET_SORT_K."""
    from .search import pipeline_aggs

    s = Searcher(documents_index(sf_dir))
    rows = pipeline_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month"),
        cumulative=False, derivative=False,
        selector=lambda k, c: c >= BUCKET_SORT_MIN,
        sort_desc_by_count=BUCKET_SORT_K,
    )
    return pa.table({
        "month_start": pa.array([r[0] for r in rows], pa.int64()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
    })


def dedup_window_spans(sf_dir: str, limit: int = 20) -> pa.Table:
    """Substring-level duplicate detection over documents: width-5
    token windows fold-hashed (the dedup-family shingle spec); each doc
    charged every window position whose value appears in >= 2 distinct
    docs. Top docs by duplicated-window count (n_dup desc, doc_id asc)
    — the per-document signal suffix-array dedup pipelines threshold
    on. Distributed: map-side distinct pairs, hash-bucket groupby,
    per-doc sum; driver sees only block-local top-k candidates."""
    from .extras.dedup import dup_window_counts

    counts = dup_window_counts(
        _docs(sf_dir), text_col="text", id_col="doc_id"
    )

    def local_topk(t: pa.Table) -> pa.Table:
        keys = [("n_dup", "descending"), ("doc_id", "ascending")]
        return t.take(pc.sort_indices(t, sort_keys=keys).slice(0, limit))

    cand = pa.concat_tables([
        b for b in ray.get(
            counts.map_batches(
                local_topk, batch_format="pyarrow"
            ).to_arrow_refs()
        ) if b.num_rows
    ])
    keys = [("n_dup", "descending"), ("doc_id", "ascending")]
    return cand.take(pc.sort_indices(cand, sort_keys=keys).slice(0, limit))


CONST_SCORE_BOOST = 2.5
CONST_SCORE_TERM = "spark"
CONST_SCORE_MIN_NCHARS = 350
IDS_PROBE = (3, 1, 4, 1, 5, 9, 2, 6)   # dups + order preserved by ES


def fts_exists_docs(sf_dir: str) -> pa.Table:
    """ES exists query over the nullable ``size_tag`` keyword: total
    count plus the first 20 matching doc_ids ascending (constant-score
    rewrite — the doc list is the result)."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    n = s.exists_count("size_tag")
    docs = s.exists_docs("size_tag", limit=20)
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array([int(to_src[d]) for d in docs], pa.int64()),
        "n_exists": pa.array([n] * len(docs), pa.int64()),
    })


def fts_constant_score_docs(sf_dir: str) -> pa.Table:
    """ES constant_score query: a filter context (term CONST_SCORE_TERM
    AND n_chars >= CONST_SCORE_MIN_NCHARS) wrapped with boost — every
    hit scores exactly the boost, ranking degrades to doc_id asc."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    mask = s._hit_mask(
        CONST_SCORE_TERM,
        where={"n_chars": {"gte": CONST_SCORE_MIN_NCHARS}},
    )
    docs = [] if mask is None else np.flatnonzero(mask)[:20]
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array([int(to_src[d]) for d in docs], pa.int64()),
        "score_e6": pa.array(
            [int(round(CONST_SCORE_BOOST * 1e6))] * len(docs), pa.int64()
        ),
    })


def fts_ids_docs(sf_dir: str) -> pa.Table:
    """ES ids query: the IDS_PROBE set as a filter (distinct, ascending
    like any other filter rewrite), constant score 1.0, joined with
    each doc's n_chars through the order-preserving multiget."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    ids = sorted(set(IDS_PROBE))
    # src ids -> dense ids through the explicit mapping (identity for
    # this table, but never assumed)
    to_src = _dense_to_src(index_dir)
    src_to_dense = {int(v): i for i, v in enumerate(to_src)}
    t = s.get_by_doc_id([src_to_dense[i] for i in ids])
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": t["n_chars"].cast(pa.int64()),
        "score_e6": pa.array([1_000_000] * len(ids), pa.int64()),
    })


FUZZY_MATCH_QUERY = "batch jion"   # one in-vocab token + one OOV typo
FUZZY_MATCH_EDITS = 1


def fts_match_fuzzy_top10(sf_dir: str) -> pa.Table:
    """ES match query with fuzziness (scored): each query token's
    OSA-1 dictionary neighborhood scores BM25 with its own stats,
    decayed (max_edits + 1 - ed) / (max_edits + 1) — exact 1.0, one
    edit 1/2; top 10 by the blended sum."""
    s = Searcher(documents_index(sf_dir))
    hits = s.match_fuzzy(
        FUZZY_MATCH_QUERY, k=10, max_edits=FUZZY_MATCH_EDITS
    )
    return pa.table({
        "doc_id": pa.array([d for d, _ in hits], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
        ),
    })


TFIDF_TOP_K = 3


def doc_tfidf_keywords(sf_dir: str) -> pa.Table:
    """TF-IDF keyword extraction per source: top TFIDF_TOP_K terms by
    group-tf * ln(1 + N/df) (df = distinct docs corpus-wide), score
    desc then term asc within each source."""
    from .extras.textstats import tfidf_keywords

    rows = tfidf_keywords(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        ),
        top_k=TFIDF_TOP_K,
    )
    return pa.table({
        "source": pa.array([g for g, _, _ in rows], pa.string()),
        "term": pa.array([t for _, t, _ in rows], pa.string()),
        "score_e6": pa.array([s for _, _, s in rows], pa.int64()),
    })


def quality_filter_counts(sf_dir: str) -> pa.Table:
    """C4/Gopher-style quality-filter funnel over documents: per-rule
    drop counts (first failing rule wins) + kept — min_tokens,
    top-token concentration, duplicate-2gram coverage, all integer-
    ratio thresholds shared with the SQL twin."""
    from .extras.textstats import quality_filter_funnel

    rows = quality_filter_funnel(_docs(sf_dir))
    return pa.table({
        "rule": pa.array([r for r, _ in rows], pa.string()),
        "n_docs": pa.array([n for _, n in rows], pa.int64()),
    })


TERMS_LOOKUP_DOC = 7   # ES terms-lookup: values fetched from this doc


def fts_terms_lookup_docs(sf_dir: str) -> pa.Table:
    """ES terms query with terms LOOKUP (the {index, id, path} form):
    the filter values are read from document TERMS_LOOKUP_DOC's ``lang``
    field at query time, then applied as a keyword filter — total count
    and first 20 doc_ids ascending, constant score."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    to_src = _dense_to_src(index_dir)
    src_to_dense = {int(v): i for i, v in enumerate(to_src)}
    lookup = s.get_by_doc_id([src_to_dense[TERMS_LOOKUP_DOC]])
    langs = [lookup["lang"][0].as_py()]
    mask = s.filter_mask(lang=langs)
    docs = np.flatnonzero(mask)
    return pa.table({
        "doc_id": pa.array(
            [int(to_src[d]) for d in docs[:20]], pa.int64()
        ),
        "n_hits": pa.array([int(mask.sum())] * min(docs.size, 20),
                           pa.int64()),
    })


SEARCH_TEMPLATE = "{{t1}} join the {{t2}}"
SEARCH_TEMPLATE_PARAMS = {"t1": "spark", "t2": "data"}


def fts_search_template_top10(sf_dir: str) -> pa.Table:
    """ES search-template (_search/template): mustache-subset
    {{param}} substitution rendered at query time, then the standard
    match search — the render resolves to BM25_QUERY, so scores face
    the same oracle."""
    from .search import render_search_template

    s = Searcher(documents_index(sf_dir))
    q = render_search_template(SEARCH_TEMPLATE, SEARCH_TEMPLATE_PARAMS)
    hits = s.search(q, k=10)
    return pa.table({
        "doc_id": pa.array([d for d, _ in hits], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in hits], pa.int64()
        ),
    })


def fts_cumulative_cardinality(sf_dir: str) -> pa.Table:
    """ES cumulative_cardinality pipeline agg (exact): running distinct
    ``source`` count under the monthly date_histogram of BM25_QUERY
    hits."""
    s = Searcher(documents_index(sf_dir))
    rows = s.cumulative_cardinality_agg(
        BM25_QUERY, "ts_epoch", "source", "month"
    )
    return pa.table({
        "month_start": pa.array([r[0] for r in rows], pa.int64()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "cum_distinct": pa.array([r[2] for r in rows], pa.int64()),
    })


MOVING_PCT_WINDOW = 3
MOVING_PCTS = (25.0, 50.0, 75.0)


def fts_date_hist_moving_pct(sf_dir: str) -> pa.Table:
    """ES moving_percentiles pipeline agg (exact form) over the monthly
    date_histogram: trailing-window linear-interpolation percentiles of
    the bucket counts, e6-rounded."""
    from .search import moving_percentiles_aggs

    s = Searcher(documents_index(sf_dir))
    rows = moving_percentiles_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month"),
        window=MOVING_PCT_WINDOW, percents=MOVING_PCTS,
    )
    return pa.table({
        "month_start": pa.array([r[0] for r in rows], pa.int64()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "p25_e6": pa.array(
            [int(round(r[2] * 1e6)) for r in rows], pa.int64()),
        "p50_e6": pa.array(
            [int(round(r[3] * 1e6)) for r in rows], pa.int64()),
        "p75_e6": pa.array(
            [int(round(r[4] * 1e6)) for r in rows], pa.int64()),
    })


PCT_BUCKET_PCTS = (25.0, 50.0, 75.0)


def fts_percentiles_bucket(sf_dir: str) -> pa.Table:
    """ES percentiles_bucket sibling pipeline agg NEXT TO the monthly
    date_histogram of BM25_QUERY hits: linear-interpolation percentiles
    of the bucket counts, one summary row, e6-rounded (quartiles of
    integer counts land on exact .25 multiples — the rounding is
    exact on both sides, the boxplot-agg convention)."""
    from .search import percentiles_bucket_aggs

    s = Searcher(documents_index(sf_dir))
    pr = percentiles_bucket_aggs(
        s.date_histogram_agg(BM25_QUERY, "ts_epoch", "month"),
        percents=PCT_BUCKET_PCTS,
    )
    return pa.table({
        f"p{int(p)}_e6": pa.array([int(round(pr[p] * 1e6))], pa.int64())
        for p in PCT_BUCKET_PCTS
    })


RANDOM_SAMPLER_PROB = 0.5   # random_sampler inclusion probability
RANDOM_SAMPLER_SEED = 7     # shared with the SQL twin's md5 rule


def fts_random_sampler(sf_dir: str) -> pa.Table:
    """ES random_sampler aggregation (8.2) over the BM25_QUERY hit set:
    terms sub-agg on `source` inside a deterministic md5-rule sample at
    probability RANDOM_SAMPLER_PROB — each bucket row carries the
    sampler bucket's doc_count (n_sampled) beside the sub-agg count."""
    s = Searcher(documents_index(sf_dir))
    n_sampled, rows = s.random_sampler_terms_agg(
        BM25_QUERY, "source",
        probability=RANDOM_SAMPLER_PROB, seed=RANDOM_SAMPLER_SEED,
        size=8,
    )
    return pa.table({
        "source": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
        "n_sampled": pa.array([n_sampled] * len(rows), pa.int64()),
    })


MASKED_SPAN_TERMS = ("the", "spark")  # text-index stopword, stop-index term
MASKED_SPAN_SLOP = 3


def fts_field_masked_span(sf_dir: str) -> pa.Table:
    """ES field_masking_span: a span_near whose first slot is the TEXT
    index's 'the' (stopped out of the subfield) and second slot the
    STOP-FILTERED index's 'spark', masked onto one position axis — legal
    because the stop filter preserves raw-stream positions
    (enablePositionIncrements), the exact ES subfield use case. The
    result equals the raw-stream two-term span_near relational spec,
    which neither index alone could serve (the text index serves it only
    because it happens to index both terms; the masked form is the one
    that still works when the main field is the stopped one)."""
    from .search import field_masked_span_near_docs

    text_s = Searcher(documents_index(sf_dir))
    stop_s = Searcher(documents_stop_index(sf_dir))
    rows = field_masked_span_near_docs(
        [(text_s, MASKED_SPAN_TERMS[0]), (stop_s, MASKED_SPAN_TERMS[1])],
        slop=MASKED_SPAN_SLOP, limit=20,
    )
    dense_to_src = _dense_to_src(documents_index(sf_dir))
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in rows], pa.int64()
        ),
        "n_matches": pa.array([c for _, c in rows], pa.int64()),
    })


DBQ_LANG = "de"   # delete_by_query victim context


def fts_delete_by_query(sf_dir: str) -> pa.Table:
    """ES _delete_by_query round-trip: copy the built index, tombstone
    every BM25_QUERY hit with lang=DBQ_LANG through the real
    delete_by_query path, and read back the surviving per-lang counts
    (match_all facet over the reopened index — tombstones must be
    invisible to every downstream aggregation)."""
    import shutil

    from .admin import clear_exclusions, delete_by_query

    index_dir = documents_index(sf_dir)
    scratch = index_dir + "-dbq"
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(index_dir, scratch)
    clear_exclusions(scratch)
    delete_by_query(scratch, BM25_QUERY, where={"lang": DBQ_LANG})
    s = Searcher(scratch)
    rows = s.facet_counts(None, "lang", size=10)
    return pa.table({
        "lang": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


UBQ_MIN_NCHARS = 530   # update_by_query victim floor (subset of docs)


def fts_update_by_query(sf_dir: str) -> pa.Table:
    """ES _update_by_query round-trip: uppercase the `lang` of every
    BM25_QUERY hit with n_chars >= UBQ_MIN_NCHARS through the real
    update path (vectorized ingest chain + mask if_else + republish) and
    read back the per-lang counts from the NEW index — updated docs
    must carry the transformed value, untouched docs the original."""
    import shutil

    from .admin import update_by_query

    index_dir = documents_index(sf_dir)
    out_dir = index_dir + "-ubq"
    shutil.rmtree(out_dir, ignore_errors=True)
    update_by_query(
        index_dir, out_dir, BM25_QUERY,
        [{"uppercase": {"field": "lang"}}],
        where={"n_chars": {"gte": UBQ_MIN_NCHARS}},
    )
    s = Searcher(out_dir)
    rows = s.facet_counts(None, "lang", size=20)
    return pa.table({
        "lang": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


CHILDREN_MIN_NCHARS = 530   # parent-selection floor (subset of sources)


def fts_children_agg(sf_dir: str) -> pa.Table:
    """ES children aggregation over the `source` join field: parents =
    sources with a BM25_QUERY hit of n_chars >= CHILDREN_MIN_NCHARS (a
    proper subset), children bucket = every doc under those sources,
    terms sub-agg on `lang`; each row carries the children bucket's
    doc_count."""
    s = Searcher(documents_index(sf_dir))
    n_children, rows = s.children_terms_agg(
        BM25_QUERY, "source", "lang", size=10,
        where={"n_chars": {"gte": CHILDREN_MIN_NCHARS}},
    )
    return pa.table({
        "lang": pa.array([v for v, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
        "n_children": pa.array([n_children] * len(rows), pa.int64()),
    })


# runtime field: (n_chars * 7 - 100) / 4 — quarters are exact binary
# fractions, so sums/extrema are float-order-free on both sides
RUNTIME_FIELD_EXPR = {
    "op": "/",
    "a": {"op": "-", "b": 100,
          "a": {"op": "*", "a": {"col": "n_chars"}, "b": 7}},
    "b": 4,
}


ESQL_QUERY = (
    'FROM documents '
    '| WHERE MATCH(text, "spark join the data") AND n_chars >= 100 '
    '| STATS n = COUNT(*), total = SUM(n_chars), biggest = MAX(n_chars) '
    'BY lang '
    '| SORT n DESC, lang ASC '
    '| LIMIT 10'
)


def fts_esql_stats(sf_dir: str) -> pa.Table:
    """ES|QL (the 8.11+ piped language): ESQL_QUERY parses and compiles
    onto the engine surface — MATCH -> hit mask, the n_chars bound ->
    range where, STATS BY -> exact per-bucket int reductions, SORT +
    LIMIT driver-side over O(buckets) rows."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_QUERY)
    return pa.table({
        "lang": t["lang"].cast(pa.string()),
        "n": t["n"].cast(pa.int64()),
        "total": t["total"].cast(pa.int64()),
        "biggest": t["biggest"].cast(pa.int64()),
    })


ESQL_EVAL_QUERY = (
    'FROM documents '
    '| WHERE MATCH(text, "spark join the data") '
    '| EVAL w = n_chars * 3 '
    '| STATS s = SUM(w), mx = MAX(w) BY source '
    '| SORT s DESC, source ASC '
    '| LIMIT 5'
)


def fts_esql_eval(sf_dir: str) -> pa.Table:
    """ES|QL EVAL stage: the derived column (n_chars * 3 — integer-
    preserving, so SUM stays exact) registers as a runtime field and
    feeds STATS BY like any docstore column."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_EVAL_QUERY)
    return pa.table({
        "source": t["source"].cast(pa.string()),
        "s": t["s"].cast(pa.int64()),
        "mx": t["mx"].cast(pa.int64()),
    })


ESQL_GROK_QUERY = (
    'FROM documents '
    '| GROK text "%{WORD:w1} %{GREEDYDATA:w_rest}" '
    '| DISSECT source "src%{src_num}" '
    '| WHERE lang == "en" AND src_num == "3" '
    '| STATS n = COUNT(*) BY w1 '
    '| SORT n DESC, w1 ASC '
    '| LIMIT 10'
)


def fts_esql_grok(sf_dir: str) -> pa.Table:
    """ES|QL GROK + DISSECT commands: both patterns compile through the
    ingest-processor subset to anchored RE2, the captures register as
    derived keyword columns (null on no-match -> no bucket), the WHERE
    mixes a stored column (lang, docstore scan) with a derived one
    (src_num, code-mask equality), and STATS groups by the grokked
    first word."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_GROK_QUERY)
    return pa.table({
        "w1": t["w1"].cast(pa.string()),
        "n": t["n"].cast(pa.int64()),
    })


ESQL_LOOKUP_QUERY = (
    'FROM documents '
    '| LOOKUP JOIN family ON lang '
    '| STATS n = COUNT(*), total = SUM(n_chars) BY family '
    '| SORT family ASC'
)


def fts_esql_lookup(sf_dir: str) -> pa.Table:
    """ES|QL LOOKUP JOIN (the 8.18 lookup-index join) against the
    broadcast LANG_FAMILY dict: the join maps the lang code DICTIONARY
    (O(distinct), never per doc) into a derived keyword column that
    STATS groups exactly like a stored one; unmatched keys -> null ->
    no bucket (the inner-join twin)."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_LOOKUP_QUERY,
                     lookups={"family": LANG_FAMILY})
    return pa.table({
        "family": t["family"].cast(pa.string()),
        "n": t["n"].cast(pa.int64()),
        "total": t["total"].cast(pa.int64()),
    })


ESQL_EVAL2_QUERY = (
    'FROM documents '
    '| WHERE MATCH(text, "spark join the data") '
    '| EVAL c2 = n_chars * n_chars '
    '| STATS s = SUM(c2), n = COUNT(*) BY lang '
    '| SORT s DESC, lang ASC '
    '| LIMIT 5'
)


def fts_esql_eval_cols(sf_dir: str) -> pa.Table:
    """ES|QL EVAL with a COLUMN right-hand side (col OP col): the
    squared-length runtime field feeds STATS BY with exact integer
    sums (products < 2^53)."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_EVAL2_QUERY)
    return pa.table({
        "lang": t["lang"].cast(pa.string()),
        "s": t["s"].cast(pa.int64()),
        "n": t["n"].cast(pa.int64()),
    })


ESQL_DISTINCT_QUERY = (
    'FROM documents '
    '| WHERE MATCH(text, "spark join the data") '
    '| STATS d = COUNT_DISTINCT(source), n = COUNT(*) BY lang '
    '| SORT n DESC, lang ASC '
    '| LIMIT 5'
)


def fts_esql_distinct(sf_dir: str) -> pa.Table:
    """ES|QL COUNT_DISTINCT: exact per-bucket cardinality via the
    column's dictionary codes (ES approximates with HLL++ — this
    engine's exactness is the documented divergence)."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_DISTINCT_QUERY)
    return pa.table({
        "lang": t["lang"].cast(pa.string()),
        "d": t["d"].cast(pa.int64()),
        "n": t["n"].cast(pa.int64()),
    })


ESQL_MEDIAN_QUERY = (
    'FROM documents '
    '| WHERE MATCH(text, "spark join the data") '
    '| STATS m = MEDIAN(n_chars), n = COUNT(*) BY lang '
    '| SORT n DESC, lang ASC '
    '| LIMIT 5'
)


def fts_esql_median(sf_dir: str) -> pa.Table:
    """ES|QL MEDIAN: quantile_cont(0.5) through the shared exact
    linear-interpolation kernel, floor(x+0.5)-e6 pinned."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_MEDIAN_QUERY)
    return pa.table({
        "lang": t["lang"].cast(pa.string()),
        "m": t["m"].cast(pa.int64()),
        "n": t["n"].cast(pa.int64()),
    })


ESQL_LIKE_QUERY = (
    'FROM documents '
    '| WHERE source LIKE "src1*" AND lang IN ("en", "fr") '
    '| STATS n = COUNT(*), total = SUM(n_chars) BY source '
    '| SORT source ASC'
)


def fts_esql_like(sf_dir: str) -> pa.Table:
    """ES|QL LIKE + IN conditions: the wildcard resolves over the
    source column's code dictionary (O(distinct values)), IN compiles
    to the terms-membership where — both compose with STATS BY."""
    from .esql import execute_esql

    s = Searcher(documents_index(sf_dir))
    t = execute_esql(s, ESQL_LIKE_QUERY)
    return pa.table({
        "source": t["source"].cast(pa.string()),
        "n": t["n"].cast(pa.int64()),
        "total": t["total"].cast(pa.int64()),
    })


def fts_dsl_script_filter_top10(sf_dir: str) -> pa.Table:
    """ES script query (filter context): BM25_QUERY hits kept only when
    the painless-AST expression (n_chars*7 - 100)/4 exceeds 500 — the
    script materializes as an anonymous runtime field + range where
    inside execute_dsl, composing with bool.filter."""
    from .dsl import execute_dsl

    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": BM25_QUERY}}],
            "filter": [{"script": {"expr": RUNTIME_FIELD_EXPR,
                                   "gt": 500.0}}],
        }},
        "size": 10,
    }
    rows = execute_dsl(s, body)["hits"]["hits"]
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(to_src[h["_id"]]) for h in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(h["_score"] * 1e6)) for h in rows], pa.int64()
        ),
    })


def fts_runtime_field_stats(sf_dir: str) -> pa.Table:
    """ES runtime-mappings analog: a query-time derived numeric field
    ((n_chars * 7 - 100) / 4 — the Painless stand-in AST) feeding the
    standard stats aggregation over BM25_QUERY hits, plus a range
    bucket on the same field — no index change, defined per search."""
    s = Searcher(documents_index(sf_dir))
    s.define_runtime_field("rt_score", RUNTIME_FIELD_EXPR)
    st = s.stats_agg(BM25_QUERY, "rt_score")
    rng = s.range_agg(BM25_QUERY, "rt_score", [(None, 500.0), (500.0, None)])
    return pa.table({
        "n": pa.array([st["count"]], pa.int64()),
        "min_e6": pa.array([int(round(st["min"] * 1e6))], pa.int64()),
        "max_e6": pa.array([int(round(st["max"] * 1e6))], pa.int64()),
        "sum_e6": pa.array([int(round(st["sum"] * 1e6))], pa.int64()),
        "n_low": pa.array([rng[0][1]], pa.int64()),
        "n_high": pa.array([rng[1][1]], pa.int64()),
    })


VOCAB_GROWTH_BUCKET = 2   # docs per growth checkpoint (tiny synthetic vocab saturates fast)


def vocab_growth_curve(sf_dir: str) -> pa.Table:
    """Heaps-law vocabulary-growth curve: distinct analyzed terms seen
    in documents [0, bucket_end) at every VOCAB_GROWTH_BUCKET-doc
    checkpoint — the corpus statistic tokenizer/vocab sizing reads off.

    Distributed shape: a term's first occurrence is min(doc_id) over
    its postings — one map-side (term, min_doc) combine + one term
    groupby (NO positional data, no sort of the corpus); the growth
    curve is then a vocabulary-sized histogram of first-occurrence
    buckets + one cumsum over O(buckets) driver rows."""
    from ray.data.aggregate import Min

    def term_mins(batch: pa.Table) -> pa.Table:
        from .analysis import tokens_flat

        flat, parent = tokens_flat(batch["text"])
        if len(flat) == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "min_doc": pa.array([], pa.int64()),
            })
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parent]
        t = pa.table({
            "term": flat if isinstance(flat, pa.Array) else pa.array(flat),
            "min_doc": pa.array(ids, pa.int64()),
        })
        g = t.group_by("term", use_threads=False).aggregate(
            [("min_doc", "min")]
        )
        return pa.table({"term": g["term"], "min_doc": g["min_doc_min"]})

    firsts = (
        _docs(sf_dir)
        .map_batches(term_mins, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("min_doc"))
    )

    def bucket_hist(t: pa.Table) -> pa.Table:
        b = t["min(min_doc)"].to_numpy(zero_copy_only=False) \
            // VOCAB_GROWTH_BUCKET
        u, c = np.unique(b, return_counts=True)
        return pa.table({
            "bucket": pa.array(u, pa.int64()),
            "n_new": pa.array(c, pa.int64()),
        })

    rows = pa.concat_tables([
        b for b in ray.get(
            firsts.map_batches(
                bucket_hist, batch_format="pyarrow"
            ).to_arrow_refs()
        ) if b.num_rows
    ])
    g = rows.group_by("bucket", use_threads=False).aggregate(
        [("n_new", "sum")]
    )
    order = pc.sort_indices(g, sort_keys=[("bucket", "ascending")])
    g = g.take(order)
    buckets = g["bucket"].to_numpy(zero_copy_only=False)
    new = g["n_new_sum"].to_numpy(zero_copy_only=False)
    return pa.table({
        "bucket_end": pa.array(
            (buckets + 1) * VOCAB_GROWTH_BUCKET, pa.int64()
        ),
        "n_new_terms": pa.array(new, pa.int64()),
        "vocab_size": pa.array(np.cumsum(new), pa.int64()),
    })


RECALL_PROBES = (0, 1, 2, 3, 4)   # query vec_ids for the recall eval
RECALL_K = 10
RECALL_PLANES = 4


def knn_recall_at_k(sf_dir: str) -> pa.Table:
    """ANN evaluation harness: recall@k of the LSH-bucketed search
    against the exact brute-force baseline, per probe query — the
    measurement that justifies (or rejects) an approximate index
    configuration before a corpus-wide rollout. One exact multi-query
    pass + one bucket-filtered pass per probe (at scale the probes
    batch by bucket; the per-probe loop here keeps the single-query
    LSH path — the measured path — untouched)."""
    from .extras.similarity import knn_cosine, knn_cosine_lsh

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvecs = np.stack([
        np.asarray(
            q0.filter(pc.equal(q0["vec_id"], qid))["embedding"][0].as_py(),
            dtype=np.float64,
        )
        for qid in RECALL_PROBES
    ])
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    exact = knn_cosine(ds, qvecs, k=RECALL_K)
    by_probe = {}
    qi = exact["query_idx"].to_numpy(zero_copy_only=False)
    vid = exact["vec_id"].to_numpy(zero_copy_only=False)
    for i, qid in enumerate(RECALL_PROBES):
        by_probe[qid] = set(vid[qi == i].tolist())
    rows = []
    for qid in RECALL_PROBES:
        lsh = knn_cosine_lsh(
            rd.read_parquet(emb_path, columns=["vec_id", "embedding"]),
            qvecs[RECALL_PROBES.index(qid)],
            k=RECALL_K, n_planes=RECALL_PLANES,
        )
        got = set(lsh["vec_id"].to_pylist())
        n_overlap = len(got & by_probe[qid])
        rows.append((qid, n_overlap, len(got),
                     int(np.floor(n_overlap * 1e6 / RECALL_K + 0.5))))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_overlap": pa.array([r[1] for r in rows], pa.int64()),
        "n_lsh": pa.array([r[2] for r in rows], pa.int64()),
        "recall_e6": pa.array([r[3] for r in rows], pa.int64()),
    })


MMR_LAMBDA = 0.7
MMR_K = 5
MMR_CANDS = 20


def fts_mmr_rerank(sf_dir: str) -> pa.Table:
    """Maximal-Marginal-Relevance diversity reranking (Carbonell &
    Goldstein 1998) — the classic retrieve-then-diversify stage: the
    top MMR_CANDS BM25 hits are greedily reranked by
    λ·rel − (1−λ)·max-cosine-to-selected, rel = minmax-normalized BM25
    (degenerate range -> 1.0, the linear-retriever rule), embeddings
    keyed by the testdata doc_id==vec_id contract. Ties break doc asc.
    Candidates are the first MMR_CANDS hits of the BM25 ranking THAT
    HAVE a vector (at sf>=0.1 the embeddings table covers only a
    doc_id prefix — MMR is undefined without a vector, so vectorless
    hits drop BEFORE the candidate cut, the rule the SQL twin's IN
    filter mirrors); the search deepens geometrically until the
    candidate quota fills or the ranking is exhausted.
    The SQL twin unrolls the MMR_K greedy picks as CTE stages (the
    kmeans-oracle precedent). O(k · candidates) driver math over an
    O(candidates) hit list — the distributed work is the BM25 search
    and the candidate-pruned embedding read."""
    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    to_src = _dense_to_src(index_dir)
    vec_ids = set(
        pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id"],
        )["vec_id"].to_pylist()
    )
    k = MMR_CANDS
    while True:
        raw = s.search(BM25_QUERY, k=k)
        hits = [(d, sc) for d, sc in raw
                if int(to_src[d]) in vec_ids][:MMR_CANDS]
        if len(hits) >= MMR_CANDS or len(raw) < k:
            break
        k *= 4
    docs = np.array([int(to_src[d]) for d, _ in hits], dtype=np.int64)
    scores = np.array([sc for _, sc in hits], dtype=np.float64)
    lo, hi = scores.min(), scores.max()
    rel = (np.ones_like(scores) if hi == lo
           else (scores - lo) / (hi - lo))
    emb_t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", docs.tolist())],
    )
    by_id = dict(zip(
        emb_t["vec_id"].to_pylist(),
        emb_t["embedding"].to_pylist(),
    ))
    m = np.array([by_id[int(d)] for d in docs], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    selected = mmr_select(docs, rel, m @ m.T, MMR_K, MMR_LAMBDA)
    return pa.table({
        "rank": pa.array(range(1, len(selected) + 1), pa.int64()),
        "doc_id": pa.array([int(docs[i]) for i in selected], pa.int64()),
    })


def mmr_select(docs: np.ndarray, rel: np.ndarray, sims: np.ndarray,
               k: int, lam: float) -> list[int]:
    """The MMR greedy: k argmax rounds of λ·rel − (1−λ)·max-sim-to-
    selected (first round pure rel), ties by ascending doc id. Returns
    selected CANDIDATE INDICES in pick order."""
    n = docs.size
    selected: list[int] = []
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if not selected:
            mmr = rel.astype(np.float64).copy()
        else:
            max_sim = sims[:, selected].max(axis=1)
            mmr = lam * rel - (1.0 - lam) * max_sim
        mmr = np.where(remaining, mmr, -np.inf)
        cand = np.flatnonzero(mmr == mmr.max())
        best = int(cand[np.argmin(docs[cand])])
        selected.append(best)
        remaining[best] = False
    return selected


def text_winnow_fingerprints(sf_dir: str) -> rd.Dataset:
    """Winnowing document fingerprints (MOSS selection rule) over the
    documents corpus: per doc, the count of distinct winnow-selected
    k-gram keys and their checksum — one shuffle-free vectorized
    map_batches (see extras.dedup.winnow_fingerprint_counts)."""
    from .extras.dedup import winnow_fingerprint_counts

    return winnow_fingerprint_counts(_docs(sf_dir))


MAXSIM_QUERY_VEC_ID = 0


def fts_maxsim_top10(sf_dir: str) -> pa.Table:
    """ES rank_vectors late-interaction retrieval (maxSimDotProduct
    over cosine, ColBERT-style): each embedding sliced into
    MAXSIM_SUBS contiguous sub-vectors is the doc's multi-vector view;
    score = sum over query sub-vectors of the best doc sub-vector
    cosine; query = vec MAXSIM_QUERY_VEC_ID's slices. Top-10 by
    (maxsim e6 desc, vec_id asc)."""
    from .extras.similarity import MAXSIM_SUBS, maxsim_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        q0.filter(pc.equal(q0["vec_id"], MAXSIM_QUERY_VEC_ID))
        ["embedding"][0].as_py(), dtype=np.float64,
    )
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    return maxsim_topk(ds, qvec, k=10, subs=MAXSIM_SUBS)


PARENT_ID_PARENT = "src7"
PARENT_ID_SIZE = 20


def fts_parent_id_docs(sf_dir: str) -> pa.Table:
    """ES parent_id query (children of ONE parent on the source join
    field — the point-lookup sibling of has_child/has_parent), run as
    an ES request body through the DSL executor: filter-context
    constant score 1.0, doc_id ascending, first PARENT_ID_SIZE."""
    from .dsl import execute_dsl

    index_dir = documents_index(sf_dir)
    s = Searcher(index_dir)
    body = {
        "query": {"parent_id": {"type": "source",
                                "id": PARENT_ID_PARENT}},
        "size": PARENT_ID_SIZE,
    }
    rows = execute_dsl(s, body)["hits"]["hits"]
    to_src = _dense_to_src(index_dir)
    return pa.table({
        "doc_id": pa.array(
            [int(to_src[h["_id"]]) for h in rows], pa.int64()
        ),
        "score_e6": pa.array(
            [int(round(h["_score"] * 1e6)) for h in rows], pa.int64()
        ),
    })


HARDNEG_QUERIES = 4   # query vectors: vec_id < this
HARDNEG_K = 5


def knn_hard_negatives(sf_dir: str) -> pa.Table:
    """Hard-negative mining for retrieval training (DPR/ANCE recipe):
    for each of the first HARDNEG_QUERIES embeddings (with their
    labels), the HARDNEG_K most-cosine-similar DIFFERENT-label
    candidates — the confusable negatives a contrastive trainer would
    pair with each anchor. Order (query_idx, sim e6 desc, vec_id)."""
    from .extras.similarity import hard_negatives

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(
        emb_path, columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", HARDNEG_QUERIES)],
    )
    qt = qt.sort_by("vec_id")
    qvecs = np.asarray(
        qt["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ), dtype=np.float64,
    ).reshape(qt.num_rows, -1)
    qlabels = qt["label"].to_numpy(zero_copy_only=False)
    ds = rd.read_parquet(
        emb_path, columns=["vec_id", "embedding", "label"]
    )
    return hard_negatives(ds, qvecs, qlabels, k=HARDNEG_K)


ZIPF_TOP_R = 256


def vocab_zipf_slope(sf_dir: str) -> pa.Table:
    """Zipf-law fit over the corpus term-frequency spectrum — the
    rank/frequency power-law slope data-quality audits report next to
    the Heaps curve (vocab_growth_curve): OLS of ln(tf) on ln(rank)
    over the EXACT top ZIPF_TOP_R terms by (tf desc, term asc).

    Distributed shape: map-side per-batch term counts (one row per
    distinct term per batch), one groupby(term) sum, then exact top-R
    without a global sort (each post-groupby block ships its local
    top-R, any global top-R row is inside one of them); the regression
    runs on the driver over R points — the small side by design."""
    from .analysis import tokens_flat

    def counts(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_flat(batch["text"])
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        g = pa.table({"term": flat}).group_by(
            ["term"], use_threads=False
        ).aggregate([("term", "count")])
        return g.rename_columns(["term", "c"])

    def local_top(t: pa.Table) -> pa.Table:
        out = pa.table({
            "term": t["term"], "n": pc.cast(t["sum(c)"], pa.int64()),
        })
        keys = [("n", "descending"), ("term", "ascending")]
        return out.take(pc.sort_indices(out, sort_keys=keys)
                        .slice(0, ZIPF_TOP_R))

    agg = (
        _docs(sf_dir)
        .map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("c"))
        .map_batches(local_top, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    )
    keys = [("n", "descending"), ("term", "ascending")]
    t = t.take(pc.sort_indices(t, sort_keys=keys).slice(0, ZIPF_TOP_R))
    y = np.log(t["n"].to_numpy().astype(np.float64))
    x = np.log(np.arange(1, t.num_rows + 1, dtype=np.float64))
    xm, ym = x.mean(), y.mean()
    slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
    intercept = float(ym - slope * xm)
    return pa.table({
        "n_terms": pa.array([t.num_rows], pa.int64()),
        "slope_e6": pa.array([int(round(slope * 1e6))], pa.int64()),
        "intercept_e6": pa.array([int(round(intercept * 1e6))],
                                 pa.int64()),
    })


OOV_VOCAB_K = 256   # top-K corpus vocabulary for the OOV-rate audit


def vocab_oov_rate(sf_dir: str) -> rd.Dataset:
    """Per-doc out-of-vocabulary rate against the EXACT top-OOV_VOCAB_K
    corpus vocabulary (cf desc, term asc) — the tokenizer-coverage
    audit a training-data pipeline runs before committing to a vocab:
    docs dominated by OOV tokens are noise/foreign/code. Emits exact
    integer (n_toks, n_oov) per doc so the ratio is derivable without
    a float contract.

    Distributed shape: pass 1 = the zipf machinery's map-side term
    counts -> ONE groupby(term) -> per-block local-top prune -> exact
    global top-K on the driver (K rows); pass 2 = the K-term set
    BROADCAST via the closure into a streaming map_batches (isin on
    the flat token stream + one bincount per batch, no second
    shuffle). Empty docs emit (0, 0), the SQL coalesce rule."""
    from .analysis import tokens_flat

    def counts(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_flat(batch["text"])
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        g = pa.table({"term": flat}).group_by(
            ["term"], use_threads=False
        ).aggregate([("term", "count")])
        return g.rename_columns(["term", "c"])

    def local_top(t: pa.Table) -> pa.Table:
        out = pa.table({
            "term": t["term"], "n": pc.cast(t["sum(c)"], pa.int64()),
        })
        keys = [("n", "descending"), ("term", "ascending")]
        return out.take(pc.sort_indices(out, sort_keys=keys)
                        .slice(0, OOV_VOCAB_K))

    agg = (
        _docs(sf_dir)
        .map_batches(counts, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("c"))
        .map_batches(local_top, batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    )
    keys = [("n", "descending"), ("term", "ascending")]
    t = t.take(pc.sort_indices(t, sort_keys=keys).slice(0, OOV_VOCAB_K))
    vocab = pa.array(t["term"].to_pylist(), pa.string())

    def oov(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parent = tokens_flat(batch["text"])
        n_toks = np.bincount(parent, minlength=n).astype(np.int64) \
            if len(flat) else np.zeros(n, np.int64)
        if len(flat):
            in_v = pc.is_in(flat, value_set=vocab).to_numpy(
                zero_copy_only=False
            )
            n_oov = np.bincount(
                parent[~in_v], minlength=n
            ).astype(np.int64)
        else:
            n_oov = np.zeros(n, np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_toks": pa.array(n_toks, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
        })

    return _docs(sf_dir).map_batches(oov, batch_format="pyarrow",
                                     zero_copy_batch=True)


TERMS_METRIC_SIZE = 8


def fts_terms_avg_order(sf_dir: str) -> pa.Table:
    """ES terms aggregation ordered by a metric sub-agg (order:
    {avg_nchars: desc}) over BM25_QUERY hits: source buckets ranked by
    their exact-integer avg(n_chars) e6, key-ascending ties,
    metric-less buckets last."""
    s = Searcher(documents_index(sf_dir))
    rows = s.terms_metric_agg(
        BM25_QUERY, "source", "n_chars", size=TERMS_METRIC_SIZE
    )
    return pa.table({
        "source": pa.array([v for v, _, _, _ in rows], pa.string()),
        "n_docs": pa.array([c for _, c, _, _ in rows], pa.int64()),
        "n_vals": pa.array([n for _, _, n, _ in rows], pa.int64()),
        "avg_nchars_e6": pa.array(
            [a for _, _, _, a in rows], pa.int64()
        ),
    })


COLLAPSE_IH_GROUPS = 6
COLLAPSE_IH_N = 3


def fts_collapse_inner_hits(sf_dir: str) -> pa.Table:
    """ES collapse + inner_hits: the top COLLAPSE_IH_GROUPS collapsed
    `source` groups of BM25_QUERY (group rank = best hit), each
    expanded with its own top COLLAPSE_IH_N hits (score desc, doc
    asc)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.collapse_inner_hits(
        BM25_QUERY, "source", k=COLLAPSE_IH_GROUPS, n=COLLAPSE_IH_N
    )
    return pa.table({
        "source": pa.array([v for v, _, _, _ in rows], pa.string()),
        "inner_rank": pa.array([r for _, r, _, _ in rows], pa.int64()),
        "doc_id": pa.array([d for _, _, d, _ in rows], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, _, _, sc in rows], pa.int64()
        ),
    })


def text_length_gini(sf_dir: str) -> pa.Table:
    """Gini coefficient of the document token-length distribution — the
    corpus-balance audit (how concentrated the token mass is in long
    docs) reported alongside Zipf/Heaps. EXACT integer arithmetic via
    the pairwise-difference identity: G = P / (n·S) with
    P = Σ_{i<j} (x_j − x_i) over the sorted multiset, computed from the
    LENGTH HISTOGRAM — P = Σ_v c_v·(v·below_n(v) − below_s(v)) — so
    only O(distinct lengths) rows ever reach the driver. Emits
    (n_docs, total_tokens, gini_e6) with gini_e6 round-half-up
    ((2e6·P + nS) // 2nS).

    Distributed shape: one vectorized map_batches emits per-batch
    (length, count) partials (map-side combine), one tiny
    groupby(length) sum; the prefix scan runs on the driver over the
    distinct-length spectrum — the small side by construction."""
    from ray.data.aggregate import Sum as _Sum

    from .analysis import tokens_flat

    def lens(batch: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(batch["text"])
        dl = np.bincount(parent, minlength=batch.num_rows) \
            .astype(np.int64)
        u, c = np.unique(dl, return_counts=True)
        return pa.table({
            "dl": pa.array(u, pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64()),
        })

    hist = (
        _docs(sf_dir)
        .map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dl")
        .aggregate(_Sum("c"))
        .to_pandas()
        .sort_values("dl")
    )
    v = hist["dl"].to_numpy().astype(object)       # exact Python ints
    c = hist["sum(c)"].to_numpy().astype(object)
    n = int(sum(c))
    s = int(sum(ci * vi for ci, vi in zip(c, v)))
    p, below_n, below_s = 0, 0, 0
    for vi, ci in zip(v, c):
        p += int(ci) * (int(vi) * below_n - below_s)
        below_n += int(ci)
        below_s += int(ci) * int(vi)
    gini_e6 = (2_000_000 * p + n * s) // (2 * n * s) if n and s else 0
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "total_tokens": pa.array([s], pa.int64()),
        "gini_e6": pa.array([int(gini_e6)], pa.int64()),
    })


SCRIPT_SCORE_EXPR = {
    "op": "+",
    "a": {"op": "*", "a": {"col": "_score"}, "b": 2},
    "b": {"op": "/", "a": {"col": "n_chars"}, "b": 100},
}


def fts_script_score_top10(sf_dir: str) -> pa.Table:
    """ES script_score query: BM25_QUERY hits re-scored by the pinned
    arithmetic script 2·_score + n_chars/100 (the runtime-mappings AST
    with _score resolution), top-10 by (script score desc, doc asc)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.script_score_search(BM25_QUERY, SCRIPT_SCORE_EXPR, k=10)
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "score_e6": pa.array(
            [int(round(sc * 1e6)) for _, sc in rows], pa.int64()
        ),
    })


def prep_funnel_counts(sf_dir: str) -> pa.Table:
    """The composed end-to-end training-data prep funnel — the pipeline
    a corpus actually runs, each stage reusing its already-oracled
    building block: (1) quality filter (first-failing-rule kept mask,
    extras.textstats.qf_rule_flags), (2) exact dedup WITHIN the kept
    set (md5(text) groups keep min doc_id — extras.dedup's rule), (3)
    deterministic train/holdout split of the survivors (md5-prefix
    bucket rule, 90/100). Emits one row per stage — (stage, n_docs,
    id_sum) with id_sum the exact surviving-doc_id sum, so the oracle
    checks membership, not just counts.

    Distributed shape: one vectorized map_batches for the kept mask +
    content hash, ONE groupby(text_hash) shuffle for the dedup winner,
    a vectorized split-rule map, then an O(stages) driver summary. The
    only all-to-all is the dedup groupby — hash-partitioned on content,
    the same key the standalone dedup_exact shuffles on."""
    from .extras.dedup import _md5_hex
    from .extras.sampling import md5_prefix_u32
    from .extras.textstats import qf_rule_flags

    def kept_hash(batch: pa.Table) -> pa.Table:
        *_, kept = qf_rule_flags(batch)
        t = batch.filter(pa.array(kept))
        return pa.table({
            "text_hash": pa.array(_md5_hex(t["text"].to_pylist())),
            "doc_id": t["doc_id"],
        })

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array([int(ids.min())], pa.int64())})

    def split_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        train = (md5_prefix_u32(
            [str(int(i)) for i in ids]
        ) % 100) < 90
        return pa.table({
            "split": pa.array(
                np.where(train, "train", "holdout"), pa.string()
            ),
            "n": pa.array(np.ones(len(ids), np.int64), pa.int64()),
            "id_sum": pa.array(ids.astype(np.int64), pa.int64()),
        })

    docs = _docs(sf_dir)
    kept = docs.map_batches(
        kept_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    survivors = kept.groupby("text_hash").map_groups(
        keep_min, batch_format="pyarrow"
    )
    split_stats = (
        survivors
        .map_batches(split_partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Sum("n"), Sum("id_sum"))
        .to_pandas()
    )
    # input + kept stage totals: exact count/id sums from tiny
    # per-batch partials (no extra corpus pass for the input row — the
    # doc_id column only)
    def id_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(ids)], pa.int64()),
            "id_sum": pa.array([int(ids.sum())], pa.int64()),
        })

    def tot(ds: rd.Dataset) -> tuple:
        p = ds.map_batches(id_partial, batch_format="pyarrow") \
            .to_pandas()
        return int(p["n"].sum()), int(p["id_sum"].sum())

    n_in, s_in = tot(docs.select_columns(["doc_id"]))
    n_kept, s_kept = tot(kept)
    n_ded, s_ded = tot(survivors)
    rows = [("input", n_in, s_in), ("quality_kept", n_kept, s_kept),
            ("dedup_kept", n_ded, s_ded)]
    for split in ("train", "holdout"):
        sub = split_stats[split_stats["split"] == split]
        rows.append((
            split,
            int(sub["sum(n)"].iloc[0]) if len(sub) else 0,
            int(sub["sum(id_sum)"].iloc[0]) if len(sub) else 0,
        ))
    return pa.table({
        "stage": pa.array([r for r, _, _ in rows], pa.string()),
        "n_docs": pa.array([n for _, n, _ in rows], pa.int64()),
        "id_sum": pa.array([s for _, _, s in rows], pa.int64()),
    })


HOP_SIZE_H = 2   # hopping-window size (hours)


def events_hopping_2h1h(sf_dir: str) -> rd.Dataset:
    """Hopping (sliding) window per event_type — size 2 h, hop 1 h, the
    overlapping-window member of the W-series next to tumbling and
    session windows: every event lands in exactly size/hop = 2 windows
    (starts floor(ts/hop)·hop and one hop earlier). Map-side combine
    emits per-(type, window) partials with the rows DOUBLED inside the
    batch kernel (vectorized concat, never per-event Python), then one
    groupby — the shuffle moves window aggregates, not events.
    Returns (event_type, window_start, n_events, sum_value_cents)."""
    HOUR_US = 3_600_000_000

    def window_partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        base = pc.multiply(pc.divide(us, HOUR_US), HOUR_US)
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], 100.0)), pa.int64()
        )
        parts = []
        for k in range(HOP_SIZE_H):
            parts.append(pa.table({
                "event_type": batch["event_type"],
                "window_start": pc.cast(
                    pc.subtract(base, k * HOUR_US), pa.timestamp("us")
                ),
                "value_c": cents,
            }))
        t = pa.concat_tables(parts)
        g = t.group_by(
            ["event_type", "window_start"], use_threads=False
        ).aggregate([("value_c", "count"), ("value_c", "sum")])
        return g.rename_columns(
            ["event_type", "window_start", "n_p", "sum_p"]
        )

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )
        .map_batches(window_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_p"), Sum("sum_p"))
    )
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n_events": pc.cast(t["sum(n_p)"], pa.int64()),
            "sum_value_cents": pc.cast(t["sum(sum_p)"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


def text_token_entropy(sf_dir: str) -> rd.Dataset:
    """Per-doc token-distribution Shannon entropy (nats, e6) — the
    repetition/diversity quality signal; one shuffle-free vectorized
    map_batches (extras.textstats.token_entropy_batch)."""
    from .extras.textstats import token_entropy_batch

    return _docs(sf_dir).map_batches(
        token_entropy_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def fts_rrf3_top10(sf_dir: str) -> pa.Table:
    """ES multi-retriever rrf (three legs — the N-retriever form of the
    retriever API): the BM25_QUERY ranking, the cosine-kNN ranking
    (vector HYBRID_QUERY_VEC), and a standard retriever sorted by
    n_chars desc over the same query's hits — each truncated to
    RRF_WINDOW, fused Σ 1/(RRF_RANK_K + rank)."""
    import pyarrow.dataset as pads

    from .extras.similarity import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qrow = pads.dataset(emb_path).to_table(
        filter=(pads.field("vec_id") == HYBRID_QUERY_VEC)
    )
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)
    knn = knn_cosine(rd.read_parquet(emb_path), qvec, k=RRF_WINDOW)

    index_dir = documents_index(sf_dir)
    dense_to_src = _dense_to_src(index_dir)
    src_to_dense = np.zeros(dense_to_src.size, dtype=np.int64)
    src_to_dense[dense_to_src] = np.arange(dense_to_src.size)
    knn_ranked = [int(src_to_dense[v])
                  for v in knn["vec_id"].to_pylist()]
    s = Searcher(index_dir)
    bm25_ranked = [d for d, _ in s.search(BM25_QUERY, k=RRF_WINDOW)]
    nchars_ranked = [d for d, _ in s.search_by_field(
        BM25_QUERY, "n_chars", order="desc", k=RRF_WINDOW
    )]
    rows = s.rrf_multi_search(
        [bm25_ranked, knn_ranked, nchars_ranked], k=10,
        rrf_k=RRF_RANK_K,
    )
    return pa.table({
        "doc_id": pa.array(
            [int(dense_to_src[d]) for d, _ in rows], pa.int64()
        ),
        "fused_e9": pa.array(
            [int(round(sc * 1e9)) for _, sc in rows], pa.int64()
        ),
    })


INGEST_CHAIN = [
    {"lowercase": {"field": "text"}},
    {"gsub": {"field": "text", "pattern": "[0-9]+",
              "replacement": "#"}},
    {"trim": {"field": "text"}},
    {"set": {"field": "pipeline", "value": "norm_v1"}},
    {"rename": {"field": "lang", "target_field": "lang_code"}},
]


def text_ingest_processors(sf_dir: str) -> rd.Dataset:
    """ES ingest-pipeline analog (rayfts.ingest): the pinned processor
    chain INGEST_CHAIN (lowercase → digit-masking gsub → trim → set
    constant → rename) applied in order to every document — emitted as
    (doc_id, lang_code, pipeline, n_out_chars) so the oracle checks the
    transformed text exactly (length after the chain) plus the schema
    operations."""
    from .ingest import IngestPipeline

    out = IngestPipeline(INGEST_CHAIN).apply(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
    )

    def present(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang_code": t["lang_code"],
            "pipeline": t["pipeline"],
            "n_out_chars": pc.cast(pc.utf8_length(t["text"]),
                                   pa.int64()),
        })

    return out.map_batches(present, batch_format="pyarrow")


# second processor chain: split -> list column, fingerprint -> md5 of
# joined fields, convert -> cast, drop -> row filter (the one
# row-count-changing processor)
INGEST_EXTRACT_CHAIN = [
    {"split": {"field": "text", "separator": " "}},
    {"fingerprint": {"fields": ["lang", "source"],
                     "target_field": "fp"}},
    {"convert": {"field": "n_chars", "type": "string"}},
    {"drop": {"field": "lang", "equals": "de"}},
]


def text_ingest_extract(sf_dir: str) -> rd.Dataset:
    """ES ingest processors round 2 (rayfts.ingest): split (regex ->
    list column, presented as its length), fingerprint (md5 hex of
    lang|source — one md5 per distinct pair), convert (int -> string
    cast), drop (lang == 'de' documents removed — the row-count
    change the oracle's WHERE mirrors)."""
    from .ingest import IngestPipeline

    out = IngestPipeline(INGEST_EXTRACT_CHAIN).apply(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
    )

    def present(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(pc.list_value_length(t["text"]),
                                pa.int64()),
            "fp": t["fp"],
            "n_chars_str": t["n_chars"],
        })

    return out.map_batches(present, batch_format="pyarrow")


# grok/dissect contract chain: first word of text + the numeric tail of
# the source id. Patterns are RE2-safe so the SQL twin runs the SAME
# compiled expressions through DuckDB's RE2.
GROK_DISSECT_CHAIN = [
    {"grok": {"field": "text",
              "pattern": "%{WORD:w1} %{GREEDYDATA:rest}"}},
    {"dissect": {"field": "source", "pattern": "src%{src_num}"}},
]


def text_grok_dissect(sf_dir: str) -> pa.Table:
    """ES grok + dissect ingest processors (rayfts.ingest): extract the
    first token of ``text`` (grok %{WORD}) and the numeric tail of
    ``source`` (dissect src%{num}), then aggregate per first word —
    doc count and exact integer sum of the dissected source numbers.
    Non-matching texts (no space) grok to a null w1 and group under it,
    the processor's on_failure → null convention. Map-side combine per
    batch (one Table.group_by over the vocabulary-sized key space),
    O(vocab) driver merge — no shuffle."""
    from .ingest import IngestPipeline

    out = IngestPipeline(GROK_DISSECT_CHAIN).apply(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text", "source"],
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "w1": t["w1"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "s": pc.cast(t["src_num"], pa.int64()),
        }).group_by("w1").aggregate([("n", "sum"), ("s", "sum")])

    parts = pa.concat_tables(
        b for b in ray.get(
            out.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        ) if b.num_rows
    )
    merged = parts.group_by("w1").aggregate(
        [("n_sum", "sum"), ("s_sum", "sum")]
    )
    t = pa.table({
        "w1": merged["w1"],
        "n_docs": pc.cast(merged["n_sum_sum"], pa.int64()),
        "sum_src_num": pc.cast(merged["s_sum_sum"], pa.int64()),
    })
    return t.take(pc.sort_indices(t, sort_keys=[("w1", "ascending")]))


def events_pivot_transform(sf_dir: str) -> pa.Table:
    """ES transform (pivot) analog: events pivoted by
    (event_type, day) into a dest summary store with
    count / value-cents sum / value-cents max — one full run of
    rayfts.transform.run_transform into a fresh dest (the incremental
    checkpoint merge is pinned by its own test). Reads back the
    published dest parquet."""
    import tempfile

    from .transform import DEST_NAME, run_transform

    DAY_US = 86_400_000_000

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.multiply(pc.divide(us, DAY_US), DAY_US)
        return t.append_column(
            "day", pc.cast(day, pa.timestamp("us"))
        )

    with tempfile.TemporaryDirectory() as d:
        run_transform(
            os.path.join(sf_dir, "events.parquet"), d,
            group_by=["event_type", "day"], derive=derive,
        )
        return pq.read_table(os.path.join(d, DEST_NAME))


def events_transform_latest(sf_dir: str) -> pa.Table:
    """ES transform `latest` mode: per event_type, the newest event by
    (ts, event_id) — map-side per-batch argmax partials, driver merge
    over O(keys × map tasks) rows, no shuffle."""
    from .transform import latest_transform

    t = latest_transform(
        os.path.join(sf_dir, "events.parquet"), ["event_type"]
    )
    return pa.table({
        "event_type": t["event_type"],
        "event_id": t["event_id"],
        "ts_us": pc.cast(t["ts"], pa.int64()),
        "value_cents": pc.cast(
            pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
        ),
    })


def events_downsample_1h(sf_dir: str) -> pa.Table:
    """ES _downsample API analog: roll the events TSDB index up to
    fixed_interval=1h buckets keyed by the dimension (`event_type`);
    the gauge metric `value` emits the full downsample stat tuple —
    value_count / min / max / sum — in exact integer cents (the pinned
    rounding the transform family uses, so sums are float-order-free).
    @timestamp becomes the bucket start (epoch-floor, not calendar).

    Shape: map-side per-batch partials (count/min/max/sum per
    (dimension, hour) — the combiner) -> ONE small groupby over
    O(dimensions × hours) partial rows -> dest table. The source
    never shuffles; at 10^12 rows the exchange payload stays
    O(groups × map tasks)."""
    from ray.data.aggregate import Max, Min, Sum

    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.multiply(pc.divide(us, HOUR_US), HOUR_US)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        g = pa.table({
            "event_type": t["event_type"],
            "h_us": hour,
            "c": cents,
        }).group_by(["event_type", "h_us"], use_threads=False).aggregate(
            [("c", "count"), ("c", "min"), ("c", "max"), ("c", "sum")]
        )
        return g.rename_columns(
            ["event_type", "h_us", "n_p", "mn_p", "mx_p", "s_p"]
        )

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "h_us"])
        .aggregate(Sum("n_p"), Min("mn_p"), Max("mx_p"), Sum("s_p"))
    )
    blocks = [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    t = pa.concat_tables(blocks)
    out = pa.table({
        "event_type": t["event_type"],
        "window_start": pc.cast(t["h_us"], pa.timestamp("us")),
        "n_values": pc.cast(t["sum(n_p)"], pa.int64()),
        "min_cents": pc.cast(t["min(mn_p)"], pa.int64()),
        "max_cents": pc.cast(t["max(mx_p)"], pa.int64()),
        "sum_cents": pc.cast(t["sum(s_p)"], pa.int64()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("event_type", "ascending"),
                        ("window_start", "ascending")]
    ))


LANG_FAMILY = {"en": "germanic", "de": "germanic", "fr": "romance",
               "es": "romance", "zh": "sinitic"}


def keyword_count_by_family(sf_dir: str) -> pa.Table:
    """ES enrich-processor analog inside the ingest chain: each doc's
    lang enriched to its language family from the broadcast LANG_FAMILY
    policy (unmatched → null), then counted per family — the classic
    enrich-then-aggregate ingest composition."""
    from ray.data.aggregate import Count

    from .ingest import IngestPipeline

    out = IngestPipeline([
        {"enrich": {"field": "lang", "target_field": "family",
                    "lookup": LANG_FAMILY}},
    ]).apply(
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang"],
        )
    )
    g = out.groupby("family").aggregate(Count()).to_pandas()
    g = g.sort_values("family").reset_index(drop=True)
    return pa.table({
        "family": pa.array(g["family"].astype(str), pa.string()),
        "n_docs": pa.array(g["count()"].astype("int64"), pa.int64()),
    })


SHUFFLE_HEAD = 20


def sample_shuffle_order(sf_dir: str) -> pa.Table:
    """Deterministic training-order shuffle: the corpus permuted by
    the md5-prefix rank of doc_id (rerun-stable, seedless — the same
    rule the split/stratified samplers pin) via ONE distributed sort;
    emits the first SHUFFLE_HEAD docs in shuffle order plus each one's
    exact global position — a value-level check that the permutation,
    not just the head set, matches."""
    from .extras.sampling import md5_prefix_u32

    def rank(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "rnk": pa.array(
                md5_prefix_u32([str(int(i)) for i in ids]), pa.int64()
            ),
        })

    ds = (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"],
        )
        .map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["rnk", "doc_id"])
    )
    head = ds.take(SHUFFLE_HEAD)
    return pa.table({
        "position": pa.array(range(len(head)), pa.int64()),
        "doc_id": pa.array([int(r["doc_id"]) for r in head],
                           pa.int64()),
    })


SIG_BG_LANG = "en"


def fts_sig_terms_bg_filter(sf_dir: str) -> pa.Table:
    """ES significant_terms with background_filter: sources
    overrepresented in the SIG_KEYWORD_QUERY hit set vs ONLY the
    lang=SIG_BG_LANG slice of the corpus (the reference-population
    knob) — same exact JLH machinery, narrowed background histogram
    and N."""
    s = Searcher(documents_index(sf_dir))
    rows = s.significant_keyword_terms(
        SIG_KEYWORD_QUERY, "source", size=6, min_doc_count=2,
        background_where={"lang": SIG_BG_LANG},
    )
    return pa.table({
        "source": pa.array([v for v, _, _, _ in rows], pa.string()),
        "fg_df": pa.array([f for _, f, _, _ in rows], pa.int64()),
        "df": pa.array([d for _, _, d, _ in rows], pa.int64()),
        "score_e9": pa.array(
            [int(round(sc * 1e9)) for _, _, _, sc in rows], pa.int64()
        ),
    })


def fts_date_hist_empty_buckets(sf_dir: str) -> pa.Table:
    """ES date_histogram min_doc_count=0: daily buckets of BM25_QUERY
    hits restricted to lang=zh — a sparse slice, so in-range gap days
    emit explicit zero rows (the dashboard contract that dense bucket
    axes rely on)."""
    s = Searcher(documents_index(sf_dir))
    rows = s.date_histogram_agg(
        BM25_QUERY, "ts_epoch", "day", where={"lang": "zh"},
        min_doc_count=0,
    )
    return pa.table({
        "day_start": pa.array([b for b, _ in rows], pa.int64()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })


DATE_HIST_TZ_OFFSET_S = 7200   # the ES time_zone "+02:00" knob


def fts_date_hist_timezone(sf_dir: str) -> pa.Table:
    """ES date_histogram time_zone (fixed offset "+02:00"): daily
    buckets of BM25_QUERY hits truncated in LOCAL wall time, keys
    emitted as UTC epoch seconds of the local day start — days split
    differently than UTC whenever a hit lands within the offset of
    midnight."""
    s = Searcher(documents_index(sf_dir))
    rows = s.date_histogram_agg(
        BM25_QUERY, "ts_epoch", "day",
        time_zone_offset_s=DATE_HIST_TZ_OFFSET_S,
    )
    return pa.table({
        "day_start": pa.array([b for b, _ in rows], pa.int64()),
        "n_docs": pa.array([c for _, c in rows], pa.int64()),
    })
