"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints. All vectorized Arrow `map_batches` stages.

Scale design: pure per-row derived columns — embarrassingly parallel, no
shuffle; the analyzer reuses rayfts.analysis (same token spec as the index,
so stats agree with the search engine's view of the text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import tokens_flat

# fixed stopword list shared with the DuckDB oracle SQL (keep in sync with
# __ray_entry__.oracle_sql)
STOPWORDS = ("the", "a", "to", "ok", "and", "of", "in", "is", "it")

# tiny n-gram language-ID heuristic: characteristic tokens per language.
# This is NOT a model — a deterministic, testable heuristic (the container
# has no language-ID libraries; the plumbing is the deliverable).
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "la", "y", "es"),
}


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, token_cnt, uniq_cnt, stop_cnt, stop_ratio, avg_token_len)."""
    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    token_cnt = np.bincount(parent, minlength=n).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    stop_cnt = np.bincount(parent[is_stop], minlength=n).astype(np.int64)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    len_sum = np.bincount(parent, weights=tok_lens, minlength=n)
    denom = np.maximum(token_cnt, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_cnt": pa.array(token_cnt),
            "stop_cnt": pa.array(stop_cnt),
            "stop_ratio": pa.array(stop_cnt / denom, pa.float64()),
            "avg_token_len": pa.array(len_sum / denom, pa.float64()),
        }
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic doc-quality heuristic over length/stopword signals.

    score = clamp01(token_cnt/64) * (0.5 + 0.5*clamp01(stop_ratio*4))
    — rewards reasonable length and the presence of function words.
    """
    stats = token_stats_batch(batch, text_col)
    tc = stats["token_cnt"].to_numpy().astype(np.float64)
    sr = stats["stop_ratio"].to_numpy()
    score = np.minimum(tc / 64.0, 1.0) * (0.5 + 0.5 * np.minimum(sr * 4.0, 1.0))
    return stats.append_column("quality", pa.array(score, pa.float64()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-token language ID; returns (doc_id, lang_pred, lang_hits).

    Ties and zero-marker docs -> 'und'. Deterministic: languages compared in
    sorted key order, strict-majority wins.
    """
    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    hits = {}
    for lang in sorted(LANG_MARKERS):
        is_m = pc.is_in(
            flat, value_set=pa.array(list(LANG_MARKERS[lang]))
        ).to_numpy(zero_copy_only=False)
        hits[lang] = np.bincount(parent[is_m], minlength=n).astype(np.int64)
    langs = sorted(LANG_MARKERS)
    mat = np.stack([hits[lg] for lg in langs])  # (L, n)
    best = mat.argmax(axis=0)
    best_hits = mat.max(axis=0)
    second = np.sort(mat, axis=0)[-2] if mat.shape[0] > 1 else np.zeros(n)
    pred = np.where(
        (best_hits > 0) & (best_hits > second), np.array(langs, object)[best], "und"
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(pred, pa.string()),
            "lang_hits": pa.array(best_hits),
        }
    )


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    \"Scaling Language Models\" §A1.1 repetition filters, adapted to the
    index tokenizer): per doc,

    - ``dup_token_frac``  = 1 - distinct_tokens / token_cnt
    - ``top_token_frac``  = count(most frequent token) / token_cnt
    - ``dup_2gram_frac``  = (positions covered by a 2-gram occurring
                             more than once in the doc) / total 2-grams

    All-zero for empty docs / docs with < 2 tokens (gram leg). Exact
    integer counting, one float division at the end — the SQL oracle
    (__ray_entry__) repeats the same divisions so values match bitwise.
    Fully vectorized: dictionary-encode tokens once, then np.unique /
    bincount / reduceat — no per-row Python. Scale: pure per-row derived
    columns, no shuffle."""
    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    token_cnt = np.bincount(parent, minlength=n).astype(np.int64)
    out_uniq = np.zeros(n, dtype=np.int64)
    out_top = np.zeros(n, dtype=np.int64)
    n_grams = np.zeros(n, dtype=np.int64)
    dup_gram_pos = np.zeros(n, dtype=np.int64)
    if len(flat):
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = int(tid.max()) + 1
        # (doc, token) multiplicities -> distinct count + per-doc max
        key = parent.astype(np.int64) * V + tid
        uniq_keys, counts = np.unique(key, return_counts=True)
        docs_of = uniq_keys // V
        out_uniq = np.bincount(docs_of, minlength=n).astype(np.int64)
        np.maximum.at(out_top, docs_of, counts)  # scatter-max per doc
        # adjacent-token 2-grams within a doc
        same = parent[1:] == parent[:-1]
        if same.any():
            gdoc = parent[:-1][same].astype(np.int64)
            gram = tid[:-1][same] * V + tid[1:][same]
            # factorize grams, then count (doc, gram) multiplicities
            _, g_id = np.unique(gram, return_inverse=True)
            G = int(g_id.max()) + 1
            gkey = gdoc * G + g_id
            _, gk_inv, gk_cnt = np.unique(
                gkey, return_inverse=True, return_counts=True
            )
            n_grams = np.bincount(gdoc, minlength=n).astype(np.int64)
            dup_mask = gk_cnt[gk_inv] > 1
            dup_gram_pos = np.bincount(
                gdoc[dup_mask], minlength=n
            ).astype(np.int64)
    denom = np.maximum(token_cnt, 1).astype(np.float64)
    gdenom = np.maximum(n_grams, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_cnt": pa.array(token_cnt),
            "uniq_cnt": pa.array(out_uniq),
            "dup_token_frac": pa.array(
                np.where(token_cnt > 0, 1.0 - out_uniq / denom, 0.0),
                pa.float64(),
            ),
            "top_token_frac": pa.array(
                np.where(token_cnt > 0, out_top / denom, 0.0), pa.float64()
            ),
            "dup_2gram_frac": pa.array(
                np.where(n_grams > 0, dup_gram_pos / gdenom, 0.0),
                pa.float64(),
            ),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint: rolling polynomial hash over the token
    sequence (order-sensitive, whitespace/case-insensitive by construction).

    fp(doc) = fold(acc = acc*P + h(token)) mod 2^64 with h = md5-lower64
    (DuckDB ``md5_number_lower``) and P small enough for HUGEINT SQL math —
    the whole fold is computed VECTORIZED via the closed form
    fp = sum_i h_i * P^(L-1-i) mod 2^64 (one md5 per distinct token, numpy
    power-table gather + scatter-add; no per-token Python loop). The SQL
    oracle replicates it exactly (see __ray_entry__.oracle_sql).
    """
    from .hashing import FOLD_C, U64, hash_tokens_unique

    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    fp = np.zeros(n, dtype=U64)
    if len(flat):
        h = hash_tokens_unique(flat)
        L = np.bincount(parent, minlength=n)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(L, out=starts[1:])
        pos = np.arange(h.size, dtype=np.int64) - starts[parent]
        exp = (L[parent] - 1 - pos).astype(np.int64)
        maxe = int(exp.max())
        with np.errstate(over="ignore"):
            pows = np.empty(maxe + 1, dtype=U64)
            pows[0] = 1
            if maxe:
                np.multiply.accumulate(
                    np.full(maxe, FOLD_C, dtype=U64), out=pows[1:]
                )
            np.add.at(fp, parent, h * pows[exp])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fp.view(np.int64)),
        }
    )


def tfidf_keywords(
    ds, text_col: str = "text", group_col: str = "source",
    id_col: str = "doc_id", top_k: int = 3,
):
    """TF-IDF keyword extraction per group (the classic corpus-keyword
    op): score(term, group) = total_tf_in_group * ln(1 + N / df) with
    df = DISTINCT docs containing the term corpus-wide; per group the
    ``top_k`` terms by (score desc, term asc).

    Distributed shape: one map_batches emits BOTH per-(group, term) tf
    partials and per-(term, doc) presence rows; a groupby sums group
    tfs; the df side groups on term — its output is vocab-bounded, so
    it collects to a driver dict and is BROADCAST (ray.put once) into a
    distributed per-group top-k (groupby(grp).map_groups with a
    vectorized kernel — the driver sees only groups * top_k rows; a
    web-scale open vocab would hash-join the df side instead —
    documented divergence). Returns a list of (group, term, score_e6)
    rows, group asc then rank."""
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def tf_rows(batch: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(batch[text_col])
        if len(flat) == 0:
            return pa.table({
                "grp": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            })
        grp = batch[group_col].to_numpy(zero_copy_only=False)[parent]
        t = pa.table({
            "grp": pa.array(grp, pa.string()),
            "term": flat if isinstance(flat, pa.Array) else pa.array(flat),
        })
        g = t.group_by(["grp", "term"], use_threads=False).aggregate(
            [("term", "count")]
        )
        return pa.table({
            "grp": g["grp"], "term": g["term"],
            "tf": g["term_count"].cast(pa.int64()),
        })

    def df_rows(batch: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(batch[text_col])
        if len(flat) == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "doc": pa.array([], pa.int64()),
            })
        ids = batch[id_col].to_numpy(zero_copy_only=False)[parent]
        t = pa.table({
            "term": flat if isinstance(flat, pa.Array) else pa.array(flat),
            "doc": pa.array(ids, pa.int64()),
        })
        # distinct (term, doc) per batch; docs never span batches, so
        # these rows are globally distinct
        return t.group_by(["term", "doc"], use_threads=False).aggregate([])

    n_docs = ds.count()
    tf = ds.map_batches(tf_rows, batch_format="pyarrow") \
        .groupby(["grp", "term"]).aggregate(Sum("tf"))
    dfs = ds.map_batches(df_rows, batch_format="pyarrow") \
        .groupby("term").aggregate(Count())
    df_map = {
        r["term"]: r["count()"]
        for b in ray.get(dfs.to_arrow_refs())
        for r in b.to_pylist()
    }
    df_ref = ray.put(df_map)  # broadcast once, read per group task

    def group_topk(g: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        terms = g["term"].to_pylist()
        tfs = g["sum(tf)"].to_numpy(zero_copy_only=False)
        scores = [
            int(math.floor(
                int(c) * math.log(1.0 + n_docs / dfm[t]) * 1e6 + 0.5
            ))
            for t, c in zip(terms, tfs)
        ]
        order = sorted(
            range(len(terms)), key=lambda i: (-scores[i], terms[i])
        )[:top_k]
        return pa.table({
            "grp": pa.array([g["grp"][0].as_py()] * len(order)),
            "term": pa.array([terms[i] for i in order], pa.string()),
            "score_e6": pa.array([scores[i] for i in order], pa.int64()),
        })

    picked = tf.groupby("grp").map_groups(
        group_topk, batch_format="pyarrow"
    )
    rows = [
        (r["grp"], r["term"], r["score_e6"])
        for b in ray.get(picked.to_arrow_refs())
        for r in b.to_pylist()
    ]
    rows.sort(key=lambda x: (x[0], -x[2], x[1]))
    return rows


# C4/Gopher-style quality-filter funnel: integer-ratio thresholds so the
# SQL twin compares with cross-multiplication, never floats
QF_MIN_TOKENS = 25          # rule 1: doc shorter than this drops
QF_TOP_P, QF_TOP_Q = 1, 8   # rule 2: top-token frac > 1/8 drops
QF_GRAM_P, QF_GRAM_Q = 1, 10  # rule 3: dup-2gram frac > 1/10 drops


def qf_rule_flags(batch: pa.Table, text_col: str = "text"):
    """Per-doc quality-rule flags (r1 min_tokens, r2 top_token, r3
    dup_2gram, kept) — the shared first-failing-rule kernel behind the
    funnel AND the composed prep pipeline. Integer cross-multiplied
    thresholds only; fully vectorized (bincount / unique / add.at)."""
    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    token_cnt = np.bincount(parent, minlength=n).astype(np.int64)
    top_c = np.zeros(n, dtype=np.int64)
    ng = np.zeros(n, dtype=np.int64)
    dp = np.zeros(n, dtype=np.int64)
    if len(flat):
        enc = pc.dictionary_encode(
            flat if not isinstance(flat, pa.ChunkedArray)
            else flat.combine_chunks()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nv = len(enc.dictionary)
        # per-doc top token count: bincount on (row, code) pairs
        pair = parent * nv + codes
        uniq, cnt = np.unique(pair, return_counts=True)
        rows_u = uniq // nv
        np.maximum.at(top_c, rows_u, cnt)
        # 2-grams within rows: adjacent positions, same parent
        if codes.size >= 2:
            same = parent[1:] == parent[:-1]
            g_parent = parent[:-1][same]
            g_key = (parent[:-1] * nv + codes[:-1])[same] * nv \
                + codes[1:][same]
            gu, gcnt = np.unique(g_key, return_counts=True)
            g_rows = gu // (nv * nv)
            ng = np.bincount(g_parent, minlength=n).astype(np.int64)
            dup = gcnt > 1
            dp = np.zeros(n, dtype=np.int64)
            np.add.at(dp, g_rows[dup], gcnt[dup])
    r1 = token_cnt < QF_MIN_TOKENS
    r2 = ~r1 & (top_c * QF_TOP_Q > token_cnt * QF_TOP_P)
    r3 = ~r1 & ~r2 & (dp * QF_GRAM_Q > ng * QF_GRAM_P)
    kept = ~r1 & ~r2 & ~r3
    return r1, r2, r3, kept


def quality_filter_funnel(ds, text_col: str = "text"):
    """Composed quality-filter funnel (the C4 / Gopher rule-stack
    shape): each doc is attributed to its FIRST failing rule —
    min_tokens, then top-token concentration, then duplicate-2gram
    coverage — or 'kept'. Thresholds are integer ratios compared by
    cross-multiplication (top_c * Q > token_cnt * P), so engine and SQL
    agree exactly with no float comparisons.

    Distributed shape: one vectorized map_batches computes the three
    repetition integers per doc (the repetition_stats kernels) and
    emits per-rule partial counts; the driver sums O(rules) rows.
    Returns [(rule, n_docs)] in funnel order + 'kept'."""
    import ray

    rules = ("min_tokens", "top_token", "dup_2gram", "kept")

    def classify(batch: pa.Table) -> pa.Table:
        r1, r2, r3, kept = qf_rule_flags(batch, text_col)
        return pa.table({
            "rule": pa.array(rules, pa.string()),
            "n": pa.array(
                [int(r1.sum()), int(r2.sum()), int(r3.sum()),
                 int(kept.sum())], pa.int64(),
            ),
        })

    totals = {r: 0 for r in rules}
    parts = ds.map_batches(classify, batch_format="pyarrow")
    for b in ray.get(parts.to_arrow_refs()):
        for r in b.to_pylist():
            totals[r["rule"]] += r["n"]
    return [(r, totals[r]) for r in rules]


def categorize_batch(batch: pa.Table, text_col: str = "text",
                     k_tokens: int = 3) -> pa.Table:
    """Per-batch partial of the categorize_text aggregation: each doc's
    category key = its first ``k_tokens`` analyzer tokens with digit
    runs masked to ``#`` (the drain-style template rule), joined with
    spaces; emits one (category, n_p) row per distinct key per batch
    (map-side combine). Fully vectorized: tokens_flat + one RE2
    replace + position-sliced element-wise join."""
    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    masked = pc.replace_substring_regex(flat, pattern="[0-9]+",
                                        replacement="#")
    # rebuild per-doc token lists (parent is sorted asc), head-slice,
    # join — all Arrow kernels, no Python rows
    counts = np.bincount(parent, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), masked)
    keys = pc.binary_join(
        pc.list_slice(lists, 0, k_tokens), pa.scalar(" ")
    )
    enc = keys.dictionary_encode()
    cnt = np.bincount(
        enc.indices.to_numpy(zero_copy_only=False),
        minlength=len(enc.dictionary),
    )
    return pa.table({
        "category": enc.dictionary,
        "n_p": pa.array(cnt.astype(np.int64)),
    })


def categorize_texts(ds, k_tokens: int = 3, top_n: int = 10,
                     text_col: str = "text"):
    """ES categorize_text aggregation analog (the ML log-template
    bucketing, reduced to a deterministic template: first-k masked
    tokens): map-side per-batch partial counts -> ONE small groupby on
    category -> top_n (count desc, key asc) on the O(categories)
    result. Returns [(category, n_docs)]."""
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(
            lambda b: categorize_batch(b, text_col, k_tokens),
            batch_format="pyarrow",
        )
        .groupby("category")
        .aggregate(Sum("n_p"))
        .to_pandas()
    )
    out = out.sort_values(
        ["sum(n_p)", "category"], ascending=[False, True]
    ).head(top_n)
    return [
        (str(c), int(v))
        for c, v in zip(out["category"], out["sum(n_p)"])
    ]


def token_entropy_batch(batch: pa.Table,
                        text_col: str = "text") -> pa.Table:
    """Per-doc Shannon entropy of the token distribution — the
    repetitiveness/diversity quality signal (low entropy = a few tokens
    dominate): H = ln(n) − (Σ_t c_t·ln c_t)/n in nats, emitted as e6.
    Empty docs emit n_tokens = 0, entropy_e6 = 0 (the SQL coalesce
    rule). Fully vectorized: one dictionary encode, one unique over
    (row, code) pairs, one scatter-add of c·ln c per row."""
    n = batch.num_rows
    flat, parent = tokens_flat(batch[text_col])
    tok_n = np.bincount(parent, minlength=n).astype(np.int64)
    s = np.zeros(n, dtype=np.float64)
    if len(flat):
        enc = pc.dictionary_encode(
            flat if not isinstance(flat, pa.ChunkedArray)
            else flat.combine_chunks()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nv = len(enc.dictionary)
        pair = parent * nv + codes
        uniq, cnt = np.unique(pair, return_counts=True)
        np.add.at(s, uniq // nv, cnt * np.log(cnt))
    ent = np.zeros(n, dtype=np.float64)
    pos = tok_n > 0
    ent[pos] = np.log(tok_n[pos]) - s[pos] / tok_n[pos]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(tok_n, pa.int64()),
        "entropy_e6": pa.array(
            np.round(ent * 1e6).astype(np.int64), pa.int64()
        ),
    })
