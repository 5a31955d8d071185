"""DuckDB SQL generators that replicate the near-dedup / text-analysis
operators EXACTLY — the oracle side of the driver's correctness gate.

Each generator embeds the engine's own constants (permutation params,
hyperplane coordinates, fold multipliers) as SQL literals, so both sides
compute the same integers:

  * token hash  : DuckDB ``md5_number_lower(term)`` == engine md5-lower64
    (little-endian uint64 of the LAST 8 md5 bytes — verified bit-equal);
  * mod-2^64    : HUGEINT arithmetic with explicit ``% 2^64`` at every step
    where a product could exceed HUGEINT range (the engine side is plain
    uint64 wraparound);
  * mod-mul of two u64 (fingerprint): 32-bit split
    ``((h>>32)*v % W * 2^32 + (h&0xffffffff)*v) % W`` keeps every
    intermediate < 2^97 < HUGEINT max;
  * Jaccard threshold: exact integer cross-multiplication
    (``inter*den >= num*union``) — no float boundary on either side;
  * connected components: recursive min-label closure over the verified
    edge set (undirected), grounded at every doc.

These SQL strings are large but purely generated; __ray_entry__.oracle_sql
exposes them to the driver.
"""

from __future__ import annotations

import numpy as np

from .dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    DEFAULT_SHINGLE_K,
    M61,
    perm_params,
    threshold_fraction,
)
from .hashing import FOLD_C
from .textstats import LANG_MARKERS

W = 1 << 64
I64_BIAS = 1 << 63

_TOK = r"[\p{L}\p{N}_]+"


def _toks_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    return (
        f"tokl AS (SELECT {id_col} AS doc_id, "
        f"regexp_extract_all(lower(text), '{_TOK}') AS l FROM {table}),\n"
        "tok AS (SELECT doc_id, generate_subscripts(l,1) AS pos, "
        "unnest(l) AS term FROM tokl)"
    )


def _cc_sql(node_table: str, node_col: str, out_id_name: str) -> str:
    """Min-label connected components over CTE ``edges(a,b)``; every row of
    ``node_table`` is grounded (singletons label themselves)."""
    return f"""
edges2 AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
cc AS (
  SELECT {node_col} AS node, {node_col} AS label FROM {node_table}
  UNION
  SELECT e.b AS node, c.label FROM cc c JOIN edges2 e ON e.a = c.node
)
SELECT node AS {out_id_name}, min(label) AS cluster_id FROM cc GROUP BY node
"""


# ---------------------------------------------------------------------------
# MinHash + LSH dedup
# ---------------------------------------------------------------------------


def minhash_dedup_sql(
    threshold: float = 0.8,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> str:
    assert shingle_k == 3, "SQL generator written for the k=3 spec"
    a, b = perm_params(num_perm)
    rows_per_band = num_perm // bands
    perm_vals = ",".join(
        f"({p},{int(a[p])},{int(b[p])})" for p in range(num_perm)
    )
    # band fold multiplier for row r: C^(rows_per_band-1-r) mod 2^64
    mults = [pow(FOLD_C, rows_per_band - 1 - r, W) for r in range(rows_per_band)]
    mult_vals = ",".join(f"({r},{m})" for r, m in enumerate(mults))
    # empty-doc band hash: fold over rows_per_band copies of M61
    ebh = 0
    for _ in range(rows_per_band):
        ebh = (ebh * FOLD_C + M61) % W
    ebh_signed = ebh - I64_BIAS
    band_ids = ",".join(f"({i})" for i in range(bands))
    tnum, tden = threshold_fraction(threshold)
    C = FOLD_C
    return f"""
WITH RECURSIVE
{_toks_cte()},
th AS (SELECT doc_id, pos, md5_number_lower(term)::HUGEINT AS h FROM tok),
wn AS (SELECT doc_id, pos, h,
        lead(h,1) OVER (PARTITION BY doc_id ORDER BY pos) AS h1,
        lead(h,2) OVER (PARTITION BY doc_id ORDER BY pos) AS h2,
        count(*) OVER (PARTITION BY doc_id) AS L
      FROM th),
sh AS (
  SELECT doc_id, (((((h*{C})%{W} + h1)%{W})*{C})%{W} + h2)%{W} AS sh
  FROM wn WHERE h2 IS NOT NULL
  UNION ALL
  SELECT doc_id, CASE WHEN L = 1 THEN h ELSE ((h*{C})%{W} + h1)%{W} END
  FROM wn WHERE L < 3 AND pos = 1
),
perms(p, a, b) AS (VALUES {perm_vals}),
sigs AS (
  SELECT s.doc_id, pr.p, min(((pr.a * s.sh + pr.b) % {W}) % {M61}) AS v
  FROM sh s CROSS JOIN perms pr GROUP BY s.doc_id, pr.p
),
mult(r, m) AS (VALUES {mult_vals}),
band AS (
  SELECT doc_id, CAST(p // {rows_per_band} AS INTEGER) AS band_id,
         (sum((v * mult.m) % {W}) % {W}) - {I64_BIAS} AS band_hash
  FROM sigs JOIN mult ON mult.r = p % {rows_per_band}
  GROUP BY doc_id, p // {rows_per_band}
),
nodoc AS (
  SELECT d.doc_id FROM documents d
  WHERE d.doc_id NOT IN (SELECT DISTINCT doc_id FROM sh)
),
band_all AS (
  SELECT * FROM band
  UNION ALL
  SELECT n.doc_id, bb.band_id, {ebh_signed}::HUGEINT
  FROM nodoc n CROSS JOIN (VALUES {band_ids}) bb(band_id)
),
cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM band_all b1 JOIN band_all b2
    ON b1.band_id = b2.band_id AND b1.band_hash = b2.band_hash
   AND b1.doc_id < b2.doc_id
),
shd AS (SELECT DISTINCT doc_id, sh FROM sh),
sc AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN shd sa ON sa.doc_id = c.a
  JOIN shd sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
),
edges AS (
  SELECT c.a, c.b FROM cand c
  LEFT JOIN inter ON inter.a = c.a AND inter.b = c.b
  LEFT JOIN sc na ON na.doc_id = c.a
  LEFT JOIN sc nb ON nb.doc_id = c.b
  WHERE coalesce(inter.i, 0) * {tden}
        >= {tnum} * (coalesce(na.n,0) + coalesce(nb.n,0) - coalesce(inter.i,0))
),
{_cc_sql("documents", "doc_id", "doc_id")}
"""


def decontaminate_sql(bench_mod: int = 17,
                      shingle_k: int = DEFAULT_SHINGLE_K) -> str:
    """Per corpus doc (doc_id % bench_mod != 0): count of DISTINCT k=3
    shingles shared with the benchmark side (doc_id % bench_mod == 0).
    Shingle CTE identical to minhash_dedup_sql — the same fold spec the
    engine's shingle_hashes_batch implements."""
    assert shingle_k == 3, "SQL generator written for the k=3 spec"
    C = FOLD_C
    return f"""
WITH
{_toks_cte()},
th AS (SELECT doc_id, pos, md5_number_lower(term)::HUGEINT AS h FROM tok),
wn AS (SELECT doc_id, pos, h,
        lead(h,1) OVER (PARTITION BY doc_id ORDER BY pos) AS h1,
        lead(h,2) OVER (PARTITION BY doc_id ORDER BY pos) AS h2,
        count(*) OVER (PARTITION BY doc_id) AS L
      FROM th),
sh AS (
  SELECT doc_id, (((((h*{C})%{W} + h1)%{W})*{C})%{W} + h2)%{W} AS sh
  FROM wn WHERE h2 IS NOT NULL
  UNION ALL
  SELECT doc_id, CASE WHEN L = 1 THEN h ELSE ((h*{C})%{W} + h1)%{W} END
  FROM wn WHERE L < 3 AND pos = 1
),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT doc_id, count(DISTINCT sh) AS n_hits FROM sh
  WHERE doc_id % {bench_mod} != 0 AND sh IN (SELECT sh FROM bench)
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {bench_mod} != 0
"""


def ngram_jaccard_sql(threshold: float = 0.5,
                      shingle_k: int = DEFAULT_SHINGLE_K,
                      lb_chars: int = 64) -> str:
    """Exact blocked n-gram Jaccard pairs — the oracle of
    extras.dedup.ngram_jaccard_pairs. Shingle CTE identical to
    minhash_dedup_sql (same fold spec); candidate pairs are ALL doc
    pairs sharing (lang, n_chars // lb_chars); threshold and jac_e6 are
    pure integer math on both sides."""
    assert shingle_k == 3, "SQL generator written for the k=3 spec"
    tnum, tden = threshold_fraction(threshold)
    C = FOLD_C
    return f"""
WITH
{_toks_cte()},
th AS (SELECT doc_id, pos, md5_number_lower(term)::HUGEINT AS h FROM tok),
wn AS (SELECT doc_id, pos, h,
        lead(h,1) OVER (PARTITION BY doc_id ORDER BY pos) AS h1,
        lead(h,2) OVER (PARTITION BY doc_id ORDER BY pos) AS h2,
        count(*) OVER (PARTITION BY doc_id) AS L
      FROM th),
sh AS (
  SELECT doc_id, (((((h*{C})%{W} + h1)%{W})*{C})%{W} + h2)%{W} AS sh
  FROM wn WHERE h2 IS NOT NULL
  UNION ALL
  SELECT doc_id, CASE WHEN L = 1 THEN h ELSE ((h*{C})%{W} + h1)%{W} END
  FROM wn WHERE L < 3 AND pos = 1
),
shd AS (SELECT DISTINCT doc_id, sh FROM sh),
sc AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
pairs AS (
  SELECT d1.doc_id AS a, d2.doc_id AS b
  FROM documents d1 JOIN documents d2
    ON d1.lang = d2.lang
   AND d1.n_chars // {lb_chars} = d2.n_chars // {lb_chars}
   AND d1.doc_id < d2.doc_id
),
inter AS (
  SELECT p.a, p.b, count(*) AS i
  FROM pairs p
  JOIN shd sa ON sa.doc_id = p.a
  JOIN shd sb ON sb.doc_id = p.b AND sb.sh = sa.sh
  GROUP BY p.a, p.b
)
SELECT i.a, i.b, i.i::BIGINT AS inter,
       (na.n + nb.n - i.i)::BIGINT AS uni,
       ((2000000 * i.i + (na.n + nb.n - i.i))
        // (2 * (na.n + nb.n - i.i)))::BIGINT AS jac_e6
FROM inter i
JOIN sc na ON na.doc_id = i.a
JOIN sc nb ON nb.doc_id = i.b
WHERE i.i * {tden} >= {tnum} * (na.n + nb.n - i.i)
ORDER BY i.a, i.b
"""


# ---------------------------------------------------------------------------
# SimHash dedup
# ---------------------------------------------------------------------------


def simhash_dedup_sql(max_hamming: int = 3, bands: int = 4) -> str:
    band_bits = 64 // bands
    bit_vals = ",".join(f"({i},{1 << i})" for i in range(64))
    band_ids = ",".join(f"({i})" for i in range(bands))
    return f"""
WITH RECURSIVE
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
th AS (SELECT doc_id, tf, md5_number_lower(term)::HUGEINT AS h FROM tf),
bits(bpos, w) AS (VALUES {bit_vals}),
acc AS (
  SELECT t.doc_id, b.bpos,
         sum(t.tf * (2 * ((t.h >> b.bpos) & 1) - 1)) AS s
  FROM th t CROSS JOIN bits b GROUP BY t.doc_id, b.bpos
),
sigu AS (
  SELECT a.doc_id, sum(CASE WHEN a.s > 0 THEN b.w::HUGEINT ELSE 0 END) AS sig
  FROM acc a JOIN bits b USING (bpos) GROUP BY a.doc_id
),
sigall AS (
  SELECT d.doc_id, coalesce(s.sig, 0)::HUGEINT AS sig
  FROM documents d LEFT JOIN sigu s USING (doc_id)
),
band AS (
  SELECT doc_id, bb.band_id, (sig >> (bb.band_id * {band_bits})) & {(1 << band_bits) - 1} AS key
  FROM sigall CROSS JOIN (VALUES {band_ids}) bb(band_id)
),
cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM band b1 JOIN band b2
    ON b1.band_id = b2.band_id AND b1.key = b2.key AND b1.doc_id < b2.doc_id
),
sigi AS (
  SELECT doc_id,
         CAST(CASE WHEN sig >= {I64_BIAS} THEN sig - {W} ELSE sig END AS BIGINT) AS s
  FROM sigall
),
edges AS (
  SELECT c.a, c.b FROM cand c
  JOIN sigi sa ON sa.doc_id = c.a
  JOIN sigi sb ON sb.doc_id = c.b
  WHERE bit_count(xor(sa.s, sb.s)) <= {max_hamming}
),
{_cc_sql("documents", "doc_id", "doc_id")}
"""


# ---------------------------------------------------------------------------
# text fingerprint (rolling polynomial hash mod 2^64)
# ---------------------------------------------------------------------------


def fingerprint_sql() -> str:
    C = FOLD_C
    return f"""
WITH RECURSIVE
{_toks_cte()},
th AS (SELECT doc_id, pos, md5_number_lower(term)::HUGEINT AS h FROM tok),
cnt AS (SELECT doc_id, count(*) AS L FROM th GROUP BY doc_id),
pw(e, v) AS (
  SELECT 0, 1::HUGEINT
  UNION ALL
  SELECT e + 1, (v * {C}) % {W} FROM pw
  WHERE e < (SELECT coalesce(max(L), 0) FROM cnt)
),
contrib AS (
  SELECT t.doc_id,
         ( (((t.h >> 32) * p.v) % {W} * 4294967296) % {W}
           + ((t.h & 4294967295) * p.v) % {W} ) % {W} AS c
  FROM th t JOIN cnt ct ON ct.doc_id = t.doc_id
  JOIN pw p ON p.e = ct.L - t.pos
),
fpu AS (SELECT doc_id, sum(c) % {W} AS fp FROM contrib GROUP BY doc_id)
SELECT d.doc_id,
       CAST(CASE WHEN coalesce(f.fp, 0) >= {I64_BIAS}
                 THEN coalesce(f.fp, 0) - {W}
                 ELSE coalesce(f.fp, 0) END AS BIGINT) AS fingerprint
FROM documents d LEFT JOIN fpu f USING (doc_id)
"""


# ---------------------------------------------------------------------------
# language ID (marker-token heuristic)
# ---------------------------------------------------------------------------


def lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    hit_cols = []
    for lg in langs:
        markers = ",".join(f"'{m}'" for m in LANG_MARKERS[lg])
        hit_cols.append(
            f"count(CASE WHEN t.term IN ({markers}) THEN 1 END) AS h_{lg}"
        )
    hit_list = ",\n         ".join(hit_cols)
    greatest = "greatest(" + ",".join(f"h_{lg}" for lg in langs) + ")"
    nmax = " + ".join(f"CASE WHEN h_{lg} = best THEN 1 ELSE 0 END" for lg in langs)
    pred_cases = "\n       ".join(
        f"WHEN best = h_{lg} THEN '{lg}'" for lg in langs[:-1]
    )
    return f"""
WITH
{_toks_cte()},
hits AS (
  SELECT d.doc_id,
         {hit_list}
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
),
sel AS (SELECT *, {greatest} AS best FROM hits)
SELECT doc_id,
  CASE WHEN best = 0 OR ({nmax}) > 1 THEN 'und'
       {pred_cases}
       ELSE '{langs[-1]}' END AS lang_pred,
  best AS lang_hits
FROM sel
"""


# ---------------------------------------------------------------------------
# hyperplane LSH over embeddings (knn + near-dup)
# ---------------------------------------------------------------------------


def _planes_values(n_planes: int, dim: int, seed: int) -> str:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    rows = []
    for p in range(n_planes):
        for i in range(dim):
            rows.append(f"({p},{i + 1},{planes[p, i]!r})")
    return ",".join(rows)


def knn_lsh_sql(k: int = 10, n_planes: int = 4, dim: int = 64, seed: int = 11) -> str:
    """Bucket-filtered exact cosine top-k; query = embeddings.vec_id 0.
    Plane coordinates are the engine's own seeded values embedded as
    literals (repr round-trips float64 exactly)."""
    return f"""
WITH
planes(pid, i, val) AS (VALUES {_planes_values(n_planes, dim, seed)}),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
q AS (SELECT i, val FROM v WHERE vec_id = 0),
vdot AS (
  SELECT v.vec_id, p.pid, sum(v.val * p.val) AS dot
  FROM v JOIN planes p USING (i) GROUP BY v.vec_id, p.pid
),
vb AS (
  SELECT vec_id, sum(CASE WHEN dot > 0 THEN 1 << pid ELSE 0 END) AS b
  FROM vdot GROUP BY vec_id
),
qb AS (SELECT b FROM vb WHERE vec_id = 0),
dots AS (
  SELECT v.vec_id, sum(v.val * q.val) AS dot,
         sum(v.val * v.val) AS n2, sum(q.val * q.val) AS q2
  FROM v JOIN q USING (i)
  WHERE v.vec_id IN (SELECT vec_id FROM vb WHERE b = (SELECT b FROM qb))
  GROUP BY v.vec_id
)
SELECT vec_id,
       CAST(round(dot / (sqrt(n2) * sqrt(q2)) * 1e6) AS BIGINT) AS cosine_sim_e6
FROM dots ORDER BY cosine_sim_e6 DESC, vec_id LIMIT {k}
"""


def embedding_near_dup_sql(
    threshold: float = 0.95, n_planes: int = 8, dim: int = 64, seed: int = 11
) -> str:
    return f"""
WITH RECURSIVE
planes(pid, i, val) AS (VALUES {_planes_values(n_planes, dim, seed)}),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
vdot AS (
  SELECT v.vec_id, p.pid, sum(v.val * p.val) AS dot
  FROM v JOIN planes p USING (i) GROUP BY v.vec_id, p.pid
),
vb AS (
  SELECT vec_id, sum(CASE WHEN dot > 0 THEN 1 << pid ELSE 0 END) AS b
  FROM vdot GROUP BY vec_id
),
pairs AS (
  SELECT v1.vec_id AS a, v2.vec_id AS b
  FROM vb v1 JOIN vb v2 ON v1.b = v2.b AND v1.vec_id < v2.vec_id
),
norms AS (SELECT vec_id, sum(val * val) AS n2 FROM v GROUP BY vec_id),
pd AS (
  SELECT p.a, p.b, sum(x.val * y.val) AS dot
  FROM pairs p
  JOIN v x ON x.vec_id = p.a
  JOIN v y ON y.vec_id = p.b AND y.i = x.i
  GROUP BY p.a, p.b
),
edges AS (
  SELECT pd.a, pd.b FROM pd
  JOIN norms na ON na.vec_id = pd.a
  JOIN norms nb ON nb.vec_id = pd.b
  WHERE pd.dot / (sqrt(na.n2) * sqrt(nb.n2)) >= {threshold}
),
{_cc_sql("embeddings", "vec_id", "vec_id")}
"""


def dup_window_sql(w: int = 5, limit: int = 20) -> str:
    """Duplicate-window detection twin of dedup.dup_window_counts: the
    same fold-shingle windows (md5_number_lower tokens, C-fold mod
    2^64, docs with 0 < L < w folding once), a window value in >= 2
    distinct docs is duplicated, each doc charged every duplicated
    window position. Top ``limit`` docs by (n_dup desc, doc_id asc)."""
    C = FOLD_C
    leads = ",\n        ".join(
        f"lead(h,{i}) OVER win AS h{i}" for i in range(1, w)
    )
    # full-window fold: ((...(h*C + h1)*C + h2 ...) mod 2^64
    acc = "h"
    for i in range(1, w):
        acc = f"(({acc}*{C})%{W} + h{i})%{W}"
    # short-doc fold (pos=1, L<w): fold of the doc's L tokens
    short_accs = ["h"]
    for i in range(1, w - 1):
        short_accs.append(f"(({short_accs[-1]}*{C})%{W} + h{i})%{W}")
    short_case = "CASE L " + " ".join(
        f"WHEN {ln} THEN {short_accs[ln - 1]}" for ln in range(1, w)
    ) + " END"
    return f"""
WITH {_toks_cte()},
th AS (SELECT doc_id, pos, md5_number_lower(term)::HUGEINT AS h FROM tok),
wn AS (SELECT doc_id, pos, h,
        {leads},
        count(*) OVER (PARTITION BY doc_id) AS L
      FROM th
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
sh AS (
  SELECT doc_id, {acc} AS sh FROM wn WHERE h{w - 1} IS NOT NULL
  UNION ALL
  SELECT doc_id, {short_case} FROM wn WHERE L < {w} AND pos = 1
),
dup AS (
  SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS nd FROM sh GROUP BY sh)
  WHERE nd >= 2
)
SELECT doc_id, count(*) AS n_dup FROM sh
WHERE sh IN (SELECT sh FROM dup)
GROUP BY doc_id ORDER BY n_dup DESC, doc_id LIMIT {limit}
"""


def winnow_sql(k: int = 4, w: int = 5) -> str:
    """Winnowing-fingerprint twin of dedup.winnow_fingerprint_counts:
    the same k-gram fold hashes (md5_number_lower tokens, C-fold mod
    2^64, short docs folding once), packed key
    (hash mod 2^40)*2^24 + (2^24-1-pos), rightmost-min-per-window
    selection via a ROWS frame min, distinct selected keys per doc,
    (count, sum mod 2^61). Window starts are positions
    p <= greatest(L - w, 0) — docs with fewer than w k-grams form one
    whole-doc window, exactly the engine's sentinel-padded blocks."""
    C = FOLD_C
    leads = ",\n        ".join(
        f"lead(h,{i}) OVER win AS h{i}" for i in range(1, k)
    )
    acc = "h"
    for i in range(1, k):
        acc = f"(({acc}*{C})%{W} + h{i})%{W}"
    short_accs = ["h"]
    for i in range(1, k - 1):
        short_accs.append(f"(({short_accs[-1]}*{C})%{W} + h{i})%{W}")
    short_case = "CASE Lt " + " ".join(
        f"WHEN {ln} THEN {short_accs[ln - 1]}" for ln in range(1, k)
    ) + " END"
    hmod = 1 << 40
    pmul = 1 << 24
    return f"""
WITH {_toks_cte()},
th AS (SELECT doc_id, pos, md5_number_lower(term)::HUGEINT AS h FROM tok),
wn AS (SELECT doc_id, pos, h,
        {leads},
        count(*) OVER (PARTITION BY doc_id) AS Lt
      FROM th
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
kg AS (
  SELECT doc_id, pos, {acc} AS sh FROM wn WHERE h{k - 1} IS NOT NULL
  UNION ALL
  SELECT doc_id, pos, {short_case} FROM wn WHERE Lt < {k} AND pos = 1
),
kp AS (SELECT doc_id,
        row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS p,
        sh,
        count(*) OVER (PARTITION BY doc_id) AS L
       FROM kg),
kv AS (SELECT doc_id, p, L,
        (sh % {hmod}) * {pmul} + ({pmul - 1} - p) AS kvv
       FROM kp),
wm AS (SELECT doc_id, p, L,
        min(kvv) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
          AS kmin
       FROM kv),
sel AS (SELECT DISTINCT doc_id, kmin FROM wm
        WHERE p <= greatest(L - {w}, 0))
SELECT doc_id, count(*)::BIGINT AS n_fp,
       (sum(kmin) % {1 << 61})::BIGINT AS fp_sum
FROM sel GROUP BY doc_id ORDER BY doc_id
"""
