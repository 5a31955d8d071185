"""Query path: BM25 top-k over compressed postings + point lookups.

Reference read paths (SURVEY §3.3): order-preserving multiget
(``dao/EntityDao.java:180-248``, order pinned by
``dao/EntityDaoITest.java:266-280``; missing id -> DaoException at 241-243),
count (``integration/PluginIntegrationITest.java:43-45``) and search queries
delegated to ES. Here search is explicit: exact Lucene-style BM25
(k1=1.2, b=0.75) with two interchangeable executors —

  * TAAT ("term-at-a-time"): vectorized numpy accumulator, the executable
    reference implementation;
  * block-max WAND: heap top-k with pivot skipping over the per-block
    (max_tf, min_dl) impact bounds stored by the codec.

Both accumulate per-doc contributions in ascending unique-term order with
float64 throughout, so they are bit-identical to each other and to
``rayfts.oracle.BruteForceIndex`` (the spec). Top-k order:
(score desc, doc_id asc).
"""

from __future__ import annotations

import heapq
import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray

from .build import FORMAT_VERSION, term_bucket_py
from .codec import decode_blocks, decode_postings
from .manifest import load_manifest

_WORD = re.compile(r"\w+", re.UNICODE)


def tokenize_query(q: str) -> list[str]:
    return _WORD.findall(q.lower())


def query_shingles(toks: list[str], n: int) -> list[str]:
    """Query-side twin of the index shingle filter (ES search_as_you_type
    ``._Ngram`` subfield): adjacent n-token windows, space-joined, in
    token order. Fewer than n tokens -> no shingles."""
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


_RANGE_OPS = ("gte", "gt", "lte", "lt")


def _after_keep(scores: np.ndarray, docs: np.ndarray, after) -> np.ndarray:
    """search_after cursor predicate: keep hits ranked strictly AFTER
    ``after = (score, doc_id)`` in (score desc, doc_id asc) order.
    Scores are deterministic float64 (bit-identical across executors), so
    exact equality on the tie leg is sound — the cursor is a previous
    page's last hit, produced by the same arithmetic."""
    cs, cd = after
    return (scores < cs) | ((scores == cs) & (docs > cd))


def calendar_floor(epoch_s: np.ndarray, unit: str) -> np.ndarray:
    """Vectorized calendar truncation: UTC epoch seconds -> epoch seconds
    of the containing period's start, via numpy datetime64 unit casts (no
    Python date objects). ``unit`` is a numpy unit code (m/h/D/W/M/Y).
    datetime64[W] floors to the Thursday-anchored week (epoch day 0 is a
    Thursday); shifting by +3 days makes that floor land on Monday (ISO
    week start — the ES and SQL date_trunc('week') convention)."""
    t = epoch_s.astype("datetime64[s]")
    if unit == "W":
        return (
            (t + np.timedelta64(3, "D")).astype("datetime64[W]")
            .astype("datetime64[s]") - np.timedelta64(3 * 86400, "s")
        ).astype(np.int64)
    return (
        t.astype(f"datetime64[{unit}]").astype("datetime64[s]")
        .astype(np.int64)
    )


def calendar_range(lo_s: int, hi_s: int, unit: str) -> np.ndarray:
    """All calendar-period starts from ``lo_s`` to ``hi_s`` inclusive
    (both must already be period starts under :func:`calendar_floor`) —
    the bucket axis a min_doc_count=0 date_histogram fills. Fixed-width
    units step in seconds; months/years step in datetime64 units (true
    calendar lengths)."""
    step = {"m": 60, "h": 3600, "D": 86400, "W": 7 * 86400}.get(unit)
    if step is not None:
        return np.arange(lo_s, hi_s + 1, step, dtype=np.int64)
    a = np.datetime64(int(lo_s), "s").astype(f"datetime64[{unit}]")
    b = np.datetime64(int(hi_s), "s").astype(f"datetime64[{unit}]")
    return (
        np.arange(a, b + 1).astype("datetime64[s]").astype(np.int64)
    )


def _snippet(text: str, pos: int, window: int) -> str:
    """Analyzed-token snippet: the tokens within ±window of token index
    ``pos``, space-joined (the deterministic, SQL-replicable fragment
    shape — list_slice over regexp_extract_all on the oracle side)."""
    toks = tokenize_query(text)
    return " ".join(toks[max(pos - window, 0) : pos + window + 1])


_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")


def parse_query_weights(q: str) -> dict[str, float]:
    """Lucene query-string clause boosts: each whitespace clause may carry
    a ``^boost`` suffix ('spark^3 join'); the clause's analyzed terms each
    add its boost to their weight (unboosted clauses add 1.0, so the
    boost-free result equals Counter(tokenize_query(q))). Duplicate
    clauses SUM — the ES should-clause summation: per-clause score =
    boost * idf * saturation, and saturation depends only on (doc, term),
    so clauses of one term collapse into one weight."""
    weights: dict[str, float] = {}
    for clause in q.split():
        boost, body = 1.0, clause
        m = _BOOST_RE.search(clause)
        if m:
            boost = float(m.group(1))
            body = clause[: m.start()]
        for t in tokenize_query(body):
            weights[t] = weights.get(t, 0.0) + boost
    return weights


def _percentiles_from_sorted(sel: np.ndarray, percents) -> dict:
    """Linear-interpolation percentiles over an already-sorted array —
    the SQL quantile_cont / numpy 'linear' definition: rank = q*(n-1),
    value = v[lo] + frac*(v[hi]-v[lo])."""
    out = {}
    for p in percents:
        rank = (p / 100.0) * (sel.size - 1)
        lo = int(math.floor(rank))
        hi = min(lo + 1, sel.size - 1)
        frac = rank - lo
        out[float(p)] = float(sel[lo] + frac * (sel[hi] - sel[lo]))
    return out


def _wildcard_to_regex(pattern: str) -> str:
    """ES/Lucene wildcard glob -> anchored regex: ``*`` = any sequence,
    ``?`` = exactly one char, all else literal (regex metachars escaped).
    Tokens never contain newlines, so ``.`` is safe."""
    parts = ["^"]
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    parts.append("$")
    return "".join(parts)


_QS_CLAUSE_RE = re.compile(r'([+-]?)("[^"]*"(?:\^\d+(?:\.\d+)?)?|\S+)')


def _parse_boost(digits: str) -> float:
    """Boost suffix digits -> finite non-negative float. ``^0`` is legal
    Lucene (clause matches, contributes zero score); a digit string long
    enough to overflow float (>=1e309) falls back to boost 1.0 so the
    grammar stays total with finite weights."""
    v = float(digits)
    return v if math.isfinite(v) else 1.0


def parse_query_string(q: str) -> dict:
    """ES query_string mini-grammar parser. Clause syntax:
    ``+clause`` must, ``-clause`` must_not, ``"a b"`` phrase (with an
    optional +/- sign and ``"a b"^2`` boost), ``term^2`` clause boost,
    bare = should. Returns
    {"must": [(raw_clause, boost)], "should": [...],
     "must_not": [raw_clause], "phrases": [(sign, raw_phrase, boost)]}
    with phrases in input order; analysis (tokenize + stop filter)
    happens at execution so the index analyzer governs, like every other
    query."""
    out = {"must": [], "should": [], "must_not": [], "phrases": []}
    for sign, body in _QS_CLAUSE_RE.findall(q):
        boost = 1.0
        if body.startswith('"'):
            raw = body
            m = _BOOST_RE.search(raw)
            if m and raw.endswith(m.group(0)):
                boost = _parse_boost(m.group(1))
                raw = raw[: m.start()]
            out["phrases"].append((sign, raw.strip('"'), boost))
            continue
        m = _BOOST_RE.search(body)
        if m:
            boost = _parse_boost(m.group(1))
            body = body[: m.start()]
        if not body or body in ("+", "-"):
            # a bare sign char is not a clause: the regex lets `-`/`+-`
            # match with the sign folded into the body; dropping it keeps
            # the grammar total (lone signs analyze to zero tokens anyway)
            continue
        if sign == "-":
            out["must_not"].append(body)
        elif sign == "+":
            out["must"].append((body, boost))
        else:
            out["should"].append((body, boost))
    return out


_TEMPLATE_RE = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


def render_search_template(source: str, params: dict) -> str:
    """ES search-template render (_render/template): the mustache
    subset ES documents for plain value substitution — ``{{name}}`` ->
    str(params[name]); a missing param renders empty (the mustache
    null rule). No sections/partials — the ES docs' core use case."""
    return _TEMPLATE_RE.sub(
        lambda m: str(params.get(m.group(1), "")), source
    )


_SQS_TOKEN_RE = re.compile(r'"([^"]*)"?|([+|()])|(-)|([\w*]+)')


def parse_simple_query_string(q: str) -> list[list[tuple]]:
    """ES simple_query_string mini-grammar parser (the lenient sibling
    of query_string — never raises; flags analog AND|OR|NOT|PHRASE|
    PREFIX|WHITESPACE, i.e. no parens-PRECEDENCE / FUZZY / NEAR /
    ESCAPE, the restricted ``flags`` surface ES exposes):

    - whitespace and ``|`` are OR (default_operator=OR, the ES
      default); ``+`` joins the surrounding atoms into an AND group
      (AND binds tighter than OR, the Lucene SimpleQueryParser rule);
    - ``-atom`` negates the atom within its group (a must_not clause;
      a group with ONLY negative atoms matches nothing — the Lucene
      pure-negative rule, enforced at execution);
    - ``"a b"`` is a phrase atom; ``term*`` a prefix atom; a lone
      ``*`` (match-all) is dropped; parens read as whitespace
      (PRECEDENCE flag off); dangling operators are ignored.

    Returns OR-groups: a list of groups, each a list of
    ``(neg: bool, kind: 'term'|'phrase'|'prefix', payload: str)``
    atoms. Analysis (tokenize + stop filter) happens at execution so
    the index analyzer governs, like every other query."""
    groups: list[list[tuple]] = []
    cur: list[tuple] = []
    join_and = False
    neg = False
    for m in _SQS_TOKEN_RE.finditer(q):
        phrase, op, minus, word = m.group(1), m.group(2), m.group(3), \
            m.group(4)
        if op is not None:
            if op == "+":
                join_and = True
            else:
                # '|', '(' and ')' are OR/whitespace separators: the
                # implicit flush happens when the next atom arrives
                join_and = False
                neg = False
            continue
        if minus is not None:
            neg = True
            continue
        if phrase is not None:
            atom = (neg, "phrase", phrase)
        else:
            if word == "*":
                neg, join_and = False, False  # match-all atom dropped
                continue
            if word.endswith("*") and len(word.rstrip("*")) > 0:
                atom = (neg, "prefix", word.rstrip("*"))
            else:
                atom = (neg, "term", word.replace("*", ""))
        if join_and and cur:
            cur.append(atom)
        else:
            if cur:
                groups.append(cur)
            cur = [atom]
        neg = False
        join_and = False
    if cur:
        groups.append(cur)
    return groups


def _range_agg_key(f, t) -> str:
    """ES range-agg bucket key: "from-to" with '*' for an open end."""
    return f"{'*' if f is None else f}-{'*' if t is None else t}"


def pipeline_aggs(buckets: list[tuple], cumulative: bool = True,
                  derivative: bool = True,
                  selector=None, sort_desc_by_count: int | None = None):
    """ES pipeline-aggregation analogs over parent-agg buckets
    [(key, count)] (histogram / date_histogram / terms output):

    - cumulative_sum: running total in key order;
    - derivative: count minus the previous bucket's count (the FIRST
      bucket diffs against 0 — coalesce(lag, 0), the documented
      divergence from ES omitting the key, chosen so every row is
      defined for the SQL oracle);
    - bucket_selector: ``selector(key, count)`` predicate drops buckets
      AFTER the cumulative/derivative pass (ES evaluation order);
    - bucket_sort: ``sort_desc_by_count=k`` re-orders the surviving
      buckets (count desc, key asc) and truncates to k.

    Pure post-processing over O(buckets) driver-side rows — the parent
    aggregation did the distributed work; sharded executors reuse this
    verbatim on their merged buckets."""
    out = []
    cum = 0
    prev = 0
    for key, cnt in buckets:
        cum += cnt
        row = [key, cnt]
        if cumulative:
            row.append(cum)
        if derivative:
            row.append(cnt - prev)
        prev = cnt
        out.append(tuple(row))
    if selector is not None:
        out = [r for r in out if selector(r[0], r[1])]
    if sort_desc_by_count is not None:
        out = sorted(out, key=lambda r: (-r[1], r[0]))[:sort_desc_by_count]
    return out


def _iso_epoch_ranges(ranges_iso: list) -> list[tuple]:
    """ISO-date [from, to) pairs -> UTC-midnight epoch-second pairs
    (None passes through) — shared by the file and sharded
    date_range_agg so boundaries agree bit-for-bit."""
    import datetime as _dt

    def ep(sv):
        if sv is None:
            return None
        return int(_dt.datetime.strptime(sv, "%Y-%m-%d").replace(
            tzinfo=_dt.timezone.utc).timestamp())

    return [(ep(f), ep(t)) for f, t in ranges_iso]


def normalize_aggs(buckets: list[tuple]) -> list[tuple]:
    """ES normalize pipeline-aggregation analog (method =
    percent_of_sum) over parent buckets [(key, count)]: each bucket's
    share of the total as a percent, exposed e6-rounded via
    floor(x + 0.5) (identical per-double on numpy and SQL, unlike
    round's half-even vs half-away split). Empty parent -> empty.
    Returns [(key, count, pct_e6)] in key order."""
    import math

    total = sum(c for _, c in buckets)
    if total == 0:
        return []
    return [
        (k, c, int(math.floor(c * 100.0 * 1e6 / total + 0.5)))
        for k, c in buckets
    ]


def zscore_aggs(buckets: list[tuple]) -> list[tuple]:
    """ES normalize pipeline agg, method = z-score (the ES ``z-score``
    normalizer): per bucket (v - mean) / std over the parent series,
    with mean and std derived from EXACT integer moments (n, Σv, Σv²;
    variance = (n·Σv² - (Σv)²) / n² — the extended_stats identity) and
    a pinned float op order: mean = S/n; std = sqrt(num)/n;
    z = (v - mean) / std. Zero variance -> z = 0 for every bucket (the
    constant series has no direction). Exposed e6 via floor(x + 0.5).
    Returns [(key, count, z_e6)] in input order."""
    import math

    if not buckets:
        return []
    n = len(buckets)
    s = sum(c for _, c in buckets)
    s2 = sum(c * c for _, c in buckets)
    num = n * s2 - s * s  # exact int >= 0
    if num == 0:
        return [(k, c, 0) for k, c in buckets]
    mean = s / n
    std = math.sqrt(float(num)) / n
    return [
        (k, c, int(math.floor((c - mean) / std * 1e6 + 0.5)))
        for k, c in buckets
    ]


def moving_window_aggs(buckets: list[tuple], window: int = 3,
                       lag: int = 1) -> list[tuple]:
    """ES moving_fn + serial_diff pipeline-aggregation analogs over
    parent-agg buckets [(key, count)] in key order:

    - moving_fn (MovingFunctions.unweightedAvg/min/max/sum): trailing
      window of ``window`` buckets INCLUDING the current (the SQL
      ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW`` frame; series
      head windows are short, not null — every row defined, the same
      totality convention as derivative's coalesce);
    - serial_diff: count minus the count ``lag`` buckets earlier,
      diffing against 0 while the lag reaches before the series (the
      coalesce(lag(...), 0) convention shared with derivative).

    Returns [(key, count, mov_sum, mov_cnt, mov_min, mov_max, sdiff)]
    — mov_avg is mov_sum/mov_cnt, left to the caller so the integer
    rows stay exact. O(buckets) driver-side post-processing, like
    pipeline_aggs."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if lag < 1:
        raise ValueError("lag must be >= 1")
    counts = [c for _, c in buckets]
    out = []
    for i, (key, cnt) in enumerate(buckets):
        w = counts[max(0, i - window + 1): i + 1]
        prev = counts[i - lag] if i >= lag else 0
        out.append(
            (key, cnt, sum(w), len(w), min(w), max(w), cnt - prev)
        )
    return out


def moving_percentiles_aggs(buckets: list[tuple], window: int = 3,
                            percents: tuple = (50.0,)) -> list[tuple]:
    """ES moving_percentiles pipeline-aggregation analog (EXACT — ES
    shifts TDigest sketches; this engine's percentile family is exact,
    the cardinality-agg convention) over parent buckets [(key, count)]:
    per bucket, the linear-interpolation percentiles of the trailing
    ``window`` counts INCLUDING the current (the moving_fn frame; head
    windows are short, not null). Percentile spec = the engine's
    percentiles_agg rule (numpy linear interpolation == DuckDB
    quantile_cont). Returns [(key, count, p_1, ..., p_m)] floats in
    ``percents`` order. O(buckets · window log window) driver-side."""
    if window < 1:
        raise ValueError("window must be >= 1")
    counts = [c for _, c in buckets]
    out = []
    for i, (key, cnt) in enumerate(buckets):
        w = np.sort(np.asarray(
            counts[max(0, i - window + 1): i + 1], dtype=np.float64
        ))
        pr = _percentiles_from_sorted(w, percents)
        out.append((key, cnt) + tuple(pr[float(p)] for p in percents))
    return out


_RATE_UNIT_SECS = {"minute": 60, "hour": 3600, "day": 86400}


def rate_buckets(buckets: list[tuple], calendar_interval: str = "month",
                 unit: str = "day") -> list[tuple]:
    """ES rate-aggregation analog under a calendar date_histogram
    parent: each bucket's doc count normalized to ``unit`` — count
    divided by the bucket's TRUE calendar length in units (months keep
    their 28/29/30/31-day lengths, the reason the agg exists). Bucket
    keys are the parent's epoch-second calendar starts, so lengths come
    from the same numpy datetime64 casts as calendar_floor. Exposed
    e6-rounded via floor(x + 0.5) (the normalize_aggs convention — the
    SQL twin computes the identical double). Returns
    [(key, count, n_units, rate_e6)] in key order; O(buckets)
    driver-side post-processing, like pipeline_aggs."""
    import math

    if unit not in _RATE_UNIT_SECS:
        raise ValueError(f"unsupported rate unit: {unit!r}")
    if not buckets:
        return []
    s64 = np.asarray(
        [k for k, _ in buckets], np.int64
    ).astype("datetime64[s]")
    if calendar_interval == "month":
        nxt = (s64.astype("datetime64[M]") + 1).astype("datetime64[s]")
    elif calendar_interval == "year":
        nxt = (s64.astype("datetime64[Y]") + 1).astype("datetime64[s]")
    elif calendar_interval == "week":
        nxt = s64 + np.timedelta64(7 * 86400, "s")
    elif calendar_interval == "day":
        nxt = s64 + np.timedelta64(86400, "s")
    else:
        raise ValueError(
            f"unsupported calendar_interval: {calendar_interval!r}"
        )
    secs = (nxt - s64).astype("timedelta64[s]").astype(np.int64)
    out = []
    for (k, c), s in zip(buckets, secs):
        units = int(s) // _RATE_UNIT_SECS[unit]  # starts unit-aligned
        out.append((k, c, units,
                    int(math.floor(c * 1e6 / units + 0.5))))
    return out


def bucket_correlation(a: list[tuple], b: list[tuple]):
    """ES bucket_correlation pipeline-aggregation analog (function:
    count_correlation — Pearson over two parent bucket series
    [(key, count)]), aligned on the UNION of keys with missing buckets
    counting 0. Computed from EXACT integer moments so the SQL twin is
    bit-identical double-for-double:

        corr = (n·Σxy − Σx·Σy)
               / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))

    Returns (n_buckets, corr_e6) — corr_e6 is None when either side is
    constant (zero variance, the SQL NULL). O(buckets) driver-side."""
    import math

    da, db = dict(a), dict(b)
    keys = sorted(set(da) | set(db))
    n = len(keys)
    x = [da.get(k, 0) for k in keys]
    y = [db.get(k, 0) for k in keys]
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(u * v for u, v in zip(x, y))
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    if n == 0 or den_x == 0 or den_y == 0:
        return (n, None)
    corr = (n * sxy - sx * sy) / (math.sqrt(den_x) * math.sqrt(den_y))
    return (n, int(math.floor(corr * 1e6 + 0.5)))


def bucket_count_ks_test(a: list[tuple], b: list[tuple]):
    """ES bucket_count_ks_test pipeline-aggregation analog (two-sample
    Kolmogorov–Smirnov over two parent bucket-count series): the series
    align on the UNION of keys (missing → 0), each becomes an empirical
    CDF over its own total, and the statistic is max |cdf_a − cdf_b|.
    Every double comes from exact integer prefix sums via the identical
    expression (p/na − q/nb), so engine == SQL bit-for-bit. Returns
    (n_buckets, ks_e6) — ks_e6 floor(x+0.5)-rounded, None when either
    side is empty (zero total, the SQL NULL)."""
    import math

    da, db = dict(a), dict(b)
    keys = sorted(set(da) | set(db))
    n = len(keys)
    na = sum(da.values())
    nb = sum(db.values())
    if n == 0 or na == 0 or nb == 0:
        return (n, None)
    p = q = 0
    ks = 0.0
    for k in keys:
        p += da.get(k, 0)
        q += db.get(k, 0)
        d = abs(p / na - q / nb)
        if d > ks:
            ks = d
    return (n, int(math.floor(ks * 1e6 + 0.5)))


def change_point(buckets: list[tuple]):
    """ES change_point aggregation analog over a parent bucket series
    [(key, count)] in key order: the split maximizing the scaled
    mean-shift statistic

        stat(t) = |p/t − (S−p)/(n−t)| · sqrt(t·(n−t)/n)

    (p = left-prefix sum after t buckets, S = total) — the two-sample
    z-statistic scan a CUSUM detector reduces to under a constant-
    variance model. Ties break to the SMALLEST t (the SQL twin's ORDER
    BY stat DESC, t). Every double comes from exact integer prefix
    sums via the identical expression, so engine == SQL bit-for-bit.
    Returns (right_key, t, stat_e6) — the first bucket of the right
    segment, the left-segment length, and the floor(x+0.5)-e6 stat —
    or None when the series has < 2 buckets. O(buckets) driver-side."""
    import math

    n = len(buckets)
    if n < 2:
        return None
    counts = [c for _, c in buckets]
    total = sum(counts)
    best = None
    p = 0
    for t in range(1, n):
        p += counts[t - 1]
        stat = (abs(p / t - (total - p) / (n - t))
                * math.sqrt(t * (n - t) / n))
        if best is None or stat > best[2]:
            best = (buckets[t][0], t, stat)
    return (best[0], best[1], int(math.floor(best[2] * 1e6 + 0.5)))


def filter_bucket_keys(hist: dict, include: str | None,
                       exclude: str | None) -> dict:
    """ES terms-agg include/exclude (regex form): bucket keys must FULL-
    match ``include`` (Java matches() semantics) and must not full-match
    ``exclude`` — applied BEFORE ordering/size truncation, like ES.
    Driver-side O(buckets); the oracle twin is regexp_full_match."""
    if include is not None:
        rx = re.compile(include)
        hist = {v: c for v, c in hist.items() if rx.fullmatch(v)}
    if exclude is not None:
        rx = re.compile(exclude)
        hist = {v: c for v, c in hist.items() if not rx.fullmatch(v)}
    return hist


def bucket_script_buckets(rows: list[tuple], expr,
                          names: tuple = ("_count", "metric_sum")):
    """ES bucket_script pipeline aggregation: evaluate a per-bucket
    arithmetic script over the parent multi-bucket agg's metric values
    (the buckets_path map). ``rows`` are (key, v1, v2, ...) tuples;
    ``names`` names the value slots; ``expr`` is the same tiny AST the
    runtime-field family uses ({"var": name} leaves, {"op": '+ - * /',
    "a":, "b":} nodes, numeric literals). Buckets where the script
    divides by zero are SKIPPED (the ES skip gap policy). Returns
    [(key, v1, v2, ..., value)] in input order."""

    def ev(e, env):
        if isinstance(e, (int, float)):
            return float(e), True
        if "var" in e:
            return float(env[e["var"]]), True
        a, oka = ev(e["a"], env)
        b, okb = ev(e["b"], env)
        ok = oka and okb
        op = e["op"]
        if op == "+":
            return a + b, ok
        if op == "-":
            return a - b, ok
        if op == "*":
            return a * b, ok
        if op == "/":
            if b == 0:
                return 0.0, False
            return a / b, ok
        raise ValueError(f"bucket_script op {op!r} (one of + - * /)")

    out = []
    for row in rows:
        env = dict(zip(names, row[1:]))
        val, ok = ev(expr, env)
        if ok:
            out.append((*row, val))
    return out


def sibling_bucket_aggs(buckets: list[tuple]) -> dict:
    """ES sibling pipeline-aggregation analogs (max_bucket / min_bucket /
    sum_bucket / avg_bucket / stats_bucket) over parent-agg buckets
    [(key, count)] — one scalar summary row computed NEXT TO the parent
    aggregation (sibling, not nested):

    - sum_bucket / stats_bucket: exact integer count/min/max/sum of the
      bucket counts; avg left as the exact (sum, n_buckets) pair so the
      caller controls rounding (the moving_fn convention);
    - max_bucket / min_bucket: the extreme count PLUS the keys attaining
      it (ES returns a keys ARRAY because ties are legal; keys ascending).

    Empty parent -> n_buckets=0 with None extrema (the ES empty-agg
    shape). O(buckets) driver-side post-processing like pipeline_aggs —
    the parent aggregation did the distributed work, and sharded
    executors run this verbatim on their exactly-merged buckets."""
    if not buckets:
        return {"n_buckets": 0, "sum": 0, "min": None, "max": None,
                "min_keys": [], "max_keys": []}
    counts = [c for _, c in buckets]
    mn, mx = min(counts), max(counts)
    return {
        "n_buckets": len(buckets),
        "sum": sum(counts),
        "min": mn,
        "max": mx,
        "min_keys": sorted(k for k, c in buckets if c == mn),
        "max_keys": sorted(k for k, c in buckets if c == mx),
    }


def percentiles_bucket_aggs(buckets: list[tuple],
                            percents=(25.0, 50.0, 75.0)) -> dict:
    """ES percentiles_bucket sibling pipeline-aggregation analog over
    parent-agg buckets [(key, count)]: linear-interpolation percentiles
    of the bucket counts, one summary row NEXT TO the parent (the
    sibling_bucket_aggs convention). Percentile rule =
    ``_percentiles_from_sorted`` (numpy linear interpolation == DuckDB
    quantile_cont — the engine's exact-percentile contract; ES uses a
    TDigest here, the documented cardinality-family divergence). Empty
    parent -> {} (the ES null shape). O(buckets log buckets)
    driver-side post-processing like pipeline_aggs; sharded executors
    run this verbatim on their exactly-merged buckets."""
    if not buckets:
        return {}
    counts = np.sort(np.asarray([c for _, c in buckets],
                                dtype=np.float64))
    return _percentiles_from_sorted(counts, percents)


def _expand_span_chains(keys: list, slop: int):
    """The vectorized in-order span chain expansion over per-slot
    position keys (doc*L + pos space): strictly-increasing chains with
    end - start - (n-1) <= slop. Factored out of Searcher._span_chains
    so the field-masked form (slots from DIFFERENT field indexes over
    one doc space) reuses the identical kernel. Returns (start_keys,
    end_keys) chain-aligned, or None when nothing survives."""
    from .codec import run_ranges, run_spread

    n = len(keys)
    start = keys[0]
    cur = start
    bound_off = n - 1 + slop
    for i in range(1, n):
        ki = keys[i]
        lo = np.searchsorted(ki, cur, side="right")
        hi = np.searchsorted(ki, start + bound_off, side="right")
        cnt = hi - lo
        keep = cnt > 0
        lo, start, cnt = lo[keep], start[keep], cnt[keep]
        if start.size == 0:
            return None
        out_starts = np.zeros(start.size, np.int64)
        np.cumsum(cnt[:-1], out=out_starts[1:])
        tot = int(cnt.sum())
        gi = run_ranges(lo, out_starts, tot)
        cur = ki[gi]
        start = run_spread(start, out_starts, tot)
    return start, cur


def field_masked_span_near_docs(clauses: list, slop: int = 0,
                                limit: int = 20) -> list:
    """ES field_masking_span analog: an in-order span_near whose slots
    come from DIFFERENT field indexes over ONE doc space — the ES use
    case is combining a subfield indexed with another analyzer (here: a
    stop-filtered index, whose positional sidecar keeps the raw-stream
    positions the stop filter's gaps preserve — enablePositionIncrements)
    with the main field in one span chain, 'masking' the subfield's
    spans as the main field. Lucene requires the masked fields to share
    position semantics; this engine enforces the shared doc space and
    trusts the caller on position alignment (the same contract).

    ``clauses`` = [(searcher, term)] in slot order. Matching rule =
    span_near_docs verbatim (chains p1 < p2 < ... with
    end - start - (n-1) <= slop, n_matches = ALL chains); union of the
    clauses' tombstone sets drops. Returns [(doc_id, n_matches)]
    ascending, first ``limit``."""
    from .codec import run_ranges, run_spread

    if slop < 0:
        raise ValueError("slop must be >= 0")
    if not clauses:
        return []
    ns = {s.N for s, _ in clauses}
    if len(ns) != 1:
        raise ValueError(
            f"field indexes disagree on doc count: {sorted(ns)} — "
            "field_masking_span requires one shared doc space"
        )
    post = [(s, t, s.lookup(t)) for s, t in clauses]
    if any(p is None for _, _, p in post):
        return []
    n = len(clauses)
    # candidate docs: every slot's postings must hold the doc
    arrs = sorted((p.doc_ids for _, _, p in post), key=lambda a: a.size)
    cand = arrs[0]
    for a in arrs[1:]:
        cand = np.intersect1d(cand, a, assume_unique=True)
    for s, _, _ in post:
        if s.excluded.size:
            cand = cand[~np.isin(cand, s.excluded)]
    if cand.size == 0:
        return []
    maxpos = max(
        int(s._positions(p)[0].max(initial=0)) for s, _, p in post
    )
    L = maxpos + n + slop + 2

    def slot_keys(s, p) -> np.ndarray:
        pos, occ = s._positions(p)
        j = np.searchsorted(p.doc_ids, cand)
        lens = occ[j + 1] - occ[j]
        out_starts = np.zeros(j.size, np.int64)
        np.cumsum(lens[:-1], out=out_starts[1:])
        tot = int(lens.sum())
        gi = run_ranges(occ[j], out_starts, tot)
        doc_key = run_spread((cand * L).astype(np.int64), out_starts, tot)
        return doc_key + pos[gi]

    keys = [slot_keys(s, p) for s, _, p in post]
    res = _expand_span_chains(keys, slop)
    if res is None:
        return []
    start, _ = res
    docs, m = np.unique(start // L, return_counts=True)
    return [(int(d), int(c)) for d, c in zip(docs[:limit], m[:limit])]


def _exact_int_sum(a: np.ndarray) -> int:
    """EXACT sum of an int64 array: int64 partial sums over chunks sized
    so no partial can wrap (|partial| < 2^62), accumulated as Python
    ints. O(n) numpy work + O(n/chunk) Python ops — the widening twin of
    DuckDB's HUGEINT sum() used by the oracles."""
    if a.size == 0:
        return 0
    m = int(np.abs(a).max())
    if m == 0:
        return 0
    chunk = max(1, (1 << 62) // m)
    if a.size <= chunk:
        return int(a.sum())
    return sum(int(a[i:i + chunk].sum()) for i in range(0, a.size, chunk))


def _exact_prod_sum(x: np.ndarray, y: np.ndarray) -> int:
    """EXACT sum(x*y) for int64 arrays. Per-term products that fit int64
    go through the chunked exact sum; wider per-term products (e.g.
    epoch-ms squares) fall back to an object-dtype dot (Python ints,
    exact at any width)."""
    if x.size == 0:
        return 0
    mx = int(np.abs(x).max())
    my = int(np.abs(y).max())
    if mx and my and mx * my >= (1 << 62):
        return int(np.dot(x.astype(object), y.astype(object)))
    return _exact_int_sum(x * y)


def _topk_pairs(docs: np.ndarray, scores: np.ndarray,
                k: int) -> list[tuple]:
    """(score desc, doc asc) top-k as [(doc, score)] — the shared
    kth-partition + tie-keeping-lexsort kernel behind every ranked
    surface (O(n + k log k); the partition keeps boundary ties so the
    lexsort's doc-asc rule decides them deterministically)."""
    take = min(k, docs.size)
    if take <= 0:
        return []
    if docs.size > take:
        kth = np.partition(-scores, take - 1)[take - 1]
        cand = np.flatnonzero(-scores <= kth)
    else:
        cand = np.arange(docs.size)
    order = cand[np.lexsort((docs[cand], -scores[cand]))][:take]
    return [(int(docs[i]), float(scores[i])) for i in order]


def _per_key_rank_keep(idx: np.ndarray, scores: np.ndarray,
                       codes: np.ndarray, max_per_key: int) -> np.ndarray:
    """Rank hits (score desc, doc asc) and keep each whose per-key
    cumcount is < ``max_per_key``; missing-key rows (code < 0) always
    survive. Returns positions INTO idx/scores, in rank order — the
    diversified_sampler candidate walk the single-index and sharded
    paths share (one lexsort + a vectorized per-key cumcount)."""
    order = np.lexsort((idx, -scores))
    oc = codes[idx][order]
    pos = np.arange(oc.size)
    srt = np.lexsort((pos, oc))
    sc = oc[srt]
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    grp_start = np.repeat(
        starts, np.diff(np.r_[starts, np.int64(sc.size)])
    )
    cum = np.empty(oc.size, np.int64)
    cum[srt] = pos - grp_start
    keep = (oc < 0) | (cum < max_per_key)
    return order[keep]


def _linear_fuse(text_pairs: list[tuple], knn_pairs: list[tuple],
                 text_weight: float, knn_weight: float,
                 normalizer: str, k: int) -> list[tuple]:
    """The linear-retriever combine shared by the single-index and
    sharded paths: per-list normalize (minmax -> [0,1], degenerate
    range -> 1.0, or none), then weighted sum, (combined desc, doc asc)
    top-k. See Searcher.linear_retriever_search for the contract."""
    if normalizer not in ("minmax", "none"):
        raise ValueError("normalizer must be 'minmax' or 'none'")

    def norm(pairs: list[tuple]) -> dict[int, float]:
        if not pairs:
            return {}
        if normalizer == "none":
            return {d: float(s) for d, s in pairs}
        lo = min(s for _, s in pairs)
        hi = max(s for _, s in pairs)
        if hi == lo:
            return {d: 1.0 for d, _ in pairs}
        return {d: (s - lo) / (hi - lo) for d, s in pairs}

    text = norm(text_pairs)
    knn = norm(knn_pairs)
    out = {
        d: text_weight * text.get(d, 0.0) + knn_weight * knn.get(d, 0.0)
        for d in set(text) | set(knn)
    }
    return sorted(out.items(), key=lambda e: (-e[1], e[0]))[:k]


def fuzziness_auto(term: str) -> int:
    """ES ``fuzziness: AUTO`` edit-distance ladder (AUTO:3,6 — the
    documented default): terms of 0-2 chars must match exactly, 3-5
    chars allow one edit, 6+ allow two."""
    n = len(term)
    if n < 3:
        return 0
    if n < 6:
        return 1
    return 2


def _jlh_ranked(fg: dict, n_hits: int, bg: dict, n_live: int,
                min_doc_count: int, size: int) -> list[tuple]:
    """JLH significance ranking over exact (foreground, background)
    histograms — shared by the single-index and sharded keyword paths.
    score = (fgp - bgp) * (fgp / bgp); drops fg_df < min_doc_count and
    fgp <= bgp; (score desc, value asc) first ``size``."""
    if not n_hits or not n_live:
        return []
    out = []
    for v, fdf in fg.items():
        if fdf < min_doc_count:
            continue
        df = bg.get(v, 0)
        if df == 0:
            continue
        fgp = fdf / n_hits
        bgp = df / n_live
        if fgp <= bgp:
            continue
        out.append((v, int(fdf), int(df), (fgp - bgp) * (fgp / bgp)))
    out.sort(key=lambda e: (-e[3], e[0]))
    return out[:size]


def _chi2_ranked(fg: dict, n_hits: int, bg: dict, n_live: int,
                 min_doc_count: int, size: int) -> list[tuple]:
    """ES significant_terms chi_square heuristic (include_negatives =
    false, background_is_superset = true): the 2x2 contingency score
    N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) with a = fg_df,
    b = df - fg_df, c = n_hits - fg_df, d = N - df - c. The cross
    difference (ad - bc) is computed EXACTLY in int64 (|ad| < N^2 <
    2^63 for N < 3e9) and squared/divided in float with a pinned
    grouping: N * (diff*diff) / ((ab*cd) * (ac*bd)) — the SQL twin
    mirrors the parentheses. Same drop rules as JLH (min_doc_count,
    fgp <= bgp, bg-absent)."""
    if not n_hits or not n_live:
        return []
    out = []
    for v, a in fg.items():
        if a < min_doc_count:
            continue
        df = bg.get(v, 0)
        if df == 0:
            continue
        if a / n_hits <= df / n_live:
            continue
        b = df - a
        c = n_hits - a
        d = n_live - df - c
        diff = float(a * d - b * c)
        num = float(n_live) * (diff * diff)
        den = (float(a + b) * float(c + d)) * (
            float(a + c) * float(b + d)
        )
        if den == 0:
            continue
        out.append((v, int(a), int(df), num / den))
    out.sort(key=lambda e: (-e[3], e[0]))
    return out[:size]


def _mi_ranked(fg: dict, n_hits: int, bg: dict, n_live: int,
               min_doc_count: int, size: int) -> list[tuple]:
    """ES significant_terms mutual_information heuristic (pinned to the
    same include_negatives=false / background_is_superset=true frame as
    the chi_square path): pointwise-MI sum over the 2x2 table,
    MI = Σ (Nab/N)·log2((N·Nab)/(Na·Nb)), zero cells contribute 0.
    Term order pinned (11, 10, 01, 00) with per-term float op order
    (Nab/N) * log2((N*Nab)/(Na_*N_b)) — the SQL twin mirrors both."""
    if not n_hits or not n_live:
        return []

    def term(nab: int, na: int, nb: int, n: int) -> float:
        if nab == 0:
            return 0.0
        return (nab / n) * math.log2(
            (float(n) * nab) / (float(na) * nb)
        )

    out = []
    for v, a in fg.items():
        if a < min_doc_count:
            continue
        df = bg.get(v, 0)
        if df == 0:
            continue
        if a / n_hits <= df / n_live:
            continue
        n = n_live
        n11 = a
        n10 = n_hits - a          # in fg, term absent? NO — see below
        n01 = df - a
        n00 = n - df - (n_hits - a)
        # axes: first index = in-foreground, second = term-present
        # n11 = fg & present, n10 = fg & absent, n01 = bg-only &
        # present, n00 = neither; marginals:
        nf = n_hits               # fg total
        nnf = n - n_hits
        npres = df
        nabs = n - df
        score = (
            (term(n11, nf, npres, n) + term(n10, nf, nabs, n))
            + (term(n01, nnf, npres, n) + term(n00, nnf, nabs, n))
        )
        out.append((v, int(a), int(df), score))
    out.sort(key=lambda e: (-e[3], e[0]))
    return out[:size]


def _rank_eval_metrics(hits: list[tuple], is_relevant, n_rel: int,
                       k: int) -> dict:
    """The rank_eval metric suite over a ranked hit list — shared by the
    single-index and sharded paths so a metric change can never
    desynchronize them. ``is_relevant`` maps a (global) doc id to its
    judgment; see Searcher.rank_eval for the metric definitions."""
    rel_ranks = [i for i, (d, _) in enumerate(hits) if is_relevant(d)]
    r = len(rel_ranks)
    dcg = 0.0
    for i in rel_ranks:
        dcg += 1.0 / math.log2(i + 2)
    # ideal DCG: all relevant docs packed at the top (binary gains) —
    # the ES dcg metric's normalize=true denominator
    idcg = 0.0
    for i in range(min(n_rel, k)):
        idcg += 1.0 / math.log2(i + 2)
    # ERR (Chapelle et al. 2009, the ES expected_reciprocal_rank
    # metric): binary gains -> stop probability 1/2 at each relevant
    # rank; ranks ascending so the float op order is pinned
    err, p_continue = 0.0, 1.0
    for i in rel_ranks:
        err += p_continue * 0.5 / (i + 1)
        p_continue *= 0.5
    return {
        "k": k,
        "rel_at_k": r,
        "n_rel": n_rel,
        "precision": r / k,
        "recall": (r / n_rel) if n_rel else None,
        "rr": (1.0 / (rel_ranks[0] + 1)) if rel_ranks else 0.0,
        "dcg": dcg,
        "ndcg": (dcg / idcg) if idcg else None,
        "err": err,
    }


def variable_width_buckets(hist: dict, k: int) -> list[tuple]:
    """ES variable_width_histogram analog, made DETERMINISTIC: ES ships a
    one-pass approximate clusterer (results depend on shard/collection
    order); this engine computes the EXACT optimum — the contiguous
    partition of the value axis into ``k`` clusters minimizing total
    within-cluster weighted SSE (the 1D k-means objective, solved by
    dynamic programming over sorted distinct values with O(1) interval
    costs from prefix sums — the Ckmeans.1d.dp formulation; Wang & Song
    2011, R Journal 3(2), public algorithm). Ties break toward the
    SMALLER split index, so the result is a pure function of the value
    histogram — which is exactly what a sharded merge produces, making
    sharded == single by construction.

    ``hist`` maps value -> doc count (the per-segment exact histogram).
    Returns [(min, max, count, sum)] per bucket, value-ascending —
    count/sum exact ints for integral columns (centroid = sum/count is
    the caller's division, the engine's exact-pair convention)."""
    if k < 1:
        raise ValueError("buckets must be >= 1")
    if not hist:
        return []
    vals = np.array(sorted(hist), dtype=np.float64)
    w = np.array([hist[v] for v in sorted(hist)], dtype=np.float64)
    m = vals.size
    k = min(k, m)
    cw = np.concatenate([[0.0], np.cumsum(w)])
    cs = np.concatenate([[0.0], np.cumsum(w * vals)])
    cq = np.concatenate([[0.0], np.cumsum(w * vals * vals)])

    INF = float("inf")
    D = np.full((k + 1, m + 1), INF)
    back = np.zeros((k + 1, m + 1), dtype=np.int64)
    D[0][0] = 0.0
    # vectorized DP: for each (j, i) the candidate split points a form a
    # contiguous range, and cost(a, i-1) has O(1) prefix-sum form, so the
    # inner argmin is one numpy pass — O(k*m^2) numpy element-ops instead
    # of O(k*m^2) Python-level cost() calls (the driver holds only the
    # exactly-merged value histogram, never corpus rows)
    for j in range(1, k + 1):
        prev = D[j - 1]
        for i in range(j, m + 1):
            a = np.arange(j - 1, i)
            W = cw[i] - cw[a]
            S = cs[i] - cs[a]
            Q = cq[i] - cq[a]
            c = prev[a] + (Q - S * S / W)
            # strict tie rule: improvements must beat best - 1e-12, so
            # ties keep the SMALLER a — np.argmin returns the first
            # minimum, and masking sub-tolerance dips preserves the rule
            barg = int(np.argmin(np.where(c <= c.min() + 1e-12,
                                          c.min(), c)))
            D[j][i] = float(c[barg])
            back[j][i] = j - 1 + barg
    # reconstruct
    cuts = []
    i = m
    for j in range(k, 0, -1):
        a = int(back[j][i])
        cuts.append((a, i - 1))
        i = a
    cuts.reverse()
    svals = sorted(hist)
    out = []
    for a, b in cuts:
        seg = svals[a:b + 1]
        cnt = sum(hist[v] for v in seg)
        tot = sum(hist[v] * v for v in seg)
        out.append((seg[0], seg[-1], cnt, tot))
    return out


def _where_key(where: dict) -> tuple:
    """Hashable cache key for a ``where`` spec (scalar equality, None
    for is-null, list/tuple for terms membership, or an ES-style range
    dict {gte/gt/lte/lt: bound})."""
    return tuple(
        (
            c,
            tuple(sorted(v.items())) if isinstance(v, dict)
            else ("in", tuple(v)) if isinstance(v, (list, tuple))
            else v,
        )
        for c, v in sorted(where.items())
    )


def _where_expr(where: dict):
    """``where`` spec -> pyarrow.dataset filter expression.

    Scalar value = keyword equality; None = is-null; list/tuple = ES
    terms-query membership (isin); dict = ES range query
    (``{"gte": lo, "lt": hi}`` etc — ref analog: the ES range filters the
    plugin's mappings enable on numeric/date fields, plugin.properties:10-11;
    same doc-set-restriction semantics as the keyword filters)."""
    expr = None
    for col, val in sorted(where.items()):
        f = pads.field(col)
        if val is None:
            e = f.is_null()
        elif isinstance(val, (list, tuple)):
            e = f.isin(list(val))
        elif isinstance(val, dict):
            bad = set(val) - set(_RANGE_OPS)
            if bad or not val:
                raise ValueError(
                    f"range filter on {col!r}: ops must be non-empty subset "
                    f"of {_RANGE_OPS}, got {sorted(val)}"
                )
            e = None
            for op in _RANGE_OPS:
                if op not in val:
                    continue
                b = val[op]
                cmp = (
                    f >= b if op == "gte" else f > b if op == "gt"
                    else f <= b if op == "lte" else f < b
                )
                e = cmp if e is None else (e & cmp)
        else:
            e = f == val
        expr = e if expr is None else (expr & e)
    return expr


def levenshtein_vec(q: str, cands: np.ndarray,
                    transpositions: bool = False) -> np.ndarray:
    """Levenshtein distance from ``q`` to every candidate string at once.

    Classic DP with the CANDIDATE axis vectorized: the two scalar loops
    run over query chars x padded positions (m x L, ~hundreds of numpy
    ops), never over candidates — one call scores a whole pruned
    vocabulary slice. Candidates are padded to a fixed-width UCS4 matrix;
    each row's distance is read at its own true length column.

    ``transpositions=True`` switches to OSA (optimal string alignment —
    restricted Damerau-Levenshtein): an adjacent swap costs ONE edit,
    exactly Lucene's FuzzyQuery ``transpositions`` flag (ES default
    true). Same vectorization, one extra row of history."""
    n = cands.size
    if n == 0:
        return np.empty(0, np.int32)
    U = cands.astype(np.str_)
    L = U.dtype.itemsize // 4
    if L == 0:  # all-empty candidates
        return np.full(n, len(q), np.int32)
    codes = U.view(np.uint32).reshape(n, L)
    clens = (codes != 0).sum(axis=1)  # terms never contain NUL
    m = len(q)
    qc = np.array([q]).astype(f"U{max(m, 1)}").view(np.uint32)
    prev = np.broadcast_to(
        np.arange(L + 1, dtype=np.int32), (n, L + 1)
    ).copy()
    prev2 = None
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        neq = codes != qc[i - 1]
        for j in range(1, L + 1):
            d = np.minimum(prev[:, j] + 1, prev[:, j - 1] + neq[:, j - 1])
            np.minimum(d, cur[:, j - 1] + 1, out=d)
            if transpositions and i >= 2 and j >= 2:
                # q[i-2:i] swapped equals cand[j-2:j]
                sw = (qc[i - 1] == codes[:, j - 2]) & \
                     (qc[i - 2] == codes[:, j - 1])
                np.minimum(d, np.where(sw, prev2[:, j - 2] + 1, d), out=d)
            cur[:, j] = d
        prev2 = prev
        prev = cur
    return prev[np.arange(n), clens].astype(np.int32)


class Postings:
    __slots__ = (
        "term", "df", "cf", "doc_ids", "tfs", "blocks", "tf_part",
        "block_ub", "live_mask", "pos_bytes", "pos", "occ_off",
    )

    def __init__(self, term, df, cf, doc_ids, tfs, blocks, tf_part=None):
        self.term, self.df, self.cf = term, df, cf
        self.doc_ids, self.tfs, self.blocks = doc_ids, tfs, blocks
        # query-independent BM25 factor per posting:
        #   tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
        self.tf_part = tf_part
        self.block_ub = None  # per-block max of tf_part (pruning bound)
        # tombstones: bool mask per posting (None = no exclusions). When
        # set, block_ub is recomputed over LIVE postings only, so a block
        # whose docs are all excluded carries ub 0 and is never touched
        self.live_mask = None
        # positional sidecar (Lucene .pos analog; only when the index was
        # built with cfg.index_positions): encoded stream + lazy decode
        self.pos_bytes = None
        self.pos = None       # flat absolute within-doc positions
        self.occ_off = None   # posting j owns pos[occ_off[j]:occ_off[j+1]]


class SuggestAPI:
    """ES _suggest API analogs, shared by Searcher and MultiSearcher.

    The host class provides four primitives: ``_suggest_candidates``
    (spell-check candidate scan), ``_dict_stats`` (df/cf without posting
    decode), ``_completion_rows`` (untruncated prefix rows),
    ``_bigram_count`` (positional adjacent-pair count) and
    ``_total_tokens``. Sharded (MultiSearcher) overrides of those
    primitives merge per-segment values — dfs/cfs/bigrams SUM across
    disjoint doc spaces, distances are string-only — so every suggester
    is bit-identical to a single global index (pinned by tests)."""

    def suggest_term(self, text: str, size: int = 5,
                     suggest_mode: str = "missing", max_edits: int = 2,
                     prefix_length: int = 1, min_word_length: int = 4,
                     accuracy: float = 0.5) -> list[tuple]:
        """ES term-suggester analog (the _suggest term suggester backed by
        Lucene's DirectSpellChecker; the reference indexes into the same
        ES node that serves _suggest). Per analyzed token (input order,
        every occurrence): dictionary terms within ``max_edits``, scored
        with normalized Levenshtein similarity
        score = 1 - dist/max(len(token), len(term)) (the documented
        stand-in for Lucene's internal string distance — identical rule
        on the SQL-oracle side), kept when score >= ``accuracy``, ordered
        (score desc, df desc, term asc), first ``size`` per token.
        ``suggest_mode``: 'missing' (default — suggest only for tokens
        absent from the index), 'popular' (only candidates with df > the
        token's df), 'always'. Tokens shorter than ``min_word_length``
        produce no suggestions (the ES knob). Returns flat rows
        [(token, suggestion, df, score)]."""
        if suggest_mode not in ("missing", "popular", "always"):
            raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
        out: list[tuple] = []
        for tok in tokenize_query(text):
            if len(tok) < min_word_length:
                continue
            df_tok = self._dict_stats(tok)[0]
            if suggest_mode == "missing" and df_tok > 0:
                continue
            terms, dfs, dists = self._suggest_candidates(
                tok, max_edits, prefix_length
            )
            if terms.size == 0:
                continue
            lens = np.array([len(t) for t in terms], dtype=np.int64)
            scores = 1.0 - dists / np.maximum(len(tok), lens)
            keep = scores >= accuracy
            if suggest_mode == "popular":
                keep &= dfs > df_tok
            rows = sorted(
                zip(terms[keep].tolist(), dfs[keep].tolist(),
                    scores[keep].tolist()),
                key=lambda r: (-r[2], -r[1], r[0]),
            )[:size]
            out.extend((tok, str(t), int(d), float(s)) for t, d, s in rows)
        return out

    def suggest_completion(self, prefix: str, size: int = 5) -> list[tuple]:
        """ES completion-suggester analog: top ``size`` dictionary terms
        with ``prefix``, ranked by weight (weight = df — the natural
        stand-in for the ES doc-supplied weight on this corpus), ties
        term-asc. Returns [(term, df)]."""
        rows = self._completion_rows(prefix)
        rows.sort(key=lambda r: (-r[1], r[0]))
        return [(str(t), int(d)) for t, d in rows[:size]]

    def suggest_completion_fuzzy(self, prefix: str, size: int = 5,
                                 fuzziness: int = 1,
                                 prefix_length: int = 1) -> list[tuple]:
        """ES completion suggester with the ``fuzzy`` option: a
        dictionary term t qualifies when its first ``prefix_length``
        chars equal the query's (the ES exact anchor) and the
        Levenshtein distance between the query prefix and t's
        same-length prefix is <= ``fuzziness`` (exact matches are
        distance 0 and always included). Ranking stays (weight=df desc,
        term asc) — the ES score is the doc weight, unchanged by the
        fuzzy expansion. Returns [(term, df)]."""
        rows = self._completion_fuzzy_rows(prefix, fuzziness,
                                           prefix_length)
        rows.sort(key=lambda r: (-r[1], r[0]))
        return [(str(t), int(d)) for t, d in rows[:size]]

    def suggest_completion_ctx(self, prefix: str, where: dict,
                               size: int = 5) -> list[tuple]:
        """ES completion suggester WITH CONTEXTS (category contexts):
        completions ranked by their weight inside the context filter —
        weight = df over the docs matching ``where`` (the keyword/range
        filter syntax every search shares), the context-category analog
        of suggest_completion's df weight. Terms with zero in-context
        df drop (the ES contexts-as-filter semantics). Returns
        [(term, df_in_ctx)] (df desc, term asc), first ``size``. The
        sharded primitive sums per-segment in-context dfs (disjoint doc
        sets), so sharded == single exactly."""
        rows = self._completion_ctx_rows(prefix, where)
        rows.sort(key=lambda r: (-r[1], r[0]))
        return [(str(t), int(c)) for t, c in rows[:size]]

    def suggest_phrase(self, text: str, size: int = 3,
                       max_errors: int = 1, candidates_per_slot: int = 3,
                       discount: float = 0.4, max_edits: int = 2,
                       prefix_length: int = 1, min_word_length: int = 4,
                       accuracy: float = 0.5) -> list[tuple[str, float]]:
        """ES phrase-suggester analog (NoisyChannelSpellChecker + the
        default StupidBackoff language model): whole-phrase corrections
        ranked by a bigram LM over the positional index.

        Per slot the candidates are the original token plus the term
        suggester's top ``candidates_per_slot`` (suggest_mode='always',
        so real-word errors correct too); candidate phrases change at
        most ``max_errors`` slots. Scoring (float op order pinned for the
        SQL oracle):
            uni(w)  = (cf(w) + 0.5) / (total_tokens + 1.0)
            S(b|a)  = bigram(a,b)/cf(a) if bigram > 0 else discount*uni(b)
            score   = ln(uni(w0)) + sum_i ln(S(w_i|w_{i-1}))
        total_tokens = sum of all doc lengths; the +0.5/+1 floor keeps
        OOV input tokens finite (ES reserves vocabulary mass similarly).
        Returns [(phrase, score)] (score desc, phrase asc), the input
        phrase itself excluded, first ``size``. Bigram counts are ONE
        positional posting intersection per distinct adjacent pair —
        never a corpus scan."""
        toks = tokenize_query(text)
        if not toks:
            return []
        total = self._total_tokens()

        def uni(t: str) -> float:
            return (self._dict_stats(t)[1] + 0.5) / (total + 1.0)

        slot_cands: list[list[str]] = []
        for tok in toks:
            cands = [tok]
            for _, s, _, _ in self.suggest_term(
                tok, size=candidates_per_slot, suggest_mode="always",
                max_edits=max_edits, prefix_length=prefix_length,
                min_word_length=min_word_length, accuracy=accuracy,
            ):
                if s not in cands:
                    cands.append(s)
            slot_cands.append(cands)

        phrases: list[tuple[str, ...]] = []

        def gen(i: int, cur: list, errs: int) -> None:
            if i == len(toks):
                phrases.append(tuple(cur))
                return
            for c in slot_cands[i]:
                e = errs + (c != toks[i])
                if e <= max_errors:
                    cur.append(c)
                    gen(i + 1, cur, e)
                    cur.pop()

        gen(0, [], 0)
        scored: list[tuple[str, float]] = []
        orig = " ".join(toks)
        for ph in phrases:
            sc = math.log(uni(ph[0]))
            for a, b in zip(ph, ph[1:]):
                c = self._bigram_count(a, b)
                sc += math.log(
                    c / self._dict_stats(a)[1] if c > 0 else discount * uni(b)
                )
            s = " ".join(ph)
            if s != orig:
                scored.append((s, sc))
        scored.sort(key=lambda r: (-r[1], r[0]))
        return scored[:size]


    def composite_date_terms_agg(self, query: str, date_field: str,
                                 calendar_interval: str,
                                 term_field: str, size: int = 10,
                                 after_key=None,
                                 where: dict | None = None,
                                 mode: str = "or",
                                 must_not: str | None = None
                                 ) -> list[tuple]:
        """ES composite aggregation with TWO sources (date_histogram +
        terms): buckets keyed (month_start_epoch_s, term value),
        ascending by the key TUPLE, paginated by the tuple
        ``after_key`` — the same strictly-after stateless cursor as the
        single-source composite. The host class provides
        ``_merged_pairs_hist`` (single index: one pair bincount;
        sharded: per-segment pair histograms summed by key, so every
        page is exact). Returns [((month_start, value), count)]."""
        hist = self._merged_pairs_hist(
            query, date_field, calendar_interval, term_field,
            where, mode, must_not,
        )
        import bisect

        keys = sorted(hist)
        start = 0
        if after_key is not None:
            start = bisect.bisect_right(keys, tuple(after_key))
        page = keys[start:start + size]
        return [(k, hist[k]) for k in page]

    def composite_agg(self, query: str, field: str, size: int = 10,
                      after_key=None,
                      where: dict | None = None, mode: str = "or",
                      must_not: str | None = None) -> list[tuple]:
        """ES composite-aggregation analog (single terms source): facet
        buckets in VALUE-ascending order, paginated by ``after_key`` —
        the stateless agg cursor (pass the last page's final value back)
        that lets a consumer stream an unbounded-cardinality aggregation
        in bounded pages. Per-page work is one merged histogram + a
        vectorized cursor bisect — never a scan resumption. The host
        class provides ``_merged_facet_hist`` (single index: one
        bincount; sharded: summed untruncated per-segment histograms, so
        pages are exact)."""
        import bisect

        rows = sorted(
            self._merged_facet_hist(query, field, where, mode, must_not)
            .items()
        )
        if after_key is not None:
            rows = rows[bisect.bisect_right(rows, (after_key, float("inf"))):]
        return rows[:size]

    def significant_terms(self, query: str, size: int = 10,
                          min_doc_count: int = 3,
                          where: dict | None = None, mode: str = "or",
                          must_not: str | None = None,
                          sample_size: int | None = None):
        """ES significant_terms analog: terms overrepresented in the
        query hit set vs the corpus, scored with the JLH heuristic
        score = (fgp - bgp) * (fgp / bgp), fgp = fg_df/n_hits,
        bgp = df/N. Foreground dfs come from re-analyzing the HIT DOCS'
        stored text (O(hit text), never an index scan —
        ``_merged_sig_foreground``: one vectorized pass per index,
        per-segment sums when sharded); background dfs are dictionary
        lookups for just the candidate terms (no posting decode).
        ``sample_size`` = the ES sampler/shard_size knob, applied PER
        SEGMENT when sharded (exactly ES): None = exact over all hits,
        an int bounds the re-analyzed text to the top hits by score —
        the 100 TB path for Zipf-head queries. Terms with
        fg_df < min_doc_count or fgp <= bgp drop (the ES noise floor).
        Returns [(term, fg_df, df, score)] ordered (score desc, term
        asc), first ``size`` — ONE scoring loop shared by the single and
        sharded executors."""
        n_hits, fg = self._merged_sig_foreground(
            query, where, mode, must_not, sample_size
        )
        if n_hits == 0:
            return []
        out = []
        for term, f in fg.items():
            if f < min_doc_count:
                continue
            df = self._dict_stats(term)[0]
            if df == 0:
                continue
            fgp = f / n_hits
            bgp = df / self.N
            if fgp <= bgp:
                continue  # not overrepresented vs the background
            out.append((term, f, df, (fgp - bgp) * (fgp / bgp)))
        out.sort(key=lambda e: (-e[3], e[0]))
        return out[:size]


class Searcher(SuggestAPI):
    """Reader over a published index directory (manifest-gated).

    Designed as the per-actor state of a query actor pool: construct once
    (loads stats + dense norms array, opens the postings dataset), then
    serve many queries. At multi-node scale one Searcher instance serves
    one doc-range segment and a driver merges per-segment top-k heaps; on
    this sandbox a single instance covers the whole index.
    """

    def __init__(self, index_dir: str, excluded=None):
        import os

        self.index_dir = index_dir
        m = load_manifest(index_dir)
        self.manifest = m
        self.N = m["n_docs"]
        self.avgdl = float(m["avgdl"])
        self.k1 = float(m["k1"])
        self.b = float(m["b"])
        self.num_buckets = m["term_buckets"]
        # index-time stop list (Lucene StopFilter): the SAME analyzer
        # runs at query time, so stop terms are dropped from queries too
        # (mode="and" must not treat an index-absent stopword as a failed
        # required clause — the ES behavior)
        self.stopwords = frozenset(m.get("stopwords", ()))
        # index-time stemmer (ES analyzer `stemmer` filter): query terms
        # run through the same kernel so both sides meet on stemmed terms
        self.stemmer = m.get("stemmer", "")
        # index-time shingles (ES search_as_you_type ._Ngram subfield):
        # queries shingle with the same n so both sides meet on n-grams
        self.shingle_size = int(m.get("shingle_size", 0))
        # index_prefixes subfield range (min_chars, max_chars) or ()
        self.prefix_range = tuple(m.get("index_prefixes", ()) or ())
        # dense norms: doc_id -> dl (doc_ids are dense 0..N-1 by construction)
        self.dl = np.zeros(self.N, dtype=np.int32)
        norms_dir = os.path.join(index_dir, "norms")
        if os.path.isdir(norms_dir):  # absent only for an empty corpus
            norms = pq.read_table(norms_dir)
            self.dl[norms["doc_id"].to_numpy()] = norms["dl"].to_numpy()
        if m.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"index at {index_dir} has format_version="
                f"{m.get('format_version')} — rebuild with this engine version"
            )
        self._postings_dir = os.path.join(index_dir, "postings")
        self._docstore_dir = os.path.join(index_dir, "docstore")
        # doc-exclusion tombstones (per-doc delete analog): loaded at
        # construction — the refresh semantic, like Lucene's deleted-docs
        # bitset being segment-reader state. ``excluded`` pins the set
        # instead (the point-in-time reader: open_pit captured it when
        # the PIT was opened, later deletes must stay invisible).
        if excluded is None:
            from .admin import excluded_docs

            excluded = excluded_docs(index_dir)
        self.excluded = np.array(sorted(excluded), dtype=np.int64)
        self._excluded_set = set(self.excluded.tolist())
        self._cache: dict[str, Postings | None] = {}
        self._filter_masks: dict[tuple, np.ndarray] = {}
        self._facet_cols: dict[str, tuple] = {}
        self._numeric_cols: dict[str, tuple] = {}
        self._runtime_fields: dict[str, object] = {}
        # ES _field_usage_stats analog: per-field API-touch counters
        # (one dict bump per call, never per row — see
        # field_usage_stats for the counting rule)
        self._field_usage: dict[str, int] = {}
        self._blocks_scored = 0  # pruning instrumentation (tests/diagnostics)
        # bucket -> {term: encoded row dict}; a query term loads its whole
        # hash bucket once (one columnar file read) and every later term in
        # that bucket is a dict hit — the per-actor state that makes the
        # QueryRunner pool amortize I/O (SURVEY ST5).
        self._buckets: dict[int, dict[str, dict]] = {}
        # (query, k) -> top-k result; deterministic over an immutable
        # published index, cleared wholesale at 4096 entries
        self._result_cache: dict[tuple, list] = {}

    # ------------------------------------------------------------------
    # postings access
    # ------------------------------------------------------------------

    def _load_bucket(self, bucket: int) -> dict[str, dict]:
        import os

        cached = self._buckets.get(bucket)
        if cached is not None:
            return cached
        path = os.path.join(self._postings_dir, f"bucket-{bucket:04d}.parquet")
        if not os.path.exists(path):
            self._buckets[bucket] = {}
            return {}
        t = pq.read_table(path)
        # bulk column conversion (one Arrow->py pass per column; the
        # per-cell .as_py() loop measured as the warm-up hot spot at large
        # vocabularies — same fix the shared decode path carries)
        names = ["term", "df", "cf", "doc_bytes", "tf_bytes", "block_bytes"]
        has_pos = "pos_bytes" in t.schema.names
        if has_pos:
            names.append("pos_bytes")
        cols = {c: t[c].to_pylist() for c in names}
        rows: dict[str, dict] = {
            term: {
                "df": cols["df"][i],
                "cf": cols["cf"][i],
                "doc_bytes": cols["doc_bytes"][i],
                "tf_bytes": cols["tf_bytes"][i],
                "block_bytes": cols["block_bytes"][i],
                "pos_bytes": cols["pos_bytes"][i] if has_pos else None,
            }
            for i, term in enumerate(cols["term"])
        }
        self._buckets[bucket] = rows
        return rows

    def lookup(self, term: str) -> Postings | None:
        if term in self._cache:
            return self._cache[term]
        bucket = term_bucket_py(term, self.num_buckets)
        row = self._load_bucket(bucket).get(term)
        if row is None:
            self._cache[term] = None
            return None
        doc_ids, tfs = decode_postings(row["doc_bytes"], row["tf_bytes"])
        doc_ids = doc_ids.astype(np.int64)
        tfs_f = tfs.astype(np.float64)
        dls = self.dl[doc_ids].astype(np.float64)
        tf_part = tfs_f * (self.k1 + 1.0) / (
            tfs_f + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl)
        )
        blocks = decode_blocks(row["block_bytes"])
        p = Postings(
            term, row["df"], row["cf"],
            doc_ids, tfs, blocks, tf_part,
        )
        p.pos_bytes = row.get("pos_bytes")
        # per-block upper bound of tf_part (query-independent): the
        # vectorized block-max pruning input. Same monotone expression as
        # the real factor, evaluated at (max_tf, min_dl) -> provably >= any
        # posting's tf_part in the block (see codec.encode_postings).
        mt = blocks["max_tf"].astype(np.float64)
        md = blocks["min_dl"].astype(np.float64)
        p_block_ub = mt * (self.k1 + 1.0) / (
            mt + self.k1 * (1.0 - self.b + self.b * md / self.avgdl)
        )
        p.block_ub = p_block_ub
        self._apply_tombstones(p)
        self._cache[term] = p
        return p

    def _apply_tombstones(self, p: Postings) -> None:
        """Per-posting live mask + tombstone-TIGHTENED block bounds (once
        per term per searcher, cached with the postings): excluded hot docs
        no longer shape the MaxScore/WAND upper bounds, and fully-excluded
        blocks drop to ub 0 so the pruned executors skip them entirely."""
        if not self.excluded.size:
            return
        live = ~np.isin(p.doc_ids, self.excluded)
        p.live_mask = live
        starts = p.blocks["start"].astype(np.int64)
        p.block_ub = np.maximum.reduceat(
            np.where(live, p.tf_part, 0.0), starts
        )

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def _field_codes(self, field: str):
        """Dense doc_id -> dictionary-code array for a keyword column
        (one column-pruned docstore read per field per searcher; -1 =
        null/missing, which forms no bucket — ES terms-agg default)."""
        self._field_usage[field] = self._field_usage.get(field, 0) + 1
        cached = self._facet_cols.get(field)
        if cached is not None:
            return cached
        t = pads.dataset(self._docstore_dir).to_table(
            columns=["doc_id", field]
        )
        enc = pc.dictionary_encode(t[field].combine_chunks())
        idx = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        codes = np.full(self.N, -1, np.int64)
        codes[t["doc_id"].to_numpy()] = idx
        out = (codes, enc.dictionary.to_pylist())
        self._facet_cols[field] = out
        return out

    def _hit_mask(self, query: str, where: dict | None = None,
                  mode: str = "or", must_not: str | None = None):
        """Dense bool mask of ALL docs matching the query (posting unions,
        no BM25 work), composed with keyword/range filters, bool-query
        restrictions, and tombstones — the shared hit-set primitive under
        every aggregation (terms facets, stats, histograms) and the hit
        export. Returns None when nothing can match. ``query=None`` is
        match_all (every live doc) — the filter-context entry the DSL
        executor uses for term/range-only requests."""
        if query is None:
            hits = np.ones(self.N, dtype=bool)
            if self.excluded.size:
                hits[self.excluded] = False
            if where:
                hits &= self.filter_mask(**where)
            if must_not:
                bm = self._bool_mask(None, must_not)
                if bm is not None:
                    hits &= bm
            return hits
        qtf = self._qweights(query)
        terms = sorted(qtf)
        plist = [(t, qtf[t], self.lookup(t)) for t in terms]
        plist = [(t, q, p) for t, q, p in plist if p is not None]
        if not plist or (mode == "and" and len(plist) < len(terms)):
            return None
        hits = np.zeros(self.N, dtype=bool)
        for _, _, p in plist:
            ids = (
                p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            )
            hits[ids] = True
        if where:
            hits &= self.filter_mask(**where)
        if mode == "and" or must_not:
            bm = self._bool_mask(plist if mode == "and" else None, must_not)
            if bm is not None:
                hits &= bm
        return hits

    def _facet_hist(self, query: str, field: str,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> dict:
        """Untruncated value -> doc-count histogram over ALL query hits
        (the per-segment unit a sharded facet sums exactly). No BM25 work
        runs — the hit set is a dense bool mask from posting unions, the
        count one bincount over masked codes."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}
        codes, values = self._field_codes(field)
        sel = codes[hits]
        cnt = np.bincount(sel[sel >= 0], minlength=len(values))
        return {v: int(c) for v, c in zip(values, cnt) if c > 0}

    def _terms_metric_hist(self, query: str, field: str,
                           metric_field: str, where=None, mode="or",
                           must_not=None) -> dict:
        """Untruncated value -> (doc_count, metric_n, metric_sum)
        histogram over ALL query hits — the exact per-segment payload
        behind a terms agg ordered by a metric sub-agg. doc_count
        follows the terms missing rule (keyword present); metric_n /
        metric_sum additionally require the metric present (the ES
        sub-agg null rule). The metric must be integral so the sums —
        and therefore the sharded merge and the SQL twin — are exact."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}
        codes, values = self._field_codes(field)
        v, vok = self._numeric_col(metric_field)
        mk = hits & (codes >= 0)
        if not mk.any():
            return {}
        k = len(values)
        cnt = np.bincount(codes[mk], minlength=k)
        mm = mk & vok
        vs = v[mm]
        if vs.size and not np.all(vs == np.floor(vs)):
            raise ValueError(
                f"terms_metric_agg needs an integral metric, got "
                f"{metric_field!r} with fractional values"
            )
        sums = np.zeros(k, dtype=np.int64)
        np.add.at(sums, codes[mm], vs.astype(np.int64))
        nm = np.bincount(codes[mm], minlength=k)
        return {
            values[i]: (int(cnt[i]), int(nm[i]), int(sums[i]))
            for i in range(k) if cnt[i] > 0
        }

    @staticmethod
    def _rank_terms_metric(hist: dict, size: int) -> list[tuple]:
        """Shared ranking rule for terms-ordered-by-metric: avg_e6 =
        round-half-up((sum * 1e6) / n) in EXACT integer arithmetic
        ((2·1e6·sum + n) // (2n)); buckets with no metric values sort
        LAST (null avg, the ES order:{metric:desc} missing rule); ties
        break key ascending. Returns [(value, doc_count, metric_n,
        avg_e6-or-None)]."""
        def key(item):
            v, (c, n, s) = item
            if n == 0:
                return (1, 0, v)
            return (0, -((2_000_000 * s + n) // (2 * n)), v)

        ranked = sorted(hist.items(), key=key)[:size]
        return [
            (v, c, n,
             ((2_000_000 * s + n) // (2 * n)) if n else None)
            for v, (c, n, s) in ranked
        ]

    def terms_metric_agg(self, query: str, field: str,
                         metric_field: str, size: int = 10,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> list[tuple]:
        """ES terms aggregation ORDERED BY A METRIC SUB-AGG
        (``order: {"m": "desc"}`` with ``m: {avg: {field: ...}}``) —
        the bucket order the default (count desc) terms agg cannot
        express: buckets of keyword ``field`` over ALL query hits,
        ranked by the bucket's avg(metric_field) descending, key
        ascending on ties, metric-less buckets last. avg is carried as
        an exact integer e6 (round half-up), so the sharded merge and
        the SQL twin are bit-identical. Returns [(value, doc_count,
        metric_n, avg_e6)]."""
        return self._rank_terms_metric(
            self._terms_metric_hist(query, field, metric_field, where,
                                    mode, must_not), size
        )

    def facet_counts(self, query: str, field: str, size: int = 10,
                     where: dict | None = None, mode: str = "or",
                     must_not: str | None = None,
                     include: str | None = None,
                     exclude: str | None = None,
                     missing: str | None = None,
                     min_doc_count: int = 1) -> list[tuple]:
        """ES terms-aggregation analog: doc counts per value of keyword
        column ``field`` over ALL docs matching the query (not just the
        top-k page). Buckets ordered (count desc, value asc), first
        ``size`` — the ES terms-agg default order. Composes with the same
        doc-set restrictions as search (where / mode="and" / must_not /
        tombstones); statistics are exact, not sharded approximations."""
        hist = self._facet_hist(query, field, where, mode, must_not)
        if missing is not None:
            # ES terms `missing`: docs without the field bucket under
            # the given value (added to any existing same-key bucket)
            hits = self._hit_mask(query, where, mode, must_not)
            n_missing = (
                int(hits.sum()) - sum(hist.values())
                if hits is not None else 0
            )
            if n_missing:
                hist[missing] = hist.get(missing, 0) + n_missing
        hist = filter_bucket_keys(hist, include, exclude)
        if min_doc_count > 1:
            # ES semantics: the floor applies to the MERGED count,
            # before size truncation
            hist = {v: c for v, c in hist.items() if c >= min_doc_count}
        ranked = sorted(hist.items(), key=lambda e: (-e[1], e[0]))
        return ranked[:size]

    def terms_agg_meta(self, query: str, field: str,
                       size: int = 10) -> tuple[list[tuple], int, int]:
        """ES terms-agg response metadata: (buckets,
        sum_other_doc_count, doc_count_error_upper_bound). ES computes
        a NONZERO error bound because each shard truncates to
        shard_size before the merge; this engine merges UNTRUNCATED
        per-segment histograms, so the bound is exactly 0 and
        sum_other_doc_count is exact — the documented (stronger)
        divergence. Buckets in facet_counts order (count desc, value
        asc)."""
        hist = self._facet_hist(query, field, None, "or", None)
        ranked = sorted(hist.items(), key=lambda e: (-e[1], e[0]))
        top = ranked[:size]
        other = sum(hist.values()) - sum(c for _, c in top)
        return top, int(other), 0

    def rare_terms_agg(self, query: str, field: str,
                       max_doc_count: int = 1, size: int | None = None,
                       where: dict | None = None, mode: str = "or",
                       must_not: str | None = None) -> list[tuple]:
        """ES rare_terms-aggregation analog, made EXACT: buckets of
        keyword ``field`` whose doc count over the query hit set is <=
        ``max_doc_count``, ordered (count asc, value asc) — the
        long-tail complement of the terms agg. DIVERGENCE, pinned for
        the oracle: ES approximates with a CuckooFilter (documented
        false-positive rate); this engine's facet machinery already
        carries the exact histogram, so rare-ness is exact — and the
        sharded path sums untruncated per-segment histograms BEFORE the
        cutoff, making rare-ness a global property (a value rare in one
        shard but common overall is correctly dropped)."""
        if max_doc_count < 1:
            raise ValueError("max_doc_count must be >= 1")
        hist = self._facet_hist(query, field, where, mode, must_not)
        out = sorted(
            ((v, c) for v, c in hist.items() if c <= max_doc_count),
            key=lambda e: (e[1], e[0]),
        )
        return out if size is None else out[:size]

    def multi_terms_agg(self, query: str, fields: list[str],
                        size: int = 10, where: dict | None = None,
                        mode: str = "or",
                        must_not: str | None = None) -> list[tuple]:
        """ES multi_terms-aggregation analog: buckets keyed by the VALUE
        TUPLE of two or more keyword fields over the query hit set,
        ordered (count desc, key asc) and truncated to ``size``. Docs
        missing ANY of the fields drop (the ES multi_terms missing
        rule). One bincount over a mixed-radix code — O(hits) per
        segment, payload O(observed key combinations). Returns
        [((v1, v2, ...), count)]."""
        if len(fields) < 2:
            raise ValueError("multi_terms needs >= 2 fields")
        hist = self._multi_terms_hist(query, fields, where, mode,
                                      must_not)
        ranked = sorted(hist.items(), key=lambda e: (-e[1], e[0]))
        return ranked[:size]

    def _multi_terms_hist(self, query: str, fields: list[str],
                          where=None, mode="or", must_not=None) -> dict:
        """Exact (value-tuple -> doc count) histogram — the sharded
        merge payload behind multi_terms_agg."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}
        cols = [self._field_codes(f) for f in fields]
        m = hits.copy()
        for codes, _ in cols:
            m &= codes >= 0
        idx = np.flatnonzero(m)
        if idx.size == 0:
            return {}
        # mixed-radix combined code over the per-field dictionaries
        key = np.zeros(idx.size, dtype=np.int64)
        for codes, values in cols:
            key = key * np.int64(len(values)) + codes[idx]
        uniq, cnt = np.unique(key, return_counts=True)
        out: dict = {}
        for kcode, c in zip(uniq, cnt):
            parts = []
            rem = int(kcode)
            for codes, values in reversed(cols):
                parts.append(values[rem % len(values)])
                rem //= len(values)
            out[tuple(reversed(parts))] = int(c)
        return out

    def terms_stats_agg(self, query: str, field: str, metric: str,
                        size: int = 10, where: dict | None = None,
                        mode: str = "or",
                        must_not: str | None = None) -> list[tuple]:
        """ES terms aggregation with a STATS sub-agg: per keyword
        bucket over the query hit set, (doc_count, n_values, min, max,
        sum) of the integral metric column — one pass of bincount +
        minimum.at/maximum.at over dictionary codes (exact ints, no
        per-bucket loop). Docs missing the metric count in doc_count
        but not in the stats (the ES sub-agg rule). Buckets ordered
        (doc_count desc, value asc), first ``size``. The sharded twin
        merges per-segment partials exactly (counts/sums add, extrema
        min/max). Returns [(value, n_docs, n_vals, mn, mx, total)]."""
        hist = self._terms_stats_partials(query, field, metric, where,
                                          mode, must_not)
        ranked = sorted(hist.items(), key=lambda e: (-e[1][0], e[0]))
        return [
            (v, c, nv, mn, mx, tot)
            for v, (c, nv, mn, mx, tot) in ranked[:size]
        ]

    def _terms_stats_partials(self, query: str, field: str,
                              metric: str, where=None, mode="or",
                              must_not=None) -> dict:
        """value -> (doc_count, n_vals, min, max, sum) — the exact
        sharded merge payload behind terms_stats_agg."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}
        codes, values = self._field_codes(field)
        sel = hits & (codes >= 0)
        idx = np.flatnonzero(sel)
        if idx.size == 0:
            return {}
        V = len(values)
        c_doc = np.bincount(codes[idx], minlength=V)
        mv, mvalid = self._numeric_col(metric)
        ok = mvalid[idx]
        mi = idx[ok]
        mcodes = codes[mi]
        vals = mv[mi]
        n_vals = np.bincount(mcodes, minlength=V)
        mn = np.full(V, np.inf)
        mx = np.full(V, -np.inf)
        np.minimum.at(mn, mcodes, vals)
        np.maximum.at(mx, mcodes, vals)
        tot = np.bincount(mcodes, weights=vals.astype(np.float64),
                          minlength=V)
        out: dict = {}
        for ci in np.flatnonzero(c_doc):
            nv = int(n_vals[ci])
            out[values[ci]] = (
                int(c_doc[ci]), nv,
                int(mn[ci]) if nv else None,
                int(mx[ci]) if nv else None,
                int(tot[ci]),
            )
        return out

    def reverse_nested_agg(self, query: str, child_field: str,
                           parent_field: str, size: int = 10,
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None) -> list[tuple]:
        """ES reverse_nested analog over the join-field model (nested
        terms agg on the CHILD axis, then step back up to parents):
        buckets the query hit set by ``child_field`` and reports, per
        bucket, the child doc count AND the number of DISTINCT
        ``parent_field`` values (the reverse_nested doc_count — each
        root/parent counted once no matter how many of its children
        fall in the bucket). One mixed-radix pair bincount (the
        multi_terms kernel), then an O(observed pairs) reduction.
        Buckets ordered (child count desc, value asc), first ``size``.
        Returns [(child_value, n_docs, n_parents)]."""
        hist = self._multi_terms_hist(
            query, [child_field, parent_field], where, mode, must_not
        )
        n_docs: dict = {}
        parents: dict = {}
        for (cv, pv), c in hist.items():
            n_docs[cv] = n_docs.get(cv, 0) + c
            parents.setdefault(cv, set()).add(pv)
        ranked = sorted(n_docs.items(), key=lambda e: (-e[1], e[0]))[:size]
        return [(v, c, len(parents[v])) for v, c in ranked]

    def significant_keyword_terms(self, query: str, field: str,
                                  size: int = 10,
                                  min_doc_count: int = 3,
                                  where: dict | None = None,
                                  mode: str = "or",
                                  must_not: str | None = None,
                                  background_where: dict | None = None,
                                  heuristic: str = "jlh"
                                  ) -> list[tuple]:
        """ES significant_terms over a KEYWORD field (the doc-values
        form — the text-re-analysis form, i.e. ES significant_text, is
        the existing significant_terms method): field values
        overrepresented in the query hit set vs the LIVE corpus,
        JLH-scored with the same pinned op order — score =
        (fgp - bgp) * (fgp / bgp), fgp = fg_df/n_hits, bgp = df/N_live.
        Values with fg_df < min_doc_count or fgp <= bgp drop (the ES
        noise floor). Foreground = the exact facet histogram;
        background = one bincount over live docs — both O(field
        cardinality) payloads, so the sharded merge is exact. Returns
        [(value, fg_df, df, score)] (score desc, value asc), first
        ``size``."""
        fg, n_hits = self._keyword_sig_foreground(query, field, where,
                                                  mode, must_not)
        bg, n_live = self._field_hist_live(field, background_where)
        rank = {"chi_square": _chi2_ranked,
                "mutual_information": _mi_ranked}.get(heuristic,
                                                      _jlh_ranked)
        return rank(fg, n_hits, bg, n_live, min_doc_count, size)

    def _keyword_sig_foreground(self, query: str, field: str,
                                where=None, mode="or",
                                must_not=None) -> tuple[dict, int]:
        """(foreground histogram, n_hits) from ONE hit-mask pass — the
        per-segment partial keyword significance merges."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}, 0
        codes, values = self._field_codes(field)
        sel = codes[hits]
        cnt = np.bincount(sel[sel >= 0], minlength=len(values))
        return (
            {v: int(c) for v, c in zip(values, cnt) if c > 0},
            int(hits.sum()),
        )

    def _hit_count(self, query: str, where=None, mode="or",
                   must_not=None) -> int:
        hits = self._hit_mask(query, where, mode, must_not)
        return 0 if hits is None else int(hits.sum())

    def _field_hist_live(self, field: str,
                         background_where: dict | None = None
                         ) -> tuple[dict, int]:
        """(value -> live doc count, live N) — the background side of
        keyword significance; tombstones excluded on both counts.
        ``background_where`` narrows the background population (the ES
        significant_terms ``background_filter`` knob): counts and N
        both come from the filtered live set, so scores compare the
        foreground against the chosen reference corpus."""
        codes, values = self._field_codes(field)
        live = np.ones(self.N, dtype=bool)
        if self.excluded.size:
            live[self.excluded] = False
        if background_where:
            live &= self.filter_mask(**background_where)
        sel = codes[live]
        cnt = np.bincount(sel[sel >= 0], minlength=len(values))
        return (
            {v: int(c) for v, c in zip(values, cnt) if c > 0},
            int(live.sum()),
        )

    def _qweights(self, query: str) -> dict[str, float]:
        """Query-side analyzer: clause weights with the index's stop list
        applied (the query runs through the same analyzer as indexing)."""
        tc = self.manifest.get("text_col", "text") if hasattr(
            self, "manifest") else "text"
        self._field_usage[tc] = self._field_usage.get(tc, 0) + 1
        if self.shingle_size > 1:
            # shingle-field analyzer: n-gram windows in token order;
            # clause-boost syntax doesn't apply to shingle subfields
            qtf2: dict[str, float] = {}
            for sh in query_shingles(tokenize_query(query), self.shingle_size):
                qtf2[sh] = qtf2.get(sh, 0.0) + 1.0
            return qtf2
        qtf = parse_query_weights(query)
        if self.stopwords:
            qtf = {t: v for t, v in qtf.items() if t not in self.stopwords}
        if self.stemmer:
            # token->token map; clauses that stem to the same term merge
            # with summed weights (Lucene keeps both duplicate clauses,
            # which scores the shared term twice = one clause of weight 2)
            from .analysis import apply_stemmer

            stems = apply_stemmer(
                pa.array(sorted(qtf), pa.string()), self.stemmer
            ).to_pylist()
            merged: dict[str, float] = {}
            for t, st in zip(sorted(qtf), stems):
                merged[st] = merged.get(st, 0.0) + qtf[t]
            qtf = merged
        return qtf

    def _plist(self, query: str):
        qtf = self._qweights(query)
        plist = [(t, qtf[t], self.lookup(t)) for t in sorted(qtf)]
        return [(t, q, p) for t, q, p in plist if p is not None]

    def facet_top_hits(self, query: str, field: str, size: int = 10,
                       top_n: int = 3, where: dict | None = None,
                       mode: str = "or", must_not: str | None = None):
        """ES terms-aggregation + top_hits sub-aggregation analog: the
        top ``size`` buckets of keyword column ``field`` (count desc,
        value asc — facet_counts order), each carrying its ``top_n``
        best-BM25 hits. Scores accumulate once for the WHOLE hit set in
        the TAAT op order (bit-identical to search), then each bucket
        takes an argpartition top-n — O(hits + buckets·top_n), not a
        search per bucket. Returns [(value, count, [(doc_id, score)])]."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        codes, values = self._field_codes(field)
        sel = codes[hits]
        cnt = np.bincount(sel[sel >= 0], minlength=len(values))
        ranked = sorted(
            ((v, int(c), i) for i, (v, c) in enumerate(zip(values, cnt))
             if c > 0),
            key=lambda e: (-e[1], e[0]),
        )[:size]
        # dense scores, same float op sequence as _search_taat
        buf = self._dense_scores(query)
        out = []
        for v, c, code in ranked:
            idx = np.flatnonzero(hits & (codes == code))
            out.append(
                (v, c, _topk_pairs(idx, buf[idx], top_n))
            )
        return out

    def _dense_scores(self, query: str) -> np.ndarray:
        """THE dense TAAT accumulation (one buf[p.doc_ids] += w*tf_part
        scatter per term, terms ascending) — the single definition every
        grouped-scoring feature (facet_top_hits, collapse, has_child,
        inner_hits) shares so their scores stay bit-identical to
        search() by construction."""
        buf = np.zeros(self.N, dtype=np.float64)
        for term, qn, p in self._plist(query):
            w = self._term_weight(qn, p.df)
            buf[p.doc_ids] += w * p.tf_part
        return buf

    def _collapse_groups(self, query: str, field: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> list[tuple]:
        """UNTRUNCATED per-group best hits: one row per distinct value of
        ``field`` in the hit set — [(value, doc_id, score)], the single
        best hit per group (score desc, doc_id asc within the group).
        Missing field (-1 code) forms ONE null group, the ES collapse
        semantics. Scores accumulate in the search() TAAT op order
        (bit-identical); group argmax is one lexsort + unique — no
        per-group scan. Untruncated so the sharded merge is exact,
        like facet_counts' histograms."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        codes, values = self._field_codes(field)
        buf = self._dense_scores(query)
        scores = buf[idx]
        grp = codes[idx]
        order = np.lexsort((idx, -scores))
        _, first = np.unique(grp[order], return_index=True)
        best = order[first]
        return [
            (values[int(grp[i])] if grp[i] >= 0 else None,
             int(idx[i]), float(scores[i]))
            for i in best
        ]

    def search_collapse(self, query: str, field: str, k: int = 10,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> list[tuple]:
        """ES field-collapsing analog (the `collapse` search-body option):
        top-``k`` hits where each distinct value of keyword column
        ``field`` contributes only its single best hit; groups rank by
        that best hit (score desc, doc_id asc). Docs missing the field
        collapse into one null group (value None). Returns
        [(doc_id, score, value)]."""
        groups = self._collapse_groups(query, field, where, mode, must_not)
        groups.sort(key=lambda g: (-g[2], g[1]))
        return [(d, s, v) for v, d, s in groups[:k]]

    def _collapse_topn_rows(self, query: str, field: str, n: int,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None) -> list[tuple]:
        """UNTRUNCATED groups × top-``n`` rows: [(value, doc_id, score)]
        group-major, within-group (score desc, doc_id asc), at most n
        rows per group — the exact sharded-merge payload behind collapse
        inner_hits (groups span segments; per-segment top-n supersets
        the global top-n because segment hit sets are disjoint). One
        lexsort + segment-position mask, no per-group scan."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        codes, values = self._field_codes(field)
        buf = self._dense_scores(query)
        scores = buf[idx]
        grp = codes[idx]
        order = np.lexsort((idx, -scores, grp))
        g = grp[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(g)) + 1])
        lens = np.diff(np.concatenate([starts, [g.size]]))
        pos = np.arange(g.size) - np.repeat(starts, lens)
        keep = order[pos < n]
        return [
            (values[int(grp[i])] if grp[i] >= 0 else None,
             int(idx[i]), float(scores[i]))
            for i in keep
        ]

    @staticmethod
    def _rank_inner_hits(rows: list[tuple], k: int, n: int) -> list[tuple]:
        """Shared collapse-inner_hits ranking: group rows by value,
        re-rank within group (score desc, doc asc — a no-op on a single
        index, the real merge when segments contribute rows), rank
        groups by their best row, keep k groups × n rows, flatten as
        [(value, inner_rank 1-based, doc_id, score)]."""
        by_val: dict = {}
        for v, d, s in rows:
            by_val.setdefault(v, []).append((d, s))
        for rs in by_val.values():
            rs.sort(key=lambda r: (-r[1], r[0]))
        groups = sorted(
            by_val.items(),
            key=lambda e: (-e[1][0][1], e[1][0][0]),
        )[:k]
        return [
            (v, r + 1, d, s)
            for v, rs in groups
            for r, (d, s) in enumerate(rs[:n])
        ]

    def collapse_inner_hits(self, query: str, field: str, k: int = 10,
                            n: int = 3, where: dict | None = None,
                            mode: str = "or",
                            must_not: str | None = None) -> list[tuple]:
        """ES collapse + inner_hits: the top-``k`` collapsed groups
        (ranked by their best hit — search_collapse's group order), each
        expanded with its own top-``n`` hits (score desc, doc_id asc).
        Docs missing the field form the single null group, same as
        collapse. Returns [(value, inner_rank, doc_id, score)] flattened
        group-major."""
        return self._rank_inner_hits(
            self._collapse_topn_rows(query, field, n, where, mode,
                                     must_not), k, n
        )

    def _parent_group_stats(self, query: str, parent_field: str,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None) -> dict:
        """Per-parent aggregates for the join-field (has_child) search:
        parent value -> [sum_score, max_score, n_children] over ALL hits.
        One TAAT pass (scores bit-identical to search), then vectorized
        group scatter (np.add.at / np.maximum.at over dictionary codes).
        Sum accumulates in ascending-doc order (the SQL oracle's
        sum(... ORDER BY doc_id)). UNTRUNCATED so the sharded merge is
        exact — parents span segments."""
        return self._parent_group_stats_ex(
            query, parent_field, where, mode, must_not
        )[0]

    def _parent_axis(self, query: str, parent_field: str,
                     where=None, mode="or", must_not=None):
        """(hits, idx, buf, codes, values) or None — ONE hit-mask +
        dense-score pass shared between group stats and inner hits (an
        inner_hits query pays the dominant cost once, not twice)."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return None
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return None
        codes, values = self._field_codes(parent_field)
        return hits, idx, self._dense_scores(query), codes, values

    def _parent_group_stats_ex(self, query: str, parent_field: str,
                               where=None, mode="or",
                               must_not=None) -> tuple[dict, object]:
        """(stats, axis) — axis is reusable by _parent_inner_hits."""
        axis = self._parent_axis(query, parent_field, where, mode, must_not)
        if axis is None:
            return {}, None
        hits, idx, buf, codes, values = axis
        grp = codes[idx]
        keep = grp >= 0  # children without a parent value drop
        grp, scores = grp[keep], buf[idx[keep]]
        if grp.size == 0:
            return {}, axis
        nvals = len(values)
        sums = np.zeros(nvals, dtype=np.float64)
        np.add.at(sums, grp, scores)  # ascending-doc accumulation
        maxs = np.full(nvals, -np.inf)
        np.maximum.at(maxs, grp, scores)
        cnts = np.bincount(grp, minlength=nvals)
        stats = {
            values[int(g)]: [float(sums[g]), float(maxs[g]), int(cnts[g])]
            for g in np.unique(grp)
        }
        return stats, axis

    def has_child_search(self, query: str, parent_field: str, k: int = 10,
                         score_mode: str = "max",
                         min_children: int = 1, inner_hits: int = 0,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> list[tuple]:
        """ES has_child-query analog over a join FIELD: the index stores
        child docs (turns) carrying their parent key (conv_id — the
        transcript parent/child relation; generic for any keyword
        column). Returns the top-``k`` PARENTS whose children match the
        query, scored per the ES score_mode: 'max' (default), 'sum',
        'avg' (sum/count, one division), or 'none' (constant 0 —
        filter-only, ranked by parent value asc). ``min_children`` is
        the ES min_children gate. Order (score desc, parent asc).
        Returns [(parent_value, score, n_children)] — with
        ``inner_hits=n`` each row gains a 4th element: that parent's
        top-n children [(doc_id, score)] (the ES inner_hits block),
        gathered for the k SELECTED parents only."""
        if score_mode not in ("max", "sum", "avg", "none"):
            raise ValueError(f"unknown score_mode {score_mode!r}")
        stats, axis = self._parent_group_stats_ex(
            query, parent_field, where, mode, must_not
        )
        rows = []
        for v, (s_sum, s_max, n) in stats.items():
            if n < min_children:
                continue
            if score_mode == "max":
                sc = s_max
            elif score_mode == "sum":
                sc = s_sum
            elif score_mode == "avg":
                sc = s_sum / n
            else:
                sc = 0.0
            rows.append((v, sc, n))
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:k]
        if inner_hits > 0 and rows:
            heads = self._parent_inner_hits(
                query, parent_field, [v for v, _, _ in rows], inner_hits,
                where, mode, must_not, axis=axis,
            )
            rows = [(v, sc, n, heads.get(v, [])) for v, sc, n in rows]
        return rows

    def _parent_inner_hits(self, query: str, parent_field: str,
                           parents: list, top_n: int,
                           where=None, mode="or", must_not=None,
                           axis=None) -> dict:
        """parent value -> its top-n matching children [(doc, score)] —
        per-SELECTED-parent argpartition over the dense scores (the
        facet_top_hits kernel keyed by the join field). ``axis`` reuses
        has_child_search's hit-mask + score pass instead of recomputing
        it."""
        if axis is None:
            axis = self._parent_axis(
                query, parent_field, where, mode, must_not
            )
        if axis is None:
            return {}
        hits, _, buf, codes, values = axis
        vmap = {v: i for i, v in enumerate(values)}
        out: dict = {}
        for v in parents:
            code = vmap.get(v)
            if code is None:
                continue
            idx = np.flatnonzero(hits & (codes == code))
            if idx.size == 0:
                continue
            out[v] = _topk_pairs(idx, buf[idx], top_n)
        return out

    def _matched_parent_values(self, query: str, parent_field: str,
                               where: dict | None = None,
                               mode: str = "or",
                               must_not: str | None = None) -> set:
        """Distinct parent-key VALUES of docs matching the query — the
        parent-selection half of the children agg (values, not codes,
        so sharded segments with different dictionaries can union)."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return set()
        codes, vocab = self._field_codes(parent_field)
        sel = codes[hits]
        return {vocab[int(c)] for c in np.unique(sel[sel >= 0])}

    def _children_hist_for_parents(self, parent_field: str, values: set,
                                   field: str) -> tuple:
        """(n_children, {value: count}) over ALL live docs whose parent
        key is in ``values`` — the step-down half of the children agg.
        One isin mask over the parent codes + one bincount; null
        ``field`` values form no bucket (ES terms default)."""
        if not values:
            return 0, {}
        pcodes, pvocab = self._field_codes(parent_field)
        want = np.array(
            [i for i, v in enumerate(pvocab) if v in values],
            dtype=np.int64,
        )
        in_set = np.isin(pcodes, want)
        if self.excluded.size:
            in_set[self.excluded] = False
        n_children = int(in_set.sum())
        if n_children == 0:
            return 0, {}
        fcodes, fvocab = self._field_codes(field)
        cc = fcodes[in_set]
        cc = cc[cc >= 0]
        if cc.size == 0:
            return n_children, {}
        binc = np.bincount(cc, minlength=len(fvocab))
        return n_children, {
            fvocab[i]: int(n) for i, n in enumerate(binc) if n > 0
        }

    def children_terms_agg(self, query: str, parent_field: str,
                           field: str, size: int = 10,
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None) -> tuple:
        """ES children-aggregation analog over a join FIELD: select
        parents (the distinct ``parent_field`` keys of docs matching
        the query), step DOWN into the children bucket (every live doc
        under a selected parent — the flat-model reading of ES's
        parent-doc -> child-doc step, where this index stores children
        carrying their parent key), and run a terms sub-agg on child
        keyword ``field``. Returns ``(n_children, [(value, count)])``
        — the children bucket's doc_count plus the sub-agg rows (count
        desc, value asc, top ``size``). Two vectorized passes (one
        parent-code unique, one isin + bincount); the sharded twin
        unions parent VALUE sets before the step-down, so membership
        is global exactly like ES's cross-shard routing on parent."""
        vals = self._matched_parent_values(
            query, parent_field, where, mode, must_not
        )
        n_children, hist = self._children_hist_for_parents(
            parent_field, vals, field
        )
        rows = sorted(hist.items(), key=lambda e: (-e[1], e[0]))
        return n_children, rows[:size]

    def has_parent_search(self, parent_query: str, parent_field: str,
                          k: int = 10, score: bool = True,
                          child_where: dict | None = None,
                          score_mode: str = "max") -> list[tuple]:
        """ES has_parent-query analog — the dual of has_child over the
        same join FIELD: return the top-``k`` CHILD docs whose parent
        matches ``parent_query``, each child inheriting its parent's
        relevance (the ES ``score: true`` mode; ``score=False`` is the
        constant-score filter, ranked by doc asc). In this flat model a
        parent's relevance is its has_child-style group score over its
        own children (``score_mode`` 'max' default / 'sum' / 'avg' — the
        same modes has_child exposes), so the two join queries share one
        group-stats kernel and stay mutually consistent.

        ``child_where`` filters the RETURNED children by keyword equality
        (the ES inner filter on the child side); tombstoned children never
        return. Order: (parent_score desc, doc_id asc); with
        ``score=False`` every score is 0.0 and doc asc alone ranks.
        Returns [(doc_id, parent_score, parent_value)]. Works unchanged
        on MultiSearcher (group stats merge exactly; codes resolve per
        segment in the sharded override)."""
        if score_mode not in ("max", "sum", "avg"):
            raise ValueError(f"unknown score_mode {score_mode!r}")
        stats = self._parent_group_stats(parent_query, parent_field)
        if not stats:
            return []
        pmap = {}
        for v, (s_sum, s_max, n) in stats.items():
            pmap[v] = (
                (s_max if score_mode == "max"
                 else s_sum if score_mode == "sum"
                 else s_sum / n) if score else 0.0
            )
        return self._children_of_parents(pmap, parent_field, k, child_where)

    def _children_of_parents(self, pmap: dict, parent_field: str, k: int,
                             child_where: dict | None) -> list[tuple]:
        """Top-k live children of the scored parents in ``pmap`` (value ->
        parent score), order (score desc, doc asc) — the has_parent fetch
        kernel: one code gather + one top-k selection, no per-doc loop."""
        codes, values = self._field_codes(parent_field)
        pscore = np.zeros(len(values), dtype=np.float64)
        qual = np.zeros(len(values), dtype=bool)
        for i, v in enumerate(values):
            sc = pmap.get(v)
            if sc is not None:
                qual[i] = True
                pscore[i] = sc
        keep = codes >= 0
        m = np.zeros(self.N, dtype=bool)
        m[keep] = qual[codes[keep]]
        if self.excluded.size:
            m[self.excluded] = False
        if child_where:
            m &= self.filter_mask(**child_where)
        idx = np.flatnonzero(m)
        if idx.size == 0:
            return []
        sc = pscore[codes[idx]]
        take = min(k, idx.size)
        if idx.size > take:
            kth = np.partition(-sc, take - 1)[take - 1]
            cand = np.flatnonzero(-sc <= kth)
        else:
            cand = np.arange(idx.size)
        order = cand[np.lexsort((idx[cand], -sc[cand]))][:take]
        return [
            (int(idx[i]), float(sc[i]), values[int(codes[idx[i]])])
            for i in order
        ]

    def knn_hybrid_search(self, query: str, knn_hits: list[tuple],
                          k: int = 10,
                          knn_boost: float = 1.0) -> list[tuple]:
        """ES 8 hybrid retrieval (top-level ``knn`` clause combined with
        ``query``): final score = BM25(query) + knn_boost · similarity
        for docs in the kNN result set, plain BM25 for text-only hits,
        boosted similarity alone for vector-only hits — exactly the ES
        sum-of-sections rule. ``knn_hits`` is the [(doc_id, similarity)]
        set a distributed ANN stage produced (extras.similarity
        knn_cosine / LSH / IVF — the num_candidates phase runs OUT THERE
        over the embeddings Dataset; this method is the O(knn_k) driver
        combine + one TAAT pass). Candidates = text hits ∪ knn docs,
        tombstones excluded; order (score desc, doc asc).

        Returns [(doc_id, score)] — scores bit-compatible with search()
        for docs outside the knn set (same dense TAAT kernel)."""
        hits = self._hit_mask(query)
        if hits is not None:
            buf = self._dense_scores(query)
            cand = hits.copy()
        else:
            buf = np.zeros(self.N, dtype=np.float64)
            cand = np.zeros(self.N, dtype=bool)
        for d, sim in knn_hits:
            if 0 <= d < self.N:
                buf[d] += knn_boost * sim
                cand[d] = True
        if self.excluded.size:
            cand[self.excluded] = False
        idx = np.flatnonzero(cand)
        if idx.size == 0:
            return []
        return _topk_pairs(idx, buf[idx], k)

    def sparse_vector_search(self, weights: dict,
                             k: int = 10) -> list[tuple]:
        """ES sparse_vector / rank_features dot-product query (the
        learned-sparse-retrieval shape — ELSER-style token→weight
        queries, ES 8.15 ``sparse_vector``): score(d) = Σ_t w_t ·
        tf(d, t), a saturation-free linear dot over the inverted
        index's stored term frequencies (the doc-side features), no
        idf/norms — exactly the rank_features ``linear`` form. One
        dense TAAT pass over the query tokens' posting lists, terms
        accumulated in sorted order (deterministic float sums, the
        sharded twin repeats it). Absent / stop-filtered tokens
        contribute nothing; non-positive k → []. Order (score desc,
        doc asc)."""
        if k <= 0:
            return []
        buf = np.zeros(self.N, dtype=np.float64)
        cand = np.zeros(self.N, dtype=bool)
        for t in sorted(weights):
            if self.stopwords and t in self.stopwords:
                continue
            p = self.lookup(t)
            if p is None:
                continue
            buf[p.doc_ids] += float(weights[t]) * p.tfs
            cand[p.doc_ids] = True
        if self.excluded.size:
            cand[self.excluded] = False
        idx = np.flatnonzero(cand)
        if idx.size == 0:
            return []
        return _topk_pairs(idx, buf[idx], k)

    def rrf_multi_search(self, rank_lists: list[list[int]],
                         k: int = 10, rrf_k: int = 60) -> list[tuple]:
        """ES multi-retriever ``rrf``: fuse ANY number of already-ranked
        id lists (each leg truncated by its producer to its own
        rank_window) — fused(d) = Σ_legs 1/(rrf_k + rank_d), ranks
        1-based per leg. Tombstoned and out-of-range ids drop WITHOUT
        renumbering ranks (the spent-rank post-filter rule shared with
        the two-leg rrf_search). Order (fused desc, doc asc)."""
        if k <= 0:
            return []
        if rrf_k < 0:
            raise ValueError("rrf_k must be >= 0")
        fused: dict[int, float] = {}
        for ids in rank_lists:
            for r, d in enumerate(ids, 1):
                d = int(d)
                if not 0 <= d < self.N:
                    continue
                if self.excluded.size and d in self._excluded_set:
                    continue
                fused[d] = fused.get(d, 0.0) + 1.0 / (rrf_k + r)
        out = sorted(fused.items(), key=lambda e: (-e[1], e[0]))
        return out[:k]

    def rrf_search(self, query: str, knn_ranked_ids: list[int],
                   k: int = 10, rank_window: int = 100,
                   rrf_k: int = 60) -> list[tuple]:
        """ES retriever-API ``rrf`` analog (the ES 8.8+ hybrid default):
        reciprocal-rank fusion of the BM25 ranking and a kNN ranking —
        fused(d) = Σ_lists 1/(rrf_k + rank_d), ranks 1-based within
        each list truncated to ``rank_window`` (the ES rank_window_size;
        rrf_k is the ES rank_constant, default 60). ``knn_ranked_ids``
        is the ANN stage's ALREADY-ORDERED candidate list (the
        distributed num_candidates phase runs over the embeddings
        Dataset; this is the O(window) driver fuse). Rank-based, so no
        score normalization is needed — the point of RRF. Tombstoned
        and out-of-range knn ids drop WITHOUT renumbering ranks (their
        rank is spent, matching ES's post-filter semantics). Final
        order (fused desc, doc asc); returns [(doc_id, fused_score)]."""
        if k <= 0:
            return []
        if rank_window < 1 or rrf_k < 0:
            raise ValueError("rank_window must be >= 1, rrf_k >= 0")
        fused: dict[int, float] = {}
        bm25 = self.search(query, k=rank_window)
        for r, (d, _) in enumerate(bm25, 1):
            fused[d] = fused.get(d, 0.0) + 1.0 / (rrf_k + r)
        for r, d in enumerate(knn_ranked_ids[:rank_window], 1):
            d = int(d)
            if not 0 <= d < self.N:
                continue
            if self.excluded.size and bool(np.isin(d, self.excluded)):
                continue
            fused[d] = fused.get(d, 0.0) + 1.0 / (rrf_k + r)
        out = sorted(fused.items(), key=lambda e: (-e[1], e[0]))
        return out[:k]

    def linear_retriever_search(self, query: str,
                                knn_hits: list[tuple], k: int = 10,
                                rank_window: int = 100,
                                text_weight: float = 1.0,
                                knn_weight: float = 1.0,
                                normalizer: str = "minmax"
                                ) -> list[tuple]:
        """ES retriever-API ``linear`` analog (the weighted-sum hybrid
        beside rrf): each retriever's top-``rank_window`` scores
        normalize independently — ``minmax`` maps [min, max] -> [0, 1]
        (single-score lists and zero ranges map to 1.0, the ES
        degenerate rule pinned here), ``none`` keeps raw scores — then
        combined(d) = text_weight · norm_text(d) + knn_weight ·
        norm_knn(d), absent-list contributions 0. ``knn_hits`` is the
        ANN stage's [(doc_id, similarity)] output. Final order
        (combined desc, doc asc). The float op order (per-list
        normalize, then weight, then one add) is pinned for the SQL
        twin."""
        if k <= 0:
            return []
        if rank_window < 1:
            raise ValueError("rank_window must be >= 1")
        knn = [
            (int(d), float(s)) for d, s in knn_hits[:rank_window]
            if 0 <= int(d) < self.N
            and not (self.excluded.size
                     and bool(np.isin(int(d), self.excluded)))
        ]
        return _linear_fuse(self.search(query, k=rank_window), knn,
                            text_weight, knn_weight, normalizer, k)

    SIMILARITIES = ("lmd", "classic", "boolean")
    LMD_MU = 2000.0  # Lucene LMDirichletSimilarity default

    def _sim_accumulate(self, qtf: dict, stats: dict, N: int, TC: float,
                        similarity: str, mu: float):
        """One index's (score buffer, matched-clause counts) under a
        non-BM25 similarity, GLOBAL stats injected (a MultiSearcher
        passes merged df/cf/N/total-tokens so sharded == single by
        construction). Vectorized per term over live postings."""
        buf = np.zeros(self.N, dtype=np.float64)
        cnt = np.zeros(self.N, dtype=np.int32)
        for term in sorted(qtf):
            st = stats.get(term)
            if st is None:
                continue
            df, cf = st
            p = self.lookup(term)
            if p is None:
                continue
            if p.live_mask is None:
                ids, tfs = p.doc_ids, p.tfs
            else:
                ids, tfs = p.doc_ids[p.live_mask], p.tfs[p.live_mask]
            if ids.size == 0:
                continue
            w = qtf[term]
            if similarity == "boolean":
                buf[ids] += w
            elif similarity == "lmd":
                dls = self.dl[ids].astype(np.float64)
                sc = np.log1p(tfs.astype(np.float64) * (TC / (mu * cf))) \
                    + np.log(mu / (dls + mu))
                buf[ids] += w * np.maximum(sc, 0.0)
            else:  # classic
                idf = 1.0 + math.log(N / (df + 1.0))
                buf[ids] += w * np.sqrt(tfs.astype(np.float64)) * idf * idf
            cnt[ids] += 1
        return buf, cnt

    def search_similarity(self, query: str, k: int = 10,
                          similarity: str = "lmd",
                          mu: float = LMD_MU) -> list[tuple]:
        """ES similarity-module analog: the SAME index served under a
        non-BM25 scoring model, the per-field ``similarity`` setting of
        ES mappings. The reference plugin's ES generation (0.90/1.x)
        defaulted to Lucene CLASSIC TF-IDF, so this closes the era-parity
        gap; 'lmd' and 'boolean' are the other stock Lucene modules that
        need no extra index state.

        Pinned formulas (one float-op order, shared with the SQL
        oracles; per-term, summed over matching clauses):
        - lmd (LMDirichletSimilarity, ``mu`` default 2000): qtf ·
          max(0, ln(1 + tf·(TC/(mu·cf))) + ln(mu/(dl+mu))), TC = total
          corpus tokens — Lucene's per-clause >= 0 clamp included;
        - classic (ClassicSimilarity): [Σ qtf·sqrt(tf)·idf²] · coord /
          sqrt(dl), idf = 1 + ln(N/(df+1)), coord = matched/total query
          clauses (absent-from-index clauses still count in the
          denominator, the BooleanQuery maxOverlap rule). DIVERGENCES,
          documented: queryNorm omitted (a per-query constant — rank
          order unchanged) and norms kept EXACT instead of Lucene's
          lossy byte quantization;
        - boolean (BooleanSimilarity): qtf (the clause boost) per match.

        Candidates = docs matching >= 1 live clause (an all-common-terms
        lmd doc may legitimately score 0.0 but still hits). Order
        (score desc, doc asc). Returns [(doc_id, score)]."""
        if similarity not in self.SIMILARITIES:
            raise ValueError(f"unknown similarity {similarity!r}")
        qtf = self._qweights(query)
        stats = {}
        for t in qtf:
            p = self.lookup(t)
            if p is not None:
                stats[t] = (int(p.df), int(p.cf))
        buf, cnt = self._sim_accumulate(
            qtf, stats, self.N, self._total_tokens(), similarity, mu
        )
        return self._sim_finalize(buf, cnt, len(qtf), similarity, k,
                                  dl=self.dl)

    @staticmethod
    def _sim_finalize(buf, cnt, n_clauses: int, similarity: str,
                      k: int, dl=None) -> list[tuple]:
        """coord/norm finalization + top-k (score desc, doc asc)."""
        idx = np.flatnonzero(cnt > 0)
        if idx.size == 0:
            return []
        sc = buf[idx]
        if similarity == "classic":
            sc = sc * cnt[idx] / n_clauses / np.sqrt(
                np.maximum(dl[idx].astype(np.float64), 1.0)
            )
        return _topk_pairs(idx, sc, k)

    def cardinality_agg(self, query: str, field: str,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> int:
        """ES cardinality-aggregation analog over ALL query hits — EXACT
        distinct count of keyword column ``field`` (ES ships HyperLogLog++
        approximations; hit sets here are dense masks over dictionary
        codes, so the exact answer is one np.unique away). Nulls form no
        value, matching the ES default. Composes with where / bool
        restrictions / tombstones like every other aggregation."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return 0
        codes, _ = self._field_codes(field)
        sel = codes[hits]
        return int(np.unique(sel[sel >= 0]).size)

    def _merged_facet_hist(self, query: str, field: str,
                           where=None, mode="or", must_not=None) -> dict:
        """SuggestAPI.composite_agg primitive: the single-index value
        histogram IS the merged histogram."""
        return self._facet_hist(query, field, where, mode, must_not)

    def _merged_pairs_hist(self, query: str, date_field: str,
                           calendar_interval: str, term_field: str,
                           where=None, mode="or", must_not=None) -> dict:
        """Two-source composite primitive: ((month_start, value) ->
        count) from ONE combined-key bincount (calendar_floor months x
        term dictionary codes)."""
        unit = self._CALENDAR_UNITS[calendar_interval]
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}
        tv, tvalid = self._numeric_col(date_field)
        codes, values = self._field_codes(term_field)
        sel = hits & tvalid & (codes >= 0)
        idx = np.flatnonzero(sel)
        if idx.size == 0:
            return {}
        months = calendar_floor(tv[idx].astype(np.int64), unit)
        V = np.int64(len(values))
        key = months * V + codes[idx]
        uniq, cnt = np.unique(key, return_counts=True)
        return {
            (int(k) // int(V), values[int(k) % int(V)]): int(c)
            for k, c in zip(uniq, cnt)
        }

    def _sig_foreground(self, query: str, where=None, mode="or",
                        must_not=None,
                        sample_size: int | None = None) -> tuple[int, dict]:
        """(n_hits, term -> foreground df) from ONE vectorized
        re-analysis of the hit docs' stored text — the per-segment unit
        the sharded significant_terms sums. ``sample_size`` is the ES
        sampler/shard_size scale knob: None = exact over ALL hits (the
        oracle mode — at a Zipf-head query that text volume approaches
        the corpus); an int re-analyzes only the top-``sample_size``
        hits by BM25 (deterministic: score desc, doc asc), which is how
        ES actually runs significant_terms under a sampler agg."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return 0, {}
        idx = np.flatnonzero(hits)
        if sample_size is not None and idx.size > sample_size:
            buf = self._dense_scores(query)
            scores = buf[idx]
            kth = np.partition(-scores, sample_size - 1)[sample_size - 1]
            cand = np.flatnonzero(-scores <= kth)
            order = cand[np.lexsort((idx[cand], -scores[cand]))]
            idx = np.sort(idx[order[:sample_size]])
        n_hits = int(idx.size)
        if n_hits == 0:
            return 0, {}
        from .analysis import tokens_flat

        texts = self.get_by_doc_id([int(d) for d in idx])["text"]
        flat, parent = tokens_flat(texts.combine_chunks())
        if self.stopwords and len(flat):
            from .analysis import stop_filter

            flat, parent, _ = stop_filter(flat, parent, None, self.stopwords)
        if len(flat) == 0:
            return n_hits, {}
        denc = pc.dictionary_encode(flat)
        tidx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nvocab = len(denc.dictionary)
        pair = np.unique(tidx * n_hits + parent)
        fg_counts = np.bincount(pair // n_hits, minlength=nvocab)
        vocab = denc.dictionary.to_pylist()
        return n_hits, {
            vocab[int(i)]: int(fg_counts[i])
            for i in np.flatnonzero(fg_counts)
        }

    _merged_sig_foreground = _sig_foreground

    def define_runtime_field(self, name: str, expr) -> None:
        """ES runtime-mappings analog: register a QUERY-TIME derived
        numeric field usable anywhere a docstore numeric column is
        (stats / extended_stats / range / histogram / percentiles
        aggs, sort-by-field, decay / rank_feature scoring, ...).
        ``expr`` is a tiny arithmetic AST instead of Painless — either
        a number, {"col": <docstore column>}, or {"op": one of
        '+ - * /', "a": expr, "b": expr}. Evaluated vectorized ONCE and
        cached like any numeric column; validity = AND of every
        referenced column's (plus denominator != 0 for '/')."""
        if name in self._numeric_cols:
            del self._numeric_cols[name]
        self._runtime_fields[name] = expr

    def _eval_runtime(self, expr, extra: dict | None = None) -> tuple:
        if isinstance(expr, (int, float)):
            return (np.full(self.N, float(expr)),
                    np.ones(self.N, dtype=bool))
        if "col" in expr:
            if extra is not None and expr["col"] in extra:
                return extra[expr["col"]]
            return self._numeric_col(expr["col"])
        a, va = self._eval_runtime(expr["a"], extra)
        b, vb = self._eval_runtime(expr["b"], extra)
        op = expr["op"]
        valid = va & vb
        if op == "+":
            vals = a + b
        elif op == "-":
            vals = a - b
        elif op == "*":
            vals = a * b
        elif op == "/":
            valid = valid & (b != 0)
            vals = np.divide(a, b, out=np.zeros_like(a),
                             where=b != 0)
        else:
            raise ValueError(f"runtime field op {op!r} (one of + - * /)")
        return vals, valid

    def script_score_search(self, query: str, script, k: int = 10,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None) -> list[tuple]:
        """ES script_score query: every hit of the inner query re-scored
        by an expression over docstore numeric columns and ``_score``
        (the hit's BM25 score) — the runtime-mappings arithmetic AST
        with ``{"col": "_score"}`` resolving to the query score. Docs
        where any referenced column is null drop (the ES null-access
        script error, resolved the engine's fail-closed way); a script
        producing a NEGATIVE score raises, the ES script_score
        contract. Order (script score desc, doc_id asc), top-``k``.
        Returns [(doc_id, script_score)]."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        buf = self._dense_scores(query)
        vals, valid = self._eval_runtime(
            script, extra={"_score": (buf, hits)}
        )
        m = hits & valid
        idx = np.flatnonzero(m)
        if idx.size == 0:
            return []
        s = vals[idx]
        if (s < 0).any():
            raise ValueError(
                "script_score produced a negative score — ES requires "
                "script scores to be non-negative"
            )
        order = np.lexsort((idx, -s))[:k]
        return [(int(idx[i]), float(s[i])) for i in order]

    def _numeric_col(self, field: str):
        """Dense doc_id -> value array for a numeric docstore column plus
        a validity mask (nulls excluded from aggregations, like ES).
        Column-pruned read, cached per searcher — the numeric analog of
        ``_field_codes``. Runtime fields (define_runtime_field) resolve
        here too, so every numeric agg/sort accepts them untouched."""
        self._field_usage[field] = self._field_usage.get(field, 0) + 1
        cached = self._numeric_cols.get(field)
        if cached is not None:
            return cached
        rt = self._runtime_fields.get(field)
        if rt is not None:
            out = self._eval_runtime(rt)
            self._numeric_cols[field] = out
            return out
        ds = pads.dataset(self._docstore_dir)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = ds.to_table(columns=cols)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        col = t[field]
        valid = np.ones(self.N, dtype=bool) if col.null_count == 0 else \
            np.zeros(self.N, dtype=bool)
        vals = np.zeros(self.N, dtype=np.float64)
        if col.null_count:
            vmask = pc.is_valid(col).to_numpy(zero_copy_only=False)
            valid[ids[vmask]] = True
            vals[ids[vmask]] = pc.drop_null(col).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
        else:
            vals[ids] = col.to_numpy(zero_copy_only=False).astype(np.float64)
        self._numeric_cols[field] = (vals, valid)
        return vals, valid

    def stats_agg(self, query: str, field: str, where: dict | None = None,
                  mode: str = "or", must_not: str | None = None) -> dict:
        """ES stats-aggregation analog over ALL query hits: count / min /
        max / sum of numeric docstore column ``field``. No BM25 work —
        one mask + four numpy reductions. Composes with where / bool
        restrictions / tombstones like facet_counts; values are exact
        (not sharded approximations). Keys with no hits -> count=0 and
        null-ish extrema (None), matching the ES empty-agg shape."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {"count": 0, "min": None, "max": None, "sum": 0.0}
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0.0}
        return {
            "count": int(sel.size),
            "min": float(sel.min()),
            "max": float(sel.max()),
            "sum": float(sel.sum()),
        }

    def extended_stats_agg(self, query: str, field: str,
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None) -> dict:
        """ES extended_stats analog: stats_agg plus sum_of_squares and
        the population variance/std. For integral columns count/min/max/
        sum/sum_sq are EXACT integers (int64 reductions), so the oracle
        can verify variance with pure integer arithmetic:
        n² · variance = n·sum_sq − sum² (the driver query emits exactly
        that product). std_dev = sqrt(variance) provided as a float."""
        hits = self._hit_mask(query, where, mode, must_not)
        base = {"count": 0, "min": None, "max": None, "sum": 0,
                "sum_sq": 0, "variance": None, "std_dev": None}
        if hits is None:
            return base
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return base
        n = int(sel.size)
        if np.all(sel == np.floor(sel)):  # integral column: exact int path
            s_i = sel.astype(np.int64)
            total = _exact_int_sum(s_i)
            sum_sq = _exact_prod_sum(s_i, s_i)
            var = (n * sum_sq - total * total) / (n * n)
        else:
            total = float(sel.sum())
            sum_sq = float((sel * sel).sum())
            var = (n * sum_sq - total * total) / (n * n)
        return {
            "count": n,
            "min": float(sel.min()),
            "max": float(sel.max()),
            "sum": total,
            "sum_sq": sum_sq,
            "variance": var,
            "std_dev": math.sqrt(max(var, 0.0)),
        }

    def _moment_stats(self, query: str, field: str,
                      where: dict | None = None, mode: str = "or",
                      must_not: str | None = None) -> tuple:
        """(n, sum, sum_sq) over the hit set — the t_test sufficient
        statistics. Integral columns return EXACT int64 sums (the
        extended_stats convention) so the sharded merge and the SQL
        oracle agree bit-for-bit; each per-segment partial is O(1) to
        merge."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return 0, 0, 0
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return 0, 0, 0
        if np.all(sel == np.floor(sel)):
            s_i = sel.astype(np.int64)
            return (int(sel.size), _exact_int_sum(s_i),
                    _exact_prod_sum(s_i, s_i))
        return int(sel.size), float(sel.sum()), float((sel * sel).sum())

    def t_test_agg(self, query: str, field: str, where_a: dict,
                   where_b: dict, ttype: str = "heteroscedastic",
                   mode: str = "or", must_not: str | None = None) -> dict:
        """ES t_test-aggregation analog: two-sample Student t statistic
        of numeric column ``field`` between two keyword-filtered
        populations of the SAME query hit set (the ES unpaired forms —
        'heteroscedastic' = Welch, the ES default, or 'homoscedastic' =
        pooled variance). DIVERGENCE, pinned for the oracle: ES emits the
        two-tailed p-value; this engine emits the t statistic plus the
        exact sufficient statistics (n, sum, sum_sq per group), because
        the p-value is a monotone function of (t, dof) and SQL engines
        carry no t-CDF — the statistic is the verifiable quantity.

        Closed forms (one float op order, shared with the SQL oracle):
        mean = s/n; sample var = (n*ss - s*s) / (n*(n-1));
        Welch   t = (m1-m2) / sqrt(v1/n1 + v2/n2)
        pooled  t = (m1-m2) / sqrt(sp2 * (1/n1 + 1/n2)),
                sp2 = ((n1-1)*v1 + (n2-1)*v2) / (n1+n2-2).
        Returns {n_a, n_b, sum_a, sum_b, sum_sq_a, sum_sq_b, t} — t None
        when either group has < 2 values (ES returns null). Sums are
        exact ints on integral columns, so the sharded t is bit-identical
        to the single-index t by construction."""
        if ttype not in ("heteroscedastic", "homoscedastic"):
            raise ValueError(f"unknown t_test type {ttype!r}")
        n1, s1, ss1 = self._moment_stats(query, field, where_a, mode,
                                         must_not)
        n2, s2, ss2 = self._moment_stats(query, field, where_b, mode,
                                         must_not)
        out = {"n_a": n1, "n_b": n2, "sum_a": s1, "sum_b": s2,
               "sum_sq_a": ss1, "sum_sq_b": ss2, "t": None}
        if n1 < 2 or n2 < 2:
            return out
        m1, m2 = s1 / n1, s2 / n2
        v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))
        v2 = (n2 * ss2 - s2 * s2) / (n2 * (n2 - 1))
        if ttype == "heteroscedastic":
            denom = math.sqrt(v1 / n1 + v2 / n2)
        else:
            sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
            denom = math.sqrt(sp2 * (1 / n1 + 1 / n2))
        out["t"] = (m1 - m2) / denom if denom > 0 else None
        return out

    def scripted_metric(self, query: str, map_script, reduce_script,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None):
        """ES scripted_metric-aggregation analog: a user-defined
        map/reduce over the query hit set. ``map_script(fields)`` runs
        ONCE PER SHARD (this single index = one shard; each MultiSearcher
        segment = one shard) and returns an arbitrary partial state —
        ``fields`` is a callable ``name -> np.ndarray`` yielding the
        hit-selected values of a numeric docstore column, so the script
        body is vectorized numpy, never a per-doc loop (the init_script +
        map_script + combine_script of ES collapse into this one
        per-shard vectorized pass — combine IS the script returning its
        combined state). ``reduce_script(states)`` folds the per-shard
        partials into the final result on the driver, exactly ES's
        reduce_script contract (receives a LIST, one entry per shard
        that had hits)."""
        hits = self._hit_mask(query, where, mode, must_not)
        states = []
        if hits is not None and hits.any():
            def fields(name: str) -> np.ndarray:
                vals, valid = self._numeric_col(name)
                return vals[hits & valid]

            states.append(map_script(fields))
        return reduce_script(states)

    def _numeric_value_hist(self, query: str, field: str,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None) -> dict:
        """Exact value -> doc-count histogram of a numeric column over
        the hit set (one np.unique) — the per-segment unit the
        variable_width clusterer consumes; sharded merges sum these
        exactly like facet histograms."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {}
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return {}
        u, c = np.unique(sel, return_counts=True)
        return {float(v): int(n) for v, n in zip(u, c)}

    def variable_width_histogram_agg(self, query: str, field: str,
                                     buckets: int = 4,
                                     where: dict | None = None,
                                     mode: str = "or",
                                     must_not: str | None = None
                                     ) -> list[tuple]:
        """ES variable_width_histogram analog over the hit set —
        deterministic exact 1D k-means via :func:`variable_width_buckets`
        (ES's own result is collection-order-dependent; pinning the
        optimum makes it reproducible and shard-invariant). Returns
        [(min, max, count, sum)] value-ascending."""
        return variable_width_buckets(
            self._numeric_value_hist(query, field, where, mode, must_not),
            buckets,
        )

    def mtermvectors(self, doc_ids: list[int]) -> list[tuple]:
        """ES _mtermvectors API: termvectors for several docs in ONE
        call, input-order-preserving, missing/tombstoned doc -> KeyError
        (the multiget S8 convention — fail loudly, never silently skip).
        Returns [(doc_id, termvectors_rows)]."""
        return [(int(d), self.termvectors(int(d))) for d in doc_ids]

    def shards(self) -> list[dict]:
        """ES _search_shards / _cat/shards analog: one descriptor per
        shard — a single index is one shard. Fields: doc offset, total
        docs, live docs, index path — what a router needs to plan a
        sharded query."""
        return [{
            "shard": 0,
            "offset": 0,
            "n_docs": int(self.N),
            "live_docs": int(self.N - self.excluded.size),
            "index_dir": self.index_dir,
        }]

    def weighted_avg_agg(self, query: str, field: str, weight_field: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> dict:
        """ES weighted_avg analog: sum(value·weight)/sum(weight) over the
        hit set; rows where either column is null drop (the ES
        value/weight missing rule without configured defaults). Integral
        columns keep the numerator/denominator exact for the oracle."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {"count": 0, "num": 0, "den": 0, "value": None}
        v, vok = self._numeric_col(field)
        w, wok = self._numeric_col(weight_field)
        m = hits & vok & wok
        if not m.any():
            return {"count": 0, "num": 0, "den": 0, "value": None}
        vs, ws = v[m], w[m]
        if np.all(vs == np.floor(vs)) and np.all(ws == np.floor(ws)):
            vi, wi = vs.astype(np.int64), ws.astype(np.int64)
            num = _exact_prod_sum(vi, wi)
            den = _exact_int_sum(wi)
        else:
            num = float((vs * ws).sum())
            den = float(ws.sum())
        return {
            "count": int(m.sum()),
            "num": num,
            "den": den,
            "value": num / den if den else None,
        }

    def value_count_agg(self, query: str, field: str,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> int:
        """ES value_count-aggregation analog: number of NON-NULL values
        of ``field`` over ALL query hits (numeric or keyword column —
        single-valued here, so value count == doc count with the field
        present). One mask AND."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return 0
        try:
            _, valid = self._numeric_col(field)
        except (ValueError, TypeError, pa.lib.ArrowInvalid,
                pa.lib.ArrowNotImplementedError):
            # non-numeric column: fall back to the keyword-code path
            codes, _ = self._field_codes(field)
            valid = codes >= 0
        return int((hits & valid).sum())

    def median_absolute_deviation_agg(self, query: str, field: str,
                                      where: dict | None = None,
                                      mode: str = "or",
                                      must_not: str | None = None) -> dict:
        """ES median_absolute_deviation analog over ALL query hits —
        EXACT: median = quantile_cont(0.5) over the sorted hit values
        (the percentiles_agg rule; ES ships a t-digest approximation),
        mad = the same median over |value - median|. Float op order
        pinned for the oracle: abs(v - med), one sort each side."""
        hits = self._hit_mask(query, where, mode, must_not)
        base = {"count": 0, "median": None, "mad": None}
        if hits is None:
            return base
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return base
        med = _percentiles_from_sorted(np.sort(sel), (50.0,))[50.0]
        dev = np.abs(sel - med)
        mad = _percentiles_from_sorted(np.sort(dev), (50.0,))[50.0]
        return {"count": int(sel.size), "median": med, "mad": mad}

    def boxplot_agg(self, query: str, field: str,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> dict:
        """ES boxplot-aggregation analog over ALL query hits — EXACT
        five-number summary (min, q1, q2, q3, max) with quantile_cont
        interpolation (ES ships t-digest; one segment's hit values are
        one numpy array, so the exact answer is one sort)."""
        hits = self._hit_mask(query, where, mode, must_not)
        base = {"count": 0, "min": None, "q1": None, "q2": None,
                "q3": None, "max": None}
        if hits is None:
            return base
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return base
        s = np.sort(sel)
        q = _percentiles_from_sorted(s, (25.0, 50.0, 75.0))
        return {
            "count": int(sel.size),
            "min": float(s[0]),
            "q1": q[25.0],
            "q2": q[50.0],
            "q3": q[75.0],
            "max": float(s[-1]),
        }

    def string_stats_agg(self, query: str, field: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> dict:
        """ES string_stats-aggregation analog over ALL query hits:
        count / min_length / max_length / avg_length of keyword column
        ``field`` plus the Shannon entropy of its CHARACTER distribution
        (-sum p_c * log2(p_c)). Length stats come from exact integer
        sums over the dictionary codes' bincount (O(hits + vocab), the
        values are touched once each); entropy accumulates in ascending
        character order (the op sequence the SQL oracle mirrors with
        sum(... ORDER BY char))."""
        hits = self._hit_mask(query, where, mode, must_not)
        base = {"count": 0, "min_length": None, "max_length": None,
                "len_sum": 0, "entropy": None}
        if hits is None:
            return base
        codes, values = self._field_codes(field)
        sel = codes[hits]
        cnt = np.bincount(sel[sel >= 0], minlength=len(values))
        n = int(cnt.sum())
        if n == 0:
            return base
        lens = np.array([len(v) for v in values], dtype=np.int64)
        present = cnt > 0
        len_sum = int((lens * cnt).sum())
        char_counts: dict[str, int] = {}
        for v, c in zip(values, cnt):
            if c == 0:
                continue
            for ch in v:
                char_counts[ch] = char_counts.get(ch, 0) + int(c)
        total_chars = len_sum
        ent = 0.0
        for ch in sorted(char_counts):
            p = char_counts[ch] / total_chars
            ent += p * math.log2(p)
        return {
            "count": n,
            "min_length": int(lens[present].min()),
            "max_length": int(lens[present].max()),
            "len_sum": len_sum,
            "entropy": -ent if total_chars else None,
        }

    def matrix_stats_agg(self, query: str, field_x: str, field_y: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> dict:
        """ES matrix_stats-aggregation analog for a numeric field pair
        over ALL query hits: exact integer moment sums (n, sx, sy, sxx,
        syy, sxy — rows with either value null drop, the ES multi-field
        missing rule) plus the derived POPULATION covariance and the
        Pearson correlation (scale-invariant, so sample-vs-population
        normalization cancels). Integral columns keep every sum exact
        for the oracle; derived floats use the pinned op order
        (n*sxy - sx*sy) / (n*n) and num / sqrt(varx_num * vary_num)."""
        hits = self._hit_mask(query, where, mode, must_not)
        base = {"count": 0, "sx": 0, "sy": 0, "sxx": 0, "syy": 0,
                "sxy": 0, "covariance": None, "correlation": None}
        if hits is None:
            return base
        x, xok = self._numeric_col(field_x)
        y, yok = self._numeric_col(field_y)
        m = hits & xok & yok
        if not m.any():
            return base
        xs, ys = x[m], y[m]
        n = int(m.sum())
        if np.all(xs == np.floor(xs)) and np.all(ys == np.floor(ys)):
            xi = xs.astype(np.int64)
            yi = ys.astype(np.int64)
            sx, sy = _exact_int_sum(xi), _exact_int_sum(yi)
            sxx = _exact_prod_sum(xi, xi)
            syy = _exact_prod_sum(yi, yi)
            sxy = _exact_prod_sum(xi, yi)
        else:
            sx, sy = float(xs.sum()), float(ys.sum())
            sxx = float((xs * xs).sum())
            syy = float((ys * ys).sum())
            sxy = float((xs * ys).sum())
        cov_num = n * sxy - sx * sy
        varx_num = n * sxx - sx * sx
        vary_num = n * syy - sy * sy
        corr = (
            cov_num / math.sqrt(varx_num * vary_num)
            if varx_num > 0 and vary_num > 0 else None
        )
        return {
            "count": n, "sx": sx, "sy": sy, "sxx": sxx, "syy": syy,
            "sxy": sxy,
            "covariance": cov_num / (n * n),
            "correlation": corr,
        }

    def histogram_agg(self, query: str, field: str, interval: float,
                      where: dict | None = None, mode: str = "or",
                      must_not: str | None = None,
                      offset: float = 0.0,
                      min_doc_count: int = 1) -> list[tuple]:
        """ES histogram-aggregation analog: fixed-interval buckets over
        numeric ``field`` for ALL query hits. Bucket key = ES's
        ``floor((value - offset) / interval) * interval + offset`` (the
        ES ``offset`` knob shifts bucket boundaries; 0 = the classic
        floor); returns non-empty buckets ascending by key (ES histogram
        order). A date_histogram with fixed_interval is this exact
        computation over an epoch column."""
        if interval <= 0:
            raise ValueError("interval must be positive")
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return []
        keys = np.floor((sel - offset) / interval) * interval + offset
        uniq, cnt = np.unique(keys, return_counts=True)
        if min_doc_count == 0 and uniq.size:
            # ES gap filling: every interval multiple between the first
            # and last non-empty bucket appears, zero-count rows filled
            steps = np.round((uniq - uniq[0]) / interval).astype(np.int64)
            n_axis = int(steps[-1]) + 1
            full = np.zeros(n_axis, dtype=np.int64)
            full[steps] = cnt
            axis = uniq[0] + np.arange(n_axis, dtype=np.float64) * interval
            return [(float(a), int(c)) for a, c in zip(axis, full)]
        return [(float(u), int(c)) for u, c in zip(uniq, cnt)]

    # ES auto_date_histogram rounds on a calendar ladder; this engine
    # pins a FIXED-seconds ladder (1s..1y) so the chosen interval is a
    # pure function of (min, max, target) both sides of the oracle
    AUTO_DATE_LADDER = (1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800,
                        43200, 86400, 604800, 2592000, 7776000, 31536000)

    def auto_date_histogram_agg(self, query: str, field: str,
                                target_buckets: int = 10,
                                where: dict | None = None, mode: str = "or",
                                must_not: str | None = None
                                ) -> tuple[int, list[tuple]]:
        """ES auto_date_histogram analog: the SMALLEST ladder interval
        whose spanned bucket count floor(max/i) - floor(min/i) + 1 fits
        ``target_buckets`` (falling back to the coarsest rung when even
        a year overflows); buckets are then histogram_agg's
        floor(value/interval)*interval keys. Returns
        (interval_seconds, [(key, count)])."""
        if target_buckets < 1:
            raise ValueError("target_buckets must be >= 1")
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return (self.AUTO_DATE_LADDER[-1], [])
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return (self.AUTO_DATE_LADDER[-1], [])
        mn, mx = float(sel.min()), float(sel.max())
        interval = next(
            (i for i in self.AUTO_DATE_LADDER
             if math.floor(mx / i) - math.floor(mn / i) + 1
             <= target_buckets),
            self.AUTO_DATE_LADDER[-1],
        )
        return interval, self.histogram_agg(
            query, field, float(interval), where, mode, must_not
        )

    def range_agg(self, query: str, field: str, ranges: list,
                  where: dict | None = None, mode: str = "or",
                  must_not: str | None = None) -> list[tuple]:
        """ES range-aggregation analog over ALL query hits: each
        (from_, to) bucket counts hits with from_ <= value < to (None =
        unbounded, the ES from-inclusive / to-exclusive rule). Buckets
        are INDEPENDENT — they may overlap or leave gaps, exactly as ES
        evaluates each range on its own. Nulls are excluded. Returns
        [(key, count)] in input order, key = the ES "from-to" string
        with '*' for an open end."""
        keys = [_range_agg_key(f, t) for f, t in ranges]
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return [(k, 0) for k in keys]
        vals, valid = self._numeric_col(field)
        v = vals[hits & valid]
        out = []
        for (f, t), key in zip(ranges, keys):
            m = np.ones(v.size, dtype=bool)
            if f is not None:
                m &= v >= f
            if t is not None:
                m &= v < t
            out.append((key, int(m.sum())))
        return out

    def filters_agg(self, query: str, filters: dict,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> list[tuple]:
        """ES filters-aggregation analog: named filter buckets (keyword /
        range where-dicts, the filter_mask surface) counted over the SAME
        query hit set; buckets independent, overlap fine. Returns
        [(name, count)] in input order."""
        hits = self._hit_mask(query, where, mode, must_not)
        out = []
        for name, flt in filters.items():
            if hits is None:
                out.append((name, 0))
                continue
            out.append((name, int((hits & self.filter_mask(**flt)).sum())))
        return out

    def missing_agg(self, query: str, field: str,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> int:
        """ES missing-aggregation analog: count of query hits whose
        keyword ``field`` is null."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return 0
        codes, _ = self._field_codes(field)
        return int((hits & (codes < 0)).sum())

    def global_stats_agg(self, query: str, field: str) -> dict:
        """ES global-aggregation analog: a bucket that ESCAPES the
        query scope — alongside the query's own hit count it reports
        count/sum of numeric ``field`` over the WHOLE live index
        (tombstones out, nulls out), the ES global+stats composition.
        Exactness bound: float64 sum, exact for integral columns while
        the total stays under 2^53 (the stats_agg convention)."""
        n_hits = self._hit_count(query)
        vals, valid = self._numeric_col(field)
        live = np.ones(self.N, dtype=bool)
        if self.excluded.size:
            live[self.excluded] = False
        sel = vals[live & valid]
        return {
            "n_hits": n_hits,
            "n_global": int(live.sum()),
            "n_field": int(sel.size),
            "sum_field": float(sel.sum()),
        }

    def sampler_terms_agg(self, query: str, field: str,
                          shard_size: int = 100,
                          size: int = 10) -> list[tuple]:
        """ES sampler-aggregation analog (the plain, non-diversified
        one): restrict the sub-aggregation to the top ``shard_size``
        hits by relevance (score desc, doc_id asc — the ES
        best-matching sample), then run a terms agg on keyword
        ``field`` inside the sample. Returns [(value, count)] count
        desc then value asc, top ``size``; null field values form no
        bucket (ES default)."""
        hits = self.search(query, k=shard_size)
        if not hits:
            return []
        codes, vocab = self._field_codes(field)
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        cc = codes[ids]
        cc = cc[cc >= 0]
        if cc.size == 0:
            return []
        binc = np.bincount(cc, minlength=len(vocab))
        rows = [(vocab[i], int(n)) for i, n in enumerate(binc) if n > 0]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:size]

    def _random_sample_ids(self, query: str, probability: float,
                           seed: int, where: dict | None = None,
                           mode: str = "or", must_not: str | None = None,
                           offset: int = 0) -> np.ndarray:
        """Deterministic pseudo-random subset of the hit set (LOCAL
        dense ids): a doc survives iff md5-prefix-u32 of
        ``f"{seed}:{global_id}"`` < floor(probability * 2^32) — the ONE
        md5 rule (extras.sampling.md5_prefix_u32, shared with
        random_score and the hash-split stage) so the DuckDB twin stays
        pinned. ``offset`` maps local to GLOBAL ids, making the sharded
        run exact: a doc hashes identically wherever it lives."""
        from .extras.sampling import md5_prefix_u32

        if not 0.0 < probability <= 1.0:
            raise ValueError("probability must be in (0, 1]")
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return np.empty(0, dtype=np.int64)
        idx = np.flatnonzero(hits).astype(np.int64)
        if idx.size == 0 or probability == 1.0:
            return idx
        thresh = int(probability * 4294967296.0)
        u = md5_prefix_u32([f"{seed}:{d + offset}" for d in idx.tolist()])
        return idx[u < thresh]

    def random_sampler_terms_agg(self, query: str, field: str,
                                 probability: float = 0.5, seed: int = 0,
                                 size: int = 10,
                                 where: dict | None = None,
                                 mode: str = "or",
                                 must_not: str | None = None,
                                 _offset: int = 0) -> tuple:
        """ES random_sampler-aggregation analog (ES 8.2): run the terms
        sub-aggregation over a probability-``probability`` pseudo-random
        subset of the hit set instead of every hit — the
        read-less-of-the-corpus agg for dashboard-speed estimates. ES
        samples with a splittable RNG keyed on (seed, doc); this engine
        pins the md5-prefix rule (see _random_sample_ids) so the sample
        is reproducible on any machine AND expressible in the SQL twin.
        Returns ``(n_sampled, [(value, count)])`` — the sampler bucket's
        doc_count plus the sub-agg buckets (count desc, value asc, top
        ``size``; null field values form no bucket). Per-shard work is
        one hash pass over the hit ids + one bincount over the sample;
        the driver merge (sharded twin) sums exact integers."""
        ids = self._random_sample_ids(
            query, probability, seed, where, mode, must_not, _offset
        )
        if ids.size == 0:
            return 0, []
        codes, vocab = self._field_codes(field)
        cc = codes[ids]
        cc = cc[cc >= 0]
        if cc.size == 0:
            return int(ids.size), []
        binc = np.bincount(cc, minlength=len(vocab))
        rows = [(vocab[i], int(n)) for i, n in enumerate(binc) if n > 0]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return int(ids.size), rows[:size]

    def date_range_agg(self, query: str, field: str,
                       ranges_iso: list, where: dict | None = None,
                       mode: str = "or",
                       must_not: str | None = None) -> list[tuple]:
        """ES date_range-aggregation analog over an epoch-seconds
        ``field``: boundaries are ISO dates (UTC midnight),
        from-inclusive / to-exclusive like range_agg; bucket keys are
        the ES "from-to" strings built from the ISO forms with '*' for
        an open end. Returns [(key, count)] in input order."""
        rows = self.range_agg(
            query, field, _iso_epoch_ranges(ranges_iso),
            where=where, mode=mode, must_not=must_not,
        )
        return [
            (f"{f or '*'}-{t or '*'}", c)
            for (f, t), (_, c) in zip(ranges_iso, rows)
        ]

    def adjacency_matrix_agg(self, query: str, filters: dict,
                             where: dict | None = None, mode: str = "or",
                             must_not: str | None = None) -> list[tuple]:
        """ES adjacency_matrix-aggregation analog: hit counts for every
        named filter AND every pairwise intersection (key "a&b", names
        sorted — the ES key rule), empty buckets omitted. One filter
        mask per name, one AND per pair. Returns [(key, count)] sorted
        by key."""
        hits = self._hit_mask(query, where, mode, must_not)
        names = sorted(filters)
        if hits is None:
            return []
        masks = {n: hits & self.filter_mask(**filters[n]) for n in names}
        out = []
        for i, a in enumerate(names):
            c = int(masks[a].sum())
            if c:
                out.append((a, c))
            for b in names[i + 1:]:
                c = int((masks[a] & masks[b]).sum())
                if c:
                    out.append((f"{a}&{b}", c))
        out.sort()
        return out

    # numpy datetime64 truncation units per ES calendar_interval
    _CALENDAR_UNITS = {
        "minute": "m", "hour": "h", "day": "D",
        "week": "W", "month": "M", "year": "Y",
    }

    def date_hist_metric_agg(self, query: str, field: str,
                             calendar_interval: str = "month",
                             metric: str = "n_chars",
                             where: dict | None = None, mode: str = "or",
                             must_not: str | None = None) -> list[tuple]:
        """Calendar date_histogram + SUM sub-agg on an integral docstore
        column: [(bucket_start_epoch_s, doc_count, metric_sum)]
        ascending — the multi-metric bucket stream bucket_script /
        bucket_selector consume. Bucket membership needs a valid date;
        a doc with a missing metric counts in doc_count but adds
        nothing to the sum (the ES sum-sub-agg rule). Sums accumulate
        via one float64 bincount — exact below 2^53 on integral
        columns (the repo-wide exact-integer contract)."""
        unit = self._CALENDAR_UNITS.get(calendar_interval)
        if unit is None:
            raise ValueError(
                f"unsupported calendar_interval: {calendar_interval!r}"
            )
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        tv, tvalid = self._numeric_col(field)
        sel = hits & tvalid
        if not sel.any():
            return []
        keys = calendar_floor(tv[sel].astype(np.int64), unit)
        mv, mvalid = self._numeric_col(metric)
        uniq, inv, cnt = np.unique(
            keys, return_inverse=True, return_counts=True
        )
        ok = mvalid[sel]
        sums = np.bincount(
            inv[ok], weights=mv[sel][ok].astype(np.float64),
            minlength=uniq.size,
        )
        return [
            (int(k), int(c), int(s))
            for k, c, s in zip(uniq, cnt, sums)
        ]

    def _date_hist_values(self, query: str, field: str,
                          calendar_interval: str, where, mode, must_not):
        unit = self._CALENDAR_UNITS.get(calendar_interval)
        if unit is None:
            raise ValueError(
                f"unsupported calendar_interval: {calendar_interval!r} "
                f"(one of {sorted(self._CALENDAR_UNITS)})"
            )
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return None, unit
        vals, valid = self._numeric_col(field)
        return vals[hits & valid], unit

    def date_histogram_agg(self, query: str, field: str,
                           calendar_interval: str = "day",
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None,
                           min_doc_count: int = 1,
                           time_zone_offset_s: int = 0) -> list[tuple]:
        """ES date_histogram with a CALENDAR interval (minute/hour/day/
        week/month/year) over ALL query hits. ``field`` holds UTC epoch
        SECONDS (ES date fields are epoch millis internally; fixed
        intervals are plain :meth:`histogram_agg` over the same column).
        Bucket key = epoch seconds of the truncated period start —
        months/years are true calendar buckets (variable length), weeks
        start Monday (ISO, the ES default) — via vectorized numpy
        datetime64 unit casts, no Python date objects. Non-empty buckets
        ascending, like ES; ``min_doc_count=0`` fills every calendar
        period between the first and last non-empty bucket with a zero
        row (the ES gap-filling knob — in-range fill; extended_bounds
        beyond the data is not modeled). ``time_zone_offset_s`` is the
        ES ``time_zone`` knob for FIXED-offset zones (e.g. "+02:00" =
        7200): periods truncate in local wall time, bucket keys stay
        UTC epoch seconds of the LOCAL period start — shift, floor,
        unshift (DST-rule zones are out of scope, documented)."""
        sel, unit = self._date_hist_values(
            query, field, calendar_interval, where, mode, must_not
        )
        if sel is None or sel.size == 0:
            return []
        off = int(time_zone_offset_s)
        keys = calendar_floor(
            sel.astype(np.int64) + off, unit
        ) - off
        uniq, cnt = np.unique(keys, return_counts=True)
        if min_doc_count == 0 and uniq.size:
            # fill on the LOCAL period axis (keys + off are true
            # period starts), then unshift back to UTC keys
            axis = calendar_range(
                int(uniq[0]) + off, int(uniq[-1]) + off, unit
            ) - off
            full = np.zeros(axis.size, dtype=np.int64)
            full[np.searchsorted(axis, uniq)] = cnt
            return [(int(u), int(c)) for u, c in zip(axis, full)]
        return [(int(u), int(c)) for u, c in zip(uniq, cnt)]

    def cumulative_cardinality_agg(self, query: str, field: str,
                                   key_field: str,
                                   calendar_interval: str = "month",
                                   where: dict | None = None,
                                   mode: str = "or",
                                   must_not: str | None = None
                                   ) -> list[tuple]:
        """ES cumulative_cardinality pipeline-aggregation analog (EXACT
        — ES stacks HLL sketches; this engine's cardinality family is
        exact, documented at cardinality_agg): under a calendar
        date_histogram on ``field``, the running count of DISTINCT
        keyword ``key_field`` values seen in the query hits up to and
        including each bucket. Returns [(bucket_start, n_docs,
        cum_distinct)] ascending.

        Vectorized: one (bucket, code) unique pass; the running union is
        a first-seen-bucket argmin per code, then a cumsum over buckets
        — O(hits) + O(buckets), no per-bucket set building."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        vals, valid = self._numeric_col(field)
        codes, _ = self._field_codes(key_field)
        sel = hits & valid & (codes >= 0)
        idx = np.flatnonzero(sel)
        if idx.size == 0:
            return []
        unit = self._CALENDAR_UNITS.get(calendar_interval)
        if unit is None:
            raise ValueError(
                f"unsupported calendar_interval: {calendar_interval!r}"
            )
        keys = calendar_floor(vals[idx].astype(np.int64), unit)
        uniq_b, cnt = np.unique(keys, return_counts=True)
        # first bucket each key value appears in
        order = np.lexsort((keys, codes[idx]))
        c_s, k_s = codes[idx][order], keys[order]
        first = np.concatenate([[True], c_s[1:] != c_s[:-1]])
        first_bucket = k_s[first]
        pos = np.searchsorted(uniq_b, first_bucket)
        news = np.bincount(pos, minlength=uniq_b.size)
        cum = np.cumsum(news)
        return [
            (int(b), int(c), int(cd))
            for b, c, cd in zip(uniq_b, cnt, cum)
        ]

    def percentiles_agg(self, query: str, field: str,
                        percents: tuple = (25.0, 50.0, 75.0, 95.0, 99.0),
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> dict:
        """ES percentiles-aggregation analog over ALL query hits — EXACT
        linear-interpolation percentiles (the SQL ``quantile_cont`` /
        ``percentile_cont`` definition: rank = q*(n-1), value =
        v[lo] + frac*(v[hi]-v[lo]) over the sorted hit values). ES ships
        t-digest approximations for its fixed per-shard payload budget;
        a single segment holds its hit values as one numpy array, so the
        exact answer is one sort. Returns {percent: value}, empty-hit
        percentiles -> None (the ES null shape)."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return {float(p): None for p in percents}
        vals, valid = self._numeric_col(field)
        sel = vals[hits & valid]
        if sel.size == 0:
            return {float(p): None for p in percents}
        return _percentiles_from_sorted(np.sort(sel), percents)

    def percentile_ranks_agg(self, query: str, field: str,
                             values: tuple, where: dict | None = None,
                             mode: str = "or",
                             must_not: str | None = None) -> dict:
        """ES percentile_ranks-aggregation analog (the inverse of
        percentiles), made EXACT: for each probe value x, the percent
        of hit values <= x — 100 * count(v <= x) / n (ES's t-digest
        CDF collapses to this exact fraction; the pinned float op
        order is one division then one multiply, shared with the SQL
        twin). Empty hit set -> None per value (the ES null shape).
        Per segment this is one searchsorted over the sorted hit
        values; sharded merges sum the (count, n) integer partials
        exactly."""
        base = {float(x): None for x in values}
        counts, n = self._pr_partials(query, field, values, where,
                                      mode, must_not)
        if n == 0:
            return base
        return {
            float(x): counts[i] / n * 100.0
            for i, x in enumerate(values)
        }

    def _pr_partials(self, query: str, field: str, values: tuple,
                     where=None, mode="or", must_not=None):
        """(count(v <= x) per probe value, n) — the integer sufficient
        statistics percentile_ranks merges exactly across segments."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return [0] * len(values), 0
        vals, valid = self._numeric_col(field)
        sel = np.sort(vals[hits & valid])
        if sel.size == 0:
            return [0] * len(values), 0
        counts = [
            int(np.searchsorted(sel, float(x), side="right"))
            for x in values
        ]
        return counts, int(sel.size)

    def search_by_field(self, query: str, field: str, order: str = "desc",
                        k: int = 10, where: dict | None = None,
                        mode: str = "or", must_not: str | None = None,
                        after: tuple | None = None):
        """ES sort-by-field analog: top-k query hits ordered by a
        docstore column instead of _score (relevance is not computed at
        all — the ES fast path when sort omits _score). Ties break
        doc_id ascending; docs missing the field sort LAST (the ES
        ``missing: _last`` default) in doc_id order. ``after`` is the
        ES search_after cursor on THIS sort: a (value, doc_id) pair —
        only hits strictly after it in (field order, missing last,
        doc asc) qualify; ``(None, d)`` means the cursor sits in the
        missing tail. Returns [(doc_id, value)] with value None for
        missing. Works on numeric and keyword (string) columns;
        restrictions compose like search."""
        if order not in ("asc", "desc"):
            raise ValueError("order must be 'asc' or 'desc'")
        if k <= 0:
            return []
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        typ = pads.dataset(self._docstore_dir).schema.field(field).type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            codes, values = self._field_codes(field)
            # lexicographic rank of each dictionary code (cached with the
            # codes themselves via _facet_cols; recomputing argsort on the
            # small dictionary is O(cardinality log cardinality))
            order_ix = np.argsort(np.asarray(values, dtype=object))
            rank = np.empty(len(values), dtype=np.int64)
            rank[order_ix] = np.arange(len(values))
            key = rank[np.clip(codes, 0, None)].astype(np.float64)
            valid = codes >= 0
            lookup = values
        else:
            key, valid = self._numeric_col(field)
            lookup = None
        miss_mask = hits & ~valid
        if after is not None:
            av, ad = after
            ids_ax = np.arange(hits.size)
            if av is None:
                # cursor in the missing tail: no valued hit qualifies
                hits = np.zeros_like(hits)
                miss_mask = miss_mask & (ids_ax > int(ad))
            else:
                if lookup is None:
                    av_key = float(av)
                else:
                    import bisect

                    svals = [values[i] for i in order_ix]
                    j = bisect.bisect_left(svals, av)
                    av_key = (float(j) if j < len(svals)
                              and svals[j] == av else float(j) - 0.5)
                if order == "desc":
                    cut = (key < av_key) | (
                        (key == av_key) & (ids_ax > int(ad))
                    )
                else:
                    cut = (key > av_key) | (
                        (key == av_key) & (ids_ax > int(ad))
                    )
                hits = hits & cut
                # every missing hit sorts after any valued cursor
        idx = np.flatnonzero(hits & valid)
        vals = key[idx]
        primary = -vals if order == "desc" else vals
        if idx.size > k:
            kth = np.partition(primary, k - 1)[k - 1]
            keep = primary <= kth  # boundary ties kept for doc_id break
            idx, primary = idx[keep], primary[keep]
        sel = np.lexsort((idx, primary))[:k]
        out_ids = idx[sel]
        if lookup is None:
            out = [(int(d), float(key[d])) for d in out_ids]
        else:
            out = [(int(d), lookup[int(codes[d])]) for d in out_ids]
        if len(out) < k:  # underfilled pool: missing-field hits, _last
            rest = np.flatnonzero(miss_mask)[: k - len(out)]
            out.extend((int(d), None) for d in rest)
        return out

    def _diversified_candidates(self, query: str, field: str,
                                max_per_key: int, k: int,
                                where=None, mode="or", must_not=None):
        """Per-key top-``max_per_key`` hits in (score desc, doc_id asc)
        order plus missing-key hits — the diversified_sampler candidate
        set (UNTRUNCATED keys, so a sharded merge is exact: any globally
        kept doc is in its segment's per-key top-m). Returns
        [(doc_id, score, value-or-None)] in rank order."""
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        buf = self._dense_scores(query)
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        scores = buf[idx]
        codes, values = self._field_codes(field)
        sel = _per_key_rank_keep(idx, scores, codes, max_per_key)
        return [
            (int(idx[i]), float(scores[i]),
             None if codes[idx[i]] < 0 else values[int(codes[idx[i]])])
            for i in sel
        ]

    def diversified_top_hits(self, query: str, field: str,
                             max_per_key: int = 1, k: int = 10,
                             where: dict | None = None, mode: str = "or",
                             must_not: str | None = None):
        """ES diversified_sampler (+ top_hits consumer) analog: the
        top-``k`` hits by BM25 with at most ``max_per_key`` docs per
        value of keyword ``field`` (ES max_docs_per_value; default 1).
        Spec (pinned for the SQL oracle): a hit survives iff its
        per-value rank in the full (score desc, doc_id asc) ordering is
        <= max_per_key — exactly row_number() PARTITION BY value;
        missing-field docs are never diversified away (the ES
        missing-key rule). One dense TAAT pass + one lexsort + a
        vectorized per-key cumcount — no per-bucket loop."""
        if max_per_key < 1:
            raise ValueError("max_per_key must be >= 1")
        if k <= 0:
            return []
        return [
            (d, s) for d, s, _ in self._diversified_candidates(
                query, field, max_per_key, k, where, mode, must_not
            )
        ][:k]

    def top_metrics(self, query: str, sort_field: str,
                    metric_fields: list[str], size: int = 1,
                    order: str = "desc", where: dict | None = None,
                    mode: str = "or", must_not: str | None = None):
        """ES top_metrics-aggregation analog: the top ``size`` hits by
        ``sort_field`` (search_by_field's order / doc-id-tiebreak rule,
        restricted to VALUED sort rows — ES skips docs missing the sort
        key), each carrying its numeric ``metric_fields`` values (None
        where a metric is null, the ES missing shape). Returns
        [(doc_id, sort_value, {metric: value})]."""
        rows = [
            (d, v) for d, v in self.search_by_field(
                query, sort_field, order, size, where, mode, must_not
            ) if v is not None
        ]
        cols = {m: self._numeric_col(m) for m in metric_fields}
        return [
            (d, v, {
                m: (float(vals[d]) if ok[d] else None)
                for m, (vals, ok) in cols.items()
            })
            for d, v in rows
        ]

    def rank_eval(self, query: str, relevant_where: dict,
                  k: int = 10) -> dict:
        """ES rank_eval-API analog for one request: the ranking is
        search(query, k) (the engine's deterministic BM25 order), the
        relevance judgment is the doc set matching ``relevant_where``
        (the filter_mask surface — explicit judgment lists become a
        where-spec; unlabeled docs count as irrelevant, the ES
        precision metric's ignore_unlabeled=false). Exact metric suite:

        - precision = rel_in_topk / k
        - recall    = rel_in_topk / total_relevant (None when none)
        - rr        = 1 / rank of the first relevant hit (0 when none;
          the ES mean_reciprocal_rank per-request value)
        - dcg       = sum over relevant hits of 1 / log2(rank + 1)
          (ES dcg metric, binary gains, ranks ascending — the pinned
          float op order)
        - ndcg      = dcg / idcg with idcg over min(n_rel, k) top
          ranks (the ES dcg normalize=true form; None when n_rel=0)
        - err       = expected reciprocal rank (Chapelle 2009, the ES
          expected_reciprocal_rank metric) with binary gains -> stop
          probability 1/2 per relevant hit

        Tombstoned docs never rank and never count as relevant."""
        if k <= 0:
            raise ValueError("k must be positive")
        hits = self.search(query, k=k)
        rel = self.filter_mask(**relevant_where)
        if self.excluded.size:
            rel = rel.copy()
            rel[self.excluded] = False
        return _rank_eval_metrics(hits, lambda d: bool(rel[d]),
                                  int(rel.sum()), k)

    def profile_search(self, query: str, k: int = 10,
                       algo: str = "taat"):
        """ES ``"profile": true`` analog: run the query UNCACHED with
        per-phase wall timings and deterministic collector counters.
        Returns ``(hits, profile)`` where hits == search(query, k,
        algo) (rank+score identical — same executors, cache bypassed)
        and profile carries:

        - per-clause rows {term, df, postings} (postings = LIVE
          posting length after tombstone masking — what the executor
          actually scans);
        - postings_scanned (their sum — the TAAT work metric) and
          blocks_scored (the block-max pruning metric: blocks the
          single-term/WAND paths could NOT skip);
        - breakdown_us: analyze / lookup / execute wall micros (host-
          dependent; tests pin only the counters).
        """
        from time import perf_counter

        if algo not in ("taat", "wand"):
            raise ValueError(f"unknown algo {algo!r}")
        t0 = perf_counter()
        qtf = self._qweights(query)
        terms = sorted(qtf)
        t1 = perf_counter()
        plist = [(t, qtf[t], self.lookup(t)) for t in terms]
        plist = [(t, q, p) for t, q, p in plist if p is not None]
        t2 = perf_counter()
        bs0 = self._blocks_scored
        if not plist:
            hits = []
        elif algo == "wand":
            hits = self._search_wand(plist, k)
        elif len(plist) == 1:
            hits = self._search_single_pruned(plist[0], k)
        else:
            hits = self._search_taat(plist, k)
        t3 = perf_counter()
        clause_rows = []
        scanned = 0
        for t, _, p in plist:
            live = int(p.doc_ids.size if p.live_mask is None
                       else p.live_mask.sum())
            scanned += live
            clause_rows.append(
                {"term": t, "df": int(p.df), "postings": live}
            )
        profile = {
            "algo": algo,
            "n_clauses": len(terms),
            "clauses": clause_rows,
            "postings_scanned": scanned,
            "blocks_scored": int(self._blocks_scored - bs0),
            "breakdown_us": {
                "analyze": int((t1 - t0) * 1e6),
                "lookup": int((t2 - t1) * 1e6),
                "execute": int((t3 - t2) * 1e6),
            },
        }
        return hits, profile

    def field_usage_stats(self) -> dict[str, int]:
        """ES ``_field_usage_stats`` API analog: per-field API-touch
        counts since this searcher opened. 'text' bumps once per
        analyzed query (terms/postings use); keyword fields once per
        dictionary-code access (aggs / facets / sorts via
        _field_codes); numeric fields once per doc-values access
        (_numeric_col, incl. runtime-field resolution); filter fields
        once per filter_mask call — cached masks still count, because
        ES counts field USES per request, not disk reads. Every bump
        is O(1) per call, never per row, so the counters are free in
        the hot path."""
        return dict(sorted(self._field_usage.items()))

    def search_geo_distance(self, lat_col: str, lon_col: str,
                            origin: tuple, k: int = 10,
                            radius_km: float | None = None,
                            query: str | None = None,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None):
        """ES geo-distance sort over index hits (ESNodeITest.java:138-194:
        GeoDistance filter at 138-172, GeoDistanceSortBuilder at 174-194)
        with the geometry swapped for two numeric docstore columns:
        hits — match_all when ``query`` is None, else the match query
        with the usual restrictions — ordered by haversine distance to
        ``origin`` ascending, doc_id tiebreak; ``radius_km`` composes the
        GeoDistance filter. Docs missing either coordinate sort LAST in
        doc_id order with distance None (ES treats missing geo points as
        Infinity), and never match a radius. Returns [(doc_id, dist_km)].
        Shares the cached ``_numeric_col`` reads with search_by_field."""
        if k <= 0:
            return []
        if query is not None:
            hits = self._hit_mask(query, where, mode, must_not)
            if hits is None:
                return []
        else:
            hits = np.ones(self.N, dtype=bool)
            if where:
                hits &= self.filter_mask(**where)
            if self.excluded.size:
                hits[self.excluded] = False
        from .geo import haversine_km

        lat, lat_ok = self._numeric_col(lat_col)
        lon, lon_ok = self._numeric_col(lon_col)
        valid = lat_ok & lon_ok
        idx = np.flatnonzero(hits & valid)
        out = []
        if idx.size:
            d = haversine_km(lat[idx], lon[idx], *origin)
            if radius_km is not None:
                keep = d <= radius_km
                idx, d = idx[keep], d[keep]
            if idx.size > k:
                kth = np.partition(d, k - 1)[k - 1]
                keep = d <= kth  # boundary ties kept for doc_id break
                idx, d = idx[keep], d[keep]
            sel = np.lexsort((idx, d))[:k]
            out = [(int(idx[i]), float(d[i])) for i in sel]
        if radius_km is None and len(out) < k:
            rest = np.flatnonzero(hits & ~valid)[: k - len(out)]
            out.extend((int(dd), None) for dd in rest)
        return out

    def filter_mask(self, **where) -> np.ndarray:
        """Dense doc_id -> bool mask for keyword-column equality filters
        and ES-style range filters (value = ``{"gte": lo, "lt": hi}``
        etc — see :func:`_where_expr`). Built once per distinct filter per
        searcher from a column-pruned docstore read; ref analog: ES
        filtered search, the GeoShape/GeoDistance-filter tests
        ESNodeITest.java:61-172 with the payload swapped for keyword /
        numeric columns."""
        key = _where_key(where)
        # every filter key counts per CALL (cached masks included —
        # ES counts uses, not reads); a runtime field's FIRST mask
        # build adds one extra doc-values touch via _numeric_col,
        # which is itself a real resolution
        for f in where:
            self._field_usage[f] = self._field_usage.get(f, 0) + 1
        cached = self._filter_masks.get(key)
        if cached is not None:
            return cached
        # runtime fields (incl. anonymous script filters) have no
        # docstore column — evaluate their bounds on the cached derived
        # vector and AND with the pushed-down remainder
        rt_keys = [
            f for f in where
            if f in getattr(self, "_runtime_fields", {})
        ]
        rt_mask = None
        if rt_keys:
            rt_mask = np.ones(self.N, dtype=bool)
            for f in rt_keys:
                vals, valid = self._numeric_col(f)
                m = valid.copy()
                for op, bound in dict(where[f]).items():
                    if op == "gte":
                        m &= vals >= float(bound)
                    elif op == "gt":
                        m &= vals > float(bound)
                    elif op == "lte":
                        m &= vals <= float(bound)
                    elif op == "lt":
                        m &= vals < float(bound)
                    else:
                        raise ValueError(f"runtime bound {op!r}")
                rt_mask &= m
            where = {f: v for f, v in where.items() if f not in rt_keys}
            if not where:
                self._filter_masks[key] = rt_mask
                return rt_mask
        ds = pads.dataset(self._docstore_dir)
        t = ds.to_table(filter=_where_expr(where), columns=["doc_id"])
        mask = np.zeros(self.N, dtype=bool)
        mask[t["doc_id"].to_numpy(zero_copy_only=False)] = True
        if rt_mask is not None:
            mask &= rt_mask
        self._filter_masks[key] = mask
        return mask

    # ------------------------------------------------------------------
    # positional postings / phrase match (Lucene .pos + PhraseQuery analog)
    # ------------------------------------------------------------------

    def _positions(self, p: Postings) -> tuple[np.ndarray, np.ndarray]:
        """Decode (once per term per searcher) the positional sidecar ->
        (pos, occ_off): posting j's within-doc positions are
        ``pos[occ_off[j]:occ_off[j+1]]``, strictly ascending."""
        if p.pos is None:
            if p.pos_bytes is None:
                raise ValueError(
                    "index has no positional postings — build with "
                    "cfg.index_positions=True to run phrase queries"
                )
            from .codec import segmented_delta_decode, varint_decode

            occ_off = np.zeros(p.tfs.size + 1, np.int64)
            np.cumsum(p.tfs.astype(np.int64), out=occ_off[1:])
            gaps = varint_decode(p.pos_bytes)
            p.pos = segmented_delta_decode(gaps, occ_off[:-1])
            p.occ_off = occ_off
        return p.pos, p.occ_off

    def _first_match(self, terms: list[str], docs: np.ndarray):
        """(first_pos, first_term) of the earliest occurrence of ANY of
        ``terms`` in each doc (positional sidecar, no text re-analysis):
        per term one searchsorted into its posting list + one gather of
        each doc's first position (positions are ascending within a
        doc). Docs matching no term get (-1, None)."""
        best = np.full(docs.size, np.iinfo(np.int64).max, np.int64)
        best_term: list = [None] * docs.size
        for t in sorted(set(terms)):
            p = self.lookup(t)
            if p is None:
                continue
            pos, occ = self._positions(p)
            j = np.searchsorted(p.doc_ids, docs)
            jc = np.minimum(j, p.doc_ids.size - 1)
            have = p.doc_ids[jc] == docs
            fp = pos[occ[jc]]
            upd = have & (fp < best)
            best[upd] = fp[upd]
            for i in np.flatnonzero(upd):
                best_term[i] = t
        best[best == np.iinfo(np.int64).max] = -1
        return best, best_term

    def highlight(self, query: str, k: int = 10, window: int = 3,
                  algo: str = "taat", **kw):
        """ES highlight analog over the top-k hits: the FIRST occurrence
        of any query term per hit, located from the positional sidecar
        (not by re-analyzing stored text — the term-vectors highlight
        strategy), plus a snippet of the analyzed tokens within ±window
        of the match. Returns [(doc_id, score, first_pos, first_term,
        snippet)] in ranking order. Requires cfg.index_positions=True."""
        hits = self.search(query, k=k, algo=algo, **kw)
        if not hits:
            return []
        docs = np.array([d for d, _ in hits], np.int64)
        terms = sorted(self._qweights(query))
        fp, ft = self._first_match(terms, docs)
        texts = self.get_by_doc_id([int(d) for d in docs])[
            "text"
        ].to_pylist()
        return [
            (d, sc, int(p), t, _snippet(txt, int(p), window))
            for (d, sc), p, t, txt in zip(hits, fp, ft, texts)
        ]

    def _all_matches(self, terms: list[str], docs: list[int]) -> dict:
        """doc -> sorted [(pos, term)] of EVERY query-term occurrence,
        from the positional sidecar (one searchsorted + occ-slice gather
        per term over the k docs — no text re-analysis)."""
        darr = np.array(docs, np.int64)
        matches: dict[int, list] = {int(d): [] for d in docs}
        for t in sorted(set(terms)):
            p = self.lookup(t)
            if p is None:
                continue
            pos, occ = self._positions(p)
            j = np.searchsorted(p.doc_ids, darr)
            jc = np.minimum(j, p.doc_ids.size - 1)
            have = p.doc_ids[jc] == darr
            for i in np.flatnonzero(have):
                s, e = int(occ[jc[i]]), int(occ[jc[i] + 1])
                matches[int(darr[i])].extend(
                    (int(pp), t) for pp in pos[s:e]
                )
        for d in matches:
            matches[d].sort()
        return matches

    def highlight_fragments(self, query: str, k: int = 10,
                            window: int = 3, n_fragments: int = 3,
                            algo: str = "taat", **kw) -> list[tuple]:
        """ES highlight with number_of_fragments: up to ``n_fragments``
        NON-OVERLAPPING snippets per hit (matches taken in position
        order; a match inside the previous fragment's ±window span is
        absorbed by it — the ES fragment-merging behavior). Returns
        [(doc_id, score, [(pos, term, snippet), ...])] in ranking
        order."""
        hits = self.search(query, k=k, algo=algo, **kw)
        if not hits:
            return []
        docs = [int(d) for d, _ in hits]
        matches = self._all_matches(sorted(self._qweights(query)), docs)
        texts = self.get_by_doc_id(docs)["text"].to_pylist()
        out = []
        for (d, sc), txt in zip(hits, texts):
            frags = []
            next_ok = -1
            for ppos, t in matches[int(d)]:
                if ppos < next_ok:
                    continue
                frags.append((ppos, t, _snippet(txt, ppos, window)))
                if len(frags) >= n_fragments:
                    break
                next_ok = ppos + 2 * window + 1
            out.append((d, sc, frags))
        return out

    def _phrase_freqs(self, slots: list[str]):
        """Exact-adjacency phrase frequencies, fully vectorized.

        Returns (docs, pf, dfs): docs containing the consecutive phrase
        (ascending), phrase occurrence count per doc, and the per-SLOT df
        list (for the idf-sum weight). Empty result when any slot's term
        is absent. Candidate docs = intersection of the slot terms'
        posting lists (smallest df first); adjacency is checked with one
        integer-key ``isin`` per slot over (doc, position) keys — no
        per-doc Python loop.
        """
        from .codec import run_ranges, run_spread

        empty = (np.empty(0, np.int64), np.empty(0, np.int64), [])
        # slots: plain term list (shift = slot index) or (term, shift)
        # pairs — the stop-filtered form, where removed stopwords leave
        # position GAPS between the surviving slots (Lucene increments).
        # Shifts are rebased so the first surviving slot anchors at 0
        # (only RELATIVE positions constrain a phrase).
        if slots and isinstance(slots[0], tuple):
            pairs = [(t, s - slots[0][1]) for t, s in slots]
        else:
            pairs = list(zip(slots, range(len(slots))))
        uniq = sorted({t for t, _ in pairs})
        post = {t: self.lookup(t) for t in uniq}
        if any(post[t] is None for t in uniq):
            return empty
        dfs = [post[t].df for t, _ in pairs]
        ordered = sorted(uniq, key=lambda t: post[t].df)
        cand = post[ordered[0]].doc_ids
        for t in ordered[1:]:
            cand = np.intersect1d(cand, post[t].doc_ids, assume_unique=True)
        if cand.size == 0:
            return empty
        # key space: doc*L + within-doc position; L exceeds any STORED
        # position by more than the max slot shift, so shifted keys never
        # collide across docs. dl under-bounds on a stopword index (dl
        # counts emitted tokens, stored positions keep the gaps), so L is
        # derived from the involved postings' own max position.
        maxpos = max(
            int(self._positions(post[t])[0].max(initial=0)) for t in uniq
        )
        L = maxpos + pairs[-1][1] + len(pairs) + 2

        def slot_keys(term: str, shift: int) -> np.ndarray:
            p = post[term]
            pos, occ = self._positions(p)
            j = np.searchsorted(p.doc_ids, cand)  # every cand present
            lens = occ[j + 1] - occ[j]
            out_starts = np.zeros(j.size, np.int64)
            np.cumsum(lens[:-1], out=out_starts[1:])
            tot = int(lens.sum())
            gi = run_ranges(occ[j], out_starts, tot)
            doc_key = run_spread((cand * L).astype(np.int64), out_starts, tot)
            return doc_key + pos[gi] - shift

        k0 = slot_keys(pairs[0][0], pairs[0][1])
        surv = np.ones(k0.size, dtype=bool)
        for term, shift in pairs[1:]:
            surv &= np.isin(k0, slot_keys(term, shift))
            if not surv.any():
                return empty
        starts = k0[surv]
        docs, pf = np.unique(starts // L, return_counts=True)
        return docs.astype(np.int64), pf.astype(np.int64), dfs

    def search_phrase(self, phrase: str, k: int = 10,
                      where: dict | None = None, offset: int = 0,
                      search_after: tuple | None = None):
        """Exact phrase (slop=0) top-k [(doc_id, score)] — the Lucene
        PhraseQuery analog (requires a positional index). Scoring spec
        (pinned in oracle.py): W = sum over phrase SLOTS of idf(df of the
        slot's term) — duplicate slots count multiply, like repeated terms
        in Lucene's PhraseQuery idf sum — and
        score = W * pf*(k1+1)/(pf + k1*(1-b+b*dl/avgdl)) with pf = number
        of exact phrase occurrences. Order: (score desc, doc_id asc).
        ``offset`` / ``search_after`` paginate exactly as in search()."""
        if k <= 0:
            return []
        if offset and search_after is not None:
            raise ValueError("offset and search_after are mutually exclusive")
        slots = tokenize_query(phrase)
        if self.stopwords:
            # stop slots drop but their positions stay as GAPS (Lucene
            # StopFilter + PhraseQuery enablePositionIncrements)
            slots = [
                (t, i) for i, t in enumerate(slots)
                if t not in self.stopwords
            ]
        if not slots:
            return []
        docs, pf, dfs = self._phrase_freqs(slots)
        if docs.size == 0:
            return []
        if self.excluded.size:
            keep = ~np.isin(docs, self.excluded)
            docs, pf = docs[keep], pf[keep]
        if where:
            m = self.filter_mask(**where)
            keep = m[docs]
            docs, pf = docs[keep], pf[keep]
        if docs.size == 0:
            return []
        W = 0.0
        for df in dfs:  # slot order == oracle accumulation order
            W += self.idf(df)
        pff = pf.astype(np.float64)
        dls = self.dl[docs].astype(np.float64)
        scores = W * (
            pff * (self.k1 + 1.0)
            / (pff + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
        )
        if search_after is not None:
            a = (float(search_after[1]), int(search_after[0]))
            keep = _after_keep(scores, docs, a)
            docs, scores = docs[keep], scores[keep]
        out = self._topk_from(docs, scores, k + int(offset))
        return out[offset:] if offset else out

    def search_phrase_prefix(self, phrase: str, k: int = 10,
                             max_expansions: int = 50,
                             where: dict | None = None) -> list[tuple]:
        """ES match_phrase_prefix analog (Lucene MultiPhraseQuery with a
        prefix-expanded final position): exact-adjacency phrase whose
        LAST slot matches any dictionary term with that prefix
        (``expand_prefix`` — lowest-terms-first, ``max_expansions``).

        Scoring spec (pinned in the SQL oracle): expansion members
        occupy DISJOINT positions (one token per position), so
        pf(doc) = sum over members of the exact-phrase freq with that
        member as the last slot; W = idf sum over the FIXED slots (slot
        order) + ONE blended idf for the expanded position with
        df_blend = max over members' df (the SynonymQuery blend this
        engine already uses for multi-term positions);
        score = W * pf*(k1+1)/(pf + k1*(1-b+b*dl/avgdl)).
        Order (score desc, doc_id asc). Stop slots keep position gaps,
        as in search_phrase."""
        if k <= 0:
            return []
        slots = tokenize_query(phrase)
        if not slots:
            return []
        prefix = slots[-1]
        exp = self.expand_prefix(prefix, max_expansions)
        if not exp:
            return []
        fixed = slots[:-1]
        pairs = list(zip(fixed, range(len(fixed))))
        if self.stopwords:
            pairs = [(t, i) for t, i in pairs if t not in self.stopwords]
        last_shift = len(slots) - 1
        d_parts, f_parts = [], []
        fixed_dfs = None
        df_blend = 0
        for member in exp:
            docs, pf, dfs = self._phrase_freqs(
                pairs + [(member, last_shift)]
            )
            p = self.lookup(member)
            df_blend = max(df_blend, p.df if p is not None else 0)
            if docs.size == 0:
                continue
            if fixed_dfs is None:
                fixed_dfs = dfs[:-1]
            d_parts.append(docs)
            f_parts.append(pf)
        if not d_parts:
            return []
        alld = np.concatenate(d_parts)
        docs, inv = np.unique(alld, return_inverse=True)
        pf = np.zeros(docs.size, dtype=np.int64)
        np.add.at(pf, inv, np.concatenate(f_parts))
        if self.excluded.size:
            keep = ~np.isin(docs, self.excluded)
            docs, pf = docs[keep], pf[keep]
        if where:
            m = self.filter_mask(**where)
            keep = m[docs]
            docs, pf = docs[keep], pf[keep]
        if docs.size == 0:
            return []
        W = 0.0
        for df in fixed_dfs:  # fixed-slot order, then the blended slot
            W += self.idf(df)
        W += self.idf(df_blend)
        pff = pf.astype(np.float64)
        dls = self.dl[docs].astype(np.float64)
        scores = W * (
            pff * (self.k1 + 1.0)
            / (pff + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
        )
        return self._topk_from(docs, scores, k)

    def _present_mask(self, terms: list[str]) -> np.ndarray:
        """Dense mask of docs containing ANY of the analyzed terms (live
        postings only)."""
        m = np.zeros(self.N, dtype=bool)
        for t in terms:
            p = self.lookup(t)
            if p is None:
                continue
            ids = p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            m[ids] = True
        return m

    def query_string(self, q: str, k: int = 10,
                     where: dict | None = None) -> list[tuple]:
        """ES query_string analog (Lucene BooleanQuery composition of
        the parsed clauses — see :func:`parse_query_string`):

        - every TERM clause (must + should) scores boost·idf·tf_part,
          accumulated terms-ascending with same-term boosts SUMMED
          (Lucene repeated-clause behavior);
        - every non-negated PHRASE clause scores the search_phrase spec
          (W = slot idf sum, saturated pf), added in input order;
        - ``+`` clauses are REQUIRED (a must clause analyzing entirely
          to stopwords drops, the stop-analyzer rule); ``-`` clauses
          exclude; with no must clauses at least one scoring clause must
          match (Lucene's pure-should minimum);
        - order (score desc, doc_id asc), ``where`` filters hits.
        Phrase clauses need a positional index."""
        if k <= 0:
            return []
        cl = parse_query_string(q)
        weights: dict[str, float] = {}
        for body, boost in cl["must"] + cl["should"]:
            for t in tokenize_query(body):
                if self.stopwords and t in self.stopwords:
                    continue
                weights[t] = weights.get(t, 0.0) + boost
        buf = np.zeros(self.N, dtype=np.float64)
        hit = np.zeros(self.N, dtype=bool)
        for term in sorted(weights):
            p = self.lookup(term)
            if p is None:
                continue
            w = weights[term] * self.idf(p.df)
            ids = p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            tfp = p.tf_part if p.live_mask is None else p.tf_part[p.live_mask]
            buf[ids] += w * tfp
            hit[ids] = True
        phrase_docs: list[tuple[str, np.ndarray]] = []
        for sign, raw, pboost in cl["phrases"]:
            slots = tokenize_query(raw)
            if self.stopwords:
                slots = [
                    (t, i) for i, t in enumerate(slots)
                    if t not in self.stopwords
                ]
            if not slots:
                continue
            docs, pf, dfs = self._phrase_freqs(slots)
            phrase_docs.append((sign, docs))
            if sign == "-" or docs.size == 0:
                continue
            W = 0.0
            for df in dfs:
                W += self.idf(df)
            W = pboost * W  # phrase clause boost ("a b"^2); 1.0 is exact
            pff = pf.astype(np.float64)
            dls = self.dl[docs].astype(np.float64)
            buf[docs] += W * (
                pff * (self.k1 + 1.0)
                / (pff + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
            )
            hit[docs] = True
        # every doc satisfying the musts matched a scoring clause, so the
        # pure-should >=1 minimum and the must case both start from `hit`
        ok = hit
        for body, _ in cl["must"]:
            for t in tokenize_query(body):
                if self.stopwords and t in self.stopwords:
                    continue  # stop must-clause drops (stop-analyzer rule)
                ok = ok & self._present_mask([t])
        for body in cl["must_not"]:
            ok = ok & ~self._present_mask(tokenize_query(body))
        for sign, docs in phrase_docs:
            m = np.zeros(self.N, dtype=bool)
            m[docs] = True
            if sign == "+":
                ok = ok & m
            elif sign == "-":
                ok = ok & ~m
        if self.excluded.size:
            ok = ok.copy()
            ok[self.excluded] = False
        if where:
            ok = ok & self.filter_mask(**where)
        idx = np.flatnonzero(ok)
        if idx.size == 0:
            return []
        return self._topk_from(idx, buf[idx], k)

    def simple_query_string(self, q: str, k: int = 10,
                            where: dict | None = None) -> list[tuple]:
        """ES simple_query_string analog (see
        :func:`parse_simple_query_string` for the grammar/flags):
        evaluates the OR of AND-groups; a doc matches when at least one
        group matches (every positive atom present, every negated atom
        absent; pure-negative groups match nothing — the Lucene rule).

        Scoring (the BooleanQuery SHOULD-sum spec, mirrored by the SQL
        oracle): each MATCHED group contributes the sum of its positive
        atoms' scores — term atoms score BM25 (idf·tf_part), phrase
        atoms the phrase spec (W = slot-df idf sum, saturated pf),
        prefix atoms constant 1.0 (the CONSTANT_SCORE multi-term
        rewrite). Per-doc accumulation order: all term contributions
        (term asc, group order), then phrases (input order), then
        prefixes — three separate buffers summed bm25 + phrase +
        prefix, which the oracle reproduces with coalesce sums.
        Returns [(doc_id, score)] (score desc, doc_id asc), top k."""
        if k <= 0:
            return []
        groups = parse_simple_query_string(q)
        bm25 = np.zeros(self.N, dtype=np.float64)
        phr = np.zeros(self.N, dtype=np.float64)
        pref = np.zeros(self.N, dtype=np.float64)
        matched = np.zeros(self.N, dtype=bool)
        term_adds: list[tuple[str, int, np.ndarray]] = []
        for gi, group in enumerate(groups):
            m = np.ones(self.N, dtype=bool)
            pos_terms: list[str] = []
            pos_phrases: list[tuple] = []
            pos_prefixes: list[str] = []
            n_pos = 0
            for neg, kind, payload in group:
                if kind == "term":
                    toks = [
                        t for t in tokenize_query(payload)
                        if not (self.stopwords and t in self.stopwords)
                    ]
                    if not toks:
                        continue  # stop/empty atom drops (lenient)
                    leaf = self._present_mask(toks)
                    if not neg:
                        pos_terms.extend(toks)
                elif kind == "phrase":
                    slots = tokenize_query(payload)
                    if self.stopwords:
                        slots = [
                            (t, i) for i, t in enumerate(slots)
                            if t not in self.stopwords
                        ]
                    if not slots:
                        continue
                    docs, pf, dfs = self._phrase_freqs(slots)
                    leaf = np.zeros(self.N, dtype=bool)
                    leaf[docs] = True
                    if not neg:
                        pos_phrases.append((docs, pf, dfs))
                else:  # prefix
                    terms = self.expand_prefix(payload)
                    leaf = (self._present_mask(terms) if terms
                            else np.zeros(self.N, dtype=bool))
                    if not neg:
                        pos_prefixes.append(payload)
                if neg:
                    m &= ~leaf
                else:
                    m &= leaf
                    n_pos += 1
            if n_pos == 0:
                continue  # pure-negative / empty group matches nothing
            matched |= m
            for t in pos_terms:
                term_adds.append((t, gi, m))
            for docs, pf, dfs in pos_phrases:
                keep = m[docs]
                docs, pff = docs[keep], pf[keep].astype(np.float64)
                if docs.size == 0:
                    continue
                W = 0.0
                for df in dfs:
                    W += self.idf(df)
                dls = self.dl[docs].astype(np.float64)
                phr[docs] += W * (
                    pff * (self.k1 + 1.0)
                    / (pff + self.k1
                       * (1.0 - self.b + self.b * dls / self.avgdl))
                )
            for _ in pos_prefixes:
                pref[m] += 1.0
        for t, _, m in sorted(term_adds, key=lambda x: (x[0], x[1])):
            p = self.lookup(t)
            if p is None:
                continue
            w = self.idf(p.df)
            ids = p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            tfp = p.tf_part if p.live_mask is None else p.tf_part[p.live_mask]
            sel = m[ids]
            bm25[ids[sel]] += w * tfp[sel]
        ok = matched
        if self.excluded.size:
            ok = ok.copy()
            ok[self.excluded] = False
        if where:
            ok = ok & self.filter_mask(**where)
        idx = np.flatnonzero(ok)
        if idx.size == 0:
            return []
        total = bm25[idx] + phr[idx] + pref[idx]
        return self._topk_from(idx, total, k)

    def span_near_docs(self, terms: list[str], slop: int = 0,
                       limit: int = 20) -> list[tuple[int, int]]:
        """ES span_near-query analog (in_order=true, constant score):
        docs where the terms appear in slot order within total slack
        ``slop`` — a match is a strictly-increasing position chain
        p1 < p2 < ... < pn with pn - p1 - (n-1) <= slop (Lucene's
        end-minus-start matchLength rule); ``n_matches`` counts ALL such
        chains, the relational spec the SQL oracle replicates with
        inequality joins. slop=0 is exact-adjacency chains.

        Vectorized: candidate docs = posting intersection
        (smallest-df first); chain states then expand slot by slot with
        two searchsorted bounds per state and segmented gathers
        (run_ranges/run_spread) — work O(total chains), never a per-doc
        Python loop. Returns [(doc_id, n_matches)] ascending, first
        ``limit``."""
        chains = self._span_chains(terms, slop)
        if chains is None:
            return []
        start, _, L = chains
        docs, m = np.unique(start // L, return_counts=True)
        return [
            (int(d), int(c)) for d, c in zip(docs[:limit], m[:limit])
        ]

    def _span_slot_keys(self, terms: list[str], slop: int,
                        min_L: int = 0):
        """Per-slot position keys in the doc*L + pos key space over the
        CANDIDATE docs (posting intersection, tombstones dropped) —
        (keys list aligned to ``terms``, L), or None when any term is
        absent / no doc holds all terms. Shared by the ordered chain
        expansion and the unordered window counter."""
        from .codec import run_ranges, run_spread

        if slop < 0:
            raise ValueError("slop must be >= 0")
        if not terms:
            return None
        n = len(terms)
        uniq = sorted(set(terms))
        post = {t: self.lookup(t) for t in uniq}
        if any(post[t] is None for t in uniq):
            return None
        ordered = sorted(uniq, key=lambda t: post[t].df)
        cand = post[ordered[0]].doc_ids
        for t in ordered[1:]:
            cand = np.intersect1d(cand, post[t].doc_ids,
                                  assume_unique=True)
        if self.excluded.size:
            cand = cand[~np.isin(cand, self.excluded)]
        if cand.size == 0:
            return None
        # key space margin covers pos + (n-1) + slop staying in-doc; like
        # _phrase_freqs, L derives from the postings' own max STORED
        # position (dl under-bounds it on a stopword index — positions
        # keep the gaps stop-filtered tokens leave behind)
        maxpos = max(
            int(self._positions(post[t])[0].max(initial=0)) for t in uniq
        )
        L = max(maxpos + n + slop + 2, min_L)

        def slot_keys(term: str) -> np.ndarray:
            p = post[term]
            pos, occ = self._positions(p)
            j = np.searchsorted(p.doc_ids, cand)
            lens = occ[j + 1] - occ[j]
            out_starts = np.zeros(j.size, np.int64)
            np.cumsum(lens[:-1], out=out_starts[1:])
            tot = int(lens.sum())
            gi = run_ranges(occ[j], out_starts, tot)
            doc_key = run_spread(
                (cand * L).astype(np.int64), out_starts, tot
            )
            return doc_key + pos[gi]

        return [slot_keys(t) for t in terms], L

    def span_near_unordered_docs(self, terms: list[str], slop: int = 0,
                                 limit: int = 20) -> list[tuple[int, int]]:
        """ES span_near with in_order=false (constant score): docs where
        all DISTINCT ``terms`` appear in ANY order inside a window —
        a match is a position tuple (one per term) with
        max(p) - min(p) <= slop + k - 1 (Lucene's matchLength-minus-
        totalLength slop rule for unit-length clauses); ``n_matches``
        counts ALL such tuples, the relational spec the SQL oracle
        replicates with a greatest/least join.

        Vectorized tuple counting without enumerating tuples: for every
        candidate window anchor v (any position of any term),
        #tuples whose MIN position is exactly v and max <= v + S equals
        prod_i c_i[v, v+S] - prod_i c_i(v, v+S] — two searchsorted
        bounds per slot per anchor, summed per doc. O(total positions ·
        k log) — never a per-doc Python loop."""
        if len(set(terms)) != len(terms):
            raise ValueError("unordered span terms must be distinct")
        got = self._span_slot_keys(terms, slop, 0)
        if got is None:
            return []
        keys, L = got
        S = slop + len(terms) - 1
        anchors = np.unique(np.concatenate(keys))
        inc = np.ones(anchors.size, dtype=np.int64)   # min >= v
        exc = np.ones(anchors.size, dtype=np.int64)   # min >  v
        for ki in keys:
            lo = np.searchsorted(ki, anchors, side="left")
            lo_x = np.searchsorted(ki, anchors, side="right")
            hi = np.searchsorted(ki, anchors + S, side="right")
            inc *= hi - lo
            exc *= hi - lo_x
        per_anchor = inc - exc
        keep = per_anchor > 0
        # per-doc sums of per-anchor tuple counts
        d = anchors[keep] // L
        uniq_d, inv = np.unique(d, return_inverse=True)
        sums = np.bincount(inv, weights=per_anchor[keep]).astype(np.int64)
        return [
            (int(dd), int(c))
            for dd, c in zip(uniq_d[:limit], sums[:limit])
        ]

    def _span_chains(self, terms: list[str], slop: int,
                     min_L: int = 0):
        """All in-order span_near chains: (start_keys, end_keys, L) in
        the doc*L + pos key space (both arrays chain-aligned; start keys
        non-decreasing), or None when nothing matches. ``min_L`` lets a
        caller force a larger key stride so FOREIGN position sets (the
        little clause of span_within/containing) share the key space
        without cross-doc collisions. The vectorized chain expansion from
        span_near_docs, factored so the enclosing span queries reuse
        it."""
        from .codec import run_ranges, run_spread

        got = self._span_slot_keys(terms, slop, min_L)
        if got is None:
            return None
        keys, L = got
        res = _expand_span_chains(keys, slop)
        if res is None:
            return None
        return res[0], res[1], L

    def _little_keys(self, little: str, L: int):
        """Live occurrence keys (doc*L + pos, ascending) of a span_term
        clause — the little side of span_within/containing."""
        p = self.lookup(little)
        if p is None:
            return None
        pos, occ = self._positions(p)
        lens = (occ[1:] - occ[:-1]).astype(np.int64)
        docs = np.repeat(p.doc_ids, lens)
        keys = docs * L + pos
        if self.excluded.size:
            keys = keys[~np.isin(docs, self.excluded)]
        return keys

    def span_containing_docs(self, big_terms: list[str], slop: int,
                             little: str,
                             limit: int = 20) -> list[tuple[int, int]]:
        """ES span_containing-query analog: matches of the BIG clause
        (span_near over ``big_terms``, in_order, ``slop``) that ENCLOSE
        at least one occurrence of the LITTLE span_term — Lucene's
        SpanContainingQuery (big kept when little lies within
        [start, end]). n_matches counts surviving big chains per doc.
        Vectorized: two searchsorted bounds of the little key set per
        chain — O(chains + occurrences). Returns [(doc_id, n_matches)]
        ascending, first ``limit``."""
        pl = self.lookup(little)
        if pl is None:
            return []
        min_L = int(self._positions(pl)[0].max(initial=0)) + 2
        chains = self._span_chains(big_terms, slop, min_L=min_L)
        if chains is None:
            return []
        start, end, L = chains
        kl = self._little_keys(little, L)
        if kl is None or kl.size == 0:
            return []
        lo = np.searchsorted(kl, start, side="left")
        hi = np.searchsorted(kl, end, side="right")
        keep = hi > lo
        if not keep.any():
            return []
        docs, m = np.unique(start[keep] // L, return_counts=True)
        return [(int(d), int(c)) for d, c in zip(docs[:limit], m[:limit])]

    def span_within_docs(self, little: str, big_terms: list[str],
                         slop: int,
                         limit: int = 20) -> list[tuple[int, int]]:
        """ES span_within-query analog — the dual: occurrences of the
        LITTLE span_term that lie WITHIN a match of the BIG span_near
        clause (Lucene SpanWithinQuery). n_matches counts enclosed
        little occurrences per doc. Vectorized: chains sorted by start
        carry a running max of ends; one searchsorted per occurrence
        (prefix-max ends of earlier docs cannot reach a later doc's key
        range, so the scan never leaks across docs)."""
        pl = self.lookup(little)
        if pl is None:
            return []
        min_L = int(self._positions(pl)[0].max(initial=0)) + 2
        chains = self._span_chains(big_terms, slop, min_L=min_L)
        if chains is None:
            return []
        start, end, L = chains
        kl = self._little_keys(little, L)
        if kl is None or kl.size == 0:
            return []
        order = np.argsort(start, kind="stable")
        starts_s = start[order]
        prefmax = np.maximum.accumulate(end[order])
        idx = np.searchsorted(starts_s, kl, side="right") - 1
        covered = (idx >= 0)
        covered[covered] = prefmax[idx[covered]] >= kl[covered]
        if not covered.any():
            return []
        docs, m = np.unique(kl[covered] // L, return_counts=True)
        return [(int(d), int(c)) for d, c in zip(docs[:limit], m[:limit])]

    def span_first_docs(self, term: str, end: int,
                        limit: int = 20) -> list[tuple[int, int]]:
        """ES span_first-query analog (span_term inside): docs where
        ``term`` occurs at a 0-based token position < ``end`` (Lucene's
        span end = pos+1 must be <= end), with n_matches = number of
        qualifying occurrences. Vectorized: one boolean cut over the
        term's flat positional sidecar + a bincount per posting slot —
        O(occurrences of term), no per-doc loop. Tombstoned docs
        filtered. Returns [(doc_id, n_matches)] doc_id asc, first
        ``limit``."""
        if end <= 0:
            raise ValueError("end must be positive")
        p = self.lookup(term)
        if p is None:
            return []
        pos, occ = self._positions(p)
        lens = (occ[1:] - occ[:-1]).astype(np.int64)
        slot_of = np.repeat(np.arange(p.doc_ids.size, dtype=np.int64), lens)
        cnt = np.bincount(
            slot_of[pos < end], minlength=p.doc_ids.size
        ).astype(np.int64)
        keep = cnt > 0
        docs = p.doc_ids[keep]
        cnt = cnt[keep]
        if self.excluded.size:
            live = ~np.isin(docs, self.excluded)
            docs, cnt = docs[live], cnt[live]
        return [(int(d), int(c)) for d, c in zip(docs[:limit], cnt[:limit])]

    def span_or_docs(self, terms: list[str],
                     limit: int = 20) -> list[tuple[int, int]]:
        """ES span_or-query analog over span_term clauses: the span set
        is the UNION of each clause term's occurrences, so a doc matches
        when any clause term occurs and n_matches = total occurrences
        across the clause set (clauses are a set — duplicate terms count
        once; single-term spans can't coincide across distinct terms, so
        the union has no overlap collapsing to do). Purely tf-driven —
        no positional decode needed. Vectorized: one concat + np.unique
        inverse + bincount over (doc_ids, tfs) of the present terms.
        Tombstoned docs filtered. Returns [(doc_id, n_matches)] doc_id
        asc, first ``limit``."""
        uniq = sorted(set(terms))
        plist = [p for t in uniq if (p := self.lookup(t)) is not None]
        if not plist:
            return []
        ids = np.concatenate([p.doc_ids for p in plist])
        tfs = np.concatenate([p.tfs.astype(np.int64) for p in plist])
        docs, inv = np.unique(ids, return_inverse=True)
        cnt = np.bincount(inv, weights=tfs).astype(np.int64)
        if self.excluded.size:
            live = ~np.isin(docs, self.excluded)
            docs, cnt = docs[live], cnt[live]
        return [(int(d), int(c)) for d, c in zip(docs[:limit], cnt[:limit])]

    def span_not_docs(self, include: str, exclude: str, pre: int = 0,
                      post: int = 0, limit: int = 20) -> list[tuple[int, int]]:
        """ES span_not-query analog (span_term include / span_term
        exclude): occurrences of ``include`` survive unless an
        occurrence of ``exclude`` sits within ``pre`` tokens before or
        ``post`` tokens after (Lucene SpanNotQuery's pre/post slack;
        pre=post=0 is pure same-position overlap, which for distinct
        single terms never fires). n_matches = surviving occurrences.

        Vectorized: both position sets flatten to doc*L + pos keys
        (L sized past maxpos + slack so windows can't cross docs); a
        surviving include key has an EMPTY exclude range
        [key - pre, key + post], tested with two searchsorted bounds.
        O(occurrences), no per-doc loop. Returns [(doc_id, n_matches)]
        doc_id asc, first ``limit``."""
        if pre < 0 or post < 0:
            raise ValueError("pre/post must be >= 0")
        p_inc = self.lookup(include)
        if p_inc is None:
            return []
        pos_i, occ_i = self._positions(p_inc)
        lens_i = (occ_i[1:] - occ_i[:-1]).astype(np.int64)
        slot_of = np.repeat(
            np.arange(p_inc.doc_ids.size, dtype=np.int64), lens_i
        )
        p_exc = self.lookup(exclude) if exclude != include else None
        if p_exc is None and exclude != include:
            keep = np.ones(pos_i.size, dtype=bool)
        elif exclude == include:
            keep = np.zeros(pos_i.size, dtype=bool)  # every span self-kills
        else:
            pos_e, _ = self._positions(p_exc)
            maxpos = max(int(pos_i.max(initial=0)),
                         int(pos_e.max(initial=0)))
            L = maxpos + max(pre, post) + 2
            keys_i = p_inc.doc_ids[slot_of] * L + pos_i
            lens_e = (p_exc.occ_off[1:] - p_exc.occ_off[:-1]).astype(np.int64)
            keys_e = np.repeat(p_exc.doc_ids, lens_e) * L + pos_e
            lo = np.searchsorted(keys_e, keys_i - pre, side="left")
            hi = np.searchsorted(keys_e, keys_i + post, side="right")
            keep = lo == hi
        cnt = np.bincount(
            slot_of[keep], minlength=p_inc.doc_ids.size
        ).astype(np.int64)
        mask = cnt > 0
        docs, cnt = p_inc.doc_ids[mask], cnt[mask]
        if self.excluded.size:
            live = ~np.isin(docs, self.excluded)
            docs, cnt = docs[live], cnt[live]
        return [(int(d), int(c)) for d, c in zip(docs[:limit], cnt[:limit])]

    def intervals_ordered_docs(self, slots: list, max_gaps: int = 0,
                               limit: int = 20) -> list[tuple[int, int]]:
        """ES intervals-query analog: ``all_of(ordered=true,
        max_gaps=max_gaps)`` over a list of slots, each slot either a
        single ``match`` term or an ``any_of`` group of alternative
        terms (pass a str, or a list/tuple of strs). A match is a
        strictly-increasing position chain p1 < p2 < ... < pn where
        p_i matches ANY alternative of slot i and
        pn - p1 - (n-1) <= max_gaps (Lucene's interval width rule
        ``end - start + 1 - k <= max_gaps``); ``n_matches`` counts ALL
        such chains — the relational spec the SQL oracle replicates
        with ``term IN (...)`` inequality joins. Generalizes
        span_near_docs (every slot a singleton reduces to it exactly).

        Vectorized like _span_chains: per-slot keys are the sorted
        union of the alternatives' doc*L + pos keys over the candidate
        docs (docs holding >= 1 alternative of EVERY slot); the chain
        expansion is the same two-searchsorted-per-state segmented
        gather. O(total chains), no per-doc Python loop."""
        from .codec import run_ranges, run_spread

        if max_gaps < 0:
            raise ValueError("max_gaps must be >= 0")
        if not slots:
            return []
        alts = [
            tuple(s) if isinstance(s, (list, tuple)) else (s,)
            for s in slots
        ]
        uniq = sorted({t for a in alts for t in a})
        post = {t: self.lookup(t) for t in uniq}
        slot_docs = []
        for a in alts:
            present = [post[t] for t in a if post[t] is not None]
            if not present:
                return []  # a slot with no present alternative
            docs = (present[0].doc_ids if len(present) == 1
                    else np.unique(np.concatenate(
                        [p.doc_ids for p in present])))
            slot_docs.append(docs)
        cand = slot_docs[0]
        for d in sorted(slot_docs[1:], key=lambda x: x.size):
            cand = np.intersect1d(cand, d, assume_unique=True)
        if self.excluded.size:
            cand = cand[~np.isin(cand, self.excluded)]
        if cand.size == 0:
            return []
        n = len(alts)
        used = [t for a in alts for t in a if post[t] is not None]
        maxpos = max(
            int(self._positions(post[t])[0].max(initial=0)) for t in used
        )
        L = maxpos + n + max_gaps + 2

        def term_keys(term: str) -> np.ndarray | None:
            p = post[term]
            if p is None:
                return None
            pos, occ = self._positions(p)
            # candidate docs this term actually holds (an any_of slot's
            # alternatives each cover only part of the candidate set)
            j = np.searchsorted(p.doc_ids, cand)
            hit = j < p.doc_ids.size
            jj, cd = j[hit], cand[hit]
            m = p.doc_ids[jj] == cd
            jj, cd = jj[m], cd[m]
            if jj.size == 0:
                return None
            lens = (occ[jj + 1] - occ[jj]).astype(np.int64)
            out_starts = np.zeros(jj.size, np.int64)
            np.cumsum(lens[:-1], out=out_starts[1:])
            tot = int(lens.sum())
            gi = run_ranges(occ[jj], out_starts, tot)
            doc_key = run_spread((cd * L).astype(np.int64), out_starts, tot)
            return doc_key + pos[gi]

        keys = []
        for a in alts:
            parts = [k for k in (term_keys(t) for t in a) if k is not None]
            if not parts:
                return []
            k = parts[0] if len(parts) == 1 else np.sort(
                np.concatenate(parts))
            keys.append(k)
        start = keys[0]
        cur = start
        bound_off = n - 1 + max_gaps
        for i in range(1, n):
            ki = keys[i]
            lo = np.searchsorted(ki, cur, side="right")
            hi = np.searchsorted(ki, start + bound_off, side="right")
            cnt = hi - lo
            keep = cnt > 0
            lo, start, cnt = lo[keep], start[keep], cnt[keep]
            if start.size == 0:
                return []
            out_starts = np.zeros(start.size, np.int64)
            np.cumsum(cnt[:-1], out=out_starts[1:])
            tot = int(cnt.sum())
            gi = run_ranges(lo, out_starts, tot)
            cur = ki[gi]
            start = run_spread(start, out_starts, tot)
        docs, m = np.unique(start // L, return_counts=True)
        return [(int(d), int(c)) for d, c in zip(docs[:limit], m[:limit])]

    def synonym_search(self, query: str, synonyms: dict, k: int = 10,
                       where: dict | None = None,
                       must_not: str | None = None):
        """Query-time synonym expansion with Lucene SynonymQuery
        semantics (what ES's synonym filter produces for a match query):
        each query clause becomes the group {term} ∪ synonyms[term],
        scored as ONE pseudo-term — df = MAX over the group (the
        SynonymQuery blended df), tf = SUM of the group's tfs in the doc,
        one idf·saturation contribution per group. Groups accumulate in
        ascending head-term order (the deterministic op sequence).
        Restrictions compose as usual; stop terms drop per the index
        analyzer."""
        if k <= 0:
            return []
        qtf = self._qweights(query)
        if not qtf:
            return []
        buf = np.zeros(self.N, dtype=np.float64)
        hit = np.zeros(self.N, dtype=bool)
        tf_sum = np.zeros(self.N, dtype=np.float64)
        for term in sorted(qtf):
            group = [term] + sorted(
                t for t in synonyms.get(term, ())
                if t not in self.stopwords
            )
            plist = [p for t in group if (p := self.lookup(t)) is not None]
            if not plist:
                continue
            df_b = max(p.df for p in plist)
            touched = []
            for p in plist:
                ids = (
                    p.doc_ids if p.live_mask is None
                    else p.doc_ids[p.live_mask]
                )
                tfs = (
                    p.tfs if p.live_mask is None else p.tfs[p.live_mask]
                )
                tf_sum[ids] += tfs
                touched.append(ids)
            idx = np.unique(np.concatenate(touched))
            w = qtf[term] * self.idf(df_b)
            tf = tf_sum[idx]
            dls = self.dl[idx].astype(np.float64)
            buf[idx] += w * (
                tf * (self.k1 + 1.0)
                / (tf + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
            )
            hit[idx] = True
            tf_sum[idx] = 0.0  # reset only touched slots
        idx = np.flatnonzero(hit)
        if self.excluded.size:
            idx = idx[~np.isin(idx, self.excluded)]
        if where:
            m = self.filter_mask(**where)
            idx = idx[m[idx]]
        if must_not:
            bm = self._bool_mask(None, must_not)
            if bm is not None:
                idx = idx[bm[idx]]
        return self._topk_from(idx, buf[idx], k)

    def rescore(self, query: str, rescore_phrase: str,
                window_size: int = 50, k: int = 10,
                query_weight: float = 1.0, rescore_weight: float = 1.0,
                algo: str = "taat", **kw):
        """ES rescore API (score_mode=total, the default): re-rank only
        the top ``window_size`` hits of the cheap ``query`` by
        combined = query_weight*bm25 + rescore_weight*phrase_score —
        phrase matching (the expensive positional work) runs against the
        WINDOW, never the full hit set, which is the whole point of the
        ES rescorer. Docs without the phrase keep their weighted base
        score. Returns top-k of the window, (combined desc, doc_id asc)."""
        base = self.search(query, k=window_size, algo=algo, **kw)
        if not base:
            return []
        slots = tokenize_query(rescore_phrase)
        if self.stopwords:
            slots = [
                (t, i) for i, t in enumerate(slots)
                if t not in self.stopwords
            ]
        pscore: dict[int, float] = {}
        if slots:
            docs, pf, dfs = self._phrase_freqs(slots)
            if docs.size:
                W = 0.0
                for df in dfs:
                    W += self.idf(df)
                pff = pf.astype(np.float64)
                dls = self.dl[docs].astype(np.float64)
                sc = W * (
                    pff * (self.k1 + 1.0)
                    / (pff + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
                )
                pscore = dict(zip(docs.tolist(), sc.tolist()))
        combined = [
            (d, query_weight * s + rescore_weight * pscore.get(d, 0.0))
            for d, s in base
        ]
        combined.sort(key=lambda h: (-h[1], h[0]))
        return combined[:k]

    def _iter_term_arrays(self):
        """Yield each bucket's term column as an Arrow array WITHOUT
        touching posting bytes (column-pruned parquet read). Buckets are
        independent — a multi-node deployment scans them in parallel
        tasks; the driver loop here is the single-node composition."""
        import os

        for b in range(self.num_buckets):
            path = os.path.join(self._postings_dir, f"bucket-{b:04d}.parquet")
            if not os.path.exists(path):
                continue
            yield pq.read_table(path, columns=["term"])["term"].combine_chunks()

    def expand_prefix(self, prefix: str, max_expansions: int = 4096) -> list[str]:
        """Term-dictionary prefix scan (ES PrefixQuery term expansion):
        vectorized ``pc.starts_with`` over each bucket's term column.
        Returns the matching terms sorted, truncated to the FIRST
        ``max_expansions`` (the ES max_expansions guard — deterministic
        lowest-terms-first)."""
        out: list[str] = []
        for terms in self._iter_term_arrays():
            m = pc.starts_with(terms, pattern=prefix)
            out.extend(terms.filter(m).to_pylist())
        out.sort()
        return out[:max_expansions]

    def span_multi_near_docs(self, slots: list, slop: int = 0,
                             limit: int = 20,
                             max_expansions: int = 4096) -> list:
        """ES span_multi analog — Lucene's SpanMultiTermQueryWrapper:
        multi-term queries (prefix / wildcard) used as span_near
        clauses. Each slot is a literal term (str), ``('prefix', p)``
        or ``('wildcard', pat)``; multi-term slots rewrite to the
        SpanOr of their term-dictionary expansions (deterministic
        lowest-terms-first ``max_expansions`` guard, the expand_prefix
        rule) and the ordered chain runs through
        :meth:`intervals_ordered_docs` (an any_of slot IS a
        SpanOrQuery — exactly the wrapper's rewrite). A slot with no
        matching terms matches nothing. Returns [(doc_id, n_matches)]
        doc asc, the span_near_docs contract."""
        alts: list[tuple] = []
        for s in slots:
            if isinstance(s, str):
                alts.append((s,))
                continue
            kind, pat = s
            if kind == "prefix":
                terms = self.expand_prefix(pat, max_expansions)
            elif kind == "wildcard":
                terms = self.expand_wildcard(pat, max_expansions)
            else:
                raise ValueError(
                    f"unsupported span_multi wrapper: {kind!r}"
                )
            if not terms:
                return []
            alts.append(tuple(terms))
        return self.intervals_ordered_docs(
            alts, max_gaps=slop, limit=limit
        )

    def expand_wildcard(self, pattern: str,
                        max_expansions: int = 4096) -> list[str]:
        """ES WildcardQuery term expansion: ``*`` matches any character
        sequence (incl. empty), ``?`` exactly one character, everything
        else literal. Vectorized: the glob compiles to ONE anchored RE2
        regex matched against each bucket's term column
        (``pc.match_substring_regex``) — no per-term Python. Deterministic
        lowest-terms-first truncation, like expand_prefix. A leading
        literal run is additionally pre-pruned with ``pc.starts_with``
        (the Lucene "wildcard should not start with *" perf rule, applied
        automatically instead of rejected)."""
        rx = _wildcard_to_regex(pattern)
        lit = pattern.split("*", 1)[0].split("?", 1)[0]
        out: list[str] = []
        for terms in self._iter_term_arrays():
            if lit:
                terms = terms.filter(pc.starts_with(terms, pattern=lit))
            m = pc.match_substring_regex(terms, pattern=rx)
            out.extend(terms.filter(m).to_pylist())
        out.sort()
        return out[:max_expansions]

    def wildcard_docs(self, pattern: str, limit: int = 20,
                      max_expansions: int = 4096) -> list[tuple[int, int]]:
        """ES wildcard-query analog (constant-score rewrite): docs
        containing at least one term matching the glob, ascending doc_id,
        first ``limit``, each with its count of DISTINCT matching terms."""
        return self._docs_for_terms(
            self.expand_wildcard(pattern, max_expansions), limit
        )

    def _gram_index(self):
        """Cached 3-gram -> candidate-term prefilter over the term
        dictionary — the ES ``wildcard`` FIELD TYPE architecture (an
        n-gram index over values accelerates infix/leading-wildcard
        patterns). Lazy, per searcher, dictionary-scale memory (the
        same cost class as the spell checker's _term_dict); in a
        multi-node deployment each query node grams only its bucket
        share. Returns (gram -> np.int64 term ids, terms np.ndarray)."""
        cached = getattr(self, "_gram_index_cache", None)
        if cached is not None:
            return cached
        all_terms: list = []
        for terms, _, _, _ in self._term_dict():
            all_terms.append(terms)
        flat = (np.concatenate(all_terms) if all_terms
                else np.empty(0, dtype="U1"))
        grams: dict = {}
        for i, t in enumerate(flat.tolist()):
            for j in range(len(t) - 2):
                grams.setdefault(t[j:j + 3], []).append(i)
        grams = {
            g: np.array(ids, np.int64) for g, ids in grams.items()
        }
        self._gram_index_cache = (grams, flat)
        return self._gram_index_cache

    def wildcard_infix_docs(self, pattern: str, limit: int = 20,
                            max_expansions: int = 4096
                            ) -> list[tuple[int, int]]:
        """ES ``wildcard`` field-type query plan: literal runs of >= 3
        chars in the glob prefilter candidate terms through the 3-gram
        index (posting-list intersection over the runs' grams), and the
        anchored regex verifies ONLY those candidates — a leading ``*``
        no longer scans the whole dictionary. Falls back to the
        dictionary-scan plan when no run is long enough. Result set
        IDENTICAL to :meth:`wildcard_docs` (pinned by test) — only the
        plan differs."""
        runs = [r for r in re.split(r"[*?]", pattern) if len(r) >= 3]
        if not runs:
            return self.wildcard_docs(pattern, limit, max_expansions)
        grams, flat = self._gram_index()
        cand = None
        for r in runs:
            for j in range(len(r) - 2):
                ids = grams.get(r[j:j + 3])
                if ids is None:
                    return []
                cand = ids if cand is None else np.intersect1d(
                    cand, ids
                )
                if cand.size == 0:
                    return []
        rx = re.compile(_wildcard_to_regex(pattern))
        matched = sorted(
            t for t in flat[np.unique(cand)].tolist() if rx.search(t)
        )[:max_expansions]
        return self._docs_for_terms(matched, limit)

    def expand_fuzzy(self, term: str, max_edits: int = 1,
                     prefix_length: int = 0,
                     max_expansions: int = 50,
                     transpositions: bool = False) -> list[tuple[str, int]]:
        """ES FuzzyQuery term expansion (Lucene TopTermsRewrite analog);
        ``transpositions=True`` = the ES-default OSA metric (adjacent
        swap costs one edit).
        Vocabulary terms within edit distance <= ``max_edits`` of
        the analyzed term, selected CLOSEST-FIRST with lexicographic
        tie-break, truncated to ``max_expansions``. ``prefix_length``
        leading chars must match exactly (the ES knob — never fuzzed).

        Vectorized per bucket: candidates are length-band + prefix pruned
        with Arrow kernels, then ONE banded-DP call (``levenshtein_vec``)
        scores the whole slice — no per-candidate Python. Returns
        [(term, distance)] — distance 0 (the exact term) included, as in
        Lucene."""
        toks = tokenize_query(term)
        if len(toks) != 1:
            raise ValueError("fuzzy query must analyze to exactly one term")
        q = toks[0]
        m = len(q)
        hits: list[tuple[int, str]] = []
        for terms in self._iter_term_arrays():
            lens = pc.utf8_length(terms)
            band = pc.and_(
                pc.greater_equal(lens, m - max_edits),
                pc.less_equal(lens, m + max_edits),
            )
            if prefix_length > 0:
                band = pc.and_(
                    band, pc.starts_with(terms, pattern=q[:prefix_length])
                )
            cand = terms.filter(band).to_numpy(zero_copy_only=False)
            if cand.size == 0:
                continue
            dist = levenshtein_vec(q, cand, transpositions=transpositions)
            keep = dist <= max_edits
            hits.extend(zip(dist[keep].tolist(), cand[keep].tolist()))
        hits.sort()
        return [(t, d) for d, t in hits[:max_expansions]]

    def match_fuzzy(self, query: str, k: int = 10, max_edits: int = 1,
                    prefix_length: int = 0, max_expansions: int = 50,
                    transpositions: bool = True,
                    where: dict | None = None) -> list[tuple]:
        """ES match query with ``fuzziness`` (the scored form — unlike
        fuzzy_docs' constant-score doc list): every analyzed query
        token expands to its OSA-<= max_edits dictionary neighborhood
        (closest-first, capped — expand_fuzzy, the ES default
        transpositions=true metric); each expanded term scores BM25
        with its OWN postings stats, weighted by the documented decay
        ``(max_edits + 1 - ed) / (max_edits + 1)`` (exact term 1.0, one
        edit 1/2, ...), same-term weights from different query tokens
        SUMMED (repeated-clause rule). Weights are exact binary
        fractions so the sum is order-free; per-doc accumulation is
        term-ascending (the engine float op order the SQL twin
        mirrors). A doc matches when any expanded term is present.
        Returns [(doc_id, score)] score desc, doc_id asc, top k."""
        if k <= 0:
            return []
        weights: dict[str, float] = {}
        for tok in tokenize_query(query):
            if self.stopwords and tok in self.stopwords:
                continue
            for t, ed in self.expand_fuzzy(
                tok, max_edits, prefix_length, max_expansions,
                transpositions,
            ):
                w = (max_edits + 1 - ed) / (max_edits + 1)
                weights[t] = weights.get(t, 0.0) + w
        buf = np.zeros(self.N, dtype=np.float64)
        hit = np.zeros(self.N, dtype=bool)
        for term in sorted(weights):
            p = self.lookup(term)
            if p is None:
                continue
            w = weights[term] * self.idf(p.df)
            ids = p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            tfp = p.tf_part if p.live_mask is None else p.tf_part[p.live_mask]
            buf[ids] += w * tfp
            hit[ids] = True
        if self.excluded.size:
            hit = hit.copy()
            hit[self.excluded] = False
        if where:
            hit = hit & self.filter_mask(**where)
        idx = np.flatnonzero(hit)
        if idx.size == 0:
            return []
        return self._topk_from(idx, buf[idx], k)

    def _docs_for_terms(self, terms: list[str],
                        limit: int) -> list[tuple[int, int]]:
        """Constant-score multi-term rewrite core: docs containing at
        least one of ``terms``, ascending doc_id, first ``limit``; each
        with its count of DISTINCT matching terms. One bincount-style
        scatter per term — no per-doc loop."""
        if not terms:
            return []
        counts = np.zeros(self.N, dtype=np.int32)
        for t in terms:
            p = self.lookup(t)
            if p is not None:
                counts[p.doc_ids] += 1  # doc_ids unique within a term
        if self.excluded.size:
            counts[self.excluded] = 0
        docs = np.flatnonzero(counts)[:limit]
        return [(int(d), int(counts[d])) for d in docs]

    def prefix_docs(self, prefix: str, limit: int = 20,
                    max_expansions: int = 4096) -> list[tuple[int, int]]:
        """ES prefix-query analog (constant-score rewrite): docs
        containing at least one term with the prefix."""
        return self._docs_for_terms(
            self.expand_prefix(prefix, max_expansions), limit
        )

    def prefix_exact_docs(self, prefix: str, limit: int = 20,
                          max_expansions: int = 4096,
                          root: "Searcher | None" = None) -> list[int]:
        """ES ``index_prefixes`` fast path: on a prefix-subfield index,
        a prefix whose length lies in the manifest's [min, max] range
        resolves by ONE exact dictionary probe (the subfield indexed
        every in-range edge prefix as a term) — O(1) vs the dictionary
        scan of :meth:`prefix_docs`. Out-of-range lengths fall back the
        way ES does: LONGER than max goes to the ROOT-field searcher
        (``root`` — shares this index's dense doc space; required for
        that case), shorter than min scans this subfield's dictionary
        (every root token of length >= min has its min-prefix here; only
        sub-min tokens escape, the documented subfield gap). Ascending
        doc_ids, first ``limit``, tombstones excluded."""
        t = tokenize_query(prefix)
        term = t[0] if t else ""
        lo, hi = self.prefix_range if self.prefix_range else (1, 0)
        if lo <= len(term) <= hi:
            return [d for d, _ in self._docs_for_terms([term], limit)]
        if len(term) > hi and root is not None:
            return [
                d for d, _ in root.prefix_docs(prefix, limit, max_expansions)
            ]
        return [
            d for d, _ in self.prefix_docs(prefix, limit, max_expansions)
        ]

    def match_bool_prefix(self, query: str, k: int = 10,
                          where: dict | None = None,
                          max_expansions: int = 4096) -> list[tuple]:
        """ES match_bool_prefix analog: the analyzed query's LAST token
        becomes a prefix clause, every earlier token a term
        should-clause (the ES bool rewrite of match_bool_prefix).
        Scoring spec (pinned for the SQL oracle): BM25 should-clause
        contributions for the term clauses in the search() TAAT op
        order, plus a CONSTANT 1.0 for docs containing any term with
        the prefix (the constant-score multi-term rewrite Lucene uses
        inside this query). A doc matches if it matches ANY clause;
        stop tokens drop per the index analyzer (a stop last token
        leaves a pure term bool). (score desc, doc_id asc), ``where``
        filters hits."""
        if k <= 0:
            return []
        hits, buf = self._mbp_dense(query, max_expansions)
        if self.excluded.size:
            hits[self.excluded] = False
        if where:
            hits &= self.filter_mask(**where)
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        return self._topk_from(idx, buf[idx], k)

    def _mbp_dense(self, query: str, max_expansions: int = 4096):
        """match_bool_prefix as a dense (hit_mask, score_buf) pair over
        the doc space — the composable form multi-field SAYT sums
        (tombstones/where NOT applied; callers do that)."""
        toks = tokenize_query(query)
        if self.shingle_size > 1:
            # search_as_you_type ._Ngram leg: clauses are shingles; the
            # LAST shingle is the prefix clause (its trailing token is
            # the in-flight word), earlier shingles score as terms
            toks = query_shingles(toks, self.shingle_size)
        prefix = (toks[-1] if toks and toks[-1] not in self.stopwords
                  else None)
        rest = [t for t in toks[:-1] if t not in self.stopwords]
        qtf: dict[str, float] = {}
        for t in rest:
            qtf[t] = qtf.get(t, 0.0) + 1.0
        buf = np.zeros(self.N, dtype=np.float64)
        hits = self._present_mask(sorted(qtf))
        for term in sorted(qtf):
            p = self.lookup(term)
            if p is None:
                continue
            buf[p.doc_ids] += self._term_weight(qtf[term], p.df) * p.tf_part
        if prefix is not None:
            pm = self._present_mask(
                self.expand_prefix(prefix, max_expansions)
            )
            buf[pm] += 1.0
            hits |= pm
        return hits, buf

    def pinned_search(self, ids: list[int], query: str, k: int = 10,
                      where: dict | None = None) -> list[tuple]:
        """ES pinned-query analog: the given doc ids are PROMOTED above
        every organic hit, in the order given (first pinned id ranks
        first — the ES pinned contract); organic = search(query) minus
        the pinned set. Returns [(doc_id, score, pinned)] — score is
        the doc's organic BM25 score under the same dense TAAT op order
        (0.0 when no query term matches: pinned docs surface
        regardless of matching, the deterministic stand-in for ES's
        artificial descending pin scores). Pinned ids that don't exist,
        are tombstoned, or fail ``where`` are skipped; duplicates keep
        the first occurrence."""
        if k <= 0:
            return []
        buf = self._dense_scores(query)
        fm = self.filter_mask(**where) if where else None
        out: list[tuple] = []
        seen: set[int] = set()
        for d in ids:
            d = int(d)
            if d in seen or not 0 <= d < self.N:
                continue
            seen.add(d)
            if self.excluded.size and bool(np.isin(d, self.excluded)):
                continue
            if fm is not None and not fm[d]:
                continue
            out.append((d, float(buf[d]), True))
            if len(out) >= k:
                return out[:k]
        for d, s in self.search(query, k=k + len(seen), where=where):
            if d in seen:
                continue
            out.append((d, s, False))
            if len(out) >= k:
                break
        return out[:k]

    def expand_regexp(self, pattern: str,
                      max_expansions: int = 4096) -> list[str]:
        """ES RegexpQuery term expansion: the pattern is ANCHORED over
        the whole term (Lucene regexp semantics — not a substring
        search). Vectorized: one RE2 match over each bucket's term
        column; deterministic lowest-terms-first truncation like
        expand_prefix/expand_wildcard."""
        rx = f"^(?:{pattern})$"
        out: list[str] = []
        for terms in self._iter_term_arrays():
            m = pc.match_substring_regex(terms, pattern=rx)
            out.extend(terms.filter(m).to_pylist())
        out.sort()
        return out[:max_expansions]

    def regexp_docs(self, pattern: str, limit: int = 20,
                    max_expansions: int = 4096) -> list[tuple[int, int]]:
        """ES regexp-query analog (constant-score rewrite): docs
        containing at least one term fully matching the anchored
        pattern, ascending doc_id, first ``limit``, each with its count
        of DISTINCT matching terms."""
        return self._docs_for_terms(
            self.expand_regexp(pattern, max_expansions), limit
        )

    def terms_set_docs(self, terms: list[str], min_match: int,
                       limit: int = 20) -> list[tuple[int, int]]:
        """ES terms_set-query analog (constant minimum_should_match_field):
        docs containing at least ``min_match`` DISTINCT terms of the set,
        ascending doc_id, first ``limit``, each with its distinct-match
        count. One bincount-style scatter per term."""
        if min_match < 1:
            raise ValueError("min_match must be >= 1")
        uniq = sorted(set(terms))
        counts = np.zeros(self.N, dtype=np.int32)
        for t in uniq:
            p = self.lookup(t)
            if p is not None:
                counts[p.doc_ids] += 1
        if self.excluded.size:
            counts[self.excluded] = 0
        docs = np.flatnonzero(counts >= min_match)[:limit]
        return [(int(d), int(counts[d])) for d in docs]

    def exists_docs(self, field: str, limit: int = 20) -> list[int]:
        """ES exists-query analog: docs whose keyword ``field`` is
        non-null, ascending doc_id, first ``limit`` (constant score —
        like the other rewrites, the doc list IS the result)."""
        codes, _ = self._field_codes(field)
        live = codes >= 0
        if self.excluded.size:
            live[self.excluded] = False
        return [int(d) for d in np.flatnonzero(live)[:limit]]

    def exists_count(self, field: str) -> int:
        """Count form of the exists query (tombstone-aware)."""
        codes, _ = self._field_codes(field)
        live = codes >= 0
        if self.excluded.size:
            live[self.excluded] = False
        return int(live.sum())

    def fuzzy_docs(self, term: str, max_edits: int = 1, limit: int = 20,
                   prefix_length: int = 0,
                   max_expansions: int = 50,
                   transpositions: bool = False) -> list[tuple[int, int]]:
        """ES fuzzy-query analog (constant-score rewrite over the fuzzy
        expansion): docs containing >=1 term within ``max_edits`` of the
        query term, ascending doc_id, first ``limit``, each with its
        count of DISTINCT matching terms. ``transpositions`` selects the
        OSA metric (the ES default true; this engine defaults False to
        keep the plain-Levenshtein contract its oracles pinned first)."""
        exp = self.expand_fuzzy(term, max_edits, prefix_length,
                                max_expansions, transpositions)
        return self._docs_for_terms([t for t, _ in exp], limit)

    # ------------------------------------------------------------------
    # suggesters (ES _suggest API analogs) — shared surface in SuggestAPI;
    # the Searcher-side primitives live here
    # ------------------------------------------------------------------

    def _total_tokens(self) -> float:
        return float(self.dl.sum())

    def _term_dict(self):
        """Cached (terms, dfs, cfs, lens) numpy views of the term
        dictionary, one tuple per bucket — a column-pruned parquet read
        (term/df/cf only, never posting bytes). This is the standard
        memory cost of a spell checker (the Lucene FST analog); buckets
        are independent, so a multi-node deployment scans them in
        parallel tasks and each query node caches only its share."""
        import os

        cached = getattr(self, "_term_dict_cache", None)
        if cached is not None:
            return cached
        out = []
        for b in range(self.num_buckets):
            path = os.path.join(self._postings_dir, f"bucket-{b:04d}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path, columns=["term", "df", "cf"])
            terms = t["term"].combine_chunks()
            out.append((
                # unicode dtype once at load (np.char kernels need it)
                terms.to_numpy(zero_copy_only=False).astype(str),
                t["df"].to_numpy(zero_copy_only=False),
                t["cf"].to_numpy(zero_copy_only=False),
                pc.utf8_length(terms).to_numpy(zero_copy_only=False),
            ))
        self._term_dict_cache = out
        return out

    def _dict_stats(self, term: str) -> tuple[int, int]:
        """(df, cf) from the bucket dictionary WITHOUT decoding postings —
        the cheap lookup suggesters and language models need."""
        row = self._load_bucket(term_bucket_py(term, self.num_buckets)).get(term)
        return (0, 0) if row is None else (int(row["df"]), int(row["cf"]))

    def _suggest_candidates(self, tok: str, max_edits: int,
                            prefix_length: int):
        """Vectorized spell-check candidate scan: dictionary terms within
        ``max_edits`` of ``tok`` (distance >= 1 — never the token itself),
        length-band + prefix pruned per bucket, ONE banded-DP
        levenshtein_vec call per bucket slice. Returns parallel numpy
        arrays (terms, dfs, dists)."""
        m = len(tok)
        pre = tok[:prefix_length] if prefix_length > 0 else ""
        ts, ds, es = [], [], []
        for terms, dfs, _, lens in self._term_dict():
            band = (lens >= m - max_edits) & (lens <= m + max_edits)
            band_idx = np.flatnonzero(band)
            if pre and band_idx.size:
                band_idx = band_idx[np.char.startswith(terms[band_idx], pre)]
            if band_idx.size == 0:
                continue
            cand = terms[band_idx]
            dist = levenshtein_vec(tok, cand)
            keep = (dist <= max_edits) & (dist >= 1)
            ts.append(cand[keep])
            ds.append(dfs[band_idx][keep])
            es.append(dist[keep])
        if not ts:
            z = np.empty(0)
            return z.astype(str), z.astype(np.int64), z.astype(np.int64)
        return np.concatenate(ts), np.concatenate(ds), np.concatenate(es)

    def _completion_rows(self, prefix: str) -> list[tuple]:
        """UNTRUNCATED (term, df) rows with ``prefix`` — one vectorized
        prefix scan over the cached term dictionary (the FST analog).
        Untruncated so the sharded merge can sum dfs losslessly, exactly
        like facet_counts' untruncated histograms."""
        rows: list[tuple] = []
        for terms, dfs, _, _ in self._term_dict():
            pm = np.char.startswith(terms, prefix)
            rows.extend(zip(terms[pm].tolist(), dfs[pm].tolist()))
        return rows

    def _completion_fuzzy_rows(self, prefix: str, fuzziness: int,
                               prefix_length: int) -> list[tuple]:
        """UNTRUNCATED fuzzy completion rows: anchor on the exact
        ``prefix_length`` head, truncate candidates to the query-prefix
        length with one vectorized astype('U<L>') cast, ONE banded-DP
        levenshtein_vec call per dictionary bucket slice — no per-term
        Python distance loops."""
        L = len(prefix)
        anchor = prefix[:prefix_length]
        rows: list[tuple] = []
        for terms, dfs, _, _ in self._term_dict():
            pm = np.char.startswith(terms, anchor)
            sub = terms[pm]
            if sub.size == 0:
                continue
            heads = sub.astype(f"U{L}")  # truncating cast (vectorized)
            dist = levenshtein_vec(prefix, heads)
            ok = dist <= fuzziness
            rows.extend(zip(sub[ok].tolist(), dfs[pm][ok].tolist()))
        return rows

    def _completion_ctx_rows(self, prefix: str, where: dict) -> list:
        """UNTRUNCATED (term, df-within-context) rows with ``prefix`` —
        the context-filtered twin of _completion_rows: per candidate
        term one live-posting gather + one mask sum (O(postings of the
        prefix terms), never a corpus scan). Zero-count terms drop."""
        mask = self.filter_mask(**where)
        out: list[tuple] = []
        for t, _ in self._completion_rows(prefix):
            p = self.lookup(t)
            if p is None:
                continue
            ids = (
                p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            )
            c = int(mask[ids].sum())
            if c:
                out.append((t, c))
        return out

    def search_min_score(self, query: str, k: int = 10,
                         min_score: float = 0.0, **kw) -> list[tuple]:
        """ES min_score search option: top-k restricted to docs scoring
        >= ``min_score``. Results are score-descending, so filtering the
        top-k prefix IS the top-k of the qualified set — an exact
        rewrite, no extra scoring work. Accepts every search() kwarg."""
        return [
            (d, sc) for d, sc in self.search(query, k=k, **kw)
            if sc >= min_score
        ]

    def analyze(self, text: str,
                fold: bool = False) -> list[tuple[str, int]]:
        """ES _analyze API: run the INDEX analyzer over arbitrary text
        and return [(token, position)] — the call clients use to debug
        why a query does or doesn't match. Positions are the raw token
        slots; stop-filtered tokens vanish but LEAVE THEIR GAP
        (enablePositionIncrements — the same convention the positional
        index stores), so phrase-slop reasoning over the output matches
        the index exactly. ``fold=True`` applies the asciifolding
        corpus-prep kernel first (fold_query — folding lives in the
        data pipeline, the one analyzer component the manifest doesn't
        carry, so it's a caller knob here)."""
        if fold:
            from .analysis import fold_query

            text = fold_query(text)
        raw = tokenize_query(text)
        stops = self.stopwords or ()
        return [
            (t, i) for i, t in enumerate(raw) if t not in stops
        ]

    def validate_query(self, query: str) -> dict:
        """ES _validate/query?explain analog: parse + analyze + rewrite
        WITHOUT executing — what a client calls to sanity-check a query
        before paying for it. Returns {valid, terms: [(term, df, cf)]
        for each analyzed clause (df 0 = clause matches nothing),
        n_clauses, stopped: tokens the index stop list removed}.
        Dictionary lookups only — no posting decode, no scoring."""
        raw = tokenize_query(query)
        qtf = self._qweights(query)
        rows = []
        for t in sorted(qtf):
            df, cf = self._dict_stats(t)
            rows.append((t, df, cf))
        return {
            "valid": True,
            "n_clauses": len(qtf),
            "terms": rows,
            "stopped": sorted(set(raw) - set(qtf)),
        }

    def terms_enum(self, prefix: str, size: int = 10,
                   min_df: int = 1) -> list[tuple[str, int]]:
        """ES _terms_enum API analog: the first ``size`` index terms with
        ``prefix``, TERM-ASCENDING (the API's contract is sorted-term
        paging for query autocomplete), each with its dictionary df.
        Like ES, this reads the TERM DICTIONARY only — dfs are build-time
        index statistics and may count tombstoned docs (the documented ES
        caveat that terms_enum can surface terms only deleted docs
        contain); ``min_df`` prunes low-frequency noise. One vectorized
        prefix scan per bucket over the cached dictionary, no posting
        decode."""
        rows: list[tuple[str, int]] = []
        for terms, dfs, _, _ in self._term_dict():
            pm = np.char.startswith(terms, prefix)
            if min_df > 1:
                pm &= dfs >= min_df
            rows.extend(
                zip(terms[pm].tolist(), (int(d) for d in dfs[pm]))
            )
        rows.sort()
        return rows[:size]

    def _bigram_count(self, a: str, b: str) -> int:
        """Corpus count of the adjacent bigram ``a b`` from the positional
        sidecar (one _phrase_freqs intersection, cached per pair)."""
        cache = getattr(self, "_bigram_cache", None)
        if cache is None:
            cache = self._bigram_cache = {}
        key = (a, b)
        if key not in cache:
            if self._dict_stats(a)[0] == 0 or self._dict_stats(b)[0] == 0:
                cache[key] = 0
            else:
                _, pf, _ = self._phrase_freqs([a, b])
                cache[key] = int(pf.sum())
        return cache[key]

    def _msm_mask(self, plist, m: int) -> np.ndarray:
        """ES minimum_should_match analog: dense mask of docs containing
        at least ``m`` DISTINCT query terms (live postings only). One
        int16 scatter-add per term — O(total postings), no per-doc
        Python."""
        counts = np.zeros(self.N, dtype=np.int16)
        for _, _, p in plist:
            ids = (
                p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]
            )
            counts[ids] += np.int16(1)
        return counts >= m

    def _bool_mask(self, and_plist, must_not: str | None):
        """Dense doc mask for ES bool-query semantics: ``and_plist``
        (term, qtf, Postings) entries must ALL contain a doc (conjunctive
        rewrite of the must clauses); ``must_not`` excludes docs containing
        ANY of its analyzed terms. Returns None when unrestricted."""
        m = None
        if and_plist:
            ordered = sorted(and_plist, key=lambda e: e[2].df)
            cand = ordered[0][2].doc_ids
            for e in ordered[1:]:
                cand = np.intersect1d(cand, e[2].doc_ids, assume_unique=True)
            m = np.zeros(self.N, dtype=bool)
            m[cand] = True
        if must_not:
            for t in sorted(set(tokenize_query(must_not))):
                p = self.lookup(t)
                if p is None:
                    continue
                if m is None:
                    m = np.ones(self.N, dtype=bool)
                m[p.doc_ids] = False
        return m

    # ------------------------------------------------------------------
    # BM25 search
    # ------------------------------------------------------------------

    def search(self, query: str, k: int = 10, algo: str = "taat",
               where: dict | None = None, mode: str = "or",
               must_not: str | None = None, offset: int = 0,
               search_after: tuple | None = None,
               min_should_match: int | None = None):
        """Top-k [(doc_id, score)] — (score desc, doc_id asc).

        ``min_should_match`` (ES minimum_should_match, integer form):
        with mode="or", keep only docs matching at least that many
        DISTINCT query terms — a doc-set restriction like ``where``
        (statistics stay global, scores still sum every matched term),
        composed into every executor. mode="and" is the
        min_should_match=len(terms) special case; mixing the two is an
        error, as in ES.

        algo="taat": vectorized term-at-a-time union (default; O(total
        postings) numpy, the throughput path). algo="wand": doc-at-a-time
        block-max WAND (the skipping executor). Both accumulate per-doc
        contributions in ascending unique-term order -> bit-identical.

        ``where`` restricts hits to docs matching keyword-column equality
        filters (Lucene filtered-query semantics: scoring statistics stay
        GLOBAL — the filter prunes candidates, never reweights).

        ES bool-query analog: ``mode="and"`` keeps only docs matching ALL
        query terms (conjunctive must clauses — scores still sum every
        term's BM25 contribution); ``must_not`` drops docs containing any
        of its analyzed terms. Both are doc-set restrictions like
        ``where``: statistics stay global.

        Pagination (ES from/size + search_after analogs):
        ``offset`` skips the first ``offset`` ranked hits (ES ``from`` —
        internally a top-(offset+k) then slice, so deep offsets cost
        O(offset+k) pool like ES). ``search_after=(doc_id, score)`` — the
        previous page's LAST HIT, passed back verbatim — is the stateless
        cursor: return the top-k ranked STRICTLY AFTER that sort key —
        O(k) pool regardless of page depth, the scale path for deep
        pagination. Scores are deterministic float64 (bit-identical across
        executors), so the cursor's exact-equality tie leg is sound. The
        two are mutually exclusive, as in ES.
        """
        if k <= 0:
            return []
        if offset and search_after is not None:
            raise ValueError("offset and search_after are mutually exclusive")
        after = None
        if search_after is not None:
            # cursor arrives hit-shaped (doc_id, score); executors compare
            # (score, doc_id)
            after = (float(search_after[1]), int(search_after[0]))
        inner_k = k + int(offset)
        qtf = self._qweights(query)
        terms = sorted(qtf)
        plist = [(t, qtf[t], self.lookup(t)) for t in terms]
        plist = [(t, q, p) for t, q, p in plist if p is not None]
        if not plist:
            return []
        if mode == "and" and len(plist) < len(terms):
            return []  # a required term is absent from the corpus
        mask = self.filter_mask(**where) if where else None
        if mode == "and" or must_not:
            bm = self._bool_mask(plist if mode == "and" else None, must_not)
            if bm is not None:
                mask = bm if mask is None else (mask & bm)
        if min_should_match is not None and min_should_match > 1:
            if mode != "or":
                raise ValueError(
                    "min_should_match applies to mode='or' queries only"
                )
            if min_should_match > len(plist):
                return []
            mm = self._msm_mask(plist, min_should_match)
            mask = mm if mask is None else (mask & mm)
        if algo == "taat":
            key = (
                query, k, _where_key(where) if where else None,
                mode, must_not, offset, after, min_should_match,
            )
            cached = self._result_cache.get(key)
            if cached is not None:
                return list(cached)
            if len(plist) == 1:
                out = self._search_single_pruned(plist[0], inner_k, mask, after)
            else:
                out = self._search_taat(plist, inner_k, mask, after)
            out = out[offset:] if offset else out
            if len(self._result_cache) >= 4096:
                self._result_cache.clear()
            self._result_cache[key] = out
            return list(out)
        out = self._search_wand(plist, inner_k, mask=mask, after=after)
        return out[offset:] if offset else out

    def _term_weight(self, qtf: int, df: int) -> float:
        return qtf * self.idf(df)

    def _search_single_pruned(self, entry, k, mask=None, after=None):
        """Exact single-term top-k with block-max pruning.

        Blocks are processed in DESCENDING bound order in chunks; a
        candidate pool keeps only docs with score >= the running kth score
        (ties kept for the doc_id-asc tie-break), so the loop is O(total
        postings) worst case and stops early once the next bound is
        strictly below the kth score. Contribution op order identical to
        the oracle (w * tf_part)."""
        term, qn, p = entry
        w = self._term_weight(qn, p.df)
        n = p.doc_ids.size
        nblocks = p.block_ub.size
        if nblocks <= 4:
            d, sc = p.doc_ids, w * p.tf_part
            if p.live_mask is not None:
                d, sc = d[p.live_mask], sc[p.live_mask]
            if mask is not None:
                keep = mask[d]
                d, sc = d[keep], sc[keep]
            if after is not None:
                keep = _after_keep(sc, d, after)
                d, sc = d[keep], sc[keep]
            return self._topk_from(d, sc, k)
        order = np.argsort(-p.block_ub, kind="stable")
        if p.live_mask is not None:
            # tombstone-tightened bounds: ub == 0 <=> every posting in the
            # block is excluded (live BM25 factors are strictly positive)
            order = order[p.block_ub[order] > 0.0]
        bounds = w * p.block_ub[order]
        pool_docs = np.empty(0, np.int64)
        pool_scores = np.empty(0, np.float64)
        kth = -np.inf
        CHUNK = 64
        for c0 in range(0, order.size, CHUNK):
            if pool_scores.size >= k and bounds[c0] < kth:
                break
            js = order[c0 : c0 + CHUNK]
            self._blocks_scored += int(js.size)
            parts_d, parts_s = [], []
            for j in js:
                lo = int(j) * 128
                hi = min(n, lo + 128)
                d = p.doc_ids[lo:hi]
                s = w * p.tf_part[lo:hi]
                if p.live_mask is not None:
                    keep = p.live_mask[lo:hi]
                    d, s = d[keep], s[keep]
                if mask is not None:
                    keep = mask[d]
                    d, s = d[keep], s[keep]
                if after is not None:
                    # cursor drops only higher-ranked hits, so the running
                    # kth of the FILTERED pool still upper-bounds every
                    # unseen block's admissible score: pruning stays exact
                    keep = _after_keep(s, d, after)
                    d, s = d[keep], s[keep]
                parts_d.append(d)
                parts_s.append(s)
            pool_docs = np.concatenate([pool_docs] + parts_d)
            pool_scores = np.concatenate([pool_scores] + parts_s)
            if pool_scores.size > k:
                kth = -np.partition(-pool_scores, k - 1)[k - 1]
                keep = pool_scores >= kth  # keep boundary ties
                pool_docs = pool_docs[keep]
                pool_scores = pool_scores[keep]
        return self._topk_from(pool_docs, pool_scores, k)

    def _topk_from(self, docs, scores, k):
        return _topk_pairs(docs, scores, k)

    # docs-per-term cap under which a term is "essential" for MaxScore
    MAXSCORE_DF_CAP = 4096

    def _search_maxscore(self, plist, k, mask=None, after=None):
        """Vectorized MaxScore: exact top-k that touches hot posting lists
        only at CANDIDATE positions.

        Essential lists = the low-df terms (df <= MAXSCORE_DF_CAP, always
        at least the smallest); candidates = union of their doc ids. Every
        candidate's EXACT score accumulates in ascending-term order (the
        oracle's float op sequence — non-essential contributions come from
        a vectorized searchsorted gather instead of a full scatter). Any
        doc outside the candidates scores at most
        B = sum of non-essential w*max(tf_part); if the kth candidate
        score beats B (with the WAND slop), the result is provably the
        global top-k. Returns None when pruning cannot apply (all terms
        cold/hot, too few candidates, or bound not beaten) — caller falls
        back to the full TAAT scatter. Measured: 2-term Zipf workloads are
        dominated by one hot + one cold term, where this skips the
        hot-list scatter entirely."""
        if len(plist) < 2:
            return None
        by_df = sorted(plist, key=lambda e: e[2].df)
        essential = [e for e in by_df if e[2].df <= self.MAXSCORE_DF_CAP]
        if not essential:
            essential = [by_df[0]]
        ess_terms = {e[0] for e in essential}
        non_ess = [e for e in plist if e[0] not in ess_terms]
        if not non_ess:
            return None
        slop = 1.0 + 1e-12
        B = sum(
            self._term_weight(qn, p.df) * float(p.block_ub.max())
            for _, qn, p in non_ess
        ) * slop
        def live_ids(p):
            return p.doc_ids if p.live_mask is None else p.doc_ids[p.live_mask]

        cands = (
            live_ids(essential[0][2])
            if len(essential) == 1
            else np.unique(np.concatenate([live_ids(e[2]) for e in essential]))
        )
        if mask is not None:
            cands = cands[mask[cands]]
        if cands.size < k:
            return None
        scores = np.zeros(cands.size, dtype=np.float64)
        for term, qn, p in plist:  # ascending term order == oracle order
            w = self._term_weight(qn, p.df)
            pos = np.searchsorted(p.doc_ids, cands)
            pos_c = np.minimum(pos, p.doc_ids.size - 1)
            hit = p.doc_ids[pos_c] == cands
            scores[hit] += w * p.tf_part[pos_c[hit]]
        if after is not None:
            # search_after prunes only higher-ranked candidates; any
            # non-candidate doc is still bounded by B, so the kth-vs-B
            # completeness proof below is unchanged
            keep = _after_keep(scores, cands, after)
            cands, scores = cands[keep], scores[keep]
            if cands.size < k:
                return None
        kth = -np.partition(-scores, k - 1)[k - 1]
        if not kth > B:
            return None  # a hot-only doc could reach the top-k: fall back
        return self._topk_from(cands, scores, k)

    def _search_taat(self, plist, k, mask=None, after=None):
        """Vectorized term-at-a-time scoring into a reusable dense
        accumulator (one float64 slot per doc of this segment — per-segment
        N is bounded in the sharded design, so this is O(segment) memory
        held once per actor). Each term scatter-adds its contributions in
        ascending-term order — per doc that is exactly the oracle's float64
        accumulation order, so scores are bit-identical to the spec.
        Multi-term queries first try the MaxScore path (exact, candidate-
        only work); this full scatter is the fallback."""
        out = self._search_maxscore(plist, k, mask, after)
        if out is not None:
            return out
        buf = getattr(self, "_score_buf", None)
        if buf is None or buf.size != self.N:
            buf = self._score_buf = np.zeros(self.N, dtype=np.float64)
        touched = []
        for term, qn, p in plist:  # ascending term order == oracle order
            w = self._term_weight(qn, p.df)
            buf[p.doc_ids] += w * p.tf_part  # doc_ids unique within a term
            touched.append(p.doc_ids)
        total_touched = sum(t.size for t in touched)
        if total_touched * 8 < self.N:
            # sparse query: unique over the touched ids beats scanning N
            idx = np.unique(np.concatenate(touched))
        else:
            idx = np.flatnonzero(buf > 0.0)  # contributions strictly positive
        if self.excluded.size:
            idx = idx[~np.isin(idx, self.excluded)]
        if mask is not None:
            idx = idx[mask[idx]]
        scores = buf[idx].copy()
        for t in touched:  # reset only touched slots for the next query
            buf[t] = 0.0
        if after is not None:
            keep = _after_keep(scores, idx, after)
            idx, scores = idx[keep], scores[keep]
        return _topk_pairs(idx, scores, k)

    def _search_wand(self, plist, k, weights: dict | None = None,
                     excluded_set=None, mask=None, after=None):
        """Block-max WAND over (tf_part, block_ub) — the precomputed
        query-independent factors, so the SAME executor serves both the
        file-based Searcher and the zero-copy SharedSearcher (round-1 kept
        WAND file-only because it reached for the raw block structs; the
        bounds and scores only ever need tf_part/block_ub). Scoring
        accumulates w * tf_part[i] in ascending-term order — the identical
        float64 op sequence as TAAT/the oracle (tf_part is the same
        elementwise expression), so results stay bit-identical.

        ``weights`` overrides the per-term weight (MultiSearcher passes
        GLOBAL-df weights so per-segment WAND scores equal the global
        index's); the Postings in plist must then carry tf_part/block_ub
        computed against the matching (global) avgdl."""
        if excluded_set is None:
            excluded_set = self._excluded_set

        class Cur:
            __slots__ = ("term", "w", "p", "i", "ub")

        curs = []
        for term, qn, p in plist:
            c = Cur()
            c.term, c.p, c.i = term, p, 0
            c.w = (
                weights[term] if weights is not None
                else self._term_weight(qn, p.df)
            )
            c.ub = float((c.w * p.block_ub).max())
            curs.append(c)

        INF = np.iinfo(np.int64).max
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap

        def cur_doc(c):
            return int(c.p.doc_ids[c.i]) if c.i < c.p.doc_ids.size else INF

        def advance_to(c, target):
            # galloping via searchsorted on the remaining postings
            c.i += int(np.searchsorted(c.p.doc_ids[c.i :], target, side="left"))

        slop = 1.0 + 1e-12  # UB sums must never round below a true score
        while True:
            curs.sort(key=lambda c: (cur_doc(c), c.term))
            threshold = heap[0][0] if len(heap) >= k else -1.0
            acc, pivot = 0.0, -1
            for j, c in enumerate(curs):
                if cur_doc(c) == INF:
                    break
                acc += c.ub
                if acc * slop > threshold:
                    pivot = j
                    break
            if pivot < 0:
                break
            pivot_doc = cur_doc(curs[pivot])
            if pivot_doc == INF:
                break
            if cur_doc(curs[0]) == pivot_doc:
                on_doc = [c for c in curs if cur_doc(c) == pivot_doc]
                if pivot_doc not in excluded_set and (
                    mask is None or mask[pivot_doc]
                ):
                    on_doc.sort(key=lambda c: c.term)
                    score = 0.0
                    for c in on_doc:  # ascending-term order == oracle order
                        score += c.w * float(c.p.tf_part[c.i])
                    # search_after cursor: admit only hits ranked strictly
                    # after (score desc, doc_id asc); the heap threshold
                    # then reflects the after-page top-k, so block-max
                    # pruning stays exact for the page
                    admit = after is None or (
                        score < after[0]
                        or (score == after[0] and pivot_doc > after[1])
                    )
                    if admit:
                        item = (score, -pivot_doc)
                        if len(heap) < k:
                            heapq.heappush(heap, item)
                        elif item > heap[0]:
                            heapq.heapreplace(heap, item)
                for c in on_doc:
                    c.i += 1
            else:
                # advance the lagging cursor with the largest UB (classic WAND)
                lag = max(
                    (c for c in curs[:pivot] if cur_doc(c) < pivot_doc),
                    key=lambda c: c.ub,
                    default=curs[0],
                )
                advance_to(lag, pivot_doc)

        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [(-d, s) for s, d in out]

    # ------------------------------------------------------------------
    # point lookups / counts (ref: EntityDao.find/findAll, count)
    # ------------------------------------------------------------------

    # function_score field_value_factor modifiers (vectorized, float64).
    # log1p is computed as log(1.0 + v) — the exact op sequence of the
    # SQL oracle's ln(1 + x) — rather than np.log1p (which differs in the
    # last ulp for large v and could flip an e6-rounded comparison).
    _FVF_MODIFIERS = {
        "none": lambda v: v,
        "log1p": lambda v: np.log(1.0 + v),
        "sqrt": np.sqrt,
        "square": np.square,
    }

    def function_score(self, query: str, field: str, k: int = 10,
                       modifier: str = "log1p", factor: float = 1.0,
                       where: dict | None = None, mode: str = "or",
                       must_not: str | None = None):
        """ES function_score query with a field_value_factor function,
        boost_mode=multiply: final = BM25(query, doc) *
        modifier(factor * field). Rescoring can reorder ANY hit into the
        top-k, so the whole hit set is scored once (dense TAAT buf, the
        facet_top_hits pass) and the factor applies as one vectorized
        multiply — never a per-candidate loop. Docs with a null field get
        factor 1.0 (ES missing-value passthrough). Ties break doc_id
        asc."""
        fn = self._FVF_MODIFIERS.get(modifier)
        if fn is None:
            raise ValueError(
                f"unsupported modifier: {modifier!r} "
                f"(one of {sorted(self._FVF_MODIFIERS)})"
            )
        if k <= 0:
            return []
        hits = self._hit_mask(query, where, mode, must_not)
        if hits is None:
            return []
        buf = np.zeros(self.N, dtype=np.float64)
        for term, qn, p in self._plist(query):
            w = self._term_weight(qn, p.df)
            buf[p.doc_ids] += w * p.tf_part
        vals, valid = self._numeric_col(field)
        idx = np.flatnonzero(hits)
        fvf = np.ones(idx.size, np.float64)
        v = valid[idx]
        fvf[v] = fn(factor * vals[idx][v])
        scores = buf[idx] * fvf
        return self._topk_from(idx, scores, k)

    def boosting_search(self, positive: str, negative: str,
                        negative_boost: float = 0.5, k: int = 10,
                        where: dict | None = None) -> list[tuple]:
        """ES boosting-query analog: hits of the ``positive`` query keep
        their BM25 score, but docs ALSO matching any ``negative`` term
        are DEMOTED — multiplied by ``negative_boost`` — instead of
        excluded (the soft must_not). One dense pass + one vectorized
        where-multiply (base * nb vs base * 1.0, both exact float
        no-op/scale — op order pinned for the oracle)."""
        if not 0.0 <= negative_boost <= 1.0:
            raise ValueError("negative_boost must be in [0, 1]")
        if k <= 0:
            return []
        hits = self._hit_mask(positive, where)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        buf = self._dense_scores(positive)
        neg = self._present_mask(tokenize_query(negative))
        scores = buf[idx] * np.where(neg[idx], negative_boost, 1.0)
        return self._topk_from(idx, scores, k)

    def decay_score(self, query: str, field: str, origin: float,
                    scale: float, k: int = 10, decay: float = 0.5,
                    where: dict | None = None) -> list[tuple]:
        """ES function_score gauss-decay analog (boost_mode=multiply,
        offset=0): final = BM25 * exp(-(v-origin)² · ln(1/decay) / scale²)
        — at |v-origin| == scale the factor is exactly ``decay`` (the ES
        contract). The whole hit set rescores in one vectorized exp;
        docs with a null field pass through with factor 1.0 (ES
        missing-value rule). Float op order pinned for the oracle:
        exp((-(d*d)) * ln(1/decay) / (scale*scale))."""
        if not 0.0 < decay < 1.0:
            raise ValueError("decay must be in (0, 1)")
        if scale <= 0:
            raise ValueError("scale must be positive")
        if k <= 0:
            return []
        hits = self._hit_mask(query, where)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        buf = self._dense_scores(query)
        vals, valid = self._numeric_col(field)
        fac = np.ones(idx.size, np.float64)
        v = valid[idx]
        d = vals[idx][v] - origin
        lam = math.log(1.0 / decay)
        fac[v] = np.exp((-(d * d)) * lam / (scale * scale))
        scores = buf[idx] * fac
        return self._topk_from(idx, scores, k)

    def rank_feature(self, query: str, field: str, pivot: float = 1.0,
                     k: int = 10, boost: float = 1.0,
                     where: dict | None = None, func: str = "saturation",
                     scaling_factor: float = 1.0) -> list[tuple]:
        """ES rank_feature query as an additive should clause over BM25:

          * ``saturation`` (the ES default): boost * (v / (v + pivot))
          * ``log``:     boost * ln(scaling_factor + v)
          * ``sigmoid``: boost * (v*v / (v*v + pivot*pivot)) — the ES
            sigmoid pinned at exponent = 2 so every term is an exact
            float product (a fractional exponent's pow() is not
            correctly rounded the same way across engines, so it can't
            sit in a hash-pinned contract)

        ES derives a default pivot from the index-wide geometric mean;
        here it is explicit for determinism. Docs missing the field
        contribute 0 (the should-clause no-match). One dense pass + one
        vectorized add — float op order pinned per variant for the SQL
        oracle, then + base."""
        if pivot <= 0:
            raise ValueError("pivot must be positive")
        if k <= 0:
            return []
        hits = self._hit_mask(query, where)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        buf = self._dense_scores(query)
        vals, valid = self._numeric_col(field)
        add = np.zeros(idx.size, np.float64)
        v = valid[idx]
        x = vals[idx][v]
        if func == "saturation":
            add[v] = boost * (x / (x + pivot))
        elif func == "log":
            add[v] = boost * np.log(scaling_factor + x)
        elif func == "sigmoid":
            add[v] = boost * ((x * x) / (x * x + pivot * pivot))
        else:
            raise ValueError(
                f"rank_feature func {func!r} (saturation|log|sigmoid)"
            )
        return self._topk_from(idx, buf[idx] + add, k)

    def distance_feature(self, query: str, field: str, origin: float,
                         pivot: float, k: int = 10, boost: float = 1.0,
                         where: dict | None = None) -> list[tuple]:
        """ES distance_feature query over a numeric field: final =
        BM25(query) + boost * (pivot / (pivot + |v - origin|)) — additive
        proximity boost that is ``boost/2`` exactly at distance pivot
        (the ES contract). Missing-field docs add 0. Op order pinned:
        abs-diff, pivot/(pivot+d), * boost, + base."""
        if pivot <= 0:
            raise ValueError("pivot must be positive")
        if k <= 0:
            return []
        hits = self._hit_mask(query, where)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        buf = self._dense_scores(query)
        vals, valid = self._numeric_col(field)
        add = np.zeros(idx.size, np.float64)
        v = valid[idx]
        d = np.abs(vals[idx][v] - origin)
        add[v] = boost * (pivot / (pivot + d))
        return self._topk_from(idx, buf[idx] + add, k)

    def random_score(self, query: str, seed: int = 0, k: int = 10,
                     where: dict | None = None) -> list[tuple]:
        """ES function_score random_score analog — SEEDED and
        deterministic (same seed -> same ranking on any machine, the
        reproducible-sampling contract): factor = first 8 hex chars of
        md5(f"{seed}:{doc_id}") / 2^32 in [0,1), boost_mode=multiply.
        The md5 rule is the ONE implementation the hash-split stage also
        uses (extras.sampling.md5_prefix_u32 — shared so the SQL twin
        stays pinned); the per-hit digest is C-bound and touches the hit
        set only."""
        from .extras.sampling import md5_prefix_u32

        if k <= 0:
            return []
        hits = self._hit_mask(query, where)
        if hits is None:
            return []
        idx = np.flatnonzero(hits)
        if idx.size == 0:
            return []
        buf = self._dense_scores(query)
        fac = md5_prefix_u32(
            [f"{seed}:{d}" for d in idx.tolist()]
        ).astype(np.float64) / 4294967296.0
        scores = buf[idx] * fac
        return self._topk_from(idx, scores, k)

    def mlt_terms(self, doc_id: int, max_query_terms: int = 25,
                  min_term_freq: int = 1, min_doc_freq: int = 2):
        """ES more_like_this term selection: re-analyze the source doc's
        stored text (the ES default when term vectors aren't stored),
        keep terms with tf >= min_term_freq and df >= min_doc_freq, rank
        by tf*idf desc (term asc ties), first max_query_terms."""
        txt = self.get_by_doc_id([int(doc_id)])["text"][0].as_py()
        tf: dict[str, int] = {}
        for t in tokenize_query(txt):
            tf[t] = tf.get(t, 0) + 1
        cands = []
        for term, f in tf.items():
            if f < min_term_freq:
                continue
            p = self.lookup(term)
            if p is None or p.df < min_doc_freq:
                continue
            cands.append((-(f * self.idf(p.df)), term))
        cands.sort()
        return [t for _, t in cands[:max_query_terms]]

    def more_like_this(self, doc_id: int, k: int = 10,
                       max_query_terms: int = 25, min_term_freq: int = 1,
                       min_doc_freq: int = 2, algo: str = "taat", **kw):
        """ES more_like_this query: select the source doc's most
        significant terms (see mlt_terms), run them as an OR query (each
        clause weight 1 — the unboosted ES default), and exclude the
        source doc itself from the page. Ref analog: ES MLT API; the
        selection/scoring spec is pinned SQL-replicably (tf*idf with the
        engine's BM25 idf)."""
        terms = self.mlt_terms(
            doc_id, max_query_terms, min_term_freq, min_doc_freq
        )
        if not terms:
            return []
        hits = self.search(" ".join(sorted(terms)), k=k + 1, algo=algo, **kw)
        return [h for h in hits if h[0] != int(doc_id)][:k]

    def field_caps(self) -> dict:
        """ES _field_caps API analog: docstore columns -> capability
        descriptors (Arrow type; whether the field is the ANALYZED text
        field, a filterable keyword/numeric, or the id), plus index-level
        stats — the schema-discovery call a query UI issues first."""
        schema = pads.dataset(self._docstore_dir).schema
        text_col = self.manifest.get("text_col", "text")
        out = {}
        for f in schema:
            out[f.name] = {
                "type": str(f.type),
                "analyzed": f.name == text_col,
                "searchable": f.name == text_col,
                "filterable": f.name != text_col,
                "positions": bool(self.manifest.get("positions"))
                if f.name == text_col else False,
            }
        return {
            "fields": out,
            "n_docs": self.N,
            "n_terms": self.manifest.get("n_terms"),
            "stopwords": sorted(self.stopwords),
        }

    def termvectors(self, doc_id: int) -> list[tuple]:
        """ES _termvectors API analog: [(term, tf, positions)] for one
        doc, term-ascending. Computed by re-analyzing the stored text —
        the ES path when the mapping stores no term vectors; the SAME
        analyzer (incl. stop filter with position gaps) runs both sides,
        so the output equals the doc's slice of the inverted index
        (pinned by test against decoded positional postings). A
        tombstoned doc raises KeyError — ES _termvectors on a deleted
        doc reports found=false; deleted content must not resurface."""
        from .analysis import tokens_flat

        if int(doc_id) in self._excluded_set:
            raise KeyError(f"document {doc_id} is deleted (tombstoned)")
        texts = self.get_by_doc_id([int(doc_id)])["text"]
        flat, _ = tokens_flat(texts.combine_chunks())
        out: dict[str, list[int]] = {}
        for i, t in enumerate(flat.to_pylist()):
            if self.stopwords and t in self.stopwords:
                continue  # stop slot drops, position gap stays
            out.setdefault(t, []).append(i)
        return [(t, len(ps), ps) for t, ps in sorted(out.items())]

    def explain(self, query: str, doc_id: int) -> dict:
        """ES _explain API analog: per-clause breakdown of one (query,
        doc) BM25 score. Returns {"doc_id", "matched", "score",
        "details": [{term, boost, df, idf, tf, dl, tf_part,
        contribution}]} with clauses in ascending-term order — summing
        the contributions in that order reproduces search()'s score
        bit-for-bit (pinned by test). A tombstoned doc is matched=False
        with no details, like an ES explain against a deleted doc
        resolving to non-matching."""
        if not 0 <= doc_id < self.N:
            raise KeyError(f"doc_id {doc_id} out of range")
        out = {"doc_id": int(doc_id), "matched": False, "score": 0.0,
               "details": []}
        if doc_id in self._excluded_set:
            return out
        qtf = self._qweights(query)
        total = 0.0
        for term in sorted(qtf):
            p = self.lookup(term)
            if p is None:
                continue
            j = int(np.searchsorted(p.doc_ids, doc_id))
            if j >= p.doc_ids.size or p.doc_ids[j] != doc_id:
                continue
            w = self._term_weight(qtf[term], p.df)
            c = w * float(p.tf_part[j])
            total += c
            out["details"].append({
                "term": term,
                "boost": float(qtf[term]),
                "df": int(p.df),
                "idf": self.idf(p.df),
                "tf": int(p.tfs[j]),
                "dl": int(self.dl[doc_id]),
                "tf_part": float(p.tf_part[j]),
                "contribution": c,
            })
        out["matched"] = bool(out["details"])
        out["score"] = total
        return out

    def _partitions_for_keys(self, first_key_values) -> list[dict]:
        """Docstore partitions whose recorded key range may hold any of
        the first-key-col values (manifest lineage: the global sort makes
        each partition a contiguous key range). Pre-min_key manifests
        fall back to all partitions. At 10^5-6 docstore files this is
        what keeps a point get from scanning every parquet footer."""
        import bisect

        parts = self.manifest.get("docstore", {}).get("partitions", [])
        if not parts or "min_key" not in parts[0]:
            return list(parts)
        vals = sorted(first_key_values)
        out = []
        for p in parts:
            lo, hi = p["min_key"][0], p["max_key"][0]
            i = bisect.bisect_left(vals, lo)
            if i < len(vals) and vals[i] <= hi:
                out.append(p)
        return out

    def get(self, keys: list[tuple]) -> pa.Table:
        """Order-preserving multiget by (conv_id, turn_idx). Missing key ->
        KeyError (analog of DaoException, dao/EntityDao.java:241-243).
        Reads ONLY the owning docstore partitions (manifest key ranges),
        like get_by_doc_id — never the whole docstore dataset."""
        import os as _os

        if not keys:
            raise ValueError("get() needs at least one key")
        conv_ids = sorted({k[0] for k in keys})
        parts = self._partitions_for_keys(conv_ids)
        tables = [
            pq.read_table(
                _os.path.join(self.index_dir, p["file"]),
                filters=[("conv_id", "in", conv_ids)],
            )
            for p in parts
        ]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            missing = (keys[0][0], int(keys[0][1])) if keys else None
            raise KeyError(f"document not found: {missing}")
        t = pa.concat_tables(tables)
        index = {}
        cid = t["conv_id"].to_pylist()
        tix = t["turn_idx"].to_pylist()
        for i, key in enumerate(zip(cid, tix)):
            index[key] = i
        doc_ids = t["doc_id"].to_pylist() if "doc_id" in t.column_names else None
        rows = []
        for key in keys:
            key = (key[0], int(key[1]))
            if key not in index:
                raise KeyError(f"document not found: {key}")
            if doc_ids is not None and doc_ids[index[key]] in self._excluded_set:
                raise KeyError(f"document excluded (tombstoned): {key}")
            rows.append(index[key])
        return t.take(pa.array(rows, pa.int64()))

    def get_by_doc_id(self, doc_ids: list[int]) -> pa.Table:
        """Order-preserving multiget by doc_id, partition-pruned via the
        manifest's per-partition doc ranges (lineage metadata)."""
        import os

        wanted = set(int(d) for d in doc_ids)
        parts = [
            p
            for p in self.manifest["docstore"]["partitions"]
            if any(p["min_doc_id"] <= d <= p["max_doc_id"] for d in wanted)
        ]
        tables = []
        for p in parts:
            t = pq.read_table(os.path.join(self.index_dir, p["file"]))
            t = t.filter(pc.is_in(t["doc_id"], pa.array(sorted(wanted), pa.int64())))
            tables.append(t)
        t = pa.concat_tables(tables) if tables else None
        index = {d: i for i, d in enumerate(t["doc_id"].to_pylist())} if t else {}
        rows = []
        for d in doc_ids:
            if int(d) in self._excluded_set:
                raise KeyError(f"document excluded (tombstoned): doc_id={d}")
            if int(d) not in index:
                raise KeyError(f"document not found: doc_id={d}")
            rows.append(index[int(d)])
        return t.take(pa.array(rows, pa.int64()))

    def count_hits(self, query: str | None,
                   where: dict | None = None,
                   terminate_after: int | None = None,
                   mode: str = "or",
                   must_not: str | None = None) -> tuple[int, bool]:
        """ES _count with ``terminate_after``: collect hits in doc_id
        order until the cap, then stop — deterministic here because the
        collection order IS dense doc order, so the capped count is
        exactly ``min(n_hits, cap)`` and ``terminated_early`` is
        ``n_hits > cap``. Returns (count, terminated_early)."""
        hits = self._hit_mask(query, where, mode, must_not)
        n = int(hits.sum()) if hits is not None else 0
        if terminate_after is None or n <= terminate_after:
            return n, False
        return int(terminate_after), True

    def count(self, **where) -> int:
        """Doc count with optional keyword-column equality / range filters
        (ref: index count API, PluginIntegrationITest.java:44-45)."""
        for f in where:
            self._field_usage[f] = self._field_usage.get(f, 0) + 1
        if not where:
            return self.N - int(self.excluded.size)
        ds = pads.dataset(self._docstore_dir)
        expr = _where_expr(where)
        if self.excluded.size:
            expr = expr & ~pads.field("doc_id").isin(self.excluded.tolist())
        return ds.count_rows(filter=expr)


class MultiFieldSearcher:
    """ES multi_match with type=most_fields: one index per FIELD over
    the SAME doc space (the Lucene model — every field is its own
    inverted index with its own df/dl/avgdl statistics); the doc score
    is the sum over fields of boost_f * BM25_f(query, doc).

    Accumulation order is deterministic: fields in ascending name order,
    terms ascending within each field — the op sequence the SQL oracle
    mirrors with sum(... ORDER BY field, term). Ref analog: the
    plugin's multi-property ES documents (ESShape/tags all queryable);
    at scale each field index shards independently and this composes
    per-segment like MultiSearcher."""

    def __init__(self, fields: dict[str, tuple]):
        if not fields:
            raise ValueError("fields must map name -> (Searcher, boost)")
        self.fields = dict(fields)
        ns = {s.N for s, _ in self.fields.values()}
        if len(ns) != 1:
            raise ValueError(
                f"field indexes disagree on doc count: {sorted(ns)} — "
                "multi_match requires one shared doc space"
            )
        self.N = ns.pop()

    def search(self, query: str, k: int = 10,
               where: dict | None = None, must_not: str | None = None,
               match_type: str = "most_fields", tie_breaker: float = 0.0):
        """Top-k [(doc_id, score)].

        ``match_type="most_fields"`` (default): score = sum over fields
        of boost_f * BM25_f — one dense accumulation in (field, term)
        order, the op sequence the SQL oracle mirrors.

        ``match_type="best_fields"``: the ES default multi_match type —
        Lucene DisjunctionMaxQuery. score = max over fields of the
        per-field score + tie_breaker * (sum of the OTHER fields), i.e.
        m + tie_breaker * (total - m) with per-field scores accumulated
        terms-ascending and total summed fields-ascending (op order
        pinned for the oracle). tie_breaker=0 is pure dis_max.

        ``match_type="combined_fields"``: BM25F over one merged
        pseudo-field (boost-weighted tf/dl sums, blended max-df idf) —
        see the branch comment for the pinned op sequence.

        ``where`` / ``must_not`` evaluate against the FIRST field's
        docstore (all fields share one doc space)."""
        if k <= 0:
            return []
        if match_type not in ("most_fields", "best_fields", "cross_fields",
                              "combined_fields"):
            raise ValueError(f"unknown match_type {match_type!r}")
        hit = np.zeros(self.N, dtype=bool)
        if match_type == "combined_fields":
            # ES combined_fields query (Lucene CombinedFieldQuery /
            # BM25F): fields merge into ONE pseudo-field — per doc-term,
            # tf = sum over fields of boost_f * tf_f; per doc,
            # dl = sum of boost_f * dl_f; avgdl from the exact integer
            # per-field token totals; df blends to the max across fields
            # (one idf per term). score = sum over terms ascending of
            # qtf * idf(df_blend) * sat(ctf, cdl) with the BM25
            # saturation evaluated on the COMBINED quantities. Field
            # accumulation order is ascending name (two-operand float
            # adds — order-stable). Op sequence mirrored verbatim in the
            # SQL oracle.
            names = sorted(self.fields)
            first = self.fields[names[0]][0]
            qtf = first._qweights(query)
            cdl = np.zeros(self.N, dtype=np.float64)
            tot_dl = 0.0
            for name in names:
                s, w = self.fields[name]
                cdl += w * s.dl.astype(np.float64)
                tot_dl += w * float(s.manifest["total_dl"])
            cavgdl = tot_dl / self.N
            k1, b = first.k1, first.b
            buf = np.zeros(self.N, dtype=np.float64)
            for term in sorted(qtf):
                ctf = np.zeros(self.N, dtype=np.float64)
                df_blend = 0
                for name in names:
                    s, w = self.fields[name]
                    p = s.lookup(term)
                    if p is None:
                        continue
                    df_blend = max(df_blend, p.df)
                    ids = (
                        p.doc_ids if p.live_mask is None
                        else p.doc_ids[p.live_mask]
                    )
                    tfs = (
                        p.tfs if p.live_mask is None
                        else p.tfs[p.live_mask]
                    )
                    ctf[ids] += w * tfs.astype(np.float64)
                    hit[ids] = True
                if df_blend == 0:
                    continue
                wq = qtf[term] * first.idf(df_blend)
                idx_t = np.flatnonzero(ctf)
                x = ctf[idx_t]
                sat = x * (k1 + 1.0) / (
                    x + k1 * (1.0 - b + b * cdl[idx_t] / cavgdl)
                )
                buf[idx_t] += wq * sat
        elif match_type == "cross_fields":
            # Lucene BlendedTermQuery analog: per TERM, df blends to the
            # max across fields (one idf — the term is one concept split
            # over fields), saturation = max over fields of
            # boost_f * tf_part_f, contribution = blended_w * that max;
            # terms accumulate ascending. Op order pinned for the oracle:
            # sum over terms of w_t * greatest_f(boost_f * sat_f).
            first = self.fields[sorted(self.fields)[0]][0]
            qtf = first._qweights(query)
            buf = np.zeros(self.N, dtype=np.float64)
            for term in sorted(qtf):
                df_blend = 0
                posts = []
                for name in sorted(self.fields):
                    s, boost = self.fields[name]
                    p = s.lookup(term)
                    if p is not None:
                        df_blend = max(df_blend, p.df)
                        posts.append((boost, p))
                if df_blend == 0:
                    continue
                w = qtf[term] * first.idf(df_blend)
                tmp = np.zeros(self.N, dtype=np.float64)
                for boost, p in posts:
                    ids = (
                        p.doc_ids if p.live_mask is None
                        else p.doc_ids[p.live_mask]
                    )
                    tfp = (
                        p.tf_part if p.live_mask is None
                        else p.tf_part[p.live_mask]
                    )
                    np.maximum.at(tmp, ids, boost * tfp)
                    hit[ids] = True
                touched = np.flatnonzero(tmp)
                buf_touched = buf[touched] + w * tmp[touched]
                buf[touched] = buf_touched
        elif match_type == "most_fields":
            buf = np.zeros(self.N, dtype=np.float64)
            for name in sorted(self.fields):
                s, boost = self.fields[name]
                for term, qn, p in s._plist(query):
                    w = boost * s._term_weight(qn, p.df)
                    ids = (
                        p.doc_ids if p.live_mask is None
                        else p.doc_ids[p.live_mask]
                    )
                    tfp = (
                        p.tf_part if p.live_mask is None
                        else p.tf_part[p.live_mask]
                    )
                    buf[ids] += w * tfp
                    hit[ids] = True
        else:
            mx = tot = None
            for name in sorted(self.fields):
                s, boost = self.fields[name]
                fb = np.zeros(self.N, dtype=np.float64)
                for term, qn, p in s._plist(query):
                    w = boost * s._term_weight(qn, p.df)
                    ids = (
                        p.doc_ids if p.live_mask is None
                        else p.doc_ids[p.live_mask]
                    )
                    tfp = (
                        p.tf_part if p.live_mask is None
                        else p.tf_part[p.live_mask]
                    )
                    fb[ids] += w * tfp
                    hit[ids] = True
                if mx is None:
                    mx, tot = fb, fb.copy()
                else:
                    np.maximum(mx, fb, out=mx)
                    tot += fb
            buf = mx + tie_breaker * (tot - mx)
        idx = np.flatnonzero(hit)
        first = self.fields[sorted(self.fields)[0]][0]
        if first.excluded.size:
            idx = idx[~np.isin(idx, first.excluded)]
        if where:
            m = first.filter_mask(**where)
            idx = idx[m[idx]]
        if must_not:
            bm = first._bool_mask(None, must_not)
            if bm is not None:
                idx = idx[bm[idx]]
        return first._topk_from(idx, buf[idx], k)


class QueryRunner:
    """map_batches actor: batch of query rows -> top-k hit rows.

    The distributed query path: ``ray.data`` dataset of queries ->
    ``map_batches(QueryRunner, concurrency=N)`` — one Searcher per actor
    (state loaded once, SURVEY ST5/actor-pool rule).
    """

    def __init__(self, index_dir: str = None, k: int = 10, algo: str = "taat",
                 shared_handle=None):
        self.searcher = (
            SharedSearcher(shared_handle)
            if shared_handle is not None
            else Searcher(index_dir)
        )
        self.k = k
        self.algo = algo

    def _run_one(self, q: str, kind: str):
        """Dispatch one query row by its ``kind`` (the msearch body-type
        analog): 'match' (default BM25), 'phrase', 'query_string'. An
        unknown kind raises — never a silent BM25 fallback."""
        if kind == "phrase":
            return self.searcher.search_phrase(q, k=self.k)
        if kind == "query_string":
            return self.searcher.query_string(q, k=self.k)
        if kind != "match":
            raise ValueError(f"unknown query kind {kind!r}")
        return self.searcher.search(q, k=self.k, algo=self.algo)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = (
            batch["kind"].to_pylist()
            if "kind" in batch.column_names
            else ["match"] * batch.num_rows
        )
        qids, queries, ranks, docs, scores = [], [], [], [], []
        for qid, q, kind in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist(), kinds
        ):
            for rank, (doc_id, score) in enumerate(
                self._run_one(q, kind), start=1
            ):
                qids.append(qid)
                queries.append(q)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "query": pa.array(queries, pa.string()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def run_queries(
    index_dir: str,
    queries: list[str],
    k: int = 10,
    algo: str = "taat",
    concurrency=(1, 8),
    shared_handle=None,
):
    """Run a query set as a Ray Data pipeline; returns a Dataset of hits
    — the ES _msearch analog. Each query may be a plain string (BM25
    match) or a ``(query, kind)`` pair with kind in
    {'match', 'phrase', 'query_string'} (the msearch per-line body type).

    Pass ``shared_handle`` (a SharedIndexHandle) to serve from the shared
    decoded segment — actors then read zero-copy object-store views instead
    of each decoding the postings themselves."""
    import ray.data as rd

    rows = []
    for i, q in enumerate(queries):
        if isinstance(q, tuple):
            rows.append({"query_id": i, "query": q[0], "kind": q[1]})
        else:
            rows.append({"query_id": i, "query": q, "kind": "match"})
    qds = rd.from_items(rows)
    return qds.map_batches(
        QueryRunner,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "k": k,
            "algo": algo,
            "shared_handle": shared_handle,
        },
        batch_format="pyarrow",
        batch_size=max(1, len(queries) // 64) if queries else 1,
        concurrency=concurrency,
    )


class MultiSearcher(SuggestAPI):
    """Segment-sharded search — the multi-node query architecture.

    At 10^12 turns one index is built per doc-range shard (segment); a
    query fans out to per-segment searchers and merges their top-k. BM25
    must use GLOBAL statistics (N, avgdl, df summed across segments — what
    Lucene does across its segments), so scores are identical to a single
    index over the union corpus; tests pin rank+score equality.

    Segments must cover disjoint dense doc_id ranges in segment order
    (segment i's global ids = offset_i + local ids, offsets from cumulative
    N) — which is exactly what building per doc-range partition produces.

    Entries may be index dirs (file-based Searcher per segment) or
    SharedIndexHandle instances (zero-copy SharedSearcher per segment —
    the multi-node query architecture with the decode-once object-store
    path; the shared payload carries raw tfs + block structs so the
    global-stats recompute works identically).
    """

    def __init__(self, index_dirs: list, excluded: list | None = None):
        # ``excluded``: optional per-segment pinned tombstone lists (the
        # point-in-time reader — see segments.open_pit); None entries
        # load from disk as usual. Shared handles carry their exclusions
        # in the decoded payload, so pinning only applies to dir entries.
        if excluded is None:
            excluded = [None] * len(index_dirs)
        if len(excluded) != len(index_dirs):
            raise ValueError("excluded must parallel index_dirs")
        self.segments = []
        for d, ex in zip(index_dirs, excluded):
            if isinstance(d, SharedIndexHandle):
                if ex is not None:
                    raise ValueError(
                        "pinned tombstones require dir segments, not "
                        "SharedIndexHandle"
                    )
                self.segments.append(SharedSearcher(d))
            else:
                self.segments.append(Searcher(d, excluded=ex))
        # analyzer/scoring config must agree across segments: queries are
        # analyzed ONCE with segments[0]'s stop list and scored with its
        # k1/b, so a disagreeing segment would silently get the wrong
        # analysis (mirrors compact_segments' build-config check)
        head = self.segments[0].manifest
        for s in self.segments[1:]:
            for key in ("stopwords", "k1", "b", "text_col"):
                if s.manifest.get(key) != head.get(key):
                    raise ValueError(
                        f"segment {s.index_dir!r} disagrees on {key!r}: "
                        f"{s.manifest.get(key)!r} != {head.get(key)!r} — "
                        "all MultiSearcher segments must share one "
                        "analyzer/scoring config"
                    )
        self.N = sum(s.N for s in self.segments)
        total_dl = sum(s.manifest["total_dl"] for s in self.segments)
        self.avgdl = (total_dl / self.N) if self.N else 0.0
        self.k1 = self.segments[0].k1
        self.b = self.segments[0].b
        self.offsets = np.cumsum([0] + [s.N for s in self.segments])[:-1]
        self._tf_part_cache: dict[tuple[int, str], np.ndarray] = {}

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def _tf_part(self, si: int, term: str, p: Postings) -> np.ndarray:
        """Query-independent factor recomputed against GLOBAL avgdl."""
        key = (si, term)
        cached = self._tf_part_cache.get(key)
        if cached is not None:
            return cached
        seg = self.segments[si]
        tfs = p.tfs.astype(np.float64)
        dls = seg.dl[p.doc_ids].astype(np.float64)
        out = tfs * (self.k1 + 1.0) / (
            tfs + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl)
        )
        self._tf_part_cache[key] = out
        return out

    def _global_weights(self, query: str) -> tuple[list, dict]:
        """(sorted terms, {term: qtf * idf(global df)}) — the sharded-TAAT
        weight set every grouped-scoring feature shares (scores equal the
        single-index run bit-for-bit by the _tf_part/global-avgdl
        recompute)."""
        qtf = self._qweights(query)
        terms = sorted(qtf)
        weights: dict[str, float] = {}
        for term in terms:
            df_g = sum(
                p.df for seg in self.segments
                if (p := seg.lookup(term)) is not None
            )
            if df_g:
                weights[term] = qtf[term] * self.idf(df_g)
        return terms, weights

    def _seg_dense_scores(self, si: int, seg, terms: list,
                          weights: dict) -> np.ndarray:
        """One segment's dense score buffer under GLOBAL weights — the
        sharded twin of Searcher._dense_scores."""
        buf = np.zeros(seg.N, dtype=np.float64)
        for term in terms:
            p = seg.lookup(term)
            if p is not None and term in weights:
                buf[p.doc_ids] += weights[term] * self._tf_part(si, term, p)
        return buf

    def _qweights(self, query: str) -> dict[str, float]:
        """Analyzer-aware clause weights — segments share one analyzer
        config, so the first segment's stop/stem/shingle config is THE
        config (same rules as Searcher._qweights)."""
        seg0 = self.segments[0] if self.segments else None
        if seg0 is not None and seg0.shingle_size > 1:
            qtf2: dict[str, float] = {}
            for sh in query_shingles(tokenize_query(query), seg0.shingle_size):
                qtf2[sh] = qtf2.get(sh, 0.0) + 1.0
            return qtf2
        qtf = parse_query_weights(query)
        stops = seg0.stopwords if seg0 is not None else frozenset()
        if stops:
            qtf = {t: v for t, v in qtf.items() if t not in stops}
        if seg0 is not None and seg0.stemmer:
            from .analysis import apply_stemmer

            stems = apply_stemmer(
                pa.array(sorted(qtf), pa.string()), seg0.stemmer
            ).to_pylist()
            merged: dict[str, float] = {}
            for t, st in zip(sorted(qtf), stems):
                merged[st] = merged.get(st, 0.0) + qtf[t]
            qtf = merged
        return qtf

    def _global_postings(self, si: int, term: str, p: Postings) -> Postings:
        """Per-segment Postings view recomputed against GLOBAL avgdl
        (tf_part + block upper bounds) — what per-segment WAND needs to
        produce globally-correct scores."""
        gp = Postings(
            term, p.df, p.cf, p.doc_ids, p.tfs, p.blocks,
            self._tf_part(si, term, p),
        )
        blk = p.blocks
        mt = blk["max_tf"].astype(np.float64)
        md = blk["min_dl"].astype(np.float64)
        gp.block_ub = mt * (self.k1 + 1.0) / (
            mt + self.k1 * (1.0 - self.b + self.b * md / self.avgdl)
        )
        return gp

    def search(self, query: str, k: int = 10, algo: str = "taat",
               where: dict | None = None, mode: str = "or",
               must_not: str | None = None, offset: int = 0,
               search_after: tuple | None = None,
               min_should_match: int | None = None):
        """Top-k [(global_doc_id, score)] — (score desc, doc_id asc).

        ``min_should_match`` distributes like mode="and": a doc's matched
        terms all live in its owning segment, so the global distinct-term
        count equals the local count and the restriction is a per-segment
        mask.

        algo="wand": block-max WAND runs per segment with GLOBAL term
        weights and global-avgdl factors, then the per-segment top-k heaps
        merge — identical results to the TAAT path and to a single global
        index (pinned by tests). ``where`` applies per-segment keyword
        filters (local docstore masks; scoring stats stay global).

        ``mode="and"`` / ``must_not`` distribute cleanly: every doc lives
        in exactly one segment, so the global conjunction equals the local
        conjunction inside the owning segment.

        Pagination distributes the same way: the ``search_after`` cursor
        (GLOBAL doc-id space) is rebased per segment — scores are global
        (global df weights/avgdl) and segment doc ranges are disjoint, so
        the global after-predicate equals the local one inside each
        segment. Each segment returns its after-page top-k and the driver
        merges k-sized heads — the scatter/gather ES runs across shards.
        ``offset`` fetches per-segment top-(offset+k) and slices the
        merge (ES from/size: deep offsets cost O(offset+k) per shard,
        which is why search_after is the deep-page path there too)."""
        if k <= 0:
            return []
        if offset and search_after is not None:
            raise ValueError("offset and search_after are mutually exclusive")
        g_after = None
        if search_after is not None:
            g_after = (float(search_after[1]), int(search_after[0]))
        inner_k = k + int(offset)
        qtf = self._qweights(query)
        terms = sorted(qtf)
        # global df per term = sum of segment dfs (A3 merged stats)
        seg_postings: list[list] = [[] for _ in self.segments]
        weights: dict[str, float] = {}
        for term in terms:
            df_global = 0
            per_seg = []
            for si, seg in enumerate(self.segments):
                p = seg.lookup(term)
                per_seg.append(p)
                if p is not None:
                    df_global += p.df
            if df_global == 0:
                continue
            weights[term] = qtf[term] * self.idf(df_global)
            for si, p in enumerate(per_seg):
                if p is not None:
                    seg_postings[si].append((term, p))
        if not weights:
            return []
        if mode == "and" and len(weights) < len(terms):
            return []  # a required term is absent from the whole corpus

        if min_should_match is not None and min_should_match > 1:
            if mode != "or":
                raise ValueError(
                    "min_should_match applies to mode='or' queries only"
                )
            if min_should_match > len(weights):
                return []

        def seg_mask(si: int):
            seg = self.segments[si]
            m = seg.filter_mask(**where) if where else None
            if mode == "and" or must_not:
                and_pl = None
                if mode == "and":
                    and_pl = [(t, 1, p) for t, p in seg_postings[si]]
                bm = seg._bool_mask(and_pl, must_not)
                if bm is not None:
                    m = bm if m is None else (m & bm)
            if min_should_match is not None and min_should_match > 1:
                mm = seg._msm_mask(
                    [(t, 1, p) for t, p in seg_postings[si]],
                    min_should_match,
                )
                m = mm if m is None else (m & mm)
            return m

        if algo == "wand":
            merged: list[tuple[int, float]] = []
            for si, plist in enumerate(seg_postings):
                if not plist:
                    continue
                if mode == "and" and len(plist) < len(terms):
                    continue  # this segment lacks a required term entirely
                seg = self.segments[si]
                gplist = [
                    (term, qtf[term], self._global_postings(si, term, p))
                    for term, p in plist
                ]
                off = int(self.offsets[si])
                # rebase the global cursor into this segment's local ids:
                # global_doc > cd  <=>  local_doc > cd - off
                seg_after = (
                    (g_after[0], g_after[1] - off)
                    if g_after is not None else None
                )
                hits = seg._search_wand(
                    gplist, inner_k, weights=weights, mask=seg_mask(si),
                    after=seg_after,
                )
                merged.extend((doc + off, sc) for doc, sc in hits)
            merged.sort(key=lambda h: (-h[1], h[0]))
            return merged[offset:inner_k]
        # score each segment with the global weights, merge candidates
        all_docs, all_scores = [], []
        for si, plist in enumerate(seg_postings):
            if not plist:
                continue
            if mode == "and" and len(plist) < len(terms):
                continue
            seg = self.segments[si]
            buf = np.zeros(seg.N, dtype=np.float64)
            touched = []
            for term, p in plist:  # terms iterate in ascending order
                buf[p.doc_ids] += weights[term] * self._tf_part(si, term, p)
                touched.append(p.doc_ids)
            idx = (
                np.unique(np.concatenate(touched))
                if sum(t.size for t in touched) * 8 < seg.N
                else np.flatnonzero(buf > 0.0)
            )
            if seg.excluded.size:  # per-segment tombstones (local ids)
                idx = idx[~np.isin(idx, seg.excluded)]
            m = seg_mask(si)
            if m is not None:
                idx = idx[m[idx]]
            all_docs.append(idx + self.offsets[si])
            all_scores.append(buf[idx].copy())
        if not all_docs:
            return []
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
        if g_after is not None:
            keep = _after_keep(scores, docs, g_after)
            docs, scores = docs[keep], scores[keep]
        return _topk_pairs(docs, scores, inner_k)[offset:]

    def search_phrase(self, phrase: str, k: int = 10,
                      where: dict | None = None):
        """Sharded exact-phrase top-k under GLOBAL statistics: phrase
        frequencies are computed inside each segment (a phrase never spans
        segments — docs are whole), W sums global-df idfs in slot order,
        and the saturation uses the global avgdl — identical to a single
        positional index over the union corpus (pinned by tests)."""
        if k <= 0:
            return []
        slots = tokenize_query(phrase)
        stops = self.segments[0].stopwords if self.segments else frozenset()
        if stops:
            slots = [(t, i) for i, t in enumerate(slots) if t not in stops]
        if not slots:
            return []
        terms_in_order = (
            [t for t, _ in slots] if slots and isinstance(slots[0], tuple)
            else list(slots)
        )
        uniq = sorted(set(terms_in_order))
        df_g = {t: 0 for t in uniq}
        for seg in self.segments:
            for t in uniq:
                p = seg.lookup(t)
                if p is not None:
                    df_g[t] += p.df
        if any(df_g[t] == 0 for t in uniq):
            return []
        W = 0.0
        for t in terms_in_order:  # slot order == oracle accumulation order
            W += self.idf(df_g[t])
        all_docs, all_scores = [], []
        for si, seg in enumerate(self.segments):
            docs, pf, _ = seg._phrase_freqs(slots)
            if docs.size == 0:
                continue
            if seg.excluded.size:
                keep = ~np.isin(docs, seg.excluded)
                docs, pf = docs[keep], pf[keep]
            if where:
                m = seg.filter_mask(**where)
                keep = m[docs]
                docs, pf = docs[keep], pf[keep]
            if docs.size == 0:
                continue
            pff = pf.astype(np.float64)
            dls = seg.dl[docs].astype(np.float64)
            scores = W * (
                pff * (self.k1 + 1.0)
                / (pff + self.k1 * (1.0 - self.b + self.b * dls / self.avgdl))
            )
            all_docs.append(docs + self.offsets[si])
            all_scores.append(scores)
        if not all_docs:
            return []
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
        return _topk_pairs(docs, scores, k)

    def prefix_docs(self, prefix: str, limit: int = 20,
                    max_expansions: int = 4096) -> list[tuple[int, int]]:
        """Sharded prefix-docs: segments own ascending global id ranges, so
        per-segment first-``limit`` lists concatenate in order and truncate
        — no global materialization. ``max_expansions`` applies per segment
        (keep it above the true expansion for cross-shard determinism)."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, n)
                for d, n in seg.prefix_docs(
                    prefix, limit=limit, max_expansions=max_expansions
                )
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def wildcard_docs(self, pattern: str, limit: int = 20,
                      max_expansions: int = 4096) -> list[tuple[int, int]]:
        """Sharded wildcard-docs: same segment-concatenation argument as
        prefix_docs (ascending disjoint global id ranges); the per-segment
        ``max_expansions`` caveat applies identically."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, n)
                for d, n in seg.wildcard_docs(
                    pattern, limit=limit, max_expansions=max_expansions
                )
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def regexp_docs(self, pattern: str, limit: int = 20,
                    max_expansions: int = 4096) -> list[tuple[int, int]]:
        """Sharded regexp-docs: segment-concatenation like wildcard_docs
        (the per-segment max_expansions caveat applies identically)."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, n)
                for d, n in seg.regexp_docs(
                    pattern, limit=limit, max_expansions=max_expansions
                )
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def terms_set_docs(self, terms: list[str], min_match: int,
                       limit: int = 20) -> list[tuple[int, int]]:
        """Sharded terms_set: a doc lives in exactly one segment, so
        per-segment results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, n)
                for d, n in seg.terms_set_docs(terms, min_match, limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def exists_count(self, field: str) -> int:
        return sum(seg.exists_count(field) for seg in self.segments)

    def span_near_docs(self, terms: list[str], slop: int = 0,
                       limit: int = 20) -> list[tuple[int, int]]:
        """Sharded span_near: chains never cross docs, so per-segment
        results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c)
                for d, c in seg.span_near_docs(terms, slop, limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def span_near_unordered_docs(self, terms: list[str], slop: int = 0,
                                 limit: int = 20) -> list[tuple[int, int]]:
        """Sharded unordered span_near: window tuples never cross docs,
        so per-segment results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c)
                for d, c in seg.span_near_unordered_docs(
                    terms, slop, limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def span_containing_docs(self, big_terms: list[str], slop: int,
                             little: str,
                             limit: int = 20) -> list[tuple[int, int]]:
        """Sharded span_containing: spans never cross docs — per-segment
        results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c) for d, c in seg.span_containing_docs(
                    big_terms, slop, little, limit
                )
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def span_within_docs(self, little: str, big_terms: list[str],
                         slop: int,
                         limit: int = 20) -> list[tuple[int, int]]:
        """Sharded span_within: per-segment concatenation, like every
        span query."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c) for d, c in seg.span_within_docs(
                    little, big_terms, slop, limit
                )
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def span_first_docs(self, term: str, end: int,
                        limit: int = 20) -> list[tuple[int, int]]:
        """Sharded span_first: positions are per-doc, so per-segment
        results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c)
                for d, c in seg.span_first_docs(term, end, limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def span_or_docs(self, terms: list[str],
                     limit: int = 20) -> list[tuple[int, int]]:
        """Sharded span_or: occurrence counts are per-doc, so per-segment
        results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c) for d, c in seg.span_or_docs(terms, limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def span_not_docs(self, include: str, exclude: str, pre: int = 0,
                      post: int = 0, limit: int = 20) -> list[tuple[int, int]]:
        """Sharded span_not: the pre/post window never crosses docs, so
        per-segment results concatenate in ascending global order."""
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, c)
                for d, c in seg.span_not_docs(include, exclude, pre, post,
                                              limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def match_bool_prefix(self, query: str, k: int = 10,
                          where: dict | None = None,
                          max_expansions: int = 4096) -> list[tuple]:
        """Sharded match_bool_prefix, exact vs a single global index:
        term-clause weights use GLOBAL df/avgdl (the _tf_part recompute)
        and the prefix expansion set is the union of per-segment
        expansions re-truncated globally (lossless: a term in the global
        first-``max_expansions`` is in its segment's first-K), so every
        doc's score is bit-identical; per-segment top-k merge. ``where``
        filters hits per segment, mirroring the single-index kwarg."""
        if k <= 0:
            return []
        toks = tokenize_query(query)
        n_sh = self.segments[0].shingle_size if self.segments else 0
        if n_sh > 1:
            toks = query_shingles(toks, n_sh)
        stops = self.segments[0].stopwords if self.segments else frozenset()
        prefix = toks[-1] if toks and toks[-1] not in stops else None
        rest = [t for t in toks[:-1] if t not in stops]
        qtf: dict[str, float] = {}
        for t in rest:
            qtf[t] = qtf.get(t, 0.0) + 1.0
        weights: dict[str, float] = {}
        for term in sorted(qtf):
            df_g = sum(
                p.df for seg in self.segments
                if (p := seg.lookup(term)) is not None
            )
            if df_g:
                weights[term] = qtf[term] * self.idf(df_g)
        exp: list[str] = []
        if prefix is not None:
            exp = sorted({
                t for seg in self.segments
                for t in seg.expand_prefix(prefix, max_expansions)
            })[:max_expansions]
        merged: list[tuple] = []
        for si, seg in enumerate(self.segments):
            buf = np.zeros(seg.N, dtype=np.float64)
            hits = seg._present_mask(sorted(qtf))
            for term in sorted(qtf):
                p = seg.lookup(term)
                if p is None or term not in weights:
                    continue
                buf[p.doc_ids] += weights[term] * self._tf_part(si, term, p)
            if exp:
                pm = seg._present_mask(exp)
                buf[pm] += 1.0
                hits |= pm
            if seg.excluded.size:
                hits[seg.excluded] = False
            if where:
                hits &= seg.filter_mask(**where)
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            off = int(self.offsets[si])
            merged.extend(
                (d + off, s) for d, s in seg._topk_from(idx, buf[idx], k)
            )
        merged.sort(key=lambda e: (-e[1], e[0]))
        return merged[:k]

    def pinned_search(self, ids: list[int], query: str, k: int = 10,
                      where: dict | None = None) -> list[tuple]:
        """Sharded pinned query, exact vs a single global index: pinned
        ids route to their owning segment (offset bisect) and score
        under the global-stats dense pass; organic = self.search minus
        the pinned set. ``where`` filters pinned AND organic hits,
        mirroring the single-index kwarg."""
        if k <= 0:
            return []
        terms, weights = self._global_weights(query)
        bufs: dict[int, np.ndarray] = {}
        fms: dict[int, np.ndarray] = {}
        out: list[tuple] = []
        seen: set[int] = set()
        for d in ids:
            d = int(d)
            if d in seen or not 0 <= d < self.N:
                continue
            seen.add(d)
            si = int(np.searchsorted(self.offsets, d, side="right")) - 1
            seg = self.segments[si]
            loc = d - int(self.offsets[si])
            if seg.excluded.size and bool(np.isin(loc, seg.excluded)):
                continue
            if where:
                if si not in fms:
                    fms[si] = seg.filter_mask(**where)
                if not fms[si][loc]:
                    continue
            if si not in bufs:
                bufs[si] = self._seg_dense_scores(si, seg, terms, weights)
            out.append((d, float(bufs[si][loc]), True))
            if len(out) >= k:
                return out[:k]
        for d, s in self.search(query, k=k + len(seen), where=where):
            if d in seen:
                continue
            out.append((d, s, False))
            if len(out) >= k:
                break
        return out[:k]

    def expand_fuzzy(self, term: str, max_edits: int = 1,
                     prefix_length: int = 0,
                     max_expansions: int = 50,
                     transpositions: bool = False) -> list[tuple[str, int]]:
        """Sharded fuzzy expansion, EXACT vs a single global index: each
        segment returns its own top-``max_expansions`` by (distance,
        term); any term in the global top-K is necessarily in its
        segment's top-K, so merging and re-truncating is lossless (the
        standard distributed top-k argument). A term present in several
        segments has the same distance everywhere."""
        best: dict[str, int] = {}
        for seg in self.segments:
            for t, d in seg.expand_fuzzy(
                term, max_edits, prefix_length, max_expansions,
                transpositions,
            ):
                best[t] = d
        ranked = sorted(best.items(), key=lambda e: (e[1], e[0]))
        return ranked[:max_expansions]

    # --- sharded suggester primitives (SuggestAPI consumes these) ---

    def _total_tokens(self) -> float:
        return float(sum(s.manifest["total_dl"] for s in self.segments))

    def _dict_stats(self, term: str) -> tuple[int, int]:
        """Global (df, cf): per-segment values SUM — disjoint doc spaces,
        exactly Lucene's cross-segment term statistics."""
        df = cf = 0
        for seg in self.segments:
            d, c = seg._dict_stats(term)
            df += d
            cf += c
        return df, cf

    def _suggest_candidates(self, tok: str, max_edits: int,
                            prefix_length: int):
        """Global candidate scan: per-segment scans are UNTRUNCATED, so
        merging (df summed; distance identical — string-only) is exact."""
        agg: dict[str, list] = {}
        for seg in self.segments:
            ts, ds, es = seg._suggest_candidates(tok, max_edits, prefix_length)
            for t, d, e in zip(ts.tolist(), ds.tolist(), es.tolist()):
                cur = agg.get(t)
                if cur is None:
                    agg[t] = [d, e]
                else:
                    cur[0] += d
        if not agg:
            z = np.empty(0)
            return z.astype(str), z.astype(np.int64), z.astype(np.int64)
        terms = np.array(sorted(agg), dtype=object)
        dfs = np.array([agg[t][0] for t in terms], dtype=np.int64)
        dists = np.array([agg[t][1] for t in terms], dtype=np.int64)
        return terms, dfs, dists

    def _completion_rows(self, prefix: str) -> list[tuple]:
        agg: dict[str, int] = {}
        for seg in self.segments:
            for t, d in seg._completion_rows(prefix):
                agg[t] = agg.get(t, 0) + int(d)
        return list(agg.items())

    def _completion_fuzzy_rows(self, prefix: str, fuzziness: int,
                               prefix_length: int) -> list[tuple]:
        """Sharded fuzzy completion rows: per-segment dfs sum exactly
        (same candidate rule everywhere)."""
        agg: dict[str, int] = {}
        for seg in self.segments:
            for t, d in seg._completion_fuzzy_rows(
                prefix, fuzziness, prefix_length
            ):
                agg[t] = agg.get(t, 0) + int(d)
        return list(agg.items())

    def _completion_ctx_rows(self, prefix: str, where: dict) -> list:
        """Sharded context completion rows: per-segment in-context dfs
        (disjoint doc sets) sum exactly."""
        agg: dict[str, int] = {}
        for seg in self.segments:
            for t, c in seg._completion_ctx_rows(prefix, where):
                agg[t] = agg.get(t, 0) + int(c)
        return list(agg.items())

    def _bigram_count(self, a: str, b: str) -> int:
        return sum(seg._bigram_count(a, b) for seg in self.segments)

    def _merged_pairs_hist(self, query: str, date_field: str,
                           calendar_interval: str, term_field: str,
                           where=None, mode="or", must_not=None) -> dict:
        """Two-source composite primitive, sharded: per-segment pair
        histograms sum by (month, value) key — exact pages."""
        total: dict = {}
        for seg in self.segments:
            for k, c in seg._merged_pairs_hist(
                query, date_field, calendar_interval, term_field,
                where, mode, must_not,
            ).items():
                total[k] = total.get(k, 0) + c
        return total

    def _merged_facet_hist(self, query: str, field: str,
                           where=None, mode="or", must_not=None) -> dict:
        """SuggestAPI.composite_agg primitive: UNTRUNCATED per-segment
        value histograms sum (exact, the facet merge) — the shared
        cursor then pages the merged buckets."""
        total: dict = {}
        for seg in self.segments:
            for v, c in seg._facet_hist(
                query, field, where, mode, must_not
            ).items():
                total[v] = total.get(v, 0) + c
        return total

    def _merged_sig_foreground(self, query: str, where=None, mode="or",
                               must_not=None,
                               sample_size: int | None = None
                               ) -> tuple[int, dict]:
        """SuggestAPI.significant_terms primitive: per-segment foreground
        dfs SUM (hit sets are disjoint) — with _dict_stats' global df
        sums the shared JLH loop sees identical inputs to a single
        index. ``sample_size`` bounds each SEGMENT's re-analyzed text
        (the ES per-shard shard_size semantics)."""
        n_hits = 0
        fg: dict[str, int] = {}
        for seg in self.segments:
            nh, f = seg._sig_foreground(
                query, where, mode, must_not, sample_size
            )
            n_hits += nh
            for t, c in f.items():
                fg[t] = fg.get(t, 0) + c
        return n_hits, fg

    def fuzzy_docs(self, term: str, max_edits: int = 1, limit: int = 20,
                   prefix_length: int = 0,
                   max_expansions: int = 50,
                   transpositions: bool = False) -> list[tuple[int, int]]:
        """Sharded fuzzy-docs: the expansion set is computed GLOBALLY
        (exact, above) and then scattered to segments, whose ascending
        global id ranges concatenate in order — unlike prefix_docs, no
        per-segment max_expansions caveat applies."""
        exp = [
            t for t, _ in self.expand_fuzzy(
                term, max_edits, prefix_length, max_expansions,
                transpositions,
            )
        ]
        out: list[tuple[int, int]] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            out.extend(
                (d + off, n) for d, n in seg._docs_for_terms(exp, limit)
            )
            if len(out) >= limit:
                break
        return out[:limit]

    def facet_counts(self, query: str, field: str, size: int = 10,
                     where: dict | None = None, mode: str = "or",
                     must_not: str | None = None,
                     include: str | None = None,
                     exclude: str | None = None,
                     missing: str | None = None,
                     min_doc_count: int = 1) -> list[tuple]:
        """Sharded terms-aggregation, EXACT: segments return UNTRUNCATED
        value histograms (hit sets are disjoint across segments), the
        driver sums and orders — no ES-style shard_size approximation
        error. The per-segment payload is O(field cardinality), not
        O(docs)."""
        total: dict = {}
        for seg in self.segments:
            hist = seg._facet_hist(query, field, where, mode, must_not)
            for v, c in hist.items():
                total[v] = total.get(v, 0) + c
            if missing is not None:
                hits = seg._hit_mask(query, where, mode, must_not)
                if hits is not None:
                    n_m = int(hits.sum()) - sum(hist.values())
                    if n_m:
                        total[missing] = total.get(missing, 0) + n_m
        total = filter_bucket_keys(total, include, exclude)
        if min_doc_count > 1:
            total = {v: c for v, c in total.items()
                     if c >= min_doc_count}
        ranked = sorted(total.items(), key=lambda e: (-e[1], e[0]))
        return ranked[:size]

    def terms_agg_meta(self, query: str, field: str,
                       size: int = 10) -> tuple[list[tuple], int, int]:
        """Sharded terms-agg metadata: untruncated per-segment
        histograms merge exactly, so sum_other_doc_count is exact and
        the error bound is 0 — unlike ES's shard_size truncation (see
        the Searcher twin)."""
        total: dict = {}
        for seg in self.segments:
            for v, c in seg._facet_hist(query, field, None,
                                        "or", None).items():
                total[v] = total.get(v, 0) + c
        ranked = sorted(total.items(), key=lambda e: (-e[1], e[0]))
        top = ranked[:size]
        other = sum(total.values()) - sum(c for _, c in top)
        return top, int(other), 0

    def terms_metric_agg(self, query: str, field: str,
                         metric_field: str, size: int = 10,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> list[tuple]:
        """Sharded terms-ordered-by-metric, EXACT: per-segment
        (doc_count, metric_n, metric_sum) triples are integers over
        disjoint hit sets, so the merge is a component-wise sum and
        the avg_e6 ranking runs once on the global triples — identical
        to the single-index result by construction."""
        total: dict = {}
        for seg in self.segments:
            for v, t in seg._terms_metric_hist(
                query, field, metric_field, where, mode, must_not
            ).items():
                c, n, s = total.get(v, (0, 0, 0))
                total[v] = (c + t[0], n + t[1], s + t[2])
        return Searcher._rank_terms_metric(total, size)

    def rare_terms_agg(self, query: str, field: str,
                       max_doc_count: int = 1, size: int | None = None,
                       where: dict | None = None, mode: str = "or",
                       must_not: str | None = None) -> list[tuple]:
        """Sharded rare_terms, EXACT: untruncated per-segment histograms
        sum BEFORE the max_doc_count cutoff, so rare-ness is a global
        property — a value rare per shard but common overall is
        correctly dropped (the error mode of ES's per-shard filter)."""
        if max_doc_count < 1:
            raise ValueError("max_doc_count must be >= 1")
        total: dict = {}
        for seg in self.segments:
            for v, c in seg._facet_hist(
                query, field, where, mode, must_not
            ).items():
                total[v] = total.get(v, 0) + c
        out = sorted(
            ((v, c) for v, c in total.items() if c <= max_doc_count),
            key=lambda e: (e[1], e[0]),
        )
        return out if size is None else out[:size]

    def terms_stats_agg(self, query: str, field: str, metric: str,
                        size: int = 10, where: dict | None = None,
                        mode: str = "or",
                        must_not: str | None = None) -> list[tuple]:
        """Sharded terms+stats, EXACT: per-segment partials merge —
        counts/sums add, extrema min/max (None-safe)."""
        total: dict = {}
        for seg in self.segments:
            for v, (c, nv, mn, mx, tot) in seg._terms_stats_partials(
                query, field, metric, where, mode, must_not
            ).items():
                if v not in total:
                    total[v] = (c, nv, mn, mx, tot)
                    continue
                c0, nv0, mn0, mx0, t0 = total[v]
                mns = [x for x in (mn0, mn) if x is not None]
                mxs = [x for x in (mx0, mx) if x is not None]
                total[v] = (
                    c0 + c, nv0 + nv,
                    min(mns) if mns else None,
                    max(mxs) if mxs else None,
                    t0 + tot,
                )
        ranked = sorted(total.items(), key=lambda e: (-e[1][0], e[0]))
        return [
            (v, c, nv, mn, mx, tot)
            for v, (c, nv, mn, mx, tot) in ranked[:size]
        ]

    def reverse_nested_agg(self, query: str, child_field: str,
                           parent_field: str, size: int = 10,
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None) -> list[tuple]:
        """Sharded reverse_nested, EXACT: per-segment (child, parent)
        VALUE-pair histograms sum on the driver, so a parent spanning
        segments still counts once per child bucket (distinctness is a
        property of the value-keyed merged histogram, not of any
        segment). Payload O(observed pairs) per segment."""
        total: dict = {}
        for seg in self.segments:
            for k, c in seg._multi_terms_hist(
                query, [child_field, parent_field], where, mode, must_not
            ).items():
                total[k] = total.get(k, 0) + c
        n_docs: dict = {}
        parents: dict = {}
        for (cv, pv), c in total.items():
            n_docs[cv] = n_docs.get(cv, 0) + c
            parents.setdefault(cv, set()).add(pv)
        ranked = sorted(n_docs.items(), key=lambda e: (-e[1], e[0]))[:size]
        return [(v, c, len(parents[v])) for v, c in ranked]

    def significant_keyword_terms(self, query: str, field: str,
                                  size: int = 10,
                                  min_doc_count: int = 3,
                                  where: dict | None = None,
                                  mode: str = "or",
                                  must_not: str | None = None,
                                  background_where: dict | None = None,
                                  heuristic: str = "jlh"
                                  ) -> list[tuple]:
        """Sharded keyword significant_terms, EXACT: per-segment
        foreground/background histograms and counts are integers that
        sum (disjoint doc sets); JLH recomputes from the merged exact
        totals with the single-index op order."""
        fg: dict = {}
        bg: dict = {}
        n_hits = 0
        n_live = 0
        for seg in self.segments:
            sf, sh = seg._keyword_sig_foreground(query, field, where,
                                                 mode, must_not)
            for v, c in sf.items():
                fg[v] = fg.get(v, 0) + c
            n_hits += sh
            sb, sn = seg._field_hist_live(field, background_where)
            for v, c in sb.items():
                bg[v] = bg.get(v, 0) + c
            n_live += sn
        rank = {"chi_square": _chi2_ranked,
                "mutual_information": _mi_ranked}.get(heuristic,
                                                      _jlh_ranked)
        return rank(fg, n_hits, bg, n_live, min_doc_count, size)

    def count_hits(self, query: str | None,
                   where: dict | None = None,
                   terminate_after: int | None = None,
                   mode: str = "or",
                   must_not: str | None = None) -> tuple[int, bool]:
        """Sharded _count with terminate_after — the cap applies PER
        SEGMENT (the ES per-shard semantic), so the sharded result is
        sum(min(seg_hits, cap)) and INTENTIONALLY differs from the
        single-index run when any segment truncates; terminated_early
        is true if any segment hit its cap. This is the one documented
        exception to the repo's sharded==global invariant (pinned by
        test, like ES)."""
        total, term = 0, False
        for seg in self.segments:
            c, t = seg.count_hits(
                query, where, terminate_after, mode, must_not
            )
            total += c
            term = term or t
        return total, term

    def multi_terms_agg(self, query: str, fields: list[str],
                        size: int = 10, where: dict | None = None,
                        mode: str = "or",
                        must_not: str | None = None) -> list[tuple]:
        """Sharded multi_terms, EXACT: per-segment value-tuple histograms
        (disjoint hit sets) sum on the driver; payload O(observed key
        combinations) per segment."""
        if len(fields) < 2:
            raise ValueError("multi_terms needs >= 2 fields")
        total: dict = {}
        for seg in self.segments:
            for k, c in seg._multi_terms_hist(
                query, fields, where, mode, must_not
            ).items():
                total[k] = total.get(k, 0) + c
        ranked = sorted(total.items(), key=lambda e: (-e[1], e[0]))
        return ranked[:size]

    def facet_top_hits(self, query: str, field: str, size: int = 10,
                       top_n: int = 3, where: dict | None = None,
                       mode: str = "or", must_not: str | None = None):
        """Sharded terms + top_hits: bucket selection is the exact global
        facet merge; within each chosen bucket every segment scores its
        hits with GLOBAL-df weights (the sharded-TAAT op sequence, so
        scores equal the single-index run bit-for-bit) and returns a
        top_n head; the driver merges heads per bucket — O(size·top_n)
        per segment, never the hit set."""
        total: dict = {}
        for seg in self.segments:
            for v, c in seg._facet_hist(
                query, field, where, mode, must_not
            ).items():
                total[v] = total.get(v, 0) + c
        ranked = sorted(total.items(), key=lambda e: (-e[1], e[0]))[:size]
        if not ranked:
            return []
        want = [v for v, _ in ranked]
        terms, weights = self._global_weights(query)
        heads: dict = {v: [] for v in want}
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            codes, values = seg._field_codes(field)
            vmap = {v: i for i, v in enumerate(values)}
            off = int(self.offsets[si])
            for v in want:
                code = vmap.get(v)
                if code is None:
                    continue
                idx = np.flatnonzero(hits & (codes == code))
                if idx.size == 0:
                    continue
                scores = buf[idx]
                heads[v].extend(
                    (d + off, s)
                    for d, s in _topk_pairs(idx, scores, top_n)
                )
        return [
            (
                v, c,
                sorted(heads[v], key=lambda h: (-h[1], h[0]))[:top_n],
            )
            for v, c in ranked
        ]

    def _parent_group_stats(self, query: str, parent_field: str,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None) -> dict:
        """Sharded per-parent aggregates: parents span segments, so each
        segment returns UNTRUNCATED groups scored with GLOBAL-df weights
        (the sharded-TAAT op sequence) and the driver merges — sums and
        counts add, maxes max."""
        terms, weights = self._global_weights(query)
        total: dict = {}
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            codes, values = seg._field_codes(parent_field)
            grp = codes[idx]
            keep = grp >= 0
            grp, scores = grp[keep], buf[idx[keep]]
            if grp.size == 0:
                continue
            nvals = len(values)
            sums = np.zeros(nvals, dtype=np.float64)
            np.add.at(sums, grp, scores)
            maxs = np.full(nvals, -np.inf)
            np.maximum.at(maxs, grp, scores)
            cnts = np.bincount(grp, minlength=nvals)
            for g in np.unique(grp):
                v = values[int(g)]
                cur = total.get(v)
                if cur is None:
                    total[v] = [float(sums[g]), float(maxs[g]), int(cnts[g])]
                else:
                    cur[0] += float(sums[g])
                    cur[1] = max(cur[1], float(maxs[g]))
                    cur[2] += int(cnts[g])
        return total

    has_child_search = Searcher.has_child_search
    has_parent_search = Searcher.has_parent_search

    def _children_of_parents(self, pmap: dict, parent_field: str, k: int,
                             child_where: dict | None) -> list[tuple]:
        """Sharded has_parent fetch: each segment selects its own top-k
        children against the GLOBALLY-merged parent scores (scores are
        per-parent constants, so per-segment top-k + a k-way merge is
        exact), doc_ids rebased by the segment offset — O(k) per segment
        lands on the driver, never a hit set."""
        rows: list[tuple] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            rows.extend(
                (d + off, sc, v)
                for d, sc, v in seg._children_of_parents(
                    pmap, parent_field, k, child_where
                )
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def terms_enum(self, prefix: str, size: int = 10,
                   min_df: int = 1) -> list[tuple[str, int]]:
        """Sharded _terms_enum: per-segment UNTRUNCATED prefix rows merge
        by summing dfs per term (the completion-suggester merge), then
        one global term-ascending truncation — min_df applies AFTER the
        merge so segment boundaries never change the result."""
        total: dict = {}
        for seg in self.segments:
            for t, df in seg.terms_enum(prefix, size=1 << 30, min_df=1):
                total[t] = total.get(t, 0) + df
        rows = sorted(
            (t, df) for t, df in total.items() if df >= min_df
        )
        return rows[:size]

    def knn_hybrid_search(self, query: str, knn_hits: list[tuple],
                          k: int = 10,
                          knn_boost: float = 1.0) -> list[tuple]:
        """Sharded hybrid retrieval: knn doc_ids are GLOBAL — each
        segment scores its own slice (global-df weights, the sharded
        TAAT op sequence) plus the knn adds routed by offset, takes a
        local top-k, and the driver merges O(k·segments) rows — scores
        identical to the single-index combine by construction."""
        terms, weights = self._global_weights(query)
        rows: list[tuple] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            hits = seg._hit_mask(query)
            if hits is not None:
                buf = self._seg_dense_scores(si, seg, terms, weights)
                cand = hits.copy()
            else:
                buf = np.zeros(seg.N, dtype=np.float64)
                cand = np.zeros(seg.N, dtype=bool)
            for d, sim in knn_hits:
                ld = d - off
                if 0 <= ld < seg.N:
                    buf[ld] += knn_boost * sim
                    cand[ld] = True
            if seg.excluded.size:
                cand[seg.excluded] = False
            idx = np.flatnonzero(cand)
            if idx.size == 0:
                continue
            sc = buf[idx]
            rows.extend(
                (d + off, s) for d, s in _topk_pairs(idx, sc, k)
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def rrf_multi_search(self, rank_lists: list[list[int]],
                         k: int = 10, rrf_k: int = 60) -> list[tuple]:
        """Sharded N-leg RRF: rank lists carry GLOBAL doc ids already,
        so the fuse is the same pure rank arithmetic as the single
        index — exclusions resolve per owning segment."""
        if k <= 0:
            return []
        if rrf_k < 0:
            raise ValueError("rrf_k must be >= 0")
        fused: dict[int, float] = {}
        for ids in rank_lists:
            for r, d in enumerate(ids, 1):
                d = int(d)
                if not 0 <= d < self.N:
                    continue
                si = int(np.searchsorted(self.offsets, d, "right")) - 1
                seg = self.segments[si]
                if seg.excluded.size and \
                        (d - int(self.offsets[si])) in seg._excluded_set:
                    continue
                fused[d] = fused.get(d, 0.0) + 1.0 / (rrf_k + r)
        out = sorted(fused.items(), key=lambda e: (-e[1], e[0]))
        return out[:k]

    def rrf_search(self, query: str, knn_ranked_ids: list[int],
                   k: int = 10, rank_window: int = 100,
                   rrf_k: int = 60) -> list[tuple]:
        """Sharded RRF, exact vs a single global index: the BM25 list
        is the exact sharded search (rank-identical by construction),
        the knn list is global, and the fuse is pure rank arithmetic —
        so fused scores are bit-identical to the single-index walk."""
        if k <= 0:
            return []
        if rank_window < 1 or rrf_k < 0:
            raise ValueError("rank_window must be >= 1, rrf_k >= 0")
        fused: dict[int, float] = {}
        for r, (d, _) in enumerate(self.search(query, k=rank_window), 1):
            fused[d] = fused.get(d, 0.0) + 1.0 / (rrf_k + r)
        for r, d in enumerate(knn_ranked_ids[:rank_window], 1):
            d = int(d)
            if not 0 <= d < self.N:
                continue
            si = int(np.searchsorted(self.offsets, d, side="right")) - 1
            seg = self.segments[si]
            ld = d - int(self.offsets[si])
            if seg.excluded.size and bool(np.isin(ld, seg.excluded)):
                continue
            fused[d] = fused.get(d, 0.0) + 1.0 / (rrf_k + r)
        out = sorted(fused.items(), key=lambda e: (-e[1], e[0]))
        return out[:k]

    def sparse_vector_search(self, weights: dict,
                             k: int = 10) -> list[tuple]:
        """Sharded sparse_vector, exact vs a single global index: the
        score is a pure per-doc tf dot (no corpus stats), so each
        segment's TAAT is already globally-correct; the global top-k is
        contained in the union of per-segment top-k's. Offset-mapped
        merge, (score desc, doc asc)."""
        if k <= 0:
            return []
        rows: list[tuple] = []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            rows.extend(
                (d + off, s)
                for d, s in seg.sparse_vector_search(weights, k)
            )
        rows.sort(key=lambda e: (-e[1], e[0]))
        return rows[:k]

    def _knn_live(self, knn_hits: list[tuple], rank_window: int):
        """Validity-filter a global knn hit list: in-range, not
        tombstoned in its owning segment."""
        out = []
        for d, s in knn_hits[:rank_window]:
            d = int(d)
            if not 0 <= d < self.N:
                continue
            si = int(np.searchsorted(self.offsets, d, side="right")) - 1
            seg = self.segments[si]
            ld = d - int(self.offsets[si])
            if seg.excluded.size and bool(np.isin(ld, seg.excluded)):
                continue
            out.append((d, float(s)))
        return out

    def linear_retriever_search(self, query: str,
                                knn_hits: list[tuple], k: int = 10,
                                rank_window: int = 100,
                                text_weight: float = 1.0,
                                knn_weight: float = 1.0,
                                normalizer: str = "minmax"
                                ) -> list[tuple]:
        """Sharded linear retriever, exact vs a single global index:
        the text list is the exact sharded search (score- and
        rank-identical), the knn list is global, and the fuse is the
        shared _linear_fuse kernel."""
        if k <= 0:
            return []
        if rank_window < 1:
            raise ValueError("rank_window must be >= 1")
        return _linear_fuse(
            self.search(query, k=rank_window),
            self._knn_live(knn_hits, rank_window),
            text_weight, knn_weight, normalizer, k,
        )

    def _moment_stats(self, query: str, field: str,
                      where: dict | None = None, mode: str = "or",
                      must_not: str | None = None) -> tuple:
        """Sharded t_test sufficient statistics: (n, sum, sum_sq)
        partials add exactly (int sums stay int), so the merged moments
        are bit-identical to the single-index pass."""
        n = 0
        s = 0
        ss = 0
        for seg in self.segments:
            pn, psum, pss = seg._moment_stats(
                query, field, where, mode, must_not
            )
            n += pn
            s += psum
            ss += pss
        return n, s, ss

    t_test_agg = Searcher.t_test_agg

    def search_similarity(self, query: str, k: int = 10,
                          similarity: str = "lmd",
                          mu: float = Searcher.LMD_MU) -> list[tuple]:
        """Sharded similarity-module search: GLOBAL df/cf/N/total-tokens
        feed every segment's accumulate (the _global_weights pattern for
        non-BM25 models), each segment finalizes + takes a local top-k
        with its own dl array, and the driver merges O(k·segments) rows
        — identical to the single-index run by construction."""
        if similarity not in Searcher.SIMILARITIES:
            raise ValueError(f"unknown similarity {similarity!r}")
        qtf = self._qweights(query)
        stats: dict = {}
        for t in qtf:
            df_g = 0
            cf_g = 0
            for seg in self.segments:
                p = seg.lookup(t)
                if p is not None:
                    df_g += int(p.df)
                    cf_g += int(p.cf)
            if df_g:
                stats[t] = (df_g, cf_g)
        TC = self._total_tokens()
        rows: list[tuple] = []
        for si, seg in enumerate(self.segments):
            buf, cnt = seg._sim_accumulate(
                qtf, stats, self.N, TC, similarity, mu
            )
            off = int(self.offsets[si])
            rows.extend(
                (d + off, sc)
                for d, sc in Searcher._sim_finalize(
                    buf, cnt, len(qtf), similarity, k, dl=seg.dl
                )
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def search_indices_boost(self, query: str, boosts: list[float],
                             k: int = 10) -> list[tuple]:
        """ES indices_boost analog: one query over every segment
        (index) with a PER-INDEX score multiplier — the ES knob for
        preferring fresh indices in a rollover chain. Scores are the
        sharded-TAAT global-stats scores times ``boosts[si]``; order
        (boosted score desc, global doc asc). ``boosts`` aligns with
        the segment list; 1.0 everywhere reproduces search() exactly
        (pinned by test). Per-segment top-k + merge — a positive
        constant per segment preserves each segment's internal order,
        so local top-k stays exact."""
        if len(boosts) != len(self.segments):
            raise ValueError("boosts must align with segments")
        if any(b <= 0 for b in boosts):
            raise ValueError("indices_boost factors must be > 0")
        terms, weights = self._global_weights(query)
        if not weights:
            return []
        rows: list[tuple] = []
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query)
            if hits is None:
                continue
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            sc = self._seg_dense_scores(si, seg, terms, weights)[idx] \
                * boosts[si]
            off = int(self.offsets[si])
            rows.extend(
                (d + off, s) for d, s in _topk_pairs(idx, sc, k)
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def _numeric_value_hist(self, query: str, field: str,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None) -> dict:
        """Sharded value histogram: per-segment exact histograms sum —
        so the variable_width DP sees the SAME input as a single index
        and (deterministic tie-breaks) returns the same buckets."""
        total: dict = {}
        for seg in self.segments:
            for v, c in seg._numeric_value_hist(
                query, field, where, mode, must_not
            ).items():
                total[v] = total.get(v, 0) + c
        return total

    variable_width_histogram_agg = Searcher.variable_width_histogram_agg
    validate_query = Searcher.validate_query
    search_min_score = Searcher.search_min_score

    def analyze(self, text: str) -> list[tuple[str, int]]:
        """Sharded _analyze: segments share one analyzer config, so the
        first segment's analyzer IS the analyzer."""
        return self.segments[0].analyze(text)

    def mtermvectors(self, doc_ids: list[int]) -> list[tuple]:
        """Sharded _mtermvectors: each doc routes to its owning segment
        (global-id offsets), input order preserved, missing raises."""
        return [(int(d), self.termvectors(int(d))) for d in doc_ids]

    def shards(self) -> list[dict]:
        """ES _search_shards analog: one descriptor per segment."""
        return [{
            "shard": si,
            "offset": int(self.offsets[si]),
            "n_docs": int(seg.N),
            "live_docs": int(seg.N - seg.excluded.size),
            "index_dir": seg.index_dir,
        } for si, seg in enumerate(self.segments)]

    def scripted_metric(self, query: str, map_script, reduce_script,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None):
        """Sharded scripted_metric — the shape ES actually runs:
        map_script once per SEGMENT (shard) over its own hit-selected
        column views, reduce_script over the list of per-shard states on
        the driver. Payload to the driver is O(segments) states."""
        states = []
        for seg in self.segments:
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None or not hits.any():
                continue

            def fields(name: str, _seg=seg, _hits=hits) -> np.ndarray:
                vals, valid = _seg._numeric_col(name)
                return vals[_hits & valid]

            states.append(map_script(fields))
        return reduce_script(states)

    def _parent_group_stats_ex(self, query: str, parent_field: str,
                               where=None, mode="or", must_not=None):
        """Sharded twin: no reusable single axis exists (per-segment
        buffers) — inner hits run the inherent two-phase fetch (select
        parents globally, then O(k·top_n) heads per segment)."""
        return self._parent_group_stats(
            query, parent_field, where, mode, must_not
        ), None

    def _parent_inner_hits(self, query: str, parent_field: str,
                           parents: list, top_n: int,
                           where=None, mode="or", must_not=None,
                           axis=None) -> dict:
        """Sharded inner_hits: every owning segment returns a top_n head
        per selected parent (global-df weights), the driver merges —
        O(k·top_n) payload per segment (``axis`` unused: two-phase)."""
        terms, weights = self._global_weights(query)
        heads: dict = {v: [] for v in parents}
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            codes, values = seg._field_codes(parent_field)
            vmap = {v: i for i, v in enumerate(values)}
            off = int(self.offsets[si])
            for v in parents:
                code = vmap.get(v)
                if code is None:
                    continue
                idx = np.flatnonzero(hits & (codes == code))
                if idx.size == 0:
                    continue
                heads[v].extend(
                    (d + off, s)
                    for d, s in _topk_pairs(idx, buf[idx], top_n)
                )
        return {
            v: sorted(h, key=lambda e: (-e[1], e[0]))[:top_n]
            for v, h in heads.items() if h
        }

    def search_collapse(self, query: str, field: str, k: int = 10,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> list[tuple]:
        """Sharded field collapsing, EXACT vs a single global index: a
        group (field value) may span segments, so every segment returns
        its UNTRUNCATED per-group best scored with GLOBAL-df weights (the
        sharded-TAAT op sequence — scores bit-identical to the single
        index) and the driver keeps each value's global best, then ranks
        groups. Payload ∝ distinct values per segment, never the hit
        set."""
        terms, weights = self._global_weights(query)
        best: dict = {}
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            codes, values = seg._field_codes(field)
            scores = buf[idx]
            grp = codes[idx]
            order = np.lexsort((idx, -scores))
            _, first = np.unique(grp[order], return_index=True)
            off = int(self.offsets[si])
            for i in order[first]:
                v = values[int(grp[i])] if grp[i] >= 0 else None
                cand = (float(scores[i]), int(idx[i]) + off)
                cur = best.get(v)
                if cur is None or (-cand[0], cand[1]) < (-cur[0], cur[1]):
                    best[v] = cand
        rows = [(d, s, v) for v, (s, d) in best.items()]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def collapse_inner_hits(self, query: str, field: str, k: int = 10,
                            n: int = 3, where: dict | None = None,
                            mode: str = "or",
                            must_not: str | None = None) -> list[tuple]:
        """Sharded collapse + inner_hits, EXACT: groups span segments,
        so every segment returns its per-group top-n scored with
        GLOBAL-df weights (segment hit sets are disjoint, so the global
        per-group top-n is inside the union of per-segment top-ns); the
        driver re-ranks within group and applies the single-index group
        order. Payload ∝ distinct values × n per segment."""
        terms, weights = self._global_weights(query)
        rows: list[tuple] = []
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            codes, values = seg._field_codes(field)
            scores = buf[idx]
            grp = codes[idx]
            order = np.lexsort((idx, -scores, grp))
            g = grp[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(g)) + 1]
            )
            lens = np.diff(np.concatenate([starts, [g.size]]))
            pos = np.arange(g.size) - np.repeat(starts, lens)
            off = int(self.offsets[si])
            for i in order[pos < n]:
                rows.append((
                    values[int(grp[i])] if grp[i] >= 0 else None,
                    int(idx[i]) + off, float(scores[i]),
                ))
        return Searcher._rank_inner_hits(rows, k, n)

    def cardinality_agg(self, query: str, field: str,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> int:
        """Sharded cardinality, EXACT: a count cannot merge (the same
        value may hit in several segments), so segments return their
        distinct-VALUE sets (the untruncated facet histogram's keys —
        O(field cardinality) payload, not O(docs)) and the driver unions.
        ES needs HyperLogLog sketches here only because its per-shard
        payload budget is a fixed few KB; for keyword fields the exact
        set is the same order of magnitude."""
        values: set = set()
        for seg in self.segments:
            values.update(
                seg._facet_hist(query, field, where, mode, must_not).keys()
            )
        return len(values)

    def stats_agg(self, query: str, field: str, where: dict | None = None,
                  mode: str = "or", must_not: str | None = None) -> dict:
        """Sharded stats-aggregation, EXACT: count/min/max/sum are all
        associative merges of per-segment partials (hit sets disjoint),
        so the driver combine is O(segments)."""
        parts = [
            seg.stats_agg(query, field, where, mode, must_not)
            for seg in self.segments
        ]
        parts = [p for p in parts if p["count"] > 0]
        if not parts:
            return {"count": 0, "min": None, "max": None, "sum": 0.0}
        return {
            "count": sum(p["count"] for p in parts),
            "min": min(p["min"] for p in parts),
            "max": max(p["max"] for p in parts),
            "sum": sum(p["sum"] for p in parts),
        }

    def histogram_agg(self, query: str, field: str, interval: float,
                      where: dict | None = None, mode: str = "or",
                      must_not: str | None = None,
                      offset: float = 0.0,
                      min_doc_count: int = 1) -> list[tuple]:
        """Sharded histogram: per-segment bucket maps sum exactly (same
        fixed bucket keys everywhere); payload O(buckets) per segment.
        min_doc_count=0 gap-fills AFTER the merge (global bounds)."""
        total: dict = {}
        for seg in self.segments:
            for key, c in seg.histogram_agg(
                query, field, interval, where, mode, must_not, offset
            ):
                total[key] = total.get(key, 0) + c
        rows = sorted(total.items())
        if min_doc_count == 0 and rows:
            lo = rows[0][0]
            steps = {
                int(round((k - lo) / interval)): c for k, c in rows
            }
            n_axis = max(steps) + 1
            return [
                (float(lo + i * interval), int(steps.get(i, 0)))
                for i in range(n_axis)
            ]
        return rows

    def auto_date_histogram_agg(self, query: str, field: str,
                                target_buckets: int = 10,
                                where: dict | None = None, mode: str = "or",
                                must_not: str | None = None
                                ) -> tuple[int, list[tuple]]:
        """Sharded auto_date_histogram: the interval must come from the
        GLOBAL hit min/max (stats_agg merges them exactly), then the
        fixed-interval histogram sums per segment — identical to the
        single-index choice."""
        if target_buckets < 1:
            raise ValueError("target_buckets must be >= 1")
        ladder = Searcher.AUTO_DATE_LADDER
        st = self.stats_agg(query, field, where, mode, must_not)
        if st["count"] == 0:
            return (ladder[-1], [])
        mn, mx = float(st["min"]), float(st["max"])
        interval = next(
            (i for i in ladder
             if math.floor(mx / i) - math.floor(mn / i) + 1
             <= target_buckets),
            ladder[-1],
        )
        return interval, self.histogram_agg(
            query, field, float(interval), where, mode, must_not
        )

    def extended_stats_agg(self, query: str, field: str,
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None) -> dict:
        """Sharded extended_stats: count/sum/sum_sq SUM and min/max merge
        across segments; variance recomputed from the exact totals —
        identical to the single-index run on integral columns."""
        n = 0
        total = sum_sq = 0
        mn = mx = None
        for seg in self.segments:
            st = seg.extended_stats_agg(query, field, where, mode, must_not)
            if st["count"] == 0:
                continue
            n += st["count"]
            total += st["sum"]
            sum_sq += st["sum_sq"]
            mn = st["min"] if mn is None else min(mn, st["min"])
            mx = st["max"] if mx is None else max(mx, st["max"])
        if n == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0,
                    "sum_sq": 0, "variance": None, "std_dev": None}
        var = (n * sum_sq - total * total) / (n * n)
        return {"count": n, "min": mn, "max": mx, "sum": total,
                "sum_sq": sum_sq, "variance": var,
                "std_dev": math.sqrt(max(var, 0.0))}

    def weighted_avg_agg(self, query: str, field: str, weight_field: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> dict:
        """Sharded weighted_avg: exact numerator/denominator sums."""
        n = 0
        num = den = 0
        for seg in self.segments:
            st = seg.weighted_avg_agg(
                query, field, weight_field, where, mode, must_not
            )
            n += st["count"]
            num += st["num"]
            den += st["den"]
        if n == 0:
            return {"count": 0, "num": 0, "den": 0, "value": None}
        return {"count": n, "num": num, "den": den,
                "value": num / den if den else None}

    def termvectors(self, doc_id: int) -> list[tuple]:
        """Sharded termvectors: route the global id to its owning
        segment (offsets are cumulative segment sizes)."""
        si = int(np.searchsorted(self.offsets, doc_id, side="right")) - 1
        seg = self.segments[si]
        local = int(doc_id) - int(self.offsets[si])
        if not 0 <= local < seg.N:
            raise KeyError(f"doc_id {doc_id} out of range")
        return seg.termvectors(local)

    def range_agg(self, query: str, field: str, ranges: list,
                  where: dict | None = None, mode: str = "or",
                  must_not: str | None = None) -> list[tuple]:
        """Sharded range agg: identical bucket definitions everywhere, so
        per-segment counts sum positionally — exact."""
        segs = [
            seg.range_agg(query, field, ranges, where, mode, must_not)
            for seg in self.segments
        ]
        return [
            (rows[0][0], sum(r[1] for r in rows)) for rows in zip(*segs)
        ]

    def filters_agg(self, query: str, filters: dict,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> list[tuple]:
        """Sharded filters agg: named buckets sum across segments."""
        segs = [
            seg.filters_agg(query, filters, where, mode, must_not)
            for seg in self.segments
        ]
        return [
            (rows[0][0], sum(r[1] for r in rows)) for rows in zip(*segs)
        ]

    def missing_agg(self, query: str, field: str,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> int:
        return sum(
            seg.missing_agg(query, field, where, mode, must_not)
            for seg in self.segments
        )

    def define_runtime_field(self, name: str, expr) -> None:
        """Sharded runtime field: registered on every segment (the ES
        runtime mapping travels with the search, not the index)."""
        for seg in self.segments:
            seg.define_runtime_field(name, expr)

    def date_range_agg(self, query: str, field: str,
                       ranges_iso: list, where: dict | None = None,
                       mode: str = "or",
                       must_not: str | None = None) -> list[tuple]:
        """Sharded date_range: per-segment counts sum per bucket
        (shared _iso_epoch_ranges boundaries)."""
        rows = self.range_agg(
            query, field, _iso_epoch_ranges(ranges_iso),
            where=where, mode=mode, must_not=must_not,
        )
        return [
            (f"{f or '*'}-{t or '*'}", c)
            for (f, t), (_, c) in zip(ranges_iso, rows)
        ]

    def global_stats_agg(self, query: str, field: str) -> dict:
        """Sharded global agg: per-segment buckets sum field-wise (the
        whole-index scope is the union of segment scopes)."""
        out = {"n_hits": 0, "n_global": 0, "n_field": 0,
               "sum_field": 0.0}
        for seg in self.segments:
            g = seg.global_stats_agg(query, field)
            for key in out:
                out[key] += g[key]
        return out

    def sampler_terms_agg(self, query: str, field: str,
                          shard_size: int = 100,
                          size: int = 10) -> list[tuple]:
        """Sharded sampler: the sample is the GLOBAL top shard_size
        (merged global-stats search), then per-segment keyword lookups
        on the sampled docs — identical to the single-index sample."""
        hits = self.search(query, k=shard_size)
        if not hits:
            return []
        from collections import Counter

        cnt: Counter = Counter()
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        si = np.searchsorted(self.offsets, ids, side="right") - 1
        for s_idx in np.unique(si):
            seg = self.segments[int(s_idx)]
            local = ids[si == s_idx] - int(self.offsets[int(s_idx)])
            codes, vocab = seg._field_codes(field)
            cc = codes[local]
            cc = cc[cc >= 0]
            for c, n in zip(*np.unique(cc, return_counts=True)):
                cnt[vocab[int(c)]] += int(n)
        rows = sorted(cnt.items(), key=lambda r: (-r[1], r[0]))
        return rows[:size]

    def random_sampler_terms_agg(self, query: str, field: str,
                                 probability: float = 0.5, seed: int = 0,
                                 size: int = 10,
                                 where: dict | None = None,
                                 mode: str = "or",
                                 must_not: str | None = None) -> tuple:
        """Sharded random_sampler, EXACT vs the single index: each
        segment hashes its hits under their GLOBAL ids (offset passed
        down), so membership in the sample is location-independent;
        per-segment sub-agg histograms are integers over disjoint doc
        sets and sum on the driver. Truncation to ``size`` happens only
        AFTER the merge (untruncated per-segment payloads — the
        rare_terms convention)."""
        total: dict = {}
        n_sampled = 0
        for si, seg in enumerate(self.segments):
            n, rows = seg.random_sampler_terms_agg(
                query, field, probability, seed, size=10**9,
                where=where, mode=mode, must_not=must_not,
                _offset=int(self.offsets[si]),
            )
            n_sampled += n
            for v, c in rows:
                total[v] = total.get(v, 0) + c
        ranked = sorted(total.items(), key=lambda e: (-e[1], e[0]))
        return n_sampled, ranked[:size]

    def children_terms_agg(self, query: str, parent_field: str,
                           field: str, size: int = 10,
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None) -> tuple:
        """Sharded children agg, EXACT: parent VALUE sets union across
        segments BEFORE the step-down (a parent whose matching child
        lives on another shard still pulls this shard's children —
        ES's routing-on-parent guarantee), then per-segment child
        histograms (disjoint doc sets) sum on the driver."""
        vals: set = set()
        for seg in self.segments:
            vals |= seg._matched_parent_values(
                query, parent_field, where, mode, must_not
            )
        total: dict = {}
        n_children = 0
        for seg in self.segments:
            n, hist = seg._children_hist_for_parents(
                parent_field, vals, field
            )
            n_children += n
            for v, c in hist.items():
                total[v] = total.get(v, 0) + c
        ranked = sorted(total.items(), key=lambda e: (-e[1], e[0]))
        return n_children, ranked[:size]

    def adjacency_matrix_agg(self, query: str, filters: dict,
                             where: dict | None = None, mode: str = "or",
                             must_not: str | None = None) -> list[tuple]:
        """Sharded adjacency_matrix: intersections never cross docs, so
        per-segment bucket counts sum by key."""
        total: dict = {}
        for seg in self.segments:
            for key, c in seg.adjacency_matrix_agg(
                query, filters, where, mode, must_not
            ):
                total[key] = total.get(key, 0) + c
        return sorted(total.items())

    def search_by_field(self, query: str, field: str, order: str = "desc",
                        k: int = 10, where: dict | None = None,
                        mode: str = "or", must_not: str | None = None,
                        after: tuple | None = None):
        """Sharded sort-by-field: each segment returns its top-k by the
        field (values are RAW column values, comparable globally — never
        segment-local ranks), the driver merges k-sized heads. Missing-
        field hits fill last in global doc order; a segment pads its page
        with missing hits only when it has fewer than k valued hits, which
        is exactly when the merge could need them."""
        valued, missing = [], []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            seg_after = None
            if after is not None:
                # the doc-id tie leg translates to segment-local ids
                # (global = local + offset), value legs are global
                seg_after = (after[0], int(after[1]) - off)
            for d, v in seg.search_by_field(
                query, field, order, k, where, mode, must_not,
                after=seg_after,
            ):
                (missing if v is None else valued).append((d + off, v))
        valued.sort(key=lambda e: e[0])
        valued.sort(key=lambda e: e[1], reverse=(order == "desc"))
        out = valued[:k]
        if len(out) < k:
            missing.sort(key=lambda e: e[0])
            out.extend(missing[: k - len(out)])
        return out

    def search_geo_distance(self, lat_col: str, lon_col: str,
                            origin: tuple, k: int = 10,
                            radius_km: float | None = None,
                            query: str | None = None,
                            where: dict | None = None, mode: str = "or",
                            must_not: str | None = None):
        """Sharded geo-distance sort: distances are globally comparable
        raw values (same haversine kernel, same origin), so the driver
        merges k-sized per-segment heads exactly — the search_by_field
        merge shape with (dist asc, doc_id asc) keys."""
        valued, missing = [], []
        for si, seg in enumerate(self.segments):
            off = int(self.offsets[si])
            for d, v in seg.search_geo_distance(
                lat_col, lon_col, origin, k, radius_km, query, where,
                mode, must_not,
            ):
                (missing if v is None else valued).append((d + off, v))
        valued.sort(key=lambda e: (e[1], e[0]))
        out = valued[:k]
        if len(out) < k:
            missing.sort(key=lambda e: e[0])
            out.extend(missing[: k - len(out)])
        return out

    def top_metrics(self, query: str, sort_field: str,
                    metric_fields: list[str], size: int = 1,
                    order: str = "desc", where: dict | None = None,
                    mode: str = "or", must_not: str | None = None):
        """Sharded top_metrics: the sharded search_by_field head picks
        the rows (raw values, globally comparable); each row's metrics
        read from its owning segment via offset bisect."""
        rows = [
            (d, v) for d, v in self.search_by_field(
                query, sort_field, order, size, where, mode, must_not
            ) if v is not None
        ]
        out = []
        for d, v in rows:
            si = int(np.searchsorted(self.offsets, d, side="right")) - 1
            seg = self.segments[si]
            loc = d - int(self.offsets[si])
            md = {}
            for m in metric_fields:
                vals, ok = seg._numeric_col(m)
                md[m] = float(vals[loc]) if ok[loc] else None
            out.append((d, v, md))
        return out

    def diversified_top_hits(self, query: str, field: str,
                             max_per_key: int = 1, k: int = 10,
                             where: dict | None = None, mode: str = "or",
                             must_not: str | None = None):
        """Sharded diversified_sampler, exact vs a single global index:
        a globally kept doc has < max_per_key better same-key docs
        anywhere, hence < max_per_key in its own segment — so each
        segment's per-key top-m (+ missing-key hits) candidate set,
        scored under GLOBAL stats, covers the global walk; the driver
        re-ranks the merged candidates and re-applies the per-value
        cutoff. Payload O(keys·m + hits-with-null) per segment."""
        if max_per_key < 1:
            raise ValueError("max_per_key must be >= 1")
        if k <= 0:
            return []
        terms, weights = self._global_weights(query)
        cand: list[tuple] = []
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            scores = buf[idx]
            codes, values = seg._field_codes(field)
            sel = _per_key_rank_keep(idx, scores, codes, max_per_key)
            off = int(self.offsets[si])
            for i in sel:
                c = int(codes[idx[i]])
                cand.append((
                    int(idx[i]) + off, float(scores[i]),
                    None if c < 0 else values[c],
                ))
        cand.sort(key=lambda e: (-e[1], e[0]))
        out = []
        kept: dict = {}
        for d, s, v in cand:
            if v is not None:
                if kept.get(v, 0) >= max_per_key:
                    continue
                kept[v] = kept.get(v, 0) + 1
            out.append((d, s))
            if len(out) >= k:
                break
        return out

    def rank_eval(self, query: str, relevant_where: dict,
                  k: int = 10) -> dict:
        """Sharded rank_eval: the ranking is the exact sharded search;
        relevance membership routes each hit to its owning segment's
        filter mask, and total_relevant sums the per-segment judgment
        counts (tombstones excluded) — identical to the single index."""
        if k <= 0:
            raise ValueError("k must be positive")
        hits = self.search(query, k=k)
        masks = []
        n_rel = 0
        for seg in self.segments:
            m = seg.filter_mask(**relevant_where)
            if seg.excluded.size:
                m = m.copy()
                m[seg.excluded] = False
            masks.append(m)
            n_rel += int(m.sum())

        def is_rel(d: int) -> bool:
            si = int(np.searchsorted(self.offsets, d, side="right")) - 1
            return bool(masks[si][d - int(self.offsets[si])])

        return _rank_eval_metrics(hits, is_rel, n_rel, k)

    def field_usage_stats(self) -> dict[str, int]:
        """Sharded _field_usage_stats: the per-segment counters summed
        (the ES API aggregates per-shard stats the same way)."""
        out: dict[str, int] = {}
        for seg in self.segments:
            for f, n in seg.field_usage_stats().items():
                out[f] = out.get(f, 0) + n
        return dict(sorted(out.items()))

    def date_hist_metric_agg(self, query: str, field: str,
                             calendar_interval: str = "month",
                             metric: str = "n_chars",
                             where: dict | None = None, mode: str = "or",
                             must_not: str | None = None) -> list[tuple]:
        """Sharded date_histogram + sum sub-agg, EXACT: per-segment
        (key, count, int sum) partials add by bucket key on the
        driver; payload O(buckets) per segment."""
        total: dict = {}
        for seg in self.segments:
            for k, c, s in seg.date_hist_metric_agg(
                query, field, calendar_interval, metric,
                where, mode, must_not
            ):
                cc, ss = total.get(k, (0, 0))
                total[k] = (cc + c, ss + s)
        return [(k, *total[k]) for k in sorted(total)]

    def date_histogram_agg(self, query: str, field: str,
                           calendar_interval: str = "day",
                           where: dict | None = None, mode: str = "or",
                           must_not: str | None = None,
                           min_doc_count: int = 1,
                           time_zone_offset_s: int = 0) -> list[tuple]:
        """Sharded date_histogram: calendar bucket keys are global epoch
        values, so per-segment bucket maps sum exactly; payload
        O(buckets) per segment. min_doc_count=0 gap-fills AFTER the
        merge (the global first/last non-empty bounds); the fixed
        time_zone offset shifts per segment identically, so keys agree."""
        total: dict = {}
        for seg in self.segments:
            for key, c in seg.date_histogram_agg(
                query, field, calendar_interval, where, mode, must_not,
                time_zone_offset_s=time_zone_offset_s,
            ):
                total[key] = total.get(key, 0) + c
        rows = sorted(total.items())
        if min_doc_count == 0 and rows:
            unit = {"minute": "m", "hour": "h", "day": "D",
                    "week": "W", "month": "M", "year": "Y"}[
                calendar_interval]
            off = int(time_zone_offset_s)
            axis = calendar_range(
                rows[0][0] + off, rows[-1][0] + off, unit
            ) - off
            filled = dict.fromkeys(axis.tolist(), 0)
            filled.update(dict(rows))
            rows = sorted(filled.items())
        return rows

    def percentiles_agg(self, query: str, field: str,
                        percents: tuple = (25.0, 50.0, 75.0, 95.0, 99.0),
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> dict:
        """Sharded percentiles, EXACT: percentiles don't merge from
        per-segment percentiles, so segments return their (disjoint) hit
        VALUE arrays and the driver sorts the concatenation — an
        O(total hits in field) driver payload, the one aggregation here
        whose exact form cannot be O(segments). At web scale swap this
        for mergeable t-digest sketches (what ES does); exactness is the
        point of this engine's aggregation layer, so the exact form is
        the default and the payload cost is documented rather than
        hidden."""
        parts = []
        for seg in self.segments:
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            vals, valid = seg._numeric_col(field)
            sel = vals[hits & valid]
            if sel.size:
                parts.append(sel)
        if not parts:
            return {float(p): None for p in percents}
        return _percentiles_from_sorted(
            np.sort(np.concatenate(parts)), percents
        )

    def percentile_ranks_agg(self, query: str, field: str,
                             values: tuple, where: dict | None = None,
                             mode: str = "or",
                             must_not: str | None = None) -> dict:
        """Sharded percentile_ranks, EXACT with O(segments·probes)
        payload (unlike percentiles, the CDF partials merge): each
        segment ships (count(v <= x) per probe, n) integers; the
        driver sums and applies the single pinned division."""
        counts = np.zeros(len(values), dtype=np.int64)
        n = 0
        for seg in self.segments:
            c, pn = seg._pr_partials(query, field, values, where,
                                     mode, must_not)
            counts += np.asarray(c, dtype=np.int64)
            n += pn
        if n == 0:
            return {float(x): None for x in values}
        return {
            float(x): int(counts[i]) / n * 100.0
            for i, x in enumerate(values)
        }

    def _hit_values(self, query: str, field: str, where=None, mode="or",
                    must_not=None) -> np.ndarray | None:
        """Concatenated per-segment hit values of a numeric field — the
        shared payload under the exact order-statistic twins
        (percentiles / mad / boxplot); disjoint doc spaces make the
        concatenation THE global value multiset."""
        parts = []
        for seg in self.segments:
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            vals, valid = seg._numeric_col(field)
            sel = vals[hits & valid]
            if sel.size:
                parts.append(sel)
        return np.concatenate(parts) if parts else None

    def value_count_agg(self, query: str, field: str,
                        where: dict | None = None, mode: str = "or",
                        must_not: str | None = None) -> int:
        """Sharded value_count: per-segment counts SUM exactly."""
        return sum(
            seg.value_count_agg(query, field, where, mode, must_not)
            for seg in self.segments
        )

    def median_absolute_deviation_agg(self, query: str, field: str,
                                      where: dict | None = None,
                                      mode: str = "or",
                                      must_not: str | None = None) -> dict:
        """Sharded mad, EXACT: order statistics don't merge, so the
        driver sorts the concatenated hit values (the percentiles_agg
        payload note applies)."""
        sel = self._hit_values(query, field, where, mode, must_not)
        if sel is None:
            return {"count": 0, "median": None, "mad": None}
        med = _percentiles_from_sorted(np.sort(sel), (50.0,))[50.0]
        dev = np.abs(sel - med)
        mad = _percentiles_from_sorted(np.sort(dev), (50.0,))[50.0]
        return {"count": int(sel.size), "median": med, "mad": mad}

    def boxplot_agg(self, query: str, field: str,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> dict:
        """Sharded boxplot, EXACT: driver-sorted concatenated values."""
        sel = self._hit_values(query, field, where, mode, must_not)
        if sel is None:
            return {"count": 0, "min": None, "q1": None, "q2": None,
                    "q3": None, "max": None}
        s = np.sort(sel)
        q = _percentiles_from_sorted(s, (25.0, 50.0, 75.0))
        return {"count": int(sel.size), "min": float(s[0]), "q1": q[25.0],
                "q2": q[50.0], "q3": q[75.0], "max": float(s[-1])}

    def string_stats_agg(self, query: str, field: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> dict:
        """Sharded string_stats, EXACT: per-segment length partials and
        character histograms are integer sums that merge exactly
        (O(alphabet) payload per segment); entropy recomputes from the
        MERGED character histogram in the same ascending-char op order
        as the single index."""
        n = 0
        len_sum = 0
        min_len = None
        max_len = None
        chars: dict[str, int] = {}
        for seg in self.segments:
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            codes, values = seg._field_codes(field)
            sel = codes[hits]
            cnt = np.bincount(sel[sel >= 0], minlength=len(values))
            for v, c in zip(values, cnt):
                if c == 0:
                    continue
                c = int(c)
                n += c
                len_sum += len(v) * c
                min_len = len(v) if min_len is None else min(min_len, len(v))
                max_len = len(v) if max_len is None else max(max_len, len(v))
                for ch in v:
                    chars[ch] = chars.get(ch, 0) + c
        if n == 0:
            return {"count": 0, "min_length": None, "max_length": None,
                    "len_sum": 0, "entropy": None}
        ent = 0.0
        for ch in sorted(chars):
            p = chars[ch] / len_sum
            ent += p * math.log2(p)
        # all-empty-string hit set: single index reports None, not -0.0
        return {"count": n, "min_length": min_len, "max_length": max_len,
                "len_sum": len_sum,
                "entropy": -ent if len_sum else None}

    def matrix_stats_agg(self, query: str, field_x: str, field_y: str,
                         where: dict | None = None, mode: str = "or",
                         must_not: str | None = None) -> dict:
        """Sharded matrix_stats, EXACT for integral columns: the moment
        sums (n, sx, sy, sxx, syy, sxy) are plain integer sums over
        disjoint doc sets, so per-segment partials ADD; derived floats
        recompute from the merged sums with the single-index op
        order."""
        n = 0
        sx = sy = sxx = syy = sxy = 0
        for seg in self.segments:
            part = seg.matrix_stats_agg(
                query, field_x, field_y, where, mode, must_not
            )
            n += part["count"]
            sx += part["sx"]
            sy += part["sy"]
            sxx += part["sxx"]
            syy += part["syy"]
            sxy += part["sxy"]
        base = {"count": 0, "sx": 0, "sy": 0, "sxx": 0, "syy": 0,
                "sxy": 0, "covariance": None, "correlation": None}
        if n == 0:
            return base
        cov_num = n * sxy - sx * sy
        varx_num = n * sxx - sx * sx
        vary_num = n * syy - sy * sy
        corr = (
            cov_num / math.sqrt(varx_num * vary_num)
            if varx_num > 0 and vary_num > 0 else None
        )
        return {"count": n, "sx": sx, "sy": sy, "sxx": sxx, "syy": syy,
                "sxy": sxy, "covariance": cov_num / (n * n),
                "correlation": corr}

    def function_score(self, query: str, field: str, k: int = 10,
                       modifier: str = "log1p", factor: float = 1.0,
                       where: dict | None = None, mode: str = "or",
                       must_not: str | None = None):
        """Sharded function_score: per-segment dense scoring with
        GLOBAL-df weights, the local field factor applied vectorized,
        per-segment top-k heads merged — rescored scores are globally
        comparable because both factors (weights, field values) are."""
        fn = Searcher._FVF_MODIFIERS.get(modifier)
        if fn is None:
            raise ValueError(f"unsupported modifier: {modifier!r}")
        if k <= 0:
            return []
        terms, weights = self._global_weights(query)
        if not weights:
            return []
        merged: list[tuple[int, float]] = []
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where, mode, must_not)
            if hits is None:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            vals, valid = seg._numeric_col(field)
            idx = np.flatnonzero(hits)
            fvf = np.ones(idx.size, np.float64)
            v = valid[idx]
            fvf[v] = fn(factor * vals[idx][v])
            off = int(self.offsets[si])
            merged.extend(
                (d + off, sc)
                for d, sc in seg._topk_from(idx, buf[idx] * fvf, k)
            )
        merged.sort(key=lambda h: (-h[1], h[0]))
        return merged[:k]

    def rank_feature(self, query: str, field: str, pivot: float,
                     k: int = 10, boost: float = 1.0,
                     where: dict | None = None) -> list[tuple]:
        """Sharded rank_feature: per-segment dense BM25 with GLOBAL-df
        weights + the local saturation add (field values are globally
        comparable as-is), per-segment top-k heads merged — bit-identical
        to the single-index run."""
        if pivot <= 0:
            raise ValueError("pivot must be positive")
        if k <= 0:
            return []
        terms, weights = self._global_weights(query)
        if not weights:
            return []
        merged: list[tuple[int, float]] = []
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where)
            if hits is None:
                continue
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            vals, valid = seg._numeric_col(field)
            add = np.zeros(idx.size, np.float64)
            v = valid[idx]
            x = vals[idx][v]
            add[v] = boost * (x / (x + pivot))
            off = int(self.offsets[si])
            merged.extend(
                (d + off, sc)
                for d, sc in seg._topk_from(idx, buf[idx] + add, k)
            )
        merged.sort(key=lambda h: (-h[1], h[0]))
        return merged[:k]

    def distance_feature(self, query: str, field: str, origin: float,
                         pivot: float, k: int = 10, boost: float = 1.0,
                         where: dict | None = None) -> list[tuple]:
        """Sharded distance_feature: same global-weight + local additive
        structure as rank_feature."""
        if pivot <= 0:
            raise ValueError("pivot must be positive")
        if k <= 0:
            return []
        terms, weights = self._global_weights(query)
        if not weights:
            return []
        merged: list[tuple[int, float]] = []
        for si, seg in enumerate(self.segments):
            hits = seg._hit_mask(query, where)
            if hits is None:
                continue
            idx = np.flatnonzero(hits)
            if idx.size == 0:
                continue
            buf = self._seg_dense_scores(si, seg, terms, weights)
            vals, valid = seg._numeric_col(field)
            add = np.zeros(idx.size, np.float64)
            v = valid[idx]
            d = np.abs(vals[idx][v] - origin)
            add[v] = boost * (pivot / (pivot + d))
            off = int(self.offsets[si])
            merged.extend(
                (g + off, sc)
                for g, sc in seg._topk_from(idx, buf[idx] + add, k)
            )
        merged.sort(key=lambda h: (-h[1], h[0]))
        return merged[:k]

    def highlight(self, query: str, k: int = 10, window: int = 3, **kw):
        """Sharded highlight: rank globally, then each owning segment
        locates first matches in ITS positional sidecar and reads ITS
        stored text — O(k) work total, routed like multiget."""
        hits = self.search(query, k=k, **kw)
        if not hits:
            return []
        terms = sorted(self._qweights(query))
        docs = np.array([d for d, _ in hits], np.int64)
        si_arr = np.searchsorted(self.offsets, docs, side="right") - 1
        detail: dict = {}
        for si in np.unique(si_arr):
            seg = self.segments[int(si)]
            sel = si_arr == si
            local = (docs[sel] - int(self.offsets[si])).astype(np.int64)
            fp, ft = seg._first_match(terms, local)
            texts = seg.get_by_doc_id([int(d) for d in local])[
                "text"
            ].to_pylist()
            for g, p, t, txt in zip(docs[sel], fp, ft, texts):
                detail[int(g)] = (int(p), t, _snippet(txt, int(p), window))
        return [(d, sc, *detail[d]) for d, sc in hits]

    def highlight_fragments(self, query: str, k: int = 10,
                            window: int = 3, n_fragments: int = 3,
                            **kw) -> list[tuple]:
        """Sharded multi-fragment highlight: rank globally, each owning
        segment gathers its docs' match positions + text — O(k) total."""
        hits = self.search(query, k=k, **kw)
        if not hits:
            return []
        terms = sorted(self._qweights(query))
        docs = np.array([d for d, _ in hits], np.int64)
        si_arr = np.searchsorted(self.offsets, docs, side="right") - 1
        detail: dict = {}
        for si in np.unique(si_arr):
            seg = self.segments[int(si)]
            sel = si_arr == si
            local = [int(d) - int(self.offsets[si]) for d in docs[sel]]
            matches = seg._all_matches(terms, local)
            texts = seg.get_by_doc_id(local)["text"].to_pylist()
            for g, ld, txt in zip(docs[sel], local, texts):
                frags = []
                next_ok = -1
                for ppos, t in matches[ld]:
                    if ppos < next_ok:
                        continue
                    frags.append((ppos, t, _snippet(txt, ppos, window)))
                    if len(frags) >= n_fragments:
                        break
                    next_ok = ppos + 2 * window + 1
                detail[int(g)] = frags
        return [(d, sc, detail[d]) for d, sc in hits]

    def get_by_global_doc_id(self, doc_ids: list[int]) -> pa.Table:
        """Order-preserving multiget routed to the owning segment."""
        tables = []
        for d in doc_ids:
            si = int(np.searchsorted(self.offsets, d, side="right") - 1)
            local = int(d) - int(self.offsets[si])
            if local >= self.segments[si].N:
                raise KeyError(f"document not found: global doc_id={d}")
            t = self.segments[si].get_by_doc_id([local])
            tables.append(t)
        return pa.concat_tables(tables)


# ---------------------------------------------------------------------------
# shared decoded segment: decode once, zero-copy views in every query actor
# ---------------------------------------------------------------------------


@ray.remote
def _decode_bucket_shared(path: str, k1: float, b: float, avgdl: float, dl):
    """Decode one postings bucket into flat numpy arrays + per-term slices.

    Runs as a Ray task (64 buckets decode in parallel); the returned dict
    lands in the object store where every query actor on the node gets
    ZERO-COPY views — per-actor warmup (varint decode + tf_part compute of
    hot terms, the dominant query-phase cost at 10^7 docs) is paid once
    per node instead of once per actor.
    """
    import os

    from .codec import BLOCK_DTYPE

    if not os.path.exists(path):
        return {"terms": {}, "doc_ids": np.empty(0, np.int64),
                "tf_part": np.empty(0, np.float64),
                "tfs": np.empty(0, np.int32),
                "blocks": np.empty(0, BLOCK_DTYPE),
                "block_ub": np.empty(0, np.float64)}
    t = pq.read_table(path)
    # dl arrives auto-dereferenced (top-level ObjectRef arg) — zero-copy view
    doc_parts, tfp_parts, ub_parts, tf_parts, blk_parts = [], [], [], [], []
    pos_parts = []
    terms: dict[str, tuple] = {}
    p_off = 0
    b_off = 0
    # bulk-convert the columns once (per-cell .as_py() in the loop measured
    # as the decode-phase hot spot at large vocabularies)
    term_l = t["term"].to_pylist()
    doc_b_l = t["doc_bytes"].to_pylist()
    tf_b_l = t["tf_bytes"].to_pylist()
    blk_b_l = t["block_bytes"].to_pylist()
    df_l = t["df"].to_pylist()
    has_pos = "pos_bytes" in t.schema.names
    pos_b_l = t["pos_bytes"].to_pylist() if has_pos else None
    for i in range(t.num_rows):
        term = term_l[i]
        doc_ids, tfs = decode_postings(doc_b_l[i], tf_b_l[i])
        doc_ids = doc_ids.astype(np.int64)
        tfs_f = tfs.astype(np.float64)
        dls = dl[doc_ids].astype(np.float64)
        tf_part = tfs_f * (k1 + 1.0) / (tfs_f + k1 * (1.0 - b + b * dls / avgdl))
        blocks = decode_blocks(blk_b_l[i])
        mt = blocks["max_tf"].astype(np.float64)
        md = blocks["min_dl"].astype(np.float64)
        ub = mt * (k1 + 1.0) / (mt + k1 * (1.0 - b + b * md / avgdl))
        n, nb = doc_ids.size, ub.size
        terms[term] = (p_off, p_off + n, int(df_l[i]), b_off, b_off + nb)
        doc_parts.append(doc_ids)
        tfp_parts.append(tf_part)
        ub_parts.append(ub)
        tf_parts.append(tfs.astype(np.int32))
        blk_parts.append(blocks)
        if has_pos:
            from .codec import segmented_delta_decode, varint_decode

            occ = np.zeros(n, np.int64)
            np.cumsum(tfs[:-1].astype(np.int64), out=occ[1:])
            pos_parts.append(
                segmented_delta_decode(varint_decode(pos_b_l[i]), occ)
            )
        p_off += n
        b_off += nb
    tfs_all = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int32)
    out = {
        "terms": terms,
        "doc_ids": np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64),
        "tf_part": np.concatenate(tfp_parts) if tfp_parts else np.empty(0, np.float64),
        # raw tfs + block structs ride along (int32 + 20 B/block): they let
        # a MultiSearcher over shared segments recompute tf_part/block_ub
        # against GLOBAL stats, and tombstone tightening find block starts
        "tfs": tfs_all,
        "blocks": np.concatenate(blk_parts) if blk_parts else np.empty(0, BLOCK_DTYPE),
        "block_ub": np.concatenate(ub_parts) if ub_parts else np.empty(0, np.float64),
    }
    if has_pos:
        # decoded ABSOLUTE positions + global occurrence prefix: a term's
        # pos slice is pos[occ[p0]:occ[p1]], zero-copy per actor
        occ_all = np.zeros(tfs_all.size + 1, np.int64)
        np.cumsum(tfs_all.astype(np.int64), out=occ_all[1:])
        out["pos"] = (
            np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64)
        )
        out["occ"] = occ_all
    return out


class SharedIndexHandle:
    """Driver-side handle: small — holds only object refs + stats."""

    def __init__(self, index_dir: str):
        import os

        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        if self.manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError("index format mismatch")
        dl = np.zeros(self.manifest["n_docs"], dtype=np.int32)
        norms_dir = os.path.join(index_dir, "norms")
        if os.path.isdir(norms_dir):  # absent only for an empty corpus
            norms = pq.read_table(norms_dir)
            dl[norms["doc_id"].to_numpy()] = norms["dl"].to_numpy()
        self.dl_ref = ray.put(dl)
        from .admin import excluded_docs

        self.excluded = np.array(excluded_docs(index_dir), dtype=np.int64)
        m = self.manifest
        self.bucket_refs = {
            bkt: _decode_bucket_shared.remote(
                os.path.join(index_dir, "postings", f"bucket-{bkt:04d}.parquet"),
                m["k1"], m["b"], m["avgdl"], self.dl_ref,
            )
            for bkt in range(m["term_buckets"])
        }


class SharedSearcher(Searcher):
    """Searcher over a SharedIndexHandle: no file I/O, no per-actor decode —
    all postings are zero-copy views into shared object-store arrays.
    Serves BOTH executors: TAAT (the throughput path) and block-max WAND
    (the skipping path runs on tf_part/block_ub, which the shared decode
    provides)."""

    def __init__(self, handle: SharedIndexHandle):  # noqa: super not called
        m = handle.manifest
        self.index_dir = handle.index_dir
        self.manifest = m
        self.N = m["n_docs"]
        self.avgdl = float(m["avgdl"])
        self.k1 = float(m["k1"])
        self.b = float(m["b"])
        self.num_buckets = m["term_buckets"]
        self.stopwords = frozenset(m.get("stopwords", ()))
        self.stemmer = m.get("stemmer", "")
        self.shingle_size = int(m.get("shingle_size", 0))
        self.prefix_range = tuple(m.get("index_prefixes", ()) or ())
        self.dl = ray.get(handle.dl_ref)
        self._handle = handle
        import os as _os

        # docstore + term-dictionary paths for filter_mask / multiget /
        # suggesters (file-side, column-pruned — like the docstore, these
        # aren't the zero-copy hot scoring path)
        self._docstore_dir = _os.path.join(handle.index_dir, "docstore")
        self._postings_dir = _os.path.join(handle.index_dir, "postings")
        self._buckets: dict[int, dict[str, dict]] = {}
        self._shared_buckets: dict[int, dict] = {}
        self._cache: dict[str, Postings | None] = {}
        self._result_cache: dict[tuple, list] = {}
        self._filter_masks: dict[tuple, np.ndarray] = {}
        self._facet_cols: dict[str, tuple] = {}
        self._numeric_cols: dict[str, tuple] = {}
        self._runtime_fields: dict[str, object] = {}
        self._field_usage: dict[str, int] = {}
        self._blocks_scored = 0
        # tombstones snapshot travels with the handle (all actors see the
        # same exclusion state the handle was built with)
        self.excluded = handle.excluded
        self._excluded_set = set(self.excluded.tolist())

    def _iter_term_arrays(self):
        """Shared-path vocabulary scan: term keys come from the decoded
        shared bucket dicts (zero file I/O)."""
        for bkt in range(self.num_buckets):
            data = self._shared_buckets.get(bkt)
            if data is None:
                data = ray.get(self._handle.bucket_refs[bkt])
                self._shared_buckets[bkt] = data
            yield pa.array(list(data["terms"].keys()), type=pa.string())

    def lookup(self, term: str) -> Postings | None:
        cached = self._cache.get(term)
        if cached is not None or term in self._cache:
            return cached
        bkt = term_bucket_py(term, self.num_buckets)
        data = self._shared_buckets.get(bkt)
        if data is None:
            data = ray.get(self._handle.bucket_refs[bkt])
            self._shared_buckets[bkt] = data
        meta = data["terms"].get(term)
        if meta is None:
            self._cache[term] = None
            return None
        p0, p1, df, b0, b1 = meta
        p = Postings(
            term, df, 0, data["doc_ids"][p0:p1], data["tfs"][p0:p1],
            data["blocks"][b0:b1], data["tf_part"][p0:p1],
        )
        p.block_ub = data["block_ub"][b0:b1]
        if "pos" in data:
            occ = data["occ"]
            p.pos = data["pos"][occ[p0] : occ[p1]]
            p.occ_off = occ[p0 : p1 + 1] - occ[p0]
        self._apply_tombstones(p)
        self._cache[term] = p
        return p

