"""ES|QL subset — parse + compile onto the engine surface.

Pinned: MATCH -> hit mask, comparisons -> wheres, STATS BY -> exact
per-bucket int reductions (AVG = floor-e6 of the exact pair), SORT /
LIMIT over O(buckets) rows; malformed stages refuse loudly.
"""

import numpy as np
import pytest

import ray.data as rd

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.esql import ESQLError, execute_esql, parse_esql
from rayfts.fixtures import generate_transcripts
from rayfts.search import Searcher


@pytest.fixture(scope="module")
def esql_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("esqlidx")
    t = generate_transcripts(40, seed=42).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    build_index(rd.from_arrow(t),
                cfg=IndexJobConfig(index_dir=str(d), term_buckets=8))
    return str(d)


def test_esql_stats_by_matches_bruteforce(esql_index):
    s = Searcher(esql_index)
    q = ('FROM transcripts '
         '| WHERE MATCH(text, "the w0007") AND turn_idx >= 1 '
         '| STATS n = COUNT(*), total = SUM(turn_idx), '
         'top = MAX(turn_idx), low = MIN(turn_idx), a = AVG(turn_idx) '
         'BY role '
         '| SORT n DESC, role ASC')
    t = execute_esql(s, q)
    hits = s._hit_mask("the w0007", {"turn_idx": {"gte": 1.0}})
    codes, values = s._field_codes("role")
    vals, valid = s._numeric_col("turn_idx")
    want = []
    for ci, v in enumerate(values):
        grp = np.flatnonzero(hits & (codes == ci))
        tv = vals[grp][valid[grp]]
        if grp.size:
            want.append({
                "role": v, "n": int(grp.size), "total": int(tv.sum()),
                "top": int(tv.max()), "low": int(tv.min()),
                "a": int(np.floor(float(tv.sum()) / tv.size * 1e6)),
            })
    want.sort(key=lambda r: r["role"])
    want.sort(key=lambda r: r["n"], reverse=True)
    got = t.to_pylist()
    assert got == want and got


def test_esql_scalar_equality_and_limit(esql_index):
    s = Searcher(esql_index)
    t = execute_esql(s, 'FROM x | WHERE role == "user" '
                        '| STATS n = COUNT(*)')
    n_user = int(s._hit_mask(None, {"role": "user"}).sum())
    assert t.to_pylist() == [{"n": n_user}]
    t2 = execute_esql(
        s, 'FROM x | STATS n = COUNT(*) BY tool '
           '| SORT n DESC, tool ASC | LIMIT 2')
    full = execute_esql(
        s, 'FROM x | STATS n = COUNT(*) BY tool '
           '| SORT n DESC, tool ASC')
    assert t2.to_pylist() == full.to_pylist()[:2]


def test_esql_eval_runtime_field(esql_index):
    """EVAL registers a runtime field; STATS over it equals the brute
    force; division refuses (fractional sums are not hash-stable)."""
    s = Searcher(esql_index)
    t = execute_esql(
        s, 'FROM x | WHERE MATCH(text, "the w0007") '
           '| EVAL w = turn_idx * 5 '
           '| STATS total = SUM(w), mx = MAX(w) BY role '
           '| SORT total DESC, role ASC')
    hits = s._hit_mask("the w0007")
    codes, values = s._field_codes("role")
    vals, valid = s._numeric_col("turn_idx")
    want = []
    for ci, v in enumerate(values):
        grp = np.flatnonzero(hits & (codes == ci))
        tv = vals[grp][valid[grp]] * 5
        if grp.size:
            want.append({"role": v, "total": int(tv.sum()),
                         "mx": int(tv.max())})
    want.sort(key=lambda r: r["role"])
    want.sort(key=lambda r: r["total"], reverse=True)
    assert t.to_pylist() == want and want
    with pytest.raises(ESQLError):
        parse_esql("FROM x | EVAL w = turn_idx / 2 "
                   "| STATS n = COUNT(*)")


def test_esql_grok_dissect_derived_columns(esql_index):
    """GROK/DISSECT: captures group in STATS BY exactly like stored
    keyword columns (python-re brute force over the stored text),
    no-match rows form no bucket, derived WHERE equality composes with
    a MATCH, and shadowing / unknown-column / range-filter shapes
    refuse."""
    import re as _re

    import pyarrow.dataset as pads

    from rayfts.ingest import compile_grok

    s = Searcher(esql_index)
    q = ('FROM transcripts '
         '| GROK text "%{WORD:g_w1} %{GREEDYDATA:g_rest}" '
         '| DISSECT conv_id "conv-%{g_cnum}" '
         '| STATS n = COUNT(*) BY g_w1 '
         '| SORT n DESC, g_w1 ASC')
    t = execute_esql(s, q)
    # brute force over the stored docstore text
    doc = pads.dataset(s._docstore_dir).to_table(
        columns=["doc_id", "text"]
    )
    rx = _re.compile(compile_grok("%{WORD:g_w1} %{GREEDYDATA:g_rest}"))
    counts: dict[str, int] = {}
    for txt in doc["text"].to_pylist():
        m = rx.match(txt or "")
        if m:
            counts[m.group("g_w1")] = counts.get(m.group("g_w1"), 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["g_w1"], r["n"]) for r in t.to_pylist()] == want and want

    # derived WHERE equality composes with MATCH; result equals the
    # python-re filter of the MATCH hit set
    hits = s._hit_mask("the")
    doc2 = pads.dataset(s._docstore_dir).to_table(
        columns=["doc_id", "conv_id"]
    )
    conv = dict(zip(doc2["doc_id"].to_pylist(),
                    doc2["conv_id"].to_pylist()))
    probe = conv[int(np.flatnonzero(hits)[0])]  # a conv with hits
    q2 = ('FROM transcripts | DISSECT conv_id "conv-%{g_c}" '
          f'| WHERE MATCH(text, "the") AND g_c == "{probe[5:]}" '
          '| STATS n = COUNT(*)')
    n = execute_esql(s, q2)["n"][0].as_py()
    want_n = sum(1 for d in np.flatnonzero(hits)
                 if conv[int(d)] == probe)
    assert n == want_n and want_n > 0

    for bad in [
        'FROM x | GROK text "%{WORD:conv_id} x" | STATS n = COUNT(*)',
        'FROM x | GROK nosuch "%{WORD:q}" | STATS n = COUNT(*)',
        'FROM x | GROK text "%{NOPE:q}" | STATS n = COUNT(*)',
        'FROM x | GROK text "plain" | STATS n = COUNT(*)',
        'FROM x | DISSECT conv_id "conv-%{g}" | WHERE g >= 3 '
        '| STATS n = COUNT(*)',
    ]:
        with pytest.raises(ESQLError):
            execute_esql(s, bad)


def test_esql_lookup_join(esql_index):
    """LOOKUP JOIN: the bound dict maps the join field's code
    dictionary into a derived keyword column; unmatched keys form no
    bucket; unbound names and stored-column shadowing refuse."""
    import pyarrow.dataset as pads

    s = Searcher(esql_index)
    lk = {"user": "human", "assistant": "model"}  # 'tool' unmatched
    q = ('FROM transcripts | LOOKUP JOIN side ON role '
         '| STATS n = COUNT(*) BY side | SORT side ASC')
    t = execute_esql(s, q, lookups={"side": lk})
    roles = pads.dataset(s._docstore_dir).to_table(
        columns=["role"]
    )["role"].to_pylist()
    want = {}
    for r in roles:
        v = lk.get(r)
        if v is not None:
            want[v] = want.get(v, 0) + 1
    assert {r["side"]: r["n"] for r in t.to_pylist()} == want
    assert set(want) == {"human", "model"}
    with pytest.raises(ESQLError):
        execute_esql(s, q)  # unbound lookup
    with pytest.raises(ESQLError):
        execute_esql(
            s, 'FROM t | LOOKUP JOIN role ON role | STATS n = COUNT(*)',
            lookups={"role": lk},
        )  # shadows a stored column


def test_esql_change_point_command(esql_index):
    """CHANGE_POINT: marks exactly the kernel's detected right-segment
    row with cp_type='step_change' over the key-ascending series
    (before SORT reorders); mis-keyed / unknown-value shapes refuse."""
    from rayfts.search import change_point

    s = Searcher(esql_index)
    q = ('FROM transcripts | STATS n = COUNT(*) BY turn_idx '
         '| CHANGE_POINT n ON turn_idx | SORT n DESC, turn_idx ASC')
    t = execute_esql(s, q)
    rows = t.to_pylist()
    series = sorted((r["turn_idx"], r["n"]) for r in rows)
    want_key = change_point(series)[0]
    marked = [r for r in rows if r["cp_type"] == "step_change"]
    assert len(marked) == 1 and marked[0]["turn_idx"] == want_key
    assert all(r["cp_type"] is None for r in rows
               if r["turn_idx"] != want_key)
    with pytest.raises(ESQLError):
        execute_esql(s, 'FROM t | STATS n = COUNT(*) BY role '
                        '| CHANGE_POINT n ON turn_idx')
    with pytest.raises(ESQLError):
        execute_esql(s, 'FROM t | STATS n = COUNT(*) BY turn_idx '
                        '| CHANGE_POINT zz ON turn_idx')


def test_esql_like_and_in_conditions(esql_index):
    """LIKE resolves *,? over the code dictionary; IN compiles to the
    terms membership; both equal the docstore brute force."""
    import pyarrow.dataset as pads

    s = Searcher(esql_index)
    t = execute_esql(s, 'FROM transcripts '
                        '| WHERE conv_id LIKE "conv-000000?" '
                        'AND role IN ("user", "tool") '
                        '| STATS n = COUNT(*) BY role | SORT role ASC')
    doc = pads.dataset(s._docstore_dir).to_table(
        columns=["conv_id", "role"]
    )
    want: dict = {}
    for cid, role in zip(doc["conv_id"].to_pylist(),
                         doc["role"].to_pylist()):
        if (len(cid) == 12 and cid.startswith("conv-000000")
                and role in ("user", "tool")):
            want[role] = want.get(role, 0) + 1
    assert {r["role"]: r["n"] for r in t.to_pylist()} == want and want
    # no dictionary value matches -> zero rows
    t2 = execute_esql(s, 'FROM transcripts '
                         '| WHERE conv_id LIKE "zz*" '
                         '| STATS n = COUNT(*)')
    assert t2["n"][0].as_py() == 0


def test_esql_derived_columns_do_not_leak(esql_index):
    """GROK/DISSECT/LOOKUP captures are a per-query overlay: after the
    query returns (or raises), the searcher's facet cache has no
    phantom columns — a later BY on the capture name fails instead of
    silently reusing stale codes; bad capture names surface as
    ESQLError, never raw re.error."""
    s = Searcher(esql_index)
    q = ('FROM t | GROK text "%{WORD:g_leak} %{GREEDYDATA:g_r}" '
         '| STATS n = COUNT(*) BY g_leak')
    execute_esql(s, q)
    assert "g_leak" not in s._facet_cols
    with pytest.raises(Exception):  # no such stored column anymore
        execute_esql(s, "FROM t | STATS n = COUNT(*) BY g_leak")
    # cleanup also runs on failure paths
    with pytest.raises(ESQLError):
        execute_esql(s, 'FROM t | DISSECT conv_id "conv-%{g_c}" '
                        '| WHERE g_c >= 3 | STATS n = COUNT(*)')
    assert "g_c" not in s._facet_cols
    # digit-leading capture name: contract error, not re.error
    with pytest.raises(ESQLError):
        execute_esql(s, 'FROM t | GROK text "%{WORD:1bad} x" '
                        '| STATS n = COUNT(*)')


def test_esql_eval_column_rhs(esql_index):
    """EVAL col OP col: the two-column AST resolves both leaves via
    _numeric_col and the derived sums equal the brute force; nulls in
    EITHER column invalidate the row (valid-mask AND)."""
    import pyarrow.dataset as pads

    s = Searcher(esql_index)
    t = execute_esql(s, 'FROM t | EVAL p = turn_idx * turn_idx '
                        '| STATS sp = SUM(p), n = COUNT(*) BY role '
                        '| SORT role ASC')
    doc = pads.dataset(s._docstore_dir).to_table(
        columns=["role", "turn_idx"]
    )
    want: dict = {}
    for role, ti in zip(doc["role"].to_pylist(),
                        doc["turn_idx"].to_pylist()):
        a, b = want.get(role, (0, 0))
        want[role] = (a + (ti * ti if ti is not None else 0), b + 1)
    assert {(r["role"], r["sp"], r["n"]) for r in t.to_pylist()} == \
        {(role, sp, n) for role, (sp, n) in want.items()}


def test_esql_count_distinct(esql_index):
    """COUNT_DISTINCT: exact per-bucket cardinality over dictionary
    codes, nulls excluded; works on keyword AND numeric columns."""
    import pyarrow.dataset as pads

    s = Searcher(esql_index)
    t = execute_esql(s, 'FROM t '
                        '| STATS d = COUNT_DISTINCT(conv_id), '
                        'dn = COUNT_DISTINCT(turn_idx) BY role '
                        '| SORT role ASC')
    doc = pads.dataset(s._docstore_dir).to_table(
        columns=["role", "conv_id", "turn_idx"]
    )
    want: dict = {}
    for role, cid, ti in zip(doc["role"].to_pylist(),
                             doc["conv_id"].to_pylist(),
                             doc["turn_idx"].to_pylist()):
        cs, ts_ = want.setdefault(role, (set(), set()))
        if cid is not None:
            cs.add(cid)
        if ti is not None:
            ts_.add(ti)
    assert {(r["role"], r["d"], r["dn"]) for r in t.to_pylist()} == \
        {(role, len(cs), len(ts_)) for role, (cs, ts_) in want.items()}


def test_esql_median(esql_index):
    """MEDIAN: quantile_cont(0.5) linear interpolation over the valid
    values per bucket, floor(x+0.5)-e6; empty buckets absent."""
    import pyarrow.dataset as pads

    s = Searcher(esql_index)
    t = execute_esql(s, 'FROM t | STATS m = MEDIAN(turn_idx) BY role '
                        '| SORT role ASC')
    doc = pads.dataset(s._docstore_dir).to_table(
        columns=["role", "turn_idx"]
    )
    vals: dict = {}
    for role, ti in zip(doc["role"].to_pylist(),
                        doc["turn_idx"].to_pylist()):
        if ti is not None:
            vals.setdefault(role, []).append(ti)

    def med(v):
        v = sorted(v)
        rank = 0.5 * (len(v) - 1)
        lo = int(rank)
        hi = min(lo + 1, len(v) - 1)
        x = v[lo] + (rank - lo) * (v[hi] - v[lo])
        return int(np.floor(x * 1e6 + 0.5))

    assert {(r["role"], r["m"]) for r in t.to_pylist()} == \
        {(role, med(v)) for role, v in vals.items()}


def test_esql_keep_drop_rename(esql_index):
    """KEEP/DROP/RENAME: presentation stages in pipe order on the
    final table; KEEP defines column order, RENAME AS keeps values,
    unknown columns refuse; SORT keys use pre-RENAME names."""
    s = Searcher(esql_index)
    base = ('FROM t | STATS n = COUNT(*), mx = MAX(turn_idx) BY role '
            '| SORT n DESC, role ASC ')
    ref = execute_esql(s, base)
    t = execute_esql(s, base + '| RENAME n AS total | KEEP role, total')
    assert t.column_names == ["role", "total"]
    assert t["total"].to_pylist() == ref["n"].to_pylist()
    assert t["role"].to_pylist() == ref["role"].to_pylist()
    t2 = execute_esql(s, base + '| DROP mx')
    assert t2.column_names == ["role", "n"]
    for bad in ('| KEEP nope', '| DROP nope',
                '| RENAME nope AS x', '| RENAME n AS role'):
        with pytest.raises(ESQLError):
            execute_esql(s, base + bad)


def test_esql_refusals(esql_index):
    s = Searcher(esql_index)
    for bad in [
        "FROM x",                                  # no STATS
        "STATS n = COUNT(*)",                      # no FROM
        "FROM x | FROB y | STATS n = COUNT(*)",    # unknown stage
        'FROM x | WHERE text ~ "a" | STATS n = COUNT(*)',
        'FROM x | WHERE lang IN (1, 2) | STATS n = COUNT(*)',
        "FROM x | STATS n = COUNT(turn_idx)",      # COUNT takes *
        "FROM x | STATS n = SUM(*)",               # SUM takes a column
        "FROM x | STATS n = COUNT(*) | LIMIT x",
        "FROM x | STATS n = COUNT(*) | SORT n SIDEWAYS",
    ]:
        with pytest.raises(ESQLError):
            parse_esql(bad) and execute_esql(s, bad)
