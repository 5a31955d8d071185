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


def test_esql_refusals(esql_index):
    s = Searcher(esql_index)
    for bad in [
        "FROM x",                                  # no STATS
        "STATS n = COUNT(*)",                      # no FROM
        "FROM x | FROB y | STATS n = COUNT(*)",    # unknown stage
        'FROM x | WHERE text LIKE "a" | STATS n = COUNT(*)',
        "FROM x | STATS n = COUNT(turn_idx)",      # COUNT takes *
        "FROM x | STATS n = SUM(*)",               # SUM takes a column
        "FROM x | STATS n = COUNT(*) | LIMIT x",
        "FROM x | STATS n = COUNT(*) | SORT n SIDEWAYS",
    ]:
        with pytest.raises(ESQLError):
            parse_esql(bad) and execute_esql(s, bad)
