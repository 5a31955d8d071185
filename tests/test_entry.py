"""Entry-contract hygiene: the driver's gate trusts queries()/oracle_sql()
dict literals, and Python silently keeps the LAST value on a duplicate
key — a collision shadows an implementation without any error."""

import ast
import collections
import os

ENTRY = os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")


def _dict_keys(fn_name: str) -> list[str]:
    """String keys of the CONTRACT dict (the largest dict literal in the
    function — helper literals inside entries are smaller)."""
    tree = ast.parse(open(ENTRY).read())
    best: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys = [
                        k.value for k in sub.keys
                        if isinstance(k, ast.Constant)
                        and isinstance(k.value, str)
                    ]
                    if len(keys) > len(best):
                        best = keys
    return best


def test_no_duplicate_contract_keys():
    for fn in ("queries", "oracle_sql"):
        dup = [k for k, c in collections.Counter(_dict_keys(fn)).items()
               if c > 1]
        assert not dup, f"{fn}() duplicate keys shadow entries: {dup}"


def test_every_oracle_has_a_query():
    q = set(_dict_keys("queries"))
    o = set(_dict_keys("oracle_sql"))
    assert o <= q, f"oracle-only keys (dead SQL): {sorted(o - q)}"
