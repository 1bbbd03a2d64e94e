"""Registry-integrity guards for the driver contract.

Round-7 ADVICE (medium): the old single QUERIES dict literal carried 10
duplicate keys which Python silently collapsed, so the first-50 driver
window held different queries than the header comment claimed. These
tests make that class of defect loud: the _ALL literal must have unique
keys, the window/tail partition must be exact, and the runtime QUERIES
must contain exactly as many entries as the source literal spells out.
"""

import ast
from pathlib import Path

CONTRACT = Path(__file__).resolve().parents[1] / "datamine_v2_0_spark" / "contract.py"


def _literal_nodes():
    tree = ast.parse(CONTRACT.read_text())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", None):
            out[node.target.id] = node.value
    return out


def test_all_literal_has_no_duplicate_keys():
    nodes = _literal_nodes()
    d = nodes["_ALL"]
    keys = [ast.literal_eval(k) for k in d.keys]
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate keys in _ALL literal: {dupes}"


def test_runtime_queries_matches_literal_count():
    from datamine_v2_0_spark.contract import QUERIES

    nodes = _literal_nodes()
    n_literal = len(nodes["_ALL"].keys)
    assert len(QUERIES) == n_literal, (
        f"QUERIES has {len(QUERIES)} entries but the _ALL literal spells "
        f"out {n_literal} — a duplicate key is being silently collapsed"
    )


def test_window_is_first_50_of_queries():
    from datamine_v2_0_spark.contract import QUERIES, WINDOW_R13

    assert len(WINDOW_R13) == 50
    assert list(QUERIES)[:50] == WINDOW_R13


def test_window_literal_lists_are_duplicate_free():
    nodes = _literal_nodes()
    for name in ("WINDOW_R13", "_TAIL_R13"):
        names = [ast.literal_eval(e) for e in nodes[name].elts]
        assert len(names) == len(set(names)), f"duplicates in {name}"
