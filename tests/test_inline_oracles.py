"""The committed inline-oracle fixture (tests/golden/inline_oracles.json)
must stay in lockstep with the pure-Python golden twins that generated
it — otherwise the driver's VALUES-literal oracles for the synthetic-
corpus queries would silently pin a stale expectation.

Spark-free on purpose: tools/gen_inline_oracles.py does the full
golden==spark bit-exact cross-check; this test only guards the
fixture-vs-golden half so it can run in seconds on every pytest pass.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "golden", "inline_oracles.json")


def test_fixture_matches_golden_twins():
    from tools.check_oracles import rowset
    from tools.gen_inline_oracles import GOLDEN

    with open(FIXTURE) as f:
        fixture = json.load(f)
    assert sorted(fixture) == sorted(GOLDEN), (
        "fixture and generator cover different queries — rerun "
        "python tools/gen_inline_oracles.py")
    for name, golden_fn in GOLDEN.items():
        cols, rows = golden_fn()
        spec = fixture[name]
        assert spec["columns"] == cols, f"{name}: column drift"
        assert rowset(cols, rows) == rowset(
            spec["columns"], spec["rows"]), (
            f"{name}: golden twin and committed fixture disagree — "
            "rerun python tools/gen_inline_oracles.py (it re-verifies "
            "against Spark before writing)")


def test_sql_literal_rendering_round_trips():
    """The VALUES rendering must survive DuckDB's parser bit-exact —
    the regression here was a bare decimal literal being typed
    DECIMAL(w,s) before the DOUBLE cast, which dropped the last ulp."""
    import duckdb

    import __spark_entry__ as E

    sqls = E._inline_oracles()
    with open(FIXTURE) as f:
        fixture = json.load(f)
    con = duckdb.connect()
    for name, spec in fixture.items():
        got = con.execute(sqls[name]).fetchall()
        want = [tuple(r) for r in spec["rows"]]
        assert sorted(map(repr, got)) == sorted(map(repr, want)), name
