"""Differential test: every registry query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01) so hash
mismatches are caught locally before a round ends.
"""

from __future__ import annotations

import pytest

from dog_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duckdb_con

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_priority_window_leads_registry_order():
    """The driver verifies registry entries in dict order and caps how
    many it checks (50 per round). `_PRIORITY_ORDER` is the single source
    of truth for the window: the registry must lead with exactly that
    list, in that order, with the flagship first.  (Deriving the check
    from the list itself means a rotation can never strand a stale
    duplicate of it here.)"""
    from dog_data_pipeline_spark.queries import _PRIORITY_ORDER

    names = list(REGISTRY)
    assert len(_PRIORITY_ORDER) == len(set(_PRIORITY_ORDER)) == 50
    assert names[: len(_PRIORITY_ORDER)] == _PRIORITY_ORDER
    assert _PRIORITY_ORDER[0] == "flagship_segment_stats"


def test_registry_landing_gate_bench_artifact_covers_every_query():
    """Landing gate (round-3 lesson: a 553s query shipped in an
    end-of-round snapshot with no builder-run bench entry): every
    registry query must appear in the latest committed local bench
    artifact with a non-negative timing. Adding a query without
    re-running `python bench.py` and committing BENCH_LOCAL_r*.json
    fails this test."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    locals_ = {
        int(m.group(1)): p
        for p in root.glob("BENCH_LOCAL_r*.json")
        if (m := re.fullmatch(r"BENCH_LOCAL_r(\d+)\.json", p.name))
    }
    assert locals_, "no BENCH_LOCAL_r*.json artifact committed"
    latest = locals_[max(locals_)]
    bench = json.loads(latest.read_text())["queries"]
    missing = sorted(set(REGISTRY) - set(bench))
    assert not missing, f"queries missing from {latest.name}: {missing}"
    slow = {n: t for n, t in bench.items() if n in REGISTRY and t < 0}
    assert not slow, f"queries recorded as FAILED in {latest.name}: {slow}"
