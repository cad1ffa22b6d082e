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
