"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (sf0.01) at the smoke scale
factor for fast iteration; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to run at the gate scale.
"""

from __future__ import annotations

import pytest

from gomrjob_spark import plans
from gomrjob_spark.oracle import compare, run_oracle


def _oracle_names() -> list[str]:
    return sorted(plans.ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, sf_dir, name):
    from gomrjob_spark.cache import release_scoped

    try:
        spark_df = plans.QUERIES[name](spark, sf_dir)
        oracle_df = run_oracle(plans.ORACLES[name], sf_dir)
        compare(spark_df, oracle_df, name=name)
    finally:
        # ~115 queries share this session: release operator-scoped
        # persists per query or they accumulate and evict each other
        release_scoped()


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    for name, fn in plans.QUERIES.items():
        if name in plans.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
        from gomrjob_spark.cache import release_scoped

        release_scoped()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
