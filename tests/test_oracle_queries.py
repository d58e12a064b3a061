"""Every registered query must match its DuckDB oracle exactly (the same
gate the driver runs at sf0.01, here at the unit-test SF)."""

from __future__ import annotations

import pytest

from forgottenlandapp_etl_spark.plans import ORACLE, QUERIES

from .oracle import compare, run_oracle

ORACLED = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    got = QUERIES[name](spark, sf_dir)
    want = run_oracle(ORACLE[name], sf_dir)
    compare(got, want, name)


def test_all_queries_have_callables():
    for name in QUERIES:
        assert callable(QUERIES[name])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert df.columns
