"""Driver-contract smoke tests: entry() runs, every queries() entry
returns a DataFrame at sf0.001, and oracle_sql() keys ⊆ queries() keys."""

import importlib

import pytest


@pytest.fixture(scope="module")
def contract():
    mod = importlib.import_module("__spark_entry__")
    return mod


def test_entry_returns_rows(spark, contract):
    df = contract.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset(contract):
    q = contract.queries()
    o = contract.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_all_queries_run_small(spark, contract, sf_dir):
    q = contract.queries()
    assert len(q) >= 16
    for name, fn in q.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
