"""Every registered query key vs its DuckDB oracle at sf0.001.

Local mirror of the driver's CORRECTNESS gate; keys without an oracle
get the rows-only check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.util_oracle import compare, duck_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_vs_oracle(key, spark, sf_dir, con):
    df = QUERIES[key](spark, sf_dir)
    sql = ORACLES.get(key)
    if sql is None:
        assert len(df.collect()) >= 0  # rows-only contract
        return
    compare(df, con, sql, key)
