"""Every queries() entry with an oracle must match it exactly at
sf0.001 (fast) — the driver runs the same compare at sf0.01."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    ok, msg = compare(df, ORACLES[name], SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
