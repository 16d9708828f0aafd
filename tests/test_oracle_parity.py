"""Every queries() entry with an oracle must match DuckDB on the same
parquet -- the local mirror of the driver's CORRECTNESS gate."""

import pytest

import __spark_entry__ as entry

from conftest import ORACLE_SF, compare_query


ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    qfn = entry.queries()[name]
    compare_query(spark, duck, qfn, ORACLES[name], ORACLE_SF)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert "discrepancy_amount" in df.columns


def test_every_query_has_callable():
    qs = entry.queries()
    for name in ORACLES:
        assert name in qs, f"oracle {name} has no queries() entry"
