"""SQL front-end parity: for the ANSI-portable queries, the SAME SQL
string the DuckDB oracle runs must run verbatim through spark.sql over
registered views and produce exactly the DataFrame API's result --
one definition, three engines/paths agreeing."""

import pytest

import __spark_entry__ as entry
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sql import (
    register_views,
)

from conftest import TESTDATA, normalized_rows

#: oracle SQL that is pure ANSI (no DuckDB list functions / QUALIFY),
#: so it must parse and agree on Spark as well
PORTABLE = [
    "market_share",
    "nation_profit",
    "order_priority_check",
    "disjunctive_revenue",
    "supplier_variety",
    "priority_class_lines",
    "local_supplier_revenue",
    "returned_item_customers",
    "promo_revenue_share",
    "region_revenue",
    "weekly_retention",
]


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_string_matches_dataframe_api(spark, name):
    register_views(spark, TESTDATA)
    sql_df = spark.sql(entry.oracle_sql()[name])
    api_df = entry.queries()[name](spark, TESTDATA)
    assert sorted(sql_df.columns) == sorted(api_df.columns)
    cols = sql_df.columns
    a = normalized_rows(cols, [[r[c] for c in cols] for r in sql_df.collect()])
    b = normalized_rows(cols, [[r[c] for c in cols] for r in api_df.collect()])
    assert a == b
