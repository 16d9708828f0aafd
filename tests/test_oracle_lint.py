"""Oracle-output dtype lint: no wide-integer / DECIMAL cells, ever.

Every driver red to date has been cell CANONICALIZATION, not values:
``lm_score`` (r04/r05) and ``returnflag_unpivot`` (r06) were DECIMAL
output columns; ``price_equidepth_hist`` (r07) was a HUGEINT -- DuckDB
widens ``SUM(BIGINT)``, window-SUM, ``*`` and ``//`` over BIGINT to
int128, so a naked aggregate-arithmetic expression in a SELECT list
silently ships an int128 cell the driver hasher canonicalizes
differently from Spark's BIGINT.  The Spark side is guarded by
``tests/test_plan_sweep.py`` (no DECIMAL output columns); this is the
oracle-side twin: bind every oracle string in DuckDB (types resolve at
bind time -- nothing executes) and reject HUGEINT / UHUGEINT / DECIMAL
result columns.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

_ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_are_hashable(duck, name):
    rel = duck.sql(_ORACLES[name])
    bad = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, map(str, rel.types))
        if any(b in str(typ).upper() for b in _BANNED)
    ]
    assert not bad, (
        f"{name}: oracle output column(s) {bad} have a wide type the "
        "driver hasher canonicalizes engine-specifically -- CAST to "
        "BIGINT/DOUBLE in the SELECT list (r04-r07 red-row family)"
    )
