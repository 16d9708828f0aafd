"""Banded global prefix sum (operators/prefix.py) and its ABC query."""

from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.prefix import (
    banded_cumsum,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k string, v decimal(18,2)")


def test_banded_cumsum_equals_global_window(spark):
    """The segmented form must reproduce the single global window
    bit-for-bit (exact decimals), including bands with one row, many
    rows, ties inside a band, and gaps in the band range."""
    rows = [
        ("a", Decimal("900.00")),   # band -2 (decade 2)
        ("b", Decimal("850.00")),
        ("c", Decimal("850.00")),   # tie with b -> order by key
        ("d", Decimal("99.99")),    # band -1
        ("e", Decimal("5.25")),     # band 0 (gap: no band for decade 1... )
        ("f", Decimal("0.50")),     # band 1
    ]
    df = _frame(spark, rows)
    band = (-F.floor(F.log10(F.col("v").cast("double")))).cast("int")
    got, total = banded_cumsum(
        df, "v", [F.col("v").desc(), F.col("k").asc()], band
    )
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted((r.k, r.cum) for r in got.collect()) == sorted(
        (r.k, r.cum) for r in want.collect()
    )
    assert total == sum((v for _, v in rows), Decimal(0))


def test_banded_cumsum_single_band(spark):
    """Degenerate banding (everything in one band) still correct --
    the offset table is a single zero row."""
    df = _frame(spark, [("a", Decimal("3.00")), ("b", Decimal("1.00"))])
    got, total = banded_cumsum(df, "v", [F.col("v").desc()], F.lit(0))
    vals = {r.k: r.cum for r in got.collect()}
    assert vals["a"] == Decimal("3.00") and vals["b"] == Decimal("4.00")
    assert total == Decimal("4.00")


def test_abc_query_avoids_global_window(spark):
    """The scale contract: the plan must contain NO window without a
    partition key (windowspecdefinition listing no partition columns
    funnels the table through one task), and the cumulative windows it
    does run are partitioned by the band."""
    import io
    import contextlib

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    df = Q.q_abc_classification(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        # spec = "part_cols..., order ASC ..., frame"; a spec whose
        # first element is already an ordering expression has no
        # partition keys at all
        first = spec.split(",")[0]
        assert "ASC" not in first and "DESC" not in first, (
            f"single-partition window in plan: {spec}"
        )
    assert "_band" in plan  # the banded window is what runs


def test_abc_classes_partition_the_catalog(spark):
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    rows = Q.q_abc_classification(spark, "/root/testdata/sf0.001").collect()
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    # running share is a share: within (0, 1]; max ~1
    assert all(0 < r.cum_share <= 1.000001 for r in rows)
    by_share = sorted(rows, key=lambda r: r.cum_share)
    # classes are contiguous in share order: A... then B... then C
    labels = "".join(r.abc_class for r in by_share)
    assert "BA" not in labels and "CA" not in labels and "CB" not in labels


def test_banded_cumsum_rejects_null_band(spark):
    """A band function that is not total (NULL for some rows) must fail
    loudly -- silently dropping those rows via the band join would
    corrupt the running total."""
    import pytest

    df = _frame(spark, [("a", Decimal("3.00")), ("b", Decimal("0.00"))])
    band = F.when(F.col("v") > 0, 0)  # NULL for v == 0
    with pytest.raises(ValueError, match="NULL"):
        banded_cumsum(df, "v", [F.col("v").desc()], band)


def test_abc_band_is_total_on_nonpositive_revenue(spark):
    """The query's band function maps zero and negative revenue to
    dedicated monotone bands instead of NULL (log10 domain)."""
    from decimal import Decimal as D

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.prefix import (
        banded_cumsum as bc,
    )

    rows = [
        ("a", D("900.00")),
        ("b", D("0.50")),
        ("z", D("0.00")),
        ("n1", D("-0.75")),
        ("n2", D("-80.00")),
    ]
    df = _frame(spark, rows)
    rev_d = F.col("v").cast("double")
    band = (
        F.when(rev_d > 0, -F.floor(F.log10(rev_d)))
        .when(rev_d == 0, F.lit(100000))
        .otherwise(F.lit(200000) + F.floor(F.log10(-rev_d)))
    ).cast("int")
    got, total = bc(df, "v", [F.col("v").desc(), F.col("k").asc()], band)
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted((r.k, r.cum) for r in got.collect()) == sorted(
        (r.k, r.cum) for r in want.collect()
    )


def test_banded_cumsum_all_null_band_total(spark):
    """A band whose EVERY value is NULL has SUM(v) = NULL (SQL
    aggregate semantics). The offset accumulation must treat that as
    a zero contribution -- not crash with ``Decimal + None`` -- and
    the global window oracle must still be reproduced exactly: NULL
    cum for the all-NULL band's rows (nothing summed yet when the
    whole prefix is NULL... exactly what F.sum over the window gives),
    correct offsets for every later band."""
    from decimal import Decimal as D

    df = spark.createDataFrame(
        [
            ("a", 0, D("2.00")),
            ("b", 1, None),       # band 1 is ALL NULL
            ("c", 1, None),
            ("d", 2, D("5.00")),
        ],
        "k string, b int, v decimal(18,2)",
    )
    got, total = banded_cumsum(
        df, "v", [F.col("b").asc(), F.col("k").asc()], F.col("b")
    )
    w = Window.orderBy(F.col("b").asc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted((r.k, r.cum) for r in got.collect()) == sorted(
        (r.k, r.cum) for r in want.collect()
    )
    assert total == D("7.00")
