"""Job 2 -- the flagship reconciliation
(reference: glue-scripts/glue_job_2_reconcile.py).

Semantics preserved exactly (SURVEY.md SS2.4, J1-J3):

    opening FULL OUTER closing ON sku   (ref :79)  new/delisted SKUs survive
    ... LEFT JOIN daily_sales ON sku    (ref :80)  sold-but-untracked SKUs DROP
    ... LEFT JOIN dim(sku,name) ON sku  (ref :81-83)  broadcast
    fillna(0) on stock/qty              (ref :90)
    expected = opening - sold           (ref :91)
    discrepancy = actual - expected     (ref :92)  negative = shrinkage
    stamp date_key, final projection    (ref :93,99-108)

Scale notes:
- The dim join is an explicit ``F.broadcast`` -- the reference encodes the
  same intent as Redshift ``DISTSTYLE ALL`` ("small table, broadcast to
  all nodes for joins", sql/create_redshift_tables.sql:25).
- opening/closing/sales all shuffle-partition on ``sku``; Catalyst reuses
  one exchange layout across the two sku joins rather than re-shuffling,
  and AQE skew-split handles zipfian hot SKUs.
- The reference recomputes this whole plan up to 3x (write at :113,
  alert count at :119, alert sample at :125 -- no cache). The engine's
  pipeline persists the result before fan-out (see alerts.build_alert).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile(
    opening: DataFrame,
    closing: DataFrame,
    staged_sales: DataFrame,
    dim_products: DataFrame,
    processing_date: dt.date | str,
) -> DataFrame:
    """Build the RECONCILED_INVENTORY frame for one processing date.

    Inputs (already cleaned/normalized):
      opening      -- (sku, opening_stock int)          yesterday's snapshot
      closing      -- (sku, actual_closing_stock int)   today's snapshot
      staged_sales -- (sku, total_quantity_sold long)   today's staged sales
      dim_products -- DIM_PRODUCTS
    """
    inv = opening.join(closing, on="sku", how="full_outer")
    with_sales = inv.join(staged_sales, on="sku", how="left")
    return _name_fill_derive(with_sales, dim_products, processing_date)


def reconcile_from_ledger(
    ledger: DataFrame,
    dim_products: DataFrame,
    processing_date: dt.date | str,
) -> DataFrame:
    """Fused-form reconciliation for inputs already co-grained per sku.

    When opening/closing/sold come from one conditional aggregation over
    the fact table (``fixtures.inventory_ledger``), J1/J2 are implied by
    the grouping -- re-joining three projections of the same aggregate
    would force Catalyst to plan three differently-pruned scans. This
    form is the 100TB flagship plan: ONE fact scan, ONE shuffle, one
    broadcast dim join, then pure projection. ``reconcile`` remains the
    general form for independently-sourced inputs (the reference's
    actual CSV-snapshot shape).

    ``ledger``: (sku, opening_stock int?, actual_closing_stock int,
    total_quantity_sold long?) -- nulls mean "absent from that side",
    exactly the post-outer-join state of the general form.
    """
    return _name_fill_derive(ledger, dim_products, processing_date)


def _name_fill_derive(
    with_sales: DataFrame,
    dim_products: DataFrame,
    processing_date: dt.date | str,
) -> DataFrame:
    """Shared tail: broadcast dim name join (J3), null fill (P6), derived
    columns (F3), date stamp + final projection (P5, P1)."""
    with_names = with_sales.join(
        F.broadcast(dim_products.select("sku", "product_name")), on="sku", how="left"
    )
    filled = with_names.na.fill(
        0, subset=["opening_stock", "actual_closing_stock", "total_quantity_sold"]
    )
    derived = filled.withColumn(
        "expected_closing_stock",
        (F.col("opening_stock").cast("long") - F.col("total_quantity_sold")),
    ).withColumn(
        "discrepancy_amount",
        (F.col("actual_closing_stock").cast("long") - F.col("expected_closing_stock")),
    )
    return derived.select(
        F.lit(processing_date).cast("date").alias("date_key"),
        "sku",
        "product_name",
        F.col("opening_stock").cast("int").alias("opening_stock"),
        F.col("total_quantity_sold").cast("long").alias("quantity_sold"),
        F.col("expected_closing_stock").cast("long").alias("expected_closing_stock"),
        F.col("actual_closing_stock").cast("int").alias("actual_closing_stock"),
        F.col("discrepancy_amount").cast("long").alias("discrepancy_amount"),
    )


def discrepancies(reconciled: DataFrame) -> DataFrame:
    """P3: rows where stock does not reconcile (ref :118)."""
    return reconciled.filter(F.col("discrepancy_amount") != 0)


def top_discrepancies(reconciled: DataFrame, k: int = 5) -> DataFrame:
    """Deterministic top-k (SURVEY.md SS2.6 L1).

    The reference samples the *first* 5 discrepancy rows
    (``limit(5).collect()``, ref :125) -- partition-order dependent. The
    engine returns the k *largest* absolute discrepancies with a total
    tiebreak on sku, which Spark executes as TakeOrderedAndProject (no
    global sort materialization).
    """
    return (
        discrepancies(reconciled)
        .orderBy(F.abs(F.col("discrepancy_amount")).desc(), F.col("sku").asc())
        .limit(k)
    )
