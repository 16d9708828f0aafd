"""Job 1 -- stage POS sales (reference: glue-scripts/glue_job_1_stage_sales.py).

Clean transaction-grain sales and aggregate to (date_key, sku) grain:

    normalize sku, cast quantity      (ref :43-47)
    groupBy(sku).sum(quantity)        (ref :53-57)   [the job's one shuffle]
    stamp date, cast, project         (ref :56,62-66)

Spark notes: the group-by is a hash aggregate with map-side partial
aggregation, so the shuffle carries one row per (input-partition, sku),
not one per transaction -- exactly what you want when a hot SKU sells
millions of units/day. ``sum(int)`` widens to BIGINT, acknowledged by the
warehouse DDL (sql/create_redshift_tables.sql:9-12,35).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import normalize_key, to_int


def stage_sales(raw_sales: DataFrame, processing_date: dt.date | str) -> DataFrame:
    """raw transaction-grain sales (sku, quantity[, ...]) -> STAGED_SALES.

    Output: one row per sku with ``date_key``, ``sku``,
    ``total_quantity_sold`` (BIGINT), matching
    glue_job_1_stage_sales.py:62-66.
    """
    cleaned = raw_sales.select(
        normalize_key("sku").alias("sku"),
        to_int("quantity").alias("quantity"),
    )
    return (
        cleaned.groupBy("sku")
        .agg(F.sum("quantity").cast("long").alias("total_quantity_sold"))
        .select(
            F.lit(processing_date).cast("date").alias("date_key"),
            "sku",
            "total_quantity_sold",
        )
    )
