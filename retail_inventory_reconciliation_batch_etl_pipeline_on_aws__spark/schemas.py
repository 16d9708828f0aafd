"""Explicit StructType contracts for every table the engine touches.

The reference infers CSV schemas on every read (``header=true,
inferSchema=true`` at ``glue-scripts/glue_job_1_stage_sales.py:33-36``,
``glue_job_2_reconcile.py:53-56,63-67``, ``glue_job_create_dims.py:33-36``)
then re-casts to pin the contract. ``inferSchema`` costs an extra full
scan of the input and is nondeterministic over dirty files -- at 100TB
that is an unaffordable double read, so the engine declares schemas and
keeps inference only as an opt-in dev mode (see sources.readers).

Warehouse-side types follow ``sql/create_redshift_tables.sql:4-38``:
quantities summed by Spark come back as BIGINT (LongType), acknowledged
there at lines 9-12 ("to match the Spark sum() output").
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw zone ----------------------------------------------------------

#: raw/pos_sales/date=YYYY-MM-DD/*.csv -- transaction grain, many rows
#: per sku per day (columns evidenced at glue_job_1_stage_sales.py:45-46).
POS_SALES_RAW = T.StructType(
    [
        T.StructField("sku", T.StringType(), True),
        T.StructField("quantity", T.StringType(), True),  # dirty; cast in cleaning
    ]
)

#: raw/warehouse_inventory/date=YYYY-MM-DD/*.csv -- one snapshot row per
#: sku per day (columns evidenced at glue_job_2_reconcile.py:57-60,68-71
#: and glue_job_create_dims.py:43-48).
WAREHOUSE_INVENTORY_RAW = T.StructType(
    [
        T.StructField("sku", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("stock_on_hand", T.StringType(), True),  # dirty; cast in cleaning
    ]
)

# --- staging / processed zones ----------------------------------------

#: staging/pos_sales -- output of the stage-sales job
#: (glue_job_1_stage_sales.py:62-66).
STAGED_SALES = T.StructType(
    [
        T.StructField("date_key", T.DateType(), False),
        T.StructField("sku", T.StringType(), False),
        T.StructField("total_quantity_sold", T.LongType(), True),
    ]
)

#: processed/dim_products -- one row per sku (glue_job_create_dims.py:48-49,
#: sql/create_redshift_tables.sql:20-26).
DIM_PRODUCTS = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
    ]
)

#: processed/reconciled_inventory -- flagship output
#: (glue_job_2_reconcile.py:99-108, sql/create_redshift_tables.sql:4-15).
RECONCILED_INVENTORY = T.StructType(
    [
        T.StructField("date_key", T.DateType(), False),
        T.StructField("sku", T.StringType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("opening_stock", T.IntegerType(), True),
        T.StructField("quantity_sold", T.LongType(), True),
        T.StructField("expected_closing_stock", T.LongType(), True),
        T.StructField("actual_closing_stock", T.IntegerType(), True),
        T.StructField("discrepancy_amount", T.LongType(), True),
    ]
)
