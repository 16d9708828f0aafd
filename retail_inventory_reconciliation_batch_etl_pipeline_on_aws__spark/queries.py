"""Named queries over the driver testdata -- the engine's public query
surface for the correctness harness.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/types match the DuckDB oracle SQL registered in
``__spark_entry__.py``. Reference-parity queries exercise every operator
row of SURVEY.md SS2 through the fixture mapping in ``plans/fixtures.py``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.cleaning import normalize_key
from .plans import fixtures
from .plans.build_dims import build_dim_products
from .plans.reconcile import discrepancies, reconcile, top_discrepancies
from .plans.stage_sales import stage_sales


# --- reference-parity pipeline queries ---------------------------------


def q_stage_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 1 output at the processing date (S1,F1,P4,P5,A1)."""
    d = fixtures.processing_date(spark, sf_dir)
    day_sales = fixtures.pos_sales(spark, sf_dir).where(F.col("sale_date") == F.lit(d))
    return stage_sales(day_sales, d)


def q_dim_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dims job output with deterministic dedup (F1,F2,A2)."""
    return build_dim_products(fixtures.dim_source(spark, sf_dir))


def build_reconciled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble the flagship reconciliation from fixture inputs."""
    d = fixtures.processing_date(spark, sf_dir)
    d_prev = d - dt.timedelta(days=1)
    day_sales = fixtures.pos_sales(spark, sf_dir).where(F.col("sale_date") == F.lit(d))
    staged = stage_sales(day_sales, d).select("sku", "total_quantity_sold")
    opening = fixtures.inventory_snapshot(
        spark, sf_dir, d_prev, inject_shrinkage=False
    ).select("sku", F.col("stock_on_hand").alias("opening_stock"))
    closing = fixtures.inventory_snapshot(
        spark, sf_dir, d, inject_shrinkage=True
    ).select("sku", F.col("stock_on_hand").alias("actual_closing_stock"))
    dim = build_dim_products(fixtures.dim_source(spark, sf_dir))
    return reconcile(opening, closing, staged, dim, d)


def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship 3-join reconciliation (J1,J2,J3,P1-P6,F3)."""
    return build_reconciled(spark, sf_dir)


def q_discrepancy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert gate count as a 1-row frame (P3,A3; ref glue_job_2_reconcile.py:119)."""
    return discrepancies(build_reconciled(spark, sf_dir)).agg(
        F.count("*").alias("n_discrepancies")
    )


def q_discrepancy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-5 discrepancies (L1; ref :125 made deterministic)."""
    return top_discrepancies(build_reconciled(spark, sf_dir), 5)


# --- operator-focused parity queries -----------------------------------


def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: date-equality partition/row-group pruning on the sales scan,
    replacing the reference's manual date= path math
    (glue_job_1_stage_sales.py:26)."""
    d = fixtures.processing_date(spark, sf_dir)
    return (
        fixtures.pos_sales(spark, sf_dir)
        .where(F.col("sale_date") == F.lit(d))
        .groupBy("sale_date")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("quantity").cast("long")).alias("sum_qty"),
        )
    )


def q_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/P4: the cleaning vocabulary applied to a raw projection."""
    part = fixtures.load(spark, sf_dir, "part")
    return part.select(
        normalize_key(F.col("p_partkey").cast("string")).alias("sku"),
        F.trim(F.col("p_name")).alias("product_name"),
        F.upper(F.trim(F.col("p_type"))).alias("category_norm"),
        F.col("p_size").cast("int").alias("p_size"),
    )


def q_stock_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized multi-day stock ledger (SURVEY.md SS2.4 note): the
    reference's two-dated-partition read is the degenerate form of
    ``LAG(stock) OVER (PARTITION BY sku ORDER BY date)`` over a running
    cumulative-sales window. Restricted to sku % 50 = 0 to keep the
    oracle frame small."""
    sales = fixtures.pos_sales(spark, sf_dir).where(
        F.col("sku").cast("int") % 50 == 0
    )
    part = fixtures.load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("sku"),
        (F.col("p_size") * 100).alias("initial_stock"),
    )
    daily = sales.groupBy("sku", "sale_date").agg(
        F.sum(F.col("quantity").cast("long")).alias("day_qty")
    )
    w_cum = (
        Window.partitionBy("sku")
        .orderBy("sale_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("sku").orderBy("sale_date")
    return (
        daily.join(part, "sku")
        .withColumn("cum_qty", F.sum("day_qty").over(w_cum))
        .select(
            "sku",
            "sale_date",
            F.col("day_qty").cast("long").alias("day_qty"),
            (F.col("initial_stock") - F.col("cum_qty"))
            .cast("long")
            .alias("closing_stock"),
        )
        .withColumn(
            "opening_stock",
            F.lag("closing_stock")
            .over(w_lag)
            .cast("long"),
        )
    )
