"""Dims job -- build the product dimension
(reference: glue-scripts/glue_job_create_dims.py).

Reference behavior: normalize sku/name/category (ref :43-47), project
(ref :48), ``dropDuplicates(["sku"])`` (ref :49). Two deliberate
deviations (SURVEY.md SS4.3):

1. **Deterministic dedup.** ``dropDuplicates`` keeps an arbitrary row per
   sku -- nondeterministic across runs and partitionings, which breaks
   golden-output testing and silently picks among conflicting product
   attributes. We keep the first row per sku under an explicit ordering
   (``row_number() OVER (PARTITION BY sku ORDER BY product_name,
   category)``), which is stable, auditable, and oracle-hashable.
2. **Merge with previous state.** The reference full-refreshes the dim
   from a single day's inventory file (glue_job_create_dims.py:26-27 +
   TRUNCATE at dags/retail_pipeline_dag.py:27), so SKUs absent from
   today's file vanish. ``build_dim_products(..., previous=prev_dim)``
   unions the prior dim (at lower precedence) before dedup, so the dim
   only grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleaning import clean_attr, normalize_key


def build_dim_products(
    inventory_raw: DataFrame, previous: DataFrame | None = None
) -> DataFrame:
    """inventory snapshot (sku, product_name, category[, ...]) -> DIM_PRODUCTS."""
    cleaned = inventory_raw.select(
        normalize_key("sku").alias("sku"),
        clean_attr("product_name").alias("product_name"),
        clean_attr("category").alias("category"),
        F.lit(0).alias("_precedence"),
    )
    if previous is not None:
        cleaned = cleaned.unionByName(
            previous.select(
                "sku", "product_name", "category", F.lit(1).alias("_precedence")
            )
        )
    w = Window.partitionBy("sku").orderBy("_precedence", "product_name", "category")
    return (
        cleaned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("sku", "product_name", "category")
    )
