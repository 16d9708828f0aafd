"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reconciliation on sf0.001;
``queries()`` exposes the engine's named query surface; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for each (same parquet tables,
pre-registered as views).

The fixture-derivation rules shared by both sides are documented in
``retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark/plans/fixtures.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_reconcile(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stage_sales": Q.q_stage_sales,
        "dim_products": Q.q_dim_products,
        "reconcile": Q.q_reconcile,
        "discrepancy_count": Q.q_discrepancy_count,
        "discrepancy_topk": Q.q_discrepancy_topk,
        "partition_prune": Q.q_partition_prune,
        "normalize_clean": Q.q_normalize_clean,
        "stock_timeseries": Q.q_stock_timeseries,
    }


# --- DuckDB oracle SQL --------------------------------------------------
# The fixture CTEs mirror plans/fixtures.py rule-for-rule.

_FIXTURE_CTES = """
WITH sales AS (
  SELECT CAST(l_partkey AS VARCHAR) AS sku,
         CAST(l_quantity AS INT)    AS quantity,
         CAST(l_shipdate AS DATE)   AS sale_date
  FROM lineitem
),
params AS (SELECT MAX(sale_date) AS d FROM sales),
staged AS (
  SELECT s.sku, CAST(SUM(s.quantity) AS BIGINT) AS total_quantity_sold
  FROM sales s CROSS JOIN params p
  WHERE s.sale_date = p.d
  GROUP BY s.sku
),
opening AS (
  SELECT s.sku,
         CAST(MAX(pt.p_size) * 100 - SUM(s.quantity) AS INT) AS opening_stock
  FROM sales s
  JOIN part pt ON CAST(pt.p_partkey AS VARCHAR) = s.sku
  CROSS JOIN params p
  WHERE s.sale_date <= p.d - 1 AND pt.p_partkey % 10 <> 3
  GROUP BY s.sku
),
closing AS (
  SELECT s.sku,
         CAST(MAX(pt.p_size) * 100 - SUM(s.quantity)
              - MAX(CASE WHEN pt.p_partkey % 7 = 0 THEN 1 ELSE 0 END) AS INT)
           AS actual_closing_stock
  FROM sales s
  JOIN part pt ON CAST(pt.p_partkey AS VARCHAR) = s.sku
  CROSS JOIN params p
  WHERE s.sale_date <= p.d AND pt.p_partkey % 10 <> 3
  GROUP BY s.sku
),
dim_src AS (
  SELECT CAST(p_partkey AS VARCHAR) AS sku, p_name AS product_name, p_type AS category
  FROM part
  UNION ALL
  SELECT CAST(p_partkey AS VARCHAR), p_name, p_brand
  FROM part WHERE p_partkey % 5 = 0
),
dim AS (
  SELECT sku, product_name, category FROM (
    SELECT UPPER(TRIM(sku)) AS sku,
           TRIM(product_name) AS product_name,
           TRIM(category) AS category,
           ROW_NUMBER() OVER (
             PARTITION BY UPPER(TRIM(sku))
             ORDER BY TRIM(product_name), TRIM(category)
           ) AS rn
    FROM dim_src
  ) t WHERE rn = 1
),
inv AS (
  SELECT COALESCE(o.sku, c.sku) AS sku, o.opening_stock, c.actual_closing_stock
  FROM opening o FULL OUTER JOIN closing c ON o.sku = c.sku
),
reconciled AS (
  SELECT CAST(p.d AS DATE) AS date_key,
         i.sku,
         dm.product_name,
         CAST(COALESCE(i.opening_stock, 0) AS INT) AS opening_stock,
         CAST(COALESCE(st.total_quantity_sold, 0) AS BIGINT) AS quantity_sold,
         CAST(COALESCE(i.opening_stock, 0) - COALESCE(st.total_quantity_sold, 0) AS BIGINT)
           AS expected_closing_stock,
         CAST(COALESCE(i.actual_closing_stock, 0) AS INT) AS actual_closing_stock,
         CAST(COALESCE(i.actual_closing_stock, 0)
              - (COALESCE(i.opening_stock, 0) - COALESCE(st.total_quantity_sold, 0)) AS BIGINT)
           AS discrepancy_amount
  FROM inv i
  LEFT JOIN staged st ON i.sku = st.sku
  LEFT JOIN dim dm ON i.sku = dm.sku
  CROSS JOIN params p
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "stage_sales": _FIXTURE_CTES
        + """
SELECT CAST(p.d AS DATE) AS date_key, s.sku,
       CAST(SUM(s.quantity) AS BIGINT) AS total_quantity_sold
FROM sales s CROSS JOIN params p
WHERE s.sale_date = p.d
GROUP BY s.sku, p.d
""",
        "dim_products": _FIXTURE_CTES + "SELECT sku, product_name, category FROM dim",
        "reconcile": _FIXTURE_CTES + "SELECT * FROM reconciled",
        "discrepancy_count": _FIXTURE_CTES
        + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_discrepancies
FROM reconciled WHERE discrepancy_amount <> 0
""",
        "discrepancy_topk": _FIXTURE_CTES
        + """
SELECT * FROM reconciled WHERE discrepancy_amount <> 0
ORDER BY ABS(discrepancy_amount) DESC, sku ASC
LIMIT 5
""",
        "partition_prune": _FIXTURE_CTES
        + """
SELECT s.sale_date,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(s.quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM sales s CROSS JOIN params p
WHERE s.sale_date = p.d
GROUP BY s.sale_date
""",
        "normalize_clean": """
SELECT UPPER(TRIM(CAST(p_partkey AS VARCHAR))) AS sku,
       TRIM(p_name) AS product_name,
       UPPER(TRIM(p_type)) AS category_norm,
       CAST(p_size AS INT) AS p_size
FROM part
""",
        "stock_timeseries": """
WITH sales AS (
  SELECT CAST(l_partkey AS VARCHAR) AS sku,
         CAST(l_quantity AS INT)    AS quantity,
         CAST(l_shipdate AS DATE)   AS sale_date
  FROM lineitem
),
daily AS (
  SELECT sku, sale_date, CAST(SUM(quantity) AS BIGINT) AS day_qty
  FROM sales
  WHERE CAST(sku AS INT) % 50 = 0
  GROUP BY sku, sale_date
),
ledger AS (
  SELECT d.sku, d.sale_date, d.day_qty,
         CAST(pt.p_size * 100
              - SUM(d.day_qty) OVER (
                  PARTITION BY d.sku ORDER BY d.sale_date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS closing_stock
  FROM daily d
  JOIN part pt ON CAST(pt.p_partkey AS VARCHAR) = d.sku
)
SELECT sku, sale_date, day_qty, closing_stock,
       CAST(LAG(closing_stock) OVER (PARTITION BY sku ORDER BY sale_date) AS BIGINT)
         AS opening_stock
FROM ledger
""",
    }
