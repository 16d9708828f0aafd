"""SQL front-end: the engine's tables as Spark temp views.

The reference's consumers query Redshift in SQL
(``sql/create_redshift_tables.sql``); this module gives the Spark
engine the same front door. ``register_views`` exposes every testdata
table (events with its nanos-timestamp normalization applied), after
which the ANSI-SQL strings in ``__spark_entry__.oracle_sql()`` -- the
very statements DuckDB verifies against -- run verbatim through
``spark.sql`` for every query in the portable subset
(``tests/test_sql_frontend.py`` pins DataFrame == spark.sql parity).
Catalyst plans SQL and DataFrame identically, so every plan-shape
guarantee carries over.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .plans import fixtures

#: every driver testdata table
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view named after itself. ``events``
    goes through ``fixtures.events`` so its TIMESTAMP(NANOS) column
    arrives as a proper timestamp, same as the DataFrame path."""
    for t in TABLES:
        df = fixtures.events(spark, sf_dir) if t == "events" else fixtures.load(
            spark, sf_dir, t
        )
        df.createOrReplaceTempView(t)
