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


#: Spark-side SQL UDF shims for stock-DuckDB scalar names Spark lacks
#: (pure expression substitution -- CREATE ... RETURN compiles to the
#: JVM expression, so plans stay whole-stage-codegen; no Python UDF).
#: Only names ABSENT from Spark's builtin registry are shimmed:
#: builtins resolve first on Spark's search path, so a same-name
#: builtin with different semantics (e.g. ``dayofweek``: Sunday=0 on
#: DuckDB, Sunday=1 on Spark) cannot be shadowed and stays on the
#: exclusion list (tests/test_sql_frontend.py).
_COMPAT_FUNCTIONS = (
    # DuckDB sha256(x) == Spark sha2(x, 256)
    "CREATE OR REPLACE TEMPORARY FUNCTION sha256(x STRING) "
    "RETURNS STRING RETURN sha2(x, 256)",
    # DuckDB epoch(ts): seconds since epoch incl. fraction (DOUBLE)
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch(t TIMESTAMP) "
    "RETURNS DOUBLE RETURN CAST(unix_micros(t) AS DOUBLE) / 1000000.0",
    # DuckDB json_extract_string(j, '$.path') == get_json_object
    "CREATE OR REPLACE TEMPORARY FUNCTION json_extract_string(j STRING, p STRING) "
    "RETURNS STRING RETURN get_json_object(j, p)",
    # DuckDB isodow(d): Monday=1 .. Sunday=7 (Spark spells the same
    # field DOW_ISO inside EXTRACT; no common EXTRACT spelling exists)
    "CREATE OR REPLACE TEMPORARY FUNCTION isodow(t TIMESTAMP) "
    "RETURNS BIGINT RETURN EXTRACT(DOW_ISO FROM t)",
    # DuckDB epoch_us(ts): exact integer microseconds since epoch
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(t TIMESTAMP) "
    "RETURNS BIGINT RETURN unix_micros(t)",
)


def register_compat_functions(spark: SparkSession) -> None:
    """Install the DuckDB-name compatibility shims (idempotent)."""
    for ddl in _COMPAT_FUNCTIONS:
        spark.sql(ddl)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view named after itself. ``events``
    goes through ``fixtures.events`` so its TIMESTAMP(NANOS) column
    arrives as a proper timestamp, same as the DataFrame path. Also
    installs the compat function shims, so the portable-oracle subset
    runs verbatim."""
    register_compat_functions(spark)
    for t in TABLES:
        df = fixtures.events(spark, sf_dir) if t == "events" else fixtures.load(
            spark, sf_dir, t
        )
        df.createOrReplaceTempView(t)
