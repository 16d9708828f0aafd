"""Column-expression cleaning vocabulary (the engine's scalar functions).

The reference's complete scalar-function surface is four functions plus
integer subtraction (SURVEY.md SS2.8): ``upper(trim(sku))`` key
normalization (``glue_job_1_stage_sales.py:45``,
``glue_job_2_reconcile.py:58,69``, ``glue_job_create_dims.py:45``),
attribute ``trim`` (``glue_job_create_dims.py:46-47``), casts
(``glue_job_1_stage_sales.py:46,63``), and driver-side date math
(``glue_job_2_reconcile.py:35-36``) which we move into the plan.

All pure Column expressions -- whole-stage-codegen'd, no Python on the
executor path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_key(col: Column | str) -> Column:
    """Canonical key cleaning: ``upper(trim(col))``.

    The pipeline's single cleaning idiom for join/group keys
    (glue_job_1_stage_sales.py:45 and three sibling sites).
    """
    return F.upper(F.trim(F.col(col) if isinstance(col, str) else col))


def clean_attr(col: Column | str) -> Column:
    """Attribute cleaning: ``trim`` only (glue_job_create_dims.py:46-47)."""
    return F.trim(F.col(col) if isinstance(col, str) else col)


def to_int(col: Column | str) -> Column:
    """Cast to IntegerType (glue_job_1_stage_sales.py:46)."""
    return (F.col(col) if isinstance(col, str) else col).cast("int")


def to_date_key(col: Column | str) -> Column:
    """Cast/parse to DateType (glue_job_1_stage_sales.py:63,
    glue_job_2_reconcile.py:100)."""
    return (F.col(col) if isinstance(col, str) else col).cast("date")
