"""Declarative data-quality checks (SURVEY.md SS1.2).

The warehouse DDL encodes contracts Spark's StringType does not enforce
-- ``VARCHAR(50/100/255)`` widths, NOT NULL keys, one-row-per-key grain
(sql/create_redshift_tables.sql:4-38). The reference validates none of
them in-pipeline (loads would fail at COPY time instead). Here they are
a cheap distributed report: all row-wise checks fold into ONE aggregate
pass over the frame (a single job, no shuffle), and the grain check is
one groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    max_len: dict[str, int] | None = None,
    accepted: dict[str, Sequence[str]] | None = None,
    unique_key: Sequence[str] | None = None,
) -> DataFrame:
    """Violation counts per declared check, as a (check, n_violations)
    frame. A clean frame yields all zeros -- gate with
    ``report.where(col('n_violations') > 0)``.

    - ``not_null``: columns that must never be NULL
    - ``max_len``: column -> max character length (VARCHAR(n) contract)
    - ``accepted``: column -> allowed value list (NULLs not counted;
      combine with not_null for closed domains)
    - ``unique_key``: the table grain; counts rows in excess of one per
      key (the ``dropDuplicates`` / one-row-per-sku contract, A2)
    """
    aggs = []
    for c in not_null:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"not_null:{c}")
        )
    for c, n in (max_len or {}).items():
        aggs.append(
            F.sum(F.when(F.length(F.col(c)) > n, 1).otherwise(0))
            .cast("long")
            .alias(f"max_len({n}):{c}")
        )
    for c, values in (accepted or {}).items():
        arr = F.array(*[F.lit(v) for v in values])
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull() & ~F.array_contains(arr, F.col(c)), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"accepted:{c}")
        )

    parts: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{c}', `{c}`" for c in wide.columns)
        parts.append(
            wide.selectExpr(
                f"stack({len(wide.columns)}, {stack}) as (check, n_violations)"
            )
        )
    if unique_key:
        keys = list(unique_key)
        dupes = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(
                F.lit(f"unique_key:{','.join(keys)}").alias("check"), "n_violations"
            )
        )
        parts.append(dupes)
    if not parts:
        raise ValueError("no checks declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
