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

from pyspark.sql import Column, DataFrame
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


def column_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    decimal_cols: Sequence[str] = (),
) -> DataFrame:
    """ANALYZE-style per-column profile in ONE pass over the table:
    (col, n_rows, n_null, n_distinct, min_v, max_v), one row per column.

    All statistics come from a single aggregation (Spark plans the
    multi-column distinct counts with one Expand pass -- a xN-columns
    row blowup, the standard trade for exactness; swap
    ``approx_count_distinct`` in at 100TB if 2% error is acceptable),
    then the wide 1-row result is pivoted to long form driver-free with
    ``explode`` over an array of structs. min/max are stringified for a
    homogeneous schema; float columns listed in ``decimal_cols`` are
    formatted through DECIMAL(18,2) so the text form is identical
    cross-engine (raw double->string rendering is not).
    """
    cols = list(cols or df.columns)

    def minmax(c: str, which) -> Column:
        v = F.col(c)
        if c in decimal_cols:
            v = v.cast("decimal(18,2)")
        return which(v).cast("string")

    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"),
            minmax(c, F.min).alias(f"{c}__min"),
            minmax(c, F.max).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


def referential_report(
    fact: DataFrame,
    refs: dict[str, tuple[DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan counts in ``quality_report``'s (check,
    n_violations) shape -- the cross-table contract the single-frame
    checks can't express (the DDL's unenforced REFERENCES intent:
    warehouse engines parse FK clauses but do not police them, so the
    pipeline must).

    ``refs`` maps a fact column to (dim_frame, dim_column). Each check
    is a LEFT ANTI join counting fact rows whose non-null key has no
    dim match; dims are broadcast when small (Catalyst decides), the
    fact is scanned once per declared key. NULL keys are not orphans --
    declare the column in ``quality_report(not_null=...)`` to forbid
    them separately.
    """
    parts = []
    for col, (dim, dim_col) in refs.items():
        orphans = (
            fact.where(F.col(col).isNotNull())
            .join(
                dim.select(F.col(dim_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(
                F.lit(f"fk:{col}->{dim_col}").alias("check"), "n_violations"
            )
        )
        parts.append(orphans)
    if not parts:
        raise ValueError("no foreign keys declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def range_checksums(
    df: DataFrame,
    key: str,
    n_buckets: int = 64,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Anti-entropy range digests (the Merkle-tree idea Dynamo/Cassandra
    replicas use, flattened to one level): bucket rows by key hash and
    aggregate a COMMUTATIVE per-bucket digest -- sum of row hashes mod
    2^63 -- so two replicas of a table can be compared with
    ``n_buckets`` rows instead of a full-row join, and a divergence is
    localized to its bucket before any row-level repair query runs.

    Order-independence matters: sums commute, so partitioning, file
    order, and shuffle nondeterminism cannot change the digest; only
    row CONTENT can. One map-side-combined aggregate; nothing but
    (bucket, count, digest) crosses the shuffle.
    """
    use = list(cols or df.columns)
    row_hash = F.xxhash64(*[F.col(c) for c in use])
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    return (
        df.select(bucket.alias("bucket"), row_hash.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            # accumulate in DECIMAL(38,0) (ANSI-safe -- a long sum of
            # 2^62-sized terms overflows), fold back to a long digest
            F.pmod(
                F.sum(F.pmod(F.col("_h"), F.lit(2**62)).cast("decimal(38,0)")),
                F.lit(2**62).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("digest"),
        )
        .orderBy("bucket")
    )


def diff_ranges(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where two ``range_checksums`` outputs disagree -- the
    repair worklist. Full-outer on bucket so a bucket present in only
    one replica (missing rows hash-side) also surfaces."""
    aa = a.select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("digest").alias("digest_a"),
    )
    bb = b.select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("digest").alias("digest_b"),
    )
    j = aa.join(bb, "bucket", "full_outer")
    return j.where(
        ~(
            F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))
            & F.col("digest_a").eqNullSafe(F.col("digest_b"))
        )
    ).orderBy("bucket")
