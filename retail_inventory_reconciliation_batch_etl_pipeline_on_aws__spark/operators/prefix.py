"""Distributed global prefix sums (running totals over a GLOBAL order).

The naive Spark spelling -- ``Window.orderBy(...)`` with no
partitionBy -- funnels the entire dataset through ONE task (the
engine-wide plan sweep red-flags it). The scale-honest form used here
is the same segmentation trick as ``value_anomalies``' day-segmented
recurrence, applied to an arbitrary global order:

1. assign every row a BAND that is monotone in the global order (a
   deterministic function of the ordering value, e.g. the magnitude
   decade of a revenue column) -- all of band k precedes band k+1;
2. run the cumulative window PARTITIONED BY band (parallel across
   bands, bounded rows per task);
3. per-band totals are a tiny aggregate (#bands rows, bounded by the
   band function's range -- e.g. <= ~40 decades for any DECIMAL) --
   prefix-sum them driver-side with exact ``decimal.Decimal``
   arithmetic and broadcast the offsets back;
4. global running total = band offset + within-band running total.

Everything is exact integer/decimal arithmetic until the caller's
terminal division, so a SQL oracle's single ``SUM() OVER (ORDER BY)``
window hash-matches. Skewed bands (a zipfian value column concentrates
rows in middle decades) parallelize within the band ONLY via the order
key -- if one band dominates, refine the band function (half-decades)
exactly like salting a hot key.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def banded_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[Column | str],
    band: Column,
    cum_col: str = "cum",
) -> tuple[DataFrame, Decimal]:
    """Global inclusive running total of ``value_col`` over
    ``order_cols``, segmented by ``band`` (monotone non-decreasing in
    the global order -- the caller's contract; rows in a lower band
    must sort before every row of a higher band).

    Returns ``(frame with cum_col, grand_total)``. The per-band totals
    collect is bounded by the band function's range, never by the data
    (the sanctioned bounded-scalar pattern, like IVF's nlist
    centroids). ``value_col`` must be DECIMAL for exactness; the
    running total inherits it.
    """
    # Persist the banded frame: it feeds BOTH the per-band totals job
    # (collected next) and the windowed path (consumed by the caller's
    # terminal action). Without this the whole upstream plan -- at
    # scale, the query's biggest scan+shuffle -- runs twice. The
    # persist is intentionally left for Spark's CacheManager/LRU to
    # reclaim: unpersisting after the totals collect would re-run the
    # upstream plan for the window path, defeating the point.
    banded = df.withColumn("_band", band).persist()
    w = (
        Window.partitionBy("_band")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = banded.withColumn("_cum_in_band", F.sum(value_col).over(w))

    totals = sorted(
        banded.groupBy("_band").agg(F.sum(value_col).alias("t")).collect(),
        key=lambda r: (r["_band"] is None, r["_band"]),
    )  # bounded: one row per band
    if totals and totals[-1]["_band"] is None:
        # a NULL band breaks the contract silently (the inner join
        # below would drop those rows) -- fail loudly instead; the
        # caller's band function must be total (e.g. map non-positive
        # values to a dedicated band, as q_abc_classification does)
        raise ValueError(
            "band expression evaluated to NULL for some rows; "
            "the band function must be total over the input domain"
        )
    offsets, acc, seen_nonnull = [], Decimal(0), False
    for r in totals:
        offsets.append((r["_band"], acc, seen_nonnull))
        # SUM over a band whose every value is NULL is NULL (SQL
        # aggregate semantics) -- contribute 0 to the running offset
        # instead of crashing the += with a TypeError. Per-row, the
        # global window oracle says: running SUM ignores NULLs, so a
        # row whose within-band cum is NULL (no non-NULL value yet in
        # its band) still shows the offset of the EARLIER bands --
        # unless the entire global prefix is NULL, where SQL gives
        # NULL. _seen carries that earlier-band-had-a-value bit.
        if r["t"] is not None:
            acc += r["t"]
            seen_nonnull = True

    spark = df.sparkSession
    scale = getattr(df.schema[value_col].dataType, "scale", 0)
    off_df = spark.createDataFrame(
        offsets, f"_band int, _off decimal(38,{scale}), _seen boolean"
    )
    out = (
        within.join(F.broadcast(off_df), "_band")
        .withColumn(
            cum_col,
            F.when(
                F.col("_cum_in_band").isNotNull(),
                F.col("_off") + F.col("_cum_in_band"),
            ).when(F.col("_seen"), F.col("_off")),
        )
        .drop("_band", "_cum_in_band", "_off", "_seen")
    )
    return out, acc


def banded_cummin(
    df: DataFrame,
    value_col: str,
    order_cols: list[Column | str],
    band: Column,
    cum_col: str = "cum_min",
) -> DataFrame:
    """STRICT-prefix global running MINIMUM of ``value_col`` over
    ``order_cols`` -- the prefix-min sibling of ``banded_cumsum`` (same
    contract: ``band`` monotone non-decreasing in the global order,
    NULL bands rejected). "Strict" means each row sees the min over
    rows strictly BEFORE it; the first global row gets NULL. That is
    the frame 2-D skyline/Pareto computation needs: a point survives
    iff every earlier point's y exceeds its own.

    Per-band strict windows run in parallel; the per-band inclusive
    minima (bounded: one row per band) prefix-min driver-side and
    broadcast back as each band's prior-bands floor.
    """
    banded = df.withColumn("_band", band).persist()
    w = (
        Window.partitionBy("_band")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = banded.withColumn("_min_in_band", F.min(value_col).over(w))
    mins = sorted(
        banded.groupBy("_band").agg(F.min(value_col).alias("m")).collect(),
        key=lambda r: (r["_band"] is None, r["_band"]),
    )
    if mins and mins[-1]["_band"] is None:
        raise ValueError(
            "band expression evaluated to NULL for some rows; "
            "the band function must be total over the input domain"
        )
    offsets, prior = [], None
    for r in mins:
        offsets.append((r["_band"], prior))
        if r["m"] is not None and (prior is None or r["m"] < prior):
            prior = r["m"]
    spark = df.sparkSession
    vtype = df.schema[value_col].dataType.simpleString()
    off_df = spark.createDataFrame(offsets, f"_band int, _prior {vtype}")
    return (
        within.join(F.broadcast(off_df), "_band")
        # least() skips NULLs, which is exactly the semantics: no
        # earlier row at all -> NULL
        .withColumn(cum_col, F.least(F.col("_prior"), F.col("_min_in_band")))
        .drop("_band", "_min_in_band", "_prior")
    )
