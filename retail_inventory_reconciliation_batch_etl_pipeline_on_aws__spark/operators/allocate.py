"""FIFO layer allocation -- matching outbound units to inbound layers.

The reference pipeline reconciles STOCK LEVELS (opening - sold =
expected closing, ``glue-scripts/glue_job_2_reconcile.py:70-101``); the
question it cannot answer is WHICH receipt a sold unit came from --
FIFO cost allocation, inventory aging, holding-time analytics all need
the unit-level in/out matching. This operator computes it exactly with
nothing but per-key running sums and one per-key interval join.

The rule (classic FIFO): number every inbound unit of a key 1..R in
receipt order and every outbound unit 1..I in issue order; outbound
unit n consumes inbound unit n. In aggregate form each receipt covers
the half-open unit interval [cum_in - qty, cum_in) and each issue
[cum_out - qty, cum_out); a (receipt, issue) pair matches on the
overlap of their intervals -- ``least(hi_r, hi_i) - greatest(lo_r,
lo_i)`` units. Every arithmetic step is exact int64.

Scale shape: the running sums are windows PARTITIONED BY key (parallel
by key, never a global window), and the matcher's OUTPUT is provably
linear -- matched pairs interleave like a two-pointer merge, so a key
with R receipts and I issues produces at most R + I - 1 matches, never
R x I. The join evaluates the overlap predicate inside the per-key
group of one co-partitioning shuffle; candidate pairs within a key are
R x I before the filter (bounded by movements-per-sku squared -- a
catalog-growth-safe quantity because R and I grow with TIME, not
catalog size; a time-banded equi-join on ``hi div B`` is the refinement
if per-key history ever gets long enough to matter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fifo_match(
    flows: DataFrame,
    key_col: str = "sku",
    qty_col: str = "qty",
    is_in_col: str = "is_receipt",
    order_cols: tuple = ("d", "ord", "line"),
    lifo: bool = False,
) -> DataFrame:
    """Match issues to receipt layers FIFO; one row per (receipt,
    issue) overlap: ``(key, matched_qty, in_<order_cols...>,
    out_<order_cols...>)``.

    ``flows``: one row per movement with an exact-integer ``qty_col``,
    a boolean ``is_in_col`` (receipt vs issue) and a total ordering of
    movements per key given by ``order_cols`` (ties must be broken --
    a nondeterministic order would scramble the layer boundaries).

    ``lifo=True`` switches to PERIODIC LIFO (the other textbook
    costing method): issue unit n consumes inbound unit R_total-n+1 --
    i.e. the receipt side is renumbered from the END of the period's
    total inflow, which is just a reflection of each receipt's unit
    interval through R_total (one extra per-key total join; the
    overlap rule is unchanged). This is LIFO as an end-of-period
    allocation; a perpetual (transaction-time) LIFO is a stack
    recurrence and deliberately not spelled here.
    """

    def side(is_in: bool, prefix: str) -> DataFrame:
        w = (
            Window.partitionBy(key_col)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sub = flows.where(
            F.col(is_in_col) if is_in else ~F.col(is_in_col)
        ).withColumn("_hi", F.sum(qty_col).over(w).cast("long"))
        cols = [F.col(key_col)] + [
            F.col(c).alias(f"{prefix}_{c}") for c in order_cols
        ]
        return sub.select(
            *cols,
            (F.col("_hi") - F.col(qty_col)).cast("long").alias(f"{prefix}_lo"),
            F.col("_hi").alias(f"{prefix}_hi"),
        )

    r, i = side(True, "in"), side(False, "out")
    if lifo:
        r_tot = r.groupBy(key_col).agg(F.max("in_hi").alias("_rt"))
        r = (
            r.join(r_tot, key_col)
            .select(
                key_col,
                *[f"in_{c}" for c in order_cols],
                (F.col("_rt") - F.col("in_hi")).alias("in_lo"),
                (F.col("_rt") - F.col("in_lo")).alias("_new_hi"),
            )
            .withColumnRenamed("_new_hi", "in_hi")
        )
    overlap: Column = F.least("in_hi", "out_hi") - F.greatest(
        "in_lo", "out_lo"
    )
    return (
        r.join(
            i,
            [key_col],
        )
        .where((F.col("in_lo") < F.col("out_hi")) & (F.col("out_lo") < F.col("in_hi")))
        .select(
            key_col,
            overlap.cast("long").alias("matched_qty"),
            *[f"in_{c}" for c in order_cols],
            *[f"out_{c}" for c in order_cols],
        )
    )
