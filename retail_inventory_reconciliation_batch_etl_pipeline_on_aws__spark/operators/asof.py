"""As-of (point-in-time) join -- the operator behind the reference's
day-over-day snapshot pairing, generalized.

The reference reads *yesterday's* inventory partition as the opening
stock for today (glue_job_2_reconcile.py:35-36,41-43): a hand-rolled
as-of join with a fixed 1-day lag. The general form -- "for each left
row, the most recent right row at or before its timestamp, per key" --
has no single Spark operator. A naive range-join (``l.t >= r.t`` +
row_number) explodes quadratically per key; this implementation is the
scalable union-window form:

    tag both sides -> union -> one window over (key, time) ->
    last non-null right payload carried forward -> keep left rows

ONE shuffle on the key, linear in |L|+|R|, no UDFs. Equal timestamps
match (the right row sorts first at the same instant), mirroring
DuckDB's native ASOF JOIN semantics -- which is exactly the oracle used
to verify it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right-side payload of
    the nearest right row at-or-before (``backward``) or at-or-after
    (``forward``) its time, matched per key; right payload columns are
    NULL when no such row exists.

    ``tolerance_seconds`` bounds match staleness (pandas
    ``merge_asof(tolerance=...)`` parity): a carried match farther than
    the tolerance from the left row's time is nulled out, keeping the
    left row. Implemented by carrying the matched right time through
    the same window -- no extra shuffle, still one exchange per key.

    Right non-key columns (including ``right_time``) must not collide
    with left column names -- alias them on the way in.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"_t", "_side", "_rt"} & (set(left.columns) | set(right.columns))
    if reserved:
        # these are the operator's internal tag/carry columns; an input
        # column with one of these names would be silently clobbered
        raise ValueError(
            f"input columns collide with internal names: {sorted(reserved)}"
        )
    left_payload = [c for c in left.columns if c not in keys]
    right_payload = [c for c in right.columns if c not in keys]
    clash = set(left_payload) & set(right_payload)
    if clash:
        raise ValueError(f"colliding payload columns: {sorted(clash)}")

    l_tagged = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *left_payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_payload],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *right_payload,
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left at equal _t => inclusive match
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    # _rt (the carried match time) is only needed to evaluate the
    # staleness bound -- leave it out of the untolerated fast path so
    # the window computes one aggregate per payload column, no more
    rt_cols = (
        [
            F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
            .over(w)
            .alias("_rt")
        ]
        if tolerance_seconds is not None
        else []
    )
    carried = unioned.select(
        *keys,
        "_t",
        "_side",
        *left_payload,
        *rt_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload],
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.col("_t").cast("timestamp").cast("long")
                - F.col("_rt").cast("timestamp").cast("long")
            )
            <= F.lit(int(tolerance_seconds))
        )
        out = out.select(
            *keys,
            "_t",
            "_side",
            *left_payload,
            *[
                F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in right_payload
            ],
        )
    return out.drop("_side", "_t", "_rt")
