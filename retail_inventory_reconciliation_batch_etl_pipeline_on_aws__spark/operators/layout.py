"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

A table range-partitioned and sorted on ONE column skips files well for
predicates on that column and not at all for any other. Interleaving
the bits of two dimension columns into a single Morton key and laying
the table out in key order gives every interleaved dimension locality:
a box predicate on (x, y) touches only the files whose z-range
intersects the box, so parquet min/max footer stats prune most files
for EITHER dimension -- the OPTIMIZE ZORDER BY idea (public Delta/
Iceberg feature; curve math from the classic interleave-by-magic-
numbers bit trick) rebuilt on plain Spark.

Everything is integer bit arithmetic on the JVM (shiftleft / '&' /
'|'), fully inside whole-stage codegen -- no UDF, no collect. The
write path is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``:
the range exchange gives files DISJOINT z-ranges (that disjointness is
what makes footer pruning sharp), and at 100 TB it is the same single
shuffle any global sort-write costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) ladder spreading a 16-bit value over 32 bits (one
#: zero bit between payload bits) -- the binary-magic-numbers ladder.
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def scale16(col: Column, lo, hi) -> Column:
    """Fixed-point scale ``col`` from [lo, hi] onto the full 16-bit
    range [0, 65535] (clamped). REQUIRED before interleaving dimensions
    of unequal width: raw bits from an 11-bit key and a 6-bit quantity
    leave the Morton key's high bits owned entirely by the wide column,
    degenerating the curve to a single-column sort (measured: 0%% file
    pruning on the narrow dimension without scaling). lo/hi are domain
    constants or cheaply collected min/max scalars -- exact integer
    arithmetic, deterministic."""
    span = hi - lo
    scaled = ((col.cast("long") - F.lit(lo)) * F.lit(65535)) / F.lit(span)
    return F.greatest(
        F.lit(0), F.least(F.lit(65535), F.floor(scaled).cast("long"))
    )


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so payload bit b lands at
    position 2b (a zero gap bit between each)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zvalue16(x: Column, y: Column) -> Column:
    """32-bit Morton key of two 16-bit dimensions (x in the even bits,
    y in the odd). Callers pre-scale each dimension into [0, 2^16)
    (fixed-point bucket of its domain); values beyond 16 bits are
    masked, not errors, so the key is total on any input."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def write_zordered(
    df: DataFrame, path: str, x: Column, y: Column, num_files: int
) -> None:
    """Write ``df`` as parquet laid out in Morton order of (x, y):
    range-partition on the z-key (files get disjoint z-ranges), sort
    within each file, drop the key from the stored schema. One shuffle,
    scale-identical to any sorted write."""
    z = zvalue16(x, y)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_prune_fraction(path, col: str, lo, hi) -> float:
    """Fraction of data files a min/max-stats reader SKIPS for the
    predicate ``lo <= col <= hi`` -- measured from real parquet footers
    (pyarrow), the same statistics any engine's scan pruning uses.
    ``path`` is a directory of ``part-*.parquet`` or an explicit list
    of parquet file paths (e.g. a versioned snapshot's live file set).
    Diagnostic helper for layout tests/reports; runs driver-side over
    footers only (no data pages are read)."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(path)
        if isinstance(path, (list, tuple))
        else sorted(_glob.glob(os.path.join(path, "part-*.parquet")))
    )
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin = None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and (fmax < lo or fmin > hi):
            skipped += 1
    return skipped / len(files) if files else 0.0
