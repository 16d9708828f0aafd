"""Mergeable frequency-sketch operators.

``heavy_hitters`` is the scale path for corpus-level frequency
screens: a Misra-Gries candidate pass bounds the shuffle to
(k-1) keys per partition, and an EXACT second pass re-counts only the
candidates -- the approximate-candidates / exact-scores discipline the
similarity ladder uses, applied to frequencies. The MG guarantee
(any item with global count > N/k is heavy in at least one partition,
hence in that partition's summary) makes the candidate union
COMPLETE, so the final output is exact and oracle-mirrorable even
though a sketch generated it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int):
    """mapInPandas body: one Misra-Gries summary (<= k-1 counters) per
    PARTITION, merged batch-by-batch with the Agarwal et al. mergeable
    rule (combine counts, subtract the k-th largest, keep positives --
    preserves the N/k error bound)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf["_key"].value_counts()
            for key, c in vc.items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k - 1:
                cut = sorted(counters.values(), reverse=True)[k - 1]
                counters = {
                    key: c - cut for key, c in counters.items() if c > cut
                }
        yield pd.DataFrame({"_key": pd.Series(list(counters), dtype="object")})

    return fn


def mg_candidate_keys(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (string-typed), at most
    k-1 rows per partition -- the COMPLETE superset of every key with
    global frequency > N/k."""
    keyed = df.select(F.col(key_col).cast("string").alias("_key"))
    return keyed.mapInPandas(_mg_partition(k), "_key string").distinct()


def heavy_hitters(df: DataFrame, key_col: str, k: int = 200) -> DataFrame:
    """EXACT heavy hitters via the two-pass sketch: keys with global
    count strictly greater than N/k, with exact counts.

    Pass 1 never shuffles raw keys -- each partition emits <= k-1
    candidates from an Arrow-batched Misra-Gries summary. Pass 2
    broadcast-semi-joins the bounded candidate set back onto the data
    and re-counts exactly, so approximation affects NOTHING in the
    output (completeness is the MG theorem; precision is the exact
    filter ``count * k > N``). At 100 TB pass 2's shuffle carries only
    candidate keys -- |partitions| * (k-1) at worst -- instead of the
    full key universe.
    """
    keyed = df.select(F.col(key_col).cast("string").alias("_key"))
    n_total = keyed.count()  # bounded scalar: one count action
    cand = mg_candidate_keys(df, key_col, k)
    return (
        keyed.join(F.broadcast(cand), "_key")
        .groupBy("_key")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") * k > F.lit(n_total))
        .select(F.col("_key").alias("key"), "n_occurrences")
        .orderBy(F.desc("n_occurrences"), "key")
    )
