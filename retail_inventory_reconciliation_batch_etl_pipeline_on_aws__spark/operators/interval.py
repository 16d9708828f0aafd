"""Range (point-in-interval) join -- the second member of the temporal
join family next to ``operators.asof``.

Spark plans a raw ``p.t BETWEEN i.start AND i.end`` join with no equi
key as BroadcastNestedLoopJoin -- O(|P| x |I|), which melts at scale.
This implementation makes it an EQUI join: every interval is exploded
into the day-buckets it covers, every point carries its single bucket,
and the join key is the bucket; exact containment is then verified on
the candidates. Each (point, interval) pair meets in exactly one bucket
(the point's), so no dedup pass is needed. Cost is linear in |P| +
sum(interval spans in buckets) -- the standard bucketization trick used
by time-series engines for range joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    bucket_days: int = 1,
) -> DataFrame:
    """Inner-join each point row to every interval row containing its
    time (inclusive on both ends). Column sets must not collide.

    ``bucket_days`` trades candidate volume against interval fan-out:
    buckets should be on the order of the typical interval length
    (shorter buckets -> more interval replicas; longer -> more false
    candidates to filter).
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"colliding columns: {sorted(clash)}")

    def bucket_of(col):
        return (F.datediff(F.col(col).cast("date"), F.lit(_EPOCH).cast("date")) / bucket_days).cast(
            "long"
        )

    p = points.withColumn("_pb", bucket_of(point_time))
    i = intervals.withColumn(
        "_ib", F.explode(F.sequence(bucket_of(start), bucket_of(end)))
    )
    joined = p.join(i, p["_pb"] == i["_ib"]).where(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.drop("_pb", "_ib")
