"""Similarity search over embedding columns (SURVEY.md SS2.11).

- ``brute_force_topk``: exact cosine top-k. One scan + TakeOrderedAndProject
  (sort+limit never materializes a global sort). The correctness baseline.
- ``lsh_ann_topk``: BucketedRandomProjectionLSH approximate variant --
  the 100TB path: random-projection bucketing turns the scan into a
  bucket-pruned candidate join. Seeded; rows-only correctness check.
- ``cosine_pairs``: exact all-pairs cosine near-dup (the embedding twin
  of shingle_jaccard_pairs); ``lsh_neardup_pairs`` is its LSH-bucketed
  scale path.
- ``ivf_topk``: inverted-file ANN -- deterministic Lloyd centroids,
  cluster-pruned probe. Only the tiny centroid table (nlist x dim) ever
  reaches the driver; vectors stay distributed.
"""

from __future__ import annotations

import math

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine


def write_index_marker(spark, path: str, tag: str) -> None:
    """Write a tiny completion-marker file at ``{path}/_INDEX_COMPLETE``
    through the Hadoop FileSystem API, so the marker works on ANY path
    scheme the index artifacts themselves were written to (file:,
    hdfs://, s3a://...). Overwrites an existing marker (idempotent
    rebuild)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_INDEX_COMPLETE")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(f"{tag}\n", "utf-8"))
    finally:
        out.close()


def index_marker_exists(spark, path: str) -> bool:
    """True iff the completion marker is present -- the rebuild-skip
    check, scheme-agnostic like the writer."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_INDEX_COMPLETE")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    Scores rounded to 4dp before ranking (ties broken by id) so results
    are stable across engines and partitionings.

    The query-vector norm is a CONSTANT, but Catalyst does not
    constant-fold higher-order aggregates, so an in-plan
    ``l2_norm(query)`` would re-reduce the d-element literal on every
    row (~1/3 of the per-row HOF work). Precompute it in Python with
    the same left-to-right double accumulation the in-plan HOF uses --
    bit-identical, so scores cannot move even at a 4dp rounding edge.
    """
    from math import sqrt

    from ..functions.vectors import dot, l2_norm

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    acc = 0.0
    for x in query_vec:  # plain sequential sum == the HOF's fold order
        acc = acc + float(x) * float(x)
    q_norm = sqrt(acc)
    v = as_double_array(vec_col)
    scored = embeddings.select(
        F.col(id_col),
        F.round(dot(v, as_double_array(q)) / (l2_norm(v) * F.lit(q_norm)), 4).alias(
            "score"
        ),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-projection LSH bucket pruning.

    ``approxNearestNeighbors`` probes only matching hash buckets --
    sub-linear candidate sets at scale. Returns (id, eucl_dist).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col), array_to_vector(as_double_array(vec_col)).alias("_v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed,
    ).fit(vecs)
    from pyspark.ml.linalg import Vectors

    res = lsh.approxNearestNeighbors(vecs, Vectors.dense(query_vec), k, distCol="dist")
    return res.select(id_col, F.round("dist", 4).alias("dist"))


def pinned_rp_ann_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 4,
    dims: int = 64,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection (SimHash-for-angles) ANN cosine top-k
    under a PINNED projection matrix -- the oracle-paired twin of
    ``lsh_ann_topk`` (r12 verdict item #3: the ``pq_adc_topk``
    pinned-parameter playbook applied to the RP rung; the pyspark.ml
    variant stays for API parity, its JVM RNG is not SQL-mirrorable).

    The projection matrix is DERIVED, not stored: coefficient
    c(t, p, dim) = md5-fold('rp:t:p:dim') % 19 - 9, an integer in
    [-9, 9] computed identically by both engines from ``range()`` --
    O(tables*planes*dims) rows built once and broadcast, never O(n)
    hashing. Coordinates quantize at 1e-4 (exact BIGINTs, the
    ``kmeans_iteration`` discipline), each vector gets ``n_tables``
    sign-bit bucket codes (bit p of table t = [sum_dim c*q >= 0]),
    and candidates are vectors sharing the query's bucket in ANY
    table -- recall 1-(1-a^p)^t for per-plane agreement a = 1-theta/pi,
    the Goemans-Williamson identity. Candidates then re-rank by EXACT
    quantized cosine: BIGINT dot and norms, one sqrt/divide at the
    end evaluated identically on both engines (the ``int8_cosine_topk``
    precedent, same fixed-length input contract). Everything is an
    equi-join (the probe side joins on (table, bucket) -- multi-table
    union, never a Hamming theta-join), so no nested-loop anywhere.

    Scale shape: one posexplode of the corpus (persisted: signature
    pass + re-rank pass), a broadcast join against the
    tables*planes*dims projection frame with a map-side-combined sum,
    and a candidate-only re-rank -- the full-corpus work is linear
    narrow maps + combinable aggs; only candidate rows (~n/2^planes
    per table) reach the scoring join. Returns (vec_id, dot_q, score):
    exact BIGINT dot against the query plus the cosine rounded 6dp,
    ranked unrounded with vec_id tiebreak.
    """
    spark = embeddings.sparkSession
    ex = (
        embeddings.select(
            F.col(id_col), F.posexplode(vec_col).alias("pos", "vf")
        )
        .select(
            id_col,
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("vf").cast("double") * 10000)
            .cast("long")
            .alias("q"),
        )
        .persist()
    )
    fold = lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")  # noqa: E731
    proj = spark.range(n_tables * n_planes * dims).select(
        (F.col("id") / (n_planes * dims)).cast("long").alias("t"),
        ((F.col("id") / dims).cast("long") % n_planes).alias("p"),
        (F.col("id") % dims + 1).alias("dim"),
        (
            fold(
                F.concat_ws(
                    ":",
                    F.lit("rp"),
                    (F.col("id") / (n_planes * dims)).cast("long"),
                    ((F.col("id") / dims).cast("long") % n_planes),
                    (F.col("id") % dims + 1),
                )
            )
            % 19
            - 9
        ).alias("c"),
    )
    sums = (
        ex.join(F.broadcast(proj), "dim")
        .groupBy(id_col, "t", "p")
        .agg(F.sum(F.col("c") * F.col("q")).alias("s"))
    )
    sigs = sums.groupBy(id_col, "t").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(1L, CAST(p AS INT))"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("bucket")
    )
    probes = sigs.where(F.col(id_col) == query_id).select("t", "bucket")
    cand = (
        sigs.join(F.broadcast(probes), ["t", "bucket"])
        .select(id_col)
        .distinct()
    )
    qd = ex.where(F.col(id_col) == query_id).select(
        "dim", F.col("q").alias("d")
    )
    scored = (
        ex.join(cand, id_col)
        .join(F.broadcast(qd), "dim")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("q") * F.col("d")).cast("long").alias("dot_q"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("nq"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("nd"),
        )
    )
    raw = F.col("dot_q").cast("double") / F.sqrt(
        F.col("nq").cast("double") * F.col("nd").cast("double")
    )
    return (
        scored.withColumn("_raw", raw)
        .orderBy(F.col("_raw").desc(), id_col)
        .limit(k)
        .select(id_col, "dot_q", F.round("_raw", 6).alias("score"))
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: every (a < b) pair with
    ``round(cosine, 4) >= threshold``.

    This is a deliberate O(n^2) nested-loop join -- the exact ground
    truth / final-verification stage. The corpus-scale candidate
    generator is ``lsh_neardup_pairs`` (same contract, LSH-bucketed);
    running this exact verifier on LSH candidates instead of all pairs
    is the production composition, mirroring minhash_banded_pairs.
    """
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    )
    a = e.select(F.col("_id").alias("vec_a"), F.col("_v").alias("va"))
    b = e.select(F.col("_id").alias("vec_b"), F.col("_v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_neardup_pairs(
    embeddings: DataFrame,
    cos_threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 1.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs -- the scale path for
    ``cosine_pairs``.

    Vectors are L2-normalized so cosine converts exactly to euclidean
    distance (``d^2 = 2 - 2*cos``); ``approxSimilarityJoin`` then only
    compares vectors sharing a random-projection bucket, and every
    candidate is exactly verified against the distance threshold -- so
    like the MinHash path, LSH affects recall only, never precision.
    Seeded hash family => rows-only correctness check.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from ..functions.vectors import l2_norm

    dist_threshold = math.sqrt(max(0.0, 2.0 - 2.0 * cos_threshold))
    norm = (
        embeddings.select(
            F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_a")
        )
        .withColumn("_n", l2_norm(F.col("_a")))
        .select(
            "_id",
            array_to_vector(
                F.transform(F.col("_a"), lambda x: x / F.col("_n"))
            ).alias("_v"),
        )
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed,
    ).fit(norm)
    pairs = lsh.approxSimilarityJoin(norm, norm, dist_threshold, distCol="_d")
    return (
        pairs.where(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("vec_a"),
            F.col("datasetB._id").alias("vec_b"),
            F.round(1.0 - F.col("_d") * F.col("_d") / 2.0, 4).alias("cos_sim"),
        )
    )


def rp_neardup_pairs_pinned(
    embeddings: DataFrame,
    cos_threshold: float = 0.45,
    n_tables: int = 6,
    n_planes: int = 3,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via PINNED sign-random-projection
    bucketing + exact quantized-cosine verification -- the
    oracle-paired twin of ``lsh_neardup_pairs`` (r12 verdict item #3;
    the pyspark.ml variant stays for API parity, its JVM RNG is not
    SQL-mirrorable). Same projection-derivation idiom as
    ``pinned_rp_ann_topk`` (coefficients = md5-fold('nd:t:p:dim') %
    19 - 9 over ``range()``, computed identically by both engines)
    but tuned for the PAIR workload: 6 tables x 3 sign planes, so a
    true pair at angle theta collides in >= 1 table with
    1 - (1 - a^3)^6 for per-plane agreement a = 1 - theta/pi (~0.85
    at the 0.45-cosine threshold). Candidates sharing any (table,
    bucket) are verified by EXACT integer arithmetic -- BIGINT dots
    and norms of the 1e-4-quantized coordinates, one sqrt/divide at
    the end -- so bucketing affects recall only, never precision, and
    a DuckDB twin reproduces every candidate and score bit-for-bit.

    Scale shape: one cached explode for the signature pass, the
    1152-row projection frame broadcast, signature aggs map-side
    combinable, the bucket self-join a scalar equi-join, and
    verification touches candidate pairs only -- computed as
    whole-array integer HOF dots (zip_with + aggregate on the
    quantized arrays), never a dim-exploded pair join (64x the
    shuffle for the same integers).

    HONEST SELECTIVITY NOTE: at this LOW threshold (0.45 ~ 63 deg)
    on isotropic synthetic embeddings, 6x3 sign planes admit ~55% of
    all pairs as candidates -- the exact-verify makes that correct
    but not sub-quadratic. Sign-LSH selectivity is a function of the
    threshold angle: at a real near-dup bar (cos >= 0.9, per-plane
    agreement ~0.86) the same 3-plane tables collide true pairs at
    0.64/table while background pairs collapse, and at corpus scale
    ``n_planes`` must grow ~log(n) with ``n_tables`` compensating
    recall -- the standard LSH dial, exposed as parameters here."""
    # Signature pass as PER-ROW integer HOF dots against LITERAL
    # coefficient arrays (r15 optimization round, guide §2.4 "remove
    # shuffles outright"): the md5-derived projection is a pure
    # function of (t, p, dim) -- a 1,152-int query PARAMETER, not data
    # -- so it is derived driver-side (hashlib.md5 == Spark md5,
    # bit-identical ints) and inlined. The r14 shape posexploded every
    # vector (|N| x 64 rows), broadcast-joined the projection frame
    # (x18 fan-out: |N| x 1,152 rows) and re-aggregated through TWO
    # hash exchanges just to compute 18 dot products per vector; the
    # fold computes the same exact BIGINT sums inside the row -- zero
    # exchanges before the bucket self-join (plan: 3 Exchanges -> 1,
    # the candidate distinct). Same derivation string
    # ('nd:t:p:dim', dim 1-based), same % 19 - 9 range, same >= 0 sign
    # rule and bit packing -- signature integers are BIT-IDENTICAL, so
    # candidates, verification and output are unchanged. Assumes
    # fixed-width ``dims`` vectors (already this operator's contract).
    import hashlib

    def _fold(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    spark = embeddings.sparkSession
    n_proj = n_tables * n_planes
    # one broadcastable row per dimension, carrying ALL that
    # dimension's coefficients as an array indexed by t*n_planes + p
    cdim = spark.createDataFrame(
        [
            (
                d,
                [
                    _fold(f"nd:{t}:{p}:{d}") % 19 - 9
                    for t in range(n_tables)
                    for p in range(n_planes)
                ],
            )
            for d in range(1, dims + 1)
        ],
        "dim long, cs array<long>",
    )
    ex = embeddings.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "vf")
    ).select(
        id_col,
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("vf").cast("double") * 10000).cast("long").alias("q"),
    )
    # 18 codegen'd SUM aggregates over ONE |N| x dims exploded frame --
    # the r14 shape joined a (t, p, dim) projection frame instead,
    # fanning out to |N| x dims x 18 rows and re-aggregating through
    # TWO hash exchanges; this computes the same exact BIGINT sums
    # with an 18x narrower join and ONE exchange (guide §2.3/§2.4).
    # (Full HOF and giant-scalar-expression forms were both tried and
    # REVERTED: zip_with/aggregate folds are CodegenFallback --
    # interpreted per element, 2x slower end to end -- and a literal
    # 1,152-term expression tree falls out of whole-stage codegen
    # entirely, 8x slower.)
    sums = (
        ex.join(F.broadcast(cdim), "dim")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.col("q") * F.col("cs").getItem(k)).alias(f"_s{k}")
                for k in range(n_proj)
            ]
        )
    )
    sig_structs = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            bucket = bucket + F.when(
                F.col(f"_s{t * n_planes + p}") >= 0,
                F.lit(1 << p).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        sig_structs.append(
            F.struct(
                F.lit(t).cast("long").alias("t"), bucket.alias("bucket")
            )
        )
    sigs = (
        sums.select(id_col, F.explode(F.array(*sig_structs)).alias("_tb"))
        .select(id_col, F.col("_tb.t").alias("t"), F.col("_tb.bucket").alias("bucket"))
    )
    # EXPANSION-STAGE PARALLELISM (r15, guide §2.5 spirit): the bucket
    # self-join fans 2 x |N| x tables signature rows out to ~|bucket|^2
    # candidate pairs, but its INPUT is a few hundred KB -- AQE's
    # byte-stat partition coalescing (correct for bytes, blind to
    # Generate/join fan-out) collapses the feeding exchanges to ~1
    # partition and the whole expand + verify chain ran single-threaded
    # (measured: the full query 17.8 s with coalescing on vs 4.2 s
    # off). Fix, scale-adaptively and only here: pin the expand input
    # to ``defaultParallelism`` partitions with an explicit
    # numPartitions repartition (REPARTITION_BY_NUM is exempt from AQE
    # coalescing by design), and BROADCAST the build side of the
    # self-join so the probe side's spread partitioning carries
    # through the expansion, the pair dedup (repartitioned on the pair
    # key, so the dedup aggregate and the verify run in that same
    # spread stage) and the dot computation.
    n_spread = embeddings.sparkSession.sparkContext.defaultParallelism
    a = sigs.repartition(n_spread, F.col(id_col)).alias("a")
    b = F.broadcast(sigs).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .repartition(n_spread, F.col("vec_a"), F.col("vec_b"))
        .dropDuplicates()
    )
    # verify via whole-array integer HOF dots, not a dim-exploded join
    # (the exploded form shuffles candidates x dims rows -- 64x blowup,
    # measured 8.1s at sf0.1): zip_with+aggregate computes the same
    # exact BIGINT dot inside one projection after two narrow
    # array-joins, identical output integers. (An explicit 64-term
    # element_at sum was tried and reverted: micro-benched 3.2 s vs
    # 0.54 s for the HOF fold on 1.1M materialized pairs -- per-call
    # bounds/null handling beats the fold only in giant-expression
    # pathologies; the single-threading fixed above was the real cost.)
    qarr = embeddings.select(
        F.col(id_col),
        F.transform(
            vec_col,
            lambda v: F.round(v.cast("double") * 10000).cast("long"),
        ).alias("qs"),
    ).select(
        id_col,
        "qs",
        F.aggregate(
            F.transform("qs", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n2"),
    )

    dots = (
        cand.join(
            F.broadcast(
                qarr.select(
                    F.col(id_col).alias("vec_a"),
                    F.col("qs").alias("qa"),
                    F.col("n2").alias("na"),
                )
            ),
            "vec_a",
        )
        .join(
            F.broadcast(
                qarr.select(
                    F.col(id_col).alias("vec_b"),
                    F.col("qs").alias("qb"),
                    F.col("n2").alias("nb"),
                )
            ),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.aggregate(
                F.zip_with("qa", "qb", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot"),
            "na",
            "nb",
        )
    )
    cos = F.round(
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        4,
    )
    return (
        dots.withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= cos_threshold)
        .select("vec_a", "vec_b", "cos_sim")
        .orderBy("vec_a", "vec_b")
    )


def _ivf_cent_lit(cs):
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cs])


def _ivf_assign(df: DataFrame, cs: list) -> DataFrame:
    """argmin over squared euclidean vs a broadcast centroid literal;
    ties -> lowest cluster index (deterministic)."""
    dists = F.transform(
        _ivf_cent_lit(cs),
        lambda c: F.aggregate(
            F.zip_with(F.col("_v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        df.withColumn("_dists", dists)
        .withColumn(
            "cluster", F.array_position(F.col("_dists"), F.array_min("_dists")) - 1
        )
        .drop("_dists")
    )


def _ivf_means(assigned: DataFrame) -> dict:
    """Per-cluster element-wise mean via posexplode/groupBy; only the
    nlist x dim table crosses the driver boundary."""
    means = (
        assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pairs"))
        .select(
            "cluster",
            F.transform(F.col("pairs"), lambda p: p.getField("m")).alias("c"),
        )
        .collect()
    )
    return {int(r.cluster): list(r.c) for r in means}


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: deterministic k-means
    coarse quantizer + cluster-pruned exact search.

    Training: centroids init from the ``nlist`` lowest-id vectors, then
    ``iters`` Lloyd steps run as DataFrame jobs (assign = argmin over a
    broadcast centroid literal; update = element-wise mean via
    posexplode/groupBy). Only the nlist x dim centroid table crosses the
    driver boundary per step -- the vectors themselves never collect, so
    the same code trains on 10^9 vectors. Deterministic end to end: seeded
    by ids, argmin ties broken by centroid index, means order-independent.

    Search: probe the ``nprobe`` centroids nearest the query (driver-side
    math on the tiny centroid table), scan only vectors assigned to those
    clusters (a partition-prunable filter when the assignment is written
    out partitioned by cluster), exact cosine within the probed subset.
    """
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    )
    cents = [
        list(r._v)
        for r in e.orderBy("_id").limit(nlist).collect()
    ]

    for _ in range(iters):
        assigned = _ivf_assign(e, cents)
        by_cluster = _ivf_means(assigned)
        cents = [by_cluster.get(i, cents[i]) for i in range(nlist)]

    # driver-side probe selection on the tiny centroid table
    def sq_dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe_order = sorted(range(len(cents)), key=lambda i: (sq_dist(cents[i], query_vec), i))
    probes = probe_order[:nprobe]

    assigned = _ivf_assign(e, cents).where(F.col("cluster").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.select(
            F.col("_id").alias(id_col),
            F.round(cosine(F.col("_v"), q), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk_pinned(
    embeddings: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF serve path under a PINNED coarse quantizer, oracle-paired
    end to end -- the ``pq_adc_topk`` playbook applied to the
    inverted-file rung (r12 verdict item #3): IVF SERVING is pure
    arithmetic under a fixed centroid table, so the pairing needs no
    SQL Lloyd unroll; training quality stays pytest territory exactly
    as for PQ. The quantizer is the seed state of ``ivf_topk``'s
    trainer (the ``nlist`` lowest-id vectors, Lloyd iters=0).

    Every step is exact BIGINT arithmetic both engines reproduce
    bit-for-bit: coordinates quantize at 1e-4; ASSIGN = argmin of the
    integer squared distance to the 16 seed centroids (ties to the
    lowest centroid id -- the ``_pq_assign`` rule); PROBE = the
    ``nprobe`` centroids nearest the query by the same integer d2
    (ties to the lowest id); the scan re-ranks only vectors assigned
    to probed cells by exact integer d2 to the query. Returns
    (vec_id, cell, d2): the probed-cell membership AND the distance
    are both hash-checked.

    Scale shape: one cached explode of the corpus (assign + scan
    consume it); the centroid frame (nlist x dim rows) and the probe
    list broadcast; assign is one map-side-combinable agg + a
    WindowGroupLimit argmin; the re-rank join touches only probed-cell
    rows (~ nprobe/nlist of the corpus). No UDF, no driver loop."""
    from pyspark.sql import Window

    ex = (
        embeddings.select(
            F.col(id_col), F.posexplode(vec_col).alias("pos", "vf")
        )
        .select(
            id_col,
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("vf").cast("double") * 10000)
            .cast("long")
            .alias("q"),
        )
        .persist()
    )
    cents = ex.where(F.col(id_col) < nlist).select(
        F.col(id_col).cast("long").alias("cell"),
        "dim",
        F.col("q").alias("c"),
    )
    diff = F.col("q") - F.col("c")
    d2 = (
        ex.join(F.broadcast(cents), "dim")
        .groupBy(id_col, "cell")
        .agg(F.sum(diff * diff).alias("_d2"))
    )
    w = Window.partitionBy(id_col).orderBy("_d2", "cell")
    assigned = (
        d2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "cell")
    )
    # probe selection: the query's OWN integer d2 to every centroid,
    # nprobe smallest (ties to lowest cell) -- a 16-row frame, never
    # a driver-side float loop
    qd = ex.where(F.col(id_col) == query_id).select(
        "dim", F.col("q").alias("d")
    )
    qdiff = F.col("d") - F.col("c")
    probes = (
        F.broadcast(cents)
        .join(F.broadcast(qd), "dim")
        .groupBy("cell")
        .agg(F.sum(qdiff * qdiff).alias("qd2"))
        .orderBy("qd2", "cell")
        .limit(nprobe)
        .select("cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell")
    rdiff = F.col("q") - F.col("d")
    return (
        ex.join(cand, id_col)
        .join(F.broadcast(qd), "dim")
        .groupBy(id_col, "cell")
        .agg(F.sum(rdiff * rdiff).cast("long").alias("d2"))
        .orderBy("d2", id_col)
        .limit(k)
        .select(id_col, "cell", "d2")
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization -- the vector-index
    compression step (4x smaller than float32, 8x smaller than the
    double Spark would otherwise carry): ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` in [-127, 127], dequantized value
    ``q_i * scale`` is within ``scale/2`` of ``x_i`` per dimension --
    the bound the test pins.

    Pure HOF projection (no shuffle, no UDF): the quantized corpus is
    what a 100 TB index actually stores and scans; exact re-scoring of
    a candidate set (``ivf_topk``'s verify stage) dequantizes on the
    fly. Zero vectors keep scale 0 and quantize to all-zeros.
    """
    x = as_double_array(vec_col)
    scale = F.array_max(F.transform(x, F.abs)) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(x, lambda v: F.lit(0).cast("int"))).otherwise(
        F.transform(x, lambda v: F.round(v / scale).cast("int"))
    )
    return embeddings.select(
        F.col(id_col), scale.alias("scale"), q.alias("q_embedding")
    )


def quantized_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``brute_force_topk`` over the int8-quantized corpus: score =
    cosine(dequantized, query). The ranking error is bounded by the
    quantization error (<= scale/2 per dim), so top-k overlap with the
    exact ranking stays high -- pinned by test, the same contract the
    LSH/IVF paths carry. Same TakeOrderedAndProject shape; the scan
    reads int8 + one float per vector instead of 4-byte floats.
    """
    qz = quantize_embeddings(embeddings, id_col, vec_col)
    deq = F.transform("q_embedding", lambda v: v.cast("double") * F.col("scale"))
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = qz.select(
        F.col(id_col),
        F.round(cosine(deq, as_double_array(qv)), 4).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index ``ivf_topk`` trains per call: the
    production posture is train ONCE, write the assignment table
    PARTITIONED BY cluster (so a probe scans only its clusters'
    directories -- partition pruning does the inverted-file lookup) and
    the nlist x dim centroid table beside it, then serve every query
    from the artifact. Same deterministic Lloyd trainer; layout:

        {path}/assignments/cluster=N/...   (id, vector)
        {path}/centroids/                  (cluster, centroid)
    """
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    )
    cents = [list(r._v) for r in e.orderBy("_id").limit(nlist).collect()]
    for _ in range(iters):
        assigned = _ivf_assign(e, cents)
        by_cluster = _ivf_means(assigned)
        cents = [by_cluster.get(i, cents[i]) for i in range(nlist)]
    spark = embeddings.sparkSession
    (
        _ivf_assign(e, cents)
        .select("_id", "_v", "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/assignments")
    )
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cluster int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve a top-k from a persisted IVF index: probe selection is
    driver-side math on the tiny centroid table; the assignment scan
    filters ``cluster IN probes``, which partition-prunes to the probed
    directories (asserted by plan test) -- the inverted-file property
    realized with nothing but the partitioned layout."""
    cents = {
        int(r.cluster): list(r.centroid)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    order = sorted(
        cents, key=lambda i: (sum((x - y) ** 2 for x, y in zip(cents[i], query_vec)), i)
    )
    probes = order[:nprobe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(f"{path}/assignments")
        .where(F.col("cluster").isin(probes))
        .select(
            F.col("_id").alias(id_col),
            F.round(cosine(F.col("_v"), q), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _pq_subframe(e: DataFrame, m: int, sub: int) -> DataFrame:
    """Explode each vector into its ``m`` subvectors: (id, j, _v)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.slice("_v", j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    return (
        e.select("_id", F.explode(pairs).alias("p"))
        .select("_id", F.col("p.j").alias("j"), F.col("p.sv").alias("_v"))
    )


def _l2_normalized(e: DataFrame) -> DataFrame:
    """(_id, _v) with _v L2-normalized (zero vectors stay zero).
    Squared euclidean on the unit sphere is monotone in cosine
    (||a-b||^2 = 2 - 2cos), so quantizer training/ADC on normalized
    vectors tracks the cosine objective exact re-ranking scores."""
    norm = F.sqrt(
        F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return e.select(
        "_id",
        F.transform(
            "_v", lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
        ).alias("_v"),
    )


def _pq_book_lit(books: dict, m: int):
    """The m x ksub x sub codebook as a nested array literal."""
    return F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(x)) for x in c]) for c in books[j]]
            )
            for j in range(m)
        ]
    )


def _pq_assign(frame: DataFrame, books: dict, m: int) -> DataFrame:
    """Nearest-sub-centroid code per (id, j) row; argmin ties resolve
    to the lowest code (array_position takes the first minimum)."""
    mine = F.element_at(_pq_book_lit(books, m), F.col("j") + 1)
    dists = F.transform(
        mine,
        lambda c: F.aggregate(
            F.zip_with(F.col("_v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        frame.withColumn("_dists", dists)
        .withColumn(
            "code",
            F.array_position(F.col("_dists"), F.array_min("_dists")) - 1,
        )
        .drop("_dists")
    )


def _pq_train(sf: DataFrame, m: int, ksub: int, iters: int) -> dict:
    """Deterministic Lloyd over ALL subspaces at once (the subspace id
    rides the cluster key): one assign job + one means job per
    iteration regardless of m; only the m x ksub x sub codebook ever
    reaches the driver. Seeded by the ksub lowest-id subvectors."""
    seeds = (
        sf.orderBy("j", "_id")
        .groupBy("j")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("_id", "_v"))), 1, ksub
            ).alias("s")
        )
        .select("j", F.transform("s", lambda p: p.getField("_v")).alias("cs"))
        .collect()
    )
    books = {int(r.j): [list(c) for c in r.cs] for r in seeds}
    for _ in range(iters):
        assigned = _pq_assign(sf, books, m)
        means = (
            assigned.select("j", "code", F.posexplode("_v").alias("pos", "x"))
            .groupBy("j", "code", "pos")
            .agg(F.avg("x").alias("mn"))
            .groupBy("j", "code")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "mn"))).alias("ps")
            )
            .select(
                "j",
                "code",
                F.transform("ps", lambda p: p.getField("mn")).alias("c"),
            )
            .collect()  # bounded: m x ksub x sub codebook only
        )
        got = {(int(r.j), int(r.code)): list(r.c) for r in means}
        # len(books[j]) may be < ksub on a tiny corpus (seeded by the
        # lowest-id subvectors): iterate what exists, not the nominal k
        books = {
            j: [got.get((j, i), books[j][i]) for i in range(len(books[j]))]
            for j in range(m)
        }
    return books


def _pq_encode(sf: DataFrame, books: dict, m: int) -> DataFrame:
    """(_id, codes array<int>) -- the compressed representation."""
    return (
        _pq_assign(sf, books, m)
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("jc"))
        .select(
            "_id",
            F.transform("jc", lambda p: p.getField("code")).alias("codes"),
        )
    )


def _pq_adc_expr(books: dict, query_vec: list, m: int, sub: int):
    """ADC score column over a ``codes`` column: the query's distance
    to every sub-centroid folds into an m x ksub literal table; a
    vector's approximate distance is sum_j table[j][code_j]."""
    table = [
        [
            sum(
                (query_vec[j * sub + t] - books[j][i][t]) ** 2
                for t in range(sub)
            )
            for i in range(len(books[j]))
        ]
        for j in range(m)
    ]
    tlit = F.array(
        *[F.array(*[F.lit(float(d)) for d in row]) for row in table]
    )
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            tlit,
            lambda c, row: F.element_at(row, c.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ADC top-k -- the vector-index COMPRESSION
    rung of the ANN ladder (brute force -> LSH -> IVF -> int8 -> PQ):
    each vector is encoded as ``m`` sub-codebook codes (here 8 bytes
    for a 64-dim vector, 32x smaller than float32), and search scores
    candidates by Asymmetric Distance Computation -- the query's
    distance to each sub-centroid is precomputed once into an
    ``m x ksub`` table and a vector's approximate distance is just
    ``sum_j table[j][code_j]``, no float vector ever touched.

    Training is one deterministic Lloyd loop over ALL subspaces at once
    (the subspace id rides the cluster key), so the per-iteration cost
    is ONE assign job + ONE means job regardless of ``m`` -- and only
    the ``m x ksub x (dim/m)`` codebook (= dim * ksub floats, 1k
    doubles here) ever reaches the driver; seeded by lowest-id vectors,
    argmin ties to the lowest code, means order-independent -- fully
    deterministic, like IVF. ADC candidates are exact-cosine re-ranked
    (top ``rerank``), so quantization affects recall only, never the
    reported scores (the engine-wide LSH discipline).
    """
    dim = len(query_vec)
    sub = dim // m
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    ).persist()
    # codebooks/ADC run on L2-NORMALIZED vectors (see _l2_normalized);
    # the exact re-rank itself uses the RAW vectors
    sf = _pq_subframe(_l2_normalized(e), m, sub).persist()
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    query_vec = [x / qn for x in query_vec]

    books = _pq_train(sf, m, ksub, iters)
    # encode: (id, array<code>) -- the 8-byte representation
    codes = _pq_encode(sf, books, m)
    # ADC table: driver-side math on the tiny codebook
    adc = _pq_adc_expr(books, query_vec, m, sub)
    cand = (
        codes.withColumn("_adc", adc)
        .orderBy(F.col("_adc").asc(), F.col("_id").asc())
        .limit(rerank)
        .select("_id")
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.join(e, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.round(cosine(F.col("_v"), q), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def build_pq_index(
    embeddings: DataFrame,
    path: str,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    nlist: int = 8,
    ivf_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF-PQ index (the standard public composition,
    non-residual variant): a coarse IVF quantizer partitions the CODES
    table by cluster (partition pruning IS the inverted-file lookup,
    exactly like ``build_ivf_index``) and the PQ codebook compresses
    each vector to ``m`` sub-codes -- at 100 TB the persisted artifact
    is codes + codebook (~32x smaller than the float vectors), not the
    vectors. ``pq_topk`` trains this per call; production trains ONCE
    here and serves every query from the artifact. Layout:

        {path}/codes/cluster=N/...  (_id, codes array<int>)
        {path}/codebooks/           (j, code, centroid array<double>)
        {path}/centroids/           (cluster, centroid) -- coarse IVF

    Fully deterministic (lowest-id seeding, first-min argmin,
    order-independent means): rebuilding from the same data yields a
    bit-identical index, and serving equals in-memory training with the
    same hyperparameters (both pinned by tests).
    """
    spark = embeddings.sparkSession
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    )
    en = _l2_normalized(e).persist()
    dim = en.select(F.size("_v").alias("d")).first().d
    sub = dim // m
    # coarse IVF on the normalized vectors (same trainer as ivf_topk)
    cents = [list(r._v) for r in en.orderBy("_id").limit(nlist).collect()]
    for _ in range(ivf_iters):
        by_cluster = _ivf_means(_ivf_assign(en, cents))
        cents = [by_cluster.get(i, cents[i]) for i in range(nlist)]
    assigned = _ivf_assign(en, cents).select("_id", "cluster")
    # PQ codebook + codes over the full corpus (one global codebook --
    # the non-residual IVFPQ variant: codes are comparable across
    # clusters, so one ADC table serves any probe set)
    sf = _pq_subframe(en, m, sub).persist()
    books = _pq_train(sf, m, ksub, iters)
    (
        _pq_encode(sf, books, m)
        .join(assigned, "_id")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/codes")
    )
    spark.createDataFrame(
        [(j, i, books[j][i]) for j in books for i in range(len(books[j]))],
        "j int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cluster int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    # training-time quality floor for the drift gate: corpus size and
    # mean PQ quantization error under the just-trained codebook
    # (appends re-measure the same statistic on their batch; the RATIO
    # is the staleness signal -- public FAISS practice: add() encodes
    # under the fixed codebook, retrain when the distribution drifts)
    n_base = en.select("_id").distinct().count()
    spark.createDataFrame(
        [(int(n_base), float(_pq_mean_distortion(sf, books, m)))],
        "n_vectors long, mean_sq_distortion double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/build_stats")
    # top-level completion marker, written strictly AFTER the last
    # artifact: codes land first, so codes/_SUCCESS alone cannot tell
    # a finished index from one whose build crashed mid-way -- a
    # rebuild-skip keyed on it would serve a half-built index forever.
    # Written through the Hadoop FileSystem API so the marker lands on
    # whatever scheme the artifacts did (s3://, hdfs://, file:) -- a
    # local open() here would crash AFTER a successful remote build
    # and the rebuild-skip would then rebuild forever (r9 ADVICE).
    write_index_marker(spark, path, "ivfpq-v1")


def _pq_mean_distortion(sf: DataFrame, books: dict, m: int) -> float:
    """Mean (over vectors) total squared PQ quantization error under a
    FIXED codebook: sum over the m subspaces of the min squared
    distance to any sub-centroid. One double crosses the driver."""
    mine = F.element_at(_pq_book_lit(books, m), F.col("j") + 1)
    dists = F.transform(
        mine,
        lambda c: F.aggregate(
            F.zip_with(F.col("_v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    row = (
        sf.withColumn("_d", F.array_min(dists))
        .groupBy("_id")
        .agg(F.sum("_d").alias("_tot"))
        .agg(F.avg("_tot").alias("mean_d"))
        .first()
    )
    return float(row.mean_d if row.mean_d is not None else 0.0)


def _load_pq_artifacts(spark, path: str) -> tuple[dict, list, int, int]:
    """(codebooks, coarse centroids, m, sub) from a persisted index."""
    books_rows = spark.read.parquet(f"{path}/codebooks").collect()
    books: dict[int, list] = {}
    for r in sorted(books_rows, key=lambda r: (r.j, r.code)):
        books.setdefault(int(r.j), []).append(list(r.centroid))
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cents_map = {int(r.cluster): list(r.centroid) for r in cent_rows}
    cents = [cents_map[i] for i in range(len(cents_map))]
    m = len(books)
    dim = len(cents[0])
    return books, cents, m, dim // m


def append_to_pq_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally append new vectors to a persisted IVF-PQ index
    WITHOUT retraining: encode under the EXISTING codebook and coarse
    quantizer (exactly FAISS ``index.add`` semantics -- the codebook is
    fixed at train time; growth is cheap, retraining is a deliberate,
    drift-gated event) and append the new codes under the same
    ``cluster=N`` partition layout, so the serve path's partition
    pruning is oblivious to how many appends produced the table.

    Durability contract: the codes append lands FIRST, the append-log
    row second, so a crash between them leaves an index that SERVES
    correctly (the extra codes are valid) but under-reports staleness;
    a retried append can therefore double-append a batch. Codes are
    deterministic under a fixed codebook, so duplicates are IDENTICAL
    rows and the serve path's ``dropDuplicates(_id)`` makes the read
    exactly-once over an at-least-once append -- the standard
    idempotent-read discipline.

    Returns ``{"seq", "n_appended", "mean_sq_distortion"}``; feed
    :func:`pq_index_staleness` to decide when to retrain.
    """
    spark = embeddings.sparkSession
    if not index_marker_exists(spark, path):
        raise ValueError(
            f"no complete IVF-PQ index at {path} (missing _INDEX_COMPLETE)"
        )
    books, cents, m, sub = _load_pq_artifacts(spark, path)
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    )
    en = _l2_normalized(e).persist()
    assigned = _ivf_assign(en, cents).select("_id", "cluster")
    sf = _pq_subframe(en, m, sub).persist()
    n = en.select("_id").distinct().count()
    (
        _pq_encode(sf, books, m)
        .join(assigned, "_id")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{path}/codes")
    )
    distortion = _pq_mean_distortion(sf, books, m)
    try:
        prev = (
            spark.read.parquet(f"{path}/append_log")
            .agg(F.max("seq").alias("mx"))
            .first()
            .mx
        )
        seq = int(prev or 0) + 1
    except AnalysisException:  # path not found: first append, no log yet.
        # Anything else (corruption, transient FS failure) PROPAGATES --
        # silently resetting seq to 1 on a transient error would fork
        # the sequence (r10 ADVICE item).
        seq = 1
    spark.createDataFrame(
        [(seq, int(n), float(distortion))],
        "seq int, n_appended long, mean_sq_distortion double",
    ).coalesce(1).write.mode("append").parquet(f"{path}/append_log")
    return {"seq": seq, "n_appended": int(n), "mean_sq_distortion": distortion}


def pq_index_staleness(
    spark,
    path: str,
    max_appended_fraction: float = 0.5,
    max_distortion_ratio: float = 1.5,
) -> dict:
    """Staleness report for an appended-to IVF-PQ index: how much of
    the corpus was encoded under a codebook that never saw it, and how
    much worse it quantizes than the training data did. Retrain is
    RECOMMENDED (never automatic -- it invalidates every persisted
    code) when either the appended fraction or the distortion ratio
    crosses its threshold; both thresholds follow public FAISS
    guidance that an index trained on a representative sample serves
    appends well until the distribution drifts."""
    try:
        log = spark.read.parquet(f"{path}/append_log")
        row = log.agg(
            F.sum("n_appended").alias("n"),
            (
                F.sum(F.col("n_appended") * F.col("mean_sq_distortion"))
                / F.sum("n_appended")
            ).alias("d"),
        ).first()
        appended, app_dist = int(row.n or 0), row.d
    except AnalysisException:  # path not found: never appended.
        # Anything else (corruption, transient FS failure) PROPAGATES --
        # a silent n_appended=0 would suppress a due retrain
        # recommendation (r10 ADVICE item).
        appended, app_dist = 0, None
    try:
        base = spark.read.parquet(f"{path}/build_stats").first()
        base_n, base_dist = int(base.n_vectors), float(base.mean_sq_distortion)
    except AnalysisException:  # pre-r10 index persisted without stats
        base_n, base_dist = None, None
    return staleness_report(
        base_n,
        base_dist,
        appended,
        None if app_dist is None else float(app_dist),
        max_appended_fraction,
        max_distortion_ratio,
    )


def staleness_report(
    base_n: int | None,
    base_dist: float | None,
    appended: int,
    app_dist: float | None,
    max_appended_fraction: float = 0.5,
    max_distortion_ratio: float = 1.5,
) -> dict:
    """The pure gate math of :func:`pq_index_staleness`, factored out
    so the decision logic is property-testable against an exact Python
    model without Spark I/O per example. Invariants the hypothesis
    suite pins: the weighted-mean inputs are the CALLER's (size-
    weighted across append batches); ``appended_fraction`` is
    monotone in ``appended`` and never exceeds 1; a missing side
    (no appends / pre-stats index) can WAIVE the ratio gate but never
    the fraction gate; recommendation is exactly the OR of the two
    threshold breaches."""
    total = (base_n or 0) + appended
    frac = (appended / total) if total else 0.0
    ratio = (
        float(app_dist) / base_dist
        if app_dist is not None and base_dist
        else None
    )
    return {
        "n_base": base_n,
        "n_appended": appended,
        "appended_fraction": round(frac, 6),
        "base_distortion": base_dist,
        "appended_distortion": app_dist,
        "distortion_ratio": round(ratio, 6) if ratio is not None else None,
        "retrain_recommended": frac > max_appended_fraction
        or (ratio is not None and ratio > max_distortion_ratio),
    }


def pq_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 50,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a top-k from a persisted IVF-PQ index: probe selection is
    driver-side math on the tiny coarse-centroid table, the codes scan
    partition-prunes to ``cluster IN probes``, and scoring is pure ADC
    over the m x ksub codebook -- NO float vector is read at all unless
    ``embeddings`` is passed, in which case the top-``rerank`` ADC
    candidates are exact-cosine re-ranked against the source vectors
    (the engine-wide approximate-candidates/exact-scores discipline).
    Without re-rank the score is the ADC cosine estimate
    ``1 - adc/2`` (squared euclidean on the unit sphere), rounded to
    4dp like every similarity score."""
    books_rows = spark.read.parquet(f"{path}/codebooks").collect()
    books: dict[int, list] = {}
    for r in sorted(books_rows, key=lambda r: (r.j, r.code)):
        books.setdefault(int(r.j), []).append(list(r.centroid))
    m = len(books)
    dim = len(query_vec)
    sub = dim // m
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    qv = [x / qn for x in query_vec]
    cents = {
        int(r.cluster): list(r.centroid)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    probes = sorted(
        cents, key=lambda i: (sum((x - y) ** 2 for x, y in zip(cents[i], qv)), i)
    )[:nprobe]
    # dropDuplicates(_id): a crash-retried append can land a batch
    # twice (see append_to_pq_index's durability contract); codes are
    # deterministic under the fixed codebook, so duplicates are
    # identical rows and any-wins dedup restores exactly-once reads.
    # It runs AFTER partition pruning, so the shuffle is bounded by
    # the probed clusters, not the corpus.
    codes = (
        spark.read.parquet(f"{path}/codes")
        .where(F.col("cluster").isin(probes))
        .dropDuplicates(["_id"])
    )
    adc = _pq_adc_expr(books, qv, m, sub)
    ranked = codes.withColumn("_adc", adc).orderBy(
        F.col("_adc").asc(), F.col("_id").asc()
    )
    if embeddings is None:
        return ranked.select(
            F.col("_id").alias(id_col),
            F.round(1 - F.col("_adc") / 2, 4).alias("score"),
        ).limit(k)
    cand = ranked.limit(rerank).select("_id")
    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    )
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        cand.join(e, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.round(cosine(F.col("_v"), q), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    recipe): cluster the embedding space with the deterministic IVF
    Lloyd quantizer, then WITHIN each cluster greedily keep the
    lowest-id vector of every cosine-``threshold`` neighborhood and
    drop the rest -- near-duplicate *meanings* collapse even when the
    surface text differs (the gap exact/minhash/simhash dedup cannot
    close).

    Returns one row per vector: ``(id_col, cluster, kept)``.

    Scale shape: candidate comparisons never leave a cluster --
    clustering bounds the quadratic greedy scan by the largest cluster,
    exactly like blocking in entity resolution (a degenerate cluster is
    re-split by raising ``nlist``, the salting move). The per-cluster
    scan is one Arrow-batched ``applyInPandas`` pass ordered by id
    (deterministic; greedy keep-set semantics are the throttle's, in
    vector space). Only the nlist x dim centroid table reaches the
    driver; vectors shuffle ONCE, on cluster id.
    """
    import numpy as np  # noqa: F401  (executor-side dependency)
    import pandas as pd  # noqa: F401

    # output id column keeps the CALLER's name and Spark type -- a
    # hardcoded "vec_id bigint" would silently mislabel (or Arrow-cast)
    # string/other id columns
    id_type = embeddings.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, cluster bigint, kept boolean"

    e = embeddings.select(
        F.col(id_col).alias("_id"), as_double_array(vec_col).alias("_v")
    ).persist()
    cents = [list(r._v) for r in e.orderBy("_id").limit(nlist).collect()]
    for _ in range(iters):
        assigned = _ivf_assign(e, cents)
        by = _ivf_means(assigned)
        cents = [by.get(i, cents[i]) for i in range(len(cents))]
    assigned = _ivf_assign(e, cents)

    def prune(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("_id")
        vs = np.array([list(v) for v in pdf["_v"]], dtype="float64")
        norms = np.linalg.norm(vs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vs / norms[:, None]
        kept_idx: list[int] = []
        kept_flags = []
        for i in range(len(pdf)):
            if kept_idx and (unit[kept_idx] @ unit[i]).max() > threshold:
                kept_flags.append(False)
            else:
                kept_flags.append(True)
                kept_idx.append(i)
        return pd.DataFrame(
            {
                # passthrough, no astype: Arrow maps the pandas values
                # onto the declared (input-derived) Spark type
                id_col: pdf["_id"],
                "cluster": pdf["cluster"].astype("int64"),
                "kept": kept_flags,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(prune, out_schema)


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell/Goldstein 1998) diverse
    top-k: greedily pick the candidate maximizing ``lam * rel -
    (1 - lam) * max_sim_to_selected`` -- the diversity-aware retrieval
    RAG pipelines run so the k results aren't k paraphrases of the
    same document.

    Scale shape: relevance scoring + top-``pool`` candidate selection
    are fully distributed (TakeOrderedAndProject, same plan as
    ``brute_force_topk``; at 100 TB the pool comes from the IVF/PQ
    index paths instead); ONLY the bounded pool (pool x dim doubles,
    like the nlist centroid collects) reaches the driver, where the
    O(k * pool) greedy runs with deterministic lowest-id tie-breaks.
    Approximate-by-objective (no SQL twin for the greedy), so the
    queries() entry is rows-only; determinism and the
    diversity-beats-redundancy contract are pinned by tests.
    """
    from math import sqrt

    cand = brute_force_topk(
        embeddings, query_vec, k=pool, id_col=id_col, vec_col=vec_col
    )
    pooled = (
        embeddings.select(F.col(id_col), as_double_array(vec_col).alias("_v"))
        .join(cand, id_col)
        .select(id_col, "score", "_v")
        .collect()
    )
    rows = sorted(
        ((r[id_col], float(r["score"]), list(r["_v"])) for r in pooled),
        key=lambda t: (-t[1], t[0]),
    )

    def unit(v):
        n = sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    vecs = {i: unit(v) for i, _, v in rows}
    selected: list[tuple[int, float, float]] = []
    chosen: set = set()
    while rows and len(selected) < k:
        best = None
        for i, rel, _ in rows:
            if i in chosen:
                continue
            max_sim = max(
                (
                    sum(a * b for a, b in zip(vecs[i], vecs[j]))
                    for j, _, _ in selected
                ),
                default=0.0,
            )
            mmr = lam * rel - (1.0 - lam) * max_sim
            # deterministic: strictly-better score wins, then lowest id
            if best is None or mmr > best[1] + 1e-12 or (
                abs(mmr - best[1]) <= 1e-12 and i < best[0]
            ):
                best = (i, mmr, rel)
        if best is None:
            break
        chosen.add(best[0])
        selected.append(best)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [
            (rank + 1, i, round(rel, 4), round(mmr, 4))
            for rank, (i, mmr, rel) in enumerate(selected)
        ],
        f"rank long, {id_col} long, score double, mmr_score double",
    )


def mmr_topk_exact(
    embeddings: DataFrame,
    k: int = 10,
    pool: int = 50,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MMR diverse top-k in CROSS-ENGINE EXACT arithmetic -- the
    oracle-paired twin of ``mmr_topk`` (r12 verdict item #3: the
    fixed-round playbook applied to a sequential greedy). lambda is
    pinned at 0.7.

    Every score the greedy compares is derived from exact BIGINT dot
    products of 1e-4-quantized coordinates by one divide + one sqrt
    (both IEEE-correctly-rounded, hence bit-identical on any engine):
    rel_i = dot(i,q) / sqrt(n_i * n_q), sim(i,j) = dot(i,j) /
    sqrt(n_i * n_j), mmr_i = 0.7*rel_i - 0.3*max_sim_i. No float SUM
    anywhere (summation-order-dependent), no transcendental, no
    epsilon tie-break -- ties resolve by id exactly like the oracle's
    ORDER BY mmr DESC, id LIMIT 1 -- so a DuckDB twin that unrolls
    the k greedy steps as MATERIALIZED CTEs reproduces every
    selection bit-for-bit.

    INPUT CONTRACT (r13 ADVICE, closed r14): zero-norm vectors are
    GUARDED, not assumed away -- the pool pre-filters ``nq > 0 AND
    nd > 0`` (mirrored in the oracle), so an all-zero pool vector can
    no longer raise ZeroDivisionError driver-side (where DuckDB would
    have yielded NaN), and an all-zero QUERY vector yields an empty
    result on both engines instead of NaN-ranked garbage. Same guard
    convention as ``q_int8_cosine_topk``'s ``norm_q > 0``.

    Scale shape (unchanged from ``mmr_topk``): relevance scoring and
    top-``pool`` selection are fully distributed
    (TakeOrderedAndProject over one cached explode); the pairwise
    dots are computed DISTRIBUTED over the pool's exploded rows (a
    dim-keyed self-join of pool x dim rows -- pool^2 * dim products,
    constant once pool is fixed); only the bounded pool --
    pool rows + pool^2 integer dots, the same O(pool^2) the
    nlist-centroid collects set precedent for -- ever reaches the
    driver, where the O(k * pool) greedy runs. Returns (rank,
    vec_id, rel, mmr_score) with 6dp display rounding applied
    SPARK-SIDE (HALF_UP, matching DuckDB ROUND) after unrounded
    selection."""
    ex = (
        embeddings.select(
            F.col(id_col), F.posexplode(vec_col).alias("pos", "vf")
        )
        .select(
            id_col,
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("vf").cast("double") * 10000)
            .cast("long")
            .alias("q"),
        )
        .persist()
    )
    qd = ex.where(F.col(id_col) == query_id).select(
        "dim", F.col("q").alias("d")
    )
    scored = (
        ex.join(F.broadcast(qd), "dim")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("q") * F.col("d")).cast("long").alias("dot_q"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("nq"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("nd"),
        )
    )
    raw = F.col("dot_q").cast("double") / F.sqrt(
        F.col("nq").cast("double") * F.col("nd").cast("double")
    )
    pool_df = (
        scored
        # zero-norm guard (r13 ADVICE): 0/sqrt(0) would be NaN in
        # DuckDB but ZeroDivisionError in the driver-side greedy
        .where((F.col("nq") > 0) & (F.col("nd") > 0))
        .withColumn("_raw", raw)
        .orderBy(F.col("_raw").desc(), id_col)
        .limit(pool)
        .select(id_col, "dot_q", "nq", "nd")
    )
    pe = ex.join(F.broadcast(pool_df.select(id_col)), id_col)
    a, b = pe.alias("a"), pe.alias("b")
    pair_dots = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("i"), F.col(f"b.{id_col}").alias("j")
        )
        .agg(F.sum(F.col("a.q") * F.col("b.q")).cast("long").alias("dot"))
    )
    # bounded collects: pool rows + pool^2 dots (the nlist-centroid
    # precedent); everything upstream ran distributed
    prows = pool_df.collect()
    dots = {(r["i"], r["j"]): r["dot"] for r in pair_dots.collect()}
    ex.unpersist()

    spark = embeddings.sparkSession
    if not prows:  # all-zero query vector: empty on both engines
        return spark.createDataFrame(
            [], f"rank long, {id_col} long, rel double, mmr_score double"
        )

    from math import sqrt

    nq = {r[id_col]: r["nq"] for r in prows}
    n_query = prows[0]["nd"]  # identical fixed query norm on every row
    rel = {
        r[id_col]: r["dot_q"] / sqrt(r["nq"] * n_query) for r in prows
    }
    remaining = sorted(nq)
    selected: list[tuple[int, float, float]] = []
    while remaining and len(selected) < k:
        best = None
        for i in remaining:  # ascending id: first strict win == lowest id
            max_sim = max(
                (
                    dots[(i, j)] / sqrt(nq[i] * nq[j])
                    for j, _, _ in selected
                ),
                default=0.0,
            )
            mmr = 0.7 * rel[i] - 0.3 * max_sim
            if best is None or mmr > best[1]:
                best = (i, mmr, rel[i])
        selected.append(best)
        remaining.remove(best[0])
    out = spark.createDataFrame(
        [
            (rank + 1, i, r, m)
            for rank, (i, m, r) in enumerate(selected)
        ],
        f"rank long, {id_col} long, _rel double, _mmr double",
    )
    return out.select(
        "rank",
        id_col,
        F.round("_rel", 6).alias("rel"),
        F.round("_mmr", 6).alias("mmr_score"),
    ).orderBy("rank")
