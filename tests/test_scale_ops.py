"""Scale-path operators: salting must not change results, bucketing must
delete the join shuffle, JSONL reads must capture (not explode on) dirt."""

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.skew import (
    salted_agg_sum,
    salted_join,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.readers import (
    read_jsonl,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
    write_bucketed,
)

from conftest import TESTDATA


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_agg_matches_direct(spark):
    # zipfian input: one hot key with 10k rows, a tail of singletons
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), F.lit(1).cast("long").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"), F.col("id").cast("long").alias("v")
    )
    df = hot.unionByName(tail)
    direct = df.groupBy("k").agg(F.sum("v").alias("v"))
    salted = salted_agg_sum(df, ["k"], ["v"], salt_buckets=8)
    assert _rows(salted, "k", "v") == _rows(direct, "k", "v")


def test_salted_join_matches_direct(spark):
    big = spark.range(5_000).select(
        F.when(F.col("id") % 2 == 0, "HOT").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("HOT", 1), ("k1", 2), ("k3", 3), ("absent", 4)], "k string, attr int"
    )
    for how in ("inner", "left"):
        direct = big.join(small, "k", how)
        salted = salted_join(big, small, "k", how, salt_buckets=4)
        assert sorted(direct.columns) == sorted(salted.columns)
        assert _rows(salted, "k", "payload", "attr") == _rows(
            direct, "k", "payload", "attr"
        )


def test_bucketed_join_has_no_exchange(spark):
    li = (
        spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    orders = spark.read.parquet(f"{TESTDATA}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", num_buckets=4, sort_by="l_orderkey")
    write_bucketed(orders, "t_ord_bucketed", "o_orderkey", num_buckets=4, sort_by="o_orderkey")
    try:
        a = spark.table("t_li_bucketed")
        b = spark.table("t_ord_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.l_orderkey == b.o_orderkey)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            # co-bucketed layout: sort-merge join with zero shuffles
            assert "Exchange" not in plan, plan
            # and the result is still correct
            n_direct = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
            assert joined.count() == n_direct
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_compact_partition_reduces_files_preserves_rows(spark, tmp_path):
    import datetime as dt
    import glob as globlib

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        compact_partition,
        write_partitioned,
    )

    path = str(tmp_path / "t")
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, d1).otherwise(d2).alias("date_key"),
        F.col("id").cast("string").alias("sku"),
        F.col("id").alias("v"),
    )
    # fragment: many small files per partition
    write_partitioned(df.repartition(16), path)
    day1_files = lambda: globlib.glob(f"{path}/date_key={d1}/*.parquet")
    day2_files_before = set(globlib.glob(f"{path}/date_key={d2}/*.parquet"))
    assert len(day1_files()) > 4
    before = sorted((r.date_key, r.sku, r.v) for r in spark.read.parquet(path).collect())

    compact_partition(spark, path, "date_key", d1, target_files=1)

    assert len(day1_files()) == 1
    # sibling partition untouched (same physical files)
    assert set(globlib.glob(f"{path}/date_key={d2}/*.parquet")) == day2_files_before
    after = sorted((r.date_key, r.sku, r.v) for r in spark.read.parquet(path).collect())
    assert after == before


def test_read_jsonl_schema_and_corruption(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "extra": "dropped"}\n'
        '{"doc_id": 2, "text": "zweite zeile"}\n'
        "this is not json at all\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema)
    rows = df.collect()
    assert len(rows) == 3
    clean = [r for r in rows if r._corrupt_record is None]
    dirty = [r for r in rows if r._corrupt_record is not None]
    assert {r.doc_id for r in clean} == {1, 2}
    assert len(dirty) == 1 and dirty[0].doc_id is None
    # undeclared fields are pruned by the explicit schema
    assert "extra" not in df.columns


def test_orc_roundtrip_partitioned_idempotent(spark, tmp_path):
    """ORC source/sink: partitioned write -> read back identical; a
    second write of one partition replaces only that partition (same
    K1/K3 contract as parquet); predicates reach the ORC scan."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.readers import (
        read_orc,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        write_orc,
    )

    df = spark.createDataFrame(
        [("2024-01-01", "A", 1), ("2024-01-01", "B", 2), ("2024-01-02", "A", 3)],
        "date_key string, sku string, qty int",
    )
    path = str(tmp_path / "orc_mart")
    write_orc(df, path, partition_by="date_key", sort_within="sku")
    back = read_orc(spark, path)
    # partition-value inference types date_key as DATE on read-back
    assert sorted((str(r.date_key), r.sku, r.qty) for r in back.collect()) == sorted(
        (r.date_key, r.sku, r.qty) for r in df.collect()
    )
    # replay day 1 with changed data: only that partition is replaced
    day1 = spark.createDataFrame(
        [("2024-01-01", "C", 9)], "date_key string, sku string, qty int"
    )
    write_orc(day1, path, partition_by="date_key")
    after = sorted(
        (str(r.date_key), r.sku, r.qty) for r in read_orc(spark, path).collect()
    )
    assert after == [("2024-01-01", "C", 9), ("2024-01-02", "A", 3)]
    # pushdown is visible in the plan
    plan = (
        read_orc(spark, path)
        .where(F.col("sku") == "A")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(sku), EqualTo(sku,A)]" in plan


def test_merge_upsert_row_level_cdc(spark, tmp_path):
    """merge_upsert: changed keys are replaced, new keys inserted,
    untouched rows and untouched partitions survive; idempotent on
    replay of the same batch."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        merge_upsert,
    )

    path = str(tmp_path / "cdc_mart")
    base = spark.createDataFrame(
        [
            ("2024-01-01", "A", 1),
            ("2024-01-01", "B", 2),
            ("2024-01-02", "C", 3),
        ],
        "date_key string, sku string, qty int",
    )
    merge_upsert(spark, base, path, key_cols=["date_key", "sku"])
    type_after_first_write = dict(spark.read.parquet(path).dtypes)["date_key"]

    batch = spark.createDataFrame(
        [("2024-01-01", "B", 20), ("2024-01-01", "D", 4)],
        "date_key string, sku string, qty int",
    )
    expected_metrics = [
        # first replay: B replaced, D inserted, A kept (C's partition untouched)
        {"partitions_touched": 1, "rows_inserted": 1, "rows_replaced": 1, "rows_kept": 1},
        # second replay: batch keys all exist now -> pure replacement, no inserts
        {"partitions_touched": 1, "rows_inserted": 0, "rows_replaced": 2, "rows_kept": 1},
    ]
    for expect in expected_metrics:  # replaying the same CDC batch must be a no-op
        metrics = merge_upsert(spark, batch, path, key_cols=["date_key", "sku"])
        assert metrics == expect
        rows = sorted(
            (str(r.date_key), r.sku, r.qty)
            for r in spark.read.parquet(path).collect()
        )
        assert rows == [
            ("2024-01-01", "A", 1),   # untouched row in touched partition
            ("2024-01-01", "B", 20),  # updated
            ("2024-01-01", "D", 4),   # inserted
            ("2024-01-02", "C", 3),   # untouched partition
        ]
    # partition column type must not flip between first-write and merge
    # paths (read-back is DATE either way: parquet partition-dir
    # inference types date_key=2024-01-01 as DATE; what matters is that
    # the merge path presents the same type as the first-write path)
    assert (
        dict(spark.read.parquet(path).dtypes)["date_key"] == type_after_first_write
    )


def test_merge_upsert_duplicate_keys_and_version_resolution(spark, tmp_path):
    """Duplicate keys within one update batch raise without a version
    column; with one, the highest version wins deterministically."""
    import pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        merge_upsert,
    )

    path = str(tmp_path / "cdc_mart_ver")
    dup_batch = spark.createDataFrame(
        [("2024-01-01", "A", 1, 1), ("2024-01-01", "A", 9, 2)],
        "date_key string, sku string, qty int, ver int",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, dup_batch, path, key_cols=["date_key", "sku"])

    metrics = merge_upsert(
        spark, dup_batch, path, key_cols=["date_key", "sku"], version_col="ver"
    )
    assert metrics == {
        "partitions_touched": 1,
        "rows_inserted": 1,
        "rows_replaced": 0,
        "rows_kept": 0,
    }
    rows = [(r.sku, r.qty, r.ver) for r in spark.read.parquet(path).collect()]
    assert rows == [("A", 9, 2)]  # keep-last by version


def test_avro_roundtrip_or_explicit_skip(spark, tmp_path):
    """Avro source/sink mirror of the ORC roundtrip. The spark-avro
    connector is an external jar; when absent this SKIPS (never errors),
    and the capability probe + clear RuntimeError are what's tested."""
    import pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.readers import (
        avro_available,
        read_avro,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        write_avro,
    )

    df = spark.createDataFrame(
        [("2024-01-01", "A", 1), ("2024-01-01", "B", 2), ("2024-01-02", "A", 3)],
        "date_key string, sku string, qty int",
    )
    path = str(tmp_path / "avro_mart")
    if not avro_available(spark):
        # the gate must fail loudly with remediation, not half-write
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_avro(df, path, partition_by="date_key")
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, path)
        pytest.skip("spark-avro connector not on classpath")
    write_avro(df, path, partition_by="date_key", sort_within="sku")
    back = read_avro(spark, path)
    assert sorted((str(r.date_key), r.sku, r.qty) for r in back.collect()) == sorted(
        (r.date_key, r.sku, r.qty) for r in df.collect()
    )
    day1 = spark.createDataFrame(
        [("2024-01-01", "C", 9)], "date_key string, sku string, qty int"
    )
    write_avro(day1, path, partition_by="date_key")
    after = sorted(
        (str(r.date_key), r.sku, r.qty) for r in read_avro(spark, path).collect()
    )
    assert after == [("2024-01-01", "C", 9), ("2024-01-02", "A", 3)]


def test_aqe_skew_join_split_actually_fires(spark):
    """Closes the configured-vs-proven gap for AQE skew handling: build
    a zipfian sort-merge join (one key owning ~95% of rows), lower the
    skew thresholds to test scale, and assert the FINAL adaptive plan
    really split the skewed partition (skew=true on the join node) --
    while the join result stays correct."""
    hot = spark.range(300_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(5_000).select(
        F.concat(F.lit("t"), F.col("id") % 500).alias("k"),
        F.col("id").alias("payload"),
    )
    big = hot.unionByName(tail)
    right = spark.range(2_000).select(
        F.when(F.col("id") == 0, "HOT")
        .otherwise(F.concat(F.lit("t"), F.col("id") % 500))
        .alias("k"),
        F.col("id").alias("attr"),
    )
    overrides = {
        # force a sort-merge join, then make the skew machinery see the
        # hot partition as skewed at test-data sizes
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        joined = big.join(right, "k")
        # run the DataFrame's OWN QueryExecution (count() would plan a
        # separate aggregate and leave this plan unexecuted/non-final)
        n = len(joined.collect())
        # HOT matches 1 right row; tail key t0 matches 3 (right id 0
        # became HOT), t1..t499 match 4; left has 10 rows per tail key
        assert n == 300_000 + 10 * 3 + 499 * 10 * 4
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"skew split did not fire:\n{plan}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Runtime (bloom) filter injection: a selective dim-side predicate
    must materialize as a BloomFilterMightContain guard on the FACT scan
    side -- Spark's runtime semi-join reduction, the mechanism that cuts
    the 100TB fact shuffle down to rows that can possibly join. Proven
    on written parquet (the injector requires a file scan), with a
    sort-merge join so the bloom path (not broadcast reuse) is taken."""
    fact_path = str(tmp_path / "bloom_fact")
    dim_path = str(tmp_path / "bloom_dim")
    spark.range(200_000).select(
        (F.col("id") % 5_000).alias("k"), F.col("id").alias("v")
    ).write.parquet(fact_path)
    spark.range(5_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 100 == 0, "rare").otherwise("common").alias("tag"),
    ).write.parquet(dim_path)
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        # shrink thresholds so test-sized inputs qualify for injection
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where(F.col("tag") == "rare")
        joined = fact.join(dim, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Spark surfaces the injected bloom guard as might_contain(
        # bloom subquery, xxhash64(k)) in a Filter ABOVE the fact scan
        assert "might_contain" in plan, plan
        # and the reduction is semantically invisible
        assert joined.count() == 50 * 40  # 50 rare keys x 40 fact rows each
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_broadcast_threshold_drives_join_strategy(spark):
    """autoBroadcastJoinThreshold is the knob that decides dim-join
    strategy for UNHINTED joins: disabled (-1) the same query plans a
    shuffle join; at the default 10MB the small side broadcasts. Proves
    the engine's unhinted joins stay tunable per-deployment instead of
    hard-wiring a strategy (explicit F.broadcast hints are reserved for
    the bounded dims that are broadcast-safe at ANY scale)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from conftest import TESTDATA

    def plan_with(threshold: str) -> str:
        # build the frame AFTER setting the conf: physical planning is
        # cached per QueryExecution, so a pre-built frame would keep the
        # strategy chosen under the previous threshold
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        try:
            big = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
            dim = spark.read.parquet(f"{TESTDATA}/part.parquet")
            joined = (
                big.join(dim, big.l_partkey == dim.p_partkey)
                .groupBy("p_type")
                .agg(F.sum("l_quantity").alias("q"))
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            return buf.getvalue()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    disabled = plan_with("-1")
    assert "BroadcastHashJoin" not in disabled
    assert "SortMergeJoin" in disabled or "ShuffledHashJoin" in disabled
    enabled = plan_with("10485760")
    assert "BroadcastHashJoin" in enabled


def test_write_range_sorted_disjoint_files_prune_by_footer(spark, tmp_path):
    """Range-sorted layout contract: (1) round-trip preserves rows,
    (2) per-file parquet footer [min, max] ranges on the layout key are
    pairwise DISJOINT, (3) rows are sorted inside each file -- together
    these make footer stats a coarse global index, so a point predicate
    touches exactly one file's range. A plain repartition() write fails
    (2): every file spans the whole key range."""
    import glob as globlib

    import pyarrow.parquet as pq

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        write_range_sorted,
    )

    df = spark.range(0, 10_000).select(
        (F.xxhash64("id") % 1_000_000).alias("user_id"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "range_sorted")
    write_range_sorted(df, path, "user_id", num_files=8)

    files = sorted(globlib.glob(f"{path}/part-*.parquet"))
    assert len(files) > 2, files

    spans = []
    for f in files:
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index("user_id")
        lo = min(
            pf.metadata.row_group(g).column(idx).statistics.min
            for g in range(pf.metadata.num_row_groups)
        )
        hi = max(
            pf.metadata.row_group(g).column(idx).statistics.max
            for g in range(pf.metadata.num_row_groups)
        )
        col = pq.read_table(f, columns=["user_id"])["user_id"].to_pylist()
        assert col == sorted(col), f"not sorted within {f}"
        spans.append((lo, hi))
    spans.sort()
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping file ranges: {spans}"

    # a point predicate's footer-qualified file set is a single file
    probe = spans[len(spans) // 2][0]
    touched = [1 for lo, hi in spans if lo <= probe <= hi]
    assert len(touched) == 1, (probe, spans)

    back = sorted(
        (r.user_id, r.v) for r in spark.read.parquet(path).collect()
    )
    orig = sorted((r.user_id, r.v) for r in df.collect())
    assert back == orig


def test_dynamic_partition_pruning_prunes_fact_partitions(spark, tmp_path):
    """Dynamic partition pruning: joining a date-partitioned fact to a
    dim with a selective predicate must inject a dynamicpruning
    expression into the fact scan's PartitionFilters -- at 100TB the
    fact side then reads only the dim-selected partitions' files
    instead of the whole table. Completes the runtime-pruning proofs
    (AQE skew split, bloom filter injection, and now DPP).

    Two empirically-pinned preconditions worth knowing: the dim filter
    must be one Spark's isLikelySelective heuristic accepts (a bare
    boolean-column filter is NOT; an equality compare is), and the dim
    must actually be the broadcast/build side (at toy sizes the FACT
    wins the broadcast otherwise and the rule has nothing to prune)."""
    import contextlib as cl
    import datetime as dt
    import io as iolib
    import re as relib

    fact_path = str(tmp_path / "dpp_fact")
    days = [dt.date(2024, 1, d) for d in range(1, 11)]
    fact = spark.range(10_000).select(
        F.element_at(
            F.array(*[F.lit(d) for d in days]),
            (F.col("id") % 10 + 1).cast("int"),
        ).alias("date_key"),
        F.col("id").alias("v"),
    )
    fact.write.mode("overwrite").partitionBy("date_key").parquet(fact_path)
    dim = spark.createDataFrame(
        [(d, "special" if d.day <= 2 else "normal") for d in days],
        "date_key date, kind string",
    )

    joined = (
        spark.read.parquet(fact_path)
        .join(F.broadcast(dim.where(F.col("kind") == "special")), "date_key")
        .agg(F.count("*").alias("n"))
    )
    buf = iolib.StringIO()
    with cl.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    pf = relib.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    assert pf and any("dynamicpruning" in f for f in pf), plan
    # 2 of 10 days qualify; ids are uniform mod 10 -> exactly 2000 rows
    assert joined.collect()[0].n == 2000


def test_read_parquet_evolving_merges_schema_versions(spark, tmp_path):
    """Schema evolution contract: a staging zone whose later files
    carry an added column reads as the UNION schema, old files
    null-filled; and with tolerate_corrupt a garbage file is skipped
    instead of failing the scan (quarantine-and-continue), while the
    strict default fails loudly."""
    import pytest as _pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.readers import (
        read_parquet_evolving,
    )

    zone = tmp_path / "zone"
    zone.mkdir()
    spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(str(zone))
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).coalesce(1).write.mode("append").parquet(str(zone))

    got = {
        r.id: (r.v, r.score)
        for r in read_parquet_evolving(spark, str(zone)).collect()
    }
    assert got == {1: ("a", None), 2: ("b", 9.5)}

    (zone / "zz_garbage.parquet").write_bytes(b"this is not parquet at all")
    tolerant = read_parquet_evolving(spark, str(zone), tolerate_corrupt=True)
    assert {r.id for r in tolerant.collect()} == {1, 2}
    with _pytest.raises(Exception):
        read_parquet_evolving(spark, str(zone)).collect()  # strict fails


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """Z-order vs linear layout, measured the way a scan engine
    actually prunes: per-FILE parquet footer min/max. A linear sort on
    x serves x-predicates perfectly but every file spans y's full
    range (zero y-pruning); the Morton layout must (a) keep every row
    (same multiset), (b) prune files on BOTH x and y point
    predicates, (c) beat linear's y-pruning by a wide margin."""
    import glob as globmod

    import pyarrow.parquet as pq

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        write_range_sorted,
        write_zordered,
    )

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("long").alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    write_range_sorted(grid, lin, "x", num_files=16, sort_extra="y")
    write_zordered(grid, zo, ["x", "y"], bits=6, num_files=16)

    assert spark.read.parquet(zo).count() == n * n
    assert (
        spark.read.parquet(zo).groupBy("x", "y").count().where("count > 1").count()
        == 0
    )

    def files_hit(path, col, val):
        hit, total = 0, 0
        for f in globmod.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(md.num_columns):
                    cc = rg.column(j)
                    if cc.path_in_schema == col:
                        mins.append(cc.statistics.min)
                        maxs.append(cc.statistics.max)
            total += 1
            if min(mins) <= val <= max(maxs):
                hit += 1
        return hit, total

    probe = n // 2
    lin_x, n_lin = files_hit(lin, "x", probe)
    lin_y, _ = files_hit(lin, "y", probe)
    zo_x, n_zo = files_hit(zo, "x", probe)
    zo_y, _ = files_hit(zo, "y", probe)
    assert n_lin >= 8 and n_zo >= 8
    # linear: great on x, useless on y
    assert lin_x <= 2
    assert lin_y == n_lin, "linear layout should not prune y at all"
    # z-order: prunes BOTH dimensions, and beats linear on y by 2x+
    assert zo_x <= n_zo // 2
    assert zo_y <= n_zo // 2
    assert zo_y * 2 <= lin_y


def test_incremental_manifest_ingestion(spark, tmp_path):
    """read_parquet_incremental: each run sees exactly the files no
    committed run processed; commit replay is harmless (set semantics);
    a caught-up zone yields an empty-but-typed frame."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.readers import (
        commit_ingest_manifest,
        read_parquet_incremental,
    )

    zone = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, v string"
    ).repartition(2).write.mode("append").parquet(zone)

    df1, files1 = read_parquet_incremental(spark, zone, manifest)
    assert len(files1) == 2
    assert sorted(r.id for r in df1.collect()) == [1, 2, 3, 4]
    commit_ingest_manifest(spark, manifest, files1)

    # caught up: typed empty frame, no files
    df_idle, files_idle = read_parquet_incremental(spark, zone, manifest)
    assert files_idle == [] and df_idle.count() == 0
    assert df_idle.schema == df1.schema

    # a producer appends one more file; only IT is read
    spark.createDataFrame([(5, "e")], "id long, v string").coalesce(
        1
    ).write.mode("append").parquet(zone)
    df2, files2 = read_parquet_incremental(spark, zone, manifest)
    assert len(files2) == 1 and not set(files2) & set(files1)
    assert [r.id for r in df2.collect()] == [5]

    # commit replay (crash between sink and manifest, run retried):
    # duplicate manifest lines must not resurrect old files
    commit_ingest_manifest(spark, manifest, files2)
    commit_ingest_manifest(spark, manifest, files2)
    df3, files3 = read_parquet_incremental(spark, zone, manifest)
    assert files3 == [] and df3.count() == 0


def test_cbo_statistics_drive_join_reorder(spark, tmp_path):
    """Cost-based join reorder PROVEN firing: with ANALYZE-computed
    column stats, Catalyst moves the selective tiny-dim join ahead of
    the wider medium-dim join; without CBO the written (worse) order
    is kept. Completes the optimizer-proof set (AQE skew split, DPP,
    runtime bloom filter, broadcast threshold) -- at 100 TB, stats +
    reorder is the difference between filtering the fact early and
    carrying it through an unfiltered join."""
    import re

    db = "cbo_proof_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    prev_db = spark.catalog.currentDatabase()
    prev = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    try:
        spark.sql(f"USE {db}")
        spark.range(0, 200000).selectExpr(
            "id % 1000 AS k1", "id % 50 AS k2", "id AS v"
        ).write.mode("overwrite").saveAsTable("fact")
        spark.range(0, 1000).selectExpr(
            "id AS k1", "id % 10 AS attr1"
        ).write.mode("overwrite").saveAsTable("dim_mid")
        spark.range(0, 50).selectExpr(
            "id AS k2", "id % 5 AS attr2"
        ).write.mode("overwrite").saveAsTable("tiny")
        for t in ("fact", "dim_mid", "tiny"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        q = f"""
            SELECT f.v, m.attr1, t.attr2
            FROM fact f
            JOIN dim_mid m ON f.k1 = m.k1
            JOIN tiny t ON f.k2 = t.k2
            WHERE t.attr2 = 0 AND m.attr1 < 100
        """

        def join_order(cbo: bool) -> list[str]:
            spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
            plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
            return re.findall(rf"{db}\.(fact|dim_mid|tiny)", plan)

        assert join_order(False) == ["fact", "dim_mid", "tiny"]  # as written
        assert join_order(True) == ["fact", "tiny", "dim_mid"]  # selective first
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql(f"USE {prev_db}")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_small_file_report_drives_compaction(spark, tmp_path):
    """Fragment a partition into 8 files; the report counts them as
    small; compact_partition collapses them; the report then shows 1
    file per partition and identical row totals."""
    from pyspark.sql import functions as F

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        compact_partition,
        small_file_report,
        write_partitioned,
    )

    path = str(tmp_path / "frag")
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("int").alias("p"), F.col("id").alias("v")
    )
    write_partitioned(df.repartition(8), path, "p", sort_within=None)

    rep = {r.p: r for r in small_file_report(spark, path, by="p").collect()}
    assert rep[0].n_files == 8 and rep[0].small_files == 8
    total_rows = {p: r.total_rows for p, r in rep.items()}

    compact_partition(spark, path, "p", 0)
    rep2 = {r.p: r for r in small_file_report(spark, path, by="p").collect()}
    assert rep2[0].n_files == 1          # compacted
    assert rep2[1].n_files == 8          # untouched
    assert {p: r.total_rows for p, r in rep2.items()} == total_rows

    whole = small_file_report(spark, path).collect()[0]
    assert whole.n_files == 9 and whole.total_rows == 2000


def test_persisted_ivf_index_serves_identical_results_and_prunes(spark, tmp_path):
    """build-once/serve-many == train-per-query bit-for-bit, and the
    probe scan partition-prunes to the probed cluster directories."""
    import contextlib
    import io

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    emb = fixtures.load(spark, TESTDATA, "embeddings")
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).collect()[0].embedding
    ]
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx)

    served = ivf_index_topk(spark, idx, qv)
    direct = ivf_topk(emb, qv)
    assert [tuple(r) for r in served.collect()] == [tuple(r) for r in direct.collect()]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    p = buf.getvalue()
    # cluster IN (...) must reach the scan as a partition filter
    assert "PartitionFilters:" in p
    assert "cluster" in p.split("PartitionFilters:")[1].split("]")[0]


def test_aqe_coalesces_post_shuffle_partitions(spark):
    """The remaining AQE mechanism (skew-split and bloom already
    proven): a small shuffle declared with 32 partitions must be
    COALESCED at runtime -- the final adaptive plan reads the shuffle
    with fewer partitions than the static plan declared."""
    import contextlib
    import io

    df = (
        spark.range(10_000)
        .select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    df.collect()  # run so AQE finalizes
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "AQEShuffleRead" in p, "no adaptive shuffle read in final plan"
    assert "coalesced" in p, f"post-shuffle coalescing did not fire:\n{p[:800]}"


def test_nested_schema_pruning_reads_only_the_touched_subfield(spark, tmp_path):
    """Struct columns must prune to the accessed subfield in ReadSchema
    -- at 100 TB a metadata struct with a fat blob field must not be
    materialized to read one scalar out of it."""
    import contextlib
    import io

    path = str(tmp_path / "nested")
    spark.range(100).select(
        F.col("id"),
        F.struct(
            (F.col("id") % 5).alias("width"),
            F.repeat(F.lit("x"), 1000).alias("fat_blob"),
        ).alias("meta"),
    ).write.parquet(path)

    df = spark.read.parquet(path).select("id", F.col("meta.width"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "width" in read_schema
    assert "fat_blob" not in read_schema, f"blob not pruned: {read_schema}"


def test_fixed_width_datasource_reads_typed_partitioned(spark, tmp_path):
    """Custom Python DataSource: registered format parses fixed-width
    records into typed columns, one partition per file, ragged tails
    and blanks -> NULL, decimals exact."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.fixedwidth import (
        FixedWidthDataSource,
    )

    (tmp_path / "a.dat").write_text(
        "SKU00001  42  1234.50\n"
        "SKU00002     \n"          # ragged: qty blank, amount missing
    )
    (tmp_path / "b.dat").write_text("SKU00003   7   -10.25\n")

    spark.dataSource.register(FixedWidthDataSource)
    df = (
        spark.read.format("fixedwidth")
        .option("path", str(tmp_path / "*.dat"))
        .option("layout", "sku:0:8:string,qty:8:4:int,amount:12:9:decimal(7,2)")
        .load()
    )
    assert df.schema.simpleString() == "struct<sku:string,qty:int,amount:decimal(7,2)>"
    assert df.rdd.getNumPartitions() == 2  # one per file
    import decimal

    rows = sorted((r.sku, r.qty, r.amount) for r in df.collect())
    assert rows == [
        ("SKU00001", 42, decimal.Decimal("1234.50")),
        ("SKU00002", None, None),
        ("SKU00003", 7, decimal.Decimal("-10.25")),
    ]


def test_fixed_width_datasource_writer_roundtrip(spark, tmp_path):
    """Writer side: typed frame -> fixed-width parts (task write ->
    commit move), read back through the reader bit-identically; numerics
    right-justified, NULLs blank."""
    import decimal

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.fixedwidth import (
        FixedWidthDataSource,
    )

    spark.dataSource.register(FixedWidthDataSource)
    layout = "sku:0:8:string,qty:8:4:int,amount:12:9:decimal(7,2)"
    df = spark.createDataFrame(
        [
            ("SKU1", 42, decimal.Decimal("1234.50")),
            ("SKU2", None, None),
            ("SKU3", 7, decimal.Decimal("-10.25")),
        ],
        "sku string, qty int, amount decimal(7,2)",
    )
    out = str(tmp_path / "export")
    (
        df.repartition(2)
        .write.format("fixedwidth")
        .option("path", out)
        .option("layout", layout)
        .mode("append")
        .save()
    )
    import glob as globlib

    parts = globlib.glob(f"{out}/part-*.dat")
    assert len(parts) == 2 and not globlib.glob(f"{out}/_staging/*")

    back = (
        spark.read.format("fixedwidth")
        .option("path", f"{out}/part-*.dat")
        .option("layout", layout)
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # copybook justification: numeric right, string left
    line = open(parts[0]).readline().rstrip("\n")
    assert line[0:8].startswith("SKU")
    assert line[8:12] == line[8:12].rjust(4)


def test_fixed_width_stream_reader_tails_growing_files(spark, tmp_path):
    """readStream over the custom source: first batch reads the initial
    lines, appended lines arrive in the next batch exactly once, a
    half-written line (no newline) is held back until complete."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.fixedwidth import (
        FixedWidthDataSource,
    )

    spark.dataSource.register(FixedWidthDataSource)
    layout = "sku:0:8:string,qty:8:4:int"
    f = tmp_path / "drop.dat"
    f.write_text("SKU1       1\nSKU2       2\n")

    stream = (
        spark.readStream.format("fixedwidth")
        .option("path", str(tmp_path / "*.dat"))
        .option("layout", layout)
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("fw_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r.sku, r.qty) for r in spark.sql("SELECT * FROM fw_stream").collect()}
        assert got1 == {("SKU1", 1), ("SKU2", 2)}

        # append one complete line and one incomplete (no newline)
        with open(f, "a") as fh:
            fh.write("SKU3       3\nSKU4    ")
        q.processAllAvailable()
        got2 = {(r.sku, r.qty) for r in spark.sql("SELECT * FROM fw_stream").collect()}
        assert got2 == got1 | {("SKU3", 3)}  # SKU4 held back: incomplete

        with open(f, "a") as fh:
            fh.write("   4\n")
        q.processAllAvailable()
        got3 = {(r.sku, r.qty) for r in spark.sql("SELECT * FROM fw_stream").collect()}
        assert got3 == got2 | {("SKU4", 4)}
    finally:
        q.stop()


def test_fixed_width_layout_and_overflow_errors():
    """Contract errors are loud: malformed layout rejected at parse;
    a value wider than its field raises on write-render (silent
    truncation of an amount is data loss)."""
    import pytest as _pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.fixedwidth import (
        _render,
        parse_layout,
    )

    with _pytest.raises(ValueError, match="bad layout"):
        parse_layout("sku:0:8")  # missing type
    with _pytest.raises(ValueError, match="bad offsets"):
        parse_layout("sku:-1:8:string")
    assert parse_layout("a:0:4:decimal(7,2),b:4:2:int") == [
        ("a", 0, 4, "decimal(7,2)"),
        ("b", 4, 2, "int"),
    ]
    with _pytest.raises(ValueError, match="wider than"):
        _render(123456, "int", 4)
    assert _render(None, "int", 4) == "    "
    assert _render("ab", "string", 4) == "ab  "
    assert _render(42, "int", 4) == "  42"


def test_versioned_table_time_travel_isolation_and_vacuum(spark, tmp_path):
    """append/append/overwrite produce three readable snapshots; a
    reader resolved at v0 is isolated from later writes; vacuum keeps
    only the live snapshot's files and old versions become unreadable."""
    import pytest as _pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        history,
        latest_version,
        read_versioned,
        vacuum,
        write_versioned,
    )

    path = str(tmp_path / "vt")
    mk = lambda lo, hi: spark.range(lo, hi).select(F.col("id").alias("v"))
    rows = lambda df: sorted(r.v for r in df.collect())

    assert latest_version(path) == -1
    assert write_versioned(mk(0, 10), path) == 0
    # pin a reader to v0 BEFORE later writes
    pinned = read_versioned(spark, path, 0)
    assert write_versioned(mk(10, 15), path) == 1            # append
    assert write_versioned(mk(100, 103), path, "overwrite") == 2

    assert rows(read_versioned(spark, path, 0)) == list(range(10))
    assert rows(read_versioned(spark, path, 1)) == list(range(15))
    assert rows(read_versioned(spark, path, 2)) == [100, 101, 102]
    assert rows(read_versioned(spark, path)) == [100, 101, 102]  # latest
    assert rows(pinned) == list(range(10))                   # isolation
    assert [h["mode"] for h in history(path)] == ["append", "append", "overwrite"]

    deleted = vacuum(path, keep_versions=1)
    assert deleted  # v0/v1's files are unreferenced by v2
    assert rows(read_versioned(spark, path)) == [100, 101, 102]  # live intact
    with _pytest.raises(ValueError):
        read_versioned(spark, path, 0)  # dropped commit


def test_versioned_table_changes_feed(spark, tmp_path):
    """CDF between snapshots: append shows pure inserts; an overwrite
    that keeps some rows shows exactly the delta (update = delete +
    insert at content grain)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        table_changes,
        write_versioned,
    )

    path = str(tmp_path / "cdf")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df1 = spark.createDataFrame([(3, "c")], "k int, v string")
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "k int, v string"
    )  # k=2 updated
    write_versioned(df0, path)
    write_versioned(df1, path)            # v1 = append
    write_versioned(df2, path, "overwrite")  # v2

    c01 = {(r.k, r.v, r._change) for r in table_changes(spark, path, 0, 1).collect()}
    assert c01 == {(3, "c", "insert")}
    c12 = {(r.k, r.v, r._change) for r in table_changes(spark, path, 1, 2).collect()}
    assert c12 == {(2, "B", "insert"), (2, "b", "delete")}


def test_versioned_table_concurrent_writers_serialize(spark, tmp_path):
    """Two writers racing: the O_EXCL commit CAS gives them distinct
    consecutive versions and BOTH snapshots contain their own rows
    (append semantics, no lost update)."""
    import threading

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        history,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "race")
    write_versioned(
        spark.createDataFrame([(0,)], "v int"), path
    )  # v0 so both racers append

    results = {}

    def writer(tag, lo):
        df = spark.createDataFrame([(lo,), (lo + 1,)], "v int")
        results[tag] = write_versioned(df, path)

    t1 = threading.Thread(target=writer, args=("a", 10))
    t2 = threading.Thread(target=writer, args=("b", 20))
    t1.start(); t2.start(); t1.join(); t2.join()

    assert sorted(results.values()) == [1, 2]  # distinct, consecutive
    final = sorted(r.v for r in read_versioned(spark, path).collect())
    assert final == [0, 10, 11, 20, 21]  # no lost update
    assert len(history(path)) == 3


def test_versioned_compact_is_transactional_and_row_identical(spark, tmp_path):
    """Many appends -> many files; compact publishes ONE new version
    with fewer files and identical rows; the pre-compact snapshot is
    still readable (transactional OPTIMIZE)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        compact,
        history,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "opt")
    for i in range(4):
        write_versioned(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("v")), path
        )
    before = sorted(r.v for r in read_versioned(spark, path).collect())
    assert history(path)[-1]["n_files"] >= 4

    v = compact(spark, path)
    assert v == 4
    h = history(path)[-1]
    assert h["n_files"] == 1 and h["mode"] == "overwrite"
    assert sorted(r.v for r in read_versioned(spark, path).collect()) == before
    # pre-compact version still time-travelable
    assert sorted(r.v for r in read_versioned(spark, path, 3).collect()) == before


def test_stream_to_versioned_table_exactly_once(spark, tmp_path):
    """Two staged files -> two commits with batch ids; replaying the
    whole stream from a FRESH checkpoint adds no rows (batch-id dedup),
    and history shows each micro-batch as one version."""
    import glob as globlib
    import os
    import shutil as shutillib

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        history,
        read_versioned,
        run_stream_to_versioned,
    )

    src = tmp_path / "vsrc"
    src.mkdir()
    for i in range(2):
        stage = tmp_path / f"vstage{i}"
        spark.range(i * 5, i * 5 + 5).select(F.col("id").alias("v")).coalesce(
            1
        ).write.parquet(str(stage))
        (pf,) = globlib.glob(str(stage / "part-*.parquet"))
        shutillib.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    table = str(tmp_path / "vtable")
    stream = (
        spark.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_to_versioned(stream, table, str(tmp_path / "vck1"))
    rows1 = sorted(r.v for r in read_versioned(spark, table).collect())
    assert rows1 == list(range(10))
    assert len(history(table)) == 2  # one commit per micro-batch

    # full replay, fresh checkpoint: same batch ids -> no-op
    stream2 = (
        spark.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_to_versioned(stream2, table, str(tmp_path / "vck2"))
    assert sorted(r.v for r in read_versioned(spark, table).collect()) == rows1
    assert len(history(table)) == 2


def test_salting_measurably_levels_partition_load(spark):
    """The balance diagnostic proves salting's point: hash-partitioning
    a zipfian key funnels the hot key's mass into one partition
    (max/mean >> 1); the salted repartition levels it (max/mean ~ 1)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.skew import (
        balance_stats,
        content_salt,
    )

    hot = spark.range(20_000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    tail = spark.range(200).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    df = hot.unionByName(tail)

    skewed = balance_stats(df.repartition(16, "k"))
    # 256 salt cells over 16 partitions: balls-in-bins smoothing --
    # ~16 hot cells per partition +- Poisson (too few cells, e.g.
    # 16-over-16, would re-collide into a 2-3x imbalance)
    salted = balance_stats(
        df.withColumn("_salt", content_salt(df, 256)).repartition(16, "k", "_salt")
    )
    assert skewed["max_over_mean"] > 5, skewed           # hot key owns a partition
    assert salted["max_over_mean"] < 2, salted           # leveled
    assert salted["max_over_mean"] * 3 < skewed["max_over_mean"]


def test_runtime_bloom_filter_fires_at_scale(spark):
    """Runtime bloom-filter join pruning (the semi-join pushdown that
    matters on a 100 TB fact scan): a selective dim filter gets
    compiled into a bloom_filter_agg on the build side and a
    might_contain pre-filter on the fact side, so most fact rows die
    BEFORE the shuffle. Spark only injects it when the application-side
    scan is big enough to pay for the filter (10 GB default) -- never
    true at test SF -- so the test lowers the threshold to emulate the
    at-scale decision and pins (a) the session keeps the feature
    enabled and (b) the injection actually happens on our fact-dim
    join shape."""
    import contextlib
    import io

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    # sf0.1: the fact scan must clear even the LOWERED threshold for
    # the injection cost model to say yes (sf0.01's scan is too small)
    sf = "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join regime (at 100 TB the dim outgrows
        # broadcast) and emulate an at-scale fact scan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1MB",
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # and the result is unchanged by the pre-filter
        assert j.collect()[0]["count"] == li.join(
            F.broadcast(orders), li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold"
        )


def test_persisted_pq_index_serves_identical_results_and_prunes(
    spark, tmp_path
):
    """IVF-PQ artifact lifecycle: (a) rebuilding from the same data is
    BIT-IDENTICAL (codes, codebooks, coarse centroids), (b) serving
    with exact re-rank returns the brute-force top-1 (the query vector
    itself) and is deterministic across calls, (c) the codes scan
    partition-prunes to the probed clusters, (d) ADC-only serving
    never touches the embeddings table."""
    import contextlib
    import io

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.similarity import (  # noqa: E501
        build_pq_index,
        pq_index_topk,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    emb = fixtures.load(spark, TESTDATA, "embeddings")
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).collect()[0].embedding
    ]
    idx1, idx2 = str(tmp_path / "pq1"), str(tmp_path / "pq2")
    build_pq_index(emb, idx1)
    build_pq_index(emb, idx2)

    def snap(idx):
        codes = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{idx}/codes")
            .select("_id", "codes", "cluster")
            .collect()
        )
        books = sorted(
            (r.j, r.code, tuple(r.centroid))
            for r in spark.read.parquet(f"{idx}/codebooks").collect()
        )
        cents = sorted(
            (r.cluster, tuple(r.centroid))
            for r in spark.read.parquet(f"{idx}/centroids").collect()
        )
        return codes, books, cents

    assert snap(idx1) == snap(idx2)  # train-once determinism, bit-level

    # completion marker is the rebuild-skip signal (r8 advice): it must
    # exist after a finished build, and it is written after the LAST
    # artifact so codes/_SUCCESS alone never masks a crashed build
    import os

    assert os.path.exists(os.path.join(idx1, "_INDEX_COMPLETE"))
    assert os.path.exists(os.path.join(idx1, "centroids", "_SUCCESS"))

    served = pq_index_topk(spark, idx1, qv, k=10, embeddings=emb)
    rows = served.collect()
    assert rows == pq_index_topk(spark, idx1, qv, k=10, embeddings=emb).collect()
    assert rows[0].vec_id == 0 and rows[0].score == 1.0  # self is top-1

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters:" in p
    assert "cluster" in p.split("PartitionFilters:")[1].split("]")[0]

    # ADC-only serving: no embeddings scan anywhere in the plan
    adc_only = pq_index_topk(spark, idx1, qv, k=10)
    got = adc_only.collect()
    assert len(got) == 10 and got == adc_only.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        adc_only.explain("formatted")
    assert "embeddings" not in buf.getvalue()
