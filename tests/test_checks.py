"""Data-quality report: declared contract violations counted in one
distributed pass (SURVEY.md SS1.2 VARCHAR/grain contracts)."""

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.checks import (
    quality_report,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (
    q_dim_products,
)

from conftest import TESTDATA


def test_quality_report_counts_violations(spark):
    df = spark.createDataFrame(
        [
            ("A", "ok", "CAT1"),
            (None, "x" * 300, "CAT1"),
            ("B", None, "WAT"),
            ("B", "dup key", "CAT2"),
        ],
        "sku string, product_name string, category string",
    )
    report = {
        r.check: r.n_violations
        for r in quality_report(
            df,
            not_null=["sku", "product_name"],
            max_len={"sku": 50, "product_name": 255},
            accepted={"category": ["CAT1", "CAT2"]},
            unique_key=["sku"],
        ).collect()
    }
    assert report == {
        "not_null:sku": 1,
        "not_null:product_name": 1,
        "max_len(50):sku": 0,
        "max_len(255):product_name": 1,
        "accepted:category": 1,
        "unique_key:sku": 1,
    }


def test_dim_products_meets_warehouse_contract(spark):
    # the built dimension must satisfy its DDL contract
    # (sql/create_redshift_tables.sql:20-26): non-null unique sku within
    # VARCHAR(50), names within VARCHAR(255)
    dim = q_dim_products(spark, TESTDATA)
    report = quality_report(
        dim,
        not_null=["sku"],
        max_len={"sku": 50, "product_name": 255, "category": 100},
        unique_key=["sku"],
    )
    bad = {r.check: r.n_violations for r in report.collect() if r.n_violations > 0}
    assert bad == {}


def test_referential_report_counts_only_nonnull_orphans(spark):
    """Planted: 2 orphan skus, 1 null (not an orphan), rest matched;
    a second FK with full coverage reports zero."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.checks import (
        referential_report,
    )

    fact = spark.createDataFrame(
        [("A", 1), ("B", 1), ("X", 2), ("Y", 2), (None, 1)],
        "sku string, store_id int",
    )
    dim = spark.createDataFrame([("A",), ("B",), ("C",)], "sku string")
    stores = spark.createDataFrame([(1,), (2,)], "store_id int")
    rep = {
        r.check: r.n_violations
        for r in referential_report(
            fact, {"sku": (dim, "sku"), "store_id": (stores, "store_id")}
        ).collect()
    }
    assert rep == {"fk:sku->sku": 2, "fk:store_id->store_id": 0}


def test_range_checksums_localize_a_single_row_divergence(spark):
    """Identical replicas agree bucket-for-bucket regardless of
    partitioning; mutating ONE row flags EXACTLY that key's bucket;
    deleting a row likewise."""
    from pyspark.sql import functions as F

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.checks import (
        diff_ranges,
        range_checksums,
    )

    base = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    a = range_checksums(base, "k", n_buckets=32)
    b = range_checksums(base.repartition(13), "k", n_buckets=32)  # order-free
    assert diff_ranges(a, b).count() == 0

    mutated = base.withColumn(
        "v", F.when(F.col("k") == 4242, F.lit(-1)).otherwise(F.col("v"))
    )
    d = diff_ranges(a, range_checksums(mutated, "k", n_buckets=32)).collect()
    expected_bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(4242).cast("long")), F.lit(32)).cast("int").alias("b")
    ).collect()[0].b
    assert [r.bucket for r in d] == [expected_bucket]
    assert d[0].n_rows_a == d[0].n_rows_b  # same count, different content

    removed = base.where(F.col("k") != 17)
    d2 = diff_ranges(a, range_checksums(removed, "k", n_buckets=32)).collect()
    assert len(d2) == 1 and d2[0].n_rows_a == d2[0].n_rows_b + 1
