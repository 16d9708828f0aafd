"""Round-11 additions: group-aware leakage-safe split invariants and
the copurchase graph projections' semantics (value parity is pinned
bit-exactly by tools/strict_parity.py; these tests pin the properties
the hash compare cannot express)."""

from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
    fixtures,
)

from conftest import TESTDATA


def test_leakage_safe_split_no_group_straddles(spark):
    """The defining property: every near-dup group lands WHOLLY inside
    one split -- recompute the per-doc assignment the query aggregates
    and assert each canonical id maps to exactly one split."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        shingle_jaccard_pairs,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        dedup_groups,
    )

    docs = fixtures.load(spark, TESTDATA, "documents")
    groups = dedup_groups(
        shingle_jaccard_pairs(fixtures.fan_out(docs), n=3, threshold=0.5)
    )
    j = docs.select("doc_id").join(groups, "doc_id", "left")
    canon = F.coalesce(F.col("canonical_id"), F.col("doc_id"))
    bucket = (
        F.conv(F.substring(F.md5(canon.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_doc = j.select(canon.alias("canon"), split.alias("split"))
    straddlers = (
        per_doc.groupBy("canon")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # and the groups are non-trivial at this SF, so the property is
    # actually exercised (some multi-doc group exists)
    assert groups.where(F.col("group_size") >= 2).count() > 0


def test_leakage_safe_split_vs_naive_split_leaks(spark):
    """The motivating contrast: the per-doc hash split DOES straddle
    near-dup groups on this corpus (otherwise the group-aware variant
    would be an empty gesture)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        shingle_jaccard_pairs,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        dedup_groups,
    )

    docs = fixtures.load(spark, TESTDATA, "documents")
    groups = dedup_groups(
        shingle_jaccard_pairs(fixtures.fan_out(docs), n=3, threshold=0.5)
    )
    naive_bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    naive_split = F.when(naive_bucket < 8, "train").otherwise("heldout")
    straddlers = (
        groups.select("canonical_id", naive_split.alias("split"))
        .groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddlers > 0


def test_copurchase_component_sizes_matches_operator_grouping(spark):
    """The histogram must be consistent with the underlying CC
    labeling: total docs across the histogram == nodes labeled, and
    every component size >= 2 (an edge list can produce no singleton
    components except via self-loops, which the >= 3-order threshold
    graph here does not contain)."""
    import __spark_entry__ as entry

    rows = entry.queries()["copurchase_component_sizes"](spark, TESTDATA).collect()
    assert rows, "no components at test SF"
    assert all(r.comp_size >= 2 for r in rows)
    assert sum(r.comp_size * r.n_components for r in rows) > 0
