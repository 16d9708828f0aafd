"""Round-8 queries and operators: semantic contracts beyond generic
oracle parity -- containment prefix-filter completeness and pruning,
broadcast-hint discipline, and the round's new exact operators."""

import pyspark.sql.functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
    queries as Q,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
    fixtures,
)

from conftest import TESTDATA as SF


def test_prefix_containment_is_output_identical_to_raw_join(spark):
    """The overlap prefix-filter theorem says recall is exactly 1.0 --
    verified directly: the filtered operator and the raw shared-shingle
    join return the same directional pair set on the corpus."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (  # noqa: E501
        tokens,
        word_ngrams,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        prefix_containment_pairs,
    )

    docs = fixtures.fan_out(fixtures.load(spark, SF, "documents"))
    n = 3
    sh = docs.where(F.size(tokens("text")) >= n).select(
        F.col("doc_id").alias("_id"), word_ngrams("text", n).alias("s")
    )
    ex = sh.select("_id", F.explode("s").alias("shingle")).persist()
    sizes = ex.groupBy("_id").agg(F.count("*").cast("int").alias("ns"))
    a, b = ex.alias("a"), ex.alias("b")
    shared_lt = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    shared = shared_lt.unionByName(
        shared_lt.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "n_shared",
        )
    )
    raw = {
        (r.doc_a, r.doc_b, r.containment)
        for r in shared.join(
            sizes.select(F.col("_id").alias("doc_a"), F.col("ns")), "doc_a"
        )
        .withColumn(
            "containment",
            F.round(F.col("n_shared").cast("double") / F.col("ns"), 4),
        )
        .where(F.col("containment") >= 0.8)
        .select("doc_a", "doc_b", "containment")
        .collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.containment)
        for r in prefix_containment_pairs(docs, n=3).collect()
    }
    assert pref == raw and raw  # identical and non-empty


def test_prefix_containment_boundary_pair(spark):
    """A pair engineered at exactly c = 0.8 (4 of 5 shingles shared)
    must survive the prefix filter -- the alpha arithmetic is exact
    integer, so the >= boundary is inclusive; a 3-of-5 pair (0.6) is
    dropped by the verify stage."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        prefix_containment_pairs,
    )

    # doc 1: tokens w1..w7 -> 5 shingles; doc 2 shares its first 6
    # tokens -> shares exactly 4 of doc 1's 5 shingles
    d1 = "w1 w2 w3 w4 w5 w6 w7"
    d2 = "w1 w2 w3 w4 w5 w6 x1 x2 x3 x4 x5 x6 x7 x8"
    # doc 3 shares only w1..w5 with doc 1 -> 3 of 5 shingles (0.6)
    d3 = "w1 w2 w3 w4 w5 y1 y2 y3 y4 y5 y6 y7 y8 y9"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in prefix_containment_pairs(docs, n=3).collect()
    }
    assert got[(1, 2)] == 0.8  # exactly at the boundary, kept
    assert (1, 3) not in got and (3, 1) not in got


def test_prefix_containment_defuses_hot_shingle(spark):
    """The scale point: a boilerplate shingle shared by k docs
    contributes ~k^2/2 candidate rows through the raw self-join but
    ~0 through the prefix join (rarest-first order keeps hot shingles
    out of every prefix). Measured on a planted corpus."""
    from pyspark.sql import Window as W

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (  # noqa: E501
        tokens,
        word_ngrams,
    )

    # 40 docs share the identical boilerplate header (one hot shingle
    # family); each doc's body is unique
    rows = [
        (i, "terms of service apply " + f"u{i}a u{i}b u{i}c u{i}d u{i}e")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    sh = docs.where(F.size(tokens("text")) >= n).select(
        F.col("doc_id").alias("_id"), word_ngrams("text", n).alias("s")
    )
    ex = sh.select("_id", F.explode("s").alias("shingle")).persist()
    raw_cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least(F.col("a._id"), F.col("b._id")),
            F.greatest(F.col("a._id"), F.col("b._id")),
        )
        .distinct()
        .count()
    )
    sizes = ex.groupBy("_id").agg(F.count("*").cast("int").alias("n_shingles"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("_df"))
    alpha = F.expr("(4 * n_shingles + 4) div 5")
    pref = (
        ex.join(dfreq, "shingle")
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("_id").orderBy("_df", "shingle")),
        )
        .join(sizes, "_id")
        .where(F.col("_rn") <= F.col("n_shingles") - alpha + 1)
        .select("_id", "shingle")
    )
    pref_cand = (
        pref.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least(F.col("a._id"), F.col("b._id")),
            F.greatest(F.col("a._id"), F.col("b._id")),
        )
        .distinct()
        .count()
    )
    # raw: every one of the 40*39/2 = 780 pairs is a candidate through
    # the shared boilerplate; prefix: none (hot shingles rank last)
    assert raw_cand == 780
    assert pref_cand == 0


def test_lint_flags_keyed_agg_broadcast_and_allows_scalar_gate(spark):
    """Red case: a forced broadcast of a per-key aggregate (unbounded
    cardinality -- the old basket_rules shape) is flagged. Green cases:
    the 1-row scalar gate idiom passes, and an allow-listed
    domain-constant key passes."""
    import pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans.audit import (  # noqa: E501
        PlanLintError,
        lint_plan,
    )

    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    per_key = df.groupBy("k").agg(F.count("*").alias("n"))

    bad = df.join(F.broadcast(per_key), "k")
    with pytest.raises(PlanLintError, match="per-key aggregate"):
        lint_plan(bad, forbid_keyed_agg_broadcast=True)
    # allow-listed as a domain constant -> passes
    lint_plan(
        bad,
        forbid_keyed_agg_broadcast=True,
        bounded_broadcast_keys={"k"},
    )

    total = df.agg(F.count("*").alias("n_total"))  # global agg: 1 row
    good = df.crossJoin(F.broadcast(total))
    lint_plan(good, forbid_keyed_agg_broadcast=True)


def test_basket_rules_has_no_forced_per_key_broadcast(spark):
    """basket_rules' only remaining broadcast hint is the 1-row order
    total; the per-part count joins are left to AQE's size check."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans.audit import (  # noqa: E501
        lint_plan,
    )

    df = Q.q_basket_rules(spark, SF)
    lint_plan(df, forbid_keyed_agg_broadcast=True)
