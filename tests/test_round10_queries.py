"""Round-10 additions: DF-aware containment routing (the r9 VERDICT's
one perf-weak row) and this round's new operators."""

import pytest
from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
    fixtures,
)

SF = "/root/testdata/sf0.001"


def _hot_corpus(spark):
    """40 docs sharing a boilerplate header: two shingles at DF=40 --
    the corpus the prefix filter exists for (same planting as
    test_round8_queries.test_prefix_containment_defuses_hot_shingle,
    plus one genuine containment pair so the route has signal)."""
    rows = [
        (i, "terms of service apply " + f"u{i}a u{i}b u{i}c u{i}d u{i}e")
        for i in range(40)
    ]
    # doc 100 is a strict prefix of doc 0's text: contained at 1.0
    rows.append((100, "terms of service apply u0a u0b u0c"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.containment) for r in df.collect()}


def test_containment_router_output_is_route_independent(spark):
    """Forcing either route must produce the identical directional
    pair set -- on a hot corpus (prefix's home turf) AND on the real
    sf0.001 documents (raw's home turf). The raw route is lossless by
    definition and the prefix route by theorem; this pins that the
    refactored shared tail keeps the contract."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        containment_pairs,
    )

    for docs in (
        _hot_corpus(spark),
        fixtures.fan_out(fixtures.load(spark, SF, "documents")),
    ):
        raw = _pairs(containment_pairs(docs, max_df_raw_route=10**9))
        pref = _pairs(containment_pairs(docs, max_df_raw_route=0))
        routed = _pairs(containment_pairs(docs))
        assert raw == pref == routed and raw


def test_containment_router_picks_the_right_regime(spark):
    """The hot corpus (max DF 40+) must clear the default gate into
    the prefix route; the generator corpus (max DF 7 at sf0.01) must
    stay raw. The decision itself is a pure function of the measured
    max document frequency -- pin both the measurement and the
    decision."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (  # noqa: E501
        tokens,
        word_ngrams,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        _containment_route,
    )

    def max_df(docs):
        ex = docs.where(F.size(tokens("text")) >= 3).select(
            F.explode(word_ngrams("text", 3)).alias("shingle")
        )
        return (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .agg(F.max("df"))
            .first()[0]
        )

    hot = max_df(_hot_corpus(spark))
    assert hot >= 40
    assert _containment_route(hot, 32) == "prefix"

    benign = max_df(
        fixtures.fan_out(fixtures.load(spark, "/root/testdata/sf0.01", "documents"))
    )
    assert benign <= 32
    assert _containment_route(benign, 32) == "raw"


def test_containment_router_boundary_pair_on_raw_route(spark):
    """The exact c = 0.8 boundary pair must survive the RAW route too
    (the r8 boundary test covers the prefix route): the rounded
    acceptance rule lives in the shared tail, not in either route."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        containment_pairs,
    )

    d1 = "w1 w2 w3 w4 w5 w6 w7"
    d2 = "w1 w2 w3 w4 w5 w6 x1 x2 x3 x4 x5 x6 x7 x8"
    d3 = "w1 w2 w3 w4 w5 y1 y2 y3 y4 y5 y6 y7 y8 y9"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = {(r.doc_a, r.doc_b): r.containment for r in containment_pairs(docs).collect()}
    assert got[(1, 2)] == 0.8
    assert (1, 3) not in got and (3, 1) not in got
