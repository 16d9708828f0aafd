"""class_lm_predictions: the fixed-point class-unigram-LM classifier
must actually LEARN when the labels are learnable (the sf testdata's
labels are random w.r.t. tokens, so the oracle-paired query can only
pin exactness -- the model contract is proven here on planted signal).
"""

import pyspark.sql.functions as F
import pytest

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.classify import (
    class_lm_predictions,
)


def _corpus(spark, n_per_class=30, noise="row scan table value part"):
    """Three classes whose docs share a noise vocabulary but each mix
    in a class-specific marker token; even ids train, odd ids test."""
    markers = {"news": "politics", "code": "compiler", "law": "statute"}
    rows = []
    doc_id = 0
    for cls, marker in sorted(markers.items()):
        for i in range(n_per_class):
            # marker appears 3x per doc -- strong but not degenerate
            text = f"{noise} {marker} {noise} {marker} {marker} {noise}"
            rows.append((doc_id, text, cls))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_planted_signal_is_learned_perfectly(spark):
    docs = _corpus(spark).withColumn("is_train", F.col("doc_id") % 2 == 0)
    pred = class_lm_predictions(docs, label_col="source").collect()
    assert len(pred) == 45  # odd ids of 90 docs
    assert all(r.predicted == r.source for r in pred), [
        (r.doc_id, r.source, r.predicted) for r in pred if r.predicted != r.source
    ]


def test_unseen_and_empty_docs_still_classify(spark):
    """A holdout doc of entirely unseen tokens falls back to the
    smoothing-floor baseline (largest w0 = smallest den wins, ties
    break lexicographically); an empty doc scores 0 for every class
    and takes the lexicographically first class. Both must classify --
    a curation pipeline can't drop docs on the classifier floor."""
    docs = _corpus(spark, n_per_class=10)
    extra = docs.sparkSession.createDataFrame(
        [(1000, "zzz qqq xxx", "news"), (1001, "", "law")],
        "doc_id long, text string, source string",
    )
    full = docs.unionByName(extra).withColumn(
        "is_train", F.col("doc_id") < 1000
    )
    pred = {
        r.doc_id: r.predicted
        for r in class_lm_predictions(full, label_col="source").collect()
    }
    assert set(pred) == {1000, 1001}
    # all classes here have identical token totals, so den ties across
    # classes and both fallbacks resolve to the first class name
    assert pred[1000] == "code" and pred[1001] == "code"


def test_split_function_not_row_order(spark):
    """Classifying a shuffled/repartitioned copy of the corpus yields
    identical predictions -- membership and argmax depend only on row
    attributes."""
    docs = _corpus(spark).withColumn("is_train", F.col("doc_id") % 2 == 0)
    a = {
        r.doc_id: r.predicted
        for r in class_lm_predictions(docs, label_col="source").collect()
    }
    b = {
        r.doc_id: r.predicted
        for r in class_lm_predictions(
            docs.repartition(7, "text"), label_col="source"
        ).collect()
    }
    assert a == b


def test_label_leak_guard(spark):
    """Holdout rows never contribute to the class counts: a marker that
    appears ONLY in holdout docs of class X must not pull other holdout
    docs toward X (i.e. the model is trained strictly on is_train)."""
    rows = [
        # train: two classes distinguished by markers
        (0, "aa bb leak_a", "A", True),
        (1, "aa bb leak_a", "A", True),
        (2, "aa bb leak_b", "B", True),
        (3, "aa bb leak_b", "B", True),
        # holdout doc of class B whose text contains a POISON token
        (4, "aa bb leak_b poison poison poison", "B", False),
        # holdout doc containing ONLY the poison token: if holdout rows
        # leaked into training, poison would bind to B and pull this
        # doc to B; with a clean split the doc is all-unseen and falls
        # back to the smoothing floor (den ties -> first class A)
        (5, "poison poison poison", "A", False),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, is_train boolean"
    )
    pred = {
        r.doc_id: r.predicted
        for r in class_lm_predictions(docs, label_col="source").collect()
    }
    assert pred[4] == "B"  # leak_b carries it despite the poison noise
    assert pred[5] == "A"  # all-unseen fallback, no holdout leakage


@pytest.mark.parametrize("scale", [1 << 20, 1 << 40])
def test_scale_parameter_preserves_argmax_on_strong_signal(spark, scale):
    """The fixed-point quantization is the model definition, but on a
    clearly-separated corpus the argmax must be scale-invariant."""
    docs = _corpus(spark, n_per_class=12).withColumn(
        "is_train", F.col("doc_id") % 2 == 0
    )
    pred = class_lm_predictions(docs, label_col="source", scale=scale).collect()
    assert all(r.predicted == r.source for r in pred)
