"""Semantics pins for the round-4 curation queries, beyond the oracle
parity sweep: the properties a refactor could silently break while the
oracle (which shares the recipe) still agreed."""

from pyspark.sql import functions as F

import __spark_entry__ as entry

from conftest import TESTDATA


def test_pii_scan_finds_every_injected_token(spark):
    # every 7th doc carries exactly one injected email, every 11th one
    # phone; a doc hit by both carries both. A regex that over- or
    # under-matches breaks these exact counts.
    rows = {
        r.doc_id: (r.n_emails, r.n_phones)
        for r in entry.queries()["pii_scan"](spark, TESTDATA).collect()
    }
    assert rows
    for doc_id, (n_e, n_p) in rows.items():
        assert n_e == (1 if doc_id % 7 == 0 else 0), (doc_id, n_e)
        assert n_p == (1 if doc_id % 11 == 0 else 0), (doc_id, n_p)
    assert any(i % 7 == 0 and i % 11 == 0 for i in rows)  # both-kinds doc


def test_pii_scan_redaction_shrinks_or_replaces(spark):
    # the redacted text must not contain the PII markers; clean_len
    # reflects the <EMAIL>/<PHONE> placeholders
    df = entry.queries()["pii_scan"](spark, TESTDATA)
    assert df.where(F.col("clean_len") <= 0).count() == 0


def test_mixture_weights_sum_to_one(spark):
    rows = entry.queries()["mixture_weights"](spark, TESTDATA).collect()
    assert len(rows) >= 2
    total = sum(r.sample_weight for r in rows)
    assert abs(total - 1.0) < 1e-3  # rounding at 4dp, 5 langs
    # sqrt-temperature flattens: the weight ratio must be milder than
    # the doc-count ratio between the largest and smallest language
    big, small = max(rows, key=lambda r: r.n_docs), min(rows, key=lambda r: r.n_docs)
    if big.n_docs > small.n_docs:
        assert (
            big.sample_weight / small.sample_weight
            < big.n_docs / small.n_docs
        )


def test_quality_flags_only_rejects_and_reasons_fire(spark):
    df = entry.queries()["quality_flags"](spark, TESTDATA)
    rows = df.collect()
    assert rows, "gate is vacuous on testdata"
    for r in rows:  # every reported doc fails at least one rule
        assert not (r.len_ok and r.wordlen_ok and r.rep_ok)


def test_user_journey_conserves_users(spark):
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    journeys = entry.queries()["user_journey"](spark, TESTDATA).collect()
    n_users = (
        fixtures.events(spark, TESTDATA).select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in journeys) == n_users


def test_sku_sales_anomaly_rows_deviate_from_trailing_mean(spark):
    rows = entry.queries()["sku_sales_anomaly"](spark, TESTDATA).collect()
    for r in rows:  # reported months really deviate from their window
        assert r.trail_n >= 4
        assert abs(float(r.qty) - float(r.trail_mean)) > 0
