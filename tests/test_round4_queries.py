"""Semantics pins for the round-4 curation queries, beyond the oracle
parity sweep: the properties a refactor could silently break while the
oracle (which shares the recipe) still agreed."""

import pytest
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


def test_lm_score_token_conservation_and_bounds(spark):
    """Every corpus token lands in exactly one per-doc TF cell, so
    sum(n_tokens) over the result equals the whole-corpus token count;
    the mean-probability score is a probability-weighted mean of token
    frequencies, so 0 < score <= 1 (score == max_count/N only if a doc
    is all top-token)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (
        token_count,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    out = entry.queries()["lm_score"](spark, TESTDATA)
    docs = fixtures.load(spark, TESTDATA, "documents")
    n_corpus = docs.select(F.sum(token_count("text"))).collect()[0][0]
    got = out.agg(
        F.sum("n_tokens").alias("n"),
        F.min("lm_score").alias("lo"),
        F.max("lm_score").alias("hi"),
    ).collect()[0]
    assert got.n == n_corpus, (got.n, n_corpus)
    assert 0.0 < got.lo <= got.hi <= 1.0, (got.lo, got.hi)


def test_lm_score_rare_doc_scores_below_common_doc(spark):
    """A doc made of hapax tokens must score strictly below a doc made
    of the corpus head token -- the discriminative property the quality
    gate relies on. Built on a synthetic corpus so the ranking claim is
    exact, not statistical."""
    rows = [(1, "aardwolf87 zyzzyva93 qwertyuiop42"), (2, "the the the")] + [
        (i, "the common words appear here") for i in range(3, 20)
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t)) for i, t in rows],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        docs.write.parquet(f"{d}/documents.parquet")
        scores = {
            r.doc_id: r.lm_score
            for r in entry.queries()["lm_score"](spark, d).collect()
        }
    assert scores[1] < scores[2], scores


def test_lm_score_no_token_string_crosses_a_shuffle(spark):
    """Scale guard (bm25 idiom): tokens are xxhash64-ed before the
    first exchange, so every shuffle carries 8-byte keys -- no raw
    token/text column in any Exchange block."""
    import re

    df = entry.queries()["lm_score"](spark, TESTDATA)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    blocks = re.split(r"\n\n", p)
    exchange_blocks = [b for b in blocks if re.match(r"\(\d+\) Exchange", b)]
    assert exchange_blocks, "no Exchange blocks parsed from formatted plan"
    for b in exchange_blocks:
        assert not re.search(r"\b(token|text)#\d+", b), b


def test_key_skew_profile_bounds_and_plan(spark):
    """Shares are probabilities, the head key's skew_ratio >= 1 (max >=
    mean), and the plan uses TakeOrderedAndProject + broadcast scalar
    gate -- never a global window or full sort."""
    import re

    df = entry.queries()["key_skew_profile"](spark, TESTDATA)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert all(0.0 < r.share <= 1.0 for r in rows)
    assert rows[0].skew_ratio >= 1.0  # the head key is at least average
    assert rows == sorted(rows, key=lambda r: (-r.n, r.user_id))
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p, "scalar gate regressed to a global window"


def test_incremental_merge_equals_full_recompute_with_conflicts(spark):
    """The merged rollup must equal a from-scratch recompute, and the
    late batch must actually collide with history on some hours --
    otherwise the merge path under test is just a disjoint union."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sessionize import (
        hourly_rollup,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    merged = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in entry.queries()["incremental_hourly_merge"](
            spark, TESTDATA
        ).collect()
    }
    full = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in hourly_rollup(fixtures.events(spark, TESTDATA)).collect()
    }
    assert merged == full

    ev = fixtures.events(spark, TESTDATA)
    grain = lambda part: {
        (r.bucket_start, r.event_type)
        for r in part.groupBy(
            F.window("ts", "1 hour").start.alias("bucket_start"), "event_type"
        )
        .agg(F.count("*"))
        .collect()
    }
    hist = grain(ev.where(F.col("event_id") % 4 != 0))
    late = grain(ev.where(F.col("event_id") % 4 == 0))
    assert hist & late, "late batch never collides with history"


def test_dedup_keep_best_keeps_the_max_quality_member(spark):
    """The kept doc must carry its group's maximum quality (lowest
    doc_id on ties), and the dropped count must conserve: sum(n_dropped)
    == grouped docs - number of groups."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (
        quality_score,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (
        shingle_jaccard_pairs,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (
        dedup_groups,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    docs = fixtures.load(spark, TESTDATA, "documents")
    groups = dedup_groups(
        shingle_jaccard_pairs(docs, n=3, threshold=0.5)
    ).where(F.col("group_size") >= 2)
    member_q = {
        (r.canonical_id, r.doc_id): r.q
        for r in groups.join(
            docs.select("doc_id", quality_score("text").alias("q")), "doc_id"
        ).collect()
    }
    kept = entry.queries()["dedup_keep_best"](spark, TESTDATA).collect()
    assert kept
    by_group = {}
    for (g, d), q in member_q.items():
        by_group.setdefault(g, []).append((q, d))
    for r in kept:
        best_q = max(q for q, _ in by_group[r.canonical_id])
        assert r.kept_quality == best_q
        best_doc = min(d for q, d in by_group[r.canonical_id] if q == best_q)
        assert r.kept_doc == best_doc
    assert sum(r.n_dropped for r in kept) == len(member_q) - len(by_group)


def test_dedup_canonical_catches_case_whitespace_variants(spark):
    """On a synthetic corpus where byte-exact dedup sees all-distinct
    docs, the canonical pass must collapse case/whitespace variants
    into one group and report n_raw_variants > 1 -- the delta that
    justifies the canonicalization stage."""
    import tempfile

    rows = [
        (1, "Hello  World"),
        (2, "hello world"),
        (3, "HELLO\tWORLD "),
        (4, "entirely different text"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t)) for i, t in rows],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        out = {
            r.kept_doc: (r.n_members, r.n_raw_variants)
            for r in entry.queries()["dedup_canonical"](spark, d).collect()
        }
        exact = entry.queries()["dedup_exact"](spark, d).count()
    assert exact == 4  # byte-exact sees four distinct docs
    assert out[1] == (3, 3), out  # canonical collapses the three variants
    assert out[4] == (1, 1), out


def test_source_quality_drift_flags_a_degraded_source(spark):
    """Weighted drift must sum to ~0 (it is deviation from the weighted
    mean), and a synthetic source of garbage one-token docs must be the
    one flagged."""
    import tempfile

    out = entry.queries()["source_quality_drift"](spark, TESTDATA).collect()
    weighted = sum(r.drift * r.n_docs for r in out)
    assert abs(weighted) < 1e-3 * sum(r.n_docs for r in out)

    # degraded source small enough (5%) that it cannot drag the global
    # mean past the good source's own 0.05 tolerance
    good = [(i, "the quick brown fox jumps over a lazy dog " * 6, "good")
            for i in range(190)]
    bad = [(1000 + i, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz", "degraded")
           for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, t, s in good + bad],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        flags = {
            r.source: r.flagged
            for r in entry.queries()["source_quality_drift"](spark, d).collect()
        }
    assert flags == {"good": False, "degraded": True}, flags


@pytest.mark.parametrize("mod,rem", [(2, 0), (3, 1), (5, 4)])
def test_incremental_merge_invariant_to_split_choice(spark, mod, rem):
    """Partial-aggregate merge must equal the full recompute for ANY
    deterministic history/late-batch split -- the %4 in the shipped
    query is one instance of a general associativity property."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sessionize import (
        hourly_rollup,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    ev = fixtures.events(spark, TESTDATA)

    def partial(part):
        return part.groupBy(
            F.window("ts", "1 hour").start.alias("bucket_start"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )

    merged = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in partial(ev.where(F.col("event_id") % mod != rem))
        .unionByName(partial(ev.where(F.col("event_id") % mod == rem)))
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
        .collect()
    }
    full = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in hourly_rollup(ev).collect()
    }
    assert merged == full
