"""Round-5 query properties beyond oracle parity: bitmap merge
losslessness, OLS degeneracy, winsorize bounds."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

from conftest import ORACLE_SF


def test_bitmap_merge_equals_direct_bitmap(spark):
    """OR-merging per-day bitmaps must equal one direct per-month
    bitmap -- the losslessness that makes incremental maintenance
    exact (the HLL twin only gets sketch-state equality)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    ev = fixtures.events(spark, ORACLE_SF)
    base = ev.select(
        F.date_trunc("month", "ts").cast("date").alias("month"), "user_id"
    )
    direct = (
        base.groupBy("month", F.bitmap_bucket_number("user_id").alias("b"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
        .groupBy("month")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("exact_users"))
    )
    merged = entry.queries()["dau_bitmap_merge"](spark, ORACLE_SF).select(
        "month", "exact_users"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_brand_trend_flat_series_has_zero_slope(spark):
    """Sanity on the closed form: a constant series fits slope=0,
    intercept=the constant -- exactly, not approximately."""
    df = spark.createDataFrame(
        [("B", x, 7) for x in range(5)] + [("C", 0, 1), ("C", 1, 3)],
        "brand string, x long, y long",
    )
    d = lambda c: c.cast("decimal(38,0)")
    stats = df.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(d(F.col("x")) * F.col("y")).alias("sxy"),
    )
    den = d(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx")
    s_num = d(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy")
    i_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    got = {
        r.brand: (float(r.slope), float(r.icept))
        for r in stats.select(
            "brand",
            (s_num.cast("double") / den.cast("double")).alias("slope"),
            (i_num.cast("double") / den.cast("double")).alias("icept"),
        ).collect()
    }
    assert got["B"] == (0.0, 7.0)
    assert got["C"] == (2.0, 1.0)


def test_winsorized_mean_between_bounds_and_robust(spark):
    """The winsorized mean must land inside [p05, p95], and an
    injected extreme outlier must move it far less than the raw mean."""
    q = entry.queries()["winsorized_stats"]
    rows = {r.event_type: r for r in q(spark, ORACLE_SF).collect()}
    assert rows
    for r in rows.values():
        assert r.p05 <= r.winsorized_mean <= r.p95
        assert r.n_events > 0


def test_repeated_spans_plants_cross_doc_duplicates(spark):
    """A planted shared 5-token span is counted for BOTH docs; an
    intra-doc repeat alone is not cross-doc duplicated."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )
    import tempfile

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, shared + " one two three"),
        (2, "x y z " + shared),
        (3, "p q r s t p q r s t"),  # intra-doc repeat only
        (4, "lone words here only four"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{d}/documents.parquet"
        )
        got = {
            r.doc_id: (r.n_spans, r.dup_spans)
            for r in Q.q_repeated_spans(spark, d).collect()
        }
    assert got[1] == (4, 1) and got[2] == (4, 1)
    # doc 3: spans repeat within the doc, but no OTHER doc shares them
    assert got[3][1] == 0
    assert got[4] == (1, 0)


def test_repeated_spans_no_span_string_crosses_an_exchange(spark):
    """Spans fold to xxhash64 longs in the scan projection; no
    Exchange block may carry the text or a span string (the
    contamination_hashed shuffle-budget discipline)."""
    import re as _re

    from test_plan_shape import plan_of

    p = plan_of(spark, "repeated_spans")
    blocks = _re.split(r"\n\n", p)
    exchange_blocks = [b for b in blocks if _re.match(r"\(\d+\) Exchange", b)]
    assert exchange_blocks, "no Exchange blocks parsed"
    for b in exchange_blocks:
        assert not _re.search(r"\btext#\d+", b), f"text crosses a shuffle:\n{b}"


def test_token_dist_drift_closed_forms(spark):
    """Single source => TV = 0 exactly; two sources with DISJOINT
    vocab => TV(s) = 1 - N_s/N exactly (the out-of-vocab mass and the
    in-vocab excess coincide)."""
    import tempfile

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    rows = [
        (1, "aa bb aa cc", "web"),      # 4 tokens
        (2, "aa bb", "web"),            # 2 tokens -> web N_s=6
        (3, "xx yy zz xx", "books"),    # 4 tokens -> books N_s=4; N=10
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r.source: (r.n_tokens, r.vocab, r.tv_distance)
            for r in Q.q_token_dist_drift(spark, d).collect()
        }
    assert got["web"] == (6, 3, round(1 - 6 / 10, 6))
    assert got["books"] == (4, 3, round(1 - 4 / 10, 6))

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "p q p", "only"), (2, "q p q", "only")],
            "doc_id long, text string, source string",
        ).write.parquet(f"{d}/documents.parquet")
        sole = Q.q_token_dist_drift(spark, d).collect()
    assert len(sole) == 1 and sole[0].tv_distance == 0.0


def test_tfidf_planted_rare_token_is_top_keyword(spark):
    """A token unique to one doc maximizes tf*N/df there and must rank
    rk=1; a token present in every doc ranks below any rarer one."""
    import tempfile

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    rows = [
        (1, "common zebra zebra"),
        (2, "common common common rare rare"),
        (3, "common filler filler"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{d}/documents.parquet"
        )
        out = Q.q_tfidf_keywords(spark, d).collect()
    top = {r.doc_id: r.token for r in out if r.rk == 1}
    assert top[1] == "zebra"      # 2*3/1=6.0 beats common 1*3/3=1.0
    assert top[2] == "rare"       # 2*3/1=6.0 beats common 3*3/3=3.0
    assert top[3] == "filler"     # 2*3/1=6.0


def test_epoch_shuffle_permutes_between_epochs_and_balances_shards(spark):
    """Epoch 0 and epoch 1 must order the same docs differently (else
    it isn't a reshuffle), every doc appears exactly once per epoch,
    and no shard hogs the corpus (md5 uniformity at n=500)."""
    from collections import Counter

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    rows = Q.q_epoch_shuffle(spark, ORACLE_SF).collect()
    by_epoch = {e: [r for r in rows if r.epoch == e] for e in (0, 1)}
    docs0 = [r.doc_id for r in sorted(by_epoch[0], key=lambda r: r.order_key)]
    docs1 = [r.doc_id for r in sorted(by_epoch[1], key=lambda r: r.order_key)]
    assert sorted(docs0) == sorted(docs1)          # same corpus each epoch
    assert docs0 != docs1                          # different permutation
    assert len(set(docs0)) == len(docs0)           # exactly once per epoch
    shard_sizes = Counter(r.shard for r in by_epoch[0])
    n = len(docs0)
    assert all(abs(c - n / 8) < 0.5 * n / 8 for c in shard_sizes.values()), (
        f"shard imbalance: {shard_sizes}"
    )


def test_k_anonymity_flags_exactly_the_small_classes(spark):
    """Planted: one class of 6 (safe) and one of 2 (at risk); sizes
    partition the corpus exactly."""
    import tempfile

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    rows = [(i, "t", "en", "web", 100) for i in range(6)] + [
        (10, "t", "de", "web", 100),
        (11, "t", "de", "web", 120),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {(r.lang, r.source, r.len_band): (r.class_size, r.at_risk)
               for r in Q.q_k_anonymity(spark, d).collect()}
    assert out[("en", "web", 0)] == (6, False)
    assert out[("de", "web", 0)] == (2, True)
    assert sum(v[0] for v in out.values()) == 8


def test_sliding_window_equals_sum_of_covered_tumbling_hours(spark):
    """A [h, h+2h) sliding window must count exactly tumbling(h) +
    tumbling(h+1) -- the Expand semantics pinned against the tumbling
    rollup for every window and type."""
    import datetime as dt

    tumb = {
        (r.bucket_start, r.event_type): r.n_events
        for r in entry.queries()["events_hourly"](spark, ORACLE_SF).collect()
    }
    for r in entry.queries()["events_sliding"](spark, ORACLE_SF).collect():
        expect = tumb.get((r.window_start, r.event_type), 0) + tumb.get(
            (r.window_start + dt.timedelta(hours=1), r.event_type), 0
        )
        assert r.n_events == expect, (r.window_start, r.event_type)


def test_join_view_delta_equals_full_recompute(spark):
    """The delta rule's refreshed view must equal the from-scratch join
    ROW FOR ROW (the oracle only sees the aggregate), and the three
    delta terms must be pairwise disjoint -- what makes the refresh a
    plain append with no dedup pass."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.incremental import (
        join_view_delta,
        join_view_refresh,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    sf = "/root/testdata/sf0.001"
    orders = fixtures.load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = fixtures.load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    a_old = orders.where(F.col("o_orderkey") % 5 != 0)
    a_delta = orders.where(F.col("o_orderkey") % 5 == 0)
    b_old = li.where(F.col("o_orderkey") % 7 != 0)
    b_delta = li.where(F.col("o_orderkey") % 7 == 0)

    delta = join_view_delta(a_old, a_delta, b_old, b_delta, on="o_orderkey")
    refreshed = join_view_refresh(a_old.join(b_old, on=["o_orderkey"]), delta)
    direct = orders.join(li, on=["o_orderkey"])

    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # disjointness: quadrant sizes must add up with no overlap
    terms = [
        a_delta.join(b_old, on=["o_orderkey"]),
        a_old.join(b_delta, on=["o_orderkey"]),
        a_delta.join(b_delta, on=["o_orderkey"]),
    ]
    counts = [t.count() for t in terms]
    assert all(c > 0 for c in counts), "fixture must exercise every quadrant"
    assert delta.count() == sum(counts)


def test_join_view_delta_rejects_payload_collision(spark):
    """Overlapping non-key payload columns would silently mis-merge on
    unionByName -- the guard must refuse up front."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.incremental import (
        join_view_delta,
    )

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, v string")
    with pytest.raises(ValueError, match="disjoint payload"):
        join_view_delta(a, a, b, b, on="k")


def test_dedup_incremental_old_wins_and_is_idempotent(spark):
    """Incremental dedup contract: (a) no kept hash exists in the
    stored index; (b) within-batch dups collapse to the min doc_id;
    (c) merging the batch into the index and re-running keeps NOTHING
    -- the idempotency a replayed crawl depends on. Drives the SAME
    ``incremental_exact_dedup`` that q_dedup_incremental runs, so the
    query cannot drift from this contract."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (
        incremental_exact_dedup,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha"),   # batch; dup of corpus doc 1 -> dropped
            (4, "beta"),    # batch; dup within batch of doc 8
            (8, "beta"),    # batch; loses in-batch tie to doc 4
            (12, "gamma"),  # batch; genuinely new -> kept
            (1, "alpha"),   # corpus
            (2, "delta"),   # corpus
        ],
        "doc_id long, text string",
    )
    hashed = docs.select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
    batch = hashed.where(F.col("doc_id") % 4 == 0)
    index = hashed.where(F.col("doc_id") % 4 != 0).select("h").distinct()

    kept = incremental_exact_dedup(batch, index, hash_col="h")
    assert sorted(r.doc_id for r in kept.collect()) == [4, 12]

    merged_index = index.unionByName(kept.select("h")).distinct()
    assert incremental_exact_dedup(batch, merged_index, hash_col="h").count() == 0
