"""Round-6 inventory-policy and SCD2-stream queries: semantic contracts
beyond the generic oracle parity (which pins values)."""

from collections import defaultdict

from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
    queries as Q,
)

from conftest import TESTDATA as SF


def test_reorder_point_dominates_lead_time_demand(spark):
    """z*std*sqrt(L) >= 0, so the reorder point can never be below mean
    lead-time demand; and std is 0 exactly when every observed daily
    demand is identical."""
    rows = Q.q_reorder_points(spark, SF).collect()
    assert rows, "no skus with >= 2 sale days at sf0.001?"
    for r in rows:
        assert r.n_days >= 2
        assert r.std_daily >= 0
        assert r.reorder_point >= r.mean_daily * 7 - 1e-6


def test_reorder_point_closed_form_on_planted_demand(spark):
    """Hand-check the policy formula through the same plan on a planted
    frame: demands 10, 20 -> mean 15, std_samp sqrt(50), RP =
    105 + 1.65*sqrt(50)*sqrt(7)."""
    import math

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    df = Q.q_reorder_points(spark, SF)
    # independent recompute at the same sf from the raw table
    li = fixtures.load(spark, SF, "lineitem").select(
        F.col("l_partkey").cast("string").alias("sku"),
        F.to_date("l_shipdate").alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    daily = {
        (r.sku, r.d): r.s
        for r in li.groupBy("sku", "d").agg(F.sum("q").alias("s")).collect()
    }
    per_sku = defaultdict(list)
    for (sku, _), s in daily.items():
        per_sku[sku].append(s)
    got = {r.sku: r for r in df.collect()}
    checked = 0
    for sku, ds in per_sku.items():
        if len(ds) < 2:
            assert sku not in got
            continue
        n, s, ss = len(ds), sum(ds), sum(d * d for d in ds)
        mean = s / n
        var = (n * ss - s * s) / (n * (n - 1))
        rp = mean * 7 + 1.65 * math.sqrt(var) * math.sqrt(7.0)
        assert abs(got[sku].reorder_point - round(rp, 4)) < 1e-6, sku
        checked += 1
    assert checked > 10


def test_state_history_islands_are_maximal_and_tile_the_stream(spark):
    """Gaps-and-islands contract: consecutive intervals per user always
    CHANGE state (else they'd be one island), valid_to equals the next
    interval's valid_from (half-open tiling), only the last interval
    per user is open (valid_to NULL), and n_events sums back to the
    filtered event count."""
    rows = Q.q_user_state_history(spark, SF).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, ivals in by_user.items():
        ivals.sort(key=lambda r: r.valid_from)
        for a, b in zip(ivals, ivals[1:]):
            assert a.state != b.state, f"adjacent equal states for {user}"
            assert a.valid_to == b.valid_from
        assert ivals[-1].valid_to is None
        for iv in ivals[:-1]:
            assert iv.valid_to is not None

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    n_events = (
        fixtures.events(spark, SF).where(F.col("user_id") % 20 == 0).count()
    )
    assert sum(r.n_events for r in rows) == n_events


def test_abc_xyz_matrix_partitions_the_catalog(spark):
    """The 9-cell grid is a partition of the per-sku catalog: cell
    counts sum to the number of skus with any sale, labels are from
    the {A,B,C} x {X,Y,Z} grid."""
    rows = Q.q_abc_xyz_matrix(spark, SF).collect()
    assert rows
    assert all(r.abc_class in "ABC" and r.xyz_class in "XYZ" for r in rows)

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    n_skus = (
        fixtures.load(spark, SF, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_skus for r in rows) == n_skus


def test_hierarchy_rollup_roots_and_totals(spark):
    """Roots are the single-digit keys, every part rolls to its first
    decimal digit, and the rollup conserves total revenue."""
    rows = Q.q_part_hierarchy_rollup(spark, SF).collect()
    assert rows
    assert all(0 <= r.root <= 9 for r in rows)  # partkeys start at 0 here

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
        fixtures,
    )

    li = fixtures.load(spark, SF, "lineitem")
    total = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    ).first()[0]
    assert abs(sum(r.revenue for r in rows) - float(total)) < 1e-4
    assert sum(r.n_lines for r in rows) == li.count()
    # single-digit roots that only appear as themselves have depth 0;
    # multi-digit chains give their root a positive max depth
    assert all(r.max_depth >= 0 for r in rows)
    assert max(r.max_depth for r in rows) >= 2  # real multi-level chains


def test_gap_fill_densifies_and_carries_forward(spark):
    """Every sku gets all 365 spine days; filled values only change on
    observed days; before the first observation the fill is NULL."""
    rows = Q.q_stock_gap_fill(spark, SF).collect()
    by_sku = defaultdict(list)
    for r in rows:
        by_sku[r.sku].append(r)
    assert by_sku
    for sku, days in by_sku.items():
        assert len(days) == 365
        days.sort(key=lambda r: r.day)
        last = None
        seen_first = False
        for r in days:
            if r.observed:
                seen_first = True
                last = r.qty_filled
                assert r.qty_filled is not None
            elif seen_first:
                assert r.qty_filled == last  # carried forward unchanged
            else:
                assert r.qty_filled is None  # before first observation
