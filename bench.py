#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is executed as the driver does -- full materialization via a
count over the final frame -- and timed wall-clock. A warmup pass of the
flagship amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.session import (  # noqa: E402
    build_session,
)

#: Headline set: the reference pipeline + one per extension family.
BENCH_QUERIES = [
    "reconcile",
    "stage_sales",
    "dim_products",
    "pricing_summary",
    "region_revenue",
    "events_sessionize",
    "text_stats",
    "dedup_exact",
    "simhash",
    "sim_topk",
    "minhash_pairs",
    "stock_asof",
    # round-4 additions (VERDICT r3 item 4): the round-3 surface gets
    # longitudinal timing from its first full round onward
    "market_share",
    "contamination_check",
    "image_dims",
    "table_profile",
    # round-4 surface: the corpus-wide token join (heaviest new shuffle)
    # and the regex-heavy PII scrub
    "lm_score",
    "pii_scan",
    # round-5 surface: first floors for the heaviest new shapes -- the
    # order-pair self-join, the corpus-wide tokenizer scan, the exact
    # per-group OLS, and the histogram winsorize
    "copurchase_pairs",
    "token_budget",
    "brand_trend",
    "winsorized_stats",
    # round-5 late additions: the positional-span corpus join (heaviest
    # of the new text shapes), the three-aggregate TF/DF/vocab scan,
    # and the COMPOSED curation DAG (dedup + contamination + quality
    # in one plan -- the heaviest end-to-end LLM shape)
    "repeated_spans",
    "token_dist_drift",
    "tfidf_keywords",
    "curation_summary",
    # the 4-way delta-join union (incremental view maintenance) and the
    # stored-index incremental dedup: first floors this round
    "join_view_merge",
    "dedup_incremental",
    # round-6: the banded global prefix sum (full per-sku revenue agg +
    # per-decade cumulative windows) -- first floor this round
    "abc_classification",
    # safety-stock policy: per-sku exact demand stats -- first floor r6
    "reorder_points",
    # iterative transitive-closure loop (8 localCheckpoint rounds) and
    # spine densification + forward fill -- first floors r6
    "part_hierarchy_rollup",
    "stock_gap_fill",
    # round-7: the SCD2 point-in-time join, the 3-way-star chi2
    # residual screen, the full-scan sha256 fingerprint, the fact-fact
    # latency join, and the two corpus shingle joins (novelty is the
    # heaviest new text shape) -- first floors this round
    "scd2_point_in_time",
    "brand_segment_chi2",
    "table_checksum",
    "ship_latency",
    "shingle_containment",
    "ngram_novelty",
    # association-rule expansion over baskets and the exact-rational
    # OLS backtest -- first floors this round
    "basket_rules",
    "forecast_backtest",
    # banded global equi-depth histogram -- first floor this round
    "price_equidepth_hist",
    # one-pass exact correlation matrix, fixed-point domain classifier,
    # degree-oriented triangles -- first floors this round
    # (jaccard_prefix_pairs stays out: on THIS generator it is the
    # documented 2.4x-slower twin of jaccard_pairs, not a headline)
    "measure_correlations",
    "domain_classifier",
    "copurchase_triangles",
    # round-8: FIFO layer matching (per-sku windows + interval join),
    # FastSS variant-explode blocking join, the sweep-line concurrency
    # curve, the corpus unigram/bigram lift joins, the all-integer
    # cohort triangle, and the per-brand weighted-median window --
    # first floors this round
    "fifo_allocation",
    "name_edit1_pairs",
    "supplier_backlog_peak",
    "collocation_lift",
    "cohort_matrix",
    "weighted_median_price",
    # round-8 batch 3: periodic LIFO (interval matcher + reflection
    # join) and the two-half ABC drift matrix (banded prefix twice)
    "lifo_allocation",
    "abc_migration",
    # round-9: the per-part price-change window over the full fact, the
    # explode-expanded recognition schedule, three global NTILE sorts
    # over the customer aggregate, the tie-correct Spearman (two
    # aggregate-grain rank maps joined back to lines), the per-order
    # representative + per-customer LEAD transition matrix, the corpus
    # (doc, token) burstiness aggregate, and the Misra-Gries two-pass
    # heavy hitters -- first floors this round
    "price_change_events",
    "revenue_recognition",
    "rfm_segments",
    "brand_spearman",
    "brand_transitions",
    "token_burstiness",
    "heavy_hitter_tokens",
    # round-9 session 2: the n*d*k exact Lloyd scoring join over the
    # embedding table, the explode(sequence)-densified trailing-week
    # WAU, and the corpus shingle DF aggregate -- first floors
    "kmeans_iteration",
    "dau_wau_stickiness",
    "shingle_df_profile",
    # round-10: the heaviest new shapes -- the six-table dual-region
    # join spine, and the iterative BPE trainer (16 vocabulary-sized
    # merge rounds, each with a 1-row argmax) -- first floors
    "cross_region_trade_share",
    "bpe_merges",
    # round-11: the large-star/small-star CC fixpoint over the strong
    # co-purchase graph, and the Arrow-batched JFIF synth + SOF decode
    # boundary -- first floors
    "copurchase_component_sizes",
    "image_dims_jpeg",
    # round-11 session 2: the 6-round fixed-point PageRank loop (now
    # fully oracle-paired) and the winnowing fingerprint match join --
    # first floors
    "pagerank",
    "fingerprint_matches",
    # round-12: the fixed-round H-index loop (up to 24 checkpointed
    # join+window rounds, early-exit at the fixpoint) and the
    # integer-exact PQ/ADC serve path (one cached explode, five
    # consumers, broadcast codebook/table) -- first floors
    "copurchase_kcore_hist",
    "pq_adc_topk",
    "int8_cosine_topk",
    # round-13: the ten rows-only -> paired conversions (pinned hash
    # families / exact-arithmetic sampling / fixed-round unrolls /
    # a recursive-CTE-oracled applyInPandas greedy) -- first floors
    # (minhash_pairs is already a headline above; its r13 portable
    # re-plan gets a FLOOR_NOTE instead of a new slot)
    "weighted_sample",
    "stratified_sample",
    "ann_topk",
    "ivf_topk",
    "mmr_diverse_topk",
    "embed_neardup_lsh",
    "copurchase_kcore",
    "copurchase_communities",
    "alert_throttle",
]


def load_warning_for(load1: float, bar: float = 2.0) -> str | None:
    """SOLO-RUN GUARD (r11 verdict item #2): this box's single-shot
    timings swing 2-3x under co-tenant load, and two rounds running
    recorded floors under load_avg >= 10 poisoned the 2x-regression
    gate (lm_score read 2.36x its floor with the code untouched).
    Returns the annotation for the artifact when the PRE-run 1-min
    load crosses the bar, else None -- annotate, do NOT refuse: the
    per-round driver invocation may land on a busy host, and an empty
    artifact is worse than an annotated one."""
    if load1 < bar:
        return None
    return (
        f"pre-run 1-min load_avg {load1:.2f} >= {bar}: timings are "
        "co-tenant-noise-inflated; re-run solo before recording "
        "floors or judging regressions"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_warning = load_warning_for(os.getloadavg()[0])
    if load_warning:
        print(f"bench: WARNING -- {load_warning}", file=sys.stderr)
    spark = build_session(app_name="bench")
    queries = entry.queries()

    # Per-query block: clear the cache, one warmup run (JVM JIT,
    # whole-stage codegen compilation, parquet footer cache, and the
    # query's OWN persists), then n timed runs. The clearCache between
    # queries is load-bearing: several headline queries persist
    # intermediate frames by design (abc_classification's banded
    # aggregate, stock_asof's daily, winsorized_stats' histogram), and
    # under the old round-robin sweep those caches ACCUMULATED across
    # all ~33 queries -- memory pressure + eviction churn inflated
    # mid-list queries by >2x (events_sessionize measured 1.03s
    # interleaved vs 0.46s isolated, identical plan). Isolation keeps
    # each query's number a property of its plan, not its neighbors.
    # Warmup is recorded separately -- cold-start cost is real
    # information, it just must not pollute the steady-state numbers.
    # clamp: 0/negative would leave empty sample lists and min() raises
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # untimed JVM warm: the per-query warmup below compiles each
    # query's own codegen, but the FIRST blocks in the list would
    # otherwise also absorb one-time JVM/JIT/shuffle-infra warmup
    # (measured: reconcile 1.5s as the cold first block vs 0.77s
    # warm). A couple of representative plans (join+agg, window,
    # text HOFs) warm the shared machinery once, off the clock.
    for name in BENCH_QUERIES[:3]:
        queries[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    warmup: dict[str, float] = {}
    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for name in BENCH_QUERIES:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        warmup[name] = round(time.perf_counter() - t0, 3)
        # timed runs, ALL retained: "queries" reports the best-of (the
        # steady-state capability of the plan, robust to co-tenant
        # load spikes), "runs" reports every sample so a reader can
        # classify a delta vs the previous round as noise (spread
        # overlaps) or regression (spread cleanly shifted)
        for _ in range(n_runs):
            # r15 (r14 verdict item #2, additions-only): clear the
            # cache INSIDE the timed loop too. Spark's CacheManager
            # matches by canonicalized plan, so a query's own persist()
            # from the warmup invocation silently served the timed
            # runs from memory -- flattering exactly the queries whose
            # optimization was "persist the multi-consumer frame"
            # (brand_spearman's 1.73x in r14 was partly this). Every
            # timed run now pays the query's full cost from the
            # parquet inputs; floors recorded before r15 are
            # warm-cache-methodology numbers (BENCH_r14 and older) and
            # are not comparable 1:1 for queries that persist.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            runs[name].append(round(time.perf_counter() - t0, 3))
    timings = {name: min(samples) for name, samples in runs.items()}

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Diagnostics (every sample + the per-query warmups, so a reader
    # can classify round-over-round deltas as noise or regression) go
    # to STDERR: the driver captures only a bounded stdout tail and
    # parses the final JSON line from it -- in r5/r6 the inlined
    # runs/warmup dicts pushed that line past the capture window and
    # the artifact recorded parsed:null. The stdout line stays the
    # compact contract: metric/value/unit/queries/sf.
    print(
        json.dumps({"runs": runs, "warmup": warmup}),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_runs": n_runs,
                # co-tenancy context: 1/5/15-min load averages at finish.
                # this box runs other tenants; a uniformly-elevated round
                # with high load is noise, not regression
                "load_avg": [round(x, 2) for x in os.getloadavg()],
                # non-null iff the PRE-run 1-min load crossed the solo
                # bar -- a floor recorded with this set is inadmissible
                "load_warning": load_warning,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
