"""Dump .explain("formatted") for the ITERATIVE operators' round frames.

The iterative queries (kcore family, pagerank, label propagation)
return post-checkpoint frames, so their headline plan dumps are just
`Scan ExistingRDD` -- the physical claims the r14/r15 optimization
rounds make (zero per-round shuffles above the cached adjacency, one
BroadcastExchange + runtime reuse for the twin value reads, the single
per-round hash exchange of the pagerank contribution sum, the LPA
label broadcast + aggregate argmax) live in the ROUND plan the loop
materializes each iteration.  The operators expose those frames
un-checkpointed (`_hindex_step_frame`, `_pagerank_canonical_round`,
`_lpa_round`); this tool builds the REAL sf graphs exactly as the
callers do and dumps each round frame's formatted plan:

    python tools/dump_round_plans.py [--sf DIR] [--out plans/r15]

Shape assertions on the same frames: tests/test_plan_shape.py
(test_hindex_round_moves_no_edge_bytes, ..._pagerank_canonical_round_...,
..._lpa_round_...).  Not part of the driver contract.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E402
    _hindex_init,
    _hindex_step_frame,
    _lpa_round,
    _pagerank_canonical_round,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (  # noqa: E402
    fixtures,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (  # noqa: E402
    _copurchase_pairs_weighted,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.session import (  # noqa: E402
    build_session,
)


def _dump(df, path: str) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"plan -> {path}", file=sys.stderr)


def _kcore_pairs(spark, sf_dir):
    # mirror q_copurchase_kcore's join-free pair mining
    li = fixtures.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pair_arr = F.filter(
        F.flatten(
            F.transform(
                "ps",
                lambda x: F.transform(
                    F.col("ps"),
                    lambda y: F.when(
                        x < y, F.struct(x.alias("pa"), y.alias("pb"))
                    ),
                ),
            )
        ),
        lambda s: s.isNotNull(),
    )
    return grouped.select(F.explode(pair_arr).alias("pr")).select(
        "pr.pa", "pr.pb"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default="plans/r15")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spark = build_session(app_name="dump-round-plans")

    # --- kcore H-index round (q_copurchase_kcore's graph) ---
    adj, vals = _hindex_init(_kcore_pairs(spark, args.sf), "pa", "pb")
    _dump(
        _hindex_step_frame(adj, vals, small=True),
        os.path.join(args.out, "kcore_round_after.txt"),
    )
    adj.unpersist()
    spark.catalog.clearCache()

    # --- pagerank undirected-canonical round (q_pagerank's graph) ---
    li = fixtures.load(spark, args.sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("ps")
    )
    pair_arr = F.filter(
        F.flatten(
            F.transform(
                "ps",
                lambda a: F.transform(
                    F.col("ps"),
                    lambda b: F.when(
                        a < b, F.struct(a.alias("src"), b.alias("dst"))
                    ),
                ),
            )
        ),
        lambda s: s.isNotNull(),
    )
    ec = (
        grouped.select(F.explode(pair_arr).alias("pr"))
        .select("pr.src", "pr.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        ec.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("outdeg"))
    )
    state = deg.select(
        "node", "outdeg", F.lit(10**12).cast("long").alias("rank")
    ).localCheckpoint(eager=True)
    _dump(
        _pagerank_canonical_round(ec, state, "src", "dst", 85, 10**12),
        os.path.join(args.out, "pagerank_round_after.txt"),
    )

    # --- LPA round (q_copurchase_communities' w>=2 graph) ---
    edges = (
        _copurchase_pairs_weighted(spark, args.sf)
        .where(F.col("w") >= 2)
        .select("pa", "pb")
    )
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("pa").alias("src"), F.col("pb").alias("dst")),
                    F.struct(F.col("pb").alias("src"), F.col("pa").alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    _dump(
        _lpa_round(und, labels, True),
        os.path.join(args.out, "lpa_round_after.txt"),
    )
    spark.stop()


if __name__ == "__main__":
    main()
