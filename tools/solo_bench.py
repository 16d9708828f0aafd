"""Solo per-query measurement harness (builder-side, guide §1).

Times named queries in isolation -- same session conf as bench.py,
cache cleared between runs, BOTH the bench's count() action and the
noop sink (guide §1.4: noop materializes every column, count can prune)
-- and optionally dumps .explain("formatted") to a file. Not part of
the driver contract; bench.py remains the recorded-floor harness.

Usage:
  python tools/solo_bench.py NAME [NAME...] [--sf DIR] [--runs N]
      [--plan-dir plans/r15] [--plan-suffix before]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default=None)
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    args = ap.parse_args()

    print(f"load_avg pre-run: {os.getloadavg()}", file=sys.stderr)
    spark = build_session(app_name="solo-bench")
    qs = entry.queries()
    for name in args.names:
        fn = qs[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            suffix = f"_{args.plan_suffix}" if args.plan_suffix else ""
            path = os.path.join(args.plan_dir, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"plan -> {path}", file=sys.stderr)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"solo: {name} warmup")
        t0 = time.perf_counter()
        fn(spark, args.sf).count()
        warm = time.perf_counter() - t0
        counts, noops = [], []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"solo: {name} count#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            counts.append(time.perf_counter() - t0)
        if args.noop:
            for i in range(args.runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"solo: {name} noop#{i}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                noops.append(time.perf_counter() - t0)
        msg = (
            f"{name}: warm {warm:.2f}s count min {min(counts):.2f}s "
            f"{[round(x, 2) for x in counts]}"
        )
        if noops:
            msg += f" noop min {min(noops):.2f}s {[round(x, 2) for x in noops]}"
        print(msg)
    spark.stop()


if __name__ == "__main__":
    main()
