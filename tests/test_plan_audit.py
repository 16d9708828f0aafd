"""plans.audit: the guard-test idiom as an importable surface --
audit_plan facts checked against known plans, lint_plan red/green on
the house rules."""

import pytest

import __spark_entry__ as entry
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans.audit import (
    PlanLintError,
    audit_plan,
    lint_plan,
)

from conftest import TESTDATA


def test_audit_facts_on_reconcile(spark):
    """The flagship plan's audited facts must match what the regex
    guards assert: a broadcast dim, exactly one lineitem scan with a
    pruned column set, no cartesian, no Python."""
    df = entry.queries()["reconcile"](spark, TESTDATA)
    a = audit_plan(df)
    assert a.n_broadcasts >= 1
    li_scans = [s for s in a.scans if "lineitem" in s["location"]]
    assert len(li_scans) == 1
    assert a.scan_columns("lineitem") <= {
        "l_partkey", "l_quantity", "l_shipdate"
    }
    assert not a.has_cartesian
    assert a.python_stages == []
    # codegen annotations only exist once THIS df's own execution is
    # AQE-finalized (collect -- count() plans a different tree)
    df.collect()
    assert audit_plan(df).n_codegen_spans >= 1


def test_audit_sees_window_specs(spark):
    """value_anomalies: the audit must expose the day-segmented window
    partition specs the plan guard checks by regex."""
    df = entry.queries()["value_anomalies"](spark, TESTDATA)
    a = audit_plan(df)
    specs = {
        tuple(w["partition_by"]): w["order_by"] for w in a.window_specs
    }
    # intra-day cumulative: partitioned by (type, day), raw row order
    assert ("event_type", "day") in specs
    # day-prefix merge: bare type partition but ordered by the rolled-up
    # grain only -- the single-order-column shape the lint permits
    assert specs.get(("event_type",)) == ["day"]


def test_lint_green_on_house_compliant_plans(spark):
    for name in ("reconcile", "value_anomalies", "stock_asof", "lm_score"):
        lint_plan(
            entry.queries()[name](spark, TESTDATA),
            low_cardinality_keys={"event_type"},
        )


def test_lint_flags_low_cardinality_running_window(spark):
    """The exact shape value_anomalies was rewritten from: cumulative
    window over the raw stream partitioned by the bare low-card key."""
    from pyspark.sql import Window, functions as F

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    bad = ev.withColumn("rn", F.row_number().over(w))
    with pytest.raises(PlanLintError, match="low-cardinality"):
        lint_plan(bad, low_cardinality_keys={"event_type"})
    # same window over a HIGH-cardinality key: healthy, not listed, green
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lint_plan(
        ev.withColumn("rn", F.row_number().over(w2)),
        low_cardinality_keys={"event_type"},
    )


def test_lint_flags_nested_loop_and_python(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    # a broadcastable cross join compiles to BroadcastNestedLoopJoin
    # (CartesianProduct needs both sides un-broadcastable); the
    # default-off NLJ rule exists for exactly this opt-in audit
    with pytest.raises(PlanLintError, match="NestedLoop"):
        lint_plan(a.crossJoin(b), forbid_nested_loop=True)
    lint_plan(a.crossJoin(b))  # house default tolerates broadcast NLJ

    plus_one = F.udf(lambda x: x + 1, LongType())
    with pytest.raises(PlanLintError, match="Python"):
        lint_plan(a.select(plus_one("id").alias("y")))


def test_lint_exchange_budget(spark):
    df = entry.queries()["stage_sales"](spark, TESTDATA)
    with pytest.raises(PlanLintError, match="exchanges"):
        lint_plan(df, max_exchanges=0)
    lint_plan(df, max_exchanges=8)
