"""Pins the hand-built versioned fixture to the REAL write path.

``fixtures.ensure_versioned_fixture`` lays out data files and commit
JSONs directly (deterministic names, so the DuckDB oracle can address
v1's files without consulting the commit log). That hand layout must
never drift from what ``sources.versioned.write_versioned`` would
produce for the same three operations -- this test replays those
operations through the real writer and asserts every version's
snapshot is row-identical, and that the commit metadata (parent, mode,
file count) matches.
"""

from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans.fixtures import (
    ensure_versioned_fixture,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
    history,
    read_versioned,
    table_changes,
    write_versioned,
)


def _rows(df):
    return sorted((r.sku, r.qty) for r in df.select("sku", "qty").collect())


def _replay(spark, path):
    def mk(skus, qtys):
        return spark.createDataFrame(
            [(s, q) for s, q in zip(skus, qtys)], "sku string, qty int"
        ).coalesce(1).select("sku", F.col("qty").cast("int"))

    assert write_versioned(mk(["A", "B", "C"], [10, 20, 30]), path) == 0
    assert write_versioned(mk(["B", "D"], [21, 40]), path) == 1
    assert write_versioned(mk(["A", "E"], [99, 50]), path, "overwrite") == 2
    return path


def test_fixture_matches_real_writer_snapshots(spark, tmp_path):
    fix = ensure_versioned_fixture()
    real = _replay(spark, str(tmp_path / "replayed"))
    for v in (0, 1, 2):
        assert _rows(read_versioned(spark, fix, v)) == _rows(
            read_versioned(spark, real, v)
        ), f"fixture snapshot v{v} drifted from write_versioned output"


def test_fixture_commit_metadata_matches_real_writer(spark, tmp_path):
    fix = ensure_versioned_fixture()
    real = _replay(spark, str(tmp_path / "replayed"))
    keys = ("version", "parent", "mode", "n_files")
    assert [
        {k: c[k] for k in keys} for c in history(fix)
    ] == [{k: c[k] for k in keys} for c in history(real)]


def test_fixture_cdf_is_full_replacement(spark):
    """v2 overwrote everything: the 1->2 feed must delete all 5 v1 rows
    and insert both v2 rows -- the exact rows the oracle hard-codes."""
    fix = ensure_versioned_fixture()
    feed = table_changes(spark, fix, 1, 2)
    got = sorted((r.sku, r.qty, r._change) for r in feed.collect())
    assert got == [
        ("A", 10, "delete"),
        ("A", 99, "insert"),
        ("B", 20, "delete"),
        ("B", 21, "delete"),
        ("C", 30, "delete"),
        ("D", 40, "delete"),
        ("E", 50, "insert"),
    ]
