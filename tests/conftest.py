import datetime as dt
import math
import os

import duckdb
import pytest

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.session import (
    build_session,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", TESTDATA)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="engine-tests", shuffle_partitions=8)
    yield spark


def raw_nanos_events(spark):
    """events with ts as epoch-NANOS BIGINT, whatever the on-disk layout.

    The streaming tests slice by numeric ts and re-stage micro-batch
    files; writing them in the nanos-long layout keeps their epoch
    arithmetic (quantile splits, drain-sentinel deadlines) valid under
    both testdata layouts the driver has shipped (TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) -> timestamp_ntz)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    if dict(ev.dtypes)["ts"] != "bigint":
        ev = ev.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
        )
    return ev


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{ORACLE_SF}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalized_rows(cols, rows):
    """Order-insensitive, column-name-sorted row multiset (mirrors the
    driver's compare: sort columns by name, hash values)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(repr(x) for x in t))


def compare_query(spark, duck, qfn, sql, sf_dir):
    # several plans persist() intermediates by design, and a returned
    # DataFrame cannot unpersist what its own construction cached;
    # without this, the full parametrized parity sweep accumulates
    # every such frame in ONE session (correct under MEMORY_AND_DISK
    # eviction, but disk spill grows across ~425 queries -- the r11
    # ADVICE item). clearCache per compare is the harness-side
    # contract the plan docstrings rely on; bench.py and
    # tools/strict_parity.py apply the same isolation.
    spark.catalog.clearCache()
    sdf = qfn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count differs: {len(srows)} vs {len(drows)}"
    sn = normalized_rows(scols, [[r[c] for c in scols] for r in srows])
    dn = normalized_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[:3]}"
