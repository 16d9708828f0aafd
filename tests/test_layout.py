"""Z-order layout (operators/layout.py + the canonical Morton writer
in sources/writers.py): curve math pinned against a pure-python
reference, and the file-pruning claim MEASURED from real parquet
footers rather than asserted."""

from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.layout import (
    file_prune_fraction,
    scale16,
    zvalue16,
)

SF = "/root/testdata/sf0.01"


def _py_spread16(v: int) -> int:
    # the binary-magic-numbers spread ladder -- same math the
    # zorder_curve SQL oracle spells out stage by stage
    x = v & 0xFFFF
    for shift, mask in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
        x = (x | (x << shift)) & mask
    return x


def _py_z(x: int, y: int) -> int:
    return _py_spread16(x) | (_py_spread16(y) << 1)


def test_zvalue_matches_python_reference(spark):
    """zvalue16 (= writers.zorder_key at n=2) must equal the
    independent magic-numbers reference bit for bit, including the
    >16-bit masking contract."""
    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (43690, 21845), (7, 300)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = df.select(
        "x", "y", zvalue16(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_z(r.x, r.y), (r.x, r.y)
    # single-bit inputs: x-bits land at even positions, y-bits at odd
    one_bit = spark.createDataFrame(
        [(1 << b,) for b in range(16)], "v long"
    ).select(
        "v",
        zvalue16(F.col("v"), F.lit(0)).alias("zx"),
        zvalue16(F.lit(0), F.col("v")).alias("zy"),
    )
    for r in one_bit.collect():
        b = r.v.bit_length() - 1
        assert r.zx == 1 << (2 * b)
        assert r.zy == 1 << (2 * b + 1)


def test_scale16_maps_domain_endpoints_and_clamps(spark):
    df = spark.createDataFrame([(1,), (50,), (25,), (-3,), (99,)], "q long")
    got = {
        r.q: r.s
        for r in df.select(
            "q", scale16(F.col("q"), 1, 50).alias("s")
        ).collect()
    }
    assert got[1] == 0
    assert got[50] == 65535
    assert 0 < got[25] < 65535
    assert got[-3] == 0 and got[99] == 65535  # out-of-domain clamps


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The reason the operator exists, measured: a partkey-sorted
    layout prunes files only for partkey predicates (quantity
    predicates touch EVERY file), while the scaled Morton layout
    prunes well on BOTH dimensions, paying a bounded amount of
    partkey sharpness. Thresholds are below measured values (0.69 /
    0.63 / 0.63 at sf0.01, 16 files) with slack for file-boundary
    jitter."""
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        write_zordered,
    )

    pk_max = li.agg(F.max("l_partkey")).first()[0]
    lin, zd = str(tmp_path / "linear"), str(tmp_path / "zord")
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin)
    )
    write_zordered(li, zd, ["l_partkey", "qty"], num_files=16)
    # narrow-dimension predicate: linear layout cannot skip anything
    assert file_prune_fraction(lin, "qty", 1, 6) == 0.0
    assert file_prune_fraction(zd, "qty", 1, 6) >= 0.4
    # wide-dimension predicate: z-order stays useful
    assert file_prune_fraction(lin, "l_partkey", 0, pk_max // 8) >= 0.6
    assert file_prune_fraction(zd, "l_partkey", 0, pk_max // 8) >= 0.4
    # layout changes bytes, never rows
    back = spark.read.parquet(zd)
    assert back.count() == li.count()
    assert (
        back.groupBy().agg(F.sum("qty"), F.sum("l_partkey")).collect()
        == li.groupBy().agg(F.sum("qty"), F.sum("l_partkey")).collect()
    )


def test_zorder_curve_query_is_topk(spark):
    """The query surface stays a bounded TakeOrderedAndProject -- the
    curve key itself never forces a global sort of the table."""
    import contextlib
    import io

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark import (
        queries as Q,
    )

    df = Q.q_zorder_curve(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "TakeOrderedAndProject" in buf.getvalue()
    rows = df.collect()
    assert len(rows) == 100
    assert rows == sorted(
        rows, key=lambda r: (r.zval, r.l_orderkey, r.l_linenumber)
    )


def test_versioned_zorder_compact_rewrites_layout(spark, tmp_path):
    """OPTIMIZE ZORDER BY for the versioned layer: appends land in
    arrival order (no pruning on either dimension beyond luck), one
    zorder-compact publishes a row-identical overwrite version whose
    live files prune on BOTH columns; the pre-compact version stays
    time-travelable."""
    import json
    import os

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        compact,
        history,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "zopt")
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    # 4 appended batches split by a hash -- each batch spans the full
    # (partkey, qty) domain, so every file covers everything
    for i in range(4):
        write_versioned(li.where(F.col("l_partkey") % 4 == i), path)
    before = read_versioned(spark, path).groupBy().agg(
        F.count("*"), F.sum("qty"), F.sum("l_partkey")
    ).collect()

    # 16 files: repartitionByRange SAMPLES its boundaries, so coarse
    # granularities jitter a skip across the threshold run-to-run
    v = compact(spark, path, target_files=16, zorder=("l_partkey", "qty"))
    h = history(path)[-1]
    assert h["version"] == v and h["mode"] == "overwrite"

    live = json.load(
        open(os.path.join(path, "commits", f"v{v:05d}.json"))
    )["files"]
    live_paths = [os.path.join(path, "data", f) for f in live]
    assert file_prune_fraction(live_paths, "qty", 1, 6) >= 0.35
    assert file_prune_fraction(live_paths, "l_partkey", 0, 200) >= 0.35

    after = read_versioned(spark, path).groupBy().agg(
        F.count("*"), F.sum("qty"), F.sum("l_partkey")
    ).collect()
    assert after == before
    # pre-compact snapshot untouched
    assert read_versioned(spark, path, v - 1).count() == after[0][0]


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write DELETE composed with the z-order layout: a
    selective two-sided predicate touches only the files whose z-range
    intersects it, so most live files survive BY NAME into the new
    commit; the change feed between the two versions is exactly the
    deleted rows; old version still time-travelable."""
    import json
    import os

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        compact,
        delete_where,
        read_versioned,
        table_changes,
        write_versioned,
    )

    path = str(tmp_path / "del")
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    write_versioned(li, path)
    v_opt = compact(spark, path, target_files=16, zorder=("l_partkey", "qty"))

    cond = (F.col("qty") <= 3) & (F.col("l_partkey") <= 200)
    n_match = read_versioned(spark, path).where(cond).count()
    assert n_match > 0
    before_files = set(
        json.load(open(os.path.join(path, "commits", f"v{v_opt:05d}.json")))["files"]
    )

    v_new, n_rewritten = delete_where(spark, path, cond)
    after_files = set(
        json.load(open(os.path.join(path, "commits", f"v{v_new:05d}.json")))["files"]
    )
    # the layout makes the predicate touch a strict minority of files,
    # and every untouched file survives by NAME (no pointless rewrite)
    assert 0 < n_rewritten < len(before_files) / 2
    assert len(before_files & after_files) == len(before_files) - n_rewritten

    new = read_versioned(spark, path)
    assert new.where(cond).count() == 0
    assert new.count() == read_versioned(spark, path, v_opt).count() - n_match
    # CDF: exactly the deleted rows, all tagged delete
    diff = table_changes(spark, path, v_opt, v_new)
    assert diff.where(F.col("_change") == "insert").count() == 0
    # content identity diff collapses duplicates; compare distinct sets
    assert (
        diff.where(F.col("_change") == "delete").select("l_partkey", "qty").distinct().count()
        == read_versioned(spark, path, v_opt).where(cond).select("l_partkey", "qty").distinct().count()
    )


def test_delete_where_no_match_is_noop(spark, tmp_path):
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        delete_where,
        latest_version,
        write_versioned,
    )

    path = str(tmp_path / "noop")
    write_versioned(
        spark.range(10).select(F.col("id").alias("v")), path
    )
    v0 = latest_version(path)
    v, n = delete_where(spark, path, F.col("v") > 100)
    assert (v, n) == (v0, 0)
    assert latest_version(path) == v0  # no empty commit published


def test_update_where_rewrites_only_touched_files(spark, tmp_path):
    """Row-level UPDATE through the shared copy-on-write core: matching
    rows get the assignment, non-matching rows in touched files are
    carried through byte-identical, untouched files survive by name."""
    import json
    import os

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        compact,
        read_versioned,
        update_where,
        write_versioned,
    )

    path = str(tmp_path / "upd")
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    write_versioned(li, path)
    v_opt = compact(spark, path, target_files=16, zorder=("l_partkey", "qty"))
    before_files = set(
        json.load(open(os.path.join(path, "commits", f"v{v_opt:05d}.json")))["files"]
    )

    cond = (F.col("qty") <= 2) & (F.col("l_partkey") <= 150)
    n_match = read_versioned(spark, path).where(cond).count()
    assert n_match > 0
    v_new, n_rw = update_where(spark, path, cond, {"qty": F.col("qty") + 1000})
    after_files = set(
        json.load(open(os.path.join(path, "commits", f"v{v_new:05d}.json")))["files"]
    )
    assert 0 < n_rw < len(before_files) / 2
    assert len(before_files & after_files) == len(before_files) - n_rw

    new = read_versioned(spark, path)
    assert new.count() == read_versioned(spark, path, v_opt).count()
    assert new.where(cond).count() == 0  # originals gone...
    assert new.where(F.col("qty") > 1000).count() == n_match  # ...updated
    # history records the mode
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        history,
    )

    assert history(path)[-1]["mode"] == "update"


def test_merge_into_upserts_with_minimal_rewrite(spark, tmp_path):
    """Keyed MERGE: matched keys replaced whole-row, new keys appended,
    untouched files survive by name; duplicate update keys rejected."""
    import json
    import os

    import pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        compact,
        merge_into,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "mrg")
    base = spark.range(1000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7).cast("long").alias("val"),
    )
    write_versioned(base, path)
    v_opt = compact(spark, path, target_files=10, zorder=("k", "val"))
    before_files = set(
        json.load(open(os.path.join(path, "commits", f"v{v_opt:05d}.json")))["files"]
    )

    updates = spark.createDataFrame(
        [(5, 999), (6, 999), (2000, 111), (2001, 222)], "k long, val long"
    )
    v_new, n_rw = merge_into(spark, path, updates, ["k"])
    after_files = set(
        json.load(open(os.path.join(path, "commits", f"v{v_new:05d}.json")))["files"]
    )
    # keys 5 and 6 are adjacent on the z-curve -> few files touched
    assert 0 < n_rw < len(before_files)
    assert len(before_files & after_files) == len(before_files) - n_rw

    new = read_versioned(spark, path)
    assert new.count() == 1002  # 1000 - 2 replaced + 2 replacements + 2 inserts
    got = {r.k: r.val for r in new.where(F.col("k").isin(5, 6, 2000, 2001)).collect()}
    assert got == {5: 999, 6: 999, 2000: 111, 2001: 222}
    # old snapshot unchanged
    assert read_versioned(spark, path, v_opt).where(
        F.col("k") == 5
    ).first().val == 5 % 7

    with pytest.raises(ValueError, match="duplicate"):
        merge_into(
            spark,
            path,
            spark.createDataFrame([(1, 1), (1, 2)], "k long, val long"),
            ["k"],
        )


def test_merge_into_pure_insert_touches_no_files(spark, tmp_path):
    import json
    import os

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        merge_into,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "mrgins")
    write_versioned(
        spark.range(100).select(F.col("id").alias("k"), F.lit(0).alias("val")),
        path,
    )
    v0_files = set(
        json.load(
            open(os.path.join(path, "commits", "v00000.json"))
        )["files"]
    )
    v, n_rw = merge_into(
        spark,
        path,
        spark.createDataFrame([(500, 9)], "k long, val long"),
        ["k"],
    )
    assert n_rw == 0
    after = set(
        json.load(open(os.path.join(path, "commits", f"v{v:05d}.json")))["files"]
    )
    assert v0_files <= after  # every original file kept by name
    assert read_versioned(spark, path).count() == 101


def test_delete_where_keeps_null_predicate_rows(spark):
    """SQL DELETE removes rows only where the condition is TRUE; a row
    where it evaluates to NULL survives. Regression: the survivor
    filter used plain ~cond (NULL on NULL), so a NULL-evaluating row
    co-located in a touched file was silently lost while an identical
    row in an untouched file survived -- survival must never depend on
    file co-location. One file holds all three cases here."""
    import tempfile

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        delete_where,
        read_versioned,
        write_versioned,
    )

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 5)], "k int, x int"
        ).coalesce(1)
        write_versioned(df, path)
        v, n_rw = delete_where(spark, path, F.col("x") > 7)
        assert n_rw == 1  # the single file was touched
        got = {(r.k, r.x) for r in read_versioned(spark, path).collect()}
        assert got == {(2, None), (3, 5)}  # NULL-predicate row survives


def test_update_where_set_evaluates_against_original_row(spark):
    """SQL UPDATE evaluates every SET right-hand side against the
    ORIGINAL row: SET a = b, b = a swaps. Regression: sequential
    withColumn let the second assignment see the first one's result,
    turning the swap into a copy."""
    import tempfile

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (
        read_versioned,
        update_where,
        write_versioned,
    )

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df = spark.createDataFrame(
            [(1, 10, 20), (2, 3, 4)], "k int, a int, b int"
        ).coalesce(1)
        write_versioned(df, path)
        update_where(
            spark,
            path,
            F.col("k") == 1,
            {"a": F.col("b"), "b": F.col("a")},
        )
        got = {(r.k, r.a, r.b) for r in read_versioned(spark, path).collect()}
        assert got == {(1, 20, 10), (2, 3, 4)}  # swapped, not copied


def test_merge_into_refuses_concurrent_append(spark, monkeypatch):
    """MERGE's conflict window is the whole snapshot it read, not just
    its touched files: a racing append may carry keys the merge is
    inserting, so publishing over ANY later commit must refuse -- even
    for a pure-insert merge whose touched set is empty (where the
    touched-files-still-present check is vacuous). Delta raises
    ConcurrentAppendException for exactly this; we inject the race
    between merge's snapshot read and its commit publish."""
    import tempfile

    import pytest as _pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources import (
        versioned,
    )

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        versioned.write_versioned(
            spark.createDataFrame([(1, "a")], "k int, v string"), path
        )

        real = versioned._stage_and_splice

        def racing(path_, touched, rewritten, mode, require_parent=None):
            # the race: another writer appends key 9 AFTER the merge
            # computed its key-match set, BEFORE it publishes
            versioned.write_versioned(
                spark.createDataFrame([(9, "raced")], "k int, v string"),
                path_,
            )
            return real(path_, touched, rewritten, mode, require_parent)

        monkeypatch.setattr(versioned, "_stage_and_splice", racing)
        updates = spark.createDataFrame([(9, "mine")], "k int, v string")
        with _pytest.raises(RuntimeError, match="concurrent modification"):
            versioned.merge_into(spark, path, updates, ["k"])
        # the raced append's row is intact; the merge published nothing
        got = {
            (r.k, r.v)
            for r in versioned.read_versioned(spark, path).collect()
        }
        assert got == {(1, "a"), (9, "raced")}
        # and the refused merge cleaned up its staged output: every
        # data file on disk is referenced by some commit (no orphans
        # waiting for vacuum)
        import glob as _glob
        import json as _json
        import os as _os

        referenced = set()
        for cp in sorted(_glob.glob(f"{path}/commits/v*.json")):
            with open(cp) as fh:
                referenced.update(_json.load(fh)["files"])
        on_disk = {
            _os.path.basename(f) for f in _glob.glob(f"{path}/data/*.parquet")
        }
        assert on_disk == referenced


def test_scale16_survives_huge_span(spark):
    """A span above ~1.4e14 wraps the *65535 multiply in long
    arithmetic (non-ANSI), silently scrambling the z-key; the scaling
    now runs in DECIMAL(38,0), so buckets stay exact at any int64
    span."""
    lo, hi = 0, 10**15
    vals = [0, 10**15, 5 * 10**14, 3, hi - 1]
    df = spark.createDataFrame([(v,) for v in vals], "q long")
    got = {
        r.q: r.s
        for r in df.select("q", scale16(F.col("q"), lo, hi).alias("s")).collect()
    }
    for v in vals:
        assert got[v] == (v - lo) * 65535 // (hi - lo), v
    assert got[0] == 0 and got[10**15] == 65535


def test_check_constraints_gate_every_write_path(spark, tmp_path):
    """ALTER TABLE ADD CHECK: existing-data validation, enforcement on
    append AND row-level UPDATE, NULL-passes semantics, clean refusal
    (no new version, no orphan data files), drop re-opens the gate,
    time travel unaffected."""
    import glob as g
    import os

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (  # noqa: E501
        CheckViolation,
        add_check,
        drop_check,
        history,
        latest_version,
        read_versioned,
        table_checks,
        update_where,
        write_versioned,
    )
    import pyspark.sql.functions as F
    import pytest

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "id long, qty int"
    )
    v0 = write_versioned(df, path)

    # refuse a constraint the existing data violates
    with pytest.raises(CheckViolation) as e:
        add_check(spark, path, "qty_big", "qty > 15")
    assert e.value.counts == {"qty_big": 1}  # only id=1; NULL passes

    v1 = add_check(spark, path, "qty_pos", "qty > 0")
    assert table_checks(path) == {"qty_pos": "qty > 0"}
    assert history(path)[-1]["mode"] == "set_check"

    # violating append: refused, version unchanged, no orphan files
    files_before = set(g.glob(os.path.join(path, "data", "*.parquet")))
    bad = spark.createDataFrame([(4, -5), (5, 7)], "id long, qty int")
    with pytest.raises(CheckViolation) as e:
        write_versioned(bad, path)
    assert e.value.counts == {"qty_pos": 1}
    assert latest_version(path) == v1
    assert set(g.glob(os.path.join(path, "data", "*.parquet"))) == files_before

    # NULL evaluates unknown -> passes (SQL CHECK semantics)
    ok = spark.createDataFrame([(6, None)], "id long, qty int")
    v2 = write_versioned(ok, path)
    assert latest_version(path) == v2

    # DML goes through the same gate: an UPDATE that would set qty <= 0
    with pytest.raises(CheckViolation):
        update_where(
            spark, path, F.col("id") == 2, {"qty": F.lit(-1)}
        )
    assert latest_version(path) == v2
    # files still consistent: snapshot readable, count intact
    assert read_versioned(spark, path).count() == 4

    # constraints are inherited by ordinary commits
    assert table_checks(path) == {"qty_pos": "qty > 0"}

    # drop re-opens the gate; unknown name fails loudly
    with pytest.raises(ValueError):
        drop_check(path, "nope")
    drop_check(path, "qty_pos")
    v3 = write_versioned(bad, path)
    assert read_versioned(spark, path).count() == 6

    # time travel to the pre-constraint version still works
    assert read_versioned(spark, path, version=v0).count() == 3
    assert latest_version(path) == v3


def test_check_constraints_gate_merge_into(spark, tmp_path):
    """MERGE goes through the same CHECK gate: an upsert whose inserts
    violate the constraint is refused with no new version; a clean
    merge passes and inherits the constraint."""
    import pytest
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (  # noqa: E501
        CheckViolation,
        add_check,
        latest_version,
        merge_into,
        table_checks,
        write_versioned,
    )

    path = str(tmp_path / "m")
    base = spark.createDataFrame([(1, 10), (2, 20)], "id long, qty int")
    write_versioned(base, path)
    add_check(spark, path, "qty_pos", "qty > 0")
    v = latest_version(path)

    bad = spark.createDataFrame([(3, -1)], "id long, qty int")
    with pytest.raises((CheckViolation, RuntimeError)):
        merge_into(spark, path, bad, keys=["id"])
    assert latest_version(path) == v

    ok = spark.createDataFrame([(2, 25), (3, 30)], "id long, qty int")
    merge_into(spark, path, ok, keys=["id"])
    assert latest_version(path) > v
    assert table_checks(path) == {"qty_pos": "qty > 0"}


def test_scale16_degenerate_domain_raises(spark):
    """hi <= lo would make the span divisor zero: decimal ``div`` by
    zero is non-ANSI NULL, which would silently NULL the z-key for
    every row -- the operator refuses the domain instead."""
    import pytest

    for lo, hi in [(5, 5), (7, 3)]:
        with pytest.raises(ValueError, match="degenerate domain"):
            scale16(F.col("q"), lo, hi)


def test_drop_check_on_empty_table_raises_cleanly(tmp_path):
    """DROP CONSTRAINT on a table with no commits must be a descriptive
    ValueError, not a FileNotFoundError for 'v-0001.json' (the same
    guard add_check has)."""
    import os

    import pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (  # noqa: E501
        drop_check,
    )

    path = str(tmp_path / "empty")
    os.makedirs(os.path.join(path, "commits"))
    with pytest.raises(ValueError, match="empty table"):
        drop_check(path, "anything")


def test_rejected_write_validates_staged_bytes_and_cleans_staging(
    spark, tmp_path
):
    """The CHECK gate runs on the STAGED parquet (the bytes a commit
    would reference), not on a pre-staging evaluation of the writer's
    plan -- and a refusal removes the staging directory entirely."""
    import glob as g
    import os

    import pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (  # noqa: E501
        CheckViolation,
        add_check,
        latest_version,
        write_versioned,
    )

    path = str(tmp_path / "t")
    write_versioned(
        spark.createDataFrame([(1, 10)], "id long, qty int"), path
    )
    add_check(spark, path, "qty_pos", "qty > 0")
    v = latest_version(path)
    files_before = set(g.glob(os.path.join(path, "data", "*.parquet")))

    bad = spark.createDataFrame([(2, -1)], "id long, qty int")
    with pytest.raises(CheckViolation) as e:
        write_versioned(bad, path)
    assert e.value.counts == {"qty_pos": 1}
    assert latest_version(path) == v
    # no staging leftovers and no unreferenced data files
    assert g.glob(os.path.join(path, "_staging-*")) == []
    assert set(g.glob(os.path.join(path, "data", "*.parquet"))) == files_before

    # a plan Spark marks non-deterministic still publishes correct
    # bytes: validation sees what was staged, not a re-evaluation
    import pyspark.sql.functions as F

    nd = (
        spark.range(3)
        .select(
            F.col("id"),
            (F.floor(F.rand(seed=7) * 5) + 1).cast("int").alias("qty"),
        )
    )
    write_versioned(nd, path)
    assert latest_version(path) == v + 1


def test_restore_version_rolls_back_metadata_only(spark, tmp_path):
    """RESTORE publishes a NEW commit with the old version's files and
    checks: content equals the restored snapshot, history is preserved
    (intermediate versions stay time-travel readable), no data files
    are moved or copied, restoring the head is a no-op, and vacuum
    after restore keeps the revived files."""
    import glob as g
    import os

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.versioned import (  # noqa: E501
        add_check,
        history,
        latest_version,
        read_versioned,
        restore_version,
        table_checks,
        vacuum,
        write_versioned,
    )
    import pytest

    path = str(tmp_path / "t")
    v0 = write_versioned(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, qty int"), path
    )
    v1 = add_check(spark, path, "qty_pos", "qty > 0")
    v2 = write_versioned(
        spark.createDataFrame([(9, 90)], "id long, qty int"),
        path,
        mode="overwrite",
    )
    files_before = set(g.glob(os.path.join(path, "data", "*.parquet")))

    v3 = restore_version(path, v0)
    assert v3 == v2 + 1
    # content == v0, history intact, no file churn
    assert sorted(
        (r.id, r.qty) for r in read_versioned(spark, path).collect()
    ) == [(1, 10), (2, 20)]
    assert read_versioned(spark, path, version=v2).count() == 1
    assert set(g.glob(os.path.join(path, "data", "*.parquet"))) == files_before
    h = history(path)
    assert h[-1]["mode"] == "restore" and len(h) == 4
    # v0 predates the constraint -> the restored head carries v0's
    # (empty) check set
    assert table_checks(path) == {}

    # restoring to v1 brings the constraint back
    v4 = restore_version(path, v1)
    assert table_checks(path) == {"qty_pos": "qty > 0"}
    assert restore_version(path, v4) == v4  # head restore is a no-op

    with pytest.raises(ValueError, match="no version"):
        restore_version(path, 99)

    # vacuum keeps the revived (head-referenced) files
    vacuum(path, keep_versions=1)
    assert sorted(
        (r.id, r.qty) for r in read_versioned(spark, path).collect()
    ) == [(1, 10), (2, 20)]
