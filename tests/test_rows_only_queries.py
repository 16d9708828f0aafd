"""Smoke for queries with no SQL oracle (seeded hash families): they
must run, return stable schemas, and be deterministic across invocations."""

import __spark_entry__ as entry

from conftest import ORACLE_SF


def test_minhash_pairs_runs_and_deterministic(spark):
    q = entry.queries()["minhash_pairs"]
    a = sorted(map(tuple, q(spark, ORACLE_SF).collect()))
    b = sorted(map(tuple, q(spark, ORACLE_SF).collect()))
    assert a == b
    for doc_a, doc_b, j in a:
        assert doc_a < doc_b
        assert 0.0 <= j <= 1.0


def test_ann_topk_runs_and_overlaps_exact(spark):
    qs = entry.queries()
    ann = qs["ann_topk"](spark, ORACLE_SF).collect()
    assert 0 < len(ann) <= 10
    assert ann[0].asDict().keys() == {"vec_id", "dist"}
    # the query vector itself must be its own nearest neighbor
    assert ann[0].vec_id == 0 and ann[0].dist == 0.0
    # ANN should recover a decent chunk of the exact top-10
    exact = {r.vec_id for r in qs["sim_topk"](spark, ORACLE_SF).collect()}
    got = {r.vec_id for r in ann}
    assert len(exact & got) >= 3
