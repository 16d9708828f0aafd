"""Round-12 additions: the fixed-round H-index operator behind
``copurchase_kcore_hist`` and the integer-exact PQ/ADC serve path
behind ``pq_adc_topk`` (value parity is pinned bit-exactly by
tools/strict_parity.py; these tests pin the properties the hash
compare cannot express -- fixed-round semantics vs an exact Python
model, truncation honesty, and ADC arithmetic vs a from-scratch
recomputation)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from conftest import TESTDATA
from test_graph import _py_coreness


def _py_hindex_rounds(edges, rounds):
    """Exact Python model of ``hindex_rounds``: ``rounds`` synchronous
    applications of the H-operator from the degree table (early exit
    at the fixpoint -- identical by idempotence)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    vals = {n: len(ns) for n, ns in adj.items()}
    for _ in range(rounds):
        nxt = {}
        for n, ns in adj.items():
            nb = sorted((vals[m] for m in ns), reverse=True)
            nxt[n] = max(min(rk + 1, v) for rk, v in enumerate(nb))
        if nxt == vals:
            break
        vals = nxt
    return vals


def test_hindex_rounds_equals_coreness_at_convergence(spark):
    """On a graph whose H-sequence settles within the budget, the
    fixed-round value IS the k-core number (clique 3 / path 1 /
    glued triangle 2)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        hindex_rounds,
    )

    clique = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    path = [(4, 10), (10, 11), (11, 12)]
    tri = [(20, 21), (21, 22), (20, 22), (22, 30)]
    df = spark.createDataFrame(clique + path + tri, "pa long, pb long")
    got = {r.node: r.h for r in hindex_rounds(df, rounds=10).collect()}
    assert got == _py_coreness(clique + path + tri)


def test_hindex_rounds_matches_python_model_random_graphs(spark):
    """Property: at ANY round budget -- including ones too small to
    converge -- the operator equals the exact synchronous Python
    model. This is the fixed-round contract itself: the value is
    defined by the round count, not by convergence."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        hindex_rounds,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=11),
                st.integers(min_value=0, max_value=11),
            ).filter(lambda e: e[0] < e[1]),
            min_size=1,
            max_size=25,
        ),
        st.integers(min_value=1, max_value=4),
    )
    def check(edges, rounds):
        df = spark.createDataFrame(sorted(edges), "pa long, pb long")
        got = {r.node: r.h for r in hindex_rounds(df, rounds=rounds).collect()}
        assert got == _py_hindex_rounds(edges, rounds)

    check()


def test_hindex_rounds_truncates_instead_of_raising(spark):
    """A chain longer than the round budget: ``kcore_numbers`` raises
    (true coreness unreachable), ``hindex_rounds`` returns the
    documented over-estimate -- monotonically >= coreness, exactly the
    2-round model value."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        hindex_rounds,
        kcore_numbers,
    )

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "pa long, pb long")
    with pytest.raises(RuntimeError):
        kcore_numbers(df, max_iters=2)
    got = {r.node: r.h for r in hindex_rounds(df, rounds=2).collect()}
    assert got == _py_hindex_rounds(chain, 2)
    core = _py_coreness(chain)
    assert all(got[n] >= core[n] for n in core)


def test_copurchase_kcore_hist_is_true_coreness_here(spark):
    """At test scale the 24-round budget converges, so the paired
    histogram must equal the convergence-gated fixpoint's histogram --
    the bridge between the fixed-round oracle contract and
    true-coreness semantics (``copurchase_kcore``, paired the same
    way at budget 40 in r13, gets the same bridge below)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        kcore_numbers,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (  # noqa: E501
        _copurchase_pairs_weighted,
    )

    got = {
        r.h_round24: r.n_nodes
        for r in entry.queries()["copurchase_kcore_hist"](
            spark, TESTDATA
        ).collect()
    }
    edges = (
        _copurchase_pairs_weighted(spark, TESTDATA)
        .where(F.col("w") >= 2)
        .select("pa", "pb")
    )
    cores = kcore_numbers(edges).collect()
    want = {}
    for r in cores:
        want[r.coreness] = want.get(r.coreness, 0) + 1
    assert got == want


def test_copurchase_kcore_round40_is_true_coreness_here(spark):
    """Same bridge for the r13-paired UNWEIGHTED entry: the 40-round
    budget covers every probed local horizon (10/19/38), so the
    fixed-round histogram must equal the convergence-gated fixpoint's
    histogram on the same distinct-pair graph."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        kcore_numbers,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (  # noqa: E501
        fixtures,
    )

    got = {
        r.coreness: r.n_nodes
        for r in entry.queries()["copurchase_kcore"](spark, TESTDATA).collect()
    }
    li = fixtures.load(spark, TESTDATA, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )
    cores = kcore_numbers(edges).collect()
    want = {}
    for r in cores:
        want[r.coreness] = want.get(r.coreness, 0) + 1
    assert got == want


def _py_pq_adc(vecs, m=8, sub=8, ksub=16, k=10, query_id=0):
    """From-scratch Python model of the pq_adc_topk plan: quantize at
    1e-4 (round-half-up like both engines on these magnitudes), seed
    codebook from the ksub lowest ids, argmin encode with lowest-code
    ties, ADC table + scan for the pinned query, top-k, exact re-rank.
    All ints -- any drift from the Spark plan is a logic bug, not
    float noise."""
    q = {
        i: [round(float(x) * 10000) for x in v] for i, v in vecs.items()
    }
    seeds = {c: q[c] for c in sorted(q) if c < ksub}
    codes = {}
    for i, v in q.items():
        codes[i] = []
        for j in range(m):
            best = min(
                (
                    sum(
                        (v[j * sub + t] - seeds[c][j * sub + t]) ** 2
                        for t in range(sub)
                    ),
                    c,
                )
                for c in seeds
            )
            codes[i].append(best[1])
    qq = q[query_id]
    tab = {
        (j, c): sum(
            (qq[j * sub + t] - seeds[c][j * sub + t]) ** 2 for t in range(sub)
        )
        for j in range(m)
        for c in seeds
    }
    adc = {i: sum(tab[(j, codes[i][j])] for j in range(m)) for i in q}
    top = sorted(q, key=lambda i: (adc[i], i))[:k]
    return [
        (i, adc[i], sum((q[i][d] - qq[d]) ** 2 for d in range(m * sub)))
        for i in top
    ]


def test_pq_adc_topk_matches_python_model(spark):
    """The full serve path vs the exact Python recomputation on the
    real test embeddings: codes, ADC sums, top-10 membership AND
    order, and the exact re-rank distances."""
    vecs = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{TESTDATA}/embeddings.parquet").collect()
    }
    want = _py_pq_adc(vecs)
    got = [
        (r.vec_id, r.adc_d2, r.exact_d2)
        for r in entry.queries()["pq_adc_topk"](spark, TESTDATA).collect()
    ]
    assert got == want


def test_pq_adc_query_vector_is_its_own_nearest(spark):
    """vec_id 0 is seed 0: its sub-vectors quantize to their own codes,
    so its ADC and exact distances are both exactly 0 and it leads the
    ranking -- the self-consistency floor of the ADC arithmetic."""
    rows = entry.queries()["pq_adc_topk"](spark, TESTDATA).collect()
    assert rows[0].vec_id == 0
    assert rows[0].adc_d2 == 0 and rows[0].exact_d2 == 0


def test_hindex_rounds_selfloop_and_empty_graphs(spark):
    """Degenerate inputs: a self-loop-only graph has no neighbors
    (standard k-core convention, shared with kcore_numbers) so the
    value table is empty; an isolated-pair graph converges in one
    round at h=1."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        hindex_rounds,
    )

    loops = spark.createDataFrame([(1, 1), (2, 2)], "pa long, pb long")
    assert hindex_rounds(loops, rounds=3).count() == 0
    pair = spark.createDataFrame([(1, 2)], "pa long, pb long")
    got = {r.node: r.h for r in hindex_rounds(pair, rounds=3).collect()}
    assert got == {1: 1, 2: 1}


def test_pq_adc_topk_tiny_corpus_partial_codebook(spark, tmp_path):
    """Fewer vectors than ksub=16: the seed codebook is just the
    corpus, every vector's best code is itself (ADC distance = the
    query-table entry of its own code), and the Python model agrees
    exactly -- the boundary the driver never exercises but an
    incremental serve path would."""
    import random

    rng = random.Random(7)
    vecs = {i: [rng.uniform(-0.5, 0.5) for _ in range(64)] for i in range(5)}
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = [
        (r.vec_id, r.adc_d2, r.exact_d2)
        for r in entry.queries()["pq_adc_topk"](spark, str(tmp_path)).collect()
    ]
    # the parquet round-trip casts to float32; model must quantize the
    # same post-cast values
    import struct as _s

    f32 = {
        i: [_s.unpack("f", _s.pack("f", x))[0] for x in v]
        for i, v in vecs.items()
    }
    assert got == _py_pq_adc(f32, k=10)
    assert got[0] == (0, 0, 0)


def _py_int8_cosine(vecs, k=10, query_id=0):
    """Exact Python model of int8_cosine_topk: 1e-4 quantize,
    symmetric per-vector int8 codes (round toward nearest, away from
    zero on .5 -- matching both engines' double rounding on these
    magnitudes), exact integer dot/norms, float cosine last."""
    import math

    q = {i: [round(float(x) * 10000) for x in v] for i, v in vecs.items()}

    def codes(v):
        s = max(abs(x) for x in v)
        if s == 0:
            return [0] * len(v)
        out = []
        for x in v:
            r = x * 127.0 / s
            f = math.floor(r + 0.5) if r >= 0 else math.ceil(r - 0.5)
            out.append(int(f))
        return out

    c = {i: codes(v) for i, v in q.items()}
    d = c[query_id]
    nd = sum(x * x for x in d)
    rows = []
    for i, ci in c.items():
        dot = sum(a * b for a, b in zip(ci, d))
        n = sum(a * a for a in ci)
        rows.append((i, dot, n, dot / math.sqrt(n * nd)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [(i, dot, n, round(s, 6)) for i, dot, n, s in rows[:k]]


def test_int8_cosine_topk_matches_python_model(spark):
    """The int8 serve path vs the exact Python recomputation on the
    real test embeddings: codes, integer dot/norms, ranking, and the
    rounded cosine."""
    vecs = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{TESTDATA}/embeddings.parquet").collect()
    }
    want = _py_int8_cosine(vecs)
    got = [
        (r.vec_id, r.dot_q, r.norm_q, r.score)
        for r in entry.queries()["int8_cosine_topk"](spark, TESTDATA).collect()
    ]
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-9, (g, w)


def test_int8_cosine_query_is_its_own_top1(spark):
    """vec_id 0 scores exactly 1.0 against itself (dot == norm == the
    query norm) -- the self-consistency floor of the int8 arithmetic."""
    rows = entry.queries()["int8_cosine_topk"](spark, TESTDATA).collect()
    assert rows[0].vec_id == 0
    assert rows[0].dot_q == rows[0].norm_q and rows[0].score == 1.0
