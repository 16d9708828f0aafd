"""Round-11 additions: group-aware leakage-safe split invariants and
the copurchase graph projections' semantics (value parity is pinned
bit-exactly by tools/strict_parity.py; these tests pin the properties
the hash compare cannot express)."""

from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import (
    fixtures,
)

from conftest import TESTDATA


def test_leakage_safe_split_no_group_straddles(spark):
    """The defining property: every near-dup group lands WHOLLY inside
    one split -- recompute the per-doc assignment the query aggregates
    and assert each canonical id maps to exactly one split."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        shingle_jaccard_pairs,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        dedup_groups,
    )

    docs = fixtures.load(spark, TESTDATA, "documents")
    groups = dedup_groups(
        shingle_jaccard_pairs(fixtures.fan_out(docs), n=3, threshold=0.5)
    )
    j = docs.select("doc_id").join(groups, "doc_id", "left")
    canon = F.coalesce(F.col("canonical_id"), F.col("doc_id"))
    bucket = (
        F.conv(F.substring(F.md5(canon.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_doc = j.select(canon.alias("canon"), split.alias("split"))
    straddlers = (
        per_doc.groupBy("canon")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # and the groups are non-trivial at this SF, so the property is
    # actually exercised (some multi-doc group exists)
    assert groups.where(F.col("group_size") >= 2).count() > 0


def test_leakage_safe_split_vs_naive_split_leaks(spark):
    """The motivating contrast: the per-doc hash split DOES straddle
    near-dup groups on this corpus (otherwise the group-aware variant
    would be an empty gesture)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        shingle_jaccard_pairs,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (  # noqa: E501
        dedup_groups,
    )

    docs = fixtures.load(spark, TESTDATA, "documents")
    groups = dedup_groups(
        shingle_jaccard_pairs(fixtures.fan_out(docs), n=3, threshold=0.5)
    )
    naive_bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    naive_split = F.when(naive_bucket < 8, "train").otherwise("heldout")
    straddlers = (
        groups.select("canonical_id", naive_split.alias("split"))
        .groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddlers > 0


def test_copurchase_component_sizes_matches_operator_grouping(spark):
    """The histogram must be consistent with the underlying CC
    labeling: total docs across the histogram == nodes labeled, and
    every component size >= 2 (an edge list can produce no singleton
    components except via self-loops, which the >= 3-order threshold
    graph here does not contain)."""
    import __spark_entry__ as entry

    rows = entry.queries()["copurchase_component_sizes"](spark, TESTDATA).collect()
    assert rows, "no components at test SF"
    assert all(r.comp_size >= 2 for r in rows)
    assert sum(r.comp_size * r.n_components for r in rows) > 0


# --- winnowing (MOSS) fingerprints --------------------------------------


def _winnow_twin(toks, k=4, w=4):
    """Pure-Python arbitrary-precision mirror of
    ``operators.dedup.winnow_fingerprints`` for ONE token list:
    md5 hex-fold gram hashes, w-window minima, leftmost tie-break,
    order-preserving distinct positions. Returns {(pos_1based, fp)}."""
    import hashlib

    t = k + w - 1
    if len(toks) < t:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    sel = []
    for j in range(len(hs) - w + 1):
        wnd = hs[j : j + w]
        p = j + wnd.index(min(wnd))  # leftmost minimum
        if p + 1 not in sel:
            sel.append(p + 1)
    return {(p, hs[p - 1]) for p in sel}


def test_winnow_exact_vs_python_twin(spark):
    """Integer-for-integer equivalence of the Spark operator against
    the pure-Python twin on crafted shapes: all-equal hashes (leftmost
    tie-break exercised in every window), a too-short doc (emits
    nothing), and ordinary mixed text."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        winnow_fingerprints,
    )

    corpora = {
        0: "x x x x x x x x x x".split(),  # every gram identical
        1: "too short for any".split(),  # < k+w-1 tokens
        2: ("the quick brown fox jumps over the lazy dog the quick "
            "brown fox sat").split(),
        3: [f"tok{i % 5}" for i in range(23)],
    }
    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in corpora.items()],
        "doc_id long, text string",
    )
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {i: _winnow_twin(ts) for i, ts in corpora.items() if _winnow_twin(ts)}
    assert got == want
    assert 1 not in got  # short doc excluded


def test_winnow_guarantee_property():
    """The Schleimer et al. guarantee, hypothesis-driven on the twin:
    any shared run of >= t = k+w-1 tokens between two documents yields
    at least one shared fingerprint VALUE (a full window lies inside
    the shared gram run; both sides select its minimum)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.text(alphabet="abcd", min_size=1, max_size=3)
    toklist = st.lists(tok, min_size=0, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(
        shared=st.lists(tok, min_size=7, max_size=15),
        pre_a=toklist,
        post_a=toklist,
        pre_b=toklist,
        post_b=toklist,
    )
    def check(shared, pre_a, post_a, pre_b, post_b):
        fa = {fp for _, fp in _winnow_twin(pre_a + shared + post_a)}
        fb = {fp for _, fp in _winnow_twin(pre_b + shared + post_b)}
        assert fa & fb

    check()


def test_fingerprint_matches_shape(spark):
    """Output contract on the real corpus: ordered keys, threshold
    respected, overlap in (0, 1], and the corpus's exact duplicates
    (which share every fingerprint) surface with overlap 1.0."""
    import __spark_entry__ as entry

    rows = entry.queries()["fingerprint_matches"](spark, TESTDATA).collect()
    assert rows, "sf0.01 corpus has near-dups; matches must be non-empty"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.n_shared >= 2
        assert 0.0 < r.overlap <= 1.0
    assert any(r.overlap == 1.0 for r in rows)


def test_winnow_randomized_corpus_vs_twin(spark):
    """One Spark pass over a seeded random corpus (varied lengths,
    small alphabet so ties and repeats are dense) must equal the
    pure-Python twin doc-for-doc -- the randomized complement to the
    crafted shapes above."""
    import random

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.dedup import (  # noqa: E501
        winnow_fingerprints,
    )

    rng = random.Random(1137)
    vocab = [f"w{i}" for i in range(9)]
    corpora = {
        i: [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
        for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in corpora.items()],
        "doc_id long, text string",
    )
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {
        i: _winnow_twin(ts)
        for i, ts in corpora.items()
        if _winnow_twin(ts)
    }
    assert got == want
