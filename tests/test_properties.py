"""Property-based invariants (hypothesis): randomized inputs against
independently-computed Python ground truth."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.graph import (
    connected_components,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sessionize import (
    sessionize,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _union_find_truth(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min of component
    comp = {}
    for n in list(parent):
        root = find(n)
        comp.setdefault(root, []).append(n)
    out = {}
    for members in comp.values():
        lo = min(members)
        for m in members:
            out[m] = lo
    return out


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find_truth(edges)


@SLOW
@given(
    gaps=st.lists(st.integers(1, 120), min_size=1, max_size=30),
)
def test_sessionize_gap_invariants(spark, gaps):
    # build one user's event times from random inter-event gaps (minutes)
    t = dt.datetime(2024, 1, 1)
    times = [t]
    for g in gaps:
        t = t + dt.timedelta(minutes=g)
        times.append(t)
    rows = [(1, i, ts, 1.0) for i, ts in enumerate(times)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    sessions = sorted(
        sessionize(df, gap_minutes=30).collect(), key=lambda r: r.session_start
    )
    # invariant 1: every event accounted for exactly once
    assert sum(s.n_events for s in sessions) == len(times)
    # invariant 2: session count == 1 + number of gaps > 30 min
    assert len(sessions) == 1 + sum(1 for g in gaps if g > 30)
    # invariant 3: consecutive sessions are separated by > gap
    for prev, nxt in zip(sessions, sessions[1:]):
        assert (nxt.session_start - prev.session_end) > dt.timedelta(minutes=30)
