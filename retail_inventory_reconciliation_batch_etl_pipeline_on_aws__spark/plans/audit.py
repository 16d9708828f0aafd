"""Plan audit: programmatic physical-plan introspection + linting.

The engine's scale discipline ("explain and iterate until it's the plan
you'd want") lives in two dozen regex guard tests; this module makes the
same checks a first-class, importable surface so a PIPELINE can enforce
them at build time -- ``lint_plan(df, forbid=...)`` in a CI step or
right before a 1000-executor submit, not only in this repo's tests.

Everything is derived from ``df.explain("formatted")`` -- the one plan
representation that is stable across local/cluster mode and needs no
JVM internals. The audit is a READ: it triggers planning (cheap) but no
execution.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: Python-boundary operators, worst first: BatchEvalPython is
#: row-at-a-time pickling; Arrow stages are batched and acceptable
#: where a built-in genuinely cannot express the op.
PYTHON_STAGES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


@dataclass
class PlanAudit:
    """Structured facts about one physical plan."""

    n_exchanges: int
    n_broadcasts: int
    scans: list[dict]  # {"location": str, "pushed_filters": str, "read_columns": [str]}
    window_specs: list[dict]  # {"partition_by": [str], "order_by": [str]}
    has_cartesian: bool
    has_nested_loop: bool
    python_stages: list[str]
    #: best-effort: Spark only annotates "[codegen id : N]" on a plan
    #: that has EXECUTED (AQE final plan); pre-execution audits see 0
    n_codegen_spans: int
    formatted: str = field(repr=False, default="")

    def scan_columns(self, table_substr: str) -> set[str]:
        """Union of columns read from scans whose path contains
        ``table_substr`` -- the column-pruning contract."""
        out: set[str] = set()
        for s in self.scans:
            if table_substr in s["location"]:
                out |= set(s["read_columns"])
        return out


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_plan(df: DataFrame) -> PlanAudit:
    """Parse ``explain("formatted")`` into checkable facts."""
    p = _formatted_plan(df)
    scans = []
    # formatted mode lists one "(n) Scan parquet" block per source with
    # Location / PushedFilters / ReadSchema lines
    for block in re.split(r"\n\n", p):
        block = block.strip()
        if not re.match(r"\(\d+\) Scan ", block):
            continue
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        # top-level field names only: a name is a word right after the
        # struct opening or a comma AND followed by ':' -- parenthesized
        # type params like decimal(18,2) never match (no trailing colon)
        cols = (
            re.findall(r"(?:^|,)(\w+):", schema.group(1)) if schema else []
        )
        scans.append(
            {
                "location": loc.group(1) if loc else "",
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_columns": cols,
            }
        )
    window_specs = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
        args = [a.strip() for a in m.group(1).split(",")]
        part = [a for a in args if re.fullmatch(r"\w+#\d+L?", a)]
        order = [a for a in args if " ASC" in a or " DESC" in a]
        window_specs.append(
            {
                "partition_by": [a.split("#")[0] for a in part],
                "order_by": [a.split("#")[0].split(" ")[0] for a in order],
            }
        )
    return PlanAudit(
        n_exchanges=len(re.findall(r"\(\d+\) Exchange\b", p)),
        n_broadcasts=len(re.findall(r"\(\d+\) BroadcastExchange\b", p)),
        scans=scans,
        window_specs=window_specs,
        has_cartesian="CartesianProduct" in p,
        has_nested_loop="BroadcastNestedLoopJoin" in p,
        python_stages=[s for s in PYTHON_STAGES if s in p],
        n_codegen_spans=len(set(re.findall(r"codegen id : (\d+)", p))),
        formatted=p,
    )


def hinted_keyed_agg_broadcasts(df: DataFrame) -> list[list[str]]:
    """Grouping-key lists of KEYED aggregates that sit under an
    EXPLICIT broadcast hint -- the "forced broadcast of an unbounded
    per-key aggregate" shape (cardinality = |key domain|, which a 100x
    data scale-up grows right past executor memory; a mandatory
    ``F.broadcast`` hint overrides Spark's size check, so the OOM is
    guaranteed rather than avoided). A GLOBAL aggregate under a hint
    (``Aggregate [], ...``: the 1-row scalar-gate idiom) is NOT
    flagged, and neither is a broadcast Spark CHOSE by size estimate
    (AQE re-checks those at runtime; the rule is about hints that
    bypass the check) -- which is why this parses the OPTIMIZED
    LOGICAL plan, where ``leftHint=/rightHint=(strategy=broadcast)``
    is explicit, not the physical plan, where hinted and
    size-estimated BroadcastExchanges are indistinguishable.
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    nodes: list[tuple[int, str]] = []  # (depth, text)
    for line in plan.splitlines():
        m = re.match(r"^((?::  |:- |\+- |   )*)(.*)$", line)
        if not m or not m.group(2).strip():
            continue
        nodes.append((len(m.group(1)) // 3, m.group(2)))

    def child_spans(i: int) -> list[tuple[int, int]]:
        """[start, end) index ranges of node i's direct children."""
        d = nodes[i][0]
        spans, start = [], None
        for j in range(i + 1, len(nodes)):
            dj = nodes[j][0]
            if dj <= d:
                break
            if dj == d + 1:
                if start is not None:
                    spans.append((start, j))
                start = j
        if start is not None:
            end = next(
                (j for j in range(start + 1, len(nodes)) if nodes[j][0] <= d),
                len(nodes),
            )
            spans.append((start, end))
        return spans

    out: list[list[str]] = []
    for i, (_d, text) in enumerate(nodes):
        if not text.startswith("Join "):
            continue
        hinted = [
            side
            for side in ("left", "right")
            if re.search(rf"{side}Hint=\([^)]*strategy=broadcast", text)
        ]
        if not hinted:
            continue
        spans = child_spans(i)
        if len(spans) != 2:
            continue
        for side in hinted:
            lo, hi = spans[0 if side == "left" else 1]
            for _dd, sub in nodes[lo:hi]:
                # keyed render: "Aggregate [keys], [exprs]"; a GLOBAL
                # aggregate prints ONE bracket ("Aggregate [exprs]")
                # and must not match
                m = re.match(r"Aggregate \[([^\]]*)\], \[", sub)
                if m and m.group(1).strip():
                    out.append(
                        [k.split("#")[0].strip() for k in m.group(1).split(",")]
                    )
    return out


class PlanLintError(AssertionError):
    """A plan violated a lint rule; message lists every violation."""


def lint_plan(
    df: DataFrame,
    forbid_cartesian: bool = True,
    forbid_nested_loop: bool = False,
    forbid_python: bool = True,
    allow_arrow_python: bool = True,
    max_exchanges: int | None = None,
    low_cardinality_keys: set[str] | None = None,
    forbid_keyed_agg_broadcast: bool = False,
    bounded_broadcast_keys: set[str] | None = None,
) -> PlanAudit:
    """Raise ``PlanLintError`` when the plan carries a known
    scale-killer; return the audit when clean.

    Defaults encode this repo's house rules: no cartesian products and
    no row-at-a-time Python (Arrow-batched stages allowed).

    ``low_cardinality_keys`` is the caller's domain knowledge a static
    lint cannot infer: window PARTITION BY columns that have few
    distinct values (event_type, region, ...). A running window
    partitioned ONLY by such keys and ordered by MULTIPLE columns is
    flagged -- multi-column ordering (ts + tiebreak) marks raw-row
    granularity, the funnel-everything-into-|key|-tasks shape that
    value_anomalies/Q11/Q15 were rewritten to avoid. Single-column
    ordering over the same keys is permitted: that is the
    prefix-merge-over-an-aggregate idiom (ordered by the rolled-up
    grain, |keys| x |grain| rows). A per-``sku`` or per-``user_id``
    window (high cardinality) is healthy and must NOT be listed.
    Heuristic limits: a raw-row window ordered by a single column with
    no tiebreak passes unflagged -- pair the lint with an output
    determinism check if that matters.
    """
    a = audit_plan(df)
    problems: list[str] = []
    if forbid_cartesian and a.has_cartesian:
        problems.append("CartesianProduct in plan")
    if forbid_nested_loop and a.has_nested_loop:
        problems.append("BroadcastNestedLoopJoin in plan")
    if forbid_python:
        bad = [
            s
            for s in a.python_stages
            if s == "BatchEvalPython"
            or not (allow_arrow_python and s != "BatchEvalPython")
        ]
        if bad:
            problems.append(f"Python boundary: {bad}")
    if max_exchanges is not None and a.n_exchanges > max_exchanges:
        problems.append(f"{a.n_exchanges} exchanges > budget {max_exchanges}")
    if low_cardinality_keys:
        for w in a.window_specs:
            if (
                w["partition_by"]
                and set(w["partition_by"]) <= low_cardinality_keys
                and len(w["order_by"]) >= 2
            ):
                problems.append(
                    f"running window partitioned only by low-cardinality "
                    f"{w['partition_by']} ordered by {w['order_by']} -- "
                    f"|key|-task funnel"
                )
    if forbid_keyed_agg_broadcast:
        # broadcast HINTS belong on provably bounded frames: 1-row
        # scalar gates, band offsets, nlist centroid tables, fixed
        # dims. A hinted broadcast whose subtree aggregates BY KEY
        # ships |key domain| rows to every executor -- fine at test
        # SF, guaranteed OOM after a 100x catalog growth because the
        # hint bypasses Spark's size check. ``bounded_broadcast_keys``
        # is the caller's allow-list of key columns whose domain is a
        # CONSTANT (region, nation, band id), not data-scaled.
        allowed = bounded_broadcast_keys or set()
        for keys in hinted_keyed_agg_broadcasts(df):
            if not set(keys) <= allowed:
                problems.append(
                    f"broadcast HINT over a per-key aggregate keyed by "
                    f"{keys} -- unbounded cardinality; drop the hint (AQE "
                    f"still broadcasts small sides) or allow-list the keys "
                    f"as domain constants"
                )
    if problems:
        raise PlanLintError("; ".join(problems))
    return a
