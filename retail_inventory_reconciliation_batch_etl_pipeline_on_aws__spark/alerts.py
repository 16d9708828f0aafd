"""Alert sink (SURVEY.md SS2.2 K4; reference glue_job_2_reconcile.py:118-141).

The reference counts discrepancy rows, collects 5 examples, formats a
message, and publishes to SNS via boto3. That is driver-side control
logic, not a distributed operator -- here it is a pluggable protocol
(stdout/list sinks built in; an SNS/webhook adapter slots in without
touching the jobs).

Fixes the reference's triple-recompute flaw (actions at ref :113, :119,
:125 with no cache): callers pass an already-persisted frame, and
``build_alert`` runs the count and the deterministic top-k off that one
materialization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol

from pyspark.sql import DataFrame

from .plans.reconcile import discrepancies, top_discrepancies


@dataclass
class Alert:
    count: int
    examples: list[dict]

    def format(self) -> str:
        lines = [f"[inventory-reconciliation] {self.count} SKUs with discrepancies"]
        for row in self.examples:
            lines.append(
                f"  sku={row.get('sku')} name={row.get('product_name')} "
                f"expected={row.get('expected_closing_stock')} "
                f"actual={row.get('actual_closing_stock')} "
                f"discrepancy={row.get('discrepancy_amount')}"
            )
        return "\n".join(lines)


class AlertSink(Protocol):
    def publish(self, alert: Alert) -> None: ...


class StdoutSink:
    def publish(self, alert: Alert) -> None:
        print(alert.format())


class CollectingSink:
    """Test double: keeps alerts in memory."""

    def __init__(self) -> None:
        self.alerts: list[Alert] = []

    def publish(self, alert: Alert) -> None:
        self.alerts.append(alert)


class CallbackSink:
    """Adapter for external publishers (SNS, webhook, ...): any callable
    taking the formatted message."""

    def __init__(self, fn: Callable[[str], None]) -> None:
        self.fn = fn

    def publish(self, alert: Alert) -> None:
        self.fn(alert.format())


def build_alert(reconciled: DataFrame, k: int = 5) -> Alert | None:
    """Count + deterministic top-k examples; None when fully reconciled.

    ``reconciled`` should be persisted (or re-read from the written
    output) by the caller -- the pipeline does this -- so the two actions
    here do not recompute the join DAG (fixes SURVEY.md SS4.3.1).
    """
    disc = discrepancies(reconciled)
    n = disc.count()
    if n == 0:
        return None
    examples = [r.asDict() for r in top_discrepancies(reconciled, k).collect()]
    return Alert(count=n, examples=examples)


def throttle_alerts(
    alerts: DataFrame,
    key_col: str = "user_id",
    sec_col: str = "sec",
    order_col: str = "event_id",
    cooldown_s: int = 600,
) -> DataFrame:
    """Alert-storm suppression (batch twin of
    ``streaming.events.streaming_alert_throttle``): per key, keep an
    alert iff it fires at least ``cooldown_s`` AFTER the last KEPT
    alert -- the greedy selection that turns a 10k-row error burst into
    one page per cooldown.

    This is genuinely NOT window-expressible: the decision chains off
    the last *kept* row, not the previous row (``lag`` spells the
    wrong thing -- a burst's rows are all within cooldown of their
    predecessor yet one per cooldown must survive). It is an ordered
    per-key scan, i.e. exactly the shape ``applyInPandas`` exists for:
    Arrow-batched, one pass per key group, state bounded by one
    timestamp. Deterministic: groups sort by (sec, order_col) with the
    unique order column breaking timestamp ties.
    """
    import pandas as pd

    def keep(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([sec_col, order_col])
        kept = []
        last = None
        for sec, oid in zip(pdf[sec_col], pdf[order_col]):
            if last is None or int(sec) - last >= cooldown_s:
                kept.append(int(oid))
                last = int(sec)
        return pdf[pdf[order_col].isin(kept)]

    return alerts.groupBy(key_col).applyInPandas(keep, alerts.schema)
