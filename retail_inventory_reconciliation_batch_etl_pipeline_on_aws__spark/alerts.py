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
