"""Plain-Python DAG runner (SURVEY.md SS3.4).

The reference orchestrates with Airflow (dags/retail_pipeline_dag.py:95-100):

    start -> {stage_sales, build_dims} -> reconcile -> loads -> end

Here the dependency graph is data (name -> (fn, deps)), executed in
topological order with results injected into downstream tasks. An
Airflow/cron adapter stays trivial because the graph shape is preserved;
no scheduler is required to run or test the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from graphlib import TopologicalSorter


@dataclass
class Pipeline:
    """Callable job graph. Each task fn receives the results of its
    dependencies as keyword args (by dependency name)."""

    tasks: dict[str, tuple[Callable[..., Any], list[str]]] = field(default_factory=dict)

    def add(self, name: str, fn: Callable[..., Any], deps: list[str] | None = None):
        self.tasks[name] = (fn, deps or [])
        return self

    def run(self) -> dict[str, Any]:
        graph = {name: set(deps) for name, (_, deps) in self.tasks.items()}
        results: dict[str, Any] = {}
        for name in TopologicalSorter(graph).static_order():
            fn, deps = self.tasks[name]
            results[name] = fn(**{d: results[d] for d in deps})
        return results
