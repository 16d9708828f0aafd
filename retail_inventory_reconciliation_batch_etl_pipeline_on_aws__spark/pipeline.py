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


def to_airflow_tasks(pipeline: Pipeline, dag, operator_cls=None, **op_kwargs):
    """Adapter closing the loop with the reference's scheduler
    (dags/retail_pipeline_dag.py:95-100): materialize this Pipeline as
    Airflow operators with the SAME dependency edges.

    ``dag`` is an airflow DAG object; ``operator_cls`` defaults to
    PythonOperator (imported lazily so Airflow is never a dependency of
    the engine itself -- this module stays importable and testable
    without it). Each task's callable runs the pipeline fn with its
    dependency RESULTS resolved from XCom, preserving the data-passing
    contract of ``Pipeline.run``. Returns {name: operator}.
    """
    if operator_cls is None:  # pragma: no cover - needs airflow installed
        from airflow.operators.python import PythonOperator as operator_cls

    def make_callable(fn, deps):
        def _run(ti=None, **_):
            kwargs = (
                {d: ti.xcom_pull(task_ids=d) for d in deps} if ti is not None else {}
            )
            return fn(**kwargs)

        return _run

    ops = {
        name: operator_cls(
            task_id=name,
            python_callable=make_callable(fn, deps),
            dag=dag,
            **op_kwargs,
        )
        for name, (fn, deps) in pipeline.tasks.items()
    }
    for name, (_, deps) in pipeline.tasks.items():
        for d in deps:
            ops[d] >> ops[name]
    return ops


def to_cron_entry(pipeline_entry: str, schedule: str = "0 3 * * *") -> str:
    """The cron form of the reference's daily 03:00 trigger
    (dags/retail_pipeline_dag.py:88 ``schedule_interval``): one line,
    no scheduler dependency -- ``Pipeline.run`` is already idempotent
    per date because every sink is a dynamic-partition overwrite.

    ``pipeline_entry`` is either a script path (``.py`` -> submitted via
    ``spark-submit``, which has no module flag) or a module name
    (-> ``python -m``, the driver creating its own SparkSession)."""
    if pipeline_entry.endswith(".py"):
        return f"{schedule} spark-submit --deploy-mode cluster {pipeline_entry}"
    return f"{schedule} python -m {pipeline_entry}"
