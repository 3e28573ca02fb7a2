"""Schedule semantics for the DAG runner: daily intervals + catchup.

Reference parity: the reference DAG declares ``schedule_interval="@daily"``,
``catchup=False`` and a fixed ``start_date`` (airflow/dags/
etl_pipeline.py:22-31) and relies on the Airflow scheduler daemon to fire
runs. Airflow's model: a run for the data interval ``[T, T+Δ)`` becomes
eligible once the interval CLOSES (at ``T+Δ``) and is identified by its
LOGICAL date ``T`` (the interval start); with ``catchup=True`` every closed
interval since ``start_date`` that has not yet run is due, with
``catchup=False`` only the most recently closed one (older gaps are skipped
forever).

This module reproduces those semantics as a PURE function of
``(start, now, committed state)`` — ``now`` is always an argument, never
read from the clock in the core — so the behavior is deterministic and
fully testable without a daemon. The daemon itself is deliberately out of
scope at any scale: a crontab entry invoking ``scripts/run_schedule.py``
IS the tick, and each tick converges on the same answer regardless of how
many ticks were missed (the catchup computation), which is exactly what a
scheduler restart must guarantee.

Completion is judged from the DATA, not a side table: a scheduled run is
complete when every task in its dated out_dir
(``{base}/run_date={logical}``) carries Spark's job-commit ``_SUCCESS``
marker — the same resume discipline as the runner, so a half-finished
run stays due and resumes task-by-task on the next tick.
"""

from __future__ import annotations

import os
from datetime import date, timedelta

from pyspark.sql import SparkSession

from australian_company_etl_spark.orchestration.runner import (
    Task,
    TaskResult,
    _committed,
    run_dag,
)

#: reference default_args parity: start_date=datetime(2025, 6, 28)
REFERENCE_START = date(2025, 6, 28)


def closed_intervals(start: date, now: date, interval_days: int = 1) -> list[date]:
    """Logical dates (interval STARTS) of every interval fully closed by
    ``now``: ``[start, start+Δ)`` closes at ``start+Δ`` ≤ now, etc.
    ``@daily`` is interval_days=1; a weekly schedule is 7."""
    if interval_days < 1:
        raise ValueError(f"interval_days must be >= 1, got {interval_days}")
    out = []
    t = start
    while t + timedelta(days=interval_days) <= now:
        out.append(t)
        t += timedelta(days=interval_days)
    return out


def run_dir_for(base_out_dir: str, logical: date) -> str:
    return os.path.join(base_out_dir, f"run_date={logical.isoformat()}")


def run_is_complete(tasks: list[Task], base_out_dir: str, logical: date) -> bool:
    d = run_dir_for(base_out_dir, logical)
    return all(_committed(d, t.name) for t in tasks)


def due_runs(
    tasks: list[Task],
    base_out_dir: str,
    start: date,
    now: date,
    catchup: bool = False,
    interval_days: int = 1,
) -> list[date]:
    """Logical dates that should run at ``now``: closed, not yet complete.
    ``catchup=False`` (the reference's setting) considers the most recently
    closed interval — missed older intervals never backfill, exactly
    Airflow's semantics on a freshly-enabled DAG — PLUS any older interval
    whose run already STARTED (its dated out_dir exists; run_dag creates it
    on entry) but is incomplete: Airflow's catchup=False skips intervals
    that never ran, it does not abandon a started-then-failed run, and
    without this a single mid-run crash would strand that run
    half-complete forever once the next interval closed (contradicting
    the module contract that a half-finished run stays due and resumes)."""
    closed = closed_intervals(start, now, interval_days)
    if not catchup:
        closed = [
            d for d in closed[:-1] if os.path.isdir(run_dir_for(base_out_dir, d))
        ] + closed[-1:]
    return [d for d in closed if not run_is_complete(tasks, base_out_dir, d)]


def run_scheduled(
    spark: SparkSession,
    dag_factory,
    base_out_dir: str,
    start: date,
    now: date,
    catchup: bool = False,
    interval_days: int = 1,
    max_workers: int = 4,
) -> dict[str, dict[str, TaskResult]]:
    """One scheduler tick: compute the due logical dates and execute each
    through the runner into its dated out_dir. ``dag_factory(logical)``
    builds the task list for that run (a real daily pipeline selects its
    date partition from it; the reference DAG ignores it). Ticks are
    idempotent — complete runs are not re-entered at all, and a partially
    complete run resumes via the runner's committed-task skip. Returns
    {logical_date_iso: runner results} for the runs executed this tick."""
    probe = dag_factory(start)  # task NAMES define completion; dates don't change them
    out: dict[str, dict[str, TaskResult]] = {}
    for logical in due_runs(probe, base_out_dir, start, now, catchup, interval_days):
        results = run_dag(
            spark, dag_factory(logical), run_dir_for(base_out_dir, logical), max_workers
        )
        out[logical.isoformat()] = results
    return out
