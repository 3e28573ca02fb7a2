"""The reference ETL DAG on the runner: `[t1, t2] >> t3 >> t4`.

Stage-for-stage twin of `airflow/dags/etl_pipeline.py:26-58`, with each
stage's output MATERIALIZED to parquet between tasks (the reference
stages through Postgres tables the same way):

    extract_commoncrawl (t1) ─┐
                              ├─► entity_matching (t3) ─► run_quality_checks (t4)
    extract_abr (t2) ─────────┘

t3 runs the oracle-gated B6 core (`plans/matching.unify_frames`) over the
two staged extracts; t4 runs the K2 metric core (`plans/pipeline.
quality_report`) over t3's staged output — so the orchestrated pipeline's
final report provably equals the composed single-plan K2 query
(`etl_dag_end_to_end`), which the DuckDB oracle gates. The test asserts
that equality: materialization boundaries change scheduling, not results.
"""

from __future__ import annotations

from australian_company_etl_spark.orchestration.runner import Task
from australian_company_etl_spark.sources.registry import load_tables


def reference_dag(sf_dir: str) -> list[Task]:
    def extract_commoncrawl(spark, _inputs):
        # t1: the crawled-candidate staging load (staging_commoncrawl);
        # validity filtering stays in t3, as in entity_matching.py:121-141
        return load_tables(spark, sf_dir, ["customer"])["customer"].select(
            "c_custkey", "c_name", "c_nationkey"
        )

    def extract_abr(spark, _inputs):
        # t2: the keyed-registry staging load (staging_abr)
        return load_tables(spark, sf_dir, ["supplier"])["supplier"].select(
            "s_suppkey", "s_name", "s_nationkey"
        )

    def entity_matching(spark, inputs):
        from australian_company_etl_spark.plans.matching import unify_frames

        return unify_frames(inputs["extract_abr"], inputs["extract_commoncrawl"])

    def run_quality_checks(spark, inputs):
        from australian_company_etl_spark.plans.pipeline import quality_report

        return quality_report(inputs["entity_matching"])

    return [
        Task("extract_commoncrawl", extract_commoncrawl),
        Task("extract_abr", extract_abr),
        Task(
            "entity_matching",
            entity_matching,
            deps=("extract_commoncrawl", "extract_abr"),
        ),
        Task("run_quality_checks", run_quality_checks, deps=("entity_matching",)),
    ]


def flaky(task: Task, fail_times: int, counter: dict) -> Task:
    """Test helper: wrap a task so its build raises on the first
    ``fail_times`` invocations (per runner attempt) — the injected
    transient failure the retry/resume semantics are proven against."""

    def build(spark, inputs):
        n = counter.get(task.name, 0)
        counter[task.name] = n + 1
        if n < fail_times:
            raise RuntimeError(f"injected transient failure #{n + 1} of {task.name}")
        return task.build(spark, inputs)

    return Task(task.name, build, deps=task.deps, retries=task.retries)


__all__ = ["reference_dag", "flaky"]
