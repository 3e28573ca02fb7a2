"""Orchestration runtime: DAG runner with retry + idempotent resume
(reference parity: airflow/dags/etl_pipeline.py)."""
