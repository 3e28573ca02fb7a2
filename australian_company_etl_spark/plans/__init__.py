"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict = {}
    for mod in _plan_modules():
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict = {}
    for mod in _plan_modules():
        merged.update(getattr(mod, "ORACLES", {}))
    return merged


def _plan_modules():
    from australian_company_etl_spark.plans import (
        api,
        dedup,
        etl,
        matching,
        multimodal,
        pipeline,
        quality,
        sampling,
        similarity,
        sketches,
        streaming_batch,
        temporal,
        text,
        tpch,
        tpch_full,
    )

    return [
        etl,
        matching,
        quality,
        api,
        tpch,
        tpch_full,
        dedup,
        similarity,
        text,
        multimodal,
        streaming_batch,
        temporal,
        sketches,
        sampling,
        pipeline,
    ]
