"""Composed/seeded regime corpus builder contract (scripts/regime_sweep.py).

The sweep RUNNER's own gate runs are recorded per round (regime_*.log);
these tests pin the builder mechanics the runs rely on: seeded sampling is
reproducible (a recorded seed must replay the exact corpus), composition
applies every dimension to one corpus with row-reducers last, and partial
intensities transform a strict subset. Full-registry parity on composed
corpora is the runner's job — one sweep per invocation, logged per round —
not a per-suite cost.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "regime_sweep_mod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "regime_sweep.py"),
)
rs = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(rs)


def test_random_sampling_is_seed_deterministic():
    for seed in (0, 1, 17, 123456):
        dims, params = rs._sample_random(seed)
        dims2, params2 = rs._sample_random(seed)
        assert (dims, params) == (dims2, params2)
        assert 2 <= len([d for d in dims if d != "single_row"]) <= 4
        assert all(d in rs.DIMENSIONS or d == "single_row" for d in dims)
        assert params["seed"] == seed
        assert set(rs.DEFAULT_PARAMS) <= set(params)


def test_full_strength_defaults_match_round9_regimes():
    # the nine recorded single-dimension gates must keep replaying the same
    # corpus: full-strength defaults, not sampled intensities
    assert rs.DEFAULT_PARAMS["dup_pct"] == 100
    assert rs.DEFAULT_PARAMS["hostile_pct"] == 100
    assert rs.DEFAULT_PARAMS["ts_pct"] == 100
    assert rs.DEFAULT_PARAMS["extreme_pct"] == 100
    assert rs.DEFAULT_PARAMS["user_card"] == 1


def test_composed_corpus_applies_all_dims_row_reducer_last(spark, sf_dir, tmp_path):
    out = str(tmp_path / "composed")
    os.makedirs(out)
    params = dict(rs.DEFAULT_PARAMS)
    rs._build_corpus(
        spark, sf_dir, out, ["hostile_names", "null_heavy", "single_row"], params
    )
    cust = spark.read.parquet(os.path.join(out, "customer.parquet")).collect()
    docs = spark.read.parquet(os.path.join(out, "documents.parquet")).collect()
    assert len(cust) == 1 and len(docs) == 1, "single_row must reduce AFTER transforms"
    name = cust[0]["c_name"]
    # min c_custkey is 0 → hostile class 0 (empty string), unless the
    # null_heavy hash picked this key — either way the surviving row must
    # carry a composed adversarial value, never the original name
    assert name in ("", None)


def test_partial_intensity_transforms_a_strict_subset(spark, sf_dir):
    from australian_company_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    params = dict(rs.DEFAULT_PARAMS, dup_pct=50, seed=7)
    out = rs._apply_dim("all_dup", "documents", docs, params)
    first_text = docs.orderBy("doc_id").select("text").first()[0]
    n = docs.count()
    n_dup = out.filter(F.col("text") == first_text).count()
    assert 0 < n_dup < n, f"dup_pct=50 must duplicate a strict subset ({n_dup}/{n})"


# ── round-12: the locale_casing tokenizer seam, pinned cross-engine ─────────


def test_tokenizers_agree_with_oracle_on_locale_pathological_text(spark):
    """The locale_casing introducing sweep (regime_locale_casing_r12.log)
    caught Java's FULL lowercase of İ U+0130 ("i"+U+0307) splitting tokens
    differently from DuckDB's simple mapping ("i") — 22 token-family
    queries diverged. The tier-0 ASCII pre-strip in the shared tokenizers
    closes the whole class: lower() only ever sees ASCII. Pin every
    locale_casing regime class plus the named İ case through BOTH dialects."""
    import duckdb

    from australian_company_etl_spark.functions.textfns import (
        tokens_all_spark,
        tokens_all_sql,
        tokens_spark,
        tokens_sql,
    )

    rows = [(s,) for s in rs.LOCALE_CASING] + [
        ("İstanbul Tıcaret PTY LTD",),
        ("ASCII stays exactly as before!",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [
        (r[0], r[1])
        for r in df.select(
            tokens_all_spark(F.col("text")), tokens_spark(F.col("text"))
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(
        f"SELECT {tokens_all_sql('text')}, {tokens_sql('text')} FROM t"
    ).fetchall()
    for (g_all, g_set), (w_all, w_set), (src,) in zip(got, want, rows):
        assert g_all == w_all, (src, g_all, w_all)
        assert g_set == w_set, (src, g_set, w_set)
    # the İ case specifically: one token, not a split pair
    i_case = got[len(rs.LOCALE_CASING)][0]
    assert "stanbul" in i_case and "i" not in i_case
