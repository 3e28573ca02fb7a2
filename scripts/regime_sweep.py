"""Degenerate-regime parity sweeps — the rotating per-round gate runner.

The empty and NULL-heavy regimes are permanent pytest gates
(tests/test_empty_corpus.py / test_null_corpus.py). The remaining regimes
ran clean in round 8 but lived only as SURVEY prose — this runner makes
each reproducible in one command so they can't silently rot (VERDICT r08
task 7: run ONE alternating regime per round, ~2 min each). Usage:

    python scripts/regime_sweep.py --regime {all_dup,token_sparse,extreme_values,single_row,same_timestamp,single_user,hostile_names} [sf_dir]

Builds the transformed corpus from ``sf_dir`` (default sf0.001) into a
temp dir, replays EVERY sql-gated registry query Spark-vs-DuckDB with the
driver's comparison, prints one line per query, exits 1 on any mismatch.

Regimes:
- ``all_dup``: every document carries document 0's text (df = N, uniform
  entropy, complete dup graphs — the Σ|block|² worst case in one block).
- ``token_sparse``: CJK/emoji text whose only [a-z0-9] tokens are the
  doc-id digits (tokenizers, shingles, and language heuristics starve).
- ``extreme_values``: events.value swept across ±1e15 magnitudes, exact
  negatives, zeros, and sub-epsilon values (sum/variance/quantile/outlier
  plans meet catastrophic-cancellation-scale inputs; NEW in round 9).
- ``single_row``: exactly ONE row per table (the boundary between the
  permanent empty gate and the normal corpus: 1-row medians/stddevs/
  windows/ntiles, self-joins with no second row, lag()=NULL everywhere).
- ``same_timestamp``: every event carries the SAME ts (total tie on event
  time: zero-length sessions, one tumbling window holding everything,
  every lag gap 0, freshness lag 0, rolling windows fully overlapping,
  watermark math degenerate).
- ``single_user``: every event belongs to ONE user_id (total key skew:
  every per-user window/sessionization/funnel/retention group is the
  whole stream; the skew-safe plans' worst case in one key).
- ``hostile_names``: the three name columns cycle adversarial content by
  key — empty string, whitespace-only, one char, regex metacharacters,
  quotes/escapes, BMP unicode (umlauts + CJK), a 1000-char name — the
  normalization / levenshtein / jaccard / phonetic / trigram surface fed
  garbage-in. (Non-BMP emoji deliberately EXCLUDED from names: Spark
  measures string lengths in UTF-16 code units where DuckDB counts
  codepoints, a cross-engine semantic difference outside the engine's
  name-domain contract.)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_corpus(spark, sf_dir: str, out: str, regime: str) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from australian_company_etl_spark.sources.registry import (
        TABLES,
        load_tables,
        table_path,
    )

    for t in TABLES:
        df = load_tables(spark, sf_dir, [t])[t]
        if regime == "hostile_names" and t in ("customer", "supplier", "part"):
            col, key = {
                "customer": ("c_name", "c_custkey"),
                "supplier": ("s_name", "s_suppkey"),
                "part": ("p_name", "p_partkey"),
            }[t]
            hostile = [
                "",
                "   ",
                "x",
                "a.*b(c|d)[e]+^$",
                "O'Brien \"Pty\\\" Ltd",
                "Müller GmbH 株式会社",
                "z" * 1000,
            ]
            expr = F.col(col)  # key%8 == 7 keeps the original name
            for i, h in enumerate(hostile):
                expr = F.when(F.col(key) % 8 == i, F.lit(h)).otherwise(expr)
            df = df.withColumn(col, expr)
        elif regime == "single_row":
            # deterministic pick: the minimum-key row of each table (orderBy
            # all columns would be ambiguous on ties; every table has a key
            # as its first column in the synthetic corpus)
            df = df.orderBy(df.columns[0]).limit(1)
        elif t == "documents" and regime == "all_dup":
            first = df.orderBy("doc_id").select("text", "lang", "source").limit(1)
            df = (
                df.crossJoin(F.broadcast(first).withColumnsRenamed(
                    {"text": "__t", "lang": "__l", "source": "__s"}
                ))
                .withColumn("text", F.col("__t"))
                .withColumn("lang", F.col("__l"))
                .withColumn("source", F.col("__s"))
                .withColumn("n_chars", F.length("text").cast("bigint"))
                .drop("__t", "__l", "__s")
            )
        elif t == "documents" and regime == "token_sparse":
            df = df.withColumn(
                "text",
                F.concat(
                    F.lit("文書 \U0001f600\U0001f680 こんにちは "),
                    F.col("doc_id").cast("string"),
                    F.lit(" 世界の終わり \U0001f9ea"),
                ),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        elif t == "events" and regime == "single_user":
            df = df.withColumn("user_id", F.lit(7).cast("bigint"))
        elif t == "events" and regime == "same_timestamp":
            # pin every event to the corpus minimum ts (a real value both
            # engines already parse identically from the parquet bytes)
            df = df.withColumn("ts", F.min("ts").over(Window.partitionBy()))
        elif t == "events" and regime == "extreme_values":
            # deterministic per-event extreme: cycle through +huge, -huge,
            # 0, sub-epsilon; the residual class (event_id%5==4) carries the
            # EXACT NEGATIVE of the next event's (transformed) value so the
            # corpus holds true pairwise-cancelling neighbors — the
            # catastrophic-cancellation inputs the docstring promises
            # (ADVICE r09: the old -value negated the row's OWN value and
            # never built a cancelling pair). One-time corpus build at
            # sf0.001 — the single-partition orderBy window is fine here.
            base = (
                F.when(F.col("event_id") % 5 == 0, F.lit(1.0e15))
                .when(F.col("event_id") % 5 == 1, F.lit(-1.0e15))
                .when(F.col("event_id") % 5 == 2, F.lit(0.0))
                .when(F.col("event_id") % 5 == 3, F.lit(1.0e-15))
                .otherwise(F.col("value"))
            )
            w_next = Window.orderBy("event_id")
            df = (
                df.withColumn("__base", base)
                .withColumn(
                    "value",
                    F.when(
                        F.col("event_id") % 5 == 4,
                        -F.coalesce(
                            F.lead("__base").over(w_next), F.col("__base")
                        ),
                    ).otherwise(F.col("__base")),
                )
                .drop("__base")
            )
        df.coalesce(1).write.parquet(table_path(out, t))


def main() -> int:
    args = sys.argv[1:]
    regime = None
    if args and args[0] == "--regime":
        regime = args[1]
        args = args[2:]
    if regime not in (
        "all_dup",
        "token_sparse",
        "extreme_values",
        "single_row",
        "same_timestamp",
        "single_user",
        "hostile_names",
    ):
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries, all_oracles
    from tests.oracle_compare import compare, duckdb_connect

    spark = get_spark(app_name=f"aus-etl-regime-{regime}")
    queries, oracles = all_queries(), all_oracles()

    out = tempfile.mkdtemp(prefix=f"regime_{regime}_")
    try:
        _build_corpus(spark, sf_dir, out, regime)
        con = duckdb_connect(out)
        names = [n for n in queries if n in oracles]
        failures = []
        for i, name in enumerate(sorted(names), 1):
            t0 = time.perf_counter()
            try:
                res = compare(queries[name](spark, out), con, oracles[name])
            except Exception as exc:  # noqa: BLE001 — report and continue
                # matched LOUD decline is parity: a query whose documented
                # exactness envelope the regime exceeds must refuse in BOTH
                # engines with its envelope marker (raise_error / error()),
                # never silently NULL/wrap in one of them
                if "envelope" in str(exc):
                    spark_err = duck_err = ""
                    try:
                        queries[name](spark, out).collect()
                    except Exception as se:  # noqa: BLE001
                        spark_err = str(se)
                    try:
                        con.execute(oracles[name]).fetchall()
                    except Exception as de:  # noqa: BLE001
                        duck_err = str(de)
                    if "envelope" in spark_err and "envelope" in duck_err:
                        print(
                            f"[{i}/{len(names)}] {name}: ok-declined "
                            "(matched envelope refusal in both engines)",
                            flush=True,
                        )
                        continue
                print(f"[{i}/{len(names)}] {name}: ERROR {exc}", flush=True)
                failures.append(name)
                continue
            dt = time.perf_counter() - t0
            status = "ok" if res["ok"] else f"FAIL {res}"
            print(f"[{i}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
            if not res["ok"]:
                failures.append(name)
        print(f"\nregime={regime}: {len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
        return 1 if failures else 0
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
