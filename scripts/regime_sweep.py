"""Degenerate-regime parity sweeps — the rotating per-round gate runner.

The empty and NULL-heavy regimes are permanent pytest gates
(tests/test_empty_corpus.py / test_null_corpus.py). The remaining regimes
ran clean in round 8 but lived only as SURVEY prose — this runner makes
each reproducible in one command so they can't silently rot (VERDICT r08
task 7: run ONE alternating regime per round, ~2 min each). Usage:

    python scripts/regime_sweep.py --regime REGIME [--seed N] [--params JSON] [sf_dir]

``REGIME`` is a single dimension, a "+"-joined composition, or ``random``:

    --regime hostile_names
    --regime hostile_names+null_heavy+single_row     (VERDICT r09 task 5)
    --regime random --seed 17                        (VERDICT r09 task 4)
    --regime null_heavy+single_user --params '{"null_pct": 10, "user_card": 3}'

A random run's printed config (dims + params) IS the replay contract:
rebuild it exactly on any code version with ``--regime <dims-joined-by-+>
--params '<params json>'``. The seed alone replays only on the code
version that logged it — the sampler's dimension pool grows across
rounds, which shifts what a given seed draws.

Compositions apply every named dimension to ONE corpus (column transforms
first, row-reducers like single_row last) — orthogonal sweeps miss
interaction classes (a token-less hostile name on the only row of a table
exercises empty-aggregate + NULL-scorer paths together). ``random``
samples a composition AND per-dimension intensities (NULL rate, hostile
class rate, value-magnitude mix, duplication rate, timestamp-collision
rate, user cardinality) from ``--seed``, prints the sampled config (so any
divergence is reproducible from the recorded seed), and gates the full
registry on it.

Dimensions:
- ``all_dup``: documents carry document 0's text (df = N, uniform
  entropy, complete dup graphs — the Σ|block|² worst case in one block).
  Parameterized: ``dup_pct`` < 100 duplicates only a hash-chosen subset.
- ``token_sparse``: CJK/emoji text whose only [a-z0-9] tokens are the
  doc-id digits (tokenizers, shingles, and language heuristics starve).
- ``extreme_values``: events.value swept across ±1e15 magnitudes, exact
  pairwise-cancelling neighbors, zeros, and sub-epsilon values.
  Parameterized: ``extreme_pct`` selects the transformed subset,
  ``extreme_exp`` the magnitude decade.
- ``single_row``: exactly ONE row per table (1-row medians/stddevs/
  windows/ntiles, self-joins with no second row, lag()=NULL everywhere).
- ``same_timestamp``: events pinned to the corpus minimum ts (zero-length
  sessions, one tumbling window, every lag gap 0). Parameterized:
  ``ts_pct`` pins only a subset (partial tie).
- ``single_user``: events collapsed to one user_id (total key skew).
  Parameterized: ``user_card`` > 1 collapses to K users instead.
- ``hostile_names``: the three name columns cycle adversarial content —
  empty, whitespace-only, one char, regex metacharacters, quotes/escapes,
  BMP unicode, 1000-char — by key. Parameterized: ``hostile_pct``.
  (Non-BMP emoji deliberately EXCLUDED from names: Spark measures string
  lengths in UTF-16 code units where DuckDB counts codepoints, a
  cross-engine semantic difference outside the engine's name contract.)
- ``null_heavy``: the optional string columns (documents.text/lang,
  customer/supplier/part names) NULLed on a hash-chosen subset — the
  pytest gate's dimension, exposed here so it can COMPOSE with the rest.
  Parameterized: ``null_pct``.
- ``hostile_docs`` (round 10): documents.text cycles adversarial content
  by doc_id — empty, whitespace-only, one char, a 20k-char single token,
  a 20k-char one-token repetition, control-character soup, punctuation-
  only — the whole text/dedup/fingerprint/sampling surface fed
  garbage-in (the hostile_names idea applied to the document corpus).
  n_chars is recomputed so the metadata stays consistent.
  Parameterized: ``hostile_pct``.
- ``same_dates`` (round 10): orders.o_orderdate and lineitem.l_shipdate
  each pinned to their column minimum — a TOTAL date tie on the TPC-H
  side (every date-window predicate flips all-true/all-false, date
  groupings collapse to one group), the same_timestamp idea for the
  order/lineitem tables. Parameterized: ``ts_pct`` (shared with
  same_timestamp — a partial pin leaves a two-value date domain).
- ``extreme_vectors`` (round 10): embeddings cycle by vec_id — ALL-ZERO
  vectors (the L2 normalization's 0/0 produces NaN components and NaN
  cosines through a legitimate data path, exercising both engines' NaN
  ranking/rounding/grouping on every similarity plan), components
  scaled ×1e30 (squares reach ~1e60 in the double dot products), and
  ×1e-30 (squares at ~1e-60 probe underflow in the same fold); raw
  NaN/Inf LITERALS stay excluded — zero vectors already surface the
  NaN surface without injecting bytes the embedding contract (finite
  float features) rules out. Parameterized: ``hostile_pct``.
- ``unicode_mixed`` (round 11): documents.text AND the three name columns
  cycle normalization-hostile BMP content — NFC vs NFD spellings of the
  same words, stacked combining marks, scalars bounding the surrogate
  gap (U+D7FF/U+E000, legal but edge-adjacent), zero-width/bidi format
  characters, compatibility singletons (Å vs U+212B) and fi/fl ligatures
  — every tokenizer/length/regex/upper() parity seam fed codepoint
  sequences that LOOK equal but aren't. Non-BMP stays excluded for the
  same UTF-16-vs-codepoint length reason as hostile_names.
  Parameterized: ``hostile_pct``.
- ``long_doc`` (round 11): the minimum-doc_id document's text becomes one
  ``long_tokens``-token synthetic document (varying tokens, 9973-token
  vocabulary, ~7 MB at the 1M default) — the single-row envelope for the
  shingle zip-shift, rolling-window spans, PMI pair expansion, and the
  documented ngram int32 prune bound. Parameterized: ``long_tokens``.
- ``extreme_timestamps`` (round 11): events.ts cycles pre-1970 (1777),
  the one-second-before-epoch boundary, the epoch itself, and year 9999
  (every date_trunc/epoch/window seam where floor-vs-truncate semantics
  diverge on negative epochs); orders.o_orderdate / lineitem.l_shipdate
  cycle 1600-01-01 / 9999-12-31. All values stay inside the proleptic-
  Gregorian-safe range (post-1582-10-15) so parquet writes need no
  rebase mode. Parameterized: ``ts_pct``.

- ``locale_casing`` (round 12): the name columns AND documents.text cycle
  locale-pathological casing content — all four Turkish I forms
  (İ U+0130 / ı U+0131 next to ASCII I/i, where Java's locale-sensitive
  toUpperCase and simple mappings famously diverge), ligature-ONLY words
  (ﬁ ﬂ ﬀ ﬃ ﬄ — full case mapping expands, simple mapping passes through),
  zero-width joiners INSIDE the ASCII working set (P‍T‍Y — the
  ``\\b`` boundary and contiguous-token seams), and the Kelvin sign /
  long s / sharp s (K ſ ß — the case-folding singletons). All BMP.
  Parameterized: ``hostile_pct``.
- ``mixed_newlines`` (round 12): documents.text with every space replaced
  by a per-class line terminator — \\r\\n, bare \\r, \\f, \\x0b (vertical
  tab: inside Java's ASCII ``\\s`` but OUTSIDE RE2's), U+2028 LS, U+2029
  PS, U+0085 NEL — every line/whitespace-split seam (tokenizers, segment
  dedup, line dedup, quality ratios) fed terminators the two engines'
  regex classes are most likely to disagree on. Parameterized:
  ``hostile_pct``.
- ``hostile_urls`` (round 12): documents.source cycles pathological URL
  material — userinfo@host, explicit ports, %-encoded path/query bytes,
  punycode and raw-BMP IDN labels, deep subdomain chains, stacked
  www.m. prefixes — which flows into the F7 synthesized-URL
  canonicalizer and the A2 source ledger joins. Parameterized:
  ``hostile_pct``.

All subset selections use murmur3 ``hash(key, seed) pmod 100 < pct`` — the
corpus is materialized to parquet before either engine reads it, so any
deterministic expression is parity-safe.
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMENSIONS = (
    "all_dup",
    "token_sparse",
    "extreme_values",
    "single_row",
    "same_timestamp",
    "single_user",
    "hostile_names",
    "null_heavy",
    "hostile_docs",
    "same_dates",
    "extreme_vectors",
    "unicode_mixed",
    "long_doc",
    "extreme_timestamps",
    "locale_casing",
    "mixed_newlines",
    "hostile_urls",
)

#: unicode_mixed classes (all BMP — see the docstring's non-BMP note);
#: explicit escapes, never literals, so no editor/VCS normalization can
#: silently collapse the NFC/NFD distinction the classes exist to probe.
#: Classes 0 and 1 are the SAME words in NFC vs NFD; class 5 carries the
#: compatibility forms (U+212B ANGSTROM SIGN, fi/fl ligatures) that NFC
#: leaves alone but NFKC would fold.
UNICODE_MIXED = [
    "Caf\u00e9 r\u00e9sum\u00e9 na\u00efve \u00c5ngstr\u00f6m PTY LTD",
    "Cafe\u0301 re\u0301sume\u0301 nai\u0308ve A\u030angstro\u0308m PTY LTD",
    "a\u0301\u0302\u0303\u0304\u0305 combining b\u0316\u0317\u0318 mark stack",
    "\ud7ff\ue000\ufffd surrogate gap neighbours \ud7a3\uf8ff",
    "\u200bzero\u200cwidth\u200djoined\u2060 bidi\u200e marks\u200f",
    "\u212b vs \u00c5 vs A\u030a \ufb01nancial a\ufb02utter",
]

#: locale_casing classes (round 12, all BMP, explicit escapes): the
#: casing/locale seams unicode_mixed left untouched — Turkish dotted İ /
#: dotless ı beside their ASCII twins, ligature-only words, ZWJ stitched
#: INSIDE the ASCII working set, and the case-folding singletons
#: (Kelvin sign K→k, long s ſ→S, sharp s ß→SS under full mapping).
LOCALE_CASING = [
    "\u0130stanbul T\u0131caret Pty Ltd",
    "D\u0131\u015f T\u0130CARET l\u0131m\u0131ted",
    "\ufb01nancial \ufb02ow o\ufb00shore a\ufb03x \ufb04uid",
    "P\u200dT\u200dY L\u200dT\u200dD j\u200do\u200di\u200dned",
    "\u212aelvin \u017ftreet stra\u00dfe GRO\u1e9e",
    "I\u0131\u0130i i\u0130\u0131I dotted square",
]

#: mixed_newlines terminators (round 12): each class replaces every space
#: in the document with one terminator. \x0b is the sharpest seam — inside
#: Java's ASCII \s, outside RE2's; U+2028/2029/0085 are the Unicode line
#: breaks both engines' ASCII classes ignore but any \R/line API honors.
NEWLINE_CLASSES = ["\r\n", "\r", "\f", "\x0b", "\u2028", "\u2029", "\x85"]

#: hostile_urls source classes (round 12): class 7 keeps the original.
#: These flow into F7's synthesized URL (scheme + source + /pageN + noise)
#: and the A2 ledger joins — userinfo/ports/%-encoding/IDN/stacked
#: prefixes, the canonicalizer-regex pathologies the r11 verdict named.
HOSTILE_URLS = [
    "user:pa%40ss@evil.example.com:8443",
    "example.com:80",
    "xn--mnchen-3ya.de",
    "m\u00fcnchen.example",
    "EXAMPLE.COM/path%2Fencoded%3Fq",
    "a.b.c.d.e.f.g.h.example",
    "www.m.example.com",
]

HOSTILE_DOCS = [
    "",
    "  \t  \n  ",
    "a",
    "z" * 20000,
    ("spam " * 4000).strip(),
    "line1\nline2\ttab\rret\x0bvt",
    "!!!??? ... ,,, ;;; ###",
]

#: full-strength defaults — single-dimension regimes behave exactly as the
#: round-9 introducing runs recorded them
DEFAULT_PARAMS = {
    "dup_pct": 100,
    "extreme_pct": 100,
    "extreme_exp": 15,
    "ts_pct": 100,
    "user_card": 1,
    "hostile_pct": 100,
    "null_pct": 50,
    "long_tokens": 1_000_000,
    "seed": 0,
}

HOSTILE_NAMES = [
    "",
    "   ",
    "x",
    "a.*b(c|d)[e]+^$",
    "O'Brien \"Pty\\\" Ltd",
    "Müller GmbH 株式会社",
    "z" * 1000,
]

#: name column / key per table the hostile dimension rewrites
NAME_COLS = {
    "customer": ("c_name", "c_custkey"),
    "supplier": ("s_name", "s_suppkey"),
    "part": ("p_name", "p_partkey"),
}

#: table → [(nullable column, key column)] for the null_heavy dimension —
#: mirrors tests/test_null_corpus.py's contract (keys and numeric fact
#: columns are non-null by the reference's own schema)
NULL_COLS = {
    "documents": [("text", "doc_id"), ("lang", "doc_id")],
    "customer": [("c_name", "c_custkey")],
    "supplier": [("s_name", "s_suppkey")],
    "part": [("p_name", "p_partkey")],
}


def _pct_pick(F, key: str, pct: int, seed: int, salt: int = 0):
    """Deterministic row subset: murmur3(key, seed+salt) pmod 100 < pct."""
    if pct >= 100:
        return F.lit(True)
    return (
        F.pmod(F.hash(F.col(key), F.lit(seed + 1000 * salt)), F.lit(100)) < pct
    )


def _apply_dim(dim: str, t: str, df, params: dict):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    seed = params["seed"]
    if dim == "hostile_names" and t in NAME_COLS:
        col, key = NAME_COLS[t]
        expr = F.col(col)  # unselected rows / class 7 keep the original name
        for i, h in enumerate(HOSTILE_NAMES):
            expr = F.when(F.col(key) % 8 == i, F.lit(h)).otherwise(expr)
        return df.withColumn(
            col,
            F.when(_pct_pick(F, key, params["hostile_pct"], seed, 1), expr).otherwise(
                F.col(col)
            ),
        )
    if dim == "null_heavy" and t in NULL_COLS:
        for col, key in NULL_COLS[t]:
            df = df.withColumn(
                col,
                F.when(_pct_pick(F, key, params["null_pct"], seed, 2), F.lit(None)).otherwise(
                    F.col(col)
                ),
            )
        return df
    if dim == "hostile_docs" and t == "documents":
        expr = F.col("text")  # class 7 keeps the original text
        for i, h in enumerate(HOSTILE_DOCS):
            expr = F.when(F.col("doc_id") % 8 == i, F.lit(h)).otherwise(expr)
        return df.withColumn(
            "text",
            F.when(
                _pct_pick(F, "doc_id", params["hostile_pct"], seed, 6), expr
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if dim == "same_dates":
        col = {"orders": "o_orderdate", "lineitem": "l_shipdate"}.get(t)
        if col is None:
            return df
        key = "o_orderkey" if t == "orders" else "l_orderkey"
        pick = _pct_pick(F, key, params["ts_pct"], seed, 7)
        return df.withColumn(
            col,
            F.when(pick, F.min(col).over(Window.partitionBy())).otherwise(F.col(col)),
        )
    if dim == "extreme_vectors" and t == "embeddings":
        pick = _pct_pick(F, "vec_id", params["hostile_pct"], seed, 8)
        cls = F.col("vec_id") % 4  # class 3 keeps the original vector
        scaled = (
            F.when(cls == 0, F.transform("embedding", lambda x: x * F.lit(0.0)))
            .when(cls == 1, F.transform("embedding", lambda x: x * F.lit(1.0e30)))
            .when(cls == 2, F.transform("embedding", lambda x: x * F.lit(1.0e-30)))
            .otherwise(F.col("embedding"))
        )
        return df.withColumn(
            "embedding",
            F.when(pick, scaled).otherwise(F.col("embedding")).cast("array<float>"),
        )
    if dim == "unicode_mixed":
        def _cycle(df, col, key):
            expr = F.col(col)  # class 6 keeps the original value
            for i, u in enumerate(UNICODE_MIXED):
                expr = F.when(
                    F.col(key) % 7 == i,
                    F.concat(F.lit(u), F.lit(" "), F.col(key).cast("string")),
                ).otherwise(expr)
            return df.withColumn(
                col,
                F.when(_pct_pick(F, key, params["hostile_pct"], seed, 9), expr).otherwise(
                    F.col(col)
                ),
            )

        if t == "documents":
            return _cycle(df, "text", "doc_id").withColumn(
                "n_chars", F.length("text").cast("bigint")
            )
        if t in NAME_COLS:
            col, key = NAME_COLS[t]
            return _cycle(df, col, key)
        return df
    if dim == "locale_casing":
        def _cycle_lc(df, col, key):
            expr = F.col(col)  # class 6 keeps the original value
            for i, u in enumerate(LOCALE_CASING):
                expr = F.when(
                    F.col(key) % 7 == i,
                    F.concat(F.lit(u), F.lit(" "), F.col(key).cast("string")),
                ).otherwise(expr)
            return df.withColumn(
                col,
                F.when(_pct_pick(F, key, params["hostile_pct"], seed, 12), expr).otherwise(
                    F.col(col)
                ),
            )

        if t == "documents":
            return _cycle_lc(df, "text", "doc_id").withColumn(
                "n_chars", F.length("text").cast("bigint")
            )
        if t in NAME_COLS:
            col, key = NAME_COLS[t]
            return _cycle_lc(df, col, key)
        return df
    if dim == "mixed_newlines" and t == "documents":
        expr = F.col("text")  # class 7 keeps the original text
        for i, term in enumerate(NEWLINE_CLASSES):
            expr = F.when(
                F.col("doc_id") % 8 == i, F.replace(F.col("text"), F.lit(" "), F.lit(term))
            ).otherwise(expr)
        return df.withColumn(
            "text",
            F.when(
                _pct_pick(F, "doc_id", params["hostile_pct"], seed, 13), expr
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if dim == "hostile_urls" and t == "documents":
        expr = F.col("source")  # class 7 keeps the original source
        for i, u in enumerate(HOSTILE_URLS):
            expr = F.when(F.col("doc_id") % 8 == i, F.lit(u)).otherwise(expr)
        return df.withColumn(
            "source",
            F.when(
                _pct_pick(F, "doc_id", params["hostile_pct"], seed, 14), expr
            ).otherwise(F.col("source")),
        )
    if dim == "long_doc" and t == "documents":
        # ONE ~long_tokens-token document on the minimum doc_id: varying
        # tokens over a 9973-word vocabulary via sequence+transform (pure
        # column expressions — no driver-side string building), so shingle
        # sets, rolling windows, and PMI pairs all see real variety at
        # envelope length instead of one repeated token
        n_tok = int(params["long_tokens"])
        body = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_tok - 1)),
                lambda i: F.concat(F.lit("tok"), F.pmod(i, F.lit(9973)).cast("string")),
            ),
        )
        is_min = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy())
        return df.withColumn(
            "text", F.when(is_min, body).otherwise(F.col("text"))
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if dim == "extreme_timestamps":
        if t == "events":
            pick = _pct_pick(F, "event_id", params["ts_pct"], seed, 10)
            cls = F.col("event_id") % 5  # class 4 keeps the original ts
            newts = (
                F.when(cls == 0, F.lit("1777-07-04 01:02:03").cast("timestamp"))
                .when(cls == 1, F.lit("1969-12-31 23:59:59").cast("timestamp"))
                .when(cls == 2, F.lit("1970-01-01 00:00:00").cast("timestamp"))
                .when(cls == 3, F.lit("9999-12-31 23:59:59").cast("timestamp"))
                .otherwise(F.col("ts"))
            )
            return df.withColumn("ts", F.when(pick, newts).otherwise(F.col("ts")))
        col = {"orders": "o_orderdate", "lineitem": "l_shipdate"}.get(t)
        if col is None:
            return df
        key = "o_orderkey" if t == "orders" else "l_orderkey"
        pick = _pct_pick(F, key, params["ts_pct"], seed, 11)
        cls = F.col(key) % 3  # class 2 keeps the original date
        newd = (
            F.when(cls == 0, F.lit("1600-01-01").cast("date"))
            .when(cls == 1, F.lit("9999-12-31").cast("date"))
            .otherwise(F.col(col))
        )
        return df.withColumn(col, F.when(pick, newd).otherwise(F.col(col)))
    if dim == "all_dup" and t == "documents":
        first = df.orderBy("doc_id").select("text", "lang", "source").limit(1)
        pick = _pct_pick(F, "doc_id", params["dup_pct"], seed, 3)
        return (
            df.crossJoin(F.broadcast(first).withColumnsRenamed(
                {"text": "__t", "lang": "__l", "source": "__s"}
            ))
            .withColumn("text", F.when(pick, F.col("__t")).otherwise(F.col("text")))
            .withColumn("lang", F.when(pick, F.col("__l")).otherwise(F.col("lang")))
            .withColumn("source", F.when(pick, F.col("__s")).otherwise(F.col("source")))
            .withColumn("n_chars", F.length("text").cast("bigint"))
            .drop("__t", "__l", "__s")
        )
    if dim == "token_sparse" and t == "documents":
        return df.withColumn(
            "text",
            F.concat(
                F.lit("文書 \U0001f600\U0001f680 こんにちは "),
                F.col("doc_id").cast("string"),
                F.lit(" 世界の終わり \U0001f9ea"),
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if dim == "single_user" and t == "events":
        k = params["user_card"]
        if k <= 1:
            return df.withColumn("user_id", F.lit(7).cast("bigint"))
        return df.withColumn("user_id", F.pmod(F.col("user_id"), F.lit(k)).cast("bigint"))
    if dim == "same_timestamp" and t == "events":
        # pin selected events to the corpus minimum ts (a real value both
        # engines already parse identically from the parquet bytes)
        pick = _pct_pick(F, "event_id", params["ts_pct"], seed, 4)
        return df.withColumn(
            "ts",
            F.when(pick, F.min("ts").over(Window.partitionBy())).otherwise(F.col("ts")),
        )
    if dim == "extreme_values" and t == "events":
        # deterministic per-event extreme: cycle through +huge, -huge,
        # 0, sub-epsilon; the residual class (event_id%5==4) carries the
        # EXACT NEGATIVE of the next event's (transformed) value so the
        # corpus holds true pairwise-cancelling neighbors. One-time corpus
        # build at sf0.001 — the single-partition orderBy window is fine.
        mag = float(10 ** params["extreme_exp"])
        base = (
            F.when(F.col("event_id") % 5 == 0, F.lit(mag))
            .when(F.col("event_id") % 5 == 1, F.lit(-mag))
            .when(F.col("event_id") % 5 == 2, F.lit(0.0))
            .when(F.col("event_id") % 5 == 3, F.lit(1.0e-15))
            .otherwise(F.col("value"))
        )
        w_next = Window.orderBy("event_id")
        pick = _pct_pick(F, "event_id", params["extreme_pct"], seed, 5)
        return (
            df.withColumn("__base", F.when(pick, base).otherwise(F.col("value")))
            .withColumn(
                "value",
                F.when(
                    pick & (F.col("event_id") % 5 == 4),
                    -F.coalesce(F.lead("__base").over(w_next), F.col("__base")),
                ).otherwise(F.col("__base")),
            )
            .drop("__base")
        )
    return df


def _build_corpus(spark, sf_dir: str, out: str, dims: list[str], params: dict) -> None:
    from australian_company_etl_spark.sources.registry import (
        TABLES,
        load_tables,
        table_path,
    )

    # column transforms first, row-reducers last: a composed corpus must
    # reduce to rows that CARRY the composed column classes. long_doc runs
    # after the other column transforms — composed BEFORE all_dup, the
    # envelope text would replicate across the whole corpus (300 × multi-MB
    # rows), which tests corpus size, not the long-document seams.
    ordered = (
        [d for d in dims if d not in ("single_row", "long_doc")]
        + (["long_doc"] if "long_doc" in dims else [])
        + (["single_row"] if "single_row" in dims else [])
    )
    for t in TABLES:
        df = load_tables(spark, sf_dir, [t])[t]
        for d in ordered:
            if d == "single_row":
                # deterministic pick: the minimum-key row of each table
                # (every table has a key as its first column)
                df = df.orderBy(df.columns[0]).limit(1)
            else:
                df = _apply_dim(d, t, df, params)
        df.coalesce(1).write.parquet(table_path(out, t))


def _sample_random(seed: int) -> tuple[list[str], dict]:
    """Seeded composition + intensities (VERDICT r09 task 4). 2–4 of the
    composable dimensions, each with a sampled rate — recorded in the log
    line so any divergence replays from the seed alone."""
    rng = random.Random(seed)
    composable = [d for d in DIMENSIONS if d != "single_row"]
    dims = rng.sample(composable, rng.randint(2, 4))
    if rng.random() < 0.15:  # occasionally compose onto a 1-row table too
        dims.append("single_row")
    params = dict(DEFAULT_PARAMS)
    params.update(
        seed=seed,
        dup_pct=rng.choice([10, 50, 90, 100]),
        extreme_pct=rng.choice([25, 50, 100]),
        extreme_exp=rng.choice([6, 12, 15]),
        ts_pct=rng.choice([25, 75, 100]),
        user_card=rng.choice([1, 3, 30]),
        hostile_pct=rng.choice([12, 50, 100]),
        null_pct=rng.choice([10, 30, 50]),
        # long_doc in a RANDOM composition caps at 200k tokens: the 1M
        # envelope is the dedicated single-dimension run's job, and a 1M-
        # token doc under (say) all_dup would replicate the 7 MB text
        # across the whole corpus
        long_tokens=rng.choice([50_000, 200_000]),
    )
    return dims, params


def main() -> int:
    import json

    args = sys.argv[1:]
    regime = None
    seed = 0
    cli_params: dict | None = None
    while args and args[0].startswith("--"):
        if args[0] == "--regime":
            regime = args[1]
        elif args[0] == "--seed":
            seed = int(args[1])
        elif args[0] == "--params":
            # exact-replay escape hatch: a logged run records dims AND
            # params; `--regime a+b --params '<json>'` rebuilds that corpus
            # on ANY code version (the seed's sample depends on the
            # dimension pool, which grows across rounds)
            cli_params = json.loads(args[1])
        else:
            print(__doc__, file=sys.stderr)
            return 2
        args = args[2:]
    if regime == "random":
        # `is not None`, not truthiness: an explicitly typed `--params '{}'`
        # must error the same way (ADVICE r11 — the falsy empty dict slipped
        # through the guard it exists to close).
        if cli_params is not None:
            # --params is the exact-replay escape hatch for EXPLICIT dims;
            # the random sampler overwrites every knob from the seed, so a
            # replay typed as `--regime random --params {...}` would appear
            # to work while running a different corpus (ADVICE r10). Replay
            # a logged random run via its logged dims: `--regime a+b
            # --params '<logged json>'`.
            print(
                "--params is ignored under --regime random (the seed's sampler "
                "sets every knob); replay the logged run with its logged dims: "
                "--regime <dim1+dim2> --params '<logged json>'",
                file=sys.stderr,
            )
            return 2
        dims, params = _sample_random(seed)
        label = f"random(seed={seed})→{'+'.join(dims)}"
    elif regime:
        dims = regime.split("+")
        if not all(d in DIMENSIONS or d == "single_row" for d in dims):
            print(__doc__, file=sys.stderr)
            return 2
        params = dict(DEFAULT_PARAMS, seed=seed)
        unknown_params = set(cli_params or {}) - set(params)
        if unknown_params:
            print(f"unknown --params keys: {sorted(unknown_params)}", file=sys.stderr)
            return 2
        params.update(cli_params or {})
        label = regime
    else:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries, all_oracles
    from tests.oracle_compare import compare, duckdb_connect

    spark = get_spark(app_name=f"aus-etl-regime-{dims[0]}")
    queries, oracles = all_queries(), all_oracles()
    print(f"regime={label} dims={dims} params={params}", flush=True)

    out = tempfile.mkdtemp(prefix="regime_" + "_".join(dims[:2]) + "_")
    try:
        _build_corpus(spark, sf_dir, out, dims, params)
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
        print(f"\nregime={label}: {len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
        return 1 if failures else 0
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
