"""Dual-dialect text primitives shared by matching/dedup/text-analysis ops.

Every primitive has a Spark-Column form and a DuckDB-SQL form generated from
the same constants, so oracle parity holds by construction. All Spark forms
are built-in `pyspark.sql.functions` (JVM, codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ── portable 60-bit hash: first 15 hex chars of md5 ─────────────────────────
# Spark: conv(hex, 16, 10) → decimal string → bigint
# DuckDB: ('0x' || hex)::BIGINT
# Both interpret the same 15 hex chars (60 bits, always positive, fits i64).


def phash_spark(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def phash_sql(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


# ── tokenization: lowercase word split ──────────────────────────────────────
#
# Split-FIRST casing order (round-12 locale_casing regime, the tokenizer
# twin of normalize.py's tier-0 pre-strip): the separator class is applied
# to the RAW string and lower() runs per-token afterwards. Rationale: a
# token produced by splitting on [^A-Za-z0-9]+ is a maximal ASCII-
# alphanumeric run BY CONSTRUCTION, so the per-token lower() only ever
# sees ASCII, where Spark and DuckDB agree trivially — whereas the old
# lower()-then-split order let Java's FULL case mapping disagree with
# DuckDB's simple utf8proc mapping before the separators were even
# decided. The one multi-char lowercase mapping in Unicode, İ U+0130 →
# "i" + U+0307, made Spark tokenize "İstanbul" as [i, stanbul] while
# DuckDB produced [istanbul]; singletons like the Kelvin sign (K → ASCII
# k in both) relied on the engines' tables agreeing char by char. ASCII
# corpora tokenize exactly as before (uppercase runs lower per-token to
# the identical result), so every gate-corpus oracle hash is unchanged.
# Implementation notes, both measured on the 500k-doc sf10 corpus:
# (a) expressed as split→transform(lower), NOT as a regexp_replace
# pre-strip — Spark's regexp_replace is pathologically slow on negated
# classes (28s vs 0.9s per tokenization pass, which would have DOUBLED
# dedup_setsim_prefix); (b) spelled [\W_]+ and not [^A-Za-z0-9]+ —
# Java's Pattern compiles 2-range character classes to a fast node but
# falls off a cliff at 3 ranges (0.6s vs 21s for the SAME class), while
# \W (ASCII [^a-zA-Z0-9_] in both Java-default and RE2) ∪ {_} is the
# identical set with a fast spelling in both engines.
TOKEN_SEP = r"[\W_]+"


def tokens_spark(col: Column) -> Column:
    """Distinct lowercase word tokens, empties removed, sorted."""
    toks = F.transform(F.split(col, TOKEN_SEP), lambda x: F.lower(x))
    return F.array_sort(F.array_distinct(F.filter(toks, lambda x: x != "")))


def tokens_sql(expr: str) -> str:
    return (
        f"list_sort(list_distinct(list_filter(list_transform("
        f"string_split_regex({expr}, '{TOKEN_SEP}'), x -> lower(x)), x -> x <> '')))"
    )


# ── ordered (non-distinct) token stream — for counting / shingling ──────────


def tokens_all_spark(col: Column) -> Column:
    toks = F.transform(F.split(col, TOKEN_SEP), lambda x: F.lower(x))
    return F.filter(toks, lambda x: x != "")


def tokens_all_sql(expr: str) -> str:
    return (
        f"list_filter(list_transform(string_split_regex({expr}, '{TOKEN_SEP}'),"
        f" x -> lower(x)), x -> x <> '')"
    )


# ── word k-gram shingles (distinct) over an ordered token array ─────────────
# Guard: Spark `sequence(1, n)` ramps DOWN when n < 1, so short docs must be
# short-circuited to an empty array; DuckDB `range(1, n)` is empty for n <= 1.


def shingles_spark(tok_col: Column, k: int) -> Column:
    n = F.size(tok_col)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(tok_col, i, k)),
    )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(F.array_distinct(grams))


def shingles_sql(tok_expr: str, k: int) -> str:
    """Zip-shift word k-grams — the SAME construction as the Spark row form
    below, because the obvious per-position
    `list_transform(range(...), i -> list_slice(t, i, i+k-1))` is O(n²)
    PER DOCUMENT in DuckDB (each lambda invocation re-materializes against
    the captured list): measured 455 s for 62 four-thousand-token docs on
    the round-10 hostile_docs corpus vs 0.18 s for this form, identical
    output on every corpus checked. k-1 whole-list tail slices (each O(n),
    done once), one zip, one transform; zip pads to the longest input so
    the last k-1 entries concat to NULL and are filtered — which also
    yields [] for docs shorter than k, matching the old range() guard."""
    zips = ", ".join(
        [tok_expr]
        + [f"list_slice({tok_expr}, {i}, len({tok_expr}))" for i in range(2, k + 1)]
    )
    gram = " || ' ' || ".join(f"x[{i}]" for i in range(1, k + 1))
    return (
        f"list_distinct(list_filter(list_transform(list_zip({zips}), "
        f"x -> {gram}), x -> x IS NOT NULL))"
    )


# ── row-form shingles: zip-shift + one posexplode (whole-stage codegen) ─────
# The array-lambda form (`shingles_spark`) runs interpreted (Spark HOFs skip
# codegen) — ~4x slower per token. This form zips the token array with its
# own k-1 shifted slices (arrays_zip/slice/concat_ws are all regular codegen
# expressions, not HOFs) and explodes ONCE, so it imposes NO partitioning
# requirement: unlike the earlier posexplode + window-lead form — whose
# Window.partitionBy(id) forced Catalyst to insert an Exchange ABOVE the
# Generate on any input not already hash-partitioned by id, shuffling
# exploded token rows (~2-3× corpus bytes) on a real many-file corpus —
# the zip-shift plan is scan → Generate → map work, and a downstream
# groupBy(id) partial-aggregates BEFORE its exchange (one combined row per
# doc moves, since a doc lives in exactly one scan partition). Produces
# (id, shingle) rows WITH positional duplicates: min-hash and collect_set
# downstream are duplicate-insensitive.


def shingle_rows_spark(
    df,
    k: int,
    id_col: str = "doc_id",
    tok_col: str = "t",
    out_col: str = "s",
    pos_col: str | None = None,
):
    """(id, [pos,] k-gram) rows from an ordered token-array column.

    ``pos_col``: also emit the 0-based start position of each gram (used by
    the rolling-span detector's run analysis).
    """
    t = F.col(tok_col)
    n = F.size(t)
    parts = [t.alias("g0")] + [F.slice(t, j + 1, n).alias(f"g{j}") for j in range(1, k)]
    # arrays_zip pads the shorter shifted slices with null; the outer slice
    # truncates to the n-k+1 complete grams (empty when n < k, so short docs
    # vanish exactly as the window form's isNotNull filter made them).
    zipped = F.slice(F.arrays_zip(*parts), 1, F.greatest(n - k + 1, F.lit(0)))
    ex = df.select(id_col, F.posexplode(zipped).alias("_pos", "_g"))
    gram = F.concat_ws(" ", *[F.col(f"_g.g{j}") for j in range(k)])
    cols = [F.col(id_col)]
    if pos_col is not None:
        cols.append(F.col("_pos").alias(pos_col))
    return ex.select(*cols, gram.alias(out_col))


# ── levenshtein ratio (rapidfuzz fuzz.ratio analog, 0-100 int) ──────────────


def lev_ratio_spark(a: Column, b: Column) -> Column:
    m = F.greatest(F.length(a), F.length(b))
    return F.when(m == 0, F.lit(100)).otherwise(
        F.floor(100 * (m - F.levenshtein(a, b)) / m)
    ).cast("int")


def lev_ratio_sql(a: str, b: str) -> str:
    return (
        f"(CASE WHEN greatest(length({a}), length({b})) = 0 THEN 100 "
        f"ELSE floor(100 * (greatest(length({a}), length({b})) - levenshtein({a}, {b})) "
        f"/ greatest(length({a}), length({b}))) END)::INT"
    )



# ── multi-scorer fuzzy primitives (entity_matching.py:405-418) ──────────────
# The reference scores each candidate pair with three rapidfuzz scorers and
# keeps the best: token_sort_ratio, token_set_ratio, ratio. Re-expressed as
# levenshtein-ratio over canonical strings (the ratio kernel is our
# levenshtein analog of rapidfuzz's InDel ratio — same scorer everywhere, so
# the max-of-three semantics carry over exactly):
#   token_sort — tokens sorted (duplicates kept), space-joined, then ratio.
#   token_set  — fuzzywuzzy construction: t0 = sorted distinct intersection,
#                t1 = t0 + sorted (a−b), t2 = t0 + sorted (b−a),
#                score = max(ratio(t0,t1), ratio(t0,t2), ratio(t1,t2)).
# Designed for PRECOMPUTED per-side columns (token-sort string, distinct
# sorted token array) so the per-pair work inside a blocked join is only the
# levenshtein kernels, not re-tokenization.


def token_sort_str_spark(col: Column) -> Column:
    """Canonical token-sort string: all tokens (dupes kept) sorted, joined."""
    toks = F.filter(F.split(col, " "), lambda x: x != "")
    return F.array_join(F.array_sort(toks), " ")


def token_sort_str_sql(expr: str) -> str:
    # NULL-preserving empty-list guard: DuckDB array_to_string([]) is NULL
    # where Spark array_join([]) is '' — on a token-less NAME the scorer
    # chain went NULL-silent in the oracle only (round-9 hostile-names
    # regime finding). A NULL input must STAY NULL (the NULL-corpus
    # contract; Spark's split/filter/array_join all propagate it), so the
    # '' only applies when the input itself is non-NULL.
    return (
        f"(CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"coalesce(array_to_string(list_sort(list_filter("
        f"string_split({expr}, ' '), x -> x <> '')), ' '), '') END)"
    )


def token_array_spark(col: Column) -> Column:
    """Distinct sorted token array (the token_set base)."""
    toks = F.filter(F.split(col, " "), lambda x: x != "")
    return F.array_sort(F.array_distinct(toks))


def token_array_sql(expr: str) -> str:
    return (
        f"list_sort(list_distinct(list_filter("
        f"string_split({expr}, ' '), x -> x <> '')))"
    )


def token_set_strings_spark(ta: Column, tb: Column) -> tuple[Column, Column, Column]:
    """(t0, t1, t2) token_set comparison strings from distinct sorted arrays."""
    inter = F.array_sort(F.array_intersect(ta, tb))
    d_ab = F.array_sort(F.array_except(ta, tb))
    d_ba = F.array_sort(F.array_except(tb, ta))
    t0 = F.array_join(inter, " ")
    t1 = F.array_join(F.concat(inter, d_ab), " ")
    t2 = F.array_join(F.concat(inter, d_ba), " ")
    return t0, t1, t2


def token_set_strings_sql(ta: str, tb: str) -> tuple[str, str, str]:
    inter = f"list_sort(list_intersect({ta}, {tb}))"
    d_ab = f"list_sort(list_filter({ta}, x -> NOT list_contains({tb}, x)))"
    d_ba = f"list_sort(list_filter({tb}, x -> NOT list_contains({ta}, x)))"
    # NULL-preserving empty-list guard (round-9 hostile-names finding):
    # DuckDB array_to_string([]) is NULL (Spark: '') — an empty intersection
    # is routine, and with an empty-token name on one side all three strings
    # went NULL, silently NULLing the token_set score in the oracle only.
    # A NULL ARRAY input (NULL name) must stay NULL, matching Spark's
    # array_intersect/array_join propagation (the NULL-corpus contract).
    null_in = f"({ta} IS NULL OR {tb} IS NULL)"
    t0 = f"(CASE WHEN {null_in} THEN NULL ELSE coalesce(array_to_string({inter}, ' '), '') END)"
    t1 = (
        f"(CASE WHEN {null_in} THEN NULL ELSE "
        f"coalesce(array_to_string(list_concat({inter}, {d_ab}), ' '), '') END)"
    )
    t2 = (
        f"(CASE WHEN {null_in} THEN NULL ELSE "
        f"coalesce(array_to_string(list_concat({inter}, {d_ba}), ' '), '') END)"
    )
    return t0, t1, t2


def _prefix_lev_ratio_spark(short: Column, full: Column) -> Column:
    """lev_ratio specialized to ``short`` being a PREFIX of ``full``:
    levenshtein(s, s+u) is exactly len(u) (insertions achieve it; the length
    difference lower-bounds any edit script), so the ratio collapses to
    floor(100·len(short)/len(full)) with the same empty/NULL handling as
    ``lev_ratio_spark``. By `token_set_strings_spark`'s construction t0 is
    always a prefix of t1 and of t2 (t1/t2 = t0 ++ ' ' ++ diff), so two of
    the three token_set levenshteins are O(1) length arithmetic — the same
    shortcut rapidfuzz's own token_set implementation uses (r12, guide §1.2
    step 2: per-task work). Value-identical to the full levenshtein form —
    the DuckDB oracle keeps that form and parity pins the equality."""
    ls, lf = F.length(short), F.length(full)
    return (
        F.when(lf == 0, F.lit(100)).otherwise(F.floor(100 * ls / lf)).cast("int")
    )


def token_set_ratio_spark(t0: Column, t1: Column, t2: Column) -> Column:
    return F.greatest(
        _prefix_lev_ratio_spark(t0, t1),
        _prefix_lev_ratio_spark(t0, t2),
        lev_ratio_spark(t1, t2),
    )


def token_set_ratio_sql(t0: str, t1: str, t2: str) -> str:
    return (
        f"greatest({lev_ratio_sql(t0, t1)}, {lev_ratio_sql(t0, t2)}, "
        f"{lev_ratio_sql(t1, t2)})"
    )


# ── jaccard percent over token arrays (entity_matching.py:155-170) ──────────


def jaccard_pct_spark(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union == 0, F.lit(0)).otherwise(F.floor(100 * inter / union)).cast("int")


def jaccard_pct_sql(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    union = f"(len({a}) + len({b}) - {inter})"
    return (
        f"(CASE WHEN {union} = 0 THEN 0 ELSE floor(100 * {inter} / {union}) END)::INT"
    )
