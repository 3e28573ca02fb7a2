"""Company-name normalization (reference parity: entity_matching.py:42-97).

The reference normalizes with uppercase, HTML-entity fixes, abbreviation
expansion (PTY LTD → PROPRIETARY LIMITED, ...), noise-pattern stripping,
punctuation removal, and whitespace collapse. Here the SAME ordered rule
list drives two code generators:

- ``norm_name_spark(col)``  → a pyspark Column (chained ``regexp_replace`` —
  pure JVM expressions, whole-stage-codegen'd, no Python on the hot path)
- ``norm_name_sql(expr)``   → the equivalent DuckDB SQL expression

so the engine and the correctness oracle can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order, case-insensitive, on the UPPERed
# string. Patterns restricted to the regex subset Java and RE2 share.
ABBREV_RULES: list[tuple[str, str]] = [
    (r"&AMP;", " AND "),
    (r"&", " AND "),
    (r"\+", " AND "),
    (r"\bPTY\s*LTD\b", "PROPRIETARY LIMITED"),
    (r"\bPTY\b", "PROPRIETARY"),
    (r"\bLTD\b", "LIMITED"),
    (r"\bCO\b", "COMPANY"),
    (r"\bCORP\b", "CORPORATION"),
    (r"\bINC\b", "INCORPORATED"),
]

NOISE_RULES: list[tuple[str, str]] = [
    (r"\b(THE|A|AN)\b", " "),
    (r"\([^)]*\)", " "),
    (r"\[[^\]]*\]", " "),
]

CLEANUP_RULES: list[tuple[str, str]] = [
    (r"[^A-Z0-9 ]+", " "),
    (r"\s+", " "),
]

ALL_RULES = ABBREV_RULES + NOISE_RULES + CLEANUP_RULES


def norm_name_spark(col: Column) -> Column:
    out = F.upper(F.trim(col))
    for pat, repl in ALL_RULES:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def norm_name_sql(expr: str) -> str:
    out = f"upper(trim({expr}))"
    for pat, repl in ALL_RULES:
        # DuckDB single-quoted literals don't treat backslash as an escape,
        # so regex patterns pass through verbatim; only quotes need doubling.
        out = f"regexp_replace({out}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    return f"trim({out})"
