"""Company-name normalization (reference parity: entity_matching.py:42-97).

The reference normalizes with uppercase, HTML-entity fixes, abbreviation
expansion (PTY LTD → PROPRIETARY LIMITED, ...), noise-pattern stripping,
punctuation removal, and whitespace collapse. Here the SAME ordered rule
list drives two code generators:

- ``norm_name_spark(col)``  → a pyspark Column (chained ``regexp_replace`` —
  pure JVM expressions, whole-stage-codegen'd, no Python on the hot path)
- ``norm_name_sql(expr)``   → the equivalent DuckDB SQL expression

so the engine and the correctness oracle can never drift.

Intentional reference divergence (ADVICE r11): the PRE_CLEAN tier-0 strip
(see its comment) replaces every non-ASCII character with a space BEFORE
upper(), so full-case-mapping characters that the reference's Python
``.upper()`` would expand are stripped instead — reference 'Straße' →
'STRASSE' / 'ﬁnancial' → 'FINANCIAL', here 'STRA E' / 'NANCIAL'. This is
deliberate: Java's full case mapping and Unicode-aware ``\\b`` cannot be
reproduced in DuckDB/RE2, and cross-engine (Spark ≡ oracle) parity on the
ASCII working set — the reference corpus's actual alphabet (Australian
company registry names) — is the contract this module keeps. Callers who
need reference-equivalent output on non-ASCII input must expand ß/ligatures
before normalizing.
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

#: Tier-0 pre-strip (round-11 unicode_mixed regime): everything outside the
#: ASCII working set becomes a space BEFORE upper() and before any rule runs.
#: Two cross-engine primitives diverge on non-ASCII input and both are
#: unreachable after this strip:
#: - Java's ``\b`` is Unicode-word-aware (a combining mark or accented
#:   letter abutting "A" suppresses the boundary) while RE2's is ASCII, so
#:   ``\b(THE|A|AN)\b`` / ``\bPTY\b`` matched differently next to marks;
#: - Java's upper() applies FULL case mapping (U+FB01 "ﬁ" → "FI", ß → "SS")
#:   while DuckDB's is simple (ligatures pass through and die in cleanup).
#: The kept set is exactly the characters later rules consume: the final
#: [A-Z0-9 ] alphabet plus ()/[] (noise-pattern content), &+; (HTML-entity
#: and ampersand expansion). For inputs already inside the working set the
#: pipeline is unchanged — replacing ASCII punctuation with spaces earlier
#: cannot alter any later match, since every such character is a non-word
#: boundary character in both engines, exactly like the space it becomes.
PRE_CLEAN = r"[^A-Za-z0-9 ()\[\]&+;]+"


def norm_name_spark(col: Column) -> Column:
    out = F.upper(F.regexp_replace(F.trim(col), PRE_CLEAN, " "))
    for pat, repl in ALL_RULES:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def norm_name_sql(expr: str) -> str:
    out = f"upper(regexp_replace(trim({expr}), '{PRE_CLEAN}', ' ', 'g'))"
    for pat, repl in ALL_RULES:
        # DuckDB single-quoted literals don't treat backslash as an escape,
        # so regex patterns pass through verbatim; only quotes need doubling.
        out = f"regexp_replace({out}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    return f"trim({out})"


# ── page-title → company-name extraction (entity_matching.py:99-120) ────────
# The reference tries four patterns in order (company-suffix at start,
# company-suffix anywhere, name before a -/| separator, bare short name) and
# accepts the first whose captured group is ≥3 chars and not digits/dashes
# only; otherwise it returns the title unchanged. All patterns are evaluated
# case-insensitively (re.IGNORECASE), expressed here with an inline (?i) so
# Java regex (Spark) and RE2 (DuckDB) read the identical pattern. Every
# construct used (anchors, alternation, classes, bounded repeats) has the
# same semantics in both engines.

TITLE_PATTERNS: list[str] = [
    r"^([A-Z][a-zA-Z\s&]+(?:PTY|LTD|LIMITED|COMPANY|CORP|INC))",
    r"([A-Z][a-zA-Z\s&]+(?:PTY|LTD|LIMITED|COMPANY|CORP|INC))",
    r"^([A-Z][a-zA-Z\s&]{3,20})\s*[-|]",
    r"^([A-Z][a-zA-Z\s&]{3,30})$",
]

_CAND_JUNK = r"^[0-9_\-\s]+$"  # candidate rejected if digits/dashes only


def title_company_spark(col: Column) -> Column:
    """First-accepted-pattern company name from a page title, else the title."""
    cands = []
    for pat in TITLE_PATTERNS:
        c = F.trim(F.regexp_extract(col, f"(?i){pat}", 1))
        ok = (c != "") & (F.length(c) >= 3) & ~c.rlike(_CAND_JUNK)
        cands.append(F.when(ok, c))
    return F.coalesce(*cands, col)


def title_company_sql(expr: str) -> str:
    cands = []
    for pat in TITLE_PATTERNS:
        c = f"trim(coalesce(regexp_extract({expr}, '(?i){pat}', 1), ''))"
        cands.append(
            f"CASE WHEN {c} <> '' AND length({c}) >= 3 "
            f"AND NOT regexp_matches({c}, '{_CAND_JUNK}') THEN {c} END"
        )
    return f"coalesce({', '.join(cands)}, {expr})"


# ── company-name validity filter (entity_matching.py:121-141) ───────────────
# Drops web-noise "names" before matching: too short, no letters, digits/
# dashes only, starting with crawl-noise words (LOGIN, RSS, ...), or exact
# junk page titles. The reference uses re.match, i.e. every pattern is
# implicitly anchored at the start — written here with an explicit ^.

_INVALID_NAME_PATTERNS: list[str] = [
    r"^[0-9_\-\s]+$",
    r"^[^a-zA-Z]*$",
    r"(?i)^(PHOTOGRAPHER|WEDDING|COAST|BREEDS|CATALOG|PORTAL|LOGIN|CONTACT)",
    r"(?i)^(RSS|FEED|BLOG|NEWS|ARTICLE)",
    r"(?i)^(RE:|LOG\s+IN|CONTACT\s+US)$",
]


def valid_name_spark(col: Column) -> Column:
    ok = col.isNotNull() & (F.length(F.trim(col)) >= 3)
    for pat in _INVALID_NAME_PATTERNS:
        ok = ok & ~col.rlike(pat)
    return ok


def valid_name_sql(expr: str) -> str:
    parts = [f"{expr} IS NOT NULL", f"length(trim({expr})) >= 3"]
    parts += [
        f"NOT regexp_matches({expr}, '{pat}')" for pat in _INVALID_NAME_PATTERNS
    ]
    return "(" + " AND ".join(parts) + ")"
