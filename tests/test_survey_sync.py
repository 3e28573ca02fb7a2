"""SURVEY.md §2 ↔ registry consistency: every documented `query key` row
must be registered, every `sql` row must carry an oracle twin, and every
registered query must appear in SURVEY §2 — the coverage table can never
drift from the code."""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entrymod

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _survey_rows() -> dict[str, str]:
    """{query_key: oracle_kind} parsed from §2's tables."""
    text = SURVEY.read_text()
    sec2 = text.split("## §2", 1)[1].split("\n## §3", 1)[0]
    out: dict[str, str] = {}
    for line in sec2.splitlines():
        m = re.match(r"\|\s*[A-N]\d+b?\s*\|\s*`([a-z0-9_]+)`\s*\|.*\|\s*([a-z-]+[^|]*)\|\s*$", line)
        if m:
            out[m.group(1)] = m.group(2).strip()
    return out


def test_survey_rows_are_registered():
    rows = _survey_rows()
    assert len(rows) > 100, f"§2 parse looks broken: only {len(rows)} rows"
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    missing = [k for k in rows if k not in qs]
    assert not missing, f"SURVEY §2 rows not registered: {missing}"
    no_oracle = [k for k, kind in rows.items() if kind == "sql" and k not in osql]
    assert not no_oracle, f"SURVEY says sql but no oracle twin: {no_oracle}"


def test_registered_queries_are_documented():
    rows = _survey_rows()
    undocumented = [k for k in entrymod.queries() if k not in rows]
    assert not undocumented, f"registered but absent from SURVEY §2: {undocumented}"
