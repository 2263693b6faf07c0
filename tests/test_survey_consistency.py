"""SURVEY.md §2 is the graded coverage contract — it must match the
registry exactly: every checklist operator exists in queries(), every
[oracle] item has oracle SQL, and no registered operator is missing
from the checklist."""

from __future__ import annotations

import re

from fdblog2clickhouse_spark import operators

SURVEY = "/root/repo/SURVEY.md"


def _survey_items() -> dict[str, str]:
    text = open(SURVEY).read()
    sec2 = text.split("## §2", 1)[1].split("\n## §3", 1)[0]
    items: dict[str, str] = {}
    for m in re.finditer(r"- \[x\] `([a-z0-9_]+)` \[(oracle|rows-only)\]", sec2):
        items[m.group(1)] = m.group(2)
    return items


def test_survey_matches_registry():
    items = _survey_items()
    queries = operators.all_queries()
    oracle = operators.all_oracle_sql()

    missing_in_registry = set(items) - set(queries)
    assert not missing_in_registry, f"SURVEY lists unimplemented ops: {missing_in_registry}"

    missing_in_survey = set(queries) - set(items)
    assert not missing_in_survey, f"registered ops missing from SURVEY §2: {missing_in_survey}"

    for name, kind in items.items():
        if kind == "oracle":
            assert name in oracle, f"{name} marked [oracle] but has no oracle SQL"
        else:
            assert name not in oracle, f"{name} marked [rows-only] but has oracle SQL"
