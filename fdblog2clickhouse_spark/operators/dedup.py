"""Placeholder — filled in per SURVEY.md §7 build plan."""

QUERIES: dict = {}
ORACLE: dict = {}
