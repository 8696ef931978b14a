"""Placeholder — populated by later milestone (SURVEY.md §7)."""
