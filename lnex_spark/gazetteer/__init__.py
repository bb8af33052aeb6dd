"""Gazetteer build stages G1-G7 (SURVEY.md §2A)."""
