"""Extraction / linking / graph / pipeline operators (SURVEY.md §2A)."""
