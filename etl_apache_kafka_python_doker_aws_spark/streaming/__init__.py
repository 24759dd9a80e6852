"""Structured Streaming operators — SURVEY.md §2.8 (T1-T10)."""
