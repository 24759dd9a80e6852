"""Pipeline plans — SURVEY.md §2.10 (D1-D4)."""
