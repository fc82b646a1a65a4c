"""Structured Streaming operators (SURVEY.md §2.8 ST1-ST5)."""
