"""Structured Streaming operator layer (SURVEY.md §2B.9)."""
