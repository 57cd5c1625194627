"""Structured Streaming ingest & stateful semantics (SURVEY.md §2.9)."""
