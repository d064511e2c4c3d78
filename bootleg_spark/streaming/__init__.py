"""Structured Streaming ingest (engine extension — the reference is
batch-only, SURVEY.md §2.11)."""
