"""Structured Streaming operators (streaming twins of the batch
analytics; the reference pipeline is batch-only — SURVEY.md §2.10)."""
