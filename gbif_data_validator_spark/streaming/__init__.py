"""Structured Streaming variants of the validation passes.

The reference is a batch job server (no streaming operators — SURVEY.md
§2.5); this module extends the engine to continuous ingestion, the natural
production shape for a crawl pipeline: validate page batches as they land,
maintain windowed issue-rate aggregations with watermarked late-data
handling, and alert on drift.
"""
