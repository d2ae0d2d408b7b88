"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.10); this module exists because a
web-scale ingest is naturally incremental: pages land continuously, and the
extract stage is stateless per page, so it streams as-is."""
