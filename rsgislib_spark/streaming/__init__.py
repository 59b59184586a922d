"""Structured Streaming surface: incremental (availableNow) ingestion —
additive over the reference, which is strictly batch (SURVEY §2.9)."""
