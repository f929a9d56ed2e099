"""Structured Streaming aggregation layer (beyond-reference capability,
see SURVEY.md §2.9 — the reference is strictly batch)."""
