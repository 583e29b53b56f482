"""Structured Streaming layer — the reference's service loop (EP1)
re-expressed as a checkpointed streaming query (SURVEY.md §2.4/§3)."""
