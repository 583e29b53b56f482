"""LLM-training-data pipeline operators (north star) — filled in below."""
