"""Event-time / temporal operators (SURVEY.md §2.4 X8) — filled in below."""
