"""Pipeline dataflow operators (SURVEY.md §2.1-§2.3) — filled in below."""
