"""One-time tenant setup utilities (reference parity: A-24,
utility_sp_grant_siteselected.py) — control-plane scripts, not query
operators (SURVEY.md §2 A-24 scoping)."""
