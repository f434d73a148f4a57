"""Composed operators the Tier-B SQL surface doesn't cover directly:
as-of join, dedup family, similarity search, multimodal columns, synthetic
generation (SURVEY.md §2 Tier C + §4.3)."""
