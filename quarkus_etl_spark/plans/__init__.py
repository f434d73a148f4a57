"""Plan inspection & tuning helpers (SURVEY.md §4): pushdown/broadcast
assertions for tests, and partitioning guards for compute-heavy operators."""

from .tuning import ensure_parallelism  # noqa: F401
