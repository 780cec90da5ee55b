"""The declared correctness-query ledger (SURVEY.md §2.3)."""

from cosmap_spark.queries.registry import all_oracles, all_queries, query  # noqa: F401
