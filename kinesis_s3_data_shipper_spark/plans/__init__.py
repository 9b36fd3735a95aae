"""Query registry: every operator as a named (spark_fn, oracle_sql) pair."""

from .base import QuerySpec, REGISTRY, register, all_queries, all_oracles  # noqa: F401
