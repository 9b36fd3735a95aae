"""Composed DataFrame operators Spark lacks natively.

Preference order per the engine's design rules: (1) composition of
built-in ops (asof, sessionize, dedup, similarity are all built this
way — JVM-side, shuffle-aware); (2) Arrow-batched pandas UDFs
(multimodal decode plumbing); (3) mapPartitions (not needed so far).
"""

from .asof import asof_join  # noqa: F401
from .sessionize import sessionize  # noqa: F401
