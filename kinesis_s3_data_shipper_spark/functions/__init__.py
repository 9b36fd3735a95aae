"""Deterministic scalar/text/vector helpers (JVM built-ins first)."""

from .decimal_safe import dec, dsum, davg  # noqa: F401
from .strings import stream_prefix  # noqa: F401
