"""String derivations from the reference's enrichment/tagging logic.

The reference derives a ``logStreamPrefix`` tag as the first two
``/``-segments of a logStream path (kinesis-to-humio.py:137,
``'/'.join(logStream.split('/')[0:2])``). Python slicing makes the
edge semantics: no slash → whole string; one slash → whole string;
trailing slash → 'a/b/' stays 'a/b' only if b nonempty, 'a/' → 'a/'
(second segment is the empty string, joined as 'a/'). We reproduce
those exactly with JVM built-ins (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stream_prefix(col: Column | str) -> Column:
    """First two '/'-segments of a path, re-joined with '/'.

    Exactly ``'/'.join(s.split('/')[0:2])`` including empty-segment
    edge cases, because Spark's ``slice`` past the array end truncates
    just like Python list slicing, and ``array_join`` keeps empty
    strings (unlike ``concat_ws``, which would drop them — wrong for
    a trailing-slash input like ``'a/'``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.slice(F.split(c, "/", -1), 1, 2), "/")


#: DuckDB spelling of the same derivation (kept adjacent on purpose).
#: list_slice clamps like Python; array_to_string keeps empty strings.
SQL_STREAM_PREFIX = "array_to_string(string_split({col}, '/')[1:2], '/')"


def sql_stream_prefix(col_expr: str) -> str:
    return SQL_STREAM_PREFIX.format(col=col_expr)
