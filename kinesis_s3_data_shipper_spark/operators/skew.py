"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is
the explicit, planner-independent variant for the pathological case —
a single key holding a double-digit percent of the fact table — and
works on any Spark version/mode:

- fact side: add ``_salt = pmod(hash(<unique cols>), n)`` — a
  deterministic spread of each hot key's rows over n sub-keys;
- dim side: explode each row into n copies, one per salt value;
- join on (key, _salt): the hot key's rows now land in n shuffle
  partitions instead of one.

Cost: dim side inflated n× (keep n modest, or salt ONLY the known-hot
keys by filtering). Semantics: identical to the unsalted equi-join,
which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, *, on: str,
                num_salts: int = 8,
                fact_spread_col: str | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join with the key salted ``num_salts`` ways.

    ``fact_spread_col``: a column whose per-row variation spreads the
    salt (a unique id is ideal). Defaults to the key itself plus a
    monotonic id — any deterministic per-row value works; randomness
    is NOT needed and would break reproducibility.
    """
    spread: Column = (F.col(fact_spread_col) if fact_spread_col
                      else F.monotonically_increasing_id())
    f = fact.withColumn("_salt", F.pmod(F.hash(spread), F.lit(num_salts)))
    d = (dim.withColumn("_salt", F.explode(
            F.sequence(F.lit(0), F.lit(num_salts - 1)))))
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")
