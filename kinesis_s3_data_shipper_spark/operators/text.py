"""Text-stream operators that need per-partition state: bounded-
memory heavy-hitter summaries (Misra-Gries). Pure projections and
folds live as expressions in plans/text.py; this module holds the
one text op that is genuinely imperative per partition.
"""

from __future__ import annotations


def misra_gries_candidates(tokens, *, token_col: str = "word",
                           k: int = 200):
    """Per-partition Misra–Gries heavy-hitter summaries (k counters).

    Streams each partition's tokens through the classic MG update
    (increment if tracked; insert if a slot is free; else decrement
    every counter and evict zeros), then emits that partition's
    surviving candidate set. Guarantee (pigeonhole over partitions):
    any token with GLOBAL frequency > n/k has LOCAL frequency
    > n_p/k in at least one partition, and MG never evicts an item
    whose true local frequency exceeds n_p/k — so the union of
    per-partition candidates is a provable superset of the global
    heavy hitters. The union is at most k rows per partition
    regardless of vocabulary size: the memory bound a plain
    per-partition Counter cannot give at 100 TB. (Space-Saving is the
    production variant; identical guarantee and dataflow.)
    """
    from collections.abc import Iterator

    import pandas as pd

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf[token_col]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({token_col: list(counters.keys())})

    return tokens.mapInPandas(mg, f"{token_col} string")
