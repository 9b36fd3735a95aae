#!/usr/bin/env python3
"""Diff two full-sweep records' per-query spark_sec timings.

The registry-wide timing record (r09 verdict ask #3) lives in
CORRECTNESS_LOCAL*.json as each query's ``spark_sec`` — single-shot,
warm-session numbers, so individual deltas are noisy; this tool exists
to catch the ORDER-OF-MAGNITUDE regressions the 63-query headline
bench cannot see (a non-headline query going 0.3 s -> 6 s).  Movers
are flagged only above BOTH a ratio and an absolute floor, mirroring
the bench-comparison protocol (a 0.05 s -> 0.2 s "4x" is noise).

Usage: python scripts/compare_sweeps.py OLD.json NEW.json [ratio] [floor_sec]
       (defaults: ratio 3.0, floor 0.75 s on the slower side)
Exit code 1 if any mover is flagged, so a round script can gate on it.
"""
from __future__ import annotations

import json
import sys


def movers(old: dict, new: dict, ratio: float, floor: float) -> list[dict]:
    out = []
    for name, rec in new.items():
        if name.startswith("_") or not isinstance(rec, dict):
            continue
        t_new = rec.get("spark_sec")
        t_old = (old.get(name) or {}).get("spark_sec") \
            if isinstance(old.get(name), dict) else None
        if t_new is None or t_old is None or min(t_new, t_old) <= 0:
            continue
        r = t_new / t_old
        if (r >= ratio or r <= 1 / ratio) and max(t_new, t_old) >= floor:
            out.append({"query": name, "old_sec": t_old, "new_sec": t_new,
                        "ratio": round(r, 2)})
    out.sort(key=lambda m: -max(m["ratio"], 1 / m["ratio"]))
    return out


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.75
    flagged = movers(old, new, ratio, floor)
    for m in flagged:
        print(f"MOVER {m['query']}: {m['old_sec']}s -> {m['new_sec']}s "
              f"({m['ratio']}x)")
    n_timed = sum(1 for n, r in new.items()
                  if not n.startswith("_") and isinstance(r, dict)
                  and r.get("spark_sec") is not None)
    print(json.dumps({"movers": len(flagged), "timed_queries": n_timed,
                      "ratio": ratio, "floor_sec": floor}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
