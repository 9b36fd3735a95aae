"""Registry-wide executed-plan audit — the automated form of the hand
sweep that found the r07 graph-family lineage re-derivation (248
parquet scans in k-core's plan).

For every registered query, build the DataFrame at the given sf_dir
and count, in the FINAL executed plan:
  - parquet scans per source table (a self-join legitimately reads a
    file twice; a count much above the query's join arity means
    consumer branches are re-deriving lineage and the plan needs a
    checkpoint);
  - CartesianProduct / BatchEvalPython occurrences (always findings
    in core queries).

Prints one line per query over the scan threshold plus a JSON summary.
Usage: python scripts/audit_plans.py [sf_dir] [threshold]
"""
from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries
    from kinesis_s3_data_shipper_spark.session import get_session

    all_queries()
    spark = get_session("ksds-plan-audit")
    flagged: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # audit everything; report stragglers
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        per_source: dict[str, int] = {}
        for m in re.finditer(r"Location:.*?(\w+)\.parquet", plan):
            t = m.group(1)
            per_source[t] = per_source.get(t, 0) + 1
        worst = max(per_source.values(), default=0)
        cart = plan.count("CartesianProduct")
        pyeval = plan.count("BatchEvalPython")
        if worst >= threshold or cart or pyeval:
            flagged[name] = {"per_source": per_source,
                             "cartesian": cart, "python": pyeval}
            print(f"FLAG {name}: {per_source}"
                  f" cartesian={cart} python={pyeval}", flush=True)
    print(json.dumps({"flagged": len(flagged), "errors": errors,
                      "threshold": threshold}, sort_keys=True))


if __name__ == "__main__":
    main()
