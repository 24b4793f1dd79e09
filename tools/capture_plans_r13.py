#!/usr/bin/env python
"""Capture .explain("formatted") for every declared query into plans/r13/.

Usage: python tools/capture_plans_r13.py <suffix: before|after> [sf_dir] [query ...]

The optimization-round evidence artifact: <query>_<suffix>.txt per declared
query (the judge checks plan claims in OPTIMIZATION_r13.md against these).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscale_vector_search_spark.queries import QUERIES  # noqa: E402
from webscale_vector_search_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:] or list(QUERIES)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture-r13")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of aborting the sweep
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- {name} ({suffix}) @ {sf_dir}\n\n{plan}")
        print(f"captured {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
