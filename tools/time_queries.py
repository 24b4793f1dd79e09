#!/usr/bin/env python
"""Time declared queries with the noop sink (guide §1.4) — min-of-N after a
warm-up, one JSON line per query. For optimization-round A/B receipts.

Usage: python tools/time_queries.py <sf_dir> <runs> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscale_vector_search_spark.queries import QUERIES  # noqa: E402
from webscale_vector_search_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("wvss-time-queries")
    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
