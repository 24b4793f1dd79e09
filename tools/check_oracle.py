#!/usr/bin/env python
"""Run the full Spark-vs-DuckDB oracle sweep (the local t2 gate).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscale_vector_search_spark.session import get_spark  # noqa: E402
from webscale_vector_search_spark.testing import run_all  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    results = run_all(get_spark("oracle-check"), sf_dir, names)
    bad = 0
    for r in results:
        print(r)
        bad += not r.ok
    print(f"{len(results) - bad}/{len(results)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
