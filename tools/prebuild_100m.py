#!/usr/bin/env python
"""One-time cache warm-up for the 100M stretch tier (VERDICT r7 #7):
forces the ~1 h IVF build bench._ann_100m otherwise skips on a cold cache.
The build runs through _ann_100m itself, so the cache key and every config
detail stay identical to what the bench measures."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_ANN_100M"] = "1"

from bench import _ann_100m  # noqa: E402


def main() -> None:
    from webscale_vector_search_spark.session import get_spark

    spark = get_spark("wvss-prebuild-100m")
    cache_dir = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/wvss_bench_ann_v3")
    timings, meta = _ann_100m(spark, cache_dir)
    import json

    print(json.dumps({"timings": timings, "meta": meta}, default=str), flush=True)


if __name__ == "__main__":
    main()
