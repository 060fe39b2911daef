#!/usr/bin/env python
"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Timing is wall-clock per query over a full materialization
(count + one-row collect) so the whole plan executes; a warm-up pass
on sf0.001 first amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from csvb_spark.session import get_session
    from csvb_spark.queries import corpus

    spark = get_session(
        app_name="csvb_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    names = [n for n, q in sorted(corpus().items()) if q.headline]
    queries = corpus()

    # Warm-up: run every headline query once at the smallest SF so JVM
    # JIT / codegen / parquet footer caching never pollutes a timing.
    for n in names:
        queries[n].spark(spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        df = queries[n].spark(spark, sf_dir)
        df.count()
        timings[n] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline query wall-clock at sf "
        f"{sf} on local[{cpus}] (sum over {len(names)} queries)",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
