#!/usr/bin/env python
"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Timing is wall-clock per query over a full materialization so the
whole plan executes. Two warm-up passes precede the timed pass:
sf0.001 (JVM boot, parquet footers) and one untimed pass at the
TARGET sf. The second is load-bearing: AQE picks different physical
plans at tiny scale (broadcast joins where the target scale
sort-merges), so an sf0.001-only warmup leaves the target-scale
generated classes cold — five sf0.001 warmups of p09 recover none of
its first-sf0.1-run cost, while one target-SF pass recovers most of
it for every query (q33: 0.84s → 0.24s).

Known residue, chased to ground in round 4 (the r3 "p09 bench
anomaly"): p09 is NOT session aging. Its per-run cost is (a) plan
construction — hundreds of py4j round-trips building the signature/
band/vote expressions, cut 0.87s → 0.4s by batching them into parsed
F.expr strings (bit-identical values), and (b) execution, whose
large codegen'd signature method keeps JIT-tiering for ~6
invocations (2.46 → 1.52s across consecutive runs in one session).
After the two warmups p09 still reports ~1.9s vs ~1.5s fully tiered;
buying the last 0.3-0.4s would take ~4 more warmup passes of the
whole suite — JIT ramp, not plan cost, and the plan is the
scale-right one (SMJ keeping AQE skew-split available).

Host-noise caveat (measured round 4): IDENTICAL code on an idle guest
measured 7.32s, 9.47s, 9.77s, and 12.09s across one session — the
guest's loadavg spiked with no local CPU consumers, i.e. hypervisor
host contention invisible from inside the VM. Run-to-run deltas under
~1.7x are environment, not regressions; compare per-query RATIOS
across a single run when judging plan changes.
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

    # Warm-up: once at the smallest SF (JVM boot), then once UNTIMED at
    # the target SF — AQE's plan shapes (and thus the generated classes
    # C2 compiles) differ by scale, so only a target-scale pass warms
    # the code the timed pass runs (see module docstring for numbers).
    for n in names:
        queries[n].spark(spark, "/root/testdata/sf0.001").count()
    for n in names:
        queries[n].spark(spark, sf_dir).count()

    # Three timed passes; report the per-query MEDIAN (robust against
    # the documented hypervisor-contention spikes) plus the min/max
    # spread so host-noise claims stay auditable from the artifact
    # itself rather than asserted from memory.
    n_iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_iters):
        for n in names:
            t0 = time.perf_counter()
            df = queries[n].spark(spark, sf_dir)
            df.count()
            runs[n].append(time.perf_counter() - t0)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    timings = {n: round(median(v), 4) for n, v in runs.items()}
    spread = {n: [round(min(v), 4), round(max(v), 4)] for n, v in runs.items()}

    out = {
        "metric": "headline query wall-clock at sf "
        f"{sf} on local[{cpus}] (sum of per-query medians over "
        f"{n_iters} passes, {len(names)} queries)",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "iterations": n_iters,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
