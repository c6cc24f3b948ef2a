"""Isolated-session single-query probe — the measurement primitive the
record-splice discipline (tools/bench_guard.py --record) and the sf100
ledger (SCALE.md) both use: ONE query, ONE fresh process, bench-style
warmup, N back-to-back repeats, one JSON line.

Why a separate process per query: round 10 found a shared tier session
contaminates successors (a released-late shared cache pushed an
unrelated query from ~2 s to 34–51 s in the same JVM), and round 11
found record medians poisoned by box state covering all three in-run
repeats. The honest re-measurement for a flagged median is a fresh
quiesced process, which this script is.

Usage:
  python tools/isolated_probe.py QUERY [SF_DIR] [REPEATS]
  # defaults: SF_DIR=/root/testdata/sf0.1, REPEATS=3

Output: {"query": ..., "sf_dir": ..., "runs": [...], "median": ...,
         "spread": ..., "anchor_sec": ...}
The anchor (bench._anchor_workload — the dedicated synthetic shuffle
anchor — timed once after warmup AND one unmeasured warm pass, so it
samples the same steady-state quantity bench.py samples) records the
session floor so the probe itself is auditable against box state.
Splice probe outputs into a record candidate with
tools/splice_record.py (median AND spread as a unit).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from udacitydatawarehouseprj_spark import queries as Q  # noqa: E402
from udacitydatawarehouseprj_spark import session as S  # noqa: E402
from udacitydatawarehouseprj_spark.operators import dedup  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = S.get_spark("isolated-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()

    # same unmeasured warmup as bench.py: JVM/codegen + Arrow workers
    bench.run_one(registry["agg_count_star"](spark, sf_dir))
    spark.range(0, 1000, 1, int(
        spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # One unmeasured anchor pass first (round-12 advice: bench.py
    # discards the anchor's compile cost before sampling; the probe
    # must sample the same steady-state quantity or cross-tool floor
    # comparisons like SCALE.md's are apples-to-oranges).
    bench._time_anchor(spark)
    anchor_sec = bench._time_anchor(spark)

    runs: list[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        bench.run_one(registry[name](spark, sf_dir))
        runs.append(round(time.perf_counter() - t0, 3))
        dedup.release_caches()
    srt = sorted(runs)
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "runs": runs,
        "median": round(statistics.median(runs), 3),
        "spread": round(srt[-1] - srt[0], 3),
        "anchor_sec": anchor_sec,
    }))


if __name__ == "__main__":
    main()
