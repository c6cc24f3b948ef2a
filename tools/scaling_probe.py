"""Diagnose WHERE a query's wall-clock goes at the current core count.

For each named query: run it once warm (cache-steady), then once timed
inside a dedicated job group, and report wall seconds plus the number of
Spark jobs, stages and tasks the action scheduled (statusTracker — works
with the UI disabled). A query whose c8/c32 bench ratio is < 1 is either
(a) scheduling many tiny tasks/AQE waves (tasks ≫ rows warrant) or
(b) paying per-job fixed overhead × many jobs (broadcast builds etc.);
the two need different fixes, and this tells them apart.

Usage: SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py <query> [...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from udacitydatawarehouseprj_spark import queries as Q  # noqa: E402
from udacitydatawarehouseprj_spark import session as S  # noqa: E402
from udacitydatawarehouseprj_spark.operators import dedup  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = S.get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()

    def run_one(df):
        df.write.format("noop").mode("overwrite").save()

    run_one(registry["agg_count_star"](spark, sf_dir))
    spark.range(0, 1000, 1, int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    st = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        # warm pass: shared-cache builds + codegen land here
        run_one(registry[name](spark, sf_dir))
        dedup.release_caches()
        group = f"probe-{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        run_one(registry[name](spark, sf_dir))
        sec = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        dedup.release_caches()
        job_ids = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "sec": round(sec, 3),
            "jobs": len(job_ids),
            "stages_run": n_stages,
            "tasks": n_tasks,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
