"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/explain_dump.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (e.g. suffix
"before"/"after" for the optimization-round plan evidence).

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the same
scale the bench times — without executing the query (explain only), so
AQE nodes show the initial plan; join strategies and exchange counts are
what the planner chose for the bench's statistics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from udacitydatawarehouseprj_spark import queries as Q  # noqa: E402
from udacitydatawarehouseprj_spark import session as S  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = S.get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"{name}: wrote {path} ({n_exchange} Exchange)")


if __name__ == "__main__":
    main()
