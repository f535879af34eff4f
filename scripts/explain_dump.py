"""Dump .explain("formatted") for named queries to plans/$SPARK_GRAFT_PLANS_ROUND/
(default r13).

Usage: python scripts/explain_dump.py <suffix> q95_pagerank [more...]
       [--sf /root/testdata/sf0.1]

Writes plans/r12/<query>_<suffix>.txt for each query. Query functions
with driver-side build steps (k-means seeds, PQ training) EXECUTE those
jobs during plan construction — expect some runtime. Must run with
cwd=/root/repo.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    suffix, names = args[0], args[1:]

    from openstack_billing_from_db_spark.registry import all_queries
    from openstack_billing_from_db_spark.session import get_spark

    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    queries = all_queries()
    spark = get_spark(app_name=f"explain_{suffix}")
    os.makedirs(f"plans/{rnd}", exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/{rnd}/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
