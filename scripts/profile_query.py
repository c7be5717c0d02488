"""Per-query profiler: split builder-side work from the sink action and
count Spark jobs in each phase.

Usage:  python scripts/profile_query.py q_name [q_name ...]
        (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as for bench.py)

For each query: clears the staging registry, times the BUILDER call
(fixture construction, localCheckpoints, table commits) and the noop
SINK separately, and reports how many Spark jobs each phase ran (job
groups via setJobGroup). Run twice per query: the first pass is the
warm-up, the second is reported. This is the measure-first tool of the
optimization rounds — per-job overhead at local scale is ~50-200 ms,
so a query whose builder runs 12 jobs is paying more scheduling than
compute and the fix is fewer passes, which is also the 100 TB fix.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py q_name [q_name ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduceindexer_spark import staging
    from mapreduceindexer_spark.catalog import QUERIES
    from mapreduceindexer_spark.session import get_spark

    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext

    def jobs_in(group: str) -> int:
        return len(sc._jsc.sc().statusTracker().getJobIdsForGroup(group))

    def one(name: str, tag: str) -> tuple[float, float, int, int]:
        staging.clear()
        gb = f"{name}-builder-{tag}"
        gs = f"{name}-sink-{tag}"
        sc.setJobGroup(gb, gb)
        t0 = time.perf_counter()
        df = QUERIES[name][0](spark, sf_dir)
        t1 = time.perf_counter()
        sc.setJobGroup(gs, gs)
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        sc._jsc.sc().clearJobGroup()
        return t1 - t0, t2 - t1, jobs_in(gb), jobs_in(gs)

    for name in names:
        one(name, "warm")  # warm-up (codegen, footers)
        b, s, jb, js = one(name, "meas")
        print(
            f"{name}: builder {b:6.3f}s ({jb:3d} jobs)   "
            f"sink {s:6.3f}s ({js:3d} jobs)   total {b + s:6.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
