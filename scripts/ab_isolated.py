"""Isolated canary-normalized A/B — the PLANS.md bench-regression
method (rounds 7, 9, 10), as a script instead of a per-session
rewrite.

When a driver bench entry spikes, the first question is whether the
SESSION was slow (shared-JVM churn, ambient load) or the CODE is. This
runs the suspect queries in a dedicated fresh JVM (staging cleared
before every measured run, 2 warm-ups, best-of-3 + median) alongside a
fixed canary set of untouched plans; compare the canaries against
their recorded BENCH_DETAIL values to get the session's speed factor,
then normalize the suspects by it before concluding anything.

Usage:
  python scripts/ab_isolated.py q_ann_hnsw_build q_shortest_path ...
  (no args: canaries only)

Graph-ANN *_build pseudo-entries (q_ann_graph_build, q_ann_hnsw_build)
are supported: they time the cold staged-edge construction exactly as
bench.py does. JSON lines to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANARIES = ["q_postings", "q_hll", "q_bloom", "q_sparse_cosine"]


def main() -> None:
    targets = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduceindexer_spark import staging
    from mapreduceindexer_spark.catalog import (
        QUERIES,
        _hnsw_edges_staged,
        _nsw_edges_staged,
    )
    from mapreduceindexer_spark.session import get_spark

    import bench

    spark = get_spark(app_name="ab-isolated")
    builds = {
        "q_ann_graph_build": lambda: _nsw_edges_staged(spark, sf_dir),
        "q_ann_hnsw_build": lambda: _hnsw_edges_staged(spark, sf_dir),
    }
    # Entries bench.py measures WARM (probes over a pre-built index):
    # this script measures everything COLD, so their vs_detail is
    # build-inclusive and NOT comparable — flagged per row below.
    warm_in_bench = set(bench.ANN_GRAPH_PROBES) | set(bench.ANN_HNSW_PROBES)
    bad = [n for n in targets if n not in builds and n not in QUERIES]
    if bad:
        sys.exit(
            f"unknown entries {bad}; valid: any registered query or "
            f"the build pseudo-entries {sorted(builds)}"
        )

    def one(name: str) -> float:
        staging.clear()
        t0 = time.perf_counter()
        if name in builds:
            builds[name]()
        else:
            QUERIES[name][0](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        return time.perf_counter() - t0

    def steady(name: str) -> tuple[float, float]:
        one(name)
        one(name)
        s = sorted(one(name) for _ in range(3))
        return round(s[0], 3), round(s[1], 3)

    detail = {}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_DETAIL.json")
        ) as fh:
            detail = json.load(fh).get("queries", {})
    except Exception:
        pass

    for name in CANARIES + targets:
        best, med = steady(name)
        row = {"query": name, "best": best, "median": med,
               "kind": "canary" if name in CANARIES else "target"}
        if name in detail:
            row["bench_detail"] = detail[name]
            row["vs_detail"] = round(best / max(detail[name], 1e-9), 2)
            if name in warm_in_bench:
                row["caveat"] = (
                    "bench measures this entry WARM over a staged "
                    "index; this cold number includes the build — "
                    "vs_detail is not a like-for-like comparison"
                )
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
