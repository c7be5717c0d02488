"""Shared measurement harness for the scripts/loadtest_* family —
extracted in round 10 (review finding: five verbatim copies of
emit/run_once/measure/stage_dir had started to diverge).

Method (the PLANS.md rolled/offset-replica tables): a staged directory
symlinks every table except the replicated one; 1x is warmed once and
timed best-of-2; Nx is ALSO warmed once before its timed run (the
original copies timed Nx cold — parquet footer reads and first-touch
codegen inflated the reported scaling ratio; ratios recorded before
round 10 are therefore conservative upper bounds)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceindexer_spark.catalog import QUERIES  # noqa: E402

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


def emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def run_once(spark, name: str, sf_dir: str) -> tuple[float, int]:
    """One builder-inclusive timed run, staging-COLD (bench.py
    semantics: memoized staged relations re-pay their build, so a
    staged query is never accidentally timed as a cache read)."""
    from mapreduceindexer_spark import staging

    staging.clear()
    t0 = time.perf_counter()
    n = QUERIES[name][0](spark, sf_dir).count()
    return time.perf_counter() - t0, n


def measure(spark, name, src, big, rep, rows_key: str = "rows") -> None:
    run_once(spark, name, src)  # 1x warm-up
    (ta, n1), (tb, _) = run_once(spark, name, src), run_once(spark, name, src)
    t1 = min(ta, tb)
    emit(query=name, scale="1x", sec=round(t1, 2), **{rows_key: n1})
    run_once(spark, name, big)  # Nx warm-up (see module docstring)
    tN, nN = run_once(spark, name, big)
    emit(query=name, scale=f"{rep}x", sec=round(tN, 2), **{rows_key: nN},
         ratio=round(tN / max(t1, 1e-9), 1))


def stage_dir(src: str, replaced: str, prefix: str) -> str:
    """A temp sf-dir where every table but ``replaced`` symlinks the
    source; the caller writes the replicated ``replaced`` table."""
    out = tempfile.mkdtemp(prefix=prefix)
    for t in ALL_TABLES:
        if t != replaced:
            os.symlink(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    return out
