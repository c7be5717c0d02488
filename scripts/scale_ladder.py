"""Data-dominated scale probe (optimization round 13, VERDICT r12
item 6): the sf0.1 bench shows most entries running FASTER at 8 cores
than 32 — fixed per-job overhead dominates at that scale, so the bench
cannot demonstrate 100 TB scaling behavior. This ladder re-runs the
heaviest operator shapes on 1x and 10x synthetic inputs at 8 and 32
cores (fresh JVM per cell, like the driver's own scaling block) and
reports the 8-core/32-core wall ratio per scale: data-dominated
operators must move TOWARD the core ratio (4.0) as data grows, which is
the scaling evidence the 100 TB story needs.

Inputs are the sf0.1 fixtures replicated k times with shifted ids —
same distribution, k x the rows; dials that scale with corpus size
(cells = n/200) scale exactly as production would.

Usage:
  python scripts/scale_ladder.py            # full ladder, prints a table
  python scripts/scale_ladder.py --cell 10 32   # one (scale, cpus) cell
  python scripts/scale_ladder.py --scales 1,30 --ops minhash_near_dup
                                            # custom rungs / op subset
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = ["postings_index", "knn_graph_scaled", "hnsw_build_scaled",
       "minhash_near_dup", "commit_partitioned"]


def _replicate(df, k: int, id_col: str):
    """k shifted copies of df: same distribution, k x rows, ids disjoint
    (shift = 10^12 per copy — far above any fixture id). The result is
    parallelism-hardened exactly like the catalog loaders
    (sources/tables.py::ensure_parallelism): the single-row-group test
    parquet yields a 1-split scan, so without it the union has only k
    partitions and every narrow CPU-bound stage (centroid assignment,
    tokenization) measures the INPUT SPLIT count, not the operator."""
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.sources.tables import ensure_parallelism

    if k > 1:
        out = None
        for i in range(k):
            c = df.withColumn(id_col, F.col(id_col) + F.lit(i * 10**12))
            out = c if out is None else out.unionByName(c)
        df = out
    return ensure_parallelism(df)


def run_cell(scale: int, cpus: int, ops: list[str] | None = None) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.session import get_spark

    spark = get_spark(app_name=f"ladder-{scale}x-{cpus}c")
    out: dict[str, float] = {}
    wanted = set(ops) if ops else set(OPS)

    def t(name, fn):
        if name not in wanted:
            return
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 3)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # 1. postings index build over k x documents (wide agg + exchange).
    from mapreduceindexer_spark.operators.index import build_postings

    docs = None
    if wanted & {"postings_index", "minhash_near_dup"}:
        docs = _replicate(
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")),
            scale,
            "doc_id",
        ).localCheckpoint()
    t("postings_index", lambda: noop(build_postings(docs, salt_buckets=16)))

    # 2/3. graph-ANN builds with production dials over k x embeddings
    # (the in-cell quadratic + hierarchy — the r13-touched tier).
    from mapreduceindexer_spark.operators import similarity as sim

    emb = None
    if wanted & {"knn_graph_scaled", "hnsw_build_scaled"}:
        emb = _replicate(
            spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")),
            scale,
            "vec_id",
        ).localCheckpoint()
    t("knn_graph_scaled", lambda: noop(sim.knn_graph_scaled(emb, k=3)))
    t("hnsw_build_scaled", lambda: noop(sim.hnsw_graph_edges_scaled(emb, k_edges=3)))

    # 4. MinHash-LSH near-duplicate candidates over k x documents
    # (shingle explode + banded grouping: shuffle-heavy).
    from mapreduceindexer_spark.operators import dedup as dd

    t("minhash_near_dup", lambda: noop(dd.near_duplicates(docs)))

    # 5. Partitioned table commit of k x events (the r12/r13 write path:
    # clustered partitioned write + footer stats).
    import shutil
    import tempfile

    from mapreduceindexer_spark.sources.transact import TransactionalTable

    ev = None
    if "commit_partitioned" in wanted:
        ev = _replicate(
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet")),
            scale,
            "event_id",
        ).withColumn("day", F.to_date("ts")).localCheckpoint()

    def commit_part():
        d = tempfile.mkdtemp(prefix="ladder_part_")
        try:
            TransactionalTable(d).commit_partitioned(
                spark, ev, "day", transform="day", stats_cols=["event_id"]
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)

    t("commit_partitioned", commit_part)
    spark.stop()
    return out


def _parse_args() -> tuple[list[int], list[str]]:
    scales, ops = [1, 10], list(OPS)
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--scales":
            scales = [int(x) for x in argv[i + 1].split(",")]
            i += 2
        elif argv[i] == "--ops":
            ops = argv[i + 1].split(",")
            i += 2
        else:
            i += 1
    return scales, ops


def main() -> None:
    scales, ops = _parse_args()
    if len(sys.argv) >= 4 and sys.argv[1] == "--cell":
        print(json.dumps(run_cell(int(sys.argv[2]), int(sys.argv[3]), ops)))
        return
    results: dict[tuple[int, int], dict] = {}
    for scale in scales:
        for cpus in (32, 8):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--cell", str(scale), str(cpus)]
            if ops != list(OPS):
                cmd += ["--ops", ",".join(ops)]
            p = subprocess.run(
                cmd,
                capture_output=True, text=True,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
            )
            line = p.stdout.strip().splitlines()[-1]
            results[(scale, cpus)] = json.loads(line)
            print(f"# scale {scale}x cpus {cpus}: {line}", flush=True)
    hdr = f"{'operator':22s}"
    for s in scales:
        hdr += f" {f'{s}x@32':>8s} {f'{s}x@8':>8s} {f'r({s}x)':>7s}"
    print("\n" + hdr)
    for op in ops:
        row = f"{op:22s}"
        for s in scales:
            a32, a8 = results[(s, 32)][op], results[(s, 8)][op]
            row += f" {a32:8.2f} {a8:8.2f} {a8 / a32:7.2f}"
        print(row)
    print("\n# r = 8-core wall / 32-core wall; data-dominated operators "
          "move toward 4.0 as scale grows")


if __name__ == "__main__":
    main()
