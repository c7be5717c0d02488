"""Small-file compaction: content-preserving, file-count-bounded, and —
with cluster_by — range-clustered so per-file min/max stats stay
prunable."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.maintenance import compact_files
from mapreduceindexer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _parts(d):
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def test_compaction_merges_small_files(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    events = load_table(spark, SF_SMOKE, "events")
    events.repartition(64).write.parquet(frag)
    assert len(_parts(frag)) == 64

    total = sum(os.path.getsize(f) for f in _parts(frag))
    n = compact_files(spark, frag, out, target_file_bytes=total // 4 + 1)
    assert len(_parts(out)) == n <= 4

    # Content parity, not just row count.
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, events.collect()))
    assert a == b


def test_compaction_cluster_by_gives_disjoint_ranges(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "clustered")
    events = load_table(spark, SF_SMOKE, "events")
    events.repartition(32).write.parquet(frag)

    total = sum(os.path.getsize(f) for f in _parts(frag))
    n = compact_files(
        spark, frag, out, target_file_bytes=total // 4 + 1, cluster_by="user_id"
    )
    files = _parts(out)
    assert len(files) == n > 1

    # Each output file covers a user_id range disjoint from every other
    # file's — the property that makes parquet footer min/max prune a
    # key-predicate scan down to one file.
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
        ).collect()[0]
        spans.append((r["lo"], r["hi"]))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans

    assert spark.read.parquet(out).count() == events.count()
