"""CLI: build the inverted index from a manifest, like the reference binary.

Reference invocation (``/root/reference/src/main.cpp:5-8``):

    ./tema1 <num_mappers> <num_reducers> <manifest>

Spark-native equivalent (mapper/reducer counts are obsolete — Spark's
scheduler owns parallelism; ``--cpus`` bounds the local core count):

    python -m mapreduceindexer_spark <manifest> <out_dir> [--base-dir D]
                                     [--cpus N] [--salt-buckets N]

Output: ``<out_dir>/letter=<a..z>/part-*.txt`` with ``term:[ids]`` lines
ordered (df DESC, term ASC) — byte-identical content to the reference's
``a.txt``..``z.txt`` (pinned by tests/test_golden_small.py and
tests/test_golden_full.py on the reference's own fixtures).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m mapreduceindexer_spark",
        description="Build a document-level inverted index (word -> sorted "
        "doc IDs, 26 per-letter sorted files) from a manifest of text files.",
    )
    ap.add_argument("manifest", help="file with N then N document paths")
    ap.add_argument("out_dir", help="output directory for letter=<c> files")
    ap.add_argument(
        "--base-dir",
        default=None,
        help="directory document paths are relative to (default: manifest's)",
    )
    ap.add_argument(
        "--cpus", type=int, default=None, help="local cores (default: env/32)"
    )
    ap.add_argument(
        "--salt-buckets",
        type=int,
        default=16,
        help="salt fan-out for the two-level postings aggregation "
        "(stopword-skew mitigation; 1 disables)",
    )
    args = ap.parse_args(argv)

    if args.cpus is not None:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from mapreduceindexer_spark.operators.index import build_postings
    from mapreduceindexer_spark.operators.sink import write_index
    from mapreduceindexer_spark.session import get_spark
    from mapreduceindexer_spark.sources.corpus import read_manifest_corpus

    base_dir = args.base_dir or os.path.dirname(os.path.abspath(args.manifest))
    spark = get_spark(app_name="mapreduceindexer-build")
    t0 = time.perf_counter()
    corpus = read_manifest_corpus(spark, args.manifest, base_dir=base_dir)
    postings = build_postings(corpus, salt_buckets=args.salt_buckets)
    write_index(postings, args.out_dir)
    n_terms = spark.read.text(args.out_dir).count()
    print(
        f"indexed {n_terms} terms -> {args.out_dir} "
        f"in {time.perf_counter() - t0:.2f}s",
        file=sys.stderr,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
