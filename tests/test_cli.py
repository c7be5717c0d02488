"""CLI parity: `python -m mapreduceindexer_spark <manifest> <out>` builds
the same 26-letter index the reference binary builds from the same
manifest (the reference's own small fixture)."""

from __future__ import annotations

import os
import string
import subprocess
import sys

REF = "/root/reference/checker"


def test_cli_builds_golden_small_index(tmp_path):
    out = str(tmp_path / "idx")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    res = subprocess.run(
        [sys.executable, "-m", "mapreduceindexer_spark",
         f"{REF}/test_small.txt", out],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    from mapreduceindexer_spark.operators.sink import read_index_letter

    for c in string.ascii_lowercase:
        with open(f"{REF}/test_out_small/{c}.txt", encoding="utf-8") as fh:
            golden = fh.read().splitlines()
        assert read_index_letter(out, c) == golden, c
