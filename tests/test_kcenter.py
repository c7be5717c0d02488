"""Greedy k-center (farthest-point traversal) invariants — value parity
with the oracle is covered by test_oracle_parity; these pin the
algorithmic contract on a corpus small enough to check by hand."""

from __future__ import annotations

import math

import pytest

from mapreduceindexer_spark.operators.curation import kcenter_sample


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (i, [math.cos(0.9 * i + j) + 0.01 * ((i * 17 + j) % 7) for j in range(3)])
        for i in range(24)
    ]
    return spark.createDataFrame(
        rows, "vec_id: bigint, embedding: array<float>"
    ).localCheckpoint()


def _d2(a, b):
    return round(sum((x - y) ** 2 for x, y in zip(a, b)), 6)


def test_kcenter_greedy_invariants(spark, emb):
    m = 6
    sel = sorted(kcenter_sample(emb, m=m).collect(), key=lambda r: r.sel_rank)
    assert [r.sel_rank for r in sel] == list(range(m))
    assert sel[0].vec_id == 0 and sel[0].d2 == 0.0
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    # Each pick is the true argmax of min-distance-to-selected, and the
    # radius sequence never increases.
    chosen = [sel[0].vec_id]
    prev_d2 = None
    for row in sel[1:]:
        dmin = {
            v: min(_d2(vecs[v], vecs[c]) for c in chosen)
            for v in vecs
            if v not in chosen
        }
        best = max(dmin.items(), key=lambda kv: (kv[1], -kv[0]))
        # ties -> lowest id: re-derive deterministically
        best_val = max(dmin.values())
        best_id = min(v for v, d in dmin.items() if d == best_val)
        assert (row.vec_id, row.d2) == (best_id, best_val)
        if prev_d2 is not None:
            assert row.d2 <= prev_d2 + 1e-9
        prev_d2 = row.d2
        chosen.append(row.vec_id)


def test_kcenter_m_exceeding_corpus_returns_all(spark):
    tiny = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 2.0])],
        "vec_id: bigint, embedding: array<float>",
    )
    sel = kcenter_sample(tiny, m=5).collect()
    assert {r.vec_id for r in sel} == {0, 1, 2}
    assert len(sel) == 3  # exhausted corpus stops growing, no padding


def test_kcenter_guards(spark, emb):
    with pytest.raises(ValueError, match="m must be"):
        kcenter_sample(emb, m=0)
