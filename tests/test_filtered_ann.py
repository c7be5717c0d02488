"""Filtered vector search: predicate AND nearest (the production serving
shape), both tiers — exact pre-filter and IVF-with-sound-fallback.

The contract under test: filtered search returns min(k, |matches|) rows
that ALL satisfy the predicate; the IVF tier widens to an exact scan of
the filtered slice whenever the probed cells cannot supply k candidates
(never a silently short result), and says so in its output columns.
"""

from __future__ import annotations

import math

import pytest

from mapreduceindexer_spark.operators import similarity as sim

from tests.conftest import SF_SMOKE


def _embeddings(spark, n=60, dim=4, n_labels=5):
    rows = [
        (
            i,
            [
                math.sin(0.7 * i + j) + 0.01 * ((i * 31 + j * 7) % 13)
                for j in range(dim)
            ],
            i % n_labels,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id: bigint, embedding: array<float>, label: int"
    )


@pytest.fixture(scope="module")
def emb(spark):
    return _embeddings(spark).localCheckpoint()


def test_exact_filtered_topk_respects_predicate_and_k(emb):
    out = sim.filtered_topk(emb, probe_id=0, label=2, k=5).collect()
    assert len(out) == 5
    matches = {r.vec_id for r in emb.filter("label = 2").collect()}
    assert all(r.vec_id in matches for r in out)
    assert [r.rn for r in out] == [1, 2, 3, 4, 5]
    sims = [r.cos_sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_exact_filtered_topk_returns_all_matches_when_k_exceeds(emb):
    # 12 vectors carry label 2 (60 / 5); k=50 must return exactly them
    # (minus the probe if it matched), never pad with non-matching rows.
    out = sim.filtered_topk(emb, probe_id=0, label=2, k=50).collect()
    matches = {r.vec_id for r in emb.filter("label = 2").collect()} - {0}
    assert {r.vec_id for r in out} == matches


def test_ivf_filtered_happy_path_stays_in_probed_cells(emb):
    out = sim.ivf_filtered_topk(
        emb, probe_id=0, label=2, k=2, n_centroids=4, n_probe_cells=2
    ).collect()
    assert len(out) == 2
    assert all(r.fallback is False for r in out)
    # Candidates must come from the probe's 2 nearest cells ∩ label=2.
    cells = sim.ivf_assignments(emb, 4)
    probed = {
        r.probe_cell
        for r in sim._nearest_probe_cells(emb, cells, 0, 4, 2).collect()
    }
    cell_of = {r.vec_id: r.cell for r in cells.collect()}
    label_of = {r.vec_id: r.label for r in emb.collect()}
    for r in out:
        assert cell_of[r.vec_id] in probed
        assert label_of[r.vec_id] == 2
    # n_cand is the true intersection size.
    expected = sum(
        1
        for v, c in cell_of.items()
        if c in probed and label_of[v] == 2 and v != 0
    )
    assert out[0].n_cand == expected


def test_ivf_filtered_falls_back_to_exact_when_starved(emb):
    # k far above what 2 cells ∩ one label can hold → the widen rule
    # fires and the result equals the exact filtered top-k.
    out = sim.ivf_filtered_topk(
        emb, probe_id=0, label=2, k=11, n_centroids=4, n_probe_cells=2
    ).collect()
    assert all(r.fallback is True for r in out)
    assert all(r.n_cand < 11 for r in out)
    exact = sim.filtered_topk(emb, probe_id=0, label=2, k=11).collect()
    assert [(r.vec_id, r.cos_sim, r.rn) for r in out] == [
        (r.vec_id, r.cos_sim, r.rn) for r in exact
    ]


def test_filtered_predicate_pushes_to_parquet_scan(spark):
    from mapreduceindexer_spark.plans import pushed_filters
    from mapreduceindexer_spark.sources.tables import load_table

    df = sim.filtered_topk(
        load_table(spark, SF_SMOKE, "embeddings"), probe_id=0, label=3, k=10
    )
    pf = " ".join(pushed_filters(df))
    assert "label" in pf, pf
