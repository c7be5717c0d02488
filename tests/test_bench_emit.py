"""bench.py's stdout contract: the driver that records BENCH_r{N}.json
keeps only the last 2000 characters of output and parses the JSON line
from that window. Round 5 emitted a ~4 kB line and the round's bench
was recorded as "parsed": null — these tests pin the fix."""

from __future__ import annotations

import json

from bench import emit_line


def test_emit_line_fits_driver_tail_window():
    times = {f"q_{i:02d}_some_longish_query_name": 1.234 for i in range(80)}
    line = emit_line(123.456, times, 0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 123.456
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # Overflow drops the FASTEST queries from the line only.
    assert parsed["queries"]


def test_emit_line_keeps_all_queries_when_small():
    times = {"q_a": 1.0, "q_b": 2.0}
    parsed = json.loads(emit_line(3.0, times, 0.01))
    assert parsed["queries"] == times


def test_emit_line_drops_fastest_first():
    times = {f"q_{i:03d}": float(i) for i in range(200)}
    parsed = json.loads(emit_line(1.0, times, 0.1))
    kept = parsed["queries"]
    assert len(kept) < len(times)
    # Every dropped query must be no slower than every kept one.
    dropped_max = max(v for k, v in times.items() if k not in kept)
    assert dropped_max <= min(kept.values())


def test_rotation_keeps_exactly_one_member_per_family():
    """The secondary tier measures ONE member of each near-duplicate
    family per round and rotates deterministically with the recorded
    artifact count — full coverage every len(family) rounds, never a
    silently skipped family."""
    import bench

    out = bench.rotated_out_queries()
    for fam in bench.SECONDARY_FAMILIES.values():
        kept = [n for n in fam if n not in out]
        assert len(kept) == 1, (fam, kept)
    # Every family member is a real HEADLINE/probe entry (a typo here
    # would silently rotate nothing).
    all_entries = set(bench.HEADLINE) | set(bench.ANN_GRAPH_PROBES) | set(
        bench.ANN_HNSW_PROBES
    )
    for fam in bench.SECONDARY_FAMILIES.values():
        for n in fam:
            assert n in all_entries, n
    # Over len(family) consecutive rotations each member is kept once.
    for fam in bench.SECONDARY_FAMILIES.values():
        picks = {fam[r % len(fam)] for r in range(len(fam))}
        assert picks == set(fam)


def test_stable_total_is_rotation_invariant():
    """The stdout "value" must not move with rotation phase: family
    members contribute nothing, so any subset of them being measured
    yields the same total (round-10 accounting change)."""
    import bench

    fam = next(iter(bench.SECONDARY_FAMILIES.values()))
    base = {"q_postings": 1.0, "index_build_refcorpus": 2.0}
    t_none = bench.stable_total(dict(base))
    t_one = bench.stable_total({**base, fam[0]: 5.0})
    t_all = bench.stable_total({**base, **{n: 9.9 for n in fam}})
    assert t_none == t_one == t_all == 3.0


def test_emit_line_truncation_is_value_independent():
    """The kept entry set is a function of the measured-entry NAMES
    alone (drop order pinned to the frozen cost snapshot, worst-case
    width budgeting): timing noise must never change WHICH entries the
    driver line carries round-over-round (r12 PERF reported 10 spurious
    dropped_from_bench names under the old fastest-first rule)."""
    import json
    import random

    import bench

    times = {k: v for k, v in bench._EMIT_KEEP_COST.items()}
    base = json.loads(bench.emit_line(100.0, times, 0.1))
    rng = random.Random(7)
    for _ in range(5):
        noisy = {k: v * rng.uniform(0.2, 3.0) for k, v in times.items()}
        got = json.loads(bench.emit_line(rng.uniform(50, 500), noisy, 0.1))
        assert set(got["queries"]) == set(base["queries"])
        assert len(bench.emit_line(100.0, noisy, 0.1)) <= 1900
    # The most expensive pinned entries are always on the line.
    top = sorted(times, key=times.get, reverse=True)[:20]
    assert all(t in base["queries"] for t in top)
    # Entries born after the pin epoch (no pinned cost) are never
    # dropped before pinned ones.
    with_new = {**times, "q_brand_new_entry": 0.001}
    got = json.loads(bench.emit_line(100.0, with_new, 0.1))
    assert "q_brand_new_entry" in got["queries"]
