"""Randomized differential test for the as-of join: the distributed
union+window implementation must agree with an obviously-correct
per-row Python reference on adversarial data (duplicate timestamps,
users with no clicks, clicks after every purchase)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F


def test_asof_join_matches_bruteforce_reference(spark):
    from mapreduceindexer_spark.operators.asof import asof_join

    rng = random.Random(42)
    base = datetime(2024, 1, 1)
    rows = []
    for event_id in range(600):
        user = rng.randint(1, 12)
        # Coarse timestamps on purpose: collisions between clicks and
        # purchases exercise the inclusive at-or-before tie rule.
        ts = base + timedelta(minutes=rng.randint(0, 200))
        kind = rng.choice(["click", "purchase"])
        rows.append((event_id, user, ts, kind, float(event_id)))
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    got = {
        r.event_id: (r.last_click_id, r.last_click_value)
        for r in asof_join(
            purchases,
            clicks,
            key="user_id",
            left_ts="ts",
            right_ts="click_ts",
            payload={"click_id": "last_click_id", "click_value": "last_click_value"},
        ).collect()
    }

    # Python reference: for each purchase, the click with max (ts, event_id)
    # among same-user clicks with ts <= purchase ts (inclusive); the window
    # orders by (ts, side, payload) with clicks before purchases at equal
    # ts — at-or-before inclusive, greatest payload wins ties.
    clicks_by_user: dict[int, list[tuple[datetime, int, float]]] = {}
    collisions = 0
    seen = set()
    for eid, user, ts, kind, val in rows:
        if kind == "click":
            if (user, ts) in seen:
                collisions += 1
            seen.add((user, ts))
            clicks_by_user.setdefault(user, []).append((ts, eid, val))
    # The data must actually exercise the tie path.
    assert collisions > 0, "test data produced no same-user same-ts clicks"
    want = {}
    for eid, user, ts, kind, val in rows:
        if kind != "purchase":
            continue
        cands = [c for c in clicks_by_user.get(user, []) if c[0] <= ts]
        if not cands:
            want[eid] = (None, None)
        else:
            best = max(cands)  # (ts, event_id) lexicographic
            want[eid] = (best[1], best[2])
    assert set(got) == set(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, dict(list(mismatches.items())[:5])
