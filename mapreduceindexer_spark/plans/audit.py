"""Physical-plan audit helpers.

"Would this survive a 100× scale-up?" is checkable, not a vibe: filters
must reach the parquet scan (PushedFilters), projections must prune the
read schema (ReadSchema), small dims must broadcast, and the hot path must
sit inside WholeStageCodegen spans. These helpers turn those properties
into assertions used by ``tests/test_plans.py`` — a regression suite for
the *optimizer contract*, not just the answers.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (pruning check)."""
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer = wider fusion)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df, "simple"))))


def with_metrics(df: DataFrame, name: str, *exprs):
    """Attach zero-cost pipeline metrics via ``df.observe`` (Spark's
    Observation API): the named aggregate expressions are computed inside
    the SAME job that materializes ``df`` — no second scan, no extra
    stage — and surface on the returned Observation after any action.

    This is how a production index build reports rows-in / terms-out /
    malformed-counts at 100 TB without paying a monitoring pass: the
    metrics ride the existing exchange. Returns ``(observed_df,
    observation)``; read ``observation.get`` only after an action runs.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *exprs), obs
