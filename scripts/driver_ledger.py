"""Regenerate COVERAGE.md's driver-check ledger from CORRECTNESS_r*.json.

The driver verifies a rotating 50-slot window per round, so any single
round's CORRECTNESS file under-reports coverage; this ledger is the
honest union — per registered query, WHICH rounds produced a green
driver row (rows+schema+hash for oracle-backed queries, rows for the
declared rows-only ones), and which queries are still local-oracle-only
(verified every session by tests/test_oracle_parity.py but never yet
rotated into a driver window). Round-6 verdict item 8.

Usage: python scripts/driver_ledger.py   (rewrites the marked section
of COVERAGE.md in place; run after each round's CORRECTNESS lands).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- driver-ledger:begin -->"
END = "<!-- driver-ledger:end -->"


def green(row: dict, declared_rows_only: bool) -> bool:
    if row.get("err") not in (None, "no_oracle"):
        return False
    if row.get("hash_match") is True:
        return row.get("rows_match") is True and row.get("schema_match") is True
    # The rows-only branch counts ONLY queries REGISTERED without an
    # oracle: an oracle-backed query whose hash comparison never ran
    # (aborted mid-check) must not be reported as external evidence
    # (round-7 review finding — the ledger's whole point is honesty).
    return (
        declared_rows_only
        and row.get("hash_match") is None
        and row.get("spark_rows") is not None
    )


def build_section() -> str:
    from mapreduceindexer_spark.catalog import QUERIES

    rounds: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = re.search(r"_r(\d+)\.json$", f).group(1).lstrip("0") or "0"
        rounds[rnd] = json.load(open(f))

    per_query: dict[str, list[str]] = {}
    red: dict[str, list[str]] = {}
    for rnd, data in rounds.items():
        for q, row in data.items():
            rows_only = q in QUERIES and QUERIES[q][1] is None
            if green(row, rows_only):
                per_query.setdefault(q, []).append(rnd)
            elif (
                row.get("err") not in (None, "no_oracle")
                or row.get("rows_match") is False
                or row.get("schema_match") is False
                or row.get("hash_match") is False
            ):
                # An actually-FAILED driver row is evidence too — a red
                # check must stay visible until a later green supersedes
                # it (round-10 verdict item 2: never overstate, never
                # silently rotate past a failure). Rows that merely ran
                # under an older, weaker check mode (e.g. rows-only
                # before an oracle existed) are neither green nor red.
                red.setdefault(q, []).append(rnd)

    names = list(QUERIES)
    covered = [n for n in names if n in per_query]
    local_only = [n for n in names if n not in per_query]
    reds_unresolved = sorted(
        n
        for n in names
        if n in red
        and (n not in per_query or max(map(int, per_query[n])) < max(map(int, red[n])))
    )
    lines = [
        BEGIN,
        "",
        "## Driver-check ledger (generated — scripts/driver_ledger.py)",
        "",
        "The driver hash-checks a rotating 50-slot window per round; every",
        "oracle-backed query is ALSO value-checked against DuckDB locally each",
        "session (tests/test_oracle_parity.py). This table is the external",
        "evidence only: per query, the rounds whose driver row was green —",
        "and, in RED, any round whose driver row FAILED and has not yet been",
        "superseded by a later green row.",
        "",
        f"- registered queries: **{len(names)}**",
        f"- with ≥1 green driver row: **{len(covered)}**",
        f"- local-oracle-only (never yet green in a driver window): **{len(local_only)}**",
        f"- RED in their latest driver round (fix + re-window pending): **{len(reds_unresolved)}**"
        + (
            " — " + ", ".join(f"`{n}`" for n in reds_unresolved)
            if reds_unresolved
            else ""
        ),
        "",
        "| Query | Driver rounds |",
        "|---|---|",
    ]
    for n in names:
        cells = [(int(r), f"r{r}") for r in per_query.get(n, [])]
        cells += [(int(r), f"**r{r} RED**") for r in red.get(n, [])]
        cells.sort()
        lines.append(
            f"| `{n}` | {', '.join(c for _, c in cells) if cells else '— (local-only)'} |"
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path, encoding="utf-8").read()
    section = build_section()
    if BEGIN in text:
        text = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END),
            lambda _m: section,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    print("COVERAGE.md ledger regenerated:", section.count("\n"), "lines")


if __name__ == "__main__":
    main()
