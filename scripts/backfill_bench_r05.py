"""One-shot backfill of BENCH_r05.json's ``parsed`` field (round-7
verdict item 7).

Round 5's bench line overflowed the driver's 2000-char tail capture, so
the recorded ``parsed`` is null and round-over-round tooling breaks on
that round. The tail DOES hold the final ~75 per-query timings and the
jvm-drift block verbatim; this script rebuilds a partial ``parsed``
object from them, marked ``"recovered": "partial-from-tail"`` so no
tool mistakes it for a complete measurement (the head of the line —
the total and the first ~15 queries — is unrecoverable). Idempotent:
re-running on an already-backfilled file is a no-op.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH_r05.json")


def main() -> None:
    with open(PATH) as f:
        doc = json.load(f)
    if doc.get("parsed") is not None:
        print("BENCH_r05.json already has parsed; nothing to do")
        return
    tail = doc.get("tail", "")
    drift_m = re.search(r'"jvm_drift": (\{[^}]*\})', tail)
    q_zone = tail[: drift_m.start()] if drift_m else tail
    pairs = re.findall(
        r'"((?:q_|index_build)[a-zA-Z0-9_]*)": ([0-9.]+)', q_zone
    )
    if not pairs:
        raise SystemExit("tail holds no recoverable query timings")
    parsed = {
        "metric": "headline_queries_total",
        "value": None,  # head of the line (the total) was truncated away
        "unit": "sec",
        "sf": doc.get("sf"),
        "queries": {k: float(v) for k, v in pairs},
        "recovered": "partial-from-tail",
    }
    if drift_m:
        parsed["jvm_drift"] = json.loads(drift_m.group(1))
    doc["parsed"] = parsed
    with open(PATH, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(
        f"backfilled {len(parsed['queries'])} query timings"
        + (" + jvm_drift" if drift_m else "")
    )


if __name__ == "__main__":
    main()
