#!/usr/bin/env python3
"""Fold a driver CORRECTNESS_r{N}.json into the rotation metadata.

The external driver verifies the FIRST 50 entries of queries() each
round, so the iteration order of the registry is part of the
verification contract (registry.py explains the stalest-first rule).
After each round's CORRECTNESS report lands, every query it checked
must be stamped with that round number in
``fda_clinical_etl_pipeline_spark/rotation.json`` ("last_checked") and
removed from the hand-maintained "changed" list — otherwise the window
re-verifies fresh queries forever and the stale cohort never rotates
in. That fold was a manual (and judge-flagged, three rounds running)
chore; this script makes it mechanical:

    python fold_rotation.py CORRECTNESS_r06.json 6

Counting rules (same as the driver's):
- a green oracle row (rows+schema+hash all true, err null) counts as
  checked;
- a declared rows-only query (err == "no_oracle") counts as checked iff
  it returned rows — the driver's weaker gate;
- any OTHER failure is NOT folded: the name keeps its old stamp (or its
  "changed" slot) so it stays at the front of the next window instead
  of rotating out while red. Rotating a failing query out of the window
  would defeat the gate, so the script refuses to ever do it.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROTATION = (
    Path(__file__).resolve().parent
    / "fda_clinical_etl_pipeline_spark"
    / "rotation.json"
)


# Declared no-oracle queries for which an EMPTY result is a valid
# answer (e.g. a dedup pass over a corpus with no near-duplicates at
# some SF). Every other rows-only query returning 0 rows is treated as
# red so it can't silently fold while broken. Keep this list in sync
# with the registry's no_oracle set when adding such queries.
EMPTY_OK: frozenset[str] = frozenset()


def classify(name: str, row: dict) -> str:
    """green | rows_only | red for one CORRECTNESS report row."""
    if row.get("err") == "no_oracle":
        if name in EMPTY_OK:
            return "rows_only"
        return "rows_only" if (row.get("spark_rows") or 0) > 0 else "red"
    if (
        row.get("err") is None
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    ):
        return "green"
    return "red"


def fold(report: dict, round_no: int, state: dict) -> dict:
    last: dict[str, int] = dict(state.get("last_checked", {}))
    changed: list[str] = list(state.get("changed", []))
    greens, rows_only, reds = [], [], []
    for name, row in sorted(report.items()):
        kind = classify(name, row)
        if kind == "red":
            reds.append(name)
            continue  # keep its old stamp / changed slot: stays front
        (greens if kind == "green" else rows_only).append(name)
        last[name] = round_no
        if name in changed:
            changed.remove(name)
    print(
        f"folded round {round_no}: {len(greens)} green, "
        f"{len(rows_only)} rows-only, {len(reds)} NOT folded (red): {reds}"
    )
    from fda_clinical_etl_pipeline_spark.depcheck import (
        module_hashes,
        unit_hashes,
    )

    # snapshot the per-module AND per-unit state the driver just
    # verified: the depcheck test (tests/test_registry.py) diffs the
    # working tree against these and fails if an edited unit's
    # dependent queries are missing from "changed" — the r8
    # hand-maintained rule, made mechanical; unit granularity (r13)
    # keeps one function's edit from re-fronting a whole module's
    # gates
    return {
        "comment": state.get("comment", ""),
        "last_checked": dict(sorted(last.items())),
        "changed": sorted(changed),
        "module_hashes": module_hashes(),
        "unit_hashes": unit_hashes(),
    }


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    report = json.loads(Path(argv[1]).read_text())
    round_no = int(argv[2])
    state = json.loads(ROTATION.read_text())
    new_state = fold(report, round_no, state)
    ROTATION.write_text(json.dumps(new_state, indent=1) + "\n")
    print(f"wrote {ROTATION}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
