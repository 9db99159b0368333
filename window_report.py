#!/usr/bin/env python3
"""Pre-handoff reconciliation of the driver verification window.

The external driver checks the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so claims like "query X will
be verified next round" are only true of the iteration order AT HANDOFF
— not when a NOTES file was written (the r11 failure: the prediction
went stale after later edits flooded rotation.json["changed"]). Run
this LAST, after every edit of the round, and paste its output into the
round notes:

    python window_report.py

Exits non-zero if any never-driver-recorded query (rotation tier 0)
falls outside the window — the condition the tiered ordering in
registry.py makes impossible, double-checked here against the actual
entry-point iteration order the driver will see.
"""

from __future__ import annotations

import sys

WINDOW = 50


def main() -> int:
    # exactly what the driver imports — not the registry internals
    import __spark_entry__ as entry
    from fda_clinical_etl_pipeline_spark.registry import (
        _CHANGED,
        _LAST_CHECKED,
    )

    names = list(entry.queries())
    window = names[:WINDOW]

    def tier(n: str) -> int:
        if n not in _LAST_CHECKED:
            return 0
        return 1 if n in _CHANGED else 2

    print(f"registry: {len(names)} queries; driver window = first "
          f"{WINDOW} of queries() iteration order\n")
    for i, n in enumerate(window):
        print(f"{i:3d}  tier{tier(n)}  last_checked="
              f"{str(_LAST_CHECKED.get(n, '-')):>2}  {n}")

    outside_never = [n for n in names[WINDOW:] if tier(n) == 0]
    if outside_never:
        print(f"\nFAIL: never-driver-recorded queries outside the "
              f"window: {outside_never}", file=sys.stderr)
        return 1
    n0 = sum(1 for n in window if tier(n) == 0)
    n1 = sum(1 for n in window if tier(n) == 1)
    print(f"\nOK: window = {n0} never-recorded + {n1} changed + "
          f"{WINDOW - n0 - n1} stalest-verified; all tier-0 inside.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
