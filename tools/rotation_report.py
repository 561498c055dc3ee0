#!/usr/bin/env python3
"""Driver-panel rotation report: which registered queries have never
earned a CORRECTNESS row, grouped by SURVEY §2 family, plus a
losslessness check for a proposed next panel.

The rotation program (plans/registry.py CURATED_FIRST docstring): the
driver hash-checks only the first 50 queries each round, so ~25-30
non-anchor slots rotate toward never-driver-checked names every round
until the whole registry has hard signal.  This tool does the
bookkeeping that was hand-rolled in rounds 7-9:

  python tools/rotation_report.py            # coverage + candidates
  python tools/rotation_report.py --project  # post-panel larder depth
                                             #   per family (fails if
                                             #   any family would be
                                             #   < 2 deep — the "two
                                             #   panels ahead" rule)
  python tools/rotation_report.py --check    # validate CURATED_FIRST
                                             #   against the PREVIOUS
                                             #   panel in git HEAD~?
                                             #   (no — against history:
                                             #   tag-union vs the union
                                             #   of ALL past panels'
                                             #   tags is meaningless;
                                             #   --check validates the
                                             #   CURRENT panel is
                                             #   50 names, registered,
                                             #   ≤2 rows-only, and
                                             #   spans every
                                             #   driver-visible family)

No Spark session needed — registry import + the committed
CORRECTNESS_r*.json artifacts.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark.plans.registry import (
    CURATED_FIRST,
    REGISTRY,
    _load_all_plans,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_checked() -> set[str]:
    """Names with at least one row in any committed CORRECTNESS_r*.json."""
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        try:
            seen |= set(json.load(open(path)))
        except Exception:
            continue
    return seen


def main() -> None:
    _load_all_plans()
    seen = driver_checked()
    # the CURRENT panel earns rows when the driver next runs
    pending = set(CURATED_FIRST) - seen
    never = [n for n in REGISTRY if n not in seen and n not in pending]

    if "--check" in sys.argv:
        problems = []
        if len(CURATED_FIRST) != 50:
            problems.append(f"panel has {len(CURATED_FIRST)} names, not 50")
        missing = [n for n in CURATED_FIRST if n not in REGISTRY]
        if missing:
            problems.append(f"unregistered: {missing}")
        rows_only = [
            n for n in CURATED_FIRST if REGISTRY[n].oracle is None
        ]
        if len(rows_only) > 2:
            problems.append(f">2 rows-only slots: {rows_only}")
        # span: every driver-visible §2 family must keep a panel row
        # (same set test_registry pins; the tool checks it pre-commit
        # so a bad swap fails here, not in CI)
        try:
            from tests.test_registry import _DRIVER_VISIBLE_FAMILIES

            covered: set[str] = set()
            for n in CURATED_FIRST:
                if n in REGISTRY:
                    covered.update(REGISTRY[n].tags or ())
            gaps = sorted(_DRIVER_VISIBLE_FAMILIES - covered)
            if gaps:
                problems.append(f"families with no panel row: {gaps}")
        except ImportError:
            problems.append(
                "tests.test_registry not importable - family span unchecked"
            )
        print(json.dumps({"ok": not problems, "problems": problems,
                          "rows_only": rows_only}))
        raise SystemExit(1 if problems else 0)

    if "--project" in sys.argv:
        # Stock projection (r12 addition): assume the CURRENT panel
        # earns its rows this round, then report per-family depth of
        # the remaining never-checked oracle pool — the "two panels
        # ahead" larder check (a family at depth 1 will run dry the
        # round after next; author a fresh shape for it NOW).
        pool = [
            n
            for n in never
            if REGISTRY[n].oracle is not None
        ]
        # Seed every driver-visible family at depth 0 (r12 ADVICE): a
        # family whose never-checked pool is fully DRY must fail the
        # projection — building depth only from pool members would
        # silently pass the exact condition this check exists for.
        depth: dict[str, int] = defaultdict(int)
        try:
            from tests.test_registry import _DRIVER_VISIBLE_FAMILIES

            for fam in _DRIVER_VISIBLE_FAMILIES:
                depth[fam] = 0
        except ImportError:
            print(json.dumps({
                "ok": False,
                "error": "tests.test_registry not importable - "
                         "cannot seed family depths",
            }))
            raise SystemExit(1)
        for n in pool:
            for t in REGISTRY[n].tags or ():
                depth[t] += 1
        thin = {t: c for t, c in sorted(depth.items()) if c < 2}
        print(json.dumps({
            "pool_after_current_panel": len(pool),
            "families_below_2": thin,
            "ok": not thin,
        }, indent=0))
        raise SystemExit(1 if thin else 0)

    by_family: dict[str, list[str]] = defaultdict(list)
    for n in never:
        for t in REGISTRY[n].tags or ("untagged",):
            by_family[t].append(n)

    print(f"registered: {len(REGISTRY)}")
    print(f"driver-checked (any round): {len(seen & set(REGISTRY))}")
    print(f"on current panel, awaiting first driver row: {len(pending)}")
    print(f"never-checked and NOT on the panel: {len(never)}")
    oracle_never = [n for n in never if REGISTRY[n].oracle is not None]
    print(f"  of which oracle-checked (rotation candidates): "
          f"{len(oracle_never)}\n")
    print("rotation candidates by family (candidates appear once per tag):")
    for fam in sorted(by_family):
        names = [n for n in by_family[fam] if REGISTRY[n].oracle is not None]
        if names:
            print(f"  {fam:12s} {', '.join(sorted(names))}")


if __name__ == "__main__":
    main()
