#!/usr/bin/env python3
"""Update tests/data/expected_rowcounts_sf0.01.json for newly
registered queries (append-only by default — existing pins are left
untouched so an accidental semantic change still fails the pin test).

Usage:
  python tools/update_rowcounts.py            # append missing entries
  python tools/update_rowcounts.py --rebuild  # recount EVERY query
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.plans.registry import queries_dict

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "expected_rowcounts_sf0.01.json",
)
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    spark = get_spark("rowcounts", master="local[16]", shuffle_partitions=16)
    counts = {} if rebuild else json.load(open(PATH))
    qd = queries_dict()
    stale = sorted(set(counts) - set(qd))
    for name in stale:
        del counts[name]
    todo = sorted(set(qd) - set(counts))
    for name in todo:
        counts[name] = qd[name](spark, SF_DIR).count()
    json.dump(counts, open(PATH, "w"), indent=0, sort_keys=True)
    print(
        f"fixture: {len(counts)} queries "
        f"(+{len(todo)} added, -{len(stale)} stale removed)"
    )


if __name__ == "__main__":
    main()
