"""Local stand-in for the driver's differential check.

Runs every registry query at the given scale factor in Spark AND its
DuckDB oracle, then compares:
  - row count,
  - column names (sorted),
  - the full multiset of row values (columns sorted by name, rows
    sorted), with exact equality and a float-tolerance fallback report.

Usage: python tools/verify_local.py [sf_dir] [query ...]
       python tools/verify_local.py [sf_dir] --shard i/n

--shard i/n runs only registry entries with index ≡ i (mod n) in
sorted order, so a full sweep can fan out over n PROCESSES (each with
its own SparkSession sized via SPARK_GRAFT_CPUS/SPARK_GRAFT_SHUFFLE):
  for i in 0 1 2 3; do
    SPARK_GRAFT_CPUS=8 python tools/verify_local.py /root/testdata/sf0.1 \
      --shard $i/4 > /tmp/shard$i.log &
  done; wait
Shards partition by NAME, so the union of n shard runs is exactly one
full sweep.
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.plans.registry import (
    REGISTRY,
    queries_dict,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def approx_equal(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if a == b:
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    shard_i, shard_n = 0, 1
    if "--shard" in rest:
        k = rest.index("--shard")
        shard_i, shard_n = (int(x) for x in rest[k + 1].split("/"))
        rest = rest[:k] + rest[k + 2 :]
    only = set(rest)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("verify-local")
    qd = queries_dict()

    n_pass = n_fail = n_rowsonly = 0
    for idx, (name, spec) in enumerate(sorted(REGISTRY.items())):
        if only and name not in only:
            continue
        if idx % shard_n != shard_i:
            continue
        t0 = time.time()
        try:
            sdf = qd[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            # A few iterative/graph queries persist loop-invariant
            # relations (q_pagerank edges, q_triangle_count oriented
            # edges); drop them so 200+ queries don't accumulate
            # executor storage across the sweep.
            spark.catalog.clearCache()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        # Driver-faithful hashability gate: the verification driver's
        # value-hasher takes scalar cells only — an array/map/struct
        # column makes it raise (`TypeError: unhashable type: 'list'`,
        # the one red row of round 1). Flag such schemas as FAIL here
        # so the local run catches exactly what the driver would err on.
        if spec.oracle is not None:
            bad = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                print(
                    f"FAIL {name}: DRIVER-UNHASHABLE non-scalar output "
                    f"column(s) {bad} — serialize (array_join/to_json) "
                    f"before registering"
                )
                n_fail += 1
                continue
        if spec.oracle is None:
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.2f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sk = rows_key([tuple(r) for r in srows], scols)
            dk = rows_key(drows, dcols)
            if sk != dk:
                exact_mismatches = 0
                first_diff = None
                for i, (a, b) in enumerate(zip(sk, dk)):
                    if a != b:
                        if not all(approx_equal(x, y) for x, y in zip(a, b)):
                            exact_mismatches += 1
                            if first_diff is None:
                                first_diff = (i, a, b)
                        else:
                            exact_mismatches += 0.0001  # float-only drift
                            if first_diff is None:
                                first_diff = (i, a, b)
                problems.append(
                    f"values differ: {exact_mismatches} rows beyond tolerance; "
                    f"first diff @{first_diff[0]}:\n  spark : {first_diff[1]}\n"
                    f"  duckdb: {first_diff[2]}"
                    if first_diff
                    else "values differ (row set mismatch)"
                )
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.2f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.2f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
