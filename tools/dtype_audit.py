"""Cross-engine result-dtype audit.

The differential harness compares VALUES; a driver with a stricter
schema compare can still trip on dtype drift the value check forgives
(canonical case: DuckDB SUM(int) returns HUGEINT while Spark returns
bigint — caught and fixed in q_map_funcs).  This tool runs every
oracle query's two sides and flags any column whose (Spark dtype,
DuckDB type) pair is not in the known-equivalent set.

Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

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

EQUIVALENT = {
    ("bigint", "bigint"),
    ("int", "integer"),
    ("double", "double"),
    ("string", "varchar"),
    ("date", "date"),
    ("timestamp", "timestamp"),
    ("timestamp", "timestamp with time zone"),
    ("timestamp_ntz", "timestamp"),
    ("boolean", "boolean"),
    ("array<string>", "varchar[]"),
    ("array<bigint>", "bigint[]"),
    ("array<double>", "double[]"),
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark = get_spark("dtype-audit", master="local[8]", shuffle_partitions=8)
    qd = queries_dict()
    flags = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        try:
            s_types = dict(qd[name](spark, sf).dtypes)
            rel = con.sql(spec.oracle)
            d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as exc:  # noqa: BLE001 — audit must not stop
            flags.append((name, "<error>", str(exc)[:100]))
            continue
        for col, dt in d_types.items():
            st = s_types.get(col, "<missing-in-spark>")
            if (st, dt.lower()) not in EQUIVALENT:
                flags.append((name, col, f"spark={st} duckdb={dt}"))
    for f in flags:
        print(*f)
    print(f"{len(flags)} flags over {sum(1 for s in REGISTRY.values() if s.oracle)} oracle queries")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
