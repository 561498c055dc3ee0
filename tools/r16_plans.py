"""Dump `.explain("formatted")` for the round-16 optimization surface
(headline + heavy bench queries, plus any names passed on the CLI) to
plans/r15/<query>_<suffix>.txt — the before/after plan evidence the
optimization round's judge checks claims against.

Usage: python tools/r15_plans.py <before|after> [query ...]
  With no query names: the full headline + heavy set.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.plans.registry import (
    REGISTRY,
    queries_dict,
)

HEAVY = [
    "q_pagerank", "q_triangle_count", "q_dup_clusters", "q_bfs_hops",
    "q_kcore", "q_collab_filter", "q_assortativity",
    "q_equi_depth_histogram", "q_rrf_fusion", "q_shard_assign",
    "q_rfm_segments", "q_auc_ranksum", "q_calibration_bins",
    "q_pr_curve", "q_ks_statistic", "q_min_cost_supplier",
    "q_important_stock", "q_cross_doc_ngram_dup", "q_pq_topk",
    "q_minhash_neardup", "q_prefix_shingle_join",
    "q_simhash_shingle_pairs",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        names = [n for n, s in sorted(REGISTRY.items()) if s.bench] + HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r16-plans")
    qd = queries_dict()
    for name in names:
        try:
            df = qd[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building/explaining {name}: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}, sf_dir={sf_dir}) ==\n")
            f.write(plan + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
