"""Hard size guards on the documented quadratic baselines (r7 VERDICT
item 3): the all-pairs oracle queries must REFUSE oversized inputs
with a pointer to the sub-quadratic path, mirroring knn_join's
max_queries guard."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from spark_streaming_join_example_spark.operators.guards import (
    AllPairsBoundExceeded,
    assert_allpairs_bounded,
)


def test_guard_passes_through_bounded_input(spark):
    df = spark.range(100)
    assert assert_allpairs_bounded(df, 100, "t", "alt") is df


def test_guard_raises_above_bound(spark):
    df = spark.range(101)
    with pytest.raises(AllPairsBoundExceeded, match="use the sub-quadratic"):
        assert_allpairs_bounded(df, 100, "mytest", "the.alt.path")
    # the message names the caller and the alternative
    with pytest.raises(AllPairsBoundExceeded, match="the.alt.path"):
        assert_allpairs_bounded(df, 100, "mytest", "the.alt.path")


def _write_fixture(tmp_path, table: str, pdf: pd.DataFrame) -> str:
    d = str(tmp_path)
    pdf.to_parquet(os.path.join(d, f"{table}.parquet"))
    return d


def test_q_jaccard_pairs_refuses_oversized_corpus(spark, tmp_path):
    """3,000 rows survive the doc_id < 2000 prefilter (repeated ids) —
    the guard, not the filter, is the backstop."""
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    pdf = pd.DataFrame(
        {"doc_id": [i % 1999 for i in range(3000)],
         "text": ["a b c"] * 3000,
         "lang": ["en"] * 3000}
    )
    sf_dir = _write_fixture(tmp_path, "documents", pdf)
    with pytest.raises(AllPairsBoundExceeded, match="minhash_near_duplicates"):
        queries_dict()["q_jaccard_pairs"](spark, sf_dir)


def test_dup_edges_refuses_oversized_corpus(spark, tmp_path):
    from spark_streaming_join_example_spark.plans.advanced import _dup_edges

    pdf = pd.DataFrame(
        {"doc_id": [i % 1999 for i in range(3000)],
         "text": ["a b c"] * 3000,
         "lang": ["en"] * 3000}
    )
    sf_dir = _write_fixture(tmp_path, "documents", pdf)
    with pytest.raises(AllPairsBoundExceeded, match="connected_components"):
        _dup_edges(spark, sf_dir)


def test_q_mrl_truncation_refuses_oversized_sample(spark, tmp_path):
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    pdf = pd.DataFrame(
        {"vec_id": range(5001),
         "embedding": [[0.1] * 4 for _ in range(5001)],
         "label": ["x"] * 5001}
    )
    sf_dir = _write_fixture(tmp_path, "embeddings", pdf)
    with pytest.raises(AllPairsBoundExceeded, match="knn_join"):
        queries_dict()["q_mrl_truncation"](spark, sf_dir)
