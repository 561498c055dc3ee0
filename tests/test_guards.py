"""Hard size guards on the documented quadratic baselines (r7 VERDICT
item 3): the all-pairs oracle queries must REFUSE oversized inputs
with a pointer to the sub-quadratic path, mirroring knn_join's
max_queries guard.

LAZY since r9 (advisor request): plan CONSTRUCTION is action-free —
the bound check is embedded in the plan (a 1-row broadcast guard
relation filtered through assert_true) and fires at first execution,
so tools that build every registered plan launch no jobs and cannot
fail on data errors.  These tests pin both halves: building an
oversized plan succeeds; executing it raises with the scale-path
pointer in the message."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from spark_streaming_join_example_spark.operators.guards import (
    AllPairsBoundExceeded,
    assert_allpairs_bounded,
    check_now,
)


def test_guard_is_identity_on_bounded_input(spark):
    df = spark.range(100)
    out = assert_allpairs_bounded(df, 100, "t", "alt")
    assert out.columns == df.columns
    assert out.count() == 100
    assert [r.id for r in out.orderBy("id").collect()] == list(range(100))


def test_guard_raises_at_execution_above_bound(spark):
    df = spark.range(101)
    out = assert_allpairs_bounded(df, 100, "mytest", "the.alt.path")
    # construction succeeded; the FIRST action fails with the pointer
    with pytest.raises(Exception, match="use the sub-quadratic"):
        out.count()
    with pytest.raises(Exception, match="the.alt.path"):
        out.collect()
    with pytest.raises(Exception, match="AllPairsBoundExceeded"):
        out.count()


def test_check_now_eager_variant(spark):
    df = spark.range(101)
    assert check_now(spark.range(100), 100, "t", "alt").count() == 100
    with pytest.raises(AllPairsBoundExceeded, match="use the sub-quadratic"):
        check_now(df, 100, "mytest", "the.alt.path")


def _write_fixture(tmp_path, table: str, pdf: pd.DataFrame) -> str:
    d = str(tmp_path)
    pdf.to_parquet(os.path.join(d, f"{table}.parquet"))
    return d


def test_q_jaccard_pairs_refuses_oversized_corpus(spark, tmp_path):
    """3,000 rows survive the doc_id < 2000 prefilter (repeated ids) —
    the guard, not the filter, is the backstop.  Building the plan is
    action-free; executing it raises before the O(n²) join streams."""
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    pdf = pd.DataFrame(
        {"doc_id": [i % 1999 for i in range(3000)],
         "text": ["a b c"] * 3000,
         "lang": ["en"] * 3000}
    )
    sf_dir = _write_fixture(tmp_path, "documents", pdf)
    df = queries_dict()["q_jaccard_pairs"](spark, sf_dir)  # no raise here
    with pytest.raises(Exception, match="minhash_near_duplicates"):
        df.count()


def test_dup_edges_refuses_oversized_corpus(spark, tmp_path):
    from spark_streaming_join_example_spark.plans.advanced import _dup_edges

    pdf = pd.DataFrame(
        {"doc_id": [i % 1999 for i in range(3000)],
         "text": ["a b c"] * 3000,
         "lang": ["en"] * 3000}
    )
    sf_dir = _write_fixture(tmp_path, "documents", pdf)
    with pytest.raises(Exception, match="connected_components"):
        _dup_edges(spark, sf_dir).count()


def test_q_mrl_truncation_refuses_oversized_sample(spark, tmp_path):
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    pdf = pd.DataFrame(
        {"vec_id": range(5001),
         "embedding": [[0.1] * 4 for _ in range(5001)],
         "label": ["x"] * 5001}
    )
    sf_dir = _write_fixture(tmp_path, "embeddings", pdf)
    df = queries_dict()["q_mrl_truncation"](spark, sf_dir)  # no raise here
    with pytest.raises(Exception, match="knn_join"):
        df.count()


# --- LSH band-scheme mismatch guards (r9 ADVICE, medium) --------------


def test_banded_signatures_rejects_indivisible_bands(spark):
    from spark_streaming_join_example_spark.operators.dedup import (
        banded_signatures,
    )

    sig = spark.createDataFrame(
        [(1, list(range(100)))], "doc_id long, sig array<long>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        banded_signatures(sig, "doc_id", num_hashes=100, bands=16)


def test_banded_signatures_rejects_signature_length_mismatch(spark):
    """A signature built with num_hashes=16 read back under the new
    128/16 defaults must FAIL LOUDLY: before the r9 guard, F.slice past
    the array end yielded empty slices hashing to one constant bucket
    per band — every document in one bucket, an O(n²) candidate
    explosion instead of an error."""
    import pyspark.sql.functions as F

    from spark_streaming_join_example_spark.operators.dedup import (
        banded_signatures,
        distinct_tokens,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z"), (3, "p q r")],
        "doc_id long, text string",
    )
    toks = docs.select("doc_id", distinct_tokens("text").alias("toks"))
    sig16 = minhash_signatures(toks, "doc_id", F.col("toks"), num_hashes=16)
    with pytest.raises(Exception, match="scheme"):
        banded_signatures(sig16, "doc_id", num_hashes=128, bands=16).count()
    with pytest.raises(Exception, match="scheme"):
        lsh_candidate_pairs(sig16, "doc_id", num_hashes=128, bands=16).count()


def test_is_allpairs_bound_error_classifies_both_forms(spark):
    """r10 advisor note: the lazy guard surfaces as Spark's
    SparkRuntimeException, NOT AllPairsBoundExceeded — the supported
    catch is is_allpairs_bound_error, which must recognize both the
    eager and the execution-time form (and not random errors)."""
    from spark_streaming_join_example_spark.operators.guards import (
        is_allpairs_bound_error,
    )

    try:
        check_now(spark.range(101), 100, "t", "alt")
        raise AssertionError("check_now did not raise")
    except AllPairsBoundExceeded as e:
        assert is_allpairs_bound_error(e)

    out = assert_allpairs_bounded(spark.range(101), 100, "t", "alt")
    try:
        out.count()
        raise AssertionError("lazy guard did not fire")
    except Exception as e:  # SparkRuntimeException from assert_true
        assert not isinstance(e, AllPairsBoundExceeded)
        assert is_allpairs_bound_error(e)

    assert not is_allpairs_bound_error(ValueError("unrelated"))
