"""Text-analysis operators (SURVEY.md §2.11 X5): tokenization, quality
scoring, language-ID, document fingerprinting.

All JVM-side expressions (split/regexp/aggregate) — text analysis at
100 TB lives or dies on staying out of Python; nothing here crosses
the Arrow boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

FP_MOD = 1_000_000_007
FP_BASE = 31

#: tiny marker-word lexicon for the language-ID heuristic. The fixture
#: corpus is synthetic (shared vocabulary), so markers double as a
#: determinism test: predictions are whatever the argmax says, on both
#: engines.
LANG_MARKERS: list[tuple[str, str]] = [
    ("the", "en"), ("and", "en"), ("query", "en"),
    ("le", "fr"), ("et", "fr"), ("données", "fr"),
    ("el", "es"), ("y", "es"), ("datos", "es"),
    ("der", "de"), ("und", "de"), ("daten", "de"),
    ("的", "zh"), ("数据", "zh"), ("查询", "zh"),
]


def tokenize(text: Column | str, sep: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def regex_tokens(text: Column | str, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish regex token extraction (letters/digit runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over characters, mod 1e9+7.

    h = fold(chars, 0, (acc, ch) -> (acc*31 + codepoint(ch)) mod M).
    Exact integer arithmetic → identical in any engine/partitioning.
    """
    c = F.col(text) if isinstance(text, str) else text
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )


def lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LANG_MARKERS, ["marker", "marker_lang"])


def predict_language(
    docs: DataFrame, spark: SparkSession, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Marker-word argmax language ID.

    Explode tokens, join the (broadcast) lexicon, count matches per
    (doc, lang), keep the argmax (ties → lexicographically first lang;
    no matches → 'und').  Deterministic by construction.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    hits = toks.join(
        F.broadcast(lexicon_df(spark)), toks.tok == F.col("marker")
    ).groupBy(id_col, "marker_lang").agg(F.count(F.lit(1)).alias("n_hits"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("n_hits").desc(), F.col("marker_lang")
    )
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("marker_lang").alias("pred_lang"))
    )
    return docs.select(id_col).join(best, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
    )


def gram_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 5,
) -> DataFrame:
    """(id, n_toks, pos, gram): every word-``span``-gram of every
    document with its 1-based start position — the posting-list
    relation of substring-level dedup (plans/round15.py, the Lee et
    al. 2022 ExactSubstr signal) and the storable unit of the
    streaming span index (streaming/span_index.py).

    All JVM built-ins (split/sequence/slice/array_join stay inside
    whole-stage codegen); the explode is the only row-multiplying
    step and emits ~n_toks rows per document."""
    toks = docs.select(
        F.col(id_col), F.split(text_col, " ").alias("w")
    ).withColumn("n_toks", F.size("w").cast("long"))
    return (
        toks.filter(F.col("n_toks") >= span)
        .select(
            id_col,
            "n_toks",
            "w",
            F.explode(
                F.sequence(F.lit(1), (F.col("n_toks") - (span - 1)).cast("int"))
            ).alias("pos"),
        )
        .select(
            id_col,
            "n_toks",
            F.col("pos").cast("long").alias("pos"),
            F.array_join(F.slice("w", F.col("pos"), span), " ").alias("gram"),
        )
    )


def span_coverage_frame(
    grams: DataFrame,
    dup_grams: DataFrame,
    id_col: str = "doc_id",
    span: int = 5,
) -> DataFrame:
    """Per-document duplicated-span coverage from a gram-position
    relation and a set of flagged grams: semi-join hit positions,
    merge overlapping-or-adjacent spans into islands (gaps-and-islands
    via one per-document window pass), and report
    (id, n_toks, covered_toks, dup_coverage, longest_span).

    Shared by the batch queries (q_span_coverage / q_span_trim) and
    the streaming span index's read + lookup paths, so "coverage"
    means exactly one thing everywhere.  The window partition is one
    document's hit spans — bounded by its own token count at any
    corpus size.

    ABSENT-ROW CONTRACT: only documents with ≥ 1 flagged-gram hit
    appear — a doc with zero hits (or absent from ``grams`` because
    it has fewer than ``span`` tokens) has NO output row, and absence
    means coverage 0.  q_span_trim and lookup_span_coverage left-join
    this result back to their doc lists (coalescing to 0) to emit one
    row per document; do the same in new call sites that iterate or
    inner-join the output."""
    from pyspark.sql.window import Window

    spans = grams.join(
        dup_grams.select("gram"), "gram", "left_semi"
    ).select(
        id_col,
        F.col("pos").alias("s"),
        (F.col("pos") + (span - 1)).alias("e"),
        "n_toks",
    )
    prior = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = spans.withColumn(
        "new_isl",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(prior), F.lit(-1)) + 1, 1
        ).otherwise(0),
    ).withColumn(
        "isl_id",
        F.sum("new_isl").over(Window.partitionBy(id_col).orderBy("s")),
    )
    islands = isl.groupBy(id_col, "isl_id").agg(
        F.min("s").alias("st"),
        F.max("e").alias("en"),
        F.max("n_toks").alias("n_toks"),
    )
    return islands.groupBy(id_col).agg(
        F.max("n_toks").alias("n_toks"),
        F.sum(F.col("en") - F.col("st") + 1).alias("covered_toks"),
        F.round(
            F.sum(F.col("en") - F.col("st") + 1).cast("double")
            / F.max("n_toks"),
            6,
        ).alias("dup_coverage"),
        F.max(F.col("en") - F.col("st") + 1).alias("longest_span"),
    )
